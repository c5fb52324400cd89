from pythonvectordb_spark.plans.explain import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    has_pushed_filter,
    pruned_columns,
    scan_schema,
)
from pythonvectordb_spark.plans.advisor import Finding, advise  # noqa: F401
