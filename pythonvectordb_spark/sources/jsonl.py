"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API): a
JSONL document source/sink with partition-per-shard parallel reads and
comparison-filter pushdown.

Why it exists: training corpora arrive as directories of JSONL shards
(one document per line) long before they are parquet. Spark's built-in
``json`` reader handles the format, but a Python DataSource is the
extension point the reference's pluggable-storage story maps onto
(SURVEY.md §2.2 sources) — and it demonstrates the full V2-style
contract from Python: schema declaration, partition planning, filter
pushdown (``pushFilters``, 4.1+), and a transactional writer with
commit messages.

Scale notes: one input partition per shard file — the planner ships no
data, executors open only their own shard, and pushed filters drop rows
inside the Python reader before they enter the exchange. Shard layout
(many ~100 MB files) is the standard corpus drop format, so
partition-per-file parallelism matches the data. Filters that the
source cannot evaluate are returned to Spark untouched (it re-applies
them); supported ones are ALSO left for Spark to re-check, which is
semantically safe (AND of filters) and costs one codegen'd predicate.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType

DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)

_OPS = {
    EqualTo: lambda a, b: a == b,
    GreaterThan: lambda a, b: a > b,
    GreaterThanOrEqual: lambda a, b: a >= b,
    LessThan: lambda a, b: a < b,
    LessThanOrEqual: lambda a, b: a <= b,
}


@dataclass
class _Shard(InputPartition):
    path: str


class _JsonlReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_docs requires a path")
        self.fields = [f.name for f in schema.fields]
        self.pushed: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept flat comparison filters on top-level columns; evaluate
        them per line in read(). Everything else goes back to Spark."""
        for f in filters:
            ftype = type(f)
            if ftype in _OPS and len(f.attribute) == 1 and f.attribute[0] in self.fields:
                self.pushed.append(f)
            else:
                yield f  # unsupported -> Spark keeps it

    def partitions(self) -> list[_Shard]:
        if os.path.isdir(self.path):
            shards = sorted(
                os.path.join(self.path, n)
                for n in os.listdir(self.path)
                if n.endswith(".jsonl")
            )
        else:
            shards = [self.path]
        if not shards:
            raise ValueError(f"no .jsonl shards under {self.path}")
        return [_Shard(p) for p in shards]

    def read(self, partition: _Shard) -> Iterator[tuple]:
        pushed = [(type(f), f.attribute[0], f.value) for f in self.pushed]
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                if not line.strip():
                    continue
                rec = json.loads(line)
                ok = True
                for ftype, col, value in pushed:
                    v = rec.get(col)
                    # NULL comparisons are unknown -> row cannot satisfy
                    if v is None or not _OPS[ftype](v, value):
                        ok = False
                        break
                if ok:
                    yield tuple(rec.get(c) for c in self.fields)


@dataclass
class _ShardDone(WriterCommitMessage):
    path: str
    rows: int


class _JsonlWriter(DataSourceWriter):
    """One shard per task, written to a temp name and renamed into place
    by the driver-side commit() — failed/speculative tasks leave only
    orphan temp files that commit() ignores and abort() removes."""

    def __init__(self, schema: StructType, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_docs requires a path")
        self.fields = [f.name for f in schema.fields]

    def write(self, rows: Iterator[Row]) -> _ShardDone:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(
            self.path, f"_tmp-shard-{ctx.partitionId()}-{ctx.taskAttemptId()}.jsonl"
        )
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for r in rows:
                fh.write(json.dumps(dict(zip(self.fields, r)), sort_keys=True) + "\n")
                n += 1
        return _ShardDone(path=tmp, rows=n)

    def commit(self, messages: list[_ShardDone | None]) -> None:
        for i, m in enumerate(m for m in messages if m is not None):
            os.replace(m.path, os.path.join(self.path, f"part-{i:05d}.jsonl"))

    def abort(self, messages: list[_ShardDone | None]) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonlDocsDataSource(DataSource):
    """``spark.read.format("jsonl_docs")`` after registration via
    :func:`register_jsonl_source`."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_docs"

    def schema(self) -> str:
        return self.options.get("schema", DOCS_SCHEMA)

    def reader(self, schema: StructType) -> _JsonlReader:
        return _JsonlReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> _JsonlWriter:
        return _JsonlWriter(schema, self.options)


def register_jsonl_source(spark) -> None:
    spark.dataSource.register(JsonlDocsDataSource)
