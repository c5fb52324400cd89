"""Python DataSource (jsonl_docs): write/read roundtrip, shard-level
parallelism, and comparison-filter pushdown semantics."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan, IsNotNull

from pythonvectordb_spark.sources.jsonl import (
    DOCS_SCHEMA,
    _JsonlReader,
    register_jsonl_source,
)
from pythonvectordb_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def jsonl_dir(spark, tmp_path_factory):
    register_jsonl_source(spark)
    path = str(tmp_path_factory.mktemp("docs_jsonl"))
    docs = load_table(spark, SF_SMOKE, "documents").repartition(4)
    docs.write.format("jsonl_docs").option("path", path).mode("append").save()
    return path


def test_writer_emits_committed_shards(jsonl_dir):
    names = sorted(os.listdir(jsonl_dir))
    assert names == [f"part-{i:05d}.jsonl" for i in range(4)]  # no tmp leftovers


def test_roundtrip_matches_parquet(spark, jsonl_dir):
    orig = load_table(spark, SF_SMOKE, "documents")
    back = spark.read.format("jsonl_docs").option("path", jsonl_dir).load()
    assert back.rdd.getNumPartitions() == 4  # one partition per shard
    assert back.schema == spark.createDataFrame([], DOCS_SCHEMA).schema
    assert back.exceptAll(orig).count() == 0 and orig.exceptAll(back).count() == 0


def test_filter_pushdown_results(spark, jsonl_dir):
    orig = load_table(spark, SF_SMOKE, "documents")
    back = spark.read.format("jsonl_docs").option("path", jsonl_dir).load()
    cond = (F.col("lang") == "en") & (F.col("n_chars") > 200)
    got = back.filter(cond).agg(F.count("*"), F.sum("doc_id")).collect()
    want = orig.filter(cond).agg(F.count("*"), F.sum("doc_id")).collect()
    assert got == want


def test_push_filters_partitioning(spark):
    """Unit contract: supported comparisons are absorbed, the rest are
    returned for Spark to evaluate."""
    reader = _JsonlReader(
        spark.createDataFrame([], DOCS_SCHEMA).schema, {"path": "/nonexistent"}
    )
    supported = EqualTo(("lang",), "en")
    unsupported = IsNotNull(("text",))
    alien = GreaterThan(("no_such_col",), 1)
    remaining = list(reader.pushFilters([supported, unsupported, alien]))
    assert remaining == [unsupported, alien]
    assert reader.pushed == [supported]


def test_pushed_filter_prunes_at_source(spark, tmp_path):
    """Rows failing a pushed filter never leave read(): NULL column values
    are treated as not-matching (SQL comparison semantics)."""
    shard = tmp_path / "s.jsonl"
    shard.write_text(
        '{"doc_id": 1, "text": "a", "lang": "en", "source": "s", "n_chars": 1}\n'
        '{"doc_id": 2, "text": "b", "lang": null, "source": "s", "n_chars": 1}\n'
        '{"doc_id": 3, "text": "c", "lang": "de", "source": "s", "n_chars": 1}\n'
    )
    reader = _JsonlReader(
        spark.createDataFrame([], DOCS_SCHEMA).schema, {"path": str(tmp_path)}
    )
    assert list(reader.pushFilters([EqualTo(("lang",), "en")])) == []
    [part] = reader.partitions()
    rows = list(reader.read(part))
    assert [r[0] for r in rows] == [1]
