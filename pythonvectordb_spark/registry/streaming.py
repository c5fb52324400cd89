"""Batch twins of the Structured Streaming pipelines (materialized view, dedup ingest gate).

Mechanically split from the former single-file registry.py (round 8)
with zero semantic change; statement text is unchanged, only moved.
"""


from pythonvectordb_spark.registry._core import (
    DataFrame,
    F,
    O,
    SparkSession,
    _JACCARD,
    load_table,
)


def q_matview_user_spend_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the incrementally-maintained user-spend matview
    (streaming/matview.py): the events table is split into 4
    deterministic micro-batches (event_id mod 4) and folded through the
    EXACT merge function `start_user_spend_matview` runs per batch. The
    oracle is the one-shot GROUP BY — green means the incremental fold
    equals the full recompute (the matview's core correctness claim),
    witnessed by the driver instead of pytest alone."""
    from pythonvectordb_spark.streaming.matview import merge_user_spend

    ev = load_table(spark, sf_dir, "events")
    view: DataFrame | None = None
    for b in range(4):
        view = merge_user_spend(view, ev.filter(F.pmod(F.col("event_id"), F.lit(4)) == b))
    return view


def o_matview_user_spend_twin() -> str:
    return """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY user_id
"""


def q_dedup_gate_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming near-dup ingest gate
    (streaming/curation.py `start_dedup_gate`): corpus = docs with
    doc_id%7 <= 4; two arriving micro-batches (doc_id%7 == 5, then 6)
    fold through the EXACT per-batch gate function. Output is the final
    corpus membership tagged by admission stage (0 = initial corpus,
    1/2 = survived batch 1/2) — batch-2 survivors prove the gate checks
    against the GROWN corpus (corpus + batch-1 survivors), i.e. the
    sequential semantics, not just one-shot dedup."""
    from pythonvectordb_spark.operators.dedup import minhash_side
    from pythonvectordb_spark.streaming.curation import gate_batch

    docs = load_table(spark, sf_dir, "documents")
    corpus0 = docs.filter(F.col("doc_id") % 7 <= 4)
    b1 = docs.filter(F.col("doc_id") % 7 == 5)
    b2 = docs.filter(F.col("doc_id") % 7 == 6)
    # the streaming gate MATERIALIZES each batch's survivors (parquet
    # append in foreachBatch) before the next batch gates against them;
    # the lazy twin must mirror that or s1's whole dedup DAG re-executes
    # inside corpus1's banding AND the final union. localCheckpoint =
    # the in-session analogue of the gate's append: computed once,
    # lineage truncated. The corpus's MinHash side table is likewise
    # maintained INCREMENTALLY (side of corpus1 = stored side of
    # corpus0 + the admitted survivors' own side rows) — the corpus is
    # signed once, not once per batch; 20.2 s -> ~7 s at sf0.1.
    ckpt = lambda df: df.localCheckpoint(eager=False)  # noqa: E731
    sh0, banded0 = map(ckpt, minhash_side(corpus0))
    s1 = ckpt(gate_batch(corpus0, b1, threshold=0.8, corpus_side=(sh0, banded0)))
    corpus1 = corpus0.unionByName(s1)
    sh_s1, banded_s1 = minhash_side(s1)
    side1 = (sh0.unionByName(sh_s1), banded0.unionByName(banded_s1))
    s2 = gate_batch(corpus1, b2, threshold=0.8, corpus_side=side1)
    stage = lambda df, s: df.select(  # noqa: E731
        "doc_id", F.lit(s).cast("int").alias("stage")
    )
    return stage(corpus0, 0).unionByName(stage(s1, 1)).unionByName(stage(s2, 2))


def o_dedup_gate_twin() -> str:
    """Mirrors the gate fold: band the whole table once with the same
    12-hash / 4-band x 3 MinHash family, dup(a,b) iff band collision AND
    exact Jaccard >= 0.8, then stage the survivor sets sequentially."""
    from pythonvectordb_spark.functions.text import MINHASH_P, minhash_params

    params = minhash_params(12)
    sigs = ", ".join(
        f"min(({a}::BIGINT * h1 + {b}::BIGINT * h2) % {MINHASH_P}::BIGINT) AS h{i}"
        for i, (a, b) in enumerate(params)
    )
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, md5(h{b * 3}::VARCHAR || '|' || h{b * 3 + 1}::VARCHAR || '|' || h{b * 3 + 2}::VARCHAR) AS bkey FROM sig"
        for b in range(4)
    )
    return f"""
WITH t AS (SELECT doc_id, {O.sql_tokens('text')} AS w FROM documents),
sh AS (SELECT doc_id, {O.sql_shingles_of('w')} AS sh FROM t),
inv AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
hashed AS (SELECT doc_id,
                  ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h1,
                  ('0x' || substr(md5(shingle), 9, 8))::BIGINT AS h2
           FROM inv),
sig AS (SELECT doc_id, {sigs} FROM hashed GROUP BY doc_id),
banded AS ({bands}),
pairs AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM banded x JOIN banded y ON x.band = y.band AND x.bkey = y.bkey
  WHERE x.doc_id <> y.doc_id
),
ver AS (
  SELECT a, b,
         len(list_intersect(pa.sh, pb.sh))::BIGINT AS n_common,
         len(pa.sh)::BIGINT AS n_a, len(pb.sh)::BIGINT AS n_b
  FROM pairs JOIN sh pa ON pa.doc_id = a JOIN sh pb ON pb.doc_id = b
),
dup AS (SELECT a, b FROM ver WHERE {_JACCARD} >= 0.8),
s1 AS (
  SELECT doc_id FROM documents WHERE doc_id % 7 = 5
  AND doc_id NOT IN (SELECT a FROM dup WHERE b % 7 <= 4)
),
s2 AS (
  SELECT doc_id FROM documents WHERE doc_id % 7 = 6
  AND doc_id NOT IN (
    SELECT a FROM dup WHERE b % 7 <= 4 OR b IN (SELECT doc_id FROM s1)
  )
)
SELECT doc_id, CAST(0 AS INT) AS stage FROM documents WHERE doc_id % 7 <= 4
UNION ALL SELECT doc_id, CAST(1 AS INT) AS stage FROM s1
UNION ALL SELECT doc_id, CAST(2 AS INT) AS stage FROM s2
"""
