"""Approximate sketches: HLL-style approx distinct, GK percentiles, CMS, KMV, Bloom - with error-bound twins.

Mechanically split from the former single-file registry.py (round 8)
with zero semantic change; statement text is unchanged, only moved.
"""


from pythonvectordb_spark.registry._core import (
    DataFrame,
    F,
    SparkSession,
    _CMS_PROBE_KEYS,
    load_table,
)


def q_approx_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type KMV distinct-user sketch (GRADUATED round 7 from
    rows-only HLL to a hash-matched oracle, VERDICT r6 task 3): the
    k-min md5-prefix hashes are expression-reproducible, so the sketch
    internals — k-th hash boundary, estimate, relative error — ARE the
    checked values (`kmv_distinct_users` precedent). The engine HLL
    path stays covered by the `approx_distinct_error` guarantee twin
    (`operators/sketch.kmv_distinct_grouped`)."""
    from pythonvectordb_spark.operators.sketch import kmv_distinct_grouped

    return kmv_distinct_grouped(
        load_table(spark, sf_dir, "events"), "user_id", "event_type", k=64
    )


def o_approx_distinct_events() -> str:
    from pythonvectordb_spark.operators.sketch import KMV_SPACE

    return f"""
WITH h AS (SELECT DISTINCT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
           FROM events),
r AS (SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h ASC) AS rn
      FROM h),
kth AS (SELECT event_type, CAST(max(h) AS BIGINT) AS kth_hash,
               CAST(count(*) AS BIGINT) AS n_kept
        FROM r WHERE rn <= 64 GROUP BY 1),
ex AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_exact
       FROM events GROUP BY 1)
SELECT event_type, CAST(64 AS INT) AS k, n_distinct_exact, kth_hash,
       round(CASE WHEN n_kept < 64 THEN n_kept::DOUBLE
                  ELSE 63.0 * {KMV_SPACE!r} / kth_hash::DOUBLE END, 6)
         AS estimate,
       round(abs((CASE WHEN n_kept < 64 THEN n_kept::DOUBLE
                       ELSE 63.0 * {KMV_SPACE!r} / kth_hash::DOUBLE END)
                 - n_distinct_exact::DOUBLE)
             / n_distinct_exact::DOUBLE, 6) AS rel_error
FROM ex JOIN kth USING (event_type)
"""


def q_approx_distinct_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch with its error bound asserted as data (new round 4 —
    the GK `approx_percentile_error` pattern applied to the last
    sketch family): per event type, within_bound = 1 iff
    approx_count_distinct(user_id, rsd=0.05) lands within 15% of the
    exact distinct count. Max observed error on the testdata is 6.7%
    (sf0.1), so the bound has >2x margin while still being ~3-sigma for
    HLL++ at rsd 0.05 — a sketch regression breaks the value hash. The
    raw estimate stays rows-only (`approx_distinct_events`): the VALUE
    is engine-specific, the GUARANTEE is not."""
    ev = load_table(spark, sf_dir, "events")
    exact = F.countDistinct("user_id")
    approx = F.approx_count_distinct("user_id", 0.05)
    return ev.groupBy("event_type").agg(
        exact.cast("long").alias("n_exact_users"),
        (F.abs(approx - exact) <= 0.15 * exact).cast("long").alias("within_bound"),
    )


def o_approx_distinct_error() -> str:
    return """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact_users,
       CAST(1 AS BIGINT) AS within_bound
FROM events GROUP BY 1
"""


def q_approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type bottom-k-by-hash sample percentiles (GRADUATED
    round 7 from rows-only GK to a hash-matched oracle, VERDICT r6
    task 3): a mergeable quantile sketch — keep the 256 rows with
    smallest md5(event_id) hash per group (per-shard bottom-ks union
    exactly like KMV), exact interpolated p50/p99 over the sample —
    whose internals are expression-reproducible, so the sketch itself
    hash-matches DuckDB. The engine GK path stays covered by the
    `approx_percentile_error` guarantee twin; the bounded-state vs
    exact-twin contrast (`value_percentiles`) is unchanged
    (`operators/sketch.bottomk_sample_percentiles`)."""
    from pythonvectordb_spark.operators.sketch import bottomk_sample_percentiles

    return bottomk_sample_percentiles(
        load_table(spark, sf_dir, "events"), "value", "event_id", "event_type"
    )


def o_approx_value_percentiles() -> str:
    return """
WITH r AS (SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
               ORDER BY ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT ASC,
                        event_id ASC) AS rn
           FROM events),
s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS sample_n,
             round(quantile_cont(value::DOUBLE, 0.5), 6) AS ap50,
             round(quantile_cont(value::DOUBLE, 0.99), 6) AS ap99
      FROM r WHERE rn <= 256 GROUP BY 1),
n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1)
SELECT event_type, n, sample_n, ap50, ap99 FROM n JOIN s USING (event_type)
"""


def q_approx_percentile_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GK sketch percentiles with the error bound asserted as data:
    ``within_bound`` = 1 iff approx_percentile(value, p, 10000) lands
    inside the EXACT interpolated [p-0.02, p+0.02] band, per event type
    and probe. The oracle emits the constant 1 (DuckDB cannot replay the
    sketch but CAN assert its guarantee) — so a sketch regression breaks
    the value hash. Graduates the `approx_value_percentiles` family from
    rows-only to hash-matched (the CMS-family pattern)."""
    from pythonvectordb_spark.operators.sketch import gk_error_bound

    ev = load_table(spark, sf_dir, "events")
    return gk_error_bound(ev, "value", "event_type")


def o_approx_percentile_error() -> str:
    return """
SELECT event_type,
       CAST(p.probe_bp AS BIGINT) AS probe_bp,
       CAST(count(*) AS BIGINT) AS n,
       CAST(1 AS BIGINT) AS within_bound
FROM events CROSS JOIN (VALUES (5000), (9900)) AS p(probe_bp)
GROUP BY 1, 2
"""


def q_cms_user_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch estimates vs true per-user event counts (md5-
    derived, ANSI-reproducible; est >= true by construction)."""
    from pythonvectordb_spark.operators.sketch import cms_estimate

    ev = load_table(spark, sf_dir, "events")
    return cms_estimate(ev, "user_id", _CMS_PROBE_KEYS)


def o_cms_user_estimates() -> str:
    from pythonvectordb_spark.operators.sketch import CMS_DEPTH, CMS_WIDTH

    keys = ", ".join(str(k) for k in _CMS_PROBE_KEYS)
    return f"""
WITH pairs AS (
  SELECT d.d AS depth,
         CAST(('0x' || substr(md5(d.d || ':' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
              % {CMS_WIDTH} AS INT) AS bucket
  FROM events CROSS JOIN range(0, {CMS_DEPTH}) d(d)
), sketch AS (
  SELECT depth, bucket, CAST(count(*) AS BIGINT) AS n FROM pairs GROUP BY 1, 2
), probes AS (
  SELECT k.k AS key, d.d AS depth,
         CAST(('0x' || substr(md5(d.d || ':' || CAST(k.k AS VARCHAR)), 1, 8))::BIGINT
              % {CMS_WIDTH} AS INT) AS bucket
  FROM (SELECT unnest([{keys}]) AS k) k CROSS JOIN range(0, {CMS_DEPTH}) d(d)
), est AS (
  SELECT p.key, CAST(min(coalesce(s.n, 0)) AS BIGINT) AS est_n
  FROM probes p LEFT JOIN sketch s USING (depth, bucket) GROUP BY 1
), tru AS (
  SELECT CAST(user_id AS BIGINT) AS key, CAST(count(*) AS BIGINT) AS true_n
  FROM events WHERE user_id IN ({keys}) GROUP BY 1
)
SELECT CAST(est.key AS BIGINT) AS key, est_n,
       CAST(coalesce(tru.true_n, 0) AS BIGINT) AS true_n
FROM est LEFT JOIN tru ON est.key = tru.key
"""


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-driven heavy hitters: top-5 users by CMS count estimate."""
    from pythonvectordb_spark.operators.sketch import cms_heavy_hitters

    return cms_heavy_hitters(load_table(spark, sf_dir, "events"), "user_id", k=5)


def o_cms_heavy_hitters() -> str:
    from pythonvectordb_spark.operators.sketch import CMS_DEPTH, CMS_WIDTH

    return f"""
WITH pairs AS (
  SELECT d.d AS depth,
         CAST(('0x' || substr(md5(d.d || ':' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
              % {CMS_WIDTH} AS INT) AS bucket
  FROM events CROSS JOIN range(0, {CMS_DEPTH}) d(d)
), sketch AS (
  SELECT depth, bucket, CAST(count(*) AS BIGINT) AS n FROM pairs GROUP BY 1, 2
), probes AS (
  SELECT k.user_id AS key, d.d AS depth,
         CAST(('0x' || substr(md5(d.d || ':' || CAST(k.user_id AS VARCHAR)), 1, 8))::BIGINT
              % {CMS_WIDTH} AS INT) AS bucket
  FROM (SELECT DISTINCT user_id FROM events) k CROSS JOIN range(0, {CMS_DEPTH}) d(d)
)
SELECT CAST(p.key AS BIGINT) AS key,
       CAST(min(coalesce(s.n, 0)) AS BIGINT) AS est_n
FROM probes p LEFT JOIN sketch s USING (depth, bucket)
GROUP BY 1 ORDER BY est_n DESC, key ASC LIMIT 5
"""


def q_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch over event users (new round 6): k=64
    minimum md5-prefix hashes, estimate (k-1)*2^32/h_(k) next to the
    exact count and its relative error — the HLL-class cardinality
    sketch whose every number is expression-reproducible, so the
    SKETCH itself hash-matches the oracle (the two HLL entries are
    rows-only by design; this one is not)
    (`operators/sketch.kmv_distinct`)."""
    from pythonvectordb_spark.operators.sketch import kmv_distinct

    return kmv_distinct(load_table(spark, sf_dir, "events"), "user_id", k=64)


def o_kmv_distinct_users() -> str:
    from pythonvectordb_spark.operators.sketch import KMV_SPACE

    return f"""
WITH h AS (SELECT DISTINCT
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
           FROM events),
kth AS (SELECT CAST(max(h) AS BIGINT) AS kth_hash,
               CAST(count(*) AS BIGINT) AS n_kept
        FROM (SELECT h FROM h ORDER BY h ASC LIMIT 64)),
ex AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_exact
       FROM events)
SELECT CAST(64 AS INT) AS k, n_distinct_exact, kth_hash,
       round(CASE WHEN n_kept < 64 THEN n_kept::DOUBLE
                  ELSE 63.0 * {KMV_SPACE!r} / kth_hash::DOUBLE END, 6)
         AS estimate,
       round(abs((CASE WHEN n_kept < 64 THEN n_kept::DOUBLE
                       ELSE 63.0 * {KMV_SPACE!r} / kth_hash::DOUBLE END)
                 - n_distinct_exact::DOUBLE)
             / n_distinct_exact::DOUBLE, 6) AS rel_error
FROM ex CROSS JOIN kth
"""


def q_bloom_fpr_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter measured FPR (new round 6): build the bit set from
    purchasing users, probe with never-purchased users (known absent),
    report measured vs load-expected FPR — the calibration behind
    `bloom_prune_join`'s IO-savings claim; md5 positions make the
    filter engine-reproducible (`operators/sketch.bloom_fpr`)."""
    from pythonvectordb_spark.operators.sketch import bloom_fpr

    ev = load_table(spark, sf_dir, "events")
    members = ev.filter(F.col("event_type") == "purchase").select("user_id")
    probes = (
        ev.select("user_id")
        .distinct()
        .join(members.distinct(), "user_id", "left_anti")
    )
    return bloom_fpr(members, probes, "user_id", m=4096, n_hashes=3)


def o_bloom_fpr_purchases() -> str:
    def pos(j: int) -> str:
        return (
            f"(('0x' || substr(md5('{j}:' || CAST(user_id AS VARCHAR)), 1, 8))"
            f"::BIGINT % 4096)"
        )

    return f"""
WITH members AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
probes AS (SELECT DISTINCT user_id FROM events
           WHERE user_id NOT IN (SELECT user_id FROM members)),
bits AS (SELECT DISTINCT pos FROM (
           SELECT unnest([{pos(0)}, {pos(1)}, {pos(2)}]) AS pos FROM members)),
nb AS (SELECT CAST(count(*) AS BIGINT) AS n_bits_set FROM bits),
nm AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_members FROM members),
np AS (SELECT CAST(count(*) AS BIGINT) AS n_probes FROM probes),
pp AS (SELECT user_id AS pk, unnest([{pos(0)}, {pos(1)}, {pos(2)}]) AS pos
       FROM probes),
fp AS (SELECT CAST(count(*) AS BIGINT) AS n_false_positives FROM (
         SELECT pk FROM pp JOIN bits USING (pos)
         GROUP BY pk HAVING count(*) = 3))
SELECT CAST(4096 AS INT) AS m, CAST(3 AS INT) AS k_hashes,
       n_members, n_bits_set, n_probes, n_false_positives,
       CASE WHEN n_probes > 0 THEN
         round(n_false_positives::DOUBLE / n_probes::DOUBLE, 6)
       END AS fpr_measured,
       round((n_bits_set::DOUBLE / 4096.0) * (n_bits_set::DOUBLE / 4096.0)
             * (n_bits_set::DOUBLE / 4096.0), 6) AS fpr_expected
FROM nm CROSS JOIN nb CROSS JOIN np CROSS JOIN fp
"""


def q_kmv_custkey_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch-style KMV set operations (new round 7): union and
    intersection estimates for the URGENT-priority vs HIGH-priority
    customer bases from one combined bottom-64 hash sketch, exact
    counts and relative error beside them — md5-derived internals so
    the sketch itself hash-matches (`operators/sketch.kmv_set_ops`)."""
    from pythonvectordb_spark.operators.sketch import kmv_set_ops

    orders = load_table(spark, sf_dir, "orders")
    return kmv_set_ops(
        orders.filter(F.col("o_orderpriority") == "1-URGENT"),
        orders.filter(F.col("o_orderpriority") == "2-HIGH"),
        "o_custkey",
    )


def o_kmv_custkey_overlap() -> str:
    from pythonvectordb_spark.operators.sketch import KMV_SPACE

    return f"""
WITH a AS (SELECT DISTINCT o_custkey AS k_ FROM orders
           WHERE o_orderpriority = '1-URGENT'),
b AS (SELECT DISTINCT o_custkey AS k_ FROM orders
      WHERE o_orderpriority = '2-HIGH'),
m AS (SELECT coalesce(a.k_, b.k_) AS k_,
             CASE WHEN a.k_ IS NULL THEN 0 ELSE 1 END AS in_a,
             CASE WHEN b.k_ IS NULL THEN 0 ELSE 1 END AS in_b
      FROM a FULL OUTER JOIN b ON a.k_ = b.k_),
kept AS (SELECT CAST(max(h) AS BIGINT) AS kth_hash,
                CAST(count(*) AS BIGINT) AS n_kept,
                CAST(sum(in_a * in_b) AS BIGINT) AS n_both_kept
         FROM (SELECT ('0x' || substr(md5(CAST(k_ AS VARCHAR)), 1, 8))::BIGINT AS h,
                      in_a, in_b
               FROM m ORDER BY h ASC LIMIT 64)),
ex AS (SELECT CAST(sum(in_a) AS BIGINT) AS n_a_exact,
              CAST(sum(in_b) AS BIGINT) AS n_b_exact,
              CAST(count(*) AS BIGINT) AS n_union_exact,
              CAST(sum(in_a * in_b) AS BIGINT) AS n_inter_exact
       FROM m)
SELECT CAST(64 AS INT) AS k, n_a_exact, n_b_exact, n_union_exact, n_inter_exact,
       kth_hash, n_both_kept,
       round(CASE WHEN n_kept < 64 THEN n_kept::DOUBLE
                  ELSE 63.0 * {KMV_SPACE!r} / kth_hash::DOUBLE END, 6) AS union_est,
       round(n_both_kept::DOUBLE / n_kept::DOUBLE, 6) AS jaccard_est,
       round((n_both_kept::DOUBLE / n_kept::DOUBLE)
             * (CASE WHEN n_kept < 64 THEN n_kept::DOUBLE
                     ELSE 63.0 * {KMV_SPACE!r} / kth_hash::DOUBLE END), 6) AS inter_est,
       round(abs((CASE WHEN n_kept < 64 THEN n_kept::DOUBLE
                       ELSE 63.0 * {KMV_SPACE!r} / kth_hash::DOUBLE END)
                 - n_union_exact::DOUBLE) / n_union_exact::DOUBLE, 6)
         AS union_rel_error
FROM ex CROSS JOIN kept
"""
