"""Corpus statistics and hypothesis tests: ANOVA family, rank tests, chi-square, effect sizes, outlier censuses.

Mechanically split from the former single-file registry.py (round 8)
with zero semantic change; statement text is unchanged, only moved.
"""


from pythonvectordb_spark.registry._core import (
    CU,
    DataFrame,
    F,
    O,
    RL,
    ST,
    SparkSession,
    TX,
    Window,
    _tokens,
    load_table,
)


def q_value_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) binning of event values: 8 bins with equal
    row counts, per-bin min/max/count/sum. The complement of the
    fixed-width `events_value_histogram`: bin EDGES derive from the data.
    ntile over a (value, event_id) composite order — deterministic
    through duplicate values — partitioned windows are impossible here
    (global quantiles are global), but the window carries only two
    columns and at scale would run on a range-partitioned sort, the same
    plan Spark uses for any global ORDER BY."""
    events = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    w = Window.orderBy(F.col("v_cents"), F.col("event_id"))
    return (
        events.select(F.col("event_id"), cents.alias("v_cents"))
        .withColumn("bin", F.ntile(8).over(w).cast("int"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("v_cents").cast("long").alias("lo_cents"),
            F.max("v_cents").cast("long").alias("hi_cents"),
            F.sum("v_cents").cast("long").alias("sum_cents"),
        )
    )


def o_value_equidepth_bins() -> str:
    return """
WITH v AS (
  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS v_cents FROM events
),
b AS (
  SELECT v_cents, CAST(ntile(8) OVER (ORDER BY v_cents, event_id) AS INT) AS bin FROM v
)
SELECT bin, CAST(count(*) AS BIGINT) AS n,
       CAST(min(v_cents) AS BIGINT) AS lo_cents,
       CAST(max(v_cents) AS BIGINT) AS hi_cents,
       CAST(sum(v_cents) AS BIGINT) AS sum_cents
FROM b GROUP BY 1
"""


def q_fuzzy_source_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching as a join predicate: pairs of distinct
    source names within Levenshtein distance 2 — the entity-resolution
    shape (near-identical feed/crawl names) on the engine's native edit
    distance. The self-join runs on the DISTINCT key set (tiny relative
    to the corpus — the standard fuzzy-join reduction: dedupe to the key
    directory first, then pay O(|keys|^2) where |keys| << |rows|)."""
    docs = load_table(spark, sf_dir, "documents")
    # lazy checkpoint: the distinct key directory feeds both self-join
    # sides; without it the distinct aggregate runs once per side
    src = docs.select("source").distinct().localCheckpoint(eager=False)
    a = src.select(F.col("source").alias("src_a"))
    b = src.select(F.col("source").alias("src_b"))
    return (
        a.join(b, F.col("src_a") < F.col("src_b"))
        .withColumn("dist", F.levenshtein("src_a", "src_b").cast("int"))
        .filter(F.col("dist") <= 2)
    )


def o_fuzzy_source_pairs() -> str:
    return """
WITH s AS (SELECT DISTINCT source FROM documents)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(levenshtein(a.source, b.source) AS INT) AS dist
FROM s a JOIN s b ON a.source < b.source
WHERE levenshtein(a.source, b.source) <= 2
"""


def q_event_value_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion per event type: median and MAD (median absolute
    deviation) of the value column — the outlier-resistant complement of
    `event_outliers`' mean/stddev fences. Two passes by construction
    (MAD needs the median first): pass 1 reduces to one 5-row median
    table (map-side combined percentile), pass 2 broadcasts it back and
    reduces the absolute deviations — the event table is scanned twice
    but shuffled never (both aggregations carry partial percentile state
    keyed by the 5-value type)."""
    events = load_table(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    return (
        events.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.first("med"), 6).alias("median_value"),
            F.round(F.expr("percentile(abs(value - med), 0.5)"), 6).alias("mad"),
        )
    )


def o_event_value_mad() -> str:
    return """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY 1
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(any_value(med), 6) AS median_value,
       round(quantile_cont(abs(value - med), 0.5), 6) AS mad
FROM events e JOIN med USING (event_type)
GROUP BY 1
"""


def q_friedman_types_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test of event types blocked by day (new round 6): is
    the type revenue ORDERING stable across days — the
    repeated-measures rank test next to `kruskal_wallis`'s pooled one;
    doubled within-day midranks keep the tie-adjusted Q an exact
    integer ratio (`operators/timeseries.friedman_types_by_day`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.friedman_types_by_day(load_table(spark, sf_dir, "events"))


def o_friedman_types_by_day() -> str:
    return """
WITH cells AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di,
         event_type AS ty,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev
  FROM events GROUP BY 1, 2),
days AS (SELECT DISTINCT di FROM cells),
types AS (SELECT DISTINCT ty FROM cells),
grid AS (SELECT d.di, t.ty, coalesce(c.rev, 0) AS rev
         FROM days d CROSS JOIN types t
         LEFT JOIN cells c ON c.di = d.di AND c.ty = t.ty),
ranked AS (
  SELECT di, ty,
         CAST(2 * coalesce(sum(1) OVER (PARTITION BY di ORDER BY rev ASC
                  RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + count(*) OVER (PARTITION BY di, rev) + 1 AS BIGINT) AS r2,
         CAST(count(*) OVER (PARTITION BY di) AS BIGINT) AS k
  FROM grid),
per_type AS (SELECT ty, CAST(sum(r2) AS BIGINT) AS r2j FROM ranked GROUP BY 1),
tots AS (SELECT CAST(sum(r2 * r2) AS BIGINT) AS sr22,
                CAST(max(k) AS BIGINT) AS k,
                CAST(count(DISTINCT di) AS BIGINT) AS n
         FROM ranked),
stat AS (SELECT CAST((r2j - n * (k + 1)) * (r2j - n * (k + 1)) AS BIGINT)
                  AS dev2, k, n, sr22
         FROM per_type CROSS JOIN tots)
SELECT CAST(max(k) AS BIGINT) AS n_types, CAST(max(n) AS BIGINT) AS n_days,
       CASE WHEN (max(sr22) - max(n) * max(k) * (max(k) + 1) * (max(k) + 1))
                 > 0 THEN
         round((max(k) - 1)::DOUBLE * sum(dev2)::DOUBLE
               / (max(sr22)
                  - max(n) * max(k) * (max(k) + 1) * (max(k) + 1))::DOUBLE, 6)
       END AS friedman_q
FROM stat
"""


def q_wilcoxon_week_over_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank of daily revenue vs the same weekday one
    week back (new round 6): the PAIRED rank test — zero diffs drop,
    doubled midranks of |d| keep W2+ and the tie-corrected variance
    exact int64 (`operators/timeseries.wilcoxon_week_over_week`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.wilcoxon_week_over_week(load_table(spark, sf_dir, "events"))


def o_wilcoxon_week_over_week() -> str:
    return """
WITH daily AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1),
diffs AS (SELECT abs(a.cents - b.cents) AS ad,
                 CASE WHEN a.cents - b.cents > 0 THEN 1 ELSE 0 END AS pos
          FROM daily a JOIN daily b ON a.di = b.di + 7
          WHERE a.cents != b.cents),
gv AS (SELECT ad, CAST(count(*) AS BIGINT) AS t,
              CAST(sum(pos) AS BIGINT) AS tp
       FROM diffs GROUP BY 1),
mid AS (SELECT ad, t, tp,
               CAST(2 * (sum(t) OVER (ORDER BY ad ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t)
                    + t + 1 AS BIGINT) AS mr2
        FROM gv),
agg AS (SELECT CAST(sum(t) AS BIGINT) AS n,
               CAST(sum(tp * mr2) AS BIGINT) AS w2p,
               CAST(sum(t * t * t - t) AS BIGINT) AS tie3
        FROM mid)
SELECT n AS n_nonzero_pairs, w2p AS w2_plus,
       CASE WHEN n > 0
                 AND (n::DOUBLE * (n::DOUBLE + 1.0)
                      * (2.0 * n::DOUBLE + 1.0) / 6.0
                      - tie3::DOUBLE / 12.0) > 0 THEN
         round((w2p::DOUBLE - n::DOUBLE * (n::DOUBLE + 1.0) / 2.0)
               / sqrt(n::DOUBLE * (n::DOUBLE + 1.0)
                      * (2.0 * n::DOUBLE + 1.0) / 6.0
                      - tie3::DOUBLE / 12.0), 6) END AS z
FROM agg
"""


def q_source_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram entropy (staged for the round-5 rotation):
    the corpus-card diversity scalar plus its ln(vocab)-normalized
    form — low entropy flags template-dominated sources whose token
    counts overstate their diversity
    (`operators/curation.source_entropy`)."""
    return CU.source_entropy(load_table(spark, sf_dir, "documents"))


def o_source_entropy() -> str:
    return f"""
WITH tok AS (SELECT source, unnest({O.sql_tokens('text')}) AS tok FROM documents),
counts AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
           FROM tok GROUP BY 1, 2),
g AS (
  SELECT source,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_vocab,
         sum(c::DOUBLE * ln(c::DOUBLE)) AS s_clnc
  FROM counts GROUP BY 1
)
SELECT source, n_tokens, n_vocab,
       round(ln(n_tokens::DOUBLE) - s_clnc / n_tokens::DOUBLE, 6) AS entropy,
       round(CASE WHEN n_vocab > 1
                  THEN (ln(n_tokens::DOUBLE) - s_clnc / n_tokens::DOUBLE)
                       / ln(n_vocab::DOUBLE)
                  ELSE 0.0 END, 6) AS norm_entropy
FROM g
"""


def q_source_kl_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise smoothed unigram KL between sources (staged for the
    round-5 rotation): the domain-distance matrix behind mixing
    decisions — distributional redundancy even without literal copies
    (`operators/curation.source_kl_matrix`)."""
    return CU.source_kl_matrix(load_table(spark, sf_dir, "documents"))


def o_source_kl_matrix() -> str:
    # KL factored so every ln is of an exact integer and the only float
    # fold is the grouped sum (ROUND 6 after the closed-form): with
    # P_s(w) = (c_s+1)/(N_s+V),
    # KL(s||t) = sum((c_s+1)(ln(c_s+1)-ln(c_t+1)))/(N_s+V) + ln(N_t+V) - ln(N_s+V)
    return f"""
WITH tok AS (SELECT source, unnest({O.sql_tokens('text')}) AS tok FROM documents),
counts AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
           FROM tok GROUP BY 1, 2),
totals AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tok FROM counts GROUP BY 1),
vocab AS (SELECT DISTINCT tok FROM counts),
vs AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
grid AS (
  SELECT v.tok, t.source, t.n_tok,
         CAST(coalesce(c.c, 0) + 1 AS BIGINT) AS c1
  FROM vocab v CROSS JOIN totals t
  LEFT JOIN counts c ON c.source = t.source AND c.tok = v.tok
),
p AS (
  SELECT a.source AS source_a, b.source AS source_b,
         a.n_tok AS n_a, b.n_tok AS n_b,
         sum(a.c1::DOUBLE * (ln(a.c1::DOUBLE) - ln(b.c1::DOUBLE))) AS s_term
  FROM grid a JOIN grid b ON a.tok = b.tok AND a.source != b.source
  GROUP BY 1, 2, 3, 4
)
SELECT source_a, source_b, n_a, n_b,
       round(s_term / (n_a + vs.v)::DOUBLE
             + ln((n_b + vs.v)::DOUBLE) - ln((n_a + vs.v)::DOUBLE), 6) AS kl_ab
FROM p CROSS JOIN vs
"""


def q_bootstrap_order_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson-bootstrap CI for the mean order value
    (staged for the round-5 rotation): 40 md5-replayable replicates in
    ONE pass, CI from the rank-trimmed replicate means — "is the mean
    shift real?" without collecting anything
    (`operators/stats.bootstrap_mean_ci`)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return ST.bootstrap_mean_ci(orders, "cents", "o_orderkey", n_boot=40)


def o_bootstrap_order_ci(n_boot: int = 40) -> str:
    from pythonvectordb_spark.operators.stats import _POISSON1_CDF_U32

    case = "CASE " + " ".join(
        f"WHEN u < {t} THEN {k}" for k, t in enumerate(_POISSON1_CDF_U32)
    ) + " ELSE 6 END"
    trim = int(0.025 * n_boot)
    return f"""
WITH base AS (SELECT CAST(o_orderkey AS VARCHAR) AS id,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS x
              FROM orders),
reps AS (
  SELECT b.b, base.x,
         ('0x' || substr(md5(base.id || '_' || CAST(b.b AS VARCHAR)), 1, 8))::BIGINT AS u
  FROM base CROSS JOIN (SELECT unnest(range(0, {n_boot})) AS b) b
),
sums AS (
  SELECT b, CAST(sum({case}) AS BIGINT) AS sw,
         CAST(sum(({case}) * x) AS BIGINT) AS swx
  FROM reps GROUP BY 1
),
means AS (SELECT b, round(swx::DOUBLE / sw::DOUBLE, 6) AS mean_b FROM sums),
ranked AS (SELECT mean_b,
                  row_number() OVER (ORDER BY mean_b ASC, b ASC) AS rn
           FROM means),
ci AS (SELECT max(CASE WHEN rn = {trim + 1} THEN mean_b END) AS ci_lo_cents,
              max(CASE WHEN rn = {n_boot - trim} THEN mean_b END) AS ci_hi_cents,
              CAST(count(*) AS BIGINT) AS n_boot
       FROM ranked),
f AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
             round(sum(x)::DOUBLE / count(*)::DOUBLE, 6) AS mean_cents
      FROM base)
SELECT f.n_rows, ci.n_boot, f.mean_cents, ci.ci_lo_cents, ci.ci_hi_cents
FROM ci CROSS JOIN f
"""


def q_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Gini of customer order spend (staged for the round-5
    rotation): the value-concentration scalar behind whale-account skew
    planning — rank identity on exact cents, window partitioned by
    nation so no global sort exists
    (`operators/relational.revenue_gini`)."""
    return RL.revenue_gini(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "nation"),
    )


def o_revenue_gini() -> str:
    return """
WITH spend AS (
  SELECT n.n_name, c.c_custkey,
         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT n_name, cents,
         CAST(row_number() OVER (PARTITION BY n_name
                                 ORDER BY cents ASC, c_custkey ASC) AS BIGINT) AS i
  FROM spend
),
g AS (
  SELECT n_name,
         CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(cents) AS BIGINT) AS total_cents,
         CAST(sum(i * cents) AS BIGINT) AS six
  FROM ranked GROUP BY 1
)
SELECT n_name, n_customers, total_cents,
       round(2.0 * six::DOUBLE / (n_customers::DOUBLE * total_cents::DOUBLE)
             - (n_customers::DOUBLE + 1.0) / n_customers::DOUBLE, 6) AS gini
FROM g
"""


def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit on order values (staged for the
    round-5 rotation): observed vs log10(1+1/d) share per digit — the
    fabricated-feed detector; digit from the exact cents integer,
    expectation from ln's of exact integers
    (`operators/relational.benford_digits`)."""
    return RL.benford_digits(load_table(spark, sf_dir, "orders"))


def o_benford_digits() -> str:
    return """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM orders
),
g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM d GROUP BY 1),
t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM g),
o AS (
  SELECT digit, n_obs,
         round(n_obs::DOUBLE / t.n::DOUBLE, 9) AS obs_share,
         round((ln(digit::DOUBLE + 1.0) - ln(digit::DOUBLE)) / ln(10.0), 9) AS benford_p
  FROM g CROSS JOIN t
)
SELECT digit, n_obs, obs_share, benford_p,
       round(obs_share - benford_p, 9) AS excess
FROM o
"""


def q_rank_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank stability of brand revenue across the two exact
    halves of the order horizon (staged for the round-5 rotation): the
    popularity-drift scalar behind layout refresh cadence — exact
    integer d^2 from row_number ranks over e4-unit revenue, one final
    division (`operators/relational.rank_stability`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.rank_stability(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )


def o_rank_stability() -> str:
    return """
WITH piv AS (
  SELECT CAST(min(epoch_us(o_orderdate)) AS BIGINT)
         + (CAST(max(epoch_us(o_orderdate)) AS BIGINT)
            - CAST(min(epoch_us(o_orderdate)) AS BIGINT)) // 2 AS p
  FROM orders),
rev AS (
  SELECT CASE WHEN epoch_us(o.o_orderdate) <= piv.p THEN 1 ELSE 2 END AS half,
         p.p_brand,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_e4
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  CROSS JOIN piv
  GROUP BY 1, 2),
rk AS (SELECT half, p_brand,
              CAST(row_number() OVER (PARTITION BY half
                    ORDER BY rev_e4 DESC, p_brand ASC) AS BIGINT) AS r
       FROM rev)
SELECT CAST(count(*) AS BIGINT) AS n_brands,
       CAST(sum((a.r - b.r) * (a.r - b.r)) AS BIGINT) AS sum_d2,
       round(1.0 - 6.0 * sum((a.r - b.r) * (a.r - b.r))::DOUBLE
             / (count(*)::DOUBLE
                * (count(*)::DOUBLE * count(*)::DOUBLE - 1.0)), 9) AS rho
FROM rk a JOIN rk b ON a.p_brand = b.p_brand AND a.half = 1 AND b.half = 2
"""


def q_trimmed_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trimmed and winsorized means of event value per type (staged for
    the round-5 rotation): robust-location companions to
    `event_value_mad` — exact-integer cut-rank algebra, winsorized =
    trimmed + k*lo + k*hi (`operators/sketch.trimmed_stats`)."""
    from pythonvectordb_spark.operators import sketch as SK

    return SK.trimmed_stats(load_table(spark, sf_dir, "events"))


def o_trimmed_value_stats() -> str:
    return """
WITH r AS (
  SELECT event_type AS k, CAST(round(value * 100) AS BIGINT) AS c,
         CAST(row_number() OVER (PARTITION BY event_type
               ORDER BY CAST(round(value * 100) AS BIGINT) ASC, event_id ASC)
              AS BIGINT) AS i,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM events),
r2 AS (SELECT *, CAST(floor((n * 10) / 100.0) AS BIGINT) AS kcut FROM r),
g AS (
  SELECT k, max(n) AS n, max(kcut) AS kcut,
         CAST(sum(c) AS BIGINT) AS s_all,
         CAST(sum(CASE WHEN i > kcut AND i <= n - kcut THEN c END) AS BIGINT) AS s_trim,
         max(CASE WHEN i = kcut + 1 THEN c END) AS lo,
         max(CASE WHEN i = n - kcut THEN c END) AS hi
  FROM r2 GROUP BY 1)
SELECT k AS event_type, n, kcut AS n_trimmed_each_side,
       round(s_all::DOUBLE / (100.0 * n::DOUBLE), 6) AS mean,
       round(s_trim::DOUBLE / (100.0 * (n - 2 * kcut)::DOUBLE), 6) AS trimmed_mean,
       round((s_trim + kcut * lo + kcut * hi)::DOUBLE / (100.0 * n::DOUBLE), 6)
           AS winsorized_mean,
       round(lo::DOUBLE / 100.0, 2) AS lo_cut,
       round(hi::DOUBLE / 100.0, 2) AS hi_cut
FROM g
"""


def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b concordance of brand revenue across the two exact
    horizon halves (staged for the round-5 rotation): the pairwise
    inversion companion to `rank_stability` — C/D/tie counts exact over
    the aggregated brand frame, K(K-1)/2 pairs never rows^2
    (`operators/relational.kendall_tau`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.kendall_tau(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )


def o_kendall_tau() -> str:
    return """
WITH piv AS (
  SELECT CAST(min(epoch_us(o_orderdate)) AS BIGINT)
         + (CAST(max(epoch_us(o_orderdate)) AS BIGINT)
            - CAST(min(epoch_us(o_orderdate)) AS BIGINT)) // 2 AS p
  FROM orders),
rev AS (
  SELECT CASE WHEN epoch_us(o.o_orderdate) <= piv.p THEN 1 ELSE 2 END AS half,
         p.p_brand,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_e4
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  CROSS JOIN piv
  GROUP BY 1, 2),
wide AS (
  SELECT p_brand,
         max(CASE WHEN half = 1 THEN rev_e4 END) AS x,
         max(CASE WHEN half = 2 THEN rev_e4 END) AS y
  FROM rev GROUP BY 1
  HAVING max(CASE WHEN half = 1 THEN rev_e4 END) IS NOT NULL
     AND max(CASE WHEN half = 2 THEN rev_e4 END) IS NOT NULL),
pr AS (
  SELECT CAST(sign(a.x - b.x) AS BIGINT) AS sx,
         CAST(sign(a.y - b.y) AS BIGINT) AS sy
  FROM wide a JOIN wide b ON a.p_brand < b.p_brand),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
         CAST(sum(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
         CAST(sum(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
         CAST(sum(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty
  FROM pr),
nb AS (SELECT CAST(count(*) AS BIGINT) AS n_brands FROM wide)
SELECT n_brands, n_pairs, concordant, discordant,
       round((concordant - discordant)::DOUBLE
             / sqrt((n_pairs - tx)::DOUBLE * (n_pairs - ty)::DOUBLE), 9) AS tau_b
FROM g CROSS JOIN nb
"""


def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl supplier-revenue concentration per nation (staged for
    the round-5 rotation): HHI and the effective supplier count 1/HHI —
    exact e4 revenue, DECIMAL(38)/HUGEINT squares, one final double
    division (`operators/relational.hhi_concentration`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.hhi_concentration(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


def o_hhi_concentration() -> str:
    return """
WITH per AS (
  SELECT n.n_name, s.s_suppkey,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_e4
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1, 2),
g AS (
  SELECT n_name,
         CAST(count(*) AS BIGINT) AS n_suppliers,
         CAST(sum(rev_e4) AS BIGINT) AS total_e4,
         sum(rev_e4::HUGEINT * rev_e4::HUGEINT) AS sq_e8
  FROM per GROUP BY 1)
SELECT n_name, n_suppliers, total_e4,
       round(sq_e8::DOUBLE / (total_e4::DOUBLE * total_e4::DOUBLE), 9) AS hhi,
       round((total_e4::DOUBLE * total_e4::DOUBLE) / sq_e8::DOUBLE, 6) AS eff_suppliers
FROM g
"""


def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest Mann-Whitney U per source over doc lengths (staged
    for the round-5 rotation): doubled midranks 2B+c+1 keep rank sums,
    U2, and the tie correction exact int64; z and rank-biserial r
    promote once (`operators/stats.mann_whitney`)."""
    return ST.mann_whitney(load_table(spark, sf_dir, "documents"))


def o_mann_whitney() -> str:
    return """
WITH sv AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v,
                   CAST(count(*) AS BIGINT) AS cg
            FROM documents GROUP BY 1, 2),
vc AS (SELECT CAST(n_chars AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS c
       FROM documents GROUP BY 1),
mid AS (SELECT v, c,
               CAST(2 * (sum(c) OVER (ORDER BY v ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
                    + c + 1 AS BIGINT) AS mr2
        FROM vc),
tots AS (SELECT CAST(sum(c) AS BIGINT) AS n_total,
                CAST(sum(c * c * c - c) AS BIGINT) AS tie3
         FROM mid),
per AS (SELECT g, CAST(sum(cg) AS BIGINT) AS n1,
               CAST(sum(cg * mr2) AS BIGINT) AS s2
        FROM sv JOIN mid USING (v) GROUP BY 1)
SELECT g AS source, n1 AS n_group,
       CAST(n_total - n1 AS BIGINT) AS n_rest,
       CAST(s2 - n1 * (n1 + 1) AS BIGINT) AS u2,
       round(((s2 - n1 * (n1 + 1))::DOUBLE / 2.0
              - n1::DOUBLE * (n_total - n1)::DOUBLE / 2.0)
             / sqrt((n1::DOUBLE * (n_total - n1)::DOUBLE / 12.0)
                    * ((n_total::DOUBLE + 1.0)
                       - tie3::DOUBLE
                         / (n_total::DOUBLE * (n_total::DOUBLE - 1.0)))), 6) AS z,
       round(1.0 - (s2 - n1 * (n1 + 1))::DOUBLE
                   / (n1::DOUBLE * (n_total - n1)::DOUBLE), 6) AS rank_biserial
FROM per CROSS JOIN tots
"""


def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across event types (new round 6): the k-group
    rank test that precedes the one-vs-rest `mann_whitney` sweep —
    doubled midranks keep rank sums and the tie correction exact int64;
    H and tie-corrected H' promote once, ROUNDED 6
    (`operators/stats.kruskal_wallis`)."""
    return ST.kruskal_wallis(load_table(spark, sf_dir, "events"))


def o_kruskal_wallis() -> str:
    return """
WITH sv AS (SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS v,
                   CAST(count(*) AS BIGINT) AS cg
            FROM events GROUP BY 1, 2),
vc AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
              CAST(count(*) AS BIGINT) AS c
       FROM events GROUP BY 1),
mid AS (SELECT v, c,
               CAST(2 * (sum(c) OVER (ORDER BY v ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
                    + c + 1 AS BIGINT) AS mr2
        FROM vc),
tots AS (SELECT CAST(sum(c) AS BIGINT) AS n_total,
                CAST(sum(c * c * c - c) AS BIGINT) AS tie3
         FROM mid),
per AS (SELECT g, CAST(sum(cg) AS BIGINT) AS n1,
               CAST(sum(cg * mr2) AS BIGINT) AS s2
        FROM sv JOIN mid USING (v) GROUP BY 1),
agg AS (SELECT CAST(count(*) AS BIGINT) AS k,
               sum(s2::DOUBLE * s2::DOUBLE / (4.0 * n1::DOUBLE)) AS rsum2n
        FROM per)
SELECT k AS n_groups, n_total AS n_rows,
       CASE WHEN k > 1 AND n_total > k THEN
         round(12.0 / (n_total::DOUBLE * (n_total::DOUBLE + 1.0)) * rsum2n
               - 3.0 * (n_total::DOUBLE + 1.0), 6) END AS h_raw,
       CASE WHEN k > 1 AND n_total > k
                 AND (1.0 - tie3::DOUBLE
                      / (n_total::DOUBLE * n_total::DOUBLE * n_total::DOUBLE
                         - n_total::DOUBLE)) > 0 THEN
         round((12.0 / (n_total::DOUBLE * (n_total::DOUBLE + 1.0)) * rsum2n
                - 3.0 * (n_total::DOUBLE + 1.0))
               / (1.0 - tie3::DOUBLE
                  / (n_total::DOUBLE * n_total::DOUBLE * n_total::DOUBLE
                     - n_total::DOUBLE)), 6) END AS h_stat
FROM agg CROSS JOIN tots
"""


def q_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test across event types (new
    round 6): ANOVA on |value - group median| with the doubled-median
    trick keeping every deviation exact int64 on the distinct-value
    frame; the F statistic assembles in `value_anova`'s pinned double
    order (`operators/stats.brown_forsythe`)."""
    return ST.brown_forsythe(load_table(spark, sf_dir, "events"))


def o_brown_forsythe() -> str:
    return """
WITH gv AS (SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS v,
                   CAST(count(*) AS BIGINT) AS cg
            FROM events GROUP BY 1, 2),
r AS (SELECT g, v, cg,
             CAST(sum(cg) OVER (PARTITION BY g ORDER BY v ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS hi,
             CAST(sum(cg) OVER (PARTITION BY g) AS BIGINT) AS n
      FROM gv),
m AS (SELECT g,
             CAST(sum(v * ((CASE WHEN (n + 1) // 2
                                      BETWEEN hi - cg + 1 AND hi
                                 THEN 1 ELSE 0 END)
                           + (CASE WHEN (n + 2) // 2
                                        BETWEEN hi - cg + 1 AND hi
                                   THEN 1 ELSE 0 END))) AS BIGINT) AS med2
      FROM r GROUP BY 1),
per AS (SELECT r.g, CAST(max(n) AS BIGINT) AS ng,
               CAST(sum(cg * abs(2 * v - med2)) AS BIGINT) AS s,
               CAST(sum(cg * abs(2 * v - med2) * abs(2 * v - med2))
                    AS BIGINT) AS q
        FROM r JOIN m ON r.g = m.g GROUP BY 1),
t AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS nn,
             CAST(sum(s) AS BIGINT) AS ss, CAST(sum(q) AS BIGINT) AS qq,
             sum(s::DOUBLE * s::DOUBLE / ng::DOUBLE) AS sg2n
      FROM per)
SELECT k AS n_groups, nn AS n_rows,
       CASE WHEN k > 1 AND nn > k AND (qq::DOUBLE - sg2n) > 0 THEN
         round(((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
                / (k::DOUBLE - 1.0))
               / ((qq::DOUBLE - sg2n) / (nn::DOUBLE - k::DOUBLE)), 6)
       END AS bf_stat
FROM t
"""


def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic document gates (new
    round 6): chance-corrected agreement of the char-length gate
    (n_chars >= 200) with the token-count gate (>= 40 tokens) — exact
    2x2 cells in one corpus pass, kappa promotes once
    (`operators/stats.cohens_kappa`)."""
    docs = load_table(spark, sf_dir, "documents")
    return ST.cohens_kappa(
        docs,
        F.col("n_chars") >= 200,
        F.size(_tokens("text")) >= 40,
    )


def o_cohens_kappa() -> str:
    return f"""
WITH f AS (SELECT CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS a,
                  CASE WHEN len({O.sql_tokens('text')}) >= 40
                       THEN 1 ELSE 0 END AS b
           FROM documents),
t AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a * b) AS BIGINT) AS n11,
             CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
             CAST(sum((1 - a) * b) AS BIGINT) AS n01,
             CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
      FROM f)
SELECT n AS n_rows, n11, n10, n01, n00,
       round((n11 + n00)::DOUBLE / n::DOUBLE, 6) AS p_observed,
       round(((n11 + n10)::DOUBLE * (n11 + n01)::DOUBLE
              + (n01 + n00)::DOUBLE * (n10 + n00)::DOUBLE)
             / (n::DOUBLE * n::DOUBLE), 6) AS p_expected,
       CASE WHEN ((n11 + n10)::DOUBLE * (n11 + n01)::DOUBLE
                  + (n01 + n00)::DOUBLE * (n10 + n00)::DOUBLE)
                 / (n::DOUBLE * n::DOUBLE) < 1.0 THEN
         round(((n11 + n00)::DOUBLE / n::DOUBLE
                - ((n11 + n10)::DOUBLE * (n11 + n01)::DOUBLE
                   + (n01 + n00)::DOUBLE * (n10 + n00)::DOUBLE)
                  / (n::DOUBLE * n::DOUBLE))
               / (1.0 - ((n11 + n10)::DOUBLE * (n11 + n01)::DOUBLE
                         + (n01 + n00)::DOUBLE * (n10 + n00)::DOUBLE)
                        / (n::DOUBLE * n::DOUBLE)), 6) END AS kappa
FROM t
"""


def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on daily event arrivals (staged for the
    round-5 rotation): randomness of above/below-median days — doubled
    median m2 keeps every comparison int64, exact run count, z promotes
    once; NULL z when one side is empty (the orders table degenerates
    exactly that way at sf0.001 — every day >= the median of 1)
    (`operators/timeseries.runs_test`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.runs_test(load_table(spark, sf_dir, "events"))


def o_runs_test() -> str:
    return """
WITH daily AS (
  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS di,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1),
nf AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM daily),
ranked AS (SELECT c, CAST(row_number() OVER (ORDER BY c ASC, di ASC) AS BIGINT) AS rn
           FROM daily),
m AS (SELECT CAST(sum(c * ((CASE WHEN rn = (nd + 1) // 2 THEN 1 ELSE 0 END)
                           + (CASE WHEN rn = (nd + 2) // 2 THEN 1 ELSE 0 END)))
             AS BIGINT) AS m2
      FROM ranked CROSS JOIN nf),
signs AS (SELECT di, CASE WHEN 2 * c > m2 THEN 1 WHEN 2 * c < m2 THEN -1 END AS s
          FROM daily CROSS JOIN m WHERE 2 * c != m2),
fl AS (SELECT s,
              CASE WHEN lag(s) OVER (ORDER BY di ASC) IS NULL THEN 1
                   WHEN lag(s) OVER (ORDER BY di ASC) != s THEN 1
                   ELSE 0 END AS new_run
       FROM signs),
g AS (SELECT CAST(coalesce(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_above,
             CAST(coalesce(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_below,
             CAST(coalesce(sum(new_run), 0) AS BIGINT) AS runs
      FROM fl)
SELECT n_above, n_below, runs,
       CASE WHEN n_above > 0 AND n_below > 0 THEN
         round(1.0 + 2.0 * n_above::DOUBLE * n_below::DOUBLE
                     / (n_above::DOUBLE + n_below::DOUBLE), 6) END AS expected_runs,
       CASE WHEN n_above > 0 AND n_below > 0 THEN
         round((runs::DOUBLE
                - (1.0 + 2.0 * n_above::DOUBLE * n_below::DOUBLE
                         / (n_above::DOUBLE + n_below::DOUBLE)))
               / sqrt(2.0 * n_above::DOUBLE * n_below::DOUBLE
                      * (2.0 * n_above::DOUBLE * n_below::DOUBLE
                         - n_above::DOUBLE - n_below::DOUBLE)
                      / ((n_above::DOUBLE + n_below::DOUBLE)
                         * (n_above::DOUBLE + n_below::DOUBLE)
                         * (n_above::DOUBLE + n_below::DOUBLE - 1.0))), 6) END AS z
FROM g
"""


def q_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index of order values at k = 50/100/200 (staged for
    the round-5 rotation): the heavy-tail / skew-posture scalar — one
    deterministic top-(kmax+1) shortlist, ln of exact cents, Hill-plot
    stability across k (`operators/sketch.hill_tail_index`)."""
    from pythonvectordb_spark.operators import sketch as SK

    return SK.hill_tail_index(load_table(spark, sf_dir, "orders"))


def o_hill_tail_index() -> str:
    return """
WITH top AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey AS k_
  FROM orders ORDER BY cents DESC, k_ ASC LIMIT 201),
ranked AS (SELECT cents,
                  CAST(row_number() OVER (ORDER BY cents DESC, k_ ASC) AS BIGINT) AS rn
           FROM top),
ks AS (SELECT * FROM (VALUES (50), (100), (200)) AS t(k)),
g AS (SELECT k,
             sum(CASE WHEN rn <= k THEN ln(cents::DOUBLE) END) AS s_log,
             max(CASE WHEN rn = k + 1 THEN cents END) AS xk1
      FROM ranked CROSS JOIN ks GROUP BY 1)
SELECT CAST(k AS INTEGER) AS k, CAST(xk1 AS BIGINT) AS xk1_cents,
       round(s_log - k::DOUBLE * ln(xk1::DOUBLE), 6) AS sum_log_excess,
       round(k::DOUBLE / (s_log - k::DOUBLE * ln(xk1::DOUBLE)), 6) AS alpha_hill
FROM g
"""


def q_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS slope of quantity on discount points (staged for
    the round-5 rotation): exact int64 moments, one double division,
    NULL on zero discount variance
    (`operators/relational.discount_quantity_elasticity`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.discount_quantity_elasticity(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def o_discount_elasticity() -> str:
    return """
WITH b AS (
  SELECT p.p_brand,
         CAST(round(l.l_discount * 100) AS BIGINT) AS x,
         CAST(round(l.l_quantity) AS BIGINT) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
g AS (
  SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM b GROUP BY 1)
SELECT p_brand, n,
       CASE WHEN n * sxx - sx * sx > 0 THEN
         round((n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE, 9)
       END AS slope_per_point
FROM g
"""


def q_return_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand return rate with a 95% Wilson interval (staged for the
    round-5 rotation): exact k/n counts, one pinned double-op sequence
    mirrored token-for-token (z^2 only as the literal 3.8416)
    (`operators/relational.return_rate_wilson`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.return_rate_wilson(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def o_return_rate_wilson() -> str:
    return """
WITH g AS (
  SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS k
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey GROUP BY 1),
f AS (SELECT p_brand, n, k, k::DOUBLE / n::DOUBLE AS p FROM g)
SELECT p_brand, n, k, round(p, 9) AS return_rate,
       round(((p + 3.8416 / (2.0 * n::DOUBLE))
              - 1.96 * sqrt((p * (1.0 - p) + 3.8416 / (4.0 * n::DOUBLE))
                            / n::DOUBLE))
             / (1.0 + 3.8416 / n::DOUBLE), 9) AS wilson_lo,
       round(((p + 3.8416 / (2.0 * n::DOUBLE))
              + 1.96 * sqrt((p * (1.0 - p) + 3.8416 / (4.0 * n::DOUBLE))
                            / n::DOUBLE))
             / (1.0 + 3.8416 / n::DOUBLE), 9) AS wilson_hi
FROM f
"""


def q_priority_segment_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of order priority x customer market
    segment with Cramer's V (staged for the round-5 rotation):
    (N*o - r*c)^2/(N*r*c) per cell — HUGEINT/DECIMAL(38) squares, one
    double division per cell (`operators/stats.contingency_chisq`)."""
    base = (
        load_table(spark, sf_dir, "orders")
        .join(
            F.broadcast(load_table(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("o_orderpriority", "c_mktsegment")
    )
    return ST.contingency_chisq(base, "o_orderpriority", "c_mktsegment")


def o_priority_segment_chisq() -> str:
    return """
WITH base AS (SELECT o.o_orderpriority AS r, c.c_mktsegment AS c
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
cells AS (SELECT r, c, CAST(count(*) AS BIGINT) AS o FROM base GROUP BY 1, 2),
rm AS (SELECT r, CAST(sum(o) AS BIGINT) AS rsum FROM cells GROUP BY 1),
cm AS (SELECT c, CAST(sum(o) AS BIGINT) AS csum FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS nn,
               CAST(count(DISTINCT r) AS BIGINT) AS nr,
               CAST(count(DISTINCT c) AS BIGINT) AS nc
        FROM cells),
grid AS (SELECT rm.r, cm.c, rm.rsum, cm.csum,
                CAST(coalesce(cells.o, 0) AS BIGINT) AS o
         FROM rm CROSS JOIN cm
         LEFT JOIN cells ON cells.r = rm.r AND cells.c = cm.c),
t AS (SELECT nn, nr, nc,
             ((nn * o - rsum * csum)::HUGEINT
              * (nn * o - rsum * csum)::HUGEINT)::DOUBLE
             / (nn * rsum * csum)::DOUBLE AS term
      FROM grid CROSS JOIN tot),
g AS (SELECT max(nn) AS n_rows, max(nr) AS nr, max(nc) AS nc,
             sum(term) AS chi
      FROM t)
SELECT CAST(n_rows AS BIGINT) AS n_rows,
       CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
       round(chi, 6) AS chisq,
       round(sqrt(chi / (n_rows::DOUBLE * (least(nr, nc) - 1)::DOUBLE)), 6)
           AS cramers_v
FROM g
"""


def q_source_decile_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Q-Q decile shift table of doc length vs the corpus
    (staged for the round-5 rotation): nearest-rank deciles located on
    DISTINCT-value frames — WHERE a source's length distribution
    deviates, completing `mann_whitney`'s whether
    (`operators/stats.source_decile_shift`)."""
    return ST.source_decile_shift(load_table(spark, sf_dir, "documents"))


def o_source_decile_shift() -> str:
    return """
WITH gvc AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v,
                    CAST(count(*) AS BIGINT) AS c
             FROM documents GROUP BY 1, 2),
gcu AS (SELECT g, v, c,
               CAST(sum(c) OVER (PARTITION BY g ORDER BY v ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum
        FROM gvc),
gtot AS (SELECT g, max(cum) AS n FROM gcu GROUP BY 1),
gks AS (SELECT g, n, k, (k * n + 9) // 10 AS r
        FROM gtot CROSS JOIN (SELECT unnest(range(1, 10)) AS k)),
gd AS (SELECT gcu.g, gks.k, CAST(max(v) AS BIGINT) AS source_value
       FROM gcu JOIN gks ON gcu.g = gks.g
       WHERE (cum - c) < r AND r <= cum GROUP BY 1, 2),
cvc AS (SELECT CAST(n_chars AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY 1),
ccu AS (SELECT v, c,
               CAST(sum(c) OVER (ORDER BY v ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum
        FROM cvc),
ctot AS (SELECT max(cum) AS n FROM ccu),
cks AS (SELECT n, k, (k * n + 9) // 10 AS r
        FROM ctot CROSS JOIN (SELECT unnest(range(1, 10)) AS k)),
cd AS (SELECT cks.k, CAST(max(v) AS BIGINT) AS corpus_value
       FROM ccu CROSS JOIN cks
       WHERE (cum - c) < r AND r <= cum GROUP BY 1)
SELECT gd.g AS source, CAST(gd.k AS INTEGER) AS decile,
       gd.source_value, cd.corpus_value,
       CAST(gd.source_value - cd.corpus_value AS BIGINT) AS shift
FROM gd JOIN cd ON gd.k = cd.k
"""


def q_source_js_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source token mixes
    (staged for the round-5 rotation): the symmetric bounded companion
    to `source_kl_matrix` — every ln over an exact int64 product,
    private-token mass pulled out analytically as (Np-C)*ln2
    (`operators/textops.source_js_matrix`)."""
    return TX.source_js_matrix(load_table(spark, sf_dir, "documents"))


def o_source_js_matrix() -> str:
    return f"""
WITH toks AS (SELECT source AS g, {O.sql_tokens('text')} AS tk FROM documents),
tt AS (SELECT g, t.t AS tok, CAST(count(*) AS BIGINT) AS c
       FROM toks, unnest(tk) AS t(t) GROUP BY 1, 2),
tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM tt GROUP BY 1),
pr AS (
  SELECT a.g AS ga, b.g AS gb, ta.n AS np_, tb.n AS nq_,
         a.c AS cp, b.c AS cq
  FROM tt a
  JOIN tt b ON a.tok = b.tok AND a.g < b.g
  JOIN tot ta ON ta.g = a.g
  JOIN tot tb ON tb.g = b.g),
g AS (
  SELECT ga, gb, np_, nq_,
         CAST(count(*) AS BIGINT) AS n_common,
         CAST(sum(cp) AS BIGINT) AS cp_common,
         CAST(sum(cq) AS BIGINT) AS cq_common,
         sum(cp::DOUBLE * (ln((2 * cp * nq_)::DOUBLE)
                           - ln((cp * nq_ + cq * np_)::DOUBLE))) AS sp,
         sum(cq::DOUBLE * (ln((2 * cq * np_)::DOUBLE)
                           - ln((cq * np_ + cp * nq_)::DOUBLE))) AS sq
  FROM pr GROUP BY 1, 2, 3, 4)
SELECT ga AS source_a, gb AS source_b, n_common,
       round(0.5 * ((((np_ - cp_common)::DOUBLE * ln(2.0) + sp) / np_::DOUBLE)
                    + (((nq_ - cq_common)::DOUBLE * ln(2.0) + sq) / nq_::DOUBLE)),
             6) AS js_divergence
FROM g
"""


def q_weekday_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square weekday uniformity of order arrivals (staged for the
    round-5 rotation): (7*sum(o^2) - N^2)/N — numerator exact int64,
    weekday = (epoch_day+4)%7 so no engine calendar is consulted
    (`operators/timeseries.weekday_uniformity`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.weekday_uniformity(load_table(spark, sf_dir, "orders"))


def o_weekday_uniformity() -> str:
    return """
WITH g AS (
  SELECT CAST((epoch_us(o_orderdate) // 86400000000 + 4) % 7 AS INTEGER) AS dow,
         CAST(count(*) AS BIGINT) AS o
  FROM orders GROUP BY 1),
t AS (SELECT CAST(sum(o) AS BIGINT) AS n, CAST(sum(o * o) AS BIGINT) AS so2,
             CAST(min(o) AS BIGINT) AS min_day, CAST(max(o) AS BIGINT) AS max_day
      FROM g)
SELECT n AS n_rows,
       round((7 * so2 - n * n)::DOUBLE / n::DOUBLE, 6) AS chisq,
       round(min_day::DOUBLE / n::DOUBLE, 9) AS min_day_share,
       round(max_day::DOUBLE / n::DOUBLE, 9) AS max_day_share
FROM t
"""


def q_value_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value across event types (staged for the
    round-5 rotation): F statistic + eta^2 from exact int64 moments,
    per-group S^2/n the only per-group float
    (`operators/stats.value_anova`)."""
    return ST.value_anova(load_table(spark, sf_dir, "events"))


def o_value_anova() -> str:
    return """
WITH g AS (
  SELECT event_type AS g, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS q
  FROM events GROUP BY 1),
t AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
         CAST(sum(s) AS BIGINT) AS ss, CAST(sum(q) AS BIGINT) AS qq,
         sum(s::DOUBLE * s::DOUBLE / n::DOUBLE) AS sg2n
  FROM g)
SELECT k AS n_groups, nn AS n_rows,
       CASE WHEN k > 1 AND nn > k AND (qq::DOUBLE - sg2n) > 0 THEN
         round(((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
                / (k::DOUBLE - 1.0))
               / ((qq::DOUBLE - sg2n) / (nn::DOUBLE - k::DOUBLE)), 6) END AS f_stat,
       CASE WHEN k > 1 AND nn > k
                 AND ((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
                      + (qq::DOUBLE - sg2n)) > 0 THEN
         round((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
               / ((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
                  + (qq::DOUBLE - sg2n)), 6) END AS eta_sq
FROM t
"""


def q_lognormal_jb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera lognormality test on order values (staged for the
    round-5 rotation): skewness/kurtosis/JB of ln(exact cents) via
    single-pass raw moments (`operators/stats.lognormal_jb`)."""
    return ST.lognormal_jb(load_table(spark, sf_dir, "orders"))


def o_lognormal_jb() -> str:
    return """
WITH x AS (SELECT ln(CAST(round(o_totalprice * 100) AS BIGINT)::DOUBLE) AS x
           FROM orders),
t AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS s1,
             sum(x * x) AS s2, sum(x * x * x) AS s3,
             sum(x * x * x * x) AS s4
      FROM x),
c AS (SELECT n,
             s2 / n::DOUBLE - (s1 / n::DOUBLE) * (s1 / n::DOUBLE) AS m2,
             s3 / n::DOUBLE - 3.0 * (s1 / n::DOUBLE) * (s2 / n::DOUBLE)
               + 2.0 * (s1 / n::DOUBLE) * (s1 / n::DOUBLE) * (s1 / n::DOUBLE) AS m3,
             s4 / n::DOUBLE - 4.0 * (s1 / n::DOUBLE) * (s3 / n::DOUBLE)
               + 6.0 * (s1 / n::DOUBLE) * (s1 / n::DOUBLE) * (s2 / n::DOUBLE)
               - 3.0 * (s1 / n::DOUBLE) * (s1 / n::DOUBLE)
                     * (s1 / n::DOUBLE) * (s1 / n::DOUBLE) AS m4
      FROM t)
SELECT n AS n_rows,
       round(m3 / (m2 * sqrt(m2)), 6) AS log_skewness,
       round(m4 / (m2 * m2) - 3.0, 6) AS log_excess_kurtosis,
       round(n::DOUBLE / 6.0
             * ((m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2)))
                + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0) / 4.0), 6)
           AS jarque_bera
FROM c
"""


def q_tax_discount_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of tax point x discount point on
    lineitem (staged for the round-5 rotation): OPERATOR REUSE — the
    same `stats.contingency_chisq` registered for priority x segment,
    pointed at two pricing knobs; V near 0 certifies the generators
    are independent (`operators/stats.contingency_chisq`)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_tax") * 100).cast("long").alias("tax_pt"),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_pt"),
    )
    return ST.contingency_chisq(li, "tax_pt", "disc_pt")


def o_tax_discount_chisq() -> str:
    return """
WITH base AS (SELECT CAST(round(l_tax * 100) AS BIGINT) AS r,
                     CAST(round(l_discount * 100) AS BIGINT) AS c
              FROM lineitem),
cells AS (SELECT r, c, CAST(count(*) AS BIGINT) AS o FROM base GROUP BY 1, 2),
rm AS (SELECT r, CAST(sum(o) AS BIGINT) AS rsum FROM cells GROUP BY 1),
cm AS (SELECT c, CAST(sum(o) AS BIGINT) AS csum FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS nn,
               CAST(count(DISTINCT r) AS BIGINT) AS nr,
               CAST(count(DISTINCT c) AS BIGINT) AS nc
        FROM cells),
grid AS (SELECT rm.r, cm.c, rm.rsum, cm.csum,
                CAST(coalesce(cells.o, 0) AS BIGINT) AS o
         FROM rm CROSS JOIN cm
         LEFT JOIN cells ON cells.r = rm.r AND cells.c = cm.c),
t AS (SELECT nn, nr, nc,
             ((nn * o - rsum * csum)::HUGEINT
              * (nn * o - rsum * csum)::HUGEINT)::DOUBLE
             / (nn * rsum * csum)::DOUBLE AS term
      FROM grid CROSS JOIN tot),
g AS (SELECT max(nn) AS n_rows, max(nr) AS nr, max(nc) AS nc,
             sum(term) AS chi
      FROM t)
SELECT CAST(n_rows AS BIGINT) AS n_rows,
       CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
       round(chi, 6) AS chisq,
       round(sqrt(chi / (n_rows::DOUBLE * (least(nr, nc) - 1)::DOUBLE)), 6)
           AS cramers_v
FROM g
"""


def q_weekend_value_mw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U of order value, weekend vs weekday band (staged
    for the round-5 rotation): OPERATOR REUSE — `stats.mann_whitney`
    pointed at exact cents with a (epoch_day+4)%7 band label; answers
    "do weekend orders differ in size" without any normality
    assumption (`operators/stats.mann_whitney`)."""
    day = (F.unix_micros(F.col("o_orderdate")) / F.lit(86_400_000_000)).cast("long")
    dow = (day + F.lit(4)) % F.lit(7)
    proj = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.when((dow == 0) | (dow == 6), F.lit("weekend"))
        .otherwise(F.lit("weekday"))
        .alias("band"),
    )
    return ST.mann_whitney(proj, value_col="cents", group_col="band")


def o_weekend_value_mw() -> str:
    return """
WITH base AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
         CASE WHEN (epoch_us(o_orderdate) // 86400000000 + 4) % 7 IN (0, 6)
              THEN 'weekend' ELSE 'weekday' END AS g
  FROM orders),
sv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS cg FROM base GROUP BY 1, 2),
vc AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1),
mid AS (SELECT v, c,
               CAST(2 * (sum(c) OVER (ORDER BY v ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
                    + c + 1 AS BIGINT) AS mr2
        FROM vc),
tots AS (SELECT CAST(sum(c) AS BIGINT) AS n_total,
                CAST(sum(c * c * c - c) AS BIGINT) AS tie3
         FROM mid),
per AS (SELECT g, CAST(sum(cg) AS BIGINT) AS n1,
               CAST(sum(cg * mr2) AS BIGINT) AS s2
        FROM sv JOIN mid USING (v) GROUP BY 1)
SELECT g AS band, n1 AS n_group,
       CAST(n_total - n1 AS BIGINT) AS n_rest,
       CAST(s2 - n1 * (n1 + 1) AS BIGINT) AS u2,
       round(((s2 - n1 * (n1 + 1))::DOUBLE / 2.0
              - n1::DOUBLE * (n_total - n1)::DOUBLE / 2.0)
             / sqrt((n1::DOUBLE * (n_total - n1)::DOUBLE / 12.0)
                    * ((n_total::DOUBLE + 1.0)
                       - tie3::DOUBLE
                         / (n_total::DOUBLE * (n_total::DOUBLE - 1.0)))), 6) AS z,
       round(1.0 - (s2 - n1 * (n1 + 1))::DOUBLE
                   / (n1::DOUBLE * (n_total - n1)::DOUBLE), 6) AS rank_biserial
FROM per CROSS JOIN tots
"""


def q_lang_length_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of doc length across languages (staged for the
    round-5 rotation): OPERATOR REUSE — `stats.value_anova` pointed at
    n_chars by lang; eta^2 says whether per-language chunking budgets
    are justified (`operators/stats.value_anova`)."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("double").alias("len_chars"),
        F.col("lang"),
    )
    return ST.value_anova(docs, value_col="len_chars", group_col="lang")


def o_lang_length_anova() -> str:
    return """
WITH g AS (
  SELECT lang AS g, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(n_chars * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CAST(round(n_chars * 100) AS BIGINT)
                  * CAST(round(n_chars * 100) AS BIGINT)) AS BIGINT) AS q
  FROM documents GROUP BY 1),
t AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
         CAST(sum(s) AS BIGINT) AS ss, CAST(sum(q) AS BIGINT) AS qq,
         sum(s::DOUBLE * s::DOUBLE / n::DOUBLE) AS sg2n
  FROM g)
SELECT k AS n_groups, nn AS n_rows,
       CASE WHEN k > 1 AND nn > k AND (qq::DOUBLE - sg2n) > 0 THEN
         round(((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
                / (k::DOUBLE - 1.0))
               / ((qq::DOUBLE - sg2n) / (nn::DOUBLE - k::DOUBLE)), 6) END AS f_stat,
       CASE WHEN k > 1 AND nn > k
                 AND ((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
                      + (qq::DOUBLE - sg2n)) > 0 THEN
         round((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
               / ((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
                  + (qq::DOUBLE - sg2n)), 6) END AS eta_sq
FROM t
"""


def q_price_ending_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 cents endings of order totals (staged for the round-5
    rotation): the psychological-pricing / provenance fingerprint —
    exact counts, fully tie-broken ranking
    (`operators/relational.price_ending_profile`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.price_ending_profile(load_table(spark, sf_dir, "orders"))


def o_price_ending_profile() -> str:
    return """
WITH g AS (SELECT CAST(CAST(round(o_totalprice * 100) AS BIGINT) % 100 AS INTEGER)
                      AS ending,
                  CAST(count(*) AS BIGINT) AS c
           FROM orders GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM g),
r AS (SELECT ending, c,
             CAST(row_number() OVER (ORDER BY c DESC, ending ASC) AS INTEGER)
                 AS rank
      FROM g)
SELECT rank, ending, c AS n_orders,
       round(c::DOUBLE / t::DOUBLE, 9) AS share
FROM r CROSS JOIN tot WHERE rank <= 10
"""


def q_supplier_balance_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson r between supplier account balance and booked revenue
    (staged for the round-5 rotation): exact moments with DECIMAL(38)
    cross-products, one pinned double assembly
    (`operators/relational.supplier_balance_revenue_corr`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.supplier_balance_revenue_corr(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "supplier")
    )


def o_supplier_balance_corr() -> str:
    return """
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
             AS rev_e4
  FROM lineitem GROUP BY 1),
j AS (SELECT CAST(round(s.s_acctbal * 100) AS BIGINT) AS x, rev.rev_e4 AS y
      FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey),
g AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             sum(x::HUGEINT * y::HUGEINT) AS sxy,
             sum(x::HUGEINT * x::HUGEINT) AS sxx,
             sum(y::HUGEINT * y::HUGEINT) AS syy
      FROM j)
SELECT n AS n_suppliers,
       CASE WHEN (n::HUGEINT * sxx - sx::HUGEINT * sx::HUGEINT)::DOUBLE > 0
             AND (n::HUGEINT * syy - sy::HUGEINT * sy::HUGEINT)::DOUBLE > 0 THEN
         round((n::HUGEINT * sxy - sx::HUGEINT * sy::HUGEINT)::DOUBLE
               / (sqrt((n::HUGEINT * sxx - sx::HUGEINT * sx::HUGEINT)::DOUBLE)
                  * sqrt((n::HUGEINT * syy - sy::HUGEINT * sy::HUGEINT)::DOUBLE)),
               6) END AS balance_revenue_corr
FROM g
"""


def q_priority_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year chi-square of the priority mix vs the all-years mix
    (staged for the round-5 rotation): localizes WHEN a categorical
    mix moved — completed grid, DECIMAL(38)/HUGEINT squares
    (`operators/relational.priority_mix_drift`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.priority_mix_drift(load_table(spark, sf_dir, "orders"))


def o_priority_mix_drift() -> str:
    return """
WITH cells AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS y, o_orderpriority AS p,
         CAST(count(*) AS BIGINT) AS o
  FROM orders GROUP BY 1, 2),
ym AS (SELECT y, CAST(sum(o) AS BIGINT) AS n_y FROM cells GROUP BY 1),
pm AS (SELECT p, CAST(sum(o) AS BIGINT) AS c_p FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM cells),
grid AS (SELECT ym.y, ym.n_y, pm.c_p, tot.nn,
                CAST(coalesce(cells.o, 0) AS BIGINT) AS o
         FROM ym CROSS JOIN pm CROSS JOIN tot
         LEFT JOIN cells ON cells.y = ym.y AND cells.p = pm.p)
SELECT y AS order_year, CAST(max(n_y) AS BIGINT) AS n_orders,
       round(sum(((nn * o - n_y * c_p)::HUGEINT
                  * (nn * o - n_y * c_p)::HUGEINT)::DOUBLE
                 / (nn * n_y * c_p)::DOUBLE), 6) AS chisq_vs_global
FROM grid GROUP BY 1
"""


def q_returnflag_quantity_mw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U of line quantity, each return flag vs the rest
    (staged for the round-5 rotation): OPERATOR REUSE — do returned
    lines ship systematically bigger quantities? Distribution-free,
    exact doubled midranks (`operators/stats.mann_whitney`)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_quantity")).cast("long").alias("qty_units"),
        F.col("l_returnflag"),
    )
    return ST.mann_whitney(li, value_col="qty_units", group_col="l_returnflag")


def o_returnflag_quantity_mw() -> str:
    return """
WITH base AS (SELECT CAST(round(l_quantity) AS BIGINT) AS v, l_returnflag AS g
              FROM lineitem),
sv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS cg FROM base GROUP BY 1, 2),
vc AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1),
mid AS (SELECT v, c,
               CAST(2 * (sum(c) OVER (ORDER BY v ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
                    + c + 1 AS BIGINT) AS mr2
        FROM vc),
tots AS (SELECT CAST(sum(c) AS BIGINT) AS n_total,
                CAST(sum(c * c * c - c) AS BIGINT) AS tie3
         FROM mid),
per AS (SELECT g, CAST(sum(cg) AS BIGINT) AS n1,
               CAST(sum(cg * mr2) AS BIGINT) AS s2
        FROM sv JOIN mid USING (v) GROUP BY 1)
SELECT g AS l_returnflag, n1 AS n_group,
       CAST(n_total - n1 AS BIGINT) AS n_rest,
       CAST(s2 - n1 * (n1 + 1) AS BIGINT) AS u2,
       round(((s2 - n1 * (n1 + 1))::DOUBLE / 2.0
              - n1::DOUBLE * (n_total - n1)::DOUBLE / 2.0)
             / sqrt((n1::DOUBLE * (n_total - n1)::DOUBLE / 12.0)
                    * ((n_total::DOUBLE + 1.0)
                       - tie3::DOUBLE
                         / (n_total::DOUBLE * (n_total::DOUBLE - 1.0)))), 6) AS z,
       round(1.0 - (s2 - n1 * (n1 + 1))::DOUBLE
                   / (n1::DOUBLE * (n_total - n1)::DOUBLE), 6) AS rank_biserial
FROM per CROSS JOIN tots
"""


def q_daypart_value_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value across day-parts (staged for the
    round-5 rotation): OPERATOR REUSE — `stats.value_anova` grouped by
    an integer-hour CASE band (night/morning/afternoon/evening); eta^2
    says whether time-of-day pricing is real
    (`operators/stats.value_anova`)."""
    hh = (F.unix_micros(F.col("ts")) / F.lit(3_600_000_000)).cast("long") % F.lit(24)
    band = (
        F.when(hh < 6, F.lit("night"))
        .when(hh < 12, F.lit("morning"))
        .when(hh < 18, F.lit("afternoon"))
        .otherwise(F.lit("evening"))
    )
    ev = load_table(spark, sf_dir, "events").select(
        F.col("value"), band.alias("daypart")
    )
    return ST.value_anova(ev, value_col="value", group_col="daypart")


def o_daypart_value_anova() -> str:
    return """
WITH g AS (
  SELECT CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 6 THEN 'night'
              WHEN (epoch_us(ts) // 3600000000) % 24 < 12 THEN 'morning'
              WHEN (epoch_us(ts) // 3600000000) % 24 < 18 THEN 'afternoon'
              ELSE 'evening' END AS g,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS q
  FROM events GROUP BY 1),
t AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
         CAST(sum(s) AS BIGINT) AS ss, CAST(sum(q) AS BIGINT) AS qq,
         sum(s::DOUBLE * s::DOUBLE / n::DOUBLE) AS sg2n
  FROM g)
SELECT k AS n_groups, nn AS n_rows,
       CASE WHEN k > 1 AND nn > k AND (qq::DOUBLE - sg2n) > 0 THEN
         round(((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
                / (k::DOUBLE - 1.0))
               / ((qq::DOUBLE - sg2n) / (nn::DOUBLE - k::DOUBLE)), 6) END AS f_stat,
       CASE WHEN k > 1 AND nn > k
                 AND ((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
                      + (qq::DOUBLE - sg2n)) > 0 THEN
         round((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
               / ((sg2n - ss::DOUBLE * ss::DOUBLE / nn::DOUBLE)
                  + (qq::DOUBLE - sg2n)), 6) END AS eta_sq
FROM t
"""


def q_discount_quantity_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between line discount and quantity
    (new round 5): the tie-aware monotone-association test — do bigger
    lines actually get bigger discounts? Completes the correlation
    family (Pearson `supplier_balance_corr`, concordance `kendall_tau`)
    with the midrank estimator; ranks never materialize per row
    (`operators/stats.spearman_corr`)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_discount") * 100).cast("long").alias("disc"),
        F.round("l_quantity").cast("long").alias("qty"),
    )
    return ST.spearman_corr(li, "disc", "qty", n_label="n_rows")


def o_discount_quantity_spearman() -> str:
    return """
WITH pairs AS (
  SELECT CAST(round(l_discount * 100) AS BIGINT) AS x,
         CAST(round(l_quantity) AS BIGINT) AS y,
         CAST(count(*) AS BIGINT) AS cxy
  FROM lineitem GROUP BY 1, 2
),
mx AS (
  SELECT x, CAST(2 * (sum(c) OVER (ORDER BY x ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
               + c + 1 AS BIGINT) AS mr2x
  FROM (SELECT x, CAST(sum(cxy) AS BIGINT) AS c FROM pairs GROUP BY 1)
),
my AS (
  SELECT y, CAST(2 * (sum(c) OVER (ORDER BY y ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
               + c + 1 AS BIGINT) AS mr2y
  FROM (SELECT y, CAST(sum(cxy) AS BIGINT) AS c FROM pairs GROUP BY 1)
),
j AS (SELECT cxy, mr2x, mr2y FROM pairs JOIN mx USING (x) JOIN my USING (y)),
g AS (SELECT CAST(count(*) AS BIGINT) AS n_cells, CAST(sum(cxy) AS BIGINT) AS n,
             CAST(sum(cxy * mr2x) AS BIGINT) AS sx,
             CAST(sum(cxy * mr2y) AS BIGINT) AS sy,
             sum(cxy::HUGEINT * mr2x::HUGEINT * mr2y::HUGEINT) AS sxy,
             sum(cxy::HUGEINT * mr2x::HUGEINT * mr2x::HUGEINT) AS sxx,
             sum(cxy::HUGEINT * mr2y::HUGEINT * mr2y::HUGEINT) AS syy
      FROM j)
SELECT n AS n_rows, n_cells,
       CASE WHEN (n::HUGEINT * sxx - sx::HUGEINT * sx::HUGEINT)::DOUBLE > 0
             AND (n::HUGEINT * syy - sy::HUGEINT * sy::HUGEINT)::DOUBLE > 0
       THEN round((n::HUGEINT * sxy - sx::HUGEINT * sy::HUGEINT)::DOUBLE
                  / (sqrt((n::HUGEINT * sxx - sx::HUGEINT * sx::HUGEINT)::DOUBLE)
                     * sqrt((n::HUGEINT * syy - sy::HUGEINT * sy::HUGEINT)::DOUBLE)),
                  6)
       END AS spearman_rho
FROM g
"""


def q_welch_ttest_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Welch t / Welch-Satterthwaite df / Cohen's d / Hedges' g
    over source doc lengths (new round 7): the parametric companion to
    `mann_whitney` with the effect sizes a corpus report quotes
    (`operators/stats.welch_ttest_matrix`)."""
    return ST.welch_ttest_matrix(load_table(spark, sf_dir, "documents"))


def o_welch_ttest_sources() -> str:
    return """
WITH per AS (SELECT source AS g, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(n_chars) AS BIGINT) AS s,
                    CAST(sum(n_chars * n_chars) AS BIGINT) AS ss
             FROM documents GROUP BY 1),
j AS (SELECT a.g AS ga, a.n AS na, a.s AS sa, a.ss AS ssa,
             b.g AS gb, b.n AS nb, b.s AS sb, b.ss AS ssb
      FROM per a JOIN per b ON a.g < b.g),
c AS (SELECT ga, gb, na, nb,
             sa::DOUBLE / na::DOUBLE AS m1,
             sb::DOUBLE / nb::DOUBLE AS m2,
             (ssa::DOUBLE - sa::DOUBLE * sa::DOUBLE / na::DOUBLE)
               / (na::DOUBLE - 1.0) AS v1,
             (ssb::DOUBLE - sb::DOUBLE * sb::DOUBLE / nb::DOUBLE)
               / (nb::DOUBLE - 1.0) AS v2
      FROM j),
e AS (SELECT ga, gb, na, nb, m1, m2, v1, v2,
             v1 / na::DOUBLE AS se1, v2 / nb::DOUBLE AS se2
      FROM c)
SELECT ga AS source_a, gb AS source_b, na AS n_a, nb AS n_b,
       round(m1, 6) AS mean_a, round(m2, 6) AS mean_b,
       round((m1 - m2) / sqrt(se1 + se2), 6) AS t_welch,
       round(((se1 + se2) * (se1 + se2))
             / (se1 * se1 / (na::DOUBLE - 1.0)
                + se2 * se2 / (nb::DOUBLE - 1.0)), 6) AS df_welch,
       round((m1 - m2) / sqrt(((na::DOUBLE - 1.0) * v1 + (nb::DOUBLE - 1.0) * v2)
                              / (na::DOUBLE + nb::DOUBLE - 2.0)), 6) AS cohen_d,
       round((1.0 - 3.0 / (4.0 * (na::DOUBLE + nb::DOUBLE) - 9.0))
             * ((m1 - m2) / sqrt(((na::DOUBLE - 1.0) * v1 + (nb::DOUBLE - 1.0) * v2)
                                 / (na::DOUBLE + nb::DOUBLE - 2.0))), 6) AS hedges_g
FROM e
"""


def q_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagonal-covariance Mahalanobis (value, hour) joint-outlier
    census per event type vs the chi-squared(2, 99%) threshold (new
    round 7): the multivariate companion to `event_outliers`
    (`operators/stats.mahalanobis_outliers`)."""
    return ST.mahalanobis_outliers(load_table(spark, sf_dir, "events"))


def o_mahalanobis_outliers() -> str:
    return """
WITH base AS (SELECT event_type AS t, CAST(round(value * 100) AS BIGINT) AS v,
                     CAST(hour(ts) AS BIGINT) AS h
              FROM events),
mom AS (SELECT t, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS BIGINT) AS sv, CAST(sum(v * v) AS BIGINT) AS svv,
               CAST(sum(h) AS BIGINT) AS sh, CAST(sum(h * h) AS BIGINT) AS shh
        FROM base GROUP BY 1),
momx AS (SELECT t, n,
                sv::DOUBLE / n::DOUBLE AS mv,
                (svv::DOUBLE - sv::DOUBLE * sv::DOUBLE / n::DOUBLE)
                  / (n::DOUBLE - 1.0) AS vv,
                sh::DOUBLE / n::DOUBLE AS mh,
                (shh::DOUBLE - sh::DOUBLE * sh::DOUBLE / n::DOUBLE)
                  / (n::DOUBLE - 1.0) AS vh
         FROM mom),
scored AS (SELECT b.t, m.n,
                  (b.v::DOUBLE - m.mv) * (b.v::DOUBLE - m.mv) / m.vv
                  + (b.h::DOUBLE - m.mh) * (b.h::DOUBLE - m.mh) / m.vh AS z2
           FROM base b JOIN momx m ON b.t = m.t),
g AS (SELECT t, n,
             CAST(sum(CASE WHEN z2 > 9.21034 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers,
             max(z2) AS mz
      FROM scored GROUP BY 1, 2)
SELECT t AS event_type, n, n_outliers,
       round(n_outliers::DOUBLE / n::DOUBLE, 6) AS outlier_rate,
       round(mz, 6) AS max_z2
FROM g
"""


def q_ks_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise two-sample KS distances over all source pairs with
    Benjamini-Hochberg FDR control (new round 7): exact integer ECDF
    lattice, one-term asymptotic p from an exact rational ne*D^2, BH
    ranking over the pair frame (`operators/stats.ks_bh_fdr_matrix`)."""
    return ST.ks_bh_fdr_matrix(load_table(spark, sf_dir, "documents"))


def o_ks_bh_fdr() -> str:
    return """
WITH base AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v FROM documents),
counts AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1, 2),
grid AS (SELECT DISTINCT v FROM base),
groups AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1),
filled AS (SELECT gr.g, gd.v, gr.n, coalesce(c.c, 0)::BIGINT AS c
           FROM grid gd CROSS JOIN groups gr
           LEFT JOIN counts c ON c.g = gr.g AND c.v = gd.v),
ecdf AS (SELECT g, v, n,
                CAST(sum(c) OVER (PARTITION BY g ORDER BY v ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS cume
         FROM filled),
pairs AS (SELECT a.g AS source_a, b.g AS source_b, a.n AS n_a, b.n AS n_b,
                 CAST(max(abs(a.cume * b.n - b.cume * a.n)) AS BIGINT) AS d_num
          FROM ecdf a JOIN ecdf b ON a.v = b.v AND a.g < b.g
          GROUP BY 1, 2, 3, 4),
scored AS (SELECT source_a, source_b, n_a, n_b,
                  round(d_num::DOUBLE / (n_a::DOUBLE * n_b::DOUBLE), 6) AS d_stat,
                  least(1.0, 2.0 * exp(-2.0 * (d_num::DOUBLE * d_num::DOUBLE
                        / ((n_a::DOUBLE + n_b::DOUBLE)
                           * n_a::DOUBLE * n_b::DOUBLE)))) AS p
           FROM pairs),
ranked AS (SELECT *,
                  CAST(row_number() OVER (ORDER BY p ASC, source_a ASC,
                                          source_b ASC) AS BIGINT) AS p_rank,
                  CAST(count(*) OVER () AS BIGINT) AS m
           FROM scored),
flagged AS (SELECT *,
                   p <= p_rank::DOUBLE * 0.05 / m::DOUBLE AS under
            FROM ranked),
kst AS (SELECT *,
               CAST(max(CASE WHEN under THEN p_rank ELSE 0 END) OVER ()
                    AS BIGINT) AS kstar
        FROM flagged)
SELECT source_a, source_b, n_a, n_b, d_stat,
       round(p, 6) AS p_ks, p_rank,
       round(p_rank::DOUBLE * 0.05 / m::DOUBLE, 6) AS bh_cut,
       CAST(CASE WHEN p_rank <= kstar THEN 1 ELSE 0 END AS BIGINT) AS rejected
FROM kst
"""


def q_stratification_deff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Design effect of source-stratified sampling for mean document
    length (new round 7): exact per-stratum integer moments, within /
    total variance ratio under proportional allocation
    (`operators/stats.stratification_design_effect`)."""
    return ST.stratification_design_effect(load_table(spark, sf_dir, "documents"))


def o_stratification_deff() -> str:
    return """
WITH per AS (SELECT source AS g, CAST(count(*) AS BIGINT) AS n_h,
                    CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS s_h,
                    CAST(sum(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT))
                         AS BIGINT) AS ss_h
             FROM documents GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
               CAST(sum(n_h) AS BIGINT) AS n,
               CAST(sum(s_h) AS BIGINT) AS s,
               CAST(sum(ss_h) AS BIGINT) AS ss,
               sum(n_h::DOUBLE * (CASE WHEN n_h > 1 THEN
                     (ss_h::DOUBLE - s_h::DOUBLE * s_h::DOUBLE / n_h::DOUBLE)
                       / (n_h::DOUBLE - 1.0) END)) AS w_num
        FROM per)
SELECT n AS n_rows, n_strata,
       round(sqrt((ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
                  / (n::DOUBLE - 1.0)), 6) AS sd_total,
       round(sqrt(w_num / n::DOUBLE), 6) AS sd_within,
       CASE WHEN (ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
                 / (n::DOUBLE - 1.0) > 0.0 THEN
         round((w_num / n::DOUBLE)
               / ((ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
                  / (n::DOUBLE - 1.0)), 6) END AS deff,
       CASE WHEN (ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
                 / (n::DOUBLE - 1.0) > 0.0 THEN
         round((1.0 - (w_num / n::DOUBLE)
                / ((ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
                   / (n::DOUBLE - 1.0))) * 100.0, 6) END AS var_reduction_pct
FROM tot
"""
