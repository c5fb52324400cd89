"""Statistical operators: deterministic Poisson bootstrap and IVF
cluster-balance audit — behavioral contracts on planted fixtures (oracle
parity runs through the registry)."""


def test_bootstrap_ci_degenerate_on_constant(spark):
    """A constant column makes every replicate mean equal the value, so
    the CI collapses to a point and the full mean matches."""
    from pythonvectordb_spark.operators.stats import bootstrap_mean_ci

    df = spark.createDataFrame(
        [(i, 500) for i in range(100)], "id long, cents long"
    )
    (r,) = bootstrap_mean_ci(df, "cents", "id", n_boot=40).collect()
    assert r["n_rows"] == 100 and r["n_boot"] == 40
    assert r["mean_cents"] == r["ci_lo_cents"] == r["ci_hi_cents"] == 500.0


def test_bootstrap_ci_brackets_mean(spark):
    """On a spread sample the trimmed CI brackets the full mean and is
    strictly ordered."""
    from pythonvectordb_spark.operators.stats import bootstrap_mean_ci

    df = spark.createDataFrame(
        [(i, (i * 37) % 1000) for i in range(400)], "id long, cents long"
    )
    (r,) = bootstrap_mean_ci(df, "cents", "id", n_boot=40).collect()
    assert r["ci_lo_cents"] < r["mean_cents"] < r["ci_hi_cents"]


def test_ivf_balance_counts_and_moments(spark):
    """Planted assignment 4/2/0 over three centroids: one empty cell,
    imbalance = max*k/n = 2, cv = sqrt(k*sum(c^2) - n^2)/n."""
    import math

    from pythonvectordb_spark.operators.stats import ivf_balance

    cents = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]]
    vecs = [[0.9, 0.1]] * 4 + [[0.1, 0.9]] * 2
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    (r,) = ivf_balance(df, cents).collect()
    assert r["n_vectors"] == 6 and r["n_centroids"] == 3 and r["n_empty"] == 1
    assert r["min_count"] == 0 and r["max_count"] == 4
    assert r["imbalance"] == 2.0
    assert r["cv"] == round(math.sqrt(3 * 20 - 36) / 6, 6)


def test_twonn_planted_geometry(spark):
    """Four unit vectors in the plane at angles 0, 10, 25, 90 degrees
    (dim-4 padding): every r1/r2 pair is hand-derivable from the
    quantized int8 cosines; duplicates of the 0-degree vector are
    excluded by the d=0 rule (vec 99 is an exact copy of vec 0)."""
    import math

    import numpy as np

    from pythonvectordb_spark.operators.search import with_qvec
    from pythonvectordb_spark.operators.stats import twonn_intrinsic_dim

    def v(deg):
        a = math.radians(deg)
        return [math.cos(a), math.sin(a), 0.0, 0.0]

    rows = [(0, v(0)), (1, v(10)), (2, v(25)), (3, v(90)), (99, v(0))]
    df = with_qvec(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    )
    (r,) = twonn_intrinsic_dim(df).collect()

    # replicate: float32 input, normalize, clamp, trunc-toward-zero int8
    # (the quantize() contract), then exact integer cosine
    def quant(vec):
        x = np.asarray(vec, dtype=np.float32).astype(np.float64)
        x = x / math.sqrt(float((x * x).sum()))
        return np.trunc(np.clip(x * 127.0, -128.0, 127.0)).astype(np.int64)

    q = {i: quant(vec) for i, vec in rows}

    def d(i, j):
        a, b = q[i].astype(np.int64), q[j].astype(np.int64)
        cos = float(int(a @ b)) / (math.sqrt(float(int(a @ a))) * math.sqrt(float(int(b @ b))))
        return round(1.0 - cos, 9)

    ids = [0, 1, 2, 3, 99]
    import itertools
    terms = []
    for i in ids:
        ds = sorted(d(i, j) for j in ids if j != i and d(i, j) > 0)
        if len(ds) >= 2:
            terms.append(math.log(ds[1] / ds[0]))
    want_sum = round(sum(terms), 6)
    assert r["n_vectors"] == len(terms) == 5
    assert r["sum_log_mu"] == want_sum
    assert r["id_twonn"] == round(len(terms) / want_sum, 6)


def test_mann_whitney_separated_groups(spark):
    """Group A = {1,2,3} vs rest B = {4,5,6}: A's rank sum is minimal,
    U = 0, rank-biserial = 1, z = -4.5/sqrt(5.25)."""
    import math

    from pythonvectordb_spark.operators.stats import mann_whitney

    rows = [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b"), (6, "b")]
    df = spark.createDataFrame(rows, "n_chars long, source string")
    got = {r["source"]: r for r in mann_whitney(df).collect()}
    a = got["a"]
    assert a["n_group"] == 3 and a["n_rest"] == 3
    assert a["u2"] == 0
    assert a["rank_biserial"] == 1.0
    assert a["z"] == round(-4.5 / math.sqrt(5.25), 6)
    b = got["b"]
    assert b["u2"] == 2 * 9 and b["rank_biserial"] == -1.0


def test_mann_whitney_all_ties(spark):
    """Every value identical: the tie correction drives Var[U] to
    exactly zero, so z is NULL; the integer parts stay exact
    (midrank2 = 5, S2 = 10, u2 = 10 - 2*3 = 4, rank-biserial 0)."""
    from pythonvectordb_spark.operators.stats import mann_whitney

    rows = [(7, "a")] * 2 + [(7, "b")] * 2
    df = spark.createDataFrame(rows, "n_chars long, source string")
    got = {r["source"]: r for r in mann_whitney(df).collect()}
    assert got["a"]["u2"] == 4 and got["a"]["rank_biserial"] == 0.0
    assert got["a"]["z"] is None


def test_ivf_silhouette_planted_geometry(spark):
    """Two orthogonal unit centroids; a vector ON centroid 0 has a=0,
    b=1, s=1; a 45-degree vector has a=b and s=0."""
    import math

    from pythonvectordb_spark.operators.stats import ivf_silhouette

    c0 = [1.0, 0.0]
    c1 = [0.0, 1.0]
    h = 1.0 / math.sqrt(2.0)
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [h, h])], "vec_id long, embedding array<double>"
    )
    got = {r["cluster"]: r for r in ivf_silhouette(df, [c0, c1]).collect()}
    # both vectors argmax to cluster 0 (first max wins the 45-degree tie)
    assert got[0]["n_vectors"] == 2
    assert got[0]["min_sil"] == 0.0
    assert got[0]["mean_sil"] == 0.5


def test_embedding_effective_rank_extremes(spark):
    """All mass on one axis -> eff_rank 1; two balanced orthogonal axes
    -> eff_rank 2 (exact integer Gram both ways)."""
    from pythonvectordb_spark.operators.stats import embedding_effective_rank

    one = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    (r,) = embedding_effective_rank(one).collect()
    assert r["n_vectors"] == 2 and r["dim"] == 2
    assert r["eff_rank"] == 1.0
    two = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    (r,) = embedding_effective_rank(two).collect()
    # trace = 2*127^2, frob2 = 2*(127^2)^2 -> (tr^2)/frob2 = 2
    assert r["eff_rank"] == 2.0


def test_contingency_chisq_independent_and_perfect(spark):
    """A perfectly balanced 2x2 table has chisq = 0 and V = 0; a
    diagonal 2x2 table has chisq = N and V = 1."""
    from pythonvectordb_spark.operators.stats import contingency_chisq

    flat = spark.createDataFrame(
        [("a", "x")] * 5 + [("a", "y")] * 5 + [("b", "x")] * 5 + [("b", "y")] * 5,
        "r string, c string",
    )
    (r,) = contingency_chisq(flat, "r", "c").collect()
    assert r["n_rows"] == 20 and r["dof"] == 1
    assert r["chisq"] == 0.0 and r["cramers_v"] == 0.0
    diag = spark.createDataFrame(
        [("a", "x")] * 6 + [("b", "y")] * 6, "r string, c string"
    )
    (r,) = contingency_chisq(diag, "r", "c").collect()
    assert r["chisq"] == 12.0 and r["cramers_v"] == 1.0


def test_source_decile_shift_uniform_vs_shifted(spark):
    """Source A holds values 1..10, source B holds 11..20; the corpus
    is 1..20. A's deciles sit below the corpus deciles, B's above, and
    decile k of each source is exactly k (A) / 10+k (B)."""
    from pythonvectordb_spark.operators.stats import source_decile_shift

    rows = [(v, "A") for v in range(1, 11)] + [(v, "B") for v in range(11, 21)]
    df = spark.createDataFrame(rows, "n_chars long, source string")
    got = {(r["source"], r["decile"]): r for r in source_decile_shift(df).collect()}
    assert len(got) == 18
    for k in range(1, 10):
        corpus_k = 2 * k  # nearest-rank decile of 1..20
        assert got[("A", k)]["source_value"] == k
        assert got[("A", k)]["corpus_value"] == corpus_k
        assert got[("A", k)]["shift"] == k - corpus_k
        assert got[("B", k)]["source_value"] == 10 + k
        assert got[("B", k)]["shift"] == 10 + k - corpus_k


def test_value_anova_extremes(spark):
    """Identical group means give F = 0 and eta^2 = 0; groups with all
    variance BETWEEN them give eta^2 = 1."""
    from pythonvectordb_spark.operators.stats import value_anova

    same = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0)],
        "event_type string, value double",
    )
    (r,) = value_anova(same).collect()
    assert r["n_groups"] == 2 and r["n_rows"] == 4
    assert r["f_stat"] == 0.0 and r["eta_sq"] == 0.0
    between = spark.createDataFrame(
        [("a", 2.0), ("a", 2.0), ("b", 5.0), ("b", 5.0)],
        "event_type string, value double",
    )
    (r,) = value_anova(between).collect()
    # all variance between groups: eta^2 = 1, F undefined (ssw = 0)
    assert r["eta_sq"] == 1.0
    assert r["f_stat"] is None
    single = spark.createDataFrame([("a", 1.0)], "event_type string, value double")
    (r,) = value_anova(single).collect()
    assert r["f_stat"] is None and r["eta_sq"] is None


def test_lognormal_jb_symmetric_sample(spark):
    """A symmetric two-point sample in log space has zero skewness and
    kurtosis exactly -2 (two-point distribution), JB = n/6 * 1."""
    from pythonvectordb_spark.operators.stats import lognormal_jb

    # cents 100 and 10000: ln values ln(100), ln(10000) symmetric around
    # their midpoint; two-point distribution has excess kurtosis -2
    orders = spark.createDataFrame(
        [(1, 1.0), (2, 100.0), (3, 1.0), (4, 100.0)],
        "o_orderkey long, o_totalprice double",
    )
    (r,) = lognormal_jb(orders).collect()
    assert r["n_rows"] == 4
    assert r["log_skewness"] == 0.0
    assert r["log_excess_kurtosis"] == -2.0
    assert r["jarque_bera"] == round(4 / 6.0 * (0.0 + 4.0 / 4.0), 6)


def test_spearman_corr_hand_computed_ties(spark):
    """x=[1,1,2,2], y=[1,2,3,3]: midranks x=(1.5,1.5,3.5,3.5),
    y=(1,2,3.5,3.5) -> rho = 4/sqrt(18); monotone data -> exactly 1;
    constant column -> NULL (zero variance). Repartitioned input so the
    value-frame cumulative window sees a real distribution."""
    import math

    from pythonvectordb_spark.operators.stats import spearman_corr

    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 3), (2, 3)], "x long, y long"
    ).repartition(4)
    row = spearman_corr(df, "x", "y").collect()[0]
    assert row.n_rows == 4 and row.n_cells == 3
    assert abs(row.spearman_rho - round(4 / math.sqrt(18), 6)) < 1e-9

    mono = spark.createDataFrame(
        [(i, i * i) for i in range(1, 8)], "x long, y long"
    ).repartition(3)
    assert abs(spearman_corr(mono, "x", "y").collect()[0].spearman_rho - 1.0) < 1e-9

    const = spark.createDataFrame([(1, 5), (2, 5)], "x long, y long")
    assert spearman_corr(const, "x", "y").collect()[0].spearman_rho is None


def test_kruskal_wallis_hand_computed(spark):
    """Three groups with ties; H checked against the textbook formula
    computed directly in Python (midranks, tie correction)."""
    from pythonvectordb_spark.operators.stats import kruskal_wallis

    data = [("a", 1.0), ("a", 2.0), ("a", 2.0), ("b", 2.0), ("b", 3.0),
            ("c", 3.0), ("c", 4.0), ("c", 4.0)]
    df = spark.createDataFrame(data, "event_type string, value double")
    (row,) = kruskal_wallis(df).collect()

    # python reference with average ranks
    vals = sorted(v for _, v in data)
    rank = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        rank[vals[i]] = (i + 1 + j) / 2
        i = j
    groups = {}
    for g, v in data:
        groups.setdefault(g, []).append(rank[v])
    n = len(data)
    h = 12 / (n * (n + 1)) * sum(
        sum(r) ** 2 / len(r) for r in groups.values()
    ) - 3 * (n + 1)
    from collections import Counter

    ties = Counter(vals)
    ct = 1 - sum(c**3 - c for c in ties.values()) / (n**3 - n)
    assert row.n_groups == 3 and row.n_rows == 8
    assert abs(row.h_raw - round(h, 6)) < 1e-9
    assert abs(row.h_stat - round(h / ct, 6)) < 1e-9


def test_brown_forsythe_hand_computed(spark):
    """Two groups with clearly different spreads; W checked against the
    ANOVA-on-|x - median| formula computed directly."""
    from pythonvectordb_spark.operators.stats import brown_forsythe

    ga = [1.0, 2.0, 3.0, 4.0, 5.0]        # median 3, |dev| 2,1,0,1,2
    gb = [10.0, 10.1, 9.9, 10.05, 9.95]   # tight spread
    data = [("a", v) for v in ga] + [("b", v) for v in gb]
    df = spark.createDataFrame(data, "event_type string, value double")
    (row,) = brown_forsythe(df).collect()

    import statistics

    def devs(xs):
        med = statistics.median(xs)
        return [abs(x - med) for x in xs]

    za, zb = devs([v * 100 for v in ga]), devs([v * 100 for v in gb])
    allz = za + zb
    k, n = 2, len(allz)
    gm = sum(allz) / n
    ssb = len(za) * (sum(za) / len(za) - gm) ** 2 + len(zb) * (
        sum(zb) / len(zb) - gm
    ) ** 2
    ssw = sum((z - sum(za) / len(za)) ** 2 for z in za) + sum(
        (z - sum(zb) / len(zb)) ** 2 for z in zb
    )
    w = (ssb / (k - 1)) / (ssw / (n - k))
    # operator works on DOUBLED deviations |2v - med2| = 2|v - med|:
    # the factor 2 cancels inside the F ratio
    assert row.n_groups == 2 and row.n_rows == 10
    assert abs(row.bf_stat - round(w, 6)) < 1e-5


def test_cohens_kappa_hand_computed(spark):
    from pyspark.sql import functions as F

    from pythonvectordb_spark.operators.stats import cohens_kappa

    # 2x2: n11=4 n10=1 n01=2 n00=3 -> po=0.7, pe=(5*6+5*4)/100=0.5, k=0.4
    rows = [(1, 1)] * 4 + [(1, 0)] * 1 + [(0, 1)] * 2 + [(0, 0)] * 3
    df = spark.createDataFrame(rows, "a int, b int")
    (r,) = cohens_kappa(df, F.col("a") == 1, F.col("b") == 1).collect()
    assert (r.n11, r.n10, r.n01, r.n00) == (4, 1, 2, 3)
    assert r.p_observed == 0.7 and r.p_expected == 0.5 and r.kappa == 0.4
    # constant rater -> pe = 1 -> kappa NULL
    const = spark.createDataFrame([(1, 1), (1, 1)], "a int, b int")
    (c,) = cohens_kappa(const, F.col("a") == 1, F.col("b") == 1).collect()
    assert c.kappa is None


def test_kmv_distinct_small_set_is_exact(spark):
    """Fewer distinct keys than k: the sketch IS the set, estimate
    equals the exact count, rel_error 0."""
    from pythonvectordb_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame([(i % 7,) for i in range(100)], "user_id long")
    (r,) = kmv_distinct(df, "user_id", k=64).collect()
    assert r.n_distinct_exact == 7 and r.estimate == 7.0 and r.rel_error == 0.0


def test_kmv_estimate_formula(spark):
    """More keys than k: estimate = (k-1)*2^32/h_(k) with h_(k) the
    k-th smallest distinct hash — replayed with hashlib."""
    import hashlib

    from pythonvectordb_spark.operators.sketch import KMV_SPACE, kmv_distinct

    n, k = 500, 16
    df = spark.createDataFrame([(i,) for i in range(n)], "user_id long")
    (r,) = kmv_distinct(df, "user_id", k=k).collect()
    hs = sorted({int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) for i in range(n)})
    kth = hs[k - 1]
    assert r.kth_hash == kth
    assert abs(r.estimate - round((k - 1) * KMV_SPACE / kth, 6)) < 1e-6
    assert r.n_distinct_exact == n


def test_bloom_fpr_members_never_false(spark):
    """Probing with keys disjoint from members: measured FPR is between
    0 and 1 and the cell counts reconcile; probing an empty probe set
    yields NULL measured FPR."""
    from pythonvectordb_spark.operators.sketch import bloom_fpr

    members = spark.createDataFrame([(i,) for i in range(200)], "user_id long")
    probes = spark.createDataFrame([(i,) for i in range(10_000, 10_400)], "user_id long")
    (r,) = bloom_fpr(members, probes, "user_id", m=1024, n_hashes=3).collect()
    assert r.n_members == 200 and r.n_probes == 400
    assert 0 < r.n_bits_set <= 600
    assert 0.0 <= r.fpr_measured <= 1.0 and 0.0 < r.fpr_expected < 1.0
    empty = spark.createDataFrame([], "user_id long")
    (e,) = bloom_fpr(members, empty, "user_id", m=1024, n_hashes=3).collect()
    assert e.fpr_measured is None and e.n_probes == 0


def test_kmv_grouped_small_sets_are_exact(spark):
    """Fewer than k distinct keys per group: the grouped sketch IS the
    exact set — estimate equals the exact count, rel_error 0."""
    from pythonvectordb_spark.operators.sketch import kmv_distinct_grouped

    rows = [(f"g{i % 2}", j) for i in range(2) for j in range(i * 10, i * 10 + 7)]
    df = spark.createDataFrame(rows, "g string, k_ long")
    out = {r.g: r for r in kmv_distinct_grouped(df, "k_", "g", k=64).collect()}
    assert set(out) == {"g0", "g1"}
    for r in out.values():
        assert r.n_distinct_exact == 7
        assert r.estimate == 7.0 and r.rel_error == 0.0


def test_bottomk_sample_percentiles_full_sample_is_exact(spark):
    """Sample size >= group size: the sample is the whole group, so
    ap50/ap99 equal the exact interpolated percentiles."""
    from pythonvectordb_spark.operators.sketch import bottomk_sample_percentiles

    rows = [("a", i, float(i)) for i in range(1, 102)]
    df = spark.createDataFrame(rows, "event_type string, event_id long, value double")
    (r,) = bottomk_sample_percentiles(
        df, "value", "event_id", "event_type", k=256
    ).collect()
    assert r.n == 101 and r.sample_n == 101
    assert r.ap50 == 51.0 and r.ap99 == 100.0


def test_bottomk_sample_respects_k(spark):
    from pythonvectordb_spark.operators.sketch import bottomk_sample_percentiles

    rows = [("a", i, float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "event_type string, event_id long, value double")
    (r,) = bottomk_sample_percentiles(
        df, "value", "event_id", "event_type", k=64
    ).collect()
    assert r.n == 1000 and r.sample_n == 64
    assert 0.0 <= r.ap50 <= 999.0


def test_kmv_set_ops_disjoint_and_identical(spark):
    """Disjoint small sets: union exact, intersection estimate 0;
    identical sets: jaccard estimate 1 and intersection = union."""
    from pythonvectordb_spark.operators.sketch import kmv_set_ops

    a = spark.createDataFrame([(i,) for i in range(10)], "k_ long")
    b = spark.createDataFrame([(i,) for i in range(100, 110)], "k_ long")
    (r,) = kmv_set_ops(a, b, "k_", k=64).collect()
    assert r.n_union_exact == 20 and r.n_inter_exact == 0
    assert r.union_est == 20.0 and r.jaccard_est == 0.0 and r.inter_est == 0.0
    (s,) = kmv_set_ops(a, a, "k_", k=64).collect()
    assert s.jaccard_est == 1.0 and s.inter_est == s.union_est == 10.0


def test_welch_ttest_hand_computed(spark):
    """Two tiny groups checked against the closed-form Welch/Cohen
    numbers computed by hand: a=(1,2,3), b=(2,4,6,8)."""
    from pythonvectordb_spark.operators.stats import welch_ttest_matrix

    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (2, 4, 6, 8)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    (r,) = welch_ttest_matrix(df).collect()
    # means 2 and 5; var_a = 1, var_b = 20/3
    m1, m2, v1, v2, n1, n2 = 2.0, 5.0, 1.0, 20.0 / 3.0, 3.0, 4.0
    se1, se2 = v1 / n1, v2 / n2
    t = (m1 - m2) / (se1 + se2) ** 0.5
    dfw = (se1 + se2) ** 2 / (se1**2 / (n1 - 1) + se2**2 / (n2 - 1))
    sp = (((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2)) ** 0.5
    d = (m1 - m2) / sp
    g = (1 - 3 / (4 * (n1 + n2) - 9)) * d
    assert r.n_a == 3 and r.n_b == 4
    assert abs(r.t_welch - round(t, 6)) < 1e-9
    assert abs(r.df_welch - round(dfw, 6)) < 1e-9
    assert abs(r.cohen_d - round(d, 6)) < 1e-9
    assert abs(r.hedges_g - round(g, 6)) < 1e-9


def test_mahalanobis_outliers_plants_one(spark):
    """99 typical rows + 1 joint-extreme row: exactly one z2 above the
    chi2(2, 99%) threshold."""
    from pyspark.sql import functions as F

    from pythonvectordb_spark.operators.stats import mahalanobis_outliers

    rows = [
        (i, f"2024-01-01 {10 + (i % 3):02d}:00:00", "click", 10.0 + (i % 5))
        for i in range(99)
    ] + [(99, "2024-01-01 23:00:00", "click", 400.0)]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    (r,) = mahalanobis_outliers(df).collect()
    assert r.n == 100 and r.n_outliers == 1
    assert r.max_z2 > 9.21034


def test_ks_bh_identical_vs_shifted(spark):
    """Identical sources get p = 1 (never rejected); a far-shifted
    third source is rejected against both under BH."""
    from pythonvectordb_spark.operators.stats import ks_bh_fdr_matrix

    rows = (
        [(i, "ga", i % 50) for i in range(50)]
        + [(100 + i, "gb", i % 50) for i in range(50)]
        + [(200 + i, "gc", 1000 + (i % 50)) for i in range(50)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = {(r.source_a, r.source_b): r for r in ks_bh_fdr_matrix(df).collect()}
    assert len(out) == 3
    ab = out[("ga", "gb")]
    assert ab.d_stat == 0.0 and ab.p_ks == 1.0 and ab.rejected == 0
    for pair in (("ga", "gc"), ("gb", "gc")):
        r = out[pair]
        assert r.d_stat == 1.0 and r.p_ks < 1e-6 and r.rejected == 1


def test_deff_zero_within_variance(spark):
    """Strata that are each internally constant have DEFF = 0: the
    stratification absorbs 100% of the variance."""
    from pythonvectordb_spark.operators.stats import (
        stratification_design_effect,
    )

    rows = [(i, "x", 10) for i in range(20)] + [(50 + i, "y", 30) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    (r,) = stratification_design_effect(df).collect()
    assert r.n_rows == 40 and r.n_strata == 2
    assert r.sd_within == 0.0 and r.deff == 0.0
    assert r.var_reduction_pct == 100.0


def test_quantization_saturation_one_hot(spark):
    """One-hot unit vectors saturate exactly their hot dimension at
    +127 (trunc(1.0 * 127)); every other dimension stays at 0."""
    from pythonvectordb_spark.operators.stats import quantization_saturation

    vecs = [
        (i, [1.0 if d == i else 0.0 for d in range(4)]) for i in range(4)
    ] + [(4, [1.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {r.dim: r for r in quantization_saturation(df).collect()}
    assert len(out) == 4
    assert out[0].n_sat == 2 and out[0].max_q == 127
    for d in (1, 2, 3):
        assert out[d].n_sat == 1 and out[d].sat_rate == 0.2
    assert out[1].min_q == 0  # never negative here


def test_deff_constant_column_null(spark):
    """A constant value column has zero total variance: DEFF is
    undefined and comes back NULL."""
    from pythonvectordb_spark.operators.stats import (
        stratification_design_effect,
    )

    rows = [(i, "x" if i % 2 else "y", 7) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    (r,) = stratification_design_effect(df).collect()
    assert r.n_rows == 30 and r.sd_total == 0.0
    assert r.deff is None and r.var_reduction_pct is None
