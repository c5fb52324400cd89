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
