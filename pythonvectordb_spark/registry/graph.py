"""Iterative graph analytics: PageRank, HITS, triangles, k-core, assortativity, Markov chains, link prediction.

Mechanically split from the former single-file registry.py (round 8)
with zero semantic change; statement text is unchanged, only moved.
"""


from pythonvectordb_spark.registry._core import (
    DD,
    DataFrame,
    F,
    O,
    SparkSession,
    _emb,
    load_table,
)


from pythonvectordb_spark.registry.dedup import o_dedup_minhash_lsh


def q_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the nation-to-nation trade graph (supplier nation →
    customer nation, edge weight = exact integer revenue cents·e2):
    10 fixed power iterations, damping 0.85, dangling-mass
    redistribution (`operators/graph.py`). The second iterative family
    next to connected components — deterministic because the iteration
    count is fixed, so DuckDB replays the identical rounds unrolled.
    Ranks rounded to 6 (both engines sum the same ≤25 doubles)."""
    from pythonvectordb_spark.operators.graph import pagerank

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
    ).cast("long")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    edges = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), supplier.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), customer.c_nationkey == F.col("c_nk"))
        .groupBy("supp_nation", "cust_nation")
        .agg(F.sum(rev).cast("long").alias("w"))
    )
    pr = pagerank(edges, "supp_nation", "cust_nation", weight_col="w")
    return pr.select(
        F.col("node").alias("nation"), F.round("rank", 6).alias("rank")
    )


def o_trade_pagerank(iterations: int = 10, damping: float = 0.85) -> str:
    steps = []
    for i in range(1, iterations + 1):
        p = f"pr{i - 1}"
        # MATERIALIZED is load-bearing: pr{{i}} references pr{{i-1}}
        # twice (dangling mass + contributions); inlined CTEs would
        # expand the chain 2^iterations times
        steps.append(
            f"""d{i} AS MATERIALIZED (
  SELECT coalesce(sum(rank), 0.0) AS dmass FROM {p}
  WHERE node NOT IN (SELECT src FROM outw)
),
c{i} AS MATERIALIZED (
  SELECT t.dst AS node, sum(t.p * pp.rank) AS in_rank
  FROM trans t JOIN {p} pp ON t.src = pp.node GROUP BY 1
),
pr{i} AS MATERIALIZED (
  SELECT nd.node,
         (1.0 - {damping!r}) / n.nn
           + {damping!r} * (coalesce(c.in_rank, 0.0) + d.dmass / n.nn) AS rank
  FROM nodes nd CROSS JOIN n CROSS JOIN d{i} d LEFT JOIN c{i} c ON c.node = nd.node
)"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH agg AS MATERIALIZED (
  SELECT n1.n_name AS src, n2.n_name AS dst,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) AS w
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  GROUP BY 1, 2
),
outw AS MATERIALIZED (SELECT src, sum(w) AS out_w FROM agg GROUP BY 1),
trans AS MATERIALIZED (SELECT agg.src, agg.dst, agg.w / outw.out_w AS p FROM agg JOIN outw USING (src)),
nodes AS MATERIALIZED (SELECT DISTINCT node FROM (SELECT src AS node FROM agg UNION ALL SELECT dst FROM agg)),
n AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS nn FROM nodes),
pr0 AS MATERIALIZED (SELECT node, 1.0 / n.nn AS rank FROM nodes CROSS JOIN n),
{chain}
SELECT node AS nation, round(rank, 6) AS rank FROM pr{iterations}
"""


def q_trade_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hub/authority over the nation trade graph (new round 6):
    5 fixed L1-normalized power iterations on the same exact-cents
    edges as `trade_pagerank` — hubs = influence exporters, authorities
    = importers; the DuckDB oracle replays the identical unrolled
    rounds (`operators/graph.hits`)."""
    from pythonvectordb_spark.operators.graph import hits

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
    ).cast("long")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    edges = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), supplier.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), customer.c_nationkey == F.col("c_nk"))
        .groupBy("supp_nation", "cust_nation")
        .agg(F.sum(rev).cast("long").alias("w"))
    )
    out = hits(edges, iterations=5, src_col="supp_nation", dst_col="cust_nation")
    return out.select(F.col("node").alias("nation"), "hub", "auth")


def o_trade_hits(iterations: int = 5) -> str:
    steps = []
    for i in range(1, iterations + 1):
        steps.append(
            f"""ar{i} AS MATERIALIZED (
  SELECT e.dst AS node, sum(e.w * h.hub) AS raw
  FROM agg e JOIN h{i - 1} h ON e.src = h.node GROUP BY 1
),
asum{i} AS MATERIALIZED (SELECT sum(raw) AS s FROM ar{i}),
a{i} AS MATERIALIZED (
  SELECT nd.node, coalesce(r.raw, 0.0) / s.s AS auth
  FROM nodes nd CROSS JOIN asum{i} s LEFT JOIN ar{i} r ON r.node = nd.node
),
hr{i} AS MATERIALIZED (
  SELECT e.src AS node, sum(e.w * a.auth) AS raw
  FROM agg e JOIN a{i} a ON e.dst = a.node GROUP BY 1
),
hsum{i} AS MATERIALIZED (SELECT sum(raw) AS s FROM hr{i}),
h{i} AS MATERIALIZED (
  SELECT nd.node, coalesce(r.raw, 0.0) / s.s AS hub
  FROM nodes nd CROSS JOIN hsum{i} s LEFT JOIN hr{i} r ON r.node = nd.node
)"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH agg AS MATERIALIZED (
  SELECT n1.n_name AS src, n2.n_name AS dst,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) AS w
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  GROUP BY 1, 2
),
nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (SELECT src AS node FROM agg
                             UNION ALL SELECT dst FROM agg)),
n AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS nn FROM nodes),
h0 AS MATERIALIZED (SELECT node, 1.0 / n.nn AS hub FROM nodes CROSS JOIN n),
{chain}
SELECT nd.node AS nation, round(h.hub, 6) AS hub, round(a.auth, 6) AS auth
FROM nodes nd JOIN h{iterations} h ON h.node = nd.node
JOIN a{iterations} a ON a.node = nd.node
"""


def q_dedup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-graph density audit (staged for the round-5 rotation): per
    document in the >=0.8 MinHash pair graph, its degree, triangle
    count, and local clustering coefficient — triangle-rich = genuine
    dup group, star/chain = transitive-merge risk
    (`operators/graph.pair_graph_triangles`)."""
    from pythonvectordb_spark.operators.graph import pair_graph_triangles

    docs = load_table(spark, sf_dir, "documents")
    return pair_graph_triangles(DD.minhash_lsh_pairs(docs, threshold=0.8))


def o_dedup_graph_triangles() -> str:
    return f"""
WITH p AS MATERIALIZED (SELECT id_a, id_b FROM ({o_dedup_minhash_lsh()})),
tri AS (
  SELECT e1.id_a AS x, e1.id_b AS y, e2.id_b AS z
  FROM p e1
  JOIN p e2 ON e1.id_b = e2.id_a
  WHERE EXISTS (SELECT 1 FROM p e3
                WHERE e3.id_a = e1.id_a AND e3.id_b = e2.id_b)
),
tn AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
  FROM (SELECT unnest([x, y, z]) AS node FROM tri) u GROUP BY 1
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree
  FROM (SELECT unnest([id_a, id_b]) AS node FROM p) u GROUP BY 1
)
SELECT deg.node, deg.degree,
       CAST(coalesce(tn.n_triangles, 0) AS BIGINT) AS n_triangles,
       round(CASE WHEN deg.degree >= 2
                  THEN 2.0 * coalesce(tn.n_triangles, 0)::DOUBLE
                       / (deg.degree::DOUBLE * (deg.degree::DOUBLE - 1.0))
                  ELSE 0.0 END, 6) AS clustering_coeff
FROM deg LEFT JOIN tn ON deg.node = tn.node
"""


def q_dedup_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the >=0.8 MinHash pair graph (staged for the round-5
    rotation): six rounds of synchronous degree peeling — chains and
    stars (the transitive-merge risk) peel away, surviving nodes sit in
    dense duplicate regions; the membership complement of
    `dedup_graph_triangles`'s per-neighborhood grading
    (`operators/graph.k_core`)."""
    from pythonvectordb_spark.operators.graph import k_core

    docs = load_table(spark, sf_dir, "documents")
    return k_core(DD.minhash_lsh_pairs(docs, threshold=0.8), k=2, rounds=6)


def o_dedup_kcore(k: int = 2, rounds: int = 6) -> str:
    # the WRAP pattern over the proven minhash-pairs oracle, then the
    # peeling rounds unrolled (the trade_pagerank replay discipline)
    parts = [
        f"WITH p AS MATERIALIZED (SELECT id_a, id_b FROM ({o_dedup_minhash_lsh()})),\n"
        "e0 AS (SELECT DISTINCT id_a AS a, id_b AS b FROM p WHERE id_a < id_b)"
    ]
    for r in range(rounds):
        parts.append(
            f""",
k{r} AS (SELECT node FROM (
           SELECT node, CAST(count(*) AS BIGINT) AS deg
           FROM (SELECT unnest([a, b]) AS node FROM e{r}) u GROUP BY 1)
         WHERE deg >= {k}),
e{r + 1} AS (SELECT e.a, e.b FROM e{r} e
             WHERE EXISTS (SELECT 1 FROM k{r} WHERE k{r}.node = e.a)
               AND EXISTS (SELECT 1 FROM k{r} WHERE k{r}.node = e.b))"""
        )
    parts.append(
        f"""
SELECT node, CAST(count(*) AS BIGINT) AS core_degree
FROM (SELECT unnest([a, b]) AS node FROM e{rounds}) u GROUP BY 1"""
    )
    return "".join(parts)


def q_event_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence lift across users (staged for the
    round-5 rotation): market-basket over the behavior log — which
    behaviors travel together (funnel candidates); exact-integer
    support/lift (`operators/timeseries.event_type_affinity`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.event_type_affinity(load_table(spark, sf_dir, "events"))


def o_event_type_affinity() -> str:
    return """
WITH ut AS (SELECT DISTINCT user_id AS u, event_type AS ty FROM events),
per_type AS (SELECT ty, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1),
nu AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS nu FROM ut),
pr AS (
  SELECT a.ty AS type_a, b.ty AS type_b, CAST(count(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b ON a.u = b.u AND a.ty < b.ty
  GROUP BY 1, 2
)
SELECT pr.type_a, pr.type_b, pa.n AS n_a, pb.n AS n_b, pr.n_both,
       round(n_both::DOUBLE / nu.nu::DOUBLE, 9) AS support,
       round(n_both::DOUBLE * nu.nu::DOUBLE / (pa.n::DOUBLE * pb.n::DOUBLE), 6) AS lift
FROM pr
JOIN per_type pa ON pr.type_a = pa.ty
JOIN per_type pb ON pr.type_b = pb.ty
CROSS JOIN nu
"""


def q_dedup_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the >=0.8 MinHash dup graph
    (staged for the round-5 rotation): template-farm (r>0) vs
    hub-and-spoke (r<0) duplication structure — doubled-orientation
    moment algebra, never materializing the 2m rows
    (`operators/graph.assortativity`)."""
    from pythonvectordb_spark.operators.graph import assortativity

    docs = load_table(spark, sf_dir, "documents")
    return assortativity(DD.minhash_lsh_pairs(docs, threshold=0.8))


def o_dedup_assortativity() -> str:
    return f"""
WITH p AS MATERIALIZED (SELECT id_a, id_b FROM ({o_dedup_minhash_lsh()})),
e AS (SELECT DISTINCT id_a AS a, id_b AS b FROM p WHERE id_a < id_b),
d AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
      FROM (SELECT unnest([a, b]) AS node FROM e) u GROUP BY 1),
j AS (SELECT da.deg AS da, db.deg AS db
      FROM e JOIN d da ON da.node = e.a JOIN d db ON db.node = e.b),
g AS (SELECT CAST(coalesce(count(*), 0) AS BIGINT) AS n_edges,
             CAST(coalesce(sum(da + db), 0) AS BIGINT) AS sx,
             CAST(coalesce(sum(da * da + db * db), 0) AS BIGINT) AS sxx,
             CAST(coalesce(sum(2 * da * db), 0) AS BIGINT) AS sxy
      FROM j),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM d)
SELECT n_nodes, n_edges,
       CASE WHEN 2 * n_edges * sxx - sx * sx > 0 THEN
         round((2 * n_edges * sxy - sx * sx)::DOUBLE
               / (2 * n_edges * sxx - sx * sx)::DOUBLE, 9) END AS assortativity
FROM g CROSS JOIN n
"""


def q_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket brand association (staged for the round-5
    rotation): support / co-occurrence / lift with the a-priori gates —
    frequent brands first, pair fan-out bounded by basket width
    (`operators/relational.copurchase_lift`)."""
    from pythonvectordb_spark.operators import relational as RL2

    return RL2.copurchase_lift(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def o_copurchase_lift() -> str:
    return """
WITH ob AS (SELECT DISTINCT l.l_orderkey, p.p_brand
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
freq AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_brand
         FROM ob GROUP BY 1 HAVING count(*) >= 20),
obf AS (SELECT ob.l_orderkey, ob.p_brand FROM ob JOIN freq USING (p_brand)),
pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
         CAST(count(*) AS BIGINT) AS n_cooc
  FROM obf a JOIN obf b ON a.l_orderkey = b.l_orderkey
                       AND a.p_brand < b.p_brand
  GROUP BY 1, 2 HAVING count(*) >= 3),
tot AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM ob)
SELECT p.brand_a, p.brand_b, p.n_cooc, fa.n_brand AS n_a, fb.n_brand AS n_b,
       round(p.n_cooc::DOUBLE / tot.n_orders::DOUBLE, 9) AS support,
       round((p.n_cooc * tot.n_orders)::DOUBLE
             / (fa.n_brand * fb.n_brand)::DOUBLE, 9) AS lift
FROM pairs p
JOIN freq fa ON fa.p_brand = p.brand_a
JOIN freq fb ON fb.p_brand = p.brand_b
CROSS JOIN tot
"""


def q_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate + memory coefficient of the behavioral event-type
    Markov chain (staged for the round-5 rotation): H(next|cur) and
    H(next) with every ln over an exact integer count — the scalar
    summary of `event_transitions`
    (`operators/timeseries.markov_entropy_rate`)."""
    from pythonvectordb_spark.operators import timeseries as TS

    return TS.markov_entropy_rate(load_table(spark, sf_dir, "events"))


def o_markov_entropy_rate() -> str:
    return """
WITH seq AS (
  SELECT event_type AS cur,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC) AS nxt
  FROM events),
tr AS (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS t
       FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
curm AS (SELECT cur, CAST(sum(t) AS BIGINT) AS tc FROM tr GROUP BY 1),
nxtm AS (SELECT nxt, CAST(sum(t) AS BIGINT) AS tn FROM tr GROUP BY 1),
tot AS (SELECT CAST(sum(t) AS BIGINT) AS tt FROM tr),
cond AS (SELECT sum(t::DOUBLE * (ln(tc::DOUBLE) - ln(t::DOUBLE))) AS s_cond
         FROM tr JOIN curm USING (cur)),
marg AS (SELECT sum(tn::DOUBLE * ln(tn::DOUBLE)) AS s_marg FROM nxtm)
SELECT tt AS n_transitions,
       round(s_cond / tt::DOUBLE, 6) AS h_cond,
       round(ln(tt::DOUBLE) - s_marg / tt::DOUBLE, 6) AS h_next,
       CASE WHEN ln(tt::DOUBLE) - s_marg / tt::DOUBLE > 0 THEN
         round(1.0 - (s_cond / tt::DOUBLE)
                     / (ln(tt::DOUBLE) - s_marg / tt::DOUBLE), 6) END AS memory_coef
FROM cond CROSS JOIN marg CROSS JOIN tot
"""


def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the per-user event-type Markov chain,
    12 fixed power-iteration rounds vs the empirical state share (new
    round 7): the long-run behavioral equilibrium read against where
    traffic actually is (`operators/graph.markov_stationary`)."""
    from pythonvectordb_spark.operators.graph import markov_stationary

    return markov_stationary(load_table(spark, sf_dir, "events"))


def o_markov_stationary() -> str:
    return """
WITH ordered AS (
  SELECT event_type AS to_s,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts ASC, event_id ASC) AS from_s
  FROM events),
pairs AS (SELECT from_s, to_s, CAST(count(*) AS BIGINT) AS c
          FROM ordered WHERE from_s IS NOT NULL GROUP BY 1, 2),
outc AS (SELECT from_s, CAST(sum(c) AS BIGINT) AS ct FROM pairs GROUP BY 1),
trans AS MATERIALIZED (
  SELECT from_s, to_s, c::DOUBLE / ct::DOUBLE AS p
  FROM pairs JOIN outc USING (from_s)),
states AS MATERIALIZED (
  SELECT DISTINCT s FROM (SELECT from_s AS s FROM trans
                          UNION ALL SELECT to_s FROM trans) u),
ns AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM states),
v0 AS MATERIALIZED (SELECT s, 1.0 / ns.n AS v FROM states CROSS JOIN ns),
r1 AS MATERIALIZED (
  SELECT t.to_s AS s, sum(t.p * v.v) AS raw
  FROM trans t JOIN v0 v ON t.from_s = v.s GROUP BY 1
),
tot1 AS MATERIALIZED (SELECT sum(raw) AS tt FROM r1),
v1 AS MATERIALIZED (
  SELECT st.s, coalesce(r.raw, 0.0) / x.tt AS v
  FROM states st CROSS JOIN tot1 x LEFT JOIN r1 r ON r.s = st.s
),
r2 AS MATERIALIZED (
  SELECT t.to_s AS s, sum(t.p * v.v) AS raw
  FROM trans t JOIN v1 v ON t.from_s = v.s GROUP BY 1
),
tot2 AS MATERIALIZED (SELECT sum(raw) AS tt FROM r2),
v2 AS MATERIALIZED (
  SELECT st.s, coalesce(r.raw, 0.0) / x.tt AS v
  FROM states st CROSS JOIN tot2 x LEFT JOIN r2 r ON r.s = st.s
),
r3 AS MATERIALIZED (
  SELECT t.to_s AS s, sum(t.p * v.v) AS raw
  FROM trans t JOIN v2 v ON t.from_s = v.s GROUP BY 1
),
tot3 AS MATERIALIZED (SELECT sum(raw) AS tt FROM r3),
v3 AS MATERIALIZED (
  SELECT st.s, coalesce(r.raw, 0.0) / x.tt AS v
  FROM states st CROSS JOIN tot3 x LEFT JOIN r3 r ON r.s = st.s
),
r4 AS MATERIALIZED (
  SELECT t.to_s AS s, sum(t.p * v.v) AS raw
  FROM trans t JOIN v3 v ON t.from_s = v.s GROUP BY 1
),
tot4 AS MATERIALIZED (SELECT sum(raw) AS tt FROM r4),
v4 AS MATERIALIZED (
  SELECT st.s, coalesce(r.raw, 0.0) / x.tt AS v
  FROM states st CROSS JOIN tot4 x LEFT JOIN r4 r ON r.s = st.s
),
r5 AS MATERIALIZED (
  SELECT t.to_s AS s, sum(t.p * v.v) AS raw
  FROM trans t JOIN v4 v ON t.from_s = v.s GROUP BY 1
),
tot5 AS MATERIALIZED (SELECT sum(raw) AS tt FROM r5),
v5 AS MATERIALIZED (
  SELECT st.s, coalesce(r.raw, 0.0) / x.tt AS v
  FROM states st CROSS JOIN tot5 x LEFT JOIN r5 r ON r.s = st.s
),
r6 AS MATERIALIZED (
  SELECT t.to_s AS s, sum(t.p * v.v) AS raw
  FROM trans t JOIN v5 v ON t.from_s = v.s GROUP BY 1
),
tot6 AS MATERIALIZED (SELECT sum(raw) AS tt FROM r6),
v6 AS MATERIALIZED (
  SELECT st.s, coalesce(r.raw, 0.0) / x.tt AS v
  FROM states st CROSS JOIN tot6 x LEFT JOIN r6 r ON r.s = st.s
),
r7 AS MATERIALIZED (
  SELECT t.to_s AS s, sum(t.p * v.v) AS raw
  FROM trans t JOIN v6 v ON t.from_s = v.s GROUP BY 1
),
tot7 AS MATERIALIZED (SELECT sum(raw) AS tt FROM r7),
v7 AS MATERIALIZED (
  SELECT st.s, coalesce(r.raw, 0.0) / x.tt AS v
  FROM states st CROSS JOIN tot7 x LEFT JOIN r7 r ON r.s = st.s
),
r8 AS MATERIALIZED (
  SELECT t.to_s AS s, sum(t.p * v.v) AS raw
  FROM trans t JOIN v7 v ON t.from_s = v.s GROUP BY 1
),
tot8 AS MATERIALIZED (SELECT sum(raw) AS tt FROM r8),
v8 AS MATERIALIZED (
  SELECT st.s, coalesce(r.raw, 0.0) / x.tt AS v
  FROM states st CROSS JOIN tot8 x LEFT JOIN r8 r ON r.s = st.s
),
r9 AS MATERIALIZED (
  SELECT t.to_s AS s, sum(t.p * v.v) AS raw
  FROM trans t JOIN v8 v ON t.from_s = v.s GROUP BY 1
),
tot9 AS MATERIALIZED (SELECT sum(raw) AS tt FROM r9),
v9 AS MATERIALIZED (
  SELECT st.s, coalesce(r.raw, 0.0) / x.tt AS v
  FROM states st CROSS JOIN tot9 x LEFT JOIN r9 r ON r.s = st.s
),
r10 AS MATERIALIZED (
  SELECT t.to_s AS s, sum(t.p * v.v) AS raw
  FROM trans t JOIN v9 v ON t.from_s = v.s GROUP BY 1
),
tot10 AS MATERIALIZED (SELECT sum(raw) AS tt FROM r10),
v10 AS MATERIALIZED (
  SELECT st.s, coalesce(r.raw, 0.0) / x.tt AS v
  FROM states st CROSS JOIN tot10 x LEFT JOIN r10 r ON r.s = st.s
),
r11 AS MATERIALIZED (
  SELECT t.to_s AS s, sum(t.p * v.v) AS raw
  FROM trans t JOIN v10 v ON t.from_s = v.s GROUP BY 1
),
tot11 AS MATERIALIZED (SELECT sum(raw) AS tt FROM r11),
v11 AS MATERIALIZED (
  SELECT st.s, coalesce(r.raw, 0.0) / x.tt AS v
  FROM states st CROSS JOIN tot11 x LEFT JOIN r11 r ON r.s = st.s
),
r12 AS MATERIALIZED (
  SELECT t.to_s AS s, sum(t.p * v.v) AS raw
  FROM trans t JOIN v11 v ON t.from_s = v.s GROUP BY 1
),
tot12 AS MATERIALIZED (SELECT sum(raw) AS tt FROM r12),
v12 AS MATERIALIZED (
  SELECT st.s, coalesce(r.raw, 0.0) / x.tt AS v
  FROM states st CROSS JOIN tot12 x LEFT JOIN r12 r ON r.s = st.s
),
emp AS (SELECT event_type AS s, CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1),
tote AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM events)
SELECT st.s AS event_type, e.n_events,
       round(e.n_events::DOUBLE / t.nt::DOUBLE, 6) AS empirical_share,
       round(v.v, 6) AS stationary_p
FROM states st
JOIN v12 v ON v.s = st.s
JOIN emp e ON e.s = st.s
CROSS JOIN tote t
"""


def q_adamic_adar_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the mutual-kNN embedding graph
    (new round 7): non-adjacent vector pairs ranked by shared-neighbor
    evidence sum 1/ln(deg) plus neighborhood Jaccard — the missed-merge
    candidates of the reciprocal top-5 graph
    (`operators/graph.adamic_adar_links`, `.mutual_knn_pairs`)."""
    from pythonvectordb_spark.operators.graph import (
        adamic_adar_links,
        mutual_knn_pairs,
    )

    return adamic_adar_links(mutual_knn_pairs(_emb(spark, sf_dir), k=5))


def o_adamic_adar_mutual_knn(k: int = 5) -> str:
    qv = O.sql_qvec("embedding")
    cos = (
        "(list_aggregate(list_transform(a.qv, (x, i) -> x::BIGINT * b.qv[i]::BIGINT), 'sum')::DOUBLE"
        " / (sqrt(list_aggregate(list_transform(a.qv, x -> x::BIGINT * x::BIGINT), 'sum')::DOUBLE)"
        " * sqrt(list_aggregate(list_transform(b.qv, x -> x::BIGINT * x::BIGINT), 'sum')::DOUBLE)))"
    )
    return f"""
WITH q AS (SELECT vec_id, {qv} AS qv FROM embeddings),
p AS (
  SELECT a.vec_id AS qa, b.vec_id AS qb, {cos} AS score
  FROM q a CROSS JOIN q b
),
rk AS (
  SELECT qa, qb,
         row_number() OVER (PARTITION BY qa ORDER BY score DESC, qb ASC) AS rn
  FROM p
),
tk AS (SELECT qa AS a, qb AS b FROM rk WHERE rn <= {k + 1} AND qa != qb),
mp AS MATERIALIZED (
  SELECT e.a, e.b FROM tk e JOIN tk r ON e.a = r.b AND e.b = r.a
  WHERE e.a < e.b),
sym AS MATERIALIZED (
  SELECT a, b FROM mp UNION ALL SELECT b, a FROM mp),
deg AS MATERIALIZED (
  SELECT a AS node, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
cand AS (
  SELECT w.x, w.z, CAST(count(*) AS BIGINT) AS n_common,
         sum(1.0 / ln(d.deg::DOUBLE)) AS aa
  FROM (SELECT l.a AS x, l.b AS y, r.a AS z
        FROM sym l JOIN sym r ON l.b = r.b AND l.a < r.a) w
  JOIN deg d ON d.node = w.y
  GROUP BY 1, 2
),
nc AS (
  SELECT c.x, c.z, c.n_common, c.aa
  FROM cand c
  LEFT JOIN mp ON mp.a = c.x AND mp.b = c.z
  WHERE mp.a IS NULL
)
SELECT nc.x AS id_a, nc.z AS id_b, nc.n_common,
       da.deg AS deg_x, db.deg AS deg_z,
       round(nc.aa, 6) AS adamic_adar,
       round(nc.n_common::DOUBLE
             / (da.deg + db.deg - nc.n_common)::DOUBLE, 6)
         AS neighborhood_jaccard
FROM nc
JOIN deg da ON da.node = nc.x
JOIN deg db ON db.node = nc.z
"""
