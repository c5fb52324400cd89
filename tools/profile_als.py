"""Round-11 decomposition of mllib_als_retrieval (VERDICT r10 item 2):
time the census/split, the ALS fit, the recommend arm, and the full
query separately so the optimization targets the measured sink.

Usage: python tools/profile_als.py SF_DIR
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from pythonvectordb_spark.session import get_spark  # noqa: E402
from pythonvectordb_spark.sources.testdata import load_table  # noqa: E402


def timed(label, fn, n=2):
    fn()  # warm
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{label}: {best:.3f}s", flush=True)
    return best


def main() -> None:
    sf_dir = sys.argv[1]
    spark = get_spark("pvdb-profile-als")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.ml.recommendation import ALS

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    inter = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.col("o_custkey").cast("int").alias("user"),
            F.col("l_partkey").cast("int").alias("item"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
    is_test = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("user").cast("string"),
                        F.lit("-"),
                        F.col("item").cast("string"),
                    )
                ),
                32,
                1,
            ),
            16,
            10,
        ).cast("long")
        % 5
        == 0
    )
    data = inter.withColumn("is_test", is_test).localCheckpoint(eager=False)
    train = data.filter(~F.col("is_test"))
    test = data.filter(F.col("is_test"))

    timed("interactions+census agg", lambda: data.groupBy().agg(
        F.countDistinct("user"), F.countDistinct("item"), F.count(F.lit(1))
    ).collect())

    als = ALS(
        rank=16, maxIter=10, regParam=0.1, alpha=10.0, implicitPrefs=True,
        userCol="user", itemCol="item", ratingCol="cnt", seed=42,
        coldStartStrategy="drop",
    )
    t0 = time.time()
    model = als.fit(train)
    print(f"fit (cold): {time.time() - t0:.3f}s", flush=True)
    t0 = time.time()
    model2 = als.fit(train)
    print(f"fit (warm): {time.time() - t0:.3f}s", flush=True)

    for nb in (4, 2):
        als_nb = ALS(
            rank=16, maxIter=10, regParam=0.1, alpha=10.0, implicitPrefs=True,
            userCol="user", itemCol="item", ratingCol="cnt", seed=42,
            coldStartStrategy="drop", numUserBlocks=nb, numItemBlocks=nb,
        )
        t0 = time.time()
        als_nb.fit(train)
        print(f"fit (numBlocks={nb}): {time.time() - t0:.3f}s", flush=True)

    test_users = test.select("user").distinct().localCheckpoint(eager=False)
    print(f"n_test_users={test_users.count()}  "
          f"n_items={model.itemFactors.count()}  "
          f"n_users={model.userFactors.count()}", flush=True)

    def recs_df(m):
        return (
            m.recommendForUserSubset(test_users, 96)
            .select("user", F.explode("recommendations").alias("r"))
            .select("user", F.col("r.item").alias("item"),
                    F.col("r.rating").alias("s"))
        )

    timed("recommendForUserSubset(96) noop", lambda: recs_df(model).write.format(
        "noop").mode("overwrite").save())

    # eval arm on top of cached recs
    from pyspark.sql import Window

    recs = recs_df(model).localCheckpoint(eager=False)
    recs.count()

    def topk_hits(cand, order_cols):
        w = Window.partitionBy("user").orderBy(*order_cols)
        kept = (
            cand.join(train.select("user", "item"), ["user", "item"], "left_anti")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 20)
            .select("user", "item")
        )
        return kept.join(test.select("user", "item"), ["user", "item"], "semi")

    timed("als eval arm (hits agg)", lambda: topk_hits(
        recs, [F.col("s").desc(), F.col("item").asc()]
    ).agg(F.count(F.lit(1))).collect())

    pop = (
        train.groupBy("item")
        .agg(F.sum("cnt").cast("long").alias("pc"))
        .orderBy(F.col("pc").desc(), F.col("item").asc())
        .limit(96)
    )
    pop_cand = test_users.crossJoin(F.broadcast(pop))
    timed("pop eval arm (hits agg)", lambda: topk_hits(
        pop_cand, [F.col("pc").desc(), F.col("item").asc()]
    ).agg(F.count(F.lit(1))).collect())

    from pythonvectordb_spark.registry import QUERIES

    timed("FULL mllib_als_retrieval", lambda: QUERIES["mllib_als_retrieval"](
        spark, sf_dir).collect())
    spark.stop()


if __name__ == "__main__":
    main()
