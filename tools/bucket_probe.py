"""Bucketed-layout contract, end-to-end: pay the shuffle at write
time, never again per query.

Writes the distinct (l_orderkey, l_partkey) basket table and orders
bucketed by orderkey into the session warehouse, then runs two
registry-shaped plans against BOTH layouts:

  cooccur  — the `cooccurrence_part_pairs` self-join pair generation
  factjoin — the orders ⨝ lineitem fact join (broadcast disabled,
             the `join_inner_broadcast` shape at fact-to-fact scale)

For each it archives the formatted physical plan to
explains/bucketed_<name>_{flat,bucketed}.txt, prints the Exchange
count in each (bucketed must be 0 on the join input side), asserts
the two layouts return identical results, and prints warm wall
times. SCALING.md §bucketed holds the measured table.

Usage: python tools/bucket_probe.py [sf_dir]
"""

from __future__ import annotations

import re
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

EXPLAINS = Path("/root/repo/explains")


def exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"\bExchange hashpartitioning", plan))


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def timed(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("bucket_probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    basket = li.select("l_orderkey", "l_partkey").distinct()

    for t in ("bk_basket", "bk_orders", "bk_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    # The one-time write-side shuffle the layout amortizes:
    basket.write.bucketBy(16, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("bk_basket")
    orders.write.bucketBy(16, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("bk_orders")
    li.select("l_orderkey", "l_partkey", "l_quantity").write.bucketBy(
        16, "l_orderkey"
    ).sortBy("l_orderkey").mode("overwrite").saveAsTable("bk_lineitem")

    def cooccur(src):
        a = src.toDF("l_orderkey", "part_a")
        b = src.toDF("l_orderkey", "part_b")
        return (
            a.join(b, on="l_orderkey")
            .filter(F.col("part_a") < F.col("part_b"))
            .groupBy("part_a", "part_b")
            .agg(F.count(F.lit(1)).alias("n_orders"))
        )

    def factjoin(o, l):
        return (
            o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("l_quantity").alias("qty"),
            )
        )

    cases = {
        "cooccur": (
            cooccur(basket),
            cooccur(spark.table("bk_basket")),
            ["part_a", "part_b", "n_orders"],
        ),
        "factjoin": (
            factjoin(orders, li.select("l_orderkey", "l_quantity")),
            factjoin(
                spark.table("bk_orders"),
                spark.table("bk_lineitem"),
            ),
            ["o_orderpriority", "n", "qty"],
        ),
    }
    for name, (flat, bucketed, cols) in cases.items():
        for label, df in (("flat", flat), ("bucketed", bucketed)):
            (EXPLAINS / f"bucketed_{name}_{label}.txt").write_text(
                formatted(df)
            )
        ex_flat, ex_b = exchanges(flat), exchanges(bucketed)
        t_flat = min(timed(flat) for _ in range(2))
        t_b = min(timed(bucketed) for _ in range(2))
        a = {tuple(r) for r in flat.select(cols).collect()}
        b = {tuple(r) for r in bucketed.select(cols).collect()}
        assert a == b, f"{name}: layouts disagree"
        print(
            f"{name:9s} exchanges flat={ex_flat} bucketed={ex_b} "
            f"wall flat={t_flat:5.2f}s bucketed={t_b:5.2f}s "
            f"rows={len(a)}"
        )

    for t in ("bk_basket", "bk_orders", "bk_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.stop()


if __name__ == "__main__":
    main()
