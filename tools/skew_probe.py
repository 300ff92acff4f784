"""Skew-join probe: measure how salting flattens the per-task load.

Builds a deliberately skewed fact table (one key owns half the rows),
joins it to a 100-key dimension with broadcast DISABLED (the regime
where skew actually bites — a broadcastable dim never has a skew
problem), and reports the distribution of join-output rows per shuffle
task for three plans:

  unsalted / AQE off   — the straggler: the hot key lands on ONE task
  unsalted / AQE on    — Spark's runtime skew-split (reads oversized
                         shuffle blocks in slices; helps joins, but
                         the pattern generalizes less to aggregations)
  salted (8 buckets)   — operators.joins.salted_join: the hot key is
                         spread across 8 tasks at plan time

Rows-per-task is the right proxy in local mode: task wall time is
dominated by rows processed, and row counts are deterministic where
timings are noisy. Results are appended to SCALING.md by hand (the
table in §skew was produced by this script).

Usage: python tools/skew_probe.py [n_rows]
       python tools/skew_probe.py --basket [n_orders]

--basket runs the skewed-BASKET variant backing
``cooccurrence_part_pairs_salted``: a self-join pair-generation
workload where one mega-order holds 2,000 distinct parts
(C(2000,2) ≈ 2M pairs from ONE key) among n_orders normal 5-item
orders. It reports the per-task pair-output histogram for the
unsalted self-join vs salted_join(salt_buckets=8), plus an exceptAll
semantic-equality check on the aggregated pair counts.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lmo_data_catalog_spark.operators.joins import salted_join  # noqa: E402


def task_histogram(df) -> dict[str, int]:
    """Join-output rows per shuffle task (spark_partition_id of the
    post-join partitioning = the task that processed those rows)."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    counts = sorted((r["count"] for r in rows), reverse=True)
    total = sum(counts)
    return {
        "tasks": len(counts),
        "max": counts[0],
        "p50": counts[len(counts) // 2],
        "max_share_pct": round(100.0 * counts[0] / total, 1),
    }


def basket_main() -> None:
    """Skewed-basket self-join probe (cooccurrence_part_pairs_salted)."""
    args = [a for a in sys.argv[1:] if a != "--basket"]
    n_orders = int(args[0]) if args else 200_000
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("basket_skew_probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # order 0 is the mega-basket: 2,000 distinct parts; every other
    # order holds 5 parts.  Distinct (orderkey, partkey) rows.
    mega = spark.range(2_000).select(
        F.lit(0).alias("l_orderkey"), F.col("id").alias("l_partkey")
    )
    normal = spark.range(n_orders * 5).select(
        ((F.col("id") % n_orders) + 1).alias("l_orderkey"),
        ((F.col("id") / n_orders).cast("long") * 10_000 + F.col("id") % 97)
        .alias("l_partkey"),
    ).distinct()
    li = mega.unionByName(normal)
    a = li.toDF("l_orderkey", "part_a")
    b = li.toDF("l_orderkey", "part_b")

    def pairs_plain():
        return a.join(b, on="l_orderkey").filter(
            F.col("part_a") < F.col("part_b")
        )

    def pairs_salted():
        return salted_join(a, b, on=["l_orderkey"], salt_buckets=8).filter(
            F.col("part_a") < F.col("part_b")
        )

    def timed(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for label, build in [("unsalted", pairs_plain), ("salted_8", pairs_salted)]:
        wall = min(timed(build()), timed(build()))
        hist = task_histogram(build())
        print(f"{label:10s} {dict(hist, wall_s=round(wall, 2))}")

    agg = lambda df: (  # noqa: E731
        df.groupBy("part_a", "part_b").count()
    )
    diff = agg(pairs_plain()).exceptAll(agg(pairs_salted())).count()
    diff += agg(pairs_salted()).exceptAll(agg(pairs_plain())).count()
    print(f"semantic_diff_rows: {diff} (must be 0)")
    spark.stop()


def main() -> None:
    if "--basket" in sys.argv:
        basket_main()
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("skew_probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # key 0 holds 50% of rows; keys 1..99 share the rest uniformly
    left = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise((F.col("id") % 99) + 1)
        .alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim")
    )

    def timed(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    results = {}
    for label, aqe, build in [
        ("unsalted_aqe_off", "false", lambda: left.join(right, on=["k"])),
        ("unsalted_aqe_on", "true", lambda: left.join(right, on=["k"])),
        (
            "salted_8",
            "false",
            lambda: salted_join(left, right, on=["k"], salt_buckets=8),
        ),
    ]:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        df = build()
        wall = min(timed(df), timed(df))  # best-of-2, warm
        hist = task_histogram(build())
        results[label] = {**hist, "wall_s": round(wall, 2)}
        print(f"{label:18s} {results[label]}")

    # sanity: salted result must equal unsalted result exactly
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    plain = left.join(right, on=["k"])
    salted = salted_join(left, right, on=["k"], salt_buckets=8)
    diff = plain.exceptAll(salted.select(*plain.columns)).count()
    diff += salted.select(*plain.columns).exceptAll(plain).count()
    print(f"semantic_diff_rows: {diff} (must be 0)")
    spark.stop()


if __name__ == "__main__":
    main()
