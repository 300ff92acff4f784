"""Bucketing co-location (SURVEY §7 E-e scale design): two tables
bucketed on the join key must join WITHOUT a shuffle — the physical
plan has no Exchange. This is the 100 TB fact-to-fact join strategy:
pay the shuffle once at write time, never again per query.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lmo_data_catalog_spark.catalog import Catalog

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    cat = Catalog(spark, SF)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    cat.orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_orders")
    cat.lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_lineitem")
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ta, tb = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table(ta)
            .join(
                spark.table(tb),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .select("o_orderkey", "l_quantity")
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join shuffled:\n{plan}"
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    ta, tb = bucketed_tables
    cat = Catalog(spark, SF)
    want = (
        cat.orders.join(
            cat.lineitem, F.col("o_orderkey") == F.col("l_orderkey")
        )
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 4).alias("q"),
        )
        .first()
    )
    got = (
        spark.table(ta)
        .join(spark.table(tb), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 4).alias("q"),
        )
        .first()
    )
    assert got == want
