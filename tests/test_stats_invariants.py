"""Mathematical invariants of the statistics/graph queries — bounds
that must hold at ANY scale factor (the differential proves engine
agreement; these prove the numbers mean what their names claim), plus
the registry documentation contract."""

from __future__ import annotations

import pytest

from lmo_data_catalog_spark.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def rows(spark, name):
    return REGISTRY[name].builder(spark, SF).collect()


def test_correlations_bounded(spark):
    for r in rows(spark, "corr_regression_price_quantity"):
        assert -1.0 <= r["corr_pq"] <= 1.0
        assert 0.0 <= r["r2"] <= 1.0
        # r2 of simple linear regression equals corr^2 (to rounding)
        assert r["r2"] == pytest.approx(r["corr_pq"] ** 2, abs=2e-6)


def test_concentration_metrics_bounded(spark):
    for r in rows(spark, "hhi_source_concentration"):
        assert 1.0 / r["n_sources"] <= r["hhi"] + 1e-9
        assert r["hhi"] <= 1.0
    (g,) = rows(spark, "gini_source_balance")
    assert 0.0 <= g["gini"] < 1.0
    (t,) = rows(spark, "top1pct_revenue_share")
    # top 1% of customers holds at least 1% of revenue (sorted desc)
    assert t["top_share"] >= t["top_pct_customers"] / t["n_customers"]
    assert t["top_share"] <= 1.0


def test_entropy_and_kl_nonnegative_and_consistent(spark):
    ent = {r["source"]: r["entropy_nats"] for r in rows(spark, "lang_entropy_by_source")}
    kl = {r["source"]: r["kl_nats"] for r in rows(spark, "lang_kl_by_source")}
    import math

    for s, e in ent.items():
        assert -1e-9 <= e <= math.log(5) + 1e-9  # ≤ ln(n_langs)
    for s, d in kl.items():
        assert d >= -1e-9  # Gibbs' inequality


def test_chi2_and_autocorr_bounds(spark):
    (c,) = rows(spark, "chi2_priority_status_independence")
    assert c["chi2"] >= 0 and 0.0 <= c["cramers_v"] <= 1.0
    assert c["dof"] == 8  # (5-1)*(3-1)
    (a,) = rows(spark, "daily_revenue_autocorr")
    assert -1.0 <= a["autocorr_lag1"] <= 1.0
    assert -1.0 <= a["autocorr_lag7"] <= 1.0


def test_pagerank_mass_conserved(spark):
    prs = rows(spark, "pagerank_part_cooccurrence")
    total = sum(r["pagerank"] for r in prs)
    # no dangling nodes -> total rank == node count (to rounding)
    assert total == pytest.approx(len(prs), rel=1e-4)
    assert all(r["pagerank"] > 0 for r in prs)


def test_seasonal_indices_sum_near_zero(spark):
    idx = rows(spark, "weekday_seasonal_indices")
    assert len(idx) == 7
    # additive decomposition: weekday effects roughly cancel (they are
    # means of detrended values whose global mean is ~0)
    total_days = sum(r["n_days"] for r in idx)
    weighted = sum(r["seasonal_index"] * r["n_days"] for r in idx)
    daily_scale = max(abs(r["seasonal_index"]) for r in idx) + 1.0
    assert abs(weighted / total_days) < daily_scale


def test_every_registry_query_is_documented():
    undocumented = [
        n
        for n, s in REGISTRY.items()
        if not (s.builder.__doc__ and len(s.builder.__doc__.strip()) >= 80)
    ]
    assert not undocumented, (
        "registry builders need real docstrings (scale notes + "
        f"semantics): {undocumented}"
    )


def test_spearman_average_ranks_match_naive_window(spark):
    """The two-phase average-rank plan (bucketed global_row_numbers +
    keyed tie-group AVG) must equal the naive single-task
    rank+avg window bit-for-bit — same invariant the oracle pins, but
    here at the rank level so a future ranker change can't hide
    inside a still-passing 6-dp correlation."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lmo_data_catalog_spark.catalog import Catalog
    from lmo_data_catalog_spark.operators.windows import global_row_numbers

    li = (
        Catalog(spark, "/root/testdata/sf0.001")
        .lineitem.select(
            F.col("l_quantity").alias("q"), "l_orderkey", "l_linenumber"
        )
    )
    ranked = global_row_numbers(
        li,
        [("q", True, "__rn")],
        tiebreak_cols=["l_orderkey", "l_linenumber"],
    )
    two_phase = ranked.select(
        "l_orderkey",
        "l_linenumber",
        F.avg("__rn").over(Window.partitionBy("q")).alias("r"),
    )
    naive = li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.rank().over(Window.orderBy("q"))
            + (F.count(F.lit(1)).over(Window.partitionBy("q")) - 1) / 2.0
        ).alias("r"),
    )
    a = {(r.l_orderkey, r.l_linenumber): r.r for r in two_phase.collect()}
    b = {(r.l_orderkey, r.l_linenumber): r.r for r in naive.collect()}
    assert a == b
