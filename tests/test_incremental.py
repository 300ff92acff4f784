"""Incremental aggregate maintenance (operators/incremental.py):
state-after-N-batches must equal a full recompute over the union of
all batches — the decomposable-aggregate invariant — and untouched
key ranges must survive merges verbatim (the O(batch) cost claim)."""

from __future__ import annotations

import pytest

from lmo_data_catalog_spark.operators.incremental import (
    read_aggregate,
    update_incremental_agg,
)
from lmo_data_catalog_spark.sources.versioned import VersionedTable

SPECS = {"amount": ("sum", "min", "max")}


def batch(spark, rows):
    return spark.createDataFrame(rows, ["k", "amount"])


def full_recompute(spark, all_rows):
    from pyspark.sql import functions as F

    return (
        batch(spark, all_rows)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.sum("amount").alias("amount_sum"),
            F.min("amount").alias("amount_min"),
            F.max("amount").alias("amount_max"),
        )
    )


def as_map(df):
    return {
        r["k"]: (
            r["row_count"],
            r["amount_sum"],
            r["amount_min"],
            r["amount_max"],
        )
        for r in df.collect()
    }


def test_state_equals_full_recompute(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "agg"))
    batches = [
        [(1, 10.0), (2, 5.0), (1, 2.5)],
        [(2, -1.0), (3, 7.0)],
        [(1, 0.5), (3, 7.0), (4, 100.0)],
    ]
    seen = []
    for b in batches:
        update_incremental_agg(t, batch(spark, b), keys=["k"], specs=SPECS)
        seen += b
        assert as_map(t.read()) == as_map(full_recompute(spark, seen))


def test_avg_derived_from_components(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "agg"))
    update_incremental_agg(
        t, batch(spark, [(1, 4.0), (1, 8.0)]), keys=["k"], specs=SPECS
    )
    update_incremental_agg(
        t, batch(spark, [(1, 6.0)]), keys=["k"], specs=SPECS
    )
    row = read_aggregate(t, derive_avg=["amount"]).collect()[0]
    assert row["amount_avg"] == pytest.approx(6.0)


def test_untouched_key_ranges_survive_merge_verbatim(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "agg"))
    # Init with two disjoint key ranges committed separately so each
    # directory has its own zone map.
    update_incremental_agg(
        t,
        batch(spark, [(k, 1.0) for k in range(0, 10)]),
        keys=["k"],
        specs=SPECS,
    )
    low_dir = t._load_manifest(t.head())["data_dirs"][0]
    update_incremental_agg(
        t,
        batch(spark, [(k, 1.0) for k in range(100, 110)]),
        keys=["k"],
        specs=SPECS,
    )
    # A batch touching only the high range must not rewrite low_dir...
    # note merge prunes on [min,max] of the touched-key batch.
    update_incremental_agg(
        t, batch(spark, [(105, 9.0)]), keys=["k"], specs=SPECS
    )
    dirs = t._load_manifest(t.head())["data_dirs"]
    assert low_dir in dirs
    # and the state is still exactly the recompute.
    all_rows = (
        [(k, 1.0) for k in range(0, 10)]
        + [(k, 1.0) for k in range(100, 110)]
        + [(105, 9.0)]
    )
    assert as_map(t.read()) == as_map(full_recompute(spark, all_rows))


def test_composite_key_siblings_survive_merge(spark, tmp_path):
    """Regression (r6 advice): merge() runs on keys[0] only, so a state
    row sharing keys[0] with a touched key but differing in the
    secondary key must be carried into the rewrite — dropping it is
    silent row loss."""
    from pyspark.sql import functions as F

    def batch2(rows):
        return spark.createDataFrame(rows, ["k", "g", "amount"])

    t = VersionedTable(spark, str(tmp_path / "agg2"))
    update_incremental_agg(
        t,
        batch2([(1, "a", 10.0), (1, "b", 20.0), (2, "a", 5.0)]),
        keys=["k", "g"],
        specs=SPECS,
    )
    # Touches only (1, 'a'); (1, 'b') shares the merge key k=1.
    update_incremental_agg(
        t, batch2([(1, "a", 1.0)]), keys=["k", "g"], specs=SPECS
    )
    got = {
        (r["k"], r["g"]): (r["row_count"], r["amount_sum"])
        for r in t.read().collect()
    }
    assert got == {
        (1, "a"): (2, 11.0),
        (1, "b"): (1, 20.0),  # the sibling row merge() would have lost
        (2, "a"): (1, 5.0),
    }
    exp = (
        batch2([(1, "a", 10.0), (1, "b", 20.0), (2, "a", 5.0), (1, "a", 1.0)])
        .groupBy("k", "g")
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.sum("amount").alias("amount_sum"),
            F.min("amount").alias("amount_min"),
            F.max("amount").alias("amount_max"),
        )
    )
    assert t.read().exceptAll(exp).count() == 0
    assert exp.exceptAll(t.read()).count() == 0
