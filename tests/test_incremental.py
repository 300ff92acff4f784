"""Incremental aggregate maintenance (operators/incremental.py):
state-after-N-batches must equal a full recompute over the union of
all batches — the decomposable-aggregate invariant — and untouched
key ranges must survive merges verbatim (the O(batch) cost claim)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lmo_data_catalog_spark.operators.incremental import (
    join_view_delta,
    read_aggregate,
    sync_incremental_agg,
    update_incremental_agg,
    update_incremental_join,
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


def test_null_merge_key_raises_not_duplicates(spark, tmp_path):
    """A NULL merge key cannot round-trip through merge()'s
    null-rejecting anti-join (the old null-key state row would survive
    beside the fresh partial — silent double rows), so both the init
    and the update path refuse it up front."""

    def nb(rows):
        return spark.createDataFrame(rows, "k bigint, amount double")

    t = VersionedTable(spark, str(tmp_path / "agg"))
    with pytest.raises(ValueError, match="NULL 'k'"):
        update_incremental_agg(t, nb([(None, 1.0)]), keys=["k"], specs=SPECS)
    update_incremental_agg(t, nb([(1, 1.0)]), keys=["k"], specs=SPECS)
    with pytest.raises(ValueError, match="NULL 'k'"):
        update_incremental_agg(
            t, nb([(1, 2.0), (None, 9.0)]), keys=["k"], specs=SPECS
        )
    # the failed batch left no partial state behind
    assert as_map(t.read()) == as_map(full_recompute(spark, [(1, 1.0)]))


# --------------------------------------- change feed + derived-table sync


def test_read_changes_returns_only_appended_rows(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "src"))
    v1 = t.commit(batch(spark, [(1, 1.0), (2, 2.0)]), stats_col="k")
    v2 = t.commit(batch(spark, [(3, 3.0)]), stats_col="k")
    t.commit(batch(spark, [(4, 4.0), (5, 5.0)]), stats_col="k")
    since_v1 = {(r["k"], r["amount"]) for r in t.read_changes(v1).collect()}
    assert since_v1 == {(3, 3.0), (4, 4.0), (5, 5.0)}
    only_v2_to_v3 = {
        (r["k"], r["amount"]) for r in t.read_changes(v1, v2).collect()
    }
    assert only_v2_to_v3 == {(3, 3.0)}
    # bootstrap (since=None) is the full snapshot; same-version is empty
    assert t.read_changes(None).count() == 5
    assert t.read_changes(t.head()).count() == 0


def test_read_changes_raises_across_rewrites(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "src"))
    v1 = t.commit(batch(spark, [(1, 1.0), (2, 2.0)]), stats_col="k")
    t.merge(batch(spark, [(1, 9.0)]), "k")
    with pytest.raises(ValueError, match="non-append"):
        t.read_changes(v1)


def test_sync_incremental_agg_exactly_once(spark, tmp_path):
    """Derived-table pipeline: the state follows the source's appends
    batch-by-batch, the consumed-version watermark rides the folding
    commit (re-sync is a no-op), and the final state equals a full
    recompute over the source."""
    src = VersionedTable(spark, str(tmp_path / "src"))
    st = VersionedTable(spark, str(tmp_path / "state"))
    all_rows = []
    for rows in (
        [(1, 10.0), (2, 5.0)],
        [(1, 2.5), (3, 7.0)],
        [(2, -1.0), (3, 7.0), (4, 100.0)],
    ):
        src.commit(batch(spark, rows), stats_col="k")
        all_rows += rows
        got = sync_incremental_agg(src, st, keys=["k"], specs=SPECS)
        assert got is not None
        assert as_map(st.read()) == as_map(full_recompute(spark, all_rows))
        assert int(st.get_props()["consumed_version"]) == src.head()
    # nothing new -> no-op, no new state version
    v = st.head()
    assert sync_incremental_agg(src, st, keys=["k"], specs=SPECS) is None
    assert st.head() == v


def test_sync_join_view_follows_two_change_feeds(spark, tmp_path):
    """sync_join_view maintains V = A >< B straight off the sources'
    change feeds with time-travel history reads: after every sync the
    view is multiset-equal to re-joining the current sources, repeated
    sync is a no-op, and both watermarks track the source heads."""
    from lmo_data_catalog_spark.operators.incremental import sync_join_view

    a = VersionedTable(spark, str(tmp_path / "a"))
    b = VersionedTable(spark, str(tmp_path / "b"))
    v = VersionedTable(spark, str(tmp_path / "v"))

    def sa(rows):
        return spark.createDataFrame(rows, "k bigint, a_val string")

    def sb(rows):
        return spark.createDataFrame(rows, "k bigint, b_val string")

    steps = [
        (sa([(1, "a1"), (2, "a2")]), sb([(1, "b1")])),  # bootstrap both
        (None, sb([(2, "b2"), (3, "b3")])),  # B only
        (sa([(3, "a3"), (1, "a1x")]), None),  # A only
        (sa([(9, "a9")]), sb([(9, "b9"), (1, "b1x")])),  # both
    ]
    for da, db in steps:
        if da is not None:
            a.commit(da, stats_col="k")
        if db is not None:
            b.commit(db, stats_col="k")
        assert sync_join_view(a, b, v, on="k") is not None
        full = a.read().join(b.read(), "k")
        assert _multiset_eq(v.read(), full)
        props = v.get_props()
        assert int(props["consumed_version_a"]) == a.head()
        assert int(props["consumed_version_b"]) == b.head()
    head = v.head()
    assert sync_join_view(a, b, v, on="k") is None
    assert v.head() == head
    # a rewrite on a source invalidates its feed: sync must raise, not
    # silently double-count
    a.merge(sa([(1, "rewritten")]), "k")
    with pytest.raises(ValueError, match="non-append"):
        sync_join_view(a, b, v, on="k")


# ------------------------------------------------- join-view maintenance


def _multiset_eq(a, b):
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def _jv(spark, tmp_path, name="jv"):
    return (
        VersionedTable(spark, str(tmp_path / f"{name}_a")),
        VersionedTable(spark, str(tmp_path / f"{name}_b")),
        VersionedTable(spark, str(tmp_path / f"{name}_v")),
    )


def side_a(spark, rows):
    return spark.createDataFrame(rows, "k bigint, a_val string")


def side_b(spark, rows):
    return spark.createDataFrame(rows, "k bigint, b_val string")


def test_join_view_equals_full_recompute_after_every_batch(spark, tmp_path):
    """The IVM invariant: after each batch (appends on either or both
    sides, duplicate keys included so multiplicities multiply), the
    maintained view is multiset-equal to re-joining the full states."""
    a_t, b_t, v_t = _jv(spark, tmp_path)
    batches = [
        ([(1, "a1"), (2, "a2")], [(1, "b1")]),
        (None, [(1, "b1x"), (2, "b2"), (3, "b3")]),
        ([(1, "a1dup"), (3, "a3"), (3, "a3dup")], None),
        ([(9, "a9")], [(9, "b9"), (9, "b9x")]),
    ]
    for da, db in batches:
        update_incremental_join(
            a_t,
            b_t,
            v_t,
            on="k",
            delta_a=None if da is None else side_a(spark, da),
            delta_b=None if db is None else side_b(spark, db),
        )
        full = a_t.read().join(b_t.read(), "k")
        assert _multiset_eq(v_t.read(), full)


def test_join_view_null_keys_append_but_never_join(spark, tmp_path):
    a_t, b_t, v_t = _jv(spark, tmp_path)
    update_incremental_join(
        a_t, b_t, v_t, on="k", delta_a=side_a(spark, [(1, "a1")]),
        delta_b=side_b(spark, [(1, "b1")]),
    )
    # NULL-key-only batch: state grows, view does not (and no view
    # version is committed for the empty delta union).
    v_before = v_t.head()
    update_incremental_join(
        a_t, b_t, v_t, on="k",
        delta_a=side_a(spark, [(None, "a_null")]),
    )
    assert a_t.read().count() == 2
    assert v_t.head() == v_before
    assert _multiset_eq(v_t.read(), a_t.read().join(b_t.read(), "k"))


def test_join_view_delta_rejects_ambiguous_columns(spark):
    with pytest.raises(ValueError, match="non-key"):
        join_view_delta(
            side_a(spark, [(1, "x")]),
            side_a(spark, [(1, "y")]),  # same non-key column name
            None,
            None,
            on="k",
        )


def test_join_view_update_prunes_history_by_key_envelope(spark, tmp_path):
    """The O(Δ ⋈ touched-history) claim: a key-local batch's history
    read must include only state directories whose zone map intersects
    the delta's join-key envelope."""
    a_t, b_t, v_t = _jv(spark, tmp_path)
    # Two key-disjoint B commits -> two directories with zone maps.
    update_incremental_join(
        a_t, b_t, v_t, on="k",
        delta_b=side_b(spark, [(k, f"lo{k}") for k in range(0, 10)]),
    )
    update_incremental_join(
        a_t, b_t, v_t, on="k",
        delta_b=side_b(spark, [(k, f"hi{k}") for k in range(100, 110)]),
    )
    pruned = b_t.read_range("k", 100, 109)
    files = {r[0] for r in pruned.select(F.input_file_name()).distinct().collect()}
    all_files = {
        r[0]
        for r in b_t.read().select(F.input_file_name()).distinct().collect()
    }
    assert len(files) < len(all_files)
    # and the maintained view only ever saw the pruned side: the
    # invariant still holds after joining into the high range.
    update_incremental_join(
        a_t, b_t, v_t, on="k", delta_a=side_a(spark, [(105, "a105")])
    )
    assert _multiset_eq(v_t.read(), a_t.read().join(b_t.read(), "k"))
    got = {(r["k"], r["a_val"], r["b_val"]) for r in v_t.read().collect()}
    assert got == {(105, "a105", "hi105")}
