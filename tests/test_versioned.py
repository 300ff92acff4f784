"""Versioned parquet table (sources/versioned.py): snapshot commits,
time travel, rollback, optimistic-concurrency conflict, vacuum, and
schema evolution — the sink/metadata surface the DuckDB oracle cannot
reach, pinned here like the workbook sinks."""

from __future__ import annotations

import os

import pytest

from lmo_data_catalog_spark.sources.versioned import (
    CommitConflict,
    VersionedTable,
)


def df_of(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def rows_set(df):
    return {tuple(r) for r in df.collect()}


def test_append_overwrite_and_time_travel(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    assert t.head() is None
    v1 = t.commit(df_of(spark, [(1, "a"), (2, "b")], ["id", "val"]))
    v2 = t.commit(df_of(spark, [(3, "c")], ["id", "val"]))
    v3 = t.commit(
        df_of(spark, [(9, "z")], ["id", "val"]), mode="overwrite"
    )
    assert (v1, v2, v3) == (1, 2, 3)
    assert rows_set(t.read(1)) == {(1, "a"), (2, "b")}
    assert rows_set(t.read(2)) == {(1, "a"), (2, "b"), (3, "c")}
    assert rows_set(t.read()) == {(9, "z")}
    assert [h["operation"] for h in t.history()] == [
        "append",
        "append",
        "overwrite",
    ]


def test_rollback_is_a_new_auditable_commit(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.commit(df_of(spark, [(1, "a")], ["id", "val"]))
    t.commit(df_of(spark, [(2, "b")], ["id", "val"]))
    v = t.rollback(1)
    assert v == 3 and t.head() == 3
    assert rows_set(t.read()) == {(1, "a")}
    # history keeps the bad version; nothing was deleted
    assert rows_set(t.read(2)) == {(1, "a"), (2, "b")}
    assert t.history()[-1]["operation"] == "rollback(1)"


def test_concurrent_publish_single_winner(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.commit(df_of(spark, [(1, "a")], ["id", "val"]))
    # Two writers race for version 2 (both read head == 1): the first
    # publish wins, the second raises and leaves the winner untouched.
    winner = {"version": 2, "parent": 1, "operation": "append",
              "data_dirs": t._load_manifest(1)["data_dirs"]}
    t._publish(2, winner)
    with pytest.raises(CommitConflict):
        t._publish(2, {**winner, "operation": "loser"})
    assert t.head() == 2
    assert t._load_manifest(2)["operation"] == "append"
    # The loser retries against the new head and lands as version 3.
    v3 = t.commit(df_of(spark, [(3, "c")], ["id", "val"]))
    assert v3 == 3
    assert rows_set(t.read()) == {(1, "a"), (3, "c")}


def test_vacuum_reclaims_unreferenced_files_only(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.commit(df_of(spark, [(1, "a")], ["id", "val"]))
    t.commit(df_of(spark, [(9, "z")], ["id", "val"]), mode="overwrite")
    removed = t.vacuum(keep_last=1)
    # v1's directory is gone, v2 still reads
    assert len(removed) == 1
    assert t.versions() == [2]
    assert rows_set(t.read()) == {(9, "z")}
    with pytest.raises(FileNotFoundError):
        t._load_manifest(1)
    # all remaining data dirs are referenced
    live = set(t._load_manifest(2)["data_dirs"])
    assert set(os.listdir(t._data_dir)) == live


def test_schema_evolution_reads_null_for_missing_columns(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.commit(df_of(spark, [(1, "a")], ["id", "val"]))
    t.commit(df_of(spark, [(2, "b", 7.5)], ["id", "val", "score"]))
    got = {
        (r["id"], r["val"], r["score"]) for r in t.read().collect()
    }
    assert got == {(1, "a", None), (2, "b", 7.5)}


def test_crash_mid_commit_leaves_readers_consistent(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.commit(df_of(spark, [(1, "a")], ["id", "val"]))
    # Simulate a crashed writer: data landed, manifest never published.
    # Its version (head+1) is indistinguishable from an IN-FLIGHT
    # commit, so vacuum must leave it until the head passes it.
    df_of(spark, [(99, "junk")], ["id", "val"]).write.parquet(
        os.path.join(t._data_dir, "c00002-deadbeef")
    )
    assert rows_set(t.read()) == {(1, "a")}  # orphan invisible
    assert t.vacuum(keep_last=1) == []  # possibly in-flight: kept
    t.commit(df_of(spark, [(2, "b")], ["id", "val"]))  # head reaches 2
    removed = t.vacuum(keep_last=1)  # now provably dead: reclaimed
    assert removed == ["c00002-deadbeef"]
    assert rows_set(t.read()) == {(1, "a"), (2, "b")}


def test_merge_upserts_deletes_and_prunes_directories(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    # Three appends with disjoint key ranges, zone maps recorded.
    t.commit(df_of(spark, [(i, "v1") for i in range(0, 10)],
                   ["id", "val"]), stats_col="id")
    t.commit(df_of(spark, [(i, "v1") for i in range(10, 20)],
                   ["id", "val"]), stats_col="id")
    t.commit(df_of(spark, [(i, "v1") for i in range(20, 30)],
                   ["id", "val"]), stats_col="id")
    before = t._load_manifest(3)["data_dirs"]

    updates = df_of(spark, [(12, "NEW"), (14, "NEW"), (99, "INS")],
                    ["id", "val"])
    deletes = df_of(spark, [(13,)], ["id"])
    v = t.merge(updates, "id", deletes=deletes)
    assert v == 4

    got = {(r["id"], r["val"]) for r in t.read().collect()}
    want = {(i, "v1") for i in range(0, 30) if i not in (12, 13, 14)}
    want |= {(12, "NEW"), (14, "NEW"), (99, "INS")}
    assert got == want

    # Dirs 1 and 3 (ranges 0-9, 20-29) are outside [12, 99]... range
    # [20, 29] overlaps [12, 99], so only dir 1 is pruned; dirs 2+3
    # rewritten into the merge directory.
    after = t._load_manifest(4)["data_dirs"]
    assert before[0] in after          # 0-9 carried forward verbatim
    assert before[1] not in after      # 10-19 rewritten
    assert before[2] not in after      # 20-29 overlaps the batch range
    # pruned directory keeps its zone map
    zm = t._load_manifest(4)["stats"][before[0]]
    assert (zm["min"], zm["max"]) == (0, 9)


def test_merge_prunes_everything_outside_a_tight_batch(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    for lo in (0, 10, 20):
        t.commit(df_of(spark, [(i, "v1") for i in range(lo, lo + 10)],
                       ["id", "val"]), stats_col="id")
    before = t._load_manifest(3)["data_dirs"]
    v = t.merge(df_of(spark, [(15, "NEW")], ["id", "val"]), "id")
    after = t._load_manifest(v)["data_dirs"]
    # Only the middle directory intersects [15, 15].
    assert before[0] in after and before[2] in after
    assert before[1] not in after
    got = {(r["id"], r["val"]) for r in t.read().collect()}
    assert (15, "NEW") in got and len(got) == 30


def test_merge_delete_only(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.commit(df_of(spark, [(1, "a"), (2, "b"), (3, "c")],
                   ["id", "val"]), stats_col="id")
    v = t.merge(None, "id", deletes=df_of(spark, [(2,)], ["id"]))
    assert {(r["id"], r["val"]) for r in t.read(v).collect()} == {
        (1, "a"), (3, "c")
    }


def test_read_range_prunes_by_zone_map(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    for lo in (0, 10, 20):
        t.commit(df_of(spark, [(i, "v") for i in range(lo, lo + 10)],
                       ["id", "val"]), stats_col="id")
    # range confined to the middle directory
    mid = t.read_range("id", 12, 17)
    assert {r["id"] for r in mid.collect()} == set(range(10, 20))
    # spanning two directories
    two = t.read_range("id", 5, 15)
    assert {r["id"] for r in two.collect()} == set(range(0, 20))
    # disjoint from everything -> empty (schema preserved)
    none = t.read_range("id", 1000, 2000)
    assert none.count() == 0 and none.columns == ["id", "val"]


def test_bloom_prunes_range_spanning_sparse_batch(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    for lo in (0, 100, 200):
        t.commit(
            df_of(spark, [(i, "v") for i in range(lo, lo + 10)],
                  ["id", "val"]),
            stats_col="id",
            bloom_bits=1024,
        )
    before = t._load_manifest(3)["data_dirs"]
    # Batch keys {15, 205}: the [15, 205] envelope SPANS dir 2
    # (100-109), but neither key is in it — only the Bloom can prove
    # that. Key 15 hits nothing (insert); 205 rewrites dir 3.
    v = t.merge(
        df_of(spark, [(15, "NEW"), (205, "NEW")], ["id", "val"]),
        "id",
        bloom_bits=1024,
    )
    after = t._load_manifest(v)["data_dirs"]
    assert before[0] in after      # 0-9: zone-map pruned (below 15)
    assert before[1] in after      # 100-109: BLOOM pruned
    assert before[2] not in after  # 200-209: contains 205, rewritten
    got = {(r["id"], r["val"]) for r in t.read().collect()}
    want = {(i, "v") for i in range(0, 10)}
    want |= {(i, "v") for i in range(100, 110)}
    want |= {(i, "v") for i in range(200, 210) if i != 205}
    want |= {(15, "NEW"), (205, "NEW")}
    assert got == want
    # the merge directory carries its own bloom for future merges
    newdir = [d for d in after if d not in before][0]
    assert "bloom" in t._load_manifest(v)["stats"][newdir]


def test_rollback_preserves_zone_maps(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.commit(df_of(spark, [(1, "a")], ["id", "val"]), stats_col="id")
    t.commit(df_of(spark, [(2, "b")], ["id", "val"]), stats_col="id")
    v = t.rollback(1)
    assert t._load_manifest(v)["stats"] != {}
    # pruned merges still work after a rollback
    t.merge(df_of(spark, [(50, "c")], ["id", "val"]), "id")
    assert (50, "c") in {(r["id"], r["val"]) for r in t.read().collect()}


def test_diff_between_snapshots(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.commit(df_of(spark, [(1, "a"), (2, "b"), (3, "c")], ["id", "val"]),
             stats_col="id")
    t.merge(df_of(spark, [(2, "B2"), (4, "d")], ["id", "val"]), "id",
            deletes=df_of(spark, [(3,)], ["id"]))
    got = {(r["id"], r["change"]) for r in t.diff(1, 2, "id").collect()}
    assert got == {(4, "added"), (3, "removed"), (2, "changed")}
    # unchanged rows are absent; diff of a version with itself is empty
    assert t.diff(2, 2, "id").count() == 0


def test_threaded_append_race_single_winner_per_version(spark, tmp_path):
    """Eight real writer threads, three appends each, all racing the
    same table through commit_retry: every version number is won by
    exactly one writer and no rows are lost."""
    import threading

    t = VersionedTable(spark, str(tmp_path / "tbl"))
    errors = []

    def writer(wid: int):
        try:
            for j in range(3):
                t.commit_retry(
                    df_of(spark, [(wid * 10 + j, f"w{wid}")], ["id", "val"]),
                    attempts=50,
                )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    assert t.head() == 24  # dense version numbers, one winner each
    got = {(r["id"], r["val"]) for r in t.read().collect()}
    want = {(w * 10 + j, f"w{w}") for w in range(8) for j in range(3)}
    assert got == want


def test_commit_checked_enforces_constraints(spark, tmp_path):
    from lmo_data_catalog_spark.sources.versioned import ConstraintViolation

    t = VersionedTable(spark, str(tmp_path / "tbl"))
    rules = dict(
        not_null=("val",),
        unique=("id",),
        checks={"positive_id": "id >= 0"},
    )
    v = t.commit_checked(
        df_of(spark, [(1, "a"), (2, "b")], ["id", "val"]), **rules
    )
    assert v == 1
    for bad_rows, why in [
        ([(3, None)], "not_null"),
        ([(4, "d"), (4, "e")], "unique"),
        ([(-1, "f")], "check"),
    ]:
        bad = spark.createDataFrame(bad_rows, "id long, val string")
        with pytest.raises(ConstraintViolation) as ei:
            t.commit_checked(bad, **rules)
        assert why in str(ei.value)
    # nothing landed: head unchanged, snapshot unchanged
    assert t.head() == 1
    assert rows_set(t.read()) == {(1, "a"), (2, "b")}
    # report-only path lists every violation at once
    msgs = t.check_constraints(
        spark.createDataFrame([(-5, None), (-5, "x")], "id long, val string"),
        **rules,
    )
    assert len(msgs) == 3


def test_vacuum_then_merge_keeps_pruning_and_consistency(spark, tmp_path):
    """After vacuuming history away, the surviving head still carries
    its zone maps/blooms, pruned merges still work, and no data a
    retained manifest references was reclaimed."""
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    for lo in (0, 100):
        t.commit(
            df_of(spark, [(i, "v") for i in range(lo, lo + 10)],
                  ["id", "val"]),
            stats_col="id",
            bloom_bits=512,
        )
    t.merge(df_of(spark, [(105, "X")], ["id", "val"]), "id",
            bloom_bits=512)
    removed = t.vacuum(keep_last=1)
    assert t.versions() == [3]
    # the low-range dir survived all merges AND the vacuum
    got = {(r["id"], r["val"]) for r in t.read().collect()}
    want = {(i, "v") for i in range(0, 10)}
    want |= {(i, "v") for i in range(100, 110) if i != 105}
    want |= {(105, "X")}
    assert got == want
    # merge after vacuum still prunes on the retained stats
    before = t._load_manifest(3)["data_dirs"]
    v = t.merge(df_of(spark, [(300, "NEW")], ["id", "val"]), "id")
    after = t._load_manifest(v)["data_dirs"]
    assert set(before) <= set(after)  # nothing rewritten: all pruned
    assert removed  # vacuum actually reclaimed the rewritten dirs


def test_date_keyed_zone_maps_commit_merge_and_prune(spark, tmp_path):
    """Regression (r6 advice): DATE/DECIMAL stats_col bounds are
    datetime.date/Decimal objects json.dump cannot serialize — commit
    used to crash AFTER the parquet write (orphaned data, no version).
    Bounds are now stored in a tagged canonical form and decoded for
    order-faithful comparison in merge/read_range."""
    import datetime

    t = VersionedTable(spark, str(tmp_path / "bydate"))
    d = datetime.date
    jan = df_of(
        spark,
        [(d(2024, 1, i), float(i)) for i in (1, 2, 3)],
        ["day", "v"],
    )
    feb = df_of(
        spark,
        [(d(2024, 2, i), float(i)) for i in (1, 2)],
        ["day", "v"],
    )
    t.commit(jan, stats_col="day")
    t.commit(feb, stats_col="day")
    jan_dir, feb_dir = t._load_manifest(t.head())["data_dirs"]
    # manifest is valid JSON with ISO-tagged bounds
    zm = t._load_manifest(t.head())["stats"][jan_dir]
    assert zm["vtype"] == "date" and zm["min"] == "2024-01-01"
    # a merge touching only February must carry January forward verbatim
    upd = df_of(spark, [(d(2024, 2, 1), 99.0)], ["day", "v"])
    t.merge(upd, "day")
    dirs = t._load_manifest(t.head())["data_dirs"]
    assert jan_dir in dirs and feb_dir not in dirs
    assert rows_set(t.read()) == {
        (d(2024, 1, 1), 1.0),
        (d(2024, 1, 2), 2.0),
        (d(2024, 1, 3), 3.0),
        (d(2024, 2, 1), 99.0),
        (d(2024, 2, 2), 2.0),
    }
    # read_range prunes by decoded date bounds
    feb_read = t.read_range("day", d(2024, 2, 1), d(2024, 2, 28))
    assert all(r["day"].month == 2 for r in feb_read.collect())


def test_decimal_zone_maps_decode_order_faithfully(spark, tmp_path):
    """Decimal('9') > Decimal('10') as strings but not as values —
    pruning must compare decoded Decimals, and a merge touching 10
    must NOT prune the directory holding 9..11."""
    from decimal import Decimal

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("amt", T.DecimalType(10, 2)),
            T.StructField("v", T.StringType()),
        ]
    )
    t = VersionedTable(spark, str(tmp_path / "bydec"))
    t.commit(
        spark.createDataFrame(
            [(Decimal("9.00"), "a"), (Decimal("11.00"), "b")], schema
        ),
        stats_col="amt",
    )
    zm = t._load_manifest(t.head())["stats"]
    (only,) = zm.values()
    assert only["vtype"] == "decimal"
    t.merge(
        spark.createDataFrame([(Decimal("10.00"), "new")], schema), "amt"
    )
    assert rows_set(t.read()) == {
        (Decimal("9.00"), "a"),
        (Decimal("11.00"), "b"),
        (Decimal("10.00"), "new"),
    }


def test_vacuum_skips_inflight_commit_directories(spark, tmp_path):
    """Regression (r6 advice): a concurrent commit writes its data dir
    before publishing its manifest; vacuum racing that window must not
    delete it. Directories whose c<version> prefix exceeds the max
    retained version are in-flight, not garbage."""
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.commit(df_of(spark, [(1, "a")], ["id", "val"]))
    t.commit(df_of(spark, [(2, "b")], ["id", "val"]))
    head = t.head()
    # simulate the in-flight window: data dir for version head+1 exists,
    # manifest not yet published
    inflight = f"c{head + 1:05d}-deadbeef"
    df_of(spark, [(3, "c")], ["id", "val"]).write.parquet(
        os.path.join(t._data_dir, inflight)
    )
    # an abandoned orphan from a LOST race at an already-passed version
    orphan = f"c{head:05d}-0badf00d"
    df_of(spark, [(4, "d")], ["id", "val"]).write.parquet(
        os.path.join(t._data_dir, orphan)
    )
    removed = t.vacuum(keep_last=1)
    assert orphan in removed
    assert inflight not in removed
    assert os.path.isdir(os.path.join(t._data_dir, inflight))
    # grace_seconds also protects arbitrarily-named young directories
    young = "nonstandard-name"
    df_of(spark, [(5, "e")], ["id", "val"]).write.parquet(
        os.path.join(t._data_dir, young)
    )
    assert young not in t.vacuum(keep_last=1, grace_seconds=3600)
    assert young in t.vacuum(keep_last=1)


def test_schema_evolution_add_and_widen_across_commits(spark, tmp_path):
    """Add-column + safe type widening (int->bigint, float->double)
    across commits: reads up-cast old files at the evolved schema, the
    manifest records the logical schema per version, and time travel
    sees the schema AS OF the version it reads."""
    from pyspark.sql import functions as F

    t = VersionedTable(spark, str(tmp_path / "evo"))
    t.commit(
        spark.range(0, 3).select(
            F.col("id").cast("int").alias("k"),
            F.lit(1.5).cast("float").alias("v"),
        )
    )
    t.commit(
        spark.range(3, 5).select(
            F.col("id").cast("bigint").alias("k"),
            F.lit(2.5).cast("double").alias("v"),
            F.lit("new").alias("tag"),
        )
    )
    got = t.read()
    assert got.schema.simpleString() == "struct<k:bigint,v:double,tag:string>"
    assert rows_set(got) == {
        (0, 1.5, None), (1, 1.5, None), (2, 1.5, None),
        (3, 2.5, "new"), (4, 2.5, "new"),
    }
    # time travel: v1 predates the evolution entirely
    assert t.read(1).schema.simpleString() == "struct<k:int,v:float>"
    assert t.schema(1).fieldNames() == ["k", "v"]


def test_schema_evolution_rejects_incompatible_change(spark, tmp_path):
    from pyspark.sql import functions as F

    from lmo_data_catalog_spark.sources.versioned import (
        SchemaEvolutionError,
    )

    t = VersionedTable(spark, str(tmp_path / "evo"))
    t.commit(spark.range(3).select(F.col("id").alias("k")))
    head = t.head()
    with pytest.raises(SchemaEvolutionError, match="cannot evolve"):
        t.commit(
            spark.range(3).select(F.col("id").cast("string").alias("k"))
        )
    assert t.head() == head  # nothing published; table intact
    # a NARROWER batch is fine: the table schema stays at the wider
    # type and the batch's int32 files up-cast at read time
    t.commit(spark.range(3, 6).select(F.col("id").cast("int").alias("k")))
    assert t.read().schema.simpleString() == "struct<k:bigint>"
    assert {r["k"] for r in t.read().collect()} == {0, 1, 2, 3, 4, 5}


def test_merge_across_schema_versions_keeps_pruning(spark, tmp_path):
    """A pruned MERGE over a table whose directories span two schema
    versions: untouched pre-evolution directories carry forward
    verbatim (no rewrite), rewritten ones up-cast to the evolved
    schema, and the merge's update batch may itself add a column."""
    from pyspark.sql import functions as F

    t = VersionedTable(spark, str(tmp_path / "evo"))
    # two disjoint key ranges, old schema (int keys, no 'score')
    t.commit(
        spark.range(0, 10).select(F.col("id").cast("int").alias("k")),
        stats_col="k",
    )
    t.commit(
        spark.range(100, 110).select(F.col("id").cast("int").alias("k")),
        stats_col="k",
    )
    low_dir = t._load_manifest(t.head())["data_dirs"][0]
    # merge touches only the high range AND evolves: bigint keys + new col
    t.merge(
        spark.createDataFrame([(105, 9.5)], "k: bigint, score: double"),
        "k",
    )
    dirs = t._load_manifest(t.head())["data_dirs"]
    assert low_dir in dirs  # zone-map pruning survived the evolution
    got = t.read()
    assert got.schema.simpleString() == "struct<k:bigint,score:double>"
    by_k = {r["k"]: r["score"] for r in got.collect()}
    assert by_k[105] == 9.5
    assert by_k[0] is None and by_k[104] is None
    assert len(by_k) == 20
    # a later merge on the LOW range reads pre-evolution files at the
    # evolved schema while rewriting them
    t.merge(
        spark.createDataFrame([(0, 1.0)], "k: bigint, score: double"), "k"
    )
    by_k = {r["k"]: r["score"] for r in t.read().collect()}
    assert by_k[0] == 1.0 and by_k[1] is None and len(by_k) == 20


def test_compact_restores_pruning_after_fragmented_ingest(spark, tmp_path):
    """Many small overlapping commits (the streaming-sink shape) break
    zone-map pruning — every directory spans the key space. compact()
    rewrites the head into disjoint key-range directories: content
    identical, history intact, and a narrow merge afterwards rewrites
    one slice instead of everything."""
    from pyspark.sql import functions as F

    t = VersionedTable(spark, str(tmp_path / "frag"))
    # 6 micro-batch commits, each spanning the whole key space
    for b in range(6):
        rows = [(k, f"b{b}") for k in range(b, 600, 6)]
        t.commit(df_of(spark, rows, ["k", "val"]), stats_col="k")
    pre = t.read()
    pre_rows = rows_set(pre)
    frag_head = t.head()
    # fragmented: a tight merge rewrites EVERY directory (all overlap)
    m = t._load_manifest(frag_head)
    assert len(m["data_dirs"]) == 6

    v = t.compact("k", n_dirs=4)
    m = t._load_manifest(v)
    assert 1 < len(m["data_dirs"]) <= 4
    # content identical, time travel intact
    assert rows_set(t.read()) == pre_rows
    assert rows_set(t.read(frag_head)) == pre_rows
    # zone maps are disjoint and ordered
    zms = [
        (m["stats"][d]["min"], m["stats"][d]["max"])
        for d in m["data_dirs"]
    ]
    for (lo1, hi1), (lo2, hi2) in zip(zms, zms[1:]):
        assert hi1 < lo2
    # a tight merge now rewrites exactly one slice
    before = m["data_dirs"]
    t.merge(df_of(spark, [(3, "NEW")], ["k", "val"]), "k")
    after = t._load_manifest(t.head())["data_dirs"]
    assert len(set(before) & set(after)) == len(before) - 1
    got = rows_set(t.read())
    assert (3, "NEW") in got and len(got) == len(pre_rows)
    # read_range touches one directory
    dirs_scanned = len(
        t.read_range("k", 200, 205).inputFiles()
    )
    all_files = len(t.read().inputFiles())
    assert dirs_scanned < all_files


def test_compact_after_schema_evolution_reads_at_evolved_schema(
    spark, tmp_path
):
    """compact() over a table whose directories span two schema
    versions must rewrite every slice AT the evolved schema (up-cast +
    NULL fill) and carry the schema in its manifest — a compaction
    that resurrected pre-evolution physical schemas would corrupt
    later reads."""
    from pyspark.sql import functions as F

    t = VersionedTable(spark, str(tmp_path / "evoc"))
    t.commit(
        spark.range(0, 50).select(F.col("id").cast("int").alias("k")),
        stats_col="k",
    )
    t.commit(
        spark.range(50, 100).select(
            F.col("id").cast("bigint").alias("k"),
            (F.col("id") * 1.5).alias("score"),
        ),
        stats_col="k",
    )
    pre = {(r["k"], r["score"]) for r in t.read().collect()}
    v = t.compact("k", n_dirs=3)
    m = t._load_manifest(v)
    assert "schema" in m
    got = t.read()
    assert got.schema.simpleString() == "struct<k:bigint,score:double>"
    assert {(r["k"], r["score"]) for r in got.collect()} == pre
    # every compacted slice physically carries the evolved schema now:
    # reading one directory raw (no target schema) shows both columns
    import os

    d0 = m["data_dirs"][0]
    raw = spark.read.parquet(os.path.join(t._data_dir, d0))
    assert set(raw.columns) == {"k", "score"}


def test_compact_preserves_null_key_rows(spark, tmp_path):
    """OPTIMIZE must be content-preserving for NULL compaction keys
    (e.g. a NULL group-by key in an incremental-agg state table):
    every range predicate is NULL for them, so without the explicit
    first-slice isNull claim they'd match no slice and vanish."""
    from pyspark.sql import types as T

    t = VersionedTable(spark, str(tmp_path / "nullkey"))
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("val", T.StringType()),
        ]
    )
    rows = [(k, f"v{k}") for k in range(200)] + [
        (None, "null-a"),
        (None, "null-b"),
    ]
    for chunk in (rows[:70], rows[70:140], rows[140:]):
        t.commit(
            spark.createDataFrame(chunk, schema), stats_col="k"
        )
    pre = rows_set(t.read())
    assert (None, "null-a") in pre

    v = t.compact("k", n_dirs=3)
    assert rows_set(t.read()) == pre  # nothing lost, incl. NULL keys
    m = t._load_manifest(v)
    assert len(m["data_dirs"]) > 1  # multi-slice path exercised
    # NULL rows live in the FIRST slice and survive a later merge
    t.merge(
        spark.createDataFrame([(3, "NEW")], schema), "k"
    )
    post = rows_set(t.read())
    assert (None, "null-a") in post and (None, "null-b") in post
    assert (3, "NEW") in post and len(post) == len(pre)


def test_compact_all_null_key_slice_lands(spark, tmp_path):
    """Degenerate: a table whose key is entirely NULL. approxQuantile
    returns no cuts; the single slice would previously be dropped as
    'empty' because min(key) is NULL — count-based detection keeps
    it."""
    from pyspark.sql import types as T

    t = VersionedTable(spark, str(tmp_path / "allnull"))
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("val", T.StringType()),
        ]
    )
    t.commit(
        spark.createDataFrame([(None, "a"), (None, "b")], schema),
        stats_col="k",
    )
    pre = rows_set(t.read())
    t.compact("k", n_dirs=2)
    assert rows_set(t.read()) == pre


def test_rename_column_reads_old_data_under_new_name(spark, tmp_path):
    """Metadata-only rename: pre-rename files surface their bytes
    under the new name, post-rename appends land under it natively,
    time travel before the rename still shows the old name, and merge
    across the rename up-casts old directories correctly."""
    from pyspark.sql import functions as F

    t = VersionedTable(spark, str(tmp_path / "ren"))
    t.commit(df_of(spark, [(1, "a"), (2, "b")], ["k", "val"]), stats_col="k")
    v1 = t.head()
    t.rename_column("val", "label")
    assert set(t.read().columns) == {"k", "label"}
    assert rows_set(t.read()) == {(1, "a"), (2, "b")}
    # filters on the renamed column push into the old files
    assert rows_set(t.read().filter(F.col("label") == "a")) == {(1, "a")}
    # time travel: the pre-rename version still reads the OLD name
    assert set(t.read(v1).columns) == {"k", "val"}
    assert rows_set(t.read(v1)) == {(1, "a"), (2, "b")}
    # post-rename append uses the new name; both vintages unify
    t.commit(df_of(spark, [(3, "c")], ["k", "label"]), stats_col="k")
    assert rows_set(t.read()) == {(1, "a"), (2, "b"), (3, "c")}
    # merge across the rename: updates under the new name land, old
    # directories rewrite under the new name
    t.merge(df_of(spark, [(1, "A")], ["k", "label"]), "k")
    assert rows_set(t.read()) == {(1, "A"), (2, "b"), (3, "c")}
    # zone-map stats migrated with the rename for pruning on k intact
    assert all(
        zm["col"] in ("k",)
        for zm in t._load_manifest(t.head())["stats"].values()
    )


def test_rename_chain_and_stats_col_rename(spark, tmp_path):
    """A→B→C rename chain resolves transitively for the oldest files,
    and renaming the ZONE-MAP column migrates its stats entries so
    merge pruning keeps working."""
    t = VersionedTable(spark, str(tmp_path / "chain"))
    t.commit(
        df_of(spark, [(i, i * 10) for i in range(50)], ["k", "v"]),
        stats_col="k",
    )
    t.commit(
        df_of(spark, [(i, i * 10) for i in range(50, 100)], ["k", "v"]),
        stats_col="k",
    )
    t.rename_column("k", "key")
    t.rename_column("key", "ky")
    assert set(t.read().columns) == {"ky", "v"}
    assert (1, 10) in rows_set(t.read())
    m = t._load_manifest(t.head())
    assert all(zm["col"] == "ky" for zm in m["stats"].values())
    # pruned merge on the renamed key: only one directory rewrites
    before = m["data_dirs"]
    t.merge(df_of(spark, [(3, 999)], ["ky", "v"]), "ky")
    after = t._load_manifest(t.head())["data_dirs"]
    assert len(set(before) & set(after)) == len(before) - 1
    got = rows_set(t.read())
    assert (3, 999) in got and len(got) == 100


def test_drop_column_and_readd_does_not_resurrect(spark, tmp_path):
    """Dropping a column hides it immediately (no rewrite); re-adding
    a column with the SAME name later reads NULL from pre-drop files
    instead of resurrecting their bytes — the Iceberg field-id
    guarantee via the tombstone rename lineage."""
    t = VersionedTable(spark, str(tmp_path / "drop"))
    t.commit(df_of(spark, [(1, "secret", 5)], ["k", "pii", "n"]))
    v1 = t.head()
    t.drop_column("pii")
    assert set(t.read().columns) == {"k", "n"}
    # time travel before the drop still sees it
    assert rows_set(t.read(v1)) == {(1, "secret", 5)}
    # re-add a column named pii: old files must NOT leak "secret"
    t.commit(df_of(spark, [(2, "fresh", 7)], ["k", "pii", "n"]))
    got = {r["k"]: r["pii"] for r in t.read().collect()}
    assert got == {1: None, 2: "fresh"}


def test_rename_guards(spark, tmp_path):
    import pytest

    from lmo_data_catalog_spark.sources.versioned import (
        SchemaEvolutionError,
    )

    t = VersionedTable(spark, str(tmp_path / "guards"))
    t.commit(df_of(spark, [(1, "a")], ["k", "val"]))
    with pytest.raises(SchemaEvolutionError, match="no column"):
        t.rename_column("nope", "x")
    with pytest.raises(SchemaEvolutionError, match="already exists"):
        t.rename_column("val", "k")
    with pytest.raises(SchemaEvolutionError, match="no column"):
        t.drop_column("nope")
    # partition columns are rename-protected (physical layout)
    from pyspark.sql import functions as F

    t2 = VersionedTable(spark, str(tmp_path / "partguard"))
    t2.commit(
        df_of(spark, [(1, 0), (2, 1)], ["k", "bucket"]),
        partition_by=["bucket"],
    )
    with pytest.raises(SchemaEvolutionError, match="partition column"):
        t2.rename_column("bucket", "b2")
    with pytest.raises(SchemaEvolutionError, match="partition column"):
        t2.drop_column("bucket")
    # non-partition columns of a partitioned dir still rename fine
    t2.rename_column("k", "key")
    assert rows_set(t2.read().select("key", "bucket")) == {(1, 0), (2, 1)}


def test_rollback_across_rename_restores_old_lineage(spark, tmp_path):
    """Rollback to a pre-rename version must carry the TARGET's
    rename log: the restored snapshot reads its directories under the
    old name (carrying the head's log would tombstone them)."""
    t = VersionedTable(spark, str(tmp_path / "rb"))
    t.commit(df_of(spark, [(1, "a")], ["k", "val"]))
    v1 = t.head()
    t.rename_column("val", "label")
    assert set(t.read().columns) == {"k", "label"}
    t.rollback(v1)
    assert set(t.read().columns) == {"k", "val"}
    assert rows_set(t.read()) == {(1, "a")}


def test_read_partitions_resolves_renames(spark, tmp_path):
    """Bucket-pruned leaf reads must apply the rename lineage: a data
    column renamed AFTER a partitioned commit still surfaces its
    pre-rename bytes under the new name (not silent NULLs)."""
    t = VersionedTable(spark, str(tmp_path / "rp"))
    t.commit(
        df_of(
            spark,
            [(1, "a", 0), (2, "b", 1), (3, "c", 0)],
            ["k", "val", "bucket"],
        ),
        partition_by=["bucket"],
    )
    t.rename_column("val", "label")
    got = rows_set(
        t.read_partitions("bucket", [0]).select("k", "label")
    )
    assert got == {(1, "a"), (3, "c")}
    # post-rename partitioned commit mixes in cleanly
    t.commit(
        df_of(spark, [(4, "d", 0)], ["k", "label", "bucket"]),
        partition_by=["bucket"],
    )
    got = rows_set(
        t.read_partitions("bucket", [0]).select("k", "label")
    )
    assert got == {(1, "a"), (3, "c"), (4, "d")}


def test_compact_after_rename_physically_migrates(spark, tmp_path):
    """compact() reads rename-aware and writes under the CURRENT
    logical names, so the compacted snapshot needs no lineage for its
    new directories (stale log entries are harmless: gated on dir
    write version)."""
    t = VersionedTable(spark, str(tmp_path / "cr"))
    t.commit(
        df_of(spark, [(i, f"v{i}") for i in range(100)], ["k", "val"]),
        stats_col="k",
    )
    t.rename_column("val", "label")
    pre = rows_set(t.read())
    t.compact("k", n_dirs=3)
    assert set(t.read().columns) == {"k", "label"}
    assert rows_set(t.read()) == pre
    # new dirs' parquet files physically carry the new name
    import pyarrow.parquet as pq

    f = t.read().inputFiles()[0].replace("file:", "")
    assert "label" in pq.read_schema(f).names


def test_zorder_compact_prunes_on_both_columns(spark, tmp_path):
    """compact_zorder gives BOTH clustering columns zone-map locality:
    after z-ordering a grid table on (x, y), a tight read_range on x
    AND a tight read_range on y each skip directories — where a
    single-key compact("x") only ever prunes x probes. Content
    (including NULLs in either column) is preserved exactly."""
    t = VersionedTable(spark, str(tmp_path / "zo"))
    rows = [(x, y, f"v{x}-{y}") for x in range(40) for y in range(40)]
    rows += [(None, 5, "nx"), (7, None, "ny"), (None, None, "nn")]
    t.commit(df_of(spark, rows, ["x", "y", "val"]), stats_col="x")
    pre = rows_set(t.read())

    v = t.compact_zorder(["x", "y"], n_dirs=4, bits=8)
    m = t._load_manifest(v)
    assert 1 < len(m["data_dirs"]) <= 4
    assert rows_set(t.read()) == pre  # nothing lost, NULLs included
    # every directory records a zone map PER clustering column
    for d in m["data_dirs"]:
        entry = m["stats"][d]
        assert isinstance(entry, list)
        assert {zm["col"] for zm in entry} == {"x", "y"}
    # both columns prune: a corner probe must skip >= 1 directory
    all_files = len(t.read().inputFiles())
    assert len(t.read_range("x", 0, 4).inputFiles()) < all_files
    assert len(t.read_range("y", 0, 4).inputFiles()) < all_files
    # correctness of the pruned reads (superset-filter contract)
    got_x = {
        r.val
        for r in t.read_range("x", 0, 4)
        .where("x >= 0 and x <= 4")
        .collect()
    }
    assert got_x == {f"v{x}-{y}" for x in range(5) for y in range(40)}


def test_zorder_layout_survives_merge_rename_and_drop(spark, tmp_path):
    """The list-form stats entry is transparent to every consumer:
    merge prunes against it, rename rewrites the right member, drop
    removes one member and keeps the other column's pruning alive."""
    t = VersionedTable(spark, str(tmp_path / "zs"))
    rows = [(x, y, x * 100 + y) for x in range(20) for y in range(20)]
    t.commit(df_of(spark, rows, ["x", "y", "val"]), stats_col="x")
    t.compact_zorder(["x", "y"], n_dirs=4, bits=6)
    n_total = len(t._load_manifest(t.head())["data_dirs"])

    # merge on x prunes directories using the list-form zone maps
    before = t._load_manifest(t.head())["data_dirs"]
    t.merge(df_of(spark, [(1, 1, 9999)], ["x", "y", "val"]), "x")
    after = t._load_manifest(t.head())["data_dirs"]
    assert len(set(before) & set(after)) > 0  # some dirs survived untouched
    assert (1, 1, 9999) in rows_set(t.read())

    # rename y -> yy keeps its zone map under the new name
    t.rename_column("y", "yy")
    m = t._load_manifest(t.head())
    carried = [
        zm
        for d in m["data_dirs"]
        for zm in (
            m["stats"][d]
            if isinstance(m["stats"][d], list)
            else [m["stats"][d]]
        )
    ]
    assert any(zm["col"] == "yy" for zm in carried)
    assert not any(zm["col"] == "y" for zm in carried)
    assert len(t.read_range("yy", 0, 3).inputFiles()) < len(
        t.read().inputFiles()
    )

    # dropping yy keeps x's zone maps (list entry collapses, not dies)
    t.drop_column("yy")
    m = t._load_manifest(t.head())
    remaining = [
        zm
        for d in m["data_dirs"]
        if d in m["stats"]
        for zm in (
            m["stats"][d]
            if isinstance(m["stats"][d], list)
            else [m["stats"][d]]
        )
    ]
    assert remaining and all(zm["col"] == "x" for zm in remaining)
    assert "yy" not in t.read().columns
    assert len(t.read_range("x", 0, 3).inputFiles()) < len(
        t.read().inputFiles()
    )
    assert n_total >= 2


# ------------------------------------------------- replace_partitions (r14)


def _pp_table(spark, tmp_path, name="tbl"):
    """Three cell-partitioned commits + one UNpartitioned commit, the
    mixed layout replace_partitions must handle."""
    t = VersionedTable(spark, str(tmp_path / name))
    t.commit(
        df_of(spark, [(1, 10, "a"), (2, 20, "b")], ["id", "cell", "val"]),
        partition_by=["cell"],
    )
    t.commit(
        df_of(spark, [(3, 10, "c"), (4, 30, "d")], ["id", "cell", "val"]),
        partition_by=["cell"],
    )
    t.commit(df_of(spark, [(5, 20, "e"), (6, 30, "f")], ["id", "cell", "val"]))
    return t


def test_replace_partitions_swaps_leaves_not_directories(spark, tmp_path):
    """Dynamic partition overwrite: the replaced cell's rows come
    exclusively from the replacement; other cells are untouched and
    their leaf FILES carry forward verbatim (O(touched partitions));
    time travel still sees the pre-replace snapshot."""
    t = _pp_table(spark, tmp_path)
    # verbatim-carry claim covers the cell-partitioned leaves (the
    # unpartitioned commit is legitimately rewritten minus replaced
    # rows — its files change)
    files_30 = sorted(
        f for f in t.read_partitions("cell", [30]).inputFiles()
        if "cell=30" in f
    )
    assert files_30
    pre = rows_set(t.read())

    v = t.replace_partitions(
        "cell",
        [10, 20],
        df_of(spark, [(7, 10, "G"), (8, 20, "H")], ["id", "cell", "val"]),
    )
    assert t.head() == v == 4
    assert rows_set(t.read()) == {
        (7, "G", 10),
        (8, "H", 20),
        (4, "d", 30),
        (6, "f", 30),
    }
    # untouched partitioned leaves carried verbatim... (the
    # unpartitioned dir's cell=30 row was rewritten, so compare the
    # partitioned commits' contribution only: files_30 ⊆ after)
    after_30 = sorted(t.read_partitions("cell", [30]).inputFiles())
    for f in files_30:
        assert f in after_30
    # ...and pruned probes never see a replaced leaf (read_partitions
    # omits the partition column: rows are (id, val))
    assert rows_set(t.read_partitions("cell", [10])) == {(7, "G")}
    # time travel: the pre-replace snapshot is intact
    assert rows_set(t.read(3)) == pre


def test_replace_partitions_delete_only_and_full_exclusion_drop(
    spark, tmp_path
):
    """No replacement = partition delete. A directory whose every
    leaf is excluded leaves the manifest and becomes vacuumable."""
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.commit(
        df_of(spark, [(1, 10, "a"), (2, 20, "b")], ["id", "cell", "val"]),
        partition_by=["cell"],
    )
    t.commit(
        df_of(spark, [(3, 10, "c")], ["id", "cell", "val"]),
        partition_by=["cell"],
    )
    t.replace_partitions("cell", [10])
    assert rows_set(t.read()) == {(2, "b", 20)}
    # commit 2 held only cell=10: dropped from the manifest entirely
    import json

    m = json.load(open(t._manifest_path(t.head())))
    assert len(m["data_dirs"]) == 1
    removed = t.vacuum(keep_last=1)
    assert len(removed) == 1  # the fully-excluded dir reclaimed
    assert rows_set(t.read()) == {(2, "b", 20)}


def test_replace_partitions_guards_and_noops(spark, tmp_path):
    t = _pp_table(spark, tmp_path)
    head = t.head()
    # replacement rows outside the replaced values: refused
    with pytest.raises(ValueError, match="outside the replaced"):
        t.replace_partitions(
            "cell", [10], df_of(spark, [(9, 30, "x")], ["id", "cell", "val"])
        )
    # rows with no values named: an append in disguise, refused
    with pytest.raises(ValueError, match="append in disguise"):
        t.replace_partitions(
            "cell", [], df_of(spark, [(9, 10, "x")], ["id", "cell", "val"])
        )
    # nothing to do: head preserved
    assert t.replace_partitions("cell", []) == head
    assert t.head() == head


def test_replace_partitions_read_changes_and_rollback(spark, tmp_path):
    """replace_partitions is a rewrite: read_changes across it must
    refuse (like merge/compact); rollback across it restores the
    pre-replace rows; a later merge keeps the exclusions."""
    t = _pp_table(spark, tmp_path)
    pre = rows_set(t.read())
    v = t.replace_partitions(
        "cell", [10], df_of(spark, [(7, 10, "G")], ["id", "cell", "val"])
    )
    with pytest.raises(ValueError, match="replace_partitions"):
        t.read_changes(2, v)
    # appends after the replace flow through read_changes fine
    v2 = t.commit(df_of(spark, [(9, 40, "i")], ["id", "cell", "val"]))
    assert rows_set(t.read_changes(v, v2)) == {(9, "i", 40)}
    # rollback to the pre-replace snapshot restores the replaced rows
    t.rollback(3)
    assert rows_set(t.read()) == pre
    # and rolling FORWARD to the replaced version keeps exclusions
    t.rollback(v)
    assert rows_set(t.read()) == {
        (7, "G", 10),
        (4, "d", 30),
        (5, "e", 20),
        (6, "f", 30),
        (2, "b", 20),
    }


def test_replace_partitions_then_merge_keeps_exclusions(spark, tmp_path):
    """merge after a replace: carried directories keep their excluded
    leaves (no resurrection), rewritten directories honor them."""
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.commit(
        df_of(
            spark,
            [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")],
            ["id", "cell", "val"],
        ),
        partition_by=["cell"],
        stats_col="id",
    )
    t.replace_partitions(
        "cell", [20], df_of(spark, [(2, 20, "B")], ["id", "cell", "val"])
    )
    # merge an update touching id=1 only: the zone map can't prune the
    # partitioned dir (ids 1..3 span it) so it REWRITES — minus the
    # excluded cell=20 leaf
    t.merge(df_of(spark, [(1, 10, "A")], ["id", "cell", "val"]), "id")
    assert rows_set(t.read()) == {(1, "A", 10), (2, "B", 20), (3, "c", 30)}
    # compact fully rewrites: exclusions evaporate with their dirs
    t.compact("id")
    assert rows_set(t.read()) == {(1, "A", 10), (2, "B", 20), (3, "c", 30)}


def test_replace_partitions_rewrites_other_column_layouts(spark, tmp_path):
    """A directory Hive-partitioned on a DIFFERENT column can't take
    leaf exclusions for ``col`` — it must be conservatively rewritten
    minus the replaced values (like unpartitioned dirs), while
    same-column layouts still swap leaves only."""
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.commit(
        df_of(spark, [(1, 10, "A"), (2, 20, "A")], ["id", "cell", "grp"]),
        partition_by=["cell"],
    )
    t.commit(
        df_of(spark, [(3, 10, "B"), (4, 20, "C")], ["id", "cell", "grp"]),
        partition_by=["grp"],
    )
    v = t.replace_partitions(
        "cell", [10], df_of(spark, [(9, 10, "Z")], ["id", "cell", "grp"])
    )
    got = {(r["id"], r["cell"], r["grp"]) for r in t.read(v).collect()}
    assert got == {(9, 10, "Z"), (2, 20, "A"), (4, 20, "C")}
    # the grp-partitioned dir was rewritten (its cell=10 row gone),
    # the cell-partitioned dir kept with an excluded leaf
    import json

    m = json.load(open(t._manifest_path(v)))
    kept_parts = {tuple(v) for v in m.get("partitioned", {}).values()}
    assert ("cell",) in kept_parts
    # probing untouched cells still prunes and sees every row
    assert {tuple(r) for r in t.read_partitions("cell", [20]).collect()} == {
        (2, "A"),
        (4, "C"),
    }
