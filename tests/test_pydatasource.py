"""Custom Python DataSource (Spark 4 connector extension point):
deterministic batch generation, partitioned parallelism, and a
replayable streaming offset log that feeds the existing source-agnostic
streaming operators.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lmo_data_catalog_spark.sources import pydatasource


def _read(spark, n=200, parts=4):
    pydatasource.register(spark)
    return (
        spark.read.format("events_gen")
        .option("rows", n)
        .option("numPartitions", parts)
        .load()
    )


def test_batch_deterministic_and_partitioned(spark):
    df = _read(spark, 200, 4)
    assert df.count() == 200
    assert df.select("event_id").distinct().count() == 200
    # same options -> identical rows (the source is differential-testable)
    again = _read(spark, 200, 4)
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, again.collect()))
    # generation really fans out across input partitions
    assert df.rdd.getNumPartitions() == 4
    # typed schema honored
    assert dict(df.dtypes)["ts"].startswith("timestamp")
    assert dict(df.dtypes)["value"] == "double"


def test_batch_composes_with_engine_ops(spark):
    df = _read(spark, 500, 4)
    agg = df.groupBy("event_type").agg(F.count("*").alias("n"))
    assert agg.agg(F.sum("n")).first()[0] == 500
    # deterministic generator -> deterministic aggregate
    assert {r["event_type"] for r in agg.collect()} <= {
        "view", "click", "purchase", "signup", "error"
    }


def test_stream_replayable_offsets(spark, tmp_path):
    pydatasource.register(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "landed")

    def run():
        q = (
            spark.readStream.format("events_gen")
            .option("rowsPerBatch", 50)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        return spark.read.parquet(out)

    got = run()
    n1 = got.count()
    assert n1 >= 50  # at least one micro-batch materialized
    assert got.select("event_id").distinct().count() == n1  # no overlap
    # restart from the same checkpoint: committed offsets are not
    # re-emitted — any newly landed ids are disjoint from the first run
    got2 = run()
    n2 = got2.count()
    assert got2.select("event_id").distinct().count() == n2
    assert n2 >= n1


def test_stream_offsets_monotone_after_recovery():
    """A reader rebuilt after a driver restart starts _current at 0;
    the first partitions() call carries the checkpoint-recovered
    offsets, and latestOffset must plan strictly PAST them — never a
    backwards/empty range (r4 advice)."""
    r = pydatasource.EventsGenStreamReader({"rowsperbatch": "100"})
    # engine replays the uncommitted batch [500, 600) from checkpoint
    r.partitions({"offset": 500}, {"offset": 600})
    nxt = r.latestOffset()["offset"]
    assert nxt == 700
    # and keeps advancing monotonically
    assert r.latestOffset()["offset"] == 800
    # a regressive start can never pull the counter backwards
    r.partitions({"offset": 100}, {"offset": 200})
    assert r.latestOffset()["offset"] == 900


def test_stream_all_committed_restart_one_batch_regression():
    """The documented one-batch regression (r5 advice): when EVERY
    batch committed before a restart, the engine's first call on the
    fresh reader is latestOffset() — no partitions() has carried the
    committed offset in yet, so the returned offset dips below the
    high-water mark for exactly one planned batch. The contract is:
    that batch must be EMPTY (no committed row replays), and the same
    partitions() call must ratchet so batch 2 is strictly past the
    committed offset."""
    r = pydatasource.EventsGenStreamReader({"rowsperbatch": "100"})
    committed = 500
    # restart, everything committed: engine asks for latest FIRST
    first = r.latestOffset()["offset"]
    assert first == 100 < committed  # the documented dip
    # engine plans (committed, first) — a backwards range; partitions
    # clamps it to empty so exactly-once holds
    [part] = r.partitions({"offset": committed}, {"offset": first})
    assert part.start == committed and part.end == committed
    assert list(r.read(part)) == []
    # and the ratchet engaged: batch 2 is strictly past the committed
    # offset, monotone from here on
    nxt = r.latestOffset()["offset"]
    assert nxt == committed + 100
    [part2] = r.partitions({"offset": committed}, {"offset": nxt})
    ids = [row[0] for row in r.read(part2)]
    assert ids == list(range(committed, nxt))  # no replay, no gap


def test_jsonl_sink_writer_commit_protocol(spark, tmp_path):
    """Custom write path (DataSourceWriter): staged shards become
    visible only through the driver commit's _SUCCESS manifest, and
    the written rows round-trip."""
    import json
    import os

    from lmo_data_catalog_spark.sources import pydatasource

    pydatasource.register(spark)
    out = str(tmp_path / "sink")
    df = (
        spark.read.format("events_gen")
        .option("rows", 100)
        .load()
        .select("event_id", "user_id", "event_type")
    )
    df.write.format("jsonl_sink").option("path", out).mode("append").save()

    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["rows"] == 100
    # manifest names exactly the committed shards; no staging leftovers
    on_disk = {f for f in os.listdir(out) if f != "_SUCCESS"}
    assert set(manifest["files"]) == on_disk
    assert not any(f.startswith("_tmp-") for f in on_disk)
    # rows round-trip through a plain JSON read
    back = spark.read.json([os.path.join(out, f) for f in manifest["files"]])
    got = {(r["event_id"], r["user_id"], r["event_type"]) for r in back.collect()}
    want = {(r[0], r[1], r[2]) for r in df.collect()}
    assert got == want


def test_jsonl_sink_abort_removes_staging(spark, tmp_path):
    import os

    from lmo_data_catalog_spark.sources.pydatasource import (
        JsonlSinkWriter,
        _ShardCommit,
    )

    out = str(tmp_path / "sink")
    os.makedirs(out)
    open(os.path.join(out, "_tmp-dead.jsonl"), "w").write("{}\n")
    w = JsonlSinkWriter({"path": out}, spark.range(1).schema)
    w.abort([_ShardCommit("_tmp-dead.jsonl", 1)])
    assert os.listdir(out) == []


def test_jsonl_sink_second_append_keeps_prior_shards(spark, tmp_path):
    import json
    import os

    from lmo_data_catalog_spark.sources import pydatasource

    pydatasource.register(spark)
    out = str(tmp_path / "sink")
    df = (
        spark.read.format("events_gen")
        .option("rows", 10)
        .load()
        .select("event_id")
    )
    df.write.format("jsonl_sink").option("path", out).mode("append").save()
    first = set(json.load(open(os.path.join(out, "_SUCCESS")))["files"])
    df.write.format("jsonl_sink").option("path", out).mode("append").save()
    second = set(json.load(open(os.path.join(out, "_SUCCESS")))["files"])
    # distinct shard names: the second commit never renamed over the
    # first; both commits' files coexist, manifest names the latest
    assert first.isdisjoint(second)
    on_disk = {f for f in os.listdir(out) if f != "_SUCCESS"}
    assert on_disk == first | second
