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
