"""Batch-equivalence tests for the Structured Streaming surface
(SURVEY §2.8 / §7 E-d): every streaming operator, run to completion
with ``Trigger.AvailableNow`` over the sf0.001 events parquet, must
agree with the identical operator applied to the batch read.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lmo_data_catalog_spark.streaming import ops

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def batch_events(spark):
    from lmo_data_catalog_spark.catalog import Catalog

    return Catalog(spark, SF).load("events").cache()


@pytest.fixture(scope="module")
def stream_src(spark):
    return ops.stream_events(spark, SF)


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def _watermark_cutoff(batch_events, hours: int):
    """Append mode only emits windows closed by the final watermark
    (max event time − watermark); later windows stay open forever in a
    finite run. Equivalence is exact below the cutoff, subset above."""
    import datetime

    max_ts = batch_events.agg(F.max("ts")).first()[0]
    return max_ts - datetime.timedelta(hours=hours)


def test_tumbling_stream_equals_batch(batch_events, stream_src):
    got = ops.run_available_now(
        ops.tumbling_counts(stream_src), output_mode="append", name="t_tumble"
    )
    want = ops.tumbling_counts(batch_events)
    cutoff = _watermark_cutoff(batch_events, 2)
    closed = want.filter(F.col("win_start") + F.expr("interval 1 hour") <= cutoff)
    got_rows = _rows(got, "win_start", "event_type")
    assert set(got_rows) <= set(_rows(want, "win_start", "event_type"))
    assert set(_rows(closed, "win_start", "event_type")) <= set(got_rows)
    assert got.count() > 0


def test_sliding_stream_equals_batch(batch_events, stream_src):
    got = ops.run_available_now(
        ops.sliding_counts(stream_src), output_mode="append", name="t_slide"
    )
    want = ops.sliding_counts(batch_events)
    cutoff = _watermark_cutoff(batch_events, 4)
    closed = want.filter(F.col("win_start") + F.expr("interval 2 hour") <= cutoff)
    got_rows = _rows(got, "win_start", "event_type")
    assert set(got_rows) <= set(_rows(want, "win_start", "event_type"))
    assert set(_rows(closed, "win_start", "event_type")) <= set(got_rows)
    # each event lands in width/slide = 2 windows (batch side, exact)
    n_tumble = ops.tumbling_counts(batch_events).agg(F.sum("n_events")).first()[0]
    n_slide = want.agg(F.sum("n_events")).first()[0]
    assert n_slide == 2 * n_tumble


def test_session_stream_equals_batch(batch_events, stream_src):
    got = ops.run_available_now(
        ops.session_counts(stream_src), output_mode="append", name="t_sess"
    )
    want = ops.session_counts(batch_events)
    cutoff = _watermark_cutoff(batch_events, 2)
    closed = want.filter(F.col("session_end") <= cutoff)
    got_rows = _rows(got, "user_id", "session_start")
    assert set(got_rows) <= set(_rows(want, "user_id", "session_start"))
    assert set(_rows(closed, "user_id", "session_start")) <= set(got_rows)
    # sessions partition the events: counts sum to the total
    assert want.agg(F.sum("n_events")).first()[0] == batch_events.count()


def test_dedup_stream_equals_batch(spark, batch_events, tmp_path):
    # feed duplicated input through the watermarked dedup; the rewrite
    # also lands µs timestamps, so the plain EVENTS_SCHEMA applies
    dup_dir = str(tmp_path / "dup_events")
    batch_events.union(batch_events).write.mode("overwrite").parquet(dup_dir)
    src = spark.readStream.schema(ops.EVENTS_SCHEMA).parquet(dup_dir)
    got = ops.run_available_now(
        ops.dedup_events(src), output_mode="append", name="t_dedup"
    )
    assert got.count() == batch_events.count()
    assert got.select("event_id").distinct().count() == batch_events.count()


def test_stateful_running_totals_final_state(batch_events, stream_src):
    got = ops.run_available_now(
        ops.user_running_totals_stream(stream_src),
        output_mode="update",
        name="t_totals",
    )
    # memory sink in update mode logs every emission; the final state
    # per user is the row with the max n_events
    final = (
        got.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("user_id")
                .orderBy(F.desc("n_events"))
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    want = ops.user_running_totals_batch(batch_events)
    assert _rows(final, "user_id") == _rows(want, "user_id")


def test_incremental_parquet_sink_idempotent(spark, batch_events, tmp_path):
    """foreachBatch landing: streamed output equals the batch
    transform, and re-running the finished stream (same checkpoint)
    adds nothing."""
    out = str(tmp_path / "landed")
    ckpt = str(tmp_path / "ckpt")
    src = ops.stream_events(spark, SF)
    derived = src.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "value"
    )
    ops.incremental_parquet_sink(derived, out, checkpoint=ckpt)
    landed = spark.read.parquet(out).drop("batch")
    want = batch_events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "value"
    )
    assert sorted(map(tuple, landed.collect())) == sorted(
        map(tuple, want.collect())
    )
    # replay with the same checkpoint: no new input -> no new rows
    ops.incremental_parquet_sink(derived, out, checkpoint=ckpt)
    again = spark.read.parquet(out).drop("batch")
    assert again.count() == want.count()


def test_stream_stream_interval_join_equals_batch(batch_events, stream_src):
    """Watermarked stream-stream interval join (click -> purchase
    within 1h per user) emits exactly the batch range-join rows:
    inner join results emit on match, so a finite AvailableNow run
    yields the complete set."""

    def split(ev):
        return (
            ev.filter(F.col("event_type") == "click"),
            ev.filter(F.col("event_type") == "purchase"),
        )

    want = ops.click_purchase_attribution(*split(batch_events))
    want_rows = {tuple(r) for r in want.collect()}
    assert want_rows, "fixture has no click->purchase pairs within horizon"

    got = ops.run_available_now(
        ops.click_purchase_attribution(*split(stream_src)),
        output_mode="append",
        name="t_ssjoin",
    )
    assert {tuple(r) for r in got.collect()} == want_rows
