"""Regression: the engine must read every events.parquet timestamp
vintage the driver has shipped — parquet TIMESTAMP(NANOS) (readable
only as raw longs) and µs isAdjustedToUTC=false (inferred as
TIMESTAMP_NTZ) — with identical wall-clock semantics in both the batch
catalog and the streaming source. The µs-NTZ switch silently broke
``unix_micros``-based queries and shifted the streaming source to 1970
(stream schema assumed ns longs); this pins both paths.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from lmo_data_catalog_spark.catalog import Catalog
from lmo_data_catalog_spark.functions import epoch_us
from lmo_data_catalog_spark.streaming import ops

T0 = datetime.datetime(2024, 5, 1, 12, 0, 0)
ROWS = [
    (1, T0, 10, "click", 1.0, "{}"),
    (2, T0 + datetime.timedelta(minutes=30), 10, "click", 2.0, "{}"),
    (3, T0 + datetime.timedelta(hours=3), 11, "purchase", 3.0, "{}"),
]
COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]
EXPECT_US = [
    int((r[1] - datetime.datetime(1970, 1, 1)).total_seconds() * 1_000_000)
    for r in ROWS
]


def _write_events(dirpath, unit: str) -> str:
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp(unit)),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    table = pa.Table.from_pylist(
        [dict(zip(COLS, r)) for r in ROWS], schema=schema
    )
    dirpath.mkdir(exist_ok=True)
    f = str(dirpath / "events.parquet")
    # version 2.6 keeps ns as TIMESTAMP(NANOS) instead of coercing to µs
    pq.write_table(table, f, version="2.6", coerce_timestamps=None)
    return str(dirpath)


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_catalog_epoch_us_all_vintages(spark, tmp_path, unit):
    sf = _write_events(tmp_path / unit, unit)
    got = (
        Catalog(spark, sf)
        .events.select("event_id", epoch_us("ts").alias("us"))
        .orderBy("event_id")
        .collect()
    )
    assert [r["us"] for r in got] == EXPECT_US


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_stream_events_all_vintages(spark, tmp_path, unit):
    sf = _write_events(tmp_path / unit, unit)
    got = ops.run_available_now(
        ops.tumbling_counts(ops.stream_events(spark, sf)),
        output_mode="update",
        name=f"t_vintage_{unit}",
    )
    rows = {
        (r["win_start"], r["event_type"]): r["n_events"]
        for r in got.collect()
    }
    # wall-clock windows, not 1970: both clicks share the 12:00 hour
    assert rows[(T0, "click")] == 2
    assert rows[(T0 + datetime.timedelta(hours=3), "purchase")] == 1
