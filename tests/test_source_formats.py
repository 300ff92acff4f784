"""Source-format breadth: the engine's landing contract is 'ingest
once → typed Parquet', but the ingest edge must read what vendors
ship. Round-trip each supported format (JSON-lines, ORC, CSV) through
write → schema'd read and require value equality with the original —
including NULLs, doubles, and timestamp-derived dates.

JSON reads use an explicit schema: schema inference on JSON double-
scans the input and silently widens types — never do it at scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lmo_data_catalog_spark.catalog import Catalog

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sample(spark):
    # events slice with nulls + doubles + a date column (timestamps
    # themselves are normalized to µs by the catalog; JSON/CSV carry
    # them as ISO strings, so compare on DATE granularity)
    ev = Catalog(spark, SF).load("events")
    return (
        ev.select(
            "event_id",
            "user_id",
            "event_type",
            F.col("value").alias("value"),
            F.col("ts").cast("date").alias("day"),
        )
        .limit(500)
        .cache()
    )


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=repr)


@pytest.mark.parametrize("fmt", ["json", "orc", "csv"])
def test_roundtrip(spark, sample, tmp_path, fmt):
    out = str(tmp_path / f"rt_{fmt}")
    writer = sample.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", True)
    getattr(writer, fmt)(out)

    schema = "event_id long, user_id long, event_type string, value double, day date"
    reader = spark.read.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", True)
    back = getattr(reader, fmt)(out)

    assert back.schema.simpleString() == sample.select(
        "event_id", "user_id", "event_type", "value", "day"
    ).schema.simpleString()
    assert _rows(back.select(*sample.columns)) == _rows(sample)
