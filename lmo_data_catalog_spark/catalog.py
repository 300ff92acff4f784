"""Named-table catalog over a parquet directory (TESTDATA.md layout).

The reference locates inputs by filename convention/glob
(``01_source_me.R:87-96``); here the catalog abstraction is explicit:
``Catalog(spark, sf_dir).load("lineitem")`` returns a lazy DataFrame.

Scale notes: ``load`` is a ``spark.read.parquet`` so predicate
pushdown / column pruning / partition pruning all reach the scan. At
cluster scale a table is a partitioned directory, not one file — the
path contract stays the same.

Schema resolution is cached per (realpath, mtime, size): inferring a
parquet schema costs a footer read + driver-side resolution (~140 ms
measured at sf0.1) on EVERY ``spark.read.parquet`` call, and a
many-queries session re-reads the same immutable fixture tables
hundreds of times. Real engines resolve table metadata once via a
catalog (Hive metastore / Iceberg manifest — optimization guide §6);
here the mtime+size key gives the same effect while staying correct
when a test rewrites a table in place. Only the *schema* (metadata)
is cached — file listing and every byte of data are still read fresh
per action, so results can never be stale: a changed directory changes
mtime (new key → re-infer), and the scan itself never caches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from . import pyboundary

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: (realpath, mtime_ns, size) -> (schema, needs_nanos_as_long).
#: Module-level: schemas are engine-version facts about immutable
#: bytes, independent of which SparkSession asks.
_SCHEMA_CACHE: dict[tuple[str, int, int], tuple[StructType, bool]] = {}


def _stat_key(path: str) -> tuple[str, int, int] | None:
    try:
        st = os.stat(path)
    except OSError:
        return None  # missing path: fall through, Spark raises cleanly
    return (os.path.realpath(path), st.st_mtime_ns, st.st_size)


class Catalog:
    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")
        # retrofit TCP_NODELAY onto gateway connections created before
        # the package import (e.g. the driver's own session) — cheap,
        # idempotent, see pyboundary.py
        pyboundary.fix_live_connections()

    def load(self, name: str) -> DataFrame:
        df = self._read(f"{self.sf_dir}/{name}.parquet")
        if name == "events":
            df = _normalize_ns_timestamps(df)
        return df

    def _read(self, path: str) -> DataFrame:
        key = _stat_key(path)
        hit = _SCHEMA_CACHE.get(key) if key is not None else None
        if hit is not None:
            schema, needs_nanos = hit
            if needs_nanos:
                # conf is session-scoped; a cache hit from a fresh
                # session must re-arm it before the scan executes
                self.spark.conf.set(
                    "spark.sql.legacy.parquet.nanosAsLong", "true"
                )
            return self.spark.read.schema(schema).parquet(path)
        df, needs_nanos = self._infer(path)
        if key is not None:
            _SCHEMA_CACHE[key] = (df.schema, needs_nanos)
        return df

    def _infer(self, path: str) -> tuple[DataFrame, bool]:
        try:
            return self.spark.read.parquet(path), False
        except Exception as e:  # noqa: BLE001
            if "TIMESTAMP(NANOS" not in str(e):
                raise
            # Parquet ns timestamps (events.ts) are illegal for Spark's
            # reader by default; read them as raw longs and convert.
            self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            return self.spark.read.parquet(path), True


    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.load(name)
        raise AttributeError(name)

    def register_all(self) -> None:
        """Register every table as a temp view for spark.sql use."""
        for name in TABLES:
            self.load(name).createOrReplaceTempView(name)


def _normalize_ns_timestamps(df: DataFrame) -> DataFrame:
    """ns-long → µs timestamp. Integer `div` (not `/`): epoch-ns values
    (~1.7e18) exceed double's exact-integer range, so float division
    would be off by up to ~0.25 µs."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if "ts" in df.columns and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
