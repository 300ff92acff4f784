"""Named-table catalog over a parquet directory (TESTDATA.md layout).

The reference locates inputs by filename convention/glob
(``01_source_me.R:87-96``); here the catalog abstraction is explicit:
``Catalog(spark, sf_dir).load("lineitem")`` returns a lazy DataFrame.

Scale notes: ``load`` is a pure ``spark.read.parquet`` so predicate
pushdown / column pruning / partition pruning all reach the scan. At
cluster scale a table is a partitioned directory, not one file — the
path contract stays the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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


class Catalog:
    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")

    def load(self, name: str) -> DataFrame:
        df = self._read(f"{self.sf_dir}/{name}.parquet")
        if name == "events":
            df = _normalize_ns_timestamps(df)
        return df

    def _read(self, path: str) -> DataFrame:
        try:
            return self.spark.read.parquet(path)
        except Exception as e:  # noqa: BLE001
            if "TIMESTAMP(NANOS" not in str(e):
                raise
            # Parquet ns timestamps (events.ts) are illegal for Spark's
            # reader by default; read them as raw longs and convert.
            self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            return self.spark.read.parquet(path)


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
