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
        return self.spark.read.parquet(f"{self.sf_dir}/{name}.parquet")

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.load(name)
        raise AttributeError(name)

    def register_all(self) -> None:
        """Register every table as a temp view for spark.sql use."""
        for name in TABLES:
            self.load(name).createOrReplaceTempView(name)
