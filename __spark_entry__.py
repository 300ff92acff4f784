"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the engine's operator registry
(one entry per implemented SURVEY §2 operator, plus the
LLM-data-pipeline extensions) for the DuckDB differential gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lmo_data_catalog_spark.registry import REGISTRY

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["flagship_brand_revenue"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted entries (oracle=None)
    fall back to the driver's rows-only check."""
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
