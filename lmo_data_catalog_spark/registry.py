"""Query registry: every SURVEY §2 operator gets a (PySpark builder,
DuckDB oracle SQL) pair consumed by ``__spark_entry__.py``.

Conventions (driver contract):
- builder signature ``(spark, sf_dir) -> DataFrame``; lazy, no collect.
- every computed column aliased identically in Spark and SQL.
- float aggregates rounded at the *final* projection (ROUND in both
  engines), always FINER than the data's intrinsic decimal granularity
  (prices 2 dp → round ≥2; price×(1-disc) 4 dp → round ≥4) so exact
  sums never sit on a rounding tie where cross-engine summation-order
  ulp drift could flip the digit. Irrational outputs (rates, CAGRs,
  averages) → 6 dp (tie probability ~0).
- timestamps never emitted raw: cast to DATE or truncated, avoiding
  ns-vs-µs parquet precision mismatches.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

@dataclass
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, oracle, tags)
        return fn

    return deco


def load_all() -> None:
    """Import every query-definition module, populating REGISTRY."""
    from .queries import (  # noqa: F401
        advanced,
        breadth,
        core,
        llm,
        pipeline,
        shapes,
        stats,
    )


load_all()
