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

from pyspark.sql import DataFrame, SparkSession


class QuerySpec:
    """One registry entry: (PySpark builder, DuckDB oracle SQL).

    ``oracle`` may be registered as a plain SQL string OR a zero-arg
    callable returning one (r13 advisor finding: rendering the
    50k-merge BPE oracle — a multi-megabyte VALUES literal built from
    a 50,006-line file — at module import taxed EVERY process that
    imports the registry, even when the query never runs).  Callables
    are resolved lazily on first ``.oracle`` access and cached, so
    import cost stays flat as more large-table oracles are added
    while every consumer keeps reading ``.oracle`` as a string."""

    __slots__ = ("name", "builder", "_oracle_raw", "tags")

    def __init__(
        self,
        name: str,
        builder: Callable[[SparkSession, str], DataFrame],
        oracle: str | Callable[[], str] | None,
        tags: tuple[str, ...] = (),
    ):
        self.name = name
        self.builder = builder
        self._oracle_raw = oracle
        self.tags = tuple(tags)

    @property
    def oracle(self) -> str | None:
        raw = self._oracle_raw
        if callable(raw):
            raw = raw()
            if not isinstance(raw, str):
                raise TypeError(
                    f"lazy oracle for {self.name!r} returned "
                    f"{type(raw).__name__}, expected str"
                )
            self._oracle_raw = raw
        return raw


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | Callable[[], str] | None = None,
    tags: tuple[str, ...] = (),
):
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
