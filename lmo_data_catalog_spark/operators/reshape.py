"""Reshape operators: unpivot (R1), pivot (R2) — SURVEY §2.4.

The reference melts wide year columns to long 10 times
(01_source_me.R:101 etc.) and spreads back 6 times (:108 etc.).

Scale notes:
- ``unpivot`` is a narrow, shuffle-free expand (Spark's ``Expand``
  node) — safe at any scale.
- ``pivot`` with an *explicit* value list avoids the extra
  distinct-scan job Spark otherwise runs to discover pivot values, and
  guarantees deterministic column order. Always pass ``values``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unpivot_years(
    df: DataFrame,
    id_cols: Sequence[str],
    year_cols: Sequence[str] | None = None,
    *,
    var_name: str = "year",
    value_name: str = "value",
    cast_year_int: bool = True,
) -> DataFrame:
    """Wide→long melt of year columns (R1; 01_source_me.R:101).

    ``year_cols`` defaults to every column starting with ``2`` —
    the reference's ``starts_with("2")`` convention.
    """
    if year_cols is None:
        year_cols = [c for c in df.columns if c.startswith("2")]
    out = df.unpivot(
        list(id_cols), list(year_cols), variableColumnName=var_name, valueColumnName=value_name
    )
    if cast_year_int:
        out = out.withColumn(var_name, F.col(var_name).cast("int"))
    return out


def pivot_years(
    df: DataFrame,
    id_cols: Sequence[str],
    values: Sequence[int | str],
    *,
    var_name: str = "year",
    value_name: str = "value",
) -> DataFrame:
    """Long→wide spread (R2; 01_source_me.R:108).

    ``values`` is mandatory: known-from-config year list → no
    distinct-discovery scan, stable column order. ``first`` is the
    correct agg because (id_cols, year) is a key post-aggregation.
    """
    out = (
        df.groupBy(*id_cols)
        .pivot(var_name, list(values))
        .agg(F.first(value_name, ignorenulls=True))
    )
    # pivot renders column names from values; normalize to plain str
    return out.toDF(*id_cols, *[str(v) for v in values])
