"""Grouped time-series metrics (SURVEY §2.5 A3/A4/A5).

The reference computes per-group CAGR triples (``cagrs``,
01_source_me.R:50-62) and 5/10-year window sums (``sums``, :63-71)
via nest→map→unnest (:104-110). Here both are **conditional
aggregates** — one hash-aggregate shuffle, fully codegen'd, no
Python, no nested data.

Two plans for "attach group metrics to every row" (A5):
  (a) ``*_agg`` + join back on group keys (broadcast when small);
  (b) ``*_window`` via ``Window.partitionBy`` — one pass, no join.
Both are provided and cross-checked in tests (SURVEY §5.2).

Scale notes: conditional agg does map-side partial aggregation, so
the shuffle carries one row per (group × metric), not per input row.
The window variant shuffles the full rowset once on the group keys —
prefer (a)+broadcast when groups ≪ rows, (b) when the long table is
already partitioned by the keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def value_at_year(year_col: str, value_col: str, year: int) -> Column:
    """First non-null value where year == literal (A3 building block)."""
    return F.first(
        F.when(F.col(year_col) == year, F.col(value_col)), ignorenulls=True
    )


def cagr_expr(v_start: Column, v_end: Column, n_years: int) -> Column:
    """``(v_end/v_start)^(1/n) - 1`` (01_source_me.R:56-58)."""
    return F.pow(v_end / v_start, 1.0 / n_years) - F.lit(1.0)


def cagr_metrics_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    *,
    years: tuple[int, int, int],
    year_col: str = "year",
    value_col: str = "value",
    names: tuple[str, str, str] = ("cagr_1st", "cagr_2nd", "cagr_full"),
) -> DataFrame:
    """A3 — per-group CAGR triple over an anchor-year triple.

    The reference uses ``years=(fyod, fyod+5, fyod+10)``
    (01_source_me.R:50-62); any ascending triple works.
    """
    y0, y1, y2 = years
    v0 = value_at_year(year_col, value_col, y0)
    v1 = value_at_year(year_col, value_col, y1)
    v2 = value_at_year(year_col, value_col, y2)
    return df.groupBy(*group_cols).agg(
        cagr_expr(v0, v1, y1 - y0).alias(names[0]),
        cagr_expr(v1, v2, y2 - y1).alias(names[1]),
        cagr_expr(v0, v2, y2 - y0).alias(names[2]),
    )


def range_sums_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    *,
    ranges: Sequence[tuple[int, int]],
    year_col: str = "year",
    value_col: str = "value",
    names: Sequence[str] | None = None,
) -> DataFrame:
    """A4 — per-group sums over inclusive year ranges.

    The reference uses ``[(f+1,f+5), (f+6,f+10), (f+1,f+10)]``
    (01_source_me.R:63-71).
    """
    v = F.col(value_col)
    y = F.col(year_col)
    names = list(names) if names else [f"sum_{lo}_{hi}" for lo, hi in ranges]
    return df.groupBy(*group_cols).agg(
        *[
            F.sum(F.when(y.between(lo, hi), v)).alias(n)
            for (lo, hi), n in zip(ranges, names)
        ]
    )


def attach_group_metrics_window(
    df: DataFrame,
    group_cols: Sequence[str],
    metrics: dict[str, Column],
) -> DataFrame:
    """A5 plan (b) — attach per-group scalars to every row via window.

    ``metrics`` maps output name → aggregate Column (e.g. built from
    :func:`value_at_year` / conditional sums). One shuffle on the
    group keys, no join.
    """
    w = Window.partitionBy(*group_cols)
    out = df
    for name, expr in metrics.items():
        out = out.withColumn(name, expr.over(w))
    return out


def attach_group_metrics_join(
    df: DataFrame,
    metrics_df: DataFrame,
    group_cols: Sequence[str],
    *,
    broadcast: bool = True,
) -> DataFrame:
    """A5 plan (a) — join per-group metrics back onto the long table.

    Group cardinality ≪ row count in the reference shape, so the
    metrics side broadcasts: no shuffle of the big table at all.
    """
    right = F.broadcast(metrics_df) if broadcast else metrics_df
    return df.join(right, on=list(group_cols), how="left")
