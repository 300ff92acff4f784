"""Incremental materialized-aggregate maintenance.

Reference status: extension surface. The reference rebuilds its whole
catalog from raw inputs annually (01_source_me.R:87-96 re-reads every
source). At 100 TB the equivalent "nightly rebuild" is O(history);
this operator maintains a per-key aggregate STATE table instead, so
each new batch costs O(batch + touched state) — the materialized-view
maintenance idea, built from two Spark primitives:

1. decomposable aggregates (SUM/COUNT/MIN/MAX merge associatively, so
   state ⊕ partial-aggregate-of-batch = full recompute, exactly);
2. the versioned table's directory-pruned ``merge`` — only the state
   rows whose keys the batch touches are rewritten; a key-sorted
   state layout with zone maps carries untouched key ranges forward
   verbatim.

AVG is intentionally not a stored state column: store SUM and COUNT
and derive it at read time — averages don't merge, their components
do. The same applies to variance (store sum, sum-of-squares, count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.versioned import VersionedTable

#: aggregate state columns are suffixed by kind so reads are
#: self-describing: <col>_sum, <col>_min, <col>_max, row_count.
_MERGE = {"sum": F.sum, "min": F.min, "max": F.max}


def _partial(batch: DataFrame, keys: list[str], specs: dict[str, tuple[str, ...]]) -> DataFrame:
    aggs = [F.count(F.lit(1)).alias("row_count")]
    for col, kinds in specs.items():
        for k in kinds:
            aggs.append(_MERGE[k](col).alias(f"{col}_{k}"))
    return batch.groupBy(*keys).agg(*aggs)


def _merge_states(a: DataFrame, b: DataFrame, keys: list[str], specs) -> DataFrame:
    aggs = [F.sum("row_count").alias("row_count")]
    for col, kinds in specs.items():
        for k in kinds:
            name = f"{col}_{k}"
            fn = F.sum if k == "sum" else _MERGE[k]
            aggs.append(fn(name).alias(name))
    return a.unionByName(b).groupBy(*keys).agg(*aggs)


def update_incremental_agg(
    table: VersionedTable,
    batch: DataFrame,
    *,
    keys: list[str],
    specs: dict[str, tuple[str, ...]],
    operation: str | None = None,
    props: dict | None = None,
) -> int:
    """Fold one append batch into the aggregate state table.

    ``specs`` maps input column → kinds, e.g. ``{"revenue": ("sum",),
    "price": ("min", "max")}``. Returns the new state version.

    Plan shape: the batch is partially aggregated FIRST (map-side
    combine collapses it to its distinct keys), the state table
    contributes only rows for touched keys — via
    ``VersionedTable.read_range`` the semi join SCANS only state
    directories whose zone map intersects the batch's key range, the
    read-side twin of merge's write pruning — and the re-aggregate
    runs over touched keys only. Nothing re-reads untouched history.
    """
    key = keys[0]
    part = _partial(batch, keys, specs)
    if table.head() is None:
        return table.commit(
            part.sort(*keys),
            stats_col=key,
            operation=operation or "incremental-init",
            props=props,
        )
    bounds = part.agg(
        F.min(key).alias("mn"), F.max(key).alias("mx")
    ).collect()[0]
    if bounds["mn"] is None:
        return table.head()  # empty batch: no new version
    state = table.read_range(key, bounds["mn"], bounds["mx"])
    # Semi-join on the MERGE key alone (keys[0]), not the full
    # composite key: merge() anti-joins existing rows by keys[0], so
    # every state row sharing that value must ride along in new_rows
    # or it would be silently dropped. Composite-key siblings pass
    # through _merge_states unchanged (one row per full key group,
    # nothing to merge with), so carrying them is value-neutral.
    touched = state.join(part.select(key).distinct(), key, "semi")
    new_rows = _merge_states(touched, part, keys, specs)
    return table.merge(
        new_rows.sort(*keys), key, operation=operation, props=props
    )


def read_aggregate(
    table: VersionedTable, *, derive_avg: list[str] = ()
) -> DataFrame:
    """Current state, with AVG columns derived from sum/count."""
    df = table.read()
    for col in derive_avg:
        df = df.withColumn(
            f"{col}_avg", F.col(f"{col}_sum") / F.col("row_count")
        )
    return df
