"""Window-function operators: ranking, lag/lead, running frames,
gaps-and-islands sessionization (SURVEY §2.8 / §7 step 4).

The reference has no window functions, but its A5 "attach group
scalars to rows" is a window aggregate; these generalize that.

Scale notes: every window here partitions by a key (never a global
ORDER BY over the full table), so state per partition is bounded and
the shuffle is a plain hash repartition on the key. Sessionization is
the batch twin of Structured Streaming's ``session_window`` — same
gap semantics, checked against it in tests.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import epoch_us


def rank_in_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence,
    *,
    method: str = "row_number",
    name: str = "rank",
) -> DataFrame:
    """row_number / rank / dense_rank within a partition.

    Pass deterministic ``order_cols`` (include a unique tiebreak key)
    so results are stable across engines and runs.
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[
        method
    ]
    return df.withColumn(name, fn().over(w))


def top_k_per_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence,
    k: int,
) -> DataFrame:
    """Grouped top-k: rank then filter — Spark pushes the limit into
    the sort per partition (WindowGroupLimit at physical planning)."""
    return (
        rank_in_group(df, partition_cols, order_cols, name="__rk")
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def zscore_window(
    df: DataFrame, *, keys: Sequence[str], value_col: str, out_col: str = "z"
) -> DataFrame:
    """Per-group z-score via window aggregates — the native plan for
    'attach group statistics to every row' (SURVEY A5 plan b)."""
    w = Window.partitionBy(*keys)
    mean = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    # guard: constant group → sd = 0.0, which ERRORS under ANSI mode
    # (Spark 4 default) instead of yielding NULL; single-row → sd NULL
    z = F.when(sd != 0, (F.col(value_col) - mean) / sd)
    return df.withColumn(out_col, z)


def zscore_grouped_map(
    df: DataFrame, *, keys: Sequence[str], value_col: str, out_col: str = "z"
) -> DataFrame:
    """Per-group z-score via ``applyInPandas`` — the documented escape
    hatch (SURVEY §2.8) for group logic Spark expressions can't say.
    Kept semantically identical to :func:`zscore_window` and
    cross-checked in tests; prefer the window form in production
    (codegen, no Python workers)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def fn(pdf):
        v = pdf[value_col]
        pdf = pdf.copy()
        z = (v - v.mean()) / v.std(ddof=1)
        # single-row / constant groups: 0/0 -> pandas NaN, but the
        # window plan emits NULL (divide-by-zero/NULL stddev) — align.
        # object dtype so None survives Arrow as NULL, not NaN.
        pdf[out_col] = z.astype(object).where(z.notna(), None)
        return pdf

    return df.groupBy(*keys).applyInPandas(fn, schema=schema)


def sessionize(
    df: DataFrame,
    *,
    by: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: Sequence[str] = (),
    session_col: str = "session_id",
) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the
    gap to the previous event (per ``by`` key) EXCEEDS ``gap_seconds``.

    Boundary verified against ``F.session_window`` empirically
    (tests): Spark MERGES adjacent session windows, so an event
    exactly ``gap_seconds`` after its predecessor belongs to the SAME
    session — strict ``>`` here matches. Two window passes over the
    same partitioning → one shuffle.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_tiebreak]
    w = Window.partitionBy(*by).orderBy(*order)
    prev_us = F.lag(epoch_us(ts_col)).over(w)
    new_sess = F.when(
        prev_us.isNull()
        | (epoch_us(ts_col) - prev_us > gap_seconds * 1_000_000),
        1,
    ).otherwise(0)
    return df.withColumn("__new", new_sess).withColumn(
        session_col, F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("__new")


def global_row_number(
    df: DataFrame,
    *,
    value_col: str,
    ascending: bool = True,
    tiebreak_cols: Sequence[str] = (),
    name: str = "row_number",
    num_buckets: int = 32,
    relative_error: float = 0.001,
    total_col: str | None = None,
) -> DataFrame:
    """EXACT global row numbering without a global window sort.

    ``row_number() OVER (ORDER BY ...)`` with no PARTITION BY funnels
    the whole table through one task. This computes the identical
    ranks in three bounded passes:

    1. ``approxQuantile`` on ``value_col`` → ``num_buckets - 1`` cut
       points (deterministic Greenwald–Khanna sketch; the bounds only
       need to be CONSISTENT between passes, not exact —
       ``relative_error`` merely balances bucket sizes).
    2. ``groupBy(bucket).count()`` → the driver folds ``num_buckets``
       rows into cumulative offsets.
    3. ``row_number()`` over ``Window.partitionBy(bucket)`` plus the
       broadcast per-bucket offset — each task sorts only its bucket.

    Rows tied on a cut value always land in one bucket (strict
    inequality on the boundary), so ``tiebreak_cols`` never straddle
    buckets and the result is bit-identical to the global window for
    any deterministic total order. ``value_col`` must be non-null.
    ``total_col``, if set, attaches the (driver-known) total row count
    as a literal — callers needing N avoid a fourth pass.
    """
    bounds = df.approxQuantile(
        value_col, [i / num_buckets for i in range(1, num_buckets)], relative_error
    )
    b = df.withColumn(
        "__bucket", _bucket_expr(value_col, ascending, bounds, num_buckets)
    )
    counts = {
        r["__bucket"]: r["count"]
        for r in b.groupBy("__bucket").count().collect()
    }
    out, acc = _rank_in_buckets(
        b, "__bucket", counts, value_col, ascending, tiebreak_cols, name
    )
    out = out.drop("__bucket")
    if total_col is not None:
        out = out.withColumn(total_col, F.lit(acc))
    return out


def _bucket_expr(
    value_col: str, ascending: bool, bounds: list, num_buckets: int
):
    """Range-bucket assignment against quantile cut points. Strict
    inequality on the boundary keeps ties in one bucket."""
    v = F.col(value_col)
    bucket = F.lit(num_buckets)
    # when-chains are monotone with the requested order: bucket 1 first.
    if ascending:
        for i in range(num_buckets - 1, 0, -1):
            bucket = F.when(v <= F.lit(bounds[i - 1]), i).otherwise(bucket)
    else:
        for i in range(num_buckets - 1, 0, -1):
            bucket = F.when(v > F.lit(bounds[num_buckets - 1 - i]), i).otherwise(
                bucket
            )
    return bucket


def _rank_in_buckets(
    b: DataFrame,
    bucket_col: str,
    counts: dict,
    value_col: str,
    ascending: bool,
    tiebreak_cols: Sequence[str],
    name: str,
):
    """row_number within each bucket + broadcast cumulative offset.
    Returns (frame-with-rank, total row count)."""
    offsets, acc = {}, 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    off = F.lit(0)
    for p, o in offsets.items():
        off = F.when(F.col(bucket_col) == p, F.lit(o)).otherwise(off)
    direction = F.asc if ascending else F.desc
    w = Window.partitionBy(bucket_col).orderBy(
        direction(value_col), *[F.asc(c) for c in tiebreak_cols]
    )
    return b.withColumn(name, (F.row_number().over(w) + off).cast("int")), acc


def global_row_numbers(
    df: DataFrame,
    specs: Sequence[tuple[str, bool, str]],
    *,
    tiebreak_cols: Sequence[str] = (),
    num_buckets: int = 32,
    relative_error: float = 0.001,
    total_col: str | None = None,
) -> DataFrame:
    """EXACT global row numbering over SEVERAL orderings in one pass
    pair. ``specs`` is a sequence of ``(value_col, ascending, name)``.

    Ranking k dimensions with k :func:`global_row_number` calls costs
    2k driver actions (quantiles + bucket counts each); here ONE
    multi-column ``approxQuantile`` job fetches every dimension's cut
    points and ONE grouping-sets aggregation counts every dimension's
    buckets (the output is |dims|×|buckets| rows — each grouping set
    leaves the other bucket columns null, which is how rows are
    attributed). The per-dimension rank windows then run in the same
    final job. Used by ``customer_rfm_segments`` (3 orderings, 2
    actions instead of 6)."""
    cols = [s[0] for s in specs]
    probs = [i / num_buckets for i in range(1, num_buckets)]
    all_bounds = df.approxQuantile(cols, probs, relative_error)
    b = df
    bucket_cols = []
    for (col, asc, name), bounds in zip(specs, all_bounds):
        bc = f"__bucket_{name}"
        b = b.withColumn(bc, _bucket_expr(col, asc, bounds, num_buckets))
        bucket_cols.append(bc)
    sets = b.groupingSets(
        [(c,) for c in bucket_cols], *[F.col(c) for c in bucket_cols]
    ).count()
    counts_rows = sets.collect()
    acc = 0
    for (col, asc, name), bc in zip(specs, bucket_cols):
        counts = {
            r[bc]: r["count"] for r in counts_rows if r[bc] is not None
        }
        b, acc = _rank_in_buckets(
            b, bc, counts, col, asc, tiebreak_cols, name
        )
    out = b.drop(*bucket_cols)
    if total_col is not None:
        out = out.withColumn(total_col, F.lit(acc))
    return out


def distributed_ntile(
    df: DataFrame,
    *,
    col: str,
    n: int,
    out_col: str = "bucket",
    relative_error: float = 0.0,
) -> DataFrame:
    """Scale-path ntile: assign each row to one of ``n`` quantile
    buckets WITHOUT a global window sort.

    ``F.ntile`` over an unpartitioned window funnels every row through
    ONE task — correct at catalog scale, fatal at 100 TB. Here the
    bucket bounds come from ``approxQuantile`` (Greenwald-Khanna, one
    distributed pass, driver holds only n-1 cut points), and
    assignment is a map-side comparison against the broadcast bounds —
    zero shuffles beyond the stats pass.

    Differences from exact ntile, by construction: bucket POPULATIONS
    are approximate (bounded by ``relative_error``; 0.0 means exact
    quantiles at extra cost), and rows tied on the cut value land in
    the same bucket (exact ntile splits ties to equalize counts).
    """
    bounds = df.approxQuantile(
        col, [i / n for i in range(1, n)], relative_error
    )
    expr = F.lit(n)
    for i in range(n - 1, 0, -1):
        expr = F.when(F.col(col) <= F.lit(bounds[i - 1]), i).otherwise(expr)
    return df.withColumn(out_col, expr)


def budget_head_hierarchical(
    df: DataFrame,
    *,
    key_col: str,
    id_col: str,
    weight_col: str,
    budget: int,
    cum_col: str = "cum_weight",
    shard_hex_chars: int = 1,
) -> DataFrame:
    """EXACT per-key budget prefix without a single-task-per-key
    window — the hierarchical recipe ``token_budget_head`` documents
    for few-language corpora at 100 TB.

    Semantics are identical to the flat operator: order each key's
    rows by ``(md5(id), id)`` and keep the prefix whose running
    ``weight_col`` sum stays ≤ ``budget``, emitting the running sum as
    ``cum_col``. The plan, however, never funnels a whole key through
    one task:

    1. shard = the first ``shard_hex_chars`` hex chars of the SAME
       md5 that orders the rows — so shard index order IS a prefix
       partition of the global hash order (lowercase fixed-width hex
       sorts lexicographically = numerically), and per-(key, shard)
       work composes exactly.
    2. per-(key, shard) weight totals: one tiny aggregate
       (|keys| × 16^chars rows).
    3. running shard offsets per key over that TINY frame (a window,
       but over the aggregate, not the corpus).
    4. shards whose offset already meets the budget are pruned —
       their rows cannot be admitted, so at 100 TB only boundary
       shards and fully-admitted shards are even scanned past this
       point.
    5. within-shard running sum over ``Window.partitionBy(key,
       shard)`` + broadcast offset join → global running sum,
       bit-identical to the flat window's.

    Parallelism is |keys| × 16^``shard_hex_chars`` tasks instead of
    |keys|; raise ``shard_hex_chars`` to 2 (256 shards/key) when a
    single shard's rows exceed one task's comfortable sort size.

    Precondition: ``weight_col`` values must be non-negative (NULLs
    are skipped by SUM, acting as zero). The shard prune is only
    sound when running sums never decrease — with negative weights a
    pruned shard's interior rows could dip back under the budget, and
    no offset-based prune can be correct.
    """
    h = F.md5(F.col(id_col).cast("string"))
    d = df.withColumn("__h", h).withColumn(
        "__shard",
        F.conv(F.substring("__h", 1, shard_hex_chars), 16, 10).cast("int"),
    )
    shard_totals = d.groupBy(key_col, "__shard").agg(
        F.sum(weight_col).alias("__shard_w")
    )
    w_off = (
        Window.partitionBy(key_col)
        .orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = shard_totals.select(
        key_col,
        "__shard",
        (F.sum("__shard_w").over(w_off) - F.col("__shard_w")).alias("__off"),
    ).filter(
        # step-4 prune. <= not <: a shard whose offset EQUALS the
        # budget can still admit zero-weight head rows (cum == budget,
        # which the flat window admits); only offset > budget makes
        # every row of the shard inadmissible — given the
        # non-negative-weight precondition in the docstring.
        F.col("__off") <= budget
    )
    w_in = (
        Window.partitionBy(key_col, "__shard")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.join(F.broadcast(offsets), on=[key_col, "__shard"])
        .withColumn(
            cum_col, F.sum(weight_col).over(w_in) + F.col("__off")
        )
        .filter(F.col(cum_col) <= budget)
        .drop("__h", "__shard", "__off")
    )


def global_running_sum(
    df: DataFrame,
    *,
    value_col: str,
    order_col: str | None = None,
    ascending: bool = True,
    tiebreak_cols: Sequence[str] = (),
    name: str = "running_sum",
    num_buckets: int = 32,
    relative_error: float = 0.001,
) -> DataFrame:
    """EXACT cumulative sum over a GLOBAL ordering without a global
    window sort — the running-total counterpart to
    :func:`global_row_number` (same cliff: ``SUM() OVER (ORDER BY …)``
    with no PARTITION BY funnels the table through one task).

    Same three bounded passes: approxQuantile cut points on
    ``order_col`` (defaults to ``value_col``) → per-bucket SUMs folded
    into cumulative offsets on the driver (``num_buckets`` rows) →
    per-bucket running sum + the bucket's offset literal. Ties on a
    cut value stay in one bucket (strict boundary), so any
    deterministic (order, tiebreak) total order reproduces the global
    window bit-for-bit — PROVIDED ``value_col`` sums are
    order-insensitive: use DECIMAL for money (the repo's monetary-sum
    rule); float offsets would re-associate additions.
    """
    order_col = order_col or value_col
    bounds = df.approxQuantile(
        order_col, [i / num_buckets for i in range(1, num_buckets)],
        relative_error,
    )
    b = df.withColumn(
        "__bucket", _bucket_expr(order_col, ascending, bounds, num_buckets)
    )
    totals = {
        r["__bucket"]: r["t"]
        for r in b.groupBy("__bucket")
        .agg(F.sum(value_col).alias("t"))
        .collect()
    }
    offsets, acc = {}, None
    for p in sorted(totals):
        offsets[p] = acc
        acc = totals[p] if acc is None else acc + totals[p]
    off = F.lit(None)
    for p, o in offsets.items():
        off = F.when(F.col("__bucket") == p, F.lit(o)).otherwise(off)
    direction = F.asc if ascending else F.desc
    w = (
        Window.partitionBy("__bucket")
        .orderBy(direction(order_col), *[F.asc(c) for c in tiebreak_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(value_col).over(w) + F.coalesce(off, F.lit(0))
    return b.withColumn(name, running).drop("__bucket")


def exact_percentile_selection(
    df: DataFrame,
    col: str,
    p: float,
    *,
    rel_err: float = 0.0005,
    max_rounds: int = 6,
) -> float | None:
    """EXACT interpolated percentile by distributed selection — the
    scale path for one global quantile over a huge column, where both
    a global sort and Spark's exact ``percentile`` aggregate (which
    buffers every value) die first.

    Three bounded passes: (1) count n; (2) ``approxQuantile`` brackets
    the target rank with guaranteed rank error; (3) one aggregate
    counts values below the bracket and ``collect_list``s the
    bracket's members (≈ 2·rel_err·n values — driver-bounded, tuned
    by ``rel_err``). The exact order statistics are then read out of
    the sorted bracket and interpolated with the SAME weighted form
    Spark's ``percentile`` and DuckDB's ``quantile_cont`` both use
    (``v_lo·(⌈pos⌉ − pos) + v_hi·(pos − ⌊pos⌋)`` at fractional rank
    pos = p·(n−1), exact value when pos is integral — kept verbatim,
    NOT the algebraically-equal ``lo + Δ·frac``, so results are
    bit-identical to both engines). A pathological
    duplicate mass at the bracket edge can evict the target rank from
    the bracket; each retry doubles ``rel_err`` (``max_rounds``
    caps it, then raises rather than returning an approximation).
    """
    import math

    sdf = (
        df.select(F.col(col).alias("__v"))
        .where(F.col("__v").isNotNull())
        .persist()
    )
    try:
        n = sdf.count()
        if n == 0:
            return None
        pos = p * (n - 1)
        lo_idx, hi_idx = math.floor(pos), math.ceil(pos)
        eps = max(rel_err, 2.0 / n)
        for _ in range(max_rounds):
            plo = max(0.0, p - eps)
            phi = min(1.0, p + eps)
            blo, bhi = sdf.stat.approxQuantile(
                "__v", [plo, phi], eps * 0.25
            )
            in_bracket = (F.col("__v") >= blo) & (F.col("__v") <= bhi)
            row = sdf.agg(
                F.sum(
                    F.when(F.col("__v") < blo, 1).otherwise(0)
                ).alias("below"),
                F.sort_array(
                    F.collect_list(F.when(in_bracket, F.col("__v")))
                ).alias("bracket"),
            ).collect()[0]
            below = row["below"] or 0
            bracket = row["bracket"]
            if below <= lo_idx and hi_idx < below + len(bracket):
                v_lo = bracket[lo_idx - below]
                if lo_idx == hi_idx:
                    return v_lo
                v_hi = bracket[hi_idx - below]
                return v_lo * (hi_idx - pos) + v_hi * (pos - lo_idx)
            eps *= 2.0
        raise RuntimeError(
            f"exact_percentile_selection: bracket missed rank {pos} "
            f"after {max_rounds} widenings (rel_err now {eps})"
        )
    finally:
        sdf.unpersist()


def global_running_max(
    df: DataFrame,
    *,
    value_col: str,
    order_col: str,
    ascending: bool = True,
    name: str = "running_max",
    exclusive: bool = False,
    num_buckets: int = 32,
    relative_error: float = 0.001,
) -> DataFrame:
    """EXACT prefix maximum over a GLOBAL ordering without a global
    window sort — the MAX counterpart to :func:`global_running_sum`
    (same single-task cliff, same three bounded passes), and simpler:
    max is order-insensitive for ANY type, so there is no decimal
    caveat. ``order_col`` must be non-null and is assumed unique per
    row of ``df`` (callers pass group-level frames); with
    ``exclusive=True`` the column is the max over STRICTLY-preceding
    rows (null on the global first row), the shape skyline/frontier
    scans need."""
    bounds = df.approxQuantile(
        order_col,
        [i / num_buckets for i in range(1, num_buckets)],
        relative_error,
    )
    b = df.withColumn(
        "__bucket", _bucket_expr(order_col, ascending, bounds, num_buckets)
    )
    totals = {
        r["__bucket"]: r["t"]
        for r in b.groupBy("__bucket")
        .agg(F.max(value_col).alias("t"))
        .collect()
    }
    offsets, acc = {}, None
    for p in sorted(totals):
        offsets[p] = acc  # max over all PREVIOUS buckets (exclusive)
        # an all-null bucket contributes nothing (F.max returned None);
        # skipping it mirrors the null-skipping F.greatest gives the
        # within-bucket frame below — Python max cannot compare None
        if totals[p] is not None:
            acc = totals[p] if acc is None else max(acc, totals[p])
    off = F.lit(None)
    for p, o in offsets.items():
        off = F.when(F.col("__bucket") == p, F.lit(o)).otherwise(off)
    direction = F.asc if ascending else F.desc
    w = Window.partitionBy("__bucket").orderBy(direction(order_col))
    frame = (
        w.rowsBetween(Window.unboundedPreceding, -1)
        if exclusive
        else w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = F.max(value_col).over(frame)
    # greatest() skips nulls (returns null only when every input is),
    # which is exactly the neutral-element semantics both the empty
    # exclusive frame and the first bucket's missing offset need.
    running = F.greatest(within, off)
    return b.withColumn(name, running).drop("__bucket")


def skyline_2d(
    df: DataFrame,
    *,
    x_col: str,
    y_col: str,
    num_buckets: int = 32,
) -> DataFrame:
    """2-D skyline (Pareto frontier, minimize x / maximize y, one
    strict): rows not dominated by any other row. Sort-scan identity
    instead of the quadratic dominance definition — a row is
    dominated iff the max y over STRICTLY smaller x groups reaches
    its y, or its own x group holds a strictly larger y. The prefix
    maximum runs through :func:`global_running_max` on the x-group
    frame, so no single-task window and no pairwise comparisons
    anywhere; output is the input rows that survive. Exact for ties:
    rows duplicated on (x, y) dominate nothing and both survive."""
    g = df.groupBy(F.col(x_col).alias("__x")).agg(
        F.max(y_col).alias("__gmax")
    )
    r = global_running_max(
        g,
        value_col="__gmax",
        order_col="__x",
        ascending=True,
        name="__lt",
        exclusive=True,
        num_buckets=num_buckets,
    )
    dominated = F.coalesce(
        F.col("__lt") >= F.col(y_col), F.lit(False)
    ) | (F.col("__gmax") > F.col(y_col))
    return (
        df.join(r, df[x_col] == r["__x"])
        .filter(~dominated)
        .drop("__x", "__gmax", "__lt")
    )
