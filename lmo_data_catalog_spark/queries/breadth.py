"""Operator-breadth queries (SURVEY §7 step 4): windows, set ops,
semi/anti/outer/as-of/range joins, rollup/cube/grouping sets, exact
distinct + percentiles, date/string/JSON scalar surface, event
sessionization and time-windowed aggregation.

Same conventions as ``queries.core`` (rounding finer than data
granularity; no raw timestamps — epoch µs/s BIGINT or DATE instead;
DuckDB int-sum results cast to BIGINT to mirror Spark's types).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions import epoch_us
from ..operators.joins import asof_join, bucket_proximity_join, range_join
from ..operators.windows import rank_in_group, sessionize, top_k_per_group
from ..registry import query
from .core import _yearly_flag_revenue, _YEARLY_FLAG_REVENUE_SQL


# ------------------------------------------------------------- window: ranking
@query(
    "window_rank_topk",
    oracle="""
    SELECT o_orderpriority AS priority, o_orderkey, ROUND(o_totalprice, 2) AS total_price, rk
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rk
        FROM orders
    ) WHERE rk <= 3
    """,
    tags=("W", "topk"),
)
def window_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k via row_number (unique tiebreak key ⇒
    deterministic). Spark plans WindowGroupLimit: the per-partition
    sort keeps only k rows — no full sort at scale."""
    cat = Catalog(spark, sf_dir)
    ranked = rank_in_group(
        cat.orders,
        ["o_orderpriority"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        name="rk",
    )
    return ranked.filter(F.col("rk") <= 3).select(
        F.col("o_orderpriority").alias("priority"),
        "o_orderkey",
        F.round("o_totalprice", 2).alias("total_price"),
        # bigint: DuckDB ROW_NUMBER() binds BIGINT (r13 width guard)
        F.col("rk").cast("long").alias("rk"),
    )


# ------------------------------------------------------------ window: lag/lead
@query(
    "window_lag_yoy",
    oracle=f"""
    SELECT grp, year,
           ROUND(value, 4) AS value,
           ROUND(value - LAG(value) OVER (PARTITION BY grp ORDER BY year), 4) AS yoy_delta,
           ROUND(LEAD(value) OVER (PARTITION BY grp ORDER BY year), 4) AS next_value
    FROM ({_YEARLY_FLAG_REVENUE_SQL}) long
    """,
    tags=("W",),
)
def window_lag_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics over an ordered partition (year-over-year
    delta) — the time-series idiom the reference approximates with
    wide-column arithmetic."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("grp").orderBy("year")
    long = _yearly_flag_revenue(cat)
    return long.select(
        "grp",
        "year",
        F.round("value", 4).alias("value"),
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("yoy_delta"),
        F.round(F.lead("value").over(w), 4).alias("next_value"),
    )


# ------------------------------------------------------ window: running frames
@query(
    "window_running_total",
    oracle=f"""
    SELECT grp, year,
           ROUND(SUM(value) OVER (
               PARTITION BY grp ORDER BY year
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_revenue
    FROM ({_YEARLY_FLAG_REVENUE_SQL}) long
    """,
    tags=("W",),
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frame (UNBOUNDED PRECEDING..CURRENT ROW):
    cumulative revenue per returnflag across years. The window is
    keyed, so each task sorts one group's (tiny) yearly frame; for a
    FEW-key running sum over raw facts use the per-(key, shard)
    hierarchical machinery instead (SCALING.md §token budget)."""
    cat = Catalog(spark, sf_dir)
    w = (
        Window.partitionBy("grp")
        .orderBy("year")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _yearly_flag_revenue(cat).select(
        "grp", "year", F.round(F.sum("value").over(w), 4).alias("running_revenue")
    )


# ------------------------------------------------------------------ top-k sort
@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS total_price
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    tags=("topk",),
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark's TakeOrderedAndProject — per-partition
    heap + driver merge of k rows, never a full sort/shuffle."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total_price"))
    )


# --------------------------------------------------------------------- set ops
@query(
    "set_intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): nations having both customers and
    suppliers. Compiles to a left-semi join over pre-distinct
    inputs — one keyed shuffle per side, map-side partial distinct;
    no sort, no driver materialization at any scale."""
    cat = Catalog(spark, sf_dir)
    return cat.customer.select(F.col("c_nationkey").alias("nationkey")).intersect(
        cat.supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "set_except_custkeys",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    tags=("setop",),
)
def set_except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct, ``subtract``): customers with urgent orders
    but no low-priority ones."""
    cat = Catalog(spark, sf_dir)
    orders = cat.orders
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.subtract(low)


@query(
    "union_all_tagged",
    oracle="""
    SELECT party, COUNT(*) AS n, CAST(SUM(nationkey) AS BIGINT) AS key_sum
    FROM (
        SELECT 'customer' AS party, c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT 'supplier', s_nationkey FROM supplier
    )
    GROUP BY party
    """,
    tags=("setop", "O4"),
)
def union_all_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL with a literal tag column (the reference's
    row-binding / list-concat O3/O4 analog)."""
    cat = Catalog(spark, sf_dir)
    u = cat.customer.select(
        F.lit("customer").alias("party"), F.col("c_nationkey").alias("nationkey")
    ).unionByName(
        cat.supplier.select(
            F.lit("supplier").alias("party"), F.col("s_nationkey").alias("nationkey")
        )
    )
    return u.groupBy("party").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("nationkey").cast("bigint").alias("key_sum"),
    )


# ---------------------------------------------------------------- semi / anti
@query(
    "join_semi_customers_with_orders",
    oracle="""
    SELECT c_mktsegment AS segment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """,
    tags=("join", "semi"),
)
def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers with ≥1 order, counted by
    segment. The build side carries only the join key (o_custkey),
    so the hash table stays narrow however wide orders is; the probe
    side streams and never duplicates rows — the safe EXISTS plan at
    any fact size."""
    cat = Catalog(spark, sf_dir)
    customer, orders = cat.customer, cat.orders
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "join_anti_customers_without_urgent",
    oracle="""
    SELECT c_mktsegment AS segment, COUNT(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    GROUP BY 1
    """,
    tags=("join", "anti"),
)
def join_anti_customers_without_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no urgent orders.
    Same narrow-build shape as the semi join with the priority
    filter pushed BELOW the join, so the anti build side holds only
    urgent orderers — the selective side shrinks before it
    shuffles."""
    cat = Catalog(spark, sf_dir)
    customer = cat.customer
    urgent = cat.orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ------------------------------------------------------------------ full outer
@query(
    "join_full_outer_nation_parties",
    oracle="""
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           COALESCE(c.n_cust, 0) AS n_cust, COALESCE(s.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
    USING (nationkey)
    """,
    tags=("join", "outer"),
)
def join_full_outer_nation_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two per-nation aggregates with a COALESCE'd
    key. Full-outer cannot broadcast (both sides must surface
    unmatched rows) so both hash-shuffle — cheap here because each
    side is pre-aggregated to dimension cardinality before the
    join."""
    cat = Catalog(spark, sf_dir)
    c = cat.customer.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    s = cat.supplier.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    return c.join(s, on="nationkey", how="full_outer").select(
        "nationkey",
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


# --------------------------------------------------------------------- as-of
@query(
    "join_asof_last_signup",
    oracle="""
    SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
           epoch_us(r.ts) AS last_signup_us
    FROM events l
    ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') r
    ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    tags=("join", "asof"),
)
def join_asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (DuckDB ASOF semantics): each event matched to the
    user's latest signup at-or-before it. Union+window implementation:
    ONE shuffle on (user_id), linear in rows — the shape that survives
    100 TB, unlike a range self-join."""
    cat = Catalog(spark, sf_dir)
    left = cat.events.select("event_id", "user_id", "ts")
    right = (
        cat.events.filter(F.col("event_type") == "signup")
        .select("user_id", "ts", F.col("ts").alias("signup_ts"))
    )
    out = asof_join(left, right, on="ts", by=["user_id"], right_cols=["signup_ts"])
    return out.select(
        "event_id",
        "user_id",
        epoch_us("ts").alias("ts_us"),
        epoch_us("signup_ts_r").alias("last_signup_us"),
    )


# ---------------------------------------------------------------- range join
@query(
    "join_range_ship_window",
    oracle="""
    SELECT o_orderpriority AS priority, COUNT(*) AS n_lines,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem l JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY
    GROUP BY 1
    """,
    tags=("join", "range"),
)
def join_range_ship_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range predicate join (lines shipped within 90 days of
    order) — hash join on the equi key, range as residual filter;
    never a cartesian."""
    cat = Catalog(spark, sf_dir)
    li, orders = cat.lineitem, cat.orders
    joined = range_join(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        orders,
        equi_keys=["o_orderkey"],
        lo=li.l_shipdate >= orders.o_orderdate,
        hi=li.l_shipdate <= F.date_add(orders.o_orderdate.cast("date"), 90),
    )
    return joined.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue"),
    )


@query(
    "proximity_join_error_purchase",
    oracle="""
    WITH p AS (
        SELECT event_id, epoch_us(ts) AS t
        FROM events WHERE event_type = 'purchase'
    ),
    e AS (
        SELECT user_id, epoch_us(ts) AS t
        FROM events WHERE event_type = 'error'
    )
    SELECT p.t // 3600000000 AS hour_bucket,
           COUNT(*) AS n_pairs,
           COUNT(DISTINCT p.event_id) AS n_purchases,
           COUNT(DISTINCT e.user_id) AS n_error_users
    FROM p JOIN e ON ABS(p.t - e.t) <= 300000000
    GROUP BY 1 ORDER BY 1
    """,
    tags=("join", "range", "proximity"),
)
def proximity_join_error_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Purchases with a platform error within ±300 s — by ANY user, so
    there is NO natural equi key and a naive inequality join is a
    cartesian. :func:`bucket_proximity_join` synthesizes the key
    (300 s time buckets; the error side explodes to the 2–3 buckets
    its tolerance interval spans), so the plan is one linear
    hash/SMJ shuffle with the exact |Δt| predicate as residual —
    never BNLJ (pinned suite-wide by test_plan_hygiene). Hourly
    counts via integer division (`div` here == `//` in the oracle
    for the non-negative epochs). ±300 s (not ±60) so the smallest
    sf0.001 axis still produces rows — a 0-row match proves nothing."""
    W = 300_000_000  # ±300 s in µs
    events = Catalog(spark, sf_dir).events
    p = events.filter(F.col("event_type") == "purchase").select(
        "event_id", epoch_us(F.col("ts")).alias("p_t")
    )
    e = events.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), epoch_us(F.col("ts")).alias("e_t")
    )
    pairs = bucket_proximity_join(
        p, e, left_ts="p_t", right_ts="e_t", window=W
    )
    return (
        pairs.groupBy(F.expr("p_t div 3600000000").alias("hour_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("event_id").alias("n_purchases"),
            F.countDistinct("e_user").alias("n_error_users"),
        )
        .orderBy("hour_bucket")
    )


@query(
    "fk_integrity_audit",
    oracle="""
    SELECT 'customer.c_nationkey->nation' AS fk_edge,
           COUNT(*) AS n_child,
           COUNT(DISTINCT c.c_nationkey) AS n_distinct_fk,
           CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
    FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders', COUNT(*),
           COUNT(DISTINCT l.l_orderkey),
           CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'lineitem.l_partkey->part', COUNT(*),
           COUNT(DISTINCT l.l_partkey),
           CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier', COUNT(*),
           COUNT(DISTINCT l.l_suppkey),
           CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    UNION ALL
    SELECT 'nation.n_regionkey->region', COUNT(*),
           COUNT(DISTINCT na.n_regionkey),
           CAST(SUM(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM nation na LEFT JOIN region r ON na.n_regionkey = r.r_regionkey
    UNION ALL
    SELECT 'orders.o_custkey->customer', COUNT(*),
           COUNT(DISTINCT o.o_custkey),
           CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'supplier.s_nationkey->nation', COUNT(*),
           COUNT(DISTINCT s.s_nationkey),
           CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
    ORDER BY fk_edge
    """,
    tags=("audit", "catalog", "join"),
)
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across every FK edge of the star
    schema — the data-catalog health check run before anything else
    trusts the joins. One row per edge: child row count, distinct FK
    values, and orphan rows (no matching parent key).

    Each edge is a LEFT join against the parent's key column with a
    constant hit marker, aggregated in the same pass — a parent key
    is unique, so the join never duplicates child rows and n_child
    stays the plain child count. Parent key columns are tiny relative
    to their children (the biggest, orders, is ~1/4 of lineitem and
    one column wide), so Catalyst broadcasts them and the audit is a
    single scan per child table with map-side joins — no shuffle of
    any child. A NULL FK has no parent match and is counted as an
    orphan in both engines (LEFT-join NULL semantics agree)."""
    cat = Catalog(spark, sf_dir)
    edges = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
    ]
    parts = []
    for child, fk, parent, pk in edges:
        label = f"{child}.{fk}->{parent}"
        c = cat.load(child).select(fk)
        p = cat.load(parent).select(
            F.col(pk).alias("__pk"), F.lit(1).alias("__hit")
        )
        joined = c.join(p, c[fk] == F.col("__pk"), "left")
        parts.append(
            joined.agg(
                F.lit(label).alias("fk_edge"),
                F.count(F.lit(1)).alias("n_child"),
                F.countDistinct(fk).alias("n_distinct_fk"),
                F.sum(
                    F.when(F.col("__hit").isNull(), 1).otherwise(0)
                ).alias("n_orphans"),
            )
        )
    out = parts[0]
    for q in parts[1:]:
        out = out.unionByName(q)
    return out.orderBy("fk_edge")


# ------------------------------------------------------------ rollup and cube
@query(
    "rollup_year_priority",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS year, o_orderpriority AS priority,
           COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (CAST(year(o_orderdate) AS INTEGER), o_orderpriority)
    """,
    tags=("rollup",),
)
def rollup_year_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy (year → priority → grand total) — partial/
    final agg handled by Catalyst's Expand."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.orders.select(
            F.year("o_orderdate").alias("year"),
            F.col("o_orderpriority").alias("priority"),
            "o_totalprice",
        )
        .rollup("year", "priority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@query(
    "cube_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("cube",),
)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dims — all 4 grouping sets in ONE scan: Spark
    expands grouping sets map-side and partial-aggregates each, so
    the fact table is never re-read per grouping; NULL-as-total rows
    are the grouping markers, distinguishable via grouping_id."""
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "grouping_sets_sql",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("rollup", "sql"),
)
def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the spark.sql surface — pins
    that the SQL entry point plans the same single-scan grouping-set
    expansion as the DataFrame cube/rollup queries (same Expand
    node, same partial aggregation)."""
    cat = Catalog(spark, sf_dir)
    cat.lineitem.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# ------------------------------------------- exact distinct count + percentile
@query(
    "count_distinct_customers",
    oracle="""
    SELECT o_orderpriority AS priority,
           COUNT(DISTINCT o_custkey) AS n_customers, COUNT(*) AS n_orders
    FROM orders GROUP BY 1
    """,
    tags=("agg",),
)
def count_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) — Catalyst expands to a two-stage
    aggregate (partial distinct then merge)."""
    cat = Catalog(spark, sf_dir)
    return cat.orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "percentiles_quantity",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
           ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90_qty
    FROM lineitem GROUP BY 1
    """,
    tags=("agg", "percentile"),
)
def percentiles_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (linear interpolation — same
    algorithm as DuckDB quantile_cont; verified equal). At 100 TB
    swap to percentile_approx for one-pass sketching."""
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", 0.5), 6).alias("median_qty"),
        F.round(F.percentile("l_quantity", 0.9), 6).alias("p90_qty"),
    )


# ------------------------------------------------------------- date functions
@query(
    "date_parts_orders",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(quarter(o_orderdate) AS INTEGER) AS q,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders GROUP BY 1, 2, 3
    """,
    tags=("date",),
)
def date_parts_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/quarter/month extraction + aggregation — calendar parts as
    JVM date intrinsics inside whole-stage codegen feeding a bounded
    group-by; extraction conventions verified against DuckDB's (the
    differential would catch any week/dow convention drift)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.orders.groupBy(
            F.year("o_orderdate").alias("y"),
            F.quarter("o_orderdate").alias("q"),
            F.month("o_orderdate").alias("m"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@query(
    "date_arith_ship_latency",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(MIN(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS INTEGER) AS min_days,
           CAST(MAX(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS INTEGER) AS max_days,
           ROUND(AVG(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))), 6) AS avg_days
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
    tags=("date", "join"),
)
def date_arith_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic (datediff) across a join: order→ship latency
    averaged per priority. Interval math stays integer days end-to-
    end (no float round trip), the join is keyed on orderkey, and
    the average is map-side combinable."""
    cat = Catalog(spark, sf_dir)
    days = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    return (
        cat.lineitem.join(
            cat.orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.min(days).alias("min_days"),
            F.max(days).alias("max_days"),
            F.round(F.avg(days), 6).alias("avg_days"),
        )
    )


# ------------------------------------------------------------ string functions
@query(
    "string_funcs_part",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           lower(p_type) AS type_l,
           CAST(length(p_name) AS INTEGER) AS name_len,
           split_part(p_type, ' ', 2) AS type_mid,
           substr(p_brand, 7) AS brand_num,
           replace(p_brand, 'Brand#', 'B') AS brand_short,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           regexp_extract(p_name, '[0-9]+') AS first_digits
    FROM part
    """,
    tags=("string",),
)
def string_funcs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string surface (SURVEY C1-C6): case, length, split,
    substring, replace, pad, regex extract — all codegen'd built-ins."""
    cat = Catalog(spark, sf_dir)
    return cat.part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.length("p_name").alias("name_len"),
        # get() tolerates 1-word types (NULL), coalesced to '' to match
        # DuckDB split_part's missing-field behavior
        F.coalesce(F.get(F.split("p_type", " "), F.lit(1)), F.lit("")).alias("type_mid"),
        F.substring("p_brand", 7, 2147483647).alias("brand_num"),
        F.regexp_replace("p_brand", "Brand#", "B").alias("brand_short"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.regexp_extract("p_name", "[0-9]+", 0).alias("first_digits"),
    )


# -------------------------------------------------------------- JSON extraction
@query(
    "json_extract_events",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS k_max
    FROM events GROUP BY 1
    """,
    tags=("json",),
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events.props string column via
    get_json_object — single-key extraction avoids materializing a
    full from_json struct when one field is needed, and runs
    codegen-side (no Python). For multi-field or corrupt-tolerant
    parsing, operators/observe.py::parse_json_quarantine is the
    production path."""
    cat = Catalog(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return cat.events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).cast("bigint").alias("k_sum"),
        F.max(k).alias("k_max"),
    )


# ------------------------------------------------------------ CASE WHEN buckets
@query(
    "case_when_price_buckets",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 200000 THEN 'mid'
                ELSE 'high' END AS bucket,
           COUNT(*) AS n, ROUND(AVG(o_totalprice), 6) AS avg_price
    FROM orders GROUP BY 1
    """,
    tags=("scalar",),
)
def case_when_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional bucketing (when/otherwise chain) into price bands —
    compiles to one codegen CASE expression; bands are disjoint so
    the whole query is a single map-side-combinable aggregate over
    exact decimal boundaries."""
    cat = Catalog(spark, sf_dir)
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 200000, "mid")
        .otherwise("high")
    )
    return cat.orders.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
    )


# ------------------------------------------------------- event sessionization
@query(
    "sessionize_events",
    oracle="""
    WITH flags AS (
        SELECT user_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM flags GROUP BY user_id
    """,
    tags=("session", "W"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (30-min inactivity gap) — the
    batch twin of Structured Streaming session windows; one shuffle
    on user_id."""
    cat = Catalog(spark, sf_dir)
    s = sessionize(
        cat.events,
        by=["user_id"],
        ts_col="ts",
        gap_seconds=30 * 60,
        order_tiebreak=["event_id"],
    )
    return s.groupBy("user_id").agg(
        F.max("session_id").cast("bigint").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ----------------------------------------------------- tumbling window (batch)
@query(
    "tumbling_hourly_events",
    oracle="""
    SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
           COUNT(*) AS n, ROUND(SUM(value), 4) AS value_sum
    FROM events GROUP BY 1, 2
    """,
    tags=("window_time", "streaming"),
)
def tumbling_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation via F.window — identical
    semantics batch or streaming (readStream swap-in, SURVEY §2.8)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .select(
            epoch_us("w.start").alias("hour_us"),
            "event_type",
            "n",
            "value_sum",
        )
    )


# ------------------------------------------------------ sliding window (batch)
@query(
    "sliding_hourly_events",
    oracle="""
    WITH e AS (
        SELECT event_type, value,
               CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) AS s30
        FROM events
    )
    SELECT win_start, COUNT(*) AS n, ROUND(SUM(value), 4) AS value_sum
    FROM (
        SELECT s30 AS win_start, value FROM e
        UNION ALL
        SELECT s30 - 1800 AS win_start, value FROM e
    )
    GROUP BY win_start
    """,
    tags=("window_time", "streaming"),
)
def sliding_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h length, 30 min slide): each event lands in
    exactly two windows. Oracle reproduces Spark's epoch-aligned
    window starts arithmetically."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .select(
            F.unix_timestamp("w.start").alias("win_start"),
            "n",
            "value_sum",
        )
    )


# ----------------------------------- stream-stream outer join (batch mirror)


@query(
    "click_attribution_outer",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           epoch_us(c.ts) AS click_us, epoch_us(p.ts) AS purchase_us,
           ROUND(p.value, 4) AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND c.ts <= p.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
    tags=("join", "interval", "streaming"),
)
def click_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch mirror of the LEFT OUTER stream-stream interval join
    (streaming/ops.py::click_purchase_attribution(how="left_outer")):
    every click joined to same-user purchases within the next hour,
    un-attributed clicks kept with NULL purchase columns. In
    streaming, both sides are watermarked and null rows emit only
    when the watermark proves no match can arrive — the
    batch-equivalence sandwich is pinned in tests/test_streaming.py.
    The equi-key (user_id) carries the shuffle; the time bound is a
    residual predicate, so the plan is a hash join, never a
    cartesian."""
    from ..streaming.ops import click_purchase_attribution

    ev = Catalog(spark, sf_dir).events
    out = click_purchase_attribution(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        how="left_outer",
    )
    return out.select(
        "user_id",
        "click_id",
        "purchase_id",
        epoch_us("click_ts").alias("click_us"),
        epoch_us("purchase_ts").alias("purchase_us"),
        "purchase_value",
    )


# ------------------------------------------------- multi-touch attribution


@query(
    "linear_attribution_credits",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id AS click_id, ts AS cts
      FROM events WHERE event_type = 'click'
    ), p AS (
      SELECT user_id, event_id AS purchase_id, ts AS pts, value
      FROM events WHERE event_type = 'purchase'
    ), j AS (
      SELECT c.click_id, p.purchase_id, p.value,
             COUNT(*) OVER (PARTITION BY p.purchase_id) AS n_touch
      FROM c JOIN p
        ON c.user_id = p.user_id
       AND c.cts <= p.pts AND p.pts <= c.cts + INTERVAL 1 HOUR
    )
    SELECT click_id,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(ROUND(value * 1000000 / n_touch) AS BIGINT))
                AS BIGINT) AS credited_micros
    FROM j GROUP BY click_id
    """,
    tags=("attribution", "window", "interval"),
)
def linear_attribution_credits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-weight) multi-touch attribution: every purchase's
    value splits evenly across the same-user clicks in the preceding
    hour; each click accumulates its credits. The marketing-analytics
    staple on top of the interval join.

    Determinism contract: the per-pair credit is quantized to INTEGER
    micro-units in one fixed expression (round(value·1e6 / n_touch))
    BEFORE the per-click sum, so the aggregate is an exact BIGINT sum
    — summation order (Spark partial aggs vs DuckDB's) cannot move
    the result, the same policy as the DECIMAL money sums. Plan: one
    equi-key interval join (user_id carries the shuffle), one window
    keyed by purchase (touch count), one hash aggregate — every stage
    scales on its key."""
    ev = Catalog(spark, sf_dir).events
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
        "value",
    )
    j = c.join(
        p.withColumnRenamed("user_id", "p_user"),
        (F.col("user_id") == F.col("p_user"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 1 HOUR")),
    )
    n_touch = F.count(F.lit(1)).over(Window.partitionBy("purchase_id"))
    credit = F.round(F.col("value") * 1000000 / F.col("n_touch")).cast(
        "bigint"
    )
    return (
        j.withColumn("n_touch", n_touch)
        .groupBy("click_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(credit).alias("credited_micros"),
        )
    )


# ----------------------------------------- watermark admission rule (batch)


@query(
    "watermark_boundary_admission",
    oracle="""
    WITH e AS (
      SELECT event_id, event_type, value, epoch_us(ts) AS us FROM events
    ), w AS (
      SELECT MAX(us) - 7200000000 AS wm FROM e WHERE event_id % 10 < 8
    ), adm AS (
      SELECT e.*, 0 AS late FROM e WHERE event_id % 10 < 8
      UNION ALL
      SELECT e.*, 1 AS late FROM e, w
      WHERE event_id % 10 >= 8
        AND (us // 3600000000 + 1) * 3600000000 > w.wm
    )
    SELECT CAST((us // 3600000000) * 3600000000 AS BIGINT) AS hour_us,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS value_sum,
           CAST(SUM(late) AS BIGINT) AS n_late
    FROM adm GROUP BY 1, 2
    """,
    tags=("window_time", "streaming", "watermark"),
)
def watermark_boundary_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The watermark drop/keep boundary as a BATCH differential query —
    puts the late-event admission rule under the driver's oracle gate
    (the streaming execution of the same rule is pinned by
    ``tests/test_streaming.py::test_watermark_late_data_drop_keep_boundary``).

    Events with ``event_id % 10 >= 8`` play the late arrivals; the
    watermark is max(on-time ts) − 2 h. Spark's rule, reproduced
    arithmetically in both engines: a late row is admitted iff its
    1-hour window's END is strictly above the watermark (state for a
    window is evicted once wm ≥ window end). All window math is
    integer microseconds (``epoch_us`` + integer div — no float
    boundary risk, no NTZ/unix_micros vintage trap); the watermark
    scalar is a 1-row broadcast; ``n_late`` counts admitted late rows
    per window so the differential proves both the keeps AND the
    drops."""
    HOUR = 3_600_000_000
    ev = Catalog(spark, sf_dir).events.select(
        "event_id",
        "event_type",
        "value",
        epoch_us("ts").alias("__us"),
    )
    on_time = ev.filter(F.col("event_id") % 10 < 8)
    late = ev.filter(F.col("event_id") % 10 >= 8)
    wm = on_time.agg(
        (F.max("__us") - F.lit(2 * HOUR)).alias("__wm_us")
    )
    win_end = (F.expr(f"__us div {HOUR}") + 1) * HOUR
    admitted = (
        late.join(F.broadcast(wm))
        .filter(win_end > F.col("__wm_us"))
        .drop("__wm_us")
    )
    unioned = on_time.withColumn("__late", F.lit(0)).unionByName(
        admitted.withColumn("__late", F.lit(1))
    )
    return unioned.groupBy(
        (F.expr(f"__us div {HOUR}") * HOUR).cast("bigint").alias("hour_us"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("value_sum"),
        F.sum("__late").cast("bigint").alias("n_late"),
    )


# ------------------------------------------------------------- variant (Spark 4)


@query(
    "variant_json_topk",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    ORDER BY k DESC, event_id
    LIMIT 20
    """,
    tags=("json", "variant"),
)
def variant_json_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction via Spark 4 VariantType: parse_json
    decodes the JSON text ONCE into a binary variant, then typed
    try_variant_get paths read it without re-parsing — the 100 TB plan
    when multiple paths hit the same column (get_json_object re-parses
    per path). Top-20 events by the extracted value, id tie-break."""
    cat = Catalog(spark, sf_dir)
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (
        cat.events.select("event_id", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .orderBy(F.desc("k"), "event_id")
        .limit(20)
    )


# ---------------------------------------------------------- scalar subquery


@query(
    "orders_above_avg_price",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 4) AS price
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    """,
    tags=("subquery",),
)
def orders_above_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery shape: filter against a whole-table aggregate.
    Expressed as a 1-row aggregate broadcast-joined into the scan (what
    Catalyst plans for an uncorrelated scalar subquery) — the big side
    streams map-only, no shuffle."""
    cat = Catalog(spark, sf_dir)
    avg = cat.orders.agg(F.avg("o_totalprice").alias("__avg"))
    return (
        cat.orders.crossJoin(F.broadcast(avg))
        .filter(F.col("o_totalprice") > F.col("__avg"))
        .select("o_orderkey", F.round("o_totalprice", 4).alias("price"))
    )


# ------------------------------------------------- TPC-H Q13: count distribution
@query(
    "order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "distribution", "tpch_q13"),
)
def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: per-customer order counts (LEFT join with a
    join-side predicate so zero-order customers stay, non-matching
    orders drop) folded into a count-of-counts histogram. Two shuffles
    — (custkey) then (c_count) — both map-side combinable; the
    second aggregation's key space is tiny (max orders per customer),
    so the final exchange is a few hundred rows per executor."""
    cat = Catalog(spark, sf_dir)
    cust = cat.customer.select("c_custkey")
    orders = cat.orders.filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------- TPC-H Q22: anti join + scalar sub
@query(
    "dormant_rich_customers",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS numcust,
           ROUND(SUM(c.c_acctbal), 4) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
            SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
          )
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    tags=("join", "anti", "subquery", "tpch_q22"),
)
def dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no
    URGENT orders (every fixture customer has SOME order, so plain
    no-orders would be vacuously empty), grouped by segment. The
    scalar subquery is a 1-row broadcast; the NOT EXISTS is a
    left_anti join (shuffles only the matching custkeys of orders,
    not the rows); final agg is on a 5-value segment key."""
    cat = Catalog(spark, sf_dir)
    avg_bal = cat.customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    rich = (
        cat.customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
    )
    urgent = cat.orders.filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    dormant = rich.join(
        urgent, rich.c_custkey == urgent.o_custkey, "left_anti"
    )
    return (
        dormant.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------- TPC-H Q16: supplier diversity
@query(
    "supplier_diversity_by_parttype",
    oracle="""
    SELECT p.p_brand, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size IN (1, 2, 3, 4, 5)
      AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
    GROUP BY p.p_brand, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
    """,
    tags=("join", "distinct", "tpch_q16"),
)
def supplier_diversity_by_parttype(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute,
    excluding blacklisted suppliers via NOT IN. The exclusion list is
    a broadcast left_anti join (NOT IN over a non-null key ≡ anti
    join); p_size IN (…) pushes to the part scan; COUNT(DISTINCT)
    expands to the standard two-level aggregate (partial distinct
    map-side, then merge) — the whole query is one fact shuffle."""
    cat = Catalog(spark, sf_dir)
    part = cat.part.filter(F.col("p_size").isin(1, 2, 3, 4, 5)).select(
        "p_partkey", "p_brand", "p_size"
    )
    blacklist = cat.supplier.filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    li = cat.lineitem.select("l_partkey", "l_suppkey").join(
        F.broadcast(blacklist),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_anti",
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


@query(
    "zscore_price_outliers",
    oracle="""
    WITH s AS (
        SELECT p_partkey, p_type, p_retailprice,
               AVG(p_retailprice) OVER (PARTITION BY p_type) AS m,
               STDDEV_SAMP(p_retailprice) OVER (PARTITION BY p_type) AS sd
        FROM part
    )
    SELECT p_partkey, p_type,
           ROUND((p_retailprice - m) / sd, 6) AS z
    FROM s
    WHERE sd != 0 AND ABS((p_retailprice - m) / sd) >= 1.5
    """,
    tags=("window", "outliers", "profiling"),
)
def zscore_price_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group outlier flags: parts whose retail price sits >= 1.5
    sample standard deviations from their type's mean — the data-
    quality screen shape (SURVEY A5 "attach group statistics", via
    ``operators/windows.py::zscore_window``, previously pinned only by
    the window-vs-applyInPandas cross-check; this puts it under the
    DuckDB differential too). One window over the group key; at 100 TB
    the same screen is a two-pass aggregate+broadcast if the group
    count is small enough to broadcast."""
    from ..operators.windows import zscore_window

    cat = Catalog(spark, sf_dir)
    scored = zscore_window(
        cat.part.select("p_partkey", "p_type", "p_retailprice"),
        keys=["p_type"],
        value_col="p_retailprice",
    )
    return (
        scored.filter(F.abs(F.col("z")) >= 1.5)
        .select("p_partkey", "p_type", F.round("z", 6).alias("z"))
    )


@query(
    "click_purchase_attribution_batch",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           epoch_us(c.ts) AS click_us,
           epoch_us(p.ts) AS purchase_us,
           ROUND(p.value, 4) AS purchase_value
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.ts <= p.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
    tags=("streaming", "interval-join", "attribution"),
)
def click_purchase_attribution_batch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The stream-stream interval join (``streaming/ops.py::
    click_purchase_attribution``) under the value-exact differential:
    attribute each purchase to same-user clicks in the preceding
    hour. The SAME operator runs on streams (both sides watermarked,
    state evicted past ts + horizon — pinned against this batch shape
    by ``test_streaming.py``); on batch frames the watermarks are
    no-ops and it plans as a user-keyed join + time-range filter.
    Event times emitted as integer µs (timestamps never cross the
    engine boundary raw)."""
    from ..streaming.ops import click_purchase_attribution

    ev = Catalog(spark, sf_dir).events.withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = click_purchase_attribution(clicks, purchases, horizon="1 hour")
    return out.select(
        "user_id",
        "click_id",
        "purchase_id",
        epoch_us("click_ts").alias("click_us"),
        epoch_us("purchase_ts").alias("purchase_us"),
        "purchase_value",
    )


@query(
    "cohort_retention_weekly",
    oracle="""
    WITH f AS (
        SELECT user_id, MIN(date_trunc('week', ts)) AS cw
        FROM events GROUP BY user_id
    ),
    a AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
    )
    SELECT CAST(f.cw AS DATE) AS cohort_week,
           CAST(datediff('day', f.cw, a.w) / 7 AS INTEGER) AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
    tags=("analytics", "cohort", "retention"),
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users cohorted by the week of their
    FIRST event; each cell counts distinct cohort members active
    week_offset weeks later — the product-analytics staple. Both
    engines truncate weeks to Monday, event time stays integer-safe
    (offsets are day-diffs / 7 on aligned week starts; only DATE and
    ints cross the engine boundary). Plan: two keyed aggregates + one
    user join + one final aggregate — every shuffle on user_id or the
    (cohort, offset) pair, no window, fully parallel at 100 TB (the
    first-seen side is |users| rows; AQE picks the join strategy
    since user count scales with the corpus)."""
    ev = Catalog(spark, sf_dir).events.select(
        "user_id",
        F.date_trunc("week", F.col("ts").cast("timestamp")).alias("w"),
    )
    first = ev.groupBy("user_id").agg(F.min("w").alias("cw"))
    activity = ev.distinct()
    return (
        activity.join(first, on="user_id")
        .groupBy(
            F.col("cw").cast("date").alias("cohort_week"),
            (F.datediff(F.col("w"), F.col("cw")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@query(
    "pareto_part_classes",
    oracle="""
    WITH rev AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS revenue
        FROM lineitem GROUP BY l_partkey
    ),
    c AS (
        SELECT l_partkey, revenue,
               SUM(revenue) OVER (
                   ORDER BY revenue DESC, l_partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum,
               SUM(revenue) OVER () AS total
        FROM rev
    )
    SELECT l_partkey, CAST(revenue AS DECIMAL(28,4)) AS revenue,
           CASE WHEN cum * 100 <= total * 80 THEN 'A'
                WHEN cum * 100 <= total * 95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c
    """,
    tags=("analytics", "pareto", "ranking"),
)
def pareto_part_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC classification: parts ranked by revenue, running
    revenue share cut at 80% (A) and 95% (B) — the inventory-analysis
    staple whose naive plan is the unpartitioned-window cliff. Here
    the global cumulative sum comes from ``operators/windows.py::
    global_running_sum`` (quantile buckets → per-bucket running sum +
    driver-folded offsets — each task sorts one bucket), and every
    monetary value is DECIMAL so partial-sum order cannot move a
    class boundary: cum*100 <= total*80 is exact integer-scaled
    decimal arithmetic in both engines."""
    from .. import cache
    from ..operators.windows import global_running_sum

    cat = Catalog(spark, sf_dir)
    # track: the revenue aggregate feeds FOUR actions (running-sum's
    # quantile job + bucket-count collect, the final plan, and the
    # total agg) — untracked, the lineitem groupBy re-executed per
    # action (r14)
    rev = cache.track(
        cat.lineitem.groupBy("l_partkey").agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias(
                "revenue"
            )
        )
    )
    c = global_running_sum(
        rev,
        value_col="revenue",
        ascending=False,
        tiebreak_cols=["l_partkey"],
        name="cum",
    )
    total = rev.agg(F.sum("revenue").alias("__total"))
    return (
        c.crossJoin(F.broadcast(total))
        .select(
            "l_partkey",
            "revenue",
            F.when(
                F.col("cum") * 100 <= F.col("__total") * 80, "A"
            )
            .when(F.col("cum") * 100 <= F.col("__total") * 95, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH s AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM s WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
    tags=("analytics", "sequence", "markov"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-transition counts (the Markov matrix behind
    path analysis): per user, order events by time and count
    (previous type → next type) pairs. One keyed window (lag over
    user_id — bounded state, no global sort) + one aggregate; the
    (ts, event_id) tiebreak makes the sequence deterministic under
    simultaneous events."""
    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        s.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ------------------------------------------------------------------- funnel


@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS t FROM events
    ),
    v AS (
        SELECT user_id, MIN(t) AS t_view FROM e
        WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
        SELECT e.user_id, MIN(e.t) AS t_click
        FROM e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.t > v.t_view
        GROUP BY 1
    ),
    p AS (
        SELECT e.user_id, MIN(e.t) AS t_purchase
        FROM e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.t > c.t_click
        GROUP BY 1
    )
    SELECT stage, users FROM (
        SELECT 1 AS ord, 'view' AS stage, COUNT(*) AS users FROM v
        UNION ALL
        SELECT 2, 'view>click', COUNT(*) FROM c
        UNION ALL
        SELECT 3, 'view>click>purchase', COUNT(*) FROM p
    ) ORDER BY ord
    """,
    tags=("analytics", "funnel", "sequence"),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users whose earliest view precedes
    a click that precedes a purchase (strict event-time ordering, not
    mere co-occurrence — the sequential-match semantics product
    analytics engines ship as a primitive). Three keyed aggregates
    chained by per-user joins; every timestamp comparison is integer
    microseconds (functions.epoch_us), so both engines order ties
    identically. Scale shape: each stage is one shuffle on user_id
    over an already-reduced per-user frame; the events scan happens
    once per stage with the event_type filter pushed down."""
    ev = Catalog(spark, sf_dir).events.select(
        "user_id", "event_type", epoch_us("ts").alias("t")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("t").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("t") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("t") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_purchase"))
    )
    stages = (
        v.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(1).alias("ord"), F.lit("view").alias("stage"), "users"
        )
        .unionByName(
            c.agg(F.count(F.lit(1)).alias("users")).select(
                F.lit(2).alias("ord"),
                F.lit("view>click").alias("stage"),
                "users",
            )
        )
        .unionByName(
            p.agg(F.count(F.lit(1)).alias("users")).select(
                F.lit(3).alias("ord"),
                F.lit("view>click>purchase").alias("stage"),
                "users",
            )
        )
    )
    return stages.orderBy("ord").select("stage", "users")


# ---------------------------------------------------------- retention cohorts


@query(
    "retention_cohorts_weekly",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type,
               CAST(epoch_us(ts) // (CAST(86400000000 AS BIGINT) * 7)
                    AS BIGINT) AS wk
        FROM events
    ),
    cohort AS (
        SELECT user_id, MIN(wk) AS cohort_wk FROM e
        WHERE event_type = 'signup' GROUP BY 1
    ),
    act AS (SELECT DISTINCT user_id, wk FROM e)
    SELECT c.cohort_wk, CAST(a.wk - c.cohort_wk AS BIGINT) AS week_offset,
           COUNT(DISTINCT a.user_id) AS active_users
    FROM cohort c JOIN act a ON a.user_id = c.user_id
    WHERE a.wk >= c.cohort_wk
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("analytics", "retention", "cohort"),
)
def retention_cohorts_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users bucketed by their first-signup
    week, counted as active in each later week they produced ANY
    event — the classic retention triangle. Weeks are integer
    epoch-microsecond divisions (floor(us / 7 days)), not calendar
    truncation, so both engines bucket identically with no
    week-start/locale semantics in play — and INTEGER division
    (Spark ``div`` == DuckDB ``//`` for non-negative operands; float
    division could round a just-below-integer quotient up and flip a
    bucket). Shape: one per-user min, one distinct on (user, week)
    (both map-side combined), one keyed join + count-distinct
    aggregate."""
    ev = (
        Catalog(spark, sf_dir)
        .events.select("user_id", "event_type", epoch_us("ts").alias("t"))
        .select(
            "user_id",
            "event_type",
            F.expr(f"t div {86400000000 * 7}").cast("bigint").alias("wk"),
        )
    )
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("wk").alias("cohort_wk"))
    )
    act = ev.select("user_id", "wk").distinct()
    return (
        act.join(cohort, "user_id")
        .filter(F.col("wk") >= F.col("cohort_wk"))
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset"))
        .agg(F.count_distinct("user_id").alias("active_users"))
        .select(
            "cohort_wk",
            F.col("week_offset").cast("bigint").alias("week_offset"),
            "active_users",
        )
        .orderBy("cohort_wk", "week_offset")
    )


# ------------------------------------------------------ cumulative distinct


@query(
    "cumulative_distinct_users",
    oracle="""
    WITH e AS (
        SELECT user_id,
               CAST(epoch_us(ts) // CAST(86400000000 AS BIGINT) AS BIGINT)
                   AS day
        FROM events
    ),
    first_seen AS (SELECT user_id, MIN(day) AS d0 FROM e GROUP BY 1),
    per_day AS (
        SELECT d0 AS day, COUNT(*) AS new_users FROM first_seen GROUP BY 1
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (
               ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_users
    FROM per_day
    ORDER BY day
    """,
    tags=("analytics", "distinct", "window"),
)
def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running count of DISTINCT users ever seen, by day — the classic
    growth curve. The naive formulation (count-distinct over an
    expanding window) is O(days × users); this is the scalable
    identity: a user contributes exactly once, on their FIRST day, so
    it reduces to a per-user min (map-side combined), a per-day count,
    and one ordered running sum over the BOUNDED per-day frame (the
    single-task window is safe because its input is |days| rows, not
    |events|). Integer-µs day bucketing (``div``) matches DuckDB
    ``//`` exactly for non-negative epochs."""
    ev = (
        Catalog(spark, sf_dir)
        .events.select("user_id", epoch_us("ts").alias("t"))
        .select(
            "user_id",
            F.expr("t div 86400000000").cast("bigint").alias("day"),
        )
    )
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("d0"))
    per_day = (
        first_seen.groupBy(F.col("d0").alias("day"))
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per_day.select(
            "day",
            "new_users",
            F.sum("new_users").over(w).alias("cum_users"),
        )
        .orderBy("day")
    )


# ------------------------------------------------------ equi-width histogram


@query(
    "histogram_order_prices",
    oracle="""
    WITH b AS (
        SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx
        FROM orders
    )
    SELECT CAST(LEAST(FLOOR((o_totalprice - b.mn)
                            / ((b.mx - b.mn) / 10.0)), 9) AS INTEGER)
               AS bucket,
           COUNT(*) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders CROSS JOIN b
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("analytics", "histogram"),
)
def histogram_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 10-bucket histogram of order prices — the profiling
    primitive behind every catalog's distribution sketch. The [min,
    max] frame is ONE row broadcast onto the scan (the documented
    bounded-BNLJ scalar-attach pattern), bucketing is pure float
    arithmetic on identical doubles in both engines (data-value
    bounds, exact division order), and the top bucket is closed with
    LEAST(…, 9) so x == max lands in bucket 9 rather than a phantom
    bucket 10. One scan + one 10-group aggregate."""
    o = Catalog(spark, sf_dir).orders
    b = F.broadcast(
        o.agg(
            F.min("o_totalprice").alias("mn"),
            F.max("o_totalprice").alias("mx"),
        )
    )
    bucket = F.least(
        F.floor(
            (F.col("o_totalprice") - F.col("mn"))
            / ((F.col("mx") - F.col("mn")) / 10.0)
        ),
        F.lit(9),
    ).cast("int")
    return (
        o.crossJoin(b)
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )
