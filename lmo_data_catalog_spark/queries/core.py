"""Core reference-parity queries (SURVEY §2 / §7 steps 1-3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..operators import filters
from ..operators.joins import natural_join
from ..operators.metrics import cagr_metrics_agg, range_sums_agg
from ..operators.reshape import pivot_years, unpivot_years
from ..registry import query

# Years present in lineitem.l_shipdate at every scale factor.
YEARS = list(range(1995, 2002))

def _revenue():
    # Column exprs must be built lazily: classic PySpark requires an
    # active SparkContext even for plain Column construction.
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _yearly_flag_revenue(cat: Catalog) -> DataFrame:
    """Long-form (grp, year, value): revenue per returnflag per year —
    the TPC-H stand-in for the reference's unpivoted LMO long table.

    MONEY SUMS ARE DECIMAL (the sf1 lesson): the per-row product is a
    double (IEEE-identical in both engines), but it is cast to
    DECIMAL(30,8) before the SUM, making the aggregate EXACT and
    summation-order-free — double sums of ~6M ~1e4-sized terms drift
    past the 4th decimal between engines (seen live at sf1: …611.9824
    vs …611.9825), and no ROUND placement can fix a value that itself
    moved. The double→decimal cast cannot tie (an exact x.xxxxxxxx5
    has a 5^8 denominator, so no double sits on one), hence it is
    deterministic; the rounded result converts back to double for a
    plain output schema. Downstream float arithmetic on these
    now-exact values (lag deltas, ordered running sums, shares at
    6 dp) is drift-free because every operand is identical across
    engines."""
    return (
        cat.lineitem.groupBy(
            F.col("l_returnflag").alias("grp"),
            # bigint, matching DuckDB's year() → BIGINT binding: the
            # r13 width-parity guard (tools/verify_local.py) flags any
            # cross-engine integer-width drift in output schemas.
            F.year("l_shipdate").cast("long").alias("year"),
        )
        .agg(
            F.round(F.sum(_revenue().cast("decimal(30,8)")), 4)
            .cast("double")
            .alias("value")
        )
    )


_YEARLY_FLAG_REVENUE_SQL = """
    SELECT l_returnflag AS grp, year(l_shipdate) AS year,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(30,8))), 4) AS DOUBLE) AS value
    FROM lineitem GROUP BY 1, 2
"""


# ---------------------------------------------------------------- A1: hash agg
@query(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A1", "F1"),
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped sum/avg/count (SURVEY A1; TPC-H Q1 shape).

    Plain hash aggregate: map-side partial agg → single shuffle of
    (group × metric) rows, whole-stage codegen throughout.
    """
    cat = Catalog(spark, sf_dir)
    return (
        cat.lineitem.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(_revenue()), 4).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ------------------------------------------------------- F1/P1/P2: filter+select
@query(
    "filter_project",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(o_orderdate AS DATE) AS order_date,
           ROUND(o_totalprice, 2) AS total_price
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 150000.0
    """,
    tags=("F1", "F5", "P1"),
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive equality/range filter + positive projection
    (SURVEY F1/F5/P1; 01_source_me.R:103,124).

    Both predicates and the 5-column projection push into the parquet
    scan (PushedFilters + ReadSchema pruning).
    """
    cat = Catalog(spark, sf_dir)
    return (
        cat.orders.filter(
            (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000.0)
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.round("o_totalprice", 2).alias("total_price"),
        )
    )


# ---------------------------------------------------------- F2/F3: IN / NOT IN
@query(
    "filter_in_notin",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND NOT (o_orderstatus IN ('P'))
    GROUP BY o_orderpriority
    """,
    tags=("F2", "F3"),
)
def filter_in_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + NOT-IN with R-compatible NULL handling (SURVEY F2/F3;
    01_source_me.R:210,125). NULL statuses would be *kept* by the
    NOT-IN, matching R ``!x %in% set`` (no NULLs in this data, but the
    helper guarantees it)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.orders.filter(filters.isin("o_orderpriority", ["1-URGENT", "2-HIGH"]))
        .filter(filters.not_isin("o_orderstatus", ["P"]))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


# ------------------------------------------------------------- F4: regex filter
@query(
    "filter_not_rlike",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_parts, ROUND(AVG(p_retailprice), 6) AS avg_price
    FROM part
    WHERE NOT regexp_matches(p_type, 'BRASS')
    GROUP BY p_brand
    """,
    tags=("F4",),
)
def filter_not_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative regex filter (SURVEY F4; 01_source_me.R:74
    ``!grepl("Non", get(column))``) with NULL-kept semantics."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.part.filter(filters.not_rlike("p_type", "BRASS"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 6).alias("avg_price"),
        )
    )


# ------------------------------------------------------------------ R2: pivot
@query(
    "pivot_yearly_revenue",
    oracle="""
    SELECT grp, {cols}
    FROM ({long}) long
    GROUP BY grp
    """.format(
        long=_YEARLY_FLAG_REVENUE_SQL,
        cols=", ".join(
            f"ROUND(SUM(CASE WHEN year = {y} THEN value END), 4) AS y{y}"
            for y in YEARS
        ),
    ),
    tags=("R2",),
)
def pivot_yearly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot with explicit value list (SURVEY R2;
    01_source_me.R:108). Explicit ``values`` ⇒ no distinct-discovery
    job and deterministic column order."""
    cat = Catalog(spark, sf_dir)
    long = _yearly_flag_revenue(cat)
    wide = pivot_years(long, ["grp"], YEARS)
    return wide.select(
        "grp", *[F.round(F.col(str(y)), 4).alias(f"y{y}") for y in YEARS]
    )


# ---------------------------------------------------------------- R1: unpivot
@query(
    "unpivot_roundtrip",
    oracle=f"""
    SELECT grp, year, ROUND(value, 4) AS value
    FROM ({_YEARLY_FLAG_REVENUE_SQL}) long
    """,
    tags=("R1",),
)
def unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (SURVEY R1; 01_source_me.R:101): pivot the
    long table wide, then ``unpivot`` back — must equal the direct
    group-by (pivot∘unpivot identity, SURVEY §5.4). Unpivot is a
    narrow Expand node — shuffle-free."""
    cat = Catalog(spark, sf_dir)
    wide = pivot_years(_yearly_flag_revenue(cat), ["grp"], YEARS)
    long = unpivot_years(wide, ["grp"], [str(y) for y in YEARS])
    return long.filter(F.col("value").isNotNull()).select(
        "grp",
        # bigint to match DuckDB's year() binding (r13 width guard)
        F.col("year").cast("long").alias("year"),
        F.round("value", 4).alias("value"),
    )


# -------------------------------------------------------------------- A3: CAGR
@query(
    "cagr_metrics",
    oracle=f"""
    SELECT grp,
           ROUND(POWER(v1 / v0, 1.0/3) - 1, 6) AS cagr_1st,
           ROUND(POWER(v2 / v1, 1.0/3) - 1, 6) AS cagr_2nd,
           ROUND(POWER(v2 / v0, 1.0/6) - 1, 6) AS cagr_full
    FROM (
        SELECT grp,
               MAX(CASE WHEN year = 1995 THEN value END) AS v0,
               MAX(CASE WHEN year = 1998 THEN value END) AS v1,
               MAX(CASE WHEN year = 2001 THEN value END) AS v2
        FROM ({_YEARLY_FLAG_REVENUE_SQL}) long
        GROUP BY grp
    )
    """,
    tags=("A3",),
)
def cagr_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped CAGR triple as conditional aggregates (SURVEY A3;
    01_source_me.R:50-62). One hash-agg shuffle replaces the
    reference's nest→map→unnest scaffold."""
    cat = Catalog(spark, sf_dir)
    long = _yearly_flag_revenue(cat)
    out = cagr_metrics_agg(long, ["grp"], years=(1995, 1998, 2001))
    return out.select(
        "grp",
        *[F.round(c, 6).alias(c) for c in ("cagr_1st", "cagr_2nd", "cagr_full")],
    )


# -------------------------------------------------------------- A4: range sums
@query(
    "range_sums",
    oracle=f"""
    SELECT grp,
           ROUND(SUM(CASE WHEN year BETWEEN 1996 AND 1998 THEN value END), 4) AS sum_1996_1998,
           ROUND(SUM(CASE WHEN year BETWEEN 1999 AND 2001 THEN value END), 4) AS sum_1999_2001,
           ROUND(SUM(CASE WHEN year BETWEEN 1996 AND 2001 THEN value END), 4) AS sum_1996_2001
    FROM ({_YEARLY_FLAG_REVENUE_SQL}) long
    GROUP BY grp
    """,
    tags=("A4",),
)
def range_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed year-range sums (SURVEY A4; 01_source_me.R:63-71):
    both year-band sums as conditional aggregates in ONE pass over
    the unpivoted frame — the reference computes each range in a
    separate mutate; fusing them reads the data once and both
    partials combine map-side."""
    cat = Catalog(spark, sf_dir)
    long = _yearly_flag_revenue(cat)
    out = range_sums_agg(
        long, ["grp"], ranges=[(1996, 1998), (1999, 2001), (1996, 2001)]
    )
    return out.select(
        "grp",
        *[
            F.round(c, 4).alias(c)
            for c in ("sum_1996_1998", "sum_1999_2001", "sum_1996_2001")
        ],
    )


# ------------------------------------------------- A5(b): window metric attach
@query(
    "window_attach_share",
    oracle=f"""
    SELECT grp, year,
           ROUND(value, 4) AS value,
           ROUND(value / SUM(value) OVER (PARTITION BY grp), 6) AS share
    FROM ({_YEARLY_FLAG_REVENUE_SQL}) long
    """,
    tags=("A5", "W"),
)
def window_attach_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach per-group scalars to every row via window partition
    (SURVEY A5 plan b; replaces nest/unnest at 01_source_me.R:104-110).
    One shuffle on the group key, no join."""
    from pyspark.sql import Window

    cat = Catalog(spark, sf_dir)
    long = _yearly_flag_revenue(cat)
    w = Window.partitionBy("grp")
    return long.select(
        "grp",
        "year",
        F.round("value", 4).alias("value"),
        F.round(F.col("value") / F.sum("value").over(w), 6).alias("share"),
    )


# -------------------------------------------------------- J1: natural left join
@query(
    "join_left_natural",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           ROUND(o.total_spent, 2) AS total_spent, o.n_orders
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey AS custkey, SUM(o_totalprice) AS total_spent,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    ) o ON c.c_custkey = o.custkey
    """,
    tags=("J1",),
)
def join_left_natural(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer natural join, keys resolved explicitly (SURVEY J1;
    01_source_me.R:81). Customers without orders keep NULL metrics —
    the reference's unmatched-HOO-row semantics."""
    cat = Catalog(spark, sf_dir)
    left = cat.customer.select(
        F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name")
    )
    right = (
        cat.orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.sum("o_totalprice").alias("total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    joined, keys = natural_join(left, right, "left")
    assert keys == ["custkey"]
    return joined.select(
        "custkey", "name", F.round("total_spent", 2).alias("total_spent"), "n_orders"
    )


# ----------------------------------------- J2/J3: broadcast inner join (+ dims)
@query(
    "join_inner_broadcast",
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region,
           COUNT(*) AS n_customers, ROUND(SUM(c.c_acctbal), 2) AS total_balance
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
    tags=("J2", "J3"),
)
def join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-joins through two broadcast dimensions (SURVEY J2/J3;
    01_source_me.R:339,79-81). Explicit ``F.broadcast`` on both dims:
    the fact table never shuffles for the join."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer.join(
            F.broadcast(cat.nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(F.broadcast(cat.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
    )


# ------------------------------------------------- A6: distinct + sort (dims)
@query(
    "distinct_sorted_dims",
    oracle="""
    SELECT DISTINCT o_orderpriority AS priority FROM orders ORDER BY 1
    """,
    tags=("A6",),
)
def distinct_sorted_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered distinct dimension extraction (SURVEY A6;
    01_source_me.R:189 ``sort(unique(...))``)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.orders.select(F.col("o_orderpriority").alias("priority"))
        .distinct()
        .orderBy("priority")
    )


# ------------------------------- flagship: tbbl10 composite (SURVEY §7 step 1)
@query(
    "flagship_brand_revenue",
    oracle="""
    SELECT '#' || p_brand AS brand_tag,
           split_part(p_type, ' ', 1) AS type_class,
           ROUND(SUM(revenue), 4) AS total_revenue,
           COUNT(*) AS n_parts
    FROM (
        SELECT l_partkey, SUM(l_extendedprice * (1 - l_discount)) AS revenue
        FROM lineitem
        WHERE NOT (l_returnflag IN ('N'))
        GROUP BY l_partkey
    ) r
    JOIN part ON l_partkey = p_partkey
    GROUP BY 1, 2
    """,
    tags=("flagship", "A2", "J2", "R3", "C6", "F3", "P2"),
)
def flagship_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship tbbl10-shaped composite (SURVEY §3 Shape 3;
    01_source_me.R:323-346): filter (F3 not-in) → group-sum (A2) →
    broadcast inner join (J2) → split/concat key prep (R3/C6) →
    aliased re-aggregation (P4).

    Plan shape at scale: lineitem aggregates partially map-side,
    shuffles once on l_partkey; `part` broadcasts; the final
    (brand, type) agg is tiny.
    """
    cat = Catalog(spark, sf_dir)
    rev = (
        cat.lineitem.filter(filters.not_isin("l_returnflag", ["N"]))
        .groupBy("l_partkey")
        .agg(F.sum(_revenue()).alias("revenue"))
    )
    part = cat.part.select(
        "p_partkey",
        "p_brand",
        F.split("p_type", " ", 2).getItem(0).alias("type_class"),
    )
    return (
        rev.join(F.broadcast(part), rev.l_partkey == part.p_partkey, "inner")
        .groupBy(
            F.concat(F.lit("#"), F.col("p_brand")).alias("brand_tag"), "type_class"
        )
        .agg(
            F.round(F.sum("revenue"), 4).alias("total_revenue"),
            F.count(F.lit(1)).alias("n_parts"),
        )
    )
