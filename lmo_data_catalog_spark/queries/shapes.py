"""Decision-support query shapes (TPC-H Q2/Q4/Q7/Q8/Q12/Q14/Q15/Q17/
Q18/Q19/Q20/Q21 analogues over the testdata schema) plus corpus-statistics pipeline ops
(PMI collocations, per-label embedding centroids).

Reference status: extension surface. The reference
(01_source_me.R:1-346) is a fixed catalog build; these shapes cover the
ad-hoc analytics a user of that catalog would run next — correlated
scalar subqueries, disjunctive pushdown, conditional aggregation,
argmax-per-group — each as the Catalyst plan you would want at 100 TB
(broadcast dims, partial aggregation, one keyed shuffle).

Same conventions as ``queries.core``: every computed column aliased
identically in Spark and oracle SQL; monetary sums rounded at 4 dp
(the data's decimal granularity — note the parquet stores prices as
float64, so where a rounded sum feeds an EQUALITY or RANKING the sum
is first done in DECIMAL to make it summation-order-independent, see
``top_revenue_supplier`` / ``customer_rfm_segments``);
ratios/averages/logs at 6 dp; no raw timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import cache
from ..catalog import Catalog
from ..operators.text import tokens
from ..operators.windows import global_row_numbers
from ..registry import query

_REV = "l_extendedprice * (1 - l_discount)"


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ----------------------------------------------------------- Q14: promo share


@query(
    "promo_revenue_share",
    oracle=f"""
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN {_REV} ELSE 0 END)
                   / SUM({_REV}), 6) AS promo_share
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= DATE '1997-09-01'
      AND l_shipdate <  DATE '1997-10-01'
    """,
    tags=("analytic", "conditional-agg"),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue as a share of one month's total.
    One broadcast join (part is a dim), one map-side conditional
    aggregation — the shipdate band prunes the fact scan, so at scale
    this reads one month of partitions, not the table."""
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.filter(
        (F.col("l_shipdate") >= "1997-09-01")
        & (F.col("l_shipdate") < "1997-10-01")
    )
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(cat.part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(_rev()), 6).alias(
                "promo_share"
            )
        )
    )


# ------------------------------------------- Q17: correlated-average subquery


@query(
    "small_qty_avg_revenue",
    oracle=f"""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) / 7.0, 6) AS avg_weekly_revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#13'
      AND l_quantity < (
        SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
    tags=("analytic", "correlated-subquery"),
)
def small_qty_avg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-half-average-quantity
    lineitems of one brand. The correlated AVG decorrelates into a
    per-part aggregate joined back: the brand filter shrinks part to a
    broadcastable set, the per-part averages are a partial agg over
    only the matching fact rows, and that (tiny) aggregate broadcasts
    back onto the same rows — no repeated fact scan, no shuffle join.
    """
    cat = Catalog(spark, sf_dir)
    pr = cat.part.filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    li = cat.lineitem.join(
        F.broadcast(pr), F.col("l_partkey") == F.col("p_partkey")
    )
    part_avg = li.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("__half_avg")
    ).withColumnRenamed("l_partkey", "__pk")
    return (
        li.join(F.broadcast(part_avg), F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("__half_avg"))
        .agg(
            # decimal money sum (sf1 lesson, core._yearly_flag_revenue)
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(30,8)"))
                .cast("double")
                / 7.0,
                6,
            ).alias("avg_weekly_revenue")
        )
    )


# ------------------------------------------------- Q18: large-volume orders


@query(
    "large_order_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           ROUND(o_totalprice, 2) AS total_price,
           ROUND(big.total_qty, 2) AS total_qty
    FROM customer, orders,
         (SELECT l_orderkey, SUM(l_quantity) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(l_quantity) > 250) big
    WHERE o_orderkey = big.l_orderkey AND c_custkey = o_custkey
    ORDER BY total_price DESC, o_orderkey
    LIMIT 20
    """,
    tags=("analytic", "having"),
)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind the largest-volume orders.
    The HAVING aggregate runs first (map-side partial sums, one keyed
    shuffle) and survives as a SMALL frame — that selective frame is
    the only explicit broadcast. customer scales with SF, so it gets
    no hint: after the broadcast-big join the surviving orders frame
    is tiny and AQE picks the right side at runtime; forcing
    broadcast(customer) would OOM executors at 100 TB."""
    cat = Catalog(spark, sf_dir)
    big = (
        cat.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        cat.orders.join(
            F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey")
        )
        .join(cat.customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.round("o_totalprice", 2).alias("total_price"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.col("total_price").desc(), "o_orderkey")
        .limit(20)
    )


# --------------------------------------------- Q19: disjunctive predicates


@query(
    "disjunctive_brand_revenue",
    oracle=f"""
    SELECT ROUND(SUM({_REV}), 4) AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#1'  AND p_size BETWEEN 1  AND 15
            AND l_quantity BETWEEN 1  AND 20)
        OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30
            AND l_quantity BETWEEN 10 AND 35)
        OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50
            AND l_quantity BETWEEN 20 AND 50))
    """,
    tags=("analytic", "disjunctive-pushdown"),
)
def disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs over both join sides. Catalyst
    extracts the common single-side conjuncts from the disjunction
    (brand/size reach the part scan, quantity bounds reach the
    lineitem scan as `l_quantity >= 1 AND <= 50`) so both scans prune
    before the broadcast join evaluates the full residual."""
    cat = Catalog(spark, sf_dir)
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    ) | (
        (F.col("p_brand") == "Brand#20")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 50)
    )
    return (
        cat.lineitem.join(
            F.broadcast(cat.part), F.col("p_partkey") == F.col("l_partkey")
        )
        .filter(cond)
        .agg(F.round(F.sum(_rev()), 4).alias("revenue"))
    )


# ------------------------------------------------ Q12: priority line counts


@query(
    "returnflag_priority_mix",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= DATE '1998-01-01'
      AND l_shipdate <  DATE '1999-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("analytic", "conditional-agg"),
)
def returnflag_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: high/low-priority line counts per category.
    Both sides are facts: at test SF the one-year shipdate band
    shrinks lineitem under the broadcast threshold (plan shows BHJ);
    at 100 TB AQE keeps it a sort-merge join on orderkey — the size
    decision is deliberately left to the optimizer, not hinted. The
    CASE counts are map-side partial aggregates after the join."""
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.filter(
        (F.col("l_shipdate") >= "1998-01-01")
        & (F.col("l_shipdate") < "1999-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        cat.orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------- Q15: top supplier(s)


@query(
    "top_revenue_supplier",
    oracle="""
    WITH srev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(6,4))) AS rev_dec
      FROM lineitem
      WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(ROUND(rev_dec, 4) AS DOUBLE) AS total_revenue
    FROM supplier, srev
    WHERE s_suppkey = l_suppkey
      AND rev_dec = (SELECT MAX(rev_dec) FROM srev)
    ORDER BY s_suppkey
    """,
    tags=("analytic", "scalar-subquery"),
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the quarter's max revenue.
    The revenue view is one keyed shuffle; the scalar MAX is an
    aggregate of that already-small frame, broadcast back as a 1-row
    cross join (never a global sort). The parquet stores prices as
    float64, so the per-supplier revenue is summed in DECIMAL (exact,
    summation-order-independent in BOTH engines) and the max-equality
    selection happens on the decimal — a double sum rounded to 4 dp
    can flip at a rounding boundary under cross-engine/partition
    summation-order differences and change the selected row set. The
    decimal is cast back to double only for output."""
    cat = Catalog(spark, sf_dir)
    rev_dec = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(6,4)")
    srev = (
        cat.lineitem.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy("l_suppkey")
        .agg(F.sum(rev_dec).alias("__rev_dec"))
    )
    mx = srev.agg(F.max("__rev_dec").alias("__mx"))
    return (
        srev.join(F.broadcast(mx))
        .filter(F.col("__rev_dec") == F.col("__mx"))
        .join(
            F.broadcast(cat.supplier), F.col("s_suppkey") == F.col("l_suppkey")
        )
        .select(
            "s_suppkey",
            "s_name",
            F.round("__rev_dec", 4).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ----------------------------------------- Q2 shape: argmax within group


@query(
    "best_supplier_per_parttype",
    oracle="""
    SELECT p_type, s_suppkey, s_name, ROUND(s_acctbal, 2) AS acctbal
    FROM (
      SELECT DISTINCT p_type, s_suppkey, s_name, s_acctbal,
             ROW_NUMBER() OVER (
               PARTITION BY p_type ORDER BY s_acctbal DESC, s_suppkey
             ) AS rk
      FROM (SELECT DISTINCT p_type, s_suppkey, s_name, s_acctbal
            FROM lineitem, part, supplier
            WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey)
    ) WHERE rk = 1
    ORDER BY p_type
    """,
    tags=("analytic", "argmax"),
)
def best_supplier_per_parttype(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (argmax-per-group): for each part type, the
    highest-acctbal supplier that has actually shipped it. The fact
    join contracts to DISTINCT (type, supplier) pairs — a frame of
    |types|×|suppliers| at most, tiny at any scale — before the window
    runs, so the rank sort never touches fact-table cardinality."""
    cat = Catalog(spark, sf_dir)
    pairs = (
        cat.lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(cat.part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(cat.supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .select("p_type", "s_suppkey", "s_name", "s_acctbal")
        .distinct()
    )
    w = Window.partitionBy("p_type").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "p_type",
            "s_suppkey",
            "s_name",
            F.round("s_acctbal", 2).alias("acctbal"),
        )
        .orderBy("p_type")
    )


# ------------------------------------------- Q20 shape: volume-gated semi


@query(
    "overcommitted_suppliers",
    oracle="""
    SELECT s_suppkey, s_name, ROUND(vol.total_qty, 2) AS total_qty
    FROM supplier,
         (SELECT l_suppkey, SUM(l_quantity) AS total_qty
          FROM lineitem, part
          WHERE l_partkey = p_partkey
            AND p_name LIKE 'small %'
            AND l_shipdate >= DATE '1998-01-01'
            AND l_shipdate <  DATE '1999-01-01'
          GROUP BY l_suppkey
          HAVING SUM(l_quantity) > 100) vol
    WHERE s_suppkey = vol.l_suppkey
    ORDER BY s_suppkey
    """,
    tags=("analytic", "having"),
)
def overcommitted_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved an outsized volume of one
    part family in a year. Part prefilter broadcasts into the pruned
    fact scan; the volume gate is a partial-agg HAVING; the supplier
    dim joins the surviving handful of keys."""
    cat = Catalog(spark, sf_dir)
    pr = cat.part.filter(F.col("p_name").like("small %")).select("p_partkey")
    vol = (
        cat.lineitem.filter(
            (F.col("l_shipdate") >= "1998-01-01")
            & (F.col("l_shipdate") < "1999-01-01")
        )
        .join(F.broadcast(pr), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 100)
    )
    return (
        cat.supplier.join(
            F.broadcast(vol), F.col("s_suppkey") == F.col("l_suppkey")
        )
        .select(
            "s_suppkey", "s_name", F.round("total_qty", 2).alias("total_qty")
        )
        .orderBy("s_suppkey")
    )


# --------------------------------------------- corpus PMI collocations


@query(
    "bigram_pmi_topk",
    oracle=r"""
    WITH toks AS (
      SELECT string_split_regex(lower(trim(text)), '\s+') AS w FROM documents
    ),
    uni AS (
      SELECT word, COUNT(*) AS c_w
      FROM (SELECT unnest(w) AS word FROM toks) GROUP BY word
    ),
    bg AS (
      SELECT bigram, COUNT(*) AS c_ab
      FROM (
        SELECT unnest(list_transform(range(1, len(w)),
                                     i -> w[i] || ' ' || w[i + 1])) AS bigram
        FROM toks
      ) GROUP BY bigram
    ),
    tot AS (
      SELECT (SELECT SUM(c_w) FROM uni) AS n_uni,
             (SELECT SUM(c_ab) FROM bg) AS n_bg
    )
    SELECT bigram, CAST(c_ab AS BIGINT) AS pair_count,
           ROUND(LN(((CAST(c_ab AS DOUBLE) / n_bg)
                     / (CAST(u1.c_w AS DOUBLE) / n_uni))
                    / (CAST(u2.c_w AS DOUBLE) / n_uni)), 6) AS pmi
    FROM bg, tot,
         uni u1, uni u2
    WHERE u1.word = string_split(bigram, ' ')[1]
      AND u2.word = string_split(bigram, ' ')[2]
      AND c_ab >= 3
    ORDER BY pmi DESC, bigram
    LIMIT 20
    """,
    tags=("llm", "collocation"),
)
def bigram_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocations (Church & Hanks 1990)
    over the corpus: PMI(a,b) = ln(p(ab) / (p(a)p(b))) with a
    min-support gate. Tokenize ONCE per document (projected column —
    not re-split per element), bigram via transform/slice, then two
    corpus-count aggregations. The unigram vocabulary grows with the
    corpus, so the two w1/w2 joins carry NO broadcast hint — they
    hash-shuffle on word, and AQE broadcasts at runtime when the
    vocab is actually small; only the 1-row corpus totals are hinted.
    The float expression is parenthesized identically in both engines
    so the doubles match bit-for-bit before rounding."""
    return pmi_topk(Catalog(spark, sf_dir).documents)


def pmi_topk(
    docs: DataFrame, *, min_count: int = 3, k: int = 20
) -> DataFrame:
    """PMI collocation plan (see :func:`bigram_pmi_topk`;
    parameterized for the scaling probe)."""
    toks = docs.select(tokens("text").alias("__toks"))
    uni = (
        toks.select(F.explode("__toks").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("c_w"))
    )
    bigrams = toks.select(
        F.when(
            F.size("__toks") >= 2,
            F.expr(
                "transform(sequence(0, size(__toks) - 2),"
                " i -> concat_ws(' ', slice(__toks, i + 1, 2)))"
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("__bgs")
    )
    bg = (
        bigrams.select(F.explode_outer("__bgs").alias("bigram"))
        .where(F.col("bigram").isNotNull())
        .groupBy("bigram")
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    n_uni = uni.agg(F.sum("c_w").alias("n_uni"))
    n_bg_all = (
        bigrams.select(
            F.sum(F.size("__bgs")).alias("n_bg")
        )
    )
    parts = F.split(F.col("bigram"), " ")
    u1 = uni.select(
        F.col("word").alias("__w1"), F.col("c_w").alias("__c1")
    )
    u2 = uni.select(
        F.col("word").alias("__w2"), F.col("c_w").alias("__c2")
    )
    pmi = F.log(
        (
            (F.col("c_ab").cast("double") / F.col("n_bg"))
            / (F.col("__c1").cast("double") / F.col("n_uni"))
        )
        / (F.col("__c2").cast("double") / F.col("n_uni"))
    )
    return (
        bg.withColumn("__w1", parts.getItem(0))
        .withColumn("__w2", parts.getItem(1))
        # u1/u2 are the full unigram vocabulary — it grows with the
        # corpus, so no broadcast hint: the joins hash-shuffle on word
        # (or AQE broadcasts at runtime when the vocab happens to be
        # small). Only the two 1-row scalar frames are hinted.
        .join(u1, "__w1")
        .join(u2, "__w2")
        .join(F.broadcast(n_uni))
        .join(F.broadcast(n_bg_all))
        .select(
            "bigram",
            F.col("c_ab").alias("pair_count"),
            F.round(pmi, 6).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "bigram")
        .limit(k)
    )


# ------------------------------------------- embedding centroids by label


@query(
    "embedding_centroid_by_label",
    oracle="""
    SELECT label, dim, ROUND(AVG(e), 6) AS centroid_val
    FROM (
      SELECT label, unnest(embedding) AS e,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings
    )
    GROUP BY label, dim
    ORDER BY label, dim
    """,
    tags=("llm", "embedding"),
)
def embedding_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding centroids — the building block for IVF
    coarse quantizers, class prototypes, and drift monitors. posexplode
    fans each vector into (label, dim, value) rows and one keyed
    shuffle on (label, dim) averages them; partial aggregation means
    each executor ships |labels|×|dims| partial sums, not its vectors.
    Emitted exploded (row per dimension) rather than re-assembled into
    arrays so the differential gate compares scalars, not float lists.
    """
    cat = Catalog(spark, sf_dir)
    return (
        cat.embeddings.select(
            "label", F.posexplode("embedding").alias("pos", "e")
        )
        .groupBy(
            "label",
            # bigint: duck generate_subscripts binds BIGINT (r13 guard)
            (F.col("pos") + 1).cast("long").alias("dim"),
        )
        .agg(F.round(F.avg("e"), 6).alias("centroid_val"))
        .orderBy("label", "dim")
    )


# --------------------------------------- rolling distinct: exact baseline


@query(
    "trailing_7d_distinct_users",
    oracle="""
    SELECT d.day, COUNT(DISTINCT p.user_id) AS distinct_users
    FROM (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events) d,
         (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events) p
    WHERE p.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    ORDER BY d.day
    """,
    tags=("rolling", "distinct"),
)
def trailing_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day — rolling COUNT(DISTINCT),
    which no window frame can express (DISTINCT is not frame-
    decomposable). Exact plan: contract events to distinct (day, user)
    pairs first (one keyed shuffle that shrinks the fact to its
    information content), then fan each pair into ≤7 spine days via a
    broadcast range join on the tiny day spine, then count distinct per
    day. The fan-out is bounded by the window length, never by the
    table. For unbounded horizons at 100 TB, the sketch variant
    (``weekly_distinct_via_sketches``) replaces the fan-out with
    mergeable per-day HLL state."""
    return trailing_distinct_users(Catalog(spark, sf_dir).events)


def trailing_distinct_users(
    ev: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    days: int = 7,
) -> DataFrame:
    """Exact trailing-``days`` distinct users per day (plan described
    in :func:`trailing_7d_distinct_users`; parameterized for the
    scaling probe)."""
    pairs = ev.select(
        F.col(ts_col).cast("date").alias("pday"), user_col
    ).distinct()
    spine = pairs.select(F.col("pday").alias("day")).distinct()
    return (
        pairs.join(
            F.broadcast(spine),
            (F.col("pday") >= F.date_sub(F.col("day"), days - 1))
            & (F.col("pday") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.count_distinct(user_col).alias("distinct_users"))
        .orderBy("day")
    )


# ------------------------------------ rolling distinct: mergeable sketches


@query(
    "weekly_distinct_via_sketches",
    oracle="""
    SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS sketch_ok
    FROM events
    GROUP BY week
    ORDER BY week
    """,
    tags=("sketch", "hll", "rolling"),
)
def weekly_distinct_via_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly distinct users computed by MERGING per-day Datasketches
    HLL sketches (``hll_sketch_agg`` per day → ``hll_union_agg`` per
    week) — the re-aggregation property that makes rolling/cumulative
    distinct tractable at 100 TB: daily sketches are built once
    (map-side combinable, kilobytes each) and any horizon — week,
    month, trailing-k — is a union of stored sketches, never a rescan
    of raw IDs. Emits the exact count plus sketch_ok = the merged
    estimate landing within 5% of exact; the oracle emits literal
    TRUE, so the hash gate certifies the bound (same pattern as
    ``approx_distinct_bounded``)."""
    ev = Catalog(spark, sf_dir).events
    daily = (
        ev.select(
            F.date_trunc("week", "ts").cast("date").alias("week"),
            F.col("ts").cast("date").alias("day"),
            "user_id",
        )
        .groupBy("week", "day")
        .agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    )
    merged = daily.groupBy("week").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("__est")
    )
    exact = (
        ev.groupBy(F.date_trunc("week", "ts").cast("date").alias("week"))
        .agg(F.count_distinct("user_id").alias("exact_users"))
    )
    return (
        exact.join(merged, "week")
        .select(
            "week",
            "exact_users",
            (
                F.abs(F.col("__est").cast("double") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("sketch_ok"),
        )
        .orderBy("week")
    )


# ----------------------------------- fuzzy join via deletion-neighborhood


@query(
    "fuzzy_name_pairs_sym_delete",
    oracle="""
    SELECT a.p_name AS name_a, b.p_name AS name_b
    FROM (SELECT DISTINCT p_name FROM part) a,
         (SELECT DISTINCT p_name FROM part) b
    WHERE a.p_name < b.p_name AND levenshtein(a.p_name, b.p_name) = 1
    ORDER BY name_a, name_b
    """,
    tags=("fuzzy", "similarity-join"),
)
def fuzzy_name_pairs_sym_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 string pairs WITHOUT the all-pairs cross join,
    via SymSpell-style deletion neighborhoods (Garbe's symmetric
    delete): every string emits itself plus each single-character
    deletion as blocking keys; any two strings at Levenshtein ≤ 1
    (insert/delete/substitute) provably share a key, so candidates
    come from a linear equi-join on the key — |s|+1 keys per string —
    and the exact distance check runs on candidates only. The oracle
    is the brute-force O(n²) cross join, so the hash gate proves the
    blocking loses nothing. Same candidate-then-verify shape as the
    MinHash-LSH dedup path."""
    names = Catalog(spark, sf_dir).part.select("p_name").distinct()
    keys = names.select(
        "p_name",
        F.explode(
            F.expr(
                "array_union(array(p_name),"
                " transform(sequence(1, length(p_name)),"
                " i -> concat(substring(p_name, 1, i - 1),"
                "             substring(p_name, i + 1))))"
            )
        ).alias("k"),
    )
    a = keys.toDF("name_a", "k")
    b = keys.toDF("name_b", "k")
    return (
        a.join(b, "k")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
        .filter(F.levenshtein("name_a", "name_b") == 1)
        .orderBy("name_a", "name_b")
    )


# --------------------------------------------- argmax aggregation (max_by)


@query(
    "latest_event_per_user_maxby",
    oracle="""
    SELECT user_id, event_id, event_type, ROUND(value, 4) AS value,
           CAST(ts AS DATE) AS last_day
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id
    """,
    tags=("argmax", "agg"),
)
def latest_event_per_user_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user as ONE ``max_by`` aggregation — no window,
    no self-join. The (ts, event_id) struct is the deterministic
    ordering key; max_by is map-side combinable, so each executor
    ships one candidate row per user instead of sorting its partition
    of the full history (the window row_number plan the oracle uses).
    At 100 TB this is the difference between a combine-style shuffle
    of |users| rows and a full-table sort."""
    ev = Catalog(spark, sf_dir).events
    picked = ev.groupBy("user_id").agg(
        F.max_by(
            F.struct("event_id", "event_type", "value", "ts"),
            F.struct("ts", "event_id"),
        ).alias("__s")
    )
    return picked.select(
        "user_id",
        F.col("__s.event_id").alias("event_id"),
        F.col("__s.event_type").alias("event_type"),
        F.round("__s.value", 4).alias("value"),
        F.col("__s.ts").cast("date").alias("last_day"),
    ).orderBy("user_id")


# ------------------------------------------------ Q9 shape: profit rollup


@query(
    "product_profit_by_nation_year",
    oracle="""
    SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)
                     - p_retailprice * l_quantity * 0.01), 4) AS profit
    FROM lineitem, part, supplier, orders, nation
    WHERE l_partkey = p_partkey
      AND l_suppkey = s_suppkey
      AND l_orderkey = o_orderkey
      AND s_nationkey = n_nationkey
      AND p_name LIKE '%gear%'
    GROUP BY n_name, o_year
    ORDER BY n_name, o_year
    """,
    tags=("analytic", "multi-join"),
)
def product_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per nation per year over a part-name
    filter — two facts (lineitem, orders) and three dims. The name
    filter contracts part FIRST (broadcast), so only matching
    lineitems survive to the orders join; supplier and nation
    broadcast. The one repartitioning shuffle is lineitem⨝orders on
    orderkey; the rollup agg is map-side partial. Profit uses a
    retail-cost proxy (the schema has no ps_supplycost); every addend
    is a 4-dp decimal, so the 4-dp round sits on a representable
    point, never a tie."""
    cat = Catalog(spark, sf_dir)
    pr = cat.part.filter(F.col("p_name").like("%gear%")).select(
        "p_partkey", "p_retailprice"
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * 0.01
    return (
        cat.lineitem.join(
            F.broadcast(pr), F.col("l_partkey") == F.col("p_partkey")
        )
        .join(F.broadcast(cat.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cat.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name",
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 4).alias("profit"))
        .orderBy("n_name", "o_year")
    )


# ------------------------------------------- Q10: returned-item losses


@query(
    "returned_item_losses",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate >= DATE '1997-01-01'
      AND o_orderdate <  DATE '1997-04-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("analytic", "multi-join"),
)
def returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers who returned the most revenue in a
    quarter. The quarter band prunes orders, the returnflag filter
    prunes lineitem (both pushed to the scans); nation (25 rows,
    SF-invariant) broadcasts by hint, customer (scales with SF) is
    left to AQE — the quarter-pruned join output it meets is small,
    but a forced broadcast of an SF-scaled table breaks at 100 TB;
    top-k is TakeOrderedAndProject — no global sort."""
    cat = Catalog(spark, sf_dir)
    orders = cat.orders.filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-04-01")
    )
    li = cat.lineitem.filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cat.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_rev()), 4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ------------------------------------------------ collect_set aggregation


@query(
    "customer_priority_profile",
    oracle="""
    SELECT o_custkey,
           string_agg(DISTINCT o_orderpriority, ','
                      ORDER BY o_orderpriority) AS priorities,
           CAST(COUNT(DISTINCT o_orderpriority) AS INTEGER) AS n_priorities,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
    tags=("array-agg", "collect_set"),
)
def customer_priority_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-valued aggregation: the distinct order priorities each
    customer has used, as a SORTED joined string —
    ``array_sort(collect_set(...))`` makes the inherently unordered
    set deterministic, and emitting it joined keeps the differential
    compare scalar. collect_set is map-side combinable (partial sets
    merge), so the shuffle carries per-customer sets, not order rows.
    """
    return (
        Catalog(spark, sf_dir)
        .orders.groupBy("o_custkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("o_orderpriority")), ","
            ).alias("priorities"),
            F.size(F.collect_set("o_orderpriority")).alias("n_priorities"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("o_custkey")
    )


# --------------------------------------- temporal point-in-interval join


@query(
    "purchase_state_at_time",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM events WHERE event_type IN ('signup', 'error')
    )
    SELECT p.event_id, p.user_id, iv.state,
           epoch_us(iv.valid_from) AS state_since_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p, iv
    WHERE p.user_id = iv.user_id
      AND p.ts >= iv.valid_from
      AND (iv.valid_to IS NULL OR p.ts < iv.valid_to)
    ORDER BY p.event_id
    """,
    tags=("temporal", "scd2", "range-join"),
)
def purchase_state_at_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 read path: join each purchase to the state interval
    containing its timestamp (point-in-interval temporal join). The
    interval table is built with LEAD over the state-change stream
    (the write side `event_validity_intervals` produces); the join
    carries the user equi-key so Catalyst plans a hash join with the
    interval bounds as residual — never a cartesian product. At scale
    both sides hash-partition on user_id and each probe row scans only
    its user's handful of intervals."""
    from ..functions import epoch_us

    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = (
        ev.filter(F.col("event_type").isin("signup", "error"))
        .withColumn("valid_to", F.lead("ts").over(w))
        .select(
            F.col("user_id").alias("iv_user"),
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            "valid_to",
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    joined = purchases.join(
        iv,
        (F.col("user_id") == F.col("iv_user"))
        & (F.col("p_ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("p_ts") < F.col("valid_to"))),
    )
    return joined.select(
        "event_id",
        "user_id",
        "state",
        epoch_us("valid_from").alias("state_since_us"),
    ).orderBy("event_id")


# ----------------------------------------------------- RFM segmentation


@query(
    "customer_rfm_segments",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                       (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders))
               AS recency_days,
             COUNT(*) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT *,
        ROW_NUMBER() OVER (ORDER BY recency_days, o_custkey) AS r_rn,
        ROW_NUMBER() OVER (ORDER BY frequency DESC, o_custkey) AS f_rn,
        ROW_NUMBER() OVER (ORDER BY monetary DESC, o_custkey) AS m_rn,
        COUNT(*) OVER () AS n
      FROM rfm
    )
    SELECT o_custkey, CAST(recency_days AS BIGINT) AS recency_days,
           CAST(frequency AS BIGINT) AS frequency,
           CAST(ROUND(monetary, 2) AS DOUBLE) AS monetary,
           CAST((r_rn - 1) * 4 // n + 1 AS INTEGER) AS r_seg,
           CAST((f_rn - 1) * 4 // n + 1 AS INTEGER) AS f_seg,
           CAST((m_rn - 1) * 4 // n + 1 AS INTEGER) AS m_seg
    FROM ranked
    """,
    tags=("analytic", "segmentation", "global-rank"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency/frequency/monetary) customer segmentation with
    EXACT global quartiles — and no global window sort. Each dimension
    is ranked by ``operators.windows.global_row_number`` (approx-
    quantile buckets + per-bucket row_number + broadcast offsets; bit-
    identical to the single-task window), and the quartile is the
    explicit arithmetic ``(rank-1)*4 div N + 1`` in BOTH engines, so
    no NTILE tie-splitting semantics are in play. The aggregate frame
    is |customers| rows; the three rank passes each sort 1/32nd of it
    per task. The corpus-max order date is a 1-row broadcast."""
    cat = Catalog(spark, sf_dir)
    mx = cat.orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("__mxd")
    )
    rfm = (
        cat.orders.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("__last"),
            F.count("*").alias("frequency"),
            # DECIMAL sum: the monetary RANKING must not depend on
            # double summation order (cross-engine/partition ulp drift
            # could flip near-tied customers' ranks)
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "monetary"
            ),
        )
        .join(F.broadcast(mx))
        .select(
            "o_custkey",
            F.datediff("__mxd", "__last").cast("bigint").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    # the multi-ordering ranker needs only TWO driver actions for all
    # three dimensions (one multi-column quantile job + one
    # grouping-sets bucket count); persist the aggregate so both run
    # off cached rows instead of re-scanning orders
    rfm = cache.track(rfm)
    ranked = global_row_numbers(
        rfm,
        [
            ("recency_days", True, "__r_rn"),
            ("frequency", False, "__f_rn"),
            ("monetary", False, "__m_rn"),
        ],
        tiebreak_cols=["o_custkey"],
        total_col="__n",
    )

    def seg(rn: str) -> F.Column:
        # integer `div`, not float `/`+cast: float truncation could
        # land 3.9999… in the wrong quartile at a boundary
        return (F.expr(f"({rn} - 1L) * 4L div __n") + 1).cast("int")

    return ranked.select(
        "o_custkey",
        "recency_days",
        "frequency",
        F.round("monetary", 2).cast("double").alias("monetary"),
        seg("__r_rn").alias("r_seg"),
        seg("__f_rn").alias("f_seg"),
        seg("__m_rn").alias("m_seg"),
    )


# ------------------------------------------------- Q4: late-order priorities

_DEC_REV = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * CAST(1 - l_discount AS DECIMAL(6,4))"
)


@query(
    "late_order_priority_counts",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= DATE '1997-01-01'
      AND o.o_orderdate <  DATE '1997-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("analytic", "semi-join"),
)
def late_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted: this schema has no commitdate, so
    "late" = a lineitem shipped >90 days after the order date): how
    many of a quarter's orders, per priority, had a late shipment.
    The EXISTS is a left-semi join on orderkey with the lateness
    predicate as a join-side condition — Spark hash-semi-joins on the
    equi part and applies the date filter inside the join, never
    materializing the match multiplicity. The quarter filter prunes
    the orders scan before the join at any scale.
    """
    cat = Catalog(spark, sf_dir)
    orders = cat.orders.filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-04-01")
    )
    li = cat.lineitem.select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------- Q7: nation-pair trade volume


@query(
    "nation_pair_trade_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(ROUND(SUM(volume), 4) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               EXTRACT(year FROM l.l_shipdate) AS l_year,
               {_DEC_REV} AS volume
        FROM supplier s, lineitem l, orders o, customer c,
             nation n1, nation n2
        WHERE s.s_suppkey = l.l_suppkey
          AND o.o_orderkey = l.l_orderkey
          AND c.c_custkey = o.o_custkey
          AND s.s_nationkey = n1.n_nationkey
          AND c.c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("analytic", "multi-join"),
)
def nation_pair_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: yearly shipping volume between two nations in
    both directions. The 25-row nation dim is broadcast onto supplier
    and customer FIRST, shrinking both to the two relevant nations
    before any fact join; the cross-nation disjunction (which couples
    the two sides) is applied after the last keyed join, when every
    surviving row already belongs to the 2×2 nation candidate set.
    Revenue summed in DECIMAL (exact, order-independent), cast to
    double only for output — the shapes.py monetary convention.
    """
    cat = Catalog(spark, sf_dir)
    pair = ("NATION_1", "NATION_2")
    nat = cat.nation.filter(F.col("n_name").isin(*pair))
    supp = (
        cat.supplier.join(
            F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        cat.customer.join(
            F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    vol = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(6,4)")
    )
    joined = (
        cat.lineitem.join(
            supp, F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            (
                (F.col("supp_nation") == pair[0])
                & (F.col("cust_nation") == pair[1])
            )
            | (
                (F.col("supp_nation") == pair[1])
                & (F.col("cust_nation") == pair[0])
            )
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            # bigint: duck year() binds BIGINT (r13 width guard)
            F.year("l_shipdate").cast("long").alias("l_year"),
            vol.alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(F.sum("volume"), 4).cast("double").alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ----------------------------------------------------- Q8: market share


@query(
    "nation_market_share",
    oracle=f"""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
        SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
               {_DEC_REV} AS volume,
               n2.n_name AS nation
        FROM part p, lineitem l, orders o, customer c, supplier s,
             nation n1, region r, nation n2
        WHERE p.p_partkey = l.l_partkey
          AND l.l_orderkey = o.o_orderkey
          AND o.o_custkey = c.c_custkey
          AND c.c_nationkey = n1.n_nationkey
          AND n1.n_regionkey = r.r_regionkey
          AND r.r_name = 'AMERICA'
          AND s.s_suppkey = l.l_suppkey
          AND s.s_nationkey = n2.n_nationkey
          AND p.p_type = 'PROMO'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("analytic", "multi-join"),
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's yearly share of the PROMO-part
    market sold into AMERICA-region customers. An 8-table join where
    plan order is the whole game: part is filtered to one type and
    joined FIRST (it prunes the fact hardest), the region→nation
    customer gate and the supplier→nation attach use broadcast of the
    non-scaling dims, and the share is one conditional aggregation
    over the surviving rows. DECIMAL volume; double only at the final
    division.
    """
    cat = Catalog(spark, sf_dir)
    nat = cat.nation
    amer_nations = nat.join(
        F.broadcast(cat.region.filter(F.col("r_name") == "AMERICA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select(F.col("n_nationkey").alias("__amer_nk"))
    cust = cat.customer.join(
        F.broadcast(amer_nations),
        F.col("c_nationkey") == F.col("__amer_nk"),
        "left_semi",
    ).select("c_custkey")
    supp = cat.supplier.join(
        F.broadcast(nat.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    promo = cat.part.filter(F.col("p_type") == "PROMO").select("p_partkey")
    vol = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(6,4)")
    )
    rows = (
        cat.lineitem.join(
            promo, F.col("l_partkey") == F.col("p_partkey"), "inner"
        )
        .join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"), "inner")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            # bigint: duck EXTRACT(year) binds BIGINT (r13 width guard)
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        rows.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_3", F.col("volume"))
                    .otherwise(zero)
                ).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ------------------------------------------- Q21: sole late supplier


@query(
    "sole_late_supplier",
    oracle="""
    WITH l1 AS (
        SELECT l.l_orderkey, l.l_suppkey, o.o_orderdate
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    SELECT s.s_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
    FROM l1 JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
    )
    AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.o_orderdate + INTERVAL 90 DAY
    )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 25
    """,
    tags=("analytic", "semi-join", "anti-join"),
)
def sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (lateness adapted to shipdate − orderdate >
    90 days): suppliers who were the ONLY late supplier on finished
    multi-supplier orders — the classic EXISTS / NOT-EXISTS double
    correlated subquery, compiled to one left-semi plus one
    left-anti hash join on orderkey (the non-equi supplier
    inequality rides inside each join), so the whole query is three
    keyed shuffles on orderkey plus the supplier-name attach. The
    DISTINCT order count makes the result independent of how many of
    a supplier's lines in the same order were late.
    """
    cat = Catalog(spark, sf_dir)
    finished = cat.orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = cat.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    late1 = (
        li.join(finished, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("__ok2"), F.col("l_suppkey").alias("__sk2")
    )
    with_other = late1.join(
        l2,
        (F.col("l_orderkey") == F.col("__ok2"))
        & (F.col("l_suppkey") != F.col("__sk2")),
        "left_semi",
    )
    late3 = late1.select(
        F.col("l_orderkey").alias("__ok3"),
        F.col("l_suppkey").alias("__sk3"),
    )
    sole = with_other.join(
        late3,
        (F.col("l_orderkey") == F.col("__ok3"))
        & (F.col("l_suppkey") != F.col("__sk3")),
        "left_anti",
    )
    return (
        sole.join(
            cat.supplier, F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
    )


@query(
    "skyline_parts_price_size",
    oracle="""
    WITH g AS (
        SELECT p_retailprice AS pr, MAX(p_size) AS gmax
        FROM part GROUP BY 1
    ),
    r AS (
        SELECT pr, gmax,
               MAX(gmax) OVER (
                   ORDER BY pr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS lt
        FROM g
    )
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p JOIN r ON p.p_retailprice = r.pr
    WHERE NOT (COALESCE(r.lt >= p.p_size, FALSE) OR r.gmax > p.p_size)
    ORDER BY p.p_retailprice, p.p_size, p.p_partkey
    """,
    tags=("analytic", "skyline"),
)
def skyline_parts_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts not dominated on
    (cheaper-or-equal price, larger-or-equal size, one strict) — the
    Borzsony/Kossmann SKYLINE OF operator, the shape behind
    "best tradeoff" queries (cheapest-per-capability).

    The definition is quadratic (NOT EXISTS over all pairs); the
    engine computes it linearithmically from the classic sort-scan
    identity: a point is dominated iff the max size over STRICTLY
    cheaper price groups reaches its size, or its own price group
    holds a strictly larger size. That prefix maximum is a global
    ordered scan — the single-task window cliff — so it runs through
    operators/windows.py::global_running_max (quantile buckets →
    per-bucket window + driver-folded bucket offsets, max needs no
    decimal caveat), with the price-group frame (|distinct prices|,
    not |rows|) as input. tests/test_operators.py cross-checks the
    whole query against the brute-force quadratic definition.

    No dominance comparisons ever pair rows: one group aggregate, one
    bucketed prefix max, one broadcast-sized join back to parts. The
    skyline output is bounded by |distinct sizes| price groups.
    Engine-exactness is comparison-only (raw column values, no
    arithmetic), so the differential is trivially value-exact."""
    from ..operators.windows import skyline_2d

    part = Catalog(spark, sf_dir).part
    return (
        skyline_2d(part, x_col="p_retailprice", y_col="p_size")
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_size", "p_partkey")
    )
