"""Results must not depend on physical partitioning.

The r4 advice flagged the failure class: a double aggregation feeding
an equality/ranking can flip under summation-order changes, and
summation order follows partitioning. These tests run
boundary-sensitive registry queries under deliberately different
physical layouts — shuffle.partitions 3 vs 32, and inputs
pre-repartitioned by an unrelated key — and require bit-identical
result multisets. At 100 TB partitioning is chosen by the cluster,
not the query author; any query whose answer moves here is broken at
scale even if the sf0.01 differential passes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lmo_data_catalog_spark.registry import REGISTRY

SF = "/root/testdata/sf0.001"

# Queries whose plans contain the boundary-sensitive shapes: decimal
# max-equality, global ranking, watermark admission, salted join,
# bloom gate, floating aggregation feeding ORDER/LIMIT.
SENSITIVE = [
    "top_revenue_supplier",
    "customer_rfm_segments",
    "watermark_boundary_admission",
    "cooccurrence_part_pairs_salted",
    "contamination_screen_bloom",
    "large_order_customers",
    "returned_item_losses",
    "bigram_pmi_topk",
    "corpus_mixture_sample",
    "token_budget_head",
    # r6: the sharded budget reproduces the flat window's running sums
    # from per-shard offsets — partial-order bugs would surface here
    "token_budget_head_sharded",
    # r6: multiprobe top-k ties broken on (cosine, vec_id) must not
    # move when candidate arrival order changes
    "ann_lsh_multiprobe",
    # r6 stats module: A-ES weighted top-k ranks on a log expression;
    # the whale-curve share ranks DECIMAL sums through the bucketed
    # global row_number; TWA ranks a float ratio; PageRank's rank
    # vector is a 3-round float fixpoint — all rank/sum shapes whose
    # answers must not move with layout
    "weighted_sample_docs",
    "top1pct_revenue_share",
    "time_weighted_avg_value",
    "pagerank_part_cooccurrence",
    # r7: dangling redistribution adds a 1-row float mass broadcast
    # per round; the exact k-means trainer's whole CLAIM is integer-
    # sum partition-independence; incremental-LSH candidates ride
    # band-hash joins; the decimal money sums must be order-free by
    # construction; packing's per-shard fold must not see partition
    # order at all (it sorts within the group)
    "pagerank_dangling_part_supplier",
    "ann_ivf_kmeans_topk",
    "lsh_incremental_neardup_pairs",
    "salted_join_skew",
    "pack_documents_greedy",
    # r11: every new quantize-then-integer-sum contract — the
    # classifier's signed-weight accumulator, the bigram LM's
    # micro-nat sum, the Zipf OLS integer sums over bucketed global
    # ranks — plus the PQ top-10 cut on raw-double ADC ties
    "quality_classifier_score",
    "bigram_lm_doc_nll",
    "zipf_alpha_word_freq",
    "ann_pq_adc_topk",
    "ann_pq_recall",
    # r11: directed-rule top-20 ranks exact-int-valued double ratios
    "association_rules_topk",
    # r11: bucketed global prefix-max — the whole point is layout
    # independence of the skyline cut
    "skyline_parts_price_size",
    "frequent_itemsets_depth3",
    # r12: the trained-PQ index's shortlist cut (top-50 on raw-double
    # ADC ties) and re-ranked top-10 must not move with layout; the
    # IVF multiprobe's cell-rank cut (rn <= nprobe on float cosine
    # ties) is the same class
    "ann_pq_trained_topk",
    "ann_pq_trained_recall",
    "ann_ivf_multiprobe_topk",
    # r12: the salted pair stage must not let bucket layout reach the
    # rule scores' top-20 cut
    "association_rules_topk_salted",
    "frequent_itemsets_depth3_salted",
    # r12: IVFADC composes two rank cuts (cell rank, ADC shortlist)
    "ann_ivfadc_topk",
    "ann_ivfadc_recall",
    # r13: trained coarse quantizer — Lloyd state must not depend on
    # partition layout (integer sums), nor the multiprobe cell rank
    "ann_ivfadc_trained_topk",
    "ann_ivfadc_trained_recall",
    # r13: the index-build pins (cell assignments + codes) must be
    # layout-free — integer sums over a layout-free kernel
    "pq_index_build_cells",
]


def canon(df):
    cols = sorted(df.columns)
    rows = [tuple(str(r[c]) for c in cols) for r in df.collect()]
    return sorted(rows)


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_under_partitioning(spark, name):
    spec = REGISTRY[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        want = canon(spec.builder(spark, SF))
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        got = canon(spec.builder(spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert got == want, f"{name} changed under shuffle.partitions 32->3"


def test_decimal_sum_order_independence(spark):
    """The decimal-sum hardening, isolated: sum a column whose double
    sum is order-sensitive, under opposite sort orders and different
    partition counts — decimal totals must be identical (and the
    double totals demonstrably drift on this fixture, proving the
    test has teeth)."""
    vals = [(i, (1.0 / 3.0) * (10.0 ** (i % 7))) for i in range(10_001)]
    df = spark.createDataFrame(vals, "id long, v double")

    def dec_total(frame):
        return frame.agg(
            F.sum(F.col("v").cast("decimal(28,10)")).alias("s")
        ).collect()[0]["s"]

    a = dec_total(df.repartition(1, "id").sortWithinPartitions("id"))
    b = dec_total(
        df.repartition(17, "id").sortWithinPartitions(F.desc("id"))
    )
    assert a == b

    def dbl_total(frame):
        return frame.agg(F.sum("v").alias("s")).collect()[0]["s"]

    d1 = dbl_total(df.coalesce(1).sortWithinPartitions("id"))
    d2 = dbl_total(df.coalesce(1).sortWithinPartitions(F.desc("id")))
    assert d1 != d2, (
        "fixture no longer exercises double summation-order drift; "
        "pick nastier values"
    )
