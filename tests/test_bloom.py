"""Broadcast-bitset Bloom filter: no false negatives, useful FPP.

Pins operators/bloom.py: every inserted value must test positive
(Bloom's hard guarantee — the contamination pre-pass relies on it for
oracle-exactness), non-inserted values mostly test negative, and the
probe expression stays pure-JVM (no Python evaluation in the plan).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from lmo_data_catalog_spark.operators.bloom import (
    bloom_might_contain,
    build_bloom_bitset,
)


@pytest.fixture(scope="module")
def inserted():
    return [f"word{i}" for i in range(50)] + ["value", "merge", "table"]


@pytest.fixture(scope="module")
def bitset(spark, inserted):
    return build_bloom_bitset(spark, inserted, m_bits=1024, k=3)


def test_no_false_negatives(spark, inserted, bitset):
    df = spark.createDataFrame([(v,) for v in inserted], "t string")
    hits = df.where(bloom_might_contain("t", bitset, k=3)).count()
    assert hits == len(inserted)


def test_false_positive_rate_bounded(spark, inserted, bitset):
    absent = [(f"absent-{i}",) for i in range(2000)]
    df = spark.createDataFrame(absent, "t string")
    fp = df.where(bloom_might_contain("t", bitset, k=3)).count()
    # 53 values in 1024 bits, k=3 → theoretical FPP ≈ 0.3%; allow 5%.
    assert fp / len(absent) < 0.05


def test_empty_value_set_rejects_everything(spark):
    bs = build_bloom_bitset(spark, [], m_bits=256, k=3)
    assert all(w == 0 for w in bs)
    df = spark.createDataFrame([("x",), ("y",)], "t string")
    assert df.where(bloom_might_contain("t", bs, k=3)).count() == 0


def test_high_bit_words_survive_sign_fold(spark):
    """Bit 63 of a word maps to a negative Spark long; membership must
    still hold (regression for the two's-complement fold)."""
    # Find values landing on bit positions 63 mod 64 by brute force.
    vals = [f"v{i}" for i in range(3000)]
    bs = build_bloom_bitset(spark, vals, m_bits=256, k=3)
    assert any(w < 0 for w in bs), "fixture never exercised bit 63"
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    assert df.where(bloom_might_contain("t", bs, k=3)).count() == len(vals)


def test_probe_plan_is_jvm_only(spark, bitset):
    df = spark.createDataFrame([("x",)], "t string").where(
        bloom_might_contain("t", bitset, k=3)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_contamination_bloom_refuses_short_probes(spark, monkeypatch):
    """A <3-word probe has no interior word; the pre-pass must refuse
    loudly instead of silently dropping its matches."""
    from lmo_data_catalog_spark.queries import pipeline

    monkeypatch.setattr(pipeline, "PROBES", ["too short"])
    with pytest.raises(ValueError, match="3-word"):
        pipeline.contamination_screen_bloom(spark, "/root/testdata/sf0.001")
