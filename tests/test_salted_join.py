"""Salted-join correctness (SURVEY §7 E-e skew design): on a
deliberately skewed dataset (one key holds ~half the rows), the
salted join must return exactly the plain join's result, and the salt
must actually spread the hot key across buckets.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lmo_data_catalog_spark.operators.joins import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 5000 rows, key 0 holds ~50%; dimension of 10 keys
    left = spark.range(5000).select(
        F.when(F.col("id") % 2 == 0, 0)
        .otherwise((F.col("id") % 9) + 1)
        .alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim")
    )
    return left, right


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_equals_plain(skewed):
    left, right = skewed
    plain = left.join(right, on=["k"])
    salted = salted_join(left, right, on=["k"], salt_buckets=8)
    assert _sorted(salted.select(*plain.columns)) == _sorted(plain)


def test_salted_left_keeps_unmatched(skewed):
    left, right = skewed
    r_partial = right.filter(F.col("k") <= 4)
    plain = left.join(r_partial, on=["k"], how="left")
    salted = salted_join(left, r_partial, on=["k"], salt_buckets=8, how="left")
    assert _sorted(salted.select(*plain.columns)) == _sorted(plain)


def test_salt_spreads_hot_key(skewed, spark):
    left, _ = skewed
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8))
    spread = (
        left.filter(F.col("k") == 0)
        .select(salt.alias("s"))
        .groupBy("s")
        .count()
        .collect()
    )
    assert len(spread) == 8  # hot key occupies every salt bucket
    counts = [r["count"] for r in spread]
    assert max(counts) < 2 * min(counts)  # roughly uniform


def test_salted_join_rejects_unsupported_how(skewed):
    left, right = skewed
    with pytest.raises(ValueError):
        salted_join(left, right, on=["k"], how="full")
