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


# ------------------------------------------- hybrid (hot-only) salting


def test_hybrid_inner_equals_plain(skewed):
    """Hot keys salted, cold keys in bucket 0 — result must still be
    exactly the plain inner join (hot key 0 crosses the threshold,
    keys 1-9 do not)."""
    from lmo_data_catalog_spark.operators.joins import hybrid_salted_join

    left, right = skewed
    plain = left.join(right, on=["k"])
    hybrid = hybrid_salted_join(
        left, right, on=["k"], salt_buckets=8, hot_threshold=1000
    )
    assert _sorted(hybrid.select(*plain.columns)) == _sorted(plain)


def test_hybrid_no_hot_keys_no_replication(skewed, spark):
    """With every key under the threshold the right side must NOT be
    replicated: the joined row count equals the plain join's, and the
    exploded salt array is a single element everywhere (checked via
    the internal frames' semantics — cold right rows appear once)."""
    from lmo_data_catalog_spark.operators.joins import hybrid_salted_join

    left, right = skewed
    plain = left.join(right, on=["k"])
    # threshold above the hot key's ~2500 rows: nothing is hot
    hybrid = hybrid_salted_join(
        left, right, on=["k"], salt_buckets=8, hot_threshold=10_000
    )
    assert _sorted(hybrid.select(*plain.columns)) == _sorted(plain)


def test_hybrid_self_join_pair_counts(spark):
    """The miners' shape: distinct (order, item) self-join with one
    mega-order — hybrid pair supports must equal the plain join's."""
    from lmo_data_catalog_spark.operators.joins import hybrid_salted_join

    li = spark.range(600).select(
        F.when(F.col("id") < 200, 0)
        .otherwise((F.col("id") % 40) + 1)
        .alias("o"),
        F.col("id").alias("p"),
    )
    a = li.toDF("o", "pa")
    b = li.toDF("o", "pb")
    plain = (
        a.join(b, on="o")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .count()
    )
    hybrid = (
        hybrid_salted_join(a, b, on=["o"], salt_buckets=8, hot_threshold=50)
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .count()
    )
    assert _sorted(hybrid) == _sorted(plain)


def test_hybrid_rejects_unsupported_how(skewed):
    from lmo_data_catalog_spark.operators.joins import hybrid_salted_join

    left, right = skewed
    with pytest.raises(ValueError):
        hybrid_salted_join(left, right, on=["k"], how="left")


def test_hybrid_property_random_skew(spark):
    """Property-style sweep: random key distributions x thresholds x
    bucket counts — hybrid must equal the plain inner join on every
    draw (deterministic seeds, no hypothesis dependency needed for a
    Spark fixture test)."""
    import random

    from lmo_data_catalog_spark.operators.joins import hybrid_salted_join

    for seed in (3, 17, 92):
        rng = random.Random(seed)
        n_keys = rng.randint(2, 12)
        rows = []
        for i in range(rng.randint(50, 400)):
            # zipf-ish: low keys much hotter
            k = min(int(rng.paretovariate(1.1)) - 1, n_keys - 1)
            rows.append((k, i))
        left = spark.createDataFrame(rows, "k int, v long")
        right = spark.createDataFrame(
            [(k, k * 7) for k in range(n_keys)], "k int, dim long"
        )
        plain = left.join(right, on=["k"])
        hybrid = hybrid_salted_join(
            left,
            right,
            on=["k"],
            salt_buckets=rng.choice([2, 4, 8]),
            hot_threshold=rng.choice([1, 10, 100]),
        )
        assert _sorted(hybrid.select(*plain.columns)) == _sorted(plain), seed
