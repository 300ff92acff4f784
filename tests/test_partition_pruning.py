"""Partition pruning: the 100 TB layout contract. A fact table written
partitioned by day must satisfy a day-predicate query by scanning ONLY
the matching directories — the physical plan's scan shows the pruned
partition count and a PartitionFilters entry, and the row result
matches the unpartitioned read.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lmo_data_catalog_spark.catalog import Catalog

SF = "/root/testdata/sf0.001"


def test_day_partitioned_write_prunes_scan(spark, tmp_path):
    ev = Catalog(spark, SF).events
    out = str(tmp_path / "events_by_day")
    ev.withColumn("day", F.col("ts").cast("date")).write.partitionBy(
        "day"
    ).mode("overwrite").parquet(out)

    part = spark.read.parquet(out)
    n_days = part.select("day").distinct().count()
    assert n_days > 5  # the fixture really spans many partitions

    one_day = part.filter(F.col("day") == "2024-01-03")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # the day predicate must land in PartitionFilters (metadata-only
    # pruning) and NOT remain a data filter
    pf = plan.split("PartitionFilters: [", 1)
    assert len(pf) == 2, plan
    assert "day" in pf[1].split("]")[0]
    assert "DataFilters: []" in plan

    # the pruned scan TOUCHES only the one day's files at runtime
    files_read = one_day.select(F.input_file_name()).distinct().count()
    all_files = len(part.inputFiles())
    assert files_read < all_files
    assert files_read <= max(1, all_files // n_days + 1)

    # and the result is identical to filtering the unpartitioned table
    want = ev.filter(F.col("ts").cast("date") == "2024-01-03").count()
    assert one_day.count() == want


def test_dynamic_partition_overwrite_replaces_only_touched_day(
    spark, tmp_path
):
    """INSERT OVERWRITE of one day must not clobber sibling partitions
    (spark.sql.sources.partitionOverwriteMode=dynamic) — the
    incremental daily-rebuild pattern."""
    ev = Catalog(spark, SF).events.withColumn(
        "day", F.col("ts").cast("date")
    )
    out = str(tmp_path / "events_dyn")
    ev.write.partitionBy("day").mode("overwrite").parquet(out)
    before = spark.read.parquet(out).count()

    one = ev.filter(F.col("day") == "2024-01-03").withColumn(
        "value", F.col("value") * 0 + 1.0
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        one.write.partitionBy("day").mode("overwrite").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")

    after = spark.read.parquet(out)
    assert after.count() == before  # siblings intact
    assert (
        after.filter(F.col("day") == "2024-01-03")
        .agg(F.min("value"), F.max("value"))
        .first()
    ) == (1.0, 1.0)
