"""SparkSession builder tuned for the engine.

Scale notes (100 TB design point):
- AQE on: runtime shuffle-partition coalescing + skew-join splitting.
- ``spark.sql.shuffle.partitions`` is a *ceiling*; AQE coalesces down.
  On a 1000-executor cluster this should be ~2-3x total cores; here we
  default to 32 for local[32].
- Arrow enabled so any pandas-UDF escape hatch is vectorized.
- Session timezone pinned UTC so timestamp semantics match the DuckDB
  oracle and are reproducible across clusters.
- Driver heap sized explicitly: in local mode the driver JVM hosts
  every executor thread, and Spark's 1g default gives local[32] about
  32 MB of working heap per task — dedup/minhash aggregations OOM and
  everything else pays constant GC. Overridable via
  ``SPARK_GRAFT_DRIVER_MEM``; on a real cluster use executor memory
  settings instead (this knob only matters for local mode).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lmo_data_catalog_spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
