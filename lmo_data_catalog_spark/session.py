"""SparkSession builder tuned for the engine.

Scale notes (100 TB design point):
- AQE on: runtime shuffle-partition coalescing + skew-join splitting.
- ``spark.sql.shuffle.partitions`` is a *ceiling*; AQE coalesces down.
  On a 1000-executor cluster this should be ~2-3x total cores; here we
  default to 32 for local[32].
- Arrow enabled so any pandas-UDF escape hatch is vectorized.
- Session timezone pinned UTC so timestamp semantics match the DuckDB
  oracle and are reproducible across clusters.
- Driver heap sized explicitly, and deliberately SMALL (2g default,
  ``SPARK_GRAFT_DRIVER_MEM`` to override): in local mode the driver
  JVM hosts every executor thread, and measured suite wall-clock is
  2g 51 s / 4g 59 s / 12g 111 s for the same 91 queries — G1's young
  gen scales with the heap, so a big heap turns into multi-second
  evacuation pauses that land on random queries in a many-small-
  queries regime. Memory-hungry one-offs (corpus replication probes)
  set the env var up; on a real cluster use executor memory settings
  instead (this knob only matters for local mode).
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
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "2g"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
