"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Protocol (BASELINE.md): one warm-up pass (JVM + codegen warm), then
N_RUNS timed passes per query, best-of taken; execution is forced via
the noop sink so driver-transfer cost doesn't pollute engine timings.
Prints exactly ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lmo_data_catalog_spark.registry import REGISTRY  # noqa: E402
from lmo_data_catalog_spark.session import get_spark  # noqa: E402

N_RUNS = 2


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0  # non-conventional dir name; still benchmark
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for name, spec in REGISTRY.items():
        try:
            force(spec.builder(spark, sf_dir))  # warm-up
            best = min(
                _timed(spec.builder, spark, sf_dir) for _ in range(N_RUNS)
            )
            timings[name] = round(best, 4)
        except Exception as e:  # noqa: BLE001
            timings[name] = -1.0
            print(f"bench error {name}: {e}", file=sys.stderr)
        finally:
            # operators persist() shared intermediates per invocation;
            # drop them between queries so cache doesn't accumulate
            spark.catalog.clearCache()

    total = round(sum(t for t in timings.values() if t > 0), 4)
    print(
        json.dumps(
            {
                "metric": "registry_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


def _timed(builder, spark, sf_dir) -> float:
    t0 = time.time()
    force(builder(spark, sf_dir))
    return time.time() - t0


if __name__ == "__main__":
    main()
