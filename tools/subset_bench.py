"""Isolated subset bench: times the named registry queries with the
bench.py protocol (warm-up + N timed passes, per-pass cache release,
noop sink) in one session. For heap/config sweeps set the usual env
vars (SPARK_GRAFT_DRIVER_MEM, SPARK_GRAFT_CPUS) before launch.

Usage: python tools/subset_bench.py [--runs N] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lmo_data_catalog_spark import cache  # noqa: E402
from lmo_data_catalog_spark.registry import REGISTRY  # noqa: E402
from lmo_data_catalog_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    runs = 2
    if args and args[0] == "--runs":
        runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("subset_bench")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    for name in args:
        spec = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        force(spec.builder(spark, sf_dir))
        cache.release_all()
        best = float("inf")
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"timed{i}:{name}")
            t0 = time.time()
            force(spec.builder(spark, sf_dir))
            best = min(best, time.time() - t0)
            cache.release_all()
        out[name] = round(best, 3)
        print(f"{name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"queries": out, "total": round(sum(out.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
