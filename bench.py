"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Protocol (BASELINE.md): one warm-up pass (JVM + codegen warm), then
N_RUNS timed passes per query, best-of taken; execution is forced via
the noop sink so driver-transfer cost doesn't pollute engine timings.

Output contract: prints exactly ONE JSON line to stdout, guaranteed
<= LINE_BUDGET chars (the driver keeps only the last 2000 chars of
stdout — round 1's full per-query dict overflowed that and failed to
parse). The stdout line carries the suite total plus the slowest
queries that fit the budget; the COMPLETE per-query timing map is
written to BENCH_FULL.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from lmo_data_catalog_spark import cache  # noqa: E402
from lmo_data_catalog_spark.registry import REGISTRY  # noqa: E402
from lmo_data_catalog_spark.session import get_spark  # noqa: E402

N_RUNS = 2
LINE_BUDGET = 1900  # driver tail capture is 2000 chars; leave headroom


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(builder, spark, sf_dir) -> float:
    t0 = time.time()
    force(builder(spark, sf_dir))
    dt = time.time() - t0
    # Release tracked intermediates AFTER stopping the clock: each
    # timed pass must compute from the parquet inputs, not from the
    # previous pass's persisted intermediates (r14 measurement fix —
    # cache.release_all used to be a no-op, see cache.py, so timed
    # passes silently planned against the warm-up pass's leaked
    # InMemoryRelations). Cleanup cost is not query cost.
    cache.release_all()
    return dt


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
            cache.release_all()  # timed passes start cold (see _timed)
            best = min(
                _timed(spec.builder, spark, sf_dir) for _ in range(N_RUNS)
            )
            timings[name] = round(best, 4)
        except Exception as e:  # noqa: BLE001
            timings[name] = -1.0
            print(f"bench error {name}: {e}", file=sys.stderr)
        finally:
            # operators persist() shared intermediates per invocation
            # (tracked via cache.track); release between queries so
            # executor storage doesn't accumulate across the suite
            cache.release_all()

    total = round(sum(t for t in timings.values() if t > 0), 4)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")

    # load averages make round-to-round drift falsifiable: a suite
    # that ran under background load says so in its own snapshot
    # (r5 judge item — the ~7% r4→r5 drift could only be ATTRIBUTED
    # to noise, not shown)
    load1, load5, load15 = os.getloadavg()
    full = {
        "metric": "registry_suite_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "n_queries": len(timings),
        "errors": sorted(n for n, t in timings.items() if t < 0),
        "loadavg": [round(load1, 2), round(load5, 2), round(load15, 2)],
    }
    # canonical artifact + a per-core-count copy: the driver's scaling
    # run (lower $SPARK_GRAFT_CPUS) otherwise clobbers the canonical
    # 32-core map in the working tree (r14 verdict item 8)
    payload = json.dumps(full, indent=1, sort_keys=True)
    with open(os.path.join(REPO, "BENCH_FULL.json"), "w") as f:
        f.write(payload)
    tag = cpus if str(cpus).isdigit() else "all"
    with open(os.path.join(REPO, f"BENCH_FULL_c{tag}.json"), "w") as f:
        f.write(payload)

    # stdout line: total + slowest queries that fit the budget
    base = {
        "metric": "registry_suite_wall_clock",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "detail": "BENCH_FULL.json",
        "loadavg": full["loadavg"],
        "queries": {},
    }
    by_time = sorted(timings.items(), key=lambda kv: -kv[1])
    line = json.dumps(base, separators=(",", ":"))
    for name, t in by_time:
        base["queries"][name] = t
        candidate = json.dumps(base, separators=(",", ":"))
        if len(candidate) > LINE_BUDGET:
            del base["queries"][name]
            break
        line = candidate
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
