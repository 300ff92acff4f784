"""Per-round isolated-run sample audit → VERIFY_SAMPLE.md.

The driver's CORRECTNESS gate samples ~50 of the registry queries per
round, so most queries only ever run inside the builder's FULL
differential sweeps — one long-lived session, shared caches. This
tool closes the isolation gap: each round it draws a seeded random
sample of registry queries and re-runs each one in its OWN subprocess
(fresh JVM, fresh SparkSession, nothing warmed) through
``tools/verify_local.py``, recording PASS/FAIL to VERIFY_SAMPLE.md.
Seed = round number, so over ~ceil(N/15) rounds every query gets an
isolated-run green row without repeats being likely.

Usage: python tools/verify_sample.py ROUND [n_sample] [sf_dir]
"""

from __future__ import annotations

import os
import random
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    round_no = int(sys.argv[1])
    n_sample = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"

    import __spark_entry__ as entry

    names = sorted(entry.queries())
    rng = random.Random(round_no)
    sample = sorted(rng.sample(names, min(n_sample, len(names))))

    results = []
    for name in sample:
        t0 = time.monotonic()
        proc = subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools/verify_local.py"),
             sf_dir, name],
            capture_output=True,
            text=True,
            cwd=ROOT,
            timeout=900,
            env={**os.environ, "SPARK_GRAFT_PRINT_TYPES": "1"},
        )
        wall = time.monotonic() - t0
        ok = proc.returncode == 0 and f"PASS {name}" in proc.stdout
        # the engine-pair output types, as bound/planned (r8 judge
        # finding: the driver hash is representation-sensitive, so
        # future type drift — a Spark mapping change, a DuckDB
        # upgrade — must be visible here before the driver sees it)
        types = next(
            (
                ln.split(": ", 1)[1]
                for ln in proc.stdout.splitlines()
                if ln.startswith(f"TYPES {name}:")
            ),
            "(rows-only — no oracle)",
        )
        results.append((name, ok, wall, types))
        print(f"{'PASS' if ok else 'FAIL'} {name} ({wall:.1f}s)", flush=True)
        if not ok:
            print(proc.stdout[-2000:])
            print(proc.stderr[-2000:])

    n_ok = sum(1 for _, ok, _, _ in results if ok)
    lines = [
        "# VERIFY_SAMPLE — isolated-run audit",
        "",
        f"Round {round_no}: {n_sample} registry queries drawn with",
        f"`random.Random({round_no}).sample(sorted(queries), {n_sample})`"
        f" (seed = round number), each re-run in its OWN subprocess",
        "(fresh JVM + SparkSession, no warmed caches) against the DuckDB",
        f"oracle at `{sf_dir}` via `tools/verify_local.py`.",
        "",
        f"**{n_ok}/{len(results)} passed.**",
        "",
        "Types are the engine-pair OUTPUT schemas as bound (DuckDB) and",
        "planned (Spark) — the representation layer the driver's hash is",
        "sensitive to; any drift here (engine upgrade, type-mapping",
        "change) is a red driver row waiting to be sampled.",
        "",
        "| query | isolated run | wall (s) | output types |",
        "|---|---|---|---|",
    ]
    for name, ok, wall, types in results:
        lines.append(
            f"| {name} | {'PASS' if ok else '**FAIL**'} | {wall:.1f} "
            f"| `{types}` |"
        )
    lines.append("")
    with open(os.path.join(ROOT, "VERIFY_SAMPLE.md"), "w") as fh:
        fh.write("\n".join(lines))
    print(f"VERIFY_SAMPLE.md written ({n_ok}/{len(results)})")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
