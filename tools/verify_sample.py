"""Per-round isolated-run sample audit → VERIFY_SAMPLE.md.

The driver's CORRECTNESS gate samples ~50 of the registry queries per
round, so most queries only ever run inside the builder's FULL
differential sweeps — one long-lived session, shared caches. This
tool closes the isolation gap: each round it draws a seeded random
sample of registry queries and re-runs each one in its OWN subprocess
(fresh JVM, fresh SparkSession, nothing warmed) through
``tools/verify_local.py``, recording PASS/FAIL to VERIFY_SAMPLE.md.

Selection (r9 verdict ask #7): the draw is BIASED toward queries the
driver has NEVER sampled — the union of CORRECTNESS_r*.json keys is
the driver-green set, and whatever differs between verify_local and
the driver's actual hash (the gap that hid fk_integrity_audit for a
round) can only surface on the complement. Never-driver-sampled
queries are exhausted first (seeded sample), then the remainder tops
up from the driver-seen set. Seed = round number for determinism.

Usage: python tools/verify_sample.py ROUND [n_sample] [sf_dir]
"""

from __future__ import annotations

import glob
import json
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
    n_sample = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"

    import __spark_entry__ as entry

    names = sorted(entry.queries())
    driver_seen = set()
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        try:
            driver_seen.update(json.load(open(path)))
        except Exception:
            pass
    never = sorted(n for n in names if n not in driver_seen)
    seen = sorted(n for n in names if n in driver_seen)
    rng = random.Random(round_no)
    take = min(n_sample, len(names))
    from_never = rng.sample(never, min(take, len(never)))
    from_seen = rng.sample(seen, min(take - len(from_never), len(seen)))
    sample = sorted(from_never + from_seen)
    print(
        f"sampling {len(sample)} queries: {len(from_never)} "
        f"never-driver-sampled (of {len(never)}), {len(from_seen)} "
        f"driver-seen top-up"
    )

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
        f"Round {round_no}: {len(results)} registry queries drawn with",
        f"seed = round number ({round_no}), biased toward",
        f"never-driver-sampled queries ({len(from_never)} of the",
        f"{len(never)} absent from every CORRECTNESS_r*.json, plus",
        f"{len(from_seen)} driver-seen top-up),",
        "each re-run in its OWN subprocess",
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
