"""Measure the end-to-end corpus build across scale factors.

plans/corpus_pipeline.py composes gate → exact dedup → LSH near-dedup
→ split → versioned snapshot; every stage is map-side or one keyed
shuffle, so the whole build should grow ~linearly with the corpus.
This runs it at sf0.001 / sf0.01 / sf0.1 (100× input span), records
wall + funnel counts, and re-opens each snapshot to confirm the
committed row count.

Usage: python tools/corpus_probe.py
Maintains the "## End-to-end corpus build" SCALING.md section.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._shared import replace_section  # noqa: E402


def main() -> int:
    from lmo_data_catalog_spark import cache
    from lmo_data_catalog_spark.plans.corpus_pipeline import (
        build_corpus_snapshot,
    )
    from lmo_data_catalog_spark.session import get_spark
    from lmo_data_catalog_spark.sources.versioned import VersionedTable

    spark = get_spark("corpus_probe")
    rows = []
    for sf in ("0.001", "0.01", "0.1"):
        sf_dir = f"/root/testdata/sf{sf}"
        with tempfile.TemporaryDirectory() as tmp:
            out = os.path.join(tmp, "corpus")
            t0 = time.monotonic()
            try:
                res = build_corpus_snapshot(spark, sf_dir, out)
            finally:
                cache.release_all()
            wall = time.monotonic() - t0
            sc = res["stage_counts"]
            snap_rows = VersionedTable(spark, out).read().count()
            assert snap_rows == sc["near_deduped"], "snapshot != funnel"
            rows.append((sf, sc, wall))
            print(rows[-1], flush=True)

    load1 = os.getloadavg()[0]
    lines = [
        "## End-to-end corpus build",
        "",
        "`plans/corpus_pipeline.py` (gate → exact dedup → MinHash/LSH",
        "near-dedup → split → versioned snapshot with zone map + Bloom)",
        "across a 100× input span; snapshot row count re-verified from a",
        f"fresh read at every scale (`tools/corpus_probe.py`; load1 {load1:.1f}):",
        "",
        "| sf | raw docs | gate pass | exact-deduped | final (near-deduped) | wall (s) |",
        "|---|---|---|---|---|---|",
    ]
    for sf, sc, wall in rows:
        lines.append(
            f"| {sf} | {sc['raw']:,} | {sc['quality_gated']:,} "
            f"| {sc['exact_deduped']:,} | {sc['near_deduped']:,} "
            f"| {wall:.2f} |"
        )
    r0, rN = rows[0], rows[-1]
    lines.append("")
    lines.append(
        f"{rN[1]['raw'] // max(r0[1]['raw'], 1)}× the documents moved the "
        f"wall {rN[2] / r0[2]:.2f}× — the build is dominated by fixed "
        "overhead (per-stage job setup + the snapshot commit's stats "
        "jobs) at these corpus sizes; every data-dependent stage is the "
        "already-probed LSH/gate/shuffle machinery, linear in input."
    )
    replace_section("End-to-end corpus build", "\n".join(lines) + "\n")
    print("SCALING.md section updated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
