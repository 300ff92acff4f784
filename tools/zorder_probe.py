"""Z-order vs single-key compaction: multi-column pruning, measured.

Builds a fragmented VersionedTable (8 micro-batch commits, every
batch spanning both key columns — the streaming-sink shape), then
rewrites it three ways and measures how many parquet files a tight
``read_range`` probe on EACH column actually touches:

  fragmented       — head as ingested (every probe scans everything)
  compact("x")     — single-key range slicing (x probes prune, y
                     probes read the whole table: y's values are
                     uniform within every x-slice)
  compact_zorder   — (x, y) bit-interleaved curve: BOTH columns'
                     probes skip most directories, the Delta
                     ZORDER BY / Iceberg sort-order behavior

Writes the "## Z-order clustering: both-column pruning, measured"
SCALING.md section. Run: python tools/zorder_probe.py [n_rows]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._shared import replace_section  # noqa: E402


def probe(t, col, lo, hi):
    return len(t.read_range(col, lo, hi).inputFiles())


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    from lmo_data_catalog_spark.session import get_spark
    from lmo_data_catalog_spark.sources.versioned import VersionedTable

    spark = get_spark("zorder-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    root = tempfile.mkdtemp(prefix="zorder_probe_")
    side = int(n**0.5)
    lines = []
    try:
        base = (
            spark.range(side * side)
            .select(
                (F.col("id") % side).alias("x"),
                (F.col("id") / side).cast("long").alias("y"),
                F.col("id").alias("val"),
            )
        )

        def fresh(name):
            t = VersionedTable(spark, os.path.join(root, name))
            for b in range(8):
                t.commit(
                    base.filter(F.pmod("val", F.lit(8)) == b),
                    stats_col="x",
                )
            return t

        w = side // 50 or 1  # probe window: ~2% of each axis
        results = {}

        t = fresh("frag")
        total = len(t.read().inputFiles())
        results["fragmented"] = (
            total,
            probe(t, "x", 0, w),
            probe(t, "y", 0, w),
        )

        t = fresh("linear")
        t.compact("x", n_dirs=16)
        results['compact("x")'] = (
            len(t.read().inputFiles()),
            probe(t, "x", 0, w),
            probe(t, "y", 0, w),
        )

        t = fresh("zorder")
        t.compact_zorder(["x", "y"], n_dirs=16, bits=10)
        results["compact_zorder"] = (
            len(t.read().inputFiles()),
            probe(t, "x", 0, w),
            probe(t, "y", 0, w),
        )

        lines.append(
            f"{side * side:,} rows on a {side}x{side} (x, y) grid, 8 "
            "full-span micro-batch commits, probe window = 2% of one "
            "axis. Files TOUCHED by a zone-map-pruned `read_range` "
            "(of total files in the layout):\n"
        )
        lines.append("| layout | files | x-probe | y-probe |")
        lines.append("|---|---|---|---|")
        for name, (tot, px, py) in results.items():
            lines.append(f"| {name} | {tot} | {px} | {py} |")
        fx = results["fragmented"][1]
        zx, zy = results["compact_zorder"][1:]
        lx, ly = results['compact("x")'][1:]
        lines.append(
            "\nSingle-key compaction is lopsided: the sliced key "
            f"prunes ({lx} files for x) but the other column reads "
            f"everything ({ly}) — y is uniform inside every x-slice, "
            "so its per-directory [min, max] spans the domain. The "
            f"z-order layout prunes BOTH probes ({zx} and {zy} vs "
            f"{fx} fragmented) because each directory covers a "
            "sub-rectangle of the key space; its per-column zone-map "
            "lists feed the same pruners (`_zm_lookup`) that merge "
            "and Bloom checks use. At 100 TB the choice is the same "
            "as Delta's: one dominant probe column → range-slice it; "
            "several → pay one z-clustered rewrite and every probe "
            "column prunes."
        )
        body = "\n".join(lines)
        replace_section(
            "Z-order clustering: both-column pruning, measured", body
        )
        print(body)
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
