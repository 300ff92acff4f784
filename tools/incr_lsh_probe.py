"""Measure incremental LSH near-dup maintenance vs full recompute.

The claim under test (operators/dedup.py::LshDedupState): ingesting a
fixed-size batch probes the PERSISTED band-bucket table — cost
O(batch + matched buckets) — while the rebuild baseline re-shingles,
re-signs, and re-joins the whole corpus, O(history). This probe grows
the history and holds the batch fixed, then reports both walls plus a
one-off equivalence check (incremental candidates touching the batch
== full-recompute candidates touching the batch).

Usage: python tools/incr_lsh_probe.py  [base_hist_docs batch_docs]
Maintains the "## Incremental LSH near-dup maintenance" SCALING.md
section via tools/_shared.replace_section.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._shared import replace_section  # noqa: E402


def main() -> int:
    from pyspark.sql import functions as F

    from lmo_data_catalog_spark import cache
    from lmo_data_catalog_spark.operators.dedup import (
        LshDedupState,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from lmo_data_catalog_spark.operators.text import hashed_shingles
    from lmo_data_catalog_spark.session import get_spark

    base_hist = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    batch_n = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    spark = get_spark("incr_lsh_probe")

    def mk_docs(lo: int, n: int):
        """n synthetic docs of 30 hash-mixed tokens from a 5k-word
        vocabulary (mixing keeps cross-doc shingle overlap at random-
        collision level — an arithmetic token pattern here produces
        accidental near-dup cliques that blow the candidate sets up);
        every 17th doc repeats its predecessor's text, so true
        near-dups exist."""
        base = F.when(
            F.col("id") % 17 == 0, F.col("id") - 1
        ).otherwise(F.col("id"))
        toks = [
            F.format_string(
                "w%d", F.pmod(F.xxhash64(base, F.lit(i)), F.lit(5000))
            )
            for i in range(30)
        ]
        return spark.range(lo, lo + n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", *toks).alias("text"),
        )

    def full_pairs(docs):
        sh = hashed_shingles(
            docs, id_col="doc_id", text_col="text", n=3
        ).toDF("id", "h")
        sig = minhash_signatures(sh, id_col="id", n_hashes=64)
        return lsh_candidate_pairs(sig, id_col="id", bands=16, rows=4)

    rows = []
    for hist_mult in (1, 4, 16):
        hist_n = base_hist * hist_mult
        hist = mk_docs(0, hist_n)
        batch = mk_docs(10_000_000, batch_n)  # disjoint id space
        with tempfile.TemporaryDirectory() as tmp:
            state = LshDedupState(spark, os.path.join(tmp, "lsh"))
            state.ingest(hist, id_col="doc_id", text_col="text").count()
            cache.release_all()

            t0 = time.monotonic()
            cand = state.ingest(batch, id_col="doc_id", text_col="text")
            n_incr = cand.count()
            incr_s = time.monotonic() - t0

            t0 = time.monotonic()
            full = full_pairs(hist.unionByName(batch))
            n_full = full.count()
            full_s = time.monotonic() - t0

            equiv = ""
            if hist_mult == 1:
                # one-off correctness: restrict full to batch-touching
                # pairs; must equal the incremental candidate set.
                bt = full.filter(
                    (F.col("id_a") >= 10_000_000)
                    | (F.col("id_b") >= 10_000_000)
                )
                d = (
                    cand.exceptAll(bt).count()
                    + bt.exceptAll(cand).count()
                )
                assert d == 0, "incremental != full-recompute (batch slice)"
                equiv = " (equivalence asserted)"
            cache.release_all()
            rows.append((hist_n, batch_n, incr_s, full_s, n_incr, n_full))
            print(rows[-1], equiv, flush=True)

    load1 = os.getloadavg()[0]
    lines = [
        "## Incremental LSH near-dup maintenance",
        "",
        "`LshDedupState.ingest` shingles/signs/bands only the BATCH and",
        "probes the persisted bucket-partitioned band table with a",
        "broadcast of the batch's band rows (reading only the batch's",
        "buckets), vs the",
        "full recompute that re-processes history ∪ batch. Fixed batch,",
        "growing history (`tools/incr_lsh_probe.py`; batch-slice candidate",
        f"equality asserted exceptAll-empty at 1x; load1 {load1:.1f}):",
        "",
        "| history docs | batch docs | incremental (s) | full recompute (s) "
        "| full/incremental | batch cands | full cands |",
        "|---|---|---|---|---|---|---|",
    ]
    for hist_n, bn, incr_s, full_s, n_i, n_f in rows:
        lines.append(
            f"| {hist_n:,} | {bn:,} | {incr_s:.2f} | {full_s:.2f} "
            f"| {full_s / incr_s:.2f}x | {n_i:,} | {n_f:,} |"
        )
    r0, rN = rows[0], rows[-1]
    lines += [
        "",
        f"History x{rN[0] // r0[0]} moved the incremental wall "
        f"{rN[2] / r0[2]:.2f}x while the rebuild wall moved "
        f"{rN[3] / r0[3]:.2f}x — the batch cost is flat, and the "
        "band-table probe is physically pruned: the state lands "
        "Hive-partitioned on band_bucket = pmod(band_hash, 32) and the "
        "probe broadcasts the batch band rows against only the batch's "
        "bucket subdirectories — no Exchange on the state side "
        "(plan + file pruning pinned in tests/test_incremental_lsh.py).",
        "",
    ]
    replace_section(
        "Incremental LSH near-dup maintenance", "\n".join(lines)
    )
    print("SCALING.md updated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
