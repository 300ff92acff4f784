"""BPE cost envelope probe (r10 verdict asks #1 + #7).

Two questions, both answered by measurement:

1. **Kernel wall vs vocabulary size** — the distinct-word Arrow
   kernel's Python encoder (operators/bpe.py::bpe_len) is claimed
   negligible because it runs per DISTINCT word; this times it over
   synthetic vocabularies of growing size under the committed
   1200-merge table (plus the old 24-merge head slice for contrast).

2. **Oracle wall vs merges-table size** — the DuckDB recursive CTE
   joins every step row against the full merges VALUES list via
   strpos; the verdict asked whether a realistic table makes the
   differential's oracle side dominate verify wall. This times the
   full oracle SQL (queries/llm.py::_bpe_sql shape) over the sf0.01
   documents table at merges-table slices 24 / 300 / 1200.

Usage: python tools/bpe_cost_probe.py [sf_dir]
Prints a markdown table ready for SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lmo_data_catalog_spark.functions.bpe_merges import MERGES  # noqa: E402
from lmo_data_catalog_spark.operators.bpe import (  # noqa: E402
    bpe_segments_ranked,
)
import lmo_data_catalog_spark.registry  # noqa: E402,F401  (load order)
from lmo_data_catalog_spark.queries.llm import _bpe_ctes  # noqa: E402
from tools.train_bpe import synth_freqs  # noqa: E402


def time_kernel(n_words: int, ranks: dict) -> float:
    """Best-of-3 wall for encoding n_words distinct synthetic words."""
    words = list(synth_freqs(n_words, seed=99))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        total = 0
        for w in words:
            total += len(bpe_segments_ranked(w, ranks))
        best = min(best, time.perf_counter() - t0)
        assert total >= n_words
    return best


def time_oracle(sf_dir: str, n_merges: int) -> tuple[float, int]:
    """Wall for the full bpe_token_counts oracle at a table slice."""
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    sql = rf"""
    WITH RECURSIVE {_bpe_ctes(MERGES[:n_merges])}
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_ws_tokens,
           CAST(SUM(l.n_bpe) AS BIGINT) AS n_bpe_tokens
    FROM toks t JOIN wlen l ON t.w = l.w
    GROUP BY t.doc_id
    """
    t0 = time.perf_counter()
    rows = con.sql(sql).fetchall()
    return time.perf_counter() - t0, len(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    print("## kernel wall vs |vocab| (distinct words, best-of-3)\n")
    print("| |vocab| | 24-merge table (s) | 1200-merge table (s) |")
    print("|---|---|---|")
    ranks_full = {p: i for i, p in enumerate(MERGES)}
    ranks_24 = {p: i for i, p in enumerate(MERGES[:24])}
    for n in (1_000, 8_000, 32_000, 128_000):
        t24 = time_kernel(n, ranks_24)
        t_full = time_kernel(n, ranks_full)
        print(f"| {n:,} | {t24:.3f} | {t_full:.3f} |")
    print("\n## oracle wall vs merges-table size "
          f"(full bpe oracle, {sf_dir})\n")
    print("| merges | oracle wall (s) | rows |")
    print("|---|---|---|")
    for n in (24, 300, 1200):
        w, rows = time_oracle(sf_dir, n)
        print(f"| {n} | {w:.2f} | {rows} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
