"""Deterministic BYTE-LEVEL BPE trainer at realistic table scale →
functions/bpe_merges_bytelevel.txt (the PUBLISHED GPT-2 merges.txt
format, consumed through operators/bpe.py::load_merges_file — so the
committed artifact exercises the exact code path a user vendoring the
real 50k table would hit; r11 verdict ask #2).

Differences from tools/train_bpe.py (which stays the 1200-merge
char-level table's source of truth):

- BYTE-LEVEL alphabet: every training unit is mapped through the
  GPT-2 byte->unicode bijection (operators/bpe.py::BYTE_ENCODER), and
  each lexicon word trains in BOTH its mid-text form ('Ġ' + word —
  the leading-space convention that dominates real GPT-2 tables) and
  its sentence-initial bare form at ~1/10 the frequency, so the table
  contains the 'Ġ'-prefixed merges a published table has.
- INCREMENTAL pair counting: the classic recount-everything loop is
  O(n_merges x corpus) — fine at 1200 merges, hours at 12k. This
  trainer keeps pair->count and pair->words indexes and a lazy
  max-heap; a merge re-counts only the words that contain its pair
  (each word of length L is touched <= L times, so total work is
  O(sum L^2), seconds at 128k words). Tie-break is IDENTICAL to
  train_bpe.py: highest count, then lexicographically smallest
  (lhs, rhs) — training is a pure function of the lexicon.

Determinism contract: lexicon = synth_freqs(n, seed=11) from
tools/train_bpe.py (unchanged, its order-sensitive building blocks
included) unioned with the sf corpus word frequencies; merging
applies all occurrences left-to-right per iteration; stops early when
no pair occurs twice. Re-running reproduces the file byte-for-byte.

Usage: python tools/train_bpe_bytelevel.py [sf_dir] [n_merges] [n_synth] [out]

``out`` (default functions/bpe_merges_bytelevel.txt) lets the 50k-rank
GPT-2-scale table (r12 verdict ask #5) train to its own file without
clobbering the committed 12k artifact.
"""

from __future__ import annotations

import heapq
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from train_bpe import SYNTH_SEED, synth_freqs, word_freqs  # noqa: E402

from lmo_data_catalog_spark.operators.bpe import BYTE_ENCODER  # noqa: E402

OUT = os.path.join(
    ROOT, "lmo_data_catalog_spark", "functions", "bpe_merges_bytelevel.txt"
)


def byte_map(text: str) -> str:
    return "".join(BYTE_ENCODER[b] for b in text.encode("utf-8"))


def train_incremental(
    freqs: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE training with incremental pair bookkeeping; output
    is IDENTICAL to train_bpe.py::train on the same input (pinned by
    test_bpe.py), just not quadratic in n_merges."""
    words = {w: list(w) for w in freqs}
    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[str]] = {}

    def add_word(w: str, sign: int) -> None:
        f = freqs[w] * sign
        syms = words[w]
        for a, b in zip(syms, syms[1:]):
            p = (a, b)
            counts[p] = counts.get(p, 0) + f
            if sign > 0:
                where.setdefault(p, set()).add(w)

    for w in words:
        add_word(w, +1)

    # lazy max-heap on (-count, lhs, rhs): stale entries are skipped
    # when their stored count no longer matches the live one
    heap = [(-c, p[0], p[1]) for p, c in counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negc, lhs, rhs = heapq.heappop(heap)
        p = (lhs, rhs)
        live = counts.get(p, 0)
        if -negc != live:
            if live >= 2:
                heapq.heappush(heap, (-live, lhs, rhs))
            continue
        if live < 2:
            break
        merges.append(p)
        merged = lhs + rhs
        touched: set[tuple[str, str]] = set()
        for w in list(where.get(p, ())):
            syms = words[w]
            # stale index entry: the pair may have been merged away
            has = any(
                a == lhs and b == rhs for a, b in zip(syms, syms[1:])
            )
            if not has:
                where[p].discard(w)
                continue
            add_word(w, -1)
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == lhs
                    and syms[i + 1] == rhs
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
            add_word(w, +1)
            for a, b in zip(out, out[1:]):
                touched.add((a, b))
        counts.pop(p, None)
        where.pop(p, None)
        for t in touched:
            c = counts.get(t, 0)
            if c >= 2:
                heapq.heappush(heap, (-c, t[0], t[1]))
    return merges


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    n_merges = int(args[1]) if len(args) > 1 else 12000
    n_synth = int(args[2]) if len(args) > 2 else 65536
    out = args[3] if len(args) > 3 else OUT

    t0 = time.time()
    lex = synth_freqs(n_synth)
    for w, f in word_freqs(sf_dir).items():
        lex[w] = lex.get(w, 0) + f
    freqs: dict[str, int] = {}
    for w, f in lex.items():
        freqs[byte_map(" " + w)] = f  # mid-text form: 'Ġ' + word
        bare = byte_map(w)
        freqs[bare] = freqs.get(bare, 0) + max(1, f // 10)
    assert not any("\x1f" in w for w in freqs), "chr(31) in training unit"
    assert not any(" " in w for w in freqs), "raw space survived byte map"

    merges = train_incremental(freqs, n_merges)
    stamp = time.strftime("%Y-%m-%d")
    lines = [
        "#version: 0.2",
        "# GENERATED by tools/train_bpe_bytelevel.py — do not edit.",
        f"# Trained {stamp}: synth_freqs({n_synth}, seed={SYNTH_SEED})"
        f" + {sf_dir} corpus words,",
        f"# byte-level (GPT-2 bijection), {len(merges)} merges over"
        f" {len(freqs)} training units.",
        "# Format = the published GPT-2 merges.txt contract; loaded by",
        "# operators/bpe.py::load_merges_file.",
    ]
    lines += [f"{l} {r}" for l, r in merges]
    with open(out, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")
    n_g = sum(1 for l, r in merges if "Ġ" in l + r)
    print(
        f"wrote {out}: {len(merges)} merges ({n_g} involve Ġ) from "
        f"{len(freqs)} units in {time.time() - t0:.1f}s"
    )


if __name__ == "__main__":
    main()
