"""Merges-table BPE encoder (Sennrich et al. 2016; the GPT-2
tokenizer's format — public).

Reference status: extension surface (the 346-line reference script,
01_source_me.R, has no tokenizer); closes the r9 verdict ask for
BPE-EXACT token accounting — ``token_counts``'s whitespace / regex
pre-tokenizer diverges 30-50% from merges-table BPE on real text, and
budget decisions are made in BPE tokens.

Semantics — chosen to be provably cross-engine reproducible:

- Pre-tokenize with the repo-standard whitespace tokenizer
  (operators/text.py::tokens); BPE runs within each word, no
  end-of-word marker.
- Encoding loop: among all adjacent symbol pairs present in the
  word, pick the one with the LOWEST merge rank, merge its LEFTMOST
  occurrence, repeat until no pair is in the merges table.

The leftmost-single-merge step is equivalent to the textbook
"merge ALL occurrences of the best pair per iteration" loop: a merge
rule involving a newly formed symbol can only have been learned
AFTER the rule that formed the symbol, so merging one occurrence of
the current best pair can only create HIGHER-rank pairs — the best
pair stays best until exhausted, and single-step vs all-at-once
reach the same fixpoint. The single-step form is what the DuckDB
oracle's recursive CTE implements (queries/llm.py::_BPE_SQL), making
the two engines' tokenizations identical by construction, not by
floating-point luck.

The merges table (functions/bpe_merges.py) is a GENERATED, committed
artifact — tools/train_bpe.py trains it deterministically from the
sf0.1 corpus; in deployment the same rank-ordered pair-list format
accepts the published GPT-2 merges file verbatim.
"""

from __future__ import annotations

from ..functions.bpe_merges import MERGES

#: pair -> rank (0 = highest priority), the GPT-2 merges.txt contract
RANKS: dict[tuple[str, str], int] = {
    pair: rank for rank, pair in enumerate(MERGES)
}


def bpe_segments(word: str) -> list[str]:
    """Segment one pre-tokenized word into BPE symbols."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = RANKS.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_len(word: str) -> int:
    """Number of BPE tokens in one word (0 for the empty string)."""
    if not word:
        return 0
    return len(bpe_segments(word))
