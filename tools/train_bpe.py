"""Deterministic BPE merges trainer → functions/bpe_merges.py.

Classic byte-pair-encoding training (Sennrich et al. 2016, public;
the same algorithm behind GPT-2's published merges.txt): start from
characters, repeatedly merge the most frequent adjacent symbol pair
across the word-frequency table. The output plays the role of a
published merges file — a FIXED, committed artifact that makes
tokenization corpus-independent afterward (deploying against real
data, swap in e.g. the public GPT-2 merges; the format is the same
rank-ordered pair list).

Determinism contract (what makes the cross-engine differential
possible): word frequencies come from a seeded corpus, and ties on
pair frequency break on the lexicographically SMALLEST (lhs, rhs)
pair — training is a pure function of the corpus. Merging applies
all occurrences left-to-right per iteration (standard). Training
stops early when no pair occurs twice.

The testdata corpus has only ~31 distinct words — far too small to
exercise a realistic merges table (24 merges exhausts it). The
``--synth N`` mode (r10 verdict ask #1) unions a DETERMINISTIC
synthetic English-like lexicon (seeded syllable composition, Zipf
frequencies, [a-z0-9] charset) with the corpus word frequencies so
training can run to >= 1k merges; the corpus words keep their real
counts, so the high-frequency head of the table still reflects the
actual testdata vocabulary. The synthetic lexicon is a pure function
of (seed, N): re-running the command reproduces the committed table
byte-for-byte.

Usage: python tools/train_bpe.py [sf_dir] [n_merges] [--synth N]
"""

from __future__ import annotations

import os
import re
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(
    ROOT, "lmo_data_catalog_spark", "functions", "bpe_merges.py"
)


def word_freqs(sf_dir: str) -> dict[str, int]:
    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        "SELECT w, COUNT(*) FROM ("
        "  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+'))"
        "         AS w"
        f"  FROM read_parquet('{sf_dir}/documents.parquet')"
        ") WHERE w <> '' GROUP BY w"
    ).fetchall()
    return dict(rows)


#: seed for the synthetic lexicon — part of the determinism contract
SYNTH_SEED = 11

#: building blocks for English-like synthetic words (fixed lists —
#: their ORDER matters for determinism, do not sort or extend casually)
_ONSETS = [
    "b", "c", "d", "f", "g", "h", "j", "k", "l", "m", "n", "p", "r",
    "s", "t", "v", "w", "z", "br", "ch", "cl", "cr", "dr", "fl",
    "fr", "gl", "gr", "pl", "pr", "qu", "sc", "sh", "sk", "sl",
    "sm", "sn", "sp", "st", "str", "sw", "th", "tr",
]
_VOWELS = ["a", "e", "i", "o", "u", "ai", "ea", "ee", "io", "oo", "ou"]
_CODAS = [
    "", "", "", "b", "ck", "d", "g", "k", "l", "ll", "m", "n", "nd",
    "ng", "nt", "p", "r", "rd", "s", "ss", "st", "t", "x",
]
_SUFFIXES = [
    "", "", "", "", "s", "ed", "ing", "er", "ly", "tion", "ment",
    "ness", "al", "ize", "able",
]


def synth_freqs(n_words: int, seed: int = SYNTH_SEED) -> dict[str, int]:
    """Deterministic English-like lexicon with Zipf frequencies.

    Pure function of (n_words, seed): seeded syllable composition
    (onset+vowel+coda, 1-4 syllables, optional suffix, ~3% get a
    numeric tail for [0-9] coverage), frequency ~ 2e6/(rank+10) over
    generation order. Charset stays [a-z0-9] by construction, the
    committed-artifact convention that keeps hand-reading the table
    easy (the oracle no longer REQUIRES it — it escapes quotes and
    uses a chr(31) separator; see queries/llm.py::_bpe_ctes)."""
    import random

    rng = random.Random(seed)
    seen: set[str] = set()
    out: list[str] = []
    while len(out) < n_words:
        n_syll = rng.choice([1, 2, 2, 2, 3, 3, 4])
        w = "".join(
            rng.choice(_ONSETS) + rng.choice(_VOWELS) + rng.choice(_CODAS)
            for _ in range(n_syll)
        ) + rng.choice(_SUFFIXES)
        if rng.random() < 0.03:
            w += str(rng.randrange(100))
        if w in seen:
            continue
        seen.add(w)
        out.append(w)
    return {w: max(1, 2_000_000 // (r + 10)) for r, w in enumerate(out)}


def train(freqs: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    words = {w: list(w) for w in freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            f = freqs[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (lhs, rhs), _ = best
        merges.append((lhs, rhs))
        merged = lhs + rhs
        for w, syms in words.items():
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
    return merges


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_synth = 0
    for a in sys.argv[1:]:
        if a.startswith("--synth"):
            n_synth = int(a.split("=", 1)[1]) if "=" in a else 8000
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    n_merges = int(args[1]) if len(args) > 1 else 24
    corpus = word_freqs(sf_dir)
    freqs = synth_freqs(n_synth) if n_synth else {}
    n_synth_words = len(freqs)
    for w, f in corpus.items():
        freqs[w] = freqs.get(w, 0) + f
    charset = {c for w in freqs for c in w}
    bad = [c for c in charset if not re.fullmatch(r"[a-z0-9]", c)]
    # [a-z0-9] is a committed-artifact CONVENTION now, not an oracle
    # safety requirement (the oracle escapes quotes and separates
    # symbols with chr(31) — queries/llm.py::_bpe_ctes); the hard
    # requirement is only that no symbol contains the separator.
    assert not any("\x1f" in w for w in freqs), "chr(31) in corpus word"
    assert not bad, f"non-[a-z0-9] chars in training words: {bad!r}"
    merges = train(freqs, n_merges)
    provenance = (
        f"{sf_dir}/documents.parquet ({len(corpus)} corpus words)"
        + (
            f" + synth_freqs({n_synth_words}, seed={SYNTH_SEED})"
            if n_synth_words
            else ""
        )
    )
    lines = [
        '"""GENERATED by tools/train_bpe.py — do not edit by hand.',
        "",
        f"Trained {time.strftime('%Y-%m-%d')} on {provenance},",
        f"{len(merges)} merges over {len(freqs)} distinct words.",
        "Rank order = list order (rank 1 first). See tools/train_bpe.py",
        'for the determinism contract."""',
        "",
        "MERGES: list[tuple[str, str]] = [",
    ]
    for lhs, rhs in merges:
        lines.append(f"    ({lhs!r}, {rhs!r}),")
    lines.append("]")
    lines.append("")
    with open(OUT, "w") as fh:
        fh.write("\n".join(lines))
    print(f"{OUT}: {len(merges)} merges from {len(freqs)} words")
    for i, m in enumerate(merges, 1):
        print(i, m)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
