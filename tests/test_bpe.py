"""Merges-table BPE encoder (operators/bpe.py): hand-pinned
segmentations, the leftmost-single-merge vs textbook all-at-once
equivalence property (the argument the cross-engine oracle rests
on), and agreement with the DuckDB recursive-CTE oracle on the
committed merges table.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lmo_data_catalog_spark.functions.bpe_merges import MERGES
from lmo_data_catalog_spark.operators.bpe import (
    RANKS,
    bpe_len,
    bpe_segments,
)


def all_at_once_encode(word, ranks):
    """Textbook BPE (Sennrich et al. / GPT-2 encoder.py shape): pick
    the lowest-rank pair present, merge ALL its occurrences left to
    right, repeat."""
    syms = list(word)
    while len(syms) > 1:
        pairs = {
            (a, b) for a, b in zip(syms, syms[1:]) if (a, b) in ranks
        }
        if not pairs:
            break
        lhs, rhs = min(pairs, key=lambda p: ranks[p])
        out, i = [], 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and syms[i] == lhs
                and syms[i + 1] == rhs
            ):
                out.append(lhs + rhs)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_hand_pinned_segmentations():
    # from the committed merges: 'spark' = s+park via (par,k),(s,park)
    assert bpe_segments("spark") == ["spark"]
    assert bpe_segments("window") == ["window"]
    assert bpe_len("window") == 1
    # unseen word falls back toward characters, known pieces merge
    assert bpe_segments("zzz") == ["z", "z", "z"]
    assert bpe_len("") == 0
    # rank order matters: 'er' (rank 1) fires before later rules
    assert "er" in {
        s for w in ("merge", "era") for s in bpe_segments(w)
    } or bpe_segments("merge") == ["merge"]


def test_committed_merges_are_valid_ranks():
    assert len(set(MERGES)) == len(MERGES)
    assert all(RANKS[p] == i for i, p in enumerate(MERGES))
    # trainer charset contract that keeps the SQL VALUES literal safe
    assert all(
        c.isalnum() and c.lower() == c
        for l, r in MERGES
        for c in l + r
    )


@settings(max_examples=200, deadline=None)
@given(
    word=st.text(alphabet="abcd", min_size=1, max_size=12),
    data=st.data(),
)
def test_leftmost_single_equals_all_at_once(word, data):
    """The oracle's recursive CTE merges ONE leftmost occurrence per
    step; the encoder must reach the same fixpoint as the textbook
    all-at-once loop for ANY valid ranks table (pairs involving a
    formed symbol ranked after the forming rule — guaranteed here by
    building the table the way training does: each rule's operands
    are chars or outputs of earlier rules)."""
    symbols = list("abcd")
    n_rules = data.draw(st.integers(0, 8))
    rules = []
    for _ in range(n_rules):
        lhs = data.draw(st.sampled_from(symbols))
        rhs = data.draw(st.sampled_from(symbols))
        if (lhs, rhs) in rules:
            continue
        rules.append((lhs, rhs))
        symbols.append(lhs + rhs)
    ranks = {p: i for i, p in enumerate(rules)}

    def leftmost_single(word):
        syms = list(word)
        while len(syms) > 1:
            best, bi = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
        return syms

    assert leftmost_single(word) == all_at_once_encode(word, ranks)


def test_encoder_matches_duckdb_recursive_cte():
    """Run the oracle's recursive CTE on a word list straight from
    SQL literals and compare counts with the Python encoder — the
    same differential the driver runs, minus Spark."""
    words = [
        "spark", "window", "merge", "table", "column", "zzz", "a",
        "partition", "stream", "erin",
    ]
    values = ", ".join(
        f"('{l}', '{r}', {i + 1})" for i, (l, r) in enumerate(MERGES)
    )
    wvals = ", ".join(f"('{w}')" for w in words)
    sql = rf"""
    WITH RECURSIVE vocab(w) AS (VALUES {wvals}),
    pats AS (
        SELECT '|' || lhs || '|' || rhs || '|' AS pat,
               '|' || lhs || rhs || '|' AS rep, rank
        FROM (VALUES {values}) AS m(lhs, rhs, rank)
    ),
    steps AS (
        SELECT w, '|' || regexp_replace(w, '(.)', '\1|', 'g') AS st
        FROM vocab
        UNION ALL
        SELECT w, substr(st, 1, p - 1) || rep || substr(st, p + len(pat))
        FROM (
            SELECT w, st, pat, rep, strpos(st, pat) AS p,
                   ROW_NUMBER() OVER (PARTITION BY w ORDER BY rank) AS rn
            FROM steps JOIN pats ON strpos(st, pat) > 0
        ) WHERE rn = 1
    ),
    final AS (
        SELECT w, st FROM steps s
        WHERE NOT EXISTS (
            SELECT 1 FROM pats p WHERE strpos(s.st, p.pat) > 0)
    )
    SELECT w, len(st) - len(replace(st, '|', '')) - 1 AS n FROM final
    """
    con = duckdb.connect()
    got = dict(con.sql(sql).fetchall())
    assert got == {w: bpe_len(w) for w in words}


def test_all_words_reach_singletons_or_chars():
    # every segmentation concatenates back to the word
    for w in ("spark", "sparkle", "windows", "tab", "q"):
        assert "".join(bpe_segments(w)) == w


@settings(max_examples=150, deadline=None)
@given(word=st.text(alphabet="abcdefghijklmnopqrstuvwxyz",
                    min_size=1, max_size=14))
def test_committed_table_matches_all_at_once(word):
    """The shipped encoder against the COMMITTED merges table must
    match the textbook all-at-once loop for arbitrary lowercase words
    (the committed table is valid-by-training, so the equivalence
    argument applies to it directly)."""
    got = bpe_segments(word)
    assert got == all_at_once_encode(word, RANKS)
    assert "".join(got) == word
