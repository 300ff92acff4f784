"""Merges-table BPE encoder (operators/bpe.py): hand-pinned
segmentations, the leftmost-single-merge vs textbook all-at-once
equivalence property (the argument the cross-engine oracle rests
on), and agreement with the DuckDB recursive-CTE oracle on the
committed merges table.
"""

from __future__ import annotations

import os
import re
import sys

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lmo_data_catalog_spark.functions.bpe_merges import MERGES
from lmo_data_catalog_spark.operators.bpe import (
    BYTE_DECODER,
    BYTE_ENCODER,
    RANKS,
    bpe_len,
    bpe_segments,
    bpe_segments_ranked,
    decode_bytelevel,
    encode_bytelevel,
    load_merges_file,
    pre_tokenize_bytelevel,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
    # against the committed 1200-merge table: high-frequency words
    # merge fully, corpus words segment into a few subwords — the
    # realistic shape (the 24-merge toy table merged everything)
    assert bpe_segments("table") == ["table"]
    assert bpe_segments("the") == ["the"]
    assert bpe_segments("spark") == ["sp", "ar", "k"]
    assert bpe_segments("window") == ["wind", "ow"]
    assert bpe_len("window") == 2
    # unseen pair falls back to characters ((z,z) is never trained:
    # the synthetic lexicon puts z only at onsets, always vowel-next)
    assert bpe_segments("zzz") == ["z", "z", "z"]
    assert bpe_len("") == 0
    # rank 0 fires first
    assert MERGES[0] == ("e", "e")
    assert bpe_segments("ee") == ["ee"]


def test_committed_merges_are_valid_ranks():
    assert len(set(MERGES)) == len(MERGES)
    assert all(RANKS[p] == i for i, p in enumerate(MERGES))
    # a realistic-scale table (r10 verdict ask #1), not the 24-merge toy
    assert len(MERGES) >= 1000
    # trainer charset contract, mirrored EXACTLY ([a-z0-9], not any
    # unicode alnum — the committed-artifact convention)
    assert all(
        re.fullmatch(r"[a-z0-9]", c)
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
        SELECT chr(31) || lhs || chr(31) || rhs || chr(31) AS pat,
               chr(31) || lhs || rhs || chr(31) AS rep, rank
        FROM (VALUES {values}) AS m(lhs, rhs, rank)
    ),
    steps AS (
        SELECT w, chr(31) || regexp_replace(w, '(.)', '\1' || chr(31), 'g')
                   AS st
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
    SELECT w, len(st) - len(replace(st, chr(31), '')) - 1 AS n FROM final
    """
    con = duckdb.connect()
    got = dict(con.sql(sql).fetchall())
    assert got == {w: bpe_len(w) for w in words}


def test_all_words_reach_singletons_or_chars():
    # every segmentation concatenates back to the word
    for w in ("spark", "sparkle", "windows", "tab", "q"):
        assert "".join(bpe_segments(w)) == w


# ------------------------------------------------------ byte-level mode


def test_byte_unicode_bijection():
    assert len(BYTE_ENCODER) == 256
    assert sorted(BYTE_ENCODER) == list(range(256))
    assert len(set(BYTE_ENCODER.values())) == 256
    # printable latin bytes map to themselves (GPT-2 contract)
    assert BYTE_ENCODER[ord("a")] == "a"
    assert BYTE_ENCODER[ord("!")] == "!"
    # space is remapped out of the printable range
    assert BYTE_ENCODER[ord(" ")] == chr(256 + ord(" "))
    assert all(BYTE_DECODER[v] == k for k, v in BYTE_ENCODER.items())


def test_pre_tokenize_hand_pinned():
    """Cases traced against the published GPT-2 pattern
    ('s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+
    |\\s+(?!\\S)|\\s+) alternative by alternative."""
    assert pre_tokenize_bytelevel("hello world") == ["hello", " world"]
    assert pre_tokenize_bytelevel("it's fine") == ["it", "'s", " fine"]
    # k-space run before a word: (k-1)-space token, then " word"
    assert pre_tokenize_bytelevel("a  b") == ["a", " ", " b"]
    assert pre_tokenize_bytelevel("a   b") == ["a", "  ", " b"]
    # tab runs: backtrack leaves the last tab to plain \s+
    assert pre_tokenize_bytelevel("\t\tabc") == ["\t", "\t", "abc"]
    # trailing whitespace is one token (lookahead holds at EOS)
    assert pre_tokenize_bytelevel("ab  ") == ["ab", "  "]
    # numbers and punctuation split off, ' ?' attaches one space
    assert pre_tokenize_bytelevel("v2 x86!") == ["v", "2", " x", "86", "!"]
    # space before apostrophe: the punctuation class takes " '"
    assert pre_tokenize_bytelevel("x 's") == ["x", " '", "s"]
    assert pre_tokenize_bytelevel("") == []


@settings(max_examples=300, deadline=None)
@given(text=st.text(max_size=40))
def test_pre_tokenize_partitions_text(text):
    toks = pre_tokenize_bytelevel(text)
    assert "".join(toks) == text
    assert all(t for t in toks)


@settings(max_examples=200, deadline=None)
@given(text=st.text(max_size=30))
def test_bytelevel_roundtrip_empty_ranks(text):
    # with no merges, symbols are exactly the mapped bytes; decode
    # must reproduce the original text for ANY unicode input
    syms = encode_bytelevel(text, {})
    assert decode_bytelevel(syms) == text


def test_bytelevel_encode_with_trained_ranks():
    """Train a tiny BYTE-LEVEL table in-test (the trainer algorithm
    over byte-mapped words) and check merges apply through the full
    encode path, including the remapped space byte."""
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from train_bpe import train

    corpus = {"hello world": 50, "hello there": 30, "world war": 20}
    sp = BYTE_ENCODER[ord(" ")]
    freqs = {}
    for phrase, f in corpus.items():
        for tok in pre_tokenize_bytelevel(phrase):
            mapped = "".join(BYTE_ENCODER[b] for b in tok.encode())
            freqs[mapped] = freqs.get(mapped, 0) + f
    ranks = {p: i for i, p in enumerate(train(freqs, 30))}
    syms = encode_bytelevel("hello world", ranks)
    assert decode_bytelevel(syms) == "hello world"
    assert len(syms) <= 3  # 'hello' and (space-led) 'world' merged up
    assert any(s.startswith(sp) for s in syms)  # ' world' kept its space
    # unseen text still round-trips and falls back toward bytes
    syms2 = encode_bytelevel("warp", ranks)
    assert decode_bytelevel(syms2) == "warp"


def test_load_merges_file(tmp_path):
    p = tmp_path / "merges.txt"
    p.write_text(
        "#version: 0.2\ne r\nin dow\nĠ w\n", encoding="utf-8"
    )
    ranks = load_merges_file(str(p))
    assert ranks == {("e", "r"): 0, ("in", "dow"): 1, ("Ġ", "w"): 2}
    # the parsed table drives the generalized encoder directly
    assert bpe_segments_ranked("er", ranks) == ["er"]


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


# ------------------------------ committed 12k byte-level table (r12)


def test_bytelevel_table_is_realistic_scale():
    """The committed merges.txt-format table must hold the r11 bar:
    >= 10k merges, loaded through the PUBLISHED-format loader, with
    leading-space (Ġ) merges present like a real byte-level table."""
    from lmo_data_catalog_spark.operators.bpe import (
        bytelevel_merges,
        bytelevel_ranks,
    )

    merges = bytelevel_merges()
    assert len(merges) >= 10_000
    assert sum(1 for l, r in merges if "Ġ" in l + r) >= 1_000
    ranks = bytelevel_ranks()
    assert ranks[merges[0]] == 0 and ranks[merges[-1]] == len(merges) - 1
    # every symbol is space-free (the published format's hard contract)
    assert all(" " not in l and " " not in r for l, r in merges)


def test_bytelevel_ascii_identity_shortcut():
    """The differential's oracle renders the mapped word as
    chr(288) || w; that equals the kernel's real BYTE_ENCODER path
    exactly when w is printable ASCII — the shared [!-~] guard."""
    from lmo_data_catalog_spark.operators.bpe import BYTE_ENCODER

    for w in ("hello", "a1b2", "x,y.z!", "'quote'", "~tilde~"):
        mapped = "".join(BYTE_ENCODER[b] for b in (" " + w).encode())
        assert mapped == "Ġ" + w


def test_incremental_trainer_matches_reference_loop():
    """tools/train_bpe_bytelevel.py's heap-indexed trainer must be
    BIT-IDENTICAL to tools/train_bpe.py's classic recount loop on the
    same lexicon (same count-then-lexicographic tie-break) — the
    committed table's provenance rests on this equivalence."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from train_bpe import synth_freqs, train
    from train_bpe_bytelevel import byte_map, train_incremental

    lex = synth_freqs(400)
    freqs = {}
    for w, f in lex.items():
        freqs[byte_map(" " + w)] = f
        bare = byte_map(w)
        freqs[bare] = freqs.get(bare, 0) + max(1, f // 10)
    assert train_incremental(freqs, 250) == train(freqs, 250)


def test_bytelevel_committed_table_segments():
    """Physics pins on the committed 12k table: frequent synth words
    collapse to ONE leading-space token; encode/decode round-trips."""
    from lmo_data_catalog_spark.operators.bpe import (
        bpe_segments_ranked,
        bytelevel_ranks,
        decode_bytelevel,
    )
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from train_bpe import synth_freqs
    from train_bpe_bytelevel import byte_map

    ranks = bytelevel_ranks()
    head = list(synth_freqs(65536))[:20]  # highest-frequency words
    one_token = 0
    for w in head:
        syms = bpe_segments_ranked(byte_map(" " + w), ranks)
        assert decode_bytelevel(syms) == " " + w
        one_token += len(syms) == 1
    assert one_token >= 15  # the Zipf head merged to whole-word tokens
