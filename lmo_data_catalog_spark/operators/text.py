"""Text-analysis operators for LLM data pipelines: tokenization,
shingling, quality metrics, language-ID heuristics, fingerprints.

Everything is built-in JVM expressions (split/transform/sequence/
regexp) — zero Python UDFs, full whole-stage codegen, linear scans.
At 100 TB these are embarrassingly parallel map-side ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/stopword language-ID
# heuristic. Deterministic and SQL-expressible (word-set membership).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "fr": ("le", "la", "et"),
    "de": ("der", "die", "und"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# BPE-ish pre-tokenizer: word pieces or single non-space punctuation.
BPE_TOKEN_PATTERN = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def shingles(df: DataFrame, *, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Pure expression shingling: ``transform(sequence(...), slice)`` —
    no UDF. Documents shorter than n words yield no shingles.
    """
    toks = _spread(df).select(F.col(id_col), tokens(text_col).alias("__toks"))
    grams = toks.select(
        id_col,
        F.when(
            F.size("__toks") >= n,
            F.expr(
                f"transform(sequence(0, size(__toks) - {n}),"
                f" i -> concat_ws(' ', slice(__toks, i + 1, {n})))"
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("__grams"),
    )
    # dedupe is WITHIN-doc (set semantics per document), so
    # array_distinct does it map-side — no shuffle, unlike .distinct().
    # explode_outer + post-filter, NOT explode: inner explode lets
    # InferFiltersFromGenerate push `size(__grams) > 0` below the
    # Generate, where predicate pushdown re-inlines the whole shingle
    # transform into the scan filter — every document would shingle
    # TWICE. The null-filter on the generated column stays above.
    return grams.select(
        id_col, F.explode_outer(F.array_distinct("__grams")).alias("shingle")
    ).where(F.col("shingle").isNotNull())


def hashed_shingles(
    df: DataFrame, *, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per document, as 64-bit hashes:
    (id, h). The set-similarity workhorse representation — all
    downstream shuffles/joins carry 8-byte longs instead of shingle
    strings, and xxhash64 collisions (~|shingles|²/2⁶⁵) are far below
    any measurable effect on Jaccard counts.
    """
    toks = _spread(df).select(F.col(id_col), tokens(text_col).alias("__toks"))
    grams = toks.select(
        id_col,
        F.when(
            F.size("__toks") >= n,
            F.expr(
                f"transform(sequence(0, size(__toks) - {n}),"
                f" i -> xxhash64(concat_ws(' ', slice(__toks, i + 1, {n}))))"
            ),
        )
        .otherwise(F.array().cast("array<bigint>"))
        .alias("__grams"),
    )
    # per-doc set semantics via array_distinct: map-side, no shuffle.
    # explode_outer + post-filter for the same InferFiltersFromGenerate
    # double-evaluation reason as `shingles` above.
    return grams.select(
        id_col, F.explode_outer(F.array_distinct("__grams")).alias("h")
    ).where(F.col("h").isNotNull())


def _spread(df: DataFrame) -> DataFrame:
    """Repartition ahead of row-expanding work when the scan produced
    few input splits (small single-file inputs park the whole explode
    on one task). Inputs already split across many files — the 100 TB
    case — pass through untouched.

    Uses ``df.inputFiles()`` (driver-side file-index metadata, no job)
    rather than ``df.rdd.getNumPartitions()``, which forced a
    DataFrame→RDD plan conversion at every query construction.
    Non-file-backed plans (in-memory test frames, streaming) report no
    input files and pass through.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # noqa: BLE001 — non-file plans: leave untouched
        return df
    if 0 < n_files < max(2, target // 2):
        return df.repartition(target)
    return df


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_token_count(col: Column | str) -> Column:
    """Count of BPE-ish pre-tokens (word pieces + punctuation)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_TOKEN_PATTERN))


def stopword_count(col: Column | str, stopwords=STOPWORDS) -> Column:
    """Number of tokens that are stopwords (lambda-filter, JVM-side)."""
    return F.size(F.filter(tokens(col), lambda t: t.isin(*stopwords)))


def punct_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"[.,!?;:]"))


def quality_metrics(col: Column | str) -> dict[str, Column]:
    """Quality-scoring bundle: lengths and ratios used to filter
    low-quality documents in training-data pipelines."""
    n_tok = token_count(col)
    c = F.col(col) if isinstance(col, str) else col
    return {
        "n_chars": F.length(c).cast("int"),
        "n_tokens": n_tok.cast("int"),
        "punct_ratio": punct_count(col) / F.greatest(F.length(c), F.lit(1)),
        "stopword_ratio": stopword_count(col) / F.greatest(n_tok, F.lit(1)),
        "avg_token_len": (F.length(F.regexp_replace(c, r"\s+", ""))
                          / F.greatest(n_tok, F.lit(1))),
    }


def lang_id(col: Column | str) -> Column:
    """Marker-stopword language ID: first language whose markers all
    appear in the token set; 'unk' otherwise. Deterministic, cheap,
    SQL-mirrorable — the heuristic stand-in for a real n-gram model."""
    toks = tokens(col)
    expr = F.lit("unk")
    for lang, markers in reversed(list(LANG_MARKERS.items())):
        hit = None
        for m in markers:
            h = F.array_contains(toks, m)
            hit = h if hit is None else (hit & h)
        expr = F.when(hit, lang).otherwise(expr)
    return expr


def gopher_quality(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition/shape quality gate (Rae et al. 2021
    §A1.1 class of signals) over any (id, text) frame: token count,
    mean word length, max-bigram repetition fraction, combined pass
    flag. See queries/advanced.py::gopher_quality_flags for the
    oracle-checked registry wrapper and the tokenize-once /
    explode_outer plan rationale."""
    # r14 map-only rewrite (guide §2.4): the old shape exploded the
    # bigrams, counted them per (doc, bigram) through an exchange,
    # re-aggregated per doc through the same exchange's residue, and
    # joined the stats back onto a SECOND evaluation of the tokenize
    # projection (base and bigrams were separate branches over `pre`;
    # Catalyst does not dedupe shared subtrees). A document's bigram
    # multiset fits in one array, so the max multiplicity is the
    # longest equal-run of the SORTED per-doc bigram array — one
    # in-row fold, no explode, no exchange, no join: the quality gate
    # is now literally the embarrassingly-parallel single scan the
    # docstring advertises. maxc/total are the identical integers the
    # grouped counts produced (multiplicity in the array == count per
    # bigram; size == sum of counts), so the oracle arithmetic is
    # unchanged, including the <2-token NULL→0.0 coalesce path
    # (empty array → 0/0 → NULL → 0.0, as the old left join's absent
    # stats row did).
    pre = df.select(
        F.col(id_col),
        tokens(text_col).alias("__toks"),
        F.length(
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", "")
        ).alias("__n_ch"),
    )
    withbg = pre.select(
        id_col,
        F.size("__toks").alias("__nt"),
        "__n_ch",
        F.when(
            F.size("__toks") >= 2,
            F.sort_array(
                F.expr(
                    "transform(sequence(0, size(__toks) - 2),"
                    " i -> xxhash64(concat_ws(' ', slice(__toks, i + 1, 2))))"
                )
            ),
        )
        .otherwise(F.array().cast("array<bigint>"))
        .alias("__bg"),
    )
    # longest equal-run over the sorted array == max bigram count
    max_run = F.expr(
        "aggregate(__bg,"
        " named_struct('p', CAST(NULL AS BIGINT),"
        "              'r', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT)),"
        " (acc, x) -> named_struct('p', x,"
        "   'r', IF(acc.p IS NOT NULL AND x = acc.p,"
        "           acc.r + 1, CAST(1 AS BIGINT)),"
        "   'b', greatest(acc.b,"
        "                 IF(acc.p IS NOT NULL AND x = acc.p,"
        "                    acc.r + 1, CAST(1 AS BIGINT)))),"
        " acc -> acc.b)"
    )
    scored = withbg.select(
        id_col,
        "__nt",
        (F.col("__n_ch") / F.greatest(F.col("__nt"), F.lit(1))).alias(
            "mwl"
        ),
        max_run.alias("__maxc"),
        # sum of per-bigram counts == the bigram count itself; cast to
        # bigint to keep the old SUM(c) operand type in the division
        F.size("__bg").cast("bigint").alias("__total"),
    )
    frac = F.coalesce(F.col("__maxc") / F.col("__total"), F.lit(0.0))
    return scored.select(
        id_col,
        F.col("__nt").cast("int").alias("n_tokens"),
        F.round("mwl", 6).alias("mean_word_len"),
        F.round(frac, 6).alias("max_bigram_frac"),
        (
            (F.col("__nt") >= 5)
            & (F.col("__nt") <= 10000)
            & (F.col("mwl") >= 2)
            & (F.col("mwl") <= 12)
            & (frac <= 0.2)
        ).alias("quality_pass"),
    )


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase
    text (the canonical exact-dedup key)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


# --------------------------------------------------- HTML -> text extraction
#
# The first stage of every crawl pipeline (r10 verdict ask #6):
# boilerplate-aware markup-to-text, kept strictly expression-level so
# it is whole-stage-codegen'd AND oracle-expressible — every regex
# below is written to the Java-regex ∩ RE2 common subset (inline
# (?is) flags, lazy quantifiers, NO backreferences — RE2 lacks them,
# which is why script and style blocks are stripped by two separate
# patterns instead of one <(script|style)>…</\1>).

#: minimal HTML entity map, decoded after tag stripping; '&amp;' must
#: decode LAST so '&amp;lt;' yields the literal '&lt;' (standard
#: single-pass entity semantics)
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

_RE_SCRIPT = r"(?is)<script[^>]*>.*?</script>"
_RE_STYLE = r"(?is)<style[^>]*>.*?</style>"
_RE_COMMENT = r"(?s)<!--.*?-->"
_RE_TAG = r"<[^>]*>"
_RE_ANCHOR = r"(?is)<a[^>]*>(.*?)</a>"


def _decode_entities(c: Column) -> Column:
    for ent, ch in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _strip_markup(c: Column) -> Column:
    """script/style/comment blocks -> ' ', then every tag -> ' ',
    entity decode, whitespace normalize + trim."""
    c = F.regexp_replace(c, _RE_SCRIPT, " ")
    c = F.regexp_replace(c, _RE_STYLE, " ")
    c = F.regexp_replace(c, _RE_COMMENT, " ")
    c = F.regexp_replace(c, _RE_TAG, " ")
    c = _decode_entities(c)
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def html_text(col: Column | str) -> Column:
    """Visible text of an HTML document: script/style/comments
    removed, tags stripped, entities decoded, whitespace normalized."""
    c = F.col(col) if isinstance(col, str) else col
    return _strip_markup(c)


def html_link_density(col: Column | str) -> Column:
    """Fraction of visible characters that live inside <a> anchors —
    the classic boilerplate signal (nav bars / ad blocks / footers
    are link-dense; body prose is not). Definition: stripped anchor
    inner text length / stripped full text length, both under the
    same normalization, 0.0 for empty documents."""
    c = F.col(col) if isinstance(col, str) else col
    body = _strip_markup(c)
    anchors = _strip_markup(
        F.concat_ws(" ", F.regexp_extract_all(c, F.lit(_RE_ANCHOR), F.lit(1)))
    )
    return F.when(F.length(body) == 0, F.lit(0.0)).otherwise(
        F.length(anchors) / F.length(body)
    )


def heavy_hitters_cms(
    df,
    *,
    item_col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
    candidates: list | None = None,
    sample_fraction: float = 0.01,
    max_candidates: int = 100_000,
):
    """Approximate heavy hitters via Spark's built-in count-min sketch
    — the sub-linear-memory counterpart to the exact
    ``word_freq_topk`` groupBy, for 100 TB streams where even the
    distinct-item set won't fit an executor.

    Two passes, both bounded:

    1. SKETCH: ``F.count_min_sketch`` aggregates the whole column into
       one (eps, confidence) sketch — a few KB on the driver
       regardless of cardinality, merged map-side like any partial
       aggregate.
    2. CANDIDATES: frequencies can only be read out for known items,
       so candidates come from a seeded sample's distincts (any true
       heavy hitter appears in a sample with overwhelming probability)
       unless the caller supplies them. The sample's distinct set is
       HARD-CAPPED at ``max_candidates`` before it is collected — on
       a high-cardinality column the sample-distinct would otherwise
       be unbounded driver state; if the cap trips (detected by an
       over-fetch of one row), the function raises rather than
       silently scoring a truncated candidate set, and the caller
       should pass explicit ``candidates`` (or lower
       ``sample_fraction``). Each candidate is then estimated
       driver-side against the JVM sketch.

    Returns ``[(item, estimated_count)]`` sorted descending. CMS
    guarantees estimate >= true count, and <= true + eps*N with the
    given confidence — the overestimate-only direction is what makes
    it safe for threshold screens (no heavy hitter is missed).
    """
    from pyspark.sql import functions as F

    raw = df.agg(
        F.count_min_sketch(
            F.col(item_col), F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("sk")
    ).first()["sk"]
    if raw is None:  # empty input -> no sketch, no hitters
        return []
    sketch_bytes = bytes(raw)
    if candidates is None:
        candidates = [
            r[0]
            for r in df.sample(fraction=sample_fraction, seed=seed)
            .select(item_col)
            .distinct()
            .limit(max_candidates + 1)
            .collect()
        ]
        if len(candidates) > max_candidates:
            raise ValueError(
                f"sampled candidate set exceeds max_candidates="
                f"{max_candidates}; pass explicit candidates or lower "
                "sample_fraction — a silently truncated set would "
                "drop heavy hitters at random"
            )
    spark = df.sparkSession
    jvm = spark.sparkContext._jvm
    bis = jvm.java.io.ByteArrayInputStream(sketch_bytes)
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    out = [(c, cms.estimateCount(c)) for c in candidates]
    out.sort(key=lambda kv: (-kv[1], str(kv[0])))
    return out


def pack_sequences_greedy(
    df: DataFrame,
    *,
    id_col: str,
    weight_col: str,
    capacity: int,
    n_shards: int = 64,
    shard_expr: Column | None = None,
) -> DataFrame:
    """Greedy first-fit-in-order sequence packing — the context-window
    packing step of a training pipeline (docs concatenated into
    ``capacity``-token bins without splitting; a new bin opens when
    the next doc would overflow a non-empty bin, so an oversize doc
    gets a bin alone).

    Packing is prefix-sequential, which does not distribute — so the
    GLOBAL stream is sharded by ``pmod(xxhash64(id), n_shards)`` and
    the greedy scan runs per shard over rows ordered by ``id_col``:
    deterministic, embarrassingly parallel, and at 100 TB ``n_shards``
    scales with the cluster while each task streams one shard through
    a single Arrow batch sequence. The per-shard scan is the one
    genuinely order-dependent loop in this codebase, so it uses the
    sanctioned grouped-map escape hatch (``applyInPandas`` — Arrow
    batches, never row-at-a-time Python; allow-listed in
    tests/test_plan_hygiene.py).

    Returns (id, shard, bin_idx, weight) — bin_idx is per-shard,
    0-based; (shard, bin_idx) is the global bin key. Registry query
    ``pack_documents_greedy`` pins it against a recursive-CTE oracle
    computing the identical fold.
    """
    import pandas as pd

    from pyspark.sql import types as ST

    out_schema = ST.StructType(
        [
            df.schema[id_col],
            ST.StructField("shard", ST.IntegerType()),
            ST.StructField("bin_idx", ST.IntegerType()),
            ST.StructField("weight", ST.LongType()),
        ]
    )

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col, kind="mergesort")
        bins = []
        fill, b = 0, 0
        for w in pdf[weight_col]:
            w = int(w)
            if fill > 0 and fill + w > capacity:
                b += 1
                fill = 0
            fill += w
            bins.append(b)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "shard": pdf["__shard"],
                "bin_idx": bins,
                "weight": pdf[weight_col].astype("int64"),
            }
        )

    if shard_expr is None:
        # default: hash-sharding (skew-proof); oracle-checked callers
        # pass a portable arithmetic shard instead (DuckDB has no
        # xxhash64) — the packing fold is identical either way.
        shard_expr = F.pmod(F.xxhash64(id_col), F.lit(n_shards))
    sharded = df.select(
        F.col(id_col),
        F.col(weight_col),
        shard_expr.cast("int").alias("__shard"),
    )
    return sharded.groupBy("__shard").applyInPandas(pack, out_schema)
