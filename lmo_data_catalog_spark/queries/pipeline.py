"""Training-data pipeline queries beyond the LLM basics (SURVEY §7 E):
IVF-style ANN, TF-IDF term extraction, benchmark-contamination
screening, and deterministic stratified sampling.

Determinism rules follow queries.llm: rational arithmetic only (no
libm log/exp whose ulp could differ across engines), explicit
tie-breaks on every rank/top-k, and the left-deep cosine contract
from operators.similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import cache
from ..catalog import Catalog
from ..functions import epoch_us
from ..operators import text as T
from ..operators.dedup import connected_components, minhash_lsh_dedup_pairs
from ..operators.similarity import (
    cosine_pair,
    cosine_to_centroids_kernel,
    norm_sq,
)
from ..operators.windows import global_row_number, global_running_sum
from ..registry import query
from .llm import _SHINGLES_SQL, DIM, _sql_cosine, _sql_dot

# ---------------------------------------------------------------------- IVF ANN

_IVF_SQL = f"""
    WITH cents AS (
        SELECT vec_id AS cent_id, embedding AS cvec
        FROM embeddings WHERE vec_id BETWEEN 1 AND 8
    ),
    assign AS (
        SELECT e.vec_id, c.cent_id,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_sql_cosine('e.embedding', 'c.cvec')} DESC, c.cent_id
               ) AS rn
        FROM embeddings e CROSS JOIN cents c
    ),
    a1 AS (SELECT vec_id, cent_id FROM assign WHERE rn = 1),
    qc AS (SELECT cent_id FROM a1 WHERE vec_id = 0),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, ROUND({_sql_cosine('e.embedding', 'q.qv')}, 6) AS cosine
    FROM embeddings e
    JOIN a1 ON a1.vec_id = e.vec_id
    JOIN qc ON a1.cent_id = qc.cent_id
    CROSS JOIN q
    ORDER BY {_sql_cosine('e.embedding', 'q.qv')} DESC, e.vec_id
    LIMIT 10
"""


def _collect_centroids(e: DataFrame) -> list[tuple[int, list[float]]]:
    """The 8-row deterministic centroid table (vec_id 1-8) as the
    kernel's collected form — a bounded collect (kmeans-state class).
    Construction is eager (one tiny Spark job at plan-build time);
    shared by ann_ivf_topk and ann_ivf_multiprobe_topk."""
    cent_rows = sorted(
        e.filter(F.col("vec_id").between(1, 8))
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r["vec_id"],
    )
    return [(int(r["vec_id"]), list(r["embedding"])) for r in cent_rows]


@query("ann_ivf_topk", oracle=_IVF_SQL, tags=("similarity", "ann", "ivf"))
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: assign every vector to its nearest of
    8 deterministic centroids (vec_id 1-8), then search only the
    query's cell. The scale path: the assignment is one Arrow batch
    kernel (r14; was a broadcast crossJoin + interpreted HOF folds) +
    one window, the cell is ~1/8 of the data (a partition key at
    100 TB), and the final top-k is TakeOrderedAndProject."""
    cat = Catalog(spark, sf_dir)
    e = cat.embeddings
    # the Arrow kernel replaces the crossJoin(broadcast cents) +
    # cosine_pair assign whose three interpreted HOF folds per pair
    # dominated this stage (r14, guide §4.2) — bit-equal to the fold
    # expression, pinned in tests/test_operators.py
    cents = _collect_centroids(e)
    w = Window.partitionBy("vec_id").orderBy(
        F.col("__cos").desc(), F.col("cent_id").asc()
    )
    # assign feeds both the query-cell lookup and the cell filter —
    # persist so the kernel+window lineage runs once
    assign = (
        cosine_to_centroids_kernel(
            e, cents, vec_col="embedding", keep=["vec_id"]
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cent_id")
    )
    assign = cache.track(assign)
    qc = F.broadcast(
        assign.filter(F.col("vec_id") == 0).select(
            F.col("cent_id").alias("qcent")
        )
    )
    cell = assign.join(qc, assign.cent_id == qc.qcent).select("vec_id")
    q = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    )
    return (
        e.join(cell, on="vec_id")
        .crossJoin(q)
        .select("vec_id", cosine_pair("embedding", "qv", DIM).alias("__cos"))
        .orderBy(F.col("__cos").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", F.round("__cos", 6).alias("cosine"))
    )


#: cells the IVF multiprobe variant searches — the standard recall
#: lever the single-cell query lacks (LSH got Hamming-1 multiprobe in
#: r6; this is the IVF counterpart, r11 verdict ask #3)
_IVF_NPROBE = 4

_IVF_MULTIPROBE_SQL = f"""
    WITH cents AS (
        SELECT vec_id AS cent_id, embedding AS cvec
        FROM embeddings WHERE vec_id BETWEEN 1 AND 8
    ),
    assign AS (
        SELECT e.vec_id, c.cent_id,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_sql_cosine('e.embedding', 'c.cvec')} DESC, c.cent_id
               ) AS rn
        FROM embeddings e CROSS JOIN cents c
    ),
    a1 AS (SELECT vec_id, cent_id FROM assign WHERE rn = 1),
    qc AS (
        SELECT cent_id FROM assign
        WHERE vec_id = 0 AND rn <= {_IVF_NPROBE}
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, ROUND({_sql_cosine('e.embedding', 'q.qv')}, 6) AS cosine
    FROM embeddings e
    JOIN a1 ON a1.vec_id = e.vec_id
    JOIN qc ON a1.cent_id = qc.cent_id
    CROSS JOIN q
    ORDER BY {_sql_cosine('e.embedding', 'q.qv')} DESC, e.vec_id
    LIMIT 10
"""


@query(
    "ann_ivf_multiprobe_topk",
    oracle=_IVF_MULTIPROBE_SQL,
    tags=("similarity", "ann", "ivf"),
)
def ann_ivf_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with nprobe=4 (r11 verdict ask #3): database
    vectors keep their single-cell assignment, but the QUERY searches
    its 4 nearest cells — the standard IVF recall lever
    (Jegou et al. 2011 use exactly this probe-the-top-w-cells
    search; LSH has had the analogous Hamming-1 multiprobe since
    r6). tools/ann_recall_probe.py measures the recall-vs-cost curve
    (SCALING §ANN): each extra probed cell adds ~1/8 of the corpus
    to the exact-rescore set, so nprobe trades scan fraction for
    recall linearly.

    Scale shape: identical to ann_ivf_topk — 8-row centroid state,
    one Arrow-kernel+window assignment (at 100 TB the
    assignment is precomputed at ingest and the cells are partition
    keys; the probe is then nprobe partition reads), the probed
    union filters via a broadcast 4-row cell list, and the
    final top-10 is TakeOrderedAndProject. Ties on the cell rank and
    the final cosine both break on vec_id, both engines."""
    cat = Catalog(spark, sf_dir)
    e = cat.embeddings
    # bounded 8-row collect + Arrow assignment kernel, as ann_ivf_topk
    # (bit-equal to the crossJoin + cosine_pair fold, pinned in
    # tests/test_operators.py)
    cents = _collect_centroids(e)
    w = Window.partitionBy("vec_id").orderBy(
        F.col("__cos").desc(), F.col("cent_id").asc()
    )
    assign = cosine_to_centroids_kernel(
        e, cents, vec_col="embedding", keep=["vec_id"]
    ).withColumn("rn", F.row_number().over(w))
    assign = cache.track(assign)
    a1 = assign.filter(F.col("rn") == 1).select("vec_id", "cent_id")
    qc = F.broadcast(
        assign.filter(
            (F.col("vec_id") == 0) & (F.col("rn") <= _IVF_NPROBE)
        ).select(F.col("cent_id").alias("qcent"))
    )
    cell = a1.join(qc, a1.cent_id == qc.qcent).select("vec_id")
    q = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    )
    return (
        e.join(cell, on="vec_id")
        .crossJoin(q)
        .select("vec_id", cosine_pair("embedding", "qv", DIM).alias("__cos"))
        .orderBy(F.col("__cos").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", F.round("__cos", 6).alias("cosine"))
    )


def _kmeans_sql_assign(
    name: str, prev: str, dim: int = DIM, src: str = "qv"
) -> str:
    """Assignment CTE: spherical score dot(q, S_c)/|S_c| as left-deep
    double folds, ties to the lowest cell — mirrors
    operators/similarity.py::kmeans_cells_exact bit-for-bit.
    ``src`` names the quantized-vector CTE (the trained-IVFADC
    composition renames it ``kv`` because the PQ chain owns ``qv``)."""
    dot_qs = _sql_dot("v.q", "c.s", dim)
    dot_ss = _sql_dot("c.s", "c.s", dim)
    return f"""
    {name} AS MATERIALIZED (
        SELECT vec_id, q, cell FROM (
            SELECT v.vec_id, v.q, c.cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY ({dot_qs}) / sqrt({dot_ss}) DESC, c.cell
                   ) AS rn
            FROM {src} v CROSS JOIN {prev} c
        ) WHERE rn = 1
    )"""


def _kmeans_sql_assign_ranked(
    name: str, prev: str, dim: int = DIM, src: str = "qv"
) -> str:
    """Like :func:`_kmeans_sql_assign` but keeps EVERY (vec_id, cell)
    with its rank ``rn`` — the multiprobe variant: rn=1 is the
    assignment, the query row's rn <= nprobe are the probed cells."""
    dot_qs = _sql_dot("v.q", "c.s", dim)
    dot_ss = _sql_dot("c.s", "c.s", dim)
    return f"""
    {name} AS MATERIALIZED (
        SELECT v.vec_id, c.cell,
               ROW_NUMBER() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY ({dot_qs}) / sqrt({dot_ss}) DESC, c.cell
               ) AS rn
        FROM {src} v CROSS JOIN {prev} c
    )"""


def _kmeans_sql_round(i: int, dim: int = DIM, src: str = "qv") -> str:
    """One unrolled Lloyd round as CTE text: assignment against
    c{i-1}, then the INTEGER sum update (order-free, hence
    engine-free), empty cells carrying the previous state forward.
    MATERIALIZED keeps DuckDB from inlining the per-round-doubling
    chain (c{i-1} is referenced by both a{i} and c{i})."""
    sums = ", ".join(
        f"CAST(SUM(q[{j + 1}]) AS BIGINT) AS s{j + 1}" for j in range(dim)
    )
    carry = ", ".join(
        f"COALESCE(u.s{j + 1}, p.s[{j + 1}])" for j in range(dim)
    )
    return f"""
    {_kmeans_sql_assign(f"a{i}", f"c{i - 1}", dim, src)},
    u{i} AS MATERIALIZED (SELECT cell, {sums} FROM a{i} GROUP BY cell),
    c{i} AS MATERIALIZED (
        SELECT p.cell, list_value({carry}) AS s
        FROM c{i - 1} p LEFT JOIN u{i} u ON p.cell = u.cell
    )"""


_KMEANS_IVF_SQL = f"""
    WITH qv AS MATERIALIZED (
        SELECT vec_id, embedding,
               list_transform(
                   embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1024.0 + 0.5)
                             AS BIGINT)
               ) AS q
        FROM embeddings
    ),
    seed AS (SELECT vec_id, q FROM qv ORDER BY vec_id LIMIT 8),
    c0 AS MATERIALIZED (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) AS cell,
               q AS s
        FROM seed
    ),
    {",".join(_kmeans_sql_round(i) for i in (1, 2, 3))},
    {_kmeans_sql_assign("af", "c3")},
    qc AS (SELECT cell FROM af WHERE vec_id = 0),
    qe AS (SELECT embedding AS qvec FROM qv WHERE vec_id = 0)
    SELECT e.vec_id,
           ROUND({_sql_cosine('e.embedding', 'qe.qvec')}, 6) AS cosine
    FROM qv e
    JOIN af ON af.vec_id = e.vec_id
    JOIN qc ON af.cell = qc.cell
    CROSS JOIN qe
    ORDER BY {_sql_cosine('e.embedding', 'qe.qvec')} DESC, e.vec_id
    LIMIT 10
"""


@query(
    "ann_ivf_kmeans_topk",
    oracle=_KMEANS_IVF_SQL,
    tags=("similarity", "ann", "ivf", "kmeans"),
)
def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with k-means-refined cells: 3 deterministic Lloyd
    iterations replace ``ann_ivf_topk``'s static first-8-ids seeding,
    then search only the query's cell. Formerly the registry's one
    rows-only query; now VALUE-EXACT under an unrolled-CTE oracle via
    ``operators/similarity.py::kmeans_cells_exact`` — the centroid
    update is an elementwise INTEGER sum over quantized vectors
    (order-free, so partition layout and engine cannot move a bit)
    and every float score is a left-deep double fold both engines
    evaluate identically. The final cell search scores the ORIGINAL
    float embeddings (quantization only steers training). SCALING.md
    §ANN measures k-means vs static seeding on two corpus geometries:
    k-means LOSES at nprobe=1 on the replica-clustered corpus and
    WINS on the smooth quasi-random manifold — centroid training is
    corpus-dependent and must be measurable, not assumed."""
    from ..operators.similarity import kmeans_cells_exact

    cat = Catalog(spark, sf_dir)
    assigned = kmeans_cells_exact(
        cat.embeddings,
        id_col="vec_id",
        vec_col="embedding",
        dim=DIM,
        k=8,
        iters=3,
    )
    qrow = assigned.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"), F.col("__cell").alias("qcell")
    )
    return (
        assigned.join(F.broadcast(qrow), assigned.__cell == qrow.qcell)
        .select(
            "vec_id", cosine_pair("embedding", "qv", DIM).alias("__cos")
        )
        .orderBy(F.col("__cos").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", F.round("__cos", 6).alias("cosine"))
    )


# ----------------------------------------------------------------------- TF-IDF


@query(
    "tfidf_top_terms",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               (tf.tf * (n.n + 1.0)) / (dfreq.df + 1.0) AS score
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, term, score,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, term
               ) AS rk
        FROM scored
    )
    SELECT doc_id, term, ROUND(score, 6) AS score, CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= 3
    """,
    tags=("text", "tfidf"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by rational TF-IDF
    (tf·(N+1)/(df+1) — no log, so the score is cross-engine exact).
    Two shuffles: term-frequency agg and the per-doc rank window;
    document frequency is a broadcast-joined dimension."""
    cat = Catalog(spark, sf_dir)
    # explode_outer + post-filter: inner explode's inferred filter
    # would re-inline the split into the scan (double tokenization);
    # see operators/text.py::shingles.
    toks = cat.documents.select(
        "doc_id", F.explode_outer(T.tokens("text")).alias("term")
    ).where(F.col("term").isNotNull())
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df")
    )
    n = cat.documents.select(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dfreq, on="term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            ((F.col("tf") * (F.col("n") + F.lit(1.0))) / (F.col("df") + F.lit(1.0))).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "doc_id",
            "term",
            F.round("score", 6).alias("score"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


# ------------------------------------------------------------------------ BM25

#: fixed query terms (shared literal list → both engines score the
#: same lexical query); realistic use: retrieval for contamination
#: review / RAG over the corpus.
BM25_TERMS = ["spark", "merge", "hash", "vector"]
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_sql_parts() -> tuple[str, str]:
    """(WITH-clause body ``feat, g``; left-deep ``total`` score expr)
    — shared by the BM25 query and the RRF fusion's lexical arm."""
    feats = ",\n               ".join(
        f"CAST(len(list_filter(w, x -> x = '{t}')) AS BIGINT) AS tf_{t}"
        for t in BM25_TERMS
    )
    dfs = ",\n               ".join(
        f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in BM25_TERMS
    )
    scores = [
        (
            f"ln(1.0 + (CAST(g.n AS DOUBLE) - CAST(g.df_{t} AS DOUBLE) + 0.5)"
            f" / (CAST(g.df_{t} AS DOUBLE) + 0.5))"
            f" * (CAST(f.tf_{t} AS DOUBLE) * {_BM25_K1 + 1.0})"
            f" / (CAST(f.tf_{t} AS DOUBLE) + {_BM25_K1} * ({1.0 - _BM25_B}"
            f" + {_BM25_B} * (CAST(f.dl AS DOUBLE)"
            f" / (CAST(g.sumdl AS DOUBLE) / CAST(g.n AS DOUBLE)))))"
        )
        for t in BM25_TERMS
    ]
    total = scores[0]
    for s in scores[1:]:
        total = f"({total} + {s})"
    ctes = rf"""feat AS (
        SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
               {feats}
        FROM (SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS w
              FROM documents)
    ),
    g AS (
        SELECT COUNT(*) AS n, SUM(dl) AS sumdl,
               {dfs}
        FROM feat
    )"""
    return ctes, total


def _bm25_sql() -> str:
    ctes, total = _bm25_sql_parts()
    return rf"""
    WITH {ctes}
    SELECT f.doc_id, ROUND({total}, 6) AS bm25
    FROM feat f CROSS JOIN g
    WHERE {" + ".join(f"f.tf_{t}" for t in BM25_TERMS)} > 0
    ORDER BY {total} DESC, f.doc_id
    LIMIT 20
    """


@query("bm25_topk_docs", oracle=_bm25_sql(), tags=("text", "retrieval", "bm25"))
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 retrieval for a fixed lexical query — the
    standard ranking function for corpus search / contamination
    review, as a TWO-SCAN zero-join plan:

    - per-term tf is ``size(filter(tokens, t = term))`` — a pure
      map-side expression, no explode and no (doc, term) shuffle
      (contrast tfidf_top_terms, which needs the full term table);
    - all global stats (N, Σdl, per-term df) come from ONE aggregate
      whose sums are INTEGER — avgdl is derived by a single division
      from an exact Σdl, so summation order cannot perturb it —
      broadcast back as a 1-row frame;
    - the score is a FIXED left-deep fold over the query terms
      (identical expression tree in the oracle), so the only
      cross-engine float surface is ``ln`` itself (same policy as
      lang_entropy_by_source); top-k is TakeOrderedAndProject.

    At 100 TB this is the shape you want: one stats pass (cacheable
    across queries of the same corpus snapshot), one scoring pass,
    no shuffle proportional to |docs|·|vocab|."""
    docs = Catalog(spark, sf_dir).documents
    return (
        _bm25_scored(docs)
        .orderBy(F.col("__score").desc(), F.col("doc_id").asc())
        .limit(20)
        .select("doc_id", F.round("__score", 6).alias("bm25"))
    )


def _bm25_scored(docs: DataFrame) -> DataFrame:
    """(doc_id, __score) for every document matching >=1 query term —
    the two-scan zero-join BM25 plan shared by bm25_topk_docs and the
    RRF fusion's lexical arm."""
    w = T.tokens("text")
    feat = docs.select(
        "doc_id",
        F.size(w).cast("bigint").alias("dl"),
        # unary lambda only: F.filter dispatches on arity (a 2-arg
        # lambda would receive the element INDEX as its second
        # argument). The closure is consumed eagerly per iteration.
        *[
            F.size(F.filter(w, (lambda term: lambda x: x == F.lit(term))(t)))
            .cast("bigint")
            .alias(f"tf_{t}")
            for t in BM25_TERMS
        ],
    )
    g = feat.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sumdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("bigint")).alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )
    scored = feat.crossJoin(F.broadcast(g))
    avgdl = F.col("sumdl").cast("double") / F.col("n").cast("double")
    norm = F.col("dl").cast("double") / avgdl

    def term_score(t: str):
        tf = F.col(f"tf_{t}").cast("double")
        df = F.col(f"df_{t}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n").cast("double") - df + F.lit(0.5)) / (df + F.lit(0.5))
        )
        return (
            idf
            * (tf * F.lit(_BM25_K1 + 1.0))
            / (
                tf
                + F.lit(_BM25_K1)
                * (F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * norm)
            )
        )

    total = term_score(BM25_TERMS[0])
    for t in BM25_TERMS[1:]:
        total = total + term_score(t)
    any_tf = sum(F.col(f"tf_{t}") for t in BM25_TERMS[1:]) + F.col(
        f"tf_{BM25_TERMS[0]}"
    )
    return scored.withColumn("__score", total).filter(any_tf > 0)


# ------------------------------------------------------- C4-style span dedup


@query(
    "span_dedup_keep_first",
    oracle=r"""
    WITH idx AS (
        SELECT doc_id, w, unnest(generate_series(1, len(w) - 4)) AS i
        FROM (SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS w
              FROM documents)
    ),
    spans AS (
        SELECT doc_id, i AS pos,
               w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                    || ' ' || w[i+4] AS span
        FROM idx
    ),
    ranked AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY span ORDER BY doc_id, pos
               ) AS rn
        FROM spans
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_spans,
           ROUND(CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS dup_frac
    FROM ranked GROUP BY doc_id
    """,
    tags=("text", "dedup", "c4"),
)
def span_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-global span dedup decision (C4 drops any
    three-sentence span occurring more than once; here: overlapping
    5-token spans, keep the FIRST occurrence by (doc_id, position)
    and mark every later instance a duplicate). Returns the per-doc
    removal profile — span count, duplicates removed, duplicate
    fraction.

    Plan: span enumeration is pure expression work (transform over a
    position sequence + posexplode — no UDF); the keep-first decision
    is ONE hash-partitioned window keyed by the span string (no
    global sort — ordering is only within each span's tiny group);
    then a per-doc re-aggregate. At 100 TB the span shuffle is
    O(corpus tokens) — inherent to exact corpus-global dedup; the
    approximate alternative at that scale is the MinHash/LSH family
    (minhash_lsh_pairs), with THIS operator run per-shard or on the
    LSH-clustered survivors."""
    docs = Catalog(spark, sf_dir).documents
    # Same expression-shingling idiom as operators/text.py::shingles —
    # the size guard lives INSIDE when/otherwise (Spark's sequence(1, n)
    # counts DOWN for n < 1), and posexplode_outer + null-filter keeps
    # InferFiltersFromGenerate from re-inlining the transform into the
    # scan (double tokenization). Docs with <5 tokens have no spans and
    # are absent from the result, mirroring generate_series.
    grams = docs.select("doc_id", T.tokens("text").alias("__toks")).select(
        "doc_id",
        F.when(
            F.size("__toks") >= 5,
            F.expr(
                "transform(sequence(1, size(__toks) - 4),"
                " i -> concat_ws(' ', slice(__toks, i, 5)))"
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("__spans"),
    )
    spans = grams.select(
        "doc_id", F.posexplode_outer("__spans").alias("pos", "span")
    ).where(F.col("span").isNotNull())
    rn = F.row_number().over(
        Window.partitionBy("span").orderBy("doc_id", "pos")
    )
    dup = (rn > 1).cast("bigint")
    return (
        spans.select("doc_id", dup.alias("is_dup"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("is_dup").alias("n_dup_spans"),
            F.round(
                F.sum("is_dup").cast("double") / F.count(F.lit(1)), 6
            ).alias("dup_frac"),
        )
    )


# ------------------------------------- exact substring dedup (suffix-array mode)

#: minimum duplicated-run length in tokens. Lee et al. use 50 BPE
#: tokens on web crawl; the synthetic docs average ~54 whitespace
#: tokens, so 10 keeps the query non-degenerate at every sf.
_SUBSTR_L = 10

def _substr_sql(key: str = "g") -> str:
    """The dup_substring_runs oracle, parameterized on the gram
    window key: ``g`` (exact string) or ``unhex(md5(g))`` (128-bit
    fingerprint — md5 is bit-identical across DuckDB and Spark, so
    the fingerprint variant stays value-exact in the differential)."""
    return rf"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        FROM documents
    ),
    grams AS (
        SELECT doc_id, i AS pos, len(w) AS n_toks,
               array_to_string(w[i:i+{_SUBSTR_L - 1}], ' ') AS g
        FROM toks, unnest(generate_series(1, len(w) - {_SUBSTR_L - 1}))
             AS t(i)
        WHERE len(w) >= {_SUBSTR_L}
    ),
    dup AS (
        SELECT doc_id, pos, n_toks
        FROM (SELECT doc_id, pos, n_toks,
                     COUNT(*) OVER (PARTITION BY {key}) AS cnt
              FROM grams)
        WHERE cnt >= 2
    ),
    isl AS (
        SELECT doc_id, pos, n_toks,
               SUM(CASE WHEN prev IS NULL
                             OR pos > prev + {_SUBSTR_L}
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS island
        FROM (SELECT doc_id, pos, n_toks,
                     LAG(pos) OVER (
                         PARTITION BY doc_id ORDER BY pos) AS prev
              FROM dup)
    ),
    spans AS (
        SELECT doc_id, island,
               MAX(pos) + {_SUBSTR_L} - MIN(pos) AS run_len,
               ANY_VALUE(n_toks) AS n_toks
        FROM isl GROUP BY doc_id, island
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_dup_runs,
           CAST(SUM(run_len) AS BIGINT) AS dup_tokens,
           CAST(MAX(run_len) AS BIGINT) AS longest_run,
           ROUND(CAST(SUM(run_len) AS DOUBLE) / ANY_VALUE(n_toks), 6)
               + 0.0 AS dup_frac
    FROM spans GROUP BY doc_id
"""


_SUBSTR_SQL = _substr_sql("g")


@query(
    "dup_substring_runs",
    oracle=_SUBSTR_SQL,
    tags=("text", "dedup", "substring"),
)
def dup_substring_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-level dedup, suffix-array mode (Lee et al.
    2021, "Deduplicating Training Data Makes Language Models Better"
    — public): find every maximal run of >= L tokens that occurs more
    than once in the corpus (100+-token boilerplate/license repeats
    that 5-gram C4 spans only nibble at), reported as a per-doc
    removal profile (run count, duplicated tokens, longest run,
    duplicated fraction).

    Reformulation instead of a literal suffix array: a substring of
    length >= L is duplicated iff every one of its L-grams is
    duplicated, and conversely each duplicated L-gram occurrence
    covers the token interval [pos, pos+L). The union of those
    intervals — merged per doc by gaps-and-islands — COVERS exactly
    the token positions the suffix-array scan marks (dup_tokens /
    dup_frac are therefore exact); the per-run stats describe the
    merged covered intervals, so adjacent runs duplicated from
    DIFFERENT sources coalesce and longest_run can exceed the longest
    single duplicated substring. No shared mutable structure to
    distribute.

    Plan: gram enumeration is the expression-shingling idiom (no
    UDF); duplicate marking is ONE count-over-window keyed by the
    gram string (hash-partitioned, no global sort — same shape as
    span_dedup_keep_first's keep-first window); then a doc-keyed
    LAG -> running-SUM window chain where the second window reuses
    the first's partitioning+sort (one Exchange total, the kcore
    alternating-window argument), and the final per-doc aggregate
    reuses the doc hash partitioning. At 100 TB the gram shuffle is
    O(corpus tokens) — inherent to exact substring dedup (Lee et
    al.'s suffix array is the same bytes through one machine); the
    production lever is ``dup_substring_runs_fp`` below, which keys
    the window on a 16-byte md5 fingerprint instead of the L-token
    string and drops the gram before the Exchange. All island/length
    arithmetic is integer, so every output but the final ROUND
    division is exact."""
    return _substr_runs(spark, sf_dir, fingerprint=False)


@query(
    "dup_substring_runs_fp",
    oracle=_substr_sql("unhex(md5(g))"),
    tags=("text", "dedup", "substring"),
)
def dup_substring_runs_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint mode of ``dup_substring_runs`` (r10 verdict ask
    #2 — the production lever SCALING §substring named): the gram
    window keys on ``unhex(md5(gram))`` — 16 bytes — instead of the
    L-token gram string (~60-70 bytes at L=10, hundreds at Lee et
    al.'s L=50), and the gram column is PROJECTED AWAY before the
    Exchange, so the corpus-sized shuffle carries (doc_id, n_toks,
    pos, 16-byte key) rows. Measured on this host (tools/
    substr_fp_probe.py, sf0.1 ×4 tagged replicas, REST stage
    metrics): the gram-window shuffle reads 35.3 → 20.5 MB (1.72×
    narrower) at identical record counts, wall 1.22× faster. The
    ratio grows with L — the key stays 16 bytes while the gram
    string is L tokens, so at Lee et al.'s L=50 the per-row payload
    shrinks ~5× more than at this L=10.

    Exactness: md5 is bit-identical across Spark and DuckDB, so the
    differential still pins values end-to-end. A 128-bit collision
    (two DISTINCT grams hashing together, marking a non-duplicated
    position as covered) needs ~2^64 distinct grams by birthday
    bound — at 100 TB (~10^13 grams ≈ 2^43) the collision
    probability is ~2^-42; the exact-string variant above remains
    the audit path."""
    return _substr_runs(spark, sf_dir, fingerprint=True)


def _substr_runs(
    spark: SparkSession, sf_dir: str, fingerprint: bool
) -> DataFrame:
    L = _SUBSTR_L
    docs = Catalog(spark, sf_dir).documents
    grams = docs.select(
        "doc_id", T.tokens("text").alias("__toks")
    ).select(
        "doc_id",
        F.size("__toks").alias("n_toks"),
        F.when(
            F.size("__toks") >= L,
            F.expr(
                f"transform(sequence(1, size(__toks) - {L - 1}),"
                f" i -> concat_ws(' ', slice(__toks, i, {L})))"
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("__grams"),
    )
    key = F.unhex(F.md5("g")) if fingerprint else F.col("g")
    pos_grams = (
        grams.select(
            "doc_id",
            "n_toks",
            F.posexplode_outer("__grams").alias("pos0", "g"),
        )
        .where(F.col("g").isNotNull())
        # narrow BEFORE the gram Exchange: in fingerprint mode the
        # shuffle carries the 16-byte key, never the gram string
        .select("doc_id", "n_toks", "pos0", key.alias("__k"))
    )
    cnt = F.count(F.lit(1)).over(Window.partitionBy("__k"))
    dup = (
        pos_grams.withColumn("__cnt", cnt)
        .where(F.col("__cnt") >= 2)
        .select(
            "doc_id", "n_toks", (F.col("pos0") + 1).alias("pos")
        )
    )
    by_doc = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(by_doc)
    brk = F.when(
        prev.isNull() | (F.col("pos") > prev + L), F.lit(1)
    ).otherwise(F.lit(0))
    runs = (
        dup.withColumn("__brk", brk)
        .withColumn(
            "island",
            F.sum("__brk").over(
                by_doc.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("doc_id", "island")
        .agg(
            (F.max("pos") + L - F.min("pos")).alias("run_len"),
            F.first("n_toks").alias("n_toks"),
        )
    )
    return runs.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_runs"),
        F.sum("run_len").alias("dup_tokens"),
        # bigint: DuckDB's MAX over its BIGINT run arithmetic binds
        # BIGINT while Spark's int chain yields int (r13 width guard)
        F.max("run_len").cast("long").alias("longest_run"),
        (
            F.round(
                F.sum("run_len").cast("double") / F.first("n_toks"), 6
            )
            + F.lit(0.0)
        ).alias("dup_frac"),
    )


_SUBSTR_RM_SQL = rf"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        FROM documents
    ),
    tok AS (
        SELECT doc_id, i AS pos, w[i] AS tk, len(w) AS n_toks
        FROM toks, unnest(generate_series(1, len(w))) AS t(i)
    ),
    grams AS (
        SELECT doc_id, i AS pos,
               array_to_string(w[i:i+{_SUBSTR_L - 1}], ' ') AS g
        FROM toks, unnest(generate_series(1, len(w) - {_SUBSTR_L - 1}))
             AS t(i)
        WHERE len(w) >= {_SUBSTR_L}
    ),
    dup AS (
        SELECT doc_id, pos
        FROM (SELECT doc_id, pos,
                     ROW_NUMBER() OVER (
                         PARTITION BY g ORDER BY doc_id, pos) AS rn
              FROM grams)
        WHERE rn >= 2
    ),
    isl AS (
        SELECT doc_id, pos,
               SUM(CASE WHEN prev IS NULL
                             OR pos > prev + {_SUBSTR_L}
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS island
        FROM (SELECT doc_id, pos,
                     LAG(pos) OVER (
                         PARTITION BY doc_id ORDER BY pos) AS prev
              FROM dup)
    ),
    spans AS (
        SELECT doc_id, MIN(pos) AS s, MAX(pos) + {_SUBSTR_L} AS e
        FROM isl GROUP BY doc_id, island
    ),
    covered AS (
        SELECT doc_id, unnest(generate_series(s, e - 1)) AS pos
        FROM spans
    ),
    kept AS (
        SELECT t.doc_id, t.pos, t.tk, t.n_toks
        FROM tok t LEFT JOIN covered c
          ON t.doc_id = c.doc_id AND t.pos = c.pos
        WHERE c.pos IS NULL
    )
    SELECT doc_id,
           CAST(ANY_VALUE(n_toks) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS kept_tokens,
           CAST(ANY_VALUE(n_toks) - COUNT(*) AS BIGINT)
               AS removed_tokens,
           md5(string_agg(tk, ' ' ORDER BY pos)) AS cleaned_md5
    FROM kept GROUP BY doc_id
"""


@query(
    "dup_substring_removal",
    oracle=_SUBSTR_RM_SQL,
    tags=("text", "dedup", "substring"),
)
def dup_substring_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVAL half of exact substring dedup (Lee et al. 2021):
    keep the FIRST occurrence of every duplicated >= L-token run
    (global order by (doc_id, pos)), excise every later copy, and
    emit the cleaned per-doc profile with an md5 of the cleaned text
    — so the differential pins the actual reconstructed content, not
    just counts. ``dup_substring_runs`` marks ALL copies (the audit
    view); this one applies the edit.

    Semantics: an occurrence position is removable iff its L-gram has
    ROW_NUMBER >= 2 in the gram's global (doc_id, pos) order; the
    per-doc interval union of removable extents [pos, pos+L) is cut,
    and surviving tokens re-concatenate in position order.

    Plan: one row_number window keyed by the gram string, the
    doc-keyed gaps-and-islands chain (windows reuse one Exchange),
    covered positions exploded from spans (bounded by corpus tokens,
    spans are disjoint by construction), one anti join on
    (doc_id, pos), and a per-doc aggregate whose order-sensitive
    piece — the cleaned text — is rebuilt engine-deterministically
    via array_sort(collect_list(struct(pos, token))) vs
    string_agg(... ORDER BY pos). Everything is integer or exact
    string work; no floats anywhere.

    The collect_list buffers ONE document per aggregation group —
    bounded by max doc length, right for this md5 differential pin.
    A 100 TB corpus-materializing run should not rebuild strings in
    an aggregate at all: :func:`substring_clean_kept_tokens` +
    ``write_cleaned_corpus`` below stream the kept tokens out through
    a doc-keyed sort instead."""
    kept, tok = _substring_kept_tokens(
        Catalog(spark, sf_dir).documents, _SUBSTR_L
    )
    return kept.groupBy("doc_id").agg(
        F.first("n_toks").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("kept_tokens"),
        (F.first("n_toks") - F.count(F.lit(1)))
        .cast("bigint")
        .alias("removed_tokens"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "tk"))
                    ),
                    lambda x: x["tk"],
                ),
            )
        ).alias("cleaned_md5"),
    )


def _substring_kept_tokens(docs: DataFrame, L: int):
    """Shared keep-first substring-dedup core: returns ``(kept,
    tok)`` where ``tok`` is the positional token table (doc_id,
    n_toks, pos, tk) and ``kept`` is it minus every position covered
    by a non-first duplicated L-token run — the exact semantics
    dup_substring_removal's docstring derives."""
    base = docs.select("doc_id", T.tokens("text").alias("__toks"))
    # posexplode_outer + null-filter: an inner posexplode lets
    # InferFiltersFromGenerate push `size(split(...)) > 0 AND
    # isnotnull(split(...))` into the scan filter, re-tokenizing every
    # document 1-2 extra times below the Generate (same idiom as the
    # gram side; tokens() never yields an empty array, so the row set
    # is identical)
    tok = base.select(
        "doc_id",
        F.size("__toks").alias("n_toks"),
        F.posexplode_outer("__toks").alias("pos0", "tk"),
    ).where(F.col("pos0").isNotNull()).select(
        "doc_id", "n_toks", (F.col("pos0") + 1).alias("pos"), "tk"
    )
    grams = base.select(
        "doc_id",
        F.when(
            F.size("__toks") >= L,
            F.expr(
                f"transform(sequence(1, size(__toks) - {L - 1}),"
                f" i -> concat_ws(' ', slice(__toks, i, {L})))"
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("__grams"),
    ).select(
        "doc_id", F.posexplode_outer("__grams").alias("pos0", "g")
    ).where(F.col("g").isNotNull())
    rn = F.row_number().over(
        Window.partitionBy("g").orderBy("doc_id", "pos0")
    )
    dup = (
        grams.withColumn("__rn", rn)
        .where(F.col("__rn") >= 2)
        .select("doc_id", (F.col("pos0") + 1).alias("pos"))
    )
    by_doc = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(by_doc)
    brk = F.when(
        prev.isNull() | (F.col("pos") > prev + L), F.lit(1)
    ).otherwise(F.lit(0))
    spans = (
        dup.withColumn("__brk", brk)
        .withColumn(
            "island",
            F.sum("__brk").over(
                by_doc.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("doc_id", "island")
        .agg(F.min("pos").alias("s"), (F.max("pos") + L).alias("e"))
    )
    covered = spans.select(
        "doc_id",
        F.explode(F.sequence("s", F.col("e") - 1)).alias("pos"),
    )
    kept = tok.join(covered, on=["doc_id", "pos"], how="left_anti")
    return kept, tok


def substring_clean_kept_tokens(
    docs: DataFrame, *, L: int = _SUBSTR_L
) -> DataFrame:
    """Kept-token table of keep-first exact substring dedup:
    (doc_id, pos, tk) for every surviving position — the
    corpus-materializing interface. Unlike the md5 differential
    query, nothing here ever holds a whole document: the heaviest
    state anywhere is one gram-window partition."""
    kept, _ = _substring_kept_tokens(docs, L)
    return kept.select("doc_id", "pos", "tk")


def write_cleaned_corpus(
    kept: DataFrame, path: str, *, partitions: int = 32
) -> None:
    """Materialize a cleaned corpus at scale WITHOUT per-document
    aggregation buffers (the VERDICT r10 note on the md5 pin's
    collect_list): repartition by doc_id, sortWithinPartitions
    (doc_id, pos), write — every document's tokens land contiguous
    and ordered inside one parquet file, so a reader reassembles text
    with a streaming scan (or a parquet-aware consumer just reads the
    token table). Shuffle carries (doc_id, pos, token) rows; the sort
    is per-partition external sort, never a group buffer."""
    (
        kept.repartition(partitions, "doc_id")
        .sortWithinPartitions("doc_id", "pos")
        .write.mode("overwrite")
        .parquet(path)
    )


# ----------------------------------------------------- HTML -> text extraction

# Deterministic HTML wrapper synthesized IDENTICALLY in both engines
# around documents.text (the testdata has no raw-markup column): head
# with style+script blocks, a nav bar, an ad block on every third doc
# (link-density signal), entities in the footer. Shared Python
# constants guarantee the two engines concatenate the same bytes.
_HTML_HEAD = (
    '<html><head><title>doc</title>'
    "<style>p {margin:0; color:#222}</style>"
    '<script type="text/javascript">var x = 1 < 2 && "a";</script>'
    "</head><body>"
)
_HTML_NAV = (
    '<div id="nav"><a href="/">Home</a> <a href="/about">About us</a>'
    ' <a href="/contact">Contact</a></div>'
)
_HTML_ADS = (
    '<div class="ads"><a href="/buy">Buy now</a>'
    " <a href=\"/sale\">Sale &amp; deals every day</a>"
    ' <a href="/offers">Click here for more great offers</a></div>'
)
_HTML_FOOT = (
    '<!-- footer --><div class="foot">&quot;fine print&quot; &#39;legal&#39;'
    " <a href=\"/tos\">Terms&nbsp;&amp;&nbsp;conditions</a></div>"
    "</body></html>"
)

#: link-density keep threshold: nav+footer alone sit ~0.10, the ad
#: block pushes ~0.22 — 0.15 splits the two populations
_HTML_KEEP_DENSITY = 0.15


def _html_oracle() -> str:
    from ..operators.text import (
        _RE_ANCHOR,
        _RE_COMMENT,
        _RE_SCRIPT,
        _RE_STYLE,
        _RE_TAG,
        HTML_ENTITIES,
    )

    def esc(s: str) -> str:
        return s.replace("'", "''")

    def strip(e: str) -> str:
        for pat in (_RE_SCRIPT, _RE_STYLE, _RE_COMMENT, _RE_TAG):
            e = f"regexp_replace({e}, '{esc(pat)}', ' ', 'g')"
        for ent, ch in HTML_ENTITIES:
            e = f"replace({e}, '{esc(ent)}', '{esc(ch)}')"
        return rf"trim(regexp_replace({e}, '\s+', ' ', 'g'))"

    anchors = (
        f"array_to_string(regexp_extract_all(html, '{esc(_RE_ANCHOR)}', 1),"
        " ' ')"
    )
    return rf"""
    WITH h AS (
        SELECT doc_id,
               '{esc(_HTML_HEAD + _HTML_NAV)}'
               || CASE WHEN doc_id % 3 = 0 THEN '{esc(_HTML_ADS)}'
                       ELSE '' END
               || '<h1>Document ' || CAST(doc_id AS VARCHAR) || '</h1><p>'
               || text || '</p>{esc(_HTML_FOOT)}' AS html
        FROM documents
    ),
    t AS (
        SELECT doc_id, {strip('html')} AS body, {strip(anchors)} AS atext
        FROM h
    )
    SELECT doc_id,
           CAST(len(body) AS BIGINT) AS n_chars,
           ROUND(CAST(len(atext) AS DOUBLE) / len(body), 6) + 0.0
               AS link_density,
           CAST(len(atext) AS DOUBLE) / len(body)
               <= {_HTML_KEEP_DENSITY} AS keep,
           md5(body) AS text_md5
    FROM t
    """


@query(
    "html_text_extract",
    oracle=_html_oracle(),
    tags=("text", "html", "boilerplate"),
)
def html_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> text boilerplate extraction (r10 verdict ask #6) — the
    first stage of every real crawl pipeline: strip script/style/
    comment blocks and tags, decode entities, normalize whitespace,
    and gate on LINK DENSITY (fraction of visible characters inside
    <a> anchors — nav bars and ad blocks are link-dense, body prose
    is not; the classic jusText/boilerpipe-class signal, public).

    The testdata has no markup column, so the query synthesizes a
    deterministic HTML wrapper around documents.text IDENTICALLY in
    both engines (shared literal constants; every third doc gets a
    link-heavy ad block) and then runs the REAL extraction operator
    (operators/text.py::html_text / html_link_density) — the md5 of
    the extracted text pins the whole strip/decode/normalize chain
    end-to-end cross-engine, and the keep flag pins the density gate.

    Plan: map-only — every regex is expression-level (Java-regex ∩
    RE2 subset, no backreferences), so the whole query is one
    WholeStageCodegen scan with zero shuffles before the driver
    collect; at 100 TB it is embarrassingly parallel and
    column-pruned to (doc_id, text). Composes upstream of the Gopher
    gate (tests/test_html_text.py runs html_text -> gopher_quality)."""
    cat = Catalog(spark, sf_dir)
    html = F.concat(
        F.lit(_HTML_HEAD + _HTML_NAV),
        F.when(F.col("doc_id") % 3 == 0, F.lit(_HTML_ADS)).otherwise(
            F.lit("")
        ),
        F.lit("<h1>Document "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p>" + _HTML_FOOT),
    )
    body = T.html_text(html)
    density = T.html_link_density(html)
    return cat.documents.select(
        "doc_id",
        F.length(body).cast("bigint").alias("n_chars"),
        (F.round(density, 6) + F.lit(0.0)).alias("link_density"),
        (density <= F.lit(_HTML_KEEP_DENSITY)).alias("keep"),
        F.md5(body).alias("text_md5"),
    )


# ---------------------------------------------------------- contamination screen

#: fixed probe phrases (shared literal list → both engines test the
#: same membership); realistic use: eval-benchmark n-grams.
PROBES = ["hash value table", "window merge spark", "vector table fast"]


def _probes_values_sql() -> str:
    return ", ".join(f"('{p}')" for p in PROBES)


@query(
    "contamination_screen",
    oracle=f"""
    SELECT p.probe, d.doc_id
    FROM documents d
    CROSS JOIN (VALUES {_probes_values_sql()}) AS p(probe)
    WHERE position(p.probe IN d.text) > 0
    """,
    tags=("text", "contamination"),
)
def contamination_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screen: which documents contain any of
    a fixed set of probe phrases (exact substring). Map-only scan ×
    |probes| — fine for a handful of probes; the documented scale
    path for large probe sets is ``contamination_screen_bloom`` below
    (same oracle), which Bloom-prefilters documents before the
    ×|probes| exact scan."""
    cat = Catalog(spark, sf_dir)
    probes = F.array(*[F.lit(p) for p in PROBES])
    return (
        cat.documents.select(
            "doc_id", F.explode(probes).alias("probe"), "text"
        )
        .filter(F.expr("position(probe IN text) > 0"))
        .select("probe", "doc_id")
    )


@query(
    "contamination_screen_bloom",
    oracle=f"""
    SELECT p.probe, d.doc_id
    FROM documents d
    CROSS JOIN (VALUES {_probes_values_sql()}) AS p(probe)
    WHERE position(p.probe IN d.text) > 0
    """,
    tags=("text", "contamination", "bloom"),
)
def contamination_screen_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination screen with a Bloom-bitset pre-pass — the 100 TB
    shape for LARGE probe sets, value-identical to
    ``contamination_screen`` (same DuckDB oracle).

    The exact path costs |docs| × |probes| substring scans. Here the
    probe phrases' INTERIOR words are hashed into a broadcast Bloom
    bitset (``operators/bloom.py``); a document reaches the exact
    ×|probes| verify only if some whitespace token hits the bitset.
    Conservative by construction: a raw-substring occurrence of probe
    "a b c" bounds the interior word "b" with the probe's own literal
    single spaces, so "b" is always a complete whitespace token of the
    document — interior-word membership cannot produce a false
    negative, and Bloom false positives are removed by the exact
    verify. The bitset test is k seeded xxhash64 probes per token,
    fully inside whole-stage codegen; cost scales with corpus tokens,
    not with |probes| (SCALING.md §bloom measures 4→256 probes)."""
    from ..operators.bloom import bloom_might_contain, build_bloom_bitset

    if any(len(p.split()) < 3 for p in PROBES):
        # A <3-word probe has no interior word to gate on; its matches
        # would silently vanish. Refuse rather than return wrong rows.
        raise ValueError(
            "bloom pre-pass needs >=3-word probes; use "
            "contamination_screen for short phrases"
        )
    # Hash the LOWERCASED interiors: candidate tokens come from
    # T.tokens(), which lowercases, while position() below is
    # case-sensitive.  A raw-substring occurrence of an uppercase
    # interior word "B" means the document literally contains " B "
    # bounded by the probe's own spaces, so after lowercasing the
    # document token is exactly "b" — hashing w.lower() keeps the
    # no-false-negative guarantee for mixed-case probes too.
    interiors = sorted({w.lower() for p in PROBES for w in p.split()[1:-1]})
    bitset = build_bloom_bitset(spark, interiors, m_bits=1024, k=3)
    cat = Catalog(spark, sf_dir)
    candidates = cat.documents.where(
        F.exists(
            T.tokens("text"),
            lambda t: bloom_might_contain(t, bitset, k=3),
        )
    )
    probes = F.array(*[F.lit(p) for p in PROBES])
    return (
        candidates.select(
            "doc_id", F.explode(probes).alias("probe"), "text"
        )
        .filter(F.expr("position(probe IN text) > 0"))
        .select("probe", "doc_id")
    )


@query(
    "contamination_screen_inverted",
    oracle=f"""
    SELECT p.probe, d.doc_id
    FROM documents d
    CROSS JOIN (VALUES {_probes_values_sql()}) AS p(probe)
    WHERE position(p.probe IN d.text) > 0
    """,
    tags=("text", "contamination", "bloom", "inverted"),
)
def contamination_screen_inverted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Contamination screen for LARGE probe sets, value-identical to
    ``contamination_screen`` (same oracle): the Bloom bitset gates
    documents in O(tokens) as in ``contamination_screen_bloom``, then
    — instead of the ×|probes| exact scan per surviving document —
    an interior-word → probe inverted index
    (operators/bloom.py::inverted_probe_verify) is broadcast-joined
    against each candidate's tokens, so a document exact-verifies only
    the probes its tokens implicate. At 4096 probes the verify cost is
    per-implication, not per-probe (SCALING.md §bloom, 'inverted'
    column); recall is exact by the same interior-word containment
    argument as the Bloom gate."""
    from ..operators.bloom import (
        bloom_might_contain,
        build_bloom_bitset,
        inverted_probe_verify,
    )

    if any(len(p.split()) < 3 for p in PROBES):
        raise ValueError(
            "inverted verify needs >=3-word probes; use "
            "contamination_screen for short phrases"
        )
    interiors = sorted({w.lower() for p in PROBES for w in p.split()[1:-1]})
    bitset = build_bloom_bitset(spark, interiors, m_bits=1024, k=3)
    cat = Catalog(spark, sf_dir)
    candidates = cat.documents.where(
        F.exists(
            T.tokens("text"),
            lambda t: bloom_might_contain(t, bitset, k=3),
        )
    )
    return inverted_probe_verify(
        candidates, PROBES, id_col="doc_id", text_col="text"
    )


PACK_CAPACITY = 512
PACK_SHARDS = 16


@query(
    "pack_documents_greedy",
    oracle=rf"""
    WITH RECURSIVE d AS (
        SELECT doc_id,
               CAST(doc_id % {PACK_SHARDS} AS INTEGER) AS shard,
               CAST(len(string_split_regex(lower(trim(text)), '\s+'))
                    AS BIGINT) AS weight,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id % {PACK_SHARDS} ORDER BY doc_id
               ) AS rn
        FROM documents
    ),
    pack AS (
        SELECT shard, rn, doc_id, weight,
               0 AS bin_idx, weight AS fill
        FROM d WHERE rn = 1
        UNION ALL
        SELECT d.shard, d.rn, d.doc_id, d.weight,
               CASE WHEN p.fill > 0 AND p.fill + d.weight > {PACK_CAPACITY}
                    THEN p.bin_idx + 1 ELSE p.bin_idx END,
               CASE WHEN p.fill > 0 AND p.fill + d.weight > {PACK_CAPACITY}
                    THEN d.weight ELSE p.fill + d.weight END
        FROM pack p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1
    )
    SELECT doc_id, shard, CAST(bin_idx AS INTEGER) AS bin_idx, weight
    FROM pack
    ORDER BY shard, doc_id
    """,
    tags=("text", "packing", "grouped-map"),
)
def pack_documents_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy context-window packing: documents stream in doc_id order
    through 512-token bins, sharded so the inherently-sequential fold
    parallelizes (operators/text.py::pack_sequences_greedy — the one
    sanctioned applyInPandas stage in the registry; the oracle is a
    per-shard recursive CTE computing the identical fold, recursion
    depth = max shard size, all shards advancing per level). The
    arithmetic shard (doc_id % PACK_SHARDS) keeps the oracle portable;
    production uses the operator's default hash shard — the fold is
    shard-agnostic. Integer weights only, so engines cannot diverge.
    """
    from ..operators.text import pack_sequences_greedy

    cat = Catalog(spark, sf_dir)
    d = cat.documents.select(
        "doc_id",
        F.size(T.tokens("text")).cast("bigint").alias("weight"),
    )
    return pack_sequences_greedy(
        d,
        id_col="doc_id",
        weight_col="weight",
        capacity=PACK_CAPACITY,
        n_shards=PACK_SHARDS,
        shard_expr=F.pmod(F.col("doc_id"), F.lit(PACK_SHARDS)),
    ).select(
        "doc_id",
        "shard",
        "bin_idx",
        "weight",
    ).orderBy("shard", "doc_id")


# ------------------------------------------------------------------ chunking

CHUNK_SIZE = 128
CHUNK_STEP = 96  # size - overlap(32)


@query(
    "chunk_documents",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id,
               len(string_split_regex(lower(trim(text)), '\s+')) AS n
        FROM documents
    )
    SELECT doc_id,
           CAST(s / {CHUNK_STEP} AS INTEGER) AS chunk_idx,
           CAST(s AS INTEGER) AS start_tok,
           CAST(least(s + {CHUNK_SIZE}, n) AS INTEGER) AS end_tok
    FROM t, unnest(generate_series(0, n - 1, {CHUNK_STEP})) AS u(s)
    """,
    tags=("text", "chunking"),
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (128-token windows, 32-token
    overlap) — the context-length packing step before tokenization.
    Pure sequence+explode: chunk boundaries are computed from token
    counts, no per-row Python; at 100 TB this is a map-only stage."""
    cat = Catalog(spark, sf_dir)
    n = F.size(T.tokens("text"))
    # n is let-bound once per document via the 1-element transform
    # wrapper and rides the generator output as a struct field: the
    # old shape selected n ALONGSIDE the explode and CollapseProject
    # inlined the whole tokenize+size chain into the post-Generate
    # projection — re-tokenizing the document once per emitted chunk
    # (normalize_embeddings had the same bug, r15). explode_outer +
    # post-filter: avoids the inferred `size(...) > 0` scan filter
    # re-evaluating the chain a second time per document.
    spans = F.flatten(
        F.transform(
            F.array(n),
            lambda nn: F.transform(
                F.sequence(F.lit(0), nn - 1, F.lit(CHUNK_STEP)),
                lambda s: F.struct(s.alias("s"), nn.alias("n")),
            ),
        )
    )
    return (
        cat.documents.select("doc_id", F.explode_outer(spans).alias("sp"))
        .where(F.col("sp").isNotNull())
        .select(
            "doc_id",
            (F.col("sp.s") / CHUNK_STEP).cast("int").alias("chunk_idx"),
            F.col("sp.s").cast("int").alias("start_tok"),
            F.least(F.col("sp.s") + CHUNK_SIZE, F.col("sp.n"))
            .cast("int")
            .alias("end_tok"),
        )
    )


# ------------------------------------------------------------------ array funcs


@query(
    "array_funcs_embeddings",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           CAST(list_min(embedding) AS DOUBLE) AS v_min,
           CAST(list_max(embedding) AS DOUBLE) AS v_max,
           CAST(embedding[1] AS DOUBLE) AS v_first,
           CAST(embedding[len(embedding)] AS DOUBLE) AS v_last
    FROM embeddings
    """,
    tags=("array",),
)
def array_funcs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over the embedding column: size, min,
    max, first/last element — order-independent extractions that are
    exact in both engines (no float summation involved)."""
    cat = Catalog(spark, sf_dir)
    e = F.col("embedding")
    return cat.embeddings.select(
        "vec_id",
        F.size(e).alias("dim"),
        F.array_min(e).cast("double").alias("v_min"),
        F.array_max(e).cast("double").alias("v_max"),
        F.get(e, 0).cast("double").alias("v_first"),
        F.element_at(e, F.size(e)).cast("double").alias("v_last"),
    )


# -------------------------------------------------------- embedding transforms


@query(
    "normalize_embeddings",
    oracle=f"""
    SELECT vec_id, CAST(u.i - 1 AS INTEGER) AS i,
           ROUND(CAST(embedding[u.i] AS DOUBLE)
                 / sqrt({_sql_dot('embedding', 'embedding')}), 6)
           + 0.0 AS unit
    FROM embeddings, unnest(generate_series(1, {DIM})) AS u(i)
    """,
    tags=("embedding", "transform"),
)
def normalize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize embeddings (unit vectors for cosine-as-dot
    retrieval), emitted element-wise. The norm is the left-deep fold
    (bit-identical cross-engine); one map-only stage.

    The unit array is built per INPUT row inside the generator
    expression, with the norm let-bound via a 1-element transform
    wrapper: the previous shape computed ``__n`` in the same select as
    the posexplode, and CollapseProject inlined the whole
    sqrt(aggregate(...)) fold into the post-Generate projection —
    re-evaluating the 64-step fold once per EXPLODED element (64× per
    vector; measured 0.89 s → 0.12 s for the map stage, r15).
    posexplode_outer + null-filter keeps the inferred
    size(...)>0 scan filter from re-evaluating the array expression a
    second time (the chunk_documents lesson). Arithmetic per element
    is unchanged: round(cast(x as double) / norm, 6) + 0.0."""
    cat = Catalog(spark, sf_dir)
    unit_arr = F.flatten(
        F.transform(
            F.array(F.sqrt(norm_sq("embedding", DIM))),
            # __nrm is bound ONCE per row here; the inner transform
            # reuses it per element
            lambda nrm: F.transform(
                "embedding",
                # + 0.0 collapses IEEE signed zero: rounding a tiny
                # negative yields -0.0 in DuckDB but 0.0 in Spark, and
                # the driver's value hash tells them apart (seen at sf1)
                lambda x: F.round(x.cast("double") / nrm, 6) + F.lit(0.0),
            ),
        )
    )
    return (
        cat.embeddings.select(
            "vec_id", F.posexplode_outer(unit_arr).alias("i", "unit")
        )
        .where(F.col("i").isNotNull())
        .select("vec_id", F.col("i").cast("int").alias("i"), "unit")
    )


@query(
    "quantize_embeddings_int8",
    oracle=f"""
    WITH m AS (
        SELECT vec_id, embedding,
               CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
                   AS mx
        FROM embeddings
    )
    SELECT vec_id, CAST(u.i - 1 AS INTEGER) AS i,
           CAST(ROUND(127.0 * CAST(embedding[u.i] AS DOUBLE) / mx)
                AS INTEGER) AS q
    FROM m, unnest(generate_series(1, {DIM})) AS u(i)
    """,
    tags=("embedding", "quantization"),
)
def quantize_embeddings_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization (per-vector absmax scale) — the
    storage/ANN compression step; 4× smaller vectors with exact
    integer reconstruction rules. Map-only; the scale is an array max
    (order-independent, exact). The absmax is let-bound once per row
    via the 1-element transform wrapper (see normalize_embeddings:
    the old post-explode projection re-evaluated it per element)."""
    cat = Catalog(spark, sf_dir)
    mx = F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(x))).cast(
        "double"
    )
    q_arr = F.flatten(
        F.transform(
            F.array(mx),
            lambda m: F.transform(
                "embedding",
                lambda x: F.round(F.lit(127.0) * x.cast("double") / m).cast(
                    "int"
                ),
            ),
        )
    )
    return (
        cat.embeddings.select(
            "vec_id", F.posexplode_outer(q_arr).alias("i", "q")
        )
        .where(F.col("i").isNotNull())
        .select("vec_id", F.col("i").cast("int").alias("i"), "q")
    )


# ------------------------------------------------------------ dedup keep-list

_KEEP_SQL = f"""
    WITH {_SHINGLES_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    removed AS (
        SELECT DISTINCT id_b FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8
    )
    SELECT d.doc_id FROM documents d
    WHERE d.doc_id NOT IN (SELECT id_b FROM removed)
"""


@query("neardup_keep_list", oracle=_KEEP_SQL, tags=("dedup", "keep-list"))
def neardup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy near-dup keep-list: drop every document that has a
    near-duplicate (Jaccard ≥ 0.8) with a smaller doc_id — the
    keep-first policy of corpus dedup. One anti-join off the
    MinHash-LSH verified pair set; the oracle uses the exact pair set
    (LSH recall ≈ 1 at this banding, see minhash_lsh_pairs)."""
    cat = Catalog(spark, sf_dir)
    pairs = minhash_lsh_dedup_pairs(
        cat.documents, id_col="doc_id", text_col="text", threshold=0.8
    )
    removed = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return cat.documents.join(removed, on="doc_id", how="left_anti").select(
        "doc_id"
    )


# -------------------------------------------------------- dedup clustering

_CLUSTERS_SQL = f"""
    WITH RECURSIVE {_SHINGLES_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT id_a, id_b FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    reach AS (
        SELECT doc_id AS id, doc_id AS r FROM documents
        UNION
        SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
    )
    SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
"""


@query("neardup_cluster_ids", oracle=_CLUSTERS_SQL, tags=("dedup", "iterative"))
def neardup_cluster_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components over the verified
    MinHash pair graph, cluster_id = min doc_id in the component —
    the iterative-algorithm showcase (min-label propagation with
    localCheckpoint lineage truncation), oracle'd by a recursive-CTE
    transitive closure."""
    cat = Catalog(spark, sf_dir)
    pairs = minhash_lsh_dedup_pairs(
        cat.documents, id_col="doc_id", text_col="text", threshold=0.8
    )
    return connected_components(pairs, cat.documents, id_col="doc_id")


# --------------------------------------------------------------- quality gate


@query(
    "corpus_quality_gate",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, lang,
               string_split_regex(lower(trim(text)), '\s+') AS w
        FROM documents
    )
    SELECT doc_id, lang,
           CAST(len(w) AS INTEGER) AS n_tokens,
           ROUND(len(list_filter(w, x -> x IN
                 ('the','a','of','and','to','in','is','it'))) * 1.0
                 / greatest(len(w), 1), 6) AS stopword_ratio
    FROM t
    WHERE len(w) >= 30
      AND len(list_filter(w, x -> x IN
          ('the','a','of','and','to','in','is','it'))) * 1.0
          / greatest(len(w), 1) >= 0.02
    """,
    tags=("text", "quality", "filter"),
)
def corpus_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end quality gate: keep documents passing minimum length
    AND stopword-ratio thresholds (the composed filter step that sits
    between scoring and training-set write). Map-only; the predicate
    is pure codegen expressions so at 100 TB it rides the scan."""
    cat = Catalog(spark, sf_dir)
    m = T.quality_metrics("text")
    scored = cat.documents.select(
        "doc_id",
        "lang",
        m["n_tokens"].cast("int").alias("n_tokens"),
        m["stopword_ratio"].alias("__swr"),
    )
    return (
        scored.filter((F.col("n_tokens") >= 30) & (F.col("__swr") >= 0.02))
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.round("__swr", 6).alias("stopword_ratio"),
        )
    )


# ------------------------------------------------------- analytic query shapes


@query(
    "analytic_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           CAST(o_orderdate AS DATE) AS order_date,
           o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < DATE '1997-03-15'
      AND l_shipdate > DATE '1997-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, order_date, l_orderkey
    LIMIT 10
    """,
    tags=("analytic", "multi-join"),
)
def analytic_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way selective join → grouped revenue → top-k.
    Catalyst pushes both date filters to the scans, broadcasts the
    filtered customer dim, and the top-k is TakeOrderedAndProject —
    the plan to check in explains/."""
    cat = Catalog(spark, sf_dir)
    cust = cat.customer.filter(F.col("c_mktsegment") == "BUILDING")
    orders = cat.orders.filter(F.col("o_orderdate") < "1997-03-15")
    li = cat.lineitem.filter(F.col("l_shipdate") > "1997-03-15")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(rev), 4).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "order_date", "l_orderkey")
        .limit(10)
    )


@query(
    "analytic_local_supplier_volume",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01'
      AND o_orderdate < DATE '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("analytic", "multi-join"),
)
def analytic_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join (two facts, four dims) with the
    local-supplier co-nationality predicate. Dims broadcast; the one
    real shuffle pair is lineitem⨝orders; Catalyst prunes region→
    nation before either fact is touched."""
    cat = Catalog(spark, sf_dir)
    region = cat.region.filter(F.col("r_name") == "ASIA")
    nation = cat.nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    orders = cat.orders.filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        cat.lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cat.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(rev), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# ----------------------------------------------------------- range-frame window


@query(
    "window_trailing_30d_revenue",
    oracle="""
    SELECT o_custkey,
           CAST(o_orderdate AS DATE) AS order_date,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(o_orderdate AS DATE)
               RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
           ), 4) AS trailing_30d
    FROM orders
    """,
    tags=("window", "range-frame"),
)
def window_trailing_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-customer 30-day trailing revenue —
    the frame is value-based (date distance), not row-count-based.
    Spark expresses it as rangeBetween over epoch-day ordinals."""
    from pyspark.sql import Window

    cat = Catalog(spark, sf_dir)
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-30, 0)
    )
    return cat.orders.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.round(F.sum("o_totalprice").over(w), 4).alias("trailing_30d"),
    )


# --------------------------------------------------------- validity intervals


@query(
    "event_validity_intervals",
    oracle="""
    SELECT user_id, event_id,
           epoch_us(ts) AS valid_from_us,
           epoch_us(LEAD(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           )) AS valid_to_us
    FROM events
    """,
    tags=("window", "scd"),
)
def event_validity_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2-style validity intervals: each event's state is valid
    until the user's next event (NULL = current) — lead() over the
    per-user timeline, one shuffle."""
    from pyspark.sql import Window

    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return cat.events.select(
        "user_id",
        "event_id",
        epoch_us("ts").alias("valid_from_us"),
        epoch_us(F.lead("ts").over(w)).alias("valid_to_us"),
    )


# ------------------------------------------------------------ sequence packing

PACK_BUDGET = 2048


@query(
    "pack_documents_into_bins",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id, source,
               len(string_split_regex(lower(trim(text)), '\s+')) AS n_tok
        FROM documents
    ),
    c AS (
        SELECT doc_id, source, n_tok,
               SUM(n_tok) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM t
    )
    SELECT doc_id, source, CAST(n_tok AS INTEGER) AS n_tok,
           CAST(FLOOR((cum - n_tok) / {PACK_BUDGET}) AS INTEGER) AS bin_id
    FROM c
    """,
    tags=("packing",),
)
def pack_documents_into_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing: per source, documents fill
    token-budget bins in doc_id order (bin = floor of the running
    total BEFORE the doc / budget) — the context-window packing step
    before training, reproducible across partitionings because the
    order is a data column, not arrival order."""
    from pyspark.sql import Window

    cat = Catalog(spark, sf_dir)
    n_tok = F.size(T.tokens("text"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cat.documents.select("doc_id", "source", n_tok.alias("n_tok"))
        .withColumn("cum", F.sum("n_tok").over(w))
        .select(
            "doc_id",
            "source",
            F.col("n_tok").cast("int").alias("n_tok"),
            F.floor((F.col("cum") - F.col("n_tok")) / PACK_BUDGET)
            .cast("int")
            .alias("bin_id"),
        )
    )


# ----------------------------------------------------------------- PII scrub


@query(
    "pii_scrub_preview",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(
               regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
               '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER)
               AS n_emails
    FROM documents
    """,
    tags=("text", "pii"),
)
def pii_scrub_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass (emails, phone numbers → placeholder tokens)
    plus a per-doc match count for audit — the scrub step of a corpus
    release. Map-only regexp_replace, rides the scan at any scale."""
    cat = Catalog(spark, sf_dir)
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
    return cat.documents.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", email, "<EMAIL>"), phone, "<PHONE>"
        ).alias("scrubbed"),
        F.size(F.regexp_extract_all("text", F.lit(email))).alias("n_emails"),
    )


# ------------------------------------------------------------- SQL interface

_SRC_SUMMARY_SQL = """
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(AVG(n_chars), 6) AS avg_chars
    FROM documents
    GROUP BY source
"""


@query("sql_interface_source_summary", oracle=_SRC_SUMMARY_SQL, tags=("sql",))
def sql_interface_source_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL surface: Catalog.register_all() exposes every
    table as a view and the SAME ANSI text runs through spark.sql —
    one aggregation, identical in both engines by construction."""
    Catalog(spark, sf_dir).register_all()
    return spark.sql(_SRC_SUMMARY_SQL)


# ------------------------------------------------------------- stratified sample

_KNUTH = 2654435761  # Fibonacci-hash multiplier
_M32 = 4294967296
# reduce ids mod 2^31 before the Knuth multiply: the product then
# stays under int64 max at any corpus size (unreduced ids overflow
# at ~3.5e9 — Spark wraps silently while DuckDB errors on BIGINT
# overflow, breaking cross-engine parity; the bootstrap_mean_ci class)
_M31 = 2147483648


@query(
    "stratified_sample_langs",
    oracle=f"""
    SELECT doc_id, lang FROM documents
    WHERE ((doc_id % {_M31}) * {_KNUTH}) % {_M32} <
          CASE WHEN lang = 'en' THEN {_M32 // 2} ELSE {_M32} END
    """,
    tags=("sampling",),
)
def stratified_sample_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling: keep ~50% of the
    dominant language (en), 100% of the rest — the language-rebalance
    step of a corpus build. The keep decision is pure integer
    arithmetic on the key (Fibonacci multiplicative hash), so it is
    reproducible across engines, runs, and partitionings — unlike
    ``df.sample`` whose output depends on partition layout."""
    cat = Catalog(spark, sf_dir)
    bucket = ((F.col("doc_id") % F.lit(_M31)) * F.lit(_KNUTH)) % F.lit(
        _M32
    )
    cutoff = F.when(F.col("lang") == "en", F.lit(_M32 // 2)).otherwise(
        F.lit(_M32)
    )
    return cat.documents.filter(bucket < cutoff).select("doc_id", "lang")


# ------------------------------------------------------- deterministic splits


@query(
    "train_val_test_split",
    oracle="""
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                     THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e7'
                     THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    tags=("sampling", "split"),
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent
    id hash (~80/10/10 via the first md5 byte): reproducible across
    runs, partitionings, and engines — no RNG state, no global sort.
    Map-only; at 100 TB this is the split that never needs a shuffle
    and survives incremental corpus growth (old docs keep their
    split)."""
    cat = Catalog(spark, sf_dir)
    b = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return cat.documents.select(
        "doc_id",
        F.when(b < "cd", "train").when(b < "e7", "val").otherwise("test")
        .alias("split"),
    )


@query(
    "reservoir_per_lang",
    oracle="""
    WITH r AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    )
    SELECT doc_id, lang FROM r WHERE rn <= 25
    """,
    tags=("sampling", "reservoir"),
)
def reservoir_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size per-key sample (25 docs per language), deterministic
    reservoir-equivalent: rank by id hash within each key, keep the
    first k. One shuffle on the key; the hash order is uniform like a
    reservoir but reproducible. At scale, pre-aggregate with a
    per-partition top-k (rank pushes the sort map-side) rather than
    collecting whole keys."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        cat.documents.select("doc_id", "lang")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 25)
        .drop("__rn")
    )


# -------------------------------------------------------------- data mixing

#: target language mixture for the sampled training corpus and the
#: fraction of total corpus tokens the sample may spend. Shared
#: literals so Spark and the oracle rate-limit identically.
MIXTURE_WEIGHTS = {"en": 0.40, "zh": 0.15, "es": 0.15, "de": 0.15, "fr": 0.15}
MIXTURE_BUDGET = 0.5  # sample ~half the corpus tokens, reshaped to weights

#: Knuth multiplicative hash (2^32 / golden ratio): uniform fractions
#: from integer ids using ONLY int64 arithmetic both engines share —
#: no cross-engine hash-function dependency. The id is clamped to 31
#: bits BEFORE the multiply so the product stays < 2^62: without the
#: clamp a large id silently wraps int64 in Spark but promotes to
#: HUGEINT in DuckDB — divergent samples exactly at cluster scale.
_KNUTH = 2654435761
_MOD = 4294967296
_ID_CLAMP = 2147483648


def _mixture_case_sql() -> str:
    # CAST every literal to DOUBLE: DuckDB types bare 0.40/0.5 as
    # DECIMAL and would multiply exactly before promoting at the
    # division, while Spark computes IEEE double throughout — rates
    # could then differ by ulps and flip a boundary doc at corpus
    # scale. With the casts both engines run the same left-associated
    # double ops, restoring the bit-for-bit claim.
    whens = " ".join(
        f"WHEN '{lang}' THEN CAST({w} AS DOUBLE)"
        for lang, w in MIXTURE_WEIGHTS.items()
    )
    return f"CASE lang {whens} ELSE CAST(0.0 AS DOUBLE) END"


@query(
    "corpus_mixture_sample",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens
      FROM documents
    ), per_lang AS (
      SELECT lang, SUM(n_tokens) AS lang_tokens FROM d GROUP BY lang
    ), grand AS (
      SELECT SUM(n_tokens) AS total_tokens FROM d
    ), rates AS (
      SELECT lang,
             least(CAST(1.0 AS DOUBLE),
                   {_mixture_case_sql()} * CAST({MIXTURE_BUDGET} AS DOUBLE)
                        * total_tokens / lang_tokens) AS rate
      FROM per_lang, grand
    )
    SELECT d.doc_id, d.lang, CAST(d.n_tokens AS INTEGER) AS n_tokens
    FROM d JOIN rates USING (lang)
    WHERE (d.doc_id % {_ID_CLAMP}) * {_KNUTH} % {_MOD} / {_MOD}.0 < rate
    """,
    tags=("sampling", "mixing", "llm"),
)
def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing: reshape the corpus toward target language weights
    under a token budget — the sampling step that turns a crawl's
    natural distribution into a training mixture (cf. the per-source
    weights in GPT-3/Pile/LLaMA training recipes, public papers).

    Per-language keep rate = min(1, weight × budget × total_tokens /
    lang_tokens); a document is kept iff its id's uniform fraction
    falls under its language's rate. The fraction comes from a Knuth
    multiplicative hash in pure int64 arithmetic, so both engines
    agree bit-for-bit with no shared-hash-function dependency — and
    the keep decision is reproducible across runs, partitionings, and
    incremental corpus growth (old docs keep their verdict while
    rates hold). Plan shape at 100 TB: tokenize-once projection, one
    tiny per-lang aggregate + 1-row grand total (both broadcast), and
    a map-side filter — the corpus is scanned once and never
    shuffled. Rate arithmetic is parenthesized identically in both
    engines (left-assoc × then ÷) so the double compare cannot
    straddle an ulp."""
    d = Catalog(spark, sf_dir).documents.select(
        "doc_id",
        "lang",
        F.size(T.tokens("text")).alias("n_tokens"),
    )
    d = cache.track(d)
    per_lang = d.groupBy("lang").agg(
        F.sum("n_tokens").alias("__lang_tokens")
    )
    grand = d.agg(F.sum("n_tokens").alias("__total_tokens"))
    w_col = F.lit(None).cast("double")
    expr = None
    for lang, w in MIXTURE_WEIGHTS.items():
        cond = F.col("lang") == lang
        expr = F.when(cond, w) if expr is None else expr.when(cond, w)
    w_col = expr.otherwise(F.lit(0.0))
    rates = per_lang.join(F.broadcast(grand)).select(
        "lang",
        F.least(
            F.lit(1.0),
            w_col
            * MIXTURE_BUDGET
            * F.col("__total_tokens")
            / F.col("__lang_tokens"),
        ).alias("__rate"),
    )
    frac = (F.col("doc_id") % _ID_CLAMP) * _KNUTH % _MOD / F.lit(
        float(_MOD)
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(frac < F.col("__rate"))
        .select("doc_id", "lang", F.col("n_tokens").cast("int").alias("n_tokens"))
    )


#: quality-bucket epoch factors for the repetition-expansion step:
#: how many training epochs each quality tier contributes (the
#: FineWeb / DCLM-style "repeat good data" recipe, public papers).
#: Buckets come from the stopword-ratio proxy shared with
#: corpus_quality_gate.
EPOCHS_BY_BUCKET = {"high": 3, "mid": 1, "low": 0}


@query(
    "quality_epoch_expansion",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens,
             len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                 x -> x IN ('the','a','of','and','to','in','is','it'))) * 1.0
               / greatest(len(string_split_regex(lower(trim(text)), '\s+')), 1)
               AS sw
      FROM documents
    ), b AS (
      SELECT doc_id, n_tokens,
             CASE WHEN n_tokens >= 30 AND sw >= 0.05 THEN 'high'
                  WHEN n_tokens >= 30 AND sw >= 0.02 THEN 'mid'
                  ELSE 'low' END AS bucket
      FROM t
    )
    SELECT doc_id, bucket, CAST(epoch AS INTEGER) AS epoch
    FROM b, unnest(generate_series(1,
         CASE bucket WHEN 'high' THEN 3 WHEN 'mid' THEN 1 ELSE 0 END))
         AS u(epoch)
    """,
    tags=("sampling", "mixing", "quality", "llm"),
)
def quality_epoch_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted repetition: emit each document once per
    training epoch its quality tier earns (high=3, mid=1, low=0) —
    the "repeat good data, drop bad data" corpus-construction step.
    Scoring (token count + stopword ratio, shared with
    ``corpus_quality_gate``) and the sequence-explode are both
    map-side expressions: at 100 TB this rides the scan with no
    shuffle, and the (doc_id, epoch) output feeds shuffled-epoch
    training directly. Low-tier docs disappear in the explode
    (empty sequence), high-tier rows triplicate with an explicit
    epoch index."""
    cat = Catalog(spark, sf_dir)
    m = T.quality_metrics("text")
    b = cat.documents.select(
        "doc_id",
        F.when(
            (m["n_tokens"] >= 30) & (m["stopword_ratio"] >= 0.05), "high"
        )
        .when((m["n_tokens"] >= 30) & (m["stopword_ratio"] >= 0.02), "mid")
        .otherwise("low")
        .alias("bucket"),
    )
    epochs = None
    for bucket, k in EPOCHS_BY_BUCKET.items():
        cond = F.col("bucket") == bucket
        seq = F.sequence(F.lit(1), F.lit(k)) if k else F.array().cast(
            "array<int>"
        )
        epochs = F.when(cond, seq) if epochs is None else epochs.when(
            cond, seq
        )
    return (
        b.select("doc_id", "bucket", F.explode_outer(epochs).alias("epoch"))
        .where(F.col("epoch").isNotNull())
        .select("doc_id", "bucket", F.col("epoch").cast("int").alias("epoch"))
    )


#: exact per-language token budget for the head-cutoff variant
TOKEN_BUDGET_PER_LANG = 2000


@query(
    "token_budget_head",
    oracle=rf"""
    WITH d AS (
      SELECT doc_id, lang,
             len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_tokens
      FROM d
    )
    SELECT doc_id, lang, CAST(n_tokens AS INTEGER) AS n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_tokens <= {TOKEN_BUDGET_PER_LANG}
    """,
    tags=("sampling", "mixing", "budget", "llm"),
)
def token_budget_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT token-budget enforcement: per language, admit documents
    in a deterministic hash order until the running token total hits
    the budget — the complement to rate-based mixing
    (``corpus_mixture_sample``) when the recipe says "exactly N
    tokens of X", with integer running sums so the cutoff can never
    drift cross-engine.

    The hash order (md5 of the id) makes the admitted prefix a
    uniform sample that is stable across runs, partitionings, and
    corpus append order. Plan: one shuffle on lang + per-key sorted
    running sum. Scale note, honestly: few-language corpora make the
    per-key window the bottleneck at 100 TB — each language funnels
    through one task's sort. The scale path is
    ``token_budget_head_sharded`` below (``operators/windows.py::
    budget_head_hierarchical``): identical output under the SAME
    oracle, windowed per (lang, md5-prefix shard) with pruned shard
    offsets instead of one sort per language."""
    cat = Catalog(spark, sf_dir)
    d = cat.documents.select(
        "doc_id", "lang", F.size(T.tokens("text")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET_PER_LANG)
        .select(
            "doc_id",
            "lang",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        )
    )


@query(
    "token_budget_head_sharded",
    oracle=rf"""
    WITH d AS (
      SELECT doc_id, lang,
             len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_tokens
      FROM d
    )
    SELECT doc_id, lang, CAST(n_tokens AS INTEGER) AS n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_tokens <= {TOKEN_BUDGET_PER_LANG}
    """,
    tags=("sampling", "mixing", "budget", "llm"),
)
def token_budget_head_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hierarchical token-budget operator ``token_budget_head``'s
    docstring promises for 100 TB few-language corpora — SAME oracle,
    SAME admitted set and running sums, but the plan windows over
    (lang, md5-prefix shard) instead of funnelling each language
    through one task's sort. Shard offsets come from a tiny
    per-(lang, shard) aggregate; shards past the budget are pruned
    before the corpus-scale window (``operators/windows.py::
    budget_head_hierarchical``)."""
    from ..operators.windows import budget_head_hierarchical

    cat = Catalog(spark, sf_dir)
    d = cat.documents.select(
        "doc_id", "lang", F.size(T.tokens("text")).alias("n_tokens")
    )
    return budget_head_hierarchical(
        d,
        key_col="lang",
        id_col="doc_id",
        weight_col="n_tokens",
        budget=TOKEN_BUDGET_PER_LANG,
        cum_col="cum_tokens",
    ).select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
    )


@query(
    "lsh_incremental_neardup_pairs",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        FROM documents
    ),
    idx AS (
        SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
        FROM toks
    ),
    sh AS (
        SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        FROM idx
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    batch AS (SELECT doc_id FROM documents WHERE source = 'src0')
    SELECT id_a, id_b,
           ROUND(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8
      AND (id_a IN (SELECT doc_id FROM batch)
           OR id_b IN (SELECT doc_id FROM batch))
    """,
    tags=("dedup", "minhash", "lsh", "incremental"),
)
def lsh_incremental_neardup_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental MinHash/LSH near-dup maintenance, as a plan: docs
    from source 'src0' are the NEW batch; everything else stands for
    the persisted band-bucket state (operators/dedup.py::LshDedupState
    — in production the history side is a read of the versioned state
    table, bucketed by band_hash so the probe is co-located). Only the
    BATCH is shingled-signed-banded afresh; candidates are the batch
    self-join plus the batch→state equi-join on (band_idx, band_hash),
    then exact Jaccard verifies at τ=0.8. Oracle is the exact pair set
    restricted to pairs touching the batch — recall 1 for the same
    S-curve reason as minhash_lsh_pairs (fixture near-dups sit at
    s≈0.99; miss prob ~1e-22)."""
    from ..operators.dedup import (
        jaccard_on_pairs,
        lsh_band_buckets,
        minhash_signatures,
    )
    from ..operators.text import hashed_shingles

    docs = Catalog(spark, sf_dir).documents
    sh_all = cache.track(
        hashed_shingles(docs, id_col="doc_id", text_col="text", n=3).toDF(
            "id", "h"
        )
    )

    # ONE signature aggregation over the whole shingle table, split
    # into batch/state band rows afterwards: signatures are per-doc,
    # so splitting after signing is identical to signing each side —
    # and it halves the 64-conditional-MIN aggregate cost (the hot
    # stage of this plan). In production the state side is a READ of
    # the persisted band table (LshDedupState), not a recompute.
    is_batch = docs.select(
        F.col("doc_id").alias("id"), (F.col("source") == "src0").alias("b")
    )
    sig = minhash_signatures(sh_all, id_col="id", n_hashes=64)
    banded = cache.track(
        # no broadcast hint: the flag frame is O(corpus) rows, so the
        # join strategy is AQE's call (it broadcasts at this sf; at
        # 100 TB it would shuffle — and in production the whole flag
        # join disappears, the state side being a table read)
        lsh_band_buckets(sig, id_col="id", bands=16, rows=4).join(
            is_batch, on="id"
        )
    )
    # ONE probe join (r14): batch rows against the WHOLE banded table
    # (batch ∪ state), canonicalized + distinct. The candidate set is
    # identical to the old batch×batch + batch×state join pair —
    # batch×all = batch×batch ∪ batch×state, and least/greatest +
    # distinct collapses both orientations of a batch-batch meeting to
    # the one row the id_a < id_b filter used to keep — at half the
    # probe-join work (state-state pairs still never meet: id_a always
    # comes from the batch side).
    batch = banded.filter(F.col("b")).drop("b")
    a = batch.toDF("id_a", "band_idx", "band_hash")
    cand = (
        a.join(banded.toDF("id_b", "band_idx", "band_hash", "__b"),
               on=["band_idx", "band_hash"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )
    return (
        jaccard_on_pairs(cand, sh_all, id_col="id")
        .filter(F.col("jaccard") >= 0.8)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ----------------------------------------------------------- column profiling


@query(
    "profile_orders_columns",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(o_custkey) AS custkey_nonnull,
           COUNT(DISTINCT o_custkey) AS custkey_distinct,
           COUNT(DISTINCT o_orderstatus) AS status_distinct,
           ROUND(MIN(o_totalprice), 4) AS price_min,
           ROUND(MAX(o_totalprice), 4) AS price_max,
           ROUND(SUM(o_totalprice), 4) AS price_sum,
           CAST(MIN(o_orderdate) AS DATE) AS date_min,
           CAST(MAX(o_orderdate) AS DATE) AS date_max
    FROM orders
    """,
    tags=("profiling", "catalog"),
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-style column profile in ONE scan: row count, null
    counts, distinct cardinalities, numeric min/max/sum, date range —
    the stats block a data catalog publishes per table. Exact distinct
    here for the oracle; at 100 TB swap in approx_count_distinct (the
    plan shape is identical: single hash-agg, map-side partials)."""
    cat = Catalog(spark, sf_dir)
    o = cat.orders
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("custkey_nonnull"),
        F.countDistinct("o_custkey").alias("custkey_distinct"),
        F.countDistinct("o_orderstatus").alias("status_distinct"),
        F.round(F.min("o_totalprice"), 4).alias("price_min"),
        F.round(F.max("o_totalprice"), 4).alias("price_max"),
        F.round(F.sum("o_totalprice"), 4).alias("price_sum"),
        F.min(F.col("o_orderdate").cast("date")).alias("date_min"),
        F.max(F.col("o_orderdate").cast("date")).alias("date_max"),
    )


# ---------------------------------------------------------- incremental dedup


@query(
    "dedup_incremental_batch",
    oracle=r"""
    WITH fp AS (
        SELECT doc_id, source,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
        FROM documents
    )
    SELECT n.doc_id, n.f AS fingerprint
    FROM fp n
    WHERE n.source = 'src0'
      AND NOT EXISTS (
          SELECT 1 FROM fp e WHERE e.source <> 'src0' AND e.f = n.f
      )
    """,
    tags=("dedup", "incremental"),
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: keep only new-batch docs (source
    'src0') whose content fingerprint is absent from the existing
    corpus — a LEFT ANTI join on the 16-byte fingerprint, so the
    shuffle carries hashes, not text. The per-batch plan for a corpus
    that grows daily; at 100 TB the existing side is a bucketed
    fingerprint index, making the anti-join co-located."""
    cat = Catalog(spark, sf_dir)
    fp = cat.documents.select(
        "doc_id", "source", T.fingerprint("text").alias("fingerprint")
    )
    new = fp.filter(F.col("source") == "src0")
    old = fp.filter(F.col("source") != "src0").select("fingerprint")
    return new.join(old, on="fingerprint", how="left_anti").select(
        "doc_id", "fingerprint"
    )


# ------------------------------------------------------- resample / gap-fill


@query(
    "resample_daily_orders",
    oracle="""
    WITH b AS (
        SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
               CAST(MAX(o_orderdate) AS DATE) AS hi
        FROM orders
    ),
    days AS (
        SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
        FROM b
    ),
    pr AS (SELECT DISTINCT o_orderpriority AS priority FROM orders),
    spine AS (SELECT day, priority FROM days CROSS JOIN pr),
    daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               o_orderpriority AS priority,
               COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 4) AS rev
        FROM orders GROUP BY 1, 2
    )
    SELECT s.day, s.priority,
           COALESCE(d.n, 0) AS n_orders,
           COALESCE(d.rev, 0) AS revenue,
           COALESCE(LAST_VALUE(d.rev IGNORE NULLS) OVER (
               PARTITION BY s.priority ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 0) AS revenue_ffill
    FROM spine s LEFT JOIN daily d ON s.day = d.day AND s.priority = d.priority
    """,
    tags=("timeseries", "resample"),
)
def resample_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling to a dense daily grid: build the
    (day x priority) spine with sequence()+explode (no driver loop),
    left-join the daily aggregate, zero-fill counts, and forward-fill
    revenue with last(ignorenulls) over the per-key timeline. The
    spine is generated, never shuffled at input scale; the one big
    shuffle is the daily aggregate itself. Gap-fill pattern for any
    downsampled feed."""
    cat = Catalog(spark, sf_dir)
    o = cat.orders.withColumn("day", F.col("o_orderdate").cast("date"))
    bounds = o.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    days = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    priorities = o.select(
        F.col("o_orderpriority").alias("priority")
    ).distinct()
    spine = days.crossJoin(F.broadcast(priorities))
    daily = o.groupBy("day", F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 4).alias("rev"),
    )
    w = (
        Window.partitionBy("priority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(daily, on=["day", "priority"], how="left")
        .select(
            "day",
            "priority",
            F.coalesce("n", F.lit(0)).alias("n_orders"),
            F.coalesce("rev", F.lit(0.0)).alias("revenue"),
            F.coalesce(
                F.last("rev", ignorenulls=True).over(w), F.lit(0.0)
            ).alias("revenue_ffill"),
        )
    )


# ------------------------------------------------------ distribution ranking


@query(
    "customer_spend_quartiles",
    oracle="""
    WITH spend AS (
        SELECT o_custkey, ROUND(SUM(o_totalprice), 4) AS total
        FROM orders GROUP BY 1
    )
    SELECT o_custkey, total,
           NTILE(4) OVER (ORDER BY total DESC, o_custkey) AS quartile,
           ROUND(PERCENT_RANK() OVER (ORDER BY total DESC, o_custkey), 6)
               AS pct_rank
    FROM spend
    """,
    tags=("window", "ranking"),
)
def customer_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global distribution ranking: ntile quartiles + percent_rank over
    per-customer spend — WITHOUT the single-task global window.

    ``global_row_number`` range-buckets on approx-quantile bounds, ranks
    within buckets, and adds broadcast offsets, so every task sorts only
    ~1/32 of the customers; NTILE and PERCENT_RANK are then pure
    arithmetic on the exact global rank (the (total, custkey) order is a
    total order, so rank == row_number and the result is bit-identical
    to the oracle's global window)."""
    cat = Catalog(spark, sf_dir)
    # track: the spend aggregate feeds the ranker's quantile job, its
    # bucket-count collect, AND the final plan — untracked, the orders
    # groupBy re-executed per action (r14)
    spend = cache.track(
        cat.orders.groupBy("o_custkey").agg(
            F.round(F.sum("o_totalprice"), 4).alias("total")
        )
    )
    ranked = global_row_number(
        spend,
        value_col="total",
        ascending=False,
        tiebreak_cols=["o_custkey"],
        name="__r",
        total_col="__n",
    )
    # NTILE(k): first (N mod k) buckets get ceil(N/k) rows, rest floor.
    k = 4
    r, n = F.col("__r"), F.col("__n")
    q = (n / k).cast("long")
    rem = n % k
    big = rem * (q + 1)
    quartile = (
        F.when(r <= big, ((r - 1) / (q + 1)).cast("long"))
        .otherwise(rem + ((r - 1 - big) / F.greatest(q, F.lit(1))).cast("long"))
        + 1
    ).cast("long")  # DuckDB NTILE binds BIGINT (r13 width guard)
    pct = (r - 1).cast("double") / F.greatest(n - 1, F.lit(1)).cast("double")
    return ranked.select(
        "o_custkey",
        "total",
        quartile.alias("quartile"),
        F.round(pct, 6).alias("pct_rank"),
    )


# ------------------------------------------------------ semantic dedup

#: expected vectors per k-means cell: k = clamp(N / this, 8, 64), the
#: SemDeDup recipe (k grows with the corpus so within-cell pair count
#: — the quadratic residual — stays ~linear in N). Both engines
#: compute k from the same COUNT with integer division, so the cell
#: model is identical at every scale factor.
_SEMDEDUP_CELL = 250

_SEMDEDUP_SQL = f"""
    WITH qv AS MATERIALIZED (
        SELECT vec_id, embedding,
               sqrt({_sql_dot('embedding', 'embedding')}) AS nrm,
               list_transform(
                   embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1024.0 + 0.5)
                             AS BIGINT)
               ) AS q
        FROM embeddings
    ),
    nk AS (
        SELECT GREATEST(8, LEAST(64, CAST(COUNT(*) // {_SEMDEDUP_CELL}
                                          AS INT))) AS k
        FROM qv
    ),
    seed AS (
        SELECT vec_id, q FROM (
            SELECT vec_id, q,
                   ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
            FROM qv
        ) WHERE rn <= (SELECT k FROM nk)
    ),
    c0 AS MATERIALIZED (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) AS cell,
               q AS s
        FROM seed
    ),
    {",".join(_kmeans_sql_round(i) for i in (1, 2))},
    {_kmeans_sql_assign("af", "c2")},
    removed AS (
        SELECT DISTINCT y.vec_id AS vec_id
        FROM af x
        JOIN af y ON x.cell = y.cell AND x.vec_id < y.vec_id
        JOIN qv ea ON ea.vec_id = x.vec_id
        JOIN qv eb ON eb.vec_id = y.vec_id
        WHERE ({_sql_dot('ea.embedding', 'eb.embedding')})
              / (ea.nrm * eb.nrm) >= 0.45
    )
    SELECT v.vec_id, CAST(a.cell AS INT) AS cell
    FROM qv v JOIN af a ON a.vec_id = v.vec_id
    WHERE v.vec_id NOT IN (SELECT vec_id FROM removed)
"""


@query(
    "semantic_dedup_keep",
    oracle=_SEMDEDUP_SQL,
    tags=("dedup", "semantic", "kmeans"),
)
def semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, public):
    k-means the embedding space into cells, compare pairs ONLY within
    a cell at exact cosine >= 0.45, and keep the lowest vec_id of any
    similar pair — the keep-list that prunes semantically redundant
    training examples without an all-pairs pass.

    Scale shape: cell training is the deterministic integer-sum Lloyd
    of ``kmeans_cells_exact`` (one scan + one k-row hash aggregate per
    iteration); the candidate stage is the Arrow GEMM kernel BLOCKED
    on the cell id (``same_col`` mask in stage 1), so only same-cell
    pairs are ever emitted and the quadratic is bounded by the
    largest cell, never the corpus. The published recipe's k-scaling
    is LIVE here: k = clamp(N / _SEMDEDUP_CELL, 8, 64) from one
    COUNT, so the expected cell size — and with it the within-cell
    pair count per vector — is pinned as the corpus grows (the sf1
    growth ratio in SCALING §sf1 is the measurement); both engines
    derive k from the same integer division, and the sharded build
    side of ``neardup_pairs_gemm`` bounds executor memory regardless
    of k. Value-exact on both engines because the cell assignment is
    the order-free quantized Lloyd (see ann_ivf_kmeans_topk) and
    every surviving candidate is re-scored with the same left-deep
    double fold the oracle evaluates."""
    from ..operators.similarity import kmeans_cells_exact

    cat = Catalog(spark, sf_dir)
    n = cat.embeddings.count()
    k = max(8, min(64, n // _SEMDEDUP_CELL))
    assigned = kmeans_cells_exact(
        cat.embeddings,
        id_col="vec_id",
        vec_col="embedding",
        dim=DIM,
        k=k,
        iters=2,
    )
    from ..operators.similarity import neardup_pairs_gemm

    # Within-cell pairs via the Arrow GEMM kernel BLOCKED on the cell
    # id (same_col): the cell-equality test rides the stage-1 numpy
    # mask, and the surviving candidates are re-scored with the exact
    # left-deep fold — bit-identical to an expression self-join on the
    # cell key, ~40x faster at sf1 (25M array-fold pairs is the slow
    # path; see embedding_neardup_pairs).
    pairs = neardup_pairs_gemm(
        assigned,
        id_col="vec_id",
        vec_col="embedding",
        dim=DIM,
        threshold=0.45,
        same_col="__cell",
    )
    removed = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    return assigned.join(removed, on="vec_id", how="left_anti").select(
        "vec_id", F.col("__cell").cast("int").alias("cell")
    )


# ------------------------------------------- DSIR importance weights

_DSIR_SQL = r"""
    WITH toks AS (
        SELECT doc_id, lang,
               unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        FROM documents
    ),
    src AS (SELECT w, COUNT(*) AS cs FROM toks GROUP BY w),
    tgt AS (SELECT w, COUNT(*) AS ct FROM toks WHERE lang = 'en' GROUP BY w),
    tot AS (
        SELECT CAST(SUM(cs) AS BIGINT) AS ns,
               CAST(COUNT(*) AS BIGINT) AS v,
               (SELECT CAST(COALESCE(SUM(ct), 0) AS BIGINT) FROM tgt) AS nt
        FROM src
    ),
    lr AS (
        SELECT src.w,
               LN(CAST(COALESCE(tgt.ct, 0) + 1 AS DOUBLE)
                  / CAST(nt + v AS DOUBLE))
               - LN(CAST(src.cs + 1 AS DOUBLE)
                    / CAST(ns + v AS DOUBLE)) AS llr
        FROM src LEFT JOIN tgt ON src.w = tgt.w CROSS JOIN tot
    ),
    dtc AS (
        SELECT doc_id, lang, w, COUNT(*) AS c
        FROM toks GROUP BY doc_id, lang, w
    ),
    weights AS (
        SELECT doc_id, lang,
               SUM(CAST(c AS DOUBLE) * llr) AS wgt
        FROM dtc JOIN lr ON dtc.w = lr.w
        GROUP BY doc_id, lang
    )
    SELECT doc_id, lang, ROUND(wgt, 6) + 0.0 AS dsir_weight
    FROM weights
    ORDER BY dsir_weight DESC, doc_id
    LIMIT 100
"""


@query(
    "dsir_importance_weights",
    oracle=_DSIR_SQL,
    tags=("llm", "sampling", "importance"),
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, public): score
    every document by the log-likelihood ratio between a TARGET
    unigram model (here the ``lang='en'`` slice) and the SOURCE model
    (the whole corpus), both add-one smoothed over the source
    vocabulary — the data-selection step that resamples a raw crawl
    toward a target distribution. Top-100 by weight.

    Scale shape: token instances flow through two hash aggregates
    (per-token counts for source/target — map-side combined), the
    per-token log-ratio is computed once per DISTINCT token and
    joined back to per-doc token counts (never per instance), the
    corpus totals are a 1-row broadcast, and the global top-100
    compiles to TakeOrderedAndProject (per-partition heads, no global
    sort). The add-one smoothing keeps every count integer until the
    LN, so both engines evaluate LN on identical rationals — but the
    LN *outputs* are libm doubles (JVM Math.log vs DuckDB may differ
    by ULPs) and the per-doc SUM is order-dependent float addition, so
    the raw ``wgt`` is NOT cross-engine exact. The top-100 cut is
    therefore taken on the deterministic surrogate
    ``(ROUND(wgt, 6) DESC, doc_id)`` in BOTH engines: a ULP drift in
    wgt cannot reorder the cut unless it lands exactly on a 1e-6
    rounding boundary, the repo-wide accepted tolerance for every
    ROUND(_, 6) output column."""
    cat = Catalog(spark, sf_dir)
    # explode_outer + null-filter: the inner explode re-tokenized each
    # document inside the inferred scan filter (tokens() never yields
    # an empty array, so the row set is identical)
    toks = cat.documents.select(
        "doc_id", "lang", F.explode_outer(T.tokens("text")).alias("w")
    ).where(F.col("w").isNotNull())
    src = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cs"))
    tgt = (
        toks.filter(F.col("lang") == "en")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    tot = src.agg(
        F.sum("cs").alias("ns"), F.count(F.lit(1)).alias("v")
    ).crossJoin(
        tgt.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("nt"))
    )
    lr = (
        src.join(tgt, on="w", how="left")
        .crossJoin(F.broadcast(tot))
        .select(
            "w",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                    / (F.col("nt") + F.col("v")).cast("double")
                )
                - F.log(
                    (F.col("cs") + 1).cast("double")
                    / (F.col("ns") + F.col("v")).cast("double")
                )
            ).alias("llr"),
        )
    )
    dtc = toks.groupBy("doc_id", "lang", "w").agg(
        F.count(F.lit(1)).alias("c")
    )
    weights = (
        dtc.join(lr, on="w")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("c").cast("double") * F.col("llr")).alias("wgt"))
    )
    return (
        weights.select(
            "doc_id",
            "lang",
            (F.round("wgt", 6) + F.lit(0.0)).alias("dsir_weight"),
        )
        .orderBy(F.desc("dsir_weight"), "doc_id")
        .limit(100)
    )


# ------------------------------------------------ prototype pruning

_PROTO_SQL = f"""
    WITH qv AS MATERIALIZED (
        SELECT vec_id, embedding,
               list_transform(
                   embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1024.0 + 0.5)
                             AS BIGINT)
               ) AS q
        FROM embeddings
    ),
    seed AS (SELECT vec_id, q FROM qv ORDER BY vec_id LIMIT 8),
    c0 AS MATERIALIZED (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) AS cell,
               q AS s
        FROM seed
    ),
    {",".join(_kmeans_sql_round(i) for i in (1, 2))},
    {_kmeans_sql_assign("af", "c2")},
    scored AS (
        SELECT v.vec_id, a.cell,
               ({_sql_dot('v.q', 'c.s')})
               / (sqrt({_sql_dot('v.q', 'v.q')})
                  * sqrt({_sql_dot('c.s', 'c.s')})) AS score
        FROM qv v
        JOIN af a ON a.vec_id = v.vec_id
        JOIN c2 c ON c.cell = a.cell
    ),
    r AS (
        SELECT vec_id, cell, score,
               ROW_NUMBER() OVER (
                   PARTITION BY cell ORDER BY score DESC, vec_id
               ) AS rn,
               COUNT(*) OVER (PARTITION BY cell) AS n
        FROM scored
    )
    SELECT vec_id, CAST(cell AS INT) AS cell,
           ROUND(score, 6) + 0.0 AS proto_score
    FROM r WHERE rn * 10 > n
    ORDER BY vec_id
"""


@query(
    "embedding_prototype_prune",
    oracle=_PROTO_SQL,
    tags=("pruning", "semantic", "kmeans"),
)
def embedding_prototype_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSL-prototypes data pruning (Sorscher et al. 2022, DataComp
    recipe, public): k-means the embedding space, score every vector
    by cosine to its OWN cell centroid, and drop the most prototypical
    decile per cell — easy, redundant examples prune first, keeping
    the hard/rare tail that drives scaling-law gains. Complements
    semantic_dedup_keep (which removes near-DUPLICATE pairs; this
    removes over-REPRESENTED regions).

    Scale shape: the trainer is the same deterministic integer-sum
    Lloyd as semantic dedup; the centroid table is k rows
    broadcast-joined on the cell id, the per-cell decile is a window
    over ~cell-size rows (pinned ~constant when k scales with N, see
    SCALING §SemDeDup). Bit-exact across engines: quantized-integer
    dots and norms are exact doubles (< 2^53) in ANY order, the final
    divide is one IEEE op on identical operands, and the per-cell
    rank breaks ties by vec_id — so the fraction boundary
    ``rn * 10 > n`` is pure integer arithmetic on identical ranks."""
    import math as _math

    from ..operators.similarity import (
        dot_pair,
        kmeans_cells_exact,
        quantize_expr,
    )

    cat = Catalog(spark, sf_dir)
    assigned, state = kmeans_cells_exact(
        cat.embeddings,
        id_col="vec_id",
        vec_col="embedding",
        dim=DIM,
        k=8,
        iters=2,
        return_state=True,
    )
    cent_rows = []
    for cell, svec in enumerate(state, start=1):
        acc = 0.0
        for s in svec:
            fs = float(s)
            acc += fs * fs  # left-deep, matches _sql_dot(c.s, c.s)
        cent_rows.append((cell, [float(s) for s in svec], _math.sqrt(acc)))
    cent = spark.createDataFrame(
        cent_rows, "cell int, __s array<double>, __snorm double"
    )
    scored = (
        assigned.withColumn("__q", quantize_expr("embedding", 1024.0))
        .withColumn("cell", F.col("__cell").cast("int"))
        .join(F.broadcast(cent), on="cell")
        .select(
            "vec_id",
            "cell",
            (
                dot_pair("__q", "__s", DIM)
                / (F.sqrt(dot_pair("__q", "__q", DIM)) * F.col("__snorm"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("cell").orderBy(F.desc("score"), "vec_id")
    r = scored.select(
        "vec_id",
        "cell",
        "score",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("cell")).alias("n"),
    )
    return (
        r.filter(F.col("rn") * 10 > F.col("n"))
        .select(
            "vec_id",
            "cell",
            (F.round("score", 6) + F.lit(0.0)).alias("proto_score"),
        )
        .orderBy("vec_id")
    )


# ------------------------------------------------- hard-negative mining

_HARDNEG_SQL = f"""
    WITH q AS (
        SELECT vec_id AS qid, label AS qlabel, embedding AS qv
        FROM embeddings WHERE vec_id < 5
    ),
    scored AS (
        SELECT q.qid, e.vec_id, e.label,
               {_sql_cosine('e.embedding', 'q.qv')} AS c
        FROM embeddings e JOIN q ON e.label <> q.qlabel
    ),
    r AS (
        SELECT qid, vec_id, label, c,
               ROW_NUMBER() OVER (
                   PARTITION BY qid ORDER BY c DESC, vec_id
               ) AS rn
        FROM scored
    )
    SELECT qid, vec_id, label, ROUND(c, 6) AS cosine
    FROM r WHERE rn <= 5
"""


@query(
    "hard_negative_mining_topk",
    oracle=_HARDNEG_SQL,
    tags=("similarity", "training", "topk"),
)
def hard_negative_mining_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector (vec_id < 5), the 5 most cosine-similar vectors with a
    DIFFERENT label — the highest-loss negatives a retrieval trainer
    wants in-batch.

    Scale shape: the 5-row query set broadcasts, the score is one
    map-side left-deep fold riding the scan, and the per-query top-k
    is TWO-PHASE — a local row_number inside (qid, vec_id%32) shards
    takes each shard's top 5, then the global rank runs over at most
    5*32 survivors per query — so no single task ever sorts a whole
    query's candidate stream (the few-key window cliff, SCALING
    s.token-budget). Identical output to the single-window plan
    because every global top-5 member is by definition in its shard's
    top 5, and ties are impossible to misorder (vec_id tiebreak on
    bit-identical doubles)."""
    cat = Catalog(spark, sf_dir)
    e = cat.embeddings
    qs = F.broadcast(
        e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("qid"),
            F.col("label").alias("qlabel"),
            F.col("embedding").alias("qv"),
        )
    )
    scored = (
        e.crossJoin(qs)
        .filter(F.col("label") != F.col("qlabel"))
        .select(
            "qid",
            "vec_id",
            "label",
            cosine_pair("embedding", "qv", DIM).alias("__c"),
            (F.col("vec_id") % 32).alias("__shard"),
        )
    )
    local = Window.partitionBy("qid", "__shard").orderBy(
        F.col("__c").desc(), F.col("vec_id").asc()
    )
    survivors = scored.withColumn(
        "__lr", F.row_number().over(local)
    ).filter(F.col("__lr") <= 5)
    final = Window.partitionBy("qid").orderBy(
        F.col("__c").desc(), F.col("vec_id").asc()
    )
    return (
        survivors.withColumn("__r", F.row_number().over(final))
        .filter(F.col("__r") <= 5)
        .select("qid", "vec_id", "label", F.round("__c", 6).alias("cosine"))
    )


# ---------------------------------------------- leakage-safe train split


@query(
    "leakage_safe_split",
    oracle=f"""
    SELECT doc_id, cluster_id,
           CASE WHEN cluster_id % 10 < 8 THEN 'train' ELSE 'test' END
               AS split
    FROM ({_CLUSTERS_SQL}) cl
    """,
    tags=("dedup", "split", "iterative"),
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/test split: near-duplicate CLUSTERS (not
    documents) are the unit of assignment, so two near-dup documents
    can never land on opposite sides of the split — the
    contamination-by-construction guard an eval pipeline needs before
    any held-out measurement.

    Composition: verified MinHash-LSH pairs -> connected components
    (min-label + pointer jumping) -> route each cluster by
    ``cluster_id % 10`` (8/10 train). The route key is the component's
    min doc_id — already materialized, integer, engine-portable modulo
    (non-negative), and uniform enough for a synthetic-id corpus; a
    production corpus with adversarial id spacing would hash the
    cluster_id first. Cost is one CC run over the pair graph
    (log-diameter rounds) plus a map-side CASE — the split itself adds
    no shuffle."""
    cat = Catalog(spark, sf_dir)
    pairs = minhash_lsh_dedup_pairs(
        cat.documents, id_col="doc_id", text_col="text", threshold=0.8
    )
    cc = connected_components(pairs, cat.documents, id_col="doc_id")
    return cc.select(
        "doc_id",
        "cluster_id",
        F.when(F.col("cluster_id") % 10 < 8, F.lit("train"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


# ----------------------------------------------------- RRF rank fusion

_RRF_K = 60
_RRF_ARM_K = 100


def _rrf_sql() -> str:
    ctes, total = _bm25_sql_parts()
    cos = _sql_cosine("e.embedding", "dq.qv")
    return rf"""
    WITH {ctes},
    lex AS (
        SELECT doc_id, r FROM (
            SELECT f.doc_id,
                   ROW_NUMBER() OVER (ORDER BY {total} DESC, f.doc_id) AS r
            FROM feat f CROSS JOIN g
            WHERE {" + ".join(f"f.tf_{t}" for t in BM25_TERMS)} > 0
        ) WHERE r <= {_RRF_ARM_K}
    ),
    dq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    den AS (
        SELECT vec_id, r FROM (
            SELECT e.vec_id,
                   ROW_NUMBER() OVER (ORDER BY {cos} DESC, e.vec_id) AS r
            FROM embeddings e CROSS JOIN dq
        ) WHERE r <= {_RRF_ARM_K}
    ),
    fused AS (
        SELECT COALESCE(l.doc_id, d.vec_id) AS doc_id,
               CAST(l.r AS INT) AS lex_rank,
               CAST(d.r AS INT) AS emb_rank,
               COALESCE(CAST(1.0 AS DOUBLE)
                        / CAST({_RRF_K} + l.r AS DOUBLE),
                        CAST(0.0 AS DOUBLE))
               + COALESCE(CAST(1.0 AS DOUBLE)
                          / CAST({_RRF_K} + d.r AS DOUBLE),
                          CAST(0.0 AS DOUBLE)) AS rrf
        FROM lex l FULL OUTER JOIN den d ON l.doc_id = d.vec_id
    )
    SELECT doc_id, lex_rank, emb_rank, ROUND(rrf, 6) AS rrf
    FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
    """


@query(
    "rrf_fusion_topk",
    oracle=_rrf_sql(),
    tags=("retrieval", "fusion", "similarity"),
)
def rrf_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of a lexical and a dense retrieval arm
    (Cormack et al. 2009, public): BM25 top-100 for the fixed term
    query fused with cosine top-100 against the vec_id=0 query vector
    by score = sum 1/(60 + rank), missing arm contributing 0 — the
    standard hybrid-search ranker.

    Scale shape: each arm is TakeOrderedAndProject top-K (no global
    sort — K bounds the only single-task step, ranking 100 collected
    rows), and the fusion is a full-outer join of two 100-row frames.
    The id spaces genuinely differ (at sf0.1 only 2000 of 5000 docs
    are embedded), so the outer join is doing real work: lexical-only
    hits still rank. Rank floats are 1/(60+r) over INTEGER ranks —
    both engines divide the same doubles, so fusion scores and ties
    (same rank in one arm only) order identically under the doc_id
    tiebreak."""
    cat = Catalog(spark, sf_dir)
    lex100 = (
        _bm25_scored(cat.documents)
        .orderBy(F.col("__score").desc(), F.col("doc_id").asc())
        .limit(_RRF_ARM_K)
    )
    lexr = lex100.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("__score").desc(), F.col("doc_id").asc()))
        .alias("rl"),
    )
    e = cat.embeddings
    qv = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    )
    den100 = (
        e.crossJoin(qv)
        .select("vec_id", cosine_pair("embedding", "qv", DIM).alias("__c"))
        .orderBy(F.col("__c").desc(), F.col("vec_id").asc())
        .limit(_RRF_ARM_K)
    )
    denr = den100.select(
        "vec_id",
        F.row_number()
        .over(Window.orderBy(F.col("__c").desc(), F.col("vec_id").asc()))
        .alias("rd"),
    )
    contrib_l = F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("rl")).cast("double"),
        F.lit(0.0),
    )
    contrib_d = F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("rd")).cast("double"),
        F.lit(0.0),
    )
    fused = lexr.join(
        denr, lexr.doc_id == denr.vec_id, "full_outer"
    ).select(
        F.coalesce(lexr.doc_id, denr.vec_id).alias("doc_id"),
        F.col("rl").cast("int").alias("lex_rank"),
        F.col("rd").cast("int").alias("emb_rank"),
        (contrib_l + contrib_d).alias("__rrf"),
    )
    return (
        fused.orderBy(F.col("__rrf").desc(), F.col("doc_id").asc())
        .limit(10)
        .select(
            "doc_id",
            "lex_rank",
            "emb_rank",
            F.round("__rrf", 6).alias("rrf"),
        )
    )


# --------------------------------------------- int8-quantization recall

_Q_SCALE = 64.0  # power of two: x*scale is exact, both engines floor alike


@query(
    "ann_int8_recall",
    oracle=f"""
    WITH qz AS (
        SELECT vec_id, embedding,
               list_transform(
                   embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * {_Q_SCALE} + 0.5)
                             AS BIGINT)
               ) AS q
        FROM embeddings
    ),
    anchor AS (SELECT embedding AS qv, q AS qq FROM qz WHERE vec_id = 0),
    exact10 AS (
        SELECT e.vec_id FROM qz e CROSS JOIN anchor a
        ORDER BY {_sql_cosine('e.embedding', 'a.qv')} DESC, e.vec_id
        LIMIT 10
    ),
    quant10 AS (
        SELECT e.vec_id FROM qz e CROSS JOIN anchor a
        WHERE ({_sql_dot('e.q', 'e.q')}) > 0
        ORDER BY CAST({_sql_dot('e.q', 'a.qq')} AS DOUBLE)
                 / (sqrt(CAST({_sql_dot('e.q', 'e.q')} AS DOUBLE))
                    * sqrt(CAST({_sql_dot('a.qq', 'a.qq')} AS DOUBLE)))
                 DESC, e.vec_id
        LIMIT 10
    )
    SELECT CAST(COUNT(*) AS INT) AS n_overlap,
           ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(10.0 AS DOUBLE), 6)
               AS recall_at_10
    FROM exact10 JOIN quant10 USING (vec_id)
    """,
    tags=("similarity", "ann", "quantization"),
)
def ann_int8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of int8-style quantized cosine scoring vs exact float
    cosine, against the vec_id=0 anchor — the measurement that tells
    you whether the 4x-smaller quantized index you'd ship at 100 TB
    (scan bytes dominate there) actually preserves the neighbors.

    Both arms are map-side score + TakeOrderedAndProject. The
    quantized arm scores with INTEGER dot products of
    floor(x*64 + 0.5) codes (power-of-two scale: the multiply is
    exact, so both engines floor identical doubles and every score is
    a ratio of exact integers — ties on the coarse grid are real and
    broken by vec_id identically in both engines). Zero-norm codes
    are excluded in both engines before the divide."""
    cat = Catalog(spark, sf_dir)
    from ..operators.similarity import dot_pair, quantize_expr

    qz = cat.embeddings.select(
        "vec_id",
        "embedding",
        quantize_expr("embedding", _Q_SCALE).alias("q"),
    )
    anchor = F.broadcast(
        qz.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv"), F.col("q").alias("qq")
        )
    )
    both = qz.crossJoin(anchor)
    exact10 = (
        both.select(
            "vec_id", cosine_pair("embedding", "qv", DIM).alias("__c")
        )
        .orderBy(F.col("__c").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id")
    )
    qnorm = dot_pair("q", "q", DIM)
    qscore = dot_pair("q", "qq", DIM).cast("double") / (
        F.sqrt(qnorm.cast("double"))
        * F.sqrt(dot_pair("qq", "qq", DIM).cast("double"))
    )
    quant10 = (
        both.filter(qnorm > 0)
        .select("vec_id", qscore.alias("__qs"))
        .orderBy(F.col("__qs").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id")
    )
    return exact10.join(quant10, on="vec_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_overlap"),
        F.round(
            F.count(F.lit(1)).cast("double") / F.lit(10.0), 6
        ).alias("recall_at_10"),
    )


# ------------------------------------------ weighted systematic sampling

_PPS_STRIDES = 50


@query(
    "weighted_systematic_sample",
    oracle=f"""
    WITH c AS (
        SELECT doc_id, n_chars,
               CAST(SUM(n_chars) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_w
        FROM documents
    ),
    t AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS total FROM documents)
    SELECT doc_id, n_chars, cum_w
    FROM c CROSS JOIN t
    WHERE (cum_w * {_PPS_STRIDES}) // total
          > ((cum_w - n_chars) * {_PPS_STRIDES}) // total
    """,
    tags=("sampling", "pps", "running-sum"),
)
def weighted_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size systematic sample (textbook
    PPS: Madow 1949): lay every document's weight (n_chars) end to
    end in doc_id order and pick the document under each of 50
    equally-spaced stride boundaries — heavier documents
    proportionally likelier, at most once each, ~50 out regardless of
    corpus size. The weighted corpus-mixing sampler: weight by
    quality score or token count and the sample tracks the mixture.

    Exactness: selection is floor(cum*K/total) > floor(prev*K/total)
    in PURE BIGINT (integer div both engines, non-negative operands
    — the engine-portable `div` contract), and the cumulative weight
    comes from the quantile-bucketed two-phase running sum
    (`global_running_sum`: per-bucket window + driver-folded offsets,
    no single-task global sort), whose integer sums are order-free.
    At 100 TB the plan is the same three bounded passes as
    pareto_part_classes; nothing about the stride test depends on
    partition layout."""
    cat = Catalog(spark, sf_dir)
    base = cat.documents.select("doc_id", "n_chars")
    cum = global_running_sum(
        base,
        value_col="n_chars",
        order_col="doc_id",
        name="cum_w",
    )
    total = F.broadcast(
        base.agg(F.sum("n_chars").cast("bigint").alias("total"))
    )
    sel = F.expr(
        f"(cum_w * {_PPS_STRIDES}) DIV total"
        f" > ((cum_w - n_chars) * {_PPS_STRIDES}) DIV total"
    )
    return (
        cum.crossJoin(total)
        .filter(sel)
        .select("doc_id", "n_chars", F.col("cum_w").cast("bigint"))
    )


# ------------------------------------------------------------------ PQ ANN

#: PQ geometry: DIM=64 → M subspaces of SUB dims, K centroids per
#: subspace (codebook = subvectors of vec_id 1..K; query = vec_id 0).
_PQ_M, _PQ_SUB, _PQ_K = 8, 8, 4


def _pq_sql_d2(vec: str, cent: str, j: int) -> str:
    """Left-deep squared-L2 fold over subspace j — identical operand
    order to the Spark expression in ann_pq_adc_topk."""
    terms = [
        f"(CAST({vec}[{i + 1}] AS DOUBLE) - CAST({cent}[{i + 1}] AS DOUBLE))"
        f" * (CAST({vec}[{i + 1}] AS DOUBLE) - CAST({cent}[{i + 1}] AS DOUBLE))"
        for i in range(j * _PQ_SUB, (j + 1) * _PQ_SUB)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} + {t})"
    return out


def _pq_sql_ctes() -> str:
    """The shared cfg → dists → scored CTE body: every embedding's
    ADC approximate distance to the vec_id=0 query (``scored
    (vec_id, adc_raw)``) — composed by both the PQ top-k query and
    the PQ recall query."""
    cents = ", ".join(
        f"(SELECT embedding FROM embeddings WHERE vec_id = {c + 1}) AS c{c + 1}"
        for c in range(_PQ_K)
    )
    luts = ", ".join(
        f"{_pq_sql_d2('q', f'c{c + 1}', j)} AS lut_{j}_{c + 1}"
        for j in range(_PQ_M)
        for c in range(_PQ_K)
    )
    dists = ", ".join(
        f"{_pq_sql_d2('e.embedding', f'cfg.c{c + 1}', j)} AS d_{j}_{c + 1}"
        for j in range(_PQ_M)
        for c in range(_PQ_K)
    )
    # argmin via explicit CASE chain, ties to the lowest centroid id —
    # the same chain the Spark side builds with F.when.
    def case_j(j: int) -> str:
        arms = []
        for c in range(_PQ_K - 1):
            cond = " AND ".join(
                f"d_{j}_{c + 1} <= d_{j}_{k + 1}" for k in range(c + 1, _PQ_K)
            )
            arms.append(f"WHEN {cond} THEN lut_{j}_{c + 1}")
        return "CASE " + " ".join(arms) + f" ELSE lut_{j}_{_PQ_K} END"

    adc = " + ".join(f"({case_j(j)})" for j in range(_PQ_M))
    return f"""cfg AS (
        SELECT *, {luts}
        FROM (SELECT
                (SELECT embedding FROM embeddings WHERE vec_id = 0) AS q,
                {cents})
    ),
    dists AS (
        SELECT e.vec_id, {dists},
               cfg.* EXCLUDE (q, {", ".join(f"c{c + 1}" for c in range(_PQ_K))})
        FROM embeddings e CROSS JOIN cfg
    ),
    scored AS (SELECT vec_id, {adc} AS adc_raw FROM dists)"""


def _pq_sql() -> str:
    return f"""
    WITH {_pq_sql_ctes()}
    SELECT vec_id, ROUND(adc_raw, 6) AS adc
    FROM scored
    ORDER BY adc_raw, vec_id
    LIMIT 10
    """


@query("ann_pq_adc_topk", oracle=_pq_sql(), tags=("similarity", "ann", "pq"))
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (Jegou, Douze, Schmid 2011): DIM=64 splits into M=8 subspaces of
    8 dims; each subvector quantizes to its nearest of K=4 codebook
    entries (deterministic codebook: the subvectors of vec_id 1..4,
    mirroring ann_ivf_topk's static seeding), and the query's
    distance to a database vector is approximated by the sum over
    subspaces of the PRECOMPUTED query→centroid distance for that
    vector's code — the ADC lookup table.

    This is the memory-bound scale path the IVF/LSH siblings don't
    cover: at 100 TB the codes are M bytes per vector (64 B floats →
    8 B codes, 32× compression), the LUT is an M×K table of doubles
    computed ONCE from the query, and the scan never touches the
    original vectors. The plan makes that literal: codebook and LUT
    are collected to the driver (K+1 = 5 bounded rows, the
    allow-listed centroid-state pattern) and enter the plan as
    LITERAL arithmetic — encoding is a per-row CASE chain over
    left-deep squared-L2 folds, the ADC sum is a CASE lookup of
    constants, the whole query is one scan in whole-stage codegen
    ending in TakeOrderedAndProject (per-partition top-10 heap, no
    shuffle of the data). Ties break to the lowest centroid id in
    BOTH engines via the identical explicit CASE chain; the final
    order is by raw (unrounded) ADC then vec_id, so the top-10 cut
    is engine-exact. Python computes the LUT constants with the same
    left-deep t*t fold the SQL uses — IEEE doubles, identical
    operand order, identical bits."""
    return (
        _pq_adc_scored(spark, sf_dir)
        .orderBy(F.col("__adc").asc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", F.round("__adc", 6).alias("adc"))
    )


def _pq_adc_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, __adc) for every embedding — the Spark mirror of the
    oracle's ``scored`` CTE; see ann_pq_adc_topk for the determinism
    and scale argument."""
    cat = Catalog(spark, sf_dir)
    e = cat.embeddings
    rows = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in e.filter(F.col("vec_id") <= _PQ_K)
        .select("vec_id", "embedding")
        .collect()
    }
    q = rows[0]
    cents = [rows[c + 1] for c in range(_PQ_K)]

    def d2_row_sql(cent: list[float], j: int) -> str:
        """(embedding[i] - cent_i)^2 summed left-deep over subspace j,
        as Spark SQL text (0-based indexing; centroid values as
        shortest-round-trip double literals — the parse recovers the
        exact collected bits). Same nesting as the oracle's
        _pq_sql_d2, so operand order is engine-identical."""
        terms = [
            f"(CAST(embedding[{i}] AS DOUBLE) - {cent[i]!r}D)"
            f" * (CAST(embedding[{i}] AS DOUBLE) - {cent[i]!r}D)"
            for i in range(j * _PQ_SUB, (j + 1) * _PQ_SUB)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = f"({out} + {t})"
        return out

    def d2_const(a: list[float], b: list[float], j: int) -> float:
        out = 0.0
        for i in range(j * _PQ_SUB, (j + 1) * _PQ_SUB):
            t = a[i] - b[i]
            if i == j * _PQ_SUB:
                out = t * t
            else:
                out = out + t * t
        return out

    # project every subspace distance ONCE (32 columns); the CASE
    # chains then reference plain columns — each __d_{j}_{c} appears
    # up to 3 times in the argmin conditions, and CollapseProject
    # keeps multiply-referenced non-cheap expressions materialized
    # instead of re-inlining the fold per reference (same discipline
    # as the gopher tokenize-once note). Both stages are built as SQL
    # text through selectExpr: the ~1500-node tree costs 2 parser
    # calls instead of ~1000 per-Column py4j round-trips (measured
    # ~1.8 s of driver-side build time at any sf — pure overhead).
    dist = e.selectExpr(
        "vec_id",
        *[
            f"{d2_row_sql(cents[c], j)} AS __d_{j}_{c}"
            for j in range(_PQ_M)
            for c in range(_PQ_K)
        ],
    )

    def case_j(j: int) -> str:
        lut = [d2_const(q, cents[c], j) for c in range(_PQ_K)]
        arms = []
        for c in range(_PQ_K - 1):
            cond = " AND ".join(
                f"__d_{j}_{c} <= __d_{j}_{k}" for k in range(c + 1, _PQ_K)
            )
            arms.append(f"WHEN {cond} THEN {lut[c]!r}D")
        return (
            "CASE " + " ".join(arms) + f" ELSE {lut[_PQ_K - 1]!r}D END"
        )

    adc = " + ".join(f"({case_j(j)})" for j in range(_PQ_M))
    return dist.selectExpr("vec_id", f"{adc} AS __adc")


@query(
    "ann_pq_recall",
    oracle=f"""
    WITH {_pq_sql_ctes()},
    pq AS (
        SELECT vec_id FROM scored ORDER BY adc_raw, vec_id LIMIT 10
    ),
    qv AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
    exact AS (
        SELECT e.vec_id
        FROM embeddings e CROSS JOIN qv
        ORDER BY {_sql_cosine('e.embedding', 'qv.qvec')} DESC, e.vec_id
        LIMIT 10
    )
    SELECT 10 AS k,
           CAST(COUNT(*) AS BIGINT) AS n_overlap,
           COUNT(*) / 10.0 AS recall
    FROM exact JOIN pq USING (vec_id)
    """,
    tags=("similarity", "ann", "pq", "recall"),
)
def ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the PQ/ADC index against the exact cosine top-10
    — the honesty metric every approximate index ships with (the
    ann_int8_recall pattern, applied to the 32x-compressed code
    path). Both top-10 cuts are engine-exact (raw-double order with
    vec_id ties, see ann_pq_adc_topk / ann_cosine_topk), so the
    overlap count is value-exact, not a tolerance match.

    Measured recall is LOW here (0.2 at sf0.01, 0.1 at sf0.1) and
    that is the point: a K=4 static codebook (first-4-ids, untrained)
    is a deliberately weak quantizer, and this query is what makes
    that measurable instead of assumed. tools/pq_probe.py measures
    the fixes on two corpus geometries (SCALING §PQ-codebook): K
    dominates (K=16 roughly doubles clustered recall), while
    per-subspace k-means training is CORPUS-DEPENDENT — +0.14 on the
    smooth manifold, -0.03 on replica clusters (spherical trainer vs
    L2 encode objective mismatch). Either fix changes only the
    codebook/LUT literals, never the plan shape.

    Plan shape: two independent single-scan TakeOrderedAndProject
    arms (ADC literal arithmetic; broadcast 1-row query vector) and
    a 10x10 broadcast join — at 100 TB each arm is one pass over the
    codes/vectors with a per-partition heap, and the comparison
    itself is driver-trivial."""
    cat = Catalog(spark, sf_dir)
    e = cat.embeddings
    pq = (
        _pq_adc_scored(spark, sf_dir)
        .orderBy(F.col("__adc").asc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id")
    )
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    exact = (
        e.crossJoin(F.broadcast(q))
        .select("vec_id", cosine_pair("embedding", "qv", DIM).alias("__cos"))
        .orderBy(F.col("__cos").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id")
    )
    return exact.join(pq, on="vec_id").agg(
        F.lit(10).alias("k"),
        F.count(F.lit(1)).alias("n_overlap"),
        (F.count(F.lit(1)) / F.lit(10.0)).alias("recall"),
    )


# ------------------------------------------- trained-codebook PQ index

#: re-rank depth of the trained PQ index: exact cosine re-scores the
#: ADC top-R shortlist (the FAISS IndexPQ+refine recipe)
_TPQ_RERANK = 50


def _tpq_geom():
    from ..functions.pq_codebook import CODEBOOK, PQ_M, PQ_SUB

    return CODEBOOK, PQ_M, PQ_SUB


def _tpq_cb_duck(j: int) -> str:
    """Subspace j's codebook as a DuckDB DOUBLE[][] literal — the
    ``::DOUBLE`` cast forces DOUBLE (a bare decimal literal is
    DECIMAL in DuckDB, whose arithmetic would diverge from Spark's
    doubles). Cast form rather than an ``e0`` suffix because repr of
    a double can already carry an exponent (``1e-05`` → ``1e-05e0``
    is a syntax error) — the same pitfall _mel_sql documents; the
    trained codebook's 4-dp rounding happens to avoid it today, but
    the rendering must not depend on that coupling (r12 advisor)."""
    cb, _, _ = _tpq_geom()
    return "[" + ", ".join(
        "[" + ", ".join(f"({v!r})::DOUBLE" for v in c) + "]" for c in cb[j]
    ) + "]"


def _tpq_fold(vec_elem, c_elem, j: int) -> str:
    """Left-deep squared-L2 fold of subspace j against the lambda
    variable ``c``. ``vec_elem(i)`` / ``c_elem(k)`` render the
    1-based vector / centroid element — engine-specific (Spark
    bracket indexing is 0-based where DuckDB's is 1-based, so both
    engines use their 1-based accessor: element_at vs []); the FOLD
    SHAPE is engine-identical, so the doubles are too."""
    _, _, sub = _tpq_geom()
    terms = []
    for k in range(1, sub + 1):
        i = j * sub + k  # 1-based full-vector index
        t = f"({vec_elem(i)} - {c_elem(k)})"
        terms.append(f"{t} * {t}")
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} + {t})"
    return out


def _tpq_sql_scored(src: str = "embeddings") -> str:
    """Oracle CTE chain ending in ``scored (vec_id, embedding,
    adc_raw)`` under the COMMITTED trained codebook (literals appear
    once, in the cb CTE). Callers must also provide ``qv``."""
    _, m, _ = _tpq_geom()

    def duck_fold(vec: str, j: int) -> str:
        return _tpq_fold(
            lambda i: f"CAST({vec}[{i}] AS DOUBLE)",
            lambda k: f"c[{k}]",
            j,
        )

    cbs = ", ".join(f"{_tpq_cb_duck(j)} AS cb_{j}" for j in range(m))
    luts = ", ".join(
        f"list_transform(cb.cb_{j}, c -> {duck_fold('qv.q', j)}) AS lut_{j}"
        for j in range(m)
    )
    das = ", ".join(
        f"list_transform(cb.cb_{j}, c -> {duck_fold('e.embedding', j)})"
        f" AS da_{j}"
        for j in range(m)
    )
    codes = ", ".join(
        f"list_indexof(da_{j}, list_min(da_{j})) AS code_{j}"
        for j in range(m)
    )
    adc = f"luts.lut_0[code_0]"
    for j in range(1, m):
        adc = f"({adc} + luts.lut_{j}[code_{j}])"
    return f"""cb AS (SELECT {cbs}),
    luts AS (SELECT {luts} FROM cb CROSS JOIN qv),
    dists AS (
        SELECT e.vec_id, e.embedding, {das}
        FROM {src} e CROSS JOIN cb
    ),
    codes AS (SELECT vec_id, embedding, {codes} FROM dists),
    scored AS (
        SELECT vec_id, embedding, {adc} AS adc_raw
        FROM codes CROSS JOIN luts
    )"""


def _tpq_sql_index_ids(src: str = "embeddings") -> str:
    """...continuing the chain: the index's re-ranked top-10 as
    ``idx10 (vec_id, cos_raw)``."""
    return f"""{_tpq_sql_scored(src)},
    short AS (
        SELECT vec_id, embedding FROM scored
        ORDER BY adc_raw, vec_id LIMIT {_TPQ_RERANK}
    ),
    idx10 AS (
        SELECT s.vec_id,
               {_sql_cosine('s.embedding', 'qv.q')} AS cos_raw
        FROM short s CROSS JOIN qv
        ORDER BY cos_raw DESC, s.vec_id
        LIMIT 10
    )"""


_TPQ_TOPK_SQL = f"""
    WITH qv AS (
        SELECT embedding AS q FROM embeddings WHERE vec_id = 0
    ),
    {_tpq_sql_index_ids()}
    SELECT vec_id, ROUND(cos_raw, 6) AS cosine
    FROM idx10
    ORDER BY cos_raw DESC, vec_id
"""


def _tpq_scored(
    spark: SparkSession,
    sf_dir: str,
    frame: DataFrame | None = None,
    q: list[float] | None = None,
) -> DataFrame:
    """(vec_id, embedding, __adc) under the committed trained
    codebook — the Spark mirror of the oracle's ``scored`` CTE, run
    as ONE Arrow mapInPandas kernel (the PQ ENCODE kernel: at 100 TB
    this is the GEMM-class op that turns ingest vectors into 16-byte
    codes, the same justification as the semantic-dedup/GEMM
    kernels; a 4096-literal HOF-lambda formulation was measured ~6 s
    per 2000 rows — interpreted expression walking, not a scale
    path, vs <0.2 s vectorized).

    Bit-exactness vs the DuckDB lambda oracle: X casts float32 →
    float64 (exact); per subspace the squared-L2 accumulates with
    the SAME left-deep order as the SQL fold, elementwise over the
    batch (IEEE doubles, identical operand order → identical bits);
    np.argmin returns the FIRST minimum = list_indexof(list_min)'s
    lowest-index tie-break; the LUT is computed once in Python
    floats with the same left-deep fold the oracle's list_transform
    uses; and the ADC total accumulates j = 0..M-1 left-deep,
    matching the oracle's parenthesized sum."""
    cb, m, sub = _tpq_geom()
    cat = Catalog(spark, sf_dir)
    e = cat.embeddings
    if q is None:
        # callers that already hold the query vector pass it in (r14:
        # saves one driver-blocking collect job per invocation)
        q = [
            float(x)
            for x in e.filter(F.col("vec_id") == 0)
            .select("embedding")
            .collect()[0][0]
        ]
    else:
        q = [float(x) for x in q]
    import numpy as np

    C = np.array(cb, dtype=np.float64)  # (M, K, SUB), exact literals

    def lut_j(j: int) -> list[float]:
        out = []
        for cvec in cb[j]:
            acc = None
            for k in range(sub):
                t = q[j * sub + k] - cvec[k]
                acc = t * t if acc is None else acc + t * t
            out.append(acc)
        return out

    luts = np.array([lut_j(j) for j in range(m)], dtype=np.float64)

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            adc = None
            for j in range(m):
                Xs = X[:, j * sub : (j + 1) * sub]
                acc = None
                for k in range(sub):
                    t = Xs[:, k, None] - C[j, None, :, k]
                    tt = t * t
                    acc = tt if acc is None else acc + tt
                contrib = luts[j][acc.argmin(axis=1)]
                adc = contrib if adc is None else adc + contrib
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "embedding": pdf["embedding"],
                    "__adc": adc,
                }
            )

    src = e if frame is None else frame
    return src.select("vec_id", "embedding").mapInPandas(
        kernel, schema="vec_id long, embedding array<float>, __adc double"
    )


def _tpq_index_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, __cos): the trained-PQ index's re-ranked top-10."""
    cat = Catalog(spark, sf_dir)
    e = cat.embeddings
    qdf = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv")
        )
    )
    short = (
        _tpq_scored(spark, sf_dir)
        .orderBy(F.col("__adc").asc(), F.col("vec_id").asc())
        .limit(_TPQ_RERANK)
    )
    return (
        short.crossJoin(qdf)
        .select("vec_id", cosine_pair("embedding", "qv", DIM).alias("__cos"))
        .orderBy(F.col("__cos").desc(), F.col("vec_id").asc())
        .limit(10)
    )


@query(
    "ann_pq_trained_topk",
    oracle=_TPQ_TOPK_SQL,
    tags=("similarity", "ann", "pq"),
)
def ann_pq_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION-fidelity PQ index (r11 verdict ask #1):
    M=16x K=256 per-subspace codebooks TRAINED with L2 Lloyd on the
    fixture (tools/train_pq.py; committed as literals in
    functions/pq_codebook.py, the bpe_merges.py pattern) + exact
    cosine re-rank of the ADC top-{rerank} shortlist — the FAISS
    IndexPQ+refine recipe. ann_pq_adc_topk's K=4 static codebook
    measured recall@10 0.1-0.2 (a measurement harness, not an index);
    this one measures 1.0 at q=0 on every sf (ann_pq_trained_recall
    pins it in-registry; SCALING §PQ-trained has the 20-query
    protocol numbers: 0.97 mean with re-rank, 0.67 plain ADC).

    Scale shape: ONE scan through the vectorized Arrow encode kernel
    (_tpq_scored — at 100 TB the codes are 16 bytes per vector,
    precomputed at ingest by this exact kernel; here encode+ADC fuse
    into the search scan) into a TakeOrdered shortlist of 50 rows
    carrying their vectors, then the exact re-rank is trivial (50
    rows x one broadcast query vector). Zero exchanges, zero
    data-sized joins. Every double on both engines comes from the
    same committed decimal literals and the same left-deep folds, so
    the shortlist cut and the final top-10 are engine-exact."""
    return _tpq_index_ids(spark, sf_dir).select(
        "vec_id", F.round("__cos", 6).alias("cosine")
    )


@query(
    "ann_pq_trained_recall",
    oracle=f"""
    WITH qv AS (
        SELECT embedding AS q FROM embeddings WHERE vec_id = 0
    ),
    {_tpq_sql_index_ids()},
    exact AS (
        SELECT e.vec_id
        FROM embeddings e CROSS JOIN qv
        ORDER BY {_sql_cosine('e.embedding', 'qv.q')} DESC, e.vec_id
        LIMIT 10
    )
    SELECT 10 AS k,
           CAST(COUNT(*) AS BIGINT) AS n_overlap,
           COUNT(*) / 10.0 AS recall
    FROM exact JOIN idx10 USING (vec_id)
    """,
    tags=("similarity", "ann", "pq", "recall"),
)
def ann_pq_trained_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the trained-codebook PQ index (ADC shortlist +
    exact re-rank) against the exact cosine top-10 — the honesty row
    the r11 verdict asked to push past 0.8: measures 1.0 at q=0 on
    sf0.001/sf0.01/sf0.1 (vs the K=4 static codebook's 0.2/0.1,
    which ann_pq_recall keeps as the contrast). Value-exact overlap:
    both arms' top-10 cuts are engine-exact raw-double orders with
    vec_id ties."""
    cat = Catalog(spark, sf_dir)
    e = cat.embeddings
    idx = _tpq_index_ids(spark, sf_dir).select("vec_id")
    qdf = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv")
        )
    )
    exact = (
        e.crossJoin(qdf)
        .select("vec_id", cosine_pair("embedding", "qv", DIM).alias("__cos"))
        .orderBy(F.col("__cos").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id")
    )
    return exact.join(idx, on="vec_id").agg(
        F.lit(10).alias("k"),
        F.count(F.lit(1)).alias("n_overlap"),
        (F.count(F.lit(1)) / F.lit(10.0)).alias("recall"),
    )


# ---------------------------------------------------- IVFADC (Jegou)

#: cells the IVFADC query probes — kept at 2 (vs ann_ivf_multiprobe's
#: 4) so the composition's cost profile is the interesting one: ~25%
#: of the corpus scanned AS CODES, not as vectors
_IVFADC_NPROBE = 2


def _ivfadc_cell_ctes() -> str:
    """cents/assign/a1/qc/cellv: the probed-cell vector subset."""
    return f"""cents AS (
        SELECT vec_id AS cent_id, embedding AS cvec
        FROM embeddings WHERE vec_id BETWEEN 1 AND 8
    ),
    assign AS (
        SELECT e.vec_id, c.cent_id,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_sql_cosine('e.embedding', 'c.cvec')} DESC, c.cent_id
               ) AS rn
        FROM embeddings e CROSS JOIN cents c
    ),
    a1 AS (SELECT vec_id, cent_id FROM assign WHERE rn = 1),
    qc AS (
        SELECT cent_id FROM assign
        WHERE vec_id = 0 AND rn <= {_IVFADC_NPROBE}
    ),
    cellv AS (
        SELECT e.vec_id, e.embedding
        FROM embeddings e
        JOIN a1 ON a1.vec_id = e.vec_id
        JOIN qc ON a1.cent_id = qc.cent_id
    )"""


def _ivfadc_index_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, __cos): IVFADC's re-ranked top-10 — probed-cell
    subset → PQ/ADC codes → top-50 shortlist → exact re-rank."""
    from ..operators.similarity import cosine_to_centroids_kernel

    cat = Catalog(spark, sf_dir)
    e = cat.embeddings
    # bounded collect (8 centroid rows — the kmeans-state class); the
    # r14 kernel replaces the crossJoin(broadcast cents) + HOF-fold
    # cosine_pair assign (3 interpreted folds × 8 cells × corpus, the
    # stage that dominated this pair) with one Arrow batch kernel,
    # bit-equal by the left-deep-per-dimension numpy discipline
    # (pinned against cosine_pair in tests/test_operators.py)
    cent_rows = sorted(
        e.filter(F.col("vec_id").between(1, 8))
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r["vec_id"],
    )
    cents = [(int(r["vec_id"]), list(r["embedding"])) for r in cent_rows]
    w = Window.partitionBy("vec_id").orderBy(
        F.col("__cos").desc(), F.col("cent_id").asc()
    )
    assign = cosine_to_centroids_kernel(
        e, cents, vec_col="embedding", keep=["vec_id"]
    ).withColumn("rn", F.row_number().over(w))
    assign = cache.track(assign)
    a1 = assign.filter(F.col("rn") == 1).select("vec_id", "cent_id")
    qc = F.broadcast(
        assign.filter(
            (F.col("vec_id") == 0) & (F.col("rn") <= _IVFADC_NPROBE)
        ).select(F.col("cent_id").alias("qcent"))
    )
    cell = a1.join(qc, a1.cent_id == qc.qcent).select("vec_id")
    e_cell = e.join(cell, on="vec_id")
    short = (
        _tpq_scored(spark, sf_dir, frame=e_cell)
        .orderBy(F.col("__adc").asc(), F.col("vec_id").asc())
        .limit(_TPQ_RERANK)
    )
    qdf = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv")
        )
    )
    return (
        short.crossJoin(qdf)
        .select("vec_id", cosine_pair("embedding", "qv", DIM).alias("__cos"))
        .orderBy(F.col("__cos").desc(), F.col("vec_id").asc())
        .limit(10)
    )


@query(
    "ann_ivfadc_topk",
    oracle=f"""
    WITH qv AS (
        SELECT embedding AS q FROM embeddings WHERE vec_id = 0
    ),
    {_ivfadc_cell_ctes()},
    {_tpq_sql_index_ids(src="cellv")}
    SELECT vec_id, ROUND(cos_raw, 6) AS cosine
    FROM idx10
    ORDER BY cos_raw DESC, vec_id
    """,
    tags=("similarity", "ann", "ivf", "pq"),
)
def ann_ivfadc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC — the FULL production ANN architecture of Jegou, Douze,
    Schmid 2011 (and FAISS's IndexIVFPQ), composing this round's two
    levers: an IVF coarse quantizer restricts the search to the
    query's 2 nearest cells, PQ/ADC under the TRAINED committed
    codebook scores only that subset as 16-byte codes, and the exact
    re-rank of the ADC top-50 recovers everything the probed cells
    contain (ann_ivfadc_recall measures what they don't). At 100 TB
    the cost profile is the point: nprobe/|cells| of the corpus is
    touched, AS CODES (16 B/vector, 16x compression), with one
    50-row exact pass — cells are partition keys, so the probe is 2
    pruned partition reads feeding the encode kernel's scan.

    Every stage is the already-pinned arithmetic: the cell assignment
    is ann_ivf_topk's tie-broken cosine rank, the codes/LUT/shortcut
    are ann_pq_trained_topk's left-deep folds, and the final cut is
    the raw-double cosine order with vec_id ties — so the composition
    is value-exact end-to-end under one DuckDB CTE chain."""
    return _ivfadc_index_ids(spark, sf_dir).select(
        "vec_id", F.round("__cos", 6).alias("cosine")
    )


@query(
    "ann_ivfadc_recall",
    oracle=f"""
    WITH qv AS (
        SELECT embedding AS q FROM embeddings WHERE vec_id = 0
    ),
    {_ivfadc_cell_ctes()},
    {_tpq_sql_index_ids(src="cellv")},
    exact AS (
        SELECT e.vec_id
        FROM embeddings e CROSS JOIN qv
        ORDER BY {_sql_cosine('e.embedding', 'qv.q')} DESC, e.vec_id
        LIMIT 10
    )
    SELECT 10 AS k,
           CAST(COUNT(*) AS BIGINT) AS n_overlap,
           COUNT(*) / 10.0 AS recall
    FROM exact JOIN idx10 USING (vec_id)
    """,
    tags=("similarity", "ann", "ivf", "pq", "recall"),
)
def ann_ivfadc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the composed IVFADC index vs the exact cosine
    top-10 over the FULL corpus — the honesty row for the composed
    architecture: unlike ann_pq_trained_recall (full-corpus ADC,
    1.0), this one also pays the coarse quantizer's cell-miss rate
    (true neighbors whose cell the query did not probe are
    unreachable regardless of re-rank).

    Measured at q=0: 0.6 / 0.6 / 0.3 at sf0.001/0.01/0.1 (nprobe=2;
    nprobe=4 = 50% of the corpus only reaches 0.8/0.8/0.5) — and
    that is the honest geometry lesson, not a defect: the fixture's
    near-uniform unit vectors give the 8 static centroids broad
    random cones that barely correlate with cosine neighborhoods, so
    the COARSE quantizer, not PQ, is the bottleneck (the ADC+re-rank
    stage alone measures 1.0). On clustered corpora the same
    cell structure measures 0.985 at nprobe=2 with exact within-cell
    scoring (SCALING §ANN), which ADC + re-rank@50 approximates — IVF
    cell quality is corpus-geometry-dependent, which is exactly what
    this in-registry row exists to measure per deployment. The
    full-corpus-codes alternative (ann_pq_trained_topk) stays the
    right index for unclustered data."""
    cat = Catalog(spark, sf_dir)
    e = cat.embeddings
    idx = _ivfadc_index_ids(spark, sf_dir).select("vec_id")
    qdf = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv")
        )
    )
    exact = (
        e.crossJoin(qdf)
        .select("vec_id", cosine_pair("embedding", "qv", DIM).alias("__cos"))
        .orderBy(F.col("__cos").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id")
    )
    return exact.join(idx, on="vec_id").agg(
        F.lit(10).alias("k"),
        F.count(F.lit(1)).alias("n_overlap"),
        (F.count(F.lit(1)) / F.lit(10.0)).alias("recall"),
    )


# ------------------------------------- IVFADC with a TRAINED coarse quantizer

#: cells the trained composition probes. 4 of 8 k-means cells: the
#: r12 measurement showed the STATIC coarse quantizer was the
#: composed index's whole loss channel (0.3-0.6 at q=0); with
#: 3-round Lloyd cells the same nprobe=4 budget measures recall@10 =
#: 1.0 at q=0 on all three fixtures (mean-of-20 0.86/0.86/0.755 at
#: sf0.001/0.01/0.1 — tools/ivfadc_probe.py protocol).
_IVFADC_T_NPROBE = 4


def _ivfadc_trained_cell_ctes() -> str:
    """kv/seed/c0/c1..c3/afm/a1/qc/cellv: the 3-round-Lloyd cell
    model (identical CTE text to ann_ivf_kmeans_topk's oracle, with
    the quantized CTE renamed ``kv`` — the PQ chain owns ``qv``) plus
    the multiprobe rank and the probed-cell vector subset."""
    return f"""kv AS MATERIALIZED (
        SELECT vec_id, embedding,
               list_transform(
                   embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1024.0 + 0.5)
                             AS BIGINT)
               ) AS q
        FROM embeddings
    ),
    seed AS (SELECT vec_id, q FROM kv ORDER BY vec_id LIMIT 8),
    c0 AS MATERIALIZED (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) AS cell,
               q AS s
        FROM seed
    ),
    {",".join(_kmeans_sql_round(i, src="kv") for i in (1, 2, 3))},
    {_kmeans_sql_assign_ranked("afm", "c3", src="kv")},
    af1 AS (SELECT vec_id, cell FROM afm WHERE rn = 1),
    qc AS (
        SELECT cell FROM afm
        WHERE vec_id = 0 AND rn <= {_IVFADC_T_NPROBE}
    ),
    cellv AS (
        SELECT e.vec_id, e.embedding
        FROM embeddings e
        JOIN af1 ON af1.vec_id = e.vec_id
        JOIN qc ON af1.cell = qc.cell
    )"""


def _ivfadc_trained_index_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, __cos): trained-IVFADC's re-ranked top-10 — k-means
    cell model → query's nprobe nearest cells → PQ/ADC codes over the
    probed subset → top-50 shortlist → exact re-rank."""
    import math

    from ..operators.similarity import kmeans_cells_exact

    cat = Catalog(spark, sf_dir)
    e = cat.embeddings
    assigned, state = kmeans_cells_exact(
        e,
        id_col="vec_id",
        vec_col="embedding",
        dim=DIM,
        k=8,
        iters=3,
        return_state=True,
    )
    # the query's probed cells, ranked by the SAME spherical score as
    # the assignment (dot(q, S_c)/|S_c|, left-deep, ties to lowest
    # cell). Driver-side over k=8 state rows (bounded by construction,
    # like _tpq_scored's 1-row query gather); every operand is an
    # exact integer in double, so this replicates the oracle's afm
    # rank bit-for-bit.
    qvec = (
        e.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    )
    qq = [math.floor(float(x) * 1024.0 + 0.5) for x in qvec]

    def spherical(svec: list[int]) -> float:
        num = None
        for qi, si in zip(qq, svec):
            t = float(qi) * float(si)
            num = t if num is None else num + t
        den = None
        for si in svec:
            fs = float(si)
            p = fs * fs
            den = p if den is None else den + p
        return num / math.sqrt(den)

    scores = [spherical(s) for s in state]
    probe = [
        c + 1
        for c in sorted(
            range(len(state)), key=lambda c: (-scores[c], c)
        )[:_IVFADC_T_NPROBE]
    ]
    e_cell = assigned.filter(F.col("__cell").isin(probe)).select(
        "vec_id", "embedding"
    )
    short = (
        _tpq_scored(spark, sf_dir, frame=e_cell, q=qvec)
        .orderBy(F.col("__adc").asc(), F.col("vec_id").asc())
        .limit(_TPQ_RERANK)
    )
    qdf = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv")
        )
    )
    return (
        short.crossJoin(qdf)
        .select("vec_id", cosine_pair("embedding", "qv", DIM).alias("__cos"))
        .orderBy(F.col("__cos").desc(), F.col("vec_id").asc())
        .limit(10)
    )


@query(
    "ann_ivfadc_trained_topk",
    oracle=f"""
    WITH qv AS (
        SELECT embedding AS q FROM embeddings WHERE vec_id = 0
    ),
    {_ivfadc_trained_cell_ctes()},
    {_tpq_sql_index_ids(src="cellv")}
    SELECT vec_id, ROUND(cos_raw, 6) AS cosine
    FROM idx10
    ORDER BY cos_raw DESC, vec_id
    """,
    tags=("similarity", "ann", "ivf", "pq", "kmeans"),
)
def ann_ivfadc_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC with a TRAINED coarse quantizer (r12 verdict ask #3):
    the full Jegou/Douze/Schmid IndexIVFPQ with BOTH stages trained —
    3-round deterministic Lloyd cells (ann_ivf_kmeans_topk's exact
    machinery) replace the static first-8-ids centroids that r12
    measured as the composed index's entire loss channel, and the
    committed M=16xK=256 PQ codebook + exact re-rank@50 handle the
    within-cell scoring. nprobe=4 of 8 cells.

    At 100 TB the cost shape is unchanged from ann_ivfadc_topk —
    nprobe/|cells| of the corpus touched AS 16-byte codes, cells as
    prunable partition keys — but the cells now FOLLOW the corpus
    geometry: training is one bounded-driver Lloyd loop (k x (dim+1)
    integers collected per round), amortized over every query like
    the committed PQ codebook. Every stage is already-pinned
    arithmetic (quantized integer centroid sums; left-deep spherical
    scores; ADC folds; raw-double cosine re-rank), so the whole
    composition is value-exact under one DuckDB CTE chain."""
    return _ivfadc_trained_index_ids(spark, sf_dir).select(
        "vec_id", F.round("__cos", 6).alias("cosine")
    )


@query(
    "ann_ivfadc_trained_recall",
    oracle=f"""
    WITH qv AS (
        SELECT embedding AS q FROM embeddings WHERE vec_id = 0
    ),
    {_ivfadc_trained_cell_ctes()},
    {_tpq_sql_index_ids(src="cellv")},
    exact AS (
        SELECT e.vec_id
        FROM embeddings e CROSS JOIN qv
        ORDER BY {_sql_cosine('e.embedding', 'qv.q')} DESC, e.vec_id
        LIMIT 10
    )
    SELECT 10 AS k,
           CAST(COUNT(*) AS BIGINT) AS n_overlap,
           COUNT(*) / 10.0 AS recall
    FROM exact JOIN idx10 USING (vec_id)
    """,
    tags=("similarity", "ann", "ivf", "pq", "kmeans", "recall"),
)
def ann_ivfadc_trained_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the TRAINED composed index vs the exact cosine
    top-10 over the full corpus — the row that closes r12's honest
    finding. The static-coarse sibling (ann_ivfadc_recall) measures
    0.3-0.6 at q=0 because its random centroid cones barely correlate
    with cosine neighborhoods; with the SAME nprobe=4 budget, 3-round
    Lloyd cells recover recall@10 = 1.0 at q=0 on every fixture
    (probe protocol over 20 queries: mean 0.86 / 0.86 / 0.755 at
    sf0.001/0.01/0.1 — the residual is the re-rank@50 ceiling and
    per-query cell-edge geometry, itemized in SCALING §IVFADC). The
    lesson stands either way: coarse-cell quality is a TRAINED
    artifact, and this row is the per-deployment measurement that
    says whether a corpus's geometry supports IVF pruning."""
    cat = Catalog(spark, sf_dir)
    e = cat.embeddings
    idx = _ivfadc_trained_index_ids(spark, sf_dir).select("vec_id")
    qdf = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv")
        )
    )
    exact = (
        e.crossJoin(qdf)
        .select("vec_id", cosine_pair("embedding", "qv", DIM).alias("__cos"))
        .orderBy(F.col("__cos").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id")
    )
    return exact.join(idx, on="vec_id").agg(
        F.lit(10).alias("k"),
        F.count(F.lit(1)).alias("n_overlap"),
        (F.count(F.lit(1)) / F.lit(10.0)).alias("recall"),
    )


@query(
    "pq_index_build_cells",
    oracle=f"""
    WITH qv AS (
        SELECT embedding AS q FROM embeddings WHERE vec_id = 0
    ),
    {_ivfadc_trained_cell_ctes()},
    {_tpq_sql_scored("embeddings")}
    SELECT a.cell,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM({" + ".join(f"(c.code_{j} - 1)" for j in range(16))})
                AS BIGINT) AS code_sum,
           CAST(SUM({" + ".join(f"{j + 1} * (c.code_{j} - 1)"
                                for j in range(16))})
                AS BIGINT) AS code_wsum,
           CAST(SUM(a.vec_id) AS BIGINT) AS id_sum
    FROM af1 a JOIN codes c ON a.vec_id = c.vec_id
    GROUP BY a.cell
    ORDER BY a.cell
    """,
    tags=("similarity", "ann", "ivf", "pq", "index"),
)
def pq_index_build_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVFADC index BUILD stage as a differential-gated query:
    train the 3-round Lloyd cell model, run the production encode
    kernel (operators/ann_index.py::pq_encode_codes — the exact code
    path PqIvfIndexState.ingest persists and pq_index_sink streams)
    over every vector, and aggregate per cell: vector count, the sum
    of all 16 PQ codes, the position-weighted code sum, and the id
    sum. Any single flipped cell assignment or code anywhere in the
    corpus moves at least one of these integers, so the driver hash
    pins the ENTIRE index artifact, not a query over it — the same
    role the LSH state's candidate oracle plays for dedup state.

    Scale shape: the build is one map-only Arrow kernel scan (cells
    and codebook are frozen literals) into one hash aggregate keyed
    by cell — k rows out; at 100 TB this is the whole index-build
    dataflow, and it is embarrassingly parallel. The oracle replays
    the kernel as the unrolled kmeans CTEs + the PQ code CTEs (duck's
    1-based list_indexof shifted to the kernel's 0-based codes)."""
    from ..operators.ann_index import pq_encode_codes
    from ..operators.similarity import kmeans_cells_exact

    cat = Catalog(spark, sf_dir)
    e = cat.embeddings
    _, state = kmeans_cells_exact(
        e,
        id_col="vec_id",
        vec_col="embedding",
        dim=DIM,
        k=8,
        iters=3,
        return_state=True,
    )
    enc = pq_encode_codes(e, state)
    code_sum = F.expr("aggregate(codes, 0L, (a, x) -> a + x)")
    code_wsum = F.expr(
        "aggregate(zip_with(codes, sequence(1, 16), (c, i) -> c * i),"
        " 0L, (a, x) -> a + x)"
    )
    return (
        enc.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(code_sum).alias("code_sum"),
            F.sum(code_wsum).alias("code_wsum"),
            F.sum("id").alias("id_sum"),
        )
        .orderBy("cell")
    )


@query(
    "pq_index_query_topk",
    oracle=f"""
    WITH qv AS (
        SELECT embedding AS q FROM embeddings WHERE vec_id = 0
    ),
    {_ivfadc_trained_cell_ctes()},
    {_tpq_sql_index_ids(src="cellv")}
    SELECT vec_id, ROUND(cos_raw, 6) AS cosine
    FROM idx10
    ORDER BY cos_raw DESC, vec_id
    """,
    tags=("similarity", "ann", "ivf", "pq", "index", "serving"),
)
def pq_index_query_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED index's SERVING path as a differential-gated
    query (r13 verdict ask #2): train the cell model, ingest the
    corpus into a PqIvfIndexState in TWO batches (the incremental
    path production takes — union-of-batches invariance is what
    makes this equal a one-shot build), then answer the query from
    the index alone: rank cells driver-side, read ONLY the probed
    ``cell=`` leaves (operators/ann_index.py::adc_shortlist — an
    explicit leaf-path scan, no partition discovery, no Exchange on
    the probe side), ADC-score the persisted 16-byte codes, and
    exact-re-rank the shortlist against the vector table. The oracle
    is ann_ivfadc_trained_topk's CTE chain verbatim: the index IS a
    cache of that computation, and every stage (encode kernel, LUT
    fold, shortlist order, cosine re-rank) reuses the pinned
    bit-exact arithmetic, so the cached result hashes identically to
    the recomputed one.

    Scale shape: this is the ONLY registry ANN row whose per-query
    cost is independent of training — the Lloyd rounds and the PQ
    encode are paid at build time (pq_index_build_cells hashes that
    artifact); the query touches nprobe/k of the index as 16-byte
    codes plus a 50-row exact re-rank. The builder rebuilds the index
    on EVERY call: an earlier per-process memo keyed on sf_dir let
    bench timed passes serve from an artifact the warm-up pass wrote,
    which is exactly the cross-pass-reuse class the r14 honesty fix
    eliminated (r14 verdict item 3) — so each invocation now pays the
    full train + two-batch ingest cost, like every other trained row."""
    import tempfile

    from ..operators.ann_index import PqIvfIndexState
    from ..operators.similarity import kmeans_cells_exact

    cat = Catalog(spark, sf_dir)
    e = cat.embeddings
    _, state = kmeans_cells_exact(
        e,
        id_col="vec_id",
        vec_col="embedding",
        dim=DIM,
        k=8,
        iters=3,
        return_state=True,
    )
    ix = PqIvfIndexState(
        spark, tempfile.mkdtemp(prefix="pq-ivf-serve-"), state
    )
    ix.ingest(e.filter(F.col("vec_id") % 2 == 0))
    ix.ingest(e.filter(F.col("vec_id") % 2 == 1))
    qvec = (
        e.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    )
    short = ix.adc_shortlist(
        qvec, nprobe=_IVFADC_T_NPROBE, rerank=_TPQ_RERANK
    )
    qdf = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv")
        )
    )
    return (
        e.join(F.broadcast(short), e["vec_id"] == short["id"], "inner")
        .crossJoin(qdf)
        .select("vec_id", cosine_pair("embedding", "qv", DIM).alias("__cos"))
        .orderBy(F.col("__cos").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", F.round("__cos", 6).alias("cosine"))
    )
