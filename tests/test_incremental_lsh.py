"""Incremental MinHash/LSH state (operators/dedup.py::LshDedupState):
the union of per-batch candidate sets over any ingestion order must
equal the full-recompute candidate set (exceptAll-empty both ways) —
each near-dup pair surfaces exactly when its later member arrives —
and every ingest is an atomic versioned commit of band rows only."""

from __future__ import annotations

from pyspark.sql import functions as F

from lmo_data_catalog_spark.operators.dedup import (
    LshDedupState,
    lsh_candidate_pairs,
    minhash_signatures,
)
from lmo_data_catalog_spark.operators.text import hashed_shingles

from .conftest import SF_SMOKE

KW = dict(n=3, n_hashes=64, bands=16)


def docs_of(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "source", "text"
    )


def full_recompute_pairs(docs):
    sh = hashed_shingles(docs, id_col="doc_id", text_col="text", n=3).toDF(
        "id", "h"
    )
    sig = minhash_signatures(sh, id_col="id", n_hashes=64)
    return lsh_candidate_pairs(sig, id_col="id", bands=16, rows=4)


def test_incremental_candidates_equal_full_recompute(spark, tmp_path):
    docs = docs_of(spark)
    state = LshDedupState(spark, str(tmp_path / "lsh"), **KW)
    # three uneven batches in arbitrary (non-id) order
    batches = [
        docs.filter(F.col("source").isin("src3", "src7")),
        docs.filter(F.col("source").isin("src0", "src1", "src9")),
        docs.filter(
            ~F.col("source").isin("src3", "src7", "src0", "src1", "src9")
        ),
    ]
    got = None
    for b in batches:
        cand = state.ingest(b, id_col="doc_id", text_col="text")
        got = cand if got is None else got.unionByName(cand)
    got = got.distinct()
    want = full_recompute_pairs(docs)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert want.count() > 0  # the fixture does contain near-dups
    # one atomic commit per batch, band rows only
    assert state.table.head() == 3
    assert set(state.table.read().columns) == {"id", "band_idx", "band_hash"}
    n_docs = docs.count()
    assert state.table.read().count() == n_docs * 16


def test_first_ingest_has_no_history_probe(spark, tmp_path):
    docs = docs_of(spark).filter(F.col("source") == "src2")
    state = LshDedupState(spark, str(tmp_path / "lsh"), **KW)
    cand = state.ingest(docs, id_col="doc_id", text_col="text")
    want = full_recompute_pairs(docs)
    assert cand.exceptAll(want).count() == 0
    assert want.exceptAll(cand).count() == 0
    # all pairs orientation-normalized
    assert cand.filter(F.col("id_a") >= F.col("id_b")).count() == 0


def test_lsh_dedup_sink_streaming_matches_full_recompute(spark, tmp_path):
    """Streaming ingest of a corpus in micro-batches: the union of
    per-batch candidate-pair partitions equals the batch full
    recompute, the state table ends one commit per micro-batch with a
    watermark, and re-running the finished stream adds nothing."""
    import os

    from pyspark.sql import functions as F

    from lmo_data_catalog_spark.sources.versioned import VersionedTable
    from lmo_data_catalog_spark.streaming import ops

    docs = docs_of(spark)
    src = str(tmp_path / "src")
    os.makedirs(src)
    a = docs.filter(F.col("source").isin("src0", "src1", "src2", "src3"))
    b = docs.filter(~F.col("source").isin("src0", "src1", "src2", "src3"))
    a.coalesce(1).write.parquet(os.path.join(src, "f=a"))
    b.coalesce(1).write.parquet(os.path.join(src, "f=b"))

    stream = (
        spark.readStream.schema("doc_id bigint, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    state_root = str(tmp_path / "state")
    pairs_path = str(tmp_path / "pairs")
    ops.lsh_dedup_sink(
        stream,
        state_root,
        pairs_path,
        checkpoint=str(tmp_path / "ckpt"),
    )
    got = (
        spark.read.parquet(pairs_path)
        .select("id_a", "id_b")
        .distinct()
    )
    want = full_recompute_pairs(docs)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    t = VersionedTable(spark, state_root)
    assert int(t.get_props()["stream_watermark"]) >= 1
    assert sum(
        1 for h in t.history() if h["operation"].startswith("lsh-ingest")
    ) == 2
    # replay the finished stream: no new state version, same pairs
    head = t.head()
    stream2 = (
        spark.readStream.schema("doc_id bigint, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    ops.lsh_dedup_sink(
        stream2, state_root, pairs_path,
        checkpoint=str(tmp_path / "ckpt"),
    )
    assert t.head() == head
    again = spark.read.parquet(pairs_path).select("id_a", "id_b").distinct()
    assert again.count() == got.count()


def test_crash_between_pairs_write_and_state_commit_replays_clean(
    spark, tmp_path
):
    """The exactly-once failure window: pairs published, crash BEFORE
    the state commit. The replayed batch must re-probe the unchanged
    state, overwrite the pairs partition with identical content, and
    only then land the commit — no pair loss, no band-row dup."""
    docs = docs_of(spark)
    b1 = docs.filter(F.col("source").isin("src0", "src1"))
    b2 = docs.filter(F.col("source").isin("src2", "src3"))
    root = str(tmp_path / "lsh")
    pairs = tmp_path / "pairs"

    state = LshDedupState(spark, root, **KW)
    state.ingest(b1, id_col="doc_id", text_col="text",
                 props={"stream_watermark": 0})

    # batch 1 "crashes": pairs written, state commit never happens
    cand, bands = state.probe(b2, id_col="doc_id", text_col="text")
    cand.write.mode("overwrite").parquet(str(pairs / "batch=1"))
    first = spark.read.parquet(str(pairs / "batch=1")).collect()
    head_before = state.table.head()

    # replay: fresh state handle (new process), watermark still 0 so
    # the batch re-runs; probe sees the identical pre-commit state
    replay = LshDedupState(spark, root, **KW)
    assert int(replay.table.get_props()["stream_watermark"]) == 0
    cand2, bands2 = replay.probe(b2, id_col="doc_id", text_col="text")
    cand2.write.mode("overwrite").parquet(str(pairs / "batch=1"))
    replay.commit_batch(bands2, props={"stream_watermark": 1})

    second = spark.read.parquet(str(pairs / "batch=1")).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))
    assert replay.table.head() == head_before + 1  # exactly one commit
    # union over the two batches still equals the full recompute
    got = (
        spark.read.parquet(str(pairs / "batch=1"))
        .unionByName(
            state.ingest(
                docs.filter(
                    ~F.col("source").isin("src0", "src1", "src2", "src3")
                ),
                id_col="doc_id",
                text_col="text",
            )
        )
        .unionByName(full_recompute_pairs(b1))
        .distinct()
    )
    want = full_recompute_pairs(docs)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
