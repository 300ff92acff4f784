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
    assert set(state.table.read().columns) == {
        "id", "band_idx", "band_hash", "band_bucket"
    }
    n_docs = docs.count()
    assert state.table.read().count() == n_docs * 16
    # physical layout: every state directory is Hive-partitioned on
    # band_bucket, and the recorded bucket equals pmod(band_hash, 32)
    m = state.table._load_manifest(state.table.head())
    assert all(
        m["partitioned"].get(d) == ["band_bucket"]
        for d in m["data_dirs"]
    )
    bad = state.table.read().filter(
        F.col("band_bucket") != F.pmod(F.col("band_hash"), F.lit(32))
    )
    assert bad.count() == 0


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


def test_probe_is_bucket_pruned_and_shuffle_free(spark, tmp_path):
    """The 100 TB contract of the bucketed state layout: an ingest
    probe (a) scans ONLY the state subdirectories holding the batch's
    band buckets, and (b) carries no shuffle join on the state side —
    the batch is broadcast, so the only Exchange in the candidate
    plan belongs to the final distinct over the (small) pair set."""
    docs = docs_of(spark)
    hist = docs.filter(~F.col("source").isin("src8", "src9"))
    batch = docs.filter(F.col("source") == "src9")
    state = LshDedupState(spark, str(tmp_path / "lsh"), **KW)
    state.ingest(hist, id_col="doc_id", text_col="text")

    cand, bands = state.probe(batch, id_col="doc_id", text_col="text")
    cand.collect()
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" in plan

    # file pruning: the probe read touches a strict subset of the
    # state's files unless the batch happens to hit every bucket
    buckets = {
        r[0] for r in bands.select("band_bucket").distinct().collect()
    }
    probe_files = state.table.read_partitions(
        "band_bucket", buckets
    ).inputFiles()
    all_files = state.table.read().inputFiles()
    assert set(probe_files) <= set(all_files)
    if len(buckets) < 32:
        assert len(probe_files) < len(all_files)
    # every probed file lives in a requested bucket subdir
    assert all(
        any(f"band_bucket={b}/" in f for b in buckets)
        for f in probe_files
    )


def test_lsh_dedup_sink_retention_bounds_disk_and_survives_vacuum(
    spark, tmp_path
):
    """With state_keep_last/pairs_keep_batches set, a multi-trigger
    stream ends with a bounded state history and only the last N
    pairs directories — and replay safety survives the vacuum (the
    watermark rides every manifest, so a finished-stream re-run is
    still a no-op and recent pairs are untouched)."""
    import os

    from lmo_data_catalog_spark.sources.versioned import VersionedTable
    from lmo_data_catalog_spark.streaming import ops

    docs = docs_of(spark)
    src = str(tmp_path / "src")
    os.makedirs(src)
    groups = [("src0", "src1"), ("src2", "src3"), ("src4", "src5"),
              ("src6", "src7"), ("src8", "src9")]
    for i, g in enumerate(groups):
        docs.filter(F.col("source").isin(*g)).coalesce(1).write.parquet(
            os.path.join(src, f"f={i}")
        )

    def mk_stream():
        return (
            spark.readStream
            .schema("doc_id bigint, source string, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )

    state_root = str(tmp_path / "state")
    pairs_path = str(tmp_path / "pairs")
    kw = dict(
        checkpoint=str(tmp_path / "ckpt"),
        state_keep_last=2,
        pairs_keep_batches=2,
    )
    ops.lsh_dedup_sink(mk_stream(), state_root, pairs_path, **kw)

    t = VersionedTable(spark, state_root)
    assert len(t.versions()) <= 2  # history vacuumed down
    wm = int(t.get_props()["stream_watermark"])
    assert wm == 4  # 5 triggers, ids 0..4
    batches = sorted(
        int(d.split("=")[1]) for d in os.listdir(pairs_path)
        if d.startswith("batch=")
    )
    assert batches == [3, 4]  # only the last pairs_keep_batches remain
    # state data itself is complete: all 5 batches' band rows live
    streamed = docs.filter(
        F.col("source").isin(*[s for g in groups for s in g])
    ).count()
    assert t.read().count() == streamed * 16

    # finished-stream replay after vacuum: still a no-op
    head = t.head()
    ops.lsh_dedup_sink(mk_stream(), state_root, pairs_path, **kw)
    assert t.head() == head
    assert sorted(
        int(d.split("=")[1]) for d in os.listdir(pairs_path)
        if d.startswith("batch=")
    ) == [3, 4]
    # retained pairs are exactly the per-batch probe results: check
    # batch 4 against an offline probe of batches 0-3 state
    probe_docs = docs.filter(F.col("source").isin("src8", "src9"))
    offline = LshDedupState(spark, str(tmp_path / "offline"), **KW)
    offline.ingest(
        docs.filter(
            F.col("source").isin(*[s for g in groups[:4] for s in g])
        ),
        id_col="doc_id", text_col="text",
    )
    want4, _ = offline.probe(probe_docs, id_col="doc_id", text_col="text")
    got4 = spark.read.parquet(os.path.join(pairs_path, "batch=4")).select(
        "id_a", "id_b"
    )
    assert got4.exceptAll(want4).count() == 0
    assert want4.exceptAll(got4).count() == 0


def test_state_compact_preserves_bucket_layout_and_candidates(
    spark, tmp_path
):
    """OPTIMIZE on the band table: three per-ingest directories
    collapse to ONE bucket-partitioned directory; the next probe is
    still bucket-pruned (files from the compacted dir's bucket
    subdirs only) and produces the same candidates as an uncompacted
    twin; vacuum then reclaims the per-ingest dirs."""
    docs = docs_of(spark)
    srcs = [("src0", "src1"), ("src2", "src3"), ("src4", "src5")]
    a = LshDedupState(spark, str(tmp_path / "a"), **KW)
    b = LshDedupState(spark, str(tmp_path / "b"), **KW)
    for g in srcs:
        batch = docs.filter(F.col("source").isin(*g))
        a.ingest(batch, id_col="doc_id", text_col="text")
        b.ingest(batch, id_col="doc_id", text_col="text")

    a.compact()
    m = a.table._load_manifest(a.table.head())
    assert len(m["data_dirs"]) == 1
    assert m["partitioned"][m["data_dirs"][0]] == ["band_bucket"]
    assert a.table.read().count() == b.table.read().count()

    probe_docs = docs.filter(F.col("source") == "src6")
    ca, bands_a = a.probe(probe_docs, id_col="doc_id", text_col="text")
    cb, _ = b.probe(probe_docs, id_col="doc_id", text_col="text")
    assert ca.exceptAll(cb).count() == 0
    assert cb.exceptAll(ca).count() == 0
    # probe still physically pruned within the compacted dir
    buckets = {
        r[0] for r in bands_a.select("band_bucket").distinct().collect()
    }
    files = a.table.read_partitions("band_bucket", buckets).inputFiles()
    assert files and all(
        any(f"band_bucket={bk}/" in f for bk in buckets) for f in files
    )
    # old per-ingest dirs reclaimable; probe-equivalence survives
    removed = a.table.vacuum(keep_last=1)
    assert len(removed) == 3
    ca2, _ = a.probe(probe_docs, id_col="doc_id", text_col="text")
    assert ca2.exceptAll(cb).count() == 0
    assert cb.exceptAll(ca2).count() == 0
