"""End-to-end corpus build (plans/corpus_pipeline.py): the funnel
composes quality gate → exact dedup → near-dedup → split → versioned
snapshot, and each stage's guarantee must hold on the OUTPUT."""

from __future__ import annotations

from pyspark.sql import functions as F

from lmo_data_catalog_spark import cache
from lmo_data_catalog_spark.operators import text as T
from lmo_data_catalog_spark.operators.dedup import minhash_lsh_dedup_pairs
from lmo_data_catalog_spark.plans.corpus_pipeline import (
    build_corpus_snapshot,
)
from lmo_data_catalog_spark.sources.versioned import VersionedTable

SF = "/root/testdata/sf0.001"


def test_corpus_snapshot_end_to_end(spark, tmp_path):
    out = str(tmp_path / "corpus")
    try:
        res = build_corpus_snapshot(spark, SF, out)
    finally:
        cache.release_all()
    sc = res["stage_counts"]
    # monotone attrition through the funnel
    assert sc["raw"] >= sc["quality_gated"] >= sc["exact_deduped"]
    assert sc["exact_deduped"] >= sc["near_deduped"] > 0
    # the snapshot reads back with exactly the final rows + split col
    t = VersionedTable(spark, out)
    snap = t.read(res["version"])
    assert snap.count() == sc["near_deduped"]
    assert set(
        r["split"] for r in snap.select("split").distinct().collect()
    ) <= {"train", "val", "test"}
    # observe metrics rode the write action
    assert res["metrics"]["rows"] == sc["near_deduped"]
    assert res["metrics"]["text_nulls"] == 0
    # stage guarantees hold ON THE OUTPUT:
    # no exact duplicates survive
    n_fp = (
        snap.select(T.fingerprint("text").alias("fp")).distinct().count()
    )
    assert n_fp == sc["near_deduped"]
    # no near-dup pair survives at the pipeline's threshold
    try:
        leftover = minhash_lsh_dedup_pairs(
            snap, id_col="doc_id", text_col="text", threshold=0.8
        ).count()
    finally:
        cache.release_all()
    assert leftover == 0
    # every surviving doc passes the quality gate it was filtered by
    q = T.gopher_quality(snap)
    assert q.filter(~F.col("quality_pass")).count() == 0
    # snapshot manifest carries zone map + bloom for future merges
    st = t._load_manifest(res["version"])["stats"]
    (zm,) = st.values()
    assert zm["col"] == "doc_id" and "bloom" in zm


def test_corpus_build_is_deterministic_across_runs(spark, tmp_path):
    """Two independent builds from the same input must produce
    byte-identical row sets — pins end-to-end determinism through the
    gate, fingerprint dedup, MinHash/LSH, connected components, and
    the split (no RNG, no partition-order dependence anywhere)."""
    results = []
    for name in ("a", "b"):
        out = str(tmp_path / name)
        try:
            res = build_corpus_snapshot(spark, SF, out)
        finally:
            cache.release_all()
        t = VersionedTable(spark, out)
        rows = {
            tuple(r)
            for r in t.read(res["version"])
            .select("doc_id", "lang", "split")
            .collect()
        }
        results.append((res["stage_counts"], rows))
    assert results[0][0] == results[1][0]  # identical funnel counts
    assert results[0][1] == results[1][1]  # identical surviving rows


def test_write_cleaned_corpus_matches_md5_pin(spark, tmp_path):
    """The sort-based corpus materialization (no per-doc aggregation
    buffer) must reconstruct byte-identical cleaned text to the md5
    the differential query pins."""
    from lmo_data_catalog_spark.catalog import Catalog
    from lmo_data_catalog_spark.queries.pipeline import (
        substring_clean_kept_tokens,
        write_cleaned_corpus,
    )
    from lmo_data_catalog_spark.registry import REGISTRY

    sf = "/root/testdata/sf0.001"
    docs = Catalog(spark, sf).documents
    out = str(tmp_path / "cleaned")
    write_cleaned_corpus(
        substring_clean_kept_tokens(docs), out, partitions=4
    )

    import hashlib
    from collections import defaultdict

    toks = defaultdict(list)
    for r in spark.read.parquet(out).collect():
        toks[r["doc_id"]].append((r["pos"], r["tk"]))
    rebuilt = {
        d: hashlib.md5(
            " ".join(t for _, t in sorted(ps)).encode()
        ).hexdigest()
        for d, ps in toks.items()
    }

    want = {
        r["doc_id"]: r["cleaned_md5"]
        for r in REGISTRY["dup_substring_removal"].builder(spark, sf).collect()
    }
    assert rebuilt == want and len(want) > 0
