"""End-to-end training-corpus build: the LLM-pipeline operators
composed into ONE artifact.

Reference status: extension surface. The reference's pipeline
composes catalog artifacts (01_source_me.R:100-346); this is the
same composition idea applied to the engine's training-data
operators — the pipeline a user switching from the reference would
run to turn a raw document dump into a training-ready corpus:

    quality gate (Gopher-style shape/repetition signals)
    → exact dedup (content fingerprint, deterministic keeper)
    → near-dedup (MinHash/LSH pairs → connected components,
      keep each cluster's minimum id)
    → deterministic train/val/test split (md5 of the id)
    → versioned snapshot (zone map + Bloom on doc_id)

Everything before the final commit is ONE lazy DAG per stage with
the shared intermediates persisted by the operators themselves;
quality metrics ride the final action via ``df.observe`` (zero
extra scans). The output is a :class:`VersionedTable` commit, so
downstream consumers read an atomic snapshot and every corpus build
is time-travelable — rerun the pipeline, diff the snapshots.

Scale shape: the gate and split are map-side; exact dedup is one
keyed shuffle on the fingerprint; near-dedup is the bucketed
LSH path (SCALING.md); the snapshot write is a plain parquet write
plus O(metadata) manifest publish.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import cache
from ..catalog import Catalog
from ..operators import text as T
from ..operators.dedup import connected_components, minhash_lsh_dedup_pairs
from ..operators.observe import with_quality_metrics
from ..sources.versioned import VersionedTable


def build_corpus_snapshot(
    spark: SparkSession,
    sf_dir: str,
    out_root: str,
    *,
    neardup_threshold: float = 0.8,
    bloom_bits: int = 4096,
) -> dict:
    """Run the corpus build and commit one versioned snapshot.

    Returns ``{"version", "stage_counts", "metrics"}`` where
    ``stage_counts`` traces attrition through the funnel and
    ``metrics`` are the observe counters collected during the final
    write-side action.
    """
    docs = Catalog(spark, sf_dir).documents
    n_raw = docs.count()

    # --- 1. quality gate -------------------------------------------------
    passing = (
        T.gopher_quality(docs)
        .filter(F.col("quality_pass"))
        .select("doc_id")
    )
    gated = docs.join(passing, "doc_id", "left_semi")
    n_gated = gated.count()

    # --- 2. exact dedup (content fingerprint, keep min doc_id) ----------
    wfp = Window.partitionBy("__fp").orderBy("doc_id")
    # persisted: exact feeds the near-dup pair build, the cluster node
    # list, the keeper semi-join, and the final write — without the
    # persist each consumer re-runs the gate + dedup window.
    exact = cache.track(
        gated.withColumn("__fp", T.fingerprint("text"))
        .withColumn("__rn", F.row_number().over(wfp))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )
    n_exact = exact.count()

    # --- 3. near-dedup: LSH pairs -> clusters, keep cluster min ---------
    pairs = minhash_lsh_dedup_pairs(
        exact, id_col="doc_id", text_col="text",
        threshold=neardup_threshold,
    )
    clusters = connected_components(pairs, exact, id_col="doc_id")
    keepers = clusters.filter(
        F.col("doc_id") == F.col("cluster_id")
    ).select("doc_id")
    deduped = exact.join(keepers, "doc_id", "left_semi")

    # --- 4. deterministic split ------------------------------------------
    b = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    final = deduped.withColumn(
        "split",
        F.when(b < "cd", "train").when(b < "e7", "val").otherwise("test"),
    )

    # --- 5. snapshot with metrics riding the write action ----------------
    # observe ABOVE the sort: a global sort's range-exchange runs a
    # sampling pass over its child first, so counters below the sort
    # node would double-count (see operators/observe.py).
    observed, obs = with_quality_metrics(
        final.sort("doc_id"),
        null_cols=("text",),
        bounds_cols=("n_chars",),
        name="corpus",
    )
    table = VersionedTable(spark, out_root)
    version = table.commit(
        observed,
        stats_col="doc_id",
        bloom_bits=bloom_bits,
        operation=f"corpus-build(sf_dir={sf_dir})",
    )
    metrics = dict(obs.get)
    return {
        "version": version,
        "stage_counts": {
            "raw": n_raw,
            "quality_gated": n_gated,
            "exact_deduped": n_exact,
            "near_deduped": metrics["rows"],
        },
        "metrics": metrics,
    }
