"""LSH-pipeline growth at 1x/4x/8x/16x — past the fixed-overhead zone.

SCALING.md's main table stops at 4x, where minhash-LSH is still
job-setup-bound (4x-input time ratio 1.12 proves overhead, not
linearity). This probe replicates the sf0.1 corpus to 8x and 16x
(80,000 docs) with the same token-tagged perturbation (zero shingle
overlap across replicas → expected pair/cluster growth is EXACTLY
linear) and times the two iterative/LSH flagships:

  minhash — minhash_lsh_dedup_pairs (64 sigs, banded candidates,
            exact-Jaccard verify)
  cluster — connected_components over those pairs (min-label
            propagation, the neardup_cluster_ids plan)

For each replication it prints wall seconds, pair count, cluster-row
count, and the pair-linearity check (pairs must equal k x base).
Appends nothing; SCALING.md §lsh holds the measured table.

Usage: python tools/lsh_scale_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

from pyspark.sql import functions as F  # noqa: E402

from lmo_data_catalog_spark import cache  # noqa: E402
from lmo_data_catalog_spark.catalog import Catalog  # noqa: E402
from lmo_data_catalog_spark.operators.dedup import (  # noqa: E402
    connected_components,
    minhash_lsh_dedup_pairs,
)
from lmo_data_catalog_spark.session import get_spark  # noqa: E402
from tools.scale_probe import replicate_docs  # noqa: E402


def run_once(docs, with_cluster: bool):
    t0 = time.time()
    pairs = minhash_lsh_dedup_pairs(
        docs, id_col="doc_id", text_col="text", threshold=0.8
    )
    n_pairs = pairs.count()
    t_pairs = time.time() - t0
    n_cluster = t_cluster = None
    if with_cluster:
        t0 = time.time()
        cc = connected_components(pairs, docs, id_col="doc_id")
        n_cluster = cc.count()
        t_cluster = time.time() - t0
    cache.release_all()
    return t_pairs, n_pairs, t_cluster, n_cluster


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("lsh_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    n_base = docs0.count()

    base_pairs = None
    for k in (1, 4, 8, 16):
        docs = replicate_docs(docs0, k, n_base).repartition(32).cache()
        docs.count()
        # warm-up then best-of-2 (bench protocol)
        run_once(docs, with_cluster=False)
        best = (float("inf"),) * 4
        for _ in range(2):
            r = run_once(docs, with_cluster=True)
            if r[0] < best[0]:
                best = r
        t_pairs, n_pairs, t_cluster, n_cluster = best
        if k == 1:
            base_pairs = n_pairs
        linear = n_pairs == k * base_pairs
        print(
            f"k={k:2d} docs={k * n_base:6d} minhash={t_pairs:6.2f}s "
            f"pairs={n_pairs} (linear={linear}) "
            f"cluster={t_cluster:6.2f}s cluster_rows={n_cluster}"
        )
        docs.unpersist()
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
