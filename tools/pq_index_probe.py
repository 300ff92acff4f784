"""Persisted-IVFADC maintenance cost vs history size (round 13).

The O(batch) claim, measured: ingest the same-sized vector batch
into an index whose history grows 1x -> 8x, timing each commit; then
query walls at each history size. Expect ingest FLAT (encode is
per-vector, the append never reads history) and query growing only
with probed-cell occupancy (linear in corpus at fixed nprobe/k).

Batches are the sf0.1 embeddings with shifted ids (decorrelated ids,
same geometry), cells trained once on batch 0 — the frozen-artifact
deployment shape. Writes SCALING.md §PQ-index-maintenance numbers
(hand-copied; this tool prints them).

Usage: python tools/pq_index_probe.py [sf_dir] [n_batches]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lmo_data_catalog_spark.operators.ann_index import (  # noqa: E402
    PqIvfIndexState,
)
from lmo_data_catalog_spark.operators.similarity import (  # noqa: E402
    kmeans_cells_exact,
)
from lmo_data_catalog_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("pq-index-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = base.count()
    _, sums = kmeans_cells_exact(
        base,
        id_col="vec_id",
        vec_col="embedding",
        dim=64,
        k=8,
        iters=3,
        return_state=True,
    )
    root = tempfile.mkdtemp(prefix="pqix_probe")
    state = PqIvfIndexState(spark, root, sums)
    qvec = [
        float(x)
        for x in base.filter(F.col("vec_id") == 0)
        .collect()[0]["embedding"]
    ]

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    print(f"batch size = {n} vectors; cells trained once on batch 0")
    for b in range(n_batches):
        batch = base.select(
            (F.col("vec_id") + F.lit(b * n)).alias("vec_id"), "embedding"
        )
        t0 = time.time()
        state.ingest(batch)
        ing = time.time() - t0
        allv = base  # re-rank base: any vector table keyed by id
        full = None
        for bb in range(b + 1):
            part = base.select(
                (F.col("vec_id") + F.lit(bb * n)).alias("vec_id"),
                "embedding",
            )
            full = part if full is None else full.unionAll(part)
        force(state.query(qvec, full, nprobe=4))  # warm
        t0 = time.time()
        force(state.query(qvec, full, nprobe=4))
        q = time.time() - t0
        print(
            f"history {b + 1}x: ingest {ing:.2f}s  query {q:.2f}s  "
            f"(index rows {(b + 1) * n})"
        )


if __name__ == "__main__":
    main()
