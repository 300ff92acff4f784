"""Measure PageRank growth on replicated co-occurrence graphs.

operators/graph.py::pagerank claims each round is one keyed join +
one keyed aggregate, i.e. linear in edges. This replicates the
sf0.1 part co-occurrence graph k× as DISJOINT copies (orderkeys and
partkeys both shifted, so baskets — and therefore edges and the rank
distribution — are preserved per copy) and measures the 3-round wall.
Ranks must be identical across copies: the probe asserts the rank
multiset of copy k equals copy 0's, a full-result correctness check
with no oracle needed.

Usage: python tools/pagerank_probe.py
Maintains the "## PageRank growth" SCALING.md section.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._shared import replace_section  # noqa: E402

SF = "/root/testdata/sf0.1"


def main() -> int:
    from pyspark.sql import functions as F

    from lmo_data_catalog_spark.operators.graph import pagerank
    from lmo_data_catalog_spark.session import get_spark

    spark = get_spark("pagerank_probe")
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .cache()
    )
    n_ok, n_pk = (
        li.agg(
            F.max("l_orderkey").alias("ok"), F.max("l_partkey").alias("pk")
        )
        .first()
    )
    rows = []
    for k in (1, 2, 4):
        parts = [
            li.select(
                (F.col("l_orderkey") + i * (n_ok + 1)).alias("l_orderkey"),
                (F.col("l_partkey") + i * (n_pk + 1)).alias("l_partkey"),
            )
            for i in range(k)
        ]
        rep = parts[0]
        for p in parts[1:]:
            rep = rep.unionAll(p)
        a = rep.toDF("l_orderkey", "src")
        b = rep.toDF("l_orderkey", "dst")
        edges = (
            a.join(b, "l_orderkey")
            .filter(F.col("src") != F.col("dst"))
            .select("src", "dst")
            .distinct()
        )
        t0 = time.monotonic()
        ranks = pagerank(edges, n_iter=3).cache()
        n_nodes = ranks.count()
        wall = time.monotonic() - t0
        # disjoint copies ⇒ every copy's rank multiset equals copy 0's
        r0 = (
            ranks.filter(F.col("node") <= n_pk)
            .groupBy(F.round("rank", 9).alias("r"))
            .count()
        )
        rk = (
            ranks.filter(F.col("node") >= (k - 1) * (n_pk + 1))
            .groupBy(F.round("rank", 9).alias("r"))
            .count()
        )
        mismatch = r0.exceptAll(rk).count() + rk.exceptAll(r0).count()
        assert mismatch == 0, f"copy ranks diverged at k={k}"
        n_edges = edges.count()
        ranks.unpersist()
        rows.append((k, n_nodes, n_edges, wall))
        print(rows[-1], flush=True)

    load1 = os.getloadavg()[0]
    lines = [
        "## PageRank growth",
        "",
        "`operators/graph.py::pagerank` (3 damped rounds) on the sf0.1",
        "part co-occurrence graph replicated as disjoint copies — nodes,",
        "edges, and the true rank distribution scale exactly linearly, so",
        "any super-linear wall growth would be the operator's fault",
        "(`tools/pagerank_probe.py`; per-copy rank multisets asserted",
        f"identical at every k; load1 {load1:.1f}):",
        "",
        "| copies | nodes | edges | 3-round wall (s) |",
        "|---|---|---|---|",
    ]
    for k, n_nodes, n_edges, wall in rows:
        lines.append(f"| {k}x | {n_nodes:,} | {n_edges:,} | {wall:.2f} |")
    r0, rN = rows[0], rows[-1]
    lines.append("")
    lines.append(
        f"{rN[0]}× the graph moved the wall {rN[3] / r0[3]:.2f}× — "
        "each round is one keyed join + one keyed aggregate, both linear "
        "in edges; rounds are fixed, so the whole computation is too. At "
        "cluster scale the rank vector and edge list co-partition on node "
        "id (bucketing), removing the per-round join exchange."
    )
    replace_section("PageRank growth", "\n".join(lines) + "\n")
    print("SCALING.md section updated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
