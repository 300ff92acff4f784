"""Shared helpers for the measurement probes (tools/*_probe.py).

One definition each for the two things every probe used to copy:
SCALING.md section maintenance and the noisy vector replication —
so a tweak cannot silently diverge between probes that claim the
"same scheme".
"""

from __future__ import annotations

import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALING = os.path.join(ROOT, "SCALING.md")


def replace_section(title: str, body: str, *, path: str = SCALING) -> None:
    """Replace the ``## <title>`` section of SCALING.md (up to the
    next line-anchored ``## `` heading) with ``body``, or append it if
    absent. ``body`` must start with the heading line itself."""
    with open(path) as fh:
        text = fh.read()
    pat = re.compile(
        r"(?m)^" + re.escape(f"## {title}") + r"\n.*?(?=\n## |\Z)", re.S
    )
    if pat.search(text):
        text = pat.sub(lambda _: body, text)
    else:
        text = text.rstrip("\n") + "\n\n" + body
    with open(path, "w") as fh:
        fh.write(text)


def replicate_noisy(vecs, k: int, n_base: int):
    """k replicas of an (vec_id, embedding) frame with per-(vec_id,
    replica, element) sinusoidal noise at ~1 element-stddev amplitude:
    deterministic, and decorrelates replicas from their originals AND
    from each other, so near-dup pair output stays far below N² at
    any replication."""
    from pyspark.sql import functions as F

    def _noisy(i):
        def f(x, j):
            return x + 0.12 * F.sin(
                F.col("vec_id") * 0.618 + F.lit(i * 2.4) + j * 0.71
            )

        return f

    parts = []
    for i in range(k):
        e = (
            F.col("embedding")
            if i == 0
            else F.transform(F.col("embedding"), _noisy(i))
        )
        parts.append(
            vecs.select(
                (F.col("vec_id") + i * n_base).alias("vec_id"),
                e.alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
