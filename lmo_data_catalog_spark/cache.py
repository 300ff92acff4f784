"""Caching contract for shared intermediates.

Several operators (MinHash/SimHash/winnowing dedup, IVF ANN, the
per-region workbook fan-out) ``persist()`` an intermediate that two or
more downstream branches of the same plan consume — without it the
expensive upstream (shingling, signature hashing) re-executes once per
branch. Those persists are intentional and stay pinned until the
caller releases them: Spark has no "unpersist once my consumers are
materialized" hook, and unpersisting eagerly would silently recompute.

Contract: every operator-level persist goes through :func:`track`, and
long-lived sessions (notebooks, services) call :func:`release_all`
between logical units of work. ``bench.py`` does this between queries.
One-shot jobs can ignore it — executor caches die with the session.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

_TRACKED: list[weakref.ref] = []


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for :func:`release_all`."""
    df = df.persist()
    _TRACKED.append(weakref.ref(df))
    return df


def register(df: DataFrame) -> DataFrame:
    """Register an ALREADY persisted/checkpointed frame for
    :func:`release_all` without re-persisting it — for frames whose
    storage the caller created some other way (``localCheckpoint``,
    an explicit non-default storage level) that must still be
    reclaimable between units of work (iterative operators' rank/
    label vectors, see operators/graph.py)."""
    _TRACKED.append(weakref.ref(df))
    return df


def release_all() -> int:
    """Unpersist every tracked DataFrame still alive; returns count."""
    released = 0
    for ref in _TRACKED:
        df = ref()
        if df is None:
            continue
        try:
            df.unpersist()
            released += 1
        except Exception:  # session already stopped — nothing to free
            pass
    _TRACKED.clear()
    return released
