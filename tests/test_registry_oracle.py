"""Differential tests: every registry query vs its DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01 — SURVEY §5.1).
"""

from __future__ import annotations

import pytest

from lmo_data_catalog_spark.registry import REGISTRY
from tools.verify_local import normalize

from .conftest import SF_SMOKE


@pytest.fixture(autouse=True)
def _release_tracked_caches():
    """Operators persist shared intermediates via cache.track; over
    174 parametrized queries in one session-scoped JVM those add up —
    release after every query like bench.py does between queries."""
    from lmo_data_catalog_spark import cache

    yield
    cache.release_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    spec = REGISTRY[name]
    df = spec.builder(spark, SF_SMOKE)
    s_cols, s_rows = normalize([tuple(r) for r in df.collect()], df.columns)
    if spec.oracle is None:
        # rows-only check (non-SQL-expressible op) — mirror the
        # driver's rows>0 gate, not a vacuous >=0
        assert len(s_rows) > 0, f"{name}: rows-only query returned 0 rows"
        return
    res = duck.execute(spec.oracle)
    d_cols = [d[0] for d in res.description]
    d_cols, d_rows = normalize(res.fetchall(), d_cols)
    assert s_cols == d_cols
    assert len(s_rows) == len(d_rows)
    assert s_rows == d_rows


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
