"""Every registry oracle must at least PLAN in DuckDB.

The differential executes oracles at verify time, but that loop is
minutes long; this gate catches oracle SQL rot (typos, renamed
columns, DuckDB-version drift) in one sub-second pass by EXPLAINing
each statement against the real sf0.001 views — planning resolves
names and types without executing the query."""

from __future__ import annotations

import duckdb
import pytest

from lmo_data_catalog_spark.catalog import TABLES
from lmo_data_catalog_spark.registry import REGISTRY

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def test_all_oracles_plan(con):
    bad = {}
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        try:
            con.execute("EXPLAIN " + spec.oracle)
        except Exception as e:  # noqa: BLE001
            bad[name] = str(e).splitlines()[0]
    assert not bad, f"oracles failed to plan: {bad}"
