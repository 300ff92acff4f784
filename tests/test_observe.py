"""Observability operators (operators/observe.py): observe-metrics
piggybacking and JSON quarantine splitting."""

from __future__ import annotations

from pyspark.sql import functions as F

from lmo_data_catalog_spark.operators.observe import (
    parse_json_quarantine,
    with_quality_metrics,
)

SF = "/root/testdata/sf0.001"


def test_quality_metrics_match_direct_computation(spark):
    from lmo_data_catalog_spark.catalog import Catalog

    ev = Catalog(spark, SF).events.filter(F.col("event_type") == "view")
    observed, obs = with_quality_metrics(
        ev, null_cols=("props",), bounds_cols=("value",)
    )
    # metrics accumulate during this action — no extra job
    n_action = observed.count()
    got = obs.get
    want_nulls = ev.filter(F.col("props").isNull()).count()
    want_bounds = ev.agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    ).first()
    assert got["rows"] == n_action
    assert got["props_nulls"] == want_nulls
    assert got["value_min"] == want_bounds["mn"]
    assert got["value_max"] == want_bounds["mx"]


def test_quarantine_split_is_lossless_and_disjoint(spark):
    rows = [
        (1, '{"a": 1, "b": "x"}'),
        (2, '{"a": 2, "b": "y"}'),
        (3, "{not json at all"),
        (4, None),
        (5, '{"a": "notanint", "b": "z"}'),
    ]
    df = spark.createDataFrame(rows, ["id", "payload"])
    parsed, quarantine = parse_json_quarantine(
        df, "payload", "a INT, b STRING"
    )
    p = {(r["id"], r["a"], r["b"]) for r in parsed.collect()}
    q = {r["id"] for r in quarantine.collect()}
    # corrupt JSON is quarantined with its original payload
    assert 3 in q
    qrow = quarantine.filter(F.col("id") == 3).first()
    assert qrow["payload"].startswith("{not json")
    # null payload is neither parsed nor quarantined
    assert 4 not in q and all(i != 4 for i, _, _ in p)
    # a malformed FIELD ("notanint") quarantines the whole record —
    # silent partial nulls must not reach the parsed side
    assert 5 in q
    assert p == {(1, 1, "x"), (2, 2, "y")}
    # disjoint + lossless over non-null payloads
    assert q.isdisjoint({i for i, _, _ in p})
    assert q | {i for i, _, _ in p} == {1, 2, 3, 5}
