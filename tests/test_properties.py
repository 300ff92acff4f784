"""Property tests (SURVEY §5.4) — hypothesis-generated inputs, small
example counts (each example is a Spark job), invariants from the
reference's algebra:

- unpivot∘pivot = identity on year-columned tables
- CAGR chain rule: (1+c10)^10 == (1+c5a)^5 · (1+c5b)^5
- exact n-gram Jaccard against a pure-Python ground truth
- clean_names idempotence + collision dedupe
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lmo_data_catalog_spark import schema_toolkit as stk
from lmo_data_catalog_spark.operators.dedup import exact_jaccard_pairs
from lmo_data_catalog_spark.operators.metrics import cagr_expr, value_at_year
from lmo_data_catalog_spark.operators.reshape import pivot_years, unpivot_years

YEARS = [2024, 2025, 2026]

prop = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

values = st.floats(
    min_value=0.1, max_value=1e6, allow_nan=False, allow_infinity=False
)


@prop
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c", "d"]), values, values, values),
        min_size=1,
        max_size=6,
        unique_by=lambda r: r[0],
    )
)
def test_unpivot_pivot_roundtrip(spark, rows):
    df = spark.createDataFrame(
        [(k, *vs) for k, *vs in rows], ["k"] + [str(y) for y in YEARS]
    )
    long = unpivot_years(df, ["k"])
    wide = pivot_years(long, ["k"], YEARS)
    got = {r["k"]: tuple(r[str(y)] for y in YEARS) for r in wide.collect()}
    want = {k: tuple(vs) for k, *vs in rows}
    assert set(got) == set(want)
    for k in want:
        for g, w in zip(got[k], want[k]):
            assert math.isclose(g, w, rel_tol=1e-12)


@prop
@given(
    v=st.tuples(values, values, values),
)
def test_cagr_chain_rule(spark, v):
    v0, v5, v10 = v
    df = spark.createDataFrame(
        [("g", 2024, v0), ("g", 2029, v5), ("g", 2034, v10)],
        ["k", "year", "value"],
    )
    row = df.groupBy("k").agg(
        cagr_expr(
            value_at_year("year", "value", 2024),
            value_at_year("year", "value", 2029),
            5,
        ).alias("c5a"),
        cagr_expr(
            value_at_year("year", "value", 2029),
            value_at_year("year", "value", 2034),
            5,
        ).alias("c5b"),
        cagr_expr(
            value_at_year("year", "value", 2024),
            value_at_year("year", "value", 2034),
            10,
        ).alias("c10"),
    ).first()
    lhs = (1 + row["c10"]) ** 10
    rhs = (1 + row["c5a"]) ** 5 * (1 + row["c5b"]) ** 5
    assert math.isclose(lhs, rhs, rel_tol=1e-9)
    assert math.isclose(1 + row["c5a"], (v5 / v0) ** 0.2, rel_tol=1e-9)


words = st.sampled_from("alpha beta gamma delta epsilon zeta".split())


@prop
@given(
    docs=st.lists(
        st.lists(words, min_size=3, max_size=12),
        min_size=2,
        max_size=5,
    )
)
def test_exact_jaccard_matches_python(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        ["doc_id", "text"],
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in exact_jaccard_pairs(
            df, id_col="doc_id", text_col="text", n=3, threshold=0.0
        ).collect()
    }

    def sh(toks):
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    want = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = sh(docs[i]), sh(docs[j])
            inter = len(a & b)
            if inter:
                want[(i, j)] = inter / len(a | b)
    assert set(got) == set(want)
    for k, v in want.items():
        assert math.isclose(got[k], v, rel_tol=1e-12)
        assert 0.0 < got[k] <= 1.0


@given(
    names=st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Lu", "Ll", "Nd"),
                whitelist_characters=" _-%",
            ),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=50, deadline=None)
def test_clean_name_idempotent_and_distinct(names):
    cleaned = []
    seen = {}
    for n in names:
        base = stk.clean_name(n)
        assert stk.clean_name(base) == base  # idempotent
        k = seen.get(base, 0)
        seen[base] = k + 1
        cleaned.append(base if k == 0 else f"{base}_{k+1}")
    assert len(set(cleaned)) == len(cleaned)  # dedupe produces unique names


def test_title_case_matches_stringr_examples():
    cases = {
        "1st 5-year CAGR": "1st 5-Year Cagr",
        "geographic area": "Geographic Area",
        "10-year CAGR": "10-Year Cagr",
        "noc": "Noc",
    }
    for raw, want in cases.items():
        assert stk.title_case(raw) == want


# ------------------------------------------------------- salted join algebra


@prop
@given(
    left_rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
            st.integers(min_value=0, max_value=100),
        ),
        min_size=0,
        max_size=12,
    ),
    right_keys=st.lists(
        st.integers(min_value=0, max_value=4), min_size=0, max_size=5, unique=True
    ),
    how=st.sampled_from(["inner", "left"]),
)
def test_salted_join_equals_plain_with_nulls(spark, left_rows, right_keys, how):
    """salted_join ≡ plain join for inner/left, under NULL keys,
    duplicate left rows, and unmatched keys on both sides. NULL keys
    are the sharp edge: equi-joins never match them, so they must
    drop (inner) or survive unmatched (left) — identically in both
    plans — while the salt hash must not throw on NULL input."""
    from lmo_data_catalog_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        left_rows or [(None, 0)], "k int, v int"
    )
    if not left_rows:
        left = left.filter(F.lit(False))
    right = spark.createDataFrame(
        [(k, k * 10) for k in right_keys] or [(0, 0)], "k int, dim int"
    )
    if not right_keys:
        right = right.filter(F.lit(False))

    plain = left.join(right, on=["k"], how=how)
    salted = salted_join(left, right, on=["k"], salt_buckets=4, how=how)
    got = sorted((tuple(r) for r in salted.select(*plain.columns).collect()), key=repr)
    want = sorted((tuple(r) for r in plain.collect()), key=repr)
    assert got == want


@given(
    qbits=st.integers(min_value=0, max_value=2**16 - 1),
    n_planes=st.integers(min_value=1, max_value=16),
    radius=st.integers(min_value=0, max_value=2),
)
@settings(max_examples=200, deadline=None)
def test_multiprobe_buckets_properties(qbits, n_planes, radius):
    """Multi-probe LSH probing sequence: contains the query bucket
    first, every probe is within Hamming `radius` of it, all probes
    are distinct, and the count is exactly sum_{r<=radius} C(n, r)."""
    from lmo_data_catalog_spark.operators.similarity import (
        multiprobe_buckets,
    )

    qbits %= 2**n_planes
    probes = multiprobe_buckets(qbits, n_planes, radius)
    assert probes[0] == qbits
    assert len(probes) == len(set(probes))
    expect = 1
    if radius >= 1:
        expect += n_planes
    if radius >= 2:
        expect += n_planes * (n_planes - 1) // 2
    assert len(probes) == expect
    for p in probes:
        assert bin(p ^ qbits).count("1") <= radius


@given(ids=st.lists(st.integers(min_value=0, max_value=2**40), min_size=2,
                    max_size=200, unique=True))
@settings(max_examples=100, deadline=None)
def test_md5_shard_prefix_partitions_the_hash_order(ids):
    """The invariant budget_head_hierarchical rests on: sharding by
    the first hex chars of md5 partitions the (md5, id) order into
    contiguous runs — shard index order IS a prefix partition of the
    global order, so per-shard running sums + offsets compose into the
    exact global running sum."""
    import hashlib

    keyed = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), i) for i in ids
    )
    for chars in (1, 2):
        shards = [int(h[:chars], 16) for h, _ in keyed]
        assert shards == sorted(shards), "shard order breaks hash order"


@given(
    data=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-10**9, 10**9)),
            st.one_of(
                st.none(),
                st.floats(allow_nan=True, allow_infinity=True, width=64),
            ),
            st.one_of(st.none(), st.text(max_size=20)),
        ),
        min_size=1,
        max_size=8,
    ),
    sheet=st.text(min_size=1, max_size=40),
)
@settings(max_examples=60, deadline=None)
def test_stdlib_xlsx_writer_reader_roundtrip(tmp_path_factory, data, sheet):
    """Fuzz the zip+XML writer against the zip+XML reader: arbitrary
    ints/floats/strings (incl. None, NaN, ±inf, control-ish text) and
    arbitrary sheet names must round-trip — non-finite floats become
    blank cells, values come back as their repr/str, and the workbook
    always PARSES (validity is the property; ElementTree raises on
    malformed XML)."""
    import math
    import os

    import pandas as pd

    from lmo_data_catalog_spark.sinks.workbook import (
        _sheet_name,
        _write_xlsx_stdlib,
    )
    from lmo_data_catalog_spark.sources.ingest import read_xlsx_rows

    # the reader returns merged text nodes; XML strips \r and other
    # C0 controls are invalid in XML 1.0 — normalize expectations the
    # way any OOXML consumer would
    def clean(s):
        return "".join(c for c in s if c >= " " or c == "\t")

    pdf = pd.DataFrame(data, columns=["i", "f", "s"], dtype=object)
    d = tmp_path_factory.mktemp("xlsxfuzz")
    path = os.path.join(str(d), "t.xlsx")
    _write_xlsx_stdlib({_sheet_name(sheet) or "s": pdf}, path, pct_last3=False)
    rows = read_xlsx_rows(path, sheet=0)
    assert rows[0] == ["i", "f", "s"]
    assert len(rows) - 1 == len(pdf)
    for got, (i, f, s) in zip(rows[1:], data):
        want_i = None if i is None else str(i)
        want_f = (
            None
            if f is None or (isinstance(f, float) and not math.isfinite(f))
            else repr(f)
        )
        want_s = None if s is None else (clean(s) if s else "")
        # sparse rows: trailing Nones may be dropped entirely
        got = (got + [None] * 3)[:3]
        assert got[0] == want_i
        assert got[1] == want_f
        if want_s is not None and clean(s) != s:
            continue  # control chars: writer emits escaped, reader text varies
        assert got[2] == want_s


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),  # doc id
            st.sampled_from(["en", "zh"]),
            st.integers(min_value=0, max_value=50),  # weight (incl. 0)
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    budget_frac=st.floats(min_value=0.0, max_value=1.2),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_budget_hierarchical_equals_flat_differential(spark, rows, budget_frac):
    """Randomized differential: for arbitrary non-negative weights
    (zeros included) and budgets from empty to over-total, the
    hierarchical operator's admitted set and running sums must equal
    the flat per-key window's, at both shard widths."""
    from pyspark.sql import Window

    from lmo_data_catalog_spark.operators.windows import (
        budget_head_hierarchical,
    )

    total = sum(w for _, _, w in rows) or 1
    budget = int(total * budget_frac)
    d = spark.createDataFrame(rows, "doc_id long, lang string, w long")
    flat_w = (
        Window.partitionBy("lang")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flat = {
        (r.doc_id, r.cum)
        for r in d.withColumn("cum", F.sum("w").over(flat_w))
        .filter(F.col("cum") <= budget)
        .collect()
    }
    for chars in (1, 2):
        got = {
            (r.doc_id, r.cum)
            for r in budget_head_hierarchical(
                d,
                key_col="lang",
                id_col="doc_id",
                weight_col="w",
                budget=budget,
                cum_col="cum",
                shard_hex_chars=chars,
            ).collect()
        }
        assert got == flat, f"chars={chars} budget={budget}"


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=39),
            st.integers(min_value=0, max_value=39),
        ),
        min_size=0,
        max_size=60,
    ),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_connected_components_matches_union_find(spark, edges):
    """Randomized differential for the pointer-jumping CC: arbitrary
    edge multisets (self-loops and duplicates included) over 40 nodes
    must produce exactly the per-component min labels a plain
    union-find computes."""
    from lmo_data_catalog_spark.operators.dedup import (
        connected_components,
    )

    parent = list(range(40))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(40)}

    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "id_a long, id_b long"
    )
    nodes = spark.range(40).select("id")
    got = {
        r.id: r.cluster_id
        for r in connected_components(
            pairs, nodes, id_col="id", max_iter=16
        ).collect()
    }
    assert got == want


# ------------------------------------------------ sweep-line max concurrency


@prop
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),       # user
            st.integers(min_value=0, max_value=50),      # start time
        ),
        min_size=1,
        max_size=30,
    ),
    dur=st.integers(min_value=1, max_value=20),
)
def test_sweep_line_matches_brute_force_overlap(spark, events, dur):
    """The +1/−1 running-sum sweep must equal the brute-force per-user
    max over time points of |intervals covering t| — including
    half-open [t, t+dur) boundary semantics (an interval ending at t
    does not overlap one starting at t)."""
    from pyspark.sql import Window

    df = spark.createDataFrame(events, ["u", "t"])
    starts = df.select("u", "t", F.lit(1).alias("d"))
    ends = df.select("u", (F.col("t") + dur).alias("t"), F.lit(-1).alias("d"))
    w = Window.partitionBy("u").orderBy("t", "d")
    got = {
        r["u"]: r["mx"]
        for r in starts.unionAll(ends)
        .withColumn("c", F.sum("d").over(w))
        .groupBy("u")
        .agg(F.max("c").alias("mx"))
        .collect()
    }
    want = {}
    for u in {u for u, _ in events}:
        ts = [t for uu, t in events if uu == u]
        # max coverage is attained at some interval start
        want[u] = max(
            sum(1 for t2 in ts if t2 <= t < t2 + dur) for t in ts
        )
    assert got == want


# -------------------------------------------------------- Gini rank formula


@prop
@given(
    counts=st.lists(
        st.integers(min_value=1, max_value=1000), min_size=1, max_size=12
    )
)
def test_gini_rank_formula_matches_definition(spark, counts):
    """G = (2·Σi·cᵢ − (n+1)·Σcᵢ)/(n·Σcᵢ) on ascending-sorted counts
    must equal the mean-absolute-difference definition
    G = Σᵢⱼ|cᵢ−cⱼ| / (2n²·mean)."""
    from pyspark.sql import Window

    rows = [(f"s{i}", c) for i, c in enumerate(counts)]
    df = spark.createDataFrame(rows, ["source", "c"])
    w = Window.orderBy("c", "source")
    ranked = df.withColumn("i", F.row_number().over(w))
    got = ranked.agg(
        (
            (2 * F.sum(F.col("i") * F.col("c")) - (F.count("*") + 1) * F.sum("c"))
            .cast("double")
            / (F.count("*") * F.sum("c"))
        ).alias("g")
    ).first()["g"]
    n = len(counts)
    mean = sum(counts) / n
    mad = sum(abs(a - b) for a in counts for b in counts)
    want = mad / (2 * n * n * mean)
    assert got == pytest.approx(want, rel=1e-12, abs=1e-12)


# ----------------------------------------- versioned merge: dict model


@prop
@given(
    steps=st.lists(
        st.tuples(
            st.sampled_from(["upsert", "delete"]),
            st.lists(
                st.integers(min_value=0, max_value=30),
                min_size=1,
                max_size=6,
                unique=True,
            ),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_versioned_merge_matches_dict_model(spark, tmp_path_factory, steps):
    """Model-based: a random sequence of keyed upsert/delete batches
    applied through VersionedTable.merge must equal the same sequence
    applied to a plain Python dict — for every intermediate VERSION,
    exercised back through time travel at the end."""
    from lmo_data_catalog_spark.sources.versioned import VersionedTable

    tmp = tmp_path_factory.mktemp("vt")
    t = VersionedTable(spark, str(tmp / "tbl"))
    t.commit(
        spark.createDataFrame(
            [(k, f"init{k}") for k in range(0, 10)], "id long, val string"
        ),
        stats_col="id",
    )
    model = {k: f"init{k}" for k in range(0, 10)}
    snapshots = [dict(model)]
    for i, (op, keys) in enumerate(steps):
        if op == "upsert":
            rows = [(k, f"s{i}v{k}") for k in keys]
            t.merge(
                spark.createDataFrame(rows, "id long, val string"), "id"
            )
            model.update(dict(rows))
        else:
            t.merge(
                None,
                "id",
                deletes=spark.createDataFrame(
                    [(k,) for k in keys], "id long"
                ),
            )
            for k in keys:
                model.pop(k, None)
        snapshots.append(dict(model))
    for v, want in enumerate(snapshots, start=1):
        got = {r["id"]: r["val"] for r in t.read(v).collect()}
        assert got == want, f"version {v} diverged from model"


# --------------------------------------- distributed Bloom: no false negs


@prop
@given(
    values=st.lists(
        st.integers(min_value=-(10**12), max_value=10**12),
        min_size=1,
        max_size=200,
        unique=True,
    )
)
def test_agg_bloom_build_has_no_false_negatives(spark, values):
    from pyspark.sql import functions as F

    from lmo_data_catalog_spark.operators.bloom import (
        bloom_might_contain,
        build_bloom_bitset_agg,
    )

    df = spark.createDataFrame([(v,) for v in values], "x long")
    words = build_bloom_bitset_agg(df, "x", m_bits=2048, k=3)
    hits = df.filter(
        bloom_might_contain(F.col("x").cast("string"), words)
    ).count()
    assert hits == len(values)  # every inserted value must test positive
