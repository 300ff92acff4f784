"""HTML -> text extraction (operators/text.py::html_text /
html_link_density): hand-pinned extraction cases, entity decode
order, the link-density boilerplate gate, and the composition the
r10 verdict asked for — html_text feeding the Gopher quality gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lmo_data_catalog_spark.operators import text as T


def _extract(spark, html: str) -> tuple[str, float]:
    row = (
        spark.createDataFrame([(html,)], "h string")
        .select(
            T.html_text("h").alias("t"),
            T.html_link_density("h").alias("d"),
        )
        .first()
    )
    return row["t"], row["d"]


def test_strip_basics(spark):
    t, _ = _extract(
        spark,
        "<html><body><h1>Title</h1><p>Hello   <b>world</b></p></body></html>",
    )
    assert t == "Title Hello world"


def test_script_style_comment_blocks_removed(spark):
    t, _ = _extract(
        spark,
        '<head><style>p{color:red}</style>'
        '<script>var x = 1 < 2 && "a" > "b";</script></head>'
        "<body>keep<!-- not this -->me</body>",
    )
    # the '<' inside the script must not confuse the tag stripper:
    # the whole block goes first, as a block
    assert t == "keep me"


def test_entity_decode_order(spark):
    # &amp;lt; decodes to the LITERAL '&lt;' (single pass, amp last)
    t, _ = _extract(spark, "<p>a &amp;lt; b &lt; c &quot;q&quot; &#39;s&#39; x&nbsp;y</p>")
    assert t == "a &lt; b < c \"q\" 's' x y"


def test_link_density_gate(spark):
    prose = "word " * 60
    linky, d_linky = _extract(
        spark,
        '<div><a href="/">one two three four five</a> six</div>',
    )
    assert linky == "one two three four five six"
    assert d_linky > 0.7
    _, d_prose = _extract(spark, f"<p>{prose}</p>")
    assert d_prose == 0.0
    _, d_empty = _extract(spark, "<p></p>")
    assert d_empty == 0.0


def test_gopher_composition(spark):
    """The crawl-pipeline shape: raw markup -> html_text -> Gopher
    quality gate. A long clean prose doc survives; a repeated-bigram
    spam doc is rejected — on the EXTRACTED text, proving the two
    operators compose column-to-column."""
    clean = (
        "<html><body><p>"
        + " ".join(
            f"sentence{i} covers topic{i} with detail{i} plus note{i}"
            for i in range(12)
        )
        + "</p></body></html>"
    )
    spam = (
        "<html><body><p>" + "buy now " * 40 + "</p></body></html>"
    )
    df = spark.createDataFrame(
        [(1, clean), (2, spam)], "doc_id int, html string"
    ).select("doc_id", T.html_text("html").alias("text"))
    flags = {
        r["doc_id"]: r["quality_pass"]
        for r in T.gopher_quality(df).collect()
    }
    assert flags == {1: True, 2: False}
