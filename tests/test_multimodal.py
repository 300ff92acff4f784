"""Multimodal plumbing tests: schema, batch shape, determinism, and
1→N fan-out of the Arrow-batched decode/resize/frame-sample stubs.
The codec bodies are fakes; everything Spark-side is real.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lmo_data_catalog_spark.catalog import Catalog
from lmo_data_catalog_spark.operators.multimodal import (
    decode_image_meta,
    decode_image_real,
    resize_image_meta,
    sample_frames,
    with_payload,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def payloads(spark):
    docs = Catalog(spark, SF).documents
    return with_payload(docs, text_col="text").cache()


def test_resize_geometry(payloads):
    out = resize_image_meta(payloads, target=224)
    rows = out.collect()
    assert len(rows) == payloads.count()
    for r in rows[:100]:
        assert min(r.out_width, r.out_height) == 224  # short side hits target
        # aspect preserved within rounding
        assert abs(r.out_width / r.out_height - r.width / r.height) < 0.02
        assert r.scale == 224 / min(r.width, r.height)


def test_frame_sampling_fanout(payloads):
    out = sample_frames(payloads, n_frames=4)
    n_docs = payloads.count()
    assert out.count() == 4 * n_docs
    per_doc = out.groupBy("doc_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_doc] == [4]
    one = out.filter(F.col("doc_id") == 0).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in one] == [0, 1, 2, 3]
    assert all(isinstance(r.frame, (bytes, bytearray)) for r in one)
    assert one[0].ts_ms == 0 and one[-1].ts_ms > 0


def test_decode_deterministic(payloads):
    a = sorted(tuple(r) for r in decode_image_meta(payloads).collect())
    b = sorted(tuple(r) for r in decode_image_meta(payloads).collect())
    assert a == b


def test_real_codec_is_explicit_stub(payloads):
    with pytest.raises(NotImplementedError):
        decode_image_real(payloads)
