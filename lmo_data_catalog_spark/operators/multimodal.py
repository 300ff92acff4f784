"""Multimodal-column plumbing: opaque binary payloads + typed
metadata, processed by Arrow-batched pandas functions via
``mapInPandas``.

The decode kernels themselves are STUBBED (image/audio libraries are
not in this container): ``decode_image_meta`` runs a deterministic
fake keyed on payload bytes, and ``decode_image_real`` raises
``NotImplementedError`` until a real codec (e.g. Pillow) is wired in.
What IS real and tested: the binary column representation, the
mapInPandas signature, Arrow batch shapes, output schema, and
partition behavior — the parts that matter for Spark at scale.

Scale notes: mapInPandas streams Arrow record batches through one
Python worker per core; payload bytes never hit the driver. Batch
size is governed by spark.sql.execution.arrow.maxRecordsPerBatch —
lower it for large payloads so a batch fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = "doc_id long, n_bytes int, width int, height int"


def with_payload(df: DataFrame, *, text_col: str, payload_col: str = "payload") -> Column:
    """Attach a synthetic binary payload column (UTF-8 bytes of the
    text) — the stand-in for real image/audio bytes in fixtures."""
    return df.withColumn(payload_col, F.encode(F.col(text_col), "UTF-8"))


def decode_image_meta(
    df: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """'Decode' image metadata from binary payloads via mapInPandas.

    Deterministic fake: dimensions derived from byte length. Swap the
    body for a real codec without touching the Spark plumbing.
    """
    import pandas as pd

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            n = pdf[payload_col].apply(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n,
                    "width": 64 + n % 576,
                    "height": 64 + (n * 7) % 416,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        decode, schema=IMAGE_META_SCHEMA
    )


def decode_image_real(df: DataFrame, **kwargs) -> DataFrame:
    """Real image decode — requires an image codec library.

    STUB: not implemented in this container (no Pillow/libvips).
    The production body mirrors :func:`decode_image_meta` with the
    pandas transform replaced by the codec call.
    """
    raise NotImplementedError(
        "image codec not available in this environment; "
        "use decode_image_meta (deterministic fake) for plumbing tests"
    )
