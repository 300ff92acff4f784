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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = "doc_id long, n_bytes int, width int, height int"


def with_payload(df: DataFrame, *, text_col: str, payload_col: str = "payload") -> DataFrame:
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


RESIZED_SCHEMA = (
    "doc_id long, width int, height int, out_width int, out_height int, "
    "scale double"
)


def resize_image_meta(
    df: DataFrame,
    *,
    target: int = 224,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize plumbing: compute output geometry (aspect-preserving,
    short side → ``target``) per image via mapInPandas.

    Deterministic fake dimensions (same rule as decode_image_meta);
    the pixel resample itself is the stubbed codec step — geometry,
    schema, and batch flow are the real Spark surface.
    """
    import pandas as pd

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            n = pdf[payload_col].apply(len)
            w = 64 + n % 576
            h = 64 + (n * 7) % 416
            scale = target / pd.concat([w, h], axis=1).min(axis=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": w,
                    "height": h,
                    "out_width": (w * scale).round().astype("int64"),
                    "out_height": (h * scale).round().astype("int64"),
                    "scale": scale,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        resize, schema=RESIZED_SCHEMA
    )


FRAME_SCHEMA = "doc_id long, frame_idx int, ts_ms long, frame binary"


def sample_frames(
    df: DataFrame,
    *,
    n_frames: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling plumbing: one input 'video' row → ``n_frames``
    output rows (uniformly spaced), each carrying a frame payload
    slice — the 1→N batch shape of real video decode.

    Fake duration/frames are derived from payload length; a real
    decoder replaces the slicing with codec output, nothing else
    changes. At scale this explodes row counts — size
    ``arrow.maxRecordsPerBatch`` for the OUTPUT rows, not the input.
    """
    import pandas as pd

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "ts_ms": [],
                "frame": [],
            }
            for _, row in pdf.iterrows():
                payload = row[payload_col]
                dur_ms = 1000 + (len(payload) * 13) % 9000  # fake duration
                step = max(1, len(payload) // n_frames)
                for i in range(n_frames):
                    out["doc_id"].append(row[id_col])
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * dur_ms // n_frames)
                    out["frame"].append(payload[i * step : (i + 1) * step])
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        sample, schema=FRAME_SCHEMA
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
