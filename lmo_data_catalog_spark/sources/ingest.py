"""Ingestion-edge readers (SURVEY §2.1 S1-S5).

The reference reads raw vendor files with banner rows and NA
sentinels: ``vroom(..., skip=3)`` (01_source_me.R:87,90),
``read_excel(..., skip=3, na="x")`` (:93-97), glob resolution
(:94-96), ``janitor::remove_empty()`` (:88,91).

Scale notes: banner-skipping CSVs and Excel are *landing-zone*
formats. The engine's contract is: ingest once → typed Parquet →
everything downstream reads Parquet through :class:`..catalog.Catalog`
(pushdown, pruning, splittable files). These readers are the one-time
landing step, sized for raw vendor drops, not the 100 TB hot path.
"""

from __future__ import annotations

import glob as _glob
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def resolve_input(directory: str, pattern: str) -> str:
    """S3 — locate an input file by glob pattern (01_source_me.R:94-96).

    Exactly-one match is enforced: silent multi-match is how stale
    vendor drops sneak into an annual pipeline.
    """
    hits = sorted(_glob.glob(os.path.join(directory, pattern)))
    if len(hits) != 1:
        raise FileNotFoundError(
            f"expected exactly one match for {pattern!r} in {directory!r}, "
            f"got {len(hits)}: {hits}"
        )
    return hits[0]


def read_csv_skip(
    spark: SparkSession,
    path: str,
    *,
    skip_rows: int = 0,
    header: bool = True,
    schema: StructType | str | None = None,
    na_values: Sequence[str] = (),
) -> DataFrame:
    """S1 — CSV scan with leading banner rows skipped (01_source_me.R:87).

    Spark's CSV source has no skip-N option, so banner rows are dropped
    per-file via ``zipWithIndex`` on the text lines (deterministic:
    ``textFile`` preserves in-file line order under the index). Globs
    are resolved driver-side so the skip applies to *each* file, then
    the per-file line RDDs are unioned and CSV-parsed once.
    """
    files = sorted(_glob.glob(path)) or [path]
    sc = spark.sparkContext
    rdds = []
    for f in files:
        lines = sc.textFile(f)
        if skip_rows > 0:
            lines = (
                lines.zipWithIndex()
                .filter(lambda kv: kv[1] >= skip_rows)  # noqa: B023
                .keys()
            )
        rdds.append(lines)
    union = rdds[0] if len(rdds) == 1 else sc.union(rdds)
    reader = spark.read.option("header", header)
    if na_values:
        # Spark CSV supports a single nullValue token; the reference
        # needs exactly one ("x", 01_source_me.R:97). Reject silently
        # ignoring extras.
        if len(list(na_values)) > 1:
            raise ValueError(
                "read_csv_skip supports exactly one NA sentinel "
                f"(got {list(na_values)!r}); pre-normalize the file or "
                "post-process with replace()"
            )
        reader = reader.option("nullValue", list(na_values)[0])
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(union)


def read_excel_ingest(
    spark: SparkSession,
    path: str,
    *,
    skip_rows: int = 0,
    na_values: Sequence[str] = ("x",),
) -> DataFrame:
    """S2 — Excel landing read (01_source_me.R:93-97).

    Spark has no core Excel source; ingestion goes driver-side through
    ``pandas.read_excel`` (bounded: vendor workbooks are catalog-sized)
    then ``createDataFrame``. Gated on openpyxl; a ``.csv`` path falls
    back to :func:`read_csv_skip` so test environments without Excel
    libs exercise identical semantics (skip + NA sentinel).
    """
    if path.endswith(".csv"):
        return read_csv_skip(
            spark, path, skip_rows=skip_rows, na_values=na_values
        )
    try:
        import pandas as pd

        pdf = pd.read_excel(path, skiprows=skip_rows, na_values=list(na_values))
    except ImportError as e:  # openpyxl missing
        raise NotImplementedError(
            "Excel ingestion requires openpyxl; land the file as CSV or "
            "Parquet instead"
        ) from e
    return spark.createDataFrame(pdf)


def remove_empty(
    df: DataFrame, *, rows: bool = True, cols: bool = True
) -> DataFrame:
    """S5 — drop all-NULL rows and all-NULL columns (01_source_me.R:88).

    Rows: ``na.drop(how="all")`` (distributed, no shuffle). Columns:
    one aggregate pass counting non-nulls per column — a single job
    whose result is a 1-row driver fetch, then a plain ``select`` of
    the survivors (column pruning reaches the scan).
    """
    out = df.na.drop(how="all") if rows else df
    if cols:
        counts = out.agg(
            *[F.count(F.col(c)).alias(c) for c in out.columns]
        ).first()
        keep = [c for c in out.columns if counts[c] > 0]
        if len(keep) < len(out.columns):
            out = out.select(*keep)
    return out
