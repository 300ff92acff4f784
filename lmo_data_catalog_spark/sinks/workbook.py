"""Workbook / CSV / Parquet sinks (SURVEY §2.1 S6-S10).

The reference writes ~8 multi-sheet Excel workbooks with percent
styling on trailing CAGR columns (``write_last3_percent``,
01_source_me.R:34-49) plus one zipped long CSV (:309-317). Here:

- S6/S7/S8 — :func:`write_workbook`: ``dict[sheet, DataFrame]`` →
  one .xlsx via openpyxl when available, else a directory of CSVs +
  ``manifest.json`` carrying sheet order and styling metadata (the
  presentation contract survives even without Excel libs).
- S9/S10 — :func:`write_csv_gzip`: distributed gzip CSV; Spark's
  native codec replaces the reference's zip-then-delete dance.
- Engine-native path — :func:`write_partitioned_parquet`.

Scale notes: workbook sinks ``toPandas`` by design and guard against
misuse with ``max_rows`` — catalog outputs are thousands of rows; a
100 TB result goes through the parquet/CSV sinks, which write
distributed (one file per partition, no driver collect).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: refuse to collect workbooks beyond catalog size (SURVEY §7 E-e:
#: "no toPandas anywhere in the data plane")
DEFAULT_MAX_ROWS = 1_000_000


class WorkbookTooLarge(RuntimeError):
    pass


def _bounded_pandas(df: DataFrame, max_rows: int):
    pdf = df.limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise WorkbookTooLarge(
            f"sheet exceeds {max_rows} rows; use write_partitioned_parquet "
            "or write_csv_gzip for data-plane-sized results"
        )
    return pdf


def write_workbook(
    workbook: dict[str, DataFrame],
    path: str,
    *,
    pct_last3: bool = False,
    as_table: bool = False,
    max_rows: int = DEFAULT_MAX_ROWS,
) -> str:
    """S6/S7/S8 — write an ordered ``dict[sheet_name, DataFrame]``.

    With openpyxl: a real .xlsx, ``0.0%`` number format on the last 3
    columns of every sheet when ``pct_last3`` (matching
    write_last3_percent; values stay raw fractions, SM:52). Without:
    ``<path>.d/`` of per-sheet CSVs + manifest.json recording sheet
    order and the styling the Excel writer would have applied.
    Returns the path actually written.
    """
    sheets = {name: _bounded_pandas(df, max_rows) for name, df in workbook.items()}
    try:
        import openpyxl  # noqa: F401
        import pandas as pd
    except ImportError:
        return _write_csv_fallback(sheets, path, pct_last3=pct_last3, as_table=as_table)

    # Excel sheet names: ≤31 chars, no []:*?/\
    def sheet_name(n: str) -> str:
        return "".join("_" if c in "[]:*?/\\" else c for c in n)[:31]

    with pd.ExcelWriter(path, engine="openpyxl") as xl:
        for name, pdf in sheets.items():
            pdf.to_excel(xl, sheet_name=sheet_name(name), index=False)
            if pct_last3 and len(pdf.columns) >= 3:
                ws = xl.sheets[sheet_name(name)]
                for col_idx in range(len(pdf.columns) - 2, len(pdf.columns) + 1):
                    for row_idx in range(2, len(pdf) + 2):
                        ws.cell(row=row_idx, column=col_idx).number_format = "0.0%"
    return path


def _write_csv_fallback(
    sheets, path: str, *, pct_last3: bool, as_table: bool
) -> str:
    out_dir = path + ".d" if not path.endswith("/") else path
    os.makedirs(out_dir, exist_ok=True)
    manifest = {
        "sheets": [],
        "styling": {"pct_last3": pct_last3, "as_table": as_table},
    }
    for i, (name, pdf) in enumerate(sheets.items()):
        fname = f"{i:02d}_{name.replace('/', '_')}.csv"
        pdf.to_csv(os.path.join(out_dir, fname), index=False)
        entry = {"sheet": name, "file": fname}
        if pct_last3 and len(pdf.columns) >= 3:
            entry["pct_cols"] = list(pdf.columns[-3:])
        manifest["sheets"].append(entry)
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2)
    return out_dir


def write_csv_gzip(df: DataFrame, path: str, *, single_file: bool = False) -> str:
    """S9/S10 — header CSV with native gzip codec (replaces the
    reference's zip+delete, SM:312-317). ``single_file`` coalesces to
    one part for catalog-style artifacts; leave False at scale."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).option(
        "compression", "gzip"
    ).csv(path)
    return path


def write_partitioned_parquet(
    df: DataFrame, path: str, *, partition_by: list[str] | None = None
) -> str:
    """Engine-native sink: partitioned parquet (the O2 fan-out at
    scale — one directory per key instead of one Excel sheet)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return path


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    *,
    cluster_by: list[str],
    target_partitions: int | None = None,
) -> str:
    """Range-clustered parquet: repartitionByRange on the cluster keys
    then sortWithinPartitions, so each output file covers a narrow,
    non-overlapping key range and its parquet row-group min/max stats
    become selective — point/range predicates skip whole files and row
    groups at scan time (poor man's Z-order for a single sort
    dimension). The layout step that makes a 100 TB table cheap to
    query on its hot key."""
    n = target_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in cluster_by]
    (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def write_catalog(
    artifacts: dict[str, dict[str, DataFrame]],
    out_dir: str,
    *,
    metadata: dict[str, dict] | None = None,
) -> dict[str, str]:
    """Materialize every built artifact with its sink metadata
    (plans.lmo_pipeline.ARTIFACTS): csv_gzip formats go through the
    distributed CSV sink, everything else through the workbook sink.
    Returns artifact name → written path."""
    os.makedirs(out_dir, exist_ok=True)
    metadata = metadata or {}
    written = {}
    for name, wb in artifacts.items():
        meta = metadata.get(name, {})
        if meta.get("format") == "csv_gzip":
            (df,) = wb.values()
            written[name] = write_csv_gzip(
                df, os.path.join(out_dir, name), single_file=True
            )
        else:
            written[name] = write_workbook(
                wb,
                os.path.join(out_dir, f"{name}.xlsx"),
                pct_last3=meta.get("pct_last3", False),
                as_table=meta.get("as_table", False),
            )
    return written
