"""Workbook / CSV / Parquet sinks (SURVEY §2.1 S6-S10).

The reference writes ~8 multi-sheet Excel workbooks with percent
styling on trailing CAGR columns (``write_last3_percent``,
01_source_me.R:34-49) plus one zipped long CSV (:309-317). Here:

- S6/S7/S8 — :func:`write_workbook`: ``dict[sheet, DataFrame]`` →
  one REAL .xlsx always: openpyxl when available, else the stdlib
  zip+XML writer (:func:`_write_xlsx_stdlib`, the mirror of
  ``sources/ingest.py::read_xlsx_rows``) — sheet order, inline
  strings, and the reference's ``0.0%`` percent format on trailing
  CAGR columns, with zero dependencies.
- S9/S10 — :func:`write_csv_gzip`: distributed gzip CSV; Spark's
  native codec replaces the reference's zip-then-delete dance.
- Engine-native path — :func:`write_partitioned_parquet`.

Scale notes: workbook sinks ``toPandas`` by design and guard against
misuse with ``max_rows`` — catalog outputs are thousands of rows; a
100 TB result goes through the parquet/CSV sinks, which write
distributed (one file per partition, no driver collect).
"""

from __future__ import annotations

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

    Always a REAL .xlsx: ``0.0%`` number format on the last 3 columns
    of every sheet when ``pct_last3`` (matching write_last3_percent;
    values stay raw fractions, SM:52). openpyxl when installed, the
    stdlib zip+XML writer otherwise — same artifact contract either
    way. Returns the path written.
    """
    sheets = {}
    for name, df in workbook.items():
        clean = _sheet_name(name)
        if clean in sheets:
            # two long names truncating to the same 31 chars would
            # silently drop a sheet — disambiguate deterministically
            # (Excel's own behavior for duplicate titles)
            for i in range(1, len(workbook) + 1):
                suffixed = f"{clean[: 31 - len(str(i)) - 1]}~{i}"
                if suffixed not in sheets:
                    clean = suffixed
                    break
        sheets[clean] = _bounded_pandas(df, max_rows)
    try:
        import openpyxl  # noqa: F401
        import pandas as pd
    except ImportError:
        return _write_xlsx_stdlib(sheets, path, pct_last3=pct_last3)

    with pd.ExcelWriter(path, engine="openpyxl") as xl:
        for name, pdf in sheets.items():
            pdf.to_excel(xl, sheet_name=name, index=False)
            if pct_last3 and len(pdf.columns) >= 3:
                ws = xl.sheets[name]
                for col_idx in range(len(pdf.columns) - 2, len(pdf.columns) + 1):
                    for row_idx in range(2, len(pdf) + 2):
                        ws.cell(row=row_idx, column=col_idx).number_format = "0.0%"
    return path


def _sheet_name(n: str) -> str:
    """Excel sheet-name rules: ≤31 chars, no []:*?/\\ , no control
    chars (illegal in XML 1.0 even escaped), never empty."""
    clean = "".join(
        "_" if c in "[]:*?/\\" else c for c in n if c >= " " or c == "\t"
    )[:31]
    return clean or "Sheet"


_PCT_STYLE_ID = 1  # cellXfs index carrying the 0.0% format below


def _write_xlsx_stdlib(sheets, path: str, *, pct_last3: bool) -> str:
    """Dependency-free .xlsx writer — the mirror of the stdlib reader
    ``sources/ingest.py::read_xlsx_rows``, emitting exactly the subset
    it parses: sheet order via workbook.xml + rels, inline strings
    (no sharedStrings part), raw ``<v>`` numbers, and a styles part
    whose custom numFmt 164 is the reference's ``0.0%`` tag
    (01_source_me.R:34-49) applied as ``s="1"`` on the data cells of
    each sheet's last 3 columns. Produces standard OOXML any Excel /
    LibreOffice / pandas stack opens."""
    import math
    import zipfile
    from xml.sax.saxutils import escape as _esc

    def escape(s: str, entities: dict | None = None) -> str:
        # C0 controls (except \t \n \r) are ILLEGAL in XML 1.0 even
        # escaped — strip them before entity-escaping, or the part is
        # unparseable no matter how it's quoted (fuzz-found)
        s = "".join(c for c in s if c >= " " or c in "\t\n\r")
        return _esc(s, entities or {})

    def col_letter(i: int) -> str:  # 0 -> A, 26 -> AA
        s = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            s = chr(65 + r) + s
        return s

    def cell_xml(r: int, c: int, v, style: int) -> str:
        ref = f"{col_letter(c)}{r}"
        s_attr = f' s="{style}"' if style else ""
        if hasattr(v, "item"):  # numpy scalar from pandas itertuples
            v = v.item()
        if v is None or (isinstance(v, float) and not math.isfinite(v)):
            # NaN/±inf have no valid OOXML number form — blank cell
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}"{s_attr} t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"{s_attr}><v>{v!r}</v></c>'
        txt = escape(str(v))
        return f'<c r="{ref}"{s_attr} t="inlineStr"><is><t>{txt}</t></is></c>'

    ssml = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    odrel = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    pkgrel = "http://schemas.openxmlformats.org/package/2006/relationships"

    def sheet_xml(pdf) -> str:
        cols = list(pdf.columns)
        pct_from = len(cols) - 3 if pct_last3 and len(cols) >= 3 else len(cols)
        rows = [
            "<row r=\"1\">"
            + "".join(cell_xml(1, c, str(name), 0) for c, name in enumerate(cols))
            + "</row>"
        ]
        for j, rec in enumerate(pdf.itertuples(index=False), start=2):
            rows.append(
                f'<row r="{j}">'
                + "".join(
                    cell_xml(
                        j, c, v, _PCT_STYLE_ID if c >= pct_from else 0
                    )
                    for c, v in enumerate(rec)
                )
                + "</row>"
            )
        return (
            f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<worksheet xmlns="{ssml}"><sheetData>'
            + "".join(rows)
            + "</sheetData></worksheet>"
        )

    names = list(sheets)
    wb_sheets = "".join(
        # escape() alone leaves '"' intact — inside a name="..."
        # attribute that is malformed XML; pass the quot entity map
        f'<sheet name="{escape(n, {chr(34): "&quot;"})}" '
        f'sheetId="{i+1}" r:id="rId{i+1}"/>'
        for i, n in enumerate(names)
    )
    workbook_xml = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{ssml}" xmlns:r="{odrel}">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    wb_rels = "".join(
        f'<Relationship Id="rId{i+1}" Type="{odrel}/worksheet" '
        f'Target="worksheets/sheet{i+1}.xml"/>'
        for i in range(len(names))
    ) + (
        f'<Relationship Id="rId{len(names)+1}" Type="{odrel}/styles" '
        f'Target="styles.xml"/>'
    )
    styles_xml = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<styleSheet xmlns="{ssml}">'
        '<numFmts count="1"><numFmt numFmtId="164" formatCode="0.0%"/></numFmts>'
        '<fonts count="1"><font/></fonts>'
        '<fills count="1"><fill><patternFill patternType="none"/></fill></fills>'
        '<borders count="1"><border/></borders>'
        '<cellStyleXfs count="1"><xf/></cellStyleXfs>'
        '<cellXfs count="2">'
        '<xf numFmtId="0" fontId="0" fillId="0" borderId="0"/>'
        '<xf numFmtId="164" fontId="0" fillId="0" borderId="0" applyNumberFormat="1"/>'
        "</cellXfs></styleSheet>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType='
        '"application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        "<Override PartName=\"/xl/workbook.xml\" ContentType="
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        "<Override PartName=\"/xl/styles.xml\" ContentType="
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i+1}.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(len(names))
        )
        + "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{pkgrel}">'
        f'<Relationship Id="rId1" Type="{odrel}/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook_xml)
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{pkgrel}">{wb_rels}</Relationships>',
        )
        z.writestr("xl/styles.xml", styles_xml)
        for i, n in enumerate(names):
            z.writestr(f"xl/worksheets/sheet{i+1}.xml", sheet_xml(sheets[n]))
    return path


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


def zorder_key(cols: list[str], *, bits: int = 16) -> "F.Column":
    """Morton (Z-order) key: rank each column to a bounded integer
    domain upstream, then interleave the low ``bits`` bits of each —
    points close in EVERY dimension get close keys, so range-sorting
    by the key clusters multi-dimensionally.

    Pure expression bit-twiddling (shifts + masks inside whole-stage
    codegen); callers pass ranked/bucketized ints — interleaving raw
    skewed values would waste key bits on empty space. The repo's own
    rank step is ``operators/windows.py::distributed_ntile`` (quantile
    buckets with no global sort); epoch-days or other naturally-dense
    ints work as-is. End-to-end recipe pinned by
    ``test_zorder_on_skewed_data_via_ntile``.
    """
    if bits * len(cols) > 63:
        # bit 63 is the long's sign bit (negative keys sort first,
        # breaking the clustering invariant) and Java shifts wrap mod
        # 64 (distinct coordinates would silently share key bits)
        raise ValueError(
            f"zorder_key needs bits*len(cols) <= 63, got "
            f"{bits}*{len(cols)}={bits * len(cols)}; lower bits "
            "(rank through distributed_ntile first)"
        )
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(F.col(c).cast("long"), b).bitwiseAND(
                F.lit(1)
            )
            key = key.bitwiseOR(
                F.shiftleft(bit, b * len(cols) + i)
            )
    return key


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    *,
    zorder_by: list[str],
    bits: int = 16,
    target_partitions: int | None = None,
) -> str:
    """Z-order-clustered parquet: range-partition + sort on the Morton
    key of ``zorder_by`` so parquet row-group min/max stats are
    selective on EVERY listed column, not just the first — the
    two-hot-key layout (`write_clustered_parquet` covers the
    single-key case). A point/range predicate on either dimension
    skips most files at scan time; the write-side shuffle is paid
    once, like bucketing.

    Columns must already be non-negative ints in a ≲``bits``-bit
    domain — rank skewed columns through ``distributed_ntile``
    first (see ``zorder_key``)."""
    n = target_partitions or df.sparkSession.sparkContext.defaultParallelism
    keyed = df.withColumn("__zkey", zorder_key(zorder_by, bits=bits))
    (
        keyed.repartitionByRange(n, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def compact_parquet(
    spark,
    src: str,
    dst: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_file_bytes)`` files. The operational
    counterpart of the write-side layout sinks — streaming sinks and
    fine-grained partition overwrites accrete KB-sized files whose
    per-file open/footer cost eventually dominates scans; compaction
    restores the ~128 MB file regime `spark.sql.files.maxPartitionBytes`
    assumes.

    Sizing comes from the source's file-index metadata (driver-side
    listing, no data read); the rewrite is one distributed
    repartition. Returns the output file count. Compact into a NEW
    directory and swap atomically at the catalog layer — in-place
    rewrites lose the readers-vs-writers race at scale. For
    hive-partitioned tables run this per partition directory: a
    whole-table pass would read partition values into columns and
    write them back unpartitioned.
    """
    import math

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src)
    fs = p.getFileSystem(conf)
    total = fs.getContentSummary(p).getLength()
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src)
    df.repartition(n).write.mode("overwrite").parquet(dst)
    out_p = jvm.org.apache.hadoop.fs.Path(dst)
    it = fs.listFiles(out_p, False)
    count = 0
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            count += 1
    return count
