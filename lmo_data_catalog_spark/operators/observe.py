"""Pipeline observability: free metrics and bad-record quarantine.

Reference status: extension surface (the reference's only run-time
feedback is R console printing). Two production patterns a 100 TB
pipeline needs:

- ``with_quality_metrics`` piggybacks row/null/bounds counters on a
  frame via ``df.observe`` — the metrics are accumulated DURING the
  next action on the SAME pass over the data (Spark's Observation
  API), so data-quality monitoring costs zero extra scans. Contrast
  with the naive ``df.count(); df.filter(isNull).count(); ...`` which
  re-reads the table once per metric.
- ``parse_json_quarantine`` splits semi-structured input into parsed
  rows and a quarantine frame of rows that failed to parse, from ONE
  parse: ``from_json`` yields NULL on corrupt records, and the split
  is two filters over the shared (persisted) parsed frame — the
  bad-records-path pattern without losing the offending payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .. import cache


def with_quality_metrics(
    df: DataFrame,
    *,
    null_cols: tuple[str, ...] = (),
    bounds_cols: tuple[str, ...] = (),
    name: str = "quality",
) -> tuple[DataFrame, Observation]:
    """Attach row-count / null-count / min-max metrics to ``df``.

    Returns ``(observed_df, observation)``; after the FIRST action on
    ``observed_df`` (or any frame derived from it), ``observation.get``
    holds the metrics dict — computed on the same pass, no extra job.
    Metrics reflect the rows flowing through THIS point of the plan,
    which is exactly what a quality monitor wants (post-filter rows,
    not table rows). One Observation instance is single-use; call
    again per action (Spark contract). Placement caveat: attach the
    observation ABOVE any global sort (or other node whose physical
    strategy re-executes its child, e.g. range-exchange boundary
    sampling) — counters below such a node fire once per pass and
    double-count.
    """
    obs = Observation(name)
    exprs = [F.count(F.lit(1)).alias("rows")]
    for c in null_cols:
        exprs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                f"{c}_nulls"
            )
        )
    for c in bounds_cols:
        exprs.append(F.min(c).alias(f"{c}_min"))
        exprs.append(F.max(c).alias(f"{c}_max"))
    return df.observe(obs, *exprs), obs


def parse_json_quarantine(
    df: DataFrame, col: str, schema: StructType | str
) -> tuple[DataFrame, DataFrame]:
    """Parse ``df[col]`` as JSON; return ``(parsed, quarantine)``.

    ``parsed`` carries the struct fields of rows that parsed cleanly;
    ``quarantine`` carries the ORIGINAL rows whose non-null payload
    was corrupt OR had any malformed field, preserving the offending
    text for triage. Spark's PERMISSIVE mode never nulls the struct —
    it nulls bad FIELDS and reports the record through the
    ``columnNameOfCorruptRecord`` channel, which is the signal used
    here (a record with one bad field is quarantined whole: silent
    partial nulls are how poisoned columns sneak into training data).
    NULL payloads are neither parsed nor quarantined — absent is not
    corrupt. One ``from_json`` evaluation feeds both outputs through
    a tracked persist, so the input is read once regardless of which
    output is consumed first.
    """
    if isinstance(schema, StructType):
        schema = schema.simpleString()[7:-1]  # struct<...> -> inner
    full = f"{schema}, __bad STRING"
    tagged = cache.track(
        df.withColumn(
            "__parsed",
            F.from_json(
                F.col(col),
                full,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "__bad"},
            ),
        )
    )
    parsed = (
        tagged.filter(
            F.col(col).isNotNull() & F.col("__parsed.__bad").isNull()
        )
        .select("*", "__parsed.*")
        .drop("__parsed", "__bad")
    )
    quarantine = tagged.filter(
        F.col("__parsed.__bad").isNotNull()
    ).drop("__parsed")
    return parsed, quarantine
