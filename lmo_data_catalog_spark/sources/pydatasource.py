"""Custom connectors via the Python DataSource API (Spark 4,
SPARK-44076): the extension point for feeds the built-in readers don't
cover — internal services, queues, proprietary formats. The streaming
operators in :mod:`..streaming.ops` are source-agnostic; registering a
source like this (or a Kafka reader) is the only swap needed to move
off parquet files.

Reference status: extension surface — the reference ingests static
files only (01_source_me.R:87-96).

``EventsGenDataSource`` is a deterministic synthetic events feed:

- batch: ``spark.read.format("events_gen").option("rows", N)`` —
  partitioned generation, seeded per partition, so the same options
  always produce the same rows (differential-testable) and generation
  parallelizes across executors like any scan.
- streaming: ``spark.readStream.format("events_gen")`` — a replayable
  offset log (micro-batch b covers rows [b·rate, (b+1)·rate)), so
  restarts re-read identical micro-batches — the exactly-once
  contract a real queue source must honor.

Scale notes: each InputPartition carries only (start, end) bounds —
generation state never touches the driver; at 100 TB the same pattern
holds for any partition-describable remote feed (shard ids, offset
ranges, file manifests).
"""

from __future__ import annotations

import datetime

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double"
)

_TYPES = ("view", "click", "purchase", "signup", "error")
_EPOCH = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _row(i: int):
    """Deterministic event i — a tiny splitmix-style mix so values
    look varied but are reproducible everywhere (no RNG state)."""
    z = (i * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z ^= z >> 27
    return (
        i,
        _EPOCH + datetime.timedelta(seconds=60 * i),
        z % 1000,
        _TYPES[z % len(_TYPES)],
        round((z % 100_000) / 100.0, 2),
        )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class EventsGenReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("numpartitions", 4))

    def partitions(self):
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield _row(i)


class EventsGenStreamReader(DataSourceStreamReader):
    """Replayable offset log: offset = total rows emitted so far.

    ``latestOffset`` must be MONOTONE across driver restarts: a fresh
    reader starts ``_current`` at 0, but after checkpoint recovery the
    engine replans from the committed offset — if latestOffset lagged
    behind it, planned batches would be empty/backwards until the
    counter caught up. Every offset the engine hands back through
    ``partitions`` therefore ratchets ``_current`` forward first.

    KNOWN ONE-BATCH REGRESSION (documented contract): when a restart
    happens with *every* batch committed, the engine's first call on
    the fresh reader is ``latestOffset()`` — before any ``partitions``
    call has carried the committed offset in, so nothing on this side
    can know the high-water mark (the Python DataSource API has no
    restore callback). That first call returns ``rate``, the engine
    plans one batch whose end precedes its committed start, and writes
    that lower offset to its log. The batch is harmlessly EMPTY —
    ``partitions`` clamps ``end`` to ``start`` so no committed row is
    ever re-emitted — and the very same ``partitions`` call ratchets
    ``_current`` to the committed offset, so monotonicity holds from
    the second post-restart batch onward. Exactly-once delivery is
    never violated; only the offset-log sequence dips for one entry.
    ``test_stream_offsets_monotone_after_recovery`` pins both halves.
    """

    def __init__(self, options):
        self.rate = int(options.get("rowsperbatch", 100))
        self._current = 0

    def initialOffset(self):
        return {"offset": 0}

    def latestOffset(self):
        # a real source would poll the feed; the generator always has
        # one more batch available
        self._current += self.rate
        return {"offset": self._current}

    def partitions(self, start: dict, end: dict):
        # checkpoint-recovery ratchet: the engine knows offsets this
        # (possibly fresh) reader instance has never seen
        self._current = max(self._current, start["offset"], end["offset"])
        # clamp: a post-restart first batch can arrive with end <
        # start (see class docstring) — plan it as explicitly empty
        # rather than a backwards range, so no committed row replays
        return [
            _RangePartition(
                start["offset"], max(start["offset"], end["offset"])
            )
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield _row(i)

    def commit(self, end: dict) -> None:
        pass


class EventsGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "events_gen"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> EventsGenReader:
        return EventsGenReader(self.options)

    def streamReader(self, schema) -> EventsGenStreamReader:
        return EventsGenStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration: ``spark.read.format("events_gen")``
    and ``df.write.format("jsonl_sink")``."""
    spark.dataSource.register(EventsGenDataSource)
    spark.dataSource.register(JsonlSinkDataSource)


# --------------------------------------------------------------- write path


class _ShardCommit(WriterCommitMessage):
    """One task's commit message: the shard it staged + row count."""

    def __init__(self, tmp_name: str, rows: int):
        self.tmp_name = tmp_name
        self.rows = rows


class JsonlSinkWriter(DataSourceWriter):
    """Executor-side JSONL shard writer with a two-phase commit.

    Each task streams its partition to ``_tmp-<uuid>.jsonl`` and
    reports the staged name; only the DRIVER's ``commit`` renames
    staged shards to ``part-<i>.jsonl`` and publishes a ``_SUCCESS``
    manifest naming them — so readers that resolve the manifest never
    see a torn write, and a failed/speculated task's orphan staging
    file is ignored (and removed by ``abort``). This is the same
    manifest-publish idea as :mod:`.versioned`, demonstrated through
    Spark's DataSourceWriter task-commit protocol.
    """

    def __init__(self, options, schema):
        import uuid as _uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires .option('path', ...)")
        self.fields = [f.name for f in schema.fields]
        # per-commit token: final shard names are unique across
        # writes, so a second append can never rename over an earlier
        # commit's shards; the manifest (last-writer-wins) names only
        # the latest commit's files.
        self.token = _uuid.uuid4().hex[:8]

    def write(self, iterator):
        import json as _json
        import os as _os
        import uuid as _uuid

        _os.makedirs(self.path, exist_ok=True)
        name = f"_tmp-{_uuid.uuid4().hex}.jsonl"
        n = 0
        with open(_os.path.join(self.path, name), "w") as fh:
            for row in iterator:
                rec = {k: row[i] for i, k in enumerate(self.fields)}
                fh.write(_json.dumps(rec, default=str) + "\n")
                n += 1
        return _ShardCommit(name, n)

    def commit(self, messages):
        import json as _json
        import os as _os

        files, total = [], 0
        for i, m in enumerate(messages):
            final = f"part-{self.token}-{i:05d}.jsonl"
            _os.rename(
                _os.path.join(self.path, m.tmp_name),
                _os.path.join(self.path, final),
            )
            files.append(final)
            total += m.rows
        with open(_os.path.join(self.path, "_SUCCESS"), "w") as fh:
            _json.dump({"files": files, "rows": total}, fh)

    def abort(self, messages):
        import os as _os

        for m in messages:
            try:
                _os.unlink(_os.path.join(self.path, m.tmp_name))
            except FileNotFoundError:
                pass


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options, schema)
