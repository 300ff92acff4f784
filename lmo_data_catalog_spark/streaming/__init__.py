"""Structured Streaming surface (SURVEY §2.8, §7 step E-d).

The reference is a pure batch pipeline; this package extends the
engine with the streaming operators a continuously-fed catalog would
need. Every operator is a plain ``DataFrame -> DataFrame`` function —
identical semantics on a batch frame and a ``readStream`` frame —
which is exactly how batch-equivalence is tested
(``Trigger.AvailableNow`` vs the same function on ``spark.read``).
"""

from .ops import (  # noqa: F401
    dedup_events,
    incremental_parquet_sink,
    run_available_now,
    session_counts,
    sliding_counts,
    stream_events,
    tumbling_counts,
    user_running_totals_batch,
    user_running_totals_stream,
)
