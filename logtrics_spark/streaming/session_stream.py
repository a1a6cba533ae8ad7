"""Streaming sessionization — Spark's native ``session_window`` over
the live event stream, the incremental analog of
``operators/sessions.py::session_stats`` (same composition pattern as
ewma_stream/zscore_stream pairing a batch operator with its streaming
twin).

State: Spark merges each key's open session window in the state store
and the watermark closes sessions whose gap has provably elapsed — no
custom state code needed; this is the one sessionization layer where
the built-in operator already IS the right design.

Boundary fine print: ``session_window`` treats an event as extending
the session by a HALF-OPEN [ts, ts + gap) window, so an event arriving
exactly ``gap_seconds`` after the previous one starts a NEW session —
the batch operator keeps it (strictly-greater rule).  Real timestamps
land on the boundary with probability ~0; callers needing bit-parity
with the batch rule on synthetic integer-second data should add 1 µs
to the gap.

Output rows carry the same columns as the batch ``session_stats``
(start_us/end_us = observed event extremes, NOT the watermark-padded
window end), so downstream consumers are agnostic to which engine
produced them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logtrics_spark.operators.sessions import _us


def session_stream(
    events: DataFrame,
    key: list[str],
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """STREAMING events -> one row per closed (or, in complete/update
    output, open) session per key."""
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    us = _us(ts_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*key, F.session_window(ts_col, f"{gap_seconds} seconds"))
        .agg(
            F.min(us).alias("start_us"),
            F.max(us).alias("end_us"),
            F.count("*").alias("n_events"),
            ((F.max(us) - F.min(us)) / F.lit(1_000_000.0)).alias("duration_s"),
        )
        .drop("session_window")
    )
