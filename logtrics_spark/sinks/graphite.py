"""K2/K3 — Graphite plaintext sink parity + debug metric log.

The reference's entire output surface is the Graphite plaintext
protocol: every ``interval`` seconds the go-metrics registry is pushed
over TCP as ``<metric path> <value> <epoch>\\n`` lines
(/root/reference/graphite/graphite.go:61-98 via the
cyberdelia/go-metrics-graphite reporter, go.mod:8), with ``graphite.
debug`` additionally logging the registry every tick
(graphite/graphite.go:75-83).

Here the tier tables are the primary sink (the right at-scale design),
and this module restores protocol parity for users migrating off the
reference:

- ``to_graphite_lines``: tier rows -> DataFrame[line: string], one line
  per reported field, formatted like the go-metrics-graphite reporter
  (counter ``.count``, gauge ``.value``, meter ``.count``/``.mean-rate``
  (+ EWMA columns when present), timer ``.count``/``.min``/``.max``/
  ``.mean`` (+ percentile columns when present)).  Pure Catalyst string
  expressions — usable at any scale, streamable through foreachBatch.
- ``send_graphite_tcp``: ships a lines DataFrame to a Graphite host,
  one socket per partition (executor-side, nothing through the driver).
- ``graphite_batch_sink``: foreachBatch adapter combining the two,
  honoring the ``graphite.debug`` config key (K3) by also logging the
  formatted registry snapshot per batch.

Timestamping: the reference stamps lines with the wall-clock flush
moment; the deterministic analog is the window END epoch (the moment
that window's registry snapshot would have flushed).

Float fields are quantized to 6 dp before ``%.6f`` formatting so the
emitted string is a pure function of the aggregate value (no engine-
specific shortest-repr ambiguity) — this is also what makes the
``graphite_lines`` driver query hash-comparable against a DuckDB
``printf`` oracle.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logtrics_spark.operators.rollup import tier_seconds

logger = logging.getLogger("logtrics_spark.graphite")


def _q6(col) -> Column:
    """Cross-engine-stable 6 dp quantization (see __spark_entry__._q)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c.cast("double") * 1e6 + 0.5 + 1e-6) / 1e6


def _f(col) -> Column:
    return F.format_string("%.6f", _q6(col))


def _i(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.format_string("%d", c.cast("long"))


# reporter field -> tier column, formatter; mirrors what the
# go-metrics-graphite reporter emits per metric kind (graphite.go:86)
_KIND_FIELDS: dict[str, list[tuple[str, str, object]]] = {
    "counter": [("count", "cum_sum", _i), ("count", "sum", _i)],
    "gauge": [("value", "last", _i)],
    "meter": [
        ("count", "cnt", _i),
        ("mean-rate", "rate", _f),
        ("one-minute", "rate_m1", _f),
        ("five-minute", "rate_m5", _f),
        ("fifteen-minute", "rate_m15", _f),
    ],
    "timer": [
        ("count", "cnt", _i),
        ("min", "min", _f),
        ("max", "max", _f),
        ("mean", "avg", _f),
        ("std-dev", "stddev", _f),
        ("50-percentile", "p50", _f),
        ("75-percentile", "p75", _f),
        ("95-percentile", "p95", _f),
        ("99-percentile", "p99", _f),
        ("999-percentile", "p999", _f),
        ("mean-rate", "rate", _f),
        ("one-minute", "rate_m1", _f),
        ("five-minute", "rate_m5", _f),
        ("fifteen-minute", "rate_m15", _f),
    ],
}


# timer value fields the reporter divides by DurationUnit before
# formatting (graphite/graphite.go:71 sets time.Second over ns inputs);
# count and the rates are NOT duration-valued
_TIMER_DURATION_FIELDS = {"min", "max", "mean", "std-dev"} | {
    f"{p}-percentile" for p in (50, 75, 95, 99, 999)
}


def to_graphite_lines(
    tier_df: DataFrame,
    tier: str,
    prefix: str = "logtrics",
    gauge_float: bool = False,
    timer_duration_unit: float = 1.0,
) -> DataFrame:
    """Tier rows -> one ``path value epoch`` line per reported field.

    Per kind, only the fields whose source column exists in ``tier_df``
    are emitted (e.g. EWMA rates appear once ``meter_ewma`` ran; for
    counters ``cum_sum`` — the reference's never-reset running total —
    is preferred over the per-window ``sum`` delta when present).
    ``gauge_float=True`` formats gauge values as %.6f for non-integer
    gauge streams; the reference's gauges are int64
    (graphite/graphite.go:115-125), hence the %d default.
    ``timer_duration_unit`` divides timer duration fields before
    formatting — the reference reports ns timers in seconds
    (DurationUnit=time.Second, graphite/graphite.go:71), so a pipeline
    whose timer values are nanoseconds passes 1e9; the default 1.0
    reports values in their stored unit.
    """
    cols = set(tier_df.columns)
    secs = tier_seconds(tier)
    epoch = (F.unix_timestamp("window_start").cast("long") + F.lit(secs)).cast("long")
    path = F.concat_ws(".", F.lit(prefix), F.col("source"), F.col("metric"))

    per_kind = []
    for kind, fields in _KIND_FIELDS.items():
        seen = set()
        exprs = []
        for suffix, col, fmt in fields:
            if col not in cols or suffix in seen:
                continue
            seen.add(suffix)
            if kind == "gauge" and gauge_float:
                fmt = _f
            value: Column | str = col
            if (
                kind == "timer"
                and timer_duration_unit != 1.0
                and suffix in _TIMER_DURATION_FIELDS
            ):
                value = F.col(col).cast("double") / F.lit(float(timer_duration_unit))
            exprs.append(
                F.format_string(
                    "%s.%s %s %s",
                    path,
                    F.lit(suffix),
                    fmt(value),
                    F.format_string("%d", epoch),
                )
            )
        if exprs:
            per_kind.append((kind, F.array(*exprs)))

    if not per_kind:
        # tier_df carries none of the mapped value columns: no field can
        # be emitted for ANY kind — return an empty lines frame rather
        # than exploding a null literal (which raises at analysis time)
        return tier_df.sparkSession.createDataFrame([], "line string")
    lines_array = None
    for kind, arr in per_kind:
        lines_array = (
            F.when(F.col("kind") == kind, arr)
            if lines_array is None
            else lines_array.when(F.col("kind") == kind, arr)
        )
    # unknown kinds produce no lines (null array -> explode drops row)
    return tier_df.select(F.explode(lines_array).alias("line"))


def send_graphite_tcp(
    lines_df: DataFrame, host: str, port: int, timeout_s: float = 10.0
) -> None:
    """Ship lines to a Graphite plaintext listener, socket-per-partition.

    Executor-side: each partition opens one TCP connection and streams
    its lines (the reference holds one connection per flusher,
    graphite/graphite.go:61-64; per-partition is the distributed
    equivalent).  Driver never materializes the data.
    """

    def send_partition(rows) -> None:
        import socket

        sock = None
        try:
            for row in rows:
                if sock is None:  # connect lazily: empty partitions stay silent
                    sock = socket.create_connection((host, port), timeout=timeout_s)
                sock.sendall((row["line"] + "\n").encode("utf-8"))
        finally:
            if sock is not None:
                sock.close()

    lines_df.foreachPartition(send_partition)


def graphite_batch_sink(
    tier: str,
    host: str | None = None,
    port: int | None = None,
    prefix: str = "logtrics",
    debug: bool = False,
    debug_limit: int = 50,
):
    """foreachBatch adapter: format tier rows, optionally emit over TCP,
    and honor ``graphite.debug`` (K3) by logging the snapshot — the
    reference's goMetrics.Log side-channel (graphite/graphite.go:75-83).
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        lines = to_graphite_lines(batch_df, tier, prefix=prefix)
        if debug:
            snapshot = [r["line"] for r in lines.limit(debug_limit).collect()]
            for ln in snapshot:
                logger.debug("graphite batch=%s %s", batch_id, ln)
        if host is not None and port is not None:
            send_graphite_tcp(lines, host, port)

    return sink
