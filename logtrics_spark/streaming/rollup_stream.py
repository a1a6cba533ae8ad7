"""Streaming analog of the reference's interval flush (K1).

The reference ticks every ``interval`` seconds and pushes the registry
snapshot (/root/reference/graphite/graphite.go:84-98).  The Structured
Streaming analog is a watermarked tumbling-window aggregation over an
unbounded point stream, emitted per trigger:

    readStream -> [extract] -> withWatermark(ts) ->
    groupBy(keys, window(ts, tier)) -> agg -> foreachBatch(tier store)

Unlike the reference (which has NO event-time and loses late data by
construction), the watermark gives bounded-lateness semantics: windows
close once the watermark passes window_end + delay, and the state store
evicts them — bounded memory at any stream length.

Sinks write through the same ParquetTableIO layout as the batch job, so
a streaming deployment and a batch backfill produce interchangeable
tier tables (the continuous-aggregate pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logtrics_spark.operators.rollup import KEY, tier_seconds

TIER_INTERVAL = {"1m": "1 minute", "5m": "5 minutes", "1h": "1 hour", "1d": "1 day"}


def rollup_stream(
    points: DataFrame,
    tier: str,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming points -> per-window aggregates (append-mode compatible).

    Only fully-composable aggregates (streaming state supports partial
    merge): cnt/sum/min/max + avg derived at emit.  Gauge-last and
    percentiles need the batch path or a custom stateful op.
    """
    secs = tier_seconds(tier)
    agg = (
        points.withWatermark(ts_col, watermark)
        .groupBy(*KEY, F.window(ts_col, TIER_INTERVAL[tier]).alias("w"))
        .agg(
            F.count("value").alias("cnt"),
            F.sum("value").alias("sum"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
            # gauge-last composes in streaming state too (max_by partials
            # merge), keeping the emitted schema identical to the batch
            # rollup so the tier tables are genuinely interchangeable
            F.max_by("value", ts_col).alias("last"),
            F.max(ts_col).alias("last_ts"),
            # sum of squares composes in streaming state like any sum —
            # stddev derives at emit, keeping batch/stream schema parity
            F.sum(F.col("value") * F.col("value")).alias("sum_sq"),
        )
    )
    from logtrics_spark.operators.rollup import stddev_from_moments

    return agg.select(
        *KEY,
        F.col("w.start").alias("window_start"),
        "cnt",
        "sum",
        "min",
        "max",
        (F.col("sum") / F.col("cnt")).alias("avg"),
        "last",
        "last_ts",
        "sum_sq",
        (F.col("cnt").cast("double") / F.lit(float(secs))).alias("rate"),
        stddev_from_moments("cnt", "sum", "sum_sq").alias("stddev"),
    )


def write_tier_stream(
    tier_agg: DataFrame,
    store_root: str,
    tier: str,
    checkpoint_dir: str,
    trigger_available_now: bool = False,
    processing_time: str | None = None,
):
    """Start the sink: foreachBatch appends into the batch store layout.

    Layout parity: rows carry ``tier`` as a literal column and land via
    the IDENTICAL ``["tier", "day"]`` partition spec the batch pipeline
    uses (plans/pipeline.py), with ``source`` as a data column — a store
    written by both paths reads back through ``RollupJob.read_tier``
    with one schema.  (Round 1 partitioned by [day, source] under a
    tier=X prefix, which made ``source`` a partition directory in
    stream-written days and a data column in batch-written ones.)

    Delivery: foreachBatch is AT-LEAST-ONCE — a batch retried after a
    partial failure re-appends its rows.  Each append-mode emission is a
    closed window computed deterministically, so retries duplicate
    byte-identical rows; read with ``dedupe_tier_rows`` (or any
    dropDuplicates over the series+window key) when exactly-once reads
    matter.  The Iceberg/Delta backend upgrade is idempotent MERGE keyed
    on (tier, source, metric, kind, window_start).

    Returns the StreamingQuery; caller owns awaitTermination/stop.
    """
    from logtrics_spark.plans.pipeline import _day
    from logtrics_spark.storage.tableio import ParquetTableIO

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        io = ParquetTableIO(batch_df.sparkSession, store_root)
        out = batch_df.withColumn("day", _day("window_start")).withColumn(
            "tier", F.lit(tier)
        )
        io.write_partitioned(out, "tiers", ["tier", "day"], overwrite_dynamic=False)

    writer = (
        tier_agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def dedupe_tier_rows(tier_df: DataFrame) -> DataFrame:
    """Collapse at-least-once replays from the streaming sink.

    Duplicates are byte-identical (deterministic aggregates over the
    same closed window), so dropDuplicates over the series+window key is
    exact, not lossy.
    """
    return tier_df.dropDuplicates(["source", "metric", "kind", "window_start"])
