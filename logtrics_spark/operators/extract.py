"""N1 — metric-point extraction from the token table.

The reference's pipeline per event is: regex gate -> named captures ->
Lua handler mutates named metrics (/root/reference/logtrics.go:176-202).
Here the "handler" is a vectorized stage over Arrow batches that turns
each token-table row into metric points:

    (source, metric, kind, ts, value)

with kinds mirroring /root/reference/graphite/graphite.go:27-49:
    counter  tok.n_tok.count   inc(n_tok)    (cumulative across windows)
    gauge    tok.n_tok.last    update(n_tok) (last value wins)
    timer    tok.n_tok.time    update(n_tok) (histogram/percentiles)
    meter    tok.docs.rate     mark(1)       (event-rate)

Timestamp derivation ("timestamped via doc_id ordering", BASELINE.json):
the canonical mode derives ts arithmetically from the doc_id's numeric
suffix — doc ids are dense and globally ordered, so this IS doc_id order
and costs zero shuffles at any scale.  ``per_source=True`` instead ranks
rows within each source (row_number window) — semantically "per-source
ordering" at the cost of one sort per source partition; offered because
the north star says "keyed by source".

Scale notes:
- the huge ``tokens`` column is pruned *before* any Python boundary —
  extraction selects only (doc_id, n_tok, source), so Arrow never ships
  token arrays.  Verify with .explain(): ReadSchema excludes tokens.
- the native path is pure Catalyst (explode of a literal struct array)
  and stays inside WholeStageCodegen; the arrow path exists to host
  user-programmable handlers (Engine.rule) per the north rule.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

EPOCH_START = "2024-01-01 00:00:00"  # UTC anchor for derived timestamps

POINT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("metric", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("value", T.LongType(), False),
    ]
)

KINDS = [
    ("tok.n_tok.count", "counter"),
    ("tok.n_tok.last", "gauge"),
    ("tok.n_tok.time", "timer"),
    ("tok.docs.rate", "meter"),
]


def with_ts(df: DataFrame, per_source: bool = False, step_seconds: int = 1) -> DataFrame:
    """Derive event-time from doc_id ordering (epoch anchor + rank*step)."""
    seq = F.substring("doc_id", 4, 12).cast("long")
    if per_source:
        w = Window.partitionBy("source").orderBy(seq)
        rank = F.row_number().over(w).cast("long") - F.lit(1)
    else:
        rank = seq
    # pure long arithmetic: epoch anchor (constant-folded) + rank*step.
    # The make_interval form costs a per-row decimal multiply+add — at
    # 48M rows that was a measurable chunk of the extraction stage.
    base = F.unix_timestamp(F.to_timestamp(F.lit(EPOCH_START)))
    ts = F.timestamp_seconds(base + rank * F.lit(int(step_seconds)))
    return df.withColumn("ts", ts)


def extract_points(
    df: DataFrame, per_source: bool = False, step_seconds: int = 1
) -> DataFrame:
    """Native path: token row -> 4 metric points via explode (no Python).

    Column-prunes tokens out of the scan; stays in codegen end-to-end.
    """
    slim = df.select("doc_id", "n_tok", "source")
    slim = with_ts(slim, per_source=per_source, step_seconds=step_seconds)
    v = F.col("n_tok").cast("long")
    one = F.lit(1).cast("long")
    points = F.array(
        *[
            F.struct(
                F.lit(m).alias("metric"),
                F.lit(k).alias("kind"),
                (one if k == "meter" else v).alias("value"),
            )
            for m, k in KINDS
        ]
    )
    return (
        slim.select("source", "ts", F.explode(points).alias("p"))
        .select("source", "p.metric", "p.kind", "ts", "p.value")
    )


def extract_points_arrow(
    df: DataFrame, per_source: bool = False, step_seconds: int = 1
) -> DataFrame:
    """Arrow-UDF path: same semantics via mapInPandas (the programmable
    analog of the reference's Lua handler; per BASELINE.json no per-row
    Python — this is batch-vectorized pandas over Arrow).
    """
    slim = df.select("doc_id", "n_tok", "source")
    slim = with_ts(slim, per_source=per_source, step_seconds=step_seconds)

    def handler(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            frames = []
            for metric, kind in KINDS:
                frames.append(
                    pd.DataFrame(
                        {
                            "source": pdf["source"],
                            "metric": metric,
                            "kind": kind,
                            "ts": pdf["ts"],
                            "value": (
                                pd.Series(1, index=pdf.index)
                                if kind == "meter"
                                else pdf["n_tok"]
                            ).astype("int64"),
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return slim.select("source", "n_tok", "ts").mapInPandas(handler, POINT_SCHEMA)
