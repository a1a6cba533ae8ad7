"""Streaming meter EWMA — the custom stateful operator the built-in
windowed aggregates can't express (A4 cross-window state).

Batch EWMA (operators/ewma.py) folds a whole series at once; this is
the incremental analog: ``applyInPandasWithState`` keeps one float per
(series, horizon) in the state store and folds each micro-batch's
closed tier windows into it, so a long-running deployment never
re-reads history.

Composition (one stateful operator per query — Spark does not allow an
arbitrary stateful op downstream of a streaming aggregation in the
same query):

    point stream -> rollup_stream/write_tier_stream -> tier store
    tier store (readStream) -> meter_ewma_stream -> EWMA rows

i.e. the tier table is the continuous-aggregate hand-off between the
two streaming queries — exactly how a downstream stateful consumer
reads a continuously-maintained rollup in production.

Ordering contract: windows must arrive in non-decreasing window_start
order per series (true for the append-mode tier sink, whose emissions
follow the watermark).  Within a micro-batch rows are sorted; ACROSS
batches the state store carries the fold forward.  The recurrence and
alphas are identical to operators/ewma.py::ewma_oracle (pinned by
tests/test_streaming_ewma.py).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from logtrics_spark.operators.rollup import KEY, tier_seconds

HORIZONS_MIN = [1, 5, 15]


def _out_schema(horizons: list[int]) -> T.StructType:
    return T.StructType(
        [
            T.StructField("source", T.StringType()),
            T.StructField("metric", T.StringType()),
            T.StructField("kind", T.StringType()),
            T.StructField("window_start", T.TimestampType()),
            T.StructField("cnt", T.LongType()),
            T.StructField("rate", T.DoubleType()),
        ]
        + [T.StructField(f"rate_m{h}", T.DoubleType()) for h in horizons]
    )


_STATE_SCHEMA = T.StructType([T.StructField("emas", T.ArrayType(T.DoubleType()))])


def meter_ewma_stream(
    tier_rows: DataFrame, tier: str, horizons_min: list[int] | None = None
) -> DataFrame:
    """Streaming tier rows -> per-window EWMA rates with carried state.

    ``tier_rows`` is a STREAMING DataFrame of tier-table rows (at least
    KEY + window_start + cnt).  Returns an append-mode streaming
    DataFrame with the same columns as the batch ``meter_ewma``.
    """
    horizons = horizons_min or HORIZONS_MIN
    secs = tier_seconds(tier)
    alphas = [1.0 - math.exp(-secs / (h * 60.0)) for h in horizons]
    out_schema = _out_schema(horizons)

    def fold(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if not len(pdf):
            return
        pdf = pdf.sort_values("window_start", kind="stable")
        emas: list[float | None]
        if state.exists:
            (stored,) = state.get
            emas = list(stored)
        else:
            emas = [None] * len(horizons)
        inst = pdf["cnt"].to_numpy(dtype="float64") / float(secs)
        out_cols: dict[str, list[float]] = {f"rate_m{h}": [] for h in horizons}
        for r in inst:
            for j, (h, a) in enumerate(zip(horizons, alphas)):
                prev = emas[j]
                emas[j] = r if prev is None else a * r + (1 - a) * prev
                out_cols[f"rate_m{h}"].append(emas[j])
        out = pd.DataFrame(
            {
                "source": key[0],
                "metric": key[1],
                "kind": key[2],
                "window_start": pdf["window_start"].values,
                "cnt": pdf["cnt"].values,
                "rate": inst,
            }
        )
        for name, vals in out_cols.items():
            out[name] = vals
        state.update(([float(e) for e in emas],))
        yield out

    return (
        tier_rows.select(*KEY, "window_start", "cnt")
        .groupBy(*KEY)
        .applyInPandasWithState(
            fold, out_schema, _STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )
