"""Streaming rolling z-score — live anomaly flags over the tier stream.

The batch ``operators/series.py::zscore`` scores each slot against its
series' trailing time-range statistics; this is the incremental analog
for a long-running deployment: ``applyInPandasWithState`` keeps the
in-window (epoch, value) slots per series in the state store, prunes
them as the window slides, and scores every incoming closed tier window
on arrival — the alert path a log-monitoring daemon (the reference's
domain) runs against its own metrics.

Composition mirrors ``ewma_stream``: one stateful operator per query,
fed from the continuously-maintained tier table (the ``alerts`` CLI resolves snapshot-flush stores
latest-wins before scoring, so daemon stores go through it):

    point stream -> rollup_stream/write_tier_stream -> tier store
    tier store (readStream) -> zscore_stream -> scored rows

Ordering contract (same as ewma_stream): windows arrive in
non-decreasing window_start order per series (true for the append-mode
tier sink).  Within a micro-batch rows are sorted; across batches the
state store carries the trailing window forward.  NOT suitable over
the daemon's snapshot-flush store: that layout re-emits every window
per flush_seq (latest-wins), violating the monotonic-arrival contract
— score a daemon store with the batch ``operators/series.py::zscore``
via ``python -m logtrics_spark alerts`` instead.

Semantics are pinned to the batch operator by test: same trailing
RANGE frame [ws - window + 1, ws] inclusive of the current slot, same
sample stddev (ddof=1), same null result for <2 samples, effectively-
constant windows (sd <= min_stddev), or NaN-poisoned windows.

State size: one (long, double) pair per in-window slot per series —
bounded by window_seconds / tier_seconds (e.g. 60 slots for a 1h
window over a 1m tier), never by stream length.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from logtrics_spark.operators.rollup import KEY

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ws", T.ArrayType(T.LongType())),
        T.StructField("vals", T.ArrayType(T.DoubleType())),
    ]
)


def _out_schema(value_col: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField("source", T.StringType()),
            T.StructField("metric", T.StringType()),
            T.StructField("kind", T.StringType()),
            T.StructField("window_start", T.TimestampType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField("z", T.DoubleType()),
        ]
    )


def zscore_stream(
    tier_rows: DataFrame,
    value_col: str = "avg",
    window_seconds: int = 3600,
    min_stddev: float = 1e-9,
) -> DataFrame:
    """Streaming tier rows -> per-window rolling z-scores with carried
    state.  ``tier_rows`` is a STREAMING DataFrame of tier-table rows
    (at least KEY + window_start + ``value_col``); returns an
    append-mode stream matching the batch ``zscore`` row for row.
    """
    if window_seconds <= 0:
        raise ValueError(f"window_seconds must be positive, got {window_seconds}")
    out_schema = _out_schema(value_col)

    def fold(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if not len(pdf):
            return
        pdf = pdf.sort_values("window_start", kind="stable")
        if state.exists:
            prev_ws, prev_vals = state.get
            prev_ws = np.asarray(prev_ws, dtype=np.int64)
            prev_vals = np.asarray(prev_vals, dtype=np.float64)
        else:
            prev_ws = np.empty(0, dtype=np.int64)
            prev_vals = np.empty(0, dtype=np.float64)
        epochs = (
            pdf["window_start"].astype("datetime64[s]").astype("int64").to_numpy()
        )
        series_vals = pdf[value_col].astype("float64").to_numpy()

        # Vectorized trailing-window stats: all window sums come from
        # prefix sums over the (carried state ++ batch) arrays; each new
        # slot's window is [searchsorted(ws_i - W + 1), slot] since ws
        # is nondecreasing.  NaN samples are excluded from the prefix
        # sums and tracked by a prefix COUNT instead — a plain cumsum
        # would let one NaN poison every later window even after the
        # NaN slot slides out.  Values are shifted by the array mean
        # before squaring so the (sum_sq - sum^2/n) variance stays
        # well-conditioned (variance is shift-invariant).
        all_ws = np.concatenate([prev_ws, epochs])
        all_vals = np.concatenate([prev_vals, series_vals])
        k = len(epochs)
        m = len(prev_ws)
        nan_mask = np.isnan(all_vals)
        finite = all_vals[~nan_mask]
        shift = finite.mean() if len(finite) else 0.0
        shifted = np.where(nan_mask, 0.0, all_vals - shift)
        cs = np.concatenate([[0.0], np.cumsum(shifted)])
        cs2 = np.concatenate([[0.0], np.cumsum(shifted * shifted)])
        cbad = np.concatenate([[0], np.cumsum(nan_mask)])
        lo = np.searchsorted(all_ws, epochs - window_seconds + 1, side="left")
        hi = m + np.arange(k) + 1  # exclusive end: each new slot itself
        n = hi - lo
        with np.errstate(invalid="ignore", divide="ignore"):
            s = cs[hi] - cs[lo]
            s2 = cs2[hi] - cs2[lo]
            # clamp: rounding can leave a tiny negative where the true
            # variance is 0 (constant window) — the sd<=min_stddev null
            # guard must still fire, not sqrt(-eps)=NaN
            var = np.maximum((s2 - s * s / n) / (n - 1), 0.0)
            sd = np.sqrt(var)
            z = ((series_vals - shift) - s / n) / sd
        null = (
            (n < 2)
            | ((cbad[hi] - cbad[lo]) > 0)
            | np.isnan(sd)
            | (sd <= min_stddev)
        )
        z_out = pd.Series(z).astype("Float64")
        z_out[null] = pd.NA
        out = pd.DataFrame(
            {
                "source": key[0],
                "metric": key[1],
                "kind": key[2],
                "window_start": pdf["window_start"].values,
                value_col: series_vals,
                # nullable Float64 so None stays a true null through
                # Arrow (a float64 ndarray would turn None into NaN,
                # which Spark treats as a value, not null)
                "z": z_out.values,
            }
        )
        # carried state = the last slot's trailing window
        keep = int(np.searchsorted(all_ws, epochs[-1] - window_seconds + 1, side="left"))
        state.update((all_ws[keep:].tolist(), all_vals[keep:].tolist()))
        yield out

    return (
        tier_rows.select(*KEY, "window_start", value_col)
        .groupBy(*KEY)
        .applyInPandasWithState(
            fold, out_schema, _STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )
