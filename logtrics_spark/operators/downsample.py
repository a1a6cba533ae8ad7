"""LTTB downsampling — visually-faithful series reduction for dashboards.

Largest-Triangle-Three-Buckets (Steinarsson, "Downsampling Time Series
for Visual Representation", MSc thesis, U. Iceland 2013 — the public
algorithm Grafana/InfluxDB-family tools use): keep the first and last
points, split the rest into ``n_out - 2`` equal buckets, and from each
bucket keep the point forming the largest triangle with the previously
kept point and the NEXT bucket's centroid.  Unlike the tier rollups
(which average structure away), LTTB preserves the visual extremes —
spikes survive at any zoom level.

This complements the tier ladder: tiers bound STORAGE, LTTB bounds the
POINTS PER CHART — a dashboard fetches ~2k points per series no matter
how wide the time range is.

Execution shape: the selection is sequential per series, so it runs as
one ``applyInPandas`` group per series (the Gorilla/Holt-Winters
pattern) — numpy inside, groups tier-sized, series fan out across
tasks.  Null values are dropped before selection (they carry no visual
information and would poison the triangle areas).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from logtrics_spark.operators.rollup import KEY


def lttb_fold(xs, ys, n_out: int):
    """Pure-numpy reference: indices of the selected points.

    ``xs`` strictly increasing, ``ys`` finite; returns sorted indices,
    always including 0 and len-1 when n >= 2.
    """
    n = len(xs)
    if n_out >= n:
        return list(range(n))
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    xs = np.asarray(xs, dtype="float64")
    ys = np.asarray(ys, dtype="float64")
    # bucket boundaries over the interior points [1, n-1)
    edges = np.linspace(1, n - 1, n_out - 1).astype("int64")
    selected = [0]
    prev = 0
    for b in range(n_out - 2):
        lo, hi = edges[b], edges[b + 1]
        nxt_lo, nxt_hi = edges[b + 1], (edges[b + 2] if b + 2 < len(edges) else n)
        if nxt_hi <= nxt_lo:
            nxt_lo, nxt_hi = hi - 1, hi
        cx = xs[nxt_lo:nxt_hi].mean() if nxt_hi > nxt_lo else xs[hi - 1]
        cy = ys[nxt_lo:nxt_hi].mean() if nxt_hi > nxt_lo else ys[hi - 1]
        # triangle area with apex at each candidate in [lo, hi)
        ax, ay = xs[prev], ys[prev]
        areas = np.abs(
            (ax - cx) * (ys[lo:hi] - ay) - (ax - xs[lo:hi]) * (cy - ay)
        )
        prev = lo + int(np.argmax(areas))
        selected.append(prev)
    selected.append(n - 1)
    return selected


def lttb(
    tier_df: DataFrame,
    value_col: str,
    n_out: int,
    key: list[str] | None = None,
) -> DataFrame:
    """Keep ~``n_out`` visually-representative rows per series.

    Output: key + window_start + value_col, the selected subset in
    window order.  Series with <= n_out non-null points pass through
    unchanged.
    """
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    key = key or KEY

    in_fields = {f.name: f for f in tier_df.schema.fields}
    out_cols = [*key, "window_start", value_col]
    out_schema = T.StructType(
        [T.StructField(c, in_fields[c].dataType) for c in key]
        + [
            T.StructField("window_start", T.TimestampType()),
            T.StructField(value_col, T.DoubleType()),
        ]
    )

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = (
            pdf.dropna(subset=[value_col])
            .sort_values("window_start", kind="stable")
            .reset_index(drop=True)
        )
        if not len(pdf):
            return pdf[out_cols]
        xs = pdf["window_start"].astype("datetime64[s]").astype("int64").to_numpy()
        ys = pdf[value_col].astype("float64").to_numpy()
        idx = lttb_fold(xs, ys, n_out)
        return pdf.iloc[idx][out_cols]

    return (
        tier_df.select(*key, "window_start", value_col)
        .groupBy(*key)
        .applyInPandas(pick, out_schema)
    )
