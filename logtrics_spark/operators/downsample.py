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
    """Pure-numpy fold: indices of the selected points.

    ``xs`` strictly increasing, ``ys`` finite; returns sorted indices,
    always including 0 and len-1 when n >= 2.

    Bucket arithmetic follows the thesis pseudocode EXACTLY
    (Steinarsson 2013, §4.2: ``every = (n-2)/(threshold-2)``, bucket i
    spans ``[floor(i*every)+1, floor((i+1)*every)+1)``, the averaging
    range of the next bucket is the i+1 span with its end clamped to
    n) so an independent plain-Python port of the same published
    definition selects the identical indices — that is what makes the
    driver's side-channel oracle for ``lttb_1m`` a real cross-check
    rather than a shared-code tautology.  The next-bucket averages are
    accumulated SEQUENTIALLY (builtin ``sum`` over the slice — IEEE
    left-to-right adds, the order the scalar pseudocode implies): the
    earlier ``.mean()`` used numpy's pairwise summation, whose
    different rounding flips the argmax on flat and step-valued series
    (ties everywhere), which a differential test against the
    plain-Python port now pins.
    """
    n = len(xs)
    if n_out >= n:
        return list(range(n))
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    xs = np.asarray(xs, dtype="float64")
    ys = np.asarray(ys, dtype="float64")
    every = (n - 2) / (n_out - 2)
    # edges[i] = floor(i*every) + 1 for i in 0..n_out-2 (so edges[0]=1,
    # edges[n_out-2]=n-1), plus the clamped end of the final averaging
    # range; i*every is the same float64 product the scalar pseudocode
    # computes, so the floors agree bit-for-bit with a plain-Python port
    edges = (np.arange(n_out - 1, dtype="float64") * every).astype("int64") + 1
    edges = np.append(edges, min(int((n_out - 1) * every) + 1, n))
    selected = [0]
    prev = 0
    for b in range(n_out - 2):
        lo, hi = edges[b], edges[b + 1]
        nxt_lo, nxt_hi = edges[b + 1], min(edges[b + 2], n)
        span = int(nxt_hi - nxt_lo)
        # sequential (left-to-right) accumulation — see docstring
        cx = sum(xs[nxt_lo:nxt_hi]) / span
        cy = sum(ys[nxt_lo:nxt_hi]) / span
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
