"""Single-node pure-pandas oracle for the rollup pipeline (SURVEY.md §5.2).

Computes golden tier tables from the generated token table with plain
pandas — never Spark — reproducing the reference's fold semantics:
counter=sum of incs, gauge=last-wins, timer=count/min/max/mean+percentiles,
meter=mark count (graphite/graphite.go:101-151).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

EPOCH = pd.Timestamp("2024-01-01 00:00:00")
KINDS = [
    ("tok.n_tok.count", "counter"),
    ("tok.n_tok.last", "gauge"),
    ("tok.n_tok.time", "timer"),
    ("tok.docs.rate", "meter"),
]


def points_oracle(tok: pd.DataFrame, per_source: bool = False, step_seconds: int = 1) -> pd.DataFrame:
    seq = tok["doc_id"].str[3:].astype("int64")
    if per_source:
        rank = seq.groupby(tok["source"]).rank(method="first").astype("int64") - 1
    else:
        rank = seq
    ts = EPOCH + pd.to_timedelta(rank * step_seconds, unit="s")
    frames = []
    for metric, kind in KINDS:
        frames.append(
            pd.DataFrame(
                {
                    "source": tok["source"],
                    "metric": metric,
                    "kind": kind,
                    "ts": ts,
                    "value": (
                        pd.Series(1, index=tok.index)
                        if kind == "meter"
                        else tok["n_tok"]
                    ).astype("int64"),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def rollup_oracle(points: pd.DataFrame, tier_secs: int) -> pd.DataFrame:
    df = points.copy()
    epoch_s = df["ts"].astype("int64") // 10**9
    df["window_start"] = pd.to_datetime((epoch_s // tier_secs) * tier_secs, unit="s")
    df = df.sort_values("ts", kind="stable")
    g = df.groupby(["source", "metric", "kind", "window_start"], sort=False)
    out = g["value"].agg(cnt="count", sum="sum", min="min", max="max", avg="mean")
    out["last"] = g["value"].last()
    out["last_ts"] = g["ts"].max()
    out["sum_sq"] = g["value"].apply(lambda v: float((v.astype("float64") ** 2).sum()))
    out["rate"] = out["cnt"] / float(tier_secs)
    # sample stddev from moments (rollup.stddev_from_moments semantics)
    var = (out["sum_sq"] - out["sum"] ** 2 / out["cnt"]) / (out["cnt"] - 1)
    out["stddev"] = np.where(out["cnt"] > 1, np.sqrt(var.clip(lower=0.0)), 0.0)
    return out.reset_index()


def percentiles_oracle(points: pd.DataFrame, tier_secs: int) -> pd.DataFrame:
    """Exact linear-interpolation percentiles, matching Spark `percentile`."""
    df = points[points["kind"] == "timer"].copy()
    epoch_s = df["ts"].astype("int64") // 10**9
    df["window_start"] = pd.to_datetime((epoch_s // tier_secs) * tier_secs, unit="s")
    rows = []
    for key, grp in df.groupby(["source", "metric", "kind", "window_start"]):
        v = grp["value"].to_numpy(dtype="float64")
        qs = np.quantile(v, [0.5, 0.75, 0.95, 0.99, 0.999], method="linear")
        std = float(np.std(v, ddof=1)) if len(v) > 1 else 0.0
        rows.append((*key, len(v), *qs, std))
    return pd.DataFrame(
        rows,
        columns=["source", "metric", "kind", "window_start", "cnt", "p50", "p75", "p95", "p99", "p999", "stddev"],
    )


def cumulative_oracle(tier: pd.DataFrame) -> pd.DataFrame:
    df = tier.sort_values("window_start", kind="stable").copy()
    df["cum_sum"] = df.groupby(["source", "metric", "kind"])["sum"].cumsum()
    return df
