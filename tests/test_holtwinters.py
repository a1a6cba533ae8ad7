"""Holt-Winters seasonal analysis (operators/holtwinters.py).

The Spark applyInPandas fold must equal the pure-Python reference fold
exactly, and the analysis must flag a planted off-season spike while
keeping a clean periodic series inside its bands after warm-up.
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta, timezone

import pandas as pd
import pytest

from logtrics_spark.operators.holtwinters import holt_winters, holt_winters_fold

BASE = datetime(2024, 1, 1, tzinfo=timezone.utc).replace(tzinfo=None)


def _tier(spark, values, tier_secs=3600):
    rows = [
        ("s", "m", "gauge", BASE + timedelta(seconds=i * tier_secs),
         None if v is None else float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows,
        "source string, metric string, kind string, "
        "window_start timestamp, avg double",
    )


def _seasonal(n, period=24):
    return [10 + 5 * math.sin(2 * math.pi * i / period) for i in range(n)]


def test_spark_fold_matches_reference(spark):
    vals = _seasonal(24 * 5)
    vals[70] = 40.0  # planted spike
    vals[30] = None  # a missing sample
    df = _tier(spark, vals)
    got = (
        holt_winters(df, "1h", season_seconds=86400)
        .toPandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    exp_f, exp_d = holt_winters_fold(vals, 24)
    for i in range(len(vals)):
        gf, gd = got["forecast"][i], got["dev"][i]
        if exp_f[i] is None:
            assert pd.isna(gf)
        else:
            assert gf == pytest.approx(exp_f[i], abs=1e-9)
        if exp_d[i] is None:
            assert pd.isna(gd)
        else:
            assert gd == pytest.approx(exp_d[i], abs=1e-9)


def test_aberration_flags_spike_not_baseline(spark):
    vals = _seasonal(24 * 6)
    spike_at = 24 * 5 + 3
    vals[spike_at] = 60.0
    df = _tier(spark, vals)
    got = (
        holt_winters(df, "1h", season_seconds=86400, delta=3.0)
        .toPandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    # after two warm-up seasons the clean periodic slots sit inside the
    # bands; the spike escapes decisively
    settled = got.iloc[48:].reset_index(drop=True)
    ab = settled["aberration"]
    idx = spike_at - 48
    assert ab[idx] > 10.0
    clean = ab.drop(index=idx).abs()
    assert (clean < 2.0).all(), clean.max()


def test_null_samples_carry_forecast_without_state_update(spark):
    vals = [10.0, 12.0, None, 14.0, 10.0, 12.0, 11.0, 13.0]
    f_with_none, _ = holt_winters_fold(vals, 4)
    filled = [10.0, 12.0, 99.0, 14.0, 10.0, 12.0, 11.0, 13.0]
    f_filled, _ = holt_winters_fold(filled, 4)
    # the None slot still produces a forecast...
    assert f_with_none[2] is not None
    # ...but later forecasts differ from the poisoned-fill run: the
    # None did NOT update state with a fake observation
    assert f_with_none[4] != pytest.approx(f_filled[4])


def test_validation(spark):
    df = _tier(spark, [1.0, 2.0])
    with pytest.raises(ValueError):
        holt_winters(df, "1h", season_seconds=5400)  # not a tier multiple
    with pytest.raises(ValueError):
        holt_winters(df, "1h", season_seconds=3600)  # 1-slot season
    # irregular spacing must raise inside the fold
    import pyspark

    gappy = _tier(spark, [1.0, 2.0, 3.0]).where("minute(window_start) != 0 or hour(window_start) != 1")
    with pytest.raises(Exception, match="dense|PythonException"):
        holt_winters(gappy, "1h", season_seconds=7200).collect()


def test_holt_winters_honors_custom_key(spark):
    """ADVICE r3: key=["source"] must drive grouping and output schema."""
    import pandas as _pd

    pdf = _pd.DataFrame(
        {
            "source": ["a"] * 12,
            "window_start": _pd.date_range("2024-01-01", periods=12, freq="h"),
            "avg": [float(i % 4) for i in range(12)],
        }
    )
    out = holt_winters(
        spark.createDataFrame(pdf), "1h", season_seconds=4 * 3600, key=["source"]
    ).orderBy("window_start")
    assert out.columns[:2] == ["source", "window_start"]
    rows = out.collect()
    assert len(rows) == 12 and rows[0]["forecast"] is None
