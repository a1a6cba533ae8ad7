from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from logtrics_spark.operators.asof import asof_join


@pytest.fixture()
def frames(spark):
    left = pd.DataFrame(
        {
            "source": ["a", "a", "a", "b", "b"],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:30", "2024-01-01 00:02:00", "2024-01-01 00:05:10",
                 "2024-01-01 00:00:10", "2024-01-01 00:03:00"]
            ),
            "ev": [1, 2, 3, 4, 5],
        }
    )
    right = pd.DataFrame(
        {
            "source": ["a", "a", "a", "b"],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:02:00", "2024-01-01 00:04:00",
                 "2024-01-01 00:01:00"]
            ),
            "gauge": [10.0, 20.0, 30.0, 40.0],
        }
    )
    return spark.createDataFrame(left), spark.createDataFrame(right), left, right


def test_asof_backward_semantics(spark, frames):
    sl, sr, left, right = frames
    got = (
        asof_join(sl, sr, by=["source"], value_cols=["gauge"])
        .toPandas()
        .sort_values(["source", "ts"])
        .reset_index(drop=True)
    )
    # a@00:30 -> 10 (00:00); a@02:00 -> 20 (exact match); a@05:10 -> 30
    # b@00:10 -> null (nothing before); b@03:00 -> 40
    assert list(got["gauge_asof"].fillna(-1)) == [10.0, 20.0, 30.0, -1, 40.0]


def test_asof_tolerance(spark, frames):
    sl, sr, _, _ = frames
    got = (
        asof_join(sl, sr, by=["source"], value_cols=["gauge"], tolerance_seconds=60)
        .toPandas()
        .sort_values(["source", "ts"])
        .reset_index(drop=True)
    )
    # a@00:30 within 60s of 00:00 -> 10; a@05:10 is 70s after 04:00 -> null
    assert list(got["gauge_asof"].fillna(-1)) == [10.0, 20.0, -1, -1, -1]


def test_asof_matches_duckdb(spark, frames):
    sl, sr, left, right = frames
    got = (
        asof_join(sl, sr, by=["source"], value_cols=["gauge"])
        .toPandas()
        .sort_values(["source", "ts"])
        .reset_index(drop=True)
    )
    ltbl, rtbl = left, right  # duckdb binds pandas frames by variable name
    exp = duckdb.sql(
        """
        SELECT l.source, l.ts, l.ev, r.gauge AS gauge_asof
        FROM ltbl l ASOF LEFT JOIN rtbl r
          ON l.source = r.source AND l.ts >= r.ts
        ORDER BY l.source, l.ts
        """
    ).df()
    assert (got["gauge_asof"].fillna(-1).to_numpy() == exp["gauge_asof"].fillna(-1).to_numpy()).all()


def test_asof_no_python_nodes(spark, frames):
    sl, sr, _, _ = frames
    plan = asof_join(sl, sr)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
