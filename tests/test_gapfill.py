from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from logtrics_spark.operators.gapfill import dense_spine, gapfill, interp_linear, locf


@pytest.fixture(scope="module")
def sparse_tier(spark):
    """A tiny 1m tier table with interior + boundary gaps."""
    rows = [
        # series A: slots at :00, :03, :04  (gaps :01, :02)
        ("web", "m", "gauge", "2024-01-01 00:00:00", 2, 10, 1, 9, 5.0, 9),
        ("web", "m", "gauge", "2024-01-01 00:03:00", 1, 40, 40, 40, 40.0, 40),
        ("web", "m", "gauge", "2024-01-01 00:04:00", 1, 50, 50, 50, 50.0, 50),
        # series B: single slot
        ("code", "m", "gauge", "2024-01-01 00:10:00", 1, 7, 7, 7, 7.0, 7),
    ]
    pdf = pd.DataFrame(
        rows, columns=["source", "metric", "kind", "window_start", "cnt", "sum", "min", "max", "avg", "last"]
    )
    pdf["window_start"] = pd.to_datetime(pdf["window_start"])
    return spark.createDataFrame(pdf)


def test_dense_spine(spark, sparse_tier):
    out = dense_spine(sparse_tier, "1m").toPandas().sort_values(["source", "window_start"])
    web = out[out.source == "web"]
    assert len(web) == 5  # :00..:04 inclusive
    assert web["cnt"].isna().sum() == 2  # the two gap slots
    code = out[out.source == "code"]
    assert len(code) == 1


def test_locf(spark, sparse_tier):
    out = locf(dense_spine(sparse_tier, "1m"), value_cols=["last", "sum"]).toPandas()
    web = out[out.source == "web"].sort_values("window_start")
    assert list(web["last"]) == [9, 9, 9, 40, 50]
    assert list(web["sum"]) == [10, 10, 10, 40, 50]
    # cnt untouched (not in value_cols) -> still null at gaps
    assert web["cnt"].isna().sum() == 2


def test_linear_interp(spark, sparse_tier):
    out = interp_linear(dense_spine(sparse_tier, "1m"), value_cols=["last"]).toPandas()
    web = out[out.source == "web"].sort_values("window_start")
    # 9 at :00, 40 at :03 -> :01 = 9 + 31/3, :02 = 9 + 62/3
    exp = [9.0, 9 + 31 / 3, 9 + 62 / 3, 40.0, 50.0]
    assert all(math.isclose(a, b, rel_tol=1e-12) for a, b in zip(web["last"], exp))


def test_linear_boundary_stays_null(spark):
    pdf = pd.DataFrame(
        {
            "source": ["web"] * 2,
            "metric": ["m"] * 2,
            "kind": ["gauge"] * 2,
            "window_start": pd.to_datetime(["2024-01-01 00:01:00", "2024-01-01 00:03:00"]),
            "cnt": [1, 1],
            "sum": [1, 3],
            "min": [1, 3],
            "max": [1, 3],
            "avg": [1.0, 3.0],
            "last": [1, 3],
        }
    )
    df = spark.createDataFrame(pdf)
    # spine covers :01..:03; make a wider frame manually with nulls outside
    dense = dense_spine(df, "1m")
    out = interp_linear(dense, value_cols=["last"]).toPandas().sort_values("window_start")
    assert list(out["last"]) == [1.0, 2.0, 3.0]


def test_gapfill_method_validation(spark, sparse_tier):
    with pytest.raises(ValueError):
        gapfill(sparse_tier, "1m", method="cubic")


def test_gapfill_matches_duckdb_oracle(spark, sparse_tier):
    """Cross-check locf against an independent DuckDB window-fn oracle."""
    import duckdb

    got = (
        gapfill(sparse_tier, "1m", method="locf", value_cols=["last"])
        .select("source", "window_start", "last")
        .toPandas()
        .sort_values(["source", "window_start"])
        .reset_index(drop=True)
    )
    src = sparse_tier.select("source", "window_start", "last").toPandas()
    exp = duckdb.sql(
        """
        WITH bounds AS (
          SELECT source, min(window_start) mn, max(window_start) mx FROM src GROUP BY source
        ), spine AS (
          SELECT b.source, unnest(generate_series(b.mn, b.mx, INTERVAL 1 MINUTE)) AS window_start
          FROM bounds b
        )
        SELECT s.source, s.window_start,
               last_value(t."last" IGNORE NULLS) OVER (
                 PARTITION BY s.source ORDER BY s.window_start
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last
        FROM spine s LEFT JOIN src t USING (source, window_start)
        ORDER BY source, window_start
        """
    ).df()
    assert len(got) == len(exp)
    assert (got["last"].to_numpy() == exp["last"].to_numpy()).all()


def test_locf_limit_keep_last_value(spark):
    """Graphite keepLastValue(limit): short null runs fill, runs longer
    than limit stay null entirely, trailing runs measured by their own
    length, leading runs never fill."""
    import pandas as pd

    from logtrics_spark.operators.gapfill import locf

    base = pd.Timestamp("2024-01-01")
    vals = [None, 10.0, None, 30.0, None, None, None, 70.0, None, None]
    pdf = pd.DataFrame(
        {
            "source": ["s"] * 10,
            "metric": ["m"] * 10,
            "kind": ["gauge"] * 10,
            "window_start": [base + pd.Timedelta(minutes=i) for i in range(10)],
            "last": pd.array(vals, dtype="Float64"),
        }
    )
    df = spark.createDataFrame(pdf)

    got1 = [
        r["last"]
        for r in locf(df, ["last"], limit=1).orderBy("window_start").collect()
    ]
    # slot0 leading -> never fills; slot2 (run len 1) fills with 10;
    # run 4-6 (len 3 > 1) stays null; trailing 8-9 (len 2 > 1) stays null
    assert got1 == [None, 10.0, 10.0, 30.0, None, None, None, 70.0, None, None]

    got3 = [
        r["last"]
        for r in locf(df, ["last"], limit=3).orderBy("window_start").collect()
    ]
    assert got3 == [None, 10.0, 10.0, 30.0, 30.0, 30.0, 30.0, 70.0, 70.0, 70.0]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        locf(df, ["last"], limit=0)
