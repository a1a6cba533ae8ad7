"""Series transforms (operators/series.py) — the Graphite read path.

Hand-computed expectations on tiny tier tables, including the cases
that distinguish a correct time-based implementation from a row-based
one: gaps (RANGE vs ROWS frames), counter resets, wrap reconstruction,
constant windows, and empty input schema stability.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from logtrics_spark.operators.series import (
    derivative,
    integral,
    moving_average,
    non_negative_derivative,
    per_second,
    topk_series,
    zscore,
)

KEY = ["source", "metric", "kind"]


def _ts(minute: int):
    return datetime(2024, 1, 1, 0, minute, tzinfo=timezone.utc)


def _tier(spark, rows):
    """rows: (minute, value) or (source, minute, value) -> a 1m tier table."""
    data = []
    for r in rows:
        src, minute, val = ("s", *r) if len(r) == 2 else r
        data.append((src, "m", "gauge", _ts(minute).replace(tzinfo=None), float(val)))
    return spark.createDataFrame(
        data, "source string, metric string, kind string, "
              "window_start timestamp, val double")


def _vals(df, col, source="s"):
    rows = df.filter(F.col("source") == source).orderBy("window_start").collect()
    return [r[col] for r in rows]


def test_moving_average_uses_time_range_not_row_count(spark):
    # slots at minutes 0,1,2 then a gap to minute 10; 3-minute window.
    df = _tier(spark, [(0, 1), (1, 2), (2, 3), (10, 10)])
    out = moving_average(df, "val", window_seconds=180)
    # minute 2: mean(1,2,3)=2.0; minute 10: the gap means ONLY slot 10
    # is in [8:01..10:00] — a rows-based frame would wrongly include 1,2.
    assert _vals(out, "mavg_val") == [1.0, 1.5, 2.0, 10.0]


def test_derivative_and_first_slot_null(spark):
    df = _tier(spark, [(0, 5), (1, 8), (2, 6)])
    out = derivative(df, "val")
    assert _vals(out, "delta_val") == [None, 3.0, -2.0]


def test_non_negative_derivative_nulls_resets(spark):
    # counter: 10, 15, 3 (reset), 7
    df = _tier(spark, [(0, 10), (1, 15), (2, 3), (3, 7)])
    out = non_negative_derivative(df, "val")
    assert _vals(out, "nnd_val") == [None, 5.0, None, 4.0]


def test_non_negative_derivative_wrap_formula(spark):
    # 8-bit counter wrapping at 255: 250 -> 4 is a delta of 10.
    df = _tier(spark, [(0, 250), (1, 4)])
    out = non_negative_derivative(df, "val", max_value=255)
    assert _vals(out, "nnd_val") == [None, 10.0]


def test_per_second_divides_by_actual_gap(spark):
    # cumulative counter with a 5-minute gap: delta 600 over 300s = 2/s.
    df = _tier(spark, [(0, 0), (1, 60), (6, 660)])
    out = per_second(df, "val")
    assert _vals(out, "rate_val") == [None, 1.0, 2.0]


def test_integral_running_sum_skips_nulls(spark):
    df = _tier(spark, [(0, 1), (1, 2), (3, 4)])
    df = df.withColumn("val", F.when(F.minute("window_start") != 1, F.col("val")))
    out = integral(df, "val")
    assert _vals(out, "cum_val") == [1.0, 1.0, 5.0]


def test_zscore_flags_spike_and_nulls_constant(spark):
    # constant series -> stddev 0 -> null z everywhere.
    const = _tier(spark, [(m, 5) for m in range(5)])
    assert _vals(zscore(const, "val", 300), "z_val") == [None] * 5
    # a spike against a varying baseline gets a positive z.
    df = _tier(spark, [(0, 1), (1, 2), (2, 1), (3, 2), (4, 50)])
    z = _vals(zscore(df, "val", 300), "z_val")
    assert z[-1] == pytest.approx(1.7884, abs=1e-3)
    assert all(abs(v) < 1.5 for v in z[1:-1])


def test_zscore_single_sample_window_is_null(spark):
    # 1-slot window: stddev_samp needs n>=2 -> null, not a crash.
    df = _tier(spark, [(0, 1), (10, 2)])
    out = zscore(df, "val", window_seconds=60)
    assert _vals(out, "z_val") == [None, None]


def test_topk_series_keeps_k_series_rows(spark):
    rows = [("a", 0, 10), ("a", 1, 10), ("b", 0, 5), ("c", 0, 1), ("c", 1, 1)]
    df = _tier(spark, rows)
    out = topk_series(df, k=2, value_col="val", by="sum")
    kept = {r["source"] for r in out.collect()}
    assert kept == {"a", "b"}
    assert out.count() == 3  # all of a's and b's rows survive


def test_topk_series_tie_breaks_deterministically(spark):
    df = _tier(spark, [("a", 0, 5), ("b", 0, 5), ("c", 0, 5)])
    out = topk_series(df, k=2, value_col="val", by="sum")
    assert {r["source"] for r in out.collect()} == {"a", "b"}


def test_validation_errors(spark):
    df = _tier(spark, [(0, 1)])
    with pytest.raises(ValueError):
        moving_average(df, "val", 0)
    with pytest.raises(ValueError):
        zscore(df, "val", -1)
    with pytest.raises(ValueError):
        topk_series(df, 0, value_col="val")
    with pytest.raises(ValueError):
        topk_series(df, 1, value_col="val", by="median")


def test_empty_input_schema_stable(spark):
    df = _tier(spark, [(0, 1)]).limit(0)
    for out, col in [
        (moving_average(df, "val", 60), "mavg_val"),
        (per_second(df, "val"), "rate_val"),
        (zscore(df, "val", 60), "z_val"),
        (topk_series(df, 1, value_col="val"), "val"),
    ]:
        assert col in out.columns
        assert out.count() == 0


def test_non_negative_derivative_wrap_rejects_out_of_range(spark):
    # a sample above the stated wrap point is bad data, not a wrap:
    # 300 -> 4 with max_value=255 must yield null, not a fabricated delta.
    df = _tier(spark, [(0, 300), (1, 4), (2, 10)])
    out = non_negative_derivative(df, "val", max_value=255)
    assert _vals(out, "nnd_val") == [None, None, 6.0]


def test_series_transforms_match_brute_force(spark):
    """Property: moving_average / per_second / integral vs a plain-
    Python reference on random sparse series (random gaps included)."""
    pytest.importorskip("hypothesis")
    from hypothesis import given, settings
    from hypothesis import strategies as st

    W = 180  # 3-minute trailing window

    @settings(max_examples=15, deadline=None)
    @given(st.dictionaries(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=-100, max_value=100),
        min_size=1, max_size=12,
    ))
    def check(series):
        slots = sorted((m * 60, float(v)) for m, v in series.items())
        df = _tier(spark, [(ws // 60, v) for ws, v in slots])
        chained = integral(per_second(
            moving_average(df, "val", W, out_col="mavg"),
            "val", out_col="rate"), "val", out_col="cum")

        exp_mavg, exp_rate, exp_cum = [], [], []
        run = 0.0
        for i, (ws, v) in enumerate(slots):
            in_w = [u for wu, u in slots if ws - W + 1 <= wu <= ws]
            exp_mavg.append(sum(in_w) / len(in_w))
            if i == 0:
                exp_rate.append(None)
            else:
                pw, pv = slots[i - 1]
                d = v - pv
                exp_rate.append(d / (ws - pw) if d >= 0 else None)
            run += v
            exp_cum.append(run)

        rows = chained.orderBy("window_start").collect()
        got = [(r["mavg"], r["rate"], r["cum"]) for r in rows]
        for (gm, gr, gc), em, er, ec in zip(got, exp_mavg, exp_rate, exp_cum):
            assert gm == pytest.approx(em, abs=1e-9)
            if er is None:
                assert gr is None
            else:
                assert gr == pytest.approx(er, abs=1e-9)
            assert gc == pytest.approx(ec, abs=1e-9)

    check()


def test_nan_samples_do_not_poison_nnd_zscore_topk(spark):
    """Spark orders NaN above every number (NaN >= 0 is true, NaN sorts
    first under desc) — NaN samples must yield null deltas/z-scores and
    must not crown their series the top-k winner."""
    nan = float("nan")
    df = _tier(spark, [(0, 1), (1, nan), (2, 5)])
    import math

    nnd = _vals(non_negative_derivative(df, "val"), "nnd_val")
    assert nnd[0] is None and nnd[1] is None and nnd[2] is None  # NaN prev too

    z = _vals(zscore(df, "val", 300), "z_val")
    assert all(v is None or not math.isnan(v) for v in z)

    big = _tier(spark, [("a", 0, 100), ("a", 1, 100), ("b", 0, 1), ("b", 1, nan)])
    out = topk_series(big, k=1, value_col="val", by="sum")
    assert {r["source"] for r in out.collect()} == {"a"}


def test_moving_sum_min_max_variants(spark):
    df = _tier(spark, [(0, 1), (1, 4), (2, 2), (10, 7)])
    from logtrics_spark.operators.series import moving_max, moving_min, moving_sum

    assert _vals(moving_sum(df, "val", 180), "msum_val") == [1.0, 5.0, 7.0, 7.0]
    assert _vals(moving_min(df, "val", 180), "mmin_val") == [1.0, 1.0, 1.0, 7.0]
    assert _vals(moving_max(df, "val", 180), "mmax_val") == [1.0, 4.0, 4.0, 7.0]


def test_summarize_equals_tier_cascade(spark):
    """summarize(rollup(x,'1m'), 3600) must equal rollup(x,'1h') on the
    composable columns — the epoch-aligned bucket convention."""
    from logtrics_spark.datagen import gen_tokseq
    from logtrics_spark.operators.extract import extract_points
    from logtrics_spark.operators.rollup import rollup
    from logtrics_spark.operators.series import summarize

    pts = extract_points(gen_tokseq(spark, 1500, partitions=2))
    got = (
        summarize(rollup(pts, "1m"), 3600)
        .select("source", "metric", "kind", "window_start", "cnt", "sum", "min", "max", "avg")
        .toPandas()
        .sort_values(["source", "metric", "window_start"])
        .reset_index(drop=True)
    )
    exp = (
        rollup(pts, "1h")
        .select("source", "metric", "kind", "window_start", "cnt", "sum", "min", "max", "avg")
        .toPandas()
        .sort_values(["source", "metric", "window_start"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, exp, check_exact=False, rtol=1e-9)


def test_summarize_arbitrary_bucket(spark):
    """A 90s bucket (not on the tier ladder) groups minutes 0-1 / 3."""
    from logtrics_spark.operators.series import summarize

    df = (
        _tier(spark, [(0, 2), (1, 4), (3, 10)])
        .withColumnRenamed("val", "sum")
    )
    from pyspark.sql import functions as F

    t = (
        df.withColumn("cnt", F.lit(1).cast("long"))
        .withColumn("min", F.col("sum"))
        .withColumn("max", F.col("sum"))
        .withColumn("avg", F.col("sum"))
        .withColumn("last", F.col("sum"))
        .withColumn("last_ts", F.col("window_start"))
    )
    out = summarize(t, 90).orderBy("window_start").collect()
    assert [(r["cnt"], r["sum"]) for r in out] == [(2, 6.0), (1, 10.0)]
    assert [r["last"] for r in out] == [4.0, 10.0]


def test_seasonal_diff_day_over_day(spark):
    from datetime import datetime, timezone

    from logtrics_spark.operators.series import seasonal_diff

    def day_rows(day, vals):
        return [
            ("s", "m", "gauge",
             datetime(2024, 1, day, 0, m, tzinfo=timezone.utc).replace(tzinfo=None),
             float(v))
            for m, v in vals
        ]

    df = spark.createDataFrame(
        day_rows(1, [(0, 10), (1, 20)]) + day_rows(2, [(0, 13), (2, 9)]),
        "source string, metric string, kind string, window_start timestamp, val double",
    )
    out = {
        (r["window_start"].day, r["window_start"].minute): (r["val_prev"], r["delta"])
        for r in seasonal_diff(df, "val", 86400).collect()
    }
    assert out[(2, 0)] == (10.0, 3.0)       # day 2 vs day 1 same minute
    assert out[(2, 2)] == (None, None)      # no slot a day earlier
    assert out[(1, 0)] == (None, None)      # first day has no baseline


def test_summarize_and_seasonal_validation(spark):
    from logtrics_spark.operators.series import seasonal_diff, summarize

    df = _tier(spark, [(0, 1)])
    with pytest.raises(ValueError):
        summarize(df, 0)
    with pytest.raises(ValueError):
        seasonal_diff(df, "val", -5)


def test_summarize_derives_stddev_from_moments(spark):
    """When the tier carries sum_sq, summarize must emit the same
    moment-derived sample stddev the cascade does (schema parity with
    real tier rows)."""
    from logtrics_spark.datagen import gen_tokseq
    from logtrics_spark.operators.extract import extract_points
    from logtrics_spark.operators.rollup import rollup
    from logtrics_spark.operators.series import summarize

    pts = extract_points(gen_tokseq(spark, 1200, partitions=2))
    got = (
        summarize(rollup(pts, "1m"), 3600)
        .select("source", "metric", "kind", "window_start", "stddev")
        .toPandas()
        .sort_values(["source", "metric", "window_start"])
        .reset_index(drop=True)
    )
    exp = (
        rollup(pts, "1h")
        .select("source", "metric", "kind", "window_start", "stddev")
        .toPandas()
        .sort_values(["source", "metric", "window_start"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, exp, check_exact=False, rtol=1e-6)


def test_aggregate_series_collapses_sources(spark):
    from logtrics_spark.operators.series import aggregate_series

    df = _tier(spark, [("a", 0, 1), ("b", 0, 2), ("a", 1, 5), ("c", 1, 7)])
    out = aggregate_series(df, "val", how="sum")
    got = {r["window_start"].minute: r["sum_val"] for r in out.collect()}
    assert got == {0: 3.0, 1: 12.0}
    assert "source" not in out.columns and "metric" in out.columns

    avg = aggregate_series(df, "val", how="avg")
    got = {r["window_start"].minute: r["avg_val"] for r in avg.collect()}
    assert got == {0: 1.5, 1: 6.0}

    with pytest.raises(ValueError):
        aggregate_series(df, "val", how="median")
    with pytest.raises(ValueError):
        aggregate_series(df, "val", collapse=["host"])


def test_percentile_of_series(spark):
    from logtrics_spark.operators.series import percentile_of_series

    df = _tier(spark, [("a", 0, 1), ("b", 0, 3), ("c", 0, 5), ("a", 1, 10)])
    out = percentile_of_series(df, "val", 0.5)
    got = {r["window_start"].minute: r["p50_val"] for r in out.collect()}
    assert got == {0: 3.0, 1: 10.0}
    with pytest.raises(ValueError):
        percentile_of_series(df, "val", 1.5)


def test_as_percent_shares_sum_to_100(spark):
    from logtrics_spark.operators.series import as_percent

    df = _tier(spark, [("a", 0, 1), ("b", 0, 3), ("a", 1, 5)])
    out = as_percent(df, "val")
    got = {(r["source"], r["window_start"].minute): r["pct_val"] for r in out.collect()}
    assert got[("a", 0)] == pytest.approx(25.0)
    assert got[("b", 0)] == pytest.approx(75.0)
    assert got[("a", 1)] == pytest.approx(100.0)
    # zero total -> null share, not a division blowup
    z = as_percent(_tier(spark, [("a", 0, 0), ("b", 0, 0)]), "val")
    assert all(r["pct_val"] is None for r in z.collect())


def test_as_percent_nan_total_does_not_poison_window(spark):
    """ADVICE r3: NaN != 0 is TRUE under Spark's NaN ordering, so one
    NaN sample must not turn every series' share NaN — the NaN sample
    is excluded from the total and its own share is null."""
    from logtrics_spark.operators.series import as_percent

    df = _tier(spark, [("a", 0, 1), ("b", 0, 3), ("c", 0, float("nan"))])
    out = as_percent(df, "val")
    got = {r["source"]: r["pct_val"] for r in out.collect()}
    assert got["a"] == pytest.approx(25.0)
    assert got["b"] == pytest.approx(75.0)
    assert got["c"] is None


def test_ratio_series_error_rate(spark):
    from logtrics_spark.operators.series import ratio_series

    df = _tier(spark, [("err", 0, 2), ("ok", 0, 8), ("err", 1, 1), ("ok", 1, 0)])
    out = ratio_series(
        df, "val", F.col("source") == "err", F.lit(True), by=["window_start"]
    )
    got = {r["window_start"].minute: r["div_val"] for r in out.collect()}
    assert got[0] == pytest.approx(0.2)   # 2 / (2+8)
    assert got[1] == pytest.approx(1.0)   # 1 / (1+0)

    # zero denominator -> null, not a blowup; sub op subtracts
    z = ratio_series(
        _tier(spark, [("err", 0, 3), ("ok", 0, -3)]),
        "val", F.col("source") == "err", F.lit(True), by=["window_start"],
    )
    assert z.collect()[0]["div_val"] is None
    s = ratio_series(
        df, "val", F.col("source") == "err", F.col("source") == "ok",
        by=["window_start"], op="sub",
    )
    got = {r["window_start"].minute: r["sub_val"] for r in s.collect()}
    assert got[0] == pytest.approx(-6.0) and got[1] == pytest.approx(1.0)

    with pytest.raises(ValueError):
        ratio_series(df, "val", F.lit(True), F.lit(True), op="mul")


def test_pointwise_transforms_chain(spark):
    from logtrics_spark.operators.series import (
        absolute,
        invert,
        offset,
        scale,
        transform_null,
    )

    df = _tier(spark, [(0, -2), (1, 0), (2, 4)])
    df = df.withColumn("val", F.when(F.minute("window_start") != 1, F.col("val")))
    out = scale(absolute(transform_null(df, "val", 0.0), "val"), "val", 8.0)
    assert _vals(out, "val") == [16.0, 0.0, 32.0]
    out2 = offset(df, "val", 10.0)
    assert _vals(out2, "val") == [8.0, None, 14.0]
    inv = invert(_tier(spark, [(0, 4), (1, 0), (2, float("nan"))]), "val")
    assert _vals(inv, "val") == [0.25, None, None]


def test_linear_regression_recovers_trend(spark):
    from logtrics_spark.operators.series import linear_regression

    # exact line y = 3x + 7 (x in seconds): slope must come back exactly
    df = _tier(spark, [(m, 3 * (m * 60) + 7) for m in range(6)])
    out = linear_regression(df, "val", window_seconds=300)
    rows = out.orderBy("window_start").collect()
    assert rows[0]["slope"] is None  # 1-sample window
    for r in rows[1:]:
        assert r["slope"] == pytest.approx(3.0, abs=1e-9)
        assert r["predict"] == pytest.approx(r["val"], abs=1e-6)

    # predict_seconds projects forward along the fit
    fwd = linear_regression(df, "val", 300, predict_seconds=60).orderBy(
        "window_start"
    ).collect()
    assert fwd[-1]["predict"] == pytest.approx(fwd[-1]["val"] + 180.0, abs=1e-6)

    # NaN sample excluded, not poisonous
    nan_df = _tier(spark, [(0, 0), (1, 60), (2, float("nan")), (3, 180)])
    got = linear_regression(nan_df, "val", 300).orderBy("window_start").collect()
    assert got[-1]["slope"] == pytest.approx(1.0, abs=1e-9)

    with pytest.raises(ValueError):
        linear_regression(df, "val", 0)


def test_moving_stddev_matches_samples(spark):
    from logtrics_spark.operators.series import moving_stddev

    df = _tier(spark, [(0, 1), (1, 3), (2, 5), (10, 7)])
    out = moving_stddev(df, "val", window_seconds=180)
    got = _vals(out, "mstd_val")
    assert got[0] is None                       # 1 sample
    assert got[1] == pytest.approx(2 ** 0.5)    # {1,3}
    assert got[2] == pytest.approx(2.0)         # {1,3,5}
    assert got[3] is None                       # gap: window holds only slot 10


def test_name_selection_grep_exclude(spark):
    from logtrics_spark.operators.series import exclude_series, grep_series

    df = _tier(spark, [("web01", 0, 1), ("web02", 0, 2), ("db01", 0, 3)])
    # name = '<source>.m' (metric col is 'm')
    assert {r["source"] for r in grep_series(df, "^web").collect()} == {"web01", "web02"}
    assert {r["source"] for r in exclude_series(df, "^web").collect()} == {"db01"}
    # unanchored search, like Graphite's re.search
    assert grep_series(df, "b0").count() == 3
    # filter is a Catalyst predicate: pushes to the scan, no UDF stage
    plan = grep_series(df, "^web")._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_alias_series_and_by_node(spark):
    from logtrics_spark.operators.series import alias_by_node, alias_series

    df = _tier(spark, [("web01", 0, 1), ("web02", 1, 2)])
    a = alias_series(df, "all-web")
    assert set(a.columns) == {"series", "kind", "window_start", "val"}
    assert {r["series"] for r in a.collect()} == {"all-web"}
    assert a.count() == 2  # rows/windows untouched

    b = alias_by_node(df, [0], prefix="logtrics")
    # prefix occupies node 0
    assert {r["series"] for r in b.collect()} == {"logtrics"}
    c = alias_by_node(df, [0, 1])  # no prefix: source.metric
    assert {r["series"] for r in c.collect()} == {"web01.m", "web02.m"}

    import pytest as _pt

    with _pt.raises(ValueError):
        alias_by_node(df, [])


def test_group_by_node_collapses_and_aggregates(spark):
    from logtrics_spark.operators.series import group_by_node

    df = _tier(
        spark,
        [("web01", 0, 1), ("web02", 0, 2), ("db01", 0, 30), ("web01", 1, 5)],
    )
    # node 1 = metric ('m' for all) -> one series per window, summed
    g = group_by_node(df, 1, "val", how="sum").orderBy("window_start").collect()
    assert [(r["series"], r["sum_val"]) for r in g] == [("m", 33.0), ("m", 5.0)]
    # node 0 = source -> per-source grouping (identity here), max
    g0 = group_by_node(df, 0, "val", how="max", out_col="mx")
    got = {(r["series"], r["window_start"].minute): r["mx"] for r in g0.collect()}
    assert got[("web01", 0)] == 1.0 and got[("db01", 0)] == 30.0

    import pytest as _pt

    with _pt.raises(ValueError):
        group_by_node(df, 0, "val", how="median")


def test_remove_value_thresholds_null_not_drop(spark):
    from logtrics_spark.operators.series import remove_above_value, remove_below_value

    df = _tier(spark, [(0, 1), (1, 5), (2, 50), (3, float("nan"))])
    up = _vals(remove_above_value(df, "val", 10.0), "val")
    assert up == [1.0, 5.0, None, None]  # slot kept, value nulled; NaN nulled
    lo = _vals(remove_below_value(df, "val", 3.0), "val")
    assert lo == [None, 5.0, 50.0, None]


def test_n_percentile_and_percentile_removal(spark):
    from logtrics_spark.operators.series import (
        n_percentile,
        remove_above_percentile,
        remove_below_percentile,
    )

    df = _tier(spark, [(i, v) for i, v in enumerate([1, 2, 3, 4, 100])])
    got = _vals(n_percentile(df, "val", 0.5, out_col="p50"), "p50")
    assert got == [3.0] * 5  # flat per-series line, exact interpolated
    top = _vals(remove_above_percentile(df, "val", 0.5), "val")
    assert top == [1.0, 2.0, 3.0, None, None]
    bot = _vals(remove_below_percentile(df, "val", 0.5), "val")
    assert bot == [None, None, 3.0, 4.0, 100.0]
    import pytest as _pt

    with _pt.raises(ValueError):
        n_percentile(df, "val", 1.5)


def test_series_level_filters_and_most_deviant(spark):
    from logtrics_spark.operators.series import (
        average_above,
        average_below,
        current_above,
        current_below,
        most_deviant,
    )

    rows = (
        [("flat", m, 10.0) for m in range(4)]
        + [("rising", m, float(m * 100)) for m in range(4)]
        + [("low", m, 1.0) for m in range(4)]
    )
    df = _tier(spark, rows)
    assert {r["source"] for r in average_above(df, "val", 5.0).collect()} == {"flat", "rising"}
    assert {r["source"] for r in average_below(df, "val", 5.0).collect()} == {"low"}
    # current = LAST value: rising ends at 300
    assert {r["source"] for r in current_above(df, "val", 50.0).collect()} == {"rising"}
    assert {r["source"] for r in current_below(df, "val", 5.0).collect()} == {"low"}
    # variance ranking keeps whole series, rows intact
    md = most_deviant(df, "val", 1)
    assert {r["source"] for r in md.collect()} == {"rising"} and md.count() == 4
    import pytest as _pt

    with _pt.raises(ValueError):
        most_deviant(df, "val", 0)


def test_n_percentile_column_naming_no_truncation(spark):
    from logtrics_spark.operators.series import n_percentile

    df = _tier(spark, [(0, 1), (1, 2)])
    assert "p999_val" in n_percentile(df, "val", 0.999).columns
    assert "p29_val" in n_percentile(df, "val", 0.29).columns


def test_series_filters_inclusive_boundary(spark):
    from logtrics_spark.operators.series import average_above, current_above

    df = _tier(spark, [("edge", 0, 10.0), ("edge", 1, 10.0), ("under", 0, 9.0)])
    # Graphite's boundary is inclusive: avg == threshold keeps the series
    assert {r["source"] for r in average_above(df, "val", 10.0).collect()} == {"edge"}
    assert {r["source"] for r in current_above(df, "val", 10.0).collect()} == {"edge"}


def test_n_percentile_rank_selection_matches_graphite_definition(spark):
    """interpolate=False = Graphite _getPercentile's default: NIST rank
    selection sorted[clamp(ceil(p*(N+1)), 1, N)], checked against a
    from-the-definition scalar reference on several (N, p) shapes."""
    import math

    from logtrics_spark.operators.series import n_percentile

    def graphite_pct(points, p):
        s = sorted(points)
        rank = int(math.floor(p * (len(s) + 1)))
        frac = p * (len(s) + 1) - rank
        rank += int(math.ceil(frac))
        if rank == 0:
            return s[0]
        if rank - 1 == len(s):
            return s[-1]
        return s[rank - 1]

    for vals, p in [
        ([1, 2, 3, 4, 100], 0.5),
        ([1, 2, 3, 4, 100], 0.95),
        ([7], 0.5),
        ([5, 1], 0.25),
        (list(range(1, 21)), 0.9),
    ]:
        df = _tier(spark, list(enumerate(vals)))
        got = _vals(
            n_percentile(df, "val", p, out_col="pr", interpolate=False), "pr"
        )
        assert got == [float(graphite_pct(vals, p))] * len(vals), (vals, p)

    # short-series divergence from the interpolated default is real
    df = _tier(spark, list(enumerate([1, 2, 3, 4, 100])))
    interp = _vals(n_percentile(df, "val", 0.95, out_col="pi"), "pi")[0]
    rank = _vals(n_percentile(df, "val", 0.95, out_col="pr", interpolate=False), "pr")[0]
    assert rank == 100.0 and interp != rank

    # NaN excluded identically in both variants: survivors [1, 3],
    # rank = ceil(0.5 * 3) = 2 -> sorted[1] = 3
    df = _tier(spark, [(0, 1.0), (1, float("nan")), (2, 3.0)])
    got = _vals(n_percentile(df, "val", 0.5, out_col="pr", interpolate=False), "pr")
    assert got == [float(graphite_pct([1.0, 3.0], 0.5))] * 3 == [3.0] * 3


def test_moving_median_robust_to_outlier(spark):
    from logtrics_spark.operators.series import moving_average, moving_median

    df = _tier(spark, [(i, v) for i, v in enumerate([5, 5, 1000, 5, 5])])
    med = _vals(moving_median(df, "val", window_seconds=180, out_col="m"), "m")
    # trailing 3-slot frames: the spike cannot move the median once two
    # honest slots flank it
    assert med == [5.0, 5.0, 5.0, 5.0, 5.0]
    avg = _vals(moving_average(df, "val", window_seconds=180, out_col="a"), "a")
    assert max(avg) > 300  # the mean IS moved — that's why movingMedian exists


def test_changed_flags_edges_only(spark):
    from logtrics_spark.operators.series import changed

    df = _tier(spark, [(i, v) for i, v in enumerate([1, 1, 2, 2, 1])])
    got = _vals(changed(df, "val", out_col="c"), "c")
    # first slot 0 (no predecessor), then edges at 1->2 and 2->1
    assert got == [0.0, 0.0, 1.0, 0.0, 1.0]


def test_hitcount_rate_to_hits(spark):
    from logtrics_spark.operators.series import hitcount

    # 1m rate slots: 2/s for 3 minutes then 0.5/s for 2 -> 5m bucket
    df = _tier(spark, [(0, 2.0), (1, 2.0), (2, 2.0), (3, 0.5), (4, 0.5)])
    got = hitcount(df, "val", "1m", 300).collect()
    assert len(got) == 1
    assert got[0]["hits_val"] == 2.0 * 60 * 3 + 0.5 * 60 * 2  # 420 hits
    import pytest as _pt

    with _pt.raises(ValueError):
        hitcount(df, "val", "1h", 5400)  # 90m % 1h != 0


def test_aggregate_series_spread_combiners(spark):
    from logtrics_spark.operators.series import aggregate_series

    rows = [("a", 0, 1.0), ("b", 0, 5.0), ("c", 0, 9.0)]
    df = _tier(spark, rows)
    rng = aggregate_series(df, "val", how="range", out_col="r").collect()
    assert rng[0]["r"] == 8.0
    sd = aggregate_series(df, "val", how="stddev", out_col="s").collect()
    assert sd[0]["s"] == pytest.approx(4.0)  # stddev_samp of 1,5,9
    n = aggregate_series(df, "val", how="count", out_col="n").collect()
    assert n[0]["n"] == 3
