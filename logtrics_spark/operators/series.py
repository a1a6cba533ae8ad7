"""Series transforms over tier tables — the Graphite function library.

The reference emits its registry to Graphite (/root/reference/graphite/
graphite.go:84-151); the *query* side of that system is Graphite's
function library (movingAverage, derivative, nonNegativeDerivative,
perSecond, integral, highest*) applied to the stored series.  These
operators provide that read path over our tier tables, plus the rolling
z-score anomaly flag every metrics deployment ends up writing by hand.

All transforms are pure Catalyst window functions partitioned BY SERIES
(the same ``KEY`` the rollup groups on), so:

- no Python on the data path, whole-stage codegen end to end;
- per-task state is bounded by one series' slot count — tier tables are
  already 3-6 orders of magnitude smaller than raw, so even a year of
  1m slots is ~525k rows per series;
- one Exchange on the series key serves every transform in a chain
  (Catalyst reuses the partitioning across consecutive windows with the
  same partition spec).

Time-based frames use ``rangeBetween`` over epoch seconds, NOT
``rowsBetween`` — tier tables may be sparse (gap-fill is optional), and
a row-count frame would silently widen its time span across gaps.

``topk_series`` is the one transform with a global step: ranking the
per-series totals.  That frame has one row per series — bounded by the
metric-registry cardinality (reference: one go-metrics registry entry
per rule metric), never by data volume — and the ranked winners are
broadcast back to the tier rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from logtrics_spark.operators.rollup import KEY

_WS = "_ws_epoch"


def _with_epoch(tier_df: DataFrame) -> DataFrame:
    return tier_df.withColumn(_WS, F.unix_timestamp("window_start").cast("long"))


def _series_window(key: list[str]) -> Window:
    return Window.partitionBy(*key).orderBy(F.col(_WS))


_MOVING_AGGS = {
    "avg": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "stddev": F.stddev_samp,
    # exact median over the frame; F.median rejects window frames
    # (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC) but percentile(0.5)
    # is the same interpolated definition and frame-capable
    "median": lambda c: F.percentile(c, F.lit(0.5)),
}


def _moving(
    agg: str,
    tier_df: DataFrame,
    value_col: str,
    window_seconds: int,
    key: list[str] | None,
    out_col: str | None,
    prefix: str,
) -> DataFrame:
    if window_seconds <= 0:
        raise ValueError(f"window_seconds must be positive, got {window_seconds}")
    key = key or KEY
    out = out_col or f"{prefix}_{value_col}"
    w = _series_window(key).rangeBetween(-(window_seconds - 1), 0)
    return (
        _with_epoch(tier_df)
        .withColumn(out, _MOVING_AGGS[agg](value_col).over(w))
        .drop(_WS)
    )


def moving_average(
    tier_df: DataFrame,
    value_col: str,
    window_seconds: int,
    key: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Graphite ``movingAverage(series, windowSize)``.

    Trailing time-range mean: for each slot, the mean of ``value_col``
    over slots whose window_start lies in the last ``window_seconds``
    (inclusive of the current slot).  RANGE frame on epoch seconds, so
    gaps shrink the sample rather than stretching the time span.
    """
    return _moving("avg", tier_df, value_col, window_seconds, key, out_col, "mavg")


def moving_sum(
    tier_df: DataFrame,
    value_col: str,
    window_seconds: int,
    key: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Graphite ``movingSum`` — same trailing time-RANGE frame."""
    return _moving("sum", tier_df, value_col, window_seconds, key, out_col, "msum")


def moving_min(
    tier_df: DataFrame,
    value_col: str,
    window_seconds: int,
    key: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Graphite ``movingMin`` — same trailing time-RANGE frame."""
    return _moving("min", tier_df, value_col, window_seconds, key, out_col, "mmin")


def moving_max(
    tier_df: DataFrame,
    value_col: str,
    window_seconds: int,
    key: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Graphite ``movingMax`` — same trailing time-RANGE frame."""
    return _moving("max", tier_df, value_col, window_seconds, key, out_col, "mmax")


def moving_stddev(
    tier_df: DataFrame,
    value_col: str,
    window_seconds: int,
    key: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Graphite ``movingStdDev`` — trailing time-RANGE sample stddev
    (the volatility band the z-score divides by, exposed standalone;
    null for windows with < 2 samples, like every stddev_samp here)."""
    return _moving("stddev", tier_df, value_col, window_seconds, key, out_col, "mstd")


def moving_median(
    tier_df: DataFrame,
    value_col: str,
    window_seconds: int,
    key: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Graphite ``movingMedian`` — trailing time-RANGE exact median.

    Implemented as ``percentile(col, 0.5)`` over the frame: Spark's
    ``F.median`` REJECTS window frames
    (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC) while ``percentile`` is
    frame-capable and the same interpolated definition.  Frames are
    tier-sized — window_seconds / tier_seconds slots — never
    raw-data-sized.  The robust smoother: one outlier slot cannot move
    it, unlike movingAverage."""
    return _moving("median", tier_df, value_col, window_seconds, key, out_col, "mmed")


def changed(
    tier_df: DataFrame,
    value_col: str,
    key: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Graphite ``changed(seriesList)``: 1.0 when the slot's value
    differs from the previous slot's, else 0.0 (first slot and
    null-neighbored slots are 0, matching Graphite's safe compare).
    One lag over the series window — the edge detector for enum-ish
    gauges (config versions, leader ids, feature flags)."""
    key = key or KEY
    out = out_col or f"changed_{value_col}"
    w = _series_window(key)
    prev = F.lag(value_col).over(w)
    v = F.col(value_col)
    return (
        _with_epoch(tier_df)
        .withColumn(
            out,
            F.when(
                v.isNotNull() & prev.isNotNull() & (v != prev), F.lit(1.0)
            ).otherwise(F.lit(0.0)),
        )
        .drop(_WS)
    )


def hitcount(
    tier_df: DataFrame,
    value_col: str,
    tier: str,
    interval_seconds: int,
    key: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Graphite ``hitcount(seriesList, intervalString)``: convert a
    RATE series (events/sec per slot) back to total HITS per coarser
    interval — sum of rate x slot-width over the slots in each bucket.
    One partial-agg groupBy on the re-bucketed window (the summarize
    shape; ``interval_seconds`` is any epoch-aligned bucket width, not
    restricted to the tier ladder); slot width is the tier's seconds,
    exactly Graphite's per-point step."""
    from logtrics_spark.operators.rollup import tier_seconds

    key = key or KEY
    step = float(tier_seconds(tier))
    if interval_seconds <= 0 or interval_seconds % tier_seconds(tier):
        raise ValueError(
            f"interval_seconds {interval_seconds} must be a positive multiple "
            f"of tier {tier!r} ({tier_seconds(tier)}s)"
        )
    out = out_col or f"hits_{value_col}"
    bucket = F.timestamp_seconds(
        (F.unix_timestamp("window_start") / interval_seconds).cast("long")
        * interval_seconds
    )
    return (
        tier_df.withColumn("_bucket", bucket)
        .groupBy(*key, F.col("_bucket").alias("window_start"))
        .agg((F.sum(F.col(value_col) * F.lit(step))).alias(out))
    )


def derivative(
    tier_df: DataFrame,
    value_col: str,
    key: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Graphite ``derivative(series)``: delta vs the previous slot.

    First slot of each series gets null (no predecessor), matching
    Graphite's leading ``None``.
    """
    key = key or KEY
    out = out_col or f"delta_{value_col}"
    w = _series_window(key)
    return (
        _with_epoch(tier_df)
        .withColumn(out, F.col(value_col) - F.lag(value_col).over(w))
        .drop(_WS)
    )


def non_negative_derivative(
    tier_df: DataFrame,
    value_col: str,
    key: list[str] | None = None,
    max_value: float | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Graphite ``nonNegativeDerivative(series, maxValue)``.

    Counter-reset aware delta: a negative step is a counter reset, not a
    real decrease.  Without ``max_value`` resets yield null; with it the
    counter is assumed to have wrapped at ``max_value`` and the delta is
    reconstructed as ``(max_value - prev) + value + 1`` (Graphite's
    wrap formula).  The wrap only applies when BOTH samples lie within
    [0, max_value] — a sample beyond the stated wrap point is bad data,
    and reconstructing from it would fabricate a negative or bogus
    rate, so those steps yield null like any other reset.
    """
    key = key or KEY
    out = out_col or f"nnd_{value_col}"
    w = _series_window(key)
    prev = F.lag(value_col).over(w)
    cur = F.col(value_col)
    delta = cur - prev
    # Spark orders NaN above every number, so `NaN >= 0` is TRUE — an
    # unguarded NaN sample would sail through the non-negative branch.
    ok = (delta >= 0) & ~F.isnan(delta.cast("double"))
    if max_value is not None:
        wrapped = (F.lit(max_value) - prev) + cur + F.lit(1)
        in_range = (cur <= max_value) & (prev <= max_value) & (cur >= 0) & (prev >= 0)
        fixed = F.when(ok, delta).when(prev.isNotNull() & in_range, wrapped)
    else:
        fixed = F.when(ok, delta)
    return _with_epoch(tier_df).withColumn(out, fixed).drop(_WS)


def per_second(
    tier_df: DataFrame,
    value_col: str,
    key: list[str] | None = None,
    max_value: float | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Graphite ``perSecond(series)``: non-negative delta / elapsed time.

    Divides by the ACTUAL seconds since the previous slot, so sparse
    series (missing windows) still report a correct rate across the gap
    — this is the Prometheus ``rate()`` staple applied to a cumulative
    counter tier.
    """
    key = key or KEY
    out = out_col or f"rate_{value_col}"
    w = _series_window(key)
    nnd = non_negative_derivative(
        tier_df, value_col, key=key, max_value=max_value, out_col="_nnd"
    )
    dt = (F.col(_WS) - F.lag(_WS).over(w)).cast("double")
    return (
        _with_epoch(nnd)
        .withColumn(out, F.when(dt > 0, F.col("_nnd") / dt))
        .drop(_WS, "_nnd")
    )


def integral(
    tier_df: DataFrame,
    value_col: str,
    key: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Graphite ``integral(series)``: running sum from the series start.

    Nulls contribute nothing (sum ignores them) but still emit the
    prior cumulative value, matching Graphite's carry behavior.
    """
    key = key or KEY
    out = out_col or f"cum_{value_col}"
    w = _series_window(key).rowsBetween(Window.unboundedPreceding, 0)
    return (
        _with_epoch(tier_df)
        .withColumn(out, F.sum(value_col).over(w))
        .drop(_WS)
    )


def zscore(
    tier_df: DataFrame,
    value_col: str,
    window_seconds: int,
    key: list[str] | None = None,
    min_stddev: float = 1e-9,
    out_col: str | None = None,
) -> DataFrame:
    """Rolling z-score: (x - trailing mean) / trailing sample stddev.

    The anomaly-detection primitive: |z| > threshold flags spikes
    against each series' own recent behavior.  Windows with fewer than
    two samples, or effectively-constant windows (stddev below
    ``min_stddev``, where the quotient is FP noise), yield null rather
    than a meaningless huge score.
    """
    if window_seconds <= 0:
        raise ValueError(f"window_seconds must be positive, got {window_seconds}")
    key = key or KEY
    out = out_col or f"z_{value_col}"
    w = _series_window(key).rangeBetween(-(window_seconds - 1), 0)
    mean = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    # `NaN > min_stddev` is TRUE under Spark's NaN-is-largest ordering,
    # so a NaN sample in the window must be rejected explicitly.
    ok = (sd > min_stddev) & ~F.isnan(sd)
    return (
        _with_epoch(tier_df)
        .withColumn(
            out,
            F.when(ok, (F.col(value_col) - mean) / sd),
        )
        .drop(_WS)
    )


def topk_series(
    tier_df: DataFrame,
    k: int,
    value_col: str = "sum",
    by: str = "sum",
    key: list[str] | None = None,
) -> DataFrame:
    """Graphite ``highestAverage/highestMax/highest(series, k)``.

    Keeps every tier row belonging to the k series with the highest
    aggregate of ``value_col`` (``by`` in sum/avg/max/min; must be a
    numeric column).  Ties break on the key columns so the result is
    deterministic.  Series whose aggregate is NaN or null are excluded
    from the ranking — Spark sorts NaN above every number, so one NaN
    sample would otherwise crown its series the global winner.

    Scale: the ranking frame has ONE row per series (registry-sized);
    the winners semi-join back by broadcast, so tier rows never shuffle.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    aggs = {"sum": F.sum, "avg": F.avg, "max": F.max, "min": F.min}
    if by not in aggs:
        raise ValueError(f"by must be one of {sorted(aggs)}, got {by!r}")
    key = key or KEY
    totals = tier_df.groupBy(*key).agg(aggs[by](value_col).alias("_total"))
    winners = (
        totals.where(
            F.col("_total").isNotNull() & ~F.isnan(F.col("_total").cast("double"))
        )
        .orderBy(F.col("_total").desc(), *[F.col(c) for c in key])
        .limit(k)
        .select(*key)
    )
    return tier_df.join(F.broadcast(winners), on=key, how="left_semi")


def summarize(
    tier_df: DataFrame,
    bucket_seconds: int,
    key: list[str] | None = None,
) -> DataFrame:
    """Graphite ``summarize(series, interval)``: re-bucket a tier into
    ARBITRARY tumbling buckets (not restricted to the configured tier
    ladder — 90m, 6h, whatever the dashboard asks for).

    Same composition rules as the cascade: cnt/sum/min/max (and sum_sq,
    when present) add up, avg is recomputed sum/cnt, last carries via
    max_by on last_ts.  One partial-agg groupBy over tier-sized rows.
    Buckets align to the epoch, matching ``rollup``'s window_start
    convention, so ``summarize(rollup(x, "1m"), 3600)`` equals
    ``rollup(x, "1h")`` on the composable columns.
    """
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be positive, got {bucket_seconds}")
    key = key or KEY
    ws = F.timestamp_seconds(
        (F.unix_timestamp("window_start") / bucket_seconds).cast("long")
        * bucket_seconds
    )
    aggs = [
        F.sum("cnt").alias("cnt"),
        F.sum("sum").alias("sum"),
        F.min("min").alias("min"),
        F.max("max").alias("max"),
        (F.sum("sum") / F.sum("cnt")).alias("avg"),
        F.max_by("last", "last_ts").alias("last"),
        F.max("last_ts").alias("last_ts"),
    ]
    has_sq = "sum_sq" in tier_df.columns
    if has_sq:
        aggs.append(F.sum("sum_sq").alias("sum_sq"))
    out = (
        tier_df.withColumn("_bws", ws)
        .groupBy(*key, "_bws")
        .agg(*aggs)
        .withColumnRenamed("_bws", "window_start")
    )
    if has_sq:
        # same moment-derived sample stddev the cascade emits, so
        # summarize output is schema-compatible with real tier rows
        from logtrics_spark.operators.rollup import stddev_from_moments

        out = out.withColumn("stddev", stddev_from_moments("cnt", "sum", "sum_sq"))
    return out


def time_shift(tier_df: DataFrame, shift_seconds: int) -> DataFrame:
    """Graphite ``timeShift(series, offset)``: relabel every slot
    ``shift_seconds`` later, so last week's series lands on this week's
    timeline for comparison."""
    return tier_df.withColumn(
        "window_start",
        F.timestamp_seconds(F.unix_timestamp("window_start") + shift_seconds),
    )


def seasonal_diff(
    tier_df: DataFrame,
    value_col: str,
    period_seconds: int,
    key: list[str] | None = None,
) -> DataFrame:
    """The timeShift alerting pattern: each slot vs the same slot one
    period earlier (day-over-day, week-over-week).

    Adds ``<value_col>_prev`` (null when the earlier slot is absent)
    and ``delta`` = value - prev.  The self-join is keyed on
    (series, window_start) — both sides tier-sized, co-partitioned by
    the same key, no data-volume-dependent blowup.
    """
    if period_seconds <= 0:
        raise ValueError(f"period_seconds must be positive, got {period_seconds}")
    key = key or KEY
    prev = time_shift(
        tier_df.select(
            *key, "window_start", F.col(value_col).alias(f"{value_col}_prev")
        ),
        period_seconds,
    )
    return tier_df.join(prev, on=[*key, "window_start"], how="left").withColumn(
        "delta", F.col(value_col) - F.col(f"{value_col}_prev")
    )


_SERIES_COMBINE = {
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    # rangeOfSeries / stddevSeries (Graphite's cross-series spread
    # combiners) — same one-pass partial-agg groupBy as the rest
    "range": lambda c: F.max(c) - F.min(c),
    "stddev": F.stddev_samp,
}


def aggregate_series(
    tier_df: DataFrame,
    value_col: str,
    how: str | dict[str, str] = "sum",
    collapse: list[str] | None = None,
    key: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Graphite ``sumSeries/averageSeries/minSeries/maxSeries/
    countSeries/rangeOfSeries/stddevSeries``: combine many series into
    one per window by collapsing key columns (default: ``source`` —
    "this metric across all hosts").

    ``how`` is either one combiner name or a ``{out_col: how}`` dict —
    the dict form computes the whole family in ONE partial-agg groupBy
    (one shuffle) instead of one groupBy + join per combiner.  The
    output keeps the surviving key columns plus window_start.
    """
    hows = {out_col or f"{how}_{value_col}": how} if isinstance(how, str) else how
    bad_how = [h for h in hows.values() if h not in _SERIES_COMBINE]
    if bad_how:
        raise ValueError(
            f"how must be one of {sorted(_SERIES_COMBINE)}, got {bad_how}"
        )
    key = key or KEY
    collapse = collapse if collapse is not None else ["source"]
    bad = [c for c in collapse if c not in key]
    if bad:
        raise ValueError(f"collapse columns {bad} not in key {key}")
    keep = [c for c in key if c not in collapse]
    return tier_df.groupBy(*keep, "window_start").agg(
        *[_SERIES_COMBINE[h](value_col).alias(out) for out, h in hows.items()]
    )


def percentile_of_series(
    tier_df: DataFrame,
    value_col: str,
    p: float,
    collapse: list[str] | None = None,
    key: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Graphite ``percentileOfSeries(seriesList, n)``: the p-quantile
    ACROSS series per window (e.g. the p95 host for each minute),
    collapsing ``collapse`` key columns like ``aggregate_series``.

    Exact interpolated percentile (Spark ``percentile`` == DuckDB
    ``quantile_cont``).  The per-group buffer holds one window's values
    across the collapsed series — bounded by series count (registry-
    sized), not by data volume; use ``percentile_approx`` upstream of
    this if a deployment ever collapses millions of series.
    """
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"p must be in [0, 1], got {p}")
    key = key or KEY
    collapse = collapse if collapse is not None else ["source"]
    bad = [c for c in collapse if c not in key]
    if bad:
        raise ValueError(f"collapse columns {bad} not in key {key}")
    keep = [c for c in key if c not in collapse]
    out = out_col or f"p{int(p * 100)}_{value_col}"
    return tier_df.groupBy(*keep, "window_start").agg(
        F.percentile(value_col, F.lit(p)).alias(out)
    )


def as_percent(
    tier_df: DataFrame,
    value_col: str,
    collapse: list[str] | None = None,
    key: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Graphite ``asPercent(seriesList)``: each series' share of the
    window total across the collapsed key columns (default: each
    source's percentage of the all-sources total per window).

    Pure window aggregate over (surviving key, window_start) — no join,
    one exchange.  Zero, null, or NaN totals yield null (a 0/0 share is
    meaningless, Spark's double x/0 is null anyway, and NaN != 0 is
    TRUE under Spark's NaN ordering — one NaN sample must not poison
    every series' share in that window).
    """
    key = key or KEY
    collapse = collapse if collapse is not None else ["source"]
    bad = [c for c in collapse if c not in key]
    if bad:
        raise ValueError(f"collapse columns {bad} not in key {key}")
    keep = [c for c in key if c not in collapse]
    out = out_col or f"pct_{value_col}"
    w = Window.partitionBy(*keep, "window_start")
    total = F.sum(
        F.when(~F.isnan(F.col(value_col)), F.col(value_col))
    ).over(w)
    v = F.col(value_col)
    return tier_df.withColumn(
        out,
        F.when((total != 0) & ~F.isnan(total) & ~F.isnan(v), v / total * 100.0),
    )


def ratio_series(
    tier_df: DataFrame,
    value_col: str,
    num_filter,
    den_filter,
    by: list[str] | None = None,
    op: str = "div",
    out_col: str | None = None,
) -> DataFrame:
    """Graphite ``divideSeries`` / ``diffSeries`` as ONE conditional
    aggregation — the error-rate query everyone writes:

        ratio_series(tier, "cnt",
                     F.col("source") == "error",
                     F.lit(True),            # denominator: all sources
                     by=["window_start"])

    Numerator and denominator are filter predicates over the SAME tier
    rows, so this is a single partial-aggregating groupBy on ``by`` —
    no self-join, no second scan (the naive divideSeries is a join of
    two filtered reads of the same table).  ``op``: 'div' (null on
    zero/null/NaN denominators, same guard family as as_percent) or
    'sub'.  Rows matching neither predicate fall out of both sums.
    """
    if op not in ("div", "sub"):
        raise ValueError(f"op must be 'div' or 'sub', got {op!r}")
    by = by or ["window_start"]
    out = out_col or f"{op}_{value_col}"
    v = F.col(value_col)
    num = F.sum(F.when(num_filter & ~F.isnan(v), v)).alias("_num")
    den = F.sum(F.when(den_filter & ~F.isnan(v), v)).alias("_den")
    agg = tier_df.groupBy(*by).agg(num, den)
    if op == "sub":
        expr = F.col("_num") - F.col("_den")
    else:
        d = F.col("_den")
        expr = F.when((d != 0) & ~F.isnan(d), F.col("_num") / d)
    return agg.withColumn(out, expr).drop("_num", "_den")


# ------------------------------------------------- pointwise transforms
# Graphite's scalar family (transformNull, absolute, scale, offset,
# invert) — pure column expressions, so they chain inside one projection
# with ZERO extra plan nodes; provided as named functions for parity
# with the Graphite API and for readable pipelines.


def transform_null(
    tier_df: DataFrame, value_col: str, default: float = 0.0,
    out_col: str | None = None,
) -> DataFrame:
    """Graphite ``transformNull(series, default)``: nulls become the
    default (the presentation-side cousin of gap-fill — use gapfill for
    analysis, this for display semantics like 'no data means 0')."""
    out = out_col or value_col
    return tier_df.withColumn(out, F.coalesce(F.col(value_col), F.lit(default)))


def absolute(tier_df: DataFrame, value_col: str, out_col: str | None = None) -> DataFrame:
    """Graphite ``absolute(series)``."""
    out = out_col or value_col
    return tier_df.withColumn(out, F.abs(F.col(value_col)))


def scale(
    tier_df: DataFrame, value_col: str, factor: float, out_col: str | None = None
) -> DataFrame:
    """Graphite ``scale(series, factor)`` (e.g. bytes -> bits, x8)."""
    out = out_col or value_col
    return tier_df.withColumn(out, F.col(value_col) * F.lit(factor))


def offset(
    tier_df: DataFrame, value_col: str, amount: float, out_col: str | None = None
) -> DataFrame:
    """Graphite ``offset(series, amount)``."""
    out = out_col or value_col
    return tier_df.withColumn(out, F.col(value_col) + F.lit(amount))


def invert(tier_df: DataFrame, value_col: str, out_col: str | None = None) -> DataFrame:
    """Graphite ``invert(series)``: 1/x; zero and NaN yield null (the
    division-guard family: x/0 is null under non-ansi Spark, and NaN
    must not pass a later threshold filter)."""
    out = out_col or value_col
    v = F.col(value_col)
    return tier_df.withColumn(
        out, F.when((v != 0) & ~F.isnan(v), F.lit(1.0) / v)
    )


def linear_regression(
    tier_df: DataFrame,
    value_col: str,
    window_seconds: int,
    key: list[str] | None = None,
    predict_seconds: int = 0,
) -> DataFrame:
    """Graphite ``linearRegression(series)`` over a TRAILING time range:
    per slot, the OLS slope/intercept of (epoch, value) across the last
    ``window_seconds``, plus ``predict`` = the fitted value
    ``predict_seconds`` ahead of the slot (0 = the detrended "expected
    now", the linear cousin of the z-score baseline).

    Pure Catalyst: the five OLS sums (n, Σx, Σy, Σxy, Σx²) are window
    aggregates over ONE shared time-RANGE frame — no Python, no second
    exchange in a chain with the other series functions.  Slots whose
    window holds < 2 samples, or a degenerate vertical spread
    (all-same-x), yield null slope/intercept/predict.  NaN samples are
    excluded from the sums (the usual guard family).

    x is centered on the SERIES' first epoch (a per-series constant,
    materialized before the sums — a per-frame origin would nest window
    functions and, worse, center each frame row differently) — raw
    epoch seconds (~1.7e9) squared would eat half the double mantissa
    and the slope formula's cancellation would amplify it; a within-
    series span squared stays comfortably exact.
    """
    if window_seconds <= 0:
        raise ValueError(f"window_seconds must be positive, got {window_seconds}")
    key = key or KEY
    d = _with_epoch(tier_df).withColumn(
        "_x",
        (F.col(_WS) - F.min(_WS).over(Window.partitionBy(*key))).cast("double"),
    )
    w = _series_window(key).rangeBetween(-(window_seconds - 1), 0)
    v = F.col(value_col)
    ok = v.isNotNull() & ~F.isnan(v)
    xs = F.when(ok, F.col("_x"))
    ys = F.when(ok, v)
    n = F.count(ys).over(w).cast("double")
    sx = F.sum(xs).over(w)
    sy = F.sum(ys).over(w)
    sxy = F.sum(xs * ys).over(w)
    sxx = F.sum(xs * xs).over(w)
    det = n * sxx - sx * sx
    slope = F.when((n >= 2) & (det != 0), (n * sxy - sx * sy) / det)
    intercept = (sy - slope * sx) / n
    pred_x = F.col("_x") + F.lit(float(predict_seconds))
    return (
        d.withColumn("slope", slope)
        .withColumn("intercept", intercept)
        .withColumn("predict", slope * pred_x + F.col("intercept"))
        .drop(_WS, "_x")
    )


# --------------------------------------------------- name-based selection
#
# Graphite's dashboard staples for picking and re-labelling series by
# their dotted path (grep/exclude/alias/aliasByNode/groupByNode, all
# from Graphite-web's public functions.py).  A series' name here is the
# dot-join of its key columns (the graphite sink emits
# ``prefix.source.metric[.field]`` — sinks/graphite.py:129), so these
# are pure one-projection Catalyst ops: a regex filter pushes down to
# the scan, and groupByNode is an ordinary partial-agg groupBy on a
# derived column.


def _series_name(name_cols: list[str] | None, prefix: str | None = None):
    cols = name_cols or ["source", "metric"]
    parts = ([F.lit(prefix)] if prefix else []) + [F.col(c) for c in cols]
    return F.concat_ws(".", *parts)


def grep_series(
    tier_df: DataFrame,
    pattern: str,
    name_cols: list[str] | None = None,
    exclude: bool = False,
    prefix: str | None = None,
) -> DataFrame:
    """Graphite ``grep(seriesList, pattern)``: keep only series whose
    dotted name matches the regex (``rlike`` = unanchored search, the
    same semantics as Graphite's ``re.search``).  The filter is a plain
    Catalyst predicate on the key columns, so it reaches the scan as a
    pushed filter and prunes before any shuffle.

    ``prefix`` prepends the same namespace component the Graphite sink
    prepends to emitted names (sinks/graphite.py:129) — a regex written
    against the wire name (e.g. ``^logtrics\\.web01\\.``) then matches
    here too, and node indices line up with :func:`alias_by_node` /
    :func:`group_by_node`, which take the same parameter."""
    cond = _series_name(name_cols, prefix).rlike(pattern)
    return tier_df.where(~cond if exclude else cond)


def exclude_series(
    tier_df: DataFrame,
    pattern: str,
    name_cols: list[str] | None = None,
    prefix: str | None = None,
) -> DataFrame:
    """Graphite ``exclude(seriesList, pattern)``: drop matching series
    (the complement of :func:`grep_series`)."""
    return grep_series(tier_df, pattern, name_cols, exclude=True, prefix=prefix)


def alias_series(
    tier_df: DataFrame, name: str, name_cols: list[str] | None = None
) -> DataFrame:
    """Graphite ``alias(seriesList, name)``: replace the series identity
    with one literal display name — the name-forming key columns
    collapse into a single ``series`` column; rows and windows are
    untouched (combine with ``aggregate_series`` first when several
    series share the alias, exactly as in Graphite)."""
    cols = name_cols or ["source", "metric"]
    keep = [c for c in tier_df.columns if c not in cols]
    return tier_df.select(F.lit(name).alias("series"), *keep)


def alias_by_node(
    tier_df: DataFrame,
    nodes: list[int],
    name_cols: list[str] | None = None,
    prefix: str | None = None,
) -> DataFrame:
    """Graphite ``aliasByNode(seriesList, *nodes)``: rebuild the display
    name from the selected 0-based dot-path components (e.g. nodes=[1]
    turns ``logtrics.web01.req.count`` into ``web01``)."""
    if not nodes:
        raise ValueError("aliasByNode needs at least one node index")
    full = F.split(_series_name(name_cols, prefix), r"\.")
    picked = F.concat_ws(".", *[F.element_at(full, n + 1) for n in nodes])
    cols = name_cols or ["source", "metric"]
    keep = [c for c in tier_df.columns if c not in cols]
    return tier_df.select(picked.alias("series"), *keep)


def group_by_node(
    tier_df: DataFrame,
    node: int,
    value_col: str,
    how: str = "sum",
    name_cols: list[str] | None = None,
    prefix: str | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Graphite ``groupByNode(seriesList, node, callback)``: all series
    sharing the ``node``-th name component collapse into one series per
    window, combined by ``callback`` (sum/avg/min/max/...).

    One partial-agg groupBy on (derived node, window_start) — the map
    side combines before the exchange, and cardinality is bounded by
    distinct node values x windows (registry-sized, never data-sized).
    """
    if how not in _SERIES_COMBINE:
        raise ValueError(f"how must be one of {sorted(_SERIES_COMBINE)}, got {how!r}")
    full = F.split(_series_name(name_cols, prefix), r"\.")
    part = F.element_at(full, node + 1)
    out = out_col or f"{how}_{value_col}"
    return tier_df.groupBy(part.alias("series"), "window_start").agg(
        _SERIES_COMBINE[how](value_col).alias(out)
    )


# ---------------------------------------------------- threshold family
#
# Graphite's value-threshold and series-threshold functions
# (removeAboveValue / removeBelowValue / removeAbovePercentile /
# removeBelowPercentile / nPercentile / averageAbove / averageBelow /
# currentAbove / currentBelow / mostDeviant, all from Graphite-web's
# public functions.py).  Pointwise variants null the offending VALUES
# (Graphite keeps the slot, sets None — downstream gap-fill decides
# what to do with it); series-level variants keep or drop WHOLE series.
# Everything is pure Catalyst: pointwise = one projection; per-series
# stats = one unbounded window over the series partition (tier-sized
# frames, bounded by slots per series); mostDeviant ranks a one-row-
# per-series aggregate like topk_series.


def remove_above_value(
    tier_df: DataFrame, value_col: str, threshold: float, out_col: str | None = None
) -> DataFrame:
    """Graphite ``removeAboveValue``: values > threshold become null
    (NaN values are also nulled — Spark sorts NaN above every number,
    so `<=` would silently KEEP them)."""
    out = out_col or value_col
    v = F.col(value_col)
    return tier_df.withColumn(out, F.when((v <= threshold) & ~F.isnan(v), v))


def remove_below_value(
    tier_df: DataFrame, value_col: str, threshold: float, out_col: str | None = None
) -> DataFrame:
    """Graphite ``removeBelowValue``: values < threshold become null
    (NaN is nulled explicitly: ``NaN >= t`` is TRUE under Spark's NaN
    ordering and would keep poisoned points)."""
    out = out_col or value_col
    v = F.col(value_col)
    return tier_df.withColumn(out, F.when((v >= threshold) & ~F.isnan(v), v))


def n_percentile(
    tier_df: DataFrame,
    value_col: str,
    p: float,
    key: list[str] | None = None,
    out_col: str | None = None,
    interpolate: bool = True,
) -> DataFrame:
    """Graphite ``nPercentile(seriesList, n)``: each slot carries its
    SERIES' p-percentile as a flat line (NaN excluded).

    ``interpolate=True`` (this function's default) is the exact
    interpolated percentile — the same definition as DuckDB's
    quantile_cont and Spark's ``percentile``.  NOTE: Graphite-web's own
    ``_getPercentile`` defaults to ``interpolate=False`` — the NIST
    rank-selection estimator (sorted[clamp(ceil(p*(N+1)), 1, N)]),
    which diverges from the interpolated value on short series.  Pass
    ``interpolate=False`` for bit-parity with Graphite's
    nPercentile/removeAbovePercentile/removeBelowPercentile defaults;
    the interpolated default is kept here because it matches the
    engine's other quantile surfaces (timer percentiles, t-digest).
    Both variants are pure Catalyst: interpolated = one window
    ``percentile``; rank-selection = one window ``collect_list`` +
    ``array_sort`` + ``element_at`` (frames are tier-sized — slots per
    series — never raw-data-sized)."""
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"p must be in [0, 1], got {p}")
    key = key or KEY
    # graphite-style names without float truncation: 0.95 -> p95,
    # 0.999 -> p999 (int(p*100) would truncate 0.29 to p28 and
    # collide 0.999 with 0.99)
    out = out_col or "p" + ("%g" % (p * 100)).replace(".", "") + f"_{value_col}"
    v = F.col(value_col)
    w = Window.partitionBy(*key)
    if interpolate:
        return tier_df.withColumn(
            out, F.percentile(F.when(~F.isnan(v), v), F.lit(p)).over(w)
        )
    # Graphite _getPercentile(interpolate=False): 1-based rank
    # ceil(p * (N + 1)) into the sorted non-null values, clamped to
    # [1, N] (rank 0 -> first element, rank N+1 -> last).
    arr = F.array_sort(F.collect_list(F.when(~F.isnan(v), v)).over(w))
    n = F.size(arr)
    rank = F.ceil(F.lit(float(p)) * (n + F.lit(1)).cast("double")).cast("int")
    idx = F.greatest(F.lit(1), F.least(rank, n))
    return tier_df.withColumn(out, F.when(n > 0, F.element_at(arr, idx)))


def remove_above_percentile(
    tier_df: DataFrame,
    value_col: str,
    p: float,
    key: list[str] | None = None,
    out_col: str | None = None,
    threshold_col: str | None = None,
    interpolate: bool = True,
) -> DataFrame:
    """Graphite ``removeAbovePercentile``: null values above the
    series' own p-percentile (computed over the frame, NaN excluded).
    ``threshold_col`` reuses an existing per-series percentile column
    (e.g. n_percentile's output) instead of recomputing the window
    aggregate — Catalyst does not dedupe identical window passes.
    ``interpolate=False`` selects Graphite _getPercentile's default
    NIST rank estimator (see :func:`n_percentile`)."""
    out = out_col or value_col
    if threshold_col is None:
        d = n_percentile(
            tier_df, value_col, p, key, out_col="_thresh", interpolate=interpolate
        )
        thresh, drop = F.col("_thresh"), ["_thresh"]
    else:
        d, thresh, drop = tier_df, F.col(threshold_col), []
    v = F.col(value_col)
    return d.withColumn(out, F.when((v <= thresh) & ~F.isnan(v), v)).drop(*drop)


def remove_below_percentile(
    tier_df: DataFrame,
    value_col: str,
    p: float,
    key: list[str] | None = None,
    out_col: str | None = None,
    threshold_col: str | None = None,
    interpolate: bool = True,
) -> DataFrame:
    """Graphite ``removeBelowPercentile``: the complement
    (``interpolate=False`` = Graphite's rank-selection default, see
    :func:`n_percentile`)."""
    out = out_col or value_col
    if threshold_col is None:
        d = n_percentile(
            tier_df, value_col, p, key, out_col="_thresh", interpolate=interpolate
        )
        thresh, drop = F.col("_thresh"), ["_thresh"]
    else:
        d, thresh, drop = tier_df, F.col(threshold_col), []
    v = F.col(value_col)
    return d.withColumn(out, F.when((v >= thresh) & ~F.isnan(v), v)).drop(*drop)


def _series_stat_filter(tier_df, value_col, key, stat, keep) -> DataFrame:
    key = key or KEY
    v = F.col(value_col)
    w = Window.partitionBy(*key)
    if stat == "avg":
        s = F.avg(F.when(~F.isnan(v), v)).over(w)
    else:  # current = last non-null value in window order
        s = F.last(F.when(~F.isnan(v), v), ignorenulls=True).over(
            Window.partitionBy(*key)
            .orderBy("window_start")
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
    return tier_df.withColumn("_s", s).where(keep(F.col("_s"))).drop("_s")


def average_above(tier_df: DataFrame, value_col: str, threshold: float, key=None) -> DataFrame:
    """Graphite ``averageAbove``: keep whole series whose mean (NaN
    excluded) is >= the threshold (Graphite's boundary is inclusive:
    ``safeAvg(series) >= n``)."""
    return _series_stat_filter(tier_df, value_col, key, "avg", lambda s: s >= threshold)


def average_below(tier_df: DataFrame, value_col: str, threshold: float, key=None) -> DataFrame:
    """Graphite ``averageBelow`` (inclusive boundary, like the rest of
    the family)."""
    return _series_stat_filter(tier_df, value_col, key, "avg", lambda s: s <= threshold)


def current_above(tier_df: DataFrame, value_col: str, threshold: float, key=None) -> DataFrame:
    """Graphite ``currentAbove``: keep series whose LAST (most recent
    non-null) value is >= the threshold (``safeLast(series) >= n``)."""
    return _series_stat_filter(tier_df, value_col, key, "last", lambda s: s >= threshold)


def current_below(tier_df: DataFrame, value_col: str, threshold: float, key=None) -> DataFrame:
    """Graphite ``currentBelow`` (inclusive boundary)."""
    return _series_stat_filter(tier_df, value_col, key, "last", lambda s: s <= threshold)


def most_deviant(
    tier_df: DataFrame, value_col: str, n: int, key: list[str] | None = None
) -> DataFrame:
    """Graphite ``mostDeviant(seriesList, n)``: keep the n series with
    the highest POPULATION variance (Graphite computes
    sum((x-mean)^2)/len, not the sample estimator — with different
    point counts per series the n vs n-1 denominators can flip the
    ranking).  Execution = topk_series' shape: the
    per-series aggregate is ONE row per series (registry-sized), ranked
    globally, winners broadcast-semi-joined back onto the tier rows."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    key = key or KEY
    v = F.col(value_col)
    per_series = (
        tier_df.groupBy(*key)
        .agg(F.var_pop(F.when(~F.isnan(v), v)).alias("_var"))
        .where(F.col("_var").isNotNull())
        .orderBy(F.desc("_var"), *[F.asc(k) for k in key])
        .limit(n)
    )
    return tier_df.join(F.broadcast(per_series.select(*key)), key, "left_semi")
