"""Sessionization (operators/sessions.py): inactivity-gap assignment,
boundary semantics (gap == threshold stays in-session), and per-session
stats — hand-computed on tiny timelines; cross-engine equality is the
driver oracle's job (sessions_30m)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from logtrics_spark.operators.sessions import session_stats, sessionize

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    """rows: (user, offset_seconds)"""
    return spark.createDataFrame(
        [(u, T0 + timedelta(seconds=s)) for u, s in rows],
        "user_id long, ts timestamp",
    )


def test_gap_splits_sessions_and_boundary_stays(spark):
    df = _events(
        spark,
        [
            (1, 0), (1, 100), (1, 400),  # session 1 (gaps 100, 300)
            (1, 700),                    # gap exactly 300 -> SAME session
            (1, 1001 + 700),             # gap 1001 > 300 -> session 2
            (2, 0),                      # other key: own numbering
        ],
    )
    out = sessionize(df, ["user_id"], gap_seconds=300)
    got = {
        (r["user_id"], r["ts"]): r["session_idx"]
        for r in out.collect()
    }
    u1 = [got[(1, T0 + timedelta(seconds=s))] for s in (0, 100, 400, 700, 1701)]
    assert u1 == [1, 1, 1, 1, 2]
    assert got[(2, T0)] == 1


def test_session_stats_counts_and_duration(spark):
    df = _events(spark, [(1, 0), (1, 10), (1, 2000), (1, 2100)])
    out = session_stats(df, ["user_id"], gap_seconds=300).orderBy("session_idx")
    rows = out.collect()
    assert [r["n_events"] for r in rows] == [2, 2]
    assert rows[0]["duration_s"] == pytest.approx(10.0)
    assert rows[1]["duration_s"] == pytest.approx(100.0)
    assert rows[1]["start_us"] - rows[0]["end_us"] == 1990 * 1_000_000


def test_microsecond_precision_boundary(spark):
    """One µs past the threshold must split — the integer-µs compare
    can't be blurred by float epoch rounding."""
    base = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (1, base),
            (1, base + timedelta(seconds=300)),  # == gap -> same
            (1, base + timedelta(seconds=600, microseconds=1)),  # +1µs -> new
        ],
        "user_id long, ts timestamp",
    )
    out = sessionize(df, ["user_id"], gap_seconds=300).orderBy("ts")
    assert [r["session_idx"] for r in out.collect()] == [1, 1, 2]


def test_validation(spark):
    with pytest.raises(ValueError):
        sessionize(None, ["user_id"], gap_seconds=0)


def test_bucketed_equals_direct(spark):
    """session_stats_bucketed (the hot-key scale path) must be
    row-identical to the direct computation — including sessions that
    span one and two bucket edges."""
    import pandas as pd

    from logtrics_spark.operators.sessions import session_stats_bucketed

    rows = []
    # user 1: a session spanning the 3600s bucket edge, plus an
    # isolated later session
    rows += [(1, s) for s in (3500, 3550, 3650, 9000)]
    # user 2: continuous activity every 200s across TWO bucket edges
    rows += [(2, s) for s in range(3000, 11000, 200)]
    # user 3: single event
    rows += [(3, 42)]
    df = _events(spark, rows)

    direct = (
        session_stats(df, ["user_id"], gap_seconds=300)
        .orderBy("user_id", "session_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    bucketed = (
        session_stats_bucketed(
            df, ["user_id"], gap_seconds=300, bucket_seconds=3600
        )
        .orderBy("user_id", "session_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        bucketed[direct.columns.tolist()], direct, check_dtype=False
    )


def test_bucketed_validation(spark):
    from logtrics_spark.operators.sessions import session_stats_bucketed

    with pytest.raises(ValueError, match="must exceed"):
        session_stats_bucketed(None, ["user_id"], gap_seconds=600, bucket_seconds=600)


def test_session_stream_matches_batch(spark, tmp_path):
    """Streaming session_window over two micro-batch appends ==
    batch session_stats (non-boundary gaps; complete output mode)."""
    from logtrics_spark.streaming.session_stream import session_stream

    ev_dir = str(tmp_path / "events")
    rows1 = [(1, 0), (1, 100), (2, 50)]
    rows2 = [(1, 150), (1, 2000), (2, 60)]
    collected = {}

    def run_pass():
        stream = spark.readStream.schema("user_id long, ts timestamp").parquet(ev_dir)
        q = (
            session_stream(stream, ["user_id"], gap_seconds=300)
            .writeStream.outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .foreachBatch(
                lambda df, _b: collected.update(
                    {(r["user_id"], r["start_us"]): r for r in df.collect()}
                )
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _events(spark, rows1).write.mode("append").parquet(ev_dir)
    run_pass()
    _events(spark, rows2).write.mode("append").parquet(ev_dir)
    run_pass()

    batch = session_stats(_events(spark, rows1 + rows2), ["user_id"], gap_seconds=300)
    exp = {(r["user_id"], r["start_us"]): r for r in batch.collect()}
    assert set(collected) == set(exp)
    for k, r in exp.items():
        got = collected[k]
        assert got["n_events"] == r["n_events"]
        assert got["end_us"] == r["end_us"]
        assert got["duration_s"] == r["duration_s"]


def test_session_stream_state_evicts_past_watermark(spark, tmp_path):
    """State stays BOUNDED as event time advances: once the watermark
    passes a session's gap the session is emitted (append mode) and its
    state-store rows are dropped — the streaming analog of the zscore
    stream's window-pruning pin.  Without eviction a long-running
    stream accumulates one state row per session forever."""
    import json

    from logtrics_spark.streaming.session_stream import session_stream

    ev_dir = str(tmp_path / "events")

    def state_rows_after_pass():
        stream = spark.readStream.schema("user_id long, ts timestamp").parquet(ev_dir)
        out = []
        q = (
            session_stream(stream, ["user_id"], gap_seconds=300, watermark="0 seconds")
            .writeStream.outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .foreachBatch(lambda df, _b: out.extend(df.collect()))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # last progress entry that reports the session state operator
        rows_total = None
        for p in q.recentProgress:
            d = json.loads(p.json) if hasattr(p, "json") else p
            ops = d.get("stateOperators") or []
            if ops:
                rows_total = ops[0]["numRowsTotal"]
        return rows_total, out

    # pass 1: two users, one open session each -> 2 state rows, nothing
    # emitted yet (watermark has not passed any session's gap)
    _events(spark, [(1, 0), (1, 100), (2, 50)]).write.mode("append").parquet(ev_dir)
    n1, out1 = state_rows_after_pass()
    assert n1 == 2
    assert out1 == []

    # pass 2: one event far in the future advances the watermark past
    # both old sessions' gaps -> they are EMITTED and their state rows
    # EVICTED; only the new open session remains in the store
    _events(spark, [(1, 10_000)]).write.mode("append").parquet(ev_dir)
    n2, out2 = state_rows_after_pass()
    assert n2 == 1, "closed sessions' state must be evicted, not retained"
    assert {(r["user_id"], r["n_events"]) for r in out2} == {(1, 2), (2, 1)}
