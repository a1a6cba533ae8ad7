"""K2/K3 parity tests: Graphite plaintext formatting, TCP emission,
debug registry log (reference graphite/graphite.go:61-98, 75-83)."""

from __future__ import annotations

import logging
import socket
import socketserver
import threading

import pandas as pd
import pytest
from pyspark.sql import functions as F

BASE = pd.Timestamp("2024-01-01 00:00:00")


@pytest.fixture()
def tier_df(spark):
    rows = pd.DataFrame(
        {
            "source": ["web", "web", "api", "api"],
            "metric": ["req.total", "mem.used", "req.rate", "lat.ms"],
            "kind": ["counter", "gauge", "meter", "timer"],
            "window_start": [BASE] * 4,
            "cnt": [10, 3, 60, 4],
            "sum": [100, 30, 60, 44],
            "min": [1, 5, 1, 2],
            "max": [20, 15, 1, 20],
            "avg": [10.0, 10.0, 1.0, 11.0],
            "last": [20, 15, 1, 20],
            "rate": [10 / 60.0, 3 / 60.0, 1.0, 4 / 60.0],
            "cum_sum": [250, 30, 60, 44],
            "stddev": [0.0, 0.0, 0.0, 7.5],
        }
    )
    return spark.createDataFrame(rows)


def test_graphite_line_golden_format(spark, tier_df):
    """Exact reporter lines: `<prefix>.<source>.<metric>.<field> <value>
    <window-end epoch>` — the go-metrics-graphite plaintext shape."""
    from logtrics_spark.sinks.graphite import to_graphite_lines

    got = sorted(r["line"] for r in to_graphite_lines(tier_df, "1m").collect())
    epoch = int(BASE.timestamp()) + 60
    assert f"logtrics.web.req.total.count 250 {epoch}" in got  # cum_sum preferred
    assert f"logtrics.web.mem.used.value 15 {epoch}" in got
    assert f"logtrics.api.req.rate.count 60 {epoch}" in got
    assert f"logtrics.api.req.rate.mean-rate 1.000000 {epoch}" in got
    assert f"logtrics.api.lat.ms.count 4 {epoch}" in got
    assert f"logtrics.api.lat.ms.mean 11.000000 {epoch}" in got
    assert f"logtrics.api.lat.ms.std-dev 7.500000 {epoch}" in got
    assert f"logtrics.api.lat.ms.mean-rate 0.066667 {epoch}" in got
    # one line per (kind-appropriate field x row), nothing else:
    # counter 1, gauge 1, meter count+mean-rate, timer
    # count/min/max/mean/std-dev/mean-rate
    assert len(got) == 1 + 1 + 2 + 6


def test_graphite_no_mapped_columns_yields_empty_frame(spark, tier_df):
    """A tier frame with none of the mapped value columns must format to
    an EMPTY lines frame, not raise from exploding a null literal."""
    from logtrics_spark.sinks.graphite import to_graphite_lines

    bare = tier_df.select("source", "metric", "kind", "window_start")
    got = to_graphite_lines(bare, "1m")
    assert got.columns == ["line"]
    assert got.count() == 0


def test_graphite_counter_falls_back_to_window_delta(spark, tier_df):
    from logtrics_spark.sinks.graphite import to_graphite_lines

    got = sorted(
        r["line"]
        for r in to_graphite_lines(tier_df.drop("cum_sum"), "1m").collect()
    )
    assert any(line.startswith("logtrics.web.req.total.count 100 ") for line in got)


def test_graphite_timer_duration_unit(spark, tier_df):
    """DurationUnit parity (graphite/graphite.go:71): ns-valued timers
    report duration fields in seconds; count/mean-rate are untouched."""
    from logtrics_spark.sinks.graphite import to_graphite_lines

    ns = tier_df.where("kind = 'timer'").withColumn(
        "min", F.col("min") * 1_000_000_000
    ).withColumn("avg", F.col("avg") * 1_000_000_000)
    got = sorted(
        r["line"]
        for r in to_graphite_lines(ns, "1m", timer_duration_unit=1e9).collect()
    )
    epoch = int(BASE.timestamp()) + 60
    assert f"logtrics.api.lat.ms.min 2.000000 {epoch}" in got
    assert f"logtrics.api.lat.ms.mean 11.000000 {epoch}" in got
    assert f"logtrics.api.lat.ms.count 4 {epoch}" in got  # not scaled
    assert f"logtrics.api.lat.ms.mean-rate 0.066667 {epoch}" in got  # not scaled


def test_graphite_tcp_emission(spark, tier_df):
    """Lines arrive byte-for-byte over a real TCP listener."""
    from logtrics_spark.sinks.graphite import send_graphite_tcp, to_graphite_lines

    received: list[bytes] = []

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            for ln in self.rfile:
                received.append(ln.rstrip(b"\n"))

    server = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        lines = to_graphite_lines(tier_df, "1m")
        expected = sorted(r["line"] for r in lines.collect())
        send_graphite_tcp(lines, "127.0.0.1", port)
        deadline = threading.Event()
        for _ in range(100):
            if len(received) >= len(expected):
                break
            deadline.wait(0.05)
        assert sorted(x.decode() for x in received) == expected
    finally:
        server.shutdown()
        server.server_close()


def test_graphite_debug_sink_logs_registry(spark, tier_df, caplog):
    """graphite.debug=True logs the formatted snapshot per batch (K3)."""
    from logtrics_spark.sinks.graphite import graphite_batch_sink

    sink = graphite_batch_sink("1m", debug=True)
    with caplog.at_level(logging.DEBUG, logger="logtrics_spark.graphite"):
        sink(tier_df, batch_id=7)
    msgs = [r.getMessage() for r in caplog.records]
    assert any("batch=7" in m and "logtrics.web.req.total.count 250" in m for m in msgs)
    assert len(msgs) == 10
