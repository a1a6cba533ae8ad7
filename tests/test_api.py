"""Parser + handler semantics oracles (FIXTURES.md F2, SURVEY.md §5.1).

Every case cites the reference behavior it pins down.
"""

from __future__ import annotations

import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from logtrics_spark.api import Engine


@pytest.fixture()
def lines(spark):
    rows = [
        ("console", 'hello "World"'),          # examples/scripts/logtrics.lua:25
        ("console", "no match here"),           # silent skip (logtrics.go:184-187)
        ("udp", 'hello "Spark" and hello "Again"'),  # first match only (parser.go:45)
        ("tcp", "num=42 dur=4.9 bad=abc"),     # ToInt64 coercion cases
        ("tcp", ""),                            # empty line
    ]
    pdf = pd.DataFrame(rows, columns=["source", "line"])
    pdf["ts"] = pd.to_datetime("2024-01-01") + pd.to_timedelta(pdf.index, unit="min")
    return spark.createDataFrame(pdf)


def test_match_gate_and_first_match(spark, lines):
    """Non-matching lines dropped silently; first match wins."""
    eng = Engine()

    def handler(caps, m):
        m.meter("hits").mark(1)

    eng.rule("hello", r'hello "(?P<first>[a-zA-z0-9]+)"', handler)
    got = eng.run(lines).toPandas()
    assert len(got) == 2  # console 'hello "World"' + udp double-hello (once)
    assert set(got["source"]) == {"console", "udp"}


def test_named_captures_and_metadata(spark, lines):
    """Named groups extracted; _source/_line injected (logtrics.go:190-196)."""
    seen = {}

    def handler(caps, m):
        # runs on executors — assert by emitting values derived from caps
        assert "_source" in caps.columns and "_line" in caps.columns
        m.gauge("len.first").update(caps["first"].str.len())

    eng = Engine()
    eng.rule("hello", r'hello "(?P<first>[a-zA-z0-9]+)"', handler)
    got = eng.run(lines).toPandas().sort_values("source").reset_index(drop=True)
    # World -> 5; Spark (first match, not Again) -> 5
    assert list(got["value"]) == [5, 5]


def test_unnamed_groups_dropped(spark, lines):
    """Unnamed groups are not captures (parser.go:51-53)."""

    def handler(caps, m):
        cap_cols = [c for c in caps.columns if not c.startswith("_")]
        assert cap_cols == ["n"], cap_cols
        m.counter("n").inc(caps["n"])

    eng = Engine()
    eng.rule("mixed", r"num=(?P<n>\d+) dur=(\d+\.\d+)", handler)
    got = eng.run(lines).toPandas()
    assert list(got["value"]) == [42]


def test_pattern_without_named_groups_rejected():
    eng = Engine()
    with pytest.raises(ValueError, match="no named groups"):
        eng.rule("bad", r"hello (\w+)", lambda c, m: None)


def test_invalid_regex_fails_registration():
    eng = Engine()
    with pytest.raises(re.error):
        eng.rule("broken", r"(?P<x>[unclosed", lambda c, m: None)


def test_int64_coercion(spark, lines):
    """'42'->42, '4.9'->4 (truncate), 'abc'->0 (graphite.go ToInt64)."""

    def handler(caps, m):
        m.gauge("n").update(caps["n"])
        m.gauge("d").update(caps["d"])
        m.gauge("b").update(caps["b"])

    eng = Engine()
    eng.rule("coerce", r"num=(?P<n>\S+) dur=(?P<d>\S+) bad=(?P<b>\S+)", handler)
    got = eng.run(lines).toPandas().set_index("metric")["value"]
    assert got["n"] == 42 and got["d"] == 4 and got["b"] == 0


def test_counter_inc_dec_and_negative(spark, lines):
    def handler(caps, m):
        c = m.counter("c")
        c.inc(caps["n"])
        c.dec(2)

    eng = Engine()
    eng.rule("cd", r"num=(?P<n>\d+)", handler)
    got = eng.run(lines).toPandas()
    assert sorted(got["value"]) == [-2, 42]
    assert set(got["kind"]) == {"counter"}


def test_rule_error_isolation(spark, lines):
    """A raising handler must not kill sibling rules (script.go:59-62),
    and the failure surfaces as a _rule_errors counter point instead of
    vanishing silently (VERDICT r1 / ADVICE)."""

    def broken(caps, m):
        raise RuntimeError("boom")

    def fine(caps, m):
        m.meter("ok").mark(1)

    eng = Engine()
    eng.rule("broken", r'hello "(?P<first>\w+)"', broken)
    eng.rule("fine", r'hello "(?P<first>\w+)"', fine)
    got = eng.run(lines).toPandas()
    assert set(got["metric"]) == {"ok", "_rule_errors.broken"}
    errs = got[got["metric"] == "_rule_errors.broken"]
    assert (errs["source"] == "_engine").all()
    assert (errs["kind"] == "counter").all()
    assert errs["value"].sum() >= 1
    assert (got[got["metric"] == "ok"]["value"] == 1).all()


def test_rule_failure_ships_no_partial_points(spark, lines):
    """A handler that emits some points and THEN raises must ship NONE
    of them — frames are buffered per rule and published only on
    success (ADVICE: partial-flush hole)."""

    def partial(caps, m):
        m.counter("before.crash").inc(1)
        raise RuntimeError("after emitting")

    eng = Engine()
    eng.rule("partial", r'hello "(?P<first>\w+)"', partial)
    got = eng.run(lines).toPandas()
    assert "before.crash" not in set(got["metric"])
    assert set(got["metric"]) == {"_rule_errors.partial"}


def test_rule_logging_surface(spark, lines):
    """U2: handlers get the reference's six log functions via m.log
    (logtrics.go:162-173); logging must not disturb point emission."""
    from logtrics_spark.api import RuleLogger

    def handler(caps, m):
        m.log.info("saw %d rows", len(caps))
        m.log.debug("first capture: %s", caps["first"].iloc[0])
        m.log.trace("trace level works")
        m.meter("logged").mark(1)

    eng = Engine()
    eng.rule("logger", r'hello "(?P<first>\w+)"', handler)
    got = eng.run(lines).toPandas()
    assert set(got["metric"]) == {"logged"}
    # all six reference functions exist driver-side too
    rl = RuleLogger("unit")
    for fn in ("fatal", "error", "warn", "info", "debug", "trace"):
        getattr(rl, fn)("msg %s", "arg")


def test_multiple_rules_shared_scan(spark, lines):
    """Fan-out: every line offered to every rule (app.go:74-85)."""
    eng = Engine()
    eng.rule("hello", r'hello "(?P<w>\w+)"', lambda c, m: m.meter("hello").mark(1))
    eng.rule("nums", r"num=(?P<n>\d+)", lambda c, m: m.counter("nums").inc(c["n"]))
    got = eng.run(lines).toPandas()
    assert set(got["metric"]) == {"hello", "nums"}


def test_points_feed_rollup(spark, lines):
    """Engine output composes with the rollup operators."""
    from logtrics_spark.operators.rollup import rollup

    eng = Engine()
    eng.rule("hello", r'hello "(?P<w>\w+)"', lambda c, m: m.meter("hits").mark(1))
    tier = rollup(eng.run(lines), "1h").toPandas()
    assert tier["cnt"].sum() == 2
