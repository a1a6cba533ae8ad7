"""Physical-plan regression tests (SURVEY.md §4): the plans that make
this engine viable at 100 TB must not silently regress.
"""

from __future__ import annotations

import pytest

from logtrics_spark.datagen import gen_tokseq
from logtrics_spark.operators.extract import extract_points
from logtrics_spark.operators.rollup import cascade, rollup


@pytest.fixture(scope="module")
def raw(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "raw")
    gen_tokseq(spark, 2000, partitions=2).write.parquet(path)
    return spark.read.parquet(path)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_rollup_plan_single_exchange_partial_agg(spark, raw):
    plan = _plan(rollup(extract_points(raw), "1m"))
    assert plan.count("Exchange") == 1, plan
    assert "partial_count" in plan and "partial_max_by" in plan, plan


def test_filter_pushdown_reaches_scan(spark, raw):
    plan = _plan(rollup(extract_points(raw.where("source = 'web'")), "1m"))
    scan = [ln for ln in plan.splitlines() if "PushedFilters" in ln or "FileScan" in ln]
    assert any("EqualTo(source,web)" in ln for ln in scan), plan


def test_token_column_never_scanned(spark, raw):
    plan = _plan(rollup(extract_points(raw), "1h"))
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "tokens" not in read, read


def test_cascade_adds_one_exchange_on_tiny_data(spark, raw):
    fine = rollup(extract_points(raw), "1m")
    plan = _plan(cascade(fine, "1m", "5m"))
    # raw->1m exchange + 1m->5m exchange, nothing more
    assert plan.count("Exchange") == 2, plan
    assert "partial_sum" in plan


def test_gapfill_join_is_not_cartesian(spark, raw):
    from logtrics_spark.operators.gapfill import dense_spine

    plan = _plan(dense_spine(rollup(extract_points(raw), "1h"), "1h"))
    assert "CartesianProduct" not in plan
    assert "Join" in plan or "join" in plan


def test_no_python_udfs_in_native_path(spark, raw):
    """The hot path (extract native + rollup + cascade) must stay JVM-side:
    no BatchEvalPython / ArrowEvalPython / MapInPandas nodes."""
    tiers = cascade(rollup(extract_points(raw), "1m"), "1m", "5m")
    plan = _plan(tiers)
    for marker in ["BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"]:
        assert marker not in plan, marker
