"""Decontamination tests (operators/decontam.py) — n-gram overlap
flagging against a benchmark set, checked against a from-scratch
Python gram computation."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from logtrics_spark.operators.decontam import decontaminate, gram_fingerprints


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )


def _py_grams(text: str, n: int) -> set[str]:
    """Independent gram definition: lowercased whitespace words; docs
    shorter than n yield the whole doc as one partial gram (the
    _shingle_rows convention)."""
    words = text.strip().lower().split()
    if len(words) < n:
        return {" ".join(words)}
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


BENCH = [
    (100, "the quick brown fox jumps over the lazy dog tonight"),
    (101, "pack my box with five dozen liquor jugs right now"),
]

TRAIN = [
    # contains BENCH[0]'s words 3..7 verbatim -> flagged at n=5
    (1, "intro words then fox jumps over the lazy ending words here"),
    # clean: shares vocabulary but no 5-gram run
    (2, "the brown dog jumps quick over fox lazy the tonight"),
    # exact copy of a benchmark doc -> every gram matches
    (3, "pack my box with five dozen liquor jugs right now"),
    # short doc (< n words), not contained in any benchmark text
    (4, "unrelated tiny doc"),
]


@pytest.fixture(scope="module")
def frames(spark):
    return _docs(spark, TRAIN), _docs(spark, BENCH)


def test_report_matches_python_oracle(spark, frames):
    train, bench = frames
    n = 5
    got = {
        r["doc_id"]: r.asDict()
        for r in decontaminate(train, bench, n=n, min_matches=0).collect()
    }
    bench_grams = set().union(*(_py_grams(t, n) for _, t in BENCH))
    for doc_id, text in TRAIN:
        grams = _py_grams(text, n)
        matched = len(grams & bench_grams)
        row = got[doc_id]
        assert row["n_grams"] == len(grams), doc_id
        assert row["matched_grams"] == matched, doc_id
        assert row["contamination"] == pytest.approx(matched / len(grams))


def test_min_matches_filters_clean_docs(spark, frames):
    train, bench = frames
    flagged = {
        r["doc_id"] for r in decontaminate(train, bench, n=5).collect()
    }
    assert flagged == {1, 3}


def test_exact_copy_fully_contaminated(spark, frames):
    train, bench = frames
    row = (
        decontaminate(train, bench, n=5)
        .where(F.col("doc_id") == 3)
        .collect()[0]
    )
    assert row["matched_grams"] == row["n_grams"]
    assert row["contamination"] == 1.0


def test_short_doc_partial_gram_containment(spark):
    """A doc shorter than n flags iff its whole text is itself a gram
    of the benchmark (the partial-gram convention, documented)."""
    bench = _docs(spark, [(9, "alpha beta gamma delta epsilon zeta")])
    train = _docs(spark, [(1, "beta gamma delta"), (2, "delta beta")])
    got = {r["doc_id"]: r for r in decontaminate(train, bench, n=3).collect()}
    assert got[1]["matched_grams"] == 1  # 'beta gamma delta' is a bench 3-gram
    assert 2 not in got


def test_repeated_gram_counts_once(spark):
    bench = _docs(spark, [(9, "x y z")])
    train = _docs(spark, [(1, "x y z pad x y z pad x y z")])
    row = decontaminate(train, bench, n=3).collect()[0]
    # 9 gram positions but distinct grams only; 'x y z' matched once
    assert row["matched_grams"] == 1
    assert row["n_grams"] < 9


def test_broadcast_off_same_result(spark, frames):
    train, bench = frames
    a = decontaminate(train, bench, n=5, min_matches=0, broadcast=True)
    b = decontaminate(train, bench, n=5, min_matches=0, broadcast=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_gram_fingerprints_distinct_per_doc(spark):
    df = _docs(spark, [(1, "a b a b a b")])
    fps = gram_fingerprints(df, 2).collect()
    assert len(fps) == 2  # 'a b' and 'b a', each once


def test_bad_params_raise(spark, frames):
    train, bench = frames
    with pytest.raises(ValueError):
        decontaminate(train, bench, n=0)
    with pytest.raises(ValueError):
        decontaminate(train, bench, min_matches=-1)


def _tok_docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "tokens"])
    )


def _py_tok_grams(tokens: list[int], n: int) -> set[tuple]:
    if len(tokens) < n:
        return {tuple(tokens)}
    return {tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1)}


TOK_BENCH = [(100, [1, 2, 3, 4, 5, 6]), (101, [9, 9, 9])]
TOK_TRAIN = [
    (1, [7, 7, 2, 3, 4, 8, 8]),  # contains bench 3-gram (2,3,4)
    (2, [4, 3, 2, 1, 6, 5]),     # same values, no ordered 3-gram run
    (3, [1, 2, 3, 4, 5, 6]),     # exact copy
    (4, [9, 9]),                 # short, not a bench gram itself
]


def test_token_report_matches_python_oracle(spark):
    train, bench = _tok_docs(spark, TOK_TRAIN), _tok_docs(spark, TOK_BENCH)
    from logtrics_spark.operators.decontam import decontaminate_tokens

    got = {
        r["doc_id"]: r.asDict()
        for r in decontaminate_tokens(train, bench, n=3, min_matches=0).collect()
    }
    bench_grams = set().union(*(_py_tok_grams(t, 3) for _, t in TOK_BENCH))
    for doc_id, toks in TOK_TRAIN:
        grams = _py_tok_grams(toks, 3)
        matched = len(grams & bench_grams)
        assert got[doc_id]["n_grams"] == len(grams), doc_id
        assert got[doc_id]["matched_grams"] == matched, doc_id
    flagged = {
        r["doc_id"]
        for r in decontaminate_tokens(train, bench, n=3).collect()
    }
    assert flagged == {1, 3}


def test_token_plan_no_shuffle_before_groupby(spark):
    """Gram extraction is one array-HOF projection (per-doc dedup via
    array_distinct, not a row distinct): the ONLY shuffle exchange in
    the plan is the per-doc aggregate — plus the benchmark broadcast —
    never a window/sort/distinct over exploded tokens."""
    from logtrics_spark.operators.decontam import decontaminate_tokens

    train, bench = _tok_docs(spark, TOK_TRAIN), _tok_docs(spark, TOK_BENCH)
    plan = (
        decontaminate_tokens(train, bench, n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan and "Sort" not in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # corpus side: exactly one exchange (the per-doc agg).  The
    # BroadcastExchange subtree (printed after it) holds the benchmark
    # set's own tiny distinct exchange, which is fine.
    corpus_side = plan.split("BroadcastExchange")[0]
    assert corpus_side.count("Exchange hashpartitioning") == 1, plan


def test_null_and_empty_content_absent_from_report(spark):
    """Null/whitespace-only text and null/empty token arrays carry no
    grams: absent from the min_matches=0 report, and two empty docs
    never 'match' each other through a degenerate gram."""
    from logtrics_spark.operators.decontam import (
        decontaminate,
        decontaminate_tokens,
    )

    train = _docs(spark, [(1, None), (2, "   "), (3, "real words here")])
    bench = _docs(spark, [(9, None), (8, "   ")])
    rep = decontaminate(train, bench, n=2, min_matches=0).collect()
    assert {r["doc_id"] for r in rep} == {3}
    assert rep[0]["matched_grams"] == 0

    ttrain = _tok_docs(spark, [(1, None), (2, []), (3, [5, 6, 7])])
    tbench = _tok_docs(spark, [(9, None), (8, [])])
    trep = decontaminate_tokens(ttrain, tbench, n=2, min_matches=0).collect()
    assert {r["doc_id"] for r in trep} == {3}
    assert trep[0]["matched_grams"] == 0


def test_plan_broadcast_and_no_python(spark, frames):
    """The scale contract: benchmark side broadcast, no Python stages,
    no cartesian product."""
    train, bench = frames
    plan = decontaminate(train, bench, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
