"""Corpus-level paragraph dedup (operators/dedup.py dedup_paragraphs).

Semantics pinned: a paragraph occurring more than once across the
corpus survives only at its first (id, pos) occurrence; short
paragraphs (< min_chars) are exempt; docs that lose everything come
back with empty text; survivor order is the original document order.
"""

from __future__ import annotations

import pandas as pd

from logtrics_spark.operators.dedup import dedup_paragraphs


def _run(spark, rows, **kw):
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = dedup_paragraphs(df, **kw).collect()
    return {r["doc_id"]: r["text"] for r in out}


def test_cross_doc_first_occurrence_wins(spark):
    rows = [
        (0, "alpha\n\nshared para\n\nomega"),
        (1, "shared para\n\nunique one"),
        (2, "unique two\n\nshared para"),
    ]
    got = _run(spark, rows)
    # doc 0 holds the first (id, pos) occurrence of 'shared para'
    assert got[0] == "alpha\n\nshared para\n\nomega"
    assert got[1] == "unique one"
    assert got[2] == "unique two"


def test_within_doc_duplicates_also_cut(spark):
    got = _run(spark, [(0, "same\n\nsame\n\nother")])
    assert got[0] == "same\n\nother"


def test_doc_losing_everything_returns_empty(spark):
    rows = [(0, "only para"), (1, "only para")]
    got = _run(spark, rows)
    assert got[0] == "only para"
    assert got[1] == ""


def test_min_chars_exempts_short_paragraphs(spark):
    rows = [(0, "hi\n\nlong paragraph text"), (1, "hi\n\nlong paragraph text")]
    got = _run(spark, rows, min_chars=5)
    # 'hi' (< 5 chars) is exempt and survives in BOTH docs; the long
    # paragraph survives only in doc 0
    assert got[0] == "hi\n\nlong paragraph text"
    assert got[1] == "hi"


def test_custom_sep_and_joiner(spark):
    rows = [(0, "a merge b merge c"), (1, "b merge d")]
    got = _run(spark, rows, sep=" merge ", joiner=" <p> ")
    assert got[0] == "a <p> b <p> c"
    assert got[1] == "d"


def test_order_preserved_and_multisplit_sep(spark):
    # \n{2,} treats any blank-line run as one separator
    rows = [(0, "z last\n\n\n\na first\n\nm mid")]
    got = _run(spark, rows)
    assert got[0] == "z last\n\na first\n\nm mid"


def test_null_text_returns_empty(spark):
    got = _run(spark, [(0, None), (1, "real para")])
    assert got[0] == "" and got[1] == "real para"
