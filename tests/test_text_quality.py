"""Gopher quality + repetition rules (operators/text.py).

Reference semantics: Rae et al. 2021 appendix A1.1 (word-count bounds,
mean word length, symbol-to-word ratio, bullet/ellipsis line fractions,
alphabetic-word fraction, required stop words, duplicate line/paragraph
(character) fractions, top/duplicated n-gram character fractions).
Every metric is pinned against hand-computed values; the n-gram
fractions also against a pure-Python reference on random word soup.
"""

from __future__ import annotations

import random

import pandas as pd
import pyspark.sql.functions as F
import pytest

from logtrics_spark.operators.text import (
    alpha_word_frac,
    bullet_line_frac,
    dup_line_char_frac,
    dup_line_frac,
    dup_ngram_char_frac,
    dup_paragraph_char_frac,
    dup_paragraph_frac,
    ellipsis_line_frac,
    gopher_keep,
    gopher_repetition_keep,
    gopher_stop_hits,
    mean_word_length,
    symbol_word_ratio,
    top_ngram_char_frac,
    word_count,
)

DOCS = [
    (0, "the cat sat on the mat and that was that with a hat"),
    (1, "aaa bbb ccc # ... … ddd"),
    (2, "- one\n- two\n- three\nplain line"),
    (3, "la la la...\nmore text here...\nend"),
    (4, "dup line\ndup line\nother\n\npar a\n\npar a"),
    (5, ""),
    (6, "x y x y x y x y z"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))


def _col_map(docs, col):
    rows = docs.select("doc_id", col.alias("v")).collect()
    return {r["doc_id"]: r["v"] for r in rows}


def test_word_count(docs):
    assert _col_map(docs, word_count("text")) == {
        0: 13, 1: 7, 2: 8, 3: 7, 4: 9, 5: 0, 6: 9,
    }


def test_mean_word_length(docs):
    got = _col_map(docs, mean_word_length("text"))
    assert got[0] == pytest.approx(39 / 13)
    assert got[1] == pytest.approx(17 / 7)
    assert got[5] is None  # no words -> no mean


def test_symbol_word_ratio(docs):
    got = _col_map(docs, symbol_word_ratio("text"))
    assert got[1] == pytest.approx(3 / 7)  # '#', '...', U+2026
    assert got[3] == pytest.approx(2 / 7)  # two '...' runs
    assert got[0] == 0.0 and got[5] == 0.0


def test_alpha_word_frac(docs):
    got = _col_map(docs, alpha_word_frac("text"))
    assert got[0] == 1.0
    assert got[1] == pytest.approx(4 / 7)  # '#' '...' '…' carry no alpha
    assert got[2] == pytest.approx(5 / 8)  # three bare '-' bullets don't
    assert got[5] == 0.0


def test_gopher_stop_hits(docs):
    got = _col_map(docs, gopher_stop_hits("text"))
    # doc 0 contains the/and/that/with -> 4 DISTINCT required words
    assert got[0] == 4
    assert got[1] == 0 and got[5] == 0


def test_line_fractions(docs):
    assert _col_map(docs, bullet_line_frac("text"))[2] == pytest.approx(3 / 4)
    assert _col_map(docs, ellipsis_line_frac("text"))[3] == pytest.approx(2 / 3)
    dlf = _col_map(docs, dup_line_frac("text"))
    assert dlf[4] == pytest.approx(3 / 7)  # 7 lines (2 empty), 4 distinct
    assert dlf[0] == 0.0
    # line chars: 8+8+5+0+5+0+5 = 31 total, 8+5+0+5 = 18 distinct
    assert _col_map(docs, dup_line_char_frac("text"))[4] == pytest.approx(13 / 31)


def test_paragraph_fractions(docs):
    dpf = _col_map(docs, dup_paragraph_frac("text"))
    assert dpf[4] == pytest.approx(1 / 3)  # 3 paras, 'par a' twice
    got = _col_map(docs, dup_paragraph_char_frac("text"))
    # para chars: len('dup line\ndup line\nother')=23 + 5 + 5 = 33, dup 5
    assert got[4] == pytest.approx(5 / 33)


def test_gopher_keep_thresholds(docs):
    got = _col_map(docs, gopher_keep("text", min_words=3))
    # doc 0 passes everything; 1 fails symbols+alpha+stops; 2 fails
    # stops (and mean word len); 3 fails ellipsis lines; 4 fails dup
    # lines; 5 empty; 6 fails mean word length (1.0 < 3)
    assert got == {0: True, 1: False, 2: False, 3: False, 4: False, 5: False, 6: False}
    # the published default demands >= 50 words: doc 0 now fails too
    strict = _col_map(docs, gopher_keep("text"))
    assert strict[0] is False


def test_top_ngram_char_frac(docs):
    rows = {
        r["doc_id"]: r
        for r in top_ngram_char_frac(docs, 2).collect()
    }
    assert rows[6]["top_gram"] == "x y" and rows[6]["top_count"] == 4
    assert rows[6]["frac"] == pytest.approx(4 * 3 / 17)
    assert rows[4]["top_gram"] == "dup line" and rows[4]["top_count"] == 2
    # doc 5 has no 2-grams -> frac 0, null gram
    assert rows[5]["top_gram"] is None and rows[5]["frac"] == 0.0
    # all-unique grams: count 1, deterministic min-gram tiebreak
    assert rows[0]["top_count"] == 1 and rows[0]["top_gram"] == "a hat"


def test_dup_ngram_char_frac(docs):
    rows = {r["doc_id"]: r for r in dup_ngram_char_frac(docs, 2).collect()}
    # 'x y' x4 -> 3 extra * 3 chars; 'y x' x3 -> 2 extra * 3 chars
    assert rows[6]["dup_chars"] == 15
    assert rows[6]["frac"] == pytest.approx(15 / 17)
    assert rows[0]["dup_chars"] == 0 and rows[0]["frac"] == 0.0


def _py_ngram_fracs(text: str, n: int):
    """Independent pure-Python reference for both n-gram fractions."""
    words = text.strip().lower().split()
    grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    if not grams or not text:
        return 0.0, 0.0
    counts: dict[str, int] = {}
    for g in grams:
        counts[g] = counts.get(g, 0) + 1
    mx = max(counts.values())
    top_g = min(g for g, c in counts.items() if c == mx)
    top_frac = mx * len(top_g) / len(text)
    dup_chars = sum((c - 1) * len(g) for g, c in counts.items() if c > 1)
    return top_frac, dup_chars / len(text)


def test_ngram_fracs_vs_python_reference(spark):
    rng = random.Random(7)
    vocab = ["alpha", "beta", "gg", "delta", "ee", "zeta"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40))))
        for i in range(60)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    for n in (2, 3, 5):
        top = {r["doc_id"]: r["frac"] for r in top_ngram_char_frac(df, n).collect()}
        dup = {r["doc_id"]: r["frac"] for r in dup_ngram_char_frac(df, n).collect()}
        for i, text in rows:
            exp_top, exp_dup = _py_ngram_fracs(text, n)
            assert top[i] == pytest.approx(exp_top), (i, n, text)
            assert dup[i] == pytest.approx(exp_dup), (i, n, text)


def test_gopher_repetition_keep(docs):
    kept = {
        r["doc_id"]
        for r in gopher_repetition_keep(docs, top_ns={2: 0.5}, dup_ns={}).collect()
    }
    assert kept == {0, 1, 2, 3, 4, 5}  # doc 6's top 2-gram covers 70%
    kept2 = {
        r["doc_id"]
        for r in gopher_repetition_keep(
            docs, top_ns={2: 0.5}, dup_ns={2: 0.3}
        ).collect()
    }
    assert kept2 == {0, 1, 2, 3, 5}  # doc 4's dup 'dup line' grams > 30%


def test_curate_gopher_stage(spark):
    from logtrics_spark.plans.curation import curate

    rows = [
        (0, "src", "the cat sat on the mat and that was that with a hat"),
        (1, "src", "x y x y x y x y z"),  # fails mean word length
        (2, "src", "the fox and the hound have been to the fair with joy"),
        (3, "src", "spark " * 60 + "the and"),  # top-2gram repetition kill
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "source", "text"]))
    kept, stats = curate(
        df,
        min_quality=None,
        gopher=True,
        gopher_opts={"min_words": 3},
        gopher_top_ns={2: 0.2},
        gopher_dup_ns={},
        near_dup=False,
    )
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert ids == {0, 2}
    assert stats["gopher_filter"] == 3  # doc 1 dropped by the doc-local rules
    assert stats["gopher_repetition"] == 2  # doc 3 dropped by repetition


# ------------------------------------------------------------------- C4


def test_c4_clean_lines(spark):
    from logtrics_spark.operators.text import c4_clean

    rows = [
        (
            0,
            "This line has enough words to survive.\n"
            "short line.\n"
            "This line has five words but no terminal punctuation\n"
            "Please enable javascript to view this page.\n"
            "Another perfectly reasonable sentence stays here!",
        ),
        (1, "nothing survives here\n{ code }"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {
        r["doc_id"]: r["clean"]
        for r in df.select("doc_id", c4_clean("text").alias("clean")).collect()
    }
    assert got[0] == (
        "This line has enough words to survive.\n"
        "Another perfectly reasonable sentence stays here!"
    )
    assert got[1] == ""


def test_c4_keep(spark):
    from logtrics_spark.operators.text import c4_keep

    rows = [
        (0, "One sentence. Two sentences! Three sentences?"),
        (1, "Only one sentence here."),
        (2, "Code ahead. Really it is. Believe me. { return 0; }"),
        (3, "Lorem ipsum dolor sit amet. Filler text. More filler."),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {
        r["doc_id"]: r["keep"]
        for r in df.select("doc_id", c4_keep("text").alias("keep")).collect()
    }
    assert got == {0: True, 1: False, 2: False, 3: False}
