"""BPE tokenizer (operators/bpe.py — Sennrich et al. 2016).

Pins: the paper's worked merge order on the classic low/lower/newest/
widest corpus, encode/decode roundtrip, distributed == driver encode,
unknown-character handling, deterministic retrain, and the
documents -> token-table -> rollup integration (the tokens-axis
bridge the north rule's input shape assumes).
"""

from __future__ import annotations

import json

import pandas as pd
import pyspark.sql.functions as F
import pytest

from logtrics_spark.operators.bpe import (
    EOW,
    UNK_ID,
    _encode_word,
    bpe_decode,
    bpe_encode,
    train_bpe,
)


@pytest.fixture(scope="module")
def classic(spark):
    """The Sennrich 2016 example corpus: low x5, lower x2, newest x6,
    widest x3 — one doc per occurrence so word freqs are exact."""
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    pdf = pd.DataFrame({"doc_id": range(len(words)), "text": words})
    return spark.createDataFrame(pdf)


def test_classic_merge_order(classic):
    # base alphabet: 11 symbols + <unk> = 12; vocab_size 15 -> 3 merges
    model = train_bpe(classic, vocab_size=15)
    assert model["merges"] == [
        ("e", "s"),          # 9 occurrences (newest + widest)
        ("es", "t" + EOW),   # 9
        ("l", "o"),          # 7 (the e/s-t tie broke lexicographically)
    ]
    assert len(model["vocab"]) == 15
    assert model["vocab"]["<unk>"] == UNK_ID


def test_encode_segments_unseen_word(classic):
    model = train_bpe(classic, vocab_size=15)
    ranks = {tuple(p): i for i, p in enumerate(model["merges"])}
    ids = _encode_word("lowest", ranks, model["vocab"])
    inv = {v: k for k, v in model["vocab"].items()}
    # the paper's promise: 'lowest' (never seen) segments into known
    # subwords via the learned merges
    assert [inv[i] for i in ids] == ["lo", "w", "est" + EOW]


def test_roundtrip_and_distributed_matches_driver(spark, classic):
    model = train_bpe(classic, vocab_size=20)
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": ["low lower newest", "widest low", "newest newest lowest"],
            }
        )
    )
    enc = bpe_encode(docs, model)
    rows = {r["doc_id"]: r for r in enc.collect()}
    # distributed == driver loop
    ranks = {tuple(p): i for i, p in enumerate(model["merges"])}
    for did, text in [(0, "low lower newest"), (1, "widest low"), (2, "newest newest lowest")]:
        exp = [t for w in text.split() for t in _encode_word(w, ranks, model["vocab"])]
        assert list(rows[did]["tokens"]) == exp
        assert rows[did]["n_tok"] == len(exp)
    # decode restores the (single-spaced) text — all chars trained
    dec = {r["doc_id"]: r["text"] for r in bpe_decode(enc, model).collect()}
    assert dec == {0: "low lower newest", 1: "widest low", 2: "newest newest lowest"}


def test_unknown_chars_map_to_unk(spark, classic):
    model = train_bpe(classic, vocab_size=15)
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": ["qlow"]}))
    ids = bpe_encode(docs, model).first()["tokens"]
    assert UNK_ID in ids  # 'q' was never in the training alphabet


def test_empty_text_encodes_empty(spark, classic):
    model = train_bpe(classic, vocab_size=15)
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [""]}))
    row = bpe_encode(docs, model).first()
    assert list(row["tokens"]) == [] and row["n_tok"] == 0


def test_deterministic_retrain(classic):
    m1 = train_bpe(classic, vocab_size=18, seed=7)
    m2 = train_bpe(classic, vocab_size=18, seed=7)
    assert m1 == m2


def test_documents_to_rollup_integration(spark):
    """The tokens-axis bridge: raw documents -> BPE token table in the
    north-rule input shape -> metric extraction -> hourly rollup."""
    from logtrics_spark.operators.extract import extract_points
    from logtrics_spark.operators.rollup import rollup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = train_bpe(docs, vocab_size=200, sample_rows=1000)
    tok = bpe_encode(docs, model, keep_cols=["source"])
    assert tok.schema["tokens"].dataType.simpleString() == "array<int>"
    assert tok.where(F.col("n_tok") <= 0).count() == 0
    pts = extract_points(tok)
    r = rollup(pts, "1h")
    assert r.count() > 0
    # token ids stay inside the trained vocab
    mx = tok.select(F.max(F.array_max("tokens"))).first()[0]
    assert mx < len(model["vocab"])


def test_tokenize_cli(spark, tmp_path, capsys):
    from logtrics_spark.__main__ import main

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "source": ["s0", "s1"],
                "text": ["low lower newest", "widest low low"],
            }
        )
    )
    inp = str(tmp_path / "docs")
    out = str(tmp_path / "tok")
    model = str(tmp_path / "bpe.json")
    docs.write.parquet(inp)
    rc = main(
        [
            "tokenize", "--input", inp, "--output", out,
            "--vocab-size", "24", "--model", model,
        ]
    )
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["rows"] == 2 and line["trained"] is True
    tok = spark.read.parquet(out)
    assert set(tok.columns) == {"doc_id", "source", "tokens", "n_tok"}
    # a second run with the saved model encodes identically (and the
    # default error mode refuses to overwrite)
    out2 = str(tmp_path / "tok2")
    assert main(["tokenize", "--input", inp, "--output", out2, "--model", model]) == 0
    line2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line2["trained"] is False
    assert line2["total_tokens"] == line["total_tokens"]
    import pytest as _pt

    with _pt.raises(Exception):
        main(["tokenize", "--input", inp, "--output", out, "--model", model])


def test_bpe_roundtrip_property(spark):
    """Hypothesis: for ANY training corpus, every trained word encodes
    without <unk> and its symbols concatenate back to word + EOW —
    lossless over the trained vocabulary at every vocab_size."""
    pytest.importorskip("hypothesis")
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from logtrics_spark.operators.bpe import train_bpe as _train  # noqa: F401

    word = st.text(alphabet="abcdef", min_size=1, max_size=8)
    corpus = st.lists(word, min_size=1, max_size=30)
    sizes = st.integers(min_value=1, max_value=64)

    # train on a pandas-backed single-partition frame: the property is
    # about the ALGORITHM, so keep Spark out of the hot loop (one tiny
    # createDataFrame per example is still a Spark job — sample few)
    @settings(max_examples=15, deadline=None)
    @given(words=corpus, vocab_size=sizes)
    def check(words, vocab_size):
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": range(len(words)), "text": words})
        )
        model = train_bpe(docs, vocab_size=vocab_size)
        ranks = {tuple(p): i for i, p in enumerate(model["merges"])}
        inv = {v: k for k, v in model["vocab"].items()}
        for w in set(words):
            ids = _encode_word(w, ranks, model["vocab"])
            assert UNK_ID not in ids, (w, ids)
            assert "".join(inv[i] for i in ids) == w + EOW

    check()
