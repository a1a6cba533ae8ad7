"""Byte-pair-encoding tokenizer — the documents -> tokens bridge.

The north-rule input is a table of PRE-tokenized sequences
(doc_id, tokens:array<int32>, n_tok, source); this module produces that
shape from raw text with the classic BPE algorithm (Sennrich, Haddow,
Birch 2016, "Neural Machine Translation of Rare Words with Subword
Units", ACL — algorithm 1): whitespace pre-tokenization, characters +
an end-of-word marker as the base alphabet, then ``vocab_size`` greedy
merges of the most frequent adjacent symbol pair.

Scale split (the same discipline as centroid/codebook training in
operators/similarity.py):

- ``train_bpe`` runs DRIVER-SIDE on a bounded, seeded, partition-fair
  Bernoulli sample — tokenizer training on a corpus sample is standard
  practice (the merge table converges long before the corpus does),
  and the driver cost is O(sample), never O(corpus).
- ``bpe_encode`` runs DISTRIBUTED as an Arrow-batched pandas UDF with
  the merge ranks broadcast in the closure: per word, the GPT-2-style
  rank-greedy merge loop, memoized per batch (word-soup corpora hit
  the memo almost always).  Production swaps this seam for a native
  tokenizer; the SEMANTICS here are the published algorithm and are
  pinned by tests against the paper's worked example.

Determinism: pair-count ties break on the lexicographically smallest
pair, so a (corpus, vocab_size, seed) triple always yields the same
merge table and the same ids.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EOW = "</w>"  # end-of-word marker (Sennrich 2016 §3.2)
UNK_ID = 0  # id 0 is reserved for characters unseen at training time


def _word_freqs_sample(
    docs: DataFrame, text_col: str, sample_rows: int, seed: int
) -> dict[str, int]:
    """Word -> count over a bounded, partition-fair document sample.

    The heavy lifting (split + explode + count) happens in Spark; only
    the aggregated word-frequency table (vocabulary-sized, not
    corpus-sized) ever reaches the driver.
    """
    cnt = docs.count()
    frac = min(1.0, (2.0 * sample_rows) / max(cnt, 1))
    sampled = docs.select(text_col)
    if frac < 1.0:
        sampled = sampled.sample(fraction=frac, seed=seed)
    freq = (
        sampled.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
        )
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .toPandas()
    )
    return dict(zip(freq["w"], freq["n"].astype(int)))


def train_bpe(
    docs: DataFrame,
    vocab_size: int = 512,
    text_col: str = "text",
    sample_rows: int = 100_000,
    seed: int = 42,
) -> dict:
    """Learn a BPE tokenizer; returns a plain-dict model.

    ``vocab_size`` counts the whole vocabulary: <unk> + base characters
    (+ EOW variants) + one entry per merge.  The returned model is
    {"merges": [(a, b), ...], "vocab": {symbol: id}} — JSON-able, tiny,
    broadcastable.
    """
    word_freq = _word_freqs_sample(docs, text_col, sample_rows, seed)
    if not word_freq:
        raise ValueError("cannot train BPE on an empty corpus")
    # each word as a tuple of symbols: chars + EOW glued to the last char
    words: dict[tuple[str, ...], int] = {}
    for w, n in word_freq.items():
        syms = tuple(list(w[:-1]) + [w[-1] + EOW])
        words[syms] = words.get(syms, 0) + n

    base = sorted({s for syms in words for s in syms})
    vocab: dict[str, int] = {"<unk>": UNK_ID}
    for s in base:
        vocab[s] = len(vocab)
    merges: list[tuple[str, str]] = []

    while len(vocab) < vocab_size:
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        # most frequent pair; ties break lexicographically for determinism
        best_n = max(pairs.values())
        best = min(p for p, n in pairs.items() if n == best_n)
        merges.append(best)
        merged = best[0] + best[1]
        vocab[merged] = len(vocab)
        new_words: dict[tuple[str, ...], int] = {}
        for syms, n in words.items():
            out = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_words[t] = new_words.get(t, 0) + n
        words = new_words

    return {"merges": merges, "vocab": vocab}


def _encode_word(word: str, ranks: dict[tuple[str, str], int], vocab: dict[str, int]) -> list[int]:
    """Rank-greedy merge loop for ONE word (the GPT-2 bpe() shape:
    repeatedly merge the lowest-rank adjacent pair until none applies),
    equivalent to replaying Sennrich's merges in training order."""
    syms = list(word[:-1]) + [word[-1] + EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return [vocab.get(s, UNK_ID) for s in syms]


def bpe_encode(
    docs: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "tokens",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Distributed encode: (id_col, *keep_cols, tokens:array<int32>, n_tok).

    The merge-rank table rides the UDF closure (broadcast once per
    executor); each Arrow batch memoizes per distinct word, so the
    Python loop runs once per NEW word per batch, not once per
    occurrence.  Output matches the north-rule token-table shape.
    """
    ranks = {tuple(p): i for i, p in enumerate(model["merges"])}
    vocab = dict(model["vocab"])

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[int]] = {}
        out = []
        for t in texts:
            ids: list[int] = []
            if t:
                for w in t.split():
                    got = memo.get(w)
                    if got is None:
                        got = _encode_word(w, ranks, vocab)
                        memo[w] = got
                    ids.extend(got)
            out.append(ids)
        return pd.Series(out)

    keep = keep_cols or []
    enc = docs.select(F.col(id_col), *keep, encode(F.col(text_col)).alias(out_col))
    return enc.withColumn("n_tok", F.size(out_col).cast("int"))


def bpe_decode(tokens_df: DataFrame, model: dict, tokens_col: str = "tokens") -> DataFrame:
    """Inverse map for roundtrip checks: token ids -> text (single
    spaces; unknown-at-training characters came through as <unk> and
    cannot be restored — lossless only over the trained alphabet)."""
    inv = {v: k for k, v in model["vocab"].items()}
    mapping = F.create_map(
        *[x for i, s in inv.items() for x in (F.lit(i), F.lit(s))]
    )
    joined = F.array_join(F.transform(F.col(tokens_col), lambda t: mapping[t]), "")
    text = F.regexp_replace(
        F.regexp_replace(joined, EOW + "$", ""), EOW, " "
    )
    return tokens_df.withColumn("text", text)
