"""N-gram language-model perplexity — the CCNet-style quality filter
(Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", LREC: score every document with a
language model trained on trusted text and keep the low-perplexity
head).  CCNet uses KenLM; this is the same filter with an add-alpha
word-bigram model — trained and scored ENTIRELY in Spark:

- the model IS a pair of count DataFrames (unigrams, bigrams), so it
  never has to fit on the driver — at web scale the bigram table is
  itself big data, and scoring is a JOIN against it (Catalyst picks
  broadcast when it is small), not a Python dict lookup;
- scoring is pure Catalyst (explode -> join -> log arithmetic ->
  groupBy avg): zero Python, zero UDFs.

Pinned semantics (so tests and the DuckDB oracle replicate exactly):

- words = lowercased whitespace tokens of trim(text);
- vocabulary = the ``vocab_size`` most frequent training words
  (ties broken by word ascending); everything else maps to <unk>
  BEFORE counting, in training and scoring alike;
- add-alpha bigram probability over the mapped stream, with a unigram
  term for the first word:

      P(w1)      = (c(w1) + a) / (N + a*V)
      P(w2 | w1) = (c(w1 w2) + a) / (c(w1) + a*V)

  where V = |vocab| + 1 (<unk> is a real symbol) and N = total
  training tokens;
- perplexity(doc) = exp(-mean log P) over the doc's n mapped words
  (n terms: 1 unigram + n-1 bigrams); empty/blank docs score NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

UNK = "<unk>"


def _words(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, pos, w) rows of lowercased whitespace words; blank docs
    contribute no rows."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return (
        df.where(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col).alias("id"), F.posexplode(toks).alias("pos", "w"))
    )


def train_ngram_lm(
    docs: DataFrame,
    vocab_size: int = 50_000,
    alpha: float = 0.1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Train the bigram LM; returns {"uni": DF(w, c), "bi": DF(w1, w2,
    c), "alpha", "v", "n"} — persist the two frames with
    ``.write.parquet`` to reuse a model across jobs.

    Counting is exact and fully distributed (two groupBys); only the
    scalar metadata (vocab size actually reached, total tokens) is
    collected.
    """
    words = _words(docs, text_col, id_col)
    counts = words.groupBy("w").agg(F.count("*").alias("c"))
    vocab = counts.orderBy(F.desc("c"), F.asc("w")).limit(vocab_size)
    # map out-of-vocab words to <unk>, then count over the MAPPED stream
    mapped = (
        words.join(F.broadcast(vocab.select("w")).withColumn("_in", F.lit(1)), "w", "left")
        .select(
            "id",
            "pos",
            F.when(F.col("_in").isNotNull(), F.col("w")).otherwise(F.lit(UNK)).alias("w"),
        )
    )
    # Both model frames persist (ADVICE r6): the metadata actions just
    # below hit `uni` three times (v, <unk> probe, n), and every
    # downstream perplexity() join re-anchors on both frames — without
    # the cache each action re-ran the full words+vocab training chain
    # over the trusted corpus.  Lifetime: the frames ARE the model;
    # they stay persisted for the model's life (LRU-evictable,
    # MEMORY_AND_DISK) and a caller done with the model may
    # model["uni"].unpersist() / model["bi"].unpersist().
    uni = mapped.groupBy("w").agg(F.count("*").alias("c")).persist()
    nxt = Window.partitionBy("id").orderBy("pos")
    bi = (
        mapped.select("id", "pos", F.col("w").alias("w1"), F.lead("w").over(nxt).alias("w2"))
        .where(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
        .persist()
    )
    v = uni.count()  # vocab actually reached, incl. <unk> when present
    if uni.where(F.col("w") == UNK).count() == 0:
        v += 1  # <unk> is always a symbol, seen or not
    n = int(uni.agg(F.sum("c")).first()[0] or 0)
    if n == 0:
        raise ValueError("cannot train an LM on an empty corpus")
    return {"uni": uni, "bi": bi, "alpha": float(alpha), "v": int(v), "n": n}


def perplexity(
    docs: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, n_words, avg_logprob, perplexity) per document — pure
    Catalyst: explode, two joins against the model frames, log
    arithmetic, one groupBy.  Docs with no words score NULLs."""
    a = model["alpha"]
    av = a * model["v"]
    uni, bi = model["uni"], model["bi"]
    words = _words(docs, text_col, id_col)
    mapped = (
        words.join(
            F.broadcast(uni.select(F.col("w"), F.lit(1).alias("_in"))), "w", "left"
        )
        .select(
            "id",
            "pos",
            F.when(F.col("_in").isNotNull(), F.col("w")).otherwise(F.lit(UNK)).alias("w"),
        )
    )
    nxt = Window.partitionBy("id").orderBy("pos")
    pairs = mapped.select(
        "id", "pos", F.col("w").alias("w1"), F.lead("w").over(nxt).alias("w2")
    )
    # unigram term for the first word; bigram terms for the rest
    first = (
        pairs.where(F.col("pos") == 0)
        .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"), "w1", "left")
        .select(
            "id",
            (
                F.log(F.coalesce("c1", F.lit(0)) + a)
                - F.log(F.lit(float(model["n"]) + av))
            ).alias("lp"),
        )
    )
    bigr = (
        pairs.where(F.col("w2").isNotNull())
        .join(bi, ["w1", "w2"], "left")
        .join(
            uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"), "w1", "left"
        )
        .select(
            "id",
            (
                F.log(F.coalesce("c", F.lit(0)) + a)
                - F.log(F.coalesce("c1", F.lit(0)) + av)
            ).alias("lp"),
        )
    )
    scored = first.unionByName(bigr).groupBy("id").agg(
        F.count("*").alias("n_words"), F.avg("lp").alias("avg_logprob")
    )
    base = docs.select(F.col(id_col).alias("id"))
    return base.join(scored, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_words", F.lit(0)).alias("n_words"),
        F.col("avg_logprob"),
        F.exp(-F.col("avg_logprob")).alias("perplexity"),
    )
