"""Token-sequence operators — training-data analytics over the north
rule's `tokens: array<int32>` payload column.

Everything here is deliberately JVM-side (array functions, explode +
partial-agg groupBy); the token arrays never cross into Python.  These
are the sequence-level counterparts of operators/text.py's
document-text ops:

- token_stats: per-row sequence profile (length, distinct count/ratio,
  min/max token id) — array expressions, zero shuffles.
- vocab_topk: corpus vocabulary histogram -> top-k tokens.  explode ->
  groupBy(token) does map-side partial counts, so the shuffle carries
  one row per distinct token per task, not one per occurrence; at
  100 TB that is the difference between shuffling ~vocab-size rows and
  shuffling the corpus.
- dedup_token_seqs: exact sequence-level dedup keyed on
  xxhash64(tokens) — the structural hash of the whole int32 array —
  so the shuffle moves 8-byte keys instead of multi-KB sequences
  (same design as dedup.exact_dedup for text).
- ngram_counts: order-sensitive token n-grams via the same
  posexplode+lead window shape as dedup._shingle_rows (whole-stage
  codegen), counted corpus-wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def token_stats(df: DataFrame, tokens_col: str = "tokens", id_col: str = "doc_id") -> DataFrame:
    """Per-sequence profile: n_tok, n_unique, unique_ratio, min/max id."""
    t = F.col(tokens_col)
    n = F.size(t)
    uniq = F.size(F.array_distinct(t))
    return df.select(
        F.col(id_col),
        n.alias("n_tok"),
        uniq.alias("n_unique"),
        (uniq.cast("double") / n.cast("double")).alias("unique_ratio"),
        F.array_min(t).alias("min_token"),
        F.array_max(t).alias("max_token"),
    )


def vocab_topk(
    df: DataFrame, k: int = 50, tokens_col: str = "tokens", by: str | None = None
) -> DataFrame:
    """Top-k most frequent token ids (optionally per `by` group).

    Tie-break on token id ascending so the result is total-ordered and
    oracle-comparable.
    """
    keys = [F.col(by)] if by else []
    counts = (
        df.select(*keys, F.explode(F.col(tokens_col)).alias("token"))
        .groupBy(*keys, "token")
        .agg(F.count("*").alias("freq"))
    )
    w = Window.partitionBy(*[c for c in ([by] if by else [])]).orderBy(
        F.desc("freq"), F.asc("token")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(*([by] if by else []), "token", "freq", "rank")
    )


def dedup_token_seqs(
    df: DataFrame, tokens_col: str = "tokens", id_col: str = "doc_id"
) -> DataFrame:
    """Exact sequence dedup: one keep row per distinct token array.

    Keyed on the structural xxhash64 of the array (8-byte shuffle keys);
    output (keep_id, dup_count) with keep_id = min id per group.
    """
    return (
        df.select(F.col(id_col).alias("id"), F.xxhash64(F.col(tokens_col)).alias("fp64"))
        .groupBy("fp64")
        .agg(F.min("id").alias("keep_id"), F.count("*").alias("dup_count"))
    )


def repetition_stats(
    df: DataFrame, n: int = 3, tokens_col: str = "tokens", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document n-gram repetition — the classic loop/spam signal
    (a doc whose trigrams are mostly duplicates is boilerplate or a
    degenerate generation, and poisons training mixes).

    repetition_ratio = 1 - distinct_ngrams / total_ngrams, 0 for docs
    shorter than n tokens.  Same codegen explode+window shape as
    ngram_counts, aggregated per doc with count / approx-free distinct.
    """
    exploded = df.select(
        F.col(id_col).alias("id"), F.posexplode(F.col(tokens_col)).alias("pos", "t0")
    )
    win = Window.partitionBy("id").orderBy("pos")
    grams = exploded.select(
        "id",
        F.array(F.col("t0"), *[F.lead("t0", j).over(win) for j in range(1, n)]).alias(
            "gram"
        ),
    ).where(F.element_at("gram", n).isNotNull())
    per_doc = grams.groupBy("id").agg(
        F.count("*").alias("n_grams"),
        F.count_distinct("gram").alias("n_distinct"),
    )
    ratio = F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_grams").cast(
        "double"
    )
    # docs shorter than n tokens produce no grams -> restore with ratio 0
    all_ids = df.select(F.col(id_col).alias("id"))
    return (
        all_ids.join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
            F.coalesce(ratio, F.lit(0.0)).alias("repetition_ratio"),
        )
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    tokens_len_col: str = "n_tok",
    by: str | list[str] = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic context-window packing plan (training batching).

    Documents are laid out in ``id_col`` order within each ``by`` group
    and assigned to the bin where their cumulative token count STARTS:
    bin = floor((cumsum(n_tok) - n_tok) / budget).  The rule is a pure
    function of the table (window prefix sum — no rand, no partition
    dependence), so the packing is reproducible and SQL-oracle-able;
    bins average ~budget tokens with bounded overflow (< max doc len).
    Output: one row per (group, bin) with n_docs, total_tok, and the
    first/last doc ids — the manifest a downstream token-concatenation
    job consumes.

    Scale note: each ``by`` group funnels through ONE sort task (window
    prefix sum), so groups must be task-sized — at corpus scale pass a
    composite key, e.g. ``by=["source", "day"]`` with day derived from
    the same doc_id-ordered timestamp the pipeline uses (extract.with_ts)
    so the split stays a pure function of the table.  A bare hot source
    ("web" is ~40% of the generated corpus) as the only key is the
    anti-pattern; packing order only needs to be deterministic within a
    group, not global.
    """
    keys = [by] if isinstance(by, str) else list(by)
    w = Window.partitionBy(*keys).orderBy(id_col)
    start = F.sum(tokens_len_col).over(w) - F.col(tokens_len_col)
    binned = df.select(
        *[F.col(k) for k in keys],
        F.col(id_col),
        F.col(tokens_len_col),
        F.floor(start / F.lit(budget)).alias("bin_id"),
    )
    return binned.groupBy(*keys, "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(tokens_len_col).alias("total_tok"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )


def ngram_counts(
    df: DataFrame,
    n: int = 3,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    min_freq: int = 2,
) -> DataFrame:
    """Corpus-wide order-sensitive token n-gram counts (freq >= min_freq).

    posexplode + lead window per doc (codegen), n-gram keyed as a
    fixed-length array column; map-side partial counts on the groupBy.
    """
    exploded = df.select(
        F.col(id_col).alias("id"), F.posexplode(F.col(tokens_col)).alias("pos", "t0")
    )
    win = Window.partitionBy("id").orderBy("pos")
    grams = exploded.select(
        "id",
        "pos",
        F.array(
            F.col("t0"), *[F.lead("t0", j).over(win) for j in range(1, n)]
        ).alias("gram"),
    ).where(F.element_at("gram", n).isNotNull())
    return (
        grams.groupBy("gram")
        .agg(F.count("*").alias("freq"))
        .where(F.col("freq") >= min_freq)
    )


def chunk_sequences(
    df: DataFrame,
    max_len: int = 2048,
    stride: int | None = None,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    keep_cols: list[str] | None = None,
    min_len: int = 1,
) -> DataFrame:
    """Split long token sequences into training-window chunks — the
    complement of :func:`pack_sequences` (that packs SHORT docs into a
    budget; this cuts LONG docs down to one).

    Chunks start at 0, step, 2*step, ... where ``step = stride or
    max_len`` — ``stride < max_len`` yields overlapping windows (the
    GPT-2 eval convention); the default is disjoint cover.  Each chunk
    is ``slice(tokens, start, max_len)``; the tail chunk may be shorter
    and chunks shorter than ``min_len`` are dropped (set ``min_len =
    max_len`` to keep only full windows).  Pure Catalyst
    (sequence -> posexplode -> slice): the only shuffle is whatever the
    caller does next, and a doc's chunks stay on its partition.

    Output: (id_col, *keep_cols, chunk_id, tokens, n_tok) — chunk_id is
    the 0-based window index within the doc, so (id, chunk_id) is a
    stable key and ORDER BY chunk_id reassembles the doc.
    """
    step = stride or max_len
    if step <= 0 or max_len <= 0:
        raise ValueError("max_len and stride must be positive")
    keep = keep_cols or []
    n = F.size(F.col(tokens_col))
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(step))
    exploded = (
        df.where(n > 0)
        .select(
            F.col(id_col),
            *[F.col(c) for c in keep],
            F.col(tokens_col).alias("_toks"),
            F.posexplode(starts).alias("chunk_id", "_start"),
        )
        .select(
            F.col(id_col),
            *[F.col(c) for c in keep],
            F.col("chunk_id"),
            F.slice(F.col("_toks"), F.col("_start") + 1, max_len).alias(tokens_col),
        )
        .withColumn("n_tok", F.size(tokens_col).cast("int"))
    )
    return exploded.where(F.col("n_tok") >= min_len)
