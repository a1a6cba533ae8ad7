"""Benchmark decontamination — n-gram overlap against an eval set.

The standard LLM-training hygiene step (Brown et al. 2020, GPT-3
appendix C: 13-gram overlap; also used by The Pile and Llama): any
training document sharing an n-gram with a held-out benchmark set is
flagged (and usually dropped) so eval scores measure generalization,
not memorization.  The reference engine has no analogue — this extends
the repo's LLM-pipeline family (SURVEY.md §2, dedup/text operators).

Scale shape (the 100 TB story):
- Gram extraction reuses ``dedup._shingle_rows`` — whole-stage-codegen
  posexplode with the word array retained on the row (r7: no lead()
  window, zero shuffle before the grams exist), one pass over each
  side, identical gram semantics to the MinHash/Jaccard family
  (lowercased, whitespace-split word n-grams; docs shorter than n
  yield ONE partial gram, i.e. the whole doc, so a short training doc
  fully contained in benchmark text still flags).
- Grams travel as 8-byte xxhash64 fingerprints, never strings.
- The benchmark side is distinct-deduped and (by default) BROADCAST:
  eval suites are tiny next to a training corpus, so the corpus-side
  gram stream joins map-side with zero shuffle.  Pass
  ``broadcast=False`` for an unusually large benchmark set and the
  join falls back to a shuffled hash join on the 8-byte key.
- One corpus shuffle end-to-end when the input needed spreading (the
  common bench/test case): ``_ensure_parallel`` partitions the text
  side by doc id, and the distinct plus the per-doc agg both reuse
  that id-clustering; a many-file corpus instead pays its one exchange
  at the (id, gram_fp) distinct.  The token path dedups grams inside
  the array (``array_distinct``, no exchange) so the per-doc agg's
  exchange is the only one.

Fingerprint caveat: matching is on 64-bit hashes, so two different
grams colliding would over-flag (P ~ 2^-64 per pair — negligible at
any realistic gram count, and over-flagging is the safe direction for
decontamination).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logtrics_spark.operators.dedup import _shingle_rows


def gram_fingerprints(
    df: DataFrame, n: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, gram_fp) — one row per DISTINCT word n-gram per document.

    xxhash64 fingerprints of the same gram definition the dedup family
    uses (``dedup._shingle_rows``).  Distinct per doc so a gram
    repeated inside one document counts once in overlap statistics.
    """
    if n < 1:
        raise ValueError(f"n-gram size must be >= 1, got {n}")
    # null/whitespace-only text carries no grams: such docs are absent
    # from the report (documented in decontaminate) rather than matching
    # other empty docs through a degenerate '' gram
    df = df.where(
        F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    )
    rows = _shingle_rows(df, text_col, id_col, n)
    # when _ensure_parallel spread the input by id, the distinct (and
    # the downstream per-doc agg) reuse that id-clustering — id is a
    # subset of the (id, gram_fp) grouping keys — so this adds no
    # exchange; a many-file corpus pays its single exchange here
    return rows.select("id", F.xxhash64("sh").alias("gram_fp")).distinct()


def token_gram_fingerprints(
    df: DataFrame, n: int, tokens_col: str = "tokens", id_col: str = "doc_id"
) -> DataFrame:
    """(id, gram_fp) — distinct token n-grams over an ``array<int>``
    payload (the north-rule token table), no text round-trip.

    Unlike the text path (posexplode + window in
    ``dedup._shingle_rows``), the token array is ALREADY ordered per
    row, so grams come from one array-HOF projection — slice windows of
    the array, hash each slice — with zero shuffle.  Sequences shorter
    than n yield the whole sequence as one partial gram, matching the
    text convention.
    """
    if n < 1:
        raise ValueError(f"n-gram size must be >= 1, got {n}")
    # null/empty sequences carry no grams (a NULL array would otherwise
    # hash to the xxhash64 seed constant and spuriously "match" other
    # null rows); such docs are absent from the report (documented)
    df = df.where(
        F.col(tokens_col).isNotNull() & (F.size(tokens_col) > 0)
    )
    toks = F.col(tokens_col)
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - n + 1)
    ).otherwise(F.array(F.lit(1)))
    grams = F.transform(idx, lambda i: F.xxhash64(F.slice(toks, i, n)))
    # per-doc dedup INSIDE the array (array_distinct) — unlike a row
    # .distinct(), which would be a corpus-wide exchange on
    # (id, gram_fp) that the later per-doc agg could not reuse: this
    # keeps the whole gram stage shuffle-free, so the per-doc agg's
    # exchange is the only corpus shuffle (the documented contract)
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(grams)).alias("gram_fp"),
    )


def _overlap_report(
    grams: DataFrame,
    bench_fps: DataFrame,
    id_col: str,
    min_matches: int,
    broadcast: bool,
) -> DataFrame:
    """Shared join/agg tail: per-doc distinct-gram overlap counts."""
    if min_matches < 0:
        raise ValueError(f"min_matches must be >= 0, got {min_matches}")
    bench_fps = bench_fps.select("gram_fp").distinct().withColumn(
        "_bench_hit", F.lit(1)
    )
    if broadcast:
        bench_fps = F.broadcast(bench_fps)
    report = (
        grams.join(bench_fps, "gram_fp", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_bench_hit").alias("matched_grams"),
        )
        .withColumn(
            "contamination", F.col("matched_grams") / F.col("n_grams")
        )
        .withColumnRenamed("id", id_col)
    )
    if min_matches > 0:
        report = report.where(F.col("matched_grams") >= min_matches)
    return report


def decontaminate_tokens(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    bench_tokens_col: str | None = None,
    bench_id_col: str | None = None,
    min_matches: int = 1,
    broadcast: bool = True,
) -> DataFrame:
    """``decontaminate`` over pre-tokenized sequences: the same
    per-doc overlap report, with grams taken directly from the
    ``array<int>`` token payload (post-tokenizer decontamination —
    matches exactly what the model would train on, immune to
    whitespace/case normalization drift between pipelines)."""
    bench_fps = token_gram_fingerprints(
        benchmark, n, bench_tokens_col or tokens_col, bench_id_col or id_col
    )
    grams = token_gram_fingerprints(train, n, tokens_col, id_col)
    return _overlap_report(grams, bench_fps, id_col, min_matches, broadcast)


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
    min_matches: int = 1,
    broadcast: bool = True,
) -> DataFrame:
    """Per-training-doc benchmark-overlap report.

    Returns one row per training document with at least ``min_matches``
    distinct n-grams also present anywhere in ``benchmark``:

        (id_col, n_grams, matched_grams, contamination)

    where ``n_grams`` is the doc's distinct-gram count,
    ``matched_grams`` how many of those appear in the benchmark set,
    and ``contamination`` their ratio.  ``min_matches=0`` returns every
    training doc WITH CONTENT (clean docs carry ``matched_grams = 0``)
    — the full audit report rather than the drop list; docs whose text
    is null/whitespace-only (token path: null/empty array) have no
    grams and are absent from the report.

    Join the result's ids back with a broadcast anti-join to drop
    flagged docs; ``plans/curation.py`` composes exactly that.
    """
    bench_fps = gram_fingerprints(
        benchmark, n, bench_text_col or text_col, bench_id_col or id_col
    )
    grams = gram_fingerprints(train, n, text_col, id_col)
    return _overlap_report(grams, bench_fps, id_col, min_matches, broadcast)
