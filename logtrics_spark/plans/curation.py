"""Dataset curation plan — the LLM-training-data pipeline, composed.

Every stage exists as a tested operator (text.py, dedup.py, sample.py);
this module chains them into the one plan a data team actually runs
over a 100 TB corpus, with per-stage survivor counts as the audit
trail:

    redact     PII scrub (opt-in, FIRST)       codegen regex projection
    annotate   quality_score + language_id     one projection, JVM-only
    filter     min quality / allowed langs     pushed predicates
    lm         perplexity cut (opt-in)         explode + model joins,
                                               CCNet practice
    gopher     Rae et al. 2021 A1.1 rules      doc-local Catalyst pred +
               (opt-in)                        n-gram repetition passes
    exact      one keeper per identical text   8-byte-fingerprint groupBy
    near-dup   MinHash LSH -> exact-Jaccard    banded join, candidate-
               verify -> connected components  only verification
    decontam   drop benchmark n-gram overlap   broadcast gram-set join
    sample     deterministic / stratified mix  md5-bucket, rerun-stable

Scale shape: the corpus is touched by (a) one annotate+filter scan,
(b) the exact-dedup fingerprint groupBy, (c) the LSH signature scan,
and (d) the final keep-set semi-joins — every join against the corpus
is either on an 8-byte key or a broadcast/semi-join of a much smaller
keep/drop set; nothing quadratic, nothing driver-side.  The near-dup
stage verifies candidate pairs only (the LSH bucket join bounds them)
and collapses verified pairs into components so chains A-B-C drop both
B and C, not just one of them.

Stats counts are separate Spark actions per stage (a curation run is a
batch job that runs once; the audit trail is worth five aggregates).
Pass ``collect_stats=False`` to skip them and keep the plan fully lazy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logtrics_spark.operators.decontam import decontaminate
from logtrics_spark.operators.dedup import (
    dedup_groups,
    minhash_lsh_dupes,
    ngram_jaccard_pairs,
)
from logtrics_spark.operators.sample import deterministic_sample, stratified_mix
from logtrics_spark.operators.text import (
    gopher_keep,
    gopher_repetition_keep,
    language_id,
    quality_score,
)


def curate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float | None = 0.3,
    langs: list[str] | None = None,
    redact: bool = False,
    lm_model: dict | None = None,
    max_perplexity: float | None = None,
    gopher: bool = False,
    gopher_opts: dict | None = None,
    gopher_top_ns: dict[int, float] | None = None,
    gopher_dup_ns: dict[int, float] | None = None,
    near_dup: bool = True,
    jaccard_threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    max_bucket_size: int | None = 4096,
    benchmark: DataFrame | None = None,
    decontam_n: int = 13,
    sample_rate: float | None = None,
    sample_rates: dict[str, float] | None = None,
    sample_by: str = "source",
    collect_stats: bool = True,
) -> tuple[DataFrame, dict]:
    """Run the curation pipeline; returns (kept_docs, stats).

    ``kept_docs`` carries the input columns plus ``quality`` and
    ``lang``.  ``stats`` maps stage -> surviving row count (empty when
    ``collect_stats=False``); stages that are disabled (no quality
    bound, no langs, near_dup=False, no sampling) pass rows through
    untouched and are absent from stats.  ``max_bucket_size`` caps
    per-(band,bucket) LSH candidate generation (star-collapse through
    the min-id representative, logged) — sound here because the
    closure below reconnects collapsed buckets; None disables.
    """
    stats: dict[str, int] = {}

    def _n(stage: str, df: DataFrame) -> DataFrame:
        if collect_stats:
            stats[stage] = df.count()
        return df

    if redact:
        # FIRST, before anything reads the text: raw PII must not
        # travel into annotations, signatures, or samples.  Row count
        # is unchanged; the audit number worth recording is how many
        # docs carried PII at all.
        from logtrics_spark.operators.redact import PII_PATTERNS, redact_pii

        docs = redact_pii(docs, text_col=text_col)
        if collect_stats:
            stats["redact_docs_hit"] = docs.where(F.col("n_pii") > 0).count()
        docs = docs.drop("n_pii", *[f"n_{name}" for name in PII_PATTERNS])

    cur = docs.withColumn("quality", quality_score(F.col(text_col))).withColumn(
        "lang", language_id(F.col(text_col))
    )
    cur = _n("input", cur)

    if min_quality is not None:
        cur = _n("quality_filter", cur.where(F.col("quality") >= min_quality))
    if langs:
        cur = _n("lang_filter", cur.where(F.col("lang").isin(langs)))

    if lm_model is not None and max_perplexity is not None:
        # CCNet practice: keep the low-perplexity head under a model
        # trained on trusted text (operators/lm.py).  NULL perplexity
        # (blank docs) does not pass a < cut — consistent with every
        # other filter dropping degenerate rows.
        from logtrics_spark.operators.lm import perplexity

        ppl = perplexity(cur, lm_model, text_col=text_col, id_col=id_col).select(
            id_col, "perplexity"
        )
        cur = _n(
            "lm_filter",
            cur.join(ppl, id_col, "left")
            .where(F.col("perplexity") <= max_perplexity)
            .drop("perplexity"),
        )

    if gopher:
        # Gopher A1.1 rules: the doc-local predicate is one pushed
        # Catalyst filter on the same scan; the n-gram repetition rules
        # each cost one explode+groupBy pass (paper defaults: n=2..4
        # top-gram + n=5..10 duplicated-gram — pass smaller dicts, or
        # {} {} to disable, when scan count matters more than coverage)
        cur = _n(
            "gopher_filter",
            cur.where(gopher_keep(F.col(text_col), **(gopher_opts or {}))),
        )
        if gopher_top_ns != {} or gopher_dup_ns != {}:
            rep_keep = gopher_repetition_keep(
                cur, text_col, id_col, top_ns=gopher_top_ns, dup_ns=gopher_dup_ns
            )
            cur = _n("gopher_repetition", cur.join(rep_keep, id_col, "left_semi"))

    # Materialize the annotated+filtered corpus ONCE before the
    # multi-branch dedup stages.  Every stage below re-anchors on `cur`
    # (the exact-dedup keeper subtree, the LSH signature scan, the
    # verify gram scan, and the final keep-set joins), and without a
    # materialization each branch re-executes the annotate projection —
    # five regex scans per document — because the quality/lang FILTERS
    # sit in every branch's lineage and cannot be pruned away.  Measured
    # at sf1.0: the annotate pass alone is ~7.6 s and was recomputed by
    # 4 of the 5 curation actions (guide §5: persist when a frame is
    # reused and recomputation is expensive).  localCheckpoint (not
    # persist) on purpose: it materializes to executor-local
    # MEMORY_AND_DISK blocks immediately, truncates the lineage for the
    # iterative closure below, and is NOT registered with the
    # CacheManager — a later curate() call over the same input builds
    # its own plan and recomputes from the source, so repeated runs stay
    # honest end-to-end computations.  At 100 TB this is the
    # intermediate materialization a multi-pass curation job performs
    # anyway (disk-backed, spilled per executor, dropped with the app).
    if near_dup:
        cur = cur.localCheckpoint()

    # exact dedup: one keeper (min id) per identical text — the shuffle
    # carries (fp64, id), never the documents
    keepers = (
        cur.select(F.xxhash64(F.col(text_col)).alias("_fp"), F.col(id_col))
        .groupBy("_fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    cur = _n("exact_dedup", cur.join(keepers, id_col, "left_semi"))

    if near_dup:
        # candidates from banded LSH (bare pairs — the verify stage
        # recomputes true similarity), verified by exact n-gram Jaccard,
        # collapsed to components; drop everything but each component's
        # minimum-id representative
        # max_bucket_size is sound HERE because verified pairs feed a
        # connected-components closure below: a star-collapsed
        # oversized bucket keeps its duplicate component connected
        # through the representative (exact dupes were also already
        # collapsed by the stage above, so oversized buckets are rare)
        cand = minhash_lsh_dupes(
            cur,
            text_col,
            id_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle_k=shingle_k,
            include_est=False,
            max_bucket_size=max_bucket_size,
        ).localCheckpoint()
        verified = (
            ngram_jaccard_pairs(
                cur, cand, text_col, id_col, min_jaccard=jaccard_threshold
            )
            .where(F.col("jaccard") >= jaccard_threshold)
            .select("id_a", "id_b")
        )
        drops = (
            dedup_groups(verified)
            .where(F.col("id") != F.col("group_id"))
            .select(F.col("id").alias(id_col))
        )
        cur = _n("near_dedup", cur.join(drops, id_col, "left_anti"))

    if benchmark is not None:
        # benchmark decontamination (GPT-3 appendix C practice): drop
        # any surviving doc sharing a decontam_n-gram with the eval
        # set; anti-join strategy left to Catalyst like the near-dedup
        # stage above — usually a broadcast (flagged sets are small),
        # but a heavily-contaminated corpus must not be forced through
        # the driver
        flagged = decontaminate(
            cur, benchmark, n=decontam_n, text_col=text_col, id_col=id_col
        ).select(id_col)
        cur = _n("decontam", cur.join(flagged, id_col, "left_anti"))

    if sample_rates:
        cur = _n(
            "sample",
            stratified_mix(cur, sample_rates, by=sample_by, id_col=id_col),
        )
    elif sample_rate is not None:
        cur = _n("sample", deterministic_sample(cur, sample_rate, id_col=id_col))

    return cur, stats
