"""Corpus lifecycle pipelines.

Split from the former plans/queries.py (round 9) — pure rearrangement,
every definition verbatim; registry order pinned in ``_registry``.
"""

from __future__ import annotations
import os
from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from datalake_indexes_spark.index.builder import build_index, with_global_row_number
from datalake_indexes_spark.index.lake_index import LakeIndex
from datalake_indexes_spark.operators.cocoa import COCOA, is_numeric_flags
from datalake_indexes_spark.operators.duplicates import DuplicateDetection
from datalake_indexes_spark.operators.mate import MATE
from datalake_indexes_spark.plans import oracle
from datalake_indexes_spark.functions.text import tokenize_col
from datalake_indexes_spark.sources.catalog import ALL_TABLE_NAMES, TESTDATA_LAKE_SPEC

from datalake_indexes_spark.plans.queries._base import CORPUS_SAMPLE_FRACTIONS, CORPUS_TOKEN_BUDGET, DECONTAM_MODULUS, V3_LOGPROB_MIN, V3_QUALITY_MIN, _docs

def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed pretraining corpus prep: quality-filter the documents, then
    drop near-duplicate copies (keep each cluster's representative) —
    the end-to-end shape of a training-data curation pass."""
    from datalake_indexes_spark.operators.dedup import minhash_lsh_pairs, near_dup_clusters
    from datalake_indexes_spark.operators.text_analysis import quality_scores

    docs = _docs(spark, sf_dir)
    quality = quality_scores(docs).filter(F.col("quality_score") >= 0.55)
    drop = (
        near_dup_clusters(minhash_lsh_pairs(docs, threshold=0.7))
        .filter(F.col("doc_id") != F.col("representative"))
        .select("doc_id")
    )
    # no broadcast hint: the drop set is proportional to the duplicate
    # count — O(corpus) in the worst (most duplicated) case; AQE still
    # broadcasts it when it is actually small
    return quality.join(drop, "doc_id", "left_anti").select(
        "doc_id", "n_words", "quality_score"
    )


def q_corpus_prep_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE curation pass, composed from the round's stages:
    quality filter → repetition filter → exact dedup (earliest keep) →
    PII scrub → concat-then-chunk packing of the survivors in id order.
    Output: (doc_id, n_tokens, pack_id, pack_offset) — the pack manifest
    a training loader consumes."""
    from datalake_indexes_spark.operators.dedup import exact_duplicate_groups
    from datalake_indexes_spark.operators.text_analysis import (
        pack_sequences,
        pii_scrub,
        quality_scores,
        repetition_scores,
    )

    docs = _docs(spark, sf_dir)
    q_ok = quality_scores(docs).filter(F.col("quality_score") >= 0.55).select("doc_id")
    r_ok = (
        repetition_scores(docs)
        .filter(F.col("top_bigram_frac") <= 0.2)
        .select("doc_id")
    )
    keep = exact_duplicate_groups(docs).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    # NO broadcast hints here: the survivor id sets are O(corpus) — at
    # 100 TB these are billions of ids, and forcing a broadcast would be
    # the classic composed-pipeline scale bug.  doc_id-keyed semi joins
    # shuffle uniformly; AQE still broadcasts when a side happens small.
    survivors = (
        docs.join(q_ok, "doc_id", "left_semi")
        .join(r_ok, "doc_id", "left_semi")
        .join(keep, "doc_id", "left_semi")
    )
    scrubbed = pii_scrub(survivors).select(
        "doc_id", F.col("scrubbed").alias("text")
    )
    return pack_sequences(scrubbed, token_budget=2048)


def q_corpus_prep_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation v2 — the round-5 composition: benchmark held out entirely
    (doc_id % 17 == 0 is the eval set), then quality filter → repetition
    filter → exact dedup → DECONTAMINATION against the held-out set →
    train-split selection → PII scrub → packing.  Output: the train-split
    pack manifest."""
    from datalake_indexes_spark.operators.dedup import exact_duplicate_groups
    from datalake_indexes_spark.operators.text_analysis import (
        decontaminate,
        hash_split,
        pack_sequences,
        pii_scrub,
        quality_scores,
        repetition_scores,
    )

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % DECONTAM_MODULUS == 0)
    corpus = docs.filter(F.col("doc_id") % DECONTAM_MODULUS != 0)
    q_ok = quality_scores(corpus).filter(F.col("quality_score") >= 0.55).select("doc_id")
    r_ok = (
        repetition_scores(corpus)
        .filter(F.col("top_bigram_frac") <= 0.2)
        .select("doc_id")
    )
    keep = exact_duplicate_groups(corpus).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    clean = (
        decontaminate(corpus, bench, n=5, min_overlap=3)
        .filter(~F.col("contaminated"))
        .select("doc_id")
    )
    train = hash_split(corpus).filter(F.col("split") == "train").select("doc_id")
    # doc_id-keyed semi joins, no broadcast hints (survivor sets are
    # O(corpus) — same reasoning as corpus_prep_full)
    survivors = corpus
    for s in (q_ok, r_ok, keep, clean, train):
        survivors = survivors.join(s, "doc_id", "left_semi")
    scrubbed = pii_scrub(survivors).select(
        "doc_id", F.col("scrubbed").alias("text")
    )
    return pack_sequences(scrubbed, token_budget=2048)


def q_corpus_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget selection: best-quality documents first until
    20k words — the budget-constrained training-set cut."""
    from datalake_indexes_spark.operators.text_analysis import (
        budget_select,
        quality_scores,
    )

    scored = quality_scores(_docs(spark, sf_dir)).select(
        "doc_id", "quality_score", F.col("n_words").cast("long").alias("n_tokens")
    )
    return budget_select(scored, CORPUS_TOKEN_BUDGET)


def q_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling (corpus mixing): halve 'en',
    keep 80% of 'de', everything else intact — membership is a pure
    md5(doc_id) function, identical on every engine."""
    from datalake_indexes_spark.operators.text_analysis import stratified_sample

    out = stratified_sample(_docs(spark, sf_dir), CORPUS_SAMPLE_FRACTIONS)
    return out.select("doc_id", "lang", "n_chars")


def q_corpus_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing at a 2048-token budget."""
    from datalake_indexes_spark.operators.text_analysis import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), token_budget=2048)


def q_corpus_delivery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end delivery census: curation v3 (quality + logprob gates,
    keep-best near-dup, train bucket) -> content-addressed shard
    assignment -> per-shard (n_docs, n_chars).  Grades the full
    curate-then-ship composition as one key."""
    from datalake_indexes_spark.sources.export import shard_manifest

    kept = q_corpus_prep_v3(spark, sf_dir).select("doc_id")
    docs = _docs(spark, sf_dir)
    return shard_manifest(docs.join(kept, "doc_id"), n_shards=8)


def q_corpus_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-call corpus data card: volume, provenance breadth, duplicate
    rate, mean quality — the census a delivery ships with."""
    from datalake_indexes_spark.operators.text_analysis import corpus_data_card

    return corpus_data_card(_docs(spark, sf_dir))


def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by md5(doc_id)."""
    from datalake_indexes_spark.operators.text_analysis import hash_split

    return hash_split(_docs(spark, sf_dir))


def q_corpus_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (64-token windows, 16 overlap) — the
    RAG/embedding-prep stage."""
    from datalake_indexes_spark.operators.text_analysis import chunk_documents

    return chunk_documents(_docs(spark, sf_dir), chunk_tokens=64, overlap=16)


def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted mixing with upsampling over the skewed lang
    strata (en dominates the synthetic corpus; alpha=0.5 half-balances)."""
    from datalake_indexes_spark.operators.text_analysis import temperature_mix

    return temperature_mix(_docs(spark, sf_dir), alpha=0.5, max_repeat=4.0)


def q_corpus_sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-n-per-language deterministic sample (balanced eval set)."""
    from datalake_indexes_spark.operators.text_analysis import stratified_sample_exact

    return stratified_sample_exact(_docs(spark, sf_dir), n_per_stratum=20)


def q_corpus_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted without-replacement sample (A-ES, deterministic)."""
    from datalake_indexes_spark.operators.text_analysis import weighted_sample

    return weighted_sample(_docs(spark, sf_dir), k=100)


def q_corpus_prep_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation v3 — the newest signals composed end to end: heuristic
    quality gate, unigram-LM perplexity-proxy gate, QUALITY-AWARE
    near-dup retention (keep the best copy, not the lowest id), and the
    deterministic train split.  (doc_id, lang, quality_score,
    avg_logprob); every stage is an already-graded operator, this key
    grades their composition."""
    from datalake_indexes_spark.operators.dedup import near_dup_keep_best
    from datalake_indexes_spark.operators.text_analysis import (
        quality_scores,
        unigram_logprob_scores,
    )

    docs = _docs(spark, sf_dir)
    q = quality_scores(docs).select("doc_id", "quality_score")
    lp = unigram_logprob_scores(docs).select("doc_id", "avg_logprob")
    dropped = (
        near_dup_keep_best(docs, q, threshold=0.7)
        .filter(~F.col("kept"))
        .select("doc_id")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 10000
    )
    return (
        docs.select("doc_id", "lang")
        .join(q, "doc_id")
        .join(lp, "doc_id")
        .filter(
            (F.col("quality_score") >= V3_QUALITY_MIN)
            & (F.col("avg_logprob") >= V3_LOGPROB_MIN)
        )
        .join(dropped, "doc_id", "left_anti")
        .filter(bucket < 8000)  # train shard
    )


def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot delta between two deterministically derived corpus
    versions: old drops doc_id%11==3 (those grade 'added') and
    upper-cases doc_id%7==2 ('changed'); new drops doc_id%13==5
    ('removed').  Grades the full-outer hash-compare classification."""
    from datalake_indexes_spark.operators.text_analysis import snapshot_diff

    docs = _docs(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % 11 != 3).withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 2, F.upper("text")).otherwise(
            F.col("text")
        ),
    )
    new = docs.filter(F.col("doc_id") % 13 != 5)
    return snapshot_diff(old, new)


def q_corpus_diff_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status rollup over the same derived snapshot pair as corpus_diff —
    the dashboard row a continuous-pretraining pipeline alerts on."""
    from datalake_indexes_spark.operators.text_analysis import (
        snapshot_diff_census,
    )

    docs = _docs(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % 11 != 3).withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 2, F.upper("text")).otherwise(
            F.col("text")
        ),
    )
    new = docs.filter(F.col("doc_id") % 13 != 5)
    return snapshot_diff_census(old, new)


def q_corpus_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation drop ledger — one row per INPUT document with the FIRST
    pipeline stage that rejected it ('quality' → 'logprob' → 'near_dup'
    → 'eval_shard') or 'kept'.  The observability surface every real
    curation run needs: "why is this doc not in the training set?"
    answered without re-running any stage."""
    from datalake_indexes_spark.operators.dedup import near_dup_keep_best
    from datalake_indexes_spark.operators.text_analysis import (
        quality_scores,
        unigram_logprob_scores,
    )

    docs = _docs(spark, sf_dir)
    q = quality_scores(docs).select("doc_id", "quality_score")
    lp = unigram_logprob_scores(docs).select("doc_id", "avg_logprob")
    dropped = (
        near_dup_keep_best(docs, q, threshold=0.7)
        .filter(~F.col("kept"))
        .select("doc_id", F.lit(True).alias("__nd"))
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 10000
    )
    return (
        docs.select("doc_id")
        .join(q, "doc_id")
        .join(lp, "doc_id")
        .join(dropped, "doc_id", "left")
        .select(
            "doc_id",
            "quality_score",
            "avg_logprob",
            F.when(F.col("quality_score") < V3_QUALITY_MIN, "quality")
            .when(F.col("avg_logprob") < V3_LOGPROB_MIN, "logprob")
            .when(F.col("__nd"), "near_dup")
            .when(bucket >= 8000, "eval_shard")
            .otherwise("kept")
            .alias("stage"),
        )
    )


def q_corpus_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe split: every document of a source lands in the same
    train/val/test split (md5 on the source key, not the doc id)."""
    from datalake_indexes_spark.operators.text_analysis import group_split

    return group_split(_docs(spark, sf_dir), group_col="source")


def q_corpus_pipeline_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative curation runner (pipelines/curation.py) graded by its
    funnel census: quality gate -> repetition gate -> earliest-keep exact
    dedup, with per-stage in/out/dropped counts."""
    from datalake_indexes_spark.pipelines.curation import run_curation

    res = run_curation(
        _docs(spark, sf_dir),
        [
            {"stage": "quality_min", "min_score": 0.55},
            {"stage": "max_repetition", "max_frac": 0.2},
            {"stage": "dedup_exact"},
        ],
    )
    return res.census


def q_corpus_drop_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document curation lineage over the SAME 3-stage config the
    census grades: which stage dropped each doc (or 'survived')."""
    from datalake_indexes_spark.pipelines.curation import drop_audit

    return drop_audit(
        _docs(spark, sf_dir),
        [
            {"stage": "quality_min", "min_score": 0.55},
            {"stage": "max_repetition", "max_frac": 0.2},
            {"stage": "dedup_exact"},
        ],
    )


def q_corpus_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc n-gram novelty over documents WITH planted duplication --
    every 6th doc is replaced by one shared boilerplate text (mirrored by
    the oracle), so the metric must report 0 novelty exactly there and
    high novelty elsewhere."""
    from datalake_indexes_spark.operators.dedup import doc_novelty

    boiler = (
        "shared boilerplate header applies to every mirrored document "
        "in this synthetic corpus"
    )
    docs = _docs(spark, sf_dir)
    planted = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 6 == 0, F.lit(boiler)).otherwise(F.col("text")),
    )
    return doc_novelty(planted, n=3)


def q_corpus_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration report: how many of the heaviest documents (by
    character weight) cover 50/80/90/95/99% of the corpus -- engine uses
    the distributed two-level prefix sum, oracle a plain window."""
    from datalake_indexes_spark.operators.discovery import pareto_report

    docs = _docs(spark, sf_dir).withColumn("__chars", F.length("text"))
    return pareto_report(docs, "doc_id", "__chars")


def q_corpus_pack_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic bin packing at budget 64 — the synthetic corpus (10-99
    words/doc) then spans size classes 1-6 plus oversize docs (>64
    words), exercising the whole class geometry."""
    from datalake_indexes_spark.operators.text_analysis import harmonic_pack

    return harmonic_pack(_docs(spark, sf_dir), token_budget=64)


def q_corpus_pack_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class padding-waste census over the harmonic pack."""
    from datalake_indexes_spark.operators.text_analysis import (
        harmonic_pack_fill,
    )

    return harmonic_pack_fill(_docs(spark, sf_dir), token_budget=64)


def q_corpus_select_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25% DSIR selection toward the English target — the
    deterministic rank-based importance-resampling step over the
    weights key."""
    from datalake_indexes_spark.operators.text_analysis import dsir_select

    return dsir_select(
        _docs(spark, sf_dir), fraction=0.25, n_buckets=256, alpha=0.5
    )


def q_corpus_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-cluster-safe split: the md5 bucket rides on the cluster
    representative, so lightly-edited copies can never straddle
    train/test — the leak a provenance-keyed split cannot see."""
    from datalake_indexes_spark.operators.dedup import cluster_safe_split

    return cluster_safe_split(_docs(spark, sf_dir), threshold=0.7)


def q_corpus_select_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet selection: keep each source's head+middle perplexity bands,
    drop the tail — selection ships (doc_id, source, band) ids only."""
    from datalake_indexes_spark.operators.text_analysis import ppl_select

    return ppl_select(_docs(spark, sf_dir), n_buckets=3, discount=0.75)


