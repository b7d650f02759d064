"""Corpus deduplication / decontamination pipelines.

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

from datalake_indexes_spark.plans.queries._base import DECONTAM_MODULUS, REPEAT_SPAN, _docs, _docs_multiline, _embeddings, _incremental_split, _self_span_fixture, _xspan_fixture

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_indexes_spark.operators.dedup import exact_duplicate_groups

    # spread=False: one md5+groupBy over the scan — the spread exchange
    # doubled this query at sf0.1 (r9 driver: 0.165 -> 0.338s) while the
    # md5 work itself is trivial; see _docs
    return exact_duplicate_groups(_docs(spark, sf_dir, spread=False))


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_indexes_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.7)


def q_dedup_neardup_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup semantics on the batch corpus: band-collision
    candidates verified by the signature-estimated Jaccard (what the
    incremental store computes; streaming/neardup_stream.py)."""
    from datalake_indexes_spark.streaming.neardup_stream import neardup_pairs_est

    return neardup_pairs_est(_docs(spark, sf_dir), threshold=0.5)


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup retention clusters: MinHash pairs collapsed to
    (doc_id, representative) — the keep/drop table a dedup pipeline applies."""
    from datalake_indexes_spark.operators.dedup import minhash_lsh_pairs, near_dup_clusters

    return near_dup_clusters(minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.7))


def q_dedup_clusters_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME clusters resolved by the distributed large-star/small-star
    connected components (edge-count guard forced to 0) — the crawl-scale
    path where the pair set never touches the driver.  Must agree with the
    union-find result row-for-row, so it shares the oracle."""
    from datalake_indexes_spark.operators.dedup import minhash_lsh_pairs, near_dup_clusters

    return near_dup_clusters(
        minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.7),
        distributed_threshold=0,
    )


def q_dedup_earliest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming exact dedup (dedup_stream.py): keep the
    earliest arrival (doc_id as arrival order) per content hash.  Hash
    groups coincide with text groups, so the DuckDB oracle groups by text
    directly."""
    from datalake_indexes_spark.streaming.dedup_stream import dedup_batch

    return dedup_batch(_docs(spark, sf_dir), ts_col="doc_id").select(
        "doc_id", "n_chars"
    )


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_indexes_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.7)


def q_dedup_ngram_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot-shingle-capped candidate path (boilerplate shingles above
    the frequency cap never generate candidates; verification stays exact
    on the full shingle sets) — the crawl-scale variant, oracle-graded."""
    from datalake_indexes_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), threshold=0.7, max_shingle_freq=50
    )


def q_dedup_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine recall of MinHash-LSH dedup vs the exact n-gram truth."""
    from datalake_indexes_spark.operators.dedup import dedup_recall_report

    return dedup_recall_report(_docs(spark, sf_dir), threshold=0.7)


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric n-gram containment — the subset-duplicate detector
    (snippet-inside-document pairs that Jaccard structurally misses)."""
    from datalake_indexes_spark.operators.dedup import ngram_containment_pairs

    return ngram_containment_pairs(_docs(spark, sf_dir), threshold=0.8)


def q_dedup_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-document retention: drop docs near-contained in a strictly
    larger doc (keep the article, drop the quoted snippet)."""
    from datalake_indexes_spark.operators.dedup import subset_dedup

    out = subset_dedup(_docs(spark, sf_dir), threshold=0.8)
    # NULL container (kept doc) -> -1 so the oracle column stays integer
    # through the pandas fetch (nullable BIGINT degrades to float64 NaN)
    return out.withColumn("container_id", F.coalesce("container_id", F.lit(-1)))


def q_dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact chunk dedup (RefinedWeb-style line dedup over
    a delimiter-free corpus): 4-word segments appearing in >= 2 distinct
    documents are boilerplate and removed; docs reassembled in order."""
    from datalake_indexes_spark.operators.dedup import chunk_dedup

    return chunk_dedup(_docs(spark, sf_dir), chunk_words=4, min_doc_freq=2)


def q_dedup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix over the MinHash near-dup pairs."""
    from datalake_indexes_spark.operators.dedup import (
        cross_source_dup_matrix,
        minhash_lsh_pairs,
    )

    docs = _docs(spark, sf_dir)
    return cross_source_dup_matrix(docs, minhash_lsh_pairs(docs, threshold=0.7))


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_indexes_spark.operators.dedup import simhash_pairs

    return simhash_pairs(_docs(spark, sf_dir), max_hamming=8)


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_indexes_spark.operators.similarity import cosine_pairs

    return cosine_pairs(_embeddings(spark, sf_dir), threshold=0.4, n_planes=4, dim=64)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every doc_id % 17 == 0 document plays the
    'evaluation set'; the rest of the corpus is scored for 5-gram overlap
    against it (planted near-duplicates in the corpus make the flag
    non-vacuous)."""
    from datalake_indexes_spark.operators.text_analysis import decontaminate

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % DECONTAM_MODULUS == 0)
    corpus = docs.filter(F.col("doc_id") % DECONTAM_MODULUS != 0)
    return decontaminate(corpus, bench, n=5, min_overlap=3)


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_indexes_spark.operators.similarity import semantic_dedup

    return semantic_dedup(_embeddings(spark, sf_dir), n_centroids=16, threshold=0.4)


def q_dedup_embedding_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-amplified (4-table) LSH embedding near-dup — higher recall
    than the single-signature `dedup_embedding_cosine` at 4x blocking."""
    from datalake_indexes_spark.operators.similarity import cosine_pairs_multiprobe

    return cosine_pairs_multiprobe(
        _embeddings(spark, sf_dir), threshold=0.4, n_tables=4, n_planes=6, dim=64
    )


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup retention: keep each cluster's best copy."""
    from datalake_indexes_spark.operators.dedup import near_dup_keep_best
    from datalake_indexes_spark.operators.text_analysis import quality_scores

    docs = _docs(spark, sf_dir)
    return near_dup_keep_best(docs, quality_scores(docs), threshold=0.7)


def q_dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated spans (Lee-et-al. exact-substring dedup signal)
    over documents WITH a planted verbatim 12-word span on every 7th doc
    — the unplanted corpus has no long exact overlaps, so the fixture
    makes the span/run machinery non-vacuous."""
    from datalake_indexes_spark.operators.dedup import repeated_spans

    docs = _docs(spark, sf_dir)
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" " + REPEAT_SPAN)),
        ).otherwise(F.col("text")),
    )
    return repeated_spans(planted, k=5, min_words=10)


def q_dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span REMOVAL over the planted-span fixture: every planted doc
    except the clique's smallest id has its 12 repeated words cut; the
    canonical copy survives by pair orientation."""
    from datalake_indexes_spark.operators.dedup import (
        remove_repeated_spans,
        repeated_spans,
    )

    docs = _docs(spark, sf_dir)
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" " + REPEAT_SPAN)),
        ).otherwise(F.col("text")),
    )
    spans = repeated_spans(planted, k=5, min_words=10)
    return remove_repeated_spans(planted, spans)


def q_dedup_cross_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-vs-reference verbatim spans (the contamination signal):
    the reference side broadcasts, the corpus never shuffles."""
    from datalake_indexes_spark.operators.dedup import cross_repeated_spans

    planted, ref = _xspan_fixture(spark, sf_dir)
    return cross_repeated_spans(planted, ref, k=5, min_words=10)


def q_decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination: cut the leaked reference words out of
    every corpus doc (vs the doc-level `decontaminate`, which drops the
    whole document)."""
    from datalake_indexes_spark.operators.dedup import decontaminate_spans

    planted, ref = _xspan_fixture(spark, sf_dir)
    return decontaminate_spans(planted, ref, k=5, min_words=10)


def q_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-card contamination matrix over the planted fixture: per
    (source, benchmark item) doc/span/word leak counts."""
    from datalake_indexes_spark.operators.dedup import contamination_report

    planted, ref = _xspan_fixture(spark, sf_dir)
    return contamination_report(planted, ref, k=5, min_words=10)


def q_dedup_self_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repeated spans (navigation blocks, quoted-reply
    chains) — the within-doc face of the exact-substring signal."""
    from datalake_indexes_spark.operators.dedup import self_repeated_spans

    return self_repeated_spans(
        _self_span_fixture(spark, sf_dir), k=5, min_words=10
    )


def q_dedup_self_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut the later copies of each doc's self-repeated spans; the
    earliest occurrence survives."""
    from datalake_indexes_spark.operators.dedup import remove_self_repetitions

    return remove_self_repetitions(
        _self_span_fixture(spark, sf_dir), k=5, min_words=10
    )


def q_dedup_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin-style prefix-filtered EXACT Jaccard join — the completeness
    theorem is driver-graded: the oracle is the plain all-pairs SQL at
    the same threshold, so any prefix too short shows up as a missing
    pair in the strict hash."""
    from datalake_indexes_spark.operators.dedup import prefix_jaccard_pairs

    return prefix_jaccard_pairs(_docs(spark, sf_dir), threshold=0.8)


def q_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup aggressiveness curve over a corpus WITH planted
    partial-overlap copies (every %4==0 doc gains a truncated copy at
    50/70/90% word length cycling by (doc_id div 4) % 3) — without the
    plant the synthetic near-dup families are all >=0.9 and the curve is
    flat."""
    from datalake_indexes_spark.operators.dedup import pair_threshold_sweep

    docs = _docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    keep = F.expr(
        "CAST(((5 + 2 * ((doc_id div 4) % 3))"
        " * size(split(text, ' '))) div 10 AS INT)"
    )
    planted = docs.select("doc_id", "text").unionAll(
        docs.filter(F.col("doc_id") % 4 == 0).select(
            (F.col("doc_id") + 3_000_000).alias("doc_id"),
            F.concat_ws(" ", F.slice(words, 1, keep)).alias("text"),
        )
    )
    return pair_threshold_sweep(planted)


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered incremental dedup vs the accumulated corpus —
    exact anti-join semantics (the prefilter is verified, so the driver
    grades a Bloom implementation against Bloom-free SQL)."""
    from datalake_indexes_spark.operators.dedup import incremental_new_docs

    hist, inc = _incremental_split(spark, sf_dir)
    return incremental_new_docs(hist, inc)


def q_dedup_incremental_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """False-positive meter for the position-set Bloom prefilter
    (hex_len=3 ⇒ m=4096, small enough to be non-vacuous at fixture
    scale: the sf0.01 split yields 3 real false positives)."""
    from datalake_indexes_spark.operators.dedup import incremental_dedup_report

    hist, inc = _incremental_split(spark, sf_dir)
    return incremental_dedup_report(hist, inc, hex_len=3)


def q_dedup_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus (increment vs history) prefix-filtered exact Jaccard
    join at 0.7 — catches the lightly-edited re-crawls the exact-hash
    incremental path admits.  Non-vacuous two ways: planted exact
    re-crawls pair at 1.0, and the corpus's near-dup families straddle
    the %5 split at their true jaccard."""
    from datalake_indexes_spark.operators.dedup import prefix_jaccard_join_ab

    hist, inc = _incremental_split(spark, sf_dir)
    return prefix_jaccard_join_ab(inc, hist, threshold=0.7)


def q_corpus_boiler_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate-line mass over the planted multi-line
    fixture — which crawl source needs template stripping."""
    from datalake_indexes_spark.operators.dedup import boilerplate_by_source

    return boilerplate_by_source(_docs_multiline(spark, sf_dir), min_docs=2)


