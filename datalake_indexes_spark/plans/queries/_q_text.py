"""Text analysis / search / LM-scoring pipelines.

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

from datalake_indexes_spark.plans.queries._base import BM25_QUERY_TERMS, _BPE_MERGES, _TEXT_INDEX_DIRS, _TEXT_INDEX_POS_DIRS, _docs, _docs_multiline, _embeddings

def q_text_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_indexes_spark.operators.dedup import simhash_signatures

    return simhash_signatures(_docs(spark, sf_dir))


def q_text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_indexes_spark.operators.text_analysis import token_counts

    return token_counts(_docs(spark, sf_dir))


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_indexes_spark.operators.text_analysis import quality_scores

    # spread=False: one codegen projection over the scan — the spread
    # exchange doubled this query at sf0.1 (r9 driver: 0.173 -> 0.426s);
    # see _docs
    return quality_scores(_docs(spark, sf_dir, spread=False))


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_indexes_spark.operators.text_analysis import language_id

    return language_id(_docs(spark, sf_dir))


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_indexes_spark.operators.text_analysis import fingerprints

    return fingerprints(_docs(spark, sf_dir))


def q_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over documents WITH planted PII — the synthetic corpus
    contains none, so grading the raw table would verify zero redactions
    (the J5/J6 vacuity trap); every third doc gets a deterministic
    email + IPv4 + phone suffix derived from doc_id, mirrored by the
    oracle."""
    from datalake_indexes_spark.operators.text_analysis import pii_scrub

    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    suffix = F.concat(
        F.col("text"),
        F.lit(" reach me at user"), did.cast("string"), F.lit("@example.com"),
        F.lit(" or 10.0."), (did % 256).cast("string"), F.lit(".7"),
        F.lit(" or +1 555 20"), (did % 90 + 10).cast("string"),
    )
    planted = docs.withColumn(
        "text", F.when(did % 3 == 0, suffix).otherwise(F.col("text"))
    )
    return pii_scrub(planted)


def q_text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram Shannon entropy (information-density filter)."""
    from datalake_indexes_spark.operators.text_analysis import unigram_entropy

    return unigram_entropy(_docs(spark, sf_dir))


def q_text_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 tf-idf keywords per document."""
    from datalake_indexes_spark.operators.text_analysis import keyword_extract

    return keyword_extract(_docs(spark, sf_dir), k=3)


def q_text_script_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-script composition over documents WITH planted non-Latin
    suffixes (doc_id % 4 picks Cyrillic/CJK/Arabic) — the raw corpus is
    pure ASCII, so grading it unplanted would verify zeros."""
    from datalake_indexes_spark.operators.text_analysis import (
        SCRIPT_PLANT_SUFFIXES,
        script_ratios,
    )

    docs = _docs(spark, sf_dir)
    text = F.col("text")
    mod = F.col("doc_id") % 4
    planted = text
    for m, sfx in SCRIPT_PLANT_SUFFIXES.items():
        planted = F.when(mod == m, F.concat(text, F.lit(sfx))).otherwise(planted)
    return script_ratios(docs.withColumn("text", planted))


def q_text_bpe_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword token counts under a corpus-trained BPE merge table (the
    real token denomination for budget/packing stages).  Oracled since
    round 6: ``oracle.text_bpe_counts_sql`` replays the full train+apply
    loop as 64 unrolled merge rounds in DuckDB (the pagerank-twin move),
    exact because greedy apply == training replay — the parity
    tests/test_bpe.py pins, together with training determinism and the
    pure-Python reference apply."""
    from datalake_indexes_spark.functions.bpe import apply_bpe, train_bpe

    docs = _docs(spark, sf_dir)
    key = os.path.abspath(sf_dir)
    if key not in _BPE_MERGES:
        _BPE_MERGES[key] = train_bpe(docs, n_merges=64)
    return apply_bpe(docs, _BPE_MERGES[key])


def q_text_content_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose classification over documents WITH planted code
    suffixes (doc_id % 5 == 0) — the raw corpus is pure prose, so the
    unplanted query would grade an all-prose constant."""
    from datalake_indexes_spark.operators.text_analysis import (
        CODE_PLANT_SUFFIX,
        content_type_scores,
    )

    docs = _docs(spark, sf_dir)
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(CODE_PLANT_SUFFIX)),
        ).otherwise(F.col("text")),
    )
    return content_type_scores(planted)


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_indexes_spark.operators.text_analysis import repetition_scores

    return repetition_scores(_docs(spark, sf_dir))


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_indexes_spark.operators.search import bm25_topk

    return bm25_topk(_docs(spark, sf_dir), BM25_QUERY_TERMS, k=10)


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_indexes_spark.operators.search import tfidf_topk

    return tfidf_topk(_docs(spark, sf_dir), BM25_QUERY_TERMS, k=10)


def q_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED inverted-index path: postings written term-sorted
    (build_text_index), probes push an IN-list filter to the scan — must
    produce the same rows as the inline bm25_topk, so it shares that
    oracle."""
    import tempfile

    from datalake_indexes_spark.operators.search import (
        bm25_topk_indexed,
        build_text_index,
    )

    key = os.path.abspath(sf_dir)
    if key not in _TEXT_INDEX_DIRS:
        d = tempfile.mkdtemp(prefix="textidx_")
        build_text_index(_docs(spark, sf_dir), d)
        _TEXT_INDEX_DIRS[key] = d
    return bm25_topk_indexed(spark, _TEXT_INDEX_DIRS[key], BM25_QUERY_TERMS, k=10)


def q_text_paragraph_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level curation over documents WITH planted paragraphs
    (each doc gets one good paragraph and one bad — repetition or
    too-short, by doc_id parity); unplanted docs are single-paragraph so
    the filter would grade near-vacuously."""
    from datalake_indexes_spark.operators.text_analysis import paragraph_filter

    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    planted = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit("\ngood paragraph the data model runs well\n"),
            F.when(did % 2 == 0, F.lit("spam spam spam spam")).otherwise(
                F.lit("a b")
            ),
        ),
    )
    return paragraph_filter(planted)


def q_text_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning rules over documents WITH planted sentence/boilerplate
    variants (doc_id % 4: proper sentences / lorem-ipsum / code braces /
    unchanged)."""
    from datalake_indexes_spark.operators.text_analysis import c4_rule_flags

    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    planted = docs.withColumn(
        "text",
        F.when(
            did % 4 == 0,
            F.concat(
                F.col("text"),
                F.lit(
                    ". The data runs well every day. The model trains fast"
                    " on data. It works."
                ),
            ),
        )
        .when(did % 4 == 1, F.concat(F.col("text"), F.lit(" lorem ipsum dolor")))
        .when(did % 4 == 2, F.concat(F.col("text"), F.lit(" if (x) { return 1; }")))
        .otherwise(F.col("text")),
    )
    return c4_rule_flags(planted)


def q_text_compressibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression-ratio quality signal (boilerplate compresses,
    noise doesn't).  No DuckDB oracle: zlib is not a relational
    expression — direct-zlib parity is pinned in tests/test_corpus_ops.py
    instead; the driver records the rows-only check."""
    from datalake_indexes_spark.operators.text_analysis import (
        compression_ratio_scores,
    )

    return compression_ratio_scores(_docs(spark, sf_dir))


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_indexes_spark.operators.text_analysis import vocab_topk

    return vocab_topk(_docs(spark, sf_dir), k=50)


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+vector retrieval fused with reciprocal-rank fusion."""
    from datalake_indexes_spark.operators.search import hybrid_rrf_topk

    return hybrid_rrf_topk(
        _docs(spark, sf_dir),
        _embeddings(spark, sf_dir),
        BM25_QUERY_TERMS,
        query_vec_id=0,
        k=10,
        k_each=20,
    )


def q_text_tfidf_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All tf-idf-weighted near-duplicate document pairs (df-capped)."""
    from datalake_indexes_spark.operators.search import tfidf_cosine_pairs

    return tfidf_cosine_pairs(_docs(spark, sf_dir), threshold=0.5)


def q_text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality: per-doc mean corpus-unigram log-prob."""
    from datalake_indexes_spark.operators.text_analysis import (
        unigram_logprob_scores,
    )

    return unigram_logprob_scores(_docs(spark, sf_dir))


def q_text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity proxy: penalizes improbable word ORDER that
    the unigram score cannot see (add-0.5 smoothed conditionals)."""
    from datalake_indexes_spark.operators.text_analysis import (
        bigram_logprob_scores,
    )

    return bigram_logprob_scores(_docs(spark, sf_dir))


def q_text_quality_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source percent-rank calibration of quality scores (run-length
    counts + broadcast rank map — no per-source window at corpus scale)."""
    from datalake_indexes_spark.operators.text_analysis import (
        normalize_scores_by_group,
        quality_scores,
    )

    docs = _docs(spark, sf_dir)
    scored = docs.select("doc_id", "source").join(
        quality_scores(docs).select("doc_id", "quality_score"), "doc_id"
    )
    return normalize_scores_by_group(scored, "source").select(
        "doc_id", "source", "quality_score", "score_pct"
    )


def q_text_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style canonicalization over event props (digit/punct-rich):
    the dedup-key normalizer plus its md5 — graded end to end."""
    from datalake_indexes_spark.functions.text import canonicalize_text_col

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    canon = canonicalize_text_col(F.col("props"))
    return ev.select(
        "event_id", canon.alias("canon"), F.md5(canon).alias("canon_hash")
    )


def q_text_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: document-co-occurrence PMI over the capped
    top-df vocabulary (the phrase-vocab signal, bounded quadratic)."""
    from datalake_indexes_spark.operators.text_analysis import (
        word_cooccurrence_pmi,
    )

    return word_cooccurrence_pmi(_docs(spark, sf_dir))


def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch / Flesch-Kincaid readability per document (vowel-run
    syllable heuristic, native expressions only)."""
    from datalake_indexes_spark.operators.text_analysis import readability_scores

    return readability_scores(_docs(spark, sf_dir))


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode normalization over documents WITH planted noise -- the
    synthetic corpus is clean ASCII, so every 4th doc is wrapped in the
    shared PLANT_NOISE_PREFIX/SUFFIX (smart quotes, NBSP, em-dash, tab
    runs, ellipsis, zero-width space, a control char, trailing spaces and
    a 4-newline run), mirrored by the oracle via chr() codes."""
    from datalake_indexes_spark.operators.text_analysis import (
        PLANT_NOISE_PREFIX,
        PLANT_NOISE_SUFFIX,
        normalize_text,
    )

    docs = _docs(spark, sf_dir)
    noisy = F.concat(F.lit(PLANT_NOISE_PREFIX), F.col("text"), F.lit(PLANT_NOISE_SUFFIX))
    planted = docs.withColumn(
        "text", F.when(F.col("doc_id") % 4 == 0, noisy).otherwise(F.col("text"))
    )
    return normalize_text(planted)


def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the documents vocabulary (ln-ln OLS on the
    top-1000 word frequencies) -- the whole-corpus health gauge."""
    from datalake_indexes_spark.operators.text_analysis import zipf_fit

    return zipf_fit(_docs(spark, sf_dir), top_n=1000)


def q_vocab_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters (count > N/m) via the two-pass
    Misra-Gries candidate sketch + exact recount."""
    from datalake_indexes_spark.operators.text_analysis import heavy_hitters

    return heavy_hitters(_docs(spark, sf_dir), m=200)


def q_text_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021) over documents WITH planted
    rule-violating variants (doc_id % 5: bullet lines / ellipsis lines /
    symbol spam / numeral words / unchanged).  min_words=30 and
    min_stopwords=1 are calibrated to the synthetic corpus (10-99 words,
    'the' is the only canonical stop word in its vocabulary) so every
    rule fires on some documents and keeps others."""
    from datalake_indexes_spark.operators.text_analysis import (
        GOPHER_PLANT_BULLETS,
        GOPHER_PLANT_ELLIPSIS,
        GOPHER_PLANT_NUMERIC,
        GOPHER_PLANT_SYMBOLS,
        gopher_rule_flags,
    )

    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    planted = docs.withColumn(
        "text",
        F.when(
            did % 5 == 0,
            F.concat(F.col("text"), F.lit("\n" + "\n".join(GOPHER_PLANT_BULLETS))),
        )
        .when(
            did % 5 == 1,
            F.concat(F.col("text"), F.lit("\n" + "\n".join(GOPHER_PLANT_ELLIPSIS))),
        )
        .when(
            did % 5 == 2,
            F.concat(F.col("text"), F.lit(" " + GOPHER_PLANT_SYMBOLS)),
        )
        .when(
            did % 5 == 3,
            F.concat(F.col("text"), F.lit(" " + GOPHER_PLANT_NUMERIC)),
        )
        .otherwise(F.col("text")),
    )
    return gopher_rule_flags(planted, min_words=30, min_stopwords=1)


def q_text_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR hashed-n-gram importance weights with target = English docs
    over the mixed-language corpus — the raw-document selection signal
    for importance resampling toward a target domain."""
    from datalake_indexes_spark.operators.text_analysis import (
        dsir_importance_weights,
    )

    return dsir_importance_weights(_docs(spark, sf_dir), n_buckets=256, alpha=0.5)


def q_search_proximity_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED positional-index path: positions written term-sorted
    (build_text_index(positional=True)), probes push an IN-list filter to
    the scan — must produce the same rows as the inline proximity_topk,
    so it shares that oracle."""
    import tempfile

    from datalake_indexes_spark.operators.search import (
        build_text_index,
        proximity_topk_indexed,
    )

    key = os.path.abspath(sf_dir)
    if key not in _TEXT_INDEX_POS_DIRS:
        d = tempfile.mkdtemp(prefix="textidxpos_")
        build_text_index(_docs(spark, sf_dir), d, positional=True)
        _TEXT_INDEX_POS_DIRS[key] = d
    return proximity_topk_indexed(
        spark, _TEXT_INDEX_POS_DIRS[key], BM25_QUERY_TERMS, k=10
    )


def q_search_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinCover phrase-proximity top-k for the shared BM25 query terms —
    conjunctive span ranking (the fixture has 276 docs carrying all
    three terms at sf0.01, so spans differentiate meaningfully)."""
    from datalake_indexes_spark.operators.search import proximity_topk

    return proximity_topk(_docs(spark, sf_dir), BM25_QUERY_TERMS, k=10)


def q_text_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency boilerplate-line census (CCNet paragraph-hash
    view) over documents planted with frequency-varied chrome lines —
    the review surface an operator reads before committing to a
    line-strip threshold."""
    from datalake_indexes_spark.operators.dedup import line_census

    return line_census(_docs_multiline(spark, sf_dir), min_docs=2)


def q_text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency line strip + in-order reassembly (the RefinedWeb
    exact-line-dedup stage at natural line boundaries; chunk_dedup is
    the delimiter-free cousin).  Every doc keeps a row so fully-
    boilerplate documents stay countable."""
    from datalake_indexes_spark.operators.dedup import line_dedup

    return line_dedup(_docs_multiline(spark, sf_dir), min_docs=2)


def q_text_kn_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM scores per document — absolute
    discounting + continuation-count backoff (the classic upgrade over
    the add-k bigram perplexity proxy)."""
    from datalake_indexes_spark.operators.text_analysis import kn_logprob_scores

    return kn_logprob_scores(_docs(spark, sf_dir), discount=0.75)


def q_text_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-source LM-score bucketing (Wenzek et al. 2020):
    equal-count head/middle/tail terciles of the Kneser-Ney score
    WITHIN each source — the published recipe buckets per source, not
    globally, so a noisy source keeps its own head instead of losing
    everything to a global threshold."""
    from datalake_indexes_spark.operators.text_analysis import ppl_buckets

    return ppl_buckets(_docs(spark, sf_dir), n_buckets=3, discount=0.75)


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth curve in ingestion order (integer-exact
    cumulative docs/tokens/vocab per 10-doc block) — the source-
    saturation diagnostic."""
    from datalake_indexes_spark.operators.text_analysis import vocab_growth_curve

    return vocab_growth_curve(_docs(spark, sf_dir), interval=10)


def q_vocab_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law K·N^beta log-log OLS over the growth-curve points."""
    from datalake_indexes_spark.operators.text_analysis import vocab_heaps_fit

    return vocab_heaps_fit(_docs(spark, sf_dir), interval=10)


