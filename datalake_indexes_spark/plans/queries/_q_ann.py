"""Embedding ANN / ML-feature pipelines.

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

from datalake_indexes_spark.plans.queries._base import _IVF_INDEX_DIRS, _docs, _embeddings

def q_ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining: top-5 cosine neighbors of each query vector
    excluding the LSH-blocked near-duplicate pairs — embedding-similar
    but known-distinct, the contrastive-negative generator."""
    from datalake_indexes_spark.operators.similarity import (
        cosine_pairs,
        hard_negatives,
    )

    emb = _embeddings(spark, sf_dir)
    near = cosine_pairs(emb, threshold=0.4, n_planes=4, dim=64).select(
        "vec_id_1", "vec_id_2"
    )
    return hard_negatives(emb, emb.filter(F.col("vec_id") < 10), near, k=5)


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_indexes_spark.operators.similarity import cosine_topk

    emb = _embeddings(spark, sf_dir)
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


def q_ann_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN majority-vote labeling over the embeddings' label column (the
    auto-labeling primitive; exact search variant is the graded one)."""
    from datalake_indexes_spark.operators.similarity import knn_classify

    emb = _embeddings(spark, sf_dir)
    return knn_classify(emb, emb.filter(F.col("vec_id") < 10), k=5)


def q_ann_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-IVF-cluster label purity/entropy — the embedding-quality
    triage view an auto-labeling pipeline checks first."""
    from datalake_indexes_spark.operators.similarity import cluster_purity_report

    return cluster_purity_report(_embeddings(spark, sf_dir), n_centroids=16)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-k (deterministic centroid variant)."""
    from datalake_indexes_spark.operators.similarity import ivf_topk

    emb = _embeddings(spark, sf_dir)
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 10), k=5, n_centroids=16)


def q_ann_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus kNN graph (IVF-blocked sort-merge join, neither side
    broadcast) — the all-vectors variant the query-broadcast searches
    can't express."""
    from datalake_indexes_spark.operators.similarity import knn_graph

    return knn_graph(_embeddings(spark, sf_dir), k=5, n_centroids=16)


def q_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine recall@5 of the IVF index vs exact brute force."""
    from datalake_indexes_spark.operators.similarity import ann_recall_report

    emb = _embeddings(spark, sf_dir)
    return ann_recall_report(emb, emb.filter(F.col("vec_id") < 10), k=5, n_centroids=16)


def q_ml_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection onto the top-8 principal components (whitening prep
    for ANN).  The raw projections carry no direct DuckDB oracle (the
    numpy eigen step over the model-constant d×d covariance is genuinely
    non-SQL), but since round 6 the eigen step is strict-hash-graded via
    the companion ``ml_pca_identity`` key (projected-variance ==
    ratio·trace, axis decorrelation, centering, rank order — identities
    a wrong decomposition cannot satisfy); numpy parity stays unit-pinned
    in tests/test_ml.py."""
    from datalake_indexes_spark.operators.similarity import pca_project

    return pca_project(_embeddings(spark, sf_dir), n_components=8)


def q_ml_pca_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-oracle contract report for the PCA eigen step: relational
    covariance trace + a-priori-zero identity residuals (projected
    variance == ratio*trace, axis decorrelation, centering, rank
    monotonicity) — see ``similarity.pca_identity_report``."""
    from datalake_indexes_spark.operators.similarity import pca_identity_report

    return pca_identity_report(_embeddings(spark, sf_dir), n_components=8)


def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass d×d covariance of the embedding dimensions (PCA /
    whitening input) — upper triangle, long form."""
    from datalake_indexes_spark.operators.similarity import embedding_covariance

    return embedding_covariance(_embeddings(spark, sf_dir))


def q_ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric int8-quantized top-k: corpus from its quantized form,
    queries full precision."""
    from datalake_indexes_spark.operators.similarity import cosine_topk_quantized

    emb = _embeddings(spark, sf_dir)
    return cosine_topk_quantized(emb, emb.filter(F.col("vec_id") < 10), k=5)


def q_ann_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED IVF path: corpus written partitioned by centroid
    (build_ivf_index), probes prune partitions — must produce the same
    rows as the inline ivf_topk, so it shares that oracle."""
    import tempfile

    from datalake_indexes_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk_indexed,
    )

    emb = _embeddings(spark, sf_dir)
    key = os.path.abspath(sf_dir)
    if key not in _IVF_INDEX_DIRS:
        d = tempfile.mkdtemp(prefix="ivfidx_")
        build_ivf_index(emb, d, n_centroids=16)
        _IVF_INDEX_DIRS[key] = d
    return ivf_topk_indexed(
        spark, _IVF_INDEX_DIRS[key], emb.filter(F.col("vec_id") < 10), k=5
    )


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate scale path.  The hyperplanes are deterministic
    (md5-seeded), so the bucketed result is exactly reproducible and the
    DuckDB oracle replicates the same planes as literals — the
    approximation is the operator's contract, not a looseness in the
    check.  ``dim=64`` matches the testdata embeddings (and the oracle)."""
    from datalake_indexes_spark.operators.similarity import hyperplane_lsh_topk

    emb = _embeddings(spark, sf_dir)
    return hyperplane_lsh_topk(emb, emb.filter(F.col("vec_id") < 10), k=5, dim=64)


def q_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-amplified multi-table LSH top-k (the recall knob over the
    single-table bucket search)."""
    from datalake_indexes_spark.operators.similarity import (
        hyperplane_lsh_topk_multiprobe,
    )

    emb = _embeddings(spark, sf_dir)
    return hyperplane_lsh_topk_multiprobe(
        emb, emb.filter(F.col("vec_id") < 10), k=5, dim=64
    )


def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k (unrefined deterministic codebooks
    so the DuckDB twin replicates the codebook in closed form)."""
    from datalake_indexes_spark.operators.similarity import pq_topk

    emb = _embeddings(spark, sf_dir)
    return pq_topk(emb, emb.filter(F.col("vec_id") < 10), k=5, m=4, ksub=16)


def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids in long form (domain-mixture
    summary; vectors never shuffle as whole arrays)."""
    from datalake_indexes_spark.operators.similarity import embedding_centroids

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return embedding_centroids(
        emb, emb.select("vec_id", "label"), "label", id_col="vec_id"
    )


def q_ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed IVF-PQ ANN (inverted-file pruning + residual PQ codes)."""
    from datalake_indexes_spark.operators.similarity import ivf_pq_topk

    emb = _embeddings(spark, sf_dir)
    return ivf_pq_topk(
        emb, emb.filter(F.col("vec_id") < 10),
        k=5, n_centroids=16, n_probe=4, m=4, ksub=16,
    )


def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold smoothed target encoding of c_mktsegment against
    c_acctbal (md5 folds — engine-reproducible, leakage-free)."""
    from datalake_indexes_spark.operators.ml import target_encode

    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    return target_encode(cust, "c_mktsegment", "c_acctbal", "c_custkey")


def q_ml_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified 5-fold CV assignment over the lang
    strata — md5-shuffle rank, (rank-1) % k, balanced within stratum."""
    from datalake_indexes_spark.operators.ml import cv_folds

    return cv_folds(_docs(spark, sf_dir), k=5, stratum_col="lang")


def q_ann_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine range search (all neighbors >= 0.2, k_cap=100) for the
    first 10 vectors — the threshold dual of ann_cosine_topk."""
    from datalake_indexes_spark.operators.similarity import range_search

    emb = _embeddings(spark, sf_dir)
    return range_search(
        emb, emb.filter(F.col("vec_id") < 10), threshold=0.2, k_cap=100
    )


def q_ann_range_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucket range search (threshold 0.2, k_cap 100) — the scale
    path twin of ann_range_search; deterministic planes make the
    approximation itself the graded contract."""
    from datalake_indexes_spark.operators.similarity import (
        range_search_blocked,
    )

    emb = _embeddings(spark, sf_dir)
    return range_search_blocked(
        emb,
        emb.filter(F.col("vec_id") < 10),
        threshold=0.2,
        k_cap=100,
        dim=64,
    )


def q_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of lineitem numerics — one
    aggregation pass, k(k-1)/2 corr aggregates."""
    from datalake_indexes_spark.operators.ml import correlation_matrix

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    return correlation_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )


def q_robust_scale_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/IQR) scaling summary: post-scale mean and stddev
    per lineitem numeric column."""
    from datalake_indexes_spark.operators.ml import robust_scale

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    cols = ["l_quantity", "l_extendedprice"]
    scaled = robust_scale(li.select(*cols), cols)
    pieces = [
        scaled.agg(
            F.lit(c).alias("column_name"),
            F.round(F.avg(c), 6).alias("mean_scaled"),
            F.round(F.stddev_samp(c), 6).alias("std_scaled"),
        )
        for c in cols
    ]
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift between the even and odd vec_id cohorts WITH
    a planted directional shift (+0.35 on the odd cohort's first
    component, mirrored by the oracle) -- centroid cosine departs from
    1.0, norm ratio reports the scale change."""
    from datalake_indexes_spark.operators.similarity import embedding_drift

    emb = _embeddings(spark, sf_dir).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1).select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x + F.lit(0.35)).otherwise(x),
        ).alias("embedding"),
    )
    return embedding_drift(a, b)


def q_ml_nb_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed multinomial Naive Bayes trained on the lang labels and
    applied back to the corpus.  The synthetic corpus shares one
    vocabulary across langs, so three ' zz'||lang marker tokens are
    planted per document to make the classes separable (and the argmax
    margins decisive on both engines)."""
    from datalake_indexes_spark.operators.ml import hashed_nb_classify

    docs = _docs(spark, sf_dir)
    planted = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" zz"), F.col("lang"),
            F.lit(" zz"), F.col("lang"),
            F.lit(" zz"), F.col("lang"),
        ),
    )
    return hashed_nb_classify(planted, n_buckets=512, alpha=1.0)


def q_ann_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware retrieval: MMR re-rank of the cosine top-40
    candidates for 5 queries (greedy selection replayed by an unrolled
    materialized-CTE twin)."""
    from datalake_indexes_spark.operators.similarity import mmr_topk

    emb = _embeddings(spark, sf_dir)
    return mmr_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=8, lam=0.7, candidates=40
    )


def q_ann_ivf_pq_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ + exact re-rank (the FAISS refine pattern): PQ-estimated
    top k·3 candidates, true-vector exact-cosine rescore, top-k."""
    from datalake_indexes_spark.operators.similarity import ivf_pq_refined_topk

    emb = _embeddings(spark, sf_dir)
    return ivf_pq_refined_topk(
        emb, emb.filter(F.col("vec_id") < 10),
        k=5, c_factor=3, n_centroids=16, n_probe=4, m=4, ksub=16,
    )


def q_ann_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-criterion pair mining (the CCMatrix/LASER bitext rule)
    between the even- and odd-id embedding halves: ratio margin over
    both-direction top-4 neighborhoods, mutual-NN flag; brute-force
    replay by the twin."""
    from datalake_indexes_spark.operators.similarity import margin_mining

    emb = _embeddings(spark, sf_dir)
    return margin_mining(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        k=4,
        threshold=1.1,
    )


def q_ann_margin_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-blocked margin mining (the corpus-scale path: shared union
    centroids, bipartite probe/member join, no quadratic cross)."""
    from datalake_indexes_spark.operators.similarity import margin_mining_blocked

    emb = _embeddings(spark, sf_dir)
    return margin_mining_blocked(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        k=4,
        threshold=1.1,
        n_centroids=16,
        n_probe=2,
    )


def q_ann_margin_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked-margin precision/recall gauge (r7 verdict task #5): one
    row measuring the blocked miner against the brute rule, with the
    exact-rescore repair — the engine rescores survivors literally
    (survivor-query cosine_topk passes), the twin authors the rescored
    set as blocked ∩ brute, so a strict match proves the rescore
    theorem including precision_rescored = 1.0."""
    from datalake_indexes_spark.operators.similarity import margin_rescore_report

    emb = _embeddings(spark, sf_dir)
    return margin_rescore_report(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        k=4,
        threshold=1.1,
        n_centroids=16,
        n_probe=2,
    )


def q_ann_nn_descent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One NN-descent round over the IVF-blocked kNN graph: reversed +
    two-hop candidate expansion, exact rescore, top-k re-cut — the
    graph-refinement step between IVF recall and exact truth."""
    from datalake_indexes_spark.operators.similarity import nn_descent_round

    return nn_descent_round(_embeddings(spark, sf_dir), k=5, n_centroids=16)


def q_ann_nn_descent2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two iterated NN-descent rounds (each feeding the refined edges to
    the next; recall monotone in rounds — 0.34/0.49/0.54 on the small
    fixture for rounds 0/1/2)."""
    from datalake_indexes_spark.operators.similarity import nn_descent

    return nn_descent(_embeddings(spark, sf_dir), k=5, rounds=2, n_centroids=16)


def q_ml_embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotropy gauge for the embedding table (sum-vector identity:
    all-pairs mean cosine from one O(n·d) aggregate) — the sanity read
    before trusting any cosine threshold."""
    from datalake_indexes_spark.operators.similarity import (
        embedding_isotropy_report,
    )

    return embedding_isotropy_report(_embeddings(spark, sf_dir))


def q_ml_nb_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability report for the hashed-NB classifier over the same
    marker-planted corpus as ml_nb_langid: accuracy per top-2
    log-score-margin bin — where a curation pipeline reads off its
    keep-threshold."""
    from datalake_indexes_spark.operators.ml import nb_calibration_report

    planted = _docs(spark, sf_dir).withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" zz"), F.col("lang"),
            F.lit(" zz"), F.col("lang"),
            F.lit(" zz"), F.col("lang"),
        ),
    )
    return nb_calibration_report(
        planted, n_buckets=512, alpha=1.0, bin_width=2.0, n_bins=16
    )


