"""Graph-analytics pipelines.

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

from datalake_indexes_spark.plans.queries._base import _docs, _with_planted_links

def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles of the simhash near-dup graph (degree-oriented
    node-iterator) — cluster-density evidence over the planted dups."""
    from datalake_indexes_spark.operators.dedup import simhash_pairs
    from datalake_indexes_spark.operators.graph import triangles

    pairs = simhash_pairs(_docs(spark, sf_dir), max_hamming=8)
    return triangles(pairs, src="doc_id_1", dst="doc_id_2")


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-duplicate document graph (minhash-LSH pairs
    symmetrized) — which documents sit central in duplication clusters."""
    from datalake_indexes_spark.operators.dedup import minhash_lsh_pairs
    from datalake_indexes_spark.operators.graph import pagerank

    pairs = minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.7)
    edges = pairs.select(
        F.col("doc_id_1").alias("src"), F.col("doc_id_2").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_id_2").alias("src"), F.col("doc_id_1").alias("dst"))
    )
    return pagerank(edges, damping=0.85, iters=6).select(
        F.col("node").alias("doc_id"), F.round("rank", 8).alias("rank")
    )


def q_graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS over the extracted link graph (docs as hubs, planted target
    domains as authorities) — the mutually recursive centrality pair on
    the graph HITS was designed for."""
    from datalake_indexes_spark.operators.graph import hits
    from datalake_indexes_spark.operators.web import extract_links

    links = extract_links(_with_planted_links(_docs(spark, sf_dir)))
    edges = links.select(
        F.col("doc_id").cast("string").alias("src"),
        F.col("link_domain").alias("dst"),
    )
    return hits(edges, iters=4).select(
        "node",
        F.round("hub", 8).alias("hub"),
        F.round("authority", 8).alias("authority"),
    )


def q_graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank over the near-dup graph, teleporting to the
    node%10==0 seed set — rank as proximity to the seeds."""
    from datalake_indexes_spark.operators.dedup import minhash_lsh_pairs
    from datalake_indexes_spark.operators.graph import personalized_pagerank

    pairs = minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.7)
    edges = pairs.select(
        F.col("doc_id_1").alias("src"), F.col("doc_id_2").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_id_2").alias("src"), F.col("doc_id_1").alias("dst"))
    )
    return personalized_pagerank(edges, seed_modulus=10, damping=0.85, iters=6).select(
        F.col("node").alias("doc_id"), F.round("rank", 8).alias("rank")
    )


def q_graph_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficients over the simhash near-dup graph
    (dense-blob vs cluster-stitching-hub separation)."""
    from datalake_indexes_spark.operators.dedup import simhash_pairs
    from datalake_indexes_spark.operators.graph import clustering_coefficients

    pairs = simhash_pairs(_docs(spark, sf_dir), max_hamming=8)
    return clustering_coefficients(
        pairs.select(F.col("doc_id_1").alias("src"), F.col("doc_id_2").alias("dst"))
    )


def q_graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the simhash near-dup graph: non-adjacent
    document pairs ranked by common-neighbor / Jaccard / Adamic-Adar —
    the near-dup pairs the banding missed but the neighborhood
    structure implies."""
    from datalake_indexes_spark.operators.dedup import simhash_pairs
    from datalake_indexes_spark.operators.graph import link_prediction

    pairs = simhash_pairs(_docs(spark, sf_dir), max_hamming=8)
    return link_prediction(pairs, src="doc_id_1", dst="doc_id_2")


def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the simhash near-dup graph (fixed 8 peel rounds — the
    oracle-parity knob, above the measured convergence depth: 7 rounds
    at sf0.001, 6 at sf0.01; equality with the until-converged variant
    is pinned by tests/test_graph_linkpred.py): genuine duplication
    clusters survive, one-off pair matches peel."""
    from datalake_indexes_spark.operators.dedup import simhash_pairs
    from datalake_indexes_spark.operators.graph import k_core

    pairs = simhash_pairs(_docs(spark, sf_dir), max_hamming=8)
    return k_core(pairs, k=2, rounds=8, src="doc_id_1", dst="doc_id_2")


def q_graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities over the simhash near-dup graph
    (fixed 10 rounds — oracle-parity knob above the measured
    convergence depth: 3 rounds at sf0.001, 8 at sf0.01; past the fixed
    point extra rounds are no-ops, equality with the converged variant
    pinned by tests): template families inside one transitive blob."""
    from datalake_indexes_spark.operators.dedup import simhash_pairs
    from datalake_indexes_spark.operators.graph import label_propagation

    pairs = simhash_pairs(_docs(spark, sf_dir), max_hamming=8)
    return label_propagation(pairs, rounds=10, src="doc_id_1", dst="doc_id_2")


def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modularity of the simhash near-dup graph partitioned by document
    source — 'do near-duplicates stay inside their source?' (Q_c per
    source; contribution ≈ 0 means source explains nothing)."""
    from datalake_indexes_spark.operators.dedup import simhash_pairs
    from datalake_indexes_spark.operators.graph import modularity

    docs = _docs(spark, sf_dir)
    pairs = simhash_pairs(docs, max_hamming=8)
    labels = docs.select(F.col("doc_id").alias("node"), F.col("source").alias("community"))
    return modularity(pairs, labels, src="doc_id_1", dst="doc_id_2")


