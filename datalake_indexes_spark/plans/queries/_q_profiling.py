"""Column profiling / web hygiene / governance pipelines.

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

from datalake_indexes_spark.plans.queries._base import GOV_PSEUDO_SECRET, KS_DRIFT_COLUMNS, WEB_BLOCKLIST, _docs, _ensure_session_confs, _with_planted_links, _with_planted_urls, load_tables, testdata_index

def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity release-risk report over customer with
    (nation, market segment) as quasi-identifiers — the governance check
    run before a tabular dataset ships."""
    from datalake_indexes_spark.operators.discovery import k_anonymity_report

    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    return k_anonymity_report(
        cust, ["c_nationkey", "c_mktsegment"], sensitive_col="c_acctbal", k=10
    )


def q_k_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppression remediation: customer released k-anonymous (sub-k
    (nation, segment) classes get their QI values masked)."""
    from datalake_indexes_spark.operators.discovery import suppress_small_groups

    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    return suppress_small_groups(cust, ["c_nationkey", "c_mktsegment"], k=10)


def q_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP-released class histogram for the customer QI (ε=1, fixed
    seed) — one deterministic Laplace draw per class."""
    from datalake_indexes_spark.operators.discovery import dp_group_counts

    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    return dp_group_counts(
        cust, ["c_nationkey", "c_mktsegment"], epsilon=1.0, seed="dp"
    )


def q_dp_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP-released clipped account-balance sums per customer QI class
    (clip [0, 10000], ε=1, fixed seed)."""
    from datalake_indexes_spark.operators.discovery import dp_group_sums

    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    return dp_group_sums(
        cust, ["c_nationkey", "c_mktsegment"], "c_acctbal",
        lo=0.0, hi=10_000.0, epsilon=1.0, seed="dp-sum",
    )


def q_fuzzy_join_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance self-join on customer names (positional q-gram
    blocking + levenshtein verify) — graded against the NAIVE cross-join
    oracle, so green means the blocking is recall-complete."""
    from datalake_indexes_spark.operators.fuzzy import fuzzy_join

    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    a = cust.select(F.col("c_custkey").alias("a_id"), F.col("c_name").alias("a_v"))
    b = cust.select(F.col("c_custkey").alias("b_id"), F.col("c_name").alias("b_v"))
    return fuzzy_join(a, b, "a_v", "b_v", "a_id", "b_id", max_distance=1).filter(
        F.col("a_id") < F.col("b_id")
    )


def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive entity ids over the fuzzy-match graph (multi-hop chains
    must all collapse to the global min member id — a hard closure test)."""
    from datalake_indexes_spark.operators.fuzzy import entity_resolution

    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    return entity_resolution(cust, "c_name", "c_custkey", max_distance=1)


def q_fs_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter probabilistic linkage of customer against a
    deterministically perturbed copy: name uppercased every 5th key,
    code shifted every 3rd, segment dropped every 11th — blocked on
    nationkey, scored by frequency-estimated log-likelihood weights.
    The rare-value fields (name, code) dominate; the 5-value segment
    contributes little even when it agrees — the u-weighting FS exists
    for."""
    from datalake_indexes_spark.operators.fuzzy import fs_record_linkage

    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    a = cust.select(
        F.col("c_custkey").alias("a_id"),
        F.col("c_nationkey").alias("blk"),
        F.col("c_name").alias("name"),
        (F.col("c_custkey") % 9973).cast("string").alias("code"),
        F.col("c_mktsegment").alias("seg"),
    )
    b = cust.select(
        (F.col("c_custkey") + F.lit(1_000_000)).alias("b_id"),
        F.col("c_nationkey").alias("blk"),
        F.when(F.col("c_custkey") % 5 == 0, F.upper("c_name"))
        .otherwise(F.col("c_name"))
        .alias("name"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            ((F.col("c_custkey") + 1) % 9973).cast("string"),
        )
        .otherwise((F.col("c_custkey") % 9973).cast("string"))
        .alias("code"),
        F.when(F.col("c_custkey") % 11 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
    )
    return fs_record_linkage(
        a, b, ["name", "code", "seg"], block_on="blk", m=0.95, threshold=0.0
    )


def q_web_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization — the dedup/join key for web-crawl corpora
    (lowercase + www-strip + default-port drop + tracking-param removal +
    param sort + fragment drop), plus registered-domain extraction."""
    from datalake_indexes_spark.operators.web import canonicalize_urls

    return canonicalize_urls(_with_planted_urls(_docs(spark, sf_dir)))


def q_web_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registered-domain corpus census (doc/host/char counts) feeding
    domain-level mixing weights and blocklist candidates."""
    from datalake_indexes_spark.operators.web import domain_stats

    return domain_stats(_with_planted_urls(_docs(spark, sf_dir)))


def q_web_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-blocklist crawl-hygiene gate: documents surviving a broadcast
    anti-join against a blocked registered-domain list."""
    from datalake_indexes_spark.operators.web import filter_blocklist

    return filter_blocklist(_with_planted_urls(_docs(spark, sf_dir)), WEB_BLOCKLIST)


def q_web_extract_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperlink extraction (crawl frontier / link graph): one row per
    planted anchor with the target's registered domain."""
    from datalake_indexes_spark.operators.web import extract_links

    return extract_links(_with_planted_links(_docs(spark, sf_dir)))


def q_web_link_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-link domain census over the corpus."""
    from datalake_indexes_spark.operators.web import link_domain_census

    return link_domain_census(_with_planted_links(_docs(spark, sf_dir)))


def q_export_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight census of a sharded corpus export: the content-addressed
    md5-bucket shard assignment every export sink uses, aggregated to
    (shard_id, n_docs, n_chars)."""
    from datalake_indexes_spark.sources.export import shard_manifest

    return shard_manifest(_docs(spark, sf_dir), n_shards=8)


def q_export_shard_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard content fingerprints (sum of per-row md5 hashes mod a
    prime) — the change-detection census incremental re-export diffs to
    rewrite only touched shards."""
    from datalake_indexes_spark.sources.export import shard_fingerprints

    return shard_fingerprints(
        _docs(spark, sf_dir), n_shards=8, cols=["doc_id", "text"]
    )


def q_governance_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed pseudonymization of customer identifiers: same input + secret
    → same token, so joins and group-bys still work on the release."""
    from datalake_indexes_spark.operators.discovery import pseudonymize_columns

    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    return pseudonymize_columns(
        cust.select("c_custkey", "c_name", "c_mktsegment", "c_acctbal"),
        ["c_custkey", "c_name"],
        GOV_PSEUDO_SECRET,
    )


def q_governance_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release audit: k-anonymity + l-diversity of customer under the
    (c_nationkey, c_mktsegment) quasi-identifier, c_acctbal sensitive."""
    from datalake_indexes_spark.operators.discovery import k_anonymity_audit

    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    return k_anonymity_audit(
        cust, ["c_nationkey", "c_mktsegment"], k=5, sensitive_col="c_acctbal"
    )


def q_governance_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade census: forget every 37th customer,
    cascading through orders to lineitem (nation rides along untouched
    to pin the zero-deletion path).  Grades the erasure bookkeeping a
    lake owner files with the deletion request."""
    from datalake_indexes_spark.operators.discovery import cascade_forget

    t = {
        n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))
        for n in ("customer", "orders", "lineitem", "nation")
    }
    subjects = t["customer"].select("c_custkey").filter(
        F.col("c_custkey") % 37 == 0
    )
    _, census = cascade_forget(
        t,
        root="customer",
        root_key="c_custkey",
        subjects=subjects,
        fk_edges=[
            ("orders", "o_custkey", "customer", "c_custkey"),
            ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ],
    )
    return census


def q_column_top_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column heavy hitters over the lake index."""
    from datalake_indexes_spark.operators.cocoa import column_top_values

    return column_top_values(testdata_index(spark, sf_dir, with_super_keys=False), k=3)


def q_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot distribution drift with a PLANTED shift: snapshot
    B re-ingests supplier with s_suppkey + 50 (nation untouched), so the
    report must show mass movement exactly where planted and ~0
    elsewhere."""
    from datalake_indexes_spark.operators.cocoa import profile_drift

    tbls = load_tables(spark, sf_dir, ["nation", "supplier"])
    spec = {
        "nation": TESTDATA_LAKE_SPEC["nation"],
        "supplier": TESTDATA_LAKE_SPEC["supplier"],
    }
    idx_a = build_index(spark, tbls, spec, with_super_keys=False)
    shifted = tbls["supplier"].withColumn(
        "s_suppkey", F.col("s_suppkey") + F.lit(50)
    )
    idx_b = build_index(
        spark, {"nation": tbls["nation"], "supplier": shifted}, spec,
        with_super_keys=False,
    )
    return profile_drift(idx_a, idx_b, nbins=10)


def q_column_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column MinHash signatures (the sub-quadratic discovery
    sketch), signature array joined to one string for grading."""
    from datalake_indexes_spark.operators.discovery import column_minhash_signatures

    idx = testdata_index(spark, sf_dir, with_super_keys=False)
    out = column_minhash_signatures(idx, k=16)
    return out.select(
        "table_id", "col_id", F.array_join("sig", ",").alias("sig"), "n_distinct"
    )


def q_column_histograms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width value histograms for every numeric lake column."""
    from datalake_indexes_spark.operators.cocoa import column_histograms

    return column_histograms(testdata_index(spark, sf_dir, with_super_keys=False))


def q_union_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank lake tables by unionability with the customer table."""
    from datalake_indexes_spark.operators.discovery import union_search
    from datalake_indexes_spark.sources.catalog import TESTDATA_LAKE_SPEC

    qid = TESTDATA_LAKE_SPEC["customer"].table_id
    return union_search(
        testdata_index(spark, sf_dir, with_super_keys=False), qid, k=10
    )


def q_union_search_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall gauge for the union-search spread cap: capped top-k table
    set vs the exact (uncapped) top-k."""
    from datalake_indexes_spark.operators.discovery import (
        union_search_recall_report,
    )
    from datalake_indexes_spark.sources.catalog import TESTDATA_LAKE_SPEC

    qid = TESTDATA_LAKE_SPEC["customer"].table_id
    return union_search_recall_report(
        testdata_index(spark, sf_dir, with_super_keys=False), qid, k=10
    )


def q_column_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier profile for every numeric lake column."""
    from datalake_indexes_spark.operators.cocoa import column_outliers

    return column_outliers(testdata_index(spark, sf_dir, with_super_keys=False))


def q_discovery_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tables clustered into domains by shared column vocabularies
    (bounded min-label propagation over the Jaccard similarity graph)."""
    from datalake_indexes_spark.operators.discovery import domain_clusters

    return domain_clusters(testdata_index(spark, sf_dir, with_super_keys=False))


def q_union_search_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based union search (column MinHash + LSH banding) — same
    contract as `union_search`, estimated from signatures."""
    from datalake_indexes_spark.operators.discovery import union_search_approx
    from datalake_indexes_spark.sources.catalog import TESTDATA_LAKE_SPEC

    qid = TESTDATA_LAKE_SPEC["customer"].table_id
    return union_search_approx(
        testdata_index(spark, sf_dir, with_super_keys=False),
        qid, k=10, sig_k=32, bands=8,
    )


def q_winsorize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization summary over lineitem numerics: exact p1/p99 clamp
    bounds, clip counts, and the post-clamp mean per column."""
    from datalake_indexes_spark.operators.ml import winsorize

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    cols = ["l_quantity", "l_extendedprice"]
    pieces = []
    for c in cols:
        bounds = li.agg(
            F.percentile(F.col(c), F.lit(0.01)).alias("lo"),
            F.percentile(F.col(c), F.lit(0.99)).alias("hi"),
        )
        clamped = winsorize(li.select(c), [c], p_low=0.01, p_high=0.99)
        stats = li.select(c).crossJoin(F.broadcast(bounds)).agg(
            F.round(F.first("lo"), 6).alias("lo"),
            F.round(F.first("hi"), 6).alias("hi"),
            F.count(F.when(F.col(c) < F.col("lo"), 1)).alias("n_clipped_low"),
            F.count(F.when(F.col(c) > F.col("hi"), 1)).alias("n_clipped_high"),
        )
        mean_after = clamped.agg(F.round(F.avg(c), 6).alias("mean_after"))
        pieces.append(
            stats.crossJoin(mean_after).select(
                F.lit(c).alias("column_name"),
                "lo",
                "hi",
                "n_clipped_low",
                "n_clipped_high",
                "mean_after",
            )
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def q_web_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota capping over the planted-URL corpus: at most 25
    documents survive per registered domain, selected by a deterministic
    md5 shuffle — the over-represented-site control in crawl curation."""
    from datalake_indexes_spark.operators.web import domain_quota_cap

    return domain_quota_cap(_with_planted_urls(_docs(spark, sf_dir)), cap=25)


def q_column_quantile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) histograms for every numeric lake column —
    ntile over a (value, row_id) total order, deterministic across
    engines."""
    from datalake_indexes_spark.operators.cocoa import equi_depth_histograms

    return equi_depth_histograms(testdata_index(spark, sf_dir), nbuckets=8)


def q_column_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square association between the documents corpus's two
    categorical columns (lang × source): is the language mix independent
    of the source?  The categorical-categorical counterpart of COCOA's
    correlation ranking."""
    from datalake_indexes_spark.operators.discovery import (
        categorical_association,
    )

    return categorical_association(_docs(spark, sf_dir), "lang", "source")


def q_export_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-balanced shard assignment over the corpus (weight =
    n_chars): contiguous doc-id ranges cut at equal cumulative mass —
    the token-balanced alternative to md5 count-balanced sharding."""
    from datalake_indexes_spark.sources.export import assign_balanced_shards

    return assign_balanced_shards(
        _docs(spark, sf_dir), n_shards=8, weight_col="n_chars"
    )


def q_column_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered skewness/kurtosis profile for every numeric lake
    column (two-pass power sums, population formulas)."""
    from datalake_indexes_spark.operators.cocoa import column_moments

    return column_moments(testdata_index(spark, sf_dir, with_super_keys=False))


def q_column_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit for every numeric lake column (first
    significant digit read from the tokenized string, chi2 vs log10(1+1/d))."""
    from datalake_indexes_spark.operators.cocoa import benford_audit

    return benford_audit(testdata_index(spark, sf_dir, with_super_keys=False))


def q_profile_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS drift between returned (l_returnflag = 'R') and
    kept lineitem rows over the four numeric measure columns."""
    from datalake_indexes_spark.operators.cocoa import ks_drift

    _ensure_session_confs(spark)
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    return ks_drift(
        li.filter(F.col("l_returnflag") == "R"),
        li.filter(F.col("l_returnflag") != "R"),
        list(KS_DRIFT_COLUMNS),
    )


def q_column_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between the documents corpus's lang and source
    columns -- how much does the source tell you about the language?"""
    from datalake_indexes_spark.operators.discovery import categorical_mutual_info

    return categorical_mutual_info(_docs(spark, sf_dir), "lang", "source")


def q_profile_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index over the SAME planted supplier shift as
    profile_drift -- the log-ratio drift metric next to the TV distance."""
    from datalake_indexes_spark.operators.cocoa import profile_psi

    tbls = load_tables(spark, sf_dir, ["nation", "supplier"])
    spec = {
        "nation": TESTDATA_LAKE_SPEC["nation"],
        "supplier": TESTDATA_LAKE_SPEC["supplier"],
    }
    idx_a = build_index(spark, tbls, spec, with_super_keys=False)
    shifted = tbls["supplier"].withColumn(
        "s_suppkey", F.col("s_suppkey") + F.lit(50)
    )
    idx_b = build_index(
        spark, {"nation": tbls["nation"], "supplier": shifted}, spec,
        with_super_keys=False,
    )
    return profile_psi(idx_a, idx_b, nbins=10)


def q_column_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p25/p50/p75/p90/p99 per numeric lake column (linear
    interpolation at p*(n-1) — quantile_cont-portable)."""
    from datalake_indexes_spark.operators.cocoa import column_percentiles

    return column_percentiles(testdata_index(spark, sf_dir, with_super_keys=False))


