"""Cell-index / lake-catalog / enrichment query pipelines.

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

from datalake_indexes_spark.plans.queries._base import HEADER_SEARCH_QUERY, _numbered_probe, load_tables, search_columns_by_header, testdata_index

def q_index_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/S7/P1-P4/P7 — the tokenized cell index itself."""
    return testdata_index(spark, sf_dir, with_super_keys=False).cells


def q_table_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — table metadata (max row/col ids)."""
    return testdata_index(spark, sf_dir, with_super_keys=False).table_info


def q_is_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — numeric-column detection (index-time precompute)."""
    return testdata_index(spark, sf_dir, with_super_keys=False).col_flags


def q_column_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column lake profiling stats (counts, distinct, numeric
    min/max/median) off the cell index + P6 flags."""
    from datalake_indexes_spark.operators.cocoa import column_profiles

    return column_profiles(testdata_index(spark, sf_dir, with_super_keys=False))


def q_cocoa_order_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — materialized COCOA order index over the whole lake."""
    from datalake_indexes_spark.index.cocoa_order import build_order_index

    idx = testdata_index(spark, sf_dir, with_super_keys=False)
    out = build_order_index(idx.cells, col_flags=idx.col_flags)
    return out.select(
        F.concat_ws("_", "table_id", "col_id").alias("table_col_id"),
        "is_numeric",
        "min_index",
        F.array_join("order_list", "_").alias("order_list"),
        "binary_list",
    )


def q_get_table_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 — reconstruct the nation table from the cell index with its
    stored headers reapplied as column names."""
    idx = testdata_index(spark, sf_dir, with_super_keys=False)
    return idx.get_table(TESTDATA_LAKE_SPEC["nation"].table_id)


def q_add_external_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — feature materialization: customer LEFT JOIN first-per-key orders
    row on the tokenized key (demo:516-587: dropDuplicates then left join)."""
    customer = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    from pyspark.sql import Window

    ext = (
        orders.withColumn("join_tok", tokenize_col(F.col("o_custkey")))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("join_tok").orderBy("o_orderkey")),
        )
        .filter(F.col("rn") == 1)
        .select("join_tok", "o_totalprice", "o_orderstatus")
    )
    return (
        customer.withColumn("c_tok", tokenize_col(F.col("c_custkey")))
        .join(F.broadcast(ext), F.col("c_tok") == F.col("join_tok"), "left")
        .select("c_custkey", "c_acctbal", "o_totalprice", "o_orderstatus")
    )


def q_enrichment_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end enrichment product (pipelines/enrichment.py): MATE top-k
    → duplicate-table removal → COCOA feature ranking → J4 first-match
    materialization, emitted in long form (mate_row_id, table_col_id,
    value) so the schema is static while the winner columns stay dynamic."""
    from datalake_indexes_spark.pipelines.enrichment import enrich_dataset

    idx = testdata_index(spark, sf_dir)
    # mate_row_id preset from the catalog-vouched dense key — numbering is
    # a projection, not an eager min/max + window (see _numbered_probe)
    customer = _numbered_probe(spark, sf_dir, "customer", "mate_row_id")
    res = enrich_dataset(
        idx,
        customer,
        ["c_custkey"],
        "c_acctbal",
        k=5,
        k_c=500,
        k_features=10,
        input_order_by=["c_custkey"],
    )
    winners = [c[len("ext_"):] for c in res.enriched.columns if c.startswith("ext_")]
    stack_args = ", ".join(f"'{w}', `ext_{w}`" for w in winners)
    return res.enriched.selectExpr(
        "mate_row_id",
        f"stack({len(winners)}, {stack_args}) as (table_col_id, value)",
    ).filter(F.col("value").isNotNull())


def q_header_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = testdata_index(spark, sf_dir, with_super_keys=False)
    return search_columns_by_header(idx, HEADER_SEARCH_QUERY, k=10)


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew pre-flight for keying on l_partkey: per-key count
    stats + the hottest key — the straggler check before a 100 TB
    shuffle."""
    from datalake_indexes_spark.operators.discovery import shuffle_skew_report

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    return shuffle_skew_report(li, ["l_partkey"])


def q_fk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key-consistent 10% sample: orders sampled by deterministic
    key bucket, lineitem semi-joined — every sampled order keeps ALL its
    lineitems, so join semantics survive on the sample."""
    from datalake_indexes_spark.operators.sampling import fk_consistent_sample

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    out = fk_consistent_sample(
        orders, {"lineitem": (lineitem, "l_orderkey")}, "o_orderkey", 0.1
    )
    return out["lineitem"].select("l_orderkey", "l_partkey", "l_linenumber")


def q_lake_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative DQ expectations over the lake: two row rules, an FK
    check, and a coverage check, as one violations table (non-vacuous:
    the acctbal / total-cap / has-lineitems rules all fire on the
    testdata)."""
    from datalake_indexes_spark.operators.validate import (
        validate_existence,
        validate_reference,
        validate_rows,
    )

    t = load_tables(spark, sf_dir, ["orders", "customer", "lineitem"])
    rows = validate_rows(
        t["customer"],
        {"customer_acctbal_nonneg": F.col("c_acctbal") >= 0},
        id_col="c_custkey",
    ).unionByName(
        validate_rows(
            t["orders"],
            {"order_total_under_cap": F.col("o_totalprice") <= 300_000.0},
            id_col="o_orderkey",
        )
    )
    fk = validate_reference(
        t["orders"], t["customer"], "o_custkey", "c_custkey",
        rule="order_customer_exists", id_col="o_orderkey",
    )
    cov = validate_existence(
        t["orders"], t["lineitem"], "o_orderkey", "l_orderkey",
        rule="order_has_lineitems",
    )
    return rows.unionByName(fk).unionByName(cov)


def q_inclusion_deps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lake-wide inclusion-dependency discovery (FK-candidate column
    pairs by capped distinct-token containment)."""
    from datalake_indexes_spark.operators.discovery import inclusion_dependencies

    return inclusion_dependencies(
        testdata_index(spark, sf_dir, with_super_keys=False)
    )


def q_join_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acyclic join paths lineitem -> region over the discovered
    inclusion-dependency graph (both the orders->customer and the
    supplier route surface at 4 hops)."""
    from datalake_indexes_spark.operators.discovery import (
        inclusion_dependencies,
        join_paths,
    )

    deps = inclusion_dependencies(testdata_index(spark, sf_dir, with_super_keys=False))
    return join_paths(deps, src_table=6, dst_table=0, max_hops=4)


def q_join_cardinalities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What-if join sizing: exact |A ⋈ B| per cross-table column pair
    over the informative-token universe."""
    from datalake_indexes_spark.operators.discovery import join_cardinalities

    return join_cardinalities(testdata_index(spark, sf_dir, with_super_keys=False))


def q_functional_deps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact single-column FD profiling across every lake table (key
    detection / normalization hints) — TPC-H keys make it non-vacuous."""
    from datalake_indexes_spark.operators.discovery import functional_dependencies

    return functional_dependencies(
        testdata_index(spark, sf_dir, with_super_keys=False)
    )


def q_semantic_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-type inference over the orders table's stringified
    values (integer / decimal / date / text shapes)."""
    from datalake_indexes_spark.operators.discovery import semantic_types

    return semantic_types(load_tables(spark, sf_dir, ["orders"])["orders"])


def q_tables_with_all_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive discovery probe: lake tables containing EVERY query
    token ('furniture' AND 'building' — both mktsegment values, plus any
    other table that happens to carry both)."""
    from datalake_indexes_spark.operators.discovery import tables_with_all_tokens

    idx = testdata_index(spark, sf_dir)
    return tables_with_all_tokens(idx, ["FURNITURE", "BUILDING"])


