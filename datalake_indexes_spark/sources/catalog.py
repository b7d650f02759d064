"""Lake catalog — which tables/columns form the indexed data lake.

The reference ingests a folder of heterogeneous files and assigns integer
table ids in ingestion order (``maco/data_handler.py:501-516,362-420``).  Our
test lake is the fixed set of ``/root/testdata`` tables; the spec below pins
the table-id assignment, the indexed columns (positional ``col_id``), and a
total ordering that defines deterministic ``row_id`` values, so the engine
and the DuckDB oracle agree cell-for-cell.

Double/timestamp columns are excluded from the *tokenized cell index* by
default: joining lake tables on stringified floating-point values is
meaningless, and their string rendering is engine-dependent.  They remain
fully available to COCOA/enrichment, which read the raw tables.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class LakeTableSpec:
    name: str
    table_id: int
    cols: tuple[str, ...]          # indexed columns; position = col_id
    order_by: tuple[str, ...]      # unique total order defining row_id
    # column that IS the 0-based dense row ordinal (verified property of
    # the source, recorded as catalog metadata): when set, row_id is a
    # projection instead of a distributed row-numbering job
    row_id_expr: str | None = None


def _t(name: str, table_id: int, cols: list[str], order_by: list[str],
       row_id_expr: str | None = None) -> LakeTableSpec:
    return LakeTableSpec(name, table_id, tuple(cols), tuple(order_by), row_id_expr)


# Table-id assignment is the canonical TESTDATA.md order.
TESTDATA_LAKE_SPEC: dict[str, LakeTableSpec] = {
    s.name: s
    # row_id_expr set where the key is verified dense 0..n-1 at every SF
    # (all but lineitem, whose order key is composite)
    for s in [
        _t("region", 0, ["r_regionkey", "r_name"], ["r_regionkey"], "r_regionkey"),
        _t("nation", 1, ["n_nationkey", "n_name", "n_regionkey"], ["n_nationkey"], "n_nationkey"),
        _t("customer", 2, ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"], ["c_custkey"], "c_custkey"),
        _t("supplier", 3, ["s_suppkey", "s_name", "s_nationkey"], ["s_suppkey"], "s_suppkey"),
        _t("part", 4, ["p_partkey", "p_name", "p_brand", "p_type", "p_size"], ["p_partkey"], "p_partkey"),
        _t("orders", 5, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"], ["o_orderkey"], "o_orderkey"),
        _t(
            "lineitem",
            6,
            ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_returnflag", "l_linestatus"],
            ["l_orderkey", "l_linenumber"],
        ),
        _t("events", 7, ["event_id", "user_id", "event_type"], ["event_id"], "event_id"),
        _t("documents", 8, ["doc_id", "lang", "source", "n_chars"], ["doc_id"], "doc_id"),
        _t("embeddings", 9, ["vec_id", "label"], ["vec_id"], "vec_id"),
    ]
}

ALL_TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


# ---------------------------------------------------------------------------
# Planted-duplicate lake (J5/J6 hard-signal fixture)
# ---------------------------------------------------------------------------
# The TPC-H-like testdata has no duplicate rows at any SF, so J5/J6 driver
# checks over the plain lake verify 0 == 0.  This spec plants duplicates
# the way a real lake acquires them — the same source registered twice
# (nation/region under two table ids) and one table whose every row was
# ingested twice (nation × copy∈{0,1}) — giving the duplicate-detection
# oracle keys non-empty output to grade.  ``supplier`` stays single-copy as
# the negative control sharing nation's column count.
#
# ``name`` doubles as the oracle's FROM source, so the doubled table's name
# is a subquery over the pre-registered ``nation`` view; the Spark side
# constructs the same doubled DataFrame (queries.py).

_NATION_COLS = ["n_nationkey", "n_name", "n_regionkey"]

PLANTED_DUP_SPEC: dict[str, LakeTableSpec] = {
    "region": TESTDATA_LAKE_SPEC["region"],
    "nation": TESTDATA_LAKE_SPEC["nation"],
    "supplier": TESTDATA_LAKE_SPEC["supplier"],
    "nation_dup": _t("nation", 100, _NATION_COLS, ["n_nationkey"], "n_nationkey"),
    "region_dup": _t("region", 102, ["r_regionkey", "r_name"], ["r_regionkey"], "r_regionkey"),
    "nation_doubled": _t(
        "(SELECT n.*, c.copy FROM nation AS n CROSS JOIN (VALUES (0), (1)) AS c(copy))",
        101,
        _NATION_COLS,
        ["n_nationkey", "copy"],
    ),
}
