"""Right-to-be-forgotten cascade (operators/discovery.py cascade_forget):
row-driven FK cascade semantics pinned on a hand-built lake — diamond
(multi-parent) children OR their edges without double counting, NULL
foreign keys survive, dangling subject keys delete nothing downstream,
unreachable tables ride along untouched, and the cleaned views leave no
orphaned child rows behind."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_indexes_spark.operators.discovery import cascade_forget


@pytest.fixture(scope="module")
def lake(spark):
    users = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "uid long, name string"
    )
    # order 40 has a NULL owner; 30 belongs to surviving user 3
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (20, 2), (30, 3), (40, None)],
        "oid long, o_uid long",
    )
    # items reference BOTH orders and products (diamond when a product
    # recall joins a user forget); here product edge is unreachable
    items = spark.createDataFrame(
        [(100, 10, 7), (101, 11, 8), (102, 20, 7), (103, 30, 9), (104, 40, 9), (105, None, 7)],
        "iid long, i_oid long, i_pid long",
    )
    products = spark.createDataFrame([(7,), (8,), (9,)], "pid long")
    return {"users": users, "orders": orders, "items": items, "products": products}


EDGES = [
    ("orders", "o_uid", "users", "uid"),
    ("items", "i_oid", "orders", "oid"),
    ("items", "i_pid", "products", "pid"),  # unreachable from users
]


def test_cascade_counts_and_cleanup(spark, lake):
    subjects = spark.createDataFrame([(1,), (2,), (99,)], "uid long")  # 99 dangling
    cleaned, census = cascade_forget(lake, "users", "uid", subjects, EDGES)
    rows = {r.table_name: r for r in census.collect()}

    assert rows["users"].rows_deleted == 2  # 99 deletes nothing
    assert rows["orders"].rows_deleted == 3  # 10, 11, 20; NULL-owner 40 survives
    assert rows["items"].rows_deleted == 3  # 100, 101, 102
    assert rows["products"].rows_deleted == 0  # unreachable
    for r in rows.values():
        assert r.rows_after == r.rows_before - r.rows_deleted

    assert sorted(r.uid for r in cleaned["users"].collect()) == [3, 4]
    assert sorted(r.oid for r in cleaned["orders"].collect()) == [30, 40]
    assert sorted(r.iid for r in cleaned["items"].collect()) == [103, 104, 105]

    # referential closure: no cleaned item points at a deleted order
    orphans = (
        cleaned["items"]
        .filter(F.col("i_oid").isNotNull())
        .join(cleaned["orders"], F.col("i_oid") == F.col("oid"), "left_anti")
    )
    assert orphans.count() == 0

    # schemas pass through unchanged (no marker columns leak)
    assert cleaned["orders"].columns == lake["orders"].columns
    assert census.columns == ["table_name", "rows_before", "rows_deleted", "rows_after"]


def test_diamond_child_no_double_count(spark, lake):
    """items reachable through TWO resolved parents (orders via users,
    products via a second root-side edge) — OR semantics, each row
    counted once even when both edges hit it."""
    tables = dict(lake)
    # make products reachable: users -> products via a fake ownership edge
    tables["products"] = spark.createDataFrame(
        [(7, 1), (8, 3), (9, 3)], "pid long, p_uid long"
    )
    edges = EDGES + [("products", "p_uid", "users", "uid")]
    subjects = spark.createDataFrame([(1,)], "uid long")
    cleaned, census = cascade_forget(tables, "users", "uid", subjects, edges)
    rows = {r.table_name: r for r in census.collect()}

    # user 1: orders 10,11 -> items 100,101; product 7 -> items 100,102,105.
    # item 100 hit by BOTH edges -> counted once; total = {100,101,102,105}
    assert rows["products"].rows_deleted == 1
    assert rows["items"].rows_deleted == 4
    assert sorted(r.iid for r in cleaned["items"].collect()) == [103, 104]


def test_cycle_raises(spark, lake):
    edges = EDGES + [("users", "uid", "items", "iid")]  # items -> users closes a cycle
    subjects = spark.createDataFrame([(1,)], "uid long")
    with pytest.raises(ValueError, match="cycle"):
        cascade_forget(lake, "users", "uid", subjects, edges)


def test_unknown_table_raises(spark, lake):
    subjects = spark.createDataFrame([(1,)], "uid long")
    with pytest.raises(ValueError, match="unknown"):
        cascade_forget(lake, "users", "uid", subjects, [("ghosts", "g", "users", "uid")])


def test_empty_subjects_is_identity(spark, lake):
    subjects = spark.createDataFrame([], "uid long")
    cleaned, census = cascade_forget(lake, "users", "uid", subjects, EDGES)
    assert census.agg(F.sum("rows_deleted")).collect()[0][0] == 0
    assert cleaned["items"].count() == lake["items"].count()
