"""COCOA order-index materialization (SURVEY.md W2; parity with
``maco/util.py:34-138`` ``create_cocoa_index``).

The reference threads a linked list through each column's rows in rank
order so a later query can read ranks in O(n) without sorting
(``min_index`` = row of the smallest value, ``order_list[r]`` = row holding
the next-larger value, −1 at the maximum, ``binary_list[r]`` = '1' iff the
next value in rank order differs).  Query-time correlation in this engine
uses distributed sort-ranks instead (operators/cocoa.py — pointer chasing
does not distribute), but the *structure* is still part of the index
surface, so it is materialized here: one window pass per column partition,
arrays assembled with ``collect_list`` — rows of one column land in one
partition, columns across the lake process in parallel.

Semantics notes (matching the reference exactly):
- rank order = value ascending, ties and NaNs by row id; NaN/null sort last
  ('' and 'nan' parse to NaN in numeric columns, rank ``na_option='bottom'``),
- two NaNs count as equal (binary '0'),
- the maximum row gets order −1 / binary '0'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datalake_indexes_spark.operators.cocoa import _num_value, is_numeric_flags


def build_order_index(cells: DataFrame, col_flags: DataFrame | None = None) -> DataFrame:
    """(table_id, col_id, is_numeric, min_index, order_list, binary_list)
    for every indexed column.

    ``order_list`` is an ``array<long>`` indexed by row id; ``binary_list``
    a '0'/'1' string, as in the reference's cocoa index table
    (data_handler.py:49-53).
    """
    flags = col_flags if col_flags is not None else is_numeric_flags(cells)
    vals = cells.join(flags, ["table_id", "col_id"], "inner").select(
        "table_id",
        "col_id",
        "row_id",
        "is_numeric",
        F.when(F.col("is_numeric"), _num_value(F.col("tokenized"))).alias("__nv"),
        # reference quirk (util.py:96-99,108-110): in categorical columns a
        # null-ish cell is stringified to the literal 'nan' BEFORE ranking,
        # so it sorts between 'n...' neighbors rather than first
        F.when(
            ~F.col("is_numeric"),
            F.when(F.col("tokenized") == "", F.lit("nan")).otherwise(F.col("tokenized")),
        ).alias("__sv"),
    )
    w = Window.partitionBy("table_id", "col_id").orderBy(
        F.col("__nv").asc_nulls_last(), F.col("__sv").asc_nulls_last(), F.col("row_id")
    )
    nv_next = F.lead("__nv").over(w)
    sv_next = F.lead("__sv").over(w)
    next_row = F.lead("row_id").over(w)
    equal_next = F.when(
        F.col("is_numeric"), F.col("__nv").eqNullSafe(nv_next)
    ).otherwise(F.col("__sv") == sv_next)
    ordered = vals.select(
        "table_id",
        "col_id",
        "row_id",
        "is_numeric",
        F.coalesce(next_row, F.lit(-1)).alias("__next"),
        F.when(next_row.isNull() | equal_next, F.lit("0")).otherwise(F.lit("1")).alias("__bin"),
        F.first("row_id").over(w).alias("__min_index"),
    )
    return (
        ordered.groupBy("table_id", "col_id")
        .agg(
            F.first("is_numeric").alias("is_numeric"),
            F.min("__min_index").alias("min_index"),
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("row_id", "__next", "__bin"))
                ),
                lambda s: s["__next"],
            ).alias("order_list"),
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("row_id", "__bin"))
                    ),
                    lambda s: s["__bin"],
                ),
            ).alias("binary_list"),
        )
    )
