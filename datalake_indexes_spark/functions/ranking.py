"""Distributed global ranking — the two-level bucket prefix sum as a
reusable primitive.

A `row_number() OVER (ORDER BY ...)` with no partition funnels the whole
frame through ONE task; budget_select and pareto_report already avoid it
by bucketing on a value-monotone coarse key, ranking inside buckets, and
broadcasting the bucket offset table.  :func:`global_rank` packages that
pattern: dense global rank over (value, tie) total order with NO
single-partition window, parallelism = bucket count × within-bucket
windows.

:func:`ntile_from_rank` reproduces the engines' exact NTILE allocation
(first n mod t tiles one row bigger) as a closed form over (rank, n, t),
so a distributed rank + this formula == `ntile() OVER (ORDER BY ...)`
without the global window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    ascending: bool = True,
    out_col: str = "rank",
) -> DataFrame:
    """Add a dense 1-based global ``row_number`` over the total order
    (``value_col`` asc/desc, ``tie_col`` asc) without a global window.

    Mechanics: values shift by the global min (one broadcast scalar) so
    ``floor(log2(v - min + 1))`` is a value-MONOTONE coarse bucket; each
    bucket takes a local ordered window; the bucket-count offset table
    (≤ ~2100 rows — the log2 range of doubles) cumulates on the driver-
    tiny side and broadcasts back.  Bucket-function precision cannot
    affect the result: equal values always share a bucket, and any
    boundary wobble only moves a value between ADJACENT buckets whose
    offsets still compose to the same global order.
    NULL/NaN values carry no rank: those rows come back with ``out_col``
    NULL and ranks 1..n run over the ranked rows only — handled via
    SALTED negative sentinel buckets excluded from the offset table (NOT
    a filter+union, which would duplicate the upstream plan once per
    chained rank and re-execute it per branch; and not one shared NULL
    bucket, which would funnel a heavily-NULL column's rows through a
    single discarded window partition).
    """
    v = F.col(value_col).cast("double")
    valid = v.isNotNull() & ~F.isnan(v)
    order_v = v if ascending else -v
    bounds = df.filter(valid).agg(F.min(order_v).alias("__vmin"))
    b = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("__ov", F.when(valid, order_v))
        .withColumn(
            "__bkt",
            F.when(
                valid,
                F.floor(
                    F.log2(F.col("__ov") - F.col("__vmin") + F.lit(1.0))
                ).cast("long"),
            ).otherwise(
                # valid buckets are >= 0 (min-shifted); invalid rows salt
                # across 64 negative buckets their discarded window rides
                -(F.pmod(F.xxhash64(F.col(tie_col)), F.lit(64)) + F.lit(1))
            ),
        )
    )
    w_local = (
        Window.partitionBy("__bkt")
        .orderBy(F.asc("__ov"), F.asc(tie_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = b.withColumn("__rn", F.count(F.lit(1)).over(w_local))
    offsets = (
        b.filter(F.col("__bkt") >= 0)
        .groupBy("__bkt")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__cnt").over(
                    Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
    )
    return (
        local.join(F.broadcast(offsets.select("__bkt", "__off")), "__bkt", "left")
        .withColumn(
            out_col,
            F.when(
                F.col("__bkt") >= 0,
                (F.col("__off") + F.col("__rn")).cast("long"),
            ),
        )
        .drop("__bkt", "__ov", "__vmin", "__rn", "__off")
    )


def ntile_from_rank(rank: Column, n: Column, tiles: int) -> Column:
    """The engines' exact NTILE allocation as a closed form: with
    q = n div tiles and big = n mod tiles, the first ``big`` tiles hold
    q+1 rows and the rest q — identical to Spark's and DuckDB's
    ``ntile(tiles) OVER (ORDER BY ...)`` on the same total order."""
    t = F.lit(int(tiles))
    q = (n / t).cast("long")
    big = n % t
    cut = big * (q + 1)
    return (
        F.when(rank <= cut, ((rank - 1) / (q + 1)).cast("long") + 1)
        .otherwise(big + ((rank - cut - 1) / F.nullif(q, F.lit(0))).cast("long") + 1)
        .cast("int")
    )
