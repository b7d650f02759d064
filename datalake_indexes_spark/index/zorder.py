"""Z-order (Morton) clustered layout — multi-dimensional scan pruning for
the lake's fact tables.

A single-column sort gives parquet min/max row-group pruning on that one
column; queries filtering on a SECOND column read everything.  Z-ordering
interleaves the bits of several columns' rank-buckets into one sort key,
so files stay locally rectangular in the value space: a 2-D box predicate
(user X, hour range Y) touches only the files whose min/max rectangle
intersects the box — the layout trick Delta OPTIMIZE ZORDER BY and
Iceberg's sort orders apply, built here from native expressions.

Everything is one statistics aggregate + one range-partitioned write:

1. min/max per z-column (one tiny agg — at a real lake these come from
   table statistics instead),
2. per-row bucket = linear position in [0, 2^bits) scaled by min/max,
3. Morton key = bitwise interleave of the buckets (a fixed chain of
   shift/mask expressions inside codegen — no UDF),
4. ``repartitionByRange(z)`` + sort-within-partitions on z, written with
   bounded file size so min/max footers stay selective.

The pruning payoff is measurable from parquet footers alone and is pinned
by ``tests/test_zorder.py``: for box queries, the fraction of files whose
footer range intersects the box is several times lower than a
linear-sorted layout of the same data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(buckets: list[Column], bits: int) -> Column:
    """Morton key: bit i of bucket j lands at position i*len(buckets)+j.
    Pure shift/mask expression chain — stays in whole-stage codegen."""
    n = len(buckets)
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
    out_col: str = "__z",
    stats: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Add the Morton key over ``cols`` (numeric).  ``stats`` supplies
    per-column (min, max) — pass them from table statistics at scale;
    when omitted, one aggregate pass computes them."""
    if len(cols) < 2:
        raise ValueError("z-ordering needs at least 2 columns")
    if stats is None:
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
        row = df.agg(*aggs).first()
        stats = {c: (row[f"__mn_{c}"], row[f"__mx_{c}"]) for c in cols}
    buckets = []
    top = (1 << bits) - 1
    for c in cols:
        mn, mx = stats[c]
        span = float(mx - mn) if mx is not None and mx > mn else 1.0
        buckets.append(
            F.least(
                F.lit(top),
                F.floor(
                    (F.col(c).cast("double") - float(mn)) / span * (top + 1)
                ).cast("long"),
            )
        )
    return df.withColumn(out_col, interleave_bits(buckets, bits))


def save_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    n_files: int = 16,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` Z-clustered on ``cols``: range-partitioned and sorted
    by the Morton key, with bounded file sizes so every footer covers a
    small z-interval (= a small rectangle in value space)."""
    keyed = with_zorder_key(df, cols, bits)
    writer = (
        keyed.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
