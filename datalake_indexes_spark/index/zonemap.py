"""Zone maps — planning-time file pruning for lake datasets.

Parquet footers already carry row-group min/max, but at 100 TB the
footer protocol is the wrong layer: a filter over a million-file dataset
still LISTS every file and OPENS every footer before a single row-group
is skipped.  A zone map (Moerkotte's small materialized aggregates, the
structure behind ORC/Iceberg/Delta file-level stats) hoists those
min/max ranges into ONE tiny table read once at planning time, so the
scan starts from the surviving file list — listing cost and footer reads
scale with the *result's* files, not the dataset's.

Composes with :mod:`.zorder`: Z-order clustering makes each file's
min/max box tight in several dimensions, which is precisely what makes a
zone map selective; the zone map then delivers the pruning without
trusting the reader to reach the footers cheaply.

The zone-map build is one distributed aggregate keyed by
``input_file_name()`` (one output row per FILE — bounded by file count,
uniform by construction).  Pruning reads only the zone-map parquet and
collects the surviving file names — the same driver-sized metadata step
Spark's own listing performs, but over the pruned set.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_zonemap(
    spark: SparkSession, data_path: str, cols: list[str], zonemap_path: str
) -> None:
    """Materialize per-file (min, max, n_rows) stats for ``cols`` over
    every parquet file under ``data_path``."""
    df = spark.read.parquet(data_path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(zonemap_path)
    )


def pruned_files(
    spark: SparkSession, zonemap_path: str, predicates: dict[str, tuple]
) -> list[str]:
    """File names whose zones overlap every ``col: (lo, hi)`` range
    (either bound may be None for open intervals).  A file with NULL
    stats for a column (all-null zone) never matches a bounded range on
    that column — matching the filter's null semantics."""
    zm = spark.read.parquet(zonemap_path)
    cond = F.lit(True)
    for c, (lo, hi) in predicates.items():
        if lo is not None:
            cond = cond & (F.col(f"max_{c}") >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(f"min_{c}") <= F.lit(hi))
    return [r.file for r in zm.filter(cond).select("file").collect()]


def scan_pruned(
    spark: SparkSession,
    data_path: str,
    zonemap_path: str,
    predicates: dict[str, tuple],
) -> DataFrame:
    """Read ``data_path`` with the zone map consulted FIRST: only files
    whose zones overlap the predicate ranges are listed/opened, then the
    exact row-level filter is applied on top (zones prune, they never
    decide).  Returns an empty frame with the dataset schema when no
    zone survives."""
    files = pruned_files(spark, zonemap_path, predicates)
    cond = F.lit(True)
    for c, (lo, hi) in predicates.items():
        if lo is not None:
            cond = cond & (F.col(c) >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(c) <= F.lit(hi))
    if not files:
        return spark.read.parquet(data_path).filter(F.lit(False))
    return spark.read.parquet(*files).filter(cond)


def refresh_incremental(
    spark: SparkSession, data_path: str, zonemap_path: str, cols: list[str]
) -> int:
    """Extend an existing zone map with stats for files it has not seen
    (append-only datasets: new files land, old zones never change).
    Scans ONLY the new files; returns how many were added."""
    zm = spark.read.parquet(zonemap_path)
    df = spark.read.parquet(data_path).withColumn("__file", F.input_file_name())
    # anti-join (broadcast: one row per KNOWN file), not a driver IN-list —
    # the known-file set is exactly what grows unbounded on append-only lakes
    new = df.join(
        F.broadcast(zm.select(F.col("file").alias("__file"))), "__file", "left_anti"
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    added = new.groupBy(F.col("__file").alias("file")).agg(*aggs)
    n_added = added.count()
    if n_added:
        # stage-and-swap: never append into the dir being read
        tmp = zonemap_path.rstrip("/") + ".__refresh"
        zm.unionByName(added).coalesce(1).write.mode("overwrite").parquet(tmp)
        import shutil

        backup = zonemap_path.rstrip("/") + ".__old"
        if os.path.exists(backup):
            shutil.rmtree(backup)
        os.rename(zonemap_path, backup)
        os.rename(tmp, zonemap_path)
        shutil.rmtree(backup)
    return n_added
