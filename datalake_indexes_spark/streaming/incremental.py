"""Structured Streaming — incremental index maintenance + event analytics
(extension surface; the reference is strictly batch, SURVEY.md §2.9: its
``update_index()`` re-runs the folder walk, data_handler.py:641-651).

Two streaming shapes:

- :func:`incremental_index_stream` — the reference's index refresh as a
  stream: new parquet files landing in a lake folder are tokenized,
  unpivoted and super-keyed per micro-batch (the same builder pipeline)
  and appended to the persisted index.  ``foreachBatch`` is required
  because one input feeds two sinks (cells + row_keys) and the super-key
  build contains an aggregation.
- :func:`windowed_event_counts` — watermarked tumbling-window aggregation
  over an event stream (late data dropped after the watermark), the
  streaming twin of the batch ``events_window_agg`` query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from datalake_indexes_spark.functions.xash import xash_pandas_udf
from datalake_indexes_spark.index.builder import row_keys_for, unpivot_to_cells
from datalake_indexes_spark.sources.catalog import LakeTableSpec


def incremental_index_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    spec: LakeTableSpec,
    index_path: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Append newly-arrived files of one lake table to the persisted index.

    Row ids restart per micro-batch offset: the current max row_id in the
    persisted index is read at batch start and new rows continue from
    there, so (table_id, row_id) stays unique across the stream — the
    streaming equivalent of the reference's monotone rowid counter
    (data_handler.py:277).
    """
    stream = spark.readStream.schema(schema).parquet(input_dir)
    cells_path = os.path.join(index_path, "cells")
    keys_path = os.path.join(index_path, "row_keys")
    xash_udf = xash_pandas_udf()

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        try:
            offset_row = (
                sess.read.parquet(cells_path)
                .filter(F.col("table_id") == spec.table_id)
                .agg(F.max("row_id"))
                .collect()[0]
            )
            offset = (offset_row[0] + 1) if offset_row[0] is not None else 0
        except Exception:  # noqa: BLE001 — first batch, no index yet
            offset = 0
        cells = unpivot_to_cells(batch_df, spec).withColumn(
            "row_id", F.col("row_id") + F.lit(offset)
        )
        cells.persist()
        cells.write.mode("append").parquet(cells_path)
        row_keys_for(cells, xash_udf).write.mode("append").parquet(keys_path)
        cells.unpersist()

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type over a streaming
    (or batch — same plan) events DataFrame.

    With nanosAsLong in effect the raw ``ts`` is int64 nanoseconds; it is
    converted to a proper timestamp first (exact integer math, no double
    rounding).
    """
    if dict(events.dtypes).get(ts_col) == "bigint":
        # integer `div`: /1000 in doubles rounds the last microsecond
        ts = F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
    else:
        ts = F.col(ts_col)
    df = events.withColumn("__ts", ts)
    if events.isStreaming:
        df = df.withWatermark("__ts", watermark)
    return (
        df.groupBy(F.window("__ts", window).alias("window"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
