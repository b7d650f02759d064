"""Structured Streaming: incremental index append equals the batch build;
windowed event counts match the batch formulation."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from datalake_indexes_spark.index.builder import build_index
from datalake_indexes_spark.sources.catalog import TESTDATA_LAKE_SPEC
from datalake_indexes_spark.streaming.incremental import (
    incremental_index_stream,
    make_index_batch_processor,
    windowed_event_counts,
)


@pytest.mark.spark
def test_incremental_index_matches_batch(spark, sf_dir):
    """Stream nation in two file-drops; the appended cell index must equal
    the one-shot batch build (same cells, same super keys)."""
    spec = TESTDATA_LAKE_SPEC["nation"]
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    work = tempfile.mkdtemp(prefix="streamidx_")
    try:
        in_dir, idx_dir, ckpt = f"{work}/in", f"{work}/idx", f"{work}/ckpt"
        first = nation.filter(F.col("n_nationkey") < 12)
        second = nation.filter(F.col("n_nationkey") >= 12)
        first.coalesce(1).write.parquet(in_dir)

        q = incremental_index_stream(
            spark, in_dir, nation.schema, spec, idx_dir, ckpt
        )
        q.awaitTermination(120)
        second.coalesce(1).write.mode("append").parquet(in_dir)
        q2 = incremental_index_stream(
            spark, in_dir, nation.schema, spec, idx_dir, ckpt
        )
        q2.awaitTermination(120)

        streamed = spark.read.parquet(f"{idx_dir}/cells")
        batch = build_index(
            spark, {"nation": nation}, {"nation": spec}, with_super_keys=True
        )
        # cell multiset identical up to row_id renumbering across batches:
        # compare the per-row sorted value arrays and the super-key multiset
        def row_sets(cells):
            return sorted(
                tuple(r["vals"])
                for r in cells.groupBy("row_id")
                .agg(F.sort_array(F.collect_list("tokenized")).alias("vals"))
                .collect()
            )

        assert row_sets(streamed) == row_sets(batch.cells)
        streamed_keys = spark.read.parquet(f"{idx_dir}/row_keys")
        sk = sorted(
            (r["super_key_hi"], r["super_key_lo"]) for r in streamed_keys.collect()
        )
        bk = sorted(
            (r["super_key_hi"], r["super_key_lo"]) for r in batch.row_keys.collect()
        )
        assert sk == bk
        # row ids must stay unique across micro-batches
        assert streamed.select("row_id").distinct().count() == nation.count()
    finally:
        shutil.rmtree(work, ignore_errors=True)


@pytest.mark.spark
def test_incremental_batch_retry_is_idempotent(spark, sf_dir):
    """A micro-batch retried after a crash between the cells and row_keys
    writes must NOT duplicate index rows: replaying the same batch_id
    overwrites its own partition and recomputes the same row-id offset."""
    spec = TESTDATA_LAKE_SPEC["nation"]
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    work = tempfile.mkdtemp(prefix="streamretry_")
    try:
        idx_dir = f"{work}/idx"
        process = make_index_batch_processor(spec, idx_dir)
        first = nation.filter(F.col("n_nationkey") < 12)
        second = nation.filter(F.col("n_nationkey") >= 12)

        process(first, 0)
        snapshot = sorted(
            (r["table_id"], r["row_id"], r["col_id"], r["tokenized"])
            for r in spark.read.parquet(f"{idx_dir}/cells").collect()
        )
        process(first, 0)  # simulated retry of the same micro-batch
        replayed = sorted(
            (r["table_id"], r["row_id"], r["col_id"], r["tokenized"])
            for r in spark.read.parquet(f"{idx_dir}/cells").collect()
        )
        assert replayed == snapshot  # no duplicates, same offsets

        process(second, 1)
        cells = spark.read.parquet(f"{idx_dir}/cells")
        keys = spark.read.parquet(f"{idx_dir}/row_keys")
        assert cells.select("row_id").distinct().count() == nation.count()
        assert keys.count() == nation.count()
        n_cells = cells.count()
        process(second, 1)  # retry of the follow-up batch
        assert spark.read.parquet(f"{idx_dir}/cells").count() == n_cells
    finally:
        shutil.rmtree(work, ignore_errors=True)


@pytest.mark.spark
def test_windowed_event_counts_stream_matches_batch(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch_out = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(events).collect()
    }

    work = tempfile.mkdtemp(prefix="streamev_")
    try:
        events.write.parquet(f"{work}/in")
        stream = spark.readStream.schema(events.schema).parquet(f"{work}/in")
        q = (
            windowed_event_counts(stream)
            .writeStream.format("memory")
            .queryName("ev_counts")
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # append mode only emits windows closed by the watermark; every
        # emitted row must match the batch result exactly
        emitted = spark.sql("SELECT * FROM ev_counts").collect()
        assert emitted, "stream emitted no closed windows"
        for r in emitted:
            assert batch_out[(r["window_start"], r["event_type"])] == (
                r["n_events"],
                r["sum_value"],
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@pytest.mark.spark
def test_shared_index_path_two_tables_no_clobber(spark, sf_dir):
    """Two per-table streams sharing one index_path: each table's batch 0
    must land in its own (table_id, batch_id) leaf — partitioning by
    batch_id alone would let region's batch 0 overwrite nation's."""
    work = tempfile.mkdtemp(prefix="streamshared_")
    try:
        idx_dir = f"{work}/idx"
        nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
        region = spark.read.parquet(f"{sf_dir}/region.parquet")
        process_nation = make_index_batch_processor(TESTDATA_LAKE_SPEC["nation"], idx_dir)
        process_region = make_index_batch_processor(TESTDATA_LAKE_SPEC["region"], idx_dir)

        process_nation(nation, 0)
        n_nation = spark.read.parquet(f"{idx_dir}/cells").count()
        process_region(region, 0)  # same batch_id, different table stream
        cells = spark.read.parquet(f"{idx_dir}/cells")
        by_table = {
            r["table_id"]: r["n"]
            for r in cells.groupBy("table_id").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert by_table[TESTDATA_LAKE_SPEC["nation"].table_id] == n_nation
        assert by_table[TESTDATA_LAKE_SPEC["region"].table_id] > 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


@pytest.mark.spark
def test_legacy_index_without_batch_id_resumes(spark, sf_dir):
    """An index written by the old append-mode layout (no batch_id column)
    must be resumable: legacy rows count as prior (batch_id = -1) for the
    offset, and new batches continue row ids after them."""
    spec = TESTDATA_LAKE_SPEC["nation"]
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    work = tempfile.mkdtemp(prefix="streamlegacy_")
    try:
        idx_dir = f"{work}/idx"
        first = nation.filter(F.col("n_nationkey") < 12)
        second = nation.filter(F.col("n_nationkey") >= 12)
        # legacy layout: plain append, no batch_id, no partitioning
        from datalake_indexes_spark.index.builder import unpivot_to_cells

        unpivot_to_cells(first, spec).write.parquet(f"{idx_dir}/cells")
        legacy_max = (
            spark.read.parquet(f"{idx_dir}/cells").agg(F.max("row_id")).collect()[0][0]
        )

        process = make_index_batch_processor(spec, idx_dir)
        process(second, 0)
        cells = spark.read.parquet(f"{idx_dir}/cells")
        new_min = (
            cells.filter(F.col("batch_id") == 0).agg(F.min("row_id")).collect()[0][0]
        )
        # offset = legacy_max + 1 was applied (row ids are unique, not
        # dense: the spec's row_id_expr starts from the key value)
        assert new_min == 12 + legacy_max + 1
        assert cells.select("row_id").distinct().count() == nation.count()
    finally:
        shutil.rmtree(work, ignore_errors=True)


@pytest.mark.spark
def test_windowed_counts_negative_nanos_floor(spark):
    """Pre-1970 nanosecond timestamps bucket by FLOOR (matching
    date_trunc), not truncate-toward-zero."""
    # -1ns is inside the hour 1969-12-31 23:00, not hour 0
    df = spark.createDataFrame(
        [(-1, "a", 1.0), (-3_600_000_000_000, "a", 1.0), (1, "a", 1.0)],
        "ts long, event_type string, value double",
    )
    out = {r["window_start"]: r["n_events"] for r in windowed_event_counts(df).collect()}
    assert out == {"1969-12-31 23:00:00": 2, "1970-01-01 00:00:00": 1}


@pytest.mark.spark
def test_streaming_dedup_matches_batch(spark):
    """Exact dedup on an ingest stream: the emitted set equals the
    batch-distinct set when all duplicates fall inside the watermark."""
    import tempfile as _tf

    from datalake_indexes_spark.streaming.dedup_stream import dedup_batch, dedup_stream

    rows = []
    for i in range(200):
        # 50 distinct texts, each arriving 4 times within minutes
        rows.append((i, f"2024-01-01 10:{i % 60:02d}:00", f"document body {i % 50}"))
    docs = spark.createDataFrame(rows, "doc_id long, ts_s string, text string").select(
        "doc_id", F.col("ts_s").cast("timestamp").alias("ts"), "text"
    )

    batch_hashes = {
        r["content_hash"] for r in dedup_batch(docs).collect()
    }
    assert len(batch_hashes) == 50

    work = _tf.mkdtemp(prefix="streamdedup_")
    try:
        docs.write.parquet(f"{work}/in")
        stream = spark.readStream.schema(docs.schema).parquet(f"{work}/in")
        q = (
            dedup_stream(stream, watermark="2 hours")
            .writeStream.format("memory")
            .queryName("dedup_out")
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        emitted = spark.sql("SELECT content_hash FROM dedup_out").collect()
        assert {r["content_hash"] for r in emitted} == batch_hashes
        assert len(emitted) == 50  # each hash exactly once
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_batch_only_legacy_layout_migrates(spark, sf_dir):
    """The interim layout partitioned by batch_id ALONE (batch_id present
    as a partition column, no table_id= dirs) must be migrated to
    (table_id, batch_id) before new writes — left in place it would mix
    partition-directory depths and break every subsequent read."""
    import os

    spec = TESTDATA_LAKE_SPEC["nation"]
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    work = tempfile.mkdtemp(prefix="streambatchonly_")
    try:
        idx_dir = f"{work}/idx"
        first = nation.filter(F.col("n_nationkey") < 12)
        second = nation.filter(F.col("n_nationkey") >= 12)
        from datalake_indexes_spark.index.builder import unpivot_to_cells

        (
            unpivot_to_cells(first, spec)
            .withColumn("batch_id", F.lit(0))
            .write.partitionBy("batch_id")
            .parquet(f"{idx_dir}/cells")
        )
        assert any(
            e.startswith("batch_id=") for e in os.listdir(f"{idx_dir}/cells")
        )

        process = make_index_batch_processor(spec, idx_dir)
        process(second, 1)
        cells = spark.read.parquet(f"{idx_dir}/cells")
        # migrated: table_id= is now the outer partition dir, both batches
        # readable, row ids unique across them
        assert any(
            e.startswith("table_id=") for e in os.listdir(f"{idx_dir}/cells")
        )
        assert cells.select("row_id").distinct().count() == nation.count()
        assert set(r["batch_id"] for r in cells.select("batch_id").distinct().collect()) == {0, 1}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_orphaned_migration_staging_is_published(spark, sf_dir):
    """Crash window: migrate_legacy renamed the old dir aside and died
    before publishing the staged dir.  The next batch must publish the
    orphan and continue row ids after it — NOT fall into the
    missing-path branch and restart at offset 0 (colliding row ids)."""
    import os

    spec = TESTDATA_LAKE_SPEC["nation"]
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    work = tempfile.mkdtemp(prefix="streamorphan_")
    try:
        idx_dir = f"{work}/idx"
        first = nation.filter(F.col("n_nationkey") < 12)
        second = nation.filter(F.col("n_nationkey") >= 12)
        from datalake_indexes_spark.index.builder import unpivot_to_cells

        # a fully-migrated staging dir, stranded: cells at the path that
        # migrate_legacy stages to, with the real path absent
        (
            unpivot_to_cells(first, spec)
            .withColumn("batch_id", F.lit(-1))
            .write.partitionBy("table_id", "batch_id")
            .parquet(f"{idx_dir}/cells.__migrating")
        )
        os.makedirs(f"{idx_dir}", exist_ok=True)
        max_before = (
            spark.read.parquet(f"{idx_dir}/cells.__migrating")
            .agg(F.max("row_id")).collect()[0][0]
        )

        process = make_index_batch_processor(spec, idx_dir)
        process(second, 0)
        cells = spark.read.parquet(f"{idx_dir}/cells")
        new_min = (
            cells.filter(F.col("batch_id") == 0).agg(F.min("row_id")).collect()[0][0]
        )
        assert new_min == 12 + max_before + 1  # offset continued, not 0
        assert not os.path.exists(f"{idx_dir}/cells.__migrating")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_compact_index_folds_batches_and_preserves_offsets(spark, sf_dir):
    """Compaction folds all batch leaves into batch_id=-1 with identical
    content, and a post-compaction batch still continues row ids after
    the consolidated rows (offset contract intact)."""
    import os

    from datalake_indexes_spark.streaming.incremental import compact_index

    spec = TESTDATA_LAKE_SPEC["nation"]
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    work = tempfile.mkdtemp(prefix="streamcompact_")
    try:
        idx_dir = f"{work}/idx"
        process = make_index_batch_processor(spec, idx_dir)
        process(nation.filter(F.col("n_nationkey") < 8), 0)
        process(nation.filter((F.col("n_nationkey") >= 8) & (F.col("n_nationkey") < 16)), 1)
        before = spark.read.parquet(f"{idx_dir}/cells")
        content_before = sorted(
            (r["table_id"], r["row_id"], r["col_id"], r["tokenized"])
            for r in before.collect()
        )

        stats = compact_index(spark, idx_dir)
        assert stats["cells"]["files_after"] <= stats["cells"]["files_before"]
        after = spark.read.parquet(f"{idx_dir}/cells")
        assert set(
            r["batch_id"] for r in after.select("batch_id").distinct().collect()
        ) == {-1}
        assert content_before == sorted(
            (r["table_id"], r["row_id"], r["col_id"], r["tokenized"])
            for r in after.collect()
        )

        # a post-compaction batch continues where the stream left off
        process(nation.filter(F.col("n_nationkey") >= 16), 2)
        cells = spark.read.parquet(f"{idx_dir}/cells")
        assert cells.select("row_id").distinct().count() == nation.count()
        keys = spark.read.parquet(f"{idx_dir}/row_keys")
        assert keys.count() == nation.count()
    finally:
        shutil.rmtree(work, ignore_errors=True)
