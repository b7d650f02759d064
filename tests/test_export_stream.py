"""Streaming delivery sink (streaming/export_stream.py): stream-maintained
sharded export == batch export after every batch prefix, per-batch
refresh touches only the arriving docs' shards, retry idempotency, and a
real availableNow file-stream run."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from datalake_indexes_spark.sources.export import export_jsonl_shards
from datalake_indexes_spark.streaming.export_stream import (
    delivery_stream,
    make_delivery_processor,
)

N_SHARDS = 4


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc-"), F.col("id").cast("string")).alias("text"),
    )


def _delivery_rows(spark, path):
    return sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.json(path).select("doc_id", "text").collect()
    )


def test_stream_equals_batch_after_each_prefix(spark):
    work = tempfile.mkdtemp(prefix="delivery_")
    try:
        process = make_delivery_processor(
            f"{work}/staging", f"{work}/delivery", n_shards=N_SHARDS
        )
        process(_docs(spark, 0, 20), 0)
        assert _delivery_rows(spark, f"{work}/delivery") == sorted(
            (r["doc_id"], r["text"]) for r in _docs(spark, 0, 20).collect()
        )
        # second batch: delivery must equal the batch export of ALL docs
        process(_docs(spark, 20, 30), 1)
        expect_dir = f"{work}/batch_twin"
        export_jsonl_shards(_docs(spark, 0, 30), expect_dir, n_shards=N_SHARDS)
        assert _delivery_rows(spark, f"{work}/delivery") == _delivery_rows(
            spark, expect_dir
        )
        # ...and byte-for-byte: same rows, same id order, same shard files
        for entry in os.listdir(expect_dir):
            if not entry.startswith("shard_id="):
                continue
            a = sorted(os.listdir(os.path.join(f"{work}/delivery", entry)))
            b = sorted(os.listdir(os.path.join(expect_dir, entry)))
            data_a = b"".join(
                open(os.path.join(f"{work}/delivery", entry, f), "rb").read()
                for f in a
                if not f.startswith(("_", "."))
            )
            data_b = b"".join(
                open(os.path.join(expect_dir, entry, f), "rb").read()
                for f in b
                if not f.startswith(("_", "."))
            )
            assert data_a == data_b
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_refresh_touches_only_arriving_shards(spark):
    work = tempfile.mkdtemp(prefix="delivery_")
    try:
        process = make_delivery_processor(
            f"{work}/staging", f"{work}/delivery", n_shards=N_SHARDS
        )
        process(_docs(spark, 0, 40), 0)

        def mtimes():
            return {
                e: os.path.getmtime(os.path.join(f"{work}/delivery", e))
                for e in os.listdir(f"{work}/delivery")
                if e.startswith("shard_id=")
            }

        before = mtimes()
        # one new doc -> at most one shard rewritten
        process(_docs(spark, 40, 41), 1)
        after = mtimes()
        changed = [k for k in before if after[k] != before[k]]
        assert len(changed) == 1
        with open(f"{work}/delivery/_MANIFEST.json") as fh:
            manifest = {r["shard_id"]: r["n_docs"] for r in json.load(fh)}
        assert sum(manifest.values()) == 41
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_retry_idempotency(spark):
    """Replaying a micro-batch (crash-retry) leaves delivery identical."""
    work = tempfile.mkdtemp(prefix="delivery_")
    try:
        process = make_delivery_processor(
            f"{work}/staging", f"{work}/delivery", n_shards=N_SHARDS
        )
        process(_docs(spark, 0, 20), 0)
        process(_docs(spark, 20, 25), 1)
        rows = _delivery_rows(spark, f"{work}/delivery")
        process(_docs(spark, 20, 25), 1)  # retry of batch 1
        assert _delivery_rows(spark, f"{work}/delivery") == rows
        assert spark.read.json(f"{work}/delivery").count() == 25
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_available_now_file_stream(spark):
    work = tempfile.mkdtemp(prefix="delivery_")
    try:
        inp = f"{work}/in"
        os.makedirs(inp)
        _docs(spark, 0, 15).coalesce(1).write.parquet(f"{inp}/f1")
        schema = "doc_id long, text string"
        q = delivery_stream(
            spark,
            f"{inp}/*",
            schema,
            f"{work}/staging",
            f"{work}/delivery",
            f"{work}/ckpt",
            n_shards=N_SHARDS,
        )
        q.awaitTermination(120)
        assert _delivery_rows(spark, f"{work}/delivery") == sorted(
            (r["doc_id"], r["text"]) for r in _docs(spark, 0, 15).collect()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
