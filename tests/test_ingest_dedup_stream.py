"""Streaming ingestion dedup (streaming/ingest_dedup_stream.py): stream ==
batch twin over a bootstrapped history store, cross-batch drops against
the accumulated hash store, retry idempotency, Bloom-knob transparency,
and a real checkpoint restart through the file-stream wiring."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from datalake_indexes_spark.operators.dedup import incremental_new_docs
from datalake_indexes_spark.streaming.ingest_dedup_stream import (
    bootstrap_history_store,
    ingest_dedup_stream,
    make_ingest_dedup_processor,
)


def _fixture(spark):
    hist = spark.createDataFrame(
        [(i, f"history corpus document {i} established text") for i in range(20)],
        "doc_id long, text string",
    )
    inc_rows = (
        # batch 0: 4 new + 1 history re-crawl + an in-batch double
        [(100 + i, f"first wave doc {i}") for i in range(4)]
        + [(110, "history corpus document 3 established text")]
        + [(111, "first wave doc 0")]
        # batch 1: 3 new + a cross-BATCH copy of a batch-0 doc + another
        # history re-crawl
        + [(200 + i, f"second wave doc {i}") for i in range(3)]
        + [(210, "first wave doc 2")]
        + [(211, "history corpus document 7 established text")]
        # batch 2: 2 new + a copy of a batch-1 doc
        + [(300, "third wave doc 0"), (301, "third wave doc 1")]
        + [(310, "second wave doc 1")]
    )
    inc = spark.createDataFrame(inc_rows, "doc_id long, text string")
    batches = [
        inc.filter(F.col("doc_id") < 200),
        inc.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 300)),
        inc.filter(F.col("doc_id") >= 300),
    ]
    return hist, inc, batches


def _keys(rows):
    return {(r["doc_id"], r["content_hash"]) for r in rows}


def test_stream_matches_batch_twin(spark):
    hist, inc, batches = _fixture(spark)
    batch_out = _keys(incremental_new_docs(hist, inc).collect())
    work = tempfile.mkdtemp(prefix="ingestdedup_")
    try:
        bootstrap_history_store(hist, f"{work}/store")
        process = make_ingest_dedup_processor(f"{work}/store", f"{work}/out")
        for i, b in enumerate(batches):
            process(b, i)
        stream_out = _keys(spark.read.parquet(f"{work}/out").collect())
        assert stream_out == batch_out
        assert len(stream_out) == 9  # 4 + 3 + 2 genuinely new
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_cross_batch_and_history_drops(spark):
    hist, _, batches = _fixture(spark)
    work = tempfile.mkdtemp(prefix="ingestdrop_")
    try:
        bootstrap_history_store(hist, f"{work}/store")
        process = make_ingest_dedup_processor(f"{work}/store", f"{work}/out")
        for i, b in enumerate(batches):
            process(b, i)
        out = spark.read.parquet(f"{work}/out")
        emitted = {r["doc_id"] for r in out.collect()}
        # history re-crawls and cross-batch copies never surface
        assert {110, 211, 210, 310}.isdisjoint(emitted)
        # the in-batch double is folded into its first's n_copies
        r100 = out.filter(F.col("doc_id") == 100).collect()[0]
        assert r100["n_copies"] == 2
        # the store admits only NEW hashes: 20 history + 9 admitted
        hashes = spark.read.parquet(f"{work}/store/hashes")
        assert hashes.count() == 29
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_retried_batch_is_idempotent(spark):
    hist, _, batches = _fixture(spark)
    work = tempfile.mkdtemp(prefix="ingestretry_")
    try:
        bootstrap_history_store(hist, f"{work}/store")
        process = make_ingest_dedup_processor(f"{work}/store", f"{work}/out")
        process(batches[0], 0)
        process(batches[1], 1)
        once = sorted(map(tuple, spark.read.parquet(f"{work}/out").collect()))
        store_once = spark.read.parquet(f"{work}/store/hashes").count()
        process(batches[1], 1)  # retry replays batch 1
        twice = sorted(map(tuple, spark.read.parquet(f"{work}/out").collect()))
        assert once == twice
        assert spark.read.parquet(f"{work}/store/hashes").count() == store_once
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_bloom_knobs_transparent_in_stream(spark):
    """A saturating m=16 filter (everything Bloom-positive, pure verify)
    must emit exactly what the default emits."""
    hist, inc, batches = _fixture(spark)
    expected = _keys(incremental_new_docs(hist, inc).collect())
    work = tempfile.mkdtemp(prefix="ingestknob_")
    try:
        bootstrap_history_store(hist, f"{work}/store", hex_len=1)
        process = make_ingest_dedup_processor(
            f"{work}/store", f"{work}/out", hex_len=1
        )
        for i, b in enumerate(batches):
            process(b, i)
        assert _keys(spark.read.parquet(f"{work}/out").collect()) == expected
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_checkpoint_restart_resumes_not_reemits(spark):
    """Drive the real file-stream wiring: first run sees half the files
    (availableNow, to termination), the query object is discarded, a NEW
    query on the SAME checkpoint ingests the full directory.  Phase 2
    must process only the unseen file — no re-emission, no double-count —
    and the final output must equal the one-shot batch twin."""
    hist, inc, batches = _fixture(spark)
    expected = _keys(incremental_new_docs(hist, inc).collect())
    work = tempfile.mkdtemp(prefix="ingestrestart_")
    schema = "doc_id long, text string"
    try:
        bootstrap_history_store(hist, f"{work}/store")
        batches[0].write.parquet(f"{work}/in/b0.parquet")
        batches[1].write.parquet(f"{work}/in/b1.parquet")
        q = ingest_dedup_stream(
            spark, f"{work}/in/*", schema, f"{work}/store", f"{work}/out",
            f"{work}/ckpt",
        )
        q.awaitTermination(120)
        phase1 = _keys(spark.read.parquet(f"{work}/out").collect())
        assert {d for d, _ in phase1} >= {100, 101, 102, 103, 200}
        # restart: new query, same checkpoint, one more file present
        batches[2].write.parquet(f"{work}/in/b2.parquet")
        q2 = ingest_dedup_stream(
            spark, f"{work}/in/*", schema, f"{work}/store", f"{work}/out",
            f"{work}/ckpt",
        )
        q2.awaitTermination(120)
        out = spark.read.parquet(f"{work}/out")
        assert _keys(out.collect()) == expected
        # phase 2 wrote only NEW batch partitions (no re-emit of phase 1)
        assert out.count() == len(expected)
    finally:
        shutil.rmtree(work, ignore_errors=True)
