"""Streaming line-frequency store (streaming/line_stream.py): folded
store == batch census, cleaning parity with batch line_dedup (including
a line that only crosses the threshold after a later batch), retry
idempotency, an availableNow file-stream run, and a checkpoint
kill-and-restart."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from datalake_indexes_spark.operators.dedup import line_census, line_dedup
from datalake_indexes_spark.streaming.line_stream import (
    clean_against_store,
    line_store_stream,
    load_line_store,
    make_line_store_processor,
)

HEADER = "site header menu"


def _docs(spark):
    rows = [
        (1, f"{HEADER}\nalpha body one"),
        (2, "beta body two\nunique footer two"),
        (3, f"{HEADER}\ngamma body three\n   "),
        # HEADER only becomes boilerplate once doc 3 (batch 2) arrives
        (4, "delta body four"),
        (5, f"{HEADER}"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _norm(rows):
    return sorted(
        (r["doc_id"], r["n_lines"], r["n_kept"], r["text_filtered"]) for r in rows
    )


def test_store_fold_and_cleaning_match_batch(spark):
    docs = _docs(spark)
    work = tempfile.mkdtemp(prefix="linestream_")
    try:
        process = make_line_store_processor(f"{work}/store")
        process(docs.filter(F.col("doc_id") <= 1), 0)  # HEADER df=1: not yet boiler
        process(docs.filter((F.col("doc_id") > 1) & (F.col("doc_id") <= 3)), 1)
        process(docs.filter(F.col("doc_id") > 3), 2)

        store = load_line_store(spark, f"{work}/store")
        batch = line_census(docs, min_docs=1)
        assert sorted(
            (r["line_norm"], r["df"]) for r in store.collect()
        ) == sorted((r["line_norm"], r["n_docs"]) for r in batch.collect())

        got = _norm(clean_against_store(docs, store, min_docs=2).collect())
        want = _norm(line_dedup(docs, min_docs=2).collect())
        assert got == want
        # the cross-batch boilerplate actually got stripped everywhere,
        # and the fully-boilerplate doc kept its (empty) row
        by_id = dict((d, t) for d, _n, _k, t in got)
        assert HEADER not in by_id[1] and HEADER not in by_id[3]
        assert by_id[5] == ""
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_retried_batch_is_idempotent(spark):
    docs = _docs(spark)
    work = tempfile.mkdtemp(prefix="lineretry_")
    try:
        process = make_line_store_processor(f"{work}/store")
        process(docs.filter(F.col("doc_id") <= 2), 0)
        process(docs.filter(F.col("doc_id") > 2), 1)
        before = sorted(
            (r["line_norm"], r["df"])
            for r in load_line_store(spark, f"{work}/store").collect()
        )
        process(docs.filter(F.col("doc_id") > 2), 1)  # crash-retry replay
        after = sorted(
            (r["line_norm"], r["df"])
            for r in load_line_store(spark, f"{work}/store").collect()
        )
        assert before == after
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_available_now_file_stream_with_restart(spark):
    docs = _docs(spark)
    work = tempfile.mkdtemp(prefix="linefs_")
    try:
        docs.filter(F.col("doc_id") <= 3).write.parquet(f"{work}/in")
        q = line_store_stream(
            spark, f"{work}/in", docs.schema, f"{work}/store", f"{work}/ckpt"
        )
        q.awaitTermination(120)
        # phase 2: more files land after the "crash"; restart from the
        # checkpoint must process ONLY the unseen file
        docs.filter(F.col("doc_id") > 3).write.mode("append").parquet(f"{work}/in")
        q2 = line_store_stream(
            spark, f"{work}/in", docs.schema, f"{work}/store", f"{work}/ckpt"
        )
        q2.awaitTermination(120)
        got = _norm(
            clean_against_store(
                docs, load_line_store(spark, f"{work}/store"), min_docs=2
            ).collect()
        )
        assert got == _norm(line_dedup(docs, min_docs=2).collect())
    finally:
        shutil.rmtree(work, ignore_errors=True)
