"""10x streaming-ingest throughput exercise (round 8): the text-index
maintenance stream (postings + df + stats + positional layer) measured
as docs/second at 1x and 10x batch volume over the sf0.1 documents.

The streaming modules carry stream==batch parity and restart tests;
this adds the MEASURED ingest-rate row: the foreachBatch processor is
one explode + one (doc, term) aggregate + term-sorted idempotent
writes per batch, so docs/sec should be roughly flat as batch volume
grows 10x (per-batch fixed overhead amortizes; nothing in the
processor is corpus-history-sized).  A falling rate would mean the
processor secretly re-reads history — the failure mode the additive
partial design exists to avoid.

Synthesis: the rotated-copy idiom (each copy rewrites shingle content,
word population preserved) split into 5 micro-batches either way, so
both scales pay the same per-batch fixed cost and differ only in rows.

Writes nothing outside /tmp.  Run:  python examples/scale10x_stream_ingest.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/scale10x_stream"
N_BATCHES = 5


def scaled_docs(spark, factor: int):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    parts = [docs]
    for k in range(1, factor):
        rot = 7 * k
        parts.append(
            docs.select(
                (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
                F.expr(
                    f"concat(substring(text, {rot + 1}), substring(text, 1, {rot}))"
                ).alias("text"),
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def main() -> None:
    from datalake_indexes_spark.session import get_spark
    from datalake_indexes_spark.streaming.text_index_stream import (
        bm25_topk_streamed,
        make_text_index_batch_processor,
        proximity_topk_streamed,
    )

    spark = get_spark("scale10x-stream")
    spark.sparkContext.setLogLevel("ERROR")

    for factor in (1, 10):
        idx = f"{OUT}/idx_{factor}x"
        shutil.rmtree(idx, ignore_errors=True)
        docs = scaled_docs(spark, factor).withColumn(
            "__b", F.pmod(F.col("doc_id"), F.lit(N_BATCHES))
        )
        # materialize the batch slices first so ingest timing measures
        # the PROCESSOR, not the synthesis arithmetic
        staged = f"{OUT}/staged_{factor}x.parquet"
        docs.write.mode("overwrite").partitionBy("__b").parquet(staged)
        process = make_text_index_batch_processor(idx, positional=True)
        # size the batches BEFORE the timer starts — a count() inside the
        # timed loop is a full extra scan per micro-batch that inflates
        # ingest_s and distorts docs_per_s (r8 ADVICE)
        batches = [spark.read.parquet(f"{staged}/__b={b}") for b in range(N_BATCHES)]
        n_docs = sum(b.count() for b in batches)
        t0 = time.time()
        for b, batch in enumerate(batches):
            process(batch, b)
        ingest_s = time.time() - t0
        # probe the live index once each way (sanity: it answers)
        n_bm25 = bm25_topk_streamed(spark, idx, ["spark", "join", "window"], k=10).count()
        n_prox = proximity_topk_streamed(spark, idx, ["spark", "join", "window"], k=10).count()
        print(
            json.dumps(
                {
                    "factor": factor,
                    "n_docs": n_docs,
                    "n_batches": N_BATCHES,
                    "ingest_s": round(ingest_s, 2),
                    "docs_per_s": round(n_docs / ingest_s, 1),
                    "bm25_rows": n_bm25,
                    "prox_rows": n_prox,
                }
            )
        )


if __name__ == "__main__":
    main()
