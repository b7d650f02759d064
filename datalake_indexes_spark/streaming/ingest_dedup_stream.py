"""Streaming ingestion dedup against the accumulated corpus — the live
twin of ``operators/dedup.py incremental_new_docs`` (extension surface;
the reference is strictly batch, SURVEY.md §2.9).

The batch operator answers "which documents of THIS increment already
exist in the corpus"; an ingest stream asks it per micro-batch, with the
corpus growing by every batch it admits.  Two persisted stores make that
incremental:

- ``hashes/``   — one md5 content hash per admitted document (history
  bootstrap at ``batch_id=-1``, then one partition per batch),
- ``positions/`` — the distinct Bloom probe positions of those hashes
  (same "j:item" md5 probe family as the batch operator; the DISTINCT
  position set per partition is bounded by m = 16^hex_len, so the whole
  store reads in O(batches · m) regardless of corpus size).

Per micro-batch: first-occurrence-per-hash within the batch; a document
with ANY probe position missing from the prior position store is provably
new (Bloom soundness) and skips verification; the Bloom-positive rest are
verified against the hash store via a broadcast of the (small) candidate
set — the store scan never shuffles.  New docs are emitted and the
batch's hashes + positions appended.

Idempotency: every sink is partitioned by ``batch_id`` with dynamic
partition overwrite, and lookups join only ``batch_id < current`` — a
retried batch replaces its own leaves and recomputes the same answer.

Cross-batch contract: the FIRST ARRIVAL of a content hash survives; a
later batch's copy is dropped (flagged against a store entry, not a
re-read of old text).  When arrival order follows doc_id order this
equals the batch twin's min(doc_id) retention exactly — the parity the
tests pin.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_indexes_spark.operators.dedup import _bloom_probe_array


def bootstrap_history_store(
    history: DataFrame,
    store_dir: str,
    text_col: str = "text",
    k_hashes: int = 3,
    hex_len: int = 4,
) -> None:
    """One-time store bootstrap from the pre-existing corpus: its content
    hashes and their distinct probe positions, both at ``batch_id=-1``
    (before every streaming batch).  History itself is scanned once and
    never again."""
    hh = history.select(F.md5(F.col(text_col)).alias("content_hash"))
    _write_store_partition(hh, store_dir, -1, k_hashes, hex_len)


def _write_store_partition(
    hashes: DataFrame, store_dir: str, batch_id: int, k_hashes: int, hex_len: int
) -> None:
    pos = (
        hashes.select(
            F.explode(
                _bloom_probe_array(F.col("content_hash"), k_hashes, hex_len)
            ).alias("p")
        )
        .distinct()
    )
    for frame, sub in ((hashes, "hashes"), (pos, "positions")):
        (
            frame.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(os.path.join(store_dir, sub))
        )


def make_ingest_dedup_processor(
    store_dir: str,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_hashes: int = 3,
    hex_len: int = 4,
):
    """``foreachBatch`` worker: emits (doc_id, content_hash, n_copies,
    batch_id) for the batch's genuinely-new documents (n_copies = the
    WITHIN-batch multiplicity), then appends the batch's hashes and probe
    positions to the store."""
    from pyspark.errors import AnalysisException

    def _prior(sess, sub: str, batch_id: int) -> DataFrame | None:
        try:
            return sess.read.parquet(os.path.join(store_dir, sub)).filter(
                F.col("batch_id") < batch_id
            )
        except AnalysisException as exc:
            if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
                return None
            raise

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        firsts = (
            batch_df.select(
                F.col(id_col).alias("doc_id"),
                F.md5(F.col(text_col)).alias("content_hash"),
            )
            .groupBy("content_hash")
            .agg(
                F.min("doc_id").alias("doc_id"),
                F.count(F.lit(1)).alias("n_copies"),
            )
        )
        prior_pos = _prior(sess, "positions", batch_id)
        if prior_pos is None:
            new = firsts
        else:
            pos_set = prior_pos.select("p").distinct()
            probes = firsts.select(
                "content_hash",
                F.explode(
                    _bloom_probe_array(F.col("content_hash"), k_hashes, hex_len)
                ).alias("p"),
            )
            bf_new = (
                probes.join(F.broadcast(pos_set), "p", "left_anti")
                .select("content_hash")
                .distinct()
            )
            candidates = firsts.join(bf_new, "content_hash", "left_anti")
            prior_hashes = _prior(sess, "hashes", batch_id).select("content_hash")
            confirmed = (
                prior_hashes.join(
                    F.broadcast(candidates.select("content_hash")),
                    "content_hash",
                    "left_semi",
                )
                .distinct()
            )
            new = (
                firsts.join(bf_new, "content_hash", "left_semi")
                .unionByName(
                    candidates.join(
                        F.broadcast(confirmed), "content_hash", "left_anti"
                    )
                )
            )
        (
            new.select("doc_id", "content_hash", "n_copies")
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )
        # the store admits only the NEW hashes — a dropped duplicate must
        # not re-seed the filter (it is already covered by its original)
        _write_store_partition(
            new.select("content_hash"), store_dir, batch_id, k_hashes, hex_len
        )

    return process


def ingest_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    **kwargs,
):
    """Wire the processor to a parquet file stream of documents."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    process = make_ingest_dedup_processor(store_dir, out_dir, **kwargs)
    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
