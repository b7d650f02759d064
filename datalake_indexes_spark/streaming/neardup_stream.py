"""Streaming near-duplicate detection — incremental MinHash+LSH against a
persisted band store (extension surface; the live-ingest counterpart of the
batch ``operators/dedup.py`` pipeline).

Per micro-batch: shingle → minhash → band keys for the arriving documents;
candidates = band-key collisions against (a) the persisted store of all
PRIOR batches and (b) the batch itself; verification = signature-estimated
Jaccard (the fraction of agreeing minhash components — the store keeps the
k-component signatures, not the corpus text, so the stream never re-reads
old documents).  Duplicates are emitted the moment the later copy arrives.

Deviation from the batch operator, by design: batch ``minhash_lsh_pairs``
verifies EXACT Jaccard by re-joining shingles; a stream cannot re-shingle
ever-growing history, so it verifies on the signature estimate (standard
streaming LSH trade-off; E[estimate] = true Jaccard, ±1/k granularity).
:func:`neardup_pairs_est` is the batch twin with identical semantics so
stream == batch is testable.

Idempotency: every sink (band store, signature store, duplicate output) is
partitioned by ``batch_id`` and written with dynamic partition overwrite;
candidate lookup joins only ``batch_id < current``, so a retried batch
replaces its own leaves and recomputes the same pairs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_indexes_spark.operators.dedup import (
    MINHASH_BANDS,
    MINHASH_K,
    minhash_signatures,
    word_shingles,
)


def _band_keys(mh: DataFrame, k: int, bands: int) -> DataFrame:
    rows = k // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat(*[F.col(f"mh{b * rows + r}") for r in range(rows)]).alias("key"),
        )
        for b in range(bands)
    ]
    return mh.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def _est_jaccard(k: int) -> F.Column:
    agree = sum(
        (F.col(f"a.mh{j}") == F.col(f"b.mh{j}")).cast("int") for j in range(k)
    )
    return (agree / F.lit(k)).alias("est_jaccard")


def _est_pairs(
    cand: DataFrame, sig_a: DataFrame, sig_b: DataFrame, k: int, threshold: float
) -> DataFrame:
    """(doc_id_1, doc_id_2, est_jaccard) for candidate pairs whose
    signature-estimated Jaccard reaches the threshold."""
    j = (
        cand.join(sig_a.alias("a"), cand["doc_id_1"] == F.col("a.doc_id"))
        .join(sig_b.alias("b"), cand["doc_id_2"] == F.col("b.doc_id"))
        .select("doc_id_1", "doc_id_2", F.round(_est_jaccard(k), 4).alias("est_jaccard"))
    )
    return j.filter(F.col("est_jaccard") >= threshold)


def neardup_pairs_est(
    docs: DataFrame,
    n: int = 3,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Batch twin of the stream: band-collision candidates verified by the
    signature ESTIMATE (not exact Jaccard) — each unordered pair once as
    (doc_id_1 < doc_id_2, est_jaccard >= threshold)."""
    sh = word_shingles(docs, n=n, text_col=text_col, id_col=id_col)
    mh = minhash_signatures(sh, k=k)
    bk = _band_keys(mh, k, bands)
    a, b = bk.alias("x"), bk.alias("y")
    cand = (
        a.join(
            b,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_id_1"), F.col("y.doc_id").alias("doc_id_2")
        )
        .distinct()
    )
    return _est_pairs(cand, mh, mh, k, threshold)


def make_neardup_batch_processor(
    store_dir: str,
    out_dir: str,
    n: int = 3,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """``foreachBatch`` worker: emits (doc_id, dup_of, est_jaccard) per
    detected near-duplicate — cross-batch against the store AND within the
    batch — then appends the batch's bands + signatures to the store."""
    from pyspark.errors import AnalysisException

    bands_path = os.path.join(store_dir, "bands")
    sigs_path = os.path.join(store_dir, "signatures")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        docs = batch_df.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
        sh = word_shingles(docs, n=n)
        mh = minhash_signatures(sh, k=k).persist()
        try:
            bk = _band_keys(mh, k, bands)

            def prior(path: str) -> DataFrame | None:
                try:
                    return sess.read.parquet(path).filter(
                        F.col("batch_id") < batch_id
                    )
                except AnalysisException as exc:
                    if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
                        return None
                    raise

            old_bk = prior(bands_path)
            pieces = []
            if old_bk is not None:
                cross = (
                    bk.alias("x")
                    .join(
                        old_bk.alias("y"),
                        (F.col("x.band") == F.col("y.band"))
                        & (F.col("x.key") == F.col("y.key")),
                    )
                    .select(
                        F.col("y.doc_id").alias("doc_id_1"),
                        F.col("x.doc_id").alias("doc_id_2"),
                    )
                    .distinct()
                )
                pieces.append(
                    _est_pairs(cross, prior(sigs_path), mh, k, threshold).select(
                        F.col("doc_id_2").alias("doc_id"),
                        F.col("doc_id_1").alias("dup_of"),
                        "est_jaccard",
                    )
                )
            within = (
                bk.alias("x")
                .join(
                    bk.alias("y"),
                    (F.col("x.band") == F.col("y.band"))
                    & (F.col("x.key") == F.col("y.key"))
                    & (F.col("x.doc_id") < F.col("y.doc_id")),
                )
                .select(
                    F.col("x.doc_id").alias("doc_id_1"),
                    F.col("y.doc_id").alias("doc_id_2"),
                )
                .distinct()
            )
            pieces.append(
                _est_pairs(within, mh, mh, k, threshold).select(
                    F.col("doc_id_2").alias("doc_id"),
                    F.col("doc_id_1").alias("dup_of"),
                    "est_jaccard",
                )
            )
            dups = pieces[0]
            for p in pieces[1:]:
                dups = dups.unionByName(p)
            (
                dups.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(out_dir)
            )
            for frame, path in ((bk, bands_path), (mh, sigs_path)):
                (
                    frame.withColumn("batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("batch_id")
                    .parquet(path)
                )
        finally:
            mh.unpersist()

    return process


def neardup_stream(
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
    process = make_neardup_batch_processor(store_dir, out_dir, **kwargs)
    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
