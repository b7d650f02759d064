"""Streaming exact deduplication — the ingest-time half of the corpus
dedup story (extension surface; the reference is strictly batch,
SURVEY.md §2.9).

A training-data ingest stream should drop exact re-crawls *as documents
arrive*, not in a nightly batch: ``dropDuplicatesWithinWatermark`` on the
content hash keeps one row per distinct payload while the watermark bounds
the dedup state (a true unbounded ``dropDuplicates`` would grow state
forever on an infinite stream — the watermark is what makes the operator
deployable).

Semantics: within any event-time horizon shorter than the watermark delay,
the stream emits exactly the batch-distinct set; duplicates farther apart
than the watermark MAY be re-emitted (state for their hash has been
reclaimed).  That is the documented contract of bounded-state streaming
dedup, and the batch twin (:func:`dedup_batch`) + the delta between them is
what tests pin down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_content_hash(
    docs: DataFrame, text_col: str = "text", out_col: str = "content_hash"
) -> DataFrame:
    """64-bit content identity for exact dedup — xxhash64 of the raw text
    (cheap, JVM-side); collisions at 2^-64 are acceptable for dedup and a
    pipeline can swap in sha2 at the same call site."""
    return docs.withColumn(out_col, F.xxhash64(F.col(text_col)))


def dedup_stream(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: first arrival of each content hash within
    the watermark horizon survives.  Works identically on a batch frame
    (where it degenerates to plain dropDuplicates) so stream==batch parity
    is testable on one code path."""
    hashed = with_content_hash(docs, text_col)
    if docs.isStreaming:
        return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    return hashed.dropDuplicates(["content_hash"])


def dedup_batch(docs: DataFrame, ts_col: str = "ts", text_col: str = "text") -> DataFrame:
    """Batch twin: keep the earliest arrival per content hash (ties broken
    by the full row ordering so the result is deterministic)."""
    from pyspark.sql import Window

    hashed = with_content_hash(docs, text_col)
    order_cols = [F.col(ts_col)] + [F.col(c) for c in docs.columns if c != ts_col]
    w = Window.partitionBy("content_hash").orderBy(*order_cols)
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
