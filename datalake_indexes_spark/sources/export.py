"""Sharded training-corpus export sinks (extension surface — the
reference materializes enriched tables back into PostgreSQL; a training
pipeline instead delivers the curated corpus as fixed-count shards that a
data loader streams: JSONL shards for text, WebDataset-style tar shards
for binary/multimodal payloads).

Shard assignment is content-addressed — the same pure ``md5(id)`` bucket
rule :func:`..operators.text_analysis.hash_split` uses — so a document
lands in the same shard on every engine, run, and input partitioning,
and re-exports after upstream re-shuffles are byte-stable.  Each shard
is forced into exactly one task (``repartition(n_shards, shard_id)``)
so the writer emits exactly one file per shard with rows in a
deterministic id order; at 100 TB that is one shuffle of the corpus,
identical to any other single-key repartition, and shard skew is the
md5 uniformity (±O(√(n/shards))), not data skew.

File-size manifests walk the written directory with ``os`` — correct on
local and NFS-style cluster filesystems; object-store deployments should
swap the walk for their store's list API (the data path is unchanged).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_indexes_spark.functions.hashes import md5_bucket


def shard_id_col(id_col: str, n_shards: int) -> F.Column:
    """Deterministic engine-independent shard id: md5 bucket mod n."""
    return md5_bucket(id_col, n_shards).cast("int")


def shard_manifest(
    df: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    chars_col: str = "n_chars",
) -> DataFrame:
    """(shard_id, n_docs, n_chars) — the pre-flight census of a sharded
    export (what lands where, before paying the write).  One hash
    aggregate over ``n_shards`` keys."""
    return (
        df.select(
            shard_id_col(id_col, n_shards).alias("shard_id"), F.col(chars_col)
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(chars_col).cast("long").alias("n_chars"),
        )
    )


def _one_task_per_shard(df: DataFrame, n_shards: int, id_col: str) -> DataFrame:
    return (
        df.withColumn("shard_id", shard_id_col(id_col, n_shards))
        .repartition(n_shards, "shard_id")
        .sortWithinPartitions("shard_id", id_col)
    )


def export_jsonl_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Write ``df`` as ``shard_id=K/part-*.json`` — one JSONL file per
    shard, rows ordered by id — and return the post-write manifest
    (shard_id, n_rows, n_bytes, n_files) read back from disk.

    The manifest is computed from the WRITTEN files (count from a
    read-back scan, bytes from the filesystem), not from the input frame,
    so it doubles as a write-integrity check.
    """
    spark = df.sparkSession
    _one_task_per_shard(df, n_shards, id_col).write.mode("overwrite").partitionBy(
        "shard_id"
    ).json(path)
    counts = (
        spark.read.json(path)
        .groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    sizes = []
    for entry in os.listdir(path):
        if not entry.startswith("shard_id="):
            continue
        sid = int(entry.split("=", 1)[1])
        files = [
            f
            for f in os.listdir(os.path.join(path, entry))
            if not f.startswith(("_", "."))
        ]
        nbytes = sum(
            os.path.getsize(os.path.join(path, entry, f)) for f in files
        )
        sizes.append((sid, nbytes, len(files)))
    size_df = spark.createDataFrame(
        sizes, "shard_id int, n_bytes long, n_files int"
    )
    return counts.join(F.broadcast(size_df), "shard_id").orderBy("shard_id")


def export_tar_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 4,
    payload_col: str = "payload",
    name_col: str = "member_name",
    id_col: str = "doc_id",
) -> DataFrame:
    """WebDataset-style tar shard export for binary/multimodal payloads:
    ``shard-000KK.tar`` with one member per row, members in id order,
    byte-stable headers (mtime/uid/gid zeroed) so a re-export of the same
    corpus produces identical tar bytes.

    Runs as ``mapInPandas`` over the one-task-per-shard layout — each
    task streams its Arrow batches straight into its tarfile, so driver
    memory holds nothing and executor memory holds one batch.  Returns
    (shard_id, n_members, n_bytes) collected from the writer tasks
    themselves (no post-write scan needed for tars).
    """
    import io
    import tarfile

    os.makedirs(path, exist_ok=True)

    def write_shards(batches):
        import pandas as pd

        tf = None
        sid = None
        n = 0

        def close_current():
            nonlocal tf, sid, n
            if tf is not None:
                tf.close()
                fname = os.path.join(path, f"shard-{sid:05d}.tar")
                yield pd.DataFrame(
                    {
                        "shard_id": [sid],
                        "n_members": [n],
                        "n_bytes": [os.path.getsize(fname)],
                    }
                )
                tf, sid, n = None, None, 0

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                row_sid = int(getattr(row, "shard_id"))
                if sid != row_sid:
                    yield from close_current()
                    sid = row_sid
                    tf = tarfile.open(
                        os.path.join(path, f"shard-{sid:05d}.tar"), "w"
                    )
                payload = bytes(getattr(row, payload_col))
                info = tarfile.TarInfo(name=str(getattr(row, name_col)))
                info.size = len(payload)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(payload))
                n += 1
        yield from close_current()

    frame = _one_task_per_shard(
        df.select(F.col(id_col), F.col(payload_col), F.col(name_col)),
        n_shards,
        id_col,
    )
    manifest = frame.mapInPandas(
        write_shards, schema="shard_id int, n_members long, n_bytes long"
    )
    # the action below runs the writers; collect the tiny manifest once
    rows = manifest.collect()
    return df.sparkSession.createDataFrame(
        rows or [], "shard_id int, n_members long, n_bytes long"
    ).orderBy("shard_id")


# ---------------------------------------------------------------------------
# Incremental (fingerprint-gated) export
# ---------------------------------------------------------------------------

FINGERPRINT_MODULUS = 1_000_000_007  # keeps per-shard sums far from int64
# overflow (ANSI mode throws on overflow): ~9e9 rows/shard headroom.


def row_fingerprint_col(cols: list[str]) -> F.Column:
    """Order-independent-summable per-row content hash, engine-portable
    (md5 prefix as int, mod a prime) — the same cross-engine idiom as the
    hash_split bucket, widened to all content columns."""
    parts = [F.col(c).cast("string") for c in cols]
    h = F.conv(F.substring(F.md5(F.concat_ws("|", *parts)), 1, 15), 16, 10).cast(
        "long"
    )
    return h % FINGERPRINT_MODULUS


def shard_fingerprints(
    df: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    cols: list[str] | None = None,
) -> DataFrame:
    """(shard_id, n_docs, fingerprint) — an order-independent content
    fingerprint per shard (sum of per-row hashes), the change-detection
    census incremental export diffs against.  One hash aggregate; a
    same-size edit still flips the fingerprint."""
    cols = cols or [c for c in df.columns]
    return (
        df.select(
            shard_id_col(id_col, n_shards).alias("shard_id"),
            row_fingerprint_col(cols).alias("__fp"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__fp").cast("long").alias("fingerprint"),
        )
    )


def export_jsonl_shards_incremental(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    cols: list[str] | None = None,
) -> DataFrame:
    """Re-export that only rewrites shards whose content changed since the
    last export — at 100 TB a refresh after touching 0.1% of documents
    rewrites ~0.1% of shards instead of the whole corpus.

    Mechanism: compute the shard fingerprint census (one aggregate over
    the corpus — the unavoidable read), diff it against the manifest the
    previous export left at ``path/_MANIFEST.json``, then write ONLY the
    changed/new shards via dynamic partition overwrite (each untouched
    ``shard_id=K`` directory keeps its bytes and mtime).  Returns
    (shard_id, n_docs, fingerprint, status) with status ∈
    {written, unchanged, removed} — removed rows mark shards whose
    documents all disappeared (leaf deleted; they vanish from the
    manifest).

    The manifest is n_shards rows — driver-side JSON by the same
    sanctioned-tiny-artifact rule as the version pointer in the
    snapshot sink.
    """
    import json

    manifest_path = os.path.join(path, "_MANIFEST.json")
    previous: dict[int, tuple[int, int]] = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            previous = {
                int(r["shard_id"]): (int(r["n_docs"]), int(r["fingerprint"]))
                for r in json.load(fh)
            }

    cols = cols or [c for c in df.columns]
    current = shard_fingerprints(df, n_shards, id_col, cols).collect()
    changed = [
        r["shard_id"]
        for r in current
        if previous.get(r["shard_id"]) != (r["n_docs"], r["fingerprint"])
    ]
    # a shard whose documents ALL disappeared is absent from the current
    # census, so diffing only current would never touch it: its stale
    # file would keep shipping deleted docs forever.  Dynamic overwrite
    # cannot delete a partition it receives no rows for — remove the
    # leaf directly and report it.
    vanished = sorted(set(previous) - {r["shard_id"] for r in current})
    for sid in vanished:
        shutil.rmtree(os.path.join(path, f"shard_id={sid}"), ignore_errors=True)

    if changed:
        (
            _one_task_per_shard(df, n_shards, id_col)
            .filter(F.col("shard_id").isin(changed))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("shard_id")
            .json(path)
        )

    os.makedirs(path, exist_ok=True)
    with open(manifest_path, "w") as fh:
        json.dump(
            [
                {
                    "shard_id": r["shard_id"],
                    "n_docs": r["n_docs"],
                    "fingerprint": r["fingerprint"],
                }
                for r in sorted(current, key=lambda r: r["shard_id"])
            ],
            fh,
        )
    spark = df.sparkSession
    changed_set = set(changed)
    return spark.createDataFrame(
        [
            (
                r["shard_id"],
                r["n_docs"],
                r["fingerprint"],
                "written" if r["shard_id"] in changed_set else "unchanged",
            )
            for r in sorted(current, key=lambda r: r["shard_id"])
        ]
        + [(sid, 0, 0, "removed") for sid in vanished],
        "shard_id int, n_docs long, fingerprint long, status string",
    )


def assign_balanced_shards(
    df: DataFrame,
    n_shards: int = 8,
    weight_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """(doc_id, weight, cum_weight, shard_id) — WEIGHT-balanced shard
    assignment: contiguous id ranges cut at multiples of
    ceil(total_weight / n_shards), so every shard carries ~the same token
    mass.  The md5 sharding of :func:`export_jsonl_shards` balances doc
    COUNTS; a training loader that steps by tokens wants shards balanced
    by tokens — long-document corpora can skew md5 shards by 2x+ in mass.

    The global running sum is the distributed two-level prefix sum (the
    budget_select pattern): value-range buckets over the numeric id are
    monotone in id, each bucket runs a local ordered window, and the
    n_buckets-row offset table is broadcast — no single-partition window.
    Assignment cuts on the EXCLUSIVE prefix (a straddling document joins
    the shard it starts in); one document heavier than the target still
    overflows its shard — atomic rows, documented.  Deterministic: the
    order is (id), the cuts are integer arithmetic.
    """
    from pyspark.sql.window import Window

    stats = df.agg(
        F.min(F.col(id_col)).alias("lo"),
        F.max(F.col(id_col)).alias("hi"),
        F.sum(F.col(weight_col).cast("long")).alias("total"),
    ).collect()[0]
    if stats["lo"] is None:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, weight long, cum_weight long, shard_id int"
        )
    lo, hi = int(stats["lo"]), int(stats["hi"])
    # bucket via DIVISION FIRST — (id - lo) * n_buckets overflows long
    # once the id span exceeds 2^63 / n_buckets (64-bit hash-derived
    # ids), and id - lo itself overflows when ids straddle more than
    # half the signed range.  id div width is overflow-free, monotone in
    # id (trunc division of longs by a positive literal), and yields at
    # most ~n_buckets + 2 distinct values over [lo, hi]; the Python-side
    # span/width arithmetic is exact (unbounded ints).
    span = max(hi - lo + 1, 1)
    width = max(span // n_buckets, 1)
    loq = -((-lo) // width) if lo < 0 else lo // width  # trunc, like div
    b = df.select(
        F.col(id_col), F.col(weight_col).cast("long").alias("__w")
    ).withColumn("__b", F.expr(f"`{id_col}` div {width}") - F.lit(loq))
    w_local = (
        Window.partitionBy("__b")
        .orderBy(F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = b.withColumn("__run", F.sum("__w").over(w_local))
    offsets = (
        b.groupBy("__b")
        .agg(F.sum("__w").alias("__tot"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__tot").over(
                    Window.orderBy("__b").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
    )
    total = int(stats["total"] or 0)
    target = max((total + n_shards - 1) // n_shards, 1)
    cum = F.col("__off") + F.col("__run")
    return (
        local.join(F.broadcast(offsets.select("__b", "__off")), "__b")
        .select(
            F.col(id_col),
            F.col("__w").alias("weight"),
            cum.cast("long").alias("cum_weight"),
            F.least(
                F.lit(n_shards - 1),
                ((cum - F.col("__w")) / F.lit(target)).cast("int"),
            ).alias("shard_id"),
        )
    )
