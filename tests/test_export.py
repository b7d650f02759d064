"""Sharded export sinks (sources/export.py): content-addressed shard
assignment, JSONL round-trip, byte-stable tar shards, manifest integrity."""

from __future__ import annotations

import os
import tarfile

from pyspark.sql import functions as F

from datalake_indexes_spark.sources.export import (
    export_jsonl_shards,
    export_tar_shards,
    shard_id_col,
    shard_manifest,
)


def _docs(spark, n=60):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id").cast("string")).alias("text"),
        (F.length(F.concat(F.lit("text-"), F.col("id").cast("string")))).alias(
            "n_chars"
        ),
    )


def test_shard_assignment_is_content_addressed(spark):
    """Same ids -> same shards regardless of row order / partitioning."""
    a = _docs(spark).select("doc_id", shard_id_col("doc_id", 8).alias("s"))
    b = (
        _docs(spark)
        .orderBy(F.desc("doc_id"))
        .repartition(7)
        .select("doc_id", shard_id_col("doc_id", 8).alias("s"))
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_jsonl_round_trip_and_manifest(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "jsonl")
    manifest = export_jsonl_shards(docs, out, n_shards=4)
    rows = manifest.collect()
    # exactly one file per non-empty shard, counts reconcile to the input
    assert all(r["n_files"] == 1 for r in rows)
    assert sum(r["n_rows"] for r in rows) == 60
    # manifest row counts agree with the pre-flight census
    census = {r["shard_id"]: r["n_docs"] for r in shard_manifest(docs, 4).collect()}
    assert {r["shard_id"]: r["n_rows"] for r in rows} == census
    # read-back equals input (shard_id is a partition column on read)
    back = spark.read.json(out).select("doc_id", "text", "n_chars")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))


def test_tar_shards_round_trip_and_byte_stability(spark, tmp_path):
    payloads = spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.encode(F.concat(F.lit("payload-"), F.col("id").cast("string")), "utf-8").alias(
            "payload"
        ),
        F.concat(F.col("id").cast("string"), F.lit(".txt")).alias("member_name"),
    )
    out1, out2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    m1 = export_tar_shards(payloads, out1, n_shards=3).collect()
    m2 = export_tar_shards(payloads, out2, n_shards=3).collect()
    assert sum(r["n_members"] for r in m1) == 20
    # byte-stable re-export: zeroed headers + deterministic member order
    for r in m1:
        f1 = os.path.join(out1, f"shard-{r['shard_id']:05d}.tar")
        f2 = os.path.join(out2, f"shard-{r['shard_id']:05d}.tar")
        assert open(f1, "rb").read() == open(f2, "rb").read()
        assert os.path.getsize(f1) == r["n_bytes"]
    assert [tuple(r) for r in m1] == [tuple(r) for r in m2]
    # members decode back to the original payloads
    seen = {}
    for r in m1:
        with tarfile.open(os.path.join(out1, f"shard-{r['shard_id']:05d}.tar")) as tf:
            for mem in tf.getmembers():
                seen[mem.name] = tf.extractfile(mem).read()
    assert len(seen) == 20
    assert seen["7.txt"] == b"payload-7"


def test_export_plan_one_shuffle(spark):
    """The shard layout is exactly one repartition of the corpus."""
    frame = _docs(spark).withColumn("shard_id", shard_id_col("doc_id", 4))
    plan = (
        frame.repartition(4, "shard_id")
        .sortWithinPartitions("shard_id", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1


def test_incremental_export_skips_unchanged_shards(spark, tmp_path):
    from datalake_indexes_spark.sources.export import (
        export_jsonl_shards_incremental,
    )

    out = str(tmp_path / "inc")
    docs = _docs(spark)
    m1 = export_jsonl_shards_incremental(docs, out, n_shards=4)
    assert {r["status"] for r in m1.collect()} == {"written"}

    def shard_mtimes():
        return {
            e: os.path.getmtime(os.path.join(out, e))
            for e in os.listdir(out)
            if e.startswith("shard_id=")
        }

    before = shard_mtimes()
    # identical corpus -> nothing rewritten, directories untouched
    m2 = export_jsonl_shards_incremental(docs, out, n_shards=4)
    assert {r["status"] for r in m2.collect()} == {"unchanged"}
    assert shard_mtimes() == before

    # same-size edit of ONE document -> exactly that doc's shard rewritten
    changed = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 7, F.lit("text-X")).otherwise(F.col("text")),
    )
    m3 = {r["shard_id"]: r["status"] for r in export_jsonl_shards_incremental(
        changed, out, n_shards=4
    ).collect()}
    from datalake_indexes_spark.sources.export import shard_id_col

    hit = docs.filter(F.col("doc_id") == 7).select(
        shard_id_col("doc_id", 4).alias("s")
    ).collect()[0]["s"]
    assert m3[hit] == "written"
    assert all(v == "unchanged" for k, v in m3.items() if k != hit)
    after = shard_mtimes()
    assert after[f"shard_id={hit}"] != before[f"shard_id={hit}"]
    assert all(
        after[k] == before[k] for k in before if k != f"shard_id={hit}"
    )
    # read-back reflects the edit
    back = spark.read.json(out)
    assert back.filter(F.col("doc_id") == 7).collect()[0]["text"] == "text-X"
    assert back.count() == 60


def test_balanced_shards_mass_balance(spark):
    """Shards carry near-equal weight (within one max-doc of the target)
    and assignment is contiguous in id order."""
    from datalake_indexes_spark.sources.export import assign_balanced_shards

    rows = [(i, 10 + (i % 7) * 5) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = assign_balanced_shards(df, n_shards=4).collect()
    total = sum(w for _, w in rows)
    target = (total + 3) // 4
    max_w = max(w for _, w in rows)
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for sid, members in by_shard.items():
        mass = sum(m["weight"] for m in members)
        if sid < 3:
            assert target <= mass <= target + max_w
    # contiguity: shard id is monotone in doc_id
    ordered = sorted(out, key=lambda r: r["doc_id"])
    sids = [r["shard_id"] for r in ordered]
    assert sids == sorted(sids)
    # every doc assigned exactly once, cum_weight is the true prefix sum
    assert len(out) == 200
    run = 0
    for r in ordered:
        run += r["weight"]
        assert r["cum_weight"] == run


def test_balanced_shards_empty_and_giant_doc(spark):
    from datalake_indexes_spark.sources.export import assign_balanced_shards

    empty = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert assign_balanced_shards(empty, n_shards=4).count() == 0
    # one doc heavier than the target still lands in exactly one shard
    df = spark.createDataFrame(
        [(0, 1000), (1, 1), (2, 1)], "doc_id long, n_tokens long"
    )
    out = {r["doc_id"]: r["shard_id"] for r in
           assign_balanced_shards(df, n_shards=2).collect()}
    assert out[0] == 0 and out[1] == 1 and out[2] == 1


def test_balanced_shards_hash_range_ids_no_overflow(spark):
    """64-bit hash-derived doc ids spanning most of the signed range
    (negative to positive): bucketization must stay monotone in id with
    no long overflow — cum_weight is the exact prefix sum over id order
    and shards remain contiguous."""
    from datalake_indexes_spark.sources.export import assign_balanced_shards

    ids = [
        -(2**62) - 7, -(2**61), -12345, -1, 0, 999,
        2**60, 2**61 + 3, 2**62, 2**62 + 11,
    ]
    df = spark.createDataFrame(
        [(i, 10 + j) for j, i in enumerate(ids)], "doc_id long, n_tokens long"
    )
    out = sorted(
        (r["doc_id"], r["cum_weight"], r["shard_id"])
        for r in assign_balanced_shards(df, n_shards=3).collect()
    )
    # exact running sum over ascending id order
    run = 0
    want_cum = []
    for j, i in enumerate(sorted(range(len(ids)), key=lambda j: ids[j])):
        run += 10 + i
        want_cum.append(run)
    assert [c for _, c, _ in out] == want_cum
    # shards are contiguous in id order and non-decreasing
    shards = [s for _, _, s in out]
    assert shards == sorted(shards)
    assert 0 <= min(shards) and max(shards) <= 2


def test_incremental_export_removes_vanished_shards(spark, tmp_path):
    """A shard whose documents ALL disappear (blocklist tightening,
    fewer shards) must be deleted and reported — dynamic overwrite
    alone would leave its stale file shipping removed docs forever."""
    import glob
    import json

    from datalake_indexes_spark.sources.export import (
        export_jsonl_shards_incremental,
        shard_id_col,
    )

    out = str(tmp_path / "delivery")
    docs = spark.range(60).selectExpr("id as doc_id", "concat('t', id) as text")
    export_jsonl_shards_incremental(docs, out, n_shards=4)

    # find a real shard's doc set and drop exactly those docs
    sid = 2
    survivors = docs.filter(shard_id_col("doc_id", 4) != sid)
    n_kept = survivors.count()
    assert 0 < n_kept < 60

    status = {
        r["shard_id"]: r["status"]
        for r in export_jsonl_shards_incremental(survivors, out, n_shards=4).collect()
    }
    assert status[sid] == "removed"
    assert not glob.glob(f"{out}/shard_id={sid}/*")
    # delivery now holds exactly the survivors
    back = spark.read.json(f"{out}/shard_id=*")
    assert back.count() == n_kept
    # manifest no longer lists the vanished shard
    with open(f"{out}/_MANIFEST.json") as fh:
        assert sid not in {m["shard_id"] for m in json.load(fh)}
