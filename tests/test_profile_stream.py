"""Streaming sketch-profile maintenance (streaming/profile_stream.py):
stream == batch parity of the HLL roll-up (register-exact sketch merge),
retry idempotency, and an availableNow file-stream run end to end."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from datalake_indexes_spark.streaming.profile_stream import (
    make_profile_batch_processor,
    profile_batch,
    profile_estimate,
    profile_stream,
)

KEYS = ["grp"]


def _rows(spark):
    rows = []
    for i in range(300):
        rows.append(("a" if i % 3 else "b", float(i % 50)))
    rows.append(("a", None))
    return spark.createDataFrame(rows, "grp string, v double")


def _norm(rows):
    out = []
    for r in rows:
        out.append(
            (
                r["grp"],
                int(r["n_distinct"]),
                r["n"],
                r["n_null"],
                r["min_v"],
                r["max_v"],
                round(r["mean_v"], 9) if r["mean_v"] is not None else None,
            )
        )
    return sorted(out)


def test_stream_partials_match_batch_profile(spark):
    df = _rows(spark).withColumn("__i", F.monotonically_increasing_id())
    work = tempfile.mkdtemp(prefix="profstream_")
    try:
        process = make_profile_batch_processor(f"{work}/prof", KEYS, "v")
        # three uneven batches
        process(df.filter(F.col("__i") % 3 == 0).drop("__i"), 0)
        process(df.filter(F.col("__i") % 3 == 1).drop("__i"), 1)
        process(df.filter(F.col("__i") % 3 == 2).drop("__i"), 2)
        got = _norm(profile_estimate(spark, f"{work}/prof", KEYS).collect())
        want = _norm(profile_batch(_rows(spark), KEYS, "v").collect())
        # HLL merge is register-exact: union of batch sketches == one-shot
        # sketch, so the two sides agree on every field, not within-epsilon
        assert got == want
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_estimate_is_accurate_and_moments_exact(spark):
    work = tempfile.mkdtemp(prefix="profacc_")
    try:
        process = make_profile_batch_processor(f"{work}/prof", KEYS, "v")
        process(_rows(spark), 0)
        got = {r["grp"]: r for r in profile_estimate(spark, f"{work}/prof", KEYS).collect()}
        # moments are exact sums/extrema
        assert got["a"]["n"] == 201 and got["b"]["n"] == 100
        assert got["a"]["n_null"] == 1 and got["b"]["n_null"] == 0
        assert got["a"]["min_v"] == 0.0 and got["a"]["max_v"] == 49.0
        # 50 distinct non-null values (+1 null bucket at most): HLL++ at
        # default lgConfigK is exact far beyond this cardinality
        assert abs(got["a"]["n_distinct"] - 50) <= 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_retried_batch_is_idempotent(spark):
    df = _rows(spark).withColumn("__i", F.monotonically_increasing_id())
    work = tempfile.mkdtemp(prefix="profretry_")
    try:
        process = make_profile_batch_processor(f"{work}/prof", KEYS, "v")
        process(df.filter(F.col("__i") % 2 == 0).drop("__i"), 0)
        process(df.filter(F.col("__i") % 2 == 1).drop("__i"), 1)
        once = _norm(profile_estimate(spark, f"{work}/prof", KEYS).collect())
        process(df.filter(F.col("__i") % 2 == 1).drop("__i"), 1)  # replay
        twice = _norm(profile_estimate(spark, f"{work}/prof", KEYS).collect())
        assert once == twice
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_available_now_file_stream(spark):
    df = _rows(spark)
    work = tempfile.mkdtemp(prefix="proffiles_")
    try:
        df.write.parquet(f"{work}/in")
        q = profile_stream(
            spark, f"{work}/in", df.schema, f"{work}/prof", f"{work}/ckpt", KEYS, "v"
        )
        q.awaitTermination(120)
        got = _norm(profile_estimate(spark, f"{work}/prof", KEYS).collect())
        want = _norm(profile_batch(df, KEYS, "v").collect())
        assert got == want
    finally:
        shutil.rmtree(work, ignore_errors=True)
