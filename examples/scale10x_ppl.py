"""10x CCNet-bucketing exercise (round 9): exact per-source ntile vs
the approx Greenwald-Khanna threshold tier at 1x and 10x document
volume over the sf0.1 documents.

What the row must show: the approx tier's advantage GROWS with volume
— the exact tier sorts every source's (doc_id, score) rows inside a
window, so its cost tracks n·log(n) per source, while the approx tier
replaces the sort with one sketch aggregate (rank error <= n/accuracy)
plus a broadcast join, both shuffle-linear.  Both tiers share the KN
scoring prefix, so the DELTA between them isolates the bucketing step.
Agreement is also gauged: fraction of docs assigned the same band by
both tiers (ties and rank error make it <1.0 by contract, not by bug).

Synthesis: the rotated-copy idiom (content rewritten per copy, word
population preserved), sources inherited from the base docs.

Writes nothing outside /tmp.  Run:  python examples/scale10x_ppl.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def scaled_docs(spark, factor: int):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    parts = [docs]
    for k in range(1, factor):
        rot = 7 * k
        parts.append(
            docs.select(
                (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
                F.expr(
                    f"concat(substring(text, {rot + 1}), substring(text, 1, {rot}))"
                ).alias("text"),
                "source",
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def bucketing_only(spark, n_rows: int, n_sources: int = 8):
    """Isolate the BUCKETING stage (both tiers share the KN scoring
    prefix, which dominates end-to-end at sf0.1 scale): a synthetic
    pre-scored (doc_id, source, score) frame, exact per-source ntile vs
    GK thresholds + broadcast join, timed separately."""
    from pyspark.sql import Window

    scored = spark.range(n_rows).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % n_sources)).alias("source"),
        (F.sin(F.col("id").cast("double")) * 7.0).alias("score"),
    ).localCheckpoint()
    scored.count()

    def exact():
        w = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("doc_id"))
        return scored.select("doc_id", F.ntile(3).over(w).alias("b"))

    def approx():
        thr = scored.groupBy("source").agg(
            F.percentile_approx("score", F.lit([1 / 3, 2 / 3]), F.lit(10000)).alias("__t")
        )
        s = F.col("score")
        return scored.join(F.broadcast(thr), "source").select(
            "doc_id",
            (F.lit(1) + F.size(F.filter("__t", lambda t: s <= t))).alias("b"),
        )

    def force(df):
        # count() would let Catalyst PRUNE the bucket column (and with it
        # the whole window) — aggregate over it so the work is real
        return df.agg(F.sum("b")).collect()[0][0]

    walls = {}
    for label, fn in (("exact", exact), ("approx", approx)):
        force(fn())  # warm
        t0 = time.time()
        force(fn())
        walls[label] = round(time.time() - t0, 2)
    return walls


def main() -> None:
    from datalake_indexes_spark.operators.text_analysis import ppl_buckets
    from datalake_indexes_spark.session import get_spark

    spark = get_spark("scale10x-ppl")
    spark.sparkContext.setLogLevel("ERROR")

    for n in (500_000, 5_000_000, 50_000_000):
        w = bucketing_only(spark, n)
        print(
            json.dumps(
                {
                    "stage": "bucketing_only",
                    "n_rows": n,
                    "exact_s": w["exact"],
                    "approx_s": w["approx"],
                    "speedup": round(w["exact"] / max(w["approx"], 1e-9), 2),
                }
            )
        )

    for factor in (1, 10):
        docs = scaled_docs(spark, factor)
        docs = docs.localCheckpoint()  # both tiers read identical input
        n = docs.count()
        walls = {}
        frames = {}
        for label, approx in (("exact", False), ("approx", True)):
            fn = lambda: ppl_buckets(docs, n_buckets=3, approx=approx)  # noqa: E731
            fn().count()  # warm (JIT, page cache)
            t0 = time.time()
            out = fn()
            out.count()
            walls[label] = round(time.time() - t0, 2)
            frames[label] = out
        agree = (
            frames["exact"]
            .select("doc_id", "band")
            .join(
                frames["approx"].select(
                    "doc_id", F.col("band").alias("band2")
                ),
                "doc_id",
            )
            .filter(F.col("band") == F.col("band2"))
            .count()
        )
        scored = frames["exact"].count()
        print(
            json.dumps(
                {
                    "factor": factor,
                    "n_docs": n,
                    "exact_s": walls["exact"],
                    "approx_s": walls["approx"],
                    "speedup": round(walls["exact"] / walls["approx"], 2),
                    "band_agreement": round(agree / max(1, scored), 4),
                }
            )
        )


if __name__ == "__main__":
    main()
