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


def main() -> None:
    from datalake_indexes_spark.operators.text_analysis import ppl_buckets
    from datalake_indexes_spark.session import get_spark

    spark = get_spark("scale10x-ppl")
    spark.sparkContext.setLogLevel("ERROR")

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
