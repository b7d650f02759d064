"""Runnable end-to-end TRAINING-DATA pipeline over the local testdata —
the extension surface beyond the reference's demo (examples/demo.py):

    ingest → normalize → quality/repetition gates → exact dedup →
    span decontamination → token budget → sharded export
    + corpus monitoring (novelty, Zipf health, drift, changepoints).

    python examples/pipeline_demo.py [sf_dir]   # default /root/testdata/sf0.001

Every stage is deterministic (md5 draws, fixed thresholds), so rerunning
prints byte-identical survivors.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from datalake_indexes_spark.session import get_spark  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark("training-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))

    print("== 1. curate (normalize → gates → dedup), with funnel census ==")
    from datalake_indexes_spark.pipelines.curation import drop_audit, run_curation

    stages = [
        {"stage": "normalize"},
        {"stage": "quality_min", "min_score": 0.5},
        {"stage": "max_repetition", "max_frac": 0.2},
        {"stage": "dedup_exact"},
    ]
    res = run_curation(docs, stages)
    res.census.show(truncate=False)

    print("== 2. why did each dropped doc die? (drop audit, first 10) ==")
    drop_audit(docs, stages).filter(F.col("dropped_at") != "survived").orderBy(
        "doc_id"
    ).show(10, truncate=False)

    print("== 3. corpus health: novelty + Zipf fit ==")
    from datalake_indexes_spark.operators.dedup import doc_novelty
    from datalake_indexes_spark.operators.text_analysis import zipf_fit

    doc_novelty(res.docs).agg(
        F.round(F.avg("novel_frac"), 4).alias("mean_novelty"),
        F.count(F.lit(1)).alias("docs"),
    ).show()
    zipf_fit(res.docs).show()

    print("== 4. select to a token budget and export shards ==")
    from datalake_indexes_spark.operators.text_analysis import (
        budget_select,
        quality_scores,
        token_counts,
    )
    from datalake_indexes_spark.sources.export import export_jsonl_shards

    scored = (
        res.docs.join(
            quality_scores(res.docs).select("doc_id", "quality_score"), "doc_id"
        ).join(
            token_counts(res.docs).select(
                "doc_id", F.col("n_ws_tokens").alias("n_tokens")
            ),
            "doc_id",
        )
    )
    picked = budget_select(scored, 20_000)
    print(f"   selected {picked.count()} docs within the 20k-token budget")
    out = tempfile.mkdtemp(prefix="pipeline_demo_shards_")
    manifest = export_jsonl_shards(
        res.docs.join(picked.select("doc_id"), "doc_id"), out, n_shards=4
    )
    manifest.show(truncate=False)
    print(f"   shards under {out}")

    print("== 5. monitoring: drift + changepoints over the event stream ==")
    from datalake_indexes_spark.operators.events import cusum_changepoints

    ev = events.withColumn(
        "ts_us",
        F.expr("(ts - pmod(ts, 1000)) div 1000")
        if dict(events.dtypes)["ts"] == "bigint"
        else F.expr(
            "timestampdiff(MICROSECOND, timestamp_ntz '1970-01-01 00:00:00', ts)"
        ).cast("long"),
    )
    cusum_changepoints(ev).orderBy("event_type").show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
