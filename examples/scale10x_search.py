"""10x scale exercise for the text-search family (round 8): the
offline-build / online-probe lifecycle of ``build_text_index`` with the
positional layer, measured at 1x and 10x the sf0.1 documents table.

Claims under test (operators/search.py docstrings):

- build cost (explode + (doc, term) aggregate + term-sorted write)
  grows ~linearly with the corpus — one shuffle, no spill;
- a BM25 probe's cost scales with the probed terms' POSTING-LIST
  length, not corpus size: the scan's input bytes must stay a small
  fraction of the total postings bytes at both scales (term-sorted row
  groups + IN-list pushdown), and wall must grow far slower than 10x;
- the positional MinCover probe (new streaming-parity surface this
  round) keeps the same shape: position payloads live in a separate
  file, the doc-keyed window sees only probed-term occurrences.

Corpus synthesis: the rotated-copy idiom of scale10x_exercise.py —
each copy rewrites shingles but keeps the WORD population, so posting
lists genuinely grow ~10x (the stress) while doc ids stay unique.

Writes nothing outside /tmp.  Run:  python examples/scale10x_search.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/scale10x_search"
TERMS = ["data", "model", "training"]


def scaled_docs(spark, factor: int):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    if factor == 1:
        return docs
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
    df = parts[0].select("doc_id", "text")
    for p in parts[1:]:
        df = df.unionByName(p)
    path = f"{OUT}/documents_{factor}x.parquet"
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _tree_mb(path: str) -> float:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return round(total / 1e6, 2)


def main() -> None:
    from datalake_indexes_spark.operators.search import (
        bm25_topk_indexed,
        build_text_index,
        proximity_topk_indexed,
    )
    from datalake_indexes_spark.plans.runtime import runtime_report_of
    from datalake_indexes_spark.session import get_spark

    spark = get_spark("scale10x-search")
    spark.sparkContext.setLogLevel("ERROR")

    for factor in (1, 10):
        docs = scaled_docs(spark, factor)
        idx = f"{OUT}/idx_{factor}x"
        # min-of-2 builds: the first 1x build absorbs JIT warm-up, which
        # otherwise makes 10x look FASTER than 1x at these sizes
        build_runs = []
        for _ in range(2):
            t0 = time.time()
            build_text_index(docs, idx, positional=True)
            build_runs.append(time.time() - t0)
        build_s = round(min(build_runs), 2)
        postings_mb = _tree_mb(os.path.join(idx, "postings"))
        positions_mb = _tree_mb(os.path.join(idx, "positions"))

        bm25 = runtime_report_of(
            lambda: bm25_topk_indexed(spark, idx, TERMS, k=10),
            spark,
            min_stage_ms=50,
        )
        prox = runtime_report_of(
            lambda: proximity_topk_indexed(spark, idx, TERMS, k=10),
            spark,
            min_stage_ms=50,
        )
        print(
            json.dumps(
                {
                    "factor": factor,
                    "build_s": build_s,
                    "postings_mb": postings_mb,
                    "positions_mb": positions_mb,
                    "bm25_probe": {
                        "wall_s": bm25.get("wall_s"),
                        "input_mb": round(
                            sum(s.get("input_mb", 0) for s in bm25.get("stages", [])),
                            2,
                        ),
                        "spill_mb": bm25.get("spill_mb"),
                        "max_task_skew": bm25.get("max_task_skew"),
                    },
                    "proximity_probe": {
                        "wall_s": prox.get("wall_s"),
                        "input_mb": round(
                            sum(s.get("input_mb", 0) for s in prox.get("stages", [])),
                            2,
                        ),
                        "spill_mb": prox.get("spill_mb"),
                        "max_task_skew": prox.get("max_task_skew"),
                    },
                }
            )
        )


if __name__ == "__main__":
    main()
