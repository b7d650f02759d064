"""10x QUERY-BATCH scale exercise for the executor-side MMR greedy
(round-8 task: the r7 verdict's driver-side nit, fixed this round).

The old implementation collected <= candidates + candidates^2 rows PER
QUERY to the driver — bounded per query, linear in the query-batch
size.  The rewrite runs the greedy as groupBy(query_id).applyInPandas,
so driver memory is flat and queries parallelize across executors.
This exercise measures mmr_topk at 1x (50 queries) and 10x (500
queries) over the sf0.1 embeddings through plans/runtime.py's measured
stage profile.  Evidence sought: near-linear wall growth, zero spill,
flat task skew — and structurally, the same stage count at both sizes
(the greedy adds no per-query jobs).

Writes nothing outside /tmp.  Run:  python examples/scale10x_mmr.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from datalake_indexes_spark.operators.similarity import mmr_topk
    from datalake_indexes_spark.plans.runtime import runtime_report_of
    from datalake_indexes_spark.session import get_spark

    spark = get_spark("scale10x-mmr")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    for n_queries in (50, 500):
        queries = emb.filter(F.col("vec_id") < n_queries)
        rep = runtime_report_of(
            lambda: mmr_topk(emb, queries, k=8, candidates=50),
            spark,
            min_stage_ms=50,
        )
        print(
            json.dumps(
                {
                    "n_queries": n_queries,
                    "wall_s": rep.get("wall_s"),
                    "n_stages": rep.get("n_stages"),
                    "shuffle_read_mb": rep.get("shuffle_read_mb"),
                    "spill_mb": rep.get("spill_mb"),
                    "max_task_skew": rep.get("max_task_skew"),
                }
            )
        )


if __name__ == "__main__":
    main()
