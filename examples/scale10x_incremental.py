"""10x scale exercise for the prefix-filtered exact Jaccard join and the
Bloom-prefiltered incremental dedup, measured at sf0.1 (1x) and at the
same synthesized 10x corpus as examples/scale10x_exercise.py, through the
measured stage profile (wall, shuffle bytes, spill, task skew).

Expected shapes: the prefix join's candidate volume tracks genuine
near-dup pair volume (the rotation plant makes short docs form exact
10-cliques at 10x, same as minhash's exercise) — shuffle grows with
pairs, skew stays flat because the hot boilerplate shingles sort OUT of
prefixes.  Incremental dedup splits the scaled corpus 80/20 into
history/increment: history-side cost is one scan + the m-bounded probe
distinct, so wall should grow far slower than 10x.

Run:  python examples/scale10x_incremental.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from examples.scale10x_exercise import (  # noqa: E402
    FACTOR,
    OUT,
    scaled_docs,
    trimmed,
)


def q_prefix_join(spark, docs):
    from datalake_indexes_spark.operators.dedup import prefix_jaccard_pairs

    return prefix_jaccard_pairs(docs, threshold=0.8)


def q_incremental(spark, docs):
    from datalake_indexes_spark.operators.dedup import incremental_new_docs

    hist = docs.filter(F.col("doc_id") % 5 != 0)
    inc = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", "text")
    return incremental_new_docs(hist, inc)


def main() -> None:
    from datalake_indexes_spark.plans.runtime import runtime_report_of
    from datalake_indexes_spark.session import get_spark

    spark = get_spark("scale10x-incremental")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)

    docs1 = scaled_docs(spark, 1)
    docs10 = scaled_docs(spark, FACTOR)

    results: dict[str, dict] = {}
    for name, fn in [
        ("dedup_prefix_join", q_prefix_join),
        ("dedup_incremental", q_incremental),
    ]:
        results[name] = {
            "1x": trimmed(
                runtime_report_of(lambda: fn(spark, docs1), spark, min_stage_ms=50)
            ),
            f"{FACTOR}x": trimmed(
                runtime_report_of(lambda: fn(spark, docs10), spark, min_stage_ms=50)
            ),
        }
        print(name, json.dumps(results[name]), flush=True)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
