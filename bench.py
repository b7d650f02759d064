"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Runs the engine's flagship pipelines (MATE joinability search single/multi,
COCOA enrichment, duplicate detection, index build) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": <sf>}

Timing counts full materialization (``df.count()`` forces every stage; the
index build itself is timed separately as ``index_build`` and cached so each
query timing reflects query work, not re-ingestion — mirroring the
reference's offline-index-then-query lifecycle).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


HEADLINE = [
    "mate_join_search_single",
    "mate_join_search_multi",
    "cocoa_enrich",
    "dup_table_relations",
    "dedup_minhash_lsh",
    "dedup_exact",
    "ann_cosine_topk",
    "text_quality",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from datalake_indexes_spark.session import get_spark
    from datalake_indexes_spark.plans.queries import QUERIES, testdata_index

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # offline index build (both variants used by the queries), timed once
    t0 = time.time()
    idx = testdata_index(spark, sf_dir, with_super_keys=True)
    idx.cells.count()
    idx.row_keys.count()
    if idx.col_flags is not None:
        idx.col_flags.count()
    if idx.cells_keyed is not None:
        idx.cells_keyed.count()
    timings["index_build"] = round(time.time() - t0, 3)

    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        # min of 2 runs: the offline-index model means queries run against
        # a warm index; the first run can absorb lazy cache materialization
        # and host noise (observed ±35% on shared hardware)
        best = None
        for _ in range(2):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "datalake_indexes_spark headline queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
