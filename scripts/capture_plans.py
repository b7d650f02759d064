"""Capture .explain("formatted") for the bench queries -> plans/$SPARK_GRAFT_PLANS_ROUND/<q>_<tag>.txt (default r10).

Usage: python scripts/capture_plans.py <before|after> [query1,query2,...]

Runs against sf0.1 (the bench scale) so plan shapes (broadcast decisions,
AQE thresholds) match what the bench executes.  Plan construction runs the
eager prep jobs some queries contain (index build/cache, MATE's input
count), so the captured plan is the one the timed run would execute
against the warm index — the same lifecycle as bench.py.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "mate_join_search_single",
    "mate_join_search_multi",
    "cocoa_enrich",
    "dup_table_relations",
    "dedup_minhash_lsh",
    "dedup_exact",
    "ann_cosine_topk",
    "text_quality",
    "dedup_prefix_join",
    "text_kn_logprob",
    "text_ppl_buckets",
    "ann_ivf_topk",
    "corpus_prep_full",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from datalake_indexes_spark.plans.queries import QUERIES, testdata_index
    from datalake_indexes_spark.session import get_spark

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the index like the bench does, so query plans read the cache
    testdata_index(spark, sf_dir, with_super_keys=True)

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r10"))
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"skip {name}: not in registry")
            continue
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
