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

# Second tier (round 9): the LLM-pipeline headliners.  The headline set
# is reference-parity only; these pin the extension surface's envelope
# with the same min-of-N + profile discipline.  Their times go in
# "extension"/"extension_total", NOT in "value", so the primary metric
# stays comparable to BASELINE and earlier rounds.
EXTENSION = [
    "dedup_prefix_join",
    "text_kn_logprob",
    "text_ppl_buckets",
    "ann_ivf_topk",
    "corpus_prep_full",
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
    runs: dict[str, list[float]] = {}

    # offline index build (both variants used by the queries): min of 2
    # full builds — caches are dropped between runs so each one measures
    # real ingestion work, and the per-run spread distinguishes host noise
    # (observed ±35% on shared hardware) from a code regression
    from datalake_indexes_spark.plans import queries as qmod

    def build_once() -> float:
        t0 = time.time()
        idx = testdata_index(spark, sf_dir, with_super_keys=True)
        idx.cells.count()
        idx.row_keys.count()
        if idx.col_flags is not None:
            idx.col_flags.count()
        if idx.cells_keyed is not None:
            idx.cells_keyed.count()
        return time.time() - t0

    build_runs = []
    for i in range(2):
        if i:  # drop the session-cached index + persisted data, rebuild cold
            qmod._INDEX_CACHE.clear()
            spark.catalog.clearCache()
        build_runs.append(build_once())
    # leave a warm index behind for the query timings (offline-index model)
    runs["index_build"] = [round(t, 3) for t in build_runs]
    timings["index_build"] = round(min(build_runs), 3)

    # Fixed pre-bench warm-up (r7 verdict task #3): one untimed pass of
    # the first headline query absorbs JIT/codegen warm-up and page-cache
    # cold starts that otherwise land in the first timed run — the
    # per-run descent 9.1 -> 4.4s on mate_single was the JIT-warm shape.
    # Reported as warmup_s so a cold host is visible in the JSON.
    t0 = time.time()
    warm_fn = QUERIES.get("mate_join_search_single") or QUERIES.get(HEADLINE[0])
    if warm_fn is not None:
        warm_fn(spark, sf_dir).count()
    warmup_s = round(time.time() - t0, 3)

    # mate_join_search_single bounced 3.9-5.9s across rounds on identical
    # code (host variance on shared hardware); min-of-5 narrows the min's
    # sampling error so a real regression is distinguishable from noise
    N_RUNS = {"mate_join_search_single": 5}

    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        # min of N runs against the warm index; per-run times are reported
        # so a host-load swing is visible in the JSON
        per_run = []
        for _ in range(N_RUNS.get(name, 3)):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.count()
            per_run.append(time.time() - t0)
        runs[name] = [round(t, 3) for t in per_run]
        timings[name] = round(min(per_run), 3)

    total = round(sum(timings.values()), 3)

    # extension tier: min-of-2 against the same warm session
    ext_timings: dict[str, float] = {}
    ext_runs: dict[str, list[float]] = {}
    for name in EXTENSION:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        per_run = []
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).count()
            per_run.append(time.time() - t0)
        ext_runs[name] = [round(t, 3) for t in per_run]
        ext_timings[name] = round(min(per_run), 3)
    ext_total = round(sum(ext_timings.values()), 3)

    # Per-stage execution profiles for the three queries that swung >30%
    # across rounds on unchanged code (r7 verdict task #3): shuffle
    # bytes and stage counts are code-determined — if a future bench
    # total moves while these hold steady, the swing is host state, not
    # a plan regression.  Profiled AFTER the timed loop (untimed).
    profile: dict[str, dict] = {}
    try:
        from datalake_indexes_spark.plans.runtime import runtime_report_of

        def _prof(fn):
            rep = runtime_report_of(lambda: fn(spark, sf_dir), spark, min_stage_ms=50)
            return {
                "n_jobs": rep.get("n_jobs"),
                "n_stages": rep.get("n_stages"),
                "shuffle_read_mb": rep.get("shuffle_read_mb"),
                "shuffle_write_mb": rep.get("shuffle_write_mb"),
                "spill_mb": rep.get("spill_mb"),
                "max_task_skew": rep.get("max_task_skew"),
                "wall_s": rep.get("wall_s"),
            }

        for name in (
            "mate_join_search_multi",
            "cocoa_enrich",
            "dup_table_relations",
        ):
            fn = QUERIES.get(name)
            if fn is not None:
                profile[name] = _prof(fn)
        for name in EXTENSION:  # extension tier: every key gets a profile
            fn = QUERIES.get(name)
            if fn is not None:
                profile[name] = _prof(fn)
    except Exception as exc:  # profiles are diagnostics, never fail the bench
        profile = {"error": str(exc)[:200]}

    print(
        json.dumps(
            {
                "metric": "datalake_indexes_spark headline queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "runs": runs,
                "extension": ext_timings,
                "extension_runs": ext_runs,
                "extension_total": ext_total,
                "warmup_s": warmup_s,
                "profile": profile,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
