"""Plan introspection — the `.explain` discipline as a queryable API.

Every scale claim in PLANS.md reduces to facts about the physical plan:
how many shuffle Exchanges, which joins broadcast, whether filters
reached the parquet scan, which windows are global.  `plan_report` extracts
those facts from any DataFrame so pipelines can ASSERT their plan shape
(the `tests/test_plan_properties.py` guards use the same substrings) and
users can audit a composed query before paying for it at 100 TB —
`spark.explain()` output is for eyes; this is for code.

Driver-only and free: reads the already-built physical plan string; no
job runs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_report(df: DataFrame) -> dict:
    """Facts about ``df``'s physical plan (AQE initial plan — the
    pre-runtime shape; AQE may further improve it, never worsen it):

    - ``n_exchanges``: shuffle boundaries (each is a full materialization
      of its subtree's output — the unit of cost at scale)
    - ``n_broadcast_joins`` / ``n_sortmerge_joins`` / ``n_hash_joins``:
      join strategies chosen
    - ``n_nested_loop_joins``: BroadcastNestedLoop + CartesianProduct —
      almost always a scale bug unless one side is a literal handful of
      rows (the sanctioned 1-row broadcast pattern)
    - ``n_scans``: file-source scans (re-reads of the same data count)
    - ``has_pushed_filters``: at least one scan received pushed filters
    - ``n_inmemory_scans``: cache hits (InMemoryTableScan)
    - ``n_global_windows``: Window operators with an EMPTY partition
      spec — every row of the subtree funnels through ONE task (the
      classic silent scale killer; fine only when the input is already
      k-bounded, e.g. the rank pass after an ``orderBy().limit(k)``)

    Codegen-region counting is deliberately ABSENT: under AQE (the
    engine default) WholeStageCodegen subtrees are inserted only when
    the adaptive plan finalizes at execution, so no pre-execution
    explain mode can see them — a metric that always reads 0 is worse
    than none.  Audit codegen width post-hoc via the Spark UI / event
    log if needed.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        # SHUFFLE exchanges only: the raw substring also matches
        # BroadcastExchange (no shuffle — the small side ships to every
        # executor) and ReusedExchange (a reference to an exchange
        # already counted), which would overcount the cost metric
        "n_exchanges": plan.count("Exchange")
        - plan.count("BroadcastExchange")
        - plan.count("ReusedExchange"),
        "n_broadcast_exchanges": plan.count("BroadcastExchange"),
        "n_broadcast_joins": plan.count("BroadcastHashJoin"),
        "n_sortmerge_joins": plan.count("SortMergeJoin"),
        "n_hash_joins": plan.count("ShuffledHashJoin"),
        "n_nested_loop_joins": plan.count("BroadcastNestedLoopJoin")
        + plan.count("CartesianProduct"),
        "n_scans": plan.count("FileScan"),
        "has_pushed_filters": bool(
            re.search(r"PushedFilters: \[[^\]]", plan)
        ),
        "n_inmemory_scans": plan.count("InMemoryTableScan"),
        "n_global_windows": _count_global_windows(plan),
    }


def _count_global_windows(plan: str) -> int:
    """Window operators whose partition spec is empty.  The plan line is
    ``Window [exprs], [partitionSpec], [orderSpec]`` when fully
    specified; Spark omits EMPTY specs entirely, so a global window
    prints either ONE top-level bracket group (no partition, no order —
    a frame-only aggregate over the whole input) or TWO groups whose
    second is an order spec (told apart from a partition-only window by
    the ASC/DESC markers only order specs carry).  Nested brackets
    inside the expressions are skipped by depth tracking."""
    n = 0
    for line in plan.splitlines():
        idx = line.find("Window [")
        if idx < 0:
            continue
        depth = 0
        groups: list[str] = []
        for ch in line[idx:]:
            if ch == "[":
                if depth == 0:
                    groups.append("")
                depth += 1
            elif ch == "]":
                depth = max(0, depth - 1)
            elif depth > 0:
                groups[-1] += ch
        if len(groups) == 1 or (
            len(groups) == 2 and (" ASC" in groups[1] or " DESC" in groups[1])
        ):
            n += 1
    return n


def assert_scalable_plan(
    df: DataFrame,
    max_exchanges: int | None = None,
    allow_nested_loop: bool = False,
    max_global_windows: int | None = None,
) -> dict:
    """Raise AssertionError when the plan has a scale smell; returns the
    report otherwise.  Use in pipeline code the way tests use the plan
    guards: fail fast at plan time, not three hours into the shuffle.

    ``max_global_windows`` is opt-in (global windows over k-bounded
    inputs — the rank pass after ``orderBy().limit(k)`` — are sanctioned;
    pass 0 for pipelines whose windows must all ride a partitioning)."""
    rep = plan_report(df)
    if not allow_nested_loop and rep["n_nested_loop_joins"]:
        raise AssertionError(
            f"plan contains {rep['n_nested_loop_joins']} nested-loop/cartesian "
            f"join(s) — quadratic at scale: {rep}"
        )
    if max_global_windows is not None and rep["n_global_windows"] > max_global_windows:
        raise AssertionError(
            f"plan has {rep['n_global_windows']} single-partition window(s) "
            f"> budget {max_global_windows}: {rep}"
        )
    if max_exchanges is not None and rep["n_exchanges"] > max_exchanges:
        raise AssertionError(
            f"plan has {rep['n_exchanges']} exchanges > budget {max_exchanges}: {rep}"
        )
    return rep
