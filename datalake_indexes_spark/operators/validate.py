"""Data-quality validation — declarative row rules and referential
checks that emit a violations table (training pipelines gate ingestion
on exactly this: schema'd expectations, violations quarantined, counts
alerted; the reference has no DQ layer, this is extension surface).

Everything is one scan per input: row rules evaluate as native boolean
expressions UNIONed from the same cached scan (Catalyst collapses the
shared subplan), and referential rules are broadcast-or-shuffle
anti-joins on the key — no collect, no per-rule re-read of the lake.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate_rows(
    df: DataFrame, rules: dict[str, Column], id_col: str
) -> DataFrame:
    """Evaluate named boolean expectations; (rule, entity_id) per row
    that VIOLATES its rule (condition false or NULL — an unevaluable
    expectation is a violation, matching SQL CHECK semantics under
    NOT)."""
    parts = []
    for name, cond in sorted(rules.items()):
        parts.append(
            df.filter(~F.coalesce(cond, F.lit(False))).select(
                F.lit(name).alias("rule"),
                F.col(id_col).cast("long").alias("entity_id"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def validate_reference(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    rule: str,
    id_col: str | None = None,
) -> DataFrame:
    """Referential expectation: child rows whose key has no match in
    parent (a foreign-key orphan), as (rule, entity_id).  NULL child
    keys are exempt (SQL FK semantics).  The anti-join shuffles on the
    key (or broadcasts when the parent key set is small — AQE's call)."""
    keys = parent.select(F.col(parent_key).alias("__pk")).distinct()
    orphans = child.filter(F.col(child_key).isNotNull()).join(
        keys, child[child_key] == keys["__pk"], "left_anti"
    )
    ident = id_col or child_key
    return orphans.select(
        F.lit(rule).alias("rule"), F.col(ident).cast("long").alias("entity_id")
    )


def validate_existence(
    parent: DataFrame,
    child: DataFrame,
    parent_key: str,
    child_key: str,
    rule: str,
) -> DataFrame:
    """Coverage expectation: parent rows with NO child referencing them
    (e.g. "every customer has at least one order"), as (rule,
    entity_id) — the inverse direction of :func:`validate_reference`."""
    refs = child.select(F.col(child_key).alias("__ck")).distinct()
    uncovered = parent.join(
        refs, parent[parent_key] == refs["__ck"], "left_anti"
    )
    return uncovered.select(
        F.lit(rule).alias("rule"),
        F.col(parent_key).cast("long").alias("entity_id"),
    )
