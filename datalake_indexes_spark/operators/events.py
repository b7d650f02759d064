"""Event-stream relational operators — as-of (most-recent-prior) joins.

An as-of join attaches, to every probe-side event, the latest build-side
event with the same key whose timestamp is <= the probe's (backward
inclusive — the financial-data / feature-store semantics DuckDB exposes
as ``ASOF JOIN`` and pandas as ``merge_asof``).  Spark has no native
as-of join; the classic sort-merge formulation here is the union trick:

    tag build rows 0 and probe rows 1, union, and take
    ``last(payload, ignorenulls=True)`` over a per-key window ordered by
    (ts, tag, seq) — every probe row sees exactly the most recent build
    payload at or before its timestamp.

That is ONE shuffle, keyed by the join key (user, instrument, ...), which
is precisely the partitioning a feature-store pipeline wants; both inputs
are scanned once and no row expansion ever happens (contrast a range join,
which is quadratic per key).  Ties: a build row at exactly the probe's
timestamp DOES match (inclusive); multiple build rows on the same (key,
ts) resolve to the largest ``seq_col`` — deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key_col: str,
    ts_col: str,
    build_cols: list[str],
    seq_col: str,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward-inclusive as-of join: every ``probe`` row gains
    ``prefix + c`` for each c in ``build_cols``, taken from the latest
    ``build`` row with the same ``key_col`` and ``ts_col`` <= the probe's
    (NULLs when no such row exists — left-join semantics).

    ``seq_col`` breaks build-side ties on equal (key, ts): the row with
    the largest value wins.
    """
    payload = F.struct(*[F.col(c) for c in build_cols])
    b = build.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.col(seq_col).cast("long").alias("__seq"),
        payload.alias("__payload"),
        F.lit(None).cast(
            probe.select(F.struct(*probe.columns).alias("s")).schema["s"].dataType
        ).alias("__prow"),
    )
    p = probe.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast("long").alias("__seq"),
        F.lit(None).cast(b.schema["__payload"].dataType).alias("__payload"),
        F.struct(*probe.columns).alias("__prow"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.asc("__ts"), F.asc("__tag"), F.asc_nulls_last("__seq"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        b.unionByName(p)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__tag") == 1)
    )
    out_cols = [F.col(f"__prow.{c}").alias(c) for c in probe.columns]
    out_cols += [
        F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in build_cols
    ]
    return matched.select(*out_cols)
