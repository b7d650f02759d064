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


def frame_diff(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    tol: float = 0.0,
    allow_asymmetric_columns: bool = False,
) -> DataFrame:
    """Distributed regression diff between two keyed frames: one row per
    compared column — (column_name, n_only_a, n_only_b, n_compared,
    n_mismatch, example_key) — the "did my pipeline change produce the
    same table?" answer without collecting either side.

    Keys only in one frame count per column as ``n_only_a``/``n_only_b``
    (identical for every column — repeated so each row reads
    standalone).  Numeric (including decimal) columns compare within
    ``tol`` (absolute) when tol > 0, with NULL==NULL and NaN==NaN
    matching exactly as in the strict branch — the predicate is built
    null-free, so a NULL-vs-value pair always COUNTS as a mismatch
    instead of vanishing from the sums.  NULL key components are legal:
    presence comes from per-side marker columns, not key nullability.
    ``example_key`` carries the smallest mismatching key per column —
    a min aggregate, so the evidence stays bounded no matter how many
    rows mismatch.

    A column present in only one frame is itself a regression; by
    default it raises (``allow_asymmetric_columns=True`` skips them) —
    silently ignoring a dropped column would report "identical".

    Scale shape: ONE full-outer co-keyed join (the only shuffle), one
    aggregate over comparison flags; the per-column expansion happens in
    the aggregate's expression list, not as row blowup.
    """
    only_a = [c for c in a.columns if c not in set(b.columns)]
    only_b = [c for c in b.columns if c not in set(a.columns)]
    if (only_a or only_b) and not allow_asymmetric_columns:
        raise ValueError(
            f"frame_diff: asymmetric columns (only in a: {only_a}, "
            f"only in b: {only_b}) — a dropped/renamed column is a "
            "regression; pass allow_asymmetric_columns=True to skip them"
        )
    common = [c for c in a.columns if c in set(b.columns) and c not in key_cols]
    a_types, b_types = dict(a.dtypes), dict(b.dtypes)

    def _is_numeric(dt: str | None) -> bool:
        return dt in {"int", "bigint", "smallint", "tinyint", "float", "double"} or (
            dt is not None and dt.startswith("decimal")
        )

    # A dtype drift between frames is itself a regression: casting the
    # drifted side to double would NULL out non-castable values and the
    # tolerance predicate would silently under-count mismatches.  Numeric
    # widening (int vs bigint vs double) is fine — both sides cast to
    # double losslessly for the tol comparison — but numeric-vs-non-numeric
    # or two differing non-numeric types must surface, not vanish.
    drifted = [
        c
        for c in common
        if a_types[c] != b_types[c]
        and not (_is_numeric(a_types[c]) and _is_numeric(b_types[c]))
    ]
    if drifted:
        raise ValueError(
            "frame_diff: dtype drift on common columns "
            + str({c: (a_types[c], b_types[c]) for c in drifted})
            + " — cast both frames to a shared type first; comparing "
            "across these types would silently drop rows from n_mismatch"
        )
    la = a.withColumn("__in_a", F.lit(1)).alias("a")
    lb = b.withColumn("__in_b", F.lit(1)).alias("b")
    cond = None
    for k in key_cols:
        eq = F.col(f"a.{k}").eqNullSafe(F.col(f"b.{k}"))
        cond = eq if cond is None else cond & eq
    joined = la.join(lb, cond, "full_outer")
    in_a = F.col("a.__in_a").isNotNull()
    in_b = F.col("b.__in_b").isNotNull()
    dtypes = a_types

    key_repr = F.concat_ws(
        "|", *[F.coalesce(F.col(f"a.{k}"), F.col(f"b.{k}")).cast("string") for k in key_cols]
    )
    rows = []
    for c in common:
        va, vb = F.col(f"a.{c}"), F.col(f"b.{c}")
        if _is_numeric(dtypes.get(c)) and tol > 0:
            da, db = va.cast("double"), vb.cast("double")
            # null-free predicate: every branch is a definite boolean
            same = F.coalesce(
                (va.isNull() & vb.isNull())
                | (
                    va.isNotNull()
                    & vb.isNotNull()
                    & ((F.isnan(da) & F.isnan(db)) | (F.abs(da - db) <= tol))
                ),
                F.lit(False),
            )
        else:
            same = va.eqNullSafe(vb)
        mismatch = in_a & in_b & ~same
        rows.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.sum((in_a & ~in_b).cast("long")).alias("n_only_a"),
                F.sum((~in_a & in_b).cast("long")).alias("n_only_b"),
                F.sum((in_a & in_b).cast("long")).alias("n_compared"),
                F.sum(mismatch.cast("long")).alias("n_mismatch"),
                F.min(F.when(mismatch, key_repr)).alias("example_key"),
            )
        )
    agg = joined.agg(F.array(*rows).alias("__r"))
    return agg.select(F.explode("__r").alias("__p")).select("__p.*")
