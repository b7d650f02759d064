"""Fuzzy string matching — edit-distance joins and entity resolution
(training-data-pipeline extension; no counterpart in the reference, whose
joins are exact-token only: maco/mate.py works on tokenized equality).

Candidate generation is the DELETION-NEIGHBORHOOD join (the SymSpell /
Mor-Fraenkel scheme): if ``ed(s, r) <= d`` then deleting at most ``d``
characters from each side reaches a COMMON string — each substitution
deletes the differing character from both sides, each insertion deletes
only from the longer side, each deletion only from the shorter.  So both
sides explode their ≤d-deletion variants and candidates are an EQUI-join
on the variant string.

Why this engine: candidate volume tracks the TRUE near-neighborhood of
the data, not its key entropy.  Positional q-gram and PassJoin-segment
blocking both degenerate on low-entropy keys (zero-padded sequential
ids: a constant "Customer#000…" prefix makes every gram/segment bucket
hot — measured 1.8M candidates out of a 2.25M cross join at n=1500,
and 42M at n=20k).  Deletion variants of such ids differ in their
surviving digits, so two strings share a variant only when they are
genuinely within ~2d edits: measured 2.8M candidates for ~820k true
pairs at n=20k (3.4×, vs the 400M cross product; 110k vs 2.25M at
n=1500) — see test_fuzzy.py::test_blocking_candidate_volume_on_hot_ids.

The price is the variant fan-out: C(L, ≤d) rows per string (L+1 at
d=1, ~L²/2 at d=2) — independent of data, linear shuffle volume, the
standard trade of this family.  ``max_distance`` is capped at 2 (the
practical regime; the fan-out is cubic in L beyond).  All joins are
equi-joins — plan-pinned nested-loop-free; there is no short-string
special case (a length-≤d string's variant set simply includes "").

Recall is not argued but GRADED: the DuckDB oracle for
``fuzzy_join_names`` is the naive cross join, so green means zero lost
pairs; a seeded random sweep over a 3-letter alphabet pins parity at
d=1 and d=2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _deletion_variants(
    df: DataFrame, id_col: str, val_col: str, d: int, out_id: str
) -> DataFrame:
    """(out_id, var) — every string reachable by deleting at most ``d``
    characters (distinct per input row), built with in-array expressions
    only (no per-row Python)."""
    s = F.col("__v")
    L = F.length("__v")

    def drop1(i):
        return F.concat(
            s.substr(F.lit(1), (i - 1).cast("int")),
            s.substr((i + 1).cast("int"), L.cast("int")),
        )

    def drop2(i, j):
        return F.concat(
            s.substr(F.lit(1), (i - 1).cast("int")),
            s.substr((i + 1).cast("int"), (j - i - 1).cast("int")),
            s.substr((j + 1).cast("int"), L.cast("int")),
        )

    empty = F.array().cast("array<string>")
    pieces = [F.array(s)]
    if d >= 1:
        pieces.append(
            F.when(
                L >= 1, F.transform(F.sequence(F.lit(1), L), drop1)
            ).otherwise(empty)
        )
    if d >= 2:
        pieces.append(
            F.when(
                L >= 2,
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(1), L - 1),
                        lambda i: F.transform(
                            F.sequence(i + 1, L), lambda j: drop2(i, j)
                        ),
                    )
                ),
            ).otherwise(empty)
        )
    variants = F.array_distinct(F.concat(*pieces))
    return (
        df.select(F.col(id_col).alias(out_id), F.col(val_col).alias("__v"))
        .select(out_id, F.explode(variants).alias("var"))
    )


def fuzzy_candidates(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_id: str,
    right_id: str,
    max_distance: int = 1,
) -> DataFrame:
    """Candidate (left_id, right_id) pairs — a SUPERSET of every pair
    within ``max_distance`` edits (exposed for candidate-volume tests;
    :func:`fuzzy_join` verifies them).  ``max_distance`` must be 1 or 2."""
    if not 1 <= max_distance <= 2:
        raise ValueError(
            "deletion-neighborhood blocking supports max_distance 1 or 2 "
            f"(got {max_distance}); the variant fan-out C(L, d) is the "
            "practical ceiling of this family"
        )
    lv = _deletion_variants(left, left_id, left_on, max_distance, "__lid")
    rv = _deletion_variants(right, right_id, right_on, max_distance, "__rid")
    return lv.join(rv, "var").select("__lid", "__rid").distinct()


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_id: str,
    right_id: str,
    max_distance: int = 1,
) -> DataFrame:
    """All (left, right) pairs with ``levenshtein(left_on, right_on) <=
    max_distance`` — exact semantics, deletion-neighborhood-blocked
    execution (``max_distance`` 1 or 2).

    Returns (left_id, right_id, left_value, right_value, distance).
    Self-join callers pass the same frame twice (aliased id columns) and
    filter orientations afterwards.
    """
    d = max_distance
    cand = fuzzy_candidates(
        left, right, left_on, right_on, left_id, right_id, max_distance=d
    )
    lv = left.select(F.col(left_id).alias("__lid"), F.col(left_on).alias("left_value"))
    rv = right.select(
        F.col(right_id).alias("__rid"), F.col(right_on).alias("right_value")
    )
    return (
        cand.join(lv, "__lid")
        .join(rv, "__rid")
        # cheap length prefilter ahead of the dynamic-programming verify
        .filter(F.abs(F.length("left_value") - F.length("right_value")) <= d)
        .withColumn("distance", F.levenshtein("left_value", "right_value"))
        .filter(F.col("distance") <= d)
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            "left_value",
            "right_value",
            "distance",
        )
    )


def entity_resolution(
    df: DataFrame,
    on: str,
    id_col: str,
    max_distance: int = 1,
) -> DataFrame:
    """Entity resolution by transitive closure over the fuzzy-match graph:
    rows whose ``on`` values are within ``max_distance`` edits (directly or
    through a chain) share an ``entity_id`` (the minimum member id).

    Returns (id, value, entity_id) for EVERY input row — singletons are
    their own entity.  Clustering reuses the near-dup machinery
    (union-find below the edge guard, distributed large-star/small-star
    above), so the closure never collects an unbounded edge list.
    """
    from datalake_indexes_spark.operators.dedup import near_dup_clusters

    pairs = fuzzy_join(
        df.select(F.col(id_col).alias("__a_id"), F.col(on).alias("__a_v")),
        df.select(F.col(id_col).alias("__b_id"), F.col(on).alias("__b_v")),
        "__a_v",
        "__b_v",
        "__a_id",
        "__b_id",
        max_distance=max_distance,
    ).filter(F.col("__a_id") < F.col("__b_id"))

    clusters = near_dup_clusters(
        pairs.select(
            F.col("__a_id").alias("doc_id_1"), F.col("__b_id").alias("doc_id_2")
        )
    ).select(F.col("doc_id").alias("__cid"), "representative")

    return (
        df.select(F.col(id_col), F.col(on).alias("value"))
        .join(clusters, F.col(id_col) == F.col("__cid"), "left")
        .select(
            id_col,
            "value",
            F.coalesce("representative", F.col(id_col)).alias("entity_id"),
        )
    )


def fs_field_u_probabilities(
    a: DataFrame, b: DataFrame, fields: list[str]
) -> DataFrame:
    """Per-field u-probabilities for Fellegi–Sunter record linkage:
    u_f = P(field f agrees | a random (a, b) pair) = Σ_v p_a(v)·p_b(v),
    estimated from the full frames' value frequencies — the standard
    frequency-based u estimate (Fellegi & Sunter 1969; Winkler's
    practice), computable WITHOUT sampling pairs.

    Returns (field, u) with u clamped to [1e-9, 1 - 1e-9] so the log
    weights stay finite even for a constant column.  NULLs are excluded
    from both margins (a NULL comparison is "missing", neither agreement
    nor disagreement, and contributes no weight downstream).

    Scale shape: both sides melt to (field, value) in ONE projection each
    (stack stays in codegen), one count aggregate per side keyed by
    (field, value), one equi-join on (field, value) — value-frequency
    sized, not pair sized — and a per-field sum.  No cross join ever
    materializes: the random-pair expectation is algebra over margins.
    """
    def melt(df: DataFrame) -> DataFrame:
        pairs = ", ".join(f"'{f}', cast(`{f}` as string)" for f in fields)
        return df.selectExpr(
            f"stack({len(fields)}, {pairs}) as (__field, __val)"
        ).filter(F.col("__val").isNotNull())

    # counted frames are localCheckpoint'ed (lazily) because each feeds
    # BOTH the intersection join and its own margin re-aggregate — without
    # materialization the second reference would re-run the input scan
    ca = (
        melt(a).groupBy("__field", "__val").agg(F.count(F.lit(1)).alias("__ca"))
        .localCheckpoint(eager=False)
    )
    cb = (
        melt(b).groupBy("__field", "__val").agg(F.count(F.lit(1)).alias("__cb"))
        .localCheckpoint(eager=False)
    )
    # margins re-aggregate the COUNTED frames (value-cardinality sized),
    # not the inputs — one scan per side total
    na = ca.groupBy("__field").agg(F.sum("__ca").alias("__na"))
    nb = cb.groupBy("__field").agg(F.sum("__cb").alias("__nb"))
    return (
        ca.join(cb, ["__field", "__val"])
        .groupBy("__field")
        .agg(F.sum(F.col("__ca").cast("double") * F.col("__cb")).alias("__hits"))
        .join(F.broadcast(na), "__field")
        .join(F.broadcast(nb), "__field")
        .select(
            F.col("__field").alias("field"),
            F.least(
                F.lit(1.0 - 1e-9),
                F.greatest(
                    F.lit(1e-9),
                    F.col("__hits") / (F.col("__na").cast("double") * F.col("__nb")),
                ),
            ).alias("u"),
        )
    )


def fs_record_linkage(
    a: DataFrame,
    b: DataFrame,
    fields: list[str],
    block_on: str | list[str],
    a_id: str = "a_id",
    b_id: str = "b_id",
    m: float | dict[str, float] = 0.95,
    threshold: float = 0.0,
) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage: score blocked
    candidate pairs by the sum of per-field log-likelihood weights —
    agree on f → ln(m_f/u_f), disagree → ln((1−m_f)/(1−u_f)), either
    side NULL → 0 — and keep pairs with weight ≥ ``threshold``.

    (a_id, b_id, n_agree, n_compared, weight) sorted nowhere (caller
    orders); weight rounded to 6 for cross-engine parity.  ``m`` (the
    P(agree | true match) prior) is a scalar or per-field dict — the
    deterministic-parameter formulation (no EM), which keeps the
    operator a pure closed form the DuckDB twin reproduces exactly.
    u_f comes from :func:`fs_field_u_probabilities` — frequency-based,
    never pair-sampled.

    The probabilistic complement of :func:`fuzzy_join`: edit-distance
    joins answer "which strings are ≤ d apart"; FS linkage answers
    "which RECORD pairs are the same entity" across several partially
    reliable fields, weighting rare-value agreement (low u) far above
    common-value agreement — the property exact/fuzzy equality cannot
    express.

    Scale shape: u estimation is margin algebra (no pair blowup); the
    pair space is one equi-join per blocking rule (caller picks blocking
    density exactly like the LSH band key in minhash dedup); weights are
    pure column expressions over the joined row — no UDF, no collect of
    anything pair-sized (only the ≤ |fields| u rows come to the driver,
    the sanctioned scalar tier).

    ``block_on`` takes one column or several: with a list, candidates
    are the UNION of the per-rule equi-joins deduplicated on
    (a_id, b_id) — Splink-style multi-rule blocking, because any single
    rule misses exactly the matches whose block key is the dirty field.
    Records NULL on a rule's key produce no candidates under that rule
    (equi-join semantics), which is the standard behavior.
    """
    m_map = {f: (m[f] if isinstance(m, dict) else float(m)) for f in fields}
    for f, mf in m_map.items():
        if not 0.0 < mf < 1.0:
            raise ValueError(f"fs_record_linkage: m[{f!r}]={mf} must be in (0, 1)")
    u_rows = fs_field_u_probabilities(a, b, fields).collect()
    u_map = {r["field"]: float(r["u"]) for r in u_rows}
    missing = [f for f in fields if f not in u_map]
    if missing:
        # a field whose margins never intersect: u clamps to the floor
        for f in missing:
            u_map[f] = 1e-9

    import math as _math

    rules = [block_on] if isinstance(block_on, str) else list(block_on)
    if not rules:
        raise ValueError("fs_record_linkage: at least one blocking rule required")
    la = a.select(F.col(a_id).alias("__aid"),
                  *[F.col(r).alias(f"__blk_{i}") for i, r in enumerate(rules)],
                  *[F.col(f).cast("string").alias(f"__a_{f}") for f in fields])
    lb = b.select(F.col(b_id).alias("__bid"),
                  *[F.col(r).alias(f"__blk_{i}") for i, r in enumerate(rules)],
                  *[F.col(f).cast("string").alias(f"__b_{f}") for f in fields])
    per_rule = [
        la.join(
            lb.select(f"__blk_{i}", "__bid", *[f"__b_{f}" for f in fields]),
            f"__blk_{i}",
        ).select(
            "__aid", "__bid",
            *[f"__a_{f}" for f in fields], *[f"__b_{f}" for f in fields],
        )
        for i in range(len(rules))
    ]
    pairs = per_rule[0]
    for p in per_rule[1:]:
        pairs = pairs.unionByName(p)
    if len(per_rule) > 1:
        pairs = pairs.dropDuplicates(["__aid", "__bid"])

    weight = F.lit(0.0)
    agree_n = F.lit(0)
    comp_n = F.lit(0)
    for f in fields:
        va, vb = F.col(f"__a_{f}"), F.col(f"__b_{f}")
        both = va.isNotNull() & vb.isNotNull()
        agree = both & (va == vb)
        w_agree = _math.log(m_map[f] / u_map[f])
        w_dis = _math.log((1.0 - m_map[f]) / (1.0 - u_map[f]))
        weight = weight + F.when(agree, F.lit(w_agree)).when(
            both, F.lit(w_dis)
        ).otherwise(F.lit(0.0))
        agree_n = agree_n + agree.cast("int")
        comp_n = comp_n + both.cast("int")

    return (
        pairs.select(
            F.col("__aid").alias(a_id),
            F.col("__bid").alias(b_id),
            agree_n.alias("n_agree"),
            comp_n.alias("n_compared"),
            F.round(weight, 6).alias("weight"),
        )
        .filter(F.col("weight") >= threshold)
    )
