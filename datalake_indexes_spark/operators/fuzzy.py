"""Fuzzy string matching — edit-distance joins and entity resolution
(training-data-pipeline extension; no counterpart in the reference, whose
joins are exact-token only: maco/mate.py works on tokenized equality).

The scale design is q-gram prefix filtering (Ed-Join, Xiao et al. VLDB
2008 / Gravano et al. VLDB 2001): a Levenshtein edit changes at most
``q`` of a string's distinct q-grams, so two strings within distance
``d`` share a gram inside ANY ``d*q + 1``-element subset of either
side's gram set.  Probing only each left string's ``d*q + 1`` globally
RAREST grams against the right side's full gram index therefore loses no
true pair, while skipping the hot grams (``"00"`` in zero-padded ids,
``"  "`` in padded text) that make a full gram join quadratic on
low-entropy keys.  The exact ``levenshtein() <= d`` verify runs only on
the candidates the rare grams produce.

Everything is equi-joins + one small per-string top-(dq+1) window
(partitioned by string id — bounded partitions); the gram-frequency
table is a map-side-combinable aggregate.  No all-pairs surface
anywhere: candidate volume is Σ over probe grams of their document
frequency, i.e. governed by the RAREST grams' selectivity.

Completeness cases:
- strings with at least ``d*q + 1`` grams: prefix-filter theorem above;
- strings with 1..d*q grams (length in [q, q + d*q - 1]): ALL their
  grams are probed (the prefix window keeps everything), and the pair
  bound ``shared >= |G1| - d*q`` can reach 0 only when the string also
  fits the short block below;
- strings shorter than ``q*(d+1)``: separate per-length block (lengths
  within ``d``), bounded by the alphabet at such lengths.

The union of the candidate sets contains EVERY true pair — verified
output equals naive cross-join semantics, which is exactly what the
DuckDB oracle computes (a green ``fuzzy_join_names`` key PROVES the
blocking lost nothing at that scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gram_sets(df: DataFrame, id_col: str, val_col: str, q: int, out_id: str) -> DataFrame:
    """(out_id, gram) — DISTINCT q-grams per string; strings shorter than
    q emit nothing (they go through the short-string block)."""
    return (
        df.select(F.col(id_col).alias(out_id), F.col(val_col).alias("__v"))
        .filter(F.length("__v") >= q)
        .select(
            out_id,
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, length(__v) - {q} + 1),"
                        f" i -> substring(__v, i, {q}))"
                    )
                )
            ).alias("gram"),
        )
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_id: str,
    right_id: str,
    max_distance: int = 1,
    q: int = 2,
) -> DataFrame:
    """All (left, right) pairs with ``levenshtein(left_on, right_on) <=
    max_distance`` — exact semantics, rare-gram-blocked execution.

    Returns (left_id, right_id, left_value, right_value, distance).
    Self-join callers pass the same frame twice (aliased id columns) and
    filter orientations afterwards.
    """
    d = max_distance
    prefix_len = d * q + 1
    short_max = q * (d + 1) - 1  # both-short ⇒ gram bound can fail

    lg = _gram_sets(left, left_id, left_on, q, "__lid")
    rg = _gram_sets(right, right_id, right_on, q, "__rid")

    # global gram document frequency over the indexed (right) side; a
    # probe gram absent from the index (df null) generates no candidates,
    # which is sound — no right string contains it
    gram_df = rg.groupBy("gram").agg(F.count(F.lit(1)).alias("__df"))

    w = Window.partitionBy("__lid").orderBy(F.asc_nulls_first("__df"), F.asc("gram"))
    probes = (
        lg.join(gram_df, "gram", "left")
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= prefix_len)
        .select("__lid", "gram")
    )

    cand = probes.join(rg, "gram").select("__lid", "__rid").distinct()

    # short-string block: both sides length <= short_max, lengths within
    # d — expressed as an EQUI-join on an exploded length key (left rows
    # emit [len-d, len+d]) so no nested-loop/cartesian node ever appears
    ls = (
        left.select(F.col(left_id).alias("__lid"), F.col(left_on).alias("__lv"))
        .filter(F.length("__lv") <= short_max)
        .select(
            "__lid",
            F.explode(
                F.sequence(F.length("__lv") - d, F.length("__lv") + d)
            ).alias("__lk"),
        )
    )
    rs = right.select(
        F.col(right_id).alias("__rid"), F.length(right_on).alias("__lk")
    ).filter(F.col("__lk") <= short_max)
    short_cand = ls.join(rs, "__lk").select("__lid", "__rid")

    lv = left.select(F.col(left_id).alias("__lid"), F.col(left_on).alias("left_value"))
    rv = right.select(
        F.col(right_id).alias("__rid"), F.col(right_on).alias("right_value")
    )
    return (
        cand.union(short_cand)
        .distinct()
        .join(lv, "__lid")
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
    q: int = 2,
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
        q=q,
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
