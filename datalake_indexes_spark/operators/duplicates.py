"""Duplicate detection — super-key row/table duplicates (SURVEY.md §2.3 J5/J6).

Reference: ``maco/duplicate_detection.py``.  Its row probe walks the posting
list sequentially and compares sorted row-value multisets (``fp_check``,
duplicate_detection.py:9-30); its table pass nested-loops every table pair.
Here both are joins:

- row duplicates: self-join of per-row fingerprints on the XASH super key,
  verified by sorted-value-array equality (the super key is a sound
  prefilter: equal rows always hash equal, collisions are removed by the
  value check),
- duplicate table relations (get_relations, duplicate_detection.py:208-230):
  for every table pair with equal column counts, the pair is a duplicate
  relation when the number of verified equal-row pairs reaches
  ``min(rows(t1), rows(t2))``  (duplicate_detection.py:195-206).

Deviations (intended semantics, SURVEY.md J5): the reference's
``get_duplicate_tables`` probes only the *first* input row
(duplicate_detection.py:65 ``iloc[:1]``); we probe all rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_indexes_spark.index.lake_index import LakeIndex


def row_fingerprints(index: LakeIndex) -> DataFrame:
    """Per-row fingerprint: sorted value multiset + super key + column count
    (duplicate_detection.py:70: ``sorted(list(row.astype(str)))``)."""
    values = (
        index.cells.groupBy("table_id", "row_id")
        .agg(
            F.sort_array(F.collect_list("tokenized")).alias("row_values"),
            F.count(F.lit(1)).alias("n_cols"),
        )
    )
    return values.join(index.row_keys, ["table_id", "row_id"], "inner")


class DuplicateDetection:
    def __init__(self, index: LakeIndex):
        self.index = index

    def duplicate_rows(self, within_table: bool = False) -> DataFrame:
        """J5 — verified duplicate row pairs across the lake.

        Returns (table_id_1, row_id_1, table_id_2, row_id_2), each unordered
        pair once.  Super-key equality prunes the self-join; sorted value
        arrays verify (hash collisions drop out) — the arrays stay exact
        (J5's verify contract), but the fingerprint frame is
        localCheckpointed so the cells-wide aggregation feeds both
        self-join branches instead of running twice.
        """
        fp = row_fingerprints(self.index).localCheckpoint(eager=False)
        a = fp.alias("a")
        b = fp.alias("b")
        pair_order = (F.col("a.table_id") < F.col("b.table_id")) | (
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.row_id") < F.col("b.row_id"))
        )
        cond = (
            (F.col("a.super_key_hi") == F.col("b.super_key_hi"))
            & (F.col("a.super_key_lo") == F.col("b.super_key_lo"))
            & pair_order
        )
        if within_table:
            cond = cond & (F.col("a.table_id") == F.col("b.table_id"))
        joined = a.join(b, cond, "inner").filter(
            F.col("a.row_values") == F.col("b.row_values")
        )
        return joined.select(
            F.col("a.table_id").alias("table_id_1"),
            F.col("a.row_id").alias("row_id_1"),
            F.col("b.table_id").alias("table_id_2"),
            F.col("b.row_id").alias("row_id_2"),
        )

    def get_relations(self) -> DataFrame:
        """J6 — duplicate table relations (duplicate_detection.py:208-230).

        Returns (table_id_1, table_id_2) for pairs where the verified
        equal-row pair count reaches min(rows(t1), rows(t2)); only pairs
        with equal column counts compete (duplicate_detection.py:141).

        The pair count is computed from per-table row-FINGERPRINT counts
        (Σ_fp cnt1·cnt2 — identical to counting the verified row-pair join,
        since equal values ⇒ equal fingerprint), so a row value repeated
        m times contributes a multiplication, not an m² join explosion:
        the skewed-duplicate pathological case (e.g. a lake full of
        all-empty rows) stays linear.  :meth:`duplicate_rows` keeps the
        pair-level join for J5, whose OUTPUT is inherently pairwise.

        The fingerprint is md5 of the JSON-encoded sorted row multiset —
        unambiguous (JSON escaping), 128-bit (the same collision
        convention :func:`dedup.exact_duplicates` rests on), and 16
        bytes on the wire instead of the full value array, which halves
        the second shuffle.  The fingerprint-count frame is
        localCheckpointed before the self-join: Spark plans the two join
        branches as independent subtrees, so without it the whole
        cells-wide aggregation runs TWICE (measured: the two duplicated
        53 MB shuffle stages dominated the bench profile at sf0.1).
        """
        sizes = self.index.table_info.select(
            "table_id", (F.col("max_row_id") + 1).alias("n_rows"), (F.col("max_col_id") + 1).alias("n_cols")
        )
        # One shuffle serves everything downstream: the fingerprint rows
        # are repartitioned by row_fp alone, so the (table_id, row_fp)
        # count is exchange-free (partitioning is a subset of the group
        # key) AND both self-join branches are already clustered on the
        # join key.  persist() — not localCheckpoint, which erases
        # outputPartitioning and would force the join to re-shuffle both
        # sides (measured at sf0.1: 33 MB + 34 MB shuffle writes and a
        # 67 MB join read collapse to the single 33 MB repartition) —
        # still dedupes the cells-wide aggregation across the branches.
        fp_counts = (
            self.index.cells.groupBy("table_id", "row_id")
            .agg(
                F.md5(
                    F.to_json(F.sort_array(F.collect_list("tokenized")))
                ).alias("row_fp")
            )
            .repartition("row_fp")
            .groupBy("table_id", "row_fp")
            .agg(F.count(F.lit(1)).alias("__cnt"))
        ).persist()
        a = fp_counts.alias("a")
        b = fp_counts.alias("b")
        counts = (
            a.join(
                b,
                (F.col("a.row_fp") == F.col("b.row_fp"))
                & (F.col("a.table_id") < F.col("b.table_id")),
            )
            .groupBy(
                F.col("a.table_id").alias("table_id_1"),
                F.col("b.table_id").alias("table_id_2"),
            )
            .agg(F.sum(F.col("a.__cnt") * F.col("b.__cnt")).alias("dup_pairs"))
        )
        s1 = sizes.select(
            F.col("table_id").alias("table_id_1"),
            F.col("n_rows").alias("rows_1"),
            F.col("n_cols").alias("cols_1"),
        )
        s2 = sizes.select(
            F.col("table_id").alias("table_id_2"),
            F.col("n_rows").alias("rows_2"),
            F.col("n_cols").alias("cols_2"),
        )
        return (
            counts.join(F.broadcast(s1), "table_id_1")
            .join(F.broadcast(s2), "table_id_2")
            .filter(F.col("cols_1") == F.col("cols_2"))
            .filter(F.col("dup_pairs") >= F.least("rows_1", "rows_2"))
            .select("table_id_1", "table_id_2")
        )

    def duplicate_row_groups(self, table_id: int | None = None) -> DataFrame:
        """Exact duplicate-row groups by full value multiset — the set-based
        view of J5 (group size > 1), useful as a lake-hygiene query.

        Returns (table_id, row_values, group_size, min_row_id).
        """
        # value-only grouping — no super keys needed
        fp = (
            self.index.cells.groupBy("table_id", "row_id")
            .agg(F.sort_array(F.collect_list("tokenized")).alias("row_values"))
        )
        if table_id is not None:
            fp = fp.filter(F.col("table_id") == table_id)
        return (
            fp.groupBy("table_id", "row_values")
            .agg(F.count(F.lit(1)).alias("group_size"), F.min("row_id").alias("min_row_id"))
            .filter(F.col("group_size") > 1)
        )

    @staticmethod
    def duplicate_groups(
        relations: DataFrame, distributed_threshold: int = 200_000
    ) -> DataFrame:
        """Connected components of the duplicate-relation graph.

        Returns (table_id, representative).  Edge sets up to
        ``distributed_threshold`` resolve by driver-side union-find (exact
        transitive closure in one pass — the right shape for table-level
        relations, which the reference also resolves driver-side,
        demo:397-421).  Larger edge sets — document-level near-dup graphs
        on crawl corpora run O(corpus) pairs — switch to the distributed
        large-star/small-star algorithm (:mod:`..operators.graph`), which
        never collects an edge to the driver.
        """
        # persist before the strategy probe: the count and the resolution
        # pass (collect OR the CC iterations) would otherwise each re-run
        # the upstream pair pipeline (LSH + verification) from scratch
        relations = relations.persist()
        try:
            n_edges = relations.count()
            if n_edges > distributed_threshold:
                from datalake_indexes_spark.operators.graph import connected_components

                return connected_components(
                    relations, src="table_id_1", dst="table_id_2"
                ).select(
                    F.col("node").alias("table_id"), F.col("representative")
                )
            edges = [
                (r["table_id_1"], r["table_id_2"]) for r in relations.collect()
            ]
        finally:
            relations.unpersist()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        rows = [(t, find(t)) for t in sorted(parent)]
        return relations.sparkSession.createDataFrame(
            rows or [(None, None)], "table_id long, representative long"
        ).filter(F.col("table_id").isNotNull())

    @staticmethod
    def remove_duplicate_tables(top_k: DataFrame, relations: DataFrame) -> DataFrame:
        """D2 — drop all but one representative of each duplicate group from
        a MATE top-k list (demo:397-421).  Groups are connected components
        of the relation edges (transitive chains included); the smallest
        table id of each group survives."""
        groups = DuplicateDetection.duplicate_groups(relations)
        drop = groups.filter(F.col("table_id") != F.col("representative")).select(
            "table_id"
        )
        return top_k.join(F.broadcast(drop), "table_id", "left_anti")
