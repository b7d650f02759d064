"""End-to-end pipeline on a planted mini-lake (SURVEY.md §5.3, FIXTURES.md §2):
index → MATE joinability → duplicate detection → duplicate removal → COCOA
enrichment, asserting every plant is recovered at its designed rank."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_indexes_spark.operators.cocoa import COCOA
from datalake_indexes_spark.operators.duplicates import DuplicateDetection
from datalake_indexes_spark.operators.mate import MATE




@pytest.mark.spark
def test_mate_finds_planted_joinable(planted):
    mate = MATE(planted["index"])
    res = mate.join_search(
        planted["input"], ["director_name", "movie_title"], k=5,
        input_order_by=["director_name", "movie_title"],
    )
    top = res.top_k.collect()
    assert top, "no joinable tables found"
    # rank 1 = lake_join_hi (table 0) via its (key1,key2) columns, 32 of 40
    # input rows covered, reported score = count - 1
    assert top[0]["table_id"] == 0
    assert top[0]["column_combination"] == "0_1"
    assert top[0]["score"] == 32 - 1
    # join maps carry one external row per matched input row
    pairs = res.join_pairs.filter(F.col("table_id") == 0)
    assert pairs.count() == 32


@pytest.mark.spark
def test_duplicate_relations_and_removal(planted, spark):
    dd = DuplicateDetection(planted["index"])
    rel = dd.get_relations()
    got = {(r["table_id_1"], r["table_id_2"]) for r in rel.collect()}
    # all three copies pairwise duplicate (2,3), (2,4), (3,4)
    assert got == {(2, 3), (2, 4), (3, 4)}

    top_k = spark.createDataFrame(
        [(10, t, "0") for t in range(5)], "score long, table_id int, column_combination string"
    )
    kept = DuplicateDetection.remove_duplicate_tables(top_k, rel)
    assert sorted(r["table_id"] for r in kept.collect()) == [0, 1, 2]


@pytest.mark.spark
def test_transitive_duplicate_chain(spark, planted):
    # chain a-b, b-c only (no a-c edge): min-label propagation must still
    # collapse all three into one group
    rel = spark.createDataFrame(
        [(2, 3), (3, 4)], "table_id_1 int, table_id_2 int"
    )
    groups = DuplicateDetection.duplicate_groups(rel)
    reps = {r["table_id"]: r["representative"] for r in groups.collect()}
    assert reps == {2: 2, 3: 2, 4: 2}


@pytest.mark.spark
def test_cocoa_ranks_planted_correlation(planted):
    mate = MATE(planted["index"])
    inp = planted["input"]
    res = mate.join_search(
        inp, ["director_name", "movie_title"], k=1,
        input_order_by=["director_name", "movie_title"],
    )
    # enrich_multicolumn needs the MATE row ids on the input — rebuild them
    # the same way prepare_input assigns them
    from datalake_indexes_spark.index.builder import with_global_row_number

    inp_ids = with_global_row_number(
        inp, ["director_name", "movie_title"], out_col="mate_row_id"
    )
    cocoa = COCOA(planted["index"])
    out = cocoa.enrich_multicolumn(inp_ids, res, k_c=5, target_column="imdb_score")
    rows = out.collect()
    assert rows, "no correlations"
    by_col = {r["table_col_id"]: r for r in rows}
    # feat_num (0_2) is monotone in the target -> near-perfect Spearman;
    # feat_cat (0_3, score bins) is also informative by construction — both
    # must rank above the noise column, with the plants in the top 2
    assert {rows[0]["table_col_id"], rows[1]["table_col_id"]} == {"0_2", "0_3"}
    # ~0.82, not ~1: the 8 deliberately-uncovered input rows carry the top
    # target ranks but are pinned at mid-rank ceil(n/2) — the defined
    # unmatched-row semantics (cocoa.py:465-466) caps the plant's Spearman
    assert by_col["0_2"]["corr"] > 0.75 and by_col["0_2"]["is_numeric"]
    assert by_col["0_3"]["corr"] > 0.5 and not by_col["0_3"]["is_numeric"]
    # noise (0_4) scores below both plants
    if "0_4" in by_col:
        assert abs(by_col["0_4"]["corr"]) < by_col["0_2"]["corr"]
