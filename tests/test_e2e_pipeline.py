"""End-to-end pipeline on a planted mini-lake (SURVEY.md §5.3, FIXTURES.md §2):
index → MATE joinability → duplicate detection → duplicate removal → COCOA
enrichment, asserting every plant is recovered at its designed rank."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_indexes_spark.index.builder import build_index
from datalake_indexes_spark.operators.cocoa import COCOA
from datalake_indexes_spark.operators.duplicates import DuplicateDetection
from datalake_indexes_spark.operators.mate import MATE
from datalake_indexes_spark.sources.catalog import LakeTableSpec


@pytest.fixture(scope="module")
def planted(spark):
    """Input dataset + mini-lake with known ground truth."""
    n = 40
    # input: query columns (director, title), target correlated with plant
    input_rows = [
        (f"Director {i % 10}", f"Movie Title {i}", float(i) / n + (i % 3) * 0.01)
        for i in range(n)
    ]
    input_df = spark.createDataFrame(
        input_rows, "director_name string, movie_title string, imdb_score double"
    )

    # lake_join_hi: covers 80% of input pairs; feat_num monotone in score;
    # feat_cat = binned score.  NOTE feat_num/noise are ints: the tokenizer
    # (like the reference's) folds '.' to space, so decimal strings like
    # '2.0' become the non-numeric token '2 0' — integer-rendered values
    # are what exercises the numeric Spearman path end-to-end.
    hi_rows = [
        (f"Director {i % 10}", f"Movie Title {i}", i * 2, f"bin{i // 10}", i % 7)
        for i in range(int(n * 0.8))
    ]
    lake_join_hi = spark.createDataFrame(
        hi_rows, "key1 string, key2 string, feat_num int, feat_cat string, noise int"
    )
    # lake_join_mid: single-column overlap on director only (40%)
    mid_rows = [(f"Director {i % 10}", 99.0, "pad") for i in range(16)]
    lake_join_mid = spark.createDataFrame(mid_rows, "key1 string, feat double, pad string")
    # duplicate pair: identical row multisets, different order + a chain 3rd
    dup_rows = [(f"k{i}", f"v{i % 5}") for i in range(12)]
    lake_dup_a = spark.createDataFrame(dup_rows, "c1 string, c2 string")
    lake_dup_b = spark.createDataFrame(list(reversed(dup_rows)), "c1 string, c2 string")
    lake_dup_c = spark.createDataFrame(dup_rows, "c1 string, c2 string")

    tables = {
        "lake_join_hi": lake_join_hi,
        "lake_join_mid": lake_join_mid,
        "lake_dup_a": lake_dup_a,
        "lake_dup_b": lake_dup_b,
        "lake_dup_c": lake_dup_c,
    }
    specs = {
        "lake_join_hi": LakeTableSpec(
            "lake_join_hi", 0, ("key1", "key2", "feat_num", "feat_cat", "noise"),
            ("key1", "key2"),
        ),
        "lake_join_mid": LakeTableSpec("lake_join_mid", 1, ("key1", "feat", "pad"), ("key1",)),
        "lake_dup_a": LakeTableSpec("lake_dup_a", 2, ("c1", "c2"), ("c1",)),
        "lake_dup_b": LakeTableSpec("lake_dup_b", 3, ("c1", "c2"), ("c1",)),
        "lake_dup_c": LakeTableSpec("lake_dup_c", 4, ("c1", "c2"), ("c1",)),
    }
    index = build_index(spark, tables, specs).cache()
    return {"input": input_df, "index": index}


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
