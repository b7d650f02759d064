"""Corpus-frequency line dedup (line_census / line_dedup) — hand-built
truth, reassembly order, empty-line and all-boilerplate contracts, and
the plan pin that the removal join is not a nested loop."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_indexes_spark.operators.dedup import line_census, line_dedup


def _docs(spark):
    rows = [
        # header appears in 3 docs; footer in 2; body lines unique
        (0, "HEADER\nalpha body zero\nFOOTER"),
        (1, "HEADER\nbeta body one"),
        (2, "  HEADER  \ngamma body two\nFOOTER"),  # trim-normalized match
        (3, "delta body three\n   \n"),  # whitespace-only + trailing empty
        (4, "HEADER"),  # fully boilerplate
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_census_truth(spark):
    got = {
        r["line_norm"]: (r["n_docs"], r["n_occurrences"])
        for r in line_census(_docs(spark), min_docs=2).collect()
    }
    assert got == {"HEADER": (4, 4), "FOOTER": (2, 2)}


def test_census_min_docs_threshold(spark):
    got = {r["line_norm"] for r in line_census(_docs(spark), min_docs=3).collect()}
    assert got == {"HEADER"}


def test_line_dedup_truth_and_order(spark):
    got = {r["doc_id"]: r.asDict() for r in line_dedup(_docs(spark), min_docs=2).collect()}
    assert len(got) == 5  # every doc keeps a row
    assert got[0]["text_filtered"] == "alpha body zero"
    assert (got[0]["n_lines"], got[0]["n_kept"]) == (3, 1)
    assert got[1]["text_filtered"] == "beta body one"
    assert got[2]["text_filtered"] == "gamma body two"
    # whitespace-only and empty trailing lines dropped, body kept
    assert got[3]["text_filtered"] == "delta body three"
    assert (got[3]["n_lines"], got[3]["n_kept"]) == (3, 1)
    # fully-boilerplate doc: present with empty text
    assert (got[4]["n_kept"], got[4]["text_filtered"]) == (0, "")


def test_line_dedup_preserves_intra_doc_order(spark):
    docs = spark.createDataFrame(
        [(0, "z last\nCOMMON\na first"), (1, "COMMON")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text_filtered"] for r in line_dedup(docs, min_docs=2).collect()}
    assert got[0] == "z last\na first"  # original order, not sorted text


def test_no_boilerplate_is_identity_minus_blanks(spark):
    docs = spark.createDataFrame(
        [(0, "only one\nbody here"), (1, "different text entirely")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in line_dedup(docs, min_docs=2).collect()}
    assert got[0]["text_filtered"] == "only one\nbody here"
    assert got[1]["n_kept"] == 1


def test_plan_no_nested_loop(spark):
    plan = line_dedup(_docs(spark), min_docs=2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_boilerplate_by_source_truth(spark):
    from datalake_indexes_spark.operators.dedup import boilerplate_by_source

    rows = [
        (0, "BANNER\nalpha one", "crawl_a"),
        (1, "BANNER\nbeta two", "crawl_a"),
        (2, "gamma three\ndelta four", "crawl_b"),
        (3, "BANNER", "crawl_b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["source"]: (r["n_lines"], r["n_boiler"], r["boiler_ratio"])
        for r in boilerplate_by_source(docs, min_docs=2).collect()
    }
    assert got["crawl_a"] == (4, 2, 0.5)
    assert got["crawl_b"] == (3, 1, round(1 / 3 + 1e-9, 6))


def test_regex_special_separator_is_literal(spark):
    # ADVICE r7: sep feeds Spark F.split (a Java regex) while the oracle
    # twin and the streaming store split literally — '.' must mean the
    # dot CHARACTER, not match-anything.
    rows = [
        (0, "HEADER.alpha one.FOOTER"),
        (1, "HEADER.beta two.FOOTER"),
        (2, "gamma three.HEADER"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    census = {
        r["line_norm"]: (r["n_docs"], r["n_occurrences"])
        for r in line_census(docs, min_docs=2, sep=".").collect()
    }
    assert census == {"HEADER": (3, 3), "FOOTER": (2, 2)}
    out = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["text_filtered"])
        for r in line_dedup(docs, min_docs=2, sep=".").collect()
    }
    assert out[0] == (3, 1, "alpha one")
    assert out[2] == (2, 1, "gamma three")
