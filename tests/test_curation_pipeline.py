"""Declarative curation runner (pipelines/curation.py): stage
composition, census math, transform stages, and config validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_indexes_spark.pipelines.curation import STAGES, run_curation


def _docs(spark):
    rows = [
        # good English-looking docs
        (0, "the quick brown fox jumps over the lazy dog and runs far. "
            "the weather is nice today and the market is open. "
            "we should take the data to the lake before noon."),
        (1, "a model of the data lake with many tables and the rows "
            "inside them. the index makes the scan fast and the join "
            "cheap. every query reads less than it would otherwise."),
        # exact duplicate of 1 (later id -> dropped by dedup_exact)
        (2, "a model of the data lake with many tables and the rows "
            "inside them. the index makes the scan fast and the join "
            "cheap. every query reads less than it would otherwise."),
        # low quality: repeated single word
        (3, "spam spam spam spam spam spam spam spam spam spam"),
        # PII to scrub, otherwise fine
        (4, "contact the owner at alice@example.com for the dataset and "
            "the schedule of the next load. the pipeline is run daily "
            "and the report lands in the morning."),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pipeline_composes_and_census_adds_up(spark):
    res = run_curation(
        _docs(spark),
        [
            {"stage": "max_repetition", "max_frac": 0.5},
            {"stage": "dedup_exact"},
            {"stage": "pii_scrub"},
        ],
    )
    docs = res.docs.collect()
    ids = sorted(r["doc_id"] for r in docs)
    assert ids == [0, 1, 4]  # 3 dropped by repetition, 2 by dedup
    # PII transform applied in place, schema preserved
    assert {f.name for f in res.docs.schema} == {"doc_id", "text"}
    scrubbed = {r["doc_id"]: r["text"] for r in docs}[4]
    assert "<EMAIL>" in scrubbed and "alice@example.com" not in scrubbed

    census = {r["stage_idx"]: r for r in res.census.collect()}
    assert census[0]["stage"] == "input" and census[0]["docs_out"] == 5
    assert census[1]["stage"] == "max_repetition"
    assert census[1]["docs_in"] == 5 and census[1]["docs_out"] == 4
    assert census[2]["stage"] == "dedup_exact" and census[2]["docs_out"] == 3
    assert census[3]["dropped"] == 0  # scrub transforms, never drops
    # funnel invariant: docs_in of stage k == docs_out of stage k-1
    for i in range(1, 4):
        assert census[i]["docs_in"] == census[i - 1]["docs_out"]


def test_pipeline_decontaminate_needs_benchmark(spark):
    with pytest.raises(ValueError, match="benchmark"):
        run_curation(_docs(spark), [{"stage": "decontaminate"}])


def test_pipeline_unknown_stage(spark):
    with pytest.raises(ValueError, match="unknown curation stage"):
        run_curation(_docs(spark), [{"stage": "nope"}])


def test_pipeline_empty_stages_is_identity(spark):
    docs = _docs(spark)
    res = run_curation(docs, [])
    assert res.docs.count() == 5
    c = res.census.collect()
    assert len(c) == 1 and c[0]["stage"] == "input"


def test_registry_stages_all_runnable(spark):
    """Every registered filter stage runs on the fixture (smoke; the
    stages needing extra inputs are exercised elsewhere)."""
    docs = _docs(spark)
    for name in ("quality_min", "c4_rules", "langs", "max_repetition",
                 "dedup_exact", "dedup_minhash", "self_span_cleanup"):
        out = STAGES[name](docs, "doc_id", "text")
        assert set(out.columns) == {"doc_id", "text"}
        out.count()


def test_pipeline_persist_stages_same_result(spark):
    """persist_stages changes cost, never results; unpersist releases."""
    stages = [
        {"stage": "max_repetition", "max_frac": 0.5},
        {"stage": "dedup_exact"},
    ]
    plain = run_curation(_docs(spark), stages)
    cached = run_curation(_docs(spark), stages, persist_stages=True)
    assert sorted(r["doc_id"] for r in plain.docs.collect()) == sorted(
        r["doc_id"] for r in cached.docs.collect()
    )
    assert [tuple(r) for r in plain.census.collect()] == [
        tuple(r) for r in cached.census.collect()
    ]
    cached.unpersist()


def test_pipeline_decontaminate_spans_stage(spark):
    """The span stage CUTS the leaked benchmark words, keeps the doc
    (unlike `decontaminate`, which drops it), and drops docs that end
    up empty; composes with downstream stages on the cleaned text."""
    q = "which benchmark question leaked verbatim into the training corpus today"
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog and runs far "
                "while the weather stays nice and the market stays open"),
            (1, "prefix words here " + q + " suffix words tail"),
            (2, q),  # fully leaked -> empty after the cut -> dropped
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(0, q)], "ref_id long, text string")
    res = run_curation(
        docs,
        [
            {"stage": "decontaminate_spans", "benchmark": bench,
             "k": 5, "min_words": 10},
            {"stage": "dedup_exact"},
        ],
    )
    out = {r["doc_id"]: r["text"] for r in res.docs.collect()}
    assert set(out) == {0, 1}
    assert q not in out[1]
    assert out[1] == "prefix words here suffix words tail"
    census = {r["stage"]: (r["docs_in"], r["docs_out"])
              for r in res.census.collect()}
    assert census["decontaminate_spans"] == (3, 2)


def test_pipeline_self_span_cleanup_stage(spark):
    s = "the board meets every other thursday at nine in the main hall"
    docs = spark.createDataFrame(
        [
            (0, "intro " + s + " mid words " + s + " outro"),
            (1, "a clean doc with no internal repetition whatsoever here"),
        ],
        "doc_id long, text string",
    )
    res = run_curation(docs, [{"stage": "self_span_cleanup"}])
    out = {r["doc_id"]: r["text"] for r in res.docs.collect()}
    assert out[0] == "intro " + s + " mid words outro"
    assert out[1] == "a clean doc with no internal repetition whatsoever here"
    census = {r["stage"]: (r["docs_in"], r["docs_out"])
              for r in res.census.collect()}
    assert census["self_span_cleanup"] == (2, 2)  # transform, never drops


def test_decontaminate_spans_stage_empty_docs_pass_through(spark):
    """Docs the cut did NOT touch survive whatever their length — empty
    and null docs included; only docs the cut emptied are dropped.  The
    stage also forwards the stop-phrase cap knob."""
    q = "which benchmark question leaked verbatim into the training corpus today"
    docs = spark.createDataFrame(
        [(0, ""), (1, None), (2, q), (3, "fine doc with original words")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(0, q)], "ref_id long, text string")
    res = run_curation(
        docs,
        [{"stage": "decontaminate_spans", "benchmark": bench,
          "max_ref_gram_freq": 500}],  # forwarded, not TypeError
    )
    out = {r["doc_id"]: r["text"] for r in res.docs.collect()}
    assert set(out) == {0, 1, 3}  # only the fully-leaked doc 2 dropped
    assert out[0] == "" and out[1] is None


def test_pipeline_span_dedup_stage(spark):
    """Inter-doc span cut inside the runner: the smallest-id copy keeps
    the span, later copies lose exactly it; doc count is unchanged."""
    s = "one two three four five six seven eight nine ten eleven twelve"
    docs = spark.createDataFrame(
        [
            (0, "intro " + s + " tail"),
            (1, s + " different ending here"),
            (2, "unrelated original content in this one entirely ok"),
        ],
        "doc_id long, text string",
    )
    res = run_curation(docs, [{"stage": "span_dedup"}])
    out = {r["doc_id"]: r["text"] for r in res.docs.collect()}
    assert len(out) == 3
    assert out[0] == "intro " + s + " tail"       # canonical copy intact
    assert out[1] == "different ending here"       # span cut
    assert out[2].startswith("unrelated")


def test_pipeline_new_curation_stages(spark):
    """gopher_rules, dsir_top_fraction, nb_langs compose in one config
    (the lang-aware stages need a lang column, provided here)."""
    rows = [
        (0, "the data runs well today and the model trains fast", "en"),
        (1, "the index scans the lake and the join is cheap", "en"),
        (2, "der see und die daten laufen mit dem modell", "de"),
        (3, "111 222 333 444 555 666 777 888 999 000", "en"),  # no alpha
        (4, "el lago y los datos corren con el modelo", "es"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    out = STAGES["gopher_rules"](docs, "doc_id", "text",
                                 min_words=3, min_stopwords=1)
    kept = {r["doc_id"] for r in out.collect()}
    assert 3 not in kept          # numeral doc fails the alpha rule
    assert {0, 1} <= kept         # English docs with 'the' pass

    sel = STAGES["dsir_top_fraction"](docs, "doc_id", "text", fraction=0.4)
    sel_ids = {r["doc_id"] for r in sel.collect()}
    assert len(sel_ids) == 2      # ceil(5 * 0.4)
    assert sel.columns == docs.columns

    nb = STAGES["nb_langs"](docs, "doc_id", "text", keep=["en"])
    nb_ids = {r["doc_id"] for r in nb.collect()}
    assert nb_ids <= {0, 1, 3}    # only docs the model calls English

    res = run_curation(
        docs,
        [
            {"stage": "gopher_rules", "min_words": 3, "min_stopwords": 1},
            {"stage": "dsir_top_fraction", "fraction": 0.8},
        ],
    )
    assert res.docs.count() <= 4
    census = {r["stage"]: r for r in res.census.collect()}
    assert "gopher_rules" in census and "dsir_top_fraction" in census
