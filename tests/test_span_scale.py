"""Scale shape of the exact-span dedup (operators/dedup.py
repeated_spans / remove_repeated_spans): the df cap keeps ubiquitous
boilerplate grams out of the gram self-join (every doc here shares a
6-word footer — uncapped, its grams alone would contribute
~C(20k, 2) join rows), the run-merge windows ride the
(pair, diagonal) partitioning (0 global windows), and the composed
detect->remove pass over a 20k-doc corpus cuts exactly the planted
spans from exactly the non-canonical copies."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_indexes_spark.operators.dedup import (
    remove_repeated_spans,
    repeated_spans,
)
from datalake_indexes_spark.plans.audit import plan_report

N_DOCS = 20_000
PLANT_EVERY = 1_000  # ids 0, 1000, ..., 19000 carry the span
SPAN = " ".join(f"s{i}" for i in range(12))
FOOTER = "f0 f1 f2 f3 f4 f5"


def _corpus(spark):
    # prefix: 8 + id%3 doc-unique words (so planted spans sit on
    # DIFFERENT diagonals); planted docs insert the 12-word span plus a
    # doc-unique separator (so the span never merges into the footer);
    # every doc ends with the shared footer (the boilerplate the df cap
    # must drop before the self-join).
    return spark.range(N_DOCS).selectExpr(
        "id as doc_id",
        f"""
        concat_ws(' ',
          concat_ws(' ', transform(sequence(0, 7 + cast(id % 3 as int)),
                                   i -> concat('d', id, 'x', i))),
          CASE WHEN id % {PLANT_EVERY} = 0
               THEN concat('{SPAN}', ' sep', id)
               ELSE concat('p', id, ' q', id) END,
          '{FOOTER}') as text
        """,
    )


def test_planted_spans_20k_docs_with_boilerplate_footer(spark):
    docs = _corpus(spark)
    spans = repeated_spans(docs, k=5, min_words=10)

    rep = plan_report(spans)
    assert rep["n_global_windows"] == 0, rep
    assert rep["n_nested_loop_joins"] == 0, rep

    rows = spans.collect()
    planted = [i * PLANT_EVERY for i in range(N_DOCS // PLANT_EVERY)]
    want_pairs = {
        (a, b) for i, a in enumerate(planted) for b in planted[i + 1 :]
    }
    got = {(r["doc_id_1"], r["doc_id_2"]): r for r in rows}
    assert set(got) == want_pairs, (len(got), len(want_pairs))

    # every detected span is exactly the planted 12 words at the
    # doc-dependent prefix offset (8 + id%3)
    for (a, b), r in got.items():
        assert r["n_words"] == 12, r
        assert r["start_1"] == 8 + a % 3, r
        assert r["start_2"] == 8 + b % 3, r


def test_span_removal_cuts_only_non_canonical_copies(spark):
    docs = _corpus(spark)
    spans = repeated_spans(docs, k=5, min_words=10)
    out = remove_repeated_spans(docs, spans)

    removed = {
        r["doc_id"]: r["n_words_removed"]
        for r in out.filter(F.col("n_words_removed") > 0).collect()
    }
    planted = {i * PLANT_EVERY for i in range(N_DOCS // PLANT_EVERY)}
    # doc 0 is the smallest of the clique -> never doc_id_2 -> survives
    assert set(removed) == planted - {0}
    assert all(v == 12 for v in removed.values()), removed

    # the cleaned text of a cut doc no longer contains the span; the
    # canonical copy still does
    sample = out.filter(F.col("doc_id").isin(0, PLANT_EVERY)).collect()
    by_id = {r["doc_id"]: r["text_cleaned"] for r in sample}
    assert SPAN in by_id[0]
    assert SPAN not in by_id[PLANT_EVERY]


def test_cross_span_decontamination_20k_docs(spark):
    """Corpus-vs-benchmark at the same 20k-doc scale: a 20-question
    benchmark set against the footer-boilerplate corpus.  The reference
    side broadcasts (plan-pinned), matches stay bounded by
    benchmark-gram hits, and the cut removes exactly the leaked
    sentences from exactly the planted docs."""
    from datalake_indexes_spark.operators.dedup import (
        cross_repeated_spans,
        decontaminate_spans,
    )

    questions = [
        " ".join(f"q{j}w{i}" for i in range(12)) for j in range(20)
    ]
    # doc id i*500 + j leaks question j (i in 0..1, j in 0..19 -> 40 docs)
    leaked = {500 * i + j: j for i in range(2) for j in range(20)}
    case_sql = " ".join(
        f"WHEN id = {d} THEN concat(t0, ' ', '{questions[j]}')"
        for d, j in leaked.items()
    )
    base = spark.range(N_DOCS).selectExpr(
        "id",
        f"""concat_ws(' ',
            concat_ws(' ', transform(sequence(0, 7 + cast(id % 3 as int)),
                                     i -> concat('d', id, 'x', i))),
            '{FOOTER}') as t0""",
    )
    docs = base.selectExpr(
        "id as doc_id", f"CASE {case_sql} ELSE t0 END as text"
    )
    ref = spark.createDataFrame(
        [(j, q) for j, q in enumerate(questions)], "ref_id long, text string"
    )

    spans = cross_repeated_spans(docs, ref, k=5, min_words=10)
    rep = plan_report(spans)
    assert rep["n_broadcast_joins"] >= 1, rep
    assert rep["n_global_windows"] == 0, rep

    got = {(r["doc_id"], r["ref_id"]) for r in spans.collect()}
    assert got == {(d, j) for d, j in leaked.items()}

    out = decontaminate_spans(docs, ref, k=5, min_words=10)
    removed = {
        r["doc_id"]: r["n_words_removed"]
        for r in out.filter(F.col("n_words_removed") > 0).collect()
    }
    assert set(removed) == set(leaked)
    assert all(v == 12 for v in removed.values())


def test_self_span_cleanup_20k_docs(spark):
    """Intra-doc variant at 20k docs: every 400th doc repeats its
    12-word sentence three times; removal keeps exactly the first copy.
    The shared footer is NOT intra-doc repetition (one occurrence per
    doc) and must produce nothing."""
    from datalake_indexes_spark.operators.dedup import (
        remove_self_repetitions,
        self_repeated_spans,
    )
    from datalake_indexes_spark.plans.audit import plan_report

    sent = " ".join(f"r{i}" for i in range(12))
    docs = spark.range(N_DOCS).selectExpr(
        "id as doc_id",
        f"""
        concat_ws(' ',
          concat_ws(' ', transform(sequence(0, 7 + cast(id % 3 as int)),
                                   i -> concat('d', id, 'x', i))),
          CASE WHEN id % 400 = 0
               THEN '{sent} mid1 {sent} mid2 {sent}'
               ELSE concat('p', id) END,
          '{FOOTER}') as text
        """,
    )
    spans = self_repeated_spans(docs, k=5, min_words=10)
    rep = plan_report(spans)
    assert rep["n_global_windows"] == 0, rep

    planted = {i * 400 for i in range(N_DOCS // 400)}
    by_doc = {}
    for r in spans.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == planted

    out = remove_self_repetitions(docs, k=5, min_words=10)
    removed = {
        r["doc_id"]: r["n_words_removed"]
        for r in out.filter(F.col("n_words_removed") > 0).collect()
    }
    assert set(removed) == planted
    # copies 2 and 3 are cut: 24 words removed per planted doc
    assert all(v == 24 for v in removed.values()), sorted(removed.items())[:3]


def test_approx_df_cap_matches_exact_on_planted_corpus(spark):
    """The scale path for the df cap: HLL approx_count_distinct gates
    the same grams as the exact distinct on the 20k-doc corpus (the cap
    is a threshold, not a statistic — ~2% rsd cannot flip a 20-doc
    planted gram across a cap of 100 or a 20k-doc footer gram back
    under it), so the span output is identical."""
    docs = _corpus(spark)
    exact = sorted(
        tuple(r) for r in repeated_spans(docs, k=5, min_words=10).collect()
    )
    approx = sorted(
        tuple(r)
        for r in repeated_spans(
            docs, k=5, min_words=10, approx_df=True
        ).collect()
    )
    assert exact == approx and len(exact) > 0
