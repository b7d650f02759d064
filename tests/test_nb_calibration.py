"""NB calibration report — margin/bin algebra vs the exposed score
frame, separable-vs-confusable accuracy split, and the classify
refactor's identity with the score frame's argmax."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_indexes_spark.operators.ml import (
    hashed_nb_classify,
    nb_calibration_report,
    nb_class_docs,
    nb_scores_with_model,
    nb_token_counts,
)


def _docs(spark):
    # two separable classes (distinct marker vocab) + docs that mix both
    # vocabularies equally (small margin, coin-flip accuracy)
    rows = []
    for i in range(12):
        rows.append((i, "aaa bbb ccc aaa bbb ccc aaa bbb ccc", "x"))
    for i in range(12, 24):
        rows.append((i, "ddd eee fff ddd eee fff ddd eee fff", "y"))
    for i in range(24, 30):
        rows.append((i, "aaa ddd", "x" if i % 2 else "y"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_margin_matches_exposed_scores(spark):
    docs = _docs(spark)
    scored = nb_scores_with_model(
        docs,
        nb_token_counts(docs, n_buckets=64),
        nb_class_docs(docs),
        n_buckets=64,
    ).collect()
    by_doc = {}
    for r in scored:
        by_doc.setdefault(r["doc_id"], []).append((r["__score"], r["cls"]))
    margins = {
        d: sorted(v, reverse=True)[0][0] - sorted(v, reverse=True)[1][0]
        for d, v in by_doc.items()
    }
    rep = nb_calibration_report(docs, n_buckets=64, bin_width=2.0, n_bins=8).collect()
    assert sum(r["n_docs"] for r in rep) == 30
    # per-bin doc counts reproduce from the margins
    import collections

    expect = collections.Counter(min(int(m // 2.0), 7) for m in margins.values())
    assert {r["bin"]: r["n_docs"] for r in rep} == dict(expect)


def test_separable_bins_are_accurate_confusable_are_not(spark):
    rep = nb_calibration_report(
        _docs(spark), n_buckets=64, bin_width=2.0, n_bins=8
    ).collect()
    lo = [r for r in rep if r["bin"] == 0]
    hi = [r for r in rep if r["bin"] > 0]
    assert hi and all(r["accuracy"] == 1.0 for r in hi)  # separable mass
    assert lo and lo[0]["n_docs"] == 6 and lo[0]["accuracy"] < 1.0


def test_classify_is_scores_argmax(spark):
    docs = _docs(spark)
    pred = {r["doc_id"]: r["pred_label"] for r in hashed_nb_classify(docs, n_buckets=64).collect()}
    scored = nb_scores_with_model(
        docs,
        nb_token_counts(docs, n_buckets=64),
        nb_class_docs(docs),
        n_buckets=64,
    ).collect()
    best = {}
    for r in scored:
        cur = best.get(r["doc_id"])
        key = (r["__score"], r["cls"])
        if cur is None or key > cur:
            best[r["doc_id"]] = key
    assert pred == {d: c for d, (_s, c) in best.items()}
