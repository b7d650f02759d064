"""Vocabulary growth curve + Heaps fit — hand-built truth, numpy OLS
replica, saturation behavior."""

from __future__ import annotations

import math

import numpy as np

from datalake_indexes_spark.operators.text_analysis import (
    vocab_growth_curve,
    vocab_heaps_fit,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_hand_built_curve(spark):
    rows = ["a b", "a c", "a b", "d e"]  # new words: 2, 1, 0, 2
    got = {
        r["bucket"]: (r["docs_cum"], r["tokens_cum"], r["vocab_cum"])
        for r in vocab_growth_curve(_docs(spark, rows), interval=2).collect()
    }
    assert got == {0: (2, 4, 3), 1: (4, 8, 5)}


def test_saturated_source_flattens(spark):
    rows = ["x y z"] * 8  # vocabulary exhausted after the first doc
    curve = sorted(
        (r["bucket"], r["vocab_cum"], r["tokens_cum"])
        for r in vocab_growth_curve(_docs(spark, rows), interval=2).collect()
    )
    assert [v for _b, v, _t in curve] == [3, 3, 3, 3]  # flat vocab
    assert [t for _b, _v, t in curve] == [6, 12, 18, 24]  # tokens climb


def test_heaps_fit_matches_numpy_ols(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pts = [
        (r["tokens_cum"], r["vocab_cum"])
        for r in vocab_growth_curve(docs, interval=10).collect()
    ]
    x = np.log([p[0] for p in pts])
    y = np.log([p[1] for p in pts])
    beta, logk = np.polyfit(x, y, 1)
    r = vocab_heaps_fit(docs, interval=10).collect()[0]
    assert r["n_points"] == len(pts)
    assert abs(r["beta"] - beta) < 1e-4
    assert abs(r["log_k"] - logk) < 1e-4
    # the synthetic fixture's vocabulary saturates after the first
    # block, and the gauge says exactly that: beta ~ 0, r2 ~ 0 (the
    # Heaps-regime behavior is asserted on the engineered corpus below)
    assert abs(r["beta"]) < 0.05


def test_power_law_recovered_exactly(spark):
    # synthetic corpus engineered so V ~ N^0.5 on the curve points is a
    # real (noisy-but-strong) power law -> high r2 and beta near 0.5
    rows = []
    wid = 0
    for i in range(40):
        # doc i introduces roughly d/dN of sqrt: new words thin out
        n_new = max(int(math.isqrt(5 * (i + 1))) - int(math.isqrt(5 * i)), 0)
        words = [f"n{wid + j}" for j in range(n_new)] + ["pad"] * (5 - n_new)
        wid += n_new
        rows.append(" ".join(words))
    r = vocab_heaps_fit(_docs(spark, rows), interval=5).collect()[0]
    assert r["r2"] > 0.9
    assert 0.2 < r["beta"] < 0.8
