"""ML hooks (operators/ml.py — the reference's machine_learning.py:9-51
flow on MLlib): seeded determinism, RMSE bounds on a planted fixture, and
permutation-importance ordering.

The fixture plants y = 3*x_signal + tiny deterministic noise with x_noise
uncorrelated, so the expected results are known in advance:
- the fitted model must essentially recover y (test RMSE << target std);
- permuting x_signal must destroy the fit (large importance);
- permuting x_noise must not (importance ~ 0);
- everything must reproduce exactly under the same seed (the permutation
  is content-hash-based, not partition-dependent rand).
"""

from __future__ import annotations

import math

import pytest

from datalake_indexes_spark.operators.ml import fit_and_evaluate, permutation_importance


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        (
            float(i % 50),  # x_signal
            float((i * 131) % 97),  # x_noise, uncorrelated with y
            3.0 * (i % 50) + float((i * 17) % 7) * 0.01,  # y
        )
        for i in range(400)
    ]
    return spark.createDataFrame(rows, "x_signal double, x_noise double, y double")


@pytest.mark.spark
def test_fit_rmse_bounds_and_determinism(planted):
    fit1 = fit_and_evaluate(planted, "y", ["x_signal", "x_noise"], seed=7)
    fit2 = fit_and_evaluate(planted, "y", ["x_signal", "x_noise"], seed=7)
    # planted signal: target std is ~43 (3 * std of 0..49); a model that
    # learned anything lands far below that
    assert math.isfinite(fit1["rmse"]) and fit1["rmse"] < 5.0
    assert fit1["rmse"] == fit2["rmse"]  # same seed => bit-identical
    assert fit1["n_train"] + fit1["n_test"] == 400
    assert fit1["n_test"] > 0


@pytest.mark.spark
def test_permutation_importance_ordering_and_determinism(planted):
    imp1 = {
        r["feature"]: r
        for r in permutation_importance(
            planted, "y", ["x_signal", "x_noise"], seed=7
        ).collect()
    }
    # permuting the planted signal must blow up RMSE; the noise column not
    assert imp1["x_signal"]["importance"] > 10.0
    assert abs(imp1["x_noise"]["importance"]) < 5.0
    assert imp1["x_signal"]["importance"] > 3 * abs(imp1["x_noise"]["importance"])
    # base_rmse column matches the standalone fit
    base = fit_and_evaluate(planted, "y", ["x_signal", "x_noise"], seed=7)["rmse"]
    assert imp1["x_signal"]["base_rmse"] == pytest.approx(base)

    imp2 = {
        r["feature"]: r["permuted_rmse"]
        for r in permutation_importance(
            planted, "y", ["x_signal", "x_noise"], seed=7
        ).collect()
    }
    for feat, row in imp1.items():  # content-hash permutation: exact repro
        assert imp2[feat] == row["permuted_rmse"]


def test_winsorize_clamps_to_exact_percentiles(spark):
    """1..100 at p10/p90: values clamp into [10.9, 90.1] (exact
    interpolated percentiles) and interior values are untouched."""
    from datalake_indexes_spark.operators.ml import winsorize

    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "x double")
    out = winsorize(df, ["x"], p_low=0.1, p_high=0.9)
    rows = sorted(round(r["x"], 9) for r in out.collect())
    assert rows[0] == 10.9 and rows[-1] == 90.1
    assert rows.count(10.9) == 10 and rows.count(90.1) == 10
    assert 50.0 in rows


def test_winsorize_all_null_column_passthrough(spark):
    from datalake_indexes_spark.operators.ml import winsorize

    df = spark.createDataFrame([(None,), (None,)], "x double")
    assert [r["x"] for r in winsorize(df, ["x"]).collect()] == [None, None]


def test_target_encode_out_of_fold_excludes_own_label(spark):
    """With one category and extreme values concentrated in one fold, the
    out-of-fold encoding for that fold must NOT include its own values:
    hand-compute the smoothed mean and compare."""
    from datalake_indexes_spark.operators.ml import target_encode

    rows = [(i, "A", 100.0 if i % 2 == 0 else 0.0) for i in range(40)]
    df = spark.createDataFrame(rows, "rid long, cat string, y double")
    out = target_encode(df, "cat", "y", "rid", n_folds=4, smoothing=2.0)
    got = {r["rid"]: (r["fold"], r["encoded"]) for r in out.collect()}
    assert len(got) == 40

    # recompute expectations exactly as documented
    import hashlib

    def fold(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 4

    tot = sum(y for _, _, y in rows)
    g = tot / 40
    per = {}
    for i, _, y in rows:
        f = fold(i)
        s, c = per.get(f, (0.0, 0))
        per[f] = (s + y, c + 1)
    for i, _, y in rows:
        f = fold(i)
        fs, fc = per[f]
        want = round((tot - fs + 2.0 * g) / (40 - fc + 2.0), 6)
        assert got[i] == (f, want)


def test_robust_scale_median_zero_iqr_one(spark):
    from datalake_indexes_spark.operators.ml import robust_scale

    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "x double")
    out = sorted(round(r["x"], 6) for r in robust_scale(df, ["x"]).collect())
    # median 50.5; exact interpolated quartiles 25.75 / 75.25 -> IQR 49.5
    assert out[0] == round((1 - 50.5) / 49.5, 6)
    assert out[-1] == round((100 - 50.5) / 49.5, 6)


def test_robust_scale_constant_column(spark):
    from datalake_indexes_spark.operators.ml import robust_scale

    df = spark.createDataFrame([(5.0,), (5.0,), (None,)], "x double")
    vals = [r["x"] for r in robust_scale(df, ["x"]).collect()]
    assert sorted(v for v in vals if v is not None) == [0.0, 0.0]
    assert vals.count(None) == 1


def test_correlation_matrix_known_values(spark):
    from datalake_indexes_spark.operators.ml import correlation_matrix

    rows = [(float(i), 2.0 * i + 1, float(-i)) for i in range(50)]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    got = {(r["col_1"], r["col_2"]): r["corr"]
           for r in correlation_matrix(df, ["a", "b", "c"]).collect()}
    assert got[("a", "b")] == 1.0
    assert got[("a", "c")] == -1.0
    assert got[("b", "c")] == -1.0


def test_embedding_covariance_matches_numpy(spark):
    import numpy as np

    from datalake_indexes_spark.operators.similarity import embedding_covariance

    rng = np.random.RandomState(7)
    mat = rng.randn(50, 6)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<double>",
    )
    out = {(r.dim_i, r.dim_j): r.cov for r in embedding_covariance(emb).collect()}
    expected = np.cov(mat, rowvar=False, bias=True)
    assert len(out) == 6 * 7 // 2
    for (i, j), c in out.items():
        assert abs(c - round(float(expected[i][j]), 6)) < 1e-9


def test_pca_project_matches_numpy_and_contracts(spark):
    """Projected variances equal the top eigenvalues, components are
    orthogonal in data space, and values match a straight numpy PCA up
    to the deterministic sign convention."""
    import numpy as np

    from datalake_indexes_spark.operators.similarity import pca_project

    rng = np.random.RandomState(11)
    # anisotropic cloud: two dominant directions
    base = rng.randn(200, 2) @ np.array([[5.0, 0, 0, 0], [0, 2.0, 0, 0]])
    mat = base + 0.1 * rng.randn(200, 4) + np.array([1.0, -2.0, 3.0, 0.5])
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<double>",
    )
    rows = pca_project(emb, n_components=2).collect()
    got = np.zeros((200, 2))
    ratios = {}
    for r in rows:
        got[r.vec_id][r.component] = r.value
        ratios[r.component] = r.explained_ratio

    centered = mat - mat.mean(axis=0)
    cov = np.cov(mat, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:2]
    for c, idx in enumerate(order):
        v = vecs[:, idx]
        v = v if v[int(np.argmax(np.abs(v)))] >= 0 else -v
        np.testing.assert_allclose(got[:, c], centered @ v, atol=1e-4)
        assert abs(ratios[c] - vals[idx] / vals.sum()) < 1e-6
        assert abs(got[:, c].var() - vals[idx]) < 1e-3 * max(vals[idx], 1)
    # orthogonality of the two projected coordinates
    assert abs(np.corrcoef(got[:, 0], got[:, 1])[0, 1]) < 1e-6


def test_pca_identity_report_pins_zero_residuals(spark):
    """The strict-oracle surface for the eigen step: residual columns sit
    at exactly 0.0 / true after rounding (what the DuckDB twin pins as
    literals), and trace_cov equals the summed per-dim variance."""
    import numpy as np

    from datalake_indexes_spark.operators.similarity import pca_identity_report

    rng = np.random.RandomState(23)
    base = rng.randn(150, 2) @ np.array([[4.0, 0, 0, 0], [0, 1.5, 0, 0]])
    mat = base + 0.05 * rng.randn(150, 4) + np.array([0.5, -1.0, 2.0, 0.0])
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<double>",
    )
    rows = pca_identity_report(emb, n_components=3).collect()
    assert [r.component for r in sorted(rows, key=lambda r: r.component)] == [0, 1, 2]
    expected_trace = round(float(np.cov(mat, rowvar=False, bias=True).trace()), 6)
    for r in rows:
        assert r.var_residual == 0.0
        assert r.max_abs_xcov == 0.0
        assert r.mean_residual == 0.0
        assert r.ratio_monotone is True
        assert abs(r.trace_cov - expected_trace) < 1e-9
