"""Sufficient-statistics ML operators vs numpy closed forms."""

from __future__ import annotations

import numpy as np
import pytest

from quackosm_spark.operators import ml


@pytest.fixture(scope="module")
def xy_df(spark):
    rng = np.random.RandomState(7)
    x = rng.uniform(-3, 3, size=(400, 3))
    true_beta = np.array([2.0, -1.5, 0.5])
    y = 4.0 + x @ true_beta + rng.normal(0, 0.01, size=400)
    rows = [
        (float(a), float(b), float(c), float(t))
        for (a, b, c), t in zip(x, y)
    ]
    return (
        spark.createDataFrame(rows, "x1 double, x2 double, x3 double, y double")
        .repartition(4)
        .cache()
    )


def _numpy_ridge(x, y, l2, fit_intercept=True):
    n, p = x.shape
    if fit_intercept:
        xd = np.hstack([np.ones((n, 1)), x])
        pen = np.diag([0.0] + [l2] * p)
    else:
        xd = x
        pen = l2 * np.eye(p)
    beta = np.linalg.solve(xd.T @ xd + pen, xd.T @ y)
    return beta


def _collect_xy(df):
    pdf = df.toPandas()
    return pdf[["x1", "x2", "x3"]].to_numpy(), pdf["y"].to_numpy()


class TestRidge:
    def test_ols_matches_numpy(self, xy_df):
        model = ml.ridge_fit_normal_eq(xy_df, ["x1", "x2", "x3"], "y")
        x, y = _collect_xy(xy_df)
        beta = _numpy_ridge(x, y, 0.0)
        assert model["intercept"] == pytest.approx(beta[0], rel=1e-9)
        for i, c in enumerate(["x1", "x2", "x3"]):
            assert model["coef"][c] == pytest.approx(beta[i + 1], rel=1e-9)
        # near-noiseless generator: recovers the true coefficients
        assert model["coef"]["x1"] == pytest.approx(2.0, abs=0.01)
        assert model["intercept"] == pytest.approx(4.0, abs=0.01)

    def test_l2_matches_numpy_and_shrinks(self, xy_df):
        model = ml.ridge_fit_normal_eq(xy_df, ["x1", "x2", "x3"], "y", l2=50.0)
        x, y = _collect_xy(xy_df)
        beta = _numpy_ridge(x, y, 50.0)
        for i, c in enumerate(["x1", "x2", "x3"]):
            assert model["coef"][c] == pytest.approx(beta[i + 1], rel=1e-9)
        ols = ml.ridge_fit_normal_eq(xy_df, ["x1", "x2", "x3"], "y")
        # penalty shrinks every slope toward zero
        for c in ["x1", "x2", "x3"]:
            assert abs(model["coef"][c]) < abs(ols["coef"][c])

    def test_no_intercept(self, xy_df):
        model = ml.ridge_fit_normal_eq(
            xy_df, ["x1", "x2", "x3"], "y", fit_intercept=False
        )
        x, y = _collect_xy(xy_df)
        beta = _numpy_ridge(x, y, 0.0, fit_intercept=False)
        assert model["intercept"] == 0.0
        for i, c in enumerate(["x1", "x2", "x3"]):
            assert model["coef"][c] == pytest.approx(beta[i], rel=1e-9)

    def test_linear_score_matches_dot_product(self, xy_df):
        model = ml.ridge_fit_normal_eq(xy_df, ["x1", "x2", "x3"], "y")
        scored = xy_df.withColumn(
            "pred", ml.linear_score(model, ["x1", "x2", "x3"])
        ).toPandas()
        x = scored[["x1", "x2", "x3"]].to_numpy()
        expect = model["intercept"] + x @ np.array(
            [model["coef"][c] for c in ["x1", "x2", "x3"]]
        )
        np.testing.assert_allclose(scored["pred"].to_numpy(), expect, rtol=1e-12)
        # fit quality sanity: near-noiseless → predictions track y
        resid = scored["pred"].to_numpy() - scored["y"].to_numpy()
        assert np.abs(resid).max() < 0.1

    def test_suffstats_shape(self, xy_df):
        s = ml.regression_suffstats(xy_df, ["x1", "x2"], "y")
        assert s["n"] == 400.0
        assert s["sxx"].shape == (2, 2)
        assert s["sxx"][0, 1] == s["sxx"][1, 0]


class TestCorrelationMatrix:
    def test_matches_numpy_corrcoef(self, xy_df, spark):
        out = ml.correlation_matrix(xy_df, ["x1", "x2", "x3", "y"]).toPandas()
        assert len(out) == 6
        pdf = xy_df.toPandas()
        m = np.corrcoef(pdf[["x1", "x2", "x3", "y"]].to_numpy().T)
        names = ["x1", "x2", "x3", "y"]
        for _, r in out.iterrows():
            i, j = names.index(r["col_a"]), names.index(r["col_b"])
            assert r["corr"] == pytest.approx(m[i, j], rel=1e-9)

    def test_suffstats_variant_matches(self, xy_df):
        names = ["x1", "x2", "x3", "y"]
        a = {
            (r["col_a"], r["col_b"]): r["corr"]
            for _, r in ml.correlation_matrix(xy_df, names)
            .toPandas()
            .iterrows()
        }
        b = {
            (r["col_a"], r["col_b"]): r["corr"]
            for _, r in ml.correlation_matrix_suffstats(xy_df, names)
            .toPandas()
            .iterrows()
        }
        assert set(a) == set(b) and len(a) == 6
        for k in a:
            assert b[k] == pytest.approx(a[k], rel=1e-9)
