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

    def test_null_rows_dropped_listwise(self, spark):
        """n must stay consistent with the NULL-skipping sums: a row with
        any NULL feature/target is excluded entirely, so the fit equals
        the fit on the complete rows only."""
        full = [(1.0, 2.0, 5.0), (2.0, 1.0, 7.0), (3.0, 4.0, 9.0),
                (4.0, 2.0, 12.0), (5.0, 5.0, 14.0)]
        withnull = full + [(None, 3.0, 8.0), (2.5, None, 6.0),
                           (1.5, 2.5, None)]
        df_full = spark.createDataFrame(
            full, "x1 double, x2 double, y double"
        )
        df_null = spark.createDataFrame(
            withnull, "x1 double, x2 double, y double"
        )
        a = ml.ridge_fit_normal_eq(df_full, ["x1", "x2"], "y")
        b = ml.ridge_fit_normal_eq(df_null, ["x1", "x2"], "y")
        assert b["intercept"] == pytest.approx(a["intercept"], rel=1e-12)
        assert b["coef"] == pytest.approx(a["coef"], rel=1e-12)
        s = ml.regression_suffstats(df_null, ["x1", "x2"], "y")
        assert s["n"] == 5.0


class TestGroupwiseLinearFit:
    def test_matches_per_group_polyfit(self, spark):
        rng = np.random.RandomState(3)
        rows = []
        for g, (slope, icpt) in enumerate([(2.0, 1.0), (-0.5, 3.0), (0.0, 7.0)]):
            x = rng.randint(0, 50, size=60)
            y = np.round(icpt + slope * x + rng.randint(-2, 3, size=60))
            rows += [(f"g{g}", int(a), int(b)) for a, b in zip(x, y)]
        df = spark.createDataFrame(rows, "group string, x long, y long")
        out = (
            ml.groupwise_linear_fit(df, "group", "x", "y")
            .toPandas()
            .set_index("group")
        )
        pdf = df.toPandas()
        for g, sub in pdf.groupby("group"):
            beta = np.polyfit(sub["x"], sub["y"], 1)
            assert out.loc[g, "slope"] == pytest.approx(beta[0], rel=1e-9)
            assert out.loc[g, "intercept"] == pytest.approx(beta[1], rel=1e-9)
            assert out.loc[g, "n"] == len(sub)

    def test_zero_variance_group_is_null(self, spark):
        df = spark.createDataFrame(
            [("a", 5, 1), ("a", 5, 2), ("b", 1, 1), ("b", 2, 3)],
            "group string, x long, y long",
        )
        out = (
            ml.groupwise_linear_fit(df, "group", "x", "y")
            .toPandas()
            .set_index("group")
        )
        assert out.loc["a", "slope"] is None or np.isnan(out.loc["a", "slope"])
        assert out.loc["b", "slope"] == pytest.approx(2.0)


def _numpy_irls(x, y, iters, l2=0.0):
    n, p = x.shape
    xd = np.hstack([np.ones((n, 1)), x])
    beta = np.zeros(p + 1)
    for _ in range(iters):
        mu = 1.0 / (1.0 + np.exp(-(xd @ beta)))
        w = mu * (1.0 - mu)
        grad = xd.T @ (y - mu)
        hess = (xd * w[:, None]).T @ xd
        if l2:
            pen = np.diag([0.0] + [l2] * p)
            hess = hess + pen
            grad = grad - pen @ beta
        beta = beta + np.linalg.solve(hess, grad)
    return beta


class TestLogisticIRLS:
    @pytest.fixture(scope="class")
    def logit_df(self, spark):
        rng = np.random.RandomState(11)
        x = rng.uniform(-2, 2, size=(500, 2))
        eta = -0.5 + 1.5 * x[:, 0] - 2.0 * x[:, 1]
        y = (rng.uniform(size=500) < 1.0 / (1.0 + np.exp(-eta))).astype(float)
        rows = [
            (float(a), float(b), float(t)) for (a, b), t in zip(x, y)
        ]
        return (
            spark.createDataFrame(rows, "x1 double, x2 double, y double")
            .repartition(4)
            .cache()
        )

    def test_matches_numpy_irls(self, logit_df):
        model = ml.logistic_fit_irls(logit_df, ["x1", "x2"], "y", iters=6)
        pdf = logit_df.toPandas()
        beta = _numpy_irls(
            pdf[["x1", "x2"]].to_numpy(), pdf["y"].to_numpy(), iters=6
        )
        assert model["intercept"] == pytest.approx(beta[0], rel=1e-7)
        assert model["coef"]["x1"] == pytest.approx(beta[1], rel=1e-7)
        assert model["coef"]["x2"] == pytest.approx(beta[2], rel=1e-7)
        # recovers the generating signs and rough magnitudes
        assert model["coef"]["x1"] > 0.8 and model["coef"]["x2"] < -1.2

    def test_l2_matches_numpy_and_shrinks(self, logit_df):
        model = ml.logistic_fit_irls(
            logit_df, ["x1", "x2"], "y", iters=6, l2=25.0
        )
        pdf = logit_df.toPandas()
        beta = _numpy_irls(
            pdf[["x1", "x2"]].to_numpy(), pdf["y"].to_numpy(), iters=6, l2=25.0
        )
        assert model["coef"]["x1"] == pytest.approx(beta[1], rel=1e-7)
        assert model["coef"]["x2"] == pytest.approx(beta[2], rel=1e-7)
        unpen = ml.logistic_fit_irls(logit_df, ["x1", "x2"], "y", iters=6)
        assert abs(model["coef"]["x1"]) < abs(unpen["coef"]["x1"])
        assert abs(model["coef"]["x2"]) < abs(unpen["coef"]["x2"])

    def test_logistic_score_column(self, logit_df):
        model = ml.logistic_fit_irls(logit_df, ["x1", "x2"], "y", iters=6)
        scored = logit_df.withColumn(
            "p", ml.logistic_score(model, ["x1", "x2"])
        ).toPandas()
        assert ((scored["p"] > 0) & (scored["p"] < 1)).all()
        # classifier beats chance comfortably on its own training data
        acc = ((scored["p"] > 0.5) == (scored["y"] > 0.5)).mean()
        assert acc > 0.8


def _numpy_auc(scores, labels):
    # tie-aware Mann-Whitney, independent formulation (per-pair count)
    pos = scores[labels == 1]
    neg = scores[labels == 0]
    wins = 0.0
    for s in pos:
        wins += (s > neg).sum() + 0.5 * (s == neg).sum()
    return wins / (len(pos) * len(neg))


class TestBinaryAuc:
    def test_matches_pairwise_definition_with_ties(self, spark):
        rng = np.random.RandomState(5)
        scores = rng.randint(0, 20, size=300).astype(float)  # heavy ties
        labels = (rng.uniform(size=300) < 1 / (1 + np.exp(3 - scores / 3))).astype(int)
        if labels.sum() in (0, 300):
            labels[0] = 1 - labels[0]
        df = spark.createDataFrame(
            [(float(s), int(y)) for s, y in zip(scores, labels)],
            "score double, y int",
        ).repartition(4)
        row = ml.binary_auc(df, "score", "y").collect()[0]
        assert row["auc"] == pytest.approx(_numpy_auc(scores, labels), rel=1e-12)
        assert row["n_pos"] == int(labels.sum())
        assert row["n_neg"] == int(300 - labels.sum())

    def test_bucketed_prefix_handles_sparse_and_boundary_scores(self, spark):
        """r06 two-pass prefix machinery: clustered continuous scores far
        apart (most of the 1024 range buckets empty), values landing
        exactly on bucket edges (min, max, negatives), heavy ties at the
        extremes — must still match the pairwise definition exactly."""
        rng = np.random.RandomState(11)
        a = rng.normal(-1e6, 1.0, size=150)   # far-left cluster
        b = rng.normal(1e6, 1.0, size=150)    # far-right cluster
        edges = np.array([-1e6, 1e6, -1e6, 1e6, 0.0])  # exact-boundary ties
        scores = np.concatenate([a, b, edges])
        labels = (scores > 0).astype(int)
        labels[::7] = 1 - labels[::7]  # noise so AUC is non-degenerate
        df = spark.createDataFrame(
            [(float(s), int(y)) for s, y in zip(scores, labels)],
            "score double, y int",
        ).repartition(8)
        row = ml.binary_auc(df, "score", "y").collect()[0]
        assert row["auc"] == pytest.approx(_numpy_auc(scores, labels), rel=1e-12)

    def test_perfect_and_inverted_classifier(self, spark):
        rows = [(float(i), 1 if i >= 50 else 0) for i in range(100)]
        df = spark.createDataFrame(rows, "score double, y int")
        assert ml.binary_auc(df, "score", "y").collect()[0]["auc"] == 1.0
        inv = df.selectExpr("-score as score", "y")
        assert ml.binary_auc(inv, "score", "y").collect()[0]["auc"] == 0.0

    def test_constant_score_is_half(self, spark):
        df = spark.createDataFrame(
            [(1.0, 0), (1.0, 1), (1.0, 0), (1.0, 1)], "score double, y int"
        )
        assert ml.binary_auc(df, "score", "y").collect()[0]["auc"] == 0.5

    def test_single_class_returns_null_auc(self, spark):
        """Documented contract: no negatives (or no positives) → auc NULL,
        counts still reported so the caller can detect it."""
        df = spark.createDataFrame(
            [(0.2, 1), (0.7, 1), (0.9, 1)], "score double, y int"
        )
        row = ml.binary_auc(df, "score", "y").collect()[0]
        assert row["auc"] is None
        assert row["n_pos"] == 3 and row["n_neg"] == 0

    def test_null_rows_dropped(self, spark):
        df = spark.createDataFrame(
            [(0.9, 1), (0.1, 0), (None, 1), (0.5, None)],
            "score double, y int",
        )
        row = ml.binary_auc(df, "score", "y").collect()[0]
        assert row["auc"] == 1.0
        assert row["n_pos"] == 1 and row["n_neg"] == 1


class TestCalibrationReport:
    def test_bins_and_rates_match_numpy(self, spark):
        rng = np.random.RandomState(9)
        p = rng.uniform(size=400)
        y = (rng.uniform(size=400) < p).astype(int)
        df = spark.createDataFrame(
            [(float(a), int(b)) for a, b in zip(p, y)], "p double, y int"
        )
        out = ml.calibration_report(df, "p", "y", bins=10).toPandas()
        idx = np.minimum((p * 10).astype(int), 9)
        for _, r in out.iterrows():
            mask = idx == r["bin"]
            assert r["n"] == mask.sum()
            assert r["mean_score"] == pytest.approx(p[mask].mean(), abs=1e-6)
            assert r["frac_pos"] == pytest.approx(y[mask].mean(), abs=1e-6)
        # a well-specified generator is roughly calibrated
        ece = (
            out["n"] / out["n"].sum()
            * (out["frac_pos"] - out["mean_score"]).abs()
        ).sum()
        assert ece < 0.15

    def test_top_edge_clamped_into_last_bin(self, spark):
        df = spark.createDataFrame(
            [(1.0, 1), (0.95, 1), (0.0, 0)], "p double, y int"
        )
        out = ml.calibration_report(df, "p", "y", bins=10).toPandas()
        assert set(out["bin"]) == {0, 9}
        assert int(out.set_index("bin").loc[9, "n"]) == 2


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


def test_binary_auc_strategies_bit_identical(spark):
    """r07: the discrete fast path and the bucketed continuous path must
    produce the SAME bits on the same data (the runtime switch is a cost
    decision, never a semantics one) — swept over continuous, heavily
    tied, and skewed score shapes."""
    import random

    from quackosm_spark.operators import ml

    random.seed(17)
    shapes = {
        "continuous": [(random.uniform(-5, 5), random.randint(0, 1)) for _ in range(3000)],
        "ties": [(float(random.randint(0, 9)), random.randint(0, 1)) for _ in range(3000)],
        "skewed": [(0.0, 1) for _ in range(2500)]
        + [(random.uniform(0, 1), random.randint(0, 1)) for _ in range(500)],
    }
    for name, rows in shapes.items():
        df = spark.createDataFrame(rows, "score DOUBLE, y INT")
        fast = ml.binary_auc(
            df, "score", "y", small_distinct_threshold=10**9
        ).collect()[0]
        bucketed = ml.binary_auc(
            df, "score", "y", small_distinct_threshold=0
        ).collect()[0]
        assert (fast["auc"], fast["n_pos"], fast["n_neg"]) == (
            bucketed["auc"], bucketed["n_pos"], bucketed["n_neg"]
        ), name


class TestKfoldAssign:
    def test_matches_python_md5_and_partitions(self, spark):
        """r10: fold = md5-16bit-bucket(id) % k, every row in [0, k),
        deterministic across calls; k validation."""
        import hashlib

        import pytest

        from quackosm_spark.operators.ml import kfold_assign

        df = spark.createDataFrame(
            [(i,) for i in range(500)], "doc_id: long"
        )
        got = {r.doc_id: r.fold for r in kfold_assign(df, k=5).collect()}
        for i in range(500):
            want = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 5
            assert got[i] == want
        assert set(got.values()) == set(range(5))
        again = {r.doc_id: r.fold for r in kfold_assign(df, k=5).collect()}
        assert again == got
        with pytest.raises(ValueError, match="k must"):
            kfold_assign(df, k=1)
