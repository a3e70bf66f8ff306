"""Distributed IRLS logistic regression (operators/logreg.py): exact parity
with a local IRLS on the collected data, partition invariance, pure-JVM
scoring identity, separation of planted junk docs, and arg validation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.operators.logreg import (
    doc_quality_features,
    fit_logreg,
    score_logreg,
)
from exstream_implementation_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _local_irls(x, y, l2=1e-6, max_iter=8, tol=1e-8):
    """Independent reference: same algorithm on the whole matrix at once."""
    xa = np.concatenate([x, np.ones((len(x), 1))], axis=1)
    k = xa.shape[1]
    wb = np.zeros(k)
    hist = []
    for _ in range(max_iter):
        p = 1.0 / (1.0 + np.exp(-(xa @ wb)))
        pc = np.clip(p, 1e-12, 1 - 1e-12)
        hist.append(float(-np.mean(y * np.log(pc) + (1 - y) * np.log(1 - pc))))
        grad = xa.T @ (y - p)
        grad[:-1] -= l2 * len(x) * wb[:-1]
        hess = (xa * (p * (1 - p))[:, None]).T @ xa
        reg = np.eye(k) * l2 * len(x)
        reg[-1, -1] = 0.0
        wb = wb + np.linalg.solve(hess + reg + np.eye(k) * 1e-10, grad)
        if len(hist) >= 2 and abs(hist[-2] - hist[-1]) <= tol * max(abs(hist[-2]), 1.0):
            break
    return wb[:-1], wb[-1]


def _synth(spark, n=400, d=5, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d))
    w_true = rng.normal(size=d) * 2.0
    p = 1.0 / (1.0 + np.exp(-(x @ w_true + 0.5)))
    y = (rng.uniform(size=n) < p).astype(int)
    rows = [(i, [float(v) for v in x[i]], int(y[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "rid long, features array<double>, label int")
    return df, x, y


def test_matches_local_irls_exactly(spark):
    df, x, y = _synth(spark)
    model = fit_logreg(df, max_iter=6)
    w_ref, b_ref = _local_irls(x, y.astype(float), max_iter=6)
    np.testing.assert_allclose(model.weights, w_ref, rtol=1e-8, atol=1e-10)
    assert model.intercept == pytest.approx(b_ref, rel=1e-8)
    assert model.n == len(x)
    # loss decreases from the first Newton step onward
    assert model.loss[0] >= model.loss[-1]


def test_partition_invariance(spark):
    df, _, _ = _synth(spark, n=300)
    m1 = fit_logreg(df.repartition(1), max_iter=4)
    m13 = fit_logreg(df.repartition(13), max_iter=4)
    np.testing.assert_allclose(m1.weights, m13.weights, atol=1e-9)
    assert m1.intercept == pytest.approx(m13.intercept, abs=1e-9)


def test_jvm_scoring_matches_numpy(spark):
    df, x, y = _synth(spark, n=200)
    model = fit_logreg(df, max_iter=4)
    got = {
        r["rid"]: r["p_good"] for r in score_logreg(df, model).collect()
    }
    want = 1.0 / (1.0 + np.exp(-(x @ model.weights + model.intercept)))
    for i in range(len(x)):
        assert got[i] == pytest.approx(want[i], rel=1e-12)


def test_separates_planted_junk_documents(spark):
    """Real testdata docs (label 1) vs character-salad docs (label 0):
    the learned model separates a held-out set by score."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    rng = np.random.default_rng(11)
    junk_rows = []
    alphabet = list("abcdefghijklmnopqrstuvwxyz   ,.!?0123456789QXZ")
    for i in range(250):
        s = "".join(rng.choice(alphabet, size=rng.integers(30, 400)))
        junk_rows.append((10_000 + i, s))
    junk = spark.createDataFrame(junk_rows, "doc_id long, text string")
    labeled = docs.withColumn("label", F.lit(1)).unionByName(
        junk.withColumn("label", F.lit(0))
    )
    feat = doc_quality_features(labeled).select("doc_id", "features", "label")
    train = feat.filter(F.col("doc_id") % 5 != 0)
    test = feat.filter(F.col("doc_id") % 5 == 0)
    model = fit_logreg(train, l2=1e-4, max_iter=8)
    scored = score_logreg(test, model).select("label", "p_good").collect()
    good = [r["p_good"] for r in scored if r["label"] == 1]
    bad = [r["p_good"] for r in scored if r["label"] == 0]
    assert good and bad
    # AUC via rank comparison
    pairs = sum(1 for g in good for b in bad if g > b)
    auc = pairs / (len(good) * len(bad))
    assert auc >= 0.9


def test_arg_validation(spark):
    df, _, _ = _synth(spark, n=50)
    with pytest.raises(ValueError, match="no rows"):
        fit_logreg(df.filter(F.col("rid") < 0))
    with pytest.raises(ValueError, match="l2"):
        fit_logreg(df, l2=-1.0)