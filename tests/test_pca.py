"""Distributed PCA (operators/pca.py) vs numpy on the collected data:
model parity (sign-canonicalized), partition invariance, whitening
covariance, explained-variance ordering, and composition with the
similarity stack on the testdata embeddings."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.operators.pca import (
    fit_pca,
    transform_pca,
)
from exstream_implementation_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _np_pca(x, k):
    x = x.astype(np.float64)
    mean = x.mean(axis=0)
    cov = (x - mean).T @ (x - mean) / len(x)
    w, v = np.linalg.eigh(cov)
    w, v = w[::-1][:k], v[:, ::-1][:, :k]
    flips = np.sign(v[np.abs(v).argmax(axis=0), np.arange(v.shape[1])])
    flips[flips == 0] = 1.0
    return mean, v * flips, np.maximum(w, 0.0)


def _emb(spark):
    return load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )


def _x(df):
    rows = sorted(df.collect(), key=lambda r: r["vec_id"])
    return np.stack([np.array(r["embedding"]) for r in rows])


def test_model_matches_numpy(spark):
    emb = _emb(spark)
    x = _x(emb)
    model = fit_pca(emb, k=8)
    mean, comp, eig = _np_pca(x, 8)
    np.testing.assert_allclose(model.mean, mean, atol=1e-9)
    np.testing.assert_allclose(model.eigvals, eig, atol=1e-7)
    np.testing.assert_allclose(model.components, comp, atol=1e-7)
    assert model.explained_ratio.shape == (8,)
    assert (np.diff(model.eigvals) <= 1e-12).all()  # descending


def test_partition_invariance(spark):
    emb = _emb(spark)
    m1 = fit_pca(emb.repartition(1), k=4)
    m32 = fit_pca(emb.repartition(32), k=4)
    np.testing.assert_allclose(m1.components, m32.components, atol=1e-8)
    np.testing.assert_allclose(m1.eigvals, m32.eigvals, atol=1e-8)


def test_projection_matches_numpy(spark):
    emb = _emb(spark)
    x = _x(emb)
    model = fit_pca(emb, k=8)
    out = transform_pca(emb, model, out_col="pca")
    got = np.stack(
        [
            np.array(r["pca"])
            for r in sorted(out.collect(), key=lambda r: r["vec_id"])
        ]
    )
    exp = (x - model.mean) @ model.components
    np.testing.assert_allclose(got, exp, atol=1e-9)


def test_whitening_gives_identity_covariance(spark):
    emb = _emb(spark)
    model = fit_pca(emb, k=8)
    out = transform_pca(emb, model, whiten=True)
    y = np.stack([np.array(r["pca"]) for r in out.collect()])
    cov = (y - y.mean(axis=0)).T @ (y - y.mean(axis=0)) / len(y)
    np.testing.assert_allclose(cov, np.eye(8), atol=1e-5)


def test_recovers_signal_subspace_and_preserves_neighbors(spark):
    # the operator's use case: embeddings with low-rank structure + noise.
    # PCA-8 must capture the signal (explained variance) and reproduce
    # full-space top-1 cosine neighbors.  (The sf testdata embeddings are
    # near-isotropic — flat eigenspectrum — so this needs planted signal.)
    rng = np.random.default_rng(42)
    z = rng.normal(size=(400, 8))
    a = rng.normal(size=(8, 64))
    x = (z @ a + 0.05 * rng.normal(size=(400, 64))).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    model = fit_pca(df, k=8)
    assert model.explained_ratio.sum() > 0.95
    y = np.stack(
        [
            np.array(r["pca"])
            for r in sorted(
                transform_pca(df, model).collect(),
                key=lambda r: r["vec_id"],
            )
        ]
    )

    def top1(m):
        nm = m / np.linalg.norm(m, axis=1, keepdims=True)
        s = nm @ nm.T
        np.fill_diagonal(s, -2)
        return s.argmax(axis=1)

    agree = (top1(x.astype(np.float64)) == top1(y)).mean()
    assert agree >= 0.9, agree


def test_bad_inputs(spark):
    emb = _emb(spark)
    with pytest.raises(ValueError):
        fit_pca(emb, k=0)
    with pytest.raises(ValueError):
        fit_pca(emb, k=65)
    with pytest.raises(ValueError):
        fit_pca(emb.filter(F.col("vec_id") < 0))
