"""Distributed PCA / whitening for embedding columns.

Not in the reference (numeric traces only) — this serves the embedding leg
of the training-data pipeline: dimensionality reduction before LSH/IVF
(plans/similarity.py) and whitening so cosine buckets are not dominated by
a few high-variance directions.

The classic scalable decomposition: PCA over n rows of dimension d needs
only the (d, d) second-moment matrix and the mean — O(d^2) state
independent of n — so the cluster computes moments and the driver (which
would be a single "reduce" task on a real cluster) does the O(d^3) eigen
step on a d x d matrix:

  partials  mapInPandas emits one (n, sum, gram) row per Arrow batch —
            a few KB each, computed as one BLAS matmul per batch
            (X^T X), never a per-row Python loop;
  reduce    element-wise sum of the partial vectors via posexplode +
            groupBy(pos) — two exchanges of O(P * d^2) TINY rows, fully
            map-side combined (the treeReduce shape in DataFrame terms);
  eig       numpy eigh on the d x d covariance; components get a
            deterministic sign (largest-|loading| coordinate positive)
            so results are reproducible across runs and partitionings;
  project   Arrow-batched matmul (x - mean) @ W — the same vectorized
            pattern as ann_topk_cosine_vectorized's score kernel.

Numerics: moments accumulate in float64 regardless of the input float32;
covariance uses the n-divisor (population) form.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PCAModel:
    mean: np.ndarray          # (d,)
    components: np.ndarray    # (d, k) — columns are principal axes
    eigvals: np.ndarray       # (k,) descending, population covariance
    explained_ratio: np.ndarray  # (k,) eigvals / total variance


def _moments(emb: DataFrame, vec_col: str) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, sum, gram) over the corpus — one pass, O(d^2) result."""
    head = emb.select(vec_col).first()
    if head is None or head[0] is None:
        raise ValueError("fit_pca on an empty frame")
    d = len(head[0])

    def partial(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            # n rides in slot 0 so ONE reduce covers count+sum+gram
            yield pd.DataFrame(
                {
                    "vals": [
                        np.concatenate(
                            [[float(len(x))], x.sum(axis=0), (x.T @ x).ravel()]
                        )
                    ]
                }
            )

    parts = emb.select(vec_col).mapInPandas(
        partial, schema="vals array<double>"
    )
    rows = (
        parts.select(F.posexplode("vals").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    flat = np.zeros(1 + d + d * d)
    for r in rows:
        flat[r["pos"]] = r["v"]
    n = int(flat[0])
    if n == 0:
        raise ValueError("fit_pca on an empty frame")
    return n, flat[1 : 1 + d], flat[1 + d :].reshape(d, d)


def fit_pca(emb: DataFrame, vec_col: str = "embedding", k: int | None = None) -> PCAModel:
    """Fit on the ``vec_col`` array column; keep the top ``k`` components
    (default: all d).  Deterministic up to float summation order."""
    n, s, g = _moments(emb, vec_col)
    d = s.shape[0]
    if k is None:
        k = d
    if not 1 <= k <= d:
        raise ValueError(f"k must be in [1, {d}]: {k}")
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    # eigh returns ascending; flip to descending variance
    w, v = np.linalg.eigh(cov)
    w, v = w[::-1][:k], v[:, ::-1][:, :k]
    # sign convention: the largest-|loading| coordinate of each component
    # is positive — eigenvectors are otherwise sign-ambiguous and numpy's
    # choice can differ across BLAS builds / partition orders
    flips = np.sign(v[np.abs(v).argmax(axis=0), np.arange(v.shape[1])])
    flips[flips == 0] = 1.0
    v = v * flips
    w = np.maximum(w, 0.0)  # clip the numeric-noise negatives
    total = float(np.trace(cov))
    ratio = w / total if total > 0 else np.zeros_like(w)
    return PCAModel(mean=mean, components=v, eigvals=w, explained_ratio=ratio)


def transform_pca(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-9,
) -> DataFrame:
    """Append ``out_col`` = (x - mean) @ components, optionally scaled to
    unit variance per component (whitening).  Arrow-batched matmul."""
    w = model.components
    if whiten:
        w = w / np.sqrt(model.eigvals + eps)
    mean = model.mean  # closure-captured, shipped with the task

    @F.pandas_udf("array<double>")
    def project(vs: pd.Series) -> pd.Series:
        x = np.stack(vs.to_numpy()).astype(np.float64)
        out = (x - mean) @ w
        return pd.Series(list(out))

    return df.withColumn(out_col, project(vec_col))
