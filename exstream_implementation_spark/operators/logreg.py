"""Distributed logistic regression — the learned quality classifier the
heuristic gates (plans/text.py text_quality) and the corpus LM (plans/lm.py)
bracket: CCNet-style pipelines train a small linear model on weak labels
("looks like wiki" vs "looks like crawl junk") and score the whole corpus
with it (Wenzek et al. 2020; Brown et al. 2020 §A.2 use exactly this
shape for GPT-3's quality filter).

Not in the reference (numeric traces only).  Spark-first decomposition, the
same O(d^2)-state pattern as operators/pca.py:

  fit      IRLS (Newton) iterations.  Each iteration is ONE distributed
           pass: mapInPandas emits per-Arrow-batch partials of the
           gradient X^T (y - p) AND the Hessian X^T S X as a single
           flattened vector (a few KB — d is feature-vector sized, not
           corpus sized), reduced element-wise via posexplode/groupBy
           (map-side combined), and the driver solves the (d+1)^2 system.
           Newton on a convex loss converges in ~5 iterations, so the
           corpus is scanned ~5 times total — no per-row Python anywhere
           (the partial is one BLAS matmul per batch).
  score    a PURE JVM expression: sigmoid(w . x + b) as a zip_with/
           aggregate fold over the feature array — scoring 100 TB is a
           projection inside whole-stage codegen, no model broadcast, no
           UDF, no shuffle.

Numerics: float64 accumulation; L2 ridge on the weights (never the
intercept) keeps the Newton step defined under separable or single-class
weak labels; probabilities are clipped away from {0,1} in the loss only.
Iterative training is not SQL-expressible — validated by property tests
(exact parity with a local IRLS on collected data, partition invariance,
JVM-scoring == numpy sigmoid, planted-junk separation) per the driver
contract's weak-check rule, like kmeans/pca/pq.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class LogRegModel:
    weights: np.ndarray     # (d,)
    intercept: float
    loss: tuple             # per-iteration mean NLL (ridge term excluded)
    n: int


def _partials(df: DataFrame, feature_col: str, label_col: str,
              w: np.ndarray, b: float) -> np.ndarray:
    """One corpus pass -> flattened [n, loss_sum, grad (d+1), hess (d+1)^2]."""
    d = len(w)
    k = d + 1
    size = 2 + k + k * k

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            x = np.stack(pdf[feature_col].to_numpy()).astype(np.float64)
            y = pdf[label_col].to_numpy().astype(np.float64)
            z = x @ w + b
            p = 1.0 / (1.0 + np.exp(-z))
            pc = np.clip(p, 1e-12, 1.0 - 1e-12)
            loss = -np.sum(y * np.log(pc) + (1.0 - y) * np.log(1.0 - pc))
            xa = np.concatenate([x, np.ones((len(x), 1))], axis=1)
            grad = xa.T @ (y - p)                     # (k,)
            s = p * (1.0 - p)
            hess = (xa * s[:, None]).T @ xa          # (k, k)
            out = np.concatenate(
                [[float(len(x)), loss], grad, hess.ravel()]
            )
            yield pd.DataFrame({"part": [list(out)]})

    parts = df.select(feature_col, label_col).mapInPandas(
        run, "part array<double>"
    )
    rows = (
        parts.select(F.posexplode("part"))
        .groupBy("pos")
        .agg(F.sum("col").alias("v"))
        .collect()
    )
    total = np.zeros(size)
    for r in rows:
        total[r["pos"]] = r["v"]
    return total


def fit_logreg(
    df: DataFrame,
    feature_col: str = "features",
    label_col: str = "label",
    l2: float = 1e-6,
    max_iter: int = 8,
    tol: float = 1e-8,
) -> LogRegModel:
    """IRLS fit of P(label=1 | features) on (array<double>, {0,1}) columns."""
    head = df.select(feature_col).first()
    if head is None or head[0] is None:
        raise ValueError("fit_logreg: input has no rows")
    d = len(head[0])
    if l2 < 0:
        raise ValueError(f"fit_logreg: l2 must be >= 0: {l2}")
    w = np.zeros(d)
    b = 0.0
    history: list[float] = []
    n = 0
    for _ in range(max_iter):
        t = _partials(df, feature_col, label_col, w, b)
        k = d + 1
        n = int(t[0])
        loss = t[1] / n
        grad = t[2:2 + k]
        hess = t[2 + k:].reshape(k, k)
        # ridge on weights only (not the intercept)
        reg = np.eye(k) * l2 * n
        reg[d, d] = 0.0
        grad_r = grad.copy()
        grad_r[:d] -= l2 * n * w
        step = np.linalg.solve(hess + reg + np.eye(k) * 1e-10, grad_r)
        w = w + step[:d]
        b = b + step[d]
        history.append(float(loss))
        if len(history) >= 2 and abs(history[-2] - history[-1]) <= tol * max(
            abs(history[-2]), 1.0
        ):
            break
    return LogRegModel(weights=w, intercept=float(b), loss=tuple(history), n=n)


def logreg_score_expr(model: LogRegModel, feature_col: str = "features") -> Column:
    """sigmoid(w . x + b) as a pure-JVM fold — scoring stays inside
    whole-stage codegen (no UDF, no broadcast)."""
    # float(v), not {v!r}: weights are numpy scalars, and numpy >= 2.0
    # reprs them as 'np.float64(...)' which is not SQL
    wlit = "array({})".format(
        ", ".join(f"cast({float(v)!r} as double)" for v in model.weights)
    )
    dot = (
        f"aggregate(zip_with({feature_col}, {wlit}, (x, w) ->"
        f" cast(x as double) * w), cast({float(model.intercept)!r} as double),"
        " (acc, v) -> acc + v)"
    )
    return F.expr(f"1.0 / (1.0 + exp(-({dot})))")


def score_logreg(
    df: DataFrame,
    model: LogRegModel,
    feature_col: str = "features",
    out_col: str = "p_good",
) -> DataFrame:
    return df.withColumn(out_col, logreg_score_expr(model, feature_col))


# --- document quality features (pure JVM, shared with the weak-label gate) ---

def doc_quality_features(
    df: DataFrame, text_col: str = "text", out_col: str = "features"
) -> DataFrame:
    """Surface features as array<double>, all codegen expressions: token
    count (log-scaled), stopword ratio, punctuation ratio, mean token
    length, digit ratio, uppercase ratio.  The learned reweighting of
    exactly the signals text_quality hand-weights."""
    from exstream_implementation_spark.plans.text import (
        STOP_EN,
        punct_count,
        stop_count,
    )

    t = df.withColumn("__toks", F.split(F.lower(F.col(text_col)), r"\s+"))
    nt = F.greatest(F.size("__toks"), F.lit(1)).cast("double")
    nc = F.greatest(F.length(text_col), F.lit(1)).cast("double")
    feats = F.array(
        F.log1p(F.size("__toks").cast("double")),
        stop_count("__toks", STOP_EN).cast("double") / nt,
        punct_count(text_col).cast("double") / nc,
        F.expr(
            "aggregate(__toks, cast(0 as bigint), (a, t) -> a + length(t))"
        ).cast("double") / nt,
        (nc - F.length(F.regexp_replace(F.col(text_col), "[0-9]", ""))
         ).cast("double") / nc,
        (nc - F.length(F.regexp_replace(F.col(text_col), "[A-Z]", ""))
         ).cast("double") / nc,
    )
    return t.withColumn(out_col, feats).drop("__toks")
