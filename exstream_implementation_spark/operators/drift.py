"""Distribution-drift detection between two corpus snapshots — the
monitoring leg of the data-quality family: operators/expectations.py
gates a snapshot against STATIC rules, operators/profile.py describes
one snapshot, and this module compares TWO (yesterday's corpus vs
today's ingest, train vs serving) with the standard population-stability
index (PSI) and a symmetric KL on shared histograms.

Spark-first: a histogram is ONE map-side-combined aggregation —
`width_bucket` assigns bins inside codegen for numerics, the raw value
is the bin for categoricals — so profiling a 100 TB column is one scan,
and the PSI arithmetic runs on the bin table (bins are bounded by
construction, a driver-sized frame).  Binning is driven by the
REFERENCE side's quantiles (the convention that makes PSI comparable
across days): edges come from one approx_percentile pass on the
reference, then both sides bucket with the identical edges.

PSI reading (the industry rule of thumb): < 0.1 stable, 0.1-0.25
moderate shift, > 0.25 action required.  Empty bins are epsilon-smoothed
so a bin appearing/disappearing contributes a large-but-finite term.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

_EPS = 1e-6


def numeric_histogram(
    df: DataFrame, col: str, edges: list
) -> dict:
    """{bin_index: count} over len(edges)+1 bins (underflow 0, then one
    per edge interval; NULLs excluded).  One aggregation."""
    if not edges or sorted(edges) != list(edges):
        raise ValueError(f"edges must be non-empty ascending: {edges}")
    arr = ", ".join(repr(float(e)) for e in edges)
    # bin = #edges strictly below the value (Spark's width_bucket is the
    # 4-arg uniform form only; this fold is the arbitrary-edge variant,
    # codegen-compiled like the rest of the expression)
    rows = (
        df.filter(F.col(col).isNotNull())
        .groupBy(
            F.expr(
                f"aggregate(array({arr}), 0, (acc, e) -> acc +"
                f" CASE WHEN cast({col} as double) > e THEN 1 ELSE 0 END)"
            ).alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {int(r["bin"]): int(r["n"]) for r in rows}


def categorical_counts(df: DataFrame, col: str) -> dict:
    """{value: count} (NULL keyed as None) — one aggregation.  Intended
    for bounded-cardinality columns (source, lang, split ...); for
    heavy-tailed columns use profile_top_values and compare the head."""
    rows = df.groupBy(col).agg(F.count(F.lit(1)).alias("n")).collect()
    return {r[col]: int(r["n"]) for r in rows}


def reference_edges(
    df: DataFrame, col: str, n_bins: int = 10, accuracy: int = 10_000
) -> list:
    """Quantile bin edges from the REFERENCE snapshot (one
    approx_percentile pass); duplicates from skew collapse."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2: {n_bins}")
    qs = [i / n_bins for i in range(1, n_bins)]
    row = df.agg(
        F.expr(
            f"approx_percentile(cast({col} as double),"
            f" array({', '.join(map(str, qs))}), {accuracy})"
        ).alias("e")
    ).first()
    edges = sorted(set(e for e in (row["e"] or []) if e is not None))
    if not edges:
        raise ValueError(
            f"reference_edges: no non-null values in {col!r}"
        )
    return edges


def _psi_from_counts(ref: dict, new: dict) -> float:
    keys = set(ref) | set(new)
    ref_total = sum(ref.values())
    new_total = sum(new.values())
    if ref_total == 0 or new_total == 0:
        raise ValueError("psi: a side has no rows")
    psi = 0.0
    for k in keys:
        p = max(ref.get(k, 0) / ref_total, _EPS)
        q = max(new.get(k, 0) / new_total, _EPS)
        psi += (q - p) * math.log(q / p)
    return psi


def psi_numeric(
    ref: DataFrame, new: DataFrame, col: str, n_bins: int = 10
) -> float:
    """PSI of ``col`` between two frames, binned by the reference's
    quantiles.  Three aggregate jobs total (edges + two histograms)."""
    edges = reference_edges(ref, col, n_bins)
    return _psi_from_counts(
        numeric_histogram(ref, col, edges),
        numeric_histogram(new, col, edges),
    )


def psi_categorical(ref: DataFrame, new: DataFrame, col: str) -> float:
    """PSI over the categorical value distribution (two aggregates)."""
    return _psi_from_counts(
        categorical_counts(ref, col), categorical_counts(new, col)
    )


def drift_report(
    ref: DataFrame,
    new: DataFrame,
    numeric_cols: list = (),
    categorical_cols: list = (),
    n_bins: int = 10,
) -> DataFrame:
    """(column, kind, psi, verdict) for every requested column — verdict
    uses the standard 0.1 / 0.25 thresholds."""
    if not numeric_cols and not categorical_cols:
        raise ValueError("drift_report: no columns requested")
    rows = []
    for c in numeric_cols:
        rows.append((c, "numeric", psi_numeric(ref, new, c, n_bins)))
    for c in categorical_cols:
        rows.append((c, "categorical", psi_categorical(ref, new, c)))
    out = [
        (
            c, kind, float(v),
            "stable" if v < 0.1 else "moderate" if v < 0.25 else "action",
        )
        for c, kind, v in rows
    ]
    return ref.sparkSession.createDataFrame(
        out, "column string, kind string, psi double, verdict string"
    )
