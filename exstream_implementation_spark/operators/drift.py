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


def reference_edges_from_sketch(sketch_table: DataFrame, n_bins: int = 10) -> list:
    """Quantile bin edges from a GLOBAL-grain KLL sketch row
    (operators/kll.py) — the incremental twin of ``reference_edges``:
    when the reference corpus is tracked as a streaming sketch log
    (streaming/stats.py running_quantiles), edges refresh by merging
    yesterday's log with today's batch instead of rescanning the
    reference snapshot.  Duplicates from skew collapse, same contract as
    the approx_percentile path."""
    from exstream_implementation_spark.operators.kll import kll_quantiles

    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2: {n_bins}")
    qs = [i / n_bins for i in range(1, n_bins)]
    rows = kll_quantiles(sketch_table, qs).take(2)
    if len(rows) != 1:
        raise ValueError(
            "reference_edges_from_sketch: expected exactly one sketch row "
            f"(the GLOBAL grain — kll_merge(sketches, [])); got {len(rows)}"
        )
    edges = sorted(
        set(e for e in (rows[0]["quantiles"] or []) if e is not None)
    )
    if not edges:
        raise ValueError(
            "reference_edges_from_sketch: the sketch is empty"
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


def _bin_expr(col: str, edges: list) -> str:
    arr = ", ".join(repr(float(e)) for e in edges)
    return (
        f"aggregate(array({arr}), 0, (acc, e) -> acc +"
        f" CASE WHEN cast({col} as double) > e THEN 1 ELSE 0 END)"
    )


def _numeric_hists_one_pass(df: DataFrame, edges: dict) -> tuple:
    """({col: {bin: n}}, n_rows) for EVERY column in one aggregation:
    each (col, bin) is a sum-CASE expression, so Catalyst fuses the
    whole batch into a single scan (bins are bounded, the expr count is
    small); the row count rides in the same pass."""
    aggs = [F.count(F.lit(1)).alias("__nrows")]
    for c, es in edges.items():
        be = _bin_expr(c, es)
        for b in range(len(es) + 1):
            aggs.append(
                F.sum(
                    F.when(
                        F.col(c).isNotNull() & F.expr(f"({be}) = {b}"), 1
                    ).otherwise(0)
                ).alias(f"{c}\x1f{b}")
            )
    row = df.agg(*aggs).first()
    out: dict = {c: {} for c in edges}
    for key, v in row.asDict().items():
        if key == "__nrows":
            continue
        c, b = key.split("\x1f")
        out[c][int(b)] = int(v or 0)
    return out, int(row["__nrows"])


def _categorical_counts_one_pass(df: DataFrame, cols: list) -> dict:
    """{col: {value: n}} for every column from ONE stacked pass (the
    profile_top_values shape; NULL values keep a NULL key)."""
    stacked = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(c).cast("string").alias("value"),
                )
                for c in cols
            ])
        ).alias("s")
    ).select("s.column", "s.value")
    rows = (
        stacked.groupBy("column", "value")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    out: dict = {c: {} for c in cols}
    for r in rows:
        out[r["column"]][r["value"]] = int(r["n"])
    return out


def reference_stats(
    ref: DataFrame,
    numeric_cols: list = (),
    categorical_cols: list = (),
    n_bins: int = 10,
) -> dict:
    """Everything the comparison side needs from the reference, computed
    ONCE: per-column quantile edges (one approx_percentile aggregation
    for all columns), all numeric histograms (one aggregation), all
    categorical counts (one stacked pass) — three jobs total.  The
    returned dict is driver-sized (bins and category cardinalities are
    bounded) and reusable across many comparisons, which is what the
    streaming monitor amortizes."""
    numeric_cols = list(numeric_cols)
    categorical_cols = list(categorical_cols)
    if not numeric_cols and not categorical_cols:
        raise ValueError("reference_stats: no columns requested")
    stats: dict = {
        "numeric_cols": numeric_cols,
        "categorical_cols": categorical_cols,
        "edges": {},
        "hists": {},
        "cats": {},
    }
    if numeric_cols:
        qs = ", ".join(str(i / n_bins) for i in range(1, n_bins))
        edge_row = ref.agg(*[
            F.expr(
                f"approx_percentile(cast({c} as double), array({qs}), 10000)"
            ).alias(c)
            for c in numeric_cols
        ]).first()
        for c in numeric_cols:
            es = sorted(set(e for e in (edge_row[c] or []) if e is not None))
            if not es:
                raise ValueError(
                    f"reference_stats: no non-null values in {c!r}"
                )
            stats["edges"][c] = es
        stats["hists"], _n = _numeric_hists_one_pass(ref, stats["edges"])
    if categorical_cols:
        stats["cats"] = _categorical_counts_one_pass(ref, categorical_cols)
    return stats


def psi_against(stats: dict, new: DataFrame) -> list:
    """[(column, kind, psi)] of ``new`` vs precomputed reference_stats —
    two jobs on the new side regardless of column count.

    Robust by design for a long-running monitor: an EMPTY comparison
    frame returns [] (nothing to report), and a non-empty frame whose
    numeric column is all-NULL reports psi = +inf for that column (total
    distribution loss — the strongest possible drift signal), never an
    exception."""
    rows = []
    n_rows = None
    new_h: dict = {}
    if stats["numeric_cols"]:
        new_h, n_rows = _numeric_hists_one_pass(new, stats["edges"])
    new_c: dict = {}
    if stats["categorical_cols"]:
        new_c = _categorical_counts_one_pass(new, stats["categorical_cols"])
        if n_rows is None:
            # every row contributes one (col, value) entry per column,
            # NULL values included — so a column's total IS the row count
            first = stats["categorical_cols"][0]
            n_rows = sum(new_c[first].values())
    if not n_rows:
        return []
    for c in stats["numeric_cols"]:
        if sum(new_h[c].values()) == 0:  # non-empty batch, all-NULL column
            rows.append((c, "numeric", float("inf")))
        else:
            rows.append(
                (c, "numeric", _psi_from_counts(stats["hists"][c], new_h[c]))
            )
    for c in stats["categorical_cols"]:
        rows.append(
            (c, "categorical", _psi_from_counts(stats["cats"][c], new_c[c]))
        )
    return rows


def _verdict(v: float) -> str:
    return "stable" if v < 0.1 else "moderate" if v < 0.25 else "action"


def drift_report(
    ref: DataFrame,
    new: DataFrame,
    numeric_cols: list = (),
    categorical_cols: list = (),
    n_bins: int = 10,
) -> DataFrame:
    """(column, kind, psi, verdict) for every requested column — verdict
    uses the standard 0.1 / 0.25 thresholds.

    Batched: reference_stats (three jobs) + psi_against (two jobs on the
    new side) — five jobs total, independent of column count (the
    per-column psi_numeric/psi_categorical entry points stay for
    single-column use)."""
    stats = reference_stats(ref, numeric_cols, categorical_cols, n_bins)
    out = [
        (c, kind, float(v), _verdict(v))
        for c, kind, v in psi_against(stats, new)
    ]
    return ref.sparkSession.createDataFrame(
        out, "column string, kind string, psi double, verdict string"
    )


def drift_monitor_sink(stats: dict, sink: list):
    """foreachBatch sink: per microbatch, append
    (batch_id, column, kind, psi, verdict) rows to ``sink`` — the
    reference side was computed ONCE (reference_stats), so each trigger
    costs the two psi_against aggregation jobs on the batch alone (the
    empty-batch short-circuit rides inside those aggregations — no
    separate isEmpty job).  An all-NULL monitored column reports
    psi = inf / 'action' rather than crashing the query.  ``sink`` is
    any list-like with .append (tests use a plain list; production
    wraps a table append the same way the ingest engines do)."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        for c, kind, v in psi_against(stats, batch_df):
            sink.append((int(batch_id), c, kind, float(v), _verdict(v)))

    return apply
