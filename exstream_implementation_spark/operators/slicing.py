"""C1 — interval slicing as a broadcast range join (SURVEY §2.3 C1).

The reference loops over label rows and boolean-masks each trace in pandas
(reference utils/get_data.py:83-100). Spark-first: one broadcast join of the
big trace table against the tiny labels table on ``trace_id`` plus the
interval predicate — Catalyst plans a BroadcastHashJoin keyed on trace_id with
the range condition as a post-join filter, so the 100 TB side is never
shuffled and parquet scans prune on pushed-down ``trace_id``/``timestamp``
filters.

Interval-bound asymmetry is preserved exactly: reference rows are
``[ref_start, ref_end)``, anomaly rows ``[ano_start, ano_end]``
(reference utils/get_data.py:85-95).

``ano_key`` replicates the composite key ``{ano_type}_{trace_id}_{label_row}``
(reference utils/get_data.py:99-100).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def slice_intervals(traces: DataFrame, labels: DataFrame) -> DataFrame:
    """traces(timestamp, features..., trace_id) × labels → sliced rows.

    Returns one DataFrame carrying both classes, tagged ``type_data``
    (0=reference interval row, 1=anomaly interval row) — the refs/anos pair of
    the reference becomes a single unioned relation (SURVEY §1.1).
    """
    lbl = F.broadcast(
        labels.select(
            "label_row",
            F.col("trace_id").alias("l_trace_id"),
            "ano_id",
            "ano_type",
            "ref_start",
            "ref_end",
            "ano_start",
            "ano_end",
        )
    )

    def branch(start_col: str, end_col: str, end_inclusive: bool, type_data: int):
        ts = F.col("timestamp")
        upper = ts <= F.col(end_col) if end_inclusive else ts < F.col(end_col)
        return (
            traces.join(
                lbl,
                (F.col("trace_id") == F.col("l_trace_id"))
                & (ts >= F.col(start_col))
                & upper,
                "inner",
            )
            .withColumn("type_data", F.lit(type_data))
            .drop("l_trace_id", "ref_start", "ref_end", "ano_start", "ano_end")
        )

    refs = branch("ref_start", "ref_end", end_inclusive=False, type_data=0)
    anos = branch("ano_start", "ano_end", end_inclusive=True, type_data=1)
    sliced = refs.unionByName(anos)
    return sliced.withColumn(
        "ano_key",
        F.concat_ws("_", F.col("ano_type"), F.col("trace_id"), F.col("label_row")),
    ).drop("ano_type", "label_row")


def melt_features(sliced: DataFrame, features: list[str]) -> DataFrame:
    """Wide sliced table → long form for per-feature parallelism.

    (ano_key, type_data, timestamp, feature, feature_order, value)

    ``feature_order`` is the feature's position in the trace column order —
    it reproduces the reference's feature-iteration order for deterministic
    tie-breaks (Python dict order at reference
    exstream/entropy_based_single_reward_feature.py:222-241).

    Implemented with the built-in ``stack`` generator — stays inside
    whole-stage codegen, no Python round-trip, and the row explosion is
    map-side only (no shuffle).
    """
    pairs = []
    for i, f in enumerate(features):
        pairs.extend([f"'{f}'", str(i), f"`{f}`"])
    stack_expr = f"stack({len(features)}, {', '.join(pairs)}) as (feature, feature_order, value)"
    return sliced.select(
        "ano_key", "type_data", "timestamp", F.expr(stack_expr)
    )
