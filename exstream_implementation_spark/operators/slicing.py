"""C1 — interval slicing as a broadcast range join (SURVEY §2.3 C1).

The reference loops over label rows and boolean-masks each trace in pandas
(reference utils/get_data.py:83-100). Spark-first: ONE broadcast join of the
big trace table against the tiny labels table on ``trace_id`` plus the
combined interval predicate — Catalyst plans a BroadcastHashJoin keyed on
trace_id, so the 100 TB side is never shuffled, and the whole table is
scanned ONCE (the obvious refs-branch ∪ anos-branch formulation reads the
dominant-cost trace table twice); a row falling in both intervals explodes
into both class rows.

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
    ts = F.col("timestamp")
    in_ref = (ts >= F.col("ref_start")) & (ts < F.col("ref_end"))
    in_ano = (ts >= F.col("ano_start")) & (ts <= F.col("ano_end"))
    sliced = (
        traces.join(
            lbl,
            (F.col("trace_id") == F.col("l_trace_id")) & (in_ref | in_ano),
            "inner",
        )
        # one scan, both classes: a row in the ref interval emits 0, in the
        # ano interval 1, in both (overlapping labels) both rows — identical
        # relation to the two-branch union at half the table reads.
        # (selectExpr strings: one py4j round-trip per step — driver build
        # cost, see operators.rewards)
        .selectExpr(
            "*",
            "explode(filter(array("
            "CASE WHEN timestamp >= ref_start AND timestamp < ref_end"
            " THEN 0 END,"
            "CASE WHEN timestamp >= ano_start AND timestamp <= ano_end"
            " THEN 1 END), x -> x IS NOT NULL)) AS type_data",
        )
        .drop("l_trace_id", "ref_start", "ref_end", "ano_start", "ano_end")
    )
    return sliced.selectExpr(
        "*", "concat_ws('_', ano_type, trace_id, label_row) AS ano_key"
    ).drop("ano_type", "label_row")


def _sql_str(s: str) -> str:
    """Escape an arbitrary string into a Spark SQL string literal."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _sql_ident(s: str) -> str:
    """Escape an arbitrary column name into a backquoted SQL identifier."""
    return "`" + s.replace("`", "``") + "`"


def melt_features(
    sliced: DataFrame,
    features: list[str],
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Wide sliced table → long form for per-feature parallelism.

    (*extra_cols, ano_key, type_data, timestamp, feature, feature_order,
    value); ``extra_cols`` passes additional keys through (e.g. ``run_id``
    for the instability re-runs).

    ``feature_order`` is the feature's position in the trace column order —
    it reproduces the reference's feature-iteration order for deterministic
    tie-breaks (Python dict order at reference
    exstream/entropy_based_single_reward_feature.py:222-241).

    Implemented with the built-in ``stack`` generator — stays inside
    whole-stage codegen, no Python round-trip, and the row explosion is
    map-side only (no shuffle).  Feature names are escaped into the SQL
    text (CSV headers are user-supplied; quotes/backticks in a name must
    not break or misparse the expression).
    """
    pairs = []
    for i, f in enumerate(features):
        pairs.extend([_sql_str(f), str(i), _sql_ident(f)])
    stack_expr = (
        f"stack({len(features)}, {', '.join(pairs)})"
        " as (feature, feature_order, value)"
    )
    return sliced.select(
        *extra_cols, "ano_key", "type_data", "timestamp", F.expr(stack_expr)
    )
