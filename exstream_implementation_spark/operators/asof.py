"""As-of (backward) join — a time-series primitive Spark lacks natively.

For every left row, attach the payload of the LATEST right row with
``right.ts <= left.ts`` within the same key group (the semantics of DuckDB's
ASOF JOIN / pandas merge_asof backward).

Spark-first realization: NOT a range join (which explodes to |left|×|right|
pairs per key before aggregation).  Both sides are unioned with a side tag,
sorted within each key by (ts, side) — right rows first on ties so equality
matches — and the right payload is carried forward with
``last(payload, ignorenulls=True)``.  Cost: ONE shuffle on the key, linear
scan per group; at 100 TB this is the plan you want (no quadratic blowup,
no skew amplification beyond the key's own row count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Returns ``left`` with each ``payload_cols`` column attached from the
    latest right row at-or-before the left row's timestamp (null if none).

    Multiple right rows sharing an identical (key, ts) are resolved
    arbitrarily (same as DuckDB ASOF); add a tiebreak column to ``right_ts``
    ordering upstream if that matters for your data."""
    lcols = left.columns
    l = left.select(
        F.col(by).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}")
          for c in payload_cols],
        *[F.col(c) for c in lcols],
    )
    r = right.select(
        F.col(by).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).select(
        "*",
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"__a_{c}")
            for c in payload_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).select(
        *lcols, *[F.col(f"__a_{c}").alias(f"asof_{c}") for c in payload_cols]
    )
