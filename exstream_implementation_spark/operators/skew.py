"""Skew-resilient aggregation — explicit two-phase salted combine.

AQE's skew-join splitting handles joins, but a groupBy over a column with a
handful of hot keys (e.g. 3 distinct ``l_returnflag`` values across billions
of rows) still funnels each key through one reducer.  ``salted_agg`` makes the
classic fix reusable: append a salt from a fast non-cryptographic hash of
secondary columns, pre-aggregate on (key, salt) — spreading each hot key over
``n_salts`` reducers — then combine the partials on the key alone.  The second
shuffle moves only #keys × n_salts rows.

Works for any algebraic aggregate (sum/count/min/max); averages decompose as
sum+count at the call site.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    salt_col: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output name → (combine_fn_name,
    partial expression), e.g. ``{"n": ("sum", F.count(F.lit(1))),
    "max_qty": ("max", F.max("l_quantity"))}``.  ``combine_fn_name`` must be
    the algebraic combiner (count partials combine via sum).
    """
    salted = df.withColumn("__salt", F.pmod(F.hash(salt_col), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (_, expr) in aggs.items()]
    )
    combined = partial.groupBy(*keys).agg(
        *[
            getattr(F, fn)(f"__p_{name}").alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )
    return combined
