"""A/B attribution for topk_until_leap's cross-round 1.14↔2.10 s band
(VERDICT r07 next-round #2).

Forms compared, 5 warm repeats each at $SPARK_GRAFT_SF_DIR (default sf0.1):

  chain — the r07 shape: global_lag → agg(max leap) → broadcast →
          agg(min rnk) → broadcast → filter.  Two CHAINED 1-row scalar
          broadcasts = 2 extra jobs' worth of tiny stages; suspected
          scheduler-latency noise source.
  fused — ONE aggregation produces both scalars: max(leap) plus
          max_by-style struct max over prev_rev<>0 rows (largest leap,
          tie → smallest rnk), so the cut rank is derived in the same
          pass and only one scalar broadcast remains.

A global unpartitioned window (reward_leap_filter's per-key form) is NOT a
candidate: with no key it exchanges the whole per-supplier relation into a
single task — exactly the shape plan_audit exists to forbid.

Usage: PYTHONPATH=. python tools/ab_topk_leap.py [repeats]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from pyspark.sql import functions as F


def _leaps(spark, sf_dir):
    from exstream_implementation_spark.operators.ranking import global_lag
    from exstream_implementation_spark.sources import load_table

    rev = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("rev")
        )
    )
    return global_lag(
        rev,
        [F.desc("rev"), F.asc("l_suppkey")],
        "rev",
        rn_col="rnk",
        lag_col="prev_rev",
    ).withColumn("leap", F.col("prev_rev") - F.col("rev"))


def form_chain(spark, sf_dir):
    leaps = _leaps(spark, sf_dir)
    max_leap = leaps.agg(F.max("leap").alias("max_leap"))
    cut = (
        leaps.crossJoin(F.broadcast(max_leap))
        .filter((F.col("leap") == F.col("max_leap")) & (F.col("prev_rev") != 0))
        .agg(F.min("rnk").alias("cut_rank"))
    )
    return (
        leaps.crossJoin(F.broadcast(cut))
        .filter(F.col("cut_rank").isNull() | (F.col("rnk") < F.col("cut_rank")))
        .select("l_suppkey", "rev", "rnk")
    )


def form_fused(spark, sf_dir):
    leaps = _leaps(spark, sf_dir)
    # one pass: global max leap + the best (largest-leap, smallest-rnk)
    # candidate among prev_rev<>0 rows; the cut exists iff the candidate's
    # leap equals the global max
    scalars = leaps.agg(
        F.max("leap").alias("max_leap"),
        F.max(
            F.when(
                F.col("prev_rev") != 0, F.struct(F.col("leap"), (-F.col("rnk")).alias("neg_rnk"))
            )
        ).alias("best_nz"),
    ).select(
        F.when(
            F.col("best_nz").isNotNull()
            & (F.col("best_nz.leap") == F.col("max_leap")),
            -F.col("best_nz.neg_rnk"),
        ).alias("cut_rank")
    )
    return (
        leaps.crossJoin(F.broadcast(scalars))
        .filter(F.col("cut_rank").isNull() | (F.col("rnk") < F.col("cut_rank")))
        .select("l_suppkey", "rev", "rnk")
    )


def main():
    from exstream_implementation_spark.session import get_spark

    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-topk-leap")
    forms = {"chain": form_chain, "fused": form_fused}

    # answers must agree before timing means anything
    rows = {
        name: sorted(map(tuple, fn(spark, sf_dir).collect()))
        for name, fn in forms.items()
    }
    assert rows["chain"] == rows["fused"], "forms disagree"
    print(f"answers agree: {len(rows['chain'])} rows", file=sys.stderr)

    out = {}
    for name, fn in forms.items():
        fn(spark, sf_dir).collect()  # warm
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "times": times,
            "mean": round(statistics.mean(times), 3),
            "stdev": round(statistics.stdev(times), 3) if len(times) > 1 else 0.0,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
