"""Interleaved A/B: old vs new single_feature_rewards plan shape (r12).

A (old, r11 shape): sorted mode ranks r via the (key, feature, value) window
   (worst_case_labels) and joins a separate class-counts aggregate over
   melted.
B (new): sorted mode orders the segmentation window by (value, type_data,
   timestamp) directly, and class counts fold into the segment aggregates
   (class_counts=True) — no second melted pass, no seg⋈cls join.

Both are materialized with the noop sink, interleaved A/B/A/B ×reps, on the
sf0.1 melted-events relation (the exstream_rewards input).  Prints one JSON
line with per-rep pairs and medians.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "4"))


def old_rewards(melted, mode):
    from exstream_implementation_spark.operators.rewards import (
        segmentation_entropy,
        worst_case_labels,
    )

    seg = segmentation_entropy(worst_case_labels(melted, mode))
    cls = melted.groupBy("ano_key", "feature").agg(
        F.count(F.when(F.col("type_data") == 0, 1)).alias("n_ref"),
        F.count(F.when(F.col("type_data") == 1, 1)).alias("n_ano"),
    )
    n = F.col("n_ref") + F.col("n_ano")
    p_r, p_a = F.col("n_ref") / n, F.col("n_ano") / n
    cls = cls.withColumn(
        "class_ent",
        F.when(
            (F.col("n_ref") > 0) & (F.col("n_ano") > 0),
            p_a * F.log2(1.0 / p_a) + p_r * F.log2(1.0 / p_r),
        ),
    )
    rewards = (
        seg.join(cls, ["ano_key", "feature"])
        .withColumn("reward", F.col("class_ent") / F.col("seg_ent"))
        .select("ano_key", "feature", "feature_order", "reward")
    )
    w = Window.partitionBy("ano_key").orderBy(
        F.desc("reward"), F.asc("feature_order")
    )
    return rewards.withColumn("rank", F.row_number().over(w))


def new_rewards(melted, mode):
    from exstream_implementation_spark.operators.rewards import (
        single_feature_rewards,
    )

    return single_feature_rewards(melted, duplicate_mode=mode)


def main():
    from exstream_implementation_spark.session import get_spark, tune_session
    from exstream_implementation_spark.plans.exstream_sql import _events_melted

    spark = tune_session(get_spark(app_name="ab-rewards-fold"))
    melted = _events_melted(spark, SF_DIR)

    def run(fn, label):
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        out = fn(melted, "sorted").unionByName(fn(melted, "worst_case"))
        out.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    # warm both once (untimed)
    run(old_rewards, "warm A")
    run(new_rewards, "warm B")

    pairs = []
    for i in range(REPS):
        a = run(old_rewards, f"A rep{i}")
        b = run(new_rewards, f"B rep{i}")
        pairs.append([a, b])
    a_med = statistics.median(p[0] for p in pairs)
    b_med = statistics.median(p[1] for p in pairs)
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "reps": REPS,
                "pairs_old_new_s": pairs,
                "old_median_s": a_med,
                "new_median_s": b_med,
                "speedup": round(a_med / b_med, 3) if b_med else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
