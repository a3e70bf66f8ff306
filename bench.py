"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop sink (full materialization, no
driver collect). The flagship is the complete EXstream pipeline; the rest
cover the operator families a 100 TB deployment leans on: scan+agg, windows,
broadcast join, leap cut, minhash/ngram dedup, ANN, text scoring.

"value"/"queries" are single-shot first-run timings — the series the
per-round BENCH_r{N}.json files have always recorded.  The rest of the line
exists to ADJUDICATE host drift rather than document it (r09's recorded
cold total moved +31% on an unchanged engine; the canaries said "slow host
window" but nothing enforced that reading):

  * "queries_warm"/"value_warm": per-query MEDIAN over
    $SPARK_GRAFT_BENCH_REPEATS (default 3) identical steady-state passes —
    session caches from the first pass may be reused, as a long-lived
    deployed engine would.  Medians absorb one-off scheduler hiccups that a
    single-shot number cannot.
  * "queries_warm_spread": per-query [min, max] across the warm repeats —
    a per-query move smaller than its own spread is noise by definition.
  * "machine_probe_before"/"machine_probe_after": fixed-size CPU + Spark-
    scheduler canaries (each the median of 3 runs) taken BEFORE the first
    timed pass and AFTER the last, so a host that changed speed mid-suite
    is visible, not inferred.
  * "value_warm_normalized": value_warm × (pinned reference spark-probe /
    observed spark-probe).  A round whose raw totals move with the probe
    but whose normalized total is flat is a host story, full stop.  The
    pinned constants were RE-PINNED in round 12 to the driver's CURRENT
    host family: the r08-r09 pin (0.32, band 0.25-0.53) came from the
    round-7/8 hosts, and every r10/r11 driver host probed 0.16-0.24 —
    permanently out of band, so the field had been null two rounds
    running and a real-vs-phantom regression took a manual idle-host
    re-run to adjudicate (r11 verdict).  Current pin: 0.20 = the mid of
    the r10-r11 driver-host observations (0.164 / ~0.20 / 0.243);
    validity band 0.13-0.33 covers those plus the r11 judge's idle-host
    runs.  Outside the band the field is null and "probe_out_of_band" is
    true — read the raw warm medians instead.
  * the field is ALSO null when the before/after probes disagree by more
    than 1.35× ("probe_drifted": the r11 driver host slowed 48% mid-suite;
    a median of two disagreeing probes hides exactly the instability the
    canaries exist to expose).  normalize_warm() is the pure function the
    tests pin this contract on.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

# pinned reference canaries (see module docstring for provenance:
# re-pinned r12 to the r10-r11 driver host family)
REF_PROBE_SPARK_S = 0.20
REF_PROBE_NUMPY_S = 0.20
PROBE_BAND = (0.13, 0.33)
PROBE_MAX_DRIFT = 1.35


def normalize_warm(
    value_warm: float, probe_before_s: float, probe_after_s: float
) -> tuple[float | None, dict]:
    """Host-speed correction with its two validity gates — pure, so the
    contract is unit-testable without running the suite.

    Returns (value_warm_normalized | None, flags):
      flags["probe_ratio"]           observed/pinned (observed = median of
                                     the before/after scheduler canaries)
      flags["probe_out_of_band"]     observed outside PROBE_BAND — the
                                     linear correction was never validated
                                     there, so no number is emitted
      flags["probe_intra_run_drift"] max/min of before vs after
      flags["probe_drifted"]         drift > PROBE_MAX_DRIFT — the host
                                     changed speed mid-suite, so no single
                                     correction factor is honest
    """
    observed = statistics.median([probe_before_s, probe_after_s])
    lo, hi = min(probe_before_s, probe_after_s), max(
        probe_before_s, probe_after_s
    )
    drift = hi / max(lo, 1e-9)
    flags = {
        "probe_ratio": round(observed / REF_PROBE_SPARK_S, 3),
        "probe_out_of_band": not (PROBE_BAND[0] <= observed <= PROBE_BAND[1]),
        "probe_intra_run_drift": round(drift, 3),
        "probe_drifted": drift > PROBE_MAX_DRIFT,
    }
    value = (
        None
        if flags["probe_out_of_band"] or flags["probe_drifted"]
        else round(value_warm * (REF_PROBE_SPARK_S / observed), 3)
    )
    return value, flags


def _probe(spark, np) -> dict[str, float]:
    """Fixed-size, data-independent machine-speed canaries: raw CPU via a
    numpy matmul, scheduler+codegen via a constant-size Spark range agg.
    Median of 3 so the canary itself isn't a single-shot number."""
    numpy_t, spark_t = [], []
    rng = np.random.default_rng(7)
    m = rng.standard_normal((1500, 1500))
    for _ in range(3):
        t0 = time.time()
        (m @ m).sum()
        numpy_t.append(time.time() - t0)
        t0 = time.time()
        spark.range(0, 200_000_000, 1, 32).selectExpr(
            "sum(id * 3 % 7) AS s"
        ).write.format("noop").mode("overwrite").save()
        spark_t.append(time.time() - t0)
    return {
        "numpy_matmul_s": round(statistics.median(numpy_t), 3),
        "spark_range_agg_s": round(statistics.median(spark_t), 3),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    repeats = max(int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")), 1)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from exstream_implementation_spark.session import get_spark
    from exstream_implementation_spark.plans import QUERIES
    import __spark_entry__ as entrymod
    import numpy as np

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

    # ann_topk_cosine_vectorized's catalog slot merged into ann_bucketed_topk
    # (round 11), but the bench series keeps timing the standalone brute-force
    # kernel so the per-round numbers stay comparable
    from exstream_implementation_spark.plans.similarity import (
        ann_topk_cosine_vectorized,
    )

    bench_fns = {
        name: QUERIES.get(name) or {
            "ann_topk_cosine_vectorized": ann_topk_cosine_vectorized,
        }[name]
        for name in bench_queries
    }

    def one_pass() -> dict[str, float]:
        timings: dict[str, float] = {}
        t0 = time.time()
        entrymod._flagship(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        timings["exstream_explain"] = round(time.time() - t0, 3)
        for name in bench_queries:
            t0 = time.time()
            bench_fns[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[name] = round(time.time() - t0, 3)
        return timings

    probe_before = _probe(spark, np)

    timings = one_pass()  # first-run: the historical BENCH series
    warm_passes = [one_pass() for _ in range(repeats)]  # steady-state

    probe_after = _probe(spark, np)

    from exstream_implementation_spark import cache

    cache.release_tracked()

    qnames = list(timings)
    warm = {
        q: round(statistics.median(p[q] for p in warm_passes), 3)
        for q in qnames
    }
    warm_spread = {
        q: [
            round(min(p[q] for p in warm_passes), 3),
            round(max(p[q] for p in warm_passes), 3),
        ]
        for q in qnames
    }
    value_warm = round(sum(warm.values()), 3)
    # host-speed correction + its validity gates (band + intra-run drift)
    # — see normalize_warm and the module docstring for provenance
    value_warm_normalized, probe_flags = normalize_warm(
        value_warm,
        probe_before["spark_range_agg_s"],
        probe_after["spark_range_agg_s"],
    )

    total = round(sum(timings.values()), 3)
    # the COLD headline gated by the same probe canaries as the warm one
    # (additive, r12 verdict item: cold is the noisiest recorded signal and
    # was the only one without a normalized/drift-gated reading).  The cold
    # pass runs adjacent to probe_before; the drift gate still uses both
    # probes so a host that changed speed mid-suite nulls this field too.
    # True cold per-query MEDIANS would need N separate JVMs and belong to
    # the driver's repeat policy, not one bench process.
    value_normalized, _ = normalize_warm(
        total,
        probe_before["spark_range_agg_s"],
        probe_after["spark_range_agg_s"],
    )
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "value_normalized": value_normalized,
                "value_warm": value_warm,
                "queries_warm": warm,
                "queries_warm_spread": warm_spread,
                "warm_repeats": repeats,
                "value_warm_normalized": value_warm_normalized,
                **probe_flags,
                "probe_reference": {
                    "spark_range_agg_s": REF_PROBE_SPARK_S,
                    "numpy_matmul_s": REF_PROBE_NUMPY_S,
                    "band": list(PROBE_BAND),
                    "provenance": "r10-r11 driver-host family (re-pinned r12)",
                },
                "machine_probe_before": probe_before,
                "machine_probe_after": probe_after,
                # kept for cross-round tooling that reads the r09 key
                "machine_probe": probe_before,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
