"""Overhead-floor measurement for text_fingerprint (r10 verdict #4).

The r9/r10 rounds missed the <=1.5 s warm target twice, each time with a
stage-attribution defense ("the residual is fixed stage overhead at sf0.1,
not plan fat").  This tool settles it with data: run the IDENTICAL plan on
an empty corpus and a 1-row corpus (the edge fixtures) to measure the pure
scheduler/stage floor — everything that is not data work — then report
warm-minus-floor at sf0.1, per branch.

Branch isolation uses `filter(branch = X)` over the catalog query: branch
is a per-arm literal, so Catalyst folds the filter into the union and
PRUNES the other arms — each timing is that branch's real subtree, not the
full union with a post-filter.

Usage: PYTHONPATH=/root/repo python tools/ab_fingerprint_floor.py [reps]
Writes docs/AB_FINGERPRINT_FLOOR.json and prints it.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"
EMPTY = "/root/repo/.scale/edge_empty"
ONEROW = "/root/repo/.scale/edge_1row"
OUT = "/root/repo/docs/AB_FINGERPRINT_FLOOR.json"
BRANCHES = ("fp", "span", "bm25")


def main() -> None:
    from pyspark.sql import functions as F

    from exstream_implementation_spark import cache
    from exstream_implementation_spark.plans.text import text_fingerprint
    from exstream_implementation_spark.session import get_spark

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="ab-fingerprint-floor")

    def run(sf_dir: str, branch: str | None) -> None:
        df = text_fingerprint(spark, sf_dir)
        if branch is not None:
            df = df.filter(F.col("branch") == branch)
        df.write.format("noop").mode("overwrite").save()

    # session warm-up, untimed (JVM/codegen/Arrow init) + first touch of
    # every corpus so timings measure the engine, not page-cache misses
    for sf in (SF_DIR, EMPTY, ONEROW):
        run(sf, None)

    report: dict = {"reps": reps, "median_s": {}}
    for label, sf in (("sf0.1", SF_DIR), ("empty", EMPTY), ("1row", ONEROW)):
        for branch in (None, *BRANCHES):
            key = f"{label}/{branch or 'all'}"
            ts = []
            for _ in range(reps):
                t0 = time.time()
                run(sf, branch)
                ts.append(time.time() - t0)
            report["median_s"][key] = round(statistics.median(ts), 3)
    cache.release_tracked()

    floor = report["median_s"]["empty/all"]
    floor1 = report["median_s"]["1row/all"]
    warm = report["median_s"]["sf0.1/all"]
    report["floor_empty_s"] = floor
    report["floor_1row_s"] = floor1
    report["warm_sf01_s"] = warm
    report["warm_minus_floor_s"] = round(warm - max(floor, floor1), 3)
    report["data_work_per_branch_s"] = {
        b: round(
            report["median_s"][f"sf0.1/{b}"]
            - max(report["median_s"][f"empty/{b}"],
                  report["median_s"][f"1row/{b}"]),
            3,
        )
        for b in BRANCHES
    }
    with open(OUT, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
