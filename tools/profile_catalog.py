"""Spark-side wall-clock profile of every catalog query (noop sink).

Usage: PYTHONPATH=/root/repo SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
           python tools/profile_catalog.py [--reps N] [names...]

The oracle sweep's wall_s mixes Spark and DuckDB time; this tool times only
the engine: build the DataFrame, materialize through the noop sink (guide
§1.4), per query, ``reps`` passes, report each pass (pass 1 ≈ cold-ish,
later passes steady-state).  One JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 2
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
        args = [a for a in args if a != str(reps)]

    from exstream_implementation_spark.session import get_spark, tune_session
    from exstream_implementation_spark.plans import QUERIES
    from exstream_implementation_spark import cache

    spark = tune_session(get_spark(app_name="exstream-catalog-profile"))

    # untimed warm-up: pay one-time JVM/codegen init on a small query
    from exstream_implementation_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, SF_DIR, t).write.format("noop").mode("overwrite").save()

    names = args or list(QUERIES)
    out = {}
    for name in names:
        fn = QUERIES[name]
        times = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} pass{i}")
            t0 = time.time()
            try:
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            except Exception as e:
                times.append(f"ERR: {str(e)[:120]}")
                break
            times.append(round(time.time() - t0, 3))
        out[name] = times
        print(f"{name}: {times}", file=sys.stderr)
    cache.release_tracked()
    print(json.dumps({"sf_dir": SF_DIR, "reps": reps, "times_s": out}))
    spark.stop()


if __name__ == "__main__":
    main()
