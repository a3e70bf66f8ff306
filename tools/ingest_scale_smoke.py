"""Refreshing-ingest growth smoke: stream the x20 document corpus (~100k
docs) through ``start_refreshing_ingest`` from an EMPTY corpus and record
per-microbatch trigger durations as the persistent corpus + band indexes
grow from 0 to the full corpus.

What this characterizes (complements the plan-pinned no-exchange property):
the per-trigger cost curve.  The corpus side of each batch's joins is
re-SCANNED every trigger (bucketing removes the shuffle, not the scan — see
the module's cost-honesty note), so batch durations are expected to grow
mildly with corpus size; this smoke puts a number on "mildly" and fails if
the LAST batch exceeds GROWTH_BAR× the first batches' median (super-linear
blowup or accidental corpus re-shuffle would trip it).

Usage: PYTHONPATH=. python tools/ingest_scale_smoke.py [x-factor] [n-batches]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import statistics
import sys
import tempfile

GROWTH_BAR = 4.0


def main():
    sys.path.insert(0, "tools")
    from scale_smoke import build_scaled

    from exstream_implementation_spark.session import get_spark
    from exstream_implementation_spark.streaming.ingest_dedup import (
        documents_stream,
        init_neardup_corpus,
        refresh_neardup_tables,
        start_refreshing_ingest,
        with_event_time,
    )

    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    spark = get_spark(app_name="ingest-scale-smoke")
    src = f"{build_scaled(spark, factor)}/documents.parquet"
    n_files = len(
        [f for f in os.listdir(src) if f.endswith(".parquet")]
    )
    per_trigger = max(1, math.ceil(n_files / n_batches))

    name = "ingest_smoke"
    init_neardup_corpus(spark, name, n_buckets=32)
    ckpt = tempfile.mkdtemp(prefix="ingest_smoke_ckpt_")
    try:
        q = start_refreshing_ingest(
            with_event_time(
                documents_stream(spark, src, max_files_per_trigger=per_trigger)
            ),
            name,
            ckpt,
        )
        assert q.awaitTermination(1800), "ingest did not drain in 30 min"
        prog = [
            {
                "batch": p["batchId"],
                "rows": p["numInputRows"],
                "ms": p["durationMs"]["triggerExecution"],
            }
            # recentProgress yields StreamingQueryProgress objects; .json is
            # the portable accessor across PySpark versions
            for p in (json.loads(sp.json) for sp in q.recentProgress)
            if p["numInputRows"] > 0
        ]
        refresh_neardup_tables(spark, name)
        admitted = spark.table(f"{name}_admitted").count()
        sh_flags = spark.table(f"{name}_sh_flags").count()
        mh_flags = spark.table(f"{name}_mh_flags").count()

        head = [p["ms"] for p in prog[: max(3, len(prog) // 3)]]
        growth = round(prog[-1]["ms"] / statistics.median(head), 2)
        print(
            json.dumps(
                {
                    "x": factor,
                    "batches": prog,
                    "admitted": admitted,
                    "sh_flags": sh_flags,
                    "mh_flags": mh_flags,
                    "last_vs_early_median": growth,
                    "bar": GROWTH_BAR,
                }
            )
        )
        return 0 if growth < GROWTH_BAR else 1
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        for sfx in ("admitted", "sh_idx", "mh_idx", "sh_flags", "mh_flags",
                    "meta"):
            spark.sql(f"DROP TABLE IF EXISTS {name}_{sfx}")


if __name__ == "__main__":
    raise SystemExit(main())
