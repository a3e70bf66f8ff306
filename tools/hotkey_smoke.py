"""Planted-hot-key dedup skew smoke (VERDICT r07 next-round #8).

dedup_exact's docstring claims "skew only occurs on true duplicates" and
that map-side partial aggregation absorbs it.  This smoke PROVES it: plant
one boilerplate document over 10% of the x20 corpus (every doc_id % 10 == 0
gets the identical text → one content hash carries ~10% of all rows), run
the catalog dedup_exact, and read per-task duration quantiles from the
Spark REST API (taskSummary).  The verdict's bar: straggler ratio
(max task / median task in the heaviest stages) < 3×.

Why the plan survives the hot key:
  * both groupBys pre-combine map-side (partial_min / partial_count), so
    the hot hash reaches the reducer as ONE row per map task;
  * the join back h⋈grp is the real hazard (all hot-hash h-rows shuffle to
    one partition) — AQE skew-join splits that partition at runtime
    (spark.sql.adaptive.skewJoin, on by default in the session).

Usage: PYTHONPATH=. python tools/hotkey_smoke.py [x-factor]
Exit 0 iff every qualifying stage's straggler ratio < 3.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import urllib.request

BOILERPLATE = (
    "subscribe to our newsletter terms of service privacy policy all "
    "rights reserved copyright contact us about careers press kit "
) * 4
ROOT = "/root/repo/.scale"
SENTINEL_V = "hot-v1"


def build_hot_corpus(spark, factor: int) -> str:
    sys.path.insert(0, "tools")
    from scale_smoke import build_scaled

    from pyspark.sql import functions as F

    base = build_scaled(spark, factor)
    out = f"{ROOT}/hotkey_x{factor}"
    sentinel = f"{out}/_SUCCESS"
    stamp = f"{SENTINEL_V}:x={factor}"
    if os.path.exists(sentinel) and open(sentinel).read().strip() == stamp:
        return out
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out)
    docs = spark.read.parquet(f"{base}/documents.parquet")
    hot = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 10 == 0, F.lit(BOILERPLATE)).otherwise(
            F.col("text")
        ),
    ).withColumn("n_chars", F.length("text"))
    hot.write.parquet(f"{out}/documents.parquet")
    with open(sentinel, "w") as fh:
        fh.write(stamp)
    return out


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def stage_straggler_ratios(ui: str, min_tasks: int = 2) -> list[dict]:
    """[(stage, tasks, median_ms, max_ms, ratio)] for completed stages with
    enough tasks for a median to mean anything."""
    apps = _get(f"{ui}/api/v1/applications")
    app_id = apps[0]["id"]
    out = []
    for st in _get(f"{ui}/api/v1/applications/{app_id}/stages?status=COMPLETE"):
        if st["numCompleteTasks"] < min_tasks:
            continue
        sid, att = st["stageId"], st["attemptId"]
        summ = _get(
            f"{ui}/api/v1/applications/{app_id}/stages/{sid}/{att}/"
            "taskSummary?quantiles=0.5,1.0"
        )
        med, mx = summ["duration"]
        if med <= 0:
            continue
        srm = summ.get("shuffleReadMetrics", {}).get("readBytes", [0, 0])
        out.append(
            {
                "stage": sid,
                "tasks": st["numCompleteTasks"],
                "median_ms": round(med, 1),
                "max_ms": round(mx, 1),
                "ratio": round(mx / med, 2),
                "stage_shuffle_read_mb": round(
                    st.get("shuffleReadBytes", 0) / 1e6, 1
                ),
                "task_shuffle_read_mb": [round(v / 1e6, 2) for v in srm],
            }
        )
    return sorted(out, key=lambda r: -r["max_ms"])


def main():
    from exstream_implementation_spark.plans.dedup import dedup_exact
    from exstream_implementation_spark.session import get_spark

    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark(
        app_name="hotkey-smoke", extra_conf={"spark.ui.enabled": "true"}
    )
    hot_dir = build_hot_corpus(spark, factor)

    df = dedup_exact(spark, hot_dir)
    df.write.format("noop").mode("overwrite").save()
    n_dups = df.filter("is_duplicate").count()

    ui = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}"
    ratios = stage_straggler_ratios(ui)
    worst = max((r["ratio"] for r in ratios), default=0.0)
    print(
        json.dumps(
            {
                "x": factor,
                "hot_fraction": 0.1,
                "exact_duplicates_found": n_dups,
                "worst_straggler_ratio": worst,
                "stages": ratios[:8],
            }
        )
    )
    return 0 if worst < 3.0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
