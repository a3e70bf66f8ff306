"""Scale smoke for the round-9 session-4 operators: KLL quantile
sketches and the Bloom decontamination prefilter.

Uses the same x{N} replicas as tools/scale_smoke.py (events get N x
longer with disjoint id/time ranges; documents get disjoint per-replica
token spaces).  Prints one JSON line; the session records it under
docs/SCALE_SMOKE_R9_S4.json.

Usage:  PYTHONPATH=/root/repo python tools/smoke_kll_bloom.py [N ...]
"""

from __future__ import annotations

import json
import sys
import time

from tools.scale_smoke import build_scaled


def _timed(fn):
    t0 = time.monotonic()
    out = fn()
    return out, round(time.monotonic() - t0, 2)


def run(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from exstream_implementation_spark.operators.kll import (
        kll_build,
        kll_merge,
        kll_quantiles,
    )
    from exstream_implementation_spark.plans.dedup import decontaminate
    from exstream_implementation_spark.sources import load_table

    timings: dict = {}
    events = load_table(spark, sf_dir, "events")

    # KLL: detail sketch per event_type, rolled up to global, estimated —
    # the full build/merge/estimate lattice in one wall number
    def kll_run():
        detail = kll_build(events, ["event_type"], "value", k=200)
        return kll_quantiles(kll_merge(detail, []), [0.5, 0.99]).collect()

    rows, timings["kll_build_merge_quantiles"] = _timed(kll_run)
    n_rows = rows[0]["n_rows"]

    # Bloom decontamination: exact semi-join arm vs bloom-prefiltered arm,
    # identical output by construction — the smoke records both walls
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("text")

    _, timings["decontaminate_exact"] = _timed(
        lambda: decontaminate(
            spark, sf_dir, benchmark=bench, max_overlap=0.1
        ).count()
    )
    _, timings["decontaminate_bloom"] = _timed(
        lambda: decontaminate(
            spark, sf_dir, benchmark=bench, max_overlap=0.1, bloom_fpp=0.01
        ).count()
    )

    # weighted exact-k: quality-weighted per-source quota over documents
    from exstream_implementation_spark.plans.dedup import sample_weighted_k

    weighted = docs.withColumn(
        "q", (F.col("doc_id") % 7 + 1).cast("double")
    )
    _, timings["sample_weighted_k_100"] = _timed(
        lambda: sample_weighted_k(weighted, "source", 100, "q").count()
    )

    # spectral audio features over real PCM16 payloads, one per doc
    from exstream_implementation_spark.operators.multimodal import (
        attach_audio_payload,
        audio_features,
    )

    _, timings["audio_features"] = _timed(
        lambda: audio_features(
            attach_audio_payload(docs.select("doc_id"))
        ).count()
    )

    # diversity sampling: Lloyd (5 iters, 16 cells) + exact-k per cell
    from exstream_implementation_spark.cache import release_tracked
    from exstream_implementation_spark.operators.kmeans import (
        cluster_balanced_sample,
    )

    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    _, timings["cluster_balanced_sample_16x50"] = _timed(
        lambda: cluster_balanced_sample(
            vecs, n_cells=16, per_cell=50, max_iter=5
        ).count()
    )
    release_tracked()
    return {"events_rows": int(n_rows), "timings_s": timings}


def main():
    from exstream_implementation_spark.session import get_spark

    spark = get_spark(app_name="smoke-kll-bloom")
    out: dict = {}
    base = "/root/testdata/sf0.1"
    out["x1"] = run(spark, base)
    for n in [int(a) for a in sys.argv[1:]] or [20]:
        out[f"x{n}"] = run(spark, build_scaled(spark, n))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
