"""Recall-vs-cost curve for emb_neardup_lsh (VERDICT r07 next-round #5).

The r07 verdict accepted emb_neardup_lsh's recall-vs-occupancy trade but
noted it had a single recorded operating point (TARGET_BUCKET_OCC=64) and
no curve.  This sweeps occupancy {16, 32, 64, 128} at the x20 replica
(~40k vectors) and reports, per point:

  planes    hyperplanes per LSH table (adaptive: log2(n / occupancy))
  recall    fraction of the label-blocked exact baseline's pairs
            (emb_neardup_cosine — the known-duplicate population) that the
            LSH-blocked pass recovers, on the full cosine>=0.3 population
            AND on the cosine>=0.8 sub-population (the pairs a near-dup
            pruner actually exists to catch)
  pairs     emitted pair count (exact re-rank, so all are true >= 0.3 pairs)
  wall_s    end-to-end wall for the PRODUCTION path (Arrow-matmul buckets)

Occupancy halves → one more plane → buckets split in two → candidate join
volume halves but 1-bit-separated true pairs need the Hamming-1 probe to
meet, trimming recall.  The curve quantifies both arms.

A second sweep (``--cap``) holds occ=64 and varies the opt-in hot-bucket
cap (emb_neardup_lsh max_bucket — the _capped_gram_edges pattern): how
much wall does dropping oversized buckets save, and what does it cost in
recall on each population?

Usage: PYTHONPATH=. python tools/neardup_curve.py [x-factor] [--cap]
"""

from __future__ import annotations

import json
import sys
import time

from exstream_implementation_spark.session import get_spark


def main():
    cap_mode = "--cap" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    factor = int(args[0]) if args else 20
    sys.path.insert(0, "tools")
    from scale_smoke import build_scaled

    from exstream_implementation_spark.plans import similarity as sim

    spark = get_spark(app_name="neardup-curve")
    sf_dir = build_scaled(spark, factor)

    truth_rows = sim.emb_neardup_cosine(spark, sf_dir).select(
        "vec_a", "vec_b", "cosine"
    ).collect()
    truth = {(r["vec_a"], r["vec_b"]) for r in truth_rows}
    truth_hi = {
        (r["vec_a"], r["vec_b"]) for r in truth_rows if r["cosine"] >= 0.8
    }
    print(
        f"truth pairs (label-blocked exact): {len(truth)}"
        f" (cos>=0.8: {len(truth_hi)})",
        file=sys.stderr,
    )

    default_occ = sim.TARGET_BUCKET_OCC
    out = []
    sweep = (
        [(64, cap) for cap in (None, 1024, 512, 256)]
        if cap_mode
        else [(occ, None) for occ in (16, 32, 64, 128)]
    )
    try:
        for occ, cap in sweep:
            sim.TARGET_BUCKET_OCC = occ
            sim._PLANES_CACHE.clear()
            t0 = time.perf_counter()
            got = {
                (r["vec_a"], r["vec_b"])
                for r in sim.emb_neardup_lsh(
                    spark,
                    sf_dir,
                    buckets=sim.lsh_buckets_vectorized(spark, sf_dir),
                    max_bucket=cap,
                )
                .select("vec_a", "vec_b")
                .collect()
            }
            wall = round(time.perf_counter() - t0, 2)
            rec = round(len(got & truth) / len(truth), 4) if truth else 1.0
            rec_hi = (
                round(len(got & truth_hi) / len(truth_hi), 4)
                if truth_hi
                else 1.0
            )
            row = {
                "occ": occ,
                "cap": cap,
                "planes": sim._PLANES_CACHE[sf_dir],
                "recall": rec,
                "recall_hi": rec_hi,
                "pairs": len(got),
                "wall_s": wall,
            }
            out.append(row)
            print(json.dumps(row), file=sys.stderr)
    finally:
        sim.TARGET_BUCKET_OCC = default_occ
        sim._PLANES_CACHE.clear()
    print(json.dumps({"x": factor, "truth_pairs": len(truth), "truth_hi": len(truth_hi), "curve": out}))


if __name__ == "__main__":
    main()
