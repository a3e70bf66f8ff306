"""Incremental-prep scale smoke: prove an increment costs O(batch), not
O(corpus).

Builds the x20 documents replica (100k docs), runs

  init       init_prep_state over the first 95% (the standing corpus)
  increment  prepare_increment over the remaining 5% (the daily batch)
  rebuild    from-scratch prepare_corpus over the union (what the
             increment replaces)

each with a real shard export (the stage that forces the whole chain),
and reports wall times.  The claim under test: t_increment tracks the
batch, so rebuild/increment >> 1 and grows with corpus/batch.

Usage: PYTHONPATH=/root/repo python tools/incremental_smoke.py [N]
Writes docs/SCALE_SMOKE_R9_S5.json (override with SPARK_GRAFT_SMOKE_OUT,
e.g. the r11 bloom-era series goes to SCALE_SMOKE_R11_BLOOM.json).

Two increments are timed: the first pays the one-time cold Bloom-sidecar
assembly (bounded by the bitmap, not the log rows); the second measures
the warm steady-state path a long-lived writer runs.  Set
SPARK_GRAFT_SKIP_REBUILD=1 to skip the from-scratch rebuild leg when only
the increment trend is being re-measured (the rebuild numbers are already
on record per scale).  Set SPARK_GRAFT_SMOKE_BLOOM=0 to init WITHOUT the
Bloom sidecars (membership_bloom_fpp=None): the record lands under
"x{N}_nobloom", so one JSON holds the bloom-vs-plain init overhead the
r12 ≤20% gate reads.

N=1000 (5M docs) needs SPARK_DRIVER_MEMORY=48g — the default 8g heap OOMs
in the substring/BPE stages of the init run (measured r10; the x300 run
fits in 8g).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def _docs_replica(spark, n: int) -> str:
    """Documents-only N× replica (same semantics as scale_smoke's
    documents branch: doc_id shifts, per-replica token prefix so replica
    token spaces are disjoint and cross-replica pairs share nothing) —
    built with ONE crossJoin against a replica range, so the plan stays
    constant-size at any N instead of a union of N branches."""
    from pyspark.sql import functions as F

    out = f"/root/repo/.scale/inc_docs_x{n}"
    done = f"{out}/_SUCCESS"
    if os.path.exists(done):
        return out
    shutil.rmtree(out, ignore_errors=True)
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    mx = docs.agg(F.max("doc_id")).first()[0]
    reps = spark.range(n).select(F.col("id").alias("rep"))
    scaled = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("rep") * (mx + 1)).alias("doc_id"),
        F.expr(
            "array_join(transform(split(text, '\\\\s+'),"
            " x -> concat('r', cast(rep as string), x)), ' ')"
        ).alias("text"),
        "lang",
        "source",
    )
    scaled.write.parquet(f"{out}/documents.parquet")
    with open(done, "w") as fh:
        fh.write(f"n={n}")
    return out


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from exstream_implementation_spark.corpus_prep import (
        CorpusPrepConfig,
        prepare_corpus,
    )
    from exstream_implementation_spark.incremental import (
        init_prep_state,
        prepare_increment,
    )
    from exstream_implementation_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name="incremental-smoke")
    sf_dir = _docs_replica(spark, n)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    # FIXED batch size (~5k docs) regardless of corpus scale, so
    # t_increment is comparable across replications: the claim is that it
    # tracks the batch while t_full_rebuild tracks the corpus
    total = docs.count()
    f1 = max(0.0, 1.0 - 10000.0 / total)
    f2 = max(0.0, 1.0 - 5000.0 / total)
    c1, c2 = docs.selectExpr(
        f"percentile_approx(doc_id, {f1}, 10000) as c1",
        f"percentile_approx(doc_id, {f2}, 10000) as c2",
    ).first()
    standing = docs.filter(F.col("doc_id") <= c1)
    batch = docs.filter(
        (F.col("doc_id") > c1) & (F.col("doc_id") <= c2)
    )
    batch2 = docs.filter(F.col("doc_id") > c2)
    n_standing, n_batch = standing.count(), batch.count()
    n_batch2 = batch2.count()

    # min_stop_ratio MUST be 0 here: the replica prefixes every token with
    # rN (to keep replica token spaces disjoint), so no English stopwords
    # survive and the default 0.02 gate would empty the corpus at stage 1
    # — the r9 runs of this tool had exactly that bug, so their recorded
    # trend (0.86x/1.55x/1.70x) measured a quality-emptied pipeline
    # (hashes/anchors logs held 0 rows).  With the gate open the pipeline
    # carries the full corpus through dedup/substring/BPE/shard and the
    # rebuild-vs-increment ratio is measured on real volume.
    cfg = CorpusPrepConfig(
        min_tokens=5,
        min_stop_ratio=0.0,
        substring_mod=8,
        max_per_source=200_000,
        bpe_merges=16,
        n_shards=8,
    )
    bloom = os.environ.get("SPARK_GRAFT_SMOKE_BLOOM", "1") != "0"
    work = tempfile.mkdtemp(prefix="inc_smoke_")
    out = {
        "replication": n,
        "standing_docs": n_standing,
        "batch_docs": n_batch,
        "batch2_docs": n_batch2,
        "bloom_sidecar": bloom,
    }
    try:
        t0 = time.monotonic()
        init_prep_state(
            standing,
            f"{work}/state",
            cfg=cfg,
            out_path=f"{work}/out",
            membership_bloom_fpp=0.01 if bloom else None,
        )
        out["t_init_s"] = round(time.monotonic() - t0, 2)

        # first increment: pays the cold Bloom assembly (bitmap-bounded)
        t0 = time.monotonic()
        prepare_increment(batch, f"{work}/state", out_path=f"{work}/out")
        out["t_increment_s"] = round(time.monotonic() - t0, 2)

        # second increment: the warm steady-state path
        t0 = time.monotonic()
        prepare_increment(batch2, f"{work}/state", out_path=f"{work}/out")
        out["t_increment2_s"] = round(time.monotonic() - t0, 2)

        # state-side floor: how much of the increment is just scanning
        # the membership logs (the O(corpus-ish) part that cannot shrink
        # with batch size — everything else in an increment is O(batch))
        from exstream_implementation_spark.incremental import (
            _read_log,
            read_state,
        )

        st = read_state(f"{work}/state")
        if st.get("bloom"):
            out["bloom_stage_times"] = {
                name: {
                    k: v
                    for k, v in meta.items()
                    if k.startswith("t_") or k in ("m_bits", "k_hashes")
                }
                for name, meta in st["bloom"]["logs"].items()
            }
        for log_name in ("hashes", "anchors"):
            t0 = time.monotonic()
            rows = _read_log(
                spark, f"{work}/state", log_name, st["logs"][log_name]
            ).count()
            out[f"t_{log_name}_log_scan_s"] = round(
                time.monotonic() - t0, 2
            )
            out[f"{log_name}_log_rows"] = rows

        if os.environ.get("SPARK_GRAFT_SKIP_REBUILD") != "1":
            t0 = time.monotonic()
            prepare_corpus(docs, None, cfg, out_path=f"{work}/rebuild")
            out["t_full_rebuild_s"] = round(time.monotonic() - t0, 2)
            out["rebuild_over_increment"] = round(
                out["t_full_rebuild_s"] / out["t_increment_s"], 2
            )
    finally:
        if os.environ.get("SPARK_GRAFT_SMOKE_KEEP") == "1":
            print("state kept at", work, flush=True)
        else:
            shutil.rmtree(work, ignore_errors=True)

    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        os.environ.get("SPARK_GRAFT_SMOKE_OUT", "SCALE_SMOKE_R9_S5.json"),
    )
    merged = {}
    if os.path.exists(dst):
        with open(dst) as fh:
            merged = json.load(fh)
    merged[f"x{n}" if bloom else f"x{n}_nobloom"] = out
    with open(dst, "w") as fh:
        json.dump(merged, fh, indent=1, sort_keys=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
