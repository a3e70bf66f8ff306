"""Streaming distinct monitor (streaming/stats.py): an availableNow
drain's running totals match a batch HLL over the same data exactly,
n_rows stays exact across microbatches, redelivered batches don't
double-count, and the rollup lattice works off the same log."""

import math

from pyspark.sql import functions as F

from exstream_implementation_spark.operators.approx import (
    hll_build,
    hll_estimate,
)
from exstream_implementation_spark.streaming.ingest_dedup import (
    documents_stream,
)
from exstream_implementation_spark.streaming.stats import (
    running_distinct,
    sketch_sink,
    start_distinct_monitor,
)

SF_DIR = "/root/testdata/sf0.001"
TOL = 6 * 1.04 / math.sqrt(2**12)


def _doc_dir(spark, tmp_path, n_files=4):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    d = str(tmp_path / "docs_in")
    docs.repartition(n_files).write.parquet(d)
    return d, docs


def test_stream_matches_batch_and_exact_envelope(spark, tmp_path):
    d, docs = _doc_dir(spark, tmp_path)
    log = str(tmp_path / "sketch_log")
    q = start_distinct_monitor(
        spark,
        documents_stream(spark, d, max_files_per_trigger=1),
        log,
        ["source"],
        "doc_id",
        checkpoint=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)
    got = {
        r["source"]: r for r in running_distinct(spark, log, ["source"]).collect()
    }
    exact = {
        r["source"]: r["ex"]
        for r in docs.groupBy("source")
        .agg(F.countDistinct("doc_id").alias("ex"))
        .collect()
    }
    n_rows = {
        r["source"]: r["c"]
        for r in docs.groupBy("source")
        .agg(F.count("doc_id").alias("c"))
        .collect()
    }
    assert set(got) == set(exact)
    for s, r in got.items():
        assert r["n_rows"] == n_rows[s]                       # exact
        assert abs(r["distinct_est"] - exact[s]) <= max(2, TOL * exact[s])
    # global rollup from the SAME log
    glob = running_distinct(spark, log, []).collect()[0]
    assert glob["n_rows"] == sum(n_rows.values())
    total_exact = docs.select("doc_id").distinct().count()
    assert abs(glob["distinct_est"] - total_exact) <= max(2, TOL * total_exact)


def test_redelivered_batch_does_not_double_count(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    log = str(tmp_path / "redeliver_log")
    sink = sketch_sink(log, ["source"], "doc_id")
    sink(docs, 7)
    before = {
        r["source"]: (r["n_rows"], r["distinct_est"])
        for r in running_distinct(spark, log, ["source"]).collect()
    }
    sink(docs, 7)  # at-least-once redelivery: same batch_id, same content
    after = {
        r["source"]: (r["n_rows"], r["distinct_est"])
        for r in running_distinct(spark, log, ["source"]).collect()
    }
    assert after == before
    # a genuinely NEW batch does count
    sink(docs, 8)
    bumped = {
        r["source"]: r["n_rows"]
        for r in running_distinct(spark, log, ["source"]).collect()
    }
    for s, (n, _) in before.items():
        assert bumped[s] == 2 * n
