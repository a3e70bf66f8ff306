"""Streaming distinct monitor (streaming/stats.py): an availableNow
drain's running totals match a batch HLL over the same data, n_rows
stays exact across microbatches, redelivered batches replace their own
partition (write-time idempotency), empty batches and a not-yet-created
log are handled, and the rollup lattice works off the same log."""

import math

from pyspark.sql import functions as F

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


def test_stream_matches_batch_and_exact_envelope(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    d = str(tmp_path / "docs_in")
    docs.repartition(4).write.parquet(d)
    log = str(tmp_path / "sketch_log")
    q = start_distinct_monitor(
        documents_stream(spark, d, max_files_per_trigger=1),
        log,
        ["source"],
        "doc_id",
        checkpoint=str(tmp_path / "ckpt"),
        available_now=True,
    )
    # awaitTermination returns False (no raise) on timeout — assert it so
    # a slow run fails loudly instead of reading a half-populated log
    assert q.awaitTermination(300)
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


def test_redelivered_batch_replaces_its_partition(spark, tmp_path):
    # deterministic subset — an unordered limit() could legally pick a
    # different row set on each recomputation
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") < 100
    )
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
    # write-time idempotency: exactly one log row per (batch, source)
    per = (
        spark.read.parquet(log)
        .groupBy("batch_id", "source")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert per == 1
    # a genuinely NEW batch does count
    sink(docs, 8)
    bumped = {
        r["source"]: r["n_rows"]
        for r in running_distinct(spark, log, ["source"]).collect()
    }
    for s, (n, _) in before.items():
        assert bumped[s] == 2 * n


def test_empty_batch_and_missing_log(spark, tmp_path):
    log = str(tmp_path / "never_written")
    empty = spark.createDataFrame([], "doc_id long, source string")
    # empty batch writes nothing, even at the global grain
    sketch_sink(log, [], "doc_id")(empty, 0)
    out = running_distinct(spark, log, [])
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "hll_sketch",
        "n_rows",
        "distinct_est",
    ]
    # and a keyed read of a missing log keeps the key columns
    keyed = running_distinct(spark, log, ["source"])
    assert keyed.count() == 0 and keyed.columns[0] == "source"


# --- running quantiles (KLL twin) --------------------------------------------
def test_quantile_stream_matches_batch_envelope(spark, tmp_path):
    """An availableNow drain's running quantiles sit inside the KLL rank
    envelope of the exact full-corpus quantiles, per group and rolled up
    globally from the SAME log; n_rows stays exact."""
    import numpy as np

    from exstream_implementation_spark.streaming.stats import (
        running_quantiles,
        start_quantile_monitor,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    d = str(tmp_path / "docs_in_q")
    docs.repartition(4).write.parquet(d)
    log = str(tmp_path / "kll_log")
    q = start_quantile_monitor(
        documents_stream(spark, d, max_files_per_trigger=1),
        log,
        ["source"],
        "n_chars",
        checkpoint=str(tmp_path / "ckpt_q"),
        available_now=True,
    )
    assert q.awaitTermination(300)
    qs = [0.1, 0.5, 0.9]
    got = {
        r["source"]: r
        for r in running_quantiles(spark, log, ["source"], qs).collect()
    }
    pdf = docs.select("source", "n_chars").toPandas()
    pdf = pdf[pdf["n_chars"].notna()]
    def in_envelope(exact, prob, est, tol=0.02):
        # a tied value occupies the whole rank interval [left, right); the
        # estimate is in-envelope if that interval touches prob +/- tol
        n = len(exact)
        lo = np.searchsorted(exact, est, side="left") / n
        hi = np.searchsorted(exact, est, side="right") / n
        return lo - tol <= prob <= hi + tol

    for src, sub in pdf.groupby("source"):
        exact = np.sort(sub["n_chars"].to_numpy())
        assert got[src]["n_rows"] == len(exact)
        for prob, est in zip(qs, got[src]["quantiles"]):
            assert in_envelope(exact, prob, est), (src, prob)
    glob = running_quantiles(spark, log, [], qs).collect()[0]
    exact_all = np.sort(pdf["n_chars"].to_numpy())
    assert glob["n_rows"] == len(exact_all)
    for prob, est in zip(qs, glob["quantiles"]):
        assert in_envelope(exact_all, prob, est), prob


def test_quantile_redelivery_and_missing_log(spark, tmp_path):
    from exstream_implementation_spark.streaming.stats import (
        quantile_sketch_sink,
        running_quantiles,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") < 100
    )
    log = str(tmp_path / "kll_redeliver")
    sink = quantile_sketch_sink(log, ["source"], "n_chars", k=64)
    sink(docs, 7)
    before = {
        r["source"]: (r["n_rows"], r["quantiles"])
        for r in running_quantiles(spark, log, ["source"], [0.5]).collect()
    }
    sink(docs, 7)  # redelivery: same batch_id replaces its own partition
    after = {
        r["source"]: (r["n_rows"], r["quantiles"])
        for r in running_quantiles(spark, log, ["source"], [0.5]).collect()
    }
    assert after == before
    sink(docs, 8)  # a genuinely new batch doubles the weight
    bumped = {
        r["source"]: r["n_rows"]
        for r in running_quantiles(spark, log, ["source"], [0.5]).collect()
    }
    for s, (n, _) in before.items():
        assert bumped[s] == 2 * n
    # missing log: empty frame, schema intact, key columns preserved
    missing = running_quantiles(
        spark, str(tmp_path / "never_q"), ["source"], [0.5]
    )
    assert missing.count() == 0 and missing.columns[0] == "source"
    # empty batch writes nothing even at the global grain
    empty = spark.createDataFrame([], "n_chars long, source string")
    quantile_sketch_sink(str(tmp_path / "never_q2"), [], "n_chars")(empty, 0)
    assert (
        running_quantiles(spark, str(tmp_path / "never_q2"), [], [0.5]).count()
        == 0
    )
    # asking for a key the log wasn't built with fails loudly
    import pytest

    with pytest.raises(ValueError, match="not in the sketch log"):
        running_quantiles(spark, log, ["lang"], [0.5]).collect()


# --- running heavy hitters (space-saving twin) --------------------------------
def test_heavy_hitters_stream_matches_batch_bounds(spark, tmp_path):
    """An availableNow drain's running heavy hitters carry valid bounds
    around the exact counts (count_lo <= true <= count_hi), report the
    genuinely heavy keys, and match the one-shot batch sketch's top set
    over the same data."""
    from exstream_implementation_spark.operators.sketches import (
        heavy_hitters,
    )
    from exstream_implementation_spark.streaming.stats import (
        running_heavy_hitters,
        start_heavy_hitters_monitor,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    d = str(tmp_path / "docs_in_hh")
    docs.repartition(4).write.parquet(d)
    log = str(tmp_path / "hh_log")
    q = start_heavy_hitters_monitor(
        documents_stream(spark, d, max_files_per_trigger=1),
        log,
        "lang",
        checkpoint=str(tmp_path / "ckpt_hh"),
        capacity=64,
        available_now=True,
    )
    assert q.awaitTermination(300)
    got = running_heavy_hitters(spark, log, 5).collect()
    exact = {
        r["lang"]: r["c"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("c")).collect()
    }
    assert len(got) == min(5, len(exact))
    for r in got:
        assert r["count_lo"] <= exact[r["key"]] <= r["count_hi"], r
    # the reported set matches the one-shot batch sketch's top set
    batch_top = {
        r["key"] for r in heavy_hitters(docs, "lang", 5, capacity=64).collect()
    }
    assert {r["key"] for r in got} == batch_top
    # the true heaviest key is reported first-or-tied (bounds ordering)
    heaviest = max(exact, key=exact.get)
    assert heaviest in {r["key"] for r in got}


def test_heavy_hitters_redelivery_and_missing_log(spark, tmp_path):
    from exstream_implementation_spark.streaming.stats import (
        heavy_hitters_sink,
        running_heavy_hitters,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    log = str(tmp_path / "hh_redeliver")
    sink = heavy_hitters_sink(log, "lang", 64)
    sink(docs, 3)
    before = {
        (r["key"], r["count_lo"], r["count_hi"])
        for r in running_heavy_hitters(spark, log, 10).collect()
    }
    sink(docs, 3)  # redelivered batch replaces its own partition
    after = {
        (r["key"], r["count_lo"], r["count_hi"])
        for r in running_heavy_hitters(spark, log, 10).collect()
    }
    assert after == before
    sink(docs, 4)  # a genuinely new batch doubles every bound
    doubled = {
        r["key"]: (r["count_lo"], r["count_hi"])
        for r in running_heavy_hitters(spark, log, 10).collect()
    }
    for key, lo, hi in before:
        assert doubled[key] == (2 * lo, 2 * hi)
    # missing log: empty frame with the reader schema
    missing = running_heavy_hitters(spark, str(tmp_path / "never_hh"), 3)
    assert missing.count() == 0
    assert missing.columns == ["key", "count_lo", "count_hi", "exact"]
    import pytest

    with pytest.raises(ValueError, match="k must be"):
        running_heavy_hitters(spark, log, 0)
