"""Mergeable HLL distinct sketches (operators/approx.py): merged
estimates land inside the published error envelope of the exact distinct
of the UNION (never lose/double-count), rollup-lattice grains each stay
in-envelope, incremental-day accumulation works with overlap, n_rows is
exactly additive, and null/argument semantics are pinned."""

import math

import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.operators.approx import (
    distinct_rollup,
    hll_build,
    hll_estimate,
    hll_merge,
)
from exstream_implementation_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"
LGK = 12
# Datasketches HLL relative standard error ~ 1.04 / sqrt(2^lgk);
# 6 sigma gives a deterministic-test margin with no real miss risk.
TOL = 6 * 1.04 / math.sqrt(2**LGK)


def _ok(est: int, exact: int) -> bool:
    return abs(est - exact) <= max(2, TOL * exact)


def _est(df, keys):
    return {
        tuple(r[k] for k in keys): r["distinct_est"] for r in df.collect()
    }


def test_estimate_within_error_envelope(spark):
    docs = load_table(spark, SF_DIR, "documents")
    got = hll_estimate(hll_build(docs, [], "doc_id", lgk=LGK)).collect()[0]
    exact = docs.select("doc_id").distinct().count()
    assert got["n_rows"] == docs.filter(F.col("doc_id").isNotNull()).count()
    assert _ok(got["distinct_est"], exact)


def test_merged_splits_estimate_the_union(spark):
    """Two different partitionings of the same corpus, sketched per group
    and merged: both estimates sit inside the envelope of the ONE exact
    distinct — merging neither loses nor double-counts values."""
    docs = load_table(spark, SF_DIR, "documents")
    exact = docs.select("text").distinct().count()
    for mod in (3, 7):
        grouped = docs.withColumn("g", F.col("doc_id") % mod)
        merged = hll_estimate(
            hll_merge(hll_build(grouped, ["g"], "text", lgk=LGK), [])
        ).collect()[0]
        assert _ok(merged["distinct_est"], exact), mod
        assert merged["n_rows"] == docs.filter(F.col("text").isNotNull()).count()


def test_incremental_day_accumulation(spark):
    """Running state: merge(sketch(batch1) ∪ sketch(batch2)) estimates
    the distinct of batch1 ∪ batch2 even when the batches overlap (the
    cross-day dedup case), and n_rows adds EXACTLY across batches."""
    docs = load_table(spark, SF_DIR, "documents")
    day1 = docs.filter(F.col("doc_id") % 3 != 0)
    day2 = docs.filter(F.col("doc_id") % 2 == 0)  # overlaps day1
    s1 = hll_build(day1, ["source"], "doc_id", lgk=LGK)
    s2 = hll_build(day2, ["source"], "doc_id", lgk=LGK)
    running = hll_merge(s1.unionByName(s2), ["source"])
    exact = {
        r["source"]: r["ex"]
        for r in day1.unionByName(day2)
        .groupBy("source")
        .agg(F.countDistinct("doc_id").alias("ex"))
        .collect()
    }
    for r in hll_estimate(running).collect():
        assert _ok(r["distinct_est"], exact[r["source"]]), r["source"]
    run_rows = {r["source"]: r["n_rows"] for r in running.collect()}
    d1 = {r["source"]: r["c"] for r in day1.groupBy("source").agg(F.count("doc_id").alias("c")).collect()}
    d2 = {r["source"]: r["c"] for r in day2.groupBy("source").agg(F.count("doc_id").alias("c")).collect()}
    for src, n in run_rows.items():
        assert n == d1.get(src, 0) + d2.get(src, 0)


def test_rollup_lattice_consistency(spark):
    """One detail sketch table (source × lang) serves every coarser
    grain; each rollup estimate stays inside the envelope of the exact
    distinct at that grain."""
    docs = load_table(spark, SF_DIR, "documents")
    detail = hll_build(docs, ["source", "lang"], "doc_id", lgk=LGK)
    for keys in (["source"], ["lang"], []):
        rolled = _est(hll_estimate(hll_merge(detail, keys)), keys)
        exact = {
            tuple(r[k] for k in keys): r["ex"]
            for r in docs.groupBy(*keys)
            .agg(F.countDistinct("doc_id").alias("ex"))
            .collect()
        }
        assert set(rolled) == set(exact)
        for g, est in rolled.items():
            assert _ok(est, exact[g]), (keys, g)
    conv = _est(
        distinct_rollup(docs, ["source", "lang"], "doc_id", ["source"], lgk=LGK),
        ["source"],
    )
    exact_src = {
        (r["source"],): r["ex"]
        for r in docs.groupBy("source")
        .agg(F.countDistinct("doc_id").alias("ex"))
        .collect()
    }
    for g, est in conv.items():
        assert _ok(est, exact_src[g]), g


def test_nulls_ignored_and_args_validated(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("a", "x"), ("b", None)], "g string, v string"
    )
    out = {r["g"]: r for r in hll_estimate(hll_build(df, ["g"], "v")).collect()}
    assert out["a"]["n_rows"] == 2 and out["a"]["distinct_est"] == 1
    assert out["b"]["n_rows"] == 0 and out["b"]["distinct_est"] == 0
    with pytest.raises(ValueError, match="lgk"):
        hll_build(df, ["g"], "v", lgk=3)
    with pytest.raises(ValueError, match="keys"):
        hll_build(df, "g", "v")
