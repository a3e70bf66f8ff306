"""Space-saving heavy hitters (operators/sketches.py) vs exact counts:
presence guarantee, bound validity, exact-flag truthfulness, partition
invariance, and agreement with the exact top-k on testdata tokens."""

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.operators.sketches import heavy_hitters
from exstream_implementation_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _zipfish(n_heavy=8, n_tail=3000, seed=1):
    rng = random.Random(seed)
    vals = []
    for h in range(n_heavy):
        vals += [f"heavy_{h}"] * (400 - 40 * h)
    vals += [f"tail_{rng.randrange(n_tail)}" for _ in range(4000)]
    rng.shuffle(vals)
    return vals


def _df(spark, vals, parts=16):
    return spark.createDataFrame(
        [(v,) for v in vals], "key string"
    ).repartition(parts)


def test_exact_when_under_capacity(spark):
    vals = [f"k{i % 20}" for i in range(1000)]
    out = heavy_hitters(_df(spark, vals), "key", k=20, capacity=64).collect()
    truth = Counter(vals)
    assert len(out) == 20
    for r in out:
        assert r["exact"]
        assert r["count_lo"] == r["count_hi"] == truth[r["key"]]


def test_bounds_and_presence_with_eviction(spark):
    vals = _zipfish()
    truth = Counter(vals)
    n = len(vals)
    cap = 128
    out = heavy_hitters(
        _df(spark, vals, parts=16), "key", k=64, capacity=cap
    ).collect()
    got = {r["key"]: r for r in out}
    # bounds valid for every reported key
    for key, r in got.items():
        assert r["count_lo"] <= truth[key] <= r["count_hi"], key
        if r["exact"]:
            assert r["count_lo"] == truth[key]
    # presence: every key above the n/capacity threshold is reported
    for key, c in truth.items():
        if c > n / cap:
            assert key in got, (key, c)


def test_partitioning_does_not_break_guarantees(spark):
    vals = _zipfish(seed=9)
    truth = Counter(vals)
    n = len(vals)
    for parts in (1, 7, 32):
        out = heavy_hitters(
            _df(spark, vals, parts=parts), "key", k=64, capacity=128
        ).collect()
        got = {r["key"]: r for r in out}
        for key, r in got.items():
            assert r["count_lo"] <= truth[key] <= r["count_hi"], (
                parts,
                key,
            )
        for key, c in truth.items():
            if c > n / 128:
                assert key in got, (parts, key)


def test_matches_exact_topk_on_testdata_tokens(spark):
    toks = (
        load_table(spark, SF_DIR, "documents")
        .select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
        )
        .filter(F.col("tok") != "")
    )
    exact = {
        r["tok"]: r["n"]
        for r in toks.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # 31-term vocabulary << capacity: the sketch must be exact
    out = heavy_hitters(toks, "tok", k=10).collect()
    top_exact = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["key"], r["count_hi"]) for r in out] == top_exact
    assert all(r["exact"] for r in out)


def test_bad_args(spark):
    df = _df(spark, ["a"], parts=1)
    with pytest.raises(ValueError):
        heavy_hitters(df, "key", k=0)
    with pytest.raises(ValueError):
        heavy_hitters(df, "key", k=1, capacity=0)


# --- cluster-balanced diversity sampling (operators/kmeans.py) ---------------
def test_cluster_balanced_sample_quota_and_determinism(spark):
    from pyspark.sql import functions as F

    from exstream_implementation_spark.operators.kmeans import (
        cluster_balanced_sample,
    )

    vecs = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    got = cluster_balanced_sample(vecs, n_cells=6, per_cell=10)
    rows = got.collect()
    # output rows come from the input, keep their embedding, carry a cell
    ids = {r["vec_id"] for r in rows}
    assert ids <= {r["vec_id"] for r in vecs.select("vec_id").collect()}
    # quota: never more than per_cell from any cell, and a cell smaller
    # than the quota contributes all its members
    per = (
        got.groupBy("cell").agg(F.count("*").alias("c")).collect()
    )
    assert all(r["c"] <= 10 for r in per)
    assert len(rows) == sum(r["c"] for r in per)
    # deterministic across re-runs and partitionings
    again = {
        r["vec_id"]
        for r in cluster_balanced_sample(
            vecs.repartition(7), n_cells=6, per_cell=10
        ).collect()
    }
    assert ids == again
    # a different salt draws a different sample from the SAME clusters
    other = {
        r["vec_id"]
        for r in cluster_balanced_sample(
            vecs, n_cells=6, per_cell=10, salt=3
        ).collect()
    }
    assert ids != other
    import pytest

    with pytest.raises(ValueError, match="per_cell"):
        cluster_balanced_sample(vecs, n_cells=4, per_cell=0)
