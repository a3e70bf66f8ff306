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
