"""Epoch expansion (plans/dedup.expand_epochs): integral factors are
exact, fractional factors are deterministic hash-Bernoulli within the
binomial envelope, partitioning doesn't change the realized set, salts
draw independent extras, sub-1 factors behave like sampling, split
assignment from the original id keeps every copy in one split, and
unlisted sources drop."""

import math

import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.plans.dedup import (
    expand_epochs,
    sample_mix,
    temperature_mix_policy,
)
from exstream_implementation_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_integral_factors_exact(spark):
    docs = _docs(spark)
    out = expand_epochs(docs, {"src0": 2.0, "src1": 3.0}, salt=7)
    per = {
        (r["source"], r["epoch"]): r["c"]
        for r in out.groupBy("source", "epoch").agg(F.count("*").alias("c")).collect()
    }
    n0 = docs.filter(F.col("source") == "src0").count()
    n1 = docs.filter(F.col("source") == "src1").count()
    assert per == {
        ("src0", 0): n0, ("src0", 1): n0,
        ("src1", 0): n1, ("src1", 1): n1, ("src1", 2): n1,
    }
    # unique row key is (doc_id, epoch)
    assert out.select("doc_id", "epoch").distinct().count() == out.count()


def test_fractional_factor_envelope_and_determinism(spark):
    docs = _docs(spark)
    e = {"src2": 2.4}
    out = expand_epochs(docs, e, salt=3)
    n = docs.filter(F.col("source") == "src2").count()
    extra = out.count() - 2 * n
    # binomial(n, 0.4) at 5 sigma
    sd = math.sqrt(n * 0.4 * 0.6)
    assert abs(extra - 0.4 * n) <= 5 * sd
    # deterministic: identical realized (doc_id, epoch) set on a relayout
    a = sorted((r["doc_id"], r["epoch"]) for r in out.collect())
    b = sorted(
        (r["doc_id"], r["epoch"])
        for r in expand_epochs(docs.repartition(13), e, salt=3).collect()
    )
    assert a == b
    # a different salt draws a different extra-copy set
    c = sorted(
        (r["doc_id"], r["epoch"])
        for r in expand_epochs(docs, e, salt=4).collect()
    )
    assert a != c


def test_sub_one_factor_is_sampling(spark):
    docs = _docs(spark)
    out = expand_epochs(docs, {"src3": 0.5}, salt=11)
    kept = {r["doc_id"] for r in out.collect()}
    # identical selector as sample_mix (same hash, same salt)
    want = {
        r["doc_id"]
        for r in sample_mix(docs, {"src3": 0.5}, salt=11).collect()
    }
    assert kept == want
    assert out.agg(F.max("epoch")).collect()[0][0] == 0


def test_split_from_original_id_has_no_leakage(spark):
    from exstream_implementation_spark.plans.splits import assign_splits

    docs = _docs(spark)
    expanded = expand_epochs(docs, {"src0": 3.0, "src1": 2.5}, salt=1)
    tagged = assign_splits(
        expanded, {"train": 0.8, "val": 0.2}, unit_col="doc_id", salt=0
    )
    # every epoch copy of a doc carries the same split
    assert (
        tagged.groupBy("doc_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
        == 0
    )


def test_policy_composition_and_validation(spark):
    docs = _docs(spark)
    policy = temperature_mix_policy(docs, 0.3, 2000)
    # τ<1 upsamples rare sources: at least one epoch factor exceeds 1
    assert any(e > 1.0 for e in policy["epochs"].values())
    out = expand_epochs(
        sample_mix(docs, policy["fractions"], salt=5),
        policy["epochs"],
        salt=6,
    )
    # expected volume ≈ sum over sources of n_s * f_s * e_s
    want = sum(
        policy["sizes"][s] * policy["fractions"][s] * policy["epochs"][s]
        for s in policy["sizes"]
    )
    got = out.count()
    assert abs(got - want) <= 6 * math.sqrt(want)
    # unlisted sources drop
    assert expand_epochs(docs, {"src0": 1.0}).select("source").distinct().count() == 1
    with pytest.raises(ValueError, match=">= 0"):
        expand_epochs(docs, {"src0": -0.1})
