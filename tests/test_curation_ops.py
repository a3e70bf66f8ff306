"""Decontamination + deterministic mix sampling (training-data curation API)."""

import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.plans.dedup import decontaminate, sample_mix

SF_DIR = "/root/testdata/sf0.001"


def test_decontaminate_flags_exact_benchmark_members(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # benchmark = the full text of three corpus docs -> those docs must come
    # back 100% contaminated; unrelated docs with disjoint grams must not
    bench_ids = [r["doc_id"] for r in docs.select("doc_id").orderBy("doc_id").limit(3).collect()]
    bench = docs.filter(F.col("doc_id").isin(bench_ids)).select("text")

    out = decontaminate(spark, SF_DIR, bench).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert set(by_id) == {r["doc_id"] for r in docs.select("doc_id").collect()}
    for did in bench_ids:
        r = by_id[did]
        if r["n_grams"] > 0:
            assert r["overlap"] == 1.0 and r["contaminated"]
    # contamination is not universal (benchmark is 3 docs of a corpus)
    n_clean = sum(1 for r in out if not r["contaminated"])
    assert n_clean > 0


def test_decontaminate_threshold(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench = docs.orderBy("doc_id").limit(1).select("text")
    strict = decontaminate(spark, SF_DIR, bench, max_overlap=0.0)
    loose = decontaminate(spark, SF_DIR, bench, max_overlap=0.99)
    n_strict = strict.filter("contaminated").count()
    n_loose = loose.filter("contaminated").count()
    assert n_loose <= n_strict
    assert n_loose >= 1  # the benchmark doc itself exceeds 99% overlap


def test_sample_mix_deterministic_and_calibrated(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sources = [r["source"] for r in docs.select("source").distinct().collect()]
    assert len(sources) >= 2, "fixture needs multiple sources"
    fractions = {sources[0]: 1.0, sources[1]: 0.4}

    a = sample_mix(docs, fractions)
    b = sample_mix(docs, fractions)
    got_a = {r["doc_id"] for r in a.select("doc_id").collect()}
    got_b = {r["doc_id"] for r in b.select("doc_id").collect()}
    assert got_a == got_b  # deterministic

    # full-keep source survives completely; unlisted sources are dropped
    n_s0 = docs.filter(F.col("source") == sources[0]).count()
    assert a.filter(F.col("source") == sources[0]).count() == n_s0
    assert a.filter(~F.col("source").isin(list(fractions))).count() == 0

    # 0.4 source lands near 0.4 (hash-uniform; generous tolerance)
    n_s1 = docs.filter(F.col("source") == sources[1]).count()
    kept = a.filter(F.col("source") == sources[1]).count()
    assert 0.2 * n_s1 <= kept <= 0.6 * n_s1

    # different salt draws a different (but same-rate) sample
    c = sample_mix(docs, fractions, salt=7)
    got_c = {r["doc_id"] for r in c.select("doc_id").collect()}
    assert got_c != got_a


def test_sample_mix_rejects_bad_fraction(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with pytest.raises(ValueError):
        sample_mix(docs, {"web": 1.5})
