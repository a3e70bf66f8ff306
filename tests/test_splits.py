"""Leakage-safe splits (plans/splits.py): proportions, determinism,
partition/append invariance, md5-python mirror, group co-assignment via
near-dup components, leakage report, and arg validation."""

import hashlib

import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.plans.splits import (
    assign_splits,
    leakage_report,
    split_by_neardup_groups,
    split_oracle_case,
)
from exstream_implementation_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"
W = {"train": 0.8, "val": 0.1, "test": 0.1}


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "source")


def test_proportions_and_totals(spark):
    out = assign_splits(_docs(spark), W, unit_col="doc_id")
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert n == _docs(spark).count()
    assert counts["train"] / n == pytest.approx(0.8, abs=0.06)
    assert counts["val"] / n == pytest.approx(0.1, abs=0.05)
    assert counts["test"] / n == pytest.approx(0.1, abs=0.05)


def test_deterministic_partition_and_append_invariant(spark):
    docs = _docs(spark)
    a = {r["doc_id"]: r["split"]
         for r in assign_splits(docs.repartition(1), W).collect()}
    b = {r["doc_id"]: r["split"]
         for r in assign_splits(docs.repartition(13), W).collect()}
    assert a == b
    # appending new rows never reassigns old ones (pure projection of key)
    half = docs.filter(F.col("doc_id") < 250)
    c = {r["doc_id"]: r["split"] for r in assign_splits(half, W).collect()}
    assert c == {k: v for k, v in a.items() if k < 250}
    # a different salt draws an independent assignment
    d = {r["doc_id"]: r["split"]
         for r in assign_splits(docs, W, salt=9).collect()}
    assert d != a


def test_md5_flavor_matches_python_mirror(spark):
    """The oracle-portable flavor is reproducible from pure python —
    the same guarantee the DuckDB CASE (split_oracle_case) relies on."""
    out = assign_splits(_docs(spark), W, unit_col="doc_id", salt=1,
                        method="md5").collect()
    cut_train = format(int(0.8 * 16**6), "06x")
    cut_val = format(int(0.9 * 16**6), "06x")
    for r in out:
        h = hashlib.md5(f"{r['doc_id']}:1".encode()).hexdigest()[:6]
        want = ("train" if h < cut_train
                else "val" if h < cut_val else "test")
        assert r["split"] == want
    case = split_oracle_case(W, "d.doc_id", salt=1)
    assert f"< '{cut_train}' THEN 'train'" in case
    assert case.endswith("ELSE 'test' END")


def test_group_split_never_leaks(spark):
    docs = _docs(spark)
    # plant chains: (0,1),(1,2) one cluster; (10,11) another; rest singleton
    pairs = docs.sparkSession.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (400, 401)],
        "doc_id_a long, doc_id_b long",
    )
    for salt in (0, 1, 2, 3):
        out = split_by_neardup_groups(docs, pairs, W, salt=salt).persist()
        assert leakage_report(out, "__group").count() == 0
        by_id = {r["doc_id"]: r["split"] for r in out.collect()}
        assert by_id[0] == by_id[1] == by_id[2]
        assert by_id[10] == by_id[11]
        assert by_id[400] == by_id[401]
        out.unpersist()
    # the row-wise split DOES tear at least one planted cluster across
    # salts — the failure mode the group split exists to prevent
    torn = 0
    for salt in range(6):
        by_id = {r["doc_id"]: r["split"]
                 for r in assign_splits(docs, W, salt=salt).collect()}
        torn += any(by_id[a] != by_id[b] for a, b in [(0, 1), (1, 2), (10, 11), (400, 401)])
    assert torn > 0


def test_singleton_groups_distinct_from_components(spark):
    docs = _docs(spark)
    pairs = docs.sparkSession.createDataFrame(
        [(0, 1)], "doc_id_a long, doc_id_b long"
    )
    out = split_by_neardup_groups(docs, pairs, W)
    groups = {r["doc_id"]: r["__group"] for r in out.collect()}
    assert groups[0] == groups[1] == "c:0"
    assert groups[2] == "d:2"  # singleton id-keyed, prefix-separated
    assert out.count() == docs.count()


def test_weights_validation(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="non-empty"):
        assign_splits(docs, {})
    with pytest.raises(ValueError, match=">= 0"):
        assign_splits(docs, {"a": -1.0, "b": 2.0})
    with pytest.raises(ValueError, match="method"):
        assign_splits(docs, W, method="sha9")
    # unnormalized weights normalize
    out = assign_splits(docs, {"a": 8.0, "b": 2.0})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert counts["a"] / n == pytest.approx(0.8, abs=0.06)