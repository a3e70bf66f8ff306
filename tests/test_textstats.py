"""Compression-ratio scoring + quantile length-bucketing
(operators/textstats.py): python-mirror exactness, the repetition-order
property, bucket balance and monotonicity, skew collapse, and nulls."""

import zlib

import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.operators.textstats import (
    compression_ratio,
    length_buckets,
)
from exstream_implementation_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_compression_ratio_exact_and_ordered(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    got = {r["doc_id"]: r["compress_ratio"]
           for r in compression_ratio(docs).collect()}
    for r in docs.collect():
        raw = r["text"].encode("utf-8")
        want = len(zlib.compress(raw, 6)) / len(raw)
        assert got[r["doc_id"]] == pytest.approx(want, rel=1e-12)
    # the use-case property: heavy repetition compresses far below prose
    probe = spark.createDataFrame(
        [
            (1, "spam " * 200),
            (2, "the quiet river turned east beneath granite cliffs while "
                "herons traced slow arcs over water nobody had named yet "
                "and the ferryman counted clouds instead of coins that day"),
        ],
        "doc_id long, text string",
    )
    p = {r["doc_id"]: r["compress_ratio"]
         for r in compression_ratio(probe).collect()}
    assert p[1] < 0.5 * p[2]


def test_compression_ratio_nulls_and_schema(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "abc")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert rows[1]["compress_ratio"] is None
    assert rows[2]["compress_ratio"] is None
    assert rows[3]["compress_ratio"] > 0
    out = compression_ratio(df)
    assert out.columns == ["doc_id", "text", "compress_ratio"]


def test_length_buckets_balanced_and_monotone(spark):
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 977).alias("n_toks")
    )
    out = length_buckets(df, "n_toks", n_buckets=4)
    rows = out.collect()
    counts = {}
    for r in rows:
        counts[r["length_bucket"]] = counts.get(r["length_bucket"], 0) + 1
    assert set(counts) == {0, 1, 2, 3}
    for c in counts.values():
        assert c == pytest.approx(250, abs=40)
    # monotone: longer value never lands in a lower bucket
    by_len = sorted(rows, key=lambda r: r["n_toks"])
    buckets = [r["length_bucket"] for r in by_len]
    assert buckets == sorted(buckets)


def test_length_buckets_skew_collapse_and_nulls(spark):
    # 95% identical lengths: duplicate quantile edges collapse
    rows = [(i, 7) for i in range(950)] + [(1000 + i, 100 + i) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, n_toks int")
    out = length_buckets(df, "n_toks", n_buckets=8)
    got = {r["id"]: r["length_bucket"] for r in out.collect()}
    assert all(got[i] == 0 for i in range(950))
    assert all(got[1000 + i] > 0 for i in range(50))
    dfn = spark.createDataFrame([(1, None), (2, 5)], "id long, n_toks int")
    outn = {r["id"]: r["length_bucket"]
            for r in length_buckets(dfn, "n_toks", n_buckets=2).collect()}
    assert outn[1] is None and outn[2] is not None
    with pytest.raises(ValueError, match="n_buckets"):
        length_buckets(df, "n_toks", n_buckets=1)