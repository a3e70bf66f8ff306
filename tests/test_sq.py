"""Scalar int8 quantization (operators/sq.py): reconstruction error
within half a level per dimension, edge clamping, constant dimensions,
tinyint storage, and recall@5 vs the exact dense ranking on testdata."""

import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.operators.sq import (
    sq_decode,
    sq_encode,
    sq_topk,
    train_sq,
)
from exstream_implementation_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    embs = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    params = train_sq(embs)
    return embs, params


def test_reconstruction_error_within_half_level(spark, corpus):
    embs, params = corpus
    enc = sq_encode(embs, params)
    dec = sq_decode(enc, params, out_col="rec")
    worst = (
        dec.select(
            F.aggregate(
                F.zip_with(
                    "embedding",
                    "rec",
                    lambda a, b: F.abs(a.cast("double") - b.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, e: F.greatest(acc, e),
            ).alias("err"),
            F.lit(0).alias("g"),
        )
        .groupBy("g")
        .agg(F.max("err").alias("worst"))
        .collect()[0]["worst"]
    )
    span = max(
        hi - lo for lo, hi in zip(params["mins"], params["maxs"])
    )
    assert worst <= span / 255 / 2 + 1e-5


def test_codes_are_tinyint_and_clamped(spark, corpus):
    embs, params = corpus
    enc = sq_encode(embs, params)
    assert dict(enc.dtypes)["sq_code"] == "array<tinyint>"
    stats = enc.select(
        F.aggregate(
            "sq_code", F.lit(127), lambda acc, c: F.least(acc, c.cast("int"))
        ).alias("lo"),
        F.aggregate(
            "sq_code", F.lit(-128), lambda acc, c: F.greatest(acc, c.cast("int"))
        ).alias("hi"),
    ).agg(F.min("lo"), F.max("hi")).collect()[0]
    assert stats[0] >= -128 and stats[1] <= 127
    # out-of-range vectors clamp to edge levels instead of wrapping
    far = spark.createDataFrame(
        [(0, [1e6] * params["dim"]), (1, [-1e6] * params["dim"])],
        "vec_id long, embedding array<float>",
    )
    codes = {r["vec_id"]: r["sq_code"] for r in sq_encode(far, params).collect()}
    assert set(codes[0]) == {127} and set(codes[1]) == {-128}


def test_constant_dimension_roundtrips_to_its_value(spark):
    df = spark.createDataFrame(
        [(0, [1.5, 2.0]), (1, [1.5, 4.0])], "vec_id long, embedding array<float>"
    )
    params = train_sq(df)
    rec = sq_decode(sq_encode(df, params), params, out_col="rec").collect()
    for r in rec:
        assert r["rec"][0] == pytest.approx(1.5, abs=1e-6)


def test_recall_at_5_vs_exact(spark, corpus):
    from exstream_implementation_spark.plans.search import dense_topk

    embs, params = corpus
    enc = sq_encode(embs, params).select("vec_id", "sq_code")
    qs = spark.createDataFrame(
        [
            (i, list(r["embedding"]))
            for i, r in enumerate(embs.limit(20).collect())
        ],
        "query_id int, qvec array<float>",
    )
    exact = dense_topk(spark, embs, qs, k=5)
    approx = sq_topk(spark, enc, qs, params, k=5)
    e = {(r["query_id"], r["doc_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["doc_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, recall


def test_ragged_vectors_rejected(spark):
    ragged = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="ragged"):
        train_sq(ragged)
