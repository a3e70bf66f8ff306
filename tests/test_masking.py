"""Deterministic MLM masking (plans/masking.py): python-mirror parity,
rate calibration, epoch independence via salt, column self-consistency,
JVM-only plan, and degenerate arrays."""

import hashlib

import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.plans.masking import mask_tokens
from exstream_implementation_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _tokenized(spark, n=120):
    return (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") < n)
        .select(
            "doc_id", F.split(F.lower("text"), r"\s+").alias("tokens")
        )
    )


def _mirror(doc_id, i, salt, rate):
    h = hashlib.md5(f"{doc_id}:{i}:{salt}".encode()).hexdigest()[:6]
    return int(h, 16) < int(rate * 16**6)


def test_matches_python_mirror_and_self_consistent(spark):
    out = mask_tokens(_tokenized(spark), rate=0.15, salt=3).collect()
    assert out
    for r in out:
        want_pos = [
            i for i in range(len(r["tokens"]))
            if _mirror(r["doc_id"], i, 3, 0.15)
        ]
        assert list(r["mask_positions"]) == want_pos
        for i, (orig, got) in enumerate(zip(r["tokens"], r["tokens_masked"])):
            if i in want_pos:
                assert got == "<mask>"
            else:
                assert got == orig


def test_rate_calibration_and_salt_independence(spark):
    toks = _tokenized(spark, n=300)
    out = mask_tokens(toks, rate=0.15, salt=0)
    stats = out.select(
        F.sum(F.size("mask_positions")).alias("m"),
        F.sum(F.size("tokens")).alias("n"),
    ).first()
    assert stats["m"] / stats["n"] == pytest.approx(0.15, abs=0.02)
    # two salts mask different position sets (epoch variety)
    a = {(r["doc_id"], tuple(r["mask_positions"]))
         for r in mask_tokens(toks, salt=1).collect()}
    b = {(r["doc_id"], tuple(r["mask_positions"]))
         for r in mask_tokens(toks, salt=2).collect()}
    assert a != b
    # same salt: partitioning-independent
    c = {(r["doc_id"], tuple(r["mask_positions"]))
         for r in mask_tokens(toks.repartition(17), salt=1).collect()}
    assert a == c


def test_plan_is_jvm_only(spark):
    out = mask_tokens(_tokenized(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_degenerate_arrays_and_validation(spark):
    df = spark.createDataFrame(
        [(1, []), (2, None), (3, ["one"])],
        "doc_id long, tokens array<string>",
    )
    rows = {r["doc_id"]: r for r in mask_tokens(df, rate=1.0).collect()}
    assert list(rows[1]["tokens_masked"]) == []
    assert list(rows[1]["mask_positions"]) == []
    assert rows[2]["tokens_masked"] is None
    assert rows[2]["mask_positions"] is None
    assert list(rows[3]["tokens_masked"]) == ["<mask>"]  # rate 1 masks all
    assert list(rows[3]["mask_positions"]) == [0]
    with pytest.raises(ValueError, match="rate"):
        mask_tokens(df, rate=1.5)

def test_mask_token_with_backslash_and_quote(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"])], "doc_id long, tokens array<string>"
    )
    for tok in ("\\m", "it's", "a\\'x"):
        out = mask_tokens(df, rate=1.0, mask_token=tok).collect()[0]
        assert list(out["tokens_masked"]) == [tok, tok]
