"""Hypothesis property tests for the deterministic curation primitives:
assign_splits (total coverage + python-mirror parity over random weights)
and mask_tokens (python-mirror parity over adversarial token arrays).
Few examples per property — each example runs Spark jobs."""

import hashlib

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from exstream_implementation_spark.plans.masking import mask_tokens
from exstream_implementation_spark.plans.splits import assign_splits

_weights = st.dictionaries(
    keys=st.sampled_from(["train", "val", "test", "hold"]),
    values=st.floats(min_value=0.01, max_value=10.0, allow_nan=False),
    min_size=1,
    max_size=4,
)


@given(weights=_weights, salt=st.integers(min_value=0, max_value=50))
@settings(max_examples=8, deadline=None)
def test_split_total_coverage_and_mirror(spark, weights, salt):
    """Every row gets exactly one split from the weight keys, and the md5
    flavor matches an independent python computation of the same cutoffs."""
    df = spark.range(0, 120).withColumnRenamed("id", "doc_id")
    out = assign_splits(df, weights, unit_col="doc_id", salt=salt,
                        method="md5").collect()
    assert len(out) == 120
    total = sum(weights.values())
    names = list(weights)
    cuts = []
    acc = 0.0
    for nm in names:
        acc += weights[nm] / total
        cuts.append((nm, acc))
    cuts[-1] = (cuts[-1][0], 1.0)
    for r in out:
        h = hashlib.md5(f"{r['doc_id']}:{salt}".encode()).hexdigest()[:6]
        v = int(h, 16)
        want = next(
            nm for nm, hi in cuts
            if hi >= 1.0 or v < int(hi * 16**6)
        )
        assert r["split"] == want
        assert r["split"] in weights


_tokens = st.lists(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_characters="\x00"
        ),
        min_size=0,
        max_size=6,
    ),
    min_size=0,
    max_size=12,
)


@given(
    toks=st.lists(_tokens, min_size=1, max_size=5),
    rate=st.sampled_from([0.0, 0.15, 0.5, 1.0]),
    salt=st.integers(min_value=0, max_value=9),
)
@settings(max_examples=8, deadline=None)
def test_mask_mirror_on_adversarial_arrays(spark, toks, rate, salt):
    """Quotes, unicode, empty strings, empty arrays: the JVM decision and
    the python mirror agree position-by-position."""
    rows = [(i, t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    got = {r["doc_id"]: r for r in
           mask_tokens(df, rate=rate, salt=salt).collect()}
    cutoff = int(rate * 16**6)
    for i, t in rows:
        want_pos = [
            j for j in range(len(t))
            if int(hashlib.md5(f"{i}:{j}:{salt}".encode()).hexdigest()[:6],
                   16) < cutoff
        ]
        assert list(got[i]["mask_positions"]) == want_pos
        for j, (orig, m) in enumerate(zip(t, got[i]["tokens_masked"])):
            assert m == ("<mask>" if j in want_pos else orig)