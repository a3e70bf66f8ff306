"""Distributed Bloom filters (operators/bloom.py): zero false negatives
ever, measured false-positive rate near the configured fpp, bitmaps
bit-identical across input partitionings and rebuilds, null semantics
pinned, and the decontamination Bloom prefilter producing EXACTLY the
exact-path output (false positives are removed by the verify join)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.operators.bloom import (
    CHUNK_BITS,
    bloom_chunks,
    bloom_params,
    build_bloom,
    might_contain,
)
from exstream_implementation_spark.plans.dedup import decontaminate
from exstream_implementation_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _members(spark, n=3000):
    return spark.range(n).select(
        F.concat(F.lit("member-"), F.col("id")).alias("v")
    )


def test_params_textbook_sizing():
    m, k = bloom_params(100_000, 0.01)
    # -n ln p / ln2^2 = 958506 bits, rounded up to whole 64 KiB chunks
    assert m == ((958506 + CHUNK_BITS - 1) // CHUNK_BITS) * CHUNK_BITS
    assert k == 7  # ln(1/0.01)/ln2 rounded — derived from UN-rounded m
    # tiny n: chunk rounding oversizes m enormously; k must stay clamped
    # (an unclamped (m/n) ln 2 here would be ~180k hash expressions)
    _, k_tiny = bloom_params(2, 0.05)
    assert 1 <= k_tiny <= 30
    with pytest.raises(ValueError, match="fpp"):
        bloom_params(10, 1.5)
    with pytest.raises(ValueError, match="n_items"):
        bloom_params(0, 0.01)


def test_params_cost_balanced_sizing():
    """cost_balanced trades <=15% bits for the smallest viable k — build
    and probe work scale with k·n positions, not bits (the r12 init-
    surcharge lever).  The target fpp must still hold ANALYTICALLY at
    capacity for the chosen (m, k)."""
    import math

    for n, fpp in [
        (100_000, 0.01), (100_000, 0.001), (3_000_000, 0.01),
        (100_000, 0.05), (50, 0.01),
    ]:
        m_opt, k_opt = bloom_params(n, fpp)
        m_bal, k_bal = bloom_params(n, fpp, cost_balanced=True)
        assert k_bal <= k_opt
        m_exact = -n * math.log(fpp) / (math.log(2) ** 2)
        assert m_bal <= 1.15 * m_exact + CHUNK_BITS  # bits premium capped
        # realized rate at FULL capacity meets the target
        fill = 1.0 - math.exp(-k_bal * n / m_bal)
        assert fill**k_bal <= fpp * 1.0001
    # the sidecar's operating point: 1% fpp -> k drops 7 -> 4 (-43%
    # positions) for +~10% bits
    _, k4 = bloom_params(1_000_000, 0.01, cost_balanced=True)
    assert k4 == 4
    # where k is already minimal, cost_balanced is a no-op
    assert bloom_params(1000, 0.5) == bloom_params(
        1000, 0.5, cost_balanced=True
    )


def test_cost_balanced_filter_fpp_envelope(spark):
    """Empirical twin of the analytic check: a cost-balanced filter AT
    CAPACITY still realizes ~the configured rate (zero false negatives
    as ever)."""
    n = 3000
    m, k = bloom_params(n, 0.01, cost_balanced=True)
    flt = build_bloom(_members(spark, n), "v", m_bits=m, k_hashes=k)
    got = might_contain(_members(spark, n), "v", flt).collect()
    assert all(r["might_contain"] for r in got)
    others = spark.range(20_000).select(
        F.concat(F.lit("absent-"), F.col("id")).alias("v")
    )
    fp = might_contain(others, "v", flt).filter("might_contain").count()
    assert fp / 20_000 <= 0.02, fp


def test_no_false_negatives_and_fpp_envelope(spark):
    n = 3000
    flt = build_bloom(_members(spark, n), "v", n_items=n, fpp=0.01)
    got = might_contain(_members(spark, n), "v", flt).collect()
    assert all(r["might_contain"] for r in got)  # never a false negative
    others = spark.range(20_000).select(
        F.concat(F.lit("absent-"), F.col("id")).alias("v")
    )
    fp = (
        might_contain(others, "v", flt)
        .filter("might_contain")
        .count()
    )
    # the chunk rounding oversizes m, so the realized rate sits BELOW the
    # configured 1%; 2x margin keeps the assertion deterministic-safe
    assert fp / 20_000 <= 0.02, fp


def test_bitmap_invariant_to_partitioning_and_rebuilds(spark):
    n = 2000
    kwargs = dict(n_items=n, fpp=0.05)
    a = build_bloom(_members(spark, n).repartition(1), "v", **kwargs)
    b = build_bloom(_members(spark, n).repartition(16), "v", **kwargs)
    c = build_bloom(_members(spark, n), "v", **kwargs)
    assert np.array_equal(a.bits, b.bits)
    assert np.array_equal(a.bits, c.bits)
    assert 0.0 < a.fill_ratio() < 1.0


def test_incremental_chunk_union_equals_full_build(spark):
    """The persisted-chunk-table pattern: yesterday's chunks unioned with
    today's chunks, OR-merged, equals a from-scratch build over the union
    of the data."""
    m, k = bloom_params(2000, 0.05)
    day1 = _members(spark, 1000)
    day2 = spark.range(1000, 2000).select(
        F.concat(F.lit("member-"), F.col("id")).alias("v")
    )
    merged_chunks = bloom_chunks(day1, "v", m, k, 42).unionByName(
        bloom_chunks(day2, "v", m, k, 42)
    )
    from exstream_implementation_spark.operators.bloom import _CHUNK_BYTES

    bitmap = np.zeros(m // 8, dtype=np.uint8)
    # re-merge the unioned chunk tables exactly as build_bloom would
    for row in (
        merged_chunks.groupBy("chunk_id")
        .agg(F.collect_list("bits").alias("bs"))
        .collect()
    ):
        start = row["chunk_id"] * _CHUNK_BYTES
        for b in row["bs"]:
            bitmap[start : start + _CHUNK_BYTES] |= np.frombuffer(
                b, dtype=np.uint8
            )
    full = build_bloom(_members(spark, 2000), "v", n_items=2000, fpp=0.05)
    assert np.array_equal(bitmap, full.bits)


def test_null_semantics(spark):
    df = spark.createDataFrame([("a",), (None,), ("b",)], "v string")
    flt = build_bloom(df, "v", n_items=2, fpp=0.05)
    got = {
        r["v"]: r["might_contain"]
        for r in might_contain(df, "v", flt).collect()
    }
    assert got["a"] and got["b"]
    assert got[None] is False  # nulls are never members


def test_argument_validation(spark):
    df = _members(spark, 10)
    with pytest.raises(ValueError, match="n_items .*or m_bits"):
        build_bloom(df, "v")
    with pytest.raises(ValueError, match="k_hashes"):
        build_bloom(df, "v", m_bits=CHUNK_BITS)
    with pytest.raises(ValueError, match="multiple"):
        bloom_chunks(df, "v", CHUNK_BITS + 1, 3, 42)


def test_decontaminate_bloom_prefilter_is_exact(spark):
    """The Bloom arm changes the PLAN (map-side gram prefilter before the
    join), never the ANSWER: row-for-row identical to the exact path."""
    docs = load_table(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("text")
    exact = decontaminate(
        spark, SF_DIR, benchmark=bench, max_overlap=0.1
    )
    bloomed = decontaminate(
        spark, SF_DIR, benchmark=bench, max_overlap=0.1, bloom_fpp=0.01
    )
    key = lambda r: r["doc_id"]
    assert sorted(exact.collect(), key=key) == sorted(
        bloomed.collect(), key=key
    )


def test_cross_width_numeric_probe_has_no_false_negatives(spark):
    """xxhash64 hashes int and bigint differently; the canonical
    cast-to-string in _positions makes build/probe agree across numeric
    widths — without it every member would probe as definitely-absent."""
    ints = spark.range(500).select(F.col("id").cast("int").alias("v"))
    flt = build_bloom(ints, "v", n_items=500, fpp=0.01)
    longs = spark.range(500).select(F.col("id").alias("v"))  # bigint
    misses = (
        might_contain(longs, "v", flt)
        .filter(~F.col("might_contain"))
        .count()
    )
    assert misses == 0
    # repeated probes reuse ONE broadcast of the bitmap
    assert flt.broadcast(spark.sparkContext) is flt.broadcast(
        spark.sparkContext
    )


def test_by_chunk_build_plan_is_byte_identical(spark):
    """bloom_chunks' two physical plans (per-partition partials + merge
    vs positions hash-partitioned by chunk_id) must produce the identical
    chunk table — OR is commutative, so the only thing that may differ is
    the execution shape."""
    import numpy as np

    from exstream_implementation_spark.operators.bloom import (
        CHUNK_BITS,
        bloom_chunks,
    )

    df = spark.range(20_000).selectExpr("concat('k', id) AS k").repartition(7)
    m_bits = 8 * CHUNK_BITS
    out = {}
    for by_chunk in (False, True):
        rows = bloom_chunks(
            df, "k", m_bits, 5, 42, by_chunk=by_chunk
        ).collect()
        out[by_chunk] = {
            int(r["chunk_id"]): bytes(r["bits"]) for r in rows
        }
    assert out[False] == out[True]
    assert out[True]  # non-empty
    # and the bitmap really carries ~n*k set bits (collisions aside)
    total = sum(
        int(np.unpackbits(np.frombuffer(b, dtype=np.uint8)).sum())
        for b in out[True].values()
    )
    assert 0.8 * 20_000 * 5 < total <= 20_000 * 5
