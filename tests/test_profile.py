"""Dataset profiler (operators/profile.py): stats vs independently
computed values, single-scan plan shape, per-column top values with no
cross-column starvation, null handling, and validation."""

import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.operators.profile import (
    profile_columns,
    profile_top_values,
)
from exstream_implementation_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_stats_match_direct_computation(spark):
    docs = load_table(spark, SF_DIR, "documents")
    prof = {r["column"]: r for r in profile_columns(docs).collect()}
    n = docs.count()
    assert set(prof) == set(docs.columns)
    for c in docs.columns:
        assert prof[c]["n"] == n
    direct = docs.agg(
        F.min("doc_id"), F.max("doc_id"),
        F.avg("n_chars"), F.stddev_pop("n_chars"), F.avg(F.length("text")),
    ).first()
    assert prof["doc_id"]["min"] == str(direct[0])
    assert prof["doc_id"]["max"] == str(direct[1])
    assert prof["n_chars"]["mean"] == pytest.approx(direct[2])
    assert prof["n_chars"]["stddev"] == pytest.approx(direct[3])
    assert prof["text"]["avg_len"] == pytest.approx(direct[4])
    assert prof["text"]["mean"] is None  # string column: no numeric slots
    # HLL estimate is near the true distinct count
    true_d = docs.select("source").distinct().count()
    assert prof["source"]["approx_distinct"] == pytest.approx(true_d, rel=0.1)
    assert prof["doc_id"]["null_frac"] == 0.0


def test_profile_is_one_scan(spark):
    """Every statistic is an aggregate expression over the same scan, so
    the whole profile fuses into ONE 'Scan parquet' (the expectations.py
    compilation property); the returned report is a driver-built literal
    frame that never touches the corpus again."""
    docs = load_table(spark, SF_DIR, "documents")
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        e
        for c in docs.columns
        for e in (
            (F.count(F.lit(1)) - F.count(c)).alias(f"nn_{c}"),
            F.approx_count_distinct(c).alias(f"ad_{c}"),
            F.min(c).cast("string").alias(f"mn_{c}"),
        )
    ]
    plan = docs.agg(*aggs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    out_plan = (
        profile_columns(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Scan parquet" not in out_plan


def test_nulls_counted(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "b")], "k long, v string"
    )
    prof = {r["column"]: r for r in profile_columns(df).collect()}
    assert prof["v"]["n_null"] == 2
    assert prof["v"]["null_frac"] == pytest.approx(0.5)
    assert prof["k"]["n_null"] == 0


def test_top_values_per_column_no_starvation(spark):
    """A 1-value heavy column must not evict another column's top-k."""
    rows = [(i, "constant", f"v{i % 4}") for i in range(400)]
    df = spark.createDataFrame(rows, "k long, heavy string, varied string")
    top = profile_top_values(df, cols=["heavy", "varied"], k=3)
    got = {}
    for r in top.collect():
        got.setdefault(r["column"], []).append(
            (r["value"], r["count_lo"], r["count_hi"], r["exact"])
        )
    assert [v for v, *_ in got["heavy"]] == ["constant"]
    assert got["heavy"][0][1] == got["heavy"][0][2] == 400
    assert len(got["varied"]) == 3
    for v, lo, hi, exact in got["varied"]:
        assert lo == hi == 100 and exact  # exact mode on small data
    # nulls skipped
    dfn = spark.createDataFrame(
        [(1, None), (2, "x"), (3, "x")], "k long, v string"
    )
    tv = profile_top_values(dfn, cols=["v"], k=2).collect()
    assert [(r["value"], r["count_hi"]) for r in tv] == [("x", 2)]


def test_top_values_on_testdata_match_exact(spark):
    docs = load_table(spark, SF_DIR, "documents")
    top = profile_top_values(docs, cols=["source", "lang"], k=3).collect()
    for col in ("source", "lang"):
        want = [
            (str(r[col]), r["n"])
            for r in docs.groupBy(col)
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc(col))
            .limit(3)
            .collect()
        ]
        mine = [
            (r["value"], r["count_hi"])
            for r in top
            if r["column"] == col
        ]
        assert mine == want


def test_validation(spark):
    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError, match="unknown columns"):
        profile_columns(docs, cols=["nope"])
    with pytest.raises(ValueError, match="no columns"):
        profile_columns(docs, cols=[])
    with pytest.raises(ValueError, match="unknown columns"):
        profile_top_values(docs, cols=["nope"])

def test_top_values_preserve_separator_chars(spark):
    """A raw value containing U+001F must surface intact, not truncated."""
    df = spark.createDataFrame(
        [(1, "a\x1fb"), (2, "a\x1fb"), (3, "a\x1fc")], "k long, v string"
    )
    got = {
        r["value"]: r["count_hi"]
        for r in profile_top_values(df, cols=["v"], k=3).collect()
    }
    assert got == {"a\x1fb": 2, "a\x1fc": 1}
    with pytest.raises(ValueError, match="U\\+001F"):
        profile_top_values(
            df.withColumnRenamed("v", "bad\x1fname"), cols=["bad\x1fname"]
        )
