"""Data-quality verification (operators/expectations.py): each check kind
against planted violations, the one-aggregation-pass compilation, and
gating on real testdata tables."""

import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.operators.expectations import (
    in_range,
    matches,
    not_null,
    referential,
    row_count,
    satisfies,
    unique,
    values_in,
    verify,
)
from exstream_implementation_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "en", 10, "s1"),
            (2, "fr", 20, "s1"),
            (2, "de", 30, "s2"),   # duplicate id
            (4, None, -5, "s9"),   # null lang, negative count, orphan src
            (5, "xx", 250, "s2"),  # lang outside set, count over hi
        ],
        "id long, lang string, n int, src string",
    )


def _sources(spark):
    return spark.createDataFrame([("s1",), ("s2,",)], "sid string").union(
        spark.createDataFrame([("s2",)], "sid string")
    )


def test_each_kind_detects_planted_violations(spark):
    rep = {
        r["check"]: r
        for r in verify(
            _df(spark),
            [
                not_null("lang"),
                not_null("id"),
                unique("id"),
                unique("id", "lang"),
                in_range("n", lo=0, hi=100),
                values_in("lang", ["en", "fr", "de"]),
                matches("lang", r"[a-z]{2}", min_frac=1.0),
                satisfies("n >= 10", min_frac=0.9),
                row_count(min_rows=1, max_rows=10),
                referential("src", _sources(spark), "sid"),
            ],
        ).collect()
    }
    assert not rep["not_null(lang)"]["ok"]
    assert rep["not_null(id)"]["ok"]
    assert not rep["unique(id)"]["ok"]
    assert rep["unique(id)"]["observed"] == "duplicate_rows=1"
    assert rep["unique(id, lang)"]["ok"]
    assert not rep["in_range(n)"]["ok"]
    assert rep["in_range(n)"]["observed"] == "out_of_range=2"
    assert not rep["values_in(lang)"]["ok"]
    assert rep["matches(lang)"]["ok"]  # 'xx' matches [a-z]{2}; null skipped
    assert not rep["satisfies(n >= 10)"]["ok"]  # 4/5 = 0.8 < 0.9
    assert rep["row_count"]["ok"]
    assert not rep["referential(src)"]["ok"]
    assert rep["referential(src)"]["observed"] == "orphans=1"


def test_satisfies_fraction_boundary(spark):
    df = _df(spark)
    rep = verify(df, [satisfies("n > 0", min_frac=0.8)]).first()
    assert rep["ok"]  # exactly 4/5
    rep = verify(df, [satisfies("n > 0", min_frac=0.81)]).first()
    assert not rep["ok"]


def test_single_scan_compilation(spark):
    # every scan-expressible check folds into ONE aggregation over ONE
    # scan of the input — seven checks, one "Scan parquet" in the plan
    from exstream_implementation_spark.operators.expectations import (
        compile_scan_checks,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    agg_df, posts = compile_scan_checks(
        docs,
        [
            not_null("text"),
            unique("doc_id"),
            in_range("doc_id", lo=0),
            values_in("doc_id", [1, 2]),
            matches("text", ".*"),
            satisfies("length(text) >= 0"),
            row_count(min_rows=0),
        ],
    )
    plan = agg_df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    assert len(posts) == 7 and agg_df.count() == 1


def test_empty_frame_semantics(spark):
    df = spark.createDataFrame([], "id long, lang string")
    rep = {
        r["check"]: r
        for r in verify(
            df,
            [
                not_null("lang"),
                unique("id"),
                row_count(min_rows=1),
            ],
        ).collect()
    }
    assert rep["not_null(lang)"]["ok"]  # vacuously
    assert rep["unique(id)"]["ok"]
    assert not rep["row_count"]["ok"]


def test_on_testdata_contract(spark):
    docs = load_table(spark, SF_DIR, "documents")
    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer")
    rep = verify(
        docs.select("doc_id", "text"),
        [not_null("doc_id"), unique("doc_id"), not_null("text")],
    )
    assert all(r["ok"] for r in rep.collect())
    ref = verify(
        orders, [referential("o_custkey", cust, "c_custkey")]
    ).first()
    assert ref["ok"]


def test_bad_inputs(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        verify(df, [])
    with pytest.raises(ValueError):
        in_range("n")


def test_row_violations_name_every_failed_check(spark):
    from exstream_implementation_spark.operators.expectations import (
        in_range,
        matches,
        not_null,
        quarantine,
        row_violations,
        satisfies,
        unique,
        values_in,
    )

    df = spark.createDataFrame(
        [
            (1, "en", 50),      # clean
            (None, "en", 50),   # null id
            (2, "EN", 50),      # regex fail
            (3, "xx", -1),      # values_in fail + range fail + satisfies
            (4, None, 50),      # null lang is NOT a matches violation
        ],
        "doc_id long, lang string, n long",
    )
    checks = [
        not_null("doc_id"),
        matches("lang", r"[a-z]{2}"),
        values_in("lang", ["en", "de", "xx"]),
        in_range("n", lo=0, hi=100),
        satisfies("n >= 10"),
    ]
    got = {
        r["doc_id"]: sorted(r["violations"])
        for r in row_violations(df, checks).collect()
    }
    assert got[1] == []
    assert got[None] == ["not_null(doc_id)"]
    assert got[2] == ["matches(lang)", "values_in(lang)"]
    assert got[3] == ["in_range(n)", "satisfies(n >= 10)"]
    assert got[4] == []

    clean, bad = quarantine(df, checks)
    assert clean.columns == df.columns
    assert {r["doc_id"] for r in clean.collect()} == {1, 4}
    assert clean.count() + bad.count() == df.count()
    # dataset-level checks cannot route rows
    import pytest as _pytest

    with _pytest.raises(ValueError, match="dataset-level"):
        row_violations(df, [unique("doc_id")])


def test_row_violations_refuses_column_collision(spark):
    from exstream_implementation_spark.operators.expectations import (
        not_null,
        row_violations,
    )

    df = spark.createDataFrame(
        [(1, ["old"])], "doc_id long, violations array<string>"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="already has"):
        row_violations(df, [not_null("doc_id")])
