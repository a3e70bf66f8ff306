"""URL curation (plans/urls.py): canonicalization against hand-written
expected forms + idempotence, eTLD+1 extraction, URL dedup semantics, and
cap_per_group vs an exact window reference with partition invariance."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from exstream_implementation_spark.plans.urls import (
    cap_per_group,
    dedup_by_url,
    normalize_urls,
    registered_domain,
    with_domain,
)
from exstream_implementation_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"

# (raw, expected canonical) — the contract, spelled out case by case
CANON = [
    # lowercase scheme+host, path case preserved
    ("HTTPS://Example.COM/Path/A", "https://example.com/Path/A"),
    # default ports stripped, non-default kept
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    # fragment dropped
    ("https://example.com/a#section-2", "https://example.com/a"),
    # tracking params removed, survivors SORTED, '?' dropped when empty
    (
        "https://example.com/a?utm_source=x&b=2&a=1&fbclid=abc",
        "https://example.com/a?a=1&b=2",
    ),
    ("https://example.com/a?utm_campaign=x&gclid=1", "https://example.com/a"),
    # a real param that merely starts like a tracker is kept
    ("https://example.com/a?utm=keep", "https://example.com/a?utm=keep"),
    # trailing slash trimmed; bare '/' collapses
    ("https://example.com/a/b/", "https://example.com/a/b"),
    ("https://example.com/", "https://example.com"),
    ("https://example.com", "https://example.com"),
    # no scheme/host anchor → NULL
    ("not a url", None),
    ("/relative/path?x=1", None),
    ("", None),
]


def test_canonical_forms(spark):
    df = spark.createDataFrame([(u,) for u, _ in CANON], "url string")
    got = [r["url_norm"] for r in normalize_urls(df).collect()]
    want = [w for _, w in CANON]
    assert got == want


def test_normalization_is_idempotent(spark):
    df = spark.createDataFrame(
        [(u,) for u, w in CANON if w is not None], "url string"
    )
    once = normalize_urls(df, "url", "n1")
    twice = normalize_urls(once, "n1", "n2")
    for r in twice.collect():
        assert r["n2"] == r["n1"], r["url"]


def test_registered_domain(spark):
    cases = [
        ("www.example.co.uk", "example.co.uk"),
        ("a.b.example.com", "example.com"),
        ("example.com", "example.com"),
        ("news.site.com.au", "site.com.au"),
        ("192.168.10.1", "192.168.10.1"),
        ("localhost", "localhost"),
        # a host that IS a two-level suffix has nothing above it
        ("co.uk", "co.uk"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = [
        r["d"]
        for r in df.select(registered_domain(F.col("host")).alias("d")).collect()
    ]
    assert got == [w for _, w in cases]


def test_with_domain_from_url(spark):
    df = normalize_urls(
        spark.createDataFrame(
            [("https://Blog.Shop.Example.co.uk:443/x?utm_source=a",)],
            "url string",
        )
    )
    assert with_domain(df).collect()[0]["domain"] == "example.co.uk"


def test_dedup_by_url(spark):
    rows = [
        (0, "https://example.com/a?utm_source=x"),
        (1, "https://EXAMPLE.com/a#frag"),        # same canonical as 0
        (2, "https://example.com/b"),
        (3, "garbage"),                            # unparseable → kept
        (4, "nonsense"),                           # unparseable → kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = sorted(r["doc_id"] for r in dedup_by_url(df).collect())
    assert kept == [0, 2, 3, 4]
    # caller's column order survives
    assert dedup_by_url(df).columns == ["doc_id", "url"]


def _exact_cap(docs, keys, n, order_col, id_col="doc_id"):
    w = Window.partitionBy(*keys).orderBy(
        F.asc(order_col or id_col), F.asc(id_col)
    )
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


@pytest.mark.parametrize("order_col", [None, "n_chars"])
def test_cap_per_group_matches_window_reference(spark, order_col):
    docs = load_table(spark, SF_DIR, "documents")
    got = cap_per_group(docs, ["source"], 7, order_col=order_col)
    want = _exact_cap(docs, ["source"], 7, order_col)
    assert got.columns == docs.columns
    assert sorted(r["doc_id"] for r in got.collect()) == sorted(
        r["doc_id"] for r in want.collect()
    )
    # partition invariance: a different layout keeps the same rows
    relaid = cap_per_group(
        docs.repartition(13), ["source"], 7, order_col=order_col
    )
    assert sorted(r["doc_id"] for r in relaid.collect()) == sorted(
        r["doc_id"] for r in got.collect()
    )


def test_cap_per_group_small_groups_and_args(spark):
    docs = load_table(spark, SF_DIR, "documents")
    total = docs.count()
    # n beyond every group size keeps everything
    assert cap_per_group(docs, ["source"], 10**6).count() == total
    with pytest.raises(ValueError, match="positive"):
        cap_per_group(docs, ["source"], 0)


def test_fragment_query_confusion(spark):
    # a '?' INSIDE an SPA-style fragment is not a query
    df = spark.createDataFrame(
        [("https://site.com/page#/route?x=1",),
         ("https://site.com/page#frag?utm_source=x&y=2",)],
        "url string",
    )
    got = [r["url_norm"] for r in normalize_urls(df).collect()]
    assert got == ["https://site.com/page", "https://site.com/page"]


def test_tracking_params_case_insensitive(spark):
    df = spark.createDataFrame(
        [("https://a.com/p?UTM_SOURCE=mail",),
         ("https://a.com/p?Fbclid=y&keep=1",)],
        "url string",
    )
    got = [r["url_norm"] for r in normalize_urls(df).collect()]
    assert got == ["https://a.com/p", "https://a.com/p?keep=1"]


def test_cap_per_group_null_group_is_capped_not_dropped(spark):
    rows = [(i, None if i < 5 else "s", i) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, v long")
    kept = sorted(
        r["doc_id"] for r in cap_per_group(df, ["source"], 3).collect()
    )
    # NULL is a group of its own: 3 smallest of each group survive
    assert kept == [0, 1, 2, 5, 6, 7]


def test_dedup_by_url_null_id_passes_through(spark):
    df = spark.createDataFrame(
        [(None, "https://a.com/x"), (7, "https://a.com/x"),
         (8, "https://a.com/x")],
        "doc_id long, url string",
    )
    out = dedup_by_url(df).collect()
    ids = sorted((r["doc_id"] is None, r["doc_id"] or -1) for r in out)
    # keep-min over identified rows (7) + the NULL-id row passes through
    assert len(out) == 2
    assert {r["doc_id"] for r in out} == {None, 7}
