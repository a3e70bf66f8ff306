"""BM25 ranked retrieval (plans/search.py): exact parity vs an independent
local (pure-python) BM25 model, pruning semantics, plan shape, degenerate
inputs, and the two-phase top-k fold's tie-break agreement."""

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.plans.search import (
    BM25_B,
    BM25_K1,
    bm25_topk,
    build_postings,
    corpus_stats,
    query_term_weights,
)
from exstream_implementation_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _local_bm25(docs, queries, k, k1=BM25_K1, b=BM25_B, max_df_ratio=0.5):
    """Independent reference model: plain-python BM25 over (doc_id, text)."""
    toks = {
        d: [t for t in re.split(r"\s+", txt.lower()) if t] for d, txt in docs
    }
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfreq = Counter()
    for ts in toks.values():
        dfreq.update(set(ts))
    out = {}
    for qid, qtext in queries:
        terms = [
            t
            for t in dict.fromkeys(x for x in re.split(r"\s+", qtext.lower()) if x)
            if 0 < dfreq[t] <= max_df_ratio * n
        ]
        scores = {}
        for d, ts in toks.items():
            tf = Counter(ts)
            s = 0.0
            for t in terms:
                if tf[t]:
                    idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
                    s += idf * tf[t] * (k1 + 1) / (
                        tf[t] + k1 * (1 - b + b * len(ts) / avgdl)
                    )
            if s > 0:
                scores[d] = s
        out[qid] = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
    return out


def _queries_df(spark, rows):
    return spark.createDataFrame(rows, "query_id int, query_text string")


def test_bm25_matches_local_model_on_testdata(spark):
    docs_df = load_table(spark, SF_DIR, "documents")
    docs = [(r["doc_id"], r["text"]) for r in docs_df.select("doc_id", "text").collect()]
    # queries built from real document fragments so hits are non-trivial,
    # plus a multi-term mix and a term nobody has
    frag = " ".join(docs[3][1].split()[5:9])
    qrows = [
        (1, frag),
        (2, docs[10][1].split()[2] + " " + docs[20][1].split()[4]),
        (3, "zzz-no-such-term-zzz"),
    ]
    expected = _local_bm25(docs, qrows, k=7)
    got = bm25_topk(spark, docs_df, _queries_df(spark, qrows), k=7).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, exp in expected.items():
        rows = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in rows] == [d for d, _ in exp], qid
        for r, (_, s) in zip(rows, exp):
            assert r["score"] == pytest.approx(s, rel=1e-9)
        assert [r["rank"] for r in rows] == list(range(1, len(exp) + 1))


def test_stop_term_pruning_drops_high_df_terms(spark):
    docs = [(i, "common filler words") for i in range(9)] + [(9, "rare gem")]
    docs_df = spark.createDataFrame(docs, "doc_id long, text string")
    postings = build_postings(docs_df)
    n, _ = corpus_stats(postings)
    assert n == 10
    w = query_term_weights(
        postings,
        _queries_df(spark, [(1, "common rare")]),
        n,
        max_df_ratio=0.5,
    ).collect()
    # 'common' has df=9 > 5 -> pruned; 'rare' df=1 survives
    assert [r["term"] for r in w] == ["rare"]
    # and the pruned term contributes nothing to scoring
    top = bm25_topk(
        spark, docs_df, _queries_df(spark, [(1, "common rare")]), k=3
    ).collect()
    assert [r["doc_id"] for r in top] == [9]


def test_corpus_never_shuffles_to_meet_queries(spark):
    """The postings side of the scoring join must be a BroadcastHashJoin
    (broadcast = the query-term weights); no CartesianProduct anywhere."""
    docs_df = load_table(spark, SF_DIR, "documents")
    plan = bm25_topk(
        spark, docs_df, _queries_df(spark, [(1, "alpha beta")]), k=5
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_partial_topk_tiebreak_matches_final_window(spark):
    """Equal-score docs spread across partitions: the fold must keep the
    LOWEST doc_ids (the final tie-break), not whatever its partition saw."""
    # 40 identical docs -> identical scores; k=3 must return doc_ids 0,1,2
    docs = [(i, "needle haystack") for i in range(40)]
    docs_df = spark.createDataFrame(docs, "doc_id long, text string").repartition(8)
    top = bm25_topk(
        spark, docs_df, _queries_df(spark, [(1, "needle")]), k=3, max_df_ratio=1.0
    ).collect()
    assert [r["doc_id"] for r in sorted(top, key=lambda r: r["rank"])] == [0, 1, 2]
    assert len({round(r["score"], 9) for r in top}) == 1


def test_degenerate_inputs(spark):
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    out = bm25_topk(spark, empty_docs, _queries_df(spark, [(1, "x")]), k=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id",
        "doc_id",
        "score",
        "rank",
    ]
    docs_df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert bm25_topk(spark, docs_df, _queries_df(spark, []), k=5).count() == 0


def test_prebuilt_postings_path(spark):
    docs_df = load_table(spark, SF_DIR, "documents")
    postings = build_postings(docs_df)
    # the testdata's lead tokens are corpus-wide stopwords (df ~0.8N), so
    # disable pruning here — this test is about prebuilt==on-the-fly parity
    q = _queries_df(spark, [(1, " ".join(docs_df.first()["text"].split()[:3]))])
    a = {
        (r["query_id"], r["doc_id"], r["rank"])
        for r in bm25_topk(spark, docs_df, q, k=5, max_df_ratio=1.0).collect()
    }
    b = {
        (r["query_id"], r["doc_id"], r["rank"])
        for r in bm25_topk(
            spark, postings, q, k=5, prebuilt=True, max_df_ratio=1.0
        ).collect()
    }
    assert a == b and a
