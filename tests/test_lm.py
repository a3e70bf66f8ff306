"""Bigram LM scoring (plans/lm.py) vs an independent pure-python model:
count-table parity, stupid-backoff scoring (seen / backoff / OOV paths),
short-doc semantics, and cross-corpus scoring."""

import math
import random
from collections import Counter

import pytest

from exstream_implementation_spark.plans.lm import (
    ALPHA,
    score_lm_nll,
    train_bigram_lm,
)
from exstream_implementation_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _py_lm(texts):
    uni, bi = Counter(), Counter()
    for t in texts:
        toks = [w for w in t.lower().split() if w]
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    return uni, bi


def _py_nll(text, uni, bi, alpha=ALPHA):
    n, v = sum(uni.values()), len(uni)
    toks = [w for w in text.lower().split() if w]
    if len(toks) < 2:
        return 0.0
    lps = []
    for p in zip(toks, toks[1:]):
        if p in bi:
            lps.append(math.log(bi[p] / uni[p[0]]))
        else:
            lps.append(math.log(alpha * (uni.get(p[1], 0) + 1) / (n + v)))
    return round(-sum(lps) / len(lps), 6)


def _df(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_count_tables_match_python(spark):
    texts = ["a b a c", "b a b", "c c c c"]
    lm = train_bigram_lm(_df(spark, texts))
    uni, bi = _py_lm(texts)
    assert {(r["w"], r["c"]) for r in lm["unigrams"].collect()} == set(
        uni.items()
    )
    assert {
        ((r["w1"], r["w2"]), r["c"]) for r in lm["bigrams"].collect()
    } == set(bi.items())
    n, v = lm["totals"].first()
    assert (n, v) == (sum(uni.values()), len(uni))


def test_scores_match_python_on_random_corpus(spark):
    rng = random.Random(13)
    vocab = ["sun", "moon", "star", "sky", "sea", "wind"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 25)))
        for _ in range(40)
    ]
    df = _df(spark, texts)
    lm = train_bigram_lm(df)
    uni, bi = _py_lm(texts)
    got = {
        r["doc_id"]: r["lm_nll"] for r in score_lm_nll(df, lm).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == pytest.approx(
            _py_nll(t, uni, bi), abs=2e-6
        ), (i, t)


def test_oov_and_short_docs(spark):
    train = _df(spark, ["the cat sat on the mat", "the dog sat"])
    lm = train_bigram_lm(train)
    uni, bi = _py_lm(["the cat sat on the mat", "the dog sat"])
    score_df = _df(
        spark,
        [
            "the cat sat",        # all-seen bigrams
            "cat the zebra ran",  # backoff + full OOV
            "single",             # < 2 tokens -> 0.0
            "",                   # empty -> 0.0
        ],
    )
    got = {
        r["doc_id"]: r["lm_nll"]
        for r in score_lm_nll(score_df, lm).collect()
    }
    texts = ["the cat sat", "cat the zebra ran", "single", ""]
    for i, t in enumerate(texts):
        assert got[i] == pytest.approx(_py_nll(t, uni, bi), abs=2e-6), t
    assert got[2] == 0.0 and got[3] == 0.0


def test_implausible_order_scores_worse(spark):
    # the use case: same words, scrambled order -> higher nll
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    lm = train_bigram_lm(docs)
    texts = [r["text"] for r in docs.limit(20).collect()]
    rng = random.Random(5)
    scrambled = []
    for t in texts:
        ws = t.split()
        rng.shuffle(ws)
        scrambled.append(" ".join(ws))
    both = _df(spark, texts + scrambled)
    got = {
        r["doc_id"]: r["lm_nll"] for r in score_lm_nll(both, lm).collect()
    }
    orig = [got[i] for i in range(len(texts))]
    scr = [got[i + len(texts)] for i in range(len(texts))]
    worse = sum(s > o for o, s in zip(orig, scr))
    assert worse >= int(0.8 * len(texts)), (worse, len(texts))
