"""BPE induction (operators/bpe.py): learned merges must equal an
independent pure-python Sennrich trainer exactly (same deterministic
tie-break), segmentation must round-trip, and the corpus-scale contracts
(word-table training, distinct-word encoding) must hold."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.operators.bpe import (
    END,
    apply_bpe,
    bpe_train,
    word_counts,
)
from exstream_implementation_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _local_train(texts, n_merges):
    """Sennrich reference with the engine's tie-break (count desc, pair
    lexicographic asc)."""
    wc = Counter(
        w for t in texts for w in t.lower().split() if w
    )
    vocab = {tuple(list(w) + [END]): c for w, c in wc.items()}
    merges = []
    for _ in range(n_merges):
        stats = Counter()
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                stats[p] += c
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _local_encode(word, merges):
    ranks = {p: i for i, p in enumerate(merges)}
    syms = list(word) + [END]
    while len(syms) > 1:
        cands = [(ranks[p], p) for p in zip(syms, syms[1:]) if p in ranks]
        if not cands:
            break
        a, b = min(cands)[1]
        out = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def test_trained_merges_match_local_reference(spark):
    texts = [
        "low lower lowest",
        "new newer newest newest",
        "wide wider widest low low",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = bpe_train(docs, n_merges=12)
    exp = _local_train(texts, 12)
    assert got == exp and len(got) == 12


def test_trained_merges_match_local_reference_on_testdata(spark):
    docs = load_table(spark, SF_DIR, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    got = bpe_train(docs, n_merges=25)
    assert got == _local_train(texts, 25)


def test_training_stops_when_no_pairs_remain(spark):
    # single-char words exhaust after merging with the END marker
    docs = spark.createDataFrame([(0, "a b a")], "doc_id long, text string")
    merges = bpe_train(docs, n_merges=50)
    assert merges == _local_train(["a b a"], 50)
    assert len(merges) < 50


def test_apply_bpe_segments_like_local_encoder(spark):
    texts = ["low lower lowest", "newest wide low"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=10)
    out = {r["doc_id"]: r for r in apply_bpe(docs, merges).collect()}
    for did, text in enumerate(texts):
        exp = [
            p for w in text.lower().split() for p in _local_encode(w, merges)
        ]
        assert list(out[did]["bpe_tokens"]) == exp, did
        assert out[did]["n_bpe"] == len(exp)
    # segmentation round-trips: concatenating pieces re-spells each word
    for did, text in enumerate(texts):
        joined = "".join(out[did]["bpe_tokens"]).replace(END, " ").strip()
        assert joined == " ".join(text.lower().split())


def test_apply_bpe_handles_unseen_and_empty_docs(spark):
    train = spark.createDataFrame([(0, "aa aa ab")], "doc_id long, text string")
    merges = bpe_train(train, n_merges=5)
    docs = spark.createDataFrame(
        [(1, "aa zzz"), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in apply_bpe(docs, merges).collect()}
    assert out[1]["bpe_tokens"][: len(_local_encode("aa", merges))] == list(
        _local_encode("aa", merges)
    )
    # unseen word falls back to finer pieces but still round-trips
    assert "".join(out[1]["bpe_tokens"]).replace(END, " ").strip() == "aa zzz"
    assert list(out[2]["bpe_tokens"]) == [] and out[2]["n_bpe"] == 0
    assert list(out[3]["bpe_tokens"]) == [] and out[3]["n_bpe"] == 0


def test_training_reads_word_table_not_corpus(spark):
    """The scale contract: merge statistics come from the (word, count)
    table — duplicating every doc 5x changes no merge decision."""
    texts = ["low lower lowest", "newest wide low"]
    docs1 = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    docs5 = spark.createDataFrame(
        [(i * 10 + j, t) for i, t in enumerate(texts) for j in range(5)],
        "doc_id long, text string",
    )
    assert bpe_train(docs1, 8) == bpe_train(docs5, 8)
    wc = {r["word"]: r["count"] for r in word_counts(docs5).collect()}
    assert wc["low"] == 10  # 2 occurrences x 5 copies


def test_bad_n_merges(spark):
    docs = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bpe_train(docs, 0)


def test_merges_round_trip_through_disk(spark, tmp_path):
    """save_merges/load_merges: a cold loader segments identically to the
    trainer's in-memory model, and the save is atomic."""
    import os

    from exstream_implementation_spark.operators.bpe import (
        apply_bpe,
        bpe_train,
        load_merges,
        save_merges,
    )
    from exstream_implementation_spark.sources import load_table

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .filter("doc_id < 40")
    )
    merges = bpe_train(docs, n_merges=12)
    path = str(tmp_path / "tok.json")
    save_merges(merges, path)
    assert not os.path.exists(path + ".tmp")  # atomic: no tmp residue
    loaded = load_merges(path)
    assert loaded == merges
    a = {r["doc_id"]: list(r["bpe_tokens"])
         for r in apply_bpe(docs, merges).collect()}
    b = {r["doc_id"]: list(r["bpe_tokens"])
         for r in apply_bpe(docs, loaded).collect()}
    assert a == b
    import pytest as _pt

    import json

    bad = str(tmp_path / "bad.json")
    with open(bad, "w") as fh:
        json.dump([["a", "b", "c"]], fh)
    with _pt.raises(ValueError, match="malformed"):
        load_merges(bad)
