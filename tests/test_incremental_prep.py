"""Incremental corpus preparation (incremental.py): the equivalence
contract — with monotone doc_ids, init+increments produce the SAME
surviving documents and cleaned text as one from-scratch prepare_corpus
over the union, for every doc-level stage through 'mixed' — plus the
guards (monotone ids, benchmark digest, frozen model presence), frozen
tokenizer identity, quota top-up, and readable per-increment exports."""

import json
import os

import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.corpus_prep import (
    AUDIT_STAGES,
    CorpusPrepConfig,
    prepare_corpus,
)
from exstream_implementation_spark.incremental import (

    init_prep_state,
    prepare_increment,
    read_state,
)

# >60 s integration suite: excluded from the quick tier (README "Run")
pytestmark = pytest.mark.slow

STOPFUL = "the a and of is to in on"
BOILER = "subscribe to the newsletter and follow of is updates daily ok"


def _doc(i, body, src):
    return (i, f"{STOPFUL} {body}", src)


def _batches(spark):
    """Three batches with every cross-batch phenomenon planted."""
    b1 = [
        _doc(0, "alpha beta gamma delta epsilon zeta eta theta", "srcA"),
        _doc(1, f"unique prose about rivers {BOILER} more rivers", "srcA"),
        _doc(2, "calm ordinary writing that survives every stage", "srcB"),
        _doc(3, "another batch one survivor with plain words here", "srcB"),
    ]
    b2 = [
        # 10: exact duplicate of doc 0 (cross-batch dedup)
        _doc(10, "alpha beta gamma delta epsilon zeta eta theta", "srcB"),
        # 11: carries doc 1's boilerplate span (cross-batch substring)
        _doc(11, f"mountain text here {BOILER} further mountains", "srcA"),
        # 12/13: share a NEW span within batch 2 (in-batch substring)
        _doc(12, f"fresh shared passage appears twice {BOILER[::-1]}", "srcB"),
        _doc(13, f"other words fresh shared passage appears twice end", "srcB"),
        # 14: contaminated by the benchmark 3-gram run
        _doc(14, "casual words then secret eval answer here now ok", "srcA"),
        # 15: fails quality (no stop words, long)
        (15, " ".join(f"w{i}" for i in range(30)), "srcA"),
        # 16-18: srcA flood to cross the per-source cap boundary
        _doc(16, "flood document one with ordinary filler words", "srcA"),
        _doc(17, "flood document two with ordinary filler words", "srcA"),
        _doc(18, "flood document three with ordinary filler words", "srcA"),
    ]
    b3 = [
        # 20: duplicate of a BATCH-2 doc (state must have grown)
        _doc(20, f"mountain text here {BOILER} further mountains", "srcB"),
        # 21: clean third-batch survivor
        _doc(21, "third batch brings calm new material to keep", "srcB"),
        # 22: re-carries doc 1's boilerplate (old state still applies)
        _doc(22, f"valley text now {BOILER} further valleys", "srcA"),
    ]
    schema = "doc_id long, text string, source string"
    return (
        spark.createDataFrame(b1, schema),
        spark.createDataFrame(b2, schema),
        spark.createDataFrame(b3, schema),
    )


def _bench(spark):
    return spark.createDataFrame(
        [(0, "secret eval answer here")], "qid long, text string"
    )


CFG = CorpusPrepConfig(
    min_tokens=8,
    min_stop_ratio=0.1,
    substring_k=12,
    substring_mod=None,
    max_per_source=4,
    mix_fractions={"srcA": 1.0, "srcB": 0.75},
    bpe_merges=8,
    chunk_len=8,
    pack_capacity=16,
    pack_groups=4,
    n_shards=2,
)


@pytest.fixture(scope="module")
def run(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("inc")
    state, out = str(root / "state"), str(root / "out")
    b1, b2, b3 = _batches(spark)
    s0 = init_prep_state(
        b1, state, benchmark=_bench(spark), cfg=CFG, out_path=out
    )
    s1 = prepare_increment(
        b2, state, benchmark=_bench(spark), out_path=out, counts=True
    )
    s2 = prepare_increment(
        b3, state, benchmark=_bench(spark), out_path=out, counts=True
    )
    full = prepare_corpus(b1.unionByName(b2).unionByName(b3), _bench(spark), CFG)
    return {
        "state_path": state,
        "out": out,
        "batches": (b1, b2, b3),
        "incs": (s0, s1, s2),
        "full": full,
    }


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_stagewise_parity_with_from_scratch(run):
    s0, s1, s2 = run["incs"]
    full = run["full"]
    for stage in AUDIT_STAGES:
        inc_ids = _ids(s0[stage]) + _ids(s1[stage]) + _ids(s2[stage])
        assert sorted(inc_ids) == _ids(full[stage]), stage


def test_cleaned_text_parity(run):
    s0, s1, s2 = run["incs"]
    full_txt = {
        r["doc_id"]: r["text"]
        for r in run["full"]["despanned"].select("doc_id", "text").collect()
    }
    inc_txt = {}
    for s in (s0, s1, s2):
        for r in s["despanned"].select("doc_id", "text").collect():
            inc_txt[r["doc_id"]] = r["text"]
    assert inc_txt == full_txt
    # the planted cross-batch boilerplate really was removed from the
    # LATER copies only
    assert BOILER in inc_txt[1]
    assert BOILER not in inc_txt[11]
    assert BOILER not in inc_txt[22]


def test_planted_phenomena(run):
    _, s1, s2 = run["incs"]
    ids1, ids2 = _ids(s1["mixed"]), _ids(s2["mixed"])
    assert 10 not in ids1  # cross-batch exact dup dropped
    assert 14 not in ids1  # contaminated dropped
    assert 15 not in ids1  # quality-failed dropped
    assert 20 not in ids2  # dup of a batch-2 doc: state grew between incs
    # in-batch substring pair: later doc lost the shared span
    txt = {
        r["doc_id"]: r["text"]
        for r in s1["despanned"].select("doc_id", "text").collect()
    }
    assert "fresh shared passage appears twice" in txt[12]
    assert "fresh shared passage appears twice" not in txt[13]


def test_cap_quota_never_exceeded_across_batches(run):
    s0, s1, s2 = run["incs"]
    from collections import Counter

    per_src = Counter()
    for s in (s0, s1, s2):
        for r in s["capped"].select("source").collect():
            per_src[r["source"]] += 1
    assert all(v <= CFG.max_per_source for v in per_src.values()), per_src
    # the srcA flood actually hit the boundary
    assert per_src["srcA"] == CFG.max_per_source


def test_frozen_tokenizer(run):
    s0, s1, s2 = run["incs"]
    assert s1["merges"] == s0["merges"] == s2["merges"]


def test_state_advances_and_rerun_guard(run, spark):
    # >= not ==: another test in this module legitimately commits a later
    # increment, so the assertions must hold under any test order
    st = read_state(run["state_path"])
    assert st["n_increments"] >= 3
    assert st["max_doc_id"] >= 22
    # snapshot version matches the increment count; every committed log
    # directory exists on disk
    assert st["versions"]["source_counts"] == st["n_increments"]
    for log in ("hashes", "anchors"):
        assert len(st["logs"][log]) == st["n_increments"]
        for d in st["logs"][log]:
            assert os.path.isdir(
                os.path.join(run["state_path"], log, d)
            ), (log, d)
    # replaying an already-processed batch fails the monotone guard
    b1, b2, _ = run["batches"]
    with pytest.raises(ValueError, match="monotone|exceed"):
        prepare_increment(b2, run["state_path"], benchmark=_bench(spark))


def test_benchmark_guards(run, spark, tmp_path):
    wrong = spark.createDataFrame(
        [(0, "a different benchmark")], "qid long, text string"
    )
    nxt = spark.createDataFrame(
        [(100, f"{STOPFUL} guard probe text words", "srcB")],
        "doc_id long, text string, source string",
    )
    with pytest.raises(ValueError, match="digest"):
        prepare_increment(nxt, run["state_path"], benchmark=wrong)
    with pytest.raises(ValueError, match="benchmark"):
        prepare_increment(nxt, run["state_path"], benchmark=None)
    # a state built WITHOUT a benchmark rejects one appearing later
    b1, _, _ = run["batches"]
    state2 = str(tmp_path / "state2")
    init_prep_state(b1, state2, cfg=CFG)
    with pytest.raises(ValueError, match="WITHOUT"):
        prepare_increment(nxt, state2, benchmark=_bench(spark))
    # the filter-chain guards fire in BOTH directions (same class as the
    # benchmark digest): a model/checks appearing only on later batches
    # would silently change what later batches keep
    with pytest.raises(ValueError, match="WITHOUT a quality_model"):
        prepare_increment(nxt, state2, quality_model=object())
    from exstream_implementation_spark.operators.expectations import (
        not_null,
    )

    with pytest.raises(ValueError, match="WITHOUT contract_checks"):
        prepare_increment(nxt, state2, contract_checks=(not_null("doc_id"),))


def test_init_refuses_existing_state(run, spark):
    b1, _, _ = run["batches"]
    with pytest.raises(ValueError, match="already committed"):
        init_prep_state(b1, run["state_path"], cfg=CFG)


def test_export_tree_reads_back(run, spark):
    for i in range(3):
        p = os.path.join(run["out"], f"increment={i}")
        assert os.path.isdir(p), p
        df = spark.read.option("basePath", p).parquet(
            os.path.join(p, "shard=*")
        )
        assert df.count() >= 0 and "toks" in df.columns
        # every increment carries its provenance manifest (increment 0's
        # is written by prepare_corpus, later ones by prepare_increment)
        m = json.load(open(os.path.join(p, "_MANIFEST.json")))
        assert m["bpe_merges"], (i, m)


def test_all_dropped_increment_exports_readable_empty(run, spark, tmp_path):
    # every doc fails quality: the increment is a no-op but must still
    # commit state and leave a readable (empty) shard tree
    dead = spark.createDataFrame(
        [(200, "tiny", "srcA"), (201, " ".join(f"w{i}" for i in range(30)), "srcB")],
        "doc_id long, text string, source string",
    )
    n_before = read_state(run["state_path"])["n_increments"]
    s = prepare_increment(
        dead,
        run["state_path"],
        benchmark=_bench(spark),
        out_path=str(tmp_path / "out2"),
        counts=True,
    )
    assert s["stage_counts"]["mixed"] == 0
    p = s["out_path"]
    back = spark.read.option("basePath", p).parquet(os.path.join(p, "shard=*"))
    assert back.count() == 0
    st = read_state(run["state_path"])
    assert st["n_increments"] == n_before + 1 and st["max_doc_id"] == 201


def test_compaction_preserves_membership(spark, tmp_path):
    from exstream_implementation_spark.incremental import (
        compact_prep_state,
    )

    b1, b2, _ = _batches(spark)
    state = str(tmp_path / "state")
    init_prep_state(b1, state, benchmark=_bench(spark), cfg=CFG)
    prepare_increment(b2, state, benchmark=_bench(spark))
    st = compact_prep_state(spark, state)
    for log in ("hashes", "anchors"):
        assert st["logs"][log] == ["compact=2"]
        # unreferenced batch directories were vacuumed post-commit
        assert not os.path.isdir(os.path.join(state, log, "batch=0"))
    # superseded snapshot versions vacuumed, the state-referenced one kept
    assert not os.path.isdir(os.path.join(state, "source_counts", "v=000001"))
    assert os.path.isdir(
        os.path.join(
            state,
            "source_counts",
            f"v={st['versions']['source_counts']:06d}",
        )
    )
    # idempotent: a re-run at the same generation is a no-op
    assert compact_prep_state(spark, state)["logs"] == st["logs"]
    # membership against compacted state still works: an exact dup of a
    # batch-1 doc and a carrier of its boilerplate both get caught
    b3 = spark.createDataFrame(
        [
            _doc(30, "alpha beta gamma delta epsilon zeta eta theta", "srcB"),
            _doc(31, f"fresh prose here {BOILER} trailing words", "srcB"),
        ],
        "doc_id long, text string, source string",
    )
    s = prepare_increment(b3, state, benchmark=_bench(spark))
    assert _ids(s["deduped"]) == [31]
    txt = {r["doc_id"]: r["text"] for r in s["despanned"].collect()}
    assert BOILER not in txt[31]
    # the post-compaction increment appended a fresh batch directory
    assert read_state(state)["logs"]["hashes"] == ["compact=2", "batch=2"]


def test_streaming_writer_exactly_once(spark, tmp_path):
    from exstream_implementation_spark.incremental import (
        incremental_prep_writer,
    )

    b1, b2, b3 = _batches(spark)
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    init_prep_state(b1, state, benchmark=_bench(spark), cfg=CFG, out_path=out)
    fn = incremental_prep_writer(state, out, benchmark=_bench(spark))

    # direct-call semantics first: process, then redeliver the same batch
    fn(b2, 0)
    st = read_state(state)
    assert st["n_increments"] == 2 and st["max_doc_id"] == 18
    fn(b2, 1)  # redelivery AFTER commit: content fence skips it
    assert read_state(state) == st
    # an empty microbatch is a no-op
    fn(b2.limit(0), 2)
    assert read_state(state) == st
    # a replay FUSED with new data fails loudly instead of silently
    # dropping or double-processing either half
    with pytest.raises(ValueError, match="NOT an exact replay"):
        fn(b2.unionByName(b3), 3)
    fn(b3, 4)
    st2 = read_state(state)
    assert st2["n_increments"] == 3 and st2["max_doc_id"] == 22
    # genuinely NEW data arriving out of id order (id 19 was never
    # committed but sits below max 22): loud error, never a silent skip
    straggler = spark.createDataFrame(
        [_doc(19, "late arriving document with plain words here", "srcB")],
        "doc_id long, text string, source string",
    )
    with pytest.raises(ValueError, match="NOT an exact replay"):
        fn(straggler, 5)
    # rows with only NULL ids must not masquerade as an empty batch
    nulls = spark.createDataFrame(
        [(None, "null id doc", "srcB")],
        "doc_id long, text string, source string",
    )
    with pytest.raises(ValueError, match="NULL"):
        fn(nulls, 6)

    # a real stream: one availableNow drain over a parquet directory
    src = str(tmp_path / "src")
    nxt = spark.createDataFrame(
        [_doc(40, "stream borne survivor document with plain words", "srcB")],
        "doc_id long, text string, source string",
    )
    nxt.write.parquet(src)
    q = (
        spark.readStream.schema(nxt.schema)
        .parquet(src)
        .writeStream.foreachBatch(
            incremental_prep_writer(state, out, benchmark=_bench(spark))
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    st3 = read_state(state)
    assert st3["n_increments"] == 4 and st3["max_doc_id"] == 40
    assert os.path.isdir(os.path.join(out, "increment=3"))
    # checkpoint loss: a fresh checkpoint re-offers batch 0 with the SAME
    # docs — the dedupe token makes the replay a no-op instead of a
    # monotone-guard crash
    q2 = (
        spark.readStream.schema(nxt.schema)
        .parquet(src)
        .writeStream.foreachBatch(
            incremental_prep_writer(state, out, benchmark=_bench(spark))
        )
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert read_state(state) == st3


def test_describe_prep_state(run, spark):
    from exstream_implementation_spark.incremental import (
        describe_prep_state,
    )

    d = describe_prep_state(spark, run["state_path"])
    assert d["n_increments"] >= 3
    assert d["has_benchmark"] and not d["has_quality_model"]
    assert len(d["id_ranges"]) == d["n_increments"]
    for name in ("hashes", "anchors"):
        assert d["logs"][name]["rows"] > 0
        assert len(d["logs"][name]["dirs"]) == d["n_increments"]
    assert d["config"]["max_per_source"] == CFG.max_per_source


def test_drop_audit_composes_with_increments(run):
    # the per-document provenance audit (corpus_prep.drop_audit) works
    # unchanged over an increment's stage dict: every input doc of batch 2
    # gets a dropped_at verdict naming the first stage that lost it
    from exstream_implementation_spark.corpus_prep import drop_audit

    _, s1, _ = run["incs"]
    _, b2, _ = run["batches"]
    audit = {
        r["doc_id"]: r["dropped_at"]
        for r in drop_audit(s1, b2).collect()
    }
    assert set(audit) == {r["doc_id"] for r in b2.select("doc_id").collect()}
    assert audit[10] == "deduped"  # cross-batch exact dup
    assert audit[14] == "decontaminated"
    assert audit[15] == "quality"
    assert audit[11] == "kept"


def test_weighted_cap_tops_up_quota(spark, tmp_path):
    cfg = CorpusPrepConfig(
        min_tokens=4,
        min_stop_ratio=0.0,
        substring_k=40,
        substring_mod=None,
        max_per_source=3,
        cap_weight_col="w",
        bpe_merges=4,
        chunk_len=8,
        pack_capacity=16,
        pack_groups=2,
        n_shards=2,
    )
    schema = "doc_id long, text string, source string, w double"
    mk = lambda i, w: (  # noqa: E731
        i,
        f"{STOPFUL} distinct filler body number {i} with words",
        "s",
        w,
    )
    b1 = spark.createDataFrame([mk(0, 1.0), mk(1, 1.0)], schema)
    b2 = spark.createDataFrame(
        [mk(10, 5.0), mk(11, 5.0), mk(12, 0.0), mk(13, None)], schema
    )
    state = str(tmp_path / "state")
    s0 = init_prep_state(b1, state, cfg=cfg)
    assert len(_ids(s0["capped"])) == 2  # under quota at init
    s1 = prepare_increment(b2, state)
    got = _ids(s1["capped"])
    assert len(got) == 1  # remaining quota = 3 - 2
    assert got[0] in (10, 11)  # zero/NULL weights can never win


def test_init_rejects_empty_corpus(spark, tmp_path):
    # committing max_doc_id=null would break every later increment's id
    # fence with an opaque TypeError — fail eagerly and descriptively
    empty = spark.createDataFrame(
        [], "doc_id long, text string, source string"
    )
    state = str(tmp_path / "state_empty")
    with pytest.raises(ValueError, match="empty initial corpus"):
        init_prep_state(empty, state, cfg=CFG)
    assert not os.path.exists(os.path.join(state, "_STATE.json"))


def test_datasheet_without_out_path(run, spark):
    # datasheet=True must yield the in-memory markdown even when no export
    # directory was requested (the file write alone needs out_path)
    docs = spark.createDataFrame(
        [
            (900, f"{STOPFUL} datasheet only run body words here", "srcA"),
            (901, f"{STOPFUL} second datasheet body with words", "srcB"),
        ],
        "doc_id long, text string, source string",
    )
    s = prepare_increment(
        docs,
        run["state_path"],
        benchmark=_bench(spark),
        out_path=None,
        datasheet=True,
    )
    md = s["datasheet_markdown"]
    assert md.startswith("#") and "increment" in md


def test_concurrent_writer_fails_loudly(run, spark, monkeypatch):
    # the single-writer fence: if the on-disk state advances between this
    # increment's entry read and its commit, fail instead of last-write-wins
    import exstream_implementation_spark.incremental as inc

    real = inc.read_state
    calls = {"n": 0}

    def racy(root):
        st = real(root)
        calls["n"] += 1
        if calls["n"] > 1:  # commit-time re-read: simulate a racer
            st = {**st, "n_increments": st["n_increments"] + 1}
        return st

    monkeypatch.setattr(inc, "read_state", racy)
    docs = spark.createDataFrame(
        [(950, f"{STOPFUL} racer detection body with words", "srcA")],
        "doc_id long, text string, source string",
    )
    n_before = real(run["state_path"])["n_increments"]
    with pytest.raises(RuntimeError, match="concurrent prep-state writer"):
        prepare_increment(
            docs, run["state_path"], benchmark=_bench(spark)
        )
    # the losing increment committed nothing
    assert real(run["state_path"])["n_increments"] == n_before


def test_staleness_gate_trips_on_domain_shift(spark, tmp_path):
    # frozen tokenizer monitoring: a batch of long unseen-alphabet words
    # segments toward characters under the frozen merges, raising
    # bpe_tokens_per_word far past the init baseline — the gate must trip
    # even though the quality filter drops every shifted doc
    from exstream_implementation_spark.incremental import (
        describe_prep_state,
        prep_state_is_stale,
    )

    cfg = CorpusPrepConfig(
        min_tokens=4,
        min_stop_ratio=0.1,
        substring_k=40,
        substring_mod=None,
        bpe_merges=12,
        chunk_len=8,
        pack_capacity=16,
        pack_groups=2,
        n_shards=2,
    )
    b1 = spark.createDataFrame(
        [
            (i, f"{STOPFUL} steady prose about rivers and stones {i}", "s")
            for i in range(8)
        ],
        "doc_id long, text string, source string",
    )
    state = str(tmp_path / "state")
    init_prep_state(b1, state, cfg=cfg)
    st0 = read_state(state)
    base = st0["artifact_baseline"]
    assert base["bpe_tokens_per_word"] is not None
    assert not prep_state_is_stale(st0)["stale"]

    # in-domain increment: gate stays quiet
    b2 = spark.createDataFrame(
        [(20, f"{STOPFUL} more steady prose about rivers flowing", "s")],
        "doc_id long, text string, source string",
    )
    prepare_increment(b2, state)
    assert not prep_state_is_stale(read_state(state))["stale"]

    # domain-shifted increment: unseen alphabet, long words
    shifted = " ".join("zqxvkwjzqxvk" + str(i) for i in range(12))
    b3 = spark.createDataFrame(
        [(30, shifted, "s"), (31, shifted[::-1], "s")],
        "doc_id long, text string, source string",
    )
    prepare_increment(b3, state)
    verdict = prep_state_is_stale(read_state(state))
    assert verdict["stale"]
    assert any("tokenizer" in r for r in verdict["reasons"])
    d = describe_prep_state(spark, state)
    assert d["staleness"]["stale"]


def test_prep_state_is_stale_lm_and_missing_baseline():
    from exstream_implementation_spark.incremental import prep_state_is_stale

    # pre-gate state (no baseline): never stale
    assert not prep_state_is_stale({"n_increments": 3})["stale"]
    # lm drift alone trips with its own reason
    st = {
        "artifact_baseline": {
            "bpe_tokens_per_word": 4.0,
            "lm_mean_nll": 3.0,
        },
        "increment_artifact_stats": [
            {"bpe_tokens_per_word": 4.1, "lm_mean_nll": 4.5}
        ],
    }
    v = prep_state_is_stale(st)
    assert v["stale"] and any("lm:" in r for r in v["reasons"])
    # inside both tolerances: quiet
    st["increment_artifact_stats"] = [
        {"bpe_tokens_per_word": 4.5, "lm_mean_nll": 3.5}
    ]
    assert not prep_state_is_stale(st)["stale"]


def test_extend_tokenizer_refreshes_stale_state(spark, tmp_path):
    """The warm-refresh remedy (r11): after the staleness gate trips, a
    Sennrich continuation from the frozen merge list on the drifted batch
    must (a) preserve the frozen prefix verbatim, (b) bring tokens/word on
    the drifted text back under the staleness threshold, (c) commit a new
    state root that accepts further increments while the old root stays
    untouched, and (d) be deterministic."""
    from exstream_implementation_spark.incremental import (
        extend_prep_tokenizer,
        prep_state_is_stale,
    )
    from exstream_implementation_spark.operators.bpe import (
        extend_merges,
        load_merges,
    )

    cfg = CorpusPrepConfig(
        min_tokens=4, min_stop_ratio=0.1, substring_k=40, substring_mod=None,
        bpe_merges=12, chunk_len=8, pack_capacity=16, pack_groups=2,
        n_shards=2,
    )
    b1 = spark.createDataFrame(
        [(i, f"{STOPFUL} steady prose about rivers and stones {i}", "s")
         for i in range(8)],
        "doc_id long, text string, source string",
    )
    state = str(tmp_path / "state")
    init_prep_state(b1, state, cfg=cfg)
    base_tw = read_state(state)["artifact_baseline"]["bpe_tokens_per_word"]

    shifted_docs = [
        (30 + i, " ".join("zqxvkwjzqxvk" + str(j) for j in range(12)), "s")
        for i in range(4)
    ]
    b3 = spark.createDataFrame(
        shifted_docs, "doc_id long, text string, source string"
    )
    prepare_increment(b3, state)
    assert prep_state_is_stale(read_state(state))["stale"]
    tw_frozen = read_state(state)["increment_artifact_stats"][-1][
        "bpe_tokens_per_word"
    ]

    state2 = str(tmp_path / "state_v2")
    res = extend_prep_tokenizer(spark, state, state2, b3, n_new_merges=40)
    frozen = load_merges(os.path.join(state, "merges.json"))
    extended = res["merges"]
    # (a) frozen prefix preserved verbatim — token identities survive
    assert [tuple(m) for m in extended[: len(frozen)]] == [
        tuple(m) for m in frozen
    ]
    assert len(extended) > len(frozen)
    # (b) drifted text now segments below the gate's threshold
    tw_new = res["artifact_baseline"]["bpe_tokens_per_word"]
    assert tw_new < tw_frozen
    assert tw_new <= base_tw * 1.25
    # the refreshed root starts with a clean verdict
    st2 = read_state(state2)
    assert not prep_state_is_stale(st2)["stale"]
    assert st2["n_frozen_merges"] == len(frozen)
    persisted = load_merges(os.path.join(state2, "merges.json"))
    assert [tuple(m) for m in persisted] == [tuple(m) for m in extended]
    # (c) old root untouched and still readable; new root takes increments
    assert prep_state_is_stale(read_state(state))["stale"]
    b4 = spark.createDataFrame(
        [(50, " ".join("zqxvkwjzqxvk" + str(j) for j in range(12)), "s")],
        "doc_id long, text string, source string",
    )
    s4 = prepare_increment(b4, state2)
    assert s4["state"]["n_increments"] == read_state(state)["n_increments"] + 1
    # the in-domain-for-v2 batch no longer trips the refreshed gate
    assert not prep_state_is_stale(read_state(state2))["stale"]
    # (d) determinism of the continuation itself
    again = extend_prep_tokenizer(
        spark, state, str(tmp_path / "state_v3"), b3, n_new_merges=40
    )["merges"]
    assert [tuple(m) for m in again] == [tuple(m) for m in extended]
    # and the raw operator agrees with itself on a re-run
    direct = extend_merges(b3, frozen, 40)
    assert [tuple(m) for m in direct] == [tuple(m) for m in extended]


def test_bloom_membership_equivalent_to_full_join(spark, tmp_path):
    """The Bloom sidecar is an accelerator, never a semantics change: a
    state with the sidecar and a state without it must produce identical
    survivors and identical despanned text on the same planted batches
    (cross-batch exact dup, cross-batch substring, in-batch substring)."""
    b1, b2, b3 = _batches(spark)
    outs = {}
    for label, fpp in (("bloom", 0.01), ("plain", None)):
        state = str(tmp_path / f"state_{label}")
        init_prep_state(
            b1, state, benchmark=_bench(spark), cfg=CFG,
            membership_bloom_fpp=fpp,
        )
        s2 = prepare_increment(b2, state, benchmark=_bench(spark))
        s3 = prepare_increment(b3, state, benchmark=_bench(spark))
        outs[label] = {
            "m2": {
                (r["doc_id"], r["text"])
                for r in s2["despanned"].select("doc_id", "text").collect()
            },
            "m3": {
                (r["doc_id"], r["text"])
                for r in s3["despanned"].select("doc_id", "text").collect()
            },
            "mixed3": {
                r["doc_id"] for r in s3["mixed"].select("doc_id").collect()
            },
        }
        st = read_state(state)
        assert (st["bloom"] is not None) == (fpp is not None)
    assert outs["bloom"] == outs["plain"]


def test_bloom_fresh_batch_skips_log_scan(spark, tmp_path, monkeypatch):
    """A batch whose keys the filter all proves absent must never read the
    membership logs — the sub-linear arm's whole point.  Counted by
    wrapping _read_log; the tiny test filter is chunk-rounded to 512 Kib,
    so its realized fpp is ~0 and the skip is deterministic."""
    import exstream_implementation_spark.incremental as inc

    b1, _, _ = _batches(spark)
    state = str(tmp_path / "state")
    init_prep_state(b1, state, cfg=CFG)

    # stopwords interleaved with unique tokens, NOT the shared STOPFUL
    # prefix: every substring_k-char window must contain novel text, or
    # the batch's anchors TRULY hit the state log (the prefix is real
    # shared text, and the bloom correctly reports it)
    def _novel(i, tag):
        words = []
        for j, stop in enumerate(
            ["the", "a", "and", "of", "is", "to", "in", "on"]
        ):
            words += [f"zq{tag}{j}x", stop]
        return (i, " ".join(words), "srcB")

    novel = spark.createDataFrame(
        [_novel(40, "alpha"), _novel(41, "beta")],
        "doc_id long, text string, source string",
    )
    log_reads: list[str] = []
    orig = inc._read_log

    def counting(spark_, root, name, dirs):
        if name in ("hashes", "anchors"):
            log_reads.append(name)
        return orig(spark_, root, name, dirs)

    monkeypatch.setattr(inc, "_read_log", counting)
    s = prepare_increment(novel, state)
    # force the lazy stages so any log-backed lineage would execute
    assert s["despanned"].count() == 2
    assert log_reads == []  # neither membership log was ever read

    # and the state's own bloom grew: the NEXT increment sees these docs
    monkeypatch.setattr(inc, "_read_log", orig)
    dup = spark.createDataFrame(
        [(_novel(40, "alpha")[0] + 10, _novel(40, "alpha")[1], "srcB")],
        "doc_id long, text string, source string",
    )
    s2 = prepare_increment(dup, state)
    assert s2["deduped"].count() == 0  # caught as a cross-batch exact dup


def test_bloom_survives_compaction_and_cache_invalidation(spark, tmp_path):
    """Compaction rebuilds + re-sizes the sidecars and must invalidate the
    session cache; membership answers stay identical afterwards."""
    from exstream_implementation_spark.incremental import (
        compact_prep_state,
        describe_prep_state,
    )

    b1, b2, b3 = _batches(spark)
    state = str(tmp_path / "state")
    init_prep_state(b1, state, benchmark=_bench(spark), cfg=CFG)
    prepare_increment(b2, state, benchmark=_bench(spark))
    st = compact_prep_state(spark, state)
    meta = st["bloom"]["logs"]["anchors"]
    assert meta["chunk_dirs"] == [f"compact={st['n_increments']}"]
    assert meta["pos_dirs"] == []
    d = describe_prep_state(spark, state)
    assert d["bloom"]["anchors"]["chunk_dirs"] == 1
    # increments after compaction still resolve cross-batch duplicates
    s3 = prepare_increment(b3, state, benchmark=_bench(spark))
    deduped3 = {r["doc_id"] for r in s3["deduped"].select("doc_id").collect()}
    assert 20 not in deduped3  # duplicate of batch-2 doc 11, seen via bloom
    assert 21 in deduped3


def test_bloom_executor_probe_branch_equivalent(spark, tmp_path, monkeypatch):
    """The >2M-key executor-side broadcast probe is the same membership
    answer as the default driver probe — exercised by forcing the
    threshold to 0 and re-running the planted phenomena."""
    import exstream_implementation_spark.incremental as inc

    b1, b2, _ = _batches(spark)
    results = {}
    for label, threshold in (("driver", 10**9), ("executor", 0)):
        monkeypatch.setattr(inc, "_DRIVER_PROBE_MAX_KEYS", threshold)
        state = str(tmp_path / f"state_{label}")
        init_prep_state(b1, state, benchmark=_bench(spark), cfg=CFG)
        s2 = prepare_increment(b2, state, benchmark=_bench(spark))
        results[label] = {
            (r["doc_id"], r["text"])
            for r in s2["despanned"].select("doc_id", "text").collect()
        }
    assert results["driver"] == results["executor"]


def test_bloom_cache_identity_guards_reinit_at_same_path(spark, tmp_path):
    """A state root deleted and re-initialized at the SAME path must not
    serve the old corpus's session-cached bitmap: the re-init reuses the
    'batch=0' dir name and (for a similar-sized corpus) the same m_bits,
    so the subset-of-dirs freshness check alone passes — and a stale
    bitmap yields FALSE NEGATIVES: cross-batch duplicates silently
    admitted past dedup (ADVICE r11 #1).  The init-time identity uuid in
    the cache key forces the rebuild."""
    import shutil

    schema = "doc_id long, text string, source string"
    state = str(tmp_path / "state")
    text_y = "wholly unique duplicate target text appears right here"
    corpus_a = spark.createDataFrame(
        [_doc(0, "first corpus only text alpha beta gamma", "s")], schema
    )
    # init warms the session cache (the fill census assembles the bitmap)
    init_prep_state(corpus_a, state, cfg=CFG)
    # wipe and re-init at the same path with a corpus containing Y
    shutil.rmtree(state)
    corpus_b = spark.createDataFrame([_doc(0, text_y, "s")], schema)
    init_prep_state(corpus_b, state, cfg=CFG)
    # a later duplicate of Y: a stale cached bitmap (corpus A's bits)
    # proves it "definitely absent" and admits it — the fix catches it
    dup = spark.createDataFrame([_doc(100, text_y, "s")], schema)
    s = prepare_increment(dup, state)
    assert s["deduped"].count() == 0


def test_bloom_sharded_probe_equivalent_and_never_assembles(
    spark, tmp_path, monkeypatch
):
    """The chunk-partitioned probe (bitmaps past the single-process
    ceiling) is the same membership answer as the driver probe, and NO
    process ever assembles the bitmap: both assembly entry points are
    poisoned, so peak probe memory is O(batch + one 64 KiB chunk rows)
    by construction — the r11 verdict's 100 TB ceiling item."""
    import exstream_implementation_spark.incremental as inc

    b1, b2, b3 = _batches(spark)
    results = {}
    for label in ("single", "sharded"):
        if label == "sharded":
            monkeypatch.setattr(inc, "_SINGLE_PROCESS_BITMAP_MAX_BYTES", 0)

            def _poison(*a, **k):
                raise AssertionError(
                    "full bitmap assembled on the sharded path"
                )

            monkeypatch.setattr(inc, "_assemble_bloom_bits", _poison)
            monkeypatch.setattr(inc, "_assemble_bloom", _poison)
        state = str(tmp_path / f"state_{label}")
        init_prep_state(b1, state, benchmark=_bench(spark), cfg=CFG)
        s2 = prepare_increment(b2, state, benchmark=_bench(spark))
        s3 = prepare_increment(b3, state, benchmark=_bench(spark))
        results[label] = {
            "m2": {
                (r["doc_id"], r["text"])
                for r in s2["despanned"].select("doc_id", "text").collect()
            },
            "m3": {
                (r["doc_id"], r["text"])
                for r in s3["despanned"].select("doc_id", "text").collect()
            },
        }
    assert results["single"] == results["sharded"]


def test_sharded_probe_maybe_set_matches_driver(spark, tmp_path, monkeypatch):
    """Bit-level parity of the probe forms: the sharded cogroup probe and
    the driver-array probe return the IDENTICAL maybe-key set on a mix of
    members and novel keys (same positions, same bits — the sharded
    OR-merge of dense chunks + sparse deltas must reconstruct exactly)."""
    import exstream_implementation_spark.incremental as inc
    from exstream_implementation_spark.corpus_prep import _norm_hash

    b1, b2, _ = _batches(spark)
    state = str(tmp_path / "state")
    init_prep_state(b1, state, cfg=CFG)
    prepare_increment(b2, state)  # adds a sparse pos delta on top of chunks
    st = read_state(state)
    meta = st["bloom"]["logs"]["hashes"]
    keys = (
        b1.select(_norm_hash("text").alias("__ch"))
        .unionByName(b2.select(_norm_hash("text").alias("__ch")))
        .unionByName(
            spark.createDataFrame(
                [(f"novel-key-{i}",) for i in range(64)], "__ch string"
            )
        )
        .distinct()
    )
    driver = {
        r["__ch"]
        for r in inc._bloom_maybe_keys(
            spark, state, meta, keys, "__ch"
        ).collect()
    }
    sharded = {
        r["__ch"]
        for r in inc._bloom_maybe_keys_sharded(
            spark, state, meta, keys, "__ch"
        ).collect()
    }
    assert sharded == driver
    # every true member is a maybe (no false negatives, ever) — members
    # are the QUALITY-SURVIVING docs' hashes (doc 15 is the planted
    # quality failure; its hash never enters the log)
    members = {
        r["__ch"]
        for r in b1.unionByName(b2)
        .filter("doc_id != 15")
        .select(_norm_hash("text").alias("__ch"))
        .collect()
    }
    assert members <= sharded


def test_sharded_probe_prunes_unprobed_chunks(spark, tmp_path, monkeypatch):
    """A small batch against a corpus-scale sidecar must not shuffle the
    whole chunk table: the filter side is semi-joined (broadcast) to the
    batch's probed chunk ids BEFORE the cogroup exchange.  Plan-guarded
    like the catalog's broadcast joins, plus answer parity on the pruned
    path."""
    import pyspark.sql.classic.dataframe as cdf

    import exstream_implementation_spark.incremental as inc
    from exstream_implementation_spark.corpus_prep import _norm_hash

    b1, b2, _ = _batches(spark)
    state = str(tmp_path / "state")
    init_prep_state(b1, state, cfg=CFG)
    meta = read_state(state)["bloom"]["logs"]["hashes"]
    one = (
        b1.select(_norm_hash("text").alias("__ch")).distinct().limit(1)
    )
    captured = {}
    orig = cdf.DataFrame.localCheckpoint

    def spy(self, eager=True):
        captured.setdefault("df", self)
        return orig(self, eager=eager)

    monkeypatch.setattr(cdf.DataFrame, "localCheckpoint", spy)
    got = {
        r["__ch"]
        for r in inc._bloom_maybe_keys_sharded(
            spark, state, meta, one, "__ch"
        ).collect()
    }
    assert got == {r["__ch"] for r in one.collect()}  # member stays maybe
    plan = captured["df"]._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_bloom_probe_leaves_no_pinned_storage(spark, tmp_path, monkeypatch):
    """ADVICE r11 #3: neither probe branch may leave indefinitely-pinned
    storage behind — the >threshold branch used to return a persisted
    frame nobody unpersists, and the n==0 early return handed back a
    still-persisted scan.  localCheckpoint blocks are ContextCleaner-
    managed and excluded from the pinned census by design (cache.py)."""
    import exstream_implementation_spark.incremental as inc
    from exstream_implementation_spark.cache import persisted_rdd_census
    from exstream_implementation_spark.corpus_prep import _norm_hash

    b1, b2, _ = _batches(spark)
    state = str(tmp_path / "state")
    init_prep_state(b1, state, cfg=CFG)
    meta = read_state(state)["bloom"]["logs"]["hashes"]
    keys = b2.select(_norm_hash("text").alias("__ch")).distinct()
    empty = keys.limit(0)
    base = persisted_rdd_census(spark)[0]
    # broadcast branch (threshold 0 forces it), then the n==0 early return
    monkeypatch.setattr(inc, "_DRIVER_PROBE_MAX_KEYS", 0)
    inc._bloom_maybe_keys(spark, state, meta, keys, "__ch").collect()
    monkeypatch.setattr(inc, "_DRIVER_PROBE_MAX_KEYS", 2_000_000)
    inc._bloom_maybe_keys(spark, state, meta, empty, "__ch").collect()
    # and the default driver branch for completeness
    inc._bloom_maybe_keys(spark, state, meta, keys, "__ch").collect()
    assert persisted_rdd_census(spark)[0] == base


def test_bloom_fpp_gate_trips_and_compaction_restores(spark, tmp_path):
    """The sidecar re-size gate (r11 verdict #6): an increment that blows
    far past init capacity degrades the realized fpp (recorded per
    increment as fill_ratio/fpp_estimate); bloom_needs_compaction trips,
    and compact_prep_state — which re-sizes the filters to current log
    counts — restores the design target."""
    from exstream_implementation_spark.incremental import (
        bloom_needs_compaction,
        compact_prep_state,
        describe_prep_state,
    )

    b1, _, _ = _batches(spark)
    state = str(tmp_path / "state")
    init_prep_state(b1, state, benchmark=_bench(spark), cfg=CFG)
    st0 = read_state(state)
    assert bloom_needs_compaction(st0) == {}  # healthy at init
    assert st0["bloom"]["logs"]["anchors"]["fpp_estimate"] is not None

    # ~100k distinct anchors into a capacity-1000 (one-chunk) filter:
    # 60 docs × ~240 words of unique tokens, stopwords interleaved so the
    # quality gate keeps them
    stops = ["the", "a", "and", "of", "is", "to", "in", "on"]
    rows = []
    for i in range(60):
        words = []
        for j in range(120):
            words += [f"q{i}x{j}r{(i * 7 + j) % 97}", stops[j % len(stops)]]
        rows.append((100 + i, " ".join(words), "srcB"))
    big = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    s = prepare_increment(big, state, benchmark=_bench(spark))
    assert "anchors" in s["bloom_health"]  # surfaced with the stage dict
    st1 = read_state(state)
    over = bloom_needs_compaction(st1)
    assert "anchors" in over
    assert over["anchors"]["fpp_estimate"] > 5 * st1["bloom"]["fpp"]
    assert describe_prep_state(spark, state)["bloom"]["needs_compaction"]

    st2 = compact_prep_state(spark, state)
    assert bloom_needs_compaction(st2) == {}
    m_new = st2["bloom"]["logs"]["anchors"]
    assert m_new["m_bits"] > st1["bloom"]["logs"]["anchors"]["m_bits"]
    assert m_new["fpp_estimate"] <= 5 * st2["bloom"]["fpp"]
