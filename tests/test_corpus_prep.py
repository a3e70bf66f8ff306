"""End-to-end corpus preparation (corpus_prep.py): every stage's contract
holds THROUGH the composition — quality gate, exact dedup keep-min,
substring boilerplate removal, decontamination, token conservation from
tokenizer to packed shards, capacity respect, and a deterministic,
read-back-verified shard export."""

import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.corpus_prep import (

    CorpusPrepConfig,
    prepare_corpus,
)

# >60 s integration suite: excluded from the quick tier (README "Run")
pytestmark = pytest.mark.slow

STOPFUL = "the a and of is to in on"  # guarantees the stop-ratio gate


def _corpus(spark):
    boiler = "subscribe to the newsletter and follow of is updates daily"
    rows = [
        # 0/1: exact duplicates after normalization (keep doc 0)
        (0, f"{STOPFUL} alpha beta gamma delta epsilon zeta eta theta"),
        (1, f"{STOPFUL}  alpha beta gamma delta epsilon zeta eta theta "),
        # 2: unique but carries the boilerplate sentence (also in 3)
        (2, f"{STOPFUL} unique prose about rivers {boiler} more rivers"),
        (3, f"{STOPFUL} mountain text here {boiler} further mountains"),
        # 4: contaminated — contains the benchmark 3-gram run
        (4, f"{STOPFUL} casual words then secret eval answer here now ok"),
        # 5: too short — fails min_tokens
        (5, "tiny doc"),
        # 6: long but zero stop words — fails stop ratio
        (6, " ".join(f"w{i}" for i in range(30))),
        # 7: clean survivor
        (7, f"{STOPFUL} calm ordinary writing that survives every stage"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bench(spark):
    return spark.createDataFrame(
        [(0, "secret eval answer here")], "qid long, text string"
    )


CFG = CorpusPrepConfig(
    min_tokens=8,
    min_stop_ratio=0.1,
    substring_k=12,
    substring_mod=None,  # tiny docs: exact witnesses
    bpe_merges=12,
    chunk_len=8,
    pack_capacity=16,
    pack_groups=4,
    n_shards=3,
)


@pytest.fixture(scope="module")
def prepped(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("prep") / "shards")
    docs = _corpus(spark)
    stages = prepare_corpus(
        docs, benchmark=_bench(spark), cfg=CFG, out_path=out, counts=True
    )
    return docs, stages, out


def test_stage_filters(prepped):
    _, stages, _ = prepped
    surv = lambda st: {  # noqa: E731
        r["doc_id"] for r in stages[st].select("doc_id").collect()
    }
    assert surv("quality") == {0, 1, 2, 3, 4, 7}  # 5 short, 6 stopless
    assert surv("deduped") == {0, 2, 3, 4, 7}  # 1 is 0's normalized dup
    assert surv("decontaminated") == {0, 2, 3, 7}  # 4 hits the benchmark
    # boilerplate removed from doc 3 (doc 2 holds the first occurrence)
    texts = {
        r["doc_id"]: r["text"] for r in stages["despanned"].collect()
    }
    assert "subscribe" in texts[2] and "subscribe" not in texts[3]


def test_token_conservation_and_capacity(prepped):
    _, stages, _ = prepped
    n_doc_toks = stages["tokenized"].agg(F.sum("n_bpe")).collect()[0][0]
    n_chunk_toks = stages["chunks"].agg(F.sum("n_toks")).collect()[0][0]
    seqs = stages["sequences"].collect()
    n_seq_toks = sum(len(r["toks"]) for r in seqs)
    assert n_doc_toks == n_chunk_toks == n_seq_toks > 0
    for r in seqs:
        assert len(r["toks"]) <= CFG.pack_capacity
        assert r["seq_fill"] == len(r["toks"])
    # tokens re-spell the surviving text exactly (round-trip through
    # train → encode → chunk → pack → assemble)
    doc_text = {
        r["doc_id"]: r["text"]
        for r in stages["decontaminated"].collect()
    }
    joined = "".join(
        "".join(r["toks"]) for r in sorted(seqs, key=lambda r: (r["pack_group"], r["seq_id"]))
    )
    # multiset of characters is conserved (order interleaves across docs;
    # each word's </w> marker maps back to the single space it replaced)
    from collections import Counter

    exp = Counter(
        c
        for t in doc_text.values()
        for c in " ".join(t.lower().split()) + " "
    )
    got = Counter(joined.replace("</w>", " "))
    assert got == exp


def test_shard_export_reads_back(prepped, spark):
    _, stages, out = prepped
    back = spark.read.parquet(out)
    seqs = stages["sequences"]
    assert back.count() == seqs.count()
    # every sequence appears exactly once, with its token payload intact
    a = seqs.select(
        "pack_group", "seq_id", F.col("toks").alias("t1")
    )
    b = back.select(
        "pack_group", "seq_id", F.col("toks").alias("t2")
    )
    j = a.join(b, ["pack_group", "seq_id"])
    assert j.count() == seqs.count()
    assert j.filter(F.col("t1") != F.col("t2")).count() == 0
    # shards span the configured range
    shards = {r["shard"] for r in back.select("shard").distinct().collect()}
    assert shards <= set(range(CFG.n_shards)) and len(shards) >= 1


def test_deterministic(prepped, spark):
    docs, stages, _ = prepped
    again = prepare_corpus(docs, benchmark=_bench(spark), cfg=CFG)
    assert again["merges"] == stages["merges"]
    s1 = stages["sequences"].select("pack_group", "seq_id", "toks")
    s2 = again["sequences"].select("pack_group", "seq_id", "toks")
    assert s1.exceptAll(s2).isEmpty() and s2.exceptAll(s1).isEmpty()


def test_lm_gate_drops_implausible_order(spark):
    import dataclasses

    # doc 8: the same vocabulary as the survivors but in scrambled order —
    # passes length/stop-ratio/dedup, fails only the LM gate
    base = _corpus(spark)
    scrambled = (
        8,
        f"ordinary that and calm writing every survives stage the {STOPFUL.split()[0]} of is",
    )
    docs = base.union(
        spark.createDataFrame([scrambled], "doc_id long, text string")
    )
    loose = dataclasses.replace(CFG, max_lm_nll=None)
    stages_off = prepare_corpus(docs, cfg=loose)
    ids_off = {
        r["doc_id"]
        for r in stages_off["lm_filtered"].select("doc_id").collect()
    }
    assert 8 in ids_off  # gate off: scrambled doc survives
    # pick a threshold from the gate-off score distribution: keep docs at
    # or below the survivors' max, which the scrambled doc exceeds
    from exstream_implementation_spark.plans.lm import (
        score_lm_nll,
        train_bigram_lm,
    )

    scored = score_lm_nll(
        stages_off["lm_filtered"],
        train_bigram_lm(stages_off["lm_filtered"]),
    )
    nll = {r["doc_id"]: r["lm_nll"] for r in scored.collect()}
    cut = max(v for k, v in nll.items() if k != 8)
    assert nll[8] > cut
    tight = dataclasses.replace(CFG, max_lm_nll=(cut + nll[8]) / 2)
    stages_on = prepare_corpus(docs, cfg=tight)
    ids_on = {
        r["doc_id"]
        for r in stages_on["lm_filtered"].select("doc_id").collect()
    }
    assert ids_on == ids_off - {8}


def test_clf_gate_drops_learned_junk(spark):
    """A digit-salad doc passes every SURFACE gate (stopful, long enough)
    but the learned classifier (operators/logreg.py) drops it — and only
    it — when quality_model is set."""
    import dataclasses

    from exstream_implementation_spark.operators.logreg import (
        doc_quality_features,
        fit_logreg,
    )

    junky = (
        9,
        f"{STOPFUL} x9 88 71 qq3 9z 83 k2 77 z8 19 q4 44 x2 91 z0 55",
    )
    docs = _corpus(spark).union(
        spark.createDataFrame([junky], "doc_id long, text string")
    )
    # weak labels: clean prose positives vs digit-salad negatives
    pos = [(i, f"{STOPFUL} plain sensible words flow here number {i}")
           for i in range(20)]
    neg = [(100 + i, f"{STOPFUL} 9{i} 8{i} z{i} 7{i} k{i} 3{i} q{i} 5{i}")
           for i in range(20)]
    train = spark.createDataFrame(pos + neg, "doc_id long, text string")
    train = train.withColumn(
        "label", (F.col("doc_id") < 100).cast("int")
    )
    model = fit_logreg(
        doc_quality_features(train).select("features", "label"), l2=1e-3
    )
    stages_off = prepare_corpus(docs, cfg=CFG)
    ids_off = {
        r["doc_id"]
        for r in stages_off["clf_filtered"].select("doc_id").collect()
    }
    assert 9 in ids_off  # survives every surface gate
    gated = dataclasses.replace(CFG, quality_model=model, min_p_good=0.5)
    stages_on = prepare_corpus(docs, cfg=gated)
    ids_on = {
        r["doc_id"]
        for r in stages_on["clf_filtered"].select("doc_id").collect()
    }
    assert ids_on == ids_off - {9}


def test_no_benchmark_skips_decontamination(spark):
    docs = _corpus(spark)
    stages = prepare_corpus(docs, cfg=CFG)
    ids = {
        r["doc_id"]
        for r in stages["decontaminated"].select("doc_id").collect()
    }
    assert 4 in ids  # nothing to decontaminate against


def test_split_aware_packing_never_mixes_splits(spark, tmp_path):
    """With split_weights set, every packed sequence draws chunks from
    exactly one split, sequences cover exactly the unsplit pipeline's
    chunks, and the export lands one shard tree per split."""
    import dataclasses
    import glob
    import os

    extra = [
        (20 + i,
         f"{STOPFUL} distinct essay number {i} on topic t{i} with words "
         f"like theme{i} and idea{i} flowing onward")
        for i in range(12)
    ]
    docs = _corpus(spark).union(
        spark.createDataFrame(extra, "doc_id long, text string")
    )
    weights = {"train": 0.7, "val": 0.3}
    # pick a seed where the surviving ids land in BOTH splits (the split
    # is a pure hash of (doc_id, seed), so this probe is cheap and exact)
    from exstream_implementation_spark.plans.splits import assign_splits

    ids = spark.createDataFrame(
        [(i,) for i in [0, 2, 3, 7] + [20 + i for i in range(12)]],
        "doc_id long",
    )
    seed = next(
        s for s in range(20)
        if len({
            r["split"]
            for r in assign_splits(ids, weights, unit_col="doc_id",
                                   salt=s).collect()
        }) == 2
    )
    out = str(tmp_path / "shards")
    cfg = dataclasses.replace(
        CFG, split_weights=weights, n_shards=2, seed=seed
    )
    stages = prepare_corpus(docs, benchmark=_bench(spark), cfg=cfg,
                            out_path=out)
    # each (split, pack_group, seq_id) sequence has docs of ONE split
    from exstream_implementation_spark.plans.splits import assign_splits

    doc_split = {
        r["doc_id"]: r["split"]
        for r in assign_splits(
            stages["chunks"].select("doc_id").distinct(),
            weights, unit_col="doc_id", salt=cfg.seed,
        ).collect()
    }
    assert len(set(doc_split.values())) == 2  # both splits populated
    a = stages["assignment"].collect()
    seq_splits = {}
    for r in a:
        key = (r["split"], r["pack_group"], r["seq_id"])
        seq_splits.setdefault(key, set()).add(doc_split[r["doc_id"]])
        assert doc_split[r["doc_id"]] == r["split"]
    assert all(len(v) == 1 for v in seq_splits.values())
    # chunk coverage identical to the unsplit pipeline
    plain = prepare_corpus(docs, benchmark=_bench(spark), cfg=CFG)
    want = {(r["doc_id"], r["chunk_idx"])
            for r in plain["assignment"].collect()}
    got = {(r["doc_id"], r["chunk_idx"]) for r in a}
    assert got == want
    # export: one shard tree per split (a tiny split may fill fewer
    # shards than configured — partitionBy writes non-empty ones only)
    for name in weights:
        shard_dirs = glob.glob(os.path.join(out, f"split={name}", "shard=*"))
        assert 1 <= len(shard_dirs) <= 2
    back = spark.read.parquet(out)
    assert back.count() == stages["sequences"].count()


def test_empty_split_still_reads_back(spark, tmp_path):
    """A split that receives zero docs must still export a schema-bearing
    tree: per-split AND root reads work, with consistent partition depth."""
    import dataclasses

    docs = _corpus(spark)
    # three-way split where one name is cut to ~0 probability: with only
    # a handful of surviving docs the 'never' split is empty by design
    weights = {"train": 0.999999, "val": 0.0000005, "never": 0.0000005}
    out = str(tmp_path / "shards")
    cfg = dataclasses.replace(CFG, split_weights=weights, n_shards=2)
    prepare_corpus(docs, benchmark=_bench(spark), cfg=cfg, out_path=out)
    for name in weights:
        sub = spark.read.parquet(f"{out}/split={name}")
        assert "toks" in sub.columns  # schema present even when empty
    root = spark.read.parquet(out)
    assert root.count() == root.filter(F.col("split") == "train").count()
    assert {r["split"] for r in root.select("split").distinct().collect()} == {
        "train"
    }


def test_compression_gate_drops_repetitive_doc(spark):
    """A stopful but heavily repeated doc passes every other gate (it is
    unique, stopword-rich, long enough) and is dropped only by the zlib
    compression-ratio gate."""
    import dataclasses

    spammy = (
        10,
        f"{STOPFUL} " + "the banner offer is a click to win " * 20,
    )
    docs = _corpus(spark).union(
        spark.createDataFrame([spammy], "doc_id long, text string")
    )
    # the doc is periodic, so any k <= its length yields within-doc
    # duplicate k-grams and despan would splice it away before the gate;
    # k beyond the doc length leaves it for the compression gate to catch
    cfg_off = dataclasses.replace(CFG, substring_k=2000)
    stages_off = prepare_corpus(docs, cfg=cfg_off)
    ids_off = {
        r["doc_id"]
        for r in stages_off["compress_filtered"].select("doc_id").collect()
    }
    assert 10 in ids_off
    from exstream_implementation_spark.operators.textstats import (
        compression_ratio,
    )

    ratios = {
        r["doc_id"]: r["compress_ratio"]
        for r in compression_ratio(
            stages_off["compress_filtered"]
        ).collect()
    }
    cut = min(v for k, v in ratios.items() if k != 10)
    assert ratios[10] < cut  # the spam doc compresses best by far
    cfg_on = dataclasses.replace(
        cfg_off, min_compress_ratio=(ratios[10] + cut) / 2
    )
    stages_on = prepare_corpus(docs, cfg=cfg_on)
    ids_on = {
        r["doc_id"]
        for r in stages_on["compress_filtered"].select("doc_id").collect()
    }
    assert ids_on == ids_off - {10}


def test_manifest_written_next_to_shards(prepped, spark):
    """The export carries a deterministic provenance manifest: full
    config, tokenizer merges, and stage counts (counts=True in the
    fixture)."""
    import json
    import os

    _, stages, out = prepped
    path = os.path.join(out, "_MANIFEST.json")
    assert os.path.exists(path)
    # the ACTUAL tmp name the atomic write uses (corpus_prep.py)
    assert not os.path.exists(os.path.join(out, ".manifest.json.tmp"))
    with open(path) as fh:
        m = json.load(fh)
    assert m["config"]["chunk_len"] == CFG.chunk_len
    assert m["config"]["n_shards"] == CFG.n_shards
    assert "quality_model" not in m["config"]
    assert m["has_quality_model"] is False
    assert [tuple(x) for x in m["bpe_merges"]] == stages["merges"]
    assert m["splits"] is None
    sc = m["stage_counts"]
    assert sc["quality"] == 6 and sc["decontaminated"] == 4
    assert sc["sequences"] == stages["sequences"].count()
    # all gate stages carried, and == the returned dict (one counting)
    for k in ("lm_filtered", "clf_filtered", "compress_filtered",
              "tokenized", "chunks"):
        assert sc[k] == stages["stage_counts"][k]
    assert sc == stages["stage_counts"]


def test_compression_gate_passes_undefined_ratio(spark):
    """A doc despanned to EMPTY text has an undefined compression ratio;
    enabling the gate must not change its fate (NULL passes through)."""
    import dataclasses

    boiler = "subscribe to the newsletter and follow of is updates daily"
    docs = _corpus(spark).union(
        spark.createDataFrame(
            [(11, boiler)], "doc_id long, text string"
        )
    )
    cfg = dataclasses.replace(CFG, min_compress_ratio=0.5)
    stages = prepare_corpus(docs, cfg=cfg)
    texts = {
        r["doc_id"]: r["text"] for r in stages["despanned"].collect()
    }
    assert texts[11].strip() == ""  # whole doc was doc 2's boilerplate
    ids = {
        r["doc_id"]
        for r in stages["compress_filtered"].select("doc_id").collect()
    }
    assert 11 in ids  # undefined ratio: kept, same as with the gate off


def test_mix_stage_samples_by_source(spark):
    """With mix_fractions set, the mix stage keeps full-fraction sources
    whole and drops unlisted sources; mutually-exclusive config and
    missing target validated; default path leaves the stage identity."""
    import dataclasses

    docs = _corpus(spark).withColumn(
        "source", F.when(F.col("doc_id") < 4, "web").otherwise("wiki")
    )
    cfg = dataclasses.replace(CFG, mix_fractions={"web": 1.0})
    stages = prepare_corpus(docs, benchmark=_bench(spark), cfg=cfg)
    pre = {
        r["doc_id"]
        for r in stages["compress_filtered"].select("doc_id").collect()
    }
    mixed = {r["doc_id"] for r in stages["mixed"].select("doc_id").collect()}
    assert mixed == {d for d in pre if d < 4}  # wiki unlisted: dropped
    # identity when off
    off = prepare_corpus(docs, benchmark=_bench(spark), cfg=CFG)
    assert {
        r["doc_id"] for r in off["mixed"].select("doc_id").collect()
    } == {
        r["doc_id"]
        for r in off["compress_filtered"].select("doc_id").collect()
    }
    with pytest.raises(ValueError, match="not both"):
        prepare_corpus(
            docs,
            cfg=dataclasses.replace(
                CFG, mix_fractions={"web": 1.0}, mix_tau=0.5,
                mix_target_rows=4,
            ),
        )
    with pytest.raises(ValueError, match="mix_target_rows"):
        prepare_corpus(docs, cfg=dataclasses.replace(CFG, mix_tau=0.5))
    # τ flavor: derives fractions from surviving sizes and keeps a subset
    tau_cfg = dataclasses.replace(CFG, mix_tau=1.0, mix_target_rows=2)
    t_stages = prepare_corpus(docs, benchmark=_bench(spark), cfg=tau_cfg)
    assert t_stages["mixed"].count() <= len(pre)


def test_mix_salt_decorrelated_from_split(spark, tmp_path):
    """STRING doc ids hash identically in sample_mix and assign_splits;
    with equal salts every kept row would land in 'train'.  The prep
    derives a distinct mix salt, so kept rows span both splits, and the
    tau policy (fractions/epochs/sizes) lands in the manifest."""
    import dataclasses
    import json
    import os

    rows = [
        (f"doc{i:04d}",
         f"{STOPFUL} distinct prose number {i} about topic t{i % 7} "
         f"with words theme{i} and idea{i} flowing onward")
        for i in range(120)
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    docs = docs.withColumn(
        "source", F.when(F.length("doc_id") > 0, "web")
    )
    out = str(tmp_path / "shards")
    cfg = dataclasses.replace(
        CFG,
        mix_tau=1.0,
        mix_target_rows=60,  # keep ~half
        split_weights={"train": 0.5, "val": 0.5},
        n_shards=2,
    )
    stages = prepare_corpus(docs, cfg=cfg, out_path=out)
    kept = stages["mixed"].count()
    assert 0 < kept < 120
    policy = stages["mix_policy"]
    assert set(policy) == {"fractions", "epochs", "sizes"}
    assert policy["fractions"]["web"] == pytest.approx(60 / 120, abs=0.01)
    # kept rows must span BOTH splits (equal salts would collapse to one)
    from exstream_implementation_spark.plans.splits import assign_splits

    splits = {
        r["split"]
        for r in assign_splits(
            stages["mixed"].select("doc_id"),
            cfg.split_weights, unit_col="doc_id", salt=cfg.seed,
        ).collect()
    }
    assert splits == {"train", "val"}
    with open(os.path.join(out, "_MANIFEST.json")) as fh:
        m = json.load(fh)
    assert m["mix_policy"]["fractions"]["web"] == policy["fractions"]["web"]
    assert "epochs" in m["mix_policy"]


def test_max_per_source_cap(spark):
    import dataclasses

    rows = [
        (i, f"{STOPFUL} document number {i} with enough ordinary words", "A")
        for i in range(6)
    ] + [
        (10 + i, f"{STOPFUL} other corpus item {i} plain readable text", "B")
        for i in range(2)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    cfg = dataclasses.replace(CFG, max_per_source=3)
    stages = prepare_corpus(docs, cfg=cfg)
    capped = {r["doc_id"] for r in stages["capped"].select("doc_id").collect()}
    # 3 smallest doc_ids of A survive; B is under the cap and keeps both
    assert capped == {0, 1, 2, 10, 11}
    # with the cap off the stage is a pass-through
    off = prepare_corpus(docs, cfg=CFG)
    assert off["capped"].count() == off["compress_filtered"].count() == 8


def test_drop_audit_names_the_dropping_stage(prepped, spark):
    from exstream_implementation_spark import cache
    from exstream_implementation_spark.corpus_prep import drop_audit

    docs, stages, _ = prepped
    fate = {
        r["doc_id"]: r["dropped_at"]
        for r in drop_audit(stages, docs).collect()
    }
    # one verdict per INPUT doc, no duplicates lost to the union
    assert len(fate) == docs.count()
    assert fate == {
        0: "kept",
        1: "deduped",
        2: "kept",
        3: "kept",
        4: "decontaminated",
        5: "quality",
        6: "quality",
        7: "kept",
    }
    # the audit's pins are tracked and fully releasable
    assert cache.release_tracked() > 0


def test_contract_stage_quarantines_malformed_inputs(spark):
    import dataclasses

    from exstream_implementation_spark.corpus_prep import drop_audit
    from exstream_implementation_spark.operators.expectations import (
        not_null,
        satisfies,
    )

    rows = [
        (0, f"{STOPFUL} perfectly ordinary surviving document text here"),
        (None, f"{STOPFUL} has words but no identity"),
        (2, None),
        (3, f"{STOPFUL} another ordinary surviving document right here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = dataclasses.replace(
        CFG,
        contract_checks=(not_null("doc_id"), satisfies("text IS NOT NULL")),
    )
    stages = prepare_corpus(docs, cfg=cfg)
    q = {
        tuple(sorted(r["violations"]))
        for r in stages["contract_quarantine"].collect()
    }
    assert q == {
        ("not_null(doc_id)",),
        ("satisfies(text IS NOT NULL)",),
    }
    surv = {r["doc_id"] for r in stages["contracted"].collect()}
    assert surv == {0, 3}
    # the audit attributes contract drops to the first stage
    fate = {
        r["doc_id"]: r["dropped_at"]
        for r in drop_audit(stages, docs).collect()
    }
    assert fate[2] == "contracted" and fate[0] == "kept"


def test_weighted_cap_prefers_heavy_docs_and_respects_quota(spark):
    import dataclasses

    rows = [
        (
            i,
            f"{STOPFUL} document number {i} with enough ordinary words",
            "A",
            1000.0 if i < 3 else 0.001,
        )
        for i in range(6)
    ] + [
        (
            10 + i,
            f"{STOPFUL} other corpus item {i} plain readable text",
            "B",
            1.0,
        )
        for i in range(2)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, q double"
    )
    cfg = dataclasses.replace(CFG, max_per_source=3, cap_weight_col="q")
    stages = prepare_corpus(docs, cfg=cfg)
    capped = {r["doc_id"] for r in stages["capped"].select("doc_id").collect()}
    # quota holds: 3 of A's 6, both of B (under quota)
    assert len(capped) == 5 and {10, 11} <= capped
    # with a 10^6 weight ratio the heavy docs win overwhelmingly; the
    # fixed seed makes this one draw deterministic, and it's the
    # proportionality law (pinned statistically in test_curation_ops)
    # that makes the outcome {0,1,2} rather than the smallest ids
    assert capped - {10, 11} == {0, 1, 2}
    # a zero/NULL-weight doc can never survive the cap
    cfg2 = dataclasses.replace(cfg, max_per_source=10)
    docs2 = docs.withColumn(
        "q", F.when(F.col("doc_id") == 0, 0.0).otherwise(F.col("q"))
    )
    capped2 = {
        r["doc_id"]
        for r in prepare_corpus(docs2, cfg=cfg2)["capped"]
        .select("doc_id")
        .collect()
    }
    assert 0 not in capped2


def test_decontaminate_bloom_arm_keeps_identical_set(spark):
    import dataclasses

    from exstream_implementation_spark.corpus_prep import drop_contaminated

    docs = spark.createDataFrame(
        [
            (i, f"{STOPFUL} document number {i} with enough ordinary words",
             "A")
            for i in range(8)
        ],
        "doc_id long, text string, source string",
    )
    bench = docs.filter(F.col("doc_id") == 3).select("text")
    exact = {
        r["doc_id"]
        for r in drop_contaminated(docs, bench, 0.3).select("doc_id").collect()
    }
    bloomed = {
        r["doc_id"]
        for r in drop_contaminated(docs, bench, 0.3, bloom_fpp=0.01)
        .select("doc_id")
        .collect()
    }
    assert bloomed == exact
    # and through the pipeline config knob
    cfg = dataclasses.replace(CFG, decontam_bloom_fpp=0.01)
    via_cfg = {
        r["doc_id"]
        for r in prepare_corpus(docs, benchmark=bench, cfg=cfg)[
            "decontaminated"
        ]
        .select("doc_id")
        .collect()
    }
    via_exact = {
        r["doc_id"]
        for r in prepare_corpus(docs, benchmark=bench, cfg=CFG)[
            "decontaminated"
        ]
        .select("doc_id")
        .collect()
    }
    assert via_cfg == via_exact


def test_weighted_cap_without_quota_fails_loudly(spark):
    import dataclasses

    docs = spark.createDataFrame(
        [(0, "x", "A", 1.0)], "doc_id long, text string, source string, q double"
    )
    cfg = dataclasses.replace(CFG, cap_weight_col="q")  # no max_per_source
    with pytest.raises(ValueError, match="cap_weight_col requires"):
        prepare_corpus(docs, cfg=cfg)
