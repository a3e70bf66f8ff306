"""Streaming-ingest dedup tests: the per-row SimHash must be bit-identical to
the batch dedup_simhash bands, and every stream transform must reproduce its
batch twin under an availableNow full replay (unified-API parity)."""

import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.plans.dedup import dedup_simhash
from exstream_implementation_spark.sources import load_table
from exstream_implementation_spark.streaming.ingest_dedup import (

    corpus_simhash_index,
    documents_stream,
    stream_exact_dedup,
    stream_neardup_vs_corpus,
    with_content_hashes,
    with_event_time,
    with_simhash_bands,
)

# >60 s integration suite: excluded from the quick tier (README "Run")
pytestmark = pytest.mark.slow

SF_DIR = "/root/testdata/sf0.001"


def run_stream_to_memory(sdf, name, output_mode="append"):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination returns False (no raise) on timeout — assert it so a
    # slow run fails loudly instead of reading a half-populated sink
    assert q.awaitTermination(300), f"stream {name} did not drain in 300s"
    return sdf.sparkSession.table(name)


def _py_simhash_bands(text: str) -> tuple:
    """Independent pure-Python SimHash oracle (same spec: distinct
    whitespace tokens of lower(text); bit g from md5 hex chars 1-8 (g<32)
    resp. 9-16; band b bit j set iff vote sum of bit 16b+j > 0).

    The split is the ASCII class [ \\t\\n\\x0b\\f\\r] — Java's regex \\s,
    which is what Spark's split uses — NOT Python's Unicode-aware \\s
    (U+00A0 etc. are token characters to the engine, and must be here too)."""
    import hashlib
    import re

    votes = [0] * 64
    for tok in set(re.split(r"[ \t\n\x0b\f\r]+", text.lower())):
        h = hashlib.md5(tok.encode()).hexdigest()
        lo, hi = int(h[:8], 16), int(h[8:16], 16)
        for g in range(64):
            bit = ((lo if g < 32 else hi) >> (g % 32)) & 1
            votes[g] += 1 if bit else -1
    bands = []
    for b in range(4):
        v = 0
        for j in range(16):
            if votes[16 * b + j] > 0:
                v |= 1 << j
        bands.append(v)
    return tuple(bands)


def test_perrow_simhash_matches_python_oracle(spark):
    """The fold-based per-row SimHash must match an independent pure-Python
    implementation bit-for-bit (dedup_simhash itself now uses the fold, so
    this — plus the DuckDB explode-based oracle in the catalog gate — is the
    independent parity anchor)."""
    docs = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 60)
    got = {
        r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in with_simhash_bands(docs)
        .select("doc_id", "b0", "b1", "b2", "b3")
        .collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    assert len(got) == 60
    for doc_id, text in texts.items():
        assert got[doc_id] == _py_simhash_bands(text), doc_id


def test_perrow_simhash_property_random_texts(spark):
    """Hypothesis-style sweep over adversarial text shapes (single token,
    repeated tokens, mixed case, leading/trailing/multiple whitespace,
    unicode) — the fold must match the pure-Python oracle on every one."""
    from hypothesis import given, settings, strategies as st

    # includes U+00A0 (no-break space): a token character to the engine's
    # ASCII-\s split — the oracle must agree, not split on it
    token = st.text(
        alphabet=st.characters(
            whitelist_categories=("Ll", "Lu", "Nd"),
            whitelist_characters="\u00a0",
            max_codepoint=0x24F,
        ),
        min_size=1,
        max_size=8,
    )
    texts = st.lists(token, min_size=1, max_size=12).map(" ".join)

    @settings(max_examples=25, deadline=None)
    @given(st.lists(texts, min_size=1, max_size=6))
    def check(batch):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(batch)], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
            for r in with_simhash_bands(df).collect()
        }
        for i, t in enumerate(batch):
            assert got[i] == _py_simhash_bands(t), repr(t)

    check()


def test_catalog_simhash_uses_perrow_fold(spark):
    """dedup_simhash must carry no per-token explode+groupBy: its only
    aggregation work is the fold expression, so the plan is shuffle-free up
    to the (optional) parallel-load repartition."""
    plan = (
        dedup_simhash(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "HashAggregate" not in plan and "Generate" not in plan


def test_perrow_simhash_plan_has_no_shuffle(spark):
    """The per-row formulation must stay map-side: no Exchange in the plan
    below the scan (that is the whole point of the fold)."""
    docs = load_table(spark, SF_DIR, "documents")
    plan = with_simhash_bands(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


@pytest.fixture()
def doc_dir_with_dups(spark, tmp_path):
    """Two parquet files of documents where batch 2 re-sends some of batch 1's
    content under new doc_ids (the re-arrival a streaming dedup must drop)."""
    src = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "text", "lang", "source", "n_chars")
    )
    out = str(tmp_path / "docs_stream")
    src.filter(F.col("doc_id") < 30).coalesce(1).write.mode(
        "overwrite"
    ).parquet(out)
    dups = (
        src.filter(F.col("doc_id") < 10)
        .withColumn("doc_id", F.col("doc_id") + 1000)
    )
    fresh = src.filter((F.col("doc_id") >= 30) & (F.col("doc_id") < 40))
    dups.unionByName(fresh).coalesce(1).write.mode("append").parquet(out)
    return out


def test_stream_exact_dedup_drops_rearrivals(spark, doc_dir_with_dups):
    # one file per trigger: the originals' file drains in an earlier
    # microbatch than the re-send file, so state admits originals first —
    # within a single batch the operator keeps the first row in PROCESSING
    # order (task/shuffle order, not event time), which would make the
    # survivor-identity assertion racy
    stream = with_event_time(
        documents_stream(spark, doc_dir_with_dups, max_files_per_trigger=1)
    )
    got = run_stream_to_memory(
        stream_exact_dedup(stream, watermark="1 hour").select(
            "doc_id", "norm_hash"
        ),
        "ingest_dedup_mem",
    )
    batch = with_content_hashes(
        spark.read.parquet(doc_dir_with_dups)
    )
    # one survivor per distinct normalized hash, none of them twice
    assert got.count() == batch.select("norm_hash").distinct().count()
    assert got.select("norm_hash").distinct().count() == got.count()
    # every re-sent duplicate (doc_id >= 1000) lost to its batch-1 original
    assert got.filter(F.col("doc_id") >= 1000).count() == 0


def test_stream_neardup_flags_match_batch(spark, tmp_path):
    """Stream-static band join: an arriving exact copy of a corpus doc must
    flag (Hamming 0); a novel doc must not; availableNow == batch."""
    corpus = corpus_simhash_index(spark, SF_DIR).persist()
    copies = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id").isin([3, 7, 11]))
        .withColumn("doc_id", F.col("doc_id") + 5000)
    )
    novel = spark.createDataFrame(
        [(9000, "zqx wvut entirely unseen token salad mplk", "en", "syn", 41)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    arriving = copies.unionByName(novel)
    out = str(tmp_path / "arriving")
    arriving.coalesce(1).write.mode("overwrite").parquet(out)

    batch_flags = stream_neardup_vs_corpus(
        with_event_time(arriving), corpus
    )
    stream_flags = run_stream_to_memory(
        stream_neardup_vs_corpus(
            with_event_time(documents_stream(spark, out)), corpus
        ),
        "neardup_mem",
    )
    cols = ["doc_id", "corpus_doc_id", "hamming"]
    got_b = {tuple(r) for r in batch_flags.select(*cols).collect()}
    got_s = {tuple(r) for r in stream_flags.select(*cols).collect()}
    assert got_s == got_b
    # each copy flags its original at distance 0
    for orig in (3, 7, 11):
        assert (orig + 5000, orig, 0) in got_s
    # the novel doc matches nothing
    assert not any(d == 9000 for d, _, _ in got_s)
    corpus.unpersist()


# --- banded MinHash arm ------------------------------------------------------
def test_perrow_minhash_matches_batch_fold(spark):
    """with_minhash_signature (array_min fold, shuffle-free) must reproduce
    the batch explode+groupBy signature of dedup_minhash_lsh bit-for-bit."""
    from exstream_implementation_spark.plans.dedup import N_MINHASH, _doc_grams
    from exstream_implementation_spark.streaming.ingest_dedup import (
        with_minhash_signature,
    )

    docs = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 80)
    got = {
        r["doc_id"]: tuple(r[f"h{i}"] for i in range(N_MINHASH))
        for r in with_minhash_signature(docs).collect()
    }
    grams = _doc_grams(spark, SF_DIR).filter(F.col("doc_id") < 80)
    e = grams.select("doc_id", F.explode("grams").alias("gram"))
    sig = (
        e.withColumn(
            "mh", F.concat(F.md5("gram"), F.md5(F.concat(F.lit("x"), "gram")))
        )
        .groupBy("doc_id")
        .agg(
            *[
                F.expr(
                    f"min(cast(conv(substr(mh, {1 + 8 * i}, 8), 16, 10)"
                    " as bigint))"
                ).alias(f"h{i}")
                for i in range(N_MINHASH)
            ]
        )
    )
    want = {
        r["doc_id"]: tuple(r[f"h{i}"] for i in range(N_MINHASH))
        for r in sig.collect()
    }
    # every doc with shingles matches the batch fold exactly; shingle-less
    # docs (absent from the batch groupBy) carry NULL lanes per-row
    assert set(want) <= set(got)
    for did, lanes in want.items():
        assert got[did] == lanes, did
    for did in set(got) - set(want):
        assert got[did] == (None,) * N_MINHASH


def test_perrow_minhash_plan_has_no_shuffle(spark):
    from exstream_implementation_spark.streaming.ingest_dedup import (
        with_minhash_signature,
    )

    docs = load_table(spark, SF_DIR, "documents")
    plan = (
        with_minhash_signature(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Generate" not in plan


def test_stream_minhash_flags_match_batch(spark, tmp_path):
    """Banded-MinHash stream-static arm: an exact copy of a corpus doc flags
    at est_jaccard 1.0; a novel doc does not; availableNow == batch."""
    from exstream_implementation_spark.streaming.ingest_dedup import (
        corpus_minhash_index,
        stream_minhash_vs_corpus,
    )

    corpus = corpus_minhash_index(spark, SF_DIR).persist()
    copies = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id").isin([2, 9, 17]))
        .withColumn("doc_id", F.col("doc_id") + 7000)
    )
    novel = spark.createDataFrame(
        [
            (
                9100,
                "qqz wvx unseen salad of tokens nobody shingled before xyzzy",
                "en",
                "syn",
                59,
            )
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    arriving = copies.unionByName(novel)
    out = str(tmp_path / "arriving_mh")
    arriving.coalesce(1).write.mode("overwrite").parquet(out)

    batch_flags = stream_minhash_vs_corpus(with_event_time(arriving), corpus)
    stream_flags = run_stream_to_memory(
        stream_minhash_vs_corpus(
            with_event_time(documents_stream(spark, out)), corpus
        ),
        "minhash_mem",
    )
    cols = ["doc_id", "corpus_doc_id", "est_jaccard"]
    got_b = {tuple(r) for r in batch_flags.select(*cols).collect()}
    got_s = {tuple(r) for r in stream_flags.select(*cols).collect()}
    assert got_s == got_b
    for orig in (2, 9, 17):
        assert (orig + 7000, orig, 1.0) in got_s
    assert not any(d == 9100 for d, _, _ in got_s)
    corpus.unpersist()


def test_stream_dedup_late_row_policy(spark, tmp_path):
    """Pin the watermark policy of the exact-dedup stage (empirically
    verified): a LATE row (event time behind the watermark) is still
    ADMITTED when no state entry matches — dropDuplicatesWithinWatermark is
    state-bound best-effort, and the module contract sends cross-horizon
    re-arrivals to the periodic batch pass; duplicates whose state is still
    live are dropped."""
    import time as _time

    d = str(tmp_path / "late_docs")

    def w(rows):
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, "
            "n_chars long, event_time string"
        ).withColumn("event_time", F.to_timestamp("event_time")).coalesce(
            1
        ).write.mode("append").parquet(d)

    w(
        [
            (1, "alpha body", "en", "s", 10, "2024-01-01 10:00:00"),
            (2, "clock body", "en", "s", 10, "2024-01-01 20:00:00"),
        ]
    )
    _time.sleep(1.5)  # distinct mtimes → deterministic file->batch order
    w(
        [
            (3, "late fresh body", "en", "s", 15, "2024-01-01 10:30:00"),
            (4, "alpha body", "en", "s", 10, "2024-01-01 20:06:00"),
        ]
    )
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, "
            "n_chars long, event_time timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = run_stream_to_memory(
        stream_exact_dedup(stream, watermark="1 hour").select("doc_id"),
        "late_policy_mem",
    )
    ids = {r["doc_id"] for r in got.collect()}
    # batch 1 on-time rows admitted; late-but-novel doc 3 admitted (policy:
    # state-bound, not event-time-gated); duplicate doc 4 dropped while the
    # 'alpha body' state entry is live
    assert ids == {1, 2, 3}


def test_refreshing_ingest_flags_post_snapshot_duplicate(spark, tmp_path):
    """The r07 correctness hole: a duplicate arriving AFTER the corpus index
    snapshot must still flag.  Here the index starts EMPTY; a doc admitted in
    microbatch 0 must flag its near-copy arriving two batches later (k=2) on
    BOTH band arms, exact re-sends must be dropped by the persistent-corpus
    dedup, and generic index rows must match the sf-bound builders."""
    import time as _time

    from exstream_implementation_spark.streaming.ingest_dedup import (
        DOCUMENTS_SCHEMA,
        init_neardup_corpus,
        neardup_index_is_stale,
        refresh_neardup_tables,
        simhash_index_rows,
        start_refreshing_ingest,
    )

    base_text = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") == 5)
        .first()["text"]
    )
    d = str(tmp_path / "refr_docs")

    def w(rows):
        spark.createDataFrame(rows, DOCUMENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        _time.sleep(1.2)  # distinct mtimes → deterministic file->batch order

    # the near-copy re-appends a token the doc already contains: its DISTINCT
    # token set (SimHash input) is unchanged — Hamming 0 — while the
    # normalized content hash differs, so exact dedup admits it
    near_copy = base_text + " " + base_text.split()[-1]
    w([(1, base_text, "en", "s", len(base_text))])                 # batch 0
    w([(2, "totally unrelated qqzz filler body wvut", "en", "s", 38)])  # 1
    w(
        [
            (3, near_copy, "en", "s", len(near_copy)),               # near-copy
            (4, base_text, "en", "s", len(base_text)),               # exact re-send
            (5, "other novel mnop content qrst", "en", "s", 29),
        ]
    )                                                               # batch 2

    name = "refr_ingest_t"
    init_neardup_corpus(spark, name)
    assert not neardup_index_is_stale(spark, name)  # empty == baseline
    q = start_refreshing_ingest(
        with_event_time(documents_stream(spark, d, max_files_per_trigger=1)),
        name,
        str(tmp_path / "refr_ckpt"),
    )
    assert q.awaitTermination(300), "refreshing ingest did not drain"
    refresh_neardup_tables(spark, name)  # foreachBatch wrote from a cloned session

    admitted = {r["doc_id"] for r in spark.table(f"{name}_admitted").collect()}
    assert admitted == {1, 2, 3, 5}  # 4 (exact re-send) dropped cross-batch

    sh = {
        (r["doc_id"], r["corpus_doc_id"]): r["batch_id"]
        for r in spark.table(f"{name}_sh_flags").collect()
    }
    mh = {
        (r["doc_id"], r["corpus_doc_id"]): r["batch_id"]
        for r in spark.table(f"{name}_mh_flags").collect()
    }
    # the near-copy flags the doc admitted two microbatches earlier
    assert (3, 1) in sh and sh[(3, 1)] == 2
    assert (3, 1) in mh and mh[(3, 1)] == 2
    # novel docs flag nothing
    assert not any(d_ in (2, 5) for d_, _ in sh)
    assert not any(d_ in (2, 5) for d_, _ in mh)

    # index grew with admissions; growth past the baseline trips the gate
    assert spark.table(f"{name}_sh_idx").select(
        "corpus_doc_id"
    ).distinct().count() == 4
    assert neardup_index_is_stale(spark, name)

    # generic row builders match the sf-bound corpus builders
    docs = load_table(spark, SF_DIR, "documents")
    a = {tuple(r) for r in simhash_index_rows(docs).collect()}
    b = {tuple(r) for r in corpus_simhash_index(spark, SF_DIR).collect()}
    assert a == b

    # compaction: pure layout rewrite — identical row sets, fewer files,
    # staleness baseline reset
    from exstream_implementation_spark.streaming.ingest_dedup import (
        compact_neardup_index,
    )

    import glob as _glob

    wh = "/root/repo/spark-warehouse"
    before_rows = {tuple(r) for r in spark.table(f"{name}_sh_idx").collect()}
    before_files = len(_glob.glob(f"{wh}/{name}_sh_idx/*.parquet"))
    counts = compact_neardup_index(spark, name)
    after_rows = {tuple(r) for r in spark.table(f"{name}_sh_idx").collect()}
    after_files = len(_glob.glob(f"{wh}/{name}_sh_idx/*.parquet"))
    assert after_rows == before_rows and counts["sh_idx"] == len(before_rows)
    assert after_files <= before_files
    assert not neardup_index_is_stale(spark, name)  # baseline reset


def test_ingest_pipeline_composition(spark, tmp_path):
    """The one-source/three-sink composition: admitted stream deduped, both
    flag arms fire on a re-sent near-copy, and stream == batch on all
    three outputs."""
    from exstream_implementation_spark.streaming.ingest_dedup import (
        corpus_minhash_index,
        ingest_pipeline,
    )

    sh_idx = corpus_simhash_index(spark, SF_DIR).persist()
    mh_idx = corpus_minhash_index(spark, SF_DIR).persist()
    copies = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id").isin([4, 13]))
        .withColumn("doc_id", F.col("doc_id") + 8000)
    )
    novel = spark.createDataFrame(
        [(9200, "entirely fresh zxqv words never in any corpus wvut",
          "en", "syn", 49)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    arriving = copies.unionByName(novel)
    out_dir = str(tmp_path / "arriving_pipeline")
    arriving.coalesce(1).write.mode("overwrite").parquet(out_dir)

    def run(docs):
        outs = ingest_pipeline(docs, sh_idx, mh_idx)
        res = {}
        for name, df in outs.items():
            if df.isStreaming:
                res[name] = run_stream_to_memory(df, f"pipe_{name}")
            else:
                res[name] = df
        return res

    batch = run(with_event_time(arriving))
    stream = run(with_event_time(documents_stream(spark, out_dir)))
    assert {r["doc_id"] for r in stream["admitted"].select("doc_id").collect()} \
        == {r["doc_id"] for r in batch["admitted"].select("doc_id").collect()} \
        == {8004, 8013, 9200}
    for arm, key in (("simhash_flags", "hamming"), ("minhash_flags", "est_jaccard")):
        s = {(r["doc_id"], r["corpus_doc_id"]) for r in stream[arm].collect()}
        b = {(r["doc_id"], r["corpus_doc_id"]) for r in batch[arm].collect()}
        assert s == b
        assert (8004, 4) in s and (8013, 13) in s
        assert not any(d == 9200 for d, _ in s)
    sh_idx.unpersist()
    mh_idx.unpersist()


def test_admit_microbatch_retry_is_idempotent(spark):
    """foreachBatch is at-least-once: a retried (batch, batch_id) must leave
    every corpus/flag table exactly as a single run would.  The flag logs
    are batch_id-partitioned dynamic overwrites (ADVICE r08): a leftover
    flag row from a CRASHED attempt of the same batch (flags written,
    corpus appends not) is replaced rather than duplicated, other batches'
    partitions survive, and a full re-run changes nothing anywhere."""
    from exstream_implementation_spark.streaming.ingest_dedup import (
        DOCUMENTS_SCHEMA,
        NEARDUP_TABLE_SUFFIXES,
        admit_microbatch,
        init_neardup_corpus,
        refresh_neardup_tables,
    )

    base_text = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") == 5)
        .first()["text"]
    )
    name = "retry_ingest_t"
    init_neardup_corpus(
        spark,
        name,
        docs=spark.createDataFrame(
            [(1, base_text, "en", "s", len(base_text))], DOCUMENTS_SCHEMA
        ),
    )
    near_copy = base_text + " " + base_text.split()[-1]
    batch = with_event_time(
        spark.createDataFrame(
            [
                (3, near_copy, "en", "s", len(near_copy)),
                (5, "other novel mnop content qrst", "en", "s", 29),
            ],
            DOCUMENTS_SCHEMA,
        )
    )
    flag_schema = "doc_id long, corpus_doc_id long, hamming int, batch_id long"
    # another batch's partition — must survive this batch's dynamic overwrite
    spark.createDataFrame([(111, 1, 0, 3)], flag_schema).write.mode(
        "append"
    ).insertInto(f"{name}_sh_flags")
    # leftover from a crashed earlier attempt of THIS batch (batch_id 7)
    spark.createDataFrame([(999, 1, 0, 7)], flag_schema).write.mode(
        "append"
    ).insertInto(f"{name}_sh_flags")

    admit_microbatch(batch, 7, name)
    refresh_neardup_tables(spark, name)
    sh = spark.table(f"{name}_sh_flags")
    assert sorted(
        (r["doc_id"], r["corpus_doc_id"])
        for r in sh.filter("batch_id = 7").collect()
    ) == [(3, 1)]  # the crashed attempt's bogus row is REPLACED, not kept
    assert [r["doc_id"] for r in sh.filter("batch_id = 3").collect()] == [111]

    def snapshot():
        refresh_neardup_tables(spark, name)
        return {
            sfx: {tuple(r) for r in spark.table(f"{name}_{sfx}").collect()}
            for sfx in NEARDUP_TABLE_SUFFIXES
        }

    before = snapshot()
    admit_microbatch(batch, 7, name)  # full retry: anti-join self-heals
    assert snapshot() == before


def test_refreshing_ingest_restart_resumes_from_checkpoint(spark, tmp_path):
    """Checkpoint recovery for the self-refreshing ingest: a second start()
    with the SAME checkpoint dir must not reprocess committed files (no
    duplicate admissions or flag rows), and work arriving after the restart
    must still flag against the index grown before it."""
    import time as _time

    from exstream_implementation_spark.streaming.ingest_dedup import (
        DOCUMENTS_SCHEMA,
        NEARDUP_TABLE_SUFFIXES,
        init_neardup_corpus,
        refresh_neardup_tables,
        start_refreshing_ingest,
    )

    base_text = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") == 5)
        .first()["text"]
    )
    d = str(tmp_path / "rst_docs")

    def w(rows):
        spark.createDataFrame(rows, DOCUMENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        _time.sleep(1.2)

    def start():
        return start_refreshing_ingest(
            with_event_time(
                documents_stream(spark, d, max_files_per_trigger=1)
            ),
            name,
            ck,
        )

    def snapshot():
        refresh_neardup_tables(spark, name)
        return {
            sfx: {tuple(r) for r in spark.table(f"{name}_{sfx}").collect()}
            for sfx in NEARDUP_TABLE_SUFFIXES
        }

    name = "rst_ingest_t"
    ck = str(tmp_path / "rst_ckpt")
    w([(1, base_text, "en", "s", len(base_text))])
    init_neardup_corpus(spark, name)
    q = start()
    assert q.awaitTermination(300), "initial run did not drain"
    before = snapshot()
    assert {r[0] for r in before["admitted"]} == {1}

    # restart with nothing new: committed files must NOT be reprocessed
    q = start()
    assert q.awaitTermination(300), "no-op restart did not drain"
    assert snapshot() == before

    # work arriving after the restart still sees the pre-restart index
    near_copy = base_text + " " + base_text.split()[-1]
    w([(2, near_copy, "en", "s", len(near_copy))])
    q = start()
    assert q.awaitTermination(300), "post-restart run did not drain"
    after = snapshot()
    assert {r[0] for r in after["admitted"]} == {1, 2}
    sh_pairs = [
        (r["doc_id"], r["corpus_doc_id"])
        for r in spark.table(f"{name}_sh_flags").collect()
    ]
    assert sorted(sh_pairs) == [(2, 1)]  # flagged once, against doc 1


def test_admit_microbatch_flags_within_batch_pairs(spark):
    """Two near-duplicates arriving in the SAME trigger must flag each other
    (oriented doc_id > corpus_doc_id) — not wait for the periodic batch
    pass.  Corpus flags (vs docs admitted in earlier batches) must coexist
    with the within-batch pair flags."""
    from exstream_implementation_spark.streaming.ingest_dedup import (
        DOCUMENTS_SCHEMA,
        admit_microbatch,
        init_neardup_corpus,
        refresh_neardup_tables,
    )

    base_text = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") == 5)
        .first()["text"]
    )
    name = "wb_ingest_t"
    # corpus seeded with the original: the arriving near-copies flag it too
    init_neardup_corpus(
        spark,
        name,
        docs=spark.createDataFrame(
            [(1, base_text, "en", "s", len(base_text))], DOCUMENTS_SCHEMA
        ),
    )
    # two distinct near-copies of the same doc arrive in ONE batch: each
    # re-appends a token the doc already contains (distinct-token set — the
    # SimHash/MinHash input — unchanged; content hash differs)
    toks = base_text.split()
    copy_a = base_text + " " + toks[-1]
    copy_b = base_text + " " + toks[0]
    batch = with_event_time(
        spark.createDataFrame(
            [
                (20, copy_a, "en", "s", len(copy_a)),
                (30, copy_b, "en", "s", len(copy_b)),
                (40, "entirely unrelated zzqq vvrr text", "en", "s", 33),
            ],
            DOCUMENTS_SCHEMA,
        )
    )
    admit_microbatch(batch, 5, name)
    refresh_neardup_tables(spark, name)
    for tbl in ("sh_flags", "mh_flags"):
        pairs = sorted(
            (r["doc_id"], r["corpus_doc_id"])
            for r in spark.table(f"{name}_{tbl}").collect()
        )
        # vs corpus: both copies flag doc 1; within batch: 30 flags 20
        # (higher against lower, exactly once); the novel doc flags nothing
        assert pairs == [(20, 1), (30, 1), (30, 20)], tbl


# --- embedding near-dup arm --------------------------------------------------
def test_stream_bucket_fold_matches_batch_builder(spark):
    """The stream-safe bucket projection must reproduce `_buckets_spark`'s
    (vec_id, tbl, bucket) assignment bit-for-bit — identical md5 planes."""
    from exstream_implementation_spark.plans.similarity import (
        _active_planes,
        _buckets_spark,
    )
    from exstream_implementation_spark.streaming.ingest_dedup import (
        with_lsh_buckets,
    )

    planes = _active_planes(spark, SF_DIR)
    want = {
        (r["vec_id"], r["tbl"], r["bucket"])
        for r in _buckets_spark(spark, SF_DIR).collect()
    }
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    got = {
        (r["vec_id"], r["tbl"], r["bucket"])
        for r in with_lsh_buckets(emb, planes).select(
            "vec_id", "tbl", "bucket"
        ).collect()
    }
    assert got == want


def test_stream_embdup_flags_match_batch(spark, tmp_path):
    """An arriving exact-copy embedding flags its corpus original at
    cosine 1.0; a far vector does not; availableNow == batch."""
    import numpy as np

    from exstream_implementation_spark.plans.similarity import (
        _active_planes,
    )
    from exstream_implementation_spark.streaming.ingest_dedup import (
        embedding_index_rows,
        stream_embdup_vs_corpus,
        with_event_time,
    )

    planes = _active_planes(spark, SF_DIR)
    corpus_vecs = load_table(spark, SF_DIR, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    index = embedding_index_rows(
        corpus_vecs, planes, id_col="doc_id"
    ).persist()
    copies = corpus_vecs.filter(F.col("doc_id").isin([2, 9])).withColumn(
        "doc_id", F.col("doc_id") + 5000
    )
    rng = np.random.default_rng(3)
    far = spark.createDataFrame(
        [(9000, [float(x) for x in rng.normal(size=64) * 10])],
        "doc_id long, embedding array<float>",
    )
    arriving = copies.unionByName(far)
    out = str(tmp_path / "emb_arriving")
    arriving.coalesce(1).write.mode("overwrite").parquet(out)

    batch_flags = stream_embdup_vs_corpus(
        with_event_time(arriving), index, planes, min_cosine=0.99
    )
    stream_src = (
        spark.readStream.schema("doc_id long, embedding array<float>")
        .parquet(out)
    )
    stream_flags = run_stream_to_memory(
        stream_embdup_vs_corpus(
            with_event_time(stream_src), index, planes, min_cosine=0.99
        ),
        "embdup_mem",
    )
    cols = ["doc_id", "corpus_doc_id", "cosine"]
    got_b = {tuple(r) for r in batch_flags.select(*cols).collect()}
    got_s = {tuple(r) for r in stream_flags.select(*cols).collect()}
    assert got_s == got_b
    flagged_pairs = {(d, c) for d, c, _ in got_s}
    assert (5002, 2) in flagged_pairs and (5009, 9) in flagged_pairs
    assert all(d != 9000 for d, _ in flagged_pairs)
    # exact copies score cosine 1.0 after rounding
    assert all(
        cos == pytest.approx(1.0)
        for d, c, cos in got_s
        if (d, c) in {(5002, 2), (5009, 9)}
    )
    index.unpersist()


def _np_planes(n_tables, n_planes, dim=64):
    """Numpy mirror of plane_weight_sql's md5 derivation."""
    import hashlib

    import numpy as np

    w = np.zeros((n_tables, n_planes, dim))
    for t in range(n_tables):
        for p in range(n_planes):
            for j in range(dim):
                h = hashlib.md5(f"{t}_{p}_{j}".encode()).hexdigest()[:8]
                w[t, p, j] = ((int(h, 16) % 2001) - 1000) / 1000.0
    return w


def _np_buckets(v, w):
    import numpy as np

    dots = w @ v  # (tables, planes)
    return [
        int(sum(1 << p for p in range(w.shape[1]) if dots[t, p] > 0))
        for t in range(w.shape[0])
    ]


def test_stream_embdup_multiprobe_rescues_hamming1_pair(spark):
    """A near-identical pair whose buckets differ in EVERY table (by one
    bit in at least one) is invisible to the exact-bucket join and found
    by the Hamming-1 multiprobe — the batch family's recall lever."""
    import numpy as np

    from exstream_implementation_spark.streaming.ingest_dedup import (
        embedding_index_rows,
        stream_embdup_vs_corpus,
        with_event_time,
    )

    n_tables, n_planes, dim = 4, 4, 64
    w = _np_planes(n_tables, n_planes, dim)
    rng = np.random.default_rng(12)
    base = None
    pert = None
    for _ in range(8000):
        v = rng.normal(size=dim)
        v /= np.linalg.norm(v)
        u = v + rng.normal(size=dim) * 0.04
        u /= np.linalg.norm(u)
        bv, bu = _np_buckets(v, w), _np_buckets(u, w)
        ham = [bin(a ^ b).count("1") for a, b in zip(bv, bu)]
        cos = float(v @ u)
        if min(ham) >= 1 and any(h == 1 for h in ham) and cos >= 0.95:
            base, pert = v, u
            break
    assert base is not None, "no suitable pair found in the search budget"
    corpus = spark.createDataFrame(
        [(1, [float(x) for x in base])], "doc_id long, embedding array<float>"
    )
    index = embedding_index_rows(corpus, n_planes, n_tables, id_col="doc_id")
    arriving = with_event_time(
        spark.createDataFrame(
            [(5001, [float(x) for x in pert])],
            "doc_id long, embedding array<float>",
        )
    )
    exact = stream_embdup_vs_corpus(
        arriving, index, n_planes, n_tables, min_cosine=0.94,
        multiprobe=False,
    )
    assert exact.count() == 0  # all tables differ: exact join misses
    multi = stream_embdup_vs_corpus(
        arriving, index, n_planes, n_tables, min_cosine=0.94,
        multiprobe=True,
    ).collect()
    assert [(r["doc_id"], r["corpus_doc_id"]) for r in multi] == [(5001, 1)]


def test_stream_embdup_n_tables_respected(spark):
    """Probe side must cover every index table: an 8-table index probed
    with n_tables=8 yields 8 distinct probe tables (a narrower default
    would silently skip half the index)."""
    from exstream_implementation_spark.streaming.ingest_dedup import (
        with_lsh_buckets,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    ).limit(5)
    got = with_lsh_buckets(emb, n_planes=4, n_tables=8)
    tbls = {r["tbl"] for r in got.select("tbl").distinct().collect()}
    assert tbls == set(range(8))
