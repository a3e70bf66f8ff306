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

SF_DIR = "/root/testdata/sf0.001"


def run_stream_to_memory(sdf, name, output_mode="append"):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return sdf.sparkSession.table(name)


def test_perrow_simhash_matches_batch_bands(spark):
    """The fold-based per-row SimHash (no explode, no groupBy) must produce
    the exact band values of the shuffle-based batch formulation."""
    docs = load_table(spark, SF_DIR, "documents")
    mine = with_simhash_bands(docs).select("doc_id", "b0", "b1", "b2", "b3")
    ref = dedup_simhash(spark, SF_DIR).select("doc_id", "b0", "b1", "b2", "b3")
    assert mine.exceptAll(ref).count() == 0
    assert ref.exceptAll(mine).count() == 0


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
    stream = with_event_time(documents_stream(spark, doc_dir_with_dups))
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
    # every re-sent duplicate (doc_id >= 1000) lost to its batch-1 original:
    # both arrived, only one survived — and originals arrived strictly first
    # in event time, so the survivor set contains no re-sent id
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
