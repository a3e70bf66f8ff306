"""Corpus datasheet (datasheet.py): values cross-checked against direct
computation on testdata, determinism (byte-identical markdown across runs
and input partitionings), planted-duplicate accounting, and section
skipping when optional columns are absent."""

import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.datasheet import (
    corpus_datasheet,
    datasheet_markdown,
)
from exstream_implementation_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents")


@pytest.fixture(scope="module")
def report(docs):
    return corpus_datasheet(docs)


def test_core_counts_match_direct_computation(docs, report):
    n = docs.count()
    assert report["rows"] == n
    assert report["total_chars"] == (
        docs.agg(F.sum(F.length("text"))).first()[0]
    )
    assert report["sources"]["n_sources"] == (
        docs.select("source").distinct().count()
    )
    assert sum(report["languages"].values()) == n
    top_total = sum(x for _, x in report["sources"]["top"])
    assert top_total + report["sources"]["rest_rows"] == n
    assert set(report["char_length_quantiles"]) == {"p10", "p50", "p90", "p99"}
    lo, hi = (
        docs.agg(F.min(F.length("text")), F.max(F.length("text"))).first()
    )
    for v in report["char_length_quantiles"].values():
        assert lo <= v <= hi
    cols = {c["column"] for c in report["columns"]}
    assert cols == set(docs.columns)


def test_planted_duplicates_counted(spark):
    base = [(i, f"some distinct body text number {i} here", "s") for i in range(8)]
    dups = [(100 + i, "some distinct body text number 0 here", "s") for i in range(2)]
    df = spark.createDataFrame(
        base + dups, "doc_id long, text string, source string"
    )
    r = corpus_datasheet(df)
    assert r["rows"] == 10 and r["distinct_texts"] == 8
    assert r["exact_dup_frac"] == round(1 - 8 / 10, 6)


def test_deterministic_markdown(docs, report):
    md1 = datasheet_markdown(report)
    # same data, same layout: byte-identical
    assert datasheet_markdown(corpus_datasheet(docs)) == md1
    assert "# Corpus datasheet" in md1 and "## Sources" in md1
    # different input layout: every EXACT metric identical (the KLL
    # length sketch is envelope- not bit-deterministic across layouts —
    # the documented HLL/KLL contract — so quantiles are compared by
    # membership in the value range in test_core_counts above)
    r2 = corpus_datasheet(docs.repartition(7))
    for k in ("rows", "total_chars", "total_ws_tokens", "distinct_texts",
              "exact_dup_frac", "quality_gate", "sources", "languages"):
        assert r2[k] == report[k], k


def test_optional_sections_skip(spark):
    df = spark.createDataFrame(
        [(1, "just text and nothing else")], "doc_id long, text string"
    )
    r = corpus_datasheet(df)
    assert "sources" not in r and "languages" not in r
    md = datasheet_markdown(r)
    assert "## Sources" not in md and "## Columns" in md


def test_null_texts_form_one_dedup_group(spark):
    rows = [(i, f"distinct text {i}", "s") for i in range(7)] + [
        (10, None, "s"),
        (11, None, "s"),
        (12, None, "s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    r = corpus_datasheet(df)
    # 7 distinct texts + 1 NULL group = 8 groups over 10 rows
    assert r["null_texts"] == 3
    assert r["exact_dup_frac"] == round(1 - 8 / 10, 6)


def test_all_null_text_renders_without_quantiles(spark):
    df = spark.createDataFrame(
        [(1, None, "s"), (2, None, "s")],
        "doc_id long, text string, source string",
    )
    r = corpus_datasheet(df)
    assert r["char_length_quantiles"] is None
    md = datasheet_markdown(r)  # must not crash formatting None
    assert "text length" not in md


def test_markdown_survives_hostile_text(spark):
    hostile = "first line\nsecond | cell-breaking | line\rand more " + "x" * 200
    df = spark.createDataFrame(
        [(1, hostile, "a|b\nc")], "doc_id long, text string, source string"
    )
    md = datasheet_markdown(corpus_datasheet(df))
    for line in md.splitlines():
        if line.startswith("|"):
            assert "\r" not in line
            # escaped pipes only — every cell boundary is ' | '
            assert line.count("|") - line.count("\\|") in (3, 4, 7)
    assert "second" not in md or "\\n" in md  # newline was escaped


def test_datasheet_exported_next_to_shards(spark, tmp_path):
    import os

    from exstream_implementation_spark.corpus_prep import (
        CorpusPrepConfig,
        prepare_corpus,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "source"
    ).filter("doc_id < 120")
    cfg = CorpusPrepConfig(substring_mod=8, bpe_merges=8, n_shards=2)
    out = str(tmp_path / "out")
    stages = prepare_corpus(docs, None, cfg, out_path=out, datasheet=True)
    p = os.path.join(out, "_DATASHEET.md")
    assert os.path.exists(p)
    md = open(p).read()
    assert md == stages["datasheet_markdown"]
    assert md.startswith("# Corpus datasheet (surviving documents)")
    # the datasheet describes the SURVIVORS, not the raw input
    n_mixed = stages["mixed"].count()
    assert f"- rows: **{n_mixed}**" in md


def test_missing_text_col_rejected(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="text column"):
        corpus_datasheet(df)
