"""Boundary-respecting chunker (plans/text.chunk_by_separator) vs a
pure-python reference: greedy merge parity, never-split-a-unit, oversize
units stand alone, character round-trip, custom separators (incl. regex
metacharacters), degenerate inputs, and UDF-free plan shape."""

import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.plans.text import chunk_by_separator
from exstream_implementation_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _ref_chunks(text: str, max_chars: int, sep: str) -> list[str]:
    units = [u.strip() for u in text.split(sep)]
    units = [u for u in units if u]
    chunks, buf = [], ""
    for u in units:
        if not buf:
            buf = u
        elif len(buf) + len(sep) + len(u) <= max_chars:
            buf = buf + sep + u
        else:
            chunks.append(buf)
            buf = u
    if buf:
        chunks.append(buf)
    return chunks


def _run(spark, rows, max_chars, sep="\n\n"):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_by_separator(df, max_chars, sep=sep)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk_text"], r["n_chars"]))
    return {k: [c for _, c, _ in sorted(v)] for k, v in got.items()}, out


PARAS = "\n\n".join(
    [
        "First paragraph with some words.",
        "Second one, a bit longer than the first paragraph was.",
        "Third.",
        "Fourth paragraph arrives with considerably more text than any other, "
        "long enough that it cannot share a chunk with its neighbours at all.",
        "Fifth.",
        "Sixth and final.",
    ]
)


@pytest.mark.parametrize("max_chars", [40, 80, 200, 10_000])
def test_python_reference_parity(spark, max_chars):
    got, _ = _run(spark, [(0, PARAS)], max_chars)
    assert got[0] == _ref_chunks(PARAS, max_chars, "\n\n")


def test_boundaries_and_oversize(spark):
    got, out = _run(spark, [(0, PARAS)], 60)
    units = [u.strip() for u in PARAS.split("\n\n")]
    for c in got[0]:
        # every chunk is a join of consecutive ORIGINAL units
        for piece in c.split("\n\n"):
            assert piece in units
    # the oversized fourth paragraph stands alone (> max_chars, unsplit)
    big = [u for u in units if len(u) > 60][0]
    assert big in got[0]
    # non-oversized chunks respect the cap
    for c in got[0]:
        assert len(c) <= 60 or c == big
    # character round-trip: joining everything reproduces the doc
    assert "\n\n".join(got[0]) == "\n\n".join(units)
    # n_chars column agrees
    for r in out.collect():
        assert r["n_chars"] == len(r["chunk_text"])


def test_custom_separator_with_regex_metachar(spark):
    text = "alpha beta|gamma|delta epsilon zeta|eta"
    got, _ = _run(spark, [(0, text)], 20, sep="|")
    assert got[0] == _ref_chunks(text, 20, "|")
    # '.' as separator must be treated literally, not as regex any-char
    dotted = "one.two.three four five.six"
    got2, _ = _run(spark, [(1, dotted)], 15, sep=".")
    assert got2[1] == _ref_chunks(dotted, 15, ".")


def test_degenerate_inputs(spark):
    got, _ = _run(
        spark, [(0, ""), (1, "   "), (2, "\n\n\n\n"), (3, "solo")], 50
    )
    assert set(got) == {3} and got[3] == ["solo"]
    with pytest.raises(ValueError, match="positive"):
        chunk_by_separator(
            spark.createDataFrame([(0, "x")], "doc_id long, text string"), 0
        )


def test_plan_is_udf_free_and_runs_on_testdata(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = chunk_by_separator(docs, 200, sep=" ")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # whitespace-separated fallback: chunks cover every doc with text
    n_docs_with_text = docs.filter(F.length(F.trim("text")) > 0).count()
    assert out.select("doc_id").distinct().count() == n_docs_with_text
    assert out.filter((F.col("n_chars") > 200) & ~F.col("chunk_text").rlike(r"^\S+$")).count() == 0


def test_whitespace_trim_matches_python_strip(spark):
    # tab/newline-edged units and whitespace-only docs
    rows = [(0, "\t"), (1, " hello\n\n\n\tworld  \n\nok")]
    got, _ = _run(spark, rows, 12)
    assert 0 not in got
    assert got[1] == _ref_chunks(rows[1][1], 12, "\n\n")


def test_backslash_separator(spark):
    text = r"one\two\three four\five"
    got, _ = _run(spark, [(0, text)], 10, sep="\\")
    assert got[0] == _ref_chunks(text, 10, "\\")
