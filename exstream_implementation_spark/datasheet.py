"""Corpus datasheet — the "Datasheets for Datasets" (Gebru et al. 2021,
arXiv:1803.09010) summary a corpus publisher ships next to the shards,
composed from the library's own one-pass primitives:

  schema & column stats   operators/profile.py  (ONE aggregation, all cols)
  length distribution     operators/kll.py      (mergeable quantile sketch)
  per-source composition  one groupBy, top-N + remainder
  duplication             exact distinct of the dedup_exact content hash
  quality gate rate       the corpus_curation thresholds as conditional sums
  language mix            one groupBy (when the column exists)

Everything is a bounded number of corpus passes (4 aggregations + 2 small
groupBys) regardless of corpus size; nothing corpus-sized reaches the
driver.  The report is DETERMINISTIC in (data, config): no timestamps, no
host state — two runs over the same corpus produce byte-identical
markdown, so the datasheet can be committed and diffed like code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from exstream_implementation_spark.corpus_prep import (
    CorpusPrepConfig,
    _norm_hash,
)
from exstream_implementation_spark.operators.kll import quantile_rollup
from exstream_implementation_spark.operators.profile import profile_columns
from exstream_implementation_spark.plans.text import STOP_EN

_QS = [0.1, 0.5, 0.9, 0.99]


def corpus_datasheet(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str | None = "source",
    lang_col: str | None = "lang",
    cfg: CorpusPrepConfig = CorpusPrepConfig(),
    top_sources: int = 10,
) -> dict:
    """Structured datasheet dict (see module doc).  ``source_col`` /
    ``lang_col`` may be None (or absent from the frame) to skip those
    sections.  ``cfg`` supplies the quality-gate thresholds reported."""
    if text_col not in docs.columns:
        raise ValueError(f"corpus_datasheet: no text column {text_col!r}")
    source_col = source_col if source_col in docs.columns else None
    lang_col = lang_col if lang_col in docs.columns else None

    toks = F.split(F.lower(text_col), r"\s+")
    n_toks = F.size(toks)
    # stop_count (plans/text.py) takes a column NAME for its expr string;
    # inside one anonymous aggregate the HOF form is the direct equivalent
    n_stops = F.size(F.filter(toks, lambda x: x.isin(*STOP_EN)))
    quality_ok = (n_toks >= cfg.min_tokens) & (
        n_stops / n_toks >= cfg.min_stop_ratio
    )
    core = docs.agg(
        F.count(F.lit(1)).alias("rows"),
        F.count_distinct(_norm_hash(text_col)).alias("distinct_texts"),
        F.sum(F.col(text_col).isNull().cast("long")).alias("null_texts"),
        F.sum(F.length(text_col)).alias("total_chars"),
        F.sum(n_toks.cast("long")).alias("total_tokens"),
        F.sum(quality_ok.cast("long")).alias("quality_pass"),
    ).first()
    rows = core["rows"]
    null_texts = int(core["null_texts"] or 0)
    # dedup_exact convention: NULL texts hash to NULL, which
    # count_distinct skips but which form exactly ONE dedup group — add
    # it back or every NULL row counts as a duplicate
    text_groups = core["distinct_texts"] + (1 if null_texts else 0)

    lengths = quantile_rollup(
        docs.select(F.length(text_col).alias("__len")), [], "__len", [], _QS
    ).first()
    quantiles = lengths["quantiles"] if lengths is not None else None
    if quantiles is not None and any(v is None for v in quantiles):
        quantiles = None  # sketch absorbed zero values (all-NULL text)

    report = {
        "rows": rows,
        "total_chars": int(core["total_chars"] or 0),
        "total_ws_tokens": int(core["total_tokens"] or 0),
        "distinct_texts": core["distinct_texts"],
        "null_texts": null_texts,
        # fraction of rows dedup_exact would drop: 1 - groups/rows, where
        # NULL texts are one group like any other
        "exact_dup_frac": (
            round(1.0 - text_groups / rows, 6) if rows else None
        ),
        "quality_gate": {
            "min_tokens": cfg.min_tokens,
            "min_stop_ratio": cfg.min_stop_ratio,
            "pass_frac": (
                round((core["quality_pass"] or 0) / rows, 6)
                if rows
                else None
            ),
        },
        "char_length_quantiles": (
            dict(zip([f"p{int(q * 100)}" for q in _QS], quantiles))
            if quantiles is not None
            else None
        ),
        "columns": [r.asDict() for r in profile_columns(docs).collect()],
    }

    if source_col is not None:
        # persist across the two actions (top-N collect + count), or the
        # corpus-scanning groupBy lineage executes twice
        by_src = (
            docs.groupBy(source_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc(source_col))
            .persist()
        )
        top = by_src.limit(top_sources).collect()
        n_sources = by_src.count()
        by_src.unpersist()
        top_n = sum(r["n"] for r in top)
        report["sources"] = {
            "n_sources": n_sources,
            "top": [(r[source_col], r["n"]) for r in top],
            "rest_rows": rows - top_n,
        }
    if lang_col is not None:
        report["languages"] = {
            r[lang_col]: r["n"]
            for r in docs.groupBy(lang_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    return report


def _md_cell(v, max_len: int = 48) -> str:
    """A value safe inside one markdown table cell: newlines and pipes
    escaped, long values truncated — the column profile's min/max of a
    text column is a whole DOCUMENT otherwise, and any embedded newline
    or '|' would break the table."""
    s = "" if v is None else str(v)
    s = s.replace("\\", "\\\\").replace("|", "\\|")
    s = s.replace("\n", "\\n").replace("\r", "\\r")
    if len(s) > max_len:
        s = s[: max_len - 1] + "…"
    return s


def datasheet_markdown(report: dict, title: str = "Corpus datasheet") -> str:
    """Deterministic markdown rendering of ``corpus_datasheet``'s dict."""
    L = [f"# {title}", ""]
    L.append(f"- rows: **{report['rows']}**")
    L.append(f"- total characters: {report['total_chars']}")
    L.append(f"- total whitespace tokens: {report['total_ws_tokens']}")
    L.append(
        f"- exact-duplicate fraction (normalized text): "
        f"{report['exact_dup_frac']}"
    )
    q = report["quality_gate"]
    L.append(
        f"- quality gate (>= {q['min_tokens']} tokens, stop ratio >= "
        f"{q['min_stop_ratio']}): pass fraction {q['pass_frac']}"
    )
    if report.get("char_length_quantiles"):
        parts = ", ".join(
            f"{k}={v:.0f}" for k, v in report["char_length_quantiles"].items()
        )
        L.append(f"- text length (chars): {parts}")
    if "sources" in report:
        s = report["sources"]
        L += ["", f"## Sources ({s['n_sources']})", ""]
        L.append("| source | rows |")
        L.append("|---|---|")
        for name, n in s["top"]:
            L.append(f"| {_md_cell(name)} | {n} |")
        if s["rest_rows"]:
            L.append(f"| (rest) | {s['rest_rows']} |")
    if "languages" in report:
        L += ["", "## Languages", ""]
        for k in sorted(report["languages"], key=lambda x: (x is None, x)):
            L.append(f"- {k}: {report['languages'][k]}")
    L += ["", "## Columns", ""]
    L.append("| column | dtype | nulls | approx distinct | min | max |")
    L.append("|---|---|---|---|---|---|")
    for c in report["columns"]:
        L.append(
            f"| {c['column']} | {c['dtype']} | {c['n_null']} | "
            f"{c['approx_distinct']} | {_md_cell(c['min'])} | "
            f"{_md_cell(c['max'])} |"
        )
    return "\n".join(L) + "\n"
