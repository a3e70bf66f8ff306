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
from exstream_implementation_spark.operators.kll import (
    kll_build,
    kll_merge,
    kll_quantiles,
)
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
        F.sum(F.length(text_col)).alias("total_chars"),
        F.sum(n_toks.cast("long")).alias("total_tokens"),
        F.sum(quality_ok.cast("long")).alias("quality_pass"),
    ).first()
    rows = core["rows"]

    lengths = kll_quantiles(
        kll_merge(
            kll_build(
                docs.select(
                    F.lit(0).alias("__g"), F.length(text_col).alias("__len")
                ),
                ["__g"],
                "__len",
            ),
            ["__g"],
        ),
        _QS,
    ).first()

    report = {
        "rows": rows,
        "total_chars": int(core["total_chars"] or 0),
        "total_ws_tokens": int(core["total_tokens"] or 0),
        "distinct_texts": core["distinct_texts"],
        # fraction of rows that are an exact (normalized) duplicate of
        # some other row's text — the dedup_exact convention
        "exact_dup_frac": (
            round(1.0 - core["distinct_texts"] / rows, 6) if rows else None
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
            dict(zip([f"p{int(q * 100)}" for q in _QS], lengths["quantiles"]))
            if lengths is not None
            else None
        ),
        "columns": [r.asDict() for r in profile_columns(docs).collect()],
    }

    if source_col is not None:
        by_src = (
            docs.groupBy(source_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc(source_col))
        )
        top = by_src.limit(top_sources).collect()
        n_sources = by_src.count()
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
            L.append(f"| {name} | {n} |")
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
            f"{c['approx_distinct']} | {c['min']} | {c['max']} |"
        )
    return "\n".join(L) + "\n"
