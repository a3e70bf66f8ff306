"""Declarative data-quality verification — the Deequ/Great-Expectations
shape (Schelter et al. 2018, "Automating large-scale data quality
verification", VLDB) for pipeline gating: assert properties of a corpus
BEFORE training jobs consume it, with one report row per check.

Not in the reference (numeric traces only) — at 100 TB the difference
between "run 12 validation queries" and "run one" is 11 corpus scans, so
the compiler here folds every scan-expressible check into a SINGLE
aggregation pass (each check is one aggregate expression; Catalyst
map-side-combines the lot), and only referential checks — which need a
second table — add their own anti-join jobs.

    report = verify(df, [
        not_null("doc_id"),
        unique("doc_id"),
        in_range("n_tokens", lo=1, hi=1_000_000),
        matches("lang", r"[a-z]{2}", min_frac=0.99),
        satisfies("n_tokens >= 20 OR lang = 'zh'", min_frac=0.95),
        row_count(min_rows=1),
        referential("source_id", sources_df, "id"),
    ])

Report schema: (check, ok, observed, expected) — ``observed`` is the
measured violation fraction / count / bound as a string so one schema
carries every check kind; ``ok`` is the gate.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    name: str
    kind: str
    params: dict = field(default_factory=dict)


def not_null(col: str, max_frac: float = 0.0) -> Expectation:
    """Null fraction of ``col`` must be <= max_frac."""
    return Expectation(
        f"not_null({col})", "not_null", {"col": col, "max_frac": max_frac}
    )


def unique(*cols: str) -> Expectation:
    """(cols) tuples must be distinct (exact; adds a distinct-count to
    the single pass)."""
    return Expectation(f"unique({', '.join(cols)})", "unique", {"cols": cols})


def in_range(col: str, lo=None, hi=None) -> Expectation:
    """Every non-null value of ``col`` in [lo, hi] (either side open)."""
    if lo is None and hi is None:
        raise ValueError("in_range needs lo and/or hi")
    return Expectation(
        f"in_range({col})", "in_range", {"col": col, "lo": lo, "hi": hi}
    )


def values_in(col: str, allowed) -> Expectation:
    """Every non-null value of ``col`` drawn from ``allowed``."""
    return Expectation(
        f"values_in({col})", "values_in", {"col": col, "allowed": list(allowed)}
    )


def matches(col: str, regex: str, min_frac: float = 1.0) -> Expectation:
    """>= min_frac of non-null values fully match ``regex``."""
    return Expectation(
        f"matches({col})",
        "matches",
        {"col": col, "regex": regex, "min_frac": min_frac},
    )


def satisfies(predicate_sql: str, min_frac: float = 1.0) -> Expectation:
    """>= min_frac of rows satisfy the SQL predicate."""
    return Expectation(
        f"satisfies({predicate_sql})",
        "satisfies",
        {"pred": predicate_sql, "min_frac": min_frac},
    )


def row_count(min_rows: int = 0, max_rows: int | None = None) -> Expectation:
    return Expectation(
        "row_count", "row_count", {"min": min_rows, "max": max_rows}
    )


def referential(
    col: str, other: DataFrame, other_col: str
) -> Expectation:
    """Every non-null ``col`` value exists in ``other.other_col`` (adds
    one anti-join job; the reference side is typically dimension-sized
    and broadcasts under AQE)."""
    return Expectation(
        f"referential({col})",
        "referential",
        {"col": col, "other": other, "other_col": other_col},
    )


def _frac(num: F.Column, den: F.Column) -> F.Column:
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def compile_scan_checks(
    df: DataFrame, checks: list[Expectation]
) -> tuple[DataFrame | None, list]:
    """(one-row aggregate frame, post-processors) for every scan-
    expressible check — exposed so the single-scan compilation is
    plan-assertable; ``verify`` is the user entry point."""
    if not checks:
        raise ValueError("no checks given")
    aggs, posts = [], []  # posts: (name, fn(row) -> (ok, observed, expected))
    n = F.count(F.lit(1))
    for i, c in enumerate(checks):
        p, tag = c.params, f"c{i}"
        if c.kind == "not_null":
            aggs.append(
                _frac(
                    F.count(F.lit(1)) - F.count(p["col"]), n
                ).alias(tag)
            )
            posts.append(
                (c, tag, lambda v, p=p: (v <= p["max_frac"], f"null_frac={v:.6g}", f"<= {p['max_frac']}"))
            )
        elif c.kind == "unique":
            # distinct over a STRUCT: count(DISTINCT a, b) drops tuples
            # with any NULL member, silently passing duplicated
            # (x, NULL) rows — the struct wrapper is null-safe
            aggs.append(
                (
                    n
                    - F.count_distinct(
                        F.struct(*[F.col(x) for x in p["cols"]])
                    )
                ).alias(tag)
            )
            posts.append(
                (c, tag, lambda v, p=p: (v == 0, f"duplicate_rows={v}", "== 0"))
            )
        elif c.kind == "in_range":
            lo, hi = p["lo"], p["hi"]
            bad = F.lit(False)
            if lo is not None:
                bad = bad | (F.col(p["col"]) < lo)
            if hi is not None:
                bad = bad | (F.col(p["col"]) > hi)
            aggs.append(F.sum(bad.cast("long")).alias(tag))
            posts.append(
                (c, tag, lambda v, p=p: ((v or 0) == 0, f"out_of_range={v or 0}", f"in [{p['lo']}, {p['hi']}]"))
            )
        elif c.kind == "values_in":
            bad = (~F.col(p["col"]).isin(p["allowed"])) & F.col(
                p["col"]
            ).isNotNull()
            aggs.append(F.sum(bad.cast("long")).alias(tag))
            posts.append(
                (c, tag, lambda v, p=p: ((v or 0) == 0, f"outside_set={v or 0}", "== 0"))
            )
        elif c.kind == "matches":
            okc = F.col(p["col"]).rlike(f"^(?:{p['regex']})$")
            aggs.append(
                _frac(
                    F.sum(okc.cast("long")), F.count(p["col"])
                ).alias(tag)
            )
            posts.append(
                (c, tag, lambda v, p=p: (v >= p["min_frac"], f"match_frac={v:.6g}", f">= {p['min_frac']}"))
            )
        elif c.kind == "satisfies":
            aggs.append(
                _frac(
                    F.sum(F.expr(p["pred"]).cast("long")), n
                ).alias(tag)
            )
            posts.append(
                (c, tag, lambda v, p=p: (v >= p["min_frac"], f"sat_frac={v:.6g}", f">= {p['min_frac']}"))
            )
        elif c.kind == "row_count":
            aggs.append(n.alias(tag))
            posts.append(
                (
                    c,
                    tag,
                    lambda v, p=p: (
                        v >= p["min"] and (p["max"] is None or v <= p["max"]),
                        f"rows={v}",
                        f"in [{p['min']}, {p['max'] if p['max'] is not None else 'inf'}]",
                    ),
                )
            )
        elif c.kind == "referential":
            posts.append((c, None, None))  # handled below
        else:
            raise ValueError(f"unknown check kind: {c.kind}")
    return (df.agg(*aggs) if aggs else None), posts


def verify(df: DataFrame, checks: list[Expectation]) -> DataFrame:
    """One report row per check: (check, ok, observed, expected).

    All scan-expressible checks compile into ONE aggregation over ``df``
    (plan-asserted single-scan in tests); each ``referential`` check adds
    one anti-join count.  The report is a driver-side literal frame
    (O(#checks) rows), so gating on it costs a single action."""
    agg_df, posts = compile_scan_checks(df, checks)
    row = agg_df.first() if agg_df is not None else None
    report = []
    for c, tag, fn in posts:
        if c.kind == "referential":
            p = c.params
            orphans = (
                df.select(F.col(p["col"]).alias("__k"))
                .filter(F.col("__k").isNotNull())
                .join(
                    p["other"].select(
                        F.col(p["other_col"]).alias("__k")
                    ),
                    "__k",
                    "left_anti",
                )
                .count()
            )
            report.append((c.name, orphans == 0, f"orphans={orphans}", "== 0"))
        else:
            v = row[tag]
            ok, observed, expected = fn(v)
            report.append((c.name, bool(ok), observed, expected))
    return df.sparkSession.createDataFrame(
        report, "check string, ok boolean, observed string, expected string"
    )


# Row-expressible check kinds: a violation is attributable to ONE row.
# unique / row_count need the whole dataset; referential needs a join.
_ROW_KINDS = ("not_null", "in_range", "values_in", "matches", "satisfies")


def _row_violation_cond(c: Expectation) -> F.Column:
    p = c.params
    if c.kind == "not_null":
        return F.col(p["col"]).isNull()
    if c.kind == "in_range":
        bad = F.lit(False)
        if p["lo"] is not None:
            bad = bad | (F.col(p["col"]) < p["lo"])
        if p["hi"] is not None:
            bad = bad | (F.col(p["col"]) > p["hi"])
        return bad
    if c.kind == "values_in":
        return (~F.col(p["col"]).isin(p["allowed"])) & F.col(p["col"]).isNotNull()
    if c.kind == "matches":
        return F.col(p["col"]).isNotNull() & ~F.col(p["col"]).rlike(
            f"^(?:{p['regex']})$"
        )
    if c.kind == "satisfies":
        # NULL predicate result counts as a violation: an unevaluable
        # row is not a passing row
        return ~F.coalesce(F.expr(p["pred"]), F.lit(False))
    raise ValueError(
        f"check '{c.name}' ({c.kind}) is dataset-level, not row-level — "
        f"row routing supports {_ROW_KINDS}"
    )


def row_violations(df: DataFrame, checks: list[Expectation]) -> DataFrame:
    """Append ``violations: array<string>`` naming every row-expressible
    check the row fails (empty array = clean).  Dataset-level kinds
    (unique/row_count/referential) raise — they cannot blame a single
    row.  Pure projection: fuses into the scan, no extra pass.

    Note the semantic shift vs ``verify``: fraction thresholds
    (max_frac/min_frac) are DATASET gates; at row level any individual
    failure is flagged, so routing is stricter than gating by design.
    """
    if not checks:
        raise ValueError("no checks given")
    if "violations" in df.columns:
        raise ValueError(
            "row_violations: input already has a 'violations' column — "
            "rename it first (silently overwriting user data, then "
            "dropping it on the clean branch, is the failure mode this "
            "guard exists for)"
        )
    tagged = F.array(
        *[
            F.when(_row_violation_cond(c), F.lit(c.name))
            for c in checks
        ]
    )
    return df.withColumn(
        "violations", F.filter(tagged, lambda x: x.isNotNull())
    )


def quarantine(
    df: DataFrame, checks: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """Route rows instead of failing jobs: (clean, quarantined) — clean
    rows keep the input schema; quarantined rows carry ``violations``
    naming what they failed, ready for a side sink.  One projection,
    evaluated once per consumed branch (persist upstream if both sides
    feed expensive chains)."""
    v = row_violations(df, checks)
    clean = v.filter(F.size("violations") == 0).drop("violations")
    bad = v.filter(F.size("violations") > 0)
    return clean, bad
