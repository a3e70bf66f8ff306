"""Deterministic MLM-style token masking — the last transform before a
masked-LM training job reads the packed sequences.

Not in the reference (no training-data stage there).  The pipeline
requirement is the same one sample_mix/assign_splits meet: NO RNG.  A
`rand()`-based masker changes with partitioning, retries and engine, so a
resumed job would train on different masks than the failed one produced.
Here the mask decision for a position is a pure function of
(sequence id, position, salt): hash-Bernoulli over the md5-prefix line,
computed INSIDE a higher-order transform() lambda — one codegen
projection over the token array, no explode, no shuffle, no UDF.  A
different salt draws an independent masking (one per training epoch, the
standard trick for static-masking pipelines that want RoBERTa-style
epoch variety without a dataloader RNG).

Outputs per row: the masked token array plus the masked positions (the
label sites a trainer needs); `transform` + `filter` share the same
per-position decision expression so the two columns can never disagree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_HEX_SPAN = 16 ** 6


def _decide(id_col: str, salt: int, rate: float) -> str:
    """SQL predicate: position i of this row's array is masked."""
    cutoff = int(rate * _HEX_SPAN)
    return (
        f"conv(substr(md5(concat(cast({id_col} as string), ':',"
        f" cast(i as string), ':{salt}')), 1, 6), 16, 10) < {cutoff}"
    )


def mask_tokens(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    rate: float = 0.15,
    salt: int = 0,
    mask_token: str = "<mask>",
    out_col: str = "tokens_masked",
    positions_col: str = "mask_positions",
) -> DataFrame:
    """Add (out_col, positions_col): tokens with ~rate of positions
    replaced by mask_token, and the 0-based masked positions.

    Deterministic in (df[id_col], position, salt) — partitioning-, retry-
    and engine-independent; a python mirror is pinned in pytest.  Empty
    and null arrays pass through (null -> null, [] -> []).
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"mask_tokens: rate must be in [0, 1]: {rate}")
    decide = _decide(id_col, salt, rate)
    # escape backslashes BEFORE quotes: the SQL string parser consumes
    # backslash escapes, so an unescaped '\\m' would silently become 'm'
    mask_lit = mask_token.replace("\\", "\\\\").replace("'", "\\'")
    masked = (
        f"transform({tokens_col}, (t, i) -> CASE WHEN {decide}"
        f" THEN '{mask_lit}' ELSE t END)"
    )
    # positions via a filtered index sequence over the SAME decision expr;
    # sequence(1, n) with n < 1 counts DOWN (ANSI trap) — guard empty
    positions = (
        f"CASE WHEN size({tokens_col}) < 1 THEN"
        f" CASE WHEN {tokens_col} IS NULL THEN NULL ELSE array() END"
        f" ELSE filter(sequence(0, size({tokens_col}) - 1),"
        f" i -> {decide}) END"
    )
    return df.withColumn(out_col, F.expr(masked)).withColumn(
        positions_col, F.expr(positions).cast("array<int>")
    )
