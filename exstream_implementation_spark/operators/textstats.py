"""Two corpus-scheduling utilities the quality/packing families sit
between: compression-ratio scoring and quantile length-bucketing.

compression_ratio — the Gopher/FineWeb repetition proxy (Rae et al. 2021
§A1.3): zlib-compressed size over raw size.  Highly repetitive or
templated text compresses far below prose, catching duplication the
n-gram ratios miss (long-range structure, interleaved repeats).  DEFLATE
has no JVM-expression form, so this is an explicit Arrow-batched Python
boundary (the repo's documented slow-path convention): one pandas map per
batch, bytes in/ints out, no per-row Python round trips through the
driver.  Scores are exact and deterministic (zlib level pinned).

length_buckets — sequence-length bucketing for batch scheduling: group
rows into n quantile buckets of a length column so a trainer batches
similar lengths together (padding waste drops from O(max-mean) to
O(intra-bucket spread)).  Boundaries come from ONE approx_percentile
aggregate (t-digest style sketch, bounded error), assignment is a pure
JVM CASE over the broadcast boundaries — no sort, no shuffle of the
corpus."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "compress_ratio",
    level: int = 6,
) -> DataFrame:
    """Add ``out_col`` = len(zlib(text)) / len(text) (double; null text ->
    null, empty text -> null since the ratio is undefined)."""
    import zlib

    cols = list(df.columns)

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            texts = pdf[text_col]
            ratios = []
            for t in texts:
                if t is None or len(t) == 0:
                    ratios.append(None)
                else:
                    raw = t.encode("utf-8")
                    ratios.append(len(zlib.compress(raw, level)) / len(raw))
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(ratios, index=pdf.index, dtype="float64")
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} double"
    return df.mapInPandas(run, schema).select(*cols, out_col)


def length_buckets(
    df: DataFrame,
    length_col: str,
    n_buckets: int = 8,
    out_col: str = "length_bucket",
    accuracy: int = 10_000,
) -> DataFrame:
    """Add ``out_col`` in [0, n_buckets): the quantile bucket of
    ``length_col``.  Boundaries are the (i/n)-quantiles from one
    approx_percentile pass; ties collapse duplicate boundaries, so skewed
    length distributions may fill fewer buckets (ids stay dense in rank
    order).  Null lengths get null buckets."""
    if n_buckets < 2:
        raise ValueError(f"length_buckets: n_buckets must be >= 2: {n_buckets}")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.agg(
        F.expr(
            f"approx_percentile({length_col}, array({', '.join(map(str, qs))}),"
            f" {accuracy})"
        ).alias("bounds")
    ).first()
    bounds = row["bounds"] or []
    # duplicate boundaries (skew) collapse to one edge, keeping ids dense
    edges = sorted(set(b for b in bounds if b is not None))
    expr = F.lit(len(edges))
    for i in range(len(edges) - 1, -1, -1):
        expr = F.when(
            F.col(length_col) <= F.lit(edges[i]), F.lit(i)
        ).otherwise(expr)
    expr = F.when(F.col(length_col).isNull(), F.lit(None)).otherwise(expr)
    return df.withColumn(out_col, expr.cast("int"))
