"""Sequence packing — fill fixed-size context windows with document chunks.

The training-data step after chunking (plans/text.udtf_token_chunks): short
chunks are greedily packed into sequences of a fixed token capacity so the
trainer wastes as little context as possible.  Exact bin packing is NP-hard;
the industry-standard approximation is first-fit-decreasing (FFD), which
guarantees ≤ 11/9·OPT + 1 bins.

Scale shape: packing is embarrassingly parallel across PACK GROUPS — chunks
hash into ``num_groups`` groups (deterministic by doc), each group packs
independently inside one ``applyInPandas`` call.  Cross-group packing could
only save < 1 sequence per group, while global packing would serialize the
corpus; group count scales with the cluster, state per task is O(group).

Determinism: groups are xxhash-assigned, and FFD scans chunks in
(n_toks desc, doc_id, chunk_idx) order with first-fit over open sequences in
creation order — bit-identical output on every run/cluster layout.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

PACK_SCHEMA = (
    "pack_group int, seq_id long, doc_id long, chunk_idx int, n_toks int, "
    "seq_fill int"
)


def pack_sequences(
    chunks: DataFrame,
    capacity: int,
    num_groups: int = 64,
    id_cols: tuple[str, str] = ("doc_id", "chunk_idx"),
    toks_col: str = "n_toks",
) -> DataFrame:
    """chunks(doc_id, chunk_idx, n_toks) → one row per chunk with its packed
    (pack_group, seq_id) assignment and the final fill of that sequence.
    Chunks longer than ``capacity`` get a dedicated sequence each."""
    doc_col, idx_col = id_cols
    grouped = chunks.withColumn(
        "pack_group",
        F.pmod(F.xxhash64(F.col(doc_col)), F.lit(num_groups)).cast("int"),
    )

    def pack(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(
                [toks_col, doc_col, idx_col], ascending=[False, True, True]
            )
            fills: list[int] = []  # current fill per open sequence
            assign: list[int] = []
            clamped: list[int] = []
            for n in pdf[toks_col].to_numpy():
                # an oversize chunk occupies a dedicated full sequence; its
                # emitted n_toks clamps to capacity so sum(n_toks) per
                # sequence == seq_fill holds unconditionally (a trainer
                # truncates at the context boundary anyway)
                n = int(min(n, capacity))
                clamped.append(n)
                placed = None
                for s, fill in enumerate(fills):
                    if fill + n <= capacity:
                        placed = s
                        break
                if placed is None:
                    placed = len(fills)
                    fills.append(0)
                fills[placed] += n
                assign.append(placed)
            out = pd.DataFrame(
                {
                    "pack_group": pdf["pack_group"].to_numpy(),
                    "seq_id": pd.Series(assign, dtype="int64").to_numpy(),
                    "doc_id": pdf[doc_col].to_numpy(),
                    "chunk_idx": pdf[idx_col].to_numpy(),
                    "n_toks": pd.Series(clamped, dtype="int32").to_numpy(),
                }
            )
            out["seq_fill"] = out["seq_id"].map(
                {s: f for s, f in enumerate(fills)}
            )
            yield out

    # groupBy().applyInPandas hash-partitions on the key itself — no
    # explicit repartition needed
    return (
        grouped.select("pack_group", doc_col, idx_col, toks_col)
        .groupBy("pack_group")
        .applyInPandas(lambda key, pdf: next(pack(iter([pdf]))), PACK_SCHEMA)
    )


def packing_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """One-row summary: sequences, chunks, mean fill factor, waste."""
    seqs = packed.groupBy("pack_group", "seq_id").agg(
        F.first("seq_fill").alias("fill")
    )
    return seqs.agg(
        F.count(F.lit(1)).alias("n_sequences"),
        F.round(F.avg(F.col("fill") / capacity), 4).alias("mean_fill"),
        F.sum(F.lit(capacity) - F.col("fill")).alias("wasted_tokens"),
    )
