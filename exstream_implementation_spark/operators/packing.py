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
Within a group, first-fit runs over a segment tree indexed by sequence
creation order (leftmost open sequence with enough remaining capacity in
O(log m)) — O(n log n) per group, not the O(n·m) of scanning every open
sequence per chunk, with BIT-IDENTICAL first-fit-decreasing assignments.

Determinism: groups are xxhash-assigned, and FFD scans chunks in
(n_toks desc, id_cols) order with first-fit over open sequences in
creation order — bit-identical output on every run/cluster layout.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F


class _LeftmostFit:
    """Max-segment-tree over open sequences in creation order: find the
    LEFTMOST sequence with remaining capacity >= need in O(log m)."""

    def __init__(self):
        self._cap = 1
        self._tree = [-1, -1]  # 1-indexed; leaf i at _cap + i
        self._n = 0

    def _grow(self):
        old_cap, old_tree = self._cap, self._tree
        self._cap *= 2
        tree = [-1] * (2 * self._cap)
        tree[self._cap : self._cap + old_cap] = old_tree[old_cap : 2 * old_cap]
        for i in range(self._cap - 1, 0, -1):
            tree[i] = max(tree[2 * i], tree[2 * i + 1])
        self._tree = tree

    def append(self, remaining: int) -> int:
        if self._n == self._cap:
            self._grow()
        idx = self._n
        self._n += 1
        self.update(idx, remaining)
        return idx

    def update(self, idx: int, remaining: int) -> None:
        i = self._cap + idx
        self._tree[i] = remaining
        i //= 2
        while i:
            self._tree[i] = max(self._tree[2 * i], self._tree[2 * i + 1])
            i //= 2

    def leftmost(self, need: int) -> int | None:
        if self._tree[1] < need:
            return None
        i = 1
        while i < self._cap:
            i = 2 * i if self._tree[2 * i] >= need else 2 * i + 1
        return i - self._cap


def pack_sequences(
    chunks: DataFrame,
    capacity: int,
    num_groups: int = 64,
    id_cols: tuple[str, str] = ("doc_id", "chunk_idx"),
    toks_col: str = "n_toks",
) -> DataFrame:
    """chunks(id_cols..., toks_col) → one row per chunk with its packed
    (pack_group, seq_id) assignment and the final fill of that sequence.
    Chunks longer than ``capacity`` get a dedicated sequence each.

    Output keeps the CALLER'S id/toks column names and types (the schema is
    derived from the input, so string doc ids or long chunk indexes work),
    plus pack_group int, seq_id long, seq_fill int.
    """
    doc_col, idx_col = id_cols
    doc_t = chunks.schema[doc_col].dataType.simpleString()
    idx_t = chunks.schema[idx_col].dataType.simpleString()
    toks_t = chunks.schema[toks_col].dataType.simpleString()
    out_schema = (
        f"pack_group int, seq_id long, {doc_col} {doc_t}, "
        f"{idx_col} {idx_t}, {toks_col} {toks_t}, seq_fill int"
    )
    grouped = chunks.withColumn(
        "pack_group",
        F.pmod(F.xxhash64(F.col(doc_col)), F.lit(num_groups)).cast("int"),
    )

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            # reuse the (empty) input columns so dtypes stay exact — an
            # object-dtyped sentinel makes Arrow concat warn/coerce
            return pd.DataFrame(
                {
                    "pack_group": pd.Series(dtype="int32"),
                    "seq_id": pd.Series(dtype="int64"),
                    doc_col: pdf[doc_col],
                    idx_col: pdf[idx_col],
                    toks_col: pdf[toks_col],
                    "seq_fill": pd.Series(dtype="int32"),
                }
            )
        pdf = pdf.sort_values(
            [toks_col, doc_col, idx_col], ascending=[False, True, True]
        )
        fills: list[int] = []  # current fill per open sequence
        tree = _LeftmostFit()
        assign: list[int] = []
        clamped: list[int] = []
        for n in pdf[toks_col].to_numpy():
            # an oversize chunk occupies a dedicated full sequence; its
            # emitted toks clamp to capacity so sum(toks) per sequence ==
            # seq_fill holds unconditionally (a trainer truncates at the
            # context boundary anyway)
            n = int(min(n, capacity))
            clamped.append(n)
            placed = tree.leftmost(n)
            if placed is None:
                placed = len(fills)
                fills.append(0)
                tree.append(capacity)
            fills[placed] += n
            tree.update(placed, capacity - fills[placed])
            assign.append(placed)
        out = pd.DataFrame(
            {
                "pack_group": pdf["pack_group"].to_numpy(),
                "seq_id": pd.Series(assign, dtype="int64").to_numpy(),
                doc_col: pdf[doc_col].to_numpy(),
                idx_col: pdf[idx_col].to_numpy(),
                toks_col: pd.Series(
                    clamped, dtype=pdf[toks_col].dtype
                ).to_numpy(),
            }
        )
        out["seq_fill"] = out["seq_id"].map(
            {s: f for s, f in enumerate(fills)}
        )
        return out

    # groupBy().applyInPandas hash-partitions on the key itself — no
    # explicit repartition needed
    return (
        grouped.select("pack_group", doc_col, idx_col, toks_col)
        .groupBy("pack_group")
        .applyInPandas(lambda key, pdf: pack_group(pdf), out_schema)
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
