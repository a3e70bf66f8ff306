"""Custom stateful operator — online segmentation entropy (C6, streaming).

Batch C6 (reference entropy_based_single_reward_feature.py:157-200) run-length
scans a label sequence and sums p·ln(1/p) per segment, never counting the
final segment (SURVEY Q2).  Online, the sequence is unbounded, so the operator
keeps O(1) state per key and emits the entropy over *closed* segments after
each micro-batch — the still-open run is exactly the "final segment" Q2 drops,
so the streaming semantics converge to the batch value on a finite replay.

Identity used (n = rows seen, l_i = closed-segment lengths):
    H = Σ (l_i/n)·ln(n/l_i) = (ln n)·(Σ l_i)/n − (1/n)·Σ l_i·ln l_i
so state is just (n, Σ l_i, Σ l_i·ln l_i, open-run label, open-run length) —
state-store size is O(#keys), independent of stream length.

Ordering: rows are scanned in ``order_col`` order *within* each micro-batch;
cross-batch order is arrival order.  Feed event-time-sorted batches (e.g. the
file source replaying time-partitioned files) for exact batch parity.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_rows", LongType()),
        StructField("closed_segments", LongType()),
        StructField("seg_entropy", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("closed_len", LongType()),
        StructField("closed_llnl", DoubleType()),
        StructField("closed_segs", LongType()),
        StructField("cur_label", LongType()),
        StructField("cur_len", LongType()),
    ]
)


def _scan(labels, state):
    """Run-length scan continuing from ``state`` tuple; returns new tuple."""
    n, closed_len, closed_llnl, closed_segs, cur_label, cur_len = state
    for lab in labels:
        lab = int(lab)
        if cur_len == 0:
            cur_label, cur_len = lab, 1
        elif lab == cur_label:
            cur_len += 1
        else:
            closed_len += cur_len
            closed_llnl += cur_len * math.log(cur_len)
            closed_segs += 1
            cur_label, cur_len = lab, 1
        n += 1
    return n, closed_len, closed_llnl, closed_segs, cur_label, cur_len


def _entropy(n, closed_len, closed_llnl):
    if n == 0 or closed_len == 0:
        return 0.0
    return (math.log(n) * closed_len - closed_llnl) / n


def online_segmentation_entropy(
    df: DataFrame,
    key_col: str = "key",
    order_col: str = "seq",
    label_col: str = "label",
    timeout_ms: int | None = None,
) -> DataFrame:
    """Apply the online C6 operator to a (streaming or batch) DataFrame with
    columns ``(key_col, order_col, label_col)``; emits one row per key per
    micro-batch in update mode."""

    def fn(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        st = state.get if state.exists else (0, 0, 0.0, 0, -1, 0)
        for pdf in pdf_iter:
            pdf = pdf.sort_values(order_col, kind="mergesort")
            st = _scan(pdf[label_col].to_numpy(), st)
        state.update(st)
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        n, closed_len, closed_llnl, closed_segs = st[0], st[1], st[2], st[3]
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_rows": [n],
                "closed_segments": [closed_segs],
                "seg_entropy": [_entropy(n, closed_len, closed_llnl)],
            }
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def batch_segmentation_entropy_reference(labels) -> float:
    """Driver-side oracle for tests: reference C6 on a finite label list,
    including Q2 (final segment dropped)."""
    st = _scan(labels, (0, 0, 0.0, 0, -1, 0))
    return _entropy(st[0], st[1], st[2])
