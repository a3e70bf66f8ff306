"""Spark-4 native stateful operator (transformWithStateInPandas): per-key
online moment tracking via Welford's algorithm.

This is the modern successor to ``applyInPandasWithState`` (which backs
``stateful.online_segmentation_entropy``): typed value state in the state
store, Arrow-batched input, and timer support. We use it for the streaming
half of the paper's online setting (exstream.pdf §6.3): maintain each
metric's running (n, mean, variance) forever with O(1) state per key, so any
incoming window can be z-scored against the *lifetime* profile without
re-aggregating history — the streaming analogue of the batch
``reference_profile`` join in streaming/scoring.py.

State-store size is O(#keys) — independent of stream length — so the
operator survives unbounded streams; keys shard across executors by the
groupBy hash, so throughput scales with the cluster.

Environment note: the transformWithState Python worker protocol imports
``google.protobuf``; containers without protobuf can't run it locally (the
parity test import-skips), but the operator is stock Spark 4 API and needs
nothing beyond pyspark on a real cluster. It also requires the RocksDB state
store provider (`spark.sql.streaming.stateStore.providerClass`).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
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
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("std_pop", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("m2", DoubleType()),
    ]
)


class WelfordProcessor(StatefulProcessor):
    """Running (count, mean, M2) per key; emits the lifetime stats after each
    micro-batch. Welford's update is numerically stable at any n — no
    sum-of-squares cancellation."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("welford", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            n, mean, m2 = self._state.get()
        else:
            n, mean, m2 = 0, 0.0, 0.0
        for pdf in rows:
            for v in pdf["value"].astype(float):
                n += 1
                d = v - mean
                mean += d / n
                m2 += d * (v - mean)
        self._state.update((n, mean, m2))
        std = math.sqrt(m2 / n) if n > 0 else 0.0
        yield pd.DataFrame(
            {"key": [key[0]], "n": [n], "mean": [mean], "std_pop": [std]}
        )

    def close(self) -> None:
        pass


def online_moments(keyed: DataFrame) -> DataFrame:
    """(key string, value double) stream → per-batch lifetime
    (key, n, mean, std_pop) via the transformWithState state store."""
    return keyed.groupBy("key").transformWithStateInPandas(
        WelfordProcessor(), OUTPUT_SCHEMA, outputMode="Update", timeMode="None"
    )
