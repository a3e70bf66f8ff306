"""End-to-end ONLINE reward scorer — the full streaming C7→C8→explanation
loop in one streaming query (exstream.pdf §6.3's setting; the reference never
built an online path — script_1.py only explains pre-labeled batches).

Composition (all inside one StreamingQuery):
  melted point stream (ano_key, feature, feature_order, seq, label)
    → ``online_feature_rewards``   stateful C7: O(1) state per
      (ano_key, feature), update-mode reward emissions per micro-batch
    → foreachBatch handler: merge the update stream into the materialized
      latest-reward view, then run the BATCH leap filter (C8) + explanation
      assembly over that tiny (anomalies × features) relation and emit the
      refreshed explanation per touched anomaly.

Scale notes: the stateful stage shards on (ano_key, feature) across
executors with O(1) bytes per key; the per-batch leap/assembly input is the
reward table — O(#anomalies × #features), independent of stream volume.  The
handler's materialized view is the standard compacted-topic/Delta-merge
pattern; here it lives in the handler closure (a driver dict of reward
scalars) which is exactly its size on a cluster deployment's driver too.

Ordering semantics: rewards segment in ``seq`` order within a batch and
arrival order across batches (see online_feature_rewards).  Feeding each
feature's rows in the batch engine's (value, type_data) sort order makes the
streaming result converge to the batch pipeline bit-for-bit — pinned by
tests/test_streaming.py::test_online_scorer_end_to_end_matches_batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from exstream_implementation_spark.operators.leap import (
    assemble_explanations,
    reward_leap_filter,
)
from exstream_implementation_spark.streaming.stateful import (
    online_feature_rewards,
)

_SEP = "\x1f"


def melted_to_keyed(melted: DataFrame) -> DataFrame:
    """(ano_key, feature, feature_order, seq, label) → the stateful
    operator's (key, seq, label) input; key packs the composite so state
    shards on (ano_key, feature)."""
    return melted.select(
        F.concat_ws(
            _SEP, "ano_key", "feature", F.col("feature_order").cast("string")
        ).alias("key"),
        "seq",
        "label",
    )


def start_online_reward_scorer(
    spark: SparkSession,
    melted_stream: DataFrame,
    sink: list,
    reward_round: int | None = 6,
    trigger_available_now: bool = True,
):
    """Wire the full online loop; explanation rows append to ``sink`` as
    (batch_id, row).  Returns the StreamingQuery (caller awaits/stops)."""
    rewards_stream = online_feature_rewards(melted_to_keyed(melted_stream))
    latest: dict[tuple[str, str, int], float] = {}

    def handle(batch_df: DataFrame, batch_id: int):
        updates = batch_df.collect()  # O(touched keys): reward scalars only
        if not updates:
            return
        for r in updates:
            ano_key, feature, forder = r["key"].split(_SEP)
            latest[(ano_key, feature, int(forder))] = r["reward"]
        rows = [
            (ak, f, fo, round(rw, reward_round) if reward_round is not None else rw)
            for (ak, f, fo), rw in latest.items()
        ]
        tbl = spark.createDataFrame(
            rows, "ano_key string, feature string, feature_order int, reward double"
        )
        w = Window.partitionBy("ano_key").orderBy(
            F.desc("reward"), F.asc("feature_order")
        )
        ranked = tbl.withColumn("rank", F.row_number().over(w))
        out = assemble_explanations(reward_leap_filter(ranked))
        for row in out.collect():
            sink.append((batch_id, row))

    writer = rewards_stream.writeStream.outputMode("update").foreachBatch(handle)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
