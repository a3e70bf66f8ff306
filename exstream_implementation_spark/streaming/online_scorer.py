"""End-to-end ONLINE reward scorer — the full streaming C7→C8→explanation
loop in one streaming query (exstream.pdf §6.3's setting; the reference never
built an online path — script_1.py only explains pre-labeled batches).

Composition (all inside one StreamingQuery):
  melted point stream (ano_key, feature, feature_order, seq, label)
    → ``online_feature_rewards``   stateful C7: O(1) state per
      (ano_key, feature), update-mode reward emissions per micro-batch
    → foreachBatch handler: merge the update stream into the serving view of
      latest rewards, then run the BATCH leap filter (C8) + explanation
      assembly over that tiny (anomalies × features) relation and emit the
      refreshed explanation per touched anomaly.

Restart durability: the stateful stage restores its per-key counters from the
checkpoint, but after recovery it only re-emits keys touched by new data — a
serving view held purely in driver memory would silently forget every
(anomaly, feature) not updated since the restart.  ``RewardServingView``
therefore journals every update batch to a parquet reward log keyed by
``batch_id`` and rebuilds latest-per-key from it on start; foreachBatch may
replay the last uncommitted batch after a crash, but replays carry the same
``batch_id`` with identical lifetime values, so the rebuild (max batch_id per
key) is idempotent — the standard compacted-topic/Delta-merge pattern.

Scale notes: the stateful stage shards on (ano_key, feature) across executors
with O(1) bytes per key; the per-batch leap/assembly input is the reward
table — O(#anomalies × #features), independent of stream volume.  Driver
memory for the serving view is bounded by ``max_view_anomalies`` (least
recently updated anomalies are evicted; their explanations were already
emitted and their rewards stay durable in the log).

Ordering semantics: rewards segment in ``seq`` order within a batch and
arrival order across batches (see online_feature_rewards).  Feeding each
feature's rows in the batch engine's (value, type_data) sort order makes the
streaming result converge to the batch pipeline bit-for-bit — pinned by
tests/test_streaming.py::test_online_scorer_end_to_end_matches_batch; the
kill-and-restart parity contract is pinned by
tests/test_streaming.py::test_online_scorer_restart_parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.utils import AnalysisException

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


class RewardServingView:
    """Latest-reward-per-(anomaly, feature) view with an optional durable
    parquet log.

    With ``state_dir``: every update batch is appended to the log with its
    ``batch_id`` and the in-memory map is rebuilt from the log on
    construction (latest ``(batch_id, n_rows)`` wins per key) — so a
    restarted query serves the union of checkpoint-restored and
    pre-restart keys.  Without ``state_dir`` the view is memory-only and
    does NOT survive restarts (fine for availableNow replays and tests).

    ``max_view_anomalies`` bounds driver memory on unbounded streams:
    when the number of distinct anomalies exceeds it, the least recently
    updated anomalies are dropped from the in-memory map (the log keeps
    them durable; re-admission happens on their next update via rebuild
    semantics at the next restart).
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str | None = None,
        max_view_anomalies: int | None = None,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.max_view_anomalies = max_view_anomalies
        # (ano_key, feature, feature_order) -> raw (unrounded) reward
        self.latest: dict[tuple[str, str, int], float] = {}
        # ano_key -> last batch_id that touched it (for LRU eviction)
        self._touched: dict[str, int] = {}
        # anomalies dropped from the in-memory map whose rewards live only
        # in the log; re-admission must reload them before emitting
        self._evicted: set[str] = set()
        if state_dir is not None:
            self._rebuild()

    def _rebuild(self) -> None:
        try:
            log = self.spark.read.parquet(self.state_dir)
        except AnalysisException:
            return  # first start — nothing durable yet
        w = Window.partitionBy("key").orderBy(
            F.desc("batch_id"), F.desc("n_rows")
        )
        rows = (
            log.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("key", "reward", "batch_id")
            .collect()
        )
        for r in rows:
            ano_key, feature, forder = r["key"].split(_SEP)
            self.latest[(ano_key, feature, int(forder))] = r["reward"]
            prev = self._touched.get(ano_key, -1)
            self._touched[ano_key] = max(prev, r["batch_id"])

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> bool:
        """Journal + merge one update micro-batch; returns True if any key
        changed.  ``batch_df`` must carry (key, n_rows, reward)."""
        batch_df = batch_df.persist()
        try:
            updates = batch_df.collect()  # O(touched keys): reward scalars
            if not updates:
                return False
            if self.state_dir is not None:
                (
                    batch_df.select("key", "n_rows", "reward")
                    .withColumn("batch_id", F.lit(batch_id))
                    .write.mode("append")
                    .parquet(self.state_dir)
                )
        finally:
            batch_df.unpersist()
        # a previously-evicted anomaly touched again: its OTHER features'
        # rewards exist only in the log — reload them first, else the leap
        # filter would rank an incomplete reward set and emit a wrong
        # explanation until the next restart
        readmitted = {
            r["key"].split(_SEP, 1)[0] for r in updates
        } & self._evicted
        if readmitted:
            self._reload(readmitted)
            self._evicted -= readmitted
        for r in updates:
            ano_key, feature, forder = r["key"].split(_SEP)
            self.latest[(ano_key, feature, int(forder))] = r["reward"]
            self._touched[ano_key] = batch_id
        self._evict()
        return True

    def _reload(self, ano_keys: set[str]) -> None:
        """Restore the journaled latest rewards for specific anomalies (the
        pruned-scan twin of ``_rebuild``: the log is filtered on the anomaly
        prefix, so the read stays O(touched history), not O(log))."""
        try:
            log = self.spark.read.parquet(self.state_dir)
        except AnalysisException:
            return
        log = log.filter(
            F.substring_index("key", _SEP, 1).isin(list(ano_keys))
        )
        w = Window.partitionBy("key").orderBy(F.desc("batch_id"), F.desc("n_rows"))
        for r in (
            log.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("key", "reward", "batch_id")
            .collect()
        ):
            ano_key, feature, forder = r["key"].split(_SEP)
            self.latest[(ano_key, feature, int(forder))] = r["reward"]
            prev = self._touched.get(ano_key, -1)
            self._touched[ano_key] = max(prev, r["batch_id"])

    def _evict(self) -> None:
        if self.max_view_anomalies is None:
            return
        excess = len(self._touched) - self.max_view_anomalies
        if excess <= 0:
            return
        stale = sorted(self._touched, key=self._touched.__getitem__)[:excess]
        drop = set(stale)
        for ak in stale:
            del self._touched[ak]
        for k in [k for k in self.latest if k[0] in drop]:
            del self.latest[k]
        if self.state_dir is not None:
            self._evicted |= drop

    def as_rows(self, reward_round: int | None):
        return [
            (ak, f, fo, round(rw, reward_round) if reward_round is not None else rw)
            for (ak, f, fo), rw in self.latest.items()
        ]


def start_online_reward_scorer(
    spark: SparkSession,
    melted_stream: DataFrame,
    sink: list,
    reward_round: int | None = 6,
    trigger_available_now: bool = True,
    state_dir: str | None = None,
    checkpoint_dir: str | None = None,
    processing_trigger: str | None = None,
    max_view_anomalies: int | None = None,
):
    """Wire the full online loop; explanation rows append to ``sink`` as
    (batch_id, row).  Returns the StreamingQuery (caller awaits/stops).

    For a restartable production deployment pass BOTH ``checkpoint_dir``
    (stateful-operator recovery) and ``state_dir`` (serving-view recovery);
    with neither, the query is a replay-only pipeline.  Use
    ``processing_trigger`` (e.g. ``"1 second"``) with
    ``trigger_available_now=False`` for an unbounded source.
    """
    rewards_stream = online_feature_rewards(melted_to_keyed(melted_stream))
    view = RewardServingView(spark, state_dir, max_view_anomalies)

    def handle(batch_df: DataFrame, batch_id: int):
        if not view.apply_batch(batch_df, batch_id):
            return
        tbl = spark.createDataFrame(
            view.as_rows(reward_round),
            "ano_key string, feature string, feature_order int, reward double",
        )
        w = Window.partitionBy("ano_key").orderBy(
            F.desc("reward"), F.asc("feature_order")
        )
        ranked = tbl.withColumn("rank", F.row_number().over(w))
        out = assemble_explanations(reward_leap_filter(ranked))
        for row in out.collect():
            sink.append((batch_id, row))

    writer = rewards_stream.writeStream.outputMode("update").foreachBatch(handle)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_trigger is not None:
        writer = writer.trigger(processingTime=processing_trigger)
    return writer.start()
