"""Streaming corpus statistics — running distinct counts (HLL,
operators/approx.py) and running quantiles (KLL, operators/kll.py)
maintained as per-microbatch sketch appends, so "how many distinct
docs/users/urls so far, per source" and "what is p50/p99 of doc length
so far, per source" are answerable at any moment WITHOUT re-scanning the
ingested history.

The state is a tiny sketch log: one row per (batch_id, *keys) carrying a
<= 2^lgk-byte register file, laid out as batch_id partitions.  Reading
the running totals merges the log (hll_union_agg over
O(batches x groups) rows) — the ingest stream itself carries no
aggregation state, no watermark, and no output-mode constraints, which
is what makes this composable with any existing foreachBatch sink (the
ingest-dedup arms attach it with one extra line).

Redelivery: foreachBatch is at-least-once.  The sink is idempotent at
WRITE time — the log is partitioned by ``batch_id`` and written with
dynamic partition overwrite, so a retried batch REPLACES exactly its own
partition (the ingest flag-table contract, streaming/ingest_dedup.py
``_write_flags``; the bare append path is not idempotent under retry).
The reader still collapses per-(batch_id, build-keys) duplicates as
defense in depth, keeping the exact ``n_rows`` companion correct even if
a non-conforming writer appends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from exstream_implementation_spark.operators.approx import (
    SKETCH_COL,
    hll_build,
    hll_estimate,
    hll_merge,
)
from exstream_implementation_spark.operators.kll import (
    K_COL,
    LEVELS_COL,
    kll_build,
    kll_merge,
    kll_quantiles,
)


def _overwrite_batch_partition(sk: DataFrame, log_path: str) -> None:
    """Write one microbatch's sketch rows into their own ``batch_id``
    partition.  Dynamic partition overwrite: a redelivered batch replaces
    its own partition instead of appending a duplicate row set.

    The mode is a PER-WRITER option, not the session conf: this is a
    path-based parquet write, where ``option("partitionOverwriteMode")``
    is honored (unlike the ``insertInto`` path in
    ingest_dedup._write_flags, which must set the session conf).  A
    session-conf set/restore here would race when two sketch sinks share
    one SparkSession — the loser's write would run in STATIC mode and
    mode("overwrite") would truncate the whole log."""
    (
        sk.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(log_path)
    )


def sketch_sink(
    log_path: str, keys: list[str], col: str, lgk: int = 12
):
    """A foreachBatch function (or one stage of a composite sink): write
    this microbatch's per-group sketches into its own ``batch_id``
    partition of the log.  Empty batches write nothing (without the
    guard, a global groupBy over an empty batch would emit one junk
    row when ``keys=[]``)."""
    keys = list(keys)

    def _sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sk = hll_build(batch, keys, col, lgk=lgk).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        _overwrite_batch_partition(sk, log_path)

    return _sink


def _start_monitor(
    stream_df: DataFrame, sink, checkpoint: str, available_now: bool
):
    """The one sink-attach shape every monitor shares."""
    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_distinct_monitor(
    stream_df: DataFrame,
    log_path: str,
    keys: list[str],
    col: str,
    checkpoint: str,
    lgk: int = 12,
    available_now: bool = False,
):
    """Attach the sketch sink to a streaming frame and start it."""
    return _start_monitor(
        stream_df,
        sketch_sink(log_path, keys, col, lgk=lgk),
        checkpoint,
        available_now,
    )


def running_distinct(
    spark: SparkSession, log_path: str, keys: list[str]
) -> DataFrame:
    """Current running totals from the sketch log: (*keys, hll_sketch,
    n_rows, distinct_est).  A log that does not exist yet (the monitor
    started but no batch has committed) yields an EMPTY frame — with
    string-typed key columns, since nothing has recorded the real types
    — rather than a path error."""
    keys = list(keys)
    try:
        log = spark.read.parquet(log_path)
    except AnalysisException:
        key_schema = "".join(f"{k} string, " for k in keys)
        return spark.createDataFrame(
            [],
            f"{key_schema}{SKETCH_COL} binary, n_rows long, "
            "distinct_est long",
        )
    # duplicate collapse happens at the LOG's grain (batch_id x its
    # build keys), never at the requested rollup grain — grouping by a
    # coarser grain here would collapse distinct log rows into one
    # arbitrary survivor and silently lose their sketches
    log_keys = [
        c for c in log.columns if c not in (SKETCH_COL, "n_rows", "batch_id")
    ]
    missing = [k for k in keys if k not in log_keys]
    if missing:
        raise ValueError(
            f"running_distinct: key(s) {missing} not in the sketch log "
            f"(built with keys {log_keys})"
        )
    per_batch = log.groupBy("batch_id", *log_keys).agg(
        F.first(SKETCH_COL).alias(SKETCH_COL),
        F.first("n_rows").alias("n_rows"),
    )
    return hll_estimate(hll_merge(per_batch, keys))


# --- running quantiles (KLL sketch log) --------------------------------------
def quantile_sketch_sink(
    log_path: str, keys: list[str], col: str, k: int = 200
):
    """The KLL twin of ``sketch_sink``: per-microbatch quantile sketches
    into a ``batch_id``-partitioned log, write-time idempotent under
    redelivery.  Same composability contract — one extra line in any
    existing foreachBatch sink."""
    keys = list(keys)

    def _sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sk = kll_build(batch, keys, col, k=k).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        _overwrite_batch_partition(sk, log_path)

    return _sink


def start_quantile_monitor(
    stream_df: DataFrame,
    log_path: str,
    keys: list[str],
    col: str,
    checkpoint: str,
    k: int = 200,
    available_now: bool = False,
):
    """Attach the quantile sketch sink to a streaming frame and start it."""
    return _start_monitor(
        stream_df,
        quantile_sketch_sink(log_path, keys, col, k=k),
        checkpoint,
        available_now,
    )


def running_quantiles(
    spark: SparkSession, log_path: str, keys: list[str], qs: list
) -> DataFrame:
    """Current running quantiles from the KLL sketch log:
    (*keys, kll_levels, kll_k, n_rows, quantiles).  Same contracts as
    ``running_distinct``: a not-yet-created log yields an empty frame
    (string-typed keys), rollups happen at merge time off the one log,
    and per-(batch_id, build-keys) duplicates collapse as defense in
    depth behind the write-time idempotency."""
    keys = list(keys)
    try:
        log = spark.read.parquet(log_path)
    except AnalysisException:
        key_schema = "".join(f"{k} string, " for k in keys)
        return spark.createDataFrame(
            [],
            f"{key_schema}{LEVELS_COL} array<array<double>>, "
            f"{K_COL} int, n_rows long, quantiles array<double>",
        )
    log_keys = [
        c
        for c in log.columns
        if c not in (LEVELS_COL, K_COL, "n_rows", "batch_id")
    ]
    missing = [k for k in keys if k not in log_keys]
    if missing:
        raise ValueError(
            f"running_quantiles: key(s) {missing} not in the sketch log "
            f"(built with keys {log_keys})"
        )
    per_batch = log.groupBy("batch_id", *log_keys).agg(
        F.first(LEVELS_COL).alias(LEVELS_COL),
        F.first(K_COL).alias(K_COL),
        F.first("n_rows").alias("n_rows"),
    )
    return kll_quantiles(kll_merge(per_batch, keys), qs)


# --- running heavy hitters (space-saving summary log) -------------------------
def heavy_hitters_sink(log_path: str, col: str, capacity: int):
    """The space-saving twin of ``sketch_sink``: per-microbatch partition
    summaries (operators/sketches.py) into a ``batch_id``-partitioned
    log.  Each (batch_id, pid) cell is a true summary of disjoint data,
    so the cover-agnostic merge reads running heavy hitters off the log
    with the same presence/bounds guarantees as one batch pass."""
    if capacity < 1:
        # validate at construction: deferring this into the first
        # non-empty microbatch would kill the running query instead
        raise ValueError(f"capacity must be >= 1: {capacity}")

    def _sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        from exstream_implementation_spark.operators.sketches import (
            partition_summaries,
        )

        parts = partition_summaries(batch, col, capacity).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        _overwrite_batch_partition(parts, log_path)

    return _sink


def start_heavy_hitters_monitor(
    stream_df: DataFrame,
    log_path: str,
    col: str,
    checkpoint: str,
    capacity: int = 256,
    available_now: bool = False,
):
    """Attach the heavy-hitters summary sink to a streaming frame."""
    return _start_monitor(
        stream_df,
        heavy_hitters_sink(log_path, col, capacity),
        checkpoint,
        available_now,
    )


def running_heavy_hitters(
    spark: SparkSession, log_path: str, k: int
) -> DataFrame:
    """Current top-``k`` candidates from the summary log:
    (key, count_lo, count_hi, exact) ordered by count_hi desc, key asc.
    Same contracts as the other readers: a not-yet-created log yields an
    empty frame; the log's (batch_id, pid) cells merge with the exact
    cover-agnostic bound math of operators/sketches.py."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    from exstream_implementation_spark.operators.sketches import (
        merge_summary_units,
    )

    try:
        log = spark.read.parquet(log_path)
    except AnalysisException:
        return spark.createDataFrame(
            [], "key string, count_lo long, count_hi long, exact boolean"
        )
    # defense in depth behind the write-time idempotency, same as the
    # other readers: collapse per-(batch, pid, key) duplicates a
    # non-conforming appender could have left, which would double counts
    per_cell = log.groupBy("batch_id", "pid", "key").agg(
        F.first("count_hi").alias("count_hi"),
        F.first("err").alias("err"),
        F.first("floor").alias("floor"),
    )
    return (
        merge_summary_units(per_cell, ["batch_id", "pid"])
        .orderBy(F.desc("count_hi"), F.asc("key"))
        .limit(k)
    )
