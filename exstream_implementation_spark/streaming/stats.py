"""Streaming corpus statistics — running distinct counts maintained as
per-microbatch HLL sketch appends (operators/approx.py), so "how many
distinct docs/users/urls so far, per source" is answerable at any moment
WITHOUT re-scanning the ingested history.

The state is a tiny append-only sketch log: one row per
(batch_id, *keys) carrying a <= 2^lgk-byte register file.  Reading the
running totals merges the log (hll_union_agg over O(batches x groups)
rows) — the ingest stream itself carries no aggregation state, no
watermark, and no output-mode constraints, which is what makes this
composable with any existing foreachBatch sink (the ingest-dedup arms
attach it with one extra line).

Redelivery: foreachBatch is at-least-once, and a re-run batch appends a
row with the SAME batch_id and identical content.  Distinct estimates
are naturally idempotent under that (HLL union is); the exact ``n_rows``
companion would double-count, so the reader collapses duplicates by
(batch_id, keys) first — the same read-time dedup contract as the
ingest flag tables (streaming/ingest_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from exstream_implementation_spark.operators.approx import (
    SKETCH_COL,
    hll_build,
    hll_estimate,
    hll_merge,
)


def sketch_sink(
    log_path: str, keys: list[str], col: str, lgk: int = 12
):
    """A foreachBatch function (or one stage of a composite sink): append
    this microbatch's per-group sketches to the log.  Batches with no
    rows append nothing."""
    keys = list(keys)

    def _sink(batch: DataFrame, batch_id: int) -> None:
        sk = hll_build(batch, keys, col, lgk=lgk).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        sk.write.mode("append").parquet(log_path)

    return _sink


def start_distinct_monitor(
    spark: SparkSession,
    stream_df: DataFrame,
    log_path: str,
    keys: list[str],
    col: str,
    checkpoint: str,
    lgk: int = 12,
    available_now: bool = False,
):
    """Attach the sketch sink to a streaming frame and start it."""
    writer = stream_df.writeStream.foreachBatch(
        sketch_sink(log_path, keys, col, lgk=lgk)
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def running_distinct(
    spark: SparkSession, log_path: str, keys: list[str]
) -> DataFrame:
    """Current running totals from the sketch log: (*keys, hll_sketch,
    n_rows, distinct_est).  Duplicate (batch_id, keys) rows from
    redelivered batches collapse to one before the merge so ``n_rows``
    stays exact."""
    keys = list(keys)
    log = spark.read.parquet(log_path)
    # redelivery dedup happens at the LOG's grain (batch_id x its build
    # keys), never at the requested rollup grain — grouping by a coarser
    # grain here would collapse distinct log rows into one arbitrary
    # survivor and silently lose their sketches
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
