"""Streaming sources.

The reference replays recorded CSV traces in batch (utils/get_data.py:56-106).
Here the same event data becomes a genuine unbounded source: Spark's file
streaming source treats the parquet path as a directory listing and picks up
new files per micro-batch — on a cluster this is the standard landing-zone
ingestion pattern (object store prefix + maxFilesPerTrigger back-pressure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# explicit schema — a streaming source must not run an inference job
EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),  # parquet timestamp[us]
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def events_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream`` over the events parquet with an event-time column.

    Returns the same logical schema as the batch ``load_table(..., 'events')``
    plus ``event_time: timestamp_ntz`` for watermarking/windowing.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the testdata ships events.parquet as a single file; the file streaming
    # source requires a directory, so list the sf dir with a glob filter
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA).option(
        "pathGlobFilter", "events.parquet"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.parquet(sf_dir)
    return _with_event_time(df)


def events_batch_as_stream_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch frame with the exact schema ``events_stream`` produces — the
    unified-API twin used to cross-check streaming results in tests."""
    df = spark.read.schema(EVENTS_STREAM_SCHEMA).parquet(f"{sf_dir}/events.parquet")
    return _with_event_time(df)


def _with_event_time(df: DataFrame) -> DataFrame:
    # watermarks require TIMESTAMP (not NTZ); session timezone is pinned UTC,
    # so the ntz→timestamp cast is an identity relabel (no wall-clock shift)
    return df.withColumn("event_time", F.col("ts").cast("timestamp"))
