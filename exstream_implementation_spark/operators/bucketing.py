"""Bucketed storage for co-located, shuffle-free joins.

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both sides.
Writing both tables bucketed by the join key (same bucket count) lets Spark
plan a SortMergeJoin with NO Exchange on either side — each task joins bucket
i of A with bucket i of B straight off storage.  This is the standard
pre-partitioning lever the reference (single-process pandas) has no notion of.

``write_bucketed`` uses the native Spark bucketing protocol (saveAsTable —
bucket metadata lives in the session catalog); ``read_bucketed`` is just a
table read, included for symmetry.  Tests prove the no-Exchange plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
