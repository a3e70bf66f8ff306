"""Multimodal-column queries: binary payload metadata and the mapInPandas
feature-extraction path, oracle-checked against SQL reimplementations of the
same md5-derived math (see operators.multimodal for the scale rationale).

Catalog slot: ``multimodal_suite`` unions the three branches (payload
metadata, Arrow-batched feature extraction, 1→N frame sampling) canonicalized
to one schema under one oracle — same evidence as three slots, one
driver-budget entry.  The per-branch functions stay as the package API.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from exstream_implementation_spark.operators.multimodal import (
    attach_payload,
    extract_features,
    sample_frames,
    FEATURE_DIM,
    N_FRAMES,
)
from exstream_implementation_spark.plans.registry import query
from exstream_implementation_spark.sources import load_table


# --- binary payload + metadata (pure JVM path) -------------------------------
def mm_binary_meta(spark, sf_dir):
    d = attach_payload(load_table(spark, sf_dir, "documents"))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min(F.md5("text")).alias("min_hash"),
    )


# --- mapInPandas feature extraction vs SQL oracle ----------------------------
def mm_fake_features(spark, sf_dir):
    d = attach_payload(load_table(spark, sf_dir, "documents"))
    return extract_features(d)


# --- frame sampling: 1 row in → N_FRAMES rows out through mapInPandas --------
def mm_frame_sample(spark, sf_dir):
    d = attach_payload(load_table(spark, sf_dir, "documents"))
    return sample_frames(d)


_FRAMES_DUCK = f"""
    WITH p AS (
      SELECT doc_id, lower(hex(encode(text))) AS hx,
             octet_length(encode(text)) // {N_FRAMES} AS q
      FROM documents
    ),
    frames AS (
      SELECT doc_id, k.range::INT AS frame_idx, q::INT AS frame_bytes,
             md5(substring(hx, 2 * k.range * q + 1, 2 * q)) AS frame_hash
      FROM p, range({N_FRAMES}) k
      WHERE q > 0
    )
    SELECT doc_id, frame_idx, frame_bytes, frame_hash FROM frames
"""


@query(
    "multimodal_suite",
    oracle=f"""
    SELECT 'meta' AS branch, source AS key,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS n,
           CAST(count(*) AS DOUBLE) AS v,
           min(md5(text)) AS h
    FROM documents GROUP BY source
    UNION ALL
    SELECT 'feat' AS branch,
           doc_id::VARCHAR || ':' || k.range::VARCHAR AS key,
           CAST(octet_length(encode(text)) AS BIGINT) AS n,
           (('0x' || substr(md5(md5(text) || '_' || k.range::VARCHAR), 1, 8))::BIGINT
             % 100000) / 100000.0 AS v,
           '' AS h
    FROM documents, range({FEATURE_DIM}) k
    UNION ALL
    SELECT 'frame' AS branch,
           doc_id::VARCHAR || ':' || frame_idx::VARCHAR AS key,
           CAST(frame_bytes AS BIGINT) AS n,
           CAST(0.0 AS DOUBLE) AS v,
           frame_hash AS h
    FROM ({_FRAMES_DUCK})
    """,
)
def multimodal_suite(spark, sf_dir):
    meta = mm_binary_meta(spark, sf_dir).select(
        F.lit("meta").alias("branch"),
        F.col("source").alias("key"),
        F.col("total_bytes").cast("long").alias("n"),
        F.col("n_docs").cast("double").alias("v"),
        F.col("min_hash").alias("h"),
    )
    stack_args = ", ".join(f"'{k}', f{k}" for k in range(FEATURE_DIM))
    feat = (
        mm_fake_features(spark, sf_dir)
        .select(
            "doc_id",
            "n_bytes",
            F.expr(f"stack({FEATURE_DIM}, {stack_args}) as (k, fval)"),
        )
        .select(
            F.lit("feat").alias("branch"),
            F.concat(
                F.col("doc_id").cast("string"), F.lit(":"), F.col("k")
            ).alias("key"),
            F.col("n_bytes").cast("long").alias("n"),
            F.col("fval").alias("v"),
            F.lit("").alias("h"),
        )
    )
    frame = mm_frame_sample(spark, sf_dir).select(
        F.lit("frame").alias("branch"),
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.col("frame_idx").cast("string"),
        ).alias("key"),
        F.col("frame_bytes").cast("long").alias("n"),
        F.lit(0.0).cast("double").alias("v"),
        F.col("frame_hash").alias("h"),
    )
    return meta.unionByName(feat).unionByName(frame)
