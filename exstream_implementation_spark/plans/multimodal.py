"""Multimodal-column queries: binary payload metadata and the mapInPandas
feature-extraction path, oracle-checked against SQL reimplementations of the
same md5-derived math (see operators.multimodal for the scale rationale)."""

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
@query(
    "mm_binary_meta",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           min(md5(text)) AS min_hash
    FROM documents GROUP BY source
    """,
)
def mm_binary_meta(spark, sf_dir):
    d = attach_payload(load_table(spark, sf_dir, "documents"))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min(F.md5("text")).alias("min_hash"),
    )


# --- mapInPandas feature extraction vs SQL oracle ----------------------------
_FEATS_DUCK = ",\n".join(
    f"           (('0x' || substr(md5(md5(text) || '_{k}'), 1, 8))::BIGINT"
    f" % 100000) / 100000.0 AS f{k}"
    for k in range(FEATURE_DIM)
)


@query(
    "mm_fake_features",
    oracle=f"""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
{_FEATS_DUCK}
    FROM documents
    """,
)
def mm_fake_features(spark, sf_dir):
    d = attach_payload(load_table(spark, sf_dir, "documents"))
    return extract_features(d)


# --- frame sampling: 1 row in → N_FRAMES rows out through mapInPandas --------
@query(
    "mm_frame_sample",
    oracle=f"""
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
    """,
)
def mm_frame_sample(spark, sf_dir):
    d = attach_payload(load_table(spark, sf_dir, "documents"))
    return sample_frames(d)
