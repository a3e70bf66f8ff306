"""Multimodal column plumbing — binary payloads with typed metadata.

The reference has no media pipeline; this is the BASELINE.json north-star
extension for 100 TB training-data work: treat image/audio/video as opaque
``binary`` columns plus metadata, with decode / feature-extraction running as
Arrow-batched ``mapInPandas`` so each Python worker touches one partition's
batches, never the driver.

The actual media codecs are NOT available in this container, so
``decode_image`` raises NotImplementedError by design; ``fake_features``
is a deterministic md5-derived stand-in with the same Spark-side contract
(schema, batching, partitioning) so the plumbing is fully testable — and,
because it is hash-derived, even oracle-checkable in SQL
(plans.multimodal.mm_fake_features).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_DIM = 4


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Opaque binary payload column + byte-length metadata (stand-in for an
    image/audio blob ingested from object storage)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "n_bytes", F.length(F.col("payload"))
    )


def decode_image(payload: bytes) -> "object":
    """Real media decode — requires PIL/libvips/ffmpeg, absent here."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "swap in PIL.Image.open / torchaudio.load on a real cluster"
    )


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Real resize — decode + PIL.Image.resize on a real cluster."""
    raise NotImplementedError("media codecs absent; see decode_image")


def sample_video_frames(payload: bytes, fps: float) -> list:
    """Real frame sampling — ffmpeg/pyav on a real cluster."""
    raise NotImplementedError("media codecs absent; see decode_image")


def _fake_feature(payload: bytes, k: int) -> float:
    """Deterministic stand-in feature: md5(md5(payload) + '_k') scaled to
    [0, 1). Mirrors the SQL formula in plans.multimodal exactly."""
    inner = hashlib.md5(payload).hexdigest()
    h = hashlib.md5(f"{inner}_{k}".encode()).hexdigest()
    return (int(h[:8], 16) % 100000) / 100000.0


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each batch is decoded (here: faked) vectorized in the
    worker; output is (id, n_bytes, f0..f3). On a real cluster this is where
    resize / frame-sample / mel-spectrogram would run.
    """
    schema = (
        f"{id_col} long, n_bytes int, "
        + ", ".join(f"f{k} double" for k in range(FEATURE_DIM))
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                id_col: pdf[id_col],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
            }
            for k in range(FEATURE_DIM):
                out[f"f{k}"] = pdf["payload"].map(
                    lambda p, k=k: _fake_feature(bytes(p), k)
                )
            yield pd.DataFrame(out)

    return df.select(id_col, "payload").mapInPandas(batches, schema)


N_FRAMES = 4


def sample_frames(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling plumbing: one input row → N_FRAMES output rows, the
    variable-cardinality mapInPandas shape a real video frame sampler has.
    The "frames" are deterministic equal byte chunks (remainder dropped) with
    an md5 content hash — swap the chunking for ffmpeg keyframe extraction on
    a real cluster; the Spark contract (schema, batching, fan-out) is what
    this exercises, and the md5 math keeps it oracle-checkable in SQL.
    """
    schema = f"{id_col} long, frame_idx int, frame_bytes int, frame_hash string"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, sizes, hashes = [], [], [], []
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                data = bytes(payload)
                q = len(data) // N_FRAMES
                if q == 0:
                    continue
                for k in range(N_FRAMES):
                    chunk = data[k * q : (k + 1) * q]
                    ids.append(did)
                    idxs.append(k)
                    sizes.append(len(chunk))
                    # hash the hex encoding: DuckDB's md5 is VARCHAR-only, so
                    # the oracle can reproduce this without blob md5 support
                    hashes.append(hashlib.md5(chunk.hex().encode()).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_bytes": pd.Series(sizes, dtype="int32"),
                    "frame_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, schema)
