"""Scalar int8 embedding quantization (SQ8) — 4x smaller vector storage
with near-exact retrieval, the simple sibling of product quantization
(operators/pq.py): PQ buys 32-64x compression at codebook-training cost;
SQ8 buys 4x with NO training beyond one min/max pass and keeps per-dim
resolution, which is why serving stacks (FAISS ScalarQuantizer, Lucene
int8 HNSW) default to it for the first compression step.

Per dimension d: code = round((x - min_d) / (max_d - min_d) * 255) - 128,
stored as ``array<tinyint>``; decode reconstructs the level midpoint'
grid point and the reconstruction error is bounded by half a level:
|x - decode(encode(x))| <= (max_d - min_d) / 255 / 2 (+ float eps),
pinned by tests.  Values outside the trained range clamp to the edge
levels (the append case: new vectors slightly outside yesterday's range
degrade gracefully instead of wrapping).

Execution shape: training is ONE aggregation (posexplode -> per-dim
min/max — n*d tiny rows with map-side combine, the operators/pca.py
moment pattern) with a d-sized bounded collect; encode/decode are pure
whole-stage-codegen array transforms (no UDF, no shuffle); search
decodes in-expression and delegates to the exact dense_topk fold, so
recall loss comes ONLY from quantization, not from a different ranking
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LEVELS = 255  # 256 int8 values, 255 inter-level gaps


def train_sq(embs: DataFrame, vec_col: str = "embedding") -> dict:
    """Per-dimension (min, max) over the corpus: one aggregation, one
    d-sized collect (bounded — same contract as the kmeans centroid
    fetch).  Returns {"mins": [d floats], "maxs": [d floats], "dim": d}."""
    rows = (
        embs.select(F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.min("x").alias("lo"),
            F.max("x").alias("hi"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .collect()
    )
    if not rows:
        raise ValueError("train_sq: no vectors")
    by_pos = {r["pos"]: (float(r["lo"]), float(r["hi"])) for r in rows}
    dim = max(by_pos) + 1
    # positions are contiguous by construction (posexplode), so raggedness
    # shows up as UNEQUAL per-position row counts, not as gaps: a corpus
    # of all-equal-length vectors has every position in exactly n rows
    counts = {int(r["cnt"]) for r in rows}
    if len(counts) != 1:
        raise ValueError(
            "train_sq: ragged vector lengths (per-dimension row counts "
            f"range {min(counts)}..{max(counts)})"
        )
    return {
        "mins": [by_pos[i][0] for i in range(dim)],
        "maxs": [by_pos[i][1] for i in range(dim)],
        "dim": dim,
    }


def _arr_lit(vals) -> F.Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def sq_encode(
    df: DataFrame,
    params: dict,
    vec_col: str = "embedding",
    out_col: str = "sq_code",
) -> DataFrame:
    """array<float> → array<tinyint>, clamped to the trained range; a
    constant dimension (max == min) encodes to level 0."""
    mins, maxs = _arr_lit(params["mins"]), _arr_lit(params["maxs"])
    code = F.transform(
        F.col(vec_col),
        lambda x, i: (
            F.round(
                F.least(
                    F.lit(float(LEVELS)),
                    F.greatest(
                        F.lit(0.0),
                        (x - F.element_at(mins, i + 1))
                        / F.nullif(
                            F.element_at(maxs, i + 1)
                            - F.element_at(mins, i + 1),
                            F.lit(0.0),
                        )
                        * LEVELS,
                    ),
                )
            ).cast("int")
            - 128
        ).cast("tinyint"),
    )
    # constant dimension: nullif makes the division NULL, and greatest()
    # SKIPS null arguments (Spark semantics), so the level lands on 0 and
    # the code on -128 — decode then reconstructs exactly min_d
    return df.withColumn(out_col, code)


def sq_decode(
    df: DataFrame,
    params: dict,
    code_col: str = "sq_code",
    out_col: str = "embedding",
) -> DataFrame:
    """array<tinyint> → array<float> on the trained grid."""
    mins, maxs = _arr_lit(params["mins"]), _arr_lit(params["maxs"])
    dec = F.transform(
        F.col(code_col),
        lambda c, i: (
            F.element_at(mins, i + 1)
            + (c.cast("double") + 128.0)
            / LEVELS
            * (F.element_at(maxs, i + 1) - F.element_at(mins, i + 1))
        ).cast("float"),
    )
    return df.withColumn(out_col, dec)


def sq_topk(
    spark: SparkSession,
    encoded: DataFrame,
    queries_vec: DataFrame,
    params: dict,
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "sq_code",
) -> DataFrame:
    """Exact top-k over the DECODED int8 corpus — the ranking path is
    byte-for-byte dense_topk (plans/search.py), so any recall loss is
    attributable to quantization alone.  Full-precision queries score
    against reconstructed corpus vectors (the FAISS asymmetric-distance
    convention — quantizing the query too would double the error)."""
    from exstream_implementation_spark.plans.search import dense_topk

    decoded = sq_decode(
        encoded.select(id_col, code_col), params, code_col, "__dec"
    )
    return dense_topk(
        spark, decoded, queries_vec, k=k, id_col=id_col, emb_col="__dec"
    )
