"""IVF-PQ: the persisted, compressed ANN serving index — coarse IVF cells
(operators/kmeans.py) over residual product-quantization codes
(operators/pq.py), the composition from Jegou et al. 2011 §IV that real
billion-vector deployments (faiss IVFxx,PQyy) run.

Why this exists next to the plain IVF index (operators/ann_index.py): that
index stores RAW vectors per cell — right when the corpus fits storage,
wrong at 100 TB of embeddings where the assignment table IS the cost.
Here the per-vector payload is the m-byte PQ code (32x smaller at 64-dim
float32), and probe-time scoring is a lookup-table gather, not vector
arithmetic.  Residual encoding (quantize x - centroid(x), not x) is what
makes the small codebook sharp: residuals live in a ball around the cell
centroid, so the quantizer spends its 2^bits on local structure.

Lifecycle mirrors ann_index.py:

  build_ivfpq_index  coarse Lloyd train -> assign -> train PQ on the
                     residuals -> persist three tables:
                       {name}_centroids (cell, cemb)           k x dim
                       {name}_codebooks (sub, cell, cemb)      m*ksub rows
                       {name}_codes     (cell, vec_id, code)   BUCKETED by
                                        cell, m ints per row — the only
                                        corpus-sized table, and it is tiny
  load / probe       probe ranks cells driver-side (centroids are bounded),
                     builds one (m, ksub) lookup table per (query, probed
                     cell) from the query RESIDUAL, scans only the probed
                     cells (bucketed filter pushes to the scan), and scores
                     each code as a fancy-gather sum.  Local top-k per
                     partition bounds the ranking shuffle at k rows per
                     (query, partition).

Recall is approximate twice (cell pruning + quantization); the pytest gate
pins recall@5 >= 0.8 vs exact L2 on the testdata embeddings with modest
nprobe, and the ADC==residual-reconstruction identity is inherited from
operators/pq.py.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from exstream_implementation_spark.operators.bucketing import write_bucketed
from exstream_implementation_spark.operators.kmeans import _assign, kmeans_train
from exstream_implementation_spark.operators.pq import (
    PQModel,
    encode_pq,
    train_pq,
)

_RESIDUAL = "zip_with(embedding, cemb, (x, y) -> cast(x as double) - y)"


def _rotate_frame(vecs: DataFrame, rotation: np.ndarray,
                  mean: np.ndarray) -> DataFrame:
    """(vec_id, embedding) → same schema, embedding := (x - mean) @ R.
    Arrow-batched matmul via the shared PCA transform."""
    from exstream_implementation_spark.operators.pca import (
        PCAModel,
        transform_pca,
    )

    ones = np.ones(rotation.shape[1])
    rot_model = PCAModel(mean=mean, components=rotation,
                         eigvals=ones, explained_ratio=ones)
    return transform_pca(
        vecs.select("vec_id", "embedding"), rot_model,
        vec_col="embedding", out_col="__rot",
    ).select("vec_id", F.col("__rot").alias("embedding"))


def _load_rotation(
    spark: SparkSession, name: str
) -> tuple[np.ndarray | None, np.ndarray | None]:
    """The persisted OPQ pre-rotation, or (None, None) for a plain-PQ
    index (also the shape every pre-r11 persisted index loads as)."""
    if not spark.catalog.tableExists(f"{name}_rotation"):
        return None, None
    rows = {r["idx"]: r["vals"]
            for r in spark.table(f"{name}_rotation").collect()}
    mean = np.array(rows.pop(-1), dtype=np.float64)
    rotation = np.array(
        [rows[i] for i in sorted(rows)], dtype=np.float64
    )
    return rotation, mean


def build_ivfpq_index(
    spark: SparkSession,
    vecs: DataFrame,
    name: str,
    k_cells: int = 8,
    m: int = 8,
    ksub: int = 16,
    max_iter: int = 5,
    n_buckets: int = 16,
    opq: bool = False,
) -> dict:
    """Train coarse cells + residual PQ and persist the three tables.
    Returns {n_vectors, k_effective, dim, m, code_bytes, raw_bytes}.

    ``opq=True`` trains ONE parametric-OPQ pre-rotation (PCA basis with
    balanced eigenvalue allocation — operators/pq.py's
    `_balanced_eig_permutation`, the faiss OPQ init) on the input and
    applies it BEFORE coarse assignment, so cells, residuals and the
    residual codebooks all live in the rotated frame (the faiss
    "OPQ<m>,IVF<k>,PQ<m>" pre-transform composition).  The rotation is
    orthonormal, so rotated-space L2 == original-space L2: probe results
    rank identically to an un-rotated index in the exact limit, and
    recall gates against original-space ground truth stay valid.  The
    rotation+mean persist in ``{name}_rotation``; probe and append load
    and apply it transparently."""
    rotation = mean = None
    if opq:
        from exstream_implementation_spark.operators.pca import fit_pca
        from exstream_implementation_spark.operators.pq import (
            _balanced_eig_permutation,
        )

        head = vecs.select("embedding").first()
        d = len(head["embedding"])
        if d % m != 0:
            raise ValueError(f"build_ivfpq_index: dim {d} not divisible by m={m}")
        pca = fit_pca(vecs, vec_col="embedding", k=d)
        perm = _balanced_eig_permutation(pca.eigvals, m, d // m)
        rotation, mean = pca.components[:, perm], pca.mean
        vecs = _rotate_frame(vecs, rotation, mean)
        rot_rows = [(-1, [float(v) for v in mean])] + [
            (i, [float(v) for v in rotation[i]]) for i in range(d)
        ]
        spark.createDataFrame(
            rot_rows, "idx int, vals array<double>"
        ).write.mode("overwrite").format("parquet").saveAsTable(
            f"{name}_rotation"
        )
    else:
        # a rebuild without opq must not leave a stale rotation behind
        spark.sql(f"DROP TABLE IF EXISTS {name}_rotation")
    cents, _hist = kmeans_train(vecs, k=k_cells, max_iter=max_iter)
    cents.write.mode("overwrite").format("parquet").saveAsTable(
        f"{name}_centroids"
    )
    cents_b = F.broadcast(spark.table(f"{name}_centroids"))
    assigned = (
        _assign(vecs, cents_b)
        .select("cell", "vec_id", "embedding")
        .join(cents_b, "cell")
        .select("cell", "vec_id", F.expr(_RESIDUAL).alias("residual"))
        .persist()
    )
    try:
        model = train_pq(
            assigned, m=m, ksub=ksub, max_iter=max_iter,
            id_col="vec_id", vec_col="residual",
        )
        codes = encode_pq(
            assigned, model, id_col="vec_id", vec_col="residual"
        ).join(assigned.select("vec_id", "cell"), "vec_id")
        write_bucketed(
            codes.select("cell", "vec_id", "code"), f"{name}_codes",
            ["cell"], n_buckets=n_buckets, sort_cols=["cell", "vec_id"],
        )
    finally:
        assigned.unpersist()
    book_rows = [
        (i, c, [float(v) for v in model.codebooks[i][c]])
        for i in range(model.m)
        for c in range(len(model.codebooks[i]))
    ]
    spark.createDataFrame(
        book_rows, "sub int, cell int, cemb array<double>"
    ).write.mode("overwrite").format("parquet").saveAsTable(
        f"{name}_codebooks"
    )
    stats = vecs.agg(
        F.count(F.lit(1)).alias("n"), F.max(F.size("embedding")).alias("dim")
    ).first()
    k_eff = spark.table(f"{name}_centroids").count()
    # n_trained pins what BOTH the coarse cells and the codebooks were fit
    # on; appends advance n_vectors only (same staleness contract as
    # ann_index.py)
    spark.createDataFrame(
        [(int(stats["n"]), int(stats["n"]), int(k_eff), int(stats["dim"]),
          model.m)],
        "n_vectors long, n_trained long, k int, dim int, m int",
    ).write.mode("overwrite").format("parquet").saveAsTable(f"{name}_meta")
    return {
        "n_vectors": int(stats["n"]), "k_effective": int(k_eff),
        "dim": int(stats["dim"]), "m": model.m,
        "code_bytes": model.code_bytes, "raw_bytes": model.raw_bytes,
    }


def append_to_ivfpq_index(
    spark: SparkSession, name: str, new_vecs: DataFrame
) -> int:
    """Assign + residual-encode NEW vectors against the EXISTING centroids
    and codebooks and append their codes — the cheap between-retrains path
    (no Lloyd, no codebook update).  Quantization error for appended
    vectors grows as the data distribution drifts from the trained one;
    ``ivfpq_is_stale`` measures that drift by corpus growth, exactly like
    the raw-vector index."""
    cents_b = F.broadcast(spark.table(f"{name}_centroids"))
    model = load_pq_model(spark, name)
    rotation, mean = _load_rotation(spark, name)
    if rotation is not None:
        new_vecs = _rotate_frame(new_vecs, rotation, mean)
    assigned = (
        _assign(new_vecs, cents_b)
        .select("cell", "vec_id", "embedding")
        .join(cents_b, "cell")
        .select("cell", "vec_id", F.expr(_RESIDUAL).alias("residual"))
    )
    codes = encode_pq(
        assigned, model, id_col="vec_id", vec_col="residual"
    ).join(assigned.select("vec_id", "cell"), "vec_id")
    # catalog insert path routes rows through the existing bucket spec
    codes.select("cell", "vec_id", "code").write.mode("append").insertInto(
        f"{name}_codes"
    )
    n_new = int(new_vecs.count())
    meta = spark.table(f"{name}_meta").first()
    spark.createDataFrame(
        [(int(meta["n_vectors"]) + n_new, int(meta["n_trained"]),
          int(meta["k"]), int(meta["dim"]), int(meta["m"]))],
        "n_vectors long, n_trained long, k int, dim int, m int",
    ).write.mode("overwrite").format("parquet").saveAsTable(f"{name}_meta")
    return n_new


def ivfpq_is_stale(
    spark: SparkSession, name: str, growth_threshold: float = 0.2
) -> bool:
    """True when appends grew the corpus more than ``growth_threshold``
    past what the centroids AND codebooks were trained on — time to
    rebuild before quantization error drifts."""
    meta = spark.table(f"{name}_meta").first()
    return meta["n_vectors"] > meta["n_trained"] * (1.0 + growth_threshold)


def load_pq_model(spark: SparkSession, name: str) -> PQModel:
    """Rebuild the PQModel from the persisted codebook table — no training
    lineage, works from a cold session."""
    rows = spark.table(f"{name}_codebooks").collect()
    m = 1 + max(r["sub"] for r in rows)
    books = []
    for i in range(m):
        sub = sorted((r for r in rows if r["sub"] == i), key=lambda r: r["cell"])
        books.append(np.array([r["cemb"] for r in sub], dtype=np.float64))
    dsub = books[0].shape[1]
    return PQModel(dim=m * dsub, m=m, dsub=dsub, codebooks=tuple(books),
                   inertia=())


def probe_ivfpq_index(
    spark: SparkSession,
    name: str,
    queries: np.ndarray,
    query_ids: np.ndarray,
    nprobe: int = 3,
    k_neighbors: int = 5,
    dist_round: int = 6,
) -> DataFrame:
    """Top-k by ADC distance over the probed cells only.

    queries (q, d) / query_ids (q,) are the bounded side.  Driver ranks
    cells from the persisted centroid table (k x dim — bounded), builds a
    residual LUT per (query, probed cell), and the codes scan is filtered
    to the probed cells (partition-prunable on the bucketed table).
    Returns (query_id, neighbor_id, adist, rank).

    Self-exclusion contract (same as probe_ivf_index): a corpus vector
    whose vec_id EQUALS the query's query_id is never returned — use
    corpus ids as query ids to ask "neighbors of corpus member X", or
    ids outside the corpus id space for external query vectors.  (The
    raw scorer pq_adc_topk does NO such masking.)
    """
    q = np.asarray(queries, dtype=np.float64)
    qids = np.asarray(query_ids, dtype=np.int64)
    if len(q) == 0:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, adist double, rank int"
        )
    # an OPQ index lives in its rotated frame: rotate the queries into it
    # (orthonormal, so ADC distances remain original-space L2 estimates)
    rotation, mean = _load_rotation(spark, name)
    if rotation is not None:
        q = (q - mean) @ rotation
    model = load_pq_model(spark, name)
    m, dsub = model.m, model.dsub
    cent_rows = spark.table(f"{name}_centroids").collect()  # k x dim, bounded
    cells = np.array([r["cell"] for r in cent_rows])
    cmat = np.array([r["cemb"] for r in cent_rows], dtype=np.float64)
    # rank cells per query, deterministic tie-break on cell id
    d2 = ((q[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)  # (q, k)
    order = np.lexsort((np.broadcast_to(cells, d2.shape), d2), axis=1)
    probed = order[:, : min(nprobe, len(cells))]
    # LUTs keyed by (cell -> [(query_index, m lut arrays)])
    by_cell: dict = {}
    for qi in range(len(q)):
        for oi in probed[qi]:
            cell = int(cells[oi])
            resid = q[qi] - cmat[oi]
            lut = [
                np.sum(
                    (model.codebooks[i] - resid[i * dsub:(i + 1) * dsub]) ** 2,
                    axis=1,
                )
                for i in range(m)
            ]
            by_cell.setdefault(cell, []).append((qi, lut))
    codes = spark.table(f"{name}_codes").filter(
        F.col("cell").isin([int(c) for c in by_cell])
    )

    def score(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            out = []
            for cell, grp in pdf.groupby("cell"):
                probes = by_cell.get(int(cell))
                if not probes:
                    continue
                cmat_codes = np.stack(grp["code"].to_numpy())
                ids = grp["vec_id"].to_numpy()
                kk = min(k_neighbors, len(ids))
                for qi, lut in probes:
                    dist = np.zeros(len(ids))
                    for i in range(m):
                        dist += lut[i][cmat_codes[:, i]]
                    dist = np.round(dist, dist_round)
                    # mask self BEFORE the local top-k — filtering after
                    # would silently shrink this partition's candidate set
                    dist = np.where(ids == qids[qi], np.inf, dist)
                    keep = np.lexsort((ids, dist))[:kk]
                    for j in keep:
                        if np.isfinite(dist[j]):
                            out.append(
                                (int(qids[qi]), int(ids[j]), float(dist[j]))
                            )
            yield pd.DataFrame(
                out, columns=["query_id", "neighbor_id", "adist"]
            )

    scored = codes.mapInPandas(
        score, "query_id long, neighbor_id long, adist double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_neighbors)
        .select("query_id", "neighbor_id", "adist", "rank")
    )
