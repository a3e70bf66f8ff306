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

# every table a rebuild may create or retire; ``{name}_{sfx}_staging`` and
# ``{name}_{sfx}_old`` are RESERVED scratch names (the index_lifecycle
# namespace claim), and ``{name}_ivfpq_commit`` is the rebuild's marker
_IVFPQ_SUFFIXES = ("centroids", "codebooks", "codes", "meta", "rotation")


def _save_staging(df: DataFrame, table: str) -> None:
    """One staging-table write — a seam the crash-injection tests wrap."""
    df.write.mode("overwrite").format("parquet").saveAsTable(table)


def _ivfpq_swap_one(spark: SparkSession, tbl: str) -> None:
    """Idempotent single-table swap: staging → live with the parked-old
    rename discipline (compact_bucketed_table's shape).  At no instant is
    the only copy of current data deleted: ``_old`` is dropped only while
    a live or staging copy exists, and a crash at any statement leaves a
    state this same function (re-run by recover_ivfpq) completes."""
    staging, old = f"{tbl}_staging", f"{tbl}_old"
    if spark.catalog.tableExists(staging):
        if spark.catalog.tableExists(tbl):
            spark.sql(f"DROP TABLE IF EXISTS {old}")
            spark.sql(f"ALTER TABLE {tbl} RENAME TO {old}")
        spark.sql(f"ALTER TABLE {staging} RENAME TO {tbl}")
    elif not spark.catalog.tableExists(tbl) and spark.catalog.tableExists(old):
        # crash fell between the two renames on a previous pass
        spark.sql(f"ALTER TABLE {old} RENAME TO {tbl}")
    spark.sql(f"DROP TABLE IF EXISTS {old}")


def recover_ivfpq(spark: SparkSession, name: str) -> bool:
    """Restore a consistent serving set after a crashed rebuild (the r11
    ADVICE swap-window finding: the old build mutated ``{name}_rotation``
    before retraining, so a crash left a rotation inconsistent with the
    surviving codebooks and probes returned silently wrong neighbors).

    The rebuild protocol makes every crash recoverable:

      marker PRESENT  → every staging table was fully written (the marker
                        commits last), so ROLL FORWARD: re-run each swap
                        (idempotent) / retire each dropped table, then
                        drop the marker.
      marker ABSENT   → the staging set may be incomplete: ROLL BACK —
                        drop all staging leftovers; restore any
                        live-absent/old-parked table.

    Either way the serving tables all come from ONE build.  Safe (and
    cheap) to call from any reader; build/append/probe/load call it on
    entry.  Returns True when any recovery action ran."""
    marker = f"{name}_ivfpq_commit"
    if spark.catalog.tableExists(marker):
        for r in spark.table(marker).collect():
            if r["action"] == "swap":
                _ivfpq_swap_one(spark, r["tbl"])
            else:  # the rebuild retires this table (rotation on opq=False)
                spark.sql(f"DROP TABLE IF EXISTS {r['tbl']}")
                spark.sql(f"DROP TABLE IF EXISTS {r['tbl']}_old")
        spark.sql(f"DROP TABLE IF EXISTS {marker}")
        return True
    acted = False
    for sfx in _IVFPQ_SUFFIXES:
        tbl = f"{name}_{sfx}"
        if spark.catalog.tableExists(f"{tbl}_staging"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}_staging")
            acted = True
        if not spark.catalog.tableExists(tbl) and spark.catalog.tableExists(
            f"{tbl}_old"
        ):
            spark.sql(f"ALTER TABLE {tbl}_old RENAME TO {tbl}")
            acted = True
    return acted


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
    opq_iters: int = 6,
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
    and apply it transparently.

    Crash safety (the r11 ADVICE swap-window finding: the old build
    mutated ``{name}_rotation`` before retraining, so a crash left a
    rotation inconsistent with the surviving codebooks): every table is
    written to a ``_staging`` name, a ``{name}_ivfpq_commit`` marker
    commits only once ALL of them exist, and only then does each swap
    into place — a crash before the marker leaves the old index untouched
    (``recover_ivfpq`` discards staging); a crash after it rolls forward
    to the new index.  Crash-consistent, not concurrent-reader-isolated:
    single writer per index name, like the rest of the lifecycle."""
    recover_ivfpq(spark, name)
    staged: list[tuple[str, str]] = []
    rotation = mean = None
    if opq:
        # the rotation trains through train_pq's OPQ path (parametric
        # init + full alternating refinement since r12 — opq_iters=0
        # reproduces the r11 parametric rotation exactly); the throwaway
        # raw-space codebooks it also fits are a bounded model-sized
        # cost, and the real residual codebooks train below
        rot_src = train_pq(
            vecs, m=m, ksub=ksub, max_iter=max_iter,
            id_col="vec_id", vec_col="embedding",
            opq=True, opq_iters=opq_iters,
        )
        rotation, mean = rot_src.rotation, rot_src.mean
        d = rot_src.dim
        vecs = _rotate_frame(vecs, rotation, mean)
        rot_rows = [(-1, [float(v) for v in mean])] + [
            (i, [float(v) for v in rotation[i]]) for i in range(d)
        ]
        _save_staging(
            spark.createDataFrame(rot_rows, "idx int, vals array<double>"),
            f"{name}_rotation_staging",
        )
        staged.append((f"{name}_rotation", "swap"))
    else:
        # a rebuild without opq RETIRES any stale rotation — at commit
        # time, never before the new centroids/codebooks exist
        staged.append((f"{name}_rotation", "drop"))
    cents, _hist = kmeans_train(vecs, k=k_cells, max_iter=max_iter)
    _save_staging(cents, f"{name}_centroids_staging")
    staged.append((f"{name}_centroids", "swap"))
    cents_b = F.broadcast(spark.table(f"{name}_centroids_staging"))
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
            codes.select("cell", "vec_id", "code"), f"{name}_codes_staging",
            ["cell"], n_buckets=n_buckets, sort_cols=["cell", "vec_id"],
        )
        staged.append((f"{name}_codes", "swap"))
    finally:
        assigned.unpersist()
    book_rows = [
        (i, c, [float(v) for v in model.codebooks[i][c]])
        for i in range(model.m)
        for c in range(len(model.codebooks[i]))
    ]
    _save_staging(
        spark.createDataFrame(
            book_rows, "sub int, cell int, cemb array<double>"
        ),
        f"{name}_codebooks_staging",
    )
    staged.append((f"{name}_codebooks", "swap"))
    stats = vecs.agg(
        F.count(F.lit(1)).alias("n"), F.max(F.size("embedding")).alias("dim")
    ).first()
    k_eff = spark.table(f"{name}_centroids_staging").count()
    # n_trained pins what BOTH the coarse cells and the codebooks were fit
    # on; appends advance n_vectors only (same staleness contract as
    # ann_index.py)
    _save_staging(
        spark.createDataFrame(
            [(int(stats["n"]), int(stats["n"]), int(k_eff),
              int(stats["dim"]), model.m)],
            "n_vectors long, n_trained long, k int, dim int, m int",
        ),
        f"{name}_meta_staging",
    )
    staged.append((f"{name}_meta", "swap"))
    # the commit point: every staging table exists — from here a crash
    # rolls FORWARD (recover_ivfpq re-runs the idempotent swaps)
    _save_staging(
        spark.createDataFrame(staged, "tbl string, action string"),
        f"{name}_ivfpq_commit",
    )
    for tbl, action in staged:
        if action == "swap":
            _ivfpq_swap_one(spark, tbl)
        else:
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(f"DROP TABLE IF EXISTS {name}_ivfpq_commit")
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
    recover_ivfpq(spark, name)
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
    recover_ivfpq(spark, name)  # same reader discipline as probe/load
    meta = spark.table(f"{name}_meta").first()
    return meta["n_vectors"] > meta["n_trained"] * (1.0 + growth_threshold)


def load_pq_model(spark: SparkSession, name: str) -> PQModel:
    """Rebuild the PQModel from the persisted codebook table — no training
    lineage, works from a cold session.  Completes/rolls back any crashed
    rebuild first, so the codebooks read always match the serving
    rotation."""
    recover_ivfpq(spark, name)
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
    recover_ivfpq(spark, name)
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
