"""Product quantization (PQ) for embedding columns — Jegou et al. 2011,
"Product quantization for nearest neighbor search" (TPAMI).

Not in the reference (numeric traces only) — this is the memory leg of the
embedding family at 100 TB: a 64-dim float32 vector is 256 B/row; its PQ
code at m=8 is 8 B/row (32x), and a 768-dim corpus compresses ~384x.  The
point is that the CODES table, not the raw vectors, becomes the thing a
1000-executor scan reads for candidate generation, and asymmetric-distance
(ADC) scoring against codes is a per-partition table lookup — no vector
arithmetic per (query, doc) pair at probe time.

Spark-first decomposition:

  train    ONE distributed Lloyd loop trains all m sub-codebooks at once:
           each vector posexplodes into its m subvectors keyed by subspace,
           and k-means runs with composite key (sub, cell) — the same
           assign/update shape as operators/kmeans.py (broadcast centroids,
           windowed argmin, posexplode mean), so adding the subspace
           dimension costs a join key, not another job per subspace.
           Codebooks are m * ksub * dsub doubles — driver/broadcast-sized
           by construction (the "model" is a few hundred KB at any d).
  encode   mapInPandas: one (batch, ksub) BLAS distance matrix per
           subspace per Arrow batch, argmin -> tinyint-sized codes.
           Cost O(n * m * ksub * dsub) = O(n * d * ksub) flops, all numpy.
  probe    ADC: each query builds an (m, ksub) lookup table of squared
           distances from its subvectors to every sub-centroid (driver
           arithmetic — queries are the bounded side, same contract as
           ann_topk_cosine_vectorized).  Scoring a code is then
           sum_i LUT[i, code_i]: numpy fancy-gather per Arrow batch,
           zero multiplications.  Local top-k per partition bounds the
           final ranking shuffle at k rows per (query, partition).

Exact identity used by the tests: the ADC distance of a code IS the exact
squared L2 distance between the query and the code's reconstruction
(sum of per-subspace squared distances to the chosen sub-centroids), so
`pq_adc_topk` against `pq_reconstruct` is checkable to float tolerance —
the approximation lives entirely in the quantizer, never in the scorer.

Iterative training is not SQL-expressible — validated by property tests
(reconstruction error monotone non-increasing, beats random codes,
partition invariance, ADC==reconstruction identity, recall on planted
clusters) per the driver contract's weak-check rule, like
operators/kmeans.py and operators/pca.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from exstream_implementation_spark.operators.kmeans import _SQDIST


@dataclass(frozen=True)
class PQModel:
    dim: int                       # full vector dimension d
    m: int                         # number of subspaces
    dsub: int                      # d / m
    codebooks: tuple               # m arrays, each (ksub_i, dsub) float64
    inertia: tuple                 # per-iteration total inertia history
    # OPQ-style pre-rotation (Ge et al. 2013, "Optimized Product
    # Quantization", parametric variant): quantization happens in the
    # rotated frame y = (x - mean) @ rotation, where rotation is the PCA
    # basis with its columns PERMUTED so each subspace receives a
    # balanced share of the variance (greedy log-eigenvalue allocation —
    # the faiss OPQ init).  Rotation is orthonormal, so rotated-space L2
    # == original-space L2 and the ADC==reconstruction identity survives
    # verbatim; None (default) = classic PQ, bit-identical to r09.
    rotation: np.ndarray | None = None   # (d, d), columns = rotated axes
    mean: np.ndarray | None = None       # (d,)

    @property
    def code_bytes(self) -> int:
        """Bytes per encoded vector (1 if every ksub_i <= 256, else 2)."""
        return self.m * (1 if all(len(c) <= 256 for c in self.codebooks) else 2)

    @property
    def raw_bytes(self) -> int:
        return self.dim * 4  # float32 input

    @property
    def compression(self) -> float:
        return self.raw_bytes / self.code_bytes


def _balanced_eig_permutation(eigvals: np.ndarray, m: int,
                              dsub: int) -> np.ndarray:
    """Column permutation assigning principal axes to subspaces so the
    per-subspace variance PRODUCTS balance (greedy: next-largest
    eigenvalue goes to the open subspace with the smallest log-product —
    the standard parametric-OPQ allocation).  Returns perm such that
    rotated dims [i*dsub, (i+1)*dsub) belong to subspace i."""
    logs = np.log(np.maximum(np.asarray(eigvals, dtype=np.float64), 1e-12))
    buckets: list[list[int]] = [[] for _ in range(m)]
    totals = np.zeros(m)
    for axis in np.argsort(-logs):          # descending variance
        open_b = [b for b in range(m) if len(buckets[b]) < dsub]
        tgt = min(open_b, key=lambda b: totals[b])
        buckets[tgt].append(int(axis))
        totals[tgt] += logs[axis]
    return np.array([a for b in buckets for a in b], dtype=np.int64)


def _rotate_batch(x: np.ndarray, model: PQModel) -> np.ndarray:
    if model.rotation is None:
        return x
    return (x - model.mean) @ model.rotation


def _subvectors(vecs: DataFrame, id_col: str, vec_col: str, m: int,
                dsub: int) -> DataFrame:
    """(id, sub, subvec array<double>) — one row per (vector, subspace)."""
    slices = F.expr(
        f"transform(sequence(0, {m - 1}), s ->"
        f" transform(slice({vec_col}, s * {dsub} + 1, {dsub}),"
        f" x -> cast(x as double)))"
    )
    return vecs.select(
        F.col(id_col).alias("__id"), F.posexplode(slices).alias("sub", "subvec")
    )


def _lloyd_subspaces(
    spark,
    subs: DataFrame,
    ksub: int,
    max_iter: int,
    tol: float,
    init_rows: list | None = None,
) -> tuple[list, list]:
    """The shared distributed Lloyd loop over the exploded (sub, subvec)
    table — one loop trains every subspace at once (composite key).
    ``init_rows`` [(sub, cell, cemb), ...] warm-starts the centroids (the
    OPQ alternation reuses the previous alternation's codebooks); default
    is the deterministic ksub-lowest-ids init.  Returns (final centroid
    rows, inertia history)."""
    if init_rows is None:
        # deterministic init: per subspace, subvectors of the ksub lowest ids
        w0 = Window.partitionBy("sub").orderBy("__id")
        init_rows = [
            (r["sub"], r["cell"], r["cemb"])
            for r in subs.withColumn("__r", F.row_number().over(w0))
            .filter(F.col("__r") <= ksub)
            .select("sub", F.col("__r").alias("cell"),
                    F.col("subvec").alias("cemb"))
            .collect()
        ]
    centroids = spark.createDataFrame(
        init_rows, "sub int, cell int, cemb array<double>"
    )
    history: list[float] = []
    for _ in range(max_iter):
        scored = subs.join(F.broadcast(centroids), "sub").withColumn(
            "sqdist", F.expr(_SQDIST.format(a="subvec", b="cemb"))
        )
        w = Window.partitionBy("sub", "__id").orderBy("sqdist", "cell")
        assigned = (
            scored.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") == 1)
            .select("sub", "cell", "subvec", "sqdist")
            .persist()
        )
        inertia = assigned.agg(F.sum("sqdist")).first()[0]
        new_rows = (
            assigned.select("sub", "cell", F.posexplode("subvec"))
            .groupBy("sub", "cell", "pos")
            .agg(F.avg("col").alias("mu"))
            .groupBy("sub", "cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mu")))
                 .alias("_s"))
            .select("sub", "cell", F.col("_s.mu").alias("cemb"))
            # bounded collect: m * ksub rows — rebuilding the centroid
            # relation locally cuts the lineage exactly as kmeans_train
            # does (leaving it lazy stacks every iteration's plan)
            .collect()
        )
        assigned.unpersist()
        centroids = spark.createDataFrame(
            [(r["sub"], r["cell"], r["cemb"]) for r in new_rows],
            "sub int, cell int, cemb array<double>",
        )
        history.append(float(inertia))
        if len(history) >= 2 and history[-2] - history[-1] <= tol * history[-2]:
            break
    return centroids.collect(), history


def _books_from_rows(final: list, m: int) -> list:
    """Centroid rows → m dense codebook arrays (cells re-numbered
    0..ksub_i-1 in sorted-cell order — the code/array index contract)."""
    books = []
    for i in range(m):
        rows = sorted(
            (r for r in final if r["sub"] == i), key=lambda r: r["cell"]
        )
        if not rows:
            raise ValueError(f"train_pq: subspace {i} lost all centroids")
        books.append(np.array([r["cemb"] for r in rows], dtype=np.float64))
    return books


def _opq_cross_moment(
    vecs: DataFrame,
    vec_col: str,
    books: list,
    rotation: np.ndarray,
    mean: np.ndarray,
) -> np.ndarray:
    """M = Σ_rows (x-μ)ᵀ q((x-μ)R) — the d×d cross-moment whose SVD gives
    the orthogonal-Procrustes rotation update (Ge et al. 2013 §4, OPQ-NP).
    One distributed mapInPandas pass: each Arrow batch rotates, encodes
    (argmin per subspace), reconstructs, and emits its d×d partial; the
    partials (one per partition) are summed driver-side in a canonical
    order so the result is independent of partition enumeration."""
    m = len(books)
    d = rotation.shape[0]
    dsub = d // m
    sq_norms = [np.sum(b * b, axis=1) for b in books]

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((d, d))
        seen = False
        for pdf in it:
            if pdf.empty:
                continue
            seen = True
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            xc = x - mean
            y = xc @ rotation
            rec = np.empty_like(y)
            for i in range(m):
                ys = y[:, i * dsub:(i + 1) * dsub]
                dist = sq_norms[i][None, :] - 2.0 * (ys @ books[i].T)
                rec[:, i * dsub:(i + 1) * dsub] = books[i][
                    np.argmin(dist, axis=1)
                ]
            acc += xc.T @ rec
        if seen:
            yield pd.DataFrame({"mm": [acc.ravel().tolist()]})

    parts = [
        np.asarray(r["mm"], dtype=np.float64)
        for r in vecs.select(vec_col).mapInPandas(
            run, "mm array<double>"
        ).collect()
    ]
    if not parts:
        raise ValueError("train_pq: opq refinement saw no vectors")
    out = np.zeros(d * d)
    for p in sorted(parts, key=lambda a: a.tobytes()):
        out += p
    return out.reshape(d, d)


def train_pq(
    vecs: DataFrame,
    m: int = 8,
    ksub: int = 16,
    max_iter: int = 8,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_fraction: float | None = None,
    opq: bool = False,
    opq_iters: int = 6,
) -> PQModel:
    """Train an m-subspace, ksub-centroid product quantizer.

    ``opq=True`` learns a PCA pre-rotation with balanced eigenvalue
    allocation (the parametric-OPQ init), then — ``opq_iters`` > 0, the
    default — runs the FULL non-parametric OPQ alternation (Ge et al.
    2013 §4): refine codebooks in the current rotated frame, update the
    rotation by orthogonal Procrustes from the d×d cross-moment between
    centered inputs and their reconstructions, repeat.  Codebooks warm-
    start across alternations and the final Lloyd runs to ``max_iter``
    in the final frame.  ``opq_iters=0`` reproduces the r11 parametric-
    only rotation bit-for-bit.  Worth it exactly when the embedding
    dimensions are correlated/anisotropic (real encoder output); on
    isotropic data every rotation is equivalent in expectation, so no
    rotation — parametric or refined — can help (the only lever there is
    code budget: raise m; see docs/COMPRESSION_FAMILY.json's m=16 rows).

    One Lloyd loop over the exploded (sub, subvec) table trains every
    subspace simultaneously; init is deterministic (the ksub lowest ids'
    subvectors per subspace).  Empty cells shrink that subspace's codebook
    (same contract as kmeans_train); codes stay dense because cells are
    re-numbered 0..ksub_i-1 in sorted-cell order at the end.

    ``train_fraction`` bounds what the Lloyd iterations scan — the
    standard billion-vector practice (faiss trains codebooks on ~100k
    sampled vectors; codebook quality needs a representative sample, not
    the corpus): a deterministic hash-Bernoulli filter on ``id_col``
    (same selector family as sample_mix), so the training set is stable
    across runs/partitionings and ENCODING still covers every vector.
    """
    head = vecs.select(vec_col).first()
    if head is None or head[0] is None:
        raise ValueError("train_pq: input has no vectors")
    d = len(head[0])
    if d % m != 0:
        raise ValueError(f"train_pq: dim {d} not divisible by m={m}")
    if ksub < 1:
        raise ValueError("train_pq: ksub must be >= 1")
    if train_fraction is not None:
        if not 0.0 < train_fraction <= 1.0:
            raise ValueError(
                f"train_pq: train_fraction must be in (0, 1]: {train_fraction}"
            )
        if train_fraction < 1.0:
            vecs = vecs.filter(
                F.pmod(F.xxhash64(F.col(id_col), F.lit(0)), F.lit(1_000_000))
                < int(train_fraction * 1_000_000)
            )
            if vecs.select(vec_col).first() is None:
                raise ValueError(
                    "train_pq: train_fraction sampled zero vectors"
                )
    dsub = d // m
    spark = vecs.sparkSession

    rotation = mean = None
    warm = None
    if opq:
        from exstream_implementation_spark.operators.pca import (
            PCAModel,
            fit_pca,
            transform_pca,
        )

        # full-rank PCA on the (possibly sampled) training frame; both
        # model halves — rotation and codebooks — see the same sample
        pca = fit_pca(vecs, vec_col=vec_col, k=d)
        perm = _balanced_eig_permutation(pca.eigvals, m, dsub)
        rotation = pca.components[:, perm]
        mean = pca.mean
        if opq_iters > 0:
            rotation, warm = _opq_refine(
                spark, vecs, id_col, vec_col, m, ksub, dsub,
                rotation, mean, opq_iters, tol,
            )
        ones = np.ones(d)
        rot_model = PCAModel(
            mean=mean,
            components=rotation,
            # the eigenvalue fields only label the basis (transform_pca
            # reads mean+components); after refinement they have no
            # per-axis meaning, so carry neutral ones
            eigvals=ones,
            explained_ratio=ones,
        )
        vecs = transform_pca(vecs, rot_model, vec_col=vec_col,
                             out_col="__rot")
        vec_col = "__rot"

    subs = _subvectors(vecs, id_col, vec_col, m, dsub).persist()
    try:
        final, history = _lloyd_subspaces(
            spark, subs, ksub, max_iter, tol, init_rows=warm
        )
    finally:
        subs.unpersist()
    books = _books_from_rows(final, m)
    return PQModel(dim=d, m=m, dsub=dsub, codebooks=tuple(books),
                   inertia=tuple(history), rotation=rotation, mean=mean)


def _opq_refine(
    spark,
    vecs: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    ksub: int,
    dsub: int,
    rotation: np.ndarray,
    mean: np.ndarray,
    opq_iters: int,
    tol: float,
) -> tuple[np.ndarray, list]:
    """The non-parametric OPQ alternation: short Lloyd sweeps in the
    current rotated frame (codebooks warm-started) alternating with the
    Procrustes rotation update R ← U Vᵀ from SVD(Σ (x-μ)ᵀ q((x-μ)R)).
    Returns (refined rotation, last centroid rows — the final Lloyd's
    warm start).  The rotation stays exactly orthonormal by construction
    at every step, so the ADC == reconstruction identity and original-
    space L2 ranking survive the refinement verbatim."""
    from exstream_implementation_spark.operators.pca import (
        PCAModel,
        transform_pca,
    )

    d = rotation.shape[0]
    ones = np.ones(d)
    rows: list | None = None
    for _ in range(opq_iters):
        rot_model = PCAModel(mean=mean, components=rotation,
                             eigvals=ones, explained_ratio=ones)
        rotated = transform_pca(vecs, rot_model, vec_col=vec_col,
                                out_col="__rot")
        subs = _subvectors(rotated, id_col, "__rot", m, dsub).persist()
        try:
            rows, _ = _lloyd_subspaces(
                spark, subs, ksub, 2, tol,
                init_rows=(
                    [(r["sub"], r["cell"], r["cemb"]) for r in rows]
                    if rows is not None
                    else None
                ),
            )
        finally:
            subs.unpersist()
        books = _books_from_rows(rows, m)
        moment = _opq_cross_moment(vecs, vec_col, books, rotation, mean)
        u, _, vt = np.linalg.svd(moment)
        rotation = u @ vt
    return rotation, [(r["sub"], r["cell"], r["cemb"]) for r in rows]


def _check_model(model: PQModel, d: int) -> None:
    if d != model.dim:
        raise ValueError(f"vector dim {d} != model dim {model.dim}")


def encode_pq(
    vecs: DataFrame,
    model: PQModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, code array<int>) — nearest sub-centroid index per subspace.

    Arrow-batched: per subspace, one (batch x ksub) distance matrix via the
    ||x||^2 - 2 x.c + ||c||^2 expansion, argmin along centroids.  Codes are
    per-subspace dense indices into ``model.codebooks[i]``.
    """
    m, dsub = model.m, model.dsub
    books = model.codebooks            # closure-captured, broadcast with task
    sq_norms = [np.sum(b * b, axis=1) for b in books]

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            _check_model(model, x.shape[1])
            x = _rotate_batch(x, model)
            codes = np.empty((len(x), m), dtype=np.int32)
            for i in range(m):
                xs = x[:, i * dsub:(i + 1) * dsub]
                # (b, ksub): -2 x.c + ||c||^2 suffices for argmin (||x||^2
                # is constant per row)
                dist = sq_norms[i][None, :] - 2.0 * (xs @ books[i].T)
                codes[:, i] = np.argmin(dist, axis=1)
            yield pd.DataFrame(
                {"__id": pdf[id_col].to_numpy(), "code": list(codes)}
            )

    out = vecs.select(id_col, vec_col).mapInPandas(
        run, f"__id {vecs.schema[id_col].dataType.simpleString()}, code array<int>"
    )
    return out.withColumnRenamed("__id", id_col)


def pq_reconstruct(codes: DataFrame, model: PQModel,
                   id_col: str = "vec_id") -> DataFrame:
    """(id_col, approx array<double>) — concatenated chosen sub-centroids."""
    books = model.codebooks

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            cmat = np.stack(pdf["code"].to_numpy())
            rec = np.concatenate(
                [books[i][cmat[:, i]] for i in range(model.m)], axis=1
            )
            if model.rotation is not None:
                # codes live in the rotated frame: de-rotate so the
                # reconstruction approximates the ORIGINAL vector
                rec = rec @ model.rotation.T + model.mean
            yield pd.DataFrame(
                {"__id": pdf[id_col].to_numpy(), "approx": list(rec)}
            )

    out = codes.select(id_col, "code").mapInPandas(
        run,
        f"__id {codes.schema[id_col].dataType.simpleString()}, approx array<double>",
    )
    return out.withColumnRenamed("__id", id_col)


def pq_adc_topk(
    queries: np.ndarray,
    query_ids: np.ndarray,
    codes: DataFrame,
    model: PQModel,
    k: int = 5,
    id_col: str = "vec_id",
    dist_round: int = 6,
) -> DataFrame:
    """Asymmetric-distance top-k: exact L2 from each query to every code's
    reconstruction, via per-query (m, ksub) lookup tables.

    ``queries``/(q, d) and ``query_ids``/(q,) are the bounded input side
    (driver arrays, same contract as the collected query batch in
    ann_topk_cosine_vectorized).  Scoring per partition is a fancy-gather
    sum over the LUTs — no per-pair vector math.  Distances are rounded
    BEFORE ranking (ties broken by neighbor id ascending) so results are
    partitioning-independent.

    Returns (query_id, neighbor_id, adist, rank) with rank <= k per query.
    """
    q = np.asarray(queries, dtype=np.float64)
    qids = np.asarray(query_ids, dtype=np.int64)
    if q.ndim != 2 or len(q) != len(qids):
        raise ValueError("pq_adc_topk: queries must be (q, d) with matching ids")
    id_type = codes.schema[id_col].dataType.simpleString()
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        # encode_pq supports any id type, but this scorer emits long
        # neighbor ids — fail at the driver with a clear message instead
        # of a ValueError inside an executor task
        raise ValueError(
            f"pq_adc_topk: id column {id_col!r} must be integral, got"
            f" {id_type} (wrap non-integral ids with a surrogate key)"
        )
    if len(q) == 0:
        return codes.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, adist double, rank int"
        )
    _check_model(model, q.shape[1])
    # rotation is orthonormal, so the rotated-space ADC below equals the
    # original-space L2 to the de-rotated reconstruction exactly
    q = _rotate_batch(q, model)
    m, dsub = model.m, model.dsub
    books = model.codebooks
    # LUT[qi][i][c] = || q_sub - centroid ||^2 : q * m tables of ksub entries
    luts = []
    for qi in range(len(q)):
        luts.append([
            np.sum((books[i] - q[qi, i * dsub:(i + 1) * dsub]) ** 2, axis=1)
            for i in range(m)
        ])

    def score(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            cmat = np.stack(pdf["code"].to_numpy())
            ids = pdf[id_col].to_numpy()
            out = []
            kk = min(k, len(ids))
            for qi in range(len(qids)):
                dist = np.zeros(len(ids), dtype=np.float64)
                for i in range(m):
                    dist += luts[qi][i][cmat[:, i]]
                dist = np.round(dist, dist_round)
                order = np.lexsort((ids, dist))[:kk]  # asc dist, asc id
                for j in order:
                    out.append((int(qids[qi]), int(ids[j]), float(dist[j])))
            yield pd.DataFrame(
                out, columns=["query_id", "neighbor_id", "adist"]
            )

    scored = codes.select(id_col, "code").mapInPandas(
        score, "query_id long, neighbor_id long, adist double"
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"),
                                               F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adist", "rank")
    )
