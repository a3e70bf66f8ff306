"""IVF index lifecycle — train once, persist, probe from any session.

``ann_ivf_trained_topk`` (plans/similarity.py) trains centroids inline: right
for a one-shot query, wrong for a serving path where thousands of queries
probe the same corpus.  This module splits the lifecycle:

  build_ivf_index    Lloyd-train centroids (operators/kmeans.py), assign every
                     vector, and persist three catalog tables:
                       {name}_centroids  (cell, cemb)        — k×dim, tiny
                       {name}_assign     (cell, vec_id, embedding) — BUCKETED
                                         by cell (operators/bucketing.py), so
                                         probe joins read co-located buckets
                                         and a future assign-assign join is
                                         exchange-free
                       {name}_meta       (n_vectors, k, dim) — staleness basis
  load_ivf_index     read the three tables back — NO kmeans, no source scan
  ivf_index_is_stale corpus grew past a growth threshold since build → the
                     caller should re-train (centroids drift as data shifts)
  probe_ivf_index    nprobe-cell candidate search + exact cosine re-rank over
                     the PERSISTED index — a fresh session serves queries
                     without ever touching the training path

Persistence uses the native bucketing protocol (saveAsTable), so the index
survives the session: a new SparkSession on the same warehouse probes cold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from exstream_implementation_spark.operators.bucketing import write_bucketed
from exstream_implementation_spark.operators.kmeans import (
    _SQDIST,
    _assign,
    kmeans_train,
)


def build_ivf_index(
    spark: SparkSession,
    vecs: DataFrame,
    name: str,
    k: int,
    max_iter: int = 5,
    n_buckets: int = 16,
) -> dict:
    """Train + persist the IVF index; returns {n_vectors, k_effective, dim}.

    k_effective can be < k: empty Lloyd cells shrink the centroid set
    (operators/kmeans.py docstring) — the meta table records the real count.
    """
    cents, _history = kmeans_train(vecs, k=k, max_iter=max_iter)
    cents.write.mode("overwrite").format("parquet").saveAsTable(
        f"{name}_centroids"
    )
    cents_b = F.broadcast(spark.table(f"{name}_centroids"))
    assign = _assign(vecs, cents_b).select("cell", "vec_id", "embedding")
    write_bucketed(
        assign, f"{name}_assign", ["cell"], n_buckets=n_buckets,
        sort_cols=["cell", "vec_id"],
    )
    stats = vecs.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.max(F.size("embedding")).alias("dim"),
    ).first()
    k_eff = spark.table(f"{name}_centroids").count()
    # n_trained pins the corpus size the CENTROIDS were fit on; n_vectors
    # advances with appends — staleness measures drift since training, not
    # since the last append
    meta = spark.createDataFrame(
        [
            (
                int(stats["n_vectors"]), int(stats["n_vectors"]),
                int(k_eff), int(stats["dim"]),
            )
        ],
        "n_vectors long, n_trained long, k int, dim int",
    )
    meta.write.mode("overwrite").format("parquet").saveAsTable(f"{name}_meta")
    return {"n_vectors": int(stats["n_vectors"]), "k_effective": int(k_eff),
            "dim": int(stats["dim"])}


def append_to_ivf_index(
    spark: SparkSession, name: str, new_vecs: DataFrame
) -> int:
    """Assign NEW vectors against the EXISTING centroids and append them to
    the bucketed assignment table — the cheap between-retrains path (no
    Lloyd iteration).  Returns the count actually appended: vec_ids
    already indexed are skipped (anti-join — the shared idempotent-append
    contract, operators/index_lifecycle.py), so a redelivered batch is a
    no-op and the meta count never double-counts.  ``ivf_index_is_stale``
    keeps measuring growth against the TRAINED corpus size, so repeated
    appends still trip the retrain threshold once centroids drift."""
    from exstream_implementation_spark.operators.index_lifecycle import (
        idempotent_append,
    )

    cents = F.broadcast(spark.table(f"{name}_centroids"))
    assign = _assign(new_vecs, cents).select("cell", "vec_id", "embedding")
    # shared append contract (operators/index_lifecycle.py): anti-join on
    # vec_id makes a redelivered batch a no-op, and the catalog insert
    # path routes rows through the bucket spec so probe joins keep
    # reading co-located buckets
    appended = idempotent_append(assign, f"{name}_assign", ["vec_id"])
    n_new = appended.count()
    # .first() materializes the old row driver-side, so the overwrite builds
    # from a local relation — no read-from-the-table-being-overwritten hazard
    meta = spark.table(f"{name}_meta").first()
    spark.createDataFrame(
        [
            (
                int(meta["n_vectors"]) + int(n_new), int(meta["n_trained"]),
                int(meta["k"]), int(meta["dim"]),
            )
        ],
        "n_vectors long, n_trained long, k int, dim int",
    ).write.mode("overwrite").format("parquet").saveAsTable(f"{name}_meta")
    return int(n_new)


def load_ivf_index(
    spark: SparkSession, name: str
) -> tuple[DataFrame, DataFrame, dict]:
    """(centroids, assignments, meta) from the persisted tables — no
    training, no corpus scan."""
    meta_row = spark.table(f"{name}_meta").first()
    return (
        spark.table(f"{name}_centroids"),
        spark.table(f"{name}_assign"),
        {k: meta_row[k] for k in ("n_vectors", "n_trained", "k", "dim")},
    )


def ivf_index_is_stale(
    spark: SparkSession,
    name: str,
    vecs: DataFrame,
    growth_threshold: float = 0.2,
) -> bool:
    """True when the corpus grew more than ``growth_threshold`` (fraction)
    past the count the centroids were TRAINED on — trained centroids no
    longer reflect the data distribution and recall decays; the caller
    should rebuild.  Appends advance n_vectors but not n_trained, so
    incremental growth still trips this check."""
    from exstream_implementation_spark.operators.index_lifecycle import (
        growth_is_stale,
    )

    trained = spark.table(f"{name}_meta").first()["n_trained"]
    return growth_is_stale(vecs.count(), int(trained), growth_threshold)


def probe_ivf_index(
    spark: SparkSession,
    name: str,
    queries: DataFrame,
    nprobe: int = 3,
    k_neighbors: int = 5,
) -> DataFrame:
    """Serve top-k cosine neighbors from the persisted index.

    queries: (query_id, qemb array<float>).  Plan shape: broadcast the k×dim
    centroid table against the queries (cell ranking), broadcast the ranked
    (query, cell) pairs against the bucketed assignment table (candidate
    fetch reads only the probed cells' buckets), exact cosine re-rank over
    candidates — the kmeans training path is never touched."""
    cents = F.broadcast(spark.table(f"{name}_centroids"))
    assign = spark.table(f"{name}_assign")
    wq = Window.partitionBy("query_id").orderBy(F.asc("sqdist"), F.asc("cell"))
    qcells = (
        queries.crossJoin(cents)
        .withColumn("sqdist", F.expr(_SQDIST.format(a="qemb", b="cemb")))
        .withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= nprobe)
        .select("query_id", "qemb", "cell")
    )
    dot = (
        "aggregate(zip_with(qemb, embedding, (x, y) ->"
        " cast(x as double) * y), cast(0.0 as double), (acc, v) -> acc + v)"
    )
    norm = (
        "sqrt(aggregate({c}, cast(0.0 as double),"
        " (acc, v) -> acc + cast(v as double) * v))"
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        F.broadcast(qcells)
        .join(assign, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.expr(dot)
            / (F.expr(norm.format(c="qemb")) * F.expr(norm.format(c="embedding"))),
        )
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine")
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k_neighbors)
        .withColumn("cosine", F.round("cosine", 6))
    )
