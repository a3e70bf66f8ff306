"""IVF index lifecycle: build → persist → cold probe (no kmeans) →
staleness.  The probe must serve correct neighbors reading ONLY the
persisted tables — a fresh session on the same warehouse never touches the
training path."""

import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.operators.ann_index import (
    build_ivf_index,
    ivf_index_is_stale,
    load_ivf_index,
    probe_ivf_index,
)
from exstream_implementation_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"
NAME = "t_ivf_idx"


@pytest.fixture()
def vecs(spark):
    return load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")


@pytest.fixture()
def index(spark, vecs):
    info = build_ivf_index(spark, vecs, NAME, k=8, max_iter=3)
    yield info
    for suffix in ("centroids", "assign", "meta"):
        spark.sql(f"DROP TABLE IF EXISTS {NAME}_{suffix}")


def _brute_topk(spark, vecs, queries, k=5):
    dot = (
        "aggregate(zip_with(qemb, embedding, (x, y) ->"
        " cast(x as double) * y), cast(0.0 as double), (acc, v) -> acc + v)"
    )
    norm = (
        "sqrt(aggregate({c}, cast(0.0 as double),"
        " (acc, v) -> acc + cast(v as double) * v))"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        queries.crossJoin(vecs)
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.expr(dot)
            / (F.expr(norm.format(c="qemb")) * F.expr(norm.format(c="embedding"))),
        )
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def test_index_build_persists_and_probe_recall(spark, vecs, index):
    assert index["k_effective"] >= 1
    cents, assign, meta = load_ivf_index(spark, NAME)
    assert meta["n_vectors"] == vecs.count()
    assert cents.count() == index["k_effective"]
    assert assign.count() == meta["n_vectors"]

    queries = vecs.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb")
    )
    got = probe_ivf_index(spark, NAME, queries, nprobe=3, k_neighbors=5)
    truth = _brute_topk(spark, vecs, queries, k=5)
    got_sets = {}
    for r in got.collect():
        got_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    truth_sets = {}
    for r in truth.collect():
        truth_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(got_sets.get(q, set()) & t) / len(t) for q, t in truth_sets.items()
    ]
    assert sum(recalls) / len(recalls) >= 0.9


def test_probe_plan_reads_index_not_training(spark, vecs, index):
    """Cold-probe contract: the probe's physical plan scans the PERSISTED
    index tables and nothing else — no kmeans lineage, no embeddings-source
    scan, no Python stage (training is mapInPandas-free anyway, but the
    probe must also be: pure JVM)."""
    queries = vecs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb")
    )
    plan = (
        probe_ivf_index(spark, NAME, queries)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert f"{NAME}_centroids" in plan and f"{NAME}_assign" in plan
    # the only parquet scans outside the index are the query vectors
    assert plan.count("embeddings.parquet") <= 1
    for marker in ("mapInPandas", "PythonUDF", "BatchEvalPython"):
        assert marker not in plan


def test_staleness_threshold(spark, vecs, index):
    assert not ivf_index_is_stale(spark, NAME, vecs, growth_threshold=0.2)
    grown = vecs.unionByName(
        vecs.limit(int(vecs.count() * 0.3)).withColumn(
            "vec_id", F.col("vec_id") + 10_000_000
        )
    )
    assert ivf_index_is_stale(spark, NAME, grown, growth_threshold=0.2)
    # a larger tolerance keeps the same grown corpus fresh
    assert not ivf_index_is_stale(spark, NAME, grown, growth_threshold=0.5)


def test_append_then_probe_finds_new_vectors(spark, vecs, index):
    """Incremental append: new vectors assigned against the EXISTING
    centroids (no retrain) must be probe-visible, the bucketed assign table
    grows, and staleness still measures growth since TRAINING."""
    from exstream_implementation_spark.operators.ann_index import (
        append_to_ivf_index,
    )

    n0 = spark.table(f"{NAME}_assign").count()
    # clones of existing vectors under new ids — their nearest neighbor is
    # their original at cosine 1.0, a self-verifying probe target
    clones = vecs.filter(F.col("vec_id") < 5).withColumn(
        "vec_id", F.col("vec_id") + 500_000
    )
    appended = append_to_ivf_index(spark, NAME, clones)
    assert appended == 5
    assert spark.table(f"{NAME}_assign").count() == n0 + 5
    _, _, meta = load_ivf_index(spark, NAME)
    assert meta["n_vectors"] == meta["n_trained"] + 5

    queries = vecs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb")
    )
    got = probe_ivf_index(spark, NAME, queries, nprobe=3, k_neighbors=5)
    top = {
        r["query_id"]: (r["neighbor_id"], r["cosine"])
        for r in got.filter(F.col("rank") == 1).collect()
    }
    for q in range(5):
        assert top[q] == (q + 500_000, 1.0), top[q]
    # staleness is vs n_trained: 5 appends over ~500 vecs is under 20%
    assert not ivf_index_is_stale(
        spark, NAME, vecs.unionByName(clones), growth_threshold=0.2
    )


def test_append_redelivery_is_noop(spark, vecs, index):
    # the shared index-lifecycle contract (operators/index_lifecycle.py):
    # a redelivered append batch must change nothing — not the assign
    # table, not the meta count
    from exstream_implementation_spark.operators.ann_index import (
        append_to_ivf_index,
    )

    clones = vecs.filter(F.col("vec_id") < 4).withColumn(
        "vec_id", F.col("vec_id") + 700_000
    )
    assert append_to_ivf_index(spark, NAME, clones) == 4
    n1 = spark.table(f"{NAME}_assign").count()
    _, _, meta1 = load_ivf_index(spark, NAME)
    assert append_to_ivf_index(spark, NAME, clones) == 0  # replay
    assert spark.table(f"{NAME}_assign").count() == n1
    _, _, meta2 = load_ivf_index(spark, NAME)
    assert meta2["n_vectors"] == meta1["n_vectors"]


def test_growth_is_stale_rule():
    from exstream_implementation_spark.operators.index_lifecycle import (
        growth_is_stale,
    )

    assert not growth_is_stale(500, 500, 0.2)
    assert not growth_is_stale(601, 500, 0.2)  # exactly at threshold + 1
    assert growth_is_stale(650, 500, 0.2)
    assert not growth_is_stale(650, 500, 0.5)
    # the +1 guard: a tiny base never trips on its first append
    assert not growth_is_stale(1, 0, 0.2)
