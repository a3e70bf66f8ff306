"""Product quantization (operators/pq.py): the ADC==reconstruction exact
identity, reconstruction quality vs a random-code baseline, inertia
monotonicity, partition invariance of codes, recall on planted clusters,
and arg validation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.operators.pq import (
    PQModel,
    encode_pq,
    pq_adc_topk,
    pq_reconstruct,
    train_pq,
)
from exstream_implementation_spark.sources import load_table

# >60 s integration suite: excluded from the quick tier (README "Run")
pytestmark = pytest.mark.slow


SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )


def _planted(spark, n_clusters=8, per=40, d=32, noise=0.05, seed=7):
    """Well-separated clusters — the regime where PQ recall is provable."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)) * 3.0
    rows = []
    for i in range(n_clusters * per):
        c = i % n_clusters
        v = centers[c] + rng.normal(size=d) * noise
        rows.append((i, [float(x) for x in v], c))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    x = np.array([r[1] for r in rows], dtype=np.float64)
    return df, x, np.array([r[2] for r in rows])


def test_adc_equals_reconstruction_distance(spark):
    """The scorer is EXACT w.r.t. the quantized points: adist(q, code) ==
    ||q - reconstruct(code)||^2 to float tolerance."""
    emb = _emb(spark).filter(F.col("vec_id") < 120)
    model = train_pq(emb, m=8, ksub=8, max_iter=4)
    codes = encode_pq(emb, model).persist()
    rec = {
        r["vec_id"]: np.array(r["approx"])
        for r in pq_reconstruct(codes, model).collect()
    }
    qrows = sorted(
        emb.filter(F.col("vec_id") < 3).collect(), key=lambda r: r["vec_id"]
    )
    q = np.stack([np.array(r["embedding"], dtype=np.float64) for r in qrows])
    qids = np.array([r["vec_id"] for r in qrows])
    top = pq_adc_topk(q, qids, codes, model, k=120, dist_round=9).collect()
    assert len(top) == 3 * 120
    for r in top:
        want = float(np.sum((q[r["query_id"]] - rec[r["neighbor_id"]]) ** 2))
        assert r["adist"] == pytest.approx(want, abs=1e-6)
    codes.unpersist()


def test_reconstruction_beats_random_and_inertia_monotone(spark):
    df, x, _ = _planted(spark)
    model = train_pq(df, m=8, ksub=8, max_iter=6)
    # inertia history is monotone non-increasing (Lloyd property)
    assert all(
        a - b >= -1e-9 * max(abs(a), 1.0)
        for a, b in zip(model.inertia, model.inertia[1:])
    )
    codes = encode_pq(df, model)
    rec_rows = pq_reconstruct(codes, model).collect()
    rec = np.stack(
        [np.array(r["approx"]) for r in sorted(rec_rows, key=lambda r: r["vec_id"])]
    )
    err = np.mean(np.sum((x - rec) ** 2, axis=1))
    # random-code baseline: same codebooks, codes drawn uniformly
    rng = np.random.default_rng(0)
    rand = np.concatenate(
        [
            model.codebooks[i][rng.integers(0, len(model.codebooks[i]), len(x))]
            for i in range(model.m)
        ],
        axis=1,
    )
    rand_err = np.mean(np.sum((x - rand) ** 2, axis=1))
    assert err < 0.25 * rand_err
    # trained quantizer explains most of the variance on separable data
    total_var = np.mean(np.sum((x - x.mean(axis=0)) ** 2, axis=1))
    assert err < 0.1 * total_var


def test_codes_partition_invariant_and_deterministic(spark):
    emb = _emb(spark).filter(F.col("vec_id") < 200)
    model = train_pq(emb, m=4, ksub=8, max_iter=3)
    c1 = {
        r["vec_id"]: list(r["code"])
        for r in encode_pq(emb.repartition(1), model).collect()
    }
    c7 = {
        r["vec_id"]: list(r["code"])
        for r in encode_pq(emb.repartition(7), model).collect()
    }
    assert c1 == c7
    model2 = train_pq(emb.repartition(5), m=4, ksub=8, max_iter=3)
    for a, b in zip(model.codebooks, model2.codebooks):
        np.testing.assert_allclose(a, b, atol=1e-9)


def test_recall_on_planted_clusters(spark):
    """ADC top-k stays inside the query's cluster.  (Recall vs exact L2 at
    sub-noise distances is NOT a PQ property — within a tight cluster every
    member quantizes to nearly the same code, so exact-rank order below the
    quantization resolution is unrecoverable by design; what PQ guarantees
    on separated clusters is that retrieved neighbors are cluster-mates.)"""
    df, x, labels = _planted(spark)
    model = train_pq(df, m=8, ksub=16, max_iter=6)
    codes = encode_pq(df, model)
    qids = np.arange(5, dtype=np.int64)
    q = x[:5]
    got = pq_adc_topk(q, qids, codes, model, k=10).collect()
    in_cluster = 0
    for r in got:
        if labels[r["neighbor_id"]] == labels[r["query_id"]]:
            in_cluster += 1
    assert len(got) == 50
    assert in_cluster / 50 >= 0.95


def test_compression_accounting_and_empty_queries(spark):
    emb = _emb(spark).filter(F.col("vec_id") < 60)
    model = train_pq(emb, m=8, ksub=8, max_iter=2)
    assert model.dim == 64 and model.dsub == 8
    assert model.code_bytes == 8 and model.raw_bytes == 256
    assert model.compression == pytest.approx(32.0)
    codes = encode_pq(emb, model)
    out = pq_adc_topk(
        np.zeros((0, 64)), np.zeros(0, dtype=np.int64), codes, model, k=3
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "neighbor_id", "adist", "rank",
    ]


def test_arg_validation(spark):
    emb = _emb(spark).filter(F.col("vec_id") < 40)
    with pytest.raises(ValueError, match="not divisible"):
        train_pq(emb, m=7)
    with pytest.raises(ValueError, match="ksub"):
        train_pq(emb, m=8, ksub=0)
    with pytest.raises(ValueError, match="no vectors"):
        train_pq(emb.filter(F.col("vec_id") < 0), m=8)
    model = train_pq(emb, m=8, ksub=4, max_iter=1)
    codes = encode_pq(emb, model)
    with pytest.raises(ValueError, match="dim"):
        pq_adc_topk(np.zeros((1, 32)), np.array([0]), codes, model, k=1)


def test_sampled_training_still_encodes_everything(spark):
    """train_fraction bounds the Lloyd scans; encoding covers the FULL
    corpus and the sampled model is deterministic across partitionings."""
    emb = _emb(spark)
    n = emb.count()
    m1 = train_pq(emb, m=8, ksub=8, max_iter=3, train_fraction=0.3)
    m2 = train_pq(emb.repartition(9), m=8, ksub=8, max_iter=3,
                  train_fraction=0.3)
    for a, b in zip(m1.codebooks, m2.codebooks):
        np.testing.assert_allclose(a, b, atol=1e-12)
    codes = encode_pq(emb, m1)
    assert codes.count() == n  # every vector encoded, not just the sample
    # sampled-trained reconstruction still beats random codes
    rec = pq_reconstruct(codes, m1).join(
        emb.withColumnRenamed("embedding", "orig"), "vec_id"
    )
    err = rec.selectExpr(
        "aggregate(zip_with(approx, orig, (a, o) -> (a - cast(o as double))"
        " * (a - cast(o as double))), cast(0.0 as double),"
        " (acc, v) -> acc + v) as e"
    ).agg(F.avg("e")).first()[0]
    full = train_pq(emb, m=8, ksub=8, max_iter=3)
    codes_f = encode_pq(emb, full)
    rec_f = pq_reconstruct(codes_f, full).join(
        emb.withColumnRenamed("embedding", "orig"), "vec_id"
    )
    err_f = rec_f.selectExpr(
        "aggregate(zip_with(approx, orig, (a, o) -> (a - cast(o as double))"
        " * (a - cast(o as double))), cast(0.0 as double),"
        " (acc, v) -> acc + v) as e"
    ).agg(F.avg("e")).first()[0]
    assert err <= 2.0 * err_f  # sampled codebooks stay in the same class
    with pytest.raises(ValueError, match="train_fraction"):
        train_pq(emb, m=8, train_fraction=0.0)


def test_adc_rejects_non_integral_ids(spark):
    df = spark.createDataFrame(
        [("a", [0.0] * 8, [0, 0])], "vec_id string, embedding array<float>,"
        " code array<int>"
    )
    emb = _emb(spark).filter(F.col("vec_id") < 40)
    model = train_pq(emb, m=8, ksub=4, max_iter=1)
    with pytest.raises(ValueError, match="integral"):
        pq_adc_topk(
            np.zeros((1, 64)), np.array([0]), df.select("vec_id", "code"),
            model, k=1,
        )


def _anisotropic(spark, n=400, d=32, seed=5):
    """Strongly correlated dims — the regime OPQ exists for: a few
    high-variance directions NOT axis-aligned, so fixed axis-slicing
    wastes codebook capacity while a PCA rotation concentrates it."""
    rng = np.random.default_rng(seed)
    scales = np.concatenate([np.full(4, 10.0), np.full(d - 4, 0.3)])
    basis, _ = np.linalg.qr(rng.normal(size=(d, d)))
    x = (rng.normal(size=(n, d)) * scales) @ basis.T
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    return df, x


def test_opq_rotation_preserves_adc_identity(spark):
    # the exact ADC == ||q - reconstruct||^2 identity must survive the
    # rotation verbatim (reconstruction is de-rotated to original space)
    df, x = _anisotropic(spark, n=150)
    model = train_pq(df, m=8, ksub=8, max_iter=4, opq=True)
    assert model.rotation is not None and model.mean is not None
    # rotation is orthonormal
    assert np.allclose(model.rotation @ model.rotation.T, np.eye(32), atol=1e-9)
    codes = encode_pq(df, model).persist()
    rec = {
        r["vec_id"]: np.array(r["approx"])
        for r in pq_reconstruct(codes, model).collect()
    }
    q, qids = x[:3], np.arange(3)
    top = pq_adc_topk(q, qids, codes, model, k=150, dist_round=9).collect()
    for r in top:
        want = float(np.sum((q[r["query_id"]] - rec[r["neighbor_id"]]) ** 2))
        assert r["adist"] == pytest.approx(want, abs=1e-5)
    codes.unpersist()


def test_opq_beats_plain_pq_on_anisotropic_data(spark):
    # same budget (m=8, ksub=8): rotated codebooks must reconstruct the
    # anisotropic corpus strictly better than axis-aligned ones
    df, x = _anisotropic(spark)

    def recon_err(opq):
        model = train_pq(df, m=8, ksub=8, max_iter=6, opq=opq)
        rows = pq_reconstruct(encode_pq(df, model), model).collect()
        rec = np.stack(
            [np.array(r["approx"])
             for r in sorted(rows, key=lambda r: r["vec_id"])]
        )
        return float(np.mean(np.sum((x - rec) ** 2, axis=1)))

    err_plain, err_opq = recon_err(False), recon_err(True)
    assert err_opq < err_plain * 0.7, (err_plain, err_opq)


def test_balanced_permutation_properties():
    from exstream_implementation_spark.operators.pq import (
        _balanced_eig_permutation,
    )

    eig = np.array([100.0, 50.0, 10.0, 5.0, 1.0, 0.5, 0.1, 0.05])
    perm = _balanced_eig_permutation(eig, m=4, dsub=2)
    assert sorted(perm.tolist()) == list(range(8))
    # the two largest eigenvalues land in DIFFERENT subspaces
    s_of = {int(a): i // 2 for i, a in enumerate(perm)}
    assert s_of[0] != s_of[1]
