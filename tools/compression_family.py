"""Compression-family measurement: exact fp32 vs SQ8 vs PQ vs OPQ-PQ on
the 20x replica corpus.  Rewrites docs/COMPRESSION_FAMILY.json (the table
the round-9 session measured by hand, now reproducible) and additionally
measures PQ/OPQ on a planted ANISOTROPIC corpus — the synthetic x20
embeddings are near-isotropic, which is precisely the regime where a
rotation cannot help, so the honest evidence is both numbers side by side.

Usage:  PYTHONPATH=/root/repo python tools/compression_family.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

X20 = os.environ.get("SPARK_GRAFT_X20", "/root/repo/.scale/x20")
OUT = "/root/repo/docs/COMPRESSION_FAMILY.json"
K = 5
N_QUERIES = 20


def l2_topk_exact(x: np.ndarray, q: np.ndarray, k: int) -> list[set]:
    out = []
    for qi in range(len(q)):
        d = np.sum((x - q[qi]) ** 2, axis=1)
        out.append(set(np.argsort(d, kind="stable")[:k].tolist()))
    return out


def main() -> None:
    from exstream_implementation_spark.operators.pq import (
        encode_pq,
        pq_adc_topk,
        train_pq,
    )
    from exstream_implementation_spark.operators.sq import (
        sq_encode,
        sq_topk,
        train_sq,
    )
    from exstream_implementation_spark.session import get_spark

    spark = get_spark(app_name="compression-family")
    emb = (
        spark.read.parquet(f"{X20}/embeddings.parquet")
        .select("vec_id", "embedding")
        .persist()
    )
    n = emb.count()
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    x = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in rows]
    )
    d = x.shape[1]
    q, qids = x[:N_QUERIES], ids[:N_QUERIES]

    # exact ground truth, L2 (PQ's metric) and cosine (SQ's gate metric)
    t0 = time.time()
    truth_l2 = l2_topk_exact(x, q, K)
    wall_exact = round(time.time() - t0, 2)

    report: dict = {
        "corpus_vectors": int(n),
        "dim": int(d),
        "k": K,
        "n_queries": N_QUERIES,
        "bytes_per_vec": {
            "exact_fp32": d * 4, "sq8": d, "pq_m8": 8, "pq_m16": 16,
        },
        "wall_s": {"exact_l2_topk_numpy": wall_exact},
        "recall_at_5": {},
    }

    # --- SQ8 ------------------------------------------------------------
    t0 = time.time()
    sq_params = train_sq(emb)
    sq_codes = sq_encode(emb, sq_params).select("vec_id", "sq_code").persist()
    sq_codes.count()
    report["wall_s"]["sq8_train_encode"] = round(time.time() - t0, 2)
    q_df = spark.createDataFrame(
        [(int(qids[i]), [float(v) for v in q[i]]) for i in range(len(q))],
        "query_id int, qvec array<float>",
    )
    t0 = time.time()
    got = sq_topk(spark, sq_codes, q_df, sq_params, k=K).collect()
    report["wall_s"]["sq8_topk"] = round(time.time() - t0, 2)
    by_q: dict[int, set] = {}
    for r in got:
        by_q.setdefault(int(r["query_id"]), set()).add(int(r["doc_id"]))
    # sq_topk ranks by cosine — gate against exact cosine truth
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    truth_cos = [
        set(
            np.argsort(-(xn @ (q[qi] / np.linalg.norm(q[qi]))),
                       kind="stable")[:K].tolist()
        )
        for qi in range(len(q))
    ]
    hits = sum(
        len(by_q.get(int(qids[qi]), set())
            & {int(ids[j]) for j in truth_cos[qi]})
        for qi in range(len(q))
    )
    report["recall_at_5"]["sq8_vs_exact_cosine"] = round(
        hits / (K * len(q)), 3
    )

    # --- PQ m=8/m=16, plain and OPQ-rotated -------------------------------
    # the m=16 rows are the isotropic A/B: the x20 embeddings are near-
    # isotropic, where NO rotation can help (every orthonormal frame has
    # the same expected distortion) — doubling the code budget is the
    # honest recall lever there, and the rows record it
    for label, opq, m_sub in (
        ("pq_m8", False, 8),
        ("opq_m8", True, 8),
        ("pq_m16", False, 16),
        ("opq_m16", True, 16),
    ):
        t0 = time.time()
        model = train_pq(emb, m=m_sub, ksub=16, max_iter=8, opq=opq)
        codes = encode_pq(emb, model).persist()
        codes.count()
        report["wall_s"][f"{label}_train_encode"] = round(time.time() - t0, 2)
        t0 = time.time()
        got = pq_adc_topk(q, qids, codes, model, k=K).collect()
        report["wall_s"][f"{label}_adc_topk"] = round(time.time() - t0, 2)
        by_q = {}
        for r in got:
            by_q.setdefault(int(r["query_id"]), set()).add(
                int(r["neighbor_id"])
            )
        hits = sum(
            len(by_q.get(int(qids[qi]), set())
                & {int(ids[j]) for j in truth_l2[qi]})
            for qi in range(len(q))
        )
        report["recall_at_5"][f"{label}_vs_exact_l2"] = round(
            hits / (K * len(q)), 3
        )
        codes.unpersist()
    emb.unpersist()

    # --- anisotropic fixture: where rotation MUST win ---------------------
    rng = np.random.default_rng(17)
    scales = np.concatenate([np.full(6, 10.0), np.full(d - 6, 0.3)])
    basis, _ = np.linalg.qr(rng.normal(size=(d, d)))
    xa = (rng.normal(size=(4000, d)) * scales) @ basis.T
    dfa = spark.createDataFrame(
        [(i, [float(v) for v in xa[i]]) for i in range(len(xa))],
        "vec_id long, embedding array<float>",
    ).persist()
    qa, qa_ids = xa[:N_QUERIES], np.arange(N_QUERIES, dtype=np.int64)
    truth_a = l2_topk_exact(xa, qa, K)
    aniso = {}
    for label, opq in (("pq_m8", False), ("opq_m8", True)):
        model = train_pq(dfa, m=8, ksub=16, max_iter=8, opq=opq)
        codes = encode_pq(dfa, model)
        got = pq_adc_topk(qa, qa_ids, codes, model, k=K).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(int(r["query_id"]), set()).add(
                int(r["neighbor_id"])
            )
        hits = sum(
            len(by_q.get(qi, set()) & truth_a[qi]) for qi in range(len(qa))
        )
        aniso[f"{label}_vs_exact_l2"] = round(hits / (K * len(qa)), 3)
    report["recall_at_5_anisotropic_4k"] = aniso

    # --- the COMPOSED index: IVF-PQ with/without the threaded rotation ----
    # nprobe == all cells so the comparison isolates the residual
    # quantizer; probe excludes self, so the ground truth does too.
    from exstream_implementation_spark.operators.ivfpq import (
        build_ivfpq_index,
        probe_ivfpq_index,
    )

    truth_noself = []
    for qi in range(len(qa)):
        dd = np.sum((xa - qa[qi]) ** 2, axis=1)
        dd[qi] = np.inf
        truth_noself.append(set(np.argsort(dd, kind="stable")[:K].tolist()))
    ivf_rows = {}
    tname = "t_cf_ivfpq"
    for label, opq in (("ivfpq_m8", False), ("ivfpq_opq_m8", True)):
        t0 = time.time()
        stats = build_ivfpq_index(
            spark, dfa, tname, k_cells=16, m=8, ksub=16, opq=opq
        )
        report["wall_s"][f"{label}_build"] = round(time.time() - t0, 2)
        got = probe_ivfpq_index(
            spark, tname, qa, qa_ids, nprobe=stats["k_effective"],
            k_neighbors=K,
        ).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(int(r["query_id"]), set()).add(
                int(r["neighbor_id"])
            )
        hits = sum(
            len(by_q.get(qi, set()) & truth_noself[qi])
            for qi in range(len(qa))
        )
        ivf_rows[f"{label}_vs_exact_l2"] = round(hits / (K * len(qa)), 3)
    for sfx in ("centroids", "codebooks", "codes", "meta", "rotation"):
        spark.sql(f"DROP TABLE IF EXISTS {tname}_{sfx}")
    report["recall_at_5_anisotropic_4k_ivfpq_nprobe_all"] = ivf_rows
    dfa.unpersist()

    with open(OUT, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
