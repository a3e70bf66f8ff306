"""Property tests (hypothesis) for the driver-side numeric cores, plus
one-shot Spark equivalence checks for the distributed operators."""

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from exstream_implementation_spark.streaming.stateful import (
    _entropy,
    _scan,
    batch_segmentation_entropy_reference,
)


def naive_seg_entropy_dropping_last(labels):
    """Brute-force C6 with quirk Q2: run-length segments, last term dropped."""
    if not labels:
        return 0.0
    segs, cur = [], 1
    for a, b in zip(labels, labels[1:]):
        if a == b:
            cur += 1
        else:
            segs.append(cur)
            cur = 1
    # final segment intentionally NOT appended (Q2)
    n = len(labels)
    return sum((l / n) * math.log(n / l) for l in segs)


@given(st.lists(st.integers(min_value=0, max_value=2), max_size=200))
@settings(max_examples=300, deadline=None)
def test_scan_entropy_matches_naive(labels):
    assert batch_segmentation_entropy_reference(labels) == pytest_approx(
        naive_seg_entropy_dropping_last(labels)
    )


@given(
    st.lists(st.integers(min_value=0, max_value=2), min_size=0, max_size=120),
    st.integers(min_value=1, max_value=5),
)
@settings(max_examples=200, deadline=None)
def test_scan_is_chunking_invariant(labels, n_chunks):
    """Feeding the same sequence in any number of chunks must give the same
    state — the property that makes the operator correct across micro-batches."""
    whole = _scan(labels, (0, 0, 0.0, 0, -1, 0))
    st_ = (0, 0, 0.0, 0, -1, 0)
    k = max(1, len(labels) // n_chunks)
    for i in range(0, len(labels), k):
        st_ = _scan(labels[i : i + k], st_)
    assert st_[0] == whole[0] and st_[3] == whole[3]
    assert _entropy(st_[0], st_[1], st_[2]) == pytest_approx(
        _entropy(whole[0], whole[1], whole[2])
    )


def pytest_approx(x):
    import pytest

    return pytest.approx(x, abs=1e-12)


def test_salted_agg_equals_plain_groupby(spark):
    from exstream_implementation_spark.operators.skew import salted_agg

    df = spark.range(0, 5000).select(
        (F.col("id") % 4).alias("k"),
        F.col("id").alias("sub"),
        (F.col("id") * 7 % 101).cast("double").alias("v"),
    )
    got = salted_agg(
        df,
        keys=["k"],
        aggs={
            "n": ("sum", F.count(F.lit(1))),
            "s": ("sum", F.sum("v")),
            "mx": ("max", F.max("v")),
            "mn": ("min", F.min("v")),
        },
        salt_col=F.col("sub"),
        n_salts=13,
    )
    want = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.max("v").alias("mx"),
        F.min("v").alias("mn"),
    )
    as_map = lambda d: {r["k"]: (r["n"], r["s"], r["mx"], r["mn"]) for r in d.collect()}
    assert as_map(got) == as_map(want)


def test_kmeans_inertia_decreases_and_partitions(spark):
    from exstream_implementation_spark.operators.kmeans import (
        _assign,
        kmeans_train,
    )

    vecs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    centroids, history = kmeans_train(vecs, k=6, max_iter=5)
    # Lloyd's algorithm: inertia is monotonically non-increasing
    assert all(a >= b - 1e-9 for a, b in zip(history, history[1:])), history
    assert len(history) >= 2 and history[-1] < history[0]
    # every vector lands in exactly one of ≤ k cells
    assigned = _assign(vecs, centroids)
    assert assigned.count() == vecs.count()
    n_cells = assigned.select("cell").distinct().count()
    assert 1 < n_cells <= 6


def test_mass_profile_and_greedy_matches_bruteforce():
    """C3 numeric core: the FFT distance profile and the stumpy-style greedy
    exclusion count must match a naive O(n·m) implementation on random data."""
    import numpy as np

    from exstream_implementation_spark.operators.fp_filter import (
        count_matches,
        mass_distance_profile,
    )

    rng = np.random.default_rng(123)
    for trial in range(20):
        n = int(rng.integers(20, 200))
        m = int(rng.integers(4, max(5, n // 3)))
        ts = rng.normal(0, 1, n)
        if trial % 4 == 0:  # plant a near-match
            q = ts[5 : 5 + m].copy() + rng.normal(0, 0.01, m)
        elif trial % 4 == 1:  # constant query (degenerate)
            q = np.full(m, 3.14)
        else:
            q = rng.normal(0, 1, m)
        got = mass_distance_profile(q, ts)
        # naive z-normalized distances
        want = np.empty(n - m + 1)
        qm, qs = q.mean(), q.std()
        for i in range(n - m + 1):
            w = ts[i : i + m]
            ws = w.std()
            if qs == 0:
                want[i] = 0.0 if ws == 0 else np.sqrt(m)
            elif ws == 0:
                want[i] = np.sqrt(m)
            else:
                zq = (q - qm) / qs
                zw = (w - w.mean()) / ws
                want[i] = np.sqrt(((zq - zw) ** 2).sum())
        assert np.allclose(got, want, atol=1e-6), trial
        # greedy count parity for a mid-range threshold
        thresh = float(np.percentile(want, 30))
        d = want.copy()
        excl = int(np.ceil(m / 4))
        expect = 0
        while True:
            i = int(np.argmin(d))
            if not (d[i] <= thresh):
                break
            expect += 1
            d[max(0, i - excl) : i + excl + 1] = np.inf
        assert count_matches(q, ts, thresh) == expect, trial


def test_mass_constant_query_with_inexact_mean():
    """A flat pattern whose float mean is INEXACT (e.g. [0.1]*3: std is
    ~1.4e-17, not 0) must behave like a constant query — distance 0 to
    constant windows, sqrt(m) to varying ones — not divide cancellation
    noise by 1e-17 and produce garbage."""
    import numpy as np

    from exstream_implementation_spark.operators.fp_filter import (
        count_matches,
        mass_distance_profile,
    )

    q = np.array([0.1, 0.1, 0.1])
    ts = np.concatenate([q, np.random.default_rng(5).normal(1000, 5, 40)])
    d = mass_distance_profile(q, ts)
    assert d[0] == 0.0  # its own (constant) window
    varying = d[4:]  # windows fully inside the noisy region
    assert np.allclose(varying, np.sqrt(3)), varying[:5]
    # greedy count: only the constant window(s) at the head can match
    assert count_matches(q, ts, max_distance=1e-6) == 1


def test_mass_nonfinite_values_do_not_poison_profile():
    """One NaN in the pooled series must only disqualify the windows that
    contain it (distance +inf) — not NaN the whole FFT profile and make
    count_matches silently return 0."""
    import numpy as np

    from exstream_implementation_spark.operators.fp_filter import (
        count_matches,
        mass_distance_profile,
    )

    rng = np.random.default_rng(11)
    ts = rng.normal(0, 1, 60)
    q = ts[40:48].copy()  # exact sub-slice → distance 0 at offset 40
    ts_nan = ts.copy()
    ts_nan[5] = np.nan
    d = mass_distance_profile(q, ts_nan)
    m = len(q)
    covered = np.arange(len(d)) + m > 5  # windows containing index 5
    touched = (np.arange(len(d)) <= 5) & covered
    assert np.all(np.isinf(d[touched]))
    assert np.all(np.isfinite(d[~touched]))
    assert d[40] < 1e-6
    # the self-match must still be counted despite the NaN elsewhere
    assert count_matches(q, ts_nan, max_distance=1.0) >= 1
    # an all-NaN query can never match anything
    qq = q.copy()
    qq[0] = np.nan
    assert count_matches(qq, ts, max_distance=1e9) == 0


def test_chunked_mass_equals_whole_series(spark):
    """Chunking with (m-1)-overlap reproduces one-shot MASS on the full
    series for every chunk size (up to FFT rounding: the per-chunk transform
    size differs from the whole-series one, so distances agree to ~1e-7, not
    bitwise)."""
    import numpy as np
    import pytest

    from exstream_implementation_spark.operators.fp_filter import (
        mass_distance_profile,
    )
    from exstream_implementation_spark.operators.mass_distributed import (
        mass_profile_distributed,
    )

    rng = np.random.default_rng(7)
    n, m = 200, 7
    ts = np.round(rng.normal(size=n) * 10, 3)
    # include a constant stretch to hit the degenerate sigma=0 branch
    ts[50:70] = 5.0
    pattern = ts[30:30 + m]
    expect = mass_distance_profile(pattern, ts)

    series = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(ts)], "seq long, value double"
    )
    for chunk_size in (m, 16, 50, 200, 1000):
        got_rows = mass_profile_distributed(
            series, pattern, chunk_size=chunk_size
        ).collect()
        got = {r["start"]: r["dist"] for r in got_rows}
        assert len(got) == n - m + 1, chunk_size
        for s in range(n - m + 1):
            assert got[s] == pytest.approx(expect[s], abs=1e-6), (chunk_size, s)


def test_ann_recall_vs_brute_force(spark):
    """Retrieval-quality gate: the LSH- and IVF-bucketed ANN paths must keep
    recall@5 >= 0.9 against the exact brute-force ranking (the oracle hash
    gate pins exactness on fixed data; this pins QUALITY as data varies)."""
    from pyspark.sql import functions as F

    from exstream_implementation_spark.plans import similarity as sim

    sf_dir = "/root/testdata/sf0.01"
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.ann_topk_cosine(spark, sf_dir)
        .filter(F.col("rank") <= 5)
        .collect()
    }
    by_q = {}
    for q, n in exact:
        by_q.setdefault(q, set()).add(n)

    # IVF on near-random embeddings: recall is probed-fraction-driven, so the
    # gate probes ~80% of the √n-derived cells — it verifies the
    # probe/union/rank mechanics; clustered corpora get small-nprobe recall
    # from trained centroids (operators/kmeans.py).
    import math

    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    stride = sim._centroid_stride(n)
    n_cells = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") % stride == 0)
        .count()
    )
    ivf_nprobe = math.ceil(0.8 * n_cells)

    for name, fn in [
        ("lsh", sim.ann_lsh_topk),
        ("ivf", lambda s, d: sim.ann_ivf_topk(s, d, nprobe=ivf_nprobe)),
        # trained-centroid IVF (operators/kmeans.py wired end-to-end): same
        # probed-fraction logic — ~80% of the ≈√n trained cells
        ("ivf_trained", lambda s, d: sim.ann_ivf_trained_topk(
            s, d, nprobe=math.ceil(0.8 * sim._centroid_stride(n)), max_iter=3
        )),
    ]:
        approx = {}
        for r in fn(spark, sf_dir).collect():
            approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        recalls = [
            len(approx.get(q, set()) & wanted) / len(wanted)
            for q, wanted in by_q.items()
        ]
        recall = sum(recalls) / len(recalls)
        assert recall >= 0.9, f"{name} recall@5 = {recall:.2f} < 0.9"


def test_ivf_centroid_count_grows_sqrt(spark):
    """The IVF index must scale sublinearly: #centroids ≈ √n at every SF
    (round-2 verdict: a fixed stride made it n/50 — linear).  Pinned across
    two scale factors so a future constant-stride regression fails here."""
    from exstream_implementation_spark.plans import similarity as sim

    for sf in ["sf0.01", "sf0.1"]:
        e = spark.read.parquet(f"/root/testdata/{sf}/embeddings.parquet")
        n = e.count()
        stride = sim._centroid_stride(n)
        n_cents = e.filter(F.col("vec_id") % stride == 0).count()
        assert 0.8 <= n_cents / (n**0.5) <= 1.3, (sf, n, n_cents)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-1000, max_value=1000),
            st.floats(min_value=-100, max_value=100, allow_nan=False),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=5),
)
@settings(max_examples=8, deadline=None)
def test_global_lag_property(rows, nparts):
    """global_lag == single-partition lag for arbitrary key/value sets and
    partition counts (boundary stitching has no edge-case holes)."""
    from pyspark.sql import Window

    from exstream_implementation_spark.operators.ranking import global_lag
    from exstream_implementation_spark.session import get_spark

    spark = get_spark(app_name="exstream-spark-tests", shuffle_partitions=8)
    df = spark.createDataFrame(rows, "k int, v double")
    got = sorted(
        tuple(r)
        for r in global_lag(
            df, [F.asc("k")], "v", num_partitions=nparts
        ).select("k", "v", "rn", "prev").collect()
    )
    w = Window.orderBy("k")
    want = sorted(
        tuple(r)
        for r in df.select(
            "k", "v",
            F.row_number().over(w).alias("rn"),
            F.lag("v").over(w).alias("prev"),
        ).collect()
    )
    assert got == want


def test_sequence_packing_invariants():
    """FFD packing over real chunk data: every chunk packed exactly once, no
    sequence over capacity, and fill beats the one-chunk-per-sequence
    strawman by a wide margin."""
    from exstream_implementation_spark.operators.packing import (
        pack_sequences,
        packing_stats,
    )
    from exstream_implementation_spark.plans.text import udtf_token_chunks
    from exstream_implementation_spark.session import get_spark

    spark = get_spark(app_name="exstream-spark-tests", shuffle_partitions=8)
    chunks = udtf_token_chunks(spark, "/root/testdata/sf0.01").select(
        "doc_id", "chunk_idx", "n_toks"
    )
    capacity = 64
    packed = pack_sequences(chunks, capacity, num_groups=8).persist()

    n_chunks = chunks.count()
    assert packed.count() == n_chunks  # every chunk exactly once
    assert (
        packed.select("doc_id", "chunk_idx").distinct().count() == n_chunks
    )
    over = packed.groupBy("pack_group", "seq_id").agg(
        F.sum("n_toks").alias("s"), F.first("seq_fill").alias("fill")
    )
    assert over.filter(F.col("s") > capacity).count() == 0
    assert over.filter(F.col("s") != F.col("fill")).count() == 0

    stats = packing_stats(packed, capacity).first()
    assert stats["n_sequences"] < n_chunks  # actually packs
    assert stats["mean_fill"] > 0.5

    # determinism: identical assignment on a rerun
    again = pack_sequences(chunks, capacity, num_groups=8)
    a = sorted(tuple(r) for r in packed.collect())
    b = sorted(tuple(r) for r in again.collect())
    assert a == b


def test_leftmost_fit_tree_equals_naive_first_fit():
    """The O(log m) segment-tree first-fit must assign EXACTLY like the
    naive scan-every-open-sequence loop — first (leftmost) fit, not
    best-fit — across random decreasing-sorted instances."""
    import random

    from exstream_implementation_spark.operators.packing import _LeftmostFit

    rng = random.Random(7)
    for trial in range(50):
        capacity = rng.choice([16, 64, 257])
        sizes = sorted(
            (rng.randint(1, capacity) for _ in range(rng.randint(1, 200))),
            reverse=True,
        )
        naive_fills: list[int] = []
        naive_assign = []
        for n in sizes:
            placed = None
            for s, fill in enumerate(naive_fills):
                if fill + n <= capacity:
                    placed = s
                    break
            if placed is None:
                placed = len(naive_fills)
                naive_fills.append(0)
            naive_fills[placed] += n
            naive_assign.append(placed)

        fills: list[int] = []
        tree = _LeftmostFit()
        assign = []
        for n in sizes:
            placed = tree.leftmost(n)
            if placed is None:
                placed = len(fills)
                fills.append(0)
                tree.append(capacity)
            fills[placed] += n
            tree.update(placed, capacity - fills[placed])
            assign.append(placed)
        assert assign == naive_assign, (trial, capacity)
        assert fills == naive_fills, (trial, capacity)


def test_pack_sequences_string_ids():
    """The output schema derives from the input: string doc ids (common in
    dedup pipelines) must pack, keeping the caller's names and types."""
    from exstream_implementation_spark.operators.packing import pack_sequences
    from exstream_implementation_spark.session import get_spark

    spark = get_spark(app_name="exstream-spark-tests", shuffle_partitions=8)
    chunks = spark.createDataFrame(
        [("url://a", i, 10 + i) for i in range(6)]
        + [("url://b", i, 30) for i in range(4)],
        "url string, part long, toks long",
    )
    packed = pack_sequences(
        chunks, capacity=40, num_groups=2, id_cols=("url", "part"),
        toks_col="toks",
    )
    rows = packed.collect()
    assert len(rows) == 10
    assert packed.schema["url"].dataType.simpleString() == "string"
    assert packed.schema["part"].dataType.simpleString() == "bigint"
    assert packed.schema["toks"].dataType.simpleString() == "bigint"
    # capacity respected per (group, seq)
    fills: dict = {}
    for r in rows:
        fills.setdefault((r["pack_group"], r["seq_id"]), 0)
        fills[(r["pack_group"], r["seq_id"])] += r["toks"]
    assert all(v <= 40 for v in fills.values())


def test_emb_neardup_lsh_recall():
    """The label-free LSH-blocked near-dup pass must recover >= 85% of the
    true cosine>=0.3 pairs that brute force finds (candidates come from the
    multiprobe band join, never an all-pairs self-join)."""
    from pyspark.sql import functions as SF

    from exstream_implementation_spark.plans.similarity import (
        _cosine_expr,
        emb_neardup_lsh,
    )
    from exstream_implementation_spark.session import get_spark
    from exstream_implementation_spark.sources import load_table

    spark = get_spark(app_name="exstream-spark-tests", shuffle_partitions=8)
    sf_dir = "/root/testdata/sf0.01"
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    a = e.select(SF.col("vec_id").alias("vec_a"), SF.col("embedding").alias("emb_a"))
    b = e.select(SF.col("vec_id").alias("vec_b"), SF.col("embedding").alias("emb_b"))
    cos = SF.expr(_cosine_expr("emb_a", "emb_b"))
    truth = {
        (r["vec_a"], r["vec_b"])
        for r in a.join(b, SF.col("vec_a") < SF.col("vec_b"))
        .filter(cos >= 0.3)
        .select("vec_a", "vec_b")
        .collect()
    }
    got = {
        (r["vec_a"], r["vec_b"])
        for r in emb_neardup_lsh(spark, sf_dir).collect()
    }
    assert got <= truth or not truth  # no false positives (exact re-rank)
    recall = len(got & truth) / len(truth) if truth else 1.0
    assert recall >= 0.85, f"lsh near-dup recall {recall:.2f}"


def test_adaptive_lsh_planes_contract(spark):
    """The oracle CTE is generated with the fixed N_PLANES width, so the
    adaptive count MUST equal the floor at the correctness-gate corpora
    (sf <= 0.01) and grow with larger corpora (occupancy held ~constant)."""
    from exstream_implementation_spark.plans import similarity as sim

    sim._PLANES_CACHE.clear()
    assert sim._active_planes(spark, "/root/testdata/sf0.01") == sim.N_PLANES
    bigger = sim._active_planes(spark, "/root/testdata/sf0.1")
    assert bigger > sim.N_PLANES  # 2000 vectors / occ 64 -> 5 planes
    # memoized: second call must not re-count
    assert sim._PLANES_CACHE["/root/testdata/sf0.1"] == bigger


def _semdedup_mirror(rows, stride, min_cos):
    """Numpy mirror of _ivf_parts/_ivf_assign_spark + within-cell prune for
    an explicit stride: stride-th centroids, max-cos cell, lowest-lower-id
    representative at cosine >= min_cos."""
    import numpy as np

    ids = np.array([r["vec_id"] for r in rows])
    mat = np.stack([np.array(r["embedding"], dtype=np.float64) for r in rows])
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    norms = np.linalg.norm(mat, axis=1)

    cent_mask = ids % stride == 0
    cids, cmat, cnorms = ids[cent_mask], mat[cent_mask], norms[cent_mask]
    cos_to_c = (mat @ cmat.T) / np.outer(norms, cnorms)
    # ties broken by ascending centroid id == argmax on first max occurrence
    cells = cids[np.argmax(np.round(cos_to_c, 12), axis=1)]

    want = {}
    for ci in np.unique(cells):
        members = ids[cells == ci]
        sub = mat[np.isin(ids, members)]
        subn = norms[np.isin(ids, members)]
        cos = np.round((sub @ sub.T) / np.outer(subn, subn), 5)
        for bi, b in enumerate(members):
            lower = [
                a
                for ai, a in enumerate(members)
                if a < b and cos[ai, bi] >= min_cos
            ]
            if lower:
                keep = min(lower)
                ai = list(members).index(keep)
                want[int(b)] = (int(keep), float(cos[ai, bi]))
    return want


def test_semantic_dedup_matches_brute_force_mirror(spark):
    """semantic_dedup (SemDeDup-style: deterministic IVF cells + within-cell
    prune) must agree exactly with a numpy mirror of the same rule — on BOTH
    quantizations: the ANN-shared √n cells (target_cell=None, what the
    oracle-gated catalog slot runs) and the linear-cost bounded cells
    (the production default's constant target_cell)."""
    import math

    from exstream_implementation_spark.plans.similarity import semantic_dedup

    sf_dir = "/root/testdata/sf0.01"
    min_cos = 0.35  # the 500-vector fixture has ~58 in-cell pairs here

    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )

    sqrt_stride = max(1, math.isqrt(len(rows)))
    for target_cell, stride in ((None, sqrt_stride), (64, 64)):
        want = _semdedup_mirror(rows, stride, min_cos)
        got = {
            r["vec_id"]: (r["keep_id"], r["cosine"])
            for r in semantic_dedup(
                spark, sf_dir, min_cosine=min_cos, target_cell=target_cell
            ).collect()
        }
        assert got == want, f"target_cell={target_cell}"
        assert want, "fixture produced no prunes — threshold too high to test"


def test_asof_join_matches_pandas_merge_asof(spark):
    """Property: the union+carry-forward as-of join must agree with pandas
    merge_asof(direction='backward') on randomized keyed series — including
    equal-timestamp matches, left rows before any right row, and keys
    present on only one side.  (The catalog oracle pins fixed data; this
    pins the SEMANTICS as data varies.)"""
    import numpy as np
    import pandas as pd

    import pytest

    from exstream_implementation_spark.operators.asof import asof_join_backward

    rng = np.random.default_rng(42)
    for trial in range(3):
        n_l, n_r = int(rng.integers(20, 120)), int(rng.integers(5, 80))
        left = pd.DataFrame(
            {
                "k": rng.integers(0, 5, n_l),
                "lts": rng.integers(0, 500, n_l),
                "lval": rng.normal(size=n_l).round(3),
            }
        )
        right = pd.DataFrame(
            {
                "k": rng.integers(0, 6, n_r),  # key 5 only on the right
                "rts": rng.integers(0, 500, n_r),
                "payload": rng.normal(size=n_r).round(3),
            }
        )
        # merge_asof is undefined across duplicate (k, rts): collapse to the
        # LAST row per (k, rts), matching the operator's documented tiebreak
        right = right.sort_values(["k", "rts"]).groupby(["k", "rts"], as_index=False).last()

        ldf = spark.createDataFrame(left.assign(row=np.arange(n_l)))
        rdf = spark.createDataFrame(right)
        got = {
            r["row"]: r["asof_payload"]
            for r in asof_join_backward(
                ldf, rdf, by="k", left_ts="lts", right_ts="rts",
                payload_cols=["payload"],
            ).collect()
        }

        want_df = pd.merge_asof(
            left.assign(row=np.arange(n_l)).sort_values("lts"),
            right.rename(columns={"rts": "lts"}).sort_values("lts"),
            on="lts", by="k", direction="backward",
        )
        want = dict(zip(want_df["row"], want_df["payload"]))
        for row in range(n_l):
            g, w = got.get(row), want.get(row)
            if w is None or (isinstance(w, float) and np.isnan(w)):
                assert g is None, (trial, row, g)
            else:
                assert g == pytest.approx(w), (trial, row, g, w)


def test_upward_probe_candidates_match_symmetric(spark):
    """The upward-flip (0→1) Hamming-1 probe must produce EXACTLY the
    candidate pair set of the symmetric ±flip probing: for a pair differing
    in bit k, the side holding 0 at k probes the other; equal-bucket pairs
    meet through the own-bucket probe."""
    from exstream_implementation_spark.plans.similarity import (
        _active_planes,
        _buckets_spark,
    )

    sf_dir = "/root/testdata/sf0.001"
    bands = _buckets_spark(spark, sf_dir).select("vec_id", "tbl", "bucket")
    planes = _active_planes(spark, sf_dir)

    sym_probes = bands.select(
        "vec_id",
        "tbl",
        F.explode(
            F.array_distinct(
                F.array(
                    F.col("bucket"),
                    *[
                        F.expr(f"cast(bucket ^ {1 << b} as long)")
                        for b in range(planes)
                    ],
                )
            )
        ).alias("pbucket"),
    )
    sym = (
        sym_probes.alias("a")
        .join(
            bands.alias("b"),
            (F.col("b.tbl") == F.col("a.tbl"))
            & (F.col("b.bucket") == F.col("a.pbucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select("a.vec_id", "b.vec_id")
    )
    want = {(r[0], r[1]) for r in sym.distinct().collect()}

    up_probes = bands.select(
        "vec_id",
        "tbl",
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.expr(
                        f"CASE WHEN bucket & {1 << b} = 0"
                        f" THEN cast(bucket | {1 << b} as long) END"
                    )
                    for b in range(planes)
                ],
            )
        ).alias("pbucket"),
    ).filter(F.col("pbucket").isNotNull())
    up = (
        up_probes.alias("a")
        .join(
            bands.alias("b"),
            (F.col("b.tbl") == F.col("a.tbl"))
            & (F.col("b.bucket") == F.col("a.pbucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.least("a.vec_id", "b.vec_id").alias("va"),
            F.greatest("a.vec_id", "b.vec_id").alias("vb"),
        )
    )
    got = {(r[0], r[1]) for r in up.distinct().collect()}
    assert got == want and len(got) > 0


def test_vectorized_buckets_match_sql_fold(spark):
    """The Arrow matmul bucket builder must reproduce the JVM fold's
    (vec_id, tbl, bucket) assignment exactly on the real corpus (a sign
    flip would need a dot within float-noise of zero)."""
    from exstream_implementation_spark.plans.similarity import (
        _buckets_spark,
        lsh_buckets_vectorized,
    )

    sf_dir = "/root/testdata/sf0.001"
    want = {
        (r["vec_id"], r["tbl"]): r["bucket"]
        for r in _buckets_spark(spark, sf_dir).collect()
    }
    got = {
        (r["vec_id"], r["tbl"]): r["bucket"]
        for r in lsh_buckets_vectorized(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_neardup_vectorized_buckets_same_pairs(spark):
    from pyspark.sql import functions as F  # noqa: F811

    from exstream_implementation_spark.plans.similarity import (
        emb_neardup_lsh,
        lsh_buckets_vectorized,
    )

    sf_dir = "/root/testdata/sf0.001"
    base = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in emb_neardup_lsh(spark, sf_dir).collect()
    }
    vec = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in emb_neardup_lsh(
            spark, sf_dir, buckets=lsh_buckets_vectorized(spark, sf_dir)
        ).collect()
    }
    assert vec == base and len(vec) > 0


def test_emb_neardup_lsh_planted_neardup_recall(spark, tmp_path):
    """Recall gate at the CHOSEN operating point (TARGET_BUCKET_OCC=64,
    docs/ROUND8.md §5): near-duplicate pairs planted at cosine ≈ 0.94 into a
    4096-vector random corpus must be recovered at ≥ 0.9 through the
    ADAPTIVE-planes path (n=4396 → 7 planes — past the N_PLANES floor the
    sf0.01 gate exercises).  The base corpus has no high-cosine pairs, so
    every planted pair is a true near-dup the pass exists to catch."""
    import os

    import numpy as np

    from exstream_implementation_spark.plans import similarity as sim

    rng = np.random.default_rng(7)
    n_base, n_pairs, dim = 4096, 300, 64
    base = rng.standard_normal((n_base, dim))
    rows = [(i, int(i % 37), [float(x) for x in base[i]]) for i in range(n_base)]
    planted = []
    for k in range(n_pairs):
        src = k * 13 % n_base
        noise = rng.standard_normal(dim)
        v = base[src] + noise * (
            np.linalg.norm(base[src]) / np.linalg.norm(noise) * 0.35
        )
        vid = n_base + k
        rows.append((vid, int(src % 37), [float(x) for x in v]))
        planted.append((src, vid))
    d = str(tmp_path / "planted_corpus")
    spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    ).write.parquet(os.path.join(d, "embeddings.parquet"))

    sim._PLANES_CACHE.clear()
    try:
        got = {
            (r["vec_a"], r["vec_b"])
            for r in sim.emb_neardup_lsh(spark, d)
            .select("vec_a", "vec_b")
            .collect()
        }
        assert sim._PLANES_CACHE[d] == 7  # adaptive path, past the floor
    finally:
        sim._PLANES_CACHE.clear()  # tmp dir must not linger in the cache
    hits = sum(1 for s, v in planted if (min(s, v), max(s, v)) in got)
    assert hits / n_pairs >= 0.9, f"planted near-dup recall {hits}/{n_pairs}"


def test_emb_neardup_hot_bucket_cap_mechanism(spark, tmp_path):
    """max_bucket (opt-in production knob): a planted dense cluster floods
    its LSH buckets; with the cap those buckets leave candidate generation
    (cluster pairs vanish) while every pair OUTSIDE the hot buckets is
    untouched — capping is surgical, not a global recall tax.  On the real
    x20 corpus the cap never binds (max bucket 168 < any sane cap,
    docs/ROUND8.md §5b); this pins the mechanism for corpora where it does."""
    import os

    import numpy as np

    from exstream_implementation_spark.plans import similarity as sim

    rng = np.random.default_rng(11)
    dim = 64
    rows = [
        (i, 0, [float(x) for x in rng.standard_normal(dim)]) for i in range(512)
    ]
    # 100 vectors in a tight cone: same direction + small jitter → they all
    # land in the same buckets and pair with each other at high cosine
    center = rng.standard_normal(dim)
    for k in range(100):
        v = center + rng.standard_normal(dim) * 0.05
        rows.append((1000 + k, 0, [float(x) for x in v]))
    d = str(tmp_path / "hot_corpus")
    spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    ).write.parquet(os.path.join(d, "embeddings.parquet"))

    def pairs(cap):
        sim._PLANES_CACHE.clear()
        try:
            return {
                (r["vec_a"], r["vec_b"])
                for r in sim.emb_neardup_lsh(spark, d, max_bucket=cap)
                .select("vec_a", "vec_b")
                .collect()
            }
        finally:
            sim._PLANES_CACHE.clear()

    uncapped = pairs(None)
    capped = pairs(50)
    cluster = {(a, b) for a, b in uncapped if a >= 1000 and b >= 1000}
    assert len(cluster) > 1000  # the dense cluster dominates the pair set
    # the cap is a strict candidate filter...
    assert capped <= uncapped
    # ...that removes the hot-bucket (cluster) pairs entirely...
    assert not {(a, b) for a, b in capped if a >= 1000 and b >= 1000}
    # ...while pairs meeting in NON-hot buckets survive: any pair that met
    # only inside a hot bucket (incl. mixed random-cluster pairs) is gone by
    # design, but the bulk of random-random pairs never touch a hot bucket
    rr = lambda s: {(a, b) for a, b in s if a < 1000 and b < 1000}
    assert rr(uncapped) and len(rr(capped)) >= 0.9 * len(rr(uncapped))


# --- cluster-balanced diversity sampling (operators/kmeans.py) ---------------
def test_cluster_balanced_sample_quota_and_determinism(spark):
    from pyspark.sql import functions as F

    from exstream_implementation_spark.operators.kmeans import (
        cluster_balanced_sample,
    )

    vecs = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    got = cluster_balanced_sample(vecs, n_cells=6, per_cell=10)
    rows = got.collect()
    # output rows come from the input, keep their embedding, carry a cell
    ids = {r["vec_id"] for r in rows}
    assert ids <= {r["vec_id"] for r in vecs.select("vec_id").collect()}
    # quota: never more than per_cell from any cell, and a cell smaller
    # than the quota contributes all its members
    per = (
        got.groupBy("cell").agg(F.count("*").alias("c")).collect()
    )
    assert all(r["c"] <= 10 for r in per)
    assert len(rows) == sum(r["c"] for r in per)
    # deterministic across re-runs and partitionings
    again = {
        r["vec_id"]
        for r in cluster_balanced_sample(
            vecs.repartition(7), n_cells=6, per_cell=10
        ).collect()
    }
    assert ids == again
    # a different salt draws a different sample from the SAME clusters
    other = {
        r["vec_id"]
        for r in cluster_balanced_sample(
            vecs, n_cells=6, per_cell=10, salt=3
        ).collect()
    }
    assert ids != other
    import pytest

    with pytest.raises(ValueError, match="per_cell"):
        cluster_balanced_sample(vecs, n_cells=4, per_cell=0)
