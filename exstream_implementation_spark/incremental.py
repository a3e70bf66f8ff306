"""Incremental corpus preparation — the daily-crawl loop over
``corpus_prep.prepare_corpus``.

A 100 TB corpus is not built once: batches arrive (a crawl dump, a day of
ingest) and reprocessing the whole corpus per batch is O(corpus) per
increment.  This module processes ONLY the new batch against persisted,
versioned pipeline state, at O(batch) cost per stage plus joins against
state tables that are themselves sub-corpus-sized (distinct hashes,
sampled anchors, per-source counts, LM count tables):

  state        what it answers                      size
  ---------    ----------------------------------   -----------------------
  hashes       exact dedup vs all prior batches     1 row / distinct doc
  anchors      substring dedup vs all prior text    1 long / k-gram anchor
                                                    (/ mod with sampling)
  source       remaining per-source cap quota       1 row / source
  merges.json  frozen BPE tokenizer                 O(merges)
  lm_*         frozen bigram quality LM (opt-in)    O(vocab)

**Equivalence contract** (pytest-pinned): when batch doc_ids are strictly
increasing across batches (enforced — see ``max_doc_id``), the surviving
document set and the cleaned text of every doc-level stage up to ``mixed``
are IDENTICAL to a from-scratch ``prepare_corpus`` over the union, because
every keep-first convention (exact dedup min-doc_id, substring keep-first
min-(doc_id, pos), deterministic cap smallest-doc_id, per-doc hash
Bernoulli mix) resolves "first" to the earlier batch.  Three deviations
are inherent to incrementality and documented rather than hidden:

  * the BPE tokenizer and the LM quality gate are FROZEN from the initial
    build (a from-scratch run would retrain on the union) — the standard
    operational choice: tokenizer identity across increments is a
    requirement for the training job, not a compromise.  Frozen is
    MONITORED, not blind: every increment records how the frozen
    artifacts fit its batch (``_artifact_stats``) and
    ``prep_state_is_stale`` / ``describe_prep_state`` surface a staleness
    verdict against the init-time baseline; the retrain path is a full
    rebuild under a new state root;
  * τ-derived mix fractions are frozen from the initial corpus's source
    sizes (``mix_fractions`` passed explicitly are identical by
    construction);
  * the weighted cap (``cap_weight_col``) tops up remaining quota with ES
    sampling over the NEW batch only — prior winners are already exported
    and cannot be retracted, so this is quota top-up semantics, not
    from-scratch ES over the union.

**Atomicity**: each increment writes its shard tree (overwrite-idempotent),
publishes new immutable versions of every state table
(operators/snapshots.py), and only then atomically replaces
``_STATE.json`` — which records the exact version of each table to read.
A crashed increment leaves orphan versions above the committed pointer
(vacuumable) and the state file untouched; re-running the increment is
safe and produces the same output.
"""

from __future__ import annotations

import dataclasses
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from exstream_implementation_spark.corpus_prep import (
    CorpusPrepConfig,
    _norm_hash,
    chunk_tokens,
    drop_contaminated,
    exact_dedup,
    export_sequences,
    pack_and_sequence,
    prepare_corpus,
    quality_filter,
)
from exstream_implementation_spark.operators.bpe import (
    apply_bpe,
    load_merges,
    save_merges,
)
from exstream_implementation_spark.operators.snapshots import (
    publish_snapshot,
    read_version,
)
from exstream_implementation_spark.plans.substring import (
    duplicated_positions,
    gram_anchors,
    remove_spans,
    spans_from_positions,
)

_STATE_FILE = "_STATE.json"
# membership state lives as APPEND-ONLY batch-partitioned logs: an
# increment writes ONLY its batch's rows to <state>/<name>/batch=i/ —
# O(batch) per increment, where a versioned-snapshot rewrite of the union
# would be O(corpus) per increment (measured: at x20 the snapshot form
# made an increment SLOWER than a full rebuild).  Duplicates ACROSS
# batches are harmless — both consumers are semi/anti membership joins —
# so no global distinct is ever needed; rows are distinct within a batch
# only.  Readers union exactly the batches committed in _STATE.json, so a
# crashed increment's orphan batch dir is invisible and a retry's
# mode=overwrite write is idempotent.
_LOGS = ("hashes", "anchors")
# the membership logs each carry a persisted Bloom sidecar (state["bloom"])
# so an increment's "is this key in ALL prior batches?" checks do not pay
# an O(state) log-stream per increment (the r10 §7c linear component):
#   * init / compaction write the filter in DENSE chunk form
#     ({name}_bloom/chunks, operators/bloom.bloom_chunks — driver assembly
#     reads <= m/8 bytes, never O(items));
#   * each increment appends a SPARSE delta ({name}_bloom/pos:
#     (chunk_id, array<local bit positions>) — O(batch) write/read);
#   * assembly is session-cached per (state_path, log, state identity): a
#     long-lived writer ORs in only each new delta, and probes the batch
#     keys against the broadcast bitmap.  "Definitely absent" keys skip
#     the log entirely; "maybe" keys go through the EXACT log join (so a
#     false positive costs a few joined rows, never a wrong answer —
#     equivalence is bloom-independent).  Legacy states without the
#     sidecar fall back to the full log join.
#   * past _SINGLE_PROCESS_BITMAP_MAX_BYTES the bitmap is NEVER assembled
#     anywhere: the probe runs as a chunk-partitioned cogroup join against
#     the persisted chunk/delta tables (_bloom_maybe_keys_sharded), so
#     peak per-process memory is O(batch + one 64 KiB chunk) regardless of
#     m_bits — the 100 TB path the r11 verdict asked for.
# Cache entries additionally carry the state's init-time identity uuid: a
# state root deleted and re-initialized at the SAME path reuses the same
# batch dir names (and, for a similar corpus, the same m_bits), so a
# subset-of-dirs freshness check alone would serve the OLD corpus's bitmap
# — false negatives.  The identity mismatch forces a rebuild instead.
_BLOOM_CACHE: dict = {}
# small / write-once state keeps the versioned-snapshot form
# (operators/snapshots.py): per-source counts are source-cardinality-sized
# and need the summed union; the LM tables are frozen at init.
# maps the persisted table name to train_bigram_lm's dict key
_LM_TABLES = {
    "lm_unigrams": "unigrams",
    "lm_bigrams": "bigrams",
    "lm_totals": "totals",
}


def _artifact_stats(
    docs: DataFrame,
    merges: list,
    lm: dict | None,
    text_col: str = "text",
    max_docs: int = 100_000,
) -> dict:
    """How well the FROZEN artifacts fit one batch — the staleness signal
    (mirrors the ANN index's lifecycle, operators/ann_index.py, for the
    two artifacts the frozen-forever deviation covers):

      * ``bpe_tokens_per_word``: mean BPE pieces per word under the frozen
        merges.  Drifted text (new language, new domain) stops matching
        the learned merges and segments toward characters, so this rises
        toward word-length+1.  One apply_bpe pass — distinct-word encode,
        batch-scan cost.
      * ``lm_mean_nll``: mean per-doc NLL under the frozen bigram LM
        (only when the state carries LM tables).  Domain shift raises it.

    Measured on the CONTRACTED batch (pre-quality), deliberately: a
    shifted-domain batch may fail the English-tuned quality heuristics
    entirely, and the staleness gate must see the incoming distribution,
    not just its survivors.

    Bounded: both stats are MEANS, so they are estimated on a
    deterministic hash sample capped at ``max_docs`` — the init-time
    baseline over a multi-million-doc standing corpus must not cost a
    full-corpus BPE pass (increments are batch-sized and usually fit
    under the cap untouched)."""
    from exstream_implementation_spark.operators.bpe import apply_bpe

    n = docs.count()
    if n > max_docs:
        frac = max_docs / n
        docs = docs.filter(
            F.pmod(F.xxhash64("doc_id"), F.lit(1_000_000))
            < int(frac * 1_000_000)
        )
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    enc = apply_bpe(docs.select("doc_id", text_col), merges)
    agg = (
        enc.select(F.size(toks).alias("__nw"), "n_bpe")
        .agg(F.sum("__nw").alias("words"), F.sum("n_bpe").alias("pieces"))
        .first()
    )
    words = int(agg["words"] or 0)
    stats: dict = {
        "n_words": words,
        "bpe_tokens_per_word": (
            round(float(agg["pieces"]) / words, 6) if words else None
        ),
    }
    if lm is not None:
        from exstream_implementation_spark.plans.lm import score_lm_nll

        nll = (
            score_lm_nll(docs, lm, text_col=text_col)
            .agg(F.avg("lm_nll"))
            .first()[0]
        )
        stats["lm_mean_nll"] = (
            round(float(nll), 6) if nll is not None else None
        )
    return stats


def prep_state_is_stale(
    state: dict,
    tokens_per_word_tol: float = 0.25,
    lm_nll_tol: float = 1.0,
) -> dict:
    """Staleness verdict for the frozen tokenizer/LM: compares the LATEST
    increment's artifact stats against the init-time baseline.

      stale when  tokens_per_word > baseline * (1 + tokens_per_word_tol)
              or  lm_mean_nll     > baseline + lm_nll_tol   (nats)

    Returns {stale, reasons, baseline, latest}.  The retrain path is a
    full rebuild under a NEW state root (init_prep_state over the union)
    — merges/LM identity across increments is the module's contract, so
    there is deliberately no in-place retrain.  States committed before
    the gate existed report stale=False with reasons=[] (no baseline)."""
    base = state.get("artifact_baseline")
    hist = state.get("increment_artifact_stats", [])
    out = {
        "stale": False,
        "reasons": [],
        "baseline": base,
        "latest": hist[-1] if hist else None,
    }
    if not base or not hist:
        return out
    last = hist[-1]
    tw0, tw = base.get("bpe_tokens_per_word"), last.get("bpe_tokens_per_word")
    if tw0 and tw and tw > tw0 * (1.0 + tokens_per_word_tol):
        out["reasons"].append(
            f"tokenizer: {tw:.3f} BPE tokens/word vs baseline {tw0:.3f} "
            f"(> +{tokens_per_word_tol:.0%}) — frozen merges no longer "
            "fit the incoming text; rebuild state over the union"
        )
    n0, n1 = base.get("lm_mean_nll"), last.get("lm_mean_nll")
    if n0 is not None and n1 is not None and n1 > n0 + lm_nll_tol:
        out["reasons"].append(
            f"lm: mean NLL {n1:.3f} vs baseline {n0:.3f} "
            f"(> +{lm_nll_tol} nats) — frozen bigram LM is scoring a "
            "shifted domain; rebuild state over the union"
        )
    out["stale"] = bool(out["reasons"])
    return out


def _state_path(root: str) -> str:
    return os.path.join(root, _STATE_FILE)


def _append_log(df: DataFrame, root: str, name: str, dirname: str) -> str:
    """Write one batch's rows to the log — overwrite of the single batch
    directory, so a retried increment replaces its own partition."""
    df.write.mode("overwrite").parquet(os.path.join(root, name, dirname))
    return dirname


def _read_log(
    spark: SparkSession, root: str, name: str, dirs: list
) -> DataFrame:
    """Union of the COMMITTED batch directories only (orphans from crashed
    increments or compactions are never read)."""
    return spark.read.parquet(
        *[os.path.join(root, name, d) for d in dirs]
    )


def _bloom_build_chunks(
    df: DataFrame, col: str, meta: dict, root: str, dirname: str
) -> str:
    """Dense chunk-form filter over ``df[col]`` (init / compaction).

    bloom_chunks picks the physical plan by filter size: small filters
    run the per-partition-partials + OR-merge form; corpus-scale ones
    (>= 1024 chunks) hash-partition the exploded positions by chunk_id
    first, so every chunk is built exactly once at full input
    parallelism and nothing bitmap-sized ever amplifies through Python
    twice (the r11 x1000 init tax — the r11 remedy was coalescing the
    input to bound the merge shuffle, which serialized the hashing; the
    by-chunk plan removes the trade entirely)."""
    from exstream_implementation_spark.operators.bloom import bloom_chunks

    chunks = bloom_chunks(
        df, col, meta["m_bits"], meta["k_hashes"], meta["seed"]
    )
    return _append_log(chunks, root, f"{meta['name']}_bloom/chunks", dirname)


def _bloom_append_delta(
    df: DataFrame, col: str, meta: dict, root: str, dirname: str
) -> str:
    """Sparse position-delta for one batch's keys — O(batch) rows:
    (chunk_id, array<chunk-local bit position>)."""
    from exstream_implementation_spark.operators.bloom import (
        CHUNK_BITS,
        _positions,
    )

    pos = df.select(
        F.explode(
            _positions(col, meta["m_bits"], meta["k_hashes"], meta["seed"])
        ).alias("p")
    ).distinct()
    delta = pos.select(
        (F.col("p") / CHUNK_BITS).cast("int").alias("chunk_id"),
        (F.col("p") % CHUNK_BITS).cast("int").alias("lp"),
    ).groupBy("chunk_id").agg(F.collect_list("lp").alias("pos"))
    return _append_log(delta, root, f"{meta['name']}_bloom/pos", dirname)


def _bloom_rows(spark: SparkSession, state_path: str, sub: str, dirs):
    """Rows of one bloom-sidecar log, as (column → values) dicts per
    directory batch.  Local state roots read through pyarrow DIRECTLY —
    the assembly is a driver-side bitmap OR, and moving the chunk bytes
    through py4j rows costs ~10× the IO (measured as the r11 cold-
    increment spike at x1000); non-local roots fall back to the Spark
    iterator."""
    paths = [os.path.join(state_path, sub, d) for d in sorted(dirs)]
    if all(os.path.isdir(p) for p in paths):
        import pyarrow.parquet as pq

        for p in paths:
            tbl = pq.read_table(p)
            yield {c: tbl.column(c).to_pylist() for c in tbl.column_names}
    else:  # pragma: no cover — non-posix state roots
        rows = _read_log(spark, state_path, sub, sorted(dirs)).collect()
        if rows:
            cols = rows[0].__fields__
            yield {c: [r[c] for r in rows] for c in cols}


def _assemble_bloom_bits(spark: SparkSession, state_path: str, meta: dict):
    """Session-cached incremental bitmap assembly → the LIVE cached uint8
    array (callers must not mutate).  A warm writer pays only each new
    delta (O(batch)); a cold session pays one chunk-log read bounded by
    m/8 bytes plus the accrued deltas."""
    import numpy as np

    from exstream_implementation_spark.operators.bloom import (
        CHUNK_BITS,
        _CHUNK_BYTES,
    )

    name = meta["name"]
    key = (os.path.abspath(state_path), name)
    chunk_dirs, pos_dirs = set(meta["chunk_dirs"]), set(meta["pos_dirs"])
    cached = _BLOOM_CACHE.get(key)
    if (
        cached
        and cached.get("identity") == meta.get("identity")
        and cached["m_bits"] == meta["m_bits"]
        and cached["chunk_dirs"] <= chunk_dirs
        and cached["pos_dirs"] <= pos_dirs
    ):
        bits = cached["bits"]
        new_chunks = chunk_dirs - cached["chunk_dirs"]
        new_pos = pos_dirs - cached["pos_dirs"]
    else:  # cold, or the state was compacted/re-sized: rebuild
        bits = np.zeros(meta["m_bits"] // 8, dtype=np.uint8)
        new_chunks, new_pos = chunk_dirs, pos_dirs
    if new_chunks:
        for cols in _bloom_rows(
            spark, state_path, f"{name}_bloom/chunks", new_chunks
        ):
            for cid, chunk in zip(cols["chunk_id"], cols["bits"]):
                start = cid * _CHUNK_BYTES
                arr = np.frombuffer(chunk, dtype=np.uint8)
                bits[start : start + len(arr)] |= arr
    if new_pos:
        for cols in _bloom_rows(
            spark, state_path, f"{name}_bloom/pos", new_pos
        ):
            for cid, lp in zip(cols["chunk_id"], cols["pos"]):
                p = np.asarray(lp, dtype=np.int64) + cid * CHUNK_BITS
                np.bitwise_or.at(
                    bits, p >> 3, np.left_shift(1, p & 7).astype(np.uint8)
                )
    _BLOOM_CACHE[key] = {
        "identity": meta.get("identity"),
        "m_bits": meta["m_bits"],
        "chunk_dirs": chunk_dirs,
        "pos_dirs": pos_dirs,
        "bits": bits,
    }
    return bits


def _assemble_bloom(spark: SparkSession, state_path: str, meta: dict):
    """BloomFilter over the assembled bitmap, for broadcast-side probing
    (the copy means a later in-place delta OR can never race an in-flight
    lazy probe — monotone either way, but cheap insurance)."""
    from exstream_implementation_spark.operators.bloom import BloomFilter

    bits = _assemble_bloom_bits(spark, state_path, meta)
    return BloomFilter(
        bits=bits.copy(),
        m_bits=meta["m_bits"],
        k_hashes=meta["k_hashes"],
        seed=meta["seed"],
    )


def _log_members(
    spark: SparkSession,
    state_path: str,
    state: dict,
    name: str,
    keys: DataFrame,
    col: str,
) -> DataFrame:
    """DISTINCT values of ``keys[col]`` that are members of the state log
    ``name`` — exact.  With a Bloom sidecar, keys the filter proves absent
    never touch the log, and a batch with zero "maybe" keys skips the log
    scan entirely; without one (legacy state), the full log joins against
    the broadcast batch keys as before."""
    keys = keys.select(col).distinct()
    bloom = state.get("bloom")
    meta = bloom["logs"][name] if bloom else None
    if meta is not None:
        keys = _bloom_maybe_keys(spark, state_path, meta, keys, col)
        if keys.isEmpty():
            return keys  # definite-fresh batch: the log is never read
    log = _read_log(spark, state_path, name, state["logs"][name])
    return log.join(F.broadcast(keys), col).distinct()


# above this many distinct batch keys, the bloom probe runs executor-side
# against a broadcast of the bitmap instead of an Arrow fetch to the
# driver (the fetch is k positions per key)
_DRIVER_PROBE_MAX_KEYS = 2_000_000
# above this many bitmap BYTES, neither the driver array nor a broadcast
# is acceptable (a 100 TB corpus's sidecar is tens of GB of bits): the
# probe auto-routes to the chunk-partitioned join, which never assembles
# the bitmap in any single process
_SINGLE_PROCESS_BITMAP_MAX_BYTES = 256 * 1024 * 1024


def _bloom_maybe_keys(
    spark: SparkSession,
    state_path: str,
    meta: dict,
    keys: DataFrame,
    col: str,
) -> DataFrame:
    """``keys`` reduced to the rows the sidecar cannot prove absent.

    Default path: Arrow-fetch the (key, k bit positions) pairs — bounded
    by the batch — and gather against the session-cached bitmap DRIVER-
    side.  This costs O(batch) regardless of state size; the alternative
    (executor-side probe) re-broadcasts the full bitmap every increment
    because each increment's filter version differs — an O(m) per-
    increment tax that showed up as the warm-trend residual at x1000.
    Batches past _DRIVER_PROBE_MAX_KEYS distinct keys take that
    broadcast path anyway (one bitmap ship beats a giant driver fetch).

    Both single-process forms are routed AWAY from by bitmap size, not
    just key count: past _SINGLE_PROCESS_BITMAP_MAX_BYTES the probe runs
    sharded (``_bloom_maybe_keys_sharded``) and no process ever holds
    more than one 64 KiB chunk of the filter."""
    import numpy as np

    from exstream_implementation_spark.operators.bloom import (
        _positions,
        might_contain,
    )

    if meta["m_bits"] // 8 > _SINGLE_PROCESS_BITMAP_MAX_BYTES:
        return _bloom_maybe_keys_sharded(spark, state_path, meta, keys, col)
    keys = keys.persist()  # probe + verify join share one materialization
    if keys.count() > _DRIVER_PROBE_MAX_KEYS:
        flt = _assemble_bloom(spark, state_path, meta)
        maybe = (
            might_contain(keys, col, flt, "__bloom_mc")
            .filter(F.col("__bloom_mc"))
            .drop("__bloom_mc")
            # eager localCheckpoint, not persist: the blocks are
            # ContextCleaner-managed (released when the frame is GC'd)
            # instead of pinned until an unpersist nobody owns — callers
            # use the result lazily and never see the probe re-run
            .localCheckpoint(eager=True)
        )
        keys.unpersist()
        return maybe
    bits = _assemble_bloom_bits(spark, state_path, meta)
    tbl = keys.select(
        F.col(col).alias("__k"),
        _positions(col, meta["m_bits"], meta["k_hashes"], meta["seed"])
        .alias("__pos"),
    ).toArrow()
    n = tbl.num_rows
    if n == 0:
        # the empty probe is consumed at most once downstream — release
        # the scan before handing it back
        keys.unpersist()
        return spark.createDataFrame([], schema=keys.schema)
    pos = np.asarray(
        tbl.column("__pos").combine_chunks().flatten(), dtype=np.int64
    )
    mat = pos.reshape(n, meta["k_hashes"])
    hit = ((bits[mat >> 3] >> (mat & 7).astype(np.uint8)) & 1).all(axis=1)
    vals = tbl.column("__k").to_pylist()
    maybe = [(vals[i],) for i in np.nonzero(hit)[0]]
    # the Arrow fetch fully consumed the probe input; the local maybe-list
    # replaces it downstream, so don't leave the scan pinned
    keys.unpersist()
    return spark.createDataFrame(maybe, schema=keys.schema)


def _bloom_chunk_frame(
    spark: SparkSession, state_path: str, meta: dict
) -> DataFrame | None:
    """The sidecar's persisted state as ONE distributed frame
    (chunk_id, bits binary | null, pos array<int> | null) — dense chunk
    rows from init/compaction unioned with the sparse per-increment
    deltas.  None when the sidecar has no committed directories yet."""
    name = meta["name"]
    sides = []
    if meta["chunk_dirs"]:
        sides.append(
            _read_log(
                spark, state_path, f"{name}_bloom/chunks",
                sorted(meta["chunk_dirs"]),
            ).select(
                "chunk_id", "bits",
                F.lit(None).cast("array<int>").alias("pos"),
            )
        )
    if meta["pos_dirs"]:
        sides.append(
            _read_log(
                spark, state_path, f"{name}_bloom/pos",
                sorted(meta["pos_dirs"]),
            ).select(
                "chunk_id", F.lit(None).cast("binary").alias("bits"), "pos"
            )
        )
    if not sides:
        return None
    out = sides[0]
    for s in sides[1:]:
        out = out.unionByName(s)
    return out


def _merge_chunk_group(chunk_pdf) -> "np.ndarray":  # noqa: F821
    """OR one chunk_id's dense rows and sparse deltas into a 64 KiB
    uint8 array — the per-task unit of the sharded probe and the
    distributed fill census (one chunk in memory at a time)."""
    import numpy as np

    from exstream_implementation_spark.operators.bloom import (
        CHUNK_BITS,
        _CHUNK_BYTES,
    )

    chunk = np.zeros(_CHUNK_BYTES, dtype=np.uint8)
    for b in chunk_pdf["bits"].dropna():
        chunk |= np.frombuffer(b, dtype=np.uint8)
    sparse = chunk_pdf["pos"].dropna()
    if len(sparse):
        bl = np.zeros(CHUNK_BITS, dtype=bool)
        for arr in sparse:
            bl[np.asarray(arr, dtype=np.int64)] = True
        chunk |= np.packbits(bl, bitorder="little")
    return chunk


def _bloom_maybe_keys_sharded(
    spark: SparkSession,
    state_path: str,
    meta: dict,
    keys: DataFrame,
    col: str,
) -> DataFrame:
    """Chunk-partitioned probe — the no-single-process-bitmap path.

    Probe side: each key explodes to its k (chunk_id, chunk-local bit)
    rows (JVM codegen, O(k·batch) rows).  Filter side: the persisted
    chunk rows + sparse deltas, grouped by chunk_id.  A cogrouped
    applyInPandas ORs ONE chunk at a time and tests that chunk's probe
    positions against it, so peak per-task memory is O(that chunk's probe
    rows + 64 KiB) — independent of m_bits.  A key is "maybe" iff all k
    of its position rows hit; positions that land in chunks the state
    never wrote are definite misses (those rows are simply never
    emitted, so the per-key hit sum stays < k).  Exactness is inherited:
    the output feeds the same exact verify join as every other probe
    form."""
    import numpy as np
    import pandas as pd

    from exstream_implementation_spark.operators.bloom import (
        CHUNK_BITS,
        _positions,
    )

    k_hashes = meta["k_hashes"]
    # the probe lineage is read twice (position rows + the chunk-pruning
    # distinct below) — pin the batch scan so the second pass is a cache
    # read, not a recompute of the batch's distinct
    keys = keys.persist()
    probe = keys.select(
        F.col(col).alias("__k"),
        F.explode(
            _positions(col, meta["m_bits"], k_hashes, meta["seed"])
        ).alias("__p"),
    ).select(
        "__k",
        (F.col("__p") / CHUNK_BITS).cast("int").alias("chunk_id"),
        (F.col("__p") % CHUNK_BITS).cast("int").alias("lp"),
    )
    bitmap = _bloom_chunk_frame(spark, state_path, meta)
    if bitmap is None:  # empty filter: nothing can be a member
        out = keys.limit(0)
        keys.unpersist()
        return out
    # prune the filter side to the chunks this batch actually probes —
    # a small batch against a corpus-scale sidecar must not shuffle the
    # whole m/8-byte chunk table.  The distinct probed chunk-id set is
    # bounded by min(k·batch, m/CHUNK_BITS) ints (m/CHUNK_BITS is <1M
    # even at the 100 TB design point), so it always broadcasts; the
    # semi-join drops unprobed chunk rows map-side, BEFORE the cogroup
    # exchange.  Semantics are untouched: an unprobed chunk contributes
    # no hit rows either way.
    bitmap = bitmap.join(
        F.broadcast(probe.select("chunk_id").distinct()),
        "chunk_id",
        "left_semi",
    )

    def count_hits(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:  # filter-side-only chunk: no keys to answer for
            return pd.DataFrame(
                {"__k": left["__k"], "__hit": np.zeros(0, dtype="int32")}
            )
        chunk = _merge_chunk_group(right)
        lp = left["lp"].to_numpy()
        hit = ((chunk[lp >> 3] >> (lp & 7).astype(np.uint8)) & 1).astype(
            "int32"
        )
        return pd.DataFrame({"__k": left["__k"], "__hit": hit})

    key_type = keys.schema[0].dataType.simpleString()
    hits = (
        probe.groupBy("chunk_id")
        .cogroup(bitmap.groupBy("chunk_id"))
        .applyInPandas(count_hits, schema=f"__k {key_type}, __hit int")
    )
    maybe = (
        hits.groupBy("__k")
        .agg(F.sum("__hit").alias("__n"))
        .filter(F.col("__n") == k_hashes)
        .select(F.col("__k").alias(col))
    )
    # one materialization shared by the isEmpty gate and the verify join;
    # ContextCleaner-managed, never pinned (see the broadcast branch note)
    maybe = maybe.localCheckpoint(eager=True)
    # the eager checkpoint fully consumed the probe input — release it
    keys.unpersist()
    return maybe


# byte → set-bit-count lookup, for bitmap fill censuses
_POPCOUNT8 = None


def _popcount(arr) -> int:
    import numpy as np

    global _POPCOUNT8
    if _POPCOUNT8 is None:
        _POPCOUNT8 = np.array(
            [bin(i).count("1") for i in range(256)], dtype=np.uint32
        )
    return int(_POPCOUNT8[arr].sum())


def _bloom_fill_stats(
    spark: SparkSession, state_path: str, meta: dict
) -> dict:
    """Realized health of one sidecar: bitmap fill ratio and the expected
    false-positive rate at that fill (fill^k — the textbook estimate, and
    what the maybe→verify hit rate converges to on non-member traffic).
    Small bitmaps read the session-cached assembly (one delta OR when
    warm); past the single-process ceiling the census is a distributed
    per-chunk popcount — O(m/8) scanned, one chunk per task in memory."""
    import pandas as pd

    if meta["m_bits"] // 8 <= _SINGLE_PROCESS_BITMAP_MAX_BYTES:
        bits = _assemble_bloom_bits(spark, state_path, meta)
        set_bits = _popcount(bits)
    else:
        frame = _bloom_chunk_frame(spark, state_path, meta)
        if frame is None:
            set_bits = 0
        else:

            def chunk_pop(pdf: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame({"n": [_popcount(_merge_chunk_group(pdf))]})

            set_bits = int(
                frame.groupBy("chunk_id")
                .applyInPandas(chunk_pop, schema="n long")
                .agg(F.sum("n"))
                .first()[0]
                or 0
            )
    fill = set_bits / meta["m_bits"]
    return {
        "fill_ratio": round(fill, 6),
        "fpp_estimate": round(fill ** meta["k_hashes"], 9),
    }


def bloom_needs_compaction(state: dict, factor: float = 5.0) -> dict:
    """The sidecar re-size gate: logs whose estimated fpp has degraded
    past ``factor`` × the configured target.  Past init capacity the
    filter stays CORRECT (the exact verify join absorbs every false
    positive) but each increment pays more verify traffic; the remedy is
    ``compact_prep_state``, which rebuilds the filters re-sized to the
    then-current log counts.  Returns {log name: {fpp_estimate,
    target_fpp, fill_ratio}} — empty means healthy.  Stats are recorded
    per increment (prepare_increment) and at init/compaction."""
    out: dict = {}
    bloom = state.get("bloom")
    if not bloom:
        return out
    for name, meta in bloom["logs"].items():
        est = meta.get("fpp_estimate")
        if est is not None and est > bloom["fpp"] * factor:
            out[name] = {
                "fpp_estimate": est,
                "target_fpp": bloom["fpp"],
                "fill_ratio": meta.get("fill_ratio"),
            }
    return out


def _write_state(root: str, state: dict) -> None:
    tmp = os.path.join(root, f".{_STATE_FILE}.tmp")
    os.makedirs(root, exist_ok=True)
    with open(tmp, "w") as fh:
        json.dump(state, fh, indent=1, sort_keys=True)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, _state_path(root))  # the atomic commit


def read_state(root: str) -> dict:
    p = _state_path(root)
    if not os.path.exists(p):
        raise FileNotFoundError(
            f"no committed prep state under {root} — run init_prep_state"
        )
    with open(p) as fh:
        state = json.load(fh)
    if "logs" not in state:
        # fail with a migration message, not a KeyError three stages in
        raise ValueError(
            f"prep state under {root} was committed by an older, "
            "incompatible layout (no membership logs); rebuild it with "
            "init_prep_state over the full corpus"
        )
    return state


def _benchmark_digest(benchmark: DataFrame) -> dict:
    """Order-independent identity of the decontamination benchmark: the
    same benchmark must be supplied to every increment, or batches stop
    being comparable — a digest mismatch fails loudly instead.  Sum of
    per-row text hashes in decimal (associative, overflow-safe)."""
    row = benchmark.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.xxhash64("text").cast("decimal(38,0)")).alias("hs"),
    ).first()
    return {"rows": row["rows"], "hash_sum": str(row["hs"])}


def _cfg_to_json(cfg: CorpusPrepConfig) -> dict:
    d = dataclasses.asdict(cfg)
    # non-serializable / per-call inputs: the model and contract checks
    # are re-supplied to each prepare_increment call
    d.pop("quality_model", None)
    d.pop("contract_checks", None)
    return d


def _cfg_from_json(
    d: dict, quality_model=None, contract_checks=None
) -> CorpusPrepConfig:
    kw = dict(d)
    if kw.get("mix_fractions") is not None:
        kw["mix_fractions"] = dict(kw["mix_fractions"])
    if kw.get("split_weights") is not None:
        kw["split_weights"] = dict(kw["split_weights"])
    return CorpusPrepConfig(
        **kw,
        quality_model=quality_model,
        contract_checks=contract_checks,
    )


def _max_id(docs: DataFrame, id_col: str = "doc_id"):
    r = docs.agg(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
    ).first()
    return r["lo"], r["hi"]


def init_prep_state(
    docs: DataFrame,
    state_path: str,
    benchmark: DataFrame | None = None,
    cfg: CorpusPrepConfig = CorpusPrepConfig(),
    out_path: str | None = None,
    counts: bool = False,
    membership_bloom_fpp: float | None = 0.01,
    membership_bloom_capacity_factor: float = 2.0,
) -> dict:
    """Full ``prepare_corpus`` over the initial corpus, then persist the
    pipeline state the increments join against.  Shards (when
    ``out_path``) land under ``out_path/increment=0``.  Returns the stage
    dict with ``state`` added.

    ``membership_bloom_fpp`` sizes the per-log Bloom sidecars (see the
    module-level note at ``_BLOOM_CACHE``) at
    ``capacity = n_init × membership_bloom_capacity_factor`` items; the
    realized fpp degrades gracefully past capacity (correctness is
    bloom-independent — the exact verify join catches every false
    positive) and ``compact_prep_state`` re-sizes the filters to the
    then-current log counts.  ``None`` disables the sidecars (increments
    fall back to full log-stream membership joins)."""
    if os.path.exists(_state_path(state_path)):
        raise ValueError(
            f"prep state already committed under {state_path}; "
            "increments must go through prepare_increment"
        )
    # eager empty-corpus guard (mirrors prepare_increment's "empty batch"
    # check): committing max_doc_id=null would make every later
    # prepare_increment fail with an opaque TypeError on the id fence
    min_doc_id, max_doc_id = _max_id(docs)
    if max_doc_id is None:
        raise ValueError(
            "init_prep_state: empty initial corpus (or all-NULL doc_ids) — "
            "the tokenizer/LM/state must be trained on a standing corpus; "
            "supply a non-empty frame"
        )
    inc_out = f"{out_path}/increment=0" if out_path is not None else None
    stages = prepare_corpus(
        docs, benchmark, cfg, out_path=inc_out, counts=counts
    )

    # ---- derive state from the run's own stage frames -------------------
    # persist the two stage frames the derivations re-scan (plan-matched
    # by CacheManager, so the capped chain reuses them too; LRU-evictable)
    stages["quality"] = stages["quality"].persist()
    stages["deduped"] = stages["deduped"].persist()
    # hashes: distinct content hashes of every QUALITY-surviving doc — the
    # exact-dedup stage of a from-scratch union run groups by this hash, so
    # membership (not the winner id) is what future batches need
    hashes = (
        stages["quality"].select(_norm_hash("text").alias("__ch")).distinct()
    )
    # anchors: the substring stage's witness set over the DEDUPED stage
    # texts (pre-despan — exactly what a union run would explode); with
    # mod sampling both copies of a span select identical witnesses, so
    # membership against this set is sufficient for keep-first detection
    anchors = (
        gram_anchors(
            stages["deduped"],
            k=cfg.substring_k,
            mod=cfg.substring_mod,
        )
        .select("anchor")
        .distinct()
    )
    src_counts = (
        stages["capped"]
        .groupBy(cfg.source_col)
        .agg(F.count(F.lit(1)).alias("n_admitted"))
    )

    logs = {
        "hashes": [_append_log(hashes, state_path, "hashes", "batch=0")],
        "anchors": [_append_log(anchors, state_path, "anchors", "batch=0")],
    }
    bloom_state = None
    if membership_bloom_fpp is not None:
        import uuid

        from exstream_implementation_spark.operators.bloom import (
            bloom_params,
        )

        spark = docs.sparkSession
        # identity: distinguishes THIS state's filters from any earlier
        # state that lived at the same path (same dir names, often the
        # same m_bits) — the session cache keys freshness on it
        identity = uuid.uuid4().hex
        bloom_state = {
            "fpp": membership_bloom_fpp,
            "capacity_factor": membership_bloom_capacity_factor,
            "identity": identity,
            "logs": {},
        }
        import time as _time

        for lname, col in (("hashes", "__ch"), ("anchors", "anchor")):
            # build from the batch=0 log just WRITTEN, not the lineage
            # that produced it: the anchors lineage is a corpus-scale
            # explode+distinct, and re-running it for the chunk build
            # would double the most expensive init stage; the log dir is
            # a cheap parquet scan of the identical rows (footer-cheap
            # count, one data pass for the chunks)
            _t0 = _time.monotonic()
            written = _read_log(spark, state_path, lname, ["batch=0"])
            capacity = max(
                1000, int(written.count() * membership_bloom_capacity_factor)
            )
            # cost-balanced: the sidecar's dominant cost is POSITIONS
            # (k rows/key through the corpus-scale build and every
            # probe), not bits — k=4 at +10% bits for -43% positions
            # keeps the same ~1% fpp at capacity (the r12 init-surcharge
            # lever; see bloom_params)
            m_bits, k_hashes = bloom_params(
                capacity, membership_bloom_fpp, cost_balanced=True
            )
            meta = {
                "name": lname,
                "m_bits": m_bits,
                "k_hashes": k_hashes,
                "seed": 42,
                "capacity": capacity,
                "identity": identity,
                "chunk_dirs": [],
                "pos_dirs": [],
            }
            _t1 = _time.monotonic()
            meta["chunk_dirs"] = [
                _bloom_build_chunks(written, col, meta, state_path, "batch=0")
            ]
            _t2 = _time.monotonic()
            # baseline health census (also warms the session cache the
            # first increment's probe reads)
            meta.update(_bloom_fill_stats(spark, state_path, meta))
            # stage walltimes, persisted with the state for scale-smoke
            # adjudication (count/build/census are the three init costs
            # the sidecar adds; see docs/SCALE_SMOKE_R12_BLOOM.json)
            meta["t_count_s"] = round(_t1 - _t0, 2)
            meta["t_build_s"] = round(_t2 - _t1, 2)
            meta["t_census_s"] = round(_time.monotonic() - _t2, 2)
            bloom_state["logs"][lname] = meta
    versions = {
        "source_counts": publish_snapshot(
            src_counts, os.path.join(state_path, "source_counts")
        ),
    }
    lm = None
    if cfg.max_lm_nll is not None:
        # freeze the LM the initial run gated with: retrain the identical
        # tables (train_bigram_lm is deterministic in its input) on the
        # same stage prepare_corpus trained on, and persist them
        from exstream_implementation_spark.plans.lm import train_bigram_lm

        lm = train_bigram_lm(stages["decontaminated"])
        for table, key in _LM_TABLES.items():
            versions[table] = publish_snapshot(
                lm[key], os.path.join(state_path, table)
            )

    save_merges(
        stages["merges"], os.path.join(state_path, "merges.json")
    )

    # staleness baseline: how the just-frozen artifacts fit the corpus
    # they were trained on — every increment's stats compare against this
    artifact_baseline = _artifact_stats(
        stages.get("contracted", docs), stages["merges"], lm
    )

    mix_policy = stages.get("mix_policy")
    state = {
        # committed per-batch input id ranges — the streaming writer's
        # replay fence needs them to tell "this exact batch was already
        # processed" apart from "new data arrived out of id order"
        "id_ranges": [[min_doc_id, max_doc_id]],
        "config": _cfg_to_json(cfg),
        "has_quality_model": cfg.quality_model is not None,
        "has_contract_checks": cfg.contract_checks is not None,
        # τ-derived fractions freeze here; explicit fractions pass through
        "mix_fractions": (
            mix_policy["fractions"]
            if mix_policy is not None
            else cfg.mix_fractions
        ),
        "benchmark_digest": (
            _benchmark_digest(benchmark) if benchmark is not None else None
        ),
        "max_doc_id": max_doc_id,
        "n_increments": 1,
        "versions": versions,
        "logs": logs,
        "bloom": bloom_state,
        "artifact_baseline": artifact_baseline,
        "increment_artifact_stats": [],
    }
    _write_state(state_path, state)
    stages["state"] = state
    return stages


def prepare_increment(
    new_docs: DataFrame,
    state_path: str,
    benchmark: DataFrame | None = None,
    quality_model=None,
    contract_checks: tuple | None = None,
    out_path: str | None = None,
    counts: bool = False,
    datasheet: bool = False,
) -> dict:
    """Run the prep pipeline over ONE new batch against committed state.

    ``new_docs`` doc_ids must all exceed every id previously seen (checked
    eagerly) — the monotonicity that makes every keep-first convention
    resolve to "the earlier batch wins" and the equivalence contract hold.
    ``benchmark`` / ``quality_model`` / ``contract_checks`` are re-supplied
    per call (frames and models don't serialize into state); the benchmark
    is digest-checked against the one the state was built with.

    Returns the stage dict (same keys as ``prepare_corpus``) plus
    ``state`` (the NEWLY committed state) and ``increment`` (this batch's
    index, also its ``out_path/increment=i`` directory).

    Scale contract: state logs are only ever STREAMED (one scan per
    membership stage, zero state-side exchanges — the batch side
    broadcasts).  That assumes the batch's hash/anchor projections fit a
    broadcast (a few MB per 5k docs); for batches beyond broadcast size,
    split the input and run several increments — each is atomic anyway.
    """
    spark = new_docs.sparkSession
    state = read_state(state_path)
    cfg = _cfg_from_json(
        state["config"],
        quality_model=quality_model,
        contract_checks=contract_checks,
    )
    # both-direction guards: a filter chain that differs from the one the
    # state was built with silently breaks batch comparability (same class
    # as the benchmark digest check below)
    if state["has_quality_model"] != (quality_model is not None):
        raise ValueError(
            "state was built WITH a quality_model; pass the same model to "
            "prepare_increment"
            if state["has_quality_model"]
            else "state was built WITHOUT a quality_model; a model applied "
            "only to later batches would make batches incomparable — "
            "rebuild state to add it"
        )
    if state["has_contract_checks"] != (contract_checks is not None):
        raise ValueError(
            "state was built WITH contract_checks; pass the same checks to "
            "prepare_increment"
            if state["has_contract_checks"]
            else "state was built WITHOUT contract_checks; checks applied "
            "only to later batches would make batches incomparable — "
            "rebuild state to add them"
        )
    if state["benchmark_digest"] is not None:
        if benchmark is None:
            raise ValueError(
                "state was built with a decontamination benchmark; the "
                "same benchmark frame must be supplied to every increment"
            )
        got = _benchmark_digest(benchmark)
        if got != state["benchmark_digest"]:
            raise ValueError(
                "benchmark digest mismatch: increments must decontaminate "
                f"against the state's benchmark (state="
                f"{state['benchmark_digest']}, got={got})"
            )
    elif benchmark is not None:
        raise ValueError(
            "state was built WITHOUT a benchmark; rebuild state to add "
            "decontamination (a benchmark applied only to later batches "
            "would make batches incomparable)"
        )

    lo, hi = _max_id(new_docs)
    if lo is None:
        raise ValueError("prepare_increment: empty batch")
    if lo <= state["max_doc_id"]:
        raise ValueError(
            f"batch doc_ids must exceed all previously seen ids "
            f"(min new id {lo} <= state max {state['max_doc_id']}); "
            "monotone ids are what make keep-first conventions resolve "
            "to the earlier batch"
        )

    def _tbl(name: str) -> DataFrame:
        if name in _LOGS:
            return _read_log(spark, state_path, name, state["logs"][name])
        return read_version(
            spark,
            os.path.join(state_path, name),
            state["versions"][name],
        )

    stages: dict = {}
    cur = new_docs
    if contract_checks is not None:
        from exstream_implementation_spark.operators.expectations import (
            quarantine,
        )

        cur, bad = quarantine(cur, list(contract_checks))
        stages["contract_quarantine"] = bad
    stages["contracted"] = cur

    cur = quality_filter(cur, cfg)
    stages["quality"] = cur
    # the state update below needs this batch's quality-survivor hashes;
    # persist so the (hashes, dedup, downstream) consumers share one
    # materialization of the quality scan (LRU-evictable)
    cur = cur.persist()
    new_hashes = cur.select(_norm_hash("text").alias("__ch")).distinct()

    # ---- exact dedup: within batch, then against all prior batches ------
    # membership shape (both dedup stages, via _log_members): batch keys
    # probe the persisted Bloom sidecar first — keys it proves absent
    # never touch the log, and an all-fresh batch skips the log scan
    # entirely; the "maybe" keys (fpp-bounded) verify against the state
    # log STREAMED once against their broadcast (inner join, no state
    # exchange).  Legacy states without the sidecar stream the log against
    # the full broadcast batch — the r10 shape, whose per-increment cost
    # grew linearly in state (§7c).  Either way the batch then resolves
    # against the batch-sized member set with a broadcast anti-join; the
    # naive batch.join(state, 'left_semi'/'left_anti') form shuffles the
    # whole state log twice per increment — measured dominant at 300x.
    cur = exact_dedup(cur).withColumn("__ch", _norm_hash("text"))
    dup_ch = _log_members(
        spark, state_path, state, "hashes", cur.select("__ch"), "__ch"
    )
    cur = cur.join(F.broadcast(dup_ch), "__ch", "left_anti").drop("__ch")
    stages["deduped"] = cur
    cur = cur.persist()  # anchors + despan + state update share this scan

    # ---- substring dedup: spans duplicated against prior batches OR
    # earlier within this batch (keep-globally-first) ----------------------
    a_new = gram_anchors(
        cur, k=cfg.substring_k, mod=cfg.substring_mod
    ).persist()  # hit-join + fresh anti + state append share it
    hit_anchors = _log_members(
        spark, state_path, state, "anchors", a_new, "anchor"
    )
    old_hit = (
        a_new.join(F.broadcast(hit_anchors), "anchor")
        .select("doc_id", "pos")
        .distinct()  # cross-batch duplicate anchors collapse batch-side
        # persist: old_hit is batch-sized but its lineage (via
        # hit_anchors) scans the corpus-sized anchors log, and it feeds
        # BOTH the fresh anti-join and dup_pos — unpersisted, every
        # downstream materialization (and each counts=True stage count)
        # would rescan the log
        .persist()
    )
    fresh = a_new.join(
        F.broadcast(old_hit), ["doc_id", "pos"], "left_anti"
    )
    in_batch = duplicated_positions(fresh, "doc_id", policy="keep_first")
    dup_pos = old_hit.unionByName(in_batch)
    spans = spans_from_positions(dup_pos, cfg.substring_k)
    cur = remove_spans(cur, spans).drop("n_removed_chars")
    stages["despanned"] = cur

    if benchmark is not None:
        cur = drop_contaminated(
            cur,
            benchmark,
            cfg.decontam_max_overlap,
            bloom_fpp=cfg.decontam_bloom_fpp,
        )
    stages["decontaminated"] = cur

    if cfg.max_lm_nll is not None:
        from exstream_implementation_spark.plans.lm import score_lm_nll

        lm = {key: _tbl(table) for table, key in _LM_TABLES.items()}
        cur = (
            score_lm_nll(cur, lm)
            .filter(F.col("lm_nll") <= cfg.max_lm_nll)
            .drop("lm_nll")
        )
    stages["lm_filtered"] = cur

    if quality_model is not None:
        from exstream_implementation_spark.operators.logreg import (
            doc_quality_features,
            logreg_score_expr,
        )

        cur = (
            doc_quality_features(cur)
            .filter(logreg_score_expr(quality_model) >= cfg.min_p_good)
            .drop("features")
        )
    stages["clf_filtered"] = cur

    if cfg.min_compress_ratio is not None:
        from exstream_implementation_spark.operators.textstats import (
            compression_ratio,
        )

        cur = (
            compression_ratio(cur)
            .filter(
                F.col("compress_ratio").isNull()
                | (F.col("compress_ratio") >= cfg.min_compress_ratio)
            )
            .drop("compress_ratio")
        )
    stages["compress_filtered"] = cur

    if cfg.max_per_source is not None:
        from exstream_implementation_spark.plans.urls import cap_per_group

        cur = cur.persist()  # cap reads its input twice (corpus_prep note)
        # remaining quota per source = cap − already admitted; sources the
        # state has never seen keep the full default quota
        quotas = _tbl("source_counts").select(
            F.col(cfg.source_col),
            F.greatest(
                F.lit(cfg.max_per_source) - F.col("n_admitted"), F.lit(0)
            ).alias("quota"),
        )
        if cfg.cap_weight_col is not None:
            from exstream_implementation_spark.plans.dedup import (
                es_sampling_key,
            )

            # weighted top-up: order the remaining-quota cap by the SAME
            # ES key sample_weighted_k uses (factored there), with the
            # same NULL/NaN/non-positive weight exclusions
            w_dbl = F.col(cfg.cap_weight_col).cast("double")
            cur = (
                cur.filter(
                    w_dbl.isNotNull() & ~F.isnan(w_dbl) & (w_dbl > 0)
                )
                .withColumn(
                    "__es",
                    es_sampling_key(
                        "doc_id", cfg.cap_weight_col, cfg.seed
                    ),
                )
            )
            cur = cap_per_group(
                cur,
                [cfg.source_col],
                cfg.max_per_source,
                order_col="__es",
                id_col="doc_id",
                quotas=quotas,
            ).drop("__es")
        else:
            cur = cap_per_group(
                cur,
                [cfg.source_col],
                cfg.max_per_source,
                id_col="doc_id",
                quotas=quotas,
            )
    stages["capped"] = cur

    if state["mix_fractions"] is not None:
        from exstream_implementation_spark.plans.dedup import sample_mix

        cur = sample_mix(
            cur,
            state["mix_fractions"],
            key=cfg.source_col,
            salt=cfg.seed + 101,
        )
    stages["mixed"] = cur
    cur = cur.persist()  # state update + tokenize share the survivor set

    merges = load_merges(os.path.join(state_path, "merges.json"))
    stages["merges"] = merges
    tokenized = apply_bpe(cur, merges)
    stages["tokenized"] = tokenized

    chunks = chunk_tokens(tokenized, cfg.chunk_len)
    stages["chunks"] = chunks
    assignment, sequences = pack_and_sequence(chunks, cfg)
    stages["assignment"] = assignment
    stages["sequences"] = sequences

    increment = state["n_increments"]
    if out_path is not None:
        export_sequences(
            sequences, cfg, f"{out_path}/increment={increment}"
        )
        stages["out_path"] = f"{out_path}/increment={increment}"

    if counts:
        stages["stage_counts"] = {
            name: stages[name].count()
            for name in (
                "contracted",
                "quality",
                "deduped",
                "despanned",
                "decontaminated",
                "lm_filtered",
                "clf_filtered",
                "compress_filtered",
                "capped",
                "mixed",
                "tokenized",
                "chunks",
                "sequences",
            )
        }

    if out_path is not None:
        # per-increment provenance next to the shards — the same record
        # prepare_corpus writes for increment 0 (which exports through it)
        manifest = {
            "increment": increment,
            "config": state["config"],
            "has_quality_model": state["has_quality_model"],
            "bpe_merges": [list(m) for m in merges],
            "splits": (
                list(cfg.split_weights) if cfg.split_weights else None
            ),
            "mix_fractions": state["mix_fractions"],
        }
        if counts:
            manifest["stage_counts"] = stages["stage_counts"]
        inc_dir = f"{out_path}/increment={increment}"
        tmp = os.path.join(inc_dir, ".manifest.json.tmp")
        os.makedirs(inc_dir, exist_ok=True)
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(inc_dir, "_MANIFEST.json"))

    if datasheet:
        # opt-in per-increment datasheet of this batch's survivors —
        # mirrors prepare_corpus(datasheet=True).  Computed regardless of
        # out_path (callers may want only the in-memory markdown); the
        # file write needs an export directory to land next to.
        from exstream_implementation_spark.datasheet import (
            corpus_datasheet,
            datasheet_markdown,
        )

        md = datasheet_markdown(
            corpus_datasheet(
                stages["mixed"], source_col=cfg.source_col, cfg=cfg
            ),
            title=f"Corpus datasheet (increment {increment} survivors)",
        )
        stages["datasheet_markdown"] = md
        if out_path is not None:
            inc_dir = f"{out_path}/increment={increment}"
            tmp = os.path.join(inc_dir, ".datasheet.md.tmp")
            with open(tmp, "w") as fh:
                fh.write(md)
            os.replace(tmp, os.path.join(inc_dir, "_DATASHEET.md"))

    # ---- publish the next state (data first, pointer file last) ---------
    # logs: ONLY this batch's rows — O(batch) writes (a_new is the same
    # anchor frame the despan matching used, over the cached deduped scan)
    logs = {name: list(dirs) for name, dirs in state["logs"].items()}
    logs["hashes"].append(
        _append_log(
            new_hashes, state_path, "hashes", f"batch={increment}"
        )
    )
    logs["anchors"].append(
        _append_log(
            a_new.select("anchor").distinct(),
            state_path,
            "anchors",
            f"batch={increment}",
        )
    )
    # Bloom sidecar deltas: the SAME rows just appended to the main logs,
    # as O(batch) sparse position rows — the filter stays the exact union
    # of the logs, so no-false-negatives is preserved by construction
    bloom_state = state.get("bloom")
    if bloom_state is not None:
        bloom_state = json.loads(json.dumps(bloom_state))  # deep copy
        for lname, frame, col in (
            ("hashes", new_hashes, "__ch"),
            ("anchors", a_new.select("anchor").distinct(), "anchor"),
        ):
            meta = bloom_state["logs"][lname]
            meta["pos_dirs"].append(
                _bloom_append_delta(
                    frame, col, meta, state_path, f"batch={increment}"
                )
            )
            # per-increment health census: warm-cache delta OR on the
            # driver path, distributed per-chunk popcount past the
            # single-process ceiling — either way bounded by m/8
            meta.update(_bloom_fill_stats(spark, state_path, meta))
        # surface the re-size gate with the stage dict so an operator
        # watching increments sees degradation without re-reading state
        stages["bloom_health"] = bloom_needs_compaction(
            {**state, "bloom": bloom_state}
        )
    versions = dict(state["versions"])
    new_counts = (
        stages["capped"]
        .groupBy(cfg.source_col)
        .agg(F.count(F.lit(1)).alias("n_admitted"))
    )
    versions["source_counts"] = publish_snapshot(
        _tbl("source_counts")
        .unionByName(new_counts)
        .groupBy(cfg.source_col)
        .agg(F.sum("n_admitted").alias("n_admitted")),
        os.path.join(state_path, "source_counts"),
    )
    # staleness stats: frozen-artifact fit of THIS batch (one batch scan;
    # pre-gate states have no baseline and simply skip the comparison)
    lm_frames = (
        {key: _tbl(table) for table, key in _LM_TABLES.items()}
        if cfg.max_lm_nll is not None
        else None
    )
    batch_stats = _artifact_stats(stages["contracted"], merges, lm_frames)
    new_state = {
        **state,
        "max_doc_id": hi,
        "n_increments": increment + 1,
        "versions": versions,
        "logs": logs,
        "bloom": bloom_state,
        "id_ranges": state.get("id_ranges", []) + [[lo, hi]],
        "increment_artifact_stats": (
            state.get("increment_artifact_stats", []) + [batch_stats]
        ),
    }
    # single-writer fence: the read-check-then-commit protocol assumes one
    # writer per state_path.  Re-read at commit time and fail LOUDLY if a
    # concurrent increment committed in between — a silent last-write-wins
    # here would drop the other increment's log/range entries from state
    # while its parquet logs stay on disk (orphaned, never read again).
    committed = read_state(state_path)
    if committed["n_increments"] != state["n_increments"]:
        raise RuntimeError(
            f"concurrent prep-state writer detected under {state_path}: "
            f"state advanced from n_increments={state['n_increments']} to "
            f"{committed['n_increments']} during this increment.  The "
            "state protocol is single-writer; serialize increments (one "
            "stream/process per state_path) and re-run this batch."
        )
    _write_state(state_path, new_state)
    stages["state"] = new_state
    stages["increment"] = increment
    return stages


def incremental_prep_writer(
    state_path: str,
    out_path: str | None = None,
    benchmark: DataFrame | None = None,
    quality_model=None,
    contract_checks: tuple | None = None,
):
    """foreachBatch sink driving ``prepare_increment`` from Structured
    Streaming — raw document stream in, curated per-increment shard trees
    out, EXACTLY-ONCE under foreachBatch's at-least-once redelivery.

    SINGLE-WRITER: exactly one query/process may drive a given
    ``state_path``.  The read-check-then-commit fence assumes it, and
    ``prepare_increment`` re-checks at commit time — two writers racing
    one state root fail loudly (RuntimeError) rather than silently
    dropping an increment's log/range entries.

    The redelivery fence is CONTENT-based, riding the module's monotone-id
    contract rather than microbatch ids (which restart at 0 on checkpoint
    loss and would silently skip genuinely new data):

      batch [min, max] == a COMMITTED increment's input range → the batch
          is a replay of that increment: skip it (only an exact range
          match skips — "some id <= committed max" alone could be new
          data that arrived out of id order, and silently dropping it
          would be data loss);
      any batch id <= committed max_doc_id, without an exact range match
          → out-of-order or fused-with-replay data: fail loudly — the
          monotone-id contract is broken and neither skipping nor
          processing is safe;
      otherwise → a new batch; process it.  A crash anywhere before the
          increment's atomic state commit leaves no trace (shard and log
          writes are overwrite-idempotent), so the retry re-runs cleanly.

    Empty microbatches are skipped; a non-empty batch whose ids are all
    NULL fails loudly (it would otherwise masquerade as empty).  Requires
    a state already committed by ``init_prep_state`` (the tokenizer must
    be trained on a standing corpus before a stream can be encoded
    against it).

    Usage::

        q = (docs_stream.writeStream
             .foreachBatch(incremental_prep_writer(state, out))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
    """

    def _admit(batch_df: DataFrame, batch_id: int) -> None:
        state = read_state(state_path)  # also rejects pre-log layouts
        lo, hi = _max_id(batch_df)
        if lo is None:
            if batch_df.limit(1).count() > 0:
                raise ValueError(
                    f"stream batch {batch_id} has rows but only NULL "
                    "doc_ids — refusing to classify it as empty"
                )
            return  # empty microbatch
        if [lo, hi] in state.get("id_ranges", []):
            return  # exact replay of a committed increment
        if lo <= state["max_doc_id"]:
            raise ValueError(
                f"stream batch {batch_id} carries ids at or below the "
                f"committed max ({lo}..{hi} vs max "
                f"{state['max_doc_id']}) and is NOT an exact replay of a "
                "committed increment — out-of-order arrival or a lost "
                "checkpoint compacting replayed and new files into one "
                "microbatch; split or re-id the data"
            )
        prepare_increment(
            batch_df,
            state_path,
            benchmark=benchmark,
            quality_model=quality_model,
            contract_checks=contract_checks,
            out_path=out_path,
        )

    return _admit


def describe_prep_state(spark: SparkSession, state_path: str) -> dict:
    """Operational summary of a committed prep state: increments, id
    coverage, per-log committed directory and row counts, snapshot
    versions, and the frozen-artifact flags — the "what is this state
    directory?" answer without reading code.  Row counts are metadata-
    cheap (parquet footer counts, no shuffle)."""
    state = read_state(state_path)
    logs = {}
    for name in _LOGS:
        dirs = state["logs"][name]
        logs[name] = {
            "dirs": list(dirs),
            "rows": _read_log(spark, state_path, name, dirs).count(),
        }
    bloom = state.get("bloom")
    bloom_summary = None
    if bloom is not None:
        bloom_summary = {
            name: {
                "m_bits": m["m_bits"],
                "k_hashes": m["k_hashes"],
                "capacity": m["capacity"],
                "chunk_dirs": len(m["chunk_dirs"]),
                "pos_dirs": len(m["pos_dirs"]),
                "fill_ratio": m.get("fill_ratio"),
                "fpp_estimate": m.get("fpp_estimate"),
            }
            for name, m in bloom["logs"].items()
        }
        bloom_summary["needs_compaction"] = bloom_needs_compaction(state)
    return {
        "n_increments": state["n_increments"],
        "max_doc_id": state["max_doc_id"],
        "id_ranges": state.get("id_ranges", []),
        "logs": logs,
        "bloom": bloom_summary,
        "snapshot_versions": state["versions"],
        "has_quality_model": state["has_quality_model"],
        "has_contract_checks": state["has_contract_checks"],
        "has_benchmark": state["benchmark_digest"] is not None,
        "mix_fractions": state["mix_fractions"],
        "config": state["config"],
        "staleness": prep_state_is_stale(state),
    }


def compact_prep_state(spark: SparkSession, state_path: str) -> dict:
    """Fold each membership log's committed batch directories into ONE
    deduplicated directory and commit a state that reads only it — bounds
    the per-increment file count after many increments (the log twin of
    ``operators/snapshots.compact_snapshot``).  Readers are never exposed
    to a half-compacted state: the merged directory is written first, the
    state pointer swaps last, and the now-unreferenced batch directories
    are removed only AFTER the commit (a crash mid-cleanup leaves harmless
    orphans, not a broken state).  Returns the new state."""
    import shutil

    state = read_state(state_path)
    gen = state["n_increments"]
    if all(
        state["logs"][name] == [f"compact={gen}"] for name in _LOGS
    ):
        # already compacted at this generation — re-running would read
        # and overwrite the same directory in one job
        return state
    logs = {}
    for name in _LOGS:
        merged = _read_log(
            spark, state_path, name, state["logs"][name]
        ).distinct()
        logs[name] = [
            _append_log(merged, state_path, name, f"compact={gen}")
        ]
    # rebuild the Bloom sidecars from the compacted logs, RE-SIZED to the
    # then-current counts × capacity_factor — this is where a filter that
    # outgrew its init capacity (realized fpp degraded, never wrong)
    # recovers its design fpp.  Dense chunk form; the accrued pos deltas
    # fold away with the batch dirs.
    bloom_state = state.get("bloom")
    if bloom_state is not None:
        from exstream_implementation_spark.operators.bloom import (
            bloom_params,
        )

        bloom_state = json.loads(json.dumps(bloom_state))
        # keep (or mint, for pre-identity states) the root's identity —
        # the rebuilt filters still belong to the same corpus lineage
        if not bloom_state.get("identity"):
            import uuid

            bloom_state["identity"] = uuid.uuid4().hex
        for name in _LOGS:
            compacted = _read_log(
                spark, state_path, name, logs[name]
            )
            capacity = max(
                1000,
                int(compacted.count() * bloom_state["capacity_factor"]),
            )
            m_bits, k_hashes = bloom_params(
                capacity, bloom_state["fpp"], cost_balanced=True
            )
            meta = {
                "name": name,
                "m_bits": m_bits,
                "k_hashes": k_hashes,
                "seed": 42,
                "capacity": capacity,
                "identity": bloom_state["identity"],
                "chunk_dirs": [],
                "pos_dirs": [],
            }
            col = compacted.columns[0]
            meta["chunk_dirs"] = [
                _bloom_build_chunks(
                    compacted, col, meta, state_path, f"compact={gen}"
                )
            ]
            # drop the session cache BEFORE the census: the new meta has
            # different m/dirs, and the census below re-warms it
            _BLOOM_CACHE.pop((os.path.abspath(state_path), name), None)
            # post-resize census — this is where a degraded fpp_estimate
            # (bloom_needs_compaction) recovers its design target
            meta.update(_bloom_fill_stats(spark, state_path, meta))
            bloom_state["logs"][name] = meta
    new_state = {**state, "logs": logs, "bloom": bloom_state}
    _write_state(state_path, new_state)
    for name in _LOGS:  # post-commit cleanup of unreferenced directories
        for d in state["logs"][name]:
            shutil.rmtree(
                os.path.join(state_path, name, d), ignore_errors=True
            )
        if bloom_state is not None:
            old_meta = (state.get("bloom") or {}).get("logs", {}).get(name)
            for kind, dirs in (
                ("chunks", (old_meta or {}).get("chunk_dirs", [])),
                ("pos", (old_meta or {}).get("pos_dirs", [])),
            ):
                for d in dirs:
                    shutil.rmtree(
                        os.path.join(state_path, f"{name}_bloom", kind, d),
                        ignore_errors=True,
                    )
    # the snapshot-form tables accrete one immutable version per increment;
    # compaction is the natural point to vacuum them too, or the state
    # directory's file count still grows without bound.  keep is computed
    # so the version _STATE.json references ALWAYS survives: a crashed
    # increment can leave the snapshot root's own pointer ahead of the
    # state-referenced version, and vacuum(keep=1) would then retain only
    # the orphan and delete the version the committed state reads.
    from exstream_implementation_spark.operators.snapshots import (
        list_versions,
        vacuum,
    )

    for name in ("source_counts", *_LM_TABLES):
        root = os.path.join(state_path, name)
        if not os.path.isdir(root):
            continue
        newest = list_versions(root)[-1]
        keep = max(1, newest - state["versions"][name] + 1)
        vacuum(root, keep=keep)
    return new_state


def extend_prep_tokenizer(
    spark: SparkSession,
    state_path: str,
    new_state_path: str,
    docs: DataFrame,
    n_new_merges: int,
    sample_fraction: float = 1.0,
    text_col: str = "text",
) -> dict:
    """The cheap remedy when ``prep_state_is_stale`` trips on the
    tokenizer: continue Sennrich training from the FROZEN merge list on
    (a capped sample of) the drifted text (``operators.bpe.extend_merges``)
    and commit the result as a NEW state root at ``new_state_path``.

    What changes vs the old root: ``merges.json`` (frozen prefix preserved
    verbatim + up to ``n_new_merges`` appended merges) and the artifact
    baseline (recomputed over ``docs`` under the extended merges, so the
    staleness gate measures future drift against the refreshed fit).  What
    does NOT change: every membership log, snapshot table, id fence and
    config — the dedup/cap/mix equivalence contract continues unbroken,
    because extending the tokenizer does not alter which documents survive.

    **Re-tokenization boundary (the documented cost):** output shards
    written under the OLD root were tokenized with the frozen merges;
    increments under the new root use the extended list, and drifted words
    may now segment differently.  Training jobs must treat the new root as
    a new tokenizer VERSION — either re-tokenize old shards (text is
    preserved; tokenization is derived) or keep per-root token streams
    separate.  That boundary is exactly why this commits a new root
    instead of mutating the old one in place.

    ``sample_fraction`` < 1 trains on a deterministic hash-Bernoulli
    sample of ``docs`` (the train_pq convention) — merge statistics need a
    representative sample, not the batch.  The old root is untouched and
    remains valid.  State tables are carried over with a filesystem copy
    (local-fs state roots; an object-store deployment would server-side
    copy or snapshot instead) and the new ``_STATE.json`` commits last, so
    a crash mid-copy leaves no readable half-state under the new root.

    Determinism: extend_merges inherits bpe_train's deterministic
    tie-break, and the hash sample is seed-fixed — identical inputs
    produce an identical extended list.

    Returns {state, merges, artifact_baseline}.
    """
    import shutil

    from exstream_implementation_spark.operators.bpe import extend_merges

    state = read_state(state_path)
    if os.path.exists(_state_path(new_state_path)):
        raise ValueError(
            f"prep state already committed under {new_state_path}"
        )
    if not 0.0 < sample_fraction <= 1.0:
        raise ValueError(
            f"sample_fraction must be in (0, 1]: {sample_fraction}"
        )
    sample = docs
    if sample_fraction < 1.0:
        sample = docs.filter(
            F.pmod(F.xxhash64(F.col("doc_id"), F.lit(0)), F.lit(1_000_000))
            < int(sample_fraction * 1_000_000)
        )
        if sample.select(text_col).first() is None:
            raise ValueError(
                "extend_prep_tokenizer: sample_fraction selected zero docs"
            )

    merges = load_merges(os.path.join(state_path, "merges.json"))
    extended = extend_merges(
        sample, merges, n_new_merges, text_col=text_col
    )

    # carry the state tables over, then commit the new pointer LAST
    os.makedirs(new_state_path, exist_ok=True)
    for entry in os.listdir(state_path):
        if entry == _STATE_FILE or entry.startswith(f".{_STATE_FILE}"):
            continue
        src = os.path.join(state_path, entry)
        dst = os.path.join(new_state_path, entry)
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy2(src, dst)
    save_merges(extended, os.path.join(new_state_path, "merges.json"))

    lm = None
    if all(state["versions"].get(t) is not None for t in _LM_TABLES):
        lm = {
            key: read_version(
                spark,
                os.path.join(new_state_path, table),
                state["versions"][table],
            )
            for table, key in _LM_TABLES.items()
        }
    # baseline over the FULL drifted batch (not the training sample):
    # _artifact_stats caps its own scan, and the staleness yardstick every
    # future increment is judged against must not carry sampling noise
    baseline = _artifact_stats(docs, extended, lm, text_col=text_col)
    new_state = {
        **state,
        "artifact_baseline": baseline,
        # future increments' drift is judged against the refreshed fit
        "increment_artifact_stats": [],
        "tokenizer_extended_from": os.path.abspath(state_path),
        "n_frozen_merges": len(merges),
        "n_extended_merges": len(extended),
    }
    _write_state(new_state_path, new_state)
    return {
        "state": new_state,
        "merges": extended,
        "artifact_baseline": baseline,
    }
