"""End-to-end training-corpus preparation — the composition the individual
operator families exist for, as ONE auditable pipeline:

    quality filter → exact dedup → substring-level boilerplate removal →
    benchmark decontamination → BPE tokenizer training → tokenization →
    chunking → sequence packing → deterministic shuffle-shard export

Each stage is the library's own operator (plans/text.py quality metrics,
plans/dedup.py exact-dedup/decontamination conventions, plans/substring.py
span removal, operators/bpe.py, operators/packing.py, operators/
sharding.py); this module adds only the glue plus per-stage accounting, so
a user gets the standard "raw scrape → packed training shards" path in one
call without losing visibility into what each stage dropped.

Everything before packing is a single lazy DataFrame chain (Catalyst sees
the whole plan; filters fuse into the scan).  The two driver-side
materialization points are inherent to the algorithms, not the plumbing:
BPE merge training (sequential by definition — operators/bpe.py trains off
the one-shuffle word-frequency table) and the stage-count accounting (one
count per stage, only when ``counts=True``).

Scale: every stage is the operator family's documented 100 TB path —
map-side-combined aggregations, AQE-planned joins (the benchmark gram side
broadcasts when benchmark-sized), content-defined substring sampling
(``substring_mod``), hash-grouped FFD packing, and a one-exchange shard
shuffle.  Nothing here collects corpus-sized data to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from exstream_implementation_spark.operators.bpe import apply_bpe, bpe_train
from exstream_implementation_spark.operators.packing import pack_sequences
from exstream_implementation_spark.operators.sharding import write_shards
from exstream_implementation_spark.plans.substring import substring_dedup
from exstream_implementation_spark.plans.text import STOP_EN, stop_count


@dataclass(frozen=True)
class CorpusPrepConfig:
    # quality gate (the corpus_curation thresholds)
    min_tokens: int = 20
    min_stop_ratio: float = 0.02
    # substring-level boilerplate removal (plans/substring.py)
    substring_k: int = 40
    substring_mod: int | None = 8
    # decontamination: drop docs with any benchmark 3-gram overlap
    decontam_max_overlap: float = 0.0
    # consolidated-benchmark scale path: when set, decontamination
    # Bloom-prefilters corpus grams map-side before the verify join
    # (operators/bloom.py; kept set provably identical).  None = off.
    decontam_bloom_fpp: float | None = None
    # LM quality gate (plans/lm.py): drop docs whose bigram stupid-backoff
    # NLL (trained on the surviving corpus itself) exceeds this; None = off
    max_lm_nll: float | None = None
    # learned quality gate (operators/logreg.py): a pre-trained classifier
    # over doc_quality_features; docs scoring below min_p_good are dropped.
    # None = off.  Scoring is a pure-JVM projection (no UDF/broadcast).
    quality_model: object | None = None
    min_p_good: float = 0.5
    # compression gate (operators/textstats.py): drop docs whose zlib
    # ratio falls BELOW this — text that compresses too well is
    # template/repetition junk the n-gram ratios miss.  None = off.
    min_compress_ratio: float | None = None
    # per-source document cap (plans/urls.py cap_per_group): at most this
    # many docs per source survive, smallest doc_id first — the standard
    # "no single host/source dominates" curation lever.  None = off.
    max_per_source: int | None = None
    # weighted cap (plans/dedup.py sample_weighted_k): when set together
    # with max_per_source, the cap samples WITHOUT replacement with
    # probability proportional to this column (e.g. a quality score the
    # caller attached) instead of keeping the smallest doc_ids — the
    # "prefer good docs under the quota, but stochastically" lever.
    # Rows with NULL/non-positive weight never survive the cap.
    cap_weight_col: str | None = None
    # input contract (operators/expectations.py): row-expressible checks
    # run FIRST; violating rows route to stages['contract_quarantine']
    # instead of silently failing later stages.  None = off.
    contract_checks: tuple | None = None
    # tokenizer + packing
    bpe_merges: int = 64
    chunk_len: int = 64
    pack_capacity: int = 256
    pack_groups: int = 64
    # source-mix sampling (plans/dedup.py sample_mix): per-source keep
    # fractions applied as the deterministic hash-Bernoulli AFTER the
    # quality/dedup gates.  Provide fractions directly, or set
    # mix_tau + mix_target_rows to derive them from the surviving
    # per-source sizes (temperature_mix_policy).  All None = off.
    mix_fractions: dict | None = None
    mix_tau: float | None = None
    mix_target_rows: int | None = None
    source_col: str = "source"
    # leakage-safe split (plans/splits.py): assign every DOC a split and
    # pack each split separately, so a packed sequence can never mix
    # train and eval tokens.  None = no split column, single pack pool.
    split_weights: dict | None = None
    # export
    n_shards: int = 8
    seed: int = 0


def _norm_hash(text_col: str) -> F.Column:
    """Whitespace-normalized lowercase md5 — the dedup_exact convention."""
    return F.md5(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    )


def _word_3grams_from_text(text_col: str) -> F.Column:
    """Distinct word-3-gram shingles — the decontaminate convention
    (plans/dedup.py _doc_grams; < 3 tokens guarded for ANSI)."""
    toks = f"split(lower({text_col}), '\\\\s+')"
    return F.array_distinct(
        F.expr(
            f"CASE WHEN size({toks}) < 3 THEN array() ELSE "
            f"transform(sequence(0, size({toks}) - 3), i -> "
            f"concat_ws(' ', {toks}[i], {toks}[i+1], {toks}[i+2])) END"
        )
    )


def quality_filter(docs: DataFrame, cfg: CorpusPrepConfig) -> DataFrame:
    """Keep docs with >= min_tokens whitespace tokens and a stop-word
    ratio >= min_stop_ratio (the corpus_curation gate)."""
    toks = F.split(F.lower("text"), r"\s+")
    return (
        docs.withColumn("__toks", toks)
        .withColumn("__n", F.size("__toks"))
        .filter(
            (F.col("__n") >= cfg.min_tokens)
            & (
                stop_count("__toks", STOP_EN) / F.col("__n")
                >= cfg.min_stop_ratio
            )
        )
        .drop("__toks", "__n")
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Keep the min-doc_id representative of each normalized-text group —
    groupBy(hash) with a min(struct) pullback, map-side combined, never a
    window over the corpus."""
    h = docs.withColumn("__ch", _norm_hash("text"))
    keep = h.groupBy("__ch").agg(F.min("doc_id").alias("doc_id"))
    return h.join(keep, ["__ch", "doc_id"]).drop("__ch")


def drop_contaminated(
    docs: DataFrame,
    benchmark: DataFrame,
    max_overlap: float,
    bloom_fpp: float | None = None,
) -> DataFrame:
    """Drop docs whose distinct-3-gram overlap with the benchmark exceeds
    ``max_overlap`` (same ratio as plans/dedup.py decontaminate).  The
    benchmark gram side is benchmark-sized, so AQE broadcasts it and the
    corpus never shuffles.  ``bloom_fpp`` enables the consolidated-
    benchmark scale path (plans/dedup.py decontaminate pins the design):
    a Bloom prefilter discards ~(1-fpp) of corpus grams map-side before
    the verify join — the kept set is provably identical."""
    bench_grams = (
        benchmark.select(
            F.explode(
                _word_3grams_from_text("text")
            ).alias("gram")
        )
        .distinct()
    )
    g = docs.withColumn("__grams", _word_3grams_from_text("text"))
    exploded = g.select("doc_id", F.explode("__grams").alias("gram"))
    if bloom_fpp is not None:
        from exstream_implementation_spark.operators.bloom import (
            bloom_prefilter,
        )

        exploded, bench_grams = bloom_prefilter(
            exploded, bench_grams, "gram", bloom_fpp
        )
    hits = (
        exploded.join(bench_grams, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("__n_hit"))
    )
    return (
        g.join(hits, "doc_id", "left")
        .filter(
            F.coalesce(F.col("__n_hit"), F.lit(0))
            / F.greatest(F.size("__grams"), F.lit(1))
            <= max_overlap
        )
        .drop("__grams", "__n_hit")
    )


def chunk_tokens(tokenized: DataFrame, chunk_len: int) -> DataFrame:
    """(doc_id, chunk_idx, toks, n_toks): split each doc's bpe_tokens into
    fixed-size chunks (last one ragged); empty docs emit nothing."""
    n_chunks = F.ceil(F.size("bpe_tokens") / F.lit(chunk_len)).cast("int")
    idx = F.when(
        n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)
    ).otherwise(F.array().cast("array<int>"))
    return (
        tokenized.select(
            "doc_id",
            F.col("bpe_tokens").alias("__all"),
            F.explode(idx).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.slice(
                "__all", F.col("chunk_idx") * chunk_len + 1, chunk_len
            ).alias("toks"),
        )
        .withColumn("n_toks", F.size("toks"))
    )


def assemble_sequences(
    chunks: DataFrame, assignment: DataFrame
) -> DataFrame:
    """(pack_group, seq_id, toks, seq_fill): concatenate each packed
    sequence's chunks in deterministic (doc_id, chunk_idx) order.  Per-
    sequence work is bounded by pack capacity — the collect_list is at
    most capacity tokens."""
    assign = assignment.select(
        "doc_id", "chunk_idx", "pack_group", "seq_id", "seq_fill"
    )
    return (
        chunks.join(assign, ["doc_id", "chunk_idx"])
        .groupBy("pack_group", "seq_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("doc_id", "chunk_idx", "toks")
                        )
                    ),
                    lambda s: s["toks"],
                )
            ).alias("toks"),
            F.first("seq_fill").alias("seq_fill"),
        )
    )


def pack_and_sequence(chunks: DataFrame, cfg: CorpusPrepConfig):
    """(assignment, sequences) from the chunk table — per-split FFD packing
    when ``cfg.split_weights`` is set, a single pool otherwise.  Factored so
    the incremental pipeline packs each increment through the identical
    path."""
    if cfg.split_weights is not None:
        # the split is a pure hash of doc_id (plans/splits.py), so
        # re-deriving it on the chunk table costs a projection and stays
        # consistent with any doc-level assignment of the same
        # (weights, salt).  Packing runs once per split: FFD never sees
        # chunks from two splits, so no packed sequence can leak eval
        # tokens into training.
        from exstream_implementation_spark.plans.splits import (
            assign_splits,
        )

        tagged = assign_splits(
            chunks, cfg.split_weights, unit_col="doc_id", salt=cfg.seed
        ).persist()
        # the persist is the bound on upstream recomputation: without it,
        # each split's pack + assemble re-runs the full lazy chain
        # (quality -> dedup -> despan -> BPE apply -> chunking) — 2 scans
        # PER SPLIT of corpus-sized work instead of one materialization
        # of the chunk table (same pattern as train_pq/build_ivfpq_index;
        # left cached for the caller's stage frames, LRU-evictable)
        a_parts, s_parts = [], []
        for name in cfg.split_weights:
            sub = tagged.filter(F.col("split") == name).drop("split")
            a = pack_sequences(
                sub, cfg.pack_capacity, num_groups=cfg.pack_groups
            )
            a_parts.append(a.withColumn("split", F.lit(name)))
            s_parts.append(
                assemble_sequences(sub, a).withColumn("split", F.lit(name))
            )
        assignment = a_parts[0]
        for p in a_parts[1:]:
            assignment = assignment.unionByName(p)
        sequences = s_parts[0]
        for p in s_parts[1:]:
            sequences = sequences.unionByName(p)
    else:
        assignment = pack_sequences(
            chunks, cfg.pack_capacity, num_groups=cfg.pack_groups
        )
        sequences = assemble_sequences(chunks, assignment)
    return assignment, sequences


def export_sequences(
    sequences: DataFrame, cfg: CorpusPrepConfig, out_path: str
) -> None:
    """Shard-export the packed sequences under ``out_path`` — one shard
    tree per split when ``cfg.split_weights`` is set; schema-bearing empty
    files keep every tree readable.  Factored for the incremental path."""
    export = sequences.withColumn(
        "seq_key",
        F.concat_ws("_", F.col("pack_group"), F.col("seq_id")),
    )
    if cfg.split_weights is not None:
        # one shard tree per split — training readers consume
        # out_path/split=train/shard=i/ without filtering.  A split
        # that received zero sequences still gets a schema-bearing
        # empty shard=0 file: partitionBy writes nothing for an
        # empty frame, which would leave split=val/ unreadable
        # ('Unable to infer schema') and a root read with
        # inconsistent partition depth.
        for name in cfg.split_weights:
            filtered = export.filter(F.col("split") == name).drop("split")
            if filtered.limit(1).count() == 0:
                filtered.limit(0).coalesce(1).write.mode(
                    "overwrite"
                ).parquet(f"{out_path}/split={name}/shard=0")
                continue
            write_shards(
                filtered,
                f"{out_path}/split={name}",
                "seq_key",
                cfg.n_shards,
                seed=cfg.seed,
            )
    else:
        if export.limit(1).count() == 0:
            # same readability convention for an empty single-pool export
            # (an all-dropped increment is a normal outcome, not an error)
            export.limit(0).coalesce(1).write.mode("overwrite").parquet(
                f"{out_path}/shard=0"
            )
        else:
            write_shards(
                export, out_path, "seq_key", cfg.n_shards, seed=cfg.seed
            )


def prepare_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    cfg: CorpusPrepConfig = CorpusPrepConfig(),
    out_path: str | None = None,
    counts: bool = False,
    datasheet: bool = False,
) -> dict:
    """Run the full prep pipeline.  Returns a dict of the per-stage frames
    (lazy unless ``counts``/``out_path`` forces them):

      contracted (== input when contract_checks is None; violating rows
      in stages['contract_quarantine']) →
      quality → deduped → despanned → decontaminated (== input when no
      benchmark) → lm_filtered (== input when max_lm_nll is None) →
      clf_filtered (== input when quality_model is None) →
      compress_filtered (== input when min_compress_ratio is None) →
      capped (== input when max_per_source is None) →
      mixed (== input when no mix config) →
      merges (list) → tokenized → chunks → assignment →
      sequences [→ written shards at out_path/shard=i/]

    plus ``stage_counts`` when ``counts=True``.
    """
    stages: dict = {}
    if cfg.cap_weight_col is not None and cfg.max_per_source is None:
        # fail loudly: a weight column with no quota is a do-nothing
        # config (same contract as mix_target_rows without mix_tau)
        raise ValueError(
            "cap_weight_col requires max_per_source (the weighted cap "
            "samples AGAINST a quota)"
        )
    cur = docs
    if cfg.contract_checks is not None:
        from exstream_implementation_spark.operators.expectations import (
            quarantine,
        )

        # malformed inputs (NULL ids/text, broken invariants) route to a
        # side frame with named reasons BEFORE any stage can trip on them
        cur, bad = quarantine(cur, list(cfg.contract_checks))
        stages["contract_quarantine"] = bad
    stages["contracted"] = cur
    cur = quality_filter(cur, cfg)
    stages["quality"] = cur
    cur = exact_dedup(cur)
    stages["deduped"] = cur
    cur = substring_dedup(
        cur, k=cfg.substring_k, mod=cfg.substring_mod
    ).drop("n_removed_chars")
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
        # CCNet-style LM gate, self-trained on the surviving corpus: docs
        # whose word ORDER is implausible under the corpus bigram LM are
        # dropped even when every surface ratio passes
        from exstream_implementation_spark.plans.lm import (
            score_lm_nll,
            train_bigram_lm,
        )

        cur = (
            score_lm_nll(cur, train_bigram_lm(cur))
            .filter(F.col("lm_nll") <= cfg.max_lm_nll)
            .drop("lm_nll")
        )
    stages["lm_filtered"] = cur

    if cfg.quality_model is not None:
        # learned (CCNet/GPT-3-style) quality gate: sigmoid(w.x + b) over
        # the surface-feature vector, scored inside whole-stage codegen
        from exstream_implementation_spark.operators.logreg import (
            doc_quality_features,
            logreg_score_expr,
        )

        cur = (
            doc_quality_features(cur)
            .filter(
                logreg_score_expr(cfg.quality_model) >= cfg.min_p_good
            )
            .drop("features")
        )
    stages["clf_filtered"] = cur

    if cfg.min_compress_ratio is not None:
        from exstream_implementation_spark.operators.textstats import (
            compression_ratio,
        )

        # NULL ratio (empty/null text, e.g. a fully-boilerplate doc the
        # despan stage spliced to '') is UNDEFINED, not "compresses too
        # well" — pass it through so enabling this gate never changes
        # the fate of non-repetitive empty docs
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

        # persist before the cap: cap_per_group reads its input twice
        # (winner selection + semi-join probe), and `cur` here is the
        # whole unmaterialized quality→dedup→despan→…→compress chain —
        # same reason the mix/split branches persist (LRU-evictable)
        cur = cur.persist()
        if cfg.cap_weight_col is not None:
            from exstream_implementation_spark.plans.dedup import (
                sample_weighted_k,
            )

            # quality-weighted quota: ES sampling without replacement,
            # deterministic in (doc_id, seed, weights) — same two-phase
            # fold, so a dominant source never becomes one task
            cur = sample_weighted_k(
                cur,
                cfg.source_col,
                cfg.max_per_source,
                cfg.cap_weight_col,
                id_col="doc_id",
                salt=cfg.seed,
            )
        else:
            # deterministic cap: the n smallest doc_ids per source, via
            # the two-phase fold — a dominant source never becomes one
            # task
            cur = cap_per_group(
                cur, [cfg.source_col], cfg.max_per_source, id_col="doc_id"
            )
    stages["capped"] = cur

    mix_policy = None
    if (
        cfg.mix_target_rows is not None
        and cfg.mix_tau is None
        and cfg.mix_fractions is None
    ):
        raise ValueError(
            "corpus_prep: mix_target_rows does nothing without mix_tau"
        )
    if cfg.mix_fractions is not None or cfg.mix_tau is not None:
        from exstream_implementation_spark.plans.dedup import (
            sample_mix,
            temperature_mix_policy,
        )

        if cfg.mix_fractions is not None and cfg.mix_tau is not None:
            raise ValueError(
                "corpus_prep: set mix_fractions OR mix_tau, not both"
            )
        if cfg.mix_fractions is not None:
            fractions = cfg.mix_fractions
        else:
            if cfg.mix_target_rows is None:
                raise ValueError(
                    "corpus_prep: mix_tau needs mix_target_rows"
                )
            # persist before the policy aggregate: the size groupBy would
            # otherwise materialize the full upstream chain once more
            # (same reason the split branch persists its chunk table)
            cur = cur.persist()
            # τ policy from the SURVIVING corpus's per-source sizes —
            # one aggregate.  Epoch factors > 1 (demand exceeding a
            # source) are NOT applied — a single-pass prep keeps at most
            # one copy — but the full policy (fractions, epochs, sizes)
            # is surfaced via stages['mix_policy'] and the manifest so
            # an undershoot vs mix_target_rows is auditable.
            mix_policy = temperature_mix_policy(
                cur, cfg.mix_tau, cfg.mix_target_rows, key=cfg.source_col
            )
            fractions = mix_policy["fractions"]
        # DISTINCT salt from the split assignment: for string doc ids
        # sample_mix(salt) and assign_splits(salt) hash identically, and
        # equal salts would correlate keep-selection with split
        # assignment (e.g. every kept row landing in 'train')
        cur = sample_mix(
            cur, fractions, key=cfg.source_col, salt=cfg.seed + 101
        )
    stages["mixed"] = cur
    stages["mix_policy"] = mix_policy

    merges = bpe_train(cur.select("doc_id", "text"), cfg.bpe_merges)
    stages["merges"] = merges
    tokenized = apply_bpe(cur, merges)
    stages["tokenized"] = tokenized

    chunks = chunk_tokens(tokenized, cfg.chunk_len)
    stages["chunks"] = chunks
    assignment, sequences = pack_and_sequence(chunks, cfg)
    stages["assignment"] = assignment
    stages["sequences"] = sequences

    if out_path is not None:
        export_sequences(sequences, cfg, out_path)
        stages["out_path"] = out_path

    if counts:
        # ONE count per stage, shared by the returned dict AND the
        # manifest below (counting twice would re-run the full lazy
        # chain once per stage per consumer)
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
        # dataset manifest: the provenance record a training job (or an
        # auditor) reads next to the shards — full prep config, tokenizer
        # merges, and (when counts ran) per-stage survivor counts.
        # Deterministic in (data, cfg): no timestamps, no host state.
        # Atomic tmp+rename; underscore prefix so Spark readers skip it.
        import dataclasses as _dc
        import json as _json
        import os as _os

        manifest = {
            "config": {
                k: v
                for k, v in _dc.asdict(cfg).items()
                if k != "quality_model"  # model weights live in code/MLops
            },
            "has_quality_model": cfg.quality_model is not None,
            "bpe_merges": [list(m) for m in merges],
            "splits": (
                list(cfg.split_weights) if cfg.split_weights else None
            ),
            # τ-mixing audit trail: clamped fractions, the UNAPPLIED
            # epoch factors (a value > 1 means the achieved corpus
            # undershoots mix_target_rows for that source), and the
            # surviving sizes the policy was derived from
            "mix_policy": mix_policy,
        }
        if counts:
            manifest["stage_counts"] = stages["stage_counts"]
        tmp = _os.path.join(out_path, ".manifest.json.tmp")
        _os.makedirs(out_path, exist_ok=True)
        with open(tmp, "w") as fh:
            _json.dump(manifest, fh, indent=1, sort_keys=True)
        _os.replace(tmp, _os.path.join(out_path, "_MANIFEST.json"))

    if datasheet and out_path is not None:
        # opt-in: the Datasheets-for-Datasets record of the SURVIVING
        # corpus (the mixed stage — what the shards were built from),
        # written next to the manifest.  Costs the datasheet's bounded
        # extra passes, hence opt-in.
        from exstream_implementation_spark.datasheet import (
            corpus_datasheet,
            datasheet_markdown,
        )

        md = datasheet_markdown(
            corpus_datasheet(
                stages["mixed"], source_col=cfg.source_col, cfg=cfg
            ),
            title="Corpus datasheet (surviving documents)",
        )
        tmp = _os.path.join(out_path, ".datasheet.md.tmp")
        with open(tmp, "w") as fh:
            fh.write(md)
        _os.replace(tmp, _os.path.join(out_path, "_DATASHEET.md"))
        stages["datasheet_markdown"] = md

    return stages


# Doc-level stages in pipeline order — the audit walks consecutive pairs.
AUDIT_STAGES = (
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
)


def drop_audit(
    stages: dict, docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per-document provenance for a ``prepare_corpus`` run: one row per
    INPUT doc with ``dropped_at`` = the first stage whose output no longer
    contains it, or ``'kept'``.  The curation counterpart of the manifest's
    aggregate stage_counts — "why is doc X missing from my shards?" becomes
    one filter.

    Each consecutive stage pair contributes a left-anti join between two
    id projections; every stage's id set is tracked-persisted (cache.py)
    so the audit materializes each stage chain ONCE, not once per
    downstream comparison, and the pins release at the next catalog query
    / ``release_tracked()``.  Disabled stages (output == input frame)
    contribute empty anti-joins and never appear in the result.
    """
    from exstream_implementation_spark import cache

    prev = cache.tracked_persist(docs.select(id_col))
    parts = []
    for name in AUDIT_STAGES:
        cur = cache.tracked_persist(stages[name].select(id_col))
        parts.append(
            prev.join(cur, id_col, "left_anti").withColumn(
                "dropped_at", F.lit(name)
            )
        )
        prev = cur
    out = prev.withColumn("dropped_at", F.lit("kept"))
    for p in parts:
        out = out.unionByName(p)
    return out
