"""Streaming-ingest dedup — the dedup family applied at document-arrival time.

A 100 TB training corpus is not built in one batch: documents arrive
continuously, and admitting a duplicate costs training compute forever after.
This module runs the same dedup semantics as the batch catalog
(plans/dedup.py) on a document stream:

- ``with_content_hashes``   raw + whitespace-normalized md5, per row
- ``with_simhash_bands``    the 64-bit / 4-band SimHash of dedup_simhash,
                            reformulated as PER-ROW higher-order-function
                            expressions (no explode, no groupBy) so it runs
                            on an unbounded stream — and, at batch scale, with
                            ZERO shuffle (the explode+groupBy formulation
                            shuffles one row per token)
- ``stream_exact_dedup``    watermarked dropDuplicatesWithinWatermark on the
                            normalized content hash — state is one key per
                            distinct hash inside the watermark horizon, not
                            the corpus
- ``corpus_simhash_index``  static (band_id, band_val) → corpus doc index
- ``stream_neardup_vs_corpus``
                            stream-static band equi-join + exact Hamming ≤ 3
                            re-check: every arriving doc is flagged against
                            the existing corpus without ever scanning it
                            (the index is partitioned by band value; a doc
                            probes 4 band keys)
- ``with_minhash_signature`` the 8-lane MinHash of dedup_minhash_lsh as a
                            PER-ROW higher-order fold (array_min over the
                            shingle array — no explode, no groupBy), bit-
                            identical to the batch signature
- ``corpus_minhash_index`` / ``stream_minhash_vs_corpus``
                            the banded-MinHash twin of the SimHash arm:
                            2-band equi-join candidates + the 8-lane
                            estimated-Jaccard re-check

All transforms use the unified DataFrame API, so each also runs on a batch
frame — tests assert stream availableNow == batch on the same data, and that
the per-row SimHash is bit-identical to the batch ``dedup_simhash`` bands
(reference for the semantics: plans/dedup.py:415-496; the reference repo has
no dedup at all — this is the BASELINE.json north-star extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from exstream_implementation_spark.plans.dedup import (
    _HAMMING_MAX,
    _SIMHASH_BANDS,
    N_MINHASH,
    band_structs,
    dedup_simhash,
    minhash_band_structs,  # noqa: F401 — canonical home is plans.dedup
    with_minhash_signature,  # noqa: F401 — stream-safe per-row folds,
    with_simhash_bands,  # noqa: F401 — shared with the batch catalog
)

DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def documents_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """File-based streaming source over a directory of documents parquet.
    Explicit schema — a streaming source must not run an inference job."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def with_event_time(
    df: DataFrame,
    origin: str = "2024-01-01 00:00:00",
    docs_per_second: int = 100,
) -> DataFrame:
    """Deterministic synthetic arrival time derived from doc_id (tests /
    replays). Production ingest should use the real arrival timestamp; every
    downstream transform only needs SOME event-time column to watermark on."""
    return df.withColumn(
        "event_time",
        F.to_timestamp(F.lit(origin))
        + F.make_interval(secs=F.col("doc_id") / F.lit(docs_per_second)),
    )


def with_content_hashes(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Raw + whitespace-normalized md5 (same formulas as dedup_exact) — pure
    per-row codegen, streaming-safe."""
    return df.withColumn(
        "content_hash", F.md5(text_col)
    ).withColumn(
        "norm_hash",
        F.md5(F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " "))),
    )


def stream_exact_dedup(
    docs: DataFrame,
    watermark: str = "10 minutes",
    key: str = "norm_hash",
) -> DataFrame:
    """Admit only the first arrival of each (normalized) content hash.

    dropDuplicatesWithinWatermark bounds the dedup state to hashes seen
    inside the watermark horizon — the honest streaming contract at scale
    (cross-horizon re-arrivals are caught by the periodic batch dedup_exact
    pass, which this stage exists to keep cheap, not replace)."""
    hashed = with_content_hashes(docs)
    if not hashed.isStreaming:
        # batch twin (unified-API replay): one survivor per key — batch has
        # no arrival order, so the survivor is arbitrary where the stream
        # keeps the first arrival
        return hashed.dropDuplicates([key])
    return hashed.withWatermark(
        "event_time", watermark
    ).dropDuplicatesWithinWatermark([key])


# --- banded MinHash arm: signature fold + band structs live in
# plans.dedup (with_minhash_signature / minhash_band_structs — the batch
# catalog uses the same per-row fold); re-exported via the import above.
def corpus_minhash_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static banded-MinHash index over the existing corpus: one row per
    (band_id, band_hash, corpus doc) carrying the 8 lanes for the estimated-
    Jaccard re-check.  Built with the same per-row fold the stream side uses
    (bit-parity with the batch groupBy fold is pytest-pinned)."""
    from exstream_implementation_spark.sources import load_table

    sig = with_minhash_signature(load_table(spark, sf_dir, "documents"))
    return (
        sig.select(
            F.col("doc_id").alias("corpus_doc_id"),
            *[F.col(f"h{i}").alias(f"c{i}") for i in range(N_MINHASH)],
            F.explode(minhash_band_structs()).alias("band"),
        )
        .filter(F.col("band.band_hash").isNotNull())
        .select(
            "band.band_id",
            "band.band_hash",
            "corpus_doc_id",
            *[f"c{i}" for i in range(N_MINHASH)],
        )
    )


def stream_minhash_vs_corpus(
    docs: DataFrame,
    index: DataFrame,
    min_est_jaccard: float = 0.5,
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Flag arriving documents whose estimated Jaccard (lane agreement / 8)
    against any corpus doc meets the threshold.  Candidates from the
    (band_id, band_hash) equi-join — a doc probes 2 band keys, never the
    corpus — then the 8-lane agreement re-check; one flag per (doc, corpus
    doc) inside the watermark horizon."""
    sig = with_minhash_signature(docs)
    probes = (
        sig.select(
            "doc_id",
            "event_time",
            *[f"h{i}" for i in range(N_MINHASH)],
            F.explode(minhash_band_structs()).alias("band"),
        )
        .filter(F.col("band.band_hash").isNotNull())
        .select(
            "doc_id", "event_time",
            *[f"h{i}" for i in range(N_MINHASH)],
            "band.band_id", "band.band_hash",
        )
    )
    est = sum(
        F.when(F.col(f"h{i}") == F.col(f"c{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    ) / float(N_MINHASH)
    flagged = (
        probes.join(index, ["band_id", "band_hash"])
        .filter(F.col("doc_id") != F.col("corpus_doc_id"))
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= min_est_jaccard)
        .select("doc_id", "event_time", "corpus_doc_id", "est_jaccard")
    )
    return _dedup_flags(flagged, watermark)


def _dedup_flags(flagged: DataFrame, watermark: str | None) -> DataFrame:
    """One flag per (doc, corpus doc).  ``watermark=None`` means the input
    stream ALREADY carries a watermark (e.g. it came through
    stream_exact_dedup) — Spark forbids redefining one, so only the
    stateful dedup is applied."""
    if not flagged.isStreaming:
        return flagged.dropDuplicates(["doc_id", "corpus_doc_id"])
    if watermark is not None:
        flagged = flagged.withWatermark("event_time", watermark)
    return flagged.dropDuplicatesWithinWatermark(["doc_id", "corpus_doc_id"])


def corpus_simhash_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static near-dup index over the existing corpus: one row per
    (band_id, band_val, corpus doc) carrying the full 4-band signature for
    the exact Hamming re-check.  At scale this table is written partitioned
    by (band_id, band_val) so a probe touches 4 partitions."""
    sh = dedup_simhash(spark, sf_dir).select("doc_id", "b0", "b1", "b2", "b3")
    return sh.select(
        F.col("doc_id").alias("corpus_doc_id"),
        F.col("b0").alias("c0"),
        F.col("b1").alias("c1"),
        F.col("b2").alias("c2"),
        F.col("b3").alias("c3"),
        F.explode(band_structs()).alias("band"),
    ).select("band.band_id", "band.band_val", "corpus_doc_id", "c0", "c1", "c2", "c3")


def stream_neardup_vs_corpus(
    docs: DataFrame,
    index: DataFrame,
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Flag arriving documents within Hamming ≤ 3 of any existing corpus doc.

    Candidates come from the (band_id, band_val) equi-join (pigeonhole: two
    64-bit hashes within distance 3 agree exactly on ≥ 1 of the 4 bands —
    plans/dedup.py:499), then the exact 64-bit Hamming distance filters.  A
    pair that agrees on several bands would emit once per agreeing band;
    dropDuplicatesWithinWatermark collapses it to one flag per
    (doc, corpus doc) inside the watermark horizon."""
    sh = with_simhash_bands(docs)
    probes = sh.select(
        "doc_id", "event_time", "b0", "b1", "b2", "b3",
        F.explode(band_structs()).alias("band"),
    ).select(
        "doc_id", "event_time", "b0", "b1", "b2", "b3",
        "band.band_id", "band.band_val",
    )
    hamming = sum(
        F.expr(f"bit_count(b{b} ^ c{b})") for b in range(_SIMHASH_BANDS)
    )
    flagged = (
        probes.join(index, ["band_id", "band_val"])
        .filter(F.col("doc_id") != F.col("corpus_doc_id"))
        .filter(hamming <= _HAMMING_MAX)
        .select(
            "doc_id",
            "event_time",
            "corpus_doc_id",
            hamming.cast("int").alias("hamming"),
        )
    )
    return _dedup_flags(flagged, watermark)


def simhash_index_rows(docs: DataFrame) -> DataFrame:
    """Banded-SimHash index rows for ANY document frame — the generic twin of
    ``corpus_simhash_index`` (which is bound to an sf_dir): one row per
    (band_id, band_val, corpus doc) carrying the full 4-band signature."""
    return with_simhash_bands(docs).select(
        F.col("doc_id").alias("corpus_doc_id"),
        F.col("b0").alias("c0"),
        F.col("b1").alias("c1"),
        F.col("b2").alias("c2"),
        F.col("b3").alias("c3"),
        F.explode(band_structs()).alias("band"),
    ).select("band.band_id", "band.band_val", "corpus_doc_id", "c0", "c1", "c2", "c3")


def minhash_index_rows(docs: DataFrame) -> DataFrame:
    """Banded-MinHash index rows for ANY document frame (generic twin of
    ``corpus_minhash_index``)."""
    sig = with_minhash_signature(docs)
    return (
        sig.select(
            F.col("doc_id").alias("corpus_doc_id"),
            *[F.col(f"h{i}").alias(f"c{i}") for i in range(N_MINHASH)],
            F.explode(minhash_band_structs()).alias("band"),
        )
        .filter(F.col("band.band_hash").isNotNull())
        .select(
            "band.band_id",
            "band.band_hash",
            "corpus_doc_id",
            *[f"c{i}" for i in range(N_MINHASH)],
        )
    )


# --- refreshing ingest: admitted docs ENTER the near-dup index ---------------
#
# The stream-static arms above join every arrival against a FIXED corpus
# snapshot — a duplicate arriving after the snapshot was taken is silently
# missed.  This engine closes that hole with the append_to_ivf_index pattern
# (operators/ann_index.py): the index lives as catalog tables, and a
# foreachBatch sink (1) flags each microbatch against the index AS OF its
# arrival, then (2) appends the admitted docs' band rows — so a doc admitted
# in microbatch N flags its near-duplicate arriving in ANY later batch.
# Within one microbatch, docs are additionally checked against EACH OTHER
# (a tiny batch×batch band join, oriented doc_id > corpus_doc_id), so a
# near-dup pair arriving in the same trigger is flagged immediately instead
# of waiting for the periodic batch pass.  The stream-static arms above keep
# the pre-batch-corpus-only contract (EXACT same-batch duplicates are
# dropped in both designs).  At scale the
# index tables should be written partitioned by band_id; probes stay
# bounded — a doc touches 4 (SimHash) / 2 (MinHash) band keys and the small
# microbatch side broadcasts against them.

def init_neardup_corpus(
    spark: SparkSession,
    name: str,
    docs: DataFrame | None = None,
    n_buckets: int = 16,
) -> None:
    """Create (or reset) the persistent admission-corpus tables:
    ``{name}_admitted`` (doc_id, norm_hash, event_time),
    ``{name}_sh_idx`` / ``{name}_mh_idx`` (band indexes),
    ``{name}_sh_flags`` / ``{name}_mh_flags`` (flag logs partitioned by the
    admitting batch_id — retries overwrite their own partition, see
    ``_write_flags``), and ``{name}_meta`` (n_docs, n_base — the staleness
    gate's baseline, same contract as ann_index's n_trained).

    The corpus tables are BUCKETED on their join keys (admitted: norm_hash;
    indexes: the band key) — the corpus side of every per-batch join reads
    co-located buckets with NO exchange (plan-pinned in pytest), so each
    microbatch shuffles only its own small probe side; appends route through
    the bucket spec via the catalog insert path (the ann_index pattern).
    Size ``n_buckets`` to the target corpus (bucket ≈ executor-memory
    chunk); 100 TB corpora want thousands.

    Cost honesty: bucketing removes the per-trigger corpus SHUFFLE, not the
    corpus scan — each trigger still reads the corpus side of the joins.
    At scale, compose: the watermarked ``stream_exact_dedup`` arm gives
    true O(batch) dedup within its state horizon; run THIS engine at a
    coarser trigger (or as the periodic batch pass) for full-corpus
    coverage, and ``compact_neardup_index`` keeps its scans one sorted
    file per bucket."""
    import os
    import shutil
    from urllib.parse import urlparse

    # DROP removes a REGISTERED managed table's location, but a table created
    # by a previous session (in-memory catalog) leaves an orphaned warehouse
    # directory that makes CREATE fail with LOCATION_ALREADY_EXISTS — clear
    # it too (local-filesystem warehouses; remote ones need an external rm)
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    for suffix in ("admitted", "sh_idx", "mh_idx", "sh_flags", "mh_flags", "meta"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_{suffix}")
        if wh.scheme in ("", "file") and os.path.isdir(wh.path):
            shutil.rmtree(os.path.join(wh.path, f"{name}_{suffix}"), ignore_errors=True)
    if docs is None:
        docs = spark.createDataFrame([], DOCUMENTS_SCHEMA)
    if "event_time" not in docs.columns:
        docs = docs.withColumn("event_time", F.lit(None).cast("timestamp"))
    from exstream_implementation_spark.operators.bucketing import (
        write_bucketed,
    )

    hashed = with_content_hashes(docs).dropDuplicates(["norm_hash"])
    # (write_bucketed overwrites, which also replaces a location orphaned by
    # a previous session whose in-memory catalog entry DROP can't see)
    write_bucketed(
        hashed.select("doc_id", "norm_hash", "event_time"),
        f"{name}_admitted",
        ["norm_hash"],
        n_buckets=n_buckets,
        sort_cols=["norm_hash"],
    )
    write_bucketed(
        simhash_index_rows(hashed),
        f"{name}_sh_idx",
        ["band_id", "band_val"],
        n_buckets=n_buckets,
        sort_cols=["band_id", "band_val"],
    )
    write_bucketed(
        minhash_index_rows(hashed),
        f"{name}_mh_idx",
        ["band_id", "band_hash"],
        n_buckets=n_buckets,
        sort_cols=["band_id", "band_hash"],
    )
    # flag logs are PARTITIONED by the admitting batch_id so a retried
    # microbatch can replace exactly its own partition (dynamic partition
    # overwrite) — the append path alone is not idempotent under retry
    for arm, dist_col in (("sh", "hamming int"), ("mh", "est_jaccard double")):
        spark.createDataFrame(
            [],
            f"doc_id long, corpus_doc_id long, {dist_col}, batch_id long",
        ).write.mode("overwrite").format("parquet").partitionBy(
            "batch_id"
        ).saveAsTable(f"{name}_{arm}_flags")
    n = spark.table(f"{name}_admitted").count()
    spark.createDataFrame(
        [(int(n), int(n))], "n_docs long, n_base long"
    ).write.mode("overwrite").format("parquet").saveAsTable(f"{name}_meta")


NEARDUP_TABLE_SUFFIXES = ("admitted", "sh_idx", "mh_idx", "sh_flags", "mh_flags", "meta")


def refresh_neardup_tables(spark: SparkSession, name: str) -> None:
    """Invalidate the session's cached file listings for the corpus tables.

    foreachBatch appends run in a CLONED microbatch session; the outer
    session's relation cache still points at the pre-stream file lists, so a
    reader that touched a table before the stream ran would silently see the
    old snapshot.  Call this after (or between) streaming runs before reading."""
    for suffix in NEARDUP_TABLE_SUFFIXES:
        spark.catalog.refreshTable(f"{name}_{suffix}")


def compact_neardup_index(spark: SparkSession, name: str) -> dict:
    """Rewrite both band indexes and reset the staleness baseline.

    Streaming appends leave small per-microbatch bucket files.  Compaction
    rewrites the admitted corpus and both band indexes through the SAME
    bucket spec (one file per bucket, sorted on the join key — the
    co-located-join layout, freshly clustered), then resets ``n_base`` so
    ``neardup_index_is_stale`` measures growth from the compacted state.  The band rows themselves are exact functions
    of each doc, so compaction is a pure layout rewrite — row sets are
    unchanged (pytest-pinned).

    Writes go through a staging table + catalog rename, never an overwrite
    of a table being read (Spark rejects that lineage, and a failed rewrite
    must not destroy the live index)."""
    from exstream_implementation_spark.operators.index_lifecycle import (
        compact_bucketed_table,
    )

    counts = {}
    for suffix, keys in (
        ("admitted", ("norm_hash",)),
        ("sh_idx", ("band_id", "band_val")),
        ("mh_idx", ("band_id", "band_hash")),
    ):
        counts[suffix] = compact_bucketed_table(
            spark, f"{name}_{suffix}", list(keys)
        )
    meta = spark.table(f"{name}_meta").first()
    spark.createDataFrame(
        [(int(meta["n_docs"]), int(meta["n_docs"]))],
        "n_docs long, n_base long",
    ).write.mode("overwrite").format("parquet").saveAsTable(f"{name}_meta")
    return counts


def neardup_index_is_stale(
    spark: SparkSession, name: str, growth_threshold: float = 0.5
) -> bool:
    """True when the corpus grew more than ``growth_threshold`` past the
    count the index was last built/compacted at (``n_base``).  Appends keep
    the index CORRECT (band rows are exact functions of the doc, unlike IVF
    centroids) but accumulate small files and skew band partitions — past the
    threshold the caller should rewrite the index tables and reset n_base."""
    from exstream_implementation_spark.operators.index_lifecycle import (
        growth_is_stale,
    )

    spark.catalog.refreshTable(f"{name}_meta")
    meta = spark.table(f"{name}_meta").first()
    return growth_is_stale(
        int(meta["n_docs"]), int(meta["n_base"]), growth_threshold
    )


def _write_flags(flags: DataFrame, table: str) -> None:
    """Idempotent per-batch flag write.

    The flag tables are partitioned by ``batch_id`` and written with DYNAMIC
    partition overwrite, so a retried microbatch (crash after the flag write
    but before the corpus appends — the appends self-heal via the anti-join,
    the old append-mode flag log did not) REPLACES exactly its own partition
    instead of appending duplicate flag rows with the same batch_id.
    insertInto is positional: data columns first, the batch_id partition
    column last, matching the create-time layout.

    The dynamic mode must be set via SESSION conf — the per-writer
    ``option("partitionOverwriteMode", ...)`` is silently ignored on the
    insertInto path here (verified: a static overwrite wiped sibling
    partitions), so save/restore the conf around the write."""
    spark = flags.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        flags.write.mode("overwrite").insertInto(table)
    finally:
        spark.conf.set(key, prev)


def admit_microbatch(
    batch: DataFrame,
    batch_id: int,
    name: str,
    min_est_jaccard: float = 0.5,
) -> None:
    """One admission trigger against the persistent corpus ``name``.

    Exposed at module level (rather than closed over inside
    ``start_refreshing_ingest``) so retry semantics are directly testable:
    re-running the same (batch, batch_id) — the foreachBatch at-least-once
    contract — must leave every corpus/flag table exactly as a single run
    would.  Admitted/index appends self-heal via the anti-join (a retry
    finds nothing new); flag writes are per-batch-partition overwrites."""
    spark = batch.sparkSession
    hashed = with_content_hashes(batch).dropDuplicates(["norm_hash"])
    # localCheckpoint TRUNCATES the lineage: ``new`` depends on the
    # _admitted table through the anti-join, and appending to that table
    # below invalidates any cached plan over it — a merely persisted
    # ``new`` would silently recompute against the UPDATED table and
    # come back empty.  Materializing eagerly pins the pre-append result.
    new = hashed.join(
        spark.table(f"{name}_admitted").select("norm_hash"),
        "norm_hash",
        "left_anti",
    ).localCheckpoint(eager=True)
    if new.isEmpty():
        return
    # --- flag vs the index as of arrival (join BEFORE append), PLUS the
    # batch's own docs: two docs arriving in the same trigger are near-dup
    # checked against each other via a second (batch × batch, both tiny,
    # broadcast) join oriented doc_id > corpus_doc_id — kept separate from
    # the corpus join so the bucketed corpus scan's no-exchange plan is
    # untouched.  Without this arm a pair arriving together is admitted
    # twice and flagged only by the next periodic batch pass. ---
    sh = with_simhash_bands(new)
    batch_sh_idx = simhash_index_rows(new)
    probes = sh.select(
        "doc_id", "b0", "b1", "b2", "b3",
        F.explode(band_structs()).alias("band"),
    ).select("doc_id", "b0", "b1", "b2", "b3", "band.band_id", "band.band_val")
    hamming = sum(
        F.expr(f"bit_count(b{b} ^ c{b})") for b in range(_SIMHASH_BANDS)
    )

    def _sh_flags(index):
        return (
            probes.join(index, ["band_id", "band_val"])
            .filter(hamming <= _HAMMING_MAX)
            .select(
                "doc_id",
                "corpus_doc_id",
                hamming.cast("int").alias("hamming"),
                F.lit(batch_id).alias("batch_id"),
            )
        )

    _write_flags(
        _sh_flags(spark.table(f"{name}_sh_idx"))
        .unionByName(
            _sh_flags(batch_sh_idx).filter(
                F.col("doc_id") > F.col("corpus_doc_id")
            )
        )
        .dropDuplicates(["doc_id", "corpus_doc_id"]),
        f"{name}_sh_flags",
    )
    mh = with_minhash_signature(new)
    batch_mh_idx = minhash_index_rows(new)
    mprobes = (
        mh.select(
            "doc_id",
            *[f"h{i}" for i in range(N_MINHASH)],
            F.explode(minhash_band_structs()).alias("band"),
        )
        .filter(F.col("band.band_hash").isNotNull())
        .select(
            "doc_id",
            *[f"h{i}" for i in range(N_MINHASH)],
            "band.band_id",
            "band.band_hash",
        )
    )
    est = sum(
        F.when(F.col(f"h{i}") == F.col(f"c{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    ) / float(N_MINHASH)

    def _mh_flags(index):
        return (
            mprobes.join(index, ["band_id", "band_hash"])
            .withColumn("est_jaccard", est)
            .filter(F.col("est_jaccard") >= min_est_jaccard)
            .select(
                "doc_id",
                "corpus_doc_id",
                "est_jaccard",
                F.lit(batch_id).alias("batch_id"),
            )
        )

    _write_flags(
        _mh_flags(spark.table(f"{name}_mh_idx"))
        .unionByName(
            _mh_flags(batch_mh_idx).filter(
                F.col("doc_id") > F.col("corpus_doc_id")
            )
        )
        .dropDuplicates(["doc_id", "corpus_doc_id"]),
        f"{name}_mh_flags",
    )
    # --- refresh: admitted docs enter the corpus + both indexes.
    # insertInto routes rows of an existing BUCKETED table through its
    # bucket spec (the ann_index append pattern), so corpus-side joins
    # keep reading co-located buckets after every append; column order
    # matches the create-time order.
    new.select("doc_id", "norm_hash", "event_time").write.mode(
        "append"
    ).insertInto(f"{name}_admitted")
    batch_sh_idx.write.mode("append").insertInto(f"{name}_sh_idx")
    batch_mh_idx.write.mode("append").insertInto(f"{name}_mh_idx")
    # meta: RECOUNT from the admitted table rather than incrementing the
    # previous value — self-healing if an earlier attempt crashed between
    # the appends and this write (an increment would drift under retry)
    n_docs = spark.table(f"{name}_admitted").count()
    meta = spark.table(f"{name}_meta").first()
    spark.createDataFrame(
        [(int(n_docs), int(meta["n_base"]))],
        "n_docs long, n_base long",
    ).write.mode("overwrite").format("parquet").saveAsTable(
        f"{name}_meta"
    )


def start_refreshing_ingest(
    docs: DataFrame,
    name: str,
    checkpoint_dir: str,
    min_est_jaccard: float = 0.5,
    available_now: bool = True,
):
    """Run the admission pass with a SELF-REFRESHING near-dup index.

    Per microbatch (foreachBatch — each batch is a plain DataFrame, so the
    index tables are re-resolved every trigger and appends from batch N are
    visible to batch N+1):

      1. exact dedup: within-batch dropDuplicates(norm_hash) + anti-join
         against ``{name}_admitted`` (the persistent corpus IS the dedup
         state — no watermark horizon, cross-horizon re-arrivals included);
      2. flag admitted docs against the CURRENT SimHash/MinHash band indexes
         (Hamming ≤ 3 resp. est-Jaccard ≥ threshold) AND against each other
         (within-batch pairs, oriented doc_id > corpus_doc_id), logged to a
         batch_id-partitioned table via dynamic partition overwrite
         (idempotent under foreachBatch's at-least-once retries);
      3. append the admitted docs to ``{name}_admitted`` and their band rows
         to both indexes.

    Returns the started StreamingQuery."""

    def _admit(batch: DataFrame, batch_id: int) -> None:
        admit_microbatch(batch, batch_id, name, min_est_jaccard)

    writer = docs.writeStream.foreachBatch(_admit).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ingest_pipeline(
    docs: DataFrame,
    simhash_index: DataFrame | None = None,
    minhash_index: DataFrame | None = None,
    watermark: str = "10 minutes",
    min_est_jaccard: float = 0.5,
) -> dict[str, DataFrame]:
    """The full arrival-time admission pass as ONE source, three sinks.

    Returns {'admitted': ..., 'simhash_flags': ..., 'minhash_flags': ...} —
    all derived from the same ``docs`` relation (batch or stream):

      admitted        first arrival per normalized content hash within the
                      watermark horizon (stream_exact_dedup)
      simhash_flags   admitted docs within Hamming ≤ 3 of a corpus doc
                      (omitted when simhash_index is None)
      minhash_flags   admitted docs with est-Jaccard ≥ threshold vs a corpus
                      doc (omitted when minhash_index is None)

    Flags are emitted as SEPARATE streams rather than columns on the
    admitted stream: folding "any corpus match" into one row per doc would
    need a second stateful aggregation after the stream-static join, whereas
    three independent sinks keep every stage single-state and append-mode —
    the downstream curation job anti-joins the flag tables at its own cadence.
    Each arm's batch==stream parity is pytest-pinned individually; the
    composition adds no new state shape.
    """
    admitted = stream_exact_dedup(docs, watermark=watermark)
    out = {"admitted": admitted}
    # watermark=None: the admitted stream already carries the watermark set
    # by stream_exact_dedup — redefining one downstream is a Spark error
    if simhash_index is not None:
        out["simhash_flags"] = stream_neardup_vs_corpus(
            admitted, simhash_index, watermark=None
        )
    if minhash_index is not None:
        out["minhash_flags"] = stream_minhash_vs_corpus(
            admitted,
            minhash_index,
            min_est_jaccard=min_est_jaccard,
            watermark=None,
        )
    return out


# --- embedding near-dup arm (the third modality next to SimHash/MinHash) -----
#
# Same contract as the text arms: candidates come from a banded equi-join
# against a static index (here the random-hyperplane LSH buckets of
# plans/similarity.py — identical md5-derived planes, so the stream-side
# assignment is bit-equal to the batch `_buckets_spark` one), then the exact
# cosine filters.  The bucket fold below is a PURE PROJECTION (explode over
# tables + a nested aggregate over planes), which is what makes it legal in
# a streaming plan — the batch builder's groupBy-per-(vec, table) form is
# not.  The nested-lambda form loses some codegen (measured ~25% at x20 for
# the batch path, similarity.py note) — accepted on the stream side, where
# per-trigger volume is microbatch-sized.

def _plane_weight_expr(dim: int) -> str:
    """w[j] for (tbl, plane): the single-source-of-truth md5 derivation
    (plans/similarity.py plane_weight_sql) — bit-equal buckets by design."""
    from exstream_implementation_spark.plans.similarity import (
        plane_weight_sql,
    )

    return plane_weight_sql(dim)


def with_lsh_buckets(
    vecs: DataFrame,
    n_planes: int,
    n_tables: int = 4,
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """(input columns..., tbl, bucket) — one row per (vector, table), the
    sign pattern of the vector against each table's hyperplanes packed into
    a long.  Stream-safe: explode + projection, no aggregation state."""
    tables = F.explode(
        F.expr(f"sequence(0, {n_tables - 1})")
    ).alias("tbl")
    bucket = (
        f"aggregate(sequence(0, {n_planes - 1}), cast(0 as bigint),"
        " (acc, plane) -> acc + IF("
        f"aggregate(zip_with({vec_col}, {_plane_weight_expr(dim)},"
        " (x, y) -> cast(x as double) * y), cast(0.0 as double),"
        " (a, v) -> a + v) > 0, shiftleft(1, plane), cast(0 as bigint)))"
    )
    return vecs.select("*", tables).withColumn("bucket", F.expr(bucket))


def embedding_index_rows(
    vecs: DataFrame,
    n_planes: int,
    n_tables: int = 4,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Static LSH index rows for ANY embedding frame: one row per
    (tbl, bucket, corpus doc) carrying the corpus vector for the exact
    re-rank (generic twin of the text arms' corpus_*_index builders)."""
    return with_lsh_buckets(
        vecs.select(
            F.col(id_col).alias("corpus_doc_id"),
            F.col(vec_col).alias("cemb"),
        ),
        n_planes, n_tables, vec_col="cemb", dim=dim,
    ).select("tbl", "bucket", "corpus_doc_id", "cemb")


def stream_embdup_vs_corpus(
    docs: DataFrame,
    index: DataFrame,
    n_planes: int,
    n_tables: int = 4,
    min_cosine: float = 0.9,
    watermark: str | None = "10 minutes",
    vec_col: str = "embedding",
    dim: int = 64,
    multiprobe: bool = True,
) -> DataFrame:
    """Flag arriving docs whose embedding is within cosine >= min_cosine of
    any corpus vector sharing an LSH bucket (docs: doc_id, event_time,
    embedding).  Candidates from the (tbl, bucket) equi-join; exact cosine
    filters; one flag per (doc, corpus doc) within the watermark horizon.

    ``n_planes``/``n_tables`` MUST match the values the index was built
    with — a narrower probe side silently probes a subset of the index's
    tables (recall loss with no error).

    Recall contract: with ``multiprobe=True`` (default) each arriving doc
    probes its own bucket PLUS every Hamming-1 flip per table — the same
    lever that takes the batch ``emb_neardup_lsh`` from exact-bucket
    recall to its pinned >=0.9 (probe volume x(n_planes+1), still a pure
    projection and stream-safe).  ``multiprobe=False`` probes exact
    buckets only: only pairs agreeing on at least one table's FULL sign
    pattern are candidates — cheaper, strictly lower recall."""
    from exstream_implementation_spark.plans.similarity import _cosine_expr

    probes = with_lsh_buckets(
        docs, n_planes, n_tables=n_tables, vec_col=vec_col, dim=dim
    )
    if multiprobe:
        # own bucket (flip = -1 sentinel) + one variant per plane bit
        probes = probes.select(
            "*",
            F.explode(F.expr(f"sequence(-1, {n_planes - 1})")).alias("__flip"),
        ).withColumn(
            "bucket",
            F.when(F.col("__flip") < 0, F.col("bucket")).otherwise(
                F.expr("bucket ^ shiftleft(cast(1 as bigint), __flip)")
            ),
        ).drop("__flip")
    flagged = (
        probes.join(index, ["tbl", "bucket"])
        .filter(F.col("doc_id") != F.col("corpus_doc_id"))
        .withColumn(
            "cosine", F.round(F.expr(_cosine_expr(vec_col, "cemb")), 6)
        )
        .filter(F.col("cosine") >= min_cosine)
        .select("doc_id", "event_time", "corpus_doc_id", "cosine")
    )
    return _dedup_flags(flagged, watermark)
