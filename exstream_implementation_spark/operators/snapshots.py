"""Versioned dataset publishing and MERGE upsert over plain parquet — the
Delta-lite the pipeline's sinks need without a table-format dependency.

Not in the reference (it writes flat CSV once).  At 100 TB the failure
mode of `df.write.mode("overwrite")` is a reader racing the overwrite and
seeing a half-deleted directory; the standard fix is immutable version
directories plus an atomic pointer commit:

  publish   each publish writes a NEW directory root/v=NNNNNN/ (never
            touches a live one), then commits by atomically replacing the
            tiny root/_LATEST pointer file.  A crash mid-write leaves an
            orphan version directory — never a torn table; readers that
            loaded the pointer before the swap keep reading their (still
            intact) old version.  Pointer replace is os.replace here
            (POSIX-atomic); on HDFS it maps to FileSystem.rename, on S3
            to a single PUT — all atomic at the pointer granularity.
  read      read_latest resolves the pointer, then loads that immutable
            directory — time travel is read_version(n).
  merge     merge_upsert is the MERGE INTO shape: matched target rows are
            replaced, unmatched update rows inserted, tombstoned keys
            deleted — ONE left-anti join (target shuffles by key once)
            plus a union, then a publish.  The update side is usually
            CDC-sized: broadcast-able, so at scale the anti-join is a
            broadcast join and the target never shuffles at all (Spark's
            planner makes that call; AQE converts post-shuffle when the
            updates side turns out small).
  vacuum    deletes versions older than the last `keep`, never the one
            the pointer names — bounded storage with a time-travel window.

Local-FS implementation (the test/driver environment); the commit protocol
(immutable dirs + atomic pointer) is what transfers to HDFS/S3, not the
os calls.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

_POINTER = "_LATEST"


def _vdir(root: str, v: int) -> str:
    return os.path.join(root, f"v={v:06d}")


def list_versions(root: str) -> list:
    """Sorted version numbers present under root (orphans included)."""
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        if name.startswith("v=") and name[2:].isdigit():
            out.append(int(name[2:]))
    return sorted(out)


def current_version(root: str) -> int | None:
    """The committed version (pointer contents), or None before the first
    publish.  Orphan directories above it are NOT current — they are
    crashed writes awaiting vacuum."""
    p = os.path.join(root, _POINTER)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return int(fh.read().strip())


def publish_snapshot(df: DataFrame, root: str) -> int:
    """Write df as the next immutable version and commit the pointer.
    Returns the committed version number."""
    os.makedirs(root, exist_ok=True)
    versions = list_versions(root)
    v = (versions[-1] if versions else 0) + 1
    df.write.mode("errorifexists").parquet(_vdir(root, v))
    tmp = os.path.join(root, f".{_POINTER}.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(v))
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(root, _POINTER))  # the atomic commit
    return v


def read_version(spark: SparkSession, root: str, v: int) -> DataFrame:
    return spark.read.parquet(_vdir(root, v))


def read_latest(spark: SparkSession, root: str) -> DataFrame:
    v = current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed snapshot under {root}")
    return read_version(spark, root, v)


def merge_upsert(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    key_cols: list,
    delete_col: str | None = None,
) -> int:
    """MERGE the updates frame into the latest snapshot and publish.

    Semantics (keys = key_cols tuples):
      matched   target row replaced by the update row
      unmatched update row inserted
      deletes   update rows with delete_col true remove the key and are
                not inserted (delete_col is dropped from the output)
    Updates must be unique per key — duplicate update keys are rejected
    (one aggregate) rather than silently multiplied.
    """
    if not key_cols:
        raise ValueError("merge_upsert: key_cols must be non-empty")
    target = read_latest(spark, root)
    dup = (
        updates.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError("merge_upsert: updates contain duplicate keys")
    if delete_col is not None:
        keep_updates = updates.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
        remove_keys = updates.select(*key_cols)  # upserted keys re-inserted
    else:
        keep_updates = updates
        remove_keys = updates.select(*key_cols)
    merged = target.join(remove_keys, key_cols, "left_anti").unionByName(
        keep_updates.select(target.columns)
    )
    return publish_snapshot(merged, root)


def compact_snapshot(
    spark: SparkSession,
    root: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> tuple:
    """Rewrite the latest version into ~target_bytes files and publish.

    The small-files problem: a streaming ingest or a 10k-task job leaves
    thousands of KB-sized parquet files, and every later scan pays one
    task + one footer read per file.  Compaction = read latest, coalesce
    to ceil(bytes / target) partitions, publish as a NEW version (readers
    never see a half-compacted directory; time travel keeps the old
    layout until vacuum).

    coalesce(), not repartition(): compaction must not pay a shuffle —
    it only merges existing partitions.  Returns (new_version, n_files).
    """
    if target_bytes <= 0:
        raise ValueError("compact_snapshot: target_bytes must be > 0")
    v = current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed snapshot under {root}")
    vdir = _vdir(root, v)
    total = 0
    for dirpath, _dirs, files in os.walk(vdir):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(dirpath, f))
    n_parts = max(1, -(-total // target_bytes))  # ceil
    df = spark.read.parquet(vdir).coalesce(int(n_parts))
    new_v = publish_snapshot(df, root)
    return new_v, int(n_parts)


def latest_per_key(
    updates: DataFrame, key_cols: list, seq_col: str
) -> DataFrame:
    """Collapse a CDC batch to its newest row per key (highest seq_col,
    ties broken deterministically by preferring the row that sorts last
    over all columns).  A microbatch routinely carries several updates
    for one key; MERGE needs exactly one."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(seq_col), *[F.desc(c) for c in updates.columns
                           if c not in key_cols and c != seq_col]
    )
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_batch_writer(
    spark: SparkSession,
    root: str,
    key_cols: list,
    seq_col: str | None = None,
    delete_col: str | None = None,
):
    """foreachBatch sink: maintain a versioned snapshot from a CDC stream.

    Returns ``apply(batch_df, batch_id)`` for
    ``writeStream.foreachBatch(...)``.  Each microbatch is collapsed to
    one row per key (when seq_col names the CDC ordering column), then
    MERGEd into the latest snapshot; the first batch bootstraps the
    table.  At-least-once safety: re-delivering a batch re-merges the
    same rows, and upsert is idempotent in its input, so a retried batch
    converges to the same state (it does publish an extra version —
    versions are lineage, vacuum bounds them).
    """

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        up = (
            latest_per_key(batch_df, key_cols, seq_col)
            if seq_col is not None
            else batch_df
        )
        if current_version(root) is None:
            if delete_col is not None:
                up = up.filter(
                    ~F.coalesce(F.col(delete_col), F.lit(False))
                ).drop(delete_col)
            publish_snapshot(up, root)
        else:
            merge_upsert(spark, root, up, key_cols, delete_col=delete_col)

    return apply


def vacuum(root: str, keep: int = 2) -> list:
    """Delete all but the newest `keep` versions; the committed version is
    always retained.  Returns the versions removed."""
    if keep < 1:
        raise ValueError("vacuum: keep must be >= 1")
    cur = current_version(root)
    versions = list_versions(root)
    survivors = set(versions[-keep:])
    if cur is not None:
        survivors.add(cur)
    removed = []
    for v in versions:
        if v not in survivors:
            shutil.rmtree(_vdir(root, v))
            removed.append(v)
    return removed


def snapshot_diff(
    spark: SparkSession,
    root: str,
    v_old: int,
    v_new: int,
    key_cols: list,
    compare_cols: list | None = None,
) -> DataFrame:
    """Row-level diff between two committed versions: one row per key
    whose state changed, with ``change`` in {'added', 'removed',
    'changed'} — the incremental-processing primitive ("which docs do I
    re-embed / re-index after this publish?") that turns the version
    history into change feeds without any writer-side bookkeeping.

    Unchanged keys are omitted.  ``compare_cols`` defaults to every
    non-key column shared by both versions; comparison is null-safe
    (a NULL→value flip is 'changed').  Cost: each side shuffles by key
    once into a full-outer join — no corpus-sized state beyond that, and
    when one version is CDC-small AQE broadcasts it.
    """
    old = read_version(spark, root, v_old)
    new = read_version(spark, root, v_new)
    key_cols = list(key_cols)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    missing = [
        c
        for c in key_cols + list(compare_cols)
        if c not in old.columns or c not in new.columns
    ]
    if missing:
        raise ValueError(
            f"snapshot_diff: column(s) {missing} absent from v{v_old} or "
            f"v{v_new}"
        )

    def fingerprint(df):
        # null-safe content hash: hash(col) alone maps NULL and some
        # values together across columns, so include an is-null marker
        parts = []
        for c in compare_cols:
            parts += [F.col(c).isNull().cast("int"), F.col(c)]
        fp = F.xxhash64(*parts) if parts else F.lit(0)
        return df.select(*key_cols, fp.alias("__fp"))

    o = fingerprint(old).withColumnRenamed("__fp", "__fp_old").alias("__o")
    n = fingerprint(new).withColumnRenamed("__fp", "__fp_new").alias("__n")
    # null-SAFE key match: a plain equi-join can never match a NULL key,
    # which would misreport an unchanged NULL-keyed row as removed+added
    cond = F.lit(True)
    for c in key_cols:
        cond = cond & F.col(f"__o.{c}").eqNullSafe(F.col(f"__n.{c}"))
    joined = o.join(n, cond, "full_outer")
    keys_out = [
        F.coalesce(F.col(f"__o.{c}"), F.col(f"__n.{c}")).alias(c)
        for c in key_cols
    ]
    return (
        joined.withColumn(
            "change",
            F.when(F.col("__fp_old").isNull(), F.lit("added"))
            .when(F.col("__fp_new").isNull(), F.lit("removed"))
            .when(F.col("__fp_old") != F.col("__fp_new"), F.lit("changed"))
            .otherwise(F.lit(None)),
        )
        .filter(F.col("change").isNotNull())
        .select(*keys_out, "change")
    )
