"""Deterministic shuffle-shard export — the training pipeline's last mile.

Not in the reference (a numeric-trace anomaly engine; reference core
script_1.py / exstream_lib.py never writes corpora) — this is the step a
training-data pipeline runs after curation/dedup/packing: a GLOBAL
pseudo-random shuffle of the corpus into N equal-ish shards, such that

  * the permutation is DETERMINISTIC in (data, seed) — re-running the
    export reproduces byte-identical shard membership and order, so a
    training run can be resumed/audited, and a different ``seed`` gives an
    independent epoch permutation;
  * no global sort: rows hash to a shard (one all-to-all shuffle, the
    unavoidable one for a global shuffle) and only sort WITHIN their shard
    (spillable, per-partition) — a total order across 100 TB is never
    materialized;
  * balance is hash-uniform: shard sizes concentrate around rows/N with
    multiplicative Chernoff deviation, no planning pass needed.

The position key is ``xxhash64(key, seed)`` — a keyed hash, not rand():
Spark's rand() is seeded per-partition, so its "shuffle" changes with the
input partitioning; a keyed hash depends only on row identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# distinct salts so the shard assignment and the within-shard order are
# independent hash draws (otherwise shard i would hold a contiguous hash
# range and within-shard order would correlate with assignment)
_SHARD_SALT = 0x511AD
_ORDER_SALT = 0x0BDE5


def assign_shards(
    df: DataFrame, key_col: str, n_shards: int, seed: int = 0
) -> DataFrame:
    """Add ``shard`` (int, 0..n_shards-1) and ``pos`` (long) columns.

    ``key_col`` must identify a row (post-dedup corpora: doc_id).  Rows
    with equal keys co-locate — harmless after dedup, and it keeps the
    permutation a pure function of row identity.
    """
    h = lambda salt: F.xxhash64(  # noqa: E731
        F.col(key_col), F.lit(int(seed)), F.lit(salt)
    )
    return df.withColumn(
        "shard", F.pmod(h(_SHARD_SALT), F.lit(n_shards)).cast("int")
    ).withColumn("pos", h(_ORDER_SALT))


def shuffle_shard(
    df: DataFrame, key_col: str, n_shards: int, seed: int = 0
) -> DataFrame:
    """Globally shuffled frame, physically partitioned one-shard-per-
    partition with rows in final within-shard order.  Writing it with any
    per-partition writer yields one file per shard."""
    return (
        assign_shards(df, key_col, n_shards, seed)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos", key_col)
    )


def write_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    seed: int = 0,
    fmt: str = "parquet",
) -> None:
    """Export the shuffled corpus as ``path/shard=i/`` — exactly ONE data
    file per shard.

    ``repartition(n, "shard")`` alone cannot promise one file per shard
    (it hash-partitions the shard VALUE, and two values can collide into
    one task, leaving another empty); writing ``partitionBy("shard")`` on
    top of it can: each shard value lives in exactly one task, and each
    task emits one file per shard value it holds.

    ``fmt``: "parquet" or "json" (JSONL — one object per line, the
    interchange format most training loaders read).  ``pos`` is kept in
    the rows and ``shard`` in the directory name, so every row's placement
    is auditable and a resumed export trivially verifiable.
    """
    if fmt not in ("parquet", "json"):
        raise ValueError(f"unsupported shard format: {fmt}")
    shuffled = shuffle_shard(df, key_col, n_shards, seed)
    shuffled.write.mode("overwrite").format(fmt).partitionBy("shard").save(path)


def shard_balance(df_sharded: DataFrame) -> DataFrame:
    """Rows per shard — one map-side-combined aggregate, for balance
    monitoring/alerting at export time."""
    return df_sharded.groupBy("shard").agg(F.count("*").alias("rows"))
