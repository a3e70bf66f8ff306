"""Deterministic shuffle-shard export (operators/sharding.py): exactness
(every row exactly once), determinism in (data, seed), seed independence,
hash balance, within-shard order stability under input repartitioning, and
the on-disk parquet/JSONL layout (one file per shard)."""

import glob
import os

import pytest

from exstream_implementation_spark.operators.sharding import (
    assign_shards,
    shard_balance,
    shuffle_shard,
    write_shards,
)
from exstream_implementation_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


def _perm(df_sharded):
    """[(shard, pos, doc_id)] in final order — the permutation fingerprint."""
    return sorted(
        (r["shard"], r["pos"], r["doc_id"])
        for r in df_sharded.select("shard", "pos", "doc_id").collect()
    )


def test_every_row_exactly_once_and_balanced(spark, docs):
    n = docs.count()
    sharded = shuffle_shard(docs, "doc_id", 8, seed=1)
    assert sharded.count() == n
    assert sharded.select("doc_id").distinct().count() == n
    sizes = {r["shard"]: r["rows"] for r in shard_balance(sharded).collect()}
    assert set(sizes) == set(range(8))
    # hash balance: every shard within 3x of fair share (500 rows / 8)
    fair = n / 8
    assert all(fair / 3 <= s <= fair * 3 for s in sizes.values()), sizes


def test_deterministic_and_input_partitioning_invariant(spark, docs):
    a = _perm(shuffle_shard(docs, "doc_id", 8, seed=7))
    b = _perm(shuffle_shard(docs, "doc_id", 8, seed=7))
    assert a == b
    # same data arriving in a different physical layout: identical shuffle
    c = _perm(shuffle_shard(docs.repartition(13), "doc_id", 8, seed=7))
    assert a == c


def test_different_seed_gives_different_permutation(spark, docs):
    a = _perm(shuffle_shard(docs, "doc_id", 8, seed=7))
    b = _perm(shuffle_shard(docs, "doc_id", 8, seed=8))
    assert {d for _, _, d in a} == {d for _, _, d in b}
    assert a != b
    # and assignments actually move: most docs land on a new shard
    moved = sum(
        1
        for (sa, _, da), (sb, _, db) in zip(
            sorted(a, key=lambda t: t[2]), sorted(b, key=lambda t: t[2])
        )
        if da == db and sa != sb
    )
    assert moved > len(a) // 2


def test_shard_and_order_hashes_are_independent(spark, docs):
    """Within one shard, positions must span the full hash range rather
    than the shard's own residue class (distinct salts)."""
    rows = assign_shards(docs, "doc_id", 4, seed=3).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    # if salts collided, pos % 4 would be constant per shard
    for shard, poss in by_shard.items():
        assert len({p % 4 for p in poss}) > 1, shard


def test_written_layout_one_file_per_shard(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    write_shards(docs, out, "doc_id", n_shards=4, seed=5)
    shard_dirs = sorted(glob.glob(os.path.join(out, "shard=*")))
    assert [os.path.basename(d) for d in shard_dirs] == [
        f"shard={i}" for i in range(4)
    ]
    for d in shard_dirs:
        files = [
            f
            for f in os.listdir(d)
            if f.endswith(".parquet") and not f.startswith(".")
        ]
        assert len(files) == 1, (d, files)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()

    jout = str(tmp_path / "shards_jsonl")
    write_shards(docs, jout, "doc_id", n_shards=4, seed=5, fmt="json")
    jback = spark.read.json(jout)
    assert jback.count() == docs.count()
    with pytest.raises(ValueError):
        write_shards(docs, jout, "doc_id", n_shards=4, fmt="csvx")
