"""Range-partitioned sorted shard export (operators/sharding.py):
exact deterministic boundaries (layout-independent), contiguous disjoint
key ranges, within-shard sort, one file per shard, hot-key collapse,
manifest validity, and manifest-pruned range reads that equal a full-scan
filter while opening strictly fewer shards."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.operators.sharding import (
    assign_range_shards,
    prune_range_shards,
    range_shard_bounds,
    read_range_shards,
    write_range_shards,
)
from exstream_implementation_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "source"
    )


def test_bounds_exact_and_layout_independent(spark, docs):
    rows = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    n = len(rows)
    for parts in (1, 7):
        got = range_shard_bounds(docs.repartition(parts), "doc_id", 8)
        expect = sorted({rows[-(-n * (i + 1) // 8) - 1] for i in range(7)})
        assert got == expect, (parts, got, expect)


def test_bounds_edge_cases(spark, docs):
    assert range_shard_bounds(docs, "doc_id", 1) == []
    assert range_shard_bounds(docs.limit(0), "doc_id", 4) == []
    with pytest.raises(ValueError, match="n_shards"):
        range_shard_bounds(docs, "doc_id", 0)
    # more shards than distinct keys: bounds collapse to the key set
    tiny = docs.filter(F.col("doc_id") < 3)
    b = range_shard_bounds(tiny, "doc_id", 10)
    assert b == [0, 1] or b == [0, 1, 2][: len(b)]
    assert len(b) <= 3


def test_hot_key_never_splits(spark):
    # one key holds half the corpus: every copy lands in ONE shard
    df = spark.range(0, 400).select(
        F.when(F.col("id") < 200, F.lit(7))
        .otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    bounds = range_shard_bounds(df, "k", 8)
    assigned = assign_range_shards(df, "k", bounds)
    shards_of_7 = (
        assigned.filter(F.col("k") == 7).select("shard").distinct().count()
    )
    assert shards_of_7 == 1
    # disjoint contiguous ranges across shards
    stats = (
        assigned.groupBy("shard")
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .orderBy("shard")
        .collect()
    )
    for a, b in zip(stats, stats[1:]):
        assert a["hi"] < b["lo"]


def test_null_keys_rejected(spark):
    df = spark.range(0, 10).select(
        F.when(F.col("id") == 3, F.lit(None)).otherwise(F.col("id")).alias("k")
    )
    with pytest.raises(ValueError, match="NULL"):
        assign_range_shards(df, "k", [5])


def test_write_layout_manifest_and_pruned_read(spark, docs, tmp_path):
    path = str(tmp_path / "ranged")
    manifest = write_range_shards(docs, path, "doc_id", 8)
    on_disk = json.load(open(os.path.join(path, "_RANGE_MANIFEST.json")))
    assert on_disk == manifest
    shards = manifest["shards"]
    assert sum(s["rows"] for s in shards) == docs.count()
    # contiguous disjoint ranges in shard order
    for a, b in zip(shards, shards[1:]):
        assert a["key_max"] < b["key_min"]
    # one data file per shard directory
    for s in shards:
        files = [
            f
            for f in glob.glob(os.path.join(path, f"shard={s['shard']}", "*"))
            if not os.path.basename(f).startswith(("_", "."))
        ]
        assert len(files) == 1, files
    # within-shard sorted by key (read preserves row-group order per file)
    one = spark.read.parquet(os.path.join(path, "shard=0"))
    ids = [r["doc_id"] for r in one.select("doc_id").collect()]
    assert ids == sorted(ids)
    # pruned read == full filter, touching fewer shards
    lo, hi = 100, 180
    keep = prune_range_shards(path, lo, hi)
    assert 0 < len(keep) < len(shards)
    got = sorted(
        r["doc_id"]
        for r in read_range_shards(spark, path, lo, hi)
        .select("doc_id")
        .collect()
    )
    expect = sorted(
        r["doc_id"]
        for r in docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") <= hi)
        )
        .select("doc_id")
        .collect()
    )
    assert got == expect
    # unbounded read returns everything
    assert read_range_shards(spark, path).count() == docs.count()
    # disjoint range prunes everything and returns no rows
    assert prune_range_shards(path, 10_000, 20_000) == []
    assert read_range_shards(spark, path, 10_000, 20_000).count() == 0


def test_write_empty_input_keeps_root_readable(spark, docs, tmp_path):
    path = str(tmp_path / "empty")
    manifest = write_range_shards(docs.limit(0), path, "doc_id", 4)
    assert manifest["shards"] == []
    back = spark.read.option("basePath", path).parquet(
        os.path.join(path, "shard=*")
    )
    assert back.count() == 0
    assert "text" in back.columns


def test_json_empty_export_and_pruned_read(spark, docs, tmp_path):
    # JSON shards: empty export and pruned-to-nothing reads must come back
    # typed from the manifest schema (empty JSON files carry no schema)
    path = str(tmp_path / "json_empty")
    manifest = write_range_shards(docs.limit(0), path, "doc_id", 4, fmt="json")
    assert manifest["shards"] == []
    back = read_range_shards(spark, path)
    assert back.count() == 0
    assert "text" in back.columns and "shard" in back.columns
    assert dict(back.dtypes)["doc_id"] == "bigint"

    # non-empty JSON export: pruned read equals a full filter, and a
    # range that prunes every shard still returns a typed empty frame
    path2 = str(tmp_path / "json_full")
    write_range_shards(docs, path2, "doc_id", 4, fmt="json")
    got = sorted(
        r["doc_id"]
        for r in read_range_shards(spark, path2, 50, 90)
        .select("doc_id")
        .collect()
    )
    expect = sorted(
        r["doc_id"]
        for r in docs.filter(
            (F.col("doc_id") >= 50) & (F.col("doc_id") <= 90)
        )
        .select("doc_id")
        .collect()
    )
    assert got == expect
    nothing = read_range_shards(spark, path2, 10_000, 20_000)
    assert nothing.count() == 0
    assert "text" in nothing.columns


def test_string_keys(spark, docs, tmp_path):
    path = str(tmp_path / "by_source")
    write_range_shards(docs, path, "source", 4)
    got = sorted(
        r["doc_id"]
        for r in read_range_shards(spark, path, "src10", "src3")
        .select("doc_id")
        .collect()
    )
    expect = sorted(
        r["doc_id"]
        for r in docs.filter(
            (F.col("source") >= "src10") & (F.col("source") <= "src3")
        )
        .select("doc_id")
        .collect()
    )
    assert got == expect
