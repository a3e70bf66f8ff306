"""Versioned snapshots + MERGE upsert (operators/snapshots.py): pointer
semantics, time travel, crash-orphan isolation, merge insert/update/delete,
duplicate-key rejection, and vacuum retention."""

import os

import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.operators.snapshots import (
    current_version,
    list_versions,
    merge_upsert,
    publish_snapshot,
    read_latest,
    read_version,
    vacuum,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_publish_read_time_travel(spark, tmp_path):
    root = str(tmp_path / "tbl")
    v1 = publish_snapshot(_df(spark, [(1, "a"), (2, "b")]), root)
    v2 = publish_snapshot(_df(spark, [(1, "a2")]), root)
    assert (v1, v2) == (1, 2)
    assert current_version(root) == 2
    assert {(r["k"], r["v"]) for r in read_latest(spark, root).collect()} == {
        (1, "a2")
    }
    assert {(r["k"], r["v"]) for r in read_version(spark, root, 1).collect()} == {
        (1, "a"),
        (2, "b"),
    }


def test_crash_orphan_is_not_current(spark, tmp_path):
    """A version directory without a pointer swap (crashed publish) is
    invisible to readers and superseded by the next publish."""
    root = str(tmp_path / "tbl")
    publish_snapshot(_df(spark, [(1, "a")]), root)
    # simulate a crash: directory exists, pointer never swapped
    _df(spark, [(9, "torn")]).write.parquet(os.path.join(root, "v=000002"))
    assert current_version(root) == 1
    assert read_latest(spark, root).count() == 1
    v3 = publish_snapshot(_df(spark, [(1, "b")]), root)
    assert v3 == 3  # never reuses the orphan's number
    assert {r["v"] for r in read_latest(spark, root).collect()} == {"b"}


def test_merge_upsert_semantics(spark, tmp_path):
    root = str(tmp_path / "tbl")
    publish_snapshot(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), root)
    updates = spark.createDataFrame(
        [(2, "B", False), (4, "d", False), (3, None, True)],
        "k long, v string, deleted boolean",
    )
    v = merge_upsert(spark, root, updates, ["k"], delete_col="deleted")
    assert v == 2
    got = {(r["k"], r["v"]) for r in read_latest(spark, root).collect()}
    assert got == {(1, "a"), (2, "B"), (4, "d")}  # 3 deleted
    # no tombstone column: plain upsert
    v = merge_upsert(spark, root, _df(spark, [(1, "A"), (5, "e")]), ["k"])
    got = {(r["k"], r["v"]) for r in read_latest(spark, root).collect()}
    assert got == {(1, "A"), (2, "B"), (4, "d"), (5, "e")}
    assert v == 3


def test_merge_rejects_duplicate_update_keys(spark, tmp_path):
    root = str(tmp_path / "tbl")
    publish_snapshot(_df(spark, [(1, "a")]), root)
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_upsert(spark, root, _df(spark, [(2, "x"), (2, "y")]), ["k"])
    with pytest.raises(ValueError, match="key_cols"):
        merge_upsert(spark, root, _df(spark, [(2, "x")]), [])


def test_vacuum_keeps_window_and_current(spark, tmp_path):
    root = str(tmp_path / "tbl")
    for i in range(5):
        publish_snapshot(_df(spark, [(i, "x")]), root)
    removed = vacuum(root, keep=2)
    assert removed == [1, 2, 3]
    assert list_versions(root) == [4, 5]
    assert current_version(root) == 5
    assert read_version(spark, root, 4).count() == 1
    with pytest.raises(ValueError, match="keep"):
        vacuum(root, keep=0)


def test_read_before_first_publish_fails(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="no committed snapshot"):
        read_latest(spark, str(tmp_path / "none"))

def test_compact_snapshot(spark, tmp_path):
    from exstream_implementation_spark.operators.snapshots import (
        compact_snapshot,
    )

    root = str(tmp_path / "tbl")
    # publish with many tiny files
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    publish_snapshot(df.repartition(64), root)
    import glob

    files_before = glob.glob(os.path.join(root, "v=000001", "*.parquet"))
    assert len(files_before) == 64
    v, n_parts = compact_snapshot(spark, root, target_bytes=10**9)
    assert v == 2 and n_parts == 1
    files_after = glob.glob(os.path.join(root, "v=000002", "*.parquet"))
    assert len(files_after) == 1
    # content identical, old layout still time-travelable
    a = {r["id"] for r in read_latest(spark, root).collect()}
    b = {r["id"] for r in read_version(spark, root, 1).collect()}
    assert a == b and len(a) == 10_000
    with pytest.raises(ValueError, match="target_bytes"):
        compact_snapshot(spark, root, target_bytes=0)
    # a mid-range target lands between 1 and the original file count
    _, n2 = compact_snapshot(spark, root, target_bytes=40_000)
    assert 1 < n2 < 64


def test_latest_per_key_and_upsert_writer(spark, tmp_path):
    from exstream_implementation_spark.operators.snapshots import (
        latest_per_key,
        upsert_batch_writer,
    )

    root = str(tmp_path / "cdc")
    apply = upsert_batch_writer(
        spark, root, ["k"], seq_col="seq", delete_col="deleted"
    )
    schema = "k long, v string, seq long, deleted boolean"
    # batch 0 bootstraps; key 1 appears twice — newest (seq 2) wins
    apply(
        spark.createDataFrame(
            [(1, "a", 1, False), (1, "a2", 2, False), (2, "b", 1, False)],
            schema,
        ),
        0,
    )
    got = {(r["k"], r["v"]) for r in read_latest(spark, root).collect()}
    assert got == {(1, "a2"), (2, "b")}
    # batch 1: update 2, insert 3, delete 1 (delete is the key's newest)
    b1 = spark.createDataFrame(
        [(2, "B", 3, False), (3, "c", 3, False),
         (1, "x", 3, False), (1, None, 4, True)],
        schema,
    )
    apply(b1, 1)
    got = {(r["k"], r["v"]) for r in read_latest(spark, root).collect()}
    assert got == {(2, "B"), (3, "c")}
    # at-least-once: redelivering batch 1 converges to the same state
    apply(b1, 1)
    again = {(r["k"], r["v"]) for r in read_latest(spark, root).collect()}
    assert again == got
    # latest_per_key standalone: deterministic on seq ties
    tied = spark.createDataFrame(
        [(1, "p", 5, False), (1, "q", 5, False)], schema
    )
    top = latest_per_key(tied, ["k"], "seq").collect()
    assert len(top) == 1 and top[0]["v"] == "q"  # desc tie-break


def test_upsert_writer_through_real_stream(spark, tmp_path):
    """End-to-end Structured Streaming: a file-source CDC stream through
    foreachBatch(upsert_batch_writer) converges to the same state as one
    batch MERGE of the collapsed updates."""
    from exstream_implementation_spark.operators.snapshots import (
        latest_per_key,
        upsert_batch_writer,
    )

    root = str(tmp_path / "cdc_stream")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    schema = "k long, v string, seq long, deleted boolean"
    updates = [
        (1, "a", 1, False), (2, "b", 1, False),
        (1, "a2", 2, False), (3, "c", 2, False),
        (2, None, 3, True), (4, "d", 3, False),
    ]
    spark.createDataFrame(updates, schema).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(
            upsert_batch_writer(
                spark, root, ["k"], seq_col="seq", delete_col="deleted"
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["k"], r["v"]) for r in read_latest(spark, root).collect()}
    # reference: one-shot collapse of the full update log
    ref_rows = latest_per_key(
        spark.createDataFrame(updates, schema), ["k"], "seq"
    ).collect()
    want = {(r["k"], r["v"]) for r in ref_rows if not r["deleted"]}
    assert got == want == {(1, "a2"), (3, "c"), (4, "d")}


def test_snapshot_diff_classifies_changes(spark, tmp_path):
    from exstream_implementation_spark.operators.snapshots import (
        publish_snapshot,
        snapshot_diff,
    )

    root = str(tmp_path / "diffsnap")
    v1 = publish_snapshot(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
            "k long, txt string, val long",
        ),
        root,
    )
    v2 = publish_snapshot(
        spark.createDataFrame(
            # 1 unchanged, 2 value change, 3 removed, 4 NULL->value flip,
            # 5 added
            [(1, "a", 10), (2, "B", 20), (4, "now", 40), (5, "e", 50)],
            "k long, txt string, val long",
        ),
        root,
    )
    got = {
        r["k"]: r["change"]
        for r in snapshot_diff(spark, root, v1, v2, ["k"]).collect()
    }
    assert got == {2: "changed", 3: "removed", 4: "changed", 5: "added"}
    # compare_cols narrows the fingerprint: on val alone nothing changed
    # for keys present in both versions
    narrowed = {
        r["k"]: r["change"]
        for r in snapshot_diff(
            spark, root, v1, v2, ["k"], compare_cols=["val"]
        ).collect()
    }
    assert narrowed == {3: "removed", 5: "added"}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="absent"):
        snapshot_diff(spark, root, v1, v2, ["k"], compare_cols=["nope"])


def test_snapshot_diff_null_keys_match_null_safely(spark, tmp_path):
    from exstream_implementation_spark.operators.snapshots import (
        publish_snapshot,
        snapshot_diff,
    )

    root = str(tmp_path / "nullsnap")
    v1 = publish_snapshot(
        spark.createDataFrame(
            [(None, "same"), (1, "x")], "k long, txt string"
        ),
        root,
    )
    v2 = publish_snapshot(
        spark.createDataFrame(
            [(None, "same"), (1, "y")], "k long, txt string"
        ),
        root,
    )
    got = [(r["k"], r["change"]) for r in snapshot_diff(spark, root, v1, v2, ["k"]).collect()]
    # the unchanged NULL-keyed row is NOT misreported as removed+added
    assert got == [(1, "changed")]
