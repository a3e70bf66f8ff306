"""Source/sink coverage (SURVEY §2.1 rows 1-2): CSV trace+labels scan with the
reference's layout (first unnamed column = index), and result sinks round-trip
through both parquet and CSV (arrays JSON-encoded for CSV, as the reference's
list-repr columns are)."""

import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.sources import (
    read_labels_csv,
    read_trace_csv,
    write_results,
)


@pytest.fixture()
def csv_fixture(tmp_path):
    trace = tmp_path / "1_1.csv"
    trace.write_text(
        ",m_cpu,m_heap\n0,1.5,100\n1,2.5,200\n2,3.5,300\n"
    )
    labels = tmp_path / "labels.csv"
    labels.write_text(
        ",trace_id,ano_id,ano_type,ref_start,ref_end,ano_start,ano_end\n"
        "0,1_1,1,bursty input,0,2,2,2\n"
    )
    return str(trace), str(labels)


def test_read_trace_csv(spark, csv_fixture):
    trace_path, _ = csv_fixture
    df = read_trace_csv(spark, trace_path, trace_id="1_1")
    rows = df.orderBy("timestamp").collect()
    assert [r["timestamp"] for r in rows] == [0, 1, 2]
    assert rows[0]["m_cpu"] == 1.5 and rows[2]["m_heap"] == 300.0
    assert all(r["trace_id"] == "1_1" for r in rows)
    assert dict(df.dtypes)["m_heap"] == "double"


def test_read_labels_csv(spark, csv_fixture):
    _, labels_path = csv_fixture
    df = read_labels_csv(spark, labels_path)
    row = df.first()
    assert row["label_row"] == 0 and row["trace_id"] == "1_1"
    assert (row["ref_start"], row["ref_end"]) == (0, 2)
    assert (row["ano_start"], row["ano_end"]) == (2, 2)


def test_write_results_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("1_1", 1, [2, 4], 2), ("1_2", 2, [0], 1)],
        "trace_id string, ano_id int, explanation array<int>, exp_size int",
    )
    pq = str(tmp_path / "out_parquet")
    write_results(df, pq, fmt="parquet", partition_by=["trace_id"])
    back = spark.read.parquet(pq)
    assert back.count() == 2
    assert sorted(r["explanation"] for r in back.collect()) == [[0], [2, 4]]

    cs = str(tmp_path / "out_csv")
    write_results(df, cs, fmt="csv")
    back_csv = spark.read.option("header", True).csv(cs)
    got = {r["trace_id"]: r["explanation"] for r in back_csv.collect()}
    assert got["1_1"] == "[2,4]"  # arrays JSON-encoded for the flat format


def test_write_results_jsonl_roundtrip(spark, tmp_path):
    """JSONL (spark json = one object per line) — the training-data
    interchange format; arrays survive natively."""
    df = spark.createDataFrame(
        [("t1", 1, [2, 6, 0]), ("t2", 2, [1])],
        "trace_id string, ano_id int, explanation array<int>",
    )
    path = str(tmp_path / "out_jsonl")
    write_results(df, path, fmt="json")
    back = spark.read.schema(df.schema).json(path)
    got = {
        (r["trace_id"], r["ano_id"], tuple(r["explanation"]))
        for r in back.collect()
    }
    assert got == {("t1", 1, (2, 6, 0)), ("t2", 2, (1,))}


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    """Partitioned result layout must let a reader skip partitions: the scan
    of one trace_id reads only that directory (PartitionFilters, not a full
    scan + filter) — the property that makes 100 TB outputs re-queryable."""
    df = spark.createDataFrame(
        [("t%d" % (i % 5), i, float(i)) for i in range(100)],
        "trace_id string, ano_id int, score double",
    )
    path = str(tmp_path / "out_part")
    write_results(df, path, fmt="parquet", partition_by=["trace_id"])
    back = spark.read.parquet(path).filter(F.col("trace_id") == "t3")
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = back._jdf.queryExecution().explainString(jmode)
    assert "PartitionFilters" in plan and "t3" in plan
    assert back.count() == 20


def test_cli_grid_reference_layout(spark, tmp_path):
    """python -m exstream_implementation_spark runs the script_1.py 2x2 grid
    over the reference's on-disk layout and writes the four result tables."""
    import random

    from exstream_implementation_spark.__main__ import main

    random.seed(7)
    data = tmp_path / "data"
    data.mkdir()
    lines = [",m_cpu,m_heap"]
    for t in range(60):
        base = 5.0 if 30 <= t <= 45 else 1.0
        lines.append(f"{t},{base + random.random():.3f},{100.0:.3f}")
    (data / "1_1.csv").write_text("\n".join(lines) + "\n")
    (data / "labels.csv").write_text(
        ",trace_id,ano_id,ano_type,ref_start,ref_end,ano_start,ano_end\n"
        "0,1_1,1,bursty input,0,30,30,45\n"
    )
    out = tmp_path / "results"
    rc = main(
        [
            "--data-folder", str(data),
            "--out-dir", str(out),
            "--instability-runs", "2",
            "--fmt", "csv",
        ]
    )
    assert rc == 0
    for name in (
        "explanations", "explanations_cluster",
        "explanations_fpf", "explanations_cluster_fpf",
    ):
        back = spark.read.option("header", True).csv(str(out / name))
        rows = back.collect()
        assert len(rows) == 1
        assert rows[0]["trace_id"] == "1_1"


def test_load_table_ts_encoding_agnostic(spark, tmp_path):
    """The driver has regenerated events.parquet with different ts encodings
    across rounds (TIMESTAMP(NANOS)-as-long, then timestamp[us]); load_table
    must derive the same ts_sec from both so a future regeneration can't
    silently break every events query again."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from exstream_implementation_spark.sources.tables import load_table

    secs = [1704067200, 1704070800, 1704074400]  # 2024-01-01T00/01/02:00Z
    base = {
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([10, 20, 30], pa.int64()),
        "event_type": pa.array(["click", "view", "click"]),
        "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        "props": pa.array(["{}", "{}", "{}"]),
    }
    for sub, ts_arr in [
        ("us", pa.array([s * 1_000_000 for s in secs], pa.timestamp("us"))),
        ("ns", pa.array([s * 1_000_000_000 for s in secs], pa.timestamp("ns"))),
    ]:
        d = tmp_path / sub
        d.mkdir()
        pq.write_table(
            pa.table({"event_id": base["event_id"], "ts": ts_arr, **{
                k: v for k, v in base.items() if k != "event_id"
            }}),
            str(d / "events.parquet"),
        )

    got_us = {
        r["event_id"]: r["ts_sec"]
        for r in load_table(spark, str(tmp_path / "us"), "events").collect()
    }
    got_ns = {
        r["event_id"]: r["ts_sec"]
        for r in load_table(spark, str(tmp_path / "ns"), "events").collect()
    }
    assert got_us == got_ns == {1: secs[0], 2: secs[1], 3: secs[2]}


def test_read_trace_csv_float_formatted_index(spark, tmp_path):
    """A pandas float index renders as "0.0","1.0",... — ANSI mode
    hard-fails a direct string→long cast on those, so the reader must cast
    through double (matching the old inferSchema behavior)."""
    p = tmp_path / "2_1.csv"
    p.write_text(",m_a\n0.0,1.5\n1.0,2.5\n2.0,3.5\n")
    df = read_trace_csv(spark, str(p), trace_id="2_1")
    rows = df.orderBy("timestamp").collect()
    assert [r["timestamp"] for r in rows] == [0, 1, 2]
    assert dict(df.dtypes)["timestamp"] == "bigint"


def test_write_results_orc_roundtrip(spark, tmp_path):
    """ORC — the other columnar lakehouse format Spark supports natively;
    arrays survive, and predicate pushdown reaches the ORC reader."""
    df = spark.createDataFrame(
        [("t1", 1, [2, 6, 0], 3), ("t2", 2, [1], 1), ("t3", 9, [5, 5], 2)],
        "trace_id string, ano_id int, explanation array<int>, exp_size int",
    )
    path = str(tmp_path / "out_orc")
    write_results(df, path, fmt="orc")
    back = spark.read.orc(path)
    got = {
        (r["trace_id"], r["ano_id"], tuple(r["explanation"]), r["exp_size"])
        for r in back.collect()
    }
    assert got == {("t1", 1, (2, 6, 0), 3), ("t2", 2, (1,), 1), ("t3", 9, (5, 5), 2)}
    # pushdown reaches the ORC scan
    filtered = spark.read.orc(path).filter(F.col("ano_id") > 5)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "ano_id" in plan.split("PushedFilters")[1][:120]
    assert filtered.count() == 1
