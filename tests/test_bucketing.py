"""Bucketed co-located join: writing both sides bucketed on the join key must
produce a SortMergeJoin with NO Exchange — the shuffle-free fact-fact join
that matters at 100 TB (each task reads bucket i of both tables)."""

import pytest
from pyspark.sql import functions as F

from exstream_implementation_spark.operators.bucketing import (
    read_bucketed,
    write_bucketed,
)
from tests.test_plan_shape import plan_str

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    # warehouse.dir is a static conf — use a database with an explicit
    # location so bucketed tables land in the test tmp dir
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdemo LOCATION '{warehouse}'")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    write_bucketed(
        orders, "bdemo.orders_b", ["o_orderkey"], n_buckets=8,
        sort_cols=["o_orderkey"],
    )
    write_bucketed(
        lineitem,
        "bdemo.lineitem_b",
        ["l_orderkey"],
        n_buckets=8,
        sort_cols=["l_orderkey"],
    )
    yield "bdemo.orders_b", "bdemo.lineitem_b"
    spark.sql("DROP DATABASE IF EXISTS bdemo CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ot, lt = bucketed_tables
    o = read_bucketed(spark, ot)
    li = read_bucketed(spark, lt)
    # force SMJ path (no broadcast) to show the co-located join shape
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = plan_str(joined, mode="simple")
        smj = [l for l in plan.splitlines() if "SortMergeJoin" in l]
        assert smj, plan
        # the join itself must not shuffle either side: the only Exchange
        # allowed is the one for the groupBy ABOVE the join
        join_idx = plan.index("SortMergeJoin")
        below_join = plan[join_idx:]
        assert "Exchange" not in below_join, below_join
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    ot, lt = bucketed_tables
    o = read_bucketed(spark, ot)
    li = read_bucketed(spark, lt)
    got = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .agg(F.count(F.lit(1)), F.round(F.sum("l_extendedprice"), 2))
        .first()
    )
    plain = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF_DIR}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .agg(F.count(F.lit(1)), F.round(F.sum("l_extendedprice"), 2))
        .first()
    )
    assert tuple(got) == tuple(plain)


def test_aqe_splits_skewed_join_partitions(spark):
    """Skew story beyond salting (groupby_salted_skew): for JOINS we rely on
    AQE's skew-join rule — a hot key's oversized reduce partition is split at
    runtime by mapper ranges. Two operational preconditions this test pins
    (both bit us): the upstream stage needs MULTIPLE mappers (a split's unit
    is one mapper's output — a single-file scan gives one mapper and nothing
    can split), and the skew thresholds must sit below the hot partition's
    COMPRESSED shuffle size."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(
            "/root/testdata/sf0.01/lineitem.parquet"
        ).repartition(16)
        # 10x volume, 90% of rows on join key 0
        fact = li.select(
            F.explode(F.sequence(F.lit(1), F.lit(10))).alias("rep"),
            F.when(F.col("l_orderkey") % 10 < 9, 0)
            .otherwise(F.col("l_orderkey") % 1000)
            .alias("k"),
            "l_quantity",
        )
        dim = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = fact.join(dim, "k").select(
            (F.col("l_quantity") + F.col("w")).alias("x")
        )
        assert len(joined.collect()) == 600_000
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_zorder_layout_shrinks_per_file_span_on_both_columns(spark, tmp_path):
    """The point of Z-ordering: after the layout write, EVERY clustered
    column's per-file min/max span is a small fraction of its full range
    (a plain x-sort leaves y spanning ~the full range in every file), so
    parquet stats prune filters on either column."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from exstream_implementation_spark.operators.zorder import write_zordered

    n = 40_000
    df = spark.range(n).select(
        (F.hash("id") % 10_000).cast("double").alias("x"),
        (F.hash(F.col("id") + 1) % 10_000).cast("double").alias("y"),
    )
    zpath = str(tmp_path / "zordered")
    write_zordered(df, zpath, ["x", "y"], bits=8, num_files=16)

    def mean_span(path, col):
        spans, full_min, full_max = [], None, None
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            fmn = fmx = None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        fmn = s.min if fmn is None else min(fmn, s.min)
                        fmx = s.max if fmx is None else max(fmx, s.max)
            if fmn is None:
                continue
            spans.append(fmx - fmn)
            full_min = fmn if full_min is None else min(full_min, fmn)
            full_max = fmx if full_max is None else max(full_max, fmx)
        return (sum(spans) / len(spans)) / (full_max - full_min)

    # plain x-sorted baseline: y stats are useless (span ≈ full range)
    spath = str(tmp_path / "xsorted")
    df.repartitionByRange(16, F.col("x")).sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(spath)
    assert mean_span(spath, "x") < 0.2          # leading col clusters...
    assert mean_span(spath, "y") > 0.8          # ...the other does not

    # z-ordered: BOTH columns cluster (16 files over an 8-bit 2-D curve:
    # each file covers ~1/16 of the curve → expected per-axis span ~1/4)
    assert mean_span(zpath, "x") < 0.5
    assert mean_span(zpath, "y") < 0.5


def test_zorder_prunes_row_groups_on_second_column(spark, tmp_path):
    """End-to-end pruning claim, not just stat-span shrinkage: under a range
    filter on the SECOND clustered column, the parquet reader must skip row
    groups — visible as the scan node materializing far fewer rows than the
    plain leading-column sort, whose every row group spans y's full range.

    (numFiles stays equal on both layouts: Spark lists all files and skips at
    ROW-GROUP granularity via the pushed min/max filter, so the honest metric
    is the scan's numOutputRows.)"""
    from pyspark.sql import functions as F

    from exstream_implementation_spark.operators.zorder import write_zordered

    n = 40_000
    df = spark.range(n).select(
        (F.hash("id") % 10_000).cast("double").alias("x"),
        (F.hash(F.col("id") + 1) % 10_000).cast("double").alias("y"),
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "xsorted")
    write_zordered(df, zpath, ["x", "y"], bits=8, num_files=16)
    df.repartitionByRange(16, F.col("x")).sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(spath)

    def scan_stats(path):
        r = spark.read.parquet(path).filter(
            (F.col("y") >= 100) & (F.col("y") <= 200)
        )
        out_rows = r.count()
        r2 = spark.read.parquet(path).filter(
            (F.col("y") >= 100) & (F.col("y") <= 200)
        )
        r2.collect()
        plan = r2._jdf.queryExecution().executedPlan()
        leaf = plan.collectLeaves().apply(0)
        assert "FileSourceScanExec" in leaf.getClass().getName()
        # the y-range predicate must actually reach parquet
        assert "PushedFilters: [" in leaf.toString()
        assert "y" in leaf.toString().split("PushedFilters")[1][:120]
        return out_rows, leaf.metrics().apply("numOutputRows").value()

    z_rows, z_scanned = scan_stats(zpath)
    s_rows, s_scanned = scan_stats(spath)
    assert z_rows == s_rows > 0           # same answer from both layouts
    assert s_scanned == n                 # baseline: nothing skipped
    assert z_scanned < n * 0.5            # z-order: >half the row groups skipped


def test_zorder_tolerates_nan_inf_null(spark, tmp_path):
    """Non-finite metric values must not poison the span (NaN is F.max) or
    crash the ANSI long cast; they land in bucket 0 like NULLs."""
    from pyspark.sql import functions as F

    from exstream_implementation_spark.operators.zorder import zorder_key

    df = spark.createDataFrame(
        [(1, 0.0), (2, 100.0), (3, float("nan")), (4, float("inf")), (5, None)],
        "id int, x double",
    ).withColumn("y", F.col("id").cast("double"))
    out = {r["id"]: r["__zkey"] for r in zorder_key(df, ["x", "y"], bits=4).collect()}
    assert len(out) == 5
    # finite rows still spread across buckets: min-x row < max-x row keys
    assert out[1] < out[2]


def test_neardup_corpus_anti_join_reads_buckets_without_exchange(spark):
    """The refreshing-ingest exact-dedup anti-join must NOT shuffle the
    corpus side: {name}_admitted is bucketed on norm_hash, so each
    microbatch exchanges only its own small probe side while the corpus
    reads co-located buckets.  (This removes the per-trigger corpus
    SHUFFLE; the corpus scan itself remains — see the module docstring's
    cost-honesty note for the horizon-state + coarse-trigger composition.)"""
    from exstream_implementation_spark.sources import load_table
    from exstream_implementation_spark.streaming.ingest_dedup import (
        init_neardup_corpus,
        with_content_hashes,
    )

    name = "bkt_neardup_t"
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        "doc_id < 60"
    )
    init_neardup_corpus(spark, name, docs=docs, n_buckets=8)
    try:
        probe = with_content_hashes(
            docs.filter("doc_id >= 40").select("doc_id", "text")
        ).select("norm_hash", "doc_id")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            anti = probe.join(
                spark.table(f"{name}_admitted").select("norm_hash"),
                "norm_hash",
                "left_anti",
            )
            plan = plan_str(anti, mode="simple")
            assert "SortMergeJoin" in plan, plan
            # exactly ONE exchange below the join — the probe side; the
            # bucketed corpus scan has none
            join_idx = plan.index("SortMergeJoin")
            assert plan[join_idx:].count("Exchange") == 1, plan[join_idx:]
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", "10485760"
            )
    finally:
        for sfx in ("admitted", "sh_idx", "mh_idx", "sh_flags", "mh_flags",
                    "meta"):
            spark.sql(f"DROP TABLE IF EXISTS {name}_{sfx}")
