"""SURVEY §2.1 relational operator catalog over the TPC-H-ish testdata.

Each query is the declared Spark mapping of one (or more) §2.1 rows, with a
DuckDB oracle. Citations point at the reference behavior each row abstracts.

Scale notes common to all: filters/projections sit directly on the parquet
scan (Catalyst pushes them down — verified via .explain in tests), small
dimension tables are broadcast, aggregations are partial (map-side combine)
by construction, and no query collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from exstream_implementation_spark.plans.registry import query
from exstream_implementation_spark.sources import load_table


# --- §2.1 #1 CSV/parquet scan + #6 projection (reference utils/get_data.py:77,
#     script_1.py:54-55) -------------------------------------------------------
@query(
    "scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem WHERE l_quantity > 45.0
    """,
)
def scan_project(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45.0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


# --- §2.1 #3 range-predicate filter (reference utils/get_data.py:85-96; the
#     asymmetric [start, end) slice) ------------------------------------------
@query(
    "filter_range",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE CAST(floor(epoch(ts)) AS BIGINT) >= 1704499200
      AND CAST(floor(epoch(ts)) AS BIGINT) <  1705104000
    """,
)
def filter_range(spark, sf_dir):
    # predicate on the RAW ts column (epoch nanos), not the derived ts_sec —
    # a filter on a computed column can't push down into the parquet scan,
    # which at scale means reading the whole table instead of pruned row
    # groups; rescaling the bounds instead keeps pushdown intact
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        (F.col("ts") >= 1704499200 * 1_000_000_000)
        & (F.col("ts") < 1705104000 * 1_000_000_000)
    ).select("event_id", "user_id", "event_type", "value")


# --- §2.1 #4 equality filter (reference utils/get_data.py:81) ----------------
@query(
    "filter_eq",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def filter_eq(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --- §2.1 #5 string-prefix filter (reference utils/get_data.py:44-48) --------
@query(
    "filter_prefix",
    oracle="""
    SELECT p_partkey, p_name, p_brand FROM part WHERE p_name LIKE 'b%'
    """,
)
def filter_prefix(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("b"))
        .select("p_partkey", "p_name", "p_brand")
    )


# --- §2.1 #7 drop columns (reference script_1.py:167,250-252) ----------------
@query(
    "drop_columns",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey FROM supplier
    """,
)
def drop_columns(spark, sf_dir):
    return load_table(spark, sf_dir, "supplier").drop("s_acctbal")


# --- §2.1 #8 literal/derived columns + key concat
#     (reference utils/get_data.py:78-79, plot_metrics.ipynb cell 1) ----------
@query(
    "derived_columns",
    oracle="""
    SELECT c_custkey,
           c_mktsegment || '_' || CAST(c_custkey AS VARCHAR) AS seg_key,
           'batch42' AS source_tag,
           round(c_acctbal * 2.0, 2) AS boosted_bal
    FROM customer
    """,
)
def derived_columns(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat_ws("_", "c_mktsegment", F.col("c_custkey").cast("string")).alias(
            "seg_key"
        ),
        F.lit("batch42").alias("source_tag"),
        F.round(F.col("c_acctbal") * 2.0, 2).alias("boosted_bal"),
    )


# --- §2.1 #9 union all (reference script_1.py:43, utils/get_data.py:103-104) -
@query(
    "union_all",
    oracle="""
    SELECT o_orderkey, o_totalprice, 0 AS type_data FROM orders
    WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey, o_totalprice, 1 AS type_data FROM orders
    WHERE o_orderpriority = '5-LOW'
    """,
)
def union_all(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_totalprice", F.lit(0).alias("type_data")
    )
    b = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        "o_orderkey", "o_totalprice", F.lit(1).alias("type_data")
    )
    return a.unionByName(b)


# --- §2.1 #10 inner equi-join, broadcast dims (reference utils/get_data.py:81,
#     script_1.py:164-166) ----------------------------------------------------
@query(
    "join_broadcast_dims",
    oracle="""
    SELECT c.c_custkey, n.n_name AS nation, r.r_name AS region, c.c_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE c.c_acctbal > 5000.0
    """,
)
def join_broadcast_dims(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000.0)
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select(
            "c_custkey",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            "c_acctbal",
        )
    )


# --- §2.1 #11 positional (row-number) join (reference script_1.py:164-166 —
#     pd.merge on integer index; here made explicit and deterministic) --------
@query(
    "positional_join",
    oracle="""
    WITH c AS (SELECT c_custkey, c_acctbal,
                      row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rn
               FROM customer),
         s AS (SELECT s_suppkey, s_acctbal,
                      row_number() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS rn
               FROM supplier)
    SELECT c.rn AS rn, c.c_custkey, s.s_suppkey,
           round(c.c_acctbal - s.s_acctbal, 2) AS bal_gap
    FROM c JOIN s ON c.rn = s.rn
    """,
)
def positional_join(spark, sf_dir):
    from exstream_implementation_spark.operators.ranking import global_row_number

    # global_row_number keeps the global ordering distributed (range
    # repartition + partition offsets) instead of a one-partition window
    c = global_row_number(
        load_table(spark, sf_dir, "customer"),
        [F.desc("c_acctbal"), F.asc("c_custkey")],
    )
    s = global_row_number(
        load_table(spark, sf_dir, "supplier"),
        [F.desc("s_acctbal"), F.asc("s_suppkey")],
    )
    return c.join(s, "rn").select(
        "rn",
        "c_custkey",
        "s_suppkey",
        F.round(F.col("c_acctbal") - F.col("s_acctbal"), 2).alias("bal_gap"),
    )


# --- §2.1 #12 group-by count (reference
#     exstream/entropy_based_single_reward_feature.py:60) ---------------------
@query(
    "groupby_count",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def groupby_count(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


# --- skew-resilient variant of #12: two-phase salted aggregation over a
#     3-distinct-value key (the hottest possible skew) — result must be
#     IDENTICAL to the direct group-by the oracle runs -------------------------
@query(
    "groupby_salted_skew",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           round(sum(l_extendedprice), 2) AS sum_price,
           max(l_quantity) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def groupby_salted_skew(spark, sf_dir):
    from exstream_implementation_spark.operators.skew import salted_agg

    out = salted_agg(
        load_table(spark, sf_dir, "lineitem"),
        keys=["l_returnflag"],
        aggs={
            "n": ("sum", F.count(F.lit(1))),
            "sum_price": ("sum", F.sum("l_extendedprice")),
            "max_qty": ("max", F.max("l_quantity")),
        },
        salt_col=F.col("l_orderkey"),
    )
    return out.select(
        "l_returnflag", "n", F.round("sum_price", 2).alias("sum_price"), "max_qty"
    )


# --- §2.1 #13 distinct + counts (reference
#     exstream/entropy_based_single_reward_feature.py:63-70) ------------------
@query(
    "distinct_counts",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_custs,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def distinct_counts(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_custs"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# --- §2.1 #14 distinct keys (reference script_1.py:59) -----------------------
@query(
    "distinct_keys",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_keys(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_nationkey"
    ).distinct()


# --- §2.1 #15 multi-key sort + #16 rank (reference
#     entropy_based_single_reward_feature.py:224,239-241) — rank materialized
#     so the order survives the driver's order-insensitive hash --------------
@query(
    "sort_rank_topk",
    oracle="""
    SELECT * FROM (
      SELECT o_orderkey, o_totalprice,
             row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS price_rank
      FROM orders
    ) WHERE price_rank <= 100
    """,
)
def sort_rank_topk(spark, sf_dir):
    from exstream_implementation_spark.operators.ranking import top_k_ranked

    # distributed top-k (TakeOrderedAndProject) — the ranking window only ever
    # sees the 100 survivors, not the whole table
    return top_k_ranked(
        load_table(spark, sf_dir, "orders"),
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=100,
        rank_col="price_rank",
    ).select("o_orderkey", "o_totalprice", "price_rank")


# --- §2.1 #17 lag analytic (reference
#     entropy_based_single_reward_feature.py:266-271) -------------------------
@query(
    "lag_delta",
    oracle="""
    SELECT user_id, event_id,
           round(value - lag(value) OVER (PARTITION BY user_id
                                          ORDER BY event_id), 2) AS delta
    FROM events WHERE user_id < 10
    """,
)
def lag_delta(spark, sf_dir):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("event_id")
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 10)
        .select(
            "user_id",
            "event_id",
            F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
        )
    )


# --- §2.1 #18 max aggregation (reference
#     entropy_based_single_reward_feature.py:273) -----------------------------
@query(
    "max_agg",
    oracle="""
    SELECT user_id, round(max(value), 2) AS max_value,
           round(min(value), 2) AS min_value
    FROM events GROUP BY user_id
    """,
)
def max_agg(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.round(F.max("value"), 2).alias("max_value"),
            F.round(F.min("value"), 2).alias("min_value"),
        )
    )


# --- §2.1 #19 top-k-until-leap: the reward-leap cut (C8) expressed over
#     supplier revenue (reference entropy_based_single_reward_feature.py:293-310)
@query(
    "topk_until_leap",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
      FROM lineitem GROUP BY l_suppkey
    ), ranked AS (
      SELECT l_suppkey, rev,
             row_number() OVER (ORDER BY rev DESC, l_suppkey) AS rnk,
             lag(rev) OVER (ORDER BY rev DESC, l_suppkey) AS prev_rev
      FROM revenue
    ), leaps AS (
      SELECT *, prev_rev - rev AS leap FROM ranked
    ), cut AS (
      SELECT min(rnk) AS cut_rank FROM leaps
      WHERE leap = (SELECT max(leap) FROM leaps) AND prev_rev <> 0
    )
    SELECT l_suppkey, rev, rnk FROM leaps
    WHERE rnk < (SELECT coalesce(cut_rank, 2147483647) FROM cut)
    """,
)
def topk_until_leap(spark, sf_dir):
    from exstream_implementation_spark.operators.ranking import global_row_number

    rev = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("rev")
        )
    )
    # distributed leap cut: global rank without a one-partition window, lag as
    # a rank-shift self-join, scalar cuts broadcast back — every stage keeps
    # the post-agg (per-supplier) cardinality partitioned
    ranked = global_row_number(
        rev, [F.desc("rev"), F.asc("l_suppkey")], rn_col="rnk"
    )
    prev = ranked.select(
        (F.col("rnk") + 1).alias("rnk"), F.col("rev").alias("prev_rev")
    )
    leaps = ranked.join(prev, "rnk", "left").withColumn(
        "leap", F.col("prev_rev") - F.col("rev")
    )
    max_leap = leaps.agg(F.max("leap").alias("max_leap"))
    cut = (
        leaps.crossJoin(F.broadcast(max_leap))
        .filter((F.col("leap") == F.col("max_leap")) & (F.col("prev_rev") != 0))
        .agg(F.min("rnk").alias("cut_rank"))
    )
    return (
        leaps.crossJoin(F.broadcast(cut))
        .filter(F.col("cut_rank").isNull() | (F.col("rnk") < F.col("cut_rank")))
        .select("l_suppkey", "rev", "rnk")
    )


# --- §2.1 #20 argmin / min-by (reference exstream/false_positive_filtering.py:46)
@query(
    "argmin_per_group",
    oracle="""
    SELECT * FROM (
      SELECT c_nationkey, c_custkey AS poorest_cust, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal, c_custkey) AS rn
      FROM customer
    ) WHERE rn = 1
    """,
)
def argmin_per_group(spark, sf_dir):
    from pyspark.sql import Window

    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            F.col("c_custkey").alias("poorest_cust"),
            "c_acctbal",
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("c_nationkey").orderBy(
                    "c_acctbal", "poorest_cust"
                )
            ),
        )
        .filter(F.col("rn") == 1)
    )


# --- §2.1 #21 conditional counts (reference
#     entropy_based_single_reward_feature.py:220, script_1.py:198-201) --------
@query(
    "conditional_counts",
    oracle="""
    SELECT o_custkey,
           count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
           count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
           count(*) AS n_total
    FROM orders GROUP BY o_custkey
    """,
)
def conditional_counts(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
            F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
            F.count(F.lit(1)).alias("n_total"),
        )
    )


# --- §2.1 #22 mean aggregation (reference explore_data.ipynb cell 13) --------
@query(
    "mean_agg",
    oracle="""
    SELECT event_type, round(avg(value), 4) AS avg_value, count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def mean_agg(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- §2.1 #23 row sampling (reference script_1.py:228-229) — deterministic
#     modular variant so both engines agree exactly; true Bernoulli sampling
#     lives in pipeline.explain_anomalies -------------------------------------
@query(
    "sample_deterministic",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE (l_orderkey * 7 + l_linenumber) % 10 < 8
    """,
)
def sample_deterministic(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 10 < 8)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


# --- beyond-reference relational surface (SURVEY §2.2: the reference has no
#     joins beyond inner-equi and no order statistics — Spark provides them;
#     these pin the semantics under the same oracle gate) ---------------------
@query(
    "percentiles_exact",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS median_value,
           round(quantile_cont(value, 0.9), 6) AS p90_value,
           round(quantile_cont(value, 0.99), 6) AS p99_value
    FROM events GROUP BY event_type
    """,
)
def percentiles_exact(spark, sf_dir):
    # exact interpolated percentiles (Spark `percentile`, not the approx
    # sketch) — matches DuckDB quantile_cont bit-for-bit after rounding
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("median_value"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90_value"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99_value"),
        )
    )


@query(
    "join_semi_anti",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           (c.c_custkey IN (SELECT o_custkey FROM orders)) AS has_orders
    FROM customer c
    WHERE c.c_acctbal > 9000.0
    """,
)
def join_semi_anti(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000.0)
    o = load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    with_orders = c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).withColumn("has_orders", F.lit(True))
    without = c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).withColumn("has_orders", F.lit(False))
    return with_orders.unionByName(without).select(
        "c_custkey", "c_mktsegment", "has_orders"
    )


@query(
    "asof_join_events",
    oracle="""
    WITH l AS (SELECT event_id, user_id, ts FROM events WHERE user_id < 40),
    r AS (SELECT user_id, ts, value FROM events
          WHERE event_type = 'purchase' AND user_id < 40)
    SELECT l.event_id, l.user_id,
           round(r.value, 6) AS asof_value
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def asof_join_events(spark, sf_dir):
    from exstream_implementation_spark.operators.asof import asof_join_backward

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    left = ev.select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join_backward(
        left, right, by="user_id", left_ts="ts", right_ts="ts",
        payload_cols=["value"],
    )
    return out.select(
        "event_id", "user_id", F.round("asof_value", 6).alias("asof_value")
    )


@query(
    "window_frames",
    oracle="""
    SELECT user_id, event_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY event_id
                                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
             AS moving_avg5,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
                                  ROWS UNBOUNDED PRECEDING), 6) AS running_sum
    FROM events WHERE user_id < 25
    """,
)
def window_frames(spark, sf_dir):
    from pyspark.sql import Window

    w5 = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-4, 0)
    wall = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 25)
        .select(
            "user_id",
            "event_id",
            F.round(F.avg("value").over(w5), 6).alias("moving_avg5"),
            F.round(F.sum("value").over(wall), 6).alias("running_sum"),
        )
    )


@query(
    "rollup_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@query(
    "set_ops",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_ops(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    big = o.filter(F.col("o_totalprice") > 200000.0).select("o_custkey")
    partial = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return urgent.intersect(big).exceptAll(partial.distinct())


@query(
    "json_extract_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket
    FROM events WHERE event_id < 2000
    """,
)
def json_extract_props(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "event_id", k.alias("k"), (k % 10).alias("k_bucket")
    )


# --- §2.1 #24 Pearson correlation (reference exstream/correlation_filtering.py:41)
@query(
    "corr_agg",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(corr(l_discount, l_tax), 6) AS corr_disc_tax
    FROM lineitem GROUP BY l_returnflag
    """,
)
def corr_agg(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "corr_qty_price"
            ),
            F.round(F.corr("l_discount", "l_tax"), 6).alias("corr_disc_tax"),
        )
    )


# --- §2.1 #25 scalar math (log2/log/abs/ratio — reference
#     entropy_based_single_reward_feature.py:35-37,187, script_1.py:201-202) --
@query(
    "scalar_math",
    oracle="""
    SELECT p_partkey,
           round(log2(p_retailprice), 6) AS log2_price,
           round(ln(p_retailprice), 6) AS ln_price,
           round(abs(p_retailprice - 1500.0), 2) AS abs_dev,
           round(p_size / (p_retailprice + 1.0), 6) AS size_price_ratio
    FROM part WHERE p_retailprice > 0
    """,
)
def scalar_math(spark, sf_dir):
    p = load_table(spark, sf_dir, "part").filter(F.col("p_retailprice") > 0)
    return p.select(
        "p_partkey",
        F.round(F.log2("p_retailprice"), 6).alias("log2_price"),
        F.round(F.log("p_retailprice"), 6).alias("ln_price"),
        F.round(F.abs(F.col("p_retailprice") - 1500.0), 2).alias("abs_dev"),
        F.round(F.col("p_size") / (F.col("p_retailprice") + 1.0), 6).alias(
            "size_price_ratio"
        ),
    )


# --- §2.1 #26 array length + #29 string split (reference script_1.py:171,
#     testing.ipynb cells 6,26) -----------------------------------------------
@query(
    "array_size_split",
    oracle="""
    SELECT doc_id,
           len(regexp_split_to_array(text, '\\s+')) AS n_tokens,
           n_chars
    FROM documents
    """,
)
def array_size_split(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", r"\s+")).alias("n_tokens"),
        "n_chars",
    )


# --- §2.1 #29 string cleanup (regexp_replace; reference testing.ipynb cell 6)
@query(
    "string_cleanup",
    oracle="""
    SELECT event_id,
           regexp_replace(regexp_replace(props, '[{}"]', '', 'g'), '\\s', '', 'g')
             AS props_clean
    FROM events WHERE event_id < 1000
    """,
)
def string_cleanup(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    return ev.select(
        "event_id",
        F.regexp_replace(
            F.regexp_replace("props", '[{}"]', ""), r"\s", ""
        ).alias("props_clean"),
    )


# --- §2.1 #30 pivot-wide assembly (reference script_1.py:240-248) ------------
@query(
    "pivot_wide",
    oracle="""
    SELECT user_id,
           count(CASE WHEN event_type = 'click' THEN 1 END) AS click_n,
           count(CASE WHEN event_type = 'view' THEN 1 END) AS view_n,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_n,
           count(CASE WHEN event_type = 'error' THEN 1 END) AS error_n,
           count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup_n
    FROM events GROUP BY user_id
    """,
)
def pivot_wide(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "error", "signup"])
        .agg(F.count(F.lit(1)))
    )
    for t in ["click", "view", "purchase", "error", "signup"]:
        out = out.withColumn(f"{t}_n", F.coalesce(F.col(t), F.lit(0))).drop(t)
    return out


# --- §2.1 #27 collect/array assembly (reference script_1.py:240-248 run
#     accumulation; order pinned by sorting so the hash is stable) ------------
@query(
    "collect_sorted_set",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list_distinct(list(event_type))), ',')
             AS types_seen
    FROM events GROUP BY user_id
    """,
)
def collect_sorted_set(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("event_type")), ","
            ).alias("types_seen")
        )
    )


# --- §2.1 #28 column-name → index lookup (reference script_1.py:110-115) —
#     the engine's feature_order mapping, expressed as a queryable relation --
@query(
    "column_index_map",
    oracle="""
    WITH cols(feature, feature_order) AS (VALUES
      ('l_orderkey', 0), ('l_partkey', 1), ('l_suppkey', 2), ('l_linenumber', 3),
      ('l_quantity', 4), ('l_extendedprice', 5), ('l_discount', 6), ('l_tax', 7),
      ('l_returnflag', 8), ('l_linestatus', 9), ('l_shipdate', 10))
    SELECT feature, feature_order FROM cols WHERE feature LIKE 'l_l%'
    """,
)
def column_index_map(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rows = [(c, i) for i, c in enumerate(li.columns)]
    df = spark.createDataFrame(rows, "feature string, feature_order int")
    return df.filter(F.col("feature").startswith("l_l"))


# --- binned interval join: the SCALE path for C1-style range predicates when
#     the interval side is too big to broadcast (reference utils/get_data.py:
#     83-100 slices by interval; slicing.slice_intervals broadcasts labels).
#     Each interval spans < 2 buckets of width W, so exploding intervals into
#     covered buckets turns the range join into an EQUALITY join on
#     (user, bucket) + a cheap residual filter — hash-shuffle both sides,
#     no broadcast, no nested-loop pair explosion, skew-safe under AQE. ------
_INC_W = 21600  # 6-hour incident window


@query(
    "interval_join_binned",
    oracle=f"""
    WITH ev AS (SELECT user_id, event_id, event_type,
                       cast(floor(epoch(ts)) AS BIGINT) AS sec
                FROM events),
         i AS (SELECT user_id, event_id AS incident_id, sec AS t0
               FROM ev WHERE event_type = 'error'),
         c AS (SELECT user_id, event_id AS click_id, sec
               FROM ev WHERE event_type = 'click')
    SELECT i.user_id, i.incident_id, c.click_id, c.sec AS click_sec
    FROM i JOIN c ON c.user_id = i.user_id
     AND c.sec >= i.t0 AND c.sec < i.t0 + {_INC_W}
    """,
)
def interval_join_binned(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts_sec"
    )
    inc = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("incident_id"),
        F.col("ts_sec").alias("t0"),
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts_sec").alias("click_sec"),
    )
    w = F.lit(_INC_W)
    inc_b = inc.withColumn(
        "bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    (F.col("t0") / w).cast("long"),
                    ((F.col("t0") + w - 1) / w).cast("long"),
                )
            )
        ),
    )
    clk_b = clk.withColumn("bucket", (F.col("click_sec") / w).cast("long"))
    return (
        inc_b.join(clk_b, ["user_id", "bucket"])
        .filter(
            (F.col("click_sec") >= F.col("t0"))
            & (F.col("click_sec") < F.col("t0") + w)
        )
        .select("user_id", "incident_id", "click_id", "click_sec")
    )


# --- native unpivot (the engine's melt — operators/slicing.melt_features
#     uses stack() for the same reshape; reference melts implicitly by
#     iterating feature columns, entropy_based_single_reward_feature.py:222) --
@query(
    "unpivot_metrics",
    oracle="""
    WITH wide AS (
      SELECT l_orderkey, l_linenumber, l_quantity AS qty,
             l_extendedprice AS price, l_discount AS disc
      FROM lineitem WHERE l_orderkey % 500 = 9
    )
    SELECT l_orderkey, l_linenumber, metric, round(val, 4) AS val
    FROM wide UNPIVOT (val FOR metric IN (qty, price, disc))
    """,
)
def unpivot_metrics(spark, sf_dir):
    wide = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 500 == 9)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").alias("qty"),
            F.col("l_extendedprice").alias("price"),
            F.col("l_discount").alias("disc"),
        )
    )
    return wide.unpivot(
        ["l_orderkey", "l_linenumber"], ["qty", "price", "disc"],
        "metric", "val",
    ).select("l_orderkey", "l_linenumber", "metric", F.round("val", 4).alias("val"))


# --- distribution ranking functions (ntile / percent_rank / cume_dist),
#     partitioned per nation so the window never plans a global sort ---------
@query(
    "ntile_distribution",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
    """,
)
def ntile_distribution(spark, sf_dir):
    from pyspark.sql import Window

    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


# --- per-group top-k (rank <= k within partition key): the keyed sibling of
#     sort_rank_topk's global TakeOrderedAndProject — the window partitions
#     by customer, so no global sort ever materializes --------------------
@query(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    ) WHERE rk <= 3
    """,
)
def topk_per_group(spark, sf_dir):
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


# --- date/time scalar surface (year/quarter/month/dow, date_trunc) and null
#     semantics (coalesce/nullif) — the remaining scalar-function families a
#     warehouse user relies on daily ------------------------------------------
@query(
    "datetime_null_scalars",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)      AS yr,
           quarter(o_orderdate)   AS qtr,
           month(o_orderdate)     AS mon,
           dayofweek(o_orderdate) + 1 AS dow,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label
    FROM orders
    WHERE o_orderkey % 50 = 1
    """,
)
def datetime_null_scalars(spark, sf_dir):
    # Spark dayofweek is 1=Sunday..7; DuckDB dayofweek is 0=Sunday..6 — the
    # +1 on the oracle side aligns the conventions explicitly
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 1)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofweek("o_orderdate").alias("dow"),
        # string, not DATE: pandas renders Spark dates as datetime.date
        # objects but DuckDB dates as datetime64 — the driver's canonicalizer
        # hashes them differently
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.coalesce(
            F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")
        ).alias("status_label"),
    )
