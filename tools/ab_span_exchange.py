"""A/B: text_fingerprint span branch — current (groupBy + semi-join each
re-derive the md5-gram explode) vs a single explicit repartition("gh") whose
exchange both consumers reuse (ReusedExchange), so the gram hashing and the
shuffle are paid once.

Usage: PYTHONPATH=. python tools/ab_span_exchange.py [reps] [sf_dir]

MEASURED (r09, sf0.1, 5 warm reps): current median 0.986 s, reused 1.390 s —
the explicit repartition LOSES.  The duplicated-gram set is tiny, so the
current form BROADCASTS it and the probe side never shuffles at all; paying
a full shuffle of every (doc_id, pos, gh) row to save one md5 recompute is a
bad trade.  Kept as evidence; the catalog query stays in its current form.
"""

import sys
import time

from pyspark.sql import functions as F
from pyspark.sql import Window

from exstream_implementation_spark.session import get_spark
from exstream_implementation_spark.plans.text import (
    SPAN_W,
    _toks,
    load_documents_parallel,
    text_fingerprint,
)


def variant_reused_exchange(spark, sf_dir):
    d = load_documents_parallel(spark, sf_dir).withColumn("toks", _toks())
    u = d.select("doc_id", F.posexplode("toks").alias("pos", "tok"))
    term = (
        F.expr("cast(conv(substr(md5(tok), 1, 8), 16, 10) as bigint) % 1000003")
        * ((F.col("pos") % 64) + 1)
    )
    fp = (
        u.groupBy("doc_id")
        .agg((F.sum(term) % 2147483647).alias("val"))
        .select(
            F.lit("fp").alias("branch"),
            "doc_id",
            F.lit(0).cast("int").alias("pos"),
            "val",
        )
    )
    grams = (
        d.filter(F.size("toks") >= SPAN_W)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(toks) - {SPAN_W}),"
                    f" i -> cast(conv(substr(md5(array_join("
                    f"slice(toks, i + 1, {SPAN_W}), ' ')), 1, 15), 16, 10)"
                    f" as bigint))"
                )
            ).alias("pos", "gh"),
        )
        .repartition("gh")
    )
    dup = (
        grams.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gh")
    )
    hit = grams.join(dup, "gh", "left_semi").select(
        "doc_id", F.col("pos").cast("int").alias("pos")
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_end = F.max(F.col("pos") + SPAN_W).over(w_prev)
    isl = hit.withColumn(
        "new_isl",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0),
    ).withColumn("island", F.sum("new_isl").over(w_run))
    spans = (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("int").alias("pos"),
            (F.max("pos") + SPAN_W).cast("long").alias("val"),
        )
        .select(F.lit("span").alias("branch"), "doc_id", "pos", "val")
    )
    return fp.unionByName(spans)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="ab-span")
    forms = {"current": text_fingerprint, "reused": variant_reused_exchange}
    # warm both
    for fn in forms.values():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    # hash parity first: both forms must agree row-for-row
    a = {tuple(r) for r in text_fingerprint(spark, sf_dir).collect()}
    b = {tuple(r) for r in variant_reused_exchange(spark, sf_dir).collect()}
    print("parity:", a == b, len(a), len(b))
    assert a == b
    for name, fn in forms.items():
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        ts.sort()
        print(name, "median", ts[len(ts) // 2], "all", ts)
    spark.stop()


if __name__ == "__main__":
    main()
