"""SparkSession factory tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default all cores); the
same configs are what we would set cluster-side: AQE on (runtime re-planning,
skew-join splitting, partition coalescing), Arrow on (fast pandas interchange
for the few applyInPandas operators), sane shuffle partition count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "exstream-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE coalesce CACHED plans too (off upstream by default to
        # preserve cache output partitioning for consumers that elide
        # exchanges on it — none of this engine's caches are consumed on
        # their materialized partitioning, audited r13).  Without it every
        # small cached aggregate (the events trace, the melted relation,
        # the flagship slice) pins shuffle.partitions-many near-empty
        # partitions and every downstream stage schedules that many tasks:
        # flagship warm pass 2.9 -> 2.0 s, 12 -> 11 jobs.  Scale-adaptive,
        # not a local tune: partitions coalesce toward the AQE advisory
        # size, and explicit repartition(n) caches (the CPU-heavy gram /
        # document tables) are never coalesced.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # the driver-generated events.parquet carries TIMESTAMP(NANOS), which
        # Spark's reader rejects unless nanos are surfaced as long
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # PySpark 4's call-site capture wraps EVERY DataFrame API call with a
        # getActiveSession + conf lookup + JVM origin set/clear — 3 extra
        # py4j round-trips per operation, measured +40% on pure plan
        # construction (r12: 300 chained selects 4.2 s off vs 6.2 s on; the
        # flagship builds ~3600 py4j calls per run).  The cost is
        # driver-side and scale-independent; what it buys (the Python call
        # site echoed inside error messages) is a debugging nicety, so
        # production sessions run with it off.  Overridable via extra_conf.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # NOT set: a spark.python.daemon.module that pre-imports
        # numpy/pandas before forking workers (the COW-preload pattern).
        # Measured r13, interleaved A/B ×3: first Python stage 3.5/4.2/4.3 s
        # WITH preload vs 2.8/3.5/3.5 s stock — in local[32] the workers
        # import the numeric stack in parallel across cores, while the
        # daemon preload serializes that import before the first fork.  The
        # session's first-Arrow-stage cost is worker bring-up either way;
        # spark.python.worker.reuse (default on) keeps it one-time.
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if "spark.python.sql.dataFrameDebugging.enabled" in (extra_conf or {}):
        # PySpark caches is_debugging_enabled() in a process-global on the
        # first DataFrame API call (pyspark/errors/utils.py), so an
        # extra_conf override in a second session of the same Python
        # process would otherwise be silently ignored — reset the memo so
        # the override takes effect.
        try:
            from pyspark.errors import utils as _perr_utils

            if hasattr(_perr_utils, "_enable_debugging_cache"):
                _perr_utils._enable_debugging_cache = None
        except Exception:  # pragma: no cover — future PySpark renames it
            pass
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply engine-preferred runtime confs to an externally-provided session
    (the verify driver hands us its own SparkSession)."""
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    # cached-plan AQE coalescing (see get_spark) — runtime-settable
    spark.conf.set(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
    )
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # a host session may carry the 200-partition default — size to the suite
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS)
    )
    # per-call call-site capture (see get_spark) is a STATIC conf — it can
    # only be set at session build time, so an externally-provided session
    # keeps whatever it was built with; nothing to do here.
    return spark
