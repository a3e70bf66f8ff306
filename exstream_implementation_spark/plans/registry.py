"""Query registry — the t2 correctness surface.

Every entry registers a Spark query fn(spark, sf_dir) -> DataFrame and
(usually) a DuckDB-runnable ANSI-SQL oracle string over the same parquet
tables. Column names/aliases are kept IDENTICAL between the two sides — the
driver sorts columns by name and hash-compares values (BASELINE.json gate).

Floating-point outputs are rounded at the query boundary on BOTH sides so
that summation-order differences between engines can't flip the hash.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from exstream_implementation_spark import cache
from exstream_implementation_spark.canon import (  # noqa: F401 — re-export
    stable_round,
    stable_round_sql,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        # each top-level catalog query releases the previous query's tracked
        # caches (cache.py) — nested catalog calls are depth-guarded so an
        # outer query's working set is never dropped mid-build
        @functools.wraps(fn)
        def wrapped(spark, sf_dir, *args, **kwargs):
            cache.enter_query()
            try:
                return fn(spark, sf_dir, *args, **kwargs)
            finally:
                cache.exit_query()

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco
