"""Reporting parity with the reference's plot_metrics.ipynb (cells 2-9).

The reference notebook loads the 4 result CSVs written by script_1.py's
config grid and tabulates, per configuration, the mean explanation
instability and mean explanation size (plot_metrics.ipynb cells 2-9 — one
read_csv + .mean() pair per config).  Here the same summaries are one
DataFrame aggregation over the grid outputs — and because every config's
result is already a DataFrame, the summary runs without re-reading sinks.

Scale: each input is O(#anomalies) rows; the union + groupBy is a single
tiny shuffle regardless of trace volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def config_metric_summary(grid: dict[str, DataFrame]) -> DataFrame:
    """{config name → explanation DataFrame} (run_config_grid's output) →
    (config, n_anomalies, mean_instability, mean_exp_size), one row per
    config — the notebook's per-config ``df[["exp_instability",
    "exp_size"]].mean()`` table (plot_metrics.ipynb cells 2-9)."""
    unioned = None
    for name, df in grid.items():
        tagged = df.select(
            F.lit(name).alias("config"),
            F.col("exp_instability").cast("double"),
            F.col("exp_size").cast("double"),
        )
        unioned = tagged if unioned is None else unioned.unionByName(tagged)
    return unioned.groupBy("config").agg(
        F.count(F.lit(1)).alias("n_anomalies"),
        F.round(F.avg("exp_instability"), 6).alias("mean_instability"),
        F.round(F.avg("exp_size"), 6).alias("mean_exp_size"),
    )


def summary_from_sinks(spark, out_dir: str, fmt: str = "parquet") -> DataFrame:
    """Same summary computed from the written sinks (the notebook's actual
    input path): reads the four result tables back and aggregates."""
    names = [
        "explanations",
        "explanations_cluster",
        "explanations_fpf",
        "explanations_cluster_fpf",
    ]
    grid = {}
    for name in names:
        reader = spark.read
        if fmt == "csv":
            grid[name] = reader.option("header", "true").csv(
                f"{out_dir}/{name}", inferSchema=True
            )
        else:
            grid[name] = reader.parquet(f"{out_dir}/{name}")
    return config_metric_summary(grid)
