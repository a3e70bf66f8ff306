"""Online anomaly scoring — stream-static broadcast join (SURVEY §7 M6).

The paper's online setting (exstream.pdf §6.3) monitors live features against
a learned reference profile.  Batch side: per-(event_type) mean/stddev of the
windowed features over a reference period.  Stream side: each incoming window
joins the broadcast profile and is flagged when its |z-score| exceeds a
threshold — the streaming trigger that would enqueue an EXstream explanation
job over the flagged interval.

Scale notes: the profile is O(#event_types) rows → always broadcast-able; the
stream side therefore never shuffles after its windowed aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from exstream_implementation_spark.canon import stable_round


def reference_profile(windowed: DataFrame) -> DataFrame:
    """Per-event-type profile from a *batch* windowed-features frame
    (reference period = everything in ``windowed``)."""
    return windowed.groupBy("event_type").agg(
        F.avg("n_events").alias("mu_n"),
        F.coalesce(F.stddev_pop("n_events"), F.lit(0.0)).alias("sigma_n"),
        F.avg("sum_value").alias("mu_value"),
        F.coalesce(F.stddev_pop("sum_value"), F.lit(0.0)).alias("sigma_value"),
    )


def score_against_profile(
    windowed: DataFrame,
    profile: DataFrame,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Join windowed features (stream or batch) to the broadcast profile and
    emit z-scores + anomaly flag."""
    eps = F.lit(1e-12)
    scored = windowed.join(F.broadcast(profile), on="event_type", how="left")
    return scored.select(
        "window_start",
        "window_end",
        "event_type",
        "n_events",
        "sum_value",
        stable_round(
            (F.col("n_events") - F.col("mu_n")) / (F.col("sigma_n") + eps), 6
        ).alias("z_n"),
        stable_round(
            (F.col("sum_value") - F.col("mu_value")) / (F.col("sigma_value") + eps), 6
        ).alias("z_value"),
    ).withColumn(
        "is_anomalous",
        (F.abs(F.col("z_n")) > z_threshold) | (F.abs(F.col("z_value")) > z_threshold),
    )
