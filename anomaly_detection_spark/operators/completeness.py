"""Completeness (row-volume) verdicts per partition (SURVEY.md §2 M8/M9).

Reference semantics reproduced (anomalydetection/completeness_utils.py):
- guard: > ``min_training_buckets`` 24h buckets required, else Unknown
  with NOT_ENOUGH_DATA (completeness_utils.py:133, model_config.py:33)
- train = all buckets but the newest; eval point = newest bucket
  (completeness_utils.py:145-146)
- M9 override: Healthy iff eval >= threshold (completeness_utils.py:81-103)
- M8 model: Unhealthy iff eval < max(int(lower_band), 0)
  (completeness_utils.py:221-227 — lower bound clamped at 0)

Execution: bucket volumes are computed fully distributed (one agg), and
the per-partition model step runs as an ``applyInPandas`` grouped map —
one vectorized pandas call per partition over its (tiny: lookback/24h)
bucket series. This is the pattern the reference's distributed
third_party path hints at (SURVEY.md §3.4) made first-class.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from anomaly_detection_spark.functions.forecast import forecast_band
from anomaly_detection_spark.operators import verdict as V
from anomaly_detection_spark.sources.history import bucket_volumes, filter_history

RULE_ID = "completeness.volume"
MIN_TRAINING_BUCKETS = 7  # reference model_config.py:33

RESULT_SCHEMA = (
    "partition_id int, rule_id string, status string, "
    "last_window_row_volume long, predicted_row_volume_lower_bound long, "
    "forecast double, error_code string"
)


def completeness_verdicts(
    commits: DataFrame,
    eval_time: Column,
    threshold_override: int | None = None,
    lookback_days: int | None = 14,
    min_training_buckets: int = MIN_TRAINING_BUCKETS,
    num_std: float = 3.0,
) -> DataFrame:
    """Per-partition completeness verdict rows."""
    filtered = filter_history(commits, eval_time=eval_time, lookback_days=lookback_days)
    buckets = bucket_volumes(filtered, eval_time, by=["partition_id"])

    def check(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["partition_id"].iloc[0])
        # oldest → newest (bucket DESC = ascending time)
        series = pdf.sort_values("bucket", ascending=False)["volume"].to_numpy()
        row = {
            "partition_id": pid,
            "rule_id": RULE_ID,
            "status": V.UNKNOWN,
            "last_window_row_volume": None,
            "predicted_row_volume_lower_bound": None,
            "forecast": None,
            "error_code": None,
        }
        if threshold_override is not None:
            eval_point = int(series[-1]) if len(series) else 0
            row["status"] = V.HEALTHY if eval_point >= threshold_override else V.UNHEALTHY
            row["last_window_row_volume"] = eval_point
            row["predicted_row_volume_lower_bound"] = int(threshold_override)
            return pd.DataFrame([row])
        if len(series) <= min_training_buckets:
            row["error_code"] = "NOT_ENOUGH_DATA"
            return pd.DataFrame([row])
        train, eval_point = series[:-1], int(series[-1])
        try:
            point, lo, _hi = forecast_band(train, num_std=num_std)
        except Exception:
            row["error_code"] = "MODEL_FIT_FAILED"
            return pd.DataFrame([row])
        lower = max(int(lo), 0)
        row["status"] = V.UNHEALTHY if eval_point < lower else V.HEALTHY
        row["last_window_row_volume"] = eval_point
        row["predicted_row_volume_lower_bound"] = lower
        row["forecast"] = float(point)
        return pd.DataFrame([row])

    return buckets.groupBy("partition_id").applyInPandas(check, RESULT_SCHEMA)


def completeness_override_sql(
    commits: DataFrame, eval_time: Column, threshold: int, lookback_days: int | None = 14
) -> DataFrame:
    """M9 as a pure column-expression plan (no Python at all): per
    partition, Healthy iff the newest 24h bucket volume >= threshold.
    Same semantics as the override branch of :func:`completeness_verdicts`
    but never leaves the JVM — the hot path for constant-threshold rules."""
    filtered = filter_history(commits, eval_time=eval_time, lookback_days=lookback_days)
    buckets = bucket_volumes(filtered, eval_time, by=["partition_id"])
    newest = buckets.filter(F.col("bucket") == 0)
    return newest.select(
        "partition_id",
        F.lit(RULE_ID).alias("rule_id"),
        F.when(F.col("volume") >= threshold, F.lit(V.HEALTHY)).otherwise(F.lit(V.UNHEALTHY)).alias("status"),
        F.col("volume").alias("last_window_row_volume"),
        F.lit(threshold).cast("long").alias("predicted_row_volume_lower_bound"),
    )
