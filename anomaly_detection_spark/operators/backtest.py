"""Backtesting: rolling re-forecast over historical grids + forecast
quality + alarm-accuracy metrics (SURVEY.md §2 W4, A8, A9, M18).

Reference semantics (anomalydetection/freshness_utils.py:850-1002):
- replay the verdict model along a time grid, retraining every
  ``retrain_every`` evaluations on the history available at that point
  (grid + incremental retrain at freshness_utils.py:865-928);
- forecast quality: RMSE + SMAPE over fresh-predicted points (933-954);
- alarm accuracy: tp/fp/fn/tn → precision/recall/accuracy/TNR/FPR/FNR
  against labeled anomaly timestamps (957-1002). NOTE: the reference's
  lines 982-985 compare ``Series is True`` — a latent always-False bug;
  we implement the documented intent (elementwise AND), per SURVEY.md.

The rolling replay is inherently sequential per partition → one
``applyInPandas`` call per partition (vectorized inside); the metric
aggregations are plain column expressions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from anomaly_detection_spark.functions.forecast import forecast_band

BACKTEST_SCHEMA = (
    "partition_id int, eval_idx int, actual double, forecast double, "
    "lower double, upper double, in_band boolean"
)


def rolling_backtest(
    series_df: DataFrame,
    by: str = "partition_id",
    value_col: str = "volume",
    order_col: str = "bucket",
    ascending: bool = False,
    min_train: int = 7,
    retrain_every: int = 10,
    num_std: float = 3.0,
) -> DataFrame:
    """Rolling one-step-ahead backtest per group: at each grid point i,
    forecast value[i] from value[:i] (model refit every
    ``retrain_every`` steps, reusing the previous fit in between with
    the reference's incremental-update-then-periodic-retrain cadence)."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf[by].iloc[0])
        s = pdf.sort_values(order_col, ascending=ascending)[value_col].to_numpy(dtype=np.float64)
        rows = []
        cached: tuple[float, float, float] | None = None
        since_retrain = 0
        for i in range(min_train, len(s)):
            if cached is None or since_retrain >= retrain_every:
                try:
                    cached = forecast_band(s[:i], num_std=num_std)
                except Exception:
                    cached = None
                since_retrain = 0
            since_retrain += 1
            if cached is None:
                continue
            point, lo, hi = cached
            rows.append(
                {
                    "partition_id": pid,
                    "eval_idx": i,
                    "actual": float(s[i]),
                    "forecast": float(point),
                    "lower": float(lo),
                    "upper": float(hi),
                    "in_band": bool(lo <= s[i] <= hi),
                }
            )
        return pd.DataFrame(
            rows,
            columns=["partition_id", "eval_idx", "actual", "forecast", "lower", "upper", "in_band"],
        )

    return series_df.groupBy(by).applyInPandas(run, BACKTEST_SCHEMA)


def forecast_quality(backtest: DataFrame, by: list[str] | None = None) -> DataFrame:
    """RMSE + SMAPE over backtest points (A9) as column expressions."""
    by = by or []
    err = F.col("forecast") - F.col("actual")
    smape_term = F.when(
        (F.abs("forecast") + F.abs("actual")) > 0,
        2.0 * F.abs(err) / (F.abs("forecast") + F.abs("actual")),
    ).otherwise(F.lit(0.0))
    g = backtest.groupBy(*by) if by else backtest.groupBy()
    return g.agg(
        F.sqrt(F.avg(F.pow(err, 2))).alias("rmse"),
        F.avg(smape_term).alias("smape"),
        F.count(F.lit(1)).alias("n_points"),
        F.avg(F.col("in_band").cast("double")).alias("band_coverage"),
    )


def alarm_accuracy(
    predicted: DataFrame,
    labeled: DataFrame,
    on: list[str],
    pred_col: str = "predicted_anomaly",
    label_col: str = "is_anomaly",
) -> DataFrame:
    """Confusion-matrix metrics (A8) joining predictions to labels on
    ``on`` keys: precision/recall/accuracy/TNR/FPR/FNR. Elementwise
    AND semantics (the reference's intent; its `is True` comparison bug
    is deliberately NOT reproduced)."""
    j = predicted.join(labeled, on=on, how="outer").select(
        F.coalesce(F.col(pred_col), F.lit(False)).alias("p"),
        F.coalesce(F.col(label_col), F.lit(False)).alias("l"),
    )
    agg = j.agg(
        F.sum(F.when(F.col("p") & F.col("l"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("p") & ~F.col("l"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("p") & F.col("l"), 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~F.col("p") & ~F.col("l"), 1).otherwise(0)).alias("tn"),
    )
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")

    def safe(num, den):
        return F.when(den > 0, num.cast("double") / den).otherwise(F.lit(None))

    return agg.select(
        "tp",
        "fp",
        "fn",
        "tn",
        safe(tp, tp + fp).alias("precision"),
        safe(tp, tp + fn).alias("recall"),
        safe(tp + tn, tp + fp + fn + tn).alias("accuracy"),
        safe(tn, tn + fp).alias("tnr"),
        safe(fp, fp + tn).alias("fpr"),
        safe(fn, fn + tp).alias("fnr"),
    )
