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


CADENCE_GRID_SCHEMA = (
    "partition_id int, eval_epoch long, cadence_hours int, status string, "
    "last_update_epoch long, upper_epoch long"
)


def cadence_bucket_hours(median_duration_sec: float) -> int:
    """Evaluation cadence from the median inter-commit duration —
    reference _backtest_avg_cadence_bucket (freshness_checker.py:284-301):
    median <= 12h → 6h grid; <= 3.5 days → 24h; else weekly (168h)."""
    if median_duration_sec <= 12 * 3600:
        return 6
    if median_duration_sec <= 3.5 * 86400:
        return 24
    return 168


def should_run_backtest(spark, store, lineage_table: str = "_dq_lineage") -> bool:
    """Emptiness gating (reference anomaly_detector.py:119-134): backtest
    only when the lineage/logging table is missing or empty — a table
    with history means live verdicts already cover the timeline."""
    if not store.exists(lineage_table):
        return True
    return store.read(spark, lineage_table).isEmpty()


def freshness_time_grid_backtest(
    commits: DataFrame,
    eval_time,
    by: str = "partition_id",
    grid_days: int = 7,
    lookback_days: int = 14,
    num_std: float = 3.0,
    retrain_every: int = 10,
    min_train: int = 3,
    static_age_days: int = 30,
    apply_grace: bool = True,
) -> DataFrame:
    """M18 parity: replay the freshness verdict along a TIME grid
    (reference rolling_forecast_single_table, freshness_utils.py:850-930)
    instead of an index grid. Per partition: the grid cadence comes from
    the median inter-commit duration (6h/24h/168h buckets), evaluation
    points run over [eval_time − grid_days, eval_time) inclusive-left,
    training at each point uses the lookback window ending there (with
    the min-points fallback to the newest points overall) and the model
    refits every ``retrain_every`` grid points.

    The replay is inherently sequential per partition → one
    ``applyInPandas`` call per group, numpy inside; partitions replay in
    parallel across the cluster."""
    import pyspark.sql.functions as F  # noqa: F811 — local alias for clarity

    from anomaly_detection_spark.functions.forecast import forecast_band as _band

    ts = commits.select(
        F.col(by).alias("partition_id"),
        F.col("timestamp"),
        eval_time.cast("timestamp").alias("_eval"),
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["partition_id"].iloc[0])
        end = pdf["_eval"].iloc[0]
        times = pdf["timestamp"].sort_values().reset_index(drop=True)
        gaps = times.diff().dt.total_seconds().dropna()
        if len(gaps) == 0:
            return pd.DataFrame(
                columns=["partition_id", "eval_epoch", "cadence_hours", "status", "last_update_epoch", "upper_epoch"]
            )
        cadence = cadence_bucket_hours(float(gaps.median()))
        start = end - pd.Timedelta(days=grid_days)
        grid = pd.date_range(start=start, end=end, freq=pd.Timedelta(hours=cadence), inclusive="left")
        rows = []
        cached = None
        since = 0
        for ts_i in grid:
            hist = times[times <= ts_i]
            if len(hist) == 0:
                continue
            last = hist.iloc[-1]
            row = {
                "partition_id": pid,
                "eval_epoch": int(ts_i.timestamp()),
                "cadence_hours": cadence,
                "status": "Unknown",
                "last_update_epoch": int(last.timestamp()),
                "upper_epoch": None,
            }
            # static short-circuit, as in the live check (M1)
            if last < ts_i - pd.Timedelta(days=static_age_days):
                row["status"] = "Healthy"
                rows.append(row)
                continue
            in_window = hist[hist >= ts_i - pd.Timedelta(days=lookback_days)]
            train_times = in_window if len(in_window) >= min_train else hist.iloc[-max(min_train, 3) :]
            durations = train_times.diff().dt.total_seconds().dropna().to_numpy()
            if len(durations) < 2:
                rows.append(row)
                continue
            if cached is None or since >= retrain_every:
                try:
                    cached = _band(durations, num_std=num_std)
                except Exception:
                    cached = None
                since = 0
            since += 1
            if cached is None:
                rows.append(row)
                continue
            point, _lo, hi = cached
            if point <= 0:
                point = float(durations.min())
            hi = max(hi, point)
            if apply_grace and len(durations) > 1:
                med = float(pd.Series(durations).median())
                grace = max(med, 900.0) if med < 1800 else min(43200.0, med * 0.5)
                hi = max(hi, point + grace)
            upper = last + pd.Timedelta(seconds=int(round(hi)))
            row["upper_epoch"] = int(upper.timestamp())
            row["status"] = "Healthy" if ts_i <= upper else "Unhealthy"
            rows.append(row)
        return pd.DataFrame(
            rows,
            columns=["partition_id", "eval_epoch", "cadence_hours", "status", "last_update_epoch", "upper_epoch"],
        )

    return ts.groupBy("partition_id").applyInPandas(run, CADENCE_GRID_SCHEMA)


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
