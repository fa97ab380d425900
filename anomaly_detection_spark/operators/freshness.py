"""Freshness verdicts per partition (SURVEY.md §2 M1-M7, M10, W1).

Reference semantics reproduced (anomalydetection/freshness_utils.py):
- M1 static short-circuit: last update older than 30d → Fresh/Healthy,
  no model (freshness_utils.py:459-485, model_config.py:19)
- M2 constant threshold: Stale iff eval_time > last_update + threshold
  (freshness_utils.py:431-456)
- M3 model path: durations = lag-diff of commit timestamps (W1,
  freshness_utils.py:121-136), forecast next duration + band; Fresh iff
  eval_time <= last_update + upper; negative forecasts clamped to the
  min observed duration (freshness_utils.py:201)
- M6 grace-period widening from the median interval
  (freshness_utils.py:488-610):
    median < 30min  → grace = max(median, 15min)
    median >= 30min → grace = min(12h, 0.5 * median)
  upper = max(upper, point + grace); re-verdict.
- M7 dispatch precedence: static → constant override → model.
- guard: >= 2 durations required, else Unknown
  (min_commit_training_points, model_config.py:27)

The per-partition series step runs in ``applyInPandas`` (grouped,
vectorized); everything upstream (filters, lag) is JVM column work.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from anomaly_detection_spark.functions.forecast import MAX_TRAINING_POINTS, forecast_band
from anomaly_detection_spark.operators import verdict as V
from anomaly_detection_spark.sources.history import filter_history

RULE_ID = "freshness.commit"
STATIC_TABLE_AGE_DAYS = 30  # reference model_config.py:19
MIN_TRAINING_DURATIONS = 2  # reference model_config.py:27

RESULT_SCHEMA = (
    "partition_id int, rule_id string, status string, "
    "last_data_update timestamp, predicted_next_data_update timestamp, "
    "predicted_upper_bound_next_data_update timestamp, "
    "staleness_age_seconds long, error_code string"
)


def commit_durations(commits: DataFrame, by: list[str]) -> DataFrame:
    """W1: per-group inter-commit durations via lag over event time."""
    w = Window.partitionBy(*by).orderBy("timestamp")
    prev = F.lag("timestamp").over(w)
    return commits.select(
        *by,
        F.col("timestamp"),
        (F.unix_timestamp("timestamp") - F.unix_timestamp(prev)).alias("duration_sec"),
    )


def _grace_seconds(median_sec: float) -> float:
    """Piecewise grace period from the median commit interval —
    semantics of reference freshness_utils.py:535-553."""
    if median_sec < 30 * 60:
        return max(median_sec, 15 * 60.0)
    return min(12 * 3600.0, median_sec * 0.5)


def freshness_verdicts(
    commits: DataFrame,
    eval_time: Column,
    constant_threshold_sec: int | None = None,
    static_age_days: int = STATIC_TABLE_AGE_DAYS,
    lookback_days: int | None = 14,
    num_std: float = 3.0,
    apply_grace: bool = True,
) -> DataFrame:
    """Per-partition freshness verdict rows (M7 dispatch)."""
    # Static detection must see pre-lookback history (a static partition
    # has no commits inside the window at all) — filter ops but keep the
    # full time range, then cap per group to the newest N commits.
    filtered = filter_history(commits, eval_time=None, lookback_days=None)
    w = Window.partitionBy("partition_id").orderBy(F.col("timestamp").desc())
    capped = (
        filtered.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= MAX_TRAINING_POINTS)
        .drop("_rn")
    )
    ts = capped.select("partition_id", "timestamp", eval_time.cast("timestamp").alias("_eval"))

    def check(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["partition_id"].iloc[0])
        eval_ts = pdf["_eval"].iloc[0]
        times = pdf["timestamp"].sort_values().reset_index(drop=True)
        last = times.iloc[-1]
        row = {
            "partition_id": pid,
            "rule_id": RULE_ID,
            "status": V.UNKNOWN,
            "last_data_update": last,
            "predicted_next_data_update": None,
            "predicted_upper_bound_next_data_update": None,
            "staleness_age_seconds": None,
            "error_code": None,
        }
        # M1 static short-circuit
        if last < eval_ts - pd.Timedelta(days=static_age_days):
            row["status"] = V.HEALTHY
            return pd.DataFrame([row])
        # M2 constant-threshold override
        if constant_threshold_sec is not None:
            upper = last + pd.Timedelta(seconds=constant_threshold_sec)
            row["status"] = V.HEALTHY if eval_ts <= upper else V.UNHEALTHY
            row["predicted_next_data_update"] = upper
            row["predicted_upper_bound_next_data_update"] = upper
            if row["status"] == V.UNHEALTHY:
                row["staleness_age_seconds"] = int((eval_ts - upper).total_seconds())
            return pd.DataFrame([row])
        # M3 model path over lookback-window durations
        if lookback_days is not None:
            in_window = times[times >= eval_ts - pd.Timedelta(days=lookback_days)]
            if len(in_window) > MIN_TRAINING_DURATIONS:
                times = in_window.reset_index(drop=True)
        durations = times.diff().dt.total_seconds().dropna().to_numpy()
        if len(durations) < MIN_TRAINING_DURATIONS:
            row["error_code"] = "NOT_ENOUGH_DATA"
            return pd.DataFrame([row])
        try:
            point, _lo, hi = forecast_band(durations, num_std=num_std)
        except Exception:
            row["error_code"] = "MODEL_FIT_FAILED"
            return pd.DataFrame([row])
        min_dur = float(durations.min())
        if point <= 0:
            point = min_dur  # clamp (reference freshness_utils.py:201)
        hi = max(hi, point)
        if apply_grace and len(durations) > 1:
            grace = _grace_seconds(float(pd.Series(durations).median()))
            hi = max(hi, point + grace)
        # whole seconds: keeps timestamps at micros precision for Arrow
        pred = last + pd.Timedelta(seconds=int(round(point)))
        upper = last + pd.Timedelta(seconds=int(round(hi)))
        row["predicted_next_data_update"] = pred
        row["predicted_upper_bound_next_data_update"] = upper
        row["status"] = V.HEALTHY if eval_ts <= upper else V.UNHEALTHY
        if row["status"] == V.UNHEALTHY:
            row["staleness_age_seconds"] = int((eval_ts - upper).total_seconds())
        return pd.DataFrame([row])

    return ts.groupBy("partition_id").applyInPandas(check, RESULT_SCHEMA)


# ------------------------------------------------------------------
# Event-latency freshness (SURVEY.md §2 M4/M5, O4, S3)
# ------------------------------------------------------------------

EVENT_RULE_ID = "freshness.event"
MAX_EVENT_TRAINING_POINTS = 360  # reference model_config.py:25
MIN_EVENT_GAP_SEC = 3600  # reference model_config.py:31

EVENT_RESULT_SCHEMA = (
    "partition_id int, rule_id string, status string, "
    "last_event timestamp, actual_latency_sec long, "
    "predicted_upper_bound_latency_sec long, n_training_points long, "
    "error_code string"
)


def event_latency_series(commits: DataFrame, events: DataFrame, by: str = "partition_id") -> DataFrame:
    """Per-commit event latency: commit_ts − max(event_ts ≤ commit_ts).

    The reference issues one `SELECT MAX(col) ... TIMESTAMP AS OF ts`
    Spark query PER COMMIT from a nested driver thread pool (reference
    freshness_utils.py:285-324). Here all commits resolve in ONE plan:
    union commits and events on a common timeline, and a running-max
    window per partition gives each commit the newest event at-or-before
    it — no per-commit queries, no theta join.
    """
    c = commits.select(F.col(by), F.col("timestamp").alias("_t"), F.lit(1).alias("_is_commit"), F.lit(None).cast("timestamp").alias("_event_ts"))
    e = events.select(F.col(by), F.col("event_ts").alias("_t"), F.lit(0).alias("_is_commit"), F.col("event_ts").alias("_event_ts"))
    timeline = c.unionByName(e)
    # events sort before commits at the same instant (commit sees them)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col("_t").asc(), F.col("_is_commit").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_max = timeline.withColumn("_max_event", F.max("_event_ts").over(w))
    return (
        with_max.filter(F.col("_is_commit") == 1)
        .select(
            F.col(by),
            F.col("_t").alias("commit_ts"),
            F.col("_max_event").alias("max_event_ts"),
            (F.unix_timestamp("_t") - F.unix_timestamp("_max_event")).alias("latency_sec"),
        )
    )


def _greedy_newest_first(times, min_gap_sec: int, max_points: int) -> list[int]:
    """O4 core: indices (into the CHRONOLOGICALLY ordered input) kept by
    the newest→oldest greedy spacing walk — keep the newest point, then
    every next-older point STRICTLY more than ``min_gap_sec`` from the
    last KEPT one, breaking only after the kept count EXCEEDS
    ``max_points`` (so up to ``max_points`` + 1 points survive) — exact
    reference semantics (freshness_utils.py:233-254: ``> min_gap`` and
    a post-append ``len > max`` break). Returned indices are
    chronological. Pure function — shared by the standalone subsample
    operator and the event-freshness training path, and unit-testable
    without Spark."""
    kept: list[int] = []
    last_kept = None
    for i in range(len(times) - 1, -1, -1):
        t = times[i]
        if last_kept is None or (last_kept - t).total_seconds() > min_gap_sec:
            kept.append(i)
            last_kept = t
        if len(kept) > max_points:
            break
    return kept[::-1]


def subsample_event_times(
    df: DataFrame,
    by: str = "partition_id",
    ts_col: str = "timestamp",
    min_gap_sec: int = MIN_EVENT_GAP_SEC,
    max_points: int = MAX_EVENT_TRAINING_POINTS,
) -> DataFrame:
    """O4: keep the newest timestamps spaced strictly more than
    ``min_gap_sec`` apart, stopping once the kept count exceeds
    ``max_points`` (≤ max_points + 1 survive) — exact greedy
    newest→oldest reference semantics (freshness_utils.py:233-254),
    one applyInPandas call per group (the greedy chain is sequential
    by construction)."""
    schema = f"{by} int, {ts_col} timestamp"

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = pdf[ts_col].sort_values(ascending=True).reset_index(drop=True)
        idx = _greedy_newest_first(list(ts), min_gap_sec, max_points)
        return pd.DataFrame({by: pdf[by].iloc[0], ts_col: [ts[i] for i in idx]})

    return df.select(by, ts_col).groupBy(by).applyInPandas(pick, schema)


def _event_grace_seconds(median_latency_sec: float) -> float:
    """Event-latency grace table (reference freshness_utils.py:577-589):
    median < 60min → max(median, 30min); else min(12h, 0.5·median)."""
    if median_latency_sec < 60 * 60:
        return max(median_latency_sec, 30 * 60.0)
    return min(12 * 3600.0, median_latency_sec * 0.5)


def event_freshness_verdicts(
    commits: DataFrame,
    events: DataFrame,
    eval_time: Column,
    latency_threshold_sec: int | None = None,
    num_std: float = 3.0,
    apply_grace: bool = True,
    min_training: int = 3,
    static_age_days: int = STATIC_TABLE_AGE_DAYS,
) -> DataFrame:
    """M4 (model) / M5 (constant override) event-latency freshness.

    Model path (reference check_is_fresh_event_auto_arima,
    freshness_utils.py:350-410): the latency series is per-commit
    (commit_ts − max event at commit); the ACTUAL latency is the LAST
    commit's latency, the model trains on the earlier ones — O4-
    subsampled first (newest-first greedy, spaced > 1h, stop after the
    kept count exceeds 360 — up to 361 points; reference
    model_config.py:25,31 via freshness_utils.py:233-254) so
    a dense-commit partition never ships an unbounded series into the
    fit — verdict Healthy iff actual ≤ forecast upper bound (+ grace).
    Constant override path (M5, check_is_fresh_event_override): actual
    = eval_time − last event vs the threshold.
    Static partitions (last commit older than ``static_age_days``)
    short-circuit Healthy — M1 parity: the reference skips all checks
    for static tables, never alarming on an intentionally frozen one."""
    filtered = filter_history(commits, eval_time=None, lookback_days=None)
    lat = event_latency_series(filtered, events).filter(F.col("latency_sec").isNotNull())
    lat = lat.select(
        "partition_id", "commit_ts", "max_event_ts", "latency_sec", eval_time.cast("timestamp").alias("_eval")
    )

    def check(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["partition_id"].iloc[0])
        eval_ts = pdf["_eval"].iloc[0]
        g = pdf.sort_values("commit_ts")
        last_event = g["max_event_ts"].max()
        actual = int((eval_ts - last_event).total_seconds())
        row = {
            "partition_id": pid,
            "rule_id": EVENT_RULE_ID,
            "status": V.UNKNOWN,
            "last_event": last_event,
            "actual_latency_sec": actual,
            "predicted_upper_bound_latency_sec": None,
            "n_training_points": None,
            "error_code": None,
        }
        # M1 static short-circuit (commit history is the staleness signal)
        if g["commit_ts"].max() < eval_ts - pd.Timedelta(days=static_age_days):
            row["status"] = V.HEALTHY
            return pd.DataFrame([row])
        if latency_threshold_sec is not None:
            row["predicted_upper_bound_latency_sec"] = int(latency_threshold_sec)
            row["status"] = V.HEALTHY if actual <= latency_threshold_sec else V.UNHEALTHY
            return pd.DataFrame([row])
        series = g["latency_sec"].to_numpy(dtype="float64")
        if len(series) < min_training:
            row["error_code"] = "NOT_ENOUGH_DATA"
            return pd.DataFrame([row])
        # actual = the last commit's latency; train on the earlier ones
        # (reference excludes the evaluated point from training,
        # freshness_utils.py:398-401), O4-subsampled by commit time
        actual = int(series[-1])
        row["actual_latency_sec"] = actual
        commit_ts = g["commit_ts"].reset_index(drop=True)
        idx = _greedy_newest_first(
            list(commit_ts.iloc[:-1]), MIN_EVENT_GAP_SEC, MAX_EVENT_TRAINING_POINTS
        )
        train = series[:-1][idx]
        row["n_training_points"] = len(train)
        if len(train) < 2:
            row["error_code"] = "NOT_ENOUGH_DATA"
            return pd.DataFrame([row])
        try:
            point, _lo, hi = forecast_band(train, num_std=num_std)
        except Exception:
            row["error_code"] = "MODEL_FIT_FAILED"
            return pd.DataFrame([row])
        hi = max(hi, point, 0.0)
        if apply_grace:
            hi = hi + _event_grace_seconds(float(pd.Series(train).median()))
        row["predicted_upper_bound_latency_sec"] = int(hi)
        row["status"] = V.HEALTHY if actual <= hi else V.UNHEALTHY
        return pd.DataFrame([row])

    return lat.groupBy("partition_id").applyInPandas(check, EVENT_RESULT_SCHEMA)


def overall_freshness(commit_verdicts: DataFrame, event_verdicts: DataFrame) -> DataFrame:
    """M10: overall = worst-of(commit, event) per partition, priority
    Unhealthy > Unknown > Skipped > Healthy (reference
    freshness_info.py:103-114)."""
    c = commit_verdicts.select("partition_id", F.col("status").alias("commit_status"))
    e = event_verdicts.select("partition_id", F.col("status").alias("event_status"))
    j = c.join(e, "partition_id", "outer").select(
        "partition_id",
        F.coalesce("commit_status", F.lit(V.UNKNOWN)).alias("commit_status"),
        F.coalesce("event_status", F.lit(V.UNKNOWN)).alias("event_status"),
    )
    return j.select(
        "partition_id",
        "commit_status",
        "event_status",
        V.fold_statuses("commit_status", "event_status").alias("overall_status"),
    )
