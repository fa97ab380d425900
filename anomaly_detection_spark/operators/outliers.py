"""Univariate outlier detection over multivariate segmented time series
(SURVEY.md §2 M14/M15, §3.4) — the distributed generalization of the
reference's third_party layer.

Algorithms (reimplemented from their published descriptions, NOT from
the reference's GPL-derived code — see SURVEY.md provenance notes):

- SPOT / DSPOT (Siffer et al., KDD'17 "Anomaly Detection in Streams
  with Extreme Value Theory"): initial threshold t = empirical
  ``init_quantile``; excesses over t fit a Generalized Pareto
  Distribution via Grimshaw's maximum-likelihood reduction (solved
  numerically on a deterministic candidate grid); alarm threshold
  z_q = t + (σ/γ)((q·n/N_t)^(−γ) − 1); streaming updates refit on new
  peaks. DSPOT subtracts a depth-d rolling mean first (drift).
- Huber deviation (reference third_party/univariate.py semantics):
  robust location/scale via iterated Huber M-estimation (median/MAD
  start, ψ-clipping at c=1.345); anomaly iff
  |x − loc| > tolerance · scale, tolerance 5.0, min 10 points.

Distribution model: the reference's adapter contract is one row per
entity with aligned ``timeseries``/``metricseries`` arrays (reference
third_party/common.py:98-116); training/inference run per entity on
executors (the reference used row UDFs returning cloudpickled models —
reference common.py:177-210). Here each entity's series is processed in
ONE vectorized ``applyInPandas`` call; results come back as rows, state
never rides in closures.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# ---------------------------------------------------------------- GPD / SPOT


def _grimshaw_gpd(peaks: np.ndarray) -> tuple[float, float]:
    """Fit GPD(γ sigma) to excesses via Grimshaw's trick: the 2-param MLE
    reduces to a 1-D root/argmax search over x where γ = mean(log(1+x·Y))
    and σ = γ/x. Deterministic candidate grid (no RNG)."""
    peaks = np.asarray(peaks, dtype=np.float64)
    n = len(peaks)
    ymin, ymax, ymean = peaks.min(), peaks.max(), peaks.mean()
    if n == 0 or ymax <= 0:
        return 0.1, max(ymean, 1e-9)
    eps = 1e-8
    # candidate x ranges per Grimshaw: x ∈ (-1/ymax, +) split into two grids
    lo = -1.0 / ymax + eps
    candidates = np.concatenate(
        [
            np.linspace(lo, -eps, 60),
            np.linspace(eps, 2.0 / max(ymean, 1e-9), 60),
        ]
    )

    def loglik(x: float) -> tuple[float, float, float]:
        u = 1.0 + x * peaks
        if np.any(u <= 0):
            return -np.inf, 0.0, 0.0
        gamma = float(np.mean(np.log(u)))
        if gamma == 0.0:
            return -np.inf, 0.0, 0.0
        sigma = gamma / x
        if sigma <= 0:
            return -np.inf, 0.0, 0.0
        ll = -n * np.log(sigma) - (1.0 + 1.0 / gamma) * float(np.sum(np.log(u)))
        return ll, gamma, sigma

    best = (-np.inf, 0.1, max(ymean, 1e-9))
    for x in candidates:
        ll, g, s = loglik(float(x))
        if ll > best[0]:
            best = (ll, g, s)
    # moment-estimator fallback comparison (γ→0 exponential case)
    ll_exp = -n * np.log(ymean) - n
    if ll_exp > best[0]:
        return 1e-9, float(ymean)
    return best[1], best[2]


def spot_threshold(
    series: np.ndarray, q: float = 1e-4, init_quantile: float = 0.98
) -> tuple[float, float]:
    """Batch-SPOT: returns (t, z_q). t = init_quantile empirical
    threshold, z_q = extreme quantile via GPD fit on excesses."""
    y = np.asarray(series, dtype=np.float64)
    n = len(y)
    t = float(np.quantile(y, init_quantile))
    peaks = y[y > t] - t
    if len(peaks) < 3:
        return t, float(y.max()) if n else t
    gamma, sigma = _grimshaw_gpd(peaks)
    nt = len(peaks)
    r = q * n / nt
    if abs(gamma) < 1e-8:
        zq = t + sigma * float(np.log(1.0 / max(r, 1e-300)))
    else:
        zq = t + (sigma / gamma) * (r ** (-gamma) - 1.0)
    return t, float(zq)


def spot_flags(
    series: np.ndarray,
    q: float = 1e-4,
    init_fraction: float = 0.5,
    init_quantile: float = 0.98,
    drift_depth: int = 0,
) -> np.ndarray:
    """SPOT anomaly flags for a series: calibrate on the first
    ``init_fraction`` then stream the rest (alarm if > z_q; peaks
    between t and z_q update the fit). drift_depth > 0 = DSPOT (subtract
    depth-d rolling mean of non-anomalous history first)."""
    y = np.asarray(series, dtype=np.float64)
    n = len(y)
    n_init = max(int(n * init_fraction), 10)
    flags = np.zeros(n, dtype=bool)
    if n <= n_init:
        return flags

    if drift_depth > 0:
        base_hist = list(y[max(0, n_init - drift_depth) : n_init])
        work_init = y[:n_init] - pd.Series(y[:n_init]).rolling(drift_depth, min_periods=1).mean().to_numpy()
    else:
        work_init = y[:n_init]

    t, zq = spot_threshold(work_init, q=q, init_quantile=init_quantile)
    peaks = list(work_init[work_init > t] - t)
    n_seen = n_init
    for i in range(n_init, n):
        if drift_depth > 0:
            mean_d = float(np.mean(base_hist[-drift_depth:])) if base_hist else 0.0
            x = y[i] - mean_d
        else:
            x = y[i]
        if x > zq:
            flags[i] = True
            continue  # anomalies don't update the model (per SPOT)
        if x > t:
            peaks.append(x - t)
            n_seen += 1
            gamma, sigma = _grimshaw_gpd(np.asarray(peaks))
            r = q * n_seen / len(peaks)
            if abs(gamma) < 1e-8:
                zq = t + sigma * float(np.log(1.0 / max(r, 1e-300)))
            else:
                zq = t + (sigma / gamma) * (r ** (-gamma) - 1.0)
        else:
            n_seen += 1
        if drift_depth > 0:
            base_hist.append(y[i])
    return flags


THRESHOLDS_SCHEMA = "entity string, t double, zq double, n_peaks int"


def spot_thresholds(
    segments: DataFrame,
    entity_col: str = "entity",
    metric_col: str = "metricseries",
    q: float = 1e-4,
    init_quantile: float = 0.98,
) -> DataFrame:
    """Batch-SPOT calibration per entity: (entity, t, zq, n_peaks) from
    :func:`spot_threshold` — the deterministic mathematical core of M14
    (empirical init quantile → Grimshaw candidate-grid GPD fit on the
    excesses → extreme-quantile alarm threshold z_q; the initialization
    step of reference third_party/spot.py:154-265, recast batch-first).

    Use this when a fleet of series needs thresholds calibrated once
    and then enforced by a cheap JVM comparison (value > z_q) instead
    of streaming per-point flags: at 10^6+ entities the calibration is
    one ``mapInPandas`` pass (many entities per Arrow batch, same
    contract as :func:`detect_anomalies`) and enforcement never leaves
    whole-stage codegen. Unlike the streaming loop in
    :func:`spot_flags`, this path is closed-form per entity, which is
    what makes it DuckDB-oracle-checkable end-to-end."""
    def run_batches(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                y = np.asarray(getattr(r, metric_col), dtype=np.float64)
                t, zq = spot_threshold(y, q=q, init_quantile=init_quantile)
                out.append(
                    {
                        "entity": getattr(r, entity_col),
                        "t": float(t),
                        "zq": float(zq),
                        "n_peaks": int((y > t).sum()),
                    }
                )
            yield pd.DataFrame(out, columns=["entity", "t", "zq", "n_peaks"])

    seg = segments.select(entity_col, metric_col).repartition(
        segments.sparkSession.sparkContext.defaultParallelism
    )
    return seg.mapInPandas(run_batches, THRESHOLDS_SCHEMA)


# ---------------------------------------------------------------- Huber


def huber_location_scale(y: np.ndarray, c: float = 1.345, iters: int = 30) -> tuple[float, float]:
    """Iterated Huber M-estimate of location + concomitant scale.
    Start: median / normalized MAD; then ψ-clipped mean updates."""
    y = np.asarray(y, dtype=np.float64)
    loc = float(np.median(y))
    mad = float(np.median(np.abs(y - loc)))
    scale = max(mad * 1.4826, 1e-12)
    for _ in range(iters):
        z = (y - loc) / scale
        clipped = np.clip(z, -c, c)
        new_loc = loc + scale * float(np.mean(clipped))
        # Huber proposal-2-style scale update
        chi = np.minimum(np.abs(z), c) ** 2
        beta = 0.7102  # E[min(|Z|,c)^2] for Z~N(0,1), c=1.345
        new_scale = scale * float(np.sqrt(max(np.mean(chi) / beta, 1e-12)))
        if abs(new_loc - loc) < 1e-10 * max(1.0, abs(loc)) and abs(new_scale - scale) < 1e-10 * scale:
            loc, scale = new_loc, new_scale
            break
        loc, scale = new_loc, max(new_scale, 1e-12)
    return loc, scale


def huber_flags(series: np.ndarray, tolerance: float = 5.0, min_points: int = 10) -> np.ndarray:
    """Anomaly iff |x − loc| > tolerance·scale (reference
    third_party/univariate.py: tolerance 5.0, min 10 points → no flags
    below the minimum)."""
    y = np.asarray(series, dtype=np.float64)
    if len(y) < min_points:
        return np.zeros(len(y), dtype=bool)
    loc, scale = huber_location_scale(y)
    if scale <= 1e-11:
        return np.abs(y - loc) > 0
    return np.abs(y - loc) > tolerance * scale


HUBER_PARAMS_SCHEMA = "entity string, location double, scale double, n_anomalies int"


def huber_params(
    segments: DataFrame,
    entity_col: str = "entity",
    metric_col: str = "metricseries",
    tolerance: float = 5.0,
    min_points: int = 10,
) -> DataFrame:
    """Per-entity Huber calibration: (entity, location, scale,
    n_anomalies) from :func:`huber_location_scale` — the M15 companion
    to :func:`spot_thresholds` (the location/scale estimation inside
    reference third_party/univariate.py:24-93, exposed as a fleet-wide
    calibration surface). Calibrate the robust location/scale for
    a fleet of series in one ``mapInPandas`` pass, then enforce
    |x − location| > tolerance·scale JVM-side. Entities below
    ``min_points`` emit null params and zero anomalies (the
    :func:`huber_flags` contract). The IRLS chain is deterministic,
    which makes this path DuckDB-oracle-checkable (recursive CTE twin
    in __spark_entry__.py)."""
    def run_batches(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                y = np.asarray(getattr(r, metric_col), dtype=np.float64)
                if len(y) < min_points:
                    out.append(
                        {"entity": getattr(r, entity_col), "location": None, "scale": None, "n_anomalies": 0}
                    )
                    continue
                loc, scale = huber_location_scale(y)
                if scale <= 1e-11:
                    flags = np.abs(y - loc) > 0
                else:
                    flags = np.abs(y - loc) > tolerance * scale
                out.append(
                    {
                        "entity": getattr(r, entity_col),
                        "location": float(loc),
                        "scale": float(scale),
                        "n_anomalies": int(flags.sum()),
                    }
                )
            yield pd.DataFrame(out, columns=["entity", "location", "scale", "n_anomalies"])

    seg = segments.select(entity_col, metric_col).repartition(
        segments.sparkSession.sparkContext.defaultParallelism
    )
    return seg.mapInPandas(run_batches, HUBER_PARAMS_SCHEMA)


# ---------------------------------------------------------------- distributed

FLAGS_SCHEMA = "entity string, ts array<string>, is_anomaly array<boolean>, n_anomalies int"


def align_series_to_spine(
    df: DataFrame,
    entity_col: str = "entity",
    ts_col: str = "ts",
    value_col: str = "value",
    step_sec: int = 3600,
    fill: str = "zero",
) -> DataFrame:
    """P1: join-against-spine time alignment — turn an irregular long-
    format stream (entity, ts, value) into the segmented contract
    :func:`detect_anomalies` consumes (one row per entity, index-aligned
    ``timeseries``/``metricseries`` arrays over a REGULAR global grid).

    The reference required callers to pre-align series on the driver
    (third_party/common.py:98-116 documents the aligned-arrays
    contract but provides no aligner); here alignment is a Spark plan:
    bucket to the grid (avg within bucket), LEFT JOIN against the
    entity × grid spine, fill gaps (``zero`` or ``ffill`` — forward
    fill via last_value ignoring nulls), then one collect per entity.
    The spine is built with sequence/explode — no driver loops — and
    the only shuffles are the bucket aggregation and the per-entity
    collect, both keyed on (entity, bucket)."""
    if fill not in ("zero", "ffill"):
        raise ValueError(f"unknown fill {fill!r}; expected zero|ffill")
    epoch = F.unix_timestamp(F.col(ts_col)) if dict(df.dtypes)[ts_col] == "timestamp" else F.col(ts_col).cast("bigint")
    b = (
        df.select(F.col(entity_col).alias("entity"), (F.floor(epoch / step_sec) * step_sec).alias("bucket"), F.col(value_col).alias("_v"))
        .groupBy("entity", "bucket")
        .agg(F.avg("_v").alias("_v"))
    )
    rng = b.agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
    spine = (
        b.select("entity").distinct()
        .crossJoin(F.broadcast(rng))
        .select("entity", F.explode(F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step_sec))).alias("bucket"))
    )
    joined = spine.join(b, ["entity", "bucket"], "left")
    if fill == "zero":
        joined = joined.withColumn("_v", F.coalesce(F.col("_v"), F.lit(0.0)))
    else:
        from pyspark.sql import Window as _W

        w = _W.partitionBy("entity").orderBy("bucket").rowsBetween(_W.unboundedPreceding, 0)
        joined = joined.withColumn(
            "_v", F.coalesce(F.last("_v", ignorenulls=True).over(w), F.lit(0.0))
        )
    return (
        joined.groupBy("entity")
        .agg(F.sort_array(F.collect_list(F.struct("bucket", "_v"))).alias("_z"))
        .select(
            "entity",
            F.transform("_z", lambda s: s["bucket"].cast("string")).alias("timeseries"),
            F.transform("_z", lambda s: s["_v"]).alias("metricseries"),
        )
    )


def detect_anomalies(
    segments: DataFrame,
    method: str = "huber",
    entity_col: str = "entity",
    ts_col: str = "timeseries",
    metric_col: str = "metricseries",
    **params,
) -> DataFrame:
    """Distributed per-entity outlier detection over the reference's
    segmented contract: one row per entity with aligned
    array<string> timestamps + array<double> metrics. Runs as
    ``mapInPandas``: the input is ALREADY one row per entity, so each
    Arrow batch carries MANY entities into one Python call — no
    per-entity groupBy shuffle and no one-group-per-call worker
    round-trips (the earlier ``applyInPandas`` formulation paid both).
    Flags return as aligned arrays (the reference exploded a
    map<string,double> — we keep arrays, same information)."""
    if method not in ("huber", "spot", "dspot"):
        raise ValueError(f"unknown method {method!r}; expected huber|spot|dspot")
    # copy before defaulting: never let a dspot default leak into a dict
    # an adapter might thread through repeated calls
    params = dict(params)
    if method == "dspot":
        params.setdefault("drift_depth", 10)

    def run_batches(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                series = np.asarray(getattr(r, metric_col), dtype=np.float64)
                if method == "huber":
                    flags = huber_flags(series, **params)
                else:
                    flags = spot_flags(series, **params)
                out.append(
                    {
                        "entity": getattr(r, entity_col),
                        "ts": list(getattr(r, ts_col)),
                        "is_anomaly": [bool(b) for b in flags],
                        "n_anomalies": int(flags.sum()),
                    }
                )
            yield pd.DataFrame(out, columns=["entity", "ts", "is_anomaly", "n_anomalies"])

    # round-robin repartition before the Python stage: upstream aggs
    # often AQE-coalesce to few partitions (fine for JVM work, serial
    # for Python) — one shuffle of the (already reduced) segment rows
    # spreads entities across workers. Same shuffle count as a
    # groupBy(entity).applyInPandas plan, but each Arrow batch still
    # carries many entities per Python call.
    seg = segments.select(entity_col, ts_col, metric_col).repartition(
        segments.sparkSession.sparkContext.defaultParallelism
    )
    return seg.mapInPandas(run_batches, FLAGS_SCHEMA)


def anomaly_alarms(flags: DataFrame) -> DataFrame:
    """Explode aligned flag arrays to (entity, ts, is_anomaly) alarm rows
    — the reference's exploded-map output shape (common.py:324-328)."""
    return flags.select(
        "entity",
        F.explode(F.arrays_zip("ts", "is_anomaly")).alias("z"),
    ).select("entity", F.col("z.ts").alias("ts"), F.col("z.is_anomaly").alias("is_anomaly")).filter(
        F.col("is_anomaly")
    )
