"""Deterministic forecast-band model (driver-free, executor-side numpy).

The reference fits pmdarima auto-ARIMA per table on the driver
(reference anomalydetection/utils/common_utils.py:281-401: seasonal
Fourier-featurized + non-seasonal candidates, BIC selection, CI =
±num_std·std(residuals) at common_utils.py:442-449; seasonality via
ACF peak with threshold 0.65 at common_utils.py:209-277). pmdarima is
not available here and ARIMA internals are not the contract — the
contract is "point forecast + lower/upper band → verdict". This module
keeps that contract with a closed-form model:

  trend (OLS over time index) + optional seasonal-mean component
  (season length = ACF argmax over lags 2..52 if ACF > 0.65, mirroring
  the reference's inference rule) ; band = point ± num_std·std(resid).

Pure numpy, O(n) per series, deterministic — designed to run inside
``applyInPandas`` where each group's series is small (the reference
caps training at 1000 points, model_config.py:21; we keep that cap).
"""

from __future__ import annotations

import numpy as np

ACF_THRESHOLD = 0.65  # reference common_utils.py seasonality threshold
MAX_SEASON_LAG = 52
DEFAULT_NUM_STD = 3.0  # reference model_config.py:92-94 num_std_for_residuals
MAX_TRAINING_POINTS = 1000  # reference model_config.py:21
SUFFICIENT_TRAINING_POINTS = 250  # reference model_config.py:88
JITTER_REPETITIONS = 1  # reference model_config.py:86


def _acf(y: np.ndarray, lag: int) -> float:
    n = len(y)
    if lag >= n:
        return 0.0
    c = y - y.mean()
    denom = float(np.dot(c, c))
    if denom == 0.0:
        return 0.0
    return float(np.dot(c[:-lag], c[lag:]) / denom)


def jitter_boost(
    y: np.ndarray,
    seasonal_period: int,
    sufficient: int = SUFFICIENT_TRAINING_POINTS,
    repetitions: int = JITTER_REPETITIONS,
    seed: int = 0,
) -> tuple[np.ndarray, bool]:
    """M11: jittered synthetic boosting for short seasonal series —
    semantics of reference generate_jittered_synthetic_data
    (common_utils.py:164-206): prepend up to ``repetitions`` jittered
    copies of the whole-cycle prefix (complete periods only), jitter
    uniform in ±min(median//10, 600) seconds, seeded 0 — deterministic.
    Returns (series, whether_synthetic_was_added)."""
    y = np.asarray(y, dtype=np.float64)
    max_synth = sufficient - len(y)
    if max_synth <= 0:
        return y, False
    rng = np.random.RandomState(seed)
    t = y[:max_synth]
    num_copy = len(t) - (len(t) % seasonal_period)
    if num_copy == 0:
        return y, False
    num_sets = min(max_synth // num_copy, repetitions)
    snippet = t[:num_copy]
    median = float(np.median(t))
    # clamp at 0: infer_season feeds DETRENDED series here, whose median
    # can be negative — a negative amount would invert the randint bounds
    jitter_amount = max(int(min(median // 10, 600)), 0)
    arr = np.tile(snippet, num_sets).astype(np.float64)
    if jitter_amount > 0:
        arr += rng.randint(-jitter_amount, jitter_amount + 1, arr.shape)
    return np.append(arr.flatten(), t), True


def infer_season(
    y: np.ndarray,
    max_lag: int = MAX_SEASON_LAG,
    threshold: float = ACF_THRESHOLD,
    boost: bool = True,
) -> int | None:
    """Season length = argmax ACF over lags 2..min(max_lag, n//2) when the
    peak exceeds the threshold; else None (non-seasonal).

    With ``boost`` (reference boost_seasonal_period_acf, common_utils.py:
    236-252): when the best candidate misses the threshold on a SHORT
    series, re-test its ACF on the jitter-boosted series — replicated
    whole cycles raise a true season's autocorrelation above the noise
    floor while leaving aperiodic series below threshold. Training still
    uses the original data (train_on_jittered_data=False default)."""
    n = len(y)
    hi = min(max_lag, n // 2)
    if hi < 2:
        return None
    lags = np.arange(2, hi + 1)
    vals = np.array([_acf(y, int(l)) for l in lags])
    best = int(np.argmax(vals))
    if vals[best] > threshold:
        return int(lags[best])
    period = int(lags[best])
    if boost:
        boosted, added = jitter_boost(y, period)
        if added:
            # re-run the ACF argmax on the boosted series (reference
            # recomputes period + acf_val post-boost, common_utils.py:
            # 244-249); lag stays bounded by the ORIGINAL length
            hi2 = min(max_lag, n, len(boosted) // 2)
            if hi2 >= 2:
                lags2 = np.arange(2, hi2 + 1)
                vals2 = np.array([_acf(boosted, int(l)) for l in lags2])
                b2 = int(np.argmax(vals2))
                if vals2[b2] > threshold:
                    return int(lags2[b2])
    return None


def forecast_band(
    y: np.ndarray, num_std: float = DEFAULT_NUM_STD, min_sigma_frac: float = 0.0
) -> tuple[float, float, float]:
    """Forecast the next value of ``y`` with a symmetric band.

    Returns (point, lower, upper). Deterministic; len(y) >= 2 required.
    ``min_sigma_frac`` optionally floors sigma at a fraction of the mean
    so a zero-variance training series still yields a usable band.
    """
    y = np.asarray(y, dtype=np.float64)[-MAX_TRAINING_POINTS:]
    n = len(y)
    if n < 2:
        raise ValueError("need at least 2 training points")

    t = np.arange(n, dtype=np.float64)
    # seasonality is inferred on the DETRENDED series: a pure trend has
    # high ACF at every lag and would otherwise fake a season
    tb, yb = t.mean(), y.mean()
    d = float(np.sum((t - tb) ** 2))
    pre_slope = float(np.sum((t - tb) * (y - yb)) / d) if d > 0 else 0.0
    season = infer_season(y - pre_slope * t)

    def fit(with_season: bool) -> tuple[np.ndarray, float, float, int]:
        """Returns (fitted, point_forecast, rss, k_params)."""
        seasonal = np.zeros(n)
        next_seasonal = 0.0
        k = 2  # slope + intercept
        if with_season and season is not None and n >= 2 * season:
            phase = np.arange(n) % season
            means = np.array([y[phase == p].mean() for p in range(season)])
            means = means - means.mean()
            seasonal = means[phase]
            next_seasonal = float(means[n % season])
            k += season - 1
        resid_ts = y - seasonal
        tbar, ybar = t.mean(), resid_ts.mean()
        denom = float(np.sum((t - tbar) ** 2))
        slope = float(np.sum((t - tbar) * (resid_ts - ybar)) / denom) if denom > 0 else 0.0
        intercept = ybar - slope * tbar
        fitted = intercept + slope * t + seasonal
        point = intercept + slope * n + next_seasonal
        rss = float(np.sum((y - fitted) ** 2))
        return fitted, point, rss, k

    # M12 parity: fit a seasonal and a non-seasonal candidate, pick the
    # lower BIC (reference fits seasonal Fourier-featurized + plain
    # auto-ARIMA and selects by BIC, common_utils.py:281-401)
    candidates = [fit(False)]
    if season is not None and n >= 2 * season:
        candidates.append(fit(True))

    def bic(rss: float, k: int) -> float:
        return n * np.log(max(rss / n, 1e-300)) + k * np.log(n)

    fitted, point, rss, _k = min(candidates, key=lambda c: bic(c[2], c[3]))

    resid = y - fitted
    sigma = float(np.std(resid, ddof=1)) if n > 2 else float(np.abs(resid).max())
    if min_sigma_frac > 0:
        sigma = max(sigma, min_sigma_frac * abs(float(y.mean())))
    half = num_std * sigma
    return float(point), float(point - half), float(point + half)
