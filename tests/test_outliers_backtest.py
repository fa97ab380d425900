import numpy as np
import pyspark.sql.functions as F

from anomaly_detection_spark.functions.errors import ErrorCode, clip_error_message, match_error_message_to_code
from anomaly_detection_spark.functions.forecast import forecast_band, infer_season
from anomaly_detection_spark.operators.backtest import alarm_accuracy, forecast_quality, rolling_backtest
from anomaly_detection_spark.operators.blast_radius import impact_level
from anomaly_detection_spark.operators.outliers import (
    anomaly_alarms,
    detect_anomalies,
    huber_flags,
    spot_flags,
)


def test_huber_flags_planted_spikes():
    rng = np.random.default_rng(0)
    y = rng.normal(10, 1, 300)
    y[[100, 200]] = [40, -25]
    flags = huber_flags(y)
    assert set(np.where(flags)[0]) == {100, 200}
    assert not huber_flags(rng.normal(5, 1, 200)).any()
    assert not huber_flags(np.array([1.0, 2.0, 3.0])).any()  # < min_points


def test_spot_flags_planted_extremes():
    rng = np.random.default_rng(1)
    y = rng.normal(0, 1, 1000)
    y[900] = 15.0
    flags = spot_flags(y, q=1e-4)
    assert flags[900]
    assert flags.sum() <= 3  # near-zero false alarms at q=1e-4


def test_spot_thresholds_distributed_and_oracle_fixture_pins(spark):
    """spot_thresholds (batch-SPOT calibration) matches the local
    spot_threshold per entity, and the spot_thresholds_synthetic oracle
    fixture is pinned safe: >=3 excess peaks per entity (GPD path, not
    the max() fallback), the Grimshaw argmax winner leads the runner-up
    by a wide log-likelihood margin (no cross-engine ulp flip), t*100
    is an exact integer (ROUND-robust), and zq*1e4 sits away from the
    FLOOR boundary."""
    from anomaly_detection_spark.operators.outliers import spot_threshold, spot_thresholds

    series = {
        f"e{e}": np.array([(i * i * 104729 + e * 997) % 1009 for i in range(240)], dtype=float)
        for e in range(4)
    }
    seg = spark.createDataFrame(
        [(k, [str(i) for i in range(240)], [float(v) for v in y]) for k, y in series.items()],
        "entity string, timeseries array<string>, metricseries array<double>",
    )
    got = {r["entity"]: r for r in spot_thresholds(seg).collect()}
    for k, y in series.items():
        t, zq = spot_threshold(y)
        assert got[k]["t"] == t and got[k]["zq"] == zq, k
        peaks = y[y > t] - t
        assert len(peaks) >= 3, k
        assert got[k]["n_peaks"] == len(peaks), k
        # replicate the candidate sweep; assert the argmax is decisive
        n = len(peaks)
        lo = -1.0 / peaks.max() + 1e-8
        cands = np.concatenate(
            [np.linspace(lo, -1e-8, 60), np.linspace(1e-8, 2.0 / peaks.mean(), 60)]
        )
        lls = []
        for x in cands:
            u = 1.0 + x * peaks
            if np.any(u <= 0):
                continue
            g = float(np.mean(np.log(u)))
            if g == 0.0 or g / x <= 0:
                continue
            lls.append(-n * np.log(g / x) - (1.0 + 1.0 / g) * float(np.sum(np.log(u))))
        top2 = sorted(lls)[-2:]
        assert top2[1] - top2[0] > 1e-6, k
        assert abs(t * 100 - round(t * 100)) < 1e-6, k
        frac = (zq * 10000) % 1
        assert 0.01 < frac < 0.99, (k, zq)


def test_forecast_seasonal_oracle_fixture_pins():
    """Pin the forecast_seasonal_synthetic fixture: season 7 inferred
    decisively on every partition (ACF argmax clears the runner-up lag
    and the 0.65 threshold by wide margins — no cross-engine ulp flip),
    the seasonal candidate beats plain by a large BIC margin, and all
    FLOOR-scaled band values sit off the boundary."""
    S7 = [40, -30, 25, -35, 10, -20, 10]
    for p in range(6):
        y = np.array(
            [500 + 2 * j + S7[j % 7] + ((j * j * 104729 + p * 61) % 997) % 7 - 3 for j in range(280)],
            dtype=float,
        )
        tr = y[:279]
        n = len(tr)
        t = np.arange(n, dtype=float)
        dd = np.sum((t - t.mean()) ** 2)
        slope = np.sum((t - t.mean()) * (tr - tr.mean())) / dd
        det = tr - slope * t
        assert infer_season(det) == 7, p
        c = det - det.mean()
        denom = float(np.dot(c, c))
        acfs = np.array([np.dot(c[:-lag], c[lag:]) / denom for lag in range(2, 53)])
        order = np.argsort(-acfs)
        assert order[0] + 2 == 7, p
        assert acfs[order[0]] - acfs[order[1]] > 0.01, p
        assert acfs[order[0]] > 0.95, p  # far above the 0.65 threshold
        # BIC margin: seasonal rss must crush the plain fit
        phase = np.arange(n) % 7
        means = np.array([tr[phase == q].mean() for q in range(7)])
        means = means - means.mean()
        yr = tr - means[phase]
        sl2 = np.sum((t - t.mean()) * (yr - yr.mean())) / dd
        ic2 = yr.mean() - sl2 * t.mean()
        rss_s = float(np.sum((tr - (ic2 + sl2 * t + means[phase])) ** 2))
        sl1 = slope
        ic1 = tr.mean() - sl1 * t.mean()
        rss_p = float(np.sum((tr - (ic1 + sl1 * t)) ** 2))
        bic_s = n * np.log(rss_s / n) + 8 * np.log(n)
        bic_p = n * np.log(rss_p / n) + 2 * np.log(n)
        assert bic_p - bic_s > 50, (p, bic_s, bic_p)
        point, lo, hi = forecast_band(tr)
        for v in (point * 100, lo * 100, hi * 100):
            fr = v % 1
            assert min(fr, 1 - fr) > 0.01, (p, v)


def test_freshness_grid_oracle_fixture_pins():
    """Pin the freshness_grid_oracle_synthetic fixture: every
    non-static grid point is model-evaluated (so the refit cadence is
    the closed form g - g%10 the DuckDB twin uses), every training
    window has >=3 commits (the newest-3 fallback is not exercised),
    every fit is non-seasonal with a positive point forecast (the
    min-duration clamp is not exercised), every rounded upper bound
    sits away from the .5 boundary, and the planted stopped partitions
    actually produce Unhealthy rows."""
    import pandas as pd

    END = 1755302400

    def commit_epochs(p):
        if p == 3:
            return [END - 40 * 86400 + k * 21600 for k in range(10)]
        kmax = 112 if p in (1, 4, 7) else 120
        return [
            END - 30 * 86400 + k * 21600 + ((((k * k * 104729 + p * 61) % 997) % 29) - 14) * 60
            for k in range(kmax)
        ]

    saw_unhealthy = False
    for p in range(8):
        times = np.array(commit_epochs(p))
        assert (np.diff(times) > 0).all(), p
        assert np.median(np.diff(times)) <= 43200, p  # 6h cadence bucket
        if p == 3:
            for g in range(28):
                ts = END - 604800 + g * 21600
                assert times.max() < ts - 30 * 86400, (p, g)
            continue
        cached = None
        for g in range(28):
            ts = END - 604800 + g * 21600
            hist = times[times <= ts]
            assert len(hist) > 0 and hist.max() >= ts - 30 * 86400, (p, g)
            win = hist[hist >= ts - 14 * 86400]
            assert len(win) >= 3, (p, g)
            dur = np.diff(win).astype(float)
            assert len(dur) >= 2, (p, g)
            if g % 10 == 0:
                n = len(dur)
                t = np.arange(n, dtype=float)
                d = np.sum((t - t.mean()) ** 2)
                slope = np.sum((t - t.mean()) * (dur - dur.mean())) / d
                assert infer_season(dur - slope * t) is None, (p, g)
                cached = forecast_band(dur)
                assert cached[0] > 0, (p, g)
            point, _lo, hi = cached
            med = float(np.median(dur))
            grace = max(med, 900.0) if med < 1800 else min(43200.0, med * 0.5)
            final_hi = max(hi, point, point + grace)
            # margin must dominate cross-engine FP drift (~3e-8 absolute
            # at this magnitude), not be large per se
            assert abs((final_hi % 1) - 0.5) > 0.01, (p, g, final_hi)
            upper = int(hist.max()) + int(round(final_hi))
            if ts > upper:
                saw_unhealthy = True
    assert saw_unhealthy


def test_rolling_backtest_oracle_fixture_pins():
    """Pin the rolling_backtest_synthetic oracle fixture: every fit
    prefix (7, 17, 27, 37 — the closed-form refit cadence) stays on
    the non-seasonal OLS branch and every emitted FLOOR-scaled value
    (forecast/lower/upper x100) sits away from the integer boundary
    (mult=53 produced exact-rational boundary hits — engine-dependent
    floors; mult=61 gives worst margin ~0.016)."""
    for p in range(6):
        s = np.array(
            [500 + j * 10 + ((j * j * 104729 + p * 61) % 997) % 50 for j in range(40)],
            dtype=float,
        )
        for f in (7, 17, 27, 37):
            y = s[:f]
            t = np.arange(f, dtype=float)
            d = np.sum((t - t.mean()) ** 2)
            slope = np.sum((t - t.mean()) * (y - y.mean())) / d
            assert infer_season(y - slope * t) is None, (p, f)
            point, lo, hi = forecast_band(y)
            for v in (point * 100, lo * 100, hi * 100):
                fr = v % 1
                assert min(fr, 1 - fr) > 0.01, (p, f, v)
            # in_band decisions decisive for every eval using this fit
            evals = [i for i in range(7, 40) if 7 + 10 * ((i - 7) // 10) == f]
            for i in evals:
                assert abs(s[i] - lo) > 1e-6 and abs(s[i] - hi) > 1e-6, (p, i)


def test_huber_params_distributed_and_oracle_fixture_pins(spark):
    """huber_params matches the local IRLS per entity; the
    huber_params_synthetic oracle fixture is pinned safe: non-degenerate
    scale, FLOOR margins away from the boundary (cross-engine IRLS
    drift measured ~7e-15 relative), every point decisively inside or
    outside the tolerance band, and exactly the 3 planted spikes
    flagged."""
    from anomaly_detection_spark.operators.outliers import huber_location_scale, huber_params

    series = {}
    for e in range(4):
        y = np.array([((i * i * 104729 + e * 997) % 1013) % 40 for i in range(200)], dtype=float)
        y[np.arange(200) % 67 == 13] += 500.0
        series[f"e{e}"] = y
    seg = spark.createDataFrame(
        [(k, [str(i) for i in range(200)], [float(v) for v in y]) for k, y in series.items()],
        "entity string, timeseries array<string>, metricseries array<double>",
    )
    got = {r["entity"]: r for r in huber_params(seg).collect()}
    for k, y in series.items():
        loc, scale = huber_location_scale(y)
        assert got[k]["location"] == loc and got[k]["scale"] == scale, k
        assert scale > 1e-11, k
        for v in (loc * 1e6, scale * 1e6):
            frac = v % 1
            assert 1e-3 < frac < 1 - 1e-3, (k, v)
        rel = np.abs(np.abs(y - loc) - 5.0 * scale) / (5.0 * scale)
        assert rel.min() > 1e-6, k
        assert got[k]["n_anomalies"] == 3, k


def test_distributed_matches_local(spark):
    rng = np.random.default_rng(2)
    y = rng.normal(10, 1, 200)
    y[150] = 50
    seg = spark.createDataFrame(
        [("e1", [str(i) for i in range(200)], [float(v) for v in y])],
        "entity string, timeseries array<string>, metricseries array<double>",
    )
    out = detect_anomalies(seg, method="huber").first()
    assert out["is_anomaly"] == [bool(b) for b in huber_flags(y)]
    alarms = anomaly_alarms(detect_anomalies(seg, method="huber")).collect()
    assert [a["ts"] for a in alarms] == ["150"]


def test_forecast_band_linear_and_seasonal():
    y = np.arange(50, dtype=float) * 2 + 5
    point, lo, hi = forecast_band(y)
    assert abs(point - (50 * 2 + 5)) < 1e-6
    assert lo <= point <= hi
    # seasonal: period 7
    t = np.arange(140)
    y = 100 + 10 * np.sin(2 * np.pi * t / 7)
    assert infer_season(y) == 7
    point, lo, hi = forecast_band(y)
    expected = 100 + 10 * np.sin(2 * np.pi * 140 / 7)
    assert abs(point - expected) < 2.0


def test_rolling_backtest_coverage(spark):
    rows = []
    rng = np.random.default_rng(3)
    for b in range(30):
        rows.append((0, 29 - b, float(1000 + rng.normal(0, 10))))
    df = spark.createDataFrame(rows, "partition_id int, bucket int, volume double")
    bt = rolling_backtest(df, min_train=7)
    q = forecast_quality(bt).first()
    assert q["n_points"] == 23
    assert q["band_coverage"] >= 0.9  # 3-sigma band on iid noise
    assert q["rmse"] < 50


def test_alarm_accuracy_hand_confusion(spark):
    pred = spark.createDataFrame(
        [(1, True), (2, True), (3, False), (4, False)], "k int, predicted_anomaly boolean"
    )
    lab = spark.createDataFrame(
        [(1, True), (2, False), (3, True), (4, False)], "k int, is_anomaly boolean"
    )
    m = alarm_accuracy(pred, lab, on=["k"]).first()
    assert (m["tp"], m["fp"], m["fn"], m["tn"]) == (1, 1, 1, 1)
    assert m["precision"] == 0.5 and m["recall"] == 0.5 and m["accuracy"] == 0.5


def test_impact_levels(spark):
    df = spark.createDataFrame([(29,), (30,), (300,), (3000,), (0,)], "q int")
    out = [r["l"] for r in df.select(impact_level("q").alias("l")).collect()]
    assert out == [1, 2, 3, 4, 1]


def test_error_taxonomy():
    assert match_error_message_to_code("Not enough update operations") == ErrorCode.NOT_ENOUGH_DATA
    assert match_error_message_to_code("model failed to converge") == ErrorCode.MODEL_FIT_FAILED
    assert match_error_message_to_code(None) == ErrorCode.UNKNOWN_ERROR
    assert match_error_message_to_code("weird") == ErrorCode.UNKNOWN_ERROR
    assert len(clip_error_message("x" * 1000)) == 500


def test_cadence_bucket_hours():
    from anomaly_detection_spark.operators.backtest import cadence_bucket_hours

    assert cadence_bucket_hours(3600) == 6            # hourly table → 6h grid
    assert cadence_bucket_hours(12 * 3600) == 6       # boundary inclusive
    assert cadence_bucket_hours(86400) == 24          # daily
    assert cadence_bucket_hours(3.5 * 86400) == 24    # boundary
    assert cadence_bucket_hours(7 * 86400) == 168     # weekly


def test_freshness_time_grid_backtest_planted_scenarios(spark):
    """Time-grid replay (M18): healthy cadence stays Healthy on the
    grid; the stopped stream (pid 1) goes Unhealthy at late grid points;
    the static partition (pid 3) short-circuits Healthy throughout."""
    import pyspark.sql.functions as F

    from anomaly_detection_spark.operators.backtest import freshness_time_grid_backtest
    from anomaly_detection_spark.sources.history import filter_history
    from anomaly_detection_spark.sources.synthetic import commits_log

    commits = filter_history(commits_log(spark, 4), eval_time=None, lookback_days=None)
    out = freshness_time_grid_backtest(
        commits, F.to_timestamp(F.lit("2025-08-16 00:00:00"))
    ).collect()
    by_pid = {}
    for r in out:
        by_pid.setdefault(r["partition_id"], []).append(r)
    # commits every 6h → median gap ~6h → 6h cadence, 28 points over 7d
    assert all(r["cadence_hours"] == 6 for r in out)
    assert len(by_pid[0]) == 28
    # mostly Healthy; occasional Unhealthy points are genuine — the
    # synthetic log plants filtered non-update/empty commits, leaving
    # real 12h gaps that exceed the 6h-cadence band
    healthy0 = sum(r["status"] == "Healthy" for r in by_pid[0])
    assert healthy0 >= 24
    # pid 1 stopped 3 days before eval: late grid points are Unhealthy
    p1 = sorted(by_pid[1], key=lambda r: r["eval_epoch"])
    assert p1[-1]["status"] == "Unhealthy"
    assert p1[0]["status"] == "Healthy"
    # pid 3 static (last commit 40+ days old): Healthy short-circuit
    assert all(r["status"] == "Healthy" for r in by_pid[3])


def test_should_run_backtest_emptiness_gate(spark, tmp_path):
    from anomaly_detection_spark.operators.backtest import should_run_backtest
    from anomaly_detection_spark.sources.catalog import LocalParquetCatalog

    store = LocalParquetCatalog(str(tmp_path / "store"))
    assert should_run_backtest(spark, store)  # missing table → run
    store.append("_dq_lineage", spark.createDataFrame([(1,)], "x int"))
    assert not should_run_backtest(spark, store)  # has rows → skip


def test_jitter_boost_hand_computed():
    """M11: boosted series = jittered whole-cycle prefix + original,
    pinned against an independent numpy recompute (seed 0, jitter
    bounded by min(median//10, 600))."""
    import numpy as np

    from anomaly_detection_spark.functions.forecast import jitter_boost

    y = np.array([600.0, 600.0, 600.0, 2400.0] * 2)
    out, added = jitter_boost(y, seasonal_period=4)
    assert added
    assert len(out) == 16  # 1 jittered copy of 8 (complete cycles) + original 8
    # tail is the untouched original
    assert np.array_equal(out[8:], y)
    # independent recompute of the jittered head
    rng = np.random.RandomState(0)
    expected = y.copy() + rng.randint(-60, 61, 8)  # median 600 → jitter ±60
    assert np.array_equal(out[:8], expected)
    # long-enough series: unchanged
    long = np.arange(300, dtype=float)
    same, added2 = jitter_boost(long, 4)
    assert not added2 and np.array_equal(same, long)


def test_infer_season_boost_flips_short_series():
    """A 3-cycle seasonal series misses the ACF threshold on the
    detrended data (the path forecast_band uses) but passes after
    jitter boosting; an aperiodic series stays None either way."""
    import numpy as np

    from anomaly_detection_spark.functions.forecast import forecast_band, infer_season

    y = np.array([600.0, 600.0, 600.0, 2400.0] * 3)
    t = np.arange(len(y), dtype=float)
    slope = np.sum((t - t.mean()) * (y - y.mean())) / np.sum((t - t.mean()) ** 2)
    detrended = y - slope * t
    assert infer_season(detrended, boost=False) is None
    assert infer_season(detrended, boost=True) == 4

    rng = np.random.default_rng(7)
    noise = rng.uniform(500, 2500, 12)
    assert infer_season(noise, boost=True) is None

    # the boosted seasonal pick changes the forecast: next point is the
    # low-phase value (600), not the series mean (~1050)
    point, lo, hi = forecast_band(y)
    assert abs(point - 600.0) < 100


def test_align_series_to_spine(spark):
    """P1: irregular long-format events align to a regular global grid —
    equal-length arrays per entity, bucket-averaged, gaps filled (zero
    or forward-fill) — and feed detect_anomalies directly."""
    rows = [
        ("a", 0, 10.0), ("a", 30, 20.0),      # same bucket → avg 15
        ("a", 7200, 40.0),                      # gap at 3600
        ("b", 3600, 7.0),
    ]
    df = spark.createDataFrame(rows, "entity string, ts long, value double")
    from anomaly_detection_spark.operators.outliers import align_series_to_spine

    out = {r["entity"]: r for r in align_series_to_spine(df, step_sec=3600).collect()}
    assert out["a"]["timeseries"] == ["0", "3600", "7200"]
    assert out["a"]["metricseries"] == [15.0, 0.0, 40.0]
    assert out["b"]["metricseries"] == [0.0, 7.0, 0.0]  # shared global grid

    ff = {r["entity"]: r for r in align_series_to_spine(df, step_sec=3600, fill="ffill").collect()}
    assert ff["a"]["metricseries"] == [15.0, 15.0, 40.0]
    assert ff["b"]["metricseries"] == [0.0, 7.0, 7.0]  # leading gap → 0.0

    # shape-compatible with the distributed detector
    flags = detect_anomalies(align_series_to_spine(df, step_sec=3600)).collect()
    assert {r["entity"] for r in flags} == {"a", "b"}


def test_spot_refit_oracle_fixture_pins():
    """Pin the spot_refit_synthetic oracle fixture decisive: walking the
    stream with the real numpy loop, every comparison against t/z_q has
    relative margin > 5e-6 (far above cross-engine libm/fold drift),
    the peak count never exceeds 7 (numpy's naive-sum regime, matching
    DuckDB's sequential list folds), every Grimshaw grid argmax is
    separated from the runner-up by > 1e-9 relative, and the refits
    MOVE z_q by more than the straddle margin — so a non-refitting
    implementation provably flips the i=200 flag."""
    import numpy as np

    import __spark_entry__ as entry_mod
    from anomaly_detection_spark.operators.outliers import _grimshaw_gpd, spot_flags, spot_threshold

    def noise(e, i):
        return float((i * i * 104729 + e * 997) % 701)

    def series(e):
        y = []
        for i in range(240):
            if (e, i) in entry_mod._SPOT_REFIT_STRADDLES:
                y.append(entry_mod._SPOT_REFIT_STRADDLES[(e, i)])
            elif i in entry_mod._SPOT_REFIT_PLANTS:
                y.append(entry_mod._SPOT_REFIT_PLANTS[i] + e * 90 + i)
            else:
                y.append(noise(e, i))
        return np.array(y)

    def grid_gap(peaks):
        """relative gap between best and second-best candidate loglik"""
        pk = np.asarray(peaks)
        n, ymax, ymean = len(pk), pk.max(), pk.mean()
        cands = np.concatenate(
            [np.linspace(-1.0 / ymax + 1e-8, -1e-8, 60), np.linspace(1e-8, 2.0 / max(ymean, 1e-9), 60)]
        )
        lls = []
        for x in cands:
            u = 1.0 + x * pk
            if np.any(u <= 0):
                continue
            g = float(np.mean(np.log(u)))
            if g == 0 or g / x <= 0:
                continue
            lls.append(-n * np.log(g / x) - (1 + 1 / g) * float(np.sum(np.log(u))))
        lls = sorted(lls, reverse=True)
        return (lls[0] - lls[1]) / max(abs(lls[0]), 1e-9)

    for e in range(2):
        y = series(e)
        t, zq = spot_threshold(y[:120], q=1e-4, init_quantile=0.96)
        peaks = list(y[:120][y[:120] > t] - t)
        assert len(peaks) == 5  # exactly the 5 plants
        assert max(v for i, v in enumerate(y[:240]) if v < 1000) < t * 0.75
        assert grid_gap(peaks) > 1e-9
        zq_gens = [zq]
        n_seen = 120
        for i in range(120, 240):
            x = y[i]
            margin = abs(x - zq) / zq
            if x > 1000:  # straddle points: pin the margin window
                assert 5e-6 < margin < 5e-5, (e, i, margin)
            if x > zq:
                continue
            if x > t:
                peaks.append(x - t)
                n_seen += 1
                assert len(peaks) <= 7
                assert grid_gap(peaks) > 1e-9
                gamma, sigma = _grimshaw_gpd(np.asarray(peaks))
                r = 1e-4 * n_seen / len(peaks)
                new_zq = t + sigma * np.log(1 / r) if abs(gamma) < 1e-8 else t + (sigma / gamma) * (r ** -gamma - 1)
                # refit must move z_q by MORE than the straddle margin
                assert abs(new_zq - zq) / zq > 2e-5, (e, i)
                zq = float(new_zq)
                zq_gens.append(zq)
            else:
                n_seen += 1
        assert len(zq_gens) == 3  # init + 2 refits
        # end-to-end flags from the real operator entry point
        flags = spot_flags(y, q=1e-4, init_fraction=0.5, init_quantile=0.96)
        assert list(np.where(flags)[0]) == [150, 190, 230]


def test_backtest_volume_quality_margin_pins():
    """Pin the backtest_volume_synthetic integerizations decisive: the
    numpy-replayed RMSE*100, SMAPE*1e8, coverage*1e4 all sit > 1e-5
    away from integer boundaries, so the ~1e-10 cross-engine float
    drift in the OLS forecasts cannot flip a FLOOR."""
    import numpy as np

    from anomaly_detection_spark.functions.forecast import forecast_band

    for p in range(6):
        s = np.array(
            [500 + j * 10 + ((j * j * 104729 + p * 61) % 997) % 50 for j in range(40)],
            dtype=float,
        )
        rows = []
        cached, since = None, 0
        for i in range(7, len(s)):
            if cached is None or since >= 10:
                cached = forecast_band(s[:i])
                since = 0
            since += 1
            point, lo, hi = cached
            rows.append((float(s[i]), point, lo, hi))
        a = np.array(rows)
        err = a[:, 1] - a[:, 0]
        rmse = float(np.sqrt(np.mean(err**2)))
        smape = float(np.mean(2 * np.abs(err) / (np.abs(a[:, 1]) + np.abs(a[:, 0]))))
        cov = float(np.mean((a[:, 0] >= a[:, 2]) & (a[:, 0] <= a[:, 3])))
        for scaled in (rmse * 100, smape * 1e8, cov * 1e4):
            frac = scaled % 1
            assert min(frac, 1 - frac) > 1e-5, (p, scaled)
        assert len(rows) == 33


def test_spot_events_oracle_margin_pins():
    """Pin the decision margins behind the outliers_spot_events oracle
    (the real-events SPOT replay): replaying the streaming loop in
    Python, every flag/absorb comparison against z_q and every peak
    test against t must sit far from equality, and every Grimshaw grid
    refit must have a decisive argmax (top-2 log-lik gap > 1e-6) and a
    decisive exponential-fallback comparison — so DuckDB's sequential
    list folds vs numpy's pairwise sums (ulp-level drift) can never
    flip a flag, a peak absorption, or a grid winner. Skips gracefully
    if the sf0.01 testdata is absent."""
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import pytest

    path = "/root/testdata/sf0.01/events.parquet"
    if not os.path.exists(path):
        pytest.skip("sf0.01 testdata not present")
    from anomaly_detection_spark.operators.outliers import _grimshaw_gpd

    t_all = pq.read_table(path, columns=["user_id", "ts", "event_id", "value"]).to_pandas()
    t_all["entity"] = (t_all["user_id"] % 10).astype(str)
    q = 1e-3
    min_zq_rel, min_t_rel, min_gap, min_expgap = np.inf, np.inf, np.inf, np.inf
    n_flags = 0

    def gaps(peaks):
        nonlocal min_gap, min_expgap
        pk = np.asarray(peaks, dtype=np.float64)
        n = len(pk)
        ymax, ymean = pk.max(), pk.mean()
        eps = 1e-8
        cands = np.concatenate(
            [np.linspace(-1.0 / ymax + eps, -eps, 60), np.linspace(eps, 2.0 / max(ymean, 1e-9), 60)]
        )
        lls = []
        for x in cands:
            u = 1.0 + x * pk
            if np.any(u <= 0):
                continue
            gamma = float(np.mean(np.log(u)))
            if gamma == 0:
                continue
            if gamma / x <= 0:
                continue
            lls.append(-n * np.log(gamma / x) - (1 + 1 / gamma) * float(np.sum(np.log(u))))
        lls.sort(reverse=True)
        if len(lls) >= 2:
            min_gap = min(min_gap, lls[0] - lls[1])
        min_expgap = min(min_expgap, abs(lls[0] - (-n * np.log(ymean) - n)))

    for _, g in t_all.groupby("entity"):
        g = g.sort_values(["ts", "event_id", "value"])
        y = g["value"].to_numpy(dtype="float64")
        n = len(y)
        n_init = max(int(n * 0.5), 10)
        w = y[:n_init]
        t = float(np.quantile(w, 0.98))
        min_t_rel = min(min_t_rel, float(np.min(np.abs(y - t))) / max(abs(t), 1.0))
        peaks = list(w[w > t] - t)
        assert len(peaks) >= 3  # the GPD path, not the max() fallback

        def fit_zq(pk, ns):
            gamma, sigma = _grimshaw_gpd(np.asarray(pk))
            r = q * ns / len(pk)
            if abs(gamma) < 1e-8:
                return t + sigma * float(np.log(1.0 / max(r, 1e-300)))
            return t + (sigma / gamma) * (r ** (-gamma) - 1.0)

        gaps(peaks)
        zq, ns = fit_zq(peaks, n_init), n_init
        for i in range(n_init, n):
            x = y[i]
            min_zq_rel = min(min_zq_rel, abs(x - zq) / max(abs(zq), 1.0))
            if x > zq:
                n_flags += 1
                continue
            if x > t:
                peaks.append(x - t)
                ns += 1
                gaps(peaks)
                zq = fit_zq(peaks, ns)
            else:
                ns += 1

    assert n_flags == 16  # the gate row's row count
    assert min_zq_rel > 1e-2, min_zq_rel
    assert min_t_rel > 1e-4, min_t_rel
    assert min_gap > 1e-6, min_gap
    assert min_expgap > 1e-4, min_expgap
