"""Golden tests for freshness/completeness verdict semantics and the
status fold/sort — pinning the reference's rules (SURVEY.md §2 M1-M10).
"""

import pyspark.sql.functions as F

from anomaly_detection_spark.operators import verdict as V
from anomaly_detection_spark.operators.completeness import completeness_verdicts
from anomaly_detection_spark.operators.freshness import _grace_seconds, freshness_verdicts
from anomaly_detection_spark.sources.synthetic import commits_log

EVAL = "2025-08-16 00:00:00"


def _verdicts(spark, fn, **kw):
    commits = commits_log(spark, n_partitions=8)
    out = fn(commits, F.to_timestamp(F.lit(EVAL)), **kw)
    return {r["partition_id"]: r for r in out.collect()}


def test_completeness_planted_scenarios(spark):
    v = _verdicts(spark, completeness_verdicts)
    # pid 2: volume drop in last 24h bucket → Unhealthy (M8)
    assert v[2]["status"] == V.UNHEALTHY
    assert v[2]["last_window_row_volume"] < v[2]["predicted_row_volume_lower_bound"]
    # pid 0: regular cadence → Healthy
    assert v[0]["status"] == V.HEALTHY
    # pid 3: static (no commits in lookback) → no row from the model path
    assert 3 not in v


def test_completeness_override(spark):
    v = _verdicts(spark, completeness_verdicts, threshold_override=10**9)
    assert all(r["status"] == V.UNHEALTHY for r in v.values())
    v = _verdicts(spark, completeness_verdicts, threshold_override=1)
    assert v[0]["status"] == V.HEALTHY


def test_freshness_planted_scenarios(spark):
    v = _verdicts(spark, freshness_verdicts)
    # pid 1: stopped stream (3 days silent, ~6h cadence) → Unhealthy/stale
    assert v[1]["status"] == V.UNHEALTHY
    assert v[1]["staleness_age_seconds"] > 0
    # pid 0: regular cadence → Healthy
    assert v[0]["status"] == V.HEALTHY
    # pid 3: static short-circuit (M1) → Healthy, no forecast
    assert v[3]["status"] == V.HEALTHY
    assert v[3]["predicted_next_data_update"] is None


def test_freshness_constant_threshold(spark):
    v = _verdicts(spark, freshness_verdicts, constant_threshold_sec=10)
    # everything except the static partition is stale against a 10s threshold
    assert v[0]["status"] == V.UNHEALTHY
    assert v[3]["status"] == V.HEALTHY  # static short-circuits before override
    v = _verdicts(spark, freshness_verdicts, constant_threshold_sec=30 * 86400)
    assert all(r["status"] == V.HEALTHY for r in v.values())


def test_grace_period_table():
    # piecewise table parity (reference freshness_utils.py:535-553)
    assert _grace_seconds(10 * 60) == 15 * 60  # <=15min → 15min
    assert _grace_seconds(20 * 60) == 20 * 60  # 15-30min → median
    assert _grace_seconds(2 * 3600) == 3600  # 30min-24h → 0.5*median
    assert _grace_seconds(30 * 3600) == 12 * 3600  # >=24h → 12h cap


def test_status_fold_priority(spark):
    df = spark.createDataFrame(
        [(1, V.HEALTHY), (1, V.UNKNOWN), (2, V.HEALTHY), (3, V.UNHEALTHY), (3, V.UNKNOWN)],
        "g int, status string",
    )
    out = {r["g"]: r["overall_status"] for r in V.fold_group_status(df, ["g"]).collect()}
    assert out == {1: V.UNKNOWN, 2: V.HEALTHY, 3: V.UNHEALTHY}


def test_sort_and_spine(spark):
    df = spark.createDataFrame(
        [(0, "r1", V.HEALTHY), (1, "r1", V.UNHEALTHY), (2, "r1", V.UNKNOWN)],
        "partition_id int, rule_id string, status string",
    )
    ordered = [r["status"] for r in V.sort_verdicts(df).collect()]
    assert ordered == [V.UNHEALTHY, V.HEALTHY, V.UNKNOWN]
    spine = {r["status"]: r["status_count"] for r in V.status_counts_with_spine(spark, df).collect()}
    assert spine == {V.UNHEALTHY: 1, V.HEALTHY: 1, V.UNKNOWN: 1, V.SKIPPED: 0}


def test_subsample_event_times_greedy_exact(spark):
    """O4: newest-first greedy subsample keeping points STRICTLY more
    than min_gap apart, breaking only after the kept count exceeds
    max_points (reference freshness_utils.py:233-254) — pinned against
    a hand-walked pick."""
    from anomaly_detection_spark.operators.freshness import subsample_event_times

    # epochs (minutes apart): 0, 30, 70, 100, 190 → newest-first greedy
    # with strict 60min gap: keep 190; keep 100 (90min > 60); skip 70
    # (30min); keep 30 (100-30 = 70min > 60); skip 0 (30min from 30).
    # Boundary check: a gap of EXACTLY 60min would be skipped (strict).
    mins = [0, 30, 70, 100, 190]
    rows = [(1, f"2025-08-15 {10 + m // 60:02d}:{m % 60:02d}:00") for m in mins]
    df = spark.createDataFrame(rows, "partition_id int, t string").selectExpr(
        "partition_id", "to_timestamp(t) as timestamp"
    )
    out = subsample_event_times(df, min_gap_sec=3600, max_points=10)
    kept = sorted(str(r["timestamp"]) for r in out.collect())
    assert kept == [
        "2025-08-15 10:30:00",
        "2025-08-15 11:40:00",
        "2025-08-15 13:10:00",
    ]
    # strict boundary: exactly-60min spacing is NOT kept
    exact = spark.createDataFrame(
        [(1, "2025-08-15 10:00:00"), (1, "2025-08-15 11:00:00"), (1, "2025-08-15 12:01:00")],
        "partition_id int, t string",
    ).selectExpr("partition_id", "to_timestamp(t) as timestamp")
    kept_exact = sorted(
        str(r["timestamp"])
        for r in subsample_event_times(exact, min_gap_sec=3600, max_points=10).collect()
    )
    assert kept_exact == ["2025-08-15 11:00:00", "2025-08-15 12:01:00"]
    # cap is exceeded-then-stop: max_points=2 keeps a 3rd point before
    # the break (reference appends, THEN checks len > max)
    out2 = subsample_event_times(df, min_gap_sec=3600, max_points=2)
    kept2 = sorted(str(r["timestamp"]) for r in out2.collect())
    assert kept2 == ["2025-08-15 10:30:00", "2025-08-15 11:40:00", "2025-08-15 13:10:00"]
    out1 = subsample_event_times(df, min_gap_sec=3600, max_points=1)
    kept1 = sorted(str(r["timestamp"]) for r in out1.collect())
    assert kept1 == ["2025-08-15 11:40:00", "2025-08-15 13:10:00"]


def test_completeness_model_oracle_fixture_is_nonseasonal():
    """The completeness_model_synthetic oracle (__spark_entry__.py)
    assumes the planted fixture stays on forecast_band's NON-seasonal
    closed-form OLS branch — the branch DuckDB's regr_slope/
    regr_intercept/stddev_samp can recompute. Pin that assumption: the
    detrended training series must infer no season, and the band must
    equal the closed-form OLS band, for every partition."""
    import numpy as np

    from anomaly_detection_spark.functions.forecast import forecast_band, infer_season

    for p in range(8):
        train = np.array(
            [50 + p * 10 + d * 3 + ((d * d * 7919 + p * 31) % 13) for d in range(13, 0, -1)],
            dtype=float,
        )
        n = len(train)
        t = np.arange(n, dtype=float)
        dd = np.sum((t - t.mean()) ** 2)
        slope = np.sum((t - t.mean()) * (train - train.mean())) / dd
        intercept = train.mean() - slope * t.mean()
        assert infer_season(train - slope * t) is None, p
        point, lo, hi = forecast_band(train)
        sigma = np.std(train - (intercept + slope * t), ddof=1)
        exp_point = intercept + slope * n
        assert abs(point - exp_point) < 1e-9, p
        assert abs(lo - (exp_point - 3 * sigma)) < 1e-9, p


def test_event_freshness_o4_subsamples_dense_training(spark):
    """O4 wired into the event path: dense commit streams train on the
    >1h-spaced newest-first subsample (cap 360 exceeded-then-stop, so
    up to 361 points), never on the raw per-commit series. partition 1:
    300 commits 1min apart -> 5 training points (strict gap: every 61st
    commit); partition 2: 400 commits 2h apart -> capped at 361;
    partition 3: 10 commits 6h apart -> all 9 kept."""
    from anomaly_detection_spark.operators.freshness import event_freshness_verdicts

    end = 1755302400 - 3600
    rows = (
        [(1, end - 60 * i) for i in range(300)]
        + [(2, end - 7200 * i) for i in range(400)]
        + [(3, end - 21600 * i) for i in range(10)]
    )
    commits = spark.createDataFrame(rows, "partition_id int, epoch long").select(
        "partition_id",
        F.to_timestamp(F.from_unixtime("epoch")).alias("timestamp"),
        F.lit("WRITE").alias("operation"),
        F.create_map(F.lit("numOutputRows"), F.lit("5")).alias("operationMetrics"),
    )
    events = commits.select(
        "partition_id",
        F.to_timestamp(F.from_unixtime(F.unix_timestamp("timestamp") - 1200)).alias("event_ts"),
    )
    out = event_freshness_verdicts(
        commits, events, F.to_timestamp(F.lit("2025-08-16 00:00:00"))
    )
    by_pid = {r["partition_id"]: r for r in out.collect()}
    assert by_pid[1]["n_training_points"] == 5
    assert by_pid[2]["n_training_points"] == 361
    assert by_pid[3]["n_training_points"] == 9
    # constant 1200s latency everywhere -> all model verdicts Healthy
    assert all(r["status"] == "Healthy" for r in by_pid.values())


def test_freshness_model_oracle_fixture_is_nonseasonal():
    """Same pin for the freshness_model_synthetic oracle: each
    partition's duration series must stay on the non-seasonal OLS
    branch, with the rounded upper bound safely away from the .5
    boundary where Python (half-even) and SQL (half-away) rounding
    diverge."""
    import numpy as np

    from anomaly_detection_spark.functions.forecast import forecast_band, infer_season

    A, B = 21600, 60
    for p in range(8):
        r = A * 14 + B * 196 + 3600 + (50000 if p % 3 == 1 else 0)
        times = [
            1755302400 - r + A * k + B * k * k + ((k * k * 104729 + p * 53) % 17) * 60
            for k in range(15)
        ]
        dur = np.diff(times).astype(float)
        n = len(dur)
        t = np.arange(n, dtype=float)
        dd = np.sum((t - t.mean()) ** 2)
        slope = np.sum((t - t.mean()) * (dur - dur.mean())) / dd
        icept = dur.mean() - slope * t.mean()
        assert infer_season(dur - slope * t) is None, p
        point, _lo, hi = forecast_band(dur)
        assert abs(point - (icept + slope * n)) < 1e-6, p
        med = float(np.median(dur))
        grace = max(med, 900.0) if med < 1800 else min(43200.0, med * 0.5)
        my_hi = max(hi, point, point + grace)
        assert min(abs((my_hi % 1) - 0.5), abs((point % 1) - 0.5)) > 0.1, p


def test_portable_verdicts_fixture_pins():
    """Pin the commits_log(portable=True) fixture behind the
    freshness/completeness_verdicts_portable gate rows: regenerate the
    log driver-side from the md5 formulas (the same 60-bit fold the
    DuckDB twin uses), replay both verdict paths, and assert (a) every
    duration/bucket series stays on the non-seasonal OLS branch — the
    M11 jitter boost draws RandomState numbers that no SQL can replay,
    so the boost must never flip an outcome here; (b) all round/trunc
    integerizations sit safely away from the boundaries where Python
    and SQL conventions (or a cross-engine ulp) could diverge; (c) the
    planted scenarios land: freshness pid 1 Unhealthy, pid 3 static
    Healthy; completeness pid 2 Unhealthy, pid 3 absent."""
    import hashlib

    import numpy as np

    from anomaly_detection_spark.functions.forecast import forecast_band, infer_season

    def h(tag, i, mod):
        return int(hashlib.md5(f"{tag}:42:{i}".encode()).hexdigest()[:15], 16) % mod

    EVALE = 1755302400
    commits = {}  # pid -> list[(epoch, vol)]
    for i in range(960):
        pid, slot = i % 8, i // 8
        day = slot // 4
        if pid == 1 and day >= 27:
            continue
        if h("nonupd", i, 1_000_000) < 30_000 or h("empty", i, 1_000_000) < 20_000:
            continue
        epoch = EVALE - (120 - slot) * 21600 + h("cjit", i, 600) - (3456000 if pid == 3 else 0)
        base = 800 + h("rows", i, 400)
        vol = base // 20 if (pid == 2 and day == 29) else base
        commits.setdefault(pid, []).append((epoch, vol))

    fstat, cstat = {}, {}
    for pid, rows in sorted(commits.items()):
        rows.sort()
        times = np.array([e for e, _ in rows])
        # freshness path
        if times[-1] < EVALE - 30 * 86400:
            fstat[pid] = "static"
        else:
            inw = times[times >= EVALE - 14 * 86400]
            t_sel = inw if len(inw) > 2 else times
            dur = np.diff(t_sel).astype(float)
            n = len(dur)
            t = np.arange(n, dtype=float)
            slope = np.sum((t - t.mean()) * (dur - dur.mean())) / np.sum((t - t.mean()) ** 2)
            assert infer_season(dur - slope * t) is None, pid
            point, _lo, hi = forecast_band(dur)
            med = float(np.median(dur))
            grace = max(med, 900.0) if med < 1800 else min(43200.0, med * 0.5)
            my_hi = max(hi, point, point + grace)
            assert min(abs((my_hi % 1) - 0.5), abs((point % 1) - 0.5)) > 0.05, pid
            fstat[pid] = "H" if EVALE <= times[-1] + int(round(my_hi)) else "U"
        # completeness path (14-day window, 24h buckets zero-filled)
        vols: dict[int, int] = {}
        for e, v in rows:
            if e >= EVALE - 14 * 86400:
                b = (EVALE - e) // 86400
                vols[b] = vols.get(b, 0) + v
        if not vols:
            continue
        series = np.array([vols.get(b, 0) for b in range(max(vols), -1, -1)], dtype=float)
        train, eval_pt = series[:-1], int(series[-1])
        t = np.arange(len(train), dtype=float)
        slope = np.sum((t - t.mean()) * (train - train.mean())) / np.sum((t - t.mean()) ** 2)
        assert infer_season(train - slope * t) is None, pid
        point, lo, _hi = forecast_band(train)
        assert abs(lo - round(lo)) > 0.05, pid  # TRUNC-parity margin
        cstat[pid] = "U" if eval_pt < max(int(lo), 0) else "H"

    assert fstat[1] == "U" and fstat[3] == "static"
    assert all(s == "H" for p, s in fstat.items() if p not in (1, 3))
    assert cstat[2] == "U" and 3 not in cstat


def test_event_freshness_model_oracle_fixture_pins():
    """Pin the event_freshness_model_synthetic oracle fixture: the
    greedy O4 walk keeps exactly 361 points (one commit per burst; the
    reference cap breaks only after the kept count exceeds 360), every
    partition's training series stays non-seasonal (the
    double-mod latency noise is aperiodic within the ACF lag range),
    and the final upper bound sits away from the integer boundary where
    Python's int() truncation and SQL's FLOOR could diverge on
    cross-engine float ulps."""
    import numpy as np

    from anomaly_detection_spark.functions.forecast import forecast_band, infer_season
    from anomaly_detection_spark.operators.freshness import _event_grace_seconds

    def noise(p, j, m):
        return 600 + (((j * j * 104729 + p * 53 + m * 17) % 997) % 23) * 7

    for p in range(8):
        # training commits: all but the last; greedy newest-first >1h
        # strict spacing keeps (399, m=0) then (j, m=1) for j=398..39 —
        # 361 points (append, THEN break once count > 360).
        kept = [(399, 0)] + [(j, 1) for j in range(398, 38, -1)]
        assert len(kept) == 361
        kept_chrono = sorted(kept, key=lambda t: t[0] * 10800 + t[1] * 1800)
        y = np.array([float(noise(p, j, m)) for j, m in kept_chrono])
        if p % 3 == 2:
            # burst 399 has no events: commit (399,0) pairs with burst
            # 398's m=1 event -> latency 9000 + noise(398,1)
            y[-1] = 9000.0 + noise(p, 398, 1)
        n = len(y)
        t = np.arange(n, dtype=float)
        dd = np.sum((t - t.mean()) ** 2)
        slope = np.sum((t - t.mean()) * (y - y.mean())) / dd
        assert infer_season(y - slope * t) is None, p
        point, _lo, hi = forecast_band(y)
        final_hi = max(hi, point, 0.0) + _event_grace_seconds(float(np.median(y)))
        frac = final_hi % 1
        assert min(frac, 1 - frac) > 0.01, (p, final_hi)
        actual = (10800 if p % 3 == 2 else 0) + noise(p, 399, 1)
        assert (actual <= final_hi) == (p % 3 != 2), p
