import math

import pyspark.sql.functions as F

from anomaly_detection_spark.operators.drift import EPS, drift_verdicts, histogram_sketch, psi_ks
from anomaly_detection_spark.sources.history import (
    UPDATE_OP_KEYS,
    bucket_volumes,
    filter_history,
    row_volume,
)


def test_histogram_fixed_boundaries_and_clamping(spark):
    df = spark.createDataFrame([( -5.0,), (0.0,), (9.9,), (10.0,), (99.0,), (150.0,)], "v double")
    h = {r["bucket"]: r["count"] for r in histogram_sketch(df, "v", 0.0, 100.0, 10).collect()}
    # -5 clamps into bucket 1; 0→1; 9.9→1; 10.0→2; 99→10; 150 clamps→10
    assert h == {1: 3, 2: 1, 10: 2}


def test_psi_ks_hand_computed(spark):
    # identical distributions → psi 0, ks 0
    a = spark.createDataFrame([(1, 50), (2, 50)], "bucket int, count long")
    out = psi_ks(a, a, n_buckets=2).first()
    assert abs(out["psi"]) < 1e-12 and abs(out["ks"]) < 1e-12
    # hand case: p=(0.8,0.2), q=(0.2,0.8)
    b = spark.createDataFrame([(1, 20), (2, 80)], "bucket int, count long")
    a2 = spark.createDataFrame([(1, 80), (2, 20)], "bucket int, count long")
    out = psi_ks(a2, b, n_buckets=2).first()
    expected_psi = (0.8 - 0.2) * math.log(0.8 / 0.2) * 2
    assert abs(out["psi"] - expected_psi) < 1e-9
    assert abs(out["ks"] - 0.6) < 1e-9


def test_drift_verdict_thresholds(spark):
    a = spark.createDataFrame([(0, 1, 80), (0, 2, 20)], "partition_id int, bucket int, count long")
    b = spark.createDataFrame([(0, 1, 20), (0, 2, 80)], "partition_id int, bucket int, count long")
    same = drift_verdicts(a, a, by=["partition_id"], n_buckets=2).first()
    shifted = drift_verdicts(a, b, by=["partition_id"], n_buckets=2).first()
    assert same["status"] == "Healthy" and shifted["status"] == "Unhealthy"


def _commits(spark, rows):
    return spark.createDataFrame(
        rows, "partition_id int, timestamp timestamp, operation string, operationMetrics map<string,string>"
    )


def test_history_filters_f1_f2_f3(spark):
    import datetime as dt

    t = dt.datetime(2025, 8, 15, 12, 0, 0)
    rows = [
        (0, t, "WRITE", {"numOutputRows": "10", "numFiles": "1", "numOutputBytes": "100"}),
        (0, t, "OPTIMIZE", {"numOutputRows": "10"}),  # F1: non-update op dropped
        (0, t, "WRITE", {"numOutputRows": "0", "numFiles": "0", "numOutputBytes": "0"}),  # F2: empty write dropped
        (0, t, "WRITE", {"numFiles": "0", "numOutputBytes": "5"}),  # numFiles=0 → dropped
        (0, t, "MERGE", {"numTargetRowsInserted": "7"}),  # missing keys → NULL → kept
        (0, dt.datetime(2025, 7, 1), "WRITE", {"numOutputRows": "9", "numFiles": "1", "numOutputBytes": "9"}),  # F3: outside lookback
    ]
    df = _commits(spark, rows)
    ev = F.to_timestamp(F.lit("2025-08-16 00:00:00"))
    kept = filter_history(df, eval_time=ev, lookback_days=14).collect()
    assert len(kept) == 2
    assert {r["operation"] for r in kept} == {"WRITE", "MERGE"}
    no_window = filter_history(df, eval_time=None, lookback_days=None).collect()
    assert len(no_window) == 3


def test_row_volume_extraction_a3(spark):
    import datetime as dt

    t = dt.datetime(2025, 8, 15)
    rows = [
        (0, t, "WRITE", {"numOutputRows": "100"}),
        (0, t, "MERGE", {"numTargetRowsInserted": "50", "numDeletedRows": "5"}),
        (0, t, "UPDATE", {"numUpdatedRows": "30"}),
        (0, t, "CLONE", {"numOutputRows": "99"}),  # CLONE has no metric mapping → 0
    ]
    out = [r["row_volume"] for r in _commits(spark, rows).select(row_volume()).collect()]
    assert out == [100, 45, 30, 0]


def test_bucket_volumes_zero_fill(spark):
    import datetime as dt

    rows = [
        (0, dt.datetime(2025, 8, 15, 23, 0), "WRITE", {"numOutputRows": "10", "numFiles": "1", "numOutputBytes": "1"}),
        (0, dt.datetime(2025, 8, 12, 23, 0), "WRITE", {"numOutputRows": "20", "numFiles": "1", "numOutputBytes": "1"}),
    ]
    ev = F.to_timestamp(F.lit("2025-08-16 00:00:00"))
    out = {
        r["bucket"]: r["volume"]
        for r in bucket_volumes(_commits(spark, rows), ev, by=["partition_id"]).collect()
    }
    # gap buckets 1 and 2 zero-filled
    assert out == {0: 10, 1: 0, 2: 0, 3: 20}


def test_profile_approx_distinct_within_rsd(spark):
    from anomaly_detection_spark.operators.profile import ProfileSpec, profile

    df = spark.range(20000).selectExpr("cast(id % 5000 as string) as k")
    got = profile(df, [ProfileSpec("k", distinct_rsd=0.02)]).first()["k__approx_distinct"]
    assert abs(got - 5000) / 5000 < 0.05
