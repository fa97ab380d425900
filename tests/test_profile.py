import math

import pyspark.sql.functions as F

from anomaly_detection_spark.operators.profile import ProfileSpec, profile, profile_long


def test_profile_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (1, None), (1, 20.0), (2, 5.0), (2, 5.0)],
        "g int, x double",
    )
    out = {r["g"]: r for r in profile(df, [ProfileSpec("x", numeric=True, quantiles=(0.5,))], by=["g"]).collect()}
    g1 = out[1]
    assert g1["total_rows"] == 3
    assert g1["x__count"] == 2 and g1["x__nulls"] == 1
    assert g1["x__min"] == 10.0 and g1["x__max"] == 20.0
    assert math.isclose(g1["x__mean"], 15.0)
    assert g1["x__quantiles"][0] in (10.0, 20.0, 15.0)
    g2 = out[2]
    assert g2["x__approx_distinct"] == 1


def test_profile_single_pass_plan(spark):
    """All stats must fuse into ONE aggregate (one scan, no join)."""
    df = spark.range(100).select(F.col("id").cast("double").alias("x"), (F.col("id") % 4).alias("g"))
    plan = profile(df, [ProfileSpec("x", numeric=True)], by=["g"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Scan") <= 1


def test_profile_long_metrics_map(spark):
    df = spark.createDataFrame([(1, "a"), (1, None)], "g int, s string")
    rows = profile_long(df, [ProfileSpec("s")], by=["g"]).collect()
    m = rows[0]["metrics"]
    assert m["count"] == "1" and m["nulls"] == "1"
    assert float(m["null_rate"]) == 0.5
