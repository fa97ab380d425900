"""Distribution-drift detection between snapshots (SURVEY.md §2 A12).

Generalizes the reference's scalar "current vs forecast" verdict
(anomalydetection/completeness_utils.py:221-227) to whole
distributions: per (partition, column), a fixed-boundary histogram
sketch is built per snapshot, and consecutive snapshots are compared
with PSI and KS — both as pure column expressions (no Python).

Scale notes:
- bucket boundaries are FIXED per column (passed in, typically from the
  first snapshot's min/max) so sketches are mergeable and PSI is
  well-defined across snapshots (SURVEY.md §7 "what's hard" #5).
- the histogram is one groupBy over (snapshot, partition, bucket) with
  map-side partial aggregation — the shuffle carries at most
  n_buckets rows per group, independent of row count.
- PSI/KS compare joins sketch-to-sketch: tiny inputs, broadcast-able.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from anomaly_detection_spark.operators import verdict as V

RULE_ID = "drift.distribution"
EPS = 1e-6  # smoothing for empty buckets in PSI


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int = 32,
    by: list[str] | None = None,
) -> DataFrame:
    """Fixed-boundary histogram: (by..., bucket, count). Values outside
    [lo, hi) clamp into the edge buckets. Bucket index is the explicit
    expression floor((v - lo) / width) + 1 rather than width_bucket so
    an external oracle computing the same formula gets bit-identical
    doubles (width_bucket's internal arithmetic differs per engine)."""
    by = by or []
    width = (float(hi) - float(lo)) / n_buckets
    b = (F.floor((F.col(value_col).cast("double") - F.lit(float(lo))) / F.lit(width)) + 1).cast("int")
    b = F.least(F.greatest(b, F.lit(1)), F.lit(n_buckets))
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*by, b.cast("int").alias("bucket"))
        .groupBy(*by, "bucket")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _normalized(hist: DataFrame, by: list[str]) -> DataFrame:
    w = Window.partitionBy(*by) if by else Window.partitionBy(F.lit(1))
    return hist.withColumn("p", F.col("count") / F.sum("count").over(w))


def psi_ks(
    hist_a: DataFrame,
    hist_b: DataFrame,
    by: list[str] | None = None,
    n_buckets: int = 32,
) -> DataFrame:
    """PSI and KS between two histogram sketches with identical bucket
    boundaries. Returns (by..., psi, ks).

    PSI = Σ (p−q)·ln(p/q) with ε-smoothing; KS = max |CDF_p − CDF_q|
    via a cumulative-sum window over bucket order (SURVEY.md §2 W5).
    Missing buckets on either side are zero-filled from a generated
    spine so both CDFs cover the full bucket range.
    """
    by = by or []
    a = _normalized(hist_a, by).select(*by, "bucket", F.col("p").alias("p_a"))
    b = _normalized(hist_b, by).select(*by, "bucket", F.col("p").alias("p_b"))
    keys = a.select(*by).union(b.select(*by)).distinct()
    spine = keys.select(*by, F.explode(F.sequence(F.lit(1), F.lit(n_buckets))).alias("bucket"))
    joined = (
        spine.join(a, on=[*by, "bucket"], how="left")
        .join(b, on=[*by, "bucket"], how="left")
        .select(
            *by,
            "bucket",
            F.coalesce(F.col("p_a"), F.lit(0.0)).alias("p_a"),
            F.coalesce(F.col("p_b"), F.lit(0.0)).alias("p_b"),
        )
    )
    pa = F.greatest(F.col("p_a"), F.lit(EPS))
    pb = F.greatest(F.col("p_b"), F.lit(EPS))
    psi_term = (pa - pb) * F.log(pa / pb)
    w = (Window.partitionBy(*by) if by else Window.partitionBy(F.lit(1))).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    with_cdf = joined.select(
        *by,
        psi_term.alias("psi_term"),
        F.abs(F.sum("p_a").over(w) - F.sum("p_b").over(w)).alias("cdf_diff"),
    )
    grouped = with_cdf.groupBy(*by) if by else with_cdf.groupBy()
    return grouped.agg(F.sum("psi_term").alias("psi"), F.max("cdf_diff").alias("ks"))


def drift_verdicts(
    hist_a: DataFrame,
    hist_b: DataFrame,
    by: list[str] | None = None,
    n_buckets: int = 32,
    psi_threshold: float = 0.2,
    ks_threshold: float = 0.2,
) -> DataFrame:
    """Per-group drift verdict: Unhealthy iff PSI or KS exceeds its
    threshold (0.2 is the conventional PSI 'significant shift' cut)."""
    by = by or []
    scored = psi_ks(hist_a, hist_b, by=by, n_buckets=n_buckets)
    return scored.select(
        *by,
        F.lit(RULE_ID).alias("rule_id"),
        F.when(
            (F.col("psi") > psi_threshold) | (F.col("ks") > ks_threshold), F.lit(V.UNHEALTHY)
        ).otherwise(F.lit(V.HEALTHY)).alias("status"),
        F.round("psi", 6).alias("psi"),
        F.round("ks", 6).alias("ks"),
    )
