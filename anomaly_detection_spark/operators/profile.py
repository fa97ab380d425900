"""Single-pass per-column profiling (SURVEY.md §2 A10).

Generalizes the reference's per-table metric extraction (reference:
anomalydetection/completeness_utils.py:26-78 computes one metric per
table in a driver loop) into ONE Spark aggregate plan: all requested
per-column statistics — count, null count/rate, approx distinct (HLL),
min/max/mean, approx quantiles (t-digest-style sketch) — are fused into
a single ``groupBy(partition).agg(...)`` so one scan of the table
produces the whole profile. Spark executes this as a partial+final
hash-aggregate: map-side combine means the shuffle carries one sketch
row per (partition_key, task), which is what keeps this viable at
10^12 rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql import types as T


@dataclass(frozen=True)
class ProfileSpec:
    """Which statistics to compute for one column."""

    column: str
    numeric: bool = False
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75)
    approx_distinct: bool = True
    distinct_rsd: float = 0.02


def _col_aggs(spec: ProfileSpec) -> list[Column]:
    c = F.col(spec.column)
    p = spec.column
    aggs = [
        F.count(c).alias(f"{p}__count"),
        F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"{p}__nulls"),
        F.min(c).alias(f"{p}__min"),
        F.max(c).alias(f"{p}__max"),
    ]
    if spec.approx_distinct:
        aggs.append(F.approx_count_distinct(c, rsd=spec.distinct_rsd).alias(f"{p}__approx_distinct"))
    if spec.numeric:
        aggs.append(F.avg(c).alias(f"{p}__mean"))
        aggs.append(F.stddev(c).alias(f"{p}__stddev"))
        if spec.quantiles:
            aggs.append(
                F.percentile_approx(c, list(spec.quantiles), 10_000).alias(f"{p}__quantiles")
            )
    return aggs


def profile(df: DataFrame, specs: list[ProfileSpec], by: list[str] | None = None) -> DataFrame:
    """One-pass profile: a single agg over all specs (one scan, one shuffle).

    Returns one (wide) row per group; ``total_rows`` counts all rows
    including nulls so null_rate = nulls / total_rows.
    """
    aggs = [F.count(F.lit(1)).alias("total_rows")]
    for s in specs:
        aggs.extend(_col_aggs(s))
    grouped = df.groupBy(*[F.col(b) for b in (by or [])]) if by else df.groupBy()
    return grouped.agg(*aggs)


def profile_long(df: DataFrame, specs: list[ProfileSpec], by: list[str] | None = None) -> DataFrame:
    """Long-format profile: one row per (group, column) with a metrics map
    (map<string,string>) — the shape the lineage/metrics table stores
    (generalizing the reference's logging-table ``additional_debug_info``,
    reference anomalydetection/utils/logging_table_utils.py:36-39)."""
    wide = profile(df, specs, by)
    by = by or []
    rows = []
    for s in specs:
        p = s.column
        entries: list[Column] = [
            F.lit("count"), F.col(f"{p}__count").cast("string"),
            F.lit("nulls"), F.col(f"{p}__nulls").cast("string"),
            F.lit("null_rate"),
            F.when(F.col("total_rows") > 0, F.col(f"{p}__nulls") / F.col("total_rows")).cast("string"),
            F.lit("min"), F.col(f"{p}__min").cast("string"),
            F.lit("max"), F.col(f"{p}__max").cast("string"),
        ]
        if s.approx_distinct:
            entries += [F.lit("approx_distinct"), F.col(f"{p}__approx_distinct").cast("string")]
        if s.numeric:
            entries += [F.lit("mean"), F.col(f"{p}__mean").cast("string")]
            for i, q in enumerate(s.quantiles):
                entries += [F.lit(f"q{q}"), F.col(f"{p}__quantiles")[i].cast("string")]
        rows.append(F.struct(F.lit(p).alias("column_name"), F.map_from_arrays(
            F.array(*entries[0::2]), F.array(*entries[1::2])).alias("metrics")))
    return (
        wide.select(*by, F.col("total_rows"), F.explode(F.array(*rows)).alias("prof"))
        .select(*by, "total_rows", F.col("prof.column_name").alias("column_name"), F.col("prof.metrics").alias("metrics"))
    )
