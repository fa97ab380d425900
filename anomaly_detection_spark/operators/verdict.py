"""Verdict statuses, worst-of fold, ordering, and the status-spine join.

Semantics parity with the reference:
- fold priority (worst wins): Unhealthy > Unknown > Skipped > Healthy —
  reference anomalydetection/freshness_info.py:103-114 (STALE > UNKNOWN
  > SKIPPED > FRESH; we use the completeness vocabulary Healthy /
  Unhealthy / Unknown / Skipped throughout).
- display sort: status rank → impact desc → check-type rank → name asc —
  reference anomalydetection/utils/common_utils.py:35-91 (CASE-WHEN
  rank generation; unmapped values rank 999).
- status-count spine: literal status spine LEFT JOIN counts with
  COALESCE(count, 0) — reference dashboard datasets
  (resources/Anomaly Detection.lvdash.json, `41c4cf40`/`256d5727`).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

HEALTHY = "Healthy"
UNHEALTHY = "Unhealthy"
UNKNOWN = "Unknown"
SKIPPED = "Skipped"

# Worst-first (fold priority, reference freshness_info.py:103-114).
FOLD_PRIORITY = [UNHEALTHY, UNKNOWN, SKIPPED, HEALTHY]
# Display order (reference RESULT_STATUS_ORDER / COMPLETENESS_STATUS_ORDER).
DISPLAY_ORDER = [UNHEALTHY, HEALTHY, UNKNOWN, SKIPPED]


def status_rank(col: Column | str, order: list[str] = DISPLAY_ORDER) -> Column:
    """CASE-WHEN rank for a status column; unmapped → 999 (parity with
    reference common_utils.py:55-63)."""
    col = F.col(col) if isinstance(col, str) else col
    expr = F.lit(999)
    for i, v in reversed(list(enumerate(order))):
        expr = F.when(col == v, F.lit(i)).otherwise(expr)
    return expr


def fold_statuses(*statuses: Column | str) -> Column:
    """Worst-of fold across status columns: the highest-priority status
    present wins (reference _update_overall_freshness_status)."""
    cols = [F.col(s) if isinstance(s, str) else s for s in statuses]
    expr: Column = F.lit(HEALTHY)
    for status in reversed(FOLD_PRIORITY[:-1]):  # Skipped, Unknown, Unhealthy
        cond = cols[0] == status
        for c in cols[1:]:
            cond = cond | (c == status)
        expr = F.when(cond, F.lit(status)).otherwise(expr)
    return expr


def fold_group_status(df: DataFrame, by: list[str], status_col: str = "status") -> DataFrame:
    """Fold many verdict rows per group into one overall status (worst
    wins) — the distributed analog of the reference's per-dataclass fold."""
    rank = status_rank(status_col, FOLD_PRIORITY)
    folded = df.groupBy(*by).agg(F.min(rank).alias("_r"))
    mapping = F.lit(None).cast("string")
    for i, v in reversed(list(enumerate(FOLD_PRIORITY))):
        mapping = F.when(F.col("_r") == i, F.lit(v)).otherwise(mapping)
    return folded.select(*by, mapping.alias("overall_status"))


def sort_verdicts(
    df: DataFrame,
    status_col: str = "status",
    check_type_col: str = "rule_id",
    name_col: str = "partition_id",
    impact_col: str | None = None,
) -> DataFrame:
    """Multi-key verdict sort (SURVEY.md §2 O1): status rank, impact
    desc (missing impact → lowest priority), check-type, name asc.
    Helper rank columns are internal — never materialized in output.
    ``impact_col`` may be a nested path (e.g.
    ``downstream_impact.impact_level``) — presence is checked on the
    top-level field."""
    keys: list[Column] = [status_rank(status_col, DISPLAY_ORDER)]
    if impact_col is not None and impact_col.split(".")[0] in df.columns:
        keys.append(
            -F.when(F.col(impact_col).isNotNull(), F.col(impact_col)).otherwise(F.lit(-1))
        )
    keys.append(F.col(check_type_col))
    keys.append(F.col(name_col).asc())
    return df.orderBy(*keys)


def status_counts_with_spine(
    spark: SparkSession,
    verdicts: DataFrame,
    status_col: str = "status",
    statuses: list[str] = DISPLAY_ORDER,
) -> DataFrame:
    """Status spine LEFT JOIN grouped counts, zero-filled (J1). The
    spine is a literal handful of rows → broadcast join."""
    spine = spark.createDataFrame([(s,) for s in statuses], f"{status_col} string")
    counts = verdicts.groupBy(status_col).agg(F.count(F.lit(1)).alias("cnt"))
    return (
        spine.join(counts, on=status_col, how="left")
        .select(F.col(status_col), F.coalesce(F.col("cnt"), F.lit(0)).alias("status_count"))
    )


def latest_per_group(df: DataFrame, by: list[str], ts_col: str) -> DataFrame:
    """Latest-row-per-group (W2): row_number over desc ts, keep rn=1 —
    how the engine reads the newest checkpoint state per
    (partition, rule) from the lineage table."""
    from pyspark.sql import Window

    w = Window.partitionBy(*by).orderBy(F.col(ts_col).desc())
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
