"""Commit/snapshot-log scan and filters (SURVEY.md §2 S1, F1-F4, A3).

The reference consumes Delta `DESCRIBE HISTORY` per table and filters
in pandas on the driver (reference anomalydetection/utils/
table_history_utils.py:39-131). Here the commit log is one DataFrame
for ALL partitions (locally the synthetic `_commits` table; on a real
deployment the Iceberg `snapshots` metadata table, a 1:1 semantic
match) and every filter is a pushed-down column predicate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Update-operation whitelist — semantics of reference
# table_history_utils.py:17-28 (Delta operation names).
UPDATE_OP_KEYS = [
    "WRITE",
    "CREATE TABLE",
    "CREATE TABLE AS SELECT",
    "REPLACE TABLE AS SELECT",
    "COPY INTO",
    "STREAMING UPDATE",
    "MERGE",
    "UPDATE",
    "CREATE OR REPLACE TABLE AS SELECT",
    "CLONE",
]

# Operation → row-volume metric key — reference completeness_utils.py:49-58.
_OP_TO_METRIC = {
    "WRITE": "numOutputRows",
    "CREATE TABLE AS SELECT": "numOutputRows",
    "REPLACE TABLE AS SELECT": "numOutputRows",
    "COPY INTO": "numOutputRows",
    "STREAMING UPDATE": "numOutputRows",
    "MERGE": "numTargetRowsInserted",
    "UPDATE": "numUpdatedRows",
    "CREATE OR REPLACE TABLE AS SELECT": "numOutputRows",
}


def _not_empty_write(m: Column) -> Column:
    """Keep row iff each of numFiles/numOutputRows/numOutputBytes is NULL
    or != 0 — conjunction of three disjunctions over map keys, parity
    with reference table_history_utils.py:120-131."""
    cond = F.lit(True)
    for k in ("numFiles", "numOutputRows", "numOutputBytes"):
        v = m.getItem(k)
        cond = cond & (v.isNull() | (v.cast("long") != 0))
    return cond


def filter_history(
    commits: DataFrame,
    eval_time: Column | str | None = None,
    lookback_days: int | None = 14,
    metrics_col: str = "operationMetrics",
) -> DataFrame:
    """F1 (op whitelist) + F2 (empty-write drop) + F3 (lookback window).

    All three are plain predicates Catalyst pushes into the scan; on a
    date/partition-keyed commit table F3 additionally prunes partitions.
    """
    out = commits.filter(F.col("operation").isin(UPDATE_OP_KEYS)).filter(
        _not_empty_write(F.col(metrics_col))
    )
    if lookback_days is not None and eval_time is not None:
        et = F.to_timestamp(F.lit(eval_time)) if isinstance(eval_time, str) else eval_time
        out = out.filter(F.col("timestamp") >= et - F.expr(f"INTERVAL {lookback_days} DAYS"))
    return out


def row_volume(op: Column | str = "operation", metrics: Column | str = "operationMetrics") -> Column:
    """Per-commit row volume as a pure column expression — replaces the
    reference's row-at-a-time pandas apply (completeness_utils.py:61-67,
    flagged in SURVEY.md §2 P4 as the anti-pattern)."""
    op = F.col(op) if isinstance(op, str) else op
    m = F.col(metrics) if isinstance(metrics, str) else metrics
    base = F.lit(0).cast("long")
    for op_name, key in _OP_TO_METRIC.items():
        base = F.when(op == op_name, F.coalesce(m.getItem(key).cast("long"), F.lit(0))).otherwise(base)
    deleted = F.coalesce(m.getItem("numDeletedRows").cast("long"), F.lit(0))
    return (base - deleted).alias("row_volume")


def bucket_volumes(
    commits: DataFrame,
    eval_time: Column,
    by: list[str] | None = None,
    bucket_seconds: int = 24 * 3600,
) -> DataFrame:
    """24h-bucket row-volume sums per group, zero-filled (SURVEY.md §2 A2).

    bucket = floor((eval_time - ts) / 24h); missing buckets between 0 and
    the group's max are filled with 0 via a generated per-group spine
    (sequence+explode) — the distributed analog of the reference's
    pandas ``reindex(fill_value=0)`` (completeness_utils.py:75-76).
    Output: (by..., bucket, volume), bucket DESC = oldest first.
    """
    by = by or []
    bucket = F.floor(
        (F.unix_timestamp(eval_time) - F.unix_timestamp(F.col("timestamp"))) / F.lit(bucket_seconds)
    ).cast("int")
    volumes = (
        commits.select(*by, bucket.alias("bucket"), row_volume())
        .groupBy(*by, "bucket")
        .agg(F.sum("row_volume").alias("volume"))
    )
    spine = (
        volumes.groupBy(*by)
        .agg(F.max("bucket").alias("_maxb"))
        .select(*by, F.explode(F.sequence(F.lit(0), F.col("_maxb"))).alias("bucket"))
    )
    return (
        spine.join(volumes, on=[*by, "bucket"], how="left")
        .select(*by, "bucket", F.coalesce(F.col("volume"), F.lit(0)).alias("volume"))
    )
