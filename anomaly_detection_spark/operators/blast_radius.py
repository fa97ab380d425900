"""Blast radius / downstream impact (SURVEY.md §2 M17 + J3).

The reference fetched downstream lineage per table over REST
(anomalydetection/blast_radius.py:8-45) and mapped query counts to an
impact level with thresholds 30/300/3000 (blast_radius.py:70-92). Here
lineage is a real edges DataFrame and both steps are Spark plans:
1-hop downstream expansion is a self-joinable edge lookup; impact
levels are a pure column expression.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# query-count thresholds → impact level (reference blast_radius.py:70-92)
IMPACT_THRESHOLDS = (30, 300, 3000)


def impact_level(num_queries: Column | str) -> Column:
    """1 + number of thresholds crossed: <30 → 1, <300 → 2, <3000 → 3,
    else 4."""
    q = F.col(num_queries) if isinstance(num_queries, str) else num_queries
    lvl = F.lit(1)
    for i, th in enumerate(IMPACT_THRESHOLDS):
        lvl = F.when(q >= th, F.lit(i + 2)).otherwise(lvl)
    return lvl


def downstream_impact(
    roots: DataFrame,
    edges: DataFrame,
    queries_per_table: DataFrame,
    root_col: str = "partition_id",
    hops: int = 1,
) -> DataFrame:
    """Downstream impact per root: expand ``hops`` levels through the
    edges table (src, dst), join query counts, emit the reference's
    nested impact struct. Edges/counts are dimension-sized → broadcast."""
    frontier = roots.select(F.col(root_col).alias("root"), F.col(root_col).alias("node"))
    reached = frontier
    for _ in range(hops):
        step = (
            reached.join(
                F.broadcast(edges.select(F.col("src").alias("node"), F.col("dst"))), "node"
            )
            .select("root", F.col("dst").alias("node"))
        )
        reached = reached.unionByName(step).distinct()
    downstream = reached.filter(F.col("node") != F.col("root"))
    counts = downstream.join(
        F.broadcast(queries_per_table.select(F.col("table").alias("node"), "num_queries")),
        "node",
        "left",
    )
    agg = counts.groupBy("root").agg(
        F.count(F.lit(1)).alias("num_downstream_tables"),
        F.coalesce(F.sum("num_queries"), F.lit(0)).cast("int").alias("num_queries_on_affected_tables"),
    )
    return agg.select(
        F.col("root").alias(root_col),
        F.struct(
            impact_level("num_queries_on_affected_tables").cast("int").alias("impact_level"),
            F.col("num_downstream_tables").cast("int").alias("num_downstream_tables"),
            F.col("num_queries_on_affected_tables").alias("num_queries_on_affected_tables"),
        ).alias("downstream_impact"),
    )
