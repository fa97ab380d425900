"""Deterministic dataset splitting and sampling for training-data
pipelines: stable train/val/test assignment and per-stratum sampling
that never depend on partitioning, row order, or a session seed.

``df.randomSplit`` re-rolls when the input re-partitions and cannot be
reproduced outside Spark; hashing a stable row id can. Every operator
here keys off ``portable_hash60(salt || ':' || id)`` — a 60-bit
md5-derived hash with a bit-exact ANSI-SQL twin
(``('0x' || substr(md5(s), 1, 15))::BIGINT``), so a downstream system
(or the DuckDB oracle) can recompute the exact membership of any
split without Spark. Pure JVM column expressions: at 100 TB a split
assignment is a zero-shuffle projection and a sample is a pushed-down
filter.
"""

from __future__ import annotations

from fractions import Fraction

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .dedup import portable_hash60

__all__ = ["split_bucket", "assign_split", "stratified_sample", "mixture_sample"]

BUCKETS = 10_000

# mixture_sample builds a literal per-group threshold expression from a
# driver-side counts collect — loud failure beyond this rather than an
# unbounded plan (domain mixing runs over dozens of groups, not 10^6).
_MAX_MIXTURE_GROUPS = 1_000


def split_bucket(id_col: Column | str, salt: str = "split", buckets: int = BUCKETS) -> Column:
    """Stable bucket in [0, buckets) from the row id: change ``salt``
    to draw an independent assignment (splitting and sampling must not
    correlate)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (portable_hash60(F.concat(F.lit(salt + ":"), c.cast("string"))) % buckets).cast("bigint")


def assign_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
    buckets: int = BUCKETS,
) -> DataFrame:
    """Append a ``split`` column assigning each row to a named split
    with the given weights (default 80/10/10 train/val/test).

    Weights are materialized as cumulative integer bucket thresholds
    (``floor(cum * buckets)``), so the realized fractions are exact to
    1/buckets and every engine computing the same hash agrees on every
    row. Thresholds are computed with exact rational arithmetic over
    the weights' DECIMAL representation (``Fraction(str(w))``), never
    accumulated floats: ``{0.7, 0.3}`` yields threshold exactly
    ``floor(0.7 * buckets) = 7000``, not the 6999 that
    ``int(float_cum * buckets)`` produces from 0.7's binary
    representation — an external engine recomputing the documented
    formula lands on the identical bucket boundary. Assignment is
    per-row and independent of all other rows — adding documents never
    moves an existing document between splits (the property
    shuffle-based splitting lacks)."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError(f"weights must be non-negative and non-empty: {weights}")
    exact = {name: Fraction(str(w)) for name, w in weights.items()}
    total = sum(exact.values())
    if total <= 0:
        raise ValueError(f"weights must sum to a positive total: {weights}")
    b = split_bucket(id_col, salt=salt, buckets=buckets)
    names = list(weights)
    cum = Fraction(0)
    expr = F.lit(names[-1])  # remainder buckets land in the last split
    thresholds: list[tuple[str, int]] = []
    for name in names[:-1]:
        cum += exact[name]
        thresholds.append((name, int(cum * buckets / total)))
    for name, thr in reversed(thresholds):
        expr = F.when(b < thr, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def mixture_sample(
    df: DataFrame,
    weights: dict[str, int],
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mixture",
    buckets: int = BUCKETS,
    default_weight: int = 0,
) -> DataFrame:
    """Downsample-only rebalancing toward a target domain mixture
    (the static data-mixing step of a pre-training pipeline): given
    integer target proportions ``weights`` (parts, not fractions —
    ``{"web": 4, "books": 1}`` targets 4:1), keep per-group fractions
    such that the kept corpus approaches the target ratios WITHOUT
    upsampling. The most under-represented group (max ``w_g / n_g``)
    keeps everything; every other group keeps
    ``(w_g * n_M) / (w_M * n_g)`` of its rows, so kept counts come out
    proportional to the target weights. Groups absent from ``weights``
    get ``default_weight`` (0 = dropped).

    Membership is engine-reproducible with NO float anywhere: a row is
    kept iff ``bucket * w_M * n_g < w_g * n_M * buckets`` — pure BIGINT
    cross-multiplication (exact while ``w * n * buckets < 2^63``, i.e.
    group counts into the 10^14 range at default buckets/weights; the
    reference group itself always passes, every comparison is integer,
    and the ANSI-SQL twin lands on identical rows). The reference
    group M is chosen by exact Fraction comparison (ties break on the
    smaller group name), never float division.

    Per-group counts are a driver-side bookkeeping collect (house
    pattern: bounded — domains, not rows; loud failure past
    ``_MAX_MIXTURE_GROUPS``), after which the filter is a literal
    when-chain — a zero-shuffle pushed-down scan predicate at any
    corpus size. Keyed on ``salt || ':' || id`` like every operator
    here, so mixture membership is independent of split/sample
    assignments and stable under re-partitioning."""
    if any((w < 0 or w != int(w)) for w in weights.values()) or default_weight < 0:
        raise ValueError(f"weights must be non-negative integers: {weights}")
    counts_rows = df.groupBy(F.col(group_col).alias("_g")).count().limit(
        _MAX_MIXTURE_GROUPS + 1
    ).collect()
    if len(counts_rows) > _MAX_MIXTURE_GROUPS:
        raise ValueError(
            f"mixture_sample saw more than {_MAX_MIXTURE_GROUPS} distinct "
            f"{group_col!r} groups — a mixture over that many domains needs a "
            f"join-based plan, not a literal threshold chain"
        )
    counts = {r["_g"]: r["count"] for r in counts_rows}
    ratios = {
        g: Fraction(int(weights.get(g, default_weight)), n)
        for g, n in counts.items()
        if n > 0 and int(weights.get(g, default_weight)) > 0
    }
    if not ratios:
        return df.filter(F.lit(False))
    # exact argmax; ties -> smallest group name (None sorts first)
    m_group = min((g for g, r in ratios.items() if r == max(ratios.values())),
                  key=lambda g: (g is not None, g))
    w_m, n_m = int(weights.get(m_group, default_weight)), counts[m_group]
    b = split_bucket(id_col, salt=salt, buckets=buckets)
    keep = F.lit(False)
    for g, n_g in counts.items():
        w_g = int(weights.get(g, default_weight))
        if w_g <= 0:
            continue
        cond = F.col(group_col).isNull() if g is None else F.col(group_col).eqNullSafe(F.lit(g))
        keep = F.when(cond, b * F.lit(w_m * n_g) < F.lit(w_g * n_m * buckets)).otherwise(keep)
    return df.filter(keep)


def stratified_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
    buckets: int = BUCKETS,
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose sample
    bucket falls under ``floor(fraction * buckets)``. Keyed on the row
    id, so the sample is stable across runs, partitionings, and
    engines; within any stratum (language, source, …) the hash is
    uniform, so per-stratum rates track ``fraction`` without a
    per-stratum pass. A plain filter — pushes down to the scan."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1]: {fraction}")
    thr = int(fraction * buckets)
    return df.filter(split_bucket(id_col, salt=salt, buckets=buckets) < thr)
