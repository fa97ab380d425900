"""DSIR-style data selection: hashed n-gram importance weights.

Data Selection via Importance Resampling (Xie et al., 2023): model a
TARGET corpus (high-quality reference, e.g. curated wiki/books) and the
RAW corpus as bag-of-hashed-n-gram distributions, score every raw doc
with the log importance ratio sum_g ln(p_target(g) / p_raw(g)), then
keep the top slice (or Gumbel-resample by weight). This is the standard
"make the 100 TB crawl look like the target distribution" selection
pass, composing with quality/langid/dedup curation signals.

Spark-first shape:
- feature extraction = ONE scan per corpus: stacked strict 1..n-gram
  explode (the repetition_metrics pattern; no nested higher-order
  lambdas) -> pmod(hash) bucket -> hash aggregate. The shuffle carries
  at most ``n_buckets`` rows per corpus, regardless of corpus size.
- the fitted model is a dense ``n_buckets``-row frame (every bucket
  present via a range spine, so scoring needs no driver-side
  constants) — broadcastable by construction, never a literal plan.
- scoring = one scan: explode grams -> broadcast hash join on bucket
  -> per-doc sum. One exchange keyed by doc id; blank/NULL docs
  survive with zero features and weight 0 (explode_outer contract,
  like decontam/repetition).

With ``hash_fn=portable_hash60`` and integer ``alpha=1`` every ln()
argument is an exact integer both engines compute identically, so the
whole pipeline has a DuckDB oracle twin (the lm_perplexity gate showed
DuckDB/Spark ln/exp agree to ~1 ulp; the gate pins decisive margins).
Default ``hash_fn=F.xxhash64`` is the fast production path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from anomaly_detection_spark.operators.decontam import _doc_shingles

# the fitted ratio frame is broadcast at serve time — keep it honestly
# small (DSIR's published setting is 10k buckets; 1M rows ~ the repo's
# count-guarded broadcast bound)
_MAX_BUCKETS = 1_000_000


def _grams_expr(text_col: str, ns: tuple[int, ...]):
    """The feature-gram array — ONE definition shared by fit and serve:
    the importance model is only valid when both sides extract
    bit-identical grams, so the expression must never fork."""
    return F.concat(*[_doc_shingles(text_col, k, distinct=False) for k in ns])


def hashed_gram_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    ns: tuple[int, ...] = (1, 2),
    hash_fn=F.xxhash64,
) -> DataFrame:
    """Per-doc hashed n-gram bucket counts: ``(id_col, bucket, cnt)``.

    One scan, one hash aggregate. Grams use the STRICT contract (no
    grams for sub-k-word or blank/NULL docs — ``decontam._doc_shingles``)
    with positional multiplicity, so counts are true occurrence counts.
    Docs with zero grams emit no rows here; weight-side consumers
    re-attach them via explode_outer/LEFT joins.
    """
    if not 0 < n_buckets <= _MAX_BUCKETS:
        raise ValueError(f"n_buckets must be in (0, {_MAX_BUCKETS}]: {n_buckets}")
    return (
        df.select(F.col(id_col), F.explode(_grams_expr(text_col, ns)).alias("_g"))
        .select(
            id_col,
            F.pmod(hash_fn(F.col("_g")), F.lit(n_buckets)).cast("bigint").alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def _corpus_buckets(df: DataFrame, text_col, n_buckets, ns, hash_fn) -> DataFrame:
    """Corpus-level (bucket, cnt) — the map-side-combined aggregate; at
    most ``n_buckets`` rows cross the wire."""
    return (
        df.select(F.explode(_grams_expr(text_col, ns)).alias("_g"))
        .select(F.pmod(hash_fn(F.col("_g")), F.lit(n_buckets)).cast("bigint").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def dsir_log_ratios(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = 10_000,
    ns: tuple[int, ...] = (1, 2),
    hash_fn=F.xxhash64,
    alpha: float = 1.0,
) -> DataFrame:
    """Fit the importance model: a DENSE ``(bucket, t_cnt, r_cnt,
    log_ratio)`` frame with one row for EVERY bucket (range spine +
    LEFT joins), where::

        log_ratio = ln(t_b + a) - ln(T + aB) - [ln(r_b + a) - ln(R + aB)]

    (Laplace-smoothed class-conditional log-likelihood ratio). The
    dense spine means unseen buckets carry the correct smoothed ratio
    and scoring needs no collected constants. Row count == n_buckets by
    construction, so the serve side may broadcast it unconditionally.
    """
    if not 0 < n_buckets <= _MAX_BUCKETS:
        raise ValueError(f"n_buckets must be in (0, {_MAX_BUCKETS}]: {n_buckets}")
    spark = target.sparkSession
    t = _corpus_buckets(target, text_col, n_buckets, ns, hash_fn)
    r = _corpus_buckets(raw, text_col, n_buckets, ns, hash_fn)
    spine = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    a = float(alpha)
    ab = a * n_buckets
    # the corpus aggregates are <= n_buckets rows BY CONSTRUCTION (the
    # groupBy key is pmod(hash, n_buckets)) — broadcast them outright;
    # without the hint Catalyst sees unknown stats and plans the spine
    # joins as sort-merge (two needless sorts + exchanges)
    joined = (
        spine.join(F.broadcast(t.withColumnRenamed("cnt", "t_cnt")), "bucket", "left")
        .join(F.broadcast(r.withColumnRenamed("cnt", "r_cnt")), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("t_cnt", F.lit(0)).cast("bigint").alias("t_cnt"),
            F.coalesce("r_cnt", F.lit(0)).cast("bigint").alias("r_cnt"),
        )
    )
    # totals via a whole-frame window, NOT a second aggregate branch: a
    # separate joined.agg() would make Catalyst re-plan (and re-SCAN)
    # both corpora a second time — common subtrees are not deduped. The
    # window's single-partition exchange moves only n_buckets rows.
    w = Window.partitionBy()
    totals_t = F.sum("t_cnt").over(w)
    totals_r = F.sum("r_cnt").over(w)
    return joined.select(
        "bucket",
        "t_cnt",
        "r_cnt",
        (
            F.log(F.col("t_cnt") + F.lit(a)) - F.log(totals_t + F.lit(ab))
            - F.log(F.col("r_cnt") + F.lit(a)) + F.log(totals_r + F.lit(ab))
        ).alias("log_ratio"),
    )


def dsir_weights(
    docs: DataFrame,
    ratios: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    ns: tuple[int, ...] = (1, 2),
    hash_fn=F.xxhash64,
) -> DataFrame:
    """Per-doc importance scores: ``(id_col, n_grams, log_weight)``.

    ``n_buckets``/``ns``/``hash_fn`` must match the fit. One scan over
    ``docs``: gram explode_outer (blank/NULL docs keep a row with zero
    grams and weight 0.0) -> broadcast join on bucket -> one hash
    aggregate keyed by the doc id. A real gram whose bucket is missing
    from ``ratios`` fails the job loudly — the dense fit spine covers
    every bucket, so a miss can only mean the serve n_buckets/hash_fn
    diverged from the fit, and F.sum() skipping the NULL would
    otherwise return quietly truncated (wrong) weights."""
    exploded = docs.select(
        F.col(id_col), F.explode_outer(_grams_expr(text_col, ns)).alias("_g")
    ).select(
        id_col,
        F.when(
            F.col("_g").isNotNull(),
            F.pmod(hash_fn(F.col("_g")), F.lit(n_buckets)).cast("bigint"),
        ).alias("bucket"),
    )
    rt = F.broadcast(ratios.select("bucket", "log_ratio"))
    guarded_ratio = F.when(
        F.col("bucket").isNotNull() & F.col("log_ratio").isNull(),
        F.raise_error(
            "dsir_weights: gram bucket not covered by the ratio frame — "
            "n_buckets/hash_fn must match dsir_log_ratios' fit"
        ).cast("double"),
    ).otherwise(F.col("log_ratio"))
    return (
        exploded.join(rt, "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.col("bucket")).cast("bigint").alias("n_grams"),
            F.coalesce(F.sum(guarded_ratio), F.lit(0.0)).alias("log_weight"),
        )
    )


def dsir_keep(
    weights: DataFrame,
    tau: float,
    min_grams: int = 1,
) -> DataFrame:
    """Deterministic threshold selection over :func:`dsir_weights`
    output: ``keep = (log_weight > tau) AND (n_grams >= min_grams)``.
    Zero-shuffle projection. Pick ``tau`` offline (e.g. approxQuantile
    on a sample for a kept-fraction target); for the paper's Gumbel
    RESAMPLING, add a seeded-hash Gumbel perturbation and threshold
    that instead — both stay scan-local, there is no global sort."""
    return weights.withColumn(
        "keep",
        ((F.col("log_weight") > F.lit(float(tau))) & (F.col("n_grams") >= F.lit(min_grams))).cast(
            "boolean"
        ),
    )
