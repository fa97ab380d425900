"""Trained quality classifier: logistic regression on hashed n-grams.

The fasttext-style "train a quality model on labeled good/bad docs,
filter the crawl with it" pass (cf. the GPT-3/LLaMA Wikipedia-vs-crawl
classifiers and FineWeb-Edu's model-based filtering) — the
discriminative twin of :mod:`.dsir`'s generative log-likelihood-ratio
selection, sharing its feature space (strict unigram+bigram grams,
``pmod(hash, n_buckets)`` buckets).

Model: p(quality) = sigmoid(b + sum_g w[bucket(g)] * cnt_g / n_grams)
(count-normalized bag of hashed n-grams, an explicit bias row).
Training is FULL-BATCH gradient descent with a fixed learning rate and
iteration count — deterministic by construction, no RNG anywhere.

Spark-first shape:
- the (doc, bucket, cnt) feature frame is built ONCE and
  localCheckpoint'ed (eager; the per-iteration plans stay O(1) — the
  BPE-training lesson).
- each iteration is two hash aggregates over that frame: margins
  (join the broadcast weight frame, sum per doc) then gradient
  (scatter per-doc residuals back, sum per bucket). Shuffle volume
  <= n_buckets + n_docs rows per iteration, never the corpus text.
- the weight frame (n_buckets+1 rows incl. bias) is localCheckpoint'ed
  per iteration: plan size O(1) in iterations, superseded checkpoints
  freed by the ContextCleaner.
- serving is the dsir_weights shape: one scan, broadcast weight join,
  one per-doc aggregate. Zero Python in any hot path.

Every arithmetic step is plain float math over integer-derived inputs,
so a DuckDB oracle can replay the WHOLE training loop as N unrolled
CTE blocks (no recursion needed for a fixed iteration count) — the
same channel the lm/dsir gates use, with end-state decisiveness pinned
in tests.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from anomaly_detection_spark.operators.dsir import _MAX_BUCKETS, _grams_expr

BIAS_BUCKET = -1  # the bias rides the weight frame as bucket -1, x=1.0


def doc_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    ns: tuple[int, ...] = (1, 2),
    hash_fn=F.xxhash64,
) -> DataFrame:
    """Normalized hashed-gram features ``(id_col, bucket, x)`` with the
    bias row (bucket -1, x=1.0) appended per doc. Gram-less (blank /
    NULL) docs still get their bias row, so every doc is scoreable.
    ``x = cnt / n_grams`` (count-normalized)."""
    if not 0 < n_buckets <= _MAX_BUCKETS:
        raise ValueError(f"n_buckets must be in (0, {_MAX_BUCKETS}]: {n_buckets}")
    exploded = df.select(
        F.col(id_col), F.explode_outer(_grams_expr(text_col, ns)).alias("_g")
    ).select(
        id_col,
        F.when(
            F.col("_g").isNotNull(),
            F.pmod(hash_fn(F.col("_g")), F.lit(n_buckets)).cast("bigint"),
        ).alias("bucket"),
    )
    w = Window.partitionBy(id_col)
    counted = (
        exploded.groupBy(id_col, "bucket")
        .agg(F.count(F.when(F.col("bucket").isNotNull(), 1)).alias("_cnt"))
        .withColumn("_n", F.sum("_cnt").over(w))
    )
    feats = counted.where(F.col("bucket").isNotNull()).select(
        id_col, "bucket", (F.col("_cnt") / F.col("_n")).alias("x")
    )
    bias = df.select(
        F.col(id_col), F.lit(BIAS_BUCKET).cast("bigint").alias("bucket"), F.lit(1.0).alias("x")
    )
    return feats.unionByName(bias)


def logreg_train(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    ns: tuple[int, ...] = (1, 2),
    hash_fn=F.xxhash64,
    lr: float = 1.0,
    n_iters: int = 8,
    max_broadcast_docs: int = 1_000_000,
) -> DataFrame:
    """Train the classifier; returns the weight frame ``(bucket, w)``
    with ``n_buckets + 1`` rows (dense spine + bias, every bucket
    present so serving needs no driver constants). ``label_col`` must
    be 0/1. Deterministic: full-batch GD, fixed ``lr``/``n_iters``,
    weights start at 0 (so iteration 1's p is exactly 0.5 everywhere
    — the oracle replays from the same closed-form start).

    CONTRACT: the LABELED set is small (quality labels are curated or
    distilled — thousands to low millions), because each iteration
    broadcasts the per-doc residual frame. The guard fails loudly past
    ``max_broadcast_docs`` instead of OOMing; the 100-TB CORPUS only
    ever flows through :func:`logreg_score`, never through training."""
    spark = df.sparkSession
    feats = doc_features(df, text_col, id_col, n_buckets, ns, hash_fn)
    labels = df.select(F.col(id_col), F.col(label_col).cast("double").alias("_y"))
    pairs = (
        feats.join(labels, id_col)
        .select(F.col(id_col).alias("_id"), "bucket", "x", "_y")
        .localCheckpoint()  # eager: per-iteration plans reread this, not the corpus
    )
    n_docs = pairs.select("_id").distinct().count()
    if n_docs > max_broadcast_docs:
        raise ValueError(
            f"logreg_train broadcasts per-doc residuals each iteration; got "
            f"{n_docs} labeled docs > {max_broadcast_docs} — train on a "
            f"labeled subset (labels at that scale are distilled anyway)"
        )
    spine = spark.range(-1, n_buckets).select(F.col("id").alias("bucket"))
    weights = spine.select("bucket", F.lit(0.0).alias("w")).localCheckpoint()
    # NOTE (r8 measurement): batching the localCheckpoint to every 3rd
    # iteration (nested join/agg/broadcast plans between truncations) was
    # tried and measured ~70% SLOWER end-to-end — the nested broadcast
    # chains re-execute more than the saved job scheduling is worth.
    # Keep the per-iteration eager checkpoint.
    for _ in range(int(n_iters)):
        margins = (
            pairs.join(F.broadcast(weights), "bucket")
            .groupBy("_id")
            .agg(
                F.sum(F.col("x") * F.col("w")).alias("_z"),
                F.first("_y").alias("_y"),
            )
            .select(
                "_id", (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_z"))) - F.col("_y")).alias("_r")
            )
        )
        grad = (
            pairs.join(F.broadcast(margins), pairs["_id"] == margins["_id"])
            .groupBy("bucket")
            .agg(F.sum(F.col("x") * F.col("_r")).alias("_g"))
        )
        weights = (
            weights.join(F.broadcast(grad), "bucket", "left")
            .select(
                "bucket",
                (
                    F.col("w")
                    - F.lit(float(lr) / n_docs) * F.coalesce(F.col("_g"), F.lit(0.0))
                ).alias("w"),
            )
            .localCheckpoint()  # eager: O(1) plan depth across iterations
        )
    return weights


def logreg_score(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    ns: tuple[int, ...] = (1, 2),
    hash_fn=F.xxhash64,
) -> DataFrame:
    """Score docs: ``(id_col, n_grams BIGINT, score)`` with score =
    sigmoid(w · x). Feature params must match the fit; a real bucket
    missing from the weight frame fails loudly (dense spine => only a
    fit/serve mismatch can cause it). One scan + broadcast join + one
    per-doc aggregate; gram-less docs score sigmoid(bias)."""
    feats = doc_features(df, text_col, id_col, n_buckets, ns, hash_fn)
    guarded_w = F.when(
        F.col("w").isNull(),
        F.raise_error(
            "logreg_score: feature bucket not covered by the weight frame — "
            "n_buckets/hash_fn must match logreg_train's fit"
        ).cast("double"),
    ).otherwise(F.col("w"))
    return (
        feats.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.when(F.col("bucket") != BIAS_BUCKET, 1)).cast("bigint").alias("n_feats"),
            F.sum(F.col("x") * guarded_w).alias("_z"),
        )
        .select(
            id_col,
            "n_feats",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_z")))).alias("score"),
        )
    )
