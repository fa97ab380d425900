"""Corpus curation: compose the individual text-quality signals into
one keep/drop decision per document with machine-readable reasons —
the end-to-end cleaning pass a pre-training pipeline runs before
tokenization.

One call produces, per document: the quality/repetition/language
signals (each computed by the already-oracle-checked operator it
composes), exact-duplicate status (keep the smallest id per
fingerprint), optional benchmark contamination, a sorted
``reasons`` string (empty == keep) and the ``keep`` flag.

Shape at scale: three to five per-doc signal frames, each one
scan-plus-aggregate over the corpus, joined back on the document id —
plain shuffle equi-joins that AQE handles at any corpus size; no
per-row Python anywhere (every signal is JVM column expressions or the
composed operators' own hardened plans). The output is a drop-in
filter: ``curation_flags(...).filter("keep")`` is the curated corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .decontam import ngram_overlap
from .text import fingerprint, predicted_lang, repetition_metrics, token_count

__all__ = ["curation_flags"]

# fixed flag order — reasons strings are comparable across engines
_FLAGS = ("too_short", "too_long", "bad_lang", "repetitive", "duplicate", "contaminated")


def curation_flags(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    allowed_langs: tuple[str, ...] = ("en", "es", "de", "fr", "zh"),
    max_top_word_frac_e6: int = 200_000,
    max_dup_3gram_frac_e6: int = 300_000,
    decontam_k: int = 13,
    hash_fn=F.xxhash64,
    token_count_expr=None,
) -> DataFrame:
    """Per-document curation verdict:
    ``(id_col, n_tokens, plang, top_word_frac_e6, dup_3gram_frac_e6,
    is_duplicate, contaminated, reasons, keep)``.

    Flags (each threshold a parameter; reasons list them in the fixed
    ``_FLAGS`` order, comma-joined):

    - ``too_short`` / ``too_long``: whitespace token count outside
      [min_tokens, max_tokens];
    - ``bad_lang``: marker-word language id not in ``allowed_langs``;
    - ``repetitive``: Gopher-style top-word or duplicated-3-gram
      fraction above its cap;
    - ``duplicate``: exact duplicate by normalized-md5 fingerprint —
      only the smallest id per fingerprint survives;
    - ``contaminated``: shares a word ``decontam_k``-gram with
      ``benchmark`` (omit benchmark to skip decontamination).

    ``token_count_expr`` overrides the length signal (default:
    whitespace ``token_count`` over ``text_col``) — pass e.g.
    ``bpe.bpe_token_count(text_col, merges)`` so the too_short /
    too_long thresholds mean real tokenizer tokens; any bigint
    expression over the input frame's columns works.
    """
    tok = token_count(text_col) if token_count_expr is None else token_count_expr
    sig = docs.select(
        F.col(id_col).alias("_id"),
        tok.cast("bigint").alias("n_tokens"),
        predicted_lang(text_col).alias("plang"),
        # NULL text would make the fingerprint NULL and the inner
        # fp_min equi-join would silently DROP the document from the
        # verdict frame; give each null-text doc a unique sentinel so
        # it flows through (flagged too_short, never a duplicate).
        F.coalesce(
            fingerprint(text_col),
            F.concat(F.lit("∅:"), F.col(id_col).cast("string")),
        ).alias("_fp"),
    )
    rep = repetition_metrics(docs, text_col=text_col, id_col=id_col).select(
        F.col(id_col).alias("_id"), "top_word_frac_e6", "dup_3gram_frac_e6"
    )
    # exact-dup survivorship: smallest id per fingerprint wins (the
    # same min-representative convention as duplicate_clusters)
    fp_min = sig.groupBy("_fp").agg(F.min("_id").alias("_keep_id"))
    base = (
        sig.join(fp_min, "_fp")
        .select("_id", "n_tokens", "plang", (F.col("_id") != F.col("_keep_id")).alias("is_duplicate"))
        .join(rep, "_id")
    )
    if benchmark is not None:
        dec = ngram_overlap(
            docs, benchmark, k=decontam_k, id_col=id_col, text_col=text_col,
            bench_text_col=text_col, hash_fn=hash_fn,
        ).select(F.col(id_col).alias("_id"), "contaminated")
        base = base.join(dec, "_id")
    else:
        base = base.withColumn("contaminated", F.lit(False))

    checks = {
        "too_short": F.col("n_tokens") < min_tokens,
        "too_long": F.col("n_tokens") > max_tokens,
        "bad_lang": ~F.col("plang").isin(*allowed_langs),
        "repetitive": (F.col("top_word_frac_e6") > max_top_word_frac_e6)
        | (F.col("dup_3gram_frac_e6") > max_dup_3gram_frac_e6),
        "duplicate": F.col("is_duplicate"),
        "contaminated": F.col("contaminated"),
    }
    reasons = F.concat_ws(
        ",", *[F.when(checks[name], F.lit(name)) for name in _FLAGS]
    )
    return base.select(
        F.col("_id").alias(id_col),
        "n_tokens",
        "plang",
        "top_word_frac_e6",
        "dup_3gram_frac_e6",
        "is_duplicate",
        "contaminated",
        reasons.alias("reasons"),
        (reasons == "").alias("keep"),
    )
