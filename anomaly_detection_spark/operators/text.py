"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, fingerprinting.

All pure JVM column expressions (whole-stage codegen; no Python in the
hot path) so they run at 10^12-document scale as single-pass projections
— no shuffle at all until a downstream aggregate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Marker words per language for the n-gram/stopword language-ID
# heuristic. Deterministic; ties resolve in LANGS order.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "que", "los", "una"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "des", "est"],
    "zh": ["de", "shi", "bu", "le", "zai"],
}
LANGS = list(LANG_MARKERS)


def token_count(text: Column | str) -> Column:
    """Whitespace token count; empty/null-safe."""
    t = F.trim(F.col(text) if isinstance(text, str) else text)
    return F.when(t.isNull() | (t == ""), F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("bigint")


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count: splits on word/number/punct boundaries
    (a BPE-like upper bound used for budget estimates)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.when(t.isNull(), F.lit(0)).otherwise(
        F.size(F.regexp_extract_all(t, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))
    ).cast("bigint")


def punct_count(text: Column | str) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    return F.when(t.isNull(), F.lit(0)).otherwise(
        F.size(F.regexp_extract_all(t, F.lit(r"[.,!?;:]"), F.lit(0)))
    ).cast("bigint")


def stopword_count(text: Column | str, stopwords: list[str] | None = None) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    words = stopwords or LANG_MARKERS["en"]
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.when(t.isNull(), F.lit(0)).otherwise(
        F.size(F.regexp_extract_all(t, F.lit(pattern), F.lit(0)))
    ).cast("bigint")


def quality_metrics(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality signals: length, tokens, punct ratio, stopword
    ratio, mean token length — the standard pre-training filters."""
    t = F.col(text_col)
    n_chars = F.coalesce(F.length(t), F.lit(0)).cast("bigint")
    n_tokens = token_count(text_col)
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        punct_count(text_col).alias("n_punct"),
        stopword_count(text_col).alias("n_stopwords"),
        F.round(
            F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(F.lit(0.0)), 4
        ).alias("mean_token_len"),
        F.round(
            F.when(n_chars > 0, punct_count(text_col).cast("double") / n_chars).otherwise(F.lit(0.0)), 6
        ).alias("punct_ratio"),
    )


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Marker-word hit counts per language."""
    t = F.col(text) if isinstance(text, str) else text
    out = {}
    for lang, words in LANG_MARKERS.items():
        pattern = r"\b(" + "|".join(words) + r")\b"
        out[lang] = F.when(t.isNull(), F.lit(0)).otherwise(
            F.size(F.regexp_extract_all(t, F.lit(pattern), F.lit(0)))
        ).cast("bigint")
    return out


def predicted_lang(text: Column | str) -> Column:
    """argmax over marker scores; ties resolve in LANGS order; all-zero
    → 'und' (undetermined). Pure CASE-WHEN chain — identical semantics
    are expressible in ANSI SQL for the oracle twin."""
    scores = lang_scores(text)
    expr = F.lit("und")
    # build reversed so the first language in LANGS wins ties
    for lang in reversed(LANGS):
        cond = scores[lang] > 0
        for other in LANGS:
            if other == lang:
                continue
            if LANGS.index(other) < LANGS.index(lang):
                cond = cond & (scores[lang] > scores[other])  # earlier lang wins ties
            else:
                cond = cond & (scores[lang] >= scores[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lowercased text — the exact-dedup key."""
    t = F.col(text) if isinstance(text, str) else text
    return F.md5(F.lower(F.trim(F.regexp_replace(t, r"\s+", " "))))


def rolling_hash_fingerprint(text: Column | str, window: int = 8) -> Column:
    """Content-defined fingerprint: min of rolling word-window hashes —
    stable under small edits outside the minimal window (winnowing-style).
    JVM-only via higher-order functions."""
    t = F.col(text) if isinstance(text, str) else text
    words = F.split(F.trim(t), r"\s+")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - window, F.lit(0)))
    win_hash = F.transform(
        idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, window)))
    )
    return F.when(t.isNull() | (F.trim(t) == ""), F.lit(None).cast("bigint")).otherwise(
        F.array_min(win_hash)
    )
