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


def repetition_metrics(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style within-document repetition signals — the standard
    "remove degenerate repetitive documents" pre-training filters
    (Rae et al. 2021 §A1.3, re-expressed over whitespace words):

    - ``top_word_frac_e6``: occurrences of the most frequent word /
      total words;
    - ``top_2gram_frac_e6``: fraction of (normalized) characters
      contained in occurrences of the most frequent word 2-gram;
    - ``dup_3gram_frac_e6``: fraction of characters contained in word
      3-grams that occur more than once (all occurrences counted;
      overlaps can push the raw ratio past 1 — emitted uncapped,
      documented).

    All fractions are ``floor(x * 1e6)`` BIGINTs over the normalized
    text (``lower(trim(text))``), so a DuckDB twin reproduces them
    bit-exactly. Ties for "most frequent 2-gram" resolve to the
    largest char mass (count then gram length — see the packed-argmax
    note below), same rule both engines.

    ONE scan, one explode, two hash aggregates: the 1/2/3-gram streams
    are tagged and stacked into a single explode so the text is read
    and tokenized once; per-(doc, n, gram) counts partial-aggregate
    map-side before the shuffle. No Python, no window — scales as a
    plain aggregate at 10^12 docs."""
    t = F.lower(F.trim(F.col(text_col)))
    n_chars = F.when(t.isNull(), F.lit(0)).otherwise(F.length(t)).cast("bigint")
    empty = F.array().cast("array<string>")

    def grams(n: int) -> Column:
        from .dedup import word_shingles

        # strict n-gram contract: a doc with fewer than n words has NO
        # n-grams (word_shingles' whole-text fallback would otherwise
        # report a single-word doc as 100% dominated by its phantom
        # "top 2-gram" and diverge from the oracle's gram series)
        arr = word_shingles(text_col, n, distinct=False)
        n_words = F.size(F.split(t, r"\s+"))
        return F.when(t.isNull() | (t == "") | (n_words < n), empty).otherwise(arr)

    def tag(n: int) -> Column:
        return F.transform(grams(n), lambda g: F.struct(F.lit(n).alias("n"), g.alias("g")))

    # TWO selects: computing the char count in the SAME projection as
    # the explode would re-run lower(trim(text))+length once per
    # exploded gram row — O(text · grams) per doc (the ivf_train r8
    # lesson: non-generator expressions sharing a select with a
    # generator are evaluated per OUTPUT row, not per input row).
    pre = df.select(
        F.col(id_col).alias("_id"),
        n_chars.alias("_nc"),
        F.concat(tag(1), tag(2), tag(3)).alias("_tagged"),
    )
    stacked = pre.select(
        "_id",
        "_nc",
        # explode_outer: a blank doc has zero grams but must still come
        # back (with all-zero metrics), not silently drop out.
        F.explode_outer("_tagged").alias("_s"),
    )
    counts = stacked.groupBy(
        "_id", "_nc", F.col("_s.n").alias("_n"), F.col("_s.g").alias("_g")
    ).agg(F.count(F.lit(1)).alias("_cnt"))
    # The "top gram" fold carries NO string state: every aggregation
    # buffer must be a mutable primitive for HashAggregateExec (a
    # string or struct max falls back to SortAggregate — per-partition
    # sort + an extra exchange). The 2-gram argmax therefore packs
    # (cnt, gram char length) into one BIGINT, cnt * 2^20 + min(len,
    # 2^20 - 1): max == highest count, ties resolved to the LARGEST
    # char mass (the conservative choice for a repetition filter).
    # Grams past 2^20-1 chars saturate the length field (documented
    # bound; a million-char 2-gram is already degenerate input).
    _LEN_BITS = 1 << 20
    packed = F.col("_cnt") * _LEN_BITS + F.least(F.length("_g"), F.lit(_LEN_BITS - 1))

    wide = counts.groupBy("_id", "_nc").agg(
        F.coalesce(F.sum(F.when(F.col("_n") == 1, F.col("_cnt"))), F.lit(0))
        .cast("bigint")
        .alias("n_tokens"),
        F.coalesce(F.max(F.when(F.col("_n") == 1, F.col("_cnt"))), F.lit(0))
        .cast("bigint")
        .alias("top_word_cnt"),
        F.coalesce(F.max(F.when(F.col("_n") == 2, packed)), F.lit(0)).alias("_top2"),
        F.coalesce(
            F.sum(
                F.when((F.col("_n") == 3) & (F.col("_cnt") >= 2), F.col("_cnt") * F.length("_g"))
            ),
            F.lit(0),
        ).alias("_dup3ch"),
    ).withColumns(
        {
            # exact integer decode (shift, not double division — packed
            # values can exceed 2^53 for billion-occurrence grams)
            "top_2gram_cnt": F.shiftright(F.col("_top2"), 20).cast("bigint"),
            "_top2ch": F.shiftright(F.col("_top2"), 20) * (F.col("_top2") % _LEN_BITS),
        }
    )
    frac = lambda num, den: (  # noqa: E731 — local formula alias
        F.when(den > 0, F.floor(num * 1000000 / den)).otherwise(F.lit(0)).cast("bigint")
    )
    return wide.select(
        F.col("_id").alias(id_col),
        "n_tokens",
        "top_word_cnt",
        "top_2gram_cnt",
        frac(F.col("top_word_cnt"), F.col("n_tokens")).alias("top_word_frac_e6"),
        frac(F.col("_top2ch"), F.col("_nc")).alias("top_2gram_frac_e6"),
        frac(F.col("_dup3ch"), F.col("_nc")).alias("dup_3gram_frac_e6"),
    )


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
