"""PII detection and redaction for training-data curation.

The standard "scrub personally identifiable information before
pre-training" pass (cf. Dolma / BigScience data tooling): detect and
mask emails, SSN-style ids, payment-card numbers, IPv4 addresses and
phone numbers with deterministic regex rules.

All pure JVM column expressions (``regexp_extract_all`` /
``regexp_replace`` inside whole-stage codegen; no Python in the hot
path), so detection+redaction is a single-pass projection with zero
shuffle — it runs at 10^12-document scale at scan speed and composes
with :mod:`.curation` like any other per-doc signal.

Pattern notes (deliberately in the Java-regex ∩ RE2 common subset so a
DuckDB oracle reproduces every match byte-for-byte): no lookaround, no
backreferences, ASCII classes only, ``\\b`` word boundaries. The rules
are intentionally simple/auditable — recall-oriented scrubbing, not a
validator (e.g. ``999.999.999.999`` WOULD match the IPv4 rule; real
corpora are scrubbed conservatively).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Ordered: redaction applies top-to-bottom. Order matters only across
# overlapping alphabets; the digit rules are mutually exclusive by
# group shape (3-2-4 SSN / 4-4-4-4 card / octets ≤3 digits / 3-3-4
# phone) and placeholders contain no digits, so the composition is
# confluent — but the order is still fixed and documented for
# cross-engine determinism.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "card": r"\b[0-9]{4}([- ][0-9]{4}){3}\b",
    "ipv4": r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b",
    "phone": r"\b[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}\b",
}


def pii_count(text: Column | str, pattern: str) -> Column:
    """Occurrences of one PII pattern; null/empty-safe (0)."""
    t = F.col(text) if isinstance(text, str) else text
    return (
        F.when(t.isNull(), F.lit(0))
        .otherwise(F.size(F.regexp_extract_all(t, F.lit(pattern), F.lit(0))))
        .cast("bigint")
    )


def _count_cols(
    text_col: str, pats: dict[str, str], placeholder_fmt: str = "<{}>"
) -> tuple[list[Column], Column, Column]:
    """Shared count/redact fold: SEQUENTIAL semantics — each category
    is counted on the text as already redacted by the categories before
    it, so ``n_<cat>`` is exactly the number of ``<CAT>`` placeholders
    the redaction inserts (an SSN-shaped string inside an email's local
    part counts as part of that email, not as a second SSN hit).
    Returns (count columns, total, redacted text)."""
    t: Column | str = text_col
    cols: list[Column] = []
    total = F.lit(0).cast("bigint")
    for name, pat in pats.items():
        c = pii_count(t, pat)
        cols.append(c.alias(f"n_{name}"))
        total = total + c
        t = F.regexp_replace(
            F.col(t) if isinstance(t, str) else t, pat, placeholder_fmt.format(name.upper())
        )
    return cols, total.alias("n_pii"), t


def pii_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Per-doc PII hit counts per category plus the total.

    One projection, no shuffle: ``n_<category>`` BIGINT per pattern and
    ``n_pii`` = their sum. Counts carry redaction semantics (see
    :func:`_count_cols`): ``n_<cat>`` == placeholders :func:`redact_pii`
    would insert for that category.
    """
    cols, total, _ = _count_cols(text_col, patterns or PII_PATTERNS)
    return df.select(F.col(id_col), *cols, total)


def pii_audit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Counts AND redacted text in ONE projection (one scan, zero
    shuffle) — the shape a scrub pipeline actually wants; joining
    :func:`pii_counts` with :func:`redact_pii` would re-scan and
    shuffle for nothing. Counts reconcile exactly with the emitted
    placeholders (sequential semantics, see :func:`_count_cols`)."""
    cols, total, red = _count_cols(text_col, patterns or PII_PATTERNS)
    return df.select(F.col(id_col), *cols, total, red.alias("redacted_text"))


def redact_pii_expr(
    text: Column | str,
    patterns: dict[str, str] | None = None,
    placeholder_fmt: str = "<{}>",
) -> Column:
    """The redacted text as a column expression: each category's
    matches replaced by its placeholder (``<EMAIL>``, ``<SSN>``, …),
    applied in ``patterns`` order. NULL text stays NULL."""
    t = F.col(text) if isinstance(text, str) else text
    for name, pat in (patterns or PII_PATTERNS).items():
        t = F.regexp_replace(t, pat, placeholder_fmt.format(name.upper()))
    return t


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    placeholder_fmt: str = "<{}>",
    out_col: str | None = None,
) -> DataFrame:
    """Replace (or add, via ``out_col``) the text column with its
    redacted form. Pure projection — composes with any downstream
    filter/dedup stage at scan speed."""
    return df.withColumn(
        out_col or text_col, redact_pii_expr(text_col, patterns, placeholder_fmt)
    )
