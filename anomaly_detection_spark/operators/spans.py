"""Per-row span-array invariants over interleaved text+media documents.

Invariants (BASELINE.json input_hint):
  - monotone: offsets strictly increasing within a doc
  - kind:     kind ∈ {text, media}
  - payload:  kind=text  => non-empty text
              kind=media => non-empty media_ref

Two interchangeable implementations, asserted equal in tests:

1. ``span_violation_indexes`` — pure JVM higher-order functions
   (``F.filter`` over an index sequence). This is the default hot path:
   it stays inside whole-stage codegen, no Python round-trip at all.
2. ``violating_indexes_pandas_udf`` — a vectorized Arrow/pandas UDF
   (one call per Arrow batch, never per row) as mandated by the
   input_hint's API surface; useful when invariants grow beyond what
   SQL expressions can state.

Violation rows are materialized LAZILY: docs are filtered on
``size(indexes) > 0`` first, and only survivors get their offending
span subsequence built (SURVEY.md §7 stage 2) — at 10^12 docs with
plant rates ~0.2% this touches ~0.5% of rows past the filter.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType

VALID_KINDS = ("text", "media")

RULE_MONOTONE = "spans.monotone_offset"
RULE_KIND = "spans.valid_kind"
RULE_PAYLOAD = "spans.payload_presence"


def _is_blank(c: Column) -> Column:
    return c.isNull() | (c == "")


def _span_bad(span: Column, prev: Column) -> Column:
    """True iff this span violates any invariant (prev = preceding span
    or null for the first)."""
    bad_kind = span["kind"].isNull() | ~span["kind"].isin(*VALID_KINDS)
    bad_payload = ((span["kind"] == "text") & _is_blank(span["text"])) | (
        (span["kind"] == "media") & _is_blank(span["media_ref"])
    )
    bad_mono = F.when(prev.isNull(), F.lit(False)).otherwise(
        span["offset"].isNull() | (span["offset"] <= prev["offset"])
    )
    return bad_kind | bad_payload | bad_mono


def span_violation_indexes(spans: Column | str) -> Column:
    """array<int> of violating span positions (0-based), JVM-only."""
    spans = F.col(spans) if isinstance(spans, str) else spans

    def bad_at(j: Column) -> Column:
        span = F.element_at(spans, j + 1)
        prev = F.when(j > 0, F.element_at(spans, j)).otherwise(F.lit(None))
        return _span_bad(span, prev)

    idx = F.sequence(F.lit(0), F.size(spans) - 1)
    return F.when(F.size(spans) > 0, F.filter(idx, bad_at)).otherwise(F.array().cast("array<int>"))


def _per_rule_indexes(spans: Column, rule: str) -> Column:
    def bad_at(j: Column) -> Column:
        span = F.element_at(spans, j + 1)
        if rule == RULE_KIND:
            return span["kind"].isNull() | ~span["kind"].isin(*VALID_KINDS)
        if rule == RULE_PAYLOAD:
            return ((span["kind"] == "text") & _is_blank(span["text"])) | (
                (span["kind"] == "media") & _is_blank(span["media_ref"])
            )
        prev = F.when(j > 0, F.element_at(spans, j)).otherwise(F.lit(None))
        return F.when(prev.isNull(), F.lit(False)).otherwise(
            span["offset"].isNull() | (span["offset"] <= prev["offset"])
        )

    idx = F.sequence(F.lit(0), F.size(spans) - 1)
    return F.when(F.size(spans) > 0, F.filter(idx, bad_at)).otherwise(F.array().cast("array<int>"))


@pandas_udf(ArrayType(IntegerType()))
def violating_indexes_pandas_udf(spans: pd.Series) -> pd.Series:
    """Arrow-vectorized twin of :func:`span_violation_indexes` — one
    invocation per Arrow record batch."""
    out = []
    for arr in spans:
        if arr is None:
            out.append([])
            continue
        bad: list[int] = []
        prev_off = None
        for j, s in enumerate(arr):
            kind = s["kind"]
            is_bad = kind is None or kind not in VALID_KINDS
            if not is_bad:
                if kind == "text" and (s["text"] is None or s["text"] == ""):
                    is_bad = True
                elif kind == "media" and (s["media_ref"] is None or s["media_ref"] == ""):
                    is_bad = True
            off = s["offset"]
            if not is_bad and j > 0 and (off is None or (prev_off is not None and off <= prev_off)):
                is_bad = True
            if is_bad:
                bad.append(j)
            prev_off = off
        out.append(bad)
    return pd.Series(out)


def any_span_violation(spans: Column | str) -> Column:
    """Boolean gate: does ANY span violate ANY invariant? Uses
    ``exists`` (short-circuiting) over the array directly — cheaper
    than materializing a violating-index array for every document when
    violations are rare (~0.5% of docs at the planted rates)."""
    spans = F.col(spans) if isinstance(spans, str) else spans
    bad_item = F.exists(
        spans,
        lambda s: s["kind"].isNull()
        | ~s["kind"].isin(*VALID_KINDS)
        | ((s["kind"] == "text") & _is_blank(s["text"]))
        | ((s["kind"] == "media") & _is_blank(s["media_ref"])),
    )
    mono = F.exists(
        F.zip_with(
            F.slice(spans, 1, F.size(spans) - 1),
            F.slice(spans, 2, F.size(spans) - 1),
            lambda a, b: b["offset"].isNull() | (b["offset"] <= a["offset"]),
        ),
        lambda x: x,
    )
    return bad_item | F.when(F.size(spans) > 1, mono).otherwise(F.lit(False))


def span_violations(
    documents: DataFrame,
    use_pandas_udf: bool = False,
    passthrough: tuple[str, ...] = ("partition_id",),
) -> DataFrame:
    """Violation rows (doc_id, *passthrough, rule_id, offending_spans),
    one row per (doc, violated rule), offending spans in document order.

    Lazy materialization: the full-table pass is only the boolean
    ``exists`` gate; per-rule index arrays and offending-span
    subsequences are built for the surviving ~0.5% of docs."""
    if use_pandas_udf:
        flagged = documents.withColumn("_viol", violating_indexes_pandas_udf("spans"))
        flagged = flagged.filter(F.size("_viol") > 0)
        # pandas path flags combined; split per rule with the JVM exprs
        # (cheap: only violating docs reach here).
    else:
        flagged = documents.filter(any_span_violation("spans"))

    rules = []
    for rule in (RULE_MONOTONE, RULE_KIND, RULE_PAYLOAD):
        idxs = _per_rule_indexes(F.col("spans"), rule)
        rules.append(
            F.struct(
                F.lit(rule).alias("rule_id"),
                F.transform(idxs, lambda j: F.element_at(F.col("spans"), j + 1)).alias(
                    "offending_spans"
                ),
            )
        )
    return (
        flagged.select(
            "doc_id", *passthrough, F.explode(F.array(*rules)).alias("r")
        )
        .filter(F.size("r.offending_spans") > 0)
        .select(
            "doc_id",
            *passthrough,
            F.col("r.rule_id").alias("rule_id"),
            F.col("r.offending_spans").alias("offending_spans"),
        )
    )
