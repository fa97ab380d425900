"""Golden tests for span-array invariants — one per violation class,
with exact offending-span-sequence parity (kind, text, media_ref, order).
"""

import pyspark.sql.functions as F
import pytest

from anomaly_detection_spark.operators.spans import (
    RULE_KIND,
    RULE_MONOTONE,
    RULE_PAYLOAD,
    span_violation_indexes,
    span_violations,
)
from tests.conftest import make_docs

T = lambda text, off: ("text", text, None, off)
M = lambda ref, off: ("media", None, ref, off)


def idx_of(spark, rows):
    df = make_docs(spark, rows).select(
        "doc_id", span_violation_indexes("spans").alias("v")
    )
    return {r["doc_id"]: list(r["v"]) for r in df.collect()}


def test_clean_doc_no_violations(spark):
    rows = [("d1", 0, [T("hello", 0), M("asset-1", 16), T("world", 32)])]
    assert idx_of(spark, rows) == {"d1": []}


def test_non_monotone_offset(spark):
    rows = [("d1", 0, [T("a", 0), T("b", 5), T("c", 5)]),  # equal → violation
            ("d2", 0, [T("a", 10), T("b", 3)])]            # decreasing
    assert idx_of(spark, rows) == {"d1": [2], "d2": [1]}


def test_bad_kind(spark):
    rows = [("d1", 0, [T("a", 0), ("video", None, "asset-9", 16)])]
    assert idx_of(spark, rows) == {"d1": [1]}


def test_empty_payloads(spark):
    rows = [
        ("d1", 0, [("text", "", None, 0)]),
        ("d2", 0, [("text", None, None, 0)]),
        ("d3", 0, [("media", None, "", 0)]),
        ("d4", 0, [("media", None, None, 0)]),
        ("d5", 0, [T("x", 0)]),
    ]
    assert idx_of(spark, rows) == {"d1": [0], "d2": [0], "d3": [0], "d4": [0], "d5": []}


def test_violation_rows_exact_span_sequence(spark):
    spans = [T("a", 0), ("badkind", None, None, 16), T("", 32), T("z", 20)]
    rows = [("d1", 3, spans)]
    out = span_violations(make_docs(spark, rows)).collect()
    by_rule = {r["rule_id"]: r for r in out}
    assert set(by_rule) == {RULE_KIND, RULE_PAYLOAD, RULE_MONOTONE}
    assert [tuple(s) for s in by_rule[RULE_KIND]["offending_spans"]] == [("badkind", None, None, 16)]
    assert [tuple(s) for s in by_rule[RULE_PAYLOAD]["offending_spans"]] == [("text", "", None, 32)]
    # offset 20 < 32 → monotone violation at index 3, in document order
    assert [tuple(s) for s in by_rule[RULE_MONOTONE]["offending_spans"]] == [("text", "z", None, 20)]
    assert all(r["partition_id"] == 3 and r["doc_id"] == "d1" for r in out)


def test_pandas_udf_agrees_with_jvm_exprs(spark):
    from anomaly_detection_spark.sources.synthetic import documents_interleaved

    docs = documents_interleaved(spark, 2000, n_partitions=4, seed=42)
    jvm = span_violations(docs, use_pandas_udf=False)
    pdu = span_violations(docs, use_pandas_udf=True)
    a = {(r["doc_id"], r["rule_id"]) for r in jvm.collect()}
    b = {(r["doc_id"], r["rule_id"]) for r in pdu.collect()}
    assert a == b and len(a) > 0


def test_clean_synthetic_data_has_zero_violations(spark):
    from anomaly_detection_spark.sources.synthetic import documents_interleaved

    docs = documents_interleaved(spark, 3000, n_partitions=4, seed=7, plant_violations=False)
    assert span_violations(docs).count() == 0


# ---------------------------------------------------------------- property


def _expected_violations(docs):
    """Plain-Python reference model of the span invariants — independent
    of both Spark implementations."""
    out = {}
    for i, spans in enumerate(docs):
        per_rule = {"spans.valid_kind": [], "spans.payload_presence": [], "spans.monotone_offset": []}
        prev_off = None
        for j, s in enumerate(spans):
            k = s["kind"]
            if k is None or k not in ("text", "media"):
                per_rule["spans.valid_kind"].append(j)
            if k == "text" and (s["text"] is None or s["text"] == ""):
                per_rule["spans.payload_presence"].append(j)
            if k == "media" and (s["media_ref"] is None or s["media_ref"] == ""):
                per_rule["spans.payload_presence"].append(j)
            if j > 0 and (
                s["offset"] is None or (prev_off is not None and s["offset"] <= prev_off)
            ):
                per_rule["spans.monotone_offset"].append(j)
            prev_off = s["offset"]
        for rule, idxs in per_rule.items():
            if idxs:
                out[(str(i), rule)] = [
                    (spans[j]["kind"], spans[j]["text"], spans[j]["media_ref"], spans[j]["offset"])
                    for j in idxs
                ]
    return out


def test_span_violations_property_vs_python_model(spark):
    """Property (hypothesis): for ARBITRARY span arrays — junk kinds,
    null/empty payloads, null/decreasing offsets, empty docs — the JVM
    expression path and the Arrow pandas-UDF path both agree exactly
    with an independent Python model (gate completeness included: no
    violating doc may be lost by the exists() pre-filter)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    span_st = st.fixed_dictionaries(
        {
            "kind": st.sampled_from(["text", "media", "junk", None]),
            "text": st.sampled_from([None, "", "hello world"]),
            "media_ref": st.sampled_from([None, "", "asset-1"]),
            "offset": st.one_of(st.none(), st.integers(-100, 100)),
        }
    )
    doc_st = st.lists(span_st, min_size=0, max_size=6)

    @settings(max_examples=5, deadline=None)
    @given(st.lists(doc_st, min_size=1, max_size=25))
    def run(docs):
        from tests.conftest import DOC_SCHEMA

        rows = [(str(i), 0, [tuple(s.values()) for s in d]) for i, d in enumerate(docs)]
        df = spark.createDataFrame(rows, DOC_SCHEMA)
        want = _expected_violations(docs)
        for use_udf in (False, True):
            got = {
                (r["doc_id"], r["rule_id"]): [tuple(s) for s in r["offending_spans"]]
                for r in span_violations(df, use_pandas_udf=use_udf).collect()
            }
            assert got == want, f"use_pandas_udf={use_udf}"

    run()
