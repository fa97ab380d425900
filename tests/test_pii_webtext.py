"""Unit tests for the scrub-stage operators: PII detection/redaction
(operators/pii.py) and web-text normalization + URL extraction
(operators/webtext.py).

The cross-engine (Java-regex vs RE2) byte-parity of both is pinned by
the pii_redaction_documents / webtext_cleanup_documents gate oracles;
these tests pin the Python-visible contracts: match boundaries on
crafted strings, decoy rejection, null/empty safety, idempotence, and
the plan staying a single shuffle-free projection.
"""

import pyspark.sql.functions as F

from anomaly_detection_spark.operators.pii import (
    PII_PATTERNS,
    pii_audit,
    pii_counts,
    redact_pii,
)
from anomaly_detection_spark.operators.webtext import (
    cleanup_metrics,
    domain_counts,
    extract_urls,
    normalize_text,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


PII_TEXT = (
    "mail a.b+c@x-y.co.uk and d@e.org ssn 123-45-6789 "
    "card 4000 1234 5678 9010 ip 10.0.255.254 call 212-555-0142 "
    "decoys: at @ ten 12.5 12-34 999-99-99 1234-5678"
)


def test_pii_counts_and_decoys(spark):
    row = pii_counts(_docs(spark, [PII_TEXT, None, ""])).orderBy("doc_id").collect()
    assert row[0].asDict() == {
        "doc_id": 0,
        "n_email": 2,
        "n_ssn": 1,
        "n_card": 1,
        "n_ipv4": 1,
        "n_phone": 1,
        "n_pii": 6,
    }
    # null and empty text: all-zero counts, rows never drop out
    for r in row[1:]:
        assert [r[c] for c in r.asDict() if c.startswith("n_")] == [0] * 6


def test_redact_replaces_every_category_and_keeps_rest(spark):
    red = redact_pii(_docs(spark, [PII_TEXT])).collect()[0].text
    assert red == (
        "mail <EMAIL> and <EMAIL> ssn <SSN> "
        "card <CARD> ip <IPV4> call <PHONE> "
        "decoys: at @ ten 12.5 12-34 999-99-99 1234-5678"
    )


def test_redact_null_safe_idempotent_out_col(spark):
    df = redact_pii(_docs(spark, [None, "x@y.ab z"]), out_col="red")
    rows = {r.doc_id: r for r in df.collect()}
    assert rows[0].red is None and rows[0].text is None
    assert rows[1].red == "<EMAIL> z" and rows[1].text == "x@y.ab z"
    # placeholders contain no digits/@: redacting twice is a no-op
    twice = redact_pii(redact_pii(_docs(spark, [PII_TEXT]))).collect()[0].text
    assert twice == redact_pii(_docs(spark, [PII_TEXT])).collect()[0].text


def test_pii_boundaries_reject_embedded_digits(spark):
    # longer digit runs around a would-be match break \b: no hits
    row = pii_counts(
        _docs(spark, ["9123-45-6789 123-45-67890 1212-555-0142x no"])
    ).collect()[0]
    assert row.n_pii == 0


def test_pii_audit_matches_counts_plus_redaction(spark):
    """The single-pass audit projection must agree with the two
    standalone projections column-for-column."""
    df = _docs(spark, [PII_TEXT, None, "clean text"])
    audit = {r.doc_id: r for r in pii_audit(df).collect()}
    counts = {r.doc_id: r for r in pii_counts(df).collect()}
    red = {r.doc_id: r for r in redact_pii(df).collect()}
    for i in audit:
        assert audit[i].redacted_text == red[i].text
        for c in counts[i].asDict():
            assert audit[i][c] == counts[i][c]


def test_patterns_are_ordered_and_redaction_order_stable():
    assert list(PII_PATTERNS) == ["email", "ssn", "card", "ipv4", "phone"]


def test_counts_reconcile_with_placeholders_on_overlap(spark):
    """Sequential semantics: an SSN/IP-shaped string inside an email's
    local part is part of that email — counted once as email, never as
    a second SSN/IPv4 hit the redaction would not replace."""
    t = "mail 123-45-6789@x.co and ping 1.2.3.4@corp.com"
    row = pii_audit(_docs(spark, [t])).collect()[0]
    assert row.redacted_text == "mail <EMAIL> and ping <EMAIL>"
    assert (row.n_email, row.n_ssn, row.n_ipv4, row.n_pii) == (2, 0, 0, 2)
    # n_<cat> == placeholder occurrences, for every category
    for cat in PII_PATTERNS:
        assert row[f"n_{cat}"] == row.redacted_text.count(f"<{cat.upper()}>")


DIRTY = "“Hi” it’s \x07x a – b — c wait…  two"


def test_normalize_text_canonicalizes_and_is_idempotent(spark):
    once = normalize_text(_docs(spark, [DIRTY, None, "  plain  "])).collect()
    assert once[0].text == "\"Hi\" it's x a - b - c wait... two"
    assert once[1].text is None
    assert once[2].text == "plain"
    again = normalize_text(_docs(spark, [once[0].text])).collect()[0].text
    assert again == once[0].text


def test_cleanup_metrics_counts_and_domains(spark):
    t = DIRTY + " see https://b.example.org/p/1 then http://a.example.net and https://b.example.org"
    m = cleanup_metrics(_docs(spark, [t, None])).orderBy("doc_id").collect()
    assert m[0].n_ctrl == 1
    # “ ” NBSP ’ – — … = 7 canonicalized codepoints
    assert m[0].n_upunct == 7
    assert m[0].n_urls == 3
    assert m[0].domains == ["a.example.net", "b.example.org"]  # sorted distinct
    assert m[0].n_chars_raw == len(t)  # BMP-only: UTF-16 units == codepoints
    assert m[0].clean_text.startswith('"Hi" it\'s x')
    assert m[1].asDict() == {
        "doc_id": 1,
        "n_chars_raw": 0,
        "n_chars_clean": 0,
        "n_ctrl": 0,
        "n_upunct": 0,
        "n_urls": 0,
        "domains": [],
        "clean_text": None,
    }


def test_zero_width_chars_deleted_not_spaced(spark):
    """ZWSP/ZWNJ/ZWJ/BOM carry no width: deleting them must NOT invent
    word boundaries ('data\\u200bbase' is ONE word)."""
    out = normalize_text(
        _docs(spark, ["data​base", "a‌‍b", "﻿bom start"])
    ).collect()
    assert [r.text for r in sorted(out, key=lambda r: r.doc_id)] == [
        "database",
        "ab",
        "bom start",
    ]


def test_urls_split_on_unicode_spaces(spark):
    """Two URLs separated by an NBSP (ordinary scraped text) must stay
    two matches — and n_urls must agree with the domains column."""
    m = cleanup_metrics(
        _docs(spark, ["see https://a.io/x https://b.io　end"])
    ).collect()[0]
    assert m.n_urls == 2
    assert m.domains == ["a.io", "b.io"]


def test_extract_urls_keeps_order_and_path(spark):
    urls = _docs(spark, ["x https://h.io/a/b?q=1 y http://h.io z"]).select(
        extract_urls("text").alias("u")
    ).collect()[0].u
    assert urls == ["https://h.io/a/b?q=1", "http://h.io"]


def test_blocklist_suffix_matching_counts_and_filter(spark):
    """A blocklist entry bans the host and every subdomain — but NOT
    hosts that merely embed it as a prefix ('bad.com.evil.io' is an
    evil.io subdomain, not a bad.com one). Docs without URLs survive
    with zeros; the filter drops exactly the flagged docs."""
    from anomaly_detection_spark.operators.webtext import blocklist_filter, blocklist_hits

    texts = [
        "see https://ads.bad.com/x and https://ok.org",   # subdomain -> blocked
        "link https://bad.com.evil.io/y",                 # NOT a bad.com suffix
        "https://bad.com/page then https://bad.com/other",  # dup URLs, one domain
        "no urls here",
        None,
    ]
    docs = _docs(spark, texts)
    bl = spark.createDataFrame([("bad.com",)], "domain string")
    hits = {r.doc_id: r for r in blocklist_hits(docs, bl).collect()}
    assert (hits[0].n_urls, hits[0].n_blocked_domains, hits[0].blocked) == (2, 1, True)
    assert (hits[1].n_urls, hits[1].blocked) == (1, False)
    assert (hits[2].n_urls, hits[2].n_blocked_domains, hits[2].blocked) == (2, 1, True)
    for i in (3, 4):
        assert (hits[i].n_urls, hits[i].n_blocked_domains, hits[i].blocked) == (0, 0, False)
    kept = sorted(r.doc_id for r in blocklist_filter(docs, bl).collect())
    assert kept == [1, 3, 4]


def test_domain_counts_aggregates_docs_vs_urls(spark):
    df = _docs(
        spark,
        [
            "https://a.io/1 https://a.io/2",
            "see https://a.io and https://b.io",
            "none",
        ],
    )
    got = {r.domain: (r.n_docs, r.n_urls) for r in domain_counts(df).collect()}
    assert got == {"a.io": (2, 3), "b.io": (1, 1)}


def test_scrub_ops_are_single_projection_no_shuffle(spark):
    """Both scrub passes must stay scan-speed: one projection, zero
    exchanges — at 10^12 docs any shuffle here dominates the pipeline."""
    df = _docs(spark, ["x"])
    for frame in (
        pii_audit(df),
        cleanup_metrics(df),
    ):
        plan = frame._sc._jvm.PythonSQLUtils.explainString(
            frame._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan, plan


def test_scrub_projections_compose_with_streaming(spark, tmp_path):
    """The scrub pass is stateless (pure projections), so the SAME
    operator calls must run unchanged on a readStream frame — the
    streaming-ingest shape of a 100-TB curation pipeline (normalize +
    redact per micro-batch, no state store)."""
    src, out = str(tmp_path / "src"), []
    _docs(
        spark,
        ["it’s 212-555-0142 see https://t.ads.net/x", None],
    ).write.parquet(src)
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    cleaned = redact_pii(normalize_text(stream))

    def sink(batch, _bid):
        out.extend((r.doc_id, r.text) for r in batch.collect())

    q = cleaned.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(120)
    got = dict(out)
    assert got[0] == "it's <PHONE> see https://t.ads.net/x"
    assert got[1] is None
