"""Unit + decisiveness tests for DSIR importance weighting
(operators/dsir.py). The sf-scale value check is the
dsir_weights_documents gate oracle; here: hand-computed feature
extraction (strict gram contract), ratio-sign sanity, the house
null/blank edge contract, serve-plan shape, and the floor-boundary /
keep-threshold decisiveness pins for the transcendental gate columns
(the ulp rule)."""

import hashlib
import math
import re

import pyspark.sql.functions as F
import pytest

from anomaly_detection_spark.operators.dedup import portable_hash60
from anomaly_detection_spark.operators.dsir import (
    dsir_keep,
    dsir_log_ratios,
    dsir_weights,
    hashed_gram_buckets,
)

DOCS = "doc_id bigint, text string"
B = 64


def _docs(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], DOCS)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _grams(text, ns=(1, 2)):
    """Pure-Python twin of the strict gram contract: no grams for
    blank/NULL or sub-k-word docs, positional multiplicity."""
    if text is None or not text.strip():
        return []
    ws = re.split(r"\s+", text.strip().lower())
    out = []
    for k in ns:
        if len(ws) >= k:
            out += [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]
    return out


def test_hashed_gram_buckets_match_python_replay(spark):
    texts = ["a b a", "single", None, "  ", "x y z w"]
    got = {}
    rows = hashed_gram_buckets(
        _docs(spark, texts), n_buckets=B, hash_fn=portable_hash60
    ).collect()
    for r in rows:
        got[(r.doc_id, r.bucket)] = r.cnt
    want = {}
    for i, t in enumerate(texts):
        for g in _grams(t):
            key = (i, _h60(g) % B)
            want[key] = want.get(key, 0) + 1
    assert got == want
    # the strict contract: 1-word doc contributes exactly ONE gram (its
    # unigram) — word_shingles' whole-text pseudo-bigram must NOT leak in
    assert sum(c for (i, _), c in got.items() if i == 1) == 1


def test_log_ratios_dense_spine_and_signs(spark):
    target = _docs(spark, ["good good good"])
    raw = _docs(spark, ["good good good", "bad bad bad bad"])
    rt = dsir_log_ratios(target, raw, n_buckets=B, hash_fn=portable_hash60)
    rows = {r.bucket: r for r in rt.collect()}
    assert len(rows) == B and set(rows) == set(range(B))  # dense spine
    gb, bb = _h60("good") % B, _h60("bad") % B
    assert rows[gb].log_ratio > 0 > rows[bb].log_ratio
    # unseen buckets carry the smoothed constant ln((R+aB)/(T+aB)) < 0
    # here (raw total > target total), not zero and not NULL
    used = {_h60(g) % B for g in _grams("good good good") + _grams("bad bad bad bad")}
    empty = next(r for b, r in rows.items() if b not in used)
    assert empty.t_cnt == 0 and empty.r_cnt == 0
    t_total = len(_grams("good good good"))
    r_total = t_total + len(_grams("bad bad bad bad"))
    assert empty.log_ratio == pytest.approx(math.log(r_total + B) - math.log(t_total + B))


def test_weights_rank_target_like_docs_higher_and_keep_edges(spark):
    # 1024 buckets: this vocabulary is collision-free there (at B=64
    # "alpha"/"junk"-class collisions flip ratio signs — which is honest
    # DSIR behavior under a too-small feature space, not a bug)
    nb = 1024
    target = _docs(spark, ["alpha beta gamma", "alpha beta delta"])
    raw_texts = ["alpha beta gamma", "alpha beta delta", "noise junk spam", "spam junk"]
    raw = _docs(spark, raw_texts)
    rt = dsir_log_ratios(target, raw, n_buckets=nb, hash_fn=portable_hash60)
    score_texts = ["alpha beta", "junk spam", None, ""]
    w = {r.doc_id: r for r in
         dsir_weights(_docs(spark, score_texts), rt, n_buckets=nb, hash_fn=portable_hash60).collect()}
    assert len(w) == 4  # blank/NULL docs keep their rows
    assert w[0].log_weight > 0 > w[1].log_weight
    assert w[2].n_grams == 0 and w[2].log_weight == 0.0
    assert w[3].n_grams == 0 and w[3].log_weight == 0.0
    kept = {r.doc_id: r.keep for r in dsir_keep(
        dsir_weights(_docs(spark, score_texts), rt, n_buckets=nb, hash_fn=portable_hash60), tau=0.0
    ).collect()}
    assert kept == {0: True, 1: False, 2: False, 3: False}


def test_weights_replay_exactly_in_python(spark):
    texts = ["p q r", "p p q", "zz yy", "q r"]
    target, raw = _docs(spark, texts[:2]), _docs(spark, texts)
    rt = dsir_log_ratios(target, raw, n_buckets=B, hash_fn=portable_hash60)
    w = {r.doc_id: r.log_weight for r in
         dsir_weights(_docs(spark, texts), rt, n_buckets=B, hash_fn=portable_hash60).collect()}
    tc, rc = {}, {}
    for t in texts[:2]:
        for g in _grams(t):
            tc[_h60(g) % B] = tc.get(_h60(g) % B, 0) + 1
    for t in texts:
        for g in _grams(t):
            rc[_h60(g) % B] = rc.get(_h60(g) % B, 0) + 1
    T, R = sum(tc.values()), sum(rc.values())
    for i, t in enumerate(texts):
        lw = sum(
            math.log(tc.get(_h60(g) % B, 0) + 1.0) - math.log(T + B)
            - math.log(rc.get(_h60(g) % B, 0) + 1.0) + math.log(R + B)
            for g in _grams(t)
        )
        assert w[i] == pytest.approx(lw, abs=1e-12)


def test_fit_serve_mismatch_fails_loudly(spark):
    """Serving with a different n_buckets than the fit must raise, not
    silently drop the uncovered grams from the weight sum."""
    docs = _docs(spark, ["a b c d e"])
    rt = dsir_log_ratios(docs, docs, n_buckets=B, hash_fn=portable_hash60)
    bad = dsir_weights(docs, rt, n_buckets=64 * B, hash_fn=portable_hash60)
    with pytest.raises(Exception, match="n_buckets/hash_fn"):
        bad.collect()


def test_bucket_bound_fails_loudly(spark):
    with pytest.raises(ValueError, match="n_buckets"):
        hashed_gram_buckets(_docs(spark, ["x"]), n_buckets=2_000_000)
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_log_ratios(_docs(spark, ["x"]), _docs(spark, ["x"]), n_buckets=0)


def test_plan_every_join_broadcast_bounded_exchanges(spark):
    """The whole fit+score pipeline must never sort-merge: every join
    key side is <= n_buckets rows by construction (corpus bucket aggs,
    the dense spine, the 1-row totals), so all joins are broadcast-hash
    and the only shuffles are the three aggregates (target buckets, raw
    buckets, per-doc sum) plus the fit's single-row totals agg."""
    import re

    docs = _docs(spark, ["a b c"])
    rt = dsir_log_ratios(docs, docs, n_buckets=B, hash_fn=portable_hash60)
    w = dsir_weights(docs, rt, n_buckets=B, hash_fn=portable_hash60)
    plan = w._sc._jvm.PythonSQLUtils.explainString(w._jdf.queryExecution(), "formatted")
    assert "SortMergeJoin" not in plan
    n_shuffles = len(re.findall(r"[+:]- Exchange \(", plan))
    assert n_shuffles <= 4, plan


def test_gate_columns_decisive_at_sf001(spark):
    """Pure-Python replay of the dsir_weights_documents gate at sf0.01:
    lw_e4 floor boundaries and the keep threshold must sit far from
    every doc's value — a last-ulp ln difference moves lw by ~1e-14
    (measured), so require gaps > 1e-5 / 1e-3."""
    rows = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    nb = 512
    tc, rc = {}, {}
    for r in rows:
        for g in _grams(r.text):
            b = _h60(g) % nb
            rc[b] = rc.get(b, 0) + 1
            if r.doc_id % 13 == 4:
                tc[b] = tc.get(b, 0) + 1
    T, R = sum(tc.values()), sum(rc.values())
    min_floor_gap, min_keep_gap = 1.0, 1.0
    for r in rows:
        gs = _grams(r.text)
        if not gs:
            continue
        lw = sum(
            math.log(tc.get(_h60(g) % nb, 0) + 1.0) - math.log(T + nb)
            - math.log(rc.get(_h60(g) % nb, 0) + 1.0) + math.log(R + nb)
            for g in gs
        )
        scaled = lw * 10000
        min_floor_gap = min(min_floor_gap, scaled - math.floor(scaled), math.ceil(scaled) - scaled)
        min_keep_gap = min(min_keep_gap, abs(lw))
    assert min_floor_gap > 1e-5, min_floor_gap
    assert min_keep_gap > 1e-3, min_keep_gap
