"""Unit tests for the trained quality classifier
(operators/quality_model.py): feature extraction contract, exact
pure-Python training replay (the oracle-feasibility proof), planted
good/bad separation, guards, and the serve-plan shape."""

import hashlib
import math
import re

import pyspark.sql.functions as F
import pytest

from anomaly_detection_spark.operators.dedup import portable_hash60
from anomaly_detection_spark.operators.quality_model import (
    BIAS_BUCKET,
    doc_features,
    logreg_score,
    logreg_train,
)

B = 256
LDOCS = "doc_id bigint, text string, y int"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _grams(text):
    if text is None or not text.strip():
        return []
    ws = re.split(r"\s+", text.strip().lower())
    out = list(ws)
    if len(ws) >= 2:
        out += [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    return out


def _py_feats(text, nb):
    gs = _grams(text)
    f = {}
    for g in gs:
        b = _h60(g) % nb
        f[b] = f.get(b, 0) + 1
    n = len(gs)
    x = {b: c / n for b, c in f.items()}
    x[BIAS_BUCKET] = 1.0
    return x


def _py_train(rows, nb, lr, iters):
    w = {b: 0.0 for b in range(-1, nb)}
    n = len(rows)
    for _ in range(iters):
        grad = {b: 0.0 for b in w}
        for text, y in rows:
            x = _py_feats(text, nb)
            z = sum(v * w[b] for b, v in x.items())
            r = 1.0 / (1.0 + math.exp(-z)) - y
            for b, v in x.items():
                grad[b] += v * r
        for b in w:
            w[b] -= lr / n * grad[b]
    return w


def _py_score(text, w, nb):
    x = _py_feats(text, nb)
    z = sum(v * w[b] for b, v in x.items())
    return 1.0 / (1.0 + math.exp(-z))


GOOD = ["concise factual article about science", "careful factual writing about history"]
BAD = ["buy now click here spam offer", "click spam buy offer now deal"]


def _labeled(spark):
    rows = [(i, t, 1) for i, t in enumerate(GOOD)] + [
        (10 + i, t, 0) for i, t in enumerate(BAD)
    ]
    return spark.createDataFrame(rows, LDOCS)


def test_doc_features_normalized_with_bias(spark):
    df = spark.createDataFrame(
        [(0, "a b a"), (1, None), (2, " ")], "doc_id bigint, text string"
    )
    rows = doc_features(df, n_buckets=B, hash_fn=portable_hash60).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.bucket] = r.x
    assert by_doc[0] == pytest.approx(_py_feats("a b a", B))
    # gram-less docs keep exactly their bias row -> still scoreable
    assert by_doc[1] == {BIAS_BUCKET: 1.0}
    assert by_doc[2] == {BIAS_BUCKET: 1.0}


def test_training_matches_python_replay_bitwise_close(spark):
    lab = _labeled(spark)
    w = {
        r.bucket: r.w
        for r in logreg_train(
            lab, "y", n_buckets=B, hash_fn=portable_hash60, lr=2.0, n_iters=6
        ).collect()
    }
    assert len(w) == B + 1  # dense spine + bias
    pw = _py_train([(t, 1) for t in GOOD] + [(t, 0) for t in BAD], B, 2.0, 6)
    nonzero = [b for b, v in pw.items() if v != 0.0]
    assert nonzero  # the model actually moved
    for b in pw:
        assert w[b] == pytest.approx(pw[b], abs=1e-12), b


def test_scores_separate_planted_quality(spark):
    lab = _labeled(spark)
    weights = logreg_train(lab, "y", n_buckets=B, hash_fn=portable_hash60, lr=2.0, n_iters=8)
    held_out = spark.createDataFrame(
        [(100, "factual article about careful science"),
         (101, "spam deal click now buy"),
         (102, None)],
        "doc_id bigint, text string",
    )
    s = {r.doc_id: r for r in
         logreg_score(held_out, weights, n_buckets=B, hash_fn=portable_hash60).collect()}
    assert s[100].score > 0.5 > s[101].score
    # gram-less doc scores sigmoid(bias): defined, not NULL
    assert s[102].n_feats == 0 and 0.0 < s[102].score < 1.0
    # python replay agrees on the served scores too
    pw = _py_train([(t, 1) for t in GOOD] + [(t, 0) for t in BAD], B, 2.0, 8)
    assert s[100].score == pytest.approx(_py_score("factual article about careful science", pw, B), abs=1e-12)


def test_guards_fail_loudly(spark):
    lab = _labeled(spark)
    with pytest.raises(ValueError, match="labeled docs"):
        logreg_train(lab, "y", n_buckets=B, max_broadcast_docs=2)
    weights = logreg_train(lab, "y", n_buckets=B, hash_fn=portable_hash60, n_iters=1)
    with pytest.raises(Exception, match="n_buckets/hash_fn"):
        logreg_score(lab, weights, n_buckets=4 * B, hash_fn=portable_hash60).collect()


def test_serve_plan_is_broadcast_one_exchange(spark):
    lab = _labeled(spark)
    weights = logreg_train(lab, "y", n_buckets=B, hash_fn=portable_hash60, n_iters=1)
    out = logreg_score(lab, weights, n_buckets=B, hash_fn=portable_hash60)
    plan = out._sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    assert "SortMergeJoin" not in plan


def test_gate_margins_decisive_at_sf001(spark):
    """Pure-Python replay of the quality_model_documents gate at
    sf0.01: the e4 floor boundaries and the 0.5 decision threshold
    must sit far from every doc's score (measured: floor gap 5.3e-4,
    decision margin 3.7e-6 — 5+ orders above the ~1e-11 cross-engine
    drift of the 6-iteration loop), and the planted signal must
    actually separate (>= 99% accuracy)."""
    rows = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    nb, lr, iters = 256, 2.0, 6
    docs = []
    for r in rows:
        y = 1 if r.doc_id % 2 == 0 else 0
        plant = " informative factual article reference" if y else " click buy spam offer now"
        docs.append((r.doc_id, (r.text or "") + plant, y))
    w = _py_train([(t, y) for d, t, y in docs if d % 4 < 2], nb, lr, iters)
    min_floor, min_margin, acc = 1.0, 1.0, 0
    for _, t, y in docs:
        p = _py_score(t, w, nb)
        sc = p * 10000
        min_floor = min(min_floor, sc - math.floor(sc), math.ceil(sc) - sc)
        min_margin = min(min_margin, abs(p - 0.5))
        acc += (p > 0.5) == (y == 1)
    assert min_floor > 1e-5, min_floor
    assert min_margin > 1e-6, min_margin
    assert acc / len(docs) >= 0.99, acc / len(docs)
