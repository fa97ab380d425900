"""Unit tests for the round-6 LLM-pipeline additions: benchmark
decontamination (n-gram overlap), Gopher-style repetition metrics, and
deterministic hash splits/samples. Hand-computed tiny fixtures; the
sf-scale value checks live in the decontam_overlap_documents /
repetition_documents / dataset_split_documents gate oracles."""

import pyspark.sql.functions as F
import pytest

from anomaly_detection_spark.operators.decontam import benchmark_ngrams, ngram_overlap
from anomaly_detection_spark.operators.sampling import (
    assign_split,
    split_bucket,
    stratified_sample,
)
from anomaly_detection_spark.operators.text import repetition_metrics

DOCS = "doc_id bigint, text string"


# ---------- decontamination ----------


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOCS)


def test_ngram_overlap_flags_copied_window(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    docs = _docs(
        spark,
        [
            # contains the bench 5-gram "beta gamma delta epsilon zeta"
            (1, "intro beta gamma delta epsilon zeta outro"),
            (2, "totally unrelated words with no shared window at all"),
            (3, ""),  # gram-less: must still come back, clean
        ],
    )
    out = {
        r["doc_id"]: r
        for r in ngram_overlap(docs, bench, k=5, hash_fn=None).collect()
    }
    assert set(out) == {1, 2, 3}
    # doc 1: 3 distinct 5-grams, exactly 1 in the bench set
    assert out[1]["n_ngrams"] == 3
    assert out[1]["n_matched"] == 1
    assert out[1]["overlap_e6"] == 333333
    assert out[1]["contaminated"] is True
    assert out[2]["n_matched"] == 0 and out[2]["contaminated"] is False
    assert out[3]["n_ngrams"] == 0 and out[3]["contaminated"] is False


def test_ngram_overlap_sub_k_word_doc_has_no_grams(spark):
    """STRICT k-gram contract: a doc with fewer than k words has zero
    n-grams, even when its whole text equals a benchmark doc's — the
    word_shingles pseudo-shingle must not leak into decontamination."""
    bench = _docs(spark, [(100, "alpha beta gamma")])
    docs = _docs(spark, [(1, "alpha beta gamma")])  # 3 words < k=5
    row = ngram_overlap(docs, bench, k=5, hash_fn=None).collect()[0]
    assert row["n_ngrams"] == 0 and row["contaminated"] is False


def test_ngram_overlap_hash_mode_matches_string_mode(spark):
    # includes a blank doc: xxhash64(NULL) is a non-null constant, so an
    # un-guarded hash key would count a phantom gram in hash mode only
    docs = _docs(
        spark,
        [(i, f"w{i % 3} common phrase tail x{i} common phrase tail y z") for i in range(12)]
        + [(99, "")],
    )
    bench = docs.filter(F.col("doc_id") % 4 == 0)
    by_str = sorted(map(tuple, ngram_overlap(docs, bench, k=3, hash_fn=None).collect()))
    by_hash = sorted(map(tuple, ngram_overlap(docs, bench, k=3).collect()))
    assert by_str == by_hash


def test_ngram_overlap_threshold_gates_flag(spark):
    bench = _docs(spark, [(100, "a b c d e f")])
    docs = _docs(spark, [(1, "z z a b c d e f z z")])  # 2 of 6 grams match
    row = ngram_overlap(docs, bench, k=5, hash_fn=None, flag_threshold=0.5).collect()[0]
    assert row["n_matched"] == 2 and row["n_ngrams"] == 6
    assert row["contaminated"] is False  # 1/3 < 0.5
    row = ngram_overlap(docs, bench, k=5, hash_fn=None, flag_threshold=0.3).collect()[0]
    assert row["contaminated"] is True


def test_benchmark_ngrams_distinct_across_docs(spark):
    bench = _docs(spark, [(1, "a b c"), (2, "a b c"), (3, "b c d")])
    grams = sorted(r["_bg"] for r in benchmark_ngrams(bench, k=3, hash_fn=None).collect())
    assert grams == ["a b c", "b c d"]


# ---------- repetition metrics ----------


def test_repetition_metrics_hand_computed(spark):
    # "a a a b": words a×3 b×1; 2-grams "a a"×2 "a b"×1; 3-grams unique.
    df = _docs(spark, [(1, "a a a b")])
    r = repetition_metrics(df).collect()[0]
    assert r["n_tokens"] == 4
    assert r["top_word_cnt"] == 3
    assert r["top_word_frac_e6"] == 750000
    assert r["top_2gram_cnt"] == 2
    # top 2-gram "a a": 2 occurrences x 3 chars over 7 normalized chars
    assert r["top_2gram_frac_e6"] == (2 * 3 * 1000000) // 7
    assert r["dup_3gram_frac_e6"] == 0


def test_repetition_metrics_duplicated_3grams(spark):
    # "x y z" repeated 3x: 3-gram counts xyz×3 yzx×2 zxy×2 -> all dup;
    # dup chars = (3+2+2)*5 = 35 over 17 chars.
    df = _docs(spark, [(1, "x y z x y z x y z")])
    r = repetition_metrics(df).collect()[0]
    assert r["n_tokens"] == 9
    assert r["top_word_cnt"] == 3
    assert r["dup_3gram_frac_e6"] == (35 * 1000000) // 17
    # 2-grams: "x y"×3, "y z"×3, "z x"×2 — tie, but both tied grams
    # have 3 chars so the packed (cnt, len) argmax is unambiguous
    assert r["top_2gram_cnt"] == 3
    assert r["top_2gram_frac_e6"] == (3 * 3 * 1000000) // 17


def test_repetition_metrics_tie_breaks_to_largest_gram(spark):
    # a×2 b×2 -> top word is lexicographically largest among the tie
    df = _docs(spark, [(1, "b a b a")])
    r = repetition_metrics(df).collect()[0]
    assert r["top_word_cnt"] == 2
    assert r["top_word_frac_e6"] == 500000


def test_repetition_metrics_empty_and_single_word(spark):
    df = _docs(spark, [(1, ""), (2, "word")])
    out = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    assert out[1]["n_tokens"] == 0
    assert out[1]["top_word_frac_e6"] == 0
    assert out[2]["n_tokens"] == 1
    assert out[2]["top_word_frac_e6"] == 1000000
    assert out[2]["dup_3gram_frac_e6"] == 0
    # strict n-gram contract: one word -> NO 2-grams (not a phantom
    # whole-text gram reported as 100% repetition)
    assert out[2]["top_2gram_cnt"] == 0
    assert out[2]["top_2gram_frac_e6"] == 0


# ---------- splits / sampling ----------


def _ids(spark, n):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_assign_split_covers_all_rows_near_weights(spark):
    n = 4000
    counts = {
        r["split"]: r["n"]
        for r in assign_split(_ids(spark, n)).groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(counts.values()) == n
    assert abs(counts["train"] / n - 0.8) < 0.03
    assert abs(counts["val"] / n - 0.1) < 0.02
    assert abs(counts["test"] / n - 0.1) < 0.02


def test_assign_split_is_partitioning_invariant_and_stable_under_growth(spark):
    base = {r["doc_id"]: r["split"] for r in assign_split(_ids(spark, 500)).collect()}
    repart = {
        r["doc_id"]: r["split"]
        for r in assign_split(_ids(spark, 500).repartition(7)).collect()
    }
    assert base == repart
    grown = {r["doc_id"]: r["split"] for r in assign_split(_ids(spark, 1000)).collect()}
    assert all(grown[k] == v for k, v in base.items())


def test_assign_split_custom_weights_normalize(spark):
    out = assign_split(_ids(spark, 300), weights={"a": 3, "b": 1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"a", "b"}
    assert abs(counts["a"] / 300 - 0.75) < 0.06
    with pytest.raises(ValueError):
        assign_split(_ids(spark, 10), weights={"a": -1, "b": 2})


def test_split_bucket_range_and_salt_independence(spark):
    df = _ids(spark, 300).select(
        split_bucket("doc_id").alias("b1"),
        split_bucket("doc_id", salt="sample").alias("b2"),
    )
    row = df.agg(
        F.min("b1"), F.max("b1"), F.sum((F.col("b1") == F.col("b2")).cast("int"))
    ).collect()[0]
    assert row[0] >= 0 and row[1] < 10_000
    assert row[2] < 5  # different salts -> (near-)independent buckets


def test_stratified_sample_deterministic_subset(spark):
    df = _ids(spark, 2000)
    s1 = sorted(r["doc_id"] for r in stratified_sample(df, 0.25).collect())
    s2 = sorted(r["doc_id"] for r in stratified_sample(df.repartition(5), 0.25).collect())
    assert s1 == s2
    assert abs(len(s1) / 2000 - 0.25) < 0.03
    assert stratified_sample(df, 0.0).count() == 0
    assert stratified_sample(df, 1.0).count() == 2000
    with pytest.raises(ValueError):
        stratified_sample(df, 1.5)


# ---------- curation pipeline ----------


def test_curation_flags_each_reason_and_survivorship(spark):
    from anomaly_detection_spark.operators.curation import curation_flags

    docs = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over a lazy dog and the sun sets"),  # clean en
            (2, "el perro la casa que corre los campos una tarde de sol"),  # clean es
            (3, "tiny doc"),  # too_short
            (4, "spam spam spam spam spam spam spam spam spam spam"),  # repetitive + und
            (5, "the quick brown fox jumps over a lazy dog and the sun sets"),  # exact dup of 1
            (6, "eval alpha beta gamma delta epsilon zeta intro the and of to is filler words here now"),
        ],
    )
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    out = {
        r["doc_id"]: r
        for r in curation_flags(
            docs,
            benchmark=bench,
            min_tokens=5,
            max_tokens=40,
            allowed_langs=("en", "es"),
            max_top_word_frac_e6=500_000,
            max_dup_3gram_frac_e6=400_000,
            decontam_k=5,
            hash_fn=None,
        ).collect()
    }
    assert out[1]["keep"] is True and out[1]["reasons"] == ""
    assert out[2]["keep"] is True
    assert "too_short" in out[3]["reasons"]
    assert "repetitive" in out[4]["reasons"] and "bad_lang" in out[4]["reasons"]
    # exact dup: smallest id survives, the copy is flagged
    assert out[1]["is_duplicate"] is False and out[5]["is_duplicate"] is True
    assert "duplicate" in out[5]["reasons"]
    assert out[6]["contaminated"] is True and "contaminated" in out[6]["reasons"]
    # reasons follow the fixed flag order
    assert out[4]["reasons"].split(",") == sorted(
        out[4]["reasons"].split(","), key=["too_short", "too_long", "bad_lang", "repetitive", "duplicate", "contaminated"].index
    )


def test_curation_without_benchmark_skips_decontam(spark):
    from anomaly_detection_spark.operators.curation import curation_flags

    docs = _docs(spark, [(1, "the and of to is when words differ all over")])
    r = curation_flags(docs, min_tokens=5).collect()[0]
    assert r["contaminated"] is False and r["keep"] is True


# ---------- sequence packing ----------


def test_pack_sequences_hand_computed(spark):
    """One group, next-fit semantics pinned: [50, 30, 40, 90, 120, 10]
    at max=100 -> packs [50+30], [40], [90], [120 overflow], [10]."""
    from anomaly_detection_spark.operators.packing import pack_sequences, pack_summary

    toks = [50, 30, 40, 90, 120, 10]
    docs = _docs(spark, [(i, " ".join(f"w{j}" for j in range(t))) for i, t in enumerate(toks)])
    out = sorted(
        (r["doc_id"], r["pack_id"], r["fill_after"], r["overflow"])
        for r in pack_sequences(docs, max_tokens=100, n_groups=1).collect()
    )
    g = out[0][1] // 1_000_000
    base = g * 1_000_000
    assert out == [
        (0, base + 0, 50, False),
        (1, base + 0, 80, False),
        (2, base + 1, 40, False),
        (3, base + 2, 90, False),
        (4, base + 3, 120, True),
        (5, base + 4, 10, False),
    ]
    summ = {r["pack_id"]: (r["n_docs"], r["pack_tokens"], r["util_e6"]) for r in pack_summary(
        pack_sequences(docs, max_tokens=100, n_groups=1), 100
    ).collect()}
    assert summ[base + 0] == (2, 80, 800000)
    assert summ[base + 3] == (1, 120, 1200000)


def test_pack_sequences_deterministic_and_partition_invariant(spark):
    from anomaly_detection_spark.operators.packing import pack_sequences

    docs = _docs(spark, [(i, " ".join(f"w{j}" for j in range(5 + i % 37))) for i in range(300)])
    a = sorted(map(tuple, pack_sequences(docs, max_tokens=64, n_groups=8).collect()))
    b = sorted(map(tuple, pack_sequences(docs.repartition(7), max_tokens=64, n_groups=8).collect()))
    assert a == b
    # every doc assigned exactly once, fills never exceed max except overflow rows
    assert len(a) == 300
    assert all(r[4] <= 64 or r[5] for r in a)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pack_sequences(docs, max_tokens=0)


# ---------- round-7 hardening: edge contracts + scale-safe defaults ----------


def test_assign_split_thresholds_are_exact_rationals(spark):
    """{0.7, 0.3} must cut at bucket floor(0.7 * 10000) = 7000 EXACTLY —
    accumulated-float thresholds land on 6999 (0.7's binary repr) and an
    external engine recomputing the documented formula would disagree on
    boundary rows (ADVICE r6)."""
    ids = _ids(spark, 20000)
    buckets = {
        r["doc_id"]: r["b"]
        for r in ids.select("doc_id", split_bucket("doc_id").alias("b")).collect()
    }
    got = {
        r["doc_id"]: r["split"]
        for r in assign_split(ids, weights={"a": 0.7, "b": 0.3}).collect()
    }
    assert all(got[i] == ("a" if buckets[i] < 7000 else "b") for i in got)
    # the boundary bucket itself is exercised: 6999 stays 'a', 7000 flips
    assert any(b == 6999 for b in buckets.values())
    assert any(b == 7000 for b in buckets.values())


def test_pack_sequences_string_ids_survive(spark):
    """String doc ids ('doc-%012d' convention) flow through unchanged —
    the old bigint cast NULLed them and broke in-group determinism
    (ADVICE r6). In-group order is the id's native (lexicographic)
    ordering."""
    from anomaly_detection_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(f"doc-{i:012d}", " ".join(f"w{j}" for j in range(40))) for i in range(6)],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r for r in pack_sequences(docs, max_tokens=100, n_groups=1).collect()}
    assert sorted(out) == [f"doc-{i:012d}" for i in range(6)]
    # lexicographic order: docs 0+1 share the first pack (40+40<=100), 2 opens the next
    assert out["doc-000000000000"]["pack_id"] == out["doc-000000000001"]["pack_id"]
    assert out["doc-000000000002"]["pack_id"] == out["doc-000000000001"]["pack_id"] + 1


def test_pack_sequences_group_row_guard_fires(spark, monkeypatch):
    """A group beyond _MAX_GROUP_ROWS fails loudly inside the task
    instead of grinding one Python worker for hours (VERDICT r6 #1)."""
    import anomaly_detection_spark.operators.packing as packing

    monkeypatch.setattr(packing, "_MAX_GROUP_ROWS", 3)
    docs = _docs(spark, [(i, "a b c") for i in range(10)])
    with pytest.raises(Exception, match="raise n_groups"):
        packing.pack_sequences(docs, max_tokens=10, n_groups=1).collect()


def test_pack_sequences_auto_n_groups_scales_with_corpus(spark, monkeypatch):
    """n_groups=None derives the group count from a corpus count at
    ~_TARGET_ROWS_PER_GROUP docs/group, so the default never funnels a
    huge corpus through a handful of Python tasks."""
    import anomaly_detection_spark.operators.packing as packing

    monkeypatch.setattr(packing, "_TARGET_ROWS_PER_GROUP", 5)
    docs = _docs(spark, [(i, "a b c d") for i in range(300)])
    out = packing.pack_sequences(docs, max_tokens=10).collect()
    assert len(out) == 300
    gids = {r["group_id"] for r in out}
    # ceil(300/5) = 60 derived groups; hash-uniform ids hit most of them
    assert max(gids) < 60 and len(gids) > 32


def test_repetition_curation_null_empty_text_edge_parity(spark, tmp_path):
    """NULL/blank-text docs come back with all-zero repetition metrics
    in BOTH engines (ADVICE r6: the DuckDB twins used to drop NULL-text
    docs and count an empty text as one ''-token — green only because
    the sf fixture has no such docs). Runs the REAL gate queries and
    their REAL oracles on a fixture that plants the edge."""
    import duckdb

    import __spark_entry__ as entrymod

    rows = [
        (1, None, "xx", "s", 0),
        (2, "", "xx", "s", 0),
        (3, "   ", "xx", "s", 3),  # blank AND in the bench split (3 % 17 == 3)
        (4, "alpha beta alpha beta alpha beta gamma delta", "en", "s", 44),
        (5, "solo", "en", "s", 4),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet/*.parquet'"
    )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in ("repetition_documents", "curation_documents"):
        sdf = qs[name](spark, str(tmp_path))
        scols = sdf.columns
        order = sorted(range(len(scols)), key=lambda i: scols[i])
        srows = sorted(
            tuple(str(t[i]) for i in order) for t in (tuple(r) for r in sdf.collect())
        )
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
        orows = sorted(tuple(str(t[i]) for i in oorder) for t in res.fetchall())
        assert sorted(scols) == sorted(ocols), name
        assert srows == orows, f"{name}: {srows} != {orows}"
        assert len(srows) == 5, name  # every doc present, none dropped


# ---------- mixture sampling ----------


def test_mixture_sample_targets_and_determinism(spark):
    from anomaly_detection_spark.operators.sampling import mixture_sample

    rows = [(i, f"d{i}", ("web" if i % 10 < 8 else "books"), "s", 1) for i in range(500)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    # empirical 400:100; target 1:1 -> books (max w/n) keeps all 100,
    # web keeps ~ (1*100)/(1*400) = 1/4 of its 400
    kept = mixture_sample(df, {"web": 1, "books": 1}, group_col="lang")
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["books"] == 100
    assert 70 <= counts["web"] <= 130  # hash-binomial around 100
    # deterministic: identical kept ids across runs/partitionings
    ids1 = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in mixture_sample(df.repartition(7), {"web": 1, "books": 1}, group_col="lang").collect()
    )
    assert ids1 == ids2


def test_mixture_sample_edges(spark):
    from anomaly_detection_spark.operators.sampling import mixture_sample

    rows = [(1, "a"), (2, "a"), (3, "b"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    # zero-weight / unknown / NULL groups drop by default
    kept = mixture_sample(df, {"a": 1}, group_col="lang")
    assert {r["doc_id"] for r in kept.collect()} <= {1, 2}
    assert kept.filter(F.col("lang").isNull()).count() == 0
    # default_weight resurrects unweighted groups
    kept2 = mixture_sample(df, {"a": 1}, group_col="lang", default_weight=1)
    assert kept2.filter(F.col("lang") == "b").count() == 1
    # all-zero weights -> empty, no crash
    assert mixture_sample(df, {}, group_col="lang").count() == 0
    with pytest.raises(ValueError, match="non-negative"):
        mixture_sample(df, {"a": -1}, group_col="lang")


def test_mixture_sample_group_bound_guard(spark):
    from anomaly_detection_spark.operators import sampling

    df = spark.range(3000).select(
        F.col("id").alias("doc_id"), F.col("id").cast("string").alias("lang")
    )
    with pytest.raises(ValueError, match="distinct"):
        sampling.mixture_sample(df, {"0": 1}, group_col="lang")


# ---------- duplicated passages ----------


def test_duplicated_passages_interval_union(spark):
    from anomaly_detection_spark.operators.dedup import duplicated_passages

    bp = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 words
    rows = [
        (1, "unique words here only nothing shared at all in this one " + bp),
        (2, "totally different preamble text for the second document " + bp),
        (3, "short doc"),
        (4, None),
        (5, ""),
        (6, "no overlap with anything else entirely fresh tokens forever unrepeated"),
    ]
    df = _docs(spark, rows)
    out = {r["doc_id"]: r.asDict() for r in duplicated_passages(df, window=8, hash_fn=None).collect()}
    # 3 overlapping dup windows -> union of 10 tokens, never 3*8
    for d in (1, 2):
        assert out[d]["n_dup_windows"] == 3 and out[d]["dup_tokens"] == 10
    assert out[1]["dup_frac_e6"] == 10 * 1_000_000 // out[1]["n_tokens"]
    # short/null/blank -> all-zero rows, never dropped
    for d in (3, 4, 5):
        assert out[d]["n_windows"] == 0 and out[d]["dup_tokens"] == 0
    assert out[3]["n_tokens"] == 2 and out[4]["n_tokens"] == 0
    assert out[6]["n_dup_windows"] == 0


def test_duplicated_passages_same_doc_repeats_dont_count(spark):
    from anomaly_detection_spark.operators.dedup import duplicated_passages

    bp = "one two three four five six seven eight"
    df = _docs(spark, [(1, bp + " filler " + bp), (2, "wholly unrelated text body here right now ok")])
    out = {r["doc_id"]: r.asDict() for r in duplicated_passages(df, window=8, hash_fn=None).collect()}
    # the window repeats WITHIN doc 1 only -> not cross-doc duplicated
    assert out[1]["n_dup_windows"] == 0 and out[1]["dup_tokens"] == 0
    # positional multiplicity: the internally-repeated window keeps
    # BOTH positions (17 tokens -> 10 windows; an array_distinct'd
    # window list would report 9 and desync pos from token offsets)
    assert out[1]["n_tokens"] == 17 and out[1]["n_windows"] == 10


def test_duplicated_passages_hash_mode_matches_string_mode(spark):
    from anomaly_detection_spark.operators.dedup import duplicated_passages

    bp = "shared boilerplate sentence with exactly nine tokens here"
    rows = [(i, f"doc {i} preamble text number {i} okay then " + bp) for i in range(6)]
    rows += [(99, "nothing in common with the rest at all whatsoever")]
    df = _docs(spark, rows)
    a = sorted(map(tuple, duplicated_passages(df, window=8, hash_fn=None).collect()))
    b = sorted(map(tuple, duplicated_passages(df, window=8).collect()))
    assert a == b  # xxhash64 keys reproduce the string-key flags


def test_duplicated_passages_min_docs(spark):
    from anomaly_detection_spark.operators.dedup import duplicated_passages

    bp = "eins zwei drei vier fuenf sechs sieben acht"
    rows = [(1, "lead in words " + bp), (2, "other front matter " + bp), (3, "third doc intro " + bp)]
    df = _docs(spark, rows)
    out2 = duplicated_passages(df, window=8, hash_fn=None, min_docs=2)
    out4 = duplicated_passages(df, window=8, hash_fn=None, min_docs=4)
    assert out2.agg(F.sum("n_dup_windows")).first()[0] == 3
    assert out4.agg(F.sum("n_dup_windows")).first()[0] == 0


def test_remove_duplicated_passages_invariants(spark):
    from anomaly_detection_spark.operators.dedup import (
        duplicated_passages,
        remove_duplicated_passages,
    )

    bp = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, "Unique words HERE only nothing shared at all in this one " + bp),
        (2, bp + " trailing unique suffix of doc two okay"),
        (3, "short doc"),
        (4, None),
        (5, ""),
    ]
    df = _docs(spark, rows)
    out = {r["doc_id"]: r.asDict() for r in remove_duplicated_passages(df, window=8, hash_fn=None).collect()}
    dp = {r["doc_id"]: r["dup_tokens"] for r in duplicated_passages(df, window=8, hash_fn=None).collect()}
    # removed == the detection side's union coverage, per doc
    for d in out:
        assert out[d]["n_tokens"] - out[d]["kept_tokens"] == dp[d], d
    # boilerplate excised front AND back, original case preserved
    assert out[1]["clean_text"] == "Unique words HERE only nothing shared at all in this one"
    assert out[2]["clean_text"] == "trailing unique suffix of doc two okay"
    # short doc untouched (whitespace-normalized), null stays null, blank -> ''
    assert out[3]["clean_text"] == "short doc" and out[3]["kept_tokens"] == 2
    assert out[4]["clean_text"] is None
    assert out[5]["clean_text"] == "" and out[5]["n_tokens"] == 0


def test_remove_duplicated_passages_can_empty_a_doc(spark):
    from anomaly_detection_spark.operators.dedup import remove_duplicated_passages

    bp = "one two three four five six seven eight"
    df = _docs(spark, [(1, bp), (2, bp), (3, "an unrelated body of text right here now")])
    out = {r["doc_id"]: r.asDict() for r in remove_duplicated_passages(df, window=8, hash_fn=None).collect()}
    # pure-boilerplate docs empty out entirely (remove-every-occurrence)
    assert out[1]["clean_text"] == "" and out[1]["kept_tokens"] == 0
    assert out[2]["clean_text"] == ""
    assert out[3]["kept_tokens"] == 8


# ---------- line-level boilerplate dedup ----------

def test_duplicated_lines_counts_and_blank_contract(spark):
    from anomaly_detection_spark.operators.dedup import duplicated_lines

    df = _docs(spark, [
        (0, "unique alpha\nCookie Notice\nbody zero"),
        (1, "cookie notice\nunique beta\n\nbody one"),   # case variant + blank line
        (2, "  cookie notice  \nnav menu"),              # edge-space variant
        (3, "nav menu\nunique gamma"),
        (4, None),
        (5, ""),
    ])
    out = {r.doc_id: r for r in duplicated_lines(df, hash_fn=None).collect()}
    # 'cookie notice' normalizes identically across case/edge-space
    # variants (3 docs); 'nav menu' in 2 docs; blank lines never count
    assert (out[0].n_lines, out[0].n_dup_lines) == (3, 1)
    assert (out[1].n_lines, out[1].n_dup_lines) == (4, 1)
    assert (out[2].n_lines, out[2].n_dup_lines) == (2, 2)
    assert (out[3].n_lines, out[3].n_dup_lines) == (2, 1)
    assert (out[4].n_lines, out[4].n_dup_lines) == (0, 0)  # NULL text survives
    assert (out[5].n_lines, out[5].n_dup_lines) == (1, 0)  # one blank line, not a dup


def test_remove_duplicated_lines_preserves_structure(spark):
    from anomaly_detection_spark.operators.dedup import (
        duplicated_lines,
        remove_duplicated_lines,
    )

    df = _docs(spark, [
        (0, "keep A\nCookie Notice\n\nkeep B"),
        (1, "cookie notice\nkeep C"),
        (2, "COOKIE NOTICE"),       # pure boilerplate -> empties out
        (3, None),
    ])
    out = {r.doc_id: r for r in remove_duplicated_lines(df, hash_fn=None).collect()}
    # original casing, order and the blank line survive; only the
    # offending line vanishes from every doc
    assert out[0].clean_text == "keep A\n\nkeep B"
    assert (out[0].n_lines, out[0].kept_lines) == (4, 3)
    assert out[1].clean_text == "keep C"
    assert out[2].clean_text == "" and out[2].kept_lines == 0
    assert out[3].clean_text is None and out[3].n_lines == 0
    # xxhash64 production path agrees with the string-key oracle mode
    fast = {r.doc_id: r.n_dup_lines for r in duplicated_lines(df).collect()}
    slow = {r.doc_id: r.n_dup_lines for r in duplicated_lines(df, hash_fn=None).collect()}
    assert fast == slow


def test_line_dedup_min_docs_threshold(spark):
    from anomaly_detection_spark.operators.dedup import duplicated_lines

    df = _docs(spark, [
        (0, "shared line\nown 0"),
        (1, "shared line\nown 1"),
        (2, "shared line\nown 2"),
    ])
    strict = {r.doc_id: r.n_dup_lines for r in duplicated_lines(df, hash_fn=None, min_docs=4).collect()}
    assert strict == {0: 0, 1: 0, 2: 0}
    loose = {r.doc_id: r.n_dup_lines for r in duplicated_lines(df, hash_fn=None, min_docs=3).collect()}
    assert loose == {0: 1, 1: 1, 2: 1}
