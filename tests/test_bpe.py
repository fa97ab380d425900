"""Unit tests for the learned-merges BPE tokenizer: cross-checked
against the entry file's INDEPENDENT pure-Python reference trainer on
the planted corpus, plus application edge contracts. The sf-scale
value checks live in the bpe_tokens_documents / bpe_pack_documents
gate oracles."""

import pyspark.sql.functions as F
import pytest

from anomaly_detection_spark.operators.bpe import (
    GAP,
    SEP,
    bpe_merge_pairs,
    bpe_token_count,
    bpe_tokens,
    bpe_train,
)


def _planted_docs(spark):
    import __spark_entry__ as entry

    return spark.range(200).select(
        entry._bpe_planted_word(F.col("id") % 23).alias("text")
    )


def test_bpe_train_matches_independent_reference(spark):
    """The distributed trainer and the entry file's pure-Python
    reference (symbol lists, no shared code) must learn the IDENTICAL
    merge sequence on the planted corpus — this is the cross-check the
    gate oracle rests on."""
    import __spark_entry__ as entry

    got = bpe_merge_pairs(bpe_train(_planted_docs(spark), n_merges=24))
    assert got == entry._bpe_reference_merges(24)
    assert 1 < len(got) <= 24  # early stop fired before the cap


def test_bpe_application_edges(spark):
    """Hand-computed application: merges in learned order, leftmost
    non-overlapping, never across word gaps; NULL/blank text counts 0;
    reserved separator chars are stripped before encoding."""
    merges = [("a", "a"), ("aa", "b")]
    rows = [
        (0, "aaa"),        # [aa, a] -> 2
        (1, "aaaa"),       # [aa, aa] -> 2
        (2, "aab"),        # [aa, b] then [aab] -> 1
        (3, "a ab"),       # gap blocks: [a][a, b] -> 3
        (4, None),
        (5, "   "),
        (6, f"a{SEP}a{GAP}b"),  # reserved chars stripped -> "aab" -> 1
        (7, "xayb"),       # no pair applies -> 4 chars
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r["bpe_tokens"] for r in bpe_tokens(df, merges).collect()}
    assert got == {0: 2, 1: 2, 2: 1, 3: 3, 4: 0, 5: 0, 6: 1, 7: 4}


def test_bpe_counts_match_python_fold_on_planted_words(spark):
    """Applying the learned merges per planted word must give exactly
    the reference's surviving symbol counts."""
    import __spark_entry__ as entry

    merges = entry._bpe_reference_merges(24)

    def apply(word):
        s = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return len(s)

    words = sorted(
        {
            "".join(chr(97 + (v * 7 + j * 3) % 5) for j in range(2 + v % 4))
            for v in range(23)
        }
    )
    df = spark.createDataFrame(list(enumerate(words)), "doc_id bigint, text string")
    got = {r["doc_id"]: r["bpe_tokens"] for r in bpe_tokens(df, merges).collect()}
    assert got == {i: apply(w) for i, w in enumerate(words)}


def test_bpe_train_validates_and_caps(spark):
    with pytest.raises(ValueError, match="non-negative"):
        bpe_train(_planted_docs(spark), n_merges=-1)
    empty = spark.createDataFrame([], "text string")
    assert bpe_merge_pairs(bpe_train(empty, n_merges=4)) == []
    big = spark.range(5).select(
        F.col("id").cast("int").alias("merge_idx"),
        F.lit("a").alias("left"),
        F.lit("b").alias("right"),
    )
    with pytest.raises(ValueError, match="merge table exceeds"):
        bpe_merge_pairs(big, max_merges=3)


def test_pack_sequences_with_bpe_token_expr(spark):
    """token_count_expr swaps the packer's sizing backend: with merges
    [(a,a)] the doc 'aaaa aaaa' is 4 BPE tokens (2 whitespace words)."""
    from anomaly_detection_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, "aaaa aaaa") for i in range(4)], "doc_id bigint, text string"
    )
    out = pack_sequences(
        docs,
        max_tokens=8,
        n_groups=1,
        token_count_expr=bpe_token_count("text", [("a", "a")]),
    ).collect()
    assert all(r["n_tokens"] == 4 for r in out)
    # 4 tokens/doc at max 8 -> two docs per pack
    packs = sorted(r["pack_id"] for r in out)
    assert packs[0] == packs[1] and packs[2] == packs[3] and packs[1] != packs[2]


def test_curation_flags_with_bpe_token_expr(spark):
    """token_count_expr swaps curation's length signal: 'aaaa aaaa
    aaaa' is 3 whitespace words but 6 BPE tokens under merges [(a,a)],
    so min_tokens=5 flags it too_short by words and keeps it by BPE."""
    from anomaly_detection_spark.operators.curation import curation_flags

    docs = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa")], "doc_id bigint, text string"
    )
    by_words = curation_flags(docs, min_tokens=5, allowed_langs=("xx",)).collect()[0]
    by_bpe = curation_flags(
        docs,
        min_tokens=5,
        allowed_langs=("xx",),
        token_count_expr=bpe_token_count("text", [("a", "a")]),
    ).collect()[0]
    assert by_words["n_tokens"] == 3 and "too_short" in by_words["reasons"]
    assert by_bpe["n_tokens"] == 6 and "too_short" not in by_bpe["reasons"]


def test_bpe_encode_ids_match_duckdb_twin(spark):
    """bpe_encode's token-ID sequences (codepoint for base symbols,
    MERGE_ID_BASE + first producing merge index for merge products,
    gaps dropped) must match an independent DuckDB replay of the same
    encoding over a fixture with multi-word, unicode (incl. astral —
    Spark 4 ascii()/length() and DuckDB unicode()/length() are both
    codepoint-exact) and NULL/blank edges."""
    import duckdb

    import __spark_entry__ as entry
    from anomaly_detection_spark.operators.bpe import MERGE_ID_BASE, bpe_encode, bpe_vocab

    merges = entry._bpe_reference_merges(24)
    rows = [
        (0, "adbe cadbe"),
        (1, "scan the data adbecad"),
        (2, None),
        (3, ""),
        (4, "héllo wörld 😀 ad"),
        (5, "a d ad adad"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r["token_ids"] for r in bpe_encode(df, merges).collect()}

    s, g = "\x1f", "\x1e"
    expr = (
        f"'{s}{s}' || regexp_replace(regexp_replace(trim(regexp_replace("
        f"coalesce(text, ''), '[{s}{g}]', '', 'g')), '\\s+', '{g}', 'g'),"
        f" '(.)', '\\1{s}{s}', 'g')"
    )
    for left, right in merges:
        expr = f"replace({expr}, '{s}{left}{s}{s}{right}{s}', '{s}{left}{right}{s}')"
    vocab = bpe_vocab(merges)
    case = "CASE x " + " ".join(
        f"WHEN '{sym}' THEN {vid}" for sym, vid in vocab.items()
    ) + " END"
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    exp_rows = con.execute(f"""
        SELECT doc_id, list_transform(
                 list_filter(string_split({expr}, '{s}{s}'),
                             x -> x != '' AND x != '{g}'),
                 x -> CASE WHEN length(x) = 1 THEN CAST(unicode(x) AS BIGINT)
                           ELSE {case} END) AS ids
        FROM t ORDER BY doc_id
    """).fetchall()
    exp = {d: ids for d, ids in exp_rows}
    assert got == exp
    # spot-pin the id rule itself: 'ad' is a learned merge product
    assert ("a", "d") in merges
    ad_id = MERGE_ID_BASE + merges.index(("a", "d"))
    assert got[5] == [ord("a"), ord("d"), ad_id, ad_id, ad_id]
