"""Byte-pair-encoding tokenizer: learned merges, trained distributed,
applied as pure JVM string expressions.

A training-data pipeline packs and filters by TOKENS, not whitespace
words; this module provides a real learned-merges BPE so
``pack_sequences``/``curation_flags`` thresholds can mean what they
claim (reference counterpart: the reference engine has no tokenizer —
this is part of the LLM-pipeline extension surface, SURVEY.md §2-ext).

Representation trick (what keeps the hot path JVM-side): a symbol
sequence is encoded as ONE string — every symbol wrapped in a DOUBLE
separator (``␟␟a␟␟bc␟␟``, U+001F). Applying the merge (a, b) -> ab is
then the literal string replace ``␟a␟␟b␟`` -> ``␟ab␟``:

- replace() semantics (leftmost-first, non-overlapping, all
  occurrences) are EXACTLY BPE's single-merge application order, in
  Spark, DuckDB, and Python alike;
- the shared inner separator of back-to-back matches keeps runs
  correct (``aaaa`` + (a,a) -> ``aa aa``, ``aaa`` -> ``aa a``);
- a match cannot start mid-symbol (the pattern demands a separator
  immediately before the left symbol, and symbols never contain the
  separator);
- word gaps are a reserved pseudo-symbol (U+001E) that no trained
  merge can ever contain (training is per-word), so merges never
  cross word boundaries even though a whole document is one string.

Scale shape: training aggregates the corpus ONCE into a (word, count)
vocabulary — the only corpus-sized shuffle — and every merge iteration
touches just the vocabulary (pair explode + one hash aggregate + one
projection, persist-and-release like duplicate_clusters' label loop).
The chosen pair per iteration is a bounded one-row materialization
(model parameters, same class as the LIMIT-1 width probe in
similarity.py). Application is a chain of n_merges literal replace()
calls — whole-stage-codegen'd column expressions, no Python, no
shuffle, no state.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = [
    "SEP",
    "GAP",
    "bpe_train",
    "bpe_merge_pairs",
    "bpe_symbol_string",
    "bpe_token_count",
    "bpe_tokens",
    "bpe_vocab",
    "bpe_encode",
]

# id space: single-char symbols get their Unicode codepoint (full
# codepoint fallback — no OOV), merge products get MERGE_ID_BASE + the
# index of the FIRST merge producing that string (two merges can build
# the same string, e.g. (a,bc) and (ab,c) -> abc)
MERGE_ID_BASE = 0x110000  # max codepoint + 1

SEP = "\x1f"  # symbol separator (doubled between symbols)
GAP = "\x1e"  # word-gap pseudo-symbol; never part of any merge
_MAX_MERGES = 65536  # bounded-collect cap for bpe_merge_pairs


def bpe_symbol_string(text: Column | str) -> Column:
    """Encode a document as one separator-wrapped symbol string:
    reserved chars stripped, whitespace runs collapsed to the GAP
    pseudo-symbol, every remaining character an initial symbol.
    NULL/blank text encodes to the empty sequence (``␟␟``)."""
    t = F.col(text) if isinstance(text, str) else text
    t = F.regexp_replace(F.coalesce(t, F.lit("")), f"[{SEP}{GAP}]", "")
    t = F.regexp_replace(F.trim(t), r"\s+", GAP)
    return F.concat(F.lit(SEP + SEP), F.regexp_replace(t, "(.)", "$1" + SEP + SEP))


def _merge_search(left: str, right: str) -> str:
    return f"{SEP}{left}{SEP}{SEP}{right}{SEP}"


def _merge_replacement(left: str, right: str) -> str:
    return f"{SEP}{left}{right}{SEP}"


def bpe_train(
    docs: DataFrame,
    n_merges: int = 32,
    text_col: str = "text",
) -> DataFrame:
    """Learn a BPE merge table from a corpus: ``(merge_idx int,
    left string, right string)`` in learned order.

    Decision rule (pinned by the oracle's independent replay): each
    iteration merges the adjacent symbol pair with the highest
    occurrence-weighted count (overlapping adjacents all count:
    ``aaa`` contributes (a, a) twice); ties break to the
    lexicographically smallest (left, right). Training stops early
    when the best pair occurs fewer than 2 times. All counts are
    integers and ties are exact string comparisons, so every decision
    is engine-exact — no ulp rule needed.

    Scale: one corpus shuffle builds the (word, count) vocabulary;
    each merge iteration is a pair explode + hash aggregate over the
    vocabulary only. The per-iteration vocabulary is EAGERLY
    localCheckpoint'ed — truncating lineage every round, so plan size
    stays O(1) in the merge count instead of accumulating n nested
    expression trees (measured: an un-truncated 24-merge loop
    exhausts an 8g driver on plan state alone); superseded checkpoint
    blocks are released by the context cleaner. The winning pair is a
    one-row bounded collect."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be non-negative: {n_merges}")
    t = F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), f"[{SEP}{GAP}]", "")
    words = docs.select(
        F.explode(F.split(F.trim(t), r"\s+")).alias("_w")
    ).filter(F.col("_w") != "")
    vocab = (
        words.groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .select(
            F.concat(
                F.lit(SEP + SEP), F.regexp_replace(F.col("_w"), "(.)", "$1" + SEP + SEP)
            ).alias("_repr"),
            "_cnt",
        )
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            syms = F.filter(F.split(F.col("_repr"), SEP + SEP), lambda x: x != "")
            pairs = vocab.select(
                F.col("_cnt"),
                F.explode(
                    F.zip_with(
                        F.slice(syms, 1, F.greatest(F.size(syms) - 1, F.lit(0))),
                        F.slice(
                            syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))
                        ),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("_p"),
            )
            best = (
                pairs.groupBy(F.col("_p.l").alias("_l"), F.col("_p.r").alias("_r"))
                .agg(F.sum("_cnt").alias("_n"))
                .orderBy(F.col("_n").desc(), F.col("_l").asc(), F.col("_r").asc())
                .limit(1)
                .collect()
            )
            if not best or best[0]["_n"] < 2:
                break
            left, right = best[0]["_l"], best[0]["_r"]
            merges.append((left, right))
            # NOTE (r8 measurement): truncating only every K merges (plan
            # carries up to K nested replaces between checkpoints) was
            # tried and measured slightly SLOWER end-to-end — the
            # re-executed replace chains under the per-merge collect cost
            # more than the saved checkpoint jobs. Keep per-merge eager
            # truncation.
            vocab = vocab.select(
                F.replace(
                    F.col("_repr"),
                    F.lit(_merge_search(left, right)),
                    F.lit(_merge_replacement(left, right)),
                ).alias("_repr"),
                "_cnt",
            ).localCheckpoint()
    finally:
        try:
            vocab.unpersist(blocking=False)
        except Exception:  # noqa: BLE001 — best-effort release
            pass
    spark = docs.sparkSession
    return spark.createDataFrame(
        [(i, l, r) for i, (l, r) in enumerate(merges)],
        "merge_idx int, left string, right string",
    )


def bpe_merge_pairs(merges: DataFrame, max_merges: int = _MAX_MERGES) -> list[tuple[str, str]]:
    """Materialize a merge-table frame into the ordered pair list the
    application expressions need — a BOUNDED model-parameter collect
    (the table is n_merges rows by construction; the cap fails loudly
    if a caller points this at something that is not a merge table)."""
    rows = merges.orderBy("merge_idx").limit(max_merges + 1).collect()
    if len(rows) > max_merges:
        raise ValueError(f"merge table exceeds {max_merges} rows — not a BPE merge table?")
    return [(r["left"], r["right"]) for r in rows]


def bpe_token_count(text: Column | str, merges: list[tuple[str, str]]) -> Column:
    """BPE token count of a document as a pure column expression: the
    symbol-string encoding, one literal replace() per learned merge (in
    learned order), then separator arithmetic — symbols = double-sep
    boundaries minus one, minus the word-gap pseudo-symbols. NULL/blank
    text counts 0. Chained replaces stay inside whole-stage codegen; at
    10^12 docs this is a projection, not a job."""
    s = bpe_symbol_string(text)
    for left, right in merges:
        s = F.replace(
            s, F.lit(_merge_search(left, right)), F.lit(_merge_replacement(left, right))
        )
    n_bound = (F.length(s) - F.length(F.replace(s, F.lit(SEP), F.lit("")))) / 2
    n_gaps = F.length(s) - F.length(F.replace(s, F.lit(GAP), F.lit("")))
    return (n_bound - 1 - n_gaps).cast("bigint")


def bpe_tokens(
    docs: DataFrame,
    merges: DataFrame | list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BPE token counts ``(id_col, bpe_tokens)`` — the
    tokenizer-aware twin of ``text.token_count``."""
    pairs = merges if isinstance(merges, list) else bpe_merge_pairs(merges)
    return docs.select(
        F.col(id_col), bpe_token_count(text_col, pairs).alias("bpe_tokens")
    )


def bpe_vocab(merges: list[tuple[str, str]]) -> dict[str, int]:
    """The merged-symbol vocabulary: merge product -> MERGE_ID_BASE +
    first producing merge index. Single-char symbols are NOT listed —
    they encode as their Unicode codepoint (total function, no OOV)."""
    vocab: dict[str, int] = {}
    for i, (left, right) in enumerate(merges):
        vocab.setdefault(left + right, MERGE_ID_BASE + i)
    return vocab


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame | list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BPE token-ID sequences ``(id_col, token_ids
    array<bigint>)`` — what a training pipeline actually feeds the
    model. Ids per :func:`bpe_vocab`: codepoint for single-char
    symbols, MERGE_ID_BASE + merge index for merge products; word-gap
    pseudo-symbols are dropped. Pure column expressions: the chained
    replaces of :func:`bpe_token_count`, one split, one transform over
    a broadcast map literal — still no Python, no shuffle."""
    pairs = merges if isinstance(merges, list) else bpe_merge_pairs(merges)
    s = bpe_symbol_string(F.col(text_col))
    for left, right in pairs:
        s = F.replace(
            s, F.lit(_merge_search(left, right)), F.lit(_merge_replacement(left, right))
        )
    vocab = bpe_vocab(pairs)
    vmap = F.create_map(
        *[F.lit(x) for kv in vocab.items() for x in kv]
    ) if vocab else None
    syms = F.filter(F.split(s, SEP + SEP), lambda x: (x != "") & (x != GAP))
    sym_id = lambda x: (  # noqa: E731 — local id rule
        F.when(F.length(x) == 1, F.ascii(x).cast("bigint")).otherwise(
            F.element_at(vmap, x).cast("bigint") if vmap is not None else F.lit(None).cast("bigint")
        )
    )
    return docs.select(
        F.col(id_col), F.transform(syms, sym_id).alias("token_ids")
    )
