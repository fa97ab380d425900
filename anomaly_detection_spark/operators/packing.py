"""Sequence packing: assign documents to fixed-token-budget packs
(context windows) — the batching step between curation and
tokenization in a pre-training pipeline.

Global bin-packing is inherently sequential, so the distributed shape
is the standard compromise: documents hash deterministically into
bounded packing GROUPS (portable 60-bit bucket — reproducible outside
Spark), and each group packs independently with a deterministic greedy
next-fit in id order. Only (id, group, token-count) rows reach Python
— token counting stays a JVM projection and the text never leaves the
scan — and each group's work is O(group size), so the stage scales as
ordinary bounded-group applyInPandas at any corpus size.

Next-fit is deliberately chosen over first-fit-decreasing: its state
is one (pack, fill) pair folded over the group's docs in id order,
which a recursive SQL CTE replays EXACTLY (the
``pack_sequences_documents`` oracle) — FFD's open-bin list state is
not practically SQL-replayable, and next-fit's packing efficiency is
within a few percent on document-length distributions.

Semantics (pinned by the oracle): docs ordered by id within a group
(the id column's NATIVE ordering — numeric for integer ids,
lexicographic for string ids; both engines agree on either); a doc
joins the current pack when ``fill + tokens <= max_tokens``, else
opens the next pack. A doc longer than ``max_tokens`` occupies a pack
alone (``overflow = true``) — splitting is tokenizer-dependent and out
of scope here.
"""

from __future__ import annotations

import math

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import BooleanType, IntegerType, LongType, StructField, StructType

from .sampling import split_bucket
from .text import token_count

__all__ = ["pack_sequences", "pack_summary"]

# pack ids are globally unique: group_id * _PACK_STRIDE + local pack idx
_PACK_STRIDE = 1_000_000
# auto-sizing target: when the caller leaves n_groups unset, groups are
# sized so roughly this many docs land in one applyInPandas task
_TARGET_ROWS_PER_GROUP = 1_000_000
# loud-failure backstop INSIDE the packing task: a group beyond this is
# a mis-sized n_groups (one Python task would chew through it serially)
# and fails fast instead of grinding — raise n_groups, don't raise this
_MAX_GROUP_ROWS = 8_000_000


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 2048,
    n_groups: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack",
    token_count_expr=None,
) -> DataFrame:
    """Per-doc pack assignment: ``(doc_id, group_id, pack_id, n_tokens,
    fill_after, overflow)``; ``doc_id`` keeps the INPUT column's type
    (string ids stay strings — no silent lossy cast).

    ``n_groups`` bounds per-group work (the group loop is O(docs in
    group)). When left ``None`` it is DERIVED from a corpus count so
    the default stays scale-safe: one extra count job sizes groups at
    ~1M docs each (min 32), instead of a fixed constant that would
    funnel 10^12/32 rows through single Python tasks. Either way a
    group that still exceeds ``_MAX_GROUP_ROWS`` fails loudly inside
    the task rather than packing for hours.

    ``token_count_expr`` overrides the sizing column (default:
    whitespace ``token_count``) — pass e.g.
    ``bpe.bpe_token_count(text_col, merges)`` to pack by real
    tokenizer counts; any bigint column expression works."""
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive: {max_tokens}")
    if n_groups is None:
        # one bounded count job (column-pruned to nothing by Catalyst);
        # the price of a scale-safe default when the caller didn't size
        n_groups = max(32, math.ceil(docs.count() / _TARGET_ROWS_PER_GROUP))
    id_type = docs.schema[id_col].dataType
    schema = StructType(
        [
            StructField("doc_id", id_type),
            StructField("group_id", IntegerType()),
            StructField("pack_id", LongType()),
            StructField("n_tokens", LongType()),
            StructField("fill_after", LongType()),
            StructField("overflow", BooleanType()),
        ]
    )
    tok = token_count(text_col) if token_count_expr is None else token_count_expr
    sized = docs.select(
        F.col(id_col).alias("doc_id"),
        (split_bucket(id_col, salt=salt, buckets=n_groups)).cast("int").alias("group_id"),
        tok.cast("bigint").alias("n_tokens"),
    )

    def pack_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        g = int(key[0])
        if len(pdf) > _MAX_GROUP_ROWS:
            raise ValueError(
                f"pack_sequences group {g} holds {len(pdf)} docs (> {_MAX_GROUP_ROWS}) — "
                f"raise n_groups (or let it default) so per-group work stays bounded"
            )
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        packs, fills, overflow = [], [], []
        pack, fill = 0, 0
        first = True
        for t in pdf["n_tokens"].astype(int):
            if first:
                fill = t
                first = False
            elif fill + t <= max_tokens:
                fill += t
            else:
                pack += 1
                fill = t
            if pack >= _PACK_STRIDE:
                raise ValueError(
                    f"group {g} exceeded {_PACK_STRIDE} packs — raise n_groups "
                    f"so per-group pack counts stay under the pack-id stride"
                )
            packs.append(g * _PACK_STRIDE + pack)
            fills.append(fill)
            overflow.append(t > max_tokens)
        out = pdf.copy()
        out["pack_id"] = packs
        out["fill_after"] = fills
        out["overflow"] = overflow
        return out[["doc_id", "group_id", "pack_id", "n_tokens", "fill_after", "overflow"]]

    return sized.groupBy("group_id").applyInPandas(
        lambda key, pdf: pack_group(key, pdf), schema
    )


def pack_summary(packed: DataFrame, max_tokens: int) -> DataFrame:
    """Per-pack utilization: ``(pack_id, n_docs, pack_tokens,
    util_e6)`` — the fill-efficiency report a packing pass is judged
    by (floor-scaled utilization, oracle-friendly)."""
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
        )
        .select(
            "pack_id",
            "n_docs",
            "pack_tokens",
            F.floor(F.col("pack_tokens") * 1000000 / max_tokens).cast("bigint").alias("util_e6"),
        )
    )
