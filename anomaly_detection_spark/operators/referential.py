"""Referential integrity of span media_refs vs. the asset catalog
(SURVEY.md §2 J4 — generalizes the reference's "reference must resolve"
blast-radius lookup, reference anomalydetection/blast_radius.py:8-45,
which was a per-table REST call; here it is a real distributed join).

Plan shape (scale rationale):
1. ``explode`` only the media spans' refs, project two columns, and
   take ``distinct`` BEFORE the join — at 10^12 docs the distinct ref
   set is orders of magnitude smaller than the exploded span set, and
   the distinct is a partial-aggregating shuffle on the ref itself.
2. ``left_anti`` join the distinct refs against the catalog:
   broadcast when the catalog is small (the engine wraps it in
   ``F.broadcast``), otherwise Spark picks sort-merge and AQE handles
   skewed ref buckets.
3. Violation rows re-join the dangling set back to documents — a plain
   join that AQE turns into a broadcast when the set is actually small
   (it is data-dependent, so never force-broadcast) — and re-aggregate
   the offending spans per doc in document order, preserving
   span-sequence equality.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _media_refs(documents: DataFrame) -> DataFrame:
    """Distinct non-null, non-empty media_refs across all docs.

    Exploding ``arrays_zip(spans.kind, spans.media_ref)`` instead of the
    filtered full-struct array lets nested schema pruning drop the text
    payload from this scan entirely (ReadSchema =
    ``spans:array<struct<kind,media_ref>>`` — verified; the old
    ``F.filter`` higher-order lambda blocked pruning and read the whole
    struct). Text is the dominant bytes of the table, so the
    dangling-ref pass now reads a small fraction of it. The violation
    pass in :func:`ri_violations` still reads full spans — its OUTPUT
    is the offending span sequence, so those bytes are irreducible."""
    refs = (
        documents.select(
            F.explode(F.arrays_zip("spans.kind", "spans.media_ref")).alias("z")
        )
        .filter(F.col("z.kind").isNotNull() & (F.col("z.kind") == "media"))
        .select(F.col("z.media_ref").alias("media_ref"))
    )
    return refs.filter(F.col("media_ref").isNotNull() & (F.col("media_ref") != "")).distinct()


def dangling_refs(documents: DataFrame, catalog: DataFrame, broadcast_catalog: bool = True) -> DataFrame:
    """media_refs used by documents that do not exist in the catalog."""
    cat = catalog.select("media_ref")
    if broadcast_catalog:
        cat = F.broadcast(cat)
    return _media_refs(documents).join(cat, on="media_ref", how="left_anti")


def ri_violations(
    documents: DataFrame,
    catalog: DataFrame,
    broadcast_catalog: bool = True,
    broadcast_threshold_rows: int | None = 1_000_000,
    cache: list | None = None,
) -> DataFrame:
    """Violation rows: (doc_id, partition_id, offending_spans) where
    offending_spans is the in-order subsequence of spans whose media_ref
    is dangling (span-sequence parity per FIXTURES.md §1).

    The dangling set is data-dependent — at the planted 0.3% rate over
    10^12 docs it is ~10^9 rows, so an unconditional F.broadcast is an
    OOM. With ``broadcast_threshold_rows`` set, the set is persisted,
    counted (cheap: it is post-distinct, post-anti-join), and broadcast
    only when it fits; otherwise a plain join lets AQE/sort-merge handle
    it. Pass ``cache`` (a list) to receive the persisted DataFrame for
    release after materialization; with ``broadcast_threshold_rows=None``
    no count/persist happens at all."""
    dangling = dangling_refs(documents, catalog, broadcast_catalog)
    dang_set = dangling.select(F.col("media_ref").alias("_dangling_ref"))
    if broadcast_threshold_rows is not None:
        dang_set = dang_set.persist()
        if cache is not None:
            cache.append(dang_set)
        if dang_set.count() <= broadcast_threshold_rows:
            dang_set = F.broadcast(dang_set)
    # Explode to find affected docs cheaply, then re-filter the original
    # span array so offending spans stay in document order.
    #
    # Plan-shape note (measured, 16M docs @ local[8]): an alternative
    # that explodes only the nested-pruned spans.media_ref leaf (so
    # GenerateExec never duplicates the text payload) and then joins the
    # tiny hit set back against a single full-payload pass costs an
    # EXTRA pruned scan plus a count-guard sync, and measured ~25%
    # slower here — at this corpus's short span texts the explode's
    # payload duplication is cheaper than a second scan. For corpora
    # with kB-size texts the leaf-explode variant wins; revisit there.
    affected = (
        documents.select("doc_id", "partition_id", "spans", F.explode("spans").alias("span"))
        .join(dang_set, F.col("span.media_ref") == F.col("_dangling_ref"), "inner")
        .select("doc_id", "partition_id", "spans", F.col("span.media_ref").alias("_ref"))
        .groupBy("doc_id", "partition_id", "spans")
        .agg(F.collect_set("_ref").alias("_bad_refs"))
    )
    return affected.select(
        "doc_id",
        "partition_id",
        F.filter(
            "spans", lambda s: F.array_contains(F.col("_bad_refs"), s["media_ref"])
        ).alias("offending_spans"),
    )
