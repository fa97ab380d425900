"""Oracle-portable interleaved-documents construction.

Derives the engine's input shape (BASELINE.json input_hint:
``doc_id:string, spans:array<struct<kind,text,media_ref,offset:int>>``)
deterministically from the driver's ``documents`` parquet table using
ONLY constructs with exact DuckDB twins — modular arithmetic on the
numeric doc_id, whitespace token split, string concatenation. This lets
the driver's correctness gate validate the engine's span-invariant and
suite verdicts end-to-end: the Spark side builds the table with these
expressions and runs the REAL operators; the DuckDB oracle rebuilds the
identical table in SQL and recomputes the expected violations
independently (see ``__spark_entry__.oracle_sql``).

The xxhash64-based generator in :mod:`.synthetic` remains the scale
fixture (it generates 10^12 docs clusterside with no driver data); this
module exists for cross-engine verifiability, with the same planted
violation taxonomy (FIXTURES.md §1):

  hot doc_id      d % 50 == 23  → 'doc-hot' (global-uniqueness skew key)
  dup doc_id      d % 61 == 19  → previous row's id
  bad kind        d % 97 == 5   → victim even (text) span kind='bogus'
  empty text      d % 89 == 7   → victim even span text=''
  empty media_ref d % 83 == 11  → victim odd (media) span ref=''
  dangling ref    d % 79 == 13  → victim odd span ref='missing-<d>'
  non-monotone    d % 71 == 17  → victim span (idx>=1) offset negated
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

N_PARTITIONS = 8
N_ASSETS = 240

MOD_HOT, R_HOT = 50, 23
MOD_DUP, R_DUP = 61, 19
MOD_BAD_KIND, R_BAD_KIND = 97, 5
MOD_EMPTY_TEXT, R_EMPTY_TEXT = 89, 7
MOD_EMPTY_REF, R_EMPTY_REF = 83, 11
MOD_DANGLING, R_DANGLING = 79, 13
MOD_NONMONO, R_NONMONO = 71, 17


def interleaved_from_corpus(docs: DataFrame) -> DataFrame:
    """documents(doc_id bigint, text) → interleaved spans table:
    (doc_id string, partition_id int, src_id bigint, spans array<struct>).

    ``src_id`` is the original numeric id — planted duplicate ids make
    ``doc_id`` non-unique by design, so downstream checks that need a
    per-source-row identity carry src_id through."""
    d = F.col("doc_id").cast("bigint")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    nt = F.greatest(F.size(toks), F.lit(1))
    n = (d % 6) + 2  # spans per doc in [2, 7]

    sid = (
        F.when(d % MOD_HOT == R_HOT, F.lit("doc-hot"))
        .when((d % MOD_DUP == R_DUP) & (d > 0), F.concat(F.lit("doc-"), (d - 1).cast("string")))
        .otherwise(F.concat(F.lit("doc-"), d.cast("string")))
    )
    pid = (d % N_PARTITIONS).cast("int")

    # victim span indexes: vt = an even (text) position, vm = an odd
    # (media) position, va = any position >= 1 (monotone needs a prior)
    vt = 2 * (d % F.floor((n + 1) / 2))
    vm = 2 * (d % F.floor(n / 2)) + 1
    va = 1 + (d % (n - 1))

    def one_span(j: Column) -> Column:
        even = j % 2 == 0
        kind = (
            F.when((d % MOD_BAD_KIND == R_BAD_KIND) & (j == vt), F.lit("bogus"))
            .when(even, F.lit("text"))
            .otherwise(F.lit("media"))
        )
        token = F.coalesce(F.element_at(toks, (1 + (d + j) % nt).cast("int")), F.lit("tok"))
        text = (
            F.when(~even, F.lit(None).cast("string"))
            .when((d % MOD_EMPTY_TEXT == R_EMPTY_TEXT) & (j == vt), F.lit(""))
            .otherwise(F.concat(token, F.lit("-s"), j.cast("string")))
        )
        ref = (
            F.when(even, F.lit(None).cast("string"))
            .when((d % MOD_EMPTY_REF == R_EMPTY_REF) & (j == vm), F.lit(""))
            .when(
                (d % MOD_DANGLING == R_DANGLING) & (j == vm),
                F.concat(F.lit("missing-"), d.cast("string")),
            )
            .otherwise(F.concat(F.lit("asset-"), ((d * 7 + j) % N_ASSETS).cast("string")))
        )
        base = j * 16 + (d + j) % 8
        offset = F.when((d % MOD_NONMONO == R_NONMONO) & (j == va), -base).otherwise(base)
        return F.struct(
            kind.alias("kind"),
            text.alias("text"),
            ref.alias("media_ref"),
            offset.cast("int").alias("offset"),
        )

    # NOTE: the planted string id must NOT be aliased to 'doc_id' in the
    # same select that builds spans — Spark's lateral column alias
    # resolution would rebind the span expressions' doc_id references to
    # the new STRING alias instead of the child's BIGINT column.
    built = docs.select(
        sid.alias("_sid"),
        pid.alias("partition_id"),
        d.alias("src_id"),
        F.transform(F.sequence(F.lit(0).cast("bigint"), n - 1), one_span).alias("spans"),
    )
    return built.select(
        F.col("_sid").alias("doc_id"), "partition_id", "src_id", "spans"
    )


def portable_asset_catalog(spark: SparkSession, n_assets: int = N_ASSETS) -> DataFrame:
    """Catalog covering every non-planted media_ref: asset-0..asset-N-1."""
    return spark.range(n_assets).select(
        F.concat(F.lit("asset-"), F.col("id").cast("string")).alias("media_ref")
    )


def canonical_spans(spans_col) -> Column:
    """Deterministic one-string rendering of a span array — 'kind|text|
    media_ref|offset' joined by ';', nulls as '∅' — so complex span
    sequences survive the driver's sort/hash canonicalization and can be
    string-compared against a DuckDB-built twin."""
    return F.array_join(
        F.transform(
            spans_col if isinstance(spans_col, Column) else F.col(spans_col),
            lambda s: F.concat_ws(
                "|",
                F.coalesce(s["kind"], F.lit("∅")),
                F.coalesce(s["text"], F.lit("∅")),
                F.coalesce(s["media_ref"], F.lit("∅")),
                F.coalesce(s["offset"].cast("string"), F.lit("∅")),
            ),
        ),
        ";",
    )
