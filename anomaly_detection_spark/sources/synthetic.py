"""Deterministic synthetic input tables (FIXTURES.md schemas, seed-fixed).

Everything is generated as *pure column expressions over spark.range* —
no driver-side arrays, no numpy — so the identical code generates (and
the engine validates) 10^12 documents on a real cluster: `spark.range`
is split into tasks, every value is a deterministic function of
(seed, row id) via xxhash64, and no collect happens anywhere.

Violation plants follow FIXTURES.md §1 and are decided by
``pmod(xxhash64(tag, seed, id), 1_000_000) < rate*1_000_000`` so
expected outputs are computable independently (tests recompute them
with plain Python/pandas at small n).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

# Plant rates (per million) — FIXTURES.md §1.
RATE_DUP_DOC_ID = 2_000  # 0.002
RATE_BAD_KIND = 1_000  # 0.001
RATE_EMPTY_TEXT = 2_000  # 0.002
RATE_EMPTY_MEDIA_REF = 2_000  # 0.002
RATE_DANGLING_MEDIA_REF = 3_000  # 0.003
RATE_NONMONOTONE_OFFSET = 2_000  # 0.002
RATE_HOT_DOC_ID = 10_000  # 0.01 — skew fixture (SURVEY.md §2 A11)

MILLION = 1_000_000

SPAN_KINDS = ("text", "media")


def _h(tag: str, seed: int, *cols: Column) -> Column:
    """Deterministic non-negative 64-bit hash of (tag, seed, *cols)."""
    return F.pmod(F.xxhash64(F.lit(tag), F.lit(seed), *cols), F.lit(MILLION))


def _hmod(tag: str, seed: int, mod: int, *cols: Column) -> Column:
    return F.pmod(F.xxhash64(F.lit(tag), F.lit(seed), *cols), F.lit(mod))


def _pmod60(tag: str, seed: int, mod: int, *cols: Column) -> Column:
    """Portable (md5-derived, 60-bit) twin of :func:`_hmod`: hashes the
    string ``tag:seed:col1:...`` with md5 and folds the first 15 hex
    chars to a positive BIGINT — bit-identical in DuckDB as
    ``('0x' || substr(md5(s), 1, 15))::BIGINT % mod``. Used by the
    ``portable=True`` fixture variants so their DuckDB oracles can
    replay every planted decision exactly; xxhash64 stays the default
    (one 64-bit mix vs a full md5 digest — ~4x cheaper at scale)."""
    s = F.concat_ws(":", F.lit(tag), F.lit(str(seed)), *[c.cast("string") for c in cols])
    return F.pmod(F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint"), F.lit(mod))


def documents_interleaved(
    spark: SparkSession,
    n_docs: int,
    n_partitions: int = 8,
    n_assets: int = 1024,
    seed: int = 42,
    plant_violations: bool = True,
) -> DataFrame:
    """Interleaved text+media documents table (BASELINE.json input_hint).

    Schema: doc_id:string, partition_id:int,
            spans:array<struct<kind:string,text:string,media_ref:string,offset:int>>

    With ``plant_violations=False`` the table is clean (property tests:
    clean data => zero violations).
    """
    df = spark.range(n_docs).withColumnRenamed("id", "i")
    i = F.col("i")

    hot = _h("hot", seed, i) < F.lit(RATE_HOT_DOC_ID if plant_violations else 0)
    dup = _h("dup", seed, i) < F.lit(RATE_DUP_DOC_ID if plant_violations else 0)
    # Duplicate doc_id points at the previous row's id (wraps at 0).
    doc_id = (
        F.when(hot, F.lit("doc-hot"))
        .when(dup & (i > 0), F.format_string("doc-%012d", i - 1))
        .otherwise(F.format_string("doc-%012d", i))
    )
    partition_id = F.when(hot, F.lit(0)).otherwise(_hmod("part", seed, n_partitions, i).cast("int"))

    n_spans = (_hmod("nspan", seed, 12, i) + 1).cast("int")  # U[1,12]

    # Per-doc plant decisions; the affected span index is hash-picked.
    bad_kind_doc = _h("badkind", seed, i) < F.lit(RATE_BAD_KIND if plant_violations else 0)
    empty_text_doc = _h("emptytext", seed, i) < F.lit(RATE_EMPTY_TEXT if plant_violations else 0)
    empty_ref_doc = _h("emptyref", seed, i) < F.lit(RATE_EMPTY_MEDIA_REF if plant_violations else 0)
    dangling_doc = _h("dangling", seed, i) < F.lit(RATE_DANGLING_MEDIA_REF if plant_violations else 0)
    nonmono_doc = _h("nonmono", seed, i) < F.lit(RATE_NONMONOTONE_OFFSET if plant_violations else 0)
    victim = _hmod("victim", seed, 12, i)  # span index targeted by plants (mod n_spans below)

    def build_spans(doc_i: Column) -> Column:
        idx = F.sequence(F.lit(0), n_spans - 1)
        vic = F.pmod(victim, n_spans.cast("bigint"))

        def one_span(j: Column) -> Column:
            # Interleave: even positions text, odd positions media — then
            # a deterministic per-span flip for variety.
            is_text = F.pmod(j + _hmod("kindflip", seed, 2, doc_i, j), F.lit(2)) == 0
            kind = (
                F.when(bad_kind_doc & (j == vic), F.format_string("kind-%d", _hmod("badkindval", seed, 7, doc_i)))
                .when(is_text, F.lit("text"))
                .otherwise(F.lit("media"))
            )
            body = F.format_string(
                "tok%d tok%d tok%d span%d",
                _hmod("w0", seed, 5000, doc_i, j),
                _hmod("w1", seed, 5000, doc_i, j),
                _hmod("w2", seed, 5000, doc_i, j),
                j,
            )
            text = (
                F.when(~is_text, F.lit(None).cast("string"))
                .when(empty_text_doc & (j == vic), F.lit(""))
                .otherwise(body)
            )
            media_ref = (
                F.when(is_text, F.lit(None).cast("string"))
                .when(empty_ref_doc & (j == vic), F.lit(""))
                .when(dangling_doc & (j == vic), F.format_string("missing-%06d", _hmod("dangval", seed, 999983, doc_i)))
                .otherwise(F.format_string("asset-%08d", _hmod("asset", seed, n_assets, doc_i, j)))
            )
            base_offset = (j * 16 + _hmod("joff", seed, 8, doc_i, j)).cast("int")
            offset = F.when(nonmono_doc & (j == vic) & (j > 0), (-base_offset).cast("int")).otherwise(base_offset)
            return F.struct(
                kind.alias("kind"),
                text.alias("text"),
                media_ref.alias("media_ref"),
                offset.alias("offset"),
            )

        return F.transform(idx, one_span)

    return df.select(
        doc_id.alias("doc_id"),
        partition_id.alias("partition_id"),
        build_spans(i).alias("spans"),
    )


def asset_catalog(spark: SparkSession, n_assets: int = 1024, seed: int = 42) -> DataFrame:
    """Referential-integrity target (FIXTURES.md §2); covers every
    non-planted media_ref emitted by :func:`documents_interleaved`."""
    df = spark.range(n_assets)
    i = F.col("id")
    return df.select(
        F.format_string("asset-%08d", i).alias("media_ref"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (_hmod("ak", seed, 3, i) + 1).cast("int")).alias("asset_kind"),
        (1024 + _hmod("sz", seed, 10_000_000, i)).alias("size_bytes"),
    )


def commits_log(
    spark: SparkSession,
    n_partitions: int = 8,
    days: int = 30,
    commits_per_day: int = 4,
    seed: int = 42,
    now_epoch: int = 1_755_302_400,  # 2025-08-16T00:00:00Z — fixed "now" for determinism
    portable: bool = False,
) -> DataFrame:
    """Synthetic commit/snapshot log (FIXTURES.md §3) mirroring the
    reference's DESCRIBE HISTORY contract (reference:
    anomalydetection/utils/table_history_utils.py:65-67,100-102).

    With ``portable=True`` every hash-derived decision (timestamp
    jitter, operation kind, row volume, empty-write plant) uses the
    md5-based :func:`_pmod60` instead of xxhash64, so a DuckDB oracle
    can regenerate the log bit-exactly — this is what lets the
    freshness/completeness VERDICT pipelines (not just their model
    cores) be value-checked end-to-end. Scenario plants are identical.

    Planted scenarios by partition_id:
      - pid 0: healthy regular cadence
      - pid 1: stopped stream — no commits in the last 3 days (stale)
      - pid 2: volume drop — last 24h bucket at ~5% of normal (unhealthy
        completeness per reference completeness_utils.py:221-227)
      - pid 3: static — last commit > 30 days old (healthy short-circuit,
        reference freshness_utils.py:459-485)
      - others: healthy, with per-partition phase jitter
    Also plants non-update operations and all-zero "empty writes" that
    the filters must drop (reference table_history_utils.py:117-131).
    """
    hmod = _pmod60 if portable else _hmod
    total = n_partitions * days * commits_per_day
    df = spark.range(total)
    i = F.col("id")
    pid = (i % n_partitions).cast("int")
    slot = (i / n_partitions).cast("bigint")  # 0 .. days*commits_per_day-1, oldest first
    day = (slot / commits_per_day).cast("bigint")
    step = F.lit(86_400 // commits_per_day)
    age = (F.lit(days * commits_per_day).cast("bigint") - slot) * step
    jitter = hmod("cjit", seed, 600, i)
    ts_epoch = F.lit(now_epoch) - age + jitter
    # pid 3 static: shift everything 40 days back. pid 1: drop last 3 days.
    ts_epoch = F.when(pid == 3, ts_epoch - F.lit(40 * 86_400)).otherwise(ts_epoch)

    keep = ~((pid == 1) & (day >= days - 3))

    op = (
        F.when(hmod("nonupd", seed, MILLION, i) < 30_000, F.lit("OPTIMIZE"))  # 3% non-update ops → filtered out
        .when(hmod("opk", seed, 4, i) == 0, F.lit("MERGE"))
        .when(hmod("opk", seed, 4, i) == 1, F.lit("STREAMING UPDATE"))
        .otherwise(F.lit("WRITE"))
    )
    base_rows = (800 + hmod("rows", seed, 400, i)).cast("bigint")
    last_day = day == days - 1
    rows = F.when((pid == 2) & last_day, (base_rows / 20).cast("bigint")).otherwise(base_rows)
    empty_write = hmod("empty", seed, MILLION, i) < 20_000  # 2% all-zero writes → filtered out
    zero = F.lit("0")
    metrics = F.when(
        empty_write,
        F.create_map(F.lit("numFiles"), zero, F.lit("numOutputRows"), zero, F.lit("numOutputBytes"), zero),
    ).otherwise(
        F.when(
            op == "MERGE",
            F.create_map(
                F.lit("numTargetRowsInserted"), rows.cast("string"),
                F.lit("numDeletedRows"), F.lit("0"),
                F.lit("numFiles"), F.lit("4"),
                F.lit("numOutputBytes"), (rows * 100).cast("string"),
            ),
        ).otherwise(
            F.create_map(
                F.lit("numOutputRows"), rows.cast("string"),
                F.lit("numFiles"), F.lit("4"),
                F.lit("numOutputBytes"), (rows * 100).cast("string"),
            )
        )
    )
    return (
        df.filter(keep)
        .select(
            pid.alias("partition_id"),
            F.to_timestamp(F.from_unixtime(ts_epoch)).alias("timestamp"),
            op.alias("operation"),
            metrics.alias("operationMetrics"),
        )
    )


def events_log(
    spark: SparkSession,
    n_partitions: int = 8,
    days: int = 30,
    commits_per_day: int = 4,
    seed: int = 42,
    now_epoch: int = 1_755_302_400,
) -> DataFrame:
    """Synthetic per-partition event stream for event-latency freshness
    (M4/M5): each commit's payload events arrive ~20min (± deterministic
    jitter) before the commit timestamp, so the planted commit scenarios
    (stopped stream on pid 1, static pid 3) carry through to the event
    path."""
    commits = commits_log(spark, n_partitions, days, commits_per_day, seed, now_epoch)
    lag = 1200 + _hmod("evlag", seed, 600, F.unix_timestamp("timestamp"))
    return commits.select(
        "partition_id",
        F.to_timestamp(F.from_unixtime(F.unix_timestamp("timestamp") - lag)).alias("event_ts"),
    )


def lineage_edges(spark: SparkSession, n_partitions: int = 8) -> DataFrame:
    """Deterministic 1-hop lineage graph: partition p feeds downstream
    table 100 + (p % 5) — the input for blast-radius impact (M17)."""
    df = spark.range(n_partitions)
    return df.select(
        F.col("id").cast("int").alias("src"),
        (100 + F.col("id") % 5).cast("int").alias("dst"),
    )


def queries_per_table(spark: SparkSession) -> DataFrame:
    """Query counts per downstream table, chosen to cross every impact
    threshold (30/300/3000 → levels 1-4)."""
    df = spark.range(5)
    counts = F.element_at(
        F.array(F.lit(10), F.lit(50), F.lit(400), F.lit(3500), F.lit(0)),
        (F.col("id") + 1).cast("int"),
    )
    return df.select((100 + F.col("id")).cast("int").alias("table"), counts.alias("num_queries"))
