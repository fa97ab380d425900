"""Incremental validation via Structured Streaming (SURVEY.md §2.10).

The reference is batch-only, re-run on a 6-hour job trigger (reference
anomalydetection/detection.py:104,131-137). The Spark-native upgrade:
validate NEW document files/snapshots as they land, with the same rule
semantics, using a file-source stream + foreachBatch. On Iceberg the
source is ``spark.readStream.format("iceberg")`` over table snapshots;
locally it is a parquet directory source — the transformation code is
shared with the batch engine either way.

Two modes:
- ``stream_span_violations``: pure streaming projection/filter — span
  invariants are stateless per row, so they stream with no state store
  and no watermark at all.
- ``stream_incremental_suite``: foreachBatch — each micro-batch of new
  docs runs the stateless rules (spans, RI vs the static catalog) and
  appends verdicts/violations to the same lineage store as batch runs,
  keyed by (run_id=batch_id). Stateful rules (global uniqueness,
  drift) intentionally stay in the periodic batch pass: streaming
  global-dedup state over 10^12 keys is a state-store anti-pattern —
  the lineage table records which snapshots each pass covered.
- ``windowed_volume_stream``: event-time 24h windows + watermark for
  late data — the streaming analog of the completeness volume series
  (late-data tolerance mirrors the batch grace-period heuristic M6).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from anomaly_detection_spark.operators.referential import ri_violations
from anomaly_detection_spark.operators.spans import span_violations

DOC_DDL = (
    "doc_id string, partition_id int, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def read_document_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(DOC_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_span_violations(doc_stream: DataFrame) -> DataFrame:
    """Stateless streaming span-invariant violations (append mode)."""
    return span_violations(doc_stream)


def stream_incremental_suite(
    doc_stream: DataFrame,
    asset_catalog: DataFrame,
    store,
    checkpoint_dir: str,
) -> StreamingQuery:
    """foreachBatch incremental validation: per micro-batch, stateless
    rules run and verdicts/violations append to the shared lineage
    store. Exactly-once per batch via the streaming checkpoint +
    idempotent (run_id=batch) lineage keys."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        run_id = f"stream-{batch_id}"
        sv = span_violations(batch_df).withColumn("run_id", F.lit(run_id))
        riv = (
            ri_violations(batch_df, asset_catalog)
            .select(
                "doc_id",
                F.lit("ri.media_ref").alias("rule_id"),
                "partition_id",
                "offending_spans",
            )
            .withColumn("run_id", F.lit(run_id))
        )
        # both appends read the same rule output: persist it so the
        # span/RI rule evaluation over the micro-batch runs ONCE, not
        # once per sink (the violations write materializes the cache,
        # the counts aggregate then reads it)
        viol = sv.unionByName(riv).persist()
        try:
            store.append("_dq_violations", viol.repartition(4))
            counts = (
                viol.groupBy("partition_id", "rule_id")
                .agg(F.count(F.lit(1)).alias("n"))
                .select(
                    F.current_timestamp().alias("evaluated_at"),
                    F.lit(run_id).alias("run_id"),
                    F.lit("stream").alias("config_hash"),
                    F.col("partition_id").cast("int"),
                    "rule_id",
                    F.lit("Unhealthy").alias("status"),
                    F.create_map(F.lit("violations"), F.col("n").cast("string")).alias("metrics"),
                    F.lit(None).cast("string").alias("error_message"),
                    F.lit(None)
                    .cast(
                        "struct<impact_level:int,num_downstream_tables:int,num_queries_on_affected_tables:int>"
                    )
                    .alias("downstream_impact"),
                    F.lit(None).cast("map<string,map<string,string>>").alias("additional_debug_info"),
                )
            )
            store.append("_dq_lineage", counts.repartition(1))
        finally:
            viol.unpersist(blocking=False)

    return (
        doc_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _freshness_monitor(key, pdfs, state, threshold_sec: int, ts_col: str):
    """The per-group stateful fold behind :func:`stateful_freshness_stream`,
    extracted as a pure generator over (key, batches, GroupState) so the
    ``hasTimedOut`` branch is unit-testable with a fake GroupState —
    availableNow triggers can never idle a partition into a timeout
    inside a test run. State = (last commit epoch, total commits)."""
    import pandas as pd

    pid = int(key[0])
    if state.hasTimedOut:
        last_epoch, n = state.get
        state.setTimeoutDuration(threshold_sec * 1000)
        yield pd.DataFrame(
            [
                {
                    "partition_id": pid,
                    "last_commit": pd.Timestamp(last_epoch, unit="s"),
                    "n_commits": int(n),
                    "status": "Unhealthy",
                }
            ]
        )
        return
    mx = None
    n_new = 0
    for pdf in pdfs:
        n_new += len(pdf)
        m = pd.to_datetime(pdf[ts_col]).max()
        mx = m if mx is None else max(mx, m)
    prev_epoch, prev_n = state.get if state.exists else (None, 0)
    last_epoch = float(mx.timestamp()) if mx is not None else prev_epoch
    if prev_epoch is not None and (last_epoch is None or prev_epoch > last_epoch):
        last_epoch = prev_epoch
    n_total = int(prev_n) + n_new
    state.update((last_epoch, n_total))
    state.setTimeoutDuration(threshold_sec * 1000)
    yield pd.DataFrame(
        [
            {
                "partition_id": pid,
                "last_commit": pd.Timestamp(last_epoch, unit="s"),
                "n_commits": n_total,
                "status": "Healthy",
            }
        ]
    )


def stateful_freshness_stream(
    commit_stream: DataFrame,
    threshold_sec: int = 6 * 3600,
    partition_col: str = "partition_id",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState): a
    per-partition freshness monitor over a commit stream.

    State per partition = (last commit epoch, total commits seen). Each
    micro-batch folds its commits into the state and emits one status
    row; a processing-time timeout set to ``threshold_sec`` fires when a
    partition goes QUIET — the state handler runs with no new data and
    emits an Unhealthy staleness row. This is the streaming shape of
    the M2 constant-threshold freshness check: the batch engine
    evaluates staleness when a run happens; the stateful stream raises
    the alarm the moment the threshold lapses, with the state store (not
    a lineage read-back) carrying last-commit knowledge across
    triggers. Arrow-batched per group — never per-row Python. The fold
    itself lives in :func:`_freshness_monitor` (pure, fake-state
    testable)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "partition_id int, last_commit timestamp, n_commits long, status string"
    )
    state_schema = "last_epoch double, n long"

    def monitor(key, pdfs, state: GroupState):
        yield from _freshness_monitor(key, pdfs, state, threshold_sec, ts_col)

    return (
        commit_stream.select(F.col(partition_col).alias("partition_id"), F.col(ts_col))
        .groupBy("partition_id")
        .applyInPandasWithState(
            monitor,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def windowed_volume_stream(
    doc_stream_with_ts: DataFrame,
    watermark: str = "1 hour",
    window: str = "24 hours",
) -> DataFrame:
    """Event-time windowed doc volumes with late-data watermark — the
    streaming completeness series. Input needs an ``event_ts``
    timestamp column."""
    return (
        doc_stream_with_ts.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window).alias("w"), F.col("partition_id"))
        .agg(F.count(F.lit(1)).alias("volume"))
        .select(
            F.col("w.start").alias("window_start"),
            "partition_id",
            "volume",
        )
    )


def stream_exact_dedup(
    doc_stream_with_ts: DataFrame,
    text_col: str = "text",
    ts_col: str = "event_ts",
    watermark: str = "24 hours",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming exact-dedup WITHIN the watermark horizon: the first
    arrival of each normalized-md5 fingerprint passes, later copies
    inside the watermark are dropped (``dropDuplicatesWithinWatermark``
    — state per key is evicted once the watermark passes it, so state
    is bounded by the duplicate-burst horizon, not corpus history).

    This is deliberately NOT global streaming dedup: re-crawls and
    retry storms are temporally local, which is what this catches
    cheaply at ingest; corpus-wide dedup over 10^12 keys stays in the
    batch pass (:mod:`..operators.dedup`) per this module's design
    stance — a streaming state store is the wrong home for that much
    state."""
    from anomaly_detection_spark.operators.text import fingerprint

    # dropDuplicates treats NULL keys as equal, so a NULL fingerprint
    # (null text) would collapse every distinct metadata-only record
    # into one; give null-text rows a unique per-id sentinel key.
    fp = F.coalesce(
        fingerprint(text_col), F.concat(F.lit("∅:"), F.col(id_col).cast("string"))
    )
    return (
        doc_stream_with_ts.withColumn("_fp", fp)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )
