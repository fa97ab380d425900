"""Declarative rule DAG: compile rules → DataFrame plans → run with
per-partition verdicts, violation rows, and resumable checkpointing.

This replaces the reference's eager per-table driver loop (reference
anomalydetection/anomaly_detector.py:37-67 + 10-thread pools at
completeness_checker.py:153) with a single linear flow of lazy
DataFrame plans: every rule compiles to a plan over ONLY the pending
partitions, verdicts land in the lineage table (generalizing
LOGGING_TABLE_SCHEMA, anomalydetection/utils/logging_table_utils.py:
12-44), violations land in the violations table, and a killed run
resumes by anti-joining pending partitions against completed
(config_hash, partition_id, rule_id) lineage rows (SURVEY.md §3.5).

Crash consistency: for each rule, violations are written BEFORE the
lineage rows that mark (rule, partition) complete; readers treat a
violation row as authoritative only where a matching lineage row
exists, so a crash between the two writes re-runs the rule and the
orphaned violations are ignored (and deduplicated on read).
"""

from __future__ import annotations

import hashlib
import json
import uuid
from dataclasses import dataclass, field
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from anomaly_detection_spark.operators import verdict as V
from anomaly_detection_spark.operators.profile import ProfileSpec, profile_long
from anomaly_detection_spark.operators.referential import ri_violations
from anomaly_detection_spark.operators.spans import (
    RULE_KIND,
    RULE_MONOTONE,
    RULE_PAYLOAD,
    span_violations,
)
from anomaly_detection_spark.sources.catalog import LocalParquetCatalog

# Generalizes the reference LOGGING_TABLE_SCHEMA (anomalydetection/
# utils/logging_table_utils.py:12-44): downstream_impact struct and the
# nested additional_debug_info map ride on the per-partition 'overall'
# fold row; per-rule rows leave them null.
IMPACT_STRUCT = (
    "struct<impact_level:int,num_downstream_tables:int,num_queries_on_affected_tables:int>"
)
LINEAGE_SCHEMA = (
    "evaluated_at timestamp, run_id string, config_hash string, partition_id int, "
    "rule_id string, status string, metrics map<string,string>, error_message string, "
    f"downstream_impact {IMPACT_STRUCT}, "
    "additional_debug_info map<string,map<string,string>>"
)
RULE_OVERALL = "overall"
VIOLATIONS_SCHEMA = (
    "doc_id string, rule_id string, partition_id int, "
    "offending_spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "run_id string"
)

RULE_UNIQUE = "unique.doc_id"
RULE_RI = "ri.media_ref"
RULE_DRIFT = "drift.distribution"
SPAN_RULES = (RULE_MONOTONE, RULE_KIND, RULE_PAYLOAD)


@dataclass(frozen=True)
class Rule:
    """One declarative rule. ``kind`` ∈ {spans, uniqueness, referential,
    profile, completeness, freshness}; ``params`` are kind-specific and
    participate in the config hash (changing a param = a new run
    lineage, matching the reference's config-driven re-evaluation)."""

    kind: str
    params: dict[str, Any] = field(default_factory=dict)

    def canonical(self) -> str:
        return json.dumps({"kind": self.kind, "params": self.params}, sort_keys=True)


@dataclass
class RunResult:
    run_id: str
    config_hash: str
    verdicts: DataFrame
    violations: DataFrame
    skipped_pairs: int  # (rule, partition) pairs resumed from checkpoint


class RuleSuite:
    KNOWN_KINDS = (
        "spans", "uniqueness", "referential", "profile",
        "completeness", "freshness", "event_freshness", "drift",
    )

    def __init__(
        self,
        rules: list[Rule],
        eval_time: str = "2025-08-16 00:00:00",
        parallel_rules: int = 8,
        max_violations_per_pair: int | None = 100_000,
        fuse_doc_scan: bool | str = "auto",
    ):
        unknown = [r.kind for r in rules if r.kind not in self.KNOWN_KINDS]
        if unknown:
            raise ValueError(f"unknown rule kind(s) {unknown}; expected one of {self.KNOWN_KINDS}")
        self.rules = rules
        self.eval_time = eval_time
        # driver-side overlap of independent rule jobs; results are
        # identical at any value (appends are concurrency-safe). Default
        # submits EVERY independent rule concurrently and lets the Spark
        # scheduler arbitrate — measured ~7% faster warm suite than a
        # 4-slot pool at 1M docs/local[32] (commit rules no longer queue
        # behind the doc scans), identical results.
        self.parallel_rules = parallel_rules
        # cap on WRITTEN violation rows per (rule, partition): at 10^12
        # docs a single pathological key (the skew fixture) would emit
        # billions of example rows. Verdict metrics keep EXACT counts;
        # only the stored examples are deterministically down-sampled.
        # Operational knob — not part of the config hash.
        self.max_violations_per_pair = max_violations_per_pair
        # execution strategy only (identical results, asserted in
        # tests): run the span + uniqueness-violation rules from one
        # shared spans pass when their pending partition sets line up.
        # Measured on this host (16M docs, min-of-rounds): fused WINS at
        # local[2] (172.3 vs 182.3s — cores are scarce, halving the
        # spans BYTES READ dominates) and TIES at local[8] (60.9 vs
        # 60.6s — idle-core overlap of independent rule jobs soaks the
        # stalls the fused pass avoids). Default "auto" resolves at
        # run(): fuse iff defaultParallelism <= 4 — i.e. exactly the
        # regime where the measurement says bytes beat overlap. True/
        # False force it either way (True for IO-bound deployments —
        # cold object storage, saturated clusters — where total bytes,
        # not overlap, bounds throughput at ANY core count).
        self.fuse_doc_scan = fuse_doc_scan

    def config_hash(self) -> str:
        payload = json.dumps([r.canonical() for r in self.rules]) + self.eval_time
        return hashlib.sha256(payload.encode()).hexdigest()[:16]

    # JSON round-trip for spark-submit job parameters — the analog of the
    # reference's MetricConfig.to_dict/from_dict contract (reference
    # anomalydetection/metric_config.py:9-124, job params detection.py:
    # 96-102; interval-like values are plain seconds in params).
    def to_json(self) -> str:
        return json.dumps(
            {
                "eval_time": self.eval_time,
                "rules": [{"kind": r.kind, "params": r.params} for r in self.rules],
            },
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, payload: str) -> "RuleSuite":
        d = json.loads(payload)
        return cls(
            [Rule(r["kind"], r.get("params", {})) for r in d["rules"]],
            eval_time=d["eval_time"],
        )

    # ---- rule compilers: each returns (verdicts_df, violations_df|None) ----

    def _span_verdicts(self, viol: DataFrame, partitions: DataFrame) -> DataFrame:
        counts = viol.groupBy("partition_id", "rule_id").agg(F.count(F.lit(1)).alias("n_viol"))
        spine = partitions.crossJoin(
            F.broadcast(
                partitions.sparkSession.createDataFrame([(r,) for r in SPAN_RULES], "rule_id string")
            )
        )
        return spine.join(counts, on=["partition_id", "rule_id"], how="left").select(
            "partition_id",
            "rule_id",
            F.when(F.coalesce(F.col("n_viol"), F.lit(0)) > 0, F.lit(V.UNHEALTHY))
            .otherwise(F.lit(V.HEALTHY))
            .alias("status"),
            F.create_map(
                F.lit("violations"), F.coalesce(F.col("n_viol"), F.lit(0)).cast("string")
            ).alias("metrics"),
        )

    def _compile_spans(
        self, docs: DataFrame, partitions: DataFrame, rule: Rule
    ) -> tuple[DataFrame, DataFrame]:
        viol = span_violations(docs, use_pandas_udf=rule.params.get("use_pandas_udf", False))
        return self._span_verdicts(viol, partitions), viol

    def _uniqueness_parts(self, docs: DataFrame, rule: Rule) -> tuple[DataFrame, DataFrame, str]:
        """(per_pk persisted, dk = dup-key set [broadcast-hinted when it
        fits], key). per_pk comes from a 2-column pruned scan with
        map-side partial agg — the skewed hot key reduces to one row per
        task pre-shuffle."""
        key = rule.params.get("key", "doc_id")
        per_pk = (
            docs.groupBy("partition_id", key).agg(F.count(F.lit(1)).alias("n")).persist()
        )
        self._to_release.append(per_pk)
        dup_keys = (
            per_pk.groupBy(key)
            .agg(F.sum("n").alias("dup_count"))
            .filter(F.col("dup_count") > 1)
            .persist()
        )
        self._to_release.append(dup_keys)
        # COUNT-GUARDED broadcast: the dup-key set is data-dependent (at
        # 10^12 docs with the planted dup rate it is ~10^9 rows — an
        # unconditional F.broadcast would OOM the driver). The count is
        # one cheap agg over the already-persisted per_pk; below the
        # bound we broadcast (avoiding a full shuffle WRITE of the big
        # side — AQE's runtime conversion still pays that), above it we
        # fall back to a plain join and let AQE/sort-merge handle it.
        n_dup = dup_keys.count()
        bound = int(rule.params.get("broadcast_threshold_rows", 1_000_000))
        dk = F.broadcast(dup_keys) if n_dup <= bound else dup_keys
        return per_pk, dk, key

    def _uniqueness_verdicts(
        self, per_pk: DataFrame, dk: DataFrame, key: str, partitions: DataFrame
    ) -> DataFrame:
        """Per-partition uniqueness metrics/verdicts from the cached
        per-(partition, key) counts — re-aggregated two ways: per-key
        globally for duplicate detection (duplicates MAY span
        partitions), and per-partition for the metrics. The second
        shuffle moves only (key, n) pairs, never the documents."""
        flagged = per_pk.join(
            dk.select(key, F.lit(1).alias("_dup")), on=key, how="left"
        )
        metrics = flagged.groupBy("partition_id").agg(
            F.sum("n").alias("total_rows"),
            F.count(F.lit(1)).alias("distinct_keys"),
            F.sum(F.when(F.col("_dup").isNotNull(), 1).otherwise(0)).alias("duplicate_keys"),
            F.sum(F.when(F.col("_dup").isNotNull(), F.col("n")).otherwise(0)).alias("duplicate_rows"),
        )
        verdicts = partitions.join(metrics, on="partition_id", how="left").select(
            "partition_id",
            F.lit(RULE_UNIQUE).alias("rule_id"),
            F.when(F.coalesce(F.col("duplicate_keys"), F.lit(0)) > 0, F.lit(V.UNHEALTHY))
            .otherwise(F.lit(V.HEALTHY))
            .alias("status"),
            F.map_from_arrays(
                F.array(F.lit("total_rows"), F.lit("distinct_keys"), F.lit("duplicate_keys"), F.lit("duplicate_rows")),
                F.array(
                    F.coalesce(F.col("total_rows"), F.lit(0)).cast("string"),
                    F.coalesce(F.col("distinct_keys"), F.lit(0)).cast("string"),
                    F.coalesce(F.col("duplicate_keys"), F.lit(0)).cast("string"),
                    F.coalesce(F.col("duplicate_rows"), F.lit(0)).cast("string"),
                ),
            ).alias("metrics"),
        )
        return verdicts

    def _compile_uniqueness(
        self, docs: DataFrame, partitions: DataFrame, rule: Rule
    ) -> tuple[DataFrame, DataFrame]:
        per_pk, dk, key = self._uniqueness_parts(docs, rule)
        verdicts = self._uniqueness_verdicts(per_pk, dk, key, partitions)
        viol = docs.join(dk.select(key), on=key, how="inner").select(
            F.col(key).alias("doc_id"),
            F.lit(RULE_UNIQUE).alias("rule_id"),
            "partition_id",
            F.col("spans").alias("offending_spans"),
        )
        return verdicts, viol

    def _compile_referential(
        self, docs: DataFrame, partitions: DataFrame, rule: Rule, catalog: DataFrame
    ) -> tuple[DataFrame, DataFrame]:
        viol = ri_violations(
            docs,
            catalog,
            broadcast_catalog=rule.params.get("broadcast_catalog", True),
            broadcast_threshold_rows=int(rule.params.get("broadcast_threshold_rows", 1_000_000)),
            cache=self._to_release,
        ).select(
            "doc_id", F.lit(RULE_RI).alias("rule_id"), "partition_id", "offending_spans"
        )
        return self._ri_verdicts(viol, partitions), viol

    def _ri_verdicts(self, viol: DataFrame, partitions: DataFrame) -> DataFrame:
        counts = viol.groupBy("partition_id").agg(F.count(F.lit(1)).alias("n_viol"))
        return partitions.join(counts, on="partition_id", how="left").select(
            "partition_id",
            F.lit(RULE_RI).alias("rule_id"),
            F.when(F.coalesce(F.col("n_viol"), F.lit(0)) > 0, F.lit(V.UNHEALTHY))
            .otherwise(F.lit(V.HEALTHY))
            .alias("status"),
            F.create_map(F.lit("violations"), F.coalesce(F.col("n_viol"), F.lit(0)).cast("string")).alias(
                "metrics"
            ),
        )

    def _compile_docscan_fused(
        self,
        docs: DataFrame,
        partitions: DataFrame,
        rules: dict[str, Rule],
        catalog: DataFrame | None,
    ) -> dict[str, tuple[DataFrame, DataFrame | None]]:
        """ONE shared pass over the spans column for the span-invariant
        and uniqueness-violation rules.

        Unfused, the spans column — the dominant bytes of the table — is
        read separately by the span rule and by the uniqueness violation
        join-back. Fused: the cheap pruned prerequisite still runs
        (per-key counts on a 2-column scan), then a SINGLE spans-reading
        pass — enriched with the count-guarded dup-key broadcast — gates
        each doc (short-circuiting exists / dup flag) and materializes
        both rules' offending span subsequences at once.

        Referential integrity deliberately does NOT fuse: its membership
        test against the data-dependent dangling-ref set is only cheap
        as a broadcast hash JOIN on exploded refs; inlining it as an
        array_contains against a collected ref array costs
        O(|dangling|) per span — quadratic in data size (measured 3-4x
        slower at 1M docs) — so RI keeps its standalone two-phase plan.
        Per-rule outputs (verdicts, violation slices) are identical to
        the unfused compilers — checkpointing, resume, and the
        correctness gate see no difference."""
        from anomaly_detection_spark.operators.spans import (
            _per_rule_indexes,
            any_span_violation,
        )

        out: dict[str, tuple[DataFrame, DataFrame | None]] = {}
        enriched = docs.select("doc_id", "partition_id", "spans")
        gates = []
        per_pk = dk = key = None
        if "uniqueness" in rules:
            per_pk, dk, key = self._uniqueness_parts(docs, rules["uniqueness"])
            enriched = enriched.join(
                dk.select(F.col(key), F.lit(1).alias("_dup")), on=key, how="left"
            )
            gates.append(F.col("_dup").isNotNull())
        if "spans" in rules:
            gates.append(any_span_violation("spans"))
        gate = gates[0]
        for g in gates[1:]:
            gate = gate | g
        flagged = enriched.filter(gate)

        # each branch carries an explicit `keep` flag: span rules keep a
        # row iff it has offending spans; the uniqueness rule keeps every
        # duplicate-key doc even when its spans array is empty or null —
        # matching the unfused violation join exactly (which writes
        # whatever the doc's spans column holds)
        branches = []
        if "spans" in rules:
            for rid in SPAN_RULES:
                idxs = _per_rule_indexes(F.col("spans"), rid)
                off = F.transform(idxs, lambda j: F.element_at(F.col("spans"), j + 1))
                branches.append(
                    F.struct(
                        F.lit(rid).alias("rule_id"),
                        off.alias("offending_spans"),
                        (F.size(off) > 0).alias("keep"),
                    )
                )
        if "uniqueness" in rules:
            branches.append(
                F.struct(
                    F.lit(RULE_UNIQUE).alias("rule_id"),
                    F.col("spans").alias("offending_spans"),
                    F.col("_dup").isNotNull().alias("keep"),
                )
            )
        viol_all = (
            flagged.select("doc_id", "partition_id", F.explode(F.array(*branches)).alias("r"))
            .filter(F.col("r.keep"))
            .select(
                "doc_id",
                "partition_id",
                F.col("r.rule_id").alias("rule_id"),
                F.col("r.offending_spans").alias("offending_spans"),
            )
            .persist()
        )
        self._to_release.append(viol_all)
        viol_all.count()  # materialize the single shared scan here

        if "spans" in rules:
            sv = viol_all.filter(F.col("rule_id").isin(list(SPAN_RULES)))
            out["spans"] = (self._span_verdicts(sv, partitions), sv)
        if "uniqueness" in rules:
            uv = viol_all.filter(F.col("rule_id") == RULE_UNIQUE)
            out["uniqueness"] = (self._uniqueness_verdicts(per_pk, dk, key, partitions), uv)
        return out

    def _compile_profile(self, docs: DataFrame, rule: Rule) -> tuple[DataFrame, None]:
        null_rate_max = rule.params.get("null_rate_max")
        # size via the offset LEAF, not the struct: size(spans) forces the
        # scan to decode every span field including the dominant text
        # payload; size(spans.offset) nested-prunes the ReadSchema to one
        # int leaf (same value — field extraction preserves array length
        # and nullness). At 100 TB this is the difference between a
        # metadata-ish pass and a full-table decode.
        flat = docs.select(
            "partition_id",
            F.col("doc_id"),
            F.size("spans.offset").alias("n_spans"),
        )
        specs = [ProfileSpec("doc_id"), ProfileSpec("n_spans", numeric=True)]
        prof = profile_long(flat, specs, by=["partition_id"])
        status = F.lit(V.HEALTHY)
        if null_rate_max is not None:
            status = F.when(
                F.col("metrics").getItem("null_rate").cast("double") > null_rate_max,
                F.lit(V.UNHEALTHY),
            ).otherwise(F.lit(V.HEALTHY))
        verdicts = prof.select(
            "partition_id",
            F.concat(F.lit("profile."), F.col("column_name")).alias("rule_id"),
            status.alias("status"),
            F.col("metrics"),
        )
        return verdicts, None

    def _compile_drift(
        self,
        spark: SparkSession,
        docs: DataFrame,
        partitions: DataFrame,
        rule: Rule,
        store: LocalParquetCatalog,
    ) -> tuple[DataFrame, None]:
        """A12: distribution drift of a per-doc expression vs the PREVIOUS
        run's histogram for the same rule, read back from the lineage
        table (latest-row-per-group over past runs, any config hash —
        runs at different eval_times hash differently by design). The
        current histogram is stored in the verdict's metrics as JSON so
        the next run can compare against it. First run → Unknown."""
        from anomaly_detection_spark.operators.drift import histogram_sketch, psi_ks

        # default reads only the offset leaf (same value as size(spans),
        # nested-prunes away the text payload — see _compile_profile)
        value_expr = rule.params.get("value_expr", "size(spans.offset)")
        lo = float(rule.params.get("lo", 0.0))
        hi = float(rule.params.get("hi", 16.0))
        n_buckets = int(rule.params.get("n_buckets", 16))
        psi_threshold = float(rule.params.get("psi_threshold", 0.2))
        ks_threshold = float(rule.params.get("ks_threshold", 0.2))

        cur = histogram_sketch(
            docs.select("partition_id", F.expr(value_expr).cast("double").alias("_v")),
            "_v",
            lo,
            hi,
            n_buckets,
            by=["partition_id"],
        ).persist()
        self._to_release.append(cur)

        cur_json = (
            cur.groupBy("partition_id")
            .agg(
                F.to_json(
                    F.map_from_entries(
                        F.sort_array(F.collect_list(F.struct(F.col("bucket"), F.col("count"))))
                    )
                ).alias("hist_json")
            )
        )

        # previous-run read is bounded by a lookback (default 90 days):
        # on a date-partitioned lineage table this partition-prunes to a
        # constant number of runs instead of scanning the full history;
        # a baseline older than the bound degrades to Unknown, which is
        # the honest verdict for a table that hasn't been checked in
        # months anyway.
        baseline_days = int(rule.params.get("baseline_lookback_days", 90))
        prev = None
        if store.exists("_dq_lineage", spark):
            eval_lit = F.to_timestamp(F.lit(self.eval_time))
            lineage = store.read(spark, "_dq_lineage", LINEAGE_SCHEMA).filter(
                (F.col("rule_id") == RULE_DRIFT)
                & (F.col("evaluated_at") < eval_lit)
                & (F.col("evaluated_at") >= F.date_sub(eval_lit, baseline_days))
                & F.col("metrics").getItem("histogram").isNotNull()
            )
            latest = V.latest_per_group(lineage, ["partition_id"], "evaluated_at")
            prev = latest.select(
                "partition_id",
                F.explode(
                    F.from_json(F.col("metrics").getItem("histogram"), "map<string,bigint>")
                ).alias("bucket", "count"),
            ).withColumn("bucket", F.col("bucket").cast("int"))
            if prev.isEmpty():
                prev = None

        if prev is None:
            verdicts = partitions.join(cur_json, "partition_id", "left").select(
                "partition_id",
                F.lit(RULE_DRIFT).alias("rule_id"),
                F.lit(V.UNKNOWN).alias("status"),
                F.map_from_arrays(
                    F.array(F.lit("error_code"), F.lit("histogram")),
                    F.array(F.lit("NOT_ENOUGH_DATA"), F.coalesce(F.col("hist_json"), F.lit("{}"))),
                ).alias("metrics"),
            )
            return verdicts, None

        scored = psi_ks(prev, cur, by=["partition_id"], n_buckets=n_buckets)
        verdicts = (
            partitions.join(scored, "partition_id", "left")
            .join(cur_json, "partition_id", "left")
            .select(
                "partition_id",
                F.lit(RULE_DRIFT).alias("rule_id"),
                F.when(
                    (F.col("psi") > psi_threshold) | (F.col("ks") > ks_threshold),
                    F.lit(V.UNHEALTHY),
                )
                .when(F.col("psi").isNull(), F.lit(V.UNKNOWN))
                .otherwise(F.lit(V.HEALTHY))
                .alias("status"),
                F.map_from_arrays(
                    F.array(F.lit("psi"), F.lit("ks"), F.lit("histogram")),
                    F.array(
                        F.round("psi", 6).cast("string"),
                        F.round("ks", 6).cast("string"),
                        F.coalesce(F.col("hist_json"), F.lit("{}")),
                    ),
                ).alias("metrics"),
            )
        )
        return verdicts, None

    def _compile_commit_rules(
        self, commits: DataFrame, rule: Rule, partitions: DataFrame, events: DataFrame | None = None
    ) -> tuple[DataFrame, None]:
        eval_time = F.to_timestamp(F.lit(self.eval_time))
        all_parts = partitions
        if rule.kind == "event_freshness":
            # M4/M5: event-latency freshness — the reference always runs
            # the commit AND event paths together (freshness_utils.py:
            # 661-752); the suite mirrors that with a dedicated rule kind.
            from anomaly_detection_spark.operators.freshness import event_freshness_verdicts

            v = event_freshness_verdicts(
                commits,
                events,
                eval_time,
                latency_threshold_sec=rule.params.get("latency_threshold_sec"),
                num_std=rule.params.get("num_std", 3.0),
            )
            verdicts = v.select(
                "partition_id",
                "rule_id",
                "status",
                F.map_from_arrays(
                    F.array(
                        F.lit("last_event"),
                        F.lit("actual_latency_sec"),
                        F.lit("predicted_upper_bound_latency_sec"),
                    ),
                    F.array(
                        F.col("last_event").cast("string"),
                        F.col("actual_latency_sec").cast("string"),
                        F.col("predicted_upper_bound_latency_sec").cast("string"),
                    ),
                ).alias("metrics"),
            )
        elif rule.kind == "completeness":
            from anomaly_detection_spark.operators.completeness import completeness_verdicts

            v = completeness_verdicts(
                commits,
                eval_time,
                threshold_override=rule.params.get("threshold_override"),
                lookback_days=rule.params.get("lookback_days", 14),
                num_std=rule.params.get("num_std", 3.0),
            )
            verdicts = v.select(
                "partition_id",
                "rule_id",
                "status",
                F.map_from_arrays(
                    F.array(F.lit("last_window_row_volume"), F.lit("predicted_row_volume_lower_bound")),
                    F.array(
                        F.col("last_window_row_volume").cast("string"),
                        F.col("predicted_row_volume_lower_bound").cast("string"),
                    ),
                ).alias("metrics"),
            )
        else:
            from anomaly_detection_spark.operators.freshness import freshness_verdicts

            v = freshness_verdicts(
                commits,
                eval_time,
                constant_threshold_sec=rule.params.get("constant_threshold_sec"),
                lookback_days=rule.params.get("lookback_days", 14),
                num_std=rule.params.get("num_std", 3.0),
            )
            verdicts = v.select(
                "partition_id",
                "rule_id",
                "status",
                F.map_from_arrays(
                    F.array(F.lit("last_data_update"), F.lit("upper_bound"), F.lit("staleness_age_seconds")),
                    F.array(
                        F.col("last_data_update").cast("string"),
                        F.col("predicted_upper_bound_next_data_update").cast("string"),
                        F.col("staleness_age_seconds").cast("string"),
                    ),
                ).alias("metrics"),
            )
        # Partitions with no usable history inside the window still get a
        # verdict row (Unknown / NOT_ENOUGH_DATA — parity with reference
        # completeness_utils.py:118: guard failures emit UNKNOWN, not
        # silence) so they checkpoint and don't re-run forever.
        rule_id = {
            "completeness": "completeness.volume",
            "freshness": "freshness.commit",
            "event_freshness": "freshness.event",
        }[rule.kind]
        verdicts = all_parts.join(verdicts, on="partition_id", how="left").select(
            "partition_id",
            F.coalesce(F.col("rule_id"), F.lit(rule_id)).alias("rule_id"),
            F.coalesce(F.col("status"), F.lit(V.UNKNOWN)).alias("status"),
            F.coalesce(
                F.col("metrics"),
                F.create_map(F.lit("error_code"), F.lit("NOT_ENOUGH_DATA")),
            ).alias("metrics"),
        )
        return verdicts, None

    # ---- runner ----

    def run(
        self,
        spark: SparkSession,
        documents: DataFrame,
        asset_catalog: DataFrame | None = None,
        commits: DataFrame | None = None,
        store: LocalParquetCatalog | None = None,
        run_id: str | None = None,
        events: DataFrame | None = None,
        lineage_edges: DataFrame | None = None,
        queries_per_table: DataFrame | None = None,
    ) -> RunResult:
        run_id = run_id or uuid.uuid4().hex[:12]
        cfg = self.config_hash()
        store = store or LocalParquetCatalog("/tmp/adspark_store")
        # intermediate persisted DataFrames released at the end of the run
        # (rule compilers cache re-used aggregates; leaking them across
        # runs in one long-lived session accumulates executor memory)
        self._to_release: list[DataFrame] = []

        # Checkpoint state is read ONCE per run and reduced driver-side:
        # it is tiny (one row per partition × rule), and doing the
        # bookkeeping in Python avoids ~4 extra Spark jobs per rule.
        if store.exists("_dq_lineage", spark):
            # error rows (error_message set) are RETRYABLE — only real
            # verdicts checkpoint; guard-degraded Unknowns (e.g.
            # NOT_ENOUGH_DATA with no error_message) are durable verdicts
            # every row of one config shares evaluated_at == eval_time
            # (eval_time is hashed into the config), so the timestamp
            # predicate is a free partition-pruning filter on a
            # date-partitioned Iceberg lineage table — the read stays
            # O(one run) as the table accumulates thousands of runs
            completed_rows = (
                store.read(spark, "_dq_lineage", LINEAGE_SCHEMA)
                .filter(
                    (F.col("evaluated_at") == F.to_timestamp(F.lit(self.eval_time)))
                    & (F.col("config_hash") == cfg)
                    & F.col("error_message").isNull()
                )
                .select("partition_id", "rule_id")
                .distinct()
                .collect()
            )
        else:
            completed_rows = []
        completed_by_rule: dict[str, set] = {}
        for r in completed_rows:
            completed_by_rule.setdefault(r.rule_id, set()).add(r.partition_id)

        # one column-pruned scan for the partition list (partition-key
        # column only → Iceberg/parquet reads metadata + one column)
        all_parts = sorted(
            r.partition_id for r in documents.select("partition_id").distinct().collect()
        )
        commit_parts: list | None = None

        eval_ts = F.to_timestamp(F.lit(self.eval_time))
        new_verdicts: list[DataFrame] = []
        skipped_total = 0
        pending_work: list[tuple[Rule, list]] = []
        for rule in self.rules:
            rule_ids = {
                "spans": list(SPAN_RULES),
                "uniqueness": [RULE_UNIQUE],
                "referential": [RULE_RI],
                "profile": ["profile.doc_id", "profile.n_spans"],
                "completeness": ["completeness.volume"],
                "freshness": ["freshness.commit"],
                "event_freshness": ["freshness.event"],
                "drift": [RULE_DRIFT],
            }[rule.kind]

            if rule.kind in ("completeness", "freshness", "event_freshness"):
                if commits is None:
                    raise ValueError(f"rule kind '{rule.kind}' requires a commits DataFrame")
                if rule.kind == "event_freshness" and events is None:
                    raise ValueError("rule kind 'event_freshness' requires an events DataFrame")
                if commit_parts is None:
                    commit_parts = sorted(
                        r.partition_id for r in commits.select("partition_id").distinct().collect()
                    )
                universe = commit_parts
            else:
                universe = all_parts

            # A partition is fully done for this rule iff ALL the rule's
            # rule_ids are checkpointed for it.
            fully_done_parts = {
                p
                for p in universe
                if all(p in completed_by_rule.get(rid, ()) for rid in rule_ids)
            }
            skipped_total += len(fully_done_parts)
            pending = [p for p in universe if p not in fully_done_parts]
            if not pending:
                continue
            pending_work.append((rule, pending))

        # Independent rules execute as CONCURRENT Spark jobs from a small
        # driver pool (Spark job submission is thread-safe): each rule's
        # scans/shuffles AND its store writes run fully in parallel —
        # appends are concurrency-safe (one fresh subdirectory / Iceberg
        # snapshot commit per append). Only the drift rule's read of the
        # lineage table takes a lock, so its file listing isn't racing a
        # concurrent append's directory creation. This replaces the
        # reference's per-table driver thread pool
        # (completeness_checker.py:153); correctness never depends on
        # the pool — parallel_rules=1 is identical.
        import threading
        from concurrent.futures import ThreadPoolExecutor

        write_lock = threading.Lock()

        import os
        import time as _time

        timing = os.environ.get("ADSPARK_TIMING") == "1"

        def _pruned_docs(pending: list) -> DataFrame:
            docs = documents
            if len(pending) < len(all_parts):
                # partition pruning: on a partition-keyed table this
                # predicate prunes file groups at the scan
                docs = docs.filter(F.col("partition_id").isin(pending))
            return docs

        def execute(rule: Rule, pending: list) -> DataFrame:
            _t0 = _time.time()
            if rule.kind in ("completeness", "freshness", "event_freshness"):
                src = commits
                ev_src = events
                if len(pending) < len(commit_parts or []):
                    src = src.filter(F.col("partition_id").isin(pending))
                    if ev_src is not None:
                        ev_src = ev_src.filter(F.col("partition_id").isin(pending))
                spine = spark.createDataFrame([(p,) for p in pending], "partition_id int")
                verdicts, viol = self._compile_commit_rules(src, rule, spine, events=ev_src)
            else:
                docs = _pruned_docs(pending)
                spine = spark.createDataFrame([(p,) for p in pending], "partition_id int")
                if rule.kind == "spans":
                    verdicts, viol = self._compile_spans(docs, spine, rule)
                elif rule.kind == "uniqueness":
                    verdicts, viol = self._compile_uniqueness(docs, spine, rule)
                elif rule.kind == "referential":
                    if asset_catalog is None:
                        raise ValueError("rule kind 'referential' requires an asset_catalog DataFrame")
                    verdicts, viol = self._compile_referential(docs, spine, rule, asset_catalog)
                elif rule.kind == "profile":
                    verdicts, viol = self._compile_profile(docs, rule)
                elif rule.kind == "drift":
                    with write_lock:  # drift reads the lineage table
                        verdicts, viol = self._compile_drift(spark, docs, spine, rule, store)
                else:
                    raise ValueError(f"unknown rule kind: {rule.kind}")
            return write_outputs(rule.kind, verdicts, viol, _t0)

        def write_outputs(kind_label: str, verdicts: DataFrame, viol: DataFrame | None, _t0: float) -> DataFrame:
            lineage_rows = verdicts.select(
                eval_ts.alias("evaluated_at"),
                F.lit(run_id).alias("run_id"),
                F.lit(cfg).alias("config_hash"),
                F.col("partition_id").cast("int"),
                "rule_id",
                "status",
                "metrics",
                F.lit(None).cast("string").alias("error_message"),
                F.lit(None).cast(IMPACT_STRUCT).alias("downstream_impact"),
                F.lit(None).cast("map<string,map<string,string>>").alias("additional_debug_info"),
            )
            # materialize the heavy plans OUTSIDE the write lock:
            # violations feed both the write and the verdict counts, so
            # one persist covers both; verdict rows are tiny
            if viol is not None:
                viol = viol.persist()
            lineage_rows = lineage_rows.persist()
            lineage_rows.count()
            if timing:
                print(f"[adspark] {kind_label} compute {_time.time()-_t0:.2f}s", flush=True)
                _t0 = _time.time()
            if viol is not None:
                to_write = viol
                cap = self.max_violations_per_pair
                if cap is not None:
                    # deterministic hash-threshold down-sampling per
                    # (rule, partition): no window over a skewed key, no
                    # hot reducer — a broadcast of per-pair counts plus a
                    # row-local hash test
                    counts = viol.groupBy("partition_id", "rule_id").agg(
                        F.count(F.lit(1)).alias("_n")
                    )
                    to_write = viol.join(
                        F.broadcast(counts), ["partition_id", "rule_id"]
                    ).filter(
                        (F.col("_n") <= cap)
                        | (
                            # hash includes the span payload: duplicate-key
                            # violations share doc_id, and a doc_id-only
                            # hash would keep all-or-none of a hot key.
                            # NO run_id in the hash: the sample must be a
                            # pure function of the data so identical runs
                            # (e.g. at two cluster sizes) store identical
                            # example sets — and retries stay idempotent.
                            F.pmod(
                                F.xxhash64("doc_id", "offending_spans"),
                                F.lit(1_000_000),
                            )
                            < F.lit(1_000_000.0) * F.lit(float(cap)) / F.col("_n")
                        )
                    ).drop("_n")
                # repartition before write: violations are a tiny
                # filtered set — the scan's task count would produce
                # hundreds of near-empty files
                store.append(
                    "_dq_violations",
                    to_write.withColumn("run_id", F.lit(run_id)).repartition(8),
                )
            store.append("_dq_lineage", lineage_rows.repartition(1))
            if viol is not None:
                viol.unpersist()
            lineage_rows.unpersist()
            if timing:
                print(f"[adspark] {kind_label} writes {_time.time()-_t0:.2f}s", flush=True)
            return lineage_rows

        def degrade(rule: Rule, pending: list, e: Exception) -> DataFrame:
            """M16: write Unknown verdicts with an error code + clipped
            message for a failed rule's pending partitions."""
            from anomaly_detection_spark.functions.errors import (
                clip_error_message,
                match_error_message_to_code,
            )

            code = match_error_message_to_code(str(e)).value
            msg = clip_error_message(str(e))
            rid = {
                "spans": RULE_MONOTONE,
                "uniqueness": RULE_UNIQUE,
                "referential": RULE_RI,
                "profile": "profile.doc_id",
                "completeness": "completeness.volume",
                "freshness": "freshness.commit",
                "event_freshness": "freshness.event",
                "drift": RULE_DRIFT,
            }[rule.kind]
            rows = spark.createDataFrame(
                [
                    (None, run_id, cfg, int(p), rid, V.UNKNOWN, {"error_code": code}, msg, None, None)
                    for p in pending
                ],
                LINEAGE_SCHEMA,
            ).withColumn("evaluated_at", eval_ts)
            rows = rows.select(
                "evaluated_at", "run_id", "config_hash", "partition_id",
                "rule_id", "status", "metrics", "error_message",
                "downstream_impact", "additional_debug_info",
            )
            store.append("_dq_lineage", rows.repartition(1))
            return rows

        def execute_safe(rule: Rule, pending: list) -> DataFrame:
            """Reference parity (M16, completeness_checker.py:123-135):
            a rule failure degrades to Unknown verdicts with an error
            code + clipped message for its pending partitions — the run
            and the other rules proceed. Input-contract errors (missing
            commits/catalog) still raise: they are config bugs."""
            try:
                return execute(rule, pending)
            except ValueError:
                raise
            except Exception as e:  # noqa: BLE001 — by design
                return degrade(rule, pending, e)

        def execute_fused_safe(frules: list[Rule], pending: list) -> DataFrame:
            """One shared spans pass for the doc-scanning violation
            rules; per-rule outputs written exactly as the unfused path
            would. A failure degrades ALL fused rules (M16) — the run
            retries them (unfused or fused) next time."""
            try:
                _t0 = _time.time()
                docs = _pruned_docs(pending)
                spine = spark.createDataFrame([(p,) for p in pending], "partition_id int")
                outs = self._compile_docscan_fused(
                    docs, spine, {r.kind: r for r in frules}, asset_catalog
                )
                if timing:
                    print(f"[adspark] fused({','.join(sorted(outs))}) scan {_time.time()-_t0:.2f}s", flush=True)
                last = None
                for r in frules:
                    verdicts, viol = outs[r.kind]
                    last = write_outputs(r.kind, verdicts, viol, _time.time())
                return last
            except ValueError:
                raise
            except Exception as e:  # noqa: BLE001 — by design
                last = None
                for r in frules:
                    last = degrade(r, pending, e)
                return last

        if pending_work:
            # Fuse the doc-scanning violation rules into one shared scan
            # when their pending partition sets line up (the common
            # fresh-run case); partial resumes fall back to per-rule
            # plans, which are correctness-identical.
            fusable = [
                (r, p)
                for (r, p) in pending_work
                if r.kind in ("spans", "uniqueness")
            ]
            fuse = self.fuse_doc_scan
            if fuse == "auto":
                # bytes-vs-overlap tradeoff (see __init__): fuse when
                # cores are scarce, overlap when they're plentiful
                fuse = spark.sparkContext.defaultParallelism <= 4
            fuse_ok = (
                fuse
                and len(fusable) >= 2
                and len({tuple(p) for _, p in fusable}) == 1
                and all(
                    not r.params.get("use_pandas_udf", False)
                    for r, _ in fusable
                    if r.kind == "spans"
                )
                and all(
                    r.params.get("key", "doc_id") == "doc_id"
                    for r, _ in fusable
                    if r.kind == "uniqueness"
                )
            )
            tasks = []
            if fuse_ok:
                frules = [r for r, _ in fusable]
                fpending = fusable[0][1]
                fused_ids = {id(r) for r in frules}
                tasks.append(lambda: execute_fused_safe(frules, fpending))
                rest = [(r, p) for (r, p) in pending_work if id(r) not in fused_ids]
            else:
                rest = pending_work
            tasks.extend(
                (lambda r=r, p=p: execute_safe(r, p)) for r, p in rest
            )
            workers = min(self.parallel_rules, len(tasks))
            if workers <= 1:
                new_verdicts = [t() for t in tasks]
            else:
                with ThreadPoolExecutor(max_workers=workers) as pool:
                    new_verdicts = list(pool.map(lambda t: t(), tasks))

        for df in self._to_release:
            df.unpersist()
        self._to_release = []

        lineage_all = store.read(spark, "_dq_lineage", LINEAGE_SCHEMA).filter(
            (F.col("evaluated_at") == F.to_timestamp(F.lit(self.eval_time)))
            & (F.col("config_hash") == cfg)
        )
        # latest verdict per (partition, rule); on evaluated_at ties a
        # healed (non-error) verdict beats a retryable error row
        from pyspark.sql import Window as _W

        w = _W.partitionBy("partition_id", "rule_id").orderBy(
            F.col("evaluated_at").desc(),
            F.col("error_message").isNull().desc(),
            F.col("run_id").desc(),
        )

        def latest_of(df: DataFrame) -> DataFrame:
            return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")

        # M10 parity: one 'overall' fold row per partition — worst-of all
        # rule statuses (reference freshness_info.py:103-114), carrying
        # the nested per-rule debug map (logging_table_utils.py:36-39)
        # and the downstream-impact struct (M17, freshness_checker.py:
        # 506) when a lineage graph is provided.
        #
        # The fold is ALWAYS recomputed from the latest per-rule rows and
        # stored overall rows NEVER feed the returned result: a crashed
        # partial run can leave a stale overall row (folded over fewer
        # rules) that ties the fresh one on evaluated_at, where the
        # random run_id tiebreak would pick it ~50% of the time. The
        # store append still happens only when new work ran (or nothing
        # was stored yet), keeping the lineage append rate bounded.
        lineage_rules = lineage_all.filter(F.col("rule_id") != RULE_OVERALL)
        latest_rules = latest_of(lineage_rules)
        folded = V.fold_group_status(latest_rules, ["partition_id"])
        by_key = lambda l, r: F.when(l["key"] < r["key"], -1).when(l["key"] > r["key"], 1).otherwise(0)  # noqa: E731
        debug = latest_rules.groupBy("partition_id").agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(F.struct(F.col("rule_id").alias("key"), F.col("metrics").alias("value"))),
                    by_key,
                )
            ).alias("additional_debug_info"),
            F.count(F.lit(1)).cast("string").alias("_n_rules"),
        )
        overall = folded.join(debug, "partition_id", "left")
        if lineage_edges is not None and queries_per_table is not None:
            from anomaly_detection_spark.operators.blast_radius import (
                downstream_impact as _impact,
            )

            overall = overall.join(
                _impact(overall.select("partition_id"), lineage_edges, queries_per_table),
                "partition_id",
                "left",
            )
        else:
            overall = overall.withColumn(
                "downstream_impact", F.lit(None).cast(IMPACT_STRUCT)
            )
        overall_rows = overall.select(
            eval_ts.alias("evaluated_at"),
            F.lit(run_id).alias("run_id"),
            F.lit(cfg).alias("config_hash"),
            F.col("partition_id").cast("int"),
            F.lit(RULE_OVERALL).alias("rule_id"),
            F.col("overall_status").alias("status"),
            F.create_map(F.lit("rules_evaluated"), F.col("_n_rules")).alias("metrics"),
            F.lit(None).cast("string").alias("error_message"),
            "downstream_impact",
            "additional_debug_info",
        )
        # short-circuit: when work ran this run we append regardless, so
        # only the nothing-pending resume path pays the stored-overall
        # existence probe (an eager isEmpty job)
        if pending_work or lineage_all.filter(F.col("rule_id") == RULE_OVERALL).isEmpty():
            store.append("_dq_lineage", overall_rows.repartition(1))
        lineage_all = lineage_rules.unionByName(overall_rows)

        latest = latest_of(lineage_all)
        # impact desc participates in the display sort (reference
        # common_utils.py:35-91); only overall rows carry impact — the
        # null-to-lowest rule keeps per-rule rows stably ordered
        verdicts_sorted = V.sort_verdicts(latest, impact_col="downstream_impact.impact_level")
        violations = store.read(spark, "_dq_violations", VIOLATIONS_SCHEMA)
        # authoritative violations: only where a lineage row marks the
        # (rule, partition) complete, deduped per doc/rule
        violations = violations.join(
            lineage_all.select("partition_id", "rule_id").distinct(),
            on=["partition_id", "rule_id"],
            how="left_semi",
        ).dropDuplicates(["doc_id", "rule_id", "partition_id"])
        return RunResult(run_id, cfg, verdicts_sorted, violations, skipped_total)


def default_suite(eval_time: str = "2025-08-16 00:00:00") -> RuleSuite:
    """The full flagship rule suite (SURVEY.md §3.5)."""
    return RuleSuite(
        [
            Rule("profile"),
            Rule("uniqueness"),
            Rule("referential"),
            Rule("spans"),
            Rule("completeness"),
            Rule("freshness"),
            Rule("event_freshness"),
            Rule("drift"),
        ],
        eval_time=eval_time,
    )
