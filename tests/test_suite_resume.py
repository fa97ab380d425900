"""End-to-end rule-suite + checkpoint/resume tests (SURVEY.md §5 item 4)."""

import pyspark.sql.functions as F
import pytest

from anomaly_detection_spark.plans.suite import Rule, RuleSuite, default_suite
from anomaly_detection_spark.sources.catalog import LocalParquetCatalog
from anomaly_detection_spark.sources.synthetic import (
    asset_catalog,
    commits_log,
    documents_interleaved,
    events_log,
)


@pytest.fixture()
def inputs(spark):
    docs = documents_interleaved(spark, 4000, n_partitions=4, seed=42)
    return docs, asset_catalog(spark, 1024), commits_log(spark, 4), events_log(spark, 4)


def test_full_suite_and_resume_no_recompute(spark, inputs, tmp_path):
    docs, cat, commits, events = inputs
    store = LocalParquetCatalog(str(tmp_path / "store"))
    suite = default_suite()
    r1 = suite.run(spark, docs, cat, commits, store=store, events=events)
    v1 = sorted(
        (r["partition_id"], r["rule_id"], r["status"]) for r in r1.verdicts.collect()
    )
    assert r1.skipped_pairs == 0
    assert len(v1) > 0

    r2 = suite.run(spark, docs, cat, commits, store=store, events=events)
    v2 = sorted(
        (r["partition_id"], r["rule_id"], r["status"]) for r in r2.verdicts.collect()
    )
    # zero recompute: every (rule, partition) pair skipped, verdicts identical
    assert r2.skipped_pairs > 0
    assert v1 == v2
    # no duplicate lineage rows for the same (partition, rule)
    lineage = store.read(spark, "_dq_lineage")
    dupes = (
        lineage.groupBy("partition_id", "rule_id", "config_hash")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dupes == 0


def test_resume_after_partial_run(spark, inputs, tmp_path):
    """Simulated kill after k rules: pre-populate the store with the
    lineage of a prefix of the suite (same config hash — the prefix run
    writes under the FULL suite's hash, exactly what a crashed full run
    leaves behind), then run the full suite → completed pairs skipped,
    final verdicts identical to an uninterrupted fresh run."""
    docs, cat, commits, events = inputs
    full = default_suite()

    # crashed run: execute only the first two rules, writing lineage
    # under the full suite's config hash
    store = LocalParquetCatalog(str(tmp_path / "store"))
    crashed = RuleSuite(full.rules[:2], eval_time=full.eval_time)
    crashed.config_hash = full.config_hash  # same config identity
    c = crashed.run(spark, docs, cat, commits, store=store, events=events)
    n_completed = (
        store.read(spark, "_dq_lineage").select("partition_id", "rule_id").distinct().count()
    )
    assert n_completed > 0

    # resumed full run on the crashed store
    r = full.run(spark, docs, cat, commits, store=store, events=events)
    assert r.skipped_pairs > 0

    # uninterrupted reference run on a fresh store
    rf = full.run(spark, docs, cat, commits, store=LocalParquetCatalog(str(tmp_path / "fresh")), events=events)
    a = sorted((x["partition_id"], x["rule_id"], x["status"]) for x in r.verdicts.collect())
    b = sorted((x["partition_id"], x["rule_id"], x["status"]) for x in rf.verdicts.collect())
    assert a == b


def test_violations_match_plants_exactly(spark, tmp_path):
    """Property check: every planted violation produces exactly one
    violation row; plants are recomputed independently in Python."""
    import pandas as pd

    n = 5000
    docs = documents_interleaved(spark, n, n_partitions=4, seed=42)
    pdf = docs.toPandas()

    # independent recompute of expected violating doc_ids from the data
    # itself (not the generator's plant logic)
    exp_kind, exp_payload, exp_mono = set(), set(), set()
    for _, row in pdf.iterrows():
        prev = None
        for j, s in enumerate(row["spans"]):
            if s["kind"] not in ("text", "media"):
                exp_kind.add(row["doc_id"])
            elif s["kind"] == "text" and (s["text"] is None or s["text"] == ""):
                exp_payload.add(row["doc_id"])
            elif s["kind"] == "media" and (s["media_ref"] is None or s["media_ref"] == ""):
                exp_payload.add(row["doc_id"])
            if prev is not None and s["offset"] <= prev["offset"]:
                exp_mono.add(row["doc_id"])
            prev = s

    from anomaly_detection_spark.operators.spans import (
        RULE_KIND,
        RULE_MONOTONE,
        RULE_PAYLOAD,
        span_violations,
    )

    got = span_violations(docs).toPandas()
    got_by_rule = {r: set(g["doc_id"]) for r, g in got.groupby("rule_id")}
    assert got_by_rule.get(RULE_KIND, set()) == exp_kind
    assert got_by_rule.get(RULE_PAYLOAD, set()) == exp_payload
    assert got_by_rule.get(RULE_MONOTONE, set()) == exp_mono
    assert len(exp_kind) > 0 and len(exp_payload) > 0 and len(exp_mono) > 0


def test_drift_rule_across_runs(spark, tmp_path):
    """Drift rule: first run Unknown (baseline stored), same-distribution
    rerun Healthy, shifted-distribution rerun Unhealthy."""
    import pyspark.sql.functions as F

    store = LocalParquetCatalog(str(tmp_path / "drift_store"))
    docs = documents_interleaved(spark, 4000, n_partitions=4, seed=42)

    r1 = RuleSuite([Rule("drift")], eval_time="2025-08-15 00:00:00").run(
        spark, docs, store=store
    )
    s1 = {r["partition_id"]: r["status"] for r in r1.verdicts.collect()}
    assert set(s1.values()) == {"Unknown"}

    r2 = RuleSuite([Rule("drift")], eval_time="2025-08-16 00:00:00").run(
        spark, docs, store=store
    )
    s2 = {r["partition_id"]: r["status"] for r in r2.verdicts.collect()}
    assert set(s2.values()) == {"Healthy"}

    shifted = docs.withColumn("spans", F.slice("spans", 1, 2))  # span-count dist collapses
    r3 = RuleSuite([Rule("drift")], eval_time="2025-08-17 00:00:00").run(
        spark, shifted, store=store
    )
    s3 = {r["partition_id"]: r["status"] for r in r3.verdicts.collect()}
    assert set(s3.values()) == {"Unhealthy"}


def test_suite_json_roundtrip(spark):
    suite = default_suite()
    suite2 = RuleSuite.from_json(suite.to_json())
    assert suite2.config_hash() == suite.config_hash()
    assert [r.kind for r in suite2.rules] == [r.kind for r in suite.rules]
    s3 = RuleSuite([Rule("profile", {"null_rate_max": 0.5})], eval_time="2025-01-01 00:00:00")
    s4 = RuleSuite.from_json(s3.to_json())
    assert s4.rules[0].params == {"null_rate_max": 0.5}
    assert s4.config_hash() == s3.config_hash()


def test_rule_failure_degrades_to_unknown_and_retries(spark, inputs, tmp_path, monkeypatch):
    """M16 parity: a crashing rule yields Unknown verdicts with an error
    code instead of failing the run; errored pairs are retried on the
    next run (error rows don't checkpoint)."""
    docs, cat, commits, _events = inputs
    store = LocalParquetCatalog(str(tmp_path / "store"))
    # fuse_doc_scan=False: per-rule failure isolation is an unfused
    # property (a fused-scan failure degrades all fused rules together —
    # covered by test_fused_docscan_matches_unfused)
    suite = RuleSuite([Rule("spans"), Rule("uniqueness")], parallel_rules=1, fuse_doc_scan=False)

    boom = RuntimeError("model failed to converge")
    orig = RuleSuite._compile_uniqueness
    monkeypatch.setattr(
        RuleSuite, "_compile_uniqueness", lambda self, *a, **k: (_ for _ in ()).throw(boom)
    )
    r1 = suite.run(spark, docs, cat, commits, store=store)
    by_rule = {}
    for row in r1.verdicts.collect():
        by_rule.setdefault(row["rule_id"], []).append(row)
    uniq = by_rule["unique.doc_id"]
    assert all(v["status"] == "Unknown" for v in uniq)
    assert all(v["metrics"]["error_code"] == "MODEL_FIT_FAILED" for v in uniq)
    assert all("converge" in v["error_message"] for v in uniq)
    # spans still ran normally
    assert any(v["status"] != "Unknown" for v in by_rule["spans.monotone_offset"])

    # restore and rerun: uniqueness retries (spans skipped), verdicts heal
    monkeypatch.setattr(RuleSuite, "_compile_uniqueness", orig)
    r2 = suite.run(spark, docs, cat, commits, store=store)
    uniq2 = [v for v in r2.verdicts.collect() if v["rule_id"] == "unique.doc_id"]
    assert all(v["status"] in ("Healthy", "Unhealthy") for v in uniq2)
    assert r2.skipped_pairs > 0  # spans pairs were checkpointed


def test_violation_cap_downsamples_but_keeps_exact_metrics(spark, tmp_path):
    """Stored violation examples are capped per (rule, partition); the
    verdict metrics keep exact counts."""
    docs = documents_interleaved(spark, 8000, n_partitions=4, seed=42)
    store = LocalParquetCatalog(str(tmp_path / "store"))
    suite = RuleSuite([Rule("uniqueness")], max_violations_per_pair=10)
    r = suite.run(spark, docs, store=store)
    stored = r.violations.groupBy("partition_id").count().collect()
    # partition 0 holds the hot key (~80 dup rows at n=8000) → capped
    per_part = {x["partition_id"]: x["count"] for x in stored}
    assert per_part[0] <= 30  # ~10 expected; hash sampling is approximate
    v = {x["partition_id"]: x for x in r.verdicts.collect() if x["rule_id"] == "unique.doc_id"}
    assert int(v[0]["metrics"]["duplicate_rows"]) > 30  # exact count retained


def test_overall_fold_row_with_impact_and_debug(spark, inputs, tmp_path):
    """M10 + M17 wiring: each partition gets exactly one 'overall' fold
    row (worst-of all rule statuses), carrying the downstream-impact
    struct and the per-rule nested debug map; a fully-resumed run reuses
    the stored overall rows without duplicating them."""
    from anomaly_detection_spark.sources.synthetic import lineage_edges, queries_per_table

    docs, cat, commits, events = inputs
    store = LocalParquetCatalog(str(tmp_path / "store"))
    suite = default_suite()
    r1 = suite.run(
        spark, docs, cat, commits, store=store, events=events,
        lineage_edges=lineage_edges(spark, 4), queries_per_table=queries_per_table(spark),
    )
    overall = [v for v in r1.verdicts.collect() if v["rule_id"] == "overall"]
    parts = sorted(v["partition_id"] for v in overall)
    assert parts == [0, 1, 2, 3]
    for v in overall:
        # worst-of fold: planted doc violations exist in every partition
        assert v["status"] == "Unhealthy"
        assert v["downstream_impact"] is not None
        assert 1 <= v["downstream_impact"]["impact_level"] <= 4
        # nested per-rule debug map covers the per-rule verdicts
        assert "unique.doc_id" in v["additional_debug_info"]
        assert "freshness.event" in v["additional_debug_info"]
    # event-freshness rule rows exist and carry latency metrics
    ev = [v for v in r1.verdicts.collect() if v["rule_id"] == "freshness.event"]
    assert len(ev) == 4
    assert all("actual_latency_sec" in v["metrics"] for v in ev)

    # resumed run: no new overall rows (exactly one per partition stays)
    r2 = suite.run(
        spark, docs, cat, commits, store=store, events=events,
        lineage_edges=lineage_edges(spark, 4), queries_per_table=queries_per_table(spark),
    )
    lineage = store.read(spark, "_dq_lineage")
    n_overall = lineage.filter(F.col("rule_id") == "overall").count()
    assert n_overall == 4
    v2 = sorted((x["partition_id"], x["rule_id"], x["status"]) for x in r2.verdicts.collect())
    v1 = sorted((x["partition_id"], x["rule_id"], x["status"]) for x in r1.verdicts.collect())
    assert v1 == v2


def test_fused_docscan_matches_unfused(spark, inputs, tmp_path):
    """The fused shared-scan path must be output-identical to the
    per-rule plans: same verdicts (status + metrics) and same violation
    rows; and a failure inside the fused scan degrades ALL fused rules
    to Unknown with an error code."""
    docs, cat, commits, _events = inputs
    rules = [Rule("spans"), Rule("uniqueness"), Rule("referential")]

    def run(fused: bool, store_dir: str):
        suite = RuleSuite(list(rules), fuse_doc_scan=fused)
        store = LocalParquetCatalog(str(tmp_path / store_dir))
        return suite.run(spark, docs, cat, commits, store=store)

    rf = run(True, "fused")
    ru = run(False, "unfused")
    vf = sorted(
        (x["partition_id"], x["rule_id"], x["status"], tuple(sorted(x["metrics"].items())))
        for x in rf.verdicts.collect()
    )
    vu = sorted(
        (x["partition_id"], x["rule_id"], x["status"], tuple(sorted(x["metrics"].items())))
        for x in ru.verdicts.collect()
    )
    assert vf == vu

    # the violations read-back dedups on (doc_id, rule_id, partition) —
    # for duplicated keys the surviving representative's span payload is
    # an arbitrary pick, so compare the deterministic identity triplets
    def viol_set(r):
        return {
            (x["doc_id"], x["rule_id"], x["partition_id"]) for x in r.violations.collect()
        }

    assert viol_set(rf) == viol_set(ru)
    assert len(viol_set(rf)) > 0

    # fused failure degrades every fused rule (M16, all-or-nothing)
    suite = RuleSuite(list(rules), fuse_doc_scan=True)
    orig = RuleSuite._compile_docscan_fused
    try:
        RuleSuite._compile_docscan_fused = lambda self, *a, **k: (_ for _ in ()).throw(
            RuntimeError("model failed to converge")
        )
        rboom = suite.run(
            spark, docs, cat, commits, store=LocalParquetCatalog(str(tmp_path / "boom"))
        )
    finally:
        RuleSuite._compile_docscan_fused = orig
    by_rule = {}
    for v in rboom.verdicts.collect():
        if v["rule_id"] != "overall":
            by_rule.setdefault(v["rule_id"], []).append(v)
    for rid in ("spans.monotone_offset", "unique.doc_id"):
        assert all(v["status"] == "Unknown" for v in by_rule[rid])
        assert all(v["metrics"]["error_code"] == "MODEL_FIT_FAILED" for v in by_rule[rid])
    # referential does not fuse (its membership test is only cheap as a
    # join) → unaffected by the fused-scan failure
    assert all(v["status"] in ("Healthy", "Unhealthy") for v in by_rule["ri.media_ref"])


def test_stale_overall_row_never_wins_resume(spark, inputs, tmp_path):
    """A crashed run can leave a stale 'overall' row (folded over fewer
    rules, e.g. Healthy) that ties the real one on evaluated_at — the
    random run_id tiebreak must never surface it. The fold is always
    recomputed from the latest per-rule rows; stored overall rows do not
    participate in the returned result regardless of run_id ordering."""
    from anomaly_detection_spark.plans.suite import LINEAGE_SCHEMA

    docs, cat, commits, _events = inputs
    store = LocalParquetCatalog(str(tmp_path / "store"))
    suite = RuleSuite([Rule("spans"), Rule("uniqueness")])
    r1 = suite.run(spark, docs, cat, commits, store=store)

    # forge stale overall rows whose run_ids sort both below AND above
    # any real uuid hex — if either side of the tiebreak leaked through,
    # one of these Healthy rows would win
    forged = spark.createDataFrame(
        [
            (None, rid, r1.config_hash, p, "overall", "Healthy",
             {"rules_evaluated": "1"}, None, None, None)
            for p in range(4)
            for rid in ("zzzzzzzzzzzz", "000000000000")
        ],
        LINEAGE_SCHEMA,
    ).withColumn("evaluated_at", F.to_timestamp(F.lit(suite.eval_time)))
    store.append(
        "_dq_lineage",
        forged.select(
            "evaluated_at", "run_id", "config_hash", "partition_id", "rule_id",
            "status", "metrics", "error_message", "downstream_impact",
            "additional_debug_info",
        ),
    )

    r2 = suite.run(spark, docs, cat, commits, store=store)
    overall = {
        v["partition_id"]: v for v in r2.verdicts.collect() if v["rule_id"] == "overall"
    }
    assert sorted(overall) == [0, 1, 2, 3]
    # real fold: planted violations exist in every partition → Unhealthy,
    # folded over all 4 rule rows (3 span rules + uniqueness)
    assert all(v["status"] == "Unhealthy" for v in overall.values())
    assert all(v["metrics"]["rules_evaluated"] == "4" for v in overall.values())


def test_fused_uniqueness_keeps_empty_span_dup_rows(spark, tmp_path):
    """A duplicate-key doc whose spans array is empty or null must yield
    a uniqueness violation row in BOTH the fused and unfused paths (the
    fused path previously filtered them out via size(spans) > 0)."""
    from tests.conftest import make_docs

    rows = [
        ("dup", 0, []),  # empty spans, duplicate key
        ("dup", 1, [("text", "ok", None, 0)]),
        ("dupnull", 0, None),  # null spans, duplicate key
        ("dupnull", 1, [("text", "ok", None, 0)]),
        ("solo", 0, [("text", "ok", None, 0)]),
    ]
    docs = make_docs(spark, rows)

    def viol_set(fused: bool, store_dir: str):
        suite = RuleSuite([Rule("spans"), Rule("uniqueness")], fuse_doc_scan=fused)
        r = suite.run(spark, docs, store=LocalParquetCatalog(str(tmp_path / store_dir)))
        return {
            (x["doc_id"], x["rule_id"], x["partition_id"]) for x in r.violations.collect()
        }

    vf = viol_set(True, "fused")
    vu = viol_set(False, "unfused")
    assert vf == vu
    expected = {
        ("dup", "unique.doc_id", 0),
        ("dup", "unique.doc_id", 1),
        ("dupnull", "unique.doc_id", 0),
        ("dupnull", "unique.doc_id", 1),
    }
    assert expected <= vf


def test_lineage_store_schema_migration(spark, tmp_path):
    """A lineage store written before LINEAGE_SCHEMA gained
    downstream_impact / additional_debug_info must keep working: the
    declared-schema read backfills the missing columns as typed nulls
    and merges mixed-version appends, and a suite run over such a store
    succeeds (the overall-fold unionByName previously raised)."""
    from anomaly_detection_spark.plans.suite import LINEAGE_SCHEMA

    OLD = (
        "evaluated_at timestamp, run_id string, config_hash string, partition_id int, "
        "rule_id string, status string, metrics map<string,string>, error_message string"
    )
    store = LocalParquetCatalog(str(tmp_path / "store"))
    old_rows = spark.createDataFrame(
        [(None, "r0", "oldcfg", 0, "unique.doc_id", "Healthy", {"total_rows": "1"}, None)],
        OLD,
    ).withColumn("evaluated_at", F.to_timestamp(F.lit("2025-08-15 00:00:00")))
    store.append("_dq_lineage", old_rows)

    back = store.read(spark, "_dq_lineage", LINEAGE_SCHEMA)
    declared = [f.name for f in spark.createDataFrame([], LINEAGE_SCHEMA).schema.fields]
    assert back.columns == declared
    row = back.first()
    assert row["downstream_impact"] is None and row["additional_debug_info"] is None

    # a full suite run appends new-schema rows into the same store and
    # reads the mixed store back without error
    docs = documents_interleaved(spark, 500, n_partitions=2, seed=1)
    r = RuleSuite([Rule("uniqueness")]).run(spark, docs, store=store)
    assert r.verdicts.count() > 0
    merged = store.read(spark, "_dq_lineage", LINEAGE_SCHEMA)
    assert merged.filter(F.col("config_hash") == "oldcfg").count() == 1
