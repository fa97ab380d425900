"""anomaly_detection_spark — a PySpark-native data-quality / validation engine.

A brand-new, Spark-first reimplementation of the capabilities of the
reference client library ``erddantas/anomaly_detection`` (surveyed in
/root/repo/SURVEY.md): per-column profiling, uniqueness, referential
integrity, per-row span invariants, distribution drift, and
freshness / completeness verdicts over commit logs — expressed as a
declarative rule DAG of DataFrame plans executed inside Spark, with
per-partition pass/fail verdicts, violation rows, and resumable
checkpointing to a lineage table.

Design stance (vs. the reference):
- the reference loops per table on the driver with a 10-thread pool
  (reference: anomalydetection/completeness_checker.py:153); we submit
  declarative DataFrame plans and let Spark task parallelism own the
  fan-out over partitions.
- the reference row-orients everything through pandas on the driver;
  we stay in the JVM with built-in column expressions, dropping to
  vectorized Arrow/pandas UDFs only for per-group model state
  (forecast bands) — never per-row Python.
"""

from anomaly_detection_spark.session import get_spark
from anomaly_detection_spark.plans.suite import Rule, RuleSuite, RunResult

__all__ = ["get_spark", "Rule", "RuleSuite", "RunResult"]
__version__ = "0.1.0"
