"""Storage-adapter contract tests (SURVEY.md §2 S4/S5).

The engine writes lineage + violations through the append/exists/read
adapter surface. LocalParquetCatalog is the sandbox implementation;
IcebergCatalog maps the same calls to Iceberg snapshot commits on real
deployments (no Iceberg jar here, so its call SHAPES are asserted
against mocks — the adapter boundary can't rot silently). A third test
proves the suite depends ONLY on that surface by running end-to-end
plus resume through a minimal duck-typed in-memory store.
"""

from unittest import mock

import pytest

from anomaly_detection_spark.sources.catalog import IcebergCatalog, LocalParquetCatalog


def test_local_catalog_contract(spark, tmp_path):
    store = LocalParquetCatalog(str(tmp_path / "store"))
    assert not store.exists("_t")
    with pytest.raises(FileNotFoundError):
        store.read(spark, "_t")
    # schema-imposed read of a missing table -> empty typed frame
    df0 = store.read(spark, "_t", "a int, b string")
    assert df0.columns == ["a", "b"] and df0.count() == 0
    store.append("_t", spark.createDataFrame([(1, "x")], "a int, b string"))
    store.append("_t", spark.createDataFrame([(2, "y")], "a int, b string"))
    assert store.exists("_t")
    assert store.read(spark, "_t").count() == 2
    # migration path: declared schema with a column the stored files
    # predate -> typed nulls, no mergeSchema footer pass
    out = store.read(spark, "_t", "a int, b string, c double")
    assert out.schema["c"].dataType.typeName() == "double"
    assert out.filter("c is null").count() == 2
    assert {r["a"] for r in out.collect()} == {1, 2}


def test_iceberg_catalog_call_shapes():
    """Assert the exact writeTo/create/append/read.table call shapes
    the Iceberg implementation issues — mirroring the Local contract
    above — so a refactor of the engine's store calls breaks HERE, not
    on a real cluster."""
    store = IcebergCatalog("cat.db")
    df = mock.MagicMock(name="df")
    sess = df.sparkSession
    # first append: table absent -> writeTo(name).create()
    sess.catalog.tableExists.return_value = False
    store.append("_dq_lineage", df)
    sess.catalog.tableExists.assert_called_with("cat.db.dq_lineage")
    df.writeTo.assert_called_once_with("cat.db.dq_lineage")
    df.writeTo.return_value.create.assert_called_once_with()
    df.writeTo.return_value.append.assert_not_called()
    # later appends: table exists -> writeTo(name).append()
    df.writeTo.reset_mock()
    sess.catalog.tableExists.return_value = True
    store.append("_dq_lineage", df)
    df.writeTo.return_value.append.assert_called_once_with()
    df.writeTo.return_value.create.assert_not_called()
    # exists() uses the CALLER's session when given (the suite submits
    # rule jobs from driver threads where getActiveSession is unset)
    caller = mock.MagicMock()
    caller.catalog.tableExists.return_value = True
    assert store.exists("_dq_lineage", caller)
    caller.catalog.tableExists.assert_called_once_with("cat.db.dq_lineage")
    # read of an existing table -> spark.read.table(name)
    rd = mock.MagicMock()
    rd.catalog.tableExists.return_value = True
    store.read(rd, "_dq_lineage")
    rd.read.table.assert_called_once_with("cat.db.dq_lineage")
    # read of a missing table: no schema -> FileNotFoundError; declared
    # schema -> empty typed frame
    rd2 = mock.MagicMock()
    rd2.catalog.tableExists.return_value = False
    with pytest.raises(FileNotFoundError):
        store.read(rd2, "_dq_lineage")
    store.read(rd2, "_dq_lineage", "a int")
    rd2.createDataFrame.assert_called_once_with([], "a int")


class _MemStore:
    """Minimal duck-typed store implementing ONLY the adapter surface."""

    def __init__(self):
        self.tables = {}

    def append(self, table, df):
        self.tables.setdefault(table, []).append(df)

    def exists(self, table, spark=None):
        return bool(self.tables.get(table))

    def read(self, spark, table, schema=None):
        dfs = self.tables.get(table)
        if not dfs:
            if schema is None:
                raise FileNotFoundError(table)
            return spark.createDataFrame([], schema)
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out


def test_suite_runs_and_resumes_through_duck_typed_store(spark):
    """The suite depends only on the adapter contract: a dict-backed
    in-memory store supports a full run AND checkpoint resume (second
    run skips every (rule, partition) pair), proving no implementation
    details of LocalParquetCatalog leak into the engine."""
    from anomaly_detection_spark.plans.suite import Rule, RuleSuite
    from anomaly_detection_spark.sources.portable import (
        interleaved_from_corpus,
        portable_asset_catalog,
    )

    docs = interleaved_from_corpus(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ).drop("src_id")
    cat = portable_asset_catalog(spark)
    store = _MemStore()
    suite = RuleSuite([Rule("uniqueness"), Rule("referential")])
    res1 = suite.run(spark, docs, cat, None, store=store)
    n1 = res1.verdicts.count()
    assert n1 > 0 and res1.skipped_pairs == 0
    res2 = suite.run(spark, docs, cat, None, store=store)
    assert res2.skipped_pairs > 0
    assert res2.verdicts.count() == n1
    v1 = {(r["partition_id"], r["rule_id"], r["status"]) for r in res1.verdicts.collect()}
    v2 = {(r["partition_id"], r["rule_id"], r["status"]) for r in res2.verdicts.collect()}
    assert v1 == v2
