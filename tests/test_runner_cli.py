"""spark-submit entry point (run.py) exercised in-process."""

import json

from anomaly_detection_spark.run import main


def test_runner_synthetic(spark, tmp_path, capsys):
    rc = main(
        [
            "--synthetic",
            "2000",
            "--partitions",
            "4",
            "--store",
            str(tmp_path / "store"),
            "--rules",
            "spans,uniqueness,referential",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["verdicts"] > 0 and out["violations"] > 0
    assert out["resumed_pairs"] == 0

    # rerun resumes
    rc = main(
        [
            "--synthetic",
            "2000",
            "--partitions",
            "4",
            "--store",
            str(tmp_path / "store"),
            "--rules",
            "spans,uniqueness,referential",
        ]
    )
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["resumed_pairs"] > 0
    assert out2["verdicts"] == out["verdicts"]


def test_runner_reads_parquet_inputs(spark, tmp_path, capsys):
    from anomaly_detection_spark.sources.synthetic import (
        asset_catalog,
        commits_log,
        documents_interleaved,
    )

    docs_p = str(tmp_path / "docs")
    cat_p = str(tmp_path / "cat")
    com_p = str(tmp_path / "com")
    documents_interleaved(spark, 1000, n_partitions=2).write.parquet(docs_p)
    asset_catalog(spark, 256).write.parquet(cat_p)
    commits_log(spark, 2).write.parquet(com_p)
    rc = main(
        [
            "--docs",
            docs_p,
            "--catalog",
            cat_p,
            "--commits",
            com_p,
            "--store",
            str(tmp_path / "store"),
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["verdicts"] > 0
