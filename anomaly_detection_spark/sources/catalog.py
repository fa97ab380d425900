"""Storage adapter: Iceberg-shaped interface, parquet-backed locally.

The engine writes two durable tables — lineage/metrics and violations —
through this adapter. On a real deployment the same calls map to
Iceberg ``df.writeTo(table).append()`` (atomic snapshot commits, schema
evolution — the analog of the reference's append+mergeSchema write at
anomalydetection/utils/common_utils.py:482); the sandbox has no Iceberg
runtime jar, so the local implementation appends parquet files under a
directory. The engine code is identical either way (SURVEY.md §7).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class LocalParquetCatalog:
    """Directory-per-table parquet catalog with append semantics."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def append(self, table: str, df: DataFrame) -> None:
        df.write.mode("append").parquet(self._path(table))

    def exists(self, table: str) -> bool:
        p = self._path(table)
        return os.path.isdir(p) and any(f.endswith(".parquet") for f in os.listdir(p))

    def read(self, spark: SparkSession, table: str, schema: StructType | str | None = None) -> DataFrame:
        if not self.exists(table):
            if schema is None:
                raise FileNotFoundError(self._path(table))
            return spark.createDataFrame([], schema)
        return spark.read.parquet(self._path(table))
