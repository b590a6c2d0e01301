"""In-memory records + the ``dual`` table.

The reference materializes literal rows via InMemoryRecords
(execution/nodes/in_memory_records.go:21-33); queries with no FROM use
a one-row ``dual`` table (logical/logical.go:101-122)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def in_memory_records(spark: SparkSession, rows, schema=None) -> DataFrame:
    return spark.createDataFrame(rows, schema=schema)


def dual(spark: SparkSession) -> DataFrame:
    return spark.sql("SELECT 1 AS dual")
