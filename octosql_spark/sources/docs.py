"""``docs.*`` introspection tables (datasources/docs/database.go:20-120).

The reference generates four tables from its registries:
``docs.functions``, ``docs.function_signatures``, ``docs.aggregates``,
``docs.aggregate_signatures``. Ours are built from the Python
registries — tiny driver-side DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from octosql_spark.functions.registry import FUNCTIONS
from octosql_spark.operators.aggregate import AGGREGATES


def docs_table(spark: SparkSession, name: str) -> DataFrame:
    if name == "functions":
        rows = [(f.name, f.description or None) for f in FUNCTIONS.values()]
        return spark.createDataFrame(rows, "name string, description string")
    if name == "function_signatures":
        rows = [(f.name, sig) for f in FUNCTIONS.values() for sig in f.signatures]
        return spark.createDataFrame(rows, "name string, signature string")
    if name == "aggregates":
        return spark.createDataFrame([(n,) for n in AGGREGATES], "name string")
    if name == "aggregate_signatures":
        rows = [(n, "(T) -> T") for n in AGGREGATES]
        return spark.createDataFrame(rows, "name string, signature string")
    raise ValueError(f"unknown docs table: docs.{name}")
