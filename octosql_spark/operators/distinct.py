"""DISTINCT (SURVEY.md §2.2).

The reference keeps a counted multiset so retractions can re-emit
(execution/nodes/distinct.go:26-75). Batch: ``df.distinct()`` — a hash
aggregate with partial combine (scales: shuffle carries unique rows
only). Streaming: ``dropDuplicates`` + watermark bounds the state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def distinct(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    if subset:
        return df.dropDuplicates(subset)
    return df.distinct()
