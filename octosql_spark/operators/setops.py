"""Set operations (SURVEY.md §2.5).

The reference's logical UNION nodes exist but their Typecheck panics
"implement me" (logical/union_all.go:17-19) — the SQL surface claims
them, so we provide the real thing; INTERSECT/EXCEPT exceed parity.
``unionByName`` keeps column-name alignment (the reference matches
schemas by position after requalification; name-matching is the safer
contract for a library API).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(left: DataFrame, right: DataFrame) -> DataFrame:
    return left.unionByName(right)


def union_distinct(left: DataFrame, right: DataFrame) -> DataFrame:
    return left.unionByName(right).distinct()


def intersect(left: DataFrame, right: DataFrame, all: bool = False) -> DataFrame:
    return left.intersectAll(right) if all else left.intersect(right)


def except_all(left: DataFrame, right: DataFrame, all: bool = True) -> DataFrame:
    return left.exceptAll(right) if all else left.subtract(right)
