"""ORDER BY / LIMIT / top-K (SURVEY.md §2.5).

The reference's OrderSensitiveTransform keeps a retraction-aware btree
and prunes beyond LIMIT when the input can't retract
(execution/nodes/order_sensitive_transform.go:31-154, top-K prune
:111-116); LIMIT alone short-circuits upstream via a sentinel error
(execution/nodes/limit.go:25-55). Spark's physical planning does the
same things at cluster scale: ``orderBy().limit(n)`` compiles to
``TakeOrderedAndProject`` (per-partition top-K heap + single merge —
no global sort, no full shuffle) and ``limit(n)`` alone to
CollectLimit (stops consuming input early).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def order_by_limit(df: DataFrame,
                   order: Sequence[tuple[str | Column, str]] = (),
                   limit: int | None = None) -> DataFrame:
    """``order`` is (column, "asc"|"desc") pairs — the reference's
    per-key direction multipliers (order_sensitive_transform.go:31-60).
    NULLs: Spark default (asc → nulls first) matches the reference's
    total order where NULL's TypeID sorts first (octosql/values.go:97-106).
    """
    if order:
        cols = []
        for c, direction in order:
            col = F.col(c) if isinstance(c, str) else c
            cols.append(col.desc() if direction.lower().startswith("d") else col.asc())
        df = df.orderBy(*cols)
    if limit is not None:
        df = df.limit(limit)
    return df
