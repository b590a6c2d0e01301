"""GROUP BY + the reference's aggregate catalog (SURVEY.md §2.4).

The reference keeps a registry ``map[string]AggregateDetails``
(aggregates/table.go:7-48) with retraction-capable implementations
(counted btrees for min/max — aggregates/min.go:14-85). On Spark the
retraction machinery is internal to Structured Streaming; for batch a
hash aggregate with partial (map-side) combine is what
``df.groupBy().agg()`` compiles to — that is the scalable shape:
partial aggregation means the shuffle moves one row per (partition,
key), not per input row.

Aggregate names follow the reference (aggregates/table.go:7-48):
count, count_distinct, sum, sum_distinct, avg, avg_distinct, min, max,
array_agg, array_agg_distinct. ``DISTINCT`` inside a call is the
``_distinct`` variant (parser/parser.go:469-472). NULL inputs are
skipped (simple_group_by.go:45-147) — same as Spark/SQL semantics.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# name -> Column builder. array_agg collects a multiset (aggregates/
# array.go:14-89): order is non-deterministic in a distributed engine,
# so callers that need determinism should sort the result array
# (F.array_sort) — our SQL front-end does exactly that when comparing.
AGGREGATES: dict[str, Callable[[Column], Column]] = {
    "count": F.count,
    "count_distinct": F.count_distinct,
    "sum": F.sum,
    "sum_distinct": F.sum_distinct,
    "avg": F.avg,
    "avg_distinct": lambda c: F.try_divide(F.sum_distinct(c),
                                           F.count_distinct(c)),
    "min": F.min,
    "max": F.max,
    "array_agg": F.collect_list,
    "array_agg_distinct": F.collect_set,
}


def group_by(df: DataFrame, keys: Sequence[str | Column],
             aggs: Sequence[tuple[str, str | Column, str]]) -> DataFrame:
    """``aggs`` is (aggregate_name, input_column, output_alias).

    ``count(*)`` is spelled ``("count", "*", alias)`` — the reference
    parses ``count(*)`` as ``count(TRUE)`` (parser/parser.go:487-489).
    Empty ``keys`` gives global aggregation (one row, like the
    reference's end-of-stream trigger emit)."""
    agg_cols = []
    for name, col, alias in aggs:
        fn = AGGREGATES[name]
        if isinstance(col, str):
            col = F.lit(True) if col == "*" else F.col(col)
        agg_cols.append(fn(col).alias(alias))
    if keys:
        return df.groupBy(*keys).agg(*agg_cols)
    return df.agg(*agg_cols)
