"""Mergeable quantile summaries — the quantile twin of the HLL
distinct rollup (workloads.sketch_rollup_mergeable): per-group
equi-depth summaries that MERGE into whole-corpus quantile estimates
with a provable rank-error bound, so a weekly/monthly rollup can
answer global percentiles in O(summary) without rescanning history.

Equi-depth merging is the classic mergeable-summary result (the
simplest member of the GK/KLL family): a b-boundary summary of a
group with n_g rows places any value's rank within n_g/b, so an
estimate computed from the merged boundary multiset has exact rank
within Σ n_g/b = N/b of the target — the bound the gate entry pins
as a contract boolean, with all crossing arithmetic in scaled
integers so both engines agree exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantile_rollup_summary(df: DataFrame, value_col: str,
                            group_col: str, b: int = 64) -> DataFrame:
    """Per-group equi-depth summary: for each group of n rows, the
    exact order statistics at ranks ceil(i·n/b) (i = 1..b), each
    carrying SCALED integer weight ci·n where ci is the number of
    i's that map to the rank (handles n < b and duplicate ranks; the
    true weight is ci·n/b, scaled by b to stay integer-exact).

    Returns (group_col, boundary, weight, group_n).

    Scale shape: ONE hash shuffle on the group key + an in-partition
    sort window — no arrays, no collect, no driver. Selecting rank r
    iff ⌈r·b/n⌉ > ⌈(r−1)·b/n⌉ is pure int64 arithmetic (DIV), so the
    summary build pipelines with the sorted scan; a hot group is the
    usual skew problem, not a new one. The summary is groups × ≤ b
    rows — the thing you PERSIST for incremental rollup maintenance.
    """
    from pyspark.sql.window import Window
    if b < 1:
        raise ValueError("b must be >= 1")
    w = Window.partitionBy(group_col).orderBy("boundary")
    wn = Window.partitionBy(group_col)
    d = (df.select(group_col, F.col(value_col).alias("boundary"))
         .withColumn("_rn", F.row_number().over(w).cast("long"))
         .withColumn("_n", F.count(F.lit(1)).over(wn).cast("long")))
    ci = (F.expr(f"_rn * {b} DIV _n") - F.expr(f"(_rn - 1) * {b} DIV _n"))
    return (d.withColumn("_ci", ci)
            .filter(F.col("_ci") > 0)
            .select(group_col, "boundary",
                    (F.col("_ci") * F.col("_n")).alias("weight"),
                    F.col("_n").alias("group_n")))


def quantile_rollup_estimate(summary: DataFrame,
                             probs_pct: Sequence[int],
                             b: int = 64) -> DataFrame:
    """Global quantile estimates from merged per-group summaries:
    the weighted order statistic over the boundary multiset —
    smallest boundary whose cumulative scaled weight crosses
    q·(b·N). Probabilities are INTEGER PERCENTS so the crossing test
    ``100·cw ≥ q_pct·ΣW`` is exact int64 — bit-identical across
    engines (a floating cumulative sum would make the crossing
    boundary order-dependent).

    Returns (q_pct, est), one row per requested percent.

    The window here runs over the SUMMARY (groups × ≤ b rows —
    bounded by construction, like global_ntile's offset table), never
    the data.
    """
    from pyspark.sql.window import Window
    wc = (Window.orderBy("boundary")
          .rowsBetween(Window.unboundedPreceding, 0))
    wall = (Window.orderBy("boundary")
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))
    cum = (summary
           .withColumn("_cw", F.sum("weight").over(wc))
           .withColumn("_W", F.sum("weight").over(wall)))
    p = (summary.sparkSession.range(1)
         .select(F.explode(F.array(
             *[F.lit(int(x)) for x in probs_pct])).alias("q_pct")))
    return (cum.join(F.broadcast(p),
                     F.col("_cw") * 100 >= F.col("q_pct") * F.col("_W"))
            .groupBy("q_pct")
            .agg(F.min("boundary").alias("est"))
            .orderBy("q_pct"))
