"""Temporal joins Spark has no native operator for: as-of join and
range (interval) join.

Both are implemented as compositions of shuffle-friendly primitives —
no BroadcastNestedLoopJoin, no per-row re-execution — per the
"composition of existing DataFrame ops" strategy (SURVEY §2 "Spark"
column; the reference engine has neither operator, these exceed
parity the same way CUBE/windows do).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame,
              on: str | Sequence[str],
              left_ts: str = "ts", right_ts: str = "ts",
              value_cols: Sequence[str] = ("value",),
              tolerance: str | None = None) -> DataFrame:
    """As-of join (backward, inclusive): every left row picks up the
    ``value_cols`` of the LATEST right row with the same key and
    ``right_ts <= left_ts`` — the standard time-series enrichment
    (trade→latest quote, event→latest state snapshot). Left rows with
    no prior right row get NULLs (left-join semantics). With
    ``tolerance`` (e.g. ``"1 hour"``) matches older than
    ``left_ts - tolerance`` are discarded.

    NOT a range explosion and NOT a per-row lookup: both sides are
    union-tagged into one stream, hash-partitioned by key, sorted
    locally by (ts, side), and the right values are carried forward
    with ``last(ignorenulls) OVER (rows unbounded preceding)``. ONE
    shuffle on the join key, partition-local sort, zero joins — the
    same plan shape at 100 TB, with AQE handling skewed keys. The
    right side must be unique per (key, right_ts); pre-aggregate it
    otherwise (ties would make "the" latest row ambiguous in any
    engine).
    """
    keys = [on] if isinstance(on, str) else list(on)
    lcols = left.columns
    for v in value_cols:
        if v in lcols:
            raise ValueError(f"value column {v!r} collides with a left column")
    lt = left.select(*lcols,
                     F.col(left_ts).alias("_ats"),
                     F.lit(1).alias("_side"),
                     *[F.lit(None).cast(right.schema[v].dataType).alias(v)
                       for v in value_cols])
    rt = right.select(*[F.lit(None).cast(left.schema[c].dataType).alias(c)
                        for c in lcols if c not in keys],
                      *keys,
                      F.col(right_ts).alias("_ats"),
                      F.lit(0).alias("_side"),
                      *value_cols).select(lt.columns)
    u = lt.unionByName(rt)
    # right rows (side 0) sort before left rows at equal ts → inclusive
    w = (Window.partitionBy(*keys).orderBy("_ats", "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # each value column carries ITS OWN source timestamp: last(v,
    # ignorenulls) skips NULL-valued right rows, so the tolerance
    # check must compare against the timestamp of the row the value
    # actually came from, not the latest right row seen (a newer
    # NULL-valued snapshot must not launder a stale value past the
    # tolerance window)
    filled = u.select(
        *lcols, "_ats", "_side",
        *[F.last(v, ignorenulls=True).over(w).alias(v) for v in value_cols],
        *[F.last(F.when((F.col("_side") == 0) & F.col(v).isNotNull(),
                        F.col("_ats")),
                 ignorenulls=True).over(w).alias(f"_rts_{v}")
          for v in value_cols])
    out = filled.filter(F.col("_side") == 1)
    if tolerance is not None:
        tol = F.expr(f"INTERVAL {tolerance}")
        out = out.select(
            *lcols,
            *[F.when(F.col(f"_rts_{v}") >= F.col("_ats") - tol,
                     F.col(v)).otherwise(F.lit(None)).alias(v)
              for v in value_cols])
    else:
        out = out.select(*lcols, *value_cols)
    return out


def range_join(intervals: DataFrame, points: DataFrame,
               on: str | Sequence[str],
               start_col: str, end_col: str, point_col: str,
               bin_seconds: int = 3600) -> DataFrame:
    """Range (interval-containment) join: pair every ``points`` row
    with every ``intervals`` row of the same key whose
    ``[start_col, end_col]`` contains ``point_col`` (inclusive both
    ends).

    The naive plan (equi-join on key + range filter) degenerates to
    carrying every point against every interval of its key; a pure
    theta join is a BroadcastNestedLoopJoin — both collapse at scale.
    Here intervals are EXPLODED onto the fixed time grid of
    ``bin_seconds``-wide bins they overlap, points map to their single
    bin, and the join is a hash equi-join on (key, bin) with the exact
    range predicate re-checked after. Each (interval, point) pair
    meets in exactly one bin (the point's), so no dedup is needed.
    Interval fan-out = ceil(span / bin_seconds): pick ``bin_seconds``
    near the typical span so candidate blow-up is bounded — this is
    the standard bucketed band-join, the shape that survives 100 TB.
    """
    keys = [on] if isinstance(on, str) else list(on)
    width_us = F.lit(int(bin_seconds) * 1_000_000)

    def _us(c: str) -> Column:
        # unix_micros rejects TIMESTAMP_NTZ; the cast applies the same
        # session-zone shift to both sides, so bin ids stay consistent
        return F.unix_micros(F.col(c).cast("timestamp"))

    ib = intervals.withColumn(
        "_bin",
        F.explode(F.sequence(F.floor(_us(start_col) / width_us),
                             F.floor(_us(end_col) / width_us))))
    pb = points.withColumn(
        "_bin", F.floor(_us(point_col) / width_us))
    joined = ib.join(pb, keys + ["_bin"])
    return (joined
            .filter((F.col(point_col) >= F.col(start_col))
                    & (F.col(point_col) <= F.col(end_col)))
            .drop("_bin"))


def funnel(events: DataFrame, steps: Sequence[str],
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type",
           max_span: str | None = None) -> DataFrame:
    """Ordered-conversion funnel (the MATCH_RECOGNIZE-style sequence
    operator Spark lacks): for steps [A, B, C], a user reaches step k
    when an event of type ``steps[k]`` occurs STRICTLY AFTER the
    user's completion time of step k-1 (earliest-completion
    semantics: each step's completion time is the MIN qualifying
    timestamp, so a user's funnel is deterministic). With
    ``max_span`` (an INTERVAL string, e.g. "7 days"), every step must
    land within that span of the user's first step-1 event.

    Returns one row per step: (step_index 1-based, step, users).

    Scale shape: step k is a type-filtered scan joined to the step
    k-1 per-user frontier on the user key — len(steps) hash
    aggregations/joins on ``user_col``, each carrying one row per
    surviving user (monotonically shrinking). No window over the full
    event stream, no per-user collect_list; the type filter pushes to
    the scan of a type-partitioned event store.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    counts = []
    frontier: DataFrame | None = None
    for i, step in enumerate(steps):
        e = (events.filter(F.col(type_col) == step)
             .select(F.col(user_col).alias("_u"),
                     F.col(ts_col).alias("_t")))
        if frontier is None:
            frontier = (e.groupBy("_u").agg(F.min("_t").alias("_tk"))
                        .withColumn("_t0", F.col("_tk")))
        else:
            j = e.join(frontier, "_u").filter(F.col("_t") > F.col("_tk"))
            if max_span is not None:
                j = j.filter(F.col("_t") <=
                             F.col("_t0") + F.expr(f"INTERVAL {max_span}"))
            frontier = (j.groupBy("_u", "_t0")
                        .agg(F.min("_t").alias("_tk")))
        counts.append(frontier.agg(
            F.lit(i + 1).cast("long").alias("step_index"),
            F.lit(step).alias("step"),
            F.count(F.lit(1)).cast("long").alias("users")))
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out


def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type",
                      signup_type: str = "signup",
                      max_weeks: int = 8) -> DataFrame:
    """Cohort retention: users are grouped into cohorts by the week
    (Monday-truncated) of their FIRST ``signup_type`` event; for each
    week offset 0..``max_weeks`` the count of cohort users with ANY
    event in that week. Returns (cohort_week, week_offset,
    active_users) — the standard retention triangle.

    Scale shape: one per-user min over the signup slice, one
    broadcast-or-shuffle equi-join of the (user, week) activity
    projection against that per-user cohort table, one
    count-distinct aggregation on (cohort, offset) — bounded output
    (weeks × offsets), no window over the stream.
    """
    first = (events.filter(F.col(type_col) == signup_type)
             .groupBy(F.col(user_col).alias("_u"))
             .agg(F.min(F.date_trunc("week", F.col(ts_col)))
                  .alias("cohort_week")))
    act = events.select(F.col(user_col).alias("_u"),
                        F.date_trunc("week", F.col(ts_col)).alias("_w"))
    j = (act.join(first, "_u")
         .withColumn("week_offset",
                     (F.datediff(F.col("_w"), F.col("cohort_week")) / 7)
                     .cast("long"))
         .filter((F.col("week_offset") >= 0)
                 & (F.col("week_offset") <= max_weeks)))
    return (j.groupBy("cohort_week", "week_offset")
            .agg(F.count_distinct("_u").alias("active_users")))


def interval_concurrency(intervals: DataFrame, start_col: str = "start",
                         end_col: str = "end",
                         bucket: str = "hour") -> DataFrame:
    """Sweep-line concurrency: how many intervals are active at each
    event instant, reported as the peak per time ``bucket`` — the
    "peak concurrent sessions per hour" operator. Intervals are
    CLOSED on both ends (a zero-length interval counts 1 at its
    instant).

    Not a self-join (intervals x instants collapses at scale) and not
    one global sort: the classic +1/-1 sweep is decomposed into
    (1) a per-instant collapse — one hash shuffle keyed on the
    timestamp, producing net and start counts per distinct instant;
    (2) a per-bucket prefix table — |buckets| rows (bounded: hours in
    the data's time span), cumulated with one unpartitioned window
    over that tiny table only, exactly the mixture-sample domain-table
    pattern; (3) a within-bucket running sum — windows partitioned by
    bucket. Peak at an instant applies starts before ends (closed
    ends): peak(t) = prefix_before(t) + starts(t); the carried
    running value uses net(t).
    """
    s = intervals.select(F.col(start_col).alias("_ts"),
                         F.lit(1).alias("_d"))
    e = intervals.select(F.col(end_col).alias("_ts"),
                         F.lit(-1).alias("_d"))
    per_ts = (s.unionByName(e)
              .groupBy("_ts")
              .agg(F.sum("_d").alias("_net"),
                   F.sum(F.when(F.col("_d") > 0, 1).otherwise(0))
                   .alias("_starts"))
              .withColumn("_bucket", F.date_trunc(bucket, F.col("_ts"))))
    # tiny per-bucket prefix: exclusive cumulative net before the bucket
    wb = (Window.partitionBy().orderBy("_bucket")
          .rowsBetween(Window.unboundedPreceding, -1))
    bucket_prefix = (per_ts.groupBy("_bucket")
                     .agg(F.sum("_net").alias("_bnet"))
                     .select("_bucket",
                             F.coalesce(F.sum("_bnet").over(wb), F.lit(0))
                             .alias("_prefix")))
    wt = (Window.partitionBy("_bucket").orderBy("_ts")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    prof = (per_ts.join(F.broadcast(bucket_prefix), "_bucket")
            .withColumn("_cum", F.col("_prefix") + F.sum("_net").over(wt))
            .withColumn("_peak_at",
                        F.col("_cum") - F.col("_net") + F.col("_starts")))
    return (prof.groupBy(F.col("_bucket").alias("bucket"))
            .agg(F.max("_peak_at").cast("long").alias("peak")))


def rolling_zscore(counts: DataFrame, ts_col: str = "bucket",
                   value_col: str = "n", trailing: int = 24,
                   keys: Sequence[str] = ()) -> DataFrame:
    """Trailing-window anomaly score: each bucket's value against the
    mean/std of the ``trailing`` PRECEDING buckets (the bucket itself
    excluded — an anomaly must not mask itself). Appends
    (trail_mean, trail_std, zscore); buckets with fewer than 2
    trailing points get NULL scores.

    Determinism contract: the moments come from exact integer window
    sums — SUM(x) and SUM(x^2) over a BIGINT value — so mean and
    variance are ratios of exact integers and the z-score is
    bit-identical in any engine (a naive windowed STDDEV accumulates
    doubles in engine-dependent order). Variance uses the n-1 form
    ``(sumsq - sum^2/n) / (n-1)``.

    Scale shape: one window per key over time-ordered buckets —
    hash-partitioned by key; with no keys the bucket table is already
    tiny (one row per hour of history), never the raw event stream.
    """
    ks = list(keys)
    w = (Window.partitionBy(*ks).orderBy(ts_col)
         .rowsBetween(-trailing, -1)) if ks else \
        (Window.partitionBy().orderBy(ts_col).rowsBetween(-trailing, -1))
    x = F.col(value_col).cast("long")
    s1 = F.sum(x).over(w)
    s2 = F.sum(x * x).over(w)
    cnt = F.count(x).over(w)
    mean = s1 / cnt
    var = (s2 - (s1 * s1) / cnt) / (cnt - 1)
    std = F.sqrt(var)
    return counts.select(
        *ks, ts_col, value_col,
        F.when(cnt >= 2, F.round(mean, 6)).alias("trail_mean"),
        F.when(cnt >= 2, F.round(std, 6)).alias("trail_std"),
        F.when((cnt >= 2) & (std > 0),
               F.round((x - mean) / std, 6)).alias("zscore"))
