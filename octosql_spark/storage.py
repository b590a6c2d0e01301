"""Storage-layout operations for shuffle avoidance at scale.

The reference is single-machine and has no layout story; on a cluster
the dominant cost of repeated joins/aggregations over the same keys is
the shuffle. Two standard tools, exposed as first-class operations:

- **Bucketing** (``write_bucketed`` / ``read_bucketed``): persist a
  table hash-partitioned AND optionally sorted by the join key. Two
  tables bucketed on the same key with the same bucket count join
  with ZERO Exchange on either side (sort-merge join reads co-located
  buckets). At 100 TB this turns every recurring join/groupBy on the
  bucket key into a narrow, shuffle-free stage.
- **Salting** (``salted_join``): for skewed keys (one key = 30% of
  rows), split each hot left-side key across ``salt`` sub-keys and
  replicate the right side per sub-key — the hot partition becomes
  ``salt`` parallel partitions. AQE's skew-join handles moderate skew
  automatically (session.py enables it); salting is the explicit tool
  for extreme generator-style skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, table: str, bucket_cols: Sequence[str],
                   n_buckets: int = 64,
                   sort_cols: Sequence[str] | None = None,
                   path: str | None = None,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) parquet table.

    ``n_buckets`` sizing at scale: total_bytes / n_buckets should land
    in the 100-500 MB range per bucket file per task."""
    w = df.write.format("parquet").mode(mode) \
        .bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table; Catalyst consumes the bucket spec and
    drops the Exchange for joins/aggregations on the bucket key."""
    return spark.table(table)


def write_partitioned(df: DataFrame, path: str,
                      partition_cols: Sequence[str],
                      mode: str = "overwrite",
                      fmt: str = "parquet") -> None:
    """Hive-style partitioned layout (``path/col=value/...``): filters
    on the partition columns become partition PRUNING — whole
    directories skipped at planning, the single biggest scan saver for
    date/language/source-keyed corpora. Keep partition cardinality
    sane (≤ ~10k dirs); high-cardinality keys belong in bucketing."""
    df.write.format(fmt).mode(mode).partitionBy(*partition_cols).save(path)


def read_partitioned(spark: SparkSession, path: str,
                     fmt: str = "parquet") -> DataFrame:
    return spark.read.format(fmt).load(path)


def salted_join(left: DataFrame, right: DataFrame,
                on: Sequence[str], how: str = "inner",
                salt: int = 16) -> DataFrame:
    """Equi-join with key salting for extreme skew.

    The left (big, skewed) side gets a deterministic pseudo-random
    salt per row; the right side replicates ``salt`` times. The join
    key becomes (key, salt) so one hot key spreads over ``salt``
    shuffle partitions. Row-identical to ``left.join(right, on, how)``
    for inner/left joins; right side grows ``salt``× (keep it the
    small side)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    on = list(on)
    salted_l = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
        .cast("int"))
    salted_r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = salted_l.join(salted_r, on + ["_salt"], how)
    return out.drop("_salt")


def key_skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """Join-key skew diagnostics: the numbers that decide whether a
    key needs ``salted_join`` / AQE skew splitting before a shuffle.
    Returns ONE row: distinct keys, total rows, max/avg rows per key,
    exact p50/p99 per-key counts (type-7, cross-engine comparable),
    and ``skew_ratio`` = max/avg (>> 1 means one hot key dominates a
    shuffle partition).

    Scale shape: a map-side-combined count per key (the same shuffle
    the join itself would do, but carrying only (key, count)) plus a
    1-row reduce. Run it on a sample for quick checks; exact on the
    full table is still one narrow pass."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(True)).alias("cnt"))
    return counts.agg(
        F.count(F.lit(True)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("max_per_key"),
        F.round(F.avg("cnt"), 6).alias("avg_per_key"),
        F.round(F.expr("percentile(cnt, 0.5)"), 6).alias("p50_per_key"),
        F.round(F.expr("percentile(cnt, 0.99)"), 6).alias("p99_per_key"),
        F.round(F.max("cnt") / F.avg("cnt"), 6).alias("skew_ratio"))


def compact_parquet(spark: SparkSession, src: str, dst: str,
                    target_mb: int = 256,
                    sort_within_by: Sequence[str] | None = None) -> int:
    """Small-file compaction: rewrite a parquet directory into files of
    ~``target_mb`` each — the standing maintenance task of any
    streaming/incremental ingest, whose thousands of KB-sized files
    otherwise bloat the NameNode/listing path and turn every scan into
    a task-scheduling storm (the "small files problem").

    File count = ceil(input_bytes / target_mb), decided from the real
    directory size, not a guess. With ``sort_within_by`` the data is
    additionally range-partitioned and sorted by those columns before
    writing, so each output file covers a tight key range and parquet
    min/max row-group stats prune scans with key predicates (poor
    man's clustering — the layout you want under a 100 TB time- or
    key-partitioned table).

    Returns the number of files written. One job: scan → (optional
    range shuffle) → write; never collects to the driver.
    """
    import math
    import os
    size = sum(os.path.getsize(os.path.join(r, f))
               for r, _, fs in os.walk(src) for f in fs
               if f.endswith(".parquet") or "." not in f)
    n_files = max(1, math.ceil(size / (target_mb << 20)))
    df = spark.read.parquet(src)
    if sort_within_by:
        cols = [F.col(c) for c in sort_within_by]
        df = (df.repartitionByRange(n_files, *cols)
              .sortWithinPartitions(*cols))
    else:
        df = df.coalesce(n_files)
    df.write.mode("overwrite").parquet(dst)
    return sum(1 for f in os.listdir(dst) if f.endswith(".parquet"))


def upsert_partitioned(spark: SparkSession, path: str, updates: DataFrame,
                       key_cols: Sequence[str],
                       partition_cols: Sequence[str],
                       version_col: str | None = None,
                       fmt: str = "parquet") -> None:
    """Partition-level MERGE (upsert) into a Hive-partitioned table
    without a table format: rows in ``updates`` replace base rows with
    the same key; new keys append. Only the partitions PRESENT IN THE
    UPDATE are read and rewritten (dynamic partition overwrite) — the
    standing incremental-ingest primitive when Delta/Iceberg isn't on
    the cluster.

    Mechanics: the update's partition values prune the base read
    (partition filter → directory pruning), base rows losing to an
    update key are anti-joined out, and the union writes back with
    ``partitionOverwriteMode=dynamic`` so untouched partitions are
    never listed, read, or rewritten. With ``version_col``, the
    max-version row wins per key (late-arriving updates can't
    regress a newer base row); without it the update always wins.

    At 100 TB this touches |affected partitions| of data — the same
    contract as a MERGE on a partition-aligned key. Keys should not
    straddle partitions (enforce upstream: partition by a stable
    function of the key)."""
    parts = [r.asDict() for r in
             updates.select(*partition_cols).distinct().collect()]
    if not parts:
        return
    # partition filter: (p1=a AND p2=b) OR ... — bounded by the
    # update's partition count, prunes the base scan to dirs touched
    cond = None
    for p in parts:
        c = None
        for k, v in p.items():
            # null-safe: a NULL partition value lands in
            # __HIVE_DEFAULT_PARTITION__ and reads back as NULL; a
            # plain == would never match it, silently dropping that
            # partition's base rows from the merged rewrite
            e = F.col(k).eqNullSafe(F.lit(v))
            c = e if c is None else (c & e)
        cond = c if cond is None else (cond | c)
    base = spark.read.format(fmt).load(path).filter(cond)
    keys = list(key_cols)
    if version_col is not None:
        from pyspark.sql.window import Window
        merged = (base.unionByName(updates)
                  .withColumn("_rn", F.row_number().over(
                      Window.partitionBy(*keys)
                      .orderBy(F.col(version_col).desc())))
                  .filter(F.col("_rn") == 1).drop("_rn"))
    else:
        survivors = base.join(updates.select(*keys).distinct(),
                              keys, "left_anti")
        merged = survivors.unionByName(updates)
    writer = (merged.write.format(fmt).mode("overwrite")
              .partitionBy(*partition_cols)
              # per-write option, not session conf: the dynamic mode
              # must not leak into later overwrite writes
              .option("partitionOverwriteMode", "dynamic"))
    writer.save(path)


def merge_rollup(spark: SparkSession, rollup_path: str,
                 increment: DataFrame, keys: Sequence[str],
                 agg_specs: Sequence[tuple[str, str]],
                 fmt: str = "parquet") -> None:
    """Incremental materialized rollup: fold a new increment into a
    stored aggregate table WITHOUT rescanning history — the
    streaming-warehouse primitive behind "orders per day, maintained
    forever". ``agg_specs`` are (agg, col) with agg in
    {sum, count, min, max}: exactly the MERGEABLE aggregates, whose
    partials combine associatively (sum+=sum, count+=count,
    min=min(min), max=max(max)). AVG is derivable as sum/count
    downstream; non-mergeable aggregates (distinct, percentile) need
    sketches instead.

    One job: aggregate the increment (map-side combined), union with
    the existing rollup (|groups| rows, not history), re-reduce, and
    atomically replace via a temp-dir swap. At 100 TB the rollup
    table stays |groups|-sized while history grows unbounded —
    refresh cost is O(increment + groups), never O(history)."""
    import os
    import shutil
    combine = {"sum": F.sum, "count": F.sum,  # partial counts ADD
               "min": F.min, "max": F.max}
    first = {"sum": F.sum, "count": lambda c: F.count(F.lit(1)),
             "min": F.min, "max": F.max}
    names = [f"{a}_{c}" if a != "count" else "n" for a, c in agg_specs]
    inc = increment.groupBy(*keys).agg(*[
        first[a](c).alias(nm) for (a, c), nm in zip(agg_specs, names)])
    if os.path.exists(rollup_path):
        base = spark.read.format(fmt).load(rollup_path)
        merged = (base.unionByName(inc)
                  .groupBy(*keys)
                  .agg(*[combine[a](nm).alias(nm)
                         for (a, _), nm in zip(agg_specs, names)]))
    else:
        merged = inc
    tmp = rollup_path + "__staging"
    merged.write.format(fmt).mode("overwrite").save(tmp)
    if os.path.exists(rollup_path):
        shutil.rmtree(rollup_path)
    os.replace(tmp, rollup_path)


def scd2_build(changes: DataFrame, key_cols: Sequence[str],
               attr_cols: Sequence[str], ts_col: str = "ts",
               tiebreak_cols: Sequence[str] = ()) -> DataFrame:
    """Slowly-changing-dimension Type 2: fold a change feed into
    versioned validity intervals per key.

    Consecutive records whose tracked ``attr_cols`` are unchanged
    (null-safe compare) collapse into one version; each surviving
    version gets ``valid_from`` = its change timestamp, ``valid_to`` =
    the next version's timestamp (NULL while current), a 1-based
    ``version`` and an ``is_current`` flag — the standard warehouse
    shape for as-of dimension lookups (pair with
    ``operators.temporal.asof_join`` to resolve facts against it).

    Scale shape: ONE hash shuffle on the key; both window passes
    (change detection on the raw feed, interval stitching on the
    surviving versions) share that partitioning, so Catalyst plans a
    single Exchange with partition-local sorts. Ordering inside a key
    is (``ts_col``, ``tiebreak_cols``) — pass a unique tiebreak for a
    deterministic fold when timestamps collide.
    """
    from pyspark.sql.window import Window
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak_cols]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changed = F.row_number().over(w) == 1
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    versions = changes.withColumn("_chg", changed).filter("_chg")
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return (versions.select(
        *key_cols, *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.lead(ts_col).over(w2).isNull().alias("is_current")))


def zorder_key(df: DataFrame, cols: Sequence[str],
               bits: int = 16, out_col: str = "zvalue") -> DataFrame:
    """Morton (Z-order) clustering key over 2+ integer columns.

    Each column is affine-quantized to ``bits`` bits with EXACT
    integer arithmetic — ``(x - min) * (2^bits - 1) div span`` — and
    the quantized values' bits are interleaved (column i contributes
    bit b at position ``b*len(cols)+i``). Rows close in z-value are
    close in EVERY key dimension, so writing files sorted by z-value
    gives each file a tight bounding box in all the columns at once;
    parquet min/max stats then prune scans filtered on ANY of them —
    multi-dimensional data skipping with one sort, where a plain sort
    only clusters its leading column. This is the standing layout
    trick for 100 TB tables queried on several independent keys.

    The min/max per column is ONE driver-collected row; the key
    itself is a pure codegen'd integer expression (unrolled static
    shifts — no UDF, no float anywhere, reproducible across engines).
    """
    if len(cols) * bits > 63:
        raise ValueError("len(cols) * bits must fit in a signed long")
    stats = df.agg(
        *[F.min(c).alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(c).alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    n = len(cols)
    mval = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        mn, mx = stats[f"mn_{i}"], stats[f"mx_{i}"]
        if mn is None or mx is None:
            raise ValueError(
                f"zorder_key: column {c!r} has no non-null values — "
                "cannot quantize an empty domain")
        span = max(int(mx) - int(mn), 1)
        if span <= ((1 << 63) - 1) // mval:
            # exact multiply-then-div keeps full sub-bucket resolution
            q = F.expr(f"((cast({c} as bigint) - {mn}) * {mval}) "
                       f"div {span}")
        elif span < (1 << 63):
            # wide span (e.g. epoch-nanos keys): (x-mn)*mval would
            # silently wrap in int64 under non-ANSI mode — pre-scale
            # by a bucket width instead: d > span/2^bits guarantees
            # (x-mn) div d <= mval, still pure int64 codegen
            d = span // (mval + 1) + 1
            q = F.expr(f"(cast({c} as bigint) - {mn}) div {d}")
        else:
            raise ValueError(
                f"zorder_key: span of {c!r} ({span}) exceeds int64 — "
                "rescale the column before z-ordering")
        for b in range(bits):
            z = z + (F.shiftright(q, b).bitwiseAND(F.lit(1)).cast("long")
                     * F.lit(1 << (b * n + i)))
    return df.withColumn(out_col, z)


def zorder_write(df: DataFrame, path: str, cols: Sequence[str],
                 bits: int = 16, n_files: int = 8) -> None:
    """Persist ``df`` laid out by z-value: range-partition on the
    Morton key (balanced output files) and sort within each partition
    so every file covers a tight multi-column bounding box. One
    shuffle + local sort; the key column itself is dropped from the
    written schema (it is reconstructible)."""
    keyed = zorder_key(df, cols, bits=bits)
    (keyed.repartitionByRange(n_files, "zvalue")
     .sortWithinPartitions("zvalue")
     .drop("zvalue")
     .write.mode("overwrite").parquet(path))
