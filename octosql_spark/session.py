"""SparkSession factory tuned for both local testing and cluster scale.

The reference is a single-process engine (SURVEY.md §4: no shuffle, no
spill, GOGC tuning — cmd/root.go:87). On Spark those concerns become
session configs: AQE for runtime re-planning/skew handling, Arrow for
any pandas-UDF path, sane shuffle partitioning.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for scale (see README "Scale design"):
# - AQE on: coalesces small shuffle partitions, re-plans skew joins —
#   at 100 TB the static `shuffle.partitions` number is always wrong,
#   AQE makes it a ceiling, not a constant.
# - broadcast threshold 64 MB: dimension tables (region/nation/part/
#   supplier/customer at most SFs) should never shuffle.
# - maxPartitionBytes 256 MB: fewer, fuller input splits for columnar
#   parquet scans.
_SCALE_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # r11: AQE's coalescer (parallelismFirst mode) targets
    # max(total/defaultParallelism, minPartitionSize) per post-shuffle
    # partition. The 1 MB default floor is binding exactly when a
    # shuffle is small in BYTES but dense in CPU (levenshtein verify,
    # jaccard array ops): a 2 MB shuffle coalesced to 2 tasks left 30
    # of 32 cores idle in the edit-distance verify stage. 256 KB keeps
    # such stages parallel (measured: quantile rollup 1.54→0.95 s,
    # edit-distance 2.6→2.05 s, sf1 minhash 4.5→2.6 s); at production
    # scale per-partition bytes = total/parallelism >> 1 MB, so the
    # floor is never the binding term there and the setting is inert.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": str(256 * 1024),
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Serve bare MIN/MAX/COUNT from parquet footer statistics instead
    # of scanning row groups — at 100 TB a COUNT(*) or MIN(ship_date)
    # over a table becomes a metadata read. Only fires for unfiltered
    # scans, so no correctness surface.
    "spark.sql.parquet.aggregatePushdown": "true",
    # Parquet timestamps in the testdata are TIMESTAMP_NTZ; keep
    # inference consistent so oracle comparisons are tz-stable.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
}


def get_spark(app_name: str = "octosql_spark", master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    real cluster pass ``None`` with a cluster master pre-configured, or
    set it explicitly.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    for k, v in _SCALE_CONFS.items():
        builder = builder.config(k, v)
    builder = builder.config("spark.driver.memory",
                             os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    builder = builder.config("spark.ui.enabled", "false")
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def cached_rdd_count(spark: SparkSession) -> int:
    """Number of RDDs currently registered as persistent in the
    session — the leak metric for the session-hygiene contract."""
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def release_cached(spark: SparkSession) -> int:
    """Release every cached DataFrame/table in the session.

    Several operators persist intermediates whose lifetime must cover
    the CONSUMING action (e.g. ``global_ntile``'s range-partitioned
    frame: the broadcast offsets and the final join must see the SAME
    sampled partitioning, so the cache cannot be dropped before the
    caller's action runs — ADVICE r6). The operator therefore cannot
    unpersist its own cache; a long-lived session (service, REPL, the
    registry checker) calls this between units of work instead.
    Returns the number of persistent RDDs that were registered."""
    n = cached_rdd_count(spark)
    spark.catalog.clearCache()
    # clearCache only empties the SQL CacheManager; raw RDD-level
    # persists (pyspark.ml internals — KMeans training caches its
    # sample RDDs — or third-party code) stay registered. Unpersist
    # the stragglers directly so the hygiene contract really means
    # zero persistent RDDs.
    for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs()
                     .values()):
        try:
            jrdd.unpersist(False)
        except Exception:  # noqa: BLE001 — already-released race
            pass
    return n


def apply_runtime_confs(spark: SparkSession) -> None:
    """Apply the runtime-settable subset of our confs to an existing
    session (the verify driver passes us its own SparkSession)."""
    static = {"spark.driver.memory", "spark.sql.parquet.inferTimestampNTZ.enabled"}
    for k, v in _SCALE_CONFS.items():
        if k in static:
            continue
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # cluster may pin some confs; never fail on tuning
