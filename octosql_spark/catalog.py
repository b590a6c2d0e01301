"""Table catalog over a testdata directory.

The reference resolves table names extension-first (``people.csv`` →
CSV handler; cmd/root.go:192-217, physical/physical.go:52-63). Here the
equivalent is a tiny name→DataFrame catalog: parquet-backed tables in a
directory, registered as temp views so both the DataFrame combinators
and the SQL front-end see the same names.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _nanos_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects. (DuckDB-generated data uses them.)"""
    import pyarrow.parquet as pq
    import pyarrow as pa
    cols = []
    if os.path.isdir(path):
        # directory-style parquet (any multi-file dataset): all parts
        # share one schema, so sniff the first part file
        parts = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
        if not parts:
            return cols
        path = os.path.join(path, parts[0])
    schema = pq.read_schema(path)
    for field in schema:
        t = field.type
        if pa.types.is_timestamp(t) and t.unit == "ns":
            cols.append(field.name)
    return cols


def _path_stamp(path: str) -> tuple:
    """Cheap change-detection stamp for a parquet file or directory:
    (mtime_ns, size) of the file, or the aggregate over a directory's
    entries (a dir's own mtime changes on add/remove but not on
    overwrite-in-place, so member stats are folded in too)."""
    st = os.stat(path)
    if not os.path.isdir(path):
        return (st.st_mtime_ns, st.st_size)
    total_sz = 0
    max_mt = st.st_mtime_ns
    for entry in os.scandir(path):
        s = entry.stat()
        total_sz += s.st_size
        if s.st_mtime_ns > max_mt:
            max_mt = s.st_mtime_ns
    return (max_mt, total_sz)


# (applicationId, path, stamp) -> analyzed lazy DataFrame. r11: each
# spark.read.parquet call cost 100-320 ms of DRIVER work (py4j + file
# listing + footer schema inference), and every workload build() pays
# it 2-6x — the single largest fixed cost in the bench suite (guide
# §5/§7.3: driver-side planning work). The memo holds the LAZY plan
# only — every action still recomputes from parquet; nothing about
# results is cached. The stamp invalidates on any file change; entries
# from stopped sessions are dropped when a new app first asks.
_TABLE_CACHE: dict[tuple, DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one parquet table. Column pruning + predicate pushdown are
    Catalyst's job — callers just select/filter declaratively.

    Nanosecond parquet timestamps (unsupported by Spark) are read as
    raw int64 via ``legacy.parquet.nanosAsLong`` and rebuilt as
    TIMESTAMP_NTZ at microsecond precision — a documented deviation
    (sub-µs is dropped; the reference's Time is Go time.Time, ns)."""
    # timestamp-bearing outputs must hash identically regardless of
    # the (driver-owned) session's local timezone
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    path = os.path.join(sf_dir, f"{name}.parquet")
    app = spark.sparkContext.applicationId
    try:
        stamp = _path_stamp(path)
    except OSError:
        stamp = None
    key = (app, path, stamp)
    if stamp is not None:
        df = _TABLE_CACHE.get(key)
        if df is not None:
            return df
        for k in [k for k in _TABLE_CACHE if k[0] != app]:
            _TABLE_CACHE.pop(k, None)  # frames of stopped sessions
    ns_cols = _nanos_ts_columns(path)
    if not ns_cols:
        df = spark.read.parquet(path)
    else:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        for c in ns_cols:
            df = df.withColumn(
                c, F.expr(f"to_timestamp_ntz(timestamp_micros(CAST(`{c}` DIV 1000 AS BIGINT)))"))
        # preserve original column order/names
    if stamp is not None:
        if len(_TABLE_CACHE) >= 256:
            _TABLE_CACHE.pop(next(iter(_TABLE_CACHE)))
        _TABLE_CACHE[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    out = {}
    for name in TPCH_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table in ``sf_dir`` as a temp view (idempotent)."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
