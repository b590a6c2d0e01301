"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet dir, then compares row count, column
names, and order-insensitive values (columns sorted by name, rows
sorted by all columns). Run:  python tools/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from octosql_spark.catalog import TPCH_TABLES
from octosql_spark.session import get_spark


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple, np.ndarray)) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True,
                          key=lambda s: s.map(str))


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-12)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    if (a is None or a != a) and (b is None or b != b):  # NaN/None cross
        return True
    return a == b


def dtype_mismatches(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Columns whose pandas dtype differs between engines.

    The driver's gate hashes *typed* values, so a DuckDB HUGEINT/double
    where Spark emits int64 is a hash mismatch even when every value is
    equal. Surfacing these keeps every oracle exact-typed.
    """
    out = []
    for c in sorted(set(spark_pdf.columns) & set(oracle_pdf.columns)):
        sd, od = str(spark_pdf[c].dtype), str(oracle_pdf[c].dtype)
        if sd != od:
            out.append(f"{c}: spark={sd} oracle={od}")
    return out


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        problems.append(f"columns spark={sc} oracle={oc}")
        return problems
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    if len(a) == len(b):
        for col in a.columns:
            av, bv = a[col].tolist(), b[col].tolist()
            bad = [i for i, (x, y) in enumerate(zip(av, bv)) if not _values_equal(x, y)]
            if bad:
                i = bad[0]
                problems.append(
                    f"col {col}: {len(bad)} mismatches, first at row {i}: "
                    f"spark={av[i]!r} oracle={bv[i]!r}")
    return problems


def main() -> int:
    args = [a for a in sys.argv[1:]
            if a != "--contracts" and not a.startswith(("--jobs=",
                                                        "--skip="))]
    contracts_only = "--contracts" in sys.argv[1:]
    skip: set[str] = set()
    for a in sys.argv[1:]:
        if a.startswith("--skip="):
            # scale sweeps: the all-pairs recall oracles are
            # sf0.01-quadratic by design (README); skip them at sf0.1
            skip.update(a.split("=", 1)[1].split(","))
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = args[1].split(",") if len(args) > 1 else None

    import __spark_entry__ as e
    qs, oracles = e.queries(), e.oracle_sql()

    if contracts_only:
        # The invariant/contract subset (oracles asserting TRUE
        # booleans): these pin APPROXIMATE operators to their error
        # contracts, and some contracts only break at larger scale
        # (the r5 HLL merge-vs-full-scan bug was invisible at sf0.01,
        # 1488 vs 1494 first diverged on 1500 distinct at sf0.1).
        # Round checklist: python tools/check_correctness.py
        #   /root/testdata/sf0.1 --contracts
        import re as _re
        contracts = [n for n in qs
                     if n in oracles
                     and _re.search(r"\bTRUE\s+AS\s+\w+", oracles[n], _re.I)]
        # intersect with a positional `only` filter when both are
        # given (ADVICE r6: --contracts used to silently overwrite it)
        only = ([n for n in contracts if n in only] if only
                else contracts)
        print(f"contracts subset: {sorted(only)}")

    spark = get_spark("correctness")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    # --jobs N: entries run in a thread pool (Spark actions are
    # thread-safe and the scheduler interleaves jobs; each worker
    # gets its own DuckDB cursor). Wall time is dominated by per-job
    # scheduling latency, so 4 threads roughly halve the full run.
    jobs = int(os.environ.get("SPARK_GRAFT_CHECK_JOBS", "1"))
    for a in sys.argv[1:]:
        if a.startswith("--jobs="):
            jobs = int(a.split("=", 1)[1])

    names = [n for n in qs if (not only or n in only) and n not in skip]

    def run_one(name):
        lines = []
        try:
            spdf = qs[name](spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            return name, "fail", [f"FAIL  {name}: spark error: {ex}"]
        if name not in oracles:
            return name, "rows", [f"rows  {name}: {len(spdf)} rows (no oracle)"]
        try:
            opdf = con.cursor().execute(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            return name, "fail", [f"FAIL  {name}: oracle error: {ex}"]
        problems = compare(name, spdf, opdf)
        status = "fail" if problems else "ok"
        lines.append(f"FAIL  {name}: " + "; ".join(problems) if problems
                     else f"ok    {name} ({len(spdf)} rows)")
        types = dtype_mismatches(spdf, opdf)
        if types:
            lines.append(f"TYPE  {name}: " + "; ".join(types))
        return name, status, lines

    failed, passed, rows_only = [], [], []

    def record(res):
        name, status, lines = res
        for ln in lines:
            print(ln, flush=True)
        {"fail": failed, "ok": passed, "rows": rows_only}[status].append(name)

    from octosql_spark.session import cached_rdd_count, release_cached
    if jobs > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=jobs) as pool:
            for res in pool.map(run_one, names):
                record(res)
        # concurrent mode: releasing per-entry would unpersist frames
        # other threads are mid-query on (range-partition caches must
        # stay pinned until their consuming action) — release once at
        # sweep end instead
        release_cached(spark)
    else:
        for name in names:
            record(run_one(name))
            release_cached(spark)  # session hygiene: no cache leaks
    leaked = cached_rdd_count(spark)
    if leaked:
        print(f"HYGIENE: {leaked} persistent RDDs leaked after release")

    print(f"\n{len(passed)} ok, {len(failed)} failed, {len(rows_only)} rows-only")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
