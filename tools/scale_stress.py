"""10x scale stress: does the headline plan set survive a 10x data
blow-up with ~linear wall time?

Materializes a key-remapped k-fold replica of an SF directory (sf0.1
x10 ~= TPC-H sf1: 6M-row lineitem), runs every headline registry
workload on both the base and the scaled copy (same warm-median
methodology as bench.py), and reports the time ratio per query. A
scale-safe plan grows ~linearly (ratio ~= k for scan-bound work, less
for fixed-output top-k/agg shapes); a plan with an accidental
cartesian, driver materialization, or single-task stage grows
super-linearly and fails the gate here before it fails on a cluster.

Replication keeps referential integrity: each replica i shifts every
join key by i*OFFSET consistently across fact and dim tables, so join
fan-outs and group cardinalities scale honestly (10x rows, 10x
groups, same per-key fan-in). nation/region stay fixed (25/5 rows,
like TPC-H at every SF). documents text is replicated verbatim, which
also stress-tests the near-dup pipeline under a 90% exact-duplicate
corpus - the realistic worst case for LSH bucket load.

Run: python tools/scale_stress.py [sf_dir] [k] [extra,names]
(extra: comma-separated non-headline registry names to also measure)
Prints one JSON line; SCALE.md records the checked-in results.

Frozen-ratio gate (r7 verdict #1 — mirror of the plan-budget
freeze): ``--update-report`` writes the measured ratios to
SCALE_REPORT.json at the repo root; ``--check`` re-measures every
FROZEN entry and exits 1 when any ratio grew more than
``RATIO_TOL`` (25%) over its committed value — catching a plan that
stopped scaling (planted ``repartition(1)``, un-broadcast dim,
lineage re-execution) at commit time instead of on a cluster.
Round checklist: ``python tools/scale_stress.py --check``.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

# join keys to shift per replica, per table (all BIGINT in testdata)
KEYED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}
COPY_AS_IS = ["region", "nation"]
OFFSET = 100_000_000


def build_scaled(spark, src: str, dst: str, k: int) -> None:
    from octosql_spark.catalog import load_table
    os.makedirs(dst, exist_ok=True)
    for t in COPY_AS_IS:
        if os.path.exists(os.path.join(dst, f"{t}.parquet")):
            continue
        shutil.copy(os.path.join(src, f"{t}.parquet"),
                    os.path.join(dst, f"{t}.parquet"))
    for t, keys in KEYED.items():
        # incremental: tables added to KEYED later are built into an
        # existing replica dir without redoing the rest
        if os.path.exists(os.path.join(dst, f"{t}.parquet")):
            continue
        df = load_table(spark, src, t)
        rep = df.withColumn(
            "_r", F.explode(F.array(*[F.lit(i) for i in range(k)])))
        for c in keys:
            rep = rep.withColumn(c, (F.col(c) + F.col("_r") * OFFSET))
        # r11: the old .coalesce(4) on a 1-partition source (testdata
        # files hold ONE row group) produced a single part file with a
        # single row group — every replica scan was physically
        # single-threaded no matter maxPartitionBytes (a row group is
        # the minimum split unit), which silently serialized the map
        # side of every sf1 bench query. Write size-derived part
        # files (~4 MB each, capped) so scans of the replica actually
        # parallelize — the layout a real table at this size would
        # have (guide §6: small-files vs split-parallelism balance).
        est = os.path.getsize(os.path.join(src, f"{t}.parquet")) * k \
            if os.path.isfile(os.path.join(src, f"{t}.parquet")) else 0
        nparts = max(1, min(est // (2 << 20), 64))
        rep.drop("_r").repartition(nparts).write.mode("overwrite").parquet(
            os.path.join(dst, f"{t}.parquet"))


def timed(spark, build, warmups: int = 1, runs: int = 3) -> float:
    for _ in range(warmups):
        build().collect()
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        build().collect()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


REPORT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SCALE_REPORT.json")
RATIO_TOL = 0.25  # a frozen entry's ratio may grow at most 25%


def ratio_regressions(frozen: dict, fresh: dict,
                      tol: float = RATIO_TOL) -> list[str]:
    """Compare fresh ratio measurements against the committed report.
    Returns one message per FROZEN entry whose scale ratio grew more
    than ``tol`` (relative). Entries absent from the snapshot are
    exempt (freeze them with --update-report); entries absent from
    the fresh run are flagged — a gate entry that stopped building is
    itself a regression."""
    bad = []
    for name, f in sorted(frozen.items()):
        cur = fresh.get(name)
        if cur is None:
            bad.append(f"{name}: frozen entry missing from fresh run")
            continue
        if cur["ratio"] > f["ratio"] * (1 + tol):
            bad.append(f"{name}: ratio {f['ratio']} -> {cur['ratio']} "
                       f"(>{tol:.0%} growth)")
    return bad


def measure(spark, names, src: str, dst: str, k: int) -> dict:
    from octosql_spark.session import release_cached
    from octosql_spark.workloads import REGISTRY

    # size-derived tuning, same policy as bench.py, per directory
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    def tune(d: str) -> None:
        biggest = max(
            sum(os.path.getsize(os.path.join(r, f)) for r, _, fs in
                os.walk(os.path.join(d, t)) for f in fs)
            if os.path.isdir(os.path.join(d, t))
            else os.path.getsize(os.path.join(d, t))
            for t in os.listdir(d) if t.endswith(".parquet"))
        split = min(max(biggest // (2 * cpus), 2 << 20), 256 << 20)
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))

    out: dict[str, dict] = {}
    for name in names:
        w = REGISTRY[name]
        tune(src)
        base = timed(spark, lambda: w.build(spark, src))
        tune(dst)
        scaled = timed(spark, lambda: w.build(spark, dst))
        release_cached(spark)
        out[name] = {
            "base_sec": round(base, 4),
            f"x{k}_sec": round(scaled, 4),
            "ratio": round(scaled / base, 2),
        }
        print(f"  {name}: {base:.3f}s -> {scaled:.3f}s "
              f"(x{scaled / base:.1f})", file=sys.stderr)
    return out


def main() -> int:
    from octosql_spark.session import get_spark
    from octosql_spark.workloads import REGISTRY

    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    src = args[0] if args else "/root/testdata/sf0.1"
    k = int(args[1]) if len(args) > 1 else 10
    if "--check" in flags and os.path.exists(REPORT):
        # frozen ratios are only comparable at the snapshot's own
        # src/k — a positional override would silently compare
        # apples to oranges (r8 review)
        with open(REPORT) as f:
            _doc = json.load(f)
        src, k = _doc.get("src", src), int(_doc.get("k", k))
    dst = f"/tmp/octosql_scale{k}x"

    spark = get_spark("scale-stress")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    build_scaled(spark, src, dst, k)

    extra = set(args[2].split(",")) if len(args) > 2 else set()
    # --only-extra: re-measure just the named workloads (headliner
    # ratios from a prior full run stay valid when their plans are
    # untouched)
    only_extra = "--only-extra" in flags

    if "--check" in flags:
        with open(REPORT) as f:
            frozen = json.load(f)["queries"]
        names = [n for n in frozen if n in REGISTRY]
        names += [n for n in extra if n not in names]
        fresh = measure(spark, names, src, dst, k)
        bad = ratio_regressions(frozen, fresh)
        print(json.dumps({"metric": f"scale_check_x{k}", "src": src,
                          "regressions": bad, "queries": fresh}))
        if bad:
            print("SCALE RATIO REGRESSIONS:\n  " + "\n  ".join(bad),
                  file=sys.stderr)
        return 1 if bad else 0

    names = [n for n, w in REGISTRY.items()
             if (n in extra) or (w.headline and not only_extra)]
    out = measure(spark, names, src, dst, k)
    doc = {"metric": f"scale_stress_x{k}", "src": src, "k": k,
           "queries": out}
    print(json.dumps(doc))
    if "--update-report" in flags:
        merged = out
        if os.path.exists(REPORT) and (extra or only_extra):
            with open(REPORT) as f:
                merged = {**json.load(f)["queries"], **out}
        with open(REPORT, "w") as f:
            json.dump({"metric": f"scale_stress_x{k}", "src": src,
                       "k": k, "tol": RATIO_TOL, "queries": merged},
                      f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {REPORT} ({len(merged)} entries)",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
