"""Frozen plan-budget regression gate.

PLAN_REPORT.json is a committed snapshot of every gate workload's
physical-plan budget (tools/plan_report.py). This test re-describes
every registry entry and fails when a FROZEN entry's shuffle /
pandas-stage / python-eval count GROWS — catching an unpersisted
lineage (each consumer re-runs the producer's shuffles) or an
accidental Python fallback at commit time instead of at 10x stress.

New entries (absent from the snapshot) are exempt: freeze them by
regenerating the snapshot
(`python tools/plan_report.py > PLAN_REPORT.json`). Budget DROPS are
allowed (and worth re-freezing to lock in).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAPSHOT = os.path.join(REPO, "PLAN_REPORT.json")
SF_DIR = "/root/testdata/sf0.01"  # the snapshot's generation dir
BUDGET_KEYS = ("shuffles", "pandas_stages", "python_eval", "rdd_scans")


def test_plan_budgets_do_not_grow(spark):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from plan_report import describe

    from octosql_spark import workloads
    from octosql_spark.session import release_cached
    from octosql_spark.workloads import REGISTRY

    # hermetic start (r8): frames persisted by EARLIER tests
    # substitute into entry plans via the CacheManager and module
    # caches may hold released frames — both make the printed counts
    # depend on suite order. Snapshot generation (plan_report.main)
    # starts from the same clean state.
    release_cached(spark)
    workloads._PS_CACHE.clear()

    with open(SNAPSHOT) as f:
        frozen_plans = json.load(f)["plans"]

    grew = []
    for name, w in REGISTRY.items():
        frozen = frozen_plans.get(name)
        if not frozen or "error" in frozen:
            continue  # new since the snapshot — exempt until frozen
        try:
            cur = describe(w.build(spark, SF_DIR))
        except Exception as ex:  # noqa: BLE001 — a broken build IS a regression
            grew.append(f"{name}: build failed: {str(ex)[:160]}")
            continue
        for k in BUDGET_KEYS:
            # .get(…, 0): a counter added after the snapshot was
            # frozen budgets at ZERO until the snapshot is regenerated
            # — any occurrence anywhere is a gate failure, not a
            # silently-exempt new key
            if cur[k] > frozen.get(k, 0):
                grew.append(f"{name}: {k} {frozen.get(k, 0)} -> {cur[k]}")
    assert not grew, ("plan budget regressions vs PLAN_REPORT.json "
                      "(regenerate the snapshot only if the growth is "
                      "intended and documented):\n" + "\n".join(grew))


def test_rdd_scan_counter_detects_python_round_trip(spark):
    """Seeded regression for the rdd_scans budget counter: an
    RDD round trip (`df.rdd` + `createDataFrame`) must show up as
    `Scan ExistingRDD` — the shape the r6 `read_lines` zipWithIndex
    path used to hide Python serialization from the budget."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from plan_report import describe

    clean = spark.range(100).toDF("v")
    assert describe(clean)["rdd_scans"] == 0
    laundered = spark.createDataFrame(
        clean.rdd.map(lambda r: (r["v"] * 2,)), "v long")
    assert describe(laundered)["rdd_scans"] >= 1


def test_lines_scan_is_pure_jvm(spark, tmp_path):
    """The batch `lines` source must number rows without any
    RDD/Python stage (VERDICT r6 What's-wrong #1) and match the
    reference's 0-based file-order numbering
    (datasources/lines/impl.go:13-63) across a multi-split file."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from plan_report import describe

    from octosql_spark.sources.files import read_lines

    p = tmp_path / "many.lines"
    with open(p, "w") as f:
        for i in range(50_000):
            f.write(f"{i:09d}\n")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try:
        df = read_lines(spark, str(p))
        d = describe(df)
        assert d["rdd_scans"] == 0 and d["python_eval"] == 0 \
            and d["pandas_stages"] == 0, d
        rows = df.orderBy("number").collect()
        assert len(rows) == 50_000
        assert all(r["number"] == i and r["text"] == f"{i:09d}"
                   for i, r in enumerate(rows))
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
        spark.conf.unset("spark.sql.files.openCostInBytes")
