"""Frozen 10x-scale-ratio regression gate (r7 verdict #1).

SCALE_REPORT.json is a committed snapshot of every headline
workload's sf0.1 → 10x wall-time ratio (tools/scale_stress.py
--update-report). The comparator fails any frozen entry whose ratio
grew >25% — the signature of a plan that stopped scaling (planted
repartition(1), un-broadcast dim, re-executed lineage).

The full re-measure costs ~20 min (it builds and runs a ~sf1
replica), so it is env-gated for the round checklist
(SPARK_GRAFT_SCALE_GATE=1 pytest tests/test_scale_report.py, or
`python tools/scale_stress.py --check`); the comparator and the
plant-detection physics are pinned by the always-on tests below.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
SNAPSHOT = os.path.join(REPO, "SCALE_REPORT.json")


def test_snapshot_exists_and_covers_headliners():
    from octosql_spark.workloads import REGISTRY

    with open(SNAPSHOT) as f:
        frozen = json.load(f)["queries"]
    missing = [n for n, w in REGISTRY.items()
               if w.headline and n not in frozen]
    assert not missing, (f"headline entries missing from "
                         f"SCALE_REPORT.json: {missing} — freeze with "
                         f"`python tools/scale_stress.py "
                         f"--update-report`")
    assert all(v["ratio"] > 0 for v in frozen.values())


def test_ratio_comparator_flags_growth_only():
    from scale_stress import ratio_regressions

    frozen = {"a": {"ratio": 2.0}, "b": {"ratio": 4.0},
              "c": {"ratio": 1.0}}
    fresh = {"a": {"ratio": 2.4},   # +20% — inside tolerance
             "b": {"ratio": 5.2},   # +30% — regression
             # c missing from the fresh run — regression
             "d": {"ratio": 99.0}}  # not frozen — exempt
    bad = ratio_regressions(frozen, fresh)
    assert len(bad) == 2
    assert any(m.startswith("b:") for m in bad)
    assert any(m.startswith("c:") for m in bad)
    # improvements never flag
    assert not ratio_regressions(frozen, {
        "a": {"ratio": 1.0}, "b": {"ratio": 0.5},
        "c": {"ratio": 1.0}})


def test_repartition1_plant_is_detectable_by_ratio(spark):
    """The physics the gate relies on: on a many-core local mode, a
    parallel aggregation's wall grows sub-linearly with data (more
    rows -> more parallelism used), while a planted repartition(1)
    serializes the same work so its wall grows ~linearly with data.
    The planted plan's 8x ratio must exceed the clean plan's by more
    than the gate tolerance — i.e. the comparator would catch the
    plant had it been committed against the clean snapshot."""
    import pyspark.sql.functions as F

    from scale_stress import ratio_regressions

    def agg(n, plant):
        d = spark.range(n).selectExpr(
            "id % 5000 AS k", "cast(id as double) AS v")
        if plant:
            d = d.repartition(1)
        return (d.groupBy("k")
                .agg(F.sum("v"), F.avg("v"), F.max("v"),
                     F.stddev("v")))

    def med(n, plant):
        agg(n, plant).collect()  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            agg(n, plant).collect()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]

    base_n, big_n = 400_000, 3_200_000
    clean = med(big_n, False) / med(base_n, False)
    planted = med(big_n, True) / med(base_n, True)
    assert planted > clean * 1.25, (clean, planted)
    # and the comparator itself fires on exactly this movement
    assert ratio_regressions({"q": {"ratio": round(clean, 2)}},
                             {"q": {"ratio": round(planted, 2)}})


@pytest.mark.skipif(not os.environ.get("SPARK_GRAFT_SCALE_GATE"),
                    reason="full 10x re-measure (~20 min); round "
                           "checklist: SPARK_GRAFT_SCALE_GATE=1 or "
                           "`python tools/scale_stress.py --check`")
def test_frozen_scale_ratios_do_not_grow(spark):
    from scale_stress import build_scaled, measure, ratio_regressions

    from octosql_spark.workloads import REGISTRY

    with open(SNAPSHOT) as f:
        doc = json.load(f)
    frozen, k, src = doc["queries"], doc["k"], doc["src"]
    dst = f"/tmp/octosql_scale{k}x"
    build_scaled(spark, src, dst, k)
    fresh = measure(spark, [n for n in frozen if n in REGISTRY],
                    src, dst, k)
    bad = ratio_regressions(frozen, fresh)
    assert not bad, ("scale-ratio regressions vs SCALE_REPORT.json "
                     "(regenerate only if the growth is intended and "
                     "documented):\n" + "\n".join(bad))
