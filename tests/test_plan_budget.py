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
BUDGET_KEYS = ("shuffles", "pandas_stages", "python_eval")


def test_plan_budgets_do_not_grow(spark):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from plan_report import describe

    from octosql_spark.workloads import REGISTRY

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
            if cur[k] > frozen[k]:
                grew.append(f"{name}: {k} {frozen[k]} -> {cur[k]}")
    assert not grew, ("plan budget regressions vs PLAN_REPORT.json "
                      "(regenerate the snapshot only if the growth is "
                      "intended and documented):\n" + "\n".join(grew))
