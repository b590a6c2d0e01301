"""Positive plan evidence: one JSON line per gate workload with the
physical-plan properties that matter at cluster scale — shuffle
(Exchange) count, broadcast joins, whole-stage-codegen coverage,
Python-eval presence, and parquet pushdown — plus a suite summary.

Where tools/plan_audit.py FLAGS anti-patterns, this report RECORDS the
plan budget so a reviewer (or a later round) can diff it: a new
Exchange in a previously 1-shuffle workload is a regression even when
no audit rule fires.

Run: python tools/plan_report.py [sf_dir] > PLAN_REPORT.json
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_DEDUP_ROOTS = ("InMemoryRelation", "Exchange hashpartitioning",
                "Exchange rangepartitioning",
                "Exchange RoundRobinPartitioning",
                "Exchange SinglePartition", "Scan ExistingRDD")


def _dedupe_cached(plan: str) -> str:
    """Keep ONE copy of each distinct shared subtree. Budgets count
    what executes:

    - ``executedPlan().toString()`` re-prints a persisted subtree at
      every InMemoryTableScan that reads it, so a plan that caches a
      rollup and consumes it from k branches prints the rollup's
      exchanges k times while executing them once.
    - The SAME holds for un-persisted shared subtrees under exchange
      reuse: canonically-equal Exchanges execute ONE shuffle
      (``spark.sql.exchange.reuse`` / AQE stage reuse — the final
      adaptive plan shows ``ReusedExchange``), but the PRE-execution
      plan this tool reads prints the full producer subtree at every
      consumer (r8: the parallel-prefix operators dropped their
      persists in favor of exchange reuse, which tripled the printed
      — not executed — exchange count).
    - Identical ``Scan ExistingRDD`` prints of one bounded local
      relation collapse the same way; a NEW distributed round-trip is
      a distinct subtree and still grows the count."""
    lines = plan.splitlines()
    out, seen, i = [], set(), 0
    pre = re.compile(r"^[\s:+|-]*")

    def norm(ln: str) -> str:
        # self-join dedup re-aliases attribute/plan ids per reference,
        # so the SAME cached plan prints with different #ids — strip
        # ids (and AQE plan_ids) before keying
        return re.sub(r"#\d+L?", "#", re.sub(r"plan_id=\d+", "",
                                             pre.sub("", ln)))

    while i < len(lines):
        ln = lines[i]
        if any(r in ln for r in _DEDUP_ROOTS):
            ind = len(pre.match(ln).group(0))
            j = i + 1
            block = [ln]
            while j < len(lines) and len(pre.match(lines[j]).group(0)) > ind:
                block.append(lines[j])
                j += 1
            key = "\n".join(norm(b) for b in block)
            if key in seen:
                i = j  # duplicate shared subtree: executes 0 more times
            else:
                seen.add(key)
                out.append(ln)
                i += 1  # descend: inner shared subtrees dedupe too
        else:
            out.append(ln)
            i += 1
    return "\n".join(out)


def describe(df) -> dict:
    plan = _dedupe_cached(
        df._jdf.queryExecution().executedPlan().toString())
    codegen_ids = set(re.findall(r"\*\((\d+)\)", plan))
    ops = [ln.lstrip(" :+-") for ln in plan.splitlines() if ln.strip()]
    n_ops = sum(1 for o in ops if o and o[0].isupper() or o.startswith("*("))
    return {
        # every non-broadcast Exchange: hash/range (keyed shuffles),
        # RoundRobin (repartition(n)), SinglePartition (global
        # window/limit funnels — tiny-table ones included: growth in
        # ANY exchange class is a budget event)
        "shuffles": len(re.findall(
            r"\bExchange (?:hashpartitioning|rangepartitioning|"
            r"RoundRobinPartitioning|SinglePartition)", plan)),
        "broadcasts": plan.count("BroadcastExchange"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "codegen_spans": len(codegen_ids),
        "python_eval": plan.count("BatchEvalPython")
        + plan.count("ArrowEvalPython"),
        # RDD-backed scans: a `df.rdd`/`createDataFrame(rdd)` round
        # trip shows as `Scan ExistingRDD`/`PythonRDD`, NOT as a
        # Python-eval node — the r6 `read_lines` zipWithIndex path hid
        # from the budget exactly this way. Count it so the frozen
        # gate catches any future Python data path. NOTE:
        # `createDataFrame(<local python list>)` (planted fixtures,
        # VALUES oracles, docs catalogs, collected candidate/codebook
        # samples — all bounded, driver-originated) ALSO renders as
        # `Scan ExistingRDD`; those entries freeze at their current
        # small counts, so a distributed round-trip sneaking into them
        # still grows the number and fails the gate.
        "rdd_scans": plan.count("Scan ExistingRDD")
        + plan.count("PythonRDD"),
        "pandas_stages": plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("AggregateInPandas"),
        "pushed_filters": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "scans": plan.count("FileScan"),
        "ops": n_ops,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from octosql_spark import workloads
    from octosql_spark.session import get_spark, release_cached
    from octosql_spark.workloads import REGISTRY
    spark = get_spark("plan-report")
    spark.sparkContext.setLogLevel("ERROR")
    # clean cache state: the budget gate (tests/test_plan_budget.py)
    # starts identically, so printed counts don't depend on what ran
    # before in the session
    release_cached(spark)
    workloads._PS_CACHE.clear()
    report, errors = {}, 0
    for name, w in REGISTRY.items():
        try:
            report[name] = describe(w.build(spark, sf_dir))
        except Exception as ex:  # noqa: BLE001 — report, don't die
            errors += 1
            report[name] = {"error": str(ex)[:200]}
    good = [r for r in report.values() if "error" not in r]
    summary = {
        "workloads": len(report),
        "errors": errors,
        "total_shuffles": sum(r["shuffles"] for r in good),
        "total_broadcasts": sum(r["broadcasts"] for r in good),
        "row_python_eval_plans":
            sum(1 for r in good if r["python_eval"]),
        "rdd_scan_plans":
            sum(1 for r in good if r.get("rdd_scans")),
        "pandas_plans": sum(1 for r in good if r["pandas_stages"]),
        "zero_shuffle_plans":
            sum(1 for r in good if r["shuffles"] == 0),
    }
    print(json.dumps({"summary": summary, "plans": report}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
