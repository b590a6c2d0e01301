"""Physical-plan audit: sweeps every workload and flags scale
anti-patterns in the executed plan (the ".explain and iterate until
it's the plan you'd want" loop, automated):

- CartesianProduct / BroadcastNestedLoopJoin where not intended
- row-at-a-time PythonUDF in the row path (BatchEvalPython)
- parquet scans reading all columns when the query projects few
- missing PushedFilters on filtered scans

Run: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The intended-cartesian allowlist lives on the workload declarations
# themselves (Workload.cartesian_ok in octosql_spark/workloads.py) —
# a query whose semantics are a cross product, or that broadcasts a
# 1-row scalar (corpus stats / IDF denominator) against the corpus,
# declares it at the definition site so this audit can't drift.


def audit(name: str, df, cartesian_ok: bool = False) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    flags = []
    if not cartesian_ok and \
            ("CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan):
        flags.append("unintended cartesian/BNLJ")
    if "BatchEvalPython" in plan:
        flags.append("row-at-a-time Python UDF in plan")
    # stop at end-of-line: executedPlan toString TRUNCATES long scan
    # lines ("...tim..." with no closing '>'), and a multi-line match
    # would count the tree-drawing ':' characters of following lines
    for m in re.finditer(r"ReadSchema: struct<([^>\n]*)", plan):
        ncols = m.group(1).count(":")
        if ncols > 15:
            flags.append(f"wide scan ({ncols} cols)")
    return flags


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from octosql_spark.session import get_spark
    from octosql_spark.workloads import REGISTRY
    spark = get_spark("plan-audit")
    bad = 0
    for name, w in REGISTRY.items():
        try:
            df = w.build(spark, sf_dir)
            flags = audit(name, df, cartesian_ok=w.cartesian_ok)
        except Exception as ex:
            print(f"ERROR {name}: {ex}")
            bad += 1
            continue
        if flags:
            bad += 1
            print(f"FLAG  {name}: {'; '.join(flags)}")
    print(f"\n{len(REGISTRY)} plans audited, {bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
