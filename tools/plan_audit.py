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

# queries whose SEMANTICS are a cross product — cartesian is the plan
CARTESIAN_OK = {"join_cross", "ann_cosine_topk", "ann_lsh_topk",
                # broadcast query block vs compressed code table —
                # the intended ADC scan
                "ann_pq_topk",
                "agg_global", "scalar_subquery",
                # exact all-pairs verification variant by design (the
                # scale path is dedup_embedding_cosine_lsh)
                "dedup_embedding_cosine",
                # broadcasts the 1-row corpus count N (scalar IDF
                # denominator) — a 1×M BNLJ is the scalar-broadcast plan
                "text_tfidf_topk",
                # same shape: 1-row corpus token total broadcast as the
                # unigram-LM denominator
                "text_unigram_logprob",
                # 1-row corpus stats (N, Σdl, per-term df) broadcast as
                # the BM25 idf/avgdl inputs
                "text_bm25"}


def audit(name: str, df) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    flags = []
    if name not in CARTESIAN_OK and \
            ("CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan):
        flags.append("unintended cartesian/BNLJ")
    if "BatchEvalPython" in plan:
        flags.append("row-at-a-time Python UDF in plan")
    for m in re.finditer(r"ReadSchema: struct<([^>]*)", plan):
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
            flags = audit(name, df)
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
