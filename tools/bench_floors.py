"""Build/refresh BENCH_FLOORS.json from bench.py output files.

Per-query floors (r9 verdict #3): the minimum seconds per query
across the given run files and any existing floors. Host load only
INFLATES measurements, so the min across runs converges on the
solo-clean figure from above — loaded runs can never push a floor
too low, they just contribute nothing. bench.py flags clean-block
measurements >1.5x their floor, separating real regressions from
host noise per-block.

Usage::

    python tools/bench_floors.py run1.json run2.json ...
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH_FLOORS.json")


def main(paths: list[str]) -> int:
    try:
        floors = json.load(open(OUT))["floors_sec"]
    except (OSError, KeyError, ValueError):
        floors = {}
    sources = []
    for p in paths:
        run = json.load(open(p))
        blocks = {k: v for k, v in run["queries"].items()
                  if k != "csv_groupby_baseline_shape"}
        blocks.update(run.get("tpch_suite", {}).get("queries", {}))
        # sf1 entries measured with count() semantics get a distinct
        # floor key: a semantics flip (r10 moved dedup_edit_distance
        # from collect() to count() timing) must invalidate the floor,
        # not silently blend two incomparable timing bases (ADVICE r10)
        count_sem = set(run.get("sf1_block", {})
                        .get("count_semantics", []) or [])
        for name, sec in (run.get("sf1_block", {})
                          .get("queries", {}) or {}).items():
            suffix = "#count" if name in count_sem else ""
            blocks[f"sf1/{name}{suffix}"] = sec
        for name, sec in blocks.items():
            if name not in floors or sec < floors[name]:
                floors[name] = sec
        sources.append({"file": os.path.basename(p),
                        "clean_blocks": sorted(
                            run.get("clean_blocks", [])),
                        "queries_absorbed": len(blocks)})
    body = {"floors_sec": dict(sorted(floors.items())),
            "note": ("per-query best-observed medians (min over "
                     "bench runs; load only inflates, so the min "
                     "approaches the solo-clean figure from above); "
                     "bench.py flags clean-block measurements >1.5x "
                     "these"),
            "updated_from": sources}
    with open(OUT, "w") as f:
        json.dump(body, f, indent=1)
    print(f"{len(floors)} floors -> {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
