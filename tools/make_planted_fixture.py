"""Generate the planted near-duplicate fixture (deterministic, seeded)
and print the pair sets each dedup operator finds on it.

The fixture is COMMITTED (tests/fixtures/planted_docs.json); this
script documents its construction and recomputes the expected pair
sets that the gate entries hard-code as VALUES oracles:

- ids 1..8 with 101..108: near-duplicate pairs — 60-word documents
  differing in exactly one word (shingle Jaccard ≈ 0.9, far above the
  0.5 thresholds).
- ids 51..54 with 151..154: exact-duplicate pairs (identical text →
  Jaccard 1.0, SimHash Hamming 0).
- ids 201..220: unique documents with per-document vocabulary — no
  shared shingles with anything (Jaccard 0; SimHash ~random distance).

Run:  python tools/make_planted_fixture.py [--write]
"""

from __future__ import annotations

import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "fixtures", "planted_docs.json")


def build_docs() -> list[dict]:
    rng = random.Random(42)
    common = [f"word{i}" for i in range(400)]
    docs = []
    for i in range(1, 9):
        base = [rng.choice(common) for _ in range(60)]
        docs.append({"doc_id": i, "text": " ".join(base)})
        near = list(base)
        near[30] = "CHANGED"
        docs.append({"doc_id": 100 + i, "text": " ".join(near)})
    for i in range(51, 55):
        text = " ".join(rng.choice(common) for _ in range(60))
        docs.append({"doc_id": i, "text": text})
        docs.append({"doc_id": 100 + i, "text": text})
    for d in range(201, 221):
        words = [f"u{d}w{j}" for j in range(30)]
        rng.shuffle(words)
        docs.append({"doc_id": d, "text": " ".join(words)})
    return docs


def main() -> int:
    docs = build_docs()
    if "--write" in sys.argv:
        with open(FIXTURE, "w") as f:
            for d in docs:
                f.write(json.dumps(d) + "\n")
        print(f"wrote {len(docs)} docs to {FIXTURE}")

    from octosql_spark.datapipe.dedup import (
        minhash_lsh_pairs, ngram_jaccard_pairs, simhash_near_dup_pairs)
    from octosql_spark.session import get_spark
    spark = get_spark("planted-fixture")
    df = spark.read.schema("doc_id long, text string").json(FIXTURE)

    planted_near = {(i, 100 + i) for i in range(1, 9)}
    planted_exact = {(i, 100 + i) for i in range(51, 55)}

    for name, pairs_df in [
        ("minhash", minhash_lsh_pairs(df).select("id_a", "id_b")),
        ("simhash", simhash_near_dup_pairs(df).select("id_a", "id_b")),
        ("ngram", ngram_jaccard_pairs(df).select("id_a", "id_b")),
    ]:
        found = {(r.id_a, r.id_b) for r in pairs_df.collect()}
        missing_exact = planted_exact - found
        cross_unique = {p for p in found if p[0] >= 201 or p[1] >= 201}
        print(f"{name}: found={sorted(found)}")
        print(f"  planted_near_recall="
              f"{len(planted_near & found)}/{len(planted_near)}"
              f"  missing_exact={sorted(missing_exact)}"
              f"  unique_doc_pairs={sorted(cross_unique)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
