"""Long-document stress: the corpus shape the gate data can't see.

Gate documents average ~54 words; real corpora run 10-100x longer,
which is exactly where interpreted-HOF costs surface (the r7 run of
this corpus caught the one real perf bug of that round: winnowing's
per-window HOF scan going quadratic in document length — 14.99 s jvm
vs 0.92 s arrow on the same selection). Committed as a tool per r7
verdict #8 so the table is re-recorded every round like the 10x
ratios.

Corpus: deterministic (seeded) 2,000 docs x ~3,000 words from a 4k
vocabulary with planted repeated spans (so duplicated_spans has real
work), ~40 MB text, staged once under /tmp.

Run: python tools/longdoc_stress.py  → one JSON line of warm medians;
SCALE.md records the per-round table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 2_000
WORDS_PER_DOC = 3_000
VOCAB = 4_000
SEED = 7
CORPUS = f"/tmp/octosql_longdoc_{N_DOCS}x{WORDS_PER_DOC}_s{SEED}.parquet"


def build_corpus(spark) -> None:
    if os.path.exists(CORPUS):
        return
    import random
    rng = random.Random(SEED)
    span = [f"w{rng.randrange(VOCAB)}" for _ in range(40)]
    rows = []
    for i in range(N_DOCS):
        toks = [f"w{rng.randrange(VOCAB)}" for _ in range(WORDS_PER_DOC)]
        if i % 5 == 0:  # planted duplicated span in 20% of docs
            p = rng.randrange(len(toks))
            toks[p:p] = span
        rows.append((i, " ".join(toks), f"src{i % 7}"))
    (spark.createDataFrame(rows, ["doc_id", "text", "source"])
     .repartition(16).write.mode("overwrite").parquet(CORPUS))


def warm_median(build, warmups: int = 1, runs: int = 3) -> float:
    for _ in range(warmups):
        build()
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        build()
        ts.append(time.perf_counter() - t0)
    return round(sorted(ts)[len(ts) // 2], 3)


def main() -> int:
    from octosql_spark.datapipe import (duplicated_spans,
                                        minhash_signatures,
                                        quality_metrics,
                                        winnowing_fingerprints)
    from octosql_spark.datapipe.text import tf_idf_top_terms
    from octosql_spark.session import get_spark, release_cached

    spark = get_spark("longdoc-stress")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    build_corpus(spark)
    d = spark.read.parquet(CORPUS)

    out: dict[str, float] = {}

    def run(name, build):
        out[name] = warm_median(build)
        release_cached(spark)
        print(f"  {name}: {out[name]}s", file=sys.stderr)

    run("duplicated_spans",
        lambda: duplicated_spans(d).count())
    run("minhash_signatures",
        lambda: minhash_signatures(d).count())
    run("quality_metrics",
        lambda: quality_metrics(d).count())
    run("tf_idf",
        lambda: tf_idf_top_terms(d).count())
    run("winnowing_jvm",
        lambda: winnowing_fingerprints(d, impl="jvm").count())
    run("winnowing_arrow",
        lambda: winnowing_fingerprints(d, impl="arrow").count())
    # the dispatch decision this corpus exists to pin: auto must take
    # the arrow path here (r9: auto = arrow whenever numpy/pandas
    # import — the vectorized path wins at every measured shape)
    run("winnowing_auto",
        lambda: winnowing_fingerprints(d).count())
    auto_ok = out["winnowing_auto"] < out["winnowing_jvm"] / 2
    print(json.dumps({"metric": "longdoc_stress",
                      "n_docs": N_DOCS, "words_per_doc": WORDS_PER_DOC,
                      "queries": out, "auto_takes_arrow_path": auto_ok}))
    return 0 if auto_ok else 1


if __name__ == "__main__":
    sys.exit(main())
