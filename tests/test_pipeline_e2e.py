"""End-to-end training-data pipeline: the datapipe operators composed
the way a real curation run chains them — each stage's output feeds
the next, with conservation/monotonicity invariants checked at every
hop. Catches interface drift between operators that unit tests (one
op at a time) cannot."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from octosql_spark.catalog import load_table


@pytest.fixture(scope="module")
def corpus(spark):
    docs = load_table(spark, "/root/testdata/sf0.01", "documents") \
        .select("doc_id", "text", "source")
    # plant exact dups and a benchmark-contaminated doc
    fox = ("the quick brown fox jumps over the lazy dog today and "
           "every single day after that as well it seems")
    extra = spark.createDataFrame(
        [(90001, fox, "web"), (90002, fox, "web")],
        "doc_id long, text string, source string")
    return docs.unionByName(extra).persist()


def test_full_curation_chain(spark, corpus):
    from octosql_spark.datapipe.dedup import exact_dedup
    from octosql_spark.datapipe.text import quality_metrics, token_count
    from octosql_spark.datapipe.curate import (
        decontaminate, pack_sequences, shard_shuffle)

    n0 = corpus.count()

    # 1. exact dedup on text (keeps min doc_id per text); rejoin the
    # surviving ids to the corpus to carry the other columns forward
    survivors = exact_dedup(corpus, cols=["text"]).select("doc_id")
    deduped = corpus.join(survivors, "doc_id")
    n1 = deduped.count()
    assert n1 < n0
    assert deduped.filter(F.col("doc_id").isin(90001, 90002)).count() == 1

    # 2. quality filter — monotone row loss, planted doc survives
    q = quality_metrics(deduped)
    kept = q.filter(F.col("q_score") >= 0.6) \
        .select("doc_id", "text", "source")
    n2 = kept.count()
    assert 0 < n2 <= n1
    assert kept.filter(F.col("doc_id") == 90001).count() == 1

    # 3. decontamination against a benchmark containing the fox text
    bench = spark.createDataFrame(
        [(1, "quick brown fox jumps over the lazy dog")],
        "qid long, text string")
    bad_ids = decontaminate(kept, bench, n=5)
    clean = kept.join(bad_ids, "doc_id", "left_anti")
    n3 = clean.count()
    assert n3 < n2  # the planted contaminated doc is gone
    assert clean.filter(F.col("doc_id") == 90001).count() == 0

    # 4. token accounting
    with_tok = clean.withColumn("n_tokens", token_count(F.col("text")))
    total_tokens = with_tok.agg(F.sum("n_tokens")).collect()[0][0]
    assert total_tokens > 0

    # 5. sequence packing — token conservation + placement invariants
    packed = pack_sequences(clean, max_tokens=256)
    assert packed.count() == n3
    assert packed.agg(F.sum("n_tokens")).collect()[0][0] == total_tokens
    assert packed.filter((F.col("pack_offset") < 0)
                         | (F.col("pack_offset") >= 256)).count() == 0
    # per shard: the first doc (min id) starts at pack 0 offset 0
    firsts = (packed.withColumn(
        "rk", F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"])
            .Window.partitionBy("source").orderBy("doc_id")))
        .filter(F.col("rk") == 1))
    assert firsts.filter((F.col("pack_id") != 0)
                         | (F.col("pack_offset") != 0)).count() == 0

    # 6. shard shuffle — deterministic, complete, bounded shards
    shards = shard_shuffle(clean, n_shards=8, seed=11)
    assert shards.count() == n3
    assert shards.select("shard_id").distinct().count() <= 8
    again = shard_shuffle(clean, n_shards=8, seed=11)
    a = sorted((r["doc_id"], r["shard_id"], r["sort_key"])
               for r in shards.collect())
    b = sorted((r["doc_id"], r["shard_id"], r["sort_key"])
               for r in again.collect())
    assert a == b
