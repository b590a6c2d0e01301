"""Corpus curation: benchmark decontamination, deterministic
stratified sampling, sequence packing.

The three pipeline steps between "deduplicated corpus" and "training
batches" that every large pretraining run needs. All pure Catalyst
expressions — no Python in the row path — and every shuffle is
justified below per function.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from octosql_spark.datapipe.text import token_count


def _word_ngrams(text: Column, n: int) -> Column:
    """Array of word ``n``-grams (space-joined) of a text column.
    Pure HOF expression (sequence/transform/slice) — runs at scan
    speed; empty array for docs shorter than ``n`` words (guarded:
    Spark's ``sequence(1, 0)`` counts DOWN, it is not empty)."""
    ws = F.split(text, " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ws) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(ws, i, n)))
    return F.when(F.size(ws) >= n, grams).otherwise(
        F.array().cast("array<string>"))


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 4) -> DataFrame:
    """Benchmark decontamination: flag training documents that share
    any word ``n``-gram with a benchmark/eval set — the standard
    pretraining hygiene step (n-gram-overlap decontamination).

    Scale shape: the benchmark side is small by definition (eval sets
    are MBs against a 100 TB corpus), so its distinct gram set is
    broadcast and the corpus is flagged in a single scan — explode +
    broadcast LEFT SEMI join + distinct on the id. No corpus-sized
    shuffle; the only wide op is the final distinct over flagged ids
    (a tiny fraction of the corpus).

    Returns the distinct ``id_col`` values of contaminated documents.
    """
    bench_grams = (benchmark
                   .select(F.explode(_word_ngrams(F.col(text_col), n))
                           .alias("gram"))
                   .distinct())
    return (docs
            .select(F.col(id_col),
                    F.explode(_word_ngrams(F.col(text_col), n))
                    .alias("gram"))
            .join(F.broadcast(bench_grams), "gram", "left_semi")
            .select(id_col)
            .distinct())


# Knuth multiplicative hash constant (2654435761 = floor(2^32/phi)) —
# chosen over xxhash64/md5 because BOTH Spark and any SQL oracle can
# compute it exactly in BIGINT arithmetic, keeping the sample
# deterministic and engine-independent.
_KNUTH = 2654435761
_M32 = 4294967296


def sample_hash_bucket(id_col: Column) -> Column:
    """Deterministic [0,1) bucket for an integer id."""
    return ((id_col.cast("bigint") * F.lit(_KNUTH)) % F.lit(_M32)) / F.lit(_M32)


def sample_stratified(df: DataFrame, rates: dict[str, float],
                      strata_col: str = "source", id_col: str = "doc_id",
                      default_rate: float = 0.0) -> DataFrame:
    """Deterministic stratified sampling: keep each row with a
    per-stratum rate, decided by a multiplicative hash of its id —
    reproducible across runs/engines, no RNG state.

    Scale shape: map-only (a filter on scan), no shuffle at all; the
    per-stratum rate table is a literal CASE expression. This is how
    you downweight a crawl domain or upsample a quality tier over
    100 TB without a single exchange.
    """
    rate: Column = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(rate)
    return df.filter(sample_hash_bucket(F.col(id_col)) < rate)


def pack_sequences(docs: DataFrame, max_tokens: int = 512,
                   shard_col: str = "source", id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Sequence packing: concatenate documents in id order and split
    the token stream into fixed-size context windows ("packs"), the
    standard dense-batching step before pretraining. Each document is
    assigned the pack where its first token lands plus its offset in
    that pack (long docs spill into subsequent packs at training
    time; the pack id is the canonical placement).

    Scale shape: packing is per ``shard_col`` (a window PARTITION BY,
    one shuffle on the shard key) — matching how real pipelines pack
    within a shard/file rather than globally, which would serialize
    the corpus through one task. Parallelism = number of shards.
    """
    w = (Window.partitionBy(shard_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    n_tok = token_count(F.col(text_col))
    cum = F.sum(n_tok).over(w)
    start = cum - n_tok  # token offset of this doc's first token
    return docs.select(
        F.col(id_col), F.col(shard_col),
        n_tok.alias("n_tokens"),
        F.floor(start / max_tokens).alias("pack_id"),
        (start % max_tokens).alias("pack_offset"),
    )
