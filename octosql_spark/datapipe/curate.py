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


def decontaminate_prefilter(docs: DataFrame, benchmark: DataFrame,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            n: int = 4) -> DataFrame:
    """``decontaminate`` for LARGE benchmark sets — e.g. holding out a
    test SPLIT of the corpus itself (GBs of grams), where broadcasting
    every distinct gram STRING stops fitting. Same result, two-level:

    1. PREFILTER: broadcast the benchmark's distinct 64-bit gram
       hashes (8 B/gram vs 50-100+ B for the strings — a Bloom filter
       in spirit, but a hash set keeps everything in native Catalyst
       expressions; Spark's BloomFilter object is only reachable from
       Python through a row-at-a-time UDF, the forbidden slow path).
       One map-only corpus scan keeps candidate docs; hash collisions
       make this a superset.
    2. VERIFY: re-join only the CANDIDATE docs' grams against the
       true benchmark gram strings via a SHUFFLE semi-join (the
       benchmark strings are shuffled once, never broadcast), so the
       xxhash64 collisions the prefilter admits (~n²/2⁶⁴) cost a few
       extra rows here, never a wrong answer.

    Output is byte-identical to ``decontaminate`` (the gate runs both
    against the same DuckDB oracle). At 100 TB with a 10 GB benchmark:
    plain ``decontaminate`` ships ~10 GB of strings to EVERY executor;
    this broadcasts ~1 GB of hashes and shuffles the strings once
    against the contaminated sliver."""
    bench_grams = (benchmark
                   .select(F.explode(_word_ngrams(F.col(text_col), n))
                           .alias("gram"))
                   .distinct())
    bench_hashes = bench_grams.select(
        F.xxhash64("gram").alias("_gh")).distinct()
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(_word_ngrams(F.col(text_col), n)).alias("gram"))
    # ONE corpus scan: the hash semi-join keeps candidate (id, gram)
    # ROWS directly, so the string verify sees only the sliver
    cand = doc_grams.join(F.broadcast(bench_hashes),
                          F.xxhash64("gram") == F.col("_gh"),
                          "left_semi")
    return (cand
            .join(bench_grams.hint("shuffle_hash"), "gram", "left_semi")
            .select(id_col)
            .distinct())


def semantic_decontaminate(corpus: DataFrame, eval_df: DataFrame,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           threshold: float = 0.9,
                           literal_max: int = 64,
                           max_eval: int = 100_000) -> DataFrame:
    """Embedding-level decontamination: flag corpus rows whose cosine
    similarity to ANY eval-set embedding reaches ``threshold`` —
    catches paraphrased benchmark leakage that n-gram
    ``decontaminate`` misses.

    Returns (id_col, max_eval_cosine) for contaminated rows only.

    Scale shape, two regimes by eval size:
    - ``<= literal_max`` (default 64) vectors: the normalized eval
      matrix ships as ONE runtime-indexed nested literal and the
      corpus is scored in a map-only scan — no join, no shuffle, no
      Python. The cutoff is a codegen bound, not a memory bound: the
      10x scale stress showed a ~2k-vector literal (~140k expression
      nodes) falls out of whole-stage codegen into minutes of
      single-task interpretation.
    - larger (up to ``max_eval``): the eval matrix broadcasts as one
      numpy array and each corpus batch scores against it with a
      single BLAS matmul inside Arrow-batched ``mapInPandas`` (the
      ``similarity.cosine_topk_bruteforce(impl="pandas")`` shape) —
      map-only, no shuffle; a Catalyst pair-join was measured ~100×
      slower here because each pair's zip_with dot allocates an
      intermediate array. For eval sets too big to broadcast, use
      ``dedup.embedding_near_dup_pairs`` (hyperplane-LSH buckets)
      between corpus and eval instead.
    """
    from octosql_spark.datapipe.similarity import _dot

    def _normed(df: DataFrame) -> DataFrame:
        # zero-norm guard: x/0 is NULL in Spark, which the literal
        # path would silently drop but the GEMM path would feed to
        # np.array as object-dtype rows and crash mid-job. A zero
        # vector has no direction (cosine undefined), so both
        # regimes consistently skip it.
        v = F.col(vec_col).cast("array<double>")
        n = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
        return (df.select(F.col(id_col), v.alias("_rawv"), n.alias("_n"))
                .filter(F.col("_n") > 0)
                .select(F.col(id_col),
                        F.transform("_rawv",
                                    lambda x: x / F.col("_n")).alias("_nv")))

    c = _normed(corpus)
    evn = _normed(eval_df)
    ev = evn.limit(literal_max + 1).select("_nv").collect()
    if not ev:
        return (c.select(id_col, F.lit(0.0).alias("max_eval_cosine"))
                .filter(F.lit(False)))
    if len(ev) <= literal_max:
        evlit = F.array(*[F.array(*[F.lit(float(x)) for x in r["_nv"]])
                          for r in ev])
        sims = F.transform(
            F.sequence(F.lit(0), F.lit(len(ev) - 1)),
            lambda j: _dot(F.col("_nv"), F.element_at(evlit, j + 1)))
        return (c.withColumn("max_eval_cosine", F.array_max(sims))
                .filter(F.col("max_eval_cosine") >= threshold)
                .select(id_col, "max_eval_cosine"))
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    rows = evn.limit(max_eval + 1).select("_nv").collect()
    if len(rows) > max_eval:
        raise ValueError(
            f"eval set exceeds max_eval={max_eval}; use "
            "embedding_near_dup_pairs(method='lsh') between corpus "
            "and eval for eval sets this large")
    q = np.array([r["_nv"] for r in rows], dtype="float64")
    bq = corpus.sparkSession.sparkContext.broadcast(q)

    def score(batches):
        Q = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.array(pdf["_nv"].tolist(), dtype="float64")
            mx = (C @ Q.T).max(axis=1)
            keep = mx >= threshold
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy()[keep],
                                "max_eval_cosine": mx[keep]})

    out_schema = StructType([c.schema[id_col],
                             StructField("max_eval_cosine", DoubleType())])
    return c.mapInPandas(score, out_schema)


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


def weighted_sample_wor(df: DataFrame, k: int,
                        weight_col: str | Column = "n_chars",
                        id_col: str = "doc_id",
                        seed: int = 1,
                        driver_topk_max: int = 10_000) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k rows, deterministic
    (Efraimidis & Spirakis 2006, IPL "Weighted random sampling with a
    reservoir"): each row gets key u^(1/w) for u ~ U(0,1) and the k
    largest keys are the sample — provably equivalent to sequential
    draws proportional to weight, without replacement.

    The uniform u is a multiplicative hash of (id, seed) — exact
    64-bit integer arithmetic, so the selected SET is reproducible
    across runs, partitionings, and engines (the DuckDB oracle
    computes the identical keys). Rows with weight <= 0 are excluded
    (they cannot be drawn).

    Scale shape: key assignment is map-only. For small k the winners
    come from ``orderBy(...).limit(k)`` — TakeOrderedAndProject, a
    per-partition top-k then a driver-side merge of up to
    #partitions·k rows. That driver merge is exactly wrong for LARGE
    k, so past ``driver_topk_max`` (default 10,000) the selection
    switches to the repo's parallel-prefix decomposition
    (budget_select / global_ntile): range-partition on the key,
    per-partition ranks + a broadcast #partitions-row offset table,
    filter global rank ≤ k — fully distributed, nothing on the
    driver. Same selected SET either way (exact top-k by key with id
    tiebreak), so both paths satisfy the same value oracle.
    """
    from pyspark.sql.window import Window
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    # (id + seed) * K, not id * K + seed: the latter leaves id=0 at
    # u ≈ seed/2^32 for EVERY seed (a near-zero key that can never
    # win) — seeding must pass through the multiplier to mix
    u_int = ((F.col(id_col).cast("bigint") + F.lit(int(seed)))
             * F.lit(_KNUTH)) % F.lit(_M32)
    u = (u_int + F.lit(1.0)) / F.lit(float(_M32 + 1))  # in (0, 1)
    key = F.pow(u, F.lit(1.0) / w.cast("double"))
    d = df.filter(w > 0).withColumn("_es_key", key)
    if k <= driver_topk_max:
        return (d.orderBy(F.col("_es_key").desc(), F.col(id_col).asc())
                .limit(k)
                .drop("_es_key"))
    # distributed top-k: parallel-prefix global rank, no driver merge.
    # No persist: the offset table and the final join subtrees
    # canonicalize to the same range Exchange, so exchange reuse makes
    # both read ONE shuffle output with identical boundaries (pinned
    # by tests/test_persist_hygiene.py) — a persist here leaked
    # executor storage to library callers (r7 verdict). With reuse
    # DISABLED the persist comes back as the consistency fallback
    # (r8 review; see operators.order_limit.global_ntile).
    from octosql_spark.operators.order_limit import (
        _exchange_reuse_enabled)
    d = (d.repartitionByRange(F.col("_es_key").desc(),
                              F.col(id_col).asc())
         .withColumn("_pid", F.spark_partition_id()))
    if not _exchange_reuse_enabled(df.sparkSession):
        d = d.persist()
    cnt = d.groupBy("_pid").agg(F.count(F.lit(1)).alias("_pc"))
    w_pid = (Window.orderBy("_pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    prior = cnt.select(
        "_pid", F.coalesce(F.sum("_pc").over(w_pid),
                           F.lit(0)).alias("_prior"))
    w_in = Window.partitionBy("_pid").orderBy(
        F.col("_es_key").desc(), F.col(id_col).asc())
    return (d.join(F.broadcast(prior), "_pid")
            .withColumn("_grank",
                        F.col("_prior") + F.row_number().over(w_in))
            .filter(F.col("_grank") <= k)
            .drop("_es_key", "_pid", "_prior", "_grank"))


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


def pack_bins_bfd(docs: DataFrame, max_tokens: int = 512,
                  shard_col: str = "source", id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Whole-document bin packing via best-fit-decreasing (BFD):
    every document goes intact into one bin of capacity
    ``max_tokens`` (the batching step for SFT-style examples that
    must not be split, complementing ``pack_sequences``' concat-and-
    split stream packing). BFD is in the classic 11/9-OPT
    approximation family: sort by token count descending (ties by
    id), place each doc in the tightest bin with room (ties → lowest
    bin id), open a new bin otherwise. Documents longer than
    ``max_tokens`` get a bin of their own (negative remaining
    capacity, so nothing else ever joins it).

    Chosen over first-fit's linear bin scan because best-fit is a
    bisect on a capacity-sorted list — O(n log n) per shard, where a
    naive first-fit loop went quadratic and serialized a 125k-doc
    shard for minutes in the 10x scale stress.

    Returns (id_col, shard_col, n_tokens, bin_id) with ``bin_id``
    numbered per shard in bin-creation order.

    Scale shape: packing is inherently sequential, so it runs per
    ``shard_col`` group as ONE Arrow-batched ``applyInPandas`` after
    a single shuffle on the shard key — parallelism = number of
    shards, each group bounded by shard size (the same contract real
    pipelines use: pack within a shard/file, never globally). The
    per-group loop is pure pandas/Python over (n_tokens, id) pairs —
    text never enters the Python worker.
    """
    import bisect

    slim = docs.select(F.col(id_col), F.col(shard_col),
                       token_count(F.col(text_col)).alias("n_tokens"))

    def _bfd(pdf):
        pdf = pdf.sort_values(["n_tokens", id_col],
                              ascending=[False, True],
                              kind="mergesort").reset_index(drop=True)
        bins: list[tuple[int, int]] = []  # (remaining, bin_id) ascending
        n_bins = 0
        placed: list[int] = []
        for nt in pdf["n_tokens"]:
            nt = int(nt)
            i = bisect.bisect_left(bins, (nt, -1))
            if i == len(bins):          # nothing fits -> new bin
                bid, rem = n_bins, max_tokens - nt
                n_bins += 1
            else:                       # tightest fit, ties -> min id
                rem, bid = bins.pop(i)
                rem -= nt
            bisect.insort(bins, (rem, bid))
            placed.append(bid)
        pdf["bin_id"] = placed
        return pdf

    # output schema carries the INPUT types for id/shard (an int or
    # date shard key must round-trip, not be coerced to string)
    from pyspark.sql.types import LongType, StructField, StructType
    schema = StructType([
        StructField(id_col, docs.schema[id_col].dataType),
        StructField(shard_col, docs.schema[shard_col].dataType),
        StructField("n_tokens", LongType()),
        StructField("bin_id", LongType())])
    return slim.groupBy(shard_col).applyInPandas(_bfd, schema)


def _dup_run_stats(arr: Column) -> Column:
    """Duplicate-run statistics of a string array, computed entirely
    inside the row: sort the array so equal units become adjacent
    runs, then one ``F.aggregate`` pass tracks the current run and
    flushes it when the unit changes. Returns a struct:

    - ``occ``:   occurrences belonging to non-unique units
                 (sum of run lengths over runs longer than 1)
    - ``chars``: the same occurrences weighted by unit length
    - ``best``:  count x length of the most frequent unit (ties
                 broken toward the longer unit) — the "top gram"
                 numerator
    - ``n``:     total unit count
    - ``len_total``: total unit chars

    Zero shuffle — repetition is a property of ONE document, and one
    document is one row, so counting grams cluster-wide (explode +
    groupBy on the gram string) would shuffle every token twice for
    an answer each row already holds. This runs at scan speed.
    """
    s = F.array_sort(arr)
    zero = F.lit(0).cast("long")

    def merge(acc, x):
        same = F.coalesce(acc["prev"] == x, F.lit(False))
        newrun = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        flush = (~same) & (acc["run"] > 1)
        return F.struct(
            x.alias("prev"),
            newrun.alias("run"),
            (acc["occ"] + F.when(flush, acc["run"]).otherwise(zero))
            .alias("occ"),
            (acc["chars"] + F.when(flush, acc["run"] * F.length(acc["prev"]))
             .otherwise(zero)).alias("chars"),
            F.greatest(acc["best"],
                       F.struct(newrun.alias("cnt"),
                                F.length(x).cast("long").alias("len")))
            .alias("best"),
            (acc["len_total"] + F.length(x)).alias("len_total"),
        )

    def finish(acc):
        last_dup = acc["run"] > 1
        return F.struct(
            (acc["occ"] + F.when(last_dup, acc["run"]).otherwise(zero))
            .alias("occ"),
            (acc["chars"] + F.when(last_dup,
                                   acc["run"] * F.length(acc["prev"]))
             .otherwise(zero)).alias("chars"),
            (acc["best"]["cnt"] * acc["best"]["len"]).alias("best"),
            acc["len_total"].alias("len_total"),
        )

    init = F.struct(
        F.lit(None).cast("string").alias("prev"), zero.alias("run"),
        zero.alias("occ"), zero.alias("chars"),
        F.struct(zero.alias("cnt"), zero.alias("len")).alias("best"),
        zero.alias("len_total"))
    stats = F.aggregate(s, init, merge, finish)
    return F.struct(stats["occ"].alias("occ"), stats["chars"].alias("chars"),
                    stats["best"].alias("best"), F.size(s).alias("n"),
                    stats["len_total"].alias("len_total"))


def repetition_metrics(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", top_n: int = 2,
                       dup_n: int = 5, line_sep: str = "\n") -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", Table A1) — the standard
    repetition filters between raw scrape and training corpus:

    - ``dup_line_frac``: occurrences of non-unique lines / all lines
      (lines = ``line_sep``-separated, trimmed, non-empty)
    - ``dup_line_char_frac``: same, weighted by line length
    - ``top_{n}gram_char_frac``: occurrences x length of the most
      frequent word ``top_n``-gram / total chars (ties broken toward
      the longer gram; the fraction is identical either way)
    - ``dup_{n}gram_char_frac``: occurrences x length summed over
      non-unique ``dup_n``-grams / total chars
    Both gram fractions are capped at 1: occurrences x length counts
    overlapping occurrences' characters multiply (Gopher counts each
    char once; this deterministic variant is an upper bound).
    - ``keep``: the Gopher thresholds (dup lines <= 0.30, top 2-gram
      <= 0.20, dup 5-gram <= 0.15) as a composite filter column

    Scale shape: ZERO shuffles — every metric is a function of one
    document, and one document is one row, so the line/gram counting
    happens inside the row with sorted-array run statistics
    (``_dup_run_stats``) instead of exploding grams into a
    cluster-wide groupBy. One corpus scan, narrow-only plan,
    parallelism = input splits; at 100 TB this is the difference
    between a tokenize-volume shuffle and none at all.
    """
    # The plan below is narrow (no shuffle), so its parallelism is the
    # scan's split count. A small local file arrives as ONE split and
    # would serialize this CPU-heavy map through one task; at real
    # scale the scan has >> cores splits and this branch never fires.
    sc = docs.sparkSession.sparkContext
    if docs.rdd.getNumPartitions() < sc.defaultParallelism:
        docs = docs.repartition(sc.defaultParallelism)

    t = F.col(text_col)
    lines = F.filter(F.transform(F.split(t, line_sep), lambda x: F.trim(x)),
                     lambda x: x != "")

    def frac(num: Column, den: Column) -> Column:
        # guard every denominator (ANSI mode: x/0 throws, not NULL)
        return F.round(F.coalesce(
            num / F.when(den > 0, den), F.lit(0.0)), 6)

    nc = F.length(t)
    out = docs.select(
        F.col(id_col), nc.alias("n_chars"),
        _dup_run_stats(lines).alias("L"),
        _dup_run_stats(_word_ngrams(t, top_n)).alias("T"),
        _dup_run_stats(_word_ngrams(t, dup_n)).alias("D"),
    ).select(
        F.col(id_col),
        frac(F.col("L.occ"), F.col("L.n")).alias("dup_line_frac"),
        frac(F.col("L.chars"), F.col("L.len_total"))
            .alias("dup_line_char_frac"),
        F.round(F.least(F.lit(1.0), frac(F.col("T.best"), F.col("n_chars"))),
                6).alias(f"top_{top_n}gram_char_frac"),
        F.round(F.least(F.lit(1.0), frac(F.col("D.chars"), F.col("n_chars"))),
                6).alias(f"dup_{dup_n}gram_char_frac"),
    )
    return out.withColumn(
        "keep", (F.col("dup_line_frac") <= 0.30)
                & (F.col(f"top_{top_n}gram_char_frac") <= 0.20)
                & (F.col(f"dup_{dup_n}gram_char_frac") <= 0.15))


def mixture_sample(docs: DataFrame, budget_tokens: int,
                   alpha: float = 0.5, seed: int = 17,
                   id_col: str = "doc_id", source_col: str = "source",
                   text_col: str = "text") -> DataFrame:
    """Temperature-weighted domain mixture sampling — the step that
    turns per-domain corpora into one training mix (the alpha-scaled
    multinomial of XLM-R / mT5: domain weight w_d proportional to
    tokens_d^alpha, renormalized; alpha < 1 upsamples small domains).
    Each domain is then downsampled to its token budget
    ``budget_tokens * w_d`` with a deterministic per-document
    keep/drop decision, so the same corpus + seed always yields the
    same mix (resumable pipelines, reproducible ablations).

    The keep decision hashes the document id through an LCG over the
    Mersenne prime 2^31-1 (products stay < 2^62 — ANSI-overflow-safe,
    and plain bigint arithmetic so any engine reproduces it exactly);
    a doc is kept when hash < rate * (2^31-1). Multiplicative hashing
    of sequential ids is equidistributed, so realized rates track
    targets even on tiny domains.

    Returns the kept docs as (id, source, n_tokens, sample_rate
    rounded to 6). Scale shape: one map-side-combined aggregation to
    the (tiny) domain table, an unpartitioned window over that
    domain table only (|domains| rows — never the corpus), and a
    broadcast join back; the corpus is scanned once and never
    shuffled."""
    p = 2147483647  # Mersenne 2^31-1
    a = 1103515245
    d = docs.select(F.col(id_col), F.col(source_col),
                    token_count(F.col(text_col)).alias("n_tokens"))
    dom = d.groupBy(source_col).agg(F.sum("n_tokens").alias("_t"))
    wsum = Window.partitionBy()  # the domain table only — stays tiny
    dom = (dom.withColumn("_pw", F.pow(F.col("_t").cast("double"),
                                       F.lit(float(alpha))))
           .withColumn("_w", F.col("_pw") / F.sum("_pw").over(wsum))
           .select(source_col,
                   F.least(F.lit(1.0),
                           F.lit(float(budget_tokens)) * F.col("_w")
                           / F.when(F.col("_t") > 0, F.col("_t")))
                   .alias("_rate")))
    # seed is added BEFORE the multiplication: (id+seed)*a mod p —
    # an additive-only seed would shift every hash by a constant and
    # barely change the kept set; pre-multiplication it decorrelates
    h = F.pmod(F.pmod(F.pmod(F.col(id_col), F.lit(p)) + F.lit(seed),
                      F.lit(p)) * F.lit(a), F.lit(p))
    return (d.join(F.broadcast(dom), source_col)
            .filter(h < F.round(F.col("_rate") * p).cast("long"))
            .select(id_col, source_col, "n_tokens",
                    F.round("_rate", 6).alias("sample_rate")))


def shard_shuffle(docs: DataFrame, n_shards: int = 1024, seed: int = 23,
                  id_col: str = "doc_id") -> DataFrame:
    """Deterministic global shuffle into training shards — the last
    step before a corpus becomes training input: every document gets
    a pseudo-random ``shard_id`` (which output file / worker reads
    it) and a ``sort_key`` (its position within the shard). Consuming
    shards in order, rows sorted by ``sort_key``, replays one fixed
    global permutation of the corpus — reproducible across runs and
    engines, resumable mid-epoch by (shard, key) checkpoint.

    The permutation is the same Mersenne-31 LCG as
    ``mixture_sample`` (pure bigint arithmetic); sharding is
    hash-partitioning, intra-shard order is a sort of corpus/n_shards
    rows per shard — no global sort, no driver state, any engine
    reproduces it bit-for-bit."""
    p = 2147483647
    a = 1103515245
    h = F.pmod(F.pmod(F.pmod(F.col(id_col), F.lit(p)) + F.lit(seed),
                      F.lit(p)) * F.lit(a), F.lit(p))
    return (docs.withColumn("sort_key", h)
            .withColumn("shard_id",
                        F.pmod(F.col("sort_key"), F.lit(n_shards))))


def chunk_documents(docs: DataFrame, chunk_tokens: int = 128,
                    stride: int = 96, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Overlapping context-window chunking: split each document's
    token stream into windows of ``chunk_tokens`` tokens advancing by
    ``stride`` (stride < chunk_tokens ⇒ overlap) — the standard
    pre-step for both RAG indexing and long-document training. Emits
    one row per chunk: (id, chunk_idx, start_token 1-based,
    n_chunk_tokens, chunk_text); the final chunk may be short.

    Coverage is complete: start positions are ``1 + k*stride`` while
    the previous window has not yet reached the last token (bound
    ``greatest(n - chunk_tokens + stride, 1)`` — the last start is the
    first one whose window covers token ``n``), so no tail tokens are
    dropped and no fully-redundant trailing window is emitted.

    Scale shape: entirely within-row — split, a generated start
    sequence, explode, array slice — a narrow map with zero shuffles.
    The chunk fan-out is output-proportional (≈ n_tokens/stride per
    doc), so a 100 TB corpus chunks in one scan at scan speed.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(words)
    # cap at n so stride > chunk_tokens (gap sampling) cannot emit an
    # empty window past the last token
    starts = F.sequence(
        F.lit(1),
        F.least(F.greatest(n - chunk_tokens + stride, F.lit(1)), n),
        F.lit(stride))
    return (docs
            .filter(F.length(F.trim(F.col(text_col))) > 0)
            .select(F.col(id_col), words.alias("_w"), n.alias("_n"),
                    F.explode(starts).alias("start_token"))
            .select(
                id_col,
                ((F.col("start_token") - 1) / stride).cast("long")
                .alias("chunk_idx"),
                F.col("start_token").cast("long"),
                F.least(F.lit(chunk_tokens),
                        F.col("_n") - F.col("start_token") + 1)
                .cast("long").alias("n_chunk_tokens"),
                F.concat_ws(" ", F.slice(F.col("_w"), F.col("start_token"),
                                         F.lit(chunk_tokens)))
                .alias("chunk_text")))


def budget_select(docs: DataFrame, budget_tokens: int,
                  score_col: str | Column = "score",
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Token-budget-capped selection: keep the highest-scoring
    documents, in deterministic (score DESC, id ASC) order, whose
    RUNNING token total stays within ``budget_tokens`` — the "give me
    the best N-token corpus" step every data-mix recipe ends with
    (inclusive cumulative sum: the document that exactly reaches the
    budget is kept, the one that would cross it is not).

    Returns (id_col, score, n_tokens, cum_tokens) for the selected
    rows.

    Scale shape: a naive global ORDER BY + running sum is ONE
    single-task window — the classic 100 TB anti-pattern. Instead the
    corpus is range-partitioned on the sort key, each partition
    computes its own prefix sums in parallel, and a #partitions-row
    boundary table (broadcast) supplies each partition's global
    offset — the same parallel-prefix decomposition as
    ``tvf.max_diff_watermark``. One range shuffle, no single-task
    stage, and the budget filter prunes before anything downstream.
    """
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    d = docs.select(F.col(id_col), score.alias("score"),
                    token_count(F.col(text_col)).alias("n_tokens"))
    # persisted: the boundary table and the final join BOTH consume
    # this frame, and repartitionByRange boundaries come from
    # per-instantiation sampling — without one shared materialization
    # the two branches could see DIFFERENT partitionings (exchange
    # reuse is plan-dependent under AQE), making _prior offsets wrong
    # (advisor-found r4)
    d = (d.repartitionByRange(F.col("score").desc(), F.col(id_col).asc())
         .withColumn("_pid", F.spark_partition_id())
         .persist())
    w_in = (Window.partitionBy("_pid")
            .orderBy(F.col("score").desc(), F.col(id_col).asc())
            .rowsBetween(Window.unboundedPreceding, 0))
    pid_tot = d.groupBy("_pid").agg(F.sum("n_tokens").alias("_ptot"))
    w_pid = (Window.orderBy("_pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    # #partitions rows — bounded by cluster parallelism, not data
    prior = pid_tot.select(
        "_pid", F.coalesce(F.sum("_ptot").over(w_pid),
                           F.lit(0)).alias("_prior"))
    return (d.join(F.broadcast(prior), "_pid")
            .withColumn("cum_tokens",
                        (F.col("_prior") + F.sum("n_tokens").over(w_in))
                        .cast("long"))
            .filter(F.col("cum_tokens") <= budget_tokens)
            .select(id_col, "score", "n_tokens", "cum_tokens"))


def length_buckets(docs: DataFrame, batch_size: int = 32,
                   id_col: str = "doc_id", source_col: str = "source",
                   text_col: str = "text") -> DataFrame:
    """Length-bucketed batching: assign each document a power-of-two
    token-length bucket (floor(log2(n_tokens))) and a batch index
    within its (source, bucket) group — grouping similar-length
    sequences so a training/inference batch pads to the bucket bound
    instead of the corpus maximum (the classic padding-efficiency
    trick).

    Scale shape: the bucket id is a map-only expression; the batch
    index is a window PARTITIONed BY (source, bucket) — parallelism =
    shards × buckets, matching how real pipelines batch per shard.
    ``log2`` is exact at power-of-two boundaries in IEEE doubles, so
    the bucket edges are engine-independent.
    """
    n_tok = token_count(F.col(text_col))
    d = (docs.select(F.col(id_col), F.col(source_col),
                     n_tok.alias("n_tokens"))
         .filter(F.col("n_tokens") > 0)
         .withColumn("bucket", F.floor(F.log2("n_tokens")).cast("long")))
    w = Window.partitionBy(source_col, "bucket").orderBy(id_col)
    return d.withColumn(
        "batch_idx",
        ((F.row_number().over(w) - 1) / batch_size).cast("long"))


def assign_splits(docs: DataFrame, test_frac: float = 0.05,
                  valid_frac: float = 0.05, id_col: str = "doc_id",
                  text_col: str = "text",
                  key_col: Column | None = None) -> DataFrame:
    """Leakage-safe train/valid/test split: the split decision hashes
    the CONTENT fingerprint (md5 prefix), not the document id, so
    exact duplicates always land in the same split — the hygiene rule
    that stops a train/test leak through copies of the same page.
    Pass ``key_col`` (any expression — a dedup-cluster representative
    id, a URL domain) to extend the guarantee to near-duplicate
    clusters; it is md5-hashed internally, so short / low-entropy /
    non-hex keys are safe and uniformly distributed.

    Deterministic and engine-reproducible: the first 8 md5 hex chars
    parse to a 32-bit integer, ``u = h / 2^32`` is an exact double in
    [0, 1), and split boundaries compare against the same literals
    everywhere. Map-only — a projection on the scan, zero shuffles.
    """
    raw = key_col if key_col is not None else F.col(text_col)
    key = F.md5(raw.cast("string"))
    u = (F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
         / F.lit(4294967296.0))
    split = (F.when(u < test_frac, F.lit("test"))
             .when(u < test_frac + valid_frac, F.lit("valid"))
             .otherwise(F.lit("train")))
    return docs.withColumn("split", split)


def chunk_sentences(docs: DataFrame, max_tokens: int = 64,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Sentence-boundary chunking: split on sentence punctuation and
    greedily pack CONSECUTIVE sentences into chunks of ≤ ``max_tokens``
    whitespace tokens, never splitting a sentence (an over-long
    sentence becomes its own chunk) — the retrieval-passage shape
    where ``chunk_documents``'s fixed token windows would cut
    mid-sentence.

    Returns (id_col, chunk, n_sentences, n_tokens), chunk 1-based.

    Scale shape: the greedy sequential fold is a WITHIN-ROW
    ``aggregate`` over the sentence array (struct accumulator:
    current chunk, running tokens, per-sentence assignment) — pure
    codegen, zero Python, and the only shuffle is the final per-chunk
    count. The same fold is sequential-by-nature, which is exactly
    why it lives inside the row instead of a window: a reset-on-
    overflow running sum is not window-expressible, and a cross-row
    implementation would serialize the document stream.
    """
    sents = F.filter(
        F.split(F.trim(F.col(text_col)), r"[.!?]+\s+"),
        lambda s: F.length(F.trim(s)) > 0)
    nts = F.transform(
        sents, lambda s: F.size(F.filter(F.split(F.trim(s), r"\s+"),
                                         lambda w: w != F.lit(""))))
    acc0 = F.struct(F.lit(0).alias("chunk"), F.lit(0).alias("running"),
                    F.array().cast("array<int>").alias("out"))
    fits = lambda a, nt: (a["running"] + nt <= max_tokens) \
        & (a["running"] > 0)  # noqa: E731 — shared by both branches
    fold = F.aggregate(
        nts, acc0,
        lambda a, nt: F.struct(
            F.when(fits(a, nt), a["chunk"]).otherwise(a["chunk"] + 1)
            .alias("chunk"),
            F.when(fits(a, nt), a["running"] + nt).otherwise(nt)
            .alias("running"),
            F.concat(a["out"], F.array(
                F.when(fits(a, nt), a["chunk"])
                .otherwise(a["chunk"] + 1))).alias("out")))
    pairs = F.arrays_zip(fold["out"].alias("chunk"), nts.alias("nt"))
    return (docs
            .filter(F.length(F.trim(F.col(text_col))) > 0)
            .select(F.col(id_col), F.explode(pairs).alias("p"))
            .groupBy(id_col, F.col("p.chunk").cast("long").alias("chunk"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_sentences"),
                 F.sum("p.nt").cast("long").alias("n_tokens")))
