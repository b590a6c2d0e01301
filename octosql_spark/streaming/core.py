"""Structured-Streaming mapping of the reference's dataflow engine
(SURVEY.md §2.8, §7-M6).

The reference models EVERYTHING as a retraction-capable record stream
with watermark metadata (execution/execution.go:58-106); batch files
are just streams that end. Spark splits the two worlds: DataFrames
for batch, Structured Streaming for unbounded input — with the
retraction/watermark machinery (the reference's hand-built btrees and
min-watermark alignment, stream_join.go:114-145) provided by the
engine's state store.

Mapping table:

| reference                               | here                      |
|-----------------------------------------|---------------------------|
| ``tail=true`` file source (files.go:26) | ``readStream`` file source|
| ``max_diff_watermark`` TVF              | ``withWatermark``         |
| TRIGGER ON WATERMARK (triggers.go:89)   | append output mode        |
| TRIGGER ON END OF STREAM (:182)         | batch / Trigger.AvailableNow |
| TRIGGER COUNTING n (:17)                | update mode (per-batch re-emission; counting granularity is per micro-batch, not per n records — documented deviation) |
| stream-stream join min-watermark buffering | Spark stream-stream join state + watermarks |
| ``stream_native`` retraction output     | console sink, update mode |
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from octosql_spark.operators.aggregate import AGGREGATES


def read_stream_file(spark: SparkSession, path: str, fmt: str = "json",
                     schema=None, **options) -> DataFrame:
    """Streaming file source — the ``tail=true`` equivalent
    (execution/files/files.go:26-68 re-opens and follows a file; the
    Spark idiom is new-file discovery in a directory)."""
    reader = spark.readStream.format(fmt)
    if schema is None:
        # streaming sources need a schema: infer from current
        # contents WITH the same reader options — header/sep/
        # multiLine change the inferred shape (r8 review: a csv
        # header=True stream inferred _c0.._cN from the headerless
        # static read)
        static = spark.read.format(fmt)
        for k, v in options.items():
            static = static.option(k, str(v))
        schema = static.load(path).schema
    reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def with_watermark(df: DataFrame, time_field: str, max_diff: str) -> DataFrame:
    """max_diff_watermark → withWatermark: watermark trails the max
    observed event time by ``max_diff`` and late rows are dropped —
    the same contract as max_diff_watermark.go:134-153."""
    return df.withWatermark(time_field, max_diff)


def _agg_cols(aggs: Sequence[tuple[str, str, str]]) -> list:
    """(name, column|'*', alias) triples → aggregate Columns (shared
    by the three window shapes — the builder was copy-pasted thrice,
    r8 review)."""
    return [AGGREGATES[n](F.lit(True) if c == "*" else F.col(c)).alias(a)
            for n, c, a in aggs]


def windowed_aggregate(df: DataFrame, window_length: str,
                       keys: Sequence[str],
                       aggs: Sequence[tuple[str, str, str]],
                       time_field: str = "ts") -> DataFrame:
    """tumble + GROUP BY window_end, keys — the reference's
    CustomTriggerGroupBy over a tumble TVF
    (custom_trigger_group_by.go:62-233 + tumble.go). State is bounded
    by the watermark; emission policy comes from the output mode at
    sink time (map_trigger). Exactly the slide == window_length case
    of ``sliding_aggregate``."""
    return sliding_aggregate(df, window_length, window_length, keys,
                             aggs, time_field)


def sliding_aggregate(df: DataFrame, window_length: str, slide: str,
                      keys: Sequence[str],
                      aggs: Sequence[tuple[str, str, str]],
                      time_field: str = "ts") -> DataFrame:
    """Sliding windows (exceeds parity: the reference has only tumble,
    §2.8). Each event contributes to window_length/slide windows."""
    return (df.groupBy(F.window(F.col(time_field), window_length, slide),
                       *keys)
              .agg(*_agg_cols(aggs))
              .withColumn("window_start", F.col("window.start"))
              .withColumn("window_end", F.col("window.end"))
              .drop("window"))


def session_aggregate(df: DataFrame, gap: str, keys: Sequence[str],
                      aggs: Sequence[tuple[str, str, str]],
                      time_field: str = "ts") -> DataFrame:
    """Session windows (exceeds parity): window closes after ``gap``
    of inactivity per key; state bounded by the watermark in
    streaming mode."""
    return (df.groupBy(F.session_window(F.col(time_field), gap), *keys)
              .agg(*_agg_cols(aggs))
              .withColumn("session_start", F.col("session_window.start"))
              .withColumn("session_end", F.col("session_window.end"))
              .drop("session_window"))


def stream_stream_join(left: DataFrame, right: DataFrame, on, how: str = "inner",
                       left_watermark: tuple[str, str] | None = None,
                       right_watermark: tuple[str, str] | None = None) -> DataFrame:
    """Stream-stream join: the reference's symmetric hash join with
    min-watermark buffering (stream_join.go:40-318) is what Spark's
    stream-stream join implements (state pruned by watermark)."""
    if left_watermark:
        left = left.withWatermark(*left_watermark)
    if right_watermark:
        right = right.withWatermark(*right_watermark)
    return left.join(right, on, how)


def map_trigger(spec: str | None):
    """OctoSQL TRIGGER spec (parser/parser.go:503-534) → (outputMode,
    writeStream trigger kwargs)."""
    s = (spec or "").strip().upper()
    if not s or s == "ON END OF STREAM":
        # the reference flushes all state at EOS (WatermarkMaxValue,
        # execution/execution.go:106). Spark's append mode would hold
        # back windows the watermark hasn't passed — update mode emits
        # every group by the time the AvailableNow run terminates.
        return "update", {"availableNow": True}
    if s == "ON WATERMARK":
        return "append", {}
    if s.startswith("COUNTING"):
        import re
        if not re.fullmatch(r"COUNTING\s+\d+", s):
            # a bare COUNTING (no record count) used to slip through
            # here and crash the exact-route regex downstream with an
            # AttributeError (r8 review) — it is a parse error in the
            # reference's grammar too (parser.go:503-534)
            raise ValueError(f"unsupported trigger: {spec!r} "
                             f"(COUNTING needs a record count)")
        # exact per-key counting semantics are implemented in
        # streaming/counting_trigger.py (applyInPandasWithState); this
        # mapping is the cheap approximation for generic aggregates:
        # update mode re-emits refined values per micro-batch.
        return "update", {}
    raise ValueError(f"unsupported trigger: {spec!r}")


def write_stream(df: DataFrame, fmt: str = "console", output_mode: str = "append",
                 path: str | None = None, checkpoint: str | None = None,
                 query_name: str | None = None, **trigger_kwargs):
    w = df.writeStream.format(fmt).outputMode(output_mode)
    if path:
        w = w.option("path", path)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    if query_name:
        w = w.queryName(query_name)
    if trigger_kwargs:
        w = w.trigger(**trigger_kwargs)
    return w.start()


def run_to_memory(df: DataFrame, name: str, output_mode: str = "append",
                  timeout_s: float = 120.0) -> DataFrame:
    """Run an AvailableNow pass into an in-memory table and return it —
    end-of-stream semantics (the reference's default for finite
    inputs), used by tests."""
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    if not q.awaitTermination(timeout_s):
        q.stop()  # a silent partial table is worse than the error
        raise TimeoutError(
            f"streaming pass {name!r} did not finish in {timeout_s}s")
    return df.sparkSession.table(name)


def stream_near_dup_ingest(df: DataFrame, corpus_path: str,
                           index_path: str,
                           id_col: str = "doc_id",
                           text_col: str = "text",
                           num_hashes: int = 64, bands: int = 16,
                           shingle: int = 3,
                           jaccard_threshold: float = 0.5,
                           max_bucket: int = 1000,
                           checkpoint: str | None = None,
                           trigger_kwargs: dict | None = None):
    """Continuous NEAR-duplicate-free corpus ingest — the streaming
    form of ``datapipe.dedup.minhash_ingest_near_dups`` with the
    index STORED instead of recomputed: the corpus's LSH band table
    (corpus_id, band_id, band_hash) is written once per accepted
    document and probed by every increment, which is the contract
    that survives a 100 TB corpus (per batch, signature work is
    O(batch), the probe is one equi-join against the bucketed index,
    and the corpus text is read only for candidate ids — predicate
    pushdown keeps that scan candidate-sized).

    Maintains two epoch-partitioned parquet tables:
    - ``corpus_path``: accepted documents (``epoch=<id>`` dirs, each
      written with overwrite → foreachBatch replays are idempotent);
    - ``index_path``: their band table, appended the same way.

    Per micro-batch: (1) within-batch collapse — LSH pairs drop the
    larger id of every verified pair (greedy min-id representative);
    (2) batch bands probe the stored index, candidates verify with
    exact shingle Jaccard against the candidate corpus rows only;
    (3) survivors and their bands land in this epoch's partitions.

    Returns the started StreamingQuery."""
    import os

    from pyspark.sql import functions as F

    from octosql_spark.datapipe.dedup import (_band_table,
                                              _word_shingles,
                                              minhash_lsh_pairs,
                                              minhash_signatures)

    def _read_prior(sess, root: str, epoch_id: int):
        """Epoch-partitioned table restricted to epochs BEFORE this
        one. Two r8 review fixes: (1) a foreachBatch REPLAY of a
        committed epoch used to read the epoch's own partitions, so
        every accepted doc matched itself at Jaccard 1.0 and the
        overwrite emptied the epoch — the filter makes replays
        genuinely idempotent; (2) existence is probed by attempting
        the read, not os.path (driver-local checks silently skipped
        the probe for s3://-style paths)."""
        try:
            d = sess.read.parquet(root)
        except Exception:  # noqa: BLE001 — no table yet (first epoch)
            return None
        if "epoch" not in d.columns:
            return None
        return d.filter(F.col("epoch") < F.lit(epoch_id))

    def _apply(batch: DataFrame, epoch_id: int) -> None:
        sess = batch.sparkSession
        # every frame THIS epoch persists lands here, so the finally
        # sweep releases exactly these — the old before/after diff of
        # the session-global RDD map unpersisted caches registered by
        # CONCURRENT queries sharing the session (r8 advice)
        epoch_caches: list = []

        def _persist(fr):
            fr = fr.persist()
            epoch_caches.append(fr)
            return fr

        batch = _persist(batch.select(id_col, text_col)
                         .dropDuplicates([id_col]))
        try:
            # collapse pinned True: micro-batches are small, so the
            # dup-ratio probe would cost an extra action per epoch
            # for nothing, and ingest batches are exactly the
            # dup-heavy shape the collapse exists for
            pairs = minhash_lsh_pairs(
                batch, id_col, text_col, num_hashes, bands, shingle,
                jaccard_threshold, max_bucket, collapse=True,
                cache_registry=epoch_caches)
            drop = (pairs.select(F.col("id_b").alias(id_col))
                    .dropDuplicates([id_col]))
            clean = _persist(batch.join(drop, id_col, "left_anti"))
            bs = minhash_signatures(clean, text_col, num_hashes,
                                    shingle).select(id_col, "minhash")
            bb = _persist(_band_table(bs, id_col, num_hashes, bands)
                          .withColumnRenamed(id_col, "batch_id"))
            idx = _read_prior(sess, index_path, epoch_id)
            if idx is not None:
                # restrict the stored index to the batch's CANDIDATE
                # buckets before any aggregation: the old full-index
                # groupBy shuffled every epoch per micro-batch (r8
                # review); the semi-join keeps the probe shuffle
                # candidate-bucket-sized
                pb = (bb.select("band_id", "band_hash")
                      .dropDuplicates(["band_id", "band_hash"]))
                idx = idx.join(pb, ["band_id", "band_hash"],
                               "leftsemi")
                sizes = (idx.groupBy("band_id", "band_hash")
                         .agg(F.count(F.lit(True)).alias("_n"))
                         .filter(F.col("_n") <= max_bucket).drop("_n"))
                cand = (bb.join(idx.join(sizes,
                                         ["band_id", "band_hash"]),
                                ["band_id", "band_hash"])
                        .select("batch_id", "corpus_id")
                        .dropDuplicates(["batch_id", "corpus_id"]))
                cids = (cand.select(F.col("corpus_id").alias(id_col))
                        .dropDuplicates([id_col]))
                corpus = _read_prior(sess, corpus_path, epoch_id)
                if corpus is None:
                    # index read succeeded but the corpus table is
                    # unreadable/epoch-less: the index and corpus are
                    # maintained TOGETHER, so a prior-epoch index
                    # without a matching corpus is corruption — fail
                    # the batch loudly rather than ingest documents
                    # whose candidate matches cannot be verified
                    # (r9 advice: this comment used to say "accept the
                    # whole batch", contradicting the raise below)
                    raise RuntimeError(
                        f"near-dup ingest: index at {index_path} has "
                        f"prior epochs but corpus at {corpus_path} is "
                        f"missing or lacks an 'epoch' column — the "
                        f"two tables are maintained together; refusing"
                        f" to ingest against a corrupt corpus")
                csh = (corpus.join(cids, id_col)
                       .select(F.col(id_col).alias("corpus_id"),
                               _word_shingles(F.col(text_col), shingle)
                               .alias("_sb")))
                bsh = clean.select(
                    F.col(id_col).alias("batch_id"),
                    _word_shingles(F.col(text_col), shingle).alias("_sa"))
                inter = F.size(F.array_intersect("_sa", "_sb"))
                union = F.size(F.array_union("_sa", "_sb"))
                matched = (cand.join(bsh, "batch_id")
                           .join(csh, "corpus_id")
                           .filter((inter / union) >= jaccard_threshold)
                           .select(F.col("batch_id").alias(id_col))
                           .dropDuplicates([id_col]))
                clean = clean.join(matched, id_col, "left_anti")
            clean.write.mode("overwrite").parquet(
                os.path.join(corpus_path, f"epoch={epoch_id}"))
            accepted = (sess.read.parquet(
                os.path.join(corpus_path, f"epoch={epoch_id}"))
                .select(F.col(id_col).alias("batch_id")))
            (bb.join(accepted, "batch_id")
             .withColumnRenamed("batch_id", "corpus_id")
             .write.mode("overwrite").parquet(
                 os.path.join(index_path, f"epoch={epoch_id}")))
        finally:
            # per-epoch frames must not accumulate over a long
            # stream: release exactly the frames THIS epoch persisted
            # (tracked via cache_registry — including
            # minhash_lsh_pairs' internal persists, which leaked 3
            # frames per micro-batch before the r8 sweep)
            for fr in epoch_caches:
                try:
                    fr.unpersist(False)
                except Exception:  # noqa: BLE001 — released race
                    pass

    w = df.writeStream.foreachBatch(_apply)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    w = w.trigger(**(trigger_kwargs or {"availableNow": True}))
    return w.start()


def stream_dedup(df: DataFrame, keys: Sequence[str],
                 time_field: str | None = None,
                 max_diff: str | None = None) -> DataFrame:
    """Streaming exact deduplication — the "dedup at ingest" step of a
    continuously-fed training corpus (drop re-crawled/replayed
    documents before they reach storage).

    With ``time_field`` + ``max_diff``, state is WATERMARK-BOUNDED:
    ``dropDuplicatesWithinWatermark`` keeps a key's fingerprint only
    until the watermark passes it, so state is O(keys per watermark
    horizon) — the only shape that survives an unbounded 100 TB/day
    stream. Without a watermark it falls back to
    ``dropDuplicates`` (state grows with distinct keys — bounded
    corpora only; Spark evicts nothing).

    Works identically on a batch DataFrame (Spark's unified model),
    where it degrades to a plain distinct-by-key."""
    if time_field is not None and max_diff is not None:
        wm = df.withWatermark(time_field, max_diff)
        if wm.isStreaming:
            return wm.dropDuplicatesWithinWatermark(list(keys))
        return wm.dropDuplicates(list(keys))
    return df.dropDuplicates(list(keys))
