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


def _read_prior(sess, root: str, epoch_id: int):
    """Epoch-partitioned table restricted to epochs BEFORE this one.
    Two r8 review fixes: (1) a foreachBatch REPLAY of a committed
    epoch used to read the epoch's own partitions, so every accepted
    doc matched itself at Jaccard 1.0 and the overwrite emptied the
    epoch — the filter makes replays genuinely idempotent; (2)
    existence is probed by attempting the read, not os.path
    (driver-local checks silently skipped the probe for s3://-style
    paths)."""
    try:
        d = sess.read.parquet(root)
    except Exception:  # noqa: BLE001 — no table yet (first epoch)
        return None
    if "epoch" not in d.columns:
        return None
    return d.filter(F.col("epoch") < F.lit(epoch_id))


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


def read_cluster_labels(spark: SparkSession, labels_path: str,
                        id_col: str = "doc_id") -> DataFrame:
    """Current cluster labels from a ``stream_cluster_ingest`` delta
    table: per node, the row from the LATEST epoch wins. One window
    shuffle keyed by node — the read-side cost of writing O(delta)
    instead of O(corpus) per epoch."""
    from pyspark.sql.window import Window

    d = spark.read.parquet(labels_path)
    w = Window.partitionBy(id_col).orderBy(F.col("epoch").desc())
    return (d.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(id_col, "component"))


_COMPACT_BASE_EPOCH = -1  # reserved: below every foreachBatch epoch id


def compact_cluster_labels(spark: SparkSession, labels_path: str,
                           id_col: str = "doc_id") -> int:
    """Offline compaction for a ``stream_cluster_ingest`` label table:
    fold every delta into the reserved BASE partition
    ``epoch=-1`` (full latest-per-node state) and drop the stream
    epoch dirs, so ``read_cluster_labels``'s window and the ingest
    loop's pushdown scans stop paying for history. Run while the
    stream is stopped.

    The base epoch is numbered BELOW every possible stream epoch
    (foreachBatch ids start at 0), which makes compaction safe
    against checkpoint-uncommitted crashes (ADVICE r10): if the max
    epoch present was written by a micro-batch that crashed before
    its checkpoint commit, the restart REPLAYS that epoch id — under
    the old fold-into-max-epoch scheme the replay's overwrite of
    ``epoch=max`` destroyed the compacted full state (the older
    epochs it folded were already deleted). With the base at -1 the
    replay overwrites only its own epoch dir; ``_read_prior``'s
    ``epoch < replay_id`` filter still sees the base (which already
    incorporates the crashed epoch's labels), the replay recomputes
    the same merges, finds every endpoint already carrying its label,
    and writes an empty-or-equal delta — state is preserved either
    way. Ordering within compaction itself is also crash-aware: the
    full state is staged to ``.compact_tmp`` first, then written to
    the base, and stream epoch dirs are deleted only after the base
    write returns; the staged copy survives for manual recovery
    (true atomicity needs a table format with commit semantics — out
    of scope for plain parquet). Uses the Hadoop FileSystem API
    throughout, so the same code compacts HDFS/S3A-resident tables.

    Returns the number of stream epoch directories removed."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(labels_path)
    fs = root.getFileSystem(conf)
    if not fs.exists(root):
        return 0
    epochs = []
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith("epoch="):
            try:
                epochs.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    stream_epochs = [e for e in epochs if e > _COMPACT_BASE_EPOCH]
    if not stream_epochs:
        return 0
    tmp = jvm.org.apache.hadoop.fs.Path(labels_path + "/.compact_tmp")
    cur = read_cluster_labels(spark, labels_path, id_col)
    cur.write.mode("overwrite").parquet(tmp.toString())
    (spark.read.parquet(tmp.toString())
     .write.mode("overwrite")
     .parquet(f"{labels_path}/epoch={_COMPACT_BASE_EPOCH}"))
    removed = 0
    for e in sorted(stream_epochs):
        fs.delete(jvm.org.apache.hadoop.fs.Path(
            f"{labels_path}/epoch={e}"), True)
        removed += 1
    fs.delete(tmp, True)
    return removed


def stream_cluster_ingest(df: DataFrame, corpus_path: str,
                          index_path: str, labels_path: str,
                          id_col: str = "doc_id",
                          text_col: str = "text",
                          num_hashes: int = 64, bands: int = 16,
                          shingle: int = 3,
                          jaccard_threshold: float = 0.5,
                          max_bucket: int = 1000,
                          checkpoint: str | None = None,
                          trigger_kwargs: dict | None = None):
    """Continuous near-dup CLUSTER maintenance — the streaming twin of
    ``datapipe.cluster.cluster_ingest_components`` the same way
    ``stream_near_dup_ingest`` is the twin of
    ``minhash_ingest_near_dups`` (r9 verdict #7 extended to the
    ingest loop): every document is ACCEPTED (nothing is rejected;
    dedup policy becomes a downstream ``filter(node == component)``
    or a quality-aware representative pick), and three
    epoch-partitioned tables are maintained together:

    - ``corpus_path``: all ingested documents;
    - ``index_path``: their LSH band table (the probe index);
    - ``labels_path``: cluster-label DELTAS ``(id, component, epoch)``
      — only rows whose label changed (or is new) this epoch.
      ``read_cluster_labels`` resolves the current state
      (latest epoch per node).

    Per micro-batch: within-batch LSH pairs + batch-vs-corpus verified
    probe matches form the increment's edge set; labels merge via min-
    label propagation on the DELTA quotient graph. The label update is
    delta-oriented end-to-end — the full label table is NEVER
    rewritten or globally shuffled inside the loop:

    1. the increment endpoints' current labels come from a
       node-pushdown read of the delta table (latest row per endpoint);
    2. the (old label -> new label) remap is increment-bounded;
    3. members of relabeled components are found by a component-IN
       pushdown scan, re-checked against their own latest row (a node
       relabeled in an earlier epoch leaves stale rows carrying the
       old component — the latest-epoch check drops those), remapped,
       and written as this epoch's delta.

    At 100 TB the per-epoch cost is O(batch) signature work, one
    candidate-bucket probe join, and label scans bounded by the
    components the increment touches. A long-lived deployment
    compacts ``labels_path`` offline (rewrite latest-per-node as a
    fresh base epoch) exactly like any log-structured table.

    Correctness contract (pinned by the equivalence test): after any
    sequence of batches, ``read_cluster_labels`` equals
    ``dedup_clusters`` run from scratch on the full corpus with the
    same LSH parameters, for corpora whose LSH buckets stay within
    ``max_bucket``. Cap semantics AT the boundary (ADVICE r10):

    - each epoch counts a bucket's population over the UNION of the
      stored index and the batch's bands — the same population a
      recompute counts — so a bucket that exceeds the cap only when
      combined is suppressed on both paths alike;
    - verbatim within-batch duplicates always connect (linear
      hash-chain edges, cap-exempt), mirroring the batch operator's
      collapse exemption; verbatim duplicates split ACROSS epochs in
      an over-cap bucket may not — the batch collapse counts distinct
      contents where the stored index counts raw docs;
    - cap history is monotone: edges committed while a bucket was
      under the cap persist after later growth pushes it over,
      whereas a from-scratch recompute would suppress the whole
      bucket. Merges are never undone — by design (dedup merges are
      permanent); an exact-parity rebuild is ``dedup_clusters`` on
      the full corpus."""
    import os

    from octosql_spark.datapipe.dedup import (_band_table,
                                              _word_shingles,
                                              minhash_signatures)

    def _latest(rows: DataFrame) -> DataFrame:
        from pyspark.sql.window import Window
        w = Window.partitionBy(id_col).orderBy(F.col("epoch").desc())
        return (rows.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select(id_col, "component"))

    def _apply(batch: DataFrame, epoch_id: int) -> None:
        sess = batch.sparkSession
        epoch_caches: list = []

        def _persist(fr):
            fr = fr.persist()
            epoch_caches.append(fr)
            return fr

        batch = batch.select(id_col, text_col).dropDuplicates([id_col])
        prior_corpus = _read_prior(sess, corpus_path, epoch_id)
        if prior_corpus is not None:
            # replay / re-crawl idempotence: ids already ingested are
            # not new nodes (their cluster state is settled)
            batch = batch.join(prior_corpus.select(id_col), id_col,
                               "left_anti")
        batch = _persist(batch)
        try:
            # -- increment edge set --------------------------------
            # Candidates come from ONE combined bucket pass: the
            # batch's band table and the (bucket-restricted) prior
            # index are counted TOGETHER per (band_id, band_hash), and
            # ``max_bucket`` applies to that combined population — the
            # same population a from-scratch recompute counts — so a
            # bucket that exceeds the cap only when batch and prior
            # members are combined is suppressed on both paths alike
            # (ADVICE r10; the old code capped the two sides
            # independently). Within-batch candidate pairs and
            # batch-vs-corpus probes both draw from the surviving
            # buckets; verification is exact shingle Jaccard either
            # way. Verbatim within-batch duplicates additionally get
            # LINEAR hash-chain edges (connectivity needs a chain,
            # not a clique), so byte-identical docs cluster even when
            # their shared buckets blow past the cap — mirroring the
            # collapse semantics of the batch operator.
            bs = minhash_signatures(batch, text_col, num_hashes,
                                    shingle).select(id_col, "minhash")
            bb = _persist(_band_table(bs, id_col, num_hashes, bands)
                          .withColumnRenamed(id_col, "batch_id"))
            idx = _read_prior(sess, index_path, epoch_id)
            if idx is not None and prior_corpus is None:
                raise RuntimeError(
                    f"cluster ingest: index at {index_path} has "
                    f"prior epochs but corpus at {corpus_path} is "
                    f"missing — the tables are maintained "
                    f"together; refusing to ingest")
            if idx is not None:
                # restrict the stored index to the batch's candidate
                # buckets before any aggregation (r8 review: the full-
                # index groupBy shuffled every epoch per micro-batch)
                pb = (bb.select("band_id", "band_hash")
                      .dropDuplicates(["band_id", "band_hash"]))
                idx = _persist(
                    idx.join(pb, ["band_id", "band_hash"], "leftsemi")
                    .select("corpus_id", "band_id", "band_hash"))
            bsizes = (bb.groupBy("band_id", "band_hash")
                      .agg(F.count(F.lit(True)).alias("_bn")))
            if idx is not None:
                psizes = (idx.groupBy("band_id", "band_hash")
                          .agg(F.count(F.lit(True)).alias("_pn")))
                sizes = (bsizes.join(psizes, ["band_id", "band_hash"],
                                     "left")
                         .select("band_id", "band_hash",
                                 (F.col("_bn")
                                  + F.coalesce("_pn", F.lit(0)))
                                 .alias("_n")))
            else:
                sizes = bsizes.withColumnRenamed("_bn", "_n")
            ok = (sizes.filter(F.col("_n") <= max_bucket)
                  .select("band_id", "band_hash"))
            bbok = _persist(bb.join(ok, ["band_id", "band_hash"],
                                    "leftsemi"))
            bsh = _persist(batch.select(
                F.col(id_col).alias("batch_id"),
                _word_shingles(F.col(text_col), shingle).alias("_sa")))
            inter = F.size(F.array_intersect("_sa", "_sb"))
            union = F.size(F.array_union("_sa", "_sb"))
            # within-batch: self-join on surviving buckets (fan-out
            # bounded by max_bucket), verified with exact Jaccard
            wcand = (bbok.join(bbok
                               .withColumnRenamed("batch_id", "_b2"),
                               ["band_id", "band_hash"])
                     .filter(F.col("batch_id") < F.col("_b2"))
                     .select("batch_id", "_b2")
                     .dropDuplicates(["batch_id", "_b2"]))
            bsh2 = bsh.select(F.col("batch_id").alias("_b2"),
                              F.col("_sa").alias("_sb"))
            within = (wcand.join(bsh, "batch_id").join(bsh2, "_b2")
                      .filter((inter / union) >= jaccard_threshold)
                      .select(F.col("batch_id").alias("id_a"),
                              F.col("_b2").alias("id_b")))
            # verbatim dup chain edges (linear, cap-exempt)
            hashed = (batch.filter(F.col(text_col).isNotNull())
                      .select(id_col,
                              F.xxhash64(F.col(text_col)).alias("_h")))
            hgrp = (hashed.groupBy("_h")
                    .agg(F.array_sort(F.collect_list(id_col))
                         .alias("_ids"))
                    .filter(F.size("_ids") >= 2))
            chain = F.transform(
                F.slice(F.col("_ids"), 1, F.size("_ids") - 1),
                lambda x, i: F.struct(
                    x.alias("id_a"),
                    F.element_at(F.col("_ids"), i + 2).alias("id_b")))
            exact = (hgrp.select(F.explode(chain).alias("_p"))
                     .select("_p.id_a", "_p.id_b"))
            edges = within.unionByName(exact)
            if idx is not None:
                # bbok carries only surviving buckets, so the bucket
                # equi-join restricts idx to them implicitly
                cand = (bbok.join(idx, ["band_id", "band_hash"])
                        .select("batch_id", "corpus_id")
                        .dropDuplicates(["batch_id", "corpus_id"]))
                cids = (cand.select(F.col("corpus_id").alias(id_col))
                        .dropDuplicates([id_col]))
                csh = (prior_corpus.join(cids, id_col)
                       .select(F.col(id_col).alias("corpus_id"),
                               _word_shingles(F.col(text_col), shingle)
                               .alias("_sb")))
                cross = (cand.join(bsh, "batch_id")
                         .join(csh, "corpus_id")
                         .filter((inter / union) >= jaccard_threshold)
                         .select(F.col("batch_id").alias("id_a"),
                                 F.col("corpus_id").alias("id_b")))
                edges = edges.unionByName(cross)
            edges = _persist(edges)

            # -- delta label maintenance ---------------------------
            from octosql_spark.datapipe.cluster import (
                connected_components)
            prior_labels = _read_prior(sess, labels_path, epoch_id)
            ends = (edges.select(F.col("id_a").alias(id_col))
                    .union(edges.select(F.col("id_b").alias(id_col)))
                    .union(batch.select(id_col))
                    .distinct())
            if prior_labels is not None:
                known = _latest(prior_labels.join(F.broadcast(ends),
                                                  id_col, "leftsemi"))
                ends_lab = (ends.join(known, id_col, "left")
                            .select(id_col,
                                    F.coalesce("component",
                                               F.col(id_col))
                                    .alias("_lab")))
            else:
                ends_lab = ends.select(
                    id_col, F.col(id_col).alias("_lab"))
            ends_lab = _persist(ends_lab)
            la = ends_lab.select(F.col(id_col).alias("id_a"),
                                 F.col("_lab").alias("_la"))
            lb = ends_lab.select(F.col(id_col).alias("id_b"),
                                 F.col("_lab").alias("_lb"))
            quotient = (edges.join(la, "id_a").join(lb, "id_b")
                        .filter(F.col("_la") != F.col("_lb"))
                        .select(F.col("_la").alias("id_a"),
                                F.col("_lb").alias("id_b"))
                        .distinct())
            merged = connected_components(quotient)
            mapping = (merged.filter(F.col("node") != F.col("component"))
                       .select(F.col("node").alias("_old"),
                               F.col("component").alias("_new")))
            # endpoint + batch rows: remap through the quotient result
            fresh = (ends_lab.join(F.broadcast(mapping),
                                   ends_lab["_lab"] == F.col("_old"),
                                   "left")
                     .select(id_col,
                             F.coalesce("_new", F.col("_lab"))
                             .alias("component")))
            if prior_labels is not None:
                # other members of relabeled components: bounded
                # component-IN pushdown scan, re-checked against each
                # node's LATEST row so stale delta rows can't
                # resurrect an old component id
                # bounded collect: the remap is increment-sized; the
                # isin literal list gives the delta table a genuine
                # parquet pushdown. Past the cap, fall back to a
                # broadcast semi-join (no pushdown, still one scan).
                olds = [r["_old"]
                        for r in mapping.limit(10_001).collect()]
                if len(olds) > 10_000:
                    cand_nodes = (prior_labels.join(
                        F.broadcast(mapping),
                        prior_labels["component"] == F.col("_old"),
                        "leftsemi").select(id_col).distinct())
                else:
                    cand_nodes = (prior_labels
                                  .filter(F.col("component").isin(olds))
                                  .select(id_col).distinct())
                if olds:
                    hist = prior_labels.join(F.broadcast(cand_nodes),
                                             id_col, "leftsemi")
                    # the inner join against mapping below re-applies
                    # the component∈olds condition exactly (and
                    # correctly in the >cap fallback, where `olds` is
                    # truncated): only latest rows whose CURRENT
                    # component is a remapped old label survive
                    cur = _latest(hist)
                    moved = (cur.join(F.broadcast(mapping),
                                      cur["component"] == F.col("_old"))
                             .select(id_col,
                                     F.col("_new").alias("component")))
                    # endpoint rows already carry their remap in
                    # `fresh`; don't write a node twice in one epoch
                    moved = moved.join(ends, id_col, "left_anti")
                    fresh = fresh.unionByName(moved)
            # unchanged known endpoints don't need a delta row
            if prior_labels is not None:
                fresh = fresh.join(
                    known.withColumnRenamed("component", "_oldc"),
                    id_col, "left").filter(
                        F.col("_oldc").isNull()
                        | (F.col("_oldc") != F.col("component"))
                    ).select(id_col, "component")
            # epoch=<id> dir name IS the epoch column (partition
            # discovery on read) — writing it as a data column too
            # would collide with the discovered partition column
            fresh.write.mode("overwrite").parquet(
                os.path.join(labels_path, f"epoch={epoch_id}"))

            # -- corpus + index append -----------------------------
            batch.write.mode("overwrite").parquet(
                os.path.join(corpus_path, f"epoch={epoch_id}"))
            (bb.withColumnRenamed("batch_id", "corpus_id")
             .write.mode("overwrite").parquet(
                 os.path.join(index_path, f"epoch={epoch_id}")))
        finally:
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
