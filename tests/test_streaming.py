"""Streaming subset tests (SURVEY.md §2.8/M6): file stream sources,
watermarks, windowed aggregation, stream-stream join, trigger mapping.
All runs use Trigger.AvailableNow (end-of-stream semantics — finite
inputs, like the reference's batch-as-stream model) so they terminate."""

from __future__ import annotations

import json
import uuid

import pytest

from octosql_spark import streaming as st


@pytest.fixture()
def events_dir(tmp_path):
    rows = [
        {"ts": "2024-01-01T00:00:05", "user": 1, "v": 1.0},
        {"ts": "2024-01-01T00:00:30", "user": 2, "v": 2.0},
        {"ts": "2024-01-01T00:01:10", "user": 1, "v": 3.0},
        {"ts": "2024-01-01T00:02:20", "user": 2, "v": 4.0},
        {"ts": "2024-01-01T00:00:01", "user": 1, "v": 9.0},  # late
    ]
    p = tmp_path / "stream"
    p.mkdir()
    (p / "part1.json").write_text("\n".join(json.dumps(r) for r in rows))
    return str(p)


def _mem(df, mode="append"):
    return st.run_to_memory(df, f"t_{uuid.uuid4().hex[:8]}", output_mode=mode)


def test_read_stream_and_windowed_agg(spark, events_dir):
    src = st.read_stream_file(spark, events_dir, "json")
    assert src.isStreaming
    from pyspark.sql import functions as F
    typed = src.withColumn("ts", F.col("ts").cast("timestamp"))
    wm = st.with_watermark(typed, "ts", "10 seconds")
    agg = st.windowed_aggregate(wm, "1 minute", ["user"],
                                [("count", "*", "n"), ("sum", "v", "sv")],
                                time_field="ts")
    # append mode: only watermark-finalized windows emit — the last
    # window (00:02) is held back because Spark does NOT flush state at
    # end-of-stream (deviation from the reference's WatermarkMaxValue
    # flush; use map_trigger("ON END OF STREAM") → update mode for that)
    out = _mem(agg)
    rows = {(r.user, str(r.window_start)[11:16], r.n, r.sv)
            for r in out.collect()}
    assert (1, "00:00", 2, 10.0) in rows  # late row in same micro-batch counts
    assert (2, "00:00", 1, 2.0) in rows
    assert not any(w == "00:02" for (_, w, _, _) in rows)

    # EOS trigger mapping flushes everything:
    mode, _kw = st.map_trigger("ON END OF STREAM")
    out2 = _mem(st.windowed_aggregate(wm, "1 minute", ["user"],
                                      [("count", "*", "n"), ("sum", "v", "sv")],
                                      time_field="ts"), mode=mode)
    rows2 = {(r.user, str(r.window_start)[11:16], r.n, r.sv)
             for r in out2.collect()}
    assert (2, "00:02", 1, 4.0) in rows2


def test_stream_stream_join(spark, events_dir):
    from pyspark.sql import functions as F
    src = st.read_stream_file(spark, events_dir, "json")
    typed = src.withColumn("ts", F.col("ts").cast("timestamp"))
    left = typed.select("user", F.col("ts").alias("lts"), "v")
    right = typed.select(F.col("user").alias("user_r"),
                         F.col("ts").alias("rts"))
    joined = st.stream_stream_join(
        left, right,
        (F.col("user") == F.col("user_r"))
        & (F.col("rts") >= F.col("lts"))
        & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 1 MINUTE")),
        "inner",
        left_watermark=("lts", "10 seconds"),
        right_watermark=("rts", "10 seconds"))
    out = _mem(joined)
    assert out.count() > 0


def test_trigger_mapping():
    assert st.map_trigger(None) == ("update", {"availableNow": True})
    assert st.map_trigger("ON END OF STREAM") == ("update", {"availableNow": True})
    assert st.map_trigger("ON WATERMARK") == ("append", {})
    mode, kw = st.map_trigger("COUNTING 100")
    assert mode == "update"
    with pytest.raises(ValueError):
        st.map_trigger("DELAY 5s")  # reference panics on Delay too


def test_update_mode_counting_equivalent(spark, events_dir):
    from pyspark.sql import functions as F
    src = st.read_stream_file(spark, events_dir, "json")
    agg = src.groupBy("user").agg(F.count(F.lit(1)).alias("n"))
    mode, kw = st.map_trigger("COUNTING 1")
    out = _mem(agg, mode=mode)
    rows = {(r.user, r.n) for r in out.collect()}
    assert rows == {(1, 3), (2, 2)}


def test_sliding_and_session_aggregates(spark, events_dir):
    from pyspark.sql import functions as F
    src = st.read_stream_file(spark, events_dir, "json")
    typed = src.withColumn("ts", F.col("ts").cast("timestamp"))
    slide = st.sliding_aggregate(typed, "2 minutes", "1 minute", ["user"],
                                 [("count", "*", "n")], "ts")
    out = _mem(slide, mode="update")
    rows = {(r.user, str(r.window_start)[11:16]): r.n for r in out.collect()}
    # user 1 events at 00:00:05, 00:01:10 (+late 00:00:01) fall in the
    # 23:59-00:01 and 00:00-00:02 and 00:01-00:03 sliding windows
    assert rows[(1, "00:00")] == 3  # all three user-1 events
    # session-window streaming aggs support append (with watermark) or
    # complete — not update (Spark constraint); finite input → complete
    sess = st.session_aggregate(typed, "1 minute", ["user"],
                                [("count", "*", "n")], "ts")
    out2 = _mem(sess, mode="complete")
    got = {(r.user, r.n) for r in out2.collect()}
    # user 1: 00:00:01+00:00:05 chain (gap 4s); 00:01:10 is 65s later
    # → a separate session. user 2: two singleton sessions.
    assert got == {(1, 2), (1, 1), (2, 1)}


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Replayed keys are dropped across micro-batches while the
    watermark still covers them; batch mode degrades to distinct."""
    import os
    from pyspark.sql import functions as F
    p = tmp_path / "dedup_stream"
    p.mkdir()
    rows1 = [{"ts": "2024-01-01T00:00:05", "doc": "a", "v": 1},
             {"ts": "2024-01-01T00:00:06", "doc": "b", "v": 2}]
    rows2 = [{"ts": "2024-01-01T00:00:07", "doc": "a", "v": 3},   # replay
             {"ts": "2024-01-01T00:00:08", "doc": "c", "v": 4}]
    f1, f2 = p / "p1.json", p / "p2.json"
    f1.write_text("\n".join(json.dumps(r) for r in rows1))
    f2.write_text("\n".join(json.dumps(r) for r in rows2))
    os.utime(f1, (1, 1)); os.utime(f2, (2, 2))  # order micro-batches
    src = st.read_stream_file(spark, str(p), "json",
                              maxFilesPerTrigger=1)
    typed = src.withColumn("ts", F.col("ts").cast("timestamp"))
    out = st.stream_dedup(typed, ["doc"], "ts", "1 minute")
    got = _mem(out).collect()
    docs = sorted(r.doc for r in got)
    assert docs == ["a", "b", "c"]  # the replayed "a" was dropped
    kept_a = [r.v for r in got if r.doc == "a"]
    assert kept_a == [1]            # first occurrence wins

    # batch path: same call, plain DataFrame
    b = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "doc string, v long")
    assert st.stream_dedup(b, ["doc"]).count() == 2


def test_stream_ingest_upsert_partitioned(spark, tmp_path):
    """Incremental-ingest upsert: foreachBatch applies each
    micro-batch as a partition-level MERGE, so a key replayed in a
    later batch REPLACES its earlier row instead of duplicating —
    the lakehouse upsert pattern on plain parquet."""
    import os
    from pyspark.sql import functions as F
    from octosql_spark.storage import upsert_partitioned, write_partitioned

    table = str(tmp_path / "table")
    base = spark.createDataFrame(
        [(1, "a", 10), (9, "z", 90)], "id long, part string, v long")
    write_partitioned(base, table, ["part"])

    src = tmp_path / "incoming"
    src.mkdir()
    b1 = [{"id": 2, "part": "a", "v": 20},
          {"id": 3, "part": "b", "v": 30}]
    b2 = [{"id": 2, "part": "a", "v": 21},   # replay: must replace
          {"id": 4, "part": "b", "v": 40}]
    f1, f2 = src / "b1.json", src / "b2.json"
    f1.write_text("\n".join(json.dumps(r) for r in b1))
    f2.write_text("\n".join(json.dumps(r) for r in b2))
    os.utime(f1, (1, 1)); os.utime(f2, (2, 2))

    stream = (st.read_stream_file(spark, str(src), "json",
                                  maxFilesPerTrigger=1)
              .select(F.col("id").cast("long"), "part",
                      F.col("v").cast("long")))
    q = (stream.writeStream
         .foreachBatch(lambda bdf, _id: upsert_partitioned(
             spark, table, bdf, ["id"], ["part"]))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)

    got = {(r.id, r.part, r.v) for r in spark.read.parquet(table).collect()}
    assert got == {(1, "a", 10), (9, "z", 90), (2, "a", 21),
                   (3, "b", 30), (4, "b", 40)}


def test_stream_near_dup_ingest(spark, tmp_path):
    """Streaming near-dup-free ingest with a STORED band index: batch
    1 seeds corpus+index; batch 2's exact copy and one-word-changed
    near copy of seeded docs are rejected by the index probe, a fresh
    doc is accepted, and a within-batch near-dup pair collapses to
    its min id. The index grows only by accepted documents."""
    import os
    from pyspark.sql import functions as F

    base = ("the quick brown fox jumps over the lazy dog while the "
            "sun sets slowly behind the tall green hills of summer")
    seeded2 = ("many colorful birds sing sweet morning songs in the "
               "old oak tree near the quiet village river bank today")
    fresh = ("completely different vocabulary about spacecraft "
             "engines orbital mechanics and interplanetary travel "
             "using ion propulsion systems for deep space missions")
    near = base.replace("lazy", "sleepy")          # near dup of doc 1
    twin_a = ("gentle ocean waves crash softly against the rocky "
              "northern shore as seagulls circle high above the old "
              "wooden fishing boats anchored in the misty harbor")
    twin_b = twin_a.replace("misty", "foggy")      # near dup of twin_a

    src = tmp_path / "incoming"
    src.mkdir()
    b1 = [{"doc_id": 1, "text": base}, {"doc_id": 2, "text": seeded2}]
    b2 = [{"doc_id": 10, "text": base},    # exact copy → rejected
          {"doc_id": 11, "text": near},    # near copy → rejected
          {"doc_id": 12, "text": fresh},   # new → accepted
          {"doc_id": 13, "text": twin_a},  # batch-internal pair:
          {"doc_id": 14, "text": twin_b}]  # keep 13, drop 14
    f1, f2 = src / "b1.json", src / "b2.json"
    f1.write_text("\n".join(json.dumps(r) for r in b1))
    f2.write_text("\n".join(json.dumps(r) for r in b2))
    os.utime(f1, (1, 1)); os.utime(f2, (2, 2))

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    stream = (st.read_stream_file(spark, str(src), "json",
                                  maxFilesPerTrigger=1)
              .select(F.col("doc_id").cast("long"), "text"))
    q = st.stream_near_dup_ingest(
        stream, corpus, index,
        checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    got = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert got == {1, 2, 12, 13}
    idx_ids = {r.corpus_id for r in spark.read.parquet(index).collect()}
    assert idx_ids == {1, 2, 12, 13}  # bands only for accepted docs


def test_checkpoint_restart_resumes_not_reprocesses(spark, tmp_path):
    """Stop/restart durability: a restarted query with the same
    checkpoint processes ONLY files that arrived while it was down —
    replaying none. The upsert sink makes reprocessing visible (a
    replayed batch would still converge, but the per-batch row count
    proves exactly-once file accounting)."""
    import os
    from pyspark.sql import functions as F
    from octosql_spark.storage import upsert_partitioned, write_partitioned

    table = str(tmp_path / "tbl")
    write_partitioned(
        spark.createDataFrame([(0, "a", 0)], "id long, part string, v long"),
        table, ["part"])
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    seen_batches: list[int] = []

    def apply(bdf, _id):
        n = bdf.count()
        if n:
            seen_batches.append(n)
            upsert_partitioned(spark, table, bdf, ["id"], ["part"])

    def run_once():
        stream = (st.read_stream_file(spark, str(src), "json")
                  .select(F.col("id").cast("long"), "part",
                          F.col("v").cast("long")))
        q = (stream.writeStream.foreachBatch(apply)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    (src / "f1.json").write_text(json.dumps({"id": 1, "part": "a", "v": 1}))
    run_once()
    # down-time arrival, then restart from the same checkpoint
    (src / "f2.json").write_text(json.dumps({"id": 2, "part": "a", "v": 2}))
    run_once()

    assert seen_batches == [1, 1]  # second run saw ONLY the new file
    got = {(r.id, r.v) for r in spark.read.parquet(table).collect()}
    assert got == {(0, 0), (1, 1), (2, 2)}


def test_stream_stream_left_outer_emits_unmatched(spark, tmp_path):
    """Watermarked LEFT OUTER stream-stream join: left rows with no
    right match within the interval condition ARE emitted (with
    NULLs) once the watermark passes — the semantics that need state
    expiry, impossible without both-side watermarks."""
    import os
    from pyspark.sql import functions as F
    p = tmp_path / "souter"
    p.mkdir()
    rows1 = [
        {"side": "L", "user": "a", "ts": "2024-01-01T00:00:01", "v": 1},
        {"side": "R", "user": "a", "ts": "2024-01-01T00:00:02", "v": 0},
        {"side": "L", "user": "b", "ts": "2024-01-01T00:00:03", "v": 2},
    ]
    # later batches must advance BOTH branch watermarks (the global
    # watermark is their MIN — a side with no new data pins it), and
    # outer-NULL eviction lands on the trigger AFTER the advance, so
    # batch 3 is the closing trigger
    rows2 = [{"side": "L", "user": "z", "ts": "2024-01-01T01:00:00",
              "v": 9},
             {"side": "R", "user": "zz", "ts": "2024-01-01T01:00:00",
              "v": 0}]
    rows3 = [{"side": "L", "user": "y", "ts": "2024-01-01T02:00:00",
              "v": 8},
             {"side": "R", "user": "yy", "ts": "2024-01-01T02:00:00",
              "v": 0}]
    f1, f2, f3 = p / "b1.json", p / "b2.json", p / "b3.json"
    f1.write_text("\n".join(json.dumps(r) for r in rows1))
    f2.write_text("\n".join(json.dumps(r) for r in rows2))
    f3.write_text("\n".join(json.dumps(r) for r in rows3))
    os.utime(f1, (1, 1)); os.utime(f2, (2, 2)); os.utime(f3, (3, 3))
    src = (st.read_stream_file(spark, str(p), "json", maxFilesPerTrigger=1)
           .withColumn("ts", F.col("ts").cast("timestamp")))
    left = (src.filter(F.col("side") == "L")
            .select("user", F.col("ts").alias("lts"), "v"))
    right = (src.filter(F.col("side") == "R")
             .select(F.col("user").alias("user_r"),
                     F.col("ts").alias("rts")))
    joined = st.stream_stream_join(
        left, right,
        (F.col("user") == F.col("user_r"))
        & (F.col("rts") >= F.col("lts"))
        & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 10 SECONDS")),
        "left_outer",
        left_watermark=("lts", "5 seconds"),
        right_watermark=("rts", "5 seconds"))
    got = {(r.user, r.user_r) for r in _mem(joined).collect()}
    assert ("a", "a") in got          # matched pair
    assert ("b", None) in got         # unmatched left emitted with NULLs


def test_nested_tvfs_streaming_front_door(spark, tmp_path):
    """tumble(max_diff_watermark(tail source)) through the SQL front
    door: nested TVF materialization composes and the result streams
    (r6 — pinned alongside the withWatermark dispatch fix)."""
    import time

    from octosql_spark.sources.files import (stop_tail_stagers,
                                              tail_stager_scope)
    from octosql_spark.sql import run_query
    p = tmp_path / "ev.json"
    p.write_text('{"ts": "2024-01-01T00:00:01", "v": 1}\n')
    with tail_stager_scope() as stagers:
        r = run_query(
            spark,
            "SELECT window_end, COUNT(*) AS n FROM tumble("
            "source => TABLE(SELECT * FROM max_diff_watermark("
            f"source => TABLE(SELECT * FROM '{p}?tail=true'), "
            "max_diff => INTERVAL 5 SECOND, time_field => DESCRIPTOR(ts))), "
            "window_length => INTERVAL 1 MINUTE) GROUP BY window_end")
    assert r.df.isStreaming
    q = (r.df.writeStream.outputMode("update")
         .format("memory").queryName("nested_tvf").start())
    try:
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT * FROM nested_tvf").count()
            if n:
                break
            time.sleep(0.5)
    finally:
        q.stop()
        stop_tail_stagers(stagers)  # direct run_query: no CLI teardown
    assert n == 1


def test_stream_stream_join_front_door(spark, tmp_path):
    """Two ?tail=true sources joined via comma-FROM: the transpiled
    plan is a stream-stream inner join and produces rows."""
    import time

    from octosql_spark.sql import run_query
    a, b = tmp_path / "a.json", tmp_path / "b.json"
    a.write_text('{"k": 1, "v": 10}\n')
    b.write_text('{"k": 1, "w": 20}\n')
    from octosql_spark.sources.files import (stop_tail_stagers,
                                              tail_stager_scope)
    with tail_stager_scope() as stagers:
        r = run_query(
            spark,
            f"SELECT x.v AS v, y.w AS w FROM '{a}?tail=true' x, "
            f"'{b}?tail=true' y WHERE x.k = y.k")
    assert r.df.isStreaming
    q = (r.df.writeStream.outputMode("append")
         .format("memory").queryName("ssj").start())
    try:
        # poll instead of a fixed sleep: under host load the first
        # micro-batch can take >8 s (closeout caught this flaking)
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM ssj").collect()
            if rows:
                break
            time.sleep(0.5)
    finally:
        q.stop()
        stop_tail_stagers(stagers)  # direct run_query: no CLI teardown
    assert [(r.v, r.w) for r in rows] == [(10, 20)]


def test_stream_near_dup_ingest_epoch_replay_idempotent(spark, tmp_path):
    """A foreachBatch REPLAY of a committed epoch must be idempotent:
    the probe reads only epochs BEFORE the replayed one, so accepted
    docs do not match themselves at Jaccard 1.0 and get erased (r8
    review: the old read included the epoch's own partitions — a
    crash-after-write replay permanently deleted the epoch). Also
    pins the per-epoch cache sweep: no persistent RDDs survive."""
    import json as _json
    import os
    from pyspark.sql import functions as F

    docs = [{"doc_id": 1, "text": "alpha beta gamma delta epsilon "
                                  "zeta eta theta iota kappa"},
            {"doc_id": 2, "text": "one two three four five six seven "
                                  "eight nine ten eleven twelve"}]
    src = tmp_path / "in"
    src.mkdir()
    (src / "b.json").write_text("\n".join(_json.dumps(r) for r in docs))
    corpus, index = str(tmp_path / "c"), str(tmp_path / "i")

    def run_once():
        stream = (st.read_stream_file(spark, str(src), "json")
                  .select(F.col("doc_id").cast("long"), "text"))
        # NO checkpoint: the second run re-delivers the same batch
        # with the same epoch_id=0 — exactly the replay shape
        q = st.stream_near_dup_ingest(stream, corpus, index)
        q.awaitTermination(120)

    base = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    run_once()
    assert {r.doc_id for r in spark.read.parquet(corpus).collect()} \
        == {1, 2}
    run_once()  # replay of epoch 0
    assert {r.doc_id for r in spark.read.parquet(corpus).collect()} \
        == {1, 2}  # NOT emptied
    assert {r.corpus_id for r in spark.read.parquet(index).collect()} \
        == {1, 2}
    # the per-epoch sweep released every cache the batches registered
    assert spark.sparkContext._jsc.sc().getPersistentRDDs().size() \
        == base


def test_near_dup_ingest_corrupt_corpus_clear_error(spark, tmp_path):
    """An index with prior epochs but a MISSING/epoch-less corpus is
    corruption, not first-epoch state: the batch fails with a clear
    error instead of an AttributeError on corpus.join (r8 advice)."""
    from pyspark.sql import functions as F

    # fabricate a prior-epoch index with no matching corpus table
    spark.createDataFrame(
        [(1, 0, 123)], "corpus_id long, band_id int, band_hash long"
    ).write.parquet(str(tmp_path / "index" / "epoch=0"))

    src = tmp_path / "incoming"
    src.mkdir()
    (src / "b.json").write_text(json.dumps(
        {"doc_id": 5, "text": "some fresh text about nothing much"}))
    stream = (st.read_stream_file(spark, str(src), "json")
              .select(F.col("doc_id").cast("long"), "text"))
    q = st.stream_near_dup_ingest(stream, str(tmp_path / "corpus"),
                                  str(tmp_path / "index"))
    with pytest.raises(Exception) as ei:
        q.awaitTermination(120)
    assert "refusing to ingest against a corrupt corpus" in str(ei.value)


def test_epoch_cache_sweep_spares_concurrent_caches(spark, tmp_path):
    """The per-epoch cache sweep releases exactly the frames the
    epoch persisted — a cache registered by a CONCURRENT query in the
    shared session survives the micro-batch (r8 advice: the old
    before/after diff of the global RDD map swept it too)."""
    from pyspark.sql import functions as F

    def live():
        return {int(k) for k in spark.sparkContext._jsc
                .getPersistentRDDs().keySet().toArray()}

    before = live()
    other = spark.range(100).select((F.col("id") * 2).alias("v")).persist()
    other.count()
    pre = live()
    mine = pre - before   # the concurrent query's cache entries
    assert mine

    src = tmp_path / "incoming"
    src.mkdir()
    (src / "b.json").write_text("\n".join(json.dumps(
        {"doc_id": i, "text": f"document number {i} about topic {i % 3}"})
        for i in range(6)))
    stream = (st.read_stream_file(spark, str(src), "json")
              .select(F.col("doc_id").cast("long"), "text"))
    q = st.stream_near_dup_ingest(stream, str(tmp_path / "corpus"),
                                  str(tmp_path / "index"))
    q.awaitTermination(120)
    post = live()
    assert mine <= post, "concurrent query's cache was swept"
    # and the epoch released everything IT persisted
    assert post == pre
    other.unpersist()


def test_tail_stager_scope_isolates_queries(tmp_path):
    """tail_stager_scope: stopping one query's stagers leaves a
    concurrent query's follower running (r8 advice: the global stop
    froze it)."""
    from octosql_spark.sources.files import (_stage_growing_file,
                                             stop_tail_stagers,
                                             tail_stager_scope)

    fa = tmp_path / "a.log"
    fb = tmp_path / "b.log"
    fa.write_text("one\n")
    fb.write_text("uno\n")
    with tail_stager_scope() as sa:
        _stage_growing_file(str(fa), poll_s=0.05)
    with tail_stager_scope() as sb:
        _stage_growing_file(str(fb), poll_s=0.05)
    assert len(sa) == 1 and len(sb) == 1
    assert stop_tail_stagers(sa) == 1
    assert sa[0].is_set() and not sb[0].is_set()
    # the global stop still ends the rest (>= because other tests may
    # have registered stagers of their own in this process)
    assert stop_tail_stagers() >= 1
    assert sb[0].is_set()


def test_tail_stager_scope_is_thread_local(tmp_path):
    """A scope open on thread A must not collect stagers started by a
    concurrent query on thread B (r9: a process-global scope list
    would have re-created the cross-query stop bug for genuinely
    concurrent queries)."""
    import threading

    from octosql_spark.sources.files import (_stage_growing_file,
                                             stop_tail_stagers,
                                             tail_stager_scope)

    fa = tmp_path / "a.log"
    fb = tmp_path / "b.log"
    fa.write_text("one\n")
    fb.write_text("uno\n")
    collected_b: list = []

    def other_query():
        with tail_stager_scope() as sb:
            _stage_growing_file(str(fb), poll_s=0.05)
        collected_b.extend(sb)

    with tail_stager_scope() as sa:
        _stage_growing_file(str(fa), poll_s=0.05)
        t = threading.Thread(target=other_query)
        t.start()
        t.join()
    assert len(sa) == 1 and len(collected_b) == 1
    assert sa[0] is not collected_b[0]
    stop_tail_stagers(sa)
    assert not collected_b[0].is_set()
    stop_tail_stagers(collected_b)
    assert collected_b[0].is_set()


def test_tail_stager_ownership_matrix(tmp_path):
    """Ownership contract across 2 concurrent threads × all three
    source shapes (single file / directory / glob) × both teardown
    orders (stop own first, then the other finishes) — the matrix the
    r9 verdict asked for beyond the one two-thread case: every scope
    collects exactly ITS thread's three stagers, stopping one scope
    never touches the other's, and the late stop still lands."""
    import threading

    from octosql_spark.sources.files import (_stage_growing_dir,
                                             _stage_growing_file,
                                             stop_tail_stagers,
                                             tail_stager_scope)

    scopes: dict[str, list] = {}
    barrier = threading.Barrier(2)

    def query_thread(tag: str) -> None:
        base = tmp_path / tag
        base.mkdir()
        (base / "one.log").write_text("x\n")
        d = base / "dir"
        d.mkdir()
        (d / "f.log").write_text("y\n")
        with tail_stager_scope() as mine:
            _stage_growing_file(str(base / "one.log"), poll_s=0.05)
            barrier.wait(timeout=10)  # both threads mid-scope at once
            _stage_growing_dir(str(d), poll_s=0.05)
            _stage_growing_dir(str(base / "*.log"), poll_s=0.05)
            barrier.wait(timeout=10)
        scopes[tag] = mine

    ts = [threading.Thread(target=query_thread, args=(tag,))
          for tag in ("qa", "qb")]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=30)
    assert len(scopes["qa"]) == 3 and len(scopes["qb"]) == 3
    assert not (set(map(id, scopes["qa"])) & set(map(id, scopes["qb"])))
    # stop own first: A's three end, B's three keep running
    assert stop_tail_stagers(scopes["qa"]) == 3
    assert all(ev.is_set() for ev in scopes["qa"])
    assert not any(ev.is_set() for ev in scopes["qb"])
    # finish other: B's stop is unaffected by A's earlier teardown
    assert stop_tail_stagers(scopes["qb"]) == 3
    assert all(ev.is_set() for ev in scopes["qb"])
    # idempotent re-stop: nothing left to signal in either scope
    assert stop_tail_stagers(scopes["qa"]) == 0
    assert stop_tail_stagers(scopes["qb"]) == 0


def test_stream_cluster_ingest_matches_full_recompute(spark, tmp_path):
    """Streaming cluster-label maintenance (r9 verdict #7's streaming
    twin): three micro-batches ingest near-dup docs — including a
    LATER doc whose id UNDERCUTS an existing cluster's label (5 joins
    {10,11}: the whole cluster must relabel to 5 via the delta path,
    not a rewrite) — and the resolved labels equal dedup_clusters run
    from scratch on the full corpus with the same LSH parameters."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    from octosql_spark.datapipe import dedup_clusters, minhash_lsh_pairs

    base = ("the quick brown fox jumps over the lazy dog while the "
            "sun sets slowly behind the tall green hills of summer")
    uniq = ("completely different vocabulary about spacecraft "
            "engines orbital mechanics and interplanetary travel "
            "using ion propulsion systems for deep space missions")
    fresh = ("many colorful birds sing sweet morning songs in the "
             "old oak tree near the quiet village river bank today")
    b1 = [{"doc_id": 10, "text": base},
          {"doc_id": 11, "text": base.replace("lazy", "sleepy")},
          {"doc_id": 12, "text": uniq}]
    b2 = [{"doc_id": 5, "text": base.replace("summer", "autumn")}]
    b3 = [{"doc_id": 20, "text": uniq.replace("deep", "far")},
          {"doc_id": 21, "text": fresh}]

    src = tmp_path / "in"
    src.mkdir()
    for i, b in enumerate((b1, b2, b3), 1):
        f = src / f"b{i}.json"
        f.write_text("\n".join(_json.dumps(r) for r in b))
        os.utime(f, (i, i))

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    labels = str(tmp_path / "labels")
    stream = (st.read_stream_file(spark, str(src), "json",
                                  maxFilesPerTrigger=1)
              .select(F.col("doc_id").cast("long"), "text"))
    q = st.stream_cluster_ingest(stream, corpus, index, labels,
                                 checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(240)

    got = {(r.doc_id, r.component)
           for r in st.read_cluster_labels(spark, labels).collect()}
    # every ingested doc got a label; the id-5 merge relabeled 10+11
    assert got == {(5, 5), (10, 5), (11, 5), (12, 12),
                   (20, 12), (21, 21)}
    # differential: full recompute on the whole corpus agrees
    all_docs = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for b in (b1, b2, b3) for r in b],
        "doc_id long, text string")
    pairs = minhash_lsh_pairs(all_docs)
    full = {(r.doc_id, r.cluster_id)
            for r in dedup_clusters(all_docs, pairs).collect()}
    assert got == full
    # delta discipline: epoch 1 wrote 3 rows; the id-5 merge wrote
    # rows only for the touched cluster (5, 10, 11), not for 12
    by_epoch = {}
    for r in spark.read.parquet(labels).collect():
        by_epoch.setdefault(r.epoch, set()).add((r.doc_id, r.component))
    assert by_epoch[0] == {(10, 10), (11, 10), (12, 12)}
    assert by_epoch[1] == {(5, 5), (10, 5), (11, 5)}
    assert by_epoch[2] == {(20, 12), (21, 21)}


def test_stream_cluster_ingest_combined_bucket_cap(spark, tmp_path):
    """ADVICE r10 (low): the ``max_bucket`` cap must count the UNION
    of prior-index and batch members per bucket — a bucket that is
    under the cap on each side separately but over it combined has to
    be suppressed, exactly as a from-scratch recompute suppresses it.
    With max_bucket=1: a prior doc and a near-dup batch doc occupy
    their shared buckets 1+1=2 > 1, so they must NOT link (the old
    per-side cap linked them); verbatim within-batch duplicates still
    link via the cap-exempt hash-chain edges, mirroring the batch
    operator's collapse exemption. The resolved labels equal
    dedup_clusters run from scratch with the same cap."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    from octosql_spark.datapipe import dedup_clusters, minhash_lsh_pairs

    base = ("the quick brown fox jumps over the lazy dog while the "
            "sun sets slowly behind the tall green hills of summer")
    vtext = ("many colorful birds sing sweet morning songs in the "
             "old oak tree near the quiet village river bank today")
    b1 = [{"doc_id": 1, "text": base}]
    b2 = [{"doc_id": 2, "text": base.replace("lazy", "sleepy")},
          {"doc_id": 3, "text": vtext},
          {"doc_id": 4, "text": vtext}]
    src = tmp_path / "in"
    src.mkdir()
    for i, b in enumerate((b1, b2), 1):
        f = src / f"b{i}.json"
        f.write_text("\n".join(_json.dumps(r) for r in b))
        os.utime(f, (i, i))
    labels = str(tmp_path / "labels")
    stream = (st.read_stream_file(spark, str(src), "json",
                                  maxFilesPerTrigger=1)
              .select(F.col("doc_id").cast("long"), "text"))
    q = st.stream_cluster_ingest(stream, str(tmp_path / "corpus"),
                                 str(tmp_path / "index"), labels,
                                 max_bucket=1,
                                 checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(240)
    got = {(r.doc_id, r.component)
           for r in st.read_cluster_labels(spark, labels).collect()}
    assert got == {(1, 1), (2, 2), (3, 3), (4, 3)}
    all_docs = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for b in (b1, b2) for r in b],
        "doc_id long, text string")
    full = {(r.doc_id, r.cluster_id) for r in dedup_clusters(
        all_docs, minhash_lsh_pairs(all_docs, max_bucket=1)).collect()}
    assert got == full


def test_compact_cluster_labels(spark, tmp_path):
    """Compaction folds every delta into the reserved BASE partition
    (epoch=-1, below every stream epoch id) and drops the stream
    epoch dirs; read_cluster_labels resolves identically before and
    after, and a node whose latest row lived only in an OLD epoch
    survives the fold."""
    labels = str(tmp_path / "labels")
    rows = {0: [(1, 1), (2, 1), (3, 3)],       # epoch 0
            1: [(2, 2)],                       # epoch 1: 2 relabeled
            2: [(4, 4)]}                       # epoch 2: new node
    for e, rs in rows.items():
        spark.createDataFrame(rs, "doc_id long, component long") \
            .write.mode("overwrite").parquet(f"{labels}/epoch={e}")
    before = {(r.doc_id, r.component)
              for r in st.read_cluster_labels(spark, labels).collect()}
    assert before == {(1, 1), (2, 2), (3, 3), (4, 4)}
    removed = st.compact_cluster_labels(spark, labels)
    assert removed == 3
    after = {(r.doc_id, r.component)
             for r in st.read_cluster_labels(spark, labels).collect()}
    assert after == before
    import os
    dirs = sorted(d for d in os.listdir(labels) if d.startswith("epoch="))
    assert dirs == ["epoch=-1"]
    # idempotent: base-only table is a no-op
    assert st.compact_cluster_labels(spark, labels) == 0


def test_compact_cluster_labels_survives_uncommitted_replay(spark,
                                                            tmp_path):
    """ADVICE r10 (medium): if the max epoch present at compaction
    time was written by a micro-batch that crashed BEFORE its
    checkpoint commit, the restart replays that epoch id and
    overwrites its dir. Under the old fold-into-max-epoch scheme that
    overwrite destroyed the compacted full state (older epochs were
    already deleted). With the base at epoch=-1 the replay can only
    touch its own dir: simulate the worst case — the replay writes an
    EMPTY delta over the former max epoch — and every node, including
    those whose latest row lived only in deleted older epochs, still
    resolves from the base."""
    labels = str(tmp_path / "labels")
    rows = {0: [(1, 1), (2, 1), (3, 3)],
            1: [(2, 2)],
            2: [(4, 4)]}  # pretend epoch 2's commit never landed
    for e, rs in rows.items():
        spark.createDataFrame(rs, "doc_id long, component long") \
            .write.mode("overwrite").parquet(f"{labels}/epoch={e}")
    assert st.compact_cluster_labels(spark, labels) == 3
    # replay of uncommitted epoch 2: prior = base only (epoch -1 < 2),
    # which already carries (4, 4) — the delta it rewrites is empty
    empty = spark.createDataFrame([], "doc_id long, component long")
    empty.write.mode("overwrite").parquet(f"{labels}/epoch=2")
    got = {(r.doc_id, r.component)
           for r in st.read_cluster_labels(spark, labels).collect()}
    assert got == {(1, 1), (2, 2), (3, 3), (4, 4)}


def test_stream_cluster_ingest_restart_and_compaction(spark, tmp_path):
    """Stop/restart durability for cluster maintenance: the restarted
    query processes only the file that arrived while it was down, its
    merge still relabels the existing cluster, and an offline
    compaction between the runs does not disturb the checkpointed
    epoch sequence (compaction folds into the reserved base epoch=-1,
    numbered below every stream epoch — it can never collide with the
    next batch id or be overwritten by a crash-replay)."""
    import json as _json

    from pyspark.sql import functions as F

    from octosql_spark.datapipe import dedup_clusters, minhash_lsh_pairs

    base = ("the quick brown fox jumps over the lazy dog while the "
            "sun sets slowly behind the tall green hills of summer")
    b1 = [{"doc_id": 10, "text": base},
          {"doc_id": 11, "text": base.replace("lazy", "sleepy")}]
    b2 = [{"doc_id": 5, "text": base.replace("summer", "autumn")}]
    src = tmp_path / "in"
    src.mkdir()
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    labels = str(tmp_path / "labels")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = (st.read_stream_file(spark, str(src), "json")
                  .select(F.col("doc_id").cast("long"), "text"))
        q = st.stream_cluster_ingest(stream, corpus, index, labels,
                                     checkpoint=ckpt)
        q.awaitTermination(180)

    (src / "b1.json").write_text("\n".join(_json.dumps(r) for r in b1))
    run_once()
    assert {(r.doc_id, r.component) for r in
            st.read_cluster_labels(spark, labels).collect()} == \
        {(10, 10), (11, 10)}
    # offline compaction while the stream is down: folds epoch 0 into
    # the base; the restarted stream's next epoch id (1, from the
    # checkpoint) is untouched by it
    assert st.compact_cluster_labels(spark, labels) == 1
    (src / "b2.json").write_text("\n".join(_json.dumps(r) for r in b2))
    run_once()
    got = {(r.doc_id, r.component) for r in
           st.read_cluster_labels(spark, labels).collect()}
    assert got == {(5, 5), (10, 5), (11, 5)}
    # restart processed ONLY b2: epoch 0 rows intact, epoch 1 = merge
    all_docs = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in b1 + b2],
        "doc_id long, text string")
    full = {(r.doc_id, r.cluster_id) for r in dedup_clusters(
        all_docs, minhash_lsh_pairs(all_docs)).collect()}
    assert got == full
    # compaction after the merge folds history and preserves state
    assert st.compact_cluster_labels(spark, labels) == 1
    assert {(r.doc_id, r.component) for r in
            st.read_cluster_labels(spark, labels).collect()} == got
