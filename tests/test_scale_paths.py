"""Scale-hazard regression tests: plans that must NOT degrade to
single-task stages, forced broadcasts, or per-row Python at size."""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import functions as F


def test_lookup_join_broadcasts_small_right(spark):
    from octosql_spark.operators.joins import lookup_join
    left = spark.range(0, 10_000).select(F.col("id").alias("k"))
    right = spark.range(0, 100).select(F.col("id").alias("k"),
                                       (F.col("id") * 2).alias("v"))
    j = lookup_join(left, right, ["k"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert j.count() == 100


def test_lookup_join_size_gates_big_right(spark):
    """A grown right side must NOT be force-broadcast (executor OOM at
    scale) — the hint drops and Catalyst picks a shuffle join."""
    from octosql_spark.operators.joins import lookup_join
    # both sides over the broadcast thresholds (range stats: 8 B/row →
    # left ~160 MB, right ~800 MB over the 256 MB hint gate)
    left = spark.range(0, 20_000_000).select(F.col("id").alias("k"))
    right = spark.range(0, 100_000_000).select(F.col("id").alias("k"))
    j = lookup_join(left, right, ["k"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan  # pre-fix: forced broadcast


def test_read_lines_custom_sep_splittable(spark, tmp_path):
    from octosql_spark.sources.files import read_lines
    p = tmp_path / "x.lines"
    p.write_text("alpha;beta;gamma")
    df = read_lines(spark, str(p), sep=";")
    rows = [(r.number, r.text) for r in df.orderBy("number").collect()]
    assert rows == [(0, "alpha"), (1, "beta"), (2, "gamma")]


def test_max_diff_watermark_no_global_sort(spark):
    """Default path must not funnel everything through one task: the
    plan has a partition-local window, not a global Window.orderBy."""
    from octosql_spark.tvf import max_diff_watermark
    rows = [(i, f"2024-01-01T00:00:{i % 60:02d}") for i in range(100)]
    df = spark.createDataFrame(rows, "i long, s string") \
        .select("i", F.col("s").cast("timestamp").alias("ts"))
    out = max_diff_watermark(df, "5 seconds", "ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # partitionBy(_pid) window: the sort specifies _pid as a partition
    # expression; a global sort would show an empty partition spec over
    # the full input
    assert "_pid" in plan
    out.count()  # executes


def test_max_diff_watermark_drops_late_rows(spark):
    from octosql_spark.tvf import max_diff_watermark
    # in-order rows, then one very late row
    ts = ["2024-01-01T00:00:00", "2024-01-01T00:00:10",
          "2024-01-01T00:00:30", "2024-01-01T00:00:02"]
    df = (spark.createDataFrame([(i, t) for i, t in enumerate(ts)],
                                "i long, s string")
          .coalesce(1)
          .select("i", F.col("s").cast("timestamp").alias("ts")))
    out = max_diff_watermark(df, "5 seconds", "ts")
    kept = sorted(r.i for r in out.collect())
    # row 3 (00:00:02) is behind watermark 00:00:30 - 5s → dropped
    assert kept == [0, 1, 2]


def test_max_diff_watermark_resolution_rounding(spark):
    from octosql_spark.tvf import max_diff_watermark
    # watermark = round_down(max prior ts, 1 minute) - 10s
    ts = ["2024-01-01T00:00:00", "2024-01-01T00:05:59", "2024-01-01T00:04:56"]
    df = (spark.createDataFrame([(i, t) for i, t in enumerate(ts)],
                                "i long, s string")
          .coalesce(1)
          .select("i", F.col("s").cast("timestamp").alias("ts")))
    # with 1-minute resolution the 00:05:59 max rounds DOWN to 00:05:00
    # → watermark 00:04:50 → 00:04:56 survives
    out = max_diff_watermark(df, "10 seconds", "ts", resolution="1 minute")
    assert sorted(r.i for r in out.collect()) == [0, 1, 2]
    # without rounding (1s resolution) the watermark is 00:05:49 → drop
    out2 = max_diff_watermark(df, "10 seconds", "ts", resolution="1 second")
    assert sorted(r.i for r in out2.collect()) == [0, 1]


class _FakeState:
    """Minimal GroupState stand-in for direct fn testing."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


def test_counting_fn_vectorized_matches_and_is_fast():
    from octosql_spark.streaming.counting_trigger import make_counting_fn
    n_rows = 100_000
    pdf = pd.DataFrame({"v": [float(i % 97) for i in range(n_rows)]})
    fn = make_counting_fn([("sum", "v", "s"), ("avg", "v", "a"),
                           ("min", "v", "lo"), ("max", "v", "hi"),
                           ("count", "v", "c")],
                          n=1000,
                          out_cols=["k", "emitted_at_count", "s", "a",
                                    "lo", "hi", "c"])
    st = _FakeState()
    t0 = time.time()
    out = list(fn(("k1",), iter([pdf]), st))
    elapsed = time.time() - t0
    assert elapsed < 2.0  # iterrows took tens of seconds at this size
    res = pd.concat(out)
    assert len(res) == n_rows // 1000
    # spot-check the first and last emissions against exact values
    first = res.iloc[0]
    assert first.emitted_at_count == 1000
    assert first.c == 1000
    assert abs(first.s - sum(i % 97 for i in range(1000))) < 1e-6
    last = res.iloc[-1]
    assert last.emitted_at_count == n_rows
    assert last.c == n_rows
    assert last.lo == 0.0 and last.hi == 96.0
    assert abs(last.s - sum(i % 97 for i in range(n_rows))) < 1e-6


def test_counting_fn_state_carries_across_batches():
    from octosql_spark.streaming.counting_trigger import make_counting_fn
    fn = make_counting_fn([("sum", "v", "s")], n=4,
                          out_cols=["k", "emitted_at_count", "s"])
    st = _FakeState()
    # 3 rows then 3 rows: boundary falls inside the second batch
    out1 = list(fn(("k",), iter([pd.DataFrame({"v": [1.0, 2.0, 3.0]})]), st))
    assert out1 == []
    out2 = list(fn(("k",), iter([pd.DataFrame({"v": [4.0, 5.0, 6.0]})]), st))
    res = pd.concat(out2)
    assert len(res) == 1
    assert res.iloc[0].emitted_at_count == 4
    assert res.iloc[0].s == 10.0  # 1+2+3+4


def test_semantic_dedup_cells_population_bounded(spark):
    """semantic_dedup(cells) must never do quadratic work in a hot
    cell: a skew-adversarial corpus (one dense region holding most of
    the data) must have every candidate join key's population bounded
    by the LSH bucket guard, not by the cell size."""
    import math
    from octosql_spark.datapipe.cluster import _cell_candidate_keys

    # one oversized cell whose members are SPREAD (2000 vectors over a
    # 120° arc — the coarse-cell hazard where all-pairs is mostly
    # wasted work; genuinely near-identical members sharing a bucket
    # is fine, their pairs are all real) + a small well-sized cell
    rows = [(i, [math.cos(math.radians(i * 0.06)),
                 math.sin(math.radians(i * 0.06))]) for i in range(2000)]
    rows += [(10_000 + j, [math.cos(math.radians(200 + j * 0.5)),
                           math.sin(math.radians(200 + j * 0.5))])
             for j in range(100)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    x = (e.select(F.col("vec_id").alias("_id"),
                  F.col("embedding").alias("_nv"))
         .withColumn("cell", F.when(F.col("_id") < 2000, 0).otherwise(1)))

    cap = 256
    keyed = _cell_candidate_keys(x, max_cell_population=cap,
                                 lsh_tables=4, lsh_planes=6, seed=42)
    sizes = (keyed.groupBy("cell", "table", "bucket")
             .agg(F.count(F.lit(True)).alias("n")).collect())
    hot = [r for r in sizes if r.cell == 0]
    cold = [r for r in sizes if r.cell == 1]
    # the skewed cell fanned out to LSH buckets (not the sentinel)...
    assert all(r.table >= 0 for r in hot)
    # ...and no single join key holds the whole hot cell
    assert max(r.n for r in hot) < 2000
    # the small cell kept paper-exact all-pairs (sentinel bucket)
    assert [(r.table, r.bucket) for r in cold] == [(-1, 0)]
    assert cold[0].n == 100


def test_semantic_dedup_cells_autoscales_k(spark):
    """n_cells is a floor: effective k grows with the corpus so the
    expected cell population stays ~target_cell_size."""
    import math
    from octosql_spark.datapipe import semantic_dedup
    rows = [(i, [math.cos(i * 0.01), math.sin(i * 0.01)])
            for i in range(400)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(e, threshold=0.9999, method="cells", n_cells=2,
                         target_cell_size=50)
    # with k auto-scaled to ~8 cells of ~50, the run completes and
    # every id appears exactly once
    got = out.collect()
    assert len(got) == 400
    assert len({r.vec_id for r in got}) == 400


def test_semantic_dedup_cells_plan_constant_in_k(spark):
    """Cell assignment must not inline centroids into the plan: with
    64 cells vs 4 the analyzed plan stays the same size (centers are
    model state + a LocalRelation join, never expression literals)."""
    import math
    from octosql_spark.datapipe import semantic_dedup
    rows = [(i, [math.cos(i * 0.017), math.sin(i * 0.017)])
            for i in range(800)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    plans = {}
    for tcs in (200, 12):  # k≈4 vs k≈67
        out = semantic_dedup(e, threshold=0.9999, method="cells",
                             n_cells=2, target_cell_size=tcs)
        plans[tcs] = len(out._jdf.queryExecution().analyzed().toString())
        assert out.count() == 800
    # pre-fix the k-struct literal made the big-k plan ~k times larger
    assert plans[12] < 2 * plans[200]


def test_semantic_dedup_two_level_assignment(spark):
    """Auto-k above flat_k_max switches to the coarse+residual
    two-level assignment: two ~sqrt(k) fits, every id assigned
    exactly once, cell ids within k1*k2."""
    import math
    from octosql_spark.datapipe import semantic_dedup
    rows = [(i, [math.cos(i * 0.013), math.sin(i * 0.013)])
            for i in range(600)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(e, threshold=0.9999, method="cells", n_cells=2,
                         target_cell_size=10, flat_k_max=16).collect()
    # k = ceil(600/10) = 60 > 16 → two-level path (k1=8, k2=8)
    assert len(out) == 600
    assert len({r.vec_id for r in out}) == 600


def test_session_hygiene_release_cached(spark, sf_dir):
    """Session-hygiene contract (ADVICE r6): cache-heavy entries (the
    LSH signature persists) pin their caches only until the consuming
    action; a long-lived session releases them via release_cached,
    after which the session holds ZERO persistent RDDs. The
    parallel-prefix operators (global_ntile et al.) no longer persist
    at all (r8 — exchange reuse replaces the cache), so their entries
    must leave the registry EMPTY even without release_cached."""
    from octosql_spark.session import cached_rdd_count, release_cached
    from octosql_spark.workloads import REGISTRY

    release_cached(spark)  # start clean regardless of test order
    df = REGISTRY["customer_rfm_segments"].build(spark, sf_dir)
    assert df.count() > 0
    assert cached_rdd_count(spark) == 0  # no leak without cleanup
    df = REGISTRY["dedup_minhash_lsh"].build(spark, sf_dir)
    assert df.count() >= 0  # consuming action: caches materialize
    assert cached_rdd_count(spark) > 0  # persists really registered
    release_cached(spark)
    assert cached_rdd_count(spark) == 0
