"""poll TVF (table_valued_functions/poll.go) + file-table read options
(`?header=false` — the reference's datasource options surface)."""

from __future__ import annotations

from pyspark.sql import functions as F

from octosql_spark.sql import run_query
from octosql_spark.tvf import poll


def test_poll_rounds(spark):
    # each round re-runs the subquery and REPLACES the previous rows
    # (retract-then-emit, poll.go:104-149) with a poll_time column
    rounds = list(poll(spark,
                       lambda s: s.range(3).select(F.col("id").alias("i")),
                       rounds=2, sleep=False))
    assert len(rounds) == 2
    for df in rounds:
        rows = df.collect()
        assert [r.i for r in rows] == [0, 1, 2]
        assert "poll_time" in df.columns
        assert all(r.poll_time is not None for r in rows)


def test_poll_via_sql_frontend(spark):
    df = run_query(spark, "SELECT COUNT(*) AS n FROM "
                          "poll(source => TABLE(SELECT * FROM range(1, 6)))").df
    r = df.collect()[0]
    assert r.n == 5


def test_csv_header_option(spark, tmp_path):
    p = tmp_path / "raw.csv"
    p.write_text("1,alpha\n2,beta\n")
    df = run_query(spark, f"SELECT * FROM `{p}?header=false`").df
    assert df.count() == 2
    assert df.columns == ["col0", "col1"]  # headerless naming
    vals = sorted((r.col0, r.col1) for r in df.collect())
    assert vals == [(1, "alpha"), (2, "beta")]
