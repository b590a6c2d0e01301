"""Smoke-run every registered workload at sf0.001 and sanity-check the
entry() contract. Full DuckDB oracle comparison lives in
tools/check_correctness.py (and the driver's own gate at sf0.01)."""

from __future__ import annotations

import pytest

from octosql_spark.workloads import REGISTRY


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_workload_runs(spark, sf_dir, name):
    df = REGISTRY[name].build(spark, sf_dir)
    # schema is resolvable and the query executes
    assert df.columns
    assert df.count() >= 0


def test_entry_contract(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    assert df.count() > 0
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30
