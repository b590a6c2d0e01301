"""Registry hygiene: every oracle must at least BIND in DuckDB
against the real table schemas (EXPLAIN — parse + resolve, no
execution). Catches oracle bitrot (renamed columns, typos, dialect
slips) in seconds where only the full checker would otherwise see
it."""

from __future__ import annotations

import duckdb
import pytest

from octosql_spark.workloads import REGISTRY

_TABLES = ["region", "nation", "customer", "supplier", "part",
           "orders", "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'/root/testdata/sf0.001/{t}.parquet'")
    return con


def test_every_oracle_binds_in_duckdb(duck):
    bad = []
    for name, w in REGISTRY.items():
        if w.oracle is None:
            continue
        try:
            duck.execute(f"EXPLAIN {w.oracle}")
        except Exception as ex:  # noqa: BLE001 — collecting all
            bad.append(f"{name}: {str(ex)[:120]}")
    assert not bad, "\n".join(bad)


def test_registry_shape():
    # every entry carries an oracle (max_diff_watermark_batch was the
    # last rows-only one; it now ships an invariant oracle);
    # every name is a valid identifier; headline set is non-empty
    rows_only = [n for n, w in REGISTRY.items() if w.oracle is None]
    assert rows_only == []
    assert all(n.replace("_", "").isalnum() for n in REGISTRY)
    assert any(w.headline for w in REGISTRY.values())
