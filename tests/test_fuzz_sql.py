"""Differential SQL fuzz smoke: 40 seeded grammar queries through
engine.sql() vs DuckDB over the same parquet (tools/fuzz_sql.py).
Seeds are fixed, so this is deterministic in CI; the standalone tool
runs deeper sweeps. Complements the enumerated sqlc_* conformance
bank with combinatorial coverage."""

import duckdb
import pytest

from tools.fuzz_sql import TABLES, run_fuzz
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def test_fuzz_differential_smoke(engine, duck):
    bad = run_fuzz(40, seed0=1000, engine=engine, con=duck,
                   verbose=False)
    assert not bad, bad[:3]


def test_fuzz_native_filter_trees(engine, duck):
    from tools.fuzz_native import run_fuzz_native
    bad = run_fuzz_native(30, seed0=500, engine=engine, con=duck,
                          verbose=False)
    assert not bad, bad[:3]


def test_fuzz_hostile_literals(engine, duck):
    """String literals whose CONTENT is SQL-shaped (keywords,
    ARRAY[...], OVER (, doubled quotes, backslashes, rewrite trigger
    spellings) must pass through every rewrite untouched — the
    mask-once pipeline guarantee (sqlshim._MaskCtx)."""
    from tools.fuzz_sql import run_hostile_fuzz
    bad = run_hostile_fuzz(40, seed0=0, engine=engine, con=duck,
                           verbose=False)
    assert not bad, bad[:3]
