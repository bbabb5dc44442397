"""Driver-contract smoke: entry() produces rows with a stable schema;
every queries() entry runs at sf0.001; oracle_sql() covers every
SQL-expressible query (full value comparison lives in
tools/check_oracle.py at sf0.01)."""
from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"zoom", "tile_x", "tile_y", "n"}


def test_every_query_has_oracle_or_is_documented():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # round 2: every query now carries a DuckDB oracle (closed-form SQL
    # mirror, residual-zero frame, or independent-algorithm golden table)
    assert set(qs) - set(oracles) == set()


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_at_sf0001(spark, name):
    fn = entrymod.queries()[name]
    df = fn(spark, SF_DIR)
    assert df.count() >= 0  # materializes without error
