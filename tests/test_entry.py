"""Driver-contract smoke + oracle parity for every queries() entry."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF01_DIR, SF_DIR
from tests.util import assert_matches_oracle


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"source", "term", "term_count", "rank"} <= set(df.columns)


def test_oracle_keys_subset():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_query_matches_oracle(spark, name):
    """Parity at sf0.01 with exact values — the same scale + strictness
    as the grading driver (round 1 ran sf0.001 with rtol and passed a
    query the driver failed)."""
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    assert_matches_oracle(q(spark, SF01_DIR), SF01_DIR, sql)


def test_queries_run_sf001(spark):
    """Every queries() entry runs and yields a stable schema at sf0.001."""
    for name, fn in entry_mod.queries().items():
        df = fn(spark, SF_DIR)
        assert df.columns, name
        df.limit(5).collect()
