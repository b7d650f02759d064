"""Driver-gate replica: every queries()/oracle_sql() pair must hash-match the
DuckDB oracle at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_compare import compare

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.spark
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    if name not in ORACLES:
        assert df.count() >= 0  # weaker rows-only check (non-SQL-expressible)
        return
    res = compare(df, ORACLES[name], sf_dir, name=name)
    assert res["cols_match"], res
    assert res["rows_match"], res
    assert res["values_match"], res


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.columns
