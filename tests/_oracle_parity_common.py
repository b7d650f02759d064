"""Shared machinery for the sharded driver-gate replica.

The full-registry parity check (every queries()/oracle_sql() pair vs
DuckDB at sf0.001) is one embarrassingly parallel sweep, but a single
parametrized file serializes it inside one pytest process — 1186s, the
wall-clock driver of the whole parallel suite run.  The keys are split
into ``N_SHARDS`` deterministic slices (sorted order, round-robin) so
``tests/run_parallel.py`` schedules them as independent files; the
union of shards is exactly the registry (pinned by a test in shard 0).
"""

from __future__ import annotations

import __spark_entry__ as entrymod
from tests.oracle_compare import compare

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()
N_SHARDS = 4


def shard_names(k: int) -> list[str]:
    return sorted(QUERIES)[k::N_SHARDS]


def check_parity(spark, sf_dir, name) -> None:
    df = QUERIES[name](spark, sf_dir)
    if name not in ORACLES:
        assert df.count() >= 0  # weaker rows-only check (non-SQL-expressible)
        return
    res = compare(df, ORACLES[name], sf_dir, name=name)
    assert res["cols_match"], res
    assert res["rows_match"], res
    assert res["values_match"], res
