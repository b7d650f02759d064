"""Driver-gate replica, shard 0 of 4 (see tests/_oracle_parity_common.py):
every queries()/oracle_sql() pair must hash-match the DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01).  Shards 1-3
live in test_oracle_parity_s{1,2,3}.py; this shard also carries the
entry smoke and the shards-cover-the-registry guard."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests._oracle_parity_common import (
    N_SHARDS,
    QUERIES,
    check_parity,
    shard_names,
)


@pytest.mark.spark
@pytest.mark.parametrize("name", shard_names(0))
def test_query_matches_oracle(spark, sf_dir, name):
    check_parity(spark, sf_dir, name)


def test_shards_cover_registry():
    covered = [n for k in range(N_SHARDS) for n in shard_names(k)]
    assert sorted(covered) == sorted(QUERIES)
    assert len(covered) == len(set(covered))


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.columns
