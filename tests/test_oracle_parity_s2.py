"""Driver-gate replica, shard 2 of 4 (see tests/_oracle_parity_common.py)."""

from __future__ import annotations

import pytest

from tests._oracle_parity_common import check_parity, shard_names


@pytest.mark.spark
@pytest.mark.parametrize("name", shard_names(2))
def test_query_matches_oracle(spark, sf_dir, name):
    check_parity(spark, sf_dir, name)
