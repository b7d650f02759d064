"""Pluggable hash families: bloom soundness, MATE knob parity, BloomFilter
class behavior."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from datalake_indexes_spark.functions.hashes import (
    BloomFilter,
    bloom128,
    md5_128,
    simhash128,
)

tokens = st.text(
    alphabet=st.characters(codec="ascii", categories=("L", "N")), min_size=0, max_size=30
)


@given(t=tokens)
@settings(max_examples=100, deadline=None)
def test_hashes_fit_128(t):
    for fn in (md5_128, simhash128, bloom128):
        assert 0 <= fn(t) < (1 << 128)


@given(a=tokens, b=tokens)
@settings(max_examples=100, deadline=None)
def test_bloom_containment_monotone(a, b):
    """Row key = OR of token blooms always contains each token's bloom —
    the property the MATE prefilter needs."""
    row = bloom128(a) | bloom128(b)
    assert (bloom128(a) | row) == row


def test_bloom_filter_class():
    bf = BloomFilter(n_items=100, fp_rate=0.01)
    items = [f"item{i}" for i in range(50)]
    for it in items:
        bf.add(it)
    assert all(bf.check(it) for it in items)
    misses = sum(bf.check(f"other{i}") for i in range(1000))
    assert misses < 50  # ~1% design rate, generous bound
