"""XASH bit-parity and property tests (SURVEY.md §5.1/§5.4).

Golden values in ``tests/golden/xash_tokenizer_golden.json`` were produced by
running the reference's pure functions (``maco/util.py:141-211`` generate_XASH,
``util.py:11-31`` get_cleaned_text) on fixture tokens — no DB needed.
"""

from __future__ import annotations

import json
import os

from hypothesis import given, settings
from hypothesis import strategies as st

from datalake_indexes_spark.functions.xash import split128, xash

GOLDEN = json.load(
    open(os.path.join(os.path.dirname(__file__), "golden", "xash_tokenizer_golden.json"))
)


def test_xash_golden_parity():
    for case in GOLDEN["xash"]:
        assert xash(case["token"]) == int(case["h128"]), case["token"]


EXT_GOLDEN = json.load(
    open(os.path.join(os.path.dirname(__file__), "golden", "xash_extended_golden.json"))
)["xash_ext"]


def test_xash_extended_golden_parity():
    """All hash sizes (64/128/256/512) x rotation on/off vs the reference's
    generate_XASH outputs — the demo's parameter-sweep surface (demo:423-464)."""
    for c in EXT_GOLDEN:
        got = xash(c["token"], hash_size=c["hash_size"], rotation=c["rotation"])
        assert got == int(c["h"]), (c["hash_size"], c["rotation"], c["token"])


def test_split128_roundtrip():
    for case in GOLDEN["xash"]:
        v = int(case["h128"])
        hi, lo = split128(v)
        assert ((hi & ((1 << 64) - 1)) << 64 | (lo & ((1 << 64) - 1))) == v


token_strategy = st.text(
    alphabet=st.characters(codec="ascii", categories=("L", "N", "P", "Z")), max_size=40
)


@given(a=token_strategy, b=token_strategy)
@settings(max_examples=200, deadline=None)
def test_superkey_containment_soundness(a: str, b: str):
    """A row super key (OR of cell hashes) always contains each cell hash —
    the MATE prefilter (mate.py:390-394) can never drop a true match."""
    ha, hb = xash(a), xash(b)
    row_key = ha | hb
    assert (ha | row_key) == row_key
    assert (hb | row_key) == row_key


@given(t=token_strategy)
@settings(max_examples=200, deadline=None)
def test_xash_fits_128_bits(t: str):
    assert 0 <= xash(t) < (1 << 128)
