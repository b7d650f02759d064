"""Property tests for the round-4 family: exact KS vs a brute-force
reference over randomized samples (ties, duplicates, single-point sets),
normalize_text idempotency + fixed-point invariants over randomized noisy
strings, and Benford digit shares vs a pure-Python count."""

from __future__ import annotations

import bisect
import re

import pytest


def _ks_ref(a, b):
    pooled = sorted(set(a) | set(b))
    sa, sb = sorted(a), sorted(b)
    return max(
        abs(
            bisect.bisect_right(sa, v) / len(a)
            - bisect.bisect_right(sb, v) / len(b)
        )
        for v in pooled
    )


def test_ks_matches_reference_property(spark):
    from hypothesis import given, settings, strategies as st

    from datalake_indexes_spark.operators.cocoa import ks_drift

    # small integer domain → heavy tie pressure, the case bisect-free
    # SQL formulations classically get wrong
    vals = st.lists(st.integers(-5, 5), min_size=1, max_size=30)

    @settings(max_examples=10, deadline=None)
    @given(a=vals, b=vals)
    def check(a, b):
        fa = spark.createDataFrame([(float(v),) for v in a], "x double")
        fb = spark.createDataFrame([(float(v),) for v in b], "x double")
        row = ks_drift(fa, fb, ["x"]).collect()[0]
        assert row.ks_stat == pytest.approx(_ks_ref(a, b), abs=1e-6)
        assert row.n_a == len(a) and row.n_b == len(b)

    check()


# the normalization targets, for building adversarial noise
_NOISE = "‘’“”–—… ​\t \n"


def test_normalize_idempotent_property(spark):
    from hypothesis import given, settings, strategies as st

    from datalake_indexes_spark.operators.text_analysis import normalize_text

    noisy = st.text(
        alphabet=st.sampled_from(_NOISE + "abcXYZ.,!?09"), min_size=0, max_size=60
    )

    @settings(max_examples=10, deadline=None)
    @given(texts=st.lists(noisy, min_size=1, max_size=8))
    def check(texts):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        once = {r.doc_id: r.normalized for r in normalize_text(docs).collect()}
        again = spark.createDataFrame(
            [(i, t) for i, t in once.items()], "doc_id long, text string"
        )
        twice = {r.doc_id: r.normalized for r in normalize_text(again).collect()}
        assert twice == once  # idempotent
        for out in once.values():
            # every normalization target is gone
            assert not re.search("[‘’“”–—…]", out)
            assert not re.search("[ ​]", out)
            assert "  " not in out and "\t" not in out
            assert " \n" not in out and "\n\n\n" not in out
            assert out == out.strip(" ")

    check()


def test_benford_shares_match_reference_property(spark):
    from hypothesis import given, settings, strategies as st

    from datalake_indexes_spark.index.lake_index import LakeIndex
    from datalake_indexes_spark.operators.cocoa import benford_audit

    nums = st.lists(
        st.one_of(
            st.integers(-9999, 9999),
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=25,
    )

    @settings(max_examples=10, deadline=None)
    @given(vals=nums)
    def check(vals):
        toks = [str(v) for v in vals]
        digits = [m.group() for m in (re.search("[1-9]", t) for t in toks) if m]
        idx = LakeIndex(
            cells=spark.createDataFrame(
                [(1, 0, i, t) for i, t in enumerate(toks)],
                "table_id int, col_id int, row_id int, tokenized string",
            ),
            row_keys=None, column_headers=None, table_info=None,
        )
        out = benford_audit(idx).collect()
        if not digits:
            assert out == []  # all-zero column: no significant digits
            return
        row = out[0]
        assert row.n_values == len(digits)
        for dd in range(1, 10):
            want = digits.count(str(dd)) / len(digits)
            assert getattr(row, f"p{dd}") == pytest.approx(want, abs=1e-6)

    check()
