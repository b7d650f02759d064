"""Tokenizer parity: golden vs reference, Spark expr vs Python port, and the
two SQL dialects vs the Column expression (SURVEY.md P1-P4)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from datalake_indexes_spark.functions.text import (
    clean_text_ref,
    tokenize_col,
    tokenize_py,
    tokenize_sql,
)

GOLDEN = json.load(
    open(os.path.join(os.path.dirname(__file__), "golden", "xash_tokenizer_golden.json"))
)

SAMPLES = [
    "Hello, World!",
    "the United  States",
    "  a the of on in  ",
    "CAFÉ au lait — déjà vu",
    "x" * 300,
    "42",
    "3.14159",
    "None",
    "NULL",
    "",
    "foo_bar-baz.qux",
    "The Quick Brown Fox IS not AT are as",
    "ümläuts ünd émojis 🎉 here",
    "tab\tand\nnewline",
    "a b a b a",
]


def test_golden_parity_python():
    for case in GOLDEN["tokenizer"]:
        assert clean_text_ref(case["raw"]) == case["cleaned"], case["raw"]


@pytest.mark.spark
def test_spark_expr_matches_python(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "raw string")
    got = [r["tok"] for r in df.select(tokenize_col(F.col("raw")).alias("tok")).collect()]
    want = [tokenize_py(s) for s in SAMPLES]
    assert got == want


@pytest.mark.spark
def test_spark_sql_dialect_matches_expr(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "raw string")
    df.createOrReplaceTempView("tok_samples")
    via_expr = [r["t"] for r in df.select(tokenize_col(F.col("raw")).alias("t")).collect()]
    via_sql = [
        r["t"]
        for r in spark.sql(
            f"SELECT {tokenize_sql('raw', 'spark')} AS t FROM tok_samples"
        ).collect()
    ]
    assert via_expr == via_sql


def test_duckdb_sql_dialect_matches_python():
    import duckdb

    con = duckdb.connect()
    expr = tokenize_sql("raw", "duckdb")
    for s in SAMPLES:
        got = con.execute(f"SELECT {expr} FROM (SELECT ? AS raw)", [s]).fetchone()[0]
        assert got == tokenize_py(s), repr(s)


# ---------------------------------------------------------------------------
# Adversarial stopword-run goldens — the PINNED deviation surface between
# the engine's 2-pass regex form and the reference's order-dependent
# sequential replace (maco/util.py:11-31).  Empirically the two differ
# exactly when (a) the input contains two or more ADJACENT stopwords, or
# (b) the input IS a single bare stopword (the reference only removes
# stopwords adjacent to a space).  Each case pins BOTH outputs so any
# change to either implementation that moves the deviation surface fails
# loudly here.
# ---------------------------------------------------------------------------

STOPWORD_RUN_CASES = [
    # (raw, engine_regex_form, reference_sequential_form)
    ("a a", "", "a"),
    ("x a a y", "x y", "x a y"),
    ("a the", "", "the"),
    ("the a", "", "the"),
    ("of a the", "", "of"),
    ("a the of", "", "of"),
    ("x a the of y", "x y", "x y"),     # mixed interior runs can AGREE
    ("a a a", "", "a"),
    ("a a a a", "a", "a"),              # 2-pass regex leaves a survivor too
    ("the the the", "", "the"),
    ("v v", "", "v"),
    ("d d d", "", "d"),
    ("a", "", "a"),                      # bare stopword: ref keeps it
    ("the", "", "the"),
    ("x the the y", "x y", "x the y"),
    ("is is a", "", "is"),
    ("a is is", "", "is"),
]


def test_stopword_run_goldens_python():
    for raw, eng, ref in STOPWORD_RUN_CASES:
        assert tokenize_py(raw) == eng, raw
        assert clean_text_ref(raw) == ref, raw


@pytest.mark.spark
def test_stopword_run_goldens_spark_expr(spark):
    """The Spark Column chain agrees with its Python twin on every
    adversarial case (the engine is internally consistent even where it
    deviates from the reference)."""
    df = spark.createDataFrame([(r,) for r, _, _ in STOPWORD_RUN_CASES], "raw string")
    got = [r["t"] for r in df.select(tokenize_col(F.col("raw")).alias("t")).collect()]
    assert got == [eng for _, eng, _ in STOPWORD_RUN_CASES]


def test_no_divergence_outside_pinned_surface():
    """Property: without adjacent stopwords (and not a bare stopword), the
    regex form IS the reference form."""
    import random

    from datalake_indexes_spark.functions.text import STOPWORDS

    rng = random.Random(42)
    vocab = [
        "a", "the", "of", "is", "v",
        "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta", "iota", "kappa",
    ]
    stop = set(STOPWORDS)
    checked = 0
    for _ in range(5000):
        ws = [rng.choice(vocab) for _ in range(rng.randrange(1, 9))]
        if any(ws[i] in stop and ws[i + 1] in stop for i in range(len(ws) - 1)):
            continue
        if len(ws) == 1 and ws[0] in stop:
            continue
        s = " ".join(ws)
        assert tokenize_py(s) == clean_text_ref(s), s
        checked += 1
    assert checked > 2000


def test_canonicalize_text_accents_digits_punct(spark):
    from datalake_indexes_spark.functions.text import canonicalize_text_col

    rows = [
        (0, "Café #42, RÉSUMÉ!"),
        (1, '{"k": 69}'),
        (2, "  a   b  "),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonicalize_text_col(F.col("t")).alias("c")).collect()
    }
    assert got[0] == "cafe 00 resume"
    assert got[1] == "k 00"
    assert got[2] == "a b"


def test_tokenize_arrow_matches_python():
    """The RE2-vectorized pyarrow chain (the fused index-build UDF's
    tokenizer) agrees with the Python twin on every golden, sample and
    adversarial stopword-run case, plus None."""
    import pyarrow as pa

    from datalake_indexes_spark.functions.text import tokenize_arrow

    raws = (
        [case["raw"] for case in GOLDEN["tokenizer"]]
        + SAMPLES
        + [r for r, _, _ in STOPWORD_RUN_CASES]
        + [None]
    )
    got = tokenize_arrow(pa.array(raws, type=pa.string())).to_pylist()
    want = [tokenize_py(s if s is not None else "") for s in raws]
    assert got == want


def test_tokenize_arrow_random_property():
    """Random ASCII/punct/unicode soup: arrow chain == Python twin."""
    import random

    import pyarrow as pa

    from datalake_indexes_spark.functions.text import tokenize_arrow

    rng = random.Random(1234)
    alphabet = "abcZ 019 .,;!-_\t\né中\U0001f389the of a is"
    raws = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
        for _ in range(2000)
    ]
    got = tokenize_arrow(pa.array(raws, type=pa.string())).to_pylist()
    assert got == [tokenize_py(s) for s in raws]
