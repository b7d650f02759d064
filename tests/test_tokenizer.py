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
