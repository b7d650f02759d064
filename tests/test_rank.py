"""W1 average-rank parity with pandas ``rank(method='average',
na_option='bottom')`` (maco/util.py:115, cocoa.py:46-60)."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from datalake_indexes_spark.operators.cocoa import average_rank

CASES = [
    [3.0, 1.0, 2.0, 2.0, None, 5.0, 2.0, None],
    [1.0, 1.0, 1.0],
    [None, None],
    [7.5],
    [0.0, -1.0, -1.0, 3.5, 3.5, 3.5, None, 0.0],
]


@pytest.mark.spark
@pytest.mark.parametrize("values", CASES)
def test_average_rank_matches_pandas(spark, values):
    pdf = pd.Series(values, dtype="float64")
    expected = pdf.rank(method="average", na_option="bottom").tolist()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id int, v double"
    )
    out = average_rank(df, F.col("v"), out_col="r").orderBy("id").collect()
    got = [r["r"] for r in out]
    assert all(math.isclose(g, e) for g, e in zip(got, expected)), (got, expected)
