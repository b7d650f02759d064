from datalake_indexes_spark.functions.text import (
    STOPWORDS,
    tokenize_col,
    tokenize_sql,
    null_canonicalize_col,
    NULLISH_TOKENS,
)
from datalake_indexes_spark.functions.xash import xash, xash_hi_lo, xash_pandas_udf

__all__ = [
    "STOPWORDS",
    "tokenize_col",
    "tokenize_sql",
    "null_canonicalize_col",
    "NULLISH_TOKENS",
    "xash",
    "xash_hi_lo",
    "xash_pandas_udf",
]
