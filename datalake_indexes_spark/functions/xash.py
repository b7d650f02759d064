"""XASH — the reference's 128-bit row-fingerprint hash, bit-exact.

Semantics from ``maco/util.py:141-211`` (``generate_XASH``): the
``number_of_ones`` least-frequent characters of the token (ties broken by
character) each set one bit in a 37-character x ``segment_size`` grid (the
segment is picked from the mean position of the character in the token);
the feature bits are then rotated by a length-derived amount and one length
bit is set at ``37*segment_size + len(token) % (hash_size - 37*segment_size)``.

Spark has no 128-bit integer, so the engine carries the hash as two signed
64-bit longs ``(hi, lo)``; bitwise OR/containment work unchanged on the pair
(``maco/data_handler.py:280-303`` stores the same value as a BIT(128) string).

The per-token computation is pure Python (it is not expressible as a native
column expression), wrapped in an Arrow-batched pandas UDF with a per-worker
memo cache — token distributions in a data lake are heavily repetitive, so
the cache turns the UDF into a dictionary probe for the common case.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

_CHARS = " 0123456789abcdefghijklmnopqrstuvwxyz"
_CHAR_INDEX = {c: i for i, c in enumerate(_CHARS)}
_SEGMENT_SIZE = {64: 1, 128: 3, 256: 6, 512: 13}
_EMPTY_TOKENS = frozenset(["", "None", " ", "''"])

_MASK64 = (1 << 64) - 1


def xash(
    token: str,
    hash_size: int = 128,
    rotation: bool = True,
    number_of_ones: int = 5,
) -> int:
    """128-bit (by default) XASH of ``token`` as a Python int."""
    if token in _EMPTY_TOKENS:
        return 0

    seg = _SEGMENT_SIZE[hash_size]
    length_bit_start = 37 * seg
    length_slots = hash_size - length_bit_start

    counts = Counter(token)
    # least-frequent first, ties by character ascending; chars outside the
    # alphabet are selected (consuming a slot) but then skipped, matching
    # the reference.
    selected = [c for c, _ in sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))[:number_of_ones]]

    n = 0
    token_size = len(token)
    for c in selected:
        idx = _CHAR_INDEX.get(c)
        if idx is None:
            continue
        positions = [i for i, ch in enumerate(token) if ch == c]
        mean_index = sum(positions) / len(positions)
        for i in range(seg):
            if mean_index <= ((i + 1) * token_size / seg):
                n |= 1 << (idx * seg + i)
                break

    if rotation:
        # rotate the feature bits within [0, length_bit_start)
        d = int((length_bit_start * (token_size % length_slots)) / length_slots)
        n = ((n << d) | (n >> (length_bit_start - d))) % (1 << length_bit_start)

    return n | (1 << (length_bit_start + (token_size % length_slots)))


def split128(value: int) -> tuple[int, int]:
    """Split a 128-bit int into signed (hi, lo) int64 pair."""
    lo = value & _MASK64
    hi = (value >> 64) & _MASK64
    if lo >= 1 << 63:
        lo -= 1 << 64
    if hi >= 1 << 63:
        hi -= 1 << 64
    return hi, lo


def xash_hi_lo(token: str, **kwargs) -> tuple[int, int]:
    return split128(xash(token, **kwargs))


_XASH_SCHEMA = StructType(
    [StructField("hi", LongType(), False), StructField("lo", LongType(), False)]
)


def xash_pandas_udf(hash_size: int = 128, rotation: bool = True, number_of_ones: int = 5):
    """Arrow-batched pandas UDF: token string -> struct(hi long, lo long).

    A per-worker memo cache amortizes repeated tokens (key/id columns in a
    lake repeat across rows and tables).
    """
    cache: dict[str, tuple[int, int]] = {}

    @F.pandas_udf(_XASH_SCHEMA)
    def _udf(tokens: pd.Series) -> pd.DataFrame:
        # factorize the batch (one C pass -> unique values + int codes),
        # hash only the unseen uniques in Python, then expand per-row
        # results with a numpy take — the per-ROW work is all C.  Lake
        # token columns repeat heavily, so the Python-level work is
        # O(new uniques), not O(rows).  Measured 3x over the previous
        # dict-map + list-comprehension body (56s -> 19s CPU per 4.7M
        # cells at sf0.1).
        import numpy as np

        codes, uniques = pd.factorize(tokens.fillna(""))
        hi = np.empty(len(uniques), dtype=np.int64)
        lo = np.empty(len(uniques), dtype=np.int64)
        for j, t in enumerate(uniques):
            got = cache.get(t)
            if got is None:
                got = split128(
                    xash(t, hash_size=hash_size, rotation=rotation,
                         number_of_ones=number_of_ones)
                )
                if len(cache) < 4_000_000:  # bound worker memory on
                    cache[t] = got          # degenerate vocabularies
            hi[j] = got[0]
            lo[j] = got[1]
        return pd.DataFrame({"hi": hi[codes], "lo": lo[codes]})

    return _udf


def row_xash_pandas_udf(hash_size: int = 128, rotation: bool = True,
                        number_of_ones: int = 5, hash_fn=None):
    """Arrow-batched pandas UDF hashing a WHOLE ROW of tokens at once:
    input = tokens joined with ``\\x01`` (tokens are ASCII alnum+space so
    the separator cannot collide; NUL is avoided because Arrow-produced
    pandas strings hash C-string-style in ``Series.unique()`` here,
    silently collapsing keys at an embedded NUL), output = OR-fold of the
    per-token hashes as (hi, lo).  One Python crossing per row instead of
    one per query column; the memo caches whole-row keys."""
    fn = hash_fn or (
        lambda t: xash(t, hash_size=hash_size, rotation=rotation,
                       number_of_ones=number_of_ones)
    )
    cache: dict[str, tuple[int, int]] = {}
    tok_cache: dict[str, int] = {}

    def _tok_hash(t: str) -> int:
        # token-level memo UNDER the row-level one: distinct rows share
        # tokens heavily (a 600k-row composite-key probe has ~170k
        # distinct tokens), so most per-row work is two dict hits even
        # when every row key is unique
        v = tok_cache.get(t)
        if v is None:
            v = fn(t)
            if len(tok_cache) < 4_000_000:
                tok_cache[t] = v
        return v

    @F.pandas_udf(_XASH_SCHEMA)
    def _udf(rows: pd.Series) -> pd.DataFrame:
        # same factorize + numpy-take shape as xash_pandas_udf: per-row
        # work stays in C, Python touches only the batch's new uniques
        import numpy as np

        codes, uniques = pd.factorize(rows.fillna(""))
        hi = np.empty(len(uniques), dtype=np.int64)
        lo = np.empty(len(uniques), dtype=np.int64)
        for j, joined in enumerate(uniques):
            got = cache.get(joined)
            if got is None:
                acc = 0
                for t in joined.split("\x01"):
                    acc |= _tok_hash(t)
                got = split128(acc & ((1 << 128) - 1))
                if len(cache) < 4_000_000:  # bound worker memory
                    cache[joined] = got
            hi[j] = got[0]
            lo[j] = got[1]
        return pd.DataFrame({"hi": hi[codes], "lo": lo[codes]})

    return _udf


_TOK_XASH_SCHEMA = StructType(
    [
        StructField("tok", StringType(), False),
        StructField("hi", LongType(), False),
        StructField("lo", LongType(), False),
    ]
)


def tokenize_xash_pandas_udf(hash_size: int = 128, rotation: bool = True,
                             number_of_ones: int = 5):
    """Arrow-batched pandas UDF fusing tokenize + XASH: raw CAST-to-string
    cell -> struct(tok string, hi long, lo long).

    The index build previously ran the 4-regex tokenizer chain in the JVM
    over EVERY cell (no way to deduplicate inside codegen) and then paid a
    second Arrow crossing to hash the tokenized strings.  Lake columns are
    keys and enums — a batch's *unique* raw values are a small fraction of
    its rows — so this fusion factorizes the raw batch once (C), tokenizes
    only the uniques through the RE2-vectorized :func:`tokenize_arrow`
    (bit-identical to ``tokenize_col``, see its parity note), XASHes only
    the unique tokens (memoized), and expands both with numpy takes.  One
    Python crossing per column instead of regex-per-cell + crossing.

    The cast to string MUST stay in the JVM (callers pass
    ``col.cast("string")``): Spark's cast formatting (e.g. ``1.0E7`` for
    doubles) is part of the indexed token contract and is not replicated
    here."""
    cache: dict[str, tuple[int, int]] = {}

    @F.pandas_udf(_TOK_XASH_SCHEMA)
    def _udf(raw: pd.Series) -> pd.DataFrame:
        import numpy as np
        import pyarrow as pa

        from datalake_indexes_spark.functions.text import tokenize_arrow

        codes, uniques = pd.factorize(raw.fillna(""))
        toks = np.asarray(
            tokenize_arrow(pa.array(uniques, type=pa.string())).to_pylist(),
            dtype=object,
        )
        hi = np.empty(len(uniques), dtype=np.int64)
        lo = np.empty(len(uniques), dtype=np.int64)
        for j, t in enumerate(toks):
            got = cache.get(t)
            if got is None:
                got = split128(
                    xash(t, hash_size=hash_size, rotation=rotation,
                         number_of_ones=number_of_ones)
                )
                if len(cache) < 4_000_000:  # bound worker memory
                    cache[t] = got
            hi[j] = got[0]
            lo[j] = got[1]
        return pd.DataFrame({"tok": toks[codes], "hi": hi[codes], "lo": lo[codes]})

    return _udf


def superkey_contains(q_hi: Column, q_lo: Column, r_hi: Column, r_lo: Column) -> Column:
    """Bit-containment test: every bit of q is set in r (mate.py:390-394,
    ``(input_superkey | row_superkey) == row_superkey``) on the 2-long split."""
    return (q_hi.bitwiseOR(r_hi) == r_hi) & (q_lo.bitwiseOR(r_lo) == r_lo)
