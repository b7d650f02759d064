"""Byte-pair-encoding subword tokenizer (extension surface — token
budgets, packing and mixing in a training pipeline are denominated in
SUBWORD tokens; the whitespace/regex counts in
:mod:`..operators.text_analysis` are cheap proxies, this is the real
thing).

Scale split, by design:

- :func:`word_type_counts` — the only corpus-sized job: one hash
  aggregate from documents to (word, freq).  At 100 TB this is a
  groupBy like any other; everything after it operates on the WORD-TYPE
  table, whose size is vocabulary-bounded (and further capped at
  ``max_types``), not corpus-bounded.
- :func:`train_bpe` — the classic merge loop (Sennrich et al. 2016,
  arXiv:1508.07909) over the capped type table on the driver.  Training
  over types, not tokens, is the standard formulation (each pair count
  is weighted by word frequency); running the loop driver-side over a
  bounded table is the honest shape — a per-merge distributed shuffle
  would pay round-trip latency x n_merges for a table that fits in one
  task.
- :func:`apply_bpe` — Arrow-batched pandas UDF (the same Python-edge
  contract as the XASH family): greedy rank-ordered merge application,
  memoized per unique word within a batch, so hot words (Zipf) pay the
  merge walk once per batch, not once per occurrence.

Determinism: pair ties break lexicographically, so the merge table is a
pure function of the corpus — independent of partitioning, row order,
and engine.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# One whitespace definition for the WHOLE BPE surface (train + apply +
# the DuckDB oracle twin): the explicit ASCII class Java's \s denotes.
# Python str.split() splits on UNICODE whitespace (U+00A0, U+2028, ...)
# and RE2's \s omits \x0B — mixing the three made n_bpe_tokens diverge
# on documents containing exotic whitespace.  Spelling the class out
# pins all engines to identical word boundaries.
WS_CLASS = "[ \\t\\n\\x0B\\f\\r]+"
_WS_RE = re.compile("[ \t\n\x0b\f\r]+")


def _ws_words(text: str) -> list[str]:
    """Split on the shared ASCII whitespace class, dropping empties —
    the Python-side twin of ``F.split(col, WS_CLASS)`` + non-empty
    filter used in :func:`word_type_counts`."""
    return [w for w in _WS_RE.split(text or "") if w]


def word_type_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(word, freq) over whitespace-split words — the corpus-sized
    aggregate BPE training consumes."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), WS_CLASS)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_types: int = 50_000,
    end_of_word: str = "</w>",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus.  Returns the ordered
    merge list (rank = position).  Only the word-frequency aggregate
    touches the corpus; the merge loop runs over at most ``max_types``
    word types (kept by frequency, ties by word, so the cap is
    deterministic too)."""
    types = (
        word_type_counts(docs, text_col, id_col)
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(max_types)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(list(r["word"]) + [end_of_word]): r["freq"] for r in types
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for symbols, freq in vocab.items():
            for a, b in zip(symbols, symbols[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + freq
        if not pairs:
            break
        # deterministic choice: highest count, ties by lexicographically
        # smallest pair
        best_count = max(pairs.values())
        pair = min(p for p, c in pairs.items() if c == best_count)
        if best_count < 2:
            break  # nothing left worth merging
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for symbols, freq in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(symbols):
                if (
                    i < len(symbols) - 1
                    and symbols[i] == pair[0]
                    and symbols[i + 1] == pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
    return merges


def encode_word(
    word: str, ranks: dict[tuple[str, str], int], end_of_word: str = "</w>"
) -> list[str]:
    """Greedy BPE application to one word: repeatedly merge the
    lowest-rank adjacent pair (the standard inference rule — identical
    to replaying the training merges in order)."""
    symbols = list(word) + [end_of_word]
    while len(symbols) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    end_of_word: str = "</w>",
    with_tokens: bool = False,
) -> DataFrame:
    """(doc_id, n_bpe_tokens[, bpe_tokens]) — subword token counts under
    the learned merge table.  One Arrow-batched pandas UDF with per-batch
    unique-word memoization; the merge table ships to executors once as a
    broadcast-closure dict (n_merges entries, KBs)."""
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    if with_tokens:

        @pandas_udf("array<string>")
        def bpe_tokens(texts: pd.Series) -> pd.Series:
            memo: dict[str, list[str]] = {}

            def enc(text: str) -> list[str]:
                out: list[str] = []
                for w in _ws_words(text):
                    if w not in memo:
                        memo[w] = encode_word(w, ranks, end_of_word)
                    out.extend(memo[w])
                return out

            return texts.map(enc)

        toks = bpe_tokens(F.col(text_col))
        return docs.select(
            F.col(id_col).alias("doc_id"),
            toks.alias("bpe_tokens"),
            F.size(toks).cast("long").alias("n_bpe_tokens"),
        )

    @pandas_udf("long")
    def bpe_count(texts: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}

        def count(text: str) -> int:
            n = 0
            for w in _ws_words(text):
                if w not in memo:
                    memo[w] = len(encode_word(w, ranks, end_of_word))
                n += memo[w]
            return n

        return texts.map(count)

    return docs.select(
        F.col(id_col).alias("doc_id"),
        bpe_count(F.col(text_col)).alias("n_bpe_tokens"),
    )


def save_merges(spark, merges: list[tuple[str, str]], path: str) -> None:
    """Persist the merge table (rank, left, right) — the tokenizer
    artifact a pipeline trains once and ships to every job."""
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_merges(spark, path: str) -> list[tuple[str, str]]:
    """Load a persisted merge table in training order."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r["left"], r["right"]) for r in rows]
