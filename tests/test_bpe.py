"""BPE tokenizer (functions/bpe.py): textbook merge sequence, training
determinism under re-partitioning, greedy-apply == replayed-merges
parity, memoized distributed apply == pure-Python reference."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_indexes_spark.functions.bpe import (
    apply_bpe,
    encode_word,
    train_bpe,
    word_type_counts,
)


def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_textbook_merge_sequence(spark):
    """The classic Sennrich example: {low x5, lower x2, newest x6,
    widest x3}. First merges must pick the most frequent pair with the
    lexicographic tie-break."""
    docs = _corpus(
        spark,
        ["low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3],
    )
    merges = train_bpe(docs, n_merges=4)
    # 'es' appears in newest+widest = 9 -> top pair; then 'es'+'t' = 9,
    # then 'est</w>' = 9, then 'lo' (low 5 + lower 2 = 7)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")
    assert merges[3] == ("l", "o")


def test_training_is_partitioning_invariant(spark):
    texts = [f"alpha beta gamma delta w{i % 7}" for i in range(50)]
    a = train_bpe(_corpus(spark, texts), n_merges=10)
    b = train_bpe(_corpus(spark, list(reversed(texts))).repartition(7), n_merges=10)
    assert a == b


def test_word_type_counts(spark):
    docs = _corpus(spark, ["a b  a", "b c"])
    counts = {r["word"]: r["freq"] for r in word_type_counts(docs).collect()}
    assert counts == {"a": 2, "b": 2, "c": 1}


def _reference_encode(text, merges):
    """Replay the training merges in order — the definitionally correct
    (O(n_merges * len)) apply the greedy rank walk must match."""
    out = []
    for w in text.split():
        symbols = list(w) + ["</w>"]
        for a, b in merges:
            i, new = 0, []
            while i < len(symbols):
                if i < len(symbols) - 1 and symbols[i] == a and symbols[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(symbols[i])
                    i += 1
            symbols = new
        out.extend(symbols)
    return out


def test_greedy_apply_matches_merge_replay(spark):
    texts = ["the lowest newer widening tower", "low lower lowest", "xyzzy"]
    docs = _corpus(spark, ["low lower lowest newest widest " * 3])
    merges = train_bpe(docs, n_merges=12)
    ranks = {p: i for i, p in enumerate(merges)}
    for t in texts:
        greedy = [s for w in t.split() for s in encode_word(w, ranks)]
        assert greedy == _reference_encode(t, merges)


def test_distributed_apply_counts_and_tokens(spark):
    train = _corpus(spark, ["low lower lowest newest widest " * 4])
    merges = train_bpe(train, n_merges=8)
    docs = _corpus(spark, ["low lowest", "newest widest low", ""])
    got = {
        r["doc_id"]: (r["bpe_tokens"], r["n_bpe_tokens"])
        for r in apply_bpe(docs, merges, with_tokens=True).collect()
    }
    for i, text in [(0, "low lowest"), (1, "newest widest low"), (2, "")]:
        expect = _reference_encode(text, merges)
        assert got[i][0] == expect
        assert got[i][1] == len(expect)
    counts = {
        r["doc_id"]: r["n_bpe_tokens"] for r in apply_bpe(docs, merges).collect()
    }
    assert counts == {i: v[1] for i, v in got.items()}


def test_tokens_concatenate_back_to_words(spark):
    """Lossless segmentation: stripping </w> and concatenating restores
    the original text's words."""
    train = _corpus(spark, ["alpha beta gamma delta " * 5])
    merges = train_bpe(train, n_merges=15)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["alpha", "betagamma", "unseen"]:
        toks = encode_word(w, ranks)
        assert "".join(toks).replace("</w>", "") == w


def test_merge_table_round_trip(spark, tmp_path):
    from datalake_indexes_spark.functions.bpe import load_merges, save_merges

    docs = _corpus(spark, ["low lower lowest newest widest " * 3])
    merges = train_bpe(docs, n_merges=10)
    save_merges(spark, merges, str(tmp_path / "merges"))
    assert load_merges(spark, str(tmp_path / "merges")) == merges


def test_apply_bpe_null_and_empty_text(spark):
    """A single null document must not abort the Arrow batch: null and
    empty text encode to zero tokens (both UDF branches)."""
    from datalake_indexes_spark.functions.bpe import apply_bpe, train_bpe

    docs = spark.createDataFrame(
        [(1, "low lower lowest low"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    merges = train_bpe(docs.filter("text is not null and text <> ''"), n_merges=5)
    counts = {r["doc_id"]: r["n_bpe_tokens"]
              for r in apply_bpe(docs, merges).collect()}
    assert counts[2] == 0 and counts[3] == 0 and counts[1] > 0
    toks = {r["doc_id"]: r["bpe_tokens"]
            for r in apply_bpe(docs, merges, with_tokens=True).collect()}
    assert toks[2] == [] and toks[3] == []
