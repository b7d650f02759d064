"""Hot-shingle frequency cap in ngram_jaccard_pairs: candidate generation
skips boilerplate shingles, verification stays exact, and the (documented)
recall effect is precisely the boilerplate-only pairs."""

from __future__ import annotations

from datalake_indexes_spark.operators.dedup import ngram_jaccard_pairs


def _pairs(df):
    return {
        (r["doc_id_1"], r["doc_id_2"]): r["jaccard"] for r in df.collect()
    }


def test_hot_shingle_cap_skewed_fixture(spark):
    boiler = "common header text"  # one shingle shared by EVERY doc
    rows = []
    # 40 docs all carrying the boilerplate + unique filler (the skew:
    # the boilerplate shingle alone contributes 40*39/2 join rows)
    for i in range(40):
        rows.append((i, f"{boiler} unique filler number {i} for document {i}"))
    # a genuine near-dup pair distinguished by RARE shingles
    rows.append((100, f"{boiler} the quick brown fox jumps over dogs"))
    rows.append((101, f"{boiler} the quick brown fox jumps over dogs"))
    # a pair whose ONLY shared shingle is the boilerplate itself
    rows.append((200, boiler))
    rows.append((201, boiler))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    exact = _pairs(ngram_jaccard_pairs(docs, n=3, threshold=0.7))
    capped = _pairs(
        ngram_jaccard_pairs(docs, n=3, threshold=0.7, max_shingle_freq=10)
    )

    # the rich near-dup pair survives the cap with an EXACT jaccard
    # (verification runs on full shingle sets, not the capped ones)
    assert (100, 101) in exact and (100, 101) in capped
    assert capped[(100, 101)] == exact[(100, 101)] == 1.0

    # recall effect, precisely bounded: the boilerplate-only pair is the
    # single pair lost to the cap
    assert (200, 201) in exact
    assert (200, 201) not in capped
    assert set(exact) - set(capped) == {(200, 201)}


def test_cap_disabled_is_default_path(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "x y z w v u")],
        "doc_id long, text string",
    )
    assert _pairs(ngram_jaccard_pairs(docs)) == _pairs(
        ngram_jaccard_pairs(docs, max_shingle_freq=1000)
    )
