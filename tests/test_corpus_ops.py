"""Corpus-prep operators: deterministic stratified sampling and
concat-then-chunk sequence packing (operators/text_analysis.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_indexes_spark.operators.text_analysis import (
    pack_sequences,
    stratified_sample,
)


def test_pack_sequences_boundaries(spark):
    """Known token counts: priors 0/3/5 at budget 4 → packs (0,0), (0,3),
    (1,1) — a doc whose first token crosses the boundary starts the next
    pack at the straddle offset."""
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "d e"), (2, "f g h i")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in pack_sequences(docs, token_budget=4).collect()}
    assert (out[0]["pack_id"], out[0]["pack_offset"]) == (0, 0)
    assert (out[1]["pack_id"], out[1]["pack_offset"]) == (0, 3)
    assert (out[2]["pack_id"], out[2]["pack_offset"]) == (1, 1)
    assert out[2]["n_tokens"] == 4


def test_pack_sequences_empty_input(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert pack_sequences(docs).count() == 0


def test_pack_sequences_matches_plain_window(spark):
    """The bucketed distributed prefix sum must equal the single-window
    formulation on a sparse, irregular id space."""
    from pyspark.sql import Window

    rows = [(i * i + 7, "w " * (i % 13 + 1)) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"])
        for r in pack_sequences(docs, token_budget=32).collect()
    }
    t = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    ref = {
        r["doc_id"]: (r["prior"] // 32, r["prior"] % 32)
        for r in t.withColumn(
            "prior", F.coalesce(F.sum("n").over(w), F.lit(0))
        ).collect()
    }
    assert got == ref


def test_stratified_sample_deterministic_and_proportional(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "de", "x") for i in range(2000)],
        "doc_id long, lang string, text string",
    )
    frac = {"en": 0.25, "de": 1.0}
    a = sorted(r["doc_id"] for r in stratified_sample(docs, frac).collect())
    b = sorted(r["doc_id"] for r in stratified_sample(docs, frac).collect())
    assert a == b  # pure function of the id — no run-to-run variance
    en = [i for i in a if i % 2]
    de = [i for i in a if not i % 2]
    assert len(de) == 1000  # fraction 1.0 keeps everything
    assert 150 <= len(en) <= 350  # ~25% of 1000, md5-bucket variance


def test_quantization_bounds_and_error(spark):
    """int8 range respected, scale recoverable, reconstruction error
    bounded by scale/254 per component (half-up rounding)."""
    from datalake_indexes_spark.operators.similarity import (
        dequantize,
        quantize_embeddings,
    )

    rows = [
        (0, [1.0, -2.5, 0.3, 2.5]),
        (1, [0.0, 0.0, 0.0, 0.0]),   # zero vector: scale 0, qvec zeros
        (2, [-0.004, 0.002, 0.001, -0.001]),
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    q = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert all(-127 <= x <= 127 for r in q.values() for x in r["qvec"])
    assert q[1]["scale"] == 0.0 and q[1]["qvec"] == [0, 0, 0, 0]
    assert max(abs(x) for x in q[0]["qvec"]) == 127  # scale hits the max
    d = {r["vec_id"]: r["embedding"] for r in dequantize(quantize_embeddings(df)).collect()}
    import struct as _struct

    for i, v in rows:
        for orig, rec in zip(v, d[i]):
            scale = q[i]["scale"]
            # worst case sits EXACTLY at scale/254 (x/scale*127 landing on
            # .5); compare against the float32-stored original, which is
            # what the operator actually quantized
            orig32 = _struct.unpack("f", _struct.pack("f", orig))[0]
            assert abs(orig32 - rec) <= scale / 254 + 1e-12


def test_pack_sequences_property_matches_window(spark):
    """Hypothesis fuzz: the bucketed distributed prefix sum equals the
    single-window reference for arbitrary sparse ids and text lengths."""
    from hypothesis import given, settings, strategies as st

    from pyspark.sql import Window

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 10_000), st.integers(0, 20)),
            min_size=1,
            max_size=60,
            unique_by=lambda t: t[0],
        ),
        st.integers(1, 64),
    )
    def check(pairs, budget):
        docs = spark.createDataFrame(
            [(i, "w " * n) for i, n in pairs], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["pack_id"], r["pack_offset"])
            for r in pack_sequences(docs, token_budget=budget).collect()
        }
        t = docs.select(
            "doc_id", F.size(F.split("text", " ")).cast("long").alias("n")
        )
        w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
        ref = {
            r["doc_id"]: (r["prior"] // budget, r["prior"] % budget)
            for r in t.withColumn(
                "prior", F.coalesce(F.sum("n").over(w), F.lit(0))
            ).collect()
        }
        assert got == ref

    check()


@pytest.mark.spark
class TestStratifiedSampleExact:
    def test_exact_n_and_small_stratum(self, spark):
        from datalake_indexes_spark.operators.text_analysis import (
            stratified_sample_exact,
        )

        docs = spark.createDataFrame(
            [(i, "en") for i in range(50)] + [(100 + i, "fr") for i in range(3)],
            "doc_id long, lang string",
        )
        out = stratified_sample_exact(docs, n_per_stratum=10).collect()
        by = {}
        for r in out:
            by.setdefault(r.stratum, []).append(r)
        assert len(by["en"]) == 10          # exact cut
        assert len(by["fr"]) == 3           # smaller stratum: all rows
        assert sorted(r.sample_rank for r in by["en"]) == list(range(1, 11))
        # deterministic: same selection on a second run
        again = {r.doc_id for r in stratified_sample_exact(docs, 10).collect()}
        assert again == {r.doc_id for r in out}


@pytest.mark.spark
class TestWeightedSample:
    def test_weight_proportional_and_deterministic(self, spark):
        from datalake_indexes_spark.operators.text_analysis import weighted_sample

        # 200 light docs (w=1) + 20 heavy docs (w=100): heavies must be
        # strongly over-represented in a k=40 sample
        docs = spark.createDataFrame(
            [(i, 1) for i in range(200)] + [(1000 + i, 100) for i in range(20)],
            "doc_id long, n_chars long",
        )
        out = weighted_sample(docs, k=40).collect()
        assert len(out) == 40
        heavy = sum(1 for r in out if r.doc_id >= 1000)
        assert heavy >= 15  # ~all 20 heavies expected; md5 is fixed, no flake
        again = [r.doc_id for r in weighted_sample(docs, k=40).collect()]
        assert again == [r.doc_id for r in out]

    def test_nonpositive_weights_excluded(self, spark):
        from datalake_indexes_spark.operators.text_analysis import weighted_sample

        docs = spark.createDataFrame(
            [(1, 10), (2, 0), (3, -5)], "doc_id long, n_chars long"
        )
        assert [r.doc_id for r in weighted_sample(docs, k=5).collect()] == [1]


def test_chunk_dedup_planted_boilerplate(spark):
    """Three docs share the exact 4-word banner 'all rights reserved inc';
    it must vanish from every doc while unique chunks survive in order.
    Doc 3 is pure boilerplate and disappears entirely."""
    from datalake_indexes_spark.operators.dedup import chunk_dedup

    banner = "all rights reserved inc"
    docs = spark.createDataFrame(
        [
            (0, f"{banner} alpha beta gamma delta"),
            (1, f"{banner} epsilon zeta eta theta iota kappa lam mu"),
            (2, "nu xi omicron pi rho sigma tau ups"),
            (3, banner),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in chunk_dedup(docs, chunk_words=4).collect()}
    assert 3 not in out  # every chunk was boilerplate
    assert out[0]["text_clean"] == "alpha beta gamma delta"
    assert out[0]["dropped_chunks"] == 1 and out[0]["kept_chunks"] == 1
    assert out[1]["text_clean"] == "epsilon zeta eta theta iota kappa lam mu"
    assert out[2]["text_clean"] == "nu xi omicron pi rho sigma tau ups"
    assert out[2]["dropped_chunks"] == 0


def test_chunk_dedup_order_and_partial_tail(spark):
    """Surviving chunks reassemble in original order; a short tail chunk
    (len < chunk_words) is a first-class segment."""
    from datalake_indexes_spark.operators.dedup import chunk_dedup

    docs = spark.createDataFrame(
        [
            (0, "a b c d SHARED X Y Z e f"),
            (1, "SHARED X Y Z q r"),
        ],
        "doc_id long, text string",
    )
    # chunks of 4: doc0 = [a b c d][SHARED X Y Z][e f]; doc1 = [SHARED X Y Z][q r]
    out = {r["doc_id"]: r for r in chunk_dedup(docs, chunk_words=4).collect()}
    assert out[0]["text_clean"] == "a b c d e f"
    assert out[1]["text_clean"] == "q r"
    assert out[1]["kept_chunks"] == 1 and out[1]["dropped_chunks"] == 1


def test_normalize_scores_by_group_matches_percent_rank(spark):
    """The run-length-count formulation must equal percent_rank() exactly:
    ties share a rank, single-row groups are 0.0."""
    from pyspark.sql import Window
    from datalake_indexes_spark.operators.text_analysis import (
        normalize_scores_by_group,
    )

    rows = [
        (0, "a", 1.0), (1, "a", 2.0), (2, "a", 2.0), (3, "a", 5.0),
        (4, "b", 9.0),
        (5, "c", 3.0), (6, "c", 1.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, quality_score double")
    got = {
        r["doc_id"]: r["score_pct"]
        for r in normalize_scores_by_group(df, "source").collect()
    }
    w = Window.partitionBy("source").orderBy("quality_score")
    want = {
        r["doc_id"]: round(r["pr"], 6)
        for r in df.withColumn("pr", F.percent_rank().over(w)).collect()
    }
    assert got == want
    assert got[4] == 0.0          # singleton group
    assert got[1] == got[2]       # tie shares the rank


def test_chunk_dedup_roundtrip_identity(spark):
    """With an unreachable min_doc_freq nothing is boilerplate: every doc
    reassembles to its exact original text (random word soup, varied
    lengths incl. a partial tail and a single-word doc)."""
    import random

    from datalake_indexes_spark.operators.dedup import chunk_dedup

    rng = random.Random(11)
    rows = [
        (i, " ".join(rng.choice("abcdefgh") for _ in range(rng.randint(1, 23))))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in chunk_dedup(docs, min_doc_freq=10**9).collect()}
    assert len(out) == 60
    for i, text in rows:
        assert out[i]["text_clean"] == text
        assert out[i]["dropped_chunks"] == 0


def test_script_ratios_counts_and_dominant_priority(spark):
    """Hand-counted script composition, plus the fixed tie priority:
    equal Latin and Cyrillic counts must report 'latin'."""
    from datalake_indexes_spark.operators.text_analysis import script_ratios

    docs = spark.createDataFrame(
        [
            (1, "abcd 1234"),          # 4 latin, 4 digit, 1 space
            (2, "данные 数据 ab"),      # 6 cyr, 2 cjk, 2 latin, 2 space
            (3, "abcабв!"),            # 3 latin, 3 cyr tie -> latin
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in script_ratios(docs).collect()}
    r1 = out[1]
    assert r1.n_chars_total == 9
    assert (r1.latin_ratio, r1.digit_ratio, r1.space_ratio) == (
        round(4 / 9, 4), round(4 / 9, 4), round(1 / 9, 4)
    )
    assert r1.other_ratio == 0.0 and r1.dominant_script == "latin"
    r2 = out[2]
    assert r2.cyrillic_ratio == round(6 / 12, 4)
    assert r2.cjk_ratio == round(2 / 12, 4)
    assert r2.dominant_script == "cyrillic"
    r3 = out[3]
    assert r3.dominant_script == "latin"  # tie goes to the earlier priority
    assert r3.other_ratio == round(1 / 7, 4)  # the '!'


def test_content_type_code_vs_prose(spark):
    """Keyword-dense code flags via kw_hits, symbol-dense code via
    symbol_ratio, plain prose stays prose."""
    from datalake_indexes_spark.operators.text_analysis import content_type_scores

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "def f(x): return x import os class A struct B"),
        (3, "a[0] = {b: (c < d); e > f}; # dense symbols only here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in content_type_scores(docs).collect()}
    assert out[1]["content_type"] == "prose" and out[1]["kw_hits"] == 0
    assert out[2]["content_type"] == "code" and out[2]["kw_hits"] >= 4
    assert out[3]["content_type"] == "code" and out[3]["symbol_ratio"] >= 0.03


def test_budget_select_greedy_prefix(spark):
    """Selection is the exact greedy prefix in (score desc, id) order —
    inclusive budget, bucket boundaries never reorder."""
    from datalake_indexes_spark.operators.text_analysis import budget_select

    rows = [
        (1, 0.9, 10), (2, 0.9, 10),   # tie: id order
        (3, 0.7, 15), (4, 0.5, 100),  # 4 busts the budget
        (5, 0.3, 5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, quality_score double, n_tokens long")
    out = {r["doc_id"]: r["cum_tokens"]
           for r in budget_select(df, budget=40).collect()}
    assert out == {1: 10, 2: 20, 3: 35}  # 4 would hit 135 > 40; 5 after 4 also out
    # exact-budget inclusivity
    out45 = {r["doc_id"] for r in budget_select(df, budget=35).collect()}
    assert out45 == {1, 2, 3}


def test_compression_ratio_matches_direct_zlib(spark):
    import zlib

    from datalake_indexes_spark.operators.text_analysis import (
        compression_ratio_scores,
    )

    texts = ["abc " * 50, "the quick brown fox jumps over the lazy dog", "x"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in compression_ratio_scores(docs).collect()}
    for i, t in enumerate(texts):
        nb = len(t.encode("utf-8"))
        nc = len(zlib.compress(t.encode("utf-8"), 6))
        assert rows[i]["n_bytes"] == nb
        assert rows[i]["n_compressed"] == nc
        assert rows[i]["compression_ratio"] == round(nc / nb, 6)
    # the signal orders as expected: boilerplate < prose
    assert rows[0]["compression_ratio"] < rows[1]["compression_ratio"]


def test_corpus_data_card_shape(spark):
    from datalake_indexes_spark.operators.text_analysis import corpus_data_card

    docs = spark.createDataFrame(
        [
            (0, "the fast data", "en", "srcA", 13),
            (1, "the fast data", "en", "srcA", 13),  # exact dup
            (2, "other words here", "de", "srcB", 16),
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    card = {r["metric"]: r["value"] for r in corpus_data_card(docs).collect()}
    assert card["n_docs"] == 3.0
    assert card["n_sources"] == 2.0
    assert card["n_langs"] == 2.0
    assert card["exact_dup_rate"] == round(1 - 2 / 3, 6)
    assert card["n_chars_total"] == 42.0
    assert 0.0 < card["avg_quality"] <= 1.0
    assert card["avg_ws_tokens"] == 3.0


def test_paragraph_filter_semantics(spark):
    from datalake_indexes_spark.operators.text_analysis import paragraph_filter

    docs = spark.createDataFrame(
        [(0, "good words here live\nspam spam spam spam\nab cd ef gh")],
        "doc_id long, text string",
    )
    r = paragraph_filter(docs).collect()[0]
    assert (r["n_paragraphs"], r["n_kept"]) == (3, 2)
    assert r["text_filtered"] == "good words here live\nab cd ef gh"


def test_c4_rule_flags(spark):
    from datalake_indexes_spark.operators.text_analysis import c4_rule_flags

    docs = spark.createDataFrame(
        [
            (0, "The data runs well every day. The model trains fast on data."
                " It works fine for everyone."),
            (1, "please accept our cookie policy to continue reading here"),
            (2, "func main() { panic() }"),
            (3, "no punctuation at all just words"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in c4_rule_flags(docs).collect()}
    assert rows[0]["c4_keep"] is True and rows[0]["n_sentences"] == 3
    assert rows[1]["has_bad_phrase"] is True and rows[1]["c4_keep"] is False
    assert rows[2]["has_brace"] is True and rows[2]["c4_keep"] is False
    assert rows[3]["c4_keep"] is False  # too few sentences


def test_compressibility_null_and_empty_text(spark):
    """Null text propagates null (the UDF null-guard convention); empty
    text has no ratio (0/0 raises under ANSI otherwise)."""
    from datalake_indexes_spark.operators.text_analysis import (
        compression_ratio_scores,
    )

    docs = spark.createDataFrame(
        [(1, "aaaa bbbb aaaa bbbb"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in compression_ratio_scores(docs).collect()}
    assert out[1]["compression_ratio"] is not None
    assert out[2]["n_bytes"] is None and out[2]["compression_ratio"] is None
    assert out[3]["n_bytes"] == 0 and out[3]["compression_ratio"] is None


@pytest.mark.spark
class TestReadabilityScores:
    def test_hand_computed(self, spark):
        from datalake_indexes_spark.operators.text_analysis import readability_scores

        docs = spark.createDataFrame(
            [(1, "The cat sat. The dog ran!"),
             (2, "xyz"),                       # no vowels: 1 word, 1 syllable
             (3, "")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in readability_scores(docs).collect()}
        r1 = out[1]
        # 6 words, 2 sentences; syllables: each word one vowel run = 6
        assert r1.n_words == 6 and r1.n_sentences == 2 and r1.n_syllables == 6
        wps, spw = 6 / 2, 6 / 6
        assert r1.flesch == pytest.approx(206.835 - 1.015 * wps - 84.6 * spw, abs=1e-3)
        assert r1.fk_grade == pytest.approx(0.39 * wps + 11.8 * spw - 15.59, abs=1e-3)
        assert out[2].n_syllables == 1 and out[2].n_words == 1
        # empty text: no words -> NULL scores, min one sentence
        assert out[3].n_words == 0 and out[3].flesch is None
