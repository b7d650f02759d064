"""Kneser-Ney bigram scores — exact hand computation on a tiny corpus,
continuation-count behavior (the "francisco" property), and probability
mass sanity."""

from __future__ import annotations

import math

from datalake_indexes_spark.operators.text_analysis import (
    bigram_logprob_scores,
    kn_logprob_scores,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_hand_computed_tiny_corpus(spark):
    # corpus: "a b" x2 and "a c" -> bigrams: (a,b):2, (a,c):1
    # c1(a)=3, N1+(a.)=2, N1+(.b)=1, N1+(.c)=1, T=2, D=0.75
    # P(b|a) = (max(2-.75,0) + .75*2*(1/2)) / 3 = (1.25 + .75) / 3 = 2/3
    # P(c|a) = (max(1-.75,0) + .75*2*(1/2)) / 3 = (0.25 + .75) / 3 = 1/3
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob_kn"])
        for r in kn_logprob_scores(_docs(spark, ["a b", "a b", "a c"])).collect()
    }
    assert got[0] == (1, round(math.log(2.0 / 3.0), 4))
    assert got[1] == got[0]
    assert got[2] == (1, round(math.log(1.0 / 3.0), 4))


def test_short_docs_omitted(spark):
    got = kn_logprob_scores(_docs(spark, ["single", "two words"])).collect()
    assert {r["doc_id"] for r in got} == {1}


def test_continuation_backoff_distinguishes_contexts(spark):
    # "b" follows many distinct contexts; "z" always follows the same
    # one with the same raw count per context.  KN's backoff term gives
    # the versatile continuation higher probability mass in a NOVEL-ish
    # low-count context; the add-k model sees only raw counts.
    rows = ["p b", "q b", "r b", "s b", "x z", "x z", "x z", "x z", "p z"]
    kn = {
        r["doc_id"]: r["avg_logprob_kn"]
        for r in kn_logprob_scores(_docs(spark, rows)).collect()
    }
    # both (p,b) and (p,z) have c12=1 and share context p (c1=2):
    # only the continuation counts differ -> b must beat z after p
    assert kn[0] > kn[8]


def test_conditional_mass_sums_to_one_per_context(spark):
    # Context a: bigrams (a,b):2, (a,c):1, c1=3, N1+(a.)=2; T=4 types;
    # Pcont(a,b,c) = 2/4, 1/4, 1/4.  Hand KN:
    #   P(b|a) = (1.25 + .75*2*(1/4)) / 3 = 13/24
    #   P(c|a) = (0.25 + .75*2*(1/4)) / 3 =  5/24
    #   unseen P(a|a) = (.75/3)*2*(2/4)  =  6/24   -> total 1 exactly
    rows = ["a b", "a b", "a c", "b a", "c a"]
    got = {r["doc_id"]: r for r in kn_logprob_scores(_docs(spark, rows)).collect()}
    p_ab = math.exp(got[0]["avg_logprob_kn"])
    p_ac = math.exp(got[2]["avg_logprob_kn"])
    assert abs(p_ab - 13 / 24) < 2e-4
    assert abs(p_ac - 5 / 24) < 2e-4
    p_unseen_a = (0.75 / 3) * 2 * (2 / 4)
    assert abs(p_ab + p_ac + p_unseen_a - 1.0) < 4e-4


def test_ranks_against_addk_on_salad(spark):
    # a document chaining words in NEVER-seen-elsewhere order scores
    # below the repeated natural phrase under both LMs; KN keeps that
    # ordering (sanity that the upgrade does not break the basic signal)
    rows = ["the quick fox", "the quick fox", "the quick fox", "fox the quick"]
    kn = {
        r["doc_id"]: r["avg_logprob_kn"]
        for r in kn_logprob_scores(_docs(spark, rows)).collect()
    }
    addk = {
        r["doc_id"]: r["avg_logprob2"]
        for r in bigram_logprob_scores(_docs(spark, rows)).collect()
    }
    assert kn[0] > kn[3] and addk[0] > addk[3]


def test_zero_bigram_corpus_is_empty_not_div_by_zero(spark):
    # ADVICE r7: every doc < 2 words -> no bigrams -> the backoff
    # denominator |bigram types| is 0; must return the empty frame with
    # the contract schema, not raise or divide by zero.
    from datalake_indexes_spark.operators.text_analysis import kn_logprob_scores

    docs = spark.createDataFrame(
        [(0, "solo"), (1, "word"), (2, "")], "doc_id long, text string"
    )
    out = kn_logprob_scores(docs)
    assert out.columns == ["doc_id", "n_bigrams", "avg_logprob_kn"]
    assert out.count() == 0


def test_ppl_buckets_per_source_bands(spark):
    # CCNet bucketing is PER SOURCE: each source's docs split into
    # head/middle/tail by its own score distribution — a fluent doc in
    # a noisy source must land in that source's head even if its score
    # would be mid-pack globally.
    from datalake_indexes_spark.operators.text_analysis import ppl_buckets

    rows = []
    # source A: three docs built from a repeated fluent phrase (high
    # bigram scores) with increasing salad; source B: all salad.
    rows.append((0, "the cat sat the cat sat the cat sat", "A"))
    rows.append((1, "the cat sat on a mat quite still", "A"))
    rows.append((2, "zx qv pl mn bb cc dd ee", "A"))
    rows.append((3, "qq ww ee rr tt yy uu ii", "B"))
    rows.append((4, "aa ss dd ff gg hh jj kk", "B"))
    rows.append((5, "zz xx cc vv bb nn mm ll", "B"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r for r in ppl_buckets(docs, n_buckets=3).collect()}
    assert len(out) == 6
    for src in ("A", "B"):
        bands = sorted(r["band"] for r in out.values() if r["source"] == src)
        assert bands == ["head", "middle", "tail"]  # one per tercile
    # within A, the repeated-phrase doc outscores the salad doc
    assert out[0]["band"] == "head" and out[2]["band"] == "tail"
    # B has its own head even though every B doc is salad
    b_head = [d for d, r in out.items() if r["source"] == "B" and r["band"] == "head"]
    assert len(b_head) == 1


def _two_source_corpus(spark, docs_per_source=9):
    """Distinct-score fixture: per source, doc i repeats a fluent bigram
    i times then pads with unique salad, so KN scores strictly descend
    with i within each source — distinct scores and a doc count
    divisible by 3 are exactly the regime where the approx tier's
    rank-exact thresholds must reproduce the ntile assignment."""
    rows = []
    did = 0
    for src in ("A", "B"):
        for i in range(docs_per_source):
            fluent = "the cat sat " * (docs_per_source - i + 1)
            salad = " ".join(f"q{src}{i}x{j}" for j in range(i + 2))
            rows.append((did, (fluent + salad).strip(), src))
            did += 1
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_ppl_buckets_approx_tier_equals_exact_on_fixture(spark):
    # The 100-TB tier (per-source GK thresholds broadcast back) must
    # agree with the exact per-source ntile wherever its guarantees
    # hold: rank-exact thresholds (accuracy >> n), distinct scores,
    # counts divisible by n_buckets.
    from datalake_indexes_spark.operators.text_analysis import ppl_buckets

    docs = _two_source_corpus(spark)
    exact = {r["doc_id"]: r for r in ppl_buckets(docs, n_buckets=3).collect()}
    approx = {
        r["doc_id"]: r
        for r in ppl_buckets(docs, n_buckets=3, approx=True).collect()
    }
    assert set(exact) == set(approx) and len(exact) == 18
    # precondition of the equivalence: scores distinct within source
    for src in ("A", "B"):
        scores = [r["avg_logprob_kn"] for r in exact.values() if r["source"] == src]
        assert len(set(scores)) == len(scores)
    for did, r in exact.items():
        assert approx[did]["bucket"] == r["bucket"], did
        assert approx[did]["band"] == r["band"], did


def test_ppl_buckets_approx_plan_has_no_source_window(spark):
    # The approx tier's point: no per-source sort — the plan carries a
    # broadcast join of the one-row-per-source threshold table and ZERO
    # window operators.
    from datalake_indexes_spark.operators.text_analysis import ppl_buckets

    docs = _two_source_corpus(spark)
    plan = ppl_buckets(docs, n_buckets=3, approx=True)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_ppl_buckets_approx_keeps_null_source_docs(spark):
    # Real crawl corpora carry NULL sources; the exact tier's window
    # buckets them as their own partition, and the approx tier's
    # threshold join must be null-safe or those docs silently vanish.
    from pyspark.sql import functions as F

    from datalake_indexes_spark.operators.text_analysis import ppl_buckets

    docs = _two_source_corpus(spark, docs_per_source=3).withColumn(
        "source",
        F.when(F.col("source") == "B", F.lit(None).cast("string")).otherwise(
            F.col("source")
        ),
    )
    exact = ppl_buckets(docs, n_buckets=3).collect()
    approx = ppl_buckets(docs, n_buckets=3, approx=True).collect()
    assert len(exact) == len(approx) == 6
    null_rows = [r for r in approx if r["source"] is None]
    assert len(null_rows) == 3
    assert sorted(r["bucket"] for r in null_rows) == [1, 2, 3]


def test_ppl_buckets_approx_single_bucket(spark):
    from datalake_indexes_spark.operators.text_analysis import ppl_buckets

    docs = _two_source_corpus(spark, docs_per_source=3)
    out = ppl_buckets(docs, n_buckets=1, approx=True).collect()
    assert len(out) == 6
    assert all(r["bucket"] == 1 and r["band"] == "head" for r in out)
