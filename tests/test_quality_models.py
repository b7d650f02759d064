"""Gopher rule flags, DSIR importance weights, and hashed Naive Bayes —
value checks against hand-computed expectations plus the physical-plan
properties that make each operator safe at 100 TB (map-only Gopher,
broadcast model tables for DSIR/NB)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from datalake_indexes_spark.operators.ml import hashed_nb_classify
from datalake_indexes_spark.operators.text_analysis import (
    dsir_importance_weights,
    gopher_rule_flags,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _bucket(s: str, m: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % m


# ---------------------------------------------------------------- Gopher


def _gopher_rows(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        r["doc_id"]: r.asDict()
        for r in gopher_rule_flags(df, **kw).collect()
    }


def test_gopher_good_document_keeps(spark):
    rows = _gopher_rows(
        spark, ["the data runs well today"], min_words=3, min_stopwords=1
    )
    r = rows[0]
    assert r["n_words"] == 5
    assert r["mean_word_len"] == pytest.approx(4.0)
    assert r["symbol_ratio"] == 0.0
    assert r["bullet_line_ratio"] == 0.0
    assert r["ellipsis_line_ratio"] == 0.0
    assert r["alpha_word_ratio"] == 1.0
    assert r["n_stopwords"] == 1
    assert r["gopher_keep"] is True


def test_gopher_each_rule_fires(spark):
    bullets = "the good text here\n" + "\n".join(f"- b{i}" for i in range(10))
    ellipsis = "the words go on...\nmore soon...\nthe end..."
    symbols = "the data # ## ### # ## ### works"
    numeric = "the data 111 222 333 444 555 666 777 888"
    short = "the tiny"
    rows = _gopher_rows(
        spark,
        [bullets, ellipsis, symbols, numeric, short],
        min_words=3,
        min_stopwords=1,
    )
    # 10 of 11 non-empty lines are bullets: 0.9091 > 0.9
    assert rows[0]["bullet_line_ratio"] == pytest.approx(0.9091)
    assert rows[0]["gopher_keep"] is False
    # all 3 lines end with an ellipsis
    assert rows[1]["ellipsis_line_ratio"] == 1.0
    assert rows[1]["gopher_keep"] is False
    # 12 hash marks over 9 words
    assert rows[2]["symbol_ratio"] == pytest.approx(round(12 / 9, 4))
    assert rows[2]["gopher_keep"] is False
    # 8 of 10 words are pure numerals: alpha ratio 0.2 < 0.8
    assert rows[3]["alpha_word_ratio"] == pytest.approx(0.2)
    assert rows[3]["gopher_keep"] is False
    # below min_words
    assert rows[4]["n_words"] == 2
    assert rows[4]["gopher_keep"] is False


def test_gopher_stopword_and_word_length_rules(spark):
    # zero canonical stop words -> fails at min_stopwords=1
    rows = _gopher_rows(
        spark, ["data runs quickly onward"], min_words=3, min_stopwords=1
    )
    assert rows[0]["n_stopwords"] == 0
    assert rows[0]["gopher_keep"] is False
    # mean word length below 3 fails
    rows = _gopher_rows(
        spark, ["a b c d e the"], min_words=3, min_stopwords=1
    )
    assert rows[0]["mean_word_len"] == pytest.approx(round(8 / 6, 4))
    assert rows[0]["gopher_keep"] is False


def test_gopher_is_map_only(spark):
    df = spark.createDataFrame([(1, "the a b")], "doc_id long, text string")
    plan = _plan(gopher_rule_flags(df))
    assert "Exchange" not in plan


# ------------------------------------------------------------------ DSIR


def test_dsir_hand_computed_minimal_corpus(spark):
    # doc 0 (target): grams {x, x, "x x"}; doc 1 (raw-only): gram {y}
    b = 16
    assert len({_bucket("x", b), _bucket("x x", b), _bucket("y", b)}) == 3
    df = spark.createDataFrame(
        [(0, "x x", "en"), (1, "y", "de")],
        "doc_id long, text string, lang string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in dsir_importance_weights(df, n_buckets=b, alpha=0.5).collect()
    }
    # raw_t=4, tgt_t=3; alpha*B = 8
    # l(x) = ln(2.5/11) - ln(2.5/12) = ln(12/11); same for "x x"
    assert out[0]["is_target"] is True
    assert out[0]["n_grams"] == 3
    assert out[0]["avg_logratio"] == pytest.approx(math.log(12 / 11), abs=1e-4)
    # l(y) = ln(0.5/11) - ln(1.5/12)
    assert out[1]["is_target"] is False
    assert out[1]["n_grams"] == 1
    assert out[1]["avg_logratio"] == pytest.approx(
        math.log(0.5 / 11) - math.log(1.5 / 12), abs=1e-4
    )


def test_dsir_separates_target_like_documents(spark):
    # target docs speak "tgt"; raw docs speak "noise"; a held-out raw doc
    # written in target vocabulary must outscore its noise peers.
    rows = [(i, "tgt alpha tgt beta tgt", "en") for i in range(20)]
    rows += [(100 + i, "noise qq noise zz noise", "de") for i in range(20)]
    rows += [(999, "tgt alpha tgt beta tgt", "de")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in dsir_importance_weights(df).collect()}
    assert out[999]["avg_logratio"] > out[100]["avg_logratio"]
    assert out[999]["avg_logratio"] == pytest.approx(
        out[0]["avg_logratio"], abs=1e-4
    )


def test_dsir_empty_documents_omitted(spark):
    df = spark.createDataFrame(
        [(0, "x y", "en"), (1, "", "en"), (2, "  ", "de")],
        "doc_id long, text string, lang string",
    )
    got = {r["doc_id"] for r in dsir_importance_weights(df).collect()}
    assert got == {0}


def test_dsir_model_join_is_broadcast(spark):
    df = spark.createDataFrame(
        [(i, "w a b", "en" if i % 2 else "de") for i in range(30)],
        "doc_id long, text string, lang string",
    )
    plan = _plan(dsir_importance_weights(df))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------------------ Naive Bayes


def test_nb_recovers_separable_labels(spark):
    rows = [(i, "apple banana apple", "fruit") for i in range(10)]
    rows += [(100 + i, "zebra yak zebra", "animal") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = hashed_nb_classify(df, n_buckets=64).collect()
    assert len(out) == 20
    assert all(r["correct"] for r in out)
    assert all(r["n_words"] == 3 for r in out)


def test_nb_classifies_against_its_own_label(spark):
    # a doc labeled "big" but written in "small" vocabulary must be
    # PREDICTED small (correct=False) — the classifier scores content,
    # it does not echo the training label back.
    rows = [(i, "aaa aaa aaa", "big") for i in range(10)]
    rows += [(100 + i, "zzz zzz zzz", "small") for i in range(10)]
    rows += [(999, "zzz zzz zzz", "big")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in hashed_nb_classify(df, n_buckets=64).collect()}
    assert out[999]["pred_label"] == "small"
    assert out[999]["correct"] is False
    assert out[0]["pred_label"] == "big"


def test_nb_deterministic_across_runs(spark):
    rows = [
        (i, f"t{i % 7} shared vocab", "en" if i % 3 else "fr")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    a = sorted(map(tuple, hashed_nb_classify(df).collect()))
    b = sorted(map(tuple, hashed_nb_classify(df).collect()))
    assert a == b


def test_nb_model_joins_are_broadcast(spark):
    df = spark.createDataFrame(
        [(i, "w a b", "en" if i % 2 else "de") for i in range(30)],
        "doc_id long, text string, lang string",
    )
    plan = _plan(hashed_nb_classify(df, n_buckets=32))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------------------------ harmonic pack


def _mk_docs(spark, lens):
    return spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(lens)],
        "doc_id long, text string",
    )


def test_harmonic_pack_class_geometry(spark):
    from datalake_indexes_spark.operators.text_analysis import harmonic_pack

    # budget 10: len 3 -> class 3, len 5 -> class 2, len 9 -> class 1,
    # len 12 -> oversize class 1
    out = {
        r["doc_id"]: r
        for r in harmonic_pack(
            _mk_docs(spark, [3, 5, 9, 12]), token_budget=10
        ).collect()
    }
    assert out[0]["size_class"] == 3 and not out[0]["oversize"]
    assert out[1]["size_class"] == 2 and not out[1]["oversize"]
    assert out[2]["size_class"] == 1 and not out[2]["oversize"]
    assert out[3]["size_class"] == 1 and out[3]["oversize"]


def test_harmonic_pack_bins_fill_and_never_split(spark):
    from datalake_indexes_spark.operators.text_analysis import harmonic_pack

    # 7 docs of 3 tokens at budget 10 -> class 3 -> bins of exactly 3
    # docs: 3 + 3 + 1
    rows = harmonic_pack(_mk_docs(spark, [3] * 7), token_budget=10).collect()
    from collections import Counter

    bins = Counter(r["bin_in_class"] for r in rows)
    assert sorted(bins.values(), reverse=True) == [3, 3, 1]
    # slots within each bin are 0..k-1 with no repeats
    slots = {}
    for r in rows:
        slots.setdefault(r["bin_in_class"], set()).add(r["bin_slot"])
    for b, s in slots.items():
        assert s == set(range(len(s)))
    # every bin respects the token budget (the non-oversize guarantee)
    for b in bins:
        total = sum(r["n_tokens"] for r in rows if r["bin_in_class"] == b)
        assert total <= 10


def test_harmonic_pack_fill_census_consistency(spark):
    from datalake_indexes_spark.operators.text_analysis import (
        harmonic_pack,
        harmonic_pack_fill,
    )

    lens = [3, 3, 3, 5, 5, 9, 12, 4, 6, 2, 2, 2, 2]
    docs = _mk_docs(spark, lens)
    per_doc = harmonic_pack(docs, token_budget=10).collect()
    census = {
        r["size_class"]: r
        for r in harmonic_pack_fill(docs, token_budget=10).collect()
    }
    assert sum(r["n_docs"] for r in census.values()) == len(lens)
    for k, r in census.items():
        k_docs = [d for d in per_doc if d["size_class"] == k]
        assert r["n_docs"] == len(k_docs)
        assert r["total_tokens"] == sum(d["n_tokens"] for d in k_docs)
        assert r["n_bins"] == max(d["bin_in_class"] for d in k_docs) + 1
        if r["n_oversize"] == 0:
            assert (
                r["padding_tokens"]
                == r["n_bins"] * 10 - r["total_tokens"]
            )


def test_harmonic_pack_has_no_global_window(spark):
    from datalake_indexes_spark.operators.text_analysis import harmonic_pack
    from datalake_indexes_spark.plans.audit import plan_report

    rep = plan_report(harmonic_pack(_mk_docs(spark, [3] * 50)))
    assert rep["n_global_windows"] == 0
    assert rep["n_sortmerge_joins"] == 0


# ------------------------------------------------------- property tests


def test_harmonic_pack_matches_reference_property(spark):
    from hypothesis import given, settings, strategies as st

    from datalake_indexes_spark.operators.text_analysis import harmonic_pack

    @settings(max_examples=10, deadline=None)
    @given(
        lens=st.lists(st.integers(1, 40), min_size=1, max_size=60),
        budget=st.integers(5, 30),
    )
    def check(lens, budget):
        got = {
            r["doc_id"]: (
                r["n_tokens"],
                r["size_class"],
                r["oversize"],
                r["bin_in_class"],
                r["bin_slot"],
            )
            for r in harmonic_pack(
                _mk_docs(spark, lens), token_budget=budget
            ).collect()
        }
        # reference: class = max(1, budget // n); within class order by
        # (md5 salt bucket, doc_id); bin = idx // k, slot = idx % k
        by_class: dict[int, list[int]] = {}
        for i, n in enumerate(lens):
            by_class.setdefault(max(1, budget // n), []).append(i)
        want = {}
        for k, ids in by_class.items():
            ids.sort(key=lambda i: (_bucket(str(i), 32), i))
            for idx, i in enumerate(ids):
                want[i] = (lens[i], k, lens[i] > budget, idx // k, idx % k)
        assert got == want
        # non-oversize bins respect the budget
        fills: dict[tuple, int] = {}
        for i, (n, k, over, b, _s) in got.items():
            if not over:
                fills[(k, b)] = fills.get((k, b), 0) + n
        assert all(v <= budget for v in fills.values())

    check()


def test_dsir_matches_reference_property(spark):
    import math as m
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    from datalake_indexes_spark.operators.text_analysis import (
        dsir_importance_weights,
    )

    word = st.sampled_from(["aa", "bb", "cc", "dd"])

    @settings(max_examples=8, deadline=None)
    @given(
        docs=st.lists(
            st.tuples(
                st.lists(word, min_size=1, max_size=6),
                st.booleans(),
            ),
            min_size=2,
            max_size=12,
        )
    )
    def check(docs):
        B, alpha = 16, 0.5
        rows = [
            (i, " ".join(ws), "en" if tgt else "de")
            for i, (ws, tgt) in enumerate(docs)
        ]
        if not any(tgt for _, tgt in docs):
            return  # degenerate: empty target corpus
        out = {
            r["doc_id"]: r
            for r in dsir_importance_weights(
                spark.createDataFrame(
                    rows, "doc_id long, text string, lang string"
                ),
                n_buckets=B,
                alpha=alpha,
            ).collect()
        }
        raw, tgt_c = Counter(), Counter()
        grams_of = {}
        for i, (ws, tgt) in enumerate(docs):
            grams = list(ws) + [
                f"{a} {b}" for a, b in zip(ws, ws[1:])
            ]
            grams_of[i] = [_bucket(g, B) for g in grams]
            for b in grams_of[i]:
                raw[b] += 1
                if tgt:
                    tgt_c[b] += 1
        rt, tt = sum(raw.values()), sum(tgt_c.values())
        for i, (ws, tgt) in enumerate(docs):
            ls = [
                m.log((tgt_c[b] + alpha) / (tt + alpha * B))
                - m.log((raw[b] + alpha) / (rt + alpha * B))
                for b in grams_of[i]
            ]
            assert out[i]["n_grams"] == len(grams_of[i])
            assert out[i]["is_target"] is tgt
            assert out[i]["avg_logratio"] == pytest.approx(
                sum(ls) / len(ls), abs=1e-4
            )

    check()


def test_nb_matches_reference_property(spark):
    import math as m
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    word = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])

    @settings(max_examples=8, deadline=None)
    @given(
        docs=st.lists(
            st.tuples(
                st.lists(word, min_size=1, max_size=5),
                st.sampled_from(["p", "q"]),
            ),
            min_size=2,
            max_size=12,
        )
    )
    def check(docs):
        B, alpha = 32, 1.0
        labels = {lbl for _, lbl in docs}
        rows = [
            (i, " ".join(ws), lbl) for i, (ws, lbl) in enumerate(docs)
        ]
        out = {
            r["doc_id"]: r
            for r in hashed_nb_classify(
                spark.createDataFrame(
                    rows, "doc_id long, text string, lang string"
                ),
                n_buckets=B,
                alpha=alpha,
            ).collect()
        }
        cnt = {lbl: Counter() for lbl in labels}
        nd = Counter(lbl for _, lbl in docs)
        for ws, lbl in docs:
            for w in ws:
                cnt[lbl][_bucket(w, B)] += 1
        scores_of = {}
        for i, (ws, lbl) in enumerate(docs):
            scores = {}
            for c in labels:
                tc = sum(cnt[c].values())
                s = m.log(nd[c] / len(docs)) + sum(
                    m.log((cnt[c][_bucket(w, B)] + alpha) / (tc + alpha * B))
                    for w in ws
                )
                scores[c] = s
            scores_of[i] = scores
            best = max(labels, key=lambda c: (round(scores[c], 6), c))
            margin = (
                abs(max(scores.values()) - min(scores.values()))
                if len(labels) > 1
                else 1.0
            )
            assert out[i]["n_words"] == len(ws)
            if margin > 1e-5:  # skip near-exact ties where float
                # summation order could legitimately flip the argmax
                assert out[i]["pred_label"] == best, (i, scores)

    check()


def test_dsir_select_takes_top_fraction(spark):
    from datalake_indexes_spark.operators.text_analysis import (
        dsir_importance_weights,
        dsir_select,
    )
    from datalake_indexes_spark.plans.audit import plan_report

    rows = [(i, "tgt alpha tgt", "en") for i in range(10)]
    rows += [(100 + i, "noise qq zz", "de") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    sel = dsir_select(df, fraction=0.25)
    got = sorted(r["doc_id"] for r in sel.collect())
    # ceil(40 * 0.25) = 10 — exactly the ten target-vocabulary docs
    assert got == list(range(10))
    # ranks are 1..10 and ordered by weight desc
    ranks = {r["sel_rank"] for r in sel.collect()}
    assert ranks == set(range(1, 11))
    # selected minimum weight >= best unselected weight
    all_w = {
        r["doc_id"]: r["avg_logratio"]
        for r in dsir_importance_weights(df).collect()
    }
    sel_min = min(all_w[i] for i in got)
    rest_max = max(w for i, w in all_w.items() if i not in got)
    assert sel_min >= rest_max
    # audit a FRESH plan (post-collect, AdaptiveSparkPlan prints initial
    # + final and double-counts): the ONE global window is global_rank's
    # sanctioned bucket-offset cumsum over a <= ~2100-row table — the
    # corpus itself never crosses an unpartitioned window
    assert plan_report(dsir_select(df, fraction=0.25))["n_global_windows"] == 1


# -------------------------------------------------------------------- MMR


def test_mmr_prefers_diverse_over_redundant(spark):
    from datalake_indexes_spark.operators.similarity import mmr_topk

    # query along x; candidates: three near-copies of the best match and
    # one slightly-less-relevant but orthogonal-ish vector.  Plain top-3
    # takes the three copies; MMR at lam=0.5 must pull in the diverse one.
    rows = [
        (0, [1.0, 0.0, 0.0]),        # query
        (1, [0.99, 0.1, 0.0]),
        (2, [0.99, 0.11, 0.0]),
        (3, [0.99, 0.12, 0.0]),
        (4, [0.6, 0.0, 0.8]),        # diverse
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mmr_topk(
        emb, emb.filter("vec_id = 0"), k=3, lam=0.5, candidates=4
    ).collect()
    picked = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["mmr_rank"])]
    assert picked[0] == 1            # most relevant first
    assert 4 in picked[:3]           # diversity pick beats the third copy
    ranks = [r["mmr_rank"] for r in out]
    assert sorted(ranks) == [1, 2, 3]


def test_mmr_lam_one_equals_relevance_order(spark):
    from datalake_indexes_spark.operators.similarity import (
        cosine_topk,
        mmr_topk,
    )

    rows = [(i, [float((i * 7) % 5 + 1), float(i % 3), 1.0]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter("vec_id = 0")
    mmr = mmr_topk(emb, q, k=5, lam=1.0, candidates=10)
    top = cosine_topk(emb, q, k=5)
    got = [
        r["neighbor_id"]
        for r in sorted(mmr.collect(), key=lambda r: r["mmr_rank"])
    ]
    want = [
        r["neighbor_id"] for r in sorted(top.collect(), key=lambda r: r["rank"])
    ]
    assert got == want


def test_mmr_deterministic(spark):
    from datalake_indexes_spark.operators.similarity import mmr_topk

    rows = [(i, [float(i % 4), float(i % 7), 2.0]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter("vec_id < 2")
    a = sorted(map(tuple, mmr_topk(emb, q, k=4, candidates=8).collect()))
    b = sorted(map(tuple, mmr_topk(emb, q, k=4, candidates=8).collect()))
    assert a == b


def test_mmr_greedy_is_executor_side(spark):
    # r7 verdict task #2: the greedy must run as
    # groupBy(query_id).applyInPandas on the executors — the plan is one
    # connected pipeline from the corpus scan through
    # FlatMapGroupsInPandas, with NO LocalTableScan (the signature of
    # the old collect()-then-createDataFrame driver round-trip) and no
    # eager jobs at construction time.
    from datalake_indexes_spark.operators.similarity import mmr_topk

    rows = [(i, [float(i % 4), float(i % 7), 2.0]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    before = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    df = mmr_topk(emb, emb.filter("vec_id < 2"), k=4, candidates=8)
    after = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    assert len(after) == len(before), "mmr_topk construction ran Spark jobs"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert "LocalTableScan" not in plan
