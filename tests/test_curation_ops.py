"""Unit semantics for the round-5 curation/search/event operators:
benchmark decontamination, BM25/TF-IDF relevance, as-of joins, SemDeDup
semantic dedup, temperature mixing.  Hand-built frames with known ground
truth; the DuckDB oracle gate covers the corpus-scale versions."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


@pytest.mark.spark
class TestDecontaminate:
    def test_flags_overlapping_doc(self, spark):
        from datalake_indexes_spark.operators.text_analysis import decontaminate

        bench = spark.createDataFrame(
            [(100, "the quick brown fox jumps over the lazy dog")],
            "doc_id long, text string",
        )
        docs = spark.createDataFrame(
            [
                # shares the full benchmark 5-gram window (contaminated)
                (1, "intro words the quick brown fox jumps over the lazy dog end"),
                # no 5-gram overlap
                (2, "completely unrelated text with no benchmark overlap at all"),
                # shares 4-gram only -> no 5-gram hit
                (3, "quick brown fox jumps away from everything else here"),
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in decontaminate(docs, bench, n=5, min_overlap=1).collect()
        }
        assert out[1]["contaminated"] and out[1]["n_overlap"] >= 1
        assert not out[2]["contaminated"] and out[2]["n_overlap"] == 0
        assert not out[3]["contaminated"]
        # 12-word doc => 8 distinct 5-grams
        assert out[1]["n_shingles"] == 8

    def test_min_overlap_threshold(self, spark):
        from datalake_indexes_spark.operators.text_analysis import decontaminate

        bench = spark.createDataFrame(
            [(0, "a b c d e f")], "doc_id long, text string"
        )
        docs = spark.createDataFrame(
            [(1, "a b c d e f")], "doc_id long, text string"
        )  # 2 shared 5-grams
        strict = decontaminate(docs, bench, n=5, min_overlap=3).collect()[0]
        loose = decontaminate(docs, bench, n=5, min_overlap=2).collect()[0]
        assert not strict["contaminated"] and loose["contaminated"]
        assert loose["overlap_frac"] == 1.0


@pytest.mark.spark
class TestSearch:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "spark spark spark join"),
                (2, "spark join window"),
                (3, "nothing relevant here"),
                (4, "window"),
            ],
            "doc_id long, text string",
        )

    def test_bm25_ranks_and_excludes(self, spark):
        from datalake_indexes_spark.operators.search import bm25_topk

        out = bm25_topk(self._docs(spark), ["spark", "join", "window"], k=10).collect()
        ids = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
        assert 3 not in ids  # no query term -> never scored
        assert ids[0] == 2  # hits all three terms
        assert all(r["score"] > 0 for r in out)

    def test_bm25_matches_closed_form(self, spark):
        from datalake_indexes_spark.operators.search import bm25_topk

        docs = spark.createDataFrame(
            [(1, "t t u"), (2, "u u u")], "doc_id long, text string"
        )
        out = {r["doc_id"]: r["score"] for r in bm25_topk(docs, ["t"], k=10).collect()}
        # N=2, df=1, dl=3, avgdl=3, tf=2
        idf = math.log(1 + (2 - 1 + 0.5) / (1 + 0.5))
        score = idf * (2 * 2.2) / (2 + 1.2 * (1 - 0.75 + 0.75 * 1.0))
        assert out.keys() == {1}
        assert abs(out[1] - round(score, 4)) < 1e-9

    def test_tfidf_orders_by_tf(self, spark):
        from datalake_indexes_spark.operators.search import tfidf_topk

        out = tfidf_topk(self._docs(spark), ["spark"], k=10).collect()
        ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
        assert ranked == [1, 2]


@pytest.mark.spark
class TestAsofJoin:
    def test_backward_inclusive_and_nulls(self, spark):
        from datalake_indexes_spark.operators.events import asof_join

        build = spark.createDataFrame(
            [(10, 1, 100, 5.0), (11, 1, 200, 6.0), (12, 2, 150, 7.0)],
            "event_id long, user_id long, ts_us long, value double",
        )
        probe = spark.createDataFrame(
            [
                (1, 1, 150),  # after ts=100 -> event 10
                (2, 1, 200),  # equal ts -> inclusive -> event 11
                (3, 1, 50),   # before everything -> NULL
                (4, 2, 1000), # -> event 12
                (5, 3, 500),  # no build rows for user 3 -> NULL
            ],
            "event_id long, user_id long, ts_us long",
        )
        out = {
            r["event_id"]: r
            for r in asof_join(
                probe, build, "user_id", "ts_us",
                ["event_id", "value"], seq_col="event_id",
            ).collect()
        }
        assert len(out) == 5
        assert out[1]["asof_event_id"] == 10 and out[1]["asof_value"] == 5.0
        assert out[2]["asof_event_id"] == 11  # inclusive at equal ts
        assert out[3]["asof_event_id"] is None
        assert out[4]["asof_event_id"] == 12
        assert out[5]["asof_event_id"] is None

    def test_equal_ts_build_ties_resolve_to_max_seq(self, spark):
        from datalake_indexes_spark.operators.events import asof_join

        build = spark.createDataFrame(
            [(20, 1, 100, 1.0), (21, 1, 100, 2.0)],
            "event_id long, user_id long, ts_us long, value double",
        )
        probe = spark.createDataFrame(
            [(1, 1, 100)], "event_id long, user_id long, ts_us long"
        )
        r = asof_join(
            probe, build, "user_id", "ts_us", ["event_id", "value"], seq_col="event_id"
        ).collect()[0]
        assert r["asof_event_id"] == 21 and r["asof_value"] == 2.0


@pytest.mark.spark
class TestSemanticDedup:
    def test_keeps_lowest_id_per_near_dup_group(self, spark):
        from datalake_indexes_spark.operators.similarity import semantic_dedup

        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (5, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 0 -> dropped
            (6, [0.0, 0.998, 0.02, 0.0]),   # near-dup of 1 -> dropped
            (7, [0.0, 0.0, 0.0, 1.0]),      # orthogonal -> kept
        ]
        out = {
            r["vec_id"]: r["kept"]
            for r in semantic_dedup(
                spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
                n_centroids=2,
                threshold=0.95,
            ).collect()
        }
        assert out[0] and out[1]
        assert not out[5] and not out[6]
        assert out[7]

    def test_cross_cluster_pairs_not_compared(self, spark):
        from datalake_indexes_spark.operators.similarity import semantic_dedup

        # centroids = vecs 0 and 1; vec 5 lands in cluster 1 even though
        # its true nearest corpus vector sits in cluster 0 — SemDeDup's
        # documented recall boundary, pinned here.
        rows = [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (5, [0.6, 0.8]),
        ]
        out = {
            r["vec_id"]: r
            for r in semantic_dedup(
                spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
                n_centroids=2,
                threshold=0.5,
            ).collect()
        }
        assert out[5]["centroid"] == 1
        # cos(5, 1) = 0.8 >= 0.5 -> dropped within its own cluster
        assert not out[5]["kept"]


@pytest.mark.spark
class TestTemperatureMix:
    def test_repeat_factors(self, spark):
        from datalake_indexes_spark.operators.text_analysis import temperature_mix

        rows = [(i, "big") for i in range(100)] + [(100 + i, "small") for i in range(25)]
        docs = spark.createDataFrame(rows, "doc_id long, lang string")
        out = temperature_mix(docs, alpha=0.5, max_repeat=4.0)
        agg = {
            r["stratum"]: r["n"]
            for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()
        }
        # big: r = 1.0 -> exactly one copy each
        assert agg["big"] == 100
        # small: r = (100/25)^0.5 = 2.0 exactly -> two copies each
        assert agg["small"] == 50
        # rep_ids are dense per doc
        reps = out.filter(F.col("doc_id") == 100).select("rep_id").collect()
        assert sorted(r["rep_id"] for r in reps) == [0, 1]

    def test_max_repeat_cap_and_fractional(self, spark):
        from datalake_indexes_spark.operators.text_analysis import temperature_mix

        rows = [(i, "big") for i in range(64)] + [(100, "tiny")]
        docs = spark.createDataFrame(rows, "doc_id long, lang string")
        out = temperature_mix(docs, alpha=1.0, max_repeat=4.0)
        n_tiny = out.filter(F.col("stratum") == "tiny").count()
        assert n_tiny == 4  # (64/1)^1 = 64, capped at 4
        # alpha=0 keeps natural proportions: everything exactly once
        flat = temperature_mix(docs, alpha=0.0, max_repeat=4.0)
        assert flat.count() == 65


@pytest.mark.spark
class TestChunkDocuments:
    def test_windows_and_overlap(self, spark):
        from datalake_indexes_spark.operators.text_analysis import chunk_documents

        docs = spark.createDataFrame(
            [(1, " ".join(f"w{i}" for i in range(10)))], "doc_id long, text string"
        )
        out = sorted(
            chunk_documents(docs, chunk_tokens=4, overlap=2).collect(),
            key=lambda r: r["chunk_id"],
        )
        # stride 2, starts while start < n - overlap = 8 -> 0,2,4,6
        assert [r["chunk_id"] for r in out] == [0, 1, 2, 3]
        assert out[0]["chunk_text"] == "w0 w1 w2 w3"
        assert out[1]["chunk_text"] == "w2 w3 w4 w5"  # 2-token overlap
        assert out[3]["chunk_text"] == "w6 w7 w8 w9"
        assert all(r["n_chunk_tokens"] == 4 for r in out)

    def test_short_doc_single_chunk(self, spark):
        from datalake_indexes_spark.operators.text_analysis import chunk_documents

        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        out = chunk_documents(docs, chunk_tokens=64, overlap=16).collect()
        assert len(out) == 1
        assert out[0]["chunk_id"] == 0 and out[0]["n_chunk_tokens"] == 2
        assert out[0]["chunk_text"] == "a b"

    def test_ragged_tail_window(self, spark):
        from datalake_indexes_spark.operators.text_analysis import chunk_documents

        docs = spark.createDataFrame(
            [(1, " ".join(f"w{i}" for i in range(7)))], "doc_id long, text string"
        )
        out = sorted(
            chunk_documents(docs, chunk_tokens=4, overlap=2).collect(),
            key=lambda r: r["chunk_id"],
        )
        # starts 0,2,4 (start<5); last window is the 3-token tail w4 w5 w6
        assert [r["n_chunk_tokens"] for r in out] == [4, 4, 3]
        assert out[-1]["chunk_text"] == "w4 w5 w6"

    def test_rejects_bad_overlap(self, spark):
        from datalake_indexes_spark.operators.text_analysis import chunk_documents

        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(docs, chunk_tokens=4, overlap=4)


@pytest.mark.spark
class TestRangeJoinBinned:
    def test_window_semantics(self, spark):
        from datalake_indexes_spark.operators.events import range_join_binned

        build = spark.createDataFrame(
            [(1, 100, 1.0), (1, 150, 2.0), (1, 200, 4.0), (2, 100, 8.0)],
            "user_id long, ts_us long, value double",
        )
        probe = spark.createDataFrame(
            [
                (1, 1, 200),   # window (100, 200]: ts 150, 200 (100 excluded)
                (2, 1, 120),   # window (20, 120]: ts 100
                (3, 1, 1000),  # nothing within (900, 1000]
                (4, 3, 100),   # no build key
            ],
            "event_id long, user_id long, ts_us long",
        )
        out = {
            r["event_id"]: r
            for r in range_join_binned(
                probe, build, "user_id", "ts_us", window=100,
                agg_cols={"value": "sum"},
            ).collect()
        }
        assert len(out) == 4
        assert out[1]["win_n"] == 2 and out[1]["win_sum_value"] == 6.0
        assert out[2]["win_n"] == 1 and out[2]["win_sum_value"] == 1.0
        assert out[3]["win_n"] == 0 and out[3]["win_sum_value"] is None
        assert out[4]["win_n"] == 0

    def test_exact_boundary_is_exclusive_lower_inclusive_upper(self, spark):
        from datalake_indexes_spark.operators.events import range_join_binned

        build = spark.createDataFrame(
            [(1, 100, 1.0), (1, 200, 2.0)], "user_id long, ts_us long, value double"
        )
        probe = spark.createDataFrame(
            [(1, 1, 200)], "event_id long, user_id long, ts_us long"
        )
        r = range_join_binned(
            probe, build, "user_id", "ts_us", window=100, agg_cols={"value": "sum"}
        ).collect()[0]
        # ts=100 sits exactly at pts - window -> excluded; ts=200 included
        assert r["win_n"] == 1 and r["win_sum_value"] == 2.0

    def test_plans_as_equi_join(self, spark):
        from datalake_indexes_spark.operators.events import range_join_binned

        build = spark.createDataFrame(
            [(1, 100, 1.0)], "user_id long, ts_us long, value double"
        )
        probe = spark.createDataFrame(
            [(1, 1, 200)], "event_id long, user_id long, ts_us long"
        )
        plan = (
            range_join_binned(probe, build, "user_id", "ts_us", window=100)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the whole point: the range predicate must NOT degrade the join
        # to a nested loop
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


@pytest.mark.spark
class TestEventOpsRandomizedParity:
    """Brute-force cross-checks on pseudo-random event sets — the fixed
    fixtures pin semantics, these sweep the tie/boundary space."""

    def _random_events(self, seed: int, n: int = 120):
        import random

        rng = random.Random(seed)
        rows = []
        for i in range(n):
            rows.append(
                (
                    i,
                    rng.randint(1, 5),            # user
                    rng.randint(0, 40) * 25,      # coarse ts grid -> many ties
                    rng.choice(["click", "purchase"]),
                    float(rng.randint(1, 9)),
                )
            )
        return rows

    def test_asof_matches_bruteforce(self, spark):
        from datalake_indexes_spark.operators.events import asof_join

        for seed in (7, 23, 99):
            rows = self._random_events(seed)
            ev = spark.createDataFrame(
                rows,
                "event_id long, user_id long, ts_us long, event_type string, value double",
            )
            probe = ev.filter(F.col("event_type") == "click").select(
                "event_id", "user_id", "ts_us"
            )
            build = ev.filter(F.col("event_type") == "purchase").select(
                "event_id", "user_id", "ts_us", "value"
            )
            got = {
                r["event_id"]: r["asof_event_id"]
                for r in asof_join(
                    probe, build, "user_id", "ts_us", ["event_id"], "event_id"
                ).collect()
            }
            builds = [r for r in rows if r[3] == "purchase"]
            for eid, uid, ts, typ, _ in rows:
                if typ != "click":
                    continue
                cand = [b for b in builds if b[1] == uid and b[2] <= ts]
                want = (
                    max(cand, key=lambda b: (b[2], b[0]))[0] if cand else None
                )
                assert got[eid] == want, (seed, eid)

    def test_range_join_matches_bruteforce(self, spark):
        from datalake_indexes_spark.operators.events import range_join_binned

        window = 100
        for seed in (11, 42):
            rows = self._random_events(seed)
            ev = spark.createDataFrame(
                rows,
                "event_id long, user_id long, ts_us long, event_type string, value double",
            )
            probe = ev.filter(F.col("event_type") == "purchase").select(
                "event_id", "user_id", "ts_us"
            )
            build = ev.filter(F.col("event_type") == "click").select(
                "user_id", "ts_us", "value"
            )
            got = {
                r["event_id"]: (r["win_n"], r["win_sum_value"])
                for r in range_join_binned(
                    probe, build, "user_id", "ts_us", window,
                    agg_cols={"value": "sum"},
                ).collect()
            }
            clicks = [r for r in rows if r[3] == "click"]
            for eid, uid, ts, typ, _ in rows:
                if typ != "purchase":
                    continue
                hits = [
                    c for c in clicks
                    if c[1] == uid and ts - window < c[2] <= ts
                ]
                want_n = len(hits)
                want_sum = sum(c[4] for c in hits) if hits else None
                assert got[eid][0] == want_n, (seed, eid)
                assert got[eid][1] == want_sum, (seed, eid)


@pytest.mark.spark
class TestFunnel:
    def test_ordering_required(self, spark):
        from datalake_indexes_spark.operators.events import funnel

        rows = [
            # user 1: full ordered funnel
            (1, 1, 100, "view", 0.0), (2, 1, 200, "click", 0.0), (3, 1, 300, "purchase", 0.0),
            # user 2: purchase BEFORE click -> depth 2 only
            (4, 2, 100, "view", 0.0), (5, 2, 300, "click", 0.0), (6, 2, 200, "purchase", 0.0),
            # user 3: never viewed -> absent from the funnel
            (7, 3, 100, "click", 0.0),
            # user 4: view only
            (8, 4, 100, "view", 0.0),
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, ts_us long, event_type string, value double"
        )
        out = {r["user_id"]: r for r in funnel(ev, ["view", "click", "purchase"]).collect()}
        assert set(out) == {1, 2, 4}
        assert out[1]["depth"] == 3 and out[1]["step3_us"] == 300
        assert out[2]["depth"] == 2 and out[2]["step3_us"] == -1
        assert out[4]["depth"] == 1 and out[4]["step2_us"] == -1

    def test_same_ts_step_counts(self, spark):
        from datalake_indexes_spark.operators.events import funnel

        ev = spark.createDataFrame(
            [(1, 1, 100, "view", 0.0), (2, 1, 100, "click", 0.0)],
            "event_id long, user_id long, ts_us long, event_type string, value double",
        )
        r = funnel(ev, ["view", "click"]).collect()[0]
        assert r["depth"] == 2 and r["step2_us"] == 100  # >= is inclusive


@pytest.mark.spark
class TestVocabAndSplit:
    def test_vocab_counts(self, spark):
        from datalake_indexes_spark.operators.text_analysis import vocab_topk

        docs = spark.createDataFrame(
            [(1, "a a b"), (2, "a c")], "doc_id long, text string"
        )
        out = {r["word"]: r for r in vocab_topk(docs, k=10).collect()}
        assert out["a"]["total_count"] == 3 and out["a"]["doc_freq"] == 2
        assert out["a"]["rank"] == 1
        assert out["b"]["total_count"] == 1

    def test_split_is_total_and_deterministic(self, spark):
        from datalake_indexes_spark.operators.text_analysis import hash_split

        docs = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
        out1 = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
        out2 = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
        assert out1 == out2 and len(out1) == 500
        from collections import Counter

        c = Counter(out1.values())
        assert set(c) == {"train", "val", "test"}
        assert 0.7 < c["train"] / 500 < 0.9  # ~80%

    def test_split_rejects_bad_weights(self, spark):
        from datalake_indexes_spark.operators.text_analysis import hash_split

        docs = spark.createDataFrame([(1,)], "doc_id long")
        with pytest.raises(ValueError):
            hash_split(docs, {"train": 0.5, "test": 0.3})


@pytest.mark.spark
class TestEdgeCases:
    """Degenerate inputs the driver or a user can always produce."""

    def test_decontaminate_empty_benchmark(self, spark):
        from datalake_indexes_spark.operators.text_analysis import decontaminate

        docs = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
        bench = docs.filter(F.col("doc_id") < 0)
        out = decontaminate(docs, bench, n=5).collect()
        assert len(out) == 1 and out[0]["n_overlap"] == 0
        assert not out[0]["contaminated"]

    def test_bm25_terms_absent_from_corpus(self, spark):
        from datalake_indexes_spark.operators.search import bm25_topk

        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        assert bm25_topk(docs, ["zzz"], k=5).count() == 0

    def test_funnel_missing_step_type(self, spark):
        from datalake_indexes_spark.operators.events import funnel

        ev = spark.createDataFrame(
            [(1, 1, 100, "view", 0.0)],
            "event_id long, user_id long, ts_us long, event_type string, value double",
        )
        r = funnel(ev, ["view", "purchase"]).collect()[0]
        assert r["depth"] == 1 and r["step2_us"] == -1

    def test_semantic_dedup_fewer_vectors_than_centroids(self, spark):
        from datalake_indexes_spark.operators.similarity import semantic_dedup

        rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
        out = semantic_dedup(
            spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
            n_centroids=16,
            threshold=0.9,
        ).collect()
        assert len(out) == 2 and all(r["kept"] for r in out)

    def test_chunk_single_word_doc(self, spark):
        from datalake_indexes_spark.operators.text_analysis import chunk_documents

        docs = spark.createDataFrame([(1, "word")], "doc_id long, text string")
        out = chunk_documents(docs, chunk_tokens=8, overlap=2).collect()
        assert len(out) == 1 and out[0]["n_chunk_tokens"] == 1

    def test_range_join_empty_build(self, spark):
        from datalake_indexes_spark.operators.events import range_join_binned

        probe = spark.createDataFrame(
            [(1, 1, 100)], "event_id long, user_id long, ts_us long"
        )
        build = spark.createDataFrame(
            [], "user_id long, ts_us long, value double"
        )
        r = range_join_binned(
            probe, build, "user_id", "ts_us", 100, agg_cols={"value": "sum"}
        ).collect()
        assert len(r) == 1 and r[0]["win_n"] == 0

    def test_temperature_mix_single_stratum(self, spark):
        from datalake_indexes_spark.operators.text_analysis import temperature_mix

        docs = spark.createDataFrame(
            [(i, "en") for i in range(10)], "doc_id long, lang string"
        )
        assert temperature_mix(docs, alpha=1.0).count() == 10  # r == 1 everywhere


@pytest.mark.spark
class TestTfidfCosinePairs:
    def test_weighted_similarity_and_df_cap(self, spark):
        from datalake_indexes_spark.operators.search import tfidf_cosine_pairs

        docs = spark.createDataFrame(
            [
                # 1 & 2: identical rare content -> cosine 1.0
                (1, "zebra quagga okapi"),
                (2, "zebra quagga okapi"),
                # 3: shares only the ubiquitous word "the" with everyone
                (3, "the common filler"),
                (4, "the unrelated payload entirely"),
                (5, "the zebra alone here"),
            ],
            "doc_id long, text string",
        )
        out = {(r.doc_id_1, r.doc_id_2): r.cosine for r in
               tfidf_cosine_pairs(docs, threshold=0.3, max_df_frac=0.5).collect()}
        assert out[(1, 2)] == 1.0
        # "the" has df 3/5 > cap -> contributes nothing; 3-4 share nothing else
        assert (3, 4) not in out

    def test_symmetric_each_pair_once(self, spark):
        from datalake_indexes_spark.operators.search import tfidf_cosine_pairs

        docs = spark.createDataFrame(
            [(i, "alpha beta gamma") for i in range(4)]
            + [(8, "other words"), (9, "more filler")],
            "doc_id long, text string",
        )
        rows = tfidf_cosine_pairs(docs, threshold=0.9, max_df_frac=2.0).collect()
        assert len(rows) == 6  # C(4,2) among the clones, no (b,a) duplicates
        assert all(r.doc_id_1 < r.doc_id_2 < 4 for r in rows)

    def test_idf_zero_everywhere_is_empty_not_an_error(self, spark):
        """Identical corpus: every idf is 0, every norm 0 — defined as
        no pairs (no signal), never a divide-by-zero."""
        from datalake_indexes_spark.operators.search import tfidf_cosine_pairs

        docs = spark.createDataFrame(
            [(i, "alpha beta gamma") for i in range(4)], "doc_id long, text string"
        )
        assert tfidf_cosine_pairs(docs, threshold=0.1, max_df_frac=2.0).count() == 0


@pytest.mark.spark
class TestColumnOutliers:
    def test_fences_and_counts(self, spark):
        from datalake_indexes_spark.index.lake_index import LakeIndex
        from datalake_indexes_spark.operators.cocoa import column_outliers

        vals = [str(v) for v in list(range(1, 12)) + [100]]  # one wild point
        cells = [(1, 0, i, v) for i, v in enumerate(vals)]
        idx = LakeIndex(
            cells=spark.createDataFrame(
                cells, "table_id int, col_id int, row_id int, tokenized string"
            ),
            row_keys=None, column_headers=None, table_info=None,
        )
        row = column_outliers(idx).collect()[0]
        assert row.n_values == 12
        assert row.n_outliers == 1  # only the 100
        assert row.q1 < row.q3 <= row.hi_fence < 100


@pytest.mark.spark
class TestUnigramLogprob:
    def test_typical_beats_garbage(self, spark):
        from datalake_indexes_spark.operators.text_analysis import (
            unigram_logprob_scores,
        )

        docs = spark.createDataFrame(
            [(i, "the quick brown fox") for i in range(9)]
            + [(100, "zxqv jkwp mbbt hzzr")],  # singleton-word garbage
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in unigram_logprob_scores(docs).collect()}
        assert out[0].n_words == 4
        assert out[0].avg_logprob > out[100].avg_logprob
        import math

        # typical words appear 9 times in 40: mean ln(9/40) exactly
        assert abs(out[0].avg_logprob - round(math.log(9 / 40), 4)) < 1e-9
