"""Hot-shingle frequency cap in ngram_jaccard_pairs: candidate generation
skips boilerplate shingles, verification stays exact, and the (documented)
recall effect is precisely the boilerplate-only pairs."""

from __future__ import annotations

import pytest

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


@pytest.mark.spark
class TestMultiprobeLsh:
    def test_recall_dominates_single_table(self, spark):
        """OR-amplification: every single-signature pair survives (table
        0 IS the single signature's seed family differs — compare
        candidate recall against exact instead)."""
        import math

        from datalake_indexes_spark.operators.similarity import (
            cosine_pairs,
            cosine_pairs_multiprobe,
        )

        rows = []
        for i in range(80):
            arch = i % 8
            rows.append(
                (i, [math.sin(0.5 * (arch + 1) * (d + 1)) + 0.02 * math.cos(1.7 * i * (d + 2))
                     for d in range(16)])
            )
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
        exact = {(r.vec_id_1, r.vec_id_2) for r in
                 cosine_pairs(emb, threshold=0.9, exact=True).collect()}
        single = {(r.vec_id_1, r.vec_id_2) for r in
                  cosine_pairs(emb, threshold=0.9, n_planes=6, dim=16).collect()}
        multi = {(r.vec_id_1, r.vec_id_2) for r in
                 cosine_pairs_multiprobe(emb, threshold=0.9, n_tables=4,
                                         n_planes=6, dim=16).collect()}
        assert exact, "fixture must contain true near-dups"
        assert multi <= exact  # verification keeps it sound
        # OR over 4 tables recalls at least as much as one table
        assert len(multi) >= len(single)
        assert len(multi) / len(exact) > 0.8  # high recall on this fixture


@pytest.mark.spark
class TestContainment:
    def test_subset_pair_found_where_jaccard_misses(self, spark):
        """A snippet quoted verbatim inside a much longer document:
        containment(snippet -> doc) ≈ 1 while jaccard is far below any
        sane threshold — the pair the asymmetric detector exists for."""
        from datalake_indexes_spark.operators.dedup import ngram_containment_pairs

        snippet = "the quick brown fox jumps over the lazy dog tonight"
        filler = " ".join(f"filler word number {i}" for i in range(30))
        docs = spark.createDataFrame(
            [
                (1, snippet),
                (2, f"{filler} {snippet} closing remarks follow here now"),
                (3, "entirely unrelated content about spark joins and shuffles"),
            ],
            "doc_id long, text string",
        )
        out = {
            (r["doc_id_1"], r["doc_id_2"]): r
            for r in ngram_containment_pairs(docs, threshold=0.8).collect()
        }
        assert set(out) == {(1, 2)}
        r = out[(1, 2)]
        assert r["containment_1_in_2"] == 1.0  # snippet fully inside doc 2
        assert r["containment_2_in_1"] < 0.2
        assert r["jaccard"] < 0.2  # jaccard alone would never flag it

    def test_cap_prunes_candidates_not_values(self, spark):
        """With a cap that kills the only shared shingles, the pair
        disappears; with a permissive cap values equal the uncapped run."""
        from datalake_indexes_spark.operators.dedup import ngram_containment_pairs

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta"),
                (2, "alpha beta gamma delta epsilon zeta eta theta iota"),
                (3, "alpha beta gamma delta epsilon zeta eta theta iota"),
            ],
            "doc_id long, text string",
        )
        loose = {
            (r["doc_id_1"], r["doc_id_2"]): (
                r["containment_1_in_2"], r["containment_2_in_1"], r["jaccard"]
            )
            for r in ngram_containment_pairs(
                docs, threshold=0.8, max_shingle_freq=None
            ).collect()
        }
        capped = {
            (r["doc_id_1"], r["doc_id_2"]): (
                r["containment_1_in_2"], r["containment_2_in_1"], r["jaccard"]
            )
            for r in ngram_containment_pairs(
                docs, threshold=0.8, max_shingle_freq=100
            ).collect()
        }
        assert loose == capped  # permissive cap: identical exact values
        # every shingle here appears in >= 2 docs, so cap=1 kills all
        # candidate generation
        assert (
            ngram_containment_pairs(docs, threshold=0.8, max_shingle_freq=1).count()
            == 0
        )

    def test_subset_dedup_chain_keeps_maximal(self, spark):
        """A ⊂ B ⊂ C resolves in one pass: only the maximal C survives;
        unrelated docs keep themselves."""
        from datalake_indexes_spark.operators.dedup import subset_dedup

        base = "alpha beta gamma delta epsilon zeta eta theta"
        mid = base + " iota kappa lambda mu nu xi omicron pi"
        top = mid + " rho sigma tau upsilon phi chi psi omega"
        docs = spark.createDataFrame(
            [(1, base), (2, mid), (3, top),
             (9, "totally different text about query planning today")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in subset_dedup(docs, threshold=0.8).collect()}
        assert not out[1]["kept"] and out[1]["container_id"] in (2, 3)
        assert not out[2]["kept"] and out[2]["container_id"] == 3
        assert out[3]["kept"] and out[3]["container_id"] is None
        assert out[9]["kept"]

    def test_subset_dedup_equal_size_tiebreak(self, spark):
        """Mutual near-duplicates of equal size: the smaller id wins."""
        from datalake_indexes_spark.operators.dedup import subset_dedup

        t = "one two three four five six seven eight nine ten"
        docs = spark.createDataFrame(
            [(5, t), (7, t)], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in subset_dedup(docs, threshold=0.8).collect()}
        assert out[5]["kept"] and out[5]["container_id"] is None
        assert not out[7]["kept"] and out[7]["container_id"] == 5

    def test_subset_dedup_matches_bruteforce(self, spark):
        """Randomized (seeded) corpus vs an independent python
        brute-force of the same drop rule — catches join/aggregate
        slips the hand-built fixtures can't."""
        import random

        from datalake_indexes_spark.operators.dedup import subset_dedup

        rng = random.Random(42)
        vocab = [f"w{i}" for i in range(12)]
        docs = []
        for i in range(30):
            n_words = rng.randint(3, 12)
            words = [vocab[rng.randrange(len(vocab))] for _ in range(n_words)]
            docs.append((i, " ".join(words)))
        # plant real subset relations: doc 100 extends doc 0, 101 extends 100
        docs.append((100, docs[0][1] + " extra tail words here"))
        docs.append((101, docs[0][1] + " extra tail words here and more"))

        def shingles(t):
            w = t.split(" ")
            return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

        sets = {i: shingles(t) for i, t in docs}
        thr = 0.8

        def dropped_by(x):
            cands = [
                y for y in sets
                if y != x and sets[x] and
                len(sets[x] & sets[y]) / len(sets[x]) >= thr and
                (len(sets[y]) > len(sets[x]) or
                 (len(sets[y]) == len(sets[x]) and y < x))
            ]
            return min(cands) if cands else None

        expected = {i: dropped_by(i) for i, _ in docs}
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = {r["doc_id"]: r["container_id"]
               for r in subset_dedup(df, threshold=thr,
                                     max_shingle_freq=None).collect()}
        assert out == expected
        assert expected[0] is not None  # planted relation really fired


def test_subset_dedup_bulk_with_hot_boilerplate(spark):
    """5k docs all sharing a boilerplate prefix: the uncapped candidate
    join would be ~25M shingle pairs through the hot shingles; with the
    cap, candidates come only from the rare per-doc tails, wall-clock
    stays sane, and the planted snippet→article subset pairs are still
    resolved correctly."""
    import time

    from datalake_indexes_spark.operators.dedup import subset_dedup

    boiler = "terms of service apply to every page on this site"
    rows = []
    for i in range(5000):
        rows.append((i, f"{boiler} unique article body {i} about topic t{i} "
                        f"with filler f{i} and tail x{i}"))
    # planted: 50 snippet/article pairs — the snippet is the article's
    # unique tail quoted alone (plus the boilerplate all docs share)
    for j in range(50):
        rows.append((10_000 + j,
                     f"unique article body {j} about topic t{j}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    t0 = time.time()
    out = {r["doc_id"]: r for r in
           subset_dedup(docs, threshold=0.8, max_shingle_freq=100).collect()}
    secs = time.time() - t0
    dropped = [d for d, r in out.items() if not r["kept"]]
    assert len(out) == 5050
    # every planted snippet is contained in its article and dropped
    assert set(dropped) == {10_000 + j for j in range(50)}
    assert all(out[10_000 + j]["container_id"] == j for j in range(50))
    assert secs < 90, f"bulk subset dedup took {secs:.1f}s"


class TestRepeatedSpans:
    def test_planted_exact_span(self, spark):
        """A verbatim 12-word span shared at different offsets is found
        with exact starts and length; a 4-word overlap is below
        min_words and ignored."""
        from datalake_indexes_spark.operators.dedup import repeated_spans

        span = "one two three four five six seven eight nine ten eleven twelve"
        docs = spark.createDataFrame(
            [
                (1, "intro words here " + span + " tail a b"),
                (2, span + " totally different ending of course"),
                (3, "short shared bit one two three four unrelated rest"),
            ],
            "doc_id long, text string",
        )
        out = repeated_spans(docs, k=3, min_words=10).collect()
        spans = {(r["doc_id_1"], r["doc_id_2"]): r for r in out}
        assert set(spans) == {(1, 2)}
        r = spans[(1, 2)]
        assert r["start_1"] == 3 and r["start_2"] == 0 and r["n_words"] == 12

    def test_gram_cap_suppresses_boilerplate(self, spark):
        """A span made of a gram present in MORE docs than the cap
        generates no candidates (documented recall bound)."""
        from datalake_indexes_spark.operators.dedup import repeated_spans

        boiler = "all rights reserved by the site owner today ok fine"
        docs = spark.createDataFrame(
            [(i, f"doc {i} prefix " + boiler) for i in range(6)],
            "doc_id long, text string",
        )
        hi = repeated_spans(docs, k=3, min_words=5, max_gram_freq=100)
        lo = repeated_spans(docs, k=3, min_words=5, max_gram_freq=3)
        assert hi.count() > 0 and lo.count() == 0

    def test_two_separate_spans_two_rows(self, spark):
        from datalake_indexes_spark.operators.dedup import repeated_spans

        s1 = "alpha beta gamma delta epsilon zeta"
        s2 = "red orange yellow green blue violet"
        docs = spark.createDataFrame(
            [
                (1, s1 + " filler filler " + s2),
                (2, s2 + " unrelated middle words " + s1),
            ],
            "doc_id long, text string",
        )
        out = repeated_spans(docs, k=3, min_words=6).collect()
        assert len(out) == 2
        assert sorted(r["n_words"] for r in out) == [6, 6]

    def test_removal_keeps_canonical_copy(self, spark):
        """doc 1 (smallest id of the clique) keeps the span; 2 and 3
        lose it; overlapping spans need no merge."""
        from datalake_indexes_spark.operators.dedup import (
            remove_repeated_spans,
            repeated_spans,
        )

        span = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
        docs = spark.createDataFrame(
            [
                (1, span + " unique one tail"),
                (2, "head " + span),
                (3, span),
            ],
            "doc_id long, text string",
        )
        spans = repeated_spans(docs, k=3, min_words=10)
        out = {r["doc_id"]: r for r in
               remove_repeated_spans(docs, spans).collect()}
        assert out[1]["n_words_removed"] == 0
        assert out[2]["n_words_removed"] == 10
        assert out[2]["text_cleaned"] == "head"
        assert out[3]["n_words_removed"] == 10
        assert out[3]["text_cleaned"] == ""


class TestCrossSpans:
    Q = (
        "what is the capital of france and why does it matter to trade"
    )  # 13 words

    def _fixture(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "intro text here " + self.Q + " trailing words x y"),
                (2, "clean document with entirely original content here"),
                (3, self.Q),  # doc IS the benchmark question
            ],
            "doc_id long, text string",
        )
        ref = spark.createDataFrame(
            [(0, "hdr1 hdr2 " + self.Q), (1, "another benchmark question")],
            "ref_id long, text string",
        )
        return docs, ref

    def test_planted_contamination_found_with_offsets(self, spark):
        from datalake_indexes_spark.operators.dedup import cross_repeated_spans

        docs, ref = self._fixture(spark)
        out = cross_repeated_spans(docs, ref, k=5, min_words=10).collect()
        got = {(r["doc_id"], r["ref_id"]): r for r in out}
        assert set(got) == {(1, 0), (3, 0)}
        assert got[(1, 0)]["start_doc"] == 3
        assert got[(1, 0)]["start_ref"] == 2  # behind the 2-word header
        assert got[(1, 0)]["n_words"] == 13
        assert got[(3, 0)]["start_doc"] == 0

    def test_reference_side_broadcasts_no_global_windows(self, spark):
        """The contract that makes this the 100-TB contamination path:
        reference grams broadcast (the corpus never shuffles for the
        join) and the run-merge windows stay partitioned."""
        from datalake_indexes_spark.operators.dedup import cross_repeated_spans
        from datalake_indexes_spark.plans.audit import plan_report

        docs, ref = self._fixture(spark)
        rep = plan_report(cross_repeated_spans(docs, ref, k=5, min_words=10))
        assert rep["n_broadcast_joins"] >= 1, rep
        assert rep["n_global_windows"] == 0, rep
        assert rep["n_nested_loop_joins"] == 0, rep

    def test_decontaminate_cuts_every_copy(self, spark):
        """No canonical survival across corpus docs: reference text is
        always cut, clean docs pass through untouched."""
        from datalake_indexes_spark.operators.dedup import decontaminate_spans

        docs, ref = self._fixture(spark)
        out = {
            r["doc_id"]: r
            for r in decontaminate_spans(docs, ref, k=5, min_words=10).collect()
        }
        assert out[1]["n_words_removed"] == 13
        assert self.Q not in out[1]["text_cleaned"]
        assert out[1]["text_cleaned"] == "intro text here trailing words x y"
        assert out[2]["n_words_removed"] == 0
        assert out[3]["n_words_removed"] == 13 and out[3]["text_cleaned"] == ""

    def test_ref_gram_cap_bounds_stop_phrase_blowup(self, spark):
        """A gram repeated in the reference more often than the cap is
        dropped from candidate generation (documented recall bound)."""
        from datalake_indexes_spark.operators.dedup import cross_repeated_spans

        phrase = "the quick brown fox jumps over the lazy dog again today ok"
        docs = spark.createDataFrame(
            [(1, "x " + phrase)], "doc_id long, text string"
        )
        # reference repeats the phrase 4 times -> every gram occurs 4x
        ref = spark.createDataFrame(
            [(0, " ".join([phrase] * 4))], "ref_id long, text string"
        )
        hit = cross_repeated_spans(docs, ref, k=5, min_words=10,
                                   max_ref_gram_freq=10).count()
        assert hit > 0
        none = cross_repeated_spans(docs, ref, k=5, min_words=10,
                                    max_ref_gram_freq=3).count()
        assert none == 0


class TestSelfSpans:
    def test_planted_self_repetition(self, spark):
        from datalake_indexes_spark.operators.dedup import (
            remove_self_repetitions,
            self_repeated_spans,
        )

        s = "the board meets every other thursday at nine in the main hall"
        docs = spark.createDataFrame(
            [
                (1, "intro " + s + " mid words " + s + " outro"),
                (2, "no internal repetition in this document at all ok fine"),
            ],
            "doc_id long, text string",
        )
        spans = {r["doc_id"]: r for r in
                 self_repeated_spans(docs, k=5, min_words=10).collect()}
        assert set(spans) == {1}
        assert spans[1]["start_1"] == 1
        assert spans[1]["start_2"] == 15  # after 'intro' + 12 + 'mid words'
        assert spans[1]["n_words"] == 12

        out = {r["doc_id"]: r for r in
               remove_self_repetitions(docs, k=5, min_words=10).collect()}
        assert out[1]["n_words_removed"] == 12
        assert out[1]["text_cleaned"] == "intro " + s + " mid words outro"
        assert out[2]["n_words_removed"] == 0

    def test_periodic_text_keeps_one_period(self, spark):
        """Chained/overlapping repeats collapse to the first occurrence
        — the union-of-intervals cut needs no interval merge."""
        from datalake_indexes_spark.operators.dedup import (
            remove_self_repetitions,
        )

        docs = spark.createDataFrame(
            [(1, " ".join(["x y z"] * 5))], "doc_id long, text string"
        )
        out = remove_self_repetitions(docs, k=2, min_words=3).collect()[0]
        assert out["text_cleaned"] == "x y z"
        assert out["n_words_removed"] == 12

    def test_gram_occurrence_cap_bounds_degenerate_docs(self, spark):
        """A doc repeating ONE gram beyond the cap generates no pairs
        (the quadratic guard; documented recall bound)."""
        from datalake_indexes_spark.operators.dedup import self_repeated_spans

        docs = spark.createDataFrame(
            [(1, " ".join(["a"] * 40))], "doc_id long, text string"
        )
        # every 2-gram is 'a a' occurring 39 times > cap 10 -> dropped
        assert self_repeated_spans(
            docs, k=2, min_words=3, max_gram_occ=10
        ).count() == 0

    def test_plan_shape(self, spark):
        from datalake_indexes_spark.operators.dedup import self_repeated_spans
        from datalake_indexes_spark.plans.audit import plan_report

        docs = spark.createDataFrame(
            [(1, "a b c d e f g h i j")], "doc_id long, text string"
        )
        rep = plan_report(self_repeated_spans(docs))
        assert rep["n_global_windows"] == 0, rep
        assert rep["n_nested_loop_joins"] == 0, rep


def test_mid_span_capped_gram_splits_the_run(spark):
    """The documented recall bound, pinned: a capped gram in the MIDDLE
    of a shared span splits it into two sub-runs, each needing
    min_words on its own — with min_words spanning the halves the pair
    is missed entirely; with a smaller min_words both halves emerge."""
    from datalake_indexes_spark.operators.dedup import repeated_spans

    half1 = "alpha beta gamma delta epsilon"          # 5 words
    boiler = "x1 x2 x3"                                # capped middle
    half2 = "zeta eta theta iota kappa"                # 5 words
    span = f"{half1} {boiler} {half2}"                 # 13 words
    # the boilerplate TRIGRAM core appears in many other docs so every
    # k=3 gram fully inside it exceeds the df cap
    docs = spark.createDataFrame(
        [(1, "one " + span), (2, span + " two")]
        + [(10 + i, f"filler{i} {boiler} tail{i}") for i in range(8)],
        "doc_id long, text string",
    )
    missed = repeated_spans(docs, k=3, min_words=12, max_gram_freq=5)
    assert missed.filter("doc_id_1 = 1 and doc_id_2 = 2").count() == 0
    halves = repeated_spans(docs, k=3, min_words=5, max_gram_freq=5)
    assert halves.filter("doc_id_1 = 1 and doc_id_2 = 2").count() >= 2
