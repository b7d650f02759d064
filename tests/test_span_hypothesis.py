"""Property tests: exact-span detection vs an INDEPENDENT pure-Python
reference built on maximal common extensions (not diagonal gram runs —
a different formulation of the same semantics, so a shared bug can't
hide), over randomized tiny-vocabulary corpora with heavy overlap
pressure."""

from __future__ import annotations

from datalake_indexes_spark.operators.dedup import (
    cross_repeated_spans,
    repeated_spans,
)


def _ref_spans(words_by_doc, k, min_words):
    """All (d1, d2, start_1, start_2, n_words) maximal common word runs
    of length >= min_words between every doc pair (d1 < d2), via direct
    left-maximal extension: a span starts at (i, j) iff words match
    there and either i == 0, j == 0, or the previous words differ."""
    out = set()
    ids = sorted(words_by_doc)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            d1, d2 = ids[ai], ids[bi]
            w1, w2 = words_by_doc[d1], words_by_doc[d2]
            for i in range(len(w1)):
                for j in range(len(w2)):
                    if w1[i] != w2[j]:
                        continue
                    if i > 0 and j > 0 and w1[i - 1] == w2[j - 1]:
                        continue  # not left-maximal
                    n = 0
                    while i + n < len(w1) and j + n < len(w2) and w1[i + n] == w2[j + n]:
                        n += 1
                    if n >= min_words:
                        out.add((d1, d2, i, j, n))
    return out


def _docs_strategy(st):
    # 2-symbol vocabulary, docs up to 10 words: long accidental overlaps
    # everywhere, so run merging / left-maximality is exercised hard
    word = st.sampled_from(["a", "b"])
    return st.lists(
        st.lists(word, min_size=1, max_size=10), min_size=2, max_size=4
    )


def test_repeated_spans_match_extension_reference(spark):
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=10, deadline=None)
    @given(docs=_docs_strategy(st))
    def check(docs):
        words_by_doc = {i: ws for i, ws in enumerate(docs)}
        df = spark.createDataFrame(
            [(i, " ".join(ws)) for i, ws in words_by_doc.items()],
            "doc_id long, text string",
        )
        # min_words >= k: every qualifying common run is fully covered
        # by matching k-grams, so the two formulations must agree
        got = {
            (r["doc_id_1"], r["doc_id_2"], r["start_1"], r["start_2"], r["n_words"])
            for r in repeated_spans(
                df, k=2, min_words=3, max_gram_freq=10**9
            ).collect()
        }
        assert got == _ref_spans(words_by_doc, k=2, min_words=3)

    check()


def test_cross_spans_match_extension_reference(spark):
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=10, deadline=None)
    @given(docs=_docs_strategy(st), refs=_docs_strategy(st))
    def check(docs, refs):
        docs_by_id = {i: ws for i, ws in enumerate(docs)}
        refs_by_id = {i: ws for i, ws in enumerate(refs)}
        ddf = spark.createDataFrame(
            [(i, " ".join(ws)) for i, ws in docs_by_id.items()],
            "doc_id long, text string",
        )
        rdf = spark.createDataFrame(
            [(i, " ".join(ws)) for i, ws in refs_by_id.items()],
            "ref_id long, text string",
        )
        got = {
            (r["doc_id"], r["ref_id"], r["start_doc"], r["start_ref"], r["n_words"])
            for r in cross_repeated_spans(
                ddf, rdf, k=2, min_words=3, max_ref_gram_freq=10**9
            ).collect()
        }
        # the cross reference is the pairwise extension over (doc, ref)
        want = set()
        for did, w1 in docs_by_id.items():
            for rid, w2 in refs_by_id.items():
                for i in range(len(w1)):
                    for j in range(len(w2)):
                        if w1[i] != w2[j]:
                            continue
                        if i > 0 and j > 0 and w1[i - 1] == w2[j - 1]:
                            continue
                        n = 0
                        while (
                            i + n < len(w1)
                            and j + n < len(w2)
                            and w1[i + n] == w2[j + n]
                        ):
                            n += 1
                        if n >= 3:
                            want.add((did, rid, i, j, n))
        assert got == want

    check()


def test_self_spans_match_extension_reference(spark):
    from hypothesis import given, settings, strategies as st

    from datalake_indexes_spark.operators.dedup import self_repeated_spans

    @settings(max_examples=10, deadline=None)
    @given(docs=_docs_strategy(st))
    def check(docs):
        words_by_doc = {i: ws for i, ws in enumerate(docs)}
        df = spark.createDataFrame(
            [(i, " ".join(ws)) for i, ws in words_by_doc.items()],
            "doc_id long, text string",
        )
        got = {
            (r["doc_id"], r["start_1"], r["start_2"], r["n_words"])
            for r in self_repeated_spans(
                df, k=2, min_words=3, max_gram_occ=10**9
            ).collect()
        }
        # within-doc pairwise extension, i < j, left-maximal
        want = set()
        for did, w in words_by_doc.items():
            for i in range(len(w)):
                for j in range(i + 1, len(w)):
                    if w[i] != w[j]:
                        continue
                    if i > 0 and w[i - 1] == w[j - 1]:
                        continue  # not left-maximal
                    n = 0
                    while j + n < len(w) and w[i + n] == w[j + n]:
                        n += 1
                    if n >= 3:
                        want.add((did, i, j, n))
        assert got == want

    check()
