"""Prefix-filtered exact Jaccard join, the threshold sweep, and the
Bloom-prefiltered incremental dedup family.

The load-bearing claims under test:
- prefix filtering is COMPLETE (output identical to the full
  inverted-index join) while generating strictly fewer candidates on a
  boilerplate-skewed corpus — the case where the frequency cap
  documents a recall loss, the prefix filter must not;
- the Bloom prefilter is exactness-TRANSPARENT: any (k_hashes, hex_len)
  knob setting — including a saturated 16-position filter where every
  probe collides — yields byte-identical output to the plain anti-join
  truth, because positives are verified and negatives are sound;
- the report's identities hold and its false-positive count is the
  candidate/verified gap.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from datalake_indexes_spark.operators.dedup import (
    incremental_dedup_report,
    incremental_new_docs,
    ngram_jaccard_pairs,
    pair_threshold_sweep,
    prefix_candidates,
    prefix_jaccard_pairs,
    word_shingles,
)
from datalake_indexes_spark.plans.audit import plan_report


def _pairs(df):
    return {(r["doc_id_1"], r["doc_id_2"]): r["jaccard"] for r in df.collect()}


def _boiler_fixture(spark):
    boiler = "common header text"
    rows = [
        (i, f"{boiler} unique filler number {i} for document {i}")
        for i in range(40)
    ]
    rows.append((100, f"{boiler} the quick brown fox jumps over dogs"))
    rows.append((101, f"{boiler} the quick brown fox jumps over dogs"))
    # a pair whose ONLY shared content is the boilerplate itself — the
    # frequency cap misses this one by design; the prefix filter must not
    rows.append((200, boiler))
    rows.append((201, boiler))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prefix_join_complete_on_skewed_fixture(spark):
    docs = _boiler_fixture(spark)
    exact = _pairs(ngram_jaccard_pairs(docs, n=3, threshold=0.7))
    pref = _pairs(prefix_jaccard_pairs(docs, n=3, threshold=0.7))
    assert pref == exact
    assert (100, 101) in pref and (200, 201) in pref


def test_prefix_join_candidate_reduction(spark):
    docs = _boiler_fixture(spark)
    sh = word_shingles(docs, n=3)
    n_pref = prefix_candidates(sh, 0.7).count()
    s1, s2 = sh.alias("s1"), sh.alias("s2")
    n_full = (
        s1.join(
            s2,
            (F.col("s1.shingle") == F.col("s2.shingle"))
            & (F.col("s1.doc_id") < F.col("s2.doc_id")),
        )
        .select("s1.doc_id", "s2.doc_id")
        .distinct()
        .count()
    )
    # every doc shares the boilerplate shingle → the full join pairs all
    # 44 docs (C(44,2)=946); prefixes exclude the hot shingle except for
    # the two docs that have nothing else
    assert n_full > 900
    assert n_pref < 50


def test_prefix_join_random_parity(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(4):
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 14))))
            for i in range(24)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        for t in (0.5, 0.75, 0.9, 1.0):
            assert _pairs(prefix_jaccard_pairs(docs, threshold=t)) == _pairs(
                ngram_jaccard_pairs(docs, threshold=t)
            ), f"trial={trial} t={t}"


def test_prefix_join_plan_shape(spark):
    docs = _boiler_fixture(spark)
    rep = plan_report(prefix_jaccard_pairs(docs, threshold=0.8))
    assert rep["n_nested_loop_joins"] == 0
    assert rep["n_global_windows"] == 0


def test_threshold_sweep_monotone_and_consistent(spark):
    docs = _boiler_fixture(spark)
    rows = {
        r["threshold"]: (r["n_pairs"], r["n_docs"])
        for r in pair_threshold_sweep(docs, thresholds=(0.5, 0.7, 0.9)).collect()
    }
    assert set(rows) == {0.5, 0.7, 0.9}
    ts = sorted(rows)
    for a, b in zip(ts, ts[1:]):
        assert rows[a][0] >= rows[b][0]
        assert rows[a][1] >= rows[b][1]
    # census at each t matches an independent pair run filtered there
    pairs = _pairs(prefix_jaccard_pairs(docs, threshold=0.5))
    for t in ts:
        sel = {p for p, j in pairs.items() if j >= t}
        assert rows[t][0] == len(sel)
        assert rows[t][1] == len({d for p in sel for d in p})


def _incr_fixture(spark):
    hist_rows = [(i, f"history document number {i} body") for i in range(30)]
    inc_rows = (
        # 10 genuinely new
        [(100 + i, f"fresh increment doc {i} content") for i in range(10)]
        # 5 re-crawled history docs (dup vs history)
        + [(200 + i, f"history document number {i} body") for i in range(5)]
        # one new doc repeated 3 times within the increment
        + [(300 + i, "repeated within increment body") for i in range(3)]
    )
    hist = spark.createDataFrame(hist_rows, "doc_id long, text string")
    inc = spark.createDataFrame(inc_rows, "doc_id long, text string")
    return hist, inc


def _truth(hist_rows, inc_rows):
    import hashlib

    hh = {hashlib.md5(t.encode()).hexdigest() for _, t in hist_rows}
    firsts: dict[str, list] = {}
    for i, t in sorted(inc_rows):
        h = hashlib.md5(t.encode()).hexdigest()
        if h in firsts:
            firsts[h][1] += 1
        else:
            firsts[h] = [i, 1]
    return {
        (v[0], h, v[1]) for h, v in firsts.items() if h not in hh
    }


def test_incremental_matches_anti_join_truth(spark):
    hist, inc = _incr_fixture(spark)
    truth = _truth(
        [(r["doc_id"], r["text"]) for r in hist.collect()],
        [(r["doc_id"], r["text"]) for r in inc.collect()],
    )
    got = {
        (r["doc_id"], r["content_hash"], r["n_copies"])
        for r in incremental_new_docs(hist, inc).collect()
    }
    assert got == truth
    assert len(got) == 11  # 10 fresh + 1 within-increment group


def test_incremental_bloom_knobs_are_transparent(spark):
    """hex_len=1 gives a 16-position filter that SATURATES (every probe
    collides → everything is a candidate → pure verification); hex_len=8
    makes false positives essentially impossible (pure Bloom).  Both
    must equal the default's output exactly."""
    hist, inc = _incr_fixture(spark)
    base = sorted(incremental_new_docs(hist, inc).collect())
    tiny = sorted(incremental_new_docs(hist, inc, hex_len=1).collect())
    wide = sorted(incremental_new_docs(hist, inc, hex_len=8, k_hashes=5).collect())
    assert tiny == base
    assert wide == base


def test_incremental_report_identities(spark):
    hist, inc = _incr_fixture(spark)
    r = incremental_dedup_report(hist, inc, hex_len=2).collect()[0]
    assert r["n_history"] == 30
    assert r["n_increment"] == 18
    assert r["n_increment_distinct"] == 16
    assert r["n_within_dups"] == 2
    assert r["n_history_dups"] == 5
    assert r["n_new"] == 11
    assert r["n_bf_new"] + r["n_bf_candidates"] == r["n_increment_distinct"]
    assert r["n_bf_false_positives"] == r["n_bf_candidates"] - r["n_history_dups"]
    assert 0 <= r["n_bf_false_positives"] <= r["n_new"]
    # the meter agrees with the operator it meters
    assert incremental_new_docs(hist, inc).count() == r["n_new"]


def test_incremental_saturated_filter_report(spark):
    """m=16 saturates: nothing is provably new, every distinct hash
    becomes a candidate, and fp = candidates - true dups = n_new."""
    hist, inc = _incr_fixture(spark)
    r = incremental_dedup_report(hist, inc, hex_len=1).collect()[0]
    assert r["n_bf_new"] == 0
    assert r["n_bf_candidates"] == r["n_increment_distinct"]
    assert r["n_bf_false_positives"] == r["n_new"]
    assert r["fp_rate"] == 1.0


def test_incremental_plan_history_broadcast_verify(spark):
    """History is reached only through broadcast joins (probe-set anti,
    verify semi) — the increment-side firsts x bf_new join may legally
    sort-merge (both sides are increment-keyed and co-partitioned on
    content_hash), but nothing nested-loops, and every join that touches
    the history relation builds on a broadcast of the SMALL side.  The
    history probe-set distinct is map-side partial-deduped (bounded by
    m = 16^hex_len rows per task before its exchange), so no exchange in
    this plan carries history-row volume."""
    hist, inc = _incr_fixture(spark)
    rep = plan_report(incremental_new_docs(hist, inc))
    assert rep["n_nested_loop_joins"] == 0
    assert rep["n_broadcast_joins"] >= 2  # probe-set anti + verify semi
    plan = (
        incremental_new_docs(hist, inc)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the history-verify semi must be a BroadcastHashJoin (candidates
    # broadcast, history streamed); the OTHER semi in this plan
    # (firsts ⋉ bf_new) is increment-keyed and may legally sort-merge
    semi_lines = [ln for ln in plan.splitlines() if "LeftSemi" in ln]
    assert any("BroadcastHashJoin" in ln for ln in semi_lines), semi_lines


def test_ab_join_matches_bruteforce(spark):
    """Cross-corpus prefix join vs a python brute force over shingle
    sets, on asymmetric corpora (short A docs vs longer B docs) — the
    regime where per-side prefix lengths differ and a shared token order
    is load-bearing."""
    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(10)]
    a_rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 8))))
        for i in range(12)
    ]
    b_rows = [
        (100 + i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 16))))
        for i in range(15)
    ]
    # plant one exact copy and one superset
    b_rows.append((200, a_rows[0][1]))
    b_rows.append((201, a_rows[1][1] + " extra tail words here"))
    da = spark.createDataFrame(a_rows, "doc_id long, text string")
    db = spark.createDataFrame(b_rows, "doc_id long, text string")

    def sh(text, n=3):
        w = text.split(" ")
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    for t in (0.5, 0.7, 0.9):
        want = set()
        for ai, at in a_rows:
            sa = sh(at)
            for bi, bt in b_rows:
                sb = sh(bt)
                if not sa and not sb:
                    continue
                u = len(sa | sb)
                if u and len(sa & sb) / u >= t:
                    want.add((ai, bi, round(len(sa & sb) / u, 4)))
        from datalake_indexes_spark.operators.dedup import prefix_jaccard_join_ab

        got = {
            (r["doc_id_a"], r["doc_id_b"], r["jaccard"])
            for r in prefix_jaccard_join_ab(da, db, threshold=t).collect()
        }
        assert got == want, f"t={t}"
    assert any(a == 0 and b == 200 for a, b, _ in got)  # the exact copy at 0.9


def test_cluster_safe_split_no_neardup_leakage(spark):
    """Every near-dup pair lands in ONE split (the guarantee), while a
    plain per-doc hash split leaks at least one planted family across
    splits (the problem being solved)."""
    from datalake_indexes_spark.operators.dedup import (
        cluster_safe_split,
        minhash_lsh_pairs,
    )
    from datalake_indexes_spark.operators.text_analysis import hash_split

    base = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "far away beyond the hills tonight"
    )
    rows = []
    for fam in range(12):  # 12 near-dup families of 4
        stem = base.replace("fox", f"fox{fam}")
        for j in range(4):
            rows.append((fam * 10 + j, stem + f" tail{j}"))
    for i in range(200, 230):  # singletons
        rows.append((i, f"unrelated document {i} about topic {i * 7} entirely"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    split_of = {
        r["doc_id"]: r["split"] for r in cluster_safe_split(docs).collect()
    }
    assert set(split_of) == {d for d, _ in rows}
    pairs = minhash_lsh_pairs(docs, threshold=0.7).collect()
    assert len(pairs) >= 12  # families actually pair up
    for p in pairs:
        assert split_of[p["doc_id_1"]] == split_of[p["doc_id_2"]], p

    naive = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    leaked = sum(
        1 for p in pairs if naive[p["doc_id_1"]] != naive[p["doc_id_2"]]
    )
    assert leaked > 0  # the per-doc split demonstrably leaks here


def test_new_key_plan_pins(spark):
    """Plan-shape pins for the remaining round-7 keys: the refined ANN
    re-rank and the cluster-safe split nested-loop only where sanctioned
    (IVF's broadcast centroid cross join), and the split's window is
    always partitioned."""
    import math

    from datalake_indexes_spark.operators.dedup import cluster_safe_split
    from datalake_indexes_spark.operators.similarity import ivf_pq_refined_topk

    rows = [
        (i, [math.sin(0.37 * (i % 8 + 1) * (d + 1)) + 0.013 * i for d in range(8)])
        for i in range(40)
    ]
    from datalake_indexes_spark.operators.similarity import ivf_pq_topk

    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(n_centroids=4, n_probe=2, m=2, ksub=8)
    q3 = emb.filter(F.col("vec_id") < 3)
    rep = plan_report(ivf_pq_refined_topk(emb, q3, k=3, c_factor=2, **kw))
    base = plan_report(ivf_pq_topk(emb, q3, k=6, **kw))
    # candidate fetch + query join ride broadcasts; the refine stage adds
    # NO global windows beyond the base IVF-PQ's sanctioned k-bounded
    # ones (codebook seeding over ksub rows) — its own re-rank window is
    # partitioned by query_id
    assert rep["n_broadcast_joins"] >= base["n_broadcast_joins"] + 2
    assert rep["n_global_windows"] == base["n_global_windows"]

    docs = _boiler_fixture(spark)
    rep2 = plan_report(cluster_safe_split(docs))
    assert rep2["n_nested_loop_joins"] == 0
    assert rep2["n_global_windows"] == 0


def test_proximity_topk_hand_check(spark):
    """Explicit MinCover cases: adjacency (span = |terms|), an
    out-of-order tight cover, a terms-missing doc excluded, and the
    single-term degenerate."""
    from datalake_indexes_spark.operators.search import proximity_topk

    rows = [
        (1, "x a b c y"),                 # a..c adjacent, span 3
        (2, "c x x a b x"),               # cover a b c = positions 0..4 -> 5? no: c@0,a@3,b@4 -> span 5; but also none tighter
        (3, "a x x x b x x c"),           # span 8
        (4, "a b x x x x c a b"),         # tight cover c@6,a@7,b@8 -> 3
        (5, "a b only two of them x"),    # missing c -> excluded
        (6, "c b a"),                     # reversed adjacency -> 3
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["min_span"], r["rank"]) for r in
           proximity_topk(docs, ["a", "b", "c"], k=10).collect()}
    assert 5 not in out
    assert out[1][0] == 3 and out[4][0] == 3 and out[6][0] == 3
    assert out[2][0] == 5
    assert out[3][0] == 8
    assert [d for d, (s, rk) in sorted(out.items(), key=lambda kv: kv[1][1])] == [1, 4, 6, 2, 3]

    single = {r["doc_id"]: r["min_span"] for r in
              proximity_topk(docs, ["c"], k=10).collect()}
    assert single == {1: 1, 2: 1, 3: 1, 4: 1, 6: 1}
