"""Product quantization (operators/similarity.py pq_*): codebook shape,
encode determinism/range, Lloyd refinement's monotone quantization-error
contract, and ADC estimate sanity.  The DuckDB oracle key `ann_pq_topk`
covers the cross-engine end-to-end result."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_indexes_spark.operators.similarity import (
    pq_codebooks,
    pq_encode,
    pq_topk,
    with_unit_vec,
)

M, KSUB = 4, 8


@pytest.fixture(scope="module")
def emb(spark):
    import math

    rows = []
    for i in range(120):
        # deterministic pseudo-random 16-dim vectors with mild cluster
        # structure (4 archetypes + per-dim wobble)
        arch = i % 4
        # arch+1: archetype 0 must carry real signal too (sin(0) would be
        # a noise-only vector that scatters across every centroid)
        vec = [
            math.sin(0.7 * (arch + 1) * (d + 1)) + 0.05 * math.cos(1.3 * i * (d + 2))
            for d in range(16)
        ]
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


def _sub_mse(emb, books, m=M):
    codes = pq_encode(emb, books, m=m)
    u = with_unit_vec(emb).select("vec_id", F.col("__unit").alias("__v"))
    sub = F.floor(F.size("__v") / m).cast("int")
    sv = u.select(
        "vec_id",
        F.posexplode(
            F.array(*[F.slice("__v", sub * j + 1, sub) for j in range(m)])
        ).alias("j", "__sv"),
    )
    err = (
        sv.join(codes, ["vec_id", "j"])
        .join(books, ["j", "code"])
        .select(
            F.aggregate(
                F.zip_with("__sv", "centroid", lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("e")
        )
    )
    return err.agg(F.avg("e")).first()[0]


def test_codebook_shape_and_determinism(spark, emb):
    books = pq_codebooks(emb, m=M, ksub=KSUB)
    rows = books.collect()
    assert len(rows) == M * KSUB
    assert {r.j for r in rows} == set(range(M))
    assert {r.code for r in rows} == set(range(KSUB))
    assert all(len(r.centroid) == 16 // M for r in rows)
    again = pq_codebooks(emb, m=M, ksub=KSUB).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))


def test_encode_full_coverage_and_range(spark, emb):
    books = pq_codebooks(emb, m=M, ksub=KSUB)
    codes = pq_encode(emb, books, m=M)
    assert codes.count() == 120 * M  # every (vector, subspace) coded
    bad = codes.filter((F.col("code") < 0) | (F.col("code") >= KSUB)).count()
    assert bad == 0


def test_refinement_monotonically_cuts_quantization_error(spark, emb):
    mses = [
        _sub_mse(emb, pq_codebooks(emb, m=M, ksub=KSUB, refine_iters=it))
        for it in (0, 1, 3)
    ]
    # Lloyd: each (assign, re-mean) step can only lower the objective
    assert mses[1] <= mses[0] + 1e-12
    assert mses[2] <= mses[1] + 1e-12
    assert mses[2] < mses[0]  # and it actually moves on clustered data


def test_adc_topk_shape_and_self_exclusion(spark, emb):
    q = emb.filter(F.col("vec_id") < 5)
    out = pq_topk(emb, q, k=3, m=M, ksub=KSUB, refine_iters=1).collect()
    assert len(out) == 15
    assert all(r.neighbor_id != r.query_id for r in out)
    for qid in range(5):
        ranks = sorted(r.rank for r in out if r.query_id == qid)
        assert ranks == [1, 2, 3]


def test_adc_estimate_tracks_true_cosine(spark, emb):
    """On clustered data the refined PQ estimate must put same-archetype
    vectors (true cosine ~1) ahead of other archetypes."""
    q = emb.filter(F.col("vec_id") < 4)  # one query per archetype
    out = pq_topk(emb, q, k=5, m=M, ksub=KSUB, refine_iters=2).collect()
    hits = sum(
        1
        for r in out
        if r.neighbor_id % 4 == r.query_id % 4  # same archetype
    )
    assert hits / len(out) > 0.9


@pytest.mark.spark
class TestIvfPq:
    def test_shape_and_self_exclusion(self, spark, emb):
        from datalake_indexes_spark.operators.similarity import ivf_pq_topk

        q = emb.filter(F.col("vec_id") < 4)
        out = ivf_pq_topk(
            emb, q, k=3, n_centroids=8, n_probe=3, m=M, ksub=KSUB
        ).collect()
        assert all(r.neighbor_id != r.query_id for r in out)
        for qid in range(4):
            ranks = sorted(r.rank for r in out if r.query_id == qid)
            assert ranks == list(range(1, len(ranks) + 1))

    def test_same_archetype_dominates(self, spark, emb):
        """On clustered data IVF-PQ must surface same-archetype vectors —
        centroid dot product carries most of the signal, residual codes
        refine within the cell."""
        from datalake_indexes_spark.operators.similarity import ivf_pq_topk

        q = emb.filter(F.col("vec_id") < 4)
        out = ivf_pq_topk(
            emb, q, k=5, n_centroids=8, n_probe=4, m=M, ksub=KSUB
        ).collect()
        hits = sum(1 for r in out if r.neighbor_id % 4 == r.query_id % 4)
        assert hits / len(out) > 0.9

    def test_more_probes_never_lose_candidates(self, spark, emb):
        """Probing more cells can only widen the candidate set: every
        neighbor surfaced at n_probe=1 whose estimate survives the top-k
        cut is still reachable at n_probe=4."""
        from datalake_indexes_spark.operators.similarity import ivf_pq_topk

        q = emb.filter(F.col("vec_id") < 2)
        narrow = ivf_pq_topk(emb, q, k=50, n_centroids=8, n_probe=1, m=M, ksub=KSUB)
        wide = ivf_pq_topk(emb, q, k=50, n_centroids=8, n_probe=4, m=M, ksub=KSUB)
        n_set = {(r.query_id, r.neighbor_id) for r in narrow.collect()}
        w_set = {(r.query_id, r.neighbor_id) for r in wide.collect()}
        assert n_set <= w_set
        assert len(w_set) > len(n_set)


def test_ivf_pq_refined_recall_dominates_and_exact_values(spark):
    """The refine step (a) never lowers recall vs plain IVF-PQ at the
    same (n_probe, m, ksub) — candidates are a superset of the plain
    top-k and exact rescoring can only repair mis-orderings — and (b)
    reports EXACT cosine values (brute-force-verified per pair)."""
    import math

    from pyspark.sql import functions as F

    from datalake_indexes_spark.operators.similarity import (
        ann_recall_report,
        ivf_pq_refined_topk,
        ivf_pq_topk,
    )

    rows = [
        (i, [math.sin(0.37 * (i % 8 + 1) * (d + 1)) + 0.013 * i for d in range(8)])
        for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    q = emb.filter(F.col("vec_id") < 5)
    kw = dict(n_centroids=6, n_probe=2, m=2, ksub=8)
    plain = lambda c, qq, k, vec_col, id_col: ivf_pq_topk(
        c, qq, k=k, vec_col=vec_col, id_col=id_col, **kw
    )
    refined = lambda c, qq, k, vec_col, id_col: ivf_pq_refined_topk(
        c, qq, k=k, c_factor=4, vec_col=vec_col, id_col=id_col, **kw
    )
    r_plain = ann_recall_report(emb, q, k=3, search_fn=plain).collect()[0]
    r_ref = ann_recall_report(emb, q, k=3, search_fn=refined).collect()[0]
    assert r_ref["recall"] >= r_plain["recall"]

    out = ivf_pq_refined_topk(emb, q, k=3, c_factor=4, **kw).collect()
    vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    for r in out:
        want = round(cos(vecs[r["query_id"]], vecs[r["neighbor_id"]]), 4)
        assert abs(r["cosine"] - want) < 2e-4, r
    # per-query output is exactly k, ranked contiguously
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3] for v in per_q.values())


def test_adc_topk_partition_invariant(spark, emb):
    """The ADC estimate sums m LUT entries across rows; the sum is folded
    in j-order (similarity._ordered_sum), so ranks — including ties
    between neighbors with identical code words — must not depend on how
    the corpus/query input happens to be partitioned."""
    q = emb.filter(F.col("vec_id") < 5)
    base = sorted(
        tuple(r) for r in pq_topk(emb, q, k=3, m=M, ksub=KSUB).collect()
    )
    for n_parts in (1, 7):
        shuffled = emb.repartition(n_parts)
        got = sorted(
            tuple(r)
            for r in pq_topk(
                shuffled, shuffled.filter(F.col("vec_id") < 5), k=3, m=M, ksub=KSUB
            ).collect()
        )
        assert got == base
