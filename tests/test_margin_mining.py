"""Margin-criterion pair mining — hand-built geometry (hub suppression,
mutual flag), and a replica test that recomputes the margin algebra in
numpy from the engine's own (already unit-pinned) cosine_topk frames."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from datalake_indexes_spark.operators.similarity import cosine_topk, margin_mining


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_distinct_pair_survives_hub_pairs_suppressed(spark):
    # src 0 has ONE standout target (cosine 1.0, margin 1.0/0.625 = 1.6).
    # src 2 = normalize(1,1,1,1) is a hub: cosine 0.5 with EVERY axis
    # target, so its own average never lifts a pair above the crowd —
    # hand-computed margins 0.8 (tgt 1) and 4/3 (tgts 3, 5).  At
    # threshold 1.4 only the standout pair survives.
    h = 0.5  # each component of the normalized hub
    src = _emb(spark, [(0, (1.0, 0.0, 0.0, 0.0)), (2, (h, h, h, h))])
    tgt = _emb(
        spark,
        [
            (1, (1.0, 0.0, 0.0, 0.0)),  # exact match for src 0
            (3, (0.0, 1.0, 0.0, 0.0)),
            (5, (0.0, 0.0, 1.0, 0.0)),
            (7, (0.0, 0.0, 0.0, 1.0)),
        ],
    )
    all_pairs = {
        (r["src_id"], r["tgt_id"]): r["margin"]
        for r in margin_mining(src, tgt, k=2, threshold=0.0).collect()
    }
    assert abs(all_pairs[(0, 1)] - 1.6) < 1e-6
    hub_margins = [m for (s, _t), m in all_pairs.items() if s == 2]
    assert hub_margins and all(m < 1.4 for m in hub_margins)
    survivors = {
        (r["src_id"], r["tgt_id"])
        for r in margin_mining(src, tgt, k=2, threshold=1.4).collect()
    }
    assert survivors == {(0, 1)}


def test_mutual_flag(spark):
    # (0, 1) is 0's best AND 0 is 1's best -> mutual.  (2, 1): 1 is 2's
    # top-k neighbor, but 2 is NOT in 1's top-1 (0 is closer) -> with
    # k=1 the reverse edge is absent.
    src = _emb(spark, [(0, (1.0, 0.0)), (2, (0.8, 0.6))])
    tgt = _emb(spark, [(1, (1.0, 0.0)), (3, (0.0, 1.0))])
    got = {
        (r["src_id"], r["tgt_id"]): r["mutual"]
        for r in margin_mining(src, tgt, k=1, threshold=0.0).collect()
    }
    assert got[(0, 1)] is True
    assert got[(2, 1)] is False


def test_margin_algebra_matches_numpy_replica(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 60
    )
    src = emb.filter(F.col("vec_id") % 2 == 0)
    tgt = emb.filter(F.col("vec_id") % 2 == 1)
    k, thr = 4, 1.05
    fwd = cosine_topk(tgt, src, k=k).collect()
    bwd = cosine_topk(src, tgt, k=k).collect()

    def avg(rows):
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], []).append((r["rank"], r["cosine"]))
        return {
            q: math.fsum(c for _r, c in sorted(v)) / len(v) for q, v in out.items()
        }

    sa, ta = avg(fwd), avg(bwd)
    rev = {(r["neighbor_id"], r["query_id"]) for r in bwd}
    expect = {}
    for r in fwd:
        m = r["cosine"] / ((sa[r["query_id"]] + ta[r["neighbor_id"]]) / 2.0)
        if m >= thr:
            expect[(r["query_id"], r["neighbor_id"])] = (
                round(m + 1e-9, 6),
                (r["query_id"], r["neighbor_id"]) in rev,
            )

    got = {
        (r["src_id"], r["tgt_id"]): (r["margin"], r["mutual"])
        for r in margin_mining(src, tgt, k=k, threshold=thr).collect()
    }
    assert set(got) == set(expect)
    for p, (m, mu) in expect.items():
        assert got[p][1] == mu
        assert abs(got[p][0] - m) < 1e-9
