"""Embedding ANN / ML-feature oracle twins.

Split from the former plans/oracle.py (round 9) — pure rearrangement,
every definition verbatim.  Import surface unchanged via the package
``__init__``.
"""

from __future__ import annotations
from datalake_indexes_spark.functions.text import NULLISH_TOKENS, tokenize_sql
from datalake_indexes_spark.sources.catalog import TESTDATA_LAKE_SPEC, LakeTableSpec

from datalake_indexes_spark.plans.oracle._dedup import dedup_embedding_cosine_sql

def ann_cosine_topk_sql(k: int = 5, n_queries: int = 10) -> str:
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
           FROM embeddings WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qe) AS c
  FROM embeddings e, q WHERE e.vec_id != q.query_id
)
SELECT query_id, neighbor_id, rank, round(c, 4) AS cosine
FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rank
      FROM scored)
WHERE rank <= {k}
"""


def ann_knn_classify_sql(k: int = 5, n_queries: int = 10) -> str:
    """Twin of :func:`..operators.similarity.knn_classify` (exact search):
    per-query modal neighbor label, ties toward the closest member then
    the smaller label."""
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
           FROM embeddings WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, e.label,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qe) AS c
  FROM embeddings e, q WHERE e.vec_id != q.query_id
),
nn AS (
  SELECT query_id, neighbor_id, label, round(c, 4) AS cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id)
           AS rank
  FROM scored
),
votes AS (
  SELECT query_id, label AS pred_label, count(*) AS votes,
         max(cosine) AS best_cosine
  FROM nn WHERE rank <= {k} GROUP BY 1, 2
)
SELECT query_id, pred_label, votes, best_cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY votes DESC, best_cosine DESC, pred_label) AS rn
  FROM votes
) WHERE rn = 1
"""


def ann_cluster_purity_sql(n_centroids: int = 16) -> str:
    """Twin of :func:`..operators.similarity.cluster_purity_report`:
    deterministic-seed centroid assignment (cosine, centroid-asc ties),
    closed-form entropy, same +1e-9 rounding nudge."""
    return f"""
WITH c AS (SELECT vec_id AS centroid, embedding::DOUBLE[] AS cv
           FROM embeddings WHERE vec_id < {n_centroids}),
a AS (
  SELECT e.vec_id, e.label,
         first(c.centroid ORDER BY
               list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC,
               c.centroid) AS centroid
  FROM embeddings e CROSS JOIN c
  GROUP BY e.vec_id, e.label
),
bl AS (SELECT centroid, label, count(*) AS n FROM a GROUP BY 1, 2)
SELECT centroid, CAST(sum(n) AS BIGINT) AS n_members,
       CAST(first(label ORDER BY n DESC, label) AS INT) AS top_label,
       round(max(n) * 1.0 / sum(n) + 1e-9, 4) AS purity,
       round(log2(sum(n)) - sum(n * log2(n)) / sum(n) + 1e-9, 4)
         AS label_entropy
FROM bl GROUP BY centroid
"""


def ann_quantized_topk_sql(k: int = 5, n_queries: int = 10) -> str:
    """Asymmetric int8-quantized search twin: the corpus side is
    quantized with the same explicit half-up rounding the engine uses
    (floor(x/scale*127 + 0.5)), dequantized, then ranked exactly —
    agreement proves the quantization arithmetic, not just the ranking."""
    return f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
s AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS scale FROM v
),
deq AS (
  SELECT vec_id,
         CASE WHEN scale > 0
              THEN list_transform(v, x -> CAST(floor(x / scale * 127 + 0.5) AS INT) * scale / 127)
              ELSE list_transform(v, x -> 0.0) END AS dv
  FROM s
),
q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
      FROM embeddings WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, d.vec_id AS neighbor_id,
         list_cosine_similarity(d.dv, q.qe) AS c
  FROM deq d, q WHERE d.vec_id != q.query_id
)
SELECT query_id, neighbor_id, rank, round(c, 4) AS cosine
FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rank
      FROM scored)
WHERE rank <= {k}
"""


def ann_ivf_topk_sql(
    k: int = 5, n_queries: int = 10, n_centroids: int = 16, n_probe: int = 2
) -> str:
    """IVF twin: centroids = first n_centroids corpus vectors; corpus rows
    assigned to their nearest centroid; queries probe their n_probe nearest."""
    return f"""
WITH cents AS (
  SELECT vec_id AS centroid, embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id < {n_centroids}
),
corpus_assign AS (
  SELECT neighbor_id, centroid, cv2 FROM (
    SELECT e.vec_id AS neighbor_id, c.centroid, e.embedding::DOUBLE[] AS cv2,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC, c.centroid) AS rk
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rk = 1
),
q_assign AS (
  SELECT query_id, centroid, qv FROM (
    SELECT e.vec_id AS query_id, c.centroid, e.embedding::DOUBLE[] AS qv,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC, c.centroid) AS rk
    FROM embeddings e CROSS JOIN cents c WHERE e.vec_id < {n_queries}
  ) WHERE rk <= {n_probe}
),
scored AS (
  SELECT q.query_id, ca.neighbor_id, list_cosine_similarity(q.qv, ca.cv2) AS c
  FROM q_assign q JOIN corpus_assign ca USING (centroid)
  WHERE ca.neighbor_id != q.query_id
)
SELECT query_id, neighbor_id, rank, round(c, 4) AS cosine
FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rank
      FROM scored)
WHERE rank <= {k}
"""


def ann_knn_graph_sql(k: int = 5, n_centroids: int = 16, n_probe: int = 2) -> str:
    """Twin of :func:`operators.similarity.knn_graph`: every vector probes
    its ``n_probe`` nearest inverted lists and ranks the members found
    there — the full corpus kNN graph, not a sampled query set."""
    return f"""
WITH cents AS (
  SELECT vec_id AS centroid, embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id < {n_centroids}
),
members AS (
  SELECT neighbor_id, centroid, nv FROM (
    SELECT e.vec_id AS neighbor_id, c.centroid, e.embedding::DOUBLE[] AS nv,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC, c.centroid) AS rk
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rk = 1
),
probes AS (
  SELECT src_id, centroid, sv FROM (
    SELECT e.vec_id AS src_id, c.centroid, e.embedding::DOUBLE[] AS sv,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC, c.centroid) AS rk
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rk <= {n_probe}
),
scored AS (
  SELECT p.src_id, m.neighbor_id, list_cosine_similarity(p.sv, m.nv) AS c
  FROM probes p JOIN members m USING (centroid)
  WHERE m.neighbor_id != p.src_id
)
SELECT src_id, neighbor_id, rank, round(c, 4) AS cosine
FROM (SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY c DESC, neighbor_id) AS rank
      FROM scored)
WHERE rank <= {k}
"""


def ann_recall_report_sql(
    k: int = 5, n_queries: int = 10, n_centroids: int = 16, n_probe: int = 2
) -> str:
    """Recall-report twin: the brute and IVF twins reused verbatim as
    derived tables, joined on (query_id, neighbor_id)."""
    return f"""
WITH truth AS (
  SELECT query_id, neighbor_id FROM ({ann_cosine_topk_sql(k, n_queries)}) __b
),
approx AS (
  SELECT query_id, neighbor_id
  FROM ({ann_ivf_topk_sql(k, n_queries, n_centroids, n_probe)}) __a
),
h AS (
  SELECT count(*) AS n_hits FROM truth JOIN approx USING (query_id, neighbor_id)
),
t AS (
  SELECT count(DISTINCT query_id) AS n_queries, count(*) AS n_truth FROM truth
)
SELECT CAST({k} AS BIGINT) AS k,
       CAST(t.n_queries AS BIGINT) AS n_queries,
       CAST(t.n_truth AS BIGINT) AS n_truth,
       CAST(h.n_hits AS BIGINT) AS n_hits,
       round(h.n_hits / CAST(t.n_truth AS DOUBLE), 6) AS recall
FROM t CROSS JOIN h
"""


def embedding_covariance_sql() -> str:
    """Covariance twin: zipped unnest+generate_subscripts, row-key
    self-join for the upper-triangle pairs, covar_pop per (i, j)."""
    return """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
x AS (
  SELECT vec_id,
         CAST(generate_subscripts(v, 1) - 1 AS BIGINT) AS dim,
         unnest(v) AS x
  FROM v
)
SELECT a.dim AS dim_i, b.dim AS dim_j,
       round(covar_pop(a.x, b.x), 6) + 0.0 AS cov
FROM x a JOIN x b ON a.vec_id = b.vec_id AND b.dim >= a.dim
GROUP BY 1, 2
"""


def pca_identity_sql(n_components: int = 8) -> str:
    """Twin of ``similarity.pca_identity_report`` — the strict-hash
    oracle for the PCA eigen step.  Every identity column is known a
    priori (zero residuals, monotone ratios), so the twin pins them as
    literals; only the covariance trace is computed.  If the engine's
    eigenvalues, eigenvectors, centering, sign fix or rank order were
    wrong, its residuals leave exactly-0.0/true and the hash fails —
    eigen never needs to be expressed in SQL.

    ``trace_cov`` is bit-deterministic, not a round-off comparison:
    the 6-dp-rounded diagonal covar_pop cells (the exact cells the
    strict-green ``ml_embedding_cov`` twin already proves equal across
    engines) are summed by a recursive-CTE LEFT FOLD in dim order —
    the same sequential fold the engine runs driver-side — so both
    engines add IDENTICAL doubles in IDENTICAL order and the unrounded
    sum matches bit-for-bit.  ``round(sum(var_pop), 6)`` on two engines
    would instead round two differently-ordered aggregations at a 6-dp
    cut — a data-dependent half-boundary coin flip."""
    return f"""
WITH RECURSIVE
v AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
x AS (SELECT CAST(generate_subscripts(v, 1) - 1 AS BIGINT) AS dim,
             unnest(v) AS x FROM v),
c AS MATERIALIZED (
  SELECT dim, round(covar_pop(x, x), 6) + 0.0 AS cell FROM x GROUP BY dim
),
fold AS (
  SELECT CAST(-1 AS BIGINT) AS dim, CAST(0.0 AS DOUBLE) AS acc
  UNION ALL
  SELECT c.dim, fold.acc + c.cell FROM fold JOIN c ON c.dim = fold.dim + 1
),
t AS (SELECT acc AS tr FROM fold ORDER BY dim DESC LIMIT 1)
SELECT CAST(r.i AS BIGINT) AS component,
       t.tr + 0.0 AS trace_cov,
       0.0 AS var_residual,
       0.0 AS max_abs_xcov,
       0.0 AS mean_residual,
       TRUE AS ratio_monotone
FROM range({int(n_components)}) r(i), t
ORDER BY component
"""


def ann_lsh_topk_sql(
    k: int = 5, n_queries: int = 10, n_planes: int = 6, dim: int = 64
) -> str:
    """Twin of hyperplane_lsh_topk: same md5-seeded hyperplanes inlined as
    literals, same sign-bucket join, same per-query top-k — Spark and
    DuckDB agree row-for-row on the approximate result."""
    from datalake_indexes_spark.operators.similarity import hyperplanes

    planes = hyperplanes(dim, n_planes)
    sig_bits = " || ".join(
        "(CASE WHEN list_dot_product(e::DOUBLE[], {arr}::DOUBLE[]) >= 0 THEN '1' ELSE '0' END)".format(
            arr="[" + ", ".join(repr(w) for w in plane) + "]"
        )
        for plane in planes
    )
    return f"""
WITH u AS (SELECT vec_id, embedding::DOUBLE[] AS e, {sig_bits} AS sig FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qe, sig FROM u WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(c.e, q.qe) AS c
  FROM u c JOIN q ON c.sig = q.sig AND c.vec_id != q.query_id
)
SELECT query_id, neighbor_id, rank, round(c, 4) AS cosine
FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rank
      FROM scored)
WHERE rank <= {k}
"""


def ann_lsh_multiprobe_topk_sql(
    k: int = 5, n_queries: int = 10, n_tables: int = 4,
    n_planes: int = 6, dim: int = 64,
) -> str:
    """Twin of hyperplane_lsh_topk_multiprobe: per-table md5-seeded
    planes inlined as literals, OR-of-tables bucket match, distinct
    candidates, exact per-query top-k."""
    from datalake_indexes_spark.operators.similarity import hyperplanes

    sig_cols = []
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed=f"simsearch:{t}")
        bits = " || ".join(
            "(CASE WHEN list_dot_product(e::DOUBLE[], {arr}::DOUBLE[]) >= 0 "
            "THEN '1' ELSE '0' END)".format(
                arr="[" + ", ".join(repr(w) for w in plane) + "]"
            )
            for plane in planes
        )
        sig_cols.append(f"{bits} AS s{t}")
    or_cond = " OR ".join(f"c.s{t} = q.s{t}" for t in range(n_tables))
    return f"""
WITH u AS (SELECT vec_id, embedding::DOUBLE[] AS e, {", ".join(sig_cols)}
           FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qe,
             {", ".join(f"s{t}" for t in range(n_tables))}
      FROM u WHERE vec_id < {n_queries}),
cand AS (
  SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
  FROM u c JOIN q ON ({or_cond}) AND c.vec_id != q.query_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         list_cosine_similarity(c.e, q.qe) AS c
  FROM cand
  JOIN u c ON c.vec_id = cand.neighbor_id
  JOIN q ON q.query_id = cand.query_id
)
SELECT query_id, neighbor_id, rank, round(c, 4) AS cosine
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY c DESC, neighbor_id) AS rank
      FROM scored)
WHERE rank <= {k}
"""


def ann_pq_topk_sql(
    k: int = 5, n_queries: int = 10, m: int = 4, ksub: int = 16, dim: int = 64
) -> str:
    """Product-quantization ADC twin: same unit-normalization, same
    seed codebooks (subvectors of the first ksub corpus vectors by id),
    same L2 argmin encode (tie -> lowest code), same LUT-sum scoring —
    Spark and DuckDB agree row-for-row on the PQ estimate."""
    sub = dim // m
    js = ", ".join(str(j) for j in range(m))
    return f"""
WITH u AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
           x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y*y)))) AS v
  FROM embeddings
),
js AS (SELECT unnest([{js}]) AS j),
seeds AS (
  SELECT vec_id, v, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
  FROM u ORDER BY vec_id LIMIT {ksub}
),
books AS (
  SELECT js.j, s.code, list_slice(s.v, js.j*{sub}+1, (js.j+1)*{sub}) AS centroid
  FROM seeds s CROSS JOIN js
),
subv AS (
  SELECT u.vec_id, js.j, list_slice(u.v, js.j*{sub}+1, (js.j+1)*{sub}) AS sv
  FROM u CROSS JOIN js
),
codes AS (
  SELECT vec_id, j, code FROM (
    SELECT s.vec_id, s.j, b.code,
           row_number() OVER (PARTITION BY s.vec_id, s.j
             ORDER BY list_distance(s.sv, b.centroid), b.code) AS rk
    FROM subv s JOIN books b ON b.j = s.j
  ) WHERE rk = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM u WHERE vec_id < {n_queries}),
lut AS (
  SELECT q.query_id, b.j, b.code,
         list_dot_product(list_slice(q.qv, b.j*{sub}+1, (b.j+1)*{sub}), b.centroid) AS p
  FROM q CROSS JOIN books b
),
scored AS (
  SELECT l.query_id, c.vec_id AS neighbor_id, sum(l.p) AS est
  FROM codes c JOIN lut l ON l.j = c.j AND l.code = c.code
  WHERE c.vec_id != l.query_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, rank, round(est, 4) AS est_cosine
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY est DESC, neighbor_id) AS rank FROM scored)
WHERE rank <= {k}
"""


def ann_ivf_pq_topk_sql(
    k: int = 5,
    n_queries: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 4,
    ksub: int = 16,
    dim: int = 64,
) -> str:
    """IVF-PQ twin: same seed centroids, same residual codebooks (first
    ksub residuals), same argmin encode, same dot(q,c) + LUT-sum
    estimate — replicated with DuckDB list functions."""
    sub = dim // m
    js = ", ".join(str(j) for j in range(m))
    return f"""
WITH u AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
           x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y*y)))) AS v
  FROM embeddings
),
cents AS (SELECT vec_id AS centroid, v AS cv FROM u WHERE vec_id < {n_centroids}),
assigned AS MATERIALIZED (
  SELECT vec_id, centroid,
         list_transform(list_zip(v, cv), z -> z[1] - z[2]) AS r
  FROM (
    SELECT u.vec_id, c.centroid, u.v, c.cv,
           row_number() OVER (PARTITION BY u.vec_id
             ORDER BY list_dot_product(u.v, c.cv) DESC, c.centroid) AS rk
    FROM u CROSS JOIN cents c
  ) WHERE rk = 1
),
js AS (SELECT unnest([{js}]) AS j),
seeds AS (
  SELECT vec_id, r, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
  FROM assigned ORDER BY vec_id LIMIT {ksub}
),
books AS MATERIALIZED (
  SELECT js.j, s.code, list_slice(s.r, js.j*{sub}+1, (js.j+1)*{sub}) AS bc
  FROM seeds s CROSS JOIN js
),
rsub AS (
  SELECT a.vec_id, a.centroid, js.j,
         list_slice(a.r, js.j*{sub}+1, (js.j+1)*{sub}) AS sv
  FROM assigned a CROSS JOIN js
),
codes AS MATERIALIZED (
  SELECT vec_id, centroid, j, code FROM (
    SELECT r.vec_id, r.centroid, r.j, b.code,
           row_number() OVER (PARTITION BY r.vec_id, r.j
             ORDER BY list_distance(r.sv, b.bc), b.code) AS rk
    FROM rsub r JOIN books b ON b.j = r.j
  ) WHERE rk = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM u WHERE vec_id < {n_queries}),
probed AS (
  SELECT query_id, centroid, qc FROM (
    SELECT q.query_id, c.centroid, list_dot_product(q.qv, c.cv) AS qc,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_dot_product(q.qv, c.cv) DESC, c.centroid) AS rk
    FROM q CROSS JOIN cents c
  ) WHERE rk <= {n_probe}
),
lut AS (
  SELECT q.query_id, b.j, b.code,
         list_dot_product(list_slice(q.qv, b.j*{sub}+1, (b.j+1)*{sub}), b.bc) AS p
  FROM q CROSS JOIN books b
),
scored AS (
  SELECT p.query_id, c.vec_id AS neighbor_id, any_value(p.qc) + sum(l.p) AS est
  FROM codes c
  JOIN probed p ON p.centroid = c.centroid
  JOIN lut l ON l.query_id = p.query_id AND l.j = c.j AND l.code = c.code
  WHERE c.vec_id != p.query_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, rank, round(est, 4) AS est_cosine
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY est DESC, neighbor_id) AS rank FROM scored)
WHERE rank <= {k}
"""


def target_encode_sql(n_folds: int = 5, smoothing: float = 20.0) -> str:
    """Twin of :func:`..operators.ml.target_encode` over customer
    (category = c_mktsegment, target = c_acctbal)."""
    return f"""
WITH rows_ AS (
  SELECT c_custkey, c_mktsegment AS category,
         CAST(c_acctbal AS DOUBLE) AS t,
         CAST(('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
              % {n_folds} AS INT) AS fold
  FROM customer
),
gm AS (SELECT avg(t) AS g FROM rows_),
per_fold AS (
  SELECT category, fold, sum(t) AS fs, count(*) AS fc
  FROM rows_ GROUP BY category, fold
),
per_cat AS (
  SELECT category, sum(fs) AS cs, sum(fc) AS cc FROM per_fold GROUP BY category
),
stats AS (
  SELECT pf.category, pf.fold,
         (pc.cs - pf.fs + {smoothing} * gm.g) / (pc.cc - pf.fc + {smoothing}) AS enc
  FROM per_fold pf JOIN per_cat pc USING (category), gm
)
SELECT r.c_custkey, r.category, r.fold, round(s.enc, 6) AS encoded
FROM rows_ r JOIN stats s ON s.category = r.category AND s.fold = r.fold
"""


def correlation_matrix_sql() -> str:
    """Twin of :func:`..operators.ml.correlation_matrix` over lineitem
    numerics."""
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    parts = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            parts.append(
                f"SELECT '{a}' AS col_1, '{b}' AS col_2, "
                f"round(corr({a}, {b}), 6) AS corr FROM lineitem"
            )
    return " UNION ALL ".join(parts)


def robust_scale_stats_sql() -> str:
    """Twin of the robust-scale grading query: post-scale mean/stddev per
    column (quantile_cont matches Spark's exact percentile)."""
    cols = ["l_quantity", "l_extendedprice"]
    parts = []
    for c in cols:
        parts.append(f"""
SELECT '{c}' AS column_name,
       round(avg(({c} - b.med) / (b.q3 - b.q1)), 6) AS mean_scaled,
       round(stddev_samp(({c} - b.med) / (b.q3 - b.q1)), 6) AS std_scaled
FROM lineitem,
     (SELECT quantile_cont({c}, 0.5) AS med,
             quantile_cont({c}, 0.25) AS q1,
             quantile_cont({c}, 0.75) AS q3 FROM lineitem) b
GROUP BY b.med, b.q1, b.q3""")
    return " UNION ALL ".join(parts)


def embedding_centroids_sql() -> str:
    """Twin of :func:`..operators.similarity.embedding_centroids` per
    label over the embeddings table."""
    return """
SELECT label AS grp, CAST(gs - 1 AS INT) AS dim,
       round(avg(x), 6) AS centroid
FROM (
  SELECT label, generate_subscripts(embedding, 1) AS gs,
         unnest(embedding) AS x
  FROM embeddings
)
GROUP BY label, gs
"""


def embedding_drift_sql(plant_shift: float = 0.35) -> str:
    """Embedding-drift twin: even/odd vec_id cohorts, the odd cohort's
    FIRST component shifted by ``plant_shift`` at the unnested level
    (mirrors the engine's indexed transform), identical centroid-cosine
    and mean-norm closed forms."""
    return f"""
WITH flat AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
tagged AS (
  SELECT vec_id, pos,
         CASE WHEN vec_id % 2 = 1 AND pos = 1 THEN x + {plant_shift!r} ELSE x END AS x,
         vec_id % 2 AS side
  FROM flat
),
norms AS (
  SELECT vec_id, side, sqrt(sum(x * x)) AS nrm FROM tagged GROUP BY 1, 2
),
sides AS (
  SELECT side, count(*) AS n, avg(nrm) AS mean_norm FROM norms GROUP BY 1
),
means AS (
  SELECT pos,
         avg(CASE WHEN side = 0 THEN x END) AS m_a,
         avg(CASE WHEN side = 1 THEN x END) AS m_b
  FROM tagged GROUP BY 1
),
cen AS (
  SELECT count(*) AS dim, sum(m_a * m_b) AS dot,
         sum(m_a * m_a) AS na2, sum(m_b * m_b) AS nb2
  FROM means
)
SELECT CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
       CAST(c.dim AS BIGINT) AS dim,
       round(c.dot / nullif(sqrt(c.na2 * c.nb2), 0.0), 6) AS centroid_cosine,
       round(a.mean_norm, 6) AS mean_norm_a,
       round(b.mean_norm, 6) AS mean_norm_b,
       round(b.mean_norm / nullif(a.mean_norm, 0.0), 6) AS norm_ratio
FROM (SELECT * FROM sides WHERE side = 0) a,
     (SELECT * FROM sides WHERE side = 1) b,
     cen c
"""


def ann_hard_negatives_sql(
    k: int = 5, n_queries: int = 10, threshold: float = 0.4, n_planes: int = 4
) -> str:
    """Hard-negative twin: brute-force cosine scores minus the symmetrized
    LSH-blocked near-dup pairs (the embedding-dedup query reused
    verbatim), ranked per query AFTER the exclusion."""
    pairs = dedup_embedding_cosine_sql(threshold=threshold, n_planes=n_planes)
    return f"""
WITH px AS MATERIALIZED (SELECT vec_id_1, vec_id_2 FROM ({pairs}) __p),
ex AS (
  SELECT vec_id_1 AS query_id, vec_id_2 AS neighbor_id FROM px
  UNION ALL
  SELECT vec_id_2, vec_id_1 FROM px
),
q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
      FROM embeddings WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qe) AS c
  FROM embeddings e, q
  WHERE e.vec_id != q.query_id
    AND NOT EXISTS (SELECT 1 FROM ex
                    WHERE ex.query_id = q.query_id
                      AND ex.neighbor_id = e.vec_id)
)
SELECT query_id, neighbor_id, rank, round(c, 4) AS cosine
FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rank
      FROM scored)
WHERE rank <= {k}
"""


def ml_cv_folds_sql(k: int = 5) -> str:
    """Twin of :func:`..operators.ml.cv_folds` (exact tier) on the lang
    strata: same md5-shuffle rank, same ``(rank-1) % k`` assignment."""
    return f"""
SELECT doc_id, lang AS stratum,
       CAST((row_number() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1) % {k} AS INT)
         AS fold
FROM documents
"""


def ann_range_search_sql(
    threshold: float = 0.4, k_cap: int = 100, n_queries: int = 10
) -> str:
    """Twin of :func:`..operators.similarity.range_search`: all corpus
    neighbors with cosine >= threshold, closest-first capped at k_cap."""
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
           FROM embeddings WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qe) AS c
  FROM embeddings e, q WHERE e.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, c,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY c DESC, neighbor_id) AS r
  FROM scored WHERE c >= {threshold}
)
SELECT query_id, neighbor_id, round(c, 4) AS cosine
FROM ranked WHERE r <= {k_cap}
"""


def ann_range_blocked_sql(
    threshold: float = 0.2,
    k_cap: int = 100,
    n_queries: int = 10,
    n_planes: int = 6,
    dim: int = 64,
) -> str:
    """Twin of :func:`..operators.similarity.range_search_blocked`: same
    md5-seeded hyperplanes inlined as literals, same sign-bucket join,
    same threshold + k_cap closest-first bound."""
    from datalake_indexes_spark.operators.similarity import hyperplanes

    planes = hyperplanes(dim, n_planes)
    sig_bits = " || ".join(
        "(CASE WHEN list_dot_product(e::DOUBLE[], {arr}::DOUBLE[]) >= 0 "
        "THEN '1' ELSE '0' END)".format(
            arr="[" + ", ".join(repr(w) for w in plane) + "]"
        )
        for plane in planes
    )
    return f"""
WITH u AS (SELECT vec_id, embedding::DOUBLE[] AS e, {sig_bits} AS sig
           FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qe, sig FROM u WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(c.e, q.qe) AS c
  FROM u c JOIN q ON c.sig = q.sig AND c.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, c,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY c DESC, neighbor_id) AS r
  FROM scored WHERE c >= {threshold}
)
SELECT query_id, neighbor_id, round(c, 4) AS cosine
FROM ranked WHERE r <= {k_cap}
"""


def ml_nb_langid_sql(n_buckets: int = 512, alpha: float = 1.0) -> str:
    """Twin of :func:`..operators.ml.hashed_nb_classify` over the
    marker-planted corpus (three ' zz'||lang tokens appended per doc so
    the classes are separable) — same md5 bucket rule, same dense
    classes x buckets Laplace grid, same round-to-6 argmax with
    class-name tie-break."""
    ab = alpha * n_buckets
    return f"""
WITH planted AS (
  SELECT doc_id, lang,
         text || ' zz' || lang || ' zz' || lang || ' zz' || lang AS text
  FROM documents
),
words AS (
  SELECT doc_id, label,
         ('0x' || substring(md5(g), 1, 8))::BIGINT % {n_buckets} AS b
  FROM (
    SELECT doc_id, lang AS label,
           unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS g
    FROM planted
  )
),
cls AS (SELECT lang AS cls, count(*) AS nd FROM planted GROUP BY lang),
tot AS (SELECT sum(nd) AS td FROM cls),
pri AS (SELECT cls, ln(nd * 1.0 / td) AS prior FROM cls, tot),
ct AS (SELECT label AS cls, b, count(*) AS c FROM words GROUP BY label, b),
ctot AS (SELECT cls, sum(c) AS tc FROM ct GROUP BY cls),
grid AS (
  SELECT c.cls, g.b
  FROM (SELECT cls FROM cls) c, (SELECT range AS b FROM range({n_buckets})) g
),
cond AS (
  SELECT grid.cls, grid.b,
         ln((coalesce(ct.c, 0) + {alpha}) / (ctot.tc + {ab})) AS logp
  FROM grid
  LEFT JOIN ct ON ct.cls = grid.cls AND ct.b = grid.b
  JOIN ctot ON ctot.cls = grid.cls
),
sc AS (
  SELECT w.doc_id, w.label, c.cls,
         count(*) AS n, sum(c.logp) AS s
  FROM words w JOIN cond c USING (b)
  GROUP BY w.doc_id, w.label, c.cls
),
fin AS (
  SELECT doc_id, label, cls, n,
         row_number() OVER (
           PARTITION BY doc_id
           ORDER BY round(s + prior, 6) DESC, cls DESC) AS rn
  FROM sc JOIN pri USING (cls)
)
SELECT doc_id, label, cls AS pred_label, CAST(n AS BIGINT) AS n_words,
       (cls = label) AS correct
FROM fin WHERE rn = 1
"""


def ann_mmr_topk_sql(
    k: int = 8, lam: float = 0.7, candidates: int = 40, n_queries: int = 5
) -> str:
    """Twin of :func:`..operators.similarity.mmr_topk` — the greedy MMR
    selection unrolled into ``k`` materialized steps (the graph_hits
    unrolled-CTE pattern).  The similarity-penalty coefficient is
    inlined as repr(1.0 - lam) so both engines subtract the SAME double,
    not a re-parsed decimal."""
    oml = repr(1.0 - lam)
    lam_r = repr(lam)
    parts = [
        f"""WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
  FROM embeddings WHERE vec_id < {n_queries}
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qe) AS rel
  FROM embeddings e, q WHERE e.vec_id != q.query_id
),
cand AS MATERIALIZED (
  SELECT query_id, neighbor_id, rel FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY rel DESC, neighbor_id) AS rk
    FROM scored) WHERE rk <= {candidates}
),
cv AS MATERIALIZED (
  SELECT c.query_id, c.neighbor_id, c.rel, e.embedding::DOUBLE[] AS v
  FROM cand c JOIN embeddings e ON e.vec_id = c.neighbor_id
),
pairs AS MATERIALIZED (
  SELECT a.query_id, a.neighbor_id AS x, b.neighbor_id AS y,
         list_cosine_similarity(a.v, b.v) AS s
  FROM cv a JOIN cv b
    ON a.query_id = b.query_id AND a.neighbor_id != b.neighbor_id
),
sel1 AS (
  SELECT query_id, neighbor_id, rel, {lam_r} * rel AS score, 1 AS mmr_rank
  FROM (SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY {lam_r} * rel DESC, neighbor_id) AS rn
        FROM cand) WHERE rn = 1
),
acc1 AS MATERIALIZED (SELECT * FROM sel1)"""
    ]
    for i in range(2, k + 1):
        parts.append(
            f""",
sel{i} AS MATERIALIZED (
  SELECT query_id, neighbor_id, rel, score, {i} AS mmr_rank FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
    FROM (
      SELECT c.query_id, c.neighbor_id, c.rel,
             {lam_r} * c.rel - {oml} * max(p.s) AS score
      FROM cand c
      JOIN pairs p ON p.query_id = c.query_id AND p.x = c.neighbor_id
      JOIN acc{i - 1} sl
        ON sl.query_id = p.query_id AND sl.neighbor_id = p.y
      WHERE NOT EXISTS (
        SELECT 1 FROM acc{i - 1} z
        WHERE z.query_id = c.query_id AND z.neighbor_id = c.neighbor_id)
      GROUP BY c.query_id, c.neighbor_id, c.rel
    )
  ) WHERE rn = 1
),
acc{i} AS MATERIALIZED (SELECT * FROM acc{i - 1} UNION ALL SELECT * FROM sel{i})"""
        )
    parts.append(
        f"""
SELECT query_id, neighbor_id, CAST(mmr_rank AS INT) AS mmr_rank,
       round(rel, 4) AS cosine, round(score, 4) AS mmr_score
FROM acc{k}"""
    )
    return "".join(parts)


def ann_ivf_pq_refined_sql(
    k: int = 5,
    c_factor: int = 3,
    n_queries: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 4,
    ksub: int = 16,
    dim: int = 64,
) -> str:
    """Twin of :func:`..operators.similarity.ivf_pq_refined_topk`: the
    trusted IVF-PQ twin at k·c_factor as a derived table, true-vector
    exact-cosine rescore, per-query re-rank to k."""
    inner = ann_ivf_pq_topk_sql(
        k=k * c_factor,
        n_queries=n_queries,
        n_centroids=n_centroids,
        n_probe=n_probe,
        m=m,
        ksub=ksub,
        dim=dim,
    )
    return f"""
WITH cand AS (SELECT query_id, neighbor_id FROM ({inner}) t),
qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
       FROM embeddings WHERE vec_id < {n_queries}),
exact AS (
  SELECT c.query_id, c.neighbor_id,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qe) AS cos
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.neighbor_id
  JOIN qv q ON q.query_id = c.query_id
)
SELECT query_id, neighbor_id, rank, round(cos, 4) AS cosine
FROM (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM exact)
WHERE rank <= {k}
"""


def ann_margin_mining_sql(k: int = 4, threshold: float = 1.1) -> str:
    """Twin of :func:`..operators.similarity.margin_mining` over the
    even/odd vec_id split: brute-force both-direction top-k, rank-pivot
    averages of the ROUNDED(4) cosines in fixed addition order, ratio
    margin with the +1e-9 half-boundary nudge, reverse-top-k mutual
    flag."""
    pivot = " + ".join(
        f"coalesce(max(CASE WHEN r = {r} THEN c END), 0.0)" for r in range(1, k + 1)
    )
    return f"""
WITH a AS (SELECT vec_id AS id, embedding::DOUBLE[] AS e
           FROM embeddings WHERE vec_id % 2 = 0),
b AS (SELECT vec_id AS id, embedding::DOUBLE[] AS e
      FROM embeddings WHERE vec_id % 2 = 1),
fwd AS (
  SELECT a.id AS s, b.id AS t,
         round(list_cosine_similarity(a.e, b.e), 4) AS c,
         row_number() OVER (PARTITION BY a.id
             ORDER BY list_cosine_similarity(a.e, b.e) DESC, b.id) AS r
  FROM a, b),
bwd AS (
  SELECT b.id AS s, a.id AS t,
         round(list_cosine_similarity(a.e, b.e), 4) AS c,
         row_number() OVER (PARTITION BY b.id
             ORDER BY list_cosine_similarity(a.e, b.e) DESC, a.id) AS r
  FROM a, b),
fa AS (SELECT s, ({pivot}) / count(*) AS av FROM fwd WHERE r <= {k} GROUP BY s),
ba AS (SELECT s, ({pivot}) / count(*) AS av FROM bwd WHERE r <= {k} GROUP BY s)
SELECT f.s AS src_id, f.t AS tgt_id, f.c AS cosine,
       round(f.c / ((fa.av + ba.av) / 2.0) + 1e-9, 6) AS margin,
       (m.s IS NOT NULL) AS mutual
FROM fwd f
JOIN fa ON f.s = fa.s
JOIN ba ON f.t = ba.s
LEFT JOIN (SELECT t AS s2, s AS t2, s FROM bwd WHERE r <= {k}) m
       ON m.s2 = f.s AND m.t2 = f.t
WHERE f.r <= {k} AND f.c / ((fa.av + ba.av) / 2.0) >= {threshold}
"""


def _nn_expand_sql(edges_select: str, k: int) -> str:
    """One NN-descent expansion+rescore over an arbitrary edge-producing
    SELECT — MATERIALIZED so the (possibly nested) edge query evaluates
    once, not once per candidate branch (the HITS-twin inlining trap)."""
    return f"""
WITH e AS MATERIALIZED (
  SELECT src_id, neighbor_id FROM ({edges_select}) __e
),
cand AS (
  SELECT src_id, neighbor_id FROM e
  UNION
  SELECT neighbor_id AS src_id, src_id AS neighbor_id FROM e
  UNION
  SELECT e1.src_id, e2.neighbor_id
  FROM e e1 JOIN e e2 ON e1.neighbor_id = e2.src_id
),
scored AS (
  SELECT c.src_id, c.neighbor_id,
         list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cs
  FROM cand c
  JOIN embeddings a ON a.vec_id = c.src_id
  JOIN embeddings b ON b.vec_id = c.neighbor_id
  WHERE c.src_id != c.neighbor_id
)
SELECT src_id, neighbor_id, rank, round(cs, 4) AS cosine
FROM (SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY cs DESC, neighbor_id) AS rank
      FROM scored)
WHERE rank <= {k}
"""


def ann_nn_descent_sql(
    k: int = 5, n_centroids: int = 16, n_probe: int = 2, rounds: int = 1
) -> str:
    """Twin of :func:`..operators.similarity.nn_descent` (and
    `nn_descent_round` at rounds=1): the trusted kNN-graph twin seeds
    the chain, then ``rounds`` nested expansion+rescore steps — each
    level's edges MATERIALIZED exactly like the engine's per-round
    localCheckpoint."""
    sql = ann_knn_graph_sql(k, n_centroids, n_probe)
    for _ in range(max(rounds, 1)):
        sql = _nn_expand_sql(sql, k)
    return sql


def ml_embedding_isotropy_sql() -> str:
    """Twin of :func:`..operators.similarity.embedding_isotropy_report`:
    unit vectors, per-dim sums rounded(6) before the squared-sum fold,
    sum-vector identity for the all-pairs mean cosine."""
    return """
WITH u AS (
  SELECT list_transform(embedding::DOUBLE[],
           x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y*y)))) AS v
  FROM embeddings
),
dims AS (SELECT generate_subscripts(v, 1) AS dim, unnest(v) AS uv FROM u),
per_dim AS (SELECT dim, round(sum(uv) + 1e-9, 6) AS s FROM dims GROUP BY dim),
scal AS (SELECT sum(s * s) AS ssum, count(*) AS dim FROM per_dim),
stats AS (
  SELECT count(*) AS n,
         round(avg(sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y*y)))) + 1e-9, 6) AS avg_norm
  FROM embeddings
)
SELECT CAST(n AS BIGINT) AS n, CAST(dim AS BIGINT) AS dim, avg_norm,
       round(sqrt(ssum) / n + 1e-9, 6) AS mean_vec_norm,
       round((ssum - n) / (n * (n - 1.0)) + 1e-9, 6) AS avg_pairwise_cosine
FROM stats, scal
"""


def ml_nb_calibration_sql(
    n_buckets: int = 512,
    alpha: float = 1.0,
    bin_width: float = 2.0,
    n_bins: int = 8,
) -> str:
    """Twin of :func:`..operators.ml.nb_calibration_report` over the
    marker-planted corpus: same dense Laplace grid and rounded(6)
    scores as the langid twin, top-2 margin pivot, fixed-width bins
    with an open last bin."""
    ab = alpha * n_buckets
    return f"""
WITH planted AS (
  SELECT doc_id, lang,
         text || ' zz' || lang || ' zz' || lang || ' zz' || lang AS text
  FROM documents
),
words AS (
  SELECT doc_id, label,
         ('0x' || substring(md5(g), 1, 8))::BIGINT % {n_buckets} AS b
  FROM (
    SELECT doc_id, lang AS label,
           unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS g
    FROM planted
  )
),
cls AS (SELECT lang AS cls, count(*) AS nd FROM planted GROUP BY lang),
tot AS (SELECT sum(nd) AS td FROM cls),
pri AS (SELECT cls, ln(nd * 1.0 / td) AS prior FROM cls, tot),
ct AS (SELECT label AS cls, b, count(*) AS c FROM words GROUP BY label, b),
ctot AS (SELECT cls, sum(c) AS tc FROM ct GROUP BY cls),
grid AS (
  SELECT c.cls, g.b
  FROM (SELECT cls FROM cls) c, (SELECT range AS b FROM range({n_buckets})) g
),
cond AS (
  SELECT grid.cls, grid.b,
         ln((coalesce(ct.c, 0) + {alpha}) / (ctot.tc + {ab})) AS logp
  FROM grid
  LEFT JOIN ct ON ct.cls = grid.cls AND ct.b = grid.b
  JOIN ctot ON ctot.cls = grid.cls
),
sc AS (
  SELECT w.doc_id, w.label, c.cls, round(sum(c.logp) + prior, 6) AS score
  FROM words w JOIN cond c USING (b) JOIN pri ON pri.cls = c.cls
  GROUP BY w.doc_id, w.label, c.cls, prior
),
rk AS (
  SELECT doc_id, label, cls, score,
         row_number() OVER (PARTITION BY doc_id
             ORDER BY score DESC, cls DESC) AS rn
  FROM sc
),
t2 AS (
  SELECT doc_id, label,
         max(CASE WHEN rn = 1 THEN score END) AS s1,
         max(CASE WHEN rn = 1 THEN cls END) AS pred,
         max(CASE WHEN rn = 2 THEN score END) AS s2
  FROM rk WHERE rn <= 2 GROUP BY doc_id, label
),
m AS (
  SELECT least(CAST(floor((s1 - coalesce(s2, s1 - {bin_width * n_bins})) / {bin_width})
               AS BIGINT), {n_bins - 1}) AS bin,
         s1 - coalesce(s2, s1 - {bin_width * n_bins}) AS margin,
         CASE WHEN pred = label THEN 1.0 ELSE 0.0 END AS ok
  FROM t2
)
SELECT bin, round(bin * {bin_width}, 6) AS margin_lo,
       count(*) AS n_docs,
       round(avg(margin) + 1e-9, 6) AS avg_margin,
       round(avg(ok) + 1e-9, 6) AS accuracy
FROM m GROUP BY bin
"""


def ann_margin_blocked_sql(
    k: int = 4,
    threshold: float = 1.1,
    n_centroids: int = 16,
    n_probe: int = 2,
) -> str:
    """Twin of :func:`..operators.similarity.margin_mining_blocked` over
    the even/odd split: shared union centroids (vec_id < n_centroids),
    bipartite probe/member assignment exactly as the kNN-graph twin,
    then the margin algebra of :func:`ann_margin_mining_sql`."""
    pivot = " + ".join(
        f"coalesce(max(CASE WHEN r = {r} THEN c END), 0.0)" for r in range(1, k + 1)
    )
    return f"""
WITH cents AS (
  SELECT vec_id AS centroid, embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id < {n_centroids}
),
a AS (SELECT vec_id AS id, embedding::DOUBLE[] AS e
      FROM embeddings WHERE vec_id % 2 = 0),
b AS (SELECT vec_id AS id, embedding::DOUBLE[] AS e
      FROM embeddings WHERE vec_id % 2 = 1),
aa AS (
  SELECT id, e, centroid,
         row_number() OVER (PARTITION BY id
             ORDER BY list_cosine_similarity(e, cv) DESC, centroid) AS rk
  FROM a CROSS JOIN cents
),
bb AS (
  SELECT id, e, centroid,
         row_number() OVER (PARTITION BY id
             ORDER BY list_cosine_similarity(e, cv) DESC, centroid) AS rk
  FROM b CROSS JOIN cents
),
fwd AS (
  SELECT s, t, round(cs, 4) AS c,
         row_number() OVER (PARTITION BY s ORDER BY cs DESC, t) AS r
  FROM (
    SELECT p.id AS s, m.id AS t, list_cosine_similarity(p.e, m.e) AS cs
    FROM (SELECT * FROM aa WHERE rk <= {n_probe}) p
    JOIN (SELECT * FROM bb WHERE rk = 1) m USING (centroid)
  )
),
bwd AS (
  SELECT s, t, round(cs, 4) AS c,
         row_number() OVER (PARTITION BY s ORDER BY cs DESC, t) AS r
  FROM (
    SELECT p.id AS s, m.id AS t, list_cosine_similarity(p.e, m.e) AS cs
    FROM (SELECT * FROM bb WHERE rk <= {n_probe}) p
    JOIN (SELECT * FROM aa WHERE rk = 1) m USING (centroid)
  )
),
fa AS (SELECT s, ({pivot}) / count(*) AS av FROM fwd WHERE r <= {k} GROUP BY s),
ba AS (SELECT s, ({pivot}) / count(*) AS av FROM bwd WHERE r <= {k} GROUP BY s)
SELECT f.s AS src_id, f.t AS tgt_id, f.c AS cosine,
       round(f.c / ((fa.av + ba.av) / 2.0) + 1e-9, 6) AS margin,
       (m.s IS NOT NULL) AS mutual
FROM fwd f
JOIN fa ON f.s = fa.s
JOIN ba ON f.t = ba.s
LEFT JOIN (SELECT t AS s2, s AS t2, s FROM bwd WHERE r <= {k}) m
       ON m.s2 = f.s AND m.t2 = f.t
WHERE f.r <= {k} AND f.c / ((fa.av + ba.av) / 2.0) >= {threshold}
"""


def ann_margin_rescore_sql(
    k: int = 4,
    threshold: float = 1.1,
    n_centroids: int = 16,
    n_probe: int = 2,
) -> str:
    """Twin of :func:`..operators.similarity.margin_rescore_report` over
    the even/odd split: brute pair set (the :func:`ann_margin_mining_sql`
    algebra) and blocked pair set (the :func:`ann_margin_blocked_sql`
    algebra) as CTEs, counts and guarded ratios into one gauge row.

    The rescored set is authored as blocked ∩ brute — the rescore
    theorem (a survivor point's EXACT neighborhood average does not
    depend on the blocking, so exact re-scoring blocked survivors at
    the same threshold reproduces precisely the brute-mined subset).
    The ENGINE computes it the literal way (two survivor-query
    cosine_topk passes + the margin algebra), so a strict match here
    cross-checks the theorem, including precision_rescored = 1.0.
    """
    pivot = " + ".join(
        f"coalesce(max(CASE WHEN r = {r} THEN c END), 0.0)" for r in range(1, k + 1)
    )
    return f"""
WITH a AS (SELECT vec_id AS id, embedding::DOUBLE[] AS e
           FROM embeddings WHERE vec_id % 2 = 0),
b AS (SELECT vec_id AS id, embedding::DOUBLE[] AS e
      FROM embeddings WHERE vec_id % 2 = 1),
tf AS (
  SELECT a.id AS s, b.id AS t,
         round(list_cosine_similarity(a.e, b.e), 4) AS c,
         row_number() OVER (PARTITION BY a.id
             ORDER BY list_cosine_similarity(a.e, b.e) DESC, b.id) AS r
  FROM a, b),
tb AS (
  SELECT b.id AS s, a.id AS t,
         round(list_cosine_similarity(a.e, b.e), 4) AS c,
         row_number() OVER (PARTITION BY b.id
             ORDER BY list_cosine_similarity(a.e, b.e) DESC, a.id) AS r
  FROM a, b),
tfa AS (SELECT s, ({pivot}) / count(*) AS av FROM tf WHERE r <= {k} GROUP BY s),
tba AS (SELECT s, ({pivot}) / count(*) AS av FROM tb WHERE r <= {k} GROUP BY s),
truth AS (
  SELECT f.s AS src_id, f.t AS tgt_id
  FROM tf f JOIN tfa ON f.s = tfa.s JOIN tba ON f.t = tba.s
  WHERE f.r <= {k} AND f.c / ((tfa.av + tba.av) / 2.0) >= {threshold}
),
cents AS (
  SELECT vec_id AS centroid, embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id < {n_centroids}
),
aa AS (
  SELECT id, e, centroid,
         row_number() OVER (PARTITION BY id
             ORDER BY list_cosine_similarity(e, cv) DESC, centroid) AS rk
  FROM a CROSS JOIN cents
),
bb AS (
  SELECT id, e, centroid,
         row_number() OVER (PARTITION BY id
             ORDER BY list_cosine_similarity(e, cv) DESC, centroid) AS rk
  FROM b CROSS JOIN cents
),
kf AS (
  SELECT s, t, round(cs, 4) AS c,
         row_number() OVER (PARTITION BY s ORDER BY cs DESC, t) AS r
  FROM (
    SELECT p.id AS s, m.id AS t, list_cosine_similarity(p.e, m.e) AS cs
    FROM (SELECT * FROM aa WHERE rk <= {n_probe}) p
    JOIN (SELECT * FROM bb WHERE rk = 1) m USING (centroid)
  )
),
kb AS (
  SELECT s, t, round(cs, 4) AS c,
         row_number() OVER (PARTITION BY s ORDER BY cs DESC, t) AS r
  FROM (
    SELECT p.id AS s, m.id AS t, list_cosine_similarity(p.e, m.e) AS cs
    FROM (SELECT * FROM bb WHERE rk <= {n_probe}) p
    JOIN (SELECT * FROM aa WHERE rk = 1) m USING (centroid)
  )
),
kfa AS (SELECT s, ({pivot}) / count(*) AS av FROM kf WHERE r <= {k} GROUP BY s),
kba AS (SELECT s, ({pivot}) / count(*) AS av FROM kb WHERE r <= {k} GROUP BY s),
blocked AS (
  SELECT f.s AS src_id, f.t AS tgt_id
  FROM kf f JOIN kfa ON f.s = kfa.s JOIN kba ON f.t = kba.s
  WHERE f.r <= {k} AND f.c / ((kfa.av + kba.av) / 2.0) >= {threshold}
),
resc AS (
  SELECT src_id, tgt_id FROM blocked JOIN truth USING (src_id, tgt_id)
),
c_true AS (SELECT count(*) AS n_true FROM truth),
c_blk AS (SELECT count(*) AS n_blocked FROM blocked),
c_blk_t AS (SELECT count(*) AS n_blocked_true
            FROM blocked JOIN truth USING (src_id, tgt_id)),
c_res AS (SELECT count(*) AS n_rescored FROM resc),
c_res_t AS (SELECT count(*) AS n_rescored_true
            FROM resc JOIN truth USING (src_id, tgt_id))
SELECT CAST({k} AS BIGINT) AS k, {threshold} AS threshold,
       CAST(n_true AS BIGINT) AS n_true,
       CAST(n_blocked AS BIGINT) AS n_blocked,
       CAST(n_blocked_true AS BIGINT) AS n_blocked_true,
       CAST(n_rescored AS BIGINT) AS n_rescored,
       CAST(n_rescored_true AS BIGINT) AS n_rescored_true,
       CASE WHEN n_blocked > 0
            THEN round(n_blocked_true * 1.0 / n_blocked, 6) ELSE 1.0
       END AS precision_blocked,
       CASE WHEN n_rescored > 0
            THEN round(n_rescored_true * 1.0 / n_rescored, 6) ELSE 1.0
       END AS precision_rescored,
       CASE WHEN n_true > 0
            THEN round(n_blocked_true * 1.0 / n_true, 6) ELSE 1.0
       END AS recall_blocked,
       CASE WHEN n_true > 0
            THEN round(n_rescored_true * 1.0 / n_true, 6) ELSE 1.0
       END AS recall_rescored
FROM c_true, c_blk, c_blk_t, c_res, c_res_t
"""


