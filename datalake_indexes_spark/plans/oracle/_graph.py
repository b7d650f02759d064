"""Graph-analytics oracle twins.

Split from the former plans/oracle.py (round 9) — pure rearrangement,
every definition verbatim.  Import surface unchanged via the package
``__init__``.
"""

from __future__ import annotations
from datalake_indexes_spark.functions.text import NULLISH_TOKENS, tokenize_sql
from datalake_indexes_spark.sources.catalog import TESTDATA_LAKE_SPEC, LakeTableSpec

from datalake_indexes_spark.plans.oracle._dedup import dedup_minhash_lsh_sql, dedup_simhash_sql
from datalake_indexes_spark.plans.oracle._profiling import _LINK_PLANT_CTE, _link_domain_cte

def graph_triangles_sql(max_hamming: int = 8) -> str:
    """Triangle twin over the simhash near-dup graph.  Deliberately the
    NAIVE x<y<z three-way join (each triangle has exactly one increasing
    edge ordering) — independent of the engine's degree-oriented
    formulation, same set by construction."""
    return f"""
WITH pairs AS (
  SELECT * FROM ({dedup_simhash_sql(max_hamming=max_hamming)}) __p
),
edges AS (
  SELECT DISTINCT least(doc_id_1, doc_id_2) AS u, greatest(doc_id_1, doc_id_2) AS v
  FROM pairs WHERE doc_id_1 != doc_id_2
)
SELECT e1.u AS node_a, e1.v AS node_b, e2.v AS node_c
FROM edges e1
JOIN edges e2 ON e2.u = e1.v
JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
"""


def graph_pagerank_sql(
    damping: float = 0.85,
    iters: int = 6,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
) -> str:
    """PageRank-over-the-near-dup-graph twin: the edge list is the
    minhash-LSH pair query (reused verbatim as a subquery), symmetrized;
    the power iteration is UNROLLED into ``iters`` chained CTEs — every
    arithmetic step mirrors the Spark operator exactly (contribution =
    rank * (1.0/deg), same association), and the symmetric graph has no
    dangling nodes by construction so the dangling term is exactly 0 on
    both engines."""
    pairs = dedup_minhash_lsh_sql(k=k, bands=bands, threshold=threshold)
    parts = [
        # MATERIALIZED: every unrolled round references edges/deg/nn, and
        # naive CTE inlining would re-run the minhash pair pipeline per
        # round
        f"WITH pairs AS MATERIALIZED (SELECT * FROM ({pairs}) __p)",
        """edges AS MATERIALIZED (
  SELECT doc_id_1 AS src, doc_id_2 AS dst FROM pairs
  UNION ALL
  SELECT doc_id_2 AS src, doc_id_1 AS dst FROM pairs
),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
deg AS MATERIALIZED (SELECT src, count(*) AS d FROM edges GROUP BY src),
r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn)""",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""r{i} AS (
  SELECT nd.node,
         (1.0 - {damping}) / nn.n + {damping} * coalesce(c.s, 0.0) AS rank
  FROM nodes nd CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS node, sum(r.rank * (1.0 / dg.d)) AS s
    FROM edges e JOIN r{i - 1} r ON r.node = e.src JOIN deg dg ON dg.src = e.src
    GROUP BY e.dst
  ) c ON c.node = nd.node
)"""
        )
    body = ",\n".join(parts)
    return f"""
{body}
SELECT node AS doc_id, round(rank, 8) AS rank FROM r{iters}
"""


def graph_link_prediction_sql(max_hamming: int = 8) -> str:
    """Link-prediction twin over the simhash near-dup graph.  Same wedge
    self-join on the pivot node; the engine's hub cap is off for the
    graded key so both sides enumerate every wedge.  DuckDB ``/`` on
    integers is float division and ``ln`` is the natural log, matching
    Spark's ``F.log``."""
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT * FROM ({dedup_simhash_sql(max_hamming=max_hamming)}) __p
),
edges AS MATERIALIZED (
  SELECT DISTINCT least(doc_id_1, doc_id_2) AS u, greatest(doc_id_1, doc_id_2) AS v
  FROM pairs WHERE doc_id_1 != doc_id_2
),
sym AS MATERIALIZED (
  SELECT u AS node, v AS nbr FROM edges
  UNION ALL
  SELECT v AS node, u AS nbr FROM edges
),
deg AS MATERIALIZED (SELECT node, count(*) AS deg FROM sym GROUP BY 1),
wedges AS (
  SELECT s1.nbr AS a, s2.nbr AS b, d.deg AS wdeg
  FROM sym s1
  JOIN sym s2 ON s2.node = s1.node AND s1.nbr < s2.nbr
  JOIN deg d ON d.node = s1.node
),
scored AS (
  SELECT a, b, count(*) AS common_neighbors, sum(1.0 / ln(wdeg)) AS aa
  FROM wedges GROUP BY 1, 2
),
nonadj AS (
  SELECT s.* FROM scored s
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.u = s.a AND e.v = s.b)
)
SELECT n.a AS node_a, n.b AS node_b, n.common_neighbors,
       round(n.common_neighbors / (da.deg + db.deg - n.common_neighbors), 6) AS jaccard,
       round(n.aa, 6) AS adamic_adar
FROM nonadj n
JOIN deg da ON da.node = n.a
JOIN deg db ON db.node = n.b
"""


def graph_kcore_sql(k: int = 2, rounds: int = 4, max_hamming: int = 8) -> str:
    """k-core twin: the same ``rounds`` peel iterations the engine runs
    with its fixed-rounds knob, unrolled as nested CTEs (the pagerank
    oracle's fixed-iteration move applied to peeling).

    Every per-round CTE is MATERIALIZED: each round references the
    previous edge set three times (FROM + two NOT IN), so DuckDB's
    default inline expansion is 3^rounds subplans — at rounds=8 that is
    ~6.5k re-reads of the parquet scan and an fd-exhaustion crash.
    Materialization makes the unrolled chain linear in ``rounds``."""
    parts = []
    for i in range(rounds):
        parts.append(f"""d{i} AS MATERIALIZED (
  SELECT node, count(*) AS deg FROM (
    SELECT u AS node FROM e{i} UNION ALL SELECT v AS node FROM e{i}) __n{i}
  GROUP BY 1
),
low{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE deg < {k}),
e{i + 1} AS MATERIALIZED (
  SELECT u, v FROM e{i}
  WHERE u NOT IN (SELECT node FROM low{i})
    AND v NOT IN (SELECT node FROM low{i})
)""")
    chain = ",\n".join(parts)
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT * FROM ({dedup_simhash_sql(max_hamming=max_hamming)}) __p
),
e0 AS MATERIALIZED (
  SELECT DISTINCT least(doc_id_1, doc_id_2) AS u, greatest(doc_id_1, doc_id_2) AS v
  FROM pairs WHERE doc_id_1 != doc_id_2
),
{chain}
SELECT node, count(*) AS core_degree FROM (
  SELECT u AS node FROM e{rounds} UNION ALL SELECT v AS node FROM e{rounds}) __fin
GROUP BY 1
"""


def graph_label_prop_sql(rounds: int = 6, max_hamming: int = 8) -> str:
    """Label-propagation twin: the engine's fixed-rounds knob unrolled,
    one MATERIALIZED vote+argmax pair per round (same 3^rounds inlining
    hazard as the k-core twin), identical count-desc/label-asc tie rule
    via row_number."""
    parts = []
    for i in range(rounds):
        parts.append(f"""v{i} AS MATERIALIZED (
  SELECT node, label, count(*) AS c FROM (
    SELECT s.node, l.label FROM sym s JOIN l{i} l ON l.node = s.nbr
    UNION ALL
    SELECT node, label FROM l{i}
  ) __v{i} GROUP BY 1, 2
),
l{i + 1} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
    FROM v{i}) __r{i}
  WHERE rn = 1
)""")
    chain = ",\n".join(parts)
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT * FROM ({dedup_simhash_sql(max_hamming=max_hamming)}) __p
),
edges AS MATERIALIZED (
  SELECT DISTINCT least(doc_id_1, doc_id_2) AS u, greatest(doc_id_1, doc_id_2) AS v
  FROM pairs WHERE doc_id_1 != doc_id_2
),
sym AS MATERIALIZED (
  SELECT u AS node, v AS nbr FROM edges
  UNION ALL
  SELECT v AS node, u AS nbr FROM edges
),
l0 AS MATERIALIZED (SELECT DISTINCT node, node AS label FROM sym),
{chain}
SELECT node, label AS community FROM l{rounds}
"""


def graph_modularity_sql(max_hamming: int = 8) -> str:
    """Modularity twin: per-source Q_c = e_c/m − (D_c/2m)² over the
    simhash near-dup graph with document ``source`` as the partition;
    degrees and m both over the both-endpoints-labeled edge set."""
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT * FROM ({dedup_simhash_sql(max_hamming=max_hamming)}) __p
),
edges AS MATERIALIZED (
  SELECT DISTINCT least(doc_id_1, doc_id_2) AS u, greatest(doc_id_1, doc_id_2) AS v
  FROM pairs WHERE doc_id_1 != doc_id_2
),
lab AS (SELECT doc_id AS n, source AS c FROM documents),
both_e AS MATERIALIZED (
  SELECT e.u, e.v, lu.c AS cu, lv.c AS cv
  FROM edges e JOIN lab lu ON lu.n = e.u JOIN lab lv ON lv.n = e.v
),
m AS (SELECT count(*) AS m FROM both_e),
intra AS (
  SELECT cu AS community, count(*) AS intra_edges
  FROM both_e WHERE cu = cv GROUP BY 1
),
sym AS (
  SELECT u AS node, cu AS c FROM both_e
  UNION ALL
  SELECT v AS node, cv AS c FROM both_e
),
degm AS (
  SELECT c AS community, count(*) AS degree_sum, count(DISTINCT node) AS n_nodes
  FROM sym GROUP BY 1
)
SELECT d.community, d.n_nodes,
       coalesce(i.intra_edges, 0) AS intra_edges, d.degree_sum,
       round(coalesce(i.intra_edges, 0) * 1.0 / m.m
             - pow(d.degree_sum / (2.0 * m.m), 2), 6) AS contribution
FROM degm d LEFT JOIN intra i ON i.community = d.community, m
"""


def graph_hits_sql(iters: int = 4) -> str:
    """HITS twin over the planted link graph: same distinct 0/1
    adjacency, same L1-normalize-authority-then-hub round structure as
    :func:`..operators.graph.hits`, unrolled into ``iters`` chained CTE
    rounds like the pagerank twin."""
    parts = [
        f"WITH {_LINK_PLANT_CTE}",
        _link_domain_cte(),
        """edges AS MATERIALIZED (
  SELECT DISTINCT CAST(doc_id AS VARCHAR) AS src, link_domain AS dst FROM links
),
nodes AS MATERIALIZED (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
),
s0 AS (SELECT node, 1.0 AS hub FROM nodes)""",
    ]
    for i in range(1, iters + 1):
        prev = f"s{i - 1}"
        parts.append(
            # every per-round CTE is MATERIALIZED: the scalar-subquery
            # normalizer references its _raw twin a second time, and
            # inlining would re-evaluate the whole previous round per
            # reference — exponential across rounds
            f"""a{i}_raw AS MATERIALIZED (
  SELECT nd.node, coalesce(x.s, 0.0) AS v
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node, sum(h.hub) AS s
    FROM edges e JOIN {prev} h ON h.node = e.src GROUP BY e.dst
  ) x ON x.node = nd.node
),
a{i} AS MATERIALIZED (
  SELECT node, v / (SELECT sum(v) FROM a{i}_raw) AS auth FROM a{i}_raw
),
h{i}_raw AS MATERIALIZED (
  SELECT nd.node, coalesce(x.s, 0.0) AS v
  FROM nodes nd LEFT JOIN (
    SELECT e.src AS node, sum(a.auth) AS s
    FROM edges e JOIN a{i} a ON a.node = e.dst GROUP BY e.src
  ) x ON x.node = nd.node
),
s{i} AS MATERIALIZED (
  SELECT h.node, h.v / (SELECT sum(v) FROM h{i}_raw) AS hub, a.auth
  FROM h{i}_raw h JOIN a{i} a ON a.node = h.node
)"""
        )
    body = ",\n".join(parts)
    return f"""
{body}
SELECT node, round(hub, 8) AS hub, round(auth, 8) AS authority FROM s{iters}
"""


def graph_ppr_sql(
    seed_modulus: int = 10,
    damping: float = 0.85,
    iters: int = 6,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
) -> str:
    """Personalized-PageRank twin over the near-dup graph: same
    data-driven seed set (node % modulus == 0), same
    (1-d)·p0 + d·(contrib + dm·p0) update, unrolled rounds."""
    pairs = dedup_minhash_lsh_sql(k=k, bands=bands, threshold=threshold)
    d = repr(float(damping))
    parts = [
        f"WITH pairs AS MATERIALIZED (SELECT * FROM ({pairs}) __p)",
        f"""edges AS MATERIALIZED (
  SELECT doc_id_1 AS src, doc_id_2 AS dst FROM pairs
  UNION ALL
  SELECT doc_id_2 AS src, doc_id_1 AS dst FROM pairs
),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
ns AS MATERIALIZED (
  SELECT CAST(count(*) FILTER (WHERE node % {seed_modulus} = 0) AS DOUBLE) AS s
  FROM nodes
),
deg AS MATERIALIZED (SELECT src, count(*) AS dg FROM edges GROUP BY src),
r0 AS (
  SELECT node,
         CASE WHEN node % {seed_modulus} = 0 THEN 1.0 / ns.s ELSE 0.0 END AS rank
  FROM nodes, ns
)""",
    ]
    # the symmetric near-dup graph has no dangling nodes, so dm = 0 every
    # round on both engines — the dm·p0 term stays in the engine for
    # general graphs but is exactly zero here
    for i in range(1, iters + 1):
        parts.append(
            f"""r{i} AS MATERIALIZED (
  SELECT nd.node,
         (1.0 - CAST({d} AS DOUBLE)) * (CASE WHEN nd.node % {seed_modulus} = 0
                             THEN 1.0 / ns.s ELSE 0.0 END)
           + {d} * coalesce(c.s, 0.0) AS rank
  FROM nodes nd CROSS JOIN ns
  LEFT JOIN (
    SELECT e.dst AS node, sum(r.rank * (1.0 / dg.dg)) AS s
    FROM edges e JOIN r{i - 1} r ON r.node = e.src JOIN deg dg ON dg.src = e.src
    GROUP BY e.dst
  ) c ON c.node = nd.node
)"""
        )
    body = ",\n".join(parts)
    return f"""
{body}
SELECT node AS doc_id, round(rank, 8) AS rank FROM r{iters}
"""


def graph_clustering_sql(max_hamming: int = 8) -> str:
    """Clustering-coefficient twin: the naive triangle query reused
    verbatim, exploded per corner, joined onto the degree census."""
    tri = graph_triangles_sql(max_hamming=max_hamming)
    return f"""
WITH tri AS MATERIALIZED (SELECT * FROM ({tri}) __t),
edges AS MATERIALIZED (
  SELECT DISTINCT least(doc_id_1, doc_id_2) AS u, greatest(doc_id_1, doc_id_2) AS v
  FROM ({dedup_simhash_sql(max_hamming=max_hamming)}) __p
  WHERE doc_id_1 != doc_id_2
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
  ) GROUP BY node
),
per_node AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
    SELECT node_a AS node FROM tri
    UNION ALL SELECT node_b FROM tri
    UNION ALL SELECT node_c FROM tri
  ) GROUP BY node
)
SELECT d.node, d.degree,
       coalesce(p.n_triangles, 0) AS n_triangles,
       CASE WHEN d.degree >= 2
            THEN round(2.0 * coalesce(p.n_triangles, 0)
                       / (d.degree * 1.0 * (d.degree - 1)), 6)
            ELSE 0.0 END AS local_cc
FROM deg d LEFT JOIN per_node p ON p.node = d.node
"""


