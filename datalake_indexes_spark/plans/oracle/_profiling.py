"""Column profiling / web hygiene / governance oracle twins.

Split from the former plans/oracle.py (round 9) — pure rearrangement,
every definition verbatim.  Import surface unchanged via the package
``__init__``.
"""

from __future__ import annotations
from datalake_indexes_spark.functions.text import NULLISH_TOKENS, tokenize_sql
from datalake_indexes_spark.sources.catalog import TESTDATA_LAKE_SPEC, LakeTableSpec

from datalake_indexes_spark.plans.oracle._common import _NUMERIC_TOKEN, cells_cte

def column_top_values_sql(k: int = 3, min_count: int = 2) -> str:
    """Heavy-hitter twin: per-column token counts pruned at min_count,
    ranked count-desc / token-asc."""
    return f"""
WITH {cells_cte()},
counts AS (
  SELECT table_id, col_id, tokenized AS token, count(*) AS cnt
  FROM cells GROUP BY table_id, col_id, tokenized
  HAVING count(*) >= {min_count}
)
SELECT table_id, col_id, token, cnt,
       CAST(row_number() OVER (PARTITION BY table_id, col_id
                               ORDER BY cnt DESC, token) AS INT) AS rank
FROM counts
QUALIFY rank <= {k}
"""


def functional_deps_sql(min_det_distinct: int = 2) -> str:
    """Exact FD-profiling twin: cells self-joined on the row key, one
    distinct-count per determinant value, bool-and per column pair."""
    return f"""
WITH {cells_cte()},
per_lhs AS (
  SELECT a.table_id, a.col_id AS det_col, b.col_id AS dep_col,
         a.tokenized AS lv, count(DISTINCT b.tokenized) AS n_dep
  FROM cells a JOIN cells b
    ON a.table_id = b.table_id AND a.row_id = b.row_id AND a.col_id != b.col_id
  GROUP BY 1, 2, 3, 4
)
SELECT table_id, det_col, dep_col,
       CAST(count(*) AS BIGINT) AS n_det_distinct,
       bool_and(n_dep = 1) AS holds
FROM per_lhs GROUP BY 1, 2, 3
HAVING count(*) >= {min_det_distinct}
"""


def inclusion_deps_sql(
    min_distinct: int = 5,
    min_containment: float = 0.8,
    max_token_cols: int = 64,
) -> str:
    """Inclusion-dependency twin over the same capped distinct-token
    universe."""
    return f"""
WITH {cells_cte()},
d AS (SELECT DISTINCT table_id, col_id, tokenized FROM cells),
spread AS (
  SELECT tokenized FROM d GROUP BY tokenized HAVING count(*) <= {max_token_cols}
),
c AS (SELECT d.* FROM d JOIN spread USING (tokenized)),
cc AS (SELECT table_id, col_id, count(*) AS n_distinct FROM c GROUP BY 1, 2),
common AS (
  SELECT a.table_id AS table_a, a.col_id AS col_a,
         b.table_id AS table_b, b.col_id AS col_b,
         count(*) AS n_common
  FROM c a JOIN c b
    ON a.tokenized = b.tokenized AND a.table_id != b.table_id
  GROUP BY 1, 2, 3, 4
)
SELECT table_a, col_a, table_b, col_b,
       cc.n_distinct AS n_distinct_a, n_common,
       round(n_common / CAST(cc.n_distinct AS DOUBLE), 4) AS containment
FROM common
JOIN cc ON cc.table_id = common.table_a AND cc.col_id = common.col_a
WHERE cc.n_distinct >= {min_distinct}
  AND n_common / CAST(cc.n_distinct AS DOUBLE) >= {min_containment}
"""


def profile_drift_sql(nbins: int = 10, shift: int = 50) -> str:
    """Twin of :func:`..operators.cocoa.profile_drift` over the planted
    supplier shift.  The twin skips tokenization deliberately: the
    drifted columns are integers whose tokenized form round-trips to the
    same double, so computing from the raw tables is an INDEPENDENT
    derivation of the same histogram — agreement proves the engine's
    tokenize→parse→bucket chain, not a shared shortcut."""
    va = f"""
  SELECT 1 AS table_id, 0 AS col_id, CAST(n_nationkey AS DOUBLE) AS v FROM nation
  UNION ALL SELECT 1, 2, CAST(n_regionkey AS DOUBLE) FROM nation
  UNION ALL SELECT 3, 0, CAST(s_suppkey AS DOUBLE) FROM supplier
  UNION ALL SELECT 3, 2, CAST(s_nationkey AS DOUBLE) FROM supplier"""
    vb = va.replace("CAST(s_suppkey AS DOUBLE)",
                    f"CAST(s_suppkey + {shift} AS DOUBLE)")
    return f"""
WITH va AS ({va}),
vb AS ({vb}),
bounds AS (
  SELECT a.table_id, a.col_id,
         least(a.lo, b.lo) AS lo, greatest(a.hi, b.hi) AS hi
  FROM (SELECT table_id, col_id, min(v) AS lo, max(v) AS hi
        FROM va GROUP BY 1, 2) a
  JOIN (SELECT table_id, col_id, min(v) AS lo, max(v) AS hi
        FROM vb GROUP BY 1, 2) b USING (table_id, col_id)
),
ha AS (
  SELECT v.table_id, v.col_id,
         CASE WHEN (bo.hi - bo.lo) / {nbins} > 0
              THEN least(CAST(floor((v.v - bo.lo) / ((bo.hi - bo.lo) / {nbins}))
                         AS INT), {nbins - 1})
              ELSE 0 END AS b,
         count(*) AS n_a
  FROM va v JOIN bounds bo USING (table_id, col_id) GROUP BY 1, 2, 3
),
hb AS (
  SELECT v.table_id, v.col_id,
         CASE WHEN (bo.hi - bo.lo) / {nbins} > 0
              THEN least(CAST(floor((v.v - bo.lo) / ((bo.hi - bo.lo) / {nbins}))
                         AS INT), {nbins - 1})
              ELSE 0 END AS b,
         count(*) AS n_b
  FROM vb v JOIN bounds bo USING (table_id, col_id) GROUP BY 1, 2, 3
),
j AS (
  SELECT coalesce(ha.table_id, hb.table_id) AS table_id,
         coalesce(ha.col_id, hb.col_id) AS col_id,
         coalesce(ha.b, hb.b) AS b,
         coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
  FROM ha FULL OUTER JOIN hb
    ON ha.table_id = hb.table_id AND ha.col_id = hb.col_id AND ha.b = hb.b
),
tot AS (
  SELECT table_id, col_id, sum(n_a) AS n_a, sum(n_b) AS n_b
  FROM j GROUP BY 1, 2
)
SELECT j.table_id, j.col_id,
       CAST(t.n_a AS BIGINT) AS n_a, CAST(t.n_b AS BIGINT) AS n_b,
       round(sum(abs(j.n_a * 1.0 / t.n_a - j.n_b * 1.0 / t.n_b)) / 2.0, 4)
         AS tv_distance
FROM j JOIN tot t USING (table_id, col_id)
GROUP BY 1, 2, t.n_a, t.n_b
"""


def column_minhash_sql(k: int = 16, max_token_cols: int = 64) -> str:
    """Twin of :func:`..operators.discovery.column_minhash_signatures`
    (signature joined to one string for grading): same j-prefixed md5
    family over the same capped distinct-token universe."""
    mins = ", ".join(
        f"min(md5('{j}:' || tokenized)) AS m{j}" for j in range(k)
    )
    sig = " || ',' || ".join(f"m{j}" for j in range(k))
    return f"""
WITH {cells_cte()},
d AS (SELECT DISTINCT table_id, col_id, tokenized FROM cells),
spread AS (
  SELECT tokenized FROM d GROUP BY tokenized HAVING count(*) <= {max_token_cols}
),
c AS (SELECT d.* FROM d JOIN spread USING (tokenized)),
m AS (
  SELECT table_id, col_id, {mins}, count(*) AS n_distinct
  FROM c GROUP BY 1, 2
)
SELECT table_id, col_id, {sig} AS sig, n_distinct FROM m
"""


def column_histograms_sql(nbins: int = 10) -> str:
    """Equi-width histogram twin: identical closed-form bucket
    arithmetic over identical min/max doubles."""
    return f"""
WITH {cells_cte()},
flags AS (
  SELECT table_id, col_id, bool_and({_NUMERIC_TOKEN}) AS is_numeric
  FROM cells GROUP BY table_id, col_id
),
nc AS (
  SELECT cells.table_id, cells.col_id,
         CASE WHEN tokenized NOT IN ('', 'nan')
                   AND NOT isnan(TRY_CAST(tokenized AS DOUBLE))
              THEN TRY_CAST(tokenized AS DOUBLE) END AS val
  FROM cells JOIN flags f
    ON f.table_id = cells.table_id AND f.col_id = cells.col_id
  WHERE f.is_numeric
),
nn AS (SELECT * FROM nc WHERE val IS NOT NULL),
st AS (SELECT table_id, col_id, min(val) AS lo, max(val) AS hi
       FROM nn GROUP BY 1, 2),
b AS (
  SELECT nn.table_id, nn.col_id,
         CASE WHEN (st.hi - st.lo) / {nbins} > 0
              THEN CAST(least(floor((nn.val - st.lo) / ((st.hi - st.lo) / {nbins})),
                              {nbins - 1}) AS INT)
              ELSE 0 END AS bucket,
         st.lo, st.hi
  FROM nn JOIN st ON st.table_id = nn.table_id AND st.col_id = nn.col_id
)
SELECT table_id, col_id, bucket,
       round(lo + bucket * (hi - lo) / {nbins}, 6) AS bucket_lo,
       count(*) AS n
FROM b GROUP BY table_id, col_id, bucket, lo, hi
"""


def union_search_sql(
    query_table_id: int,
    k: int = 10,
    min_distinct: int = 5,
    min_jaccard: float = 0.2,
    max_token_cols: int = 64,
) -> str:
    """Union-search twin: same capped distinct-token universe, same
    per-column Jaccard, same best-match-per-query-column aggregation."""
    return f"""
WITH {cells_cte()},
d AS (SELECT DISTINCT table_id, col_id, tokenized FROM cells),
spread AS (
  SELECT tokenized FROM d GROUP BY tokenized HAVING count(*) <= {max_token_cols}
),
c AS (SELECT d.* FROM d JOIN spread USING (tokenized)),
cc AS (SELECT table_id, col_id, count(*) AS n FROM c GROUP BY 1, 2),
q AS (SELECT col_id AS q_col, tokenized FROM c WHERE table_id = {query_table_id}),
qc AS (SELECT col_id AS q_col, n AS qn FROM cc WHERE table_id = {query_table_id}),
common AS (
  SELECT q.q_col, c.table_id, c.col_id, count(*) AS com
  FROM c JOIN q USING (tokenized)
  WHERE c.table_id != {query_table_id}
  GROUP BY 1, 2, 3
),
pairs AS (
  SELECT common.q_col, common.table_id,
         com / CAST(qc.qn + cc.n - com AS DOUBLE) AS jac
  FROM common
  JOIN qc ON qc.q_col = common.q_col
  JOIN cc ON cc.table_id = common.table_id AND cc.col_id = common.col_id
  WHERE qc.qn >= {min_distinct} AND cc.n >= {min_distinct}
    AND com / CAST(qc.qn + cc.n - com AS DOUBLE) >= {min_jaccard}
),
best AS (SELECT q_col, table_id, max(jac) AS b FROM pairs GROUP BY 1, 2),
ranked AS (
  SELECT table_id, count(*) AS n_matched_cols, round(sum(b), 4) AS score
  FROM best GROUP BY table_id
)
SELECT table_id, n_matched_cols, score,
       CAST(row_number() OVER (ORDER BY score DESC, table_id) AS INT) AS rank
FROM ranked
QUALIFY rank <= {k}
"""


def union_search_recall_sql(
    query_table_id: int,
    k: int = 10,
    min_distinct: int = 5,
    min_jaccard: float = 0.2,
    max_token_cols: int = 64,
) -> str:
    """Recall-gauge twin: the union-search twin reused verbatim as two
    derived tables — uncapped truth (spread cap lifted via an
    unreachable bound) vs the capped default — joined on table_id."""
    uncapped = union_search_sql(
        query_table_id, k, min_distinct, min_jaccard, max_token_cols=1 << 62
    )
    capped = union_search_sql(
        query_table_id, k, min_distinct, min_jaccard, max_token_cols
    )
    return f"""
WITH truth AS (SELECT table_id FROM ({uncapped}) __t),
capped AS (SELECT table_id FROM ({capped}) __c),
h AS (SELECT count(*) AS n_found FROM truth JOIN capped USING (table_id)),
t AS (SELECT count(*) AS n_truth FROM truth)
SELECT CAST({k} AS BIGINT) AS k,
       CAST({max_token_cols} AS BIGINT) AS max_token_cols,
       CAST(t.n_truth AS BIGINT) AS n_truth,
       CAST(h.n_found AS BIGINT) AS n_found,
       CASE WHEN t.n_truth > 0
            THEN round(h.n_found / CAST(t.n_truth AS DOUBLE), 6)
            ELSE 1.0 END AS recall
FROM t CROSS JOIN h
"""


def column_outliers_sql(k_iqr: float = 1.5) -> str:
    """Tukey-fence twin: quantile_cont matches Spark's exact percentile
    (linear interpolation), fences in identical arithmetic."""
    return f"""
WITH {cells_cte()},
flags AS (
  SELECT table_id, col_id, bool_and({_NUMERIC_TOKEN}) AS is_numeric
  FROM cells GROUP BY table_id, col_id
),
nn AS (
  SELECT cells.table_id, cells.col_id, TRY_CAST(tokenized AS DOUBLE) AS val
  FROM cells JOIN flags f
    ON f.table_id = cells.table_id AND f.col_id = cells.col_id
  WHERE f.is_numeric AND tokenized NOT IN ('', 'nan')
    AND NOT isnan(TRY_CAST(tokenized AS DOUBLE))
),
q AS (
  SELECT table_id, col_id,
         quantile_cont(val, 0.25) AS q1r, quantile_cont(val, 0.75) AS q3r
  FROM nn GROUP BY 1, 2
),
fenced AS (
  SELECT table_id, col_id, q1r, q3r,
         q1r - {k_iqr} * (q3r - q1r) AS lo,
         q3r + {k_iqr} * (q3r - q1r) AS hi
  FROM q
)
SELECT nn.table_id, nn.col_id,
       round(any_value(q1r), 6) AS q1,
       round(any_value(q3r), 6) AS q3,
       round(any_value(lo), 6) AS lo_fence,
       round(any_value(hi), 6) AS hi_fence,
       count(*) FILTER (WHERE nn.val < lo OR nn.val > hi) AS n_outliers,
       count(*) AS n_values
FROM nn JOIN fenced ON fenced.table_id = nn.table_id AND fenced.col_id = nn.col_id
GROUP BY nn.table_id, nn.col_id
"""


def domain_clusters_sql(
    rounds: int = 8,
    min_distinct: int = 5,
    min_jaccard: float = 0.2,
    max_token_cols: int = 64,
) -> str:
    """Domain-cluster twin: same capped-universe Jaccard edges, same
    ``rounds`` synchronous min-label iterations unrolled as CTEs."""
    head = f"""WITH {cells_cte()},
d AS (SELECT DISTINCT table_id, col_id, tokenized FROM cells),
spread AS (
  SELECT tokenized FROM d GROUP BY tokenized HAVING count(*) <= {max_token_cols}
),
c AS (SELECT d.* FROM d JOIN spread USING (tokenized)),
cc AS (SELECT table_id, col_id, count(*) AS n FROM c GROUP BY 1, 2),
common AS (
  SELECT a.table_id AS table_a, a.col_id AS col_a,
         b.table_id AS table_b, b.col_id AS col_b, count(*) AS com
  FROM c a JOIN c b
    ON a.tokenized = b.tokenized AND a.table_id != b.table_id
  GROUP BY 1, 2, 3, 4
),
pairs AS (
  SELECT DISTINCT table_a, table_b
  FROM common
  JOIN cc ca ON ca.table_id = common.table_a AND ca.col_id = common.col_a
  JOIN cc cb ON cb.table_id = common.table_b AND cb.col_id = common.col_b
  WHERE ca.n >= {min_distinct} AND cb.n >= {min_distinct}
    AND com / CAST(ca.n + cb.n - com AS DOUBLE) >= {min_jaccard}
),
edges AS MATERIALIZED (
  SELECT table_a, table_b FROM pairs
  UNION SELECT table_b, table_a FROM pairs
),
nodes AS MATERIALIZED (SELECT DISTINCT table_id FROM cells),
l0 AS MATERIALIZED (SELECT table_id, table_id AS domain FROM nodes)"""
    rounds_sql = []
    for i in range(1, rounds + 1):
        rounds_sql.append(
            f"""l{i} AS MATERIALIZED (
  SELECT l.table_id, least(l.domain, coalesce(nb.nbr, l.domain)) AS domain
  FROM l{i - 1} l LEFT JOIN (
    SELECT e.table_a AS table_id, min(l2.domain) AS nbr
    FROM edges e JOIN l{i - 1} l2 ON l2.table_id = e.table_b
    GROUP BY e.table_a
  ) nb ON nb.table_id = l.table_id
)"""
        )
    return (
        head + ",\n" + ",\n".join(rounds_sql)
        + f"\nSELECT table_id, domain FROM l{rounds}\n"
    )


def union_search_approx_sql(
    query_table_id: int,
    k: int = 10,
    sig_k: int = 32,
    bands: int = 8,
    min_distinct: int = 5,
    min_jaccard: float = 0.2,
    max_token_cols: int = 64,
) -> str:
    """Sketch-union-search twin: the j-prefixed md5 MinHash family is
    deterministic, so DuckDB recomputes the identical per-column
    signatures, band keys, and agreement estimates."""
    rows = sig_k // bands
    mins = ",\n         ".join(
        f"min(md5('{j}:' || tokenized)) AS m{j}" for j in range(sig_k)
    )
    band_selects = "\n  UNION ALL\n".join(
        "  SELECT table_id, col_id, {b} AS band, {key} AS key FROM sigs".format(
            b=b,
            key=" || '|' || ".join(f"m{j}" for j in range(b * rows, (b + 1) * rows)),
        )
        for b in range(bands)
    )
    agree = " + ".join(
        f"(CASE WHEN s.m{j} = q.m{j} THEN 1 ELSE 0 END)" for j in range(sig_k)
    )
    return f"""
WITH {cells_cte()},
d AS (SELECT DISTINCT table_id, col_id, tokenized FROM cells),
spread AS (
  SELECT tokenized FROM d GROUP BY tokenized HAVING count(*) <= {max_token_cols}
),
c AS (SELECT d.* FROM d JOIN spread USING (tokenized)),
sigs AS MATERIALIZED (
  SELECT table_id, col_id,
         {mins}
  FROM c GROUP BY table_id, col_id
  HAVING count(*) >= {min_distinct}
),
bands_t AS MATERIALIZED (
{band_selects}
),
cand AS (
  SELECT DISTINCT s.table_id, s.col_id, q.col_id AS q_col
  FROM bands_t s
  JOIN bands_t q ON q.band = s.band AND q.key = s.key
  WHERE q.table_id = {query_table_id} AND s.table_id != {query_table_id}
),
est AS (
  SELECT cand.q_col, cand.table_id,
         ({agree}) / CAST({sig_k} AS DOUBLE) AS jac
  FROM cand
  JOIN sigs s ON s.table_id = cand.table_id AND s.col_id = cand.col_id
  JOIN sigs q ON q.table_id = {query_table_id} AND q.col_id = cand.q_col
),
best AS (
  SELECT q_col, table_id, max(jac) AS b
  FROM est WHERE jac >= {min_jaccard} GROUP BY 1, 2
),
ranked AS (
  SELECT table_id, count(*) AS n_matched_cols, round(sum(b), 4) AS score
  FROM best GROUP BY table_id
)
SELECT table_id, n_matched_cols, score,
       CAST(row_number() OVER (ORDER BY score DESC, table_id) AS INT) AS rank
FROM ranked
QUALIFY rank <= {k}
"""


def fuzzy_join_names_sql(max_distance: int = 1) -> str:
    """Twin of :func:`..operators.fuzzy.fuzzy_join` over the customer-name
    self-join — the oracle is the NAIVE cross join, so a green run proves
    the positional-q-gram blocking loses no true pair."""
    return f"""
SELECT c1.c_custkey AS a_id, c2.c_custkey AS b_id,
       c1.c_name AS left_value, c2.c_name AS right_value,
       levenshtein(c1.c_name, c2.c_name) AS distance
FROM customer c1 JOIN customer c2 ON c1.c_custkey < c2.c_custkey
WHERE levenshtein(c1.c_name, c2.c_name) <= {max_distance}
"""


def entity_resolution_sql(max_distance: int = 1) -> str:
    """Twin of :func:`..operators.fuzzy.entity_resolution` on customer
    names: naive fuzzy pairs + recursive transitive closure; singletons
    resolve to themselves."""
    return f"""
WITH RECURSIVE pairs AS (
  SELECT c1.c_custkey AS a, c2.c_custkey AS b
  FROM customer c1 JOIN customer c2 ON c1.c_custkey < c2.c_custkey
  WHERE levenshtein(c1.c_name, c2.c_name) <= {max_distance}
),
edges AS (
  SELECT a, b FROM pairs UNION SELECT b, a FROM pairs
),
reach(node, r) AS (
  SELECT a, b FROM edges
  UNION
  SELECT re.node, e.b FROM reach re JOIN edges e ON e.a = re.r
),
reps AS (
  SELECT node, least(node, min(r)) AS representative
  FROM reach GROUP BY node
)
SELECT c.c_custkey, c.c_name AS value,
       coalesce(rp.representative, c.c_custkey) AS entity_id
FROM customer c LEFT JOIN reps rp ON rp.node = c.c_custkey
"""


def k_anonymity_sql(k: int = 10) -> str:
    """Twin of :func:`..operators.discovery.k_anonymity_report` over
    customer (QI = nation + segment, sensitive = account balance)."""
    return f"""
SELECT concat_ws('|', CAST(c_nationkey AS VARCHAR), c_mktsegment) AS qi_value,
       count(*) AS group_size,
       count(DISTINCT c_acctbal) AS n_sensitive,
       (count(*) < {k} OR count(DISTINCT c_acctbal) <= 1) AS at_risk
FROM customer GROUP BY 1
"""


def k_suppress_sql(k: int = 10) -> str:
    """Twin of :func:`..operators.discovery.suppress_small_groups` on
    customer (QI = nation + segment)."""
    return f"""
WITH sz AS (
  SELECT concat_ws('|', CAST(c_nationkey AS VARCHAR), c_mktsegment) AS qi,
         count(*) AS n
  FROM customer GROUP BY 1
)
SELECT c.c_custkey, c.c_name,
       CASE WHEN s.n < {k} THEN '*'
            ELSE CAST(c.c_nationkey AS VARCHAR) END AS c_nationkey,
       c.c_acctbal,
       CASE WHEN s.n < {k} THEN '*' ELSE c.c_mktsegment END AS c_mktsegment,
       (s.n < {k}) AS suppressed
FROM customer c
JOIN sz s
  ON s.qi = concat_ws('|', CAST(c.c_nationkey AS VARCHAR), c.c_mktsegment)
"""


def dp_counts_sql(epsilon: float = 1.0, seed: str = "dp") -> str:
    """Twin of :func:`..operators.discovery.dp_group_counts`: identical
    md5-seeded inverse-CDF Laplace draw per class."""
    return f"""
WITH counts AS (
  SELECT concat_ws('|', CAST(c_nationkey AS VARCHAR), c_mktsegment)
           AS group_value,
         count(*) AS n
  FROM customer GROUP BY 1
),
noise AS (
  SELECT group_value, n,
         ((('0x' || substring(md5('{seed}|' || group_value), 1, 8))::BIGINT
            + 0.5) / 4294967296.0) - 0.5 AS c
  FROM counts
)
SELECT group_value,
       greatest(CAST(0 AS BIGINT),
                CAST(round(n + (-(1.0 / {epsilon}) * sign(c)
                                * ln(1 - 2 * abs(c))) + 1e-9) AS BIGINT))
         AS noisy_count
FROM noise
"""


def dp_sums_sql(
    lo: float = 0.0, hi: float = 10_000.0,
    epsilon: float = 1.0, seed: str = "dp-sum",
) -> str:
    """Twin of :func:`..operators.discovery.dp_group_sums`."""
    sens = max(abs(lo), abs(hi))
    return f"""
WITH sums AS (
  SELECT concat_ws('|', CAST(c_nationkey AS VARCHAR), c_mktsegment)
           AS group_value,
         sum(least(greatest(CAST(c_acctbal AS DOUBLE), {lo}), {hi})) AS s
  FROM customer GROUP BY 1
),
noise AS (
  SELECT group_value, s,
         ((('0x' || substring(md5('{seed}|' || group_value), 1, 8))::BIGINT
            + 0.5) / 4294967296.0) - 0.5 AS c
  FROM sums
)
SELECT group_value,
       round(s + (-({sens} / {epsilon}) * sign(c) * ln(1 - 2 * abs(c)))
             + 1e-9, 4) AS noisy_sum
FROM noise
"""


def winsorize_stats_sql(p_low: float = 0.01, p_high: float = 0.99) -> str:
    """Twin of the winsorize grading query: post-clamp summary stats per
    column over lineitem (quantile_cont matches Spark's exact
    percentile)."""
    cols = ["l_quantity", "l_extendedprice"]
    parts = []
    for c in cols:
        parts.append(f"""
SELECT '{c}' AS column_name,
       round(b.lo, 6) AS lo, round(b.hi, 6) AS hi,
       count(*) FILTER (l.{c} < b.lo) AS n_clipped_low,
       count(*) FILTER (l.{c} > b.hi) AS n_clipped_high,
       round(avg(least(greatest(l.{c}, b.lo), b.hi)), 6) AS mean_after
FROM lineitem l,
     (SELECT quantile_cont({c}, {p_low}) AS lo,
             quantile_cont({c}, {p_high}) AS hi FROM lineitem) b
GROUP BY b.lo, b.hi""")
    return " UNION ALL ".join(parts)


_URL_PLANT_CTE = """
u AS (
  SELECT doc_id, n_chars,
         CASE CAST(doc_id % 4 AS INTEGER)
           WHEN 0 THEN 'HTTP://WWW.' || source || '.Example.com:80/docs/'
                       || CAST(doc_id AS VARCHAR) || '?utm_source=rss&b=2&a=1#top'
           WHEN 1 THEN 'https://cdn.' || source || '.example.net/a/b/'
                       || CAST(doc_id AS VARCHAR)
           WHEN 2 THEN 'https://' || source || '.example.co.uk:8443/x?id='
                       || CAST(doc_id AS VARCHAR) || '&fbclid=abc'
           ELSE 'http://10.0.' || CAST(doc_id % 200 AS VARCHAR) || '.9/raw/'
                || CAST(doc_id AS VARCHAR) || '?z=1&y=2'
         END AS url
  FROM documents
)"""


def _web_parsed_cte() -> str:
    """Shared parse/canonicalize CTE chain replicating
    :func:`..operators.web.canonicalize_urls` component by component
    (same regexes via the shared module constants)."""
    from datalake_indexes_spark.operators import web

    return f"""
parsed AS (
  SELECT doc_id, n_chars,
         lower(regexp_extract(url, '{web._SCHEME_RE}', 1)) AS scheme,
         regexp_replace(
           lower(regexp_extract(regexp_extract(url, '{web._AUTH_RE}', 1),
                                '{web._HOST_RE}', 1)),
           '^www\\.', '') AS host,
         regexp_extract(regexp_extract(url, '{web._AUTH_RE}', 1),
                        '{web._PORT_RE}', 1) AS port,
         regexp_extract(url, '{web._PATH_RE}', 1) AS path,
         regexp_extract(url, '{web._QUERY_RE}', 1) AS query
  FROM u
),
par AS (
  SELECT *, list_filter(string_split(query, '&'), x -> x <> '') AS params
  FROM parsed
),
kep AS (
  SELECT *, list_filter(params,
                        x -> NOT regexp_matches(x, '{web.TRACKING_PARAM_REGEX}')) AS kept,
         string_split(host, '.') AS labels
  FROM par
),
canon AS (
  SELECT doc_id, n_chars, host,
         scheme || '://' || host
         || CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                      OR (scheme = 'https' AND port = '443')
                 THEN '' ELSE ':' || port END
         || CASE WHEN path = '' THEN '/' ELSE path END
         || CASE WHEN len(kept) = 0
                 THEN '' ELSE '?' || array_to_string(list_sort(kept), '&') END
           AS canonical_url,
         CASE WHEN regexp_matches(host, '{web._IPV4_RE}') THEN host
              WHEN len(labels) >= 3
                   AND list_contains({list(web.SECOND_LEVEL_LABELS)}, labels[-2])
                THEN array_to_string(
                       list_slice(labels, len(labels) - 2, len(labels)), '.')
              WHEN len(labels) >= 2
                THEN array_to_string(
                       list_slice(labels, len(labels) - 1, len(labels)), '.')
              ELSE host END AS registered_domain,
         CAST(len(params) - len(kept) AS BIGINT) AS n_params_dropped
  FROM kep
)"""


def web_canonical_sql() -> str:
    """Twin of :func:`..operators.web.canonicalize_urls` over the
    deterministically planted URL column."""
    return f"""
WITH {_URL_PLANT_CTE},
{_web_parsed_cte()}
SELECT doc_id, canonical_url, registered_domain, host, n_params_dropped
FROM canon
"""


def web_domain_stats_sql() -> str:
    """Twin of :func:`..operators.web.domain_stats`."""
    return f"""
WITH {_URL_PLANT_CTE},
{_web_parsed_cte()}
SELECT registered_domain,
       count(*) AS n_docs,
       count(DISTINCT host) AS n_hosts,
       CAST(sum(n_chars) AS BIGINT) AS n_chars
FROM canon GROUP BY registered_domain
"""


def web_blocklist_sql(blocked: list[str]) -> str:
    """Twin of :func:`..operators.web.filter_blocklist`."""
    in_list = ", ".join(f"'{d}'" for d in blocked)
    return f"""
WITH {_URL_PLANT_CTE},
{_web_parsed_cte()}
SELECT doc_id, registered_domain
FROM canon WHERE registered_domain NOT IN ({in_list})
"""


def export_shard_manifest_sql(n_shards: int = 8) -> str:
    """Twin of :func:`..sources.export.shard_manifest` — same md5 bucket
    rule as hash_split, mod n_shards."""
    return f"""
SELECT shard_id, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
FROM (
  SELECT CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              % {n_shards} AS INTEGER) AS shard_id,
         n_chars
  FROM documents
)
GROUP BY shard_id
"""


def export_shard_fingerprints_sql(n_shards: int = 8) -> str:
    """Twin of :func:`..sources.export.shard_fingerprints` over
    (doc_id, text)."""
    from datalake_indexes_spark.sources.export import FINGERPRINT_MODULUS

    return f"""
SELECT shard_id, count(*) AS n_docs,
       CAST(sum(fp) AS BIGINT) AS fingerprint
FROM (
  SELECT CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              % {n_shards} AS INTEGER) AS shard_id,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|' || text), 1, 15))::BIGINT
           % {FINGERPRINT_MODULUS} AS fp
  FROM documents
)
GROUP BY shard_id
"""


def governance_k_anonymity_sql(k: int = 5) -> str:
    """Twin of :func:`..operators.discovery.k_anonymity_audit` over
    customer with the (c_nationkey, c_mktsegment) quasi-identifier and
    c_acctbal sensitive.  frac is one IEEE division of exact longs."""
    return f"""
WITH cls AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT c_acctbal) AS BIGINT) AS l
  FROM customer GROUP BY 1, 2
)
SELECT CAST({int(k)} AS BIGINT) AS k_required,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(min(n) AS BIGINT) AS k_anonymity,
       CAST(coalesce(sum(CASE WHEN n < {int(k)} THEN n END), 0) AS BIGINT)
         AS n_rows_below_k,
       CAST(min(l) AS BIGINT) AS l_diversity,
       CAST(coalesce(sum(CASE WHEN n < {int(k)} THEN n END), 0) AS DOUBLE)
         / CAST(sum(n) AS DOUBLE) AS frac_rows_below_k
FROM cls
"""


def governance_pseudonymize_sql(secret: str, prefix_len: int = 16) -> str:
    """Twin of :func:`..operators.discovery.pseudonymize_columns` over
    customer (c_custkey, c_name pseudonymized)."""
    def tok(col: str) -> str:
        return (
            f"CASE WHEN {col} IS NULL THEN NULL ELSE "
            f"substring(md5('{secret}' || '|' || CAST({col} AS VARCHAR)), 1, {prefix_len}) "
            f"END"
        )

    return f"""
SELECT {tok('c_custkey')} AS c_custkey,
       {tok('c_name')} AS c_name,
       c_mktsegment, c_acctbal
FROM customer
"""


_LINK_PLANT_CTE = """
planted AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 2 = 0
           THEN ' <a href="https://www.ref' || CAST(doc_id % 50 AS VARCHAR)
                || '.example.com/p?id=' || CAST(doc_id AS VARCHAR)
                || '">x</a> and <a href="http://peer' || CAST(doc_id % 7 AS VARCHAR)
                || '.example.org:8080/q">y</a>'
           ELSE '' END AS text
  FROM documents
)"""


def _link_domain_cte() -> str:
    from datalake_indexes_spark.operators import web

    rd = f"""CASE WHEN regexp_matches(host, '{web._IPV4_RE}') THEN host
          WHEN len(labels) >= 3
               AND list_contains({list(web.SECOND_LEVEL_LABELS)}, labels[-2])
            THEN array_to_string(list_slice(labels, len(labels) - 2, len(labels)), '.')
          WHEN len(labels) >= 2
            THEN array_to_string(list_slice(labels, len(labels) - 1, len(labels)), '.')
          ELSE host END"""
    return f"""
h AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '{web._HREF_RE}', 1)) AS href
  FROM planted
),
hostc AS (
  SELECT doc_id, href,
         regexp_replace(
           lower(regexp_extract(regexp_extract(href, '{web._AUTH_RE}', 1),
                                '{web._HOST_RE}', 1)),
           '^www\\.', '') AS host
  FROM h
),
lab AS (SELECT *, string_split(host, '.') AS labels FROM hostc),
links AS (SELECT doc_id, href, {rd} AS link_domain FROM lab)"""


def web_extract_links_sql() -> str:
    """Twin of :func:`..operators.web.extract_links` over planted
    anchors."""
    return f"""
WITH {_LINK_PLANT_CTE},
{_link_domain_cte()}
SELECT doc_id, href, link_domain FROM links
"""


def web_link_census_sql() -> str:
    """Twin of :func:`..operators.web.link_domain_census`."""
    return f"""
WITH {_LINK_PLANT_CTE},
{_link_domain_cte()}
SELECT link_domain, count(*) AS n_links, count(DISTINCT doc_id) AS n_docs
FROM links GROUP BY link_domain
"""


def web_domain_cap_sql(cap: int = 25) -> str:
    """Twin of :func:`..operators.web.domain_quota_cap` over the planted
    URLs — same md5 shuffle draw, same (draw, doc_id) tie-break."""
    return f"""
WITH {_URL_PLANT_CTE},
{_web_parsed_cte()},
ranked AS (
  SELECT doc_id, registered_domain,
         row_number() OVER (
           PARTITION BY registered_domain
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS domain_rank
  FROM canon
)
SELECT doc_id, registered_domain, CAST(domain_rank AS INT) AS domain_rank
FROM ranked WHERE domain_rank <= {cap}
"""


def column_quantile_buckets_sql(nbuckets: int = 8) -> str:
    """Equi-depth histogram twin: ntile over the same (value, row_id)
    total order — both engines cut by position with the standard
    first-buckets-get-the-remainder rule, so identical orders give
    identical buckets."""
    return f"""
WITH {cells_cte()},
flags AS (
  SELECT table_id, col_id, bool_and({_NUMERIC_TOKEN}) AS is_numeric
  FROM cells GROUP BY table_id, col_id
),
nn AS (
  SELECT cells.table_id, cells.col_id, cells.row_id,
         TRY_CAST(tokenized AS DOUBLE) AS val
  FROM cells JOIN flags f
    ON f.table_id = cells.table_id AND f.col_id = cells.col_id
  WHERE f.is_numeric AND tokenized NOT IN ('', 'nan')
        AND TRY_CAST(tokenized AS DOUBLE) IS NOT NULL
        AND NOT isnan(TRY_CAST(tokenized AS DOUBLE))
),
t AS (
  SELECT table_id, col_id, val,
         ntile({nbuckets}) OVER (PARTITION BY table_id, col_id
                                 ORDER BY val, row_id) AS bucket
  FROM nn
)
SELECT table_id, col_id, CAST(bucket AS INT) AS bucket,
       round(min(val), 6) AS lo, round(max(val), 6) AS hi,
       count(*) AS n
FROM t GROUP BY table_id, col_id, bucket
"""


def column_chi2_sql(col_a: str = "lang", col_b: str = "source") -> str:
    """Twin of :func:`..operators.discovery.categorical_association`
    over documents(lang, source) — same full-grid expected counts."""
    return f"""
WITH p AS (
  SELECT CASE WHEN {col_a} IS NULL THEN 'n' ELSE 'v' || CAST({col_a} AS VARCHAR) END AS a,
         CASE WHEN {col_b} IS NULL THEN 'n' ELSE 'v' || CAST({col_b} AS VARCHAR) END AS b
  FROM documents
),
obs AS (SELECT a, b, count(*) AS o FROM p GROUP BY a, b),
ra  AS (SELECT a, count(*) AS ra FROM p GROUP BY a),
cb  AS (SELECT b, count(*) AS cb FROM p GROUP BY b),
tot AS (SELECT CAST(sum(ra) AS DOUBLE) AS n, count(*) AS k_a FROM ra),
kb  AS (SELECT count(*) AS k_b FROM cb),
grid AS (
  SELECT ra.ra, cb.cb, coalesce(obs.o, 0) AS o,
         ra.ra * cb.cb / tot.n AS e, tot.n, tot.k_a, kb.k_b
  FROM ra CROSS JOIN cb CROSS JOIN tot CROSS JOIN kb
  LEFT JOIN obs ON obs.a = ra.a AND obs.b = cb.b
)
SELECT CAST(any_value(n) AS BIGINT) AS n,
       CAST((any_value(k_a) - 1) * (any_value(k_b) - 1) AS BIGINT) AS dof,
       round(sum(pow(o - e, 2) / e), 4) AS chi2,
       round(sqrt(sum(pow(o - e, 2) / e)
             / (any_value(n) * greatest(least(any_value(k_a) - 1,
                                              any_value(k_b) - 1), 1))), 4)
         AS cramers_v
FROM grid
"""


def export_balanced_shards_sql(n_shards: int = 8) -> str:
    """Twin of :func:`..sources.export.assign_balanced_shards` (weight =
    n_chars): same exclusive-prefix cut at ceil(total/n)."""
    return f"""
WITH w AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS wt FROM documents
),
tot AS (
  SELECT greatest(CAST((sum(wt) + {n_shards} - 1) // {n_shards} AS BIGINT), 1)
           AS target
  FROM w
),
c AS (
  SELECT doc_id, wt,
         CAST(sum(wt) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum
  FROM w
)
SELECT doc_id, wt AS weight, cum AS cum_weight,
       CAST(least({n_shards} - 1,
                  CAST(floor((cum - wt) * 1.0 / target) AS BIGINT)) AS INT)
         AS shard_id
FROM c CROSS JOIN tot
"""


def column_moments_sql() -> str:
    """Centered-moments twin: identical two-pass power-sum formulas
    (population moments), so neither engine's divergent built-in
    skewness/kurtosis variant is involved."""
    return f"""
WITH {cells_cte()},
flags AS (
  SELECT table_id, col_id, bool_and({_NUMERIC_TOKEN}) AS is_numeric
  FROM cells GROUP BY table_id, col_id
),
nn AS (
  SELECT cells.table_id, cells.col_id, TRY_CAST(tokenized AS DOUBLE) AS val
  FROM cells JOIN flags f
    ON f.table_id = cells.table_id AND f.col_id = cells.col_id
  WHERE f.is_numeric AND tokenized NOT IN ('', 'nan')
    AND NOT isnan(TRY_CAST(tokenized AS DOUBLE))
),
m AS (SELECT table_id, col_id, avg(val) AS mean FROM nn GROUP BY 1, 2),
c AS (
  SELECT nn.table_id, nn.col_id, m.mean, (val - m.mean) AS d
  FROM nn JOIN m ON m.table_id = nn.table_id AND m.col_id = nn.col_id
),
agg AS (
  SELECT table_id, col_id, count(*) AS n_values, any_value(mean) AS mean,
         sum(d * d) / count(*) AS m2,
         sum(d * d * d) / count(*) AS m3,
         sum(d * d * d * d) / count(*) AS m4
  FROM c GROUP BY 1, 2
)
SELECT table_id, col_id, n_values,
       round(mean, 6) AS mean,
       round(sqrt(m2), 6) AS std,
       round(m3 / pow(nullif(m2, 0), 1.5), 6) AS skewness,
       round(m4 / (nullif(m2, 0) * nullif(m2, 0)) - 3.0, 6) AS kurtosis
FROM agg
"""


def column_percentiles_sql(percentiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99)) -> str:
    """Exact-quantile twin: ``quantile_cont`` interpolates at p*(n-1)
    exactly like Spark's exact ``percentile``."""
    cols = ",\n       ".join(
        f"round(quantile_cont(val, {p}), 6) AS p{round(p * 100):d}" for p in percentiles
    )
    return f"""
WITH {cells_cte()},
flags AS (
  SELECT table_id, col_id, bool_and({_NUMERIC_TOKEN}) AS is_numeric
  FROM cells GROUP BY table_id, col_id
),
nn AS (
  SELECT cells.table_id, cells.col_id, TRY_CAST(tokenized AS DOUBLE) AS val
  FROM cells JOIN flags f
    ON f.table_id = cells.table_id AND f.col_id = cells.col_id
  WHERE f.is_numeric AND tokenized NOT IN ('', 'nan')
    AND NOT isnan(TRY_CAST(tokenized AS DOUBLE))
)
SELECT table_id, col_id, count(*) AS n_values,
       {cols}
FROM nn GROUP BY 1, 2
"""


def cascade_forget_sql(modulus: int = 37) -> str:
    """Twin of :func:`..operators.discovery.cascade_forget` over the
    customer -> orders -> lineitem FK chain (row-driven cascade: EXISTS
    against the deleted parent rows, so NULL FKs and dangling subjects
    delete nothing), nation pinned as the untouched table."""
    return f"""
WITH del_cust AS (
  SELECT c_custkey FROM customer WHERE c_custkey % {modulus} = 0
),
del_ord AS (
  SELECT o_orderkey FROM orders o
  WHERE EXISTS (SELECT 1 FROM del_cust d WHERE d.c_custkey = o.o_custkey)
),
del_li AS (
  SELECT 1 FROM lineitem l
  WHERE EXISTS (SELECT 1 FROM del_ord d WHERE d.o_orderkey = l.l_orderkey)
)
SELECT table_name,
       CAST(rows_before AS BIGINT) AS rows_before,
       CAST(rows_deleted AS BIGINT) AS rows_deleted,
       CAST(rows_before - rows_deleted AS BIGINT) AS rows_after
FROM (
  SELECT 'customer' AS table_name,
         (SELECT count(*) FROM customer) AS rows_before,
         (SELECT count(*) FROM del_cust) AS rows_deleted
  UNION ALL
  SELECT 'lineitem',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM del_li)
  UNION ALL
  SELECT 'nation', (SELECT count(*) FROM nation), 0
  UNION ALL
  SELECT 'orders',
         (SELECT count(*) FROM orders),
         (SELECT count(*) FROM del_ord)
) t
ORDER BY table_name
"""


def benford_audit_sql() -> str:
    """Benford first-digit audit twin: digit from the tokenized STRING
    (no float re-formatting), expected shares imported from the engine's
    :data:`..operators.cocoa.BENFORD_EXPECTED` literal table, chi2 summed
    in the same fixed d-order."""
    from datalake_indexes_spark.operators.cocoa import (
        BENFORD_CHI2_CRIT,
        BENFORD_EXPECTED,
    )

    cnts = ",\n         ".join(
        f"sum(CASE WHEN d = '{d}' THEN 1 ELSE 0 END) AS c{d}" for d in range(1, 10)
    )
    # CAST the expected-share literals to DOUBLE: DuckDB parses bare float
    # literals as DECIMAL, and squaring a DECIMAL(38) difference overflows
    chi2 = " + ".join(
        f"(c{d} - n_values * CAST({e!r} AS DOUBLE))"
        f" * (c{d} - n_values * CAST({e!r} AS DOUBLE))"
        f" / (n_values * CAST({e!r} AS DOUBLE))"
        for d, e in enumerate(BENFORD_EXPECTED, start=1)
    )
    shares = ",\n       ".join(
        f"round(c{d} * 1.0 / n_values, 6) AS p{d}" for d in range(1, 10)
    )
    return f"""
WITH {cells_cte()},
flags AS (
  SELECT table_id, col_id, bool_and({_NUMERIC_TOKEN}) AS is_numeric
  FROM cells GROUP BY table_id, col_id
),
digits AS (
  SELECT cells.table_id, cells.col_id,
         regexp_extract(tokenized, '[1-9]') AS d
  FROM cells JOIN flags f
    ON f.table_id = cells.table_id AND f.col_id = cells.col_id
  WHERE f.is_numeric AND regexp_extract(tokenized, '[1-9]') <> ''
),
agg AS (
  SELECT table_id, col_id, count(*) AS n_values,
         {cnts}
  FROM digits GROUP BY 1, 2
)
SELECT table_id, col_id, n_values,
       round({chi2}, 4) AS chi2,
       ({chi2}) > CAST({BENFORD_CHI2_CRIT!r} AS DOUBLE) AS benford_flag,
       {shares}
FROM agg
"""


def ks_drift_sql(
    table: str,
    split_predicate: str,
    columns: tuple[str, ...],
) -> str:
    """Exact two-sample KS twin: tie-grouped counts, running CDFs via
    per-column ordered windows (no ties within a partition, so the
    engines' shared RANGE default frame equals ROWS), same α = 0.05
    critical-value coefficient."""
    from datalake_indexes_spark.operators.cocoa import KS_ALPHA_COEF

    arms = "\n  UNION ALL\n  ".join(
        f"SELECT '{c}' AS column_name, CAST({c} AS DOUBLE) AS val,\n"
        f"         CASE WHEN {split_predicate} THEN 'a' ELSE 'b' END AS side\n"
        f"  FROM {table} WHERE {c} IS NOT NULL"
        for c in columns
    )
    return f"""
WITH longv AS (
  {arms}
),
counts AS (
  SELECT column_name, val,
         sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS cb
  FROM longv GROUP BY 1, 2
),
cdf AS (
  SELECT column_name,
         sum(ca) OVER (PARTITION BY column_name ORDER BY val) AS cum_a,
         sum(cb) OVER (PARTITION BY column_name ORDER BY val) AS cum_b,
         sum(ca) OVER (PARTITION BY column_name) AS na,
         sum(cb) OVER (PARTITION BY column_name) AS nb
  FROM counts
),
agg AS (
  SELECT column_name, any_value(na) AS n_a, any_value(nb) AS n_b,
         max(abs(cum_a * 1.0 / na - cum_b * 1.0 / nb)) AS d
  FROM cdf GROUP BY 1
)
SELECT column_name,
       CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       round(d, 6) AS ks_stat,
       round({KS_ALPHA_COEF!r} * sqrt((n_a + n_b) * 1.0 / (n_a * n_b)), 6)
         AS threshold,
       d > {KS_ALPHA_COEF!r} * sqrt((n_a + n_b) * 1.0 / (n_a * n_b)) AS drift_flag
FROM agg
"""


def categorical_mutual_info_sql(col_a: str, col_b: str, table: str = "documents") -> str:
    """Mutual-information twin: same observed-cells-only decomposition
    MI = Σ o·ln(o/(ra·cb))/n + ln(n), same margin-entropy closed forms,
    rounding only at the output."""
    return f"""
WITH cells AS (
  SELECT CASE WHEN {col_a} IS NULL THEN 'n' ELSE 'v' || CAST({col_a} AS VARCHAR) END AS a,
         CASE WHEN {col_b} IS NULL THEN 'n' ELSE 'v' || CAST({col_b} AS VARCHAR) END AS b,
         count(*) AS o
  FROM {table} GROUP BY 1, 2
),
ra AS (SELECT a, sum(o) AS ra FROM cells GROUP BY 1),
cb AS (SELECT b, sum(o) AS cb FROM cells GROUP BY 1),
agg AS (
  SELECT sum(c.o) AS n,
         sum(c.o * ln(c.o * 1.0 / (CAST(ra.ra AS DOUBLE) * CAST(cb.cb AS DOUBLE)))) AS mi_part
  FROM cells c JOIN ra ON ra.a = c.a JOIN cb ON cb.b = c.b
),
ha AS (
  SELECT ln(sum(ra) * 1.0) - sum(ra * ln(ra * 1.0)) / sum(ra) AS h_a FROM ra
),
hb AS (
  SELECT ln(sum(cb) * 1.0) - sum(cb * ln(cb * 1.0)) / sum(cb) AS h_b FROM cb
)
SELECT CAST(n AS BIGINT) AS n,
       round(mi_part / n + ln(n * 1.0), 6) AS mi,
       round(h_a, 6) AS h_a,
       round(h_b, 6) AS h_b,
       round((mi_part / n + ln(n * 1.0)) / nullif(sqrt(h_a * h_b), 0.0), 6) AS nmi
FROM agg, ha, hb
"""


def profile_psi_sql(nbins: int = 10, shift: int = 50, eps: float = 0.5) -> str:
    """PSI twin over the same planted supplier shift and the same
    independent raw-table derivation as profile_drift_sql; Laplace
    smoothing p = (n + eps)/(N + eps·nbins) keeps empty buckets finite."""
    va = f"""
  SELECT 1 AS table_id, 0 AS col_id, CAST(n_nationkey AS DOUBLE) AS v FROM nation
  UNION ALL SELECT 1, 2, CAST(n_regionkey AS DOUBLE) FROM nation
  UNION ALL SELECT 3, 0, CAST(s_suppkey AS DOUBLE) FROM supplier
  UNION ALL SELECT 3, 2, CAST(s_nationkey AS DOUBLE) FROM supplier"""
    vb = va.replace("CAST(s_suppkey AS DOUBLE)",
                    f"CAST(s_suppkey + {shift} AS DOUBLE)")
    pa = f"(j.n_a + {eps!r}) / (t.n_a + {eps * nbins!r})"
    pb = f"(j.n_b + {eps!r}) / (t.n_b + {eps * nbins!r})"
    return f"""
WITH va AS ({va}),
vb AS ({vb}),
bounds AS (
  SELECT a.table_id, a.col_id,
         least(a.lo, b.lo) AS lo, greatest(a.hi, b.hi) AS hi
  FROM (SELECT table_id, col_id, min(v) AS lo, max(v) AS hi
        FROM va GROUP BY 1, 2) a
  JOIN (SELECT table_id, col_id, min(v) AS lo, max(v) AS hi
        FROM vb GROUP BY 1, 2) b USING (table_id, col_id)
),
ha AS (
  SELECT v.table_id, v.col_id,
         CASE WHEN (bo.hi - bo.lo) / {nbins} > 0
              THEN least(CAST(floor((v.v - bo.lo) / ((bo.hi - bo.lo) / {nbins}))
                         AS INT), {nbins - 1})
              ELSE 0 END AS b,
         count(*) AS n_a
  FROM va v JOIN bounds bo USING (table_id, col_id) GROUP BY 1, 2, 3
),
hb AS (
  SELECT v.table_id, v.col_id,
         CASE WHEN (bo.hi - bo.lo) / {nbins} > 0
              THEN least(CAST(floor((v.v - bo.lo) / ((bo.hi - bo.lo) / {nbins}))
                         AS INT), {nbins - 1})
              ELSE 0 END AS b,
         count(*) AS n_b
  FROM vb v JOIN bounds bo USING (table_id, col_id) GROUP BY 1, 2, 3
),
j AS (
  SELECT coalesce(ha.table_id, hb.table_id) AS table_id,
         coalesce(ha.col_id, hb.col_id) AS col_id,
         coalesce(ha.b, hb.b) AS b,
         coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
  FROM ha FULL OUTER JOIN hb
    ON ha.table_id = hb.table_id AND ha.col_id = hb.col_id AND ha.b = hb.b
),
tot AS (
  SELECT table_id, col_id, sum(n_a) AS n_a, sum(n_b) AS n_b
  FROM j GROUP BY 1, 2
)
SELECT j.table_id, j.col_id,
       CAST(t.n_a AS BIGINT) AS n_a, CAST(t.n_b AS BIGINT) AS n_b,
       round(sum(({pa} - {pb}) * ln({pa} / {pb})), 6) AS psi
FROM j JOIN tot t USING (table_id, col_id)
GROUP BY 1, 2, t.n_a, t.n_b
"""


def fs_record_linkage_sql(m: float = 0.95, threshold: float = 0.0) -> str:
    """Twin of :func:`..operators.fuzzy.fs_record_linkage` on the graded
    customer-vs-perturbed-copy config: same frequency-based u estimate
    (Σ p_a(v)·p_b(v) over non-null margins, clamped), same per-field
    log-likelihood weights, same round-then-threshold.  All probability
    literals are written as the same arithmetic the engine performs
    ((1.0 - m), 1.0 - 0.000000001) so both sides evaluate identical
    doubles before the logarithm."""
    return f"""
WITH a AS (
  SELECT c_custkey AS a_id, c_nationkey AS blk,
         c_name AS name,
         CAST(c_custkey % 9973 AS VARCHAR) AS code,
         c_mktsegment AS seg
  FROM customer
),
b AS (
  SELECT c_custkey + 1000000 AS b_id, c_nationkey AS blk,
         CASE WHEN c_custkey % 5 = 0 THEN upper(c_name) ELSE c_name END AS name,
         CASE WHEN c_custkey % 3 = 0 THEN CAST((c_custkey + 1) % 9973 AS VARCHAR)
              ELSE CAST(c_custkey % 9973 AS VARCHAR) END AS code,
         CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_mktsegment END AS seg
  FROM customer
),
am AS (
  SELECT f, v FROM (
    SELECT 'name' AS f, name AS v FROM a UNION ALL
    SELECT 'code', code FROM a UNION ALL
    SELECT 'seg', seg FROM a
  ) WHERE v IS NOT NULL
),
bm AS (
  SELECT f, v FROM (
    SELECT 'name' AS f, name AS v FROM b UNION ALL
    SELECT 'code', code FROM b UNION ALL
    SELECT 'seg', seg FROM b
  ) WHERE v IS NOT NULL
),
ca AS (SELECT f, v, count(*) AS c FROM am GROUP BY 1, 2),
cb AS (SELECT f, v, count(*) AS c FROM bm GROUP BY 1, 2),
na AS (SELECT f, count(*) AS n FROM am GROUP BY 1),
nb AS (SELECT f, count(*) AS n FROM bm GROUP BY 1),
u AS (
  -- clamp bounds computed in DOUBLE arithmetic (1.0 - CAST(eps)) so they
  -- equal the engine's Python double 1.0 - 1e-9, not the exact DECIMAL
  SELECT ca.f,
         least(1.0 - CAST(0.000000001 AS DOUBLE),
               greatest(CAST(0.000000001 AS DOUBLE),
                        sum(ca.c * 1.0 * cb.c)
                          / (any_value(na.n) * 1.0 * any_value(nb.n)))) AS uv
  FROM ca JOIN cb ON ca.f = cb.f AND ca.v = cb.v
          JOIN na ON na.f = ca.f JOIN nb ON nb.f = ca.f
  GROUP BY ca.f
),
uw AS (
  -- a field whose two margins never intersect has no u row; the engine
  -- floors such fields to 1e-9 (fuzzy.py fs_record_linkage) — coalesce
  -- the pivot to the same floor instead of poisoning every weight NULL
  SELECT coalesce(max(CASE WHEN f = 'name' THEN uv END),
                  CAST(0.000000001 AS DOUBLE)) AS u_name,
         coalesce(max(CASE WHEN f = 'code' THEN uv END),
                  CAST(0.000000001 AS DOUBLE)) AS u_code,
         coalesce(max(CASE WHEN f = 'seg'  THEN uv END),
                  CAST(0.000000001 AS DOUBLE)) AS u_seg
  FROM u
),
p AS (
  SELECT a.a_id, b.b_id,
         a.name AS an, b.name AS bn,
         a.code AS ac, b.code AS bc,
         a.seg  AS asg, b.seg  AS bsg
  FROM a JOIN b ON a.blk = b.blk
),
scored AS (
  SELECT a_id, b_id,
    CAST(
      (CASE WHEN an IS NOT NULL AND bn IS NOT NULL AND an = bn THEN 1 ELSE 0 END)
      + (CASE WHEN ac IS NOT NULL AND bc IS NOT NULL AND ac = bc THEN 1 ELSE 0 END)
      + (CASE WHEN asg IS NOT NULL AND bsg IS NOT NULL AND asg = bsg THEN 1 ELSE 0 END)
      AS INT) AS n_agree,
    CAST(
      (CASE WHEN an IS NOT NULL AND bn IS NOT NULL THEN 1 ELSE 0 END)
      + (CASE WHEN ac IS NOT NULL AND bc IS NOT NULL THEN 1 ELSE 0 END)
      + (CASE WHEN asg IS NOT NULL AND bsg IS NOT NULL THEN 1 ELSE 0 END)
      AS INT) AS n_compared,
    -- disagreement numerator 1.0 - m computed in DOUBLE (cast first) so it
    -- matches the engine's Python double 1.0 - m, not exact DECIMAL
    round(
      (CASE WHEN an IS NOT NULL AND bn IS NOT NULL
            THEN CASE WHEN an = bn THEN ln({m} / u_name)
                      ELSE ln((1.0 - CAST({m} AS DOUBLE)) / (1.0 - u_name)) END
            ELSE 0.0 END)
      + (CASE WHEN ac IS NOT NULL AND bc IS NOT NULL
              THEN CASE WHEN ac = bc THEN ln({m} / u_code)
                        ELSE ln((1.0 - CAST({m} AS DOUBLE)) / (1.0 - u_code)) END
              ELSE 0.0 END)
      + (CASE WHEN asg IS NOT NULL AND bsg IS NOT NULL
              THEN CASE WHEN asg = bsg THEN ln({m} / u_seg)
                        ELSE ln((1.0 - CAST({m} AS DOUBLE)) / (1.0 - u_seg)) END
              ELSE 0.0 END), 6) AS weight
  FROM p CROSS JOIN uw
)
SELECT a_id, b_id, n_agree, n_compared, weight
FROM scored WHERE weight >= {threshold}
"""


