"""COCOA correlation-enrichment oracle twins.

Split from the former plans/oracle.py (round 9) — pure rearrangement,
every definition verbatim.  Import surface unchanged via the package
``__init__``.
"""

from __future__ import annotations
from datalake_indexes_spark.functions.text import NULLISH_TOKENS, tokenize_sql
from datalake_indexes_spark.sources.catalog import TESTDATA_LAKE_SPEC, LakeTableSpec

from datalake_indexes_spark.plans.oracle._common import _NUMERIC_TOKEN, cells_cte
from datalake_indexes_spark.plans.oracle._mate import _input_cte

def cocoa_enrich_sql(
    input_table: str,
    query_column: str,
    target_column: str,
    input_order_by: list[str],
    k_t: int = 10,
    k_c: int = 20,
    round_digits: int = 4,
) -> str:
    """COCOA single-query-column enrichment (cocoa.py:29-304), intended
    semantics — see operators/cocoa.py for the full semantics statement."""
    qtok = tokenize_sql(query_column, "duckdb")
    order = ", ".join(input_order_by)
    sql = f"""
WITH {cells_cte()},
input AS (
  SELECT row_number() OVER (ORDER BY {order}) - 1 AS rid,
         {qtok} AS qtok, {target_column} AS target
  FROM {input_table}
),
tr AS (
  SELECT rid, qtok, avg(rn) OVER (PARTITION BY target) AS target_rank
  FROM (SELECT *, row_number() OVER (ORDER BY target ASC NULLS LAST) AS rn FROM input)
),
stats AS (
  SELECT count(*) AS n, sum(target_rank) AS t_sum, stddev_pop(target_rank) AS t_std,
         CAST(ceil(count(*) / 2.0) AS DOUBLE) AS mid_rank
  FROM tr
),
joinable AS (
  SELECT table_id, col_id FROM (
    SELECT c.table_id, c.col_id,
           row_number() OVER (ORDER BY count(DISTINCT c.tokenized) DESC, c.table_id, c.col_id) AS rk
    FROM cells c JOIN (SELECT DISTINCT qtok FROM input WHERE qtok IS NOT NULL) i
      ON c.tokenized = i.qtok
    GROUP BY c.table_id, c.col_id
  ) WHERE rk <= {k_t}
),
last_ext AS (
  SELECT c.table_id, c.col_id AS join_col, c.tokenized, max(c.row_id) AS ext_row
  FROM cells c JOIN joinable j ON c.table_id = j.table_id AND c.col_id = j.col_id
  GROUP BY ALL
),
last_inp AS (SELECT qtok, max(rid) AS rid FROM input GROUP BY qtok),
matched_join AS (
  SELECT e.table_id, e.join_col, e.ext_row, i.rid
  FROM last_ext e JOIN last_inp i ON e.tokenized = i.qtok
),
pairs AS (SELECT DISTINCT table_id, ext_row, rid FROM matched_join),
exclude AS (SELECT DISTINCT table_id, join_col AS col_id FROM matched_join),
ext_cells AS (
  SELECT c.* FROM cells c
  JOIN (SELECT DISTINCT table_id FROM pairs) t USING (table_id)
  ANTI JOIN exclude x ON c.table_id = x.table_id AND c.col_id = x.col_id
),
numeric AS (
  SELECT table_id, col_id, bool_and({_NUMERIC_TOKEN}) AS is_numeric
  FROM ext_cells GROUP BY table_id, col_id
),
matched AS (
  SELECT p.rid, e.table_id, e.col_id, e.tokenized, t.target_rank, nm.is_numeric
  FROM pairs p
  JOIN ext_cells e ON e.table_id = p.table_id AND e.row_id = p.ext_row
  JOIN tr t ON t.rid = p.rid
  JOIN numeric nm ON nm.table_id = e.table_id AND nm.col_id = e.col_id
),
m_num AS (
  SELECT *, CASE WHEN tokenized IN ('', 'nan') OR isnan(TRY_CAST(tokenized AS DOUBLE))
                 THEN NULL ELSE TRY_CAST(tokenized AS DOUBLE) END AS val
  FROM matched WHERE is_numeric
),
ranked AS (
  SELECT *, avg(rn) OVER (PARTITION BY table_id, col_id, val) AS ext_rank
  FROM (SELECT *, row_number() OVER (PARTITION BY table_id, col_id ORDER BY val ASC NULLS LAST) AS rn
        FROM m_num)
),
per_input AS (
  SELECT table_id, col_id, rid, max(ext_rank) AS er FROM ranked GROUP BY ALL
),
num_full AS (
  SELECT nc.table_id, nc.col_id, t.rid, t.target_rank,
         coalesce(pi.er, (SELECT mid_rank FROM stats)) AS er
  FROM (SELECT table_id, col_id FROM numeric WHERE is_numeric) nc
  CROSS JOIN tr t
  LEFT JOIN per_input pi ON pi.table_id = nc.table_id AND pi.col_id = nc.col_id AND pi.rid = t.rid
),
num_corr AS (
  SELECT table_id, col_id, corr(target_rank, er) AS corr FROM num_full GROUP BY ALL
),
cat_groups AS (
  SELECT table_id, col_id, tokenized, count(*) AS q, sum(target_rank) AS s
  FROM matched WHERE NOT is_numeric GROUP BY ALL
),
cat_r AS (
  SELECT table_id, col_id,
         abs((st.n * s - q * st.t_sum) / (st.t_std * st.n * sqrt(q * (st.n - q)))) AS r
  FROM cat_groups, stats st WHERE q < st.n
),
cat_corr AS (
  SELECT cc.table_id, cc.col_id, max(cr.r) AS corr
  FROM (SELECT table_id, col_id FROM numeric WHERE NOT is_numeric) cc
  LEFT JOIN cat_r cr ON cr.table_id = cc.table_id AND cr.col_id = cc.col_id
  GROUP BY ALL
),
all_corr AS (
  SELECT * FROM num_corr UNION ALL SELECT * FROM cat_corr
)
SELECT CAST(a.table_id AS VARCHAR) || '_' || CAST(a.col_id AS VARCHAR) AS table_col_id,
       round(CASE WHEN a.corr IS NULL OR isnan(a.corr) THEN 0.0 ELSE a.corr END, {round_digits}) AS corr,
       nm.is_numeric
FROM all_corr a JOIN numeric nm ON nm.table_id = a.table_id AND nm.col_id = a.col_id
ORDER BY abs(CASE WHEN a.corr IS NULL OR isnan(a.corr) THEN 0.0 ELSE a.corr END) DESC,
         table_col_id
LIMIT {k_c}
"""
    # same CTE-inlining trap as the multicolumn twin: the multiply-
    # referenced frames measured 5.8 s inlined vs 1.0 s materialized at
    # sf0.01, bit-identical results
    for nm in ("cells", "matched", "tr", "numeric", "pairs", "input"):
        sql = sql.replace(f"\n{nm} AS (", f"\n{nm} AS MATERIALIZED (", 1)
    return sql


def cocoa_multicolumn_sql(
    input_table: str,
    query_columns: list[str],
    target_column: str,
    input_order_by: list[str],
    k: int = 5,
    k_c: int = 500,
    k_features: int = 10,
    round_digits: int = 4,
    materialize: bool = False,
) -> str:
    """enrich_multicolumn twin (cocoa.py:306-583): MATE's verified join maps
    feed the correlation machinery; join columns of each winning
    combination are excluded; target ranks cover ALL input rows.

    ``materialize=True`` emits the enrichment pipeline's END PRODUCT
    instead of the ranking: the winning features first-match-joined onto
    every input row, long form (mate_row_id, table_col_id, value) —
    first match = lowest external row id, mirroring
    pipelines/enrichment.py's min_by materialization."""
    degree = len(query_columns)
    verify_idx = [0] if degree == 1 else list(range(1, degree))
    m_selects = ", ".join(
        f"list(c.col_id ORDER BY c.col_id) FILTER (WHERE c.tokenized = h.q{i}) AS m{i}"
        for i in verify_idx
    )
    match_cond = " AND ".join(f"len(m{i}) > 0" for i in verify_idx)
    combo = " || ".join(
        ["CAST(hit_col_id AS VARCHAR)"]
        + [f"'_' || array_to_string(m{i}, '_')" for i in verify_idx]
    )
    qcols = ", ".join(f"h.q{i}" for i in range(degree))
    sql = f"""
WITH {cells_cte()},
{_input_cte(input_table, query_columns, input_order_by, extra_cols=[target_column])},
hits AS (
  SELECT c.table_id, c.row_id AS ext_row_id, c.col_id AS hit_col_id, i.mate_row_id,
         {", ".join(f"i.q{i}" for i in range(degree))}
  FROM cells c JOIN input_ok i ON c.tokenized = i.q0
),
cand AS (
  SELECT table_id FROM (
    SELECT table_id, row_number() OVER (ORDER BY count(*) DESC, table_id) AS rk
    FROM hits GROUP BY table_id
  ) WHERE rk <= {k_c}
),
verified AS (
  SELECT h.table_id, h.ext_row_id, h.hit_col_id, h.mate_row_id, {qcols}, {m_selects}
  FROM (SELECT hits.* FROM hits JOIN cand USING (table_id)) h
  JOIN cells c ON c.table_id = h.table_id AND c.row_id = h.ext_row_id
  GROUP BY ALL
),
matches AS (
  SELECT *, {combo} AS column_combination FROM verified WHERE {match_cond}
),
combo_counts AS (
  SELECT table_id, column_combination, count(*) AS cnt FROM matches GROUP BY ALL
),
best AS (
  SELECT table_id, column_combination, cnt FROM (
    SELECT *, row_number() OVER (
      PARTITION BY table_id ORDER BY cnt DESC, column_combination) AS rk
    FROM combo_counts
  ) WHERE rk = 1
),
topk AS (
  SELECT table_id, column_combination FROM (
    SELECT *, row_number() OVER (ORDER BY cnt DESC, table_id) AS rk FROM best
  ) WHERE rk <= {k}
),
pairs AS (
  SELECT m.table_id, m.ext_row_id, max(m.mate_row_id) AS input_row_id
  FROM matches m JOIN topk t USING (table_id, column_combination)
  GROUP BY m.table_id, m.column_combination, m.ext_row_id
),
exclude AS (
  SELECT DISTINCT table_id, CAST(unnest(string_split(column_combination, '_')) AS INT) AS col_id
  FROM topk
),
tr AS (
  SELECT mate_row_id AS input_row_id,
         avg(rn) OVER (PARTITION BY {target_column}) AS target_rank
  FROM (SELECT *, row_number() OVER (ORDER BY {target_column} ASC NULLS LAST) AS rn
        FROM __input_raw)
),
stats AS (
  SELECT count(*) AS n, sum(target_rank) AS t_sum,
         stddev_pop(target_rank) AS t_std,
         sum(target_rank * target_rank) AS t_sq,
         CAST(ceil(count(*) / 2.0) AS DOUBLE) AS mid_rank
  FROM tr
),
cand_t AS (SELECT DISTINCT table_id FROM pairs),
ext_cells AS (
  SELECT c.* FROM cells c
  JOIN cand_t USING (table_id)
  ANTI JOIN exclude x ON c.table_id = x.table_id AND c.col_id = x.col_id
),
numeric AS (
  SELECT f.table_id, f.col_id, f.is_numeric FROM (
    SELECT table_id, col_id, bool_and({_NUMERIC_TOKEN}) AS is_numeric
    FROM cells GROUP BY table_id, col_id
  ) f
  JOIN cand_t ON cand_t.table_id = f.table_id
  ANTI JOIN exclude x ON f.table_id = x.table_id AND f.col_id = x.col_id
),
matched AS (
  SELECT p.input_row_id, e.table_id, e.col_id, e.tokenized, t.target_rank, nm.is_numeric
  FROM pairs p
  JOIN ext_cells e ON e.table_id = p.table_id AND e.row_id = p.ext_row_id
  JOIN tr t ON t.input_row_id = p.input_row_id
  JOIN numeric nm ON nm.table_id = e.table_id AND nm.col_id = e.col_id
),
m_num AS (
  SELECT *, CASE WHEN tokenized IN ('', 'nan') OR isnan(TRY_CAST(tokenized AS DOUBLE))
                 THEN NULL ELSE TRY_CAST(tokenized AS DOUBLE) END AS val
  FROM matched WHERE is_numeric
),
ranked AS (
  SELECT *, avg(rn) OVER (PARTITION BY table_id, col_id, val) AS ext_rank
  FROM (SELECT *, row_number() OVER (PARTITION BY table_id, col_id
                                     ORDER BY val ASC NULLS LAST) AS rn
        FROM m_num)
),
per_input AS (
  SELECT table_id, col_id, input_row_id,
         max(ext_rank) AS e, max(target_rank) AS t
  FROM ranked GROUP BY ALL
),
num_agg AS (
  SELECT table_id, col_id, count(*) AS m, sum(e) AS se, sum(e*e) AS se2,
         sum(t) AS st_m, sum(e*t) AS ste
  FROM per_input GROUP BY ALL
),
num_corr AS (
  SELECT table_id, col_id,
         CASE WHEN denom > 0 THEN (n * sum_te - t_sum * sum_e) / denom END AS corr
  FROM (
    SELECT a.table_id, a.col_id, st.n, st.t_sum,
           a.ste + st.mid_rank * (st.t_sum - a.st_m) AS sum_te,
           a.se + st.mid_rank * (st.n - a.m) AS sum_e,
           sqrt(st.n * st.t_sq - st.t_sum * st.t_sum)
             * sqrt(st.n * (a.se2 + st.mid_rank * st.mid_rank * (st.n - a.m))
                    - (a.se + st.mid_rank * (st.n - a.m))
                      * (a.se + st.mid_rank * (st.n - a.m))) AS denom
    FROM num_agg a, stats st
  )
),
num_full AS (
  SELECT nc.table_id, nc.col_id, c.corr
  FROM (SELECT table_id, col_id FROM numeric WHERE is_numeric) nc
  LEFT JOIN num_corr c ON c.table_id = nc.table_id AND c.col_id = nc.col_id
),
cat_groups AS (
  SELECT table_id, col_id, tokenized, count(*) AS q, sum(target_rank) AS s
  FROM matched WHERE NOT is_numeric GROUP BY ALL
),
cat_r AS (
  SELECT table_id, col_id,
         abs((st.n * s - q * st.t_sum) / (st.t_std * st.n * sqrt(q * (st.n - q)))) AS r
  FROM cat_groups, stats st WHERE q < st.n
),
cat_corr AS (
  SELECT cc.table_id, cc.col_id, max(cr.r) AS corr
  FROM (SELECT table_id, col_id FROM numeric WHERE NOT is_numeric) cc
  LEFT JOIN cat_r cr ON cr.table_id = cc.table_id AND cr.col_id = cc.col_id
  GROUP BY ALL
),
all_corr AS (SELECT * FROM num_full UNION ALL SELECT * FROM cat_corr),
winners AS (
  SELECT CAST(a.table_id AS VARCHAR) || '_' || CAST(a.col_id AS VARCHAR) AS table_col_id,
         round(CASE WHEN a.corr IS NULL OR isnan(a.corr) THEN 0.0 ELSE a.corr END, {round_digits}) AS corr,
         nm.is_numeric
  FROM all_corr a JOIN numeric nm ON nm.table_id = a.table_id AND nm.col_id = a.col_id
  ORDER BY abs(CASE WHEN a.corr IS NULL OR isnan(a.corr) THEN 0.0 ELSE a.corr END) DESC,
           table_col_id
  LIMIT {k_features}
)
""" + (
        """
SELECT p.input_row_id AS mate_row_id,
       CAST(e.table_id AS VARCHAR) || '_' || CAST(e.col_id AS VARCHAR) AS table_col_id,
       min_by(e.tokenized, p.ext_row_id) AS value
FROM pairs p
JOIN cells e ON e.table_id = p.table_id AND e.row_id = p.ext_row_id
JOIN winners w
  ON w.table_col_id = CAST(e.table_id AS VARCHAR) || '_' || CAST(e.col_id AS VARCHAR)
GROUP BY 1, 2
"""
        if materialize
        else "SELECT table_col_id, corr, is_numeric FROM winners"
    )
    # DuckDB inlines non-MATERIALIZED CTEs per reference (the HITS-twin
    # trap, PLANS.md round 5): this chain re-references its expensive
    # frames up to 4x — measured 18.7 s at sf0.01, 2.2 s with the hot
    # CTEs materialized, results bit-identical (purely physical hint).
    for nm in ("cells", "hits", "matches", "pairs", "tr", "numeric", "matched"):
        sql = sql.replace(f"\n{nm} AS (", f"\n{nm} AS MATERIALIZED (", 1)
    return sql


def cocoa_order_index_sql() -> str:
    """W2 — the COCOA linked-list order index (util.py:34-138), incl. the
    reference's categorical ''->'nan' stringification quirk."""
    return f"""
WITH {cells_cte()},
flags AS (
  SELECT table_id, col_id, bool_and({_NUMERIC_TOKEN}) AS is_numeric
  FROM cells GROUP BY table_id, col_id
),
vals AS (
  SELECT c.table_id, c.col_id, c.row_id, f.is_numeric,
         CASE WHEN f.is_numeric THEN
           (CASE WHEN c.tokenized IN ('', 'nan') OR isnan(TRY_CAST(c.tokenized AS DOUBLE))
                 THEN NULL ELSE TRY_CAST(c.tokenized AS DOUBLE) END)
         END AS nv,
         CASE WHEN NOT f.is_numeric THEN
           (CASE WHEN c.tokenized = '' THEN 'nan' ELSE c.tokenized END)
         END AS sv
  FROM cells c JOIN flags f USING (table_id, col_id)
),
ordered AS (
  SELECT *, coalesce(lead(row_id) OVER w, -1) AS nxt,
         CASE WHEN lead(row_id) OVER w IS NULL THEN '0'
              WHEN is_numeric AND nv IS NOT DISTINCT FROM lead(nv) OVER w THEN '0'
              WHEN NOT is_numeric AND sv = lead(sv) OVER w THEN '0'
              ELSE '1' END AS bin,
         first_value(row_id) OVER w AS mi
  FROM vals
  WINDOW w AS (PARTITION BY table_id, col_id
               ORDER BY nv ASC NULLS LAST, sv ASC NULLS LAST, row_id)
)
SELECT CAST(table_id AS VARCHAR) || '_' || CAST(col_id AS VARCHAR) AS table_col_id,
       any_value(is_numeric) AS is_numeric,
       min(mi) AS min_index,
       array_to_string(list(nxt ORDER BY row_id), '_') AS order_list,
       string_agg(bin, '' ORDER BY row_id) AS binary_list
FROM ordered GROUP BY table_id, col_id
"""


