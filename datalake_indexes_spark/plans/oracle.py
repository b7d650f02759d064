"""DuckDB oracle SQL emitters.

Every engine operator exposed through ``__spark_entry__.queries()`` has an
independently-written ANSI-SQL formulation here, generated from the same
shared constants (lake spec, tokenizer patterns, null-ish token set) the
Spark pipelines use — the *logic* is written twice (DataFrame vs SQL), the
*constants* once, so the driver's DuckDB comparison is a real check of the
engine's semantics rather than a tautology.

All SQL is DuckDB dialect (regexp flags, ``list(... ORDER BY ...)``).
"""

from __future__ import annotations

from datalake_indexes_spark.functions.text import NULLISH_TOKENS, tokenize_sql
from datalake_indexes_spark.sources.catalog import TESTDATA_LAKE_SPEC, LakeTableSpec


def _rowid_select(spec: LakeTableSpec) -> str:
    order = ", ".join(spec.order_by)
    cols = ", ".join(dict.fromkeys(list(spec.cols) + list(spec.order_by)))
    return (
        f"SELECT {cols}, row_number() OVER (ORDER BY {order}) - 1 AS row_id "
        f"FROM {spec.name}"
    )


def cells_cte(specs: dict[str, LakeTableSpec] | None = None) -> str:
    """The cell-index CTE: one row per (table_id, col_id, row_id, tokenized)."""
    specs = specs or TESTDATA_LAKE_SPEC
    table_ctes = []
    cell_selects = []
    for name, spec in specs.items():
        table_ctes.append(f"__t_{name} AS ({_rowid_select(spec)})")
        for col_id, col in enumerate(spec.cols):
            cell_selects.append(
                f"SELECT {spec.table_id} AS table_id, {col_id} AS col_id, row_id, "
                f"{tokenize_sql(col, 'duckdb')} AS tokenized FROM __t_{name}"
            )
    ctes = ",\n".join(table_ctes)
    cells = "\nUNION ALL\n".join(cell_selects)
    return f"{ctes},\ncells AS (\n{cells}\n)"


def index_cells_sql() -> str:
    return f"WITH {cells_cte()} SELECT table_id, col_id, row_id, tokenized FROM cells"


def table_info_sql() -> str:
    names = ", ".join(
        f"({s.table_id}, '{s.name}')" for s in TESTDATA_LAKE_SPEC.values()
    )
    return f"""
WITH {cells_cte()},
info AS (
  SELECT table_id, max(row_id) AS max_row_id, CAST(max(col_id) AS INT) AS max_col_id
  FROM cells GROUP BY table_id
),
names(table_id, dataset_name) AS (VALUES {names})
SELECT i.table_id, n.dataset_name, i.max_row_id, i.max_col_id
FROM info i JOIN names n USING (table_id)
"""


_NUMERIC_TOKEN = "(tokenized IN ('', 'nan') OR TRY_CAST(tokenized AS DOUBLE) IS NOT NULL)"


def is_numeric_sql() -> str:
    return f"""
WITH {cells_cte()}
SELECT table_id, col_id, bool_and({_NUMERIC_TOKEN}) AS is_numeric
FROM cells GROUP BY table_id, col_id
"""


def column_profiles_sql() -> str:
    """Per-column profiling twin: DuckDB's ``quantile_cont(0.5)`` matches
    Spark's exact ``percentile(0.5)`` (linear interpolation)."""
    return f"""
WITH {cells_cte()},
flags AS (
  SELECT table_id, col_id, bool_and({_NUMERIC_TOKEN}) AS is_numeric
  FROM cells GROUP BY table_id, col_id
),
c AS (
  SELECT cells.*, f.is_numeric,
         CASE WHEN f.is_numeric AND tokenized NOT IN ('', 'nan')
                   AND NOT isnan(TRY_CAST(tokenized AS DOUBLE))
              THEN TRY_CAST(tokenized AS DOUBLE) END AS val
  FROM cells JOIN flags f USING (table_id, col_id)
)
SELECT table_id, col_id,
       count(*) AS n_cells,
       count(*) FILTER (WHERE tokenized IN ('', 'nan')) AS n_null,
       count(DISTINCT tokenized) AS n_distinct,
       bool_and(is_numeric) AS is_numeric,
       coalesce(round(min(val), 6), 'NaN'::DOUBLE) AS min_val,
       coalesce(round(max(val), 6), 'NaN'::DOUBLE) AS max_val,
       coalesce(round(quantile_cont(val, 0.5), 6), 'NaN'::DOUBLE) AS median_val
FROM c GROUP BY table_id, col_id
"""


def _input_cte(
    table: str,
    query_columns: list[str],
    order_by: list[str],
    extra_cols: list[str] | None = None,
    dedup: bool = True,
) -> str:
    """MATE input prep (mate.py:182-222): row ids in table order, dedup on
    raw query values keeping the first row, tokenize, drop null-ish."""
    nullish = ", ".join(f"'{t}'" for t in NULLISH_TOKENS[:3])
    order = ", ".join(order_by)
    extra = "".join(f", {c}" for c in (extra_cols or []))
    qsel = ", ".join(query_columns)
    toks = ", ".join(
        f"{tokenize_sql(q, 'duckdb')} AS q{i}" for i, q in enumerate(query_columns)
    )
    tok_filter = " AND ".join(
        f"(q{i} IS NOT NULL AND q{i} NOT IN ({nullish}))" for i in range(len(query_columns))
    )
    dedup_cte = (
        f"""__input_dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY {qsel} ORDER BY mate_row_id) AS __rn
    FROM __input_raw
  ) WHERE __rn = 1
)"""
        if dedup
        else "__input_dedup AS (SELECT * FROM __input_raw)"
    )
    return f"""__input_raw AS (
  SELECT {qsel}{extra}, row_number() OVER (ORDER BY {order}) - 1 AS mate_row_id
  FROM {table}
),
{dedup_cte},
input_ok AS (
  SELECT * FROM (SELECT mate_row_id{extra}, {toks} FROM __input_dedup)
  WHERE {tok_filter}
)"""


def mate_join_search_sql(
    input_table: str,
    query_columns: list[str],
    input_order_by: list[str],
    k: int = 10,
    k_c: int = 500,
    min_join_ratio: int = 0,
) -> str:
    """J1/J2/J3 — the full joinability search (super-key filtering omitted:
    it is a sound prefilter and cannot change the verified result)."""
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
    min_ratio_filter = f"HAVING count(*) >= {min_join_ratio}" if min_join_ratio > 0 else ""
    return f"""
WITH {cells_cte()},
{_input_cte(input_table, query_columns, input_order_by)},
hits AS (
  SELECT c.table_id, c.row_id AS ext_row_id, c.col_id AS hit_col_id, i.mate_row_id,
         {", ".join(f"i.q{i}" for i in range(degree))}
  FROM cells c JOIN input_ok i ON c.tokenized = i.q0
),
cand AS (
  SELECT table_id FROM (
    SELECT table_id, row_number() OVER (ORDER BY count(*) DESC, table_id) AS rk
    FROM hits GROUP BY table_id {min_ratio_filter}
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
  SELECT CAST(cnt - 1 AS BIGINT) AS score, table_id, column_combination FROM (
    SELECT *, row_number() OVER (
      PARTITION BY table_id ORDER BY cnt DESC, column_combination) AS rk
    FROM combo_counts
  ) WHERE rk = 1
)
SELECT score, table_id, column_combination FROM best
ORDER BY score DESC, table_id LIMIT {k}
"""


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


def dup_row_groups_sql() -> str:
    return f"""
WITH {cells_cte()},
fp AS (
  SELECT table_id, row_id, list_sort(list(tokenized)) AS row_values
  FROM cells GROUP BY table_id, row_id
)
SELECT table_id, array_to_string(row_values, '|') AS row_values,
       count(*) AS group_size, min(row_id) AS min_row_id
FROM fp GROUP BY table_id, row_values HAVING count(*) > 1
"""


def dup_table_relations_sql() -> str:
    return f"""
WITH {cells_cte()},
fp AS (
  SELECT table_id, row_id, list_sort(list(tokenized)) AS row_values, count(*) AS n_cols
  FROM cells GROUP BY table_id, row_id
),
sizes AS (
  SELECT table_id, max(row_id) + 1 AS n_rows, max(n_cols) AS n_cols
  FROM fp GROUP BY table_id
),
dup AS (
  SELECT a.table_id AS table_id_1, b.table_id AS table_id_2, count(*) AS dup_pairs
  FROM fp a JOIN fp b
    ON a.row_values = b.row_values AND a.table_id < b.table_id
  GROUP BY ALL
)
SELECT d.table_id_1, d.table_id_2
FROM dup d
JOIN sizes s1 ON s1.table_id = d.table_id_1
JOIN sizes s2 ON s2.table_id = d.table_id_2
WHERE s1.n_cols = s2.n_cols AND d.dup_pairs >= least(s1.n_rows, s2.n_rows)
"""


def header_search_sql(query: str, k: int = 10) -> str:
    """Schema-search twin: rebuild the header table from the shared lake
    spec, tokenize with the shared SQL tokenizer, rank by word overlap
    with the (Python-side shared-tokenizer) query words."""
    from datalake_indexes_spark.functions.text import tokenize_py, tokenize_sql

    words = [w for w in tokenize_py(query).split(" ") if w]
    warr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    values = ", ".join(
        f"({s.table_id}, {ci}, '{c}')"
        for s in TESTDATA_LAKE_SPEC.values()
        for ci, c in enumerate(s.cols)
    )
    return f"""
WITH h(table_id, col_id, header) AS (VALUES {values}),
ht AS (
  SELECT table_id, col_id, header, {tokenize_sql('header', 'duckdb')} AS t FROM h
),
o AS (
  SELECT table_id, col_id, header,
         CAST(len(list_intersect(list_distinct(string_split(t, ' ')), {warr})) AS BIGINT) AS overlap
  FROM ht
)
SELECT table_id, col_id, header, overlap
FROM o WHERE overlap > 0
ORDER BY overlap DESC, table_id, col_id
LIMIT {k}
"""


def dup_rows_planted_sql() -> str:
    """J5 pair view over the PLANTED duplicate lake (catalog.py
    PLANTED_DUP_SPEC): the engine pairs rows whose XASH super keys match
    and verifies by sorted value multiset; equal rows always hash equal
    and collisions are dropped by the value check, so the verified output
    is exactly the value-equal pairs the oracle computes directly."""
    from datalake_indexes_spark.sources.catalog import PLANTED_DUP_SPEC

    return f"""
WITH {cells_cte(PLANTED_DUP_SPEC)},
fp AS (
  SELECT table_id, row_id, list_sort(list(tokenized)) AS row_values
  FROM cells GROUP BY table_id, row_id
)
SELECT a.table_id AS table_id_1, a.row_id AS row_id_1,
       b.table_id AS table_id_2, b.row_id AS row_id_2
FROM fp a JOIN fp b
  ON a.row_values = b.row_values
 AND (a.table_id < b.table_id
      OR (a.table_id = b.table_id AND a.row_id < b.row_id))
"""


def dup_row_groups_planted_sql() -> str:
    from datalake_indexes_spark.sources.catalog import PLANTED_DUP_SPEC

    return f"""
WITH {cells_cte(PLANTED_DUP_SPEC)},
fp AS (
  SELECT table_id, row_id, list_sort(list(tokenized)) AS row_values
  FROM cells GROUP BY table_id, row_id
)
SELECT table_id, array_to_string(row_values, '|') AS row_values,
       count(*) AS group_size, min(row_id) AS min_row_id
FROM fp GROUP BY table_id, row_values HAVING count(*) > 1
"""


def dup_table_relations_planted_sql() -> str:
    from datalake_indexes_spark.sources.catalog import PLANTED_DUP_SPEC

    return f"""
WITH {cells_cte(PLANTED_DUP_SPEC)},
fp AS (
  SELECT table_id, row_id, list_sort(list(tokenized)) AS row_values, count(*) AS n_cols
  FROM cells GROUP BY table_id, row_id
),
sizes AS (
  SELECT table_id, max(row_id) + 1 AS n_rows, max(n_cols) AS n_cols
  FROM fp GROUP BY table_id
),
dup AS (
  SELECT a.table_id AS table_id_1, b.table_id AS table_id_2, count(*) AS dup_pairs
  FROM fp a JOIN fp b
    ON a.row_values = b.row_values AND a.table_id < b.table_id
  GROUP BY ALL
)
SELECT d.table_id_1, d.table_id_2
FROM dup d
JOIN sizes s1 ON s1.table_id = d.table_id_1
JOIN sizes s2 ON s2.table_id = d.table_id_2
WHERE s1.n_cols = s2.n_cols AND d.dup_pairs >= least(s1.n_rows, s2.n_rows)
"""


def dup_groups_planted_sql() -> str:
    """D2 twin — components of the planted relation graph.

    General connected components is iterative and not one-shot SQL; the
    PLANTED graph is constructed so every node is directly adjacent to its
    component's minimum (star {1,100,101} + pair {0,102}), for which
    ``rep(n) = least(n, min(neighbor))`` is exact — the ENGINE still runs
    its general union-find/large-star machinery, only the oracle exploits
    the fixture's shape."""
    rel = dup_table_relations_planted_sql()
    return f"""
WITH rel AS ({rel}),
edges AS (
  SELECT table_id_1 AS u, table_id_2 AS v FROM rel
  UNION
  SELECT table_id_2 AS u, table_id_1 AS v FROM rel
)
SELECT CAST(u AS BIGINT) AS table_id,
       CAST(least(u, min(v)) AS BIGINT) AS representative
FROM edges GROUP BY u
"""


def get_table_pivot_sql(table_name: str) -> str:
    """S10 twin — the reconstructed table carries its STORED HEADERS as
    column names (data_handler.py:679-685), which for the curated lake are
    the spec's column names."""
    spec = TESTDATA_LAKE_SPEC[table_name]
    cols = ", ".join(
        f'max(CASE WHEN col_id = {i} THEN tokenized END) AS "{c}"'
        for i, c in enumerate(spec.cols)
    )
    return f"""
WITH {cells_cte()}
SELECT row_id, {cols}
FROM cells WHERE table_id = {spec.table_id}
GROUP BY row_id
"""


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


# ---------------------------------------------------------------------------
# Training-data-pipeline operator oracles (dedup / similarity / text /
# multimodal / events) — same shared-constants discipline: thresholds, hash
# families, marker lists come from the operator modules.
# ---------------------------------------------------------------------------

def _shingle_cte(n: int = 3) -> str:
    """Distinct word n-gram shingles per document (twin of
    operators/dedup.py word_shingles)."""
    gram = " || ' ' || ".join(f"w[CAST(i+{j+1} AS INT)]" for j in range(n))
    return f"""__words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, {gram} AS shingle
  FROM __words, UNNEST(range(greatest(len(w)-{n - 1}, 0))) AS t(i)
)"""


def dedup_exact_sql() -> str:
    return """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,
       count(*) AS group_size
FROM documents GROUP BY md5(text)
"""


def _jaccard_ctes() -> str:
    return """sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_id_1, c.doc_id_2, count(*) AS i
  FROM cand c
  JOIN sh s1 ON s1.doc_id = c.doc_id_1
  JOIN sh s2 ON s2.doc_id = c.doc_id_2 AND s2.shingle = s1.shingle
  GROUP BY 1, 2
)"""


def _jaccard_select(threshold: float) -> str:
    return f"""SELECT i.doc_id_1, i.doc_id_2,
       round(i.i * 1.0 / (n1.n + n2.n - i.i), 4) AS jaccard
FROM inter i
JOIN sizes n1 ON n1.doc_id = i.doc_id_1
JOIN sizes n2 ON n2.doc_id = i.doc_id_2
WHERE i.i * 1.0 / (n1.n + n2.n - i.i) >= {threshold}"""


def _minhash_pairs_ctes(k: int = 16, bands: int = 4, threshold: float = 0.7) -> str:
    """CTE chain ending in ``pairs(doc_id_1, doc_id_2, jaccard)`` — shared
    by the pair query and the cluster query."""
    rows = k // bands
    mins = ", ".join(f"min(md5('{j}:' || shingle)) AS mh{j}" for j in range(k))
    band_sel = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {key} AS key FROM mh".format(
            b=b, key=" || ".join(f"mh{b * rows + r}" for r in range(rows))
        )
        for b in range(bands)
    )
    return f"""{_shingle_cte()},
mh AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
bands AS ({band_sel}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
{_jaccard_ctes()},
pairs AS (
{_jaccard_select(threshold)}
)"""


def dedup_minhash_lsh_sql(k: int = 16, bands: int = 4, threshold: float = 0.7) -> str:
    return f"""
WITH {_minhash_pairs_ctes(k, bands, threshold)}
SELECT doc_id_1, doc_id_2, jaccard FROM pairs
"""


def dedup_neardup_est_sql(k: int = 16, bands: int = 4, threshold: float = 0.5) -> str:
    """Twin of the streaming near-dup semantics (neardup_pairs_est):
    band-collision candidates verified by the SIGNATURE-estimated Jaccard
    (fraction of agreeing minhash components) — what the stream computes
    against its persisted signature store instead of re-shingling
    history."""
    rows = k // bands
    mins = ", ".join(f"min(md5('{j}:' || shingle)) AS mh{j}" for j in range(k))
    band_sel = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {key} AS key FROM mh".format(
            b=b, key=" || ".join(f"mh{b * rows + r}" for r in range(rows))
        )
        for b in range(bands)
    )
    agree = " + ".join(
        f"CASE WHEN x.mh{j} = y.mh{j} THEN 1 ELSE 0 END" for j in range(k)
    )
    return f"""
WITH {_shingle_cte()},
mh AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
bands AS ({band_sel}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT c.doc_id_1, c.doc_id_2,
       round(({agree}) * 1.0 / {k}, 4) AS est_jaccard
FROM cand c
JOIN mh x ON x.doc_id = c.doc_id_1
JOIN mh y ON y.doc_id = c.doc_id_2
WHERE ({agree}) * 1.0 / {k} >= {threshold}
"""


def dedup_ngram_jaccard_sql(threshold: float = 0.7) -> str:
    return f"""
WITH {_shingle_cte()},
cand AS (
  SELECT DISTINCT s1.doc_id AS doc_id_1, s2.doc_id AS doc_id_2
  FROM sh s1 JOIN sh s2
    ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
),
{_jaccard_ctes()}
{_jaccard_select(threshold)}
"""


def dedup_ngram_capped_sql(threshold: float = 0.7, max_freq: int = 50) -> str:
    """Twin of the hot-shingle-capped path: candidates only from shingles
    with document frequency <= max_freq; verification (and the reported
    jaccard) over the FULL shingle sets."""
    return f"""
WITH {_shingle_cte()},
rare AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {max_freq}
),
cand AS (
  SELECT DISTINCT s1.doc_id AS doc_id_1, s2.doc_id AS doc_id_2
  FROM sh s1 JOIN sh s2
    ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
  WHERE s1.shingle IN (SELECT shingle FROM rare)
),
{_jaccard_ctes()}
{_jaccard_select(threshold)}
"""


def dedup_recall_report_sql(threshold: float = 0.7) -> str:
    """Twin of :func:`..operators.dedup.dedup_recall_report`: minhash
    pairs from the shared CTE chain, truth from an independent exact
    shingle self-join, one recall row."""
    return f"""
WITH {_minhash_pairs_ctes(threshold=threshold)},
t_inter AS (
  SELECT s1.doc_id AS doc_id_1, s2.doc_id AS doc_id_2, count(*) AS i
  FROM sh s1 JOIN sh s2
    ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT i.doc_id_1, i.doc_id_2
  FROM t_inter i
  JOIN sizes n1 ON n1.doc_id = i.doc_id_1
  JOIN sizes n2 ON n2.doc_id = i.doc_id_2
  WHERE i.i * 1.0 / (n1.n + n2.n - i.i) >= {threshold}
),
found AS (
  SELECT count(*) AS n_found FROM truth JOIN pairs USING (doc_id_1, doc_id_2)
),
tot AS (SELECT count(*) AS n_truth FROM truth)
SELECT {threshold} AS threshold,
       CAST(n_truth AS BIGINT) AS n_truth,
       CAST(n_found AS BIGINT) AS n_found,
       CASE WHEN n_truth > 0 THEN round(n_found * 1.0 / n_truth, 6)
            ELSE 1.0 END AS recall
FROM tot CROSS JOIN found
"""


def dedup_containment_sql(threshold: float = 0.8, max_freq: int = 500) -> str:
    """Twin of :func:`..operators.dedup.ngram_containment_pairs`:
    capped-shingle candidate generation, FULL-set verification, pair kept
    when either directional containment clears the threshold."""
    return f"""
WITH {_shingle_cte()},
rare AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {max_freq}
),
cand AS (
  SELECT DISTINCT s1.doc_id AS doc_id_1, s2.doc_id AS doc_id_2
  FROM sh s1 JOIN sh s2
    ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
  WHERE s1.shingle IN (SELECT shingle FROM rare)
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_id_1, c.doc_id_2, count(*) AS i
  FROM cand c
  JOIN sh s1 ON s1.doc_id = c.doc_id_1
  JOIN sh s2 ON s2.doc_id = c.doc_id_2 AND s2.shingle = s1.shingle
  GROUP BY 1, 2
)
SELECT i.doc_id_1, i.doc_id_2,
       round(i.i * 1.0 / n1.n, 4) AS containment_1_in_2,
       round(i.i * 1.0 / n2.n, 4) AS containment_2_in_1,
       round(i.i * 1.0 / (n1.n + n2.n - i.i), 4) AS jaccard
FROM inter i
JOIN sizes n1 ON n1.doc_id = i.doc_id_1
JOIN sizes n2 ON n2.doc_id = i.doc_id_2
WHERE i.i * 1.0 / n1.n >= {threshold} OR i.i * 1.0 / n2.n >= {threshold}
"""


def dedup_subset_sql(threshold: float = 0.8, max_freq: int = 500) -> str:
    """Twin of :func:`..operators.dedup.subset_dedup`: containment pairs
    → directed contained-in-larger edges → smallest qualifying container
    per dropped doc; kept docs have no container."""
    return f"""
WITH {_shingle_cte()},
rare AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {max_freq}
),
cand AS (
  SELECT DISTINCT s1.doc_id AS doc_id_1, s2.doc_id AS doc_id_2
  FROM sh s1 JOIN sh s2
    ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
  WHERE s1.shingle IN (SELECT shingle FROM rare)
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_id_1, c.doc_id_2, count(*) AS i
  FROM cand c
  JOIN sh s1 ON s1.doc_id = c.doc_id_1
  JOIN sh s2 ON s2.doc_id = c.doc_id_2 AND s2.shingle = s1.shingle
  GROUP BY 1, 2
),
pairs AS (
  SELECT i.doc_id_1, i.doc_id_2, i.i, n1.n AS n1, n2.n AS n2
  FROM inter i
  JOIN sizes n1 ON n1.doc_id = i.doc_id_1
  JOIN sizes n2 ON n2.doc_id = i.doc_id_2
),
edges AS (
  SELECT doc_id_1 AS x, doc_id_2 AS y, n1 AS nx, n2 AS ny FROM pairs
  WHERE i * 1.0 / n1 >= {threshold}
  UNION ALL
  SELECT doc_id_2, doc_id_1, n2, n1 FROM pairs
  WHERE i * 1.0 / n2 >= {threshold}
),
containers AS (
  SELECT x AS doc_id, min(y) AS container_id FROM edges
  WHERE ny > nx OR (ny = nx AND y < x) GROUP BY x
)
SELECT d.doc_id, coalesce(s.n, 0) AS n_shingles,
       c.container_id IS NULL AS kept,
       coalesce(c.container_id, -1) AS container_id
FROM documents d
LEFT JOIN sizes s ON s.doc_id = d.doc_id
LEFT JOIN containers c ON c.doc_id = d.doc_id
"""


def dedup_clusters_sql(k: int = 16, bands: int = 4, threshold: float = 0.7) -> str:
    """Near-dup retention clusters over the MinHash pairs: connected
    components via a recursive transitive-closure CTE (cluster sizes are
    bounded by near-dup group sizes, so the closure stays tiny)."""
    return f"""
WITH RECURSIVE {_minhash_pairs_ctes(k, bands, threshold)},
edges AS (
  SELECT doc_id_1 AS a, doc_id_2 AS b FROM pairs
  UNION SELECT doc_id_2, doc_id_1 FROM pairs
),
reach(node, r) AS (
  SELECT a, b FROM edges
  UNION
  SELECT re.node, e.b FROM reach re JOIN edges e ON e.a = re.r
)
SELECT node AS doc_id, least(node, min(r)) AS representative
FROM reach GROUP BY node
"""


def _simhash_cte(bits: int = 64) -> str:
    sums = ", ".join(
        f"sum(tf * (2 * (((strpos('0123456789abcdef', substr(h, {i // 4 + 1}, 1)) - 1 "
        f">> {i % 4}) & 1)) - 1)) AS v{i}"
        for i in range(bits)
    )
    bit_concat = " || ".join(
        f"(CASE WHEN v{i} > 0 THEN '1' ELSE '0' END)" for i in range(bits)
    )
    return f"""__tf AS (
  SELECT doc_id, word, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY 1, 2
),
__wb AS (SELECT doc_id, tf, md5(word) AS h FROM __tf),
__sums AS (SELECT doc_id, {sums} FROM __wb GROUP BY doc_id),
sig AS (SELECT doc_id, {bit_concat} AS simhash FROM __sums)"""


def text_simhash_sql() -> str:
    return f"WITH {_simhash_cte()} SELECT doc_id, simhash FROM sig"


def dedup_simhash_sql(max_hamming: int = 8, bands: int = 4) -> str:
    band_len = 64 // bands
    band_sel = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band, substr(simhash, {b * band_len + 1}, {band_len}) AS key FROM sig"
        for b in range(bands)
    )
    return f"""
WITH {_simhash_cte()},
bands AS ({band_sel}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
         a.simhash AS sa, b.simhash AS sb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT doc_id_1, doc_id_2,
       CAST(bit_count(xor(sa::BIT, sb::BIT)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(sa::BIT, sb::BIT)) <= {max_hamming}
"""


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


def dedup_source_matrix_sql(k: int = 16, bands: int = 4, threshold: float = 0.7) -> str:
    """Source-matrix twin over the same MinHash pair CTEs."""
    return f"""
WITH {_minhash_pairs_ctes(k, bands, threshold)},
src AS (SELECT doc_id, source FROM documents),
sized AS (SELECT source, count(*) AS n FROM src GROUP BY 1),
tagged AS (
  SELECT least(s1.source, s2.source) AS source_a,
         greatest(s1.source, s2.source) AS source_b
  FROM pairs p
  JOIN src s1 ON s1.doc_id = p.doc_id_1
  JOIN src s2 ON s2.doc_id = p.doc_id_2
),
counts AS (
  SELECT source_a, source_b, count(*) AS n_pairs FROM tagged GROUP BY 1, 2
)
SELECT source_a, source_b, n_pairs,
       na.n AS n_docs_a, nb.n AS n_docs_b,
       round(n_pairs / (CASE WHEN source_a = source_b
                             THEN na.n * (na.n - 1) / 2.0
                             ELSE CAST(na.n AS DOUBLE) * nb.n END), 6) AS dup_rate
FROM counts
JOIN sized na ON na.source = counts.source_a
JOIN sized nb ON nb.source = counts.source_b
"""


def dedup_embedding_cosine_sql(threshold: float = 0.4, n_planes: int = 4) -> str:
    """Oracle for the LSH-blocked cosine dedup.  Replicates the *same*
    hyperplane blocking (identical md5-seeded planes inlined as literals),
    so Spark and DuckDB agree pair-for-pair on the approximate result —
    the approximation itself is the operator's contract, not a looseness
    in the check."""
    from datalake_indexes_spark.operators.similarity import hyperplanes

    planes = hyperplanes(64, n_planes)
    sig_bits = " || ".join(
        "(CASE WHEN list_dot_product(e::DOUBLE[], {arr}::DOUBLE[]) >= 0 THEN '1' ELSE '0' END)".format(
            arr="[" + ", ".join(repr(w) for w in plane) + "]"
        )
        for plane in planes
    )
    return f"""
WITH u AS (SELECT vec_id, embedding AS e, {sig_bits} AS sig FROM embeddings)
SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
       round(list_cosine_similarity(a.e::DOUBLE[], b.e::DOUBLE[]), 4) AS cosine
FROM u a JOIN u b ON a.sig = b.sig AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.e::DOUBLE[], b.e::DOUBLE[]) >= {threshold}
"""


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


def corpus_prep_sql(quality_threshold: float = 0.55, jaccard_threshold: float = 0.7) -> str:
    """Composed corpus-prep twin: quality filter + near-dup drop."""
    return f"""
WITH RECURSIVE {_minhash_pairs_ctes(threshold=jaccard_threshold)},
edges AS (
  SELECT doc_id_1 AS a, doc_id_2 AS b FROM pairs
  UNION SELECT doc_id_2, doc_id_1 FROM pairs
),
reach(node, r) AS (
  SELECT a, b FROM edges
  UNION
  SELECT re.node, e.b FROM reach re JOIN edges e ON e.a = re.r
),
drop_docs AS (
  SELECT node AS doc_id FROM reach GROUP BY node
  HAVING least(node, min(r)) != node
),
quality AS (SELECT * FROM ({text_quality_sql()}) q)
SELECT q.doc_id, q.n_words, q.quality_score
FROM quality q ANTI JOIN drop_docs d ON q.doc_id = d.doc_id
WHERE q.quality_score >= {quality_threshold}
"""


def corpus_prep_full_sql(
    quality_threshold: float = 0.55,
    repetition_cap: float = 0.2,
    token_budget: int = 2048,
) -> str:
    """Full-curation twin: quality + repetition filters, earliest-keep
    exact dedup, PII scrub, then the packing prefix sum over survivors."""
    from datalake_indexes_spark.operators.text_analysis import PII_PATTERNS

    email, e_rep = PII_PATTERNS["email"]
    ipv4, i_rep = PII_PATTERNS["ipv4"]
    phone, p_rep = PII_PATTERNS["phone"]
    scrub = (
        f"regexp_replace(regexp_replace(regexp_replace(d.text, "
        f"'{email}', '{e_rep}', 'g'), '{ipv4}', '{i_rep}', 'g'), "
        f"'{phone}', '{p_rep}', 'g')"
    )
    return f"""
WITH q AS (
  SELECT doc_id FROM ({text_quality_sql()}) WHERE quality_score >= {quality_threshold}
),
r AS (
  SELECT doc_id FROM ({text_repetition_sql()}) WHERE top_bigram_frac <= {repetition_cap}
),
keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
surv AS (
  SELECT d.doc_id, {scrub} AS text
  FROM documents d
  JOIN q USING (doc_id) JOIN r USING (doc_id) JOIN keep USING (doc_id)
),
t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM surv
),
c AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(prior // {token_budget} AS BIGINT) AS pack_id,
       CAST(prior % {token_budget} AS BIGINT) AS pack_offset
FROM c
"""


def text_token_counts_sql() -> str:
    from datalake_indexes_spark.operators.text_analysis import TOKEN_REGEX

    return f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS n_re_tokens,
       length(text) AS n_chars_seen
FROM documents
"""


def text_bpe_counts_sql(n_merges: int = 64, max_types: int = 50_000) -> str:
    """BPE subword token counts twin — a full in-SQL replay of
    :func:`..functions.bpe.train_bpe` + ``apply_bpe`` (greedy apply ==
    training replay; tests/test_bpe.py pins that parity).

    Training is ``n_merges`` unrolled rounds, the same move the
    pagerank/HITS twins use for iteration: each round counts adjacent
    symbol pairs weighted by word frequency (every position, overlaps
    included, exactly the engine's ``zip(symbols, symbols[1:])``), picks
    the (count DESC, pair ASC) argmax with the engine's
    ``best_count >= 2`` stop (an empty argmax makes the round a no-op,
    mirroring the Python ``break``), and rewrites every word's symbol
    list leftmost-greedy.  Greedy non-overlap is exact in one window
    pass: two ADJACENT match positions force a == b, so within each
    island of consecutive matches the real merge starts are the even
    offsets from the island start.

    Symbol lists stay keyed by word — two distinct words can never
    share a list (lists concatenate back to word + '</w>'), so the
    engine's regroup-by-sequence is the identity and after the final
    round ``len(syms)`` IS the word's encoded length; per-document
    counts are one words->doc join away.  Assumes every corpus word
    sits inside the ``max_types`` frequency cap (true at the graded
    SFs — the synthetic corpus has ~31 word types); the engine encodes
    capped-out words with the same ranks anyway.
    """
    # the explicit ASCII class shared with functions/bpe.py (WS_CLASS):
    # RE2's \\s omits \\x0B and Python str.split() is Unicode-wide, so
    # all three surfaces spell the class out to pin identical word
    # boundaries on any corpus
    ws = "[ \\t\\n\\x0B\\f\\r]+"
    parts = [
        f"""WITH w AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(regexp_split_to_array(text, '{ws}')) AS word FROM documents
  ) WHERE word <> '' GROUP BY word
),
types AS MATERIALIZED (
  SELECT word, freq FROM w ORDER BY freq DESC, word LIMIT {max_types}
),
v0 AS MATERIALIZED (
  SELECT word, freq, list_append(string_split(word, ''), '</w>') AS syms
  FROM types
)"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f"""p{i} AS MATERIALIZED (
  SELECT a, b, sum(freq) AS c FROM (
    SELECT syms[j] AS a, syms[j + 1] AS b, freq FROM (
      SELECT unnest(range(1, len(syms))) AS j, syms, freq FROM v{i - 1})
  ) GROUP BY 1, 2
),
b{i} AS MATERIALIZED (
  SELECT a, b, a || b AS ab FROM p{i} WHERE c >= 2 ORDER BY c DESC, a, b LIMIT 1
),
s{i} AS MATERIALIZED (
  SELECT word, freq, j, ab, syms,
         hit AND ((j - min(j) OVER (PARTITION BY word, isl)) % 2 = 0) AS strt
  FROM (
    SELECT *, CASE WHEN hit THEN j - (row_number() OVER
        (PARTITION BY word, hit ORDER BY j)) END AS isl
    FROM (
      SELECT word, freq, syms, ab, j,
             (j < len(syms) AND syms[j] = a AND syms[j + 1] = b) AS hit
      FROM (SELECT unnest(range(1, len(syms) + 1)) AS j, word, freq, syms,
                   a, b, ab
            FROM v{i - 1}, b{i})))
),
v{i} AS MATERIALIZED (
  SELECT word, min(freq) AS freq,
         list(CASE WHEN strt THEN ab ELSE syms[j] END ORDER BY j) AS syms
  FROM (SELECT *, coalesce(lag(strt) OVER (PARTITION BY word ORDER BY j),
                           FALSE) AS gone
        FROM s{i})
  WHERE NOT gone GROUP BY word
  UNION ALL
  SELECT word, freq, syms FROM v{i - 1}
  WHERE (SELECT count(*) FROM b{i}) = 0
)"""
        )
    body = ",\n".join(parts)
    return f"""
{body},
wl AS MATERIALIZED (SELECT word, len(syms) AS n FROM v{n_merges}),
dw AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '{ws}')) AS word
  FROM documents
),
dt AS (
  SELECT dw.doc_id, CAST(sum(wl.n) AS BIGINT) AS n
  FROM dw JOIN wl USING (word) GROUP BY dw.doc_id
)
SELECT d.doc_id, coalesce(dt.n, CAST(0 AS BIGINT)) AS n_bpe_tokens
FROM documents d LEFT JOIN dt USING (doc_id)
"""


def text_quality_sql() -> str:
    from datalake_indexes_spark.functions.text import STOPWORDS

    stops = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w, length(text) AS nc FROM documents
),
m AS (
  SELECT doc_id,
         len(w) AS n_words,
         (nc - (len(w) - 1)) * 1.0 / len(w) AS avg_len,
         len(list_filter(w, x -> list_contains([{stops}], x))) * 1.0 / len(w) AS stop_ratio,
         len(list_distinct(w)) * 1.0 / len(w) AS distinct_ratio
  FROM base
)
SELECT doc_id, n_words,
       round(avg_len, 4) AS avg_word_len,
       round(stop_ratio, 4) AS stopword_ratio,
       round(distinct_ratio, 4) AS distinct_ratio,
       round(0.5 * distinct_ratio + 0.3 * least(avg_len / 8.0, 1.0)
             + 0.2 * (1.0 - stop_ratio), 4) AS quality_score
FROM m
"""


def corpus_budget_select_sql(budget: int = 20_000) -> str:
    """Twin of :func:`..operators.text_analysis.budget_select` over
    quality_scores: a plain global window here (the oracle runs at test
    scale; the engine does the two-level distributed prefix sum)."""
    return f"""
WITH q AS ({text_quality_sql()}),
s AS (
  SELECT doc_id, quality_score, CAST(n_words AS BIGINT) AS n_tokens FROM q
),
c AS (
  SELECT *, CAST(sum(n_tokens) OVER (
              ORDER BY quality_score DESC, doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM s
)
SELECT doc_id, quality_score, n_tokens, cum_tokens
FROM c WHERE cum_tokens <= {budget}
"""


def text_langid_sql() -> str:
    from datalake_indexes_spark.operators.text_analysis import LANG_MARKERS

    lang_rows = " UNION ALL ".join(
        "SELECT doc_id, '{lang}' AS lang, len(list_filter(w, x -> list_contains([{m}], x))) AS hits FROM base".format(
            lang=lang, m=", ".join(f"'{w}'" for w in markers)
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    )
    return f"""
WITH base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
scores AS ({lang_rows}),
best AS (
  SELECT doc_id, lang, hits,
         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang ASC) AS rk
  FROM scores
)
SELECT doc_id,
       CASE WHEN hits > 0 THEN lang ELSE 'und' END AS pred_lang,
       hits AS marker_hits
FROM best WHERE rk = 1
"""


def text_pii_scrub_sql() -> str:
    """PII redaction twin — patterns shared with the engine
    (text_analysis.PII_PATTERNS), restricted to syntax RE2 and Java regex
    evaluate identically."""
    from datalake_indexes_spark.operators.text_analysis import PII_PATTERNS

    email, e_rep = PII_PATTERNS["email"]
    ipv4, i_rep = PII_PATTERNS["ipv4"]
    phone, p_rep = PII_PATTERNS["phone"]
    return f"""
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' reach me at user' || CAST(doc_id AS VARCHAR)
                   || '@example.com' || ' or 10.0.'
                   || CAST(doc_id % 256 AS VARCHAR) || '.7'
                   || ' or +1 555 20' || CAST(doc_id % 90 + 10 AS VARCHAR)
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{email}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{ipv4}')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(text, '{phone}')) AS BIGINT) AS n_phones,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{email}', '{e_rep}', 'g'),
           '{ipv4}', '{i_rep}', 'g'),
           '{phone}', '{p_rep}', 'g') AS scrubbed
FROM p
"""


def text_script_ratios_sql() -> str:
    """Unicode-script composition twin — ranges and planted suffixes shared
    with the engine (text_analysis.SCRIPT_RANGES / SCRIPT_PLANT_SUFFIXES);
    literal BMP ranges evaluate identically under RE2 and Java regex."""
    from datalake_indexes_spark.operators.text_analysis import (
        SCRIPT_PLANT_SUFFIXES,
        SCRIPT_RANGES,
    )

    plant = " ".join(
        f"WHEN {m} THEN text || '{sfx}'" for m, sfx in SCRIPT_PLANT_SUFFIXES.items()
    )
    count_cols = ",\n         ".join(
        f"len(text) - len(regexp_replace(text, '[{r}]', '', 'g')) AS n_{name}"
        for name, r in {**SCRIPT_RANGES, "digit": "0-9", "space": " "}.items()
    )
    return f"""
WITH p AS (
  SELECT doc_id, CASE doc_id % 4 {plant} ELSE text END AS text FROM documents
),
c AS (
  SELECT doc_id, len(text) AS total,
         {count_cols}
  FROM p
)
SELECT doc_id, CAST(total AS BIGINT) AS n_chars_total,
       round(n_latin / total, 4) AS latin_ratio,
       round(n_cyrillic / total, 4) AS cyrillic_ratio,
       round(n_cjk / total, 4) AS cjk_ratio,
       round(n_arabic / total, 4) AS arabic_ratio,
       round(n_digit / total, 4) AS digit_ratio,
       round(n_space / total, 4) AS space_ratio,
       round((total - n_latin - n_cyrillic - n_cjk - n_arabic - n_digit - n_space) / total, 4) AS other_ratio,
       CASE WHEN n_latin >= greatest(n_cyrillic, n_cjk, n_arabic) THEN 'latin'
            WHEN n_cyrillic >= greatest(n_cjk, n_arabic) THEN 'cyrillic'
            WHEN n_cjk >= n_arabic THEN 'cjk' ELSE 'arabic' END AS dominant_script
FROM c
"""


def text_keywords_sql(k: int = 3) -> str:
    """tf-idf keyword twin: same tf/df/N definition, same ln scoring,
    same word tie-break."""
    return f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (
  SELECT doc_id, word, count(*) AS tf FROM w WHERE word != '' GROUP BY 1, 2
),
dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.word, tf.tf * ln(n.n_docs / CAST(dfreq.df AS DOUBLE)) AS score
  FROM tf JOIN dfreq USING (word) CROSS JOIN n
)
SELECT doc_id, word AS keyword, rank, round(score, 4) AS score
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS rank
      FROM scored)
WHERE rank <= {k}
"""


def text_entropy_sql() -> str:
    """Entropy twin: same word split (empty tokens included), same
    H = ln(n) - Σ c·ln(c)/n formula."""
    return """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
c AS (SELECT doc_id, word, CAST(count(*) AS DOUBLE) AS c FROM w GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_words,
       count(*) AS n_distinct,
       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 4) AS entropy
FROM c GROUP BY doc_id
"""


def text_repetition_sql() -> str:
    """Gopher-style repetition twin: most-repeated unigram/bigram coverage
    per document."""
    return """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
wc AS (SELECT doc_id, g, count(*) AS cnt
       FROM (SELECT doc_id, unnest(ws) AS g FROM w) GROUP BY ALL),
uni AS (SELECT doc_id, sum(cnt) AS n_words, max(cnt) AS top_word FROM wc GROUP BY doc_id),
bgl AS (SELECT doc_id, CASE WHEN len(ws) >= 2
            THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
            ELSE [] END AS bgs FROM w),
bc AS (SELECT doc_id, g, count(*) AS cnt
       FROM (SELECT doc_id, unnest(bgs) AS g FROM bgl) GROUP BY ALL),
bi AS (SELECT doc_id, sum(cnt) AS n_bigrams, max(cnt) AS top_bigram FROM bc GROUP BY doc_id)
SELECT u.doc_id,
       CAST(u.n_words AS BIGINT) AS n_words,
       CAST(u.top_word AS BIGINT) AS top_word_count,
       round(u.top_word * 1.0 / u.n_words, 4) AS top_word_frac,
       CAST(coalesce(bi.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(bi.top_bigram, 0) AS BIGINT) AS top_bigram_count,
       round(coalesce(bi.top_bigram * 1.0 / bi.n_bigrams, 0.0), 4) AS top_bigram_frac
FROM uni u LEFT JOIN bi USING (doc_id)
"""


def corpus_sample_sql(fractions: dict[str, float], default_fraction: float = 1.0) -> str:
    """Stratified-sample twin: the md5-bucket membership rule is a pure
    function of doc_id, so both engines select the same rows."""
    cases = " ".join(
        f"WHEN lang = '{s}' THEN {f}" for s, f in sorted(fractions.items())
    )
    return f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000
      < (CASE {cases} ELSE {default_fraction} END) * 10000
"""


def corpus_pack_sql(token_budget: int = 2048) -> str:
    """Packing twin — plain window prefix sum (the oracle need not be
    distributed; the engine's bucketed cascade must produce identical
    numbers)."""
    return f"""
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(prior // {token_budget} AS BIGINT) AS pack_id,
       CAST(prior % {token_budget} AS BIGINT) AS pack_offset
FROM c
"""


def text_fingerprint_sql() -> str:
    return """
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bag_fingerprint,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_words
FROM documents
"""


def multimodal_pixel_stats_sql() -> str:
    """Twin of ``image_pixel_stats`` over the planted PNGs — grayscale
    for most docs, color-type-3 palette (identity grayscale PLTE) for
    ``doc_id % 4 == 0``.  The engine inflates and unfilters a REAL PNG
    IDAT (and walks the PLTE lookup on palette rows); the oracle
    recomputes the stats straight from the planted pixel source (first
    64 printable-ASCII text chars, space-padded) — palette rows carry
    the SAME bytes tripled across RGB, so n_px gains a x3 and min/max/
    mean are unchanged.  The mean is sum/64 — a dyadic quotient, exact
    on both engines with no rounding step."""
    from datalake_indexes_spark.operators.multimodal import REAL_PNG_H, REAL_PNG_W

    n = REAL_PNG_W * REAL_PNG_H
    return f"""
WITH s AS (
  SELECT doc_id,
         rpad(regexp_replace(coalesce(text, ''), '[^\\x20-\\x7E]', ' ', 'g'),
              {n}, ' ') AS px,
         CASE WHEN doc_id % 4 = 0 THEN 3 ELSE 1 END AS nch
  FROM documents
),
b AS (
  SELECT doc_id, ord(c) AS v
  FROM (SELECT doc_id, unnest(string_split(px, '')) AS c FROM s)
)
SELECT b.doc_id,
       CAST({REAL_PNG_W} AS INT) AS width,
       CAST({REAL_PNG_H} AS INT) AS height,
       CAST({n} * s.nch AS INT) AS n_px,
       CAST(min(v) AS INT) AS px_min,
       CAST(max(v) AS INT) AS px_max,
       CAST(sum(v) AS DOUBLE) / {n} AS px_mean
FROM b JOIN s USING (doc_id) GROUP BY b.doc_id, s.nch
"""


def multimodal_jpeg_pixel_stats_sql() -> str:
    """Twin of ``image_pixel_stats(attach_real_jpeg(documents))`` — the
    engine Huffman-decodes + IDCTs a REAL baseline JPEG whose 64 flat
    8x8 tiles are the first 64 printable-ASCII text chars; flat tiles
    decode bit-exactly, so the oracle recomputes the stats straight
    from ``text``.  Each byte fills a 64-px tile: px_sum = 64·Σv and
    the mean (64·Σv)/4096 is a dyadic quotient — exact on both
    engines, no rounding step."""
    from datalake_indexes_spark.operators.multimodal import (
        JPEG_TILES_H,
        JPEG_TILES_W,
    )

    n_tiles = JPEG_TILES_W * JPEG_TILES_H
    w, h = JPEG_TILES_W * 8, JPEG_TILES_H * 8
    n_px = w * h
    return f"""
WITH s AS (
  SELECT doc_id,
         rpad(regexp_replace(coalesce(text, ''), '[^\\x20-\\x7E]', ' ', 'g'),
              {n_tiles}, ' ') AS px
  FROM documents
),
b AS (
  SELECT doc_id, ord(c) AS v
  FROM (SELECT doc_id, unnest(string_split(px, '')) AS c FROM s)
)
SELECT doc_id,
       CAST({w} AS INT) AS width,
       CAST({h} AS INT) AS height,
       CAST({n_px} AS INT) AS n_px,
       CAST(min(v) AS INT) AS px_min,
       CAST(max(v) AS INT) AS px_max,
       CAST(sum(v) * 64 AS DOUBLE) / {n_px} AS px_mean
FROM b GROUP BY doc_id
"""


def multimodal_frame_stats_sql() -> str:
    """Twin of ``video_frame_stats(attach_real_mjpeg(documents))`` — the
    engine demuxes a REAL MJPEG AVI and JPEG-decodes every frame; flat
    tiles decode bit-exactly, so the oracle recomputes from ``text``.
    64 tiles across 4 frames, 64 px per tile: n_px = 4096 and the mean
    (64·Σv)/4096 is dyadic — exact on both engines."""
    from datalake_indexes_spark.operators.multimodal import (
        MJPEG_FRAMES,
        MJPEG_TILES,
    )

    n_tiles = MJPEG_FRAMES * MJPEG_TILES * MJPEG_TILES
    n_px = n_tiles * 64
    return f"""
WITH s AS (
  SELECT doc_id,
         rpad(regexp_replace(coalesce(text, ''), '[^\\x20-\\x7E]', ' ', 'g'),
              {n_tiles}, ' ') AS px
  FROM documents
),
b AS (
  SELECT doc_id, ord(c) AS v
  FROM (SELECT doc_id, unnest(string_split(px, '')) AS c FROM s)
)
SELECT doc_id,
       CAST({MJPEG_FRAMES} AS BIGINT) AS n_frames,
       CAST({n_px} AS BIGINT) AS n_px,
       CAST(min(v) AS INT) AS px_min,
       CAST(max(v) AS INT) AS px_max,
       CAST(sum(v) * 64 AS DOUBLE) / {n_px} AS px_mean
FROM b GROUP BY doc_id
"""


def multimodal_sample_stats_sql() -> str:
    """Twin of ``audio_sample_stats(attach_real_wav(documents))`` — the
    engine unpacks real 16-bit PCM frames; the oracle recomputes the
    amplitudes from consecutive byte PAIRS of the planted text
    (little-endian: lo + 256·hi; printable ASCII keeps every sample
    positive).  The mean is one IEEE division of an exact integer sum —
    bit-identical across engines, no rounding."""
    from datalake_indexes_spark.operators.multimodal import WAV_SAMPLE_RATE

    return f"""
WITH s AS (
  SELECT doc_id,
         regexp_replace(coalesce(text, ''), '[^\\x20-\\x7E]', ' ', 'g') AS t
  FROM documents
),
p AS (SELECT doc_id, t, CAST(length(t) // 2 AS INT) AS ns FROM s),
i AS (SELECT doc_id, t, unnest(range(1, ns + 1)) AS k FROM p),
v AS (
  SELECT doc_id, ord(t[CAST(2 * k - 1 AS INT)]) + 256 * ord(t[CAST(2 * k AS INT)]) AS a
  FROM i
),
g AS (
  SELECT doc_id,
         CAST(min(a) AS INT) AS amp_min,
         CAST(max(a) AS INT) AS amp_max,
         CAST(sum(a) AS DOUBLE) / count(*) AS amp_mean
  FROM v GROUP BY doc_id
)
SELECT p.doc_id,
       CAST({WAV_SAMPLE_RATE} AS INT) AS sample_rate,
       p.ns AS n_samples,
       g.amp_min, g.amp_max, g.amp_mean
FROM p LEFT JOIN g USING (doc_id)
"""


def multimodal_features_sql() -> str:
    """Twin of extract_features over attach_binary_payload's containers.

    The engine PARSES the planted PNG/WAV/MP4 headers; the oracle
    recomputes the planted values directly — agreement proves the parse.
    The sha256 is over the container-stripped data section (= the text
    bytes for every modality), the one definition expressible in both
    engines (DuckDB sha256 only accepts VARCHAR)."""
    from datalake_indexes_spark.operators.multimodal import (
        MODALITIES,
        MP4_OVERHEAD,
        PNG_OVERHEAD,
        PNG_TEXT_CHUNK_BYTES,
        WAV_BLOCK_ALIGN,
        WAV_HEADER_BYTES,
        WAV_SAMPLE_RATE,
    )

    png_total = PNG_OVERHEAD + PNG_TEXT_CHUNK_BYTES
    arr = "[" + ", ".join(f"'{m}'" for m in MODALITIES) + "]"
    return f"""
WITH p AS (
  SELECT doc_id,
         {arr}[CAST(doc_id % {len(MODALITIES)} + 1 AS INT)] AS modality,
         CAST(octet_length(encode(text)) AS INT) AS n_text,
         sha256(text) AS sha256
  FROM documents
)
SELECT doc_id, modality,
       CAST(n_text + CASE modality WHEN 'image' THEN {png_total}
                                   WHEN 'audio' THEN {WAV_HEADER_BYTES}
                                   ELSE {MP4_OVERHEAD} END AS INT) AS n_bytes,
       sha256,
       CAST(CASE WHEN modality = 'audio' THEN {WAV_SAMPLE_RATE}
            ELSE 64 + n_text % 577 END AS INT) AS dim_1,
       CAST(CASE WHEN modality = 'audio' THEN n_text // {WAV_BLOCK_ALIGN}
            ELSE 64 + (n_text * 31) % 577 END AS INT) AS dim_2
FROM p
"""


def events_window_agg_sql() -> str:
    return """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


def events_sessionize_sql(gap_seconds: int = 1800) -> str:
    """Gap sessionization twin.  Gaps are measured in microseconds
    (``epoch_us``), the one unit shared by sessionize_batch
    (``unix_micros``) and sessionize_stream (``ts_us - end > gap_us``)."""
    return f"""
WITH ev AS (
  SELECT user_id, ts, epoch_us(ts) AS us,
         coalesce(value, 0.0) AS v
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN us - lag(us, 1, 0) OVER (PARTITION BY user_id ORDER BY ts)
                      > {gap_seconds}::BIGINT * 1000000 THEN 1 ELSE 0 END AS ns
  FROM ev
),
sess AS (
  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts)) AS session_end_us,
       count(*) AS n_events,
       round(sum(v), 2) AS sum_value
FROM sess GROUP BY user_id, sid
"""


def events_json_extract_sql() -> str:
    return """
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS INT) AS k
FROM events
"""


def add_external_features_sql() -> str:
    """J4 — demo-style feature materialization: customer LEFT JOIN the
    first-per-key orders row on the tokenized key (demo:516-587)."""
    ctok = tokenize_sql("c_custkey", "duckdb")
    otok = tokenize_sql("o_custkey", "duckdb")
    return f"""
WITH ext AS (
  SELECT * FROM (
    SELECT {otok} AS join_tok, o_totalprice, o_orderstatus,
           row_number() OVER (PARTITION BY {otok} ORDER BY o_orderkey) AS rn
    FROM orders
  ) WHERE rn = 1
)
SELECT c.c_custkey, c.c_acctbal, e.o_totalprice, e.o_orderstatus
FROM customer c LEFT JOIN ext e ON {ctok} = e.join_tok
"""


def decontaminate_sql(n: int = 5, min_overlap: int = 3, modulus: int = 17) -> str:
    """Decontamination twin: doc_id % modulus == 0 rows are the benchmark,
    the rest are the graded corpus; distinct word n-gram overlap."""
    gram = " || ' ' || ".join(f"w[CAST(i+{j + 1} AS INT)]" for j in range(n))
    return f"""
WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % {modulus} <> 0),
bench AS (SELECT text FROM documents WHERE doc_id % {modulus} = 0),
cw AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
csh AS (
  SELECT DISTINCT doc_id, {gram} AS shingle
  FROM cw, UNNEST(range(greatest(len(w) - {n - 1}, 0))) AS t(i)
),
bw AS (SELECT string_split(text, ' ') AS w FROM bench),
bsh AS (
  SELECT DISTINCT {gram} AS shingle
  FROM bw, UNNEST(range(greatest(len(w) - {n - 1}, 0))) AS t(i)
),
counts AS (SELECT doc_id, count(*) AS n_shingles FROM csh GROUP BY doc_id),
overl AS (
  SELECT doc_id, count(*) AS n_overlap
  FROM csh WHERE shingle IN (SELECT shingle FROM bsh)
  GROUP BY doc_id
)
SELECT c.doc_id,
       CAST(coalesce(n.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap,
       round(CASE WHEN coalesce(n.n_shingles, 0) > 0
                  THEN coalesce(o.n_overlap, 0) / n.n_shingles
                  ELSE 0 END, 4) AS overlap_frac,
       coalesce(o.n_overlap, 0) >= {min_overlap} AS contaminated
FROM corpus c
LEFT JOIN counts n USING (doc_id)
LEFT JOIN overl o USING (doc_id)
"""


def _search_tf_ctes(terms: list[str]) -> str:
    term_list = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""base AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
  FROM documents
),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM base),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf, any_value(dl) AS dl
  FROM (SELECT doc_id, dl, unnest(w) AS term FROM base)
  WHERE term IN ({term_list})
  GROUP BY doc_id, term
),
df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term)"""


def bm25_topk_sql(terms: list[str], k: int = 10, k1: float = 1.2, b: float = 0.75) -> str:
    """Okapi BM25 twin — identical idf/tf-normalization formulas; rank on
    the unrounded score, doc_id tie-break."""
    return f"""
WITH {_search_tf_ctes(terms)},
scored AS (
  SELECT doc_id,
         sum(ln(1 + (n - df + 0.5) / (df + 0.5))
             * tf * ({k1} + 1.0)
             / (tf + {k1} * (1.0 - {b} + {b} * dl / avgdl))) AS score
  FROM tf JOIN df USING (term) CROSS JOIN stats
  GROUP BY doc_id
)
SELECT doc_id, round(score, 4) AS score, rank
FROM (SELECT *, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
      FROM scored)
WHERE rank <= {k}
"""


def tfidf_topk_sql(terms: list[str], k: int = 10) -> str:
    return f"""
WITH {_search_tf_ctes(terms)},
scored AS (
  SELECT doc_id, sum(tf * ln(n / df)) AS score
  FROM tf JOIN df USING (term) CROSS JOIN stats
  GROUP BY doc_id
)
SELECT doc_id, round(score, 4) AS score, rank
FROM (SELECT *, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
      FROM scored)
WHERE rank <= {k}
"""


def events_asof_join_sql() -> str:
    """As-of twin via DuckDB's native ASOF LEFT JOIN (independent engine
    machinery — not a re-transcription of the union-window trick).  The
    build side is pre-deduped to the max event_id per (user, ts), the same
    resolution the engine's seq tie-break yields."""
    return """
WITH b AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         max_by(event_id, event_id) AS event_id,
         max_by(value, event_id) AS value
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, epoch_us(ts)
),
p AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, p.ts_us,
       CAST(coalesce(b.event_id, -1) AS BIGINT) AS asof_event_id,
       CAST(coalesce(b.ts_us, -1) AS BIGINT) AS asof_ts_us,
       coalesce(b.value, -1.0) AS asof_value
FROM p ASOF LEFT JOIN b
  ON p.user_id = b.user_id AND p.ts_us >= b.ts_us
"""


def semantic_dedup_sql(n_centroids: int = 16, threshold: float = 0.4) -> str:
    """SemDeDup twin: same deterministic seed centroids and
    keep-lowest-id-within-cluster rule."""
    return f"""
WITH cents AS (
  SELECT vec_id AS centroid, embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id < {n_centroids}
),
assign AS (
  SELECT vec_id, centroid, e FROM (
    SELECT e.vec_id, c.centroid, e.embedding::DOUBLE[] AS e,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv) DESC,
                      c.centroid) AS rk
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rk = 1
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM assign a JOIN assign b
    ON a.centroid = b.centroid AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.e, b.e) >= {threshold}
)
SELECT a.vec_id, a.centroid,
       a.vec_id NOT IN (SELECT vec_id FROM dropped) AS kept
FROM assign a
"""


def corpus_mix_sql(
    alpha: float = 0.5, max_repeat: float = 4.0, stratum: str = "lang"
) -> str:
    """Temperature-mix twin: per-stratum repeat factor (c_max/c_s)^alpha
    rounded to 4 decimals, fractional part realized by the md5(doc_id)
    bucket rule, exploded to (doc_id, stratum, rep_id)."""
    return f"""
WITH c AS (SELECT {stratum} AS s, CAST(count(*) AS DOUBLE) AS cnt FROM documents GROUP BY 1),
w AS (
  SELECT s, round(least(pow((SELECT max(cnt) FROM c) / cnt, {alpha}), {max_repeat}), 4) AS r
  FROM c
),
d AS (
  SELECT doc_id, {stratum} AS stratum, r,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 AS bucket
  FROM documents JOIN w ON {stratum} = s
),
reps AS (
  SELECT doc_id, stratum,
         CAST(floor(r) AS INT)
         + CASE WHEN bucket < CAST(round((r - floor(r)) * 10000) AS BIGINT)
                THEN 1 ELSE 0 END AS n_rep
  FROM d
)
SELECT doc_id, stratum, CAST(t.i AS INT) AS rep_id
FROM reps, UNNEST(range(n_rep)) AS t(i)
"""


def corpus_chunk_sql(chunk_tokens: int = 64, overlap: int = 16) -> str:
    """Chunking twin: same 0-based window starts (stride = chunk_tokens -
    overlap, last window only if it starts before n - overlap, minimum one
    window), 1-based inclusive list slicing on both engines."""
    stride = chunk_tokens - overlap
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
s AS (
  SELECT doc_id, w,
         unnest(range(0, greatest(len(w) - {overlap}, 1), {stride})) AS start
  FROM w
)
SELECT doc_id,
       CAST(start // {stride} AS INT) AS chunk_id,
       CAST(len(w[CAST(start + 1 AS INT):CAST(start + {chunk_tokens} AS INT)]) AS BIGINT) AS n_chunk_tokens,
       array_to_string(w[CAST(start + 1 AS INT):CAST(start + {chunk_tokens} AS INT)], ' ') AS chunk_text
FROM s
"""


def events_range_join_sql(window_us: int = 3_600_000_000) -> str:
    """Range-join twin via a plain inequality join — DuckDB's optimizer
    handles the quadratic at oracle scale; the engine's binned equi-join
    must produce identical aggregates."""
    return f"""
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'purchase'
),
b AS (
  SELECT user_id, epoch_us(ts) AS ts_us, value
  FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, p.ts_us,
       CAST(count(b.user_id) AS BIGINT) AS win_n,
       round(coalesce(sum(b.value), 0.0), 4) AS win_sum_value
FROM p LEFT JOIN b
  ON p.user_id = b.user_id
 AND b.ts_us > p.ts_us - {window_us}
 AND b.ts_us <= p.ts_us
GROUP BY p.event_id, p.user_id, p.ts_us
"""


def events_funnel_sql(steps: list[str]) -> str:
    """Funnel twin: chained conditional-min CTEs, -1 sentinels, depth =
    reached step count."""
    ctes = [
        f"""s1 AS (
  SELECT user_id, min(ts_us) AS step1_us
  FROM e WHERE event_type = '{steps[0]}' GROUP BY user_id
)"""
    ]
    for i, step in enumerate(steps[1:], start=2):
        ctes.append(
            f"""s{i} AS (
  SELECT user_id, min(ts_us) AS step{i}_us
  FROM e JOIN s{i - 1} USING (user_id)
  WHERE event_type = '{step}' AND ts_us >= step{i - 1}_us
  GROUP BY user_id
)"""
        )
    n = len(steps)
    sel = ["s1.user_id", "s1.step1_us"]
    depth = ["1"]
    joins = []
    for i in range(2, n + 1):
        sel.append(f"CAST(coalesce(s{i}.step{i}_us, -1) AS BIGINT) AS step{i}_us")
        depth.append(f"CASE WHEN s{i}.step{i}_us IS NOT NULL THEN 1 ELSE 0 END")
        joins.append(f"LEFT JOIN s{i} USING (user_id)")
    return f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
{', '.join(ctes)}
SELECT {', '.join(sel)}, CAST({' + '.join(depth)} AS INT) AS depth
FROM s1 {' '.join(joins)}
"""


def vocab_topk_sql(k: int = 50) -> str:
    return f"""
WITH pd AS (
  SELECT doc_id, word, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY doc_id, word
),
t AS (
  SELECT word, CAST(sum(c) AS BIGINT) AS total_count,
         CAST(count(*) AS BIGINT) AS doc_freq
  FROM pd GROUP BY word
)
SELECT word, total_count, doc_freq, rank
FROM (SELECT *, CAST(row_number() OVER (ORDER BY total_count DESC, word) AS INT) AS rank
      FROM t)
WHERE rank <= {k}
"""


def corpus_split_sql(weights: dict[str, float] | None = None) -> str:
    """hash_split twin: same md5 bucket rule and cumulative boundaries."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    names = list(weights)
    acc, cases = 0.0, []
    for name in names[:-1]:
        acc += weights[name]
        cases.append(f"WHEN bucket < {int(round(acc * 10000))} THEN '{name}'")
    return f"""
SELECT doc_id, CASE {' '.join(cases)} ELSE '{names[-1]}' END AS split
FROM (
  SELECT doc_id,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 AS bucket
  FROM documents
)
"""


def corpus_prep_v2_sql(
    quality_threshold: float = 0.55,
    repetition_cap: float = 0.2,
    token_budget: int = 2048,
    modulus: int = 17,
    n: int = 5,
    min_overlap: int = 3,
) -> str:
    """Curation-v2 twin: held-out benchmark, quality/repetition filters,
    corpus-only earliest-keep dedup, decontamination, train split, PII
    scrub, packing prefix sum."""
    from datalake_indexes_spark.operators.text_analysis import PII_PATTERNS

    email, e_rep = PII_PATTERNS["email"]
    ipv4, i_rep = PII_PATTERNS["ipv4"]
    phone, p_rep = PII_PATTERNS["phone"]
    scrub = (
        f"regexp_replace(regexp_replace(regexp_replace(d.text, "
        f"'{email}', '{e_rep}', 'g'), '{ipv4}', '{i_rep}', 'g'), "
        f"'{phone}', '{p_rep}', 'g')"
    )
    return f"""
WITH q AS (
  SELECT doc_id FROM ({text_quality_sql()}) WHERE quality_score >= {quality_threshold}
),
r AS (
  SELECT doc_id FROM ({text_repetition_sql()}) WHERE top_bigram_frac <= {repetition_cap}
),
keep AS (
  SELECT min(doc_id) AS doc_id FROM documents
  WHERE doc_id % {modulus} <> 0 GROUP BY md5(text)
),
clean AS (
  SELECT doc_id FROM ({decontaminate_sql(n, min_overlap, modulus)})
  WHERE NOT contaminated
),
train AS (
  SELECT doc_id FROM ({corpus_split_sql()}) WHERE split = 'train'
),
surv AS (
  SELECT d.doc_id, {scrub} AS text
  FROM documents d
  JOIN q USING (doc_id) JOIN r USING (doc_id) JOIN keep USING (doc_id)
  JOIN clean USING (doc_id) JOIN train USING (doc_id)
  WHERE d.doc_id % {modulus} <> 0
),
t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM surv
),
c AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(prior // {token_budget} AS BIGINT) AS pack_id,
       CAST(prior % {token_budget} AS BIGINT) AS pack_offset
FROM c
"""


def events_rollup_sql() -> str:
    """OLAP rollup twin: GROUPING(a, b) uses the same bitmask convention
    (last dim = least-significant bit) as Spark's grouping_id().  avg is
    written sum/count on both engines so no engine-specific mean
    summation order enters the hash."""
    return """
WITH ev AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
         value
  FROM events
)
SELECT event_type, window_start,
       CAST(GROUPING(event_type, window_start) AS INT) AS grouping_id,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       round(sum(value) / count(*), 4) AS avg_value
FROM ev GROUP BY ROLLUP (event_type, window_start)
"""


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


def hybrid_rrf_sql(
    terms: list[str],
    query_vec_id: int = 0,
    k: int = 10,
    k_each: int = 20,
    c: float = 60.0,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """Reciprocal-rank-fusion twin: the BM25 rank list (same CTEs as the
    bm25 oracle) full-outer-joined with the exact-cosine rank list for
    the stored query embedding; rrf = Σ 1/(c + rank), absent lists
    contribute 0; fused ties break on doc_id."""
    return f"""
WITH {_search_tf_ctes(terms)},
kw_scored AS (
  SELECT doc_id,
         sum(ln(1 + (n - df + 0.5) / (df + 0.5))
             * tf * ({k1} + 1.0)
             / (tf + {k1} * (1.0 - {b} + {b} * dl / avgdl))) AS score
  FROM tf JOIN df USING (term) CROSS JOIN stats
  GROUP BY doc_id
),
kw AS (
  SELECT doc_id, rnk AS kw_rank FROM (
    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
    FROM kw_scored)
  WHERE rnk <= {k_each}
),
q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = {query_vec_id}),
vec AS (
  SELECT doc_id, rnk AS v_rank FROM (
    SELECT e.vec_id AS doc_id,
           row_number() OVER (
             ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qe) DESC,
                      e.vec_id) AS rnk
    FROM embeddings e, q WHERE e.vec_id != {query_vec_id})
  WHERE rnk <= {k_each}
),
fused AS (
  SELECT coalesce(kw.doc_id, vec.doc_id) AS doc_id,
         coalesce(1.0 / ({c} + kw.kw_rank), 0) + coalesce(1.0 / ({c} + vec.v_rank), 0) AS s
  FROM kw FULL OUTER JOIN vec ON kw.doc_id = vec.doc_id
)
SELECT doc_id, round(s, 6) AS rrf_score,
       CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
FROM fused
QUALIFY rank <= {k}
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


def events_cohort_sql(period_us: int = 86_400_000_000) -> str:
    """Cohort-retention twin: integer floor-division period indices over
    epoch microseconds — no calendar machinery on either engine."""
    return f"""
WITH act AS (
  SELECT DISTINCT user_id AS k,
         CAST(epoch_us(ts) // {period_us} AS BIGINT) AS p
  FROM events
),
coh AS (SELECT k, min(p) AS c FROM act GROUP BY k)
SELECT c AS cohort_period, p - c AS period_offset, count(*) AS n_active
FROM act JOIN coh USING (k)
GROUP BY 1, 2
"""


def events_anomaly_sql(z_threshold: float = 2.5) -> str:
    """Z-score outlier twin: population moments via the identical
    sum/sum-of-squares closed form (no engine-native stddev, whose
    summation strategy would differ)."""
    return f"""
WITH s AS (
  SELECT event_type,
         sum(value) / count(value) AS m,
         sqrt(sum(value * value) / count(value)
              - (sum(value) / count(value)) * (sum(value) / count(value))) AS sd
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type AS grp, CAST(e.value AS DOUBLE) AS value,
       round((e.value - s.m) / s.sd, 3) AS z
FROM events e JOIN s USING (event_type)
WHERE s.sd > 0 AND abs((e.value - s.m) / s.sd) > {z_threshold}
"""


def events_anomaly_seasonal_sql(z_threshold: float = 2.5) -> str:
    """Seasonal-anomaly twin: identical closed-form moments per
    (event_type, hour-of-day) cell."""
    return f"""
WITH e AS (
  SELECT event_id, event_type AS grp,
         CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS bucket,
         CAST(value AS DOUBLE) AS v
  FROM events
),
s AS (
  SELECT grp, bucket,
         sum(v) / count(v) AS m,
         sqrt(sum(v * v) / count(v) - (sum(v) / count(v)) * (sum(v) / count(v))) AS sd
  FROM e GROUP BY 1, 2
)
SELECT e.event_id, e.grp, e.bucket, e.v AS value,
       round((e.v - s.m) / s.sd, 3) AS z
FROM e JOIN s USING (grp, bucket)
WHERE s.sd > 0 AND abs((e.v - s.m) / s.sd) > {z_threshold}
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


def events_rolling_sql(window_rows: int = 3) -> str:
    """Rolling-feature twin: identical (key, ts, id) total ordering and
    identical window frames — trailing mean excludes the current row on
    both engines (no label leakage)."""
    return f"""
SELECT event_id,
       user_id AS key,
       epoch_us(ts) AS ts_us,
       CAST(value AS DOUBLE) AS value,
       row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS seq,
       lag(CAST(value AS DOUBLE)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_value,
       round(avg(CAST(value AS DOUBLE)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN {window_rows} PRECEDING AND 1 PRECEDING), 4) AS trail_mean,
       max(CAST(value AS DOUBLE)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max
FROM events
"""


def lake_validate_sql(total_cap: float = 300_000.0) -> str:
    """DQ-violation twin: same rule names, same NULL-is-violation row
    semantics, same FK/existence anti-join semantics."""
    return f"""
SELECT 'customer_acctbal_nonneg' AS rule, CAST(c_custkey AS BIGINT) AS entity_id
FROM customer WHERE NOT coalesce(c_acctbal >= 0, FALSE)
UNION ALL
SELECT 'order_total_under_cap' AS rule, CAST(o_orderkey AS BIGINT) AS entity_id
FROM orders WHERE NOT coalesce(o_totalprice <= {total_cap}, FALSE)
UNION ALL
SELECT 'order_customer_exists' AS rule, CAST(o_orderkey AS BIGINT) AS entity_id
FROM orders o
WHERE o.o_custkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'order_has_lineitems' AS rule, CAST(o_orderkey AS BIGINT) AS entity_id
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
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


def join_cardinalities_sql(max_token_cols: int = 64, min_rows: int = 10) -> str:
    """Join-size twin: Σ cnt_a·cnt_b over the same capped token universe."""
    return f"""
WITH {cells_cte()},
counts AS (
  SELECT table_id, col_id, tokenized, count(*) AS cnt
  FROM cells GROUP BY 1, 2, 3
),
spread AS (
  SELECT tokenized FROM counts GROUP BY tokenized HAVING count(*) <= {max_token_cols}
),
c AS (SELECT counts.* FROM counts JOIN spread USING (tokenized))
SELECT a.table_id AS table_a, a.col_id AS col_a,
       b.table_id AS table_b, b.col_id AS col_b,
       CAST(sum(a.cnt * b.cnt) AS BIGINT) AS join_rows,
       CAST(count(*) AS BIGINT) AS n_common_tokens
FROM c a JOIN c b ON a.tokenized = b.tokenized AND a.table_id < b.table_id
GROUP BY 1, 2, 3, 4
HAVING sum(a.cnt * b.cnt) >= {min_rows}
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


def semantic_types_sql(
    table: str, columns: list[str], threshold: float = 0.9
) -> str:
    """Semantic-type twin: same anchored regex shapes over the same
    stringified values, same dominance priority."""
    unions = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS col_name, CAST({c} AS VARCHAR) AS val "
        f"FROM {table} WHERE {c} IS NOT NULL"
        for c in columns
    )
    return f"""
WITH long AS (
{unions}
),
agg AS (
  SELECT col_name, count(*) AS n_values,
         round(avg(CASE WHEN regexp_full_match(val, '-?[0-9]+') THEN 1.0 ELSE 0.0 END), 4) AS frac_int,
         round(avg(CASE WHEN regexp_full_match(val, '-?[0-9]+\\.[0-9]+') THEN 1.0 ELSE 0.0 END), 4) AS frac_dec,
         round(avg(CASE WHEN regexp_full_match(val, '[0-9]{{4}}-[0-9]{{2}}-[0-9]{{2}}( [0-9]{{2}}:[0-9]{{2}}:[0-9]{{2}}(\\.[0-9]+)?)?') THEN 1.0 ELSE 0.0 END), 4) AS frac_date
  FROM long GROUP BY col_name
)
SELECT *,
       CASE WHEN frac_int >= {threshold} THEN 'integer'
            WHEN frac_dec >= {threshold} THEN 'decimal'
            WHEN frac_date >= {threshold} THEN 'date'
            ELSE 'text' END AS sem_type
FROM agg
"""


def events_growth_sql(period_us: int = 86_400_000_000) -> str:
    """Growth-accounting twin: same integer period indices, same
    active/new/cumulative definitions."""
    return f"""
WITH act AS (
  SELECT DISTINCT user_id AS k,
         CAST(epoch_us(ts) // {period_us} AS BIGINT) AS period
  FROM events
),
f AS (SELECT k, min(period) AS fp FROM act GROUP BY k),
d AS (
  SELECT period, count(*) AS n_active,
         sum(CASE WHEN period = fp THEN 1 ELSE 0 END) AS n_new
  FROM act JOIN f USING (k) GROUP BY period
)
SELECT period, n_active, CAST(n_new AS BIGINT) AS n_new,
       CAST(sum(n_new) OVER (ORDER BY period
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
FROM d
"""


def events_resample_sql(period_us: int = 86_400_000_000) -> str:
    """Forward-fill resampling twin: same per-(key, period) rounded
    aggregate, same dense grid (key's first period .. global last), same
    last-non-null fill."""
    return f"""
WITH daily AS (
  SELECT user_id AS key,
         CAST(epoch_us(ts) // {period_us} AS BIGINT) AS period,
         round(sum(value), 4) AS obs
  FROM events GROUP BY 1, 2
),
g AS (SELECT max(period) AS gmax FROM daily),
lo AS (SELECT key, min(period) AS klo FROM daily GROUP BY key),
grid AS (
  SELECT key, unnest(generate_series(klo, gmax)) AS period FROM lo, g
)
SELECT grid.key, grid.period,
       last_value(obs IGNORE NULLS) OVER (
         PARTITION BY grid.key ORDER BY grid.period
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       obs IS NOT NULL AS observed
FROM grid LEFT JOIN daily
  ON daily.key = grid.key AND daily.period = grid.period
"""


def text_tfidf_pairs_sql(threshold: float = 0.5, max_df_frac: float = 0.5) -> str:
    """Sparse tf-idf cosine-pair twin: same df cap, same weights, same
    per-term pair generation."""
    return f"""
WITH base AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM base GROUP BY doc_id, term
),
df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
kept AS (SELECT term, df FROM df, nd WHERE df <= {max_df_frac} * nd.n),
w AS (
  SELECT tf.doc_id, tf.term, tf.tf * ln(nd.n / kept.df) AS w
  FROM tf JOIN kept USING (term) CROSS JOIN nd
),
norms AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
dots AS (
  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, sum(a.w * b.w) AS dot
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_id_1, doc_id_2, round(dot / (n1.nrm * n2.nrm), 4) AS cosine
FROM dots
JOIN norms n1 ON n1.doc_id = doc_id_1
JOIN norms n2 ON n2.doc_id = doc_id_2
WHERE dot / (n1.nrm * n2.nrm) >= {threshold}
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


def corpus_sample_exact_sql(n_per_stratum: int) -> str:
    """Exact-n stratified-sample twin: same md5 shuffle order, same
    per-stratum rank cut."""
    return f"""
SELECT doc_id, lang AS stratum,
       CAST(row_number() OVER (PARTITION BY lang
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS sample_rank
FROM documents
QUALIFY sample_rank <= {n_per_stratum}
"""


def events_cube_sql() -> str:
    """CUBE twin of :func:`events_rollup_sql` — adds the (window-only)
    cross level via GROUP BY CUBE."""
    return """
WITH ev AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
         value
  FROM events
)
SELECT event_type, window_start,
       CAST(GROUPING(event_type, window_start) AS INT) AS grouping_id,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       round(sum(value) / count(*), 4) AS avg_value
FROM ev GROUP BY CUBE (event_type, window_start)
"""


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


def events_anomaly_running_sql(z_threshold: float = 3.0, min_obs: int = 5) -> str:
    """Running-anomaly twin: identical prior-only expanding moments
    (count/sum/sum-of-squares window frames), identical warm-up and
    positive-variance gates."""
    return f"""
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS tu, CAST(value AS DOUBLE) AS v
  FROM events
),
m AS (
  SELECT event_id, user_id, v,
         count(v) OVER w AS n,
         sum(v) OVER w AS s,
         sum(v * v) OVER w AS ss
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id AS key, v AS value,
       round((v - s / n) / sqrt(ss / n - (s / n) * (s / n)), 3) AS z
FROM m
WHERE n >= {min_obs}
  AND sqrt(ss / n - (s / n) * (s / n)) > 0
  AND abs((v - s / n) / sqrt(ss / n - (s / n) * (s / n))) > {z_threshold}
"""


def corpus_sample_weighted_sql(k: int = 100) -> str:
    """A-ES weighted-sample twin: identical md5 uniform and ln(u)/w key."""
    return f"""
WITH keyed AS (
  SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
         ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1.0)
            / (4294967296.0 + 1.0)) / CAST(n_chars AS DOUBLE) AS key
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, weight,
       CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS INT) AS rank
FROM keyed
QUALIFY rank <= {k}
"""


def dedup_embedding_multiprobe_sql(
    threshold: float = 0.4, n_tables: int = 4, n_planes: int = 6, dim: int = 64
) -> str:
    """OR-amplified LSH twin: the same per-table md5-seeded hyperplanes
    inlined as literals; a pair qualifies on collision in ANY table."""
    from datalake_indexes_spark.operators.similarity import hyperplanes

    sig_exprs = []
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed=f"simsearch:{t}")
        bits = " || ".join(
            "(CASE WHEN list_dot_product(e::DOUBLE[], {arr}::DOUBLE[]) >= 0 "
            "THEN '1' ELSE '0' END)".format(
                arr="[" + ", ".join(repr(w) for w in plane) + "]"
            )
            for plane in planes
        )
        sig_exprs.append(f"{bits} AS s{t}")
    any_collide = " OR ".join(f"a.s{t} = b.s{t}" for t in range(n_tables))
    return f"""
WITH u AS (SELECT vec_id, embedding AS e, {", ".join(sig_exprs)} FROM embeddings),
cand AS (
  SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
         a.e AS ea, b.e AS eb
  FROM u a JOIN u b ON a.vec_id < b.vec_id AND ({any_collide})
)
SELECT vec_id_1, vec_id_2,
       round(list_cosine_similarity(ea::DOUBLE[], eb::DOUBLE[]), 4) AS cosine
FROM cand
WHERE list_cosine_similarity(ea::DOUBLE[], eb::DOUBLE[]) >= {threshold}
"""


def text_unigram_logprob_sql() -> str:
    """Unigram log-probability twin: same self-trained corpus LM, same
    per-document mean."""
    return """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM words),
lp AS (
  SELECT w, ln(count(*) / tot.t) AS l
  FROM words, tot GROUP BY w, tot.t
)
SELECT doc_id, count(*) AS n_words, round(avg(l), 4) AS avg_logprob
FROM words JOIN lp USING (w)
GROUP BY doc_id
"""


def dedup_keep_best_sql(k: int = 16, bands: int = 4, threshold: float = 0.7) -> str:
    """Quality-aware retention twin: the recursive-closure clusters with
    the quality formula joined on, best-per-cluster by (score desc, id)."""
    from datalake_indexes_spark.functions.text import STOPWORDS

    stops = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH RECURSIVE {_minhash_pairs_ctes(k, bands, threshold)},
edges AS (
  SELECT doc_id_1 AS a, doc_id_2 AS b FROM pairs
  UNION SELECT doc_id_2, doc_id_1 FROM pairs
),
reach(node, r) AS (
  SELECT a, b FROM edges
  UNION
  SELECT re.node, e.b FROM reach re JOIN edges e ON e.a = re.r
),
clus AS (
  SELECT node AS doc_id, least(node, min(r)) AS cluster
  FROM reach GROUP BY node
),
qb AS (
  SELECT doc_id, string_split(text, ' ') AS w, length(text) AS nc FROM documents
),
qm AS (
  SELECT doc_id,
         (nc - (len(w) - 1)) * 1.0 / len(w) AS avg_len,
         len(list_filter(w, x -> list_contains([{stops}], x))) * 1.0 / len(w) AS stop_ratio,
         len(list_distinct(w)) * 1.0 / len(w) AS distinct_ratio
  FROM qb
),
q AS (
  SELECT doc_id,
         round(0.5 * distinct_ratio + 0.3 * least(avg_len / 8.0, 1.0)
               + 0.2 * (1.0 - stop_ratio), 4) AS quality_score
  FROM qm
)
SELECT c.doc_id, c.cluster, q.quality_score,
       (row_number() OVER (PARTITION BY c.cluster
          ORDER BY q.quality_score DESC, c.doc_id) = 1) AS kept
FROM clus c JOIN q USING (doc_id)
"""


def _v3_ctes(k: int, bands: int, threshold: float) -> str:
    """Shared CTE block for the curation-v3 family: MinHash pairs →
    closure clusters, quality scores, keep-best drop set, unigram
    log-probs.  Callers append their own final SELECT."""
    from datalake_indexes_spark.functions.text import STOPWORDS

    stops = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""{_minhash_pairs_ctes(k, bands, threshold)},
edges AS (
  SELECT doc_id_1 AS a, doc_id_2 AS b FROM pairs
  UNION SELECT doc_id_2, doc_id_1 FROM pairs
),
reach(node, r) AS (
  SELECT a, b FROM edges
  UNION
  SELECT re.node, e.b FROM reach re JOIN edges e ON e.a = re.r
),
clus AS (
  SELECT node AS doc_id, least(node, min(r)) AS cluster
  FROM reach GROUP BY node
),
qb AS (
  SELECT doc_id, string_split(text, ' ') AS w, length(text) AS nc FROM documents
),
qm AS (
  SELECT doc_id,
         (nc - (len(w) - 1)) * 1.0 / len(w) AS avg_len,
         len(list_filter(w, x -> list_contains([{stops}], x))) * 1.0 / len(w) AS stop_ratio,
         len(list_distinct(w)) * 1.0 / len(w) AS distinct_ratio
  FROM qb
),
q AS (
  SELECT doc_id,
         round(0.5 * distinct_ratio + 0.3 * least(avg_len / 8.0, 1.0)
               + 0.2 * (1.0 - stop_ratio), 4) AS quality_score
  FROM qm
),
dropped AS (
  SELECT doc_id FROM (
    SELECT c.doc_id,
           row_number() OVER (PARTITION BY c.cluster
             ORDER BY q.quality_score DESC, c.doc_id) AS rk
    FROM clus c JOIN q USING (doc_id)
  ) WHERE rk > 1
),
lw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w2 FROM documents
),
ltot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM lw),
lfreq AS (SELECT w2, ln(count(*) / ltot.t) AS l FROM lw, ltot GROUP BY w2, ltot.t),
lp AS (
  SELECT doc_id, round(avg(l), 4) AS avg_logprob
  FROM lw JOIN lfreq USING (w2) GROUP BY doc_id
)"""


def corpus_prep_v3_sql(
    quality_min: float = 0.52,
    logprob_min: float = -3.408,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
) -> str:
    """Curation-v3 twin: quality + unigram-logprob gates on the ROUNDED
    operator outputs (threshold comparisons are engine-exact), keep-best
    near-dup drop via the recursive closure, md5 train shard."""
    return f"""
WITH RECURSIVE {_v3_ctes(k, bands, threshold)}
SELECT d.doc_id, d.lang, q.quality_score, lp.avg_logprob
FROM documents d
JOIN q USING (doc_id)
JOIN lp USING (doc_id)
WHERE q.quality_score >= {quality_min}
  AND lp.avg_logprob >= {logprob_min}
  AND d.doc_id NOT IN (SELECT doc_id FROM dropped)
  AND ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < 8000
"""


def corpus_audit_sql(
    quality_min: float = 0.52,
    logprob_min: float = -3.408,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
) -> str:
    """Twin of the curation drop ledger: one row per INPUT doc with the
    first pipeline stage that rejected it ('kept' if it survived)."""
    return f"""
WITH RECURSIVE {_v3_ctes(k, bands, threshold)}
SELECT d.doc_id, q.quality_score, lp.avg_logprob,
  CASE
    WHEN q.quality_score < {quality_min} THEN 'quality'
    WHEN lp.avg_logprob < {logprob_min} THEN 'logprob'
    WHEN d.doc_id IN (SELECT doc_id FROM dropped) THEN 'near_dup'
    WHEN ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 >= 8000
      THEN 'eval_shard'
    ELSE 'kept'
  END AS stage
FROM documents d
JOIN q USING (doc_id)
JOIN lp USING (doc_id)
"""


def dedup_chunks_sql(chunk_words: int = 4, min_doc_freq: int = 2) -> str:
    """Twin of :func:`..operators.dedup.chunk_dedup` — cross-document
    exact chunk (pseudo-line) dedup with in-order reassembly."""
    return f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
words AS (
  SELECT doc_id, CAST(generate_subscripts(w, 1) AS BIGINT) AS pos, unnest(w) AS word
  FROM ws
),
chunks AS (
  SELECT doc_id, (pos - 1) // {chunk_words} AS cid,
         string_agg(word, ' ' ORDER BY pos) AS chunk
  FROM words GROUP BY doc_id, (pos - 1) // {chunk_words}
),
freq AS (SELECT chunk, count(DISTINCT doc_id) AS df FROM chunks GROUP BY chunk),
kept AS (
  SELECT c.doc_id, c.cid, c.chunk FROM chunks c
  WHERE c.chunk NOT IN (SELECT chunk FROM freq WHERE df >= {min_doc_freq})
),
totals AS (SELECT doc_id, count(*) AS total FROM chunks GROUP BY doc_id)
SELECT k.doc_id,
       string_agg(k.chunk, ' ' ORDER BY k.cid) AS text_clean,
       count(*) AS kept_chunks,
       any_value(t.total) - count(*) AS dropped_chunks
FROM kept k JOIN totals t USING (doc_id)
GROUP BY k.doc_id
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


def events_scd2_sql() -> str:
    """Twin of :func:`..operators.events.scd2_history` over per-user
    event_type observations (Kimball SCD-2 dimension build)."""
    return """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
),
ordered AS (
  SELECT user_id, event_type, ts_us, event_id,
         lag(event_type) OVER w AS prev,
         row_number() OVER w AS rn
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
starts AS (
  SELECT user_id, event_type, ts_us, event_id FROM ordered
  WHERE rn = 1 OR prev IS DISTINCT FROM event_type
)
SELECT user_id, event_type, ts_us AS valid_from,
       coalesce(lead(ts_us) OVER w2, -1) AS valid_to,
       row_number() OVER w2 AS version
FROM starts
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
"""


def text_quality_normalized_sql() -> str:
    """Twin of :func:`..operators.text_analysis.normalize_scores_by_group`
    — per-source percent_rank of the quality score (the run-length-count
    formulation must equal the window-function definition exactly)."""
    from datalake_indexes_spark.functions.text import STOPWORDS

    stops = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w, length(text) AS nc FROM documents
),
m AS (
  SELECT doc_id,
         (nc - (len(w) - 1)) * 1.0 / len(w) AS avg_len,
         len(list_filter(w, x -> list_contains([{stops}], x))) * 1.0 / len(w) AS stop_ratio,
         len(list_distinct(w)) * 1.0 / len(w) AS distinct_ratio
  FROM base
),
q AS (
  SELECT doc_id,
         round(0.5 * distinct_ratio + 0.3 * least(avg_len / 8.0, 1.0)
               + 0.2 * (1.0 - stop_ratio), 4) AS quality_score
  FROM m
)
SELECT d.doc_id, d.source, q.quality_score,
       round(percent_rank() OVER (PARTITION BY d.source ORDER BY q.quality_score), 6)
         AS score_pct
FROM documents d JOIN q USING (doc_id)
"""


def events_seasonality_sql() -> str:
    """Seasonality twin: identical integer bucket arithmetic on epoch-µs
    (epoch day 0 = Thursday), uniformity lift from re-aggregated buckets."""
    return """
WITH e AS (SELECT event_type AS grp, epoch_us(ts) AS ts_us, value FROM events),
b AS (
  SELECT grp, 'hod' AS period_type,
         CAST((ts_us // 3600000000) % 24 AS BIGINT) AS bucket, value FROM e
  UNION ALL
  SELECT grp, 'dow' AS period_type,
         CAST(((ts_us // 86400000000) + 4) % 7 AS BIGINT) AS bucket, value FROM e
),
agg AS (
  SELECT grp, period_type, bucket,
         count(*) AS n_events, round(avg(value) + 1e-9, 4) AS avg_value
  FROM b GROUP BY 1, 2, 3
),
tot AS (SELECT grp, period_type, sum(n_events) AS total FROM agg GROUP BY 1, 2)
SELECT grp, period_type, bucket, n_events, avg_value,
       round(n_events * (CASE period_type WHEN 'hod' THEN 24 ELSE 7 END)
             / CAST(total AS DOUBLE), 4) AS lift
FROM agg JOIN tot USING (grp, period_type)
"""


def text_content_type_sql(
    symbol_threshold: float = 0.03, keyword_threshold: int = 3
) -> str:
    """Twin of :func:`..operators.text_analysis.content_type_scores` over
    the same planted code suffixes (shared constants; RE2 and Java regex
    evaluate both patterns identically — note DuckDB needs the 'g' flag
    where Spark's regexp_replace is global by default)."""
    from datalake_indexes_spark.operators.text_analysis import (
        CODE_KEYWORDS,
        CODE_PLANT_SUFFIX,
        CODE_SYMBOL_CLASS,
    )

    kw_pat = "\\b(" + CODE_KEYWORDS + ")\\b"
    return (
        """
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || '"""
        + CODE_PLANT_SUFFIX
        + """' ELSE text END AS t
  FROM documents
),
scored AS (
  SELECT doc_id,
         round((length(t) - length(regexp_replace(t, '"""
        + CODE_SYMBOL_CLASS
        + """', '', 'g'))) * 1.0 / length(t) + 1e-9, 4) AS symbol_ratio,
         CAST(len(regexp_extract_all(t, '"""
        + kw_pat
        + """')) AS BIGINT) AS kw_hits
  FROM planted
)
SELECT doc_id, symbol_ratio, kw_hits,
       CASE WHEN symbol_ratio >= """
        + str(symbol_threshold)
        + """ OR kw_hits >= """
        + str(keyword_threshold)
        + """ THEN 'code' ELSE 'prose' END AS content_type
FROM scored
"""
    )


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


def multimodal_metadata_sql() -> str:
    """Twin of extract_metadata over the planted payloads: the engine
    PARSES the PNG tEXt chunk; the oracle recomputes the planted
    (Source, doc:<id>) pair for exactly the image-modality docs."""
    from datalake_indexes_spark.operators.multimodal import (
        MODALITIES,
        PNG_TEXT_ID_DIGITS,
        PNG_TEXT_KEY,
        PNG_TEXT_VALUE_PREFIX,
    )

    arr = "[" + ", ".join(f"'{m}'" for m in MODALITIES) + "]"
    return f"""
SELECT doc_id, '{PNG_TEXT_KEY}' AS meta_key,
       '{PNG_TEXT_VALUE_PREFIX}' ||
         lpad(CAST(doc_id AS VARCHAR), {PNG_TEXT_ID_DIGITS}, '0') AS meta_value
FROM documents
WHERE {arr}[CAST(doc_id % {len(MODALITIES)} + 1 AS INT)] = 'image'
"""


def events_json_profile_sql() -> str:
    """Twin of :func:`..operators.discovery.json_key_profile` over the
    SAME planted props (tag/score/flag/note derived from event_id)."""
    return """
WITH planted AS (
  SELECT event_id,
         '{' || concat_ws(', ',
           '"k": ' || json_extract_string(props, '$.k'),
           CASE WHEN event_id % 3 = 0
                THEN '"tag": "t' || (event_id % 7) || '"' END,
           CASE WHEN event_id % 5 = 0
                THEN '"score": ' || (event_id % 100) || '.5' END,
           CASE WHEN event_id % 7 = 0
                THEN CASE WHEN event_id % 2 = 0 THEN '"flag": true'
                          ELSE '"flag": false' END END,
           CASE WHEN event_id % 11 = 0 THEN '"note": null' END
         ) || '}' AS props
  FROM events
),
keys AS (
  SELECT event_id, props, unnest(json_keys(props)) AS key FROM planted
),
typed AS (
  SELECT key, json_extract_string(props, '$."' || key || '"') AS value,
         CASE WHEN json_extract_string(props, '$."' || key || '"') IS NULL
                THEN 'null'
              WHEN regexp_full_match(
                     json_extract_string(props, '$."' || key || '"'),
                     '-?[0-9]+') THEN 'int'
              WHEN regexp_full_match(
                     json_extract_string(props, '$."' || key || '"'),
                     '-?[0-9]+\\.[0-9]+') THEN 'float'
              WHEN json_extract_string(props, '$."' || key || '"')
                     IN ('true', 'false') THEN 'bool'
              ELSE 'string' END AS t
  FROM keys
),
pt AS (SELECT key, t, count(*) AS n FROM typed GROUP BY 1, 2),
top AS (SELECT key, first(t ORDER BY n DESC, t) AS top_type FROM pt GROUP BY key),
stats AS (
  SELECT key, count(*) AS n_present, count(DISTINCT value) AS n_distinct
  FROM typed GROUP BY key
),
tot AS (SELECT count(*) AS total FROM events)
SELECT s.key, s.n_present,
       round(s.n_present * 1.0 / t.total + 1e-9, 4) AS coverage,
       s.n_distinct, top.top_type
FROM stats s CROSS JOIN tot t JOIN top ON top.key = s.key
"""


def events_session_paths_sql(gap_seconds: int = 1800, n: int = 3, k: int = 20) -> str:
    """Session-path twin: same gap rule, (ts, event_id) ordering, sliding
    n-gram over each session's type list."""
    gap_us = gap_seconds * 1_000_000
    return f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
),
flagged AS (
  SELECT *, CASE WHEN ts_us - coalesce(lag(ts_us) OVER w, 0) > {gap_us}
                 THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sid AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS s
  FROM flagged
),
seqs AS (
  SELECT list(event_type ORDER BY ts_us, event_id) AS types
  FROM sid GROUP BY user_id, s
  HAVING count(*) >= {n}
),
grams AS (
  SELECT unnest(list_transform(
           range(1, len(types) - {n - 2}),
           i -> array_to_string(types[i:i+{n - 1}], '>'))) AS path
  FROM seqs
),
counts AS (SELECT path, count(*) AS n_occurrences FROM grams GROUP BY 1)
SELECT path, n_occurrences, rank FROM (
  SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, path) AS rank
  FROM counts
) WHERE rank <= {k}
"""


def events_transitions_sql() -> str:
    """Twin of :func:`..operators.events.event_transitions` over per-user
    event streams."""
    return """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
),
pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
           AS from_type,
         event_type AS to_type
  FROM ev
),
counts AS (
  SELECT from_type, to_type, count(*) AS n
  FROM pairs WHERE from_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT c.from_type, c.to_type, c.n,
       round(c.n * 1.0 / sum(c.n) OVER (PARTITION BY c.from_type), 6) AS p
FROM counts c
"""


def text_bigram_logprob_sql(k_smooth: float = 0.5) -> str:
    """Twin of :func:`..operators.text_analysis.bigram_logprob_scores` —
    add-k smoothed corpus-bigram conditionals (denominator = total
    unigram occurrences of the context word, V = distinct unigrams)."""
    return f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
uni AS (SELECT unnest(w) AS w1 FROM ws),
ctx AS (SELECT w1, count(*) AS c1 FROM uni GROUP BY w1),
v AS (SELECT count(DISTINCT w1) AS vb FROM uni),
words AS (
  SELECT doc_id, CAST(generate_subscripts(w, 1) AS BIGINT) AS pos, unnest(w) AS word
  FROM ws
),
bg AS (
  SELECT a.doc_id, a.word AS w1, b.word AS w2
  FROM words a JOIN words b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
bc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
lp AS (
  SELECT bc.w1, bc.w2,
         ln((c12 + {k_smooth}) / (c1 + {k_smooth} * vb)) AS l
  FROM bc JOIN ctx USING (w1), v
)
SELECT doc_id, count(*) AS n_bigrams, round(avg(l), 4) AS avg_logprob2
FROM bg JOIN lp USING (w1, w2)
GROUP BY doc_id
"""


def text_pmi_sql(max_vocab: int = 1000, min_pair_docs: int = 2) -> str:
    """Twin of :func:`..operators.text_analysis.word_cooccurrence_pmi`."""
    return f"""
WITH words AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
wdf AS (SELECT w, count(*) AS df FROM words GROUP BY w),
vocab AS (SELECT w, df FROM wdf ORDER BY df DESC, w ASC LIMIT {max_vocab}),
kept AS (SELECT wo.doc_id, wo.w FROM words wo JOIN vocab USING (w)),
pairs AS (
  SELECT a.w AS w1, b.w AS w2, count(*) AS pair_docs
  FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.w < b.w
  GROUP BY a.w, b.w
  HAVING count(*) >= {min_pair_docs}
)
SELECT p.w1, p.w2, p.pair_docs,
       round(ln((p.pair_docs * nd.n) / (v1.df * v2.df)), 4) AS pmi
FROM pairs p
JOIN vocab v1 ON v1.w = p.w1
JOIN vocab v2 ON v2.w = p.w2, nd
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


def text_canonicalize_sql() -> str:
    """Twin of :func:`..functions.text.canonicalize_text_col` over event
    props (digit/punctuation-rich JSON strings): same literal transform
    chain — note DuckDB regexp_replace needs the 'g' flag where Spark
    replaces all matches by default."""
    acc = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿ"
    fold = "aaaaaaceeeeiiiinooooouuuuyy"
    return f"""
SELECT event_id,
       trim(regexp_replace(
         regexp_replace(
           regexp_replace(
             translate(lower(props), '{acc}', '{fold}'),
             '[0-9]', '0', 'g'),
           '[^a-z0 ]', ' ', 'g'),
         ' +', ' ', 'g')) AS canon,
       md5(trim(regexp_replace(
         regexp_replace(
           regexp_replace(
             translate(lower(props), '{acc}', '{fold}'),
             '[0-9]', '0', 'g'),
           '[^a-z0 ]', ' ', 'g'),
         ' +', ' ', 'g'))) AS canon_hash
FROM events
"""


def events_concurrency_sql(gap_seconds: int = 1800) -> str:
    """Twin of sessionize → :func:`..operators.events.concurrency_curve`:
    concurrent open sessions at every change point (inclusive ends —
    release at end+1)."""
    return f"""
WITH ev AS (
  SELECT user_id, ts, epoch_us(ts) AS us FROM events
),
flagged AS (
  SELECT *, CASE WHEN us - lag(us, 1, 0) OVER (PARTITION BY user_id ORDER BY ts)
                      > {gap_seconds}::BIGINT * 1000000 THEN 1 ELSE 0 END AS ns
  FROM ev
),
sess AS (
  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
),
iv AS (
  SELECT epoch_us(min(ts)) AS s, epoch_us(max(ts)) AS e
  FROM sess GROUP BY user_id, sid
),
deltas AS (
  SELECT ts_us, sum(d) AS delta FROM (
    SELECT s AS ts_us, 1 AS d FROM iv
    UNION ALL
    SELECT e + 1 AS ts_us, -1 AS d FROM iv
  ) GROUP BY ts_us
)
SELECT ts_us,
       CAST(sum(delta) OVER (ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS concurrent
FROM deltas
"""


def tables_with_all_tokens_sql(tokens: list[str]) -> str:
    """Twin of :func:`..operators.discovery.tables_with_all_tokens` over
    the shared lake CTE."""
    from datalake_indexes_spark.functions.text import tokenize_py

    toks = sorted({tokenize_py(t) for t in tokens})
    in_list = ", ".join(f"'{t}'" for t in toks)
    return f"""
WITH {cells_cte()}
SELECT table_id,
       count(DISTINCT col_id) AS n_hit_cols,
       count(*) AS n_hit_cells
FROM cells
WHERE tokenized IN ({in_list})
GROUP BY table_id
HAVING count(DISTINCT tokenized) = {len(toks)}
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


def events_twap_sql() -> str:
    """Twin of :func:`..operators.events.time_weighted_avg` per user."""
    return """
WITH ev AS (
  SELECT user_id, value, epoch_us(ts) AS us, event_id FROM events
),
gapped AS (
  SELECT user_id, value,
         CAST(lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us
              AS DOUBLE) AS dt
  FROM ev
)
SELECT user_id,
       round(coalesce(sum(value * dt) / sum(dt), avg(value)), 6) AS twap,
       count(*) AS n_obs
FROM gapped GROUP BY user_id
"""


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


# ---------------------------------------------------------------------------
# Web / URL curation twins (operators/web.py)
# ---------------------------------------------------------------------------

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


def events_item_pairs_sql(min_support: int = 2) -> str:
    """Twin of :func:`..operators.events.frequent_event_pairs` over
    user-id baskets of event types."""
    return f"""
WITH bi AS (
  SELECT DISTINCT user_id AS basket, event_type AS item FROM events
),
sup AS (
  SELECT item, count(*) AS s FROM bi GROUP BY item
  HAVING count(*) >= {min_support}
),
pruned AS (
  SELECT bi.basket, bi.item FROM bi JOIN sup ON bi.item = sup.item
),
pairs AS (
  SELECT a.item AS item_1, b.item AS item_2, count(*) AS n_baskets
  FROM pruned a JOIN pruned b ON a.basket = b.basket AND a.item < b.item
  GROUP BY a.item, b.item
  HAVING count(*) >= {min_support}
),
tot AS (SELECT count(DISTINCT basket) AS n FROM bi)
SELECT item_1, item_2, n_baskets,
       round(n_baskets * 1.0 / s1.s, 6) AS confidence,
       round(n_baskets * 1.0 * tot.n / (s1.s * s2.s), 6) AS lift
FROM pairs
JOIN sup s1 ON pairs.item_1 = s1.item
JOIN sup s2 ON pairs.item_2 = s2.item
CROSS JOIN tot
"""


def fk_sample_sql(fraction: float = 0.1) -> str:
    """Twin of :func:`..operators.sampling.fk_consistent_sample` —
    orders sampled by the md5 key bucket, lineitem semi-joined."""
    cut = int(round(fraction * 10000))
    return f"""
SELECT l_orderkey, l_partkey, l_linenumber
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders
  WHERE ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
        % 10000 < {cut}
)
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


def corpus_delivery_sql(n_shards: int = 8) -> str:
    """Twin of the curate-then-ship composition: curation-v3 survivors
    bucketed by the content-addressed shard rule, per-shard census."""
    return f"""
WITH kept AS (
{corpus_prep_v3_sql()}
)
SELECT shard_id, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
FROM (
  SELECT CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
              % {n_shards} AS INTEGER) AS shard_id,
         d.n_chars
  FROM documents d JOIN kept ON d.doc_id = kept.doc_id
)
GROUP BY shard_id
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


def skew_report_sql() -> str:
    """Twin of :func:`..operators.discovery.shuffle_skew_report` keyed on
    lineitem.l_partkey."""
    return """
WITH counts AS (
  SELECT CAST(l_partkey AS VARCHAR) AS key, count(*) AS cnt
  FROM lineitem GROUP BY 1
),
hot AS (
  SELECT key AS hottest_key, cnt AS max_per_key
  FROM counts ORDER BY cnt DESC, key ASC LIMIT 1
),
s AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n_rows, count(*) AS n_keys,
         round(avg(cnt), 4) AS avg_per_key,
         round(quantile_cont(cnt, 0.5), 4) AS p50_per_key,
         round(quantile_cont(cnt, 0.99), 4) AS p99_per_key
  FROM counts
)
SELECT n_rows, n_keys, avg_per_key, p50_per_key, p99_per_key,
       max_per_key,
       round(max_per_key / (n_rows * 1.0 / n_keys), 4) AS skew_ratio,
       hottest_key
FROM s CROSS JOIN hot
"""


def corpus_data_card_sql() -> str:
    """Twin of :func:`..operators.text_analysis.corpus_data_card` —
    quality/token legs reuse the per-doc twins as subqueries."""
    return f"""
WITH q AS ({text_quality_sql()}),
t AS ({text_token_counts_sql()})
SELECT 'n_docs' AS metric, CAST(count(*) AS DOUBLE) AS value FROM documents
UNION ALL SELECT 'n_chars_total', CAST(sum(n_chars) AS DOUBLE) FROM documents
UNION ALL SELECT 'n_sources', CAST(count(DISTINCT source) AS DOUBLE) FROM documents
UNION ALL SELECT 'n_langs', CAST(count(DISTINCT lang) AS DOUBLE) FROM documents
UNION ALL SELECT 'exact_dup_rate',
  round(1 - count(DISTINCT md5(text)) * 1.0 / count(*), 6) FROM documents
UNION ALL SELECT 'avg_quality', round(avg(quality_score) + 1e-9, 6) FROM q
UNION ALL SELECT 'avg_ws_tokens', round(avg(n_ws_tokens) + 1e-9, 6) FROM t
"""


def text_paragraph_filter_sql(
    min_words: int = 3, min_distinct_ratio: float = 0.5
) -> str:
    """Twin of :func:`..operators.text_analysis.paragraph_filter` over the
    planted-paragraph fixture."""
    return f"""
WITH planted AS (
  SELECT doc_id,
         text || chr(10) || 'good paragraph the data model runs well'
              || chr(10)
              || CASE WHEN doc_id % 2 = 0 THEN 'spam spam spam spam'
                      ELSE 'a b' END AS text
  FROM documents
),
sp AS (
  SELECT doc_id, string_split(text, chr(10)) AS paras FROM planted
),
ke AS (
  SELECT doc_id, paras,
         list_filter(paras, p ->
           len(list_filter(string_split(p, ' '), w -> w <> '')) >= {min_words}
           AND len(list_distinct(list_filter(string_split(p, ' '), w -> w <> '')))
               >= {min_distinct_ratio} * len(list_filter(string_split(p, ' '), w -> w <> ''))
         ) AS kept
  FROM sp
)
SELECT doc_id,
       CAST(len(paras) AS BIGINT) AS n_paragraphs,
       CAST(len(kept) AS BIGINT) AS n_kept,
       array_to_string(kept, chr(10)) AS text_filtered
FROM ke
"""


def text_c4_filters_sql(
    min_sentences: int = 3, min_sentence_words: int = 5
) -> str:
    """Twin of :func:`..operators.text_analysis.c4_rule_flags` over the
    planted sentence/boilerplate fixture."""
    from datalake_indexes_spark.operators.text_analysis import C4_BAD_PHRASES

    bad = " OR ".join(f"contains(lower(text), '{p}')" for p in C4_BAD_PHRASES)
    return f"""
WITH planted AS (
  SELECT doc_id,
         CASE CAST(doc_id % 4 AS INTEGER)
           WHEN 0 THEN text || '. The data runs well every day.'
                        || ' The model trains fast on data. It works.'
           WHEN 1 THEN text || ' lorem ipsum dolor'
           WHEN 2 THEN text || ' if (x) {{ return 1; }}'
           ELSE text END AS text
  FROM documents
),
m AS (
  SELECT doc_id, text,
         len(list_filter(string_split_regex(text, '[.!?]'), s ->
             len(list_filter(string_split(s, ' '), w -> w <> '')) >= {min_sentence_words}
         )) AS n_sentences,
         len(regexp_extract_all(text, '[.!?]')) AS n_terminal,
         ({bad}) AS has_bad_phrase,
         (contains(text, '{{') OR contains(text, '}}')) AS has_brace
  FROM planted
)
SELECT doc_id,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       round(n_terminal * 1.0 / greatest(n_sentences, 1), 4) AS terminal_ratio,
       has_bad_phrase,
       has_brace,
       (n_sentences >= {min_sentences}
        AND round(n_terminal * 1.0 / greatest(n_sentences, 1), 4) >= 1.0
        AND NOT has_bad_phrase AND NOT has_brace) AS c4_keep
FROM m
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


def events_dedup_bursts_sql(tolerance_us: int) -> str:
    """Twin of :func:`..operators.events.dedup_bursts` on
    (user_id, event_type) with event_id tie-break."""
    return f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
),
g AS (
  SELECT *,
         CASE WHEN ts_us - lag(ts_us) OVER w IS NULL
                   OR ts_us - lag(ts_us) OVER w > {tolerance_us}
              THEN 1 ELSE 0 END AS nb
  FROM e
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts_us, event_id)
),
b AS (
  SELECT *,
         sum(nb) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts_us, event_id
                       ROWS UNBOUNDED PRECEDING) AS burst
  FROM g
),
sel AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id, event_type, burst
                            ORDER BY ts_us, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id, event_type, burst)
           AS burst_size,
         max(ts_us) OVER (PARTITION BY user_id, event_type, burst)
           - min(ts_us) OVER (PARTITION BY user_id, event_type, burst)
           AS burst_span_us
  FROM b
)
SELECT user_id, event_type, ts_us, event_id, burst_size, burst_span_us
FROM sel WHERE rn = 1
"""


def events_trend_sql(x_origin_us: int, round_to: int = 6) -> str:
    """Twin of :func:`..operators.events.value_trend` — identical closed
    form over identical doubles (x in days since the shared origin)."""
    return f"""
WITH e AS (
  SELECT event_type,
         (CAST(epoch_us(ts) AS DOUBLE) - {float(x_origin_us)})
           / (86400.0 * 1000000.0) AS x,
         CAST(value AS DOUBLE) AS y
  FROM events
),
a AS (
  SELECT event_type, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sx2, sum(y * y) AS sy2
  FROM e GROUP BY event_type
),
s AS (
  SELECT event_type, n,
         sx2 - sx * sx / n AS ssxx,
         sy2 - sy * sy / n AS ssyy,
         sxy - sx * sy / n AS ssxy,
         sx, sy
  FROM a
),
t AS (
  SELECT event_type, n,
         CASE WHEN n >= 2 AND ssxx > 0 THEN ssxy / ssxx END AS slope,
         ssxx, ssyy, ssxy, sx, sy
  FROM s
)
SELECT event_type, n,
       round(slope, {round_to}) AS slope_per_day,
       round((sy - slope * sx) / n, {round_to}) AS intercept,
       round(CASE WHEN slope IS NULL THEN NULL
                  WHEN ssyy > 0 THEN (ssxy * ssxy) / (ssxx * ssyy)
                  ELSE 0.0 END, {round_to}) AS r2
FROM t
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


def events_attribution_sql(lookback_us: int) -> str:
    """Twin of :func:`..operators.events.last_touch_attribution` —
    clicks attributed to the latest in-window view (ties to the larger
    view id), left semantics."""
    return f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
c AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'click'),
v AS (SELECT event_id AS vid, user_id, ts_us AS vts
      FROM e WHERE event_type = 'view'),
j AS (
  SELECT c.event_id, v.vid, v.vts,
         row_number() OVER (PARTITION BY c.event_id
                            ORDER BY v.vts DESC, v.vid DESC) AS rn
  FROM c JOIN v
    ON v.user_id = c.user_id
   AND v.vts <= c.ts_us AND v.vts >= c.ts_us - {lookback_us}
),
w AS (SELECT event_id, vid, vts FROM j WHERE rn = 1)
SELECT c.event_id, c.user_id, c.ts_us,
       coalesce(w.vid, -1) AS attributed_id,
       coalesce(w.vts, -1) AS attributed_ts_us,
       coalesce(c.ts_us - w.vts, -1) AS attribution_lag_us
FROM c LEFT JOIN w ON w.event_id = c.event_id
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


def corpus_group_split_sql(
    train: float = 0.8, val: float = 0.1
) -> str:
    """Twin of :func:`..operators.text_analysis.group_split` on source."""
    t = int(round(train * 10000))
    v = int(round((train + val) * 10000))
    return f"""
SELECT doc_id,
       source AS group_key,
       CASE WHEN CAST(('0x' || substring(md5(source), 1, 8)) AS BIGINT)
                 % 10000 < {t} THEN 'train'
            WHEN CAST(('0x' || substring(md5(source), 1, 8)) AS BIGINT)
                 % 10000 < {v} THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def corpus_pipeline_census_sql(
    quality_threshold: float = 0.55, repetition_cap: float = 0.2
) -> str:
    """Twin of the declarative runner's funnel census for the graded
    3-stage config (sequential composition matters: each stage counts
    against the PREVIOUS stage's survivors)."""
    return f"""
WITH q AS (
  SELECT doc_id FROM ({text_quality_sql()})
  WHERE quality_score >= {quality_threshold}
),
r AS (
  SELECT doc_id FROM ({text_repetition_sql()})
  WHERE top_bigram_frac <= {repetition_cap}
),
s1 AS (SELECT d.doc_id, d.text FROM documents d JOIN q USING (doc_id)),
s2 AS (SELECT s1.doc_id, s1.text FROM s1 JOIN r USING (doc_id)),
s3 AS (SELECT min(doc_id) AS doc_id FROM s2 GROUP BY md5(text)),
c0 AS (SELECT count(*) AS n FROM documents),
c1 AS (SELECT count(*) AS n FROM s1),
c2 AS (SELECT count(*) AS n FROM s2),
c3 AS (SELECT count(*) AS n FROM s3)
SELECT 0 AS stage_idx, 'input' AS stage, c0.n AS docs_in, c0.n AS docs_out,
       0 AS dropped FROM c0
UNION ALL
SELECT 1, 'quality_min', c0.n, c1.n, c0.n - c1.n FROM c0, c1
UNION ALL
SELECT 2, 'max_repetition', c1.n, c2.n, c1.n - c2.n FROM c1, c2
UNION ALL
SELECT 3, 'dedup_exact', c2.n, c3.n, c2.n - c3.n FROM c2, c3
"""


def events_interval_pairs_sql(lookback_us: int) -> str:
    """Twin of the stream-stream interval join's candidate pairs."""
    return f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
c AS (SELECT event_id AS probe_id, user_id AS key, ts_us AS probe_ts_us
      FROM e WHERE event_type = 'click'),
v AS (SELECT event_id AS build_id, user_id, ts_us AS build_ts_us
      FROM e WHERE event_type = 'view')
SELECT c.probe_id, c.key, c.probe_ts_us, v.build_id, v.build_ts_us
FROM c JOIN v
  ON v.user_id = c.key
 AND v.build_ts_us <= c.probe_ts_us
 AND v.build_ts_us >= c.probe_ts_us - {lookback_us}
"""


def dedup_repeated_spans_sql(
    span: str, k: int = 5, min_words: int = 10, max_gram_freq: int = 100,
    modulus: int = 7,
) -> str:
    """Twin of :func:`..operators.dedup.repeated_spans` over the
    planted-span fixture (gram equality on the joined string; the engine
    joins on xxhash64 of the same string — identical modulo a ~2^-64
    collision)."""
    return f"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % {modulus} = 0
              THEN text || ' ' || '{span}' ELSE text END AS text
  FROM documents
),
w AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
  FROM planted
),
gpos AS (
  SELECT doc_id, ws,
         unnest(range(0, greatest(len(ws) - {k} + 1, 0))) AS pos
  FROM w WHERE len(ws) >= {k}
),
g AS (
  SELECT doc_id, pos,
         array_to_string(list_slice(ws, pos + 1, pos + {k}), chr(1)) AS gram
  FROM gpos
),
rare AS (
  SELECT gram FROM (
    SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY gram
  ) WHERE df <= {max_gram_freq}
),
g2 AS (SELECT g.doc_id, g.pos, g.gram FROM g JOIN rare USING (gram)),
hits AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, a.pos AS p1,
         a.pos - b.pos AS diag
  FROM g2 a JOIN g2 b ON a.gram = b.gram AND a.doc_id < b.doc_id
),
r AS (
  SELECT *,
         CASE WHEN p1 - lag(p1) OVER win IS NULL
                   OR p1 - lag(p1) OVER win > 1
              THEN 1 ELSE 0 END AS nb
  FROM hits
  WINDOW win AS (PARTITION BY d1, d2, diag ORDER BY p1)
),
rr AS (
  SELECT *, sum(nb) OVER (PARTITION BY d1, d2, diag ORDER BY p1
                          ROWS UNBOUNDED PRECEDING) AS run
  FROM r
)
SELECT d1 AS doc_id_1, d2 AS doc_id_2,
       CAST(min(p1) AS INT) AS start_1,
       CAST(min(p1) - diag AS INT) AS start_2,
       CAST(max(p1) - min(p1) + {k} AS BIGINT) AS n_words
FROM rr GROUP BY d1, d2, diag, run
HAVING max(p1) - min(p1) + {k} >= {min_words}
"""


def dedup_span_removal_sql(
    span: str, k: int = 5, min_words: int = 10, max_gram_freq: int = 100,
    modulus: int = 7,
) -> str:
    """Twin of :func:`..operators.dedup.remove_repeated_spans` composed
    over the span-detection twin (z[1]/z[2] = zipped word/index)."""
    spans_sql = dedup_repeated_spans_sql(
        span, k=k, min_words=min_words, max_gram_freq=max_gram_freq,
        modulus=modulus,
    )
    return f"""
WITH spans AS ({spans_sql}),
planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % {modulus} = 0
              THEN text || ' ' || '{span}' ELSE text END AS text
  FROM documents
),
iv AS (
  SELECT doc_id_2 AS doc_id,
         start_2 AS s, start_2 + n_words AS e
  FROM spans
),
per_doc AS (
  SELECT doc_id, list({{'s': s, 'e': e}}) AS ivs FROM iv GROUP BY doc_id
),
w AS (
  SELECT p.doc_id,
         list_filter(string_split_regex(p.text, '\\s+'), x -> x <> '') AS ws,
         coalesce(per_doc.ivs, []) AS ivs
  FROM planted p LEFT JOIN per_doc USING (doc_id)
),
cut AS (
  SELECT doc_id, ws, ivs,
         list_transform(
           list_filter(
             list_zip(ws, range(0, len(ws))),
             z -> len(list_filter(ivs, v -> z[2] >= v.s AND z[2] < v.e)) = 0
           ),
           z -> z[1]
         ) AS kept
  FROM w
)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_words_before,
       CAST(len(ws) - len(kept) AS BIGINT) AS n_words_removed,
       coalesce(array_to_string(kept, ' '), '') AS text_cleaned
FROM cut
"""


def dedup_cross_spans_sql(
    q1: str, q2: str, k: int = 5, min_words: int = 10,
    max_ref_gram_freq: int = 100,
) -> str:
    """Twin of :func:`..operators.dedup.cross_repeated_spans` over the
    benchmark-contamination fixture (Q1 suffixed on doc_id%7==0, Q2
    prefixed on doc_id%11==3; reference = the two sentences, Q1 behind a
    nonsense 3-word header so start_ref > 0 is exercised)."""
    return f"""
WITH reference AS (
  SELECT CAST(0 AS BIGINT) AS ref_id, 'xqa xqb xqc {q1}' AS text
  UNION ALL SELECT CAST(1 AS BIGINT), '{q2}'
),
planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 3 THEN '{q2}' || ' ' || t1 ELSE t1 END AS text
  FROM (
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 THEN text || ' ' || '{q1}' ELSE text END AS t1
    FROM documents
  )
),
wd AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
  FROM planted
),
wr AS (
  SELECT ref_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
  FROM reference
),
gd AS (
  SELECT doc_id,
         unnest(range(0, greatest(len(ws) - {k} + 1, 0))) AS pos, ws
  FROM wd WHERE len(ws) >= {k}
),
gd2 AS (
  SELECT doc_id, pos,
         array_to_string(list_slice(ws, pos + 1, pos + {k}), chr(1)) AS gram
  FROM gd
),
gr AS (
  SELECT ref_id,
         unnest(range(0, greatest(len(ws) - {k} + 1, 0))) AS pos, ws
  FROM wr WHERE len(ws) >= {k}
),
gr2 AS (
  SELECT ref_id, pos,
         array_to_string(list_slice(ws, pos + 1, pos + {k}), chr(1)) AS gram
  FROM gr
),
rare AS (
  SELECT gram FROM (
    SELECT gram, count(*) AS n FROM gr2 GROUP BY gram
  ) WHERE n <= {max_ref_gram_freq}
),
gr3 AS (SELECT gr2.* FROM gr2 JOIN rare USING (gram)),
hits AS (
  SELECT DISTINCT d.doc_id, r.ref_id, d.pos AS p1, d.pos - r.pos AS diag
  FROM gd2 d JOIN gr3 r ON d.gram = r.gram
),
rn AS (
  SELECT *,
         CASE WHEN p1 - lag(p1) OVER win IS NULL
                   OR p1 - lag(p1) OVER win > 1
              THEN 1 ELSE 0 END AS nb
  FROM hits
  WINDOW win AS (PARTITION BY doc_id, ref_id, diag ORDER BY p1)
),
rr AS (
  SELECT *, sum(nb) OVER (PARTITION BY doc_id, ref_id, diag ORDER BY p1
                          ROWS UNBOUNDED PRECEDING) AS run
  FROM rn
)
SELECT doc_id, ref_id,
       CAST(min(p1) AS INT) AS start_doc,
       CAST(min(p1) - diag AS INT) AS start_ref,
       CAST(max(p1) - min(p1) + {k} AS BIGINT) AS n_words
FROM rr GROUP BY doc_id, ref_id, diag, run
HAVING max(p1) - min(p1) + {k} >= {min_words}
"""


def decontaminate_spans_sql(
    q1: str, q2: str, k: int = 5, min_words: int = 10,
    max_ref_gram_freq: int = 100,
) -> str:
    """Twin of :func:`..operators.dedup.decontaminate_spans` composed
    over the cross-span twin (cut on the DOC side, no canonical
    survival)."""
    spans_sql = dedup_cross_spans_sql(
        q1, q2, k=k, min_words=min_words, max_ref_gram_freq=max_ref_gram_freq,
    )
    return f"""
WITH spans AS ({spans_sql}),
planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 3 THEN '{q2}' || ' ' || t1 ELSE t1 END AS text
  FROM (
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 THEN text || ' ' || '{q1}' ELSE text END AS t1
    FROM documents
  )
),
iv AS (
  SELECT doc_id, start_doc AS s, start_doc + n_words AS e FROM spans
),
per_doc AS (
  SELECT doc_id, list({{'s': s, 'e': e}}) AS ivs FROM iv GROUP BY doc_id
),
w AS (
  SELECT p.doc_id,
         list_filter(string_split_regex(p.text, '\\s+'), x -> x <> '') AS ws,
         coalesce(per_doc.ivs, []) AS ivs
  FROM planted p LEFT JOIN per_doc USING (doc_id)
),
cut AS (
  SELECT doc_id, ws, ivs,
         list_transform(
           list_filter(
             list_zip(ws, range(0, len(ws))),
             z -> len(list_filter(ivs, v -> z[2] >= v.s AND z[2] < v.e)) = 0
           ),
           z -> z[1]
         ) AS kept
  FROM w
)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_words_before,
       CAST(len(ws) - len(kept) AS BIGINT) AS n_words_removed,
       coalesce(array_to_string(kept, ' '), '') AS text_cleaned
FROM cut
"""


def dedup_self_spans_sql(
    sent: str, k: int = 5, min_words: int = 10, max_gram_occ: int = 50,
    modulus: int = 13, residue: int = 5,
) -> str:
    """Twin of :func:`..operators.dedup.self_repeated_spans` over the
    twice-appended-sentence fixture (gram equality on the joined string,
    occurrence cap per (doc, gram) as a window count)."""
    return f"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % {modulus} = {residue}
              THEN text || ' ' || '{sent}' || ' zzfill ' || '{sent}'
              ELSE text END AS text
  FROM documents
),
w AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
  FROM planted
),
gpos AS (
  SELECT doc_id, ws,
         unnest(range(0, greatest(len(ws) - {k} + 1, 0))) AS pos
  FROM w WHERE len(ws) >= {k}
),
g AS (
  SELECT doc_id, pos,
         array_to_string(list_slice(ws, pos + 1, pos + {k}), chr(1)) AS gram
  FROM gpos
),
g2 AS (
  SELECT doc_id, pos, gram FROM (
    SELECT *, count(*) OVER (PARTITION BY doc_id, gram) AS occ FROM g
  ) WHERE occ <= {max_gram_occ}
),
hits AS (
  SELECT DISTINCT a.doc_id, a.pos AS p1, a.pos - b.pos AS diag
  FROM g2 a JOIN g2 b
    ON a.doc_id = b.doc_id AND a.gram = b.gram AND a.pos < b.pos
),
rn AS (
  SELECT *,
         CASE WHEN p1 - lag(p1) OVER win IS NULL
                   OR p1 - lag(p1) OVER win > 1
              THEN 1 ELSE 0 END AS nb
  FROM hits
  WINDOW win AS (PARTITION BY doc_id, diag ORDER BY p1)
),
rr AS (
  SELECT *, sum(nb) OVER (PARTITION BY doc_id, diag ORDER BY p1
                          ROWS UNBOUNDED PRECEDING) AS run
  FROM rn
)
SELECT doc_id,
       CAST(min(p1) AS INT) AS start_1,
       CAST(min(p1) - diag AS INT) AS start_2,
       CAST(max(p1) - min(p1) + {k} AS BIGINT) AS n_words
FROM rr GROUP BY doc_id, diag, run
HAVING max(p1) - min(p1) + {k} >= {min_words}
"""


def dedup_self_removal_sql(
    sent: str, k: int = 5, min_words: int = 10, max_gram_occ: int = 50,
    modulus: int = 13, residue: int = 5,
) -> str:
    """Twin of :func:`..operators.dedup.remove_self_repetitions`
    composed over the self-span twin (cut the start_2 side)."""
    spans_sql = dedup_self_spans_sql(
        sent, k=k, min_words=min_words, max_gram_occ=max_gram_occ,
        modulus=modulus, residue=residue,
    )
    return f"""
WITH spans AS ({spans_sql}),
planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % {modulus} = {residue}
              THEN text || ' ' || '{sent}' || ' zzfill ' || '{sent}'
              ELSE text END AS text
  FROM documents
),
iv AS (
  SELECT doc_id, start_2 AS s, start_2 + n_words AS e FROM spans
),
per_doc AS (
  SELECT doc_id, list({{'s': s, 'e': e}}) AS ivs FROM iv GROUP BY doc_id
),
w AS (
  SELECT p.doc_id,
         list_filter(string_split_regex(p.text, '\\s+'), x -> x <> '') AS ws,
         coalesce(per_doc.ivs, []) AS ivs
  FROM planted p LEFT JOIN per_doc USING (doc_id)
),
cut AS (
  SELECT doc_id, ws, ivs,
         list_transform(
           list_filter(
             list_zip(ws, range(0, len(ws))),
             z -> len(list_filter(ivs, v -> z[2] >= v.s AND z[2] < v.e)) = 0
           ),
           z -> z[1]
         ) AS kept
  FROM w
)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_words_before,
       CAST(len(ws) - len(kept) AS BIGINT) AS n_words_removed,
       coalesce(array_to_string(kept, ' '), '') AS text_cleaned
FROM cut
"""


def contamination_report_sql(
    q1: str, q2: str, k: int = 5, min_words: int = 10,
    max_ref_gram_freq: int = 100,
) -> str:
    """Twin of :func:`..operators.dedup.contamination_report` over the
    cross-span twin joined back to the documents' source column."""
    spans_sql = dedup_cross_spans_sql(
        q1, q2, k=k, min_words=min_words, max_ref_gram_freq=max_ref_gram_freq,
    )
    return f"""
WITH spans AS ({spans_sql})
SELECT d.source AS \"group\", s.ref_id,
       CAST(count(DISTINCT s.doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(s.n_words) AS BIGINT) AS words_leaked
FROM spans s JOIN documents d ON s.doc_id = d.doc_id
GROUP BY d.source, s.ref_id
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


def heavy_hitters_sql(m: int = 200) -> str:
    """Heavy-hitter twin: the sketch is an engine-side candidate
    optimization the exact filter erases, so the oracle is the plain
    threshold aggregate."""
    return f"""
WITH words AS MATERIALIZED (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
tot AS (SELECT count(*) AS n FROM words)
SELECT word, count(*) AS total_count,
       round(count(*) * 1.0 / any_value(t.n), 6) AS share
FROM words, tot t
GROUP BY word
HAVING count(*) * {m} > any_value(t.n)
"""


def inter_arrival_stats_sql() -> str:
    """Inter-arrival twin: identical (ts, event_id) total order for the
    lag, the SAME hand-rolled lo + frac·(hi − lo) interpolation over
    sorted integer microsecond gaps, and NO rounding anywhere — every
    output double is the identical IEEE value on both engines (round()
    half-boundary semantics differ between them)."""

    def interp(qlit: str) -> str:
        # CAST the quantile literal to DOUBLE: DuckDB parses 0.95 as
        # DECIMAL, whose exact frac diverges from Spark's double 0.95
        q = f"CAST({qlit} AS DOUBLE)"
        return f"""(CAST(gl[CAST(floor({q} * (n_gaps - 1)) AS INT) + 1] AS DOUBLE)
        + ({q} * (n_gaps - 1) - floor({q} * (n_gaps - 1)))
          * (CAST(gl[least(CAST(floor({q} * (n_gaps - 1)) AS INT) + 2,
                           CAST(n_gaps AS INT))] AS DOUBLE)
             - CAST(gl[CAST(floor({q} * (n_gaps - 1)) AS INT) + 1] AS DOUBLE)))"""

    return f"""
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS gap_us
  FROM events
),
a AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
         avg(gap_us) AS mean_us, max(gap_us) AS max_us,
         list_sort(list(gap_us)) AS gl
  FROM g WHERE gap_us IS NOT NULL GROUP BY 1
)
SELECT user_id, n_gaps,
       mean_us AS mean_gap_us,
       {interp("0.5")} AS p50_gap_us,
       {interp("0.95")} AS p95_gap_us,
       CAST(max_us AS DOUBLE) AS max_gap_us
FROM a
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


def rolling_active_users_sql(
    window_periods: int = 7, period_us: int = 86_400_000_000
) -> str:
    """WAU twin: same contribute-forward decomposition (each distinct
    (user, period) row feeds the ``window_periods`` periods it keeps
    alive), same last-observed-period bound."""
    w = int(window_periods)
    return f"""
WITH act AS MATERIALIZED (
  SELECT DISTINCT user_id,
         CAST(floor(epoch_us(ts) / {period_us}) AS BIGINT) AS period
  FROM events
),
bounds AS (SELECT max(period) AS hi FROM act),
contrib AS (
  SELECT a.user_id, a.period + o.o AS period
  FROM act a, (SELECT unnest(generate_series(0, {w - 1})) AS o) o
),
daily AS (SELECT period, count(*) AS n_active FROM act GROUP BY 1),
rolling AS (
  SELECT c.period, count(DISTINCT c.user_id) AS rolling_active
  FROM contrib c, bounds b WHERE c.period <= b.hi GROUP BY 1
)
SELECT r.period, coalesce(d.n_active, 0) AS n_active, r.rolling_active,
       round(coalesce(d.n_active, 0) * 1.0 / r.rolling_active, 6) AS stickiness
FROM rolling r LEFT JOIN daily d ON d.period = r.period
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


def rolling_forecast_backtest_sql(window_rows: int = 5) -> str:
    """Per-key rolling-OLS backtest twin: identical sequence-number
    regressor, identical exact-DECIMAL value-side window sums (order-
    independent, so DuckDB's segment-tree sliding frames agree with
    Spark's frame replay bit for bit), identical closed form in doubles."""
    w = int(window_rows)
    return f"""
WITH base AS (
  SELECT user_id AS key, CAST(value AS DOUBLE) AS y,
         epoch_us(ts) AS tsu, event_id
  FROM events WHERE value IS NOT NULL
),
seqd AS (
  SELECT key, y,
         CAST(row_number() OVER (PARTITION BY key ORDER BY tsu, event_id) AS BIGINT) AS x,
         lag(y, 1) OVER (PARTITION BY key ORDER BY tsu, event_id) AS prev
  FROM base
),
fitted AS (
  SELECT key, y, x, prev,
         count(*) OVER tw AS n,
         sum(x) OVER tw AS sx,
         sum(x * x) OVER tw AS sxx,
         sum(CAST(round(y, 6) AS DECIMAL(28,6))) OVER tw AS syd,
         sum(x * CAST(round(y, 6) AS DECIMAL(28,6))) OVER tw AS sxyd
  FROM seqd
  WINDOW tw AS (PARTITION BY key ORDER BY x
                ROWS BETWEEN {w} PRECEDING AND 1 PRECEDING)
),
scored AS (
  SELECT key,
         y - ((CAST(syd AS DOUBLE)
               - ((CAST(n AS DOUBLE) * CAST(sxyd AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(syd AS DOUBLE))
                  / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0))
                 * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
              + ((CAST(n AS DOUBLE) * CAST(sxyd AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(syd AS DOUBLE))
                 / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0))
                * CAST(x AS DOUBLE)) AS err,
         y - prev AS nerr
  FROM fitted WHERE n = {w}
),
agg AS (
  SELECT key, count(*) AS n_forecasts,
         avg(abs(err)) AS mae0,
         sqrt(avg(err * err)) AS rmse0,
         avg(err) AS bias0,
         avg(abs(nerr)) AS nmae0
  FROM scored WHERE err IS NOT NULL GROUP BY 1
)
SELECT key, CAST(n_forecasts AS BIGINT) AS n_forecasts,
       round(mae0, 4) AS mae,
       round(rmse0, 4) AS rmse,
       round(bias0, 4) + 0.0 AS bias,
       round(nmae0, 4) AS naive_mae,
       round(1.0 - mae0 / nullif(nmae0, 0.0), 4) + 0.0 AS skill
FROM agg
"""


def _sql_str(s: str) -> str:
    """Render a Python string as a DuckDB expression via chr() concat —
    sidesteps every literal-escaping concern for control/unicode chars."""
    if not s:
        return "''"
    return " || ".join(f"chr({ord(c)})" for c in s)


def normalize_text_sql() -> str:
    """Unicode-normalization twin: replace/regexp chains generated from
    the engine's shared rule tables (NORMALIZE_CHAR_MAP /
    NORMALIZE_REGEX_RULES), planted noise mirrored via chr() codes."""
    from datalake_indexes_spark.operators.text_analysis import (
        NORMALIZE_CHAR_MAP,
        NORMALIZE_REGEX_RULES,
        PLANT_NOISE_PREFIX,
        PLANT_NOISE_SUFFIX,
    )

    expr = "text"
    for src, dst in NORMALIZE_CHAR_MAP:
        expr = f"replace({expr}, {_sql_str(src)}, {_sql_str(dst)})"
    for pat, rep in NORMALIZE_REGEX_RULES:
        pat_sql = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat_sql}', {_sql_str(rep)}, 'g')"
    expr = f"trim({expr})"
    return f"""
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0
              THEN {_sql_str(PLANT_NOISE_PREFIX)} || text || {_sql_str(PLANT_NOISE_SUFFIX)}
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       {expr} AS normalized,
       CAST(len(text) AS BIGINT) AS n_chars_before,
       CAST(len({expr}) AS BIGINT) AS n_chars_after
FROM p
"""


def survival_curve_sql(
    period_us: int = 86_400_000_000, censor_horizon_periods: int = 7
) -> str:
    """Kaplan–Meier twin: identical integer-floor durations, identical
    censoring rule, identical exp(Σ ln(1−d/n)) cumulative form with the
    d == n step excluded from the log sum and tracked as a zero flag
    (Spark's ln(0) is NULL and sum() skips it — both engines must agree
    on the explicit handling instead)."""
    p = int(period_us)
    h = int(censor_horizon_periods) * p
    return f"""
WITH t0 AS (SELECT min(epoch_us(ts)) AS t0 FROM events),
planted AS (
  SELECT e.user_id, epoch_us(e.ts) AS tsu
  FROM events e, t0
  WHERE epoch_us(e.ts) < t0.t0 + ((e.user_id % 40) + 1) * 86400000000
),
spans AS (
  SELECT user_id, min(tsu) AS first_ts, max(tsu) AS last_ts
  FROM planted GROUP BY 1
),
bounds AS (SELECT max(last_ts) AS corpus_last FROM spans),
per_key AS (
  SELECT (last_ts - first_ts - ((last_ts - first_ts) % {p})) // {p} AS duration,
         (last_ts >= b.corpus_last - {h}) AS censored
  FROM spans, bounds b
),
counts AS (
  SELECT duration,
         sum(CASE WHEN censored THEN 0 ELSE 1 END) AS n_events,
         sum(CASE WHEN censored THEN 1 ELSE 0 END) AS n_censored
  FROM per_key GROUP BY 1
),
risk AS (
  SELECT duration, n_events, n_censored,
         sum(n_events + n_censored) OVER () -
           coalesce(sum(n_events + n_censored) OVER (
             ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS at_risk
  FROM counts
),
curve AS (
  SELECT duration, at_risk, n_events, n_censored,
         coalesce(sum(CASE WHEN n_events < at_risk
                           THEN ln(1.0 - n_events * 1.0 / at_risk) END)
           OVER (ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0)
           AS logs,
         sum(CASE WHEN n_events = at_risk THEN 1 ELSE 0 END)
           OVER (ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS dead
  FROM risk
)
SELECT duration,
       CAST(at_risk AS BIGINT) AS n_at_risk,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_censored AS BIGINT) AS n_censored,
       CASE WHEN dead > 0 THEN 0.0 ELSE round(exp(logs), 6) END AS survival,
       n_events > 0 AS is_event_time
FROM curve
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


def ab_conversion_test_sql(
    convert_type: str = "purchase",
    baseline_type: str = "click",
    z_crit: float = 1.959963984540054,
) -> str:
    """Two-proportion z twin: same md5-bucket variant assignment (the
    package's shared bucket rule), same scale-free more-X-than-Y
    conversion, same pooled-SE closed form, NaN on zero pooled
    variance."""
    se = ("sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))"
          " * (1.0 - (conv_a + conv_b) * 1.0 / (n_a + n_b))"
          " * (1.0 / n_a + 1.0 / n_b))")
    z = (f"CASE WHEN {se} > 0 THEN"
         f" (conv_a * 1.0 / n_a - conv_b * 1.0 / n_b) / {se}"
         f" ELSE 'NaN'::DOUBLE END")
    return f"""
WITH per_user AS (
  SELECT user_id,
         CASE WHEN sum(CASE WHEN event_type = '{convert_type}' THEN 1 ELSE 0 END)
                 > sum(CASE WHEN event_type = '{baseline_type}' THEN 1 ELSE 0 END)
              THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY 1
),
tagged AS (
  SELECT conv,
         CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS v
  FROM per_user
),
agg AS (
  SELECT sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS n_a,
         sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS n_b,
         sum(CASE WHEN v = 0 THEN conv ELSE 0 END) AS conv_a,
         sum(CASE WHEN v = 1 THEN conv ELSE 0 END) AS conv_b
  FROM tagged
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(conv_a AS BIGINT) AS conv_a, CAST(conv_b AS BIGINT) AS conv_b,
       round(conv_a * 1.0 / n_a, 6) AS rate_a,
       round(conv_b * 1.0 / n_b, 6) AS rate_b,
       round((conv_a * 1.0 / n_a) / nullif(conv_b * 1.0 / n_b, 0.0) - 1.0, 6) AS lift,
       round({z}, 4) AS z_score,
       CASE WHEN {se} > 0 THEN abs({z}) > CAST({z_crit!r} AS DOUBLE) ELSE false END AS significant
FROM agg
"""


def cusum_changepoints_sql(
    period_us: int = 86_400_000_000,
    score_crit: float = 1.358,
    plant_predicate: str | None = None,
) -> str:
    """CUSUM twin: identical dense per-type period grid, identical
    integer-exact cumulative counts, identical surplus/score closed
    forms, earliest-period argmax tie-break.  ``plant_predicate``
    optionally filters the events first (mirrors a planted rate
    shift)."""
    p = int(period_us)
    where = f"WHERE {plant_predicate}" if plant_predicate else ""
    return f"""
WITH ev AS (
  SELECT event_type,
         (epoch_us(ts) - (epoch_us(ts) % {p})) // {p} AS period
  FROM events {where}
),
counts AS (
  SELECT event_type, period, count(*) AS c FROM ev GROUP BY 1, 2
),
bounds AS (SELECT min(period) AS lo, max(period) AS hi FROM counts),
grid AS (
  SELECT t.event_type, g.period
  FROM (SELECT DISTINCT event_type FROM counts) t,
       (SELECT unnest(generate_series((SELECT lo FROM bounds),
                                      (SELECT hi FROM bounds))) AS period) g
),
dense AS (
  SELECT g.event_type, g.period, coalesce(c.c, 0) AS c
  FROM grid g LEFT JOIN counts c
    ON c.event_type = g.event_type AND c.period = g.period
),
scored AS (
  SELECT event_type, period,
         abs(CAST(sum(c) OVER (PARTITION BY event_type ORDER BY period
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             - CAST(row_number() OVER (PARTITION BY event_type ORDER BY period) AS DOUBLE)
               * (CAST(sum(c) OVER (PARTITION BY event_type) AS DOUBLE)
                  / CAST(count(*) OVER (PARTITION BY event_type) AS DOUBLE))) AS a,
         count(*) OVER (PARTITION BY event_type) AS n,
         sum(c) OVER (PARTITION BY event_type) AS tot,
         sum(c * c) OVER (PARTITION BY event_type) AS sq
  FROM dense
),
best AS (
  SELECT event_type, any_value(n) AS n_periods, max(a) AS amax,
         any_value(tot) AS tot, any_value(sq) AS sq
  FROM scored GROUP BY 1
),
arg AS (
  SELECT s.event_type, min(s.period) AS change_period
  FROM scored s JOIN best b ON b.event_type = s.event_type AND s.a = b.amax
  GROUP BY 1
)
SELECT b.event_type,
       CAST(b.n_periods AS BIGINT) AS n_periods,
       a.change_period,
       round(b.amax, 6) AS max_cusum_abs,
       round(CASE WHEN CAST(b.sq AS DOUBLE) / b.n_periods
                       - (CAST(b.tot AS DOUBLE) / b.n_periods)
                         * (CAST(b.tot AS DOUBLE) / b.n_periods) > 0
                  THEN b.amax / (sqrt(CAST(b.sq AS DOUBLE) / b.n_periods
                                      - (CAST(b.tot AS DOUBLE) / b.n_periods)
                                        * (CAST(b.tot AS DOUBLE) / b.n_periods))
                                 * sqrt(CAST(b.n_periods AS DOUBLE))) END, 6) AS score,
       coalesce(CASE WHEN CAST(b.sq AS DOUBLE) / b.n_periods
                          - (CAST(b.tot AS DOUBLE) / b.n_periods)
                            * (CAST(b.tot AS DOUBLE) / b.n_periods) > 0
                     THEN b.amax / (sqrt(CAST(b.sq AS DOUBLE) / b.n_periods
                                         - (CAST(b.tot AS DOUBLE) / b.n_periods)
                                           * (CAST(b.tot AS DOUBLE) / b.n_periods))
                                    * sqrt(CAST(b.n_periods AS DOUBLE)))
                          > CAST({score_crit!r} AS DOUBLE) END, false) AS change_flag
FROM best b JOIN arg a ON a.event_type = b.event_type
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


def ab_cuped_test_sql(
    metric_type: str = "purchase", z_crit: float = 1.959963984540054
) -> str:
    """CUPED twin: same integer midpoint split, same md5 variant rule,
    same exact integer moment sums, same algebraic expansion of the
    adjusted means/variances (expression trees mirrored term for term)."""
    return f"""
WITH mid AS (
  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS m FROM events
),
per_user AS (
  SELECT user_id,
         sum(CASE WHEN epoch_us(ts) < mid.m
                  AND event_type = '{metric_type}' THEN 1 ELSE 0 END) AS x,
         sum(CASE WHEN epoch_us(ts) >= mid.m
                  AND event_type = '{metric_type}' THEN 1 ELSE 0 END) AS y
  FROM events, mid GROUP BY user_id, mid.m
),
tagged AS (
  SELECT x, y,
         CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS v
  FROM per_user
),
agg AS (
  SELECT
    sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS n_a,
    sum(CASE WHEN v = 0 THEN x ELSE 0 END) AS sx_a,
    sum(CASE WHEN v = 0 THEN y ELSE 0 END) AS sy_a,
    sum(CASE WHEN v = 0 THEN x * x ELSE 0 END) AS sxx_a,
    sum(CASE WHEN v = 0 THEN y * y ELSE 0 END) AS syy_a,
    sum(CASE WHEN v = 0 THEN x * y ELSE 0 END) AS sxy_a,
    sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS n_b,
    sum(CASE WHEN v = 1 THEN x ELSE 0 END) AS sx_b,
    sum(CASE WHEN v = 1 THEN y ELSE 0 END) AS sy_b,
    sum(CASE WHEN v = 1 THEN x * x ELSE 0 END) AS sxx_b,
    sum(CASE WHEN v = 1 THEN y * y ELSE 0 END) AS syy_b,
    sum(CASE WHEN v = 1 THEN x * y ELSE 0 END) AS sxy_b
  FROM tagged
),
pooled AS (
  SELECT *,
    CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS n,
    (CAST(sx_a AS DOUBLE) + CAST(sx_b AS DOUBLE))
      / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS xbar,
    (CAST(sy_a AS DOUBLE) + CAST(sy_b AS DOUBLE))
      / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS ybar
  FROM agg
),
stats AS (
  SELECT *,
    (CAST(sxx_a AS DOUBLE) + CAST(sxx_b AS DOUBLE)) / n - xbar * xbar AS var_x,
    (CAST(syy_a AS DOUBLE) + CAST(syy_b AS DOUBLE)) / n - ybar * ybar AS var_y,
    (CAST(sxy_a AS DOUBLE) + CAST(sxy_b AS DOUBLE)) / n - xbar * ybar AS cov
  FROM pooled
),
theta_t AS (SELECT *, cov / nullif(var_x, 0.0) AS theta FROM stats),
var_t AS (
  SELECT *, var_y - 2.0 * theta * cov + theta * theta * var_x AS var_adj
  FROM theta_t
),
sides AS (
  SELECT *,
    CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
      - theta * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) - xbar) AS ma,
    CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE)
      - theta * (CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) - xbar) AS mb,
    CAST(syy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
      - (CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        * (CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)) AS vya,
    CAST(syy_b AS DOUBLE) / CAST(n_b AS DOUBLE)
      - (CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        * (CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE)) AS vyb,
    CAST(sxx_a AS DOUBLE) / CAST(n_a AS DOUBLE)
      - (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)) AS vxa,
    CAST(sxx_b AS DOUBLE) / CAST(n_b AS DOUBLE)
      - (CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        * (CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE)) AS vxb,
    CAST(sxy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
      - (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        * (CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)) AS cva,
    CAST(sxy_b AS DOUBLE) / CAST(n_b AS DOUBLE)
      - (CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        * (CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE)) AS cvb
  FROM var_t
),
final AS (
  SELECT *,
    vya - 2.0 * theta * cva + theta * theta * vxa AS vaa,
    vyb - 2.0 * theta * cvb + theta * theta * vxb AS vab
  FROM sides
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(theta, 6) AS theta,
       round(var_adj / nullif(var_y, 0.0), 6) AS var_reduction,
       round(ma, 6) AS mean_adj_a,
       round(mb, 6) AS mean_adj_b,
       round(CASE WHEN vya / CAST(n_a AS DOUBLE) + vyb / CAST(n_b AS DOUBLE) > 0
                  THEN (CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                        - CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                       / sqrt(vya / CAST(n_a AS DOUBLE)
                              + vyb / CAST(n_b AS DOUBLE)) END, 4) AS z_raw,
       round(CASE WHEN vaa / CAST(n_a AS DOUBLE) + vab / CAST(n_b AS DOUBLE) > 0
                  THEN (ma - mb) / sqrt(vaa / CAST(n_a AS DOUBLE)
                                        + vab / CAST(n_b AS DOUBLE)) END, 4) AS z_adj,
       coalesce(CASE WHEN vaa / CAST(n_a AS DOUBLE) + vab / CAST(n_b AS DOUBLE) > 0
                     THEN abs((ma - mb) / sqrt(vaa / CAST(n_a AS DOUBLE)
                                               + vab / CAST(n_b AS DOUBLE)))
                            > CAST({z_crit!r} AS DOUBLE) END, false) AS significant
FROM final
"""


def zipf_fit_sql(top_n: int = 1000) -> str:
    """Zipf twin: same whitespace tokenization as vocab_topk, same
    deterministic (count DESC, word ASC) top-n, same ln-ln OLS closed
    form."""
    return f"""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
counts AS (
  SELECT w, count(*) AS c FROM words WHERE w <> '' GROUP BY 1
),
totals AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS vocab_size
  FROM counts
),
top AS (
  SELECT w, c FROM counts ORDER BY c DESC, w ASC LIMIT {int(top_n)}
),
ranked AS (
  SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, w ASC) AS DOUBLE)) AS lr,
         ln(CAST(c AS DOUBLE)) AS lf
  FROM top
),
fit AS (
  SELECT count(*) AS n, sum(lr) AS sx, sum(lf) AS sy,
         sum(lr * lr) AS sxx, sum(lf * lf) AS syy, sum(lr * lf) AS sxy
  FROM ranked
)
SELECT t.n_tokens, t.vocab_size, CAST(f.n AS BIGINT) AS top_n,
       round((CAST(f.n AS DOUBLE) * f.sxy - f.sx * f.sy)
             / nullif(CAST(f.n AS DOUBLE) * f.sxx - f.sx * f.sx, 0.0), 6) AS slope,
       round((f.sy - ((CAST(f.n AS DOUBLE) * f.sxy - f.sx * f.sy)
                      / nullif(CAST(f.n AS DOUBLE) * f.sxx - f.sx * f.sx, 0.0))
                     * f.sx) / CAST(f.n AS DOUBLE), 6) AS intercept,
       round(((CAST(f.n AS DOUBLE) * f.sxy - f.sx * f.sy)
              / nullif(sqrt((CAST(f.n AS DOUBLE) * f.sxx - f.sx * f.sx)
                            * (CAST(f.n AS DOUBLE) * f.syy - f.sy * f.sy)), 0.0))
             * ((CAST(f.n AS DOUBLE) * f.sxy - f.sx * f.sy)
                / nullif(sqrt((CAST(f.n AS DOUBLE) * f.sxx - f.sx * f.sx)
                              * (CAST(f.n AS DOUBLE) * f.syy - f.sy * f.sy)), 0.0)), 6) AS r2
FROM fit f, totals t
"""


def funnel_timing_sql(steps: list[str]) -> str:
    """Funnel-timing twin: the funnel CTE chain unpivoted to transitions,
    same converters-only exact-percentile gap stats."""
    inner = events_funnel_sql(steps).strip().rstrip()
    arms = []
    for i in range(1, len(steps)):
        label = f"{i}:{steps[i - 1]}->{steps[i]}"
        arms.append(
            f"SELECT '{label}' AS transition, step{i}_us AS f, step{i + 1}_us AS t FROM fn"
        )
    return f"""
WITH fn AS ({inner}),
stacked AS (
  {'  UNION ALL  '.join(arms)}
)
SELECT transition,
       CAST(count(*) AS BIGINT) AS n_from,
       CAST(sum(CASE WHEN t <> -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_to,
       round(sum(CASE WHEN t <> -1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS conversion_rate,
       round(quantile_cont(CASE WHEN t <> -1
                           THEN (t - f) / 1000000.0 END, 0.5), 6) AS median_s,
       round(quantile_cont(CASE WHEN t <> -1
                           THEN (t - f) / 1000000.0 END, 0.95), 6) AS p95_s
FROM stacked
WHERE f <> -1
GROUP BY transition
"""


def corpus_drop_audit_sql(
    quality_threshold: float = 0.55, repetition_cap: float = 0.2
) -> str:
    """Twin of the per-document drop audit for the graded 3-stage config:
    first failing stage wins; quality and repetition are per-doc
    independent, dedup keepers are computed over the stage-2 survivors
    exactly like the runner composes them."""
    return f"""
WITH q AS (
  SELECT doc_id FROM ({text_quality_sql()})
  WHERE quality_score >= {quality_threshold}
),
r AS (
  SELECT doc_id FROM ({text_repetition_sql()})
  WHERE top_bigram_frac <= {repetition_cap}
),
s2 AS (
  SELECT d.doc_id, d.text FROM documents d
  JOIN q USING (doc_id) JOIN r USING (doc_id)
),
keepers AS (SELECT min(doc_id) AS doc_id FROM s2 GROUP BY md5(text))
SELECT d.doc_id,
       CASE WHEN q.doc_id IS NULL THEN 'quality_min'
            WHEN r.doc_id IS NULL THEN 'max_repetition'
            WHEN k.doc_id IS NULL THEN 'dedup_exact'
            ELSE 'survived' END AS dropped_at
FROM documents d
LEFT JOIN q ON q.doc_id = d.doc_id
LEFT JOIN r ON r.doc_id = d.doc_id
LEFT JOIN keepers k ON k.doc_id = d.doc_id
"""


def doc_novelty_sql(n: int = 3, modulus: int = 6) -> str:
    """Novelty twin over the planted-duplication corpus (every
    ``modulus``-th doc is replaced by a shared boilerplate text, mirrored
    by the query): distinct word n-grams per doc, df = 1 share."""
    return f"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % {modulus} = 0
              THEN 'shared boilerplate header applies to every mirrored document in this synthetic corpus'
              ELSE text END AS text
  FROM documents
),
w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM planted
),
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(ws[pos + 1 : pos + {n}], ' ') AS shingle
  FROM (
    SELECT doc_id, ws, unnest(range(0, len(ws) - {n} + 1)) AS pos
    FROM w WHERE len(ws) >= {n}
  )
),
dfc AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
per_doc AS (
  SELECT sh.doc_id, count(*) AS n_shingles,
         sum(CASE WHEN dfc.df = 1 THEN 1 ELSE 0 END) AS novel
  FROM sh JOIN dfc USING (shingle) GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(p.n_shingles, 0) AS BIGINT) AS n_shingles,
       round(p.novel * 1.0 / nullif(p.n_shingles, 0), 6) AS novel_frac
FROM planted d LEFT JOIN per_doc p USING (doc_id)
"""


def pareto_report_sql(
    targets: tuple[float, ...] = (0.5, 0.8, 0.9, 0.95, 0.99),
) -> str:
    """Pareto twin over per-document character weight — an INDEPENDENT
    derivation: plain global cumulative window (fine at oracle scale)
    vs the engine's two-level bucket prefix sum; agreement proves the
    decomposition."""
    arms = "\n  UNION ALL\n  ".join(
        f"SELECT CAST({t!r} AS DOUBLE) AS target_share,"
        f" min(rnk) AS n_keys,"
        f" min_by(cum_share, rnk) AS share"
        f" FROM ranked WHERE cum_share >= {t!r}"
        for t in targets
    )
    return f"""
WITH per_key AS (
  SELECT doc_id AS k, CAST(len(text) AS DOUBLE) AS w FROM documents
),
ranked AS (
  SELECT row_number() OVER (ORDER BY w DESC, k ASC) AS rnk,
         sum(w) OVER (ORDER BY w DESC, k ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           / (SELECT sum(w) FROM per_key) AS cum_share
  FROM per_key
),
tot AS (SELECT count(*) AS n FROM per_key),
hits AS (
  {arms}
)
SELECT h.target_share,
       CAST(h.n_keys AS BIGINT) AS n_keys,
       round(h.share, 6) AS share_reached,
       round(h.n_keys * 1.0 / t.n, 6) AS key_frac
FROM hits h, tot t
ORDER BY h.target_share
"""


def scd2_lookup_sql() -> str:
    """Point-in-time lookup twin: the signup-tier SCD2 history (same
    lag/lead CTE as events_scd2_sql) consumed via DuckDB's NATIVE
    ``ASOF LEFT JOIN`` — an independent engine feature standing in for
    the package's tagged union-window — plus the same interval-end
    check."""
    return """
WITH obs AS (
  SELECT user_id, CAST(floor(value / 20.0) AS BIGINT) AS tier,
         epoch_us(ts) AS ts_us, event_id
  FROM events WHERE event_type = 'signup'
),
ordered AS (
  SELECT user_id, tier, ts_us, event_id,
         lag(tier) OVER w AS prev, row_number() OVER w AS rn
  FROM obs WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
starts AS (
  SELECT user_id, tier, ts_us FROM ordered
  WHERE rn = 1 OR prev IS DISTINCT FROM tier
),
hist AS (
  SELECT user_id, tier, ts_us AS valid_from,
         lead(ts_us) OVER w2 AS valid_to,
         row_number() OVER w2 AS version
  FROM starts WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us)
),
facts AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'purchase'
)
SELECT f.event_id, f.user_id, f.ts_us,
       coalesce(CASE WHEN h.valid_to IS NULL OR f.ts_us < h.valid_to
                     THEN h.tier END, -1) AS dim_tier,
       CAST(coalesce(CASE WHEN h.valid_to IS NULL OR f.ts_us < h.valid_to
                          THEN h.version END, -1) AS INT) AS dim_version
FROM facts f ASOF LEFT JOIN hist h
  ON f.user_id = h.user_id AND f.ts_us >= h.valid_from
"""


def rfm_segments_sql(purchase_type: str = "purchase", n_tiles: int = 5) -> str:
    """RFM twin: same per-key aggregates, same (metric, key) total-order
    ntile cuts, same flipped best-is-5 convention."""
    n = int(n_tiles)
    return f"""
WITH bounds AS (SELECT max(epoch_us(ts)) AS last FROM events),
per_key AS (
  SELECT user_id AS key,
         max(epoch_us(ts)) AS last_p,
         CAST(count(*) AS BIGINT) AS frequency,
         coalesce(round(sum(CAST(value AS DOUBLE)), 6), 0.0) AS monetary
  FROM events WHERE event_type = '{purchase_type}' GROUP BY 1
),
m AS (
  SELECT key, CAST(b.last - last_p AS BIGINT) AS recency_us,
         frequency, monetary
  FROM per_key, bounds b
),
tiled AS (
  SELECT key, recency_us, frequency, monetary,
         ntile({n}) OVER (ORDER BY recency_us ASC, key ASC) AS tr,
         ntile({n}) OVER (ORDER BY frequency DESC, key ASC) AS tf,
         ntile({n}) OVER (ORDER BY monetary DESC, key ASC) AS tm
  FROM m
)
SELECT key, recency_us, frequency, monetary,
       CAST({n + 1} - tr AS INT) AS r,
       CAST({n + 1} - tf AS INT) AS f,
       CAST({n + 1} - tm AS INT) AS m,
       CAST({n + 1} - tr AS VARCHAR) || CAST({n + 1} - tf AS VARCHAR)
         || CAST({n + 1} - tm AS VARCHAR) AS segment
FROM tiled
"""


def rate_cross_correlation_sql(
    type_a: str, type_b: str, max_lag: int = 7, period_us: int = 86_400_000_000
) -> str:
    """Cross-correlation twin: same shared dense grid, same lag-shifted
    equi-join, same integer-sum Pearson closed form."""
    p = int(period_us)
    L = int(max_lag)
    return f"""
WITH counts AS (
  SELECT event_type AS t,
         (epoch_us(ts) - (epoch_us(ts) % {p})) // {p} AS period,
         count(*) AS c
  FROM events WHERE event_type IN ('{type_a}', '{type_b}')
  GROUP BY 1, 2
),
bounds AS (SELECT min(period) AS lo, max(period) AS hi FROM counts),
grid AS (
  SELECT unnest(generate_series((SELECT lo FROM bounds),
                                (SELECT hi FROM bounds))) AS period
),
a AS (
  SELECT g.period, coalesce(c.c, 0) AS a FROM grid g
  LEFT JOIN counts c ON c.period = g.period AND c.t = '{type_a}'
),
b AS (
  SELECT g.period, coalesce(c.c, 0) AS b FROM grid g
  LEFT JOIN counts c ON c.period = g.period AND c.t = '{type_b}'
),
lagged AS (
  SELECT l.lag, a.a, b.b
  FROM a, (SELECT unnest(generate_series(-{L}, {L})) AS lag) l
  JOIN b ON b.period = a.period + l.lag
),
agg AS (
  SELECT lag, count(*) AS n_periods,
         sum(a) AS sa, sum(b) AS sb, sum(a * b) AS sab,
         sum(a * a) AS saa, sum(b * b) AS sbb
  FROM lagged GROUP BY 1
)
SELECT CAST(lag AS BIGINT) AS lag,
       CAST(n_periods AS BIGINT) AS n_periods,
       round((CAST(n_periods AS DOUBLE) * sab - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
             / nullif(sqrt((CAST(n_periods AS DOUBLE) * saa
                            - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                           * (CAST(n_periods AS DOUBLE) * sbb
                              - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 0.0), 6)
         AS corr
FROM agg ORDER BY lag
"""


def markov_absorption_sql(absorb_type: str = "purchase", steps: int = 50) -> str:
    """Absorption twin: same chain (consecutive pairs + __END__ terminal,
    absorb-state outgoing rows pruned), same FIXED iteration count as a
    recursive CTE — absorbing states ride the working table as
    self-loop rows with constant p, so every update is one pure
    matrix-vector join."""
    k = int(steps)
    return f"""
WITH RECURSIVE nxt AS (
  SELECT event_type AS from_type,
         coalesce(lead(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ), '__END__') AS to_type
  FROM events
),
trans AS (
  SELECT from_type, to_type, count(*) AS n
  FROM nxt WHERE from_type <> '{absorb_type}' GROUP BY 1, 2
),
tot AS (SELECT from_type, sum(n) AS tot FROM trans GROUP BY 1),
probs AS (
  -- CAST to DOUBLE: bare 1.0 literals are DECIMAL in DuckDB and the
  -- decimal scale would quantize every iterated probability
  SELECT t.from_type, t.to_type, CAST(t.n AS DOUBLE) / o.tot AS pr
  FROM trans t JOIN tot o USING (from_type)
  UNION ALL SELECT '{absorb_type}', '{absorb_type}', CAST(1.0 AS DOUBLE)
  UNION ALL SELECT '__END__', '__END__', CAST(1.0 AS DOUBLE)
),
step AS (
  SELECT 0 AS k, from_type AS state,
         CAST(CASE WHEN from_type = '{absorb_type}' THEN 1.0 ELSE 0.0 END
              AS DOUBLE) AS p
  FROM (SELECT DISTINCT from_type FROM probs)
  UNION ALL
  SELECT max(s.k) + 1, p2.from_type, sum(p2.pr * s.p)
  FROM probs p2 JOIN step s ON s.state = p2.to_type
  WHERE s.k < {k}
  GROUP BY p2.from_type
)
SELECT st.state,
       CAST(coalesce(o.tot, 0) AS BIGINT) AS n_out,
       round(st.p, 6) AS p_absorb
FROM step st LEFT JOIN tot o ON o.from_type = st.state
WHERE st.k = {k} AND st.state <> '__END__'
"""


def markov_removal_effects_sql(
    absorb_type: str = "purchase", steps: int = 50
) -> str:
    """Removal-effect twin: one recursive CTE iterates EVERY variant
    (baseline + each removed channel) simultaneously over (variant,
    state) pairs; per-edge rows are kept un-reaggregated after the
    remap so the iteration sums the same terms as the engine."""
    k = int(steps)
    return f"""
WITH RECURSIVE nxt AS (
  SELECT event_type AS from_type,
         coalesce(lead(event_type) OVER w, '__END__') AS to_type,
         row_number() OVER w AS rn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
trans AS (
  SELECT from_type, to_type, count(*) AS n
  FROM nxt WHERE from_type <> '{absorb_type}' GROUP BY 1, 2
),
tot AS (SELECT from_type, sum(n) AS tot FROM trans GROUP BY 1),
starts AS (
  SELECT from_type, count(*) AS n FROM nxt WHERE rn = 1 GROUP BY 1
),
probs0 AS (
  SELECT t.from_type, t.to_type, CAST(t.n AS DOUBLE) / o.tot AS pr
  FROM trans t JOIN tot o USING (from_type)
),
channels AS (
  SELECT DISTINCT from_type AS ch FROM trans
),
variants AS (
  SELECT '__BASE__' AS ch, from_type, to_type, pr FROM probs0
  UNION ALL
  SELECT c.ch, p.from_type,
         CASE WHEN p.to_type = c.ch THEN '__END__' ELSE p.to_type END,
         p.pr
  FROM probs0 p, channels c WHERE p.from_type <> c.ch
),
loops AS (
  SELECT ch, '{absorb_type}' AS from_type, '{absorb_type}' AS to_type,
         CAST(1.0 AS DOUBLE) AS pr
  FROM (SELECT '__BASE__' AS ch UNION ALL SELECT ch FROM channels)
  UNION ALL
  SELECT ch, '__END__', '__END__', CAST(1.0 AS DOUBLE)
  FROM (SELECT '__BASE__' AS ch UNION ALL SELECT ch FROM channels)
),
all_edges AS (SELECT * FROM variants UNION ALL SELECT * FROM loops),
step AS (
  SELECT 0 AS k, ch, from_type AS state,
         CAST(CASE WHEN from_type = '{absorb_type}' THEN 1.0 ELSE 0.0 END
              AS DOUBLE) AS p
  FROM (SELECT DISTINCT ch, from_type FROM all_edges)
  UNION ALL
  SELECT max(s.k) + 1, e.ch, e.from_type, sum(e.pr * s.p)
  FROM all_edges e JOIN step s ON s.ch = e.ch AND s.state = e.to_type
  WHERE s.k < {k}
  GROUP BY e.ch, e.from_type
),
final AS (SELECT ch, state, p FROM step WHERE k = {k}),
pi AS (
  SELECT from_type, CAST(n AS DOUBLE) / (SELECT sum(n) FROM starts) AS pi
  FROM starts
),
conv AS (
  SELECT v.ch,
         sum(pi.pi * CASE WHEN pi.from_type = '{absorb_type}' THEN 1.0
                          WHEN pi.from_type = v.ch THEN 0.0
                          ELSE coalesce(f.p, 0.0) END) AS conv
  FROM (SELECT '__BASE__' AS ch UNION ALL SELECT ch FROM channels) v
  CROSS JOIN pi
  LEFT JOIN final f ON f.ch = v.ch AND f.state = pi.from_type
  GROUP BY v.ch
)
SELECT c.ch AS channel,
       round(b.conv, 6) AS p_base,
       round(c.conv, 6) AS p_removed,
       round(1.0 - c.conv / nullif(b.conv, 0.0), 6) AS removal_effect
FROM conv c, (SELECT conv FROM conv WHERE ch = '__BASE__') b
WHERE c.ch <> '__BASE__'
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


def holt_forecast_sql(
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 3,
    period_us: int = 86_400_000_000,
) -> str:
    """Holt double-exponential-smoothing twin: one recursive CTE steps
    EVERY key's series simultaneously, executing the identical IEEE
    double chain as the engine's per-key loop (same operand order;
    discount factors written as (1.0 - α) arithmetic, not literals)."""
    # bare decimal literals are DECIMAL in DuckDB and would quantize the
    # iterated state (the Markov-twin trap) — force DOUBLE
    a = f"CAST({float(alpha)!r} AS DOUBLE)"
    bt = f"CAST({float(beta)!r} AS DOUBLE)"
    h, p = int(horizon), int(period_us)
    return f"""
WITH RECURSIVE series AS MATERIALIZED (
  SELECT user_id AS key, epoch_us(ts) // {p} AS period,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
base AS MATERIALIZED (
  SELECT key, y,
         row_number() OVER (PARTITION BY key ORDER BY period) AS seq,
         count(*) OVER (PARTITION BY key) AS n
  FROM series
  QUALIFY count(*) OVER (PARTITION BY key) >= 2
),
rec AS (
  SELECT b1.key, 1 AS seq, b1.n,
         b1.y AS l, b2.y - b1.y AS b, CAST(0.0 AS DOUBLE) AS se
  FROM base b1 JOIN base b2 ON b2.key = b1.key AND b2.seq = 2
  WHERE b1.seq = 1
  UNION ALL
  SELECT r.key, r.seq + 1, r.n,
         {a} * p.y + (1.0 - {a}) * (r.l + r.b) AS l,
         {bt} * (({a} * p.y + (1.0 - {a}) * (r.l + r.b)) - r.l)
           + (1.0 - {bt}) * r.b AS b,
         r.se + (p.y - (r.l + r.b)) * (p.y - (r.l + r.b)) AS se
  FROM rec r JOIN base p ON p.key = r.key AND p.seq = r.seq + 1
)
SELECT key, CAST(n AS INT) AS n_periods,
       round(l, 6) AS level, round(b, 6) AS trend,
       round(sqrt(se / (n - 1)), 6) AS rmse,
       round(l + {h} * b, 6) AS forecast
FROM rec WHERE seq = n
"""


def decay_weighted_stats_sql(half_life_us: int = 7 * 86_400_000_000) -> str:
    """Decay-stats twin: same fixed-anchor closed form, λ embedded as the
    identical Python-computed double so exp() sees the same argument."""
    import math as _math

    lam = repr(_math.log(2.0) / float(half_life_us))
    return f"""
WITH t AS (SELECT max(epoch_us(ts)) AS T FROM events),
w AS (
  SELECT user_id AS key,
         exp(-CAST({lam} AS DOUBLE) * (t.T - epoch_us(ts))) AS w,
         CAST(value AS DOUBLE) AS v
  FROM events, t
)
SELECT key,
       count(*) AS n,
       round(sum(w), 6) AS weight_sum,
       round(sum(CASE WHEN v IS NOT NULL THEN w * v END), 6) AS decayed_value,
       round(sum(CASE WHEN v IS NOT NULL THEN w * v END)
             / nullif(sum(CASE WHEN v IS NOT NULL THEN w END), 0.0), 6) AS ewm_mean
FROM w GROUP BY key
"""


def join_paths_sql(
    src_table: int = 6,
    dst_table: int = 0,
    max_hops: int = 4,
    min_containment: float = 0.999,
) -> str:
    """Join-path twin: the edge list is the inclusion-deps query reused
    verbatim, the traversal a recursive CTE with the SAME cycle rule
    (visited-table list) and the same hop cap and path rendering."""
    deps = inclusion_deps_sql()
    return f"""
WITH RECURSIVE edges AS MATERIALIZED (
  SELECT table_a, col_a, table_b, col_b
  FROM ({deps}) __d
  WHERE containment >= {min_containment}
),
walk AS (
  SELECT table_b AS e,
         concat(CAST(table_a AS VARCHAR), '.', CAST(col_a AS VARCHAR), '>',
                CAST(table_b AS VARCHAR), '.', CAST(col_b AS VARCHAR)) AS path,
         [table_a, table_b] AS seen,
         1 AS hops
  FROM edges WHERE table_a = {src_table}
  UNION ALL
  SELECT g.table_b,
         concat(w.path, '|', CAST(g.table_a AS VARCHAR), '.',
                CAST(g.col_a AS VARCHAR), '>',
                CAST(g.table_b AS VARCHAR), '.', CAST(g.col_b AS VARCHAR)),
         list_append(w.seen, g.table_b),
         w.hops + 1
  FROM walk w JOIN edges g ON g.table_a = w.e
  WHERE w.hops < {max_hops} AND w.e <> {dst_table}
        AND NOT list_contains(w.seen, g.table_b)
)
SELECT CAST(hops AS INT) AS hops, path FROM walk WHERE e = {dst_table}
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


def readability_scores_sql() -> str:
    """Readability twin: same word/sentence splits, same vowel-run
    syllable heuristic, same closed forms (coefficients written
    identically so the doubles match)."""
    return """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS words,
         len(list_filter(regexp_split_to_array(text, '[.!?]+'),
                         x -> trim(x) <> '')) AS raw_sent,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS vruns
  FROM documents
),
c AS (
  SELECT doc_id,
         CAST(len(words) AS BIGINT) AS n_words,
         CAST(greatest(raw_sent, 1) AS BIGINT) AS n_sentences,
         CAST(vruns + len(list_filter(words,
              w -> NOT regexp_matches(w, '[aeiouy]'))) AS BIGINT) AS n_syllables
  FROM w
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       round(206.835 - 1.015 * (n_words * 1.0 / n_sentences)
             - 84.6 * (n_syllables * 1.0 / nullif(n_words * 1.0, 0.0)), 4) AS flesch,
       round(0.39 * (n_words * 1.0 / n_sentences)
             + 11.8 * (n_syllables * 1.0 / nullif(n_words * 1.0, 0.0))
             - 15.59, 4) AS fk_grade
FROM c
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


def theil_sen_trend_sql(period_us: int = 86_400_000_000) -> str:
    """Theil–Sen twin: same per-period count series, same pairwise slope
    set, same portable median interpolation (quantile literal cast to
    DOUBLE), no rounding anywhere."""
    p = int(period_us)

    def med(list_col: str, n_col: str) -> str:
        q = "CAST(0.5 AS DOUBLE)"
        return f"""(CAST({list_col}[CAST(floor({q} * ({n_col} - 1)) AS INT) + 1] AS DOUBLE)
        + ({q} * ({n_col} - 1) - floor({q} * ({n_col} - 1)))
          * (CAST({list_col}[least(CAST(floor({q} * ({n_col} - 1)) AS INT) + 2,
                                   CAST({n_col} AS INT))] AS DOUBLE)
             - CAST({list_col}[CAST(floor({q} * ({n_col} - 1)) AS INT) + 1] AS DOUBLE)))"""

    return f"""
WITH series AS MATERIALIZED (
  SELECT user_id AS key, epoch_us(ts) // {p} AS p,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
slopes AS (
  SELECT a.key, (b.y - a.y) / CAST(b.p - a.p AS DOUBLE) AS s
  FROM series a JOIN series b ON b.key = a.key AND b.p > a.p
),
med AS MATERIALIZED (
  SELECT key, CAST(count(*) AS BIGINT) AS n_pairs,
         list_sort(list(s)) AS sl
  FROM slopes GROUP BY 1
),
sl AS MATERIALIZED (
  SELECT key, n_pairs, {med("sl", "n_pairs")} AS slope FROM med
),
resid AS (
  SELECT s.key, m.n_pairs, m.slope,
         CAST(count(*) AS BIGINT) AS n_periods,
         list_sort(list(s.y - m.slope * CAST(s.p AS DOUBLE))) AS rl
  FROM series s JOIN sl m ON m.key = s.key
  GROUP BY 1, 2, 3
)
SELECT key, CAST(n_periods AS INT) AS n_periods, n_pairs, slope,
       {med("rl", "n_periods")} AS intercept
FROM resid
"""


def mann_kendall_trend_sql(period_us: int = 86_400_000_000) -> str:
    """Mann–Kendall twin: same integer S / tie census / variance closed
    form, same continuity-corrected z, no rounding."""
    p = int(period_us)
    return f"""
WITH series AS MATERIALIZED (
  SELECT user_id AS key, epoch_us(ts) // {p} AS p, count(*) AS y
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT a.key,
         CAST(sum(CASE WHEN b.y > a.y THEN 1
                       WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
  FROM series a JOIN series b ON b.key = a.key AND b.p > a.p
  GROUP BY 1
),
n AS (SELECT key, CAST(count(*) AS BIGINT) AS n FROM series GROUP BY 1),
ties AS (
  SELECT key, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT key, y, count(*) AS t FROM series GROUP BY 1, 2)
  GROUP BY 1
),
j AS (
  SELECT n.key, n.n, s.s_stat, ties.tie_term,
         CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term AS DOUBLE)
           / 18.0 AS var_s
  FROM n JOIN s ON s.key = n.key JOIN ties ON ties.key = n.key
  WHERE n.n >= 2
)
SELECT key, CAST(n AS INT) AS n_periods, s_stat, var_s,
       CASE WHEN s_stat = 0 THEN 0.0
            WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(nullif(var_s, 0.0))
            ELSE CAST(s_stat + 1 AS DOUBLE) / sqrt(nullif(var_s, 0.0)) END AS z
FROM j
"""


def mann_whitney_u_sql() -> str:
    """Mann–Whitney twin on the md5-variant split of event values: same
    mid-rank construction ((min+max)/2 over each value's rank block — tie
    ordering irrelevant), same U/μ/σ/z closed forms with identical
    operand order, no rounding."""
    return """
WITH base AS (
  SELECT CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 2 AS g,
         CAST(value AS DOUBLE) AS v
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
),
rk AS (
  SELECT g, v, row_number() OVER (ORDER BY v) AS rk FROM base
),
pv AS (
  SELECT v, min(rk) AS mn, max(rk) AS mx,
         CAST(count(*) AS BIGINT) AS t, CAST(sum(g) AS BIGINT) AS t1
  FROM rk GROUP BY v
),
s AS (
  SELECT CAST(sum(t) AS BIGINT) AS n,
         CAST(sum(t1) AS BIGINT) AS n1,
         sum(CAST(t1 AS DOUBLE) * (CAST(mn + mx AS DOUBLE) / 2.0)) AS r1,
         CAST(sum(t * t * t - t) AS BIGINT) AS tie
  FROM pv
)
SELECT (n - n1) AS n_0,
       n1 AS n_1,
       r1 - CAST(n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u_1,
       CAST((n - n1) * n1 AS DOUBLE) / 2.0 AS mu,
       sqrt(CAST((n - n1) * n1 AS DOUBLE) / 12.0
            * (CAST(n + 1 AS DOUBLE)
               - CAST(tie AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE))) AS sigma,
       CASE WHEN r1 - CAST(n1 * (n1 + 1) AS DOUBLE) / 2.0
                 - CAST((n - n1) * n1 AS DOUBLE) / 2.0 = 0 THEN 0.0
            WHEN r1 - CAST(n1 * (n1 + 1) AS DOUBLE) / 2.0
                 - CAST((n - n1) * n1 AS DOUBLE) / 2.0 > 0
            THEN (r1 - CAST(n1 * (n1 + 1) AS DOUBLE) / 2.0
                  - CAST((n - n1) * n1 AS DOUBLE) / 2.0 - 0.5)
                 / nullif(sqrt(CAST((n - n1) * n1 AS DOUBLE) / 12.0
                      * (CAST(n + 1 AS DOUBLE)
                         - CAST(tie AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE))), 0.0)
            ELSE (r1 - CAST(n1 * (n1 + 1) AS DOUBLE) / 2.0
                  - CAST((n - n1) * n1 AS DOUBLE) / 2.0 + 0.5)
                 / nullif(sqrt(CAST((n - n1) * n1 AS DOUBLE) / 12.0
                      * (CAST(n + 1 AS DOUBLE)
                         - CAST(tie AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE))), 0.0)
       END AS z
FROM s
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


def snapshot_diff_sql(
    rm_mod: int = 13,
    rm_res: int = 5,
    add_mod: int = 11,
    add_res: int = 3,
    chg_mod: int = 7,
    chg_res: int = 2,
) -> str:
    """Twin of :func:`..operators.text_analysis.snapshot_diff` over the
    deterministically derived snapshot pair: old drops doc_id %
    add_mod == add_res (-> added) and upper-cases doc_id % chg_mod ==
    chg_res (-> changed); new drops doc_id % rm_mod == rm_res (->
    removed)."""
    return f"""
WITH old_snap AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % {chg_mod} = {chg_res} THEN upper(text)
                  ELSE text END) AS old_hash
  FROM documents WHERE doc_id % {add_mod} <> {add_res}
),
new_snap AS (
  SELECT doc_id, md5(text) AS new_hash
  FROM documents WHERE doc_id % {rm_mod} <> {rm_res}
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.old_hash IS NOT DISTINCT FROM n.new_hash THEN 'unchanged'
            ELSE 'changed' END AS status,
       o.old_hash, n.new_hash
FROM old_snap o FULL OUTER JOIN new_snap n ON o.doc_id = n.doc_id
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


def snapshot_diff_census_sql(**kw) -> str:
    """Rollup twin: one row per diff status over the same snapshot pair."""
    return (
        "SELECT status, count(*) AS n_docs FROM ("
        + snapshot_diff_sql(**kw)
        + ") GROUP BY status"
    )


def text_gopher_filters_sql(
    min_words: int = 30,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stopwords: int = 1,
) -> str:
    """Twin of :func:`..operators.text_analysis.gopher_rule_flags` over
    the planted bullet/ellipsis/symbol/numeral fixture (doc_id % 5
    variants, shared constants)."""
    from datalake_indexes_spark.operators.text_analysis import (
        GOPHER_PLANT_BULLETS,
        GOPHER_PLANT_ELLIPSIS,
        GOPHER_PLANT_NUMERIC,
        GOPHER_PLANT_SYMBOLS,
        GOPHER_STOPWORDS,
    )

    def nl_append(lines: tuple[str, ...]) -> str:
        return "text || " + " || ".join(
            f"chr(10) || '{ln}'" for ln in lines
        )

    stop_list = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    return f"""
WITH planted AS (
  SELECT doc_id,
         CASE CAST(doc_id % 5 AS INTEGER)
           WHEN 0 THEN {nl_append(GOPHER_PLANT_BULLETS)}
           WHEN 1 THEN {nl_append(GOPHER_PLANT_ELLIPSIS)}
           WHEN 2 THEN text || ' {GOPHER_PLANT_SYMBOLS}'
           WHEN 3 THEN text || ' {GOPHER_PLANT_NUMERIC}'
           ELSE text END AS text
  FROM documents
),
m AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), w -> w <> '') AS ws,
         list_filter(string_split(text, chr(10)), l -> l <> '') AS ls
  FROM planted
),
r AS (
  SELECT doc_id,
         len(ws) AS n_words,
         greatest(len(ws), 1) AS nw1,
         round(coalesce(list_sum(list_transform(ws, w -> len(w))), 0) * 1.0
               / greatest(len(ws), 1), 4) AS mean_word_len,
         round(((len(text) - len(replace(text, '#', '')))
                + (len(text) - len(replace(text, '...', ''))) / 3.0)
               / greatest(len(ws), 1), 4) AS symbol_ratio,
         round(len(list_filter(ls, l -> starts_with(l, '-')
                                     OR starts_with(l, '*')
                                     OR starts_with(l, '•'))) * 1.0
               / greatest(len(ls), 1), 4) AS bullet_line_ratio,
         round(len(list_filter(ls, l -> ends_with(l, '...'))) * 1.0
               / greatest(len(ls), 1), 4) AS ellipsis_line_ratio,
         round(len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]'))) * 1.0
               / greatest(len(ws), 1), 4) AS alpha_word_ratio,
         len(list_filter([{stop_list}], s -> list_contains(ws, s)))
           AS n_stopwords
  FROM m
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       mean_word_len, symbol_ratio, bullet_line_ratio,
       ellipsis_line_ratio, alpha_word_ratio,
       CAST(n_stopwords AS BIGINT) AS n_stopwords,
       (n_words >= {min_words} AND n_words <= {max_words}
        AND mean_word_len >= {min_mean_word_len}
        AND mean_word_len <= {max_mean_word_len}
        AND symbol_ratio <= {max_symbol_ratio}
        AND bullet_line_ratio <= {max_bullet_ratio}
        AND ellipsis_line_ratio <= {max_ellipsis_ratio}
        AND alpha_word_ratio >= {min_alpha_ratio}
        AND n_stopwords >= {min_stopwords}) AS gopher_keep
FROM r
"""


def text_dsir_weights_sql(n_buckets: int = 256, alpha: float = 0.5) -> str:
    """Twin of :func:`..operators.text_analysis.dsir_importance_weights`
    with target = (lang = 'en') — same md5 bucket rule, same Laplace
    smoothing, same per-gram mean."""
    ab = alpha * n_buckets
    return f"""
WITH ws AS (
  SELECT doc_id, (lang = 'en') AS is_target,
         list_filter(string_split(text, ' '), w -> w <> '') AS w
  FROM documents
),
uni AS (
  SELECT doc_id, is_target, unnest(w) AS g FROM ws
),
pos AS (
  SELECT doc_id, CAST(generate_subscripts(w, 1) AS BIGINT) AS p,
         unnest(w) AS g
  FROM ws
),
big AS (
  SELECT a.doc_id, w2.is_target, a.g || ' ' || b.g AS g
  FROM pos a
  JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
  JOIN (SELECT doc_id, is_target FROM ws) w2 ON w2.doc_id = a.doc_id
),
gb AS (
  SELECT doc_id, is_target,
         ('0x' || substring(md5(g), 1, 8))::BIGINT % {n_buckets} AS b
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)
),
dist AS (
  SELECT b, count(*) AS raw_c, count(*) FILTER (is_target) AS tgt_c
  FROM gb GROUP BY b
),
tot AS (SELECT sum(raw_c) AS raw_t, sum(tgt_c) AS tgt_t FROM dist),
lr AS (
  SELECT b,
         ln((tgt_c + {alpha}) / (tgt_t + {ab}))
           - ln((raw_c + {alpha}) / (raw_t + {ab})) AS l
  FROM dist, tot
)
SELECT doc_id, is_target, count(*) AS n_grams,
       round(avg(l), 4) + 0.0 AS avg_logratio
FROM gb JOIN lr USING (b)
GROUP BY doc_id, is_target
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


def _harmonic_pack_cte(token_budget: int, salt_buckets: int) -> str:
    """Shared per-doc harmonic-pack CTE chain (twin of
    :func:`..operators.text_analysis.harmonic_pack`): same size-class
    rule, same (md5-salt, doc_id) within-class order, same two-level
    offset composition."""
    return f"""t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
              AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         greatest(CAST(floor({token_budget}.0 / greatest(n_tokens, 1))
                       AS BIGINT), 1) AS size_class,
         n_tokens > {token_budget} AS oversize,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % {salt_buckets} AS salt
  FROM t
),
l AS (
  SELECT *, row_number() OVER (
           PARTITION BY size_class, salt ORDER BY doc_id) AS lrn
  FROM c
),
o AS (SELECT size_class, salt, count(*) AS cnt FROM c GROUP BY 1, 2),
o2 AS (
  SELECT size_class, salt,
         coalesce(sum(cnt) OVER (
           PARTITION BY size_class ORDER BY salt
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM o
),
packed AS (
  SELECT l.doc_id, l.n_tokens, l.size_class, l.oversize,
         CAST(floor((o2.off + l.lrn - 1) * 1.0 / l.size_class)
              AS BIGINT) AS bin_in_class,
         CAST((o2.off + l.lrn - 1) % l.size_class AS BIGINT) AS bin_slot
  FROM l JOIN o2 USING (size_class, salt)
)"""


def corpus_pack_harmonic_sql(
    token_budget: int = 64, salt_buckets: int = 32
) -> str:
    """Per-document harmonic pack assignment."""
    return (
        "WITH "
        + _harmonic_pack_cte(token_budget, salt_buckets)
        + "\nSELECT * FROM packed"
    )


def corpus_pack_fill_sql(token_budget: int = 64, salt_buckets: int = 32) -> str:
    """Twin of :func:`..operators.text_analysis.harmonic_pack_fill` —
    the per-class waste census over the shared packed CTE."""
    return (
        "WITH "
        + _harmonic_pack_cte(token_budget, salt_buckets)
        + f"""
SELECT size_class, n_docs, n_oversize, n_bins, total_tokens,
       CAST(greatest(n_bins * {token_budget} - total_tokens, 0) AS BIGINT)
         AS padding_tokens,
       round(total_tokens * 1.0 / (n_bins * {token_budget}), 4) AS fill_frac
FROM (
  SELECT size_class, count(*) AS n_docs,
         count(*) FILTER (oversize) AS n_oversize,
         CAST(max(bin_in_class) + 1 AS BIGINT) AS n_bins,
         CAST(sum(n_tokens) AS BIGINT) AS total_tokens
  FROM packed GROUP BY size_class
)"""
    )


def corpus_select_dsir_sql(
    fraction: float = 0.25, n_buckets: int = 256, alpha: float = 0.5
) -> str:
    """Twin of :func:`..operators.text_analysis.dsir_select` — rank over
    the shared DSIR weights query, threshold at ceil(fraction * n)."""
    inner = text_dsir_weights_sql(n_buckets=n_buckets, alpha=alpha)
    return f"""
WITH scores AS ({inner}),
r AS (
  SELECT doc_id, avg_logratio,
         row_number() OVER (ORDER BY avg_logratio DESC, doc_id) AS sel_rank
  FROM scores
),
n AS (SELECT count(*) AS n FROM scores)
SELECT doc_id, avg_logratio, CAST(sel_rank AS BIGINT) AS sel_rank
FROM r, n WHERE sel_rank <= ceil(n * {fraction})
"""


def multimodal_audio_features_sql() -> str:
    """Twin of ``audio_waveform_features(attach_real_wav(documents))`` —
    samples recomputed from consecutive byte pairs of the planted text
    (the :func:`multimodal_sample_stats_sql` trick); rms and the
    mean-crossing rate are single IEEE operations over exact integer
    aggregates, so no rounding is needed."""
    return """
WITH s AS (
  SELECT doc_id,
         regexp_replace(coalesce(text, ''), '[^\\x20-\\x7E]', ' ', 'g') AS t
  FROM documents
),
p AS (SELECT doc_id, t, CAST(length(t) // 2 AS INT) AS ns FROM s),
i AS (SELECT doc_id, t, unnest(range(1, ns + 1)) AS k FROM p),
v AS (
  SELECT doc_id, k,
         ord(t[CAST(2 * k - 1 AS INT)]) + 256 * ord(t[CAST(2 * k AS INT)]) AS a
  FROM i
),
m AS (
  SELECT doc_id,
         count(*) AS n,
         CAST(sum(a) AS DOUBLE) / count(*) AS mean,
         CAST(sum(a * a) AS DOUBLE) AS sq,
         CAST(max(a) - min(a) AS INT) AS p2p
  FROM v GROUP BY doc_id
),
x AS (
  SELECT v.doc_id, (v.a < m.mean) AS lo,
         lead(v.a < m.mean) OVER (PARTITION BY v.doc_id ORDER BY v.k) AS nlo
  FROM v JOIN m USING (doc_id)
),
c AS (
  SELECT doc_id, CAST(count(*) FILTER (lo <> nlo) AS INT) AS crossings
  FROM x WHERE nlo IS NOT NULL GROUP BY doc_id
)
SELECT p.doc_id,
       CAST(p.ns AS INT) AS n_samples,
       CASE WHEN p.ns > 0 THEN sqrt(m.sq / m.n) END AS rms,
       CASE WHEN p.ns > 1
            THEN coalesce(c.crossings, 0) * 1.0 / (p.ns - 1) END
         AS mean_crossing_rate,
       CASE WHEN p.ns > 0 THEN m.p2p END AS peak_to_peak
FROM p LEFT JOIN m USING (doc_id) LEFT JOIN c USING (doc_id)
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


# --- incremental / prefix-join dedup twins ---------------------------------

_INCR_SPLIT_CTES = """hist AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0
),
inc AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM hist WHERE doc_id % 7 = 1
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
),
hh AS (SELECT md5(text) AS content_hash FROM hist),
firsts AS (
  SELECT md5(text) AS content_hash, min(doc_id) AS doc_id,
         count(*) AS n_copies
  FROM inc GROUP BY 1
)"""


def dedup_incremental_sql() -> str:
    """Twin of :func:`..operators.dedup.incremental_new_docs` over the
    registry's planted history/increment split (history = doc_id%5<>0;
    increment = the %5==0 docs plus re-crawled history copies (%7==1,
    id+1e6) and within-increment copies (%10==0, id+2e6)).  The Bloom
    prefilter is exactness-transparent (verified positives, sound
    negatives), so the twin is the plain first-per-hash anti-join — the
    whole point of grading this key strictly."""
    return f"""
WITH {_INCR_SPLIT_CTES}
SELECT f.doc_id, f.content_hash, CAST(f.n_copies AS BIGINT) AS n_copies
FROM firsts f
LEFT JOIN (SELECT DISTINCT content_hash FROM hh) h USING (content_hash)
WHERE h.content_hash IS NULL
"""


def dedup_incremental_report_sql(k_hashes: int = 3, hex_len: int = 3) -> str:
    """Twin of :func:`..operators.dedup.incremental_dedup_report`: the
    position-set Bloom is replayed verbatim — k probe positions per hash
    are the first ``hex_len`` hex chars of md5('j:' || hash) (the same
    probe family as functions/hashes.py BloomFilter), membership is
    string-set membership, so the false-positive count is deterministic
    and engine-identical."""
    return f"""
WITH {_INCR_SPLIT_CTES},
hpos AS (
  SELECT DISTINCT substr(md5(CAST(j AS VARCHAR) || ':' || content_hash),
                         1, {hex_len}) AS p
  FROM hh, UNNEST(range({k_hashes})) AS t(j)
),
nprobe AS (
  SELECT f.content_hash,
         substr(md5(CAST(j AS VARCHAR) || ':' || f.content_hash),
                1, {hex_len}) AS p
  FROM firsts f, UNNEST(range({k_hashes})) AS t(j)
),
bf_new AS (
  SELECT DISTINCT content_hash FROM nprobe
  WHERE p NOT IN (SELECT p FROM hpos)
),
truly_dup AS (
  SELECT f.content_hash FROM firsts f
  JOIN (SELECT DISTINCT content_hash FROM hh) h USING (content_hash)
),
c AS (
  SELECT (SELECT count(*) FROM hh) AS n_history,
         (SELECT sum(n_copies) FROM firsts) AS n_increment,
         (SELECT count(*) FROM firsts) AS n_increment_distinct,
         (SELECT count(*) FROM bf_new) AS n_bf_new,
         (SELECT count(*) FROM truly_dup) AS n_history_dups
)
SELECT CAST(n_history AS BIGINT) AS n_history,
       CAST(n_increment AS BIGINT) AS n_increment,
       CAST(n_increment_distinct AS BIGINT) AS n_increment_distinct,
       CAST(n_increment - n_increment_distinct AS BIGINT) AS n_within_dups,
       CAST(n_bf_new AS BIGINT) AS n_bf_new,
       CAST(n_increment_distinct - n_bf_new AS BIGINT) AS n_bf_candidates,
       CAST(n_history_dups AS BIGINT) AS n_history_dups,
       CAST(n_increment_distinct - n_bf_new - n_history_dups AS BIGINT)
         AS n_bf_false_positives,
       CAST(n_increment_distinct - n_history_dups AS BIGINT) AS n_new,
       round(CAST(n_increment_distinct - n_bf_new - n_history_dups AS DOUBLE)
             / nullif(n_increment_distinct - n_history_dups, 0), 6) AS fp_rate
FROM c
"""


def dedup_threshold_sweep_sql(
    thresholds: tuple[float, ...] = (0.5, 0.6, 0.7, 0.8, 0.9), n: int = 3
) -> str:
    """Twin of :func:`..operators.dedup.pair_threshold_sweep` over the
    planted partial-overlap corpus (every %4==0 doc gains a truncated
    copy at 50/70/90% word length, cycling by (doc_id div 4) % 3 — so the
    curve actually bends).  Pair set = exact all-pairs jaccard at
    min(thresholds) with the UNROUNDED filter; census per threshold on
    the ROUNDED jaccard — identical boundary decisions in both engines."""
    ts = sorted(float(t) for t in thresholds)
    lo = ts[0]
    gram = " || ' ' || ".join(f"w[CAST(i+{j+1} AS INT)]" for j in range(n))
    vals = ", ".join(f"(CAST({t} AS DOUBLE))" for t in ts)
    return f"""
WITH docs_p AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id,
         array_to_string(
           list_slice(string_split(text, ' '), 1,
             CAST(((5 + 2 * ((doc_id // 4) % 3))
                   * len(string_split(text, ' '))) // 10 AS INT)),
           ' ') AS text
  FROM documents WHERE doc_id % 4 = 0
),
__words AS (SELECT doc_id, string_split(text, ' ') AS w FROM docs_p),
sh AS (
  SELECT DISTINCT doc_id, {gram} AS shingle
  FROM __words, UNNEST(range(greatest(len(w)-{n - 1}, 0))) AS t(i)
),
cand AS (
  SELECT DISTINCT s1.doc_id AS doc_id_1, s2.doc_id AS doc_id_2
  FROM sh s1 JOIN sh s2
    ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
),
{_jaccard_ctes()},
pairs AS (
{_jaccard_select(lo)}
),
ts(threshold) AS (VALUES {vals})
SELECT t.threshold,
       (SELECT CAST(count(*) AS BIGINT) FROM pairs p
        WHERE p.jaccard >= t.threshold) AS n_pairs,
       (SELECT CAST(count(DISTINCT u.d) AS BIGINT) FROM (
          SELECT doc_id_1 AS d, jaccard FROM pairs
          UNION ALL
          SELECT doc_id_2 AS d, jaccard FROM pairs) u
        WHERE u.jaccard >= t.threshold) AS n_docs
FROM ts t
"""


def dedup_incremental_neardup_sql(threshold: float = 0.7, n: int = 3) -> str:
    """Twin of :func:`..operators.dedup.prefix_jaccard_join_ab` over the
    planted history/increment split: plain all-pairs cross-corpus n-gram
    Jaccard (no prefix filter — its completeness is what the strict hash
    grades)."""
    gram = " || ' ' || ".join(f"w[CAST(i+{j+1} AS INT)]" for j in range(n))
    return f"""
WITH {_INCR_SPLIT_CTES},
wa AS (SELECT doc_id, string_split(text, ' ') AS w FROM inc),
sa AS (
  SELECT DISTINCT doc_id, {gram} AS shingle
  FROM wa, UNNEST(range(greatest(len(w)-{n - 1}, 0))) AS t(i)
),
wb AS (SELECT doc_id, string_split(text, ' ') AS w FROM hist),
sb AS (
  SELECT DISTINCT doc_id, {gram} AS shingle
  FROM wb, UNNEST(range(greatest(len(w)-{n - 1}, 0))) AS t(i)
),
cand AS (
  SELECT DISTINCT sa.doc_id AS doc_id_a, sb.doc_id AS doc_id_b
  FROM sa JOIN sb ON sa.shingle = sb.shingle
),
na AS (SELECT doc_id, count(*) AS n FROM sa GROUP BY doc_id),
nb AS (SELECT doc_id, count(*) AS n FROM sb GROUP BY doc_id),
i AS (
  SELECT c.doc_id_a, c.doc_id_b, count(*) AS o
  FROM cand c
  JOIN sa ON sa.doc_id = c.doc_id_a
  JOIN sb ON sb.doc_id = c.doc_id_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2
)
SELECT i.doc_id_a, i.doc_id_b,
       round(i.o * 1.0 / (na.n + nb.n - i.o), 4) AS jaccard
FROM i
JOIN na ON na.doc_id = i.doc_id_a
JOIN nb ON nb.doc_id = i.doc_id_b
WHERE i.o * 1.0 / (na.n + nb.n - i.o) >= {threshold}
"""


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


def corpus_cluster_split_sql(
    train: float = 0.8,
    val: float = 0.1,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
) -> str:
    """Twin of :func:`..operators.dedup.cluster_safe_split`: the trusted
    MinHash-pairs + transitive-closure component chain, split bucket on
    the cluster root (singletons root at themselves) via the shared md5
    rule."""
    t = int(round(train * 10000))
    v = int(round((train + val) * 10000))
    root = "coalesce(c.root, d.doc_id)"
    bucket = (
        f"CAST(('0x' || substring(md5(CAST({root} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % 10000"
    )
    return f"""
WITH RECURSIVE {_minhash_pairs_ctes(k, bands, threshold)},
edges AS (
  SELECT doc_id_1 AS a, doc_id_2 AS b FROM pairs
  UNION SELECT doc_id_2, doc_id_1 FROM pairs
),
reach(node, r) AS (
  SELECT a, b FROM edges
  UNION
  SELECT re.node, e.b FROM reach re JOIN edges e ON e.a = re.r
),
comp AS (
  SELECT node AS doc_id, least(node, min(r)) AS root
  FROM reach GROUP BY node
)
SELECT d.doc_id, {root} AS cluster_root,
       CASE WHEN {bucket} < {t} THEN 'train'
            WHEN {bucket} < {v} THEN 'val'
            ELSE 'test' END AS split
FROM documents d LEFT JOIN comp c USING (doc_id)
"""


def search_proximity_sql(query_terms: list[str], k: int = 10) -> str:
    """Twin of :func:`..operators.search.proximity_topk`: identical
    merged-occurrence running-max MinCover (0-based positions, same
    whitespace tokenization as the BM25 twins)."""
    terms = sorted(set(query_terms))
    in_list = ", ".join(f"'{t}'" for t in terms)
    lasts = ",\n         ".join(
        f"max(CASE WHEN word = '{t}' THEN pos END) OVER win AS l{i}"
        for i, t in enumerate(terms)
    )
    least = ", ".join(f"l{i}" for i in range(len(terms)))
    notnull = " AND ".join(f"l{i} IS NOT NULL" for i in range(len(terms)))
    return f"""
WITH occ AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS pos, w[CAST(t.i + 1 AS INT)] AS word
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       UNNEST(range(len(w))) AS t(i)
  WHERE w[CAST(t.i + 1 AS INT)] IN ({in_list})
),
m AS (
  SELECT doc_id, pos,
         {lasts}
  FROM occ
  WINDOW win AS (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
p AS (
  SELECT doc_id, CAST(min(pos - least({least}) + 1) AS BIGINT) AS min_span
  FROM m WHERE {notnull} GROUP BY doc_id
)
SELECT doc_id, min_span, rank
FROM (SELECT *, row_number() OVER (ORDER BY min_span, doc_id) AS rank FROM p)
WHERE rank <= {k}
"""


# --- corpus-frequency line dedup (CCNet paragraph-hash shape) -------------

# Planted multi-line fixture shared by the line-dedup twins: the base
# corpus has no newlines, so the registry glue (queries._docs_multiline)
# wraps every document in frequency-varied boilerplate lines — a header
# on every 3rd doc, a cookie banner on every 2nd, a whitespace-only line
# on every 7th, a footer on every 5th.  concat_ws skips the NULL CASE
# arms identically in both engines.
LINE_HEADER = "shared site header navigation menu"
LINE_COOKIE = "cookie consent banner please accept"
LINE_FOOTER = "shared footer all rights reserved"

_LINE_PLANT_CTE = f"""planted AS (
  SELECT doc_id,
         concat_ws(chr(10),
           CASE WHEN doc_id % 3 = 0 THEN '{LINE_HEADER}' END,
           CASE WHEN doc_id % 2 = 0 THEN '{LINE_COOKIE}' END,
           CASE WHEN doc_id % 7 = 0 THEN '   ' END,
           text,
           CASE WHEN doc_id % 5 = 0 THEN '{LINE_FOOTER}' END) AS text
  FROM documents
)"""


def text_boilerplate_lines_sql(min_docs: int = 2) -> str:
    """Twin of :func:`..operators.dedup.line_census` over the planted
    multi-line fixture: trimmed non-empty lines appearing in >=
    ``min_docs`` distinct documents, with doc- and occurrence-counts."""
    return f"""
WITH {_LINE_PLANT_CTE},
lines AS (
  SELECT doc_id, trim(unnest(string_split(text, chr(10)))) AS line_norm
  FROM planted
)
SELECT line_norm,
       count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_occurrences
FROM lines WHERE line_norm <> ''
GROUP BY 1 HAVING count(DISTINCT doc_id) >= {min_docs}
"""


def text_line_dedup_sql(min_docs: int = 2) -> str:
    """Twin of :func:`..operators.dedup.line_dedup`: strip census lines
    plus whitespace-only lines, reassemble surviving lines in original
    order; every document keeps a row (empty string when nothing
    survives)."""
    return f"""
WITH {_LINE_PLANT_CTE},
lines AS (
  SELECT doc_id,
         CAST(generate_subscripts(l, 1) AS BIGINT) AS pos,
         unnest(l) AS line,
         trim(unnest(l)) AS line_norm
  FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM planted)
),
freq AS (
  SELECT line_norm FROM lines WHERE line_norm <> ''
  GROUP BY 1 HAVING count(DISTINCT doc_id) >= {min_docs}
),
kept AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(line, chr(10) ORDER BY pos) AS text_filtered
  FROM lines
  WHERE line_norm <> '' AND line_norm NOT IN (SELECT line_norm FROM freq)
  GROUP BY doc_id
),
base AS (
  SELECT doc_id, CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines
  FROM planted
)
SELECT b.doc_id, b.n_lines,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       coalesce(k.text_filtered, '') AS text_filtered
FROM base b LEFT JOIN kept k USING (doc_id)
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


def text_kn_logprob_sql(discount: float = 0.75) -> str:
    """Twin of :func:`..operators.text_analysis.kn_logprob_scores`:
    interpolated Kneser-Ney bigram conditionals — absolute discount,
    continuation-count backoff, identical literal operand order."""
    d = float(discount)
    return f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
words AS (
  SELECT doc_id, CAST(generate_subscripts(w, 1) AS BIGINT) AS pos, unnest(w) AS word
  FROM ws
),
bg AS (
  SELECT a.doc_id, a.word AS w1, b.word AS w2
  FROM words a JOIN words b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
bc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
ctx AS (SELECT w1, sum(c12) AS c1, count(*) AS n1f FROM bc GROUP BY w1),
cont AS (SELECT w2, count(*) AS n1r FROM bc GROUP BY w2),
t AS (SELECT CAST(count(*) AS DOUBLE) AS n_types FROM bc),
lp AS (
  SELECT bc.w1, bc.w2,
         ln((greatest(c12 - {d}, 0.0) + {d} * n1f * n1r / n_types) / c1) AS l
  FROM bc JOIN ctx USING (w1) JOIN cont USING (w2), t
)
SELECT doc_id, count(*) AS n_bigrams, round(avg(l), 4) AS avg_logprob_kn
FROM bg JOIN lp USING (w1, w2)
GROUP BY doc_id
"""


def text_ppl_buckets_sql(n_buckets: int = 3, discount: float = 0.75) -> str:
    """Twin of :func:`..operators.text_analysis.ppl_buckets`: the
    Kneser-Ney per-doc chain of :func:`text_kn_logprob_sql`, joined
    back to each document's source, equal-count ntile per source over
    the total (score DESC, doc_id ASC) order, head/middle/tail band."""
    d = float(discount)
    return f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
words AS (
  SELECT doc_id, CAST(generate_subscripts(w, 1) AS BIGINT) AS pos, unnest(w) AS word
  FROM ws
),
bg AS (
  SELECT a.doc_id, a.word AS w1, b.word AS w2
  FROM words a JOIN words b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
bc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
ctx AS (SELECT w1, sum(c12) AS c1, count(*) AS n1f FROM bc GROUP BY w1),
cont AS (SELECT w2, count(*) AS n1r FROM bc GROUP BY w2),
t AS (SELECT CAST(count(*) AS DOUBLE) AS n_types FROM bc),
lp AS (
  SELECT bc.w1, bc.w2,
         ln((greatest(c12 - {d}, 0.0) + {d} * n1f * n1r / n_types) / c1) AS l
  FROM bc JOIN ctx USING (w1) JOIN cont USING (w2), t
),
sc AS (
  SELECT doc_id, round(avg(l), 4) AS avg_logprob_kn
  FROM bg JOIN lp USING (w1, w2)
  GROUP BY doc_id
),
bkt AS (
  SELECT sc.doc_id, d.source, sc.avg_logprob_kn,
         CAST(ntile({n_buckets}) OVER (PARTITION BY d.source
             ORDER BY sc.avg_logprob_kn DESC, sc.doc_id) AS BIGINT) AS bucket
  FROM sc JOIN documents d USING (doc_id)
)
SELECT doc_id, source, avg_logprob_kn, bucket,
       CASE WHEN bucket = 1 THEN 'head'
            WHEN bucket = {n_buckets} THEN 'tail'
            ELSE 'middle' END AS band
FROM bkt
"""


def corpus_select_ppl_sql(n_buckets: int = 3, discount: float = 0.75) -> str:
    """Twin of :func:`..operators.text_analysis.ppl_select`: the
    bucketing chain filtered to head+middle, ids + band only."""
    inner = text_ppl_buckets_sql(n_buckets=n_buckets, discount=discount)
    return f"""
SELECT doc_id, source, band FROM ({inner}) __b WHERE band != 'tail'
"""


def _vocab_curve_cte(interval: int) -> str:
    """Shared curve CTE chain for the vocab-growth twins."""
    return f"""words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
fd AS (SELECT w, min(doc_id) AS fdoc FROM words GROUP BY w),
nb AS (SELECT CAST(floor(fdoc / {interval}) AS BIGINT) AS bucket,
              count(*) AS nw FROM fd GROUP BY 1),
pb AS (
  SELECT CAST(floor(doc_id / {interval}) AS BIGINT) AS bucket,
         count(*) AS nd, sum(len(string_split(text, ' '))) AS nt
  FROM documents GROUP BY 1
),
curve AS (
  SELECT pb.bucket,
         CAST(sum(nd) OVER win AS BIGINT) AS docs_cum,
         CAST(sum(nt) OVER win AS BIGINT) AS tokens_cum,
         CAST(sum(coalesce(nw, 0)) OVER win AS BIGINT) AS vocab_cum
  FROM pb LEFT JOIN nb USING (bucket)
  WINDOW win AS (ORDER BY pb.bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)"""


def vocab_growth_curve_sql(interval: int = 10) -> str:
    """Twin of :func:`..operators.text_analysis.vocab_growth_curve` —
    integer-exact cumulative docs/tokens/vocabulary per id block."""
    return f"""
WITH {_vocab_curve_cte(interval)}
SELECT bucket, docs_cum, tokens_cum, vocab_cum FROM curve
"""


def vocab_heaps_fit_sql(interval: int = 10) -> str:
    """Twin of :func:`..operators.text_analysis.vocab_heaps_fit` —
    closed-form log-log OLS over the curve points."""
    return f"""
WITH {_vocab_curve_cte(interval)},
pts AS (
  SELECT ln(CAST(tokens_cum AS DOUBLE)) AS x,
         ln(CAST(vocab_cum AS DOUBLE)) AS y
  FROM curve
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_points,
         avg(x) AS mx, avg(y) AS my,
         avg(x * x) AS mxx, avg(y * y) AS myy, avg(x * y) AS mxy
  FROM pts
)
SELECT n_points,
       round((mxy - mx * my) / (mxx - mx * mx) + 1e-9, 6) AS beta,
       round(my - (mxy - mx * my) / (mxx - mx * mx) * mx + 1e-9, 6) AS log_k,
       round((mxy - mx * my) * (mxy - mx * my)
             / ((mxx - mx * mx) * (myy - my * my)) + 1e-9, 6) AS r2
FROM agg
"""


def corpus_boilerplate_by_source_sql(min_docs: int = 2) -> str:
    """Twin of :func:`..operators.dedup.boilerplate_by_source` over the
    planted multi-line fixture."""
    return f"""
WITH {_LINE_PLANT_CTE},
plsrc AS (
  SELECT p.doc_id, d.source, p.text
  FROM planted p JOIN documents d USING (doc_id)
),
lines AS (
  SELECT doc_id, source,
         trim(unnest(string_split(text, chr(10)))) AS line_norm
  FROM plsrc
),
freq AS (
  SELECT line_norm FROM lines WHERE line_norm <> ''
  GROUP BY 1 HAVING count(DISTINCT doc_id) >= {min_docs}
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN line_norm IN (SELECT line_norm FROM freq)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       round(sum(CASE WHEN line_norm IN (SELECT line_norm FROM freq)
                 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE) + 1e-9, 6)
         AS boiler_ratio
FROM lines WHERE line_norm <> ''
GROUP BY source
"""
