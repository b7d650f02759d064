"""Cell-index / lake-catalog / discovery-core oracle twins.

Split from the former plans/oracle.py (round 9) — pure rearrangement,
every definition verbatim.  Import surface unchanged via the package
``__init__``.
"""

from __future__ import annotations
from datalake_indexes_spark.functions.text import NULLISH_TOKENS, tokenize_sql
from datalake_indexes_spark.sources.catalog import TESTDATA_LAKE_SPEC, LakeTableSpec

from datalake_indexes_spark.plans.oracle._common import _NUMERIC_TOKEN, cells_cte
from datalake_indexes_spark.plans.oracle._profiling import inclusion_deps_sql

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


