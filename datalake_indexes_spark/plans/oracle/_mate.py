"""MATE joinability-search oracle twins.

Split from the former plans/oracle.py (round 9) — pure rearrangement,
every definition verbatim.  Import surface unchanged via the package
``__init__``.
"""

from __future__ import annotations
from datalake_indexes_spark.functions.text import NULLISH_TOKENS, tokenize_sql
from datalake_indexes_spark.sources.catalog import TESTDATA_LAKE_SPEC, LakeTableSpec

from datalake_indexes_spark.plans.oracle._common import cells_cte

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


