"""XASH duplicate-detection oracle twins.

Split from the former plans/oracle.py (round 9) — pure rearrangement,
every definition verbatim.  Import surface unchanged via the package
``__init__``.
"""

from __future__ import annotations
from datalake_indexes_spark.functions.text import NULLISH_TOKENS, tokenize_sql
from datalake_indexes_spark.sources.catalog import TESTDATA_LAKE_SPEC, LakeTableSpec

from datalake_indexes_spark.plans.oracle._common import cells_cte

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


