"""Shared CTE helpers and cross-family oracle twins.

Split from the former plans/oracle.py (round 9) — pure rearrangement,
every definition verbatim.  Import surface unchanged via the package
``__init__``.
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


_NUMERIC_TOKEN = "(tokenized IN ('', 'nan') OR TRY_CAST(tokenized AS DOUBLE) IS NOT NULL)"


def _sql_str(s: str) -> str:
    """Render a Python string as a DuckDB expression via chr() concat —
    sidesteps every literal-escaping concern for control/unicode chars."""
    if not s:
        return "''"
    return " || ".join(f"chr({ord(c)})" for c in s)


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


