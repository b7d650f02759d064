"""Local replica of the driver's Spark-vs-DuckDB correctness comparison:
row count + schema-insensitive, order-insensitive value hash."""

from __future__ import annotations

import math
import os

import duckdb


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    from datalake_indexes_spark.sources.catalog import ALL_TABLE_NAMES

    for name in ALL_TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).fetch_df()


def _norm_cell(v, strict: bool = True):
    """Canonical cell string.  ``strict`` keeps the int/float distinction
    (0 vs 0.0 hash differently) — round 4 showed the driver's value hash
    is dtype-strict: a DuckDB HUGEINT sum surfacing as pandas float64
    mismatched the Spark long even though every value compared equal.
    Non-strict (legacy) folds whole floats to ints and trims precision."""
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        v = v.item()
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(bool(v)).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if strict:
            return repr(v)
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    return str(v)


def canonical_rows(rows, columns, strict: bool = True):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append("\x01".join(_norm_cell(vals[i], strict) for i in order))
    out.sort()
    return out


def compare(spark_df, sql: str, sf_dir: str, name: str = "?") -> dict:
    sp_rows = spark_df.collect()
    sp_cols = spark_df.columns
    dk = duckdb_run(sql, sf_dir)
    dk_cols = list(dk.columns)
    dk_rows = list(dk.itertuples(index=False, name=None))

    result = {
        "name": name,
        "spark_rows": len(sp_rows),
        "duck_rows": len(dk_rows),
        "cols_match": sorted(sp_cols) == sorted(dk_cols),
        "rows_match": len(sp_rows) == len(dk_rows),
    }
    a = canonical_rows([tuple(r) for r in sp_rows], sp_cols)
    b = canonical_rows(dk_rows, dk_cols)
    result["values_match"] = a == b
    if not result["values_match"]:
        # distinguish a representational (dtype/precision) split from a
        # genuine value divergence — the former still fails the driver's
        # strict hash but is fixed on the oracle side, not the engine
        la = canonical_rows([tuple(r) for r in sp_rows], sp_cols, strict=False)
        lb = canonical_rows(dk_rows, dk_cols, strict=False)
        result["loose_match"] = la == lb
        # hoist the sets: inside the comprehension's filter they would be
        # rebuilt per element (O(n²) — a 469k-row mismatch burned hours)
        set_a, set_b = set(a), set(b)
        diff_a = [x for x in a if x not in set_b][:5]
        diff_b = [x for x in b if x not in set_a][:5]
        result["spark_only"] = diff_a
        result["duck_only"] = diff_b
    return result
