"""Run every queries()/oracle_sql() pair against DuckDB locally and print
per-query match results — a local replica of the driver's correctness gate."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main(sf_dir: str = "/root/testdata/sf0.001", only: list[str] | None = None) -> int:
    import __spark_entry__ as entrymod
    from datalake_indexes_spark.session import get_spark
    from tests.oracle_compare import compare

    spark = get_spark("oracle-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                res = compare(df, oracles[name], sf_dir, name=name)
            else:
                res = {"name": name, "spark_rows": df.count(), "oracle": "none"}
        except Exception as e:  # noqa: BLE001
            res = {"name": name, "error": f"{type(e).__name__}: {e}"[:500]}
        res["sec"] = round(time.time() - t0, 1)
        ok = res.get("values_match", res.get("error") is None)
        if not ok:
            failures += 1
        print(("OK " if ok else "FAIL ") + json.dumps(res, default=str))
    return failures


if __name__ == "__main__":
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sys.exit(1 if main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001", only) else 0)
