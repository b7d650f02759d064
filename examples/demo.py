"""Runnable twin of the reference's demo notebook
(`datalakes_indexes_demo.ipynb` — load dataset → joinability discovery →
duplicate detection → correlation calculation → feature materialization →
model fit), against the local testdata lake.

    python examples/demo.py [sf_dir]          # default /root/testdata/sf0.001

Each numbered stage matches a notebook section; the printed artifacts are
the DataFrames the notebook displays/plots.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from datalake_indexes_spark.operators.duplicates import DuplicateDetection  # noqa: E402
from datalake_indexes_spark.operators.mate import MATE  # noqa: E402
from datalake_indexes_spark.pipelines.enrichment import enrich_dataset  # noqa: E402
from datalake_indexes_spark.plans.queries import testdata_index  # noqa: E402
from datalake_indexes_spark.session import get_spark  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark("datalake-indexes-demo")
    spark.sparkContext.setLogLevel("ERROR")

    print("=== 1) Input preparation: the 'customer' dataset ===")
    customer = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    customer.show(3)
    index = testdata_index(spark, sf_dir)  # offline-built lake index

    print("=== 2) Joinability discovery (MATE, Super Key Index) ===")
    mate = MATE(index)
    res = mate.join_search(
        customer, ["c_custkey"], k=20, k_c=200, input_order_by=["c_custkey"]
    )
    res.top_k.show(20, truncate=False)

    print("=== 3) Duplicate detection (XASH super-key prefilter) ===")
    dd = DuplicateDetection(index)
    relations = dd.get_relations()
    relations.show(10)
    print("duplicate groups:")
    dd.duplicate_groups(relations).show(10)

    print("=== 4) Correlation calculation + materialization (COCOA) ===")
    enr = enrich_dataset(
        index,
        customer,
        ["c_custkey"],
        "c_acctbal",
        k=5,
        k_c=200,
        k_features=5,
        input_order_by=["c_custkey"],
    )
    print("top correlating external features:")
    enr.correlations.select(
        "table_col_id", F.round("corr", 4).alias("corr"), "is_numeric"
    ).show(10)
    print("enriched dataset (input + ext_* columns):")
    enr.enriched.orderBy("mate_row_id").show(5)
    print("run stats:", enr.stats)

    print("=== 5) Model fit: input-only vs enriched RMSE ===")
    try:
        from datalake_indexes_spark.operators.ml import fit_and_evaluate

        ext_cols = [c for c in enr.enriched.columns if c.startswith("ext_")]
        base = fit_and_evaluate(
            customer.select("c_custkey", "c_nationkey", "c_acctbal"),
            "c_acctbal",
            ["c_custkey", "c_nationkey"],
        )
        rich = fit_and_evaluate(
            enr.enriched.select(
                "c_custkey",
                "c_nationkey",
                "c_acctbal",
                *[F.col(c).try_cast("double").alias(c) for c in ext_cols],
            ),
            "c_acctbal",
            ["c_custkey", "c_nationkey", *ext_cols],
        )
        print(
            f"RMSE input-only: {base['rmse']:.3f}   "
            f"enriched: {rich['rmse']:.3f}"
        )
    except Exception as e:  # noqa: BLE001 — MLlib availability guard
        print("model fit skipped:", e)

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
