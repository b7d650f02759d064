"""10x scale exercise for the session's new curation operators: Gopher
rule flags, DSIR importance weights, hashed Naive Bayes, and harmonic
packing, measured at sf0.1 (1x) and at the same synthesized 10x corpus
as examples/scale10x_exercise.py (imported from there), through the
measured stage profile (wall, shuffle bytes, spill, task skew).

Expected shapes: Gopher is map-only (zero shuffle at any factor); DSIR
shuffles only the 256-key bucket aggregate plus the doc-keyed mean; NB
shuffles the class-bucket counts and the per-(doc, class) scores;
harmonic pack shuffles the (class, salt) rank windows.  All four should
grow near-linearly in wall and shuffle with flat skew.

Run:  python examples/scale10x_curation.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from examples.scale10x_exercise import (  # noqa: E402
    FACTOR,
    OUT,
    scaled_docs,
    trimmed,
)


def q_gopher(spark, docs):
    from datalake_indexes_spark.operators.text_analysis import gopher_rule_flags

    return gopher_rule_flags(docs, min_words=30, min_stopwords=1)


def q_dsir(spark, docs):
    from datalake_indexes_spark.operators.text_analysis import (
        dsir_importance_weights,
    )

    return dsir_importance_weights(docs, n_buckets=256, alpha=0.5)


def q_nb(spark, docs):
    from datalake_indexes_spark.operators.ml import hashed_nb_classify

    planted = docs.withColumn(
        "text",
        F.concat(F.col("text"), F.lit(" zz"), F.col("lang")),
    )
    return hashed_nb_classify(planted, n_buckets=512)


def q_pack(spark, docs):
    from datalake_indexes_spark.operators.text_analysis import harmonic_pack

    return harmonic_pack(docs, token_budget=64)


def main() -> None:
    from datalake_indexes_spark.plans.runtime import runtime_report_of
    from datalake_indexes_spark.session import get_spark

    spark = get_spark("scale10x-curation")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)

    docs1 = scaled_docs(spark, 1)
    docs10 = scaled_docs(spark, FACTOR)

    results: dict[str, dict] = {}
    for name, fn in [
        ("text_gopher_filters", q_gopher),
        ("text_dsir_weights", q_dsir),
        ("ml_nb_langid", q_nb),
        ("corpus_pack_harmonic", q_pack),
    ]:
        results[name] = {
            "1x": trimmed(
                runtime_report_of(lambda: fn(spark, docs1), spark, min_stage_ms=50)
            ),
            f"{FACTOR}x": trimmed(
                runtime_report_of(lambda: fn(spark, docs10), spark, min_stage_ms=50)
            ),
        }
        print(name, json.dumps(results[name]), flush=True)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
