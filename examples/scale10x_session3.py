"""10x scale exercise for the third continued-session operators:
corpus-frequency line dedup, margin-criterion pair mining, one
NN-descent round, the isotropy gauge, and the NB calibration report —
sf0.1 (1x) vs the shared synthesized 10x corpus/embeddings, through the
measured stage profile (wall, shuffle bytes, spill, task skew).

Expected shapes: line dedup and NB calibration are linear (one/two
corpus-keyed shuffles, model-constant broadcast); isotropy is one
O(n*d) aggregate; NN-descent is the IVF-blocked near-linear scale path;
margin mining's brute cosine_topk building block is the documented
QUADRATIC baseline (the measurement shows exactly that — at corpus
scale the caller swaps in knn_graph's IVF join, same downstream
algebra).

Run:  python examples/scale10x_session3.py
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
    scaled_embeddings,
    trimmed,
)


def _multiline(docs):
    from datalake_indexes_spark.plans import oracle

    return docs.withColumn(
        "text",
        F.concat_ws(
            "\n",
            F.when(F.col("doc_id") % 3 == 0, F.lit(oracle.LINE_HEADER)),
            F.when(F.col("doc_id") % 2 == 0, F.lit(oracle.LINE_COOKIE)),
            F.when(F.col("doc_id") % 7 == 0, F.lit("   ")),
            F.col("text"),
            F.when(F.col("doc_id") % 5 == 0, F.lit(oracle.LINE_FOOTER)),
        ),
    )


def q_line_dedup(spark, docs):
    from datalake_indexes_spark.operators.dedup import line_dedup

    return line_dedup(_multiline(docs), min_docs=2)


def q_margin_mining(spark, emb):
    from datalake_indexes_spark.operators.similarity import margin_mining

    return margin_mining(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        k=4,
        threshold=1.1,
    )


def q_nn_descent(spark, emb):
    from datalake_indexes_spark.operators.similarity import nn_descent_round

    return nn_descent_round(emb, k=5)


def q_nn_descent_sqrt(spark, emb):
    # sqrt-scaled centroid count at 10x (16 -> 50): inverted lists stay
    # ~bounded, restoring near-linear join volume vs the fixed-16 run
    from datalake_indexes_spark.operators.similarity import nn_descent_round

    return nn_descent_round(emb, k=5, n_centroids=50)


def q_margin_blocked(spark, emb):
    from datalake_indexes_spark.operators.similarity import margin_mining_blocked

    return margin_mining_blocked(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        k=4,
        threshold=1.1,
    )


def q_margin_blocked_sqrt(spark, emb):
    from datalake_indexes_spark.operators.similarity import margin_mining_blocked

    return margin_mining_blocked(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        k=4,
        threshold=1.1,
        n_centroids=50,
    )


def q_isotropy(spark, emb):
    from datalake_indexes_spark.operators.similarity import (
        embedding_isotropy_report,
    )

    return embedding_isotropy_report(emb)


def q_nb_calibration(spark, docs):
    from datalake_indexes_spark.operators.ml import nb_calibration_report

    planted = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" zz"), F.col("lang"),
            F.lit(" zz"), F.col("lang"),
            F.lit(" zz"), F.col("lang"),
        ),
    )
    return nb_calibration_report(planted, n_buckets=512, n_bins=16)


def main() -> None:
    from datalake_indexes_spark.plans.runtime import runtime_report_of
    from datalake_indexes_spark.session import get_spark

    spark = get_spark("scale10x-session3")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)

    docs1, docs10 = scaled_docs(spark, 1), scaled_docs(spark, FACTOR)
    emb1, emb10 = scaled_embeddings(spark, 1), scaled_embeddings(spark, FACTOR)

    cases = [
        ("text_line_dedup", q_line_dedup, docs1, q_line_dedup, docs10),
        ("ml_nb_calibration", q_nb_calibration, docs1, q_nb_calibration, docs10),
        ("ml_embedding_isotropy", q_isotropy, emb1, q_isotropy, emb10),
        ("ann_nn_descent", q_nn_descent, emb1, q_nn_descent, emb10),
        ("ann_nn_descent_sqrtc", q_nn_descent, emb1, q_nn_descent_sqrt, emb10),
        ("ann_margin_mining", q_margin_mining, emb1, q_margin_mining, emb10),
        ("ann_margin_blocked", q_margin_blocked, emb1, q_margin_blocked, emb10),
        ("ann_margin_blocked_sqrtc", q_margin_blocked, emb1, q_margin_blocked_sqrt, emb10),
    ]
    results: dict[str, dict] = {}
    for name, fn1, d1, fn10, d10 in cases:
        results[name] = {
            "1x": trimmed(
                runtime_report_of(lambda: fn1(spark, d1), spark, min_stage_ms=50)
            ),
            f"{FACTOR}x": trimmed(
                runtime_report_of(lambda: fn10(spark, d10), spark, min_stage_ms=50)
            ),
        }
        print(name, json.dumps(results[name]), flush=True)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
