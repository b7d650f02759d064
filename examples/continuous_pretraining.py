"""Continuous-pretraining increment workflow — what a team shipping a
corpus v(N+1) actually runs, composed entirely from registry operators:

1. snapshot diff: what changed since v(N) (only the delta is re-curated)
2. curate the ADDED docs (quality gate + exact dedup vs the kept corpus)
3. near-dup the survivors against the EXISTING corpus (band store probe
   semantics, here the batch twin)
4. stratified CV folds over the final corpus for eval-train hygiene
5. census + data card rows for the release note

    python examples/continuous_pretraining.py [sf_dir]   # default sf0.001

The two "versions" are derived deterministically from the documents
table (same derivation the corpus_diff oracle grades), so the script is
reproducible and runs anywhere the testdata exists.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from datalake_indexes_spark.operators.dedup import (  # noqa: E402
    exact_duplicate_groups,
    minhash_lsh_pairs,
)
from datalake_indexes_spark.operators.ml import cv_folds  # noqa: E402
from datalake_indexes_spark.operators.text_analysis import (  # noqa: E402
    quality_scores,
    snapshot_diff,
    snapshot_diff_census,
)
from datalake_indexes_spark.session import get_spark  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark("continuous-pretraining")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # two corpus versions (same derivation as the corpus_diff oracle)
    v_old = docs.filter(F.col("doc_id") % 11 != 3).withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 2, F.upper("text")).otherwise(F.col("text")),
    )
    v_new = docs.filter(F.col("doc_id") % 13 != 5)

    print("== 1. snapshot diff (re-curate only the delta) ==")
    delta = snapshot_diff(v_old, v_new).cache()
    snapshot_diff_census(v_old, v_new).orderBy("status").show()

    added_ids = delta.filter(F.col("status").isin("added", "changed")).select(
        "doc_id"
    )
    incoming = v_new.join(added_ids, "doc_id")
    print(f"incoming docs to curate: {incoming.count()}")

    print("== 2. quality gate + exact dedup vs kept corpus ==")
    q = quality_scores(incoming)
    kept_incoming = incoming.join(
        q.filter(F.col("quality_score") >= 0.3).select("doc_id"), "doc_id"
    )
    surviving_corpus = v_new.join(
        delta.filter(F.col("status") == "unchanged").select("doc_id"), "doc_id"
    )
    union = surviving_corpus.unionByName(kept_incoming)
    keep = exact_duplicate_groups(union).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    corpus = union.join(keep, "doc_id")
    print(f"corpus after gate+exact dedup: {corpus.count()}")

    print("== 3. near-dup pass over the merged corpus ==")
    pairs = minhash_lsh_pairs(corpus, threshold=0.7)
    drop = pairs.select(F.col("doc_id_2").alias("doc_id")).distinct()
    corpus = corpus.join(drop, "doc_id", "left_anti")
    print(f"corpus after near-dup: {corpus.count()}")

    print("== 4. stratified 5-fold CV assignment ==")
    folds = cv_folds(corpus, k=5, stratum_col="lang")
    folds.groupBy("stratum", "fold").count().orderBy("stratum", "fold").show(40)

    print("== 5. release census ==")
    corpus.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("n_chars")
    ).orderBy("lang").show()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
