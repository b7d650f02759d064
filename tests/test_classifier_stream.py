"""Streaming NB model maintenance (streaming/classifier_stream.py):
folded model == batch model, classification parity with batch
hashed_nb_classify, retry idempotency, and a real availableNow
file-stream run."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from datalake_indexes_spark.operators.ml import (
    hashed_nb_classify,
    nb_class_docs,
    nb_classify_with_model,
    nb_token_counts,
)
from datalake_indexes_spark.streaming.classifier_stream import (
    load_nb_model,
    make_nb_model_processor,
    nb_model_stream,
)

B = 64


def _docs(spark):
    rows = [(i, "apple banana apple cherry", "fruit") for i in range(6)]
    rows += [(10 + i, "zebra yak zebra llama", "animal") for i in range(6)]
    rows += [(20, "apple zebra", "fruit"), (21, "yak banana", "animal")]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _norm(rows):
    return sorted(
        (r["doc_id"], r["label"], r["pred_label"], r["n_words"], r["correct"])
        for r in rows
    )


def test_folded_model_and_classification_match_batch(spark):
    docs = _docs(spark)
    work = tempfile.mkdtemp(prefix="nbstream_")
    try:
        process = make_nb_model_processor(f"{work}/model", n_buckets=B)
        process(docs.filter(F.col("doc_id") < 5), 0)
        process(docs.filter((F.col("doc_id") >= 5) & (F.col("doc_id") < 15)), 1)
        process(docs.filter(F.col("doc_id") >= 15), 2)

        tokens, classes = load_nb_model(spark, f"{work}/model")
        want_tokens = sorted(
            map(tuple, nb_token_counts(docs, n_buckets=B).collect())
        )
        assert sorted(map(tuple, tokens.collect())) == want_tokens
        assert sorted(map(tuple, classes.collect())) == sorted(
            map(tuple, nb_class_docs(docs).collect())
        )

        got = _norm(
            nb_classify_with_model(docs, tokens, classes, n_buckets=B).collect()
        )
        assert got == _norm(hashed_nb_classify(docs, n_buckets=B).collect())
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_retried_batch_is_idempotent(spark):
    docs = _docs(spark)
    work = tempfile.mkdtemp(prefix="nbretry_")
    try:
        process = make_nb_model_processor(f"{work}/model", n_buckets=B)
        process(docs.filter(F.col("doc_id") < 12), 0)
        process(docs.filter(F.col("doc_id") >= 12), 1)
        t1, c1 = load_nb_model(spark, f"{work}/model")
        before = (sorted(map(tuple, t1.collect())), sorted(map(tuple, c1.collect())))
        process(docs.filter(F.col("doc_id") >= 12), 1)  # crash-retry replay
        t2, c2 = load_nb_model(spark, f"{work}/model")
        after = (sorted(map(tuple, t2.collect())), sorted(map(tuple, c2.collect())))
        assert before == after
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_available_now_file_stream(spark):
    docs = _docs(spark)
    work = tempfile.mkdtemp(prefix="nbfs_")
    try:
        docs.write.parquet(f"{work}/in")
        q = nb_model_stream(
            spark,
            f"{work}/in",
            docs.schema,
            f"{work}/model",
            f"{work}/ckpt",
            n_buckets=B,
        )
        q.awaitTermination(120)
        tokens, classes = load_nb_model(spark, f"{work}/model")
        got = _norm(
            nb_classify_with_model(docs, tokens, classes, n_buckets=B).collect()
        )
        assert got == _norm(hashed_nb_classify(docs, n_buckets=B).collect())
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_model_keeps_learning_across_batches(spark):
    # after batch 0 (fruit docs only) the model can only say "fruit";
    # once animal docs arrive in batch 1, the same scoring call flips
    # the animal docs' predictions — no retraining from scratch
    docs = _docs(spark)
    work = tempfile.mkdtemp(prefix="nbgrow_")
    try:
        process = make_nb_model_processor(f"{work}/model", n_buckets=B)
        process(docs.filter(F.col("lang") == "fruit"), 0)
        t0, c0 = load_nb_model(spark, f"{work}/model")
        animal = docs.filter(F.col("doc_id").isin(10, 11))
        first = {
            r["doc_id"]: r["pred_label"]
            for r in nb_classify_with_model(animal, t0, c0, n_buckets=B).collect()
        }
        assert set(first.values()) == {"fruit"}  # only class ever seen
        process(docs.filter(F.col("lang") == "animal"), 1)
        t1, c1 = load_nb_model(spark, f"{work}/model")
        second = {
            r["doc_id"]: r["pred_label"]
            for r in nb_classify_with_model(animal, t1, c1, n_buckets=B).collect()
        }
        assert set(second.values()) == {"animal"}
    finally:
        shutil.rmtree(work, ignore_errors=True)
