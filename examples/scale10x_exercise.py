"""10x scale exercise for the non-index headline paths (round-7 task):
dedup_minhash_lsh, dedup_clusters_distributed, ann_ivf_pq and
cocoa_enrich_multicolumn measured at sf0.1 (1x) and at a synthesized 10x
of their corpus-sized input, through plans/runtime.py's measured stage
profile (wall, shuffle bytes, spill, task skew).  Near-linear wall and
shuffle growth at a flat skew is the evidence the 100-TB design claim
rests on; a super-linear jump or a skew blow-up names the hotspot.

Synthesis (deterministic, fixture-shaped):

- documents x10: nine extra copies, doc_id shifted by k*10M and text
  ROTATED by 7k chars — each copy keeps its own planted near-dup
  structure but copies are mutually distinct (rotation rewrites nearly
  every shingle), so pair volume scales ~linearly with the corpus
  instead of quadratically with a replica-clique size.
- embeddings x10: vec_id shifted, vector rolled by k positions — norms
  preserved, directions distinct, so IVF cell occupancy stays balanced.
- lake index x10: every index component unioned with table_id shifted
  by 1000k, tokens IDENTICAL — every replica is a real MATE/COCOA
  candidate, which is the stress: 10x posting lists, 10x candidate
  columns through the k_c/k_t caps.  token_stats keeps the same keys
  with cnt x10 (each token's postings replicate per copy).

Writes nothing outside /tmp.  Run:  python examples/scale10x_exercise.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/scale10x"
FACTOR = 10


def scaled_docs(spark, factor: int):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    if factor == 1:
        return docs
    parts = [docs]
    for k in range(1, factor):
        rot = 7 * k
        parts.append(
            docs.select(
                (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
                F.expr(
                    f"concat(substring(text, {rot + 1}), substring(text, 1, {rot}))"
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    path = f"{OUT}/documents_{factor}x.parquet"
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def scaled_embeddings(spark, factor: int):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    if factor == 1:
        return emb
    parts = [emb]
    for k in range(1, factor):
        parts.append(
            emb.select(
                (F.col("vec_id") + k * 10_000_000).alias("vec_id"),
                F.expr(
                    f"concat(slice(embedding, {k + 1}, size(embedding) - {k}),"
                    f" slice(embedding, 1, {k}))"
                ).alias("embedding"),
                "label",
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    path = f"{OUT}/embeddings_{factor}x.parquet"
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def scaled_index(spark, factor: int):
    from datalake_indexes_spark.index.lake_index import LakeIndex
    from datalake_indexes_spark.plans.queries import testdata_index

    idx = testdata_index(spark, SF_DIR, with_super_keys=True)
    if factor == 1:
        return idx

    def rep(df):
        if df is None:
            return None
        parts = [df]
        for k in range(1, factor):
            parts.append(df.withColumn("table_id", F.col("table_id") + 1000 * k))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.persist()

    token_stats = None
    if idx.token_stats is not None:
        token_stats = idx.token_stats.withColumn(
            "cnt", F.col("cnt") * factor
        ).persist()
    big = LakeIndex(
        cells=rep(idx.cells),
        row_keys=rep(idx.row_keys),
        column_headers=rep(idx.column_headers),
        table_info=rep(idx.table_info),
        col_flags=rep(idx.col_flags),
        cells_keyed=rep(idx.cells_keyed),
        token_stats=token_stats,
    )
    # materialize the replicated artifacts so the profiled queries pay
    # query work, not input synthesis — the same warm-index lifecycle the
    # 1x run gets from the session cache
    for df in (big.cells, big.row_keys, big.col_flags, big.cells_keyed):
        if df is not None:
            df.count()
    return big


def q_minhash(spark, docs):
    from datalake_indexes_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(docs, threshold=0.7)


def q_clusters(spark, docs):
    from datalake_indexes_spark.operators.dedup import (
        minhash_lsh_pairs,
        near_dup_clusters,
    )

    return near_dup_clusters(
        minhash_lsh_pairs(docs, threshold=0.7), distributed_threshold=0
    )


def q_ivf_pq(spark, emb):
    from datalake_indexes_spark.operators.similarity import ivf_pq_topk

    return ivf_pq_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        k=5,
        n_centroids=16,
        n_probe=4,
        m=4,
        ksub=16,
    )


def q_multicolumn(spark, idx):
    from datalake_indexes_spark.operators.cocoa import COCOA
    from datalake_indexes_spark.operators.mate import MATE
    from datalake_indexes_spark.plans.queries import with_global_row_number

    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    inp_ids = with_global_row_number(customer, ["c_custkey"], out_col="mate_row_id")
    res = MATE(idx).join_search(
        inp_ids, ["c_custkey"], k=5, k_c=500, input_order_by=["c_custkey"], stats={}
    )
    res.join_pairs = res.join_pairs.persist()
    out = COCOA(idx).enrich_multicolumn(
        inp_ids, res, k_c=10, target_column="c_acctbal"
    )
    return out.select("table_col_id", F.round("corr", 4).alias("corr"), "is_numeric")


def trimmed(rep: dict) -> dict:
    return {
        "wall_s": rep["wall_s"],
        "shuffle_read_mb": rep["shuffle_read_mb"],
        "shuffle_write_mb": rep["shuffle_write_mb"],
        "spill_mb": rep["spill_mb"],
        "max_task_skew": rep["max_task_skew"],
        "n_stages": rep["n_stages"],
    }


def main() -> None:
    # runtime_report_of profiles the THUNK — iterative operators (CC's
    # star rounds, IVF's k-means) run jobs during plan construction,
    # which a profile scoped to the final write would miss
    from datalake_indexes_spark.plans.runtime import runtime_report_of
    from datalake_indexes_spark.session import get_spark

    spark = get_spark("scale10x")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)

    results: dict[str, dict] = {}

    docs1 = scaled_docs(spark, 1)
    docs10 = scaled_docs(spark, FACTOR)
    emb1 = scaled_embeddings(spark, 1)
    emb10 = scaled_embeddings(spark, FACTOR)

    for name, fn, in1, in10 in [
        ("dedup_minhash_lsh", q_minhash, docs1, docs10),
        ("dedup_clusters_distributed", q_clusters, docs1, docs10),
        ("ann_ivf_pq", q_ivf_pq, emb1, emb10),
    ]:
        results[name] = {
            "1x": trimmed(
                runtime_report_of(lambda: fn(spark, in1), spark, min_stage_ms=50)
            ),
            f"{FACTOR}x": trimmed(
                runtime_report_of(lambda: fn(spark, in10), spark, min_stage_ms=50)
            ),
        }
        print(name, json.dumps(results[name]), flush=True)

    idx1 = scaled_index(spark, 1)
    results["cocoa_enrich_multicolumn"] = {
        "1x": trimmed(
            runtime_report_of(lambda: q_multicolumn(spark, idx1), spark, min_stage_ms=50)
        )
    }
    idx10 = scaled_index(spark, FACTOR)
    results["cocoa_enrich_multicolumn"][f"{FACTOR}x"] = trimmed(
        runtime_report_of(lambda: q_multicolumn(spark, idx10), spark, min_stage_ms=50)
    )
    print("cocoa_enrich_multicolumn", json.dumps(results["cocoa_enrich_multicolumn"]))

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
