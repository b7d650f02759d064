"""SparkSession factory with engine defaults.

Defaults are tuned for correctness-at-scale first:
- AQE on (runtime re-planning, skew-join handling, shuffle coalescing),
- Arrow on (all our Python crossings are pandas UDFs),
- shuffle partitions sized by env (tests use small values; a real cluster
  would set this to ~2-3x total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "datalake_indexes_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with engine defaults applied."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # size reducers by BYTES, not by a fixed count: shuffles start at
        # initialPartitionNum and AQE coalesces to ~advisory-sized (64 MB)
        # partitions per stage.  With a bare shuffle.partitions=N every
        # shuffle gets exactly N reducers no matter how big it is — the
        # round-7 10x exercise caught cocoa_enrich_multicolumn spilling
        # 12 GB through 32 evenly-loaded reducers whose sort buffers
        # outgrew their memory share (examples/scale10x_exercise.py).
        # 8x the base count keeps small stages cheap (AQE coalesces them
        # right back down) while letting big stages fan out.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            os.environ.get(  # env override for A/B runs (bench pinning)
                "SPARK_AQE_INITIAL_PARTITIONS",
                str(max(256, shuffle_partitions * 8)),
            ),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE's coalescing is byte-aware but CPU-blind: with the default
        # 1 MB minPartitionSize it shrank the XASH Arrow-UDF stage to 10
        # tasks on 32 cores (1.3 MB of shuffled cells carrying 33 s of
        # hashing CPU).  parallelismFirst=true already prefers cluster
        # parallelism over the advisory size when coalescing — a 64 KB
        # floor lets small-byte/heavy-CPU stages actually reach it, while
        # large stages are untouched (the floor only binds when
        # partitions would drop below it).
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_AQE_MIN_PARTITION_SIZE", "64k"),
        )
        # let AQE coalesce the output partitioning of plans that feed a
        # cache: without this (default false) a cached shuffle keeps all
        # initialPartitionNum (256+) reducer partitions, and EVERY
        # downstream job over the cache relaunches that many tasks over
        # kilobyte slices — measured at sf0.1: the index cache read back
        # at 256 partitions cost row_keys/col_flags/table_info passes
        # 2-3s each in pure task-scheduling overhead; with coalescing the
        # cache lands at ~cluster parallelism and the same passes run
        # 0.7-1.1s.  Coalescing merges whole reducer buckets, so hash
        # clustering (and the exchange-free row joins that depend on it)
        # is preserved.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            os.environ.get("SPARK_AQE_CACHED_REPARTITION", "true"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.parquet carries TIMESTAMP(NANOS); read as long
        # (nanos since epoch) and convert explicitly where needed
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Every action builds the plan-description string for the SQL
        # execution event (even with the UI off).  Unbounded (the default,
        # ~2^31 chars), a deeply composed pipeline whose consumers each
        # re-embed a big upstream subtree (enrichment: COCOA branches x the
        # MATE probe/verify plan) OOMed an 8 GB driver heap inside
        # QueryExecution.explainString — reproduced as the round-9
        # test_enrich_dataset_end_to_end failure.  8M chars is far more
        # than any debugging read needs and caps the allocation.
        .config(
            "spark.sql.maxPlanStringLength",
            os.environ.get("SPARK_MAX_PLAN_STRING_LENGTH", "8388608"),
        )
        # env override so profiling runs can read stage metrics over the
        # UI REST API; off by default (bench/tests unchanged)
        .config("spark.ui.enabled", os.environ.get("SPARK_UI_ENABLED", "false"))
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()
