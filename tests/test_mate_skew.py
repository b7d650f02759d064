"""Hot-token skew in the MATE posting fetch (PLANS.md §3).

Measured finding this round (pyspark 4.1.2, local): AQE's skew-join DOES
split a planted hot-token SMJ when the join feeds a row-wise consumer
(``SortMergeJoin(skew=true)`` in the final plan) but is SKIPPED whenever an
aggregate shares the join's stage — which is exactly MATE's
``hits.groupBy(table_id).count()`` candidate cap.  Hence the explicit
salting path (``salted_probe_join``) for non-broadcastable inputs; these
tests pin (a) result parity with the broadcast path and (b) the structural
spread of a hot token across salt partitions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_indexes_spark.index.builder import build_index
from datalake_indexes_spark.operators.mate import MATE, salted_probe_join
from datalake_indexes_spark.sources.catalog import LakeTableSpec


def _hot_lake(spark, n_hot=2_000, n_tables=8):
    """A mini-lake where the token '0' dominates one column of every
    table — the degenerate-key regime of real lakes."""
    rows = []
    for t in range(n_tables):
        for r in range(n_hot // n_tables):
            rows.append((t * 10_000 + r, "0" if r % 2 else f"k{t}_{r}", f"v{t}_{r}"))
    df = spark.createDataFrame(rows, "pk long, key string, val string")
    specs, tables = {}, {}
    for t in range(n_tables):
        name = f"hot_{t}"
        specs[name] = LakeTableSpec(name, t, ("key", "val"), ("pk",))
        tables[name] = df.filter((F.col("pk") / 10_000).cast("int") == t)
    return build_index(spark, tables, specs, with_super_keys=False)


def test_salted_path_matches_broadcast_path(spark):
    """broadcast_threshold=0 forces the shuffle-join path and
    hot_token_threshold=100 makes the planted '0' qualify as hot; top-k
    and join maps must be identical to the broadcast plan's."""
    idx = _hot_lake(spark)
    probe = spark.createDataFrame(
        [(f"k3_{r}",) for r in range(1, 120, 2)] + [("0",)], "key string"
    )
    mate = MATE(idx)
    res_b = mate.join_search(probe, ["key"], k=5, input_order_by=["key"])
    res_s = mate.join_search(
        probe, ["key"], k=5, input_order_by=["key"],
        broadcast_threshold=0, n_salt=8, hot_token_threshold=100,
    )
    assert "0" in idx._hot_tokens[1]  # detection actually marked it hot
    assert sorted(map(tuple, res_b.top_k.collect())) == sorted(
        map(tuple, res_s.top_k.collect())
    )
    assert sorted(map(tuple, res_b.join_pairs.collect())) == sorted(
        map(tuple, res_s.join_pairs.collect())
    )


def test_salt_spreads_hot_token_across_partitions(spark):
    """Structural skew check: unsalted, every '0' hit lands in ONE shuffle
    partition; salted, the hot token occupies ~n_salt partitions and the
    max per-partition hit count drops accordingly.

    AQE's size-based coalescing (64 MB advisory, session.py) must be off
    for the OBSERVATION: this fixture's salted shuffle is a few KB, so
    AQE rightly merges its reducers back into one — at real scale a hot
    partition is GBs and never coalesces.  The property under test is
    the hash spread of the salt keys, not AQE's sizing."""
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key)
    spark.conf.set(coalesce_key, "false")
    try:
        idx = _hot_lake(spark, n_hot=4_000)
        inp = spark.createDataFrame([("0", 0)], "__q0 string, mate_row_id long")

        def partition_counts(df):
            return {
                r["pid"]: r["cnt"]
                for r in df.groupBy(F.spark_partition_id().alias("pid"))
                .agg(F.count(F.lit(1)).alias("cnt"))
                .collect()
            }

        unsalted = idx.cells.join(inp, idx.cells["tokenized"] == inp["__q0"])
        salted = salted_probe_join(idx.cells, inp, hot_tokens=["0"], n_salt=8)
        pc_u = partition_counts(unsalted)
        pc_s = partition_counts(salted)
        total = sum(pc_u.values())
        assert total == sum(pc_s.values()) > 0  # same hits, nothing lost
        assert len(pc_u) == 1  # the skew: one partition carries everything
        assert len(pc_s) >= 6  # xxhash64 salt spreads (8 salts, maybe collisions)
        assert max(pc_s.values()) <= total / 3  # no partition dominates
    finally:
        spark.conf.set(coalesce_key, prev)


def test_no_hot_tokens_means_plain_join(spark):
    """With an empty hot list the salted path IS the plain join — no
    replication explode, no salt column (guards the measured 2x cost of
    unconditional salting at sf0.1)."""
    idx = _hot_lake(spark)
    inp = spark.createDataFrame([("k3_1", 0)], "__q0 string, mate_row_id long")
    plan = salted_probe_join(idx.cells, inp, hot_tokens=[])._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" not in plan and "__salt" not in plan


def test_token_stats_artifact_roundtrip_feeds_salting(spark, tmp_path):
    """build_index(with_token_stats=True) persists the hot-token statistic
    with the index; a loaded index serves MATE's hot list from it with no
    lake re-scan (the 100 TB shape)."""
    import shutil

    idx = _hot_lake(spark)
    from datalake_indexes_spark.index.builder import token_stats_for
    from datalake_indexes_spark.index.lake_index import LakeIndex

    idx.token_stats = token_stats_for(idx.cells, threshold=100)
    work = str(tmp_path / "hotidx")
    idx.save(work)
    try:
        loaded = LakeIndex.load(spark, work)
        assert loaded.token_stats is not None
        mate = MATE(loaded)
        hot = mate._lake_hot_tokens(threshold=100)
        assert hot == ["0"]  # only the planted hot token qualifies
        # and the stats artifact respects a higher query-time threshold
        assert mate._lake_hot_tokens(threshold=10**9) == []
    finally:
        shutil.rmtree(work, ignore_errors=True)
