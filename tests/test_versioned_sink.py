"""Snapshot-versioned index sink: atomic pointer flip, crash isolation,
time travel, vacuum."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from datalake_indexes_spark.index.builder import build_index
from datalake_indexes_spark.index.lake_index import LakeIndex
from datalake_indexes_spark.sources.catalog import TESTDATA_LAKE_SPEC


@pytest.fixture(scope="module")
def small_index(spark, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return build_index(
        spark, {"nation": nation}, {"nation": TESTDATA_LAKE_SPEC["nation"]}
    )


def test_versioned_save_load_roundtrip(spark, small_index):
    work = tempfile.mkdtemp(prefix="vsink_")
    try:
        v0 = small_index.save_version(work)
        assert v0 == 0
        assert LakeIndex.current_version(work) == 0
        loaded = LakeIndex.load(spark, work)
        assert loaded.cells.count() == small_index.cells.count()

        v1 = small_index.save_version(work)
        assert v1 == 1 and LakeIndex.current_version(work) == 1
        # time travel: the previous snapshot is still readable
        old = LakeIndex.load(spark, work, version=0)
        assert old.cells.count() == loaded.cells.count()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_crashed_writer_leaves_current_snapshot_live(spark, small_index):
    """A version directory without a pointer flip (writer died mid-commit)
    must be invisible to readers and not corrupt the live snapshot."""
    work = tempfile.mkdtemp(prefix="vsinkcrash_")
    try:
        small_index.save_version(work)
        n = LakeIndex.load(spark, work).cells.count()
        # simulate a crash: v1 data written (partially — just a stray dir),
        # _CURRENT never flipped
        os.makedirs(os.path.join(work, "_versions", "v1", "cells"))
        assert LakeIndex.current_version(work) == 0
        assert LakeIndex.load(spark, work).cells.count() == n
        # the next successful commit supersedes the debris
        v = small_index.save_version(work)
        assert v == 2
        assert LakeIndex.load(spark, work).cells.count() == n
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_vacuum_keeps_current(spark, small_index):
    work = tempfile.mkdtemp(prefix="vsinkvac_")
    try:
        for _ in range(3):
            small_index.save_version(work)
        removed = LakeIndex.vacuum(work, keep=1)
        assert removed == [0, 1]
        assert LakeIndex.current_version(work) == 2
        assert LakeIndex.load(spark, work).cells.count() > 0
        with pytest.raises(Exception):
            LakeIndex.load(spark, work, version=0).cells.count()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_legacy_direct_layout_still_loads(spark, small_index):
    work = tempfile.mkdtemp(prefix="vsinklegacy_")
    try:
        small_index.save(work)  # non-transactional direct layout
        assert LakeIndex.current_version(work) is None
        assert LakeIndex.load(spark, work).cells.count() == small_index.cells.count()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_vacuum_with_time_traveled_current(spark, small_index):
    """_CURRENT parked on a NON-maximal version (after time travel) must
    never cause newer snapshots to be dropped: keep-set = newest `keep`
    versions ∪ current."""
    import os

    work = tempfile.mkdtemp(prefix="vsinkvac2_")
    try:
        for _ in range(3):
            small_index.save_version(work)  # v0, v1, v2
        # time-travel the pointer back to v1
        with open(os.path.join(work, "_CURRENT"), "w") as fh:
            fh.write("1")
        removed = LakeIndex.vacuum(work, keep=1)
        assert removed == [0]  # v1 (current) and v2 (newest) both survive
        assert LakeIndex.load(spark, work, version=2).cells.count() > 0
        assert LakeIndex.load(spark, work).cells.count() > 0  # current=v1
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_diff_rows_reports_exact_cell_edits(spark, small_index):
    """diff_versions says WHICH table changed; diff_rows shows the exact
    cells: one edited value surfaces as one removed + one added row, and
    an appended row as its width in added cells."""
    work = tempfile.mkdtemp(prefix="diffrows_")
    try:
        small_index.save_version(work)  # v0
        edited = LakeIndex(
            cells=small_index.cells.withColumn(
                "tokenized",
                F.when(
                    (F.col("row_id") == 0) & (F.col("col_id") == 1),
                    F.lit("renamed nation"),
                ).otherwise(F.col("tokenized")),
            ),
            row_keys=small_index.row_keys,
            column_headers=small_index.column_headers,
            table_info=small_index.table_info,
            col_flags=small_index.col_flags,
        )
        edited.save_version(work)  # v1
        out = LakeIndex.diff_rows(spark, work, 0, 1).collect()
        changes = {(r.change, r.col_id, r.row_id) for r in out}
        assert len(out) == 2
        assert ("added", 1, 0) in changes and ("removed", 1, 0) in changes
        added_vals = {r.tokenized for r in out if r.change == "added"}
        assert added_vals == {"renamed nation"}
        # table_id pruning path returns the same rows
        tid = out[0].table_id
        pruned = LakeIndex.diff_rows(spark, work, 0, 1, table_id=tid).count()
        assert pruned == 2
        # no-change diff is empty
        assert LakeIndex.diff_rows(spark, work, 1, 1).count() == 0
    finally:
        shutil.rmtree(work, ignore_errors=True)
