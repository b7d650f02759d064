"""Z-order layout: Morton-key correctness and the measurable pruning
payoff — footer min/max ranges of a z-clustered write must make 2-D box
queries skip several times more files than a linear sort of the same
data."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

from datalake_indexes_spark.index.zorder import (
    interleave_bits,
    save_zordered,
    with_zorder_key,
)


@pytest.mark.spark
def test_interleave_bits_known_values(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (3, 5)], "x long, y long"
    )
    out = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", interleave_bits([F.col("x"), F.col("y")], bits=4).alias("z")
        ).collect()
    }
    # bit i of x -> position 2i, bit i of y -> position 2i+1
    assert out[(0, 0)] == 0
    assert out[(1, 0)] == 1
    assert out[(0, 1)] == 2
    assert out[(1, 1)] == 3
    # x=3 (0b11) -> 0b0101; y=5 (0b101) -> 0b100010; z = 0b100111 = 39
    assert out[(3, 5)] == 39


@pytest.mark.spark
def test_zorder_key_is_monotone_in_buckets(spark):
    df = spark.createDataFrame([(i, i % 7) for i in range(100)], "a long, b long")
    keyed = with_zorder_key(df, ["a", "b"], bits=8)
    assert keyed.filter(F.col("__z") < 0).count() == 0
    # equal inputs -> equal keys (pure function)
    again = with_zorder_key(df, ["a", "b"], bits=8)
    assert (
        keyed.join(again, ["a", "b"])
        .filter(keyed["__z"] != again["__z"])
        .count()
        == 0
    )


def _file_ranges(path: str, cols: list[str]):
    """Per-file (min, max) of each column from the parquet footers."""
    con = duckdb.connect()
    ranges = {}
    for f in glob.glob(os.path.join(path, "*.parquet")):
        row = con.execute(
            "SELECT "
            + ", ".join(f"min({c}), max({c})" for c in cols)
            + f" FROM read_parquet('{f}')"
        ).fetchone()
        ranges[f] = [(row[2 * i], row[2 * i + 1]) for i in range(len(cols))]
    return ranges


def _files_hit(ranges, boxes):
    """How many files a footer-pruning reader must open per box query."""
    hits = []
    for box in boxes:
        n = 0
        for rng in ranges.values():
            if all(not (hi < b_lo or lo > b_hi) for (lo, hi), (b_lo, b_hi) in zip(rng, box)):
                n += 1
        hits.append(n)
    return hits


@pytest.mark.spark
def test_box_query_pruning_beats_linear_sort(spark):
    rows = [(i % 1000, (i * 7919) % 1000) for i in range(40_000)]
    df = spark.createDataFrame(rows, "x long, y long")
    work = tempfile.mkdtemp(prefix="zorder_")
    try:
        zpath, lpath = f"{work}/z", f"{work}/linear"
        save_zordered(df, zpath, ["x", "y"], bits=10, n_files=16)
        (
            df.repartitionByRange(16, "x")
            .sortWithinPartitions("x")
            .write.mode("overwrite")
            .parquet(lpath)
        )
        zr = _file_ranges(zpath, ["x", "y"])
        lr = _file_ranges(lpath, ["x", "y"])
        assert len(zr) >= 8 and len(lr) >= 8
        # the workload a 1-D sort cannot serve: predicates on the SECOND
        # column (y-only) and mixed 2-D boxes.  A linear x-sort reads
        # EVERY file for a y-only predicate (each file spans all of y);
        # z-order bounds both dims per file.
        y_only = [[(0, 999), (b, b + 60)] for b in (0, 256, 512, 768, 939)]
        two_d = [
            [(a, a + 250), (b, b + 60)]
            for a, b in [(0, 0), (300, 700), (640, 128), (700, 900)]
        ]
        z_y, l_y = _files_hit(zr, y_only), _files_hit(lr, y_only)
        # linear: y-only touches every file; z: a strict subset
        assert all(h == len(lr) for h in l_y), l_y
        assert max(z_y) <= len(zr) // 2, z_y
        z_all = _files_hit(zr, y_only + two_d)
        l_all = _files_hit(lr, y_only + two_d)
        assert sum(z_all) < sum(l_all), (z_all, l_all)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@pytest.mark.spark
def test_interleave_fuzz_against_python_reference(spark):
    import random

    rng = random.Random(1234)
    bits = 14
    rows = [
        (rng.randint(0, (1 << bits) - 1), rng.randint(0, (1 << bits) - 1))
        for _ in range(300)
    ]

    def ref(x, y):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", interleave_bits([F.col("x"), F.col("y")], bits=bits).alias("z")
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == ref(x, y), (x, y)


@pytest.mark.spark
def test_interleave_three_columns(spark):
    df = spark.createDataFrame([(1, 1, 1), (2, 0, 4)], "x long, y long, w long")
    out = {
        (r["x"], r["y"], r["w"]): r["z"]
        for r in df.select(
            "x", "y", "w",
            interleave_bits([F.col("x"), F.col("y"), F.col("w")], bits=3).alias("z"),
        ).collect()
    }
    # (1,1,1) -> bits at positions 0,1,2 -> 0b111 = 7
    assert out[(1, 1, 1)] == 7
    # x=2 -> bit1 of x at pos 3*1+0 = 3 -> 8; w=4 -> bit2 of w at 3*2+2 = 8 -> 256
    assert out[(2, 0, 4)] == 8 + 256
