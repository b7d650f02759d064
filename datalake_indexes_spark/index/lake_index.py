"""LakeIndex — the engine's index tables as DataFrames.

Replaces the reference's four PostgreSQL tables (``maco/data_handler.py:33-54``):

- ``cells``          (table_id int, col_id int, row_id long, tokenized string)
- ``row_keys``       (table_id int, row_id long, super_key_hi long, super_key_lo long)
- ``column_headers`` (table_id int, col_id int, header string, header_tokenized string)
- ``table_info``     (table_id int, dataset_name string, max_row_id long, max_col_id int)

The reference denormalizes the 128-bit super key onto every cell row
(data_handler.py:296-303); we keep it normalized per row in ``row_keys`` —
cells stay narrow for scan speed and the key joins back on (table_id, row_id)
when MATE needs it.

Physical layout for scale (see ``save``): ``cells`` is written partitioned by
``table_id`` and sorted by ``tokenized`` within each partition, so (a)
row-fetch probes prune partitions and (b) token probes prune parquet row
groups via min/max stats — this is the Spark replacement for the reference's
two B-trees (data_handler.py:205-230).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class LakeIndex:
    cells: DataFrame
    row_keys: DataFrame
    column_headers: DataFrame
    table_info: DataFrame
    # cocoa_index precompute (data_handler.py:50 is_numeric): per-column
    # numeric-ness, computed once at index time so query-time correlation
    # never re-aggregates the lake for it
    col_flags: DataFrame | None = None
    # optional denormalized view: cells + (super_key_hi, super_key_lo) per
    # row — the reference's physical layout (data_handler.py:296-303).
    # MATE's posting fetch uses it when present so the hit set (which can
    # be an order of magnitude larger than the lake) never joins row_keys
    cells_keyed: DataFrame | None = None

    def cache(self) -> "LakeIndex":
        self.cells = self.cells.cache()
        self.row_keys = self.row_keys.cache()
        self.column_headers = self.column_headers.cache()
        self.table_info = self.table_info.cache()
        if self.col_flags is not None:
            self.col_flags = self.col_flags.cache()
        if self.cells_keyed is not None:
            self.cells_keyed = self.cells_keyed.cache()
        return self

    def keyed_cells(self) -> DataFrame:
        """Cells with per-row super keys: the materialized view when built,
        else the join (one co-keyed lake-sized join, still far cheaper than
        joining an exploded hit set against row_keys)."""
        if self.cells_keyed is not None:
            return self.cells_keyed
        return self.cells.join(self.row_keys, ["table_id", "row_id"])

    def save(self, path: str, mode: str = "overwrite") -> None:
        """Materialize the index (S7/S8 — replaces COPY + B-tree builds)."""
        (
            self.cells.repartition("table_id")
            .sortWithinPartitions("tokenized")
            .write.mode(mode)
            .partitionBy("table_id")
            .parquet(os.path.join(path, "cells"))
        )
        self.row_keys.write.mode(mode).partitionBy("table_id").parquet(
            os.path.join(path, "row_keys")
        )
        self.column_headers.write.mode(mode).parquet(os.path.join(path, "column_headers"))
        self.table_info.write.mode(mode).parquet(os.path.join(path, "table_info"))
        if self.col_flags is not None:
            self.col_flags.write.mode(mode).parquet(os.path.join(path, "col_flags"))

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LakeIndex":
        flags_path = os.path.join(path, "col_flags")
        return cls(
            cells=spark.read.parquet(os.path.join(path, "cells")),
            row_keys=spark.read.parquet(os.path.join(path, "row_keys")),
            column_headers=spark.read.parquet(os.path.join(path, "column_headers")),
            table_info=spark.read.parquet(os.path.join(path, "table_info")),
            col_flags=spark.read.parquet(flags_path) if os.path.isdir(flags_path) else None,
        )

    def drop(self, path: str) -> None:
        """S9 — index teardown."""
        import shutil

        shutil.rmtree(path, ignore_errors=True)
