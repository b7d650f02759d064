"""datalake_indexes_spark — a PySpark-native data-lake discovery engine.

Re-expresses the capabilities of LUH-DBS/datalake_indexes (package ``maco``:
MATE multi-attribute joinability search, COCOA correlation-driven enrichment,
XASH-based duplicate detection) as idiomatic Spark DataFrame pipelines over a
Parquet-backed cell index, plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) that the
reference does not have.

Design notes
------------
- Everything is declarative DataFrame / Spark SQL; Catalyst handles pushdown,
  pruning and join selection.  Python UDFs are confined to the XASH family of
  hash functions (Arrow-batched pandas UDFs).
- The reference's PostgreSQL inverted index becomes the ``cells`` long-format
  DataFrame (one row per table cell); B-trees become partitioning + parquet
  min/max stats; its driver-side loops become joins/windows/aggregations.
"""

from datalake_indexes_spark.session import get_spark
from datalake_indexes_spark.index.builder import build_index
from datalake_indexes_spark.index.lake_index import LakeIndex
from datalake_indexes_spark.operators.mate import MATE
from datalake_indexes_spark.operators.cocoa import COCOA
from datalake_indexes_spark.operators.duplicates import DuplicateDetection

__all__ = [
    "get_spark",
    "build_index",
    "LakeIndex",
    "MATE",
    "COCOA",
    "DuplicateDetection",
]

__version__ = "0.1.0"
