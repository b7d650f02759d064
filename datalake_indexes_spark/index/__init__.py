from datalake_indexes_spark.index.builder import build_index, with_global_row_number
from datalake_indexes_spark.index.lake_index import LakeIndex

__all__ = ["build_index", "with_global_row_number", "LakeIndex"]
