from datalake_indexes_spark.sources.catalog import TESTDATA_LAKE_SPEC, LakeTableSpec
from datalake_indexes_spark.sources.readers import read_table, read_lake_folder

__all__ = ["TESTDATA_LAKE_SPEC", "LakeTableSpec", "read_table", "read_lake_folder"]
