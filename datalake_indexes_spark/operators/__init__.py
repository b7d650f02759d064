from datalake_indexes_spark.operators.mate import MATE
from datalake_indexes_spark.operators.cocoa import COCOA
from datalake_indexes_spark.operators.duplicates import DuplicateDetection

__all__ = ["MATE", "COCOA", "DuplicateDetection"]
