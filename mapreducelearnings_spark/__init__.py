"""mapreducelearnings_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of aparnasharma285/MapReduceLearnings,
re-expressed Spark-first (DataFrame/Catalyst), plus an LLM-data-pipeline
layer (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale.
"""

from .catalog import TABLE_NAMES, TABLE_SCHEMAS, load_table
from .session import get_spark

__all__ = ["get_spark", "load_table", "TABLE_NAMES", "TABLE_SCHEMAS"]
