"""User-facing compatibility facade mirroring the reference's Python API
(flink-python/pyflink/table/table.py and pyflink/datastream/data_stream.py
— SURVEY.md §2.13): a thin Table/TableEnvironment/DataStream layer over
DataFrames. The DataFrame/SQL API remains the primary surface; this
facade exists so code written against the reference ports mechanically.
"""

from incubator_flink_spark.api.table import Table, TableEnvironment
from incubator_flink_spark.api.datastream import DataStream, StreamExecutionEnvironment

__all__ = ["Table", "TableEnvironment", "DataStream", "StreamExecutionEnvironment"]
