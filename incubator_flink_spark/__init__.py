"""incubator_flink_spark — a PySpark-native analytics engine with the query
capabilities of the reference stream processor (an Apache Flink 1.14 fork).

Architecture: DataFrame/Catalyst-first. Batch SQL surface is expressed as
declarative DataFrame plans (Catalyst supplies hash/sort-merge/broadcast
joins, partial aggregation, whole-stage codegen, AQE); streaming is
Structured Streaming with watermarks; custom operators the built-ins lack
(cumulate windows, as-of/temporal joins, streaming top-n, minhash/simhash
dedup, ANN search) live in ``operators/`` as compositions of DataFrame ops
or Arrow-batched pandas UDFs.

Modules:
- ``session``   SparkSession factory with scale-oriented defaults
- ``catalog``   parquet table loading / temp-view registration
- ``queries``   the operator-coverage query registry (Spark + DuckDB oracle)
- ``operators`` reusable custom operators (windows, asof, dedup, topn, ...)
- ``functions`` Flink-name compat layer + text/hash function kits
- ``streaming`` Structured Streaming helpers and stateful operators
"""

from incubator_flink_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
