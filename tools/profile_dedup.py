"""Stage-level A/B profiling for the dedup bench queries.

Run inside one Spark session (host noise makes isolated runs useless —
see memory note): warm up, then time each pipeline stage and variants.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from incubator_flink_spark.catalog import load
from incubator_flink_spark.operators import dedup

docs = load(spark, sf_dir, "documents")

# warm-up: JIT + codegen paths
docs.groupBy((F.col("doc_id") % 10).alias("g")).agg(F.count(F.lit(1))).collect()


def t(label, df):
    spark.catalog.clearCache()
    t0 = time.time()
    n = df.count()
    print(f"{label:40s} {time.time()-t0:7.3f}s  rows={n}")


# --- minhash stages ---
ds = dedup.doc_shingle_set(docs)
t("minhash: doc_shingle_set", ds)
t("minhash: signatures", dedup.minhash_signatures(docs))
t("minhash: full pipeline", dedup.minhash_lsh_pairs(docs))
t("minhash: full pipeline (2nd)", dedup.minhash_lsh_pairs(docs))

# --- simhash stages ---
t("simhash: signatures", dedup.simhash_signatures(docs))
t("simhash: full pipeline", dedup.simhash_pairs(docs))
t("simhash: full pipeline (2nd)", dedup.simhash_pairs(docs))
