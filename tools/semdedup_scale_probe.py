"""SemDeDup 10x scale probe: replicate the sf0.01 embeddings 10x (each
replica a near-dup of its original) and compare fixed k=8 against the
paper's k-proportional-to-n setting (k=80).  See ARCHITECTURE.md for the
measured numbers and the crossover analysis (assignment cost n*k vs
within-cluster pair cost n^2/k)."""

import sys, time
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from incubator_flink_spark import get_spark
from incubator_flink_spark.catalog import load
from incubator_flink_spark.operators.similarity import semdedup_kmeans
spark = get_spark("semdedup-probe")
e = load(spark, "/root/testdata/sf0.01", "embeddings")
# 10x replication with distinct ids and a tiny per-replica jitter so
# replicas are near-dups of their original (realistic dup mass)
rep = e
for i in range(1, 10):
    rep = rep.unionAll(
        e.select((F.col("vec_id") + 1000000 * i).alias("vec_id"),
                 F.transform("embedding", lambda x: x + F.lit(0.001 * i)).alias("embedding"),
                 "label"))
rep = rep.localCheckpoint()
base = e.localCheckpoint()
def run(df, k, label):
    t0 = time.time()
    n = semdedup_kmeans(df, 0.8, n_clusters=k, iters=3).count()
    print(label, f"k={k}", round(time.time()-t0,1), "s,", n, "group members")
run(base, 8, "1x")
run(rep, 8, "10x fixed-k")
run(rep, 80, "10x k-prop-n")
