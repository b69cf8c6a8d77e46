"""Scaling probe: time the curation/similarity operators at 1x and 10x
rows and report the wall-clock ratio (the thing that must stay near the
data growth for a plan to survive 100 TB).

Replication is salted so replicas don't collide: every document token is
interleaved with a replica tag (shingle sets of different replicas are
disjoint — the inverted index grows linearly, as fresh data would), and
embeddings get a small deterministic per-replica perturbation.

Usage: python tools/scale_probe.py [sf_dir] [replication]
Writes the replicated tables under /tmp/scale_probe/ and prints one line
per op: name, t_1x, t_Nx, ratio.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from incubator_flink_spark import get_spark
from incubator_flink_spark.catalog import load


def replicate_documents(spark, sf_dir: str, n: int, path: str):
    d = load(spark, sf_dir, "documents")
    reps = []
    for k in range(n):
        reps.append(
            d.select(
                (F.col("doc_id") + k * 1_000_000_000).alias("doc_id"),
                # prefix every token with a replica tag: shingle sets of
                # different replicas are disjoint while the within-replica
                # 3-gram structure (and so pairwise jaccard) is EXACTLY
                # preserved. (Interleaving tag tokens instead degrades
                # 3-gram shingling to unigram sharing and candidate pairs
                # explode — a data artifact, not an operator property.)
                F.regexp_replace(F.col("text"), r"(\S+)", f"q{k}z$1").alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionAll(r)
    out.write.mode("overwrite").parquet(path)


def replicate_embeddings(spark, sf_dir: str, n: int, path: str):
    e = load(spark, sf_dir, "embeddings")
    reps = []
    for k in range(n):
        reps.append(
            e.select(
                (F.col("vec_id") + k * 1_000_000_000).alias("vec_id"),
                # per-replica ±1 sign pattern per dimension: within-replica
                # cosines are exactly preserved (signs square away), while
                # cross-replica cosines are sign-scrambled toward 0 — so
                # near-pair density grows linearly with rows, as fresh
                # data's would. (An additive shift keeps replicas
                # correlated and pair counts explode quadratically.)
                F.transform(
                    F.col("embedding"),
                    # mod-11 first: a plain mod-2 of a linear form reduces
                    # to parity and collapses to two patterns
                    lambda x, i: x * (((F.lit(k * 37) + i * 13) % 11 % 2) * 2 - 1),
                ).alias("embedding"),
                "label",
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionAll(r)
    out.write.mode("overwrite").parquet(path)


def replicate_orders(spark, sf_dir: str, n: int, path: str):
    o = load(spark, sf_dir, "orders")
    reps = [
        o.withColumn("o_orderkey", F.col("o_orderkey") + k * 1_000_000_000) for k in range(n)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionAll(r)
    out.write.mode("overwrite").parquet(path)


def replicate_events(spark, sf_dir: str, n: int, path: str):
    e = load(spark, sf_dir, "events")
    reps = [
        e.withColumn("event_id", F.col("event_id") + k * 1_000_000_000).withColumn(
            "user_id", F.col("user_id") + k * 1_000_000_000
        )
        for k in range(n)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionAll(r)
    out.write.mode("overwrite").parquet(path)


def replicate_lineitem(spark, sf_dir: str, n: int, path: str):
    li = load(spark, sf_dir, "lineitem")
    reps = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + k * 1_000_000_000) for k in range(n)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionAll(r)
    out.write.mode("overwrite").parquet(path)


def copy_static(spark, sf_dir: str, base: str):
    """Dims that stay fixed while facts replicate (the realistic scale-up:
    customers/parts grow far slower than line items)."""
    for t in ("customer", "nation", "region", "supplier", "part"):
        load(spark, sf_dir, t).write.mode("overwrite").parquet(f"{base}/{t}.parquet")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("scale-probe")
    base = "/tmp/scale_probe"
    replicate_documents(spark, sf_dir, n, f"{base}/documents.parquet")
    replicate_embeddings(spark, sf_dir, n, f"{base}/embeddings.parquet")
    replicate_orders(spark, sf_dir, n, f"{base}/orders.parquet")
    replicate_events(spark, sf_dir, n, f"{base}/events.parquet")
    replicate_lineitem(spark, sf_dir, n, f"{base}/lineitem.parquet")
    copy_static(spark, sf_dir, base)

    from incubator_flink_spark.operators.dedup import (
        minhash_lsh_pairs,
        prefix_filter_pairs,
        simhash_pairs,
    )
    from incubator_flink_spark.operators.export import export_shards
    from incubator_flink_spark.operators.similarity import lsh_topk, near_pairs_lsh, semantic_dedup

    def docs(d):
        return spark.read.parquet(d + "/documents.parquet") if d.startswith("/tmp") else load(spark, d, "documents")

    def embs(d):
        return spark.read.parquet(d + "/embeddings.parquet") if d.startswith("/tmp") else load(spark, d, "embeddings")

    ops = {
        # exact All-Pairs/PPJoin threshold join: the candidate join runs on
        # the (1-t)-proportional prefix index, so t=0.8 should scale close
        # to the data and t=0.5 (half the index enters the join) marks the
        # low-t regime where the prefix approaches the full inverted index
        "prefix_filter_t05": lambda d: prefix_filter_pairs(docs(d), threshold=0.5).write.mode("overwrite").format("noop").save(),
        "prefix_filter_t08": lambda d: prefix_filter_pairs(docs(d), threshold=0.8).write.mode("overwrite").format("noop").save(),
        "minhash_lsh_pairs": lambda d: minhash_lsh_pairs(docs(d)).write.mode("overwrite").format("noop").save(),
        "simhash_pairs": lambda d: simhash_pairs(docs(d)).write.mode("overwrite").format("noop").save(),
        "near_pairs_lsh": lambda d: near_pairs_lsh(embs(d), 0.35).write.mode("overwrite").format("noop").save(),
        "semantic_dedup": lambda d: semantic_dedup(embs(d), 0.35).write.mode("overwrite").format("noop").save(),
        # near-dup regime, fixed (12,48) banding (the oracle-pinned config):
        # random-collision mass is n^2-proportional, so the 10x ratio is
        # expected to exceed the data growth — kept for contrast with the
        # size-tuned config below
        "near_pairs_lsh_t08": lambda d: near_pairs_lsh(embs(d), 0.8).write.mode("overwrite").format("noop").save(),
        # production setting: bits ~ log2(n) keeps candidates linear in n
        "near_pairs_t08_sized": lambda d: near_pairs_lsh(embs(d), 0.8, banding="sized").write.mode("overwrite").format("noop").save(),
        "semantic_dedup_t08_sized": lambda d: semantic_dedup(embs(d), 0.8, banding="sized").write.mode("overwrite").format("noop").save(),
        # fixed 20-query set (replica 0 only) so the ratio isolates corpus growth
        "lsh_topk_multiprobe": lambda d: lsh_topk(
            embs(d), embs(d).where(F.col("vec_id") < 20), 3, probe_bits=8
        ).write.mode("overwrite").format("noop").save(),
        "export_shards": lambda d: export_shards(docs(d), "/tmp/scale_probe/out_shards", 16, "doc_id"),
        # PQ ANN: fixed 20-query set (replica 0 only), corpus grows
        "pq_rerank_topk": lambda d: __import__(
            "incubator_flink_spark.operators.similarity", fromlist=["pq_rerank_topk"]
        ).pq_rerank_topk(
            embs(d), embs(d).where(F.col("vec_id") < 20), 5, shortlist=50
        ).write.mode("overwrite").format("noop").save(),
    }
    # registry queries run against the replicated dir as an sf_dir, so any
    # query can be ratio-tested without adapters
    from incubator_flink_spark.queries import REGISTRY

    for qname in (
        "quality_repetition",
        "tfidf_topk",
        "pii_scrub",
        "cdc_debezium_normalize",
        "window_tumble",
        "over_range_time",
        "span_dup_topk",
        "span_dup_doc_stats",
        "sequence_packing",
        "packing_stats",
        "word_pagerank",
        "word_triangles",
        "word_clustering_coeff",
        "fuzzy_word_pairs",
        "fuzzy_word_pairs_d2",
        "table_profile",
        "doc_chunking",
        "lm_perplexity",
        "chunk_pack_plan",
        "star_multichannel_cte",
        "star_channel_intersect",
        "star_date_offset_compare",
        "embedding_ivfpq_topk",
        "word_sssp",
        "incremental_dedup",
        "quality_linear_probe",
        "star_rollup_window",
        "star_cumulative_compare",
        "bm25_topk",
        "word_link_prediction",
        "word_label_propagation",
        "word_hits",
        "word_community_graph",
        "word_global_clustering",
        "word_vertex_metrics",
        "word_edge_metrics",
        "word_triadic_census",
        "word_avg_clustering",
        "star_channel_buckets",
        "star_yoy_customer",
        "star_monthly_deviation",
        "stratified_split",
        "split_balance",
        "length_band_filter",
        "token_histogram",
        "line_dedup_rewrite",
        "boilerplate_line_topk",
        "bpe_pair_counts",
        "bpe_train_merges",
        "cms_heavy_hitters",
        "hll_distinct_shingles",
        "bloom_blocklist_filter",
        "star_returns_net",
        "star_first_purchase_cohort",
        "star_multi_exists_profile",
        "perplexity_buckets",
        "bpe_encode_corpus",
        "zorder_layout_stats",
        "zipf_slope",
        "star_return_rebuy",
        "mixture_temperature_sample",
        "source_drift",
        "retention_matrix",
        "part_copurchase_kcore",
        "collocations_pmi",
        "langid_confusion",
        "star_rfm_segments",
        "star_basket_rules",
        "label_centroid_similarity",
        "star_growth_compare",
        "star_weekly_compare",
        "star_return_rate_rank",
        "embedding_ivfpq_ingest",
        "star_repeat_purchase_chain",
        "star_channel_exclusive",
        "star_channel_returns_rollup",
        "cep_skip_to_first",
        "bitext_margin_mining",
        "hybrid_rrf_topk",
        "source_cap_sample",
        "word_personalized_pagerank",
        "contrastive_triplets",
        "curation_funnel",
        "attribution_last_touch",
        "timeseries_gapfill",
        "event_outliers_mad",
        "winnowing_pairs",
        "record_linkage_blocked",
        "word_closeness_landmarks",
        "subquery_above_group_avg",
        "event_transition_matrix",
        "compaction_plan",
        "export_manifest",
        "conversion_latency_cohorts",
        "rake_keyphrases",
        "mv_incremental_orders",
        "mv_affected_group_max",
        "scd2_dimension_build",
        "part_copurchase_ktruss",
        "embedding_top_pc",
        "asof_nearest_tolerance",
        "star_two_hop_exists",
        "weighted_sample_es",
        "embedding_abtt_stats",
        "cep_all_rows_funnel",
        "curriculum_order",
        "embedding_top2_pc",
    ):
        ops[qname] = (
            lambda d, f=REGISTRY[qname].fn: f(spark, d).write.mode("overwrite").format("noop").save()
        )
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    print(f"{'op':24s} {'t_1x':>7s} {'t_' + str(n) + 'x':>7s} {'ratio':>6s}")
    for name, fn in ops.items():
        if only is not None and name not in only:
            continue
        fn(sf_dir)  # warm codegen on the small side
        spark.catalog.clearCache()
        t0 = time.time()
        fn(sf_dir)
        t1 = time.time() - t0
        spark.catalog.clearCache()
        t0 = time.time()
        fn(base)
        tn = time.time() - t0
        print(f"{name:24s} {t1:7.2f} {tn:7.2f} {tn / t1:6.1f}")


if __name__ == "__main__":
    main()
