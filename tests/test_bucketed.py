"""Bucketed co-located join tests: the persistent-shuffle-elimination
strategy for 100TB fact-fact joins."""

from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load
from incubator_flink_spark.plans import audit_plan
from incubator_flink_spark.sources.bucketed import bucketed_join, create_bucketed

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark):
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
    od = load(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice", "o_orderdate"
    )
    create_bucketed(li, "b_lineitem", "l_orderkey", 8)
    create_bucketed(od, "b_orders", "l_orderkey", 8)
    joined = bucketed_join(spark, "b_lineitem", "b_orders", "l_orderkey")
    # disable auto-broadcast so the co-located SMJ path is what's planned
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined2 = bucketed_join(spark, "b_lineitem", "b_orders", "l_orderkey")
        rep = audit_plan(joined2)
        assert rep.sort_merge_joins >= 1
        assert rep.exchanges == 0, f"bucketed join must be exchange-free:\n{rep.raw[:800]}"
        # correctness: equals the plain join
        plain = li.join(od, "l_orderkey").count()
        assert joined2.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_incremental_dedup_reference_as_bucketed_index(spark):
    """Steady-state ingest shape: the reference corpus's band table lives
    as a bucketed table on the band key, so each ingest batch's
    candidate join shuffles ONLY the new slice — the reference side
    reads pre-bucketed with no exchange.  Plan-asserted (one exchange,
    the new side), result-asserted against the unbucketed join."""
    from incubator_flink_spark.functions.hashing import NUM_MINHASHES
    from incubator_flink_spark.operators.dedup import minhash_signatures

    d = load(spark, SF, "documents")
    ref = d.where(F.col("doc_id") % 3 == 0)
    new = d.where(F.col("doc_id") % 3 != 0)

    def bands_long(docs, out_id):
        # band index folded INTO the hashed key so the candidate join has
        # exactly one key = the bucket column (a cross-band hash collision
        # can only add a candidate; the verify stage is exact)
        sig = minhash_signatures(docs)
        cols = [
            F.xxhash64(F.lit(b), F.col(f"minhash_{b}")) for b in range(NUM_MINHASHES)
        ]
        return sig.select(
            F.col("doc_id").alias(out_id), F.explode(F.array(*cols)).alias("band_key")
        )

    create_bucketed(bands_long(ref, "ref_id"), "b_ref_bands", "band_key", 8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        nb = bands_long(new, "new_id")
        cand = (
            nb.join(spark.table("b_ref_bands"), "band_key")
            .select("new_id", "ref_id")
            .distinct()
        )
        rep = audit_plan(cand)
        assert rep.sort_merge_joins + rep.shuffled_hash_joins >= 1
        # the reference side scans its buckets directly
        assert "Bucketed: true" in rep.raw or "SelectedBucketsCount" in rep.raw
        plain = (
            nb.join(bands_long(ref, "ref_id"), "band_key")
            .select("new_id", "ref_id")
            .distinct()
        )
        assert {(r.new_id, r.ref_id) for r in cand.collect()} == {
            (r.new_id, r.ref_id) for r in plain.collect()
        }
        # the bucketed reference contributes NO exchange: its whole
        # sign-and-shuffle pipeline (spread, explode, signature agg, join
        # repartition) is replaced by the bucket-aligned scan, so the plan
        # has strictly fewer exchanges than the recompute-both-sides join
        rep_plain = audit_plan(plain)
        assert rep.exchanges < rep_plain.exchanges, (
            f"bucketed {rep.exchanges} vs plain {rep_plain.exchanges}"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_ref_bands")
