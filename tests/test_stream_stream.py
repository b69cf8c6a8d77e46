"""Stream-stream join, windowed coGroup, and UDF-surface tests
(SURVEY.md §2.3 StreamingJoinOperator / CoGroupedStreams, §2.12 UDF/UDAF)."""

import tempfile

import pandas as pd
from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load
from incubator_flink_spark.operators.windows import window_cogroup
from incubator_flink_spark.streaming.source import replay_table
from tests.conftest import drain_stream

SF = "/root/testdata/sf0.001"


def test_stream_stream_interval_join_matches_batch(spark):
    # two watermarked streams joined with equi-key + time-bound residual —
    # the canonical Spark stream-stream join, = reference interval join
    d1, d2 = tempfile.mkdtemp(), tempfile.mkdtemp()
    clicks = (
        replay_table(spark, SF, "events", d1, n_files=3)
        .where(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), F.col("user_id"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "10 minutes")
    )
    buys = (
        replay_table(spark, SF, "events", d2, n_files=3)
        .where(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("buy_id"), F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts"))
        .withWatermark("b_ts", "10 minutes")
    )
    joined = clicks.join(
        buys,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("b_ts") >= F.col("c_ts"))
        & (F.col("b_ts") <= F.col("c_ts") + F.expr("INTERVAL 600 SECOND")),
    )
    got = set()
    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(lambda b, i: got.update((r.click_id, r.buy_id) for r in b.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp())
        .start()
    )
    drain_stream(q)

    e = load(spark, SF, "events")
    a = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    b = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("buy_id"), F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts")
    )
    expected = {
        (r.click_id, r.buy_id)
        for r in a.join(
            b,
            (F.col("user_id") == F.col("b_user"))
            & (F.col("b_ts") >= F.col("c_ts"))
            & (F.col("b_ts") <= F.col("c_ts") + F.expr("INTERVAL 600 SECOND")),
        ).collect()
    }
    assert got == expected and len(expected) > 0


def test_window_cogroup_full_outer_contract(spark):
    e = load(spark, SF, "events")
    views = e.where(F.col("event_type") == "view")
    clicks = e.where(F.col("event_type") == "click")

    def fn(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        side = lpdf if not lpdf.empty else rpdf
        return pd.DataFrame(
            {
                "window_start": side["window_start"].iloc[:1],
                "user_id": side["user_id"].iloc[:1],
                "n_views": [len(lpdf)],
                "n_clicks": [len(rpdf)],
            }
        )

    out = window_cogroup(
        views, clicks, ["user_id"], "ts", 3600, fn,
        "window_start TIMESTAMP, user_id BIGINT, n_views BIGINT, n_clicks BIGINT",
    )
    rows = out.collect()
    assert rows
    # one-sided groups must appear (full-outer contract)
    assert any(r.n_views == 0 for r in rows) and any(r.n_clicks == 0 for r in rows)
    total_views = sum(r.n_views for r in rows)
    assert total_views == views.count()


def test_udf_surface(spark):
    # §2.12: ScalarFunction → udf / pandas_udf; AggregateFunction →
    # pandas_udf GROUPED_AGG. All three wired and numerically consistent.
    from pyspark.sql.functions import pandas_udf, udf

    @udf("double")
    def plain_markup(x):
        return x * 1.1 if x is not None else None

    @pandas_udf("double")
    def vectorized_markup(s: pd.Series) -> pd.Series:
        return s * 1.1

    @pandas_udf("double")
    def agg_total(s: pd.Series) -> float:
        return float(s.sum())

    o = load(spark, SF, "orders").limit(500)
    a = o.select(plain_markup("o_totalprice").alias("m")).agg(F.round(F.sum("m"), 2)).first()[0]
    b = o.select(vectorized_markup("o_totalprice").alias("m")).agg(F.round(F.sum("m"), 2)).first()[0]
    assert abs(a - b) < 0.01
    g = o.groupBy("o_orderstatus").agg(agg_total("o_totalprice").alias("t"))
    ref = o.groupBy("o_orderstatus").agg(F.sum("o_totalprice").alias("t"))
    got = {r.o_orderstatus: round(r.t, 6) for r in g.collect()}
    exp = {r.o_orderstatus: round(r.t, 6) for r in ref.collect()}
    assert got == exp
