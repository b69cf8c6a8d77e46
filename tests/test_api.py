"""API facade tests (reference: PyFlink Table/DataStream surface —
SURVEY.md §2.13)."""

import pandas as pd
from pyspark.sql import functions as F

from incubator_flink_spark.api import DataStream, StreamExecutionEnvironment, Table, TableEnvironment

SF = "/root/testdata/sf0.001"


def test_table_group_by_select(spark):
    t_env = TableEnvironment(spark, SF)
    result = (
        t_env.from_path("orders")
        .filter("o_totalprice > 100000")
        .group_by("o_orderstatus")
        .select("o_orderstatus", "count(1) AS cnt", "round(sum(o_totalprice), 2) AS total")
        .order_by("o_orderstatus")
        .execute()
    )
    assert len(result) >= 1 and all(r.cnt > 0 for r in result)


def test_table_join_setops_limit(spark):
    t_env = TableEnvironment(spark, SF)
    nation = t_env.from_path("nation")
    region = t_env.from_path("region")
    joined = nation.join(region, "n_regionkey = r_regionkey").select("n_name", "r_name")
    assert len(joined.execute()) == 25
    u = nation.select("n_regionkey").union(nation.select("n_regionkey"))
    assert len(u.execute()) == 5
    assert len(nation.order_by("n_nationkey").offset(5).fetch(10).execute()) == 10


def test_table_sql_and_views(spark):
    t_env = TableEnvironment(spark, SF)
    t_env.create_temporary_view("api_nation", t_env.from_path("nation"))
    rows = t_env.sql_query("SELECT count(*) AS c FROM api_nation").execute()
    assert rows[0].c == 25


def test_table_map_and_flat_aggregate(spark):
    t_env = TableEnvironment(spark, SF)

    def double_price(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": pdf["o_orderkey"], "p2": pdf["o_totalprice"] * 2})

    t = t_env.from_path("orders").fetch(100).map(double_price, "k BIGINT, p2 DOUBLE")
    assert len(t.execute()) == 100

    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.nlargest(2, "o_totalprice")[["o_custkey", "o_totalprice"]]

    t2 = t_env.from_path("orders").flat_aggregate(["o_custkey"], top2, "o_custkey BIGINT, o_totalprice DOUBLE")
    counts = t2.to_df().groupBy("o_custkey").count().agg(F.max("count")).first()[0]
    assert counts <= 2


def test_datastream_key_by_reduce_window(spark):
    env = StreamExecutionEnvironment(spark)
    from incubator_flink_spark.catalog import load

    ds = DataStream(load(spark, SF, "events"))
    reduced = ds.filter("event_type = 'click'").key_by("user_id").reduce(
        F.count(F.lit(1)).alias("clicks")
    )
    assert all(r.clicks > 0 for r in reduced.execute_and_collect())

    windowed = (
        ds.key_by("user_id")
        .tumbling_window("ts", 3600)
        .aggregate(F.count(F.lit(1)).alias("cnt"))
    )
    assert len(windowed.execute_and_collect()) > 0

    seq = env.from_sequence(1, 10).key_by("value").reduce(F.count(F.lit(1)).alias("c"))
    assert len(seq.execute_and_collect()) == 10


def test_datastream_process_function(spark):
    from incubator_flink_spark.catalog import load

    ds = DataStream(load(spark, SF, "events"))

    def session_gaps(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        gaps = pdf["ts"].diff().dt.total_seconds().fillna(0)
        return pd.DataFrame({"user_id": pdf["user_id"].iloc[:1], "max_gap": [float(gaps.max())]})

    out = ds.key_by("user_id").process(session_gaps, "user_id BIGINT, max_gap DOUBLE")
    rows = out.execute_and_collect()
    n_users = load(spark, SF, "events").select("user_id").distinct().count()
    assert len(rows) == n_users and all(r.max_gap >= 0 for r in rows)
