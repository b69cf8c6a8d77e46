"""DDL layer tests (reference: SqlCreateTable/SqlWatermark DDL surface)."""

import pytest
from pyspark.sql import functions as F

from incubator_flink_spark.sources.ddl import execute_ddl, parse_create_table

SF = "/root/testdata/sf0.001"


DDL = f"""
CREATE TABLE my_events (
  event_id BIGINT,
  ts TIMESTAMP,
  user_id BIGINT,
  event_type STRING,
  value DOUBLE,
  props STRING,
  value_cents AS CAST(value * 100 AS BIGINT),
  PRIMARY KEY (event_id) NOT ENFORCED,
  WATERMARK FOR ts AS ts - INTERVAL '30' SECOND
) WITH (
  'connector' = 'filesystem',
  'path' = '{SF}/events.parquet',
  'format' = 'parquet'
)
"""


def test_parse_create_table():
    t = parse_create_table(DDL)
    assert t.name == "my_events"
    assert ("event_id", "BIGINT") in t.columns and len(t.columns) == 6
    assert t.computed == [("value_cents", "CAST(value * 100 AS BIGINT)")]
    assert t.watermark == ("ts", 30)
    assert t.primary_key == ["event_id"]
    assert t.options["connector"] == "filesystem"


def test_execute_ddl_batch_registers_view(spark):
    # parquet supplies the schema; DDL columns are declarative (as in the
    # reference, where the connector validates them)
    df = execute_ddl(spark, DDL)
    assert df.count() == 1000
    assert "value_cents" in df.columns
    row = spark.sql("SELECT value, value_cents FROM my_events ORDER BY event_id LIMIT 1").first()
    assert row.value_cents == int(round(row.value * 100))


def test_execute_ddl_streaming_with_watermark(spark):
    ddl = DDL.replace("'format' = 'parquet'", "'format' = 'parquet',\n  'mode' = 'streaming'")
    df = execute_ddl(spark, ddl)
    assert df.isStreaming
    # watermark node present in the logical plan
    assert "EventTimeWatermark" in df._jdf.queryExecution().logical().toString()


def test_execute_ddl_datagen(spark):
    df = execute_ddl(
        spark,
        "CREATE TABLE gen (id BIGINT, timestamp TIMESTAMP, value DOUBLE) "
        "WITH ('connector' = 'datagen', 'number-of-rows' = '25')",
    )
    assert df.count() == 25


def test_execute_ddl_rejects_unknown_connector(spark):
    with pytest.raises(ValueError, match="unsupported connector"):
        execute_ddl(spark, "CREATE TABLE t (a INT) WITH ('connector' = 'kinesis')")


def test_execute_sql_create_insert_select_lifecycle(spark, tmp_path):
    """The reference's flagship SQL lifecycle (executeSql: CREATE TABLE
    ... WITH -> INSERT INTO sink SELECT -> query the sink): the insert
    writes through the filesystem connector and the registered view
    refreshes, INSERT OVERWRITE replaces, INSERT INTO appends."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    src = str(tmp_path / "src_tbl")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 5.0), (3, "c", 20.0)], "id long, s string, v double"
    ).write.parquet(src)
    sink = str(tmp_path / "sink_tbl")
    env.execute_sql(f"""
        CREATE TABLE src_t (id BIGINT, s STRING, v DOUBLE)
        WITH ('connector' = 'filesystem', 'path' = '{src}', 'format' = 'parquet')
    """)
    env.execute_sql(f"""
        CREATE TABLE sink_t (id BIGINT, total DOUBLE)
        WITH ('connector' = 'filesystem', 'path' = '{sink}', 'format' = 'parquet')
    """)
    assert env.execute_sql("INSERT INTO sink_t SELECT id, v * 2 FROM src_t WHERE v >= 10") == []
    rows = {r.id: r.total for r in env.execute_sql("SELECT id, total FROM sink_t ORDER BY id")}
    assert rows == {1: 20.0, 3: 40.0}
    # OVERWRITE replaces the table contents
    env.execute_sql("INSERT OVERWRITE sink_t SELECT id, v FROM src_t WHERE id = 2")
    rows = {r.id: r.total for r in env.execute_sql("SELECT id, total FROM sink_t")}
    assert rows == {2: 5.0}
    # plain INSERT INTO appends
    env.execute_sql("INSERT INTO sink_t SELECT id, v FROM src_t WHERE id = 1")
    assert env.execute_sql("SELECT COUNT(*) AS n FROM sink_t")[0].n == 2


def test_execute_sql_insert_errors(spark, tmp_path):
    import pytest

    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    with pytest.raises(ValueError, match="not created via execute_sql"):
        env.execute_sql("INSERT INTO nosuch SELECT 1")
    sink = str(tmp_path / "sink_err")
    env.execute_sql(f"""
        CREATE TABLE sink_e (a BIGINT, b BIGINT)
        WITH ('connector' = 'filesystem', 'path' = '{sink}', 'format' = 'parquet')
    """)
    with pytest.raises(ValueError, match="column count"):
        env.execute_sql("INSERT INTO sink_e SELECT 1")


def test_partitioned_by_ddl_insert_writes_hive_dirs(spark, tmp_path):
    """PARTITIONED BY in the DDL routes INSERT through partitionBy: the
    sink gets hive-style directories and a partition-filtered read scans
    only the matching directory (partition pruning)."""
    import os

    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    sink = str(tmp_path / "psink")
    env.execute_sql(f"""
        CREATE TABLE psink_t (id BIGINT, v DOUBLE, lang STRING)
        PARTITIONED BY (lang)
        WITH ('connector' = 'filesystem', 'path' = '{sink}', 'format' = 'parquet')
    """)
    spark.createDataFrame(
        [(1, 1.0, "en"), (2, 2.0, "fr"), (3, 3.0, "en")], "id long, v double, lang string"
    ).createOrReplaceTempView("psrc")
    env.execute_sql("INSERT INTO psink_t SELECT id, v, lang FROM psrc")
    assert sorted(d for d in os.listdir(sink) if d.startswith("lang=")) == ["lang=en", "lang=fr"]
    rows = env.execute_sql("SELECT id FROM psink_t WHERE lang = 'en' ORDER BY id")
    assert [r.id for r in rows] == [1, 3]


def test_execute_sql_drop_and_show_tables(spark, tmp_path):
    import pytest

    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    src = str(tmp_path / "dt")
    spark.range(3).write.parquet(src)
    env.execute_sql(f"""
        CREATE TABLE dt_t (id BIGINT)
        WITH ('connector' = 'filesystem', 'path' = '{src}', 'format' = 'parquet')
    """)
    assert "dt_t" in env.execute_sql("SHOW TABLES")
    env.execute_sql("DROP TABLE dt_t")
    assert "dt_t" not in env.execute_sql("SHOW TABLES")
    with pytest.raises(Exception):
        env.execute_sql("SELECT * FROM dt_t")  # view gone
    env.execute_sql("DROP TABLE IF EXISTS dt_t")  # idempotent
    with pytest.raises(ValueError, match="does not exist"):
        env.execute_sql("DROP TABLE dt_t")


def test_show_tables_lists_temp_views_drop_consistent(spark):
    """SHOW TABLES and DROP TABLE operate over the same catalog: a
    temporary view registered outside DDL is listed and droppable, and a
    failed CREATE leaves no phantom entry."""
    import pytest

    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    spark.range(3).createOrReplaceTempView("stv_view")
    try:
        assert "stv_view" in env.execute_sql("SHOW TABLES")
        env.execute_sql("DROP TABLE stv_view")
        assert "stv_view" not in env.execute_sql("SHOW TABLES")
        # failed CREATE (unsupported connector) must not register anything
        with pytest.raises(Exception):
            env.execute_sql(
                "CREATE TABLE stv_bad (x INT) WITH ('connector' = 'no-such-connector')"
            )
        assert "stv_bad" not in env.execute_sql("SHOW TABLES")
    finally:
        spark.catalog.dropTempView("stv_view")


def test_execute_sql_describe_show_create_alter_explain(spark, tmp_path):
    """The rest of the reference's utility-statement surface
    (TableEnvironmentImpl.executeSql dispatch): DESCRIBE, SHOW CREATE
    TABLE, ALTER TABLE ... RENAME TO, EXPLAIN [PLAN FOR]."""
    import pytest

    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    src = str(tmp_path / "meta_tbl")
    spark.createDataFrame([(1, 7.0)], "id long, v double").write.parquet(src)
    env.execute_sql(f"""
        CREATE TABLE meta_t (id BIGINT, v DOUBLE, PRIMARY KEY (id) NOT ENFORCED)
        WITH ('connector' = 'filesystem', 'path' = '{src}', 'format' = 'parquet')
    """)
    # DESCRIBE: declared columns with PK marking
    desc = env.execute_sql("DESCRIBE meta_t")
    assert [(r[0], r[3]) for r in desc] == [("id", "PRI"), ("v", None)]
    # SHOW CREATE TABLE reconstructs a DDL that parses back to the same def
    ddl = env.execute_sql("SHOW CREATE TABLE meta_t")[0]
    assert "CREATE TABLE meta_t" in ddl and "PRIMARY KEY (id)" in ddl and "'format' = 'parquet'" in ddl
    from incubator_flink_spark.sources.ddl import parse_create_table

    t2 = parse_create_table(ddl)
    assert t2.columns == [("id", "BIGINT"), ("v", "DOUBLE")] and t2.primary_key == ["id"]
    # EXPLAIN returns the physical plan text
    plan = env.execute_sql("EXPLAIN SELECT v FROM meta_t WHERE id = 1")[0]
    assert "Physical Plan" in plan
    plan2 = env.execute_sql("EXPLAIN PLAN FOR SELECT 1 AS one")[0]
    assert "Physical Plan" in plan2
    # ALTER TABLE RENAME: old name gone, new name queryable + SHOWn
    env.execute_sql("ALTER TABLE meta_t RENAME TO meta_r")
    assert env.execute_sql("SELECT COUNT(*) AS n FROM meta_r")[0].n == 1
    tables = env.execute_sql("SHOW TABLES")
    assert "meta_r" in tables and "meta_t" not in tables
    with pytest.raises(Exception):
        env.execute_sql("SELECT * FROM meta_t")
    with pytest.raises(ValueError, match="not created via execute_sql"):
        env.execute_sql("ALTER TABLE nosuch RENAME TO x")
    # DESCRIBE a plain temp view answers from the catalog schema
    spark.createDataFrame([(1, "x")], "a long, b string").createOrReplaceTempView("plain_v")
    dv = env.execute_sql("DESC plain_v")
    assert [(r[0], r[1]) for r in dv] == [("a", "bigint"), ("b", "string")]
    with pytest.raises(ValueError, match="does not exist"):
        env.execute_sql("DESCRIBE ghost")


def test_execute_sql_view_lifecycle(spark):
    """CREATE [OR REPLACE] VIEW / SHOW VIEWS / DROP VIEW: the view is
    logical (re-plans its defining query), duplicate names are rejected
    without OR REPLACE, and DROP VIEW IF EXISTS is idempotent."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], "id LONG, tag STRING").createOrReplaceTempView(
        "vsrc"
    )
    env.execute_sql("CREATE VIEW v_tags AS SELECT tag, COUNT(*) AS n FROM vsrc GROUP BY tag")
    assert env.execute_sql("SHOW VIEWS") == ["v_tags"]
    got = {r.tag: r.n for r in spark.sql("SELECT * FROM v_tags").collect()}
    assert got == {"a": 2, "b": 1}
    with pytest.raises(ValueError, match="already exists"):
        env.execute_sql("CREATE VIEW v_tags AS SELECT 1 AS one")
    env.execute_sql("CREATE OR REPLACE VIEW v_tags AS SELECT tag FROM vsrc WHERE id = 1")
    assert [r.tag for r in spark.sql("SELECT * FROM v_tags").collect()] == ["a"]
    env.execute_sql("DROP VIEW v_tags")
    assert env.execute_sql("SHOW VIEWS") == []
    env.execute_sql("DROP VIEW IF EXISTS v_tags")  # idempotent
    with pytest.raises(ValueError, match="does not exist"):
        env.execute_sql("DROP VIEW v_tags")
    spark.catalog.dropTempView("vsrc")


def test_execute_sql_views_replan_after_insert(spark, tmp_path):
    """Views are logical: after INSERT INTO a base table, a view over it
    re-plans and sees the new rows (finding: a captured temp-view scan
    snapshot silently returned pre-INSERT contents)."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    env.execute_sql(
        f"CREATE TABLE vt (a BIGINT) WITH ('connector'='filesystem', "
        f"'path'='{tmp_path}/vt', 'format'='parquet')"
    )
    env.execute_sql("INSERT INTO vt SELECT CAST(1 AS BIGINT) AS a")
    env.execute_sql("CREATE VIEW vcnt AS SELECT COUNT(*) AS n FROM vt")
    assert spark.sql("SELECT * FROM vcnt").collect()[0].n == 1
    env.execute_sql("INSERT INTO vt SELECT CAST(2 AS BIGINT) AS a")
    assert spark.sql("SELECT * FROM vcnt").collect()[0].n == 2
    # CREATE [OR REPLACE] VIEW may never clobber a table
    with pytest.raises(ValueError, match="is a table"):
        env.execute_sql("CREATE OR REPLACE VIEW vt AS SELECT 1 AS one")
    # DROP TABLE refuses views; DROP TEMPORARY VIEW is accepted
    with pytest.raises(ValueError, match="is a view"):
        env.execute_sql("DROP TABLE vcnt")
    env.execute_sql("DROP TEMPORARY VIEW vcnt")
    assert env.execute_sql("SHOW VIEWS") == []
    env.execute_sql("DROP TABLE vt")


def test_execute_sql_show_functions(spark):
    from incubator_flink_spark.api.table import TableEnvironment
    from incubator_flink_spark.functions.sqlfuncs import _SQL_FUNCS

    env = TableEnvironment(spark)
    got = env.execute_sql("SHOW FUNCTIONS")
    assert got == sorted(_SQL_FUNCS)
    assert env.execute_sql("SHOW USER FUNCTIONS") == got


def test_execute_sql_database_lifecycle(spark, tmp_path):
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    assert env.execute_sql("SHOW CURRENT DATABASE") == ["default_database"]
    env.execute_sql("CREATE DATABASE staging")
    with pytest.raises(ValueError, match="already exists"):
        env.execute_sql("CREATE DATABASE staging")
    env.execute_sql("CREATE DATABASE IF NOT EXISTS staging")
    assert env.execute_sql("SHOW DATABASES") == ["default_database", "staging"]
    env.execute_sql("USE staging")
    env.execute_sql(
        f"CREATE TABLE stg_t (a BIGINT) WITH ('connector'='filesystem', "
        f"'path'='{tmp_path}/stg_t', 'format'='parquet')"
    )
    assert "stg_t" in env.execute_sql("SHOW TABLES")
    env.execute_sql("USE default_database")
    assert "stg_t" not in env.execute_sql("SHOW TABLES")
    with pytest.raises(ValueError, match="not empty"):
        env.execute_sql("DROP DATABASE staging")
    env.execute_sql("DROP DATABASE staging CASCADE")
    assert env.execute_sql("SHOW DATABASES") == ["default_database"]
    with pytest.raises(ValueError, match="does not exist"):
        env.execute_sql("USE staging")
    with pytest.raises(ValueError, match="cannot drop"):
        env.execute_sql("DROP DATABASE default_database")


def test_views_respect_database_namespace(spark):
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    env.execute_sql("CREATE DATABASE vdb")
    env.execute_sql("USE vdb")
    env.execute_sql("CREATE VIEW nsv AS SELECT 1 AS one")
    assert "nsv" in env.execute_sql("SHOW TABLES")
    env.execute_sql("USE default_database")
    assert "nsv" not in env.execute_sql("SHOW TABLES")
    with pytest.raises(ValueError, match="not empty"):
        env.execute_sql("DROP DATABASE vdb")
    env.execute_sql("DROP DATABASE vdb CASCADE")
    assert env.execute_sql("SHOW VIEWS") == []
    assert not spark.catalog.tableExists("nsv")
