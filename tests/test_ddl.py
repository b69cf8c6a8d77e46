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


# ------------------------------------------------- CREATE TABLE ... LIKE --

BASE_LIKE_DDL = """
CREATE TABLE like_base (
  id BIGINT,
  ts TIMESTAMP,
  v DOUBLE,
  v_cents AS CAST(v * 100 AS BIGINT),
  PRIMARY KEY (id) NOT ENFORCED,
  WATERMARK FOR ts AS ts - INTERVAL '30' SECOND
) PARTITIONED BY (id) WITH (
  'connector' = 'filesystem',
  'path' = '{path}',
  'format' = 'parquet'
)
"""


def _like_env(spark, tmp_path):
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    base = str(tmp_path / "like_base_tbl")
    spark.createDataFrame(
        [(1, None, 10.0), (2, None, 5.0)], "id long, ts timestamp, v double"
    ).write.parquet(base)
    env.execute_sql(BASE_LIKE_DDL.format(path=base))
    return env


def test_like_parse_options():
    from incubator_flink_spark.sources.ddl import parse_create_table

    t = parse_create_table(
        "CREATE TABLE d (x INT) WITH ('a'='1') "
        "LIKE b (INCLUDING ALL, OVERWRITING OPTIONS, EXCLUDING PARTITIONS)"
    )
    assert t.name == "d" and t.columns == [("x", "INT")]
    assert t.like == (
        "b",
        [("INCLUDING", "ALL"), ("OVERWRITING", "OPTIONS"), ("EXCLUDING", "PARTITIONS")],
    )
    # bare LIKE without body or WITH
    t2 = parse_create_table("CREATE TABLE d2 LIKE b")
    assert t2.like == ("b", []) and t2.columns == [] and t2.options == {}


def test_like_invalid_option_combinations():
    from incubator_flink_spark.sources.ddl import parse_create_table

    with pytest.raises(ValueError, match="OVERWRITING"):
        parse_create_table("CREATE TABLE d LIKE b (OVERWRITING ALL)")
    with pytest.raises(ValueError, match="OVERWRITING"):
        parse_create_table("CREATE TABLE d LIKE b (OVERWRITING PARTITIONS)")
    with pytest.raises(ValueError, match="OVERWRITING"):
        parse_create_table("CREATE TABLE d LIKE b (OVERWRITING CONSTRAINTS)")
    with pytest.raises(ValueError, match="only once"):
        parse_create_table("CREATE TABLE d LIKE b (INCLUDING OPTIONS, EXCLUDING OPTIONS)")


def test_like_inherits_everything_by_default(spark, tmp_path):
    """SqlTableLike.java:44-89's worked example: the derived table gets the
    source's schema, computed column, watermark, PK, partitions, and
    options; its own WITH entries overwrite (default OVERWRITING OPTIONS)."""
    env = _like_env(spark, tmp_path)
    derived_path = str(tmp_path / "derived_tbl")
    env.execute_sql(
        f"CREATE TABLE like_derived WITH ('path' = '{derived_path}') LIKE like_base"
    )
    t = env._tables["like_derived"]
    assert [c for c, _ in t.columns] == ["id", "ts", "v"]
    assert t.computed == [("v_cents", "CAST(v * 100 AS BIGINT)")]
    assert t.watermark == ("ts", 30)
    assert t.primary_key == ["id"]
    assert t.partitioned_by == ["id"]
    assert t.options["path"] == derived_path  # overwritten
    assert t.options["connector"] == "filesystem"  # inherited
    # the registered (empty — new path) view carries the merged schema
    cols = env.execute_sql("SELECT * FROM like_derived").__len__()  # no rows
    assert cols == 0
    assert "v_cents" in spark.table("like_derived").columns


def test_like_excluding_all_then_including(spark, tmp_path):
    env = _like_env(spark, tmp_path)
    p = str(tmp_path / "d2_tbl")
    env.execute_sql(
        f"""CREATE TABLE like_d2 (
              extra STRING,
              WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
            ) WITH ('connector'='filesystem','path'='{p}','format'='parquet')
            LIKE like_base (EXCLUDING ALL)"""
    )
    t = env._tables["like_d2"]
    # physical columns ALWAYS inherit (strategies govern the other features)
    assert [c for c, _ in t.columns] == ["id", "ts", "v", "extra"]
    assert t.computed == [] and t.primary_key == []
    assert t.watermark == ("ts", 5)  # source's excluded; derived's applies
    assert t.options == {"connector": "filesystem", "path": p, "format": "parquet"}


def test_like_merge_errors(spark, tmp_path):
    env = _like_env(spark, tmp_path)
    p = str(tmp_path / "err_tbl")
    with pytest.raises(ValueError, match="already exists in the base table"):
        env.execute_sql(f"CREATE TABLE e1 (id BIGINT) WITH ('path'='{p}') LIKE like_base")
    with pytest.raises(ValueError, match="watermark spec"):
        env.execute_sql(
            f"""CREATE TABLE e2 (WATERMARK FOR ts AS ts - INTERVAL '5' SECOND)
                WITH ('path'='{p}') LIKE like_base"""
        )
    with pytest.raises(ValueError, match="already has a primary key"):
        env.execute_sql(
            f"CREATE TABLE e3 (PRIMARY KEY (id) NOT ENFORCED) WITH ('path'='{p}') LIKE like_base"
        )
    with pytest.raises(ValueError, match="already exists an option"):
        env.execute_sql(
            f"CREATE TABLE e4 WITH ('path'='{p}') LIKE like_base (INCLUDING OPTIONS)"
        )
    with pytest.raises(ValueError, match="already has partitions"):
        env.execute_sql(
            f"CREATE TABLE e5 PARTITIONED BY (v) WITH ('path'='{p}') LIKE like_base"
        )
    with pytest.raises(ValueError, match="was not created via execute_sql"):
        env.execute_sql("CREATE TABLE e6 LIKE no_such_table")
    # a failed LIKE must not leave phantom entries
    assert "e1" not in env.execute_sql("SHOW TABLES")


def test_like_overwriting_generated_and_watermarks(spark, tmp_path):
    env = _like_env(spark, tmp_path)
    p = str(tmp_path / "ow_tbl")
    env.execute_sql(
        f"""CREATE TABLE like_ow (
              v_cents AS CAST(v * 1000 AS BIGINT),
              WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
            ) WITH ('path'='{p}')
            LIKE like_base (OVERWRITING GENERATED, OVERWRITING WATERMARKS)"""
    )
    t = env._tables["like_ow"]
    assert t.computed == [("v_cents", "CAST(v * 1000 AS BIGINT)")]
    assert t.watermark == ("ts", 5)


def test_like_reads_source_data_when_path_inherited(spark, tmp_path):
    """A LIKE table that inherits the path reads the same files — the
    docs' 'adjusted copy' use case."""
    env = _like_env(spark, tmp_path)
    env.execute_sql("CREATE TABLE like_same LIKE like_base (EXCLUDING PARTITIONS)")
    rows = env.execute_sql("SELECT id, v_cents FROM like_same ORDER BY id")
    assert [(r.id, r.v_cents) for r in rows] == [(1, 1000), (2, 500)]


# ------------------------------------- SET / RESET + OPTIONS hints --


def test_set_reset_statements(spark):
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    assert env.execute_sql("SET 'table.dynamic-table-options.enabled' = 'true'") == []
    assert env.execute_sql("SET") == [("table.dynamic-table-options.enabled", "true")]
    assert env.execute_sql("RESET 'table.dynamic-table-options.enabled'") == []
    assert env.execute_sql("SET") == []
    # spark.* keys pass through to the session conf
    env.execute_sql("SET 'spark.sql.shuffle.partitions' = '7'")
    assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
    env.execute_sql("RESET")
    assert spark.conf.get("spark.sql.shuffle.partitions") != "7"


def test_options_hint_gated_and_merges(spark, tmp_path):
    """FLIP-113 dynamic table options: disabled by default
    (TableConfigOptions.java:61-67 defaultValue(false)); when enabled the
    hinted options overwrite the declared WITH options at read time
    (CatalogSourceTable.java:96-117)."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    p1, p2 = str(tmp_path / "h1"), str(tmp_path / "h2")
    spark.createDataFrame([(1, "a")], "id long, s string").write.parquet(p1)
    spark.createDataFrame([(2, "b"), (3, "c")], "id long, s string").write.parquet(p2)
    env.execute_sql(f"""
        CREATE TABLE hint_t (id BIGINT, s STRING)
        WITH ('connector'='filesystem','path'='{p1}','format'='parquet')
    """)
    # default: hint rejected exactly like the reference
    with pytest.raises(ValueError, match="dynamic-table-options"):
        env.execute_sql("SELECT * FROM hint_t /*+ OPTIONS('path'='x') */")
    env.execute_sql("SET 'table.dynamic-table-options.enabled' = 'true'")
    rows = env.execute_sql(
        f"SELECT id FROM hint_t /*+ OPTIONS('path'='{p2}') */ ORDER BY id"
    )
    assert [r.id for r in rows] == [2, 3]
    # unhinted reads keep the declared path
    assert [r.id for r in env.execute_sql("SELECT id FROM hint_t")] == [1]
    # hint attached to an alias (the \w+ the regex binds is the alias, not
    # the table): tolerated — the hint is stripped, the query still runs
    rows = env.execute_sql("SELECT a.id FROM hint_t AS a /*+ OPTIONS('path'='x') */")
    assert [r.id for r in rows] == [1]
    # hint on an unknown relation: the hint layer skips it and the error is
    # the ordinary table-not-found from the validator, not a hint error
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        env.execute_sql("SELECT * FROM nope /*+ OPTIONS('path'='x') */")
    # gate is checked BEFORE target resolution (reference order): with the
    # feature re-disabled, even an alias/view-attached hint raises the gate
    # error, never 'not a DDL table' / table-not-found
    env.execute_sql("SET 'table.dynamic-table-options.enabled' = 'false'")
    with pytest.raises(ValueError, match="dynamic-table-options"):
        env.execute_sql("SELECT * FROM nope /*+ OPTIONS('path'='x') */")


# ----------------------------------------------- CREATE FUNCTION DDL --


def test_create_function_lifecycle(spark):
    """CREATE [TEMPORARY] FUNCTION name AS 'dotted.path' LANGUAGE PYTHON
    (SqlCreateFunction.java:39): the identifier resolves to a Python UDF
    object registered in the session catalog; DROP removes it; ALTER
    re-points it (SqlAlterFunction.java)."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    env.execute_sql(
        "CREATE TEMPORARY FUNCTION my_upper AS "
        "'incubator_flink_spark.functions.udf_examples.to_upper' LANGUAGE PYTHON"
    )
    assert "my_upper" in env.execute_sql("SHOW USER FUNCTIONS")
    out = env.execute_sql("SELECT my_upper('abc') AS u")
    assert out[0].u == "ABC"
    # duplicate create fails; IF NOT EXISTS is a no-op
    with pytest.raises(ValueError, match="already exists"):
        env.execute_sql(
            "CREATE FUNCTION my_upper AS 'incubator_flink_spark.functions.udf_examples.to_upper'"
        )
    env.execute_sql(
        "CREATE FUNCTION IF NOT EXISTS my_upper AS "
        "'incubator_flink_spark.functions.udf_examples.to_upper'"
    )
    # ALTER re-points to a different implementation
    env.execute_sql(
        "ALTER FUNCTION my_upper AS 'incubator_flink_spark.functions.udf_examples.char_count'"
    )
    assert env.execute_sql("SELECT my_upper('abcd') AS n")[0].n == 4
    env.execute_sql("DROP TEMPORARY FUNCTION my_upper")
    assert "my_upper" not in env.execute_sql("SHOW USER FUNCTIONS")
    with pytest.raises(ValueError, match="does not exist"):
        env.execute_sql("DROP FUNCTION my_upper")
    env.execute_sql("DROP FUNCTION IF EXISTS my_upper")  # no-op


def test_create_function_errors(spark):
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    with pytest.raises(ValueError, match="LANGUAGE JAVA"):
        env.execute_sql("CREATE FUNCTION j AS 'com.example.F' LANGUAGE JAVA")
    with pytest.raises(ValueError, match="cannot resolve"):
        env.execute_sql("CREATE FUNCTION g AS 'no.such.module.fn'")
    with pytest.raises(ValueError, match="dotted path"):
        env.execute_sql("CREATE FUNCTION h AS 'bare'")
    with pytest.raises(ValueError, match="does not exist"):
        env.execute_sql("ALTER FUNCTION nope AS 'incubator_flink_spark.functions.udf_examples.add_one'")


# ---------------------------------------------------- StatementSet --


def test_statement_set_multi_sink(spark, tmp_path):
    """StatementSet.java:32: several INSERTs buffered and executed as one
    unit — both sinks written, catalog views refreshed once."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    src = str(tmp_path / "ss_src")
    spark.createDataFrame(
        [(1, 10.0), (2, 5.0), (3, 20.0)], "id long, v double"
    ).write.parquet(src)
    env.execute_sql(f"CREATE TABLE ss_src (id BIGINT, v DOUBLE) WITH ('path'='{src}')")
    env.execute_sql(
        f"CREATE TABLE ss_hi (id BIGINT, v DOUBLE) WITH ('path'='{tmp_path / 'ss_hi'}')"
    )
    env.execute_sql(
        f"CREATE TABLE ss_lo (id BIGINT, v DOUBLE) WITH ('path'='{tmp_path / 'ss_lo'}')"
    )
    ss = env.create_statement_set()
    assert (
        ss.add_insert_sql("INSERT INTO ss_hi SELECT id, v FROM ss_src WHERE v >= 10")
        .add_insert_sql("INSERT INTO ss_lo SELECT id, v FROM ss_src WHERE v < 10")
        is ss
    )
    plan = ss.explain()
    assert "Statement 0" in plan and "Statement 1" in plan
    ss.execute()
    assert {r.id for r in env.execute_sql("SELECT id FROM ss_hi")} == {1, 3}
    assert {r.id for r in env.execute_sql("SELECT id FROM ss_lo")} == {2}
    # buffer drains after execute
    with pytest.raises(ValueError, match="No statement is added"):
        ss.execute()


def test_statement_set_snapshot_semantics(spark, tmp_path):
    """A branch reading a table that another branch writes sees the
    PRE-JOB contents (the reference's single-job translation scans each
    source once, before any sink commits)."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    a, b = str(tmp_path / "ss_a"), str(tmp_path / "ss_b")
    spark.createDataFrame([(1,)], "id long").write.parquet(a)
    spark.createDataFrame([(100,)], "id long").write.parquet(b)
    env.execute_sql(f"CREATE TABLE ss_a (id BIGINT) WITH ('path'='{a}')")
    env.execute_sql(f"CREATE TABLE ss_b (id BIGINT) WITH ('path'='{b}')")
    ss = env.create_statement_set()
    # branch 1 overwrites ss_b; branch 2 copies ss_b's (pre-job) rows to ss_a
    ss.add_insert_sql("INSERT OVERWRITE ss_b SELECT id + 1 FROM ss_a")
    ss.add_insert_sql("INSERT INTO ss_a SELECT id FROM ss_b")
    ss.execute()
    assert {r.id for r in env.execute_sql("SELECT id FROM ss_b")} == {2}
    assert {r.id for r in env.execute_sql("SELECT id FROM ss_a")} == {1, 100}


def test_statement_set_add_insert_table_api(spark, tmp_path):
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    sink = str(tmp_path / "ss_api_sink")
    env.execute_sql(f"CREATE TABLE ss_api (n BIGINT) WITH ('path'='{sink}')")
    t = env.from_dataframe(spark.range(3).toDF("n"))
    env.create_statement_set().add_insert("ss_api", t).execute()
    assert env.execute_sql("SELECT COUNT(*) AS c FROM ss_api")[0].c == 3
    # overwrite flag
    env.create_statement_set().add_insert("ss_api", t, overwrite=True).execute()
    assert env.execute_sql("SELECT COUNT(*) AS c FROM ss_api")[0].c == 3
    with pytest.raises(ValueError, match="INSERT target"):
        env.create_statement_set().add_insert_sql("INSERT INTO nope SELECT 1")


# --------------------------------------------- catalogs and modules --


def test_catalog_lifecycle(spark, tmp_path):
    """CREATE/DROP/USE CATALOG + SHOW CATALOGS (SqlCreateCatalog /
    SqlUseCatalog; GenericInMemoryCatalog ships a 'default' database).
    Tables are scoped by (catalog, database)."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    assert env.execute_sql("SHOW CATALOGS") == ["default_catalog"]
    assert env.execute_sql("SHOW CURRENT CATALOG") == ["default_catalog"]
    env.execute_sql("CREATE CATALOG c2 WITH ('type'='generic_in_memory')")
    with pytest.raises(ValueError, match="already exists"):
        env.execute_sql("CREATE CATALOG c2")
    with pytest.raises(ValueError, match="unsupported catalog type"):
        env.execute_sql("CREATE CATALOG c3 WITH ('type'='hive')")
    # a table created in c2 is invisible from default_catalog
    p = str(tmp_path / "cat_tbl")
    spark.createDataFrame([(1,)], "id long").write.parquet(p)
    env.execute_sql("USE CATALOG c2")
    assert env.execute_sql("SHOW CURRENT DATABASE") == ["default"]
    assert env.execute_sql("SHOW DATABASES") == ["default"]
    env.execute_sql(f"CREATE TABLE cat_t (id BIGINT) WITH ('path'='{p}')")
    assert "cat_t" in env.execute_sql("SHOW TABLES")
    env.execute_sql("USE CATALOG default_catalog")
    assert "cat_t" not in env.execute_sql("SHOW TABLES")
    # guards
    with pytest.raises(ValueError, match="does not exist"):
        env.execute_sql("USE CATALOG nope")
    with pytest.raises(ValueError, match="cannot drop"):
        env.execute_sql("DROP CATALOG default_catalog")
    env.execute_sql("USE CATALOG c2")
    with pytest.raises(ValueError, match="current catalog"):
        env.execute_sql("DROP CATALOG c2")
    env.execute_sql("USE CATALOG default_catalog")
    env.execute_sql("DROP CATALOG c2")
    assert env.execute_sql("SHOW CATALOGS") == ["default_catalog"]
    assert not spark.catalog.tableExists("cat_t")  # cascaded
    env.execute_sql("DROP CATALOG IF EXISTS c2")  # no-op


def test_drop_database_in_user_catalog(spark):
    """DROP DATABASE protections are per-catalog: a user catalog's default
    database is named 'default' (GenericInMemoryCatalog) and must be
    protected there, and dropping the CURRENT database inside a user
    catalog resets the session to THAT catalog's default — never to
    default_catalog's 'default_database' (which does not exist in c2)."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    env.execute_sql("CREATE CATALOG c2 WITH ('type'='generic_in_memory')")
    env.execute_sql("USE CATALOG c2")
    # c2's default db is protected even though its name is not 'default_database'
    with pytest.raises(ValueError, match="cannot drop"):
        env.execute_sql("DROP DATABASE default")
    env.execute_sql("CREATE DATABASE scratch")
    env.execute_sql("USE scratch")
    assert env.execute_sql("SHOW CURRENT DATABASE") == ["scratch"]
    env.execute_sql("DROP DATABASE scratch")
    # session lands on c2's OWN default — a database that exists
    assert env.execute_sql("SHOW CURRENT DATABASE") == ["default"]
    assert "default" in env.execute_sql("SHOW DATABASES")
    env.execute_sql("USE CATALOG default_catalog")
    env.execute_sql("DROP CATALOG c2")


def test_module_lifecycle(spark):
    """LOAD/UNLOAD MODULE, USE MODULES, SHOW [FULL] MODULES
    (SqlUseModules.java; ModuleManager resolution): the 'flink' module
    carries the Flink-named SQL UDFs — unloading it removes those names
    from resolution, reloading restores them."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    assert env.execute_sql("SHOW MODULES") == ["core", "flink"]
    assert env.execute_sql("SHOW FULL MODULES") == [("core", True), ("flink", True)]
    assert env.execute_sql("SELECT SPLIT_INDEX('a,b,c', ',', 1) AS x")[0].x == "b"
    env.execute_sql("UNLOAD MODULE flink")
    assert env.execute_sql("SHOW MODULES") == ["core"]
    with pytest.raises(Exception):  # noqa: B017 — name no longer resolves
        env.execute_sql("SELECT SPLIT_INDEX('a,b,c', ',', 1) AS x")
    assert "split_index" not in env.execute_sql("SHOW USER FUNCTIONS")
    with pytest.raises(ValueError, match="not loaded"):
        env.execute_sql("UNLOAD MODULE flink")
    env.execute_sql("LOAD MODULE flink")
    assert env.execute_sql("SELECT SPLIT_INDEX('a,b,c', ',', 1) AS x")[0].x == "b"
    # USE MODULES disables without unloading
    env.execute_sql("USE MODULES core")
    assert env.execute_sql("SHOW MODULES") == ["core"]
    assert env.execute_sql("SHOW FULL MODULES") == [("core", True), ("flink", False)]
    with pytest.raises(Exception):  # noqa: B017
        env.execute_sql("SELECT SPLIT_INDEX('a,b,c', ',', 1) AS x")
    env.execute_sql("USE MODULES core, flink")
    assert env.execute_sql("SELECT SPLIT_INDEX('a,b,c', ',', 1) AS x")[0].x == "b"
    # guards (documented divergences + reference errors)
    with pytest.raises(ValueError, match="core module"):
        env.execute_sql("UNLOAD MODULE core")
    with pytest.raises(ValueError, match="core"):
        env.execute_sql("USE MODULES flink")
    with pytest.raises(ValueError, match="unique"):
        env.execute_sql("USE MODULES core, core")
    with pytest.raises(ValueError, match="could not find"):
        env.execute_sql("LOAD MODULE hive")
    with pytest.raises(ValueError, match="already loaded"):
        env.execute_sql("LOAD MODULE flink")
    # leave the session functions registered for other tests
    env.execute_sql("SHOW MODULES") == ["core", "flink"]


def test_alter_table_set_reset_options(spark, tmp_path):
    """ALTER TABLE SET ('k'='v') merges options and re-resolves the
    connector (SqlAlterTableOptions); RESET removes keys, rejects an
    empty list and the 'connector' key (SqlAlterTableReset.java:37)."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    p1, p2 = str(tmp_path / "a1"), str(tmp_path / "a2")
    spark.createDataFrame([(1,)], "id long").write.parquet(p1)
    spark.createDataFrame([(2,), (3,)], "id long").write.parquet(p2)
    env.execute_sql(f"CREATE TABLE alt_t (id BIGINT) WITH ('path'='{p1}')")
    env.execute_sql(f"ALTER TABLE alt_t SET ('path'='{p2}')")
    assert {r.id for r in env.execute_sql("SELECT id FROM alt_t")} == {2, 3}
    assert env._tables["alt_t"].options["path"] == p2
    env.execute_sql("ALTER TABLE alt_t SET ('custom.opt'='x')")
    env.execute_sql("ALTER TABLE alt_t RESET ('custom.opt')")
    assert "custom.opt" not in env._tables["alt_t"].options
    with pytest.raises(ValueError, match="empty key"):
        env.execute_sql("ALTER TABLE alt_t RESET ()")
    with pytest.raises(ValueError, match="connector"):
        env.execute_sql("ALTER TABLE alt_t RESET ('connector')")
    with pytest.raises(ValueError, match="was not created"):
        env.execute_sql("ALTER TABLE nope SET ('a'='b')")


def test_alter_view_rename_and_as(spark):
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    env.execute_sql("CREATE VIEW av AS SELECT 1 AS one")
    env.execute_sql("ALTER VIEW av RENAME TO av2")
    assert "av2" in env.execute_sql("SHOW VIEWS") and "av" not in env.execute_sql("SHOW VIEWS")
    assert env.execute_sql("SELECT * FROM av2")[0].one == 1
    env.execute_sql("ALTER VIEW av2 AS SELECT 2 AS two")
    assert env.execute_sql("SELECT * FROM av2")[0].two == 2
    with pytest.raises(ValueError, match="is not a view"):
        env.execute_sql("ALTER VIEW nope RENAME TO x")
    env.execute_sql("CREATE VIEW av3 AS SELECT 3 AS three")
    with pytest.raises(ValueError, match="already exists"):
        env.execute_sql("ALTER VIEW av3 RENAME TO av2")


def test_insert_static_partition_spec(spark, tmp_path):
    """INSERT INTO/OVERWRITE t PARTITION (k='v') <query> (RichSqlInsert
    staticPartitions): the SELECT omits the static columns, which are
    appended as constants cast to their declared types; OVERWRITE with a
    static spec replaces only that partition (dynamic overwrite mode)."""
    import os

    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    sink = str(tmp_path / "sp_sink")
    env.execute_sql(f"""
        CREATE TABLE sp_t (id BIGINT, v DOUBLE, lang STRING)
        PARTITIONED BY (lang)
        WITH ('path'='{sink}')
    """)
    env.execute_sql("INSERT INTO sp_t PARTITION (lang='en') SELECT 1, 1.5")
    env.execute_sql("INSERT INTO sp_t PARTITION (lang='fr') VALUES (2, CAST(2.5 AS DOUBLE))")
    rows = {(r.id, r.v, r.lang) for r in env.execute_sql("SELECT * FROM sp_t")}
    assert rows == {(1, 1.5, "en"), (2, 2.5, "fr")}
    assert sorted(d for d in os.listdir(sink) if d.startswith("lang=")) == ["lang=en", "lang=fr"]
    # static-spec OVERWRITE replaces only the named partition
    env.execute_sql("INSERT OVERWRITE sp_t PARTITION (lang='en') SELECT 10, 10.0")
    rows = {(r.id, r.lang) for r in env.execute_sql("SELECT id, lang FROM sp_t")}
    assert rows == {(10, "en"), (2, "fr")}
    # errors: non-partition static key; wrong column count
    with pytest.raises(ValueError, match="not a partition key"):
        env.execute_sql("INSERT INTO sp_t PARTITION (v='1.0') SELECT 3, 'x'")
    with pytest.raises(ValueError, match="column count"):
        env.execute_sql("INSERT INTO sp_t PARTITION (lang='de') SELECT 3")


# ----------------------------------------------- METADATA columns --


def test_metadata_column_parse_and_show_create_roundtrip(spark, tmp_path):
    """`col TYPE METADATA [FROM 'key'] [VIRTUAL]` (SqlTableColumn.java's
    SqlMetadataColumn branch): parses into TableDef.metadata_cols, appears
    in DESCRIBE, and SHOW CREATE TABLE emits DDL that re-parses to the
    same definition."""
    from incubator_flink_spark.api.table import TableEnvironment

    ddl = """
        CREATE TABLE md_t (
          id BIGINT,
          fname STRING METADATA FROM 'file.name' VIRTUAL,
          mtime TIMESTAMP METADATA FROM 'file.modification-time' VIRTUAL
        ) WITH ('connector'='filesystem','path'='{p}','format'='parquet')
    """
    t = parse_create_table(ddl.format(p="/x"))
    assert t.columns == [("id", "BIGINT")]
    assert t.metadata_cols == [
        ("fname", "STRING", "file.name", True),
        ("mtime", "TIMESTAMP", "file.modification-time", True),
    ]
    p = str(tmp_path / "md_t")
    spark.createDataFrame([(1,), (2,)], "id long").write.parquet(p)
    env = TableEnvironment(spark)
    env.execute_sql(ddl.format(p=p))
    # DESCRIBE carries the metadata kind
    desc = env.execute_sql("DESCRIBE md_t")
    kinds = {r[0]: r[4] for r in desc}
    assert kinds["fname"] == "METADATA FROM 'file.name' VIRTUAL"
    # SHOW CREATE TABLE round-trips through the parser
    created = env.execute_sql("SHOW CREATE TABLE md_t")[0]
    t2 = parse_create_table(created)
    assert t2.metadata_cols == t.metadata_cols and t2.columns == t.columns


def test_metadata_columns_filesystem_values(spark, tmp_path):
    """Filesystem readable metadata (FileSystemTableSource
    listReadableMetadata: file.path/file.name/file.size/
    file.modification-time) maps to Spark's hidden _metadata struct — the
    values are the real scanned-file facts, not constants."""
    import os

    from incubator_flink_spark.api.table import TableEnvironment

    p = str(tmp_path / "fs_md")
    spark.createDataFrame([(1,), (2,)], "id long").coalesce(1).write.parquet(p)
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE fs_md (
          id BIGINT,
          fpath STRING METADATA FROM 'file.path' VIRTUAL,
          fname STRING METADATA FROM 'file.name' VIRTUAL,
          fsize BIGINT METADATA FROM 'file.size' VIRTUAL
        ) WITH ('path'='{p}')
    """)
    rows = env.execute_sql("SELECT DISTINCT fpath, fname, fsize FROM fs_md")
    assert len(rows) == 1
    part_files = [f for f in os.listdir(p) if f.startswith("part-")]
    assert rows[0].fname in part_files
    assert rows[0].fpath.endswith(rows[0].fname)
    assert rows[0].fsize == os.path.getsize(os.path.join(p, rows[0].fname))
    # unsupported key is rejected with the supported list
    with pytest.raises(ValueError, match="not readable"):
        env.execute_sql(f"""
            CREATE TABLE fs_bad (id BIGINT, x STRING METADATA FROM 'nope')
            WITH ('path'='{p}')
        """)


def test_metadata_columns_kafka_ddl(spark, tmp_path):
    """Kafka metadata through DDL (KafkaDynamicSource.ReadableMetadata →
    the native columns of Spark's kafka reader): timestamp/offset/
    partition/topic read through `METADATA [FROM 'key']`, value fields
    decoded by the declared format — broker-less via kafka-shaped frames."""
    import datetime

    from incubator_flink_spark.api.table import TableEnvironment

    frames = spark.createDataFrame(
        [
            ('{"id":10,"name":"a"}', 5, 0, datetime.datetime(2024, 1, 1, 0, 0, 5)),
            ('{"id":20,"name":"b"}', 6, 1, datetime.datetime(2024, 1, 1, 0, 0, 6)),
        ],
        "v STRING, offset BIGINT, partition INT, timestamp TIMESTAMP",
    ).select(
        F.lit(None).cast("binary").alias("key"),
        F.encode("v", "UTF-8").alias("value"),
        F.lit("orders").alias("topic"),
        "partition",
        "offset",
        "timestamp",
        F.lit(0).alias("timestampType"),
    )
    fp = str(tmp_path / "frames")
    frames.write.parquet(fp)
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE k_orders (
          id BIGINT,
          name STRING,
          off BIGINT METADATA FROM 'offset' VIRTUAL,
          part INT METADATA FROM 'partition' VIRTUAL,
          ts TIMESTAMP METADATA FROM 'timestamp' VIRTUAL,
          topic STRING METADATA VIRTUAL
        ) WITH (
          'connector'='kafka', 'topic'='orders', 'value.format'='json',
          'frames-path'='{fp}'
        )
    """)
    rows = sorted(
        env.execute_sql("SELECT id, name, off, part, ts, topic FROM k_orders"),
        key=lambda r: r.id,
    )
    assert [(r.id, r.name, r.off, r.part, r.topic) for r in rows] == [
        (10, "a", 5, 0, "orders"),
        (20, "b", 6, 1, "orders"),
    ]
    assert rows[0].ts == datetime.datetime(2024, 1, 1, 0, 0, 5)
    # unknown metadata key on kafka
    with pytest.raises(ValueError, match="not readable"):
        env.execute_sql(f"""
            CREATE TABLE k_bad (id BIGINT, le INT METADATA FROM 'leader-epoch')
            WITH ('connector'='kafka','value.format'='json','frames-path'='{fp}')
        """)


def test_metadata_kafka_headers(spark, tmp_path):
    """'headers' metadata: Spark's reader (includeHeaders) produces
    array<struct<key,value>>; Flink's readable type is MAP<STRING, BYTES>
    — the DDL mapping wraps map_from_entries around the native column."""
    from incubator_flink_spark.api.table import TableEnvironment

    frames = spark.createDataFrame(
        [('{"id":1}', 0, [("trace", bytearray(b"abc"))])],
        "v STRING, offset BIGINT, headers array<struct<key:string,value:binary>>",
    ).select(
        F.lit(None).cast("binary").alias("key"),
        F.encode("v", "UTF-8").alias("value"),
        F.lit("t").alias("topic"),
        F.lit(0).alias("partition"),
        "offset",
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
        "headers",
    )
    fp = str(tmp_path / "hdr_frames")
    frames.write.parquet(fp)
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE k_hdr (
          id BIGINT,
          hdrs MAP<STRING, BINARY> METADATA FROM 'headers' VIRTUAL
        ) WITH ('connector'='kafka','value.format'='json','frames-path'='{fp}')
    """)
    row = env.execute_sql("SELECT id, hdrs FROM k_hdr")[0]
    assert row.id == 1 and bytes(row.hdrs["trace"]) == b"abc"


def test_metadata_like_merge(spark, tmp_path):
    """LIKE's INCLUDING/EXCLUDING/OVERWRITING METADATA now acts on real
    metadata columns (MergeTableLikeUtil metadata branch): default carries
    them, EXCLUDING drops, redefinition requires OVERWRITING."""
    from incubator_flink_spark.api.table import TableEnvironment

    p = str(tmp_path / "like_md")
    spark.createDataFrame([(1,)], "id long").write.parquet(p)
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE base_md (
          id BIGINT,
          fname STRING METADATA FROM 'file.name' VIRTUAL
        ) WITH ('path'='{p}')
    """)
    # default = INCLUDING METADATA
    env.execute_sql("CREATE TABLE inc_md WITH ('path'='%s') LIKE base_md" % p)
    assert env.execute_sql("SELECT fname FROM inc_md")[0].fname.startswith("part-")
    # EXCLUDING METADATA drops the column
    env.execute_sql(
        "CREATE TABLE exc_md WITH ('path'='%s') LIKE base_md (EXCLUDING METADATA)" % p
    )
    assert "fname" not in env.sql_query("SELECT * FROM exc_md").to_df().columns
    # redefinition without OVERWRITING raises the reference error
    with pytest.raises(ValueError, match="metadata column named 'fname'"):
        env.execute_sql(
            "CREATE TABLE re_md (fname STRING METADATA FROM 'file.path' VIRTUAL) "
            "WITH ('path'='%s') LIKE base_md" % p
        )
    env.execute_sql(
        "CREATE TABLE ov_md (fname STRING METADATA FROM 'file.path' VIRTUAL) "
        "WITH ('path'='%s') LIKE base_md (OVERWRITING METADATA)" % p
    )
    assert "/" in env.execute_sql("SELECT fname FROM ov_md")[0].fname  # path, not name
    # physical column colliding with a source metadata column
    with pytest.raises(ValueError, match="already exists"):
        env.execute_sql(
            "CREATE TABLE col_md (fname STRING) WITH ('path'='%s') LIKE base_md" % p
        )


def test_metadata_insert_rules(spark, tmp_path):
    """VIRTUAL metadata columns are excluded from the INSERT schema (the
    query supplies only physical columns, and the refreshed view exposes
    fresh metadata); a PERSISTED metadata column is rejected at the
    filesystem sink (no writable metadata — DynamicSinkUtils
    validateMetadataColumns)."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    sink = str(tmp_path / "md_sink")
    env.execute_sql(f"""
        CREATE TABLE md_sink (
          id BIGINT,
          fname STRING METADATA FROM 'file.name' VIRTUAL
        ) WITH ('path'='{sink}')
    """)
    env.execute_sql("INSERT INTO md_sink SELECT 7")  # one physical column only
    rows = env.execute_sql("SELECT id, fname FROM md_sink")
    assert [(r.id,) for r in rows] == [(7,)]
    assert rows[0].fname.startswith("part-")
    # persisted (non-VIRTUAL) metadata is not writable on filesystem
    env.execute_sql(f"""
        CREATE TABLE md_persist (
          id BIGINT,
          fname STRING METADATA FROM 'file.name'
        ) WITH ('path'='{sink}')
    """)
    with pytest.raises(ValueError, match="not writable"):
        env.execute_sql("INSERT INTO md_persist SELECT 8")


def test_upsert_kafka_ddl_materializes_current_state(spark, tmp_path):
    """connector 'upsert-kafka' through DDL (UpsertKafkaDynamicTableFactory):
    PRIMARY KEY = message key, null value = DELETE tombstone, last write
    per key wins in offset order — the registered view IS the
    ChangelogNormalize materialization."""
    frames = spark.createDataFrame(
        [
            ('{"id":1}', '{"v":10.0}', 0),
            ('{"id":2}', '{"v":20.0}', 1),
            ('{"id":1}', '{"v":11.0}', 2),   # update key 1
            ('{"id":2}', None, 3),            # tombstone key 2
            ('{"id":3}', '{"v":30.0}', 4),
        ],
        "k string, v string, offset long",
    ).select(
        F.encode("k", "UTF-8").alias("key"),
        F.encode("v", "UTF-8").alias("value"),
        F.lit("t").alias("topic"),
        F.lit(0).alias("partition"),
        "offset",
    )
    fp = str(tmp_path / "upsert_frames")
    frames.write.parquet(fp)
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE uk_t (
          id BIGINT,
          v DOUBLE,
          PRIMARY KEY (id) NOT ENFORCED
        ) WITH ('connector'='upsert-kafka','topic'='t',
                'key.format'='json','value.format'='json',
                'frames-path'='{fp}')
    """)
    rows = {(r.id, r.v) for r in env.execute_sql("SELECT id, v FROM uk_t")}
    assert rows == {(1, 11.0), (3, 30.0)}  # key 2 tombstoned, key 1 updated
    # PRIMARY KEY is mandatory (reference validatePKConstraints)
    with pytest.raises(ValueError, match="PRIMARY KEY"):
        env.execute_sql(f"""
            CREATE TABLE uk_bad (id BIGINT, v DOUBLE)
            WITH ('connector'='upsert-kafka','frames-path'='{fp}')
        """)


def test_insert_column_list(spark, tmp_path):
    """INSERT INTO T(c, b) SELECT x, y (insert.md:191 column_list): x->c,
    y->b, unspecified columns NULL; validation errors per the reference."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    sink = str(tmp_path / "cl_sink")
    env.execute_sql(f"""
        CREATE TABLE cl_t (a INT, b INT, c INT)
        WITH ('path'='{sink}')
    """)
    env.execute_sql("INSERT INTO cl_t (c, b) SELECT 7, 8")
    rows = [(r.a, r.b, r.c) for r in env.execute_sql("SELECT a, b, c FROM cl_t")]
    assert rows == [(None, 8, 7)]
    # combined with a static partition spec
    psink = str(tmp_path / "cl_psink")
    env.execute_sql(f"""
        CREATE TABLE cl_p (a INT, b INT, lang STRING)
        PARTITIONED BY (lang) WITH ('path'='{psink}')
    """)
    env.execute_sql("INSERT INTO cl_p PARTITION (lang='en') (b) SELECT 5")
    rows = [(r.a, r.b, r.lang) for r in env.execute_sql("SELECT a, b, lang FROM cl_p")]
    assert rows == [(None, 5, "en")]
    # errors
    with pytest.raises(ValueError, match="unknown column"):
        env.execute_sql("INSERT INTO cl_t (nope) SELECT 1")
    with pytest.raises(ValueError, match="duplicate"):
        env.execute_sql("INSERT INTO cl_t (a, a) SELECT 1, 2")
    with pytest.raises(ValueError, match="column count"):
        env.execute_sql("INSERT INTO cl_t (a, b) SELECT 1")
    with pytest.raises(ValueError, match="static PARTITION"):
        env.execute_sql("INSERT INTO cl_p PARTITION (lang='fr') (lang) SELECT 'x'")
    # a parenthesized query is NOT a column list
    env.execute_sql("INSERT INTO cl_t (SELECT 1, 2, 3)")
    assert env.execute_sql("SELECT COUNT(*) AS n FROM cl_t")[0].n == 2


def test_format_options_csv(spark, tmp_path):
    """Flink format options in WITH ('csv.field-delimiter', 'csv.null-literal',
    'csv.ignore-parse-errors' — CsvFormatFactory names) configure the Spark
    reader/writer on both the read and INSERT paths."""
    import os

    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    src = str(tmp_path / "fmt_src")
    os.makedirs(src)
    with open(os.path.join(src, "data.csv"), "w") as fh:
        fh.write("id;name;v\n1;alpha;1.5\n2;NULLX;2.5\nbroken_line_no_delims\n3;gamma;3.5\n")
    env.execute_sql(f"""
        CREATE TABLE fmt_t (id BIGINT, name STRING, v DOUBLE)
        WITH ('path'='{src}','format'='csv',
              'csv.field-delimiter'=';',
              'csv.null-literal'='NULLX',
              'csv.ignore-parse-errors'='true')
    """)
    rows = {(r.id, r.name, r.v) for r in env.execute_sql("SELECT id, name, v FROM fmt_t")}
    assert rows == {(1, "alpha", 1.5), (2, None, 2.5), (3, "gamma", 3.5)}
    # write side: INSERT through the connector honors the delimiter
    sink = str(tmp_path / "fmt_sink")
    env.execute_sql(f"""
        CREATE TABLE fmt_out (id BIGINT, name STRING)
        WITH ('path'='{sink}','format'='csv','csv.field-delimiter'='|')
    """)
    env.execute_sql("INSERT INTO fmt_out SELECT 9, 'zeta'")
    written = ""
    for f in os.listdir(sink):
        if f.endswith(".csv"):
            written += open(os.path.join(sink, f)).read()
    assert "9|zeta" in written
    assert [r.name for r in env.execute_sql("SELECT name FROM fmt_out")] == ["zeta"]


def test_print_and_blackhole_connectors(spark, capsys):
    """print / blackhole sink connectors (PrintTableSinkFactory,
    BlackHoleTableSinkFactory): INSERT executes the plan; print emits one
    +I[...] row per record with the optional print-identifier prefix,
    blackhole discards."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    env.execute_sql("""
        CREATE TABLE p_out (id BIGINT, s STRING)
        WITH ('connector'='print','print-identifier'='dbg')
    """)
    env.execute_sql("INSERT INTO p_out SELECT 1, 'a'")
    out = capsys.readouterr().out
    assert "dbg> +I[1, a]" in out
    env.execute_sql("""
        CREATE TABLE bh_out (id BIGINT)
        WITH ('connector'='blackhole')
    """)
    env.execute_sql("INSERT INTO bh_out SELECT 42")  # executes, discards
    # sink-only: schema required
    with pytest.raises(ValueError, match="schema"):
        env.execute_sql("CREATE TABLE p_bad () WITH ('connector'='print')")


def test_qualified_identifiers(spark, tmp_path):
    """ObjectIdentifier resolution (reference identifier expansion:
    `catalog.db.table` and `db.table` resolve against the session
    catalog): fully- and partially-qualified references work in queries,
    INSERT, and DESCRIBE; a 3-part name that doesn't resolve errors; an
    `alias.column` dotted pair is untouched; a cross-catalog bare-name
    collision on CREATE is rejected loudly."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    p = str(tmp_path / "q_t")
    spark.createDataFrame([(1, 2.0), (2, 4.0)], "id long, v double").write.parquet(p)
    env.execute_sql(f"CREATE TABLE q_t (id BIGINT, v DOUBLE) WITH ('path'='{p}')")
    full = env.execute_sql(
        "SELECT id FROM default_catalog.default_database.q_t ORDER BY id"
    )
    assert [r.id for r in full] == [1, 2]
    part = env.execute_sql("SELECT id FROM default_database.q_t ORDER BY id")
    assert [r.id for r in part] == [1, 2]
    # alias.column stays an alias reference
    rows = env.execute_sql("SELECT a.id FROM q_t AS a WHERE a.v > 3.0")
    assert [r.id for r in rows] == [2]
    # INSERT through a qualified target
    sink = str(tmp_path / "q_sink")
    env.execute_sql(f"CREATE TABLE q_sink (id BIGINT) WITH ('path'='{sink}')")
    env.execute_sql("INSERT INTO default_catalog.default_database.q_sink SELECT 9")
    assert [r.id for r in env.execute_sql("SELECT id FROM q_sink")] == [9]
    # unresolvable 3-part name
    with pytest.raises(ValueError, match="does not exist"):
        env.execute_sql("SELECT * FROM default_catalog.default_database.nope")
    # a db-qualified view resolves too
    env.execute_sql("CREATE VIEW q_v AS SELECT id FROM q_t")
    assert len(env.execute_sql("SELECT * FROM default_database.q_v")) == 2
    # cross-catalog bare-name COEXISTENCE (r10, reference CatalogManager/
    # ObjectIdentifier): the same bare name resolves independently per
    # (catalog, database) scope
    p2 = str(tmp_path / "q_t2")
    spark.createDataFrame([(7, 1.0)], "id long, v double").write.parquet(p2)
    env.execute_sql("CREATE CATALOG qc2 WITH ('type'='generic_in_memory')")
    env.execute_sql("USE CATALOG qc2")
    env.execute_sql(f"CREATE TABLE q_t (id BIGINT, v DOUBLE) WITH ('path'='{p2}')")
    assert [r.id for r in env.execute_sql("SELECT id FROM q_t")] == [7]
    # qualified cross-catalog read from inside qc2
    rows = env.execute_sql("SELECT id FROM default_catalog.default_database.q_t ORDER BY id")
    assert [r.id for r in rows] == [1, 2]
    env.execute_sql("USE CATALOG default_catalog")
    assert sorted(r.id for r in env.execute_sql("SELECT id FROM q_t")) == [1, 2]
    env.execute_sql("DROP CATALOG qc2")


def test_qualified_create_target(spark, tmp_path):
    """CREATE TABLE [cat.][db.]name registers under the EXPLICIT scope
    (DDL-side ObjectIdentifier expansion), visible from SHOW TABLES only
    in that scope and addressable by qualified reference from anywhere."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    p = str(tmp_path / "qc_t")
    spark.createDataFrame([(5,)], "id long").write.parquet(p)
    env.execute_sql("CREATE CATALOG qc3 WITH ('type'='generic_in_memory')")
    # create INTO qc3.default while standing in default_catalog
    env.execute_sql(f"CREATE TABLE qc3.default.qc_t (id BIGINT) WITH ('path'='{p}')")
    assert "qc_t" not in env.execute_sql("SHOW TABLES")  # not in current scope
    env.execute_sql("USE CATALOG qc3")
    assert "qc_t" in env.execute_sql("SHOW TABLES")
    assert [r.id for r in env.execute_sql("SELECT id FROM qc_t")] == [5]
    env.execute_sql("USE CATALOG default_catalog")
    # qualified read from the other scope
    assert [r.id for r in env.execute_sql("SELECT id FROM qc3.default.qc_t")] == [5]
    # db-qualified create in the current catalog
    env.execute_sql("CREATE DATABASE qdb")
    env.execute_sql(f"CREATE TABLE qdb.qdb_t (id BIGINT) WITH ('path'='{p}')")
    assert [r.id for r in env.execute_sql("SELECT id FROM qdb.qdb_t")] == [5]
    # unknown scope errors
    with pytest.raises(ValueError, match="does not exist"):
        env.execute_sql(f"CREATE TABLE nocat.default.x (id BIGINT) WITH ('path'='{p}')")
    env.execute_sql("USE CATALOG qc3")
    env.execute_sql("USE CATALOG default_catalog")
    env.execute_sql("DROP CATALOG qc3")


def test_kafka_insert_roundtrip(spark, tmp_path):
    """kafka as a SINK (KafkaDynamicSink counterpart): INSERT INTO a kafka
    DDL table encodes key/value JSON frames and appends them to
    frames-path; reading back through the SAME table decodes them — incl.
    a PERSISTED writable `timestamp` metadata column (the reference's
    kafka writable metadata)."""
    import datetime

    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    fp = str(tmp_path / "k_sink_frames")  # does not exist yet: sink-first
    env.execute_sql(f"""
        CREATE TABLE k_rt (
          uid BIGINT,
          name STRING,
          ts TIMESTAMP METADATA FROM 'timestamp'
        ) WITH ('connector'='kafka','topic'='rt','value.format'='json',
                'key.format'='json','key.fields'='uid',
                'frames-path'='{fp}')
    """)
    assert env.execute_sql("SELECT * FROM k_rt") == []  # empty until INSERT
    env.execute_sql(
        "INSERT INTO k_rt SELECT 1, 'a', TIMESTAMP '2024-03-01 00:00:00'"
    )
    env.execute_sql(
        "INSERT INTO k_rt SELECT 2, 'b', TIMESTAMP '2024-03-02 00:00:00'"
    )
    rows = sorted(
        [(r.uid, r.name, r.ts) for r in env.execute_sql("SELECT uid, name, ts FROM k_rt")]
    )
    assert rows == [
        (1, "a", datetime.datetime(2024, 3, 1)),
        (2, "b", datetime.datetime(2024, 3, 2)),
    ]


def test_upsert_kafka_insert_applies_upserts(spark, tmp_path):
    """INSERT INTO an upsert-kafka table appends upsert frames keyed by the
    PRIMARY KEY: a later INSERT for the same key wins in the materialized
    view (offset order across INSERT batches)."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    fp = str(tmp_path / "uk_sink_frames")
    env.execute_sql(f"""
        CREATE TABLE uk_rt (
          id BIGINT, v DOUBLE,
          PRIMARY KEY (id) NOT ENFORCED
        ) WITH ('connector'='upsert-kafka','topic'='u',
                'key.format'='json','value.format'='json',
                'frames-path'='{fp}')
    """)
    env.execute_sql("INSERT INTO uk_rt SELECT 1, CAST(10.0 AS DOUBLE)")
    env.execute_sql("INSERT INTO uk_rt SELECT 2, CAST(20.0 AS DOUBLE)")
    env.execute_sql("INSERT INTO uk_rt SELECT 1, CAST(11.0 AS DOUBLE)")  # upsert key 1
    rows = {(r.id, r.v) for r in env.execute_sql("SELECT id, v FROM uk_rt")}
    assert rows == {(1, 11.0), (2, 20.0)}


def test_kafka_ddl_streaming_mode(spark, tmp_path):
    """connector 'kafka' with 'mode'='streaming': the registered DataFrame
    is a readStream over the frames (schema pinned from disk), decoding
    through the same Catalyst expressions — streamed rows == batch rows."""
    from incubator_flink_spark.sources.ddl import execute_ddl
    from tests.conftest import drain_stream

    frames = spark.createDataFrame(
        [('{"id":1,"s":"a"}', 0), ('{"id":2,"s":"b"}', 1)],
        "v STRING, offset BIGINT",
    ).select(
        F.lit(None).cast("binary").alias("key"),
        F.encode("v", "UTF-8").alias("value"),
        F.lit("t").alias("topic"),
        F.lit(0).alias("partition"),
        "offset",
    )
    fp = str(tmp_path / "stream_frames")
    frames.write.parquet(fp)
    df = execute_ddl(
        spark,
        f"""CREATE TABLE k_stream (id BIGINT, s STRING,
             off BIGINT METADATA FROM 'offset' VIRTUAL)
            WITH ('connector'='kafka','value.format'='json',
                  'frames-path'='{fp}','mode'='streaming')""",
    )
    assert df.isStreaming
    got = []

    import tempfile

    q = (
        df.writeStream.outputMode("append")
        .foreachBatch(lambda b, _i: got.extend(b.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .start()
    )
    drain_stream(q)
    assert sorted((r.id, r.s, r.off) for r in got) == [(1, "a", 0), (2, "b", 1)]


def test_kafka_insert_column_list_with_metadata(spark, tmp_path):
    """INSERT column lists must cover PERSISTED metadata columns (ADVICE
    r9): naming kafka's writable `timestamp` in the list works, and
    omitting it NULL-fills — mirroring sink_cols in _insert_into."""
    import datetime

    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    fp = str(tmp_path / "k_cl_frames")
    env.execute_sql(f"""
        CREATE TABLE k_cl (
          uid BIGINT,
          name STRING,
          ts TIMESTAMP METADATA FROM 'timestamp'
        ) WITH ('connector'='kafka','topic'='cl','value.format'='json',
                'key.format'='json','key.fields'='uid',
                'frames-path'='{fp}')
    """)
    # metadata column named in the list, out of declared order
    env.execute_sql(
        "INSERT INTO k_cl (ts, uid, name) "
        "SELECT TIMESTAMP '2024-03-01 00:00:00', 1, 'a'"
    )
    # metadata column omitted: NULL-filled like any unspecified sink column
    env.execute_sql("INSERT INTO k_cl (uid, name) SELECT 2, 'b'")
    rows = {(r.uid, r.name, r.ts) for r in env.execute_sql("SELECT uid, name, ts FROM k_cl")}
    assert rows == {
        (1, "a", datetime.datetime(2024, 3, 1)),
        (2, "b", None),
    }


def test_upsert_kafka_same_key_one_insert_deterministic(spark, tmp_path):
    """Duplicate-key rows inside ONE INSERT must elect the same upsert
    winner on every run (VERDICT r9: offsets were partition-scoped, so the
    winner depended on upstream partitioning).  Two differently-partitioned
    executions of the same logical INSERT read back identical state."""
    from incubator_flink_spark.api.table import TableEnvironment

    winners = []
    for n_parts in (1, 7):
        env = TableEnvironment(spark)
        fp = str(tmp_path / f"uk_det_{n_parts}")
        env.execute_sql(f"""
            CREATE TABLE uk_det_{n_parts} (
              id BIGINT, v DOUBLE,
              PRIMARY KEY (id) NOT ENFORCED
            ) WITH ('connector'='upsert-kafka','topic'='d',
                    'key.format'='json','value.format'='json',
                    'frames-path'='{fp}')
        """)
        src = spark.createDataFrame(
            [(1, 10.0), (1, 12.0), (1, 11.0), (2, 20.0)], "id long, v double"
        ).repartition(n_parts)
        src.createOrReplaceTempView(f"uk_det_src_{n_parts}")
        env.execute_sql(
            f"INSERT INTO uk_det_{n_parts} SELECT id, v FROM uk_det_src_{n_parts}"
        )
        winners.append(
            sorted((r.id, r.v) for r in env.execute_sql(f"SELECT id, v FROM uk_det_{n_parts}"))
        )
    assert winners[0] == winners[1]
    assert dict(winners[0])[2] == 20.0


def test_per_scope_catalog_namespacing(spark, tmp_path):
    """The same bare table name coexists in two (catalog, database) scopes
    and resolves independently by USE context and qualified reference
    (reference CatalogManager.qualifyIdentifier /
    TableEnvironmentImpl.getCatalogManager): scoped SHOW CREATE TABLE /
    DESCRIBE / SHOW TABLES, INSERT into each, scoped DROP."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    pa_, pb = str(tmp_path / "ns_a"), str(tmp_path / "ns_b")
    env.execute_sql("CREATE CATALOG nsc1 WITH ('type'='generic_in_memory')")
    env.execute_sql("CREATE CATALOG nsc2 WITH ('type'='generic_in_memory')")
    env.execute_sql(f"CREATE TABLE nsc1.default.t (id BIGINT, tag STRING) WITH ('path'='{pa_}')")
    env.execute_sql(f"CREATE TABLE nsc2.default.t (id BIGINT, other DOUBLE) WITH ('path'='{pb}')")

    # INSERT into each scope through qualified names
    env.execute_sql("INSERT INTO nsc1.default.t SELECT 1, 'one'")
    env.execute_sql("INSERT INTO nsc2.default.t SELECT 2, CAST(2.5 AS DOUBLE)")

    # USE switching: the bare name resolves per scope
    env.execute_sql("USE CATALOG nsc1")
    assert [(r.id, r.tag) for r in env.execute_sql("SELECT id, tag FROM t")] == [(1, "one")]
    assert env.execute_sql("SHOW TABLES") == ["t"]
    # scoped SHOW CREATE TABLE prints the LOGICAL name and this scope's schema
    ddl = env.execute_sql("SHOW CREATE TABLE t")[0]
    assert ddl.startswith("CREATE TABLE t (") and "tag STRING" in ddl
    # scoped DESCRIBE
    cols = [r[0] for r in env.execute_sql("DESCRIBE t")]
    assert cols == ["id", "tag"]

    env.execute_sql("USE CATALOG nsc2")
    assert [(r.id, r.other) for r in env.execute_sql("SELECT id, other FROM t")] == [(2, 2.5)]
    ddl2 = env.execute_sql("SHOW CREATE TABLE t")[0]
    assert ddl2.startswith("CREATE TABLE t (") and "other DOUBLE" in ddl2
    # bare INSERT in the current scope
    env.execute_sql("INSERT INTO t SELECT 3, CAST(3.5 AS DOUBLE)")
    assert sorted(r.id for r in env.execute_sql("SELECT id FROM t")) == [2, 3]
    # cross-scope qualified read while standing in nsc2
    assert [r.tag for r in env.execute_sql("SELECT tag FROM nsc1.default.t")] == ["one"]

    # joins across scopes via qualified names
    rows = env.execute_sql(
        "SELECT a.tag, b.other FROM nsc1.default.t AS a "
        "JOIN nsc2.default.t AS b ON a.id + 1 = b.id"
    )
    assert [(r.tag, r.other) for r in rows] == [("one", 2.5)]

    # scoped DROP removes only this scope's table
    env.execute_sql("DROP TABLE t")  # nsc2's
    env.execute_sql("USE CATALOG nsc1")
    assert [r.id for r in env.execute_sql("SELECT id FROM t")] == [1]
    # tolerant qualified DROP (ADVICE r9): nonexistent + IF EXISTS no-ops
    env.execute_sql("DROP TABLE IF EXISTS nsc2.default.t")
    env.execute_sql("DROP TABLE IF EXISTS nsc2.default.never_was")
    with pytest.raises(ValueError, match="does not exist"):
        env.execute_sql("DROP TABLE nsc2.default.never_was")
    env.execute_sql("USE CATALOG default_catalog")
    env.execute_sql("DROP CATALOG nsc1")
    env.execute_sql("DROP CATALOG nsc2")


def test_alias_column_not_rewritten_as_relation(spark, tmp_path):
    """ADVICE r9: `SELECT b.total FROM big AS b` must NOT rewrite `b.total`
    even when `b` is a database of the current catalog containing a table
    named `total` — rewriting is restricted to relation positions."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    pt, pb = str(tmp_path / "total"), str(tmp_path / "big")
    spark.createDataFrame([(99,)], "x long").write.parquet(pt)
    spark.createDataFrame([(5,)], "total long").write.parquet(pb)
    env.execute_sql("CREATE DATABASE b")
    env.execute_sql(f"CREATE TABLE b.total (x BIGINT) WITH ('path'='{pt}')")
    env.execute_sql(f"CREATE TABLE big (total BIGINT) WITH ('path'='{pb}')")
    rows = env.execute_sql("SELECT b.total FROM big AS b")
    assert [r.total for r in rows] == [5]
    # and the genuine db.table reference still resolves in FROM position
    assert [r.x for r in env.execute_sql("SELECT x FROM b.total")] == [99]


def test_explain_details_sql_and_api(spark, tmp_path):
    """EXPLAIN with the reference's ExplainDetail surface
    (ExplainDetail.java: ESTIMATED_COST, CHANGELOG_MODE,
    JSON_EXECUTION_PLAN) — as SQL statement detail keywords and through
    TableEnvironment.explain_sql (TableEnvironment.java:401)."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    p = str(tmp_path / "exp_t")
    spark.createDataFrame([(1, 2.0)], "id long, v double").write.parquet(p)
    env.execute_sql(f"CREATE TABLE exp_t (id BIGINT, v DOUBLE) WITH ('path'='{p}')")

    cost = env.execute_sql("EXPLAIN ESTIMATED_COST SELECT v FROM exp_t WHERE id = 1")[0]
    assert "Statistics" in cost and "sizeInBytes" in cost

    mode = env.execute_sql("EXPLAIN CHANGELOG_MODE SELECT SUM(v) AS s FROM exp_t")[0]
    assert "changelogMode=[I]" in mode

    js = env.execute_sql(
        "EXPLAIN CHANGELOG_MODE, JSON_EXECUTION_PLAN SELECT v FROM exp_t"
    )[0]
    assert "changelogMode" in js and '"class"' in js

    # the plain form is unchanged
    plain = env.execute_sql("EXPLAIN SELECT 1 AS one")[0]
    assert "Physical Plan" in plain

    # API parity
    api_text = env.explain_sql("SELECT v FROM exp_t", "ESTIMATED_COST")
    assert "Statistics" in api_text
    with pytest.raises(ValueError, match="unknown ExplainDetail"):
        env.explain_sql("SELECT 1", "NOT_A_DETAIL")


def test_qualified_resolution_edge_cases(spark, tmp_path):
    """Relation-position resolution corner cases: INSERT column lists on
    qualified targets, SHOW CREATE TABLE via qualified name, EXTRACT(x
    FROM col) never treated as a relation, and window TVF texts over
    scope-mangled tables."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    env.execute_sql("CREATE CATALOG ec1 WITH ('type'='generic_in_memory')")
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    env.execute_sql(f"CREATE TABLE et (id BIGINT, ts TIMESTAMP, v DOUBLE) WITH ('path'='{p1}')")
    env.execute_sql(f"CREATE TABLE ec1.default.et (id BIGINT, ts TIMESTAMP, v DOUBLE) WITH ('path'='{p2}')")

    # INSERT with column list through a QUALIFIED (scope-mangled) target
    env.execute_sql(
        "INSERT INTO ec1.default.et (id, ts) SELECT 7, TIMESTAMP '2024-05-01 00:00:00'"
    )
    env.execute_sql("INSERT INTO et (id, v) SELECT 1, CAST(1.5 AS DOUBLE)")
    rows = env.execute_sql("SELECT id, ts, v FROM ec1.default.et")
    assert [(r.id, str(r.ts), r.v) for r in rows] == [(7, "2024-05-01 00:00:00", None)]
    assert [(r.id, r.v) for r in env.execute_sql("SELECT id, v FROM et")] == [(1, 1.5)]

    # SHOW CREATE TABLE / DESCRIBE via the qualified name print the logical name
    ddl = env.execute_sql("SHOW CREATE TABLE ec1.default.et")[0]
    assert ddl.startswith("CREATE TABLE et (")
    assert [r[0] for r in env.execute_sql("DESCRIBE ec1.default.et")] == ["id", "ts", "v"]

    # EXTRACT(DAY FROM ts): 'FROM ts' must NOT be resolved as a relation
    # (ts is a column, and there is no table named ts anywhere)
    r = env.execute_sql("SELECT EXTRACT(DAY FROM ts) AS d FROM ec1.default.et")
    assert [x.d for x in r] == [1]

    # a TUMBLE TVF text over the scope-mangled table resolves and runs
    env.execute_sql("USE CATALOG ec1")
    out = env.sql_query(
        "SELECT window_start, COUNT(*) AS n "
        "FROM TABLE(TUMBLE(TABLE et, DESCRIPTOR(ts), INTERVAL '1' HOUR)) "
        "GROUP BY window_start"
    ).execute()
    assert len(out) == 1 and out[0].n == 1
    env.execute_sql("USE CATALOG default_catalog")
    env.execute_sql("DROP CATALOG ec1")


def test_source_watermark_ddl(spark):
    # WATERMARK FOR ts AS SOURCE_WATERMARK() (FLIP-126 connector-provided
    # watermark; BuiltInFunctionDefinitions SOURCE_WATERMARK): parses,
    # SHOW CREATE round-trips the spelling, and the streaming read applies
    # the strictly-ascending (delay 0) strategy — the closest mapping for
    # replay sources with no native watermark generator.
    from incubator_flink_spark.api.table import TableEnvironment

    ddl = f"""CREATE TABLE src_wm_t (
      event_id BIGINT,
      ts TIMESTAMP,
      event_type STRING,
      WATERMARK FOR ts AS SOURCE_WATERMARK()
    ) WITH (
      'connector' = 'filesystem',
      'path' = '{SF}/events.parquet',
      'format' = 'parquet'
    )"""
    t = parse_create_table(ddl)
    assert t.watermark == ("ts", None)

    env = TableEnvironment(spark)
    env.execute_sql(ddl)
    out = env.execute_sql("SHOW CREATE TABLE src_wm_t")[0]
    ddl_text = out[0] if not isinstance(out, str) else out
    assert "SOURCE_WATERMARK()" in str(ddl_text)
    # round trip: the reconstructed DDL parses back to the same watermark
    t2 = parse_create_table(str(ddl_text))
    assert t2.watermark == ("ts", None)
    # batch read still works (watermark applies on streaming reads only)
    assert env.sql_query("SELECT COUNT(*) AS n FROM src_wm_t").to_df().collect()[0].n > 0
    env.execute_sql("DROP TABLE src_wm_t")


def test_legacy_group_window_sql_rewrite(spark):
    # Legacy GROUP BY TUMBLE/HOP/SESSION grammar with *_START/_END/
    # _ROWTIME auxiliaries (pre-TVF group windows; planner
    # LogicalWindowAggregate) — rewritten onto Spark's native window()/
    # session_window() grouping by api/tvf.rewrite_legacy_group_windows.
    from incubator_flink_spark.api.table import TableEnvironment
    from incubator_flink_spark.api.tvf import rewrite_legacy_group_windows

    env = TableEnvironment(spark)
    spark.read.parquet(f"{SF}/events.parquet").createOrReplaceTempView("lgw_ev")

    r = env.sql_query(
        """
        SELECT event_type,
               TUMBLE_START(ts, INTERVAL '1' DAY) AS ws,
               TUMBLE_END(ts, INTERVAL '1' DAY) AS we,
               TUMBLE_ROWTIME(ts, INTERVAL '1' DAY) AS rt,
               COUNT(*) AS n
        FROM lgw_ev GROUP BY event_type, TUMBLE(ts, INTERVAL '1' DAY)
        ORDER BY event_type, ws LIMIT 1
        """
    ).to_df().collect()[0]
    assert (r.we - r.ws).total_seconds() == 86400
    # Flink's rowtime attribute is window_end - 1ms
    assert (r.we - r.rt).total_seconds() == 0.001

    # HOP: legacy argument order is (ts, slide, size); every row lands in
    # size/slide = 2 windows, so the hop-window counts sum to 2x the rows
    hop = env.sql_query(
        """
        SELECT HOP_START(ts, INTERVAL '12' HOUR, INTERVAL '1' DAY) AS ws, COUNT(*) AS n
        FROM lgw_ev GROUP BY HOP(ts, INTERVAL '12' HOUR, INTERVAL '1' DAY)
        """
    ).to_df()
    total = spark.read.parquet(f"{SF}/events.parquet").count()
    assert hop.agg(F.sum("n")).collect()[0][0] == 2 * total

    # SESSION: gap-merged windows through session_window()
    sess = env.sql_query(
        """
        SELECT event_type, SESSION_START(ts, INTERVAL '2' HOUR) AS ss,
               SESSION_END(ts, INTERVAL '2' HOUR) AS se, COUNT(*) AS n
        FROM lgw_ev GROUP BY event_type, SESSION(ts, INTERVAL '2' HOUR)
        """
    ).to_df()
    assert sess.agg(F.sum("n")).collect()[0][0] == total

    # the rewrite leaves TVF fragments alone (TABLE(TUMBLE(TABLE ...)) is
    # handled by rewrite_window_tvf first) and non-window SQL untouched
    assert rewrite_legacy_group_windows("SELECT 1") == "SELECT 1"
    assert "window(ts, '1 day')" in rewrite_legacy_group_windows(
        "GROUP BY TUMBLE(ts, INTERVAL '1' DAY)"
    )


def test_create_table_as_select(spark, tmp_path):
    # CTAS (FLIP-218; reference CreateTableASOperation): schema derived
    # from the query, table created through the connector, query result
    # inserted through the sink — filesystem materializes before the DDL
    # registers (eager path read), kafka uses the sink-first path.
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    spark.read.parquet(f"{SF}/nation.parquet").createOrReplaceTempView("ctas_nation")

    p = str(tmp_path / "ctas_fs")
    env.execute_sql(f"""
        CREATE TABLE ctas_fs_t WITH (
          'connector' = 'filesystem', 'path' = '{p}', 'format' = 'parquet'
        ) AS SELECT n_regionkey, COUNT(*) AS n FROM ctas_nation GROUP BY n_regionkey
    """)
    rows = env.execute_sql("SELECT * FROM ctas_fs_t ORDER BY n_regionkey")
    assert [(r.n_regionkey, r.n) for r in rows] == [(i, 5) for i in range(5)]
    # derived schema round-trips through SHOW CREATE
    ddl = str(env.execute_sql("SHOW CREATE TABLE ctas_fs_t")[0])
    assert "n_regionkey INT" in ddl and "n BIGINT" in ddl
    # the files are really at rest at the declared path
    assert spark.read.parquet(p).count() == 5

    # CTAS into a kafka sink-first table (JSON frame serializer)
    kp = str(tmp_path / "ctas_kafka")
    env.execute_sql(f"""
        CREATE TABLE ctas_k_t WITH (
          'connector' = 'kafka', 'topic' = 'ctas_t',
          'properties.bootstrap.servers' = 'localhost:9092',
          'frames-path' = '{kp}', 'format' = 'json'
        ) AS SELECT n_nationkey AS k, n_name AS v FROM ctas_nation
    """)
    assert len(env.execute_sql("SELECT * FROM ctas_k_t")) == 25

    # no connector -> the reference's error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="connector"):
        env.execute_sql("CREATE TABLE ctas_bad AS SELECT 1 AS x")

    # a column list after the name still parses as PLAIN create (the
    # computed-column AS inside the schema must not trigger CTAS)
    p2 = str(tmp_path / "plain")
    spark.read.parquet(f"{SF}/nation.parquet").write.parquet(p2)
    env.execute_sql(f"""
        CREATE TABLE ctas_plain_t (
          n_nationkey BIGINT,
          n_name STRING,
          name_upper AS UPPER(n_name)
        ) WITH (
          'connector' = 'filesystem', 'path' = '{p2}', 'format' = 'parquet'
        )
    """)
    r = env.execute_sql("SELECT name_upper FROM ctas_plain_t WHERE n_nationkey = 0")
    assert len(r) == 1
    env.execute_sql("DROP TABLE ctas_fs_t")
    env.execute_sql("DROP TABLE ctas_k_t")
    env.execute_sql("DROP TABLE ctas_plain_t")


def test_show_partitions_jars_describe_catalog(spark, tmp_path):
    # SqlShowPartitions / SqlShowJars / SqlDescribeCatalog /
    # SqlDescribeDatabase (reference flink-sql-parser dql package).
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    p = str(tmp_path / "part_t")
    spark.read.parquet(f"{SF}/nation.parquet").write.partitionBy("n_regionkey").parquet(p)
    env.execute_sql(f"""
        CREATE TABLE part_t (
          n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT
        ) PARTITIONED BY (n_regionkey) WITH (
          'connector' = 'filesystem', 'path' = '{p}', 'format' = 'parquet'
        )
    """)
    parts = env.execute_sql("SHOW PARTITIONS part_t")
    assert parts == [f"n_regionkey={i}" for i in range(5)]
    # partial-spec filter
    assert env.execute_sql("SHOW PARTITIONS part_t PARTITION (n_regionkey=3)") == [
        "n_regionkey=3"
    ]
    # not-partitioned -> error
    import pytest as _pytest

    p2 = str(tmp_path / "unpart")
    spark.read.parquet(f"{SF}/region.parquet").write.parquet(p2)
    env.execute_sql(f"""
        CREATE TABLE unpart_t (r_regionkey BIGINT) WITH (
          'connector' = 'filesystem', 'path' = '{p2}', 'format' = 'parquet'
        )
    """)
    with _pytest.raises(ValueError, match="not partitioned"):
        env.execute_sql("SHOW PARTITIONS unpart_t")

    assert env.execute_sql("SHOW JARS") == []
    assert ("type", "generic_in_memory") in env.execute_sql(
        "DESCRIBE CATALOG default_catalog"
    )
    assert ("name", "default_database") in env.execute_sql(
        "DESCRIBE DATABASE default_database"
    )
    with _pytest.raises(ValueError, match="does not exist"):
        env.execute_sql("DESCRIBE CATALOG nope")
    env.execute_sql("DROP TABLE part_t")
    env.execute_sql("DROP TABLE unpart_t")


def test_create_alter_database_properties(spark):
    # SqlCreateDatabase COMMENT/WITH properties + SqlAlterDatabase SET
    # (AlterDatabaseOperation merges into the CatalogDatabase).
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    env.execute_sql(
        "CREATE DATABASE props_db COMMENT 'analytics scratch' "
        "WITH ('owner' = 'data-eng', 'tier' = 'bronze')"
    )
    d = dict(env.execute_sql("DESCRIBE DATABASE props_db"))
    assert d["comment"] == "analytics scratch"
    assert d["owner"] == "data-eng" and d["tier"] == "bronze"
    env.execute_sql("ALTER DATABASE props_db SET ('tier' = 'silver', 'pii' = 'false')")
    d = dict(env.execute_sql("DESCRIBE DATABASE props_db"))
    assert d["tier"] == "silver" and d["pii"] == "false" and d["owner"] == "data-eng"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="does not exist"):
        env.execute_sql("ALTER DATABASE nope SET ('a' = 'b')")
    env.execute_sql("DROP DATABASE props_db")
    with _pytest.raises(ValueError, match="does not exist"):
        env.execute_sql("DESCRIBE DATABASE props_db")


def test_add_drop_partition(spark, tmp_path):
    # SqlAddPartitions / SqlDropPartitions: filesystem partitions are
    # hive-style directories — ADD creates an empty one (visible to SHOW
    # PARTITIONS' directory listing), DROP removes directory + data and
    # refreshes the registered view so scans prune the deleted files.
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    p = str(tmp_path / "adp")
    spark.read.parquet(f"{SF}/nation.parquet").write.partitionBy("n_regionkey").parquet(p)
    env.execute_sql(f"""
        CREATE TABLE adp_t (
          n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT
        ) PARTITIONED BY (n_regionkey) WITH (
          'connector' = 'filesystem', 'path' = '{p}', 'format' = 'parquet'
        )
    """)
    env.execute_sql("ALTER TABLE adp_t ADD PARTITION (n_regionkey=9)")
    assert "n_regionkey=9" in env.execute_sql("SHOW PARTITIONS adp_t")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="already exists"):
        env.execute_sql("ALTER TABLE adp_t ADD PARTITION (n_regionkey=9)")
    env.execute_sql("ALTER TABLE adp_t ADD IF NOT EXISTS PARTITION (n_regionkey=9)")

    env.execute_sql("ALTER TABLE adp_t DROP PARTITION (n_regionkey=3)")
    assert "n_regionkey=3" not in env.execute_sql("SHOW PARTITIONS adp_t")
    # data really pruned from scans
    rows = env.execute_sql("SELECT DISTINCT n_regionkey FROM adp_t ORDER BY n_regionkey")
    assert [r.n_regionkey for r in rows] == [0, 1, 2, 4]
    with _pytest.raises(ValueError, match="does not exist"):
        env.execute_sql("ALTER TABLE adp_t DROP PARTITION (n_regionkey=3)")
    env.execute_sql("ALTER TABLE adp_t DROP IF EXISTS PARTITION (n_regionkey=3)")
    # partial/wrong spec names must be rejected
    with _pytest.raises(ValueError, match="partition columns"):
        env.execute_sql("ALTER TABLE adp_t ADD PARTITION (nope=1)")
    env.execute_sql("DROP TABLE adp_t")


def test_alter_table_add_replace_change_columns(spark, tmp_path):
    # SqlAddReplaceColumns + SqlChangeColumn (SqlToOperationConverter
    # convertAlterTableAddReplaceColumn / convertChangeColumn): declared-
    # schema evolution over files at rest; absent columns scan as NULLs.
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    p = str(tmp_path / "evolve")
    spark.createDataFrame(
        [(1, "a", 10.5), (2, "b", 20.5)], "id long, s string, v double"
    ).write.parquet(p)
    env.execute_sql(f"""
        CREATE TABLE ev_t (id BIGINT, s STRING, v DOUBLE) WITH (
          'connector' = 'filesystem', 'path' = '{p}', 'format' = 'parquet'
        )
    """)
    env.execute_sql("ALTER TABLE ev_t ADD COLUMNS (tag STRING, score BIGINT)")
    r = env.execute_sql("SELECT id, tag, score FROM ev_t ORDER BY id")
    assert [(x.id, x.tag, x.score) for x in r] == [(1, None, None), (2, None, None)]
    d = env.execute_sql("DESC ev_t")
    assert any(row[0] == "tag" for row in d)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="already exists"):
        env.execute_sql("ALTER TABLE ev_t ADD COLUMNS (tag STRING)")

    # CHANGE: retype + reposition (no rename on files at rest)
    env.execute_sql("ALTER TABLE ev_t CHANGE COLUMN v v DECIMAL(10,2) FIRST")
    r2 = env.execute_sql("SELECT * FROM ev_t ORDER BY id")
    assert r2[0].__fields__[0] == "v"
    assert str(r2[0].v) == "10.50"
    with _pytest.raises(ValueError, match="cannot rename"):
        env.execute_sql("ALTER TABLE ev_t CHANGE COLUMN s renamed STRING")

    # REPLACE swaps the whole declared schema
    env.execute_sql("ALTER TABLE ev_t REPLACE COLUMNS (id BIGINT, s STRING)")
    assert sorted(env.sql_query("SELECT * FROM ev_t").to_df().columns) == ["id", "s"]
    env.execute_sql("DROP TABLE ev_t")


def test_add_remove_show_jars(spark, tmp_path):
    # SqlAddJar / SqlRemoveJar / SqlShowJars: session-level registration
    # bookkeeping (JVM class loading is not available in a Python-only
    # session — CREATE FUNCTION ... USING JAR still raises).
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    jar = tmp_path / "udfs.jar"
    jar.write_bytes(b"PK\x03\x04fake")
    env.execute_sql(f"ADD JAR '{jar}'")
    assert env.execute_sql("SHOW JARS") == [str(jar)]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="does not exist"):
        env.execute_sql("ADD JAR '/no/such.jar'")
    env.execute_sql(f"REMOVE JAR '{jar}'")
    assert env.execute_sql("SHOW JARS") == []
    with _pytest.raises(ValueError, match="was not added"):
        env.execute_sql(f"REMOVE JAR '{jar}'")
