"""Flink-named scalar functions on the Spark SQL surface.

functions/compat.py gives Column-level builders for Flink names missing
from Spark; this module registers the same semantics as **SQL UDFs**
(``CREATE OR REPLACE TEMPORARY FUNCTION … RETURN <expr>``, Spark 4) so a
reference user's SQL text runs through ``spark.sql`` / ``TableEnvironment
.sql_query`` unmodified.  SQL UDF bodies are inlined into the Catalyst
plan at analysis time — they are pure expressions, not Python UDFs, so
whole-stage codegen and pushdown behave exactly as if the expansion had
been written inline (verified in tests/test_api.py).

Reference: flink-table/flink-table-common/src/main/java/org/apache/
flink/table/functions/BuiltInFunctionDefinitions.java (SPLIT_INDEX,
IS_DECIMAL/IS_DIGIT/IS_ALPHA, HASH_CODE, TO_BASE64/FROM_BASE64,
RAND_INTEGER, TRUNCATE, TO_TIMESTAMP_LTZ, CONVERT_TZ, JSON_VALUE/
JSON_EXISTS).

Documented divergences (same as the Column layer):
- SPLIT_INDEX's separator is a Java regex (Spark ``split``), where Flink
  treats it as a literal string; out-of-range / negative indices return
  NULL (Flink behavior) via ``try_element_at``.
- HASH_CODE is the engine's portable 60-bit md5 hash, not Java
  ``String.hashCode`` (so engine and DuckDB oracles agree).
- JSON_VALUE/JSON_EXISTS support the ``$.a.b`` path subset
  (``get_json_object``), not SQL/JSON strict/lax modes.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (signature, RETURNS type, body expression)
_SQL_FUNCS: dict[str, tuple[str, str, str]] = {
    "SPLIT_INDEX": (
        "(s STRING, sep STRING, i INT)",
        "STRING",
        "CASE WHEN i < 0 THEN CAST(NULL AS STRING) "
        "ELSE try_element_at(split(s, sep), i + 1) END",
    ),
    "IS_DECIMAL": (
        "(s STRING)",
        "BOOLEAN",
        r"s RLIKE '^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)$'",
    ),
    "IS_DIGIT": ("(s STRING)", "BOOLEAN", "s RLIKE '^[0-9]+$'"),
    "IS_ALPHA": ("(s STRING)", "BOOLEAN", "s RLIKE '^[A-Za-z]+$'"),
    "HASH_CODE": (
        "(s STRING)",
        "BIGINT",
        "CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)",
    ),
    "TO_BASE64": ("(s STRING)", "STRING", "base64(CAST(s AS BINARY))"),
    "FROM_BASE64": ("(s STRING)", "STRING", "CAST(unbase64(s) AS STRING)"),
    "RAND_INTEGER": ("(n INT)", "INT", "CAST(floor(rand() * n) AS INT)"),
    "TRUNCATE": (
        "(x DOUBLE, d INT DEFAULT 0)",
        "DOUBLE",
        "CAST(x * power(10, d) AS BIGINT) / power(10, d)",
    ),
    # TO_TIMESTAMP_LTZ is NOT here: Spark 4 ships a builtin of that name
    # (string signature) which session functions cannot shadow; the
    # numeric-epoch Flink form lives in compat.to_timestamp_ltz.
    "CONVERT_TZ": (
        "(s STRING, tz1 STRING, tz2 STRING)",
        "STRING",
        "date_format(from_utc_timestamp(to_utc_timestamp(to_timestamp(s), tz1), tz2), "
        "'yyyy-MM-dd HH:mm:ss')",
    ),
    "JSON_VALUE": ("(j STRING, p STRING)", "STRING", "get_json_object(j, p)"),
    "JSON_EXISTS": ("(j STRING, p STRING)", "BOOLEAN", "get_json_object(j, p) IS NOT NULL"),
    # SQL/JSON (FLIP-90): JSON_QUERY returns only OBJECT/ARRAY results
    # (scalars -> NULL under WITHOUT ARRAY WRAPPER + NULL ON ERROR);
    # JSON_STRING serializes a scalar through Spark's own JSON encoder
    # (struct-wrapped, '{"v":' envelope stripped); IS_JSON is the
    # function spelling of the `x IS JSON` predicate (Calcite grammar —
    # unparseable by Spark, same policy as TEMPORAL_OVERLAPS).  The
    # KEY/VALUE-syntax constructors and aggregates live in
    # functions/compat.py (json_object/json_array/json_objectagg/...).
    "JSON_QUERY": (
        "(j STRING, p STRING)",
        "STRING",
        "CASE WHEN substring(get_json_object(j, p), 1, 1) IN ('{', '[') "
        "THEN get_json_object(j, p) END",
    ),
    "JSON_STRING": (
        "(s STRING)",
        "STRING",
        "CASE WHEN s IS NOT NULL THEN substring(to_json(named_struct('v', s)), 6, "
        "length(to_json(named_struct('v', s))) - 6) END",
    ),
    "IS_JSON": ("(s STRING)", "BOOLEAN", "try_parse_json(s) IS NOT NULL"),
    # CURRENT_WATERMARK(rowtime) — BuiltInFunctionDefinitions
    # CURRENT_WATERMARK: "returns NULL if no common watermark has been
    # emitted yet".  Bounded/batch execution never emits a watermark, so
    # NULL is the reference's own answer on this engine's batch SQL
    # surface; inside stateful streaming operators the equivalent clock is
    # GroupState.getCurrentWatermarkMs (streaming/triggers.py uses it).
    "CURRENT_WATERMARK": ("(ts TIMESTAMP)", "TIMESTAMP", "CAST(NULL AS TIMESTAMP)"),
    # Flink's fixed-width SHA-2 family names (FlinkSqlOperatorTable:
    # SHA224/SHA256/SHA384/SHA512) — Spark spells them sha2(x, bits)
    "SHA224": ("(s STRING)", "STRING", "sha2(s, 224)"),
    "SHA256": ("(s STRING)", "STRING", "sha2(s, 256)"),
    "SHA384": ("(s STRING)", "STRING", "sha2(s, 384)"),
    "SHA512": ("(s STRING)", "STRING", "sha2(s, 512)"),
    # CURRENT_ROW_TIMESTAMP() — DOCUMENTED DIVERGENCE: the reference
    # evaluates this per ROW (FlinkSqlOperatorTable CURRENT_ROW_TIMESTAMP,
    # isDeterministic=false), but Spark's now() is a query-scoped constant
    # (one value per query execution, like CURRENT_TIMESTAMP).  Within one
    # micro-batch/job the reference's per-row values differ only by
    # intra-job wall-clock skew, so a query-constant stamp is the closest
    # Catalyst-native semantics; callers needing strictly monotone per-row
    # stamps should use a monotonically_increasing_id tiebreaker.  Same
    # class of divergence as compat.proctime's note.
    "CURRENT_ROW_TIMESTAMP": ("()", "TIMESTAMP", "now()"),
    # SQL-standard (s1, e1) OVERLAPS (s2, e2) — Spark has no OVERLAPS
    # operator, so the Flink Table-API name TEMPORAL_OVERLAPS is the SQL
    # spelling here (periods normalized, bounds inclusive)
    "TEMPORAL_OVERLAPS": (
        "(s1 TIMESTAMP, e1 TIMESTAMP, s2 TIMESTAMP, e2 TIMESTAMP)",
        "BOOLEAN",
        "least(s1, e1) <= greatest(s2, e2) AND least(s2, e2) <= greatest(s1, e1)",
    ),
}


def register_flink_sql_functions(spark: SparkSession) -> list[str]:
    """Register every Flink-compat SQL function in the session (temporary,
    session-scoped, idempotent). Returns the registered names."""
    for name, (sig, ret, body) in _SQL_FUNCS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} RETURNS {ret} RETURN {body}"
        )
    return list(_SQL_FUNCS)
