"""Scalar function surface coverage (SURVEY.md §2.7 — reference
BuiltInFunctionDefinitions.java families): string, math, temporal,
conditional, hash, JSON, and collection functions, each exercised
end-to-end with a DuckDB oracle.

Determinism: transcendentals (exp/ln/trig) can differ between libm
implementations at the last ulp, so they are ROUND()ed to 6 decimals in
both engines; integer/string/date functions are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load
from incubator_flink_spark.functions import compat
from incubator_flink_spark.queries.registry import register

SCALAR_STRING_ORACLE = """
SELECT n_nationkey,
       upper(n_name) AS up, lower(n_name) AS lo,
       length(n_name) AS len,
       substring(n_name, 1, 6) AS sub,
       lpad(n_name, 12, '*') AS lp, rpad(n_name, 12, '*') AS rp,
       replace(n_name, 'NATION', 'N') AS repl,
       reverse(n_name) AS rev,
       split_part(n_name, '_', 2) AS idx_part,
       strpos(n_name, '_') AS pos,
       repeat('ab', 3) AS rep,
       concat_ws('-', n_name, 'x') AS cw,
       left(n_name, 3) AS l3, right(n_name, 2) AS r2,
       ascii(n_name) AS asc_first,
       chr(65 + (n_nationkey % 26)) AS ch,
       trim('  pad  ') AS trimmed,
       ltrim('  pad  ') AS ltrimmed, rtrim('  pad  ') AS rtrimmed,
       translate(n_name, 'AON', 'aon') AS transl,
       regexp_replace(n_name, '[0-9]+', '#', 'g') AS rerepl,
       regexp_extract(n_name, '([0-9]+)', 1) AS reext,
       n_name LIKE 'NATION%' AS like_m,
       regexp_matches(n_name, '^NATION_[0-9]+$') AS re_m,
       to_base64(encode(n_name)) AS b64
FROM nation ORDER BY n_nationkey
"""


@register("scalar_string_funcs", SCALAR_STRING_ORACLE)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    s = F.col("n_name")
    return n.select(
        "n_nationkey",
        F.upper(s).alias("up"),
        F.lower(s).alias("lo"),
        F.length(s).alias("len"),
        F.substring(s, 1, 6).alias("sub"),
        F.lpad(s, 12, "*").alias("lp"),
        F.rpad(s, 12, "*").alias("rp"),
        F.replace(s, F.lit("NATION"), F.lit("N")).alias("repl"),
        F.reverse(s).alias("rev"),
        compat.split_index(s, "_", 1).alias("idx_part"),
        F.instr(s, "_").cast("bigint").alias("pos"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
        F.concat_ws("-", s, F.lit("x")).alias("cw"),
        F.substring(s, 1, 3).alias("l3"),
        s.substr(F.length(s) - 1, F.lit(2)).alias("r2"),
        F.ascii(s).alias("asc_first"),
        F.chr(F.lit(65) + (F.col("n_nationkey") % 26)).alias("ch"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
        F.ltrim(F.lit("  pad  ")).alias("ltrimmed"),
        F.rtrim(F.lit("  pad  ")).alias("rtrimmed"),
        F.translate(s, "AON", "aon").alias("transl"),
        F.regexp_replace(s, "[0-9]+", "#").alias("rerepl"),
        F.regexp_extract(s, "([0-9]+)", 1).alias("reext"),
        s.like("NATION%").alias("like_m"),
        s.rlike("^NATION_[0-9]+$").alias("re_m"),
        compat.to_base64(s).alias("b64"),
    ).orderBy("n_nationkey")


SCALAR_MATH_ORACLE = """
SELECT p_partkey,
       abs(p_retailprice - 1000.0) AS ab,
       CAST(ceil(p_retailprice) AS BIGINT) AS ce, CAST(floor(p_retailprice) AS BIGINT) AS fl,
       round(p_retailprice, 1) AS rnd,
       sqrt(p_retailprice) AS sq,
       CAST(p_size % 7 AS INTEGER) AS md,
       CAST(sign(p_retailprice - 1000.0) AS DOUBLE) AS sg,
       power(CAST(p_size AS DOUBLE), 2.0) AS pw,
       ROUND(exp(p_size / 100.0), 6) AS ex,
       ROUND(ln(p_retailprice), 6) AS lg,
       ROUND(log10(p_retailprice), 6) AS lg10,
       ROUND(log2(CAST(p_size AS DOUBLE)), 6) AS lg2,
       ROUND(sin(p_size / 10.0), 6) AS sn,
       ROUND(cos(p_size / 10.0), 6) AS cs,
       ROUND(atan2(CAST(p_size AS DOUBLE), 7.0), 6) AS at2,
       ROUND(degrees(p_size / 10.0), 6) AS dg,
       ROUND(radians(CAST(p_size AS DOUBLE)), 6) AS rd,
       ROUND(pi(), 6) AS pi_c,
       CAST(CAST(p_retailprice * 10 AS BIGINT) AS DOUBLE) / 10 AS trunc1,
       hex(p_size) AS hx,
       CAST(p_size AS VARCHAR) AS casted
FROM part WHERE p_partkey < 200 ORDER BY p_partkey
"""


@register("scalar_math_funcs", SCALAR_MATH_ORACLE)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").where(F.col("p_partkey") < 200)
    price = F.col("p_retailprice")
    size = F.col("p_size")
    return p.select(
        "p_partkey",
        F.abs(price - 1000.0).alias("ab"),
        F.ceil(price).alias("ce"),
        F.floor(price).alias("fl"),
        F.round(price, 1).alias("rnd"),
        F.sqrt(price).alias("sq"),
        (size % 7).alias("md"),
        F.signum(price - 1000.0).alias("sg"),
        F.pow(size.cast("double"), 2.0).alias("pw"),
        F.round(F.exp(size / 100.0), 6).alias("ex"),
        F.round(F.log(price), 6).alias("lg"),
        F.round(F.log10(price), 6).alias("lg10"),
        F.round(F.log2(size.cast("double")), 6).alias("lg2"),
        F.round(F.sin(size / 10.0), 6).alias("sn"),
        F.round(F.cos(size / 10.0), 6).alias("cs"),
        F.round(F.atan2(size.cast("double"), F.lit(7.0)), 6).alias("at2"),
        F.round(F.degrees(size / 10.0), 6).alias("dg"),
        F.round(F.radians(size.cast("double")), 6).alias("rd"),
        F.round(F.lit(3.141592653589793), 6).alias("pi_c"),
        compat.truncate(price, 1).alias("trunc1"),
        F.upper(F.hex(size)).alias("hx"),
        size.cast("string").alias("casted"),
    ).orderBy("p_partkey")


SCALAR_TEMPORAL_ORACLE = """
SELECT o_orderkey,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS mo,
       CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS dy,
       CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS qtr,
       CAST(EXTRACT(DOY FROM o_orderdate) AS INTEGER) AS doy,
       CAST(EXTRACT(WEEK FROM o_orderdate) AS INTEGER) AS wk,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mstart,
       o_orderdate + INTERVAL 30 DAY AS plus30,
       o_orderdate - INTERVAL 1 HOUR AS minus1h,
       CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER) AS days_since,
       epoch_us(o_orderdate) AS us,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS ld,
       strftime(o_orderdate, '%Y-%m-%d') AS fmt,
       CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS d
FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey
"""


@register("scalar_temporal_funcs", SCALAR_TEMPORAL_ORACLE)
def scalar_temporal_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") < 300)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dy"),
        F.quarter(d).alias("qtr"),
        F.dayofyear(d).alias("doy"),
        F.weekofyear(d).alias("wk"),
        F.date_trunc("month", d).alias("mstart"),
        (d + F.expr("INTERVAL 30 DAY")).alias("plus30"),
        (d - F.expr("INTERVAL 1 HOUR")).alias("minus1h"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since"),
        F.unix_micros(d.cast("timestamp")).alias("us"),
        # DATE results are final-cast to TIMESTAMP: the driver's pandas
        # compare turns DuckDB DATE into datetime64 but Spark DATE into
        # python date objects, which would hash-mismatch (values equal).
        F.last_day(d.cast("date")).cast("timestamp").alias("ld"),
        F.date_format(d, "yyyy-MM-dd").alias("fmt"),
        d.cast("date").cast("timestamp").alias("d"),
    ).orderBy("o_orderkey")


SCALAR_CONDITIONAL_ORACLE = """
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS tier,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
       IFNULL(NULLIF(c_nationkey, 0), -1) AS natk,
       CASE WHEN c_acctbal BETWEEN 1000 AND 2000 THEN 1 ELSE 0 END AS in_band,
       GREATEST(c_acctbal, 5000.0) AS gr, LEAST(c_acctbal, 5000.0) AS le,
       c_mktsegment IN ('MACHINERY', 'FURNITURE') AS seg_in,
       c_acctbal IS NOT NULL AS nn,
       CASE WHEN c_custkey % 2 = 0 THEN NULL ELSE c_custkey END AS maybe_null
FROM customer WHERE c_custkey < 300 ORDER BY c_custkey
"""


@register("scalar_conditional_funcs", SCALAR_CONDITIONAL_ORACLE)
def scalar_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") < 300)
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "neg").when(bal < 5000, "mid").otherwise("high").alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias("seg"),
        F.ifnull(F.nullif(F.col("c_nationkey"), F.lit(0)), F.lit(-1)).alias("natk"),
        F.when(bal.between(1000, 2000), 1).otherwise(0).alias("in_band"),
        F.greatest(bal, F.lit(5000.0)).alias("gr"),
        F.least(bal, F.lit(5000.0)).alias("le"),
        F.col("c_mktsegment").isin("MACHINERY", "FURNITURE").alias("seg_in"),
        bal.isNotNull().alias("nn"),
        F.when(F.col("c_custkey") % 2 == 0, F.lit(None).cast("bigint")).otherwise(F.col("c_custkey")).alias("maybe_null"),
    ).orderBy("c_custkey")


SCALAR_HASH_ORACLE = """
SELECT n_nationkey,
       md5(n_name) AS m5,
       sha256(n_name) AS s256,
       CAST(('0x' || substring(md5(n_name), 1, 15)) AS BIGINT) AS hash_code
FROM nation ORDER BY n_nationkey
"""


@register("scalar_hash_funcs", SCALAR_HASH_ORACLE)
def scalar_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    s = F.col("n_name")
    return n.select(
        "n_nationkey",
        F.md5(s).alias("m5"),
        F.sha2(s, 256).alias("s256"),
        compat.hash_code(s).alias("hash_code"),
    ).orderBy("n_nationkey")


SCALAR_JSON_ORACLE = """
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
       json_extract_string(props, '$.missing') AS missing,
       json_valid(props) AS is_json
FROM events WHERE event_id < 300 ORDER BY event_id
"""


@register("scalar_json_funcs", SCALAR_JSON_ORACLE)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # JSON surface (Flink 1.14's Calcite JSON ops lack a runtime —
    # SURVEY.md §2.7; Spark's JSON functions are the superset).
    e = load(spark, sf_dir, "events").where(F.col("event_id") < 300)
    p = F.col("props")
    return e.select(
        "event_id",
        F.get_json_object(p, "$.k").alias("k_str"),
        F.get_json_object(p, "$.k").cast("bigint").alias("k_int"),
        F.get_json_object(p, "$.missing").alias("missing"),
        F.when(F.try_parse_json(p).isNotNull(), True).otherwise(False).alias("is_json"),
    ).orderBy("event_id")


SCALAR_COLLECTION_ORACLE = """
SELECT doc_id,
       len(toks) AS cardinality,
       toks[1] AS first_tok,
       toks[len(toks)] AS last_tok,
       list_contains(toks, 'spark') AS has_spark,
       array_to_string(toks[1:3], '|') AS first3,
       list_sort(toks[1:5])[1] AS min_of_first5,
       len(list_distinct(toks)) AS n_distinct
FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents WHERE doc_id < 50) t
ORDER BY doc_id
"""


@register("scalar_collection_funcs", SCALAR_COLLECTION_ORACLE)
def scalar_collection_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    toks = F.split(F.lower(F.col("text")), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("cardinality"),
        toks.getItem(0).alias("first_tok"),
        F.element_at(toks, -1).alias("last_tok"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.slice(toks, 1, 3), "|").alias("first3"),
        F.array_min(F.slice(toks, 1, 5)).alias("min_of_first5"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
    ).orderBy("doc_id")


SCALAR_STRING2_ORACLE = """
SELECT event_id,
       regexp_extract('https://example.com:8443/docs/page?q=spark&lang=en', 'https?://([^/:]+)', 1) AS url_host,
       regexp_extract('https://example.com:8443/docs/page?q=spark&lang=en', '\\?(.*)$', 1) AS url_query,
       regexp_extract('https://example.com:8443/docs/page?q=spark&lang=en', '[?&]q=([^&]*)', 1) AS url_q_param,
       array_to_string(list_sort(list_transform(string_split('a=1;b=2;c=3', ';'), kv -> kv)), ',') AS kv_pairs,
       substring('abcdefgh', 1, 2) || 'XY' || substring('abcdefgh', 5) AS overlaid,
       position('rk' IN 'spark-engine') AS pos_rk,
       strpos(props, 'k') AS pos_in_props
FROM events WHERE event_id < 100 ORDER BY event_id
"""


@register("scalar_string_funcs2", SCALAR_STRING2_ORACLE)
def scalar_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PARSE_URL / STR_TO_MAP / OVERLAY / POSITION parity (reference
    # BuiltInFunctionDefinitions PARSE_URL, STR_TO_MAP, OVERLAY, POSITION).
    # Spark uses its native functions; the oracle replicates via regexp /
    # split so results — not implementations — are compared.
    e = load(spark, sf_dir, "events").where(F.col("event_id") < 100)
    url = F.lit("https://example.com:8443/docs/page?q=spark&lang=en")
    kv = F.str_to_map(F.lit("a=1;b=2;c=3"), F.lit(";"), F.lit("="))
    kv_str = F.array_join(
        F.array_sort(F.transform(F.map_entries(kv), lambda x: F.concat_ws("=", x["key"], x["value"]))), ","
    )
    return e.select(
        "event_id",
        F.parse_url(url, F.lit("HOST")).alias("url_host"),
        F.parse_url(url, F.lit("QUERY")).alias("url_query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("q")).alias("url_q_param"),
        kv_str.alias("kv_pairs"),
        F.overlay(F.lit("abcdefgh"), F.lit("XY"), 3, 2).alias("overlaid"),
        F.instr(F.lit("spark-engine"), "rk").cast("bigint").alias("pos_rk"),
        F.instr(F.col("props"), "k").cast("bigint").alias("pos_in_props"),
    ).orderBy("event_id")


JSON_CONSTRUCT_ORACLE = """
SELECT event_id,
       to_json(struct_pack(id := event_id, etype := event_type)) AS obj,
       to_json(struct_pack(m := CAST(NULL AS VARCHAR), id := event_id)) AS obj_null,
       to_json([event_id, user_id]) AS arr,
       to_json(event_type) AS jstr,
       CASE WHEN substring(CAST(json_extract(props, '$') AS VARCHAR), 1, 1) IN ('{', '[')
            THEN CAST(json_extract(props, '$') AS VARCHAR) END AS q_obj,
       CASE WHEN substring(CAST(json_extract(props, '$.k') AS VARCHAR), 1, 1) IN ('{', '[')
            THEN CAST(json_extract(props, '$.k') AS VARCHAR) END AS q_scalar,
       json_valid(props) AS isj_value,
       json_valid(props) AND substring(ltrim(props), 1, 1) = '{' AS isj_object,
       json_valid(props) AND substring(ltrim(props), 1, 1) = '[' AS isj_array
FROM events WHERE event_id < 300 ORDER BY event_id
"""


@register("json_construct_funcs", JSON_CONSTRUCT_ORACLE)
def json_construct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL/JSON constructor surface (FLIP-90; reference
    BuiltInFunctionDefinitions JSON_OBJECT / JSON_ARRAY / JSON_STRING /
    JSON_QUERY and the IS JSON predicate): per-row construction through
    functions/compat.py builders AND the SQL spellings registered by
    functions/sqlfuncs.py (JSON_QUERY / JSON_STRING / IS_JSON run through
    spark.sql-visible temporary functions in other tests; here the
    Column builders keep the whole query one Catalyst plan).  The oracle
    rebuilds each JSON text with DuckDB's native JSON functions — a hash
    match proves the two engines' encoders agree byte-for-byte
    (escaping, null members, minified form)."""
    e = load(spark, sf_dir, "events").where(F.col("event_id") < 300)
    return e.select(
        "event_id",
        compat.json_object(
            ("id", F.col("event_id")), ("etype", F.col("event_type"))
        ).alias("obj"),
        compat.json_object(
            ("m", F.lit(None).cast("string")), ("id", F.col("event_id"))
        ).alias("obj_null"),
        compat.json_array(F.col("event_id"), F.col("user_id")).alias("arr"),
        compat.json_string(F.col("event_type")).alias("jstr"),
        compat.json_query(F.col("props"), "$").alias("q_obj"),
        compat.json_query(F.col("props"), "$.k").alias("q_scalar"),
        compat.is_json(F.col("props")).alias("isj_value"),
        compat.is_json(F.col("props"), "OBJECT").alias("isj_object"),
        compat.is_json(F.col("props"), "ARRAY").alias("isj_array"),
    ).orderBy("event_id")


JSON_AGG_ORACLE = """
SELECT event_type,
       '[' || string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id) || ']' AS id_arr,
       '{' || string_agg(to_json(CAST(event_id AS VARCHAR)) || ':' ||
                         CAST(CAST(FLOOR(value * 100) AS BIGINT) AS VARCHAR),
                         ',' ORDER BY CAST(event_id AS VARCHAR)) || '}' AS id_obj
FROM events WHERE event_id < 400
GROUP BY event_type ORDER BY event_type
"""


@register("json_agg_funcs", JSON_AGG_ORACLE)
def json_agg_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL/JSON aggregates (FLIP-90; reference JsonObjectAggFunction /
    JsonArrayAggFunction): JSON_ARRAYAGG over event ids and
    JSON_OBJECTAGG keyed by the id string per event_type, both through
    the compat builders (sorted members — the reference leaves aggregate
    member order unspecified, so a fixed order is a valid deterministic
    refinement).  The oracle rebuilds the same JSON texts with ordered
    string_agg; note JSON_OBJECTAGG's keys sort as STRINGS ('10' < '9'),
    matching array_sort on the struct key."""
    e = load(spark, sf_dir, "events").where(F.col("event_id") < 400)
    return (
        e.groupBy("event_type")
        .agg(
            compat.json_arrayagg(F.col("event_id")).alias("id_arr"),
            compat.json_objectagg(
                F.col("event_id").cast("string"),
                F.floor(F.col("value") * 100).cast("bigint"),
            ).alias("id_obj"),
        )
        .orderBy("event_type")
    )
