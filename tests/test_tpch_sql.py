"""Verbatim TPC-H SQL-text suite: the reference's TPC-H end-to-end proof
runs the 22 OFFICIAL query texts (io.airlift/tpch resources — the public
TPC-H spec queries with validation parameters) through its SQL surface
(flink-end-to-end-tests/test-scripts/test_tpch.sh:58-80, queries pulled
by TpchDataGenerator.java generateQuery; 4 texts lightly modified in
test-scripts/test-data/tpch/modified-query/ for q6/q11/q15/q20).  The
registry's tpch_q1..q22 entries are oracle-exact DataFrame FORMS; this
suite upgrades the evidence to QUERY-TEXT: a tiny deterministic full-
schema TPC-H dataset (all 8 tables incl. partsupp, every spec column the
queries touch) is generated in-test, each official text runs through the
engine's SQL surface, and DuckDB runs the identical text on the identical
parquet as the oracle.

Exactness: money is quarter-dollars and rates are 32nds, so every
aggregate the queries compute (sums/averages of price*(1-disc)*(1+tax)
etc.) is exact in binary — Spark and DuckDB agree bit-for-bit regardless
of aggregation order (same trick as tests/test_tpcds.py).

Scale note: these are correctness pins — the scale-safe PLANS for the
same 22 queries are pinned by the tpch_q* registry entries and
tests/test_plans.py (queries/tpch.py)."""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
import pytest

# ---------------------------------------------------------------- data --

SUPPS = 40
PARTS = 200
CUSTS = 150
ORDERS = 3000

# the spec's 25 nations and 5 regions (fixed tables in every dbgen)
NATIONS = [
    (0, "ALGERIA", 0), (1, "ARGENTINA", 1), (2, "BRAZIL", 1), (3, "CANADA", 1),
    (4, "EGYPT", 4), (5, "ETHIOPIA", 0), (6, "FRANCE", 3), (7, "GERMANY", 3),
    (8, "INDIA", 2), (9, "INDONESIA", 2), (10, "IRAN", 4), (11, "IRAQ", 4),
    (12, "JAPAN", 2), (13, "JORDAN", 4), (14, "KENYA", 0), (15, "MOROCCO", 0),
    (16, "MOZAMBIQUE", 0), (17, "PERU", 1), (18, "CHINA", 2), (19, "ROMANIA", 3),
    (20, "SAUDI ARABIA", 4), (21, "VIETNAM", 2), (22, "RUSSIA", 3),
    (23, "UNITED KINGDOM", 3), (24, "UNITED STATES", 1),
]
REGIONS = [(0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"), (4, "MIDDLE EAST")]

BASE = pd.Timestamp("1992-01-01")
CURRENT = 1263  # days to 1995-06-17, dbgen's CURRENTDATE for flags/status

WORDS = np.array(
    ["carefully", "slyly", "quickly", "blithely", "furiously",
     "ironic", "final", "pending", "regular", "express"]
)
NAME_WORDS = np.array(
    ["goldenrod", "green", "forest", "lavender", "spring", "chocolate",
     "blue", "powder", "almond", "antique", "aquamarine", "azure"]
)
TYPES_A = np.array(["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"])
TYPES_B = np.array(["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"])
TYPES_C = np.array(["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"])
CONT_A = np.array(["SM", "MED", "LG", "JUMBO", "WRAP"])
CONT_B = np.array(["CASE", "BOX", "BAG", "PKG", "PACK", "CAN", "DRUM", "JAR"])
SEGMENTS = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"])
PRIORITIES = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
MODES = np.array(["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB", "AIR REG"])
INSTRUCT = np.array(["DELIVER IN PERSON", "COLLECT COD", "NONE", "TAKE BACK RETURN"])


def _comments(rng, n):
    picks = rng.choice(WORDS, (n, 4))
    return np.array([" ".join(r) for r in picks])


def _quarters(rng, lo_q, hi_q, n):
    """Exact-in-binary money: integer quarter-dollars."""
    return rng.randint(lo_q, hi_q, n) * 0.25


def _gen_tables() -> dict[str, pd.DataFrame]:
    rng = np.random.RandomState(20260816)

    region = pd.DataFrame(REGIONS, columns=["r_regionkey", "r_name"])
    region["r_comment"] = _comments(rng, len(region))
    nation = pd.DataFrame(NATIONS, columns=["n_nationkey", "n_name", "n_regionkey"])
    nation["n_comment"] = _comments(rng, len(nation))

    # --- supplier: round-robin nations so every nation has >=1 supplier
    s_comment = _comments(rng, SUPPS)
    s_comment[4] = "requests sleep quickly. Customer above the even Complaints detect"
    s_comment[28] = "slyly final Customer deposits wake Complaints haggle carefully"
    supplier = pd.DataFrame(
        {
            "s_suppkey": np.arange(1, SUPPS + 1),
            "s_name": [f"Supplier#{i:09d}" for i in range(1, SUPPS + 1)],
            "s_address": [f"addr supp {i}" for i in range(1, SUPPS + 1)],
            "s_nationkey": np.arange(SUPPS) % 25,
            "s_phone": [
                f"{10 + i % 25}-{rng.randint(100, 1000)}-{rng.randint(100, 1000)}-{rng.randint(1000, 10000)}"
                for i in range(SUPPS)
            ],
            "s_acctbal": _quarters(rng, -3996, 40000, SUPPS),
            "s_comment": s_comment,
        }
    )

    # --- part: random attributes + forced coverage for the selective texts
    p_name = np.array([" ".join(rng.choice(NAME_WORDS, 2, replace=False)) for _ in range(PARTS)])
    mfr = rng.randint(1, 6, PARTS)
    p_brand = np.array([f"Brand#{m}{rng.randint(1, 6)}" for m in mfr])
    p_type = np.array(
        [f"{rng.choice(TYPES_A)} {rng.choice(TYPES_B)} {rng.choice(TYPES_C)}" for _ in range(PARTS)]
    )
    p_size = rng.randint(1, 51, PARTS)
    p_container = np.array([f"{rng.choice(CONT_A)} {rng.choice(CONT_B)}" for _ in range(PARTS)])
    # q2: size-15 '%BRASS' parts; q8: exact ECONOMY ANODIZED STEEL;
    # q17/q19 leg2: Brand#23 + MED BOX small size; q19 leg1/leg3;
    # q20: p_name LIKE 'forest%'
    p_size[0:6] = 15
    p_type[0:6] = "LARGE POLISHED BRASS"
    p_type[6:12] = "ECONOMY ANODIZED STEEL"
    p_brand[12:18] = "Brand#23"
    p_container[12:18] = "MED BOX"
    p_size[12:18] = 7
    p_brand[18:24] = "Brand#12"
    p_container[18:24] = "SM CASE"
    p_size[18:24] = 3
    p_brand[24:30] = "Brand#34"
    p_container[24:30] = "LG BOX"
    p_size[24:30] = 11
    p_name[30:40] = np.array([f"forest {w}" for w in rng.choice(NAME_WORDS[3:], 10)])
    p_retailprice = _quarters(rng, 360, 2001, PARTS)
    part = pd.DataFrame(
        {
            "p_partkey": np.arange(1, PARTS + 1),
            "p_name": p_name,
            "p_mfgr": [f"Manufacturer#{m}" for m in mfr],
            "p_brand": p_brand,
            "p_type": p_type,
            "p_size": p_size,
            "p_container": p_container,
            "p_retailprice": p_retailprice,
            "p_comment": _comments(rng, PARTS),
        }
    )

    # --- partsupp: dbgen's 4-suppliers-per-part key pattern
    ps_partkey = np.repeat(np.arange(1, PARTS + 1), 4)
    ps_i = np.tile(np.arange(4), PARTS)
    ps_suppkey = (ps_partkey + ps_i * (SUPPS // 4)) % SUPPS + 1
    partsupp = pd.DataFrame(
        {
            "ps_partkey": ps_partkey,
            "ps_suppkey": ps_suppkey,
            "ps_availqty": rng.randint(1, 1000, len(ps_partkey)),
            "ps_supplycost": _quarters(rng, 4, 1001, len(ps_partkey)),
            "ps_comment": _comments(rng, len(ps_partkey)),
        }
    )

    # --- customer: round-robin nations (q22 needs every phone code)
    customer = pd.DataFrame(
        {
            "c_custkey": np.arange(1, CUSTS + 1),
            "c_name": [f"Customer#{i:09d}" for i in range(1, CUSTS + 1)],
            "c_address": [f"addr cust {i}" for i in range(1, CUSTS + 1)],
            "c_nationkey": np.arange(CUSTS) % 25,
            "c_phone": [
                f"{10 + i % 25}-{rng.randint(100, 1000)}-{rng.randint(100, 1000)}-{rng.randint(1000, 10000)}"
                for i in range(CUSTS)
            ],
            "c_acctbal": _quarters(rng, -3996, 40000, CUSTS),
            "c_mktsegment": rng.choice(SEGMENTS, CUSTS),
            "c_comment": _comments(rng, CUSTS),
        }
    )

    # --- orders: customers 101..150 stay orderless (q22's NOT EXISTS)
    o_orderkey = np.arange(1, ORDERS + 1)
    o_custkey = rng.randint(1, 101, ORDERS)
    odate_days = rng.randint(0, 2406, ORDERS)  # 1992-01-01 .. 1998-08-02
    o_comment = _comments(rng, ORDERS)
    special = rng.rand(ORDERS) < 0.08  # q13's '%special%requests%' leg
    o_comment[special] = np.array(
        [f"{w} special packages wake {w2} requests" for w, w2 in rng.choice(WORDS, (special.sum(), 2))]
    )

    # --- lineitem
    nl = rng.randint(1, 8, ORDERS)
    nl[100:110] = 7  # q18 boost: 7 high-quantity lines → sum(qty) > 300
    order_idx = np.repeat(np.arange(ORDERS), nl)
    L = len(order_idx)
    l_partkey = rng.randint(1, PARTS + 1, L)
    l_suppkey = (l_partkey + rng.randint(0, 4, L) * (SUPPS // 4)) % SUPPS + 1
    l_quantity = rng.randint(1, 51, L).astype(float)
    boost = (order_idx >= 100) & (order_idx < 110)
    l_quantity[boost] = rng.randint(45, 51, int(boost.sum()))
    l_extendedprice = l_quantity * p_retailprice[l_partkey - 1]  # qty × quarters: exact
    l_discount = rng.randint(0, 4, L) / 32.0  # 32nds: exact products
    l_tax = rng.randint(0, 3, L) / 32.0
    l_odays = odate_days[order_idx]
    ship = l_odays + rng.randint(1, 122, L)
    commit = l_odays + rng.randint(30, 91, L)
    receipt = ship + rng.randint(1, 31, L)
    linestatus = np.where(ship <= CURRENT, "F", "O")
    returnflag = np.where(receipt <= CURRENT, rng.choice(["R", "A"], L), "N")
    linenumber = np.arange(L) - np.repeat(np.cumsum(nl) - nl, nl) + 1

    lineitem = pd.DataFrame(
        {
            "l_orderkey": o_orderkey[order_idx],
            "l_partkey": l_partkey,
            "l_suppkey": l_suppkey,
            "l_linenumber": linenumber,
            "l_quantity": l_quantity,
            "l_extendedprice": l_extendedprice,
            "l_discount": l_discount,
            "l_tax": l_tax,
            "l_returnflag": returnflag,
            "l_linestatus": linestatus,
            "l_shipdate": BASE + pd.to_timedelta(ship, unit="D"),
            "l_commitdate": BASE + pd.to_timedelta(commit, unit="D"),
            "l_receiptdate": BASE + pd.to_timedelta(receipt, unit="D"),
            "l_shipinstruct": rng.choice(INSTRUCT, L),
            "l_shipmode": rng.choice(MODES, L),
            "l_comment": _comments(rng, L),
        }
    )

    f_cnt = np.bincount(order_idx, weights=(linestatus == "F"), minlength=ORDERS)
    orders = pd.DataFrame(
        {
            "o_orderkey": o_orderkey,
            "o_custkey": o_custkey,
            "o_orderstatus": np.where(f_cnt == nl, "F", np.where(f_cnt == 0, "O", "P")),
            "o_totalprice": _quarters(rng, 4000, 2000000, ORDERS),
            "o_orderdate": BASE + pd.to_timedelta(odate_days, unit="D"),
            "o_orderpriority": rng.choice(PRIORITIES, ORDERS),
            "o_clerk": [f"Clerk#{rng.randint(1, 100):09d}" for _ in range(ORDERS)],
            "o_shippriority": np.zeros(ORDERS, dtype=np.int64),
            "o_comment": o_comment,
        }
    )

    return {
        "region": region,
        "nation": nation,
        "supplier": supplier,
        "part": part,
        "partsupp": partsupp,
        "customer": customer,
        "orders": orders,
        "lineitem": lineitem,
    }


DATE_COLS = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate", "l_commitdate", "l_receiptdate"],
}


@pytest.fixture(scope="module")
def tpch_sql(spark, tmp_path_factory):
    """Write the mini tables as parquet once; register Spark temp views
    and a DuckDB connection with views over the SAME files."""
    import duckdb

    from pyspark.sql import functions as F

    root = tmp_path_factory.mktemp("tpch_sql")
    con = duckdb.connect()
    for name, pdf in _gen_tables().items():
        sdf = spark.createDataFrame(pdf)
        for c in DATE_COLS.get(name, []):
            sdf = sdf.withColumn(c, F.col(c).cast("date"))
        path = str(root / name)
        sdf.coalesce(1).write.mode("overwrite").parquet(path)
        spark.read.parquet(path).createOrReplaceTempView(name)
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}/*.parquet')")
    yield spark, con
    con.close()


def _compare(spark, con, sql, ordered, min_rows=1, nonnull=False):
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    got_df = env.sql_query(sql).to_df()
    cols = got_df.columns
    got = [tuple(r) for r in got_df.collect()]
    want_pdf = con.execute(sql).fetchdf()
    assert [c.lower() for c in want_pdf.columns] == [c.lower() for c in cols]
    want = [tuple(r) for r in want_pdf.itertuples(index=False, name=None)]

    def norm(rows):
        out = []
        for r in rows:
            vals = []
            for x in r:
                if isinstance(x, pd.Timestamp):
                    x = x.date()
                if isinstance(x, (int, float, np.integer, np.floating)) and not isinstance(x, bool):
                    x = None if (isinstance(x, (float, np.floating)) and np.isnan(x)) else float(x)
                vals.append(x)
            out.append(tuple(vals))
        return out

    got_n, want_n = norm(got), norm(want)
    assert len(got_n) >= min_rows, f"suspiciously small result ({len(got_n)} rows)"
    if nonnull:
        assert all(v is not None for r in got_n for v in r), got_n
    if ordered:
        assert got_n == want_n
    else:
        assert sorted(got_n, key=repr) == sorted(want_n, key=repr)


# -------------------------------------------------------------- queries --
# The 22 official texts (io.airlift/tpch queries resources — the public
# TPC-H validation queries the reference's test_tpch.sh runs), with the
# reference's own modified-query substitutions for q6/q11/q15/q20
# (test-scripts/test-data/tpch/modified-query/*.sql: decimal-literal and
# view-free rewrites; q11's backtick quoting dropped — `value` parses as
# a plain alias in both Spark and DuckDB, matching the original text).

QUERIES: dict[int, str] = {}

QUERIES[1] = """
SELECT
  l_returnflag,
  l_linestatus,
  sum(l_quantity) AS sum_qty,
  sum(l_extendedprice) AS sum_base_price,
  sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
  sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
  avg(l_quantity) AS avg_qty,
  avg(l_extendedprice) AS avg_price,
  avg(l_discount) AS avg_disc,
  count(*) AS count_order
FROM
  lineitem
WHERE
  l_shipdate <= DATE '1998-12-01' - INTERVAL '90' DAY
GROUP BY
  l_returnflag,
  l_linestatus
ORDER BY
  l_returnflag,
  l_linestatus
"""

QUERIES[2] = """
SELECT
  s_acctbal,
  s_name,
  n_name,
  p_partkey,
  p_mfgr,
  s_address,
  s_phone,
  s_comment
FROM
  part,
  supplier,
  partsupp,
  nation,
  region
WHERE
  p_partkey = ps_partkey
  AND s_suppkey = ps_suppkey
  AND p_size = 15
  AND p_type LIKE '%BRASS'
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND ps_supplycost = (
    SELECT min(ps_supplycost)
    FROM
      partsupp,
      supplier,
      nation,
      region
    WHERE
      p_partkey = ps_partkey
      AND s_suppkey = ps_suppkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
  )
ORDER BY
  s_acctbal DESC,
  n_name,
  s_name,
  p_partkey
LIMIT 100
"""

QUERIES[3] = """
SELECT
  l_orderkey,
  sum(l_extendedprice * (1 - l_discount)) AS revenue,
  o_orderdate,
  o_shippriority
FROM
  customer,
  orders,
  lineitem
WHERE
  c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < DATE '1995-03-15'
  AND l_shipdate > DATE '1995-03-15'
GROUP BY
  l_orderkey,
  o_orderdate,
  o_shippriority
ORDER BY
  revenue DESC,
  o_orderdate
LIMIT 10
"""

QUERIES[4] = """
SELECT
  o_orderpriority,
  count(*) AS order_count
FROM
  orders
WHERE
  o_orderdate >= DATE '1993-07-01'
  AND o_orderdate < DATE '1993-07-01' + INTERVAL '3' MONTH
  AND EXISTS (
    SELECT *
    FROM
      lineitem
    WHERE
      l_orderkey = o_orderkey
      AND l_commitdate < l_receiptdate
  )
GROUP BY
  o_orderpriority
ORDER BY
  o_orderpriority
"""

QUERIES[5] = """
SELECT
  n_name,
  sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM
  customer,
  orders,
  lineitem,
  supplier,
  nation,
  region
WHERE
  c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= DATE '1994-01-01'
  AND o_orderdate < DATE '1994-01-01' + INTERVAL '1' YEAR
GROUP BY
  n_name
ORDER BY
  revenue DESC
"""

# modified-query/q6.sql: decimal BETWEEN spelled with plain literals
QUERIES[6] = """
SELECT sum(l_extendedprice * l_discount) AS revenue
FROM
  lineitem
WHERE
  l_shipdate >= DATE '1994-01-01'
  AND l_shipdate < DATE '1994-01-01' + INTERVAL '1' YEAR
AND l_discount BETWEEN 0.06 - 0.01 AND 0.06 + 0.01
AND l_quantity < 24
"""

QUERIES[7] = """
SELECT
  supp_nation,
  cust_nation,
  l_year,
  sum(volume) AS revenue
FROM (
       SELECT
         n1.n_name                          AS supp_nation,
         n2.n_name                          AS cust_nation,
         extract(YEAR FROM l_shipdate)      AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
       FROM
         supplier,
         lineitem,
         orders,
         customer,
         nation n1,
         nation n2
       WHERE
         s_suppkey = l_suppkey
         AND o_orderkey = l_orderkey
         AND c_custkey = o_custkey
         AND s_nationkey = n1.n_nationkey
         AND c_nationkey = n2.n_nationkey
         AND (
           (n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
           OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE')
         )
         AND l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
     ) AS shipping
GROUP BY
  supp_nation,
  cust_nation,
  l_year
ORDER BY
  supp_nation,
  cust_nation,
  l_year
"""

QUERIES[8] = """
SELECT
  o_year,
  sum(CASE
      WHEN nation = 'BRAZIL'
        THEN volume
      ELSE 0
      END) / sum(volume) AS mkt_share
FROM (
       SELECT
         extract(YEAR FROM o_orderdate)     AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name                          AS nation
       FROM
         part,
         supplier,
         lineitem,
         orders,
         customer,
         nation n1,
         nation n2,
         region
       WHERE
         p_partkey = l_partkey
         AND s_suppkey = l_suppkey
         AND l_orderkey = o_orderkey
         AND o_custkey = c_custkey
         AND c_nationkey = n1.n_nationkey
         AND n1.n_regionkey = r_regionkey
         AND r_name = 'AMERICA'
         AND s_nationkey = n2.n_nationkey
         AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
         AND p_type = 'ECONOMY ANODIZED STEEL'
     ) AS all_nations
GROUP BY
  o_year
ORDER BY
  o_year
"""

QUERIES[9] = """
SELECT
  nation,
  o_year,
  sum(amount) AS sum_profit
FROM (
       SELECT
         n_name                                                          AS nation,
         extract(YEAR FROM o_orderdate)                                  AS o_year,
         l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity AS amount
       FROM
         part,
         supplier,
         lineitem,
         partsupp,
         orders,
         nation
       WHERE
         s_suppkey = l_suppkey
         AND ps_suppkey = l_suppkey
         AND ps_partkey = l_partkey
         AND p_partkey = l_partkey
         AND o_orderkey = l_orderkey
         AND s_nationkey = n_nationkey
         AND p_name LIKE '%green%'
     ) AS profit
GROUP BY
  nation,
  o_year
ORDER BY
  nation,
  o_year DESC
"""

QUERIES[10] = """
SELECT
  c_custkey,
  c_name,
  sum(l_extendedprice * (1 - l_discount)) AS revenue,
  c_acctbal,
  n_name,
  c_address,
  c_phone,
  c_comment
FROM
  customer,
  orders,
  lineitem,
  nation
WHERE
  c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= DATE '1993-10-01'
  AND o_orderdate < DATE '1993-10-01' + INTERVAL '3' MONTH
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY
  c_custkey,
  c_name,
  c_acctbal,
  c_phone,
  n_name,
  c_address,
  c_comment
ORDER BY
  revenue DESC
LIMIT 20
"""

# modified-query/q11.sql (quoting dropped: plain `value` alias)
QUERIES[11] = """
SELECT
  ps_partkey,
  sum(ps_supplycost * ps_availqty) AS value
FROM
  partsupp,
  supplier,
  nation
WHERE
  ps_suppkey = s_suppkey
  AND s_nationkey = n_nationkey
  AND n_name = 'GERMANY'
GROUP BY
  ps_partkey
HAVING
  sum(ps_supplycost * ps_availqty) > (
    SELECT sum(ps_supplycost * ps_availqty) * 0.0001
    FROM
      partsupp,
      supplier,
      nation
    WHERE
      ps_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND n_name = 'GERMANY'
  )
ORDER BY
  value DESC
"""

QUERIES[12] = """
SELECT
  l_shipmode,
  sum(CASE
      WHEN o_orderpriority = '1-URGENT'
           OR o_orderpriority = '2-HIGH'
        THEN 1
      ELSE 0
      END) AS high_line_count,
  sum(CASE
      WHEN o_orderpriority <> '1-URGENT'
           AND o_orderpriority <> '2-HIGH'
        THEN 1
      ELSE 0
      END) AS low_line_count
FROM
  orders,
  lineitem
WHERE
  o_orderkey = l_orderkey
  AND l_shipmode IN ('MAIL', 'SHIP')
  AND l_commitdate < l_receiptdate
  AND l_shipdate < l_commitdate
  AND l_receiptdate >= DATE '1994-01-01'
  AND l_receiptdate < DATE '1994-01-01' + INTERVAL '1' YEAR
GROUP BY
  l_shipmode
ORDER BY
  l_shipmode
"""

QUERIES[13] = """
SELECT
  c_count,
  count(*) AS custdist
FROM (
       SELECT
         c_custkey,
         count(o_orderkey)
       FROM
         customer
         LEFT OUTER JOIN orders ON
                                  c_custkey = o_custkey
                                  AND o_comment NOT LIKE '%special%requests%'
       GROUP BY
         c_custkey
     ) AS c_orders (c_custkey, c_count)
GROUP BY
  c_count
ORDER BY
  custdist DESC,
  c_count DESC
"""

QUERIES[14] = """
SELECT 100.00 * sum(CASE
                    WHEN p_type LIKE 'PROMO%'
                      THEN l_extendedprice * (1 - l_discount)
                    ELSE 0
                    END) / sum(l_extendedprice * (1 - l_discount)) AS promo_revenue
FROM
  lineitem,
  part
WHERE
  l_partkey = p_partkey
  AND l_shipdate >= DATE '1995-09-01'
  AND l_shipdate < DATE '1995-09-01' + INTERVAL '1' MONTH
"""

# modified-query/q15.sql: the revenue view inlined (view-free rewrite)
QUERIES[15] = """
SELECT
  s_suppkey,
  s_name,
  s_address,
  s_phone,
  total_revenue
FROM
  supplier, (
  SELECT
    l_suppkey AS supplier_no,
    sum(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM
    lineitem
  WHERE
    l_shipdate >= DATE '1996-01-01'
    AND l_shipdate < DATE '1996-01-01' + INTERVAL '3' MONTH
  GROUP BY
    l_suppkey) AS revenue
WHERE
  s_suppkey = supplier_no
  AND total_revenue = (
    SELECT max(total_revenue)
    FROM (
      SELECT
        l_suppkey AS supplier_no,
        sum(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM
        lineitem
      WHERE
        l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1996-01-01' + INTERVAL '3' MONTH
      GROUP BY
        l_suppkey) AS revenue
  )
ORDER BY
  s_suppkey
"""

QUERIES[16] = """
SELECT
  p_brand,
  p_type,
  p_size,
  count(DISTINCT ps_suppkey) AS supplier_cnt
FROM
  partsupp,
  part
WHERE
  p_partkey = ps_partkey
  AND p_brand <> 'Brand#45'
  AND p_type NOT LIKE 'MEDIUM POLISHED%'
  AND p_size IN (49, 14, 23, 45, 19, 3, 36, 9)
  AND ps_suppkey NOT IN (
    SELECT s_suppkey
    FROM
      supplier
    WHERE
      s_comment LIKE '%Customer%Complaints%'
  )
GROUP BY
  p_brand,
  p_type,
  p_size
ORDER BY
  supplier_cnt DESC,
  p_brand,
  p_type,
  p_size
"""

QUERIES[17] = """
SELECT sum(l_extendedprice) / 7.0 AS avg_yearly
FROM
  lineitem,
  part
WHERE
  p_partkey = l_partkey
  AND p_brand = 'Brand#23'
  AND p_container = 'MED BOX'
  AND l_quantity < (
    SELECT 0.2 * avg(l_quantity)
    FROM
      lineitem
    WHERE
      l_partkey = p_partkey
  )
"""

QUERIES[18] = """
SELECT
  c_name,
  c_custkey,
  o_orderkey,
  o_orderdate,
  o_totalprice,
  sum(l_quantity)
FROM
  customer,
  orders,
  lineitem
WHERE
  o_orderkey IN (
    SELECT l_orderkey
    FROM
      lineitem
    GROUP BY
      l_orderkey
    HAVING
      sum(l_quantity) > 300
  )
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
GROUP BY
  c_name,
  c_custkey,
  o_orderkey,
  o_orderdate,
  o_totalprice
ORDER BY
  o_totalprice DESC,
  o_orderdate
LIMIT 100
"""

QUERIES[19] = """
SELECT sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM
  lineitem,
  part
WHERE
  (
    p_partkey = l_partkey
    AND p_brand = 'Brand#12'
    AND p_container IN ('SM CASE', 'SM BOX', 'SM PACK', 'SM PKG')
    AND l_quantity >= 1 AND l_quantity <= 1 + 10
    AND p_size BETWEEN 1 AND 5
    AND l_shipmode IN ('AIR', 'AIR REG')
    AND l_shipinstruct = 'DELIVER IN PERSON'
  )
  OR
  (
    p_partkey = l_partkey
    AND p_brand = 'Brand#23'
    AND p_container IN ('MED BAG', 'MED BOX', 'MED PKG', 'MED PACK')
    AND l_quantity >= 10 AND l_quantity <= 10 + 10
    AND p_size BETWEEN 1 AND 10
    AND l_shipmode IN ('AIR', 'AIR REG')
    AND l_shipinstruct = 'DELIVER IN PERSON'
  )
  OR
  (
    p_partkey = l_partkey
    AND p_brand = 'Brand#34'
    AND p_container IN ('LG CASE', 'LG BOX', 'LG PACK', 'LG PKG')
    AND l_quantity >= 20 AND l_quantity <= 20 + 10
    AND p_size BETWEEN 1 AND 15
    AND l_shipmode IN ('AIR', 'AIR REG')
    AND l_shipinstruct = 'DELIVER IN PERSON'
  )
"""

# modified-query/q20.sql: date-literal spelling
QUERIES[20] = """
SELECT
  s_name,
  s_address
FROM
  supplier, nation
WHERE
  s_suppkey IN (
    SELECT ps_suppkey
    FROM
      partsupp
    WHERE
      ps_partkey IN (
        SELECT p_partkey
        FROM
          part
        WHERE
          p_name LIKE 'forest%'
      )
      AND ps_availqty > (
        SELECT 0.5 * sum(l_quantity)
        FROM
          lineitem
        WHERE
          l_partkey = ps_partkey
          AND l_suppkey = ps_suppkey
          AND l_shipdate >= date '1994-01-01'
          AND l_shipdate < date '1994-01-01' + interval '1' YEAR
)
)
AND s_nationkey = n_nationkey
AND n_name = 'CANADA'
ORDER BY s_name
"""

QUERIES[21] = """
SELECT
  s_name,
  count(*) AS numwait
FROM
  supplier,
  lineitem l1,
  orders,
  nation
WHERE
  s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_receiptdate > l1.l_commitdate
  AND EXISTS (
    SELECT *
    FROM
      lineitem l2
    WHERE
      l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT *
    FROM
      lineitem l3
    WHERE
      l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_receiptdate > l3.l_commitdate
  )
  AND s_nationkey = n_nationkey
  AND n_name = 'SAUDI ARABIA'
GROUP BY
  s_name
ORDER BY
  numwait DESC,
  s_name
LIMIT 100
"""

QUERIES[22] = """
SELECT
  cntrycode,
  count(*) AS numcust,
  sum(c_acctbal) AS totacctbal
FROM (
       SELECT
         substr(c_phone, 1, 2) AS cntrycode,
         c_acctbal
       FROM
         customer
       WHERE
         substr(c_phone, 1, 2) IN ('13', '31', '23', '29', '30', '18', '17')
         AND c_acctbal > (
           SELECT avg(c_acctbal)
           FROM
             customer
           WHERE
             c_acctbal > 0.00
             AND substr(c_phone, 1, 2) IN ('13', '31', '23', '29', '30', '18', '17')
         )
         AND NOT EXISTS (
           SELECT *
           FROM
             orders
           WHERE
             o_custkey = c_custkey
         )
     ) AS custsale
GROUP BY
  cntrycode
ORDER BY
  cntrycode
"""

# ordered=True where the ORDER BY is a total key of the output; sorted
# compare otherwise (cutoff ties under LIMIT are impossible here: the
# ordering columns are continuous revenue sums / unique keys)
CONFIG = {
    1: dict(ordered=True, min_rows=2),
    2: dict(ordered=True, min_rows=1),
    3: dict(ordered=False, min_rows=5),
    4: dict(ordered=True, min_rows=3),
    5: dict(ordered=False, min_rows=1),
    6: dict(ordered=True, min_rows=1, nonnull=True),
    7: dict(ordered=True, min_rows=2),
    8: dict(ordered=True, min_rows=1, nonnull=True),
    9: dict(ordered=True, min_rows=5),
    10: dict(ordered=False, min_rows=5),
    11: dict(ordered=False, min_rows=10),
    12: dict(ordered=True, min_rows=2),
    13: dict(ordered=True, min_rows=3),
    14: dict(ordered=True, min_rows=1, nonnull=True),
    15: dict(ordered=True, min_rows=1),
    16: dict(ordered=True, min_rows=5),
    17: dict(ordered=True, min_rows=1, nonnull=True),
    18: dict(ordered=False, min_rows=1),
    19: dict(ordered=True, min_rows=1, nonnull=True),
    20: dict(ordered=True, min_rows=1),
    21: dict(ordered=True, min_rows=1),
    22: dict(ordered=True, min_rows=3),
}


@pytest.mark.parametrize("qno", sorted(QUERIES))
def test_tpch_text(tpch_sql, qno):
    spark, con = tpch_sql
    _compare(spark, con, QUERIES[qno], **CONFIG[qno])
