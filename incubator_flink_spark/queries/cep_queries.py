"""CEP coverage query (reference: flink-cep Pattern/NFA; MATCH_RECOGNIZE).

The funnel pattern (click followedBy purchase, within 1 day,
AFTER MATCH SKIP PAST LAST EVENT) has a closed-form sequential semantics:
repeatedly take the earliest feasible click after the cursor, pair it with
the next purchase (the earliest one is the only candidate — any later
purchase has a later timestamp, so feasibility is monotone), emit, and
move the cursor past the consumed purchase.  That greedy chain is
expressible as a recursive CTE, which is the DuckDB oracle below.
General patterns (quantifiers, negation, arbitrary skip strategies) stay
covered by tests/test_cep.py against hand-computed fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load
from incubator_flink_spark.cep import Pattern, match_pattern
from incubator_flink_spark.queries.registry import register

CEP_FUNNEL_ORACLE = """
WITH RECURSIVE ev AS (
  SELECT user_id, event_id, event_type, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type IN ('click', 'purchase')
),
evp AS (
  SELECT *,
         MIN(CASE WHEN event_type = 'purchase' THEN rn END)
           OVER (PARTITION BY user_id ORDER BY rn
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS np_rn
  FROM ev
),
clk AS (
  SELECT e.user_id, e.event_id AS click_id, e.rn AS click_rn,
         p.rn AS purch_rn, p.event_id AS purchase_id
  FROM evp e JOIN ev p ON p.user_id = e.user_id AND p.rn = e.np_rn
  WHERE e.event_type = 'click' AND p.ts <= e.ts + INTERVAL 86400 SECOND
),
chain AS (
  SELECT user_id, click_id, click_rn, purch_rn, purchase_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY click_rn) AS r FROM clk) t
  WHERE r = 1
  UNION ALL
  SELECT nxt.user_id, nxt.click_id, nxt.click_rn, nxt.purch_rn, nxt.purchase_id
  FROM chain ch, LATERAL (
    SELECT * FROM clk c2
    WHERE c2.user_id = ch.user_id AND c2.click_rn > ch.purch_rn
    ORDER BY c2.click_rn LIMIT 1) nxt
)
SELECT user_id, click_id, purchase_id FROM chain ORDER BY user_id, click_id
"""


@register("cep_funnel", CEP_FUNNEL_ORACLE)
def cep_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """click → purchase within 1 day per user, non-overlapping matches."""
    events = load(spark, sf_dir, "events")
    p = (
        Pattern.begin("click")
        .where(lambda e: e["event_type"] == "click")
        .followed_by("purchase")
        .where(lambda e: e["event_type"] == "purchase")
        .within(86400)
        .after_match_skip_past_last_event()
    )

    def select(key, m):
        return {
            "user_id": int(key["user_id"]),
            "click_id": int(m["click"][0]["event_id"]),
            "purchase_id": int(m["purchase"][0]["event_id"]),
        }

    return match_pattern(
        events, ["user_id"], "ts", p, select,
        "user_id BIGINT, click_id BIGINT, purchase_id BIGINT", tiebreak="event_id",
        columns=["event_id", "event_type"],
    ).orderBy("user_id", "click_id")


# --- AFTER MATCH SKIP TO FIRST through the full SQL statement ----------------
# PATTERN (A B+) with OVERLAPPING variable predicates (click satisfies
# both A and B), so SKIP TO FIRST B genuinely resumes INSIDE the previous
# match: every row that can head a contiguous B-run emits its own match —
# a strictly larger result than SKIP PAST LAST ROW would produce.  With
# greedy B+ each start yields exactly the maximal run, so the match set
# has the closed form "every row i with A(i) and B(i+1), extended to the
# end of the contiguous B-run" — expressible with window functions, which
# is the DuckDB oracle below.

CEP_SKIP_TO_FIRST_ORACLE = """
WITH ev AS (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn
  FROM events),
f AS (
  SELECT *,
         (event_type IN ('view', 'click')) AS a_ok,
         (event_type IN ('click', 'purchase')) AS b_ok
  FROM ev),
runs AS (
  SELECT *,
         CASE WHEN b_ok THEN rn - ROW_NUMBER() OVER (PARTITION BY user_id, b_ok ORDER BY rn) END AS grp
  FROM f),
rend AS (
  SELECT *, MAX(rn) OVER (PARTITION BY user_id, grp) AS run_end
  FROM runs),
m AS (
  SELECT r.user_id, r.rn, r.event_id AS start_id, n.run_end
  FROM rend r JOIN rend n ON n.user_id = r.user_id AND n.rn = r.rn + 1
  WHERE r.a_ok AND n.b_ok)
SELECT m.user_id, m.start_id, e.event_id AS end_id,
       CAST(m.run_end - m.rn AS BIGINT) AS n_steps
FROM m JOIN rend e ON e.user_id = m.user_id AND e.rn = m.run_end
ORDER BY m.user_id, m.start_id
"""


@register("cep_skip_to_first", CEP_SKIP_TO_FIRST_ORACLE)
def cep_skip_to_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE end-to-end through the SQL statement surface with
    a non-default AFTER MATCH strategy (reference:
    AfterMatchSkipStrategy.skipToFirst, NFAITCase skip-strategy
    coverage): funnels every A-headed contiguous B-run, overlapping
    matches included."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    load(spark, sf_dir, "events").createOrReplaceTempView("cep_skip_events")
    return env.sql_query(
        """
        SELECT user_id, start_id, end_id, n_steps
        FROM cep_skip_events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts
          MEASURES
            A.event_id AS start_id,
            LAST(B.event_id) AS end_id,
            COUNT(B.*) AS n_steps
          AFTER MATCH SKIP TO FIRST B
          PATTERN (A B+)
          DEFINE
            A AS A.event_type = 'view' OR A.event_type = 'click',
            B AS B.event_type = 'click' OR B.event_type = 'purchase'
        ) AS T
        ORDER BY user_id, start_id
        """
    ).to_df()


# ALL ROWS PER MATCH over the same funnel chain: each matched input row
# is emitted (the reference's per-row MATCH_RECOGNIZE output mode,
# Table SQL `ALL ROWS PER MATCH`), carrying the match head (running
# FIRST(A.event_id)) and its CLASSIFIER.  The match SET is identical to
# cep_funnel's greedy chain, so the oracle reuses that recursive CTE and
# unnests two rows per match.

CEP_ALL_ROWS_ORACLE = CEP_FUNNEL_ORACLE.replace(
    "SELECT user_id, click_id, purchase_id FROM chain ORDER BY user_id, click_id",
    """SELECT ch.user_id, e.event_id, ch.click_id AS match_id,
       CASE WHEN e.rn = ch.click_rn THEN 'A'
            WHEN e.rn = ch.purch_rn THEN 'B'
            ELSE 'C' END AS role
FROM chain ch JOIN ev e
  ON e.user_id = ch.user_id AND e.rn BETWEEN ch.click_rn AND ch.purch_rn
ORDER BY ch.user_id, match_id, e.rn""",
)


@register("cep_all_rows_funnel", CEP_ALL_ROWS_ORACLE)
def cep_all_rows_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE ALL ROWS PER MATCH through the SQL statement
    surface: the cep_funnel chain re-emitted one row per MATCHED INPUT
    ROW with CLASSIFIER() and the running match head — the reference's
    per-row output mode (StreamExecMatch / SqlMatchRecognize ALL ROWS
    PER MATCH)."""
    from incubator_flink_spark.api.table import TableEnvironment

    from incubator_flink_spark.bench_knobs import bench_fast

    env = TableEnvironment(spark)
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    if bench_fast():
        # bench fast path: quarter of the keys — per-key NFA cost with
        # ALL-ROWS emission is row-proportional, so the timing scales
        # down without changing the measured plan shape
        ev = ev.where(F.col("user_id") % 4 == 0)
    ev.createOrReplaceTempView("cep_allrows_events")
    return env.sql_query(
        """
        SELECT user_id, event_id, match_id, role
        FROM cep_allrows_events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts
          MEASURES
            FIRST(A.event_id) AS match_id,
            CLASSIFIER() AS role
          ALL ROWS PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A C* B)
          WITHIN INTERVAL '1' DAY
          DEFINE
            A AS A.event_type = 'click',
            C AS C.event_type = 'click',
            B AS B.event_type = 'purchase'
        ) AS T
        ORDER BY user_id, match_id, role
        """
    ).to_df()


CEP_PAIRS_ANY_ORACLE = """
SELECT c.user_id AS user_id, c.event_id AS click_id, p.event_id AS purchase_id
FROM events c JOIN events p ON c.user_id = p.user_id
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
  AND (p.ts > c.ts OR (p.ts = c.ts AND p.event_id > c.event_id))
  AND epoch_us(p.ts) - epoch_us(c.ts) <= 86400000000
ORDER BY c.user_id, click_id, purchase_id
"""


@register("cep_pairs_any", CEP_PAIRS_ANY_ORACLE)
def cep_pairs_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """followedByAny end-to-end (Pattern.java followedByAny:322,
    ConsumingStrategy.SKIP_TILL_ANY): click followedByAny purchase
    within 1 day, NO_SKIP — unlike followedBy, matching events may be
    skipped, so the match set is EVERY (click, later purchase) pair in
    the window, which is exactly an interval join: the closed-form
    oracle that pins the SKIP_TILL_ANY semantics on real data (the
    randomized fuzz suite pins it on synthetic sequences)."""
    events = load(spark, sf_dir, "events")
    p = (
        Pattern.begin("click")
        .where(lambda e: e["event_type"] == "click")
        .followed_by_any("purchase")
        .where(lambda e: e["event_type"] == "purchase")
        .within(86400)
    )

    def select(key, m):
        return {
            "user_id": int(key["user_id"]),
            "click_id": int(m["click"][0]["event_id"]),
            "purchase_id": int(m["purchase"][0]["event_id"]),
        }

    return match_pattern(
        events, ["user_id"], "ts", p, select,
        "user_id BIGINT, click_id BIGINT, purchase_id BIGINT", tiebreak="event_id",
        columns=["event_id", "event_type"],
    ).orderBy("user_id", "click_id", "purchase_id")


CEP_OPTIONAL_START_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, ts, event_type,
         lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '|' ||
         lpad(CAST(event_id AS VARCHAR), 12, '0') AS k,
         CASE WHEN event_type = 'purchase'
              THEN lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '|' ||
                   lpad(CAST(event_id AS VARCHAR), 12, '0') END AS pk
  FROM events
),
w AS (
  SELECT user_id, event_id, ts, event_type,
         MIN(pk) OVER (PARTITION BY user_id ORDER BY k
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_pk
  FROM e
)
SELECT user_id, click_id, purchase_id FROM (
  -- skipped-optional variant: the purchase stage is the effective start
  -- state, so EVERY purchase matches alone
  SELECT user_id, CAST(-1 AS BIGINT) AS click_id, event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  -- captured variant: SKIP_TILL_NEXT cannot skip a purchase, so each
  -- click pairs with its NEXT purchase, window permitting
  SELECT user_id, event_id AS click_id,
         CAST(split_part(next_pk, '|', 2) AS BIGINT) AS purchase_id
  FROM w
  WHERE event_type = 'click' AND next_pk IS NOT NULL
    AND CAST(split_part(next_pk, '|', 1) AS BIGINT) - epoch_us(ts) <= 600 * 1000000
) t
ORDER BY user_id, click_id, purchase_id
"""


@register("cep_optional_start", CEP_OPTIONAL_START_ORACLE)
def cep_optional_start(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIONAL FIRST STAGE semantics behind the driver gate (r8 fix):
    ``begin(click).optional().followed_by(purchase)`` — when the optional
    stage takes nothing, the purchase stage is the computation's
    EFFECTIVE START STATE (the reference's start state opens a
    computation at every event; the optional stage contributes a PROCEED
    edge — NFACompiler createState/addStopStates + optional branching),
    so every purchase matches alone; the captured variant pairs each
    click with its next purchase (SKIP_TILL_NEXT: an intervening purchase
    cannot be skipped) inside the window.  Closed-form window-function
    oracle; the skipped variant spells click_id = -1 (sentinel instead of
    NULL so both engines sort identically).

    Scale: one user-key shuffle, per-key linear NFA scan."""
    events = load(spark, sf_dir, "events")
    p = (
        Pattern.begin("click")
        .where(lambda e: e["event_type"] == "click")
        .optional()
        .followed_by("purchase")
        .where(lambda e: e["event_type"] == "purchase")
        .within(600)
    )

    def select(key, m):
        return {
            "user_id": int(key["user_id"]),
            "click_id": int(m["click"][0]["event_id"]) if m.get("click") else -1,
            "purchase_id": int(m["purchase"][0]["event_id"]),
        }

    return match_pattern(
        events, ["user_id"], "ts", p, select,
        "user_id BIGINT, click_id BIGINT, purchase_id BIGINT", tiebreak="event_id",
        columns=["event_id", "event_type"],
    ).orderBy("user_id", "click_id", "purchase_id")


@register("cep_pairs_any_segmented", CEP_PAIRS_ANY_ORACLE)
def cep_pairs_any_segmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cep_pairs_any match set computed through the SEGMENTED hot-key
    executor (cep/executor.match_pattern_segmented): events are
    replicated into 2x within-sized segments, the NFA runs per
    (key, segment) group, and a match is claimed by the segment holding
    its first event — exact for within-bounded NO_SKIP patterns and the
    100 TB answer to a hot key serializing the per-key NFA (the
    reference's CepOperator is per-key with no such mitigation).  Same
    closed-form interval-join oracle as cep_pairs_any, so the driver
    gate pins the segmented code path itself."""
    from incubator_flink_spark.cep.executor import match_pattern_segmented

    events = load(spark, sf_dir, "events")
    p = (
        Pattern.begin("click")
        .where(lambda e: e["event_type"] == "click")
        .followed_by_any("purchase")
        .where(lambda e: e["event_type"] == "purchase")
        .within(86400)
    )

    def select(key, m):
        return {
            "user_id": int(key["user_id"]),
            "click_id": int(m["click"][0]["event_id"]),
            "purchase_id": int(m["purchase"][0]["event_id"]),
        }

    return match_pattern_segmented(
        events, ["user_id"], "ts", p, select,
        "user_id BIGINT, click_id BIGINT, purchase_id BIGINT", tiebreak="event_id",
        columns=["event_id", "event_type"],
        # W = 8x within: any W >= within is exact; doubling from 4x halves
        # the (key, segment) group count, amortizing Arrow/Python per-group
        # overhead (~40% faster at sf0.1) while keeping several segments
        # per key so the hot-key timeline still parallelizes
        segment_s=8 * 86400.0,
    ).orderBy("user_id", "click_id", "purchase_id")


# --- GroupPattern: (click NEXT view)+ consecutive, then next purchase --------
# Closed form: a group iteration is a strictly-contiguous (click, view)
# pair; consecutive() chains pairs back-to-back, so the match set is
# every sub-run of every maximal alternating pair-run (NO_SKIP emits all
# start pairs x all lengths), each followed by the FIRST later purchase
# (SKIP_TILL_NEXT: a matching purchase cannot be skipped) inside the
# within window.  Pair-runs group by (user, parity, rn - 2*row_number)
# — plain window functions, no recursion.

CEP_GROUP_CHAIN_ORACLE = """
WITH ev AS (
  SELECT user_id, event_id, event_type, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
pr AS (
  SELECT c.user_id, c.rn, c.event_id, c.ts
  FROM ev c JOIN ev v ON v.user_id = c.user_id AND v.rn = c.rn + 1
  WHERE c.event_type = 'click' AND v.event_type = 'view'
),
runs AS (
  SELECT *, rn % 2 AS par,
         rn - 2 * ROW_NUMBER() OVER (PARTITION BY user_id, rn % 2 ORDER BY rn) AS grp
  FROM pr
),
chains AS (
  SELECT a.user_id, a.event_id AS start_id, a.ts AS start_ts,
         b.rn + 1 AS end_rn, CAST((b.rn - a.rn) / 2 + 1 AS BIGINT) AS n_pairs
  FROM runs a JOIN runs b
    ON b.user_id = a.user_id AND b.par = a.par AND b.grp = a.grp AND b.rn >= a.rn
),
purch AS (
  SELECT user_id, rn, event_id, ts FROM ev WHERE event_type = 'purchase'
),
m AS (
  SELECT c.*,
         (SELECT MIN(p.rn) FROM purch p
          WHERE p.user_id = c.user_id AND p.rn > c.end_rn) AS np_rn
  FROM chains c
)
SELECT m.user_id AS user_id, m.start_id AS start_id, m.n_pairs AS n_pairs,
       p.event_id AS purchase_id
FROM m JOIN purch p ON p.user_id = m.user_id AND p.rn = m.np_rn
WHERE epoch_us(p.ts) - epoch_us(m.start_ts) <= 86400000000
ORDER BY user_id, start_id, n_pairs
"""


@register("cep_group_chain", CEP_GROUP_CHAIN_ORACLE)
def cep_group_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GroupPattern end-to-end (GroupPattern.java:30 — a quantified
    sub-pattern stage; NFACompiler createLoopingGroupPatternState):
    ``(click next view) oneOrMore consecutive followedBy purchase``
    within 1 day — alternating pair-runs whose every sub-run pairs with
    the next purchase.  The closed-form window-function oracle pins the
    group-iteration semantics on real data (the randomized group fuzz
    suite pins them on synthetic sequences)."""
    events = load(spark, sf_dir, "events")
    pair = (
        Pattern.begin("c")
        .where(lambda e: e["event_type"] == "click")
        .next("v")
        .where(lambda e: e["event_type"] == "view")
    )
    p = (
        Pattern.begin(pair)
        .one_or_more()
        .consecutive()
        .followed_by("p")
        .where(lambda e: e["event_type"] == "purchase")
        .within(86400)
    )

    def select(key, m):
        return {
            "user_id": int(key["user_id"]),
            "start_id": int(m["c"][0]["event_id"]),
            "n_pairs": len(m["c"]),
            "purchase_id": int(m["p"][0]["event_id"]),
        }

    return match_pattern(
        events, ["user_id"], "ts", p, select,
        "user_id BIGINT, start_id BIGINT, n_pairs BIGINT, purchase_id BIGINT",
        tiebreak="event_id", columns=["event_id", "event_type"],
    ).orderBy("user_id", "start_id", "n_pairs")


# --- nested row-pattern groups through the SQL statement --------------------
# PATTERN (((A B){2} C){1}): a quantified group whose body contains a
# quantified group (r8 — the reference compiles group bodies recursively,
# NFACompiler createGroupPatternState; GroupPattern.java:30).  Fixed
# quantifiers flatten the match to exactly five consecutive rows
# (A B A B C), so a lead()-based window oracle is closed-form; the
# candidate set is provably non-overlapping for this shape (a second
# start inside a match would need a click where the first match pins a
# view/purchase), so AFTER MATCH SKIP PAST LAST ROW emits every
# candidate and the oracle needs no skip simulation.

CEP_NESTED_GROUP_SQL_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, event_type,
         lead(event_type, 1) OVER w AS t1,
         lead(event_type, 2) OVER w AS t2,
         lead(event_type, 3) OVER w AS t3,
         lead(event_type, 4) OVER w AS t4,
         lead(event_id, 4) OVER w AS p_id
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
)
SELECT user_id, event_id AS a1, p_id
FROM e
WHERE event_type = 'click' AND t1 <> 'click' AND t2 = 'click'
      AND t3 <> 'click' AND t4 = 'purchase'
ORDER BY user_id, a1
"""


@register("cep_nested_group_sql", CEP_NESTED_GROUP_SQL_ORACLE)
def cep_nested_group_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested GroupPattern through the MATCH_RECOGNIZE SQL text surface,
    pinned by the flattened closed-form oracle on real data (the nested
    fuzz matrix pins it on synthetic sequences).

    Scale: one user_id shuffle, per-key Arrow-batched NFA — the same
    plan as every other MATCH_RECOGNIZE entry."""
    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    load(spark, sf_dir, "events").createOrReplaceTempView("events_ng")
    return (
        env.sql_query(
            """
            SELECT user_id, a1, p_id
            FROM events_ng MATCH_RECOGNIZE (
              PARTITION BY user_id
              ORDER BY ts
              MEASURES FIRST(A.event_id) AS a1, LAST(C.event_id) AS p_id
              PATTERN (((A B){2} C){1})
              DEFINE A AS A.event_type = 'click',
                     B AS B.event_type <> 'click',
                     C AS C.event_type = 'purchase'
            )
            """
        )
        .to_df()
        .orderBy("user_id", "a1")
    )
