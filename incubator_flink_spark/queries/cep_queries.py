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
    ).orderBy("user_id", "click_id")
