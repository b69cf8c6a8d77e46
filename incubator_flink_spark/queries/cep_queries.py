"""CEP coverage query (reference: flink-cep Pattern/NFA; MATCH_RECOGNIZE).

No DuckDB oracle: multi-stage patterns with skip strategies are not
expressible in ANSI SQL (the driver records a rows-only check, per the
contract for genuinely non-SQL operators). Correctness is covered by
tests/test_cep.py against hand-computed fixtures and source-data
invariants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from incubator_flink_spark.catalog import load
from incubator_flink_spark.cep import Pattern, match_pattern
from incubator_flink_spark.queries.registry import register


@register("cep_funnel", oracle=None)
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
