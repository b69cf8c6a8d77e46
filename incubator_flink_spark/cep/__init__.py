"""Complex Event Processing (reference: flink-libraries/flink-cep —
Pattern.java combinator API + NFA.java engine; SQL MATCH_RECOGNIZE via
StreamExecMatch). Here: the Pattern surface compiled to a compact NFA
executed per key over time-sorted events inside an Arrow-batched
applyInPandas (batch) — the Spark-idiomatic placement of an inherently
row-sequential algorithm."""

from incubator_flink_spark.cep.pattern import Pattern
from incubator_flink_spark.cep.executor import match_pattern, match_pattern_with_timeouts
from incubator_flink_spark.cep.match_recognize import match_recognize, match_recognize_sql

__all__ = ["Pattern", "match_pattern", "match_pattern_with_timeouts", "match_recognize", "match_recognize_sql"]
