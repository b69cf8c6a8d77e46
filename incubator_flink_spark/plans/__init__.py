"""Plan inspection and validation utilities."""

from incubator_flink_spark.plans.audit import PlanReport, audit_plan

__all__ = ["audit_plan", "PlanReport"]
