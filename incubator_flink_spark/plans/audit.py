"""Physical-plan audit: the engine's replacement for the reference's
golden-plan tests (flink-table-planner's 198 XML expected-plan files —
SURVEY.md §5.2).

Instead of freezing full plan text (brittle across Spark versions), we
assert the *scale-relevant properties* of the physical plan: which join
strategies appear, whether filters/projections reached the parquet scan,
how many exchanges (shuffles) the plan has, and whether whole-stage
codegen covers the hot path. tests/test_plans.py pins these properties
for the headline queries, so a regression that un-broadcasts a dim join
or breaks pushdown fails CI even while results stay correct.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    broadcast_hash_joins: int = 0
    sort_merge_joins: int = 0
    shuffled_hash_joins: int = 0
    nested_loop_joins: int = 0
    exchanges: int = 0
    scans: int = 0
    scans_with_pushed_filters: int = 0
    read_schemas: list[str] = field(default_factory=list)
    codegen_blocks: int = 0
    raw: str = ""

    def read_columns(self, scan_idx: int = 0) -> list[str]:
        """Column names read by the scan_idx-th parquet scan."""
        if scan_idx >= len(self.read_schemas):
            return []
        m = re.search(r"struct<(.*)>", self.read_schemas[scan_idx])
        if not m:
            return []
        return re.findall(r"(\w+):", m.group(1))


def audit_plan(df: DataFrame, execute: bool = False) -> PlanReport:
    """Inspect the (optionally executed → AQE-final) physical plan."""
    if execute:
        # collect() (not a noop write) so THIS DataFrame's AQE plan finalizes
        # and codegen annotations appear in its explain output
        df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # "formatted" prints each operator in the tree and again in the detail
    # section; count tree occurrences only (lines starting with ( or *)
    tree = "\n".join(l for l in plan.splitlines() if re.match(r"^[\s:+\-*]*\(\d+\)", l))
    rep = PlanReport(raw=plan)
    rep.broadcast_hash_joins = tree.count("BroadcastHashJoin")
    rep.sort_merge_joins = tree.count("SortMergeJoin")
    rep.shuffled_hash_joins = tree.count("ShuffledHashJoin")
    rep.nested_loop_joins = tree.count("BroadcastNestedLoopJoin")
    rep.exchanges = tree.count("Exchange") - tree.count("BroadcastExchange")  # shuffles only
    rep.scans = tree.count("Scan parquet")
    for line in plan.splitlines():
        s = line.strip()
        if s.startswith("PushedFilters:") and not s.endswith("[]"):
            rep.scans_with_pushed_filters += 1
        if s.startswith("ReadSchema:"):
            rep.read_schemas.append(s)
    rep.codegen_blocks = plan.count("codegen id")
    return rep
