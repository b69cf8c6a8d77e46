"""Type-2 slowly-changing-dimension (versioned table) construction.

The reference's temporal join probes a *versioned table* — a primary-keyed
changelog where every key carries a history of (valid_from, valid_to)
versions (TemporalRowTimeJoinOperator.java:78; versioned views are
declared over changelogs in Flink's temporal-table-function surface,
Table.java:166 createTemporalTableFunction).  ``scd2_build`` is the
construction side of that story: compress a raw change history into
minimal versions (consecutive rows with unchanged tracked attributes
collapse — the gaps-and-islands discipline), then derive each version's
validity interval.

Scale shape: both windows partition by the dimension key — no global
ordering anywhere; the heavy input is reduced to version-grain before
the interval window runs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def scd2_build(
    history: DataFrame,
    key: str,
    ts_col: str,
    tiebreak: str,
    attrs: Sequence[str],
) -> DataFrame:
    """Build a change-compressed SCD2 dimension from a change history.

    ``history`` holds one row per observed change event; ``attrs`` are the
    tracked attribute columns.  Returns one row per (key, version) with
    ``valid_from`` / ``valid_to`` (NULL = open / current), ``n_rows``
    (history rows compressed into the version) and ``is_current``.
    """
    attrs = list(attrs)
    order = W.partitionBy(key).orderBy(ts_col, tiebreak)
    changed = F.lit(False)
    for a in attrs:
        prev = F.lag(a).over(order)
        changed = changed | prev.isNull() | (F.col(a) != prev)
    ver = (
        history.withColumn("__chg", changed.cast("int"))
        .withColumn(
            "version",
            F.sum("__chg").over(order.rowsBetween(W.unboundedPreceding, 0)).cast("bigint"),
        )
    )
    grp = ver.groupBy(key, "version").agg(
        F.min(ts_col).alias("valid_from"),
        *[F.min(a).alias(a) for a in attrs],
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    vw = W.partitionBy(key).orderBy("version")
    valid_to = F.lead("valid_from").over(vw)
    return grp.select(
        key,
        "version",
        "valid_from",
        valid_to.alias("valid_to"),
        *attrs,
        "n_rows",
        F.when(valid_to.isNull(), 1).otherwise(0).alias("is_current"),
    )
