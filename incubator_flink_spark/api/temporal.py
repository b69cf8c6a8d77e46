"""Temporal table function API + ``FOR SYSTEM_TIME AS OF`` SQL spelling.

Reference surface:
- flink-table-api-java/.../api/Table.java:166 ``createTemporalTableFunction``
  (a versioned table keyed by a primary key, versions ordered by a time
  attribute; calling it with a probe-side time attribute yields the
  version valid AS OF that time).
- flink-table-planner temporal join SQL:
  ``JOIN Rates FOR SYSTEM_TIME AS OF o.order_time AS r ON o.ccy = r.ccy``
  (TemporalRowTimeJoinOperator.java:78 runtime semantics).

Spark-first design: both spellings lower onto the same sort-merge as-of
operator (operators/asof.py) — one shuffle on the join key, a
partition-local sort, no driver loop — rather than a per-key stateful
translation. The SQL spelling is a pre-parse rewrite: the canonical
``probe [AS] p JOIN build FOR SYSTEM_TIME AS OF p.ts [AS] b ON <equi>``
fragment is computed with asof_join, registered as a temp view, and the
remaining SQL (arbitrary SELECT/WHERE/GROUP/ORDER around it) runs
unchanged through Spark SQL with ``b.``-references redirected to the
flattened view.

Limitations (documented divergence, canonical shape only):
- the ON clause must be a conjunction of ``p.col = b.col`` equalities;
- build payload column names that clash with probe columns are exposed
  as ``v__<name>`` (SQL references through the build alias are rewritten
  automatically, but the OUTPUT column name changes unless aliased);
- the build side's version-time attribute is exposed as a payload
  column when (and only when) the query references it through the
  build alias (``b.<time_attr>``), clash-renamed like any payload;
- processing-time ``FOR SYSTEM_TIME AS OF PROCTIME()`` is the lookup
  join's job (streaming/lookup.py), not this rewrite.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from incubator_flink_spark.operators.asof import asof_join


@dataclass
class TemporalTableFunction:
    """Versioned-table handle (Table.createTemporalTableFunction result):
    versions of each ``primary_key`` row ordered by ``time_attr``."""

    df: DataFrame
    time_attr: str
    primary_key: str

    def __call__(self, probe_time_attr: str) -> "TemporalTableCall":
        """rates(o_rowtime) — bind the probe-side time attribute."""
        return TemporalTableCall(self, probe_time_attr)


@dataclass
class TemporalTableCall:
    fn: TemporalTableFunction
    probe_time_attr: str


def _parse_equi_condition(cond: str) -> list[tuple[str, str]]:
    """'a = b AND c = d' -> [(a, b), (c, d)]; raises on anything else."""
    pairs = []
    for part in re.split(r"(?i)\s+AND\s+", cond.strip()):
        m = re.fullmatch(r"\s*([\w.]+)\s*=\s*([\w.]+)\s*", part)
        if not m:
            raise ValueError(
                f"temporal join condition must be equi-conjunctions, got {part!r}"
            )
        pairs.append((m.group(1), m.group(2)))
    return pairs


def temporal_join(
    probe: DataFrame,
    call: TemporalTableCall,
    condition: str,
    how: str = "inner",
    expose_version_time: bool = False,
) -> DataFrame:
    """probe.join_lateral(rates(probe_ts), 'probe_ccy = build_ccy').

    ``condition``: equi-conjunctions over bare column names
    (probe-side name = build-side name, either order). Output: probe
    columns + build columns minus the join keys and (unless
    ``expose_version_time``) the version time attribute, clash-renamed
    ``v__<name>``.  With ``expose_version_time`` the matched version's
    time attribute is emitted as a payload column (the reference's
    temporal join exposes the build row's rowtime).
    """
    build = call.fn.df
    probe_cols, build_cols = set(probe.columns), set(build.columns)
    keys: list[tuple[str, str]] = []  # (probe_col, build_col)
    for a, b in _parse_equi_condition(condition):
        a, b = a.split(".")[-1], b.split(".")[-1]
        if a in probe_cols and b in build_cols:
            keys.append((a, b))
        elif b in probe_cols and a in build_cols:
            keys.append((b, a))
        else:
            raise ValueError(f"cannot resolve join pair {a!r} = {b!r}")
    # align build key names to probe names so asof_join sees equal keys
    for p, b in keys:
        if p != b:
            build = build.withColumnRenamed(b, p)
    key_names = [p for p, _ in keys]
    payload = {
        c: (c if c not in probe_cols else f"v__{c}")
        for c in build.columns
        if c not in key_names
        and (c != call.fn.time_attr or expose_version_time)
    }
    return asof_join(
        probe,
        build,
        keys=key_names,
        probe_ts=call.probe_time_attr,
        build_ts=call.fn.time_attr,
        payload=payload,
        how=how,
    )


_SYSTEM_TIME_RE = re.compile(
    r"(?is)"
    r"(?P<probe>[\w./]+)\s+(?:AS\s+)?(?P<pa>\w+)\s+"
    r"(?P<jt>LEFT\s+(?:OUTER\s+)?JOIN|INNER\s+JOIN|JOIN)\s+"
    r"(?P<build>[\w./]+)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+"
    r"(?P<pts>\w+\.\w+)\s+(?:AS\s+)?(?P<ba>\w+)\s+"
    # the ON clause is captured up to the next clause boundary and
    # VALIDATED by _parse_equi_condition — a non-equi predicate gets a
    # precise error naming it, instead of silently truncating the match
    r"ON\s+(?P<cond>.+?)"
    r"(?=\s+(?:LEFT\s+(?:OUTER\s+)?JOIN|INNER\s+JOIN|JOIN|WHERE|GROUP\s+BY|"
    r"ORDER\s+BY|HAVING|LIMIT|UNION|WINDOW)\b|\s*\)|\s*;|\s*$)"
)

_view_seq = [0]


def rewrite_system_time_join(
    spark: SparkSession,
    sql: str,
    versioned: dict[str, tuple[str, str]],
    resolve=None,
) -> str:
    """Rewrite every ``FOR SYSTEM_TIME AS OF`` join fragment in ``sql``
    into a reference to a pre-computed as-of view, returning plain Spark
    SQL. ``versioned`` maps build-table names to (time_attr, primary_key)
    — the metadata Flink DDL carries on a versioned table. ``resolve``
    maps a table name to its DataFrame (default: Spark temp views).
    """
    resolve = resolve or (lambda name: spark.table(name))
    redirects: list[tuple[str, str, dict[str, str]]] = []  # (pa, ba, renames)

    def _sub(m: re.Match) -> str:
        probe_name, pa, jt = m.group("probe"), m.group("pa"), m.group("jt").upper()
        build_name, ba = m.group("build"), m.group("ba")
        if probe_name.upper() in ("FROM", "JOIN", "WHERE", "ON", "AND"):
            raise ValueError(
                "the probe side of a FOR SYSTEM_TIME AS OF join must be "
                "written '<table> [AS] <alias>' (alias required)"
            )
        if build_name not in versioned:
            raise ValueError(
                f"{build_name} is not a registered versioned table "
                f"(known: {sorted(versioned)})"
            )
        time_attr, _pk = versioned[build_name]
        probe_df, build_df = resolve(probe_name), resolve(build_name)
        pts_alias, pts_col = m.group("pts").split(".")
        if pts_alias != pa:
            raise ValueError(
                f"FOR SYSTEM_TIME AS OF must reference the probe alias "
                f"{pa!r}, got {pts_alias!r}"
            )
        how = "left" if jt.startswith("LEFT") else "inner"
        ttf = TemporalTableFunction(build_df, time_attr, _pk)
        cond = re.sub(rf"(?i)\b({pa}|{ba})\.", "", m.group("cond"))
        # expose the build side's version-time attribute iff the query
        # references it through the build alias (VERDICT r9 #8)
        wants_vt = bool(
            re.search(rf"(?i)\b{ba}\.{time_attr}\b", sql.replace(m.group(0), ""))
        )
        flat = temporal_join(
            probe_df, ttf(pts_col), cond, how=how, expose_version_time=wants_vt
        )
        _view_seq[0] += 1
        view = f"__system_time_asof_{_view_seq[0]}"
        flat.createOrReplaceTempView(view)
        renames = {c: f"v__{c}" for c in probe_df.columns if f"v__{c}" in flat.columns}
        redirects.append((pa, ba, renames))
        return f"{view} AS {pa}"

    out = _SYSTEM_TIME_RE.sub(_sub, sql)
    # redirect surviving build-alias references to the flat view; payload
    # columns keep their build names except probe-clashes (v__-renamed)
    for pa, ba, renames in redirects:
        out = re.sub(
            rf"(?i)\b{ba}\.(\w+)",
            lambda mm: f"{pa}.{renames.get(mm.group(1), mm.group(1))}",
            out,
        )
    return out
