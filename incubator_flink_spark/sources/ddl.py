"""SQL DDL layer (reference: flink-sql-parser SqlCreateTable.java:70 /
SqlWatermark.java:39 / SqlTableLike.java:91 — CREATE TABLE with columns,
computed columns, a WATERMARK FOR clause, WITH ('connector'= ..., ...)
options, and a LIKE clause merged per MergeTableLikeUtil).

Maps declaratively onto Spark readers:
- connector 'filesystem' + format  → read_table (batch or streaming per
  the 'mode' option), schema from the column list
- connector 'datagen'              → rate source / deterministic range
- WATERMARK FOR c AS c - INTERVAL 'n' SECOND → withWatermark(c, n)
  (streaming mode; recorded as metadata in batch mode)
- computed columns (`name AS expr`) → withColumn(F.expr)
- PRIMARY KEY (...) NOT ENFORCED   → recorded, not enforced (as in the
  reference — Flink PKs are metadata too)

The parsed table registers as a temp view so ``spark.sql`` sees it —
the GenericInMemoryCatalog equivalent.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_flink_spark.sources.filesystem import read_table
from incubator_flink_spark.sources.util import datagen


@dataclass
class TableDef:
    name: str
    columns: list[tuple[str, str]] = field(default_factory=list)  # (name, type)
    computed: list[tuple[str, str]] = field(default_factory=list)  # (name, expr)
    # METADATA columns (SqlTableColumn.SqlMetadataColumn, flink-sql-parser
    # .../ddl/SqlTableColumn.java): `name TYPE METADATA [FROM 'key']
    # [VIRTUAL]` — (name, type, metadata key or None = column name,
    # virtual).  VIRTUAL columns are read-only and excluded from INSERT
    # schemas; persisted ones are writable only on connectors with
    # writable metadata.
    metadata_cols: list[tuple[str, str, str | None, bool]] = field(default_factory=list)
    watermark: tuple[str, int | None] | None = None  # (column, delay_s); None delay = SOURCE_WATERMARK()
    primary_key: list[str] = field(default_factory=list)
    partitioned_by: list[str] = field(default_factory=list)
    options: dict[str, str] = field(default_factory=dict)
    # CREATE TABLE ... LIKE clause (reference SqlTableLike.java:91):
    # (source table name, [(strategy, feature), ...]); merged against the
    # source definition by merge_table_like before execute_ddl runs
    like: tuple[str, list[tuple[str, str]]] | None = None


_CREATE_RE = re.compile(
    r"CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*\((.*)\)\s*WITH\s*\((.*?)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
# CREATE TABLE ... LIKE (SqlTableLike.java:91): the LIKE clause is last;
# with it present the column body and the WITH clause are both optional
_LIKE_RE = re.compile(
    r"\bLIKE\s+(\w+)\s*(?:\(\s*((?:INCLUDING|EXCLUDING|OVERWRITING)[^)]*)\))?\s*;?\s*$",
    re.IGNORECASE,
)
_LIKE_OPT_RE = re.compile(
    r"(INCLUDING|EXCLUDING|OVERWRITING)\s+"
    r"(ALL|CONSTRAINTS|GENERATED|METADATA|OPTIONS|PARTITIONS|WATERMARKS)",
    re.IGNORECASE,
)
_CREATE_LIKE_RE = re.compile(
    r"CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*"
    r"(?:\((.*)\))?\s*(?:WITH\s*\((.*?)\))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
# the PARTITIONED BY clause sits between the column list and WITH; it is
# extracted (and removed) BEFORE the main regex because the greedy column
# body must be able to contain parens (PRIMARY KEY (...), types)
_PART_RE = re.compile(r"PARTITIONED\s+BY\s*\(([^)]*)\)\s*(?=WITH)", re.IGNORECASE)
_WM_RE = re.compile(
    r"WATERMARK\s+FOR\s+(\w+)\s+AS\s+\w+\s*-\s*INTERVAL\s+'(\d+)'\s+(SECOND|MINUTE|HOUR)",
    re.IGNORECASE,
)
# WATERMARK FOR ts AS SOURCE_WATERMARK() — defer to the connector's own
# watermark (FLIP-126 SupportsWatermarkPushDown; BuiltInFunctionDefinitions
# SOURCE_WATERMARK).  File/kafka replay sources here have no native
# watermark generator, so the closest strategy is strictly-ascending
# (delay 0); stored as delay None so SHOW CREATE round-trips the spelling.
_WM_SRC_RE = re.compile(
    r"WATERMARK\s+FOR\s+(\w+)\s+AS\s+SOURCE_WATERMARK\s*\(\s*\)", re.IGNORECASE
)
_PK_RE = re.compile(r"PRIMARY\s+KEY\s*\(([^)]*)\)(\s+NOT\s+ENFORCED)?", re.IGNORECASE)
# `name TYPE METADATA [FROM 'key'] [VIRTUAL]` (SqlTableColumn.java's
# SqlMetadataColumn branch; grammar in docs/content/docs/dev/table/sql/
# create.md "Metadata columns").  The type is lazy so multi-word types
# (TIMESTAMP(3) WITH LOCAL TIME ZONE) parse; METADATA anchors the tail.
_META_COL_RE = re.compile(
    r"(\w+)\s+(.+?)\s+METADATA(?:\s+FROM\s+'([^']+)')?(\s+VIRTUAL)?\s*$",
    re.IGNORECASE,
)


def _split_top_level(s: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def _parse_like_options(opts_text: str | None) -> list[tuple[str, str]]:
    """Parse and validate the LIKE option list per SqlTableLike.validate
    (SqlTableLike.java:201-227): each feature may be declared only once,
    and OVERWRITING is invalid for ALL, PARTITIONS, and CONSTRAINTS."""
    if not opts_text:
        return []
    parsed = [
        (m.group(1).upper(), m.group(2).upper())
        for m in _LIKE_OPT_RE.finditer(opts_text)
    ]
    feats = [f for _, f in parsed]
    if len(feats) != len(set(feats)):
        raise ValueError("Each like option feature can be declared only once.")
    for strat, feat in parsed:
        if strat == "OVERWRITING" and feat in ("ALL", "PARTITIONS", "CONSTRAINTS"):
            raise ValueError(f"Illegal merging strategy 'OVERWRITING' for '{feat}' option.")
    return parsed


def parse_create_table(sql: str) -> TableDef:
    sql = sql.strip()
    like: tuple[str, list[tuple[str, str]]] | None = None
    lm = _LIKE_RE.search(sql)
    if lm:
        like = (lm.group(1), _parse_like_options(lm.group(2)))
        sql = sql[: lm.start()].rstrip()
    part_by: list[str] = []
    pm = _PART_RE.search(sql) if like is None else _PART_RE.search(sql + " WITH")
    if pm:
        part_by = [c.strip() for c in pm.group(1).split(",") if c.strip()]
        sql = sql[: pm.start()] + sql[pm.end() :]
    m = _CREATE_RE.search(sql)
    if not m and like is not None:
        # with a LIKE clause the column body and WITH are both optional
        m = _CREATE_LIKE_RE.search(sql)
    if not m:
        raise ValueError("unsupported DDL (expected CREATE TABLE name (...) WITH (...))")
    name, body, opts = m.group(1), m.group(2) or "", m.group(3) or ""
    t = TableDef(name=name)
    t.partitioned_by = part_by
    t.like = like
    for part in _split_top_level(body):
        wm = _WM_RE.match(part)
        if wm:
            unit = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600}[wm.group(3).upper()]
            t.watermark = (wm.group(1), int(wm.group(2)) * unit)
            continue
        wms = _WM_SRC_RE.match(part)
        if wms:
            t.watermark = (wms.group(1), None)  # SOURCE_WATERMARK()
            continue
        pk = _PK_RE.match(part)
        if pk:
            t.primary_key = [c.strip() for c in pk.group(1).split(",")]
            continue
        cm = re.match(r"(\w+)\s+AS\s+(.*)", part, re.IGNORECASE)
        if cm and not re.match(r"(\w+)\s+AS\s+\w+\s*-\s*INTERVAL", part, re.IGNORECASE):
            t.computed.append((cm.group(1), cm.group(2)))
            continue
        mm = _META_COL_RE.match(part)
        if mm:
            t.metadata_cols.append(
                (mm.group(1), mm.group(2).strip(), mm.group(3), mm.group(4) is not None)
            )
            continue
        col = re.match(r"(\w+)\s+(.+)", part)
        if col:
            t.columns.append((col.group(1), col.group(2).strip()))
    for om in re.finditer(r"'([^']+)'\s*=\s*'([^']*)'", opts):
        t.options[om.group(1)] = om.group(2)
    return t


_LIKE_DEFAULTS = {
    "OPTIONS": "OVERWRITING",
    "WATERMARKS": "INCLUDING",
    "GENERATED": "INCLUDING",
    "METADATA": "INCLUDING",
    "CONSTRAINTS": "INCLUDING",
    "PARTITIONS": "INCLUDING",
}


def merge_table_like(derived: TableDef, source: TableDef) -> TableDef:
    """Merge a CREATE TABLE ... LIKE definition against its source table
    per the reference's MergeTableLikeUtil (flink-table-planner
    MergeTableLikeUtil.java:66-199 — default strategies at :71-78, ALL
    expansion at :94-118, option merge at :184-207, partition merge at
    :164-181) and SchemaBuilder (:209-520 — physical columns always
    inherit and may never collide, computed columns overwrite only under
    OVERWRITING GENERATED, watermark re-declaration requires OVERWRITING
    WATERMARKS, a derived PRIMARY KEY clashes with an included source key).
    """
    strategies = dict(_LIKE_DEFAULTS)
    opts = derived.like[1] if derived.like else []
    for strat, feat in opts:
        if feat == "ALL":
            for f in strategies:
                strategies[f] = strat
    for strat, feat in opts:
        if feat != "ALL":
            strategies[feat] = strat

    merged = TableDef(name=derived.name)

    # --- physical columns: source's always inherit; derived append; any
    # name collision with a source column is an error (SchemaBuilder
    # collectPhysicalFieldsTypes, MergeTableLikeUtil.java:482-500)
    source_cols = {c for c, _ in source.columns}
    source_computed = {c for c, _ in source.computed}
    source_metadata = {c for c, _, _, _ in source.metadata_cols}
    merged.columns = list(source.columns)
    for c, ty in derived.columns:
        if c in source_cols or c in source_computed or c in source_metadata:
            raise ValueError(f"A column named '{c}' already exists in the base table.")
        merged.columns.append((c, ty))

    # --- METADATA columns (MergeTableLikeUtil SchemaBuilder
    # appendDerivedColumns, metadata branch): carried under INCLUDING
    # METADATA (the default), dropped under EXCLUDING, redefinable only
    # under OVERWRITING METADATA
    md = strategies["METADATA"]
    merged.metadata_cols = [] if md == "EXCLUDING" else list(source.metadata_cols)
    kept_metadata = {c for c, _, _, _ in merged.metadata_cols}
    phys_names = {c for c, _ in merged.columns}
    for c, ty, key, virtual in derived.metadata_cols:
        if c in phys_names:
            raise ValueError(
                f"A column named '{c}' already exists in the base table. "
                "Metadata columns can only overwrite other metadata columns."
            )
        if c in kept_metadata:
            if md != "OVERWRITING":
                raise ValueError(
                    f"A metadata column named '{c}' already exists in the base "
                    "table. You might want to specify EXCLUDING METADATA or "
                    "OVERWRITING METADATA."
                )
            merged.metadata_cols = [
                m if m[0] != c else (c, ty, key, virtual) for m in merged.metadata_cols
            ]
        else:
            merged.metadata_cols.append((c, ty, key, virtual))

    # --- computed (GENERATED) columns (MergeTableLikeUtil.java:404-433)
    gen = strategies["GENERATED"]
    merged.computed = [] if gen == "EXCLUDING" else list(source.computed)
    kept_computed = {c for c, _ in merged.computed}
    all_physical = {c for c, _ in merged.columns}
    merged_metadata_names = {c for c, _, _, _ in merged.metadata_cols}
    for c, expr in derived.computed:
        if c in all_physical or c in merged_metadata_names:
            raise ValueError(
                f"A column named '{c}' already exists in the base table. "
                "Computed columns can only overwrite other computed columns."
            )
        if c in kept_computed:
            if gen != "OVERWRITING":
                raise ValueError(
                    f"A generated column named '{c}' already exists in the base "
                    "table. You might want to specify EXCLUDING GENERATED or "
                    "OVERWRITING GENERATED."
                )
            merged.computed = [(n, e) if n != c else (c, expr) for n, e in merged.computed]
        else:
            merged.computed.append((c, expr))

    # --- watermark (MergeTableLikeUtil.java:260-268, 344-360)
    wm = strategies["WATERMARKS"]
    merged.watermark = None if wm == "EXCLUDING" else source.watermark
    if derived.watermark is not None:
        if merged.watermark is not None:
            if merged.watermark[0] == derived.watermark[0]:
                if wm != "OVERWRITING":
                    raise ValueError(
                        f"There already exists a watermark spec for column "
                        f"'{derived.watermark[0]}' in the base table. You might "
                        "want to specify EXCLUDING WATERMARKS or OVERWRITING "
                        "WATERMARKS."
                    )
            else:
                raise ValueError("Multiple watermark definitions are not supported.")
        merged.watermark = derived.watermark

    # --- primary key (MergeTableLikeUtil.java:270-310): source key carries
    # only under INCLUDING CONSTRAINTS; a derived key next to a carried one
    # is an error; key columns must be physical
    merged.primary_key = (
        list(source.primary_key) if strategies["CONSTRAINTS"] == "INCLUDING" else []
    )
    if derived.primary_key:
        if merged.primary_key:
            raise ValueError(
                "The base table already has a primary key. You might want to "
                "specify EXCLUDING CONSTRAINTS."
            )
        for c in derived.primary_key:
            if c not in all_physical:
                raise ValueError(
                    f"Could not create a PRIMARY KEY with column '{c}'.\n"
                    "A PRIMARY KEY constraint must be declared on physical columns."
                )
        merged.primary_key = list(derived.primary_key)

    # --- partitions (MergeTableLikeUtil.java:164-181, reference-faithful:
    # EXCLUDING only waives the both-declared error; a derived list wins,
    # otherwise the source list carries)
    if (
        derived.partitioned_by
        and source.partitioned_by
        and strategies["PARTITIONS"] != "EXCLUDING"
    ):
        raise ValueError(
            "The base table already has partitions defined. You might want to "
            "specify EXCLUDING PARTITIONS."
        )
    merged.partitioned_by = list(derived.partitioned_by or source.partitioned_by)

    # --- options (MergeTableLikeUtil.java:184-207)
    om = strategies["OPTIONS"]
    merged.options = {} if om == "EXCLUDING" else dict(source.options)
    for k, v in derived.options.items():
        if om != "OVERWRITING" and k in merged.options:
            raise ValueError(
                f"There already exists an option ['{k}' -> '{merged.options[k]}'] "
                "in the base table. You might want to specify EXCLUDING OPTIONS "
                "or OVERWRITING OPTIONS."
            )
        merged.options[k] = v
    return merged


# Flink's filesystem readable metadata keys (FileSystemTableSource
# listReadableMetadata: file.path/file.name/file.size/
# file.modification-time) → Spark's hidden ``_metadata`` struct on file
# scans (the exact same four fields).
_FILESYSTEM_METADATA = {
    "file.path": "_metadata.file_path",
    "file.name": "_metadata.file_name",
    "file.size": "_metadata.file_size",
    "file.modification-time": "_metadata.file_modification_time",
}
# Flink's kafka readable metadata keys (KafkaDynamicSource.ReadableMetadata)
# → the columns Spark's ``format("kafka")`` reader produces natively.
# 'headers' needs includeHeaders=true on a real reader and arrives as
# array<struct<key,value>>; Flink's type is MAP<STRING, BYTES>, so the
# mapping wraps it in map_from_entries.
_KAFKA_METADATA = {
    "topic": "topic",
    "partition": "partition",
    "offset": "offset",
    "timestamp": "timestamp",
    "timestamp-type": "timestampType",
    "headers": "headers",
}


def _apply_metadata_columns(df: DataFrame, t: TableDef, mapping: dict[str, str]) -> DataFrame:
    """Materialize the DDL's METADATA columns from the connector's native
    metadata fields (the reference's applyReadableMetadata push-down)."""
    for name, typ, key, _virtual in t.metadata_cols:
        k = key if key is not None else name
        if k not in mapping:
            raise ValueError(
                f"metadata column {name!r}: key {k!r} is not readable on connector "
                f"{t.options.get('connector', 'filesystem')!r} "
                f"(supported: {sorted(mapping)})"
            )
        df = df.withColumn(name, F.col(mapping[k]).cast(typ))
    return df


# Flink format-option names (docs/connectors/table/formats/csv.md and
# json.md: 'csv.field-delimiter', 'csv.ignore-parse-errors', ...) → the
# Spark DataFrameReader/Writer option they configure.  Unknown keys under
# the format prefix are forwarded verbatim (they are Spark option names —
# header, encoding, timestampFormat, ...).
_FLINK_FMT_OPTION_MAP = {
    "field-delimiter": "sep",
    "quote-character": "quote",
    "escape-character": "escape",
    "null-literal": "nullValue",
    "allow-comments": "comment",  # value 'true' enables '#' comments
}


def format_options(t: TableDef, *, for_write: bool = False) -> dict[str, str]:
    """Extract `<format>.<key>` options from the WITH clause and translate
    them for Spark's reader/writer (CsvFormatFactory / JsonFormatFactory
    option parity)."""
    fmt = t.options.get("format", "parquet")
    pre = fmt + "."
    out: dict[str, str] = {}
    for k, v in t.options.items():
        if not k.startswith(pre):
            continue
        key = k[len(pre):]
        if key == "ignore-parse-errors":
            # read-side resilience (DROPMALFORMED); meaningless on write
            if v == "true" and not for_write:
                out["mode"] = "DROPMALFORMED"
        elif key == "allow-comments":
            if v == "true" and not for_write:
                out["comment"] = "#"
        elif key in _FLINK_FMT_OPTION_MAP:
            out[_FLINK_FMT_OPTION_MAP[key]] = v
        else:
            out[key] = v
    return out


def _read_kafka_table(spark: SparkSession, t: TableDef, streaming: bool) -> DataFrame:
    """connector 'kafka': decode kafka-shaped frames into the declared
    schema (KafkaDynamicTableFactory wiring: key format + value format +
    requested metadata).  Broker-less sandbox: frames are read from the
    'frames-path' option as parquet with exactly the columns Spark's
    ``format("kafka")`` reader produces (key/value BINARY + topic/
    partition/offset/timestamp/timestampType), so against a real broker
    only the frame source line changes."""
    from incubator_flink_spark.sources.kafka import parse_kafka

    if "frames-path" not in t.options:
        raise ValueError(
            "connector 'kafka': no broker exists in this sandbox — provide "
            "'frames-path' pointing at kafka-shaped parquet frames "
            "(key/value BINARY + topic/partition/offset/timestamp columns)"
        )
    import os as _os

    if not streaming and not _os.path.isdir(t.options["frames-path"]):
        # sink-first kafka table: no frames until the first INSERT writes
        # them (CREATE is metadata-only in the reference)
        schema = ", ".join(f"{n} {ty}" for n, ty in t.columns)
        df = spark.createDataFrame([], schema)
        for name, typ, _key, _virtual in t.metadata_cols:
            df = df.withColumn(name, F.lit(None).cast(typ))
        return df
    if streaming:
        # a streaming file source needs an explicit schema: take it from
        # the frames already on disk (same move a real kafka reader makes
        # implicitly — its wire schema is fixed)
        frame_schema = spark.read.parquet(t.options["frames-path"]).schema
        frames = spark.readStream.schema(frame_schema).parquet(t.options["frames-path"])
    else:
        frames = read_table(spark, t.options["frames-path"], "parquet")
    prefix = t.options.get("key.fields-prefix", "")
    key_fields = [c.strip() for c in t.options.get("key.fields", "").split(";") if c.strip()]
    phys = dict(t.columns)
    missing = [c for c in key_fields if c not in phys]
    if missing:
        raise ValueError(f"key.fields {missing} are not physical columns of {t.name!r}")
    if key_fields and "key.format" not in t.options:
        raise ValueError("'key.fields' requires 'key.format' (reference: KafkaConnectorOptionsUtil)")
    key_schema = ", ".join(
        # the key format sees key fields with the prefix stripped
        f"{c[len(prefix):] if prefix and c.startswith(prefix) else c} {phys[c]}"
        for c in key_fields
    )
    value_schema = ", ".join(f"{c} {ty}" for c, ty in t.columns if c not in key_fields)
    df = parse_kafka(
        frames,
        value_format=t.options.get("value.format", t.options.get("format", "json")),
        value_schema=value_schema or None,
        key_format=t.options.get("key.format") if key_fields else None,
        key_schema=key_schema or None,
        key_prefix=prefix,
        metadata=tuple(
            dict.fromkeys(
                _KAFKA_METADATA[(k if k is not None else n)]
                for n, _, k, _ in t.metadata_cols
                if (k if k is not None else n) in _KAFKA_METADATA
            )
        ),
    )
    bad = [
        (n, k)
        for n, _, k, _ in t.metadata_cols
        if (k if k is not None else n) not in _KAFKA_METADATA
    ]
    if bad:
        raise ValueError(
            f"metadata column(s) {bad}: not readable on connector 'kafka' "
            f"(supported: {sorted(_KAFKA_METADATA)})"
        )
    # rename/cast the native metadata fields to the declared column names,
    # then restore the declared order: physical columns, then metadata
    for name, typ, key, _virtual in t.metadata_cols:
        k = key if key is not None else name
        native = _KAFKA_METADATA[k]
        col = F.col(native)
        if k == "headers":
            col = F.map_from_entries(col)
        df = df.withColumn(name, col.cast(typ))
    return df.select(
        *[c for c, _ in t.columns], *[n for n, _, _, _ in t.metadata_cols]
    )


def _read_upsert_kafka_table(spark: SparkSession, t: TableDef, streaming: bool) -> DataFrame:
    """connector 'upsert-kafka' (UpsertKafkaDynamicTableFactory): requires
    a PRIMARY KEY (the kafka message key); a null value is a DELETE
    tombstone for the key, any non-null value an UPDATE_AFTER.  The
    registered table materializes CURRENT state — tombstoned keys absent,
    last write per key wins in per-partition offset order — i.e. the
    ChangelogNormalize the reference plans on top of an upsert source.
    Broker-less sandbox: frames come from 'frames-path' (see
    _read_kafka_table)."""
    from incubator_flink_spark.sources.kafka import parse_upsert_kafka
    from incubator_flink_spark.streaming.changelog import changelog_normalize

    if not t.primary_key:
        raise ValueError(
            "'upsert-kafka' requires a PRIMARY KEY (NOT ENFORCED) — the kafka "
            "message key (reference: UpsertKafkaDynamicTableFactory"
            ".validatePKConstraints)"
        )
    if "frames-path" not in t.options:
        raise ValueError(
            "connector 'upsert-kafka': no broker exists in this sandbox — "
            "provide 'frames-path' pointing at kafka-shaped parquet frames"
        )
    if streaming:
        raise ValueError(
            "upsert-kafka DDL registers the materialized batch view here; the "
            "streaming normalize path is streaming/changelog.py keep_last form"
        )
    import os as _os

    if not _os.path.isdir(t.options["frames-path"]):
        # sink-first upsert table: empty until the first INSERT
        return spark.createDataFrame([], ", ".join(f"{n} {ty}" for n, ty in t.columns))
    frames = read_table(spark, t.options["frames-path"], "parquet")
    phys = dict(t.columns)
    missing = [c for c in t.primary_key if c not in phys]
    if missing:
        raise ValueError(f"PRIMARY KEY columns {missing} are not declared columns")
    key_schema = ", ".join(f"{c} {phys[c]}" for c in t.primary_key)
    value_schema = ", ".join(
        f"{c} {ty}" for c, ty in t.columns if c not in t.primary_key
    )
    log = parse_upsert_kafka(
        frames,
        key_format=t.options.get("key.format", "json"),
        key_schema=key_schema,
        value_format=t.options.get("value.format", "json"),
        value_schema=value_schema or None,
        metadata=("offset",),
    )
    return changelog_normalize(log, list(t.primary_key), "offset", "offset").select(
        *[c for c, _ in t.columns]
    )


def write_kafka_frames(spark: SparkSession, t: TableDef, df: DataFrame, upsert: bool) -> None:
    """INSERT INTO a kafka/upsert-kafka table: encode rows as kafka-shaped
    frames and append them to 'frames-path' (the broker-less counterpart
    of KafkaDynamicSink / UpsertKafkaDynamicTableFactory's serializer —
    against a real broker only this writer line changes).

    - kafka: key = JSON of 'key.fields' (prefix-stripped names, matching
      the deserializer), value = JSON of the remaining physical columns.
    - upsert-kafka: key = JSON of the PRIMARY KEY, value = JSON of the
      non-key columns; INSERTed rows are upserts (tombstones only arise
      from changelog pipelines, as in the reference).
    - a PERSISTED `timestamp` METADATA column is writable (the reference's
      kafka writable metadata); other frame fields are synthesized:
      partition 0, offsets past the current max.  Offsets within one
      INSERT are assigned DETERMINISTICALLY (a stable sort of
      key/value/timestamp, materialized single-partition — the sink
      declares a one-partition topic, so this mirrors a real broker where
      a fixed key always lands on one partition and producer order is
      preserved): the upsert winner for duplicate keys inside one INSERT
      is reproducible across runs and partitionings.
    """
    import os

    if "frames-path" not in t.options:
        raise ValueError("kafka INSERT in this sandbox needs 'frames-path'")
    path = t.options["frames-path"]
    topic = t.options.get("topic", t.name)
    prefix = t.options.get("key.fields-prefix", "")
    if upsert:
        key_fields = list(t.primary_key)
    else:
        key_fields = [c.strip() for c in t.options.get("key.fields", "").split(";") if c.strip()]
    phys = [c for c, _ in t.columns]
    value_cols = [c for c in phys if c not in key_fields]

    def strip(c: str) -> str:
        return c[len(prefix):] if prefix and c.startswith(prefix) else c

    key = (
        F.encode(
            F.to_json(F.struct(*[F.col(c).alias(strip(c)) for c in key_fields])), "UTF-8"
        )
        if key_fields
        else F.lit(None).cast("binary")
    )
    value = F.encode(F.to_json(F.struct(*[F.col(c) for c in value_cols])), "UTF-8")
    ts_md = next(
        (name for name, _, k, virtual in t.metadata_cols
         if not virtual and (k if k is not None else name) == "timestamp"),
        None,
    )
    ts = F.col(ts_md).cast("timestamp") if ts_md else F.current_timestamp()
    exists = os.path.isdir(path) and any(f.endswith(".parquet") for f in os.listdir(path))
    base_off = (
        spark.read.parquet(path).agg(F.max("offset")).first()[0] if exists else None
    ) or 0
    frames = (
        df.select(
            key.alias("key"),
            value.alias("value"),
            F.lit(topic).alias("topic"),
            F.lit(0).alias("partition"),
            ts.alias("timestamp"),
            F.lit(0).alias("timestampType"),
        )
        # deterministic per-INSERT ordinals: stable sort, then a single
        # partition (the declared one-partition topic) so
        # monotonically_increasing_id yields consecutive 0..n-1 in sorted
        # order regardless of the query's upstream partitioning
        .orderBy("key", "value", "timestamp")
        .coalesce(1)
        .withColumn("offset", F.lit(base_off + 1) + F.monotonically_increasing_id())
        .select("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")
    )
    if exists:
        # match the layout already on disk (the read side takes the first
        # file's schema; mixed widths would be undefined)
        have = spark.read.parquet(path).columns
        frames = frames.select(*[c for c in frames.columns if c in have])
    frames.write.mode("append").parquet(path)


def execute_ddl(spark: SparkSession, sql: str | None, table_def: TableDef | None = None) -> DataFrame:
    """Create the table described by the DDL (or an already-parsed
    ``table_def`` — used to refresh a view after an INSERT writes through
    the connector), register it as a temp view, and return its DataFrame."""
    t = table_def if table_def is not None else parse_create_table(sql)
    connector = t.options.get("connector", "filesystem")
    streaming = t.options.get("mode", "batch") == "streaming"
    schema = ", ".join(f"{n} {typ}" for n, typ in t.columns)
    if connector == "filesystem":
        fmt = t.options.get("format", "parquet")
        # self-describing formats (parquet/orc) carry physical types; the
        # DECLARED schema is the catalog's (FLIP-273 column evolution:
        # ALTER TABLE ADD/REPLACE/CHANGE COLUMNS retypes or extends it
        # without rewriting files).  Read physically, then conform: absent
        # columns scan as typed NULLs, retyped columns insert-cast.  A
        # reader schema would instead demand physical-type equality
        # (PARQUET_COLUMN_DATA_TYPE_MISMATCH at scan time).  Text formats
        # (csv/json/text) still need the schema at parse time; streaming
        # file sources require a reader schema — both keep the old path.
        conform = bool(schema) and fmt in ("parquet", "orc") and not streaming
        try:
            df = read_table(
                spark,
                t.options["path"],
                fmt,
                schema=None if conform else (schema or None),
                streaming=streaming,
                **format_options(t),
            )
            if conform:
                have = set(df.columns)
                df = df.select(
                    *[
                        (F.col(n).cast(ty) if n in have else F.lit(None).cast(ty)).alias(n)
                        for n, ty in t.columns
                    ]
                )
        except Exception as e:  # noqa: BLE001
            # CREATE TABLE is metadata-only in the reference: a sink table's
            # path need not exist until the first INSERT writes it.  Register
            # an empty view with the declared schema (requires one).
            if "PATH_NOT_FOUND" not in str(e) or streaming:
                raise
            if not schema:
                raise ValueError(
                    f"table {t.name!r}: path does not exist and no schema declared"
                ) from e
            df = spark.createDataFrame([], schema)
        if t.metadata_cols:
            if not df.isStreaming and not df.inputFiles():
                # empty sink-table registration (no files yet): the hidden
                # _metadata struct only exists on a real file scan — declare
                # the columns as typed nulls until the first INSERT refresh
                for name, typ, _key, _virtual in t.metadata_cols:
                    df = df.withColumn(name, F.lit(None).cast(typ))
            else:
                df = _apply_metadata_columns(df, t, _FILESYSTEM_METADATA)
    elif connector == "kafka":
        df = _read_kafka_table(spark, t, streaming)
    elif connector == "upsert-kafka":
        df = _read_upsert_kafka_table(spark, t, streaming)
    elif connector in ("print", "blackhole"):
        # sink-only connectors (PrintTableSinkFactory / BlackHoleTableSinkFactory):
        # register an empty typed view; INSERT INTO routes through
        # TableEnvironment._insert_into's print/noop write
        if not t.columns:
            raise ValueError(f"connector {connector!r}: declare the sink schema")
        df = spark.createDataFrame([], schema)
    elif connector == "datagen":
        if t.metadata_cols:
            raise ValueError("connector 'datagen' exposes no readable metadata")
        df = datagen(
            spark,
            rows_per_second=int(t.options.get("rows-per-second", "100")),
            streaming=streaming,
            n_rows=int(t.options.get("number-of-rows", "1000")),
        )
    else:
        raise ValueError(f"unsupported connector: {connector}")
    for name, expr in t.computed:
        df = df.withColumn(name, F.expr(expr))
    if t.watermark and streaming:
        col, delay = t.watermark
        df = df.withWatermark(col, f"{0 if delay is None else delay} seconds")
    if not streaming:
        df.createOrReplaceTempView(t.name)
    return df
