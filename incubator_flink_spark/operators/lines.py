"""Line-level boilerplate deduplication (CCNet / MassiveText recipe,
public: Wenzek et al. 2020 "CCNet", Rae et al. 2021 "Gopher" §A.1.1):
split every document into lines, count each normalized line's occurrences
across the WHOLE corpus, and rewrite documents keeping only one canonical
copy of any repeated line.  This is the pass that strips navigation bars,
cookie banners, and licence footers from web corpora.

Scale shape (100 TB):
- line explosion is map-only; every line is reduced to its 60-bit
  ``hash64`` BEFORE any shuffle, so the corpus-wide count shuffles 8-byte
  keys, never line text, and partial aggregation (map-side combine)
  bounds each task's output by its distinct-line count;
- the canonical-copy choice is a ``min_by`` on (doc_id, line_no) inside
  the same aggregation — no second pass and no window over the exploded
  table;
- the rewrite joins the exploded table against the (hash → canonical)
  table on the 8-byte hash and reassembles per document with one
  doc_id-keyed aggregation.  Two shuffles total, both on fixed-width keys.

The reference has no line-dedup operator (beyond-reference scope); the
closest machinery is the keyed-dedup family in
flink-table/flink-table-planner/src/main/scala/org/apache/flink/table/planner/plan/nodes/physical/stream/StreamPhysicalDeduplicate.scala
applied per-line instead of per-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from incubator_flink_spark.functions.hashing import hash64


def doc_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    tokens_per_line: int | None = None,
) -> DataFrame:
    """(id, line_no, line): documents exploded into lines.

    ``sep`` splits on a real delimiter; for single-line corpora (the
    synthetic testdata) pass ``tokens_per_line`` to derive fixed-width
    pseudo-lines from whitespace tokens instead — the downstream dedup is
    unit-agnostic.  Map-only: no shuffle either way."""
    if tokens_per_line is not None:
        toks = F.split(F.col(text_col), " ")
        n = F.size(toks)
        k = F.lit(tokens_per_line)
        lines = F.transform(
            F.sequence(F.lit(0), F.when(n > 0, (n - 1) / k).otherwise(0).cast("int")),
            lambda i: F.array_join(F.slice(toks, i * k + 1, tokens_per_line), " "),
        )
    else:
        lines = F.split(F.col(text_col), sep)
    # filter AFTER posexplode so line_no keeps the pre-filter index — an
    # array-level filter would renumber around interior empty lines and
    # diverge from any index-assigning replica (the DuckDB oracles)
    return docs.select(
        F.col(id_col), F.posexplode(lines).alias("line_no", "line")
    ).where(F.col("line") != "")


def line_counts(lines: DataFrame) -> DataFrame:
    """(line_hash, n_occurrences, canon_doc, canon_line_no): corpus-wide
    occurrence count per distinct line with the canonical first occurrence
    (lowest doc_id, then line_no).  One shuffle on the 8-byte line hash."""
    hashed = lines.withColumn("line_hash", hash64(F.col("line")))
    pos = F.struct(F.col(lines.columns[0]).alias("d"), F.col("line_no").alias("p"))
    return hashed.groupBy("line_hash").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.min(pos).alias("__c"),
    ).select(
        "line_hash",
        "n_occurrences",
        F.col("__c.d").alias("canon_doc"),
        F.col("__c.p").alias("canon_line_no"),
    )


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    tokens_per_line: int | None = None,
    sep: str = "\n",
) -> DataFrame:
    """(id, n_lines, n_dropped, text): documents rewritten with repeated
    lines removed.  A line whose corpus-wide count >= ``min_count`` is
    kept only at its canonical first occurrence (min doc_id, then
    line_no) and dropped everywhere else; unique lines always survive.

    Returns the full cleaned corpus; callers wanting only stats can
    aggregate the result."""
    lines = doc_lines(docs, id_col, text_col, sep, tokens_per_line)
    counts = line_counts(lines)
    hashed = lines.withColumn("line_hash", hash64(F.col("line")))
    keep: Column = (F.col("n_occurrences") < min_count) | (
        (F.col(id_col) == F.col("canon_doc")) & (F.col("line_no") == F.col("canon_line_no"))
    )
    joiner = sep if tokens_per_line is None else " "
    kept = (
        hashed.join(counts, "line_hash")
        .withColumn("__keep", keep)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(~F.col("__keep"), 1).otherwise(0)).alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__keep"),
                                F.struct(F.col("line_no").alias("p"), F.col("line").alias("s")),
                            )
                        )
                    ),
                    lambda st: st["s"],
                ),
                joiner,
            ).alias(text_col),
        )
    )
    return kept
