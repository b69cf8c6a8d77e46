"""Exact duplicated-span detection (operators/spans.py): hand-built
corpora with known shared substrings, plus plan shape (span text is only
ever joined via broadcast — never shuffled)."""

import pytest

from incubator_flink_spark.operators.spans import (
    duplicated_spans,
    span_dup_doc_stats,
    top_duplicated_spans,
    window_fingerprints,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_window_fingerprints_positions_and_counts(spark):
    d = _docs(spark, [(1, "a b c d e"), (2, "x y")])
    fp = window_fingerprints(d, window=3).collect()
    # doc 1: 3 windows (abc, bcd, cde) at pos 0,1,2; doc 2: too short -> none
    assert sorted((r.doc_id, r.pos) for r in fp) == [(1, 0), (1, 1), (1, 2)]


def test_duplicated_spans_cross_doc_only(spark):
    d = _docs(
        spark,
        [
            (1, "the quick brown fox jumps"),
            (2, "said the quick brown fox yesterday"),
            (3, "entirely different words here now"),
            # within-doc repeat only: must NOT count as cross-doc duplicated
            (4, "p q r s p q r s"),
        ],
    )
    dup = duplicated_spans(d, window=4).collect()
    # shared 4-gram windows between docs 1 and 2: "the quick brown fox"
    # and "quick brown fox ..." diverges (jumps vs yesterday), so exactly 1
    assert len(dup) == 1
    assert dup[0].n_docs == 2 and dup[0].n_occurrences == 2
    # min_docs=1 picks up doc 4's within-doc repeated window too
    dup1 = duplicated_spans(d, window=4, min_docs=1)
    within = dup1.where("n_docs = 1 AND n_occurrences >= 2").collect()
    assert len(within) == 1  # "p q r s" occurs twice in doc 4


def test_top_duplicated_spans_recovers_text(spark):
    d = _docs(
        spark,
        [
            (1, "alpha beta gamma delta one"),
            (2, "alpha beta gamma delta two"),
            (3, "alpha beta gamma delta three"),
        ],
    )
    top = top_duplicated_spans(d, window=4, k=10).collect()
    assert top[0].span == "alpha beta gamma delta"
    assert top[0].n_docs == 3 and top[0].n_occurrences == 3


def test_top_duplicated_spans_broadcasts_topk(spark):
    d = _docs(spark, [(1, "a b c d e"), (2, "a b c d f")])
    plan = top_duplicated_spans(d, window=4, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_span_dup_doc_stats_fraction(spark):
    d = _docs(
        spark,
        [
            # docs 1,2 share their full 4-token text -> dup_frac 1.0
            (1, "w x y z"),
            (2, "w x y z"),
            # doc 3 unique -> dup_frac 0.0 over its 2 windows
            (3, "m n o p q"),
            # doc 4 too short -> absent
            (4, "s t"),
        ],
    )
    stats = {r.doc_id: r for r in span_dup_doc_stats(d, window=4).collect()}
    assert set(stats) == {1, 2, 3}
    assert stats[1].n_windows == 1 and stats[1].dup_frac == 1.0
    assert stats[3].n_windows == 2 and stats[3].dup_frac == 0.0


def test_registry_span_queries_run(spark, sf_dir):
    from incubator_flink_spark.queries import REGISTRY

    top = REGISTRY["span_dup_topk"].fn(spark, sf_dir)
    assert top.columns == ["whash", "span", "n_docs", "n_occurrences"]
    rows = top.collect()
    assert 0 < len(rows) <= 50
    # every reported span really is window-sized and multiply-occurring
    assert all(len(r.span.split(" ")) == 8 and r.n_occurrences >= 2 for r in rows)

    stats = REGISTRY["span_dup_doc_stats"].fn(spark, sf_dir)
    assert stats.columns == ["doc_id", "n_windows", "n_dup_windows", "dup_frac"]
    assert stats.where("n_dup_windows > n_windows").count() == 0


def test_chunk_documents_overlap_and_boundaries(spark):
    from incubator_flink_spark.operators.spans import chunk_documents

    d = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"), (3, "x")],
        "doc_id long, text string",
    )
    out = chunk_documents(d, chunk_tokens=4, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 10 tokens, stride 2 -> starts 0,2,4,6 -> 4 chunks; last is full
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [r.chunk_text for r in c1] == [
        "t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6 t7", "t6 t7 t8 t9",
    ]
    # overlap property: consecutive chunks share exactly `overlap` tokens
    for a, b in zip(c1, c1[1:]):
        assert a.chunk_text.split()[-2:] == b.chunk_text.split()[:2]
    # short docs produce one partial chunk
    assert [r.chunk_text for r in by_doc[2]] == ["a b"]
    assert [r.n_tokens for r in by_doc[3]] == [1]
    # map-only plan: no exchange anywhere
    plan = chunk_documents(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.replace("BroadcastExchange", "")
