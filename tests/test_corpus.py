"""Tests for the wave-5 corpus operators: line-level boilerplate dedup,
distributed BPE training (pinned against a pure-Python reference), and
count-min-sketch heavy hitters (overestimate guarantee + exactness on a
collision-free range)."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load
from incubator_flink_spark.operators.bpe import (
    END_MARK,
    bpe_train,
    pair_counts,
    to_symbols,
    word_freqs,
)
from incubator_flink_spark.operators.lines import doc_lines, line_dedup
from incubator_flink_spark.operators.sketch import cms_build, cms_estimate


# --- line dedup ---------------------------------------------------------------


def test_doc_lines_pseudo_lines_cover_all_tokens(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l"), (2, "x y"), (3, "")],
        "doc_id LONG, text STRING",
    )
    rows = doc_lines(df, tokens_per_line=5).collect()
    got = {(r["doc_id"], r["line_no"]): r["line"] for r in rows}
    assert got[(1, 0)] == "a b c d e"
    assert got[(1, 1)] == "f g h i j"
    assert got[(1, 2)] == "k l"
    assert got[(2, 0)] == "x y"
    assert 3 not in {d for d, _ in got}  # empty text yields no lines


def test_line_dedup_keeps_canonical_copy_only(spark):
    boiler = "subscribe to our newsletter now ok"
    df = spark.createDataFrame(
        [
            (1, boiler + " unique one two three four"),
            (2, boiler + " other words here too yes"),
            (3, "completely fresh text with no repeats"),
        ],
        "doc_id LONG, text STRING",
    )
    out = {r["doc_id"]: r for r in line_dedup(df, min_count=2, tokens_per_line=6).collect()}
    # doc 1 holds the canonical copy (lowest doc_id, line_no), keeps both lines
    assert out[1]["n_dropped"] == 0 and out[1]["text"].startswith(boiler)
    # doc 2's copy of the boilerplate line is dropped
    assert out[2]["n_dropped"] == 1 and boiler not in out[2]["text"]
    assert out[3]["n_dropped"] == 0


# --- BPE ----------------------------------------------------------------------


def _py_bpe(texts: list[str], n_merges: int):
    """Pure-Python reference BPE with the same determinism rules:
    end-of-word marker, count-desc/left/right argmax, stop when max < 2."""
    wf = Counter(w for t in texts for w in t.lower().split(" ") if w)
    vocab = {w: tuple(list(w) + [END_MARK]) for w in wf}
    merges = []
    for step in range(1, n_merges + 1):
        pc = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wf[w]
        if not pc:
            break
        (left, right), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < 2:
            break
        merges.append((step, left, right, cnt))
        new_vocab = {}
        for w, syms in vocab.items():
            out, skip = [], False
            for i, s in enumerate(syms):
                if skip:
                    skip = False
                    continue
                if s == left and i + 1 < len(syms) and syms[i + 1] == right:
                    out.append(left + right)
                    skip = True
                else:
                    out.append(s)
            new_vocab[w] = tuple(out)
        vocab = new_vocab
    return merges, vocab


def test_bpe_train_matches_python_reference(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    want_merges, want_vocab = _py_bpe(texts, 12)
    merges, vocab = bpe_train(docs, n_merges=12)
    got = [(r["step"], r["left"], r["right"], r["cnt"]) for r in merges.orderBy("step").collect()]
    assert got == want_merges
    got_vocab = {r["word"]: tuple(r["syms"]) for r in vocab.collect()}
    assert got_vocab == want_vocab


def test_bpe_pair_counts_weighted_by_freq(spark):
    df = spark.createDataFrame([(1, "ab ab cd")], "doc_id LONG, text STRING")
    pc = {
        (r["left"], r["right"]): r["cnt"]
        for r in pair_counts(to_symbols(word_freqs(df))).collect()
    }
    assert pc[("a", "b")] == 2
    assert pc[("b", END_MARK)] == 2
    assert pc[("c", "d")] == 1


# --- count-min sketch ---------------------------------------------------------


def test_cms_never_underestimates_and_is_exact_without_collisions(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word")).where(
        F.col("word") != ""
    )
    exact = words.groupBy("word").agg(F.count(F.lit(1)).alias("exact_cnt"))
    sketch = cms_build(words, "word")
    est = cms_estimate(sketch, exact, "word").collect()
    assert est, "corpus produced no words"
    n_exact = 0
    for r in est:
        assert r["est"] >= r["exact_cnt"], (r["word"], r["est"], r["exact_cnt"])
        n_exact += r["est"] == r["exact_cnt"]
    # the synthetic vocab is far smaller than depth*width: most estimates
    # should be collision-free and thus exact
    assert n_exact >= len(est) * 0.8


def test_cms_weighted_build(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 3), ("b", 2)], "k STRING, w LONG"
    )
    sketch = cms_build(df, "k", weight_col="w")
    keys = df.select("k").distinct()
    got = {r["k"]: r["est"] for r in cms_estimate(sketch, keys, "k").collect()}
    assert got["a"] >= 8 and got["b"] >= 2


def test_hll_estimate_within_error_bound(spark, sf_dir):
    """HLL with m=256 has ~6.5% std error; assert the estimate lands
    within 20% of truth on the distinct-shingle population (tens of
    thousands of items — the proper HLL regime)."""
    from incubator_flink_spark.functions.text import shingles, tokens
    from incubator_flink_spark.operators.sketch import hll_estimate, hll_registers

    docs = load(spark, sf_dir, "documents")
    sh = docs.select(F.explode(shingles(tokens(F.col("text")), 3)).alias("sh"))
    exact = sh.select("sh").distinct().count()
    est = hll_estimate(hll_registers(sh, "sh")).collect()[0]["est"]
    assert exact > 1000  # regime check: not linear-counting territory
    assert abs(est - exact) / exact < 0.20, (est, exact)


def test_bloom_filter_join_exact_with_false_positives(spark, sf_dir):
    """bloom_filter_join: the anti result equals a plain anti-join
    (false positives never change semantics), and no false negatives
    exist (every true match is a candidate)."""
    from incubator_flink_spark.operators.bloom import bloom_filter_join

    d = load(spark, sf_dir, "documents").select("doc_id", F.md5("text").alias("ck"))
    bl = d.where(F.col("doc_id") % 7 == 0).select(F.col("ck").alias("bk")).distinct()
    kept, cands = bloom_filter_join(d, bl, "ck", "bk", m_bits=512, mode="anti")
    want = d.join(bl.select(F.col("bk").alias("ck")), "ck", "anti")
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in want.collect()
    )
    # no false negatives: every blocked doc appears among candidates
    blocked = d.join(bl.select(F.col("bk").alias("ck")), "ck", "semi")
    cand_ids = {r["doc_id"] for r in cands.collect()}
    assert {r["doc_id"] for r in blocked.collect()} <= cand_ids


def test_bloom_filter_join_null_keys_survive_anti(spark):
    """NULL corpus keys can match nothing, so anti mode must KEEP them
    (SQL anti-join semantics) rather than dropping them from both
    branches via a NULL predicate."""
    from incubator_flink_spark.operators.bloom import bloom_filter_join

    d = spark.createDataFrame([(1, "k1"), (2, "k2"), (3, None)], "doc_id LONG, ck STRING")
    bl = spark.createDataFrame([("k1",)], "bk STRING")
    kept, cands = bloom_filter_join(d, bl, "ck", "bk", m_bits=64, mode="anti")
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]
    assert all(r["doc_id"] != 3 for r in cands.collect())


def test_bpe_encode_stats_matches_python_vocab(spark, sf_dir):
    """Encoding the corpus with the trained segmentation gives exactly
    sum(|syms(word)|) per document of the python-reference vocab."""
    from incubator_flink_spark.operators.bpe import bpe_encode_stats

    docs = load(spark, sf_dir, "documents")
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    _, want_vocab = _py_bpe(list(texts.values()), 10)
    _, vocab = bpe_train(docs, n_merges=10)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode_stats(docs, vocab).collect()
    }
    for doc_id, text in texts.items():
        ws = [w for w in text.lower().split(" ") if w]
        if not ws:
            assert doc_id not in got
            continue
        assert got[doc_id] == (len(ws), sum(len(want_vocab[w]) for w in ws))


def test_bpe_train_matches_python_on_randomized_corpus(spark):
    """Randomized (fixed-seed) corpus with digits, punctuation, repeats,
    and 1-char words: the Catalyst zip-with-next merge fold must track
    the pure-Python reference through 15 merges."""
    import random

    rng = random.Random(20260814)
    alphabet = "abcdz019.,!"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
        for _ in range(120)
    ]
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randint(3, 30))) for _ in range(40)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    want_merges, want_vocab = _py_bpe(texts, 15)
    merges, vocab = bpe_train(docs, n_merges=15)
    got = [(r["step"], r["left"], r["right"], r["cnt"]) for r in merges.orderBy("step").collect()]
    assert got == want_merges
    assert {r["word"]: tuple(r["syms"]) for r in vocab.collect()} == want_vocab


def test_line_dedup_matches_python_on_randomized_corpus(spark):
    """Randomized corpus with planted repeated lines: Spark line_dedup
    equals a pure-Python keep-canonical-first implementation."""
    import random
    from collections import defaultdict

    rng = random.Random(9157)
    vocab = ["red", "blue", "fox", "jumps", "runs", "stops", "ok", "go"]
    boiler = [" ".join(rng.choice(vocab) for _ in range(4)) for _ in range(3)]
    rows = []
    for i in range(30):
        lines = []
        for _ in range(rng.randint(1, 5)):
            if rng.random() < 0.4:
                lines.append(rng.choice(boiler))
            else:
                lines.append(" ".join(rng.choice(vocab) for _ in range(4)))
        rows.append((i, " ".join(lines)))
    k = 4

    # pure-python reference
    occ = defaultdict(list)  # line -> [(doc, line_no)]
    doc_lines_py = {}
    for d, text in rows:
        toks = text.split(" ")
        ls = [" ".join(toks[j : j + k]) for j in range(0, len(toks), k)]
        doc_lines_py[d] = ls
        for p, l in enumerate(ls):
            occ[l].append((d, p))
    want = {}
    for d, ls in doc_lines_py.items():
        kept = [
            l
            for p, l in enumerate(ls)
            if len(occ[l]) < 2 or min(occ[l]) == (d, p)
        ]
        want[d] = (len(ls), len(ls) - len(kept), " ".join(kept))

    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (r["n_lines"], r["n_dropped"], r["text"])
        for r in line_dedup(docs, min_count=2, tokens_per_line=k).collect()
    }
    assert got == want


def test_kcore_matches_python_peel(spark, sf_dir):
    """Iterative k-core peel vs a pure-Python reference on the part
    co-purchase graph (parts linked when bought in the same order)."""
    from collections import defaultdict

    from incubator_flink_spark.operators.graph import kcore

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.withColumnRenamed("l_partkey", "pa")
    b = li.withColumnRenamed("l_partkey", "pb")
    e = (
        a.join(b, "l_orderkey")
        .where(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
    )
    edges = {(min(r.src, r.dst), max(r.src, r.dst)) for r in e.collect() if r.src != r.dst}
    k = 60
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    alive = set(adj)
    while True:
        drop = {v for v in alive if len(adj[v] & alive) < k}
        if not drop:
            break
        alive -= drop
    want = {v: len(adj[v] & alive) for v in alive}
    got = {r["vertex"]: r["core_degree"] for r in kcore(e, k).collect()}
    assert got == want
    assert want, "choose k so the core is non-empty at this SF"
    assert len(want) < len(adj), "choose k so the peel actually drops vertices"


def test_winnowing_density_guarantee(spark):
    """Winnowing's coverage property: with window w over k-gram hashes,
    every w consecutive k-gram positions contain at least one selected
    fingerprint position (Schleimer et al. 2003, the density bound the
    selection rule must never violate)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from incubator_flink_spark.catalog import load
    from incubator_flink_spark.functions.hashing import hash64

    from incubator_flink_spark.queries.documents import (
        _WINNOW_INF,
        _WINNOW_K as K,
        _WINNOW_W as W_WIN,
    )

    d = load(spark, "/root/testdata/sf0.001", "documents").where(
        F.length("text") >= K + W_WIN
    ).limit(50)
    pos = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("text") - (K - 1))).alias("p"),
        "text",
    )
    hashed = pos.select(
        "doc_id", "p", hash64(F.expr(f"substring(text, p, {K})")).alias("h")
    )
    base = W.partitionBy("doc_id").orderBy("p")
    inf = F.lit(_WINNOW_INF)
    sel = hashed
    for s in range(1, W_WIN):
        sel = sel.withColumn(
            f"lmin{s}", F.coalesce(F.min("h").over(base.rowsBetween(-s, -1)), inf)
        ).withColumn(
            f"rmin{s}", F.coalesce(F.min("h").over(base.rowsBetween(1, s)), inf)
        )
    sel = sel.withColumn("lmin0", inf).withColumn("rmin0", inf)
    keep = None
    for s in range(W_WIN):
        cond = (F.col("h") <= F.col(f"lmin{s}")) & (
            F.col("h") < F.col(f"rmin{W_WIN - 1 - s}")
        )
        keep = cond if keep is None else (keep | cond)
    sel = sel.withColumn("keep", keep)
    # max run of consecutive non-selected positions must be < w
    runs = sel.select(
        "doc_id",
        "p",
        F.sum(F.when(F.col("keep"), 1).otherwise(0))
        .over(W.partitionBy("doc_id").orderBy("p"))
        .alias("grp"),
    )
    worst = (
        runs.groupBy("doc_id", "grp")
        .agg(F.count(F.lit(1)).alias("run"))
        .agg(F.max("run"))
        .collect()[0][0]
    )
    assert worst <= W_WIN


def test_ktruss_matches_python_peel(spark):
    """Iterative k-truss peel vs a pure-Python reference on a randomized
    sparse graph (two planted cliques plus noise edges)."""
    import random as _random
    from itertools import combinations

    from incubator_flink_spark.operators.graph import ktruss

    rng = _random.Random(11)
    edges = set()
    for base in (0, 20):  # two 8-cliques (every edge support 6)
        clique = range(base, base + 8)
        edges |= {(u, v) for u, v in combinations(clique, 2)}
    while len(edges) < 120:  # noise edges over 60 vertices
        u, v = rng.randrange(60), rng.randrange(60)
        if u != v:
            edges.add((min(u, v), max(u, v)))

    k = 4
    alive = set(edges)
    while True:
        adj = {}
        for u, v in alive:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        sup = {(u, v): len(adj[u] & adj[v]) for u, v in alive}
        drop = {e for e in alive if sup[e] < k - 2}
        if not drop:
            break
        alive -= drop
    want = {(u, v): sup[(u, v)] for u, v in alive}

    e = spark.createDataFrame(sorted(edges), "src LONG, dst LONG")
    got = {(r["a"], r["b"]): r["support"] for r in ktruss(e, k).collect()}
    assert got == want
    assert want and len(want) < len(edges)
