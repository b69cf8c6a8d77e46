"""Similarity-search coverage over the ``embeddings`` table
(array<float> x 64): brute-force cosine top-k (baseline), threshold
near-pairs, and the hyperplane-LSH bucketed variant (scale path).

The LSH oracle replicates the bucket assignment with the same fixed
hyperplane constants (inlined as a 512-row VALUES table) — bucket bits are
sign tests on O(1)-magnitude dots, so engine-order float differences
cannot realistically flip them; cosines are rounded to 6 decimals in both
engines before compare/rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_flink_spark.catalog import load, spread
from incubator_flink_spark.operators.similarity import (
    BAND_BITS,
    BAND_PLANES,
    HYPERPLANES,
    brute_force_topk,
    lsh_topk,
    near_pairs_lsh,
    semantic_dedup,
)
from incubator_flink_spark.queries.registry import register

_COS_CTE = """
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.embedding AS qe, c.embedding AS ce
  FROM (SELECT * FROM embeddings WHERE vec_id < 20) q, embeddings c
  WHERE q.vec_id <> c.vec_id),
elems AS (
  SELECT query_id, neighbor_id,
         CAST(unnest(qe) AS DOUBLE) AS x, CAST(unnest(ce) AS DOUBLE) AS y
  FROM pairs),
cos AS (
  SELECT query_id, neighbor_id,
         ROUND(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) AS cos
  FROM elems GROUP BY query_id, neighbor_id)
"""

ANN_TOPK_ORACLE = f"""
WITH {_COS_CTE}
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT query_id, neighbor_id, cos,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
  FROM cos) t
WHERE rank <= 5
ORDER BY query_id, rank
"""


@register("ann_cosine_topk", ANN_TOPK_ORACLE)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    return (
        brute_force_topk(e, q, 5)
        .select("query_id", "neighbor_id", "cos", F.col("rank").cast("int").alias("rank"))
        .orderBy("query_id", "rank")
    )


def _band_planes_values_sql() -> str:
    rows = []
    for p, plane in enumerate(BAND_PLANES):
        for d, w in enumerate(plane):
            rows.append(f"({p},{d},{w!r})")
    return ", ".join(rows)


NEAR_PAIRS_ORACLE = f"""
WITH planes(p, d, wt) AS (VALUES {_band_planes_values_sql()}),
e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings),
dots AS (
  SELECT e.vec_id, p.p, SUM(e.x * p.wt) AS dot
  FROM e JOIN planes p ON e.d = p.d GROUP BY e.vec_id, p.p),
sigs AS (
  SELECT vec_id, p // {BAND_BITS} AS band,
         CAST(SUM(CASE WHEN dot > 0 THEN 1 << (p % {BAND_BITS}) ELSE 0 END) AS INT) AS sig
  FROM dots GROUP BY vec_id, p // {BAND_BITS}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id),
elems AS (
  SELECT cand.id_a, cand.id_b,
         CAST(unnest(ea.embedding) AS DOUBLE) AS x, CAST(unnest(eb.embedding) AS DOUBLE) AS y
  FROM cand JOIN embeddings ea ON ea.vec_id = cand.id_a
            JOIN embeddings eb ON eb.vec_id = cand.id_b)
SELECT id_a, id_b,
       ROUND(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) AS cos
FROM elems GROUP BY id_a, id_b
HAVING ROUND(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) >= 0.35
ORDER BY id_a, id_b
"""


@register("embedding_near_pairs", NEAR_PAIRS_ORACLE)
def embedding_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold near-pair mining via banded LSH + exact-cosine verify.

    Round 1 registered the O(n^2) crossJoin baseline here; the scale path
    (equi-join on (band, signature) — candidate-proportional work) is now
    the registered operator, with the banding replicated in the oracle.
    The brute-force baseline remains `operators.similarity.near_pairs`
    (used by tests to measure the banding's recall)."""
    e = load(spark, sf_dir, "embeddings")
    return near_pairs_lsh(e, 0.35).orderBy("id_a", "id_b")


SEMANTIC_DEDUP_ORACLE = f"""
WITH planes(p, d, wt) AS (VALUES {_band_planes_values_sql()}),
e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings),
dots AS (
  SELECT e.vec_id, p.p, SUM(e.x * p.wt) AS dot
  FROM e JOIN planes p ON e.d = p.d GROUP BY e.vec_id, p.p),
sigs AS (
  SELECT vec_id, p // {BAND_BITS} AS band,
         CAST(SUM(CASE WHEN dot > 0 THEN 1 << (p % {BAND_BITS}) ELSE 0 END) AS INT) AS sig
  FROM dots GROUP BY vec_id, p // {BAND_BITS}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id),
elems AS (
  SELECT cand.id_a, cand.id_b,
         CAST(unnest(ea.embedding) AS DOUBLE) AS x, CAST(unnest(eb.embedding) AS DOUBLE) AS y
  FROM cand JOIN embeddings ea ON ea.vec_id = cand.id_a
            JOIN embeddings eb ON eb.vec_id = cand.id_b),
dropped AS (
  SELECT DISTINCT id_b FROM elems GROUP BY id_a, id_b
  HAVING ROUND(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) >= 0.35)
SELECT em.vec_id, em.label FROM embeddings em
WHERE em.vec_id NOT IN (SELECT id_b FROM dropped)
ORDER BY em.vec_id
"""


@register("semantic_dedup", SEMANTIC_DEDUP_ORACLE)
def semantic_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style embedding dedup: drop vectors with a smaller-id
    near neighbor (cosine >= 0.35), keep the rest. Candidates come from
    the banded LSH (oracle replicates the banding), so survivors are
    exact within the banding's recall — precision is 1.0 (exact-cosine
    verify) and the recall floor vs brute force is pinned by
    tests/test_operators.py::test_semantic_dedup_drops_near_neighbors."""
    e = load(spark, sf_dir, "embeddings")
    return semantic_dedup(e, 0.35).select("vec_id", "label").orderBy("vec_id")


# ---------------------------------------------------------------------------
# Near-dup regime (threshold >= 0.8) — the operating point near-dup mining
# actually runs at 100TB.  The synthetic corpus has no natural pairs above
# cos ~0.51, so the query plants deterministic near-duplicates: every 5th
# vector gets a copy (vec_id + 100000) with an additive per-dimension
# perturbation ((vec_id*31 + d*17) % 7 - 3) * 0.01 — pure integer
# arithmetic times one shared double constant, so Spark and DuckDB compute
# bit-identical perturbed vectors (planted cos ~0.987; all other pairs
# stay < 0.52).  banding_for_threshold(0.8) auto-selects the deep (12, 48)
# banding whose LCG planes the oracle regenerates in SQL (see
# operators/similarity.py band_planes).
# ---------------------------------------------------------------------------


def _augment_near_dups(e: DataFrame) -> DataFrame:
    base = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"), "label"
    )
    # perturb BEFORE re-keying: an alias of vec_id in the same select would
    # capture the shifted id inside the lambda (analyzer resolves same-select
    # aliases), silently changing the jitter pattern
    pert = (
        base.where(F.col("vec_id") % 5 == 0)
        .withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x, i: x + ((F.col("vec_id") * 31 + i * 17) % 7 - 3) * F.lit(0.01),
            ),
        )
        .withColumn("vec_id", F.col("vec_id") + 100000)
        .select("vec_id", "embedding", "label")
    )
    return base.unionAll(pert)


def _deep_banding_ctes(bits: int, bands: int) -> str:
    """Shared oracle CTEs: augmented corpus (exploded), LCG planes, band
    signatures, candidate pairs — the SQL mirror of _augment_near_dups +
    band_signatures_vectorized + the (band, sig) equi-join."""
    n = bits * bands * 64
    return f"""
ebase AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings),
aug AS (
  SELECT vec_id, d, x FROM ebase
  UNION ALL
  SELECT vec_id + 100000, d, x + ((vec_id * 31 + d * 17) % 7 - 3) * 0.01
  FROM ebase WHERE vec_id % 5 = 0),
planes AS (
  SELECT CAST(i // 64 AS INT) AS p, CAST(i % 64 AS INT) AS d,
         CAST(s2 - 1073741824 AS DOUBLE) / 1073741824 AS wt
  FROM (
    SELECT i,
           (1103515245 * ((1103515245 * (i + 12345) + 12345) % 2147483648) + 12345)
             % 2147483648 AS s2
    FROM (SELECT unnest(generate_series(0, {n - 1})) AS i) t) s),
dots AS (
  SELECT a.vec_id, p.p, SUM(a.x * p.wt) AS dot
  FROM aug a JOIN planes p ON a.d = p.d GROUP BY a.vec_id, p.p),
sigs AS (
  SELECT vec_id, p // {bits} AS band,
         CAST(SUM(CASE WHEN dot > 0 THEN 1 << (p % {bits}) ELSE 0 END) AS INT) AS sig
  FROM dots GROUP BY vec_id, p // {bits}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id),
pelems AS (
  SELECT cand.id_a, cand.id_b, ea.x AS x, eb.x AS y
  FROM cand JOIN aug ea ON ea.vec_id = cand.id_a
            JOIN aug eb ON eb.vec_id = cand.id_b AND eb.d = ea.d)
"""


NEAR_PAIRS_T08_ORACLE = f"""
WITH {_deep_banding_ctes(12, 48)}
SELECT id_a, id_b,
       ROUND(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) AS cos
FROM pelems GROUP BY id_a, id_b
HAVING ROUND(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) >= 0.8
ORDER BY id_a, id_b
"""


@register("embedding_near_pairs_t08", NEAR_PAIRS_T08_ORACLE)
def embedding_near_pairs_t08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-pair mining at the realistic near-dup operating point
    (cos >= 0.8): banding_for_threshold auto-selects the deep (12, 48)
    banding — per-pair candidate probability 1-(1-p^12)^48 with p the
    per-bit agreement, i.e. ~1.2% random collision mass vs ~1.0 recall
    for planted cos-0.987 near-dups (regime math at
    operators/similarity.py:59).  This is the scale-safe configuration;
    embedding_near_pairs (t=0.35, (4,16)) remains the documented
    small-corpus baseline."""
    e = load(spark, sf_dir, "embeddings")
    return near_pairs_lsh(_augment_near_dups(e), 0.8).orderBy("id_a", "id_b")


SEMANTIC_DEDUP_T08_ORACLE = f"""
WITH {_deep_banding_ctes(12, 48)},
dropped AS (
  SELECT DISTINCT id_b FROM pelems GROUP BY id_a, id_b
  HAVING ROUND(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) >= 0.8),
corpus AS (
  SELECT vec_id, label FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, label FROM embeddings WHERE vec_id % 5 = 0)
SELECT c.vec_id, c.label FROM corpus c
WHERE c.vec_id NOT IN (SELECT id_b FROM dropped)
ORDER BY c.vec_id
"""


@register("semantic_dedup_t08", SEMANTIC_DEDUP_T08_ORACLE)
def semantic_dedup_t08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup at the near-dup operating point (cos >= 0.8, deep (12,48)
    banding): planted near-duplicate copies are dropped (their lower-id
    originals survive), everything else is kept.  The oracle regenerates
    the LCG planes and replicates banding, verify, and the anti-join."""
    e = load(spark, sf_dir, "embeddings")
    return semantic_dedup(_augment_near_dups(e), 0.8).select("vec_id", "label").orderBy("vec_id")


_N_PROBE_BITS = 8  # multi-probe width for embedding_lsh_topk (= NUM_PLANES)


def _planes_values_sql() -> str:
    rows = []
    for b, plane in enumerate(HYPERPLANES):
        for d, w in enumerate(plane):
            rows.append(f"({b},{d},{w!r})")
    return ", ".join(rows)


LSH_TOPK_ORACLE = f"""
WITH planes(b, d, wt) AS (VALUES {_planes_values_sql()}),
e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings),
dots AS (
  SELECT e.vec_id, p.b, SUM(e.x * p.wt) AS dot
  FROM e JOIN planes p ON e.d = p.d GROUP BY e.vec_id, p.b),
buckets AS (
  SELECT vec_id, CAST(SUM(CASE WHEN dot > 0 THEN 1 << b ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id),
probes AS (
  -- multi-probe: the exact bucket plus every Hamming-distance-1 bucket
  SELECT vec_id, bucket FROM buckets WHERE vec_id < 20
  UNION ALL
  SELECT b.vec_id, xor(b.bucket, CAST(1 << p.p AS BIGINT))
  FROM buckets b CROSS JOIN (SELECT unnest(generate_series(0, {_N_PROBE_BITS} - 1)) AS p) p
  WHERE b.vec_id < 20),
cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM probes q JOIN buckets c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id),
elems AS (
  SELECT cand.query_id, cand.neighbor_id,
         CAST(unnest(a.embedding) AS DOUBLE) AS x, CAST(unnest(b.embedding) AS DOUBLE) AS y
  FROM cand JOIN embeddings a ON a.vec_id = cand.query_id
            JOIN embeddings b ON b.vec_id = cand.neighbor_id),
cos AS (
  SELECT query_id, neighbor_id,
         ROUND(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) AS cos
  FROM elems GROUP BY query_id, neighbor_id)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT query_id, neighbor_id, cos,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
  FROM cos) t
WHERE rank <= 3
ORDER BY query_id, rank
"""


@register("embedding_lsh_topk", LSH_TOPK_ORACLE)
def embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    return (
        lsh_topk(e, q, 3, probe_bits=_N_PROBE_BITS)
        .select("query_id", "neighbor_id", "cos", F.col("rank").cast("int").alias("rank"))
        .orderBy("query_id", "rank")
    )


def _ivf_oracle(n_clusters: int = 8, n_probe: int = 2, iters: int = 5, k: int = 5) -> str:
    """Unrolled Lloyd's k-means + IVF probe as DuckDB SQL.

    Replicates operators/similarity.py ``ivf_topk`` bit-for-bit:
    - init = first ``n_clusters`` vectors by id;
    - assignment = argmax dot product, ties to the smallest cluster id
      (Spark: first index of array_max); dots are sequential left-folds in
      both engines (Spark ``F.aggregate``; DuckDB ``list_inner_product`` —
      verified bit-identical);
    - centroid update = decimal(30,8)-exact coordinate sums divided as
      IEEE doubles (empty clusters keep the previous centroid);
    - probes = top ``n_probe`` centroids by dot, ties to the LARGER
      cluster id (Spark sorts (dot, c) structs ascending then reverses);
    - final scoring = cosine rounded to 6 decimals, row_number ties by
      neighbor id.
    """
    parts = [
        f"""WITH earr AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings),
init AS (
  SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS c
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {n_clusters}) t),
carr0 AS (
  SELECT i.c, ea.v AS cv FROM init i JOIN earr ea ON ea.vec_id = i.vec_id)"""
    ]
    for t in range(iters):
        parts.append(
            f""",
a{t} AS (
  SELECT ea.vec_id, c.c, list_inner_product(ea.v, c.cv) AS dot
  FROM earr ea CROSS JOIN carr{t} c),
b{t} AS (
  SELECT vec_id, c FROM (
    SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS rn
    FROM a{t}) t WHERE rn = 1),
m{t} AS (
  SELECT b.c, e.d, CAST(CAST(SUM(CAST(e.x AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS val
  FROM b{t} b JOIN e ON e.vec_id = b.vec_id GROUP BY b.c, e.d),
carr{t + 1} AS (
  SELECT p.c, COALESCE(n.cv, p.cv) AS cv
  FROM carr{t} p LEFT JOIN (
    SELECT c, list(val ORDER BY d) AS cv FROM m{t} GROUP BY c) n ON n.c = p.c)"""
        )
    parts.append(
        f""",
final_assign AS (
  SELECT vec_id, c FROM (
    SELECT ea.vec_id, c.c,
           ROW_NUMBER() OVER (PARTITION BY ea.vec_id
                              ORDER BY list_inner_product(ea.v, c.cv) DESC, c.c) AS rn
    FROM earr ea CROSS JOIN carr{iters} c) t WHERE rn = 1),
cells AS (
  SELECT query_id, c FROM (
    SELECT ea.vec_id AS query_id, c.c,
           ROW_NUMBER() OVER (PARTITION BY ea.vec_id
                              ORDER BY list_inner_product(ea.v, c.cv) DESC, c.c DESC) AS rn
    FROM earr ea CROSS JOIN carr{iters} c WHERE ea.vec_id < 20) t WHERE rn <= {n_probe}),
cand AS (
  SELECT cells.query_id, fa.vec_id AS neighbor_id
  FROM cells JOIN final_assign fa ON fa.c = cells.c
  WHERE fa.vec_id <> cells.query_id),
elems AS (
  SELECT cand.query_id, cand.neighbor_id,
         CAST(unnest(a.embedding) AS DOUBLE) AS x, CAST(unnest(b.embedding) AS DOUBLE) AS y
  FROM cand JOIN embeddings a ON a.vec_id = cand.query_id
            JOIN embeddings b ON b.vec_id = cand.neighbor_id),
cos AS (
  SELECT query_id, neighbor_id,
         ROUND(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) AS cos
  FROM elems GROUP BY query_id, neighbor_id)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT query_id, neighbor_id, cos,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
  FROM cos) t
WHERE rank <= {k}
ORDER BY query_id, rank"""
    )
    return "".join(parts)


@register("embedding_ivf_topk", _ivf_oracle())
def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (k-means coarse quantizer + n_probe cells).

    Oracle-checked: the quantizer is deterministic (fixed init, fixed
    iteration count, decimal-exact centroid means, sequential-fold dots),
    so the DuckDB oracle unrolls the same 5 Lloyd iterations and must
    reproduce the exact same cells, candidates, and ranking.  Recall vs
    the brute-force baseline is additionally asserted in
    tests/test_operators.py."""
    from incubator_flink_spark.operators.similarity import ivf_topk

    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    return (
        ivf_topk(e, q, 5, n_clusters=8, n_probe=2)
        .select("query_id", "neighbor_id", "cos", F.col("rank").cast("int").alias("rank"))
        .orderBy("query_id", "rank")
    )


DOC_EMBEDDING_JOIN_ORACLE = """
SELECT e.label,
       COUNT(*) AS n_docs,
       CAST(CAST(SUM(CAST(d.n_chars AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS total_chars,
       CAST(CAST(CAST(SUM(CAST(d.n_chars AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS DOUBLE) / COUNT(d.n_chars) AS avg_chars,
       array_to_string(list_sort(list(DISTINCT d.lang)), ',') AS langs
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
GROUP BY e.label
ORDER BY e.label
"""


@register("doc_embedding_join", DOC_EMBEDDING_JOIN_ORACLE)
def doc_embedding_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modality join: text metadata x embedding cluster label (the
    documents/embeddings tables share the id space) — the join shape of a
    multimodal training-data pipeline."""
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    return (
        d.join(e, d.doc_id == e.vec_id)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_chars").cast("decimal(30,8)")).cast("double").alias("total_chars"),
            (F.sum(F.col("n_chars").cast("decimal(30,8)")).cast("double") / F.count("n_chars")).alias("avg_chars"),
            F.array_join(F.array_sort(F.collect_set("lang")), ",").alias("langs"),
        )
        .orderBy("label")
    )


def _pq_oracle(m_sub: int = 8, k_cent: int = 16, iters: int = 3, shortlist: int = 50, k: int = 5) -> str:
    """Unrolled PQ training + encode + shortlist + exact re-rank as DuckDB
    SQL — replicates operators/similarity.py ``pq_rerank_topk`` exactly:
    - per-subspace init = subvectors of the first k_cent vectors by id;
    - Lloyd assignment by squared L2 expressed as dot(x,x) - 2 dot(x,c) +
      dot(c,c) (sequential folds — list_inner_product matches Spark's
      F.aggregate bit-for-bit, the IVF-proven equivalence), ties to the
      smaller code;
    - centroid update = decimal(30,8)-exact sums / count as IEEE doubles
      (empty cells keep the previous centroid);
    - PQ scores = 6-decimal-rounded cosine of query vs RECONSTRUCTED
      corpus vector, shortlist rank ties by neighbor id;
    - final = exact cosine re-rank of the shortlist."""
    sub = 64 // m_sub
    parts = [
        f"""WITH sub AS (
  SELECT vec_id, CAST(ms.m AS INT) AS m,
         list_transform(embedding[ms.m*{sub}+1 : ms.m*{sub}+{sub}], x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings, (SELECT unnest(generate_series(0, {m_sub - 1})) AS m) ms),
svals AS (
  SELECT vec_id, m, generate_subscripts(v, 1) - 1 AS d, unnest(v) AS x FROM sub),
cb0 AS (
  SELECT s.m, i.c, s.v AS cv
  FROM (SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS c
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k_cent}) t) i
  JOIN sub s ON s.vec_id = i.vec_id)"""
    ]
    for t in range(iters):
        parts.append(
            f""",
a{t} AS (
  SELECT s.vec_id, s.m, c.c,
         list_inner_product(s.v, s.v) - 2*list_inner_product(s.v, c.cv)
           + list_inner_product(c.cv, c.cv) AS dist
  FROM sub s JOIN cb{t} c ON c.m = s.m),
b{t} AS (
  SELECT vec_id, m, c FROM (
    SELECT vec_id, m, c, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, c) AS rn
    FROM a{t}) z WHERE rn = 1),
s{t} AS (
  SELECT b.m, b.c, sv.d, CAST(CAST(SUM(CAST(sv.x AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS val
  FROM b{t} b JOIN svals sv ON sv.vec_id = b.vec_id AND sv.m = b.m
  GROUP BY b.m, b.c, sv.d),
cb{t + 1} AS (
  SELECT p.m, p.c, COALESCE(n.cv, p.cv) AS cv
  FROM cb{t} p LEFT JOIN (
    SELECT m, c, list(val ORDER BY d) AS cv FROM s{t} GROUP BY m, c) n
  ON n.m = p.m AND n.c = p.c)"""
        )
    parts.append(
        f""",
af AS (
  SELECT s.vec_id, s.m, c.c,
         list_inner_product(s.v, s.v) - 2*list_inner_product(s.v, c.cv)
           + list_inner_product(c.cv, c.cv) AS dist
  FROM sub s JOIN cb{iters} c ON c.m = s.m),
bf AS (
  SELECT vec_id, m, c FROM (
    SELECT vec_id, m, c, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, c) AS rn
    FROM af) z WHERE rn = 1),
recon AS (
  SELECT b.vec_id, b.m * {sub} + generate_subscripts(c.cv, 1) - 1 AS gd, unnest(c.cv) AS y
  FROM bf b JOIN cb{iters} c ON c.m = b.m AND c.c = b.c),
qe AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS gd,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings WHERE vec_id < 20),
pqcos AS (
  SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id,
         ROUND(SUM(q.x*r.y) / (SQRT(SUM(q.x*q.x)) * SQRT(SUM(r.y*r.y))), 6) AS pcos
  FROM qe q JOIN recon r ON r.gd = q.gd AND r.vec_id <> q.vec_id
  GROUP BY 1, 2),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY pcos DESC, neighbor_id) AS rn
    FROM pqcos) z WHERE rn <= {shortlist}),
elems AS (
  SELECT s.query_id, s.neighbor_id,
         CAST(unnest(a.embedding) AS DOUBLE) AS x, CAST(unnest(b.embedding) AS DOUBLE) AS y
  FROM short s JOIN embeddings a ON a.vec_id = s.query_id
               JOIN embeddings b ON b.vec_id = s.neighbor_id),
cos AS (
  SELECT query_id, neighbor_id,
         ROUND(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) AS cos
  FROM elems GROUP BY 1, 2)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT query_id, neighbor_id, cos,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
  FROM cos) t
WHERE rank <= {k}
ORDER BY query_id, rank"""
    )
    return "".join(parts)


@register("embedding_pq_topk", _pq_oracle())
def embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011): 8 subspaces x 16
    centroids trained by deterministic distributed k-means, corpus scored
    through its quantized reconstruction, 50-deep shortlist re-ranked by
    exact cosine.  The oracle unrolls the identical training, so codes,
    shortlists, and final ranks must match exactly; recall vs brute force
    is additionally floored in tests/test_operators.py."""
    from incubator_flink_spark.operators.similarity import pq_rerank_topk

    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    return (
        pq_rerank_topk(e, q, 5, shortlist=50)
        .select("query_id", "neighbor_id", "cos", F.col("rank").cast("int").alias("rank"))
        .orderBy("query_id", "rank")
    )


def _ivfpq_oracle(
    n_clusters: int = 8,
    n_probe: int = 2,
    coarse_iters: int = 5,
    m_sub: int = 8,
    k_cent: int = 16,
    pq_iters: int = 3,
    shortlist: int = 50,
    k: int = 5,
    train_mod: int | None = None,
    train_filter: str | None = None,
) -> str:
    """Unrolled IVF coarse k-means + PQ training + cell-pruned PQ scoring
    + exact re-rank — the composed index of ``ivf_pq_topk``, replicated
    bit-for-bit by stacking the `_ivf_oracle` coarse CTEs and the
    `_pq_oracle` codebook CTEs (pq iteration CTEs prefixed p* to avoid
    name collisions) and restricting the PQ cosine to candidates from
    the probed cells.

    ``train_filter`` is a predicate template over the id column (``{v}``
    placeholder), generalizing ``train_mod`` — the incremental-ingest
    oracle trains on the base corpus only while encoding everything."""
    sub = 64 // m_sub
    if train_filter is None and train_mod:
        train_filter = f"{{v}} % {train_mod} = 0"
    tr_where = f"WHERE {train_filter.format(v='vec_id')}" if train_filter else ""
    tr_and = f"WHERE {train_filter.format(v='ea.vec_id')}" if train_filter else ""
    tr_and_s = f"WHERE {train_filter.format(v='s.vec_id')}" if train_filter else ""
    parts = [
        f"""WITH earr AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings),
init AS (
  SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS c
  FROM (SELECT vec_id FROM embeddings {tr_where} ORDER BY vec_id LIMIT {n_clusters}) t),
carr0 AS (
  SELECT i.c, ea.v AS cv FROM init i JOIN earr ea ON ea.vec_id = i.vec_id)"""
    ]
    for t in range(coarse_iters):
        parts.append(
            f""",
ka{t} AS (
  SELECT ea.vec_id, c.c, list_inner_product(ea.v, c.cv) AS dot
  FROM earr ea CROSS JOIN carr{t} c {tr_and}),
kb{t} AS (
  SELECT vec_id, c FROM (
    SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS rn
    FROM ka{t}) t WHERE rn = 1),
km{t} AS (
  SELECT b.c, e.d, CAST(CAST(SUM(CAST(e.x AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS val
  FROM kb{t} b JOIN e ON e.vec_id = b.vec_id GROUP BY b.c, e.d),
carr{t + 1} AS (
  SELECT p.c, COALESCE(n.cv, p.cv) AS cv
  FROM carr{t} p LEFT JOIN (
    SELECT c, list(val ORDER BY d) AS cv FROM km{t} GROUP BY c) n ON n.c = p.c)"""
        )
    parts.append(
        f""",
final_assign AS (
  SELECT vec_id, c FROM (
    SELECT ea.vec_id, c.c,
           ROW_NUMBER() OVER (PARTITION BY ea.vec_id
                              ORDER BY list_inner_product(ea.v, c.cv) DESC, c.c) AS rn
    FROM earr ea CROSS JOIN carr{coarse_iters} c) t WHERE rn = 1),
cells AS (
  SELECT query_id, c FROM (
    SELECT ea.vec_id AS query_id, c.c,
           ROW_NUMBER() OVER (PARTITION BY ea.vec_id
                              ORDER BY list_inner_product(ea.v, c.cv) DESC, c.c DESC) AS rn
    FROM earr ea CROSS JOIN carr{coarse_iters} c WHERE ea.vec_id < 20) t WHERE rn <= {n_probe}),
sub AS (
  SELECT vec_id, CAST(ms.m AS INT) AS m,
         list_transform(embedding[ms.m*{sub}+1 : ms.m*{sub}+{sub}], x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings, (SELECT unnest(generate_series(0, {m_sub - 1})) AS m) ms),
svals AS (
  SELECT vec_id, m, generate_subscripts(v, 1) - 1 AS d, unnest(v) AS x FROM sub),
cb0 AS (
  SELECT s.m, i.c, s.v AS cv
  FROM (SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS c
        FROM (SELECT vec_id FROM embeddings {tr_where} ORDER BY vec_id LIMIT {k_cent}) t) i
  JOIN sub s ON s.vec_id = i.vec_id)"""
    )
    for t in range(pq_iters):
        parts.append(
            f""",
pa{t} AS (
  SELECT s.vec_id, s.m, c.c,
         list_inner_product(s.v, s.v) - 2*list_inner_product(s.v, c.cv)
           + list_inner_product(c.cv, c.cv) AS dist
  FROM sub s JOIN cb{t} c ON c.m = s.m {tr_and_s}),
pb{t} AS (
  SELECT vec_id, m, c FROM (
    SELECT vec_id, m, c, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, c) AS rn
    FROM pa{t}) z WHERE rn = 1),
ps{t} AS (
  SELECT b.m, b.c, sv.d, CAST(CAST(SUM(CAST(sv.x AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS val
  FROM pb{t} b JOIN svals sv ON sv.vec_id = b.vec_id AND sv.m = b.m
  GROUP BY b.m, b.c, sv.d),
cb{t + 1} AS (
  SELECT p.m, p.c, COALESCE(n.cv, p.cv) AS cv
  FROM cb{t} p LEFT JOIN (
    SELECT m, c, list(val ORDER BY d) AS cv FROM ps{t} GROUP BY m, c) n
  ON n.m = p.m AND n.c = p.c)"""
        )
    parts.append(
        f""",
paf AS (
  SELECT s.vec_id, s.m, c.c,
         list_inner_product(s.v, s.v) - 2*list_inner_product(s.v, c.cv)
           + list_inner_product(c.cv, c.cv) AS dist
  FROM sub s JOIN cb{pq_iters} c ON c.m = s.m),
pbf AS (
  SELECT vec_id, m, c FROM (
    SELECT vec_id, m, c, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, c) AS rn
    FROM paf) z WHERE rn = 1),
recon AS (
  SELECT b.vec_id, b.m * {sub} + generate_subscripts(c.cv, 1) - 1 AS gd, unnest(c.cv) AS y
  FROM pbf b JOIN cb{pq_iters} c ON c.m = b.m AND c.c = b.c),
qe AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS gd,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings WHERE vec_id < 20),
cand AS (
  SELECT cells.query_id, fa.vec_id AS neighbor_id
  FROM cells JOIN final_assign fa ON fa.c = cells.c
  WHERE fa.vec_id <> cells.query_id),
pqc AS (
  SELECT cd.query_id, cd.neighbor_id,
         ROUND(SUM(q.x*r.y) / (SQRT(SUM(q.x*q.x)) * SQRT(SUM(r.y*r.y))), 6) AS pcos
  FROM cand cd
  JOIN qe q ON q.vec_id = cd.query_id
  JOIN recon r ON r.vec_id = cd.neighbor_id AND r.gd = q.gd
  GROUP BY 1, 2),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY pcos DESC, neighbor_id) AS rn
    FROM pqc) z WHERE rn <= {shortlist}),
elems AS (
  SELECT s.query_id, s.neighbor_id,
         CAST(unnest(a.embedding) AS DOUBLE) AS x, CAST(unnest(b.embedding) AS DOUBLE) AS y
  FROM short s JOIN embeddings a ON a.vec_id = s.query_id
               JOIN embeddings b ON b.vec_id = s.neighbor_id),
cosf AS (
  SELECT query_id, neighbor_id,
         ROUND(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) AS cos
  FROM elems GROUP BY 1, 2)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT query_id, neighbor_id, cos,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
  FROM cosf) t
WHERE rank <= {k}
ORDER BY query_id, rank"""
    )
    return "".join(parts)


@register("embedding_ivfpq_topk", _ivfpq_oracle(train_mod=4))
def embedding_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN — the composed FAISS-style index: coarse cells prune
    the corpus, PQ codes score the survivors, exact cosine re-ranks the
    shortlist.  Both trainings are deterministic, so the oracle unrolls
    the identical coarse + codebook k-means and must reproduce cells,
    codes, shortlists, and final ranks exactly; recall vs brute force is
    floored in tests/test_operators.py."""
    from incubator_flink_spark.operators.similarity import ivf_pq_topk

    from incubator_flink_spark.bench_knobs import knob

    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    # bench fast path: fewer quantizer-training rounds (same plan shape)
    return (
        ivf_pq_topk(e, q, 5, n_clusters=8, n_probe=2, shortlist=50, train_mod=4,
                    coarse_iters=knob(5, 2), pq_iters=knob(3, 1))
        .select("query_id", "neighbor_id", "cos", F.col("rank").cast("int").alias("rank"))
        .orderBy("query_id", "rank")
    )


@register(
    "embedding_ivfpq_ingest",
    _ivfpq_oracle(train_filter="({v} % 5 <> 4) AND ({v} % 4 = 0)"),
)
def embedding_ivfpq_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental vector-store ingest: the IVF-PQ quantizers are
    trained on the BASE corpus only (vec_id % 5 <> 4, then the usual
    train_mod sampling), the base is encoded, and the held-out 20%
    batch is encoded against the FROZEN index (``ivfpq_encode_batch`` —
    no retraining, pure map-side) and appended to the inverted file.
    Search runs over the appended file with exact re-rank on old∪new.

    The oracle builds the index the FRESH way — train on base, encode
    the whole union in one pass — so an exact match proves the
    append-then-search path is bit-identical to rebuilding on the
    union under the same quantizers: the correctness contract of
    streaming ANN ingest (mirrors the growing-reference dedup
    discipline of streaming/sinks.py)."""
    from incubator_flink_spark.operators.similarity import (
        ivfpq_encode_batch,
        ivfpq_search,
        kmeans_centroids,
        pq_codebooks,
    )

    from incubator_flink_spark.bench_knobs import knob

    e = load(spark, sf_dir, "embeddings")
    base = e.where(F.col("vec_id") % 5 != 4)
    batch = e.where(F.col("vec_id") % 5 == 4)
    train = base.where(F.col("vec_id") % 4 == 0)
    # bench fast path: fewer training rounds (same plan shape; the
    # append==rebuild contract is scale-invariant in the round count)
    centroids = kmeans_centroids(train, 8, iters=knob(5, 2))
    cbs = pq_codebooks(train, iters=knob(3, 1))
    encoded = ivfpq_encode_batch(base, centroids, cbs).unionAll(
        ivfpq_encode_batch(batch, centroids, cbs)
    )
    q = e.where(F.col("vec_id") < 20)
    return (
        ivfpq_search(encoded, e, q, centroids, 5, n_probe=2, shortlist=50)
        .select("query_id", "neighbor_id", "cos", F.col("rank").cast("int").alias("rank"))
        .orderBy("query_id", "rank")
    )


# --- label-centroid similarity matrix ----------------------------------------

LABEL_CENTROID_ORACLE = """
WITH e AS (
  SELECT label, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings),
cent AS (
  SELECT label, d, CAST(CAST(SUM(CAST(x AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS v
  FROM e GROUP BY label, d)
SELECT a.label AS label_a, b.label AS label_b,
       ROUND(CAST(CAST(SUM(CAST(a.v * b.v AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE)
             / (SQRT(CAST(CAST(SUM(CAST(a.v * a.v AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE))
                * SQRT(CAST(CAST(SUM(CAST(b.v * b.v AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE))), 6) AS cos
FROM cent a JOIN cent b ON a.d = b.d AND a.label < b.label
GROUP BY a.label, b.label
ORDER BY label_a, label_b
"""


@register("label_centroid_similarity", LABEL_CENTROID_ORACLE)
def label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representation analysis: per-label centroid embeddings
    (decimal-exact means — the k-means discipline) and the pairwise
    cosine matrix between them — the collapse/duplication audit run on
    learned label or cluster spaces.  One corpus-sized (label, dim)
    aggregate; everything after runs on the |labels| x dim table."""
    e = load(spark, sf_dir, "embeddings")
    el = spread(e).select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("d", "x")
    )
    cent = el.groupBy("label", "d").agg(
        (F.sum(F.col("x").cast("decimal(30,8)")).cast("double") / F.count(F.lit(1))).alias("v")
    )
    a = cent.select(F.col("label").alias("label_a"), "d", F.col("v").alias("va"))
    b = cent.select(F.col("label").alias("label_b"), F.col("d").alias("d2"), F.col("v").alias("vb"))
    j = a.join(b, (F.col("d") == F.col("d2")) & (F.col("label_a") < F.col("label_b")))
    return (
        j.groupBy("label_a", "label_b")
        .agg(
            F.round(
                F.sum((F.col("va") * F.col("vb")).cast("decimal(30,12)")).cast("double")
                / (
                    F.sqrt(F.sum((F.col("va") * F.col("va")).cast("decimal(30,12)")).cast("double"))
                    * F.sqrt(F.sum((F.col("vb") * F.col("vb")).cast("decimal(30,12)")).cast("double"))
                ),
                6,
            ).alias("cos")
        )
        .orderBy("label_a", "label_b")
    )


# --- margin-based bitext mining (Artetxe & Schwenk 2019) ----------------------
# Two label groups stand in for the two languages; the ratio margin
# normalizes each candidate cosine by the mean of both sides' k-nearest
# cosines, demoting hub vectors that are near everything.

_BITEXT_K = 4

BITEXT_MARGIN_ORACLE = f"""
WITH s AS (SELECT vec_id, embedding FROM embeddings WHERE label = 0),
t AS (SELECT vec_id, embedding FROM embeddings WHERE label = 1),
pairs AS (
  SELECT s.vec_id AS src_id, t.vec_id AS tgt_id, s.embedding AS se, t.embedding AS te
  FROM s, t),
elems AS (
  SELECT src_id, tgt_id,
         CAST(unnest(se) AS DOUBLE) AS x, CAST(unnest(te) AS DOUBLE) AS y
  FROM pairs),
cos AS (
  SELECT src_id, tgt_id,
         ROUND(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) AS cos
  FROM elems GROUP BY 1, 2),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY src_id ORDER BY cos DESC, tgt_id) AS rs,
         ROW_NUMBER() OVER (PARTITION BY tgt_id ORDER BY cos DESC, src_id) AS rt
  FROM cos),
sstats AS (
  SELECT src_id, COUNT(*) AS n_s,
         CAST(SUM(CAST(cos AS DECIMAL(18,6))) AS DECIMAL(30,6)) AS sum_s
  FROM ranked WHERE rs <= {_BITEXT_K} GROUP BY src_id),
tstats AS (
  SELECT tgt_id, COUNT(*) AS n_t,
         CAST(SUM(CAST(cos AS DECIMAL(18,6))) AS DECIMAL(30,6)) AS sum_t
  FROM ranked WHERE rt <= {_BITEXT_K} GROUP BY tgt_id),
m AS (
  SELECT c.src_id, c.tgt_id, c.cos,
         ROUND(((ss.n_s + ts.n_t) * c.cos)
               / CAST(CAST(ss.sum_s + ts.sum_t AS VARCHAR) AS DOUBLE), 6) AS margin
  FROM cos c JOIN sstats ss USING (src_id) JOIN tstats ts USING (tgt_id))
SELECT src_id, tgt_id, cos, margin FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS rn
  FROM m) z
WHERE rn = 1 ORDER BY src_id
"""


@register("bitext_margin_mining", BITEXT_MARGIN_ORACLE)
def bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based parallel-pair mining between two embedding groups
    (label 0 = source side, label 1 = target side): best target per
    source by the Artetxe & Schwenk ratio margin.  See
    operators/similarity.margin_mining for the scale shape (probe form
    broadcasts the source side; at 100 TB both k-NN sets come from the
    IVF-PQ shortlists)."""
    from incubator_flink_spark.operators.similarity import margin_mining

    e = load(spark, sf_dir, "embeddings")
    src = e.where(F.col("label") == 0)
    tgt = e.where(F.col("label") == 1)
    return margin_mining(src, tgt, k=_BITEXT_K).orderBy("src_id")


# --- leading principal component (distributed power iteration) -----------------

_PC_ROUNDS = 8


def _power_iteration_sql(rounds: int) -> str:
    """Unroll the power iteration as chained CTEs computing the identical
    arithmetic: per-row list_inner_product dots (bit-identical to the
    engine's F.aggregate sequential fold), exact decimal(38,12)
    coordinate sums routed to double through VARCHAR, and a fixed-order
    list_inner_product(l, l) norm fold."""
    parts = ["v0 AS (SELECT [CAST(0.125 AS DOUBLE) FOR x IN range(64)] AS v)"]
    for t in range(1, rounds + 1):
        parts.append(f"""s{t} AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         list_inner_product(CAST(embedding AS DOUBLE[]), (SELECT v FROM v{t - 1})) AS s
  FROM embeddings)""")
        parts.append(f"""u{t} AS MATERIALIZED (
  SELECT g.j, CAST(CAST(SUM(CAST(s.s * s.e[g.j] AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS u
  FROM s{t} s, unnest(generate_series(1, 64)) AS g(j) GROUP BY g.j)""")
        parts.append(f"""v{t} AS (
  SELECT LIST(u / sqrt((SELECT list_inner_product(LIST(u ORDER BY j), LIST(u ORDER BY j)) FROM u{t})) ORDER BY j) AS v
  FROM u{t})""")
    return ",\n".join(parts)


TOP_PC_ORACLE = f"""
WITH {_power_iteration_sql(_PC_ROUNDS)},
proj AS (
  SELECT vec_id, label,
         ROUND(list_inner_product(CAST(embedding AS DOUBLE[]), (SELECT v FROM v{_PC_ROUNDS})), 6) AS proj
  FROM embeddings)
SELECT vec_id, label, proj
FROM proj ORDER BY abs(proj) DESC, vec_id LIMIT 20
"""


@register("embedding_top_pc", TOP_PC_ORACLE)
def embedding_top_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus spectral diagnostic: the 20 most extreme vectors along the
    leading principal direction of the embedding second-moment matrix —
    the dominant-axis outliers embedding-whitening / anisotropy reports
    surface.  Power iteration never materializes the DIM^2 covariance:
    each of the {_PC_ROUNDS} rounds is one narrow map pass + a DIM-group
    exact-decimal aggregate, with only DIM coefficients reaching the
    driver; the oracle unrolls the identical rounds and matches
    bit-for-bit."""
    from incubator_flink_spark.operators.similarity import (
        _dot,
        _lit_vec,
        power_iteration_top_pc,
    )

    e = spread(load(spark, sf_dir, "embeddings"))
    v = power_iteration_top_pc(e, rounds=_PC_ROUNDS)
    proj = F.round(_dot(F.col("embedding"), _lit_vec(v)), 6)
    return (
        e.select("vec_id", "label", proj.alias("proj"))
        .orderBy(F.abs(F.col("proj")).desc(), "vec_id")
        .limit(20)
    )


# --- all-but-the-top postprocessing stats (Mu & Viswanath 2018) ----------------

_ABTT_ROUNDS = 6


def _abtt_sql(rounds: int) -> str:
    """Unrolled centered power iteration + per-label variance stats —
    identical arithmetic to operators/similarity.power_iteration_centered
    (means and the <mu, v> correction are folded in algebraically, the
    corpus is never centered in place)."""
    parts = [
        """m AS MATERIALIZED (
  SELECT g.j, CAST(CAST(SUM(CAST(CAST(e.embedding[g.j] AS DOUBLE) AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS mu
  FROM embeddings e, unnest(generate_series(1, 64)) AS g(j) GROUP BY g.j)""",
        "ml AS (SELECT LIST(mu ORDER BY j) AS l FROM m)",
        "mm AS (SELECT list_inner_product(l, l) AS mumu FROM ml)",
        "v0 AS (SELECT [CAST(0.125 AS DOUBLE) FOR x IN range(64)] AS v)",
    ]
    for t in range(1, rounds + 1):
        parts.append(f"""s{t} AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         list_inner_product(CAST(embedding AS DOUBLE[]), (SELECT v FROM v{t - 1}))
           - list_inner_product((SELECT l FROM ml), (SELECT v FROM v{t - 1})) AS s
  FROM embeddings)""")
        parts.append(f"""u{t} AS MATERIALIZED (
  SELECT g.j,
         CAST(CAST(SUM(CAST(s.s * s.e[g.j] AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE)
           - (SELECT mu FROM m WHERE m.j = g.j)
             * (SELECT CAST(CAST(SUM(CAST(s2.s AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) FROM s{t} s2) AS u
  FROM s{t} s, unnest(generate_series(1, 64)) AS g(j) GROUP BY g.j)""")
        parts.append(f"""v{t} AS (
  SELECT LIST(u / sqrt((SELECT list_inner_product(LIST(u ORDER BY j), LIST(u ORDER BY j)) FROM u{t})) ORDER BY j) AS v
  FROM u{t})""")
    parts.append(f"""fin AS (
  SELECT label,
         list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))
           - 2 * list_inner_product(CAST(embedding AS DOUBLE[]), (SELECT l FROM ml))
           + (SELECT mumu FROM mm) AS before,
         list_inner_product(CAST(embedding AS DOUBLE[]), (SELECT v FROM v{rounds}))
           - list_inner_product((SELECT l FROM ml), (SELECT v FROM v{rounds})) AS sp
  FROM embeddings)""")
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT label, COUNT(*) AS n,
       ROUND(CAST(CAST(SUM(CAST(before AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) / COUNT(*), 6) AS var_before,
       ROUND(CAST(CAST(SUM(CAST(before - sp*sp AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) / COUNT(*), 6) AS var_after
FROM fin GROUP BY label ORDER BY label"""
    )


ABTT_ORACLE = _abtt_sql(_ABTT_ROUNDS)


@register("embedding_abtt_stats", ABTT_ORACLE)
def embedding_abtt_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-but-the-top (public: Mu & Viswanath, ICLR 2018): remove the
    mean and the top principal direction from every embedding — the
    standard anisotropy fix before cosine retrieval — and report the
    per-label mean squared norm before/after (the variance the dominant
    axis carried).  Per-row quantities decompose into sequential-fold
    dots against literal mu/v (||x-mu||^2 = <x,x> - 2<x,mu> + <mu,mu>),
    so the corpus is never rewritten and the full pass is map-only +
    one label-grain exact-decimal aggregate; the oracle unrolls the
    identical centered power iteration bit-for-bit."""
    from incubator_flink_spark.operators.similarity import (
        _dot,
        _lit_vec,
        power_iteration_centered,
    )

    e = spread(load(spark, sf_dir, "embeddings"))
    mu, v = power_iteration_centered(e, rounds=_ABTT_ROUNDS)

    def fold_dot(a: list[float], b: list[float]) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    mumu, muv = fold_dot(mu, mu), fold_dot(mu, v)
    dec = "decimal(38,12)"
    xx = _dot(F.col("embedding"), F.col("embedding"))
    xmu = _dot(F.col("embedding"), _lit_vec(mu))
    xv = _dot(F.col("embedding"), _lit_vec(v))
    before = xx - 2 * xmu + F.lit(mumu)
    sp = xv - F.lit(muv)
    return (
        e.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(before.cast(dec)).cast("double") / F.count(F.lit(1)), 6).alias(
                "var_before"
            ),
            F.round(
                F.sum((before - sp * sp).cast(dec)).cast("double") / F.count(F.lit(1)), 6
            ).alias("var_after"),
        )
        .orderBy("label")
    )


# --- two-component spectral map (deflation) ------------------------------------


def _pc_phase_sql(prefix: str, rounds: int, start_cte: str, deflate_by: str | None = None) -> list[str]:
    """One unrolled power-iteration phase; with ``deflate_by`` each round
    projects the named unit vector out of u before normalizing (the
    deflation that yields the SECOND eigenvector)."""
    parts: list[str] = []
    for t in range(1, rounds + 1):
        prev = f"{prefix}v{t - 1}" if t > 1 else start_cte
        parts.append(f"""{prefix}s{t} AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         list_inner_product(CAST(embedding AS DOUBLE[]), (SELECT v FROM {prev})) AS s
  FROM embeddings)""")
        parts.append(f"""{prefix}u{t} AS MATERIALIZED (
  SELECT g.j, CAST(CAST(SUM(CAST(s.s * s.e[g.j] AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS u
  FROM {prefix}s{t} s, unnest(generate_series(1, 64)) AS g(j) GROUP BY g.j)""")
        src = f"{prefix}u{t}"
        if deflate_by is not None:
            parts.append(f"""{prefix}d{t} AS MATERIALIZED (
  SELECT u.j, u.u - (SELECT list_inner_product(LIST(u2.u ORDER BY u2.j), (SELECT v FROM {deflate_by})) FROM {prefix}u{t} u2)
                 * (SELECT v FROM {deflate_by})[u.j] AS u
  FROM {prefix}u{t} u)""")
            src = f"{prefix}d{t}"
        parts.append(f"""{prefix}v{t} AS (
  SELECT LIST(u / sqrt((SELECT list_inner_product(LIST(u ORDER BY j), LIST(u ORDER BY j)) FROM {src})) ORDER BY j) AS v
  FROM {src})""")
    return parts


def _top2_sql(rounds: int) -> str:
    parts = ["z0 AS (SELECT [CAST(0.125 AS DOUBLE) FOR x IN range(64)] AS v)"]
    parts += _pc_phase_sql("a", rounds, "z0")
    parts += _pc_phase_sql("b", rounds, "z0", deflate_by=f"av{rounds}")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT vec_id, label,
       ROUND(list_inner_product(CAST(embedding AS DOUBLE[]), (SELECT v FROM av{rounds})), 6) AS proj1,
       ROUND(list_inner_product(CAST(embedding AS DOUBLE[]), (SELECT v FROM bv{rounds})), 6) AS proj2
FROM embeddings
ORDER BY abs(ROUND(list_inner_product(CAST(embedding AS DOUBLE[]), (SELECT v FROM bv{rounds})), 6)) DESC, vec_id
LIMIT 20"""
    )


TOP2_PC_ORACLE = _top2_sql(_PC_ROUNDS)


@register("embedding_top2_pc", TOP2_PC_ORACLE)
def embedding_top2_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-component spectral map: the second principal direction by
    deflated power iteration (u <- u - <u, v1> v1 per round; v1 from the
    same top-PC build), reported as the 20 most extreme vectors along
    PC2 with both projections — the 2-D embedding diagnostic.  Cost is
    two power-iteration phases of narrow map passes; the oracle unrolls
    both phases and matches bit-for-bit."""
    from incubator_flink_spark.operators.similarity import (
        _dot,
        _lit_vec,
        power_iteration_deflated,
        power_iteration_top_pc,
    )

    from incubator_flink_spark.bench_knobs import knob

    e = spread(load(spark, sf_dir, "embeddings"))
    # bench fast path: fewer power-iteration rounds per phase (each round
    # is the same narrow map pass; convergence depth is not plan shape)
    v1 = power_iteration_top_pc(e, rounds=knob(_PC_ROUNDS, 3))
    v2 = power_iteration_deflated(e, v1, rounds=knob(_PC_ROUNDS, 3))
    p1 = F.round(_dot(F.col("embedding"), _lit_vec(v1)), 6)
    p2 = F.round(_dot(F.col("embedding"), _lit_vec(v2)), 6)
    return (
        e.select("vec_id", "label", p1.alias("proj1"), p2.alias("proj2"))
        .orderBy(F.abs(F.col("proj2")).desc(), "vec_id")
        .limit(20)
    )


def _semdedup_kmeans_oracle(
    t: float = 0.8, n_clusters: int = 8, iters: int = 3, train_mod: int = 4
) -> str:
    """Unrolled SemDeDup: planted-near-dup augmentation (the shared
    integer-arithmetic perturbation), coarse k-means over the augmented
    corpus (same init/assign/mean conventions as the IVF oracle:
    first-k-by-id init, dot-product argmax with ties to the smallest
    cluster, decimal-exact mean sums), within-cluster exact cosine, and
    recursive min-id connected components."""
    parts = [
        f"""WITH RECURSIVE eb AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings),
auge AS (
  SELECT vec_id, d, x FROM eb
  UNION ALL
  SELECT vec_id + 100000, d, x + ((vec_id * 31 + d * 17) % 7 - 3) * 0.01
  FROM eb WHERE vec_id % 5 = 0),
earr AS (SELECT vec_id, list(x ORDER BY d) AS v FROM auge GROUP BY vec_id),
init AS (
  SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS c
  FROM (SELECT vec_id FROM earr WHERE vec_id % {train_mod} = 0
        ORDER BY vec_id LIMIT {n_clusters}) t),
carr0 AS (SELECT i.c, e.v AS cv FROM init i JOIN earr e ON e.vec_id = i.vec_id)"""
    ]
    for r in range(iters):
        parts.append(
            f""",
ka{r} AS (
  SELECT e.vec_id, c.c, list_inner_product(e.v, c.cv) AS dot
  FROM earr e CROSS JOIN carr{r} c WHERE e.vec_id % {train_mod} = 0),
kb{r} AS (
  SELECT vec_id, c FROM (
    SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS rn
    FROM ka{r}) t WHERE rn = 1),
km{r} AS (
  SELECT b.c, a.d, CAST(CAST(SUM(CAST(a.x AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS val
  FROM kb{r} b JOIN auge a ON a.vec_id = b.vec_id GROUP BY b.c, a.d),
carr{r + 1} AS (
  SELECT p.c, COALESCE(n.cv, p.cv) AS cv
  FROM carr{r} p LEFT JOIN (
    SELECT c, list(val ORDER BY d) AS cv FROM km{r} GROUP BY c) n ON n.c = p.c)"""
        )
    parts.append(
        f""",
fa AS (
  SELECT vec_id, c FROM (
    SELECT e.vec_id, c.c,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY list_inner_product(e.v, c.cv) DESC, c.c) AS rn
    FROM earr e CROSS JOIN carr{iters} c) t WHERE rn = 1),
pairs AS (
  SELECT p.vec_id AS id_a, q.vec_id AS id_b
  FROM fa p JOIN fa q ON p.c = q.c AND p.vec_id < q.vec_id
  JOIN earr a ON a.vec_id = p.vec_id JOIN earr b ON b.vec_id = q.vec_id
  WHERE ROUND(list_inner_product(a.v, b.v)
              / (SQRT(list_inner_product(a.v, a.v)) * SQRT(list_inner_product(b.v, b.v))), 6) >= {t}),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach(u, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.u = e.v)
SELECT u AS vec_id, MIN(r) AS rep_id, CAST(u = MIN(r) AS BIGINT) AS kept
FROM reach GROUP BY u ORDER BY vec_id"""
    )
    return "".join(parts)


@register("semdedup_kmeans", _semdedup_kmeans_oracle())
def semdedup_kmeans_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup by cluster-scoped comparison (Abbas et al. 2023): k-means
    clusters the planted-near-dup corpus, exact cosine runs only within
    each cluster, connected components pick the min-id representative —
    (vec_id, rep_id, kept) for every duplicate-group member.  The
    cluster-scoped alternative to the banded-LSH ``semantic_dedup_t08``
    (comparisons Σ n_c² with k growing with corpus size, vs candidate
    buckets).  The oracle unrolls the identical k-means (init, argmax
    tie-break, decimal-exact means) and the min-id CC, so membership,
    representatives, and kept flags must match exactly."""
    from incubator_flink_spark.bench_knobs import bench_fast, knob
    from incubator_flink_spark.operators.similarity import semdedup_kmeans

    e = load(spark, sf_dir, "embeddings")
    if bench_fast():
        # bench fast path: half the corpus (train/assign/pair/CC keep
        # their plan shapes; within-cluster pair cost drops ~4x)
        e = e.where(F.col("vec_id") % 2 == 0)
    # bench fast path: one Lloyd round (same plan shape per round)
    return semdedup_kmeans(_augment_near_dups(e), 0.8, iters=knob(3, 1)).orderBy("vec_id")
