"""Similarity-search inventory (LLM-pipeline extension surface): exact
brute-force cosine top-k + random-hyperplane LSH ANN over `embeddings`."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from overturemaps_duckdb_spark.operators.similarity import (
    _plane_weight,
    cosine_topk,
    ivf_build,
    ivf_topk,
    lsh_bucket_neighbors,
    quantize_embeddings,
    seed_centroids,
    semantic_dedup,
)
from overturemaps_duckdb_spark.operators._util import materialize
from overturemaps_duckdb_spark.queries import query, t

_DOT = (
    "list_sum(list_transform(range(1, 65), "
    "i -> CAST(q.embedding[CAST(i AS INTEGER)] AS DOUBLE) * CAST(c.embedding[CAST(i AS INTEGER)] AS DOUBLE)))"
)
_NORM_Q = (
    "sqrt(list_sum(list_transform(range(1, 65), "
    "i -> CAST(q.embedding[CAST(i AS INTEGER)] AS DOUBLE) * CAST(q.embedding[CAST(i AS INTEGER)] AS DOUBLE))))"
)
_NORM_C = (
    "sqrt(list_sum(list_transform(range(1, 65), "
    "i -> CAST(c.embedding[CAST(i AS INTEGER)] AS DOUBLE) * CAST(c.embedding[CAST(i AS INTEGER)] AS DOUBLE))))"
)


@query(
    "n1_cosine_topk",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               ROUND({_DOT} / ({_NORM_Q} * {_NORM_C}), 6) AS cosine
        FROM embeddings q JOIN embeddings c ON q.vec_id < 5
    ),
    ranked AS (
        SELECT query_id, vec_id, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id) AS rank
        FROM scored
    )
    SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= 10
    """,
)
def n1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 for 5 query vectors: queries
    broadcast, corpus never shuffles, per-query heap via window row_number.
    Scores rounded to 6 dp pre-ranking (float-noise-free ordering)."""
    e = t(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk(e, queries, id_col="vec_id", vec_col="embedding", k=10)


def _bucket_sql(alias: str, n_planes: int = 8, dim: int = 64) -> str:
    """SQL twin of operators.similarity.hyperplane_signature for one row
    alias — explicit per-plane dot products with the deterministic integer
    weights (zero-weight dims skipped exactly like the Spark loop)."""
    bits = []
    for p in range(n_planes):
        terms = [
            f"CAST({alias}.embedding[{i + 1}] AS DOUBLE) * {float(w)}"
            for i, w in ((i, _plane_weight(p, i)) for i in range(dim))
            if w != 0
        ]
        dot = " + ".join(terms)
        bits.append(f"(CASE WHEN 0.0 + {dot} >= 0.0 THEN {1 << p} ELSE 0 END)")
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


@query(
    "n2_lsh_ann_pairs",
    oracle=f"""
    WITH sig AS (
        SELECT e.vec_id, e.embedding, {_bucket_sql('e')} AS bucket
        FROM embeddings e
    )
    SELECT q.vec_id AS a_id, c.vec_id AS b_id, q.bucket AS bucket,
           ROUND({_DOT} / ({_NORM_Q} * {_NORM_C}), 6) AS cosine
    FROM sig q JOIN sig c ON q.bucket = c.bucket AND q.vec_id < c.vec_id
    WHERE ROUND({_DOT} / ({_NORM_Q} * {_NORM_C}), 6) >= 0.35
    """,
)
def n2_lsh_ann_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: 8-hyperplane LSH bucket equi-join + exact verify at
    cosine ≥ 0.35 — candidate generation shuffles on an int key instead of
    the O(N²) cross product.  (0.35 chosen so the certification is
    non-vacuous on the synthetic near-orthogonal corpus: 2 pairs at
    sf0.01, 99 at sf0.1 with the r8 non-degenerate planes — the r4-era
    13/235 counts came from the 7-periodic plane family whose correlated
    buckets inflated collisions ~3×; single-bucket recall at θ≈69° is
    honestly ~p⁸≈2%, which is why production near-dup work runs the
    banded d5 form, not n2's single bucket.)"""
    e = t(spark, sf_dir, "embeddings")
    return lsh_bucket_neighbors(
        e, id_col="vec_id", vec_col="embedding", n_planes=8, dim=64, min_cosine=0.35
    )


@query(
    "qz1_embedding_quantize",
    oracle="""
    WITH s AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               coalesce(
                   list_max(list_transform(embedding,
                                           x -> abs(CAST(x AS DOUBLE))))
                   / 127.0, 0.0) AS scale
        FROM embeddings
    ), q AS (
        SELECT vec_id, v, scale,
               CASE WHEN scale > 0.0
                    THEN list_transform(v, x -> CAST(round(x / scale) AS INTEGER))
                    ELSE list_transform(v, x -> 0) END AS qv
        FROM s
    ), r AS (
        SELECT vec_id, scale, qv, len(v) AS d,
               list_transform(range(1, len(v) + 1),
                              i -> v[i] - qv[i] * scale) AS resid
        FROM q
    )
    SELECT vec_id,
           ROUND(scale, 9) AS scale_r,
           CAST(coalesce(list_sum(qv), 0) AS BIGINT) AS q_sum,
           CAST(len(list_filter(qv, x -> abs(x) = 127)) AS INTEGER) AS n_sat,
           ROUND(CASE WHEN d > 0
                      THEN list_sum(list_transform(resid, x -> x * x)) / d
                      ELSE 0.0 END, 9) AS mse_r
    FROM r
    """,
)
def qz1_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 max-abs quantization of the embedding corpus (the 4× storage
    path for embeddings at 100 TB) — per-vector scale, quantized checksum,
    saturation count, and mean squared dequantization residual.

    Everything is per-row column math (operators/similarity.
    quantize_embeddings): no shuffle, no UDF — at scale this runs at scan
    speed and writes back alongside the vectors.  The oracle restates the
    identical double-precision expressions (same left-to-right folds), so
    scale/mse match bit-for-bit before the defensive 9 dp round."""
    e = t(spark, sf_dir, "embeddings")
    return quantize_report(e, id_col="vec_id", vec_col="embedding")


def quantize_report(
    df: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """qz1's projection over :func:`quantize_embeddings` — factored so the
    NULL-vector edge parity (a NULL embedding must report q_sum 0, like the
    oracle's coalesce(list_sum(qv), 0)) is unit-testable off-fixture."""
    qz = quantize_embeddings(df, id_col=id_col, vec_col=vec_col, bits=8)
    return qz.select(
        F.col("id").alias(id_col),
        F.round("scale", 9).alias("scale_r"),
        # outer coalesce: a NULL qvec (NULL embedding row) folds to NULL in
        # Spark but the oracle's coalesce(list_sum(qv), 0) says 0 — mirror it
        F.coalesce(
            F.aggregate(
                "qvec",
                F.lit(0).cast("bigint"),
                # coalesce-skip NULL elements like DuckDB's list_sum
                lambda a, x: a
                + F.coalesce(x.cast("bigint"), F.lit(0).cast("bigint")),
            ),
            F.lit(0).cast("bigint"),
        ).alias("q_sum"),
        F.col("n_sat").cast("int").alias("n_sat"),
        F.round("mse", 9).alias("mse_r"),
    )


#: certified lower bound on MEAN recall@10 across the 5 fixture queries
#: at 4/16 probes.  Measured per-scale means: 0.66 (sf0.001), 0.80
#: (sf0.01), 0.62 (sf0.1) — the bound sits ~25-45% below every observed
#: mean.  Per-query recall is too volatile to bound (observed min 0.4 on
#: the near-orthogonal synthetic corpus); per-query VALUE parity is
#: carried by the exact-kNN checksum columns instead.
N3_RECALL_BOUND = 0.45


@query(
    "n3_ivf_ann_topk",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               ROUND({_DOT} / ({_NORM_Q} * {_NORM_C}), 6) AS cosine
        FROM embeddings q JOIN embeddings c ON q.vec_id < 5
    ),
    ranked AS (
        SELECT query_id, vec_id, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id) AS rank
        FROM scored
    )
    SELECT query_id,
           CAST(count(*) AS BIGINT) AS k_exact,
           CAST(CAST(sum(vec_id) AS HUGEINT) AS BIGINT) AS exact_id_sum,
           ROUND(sum(cosine), 6) AS exact_cos_sum,
           CAST(10 AS BIGINT) AS k_ivf,
           TRUE AS recall_ok
    FROM ranked WHERE rank <= 10 GROUP BY query_id
    """,
)
def n3_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN certification report (VERDICT r06 #2 — the a7 pattern).

    The index itself: k-means coarse quantizer (seeded, 16 lists), probe
    the 4 nearest lists per query, exact cosine within candidates
    (:func:`ivf_topk`; the persisted form is ``ivf_write`` →
    ``_list``-partitioned parquet + ``ivf_topk_from_store`` with a
    static partition filter — PartitionFilters pruning pinned in
    tests/test_similarity_ivf.py).  k-means training is iterative, so
    DuckDB cannot reproduce the IVF result — what it CAN reproduce is
    exact brute-force top-10 per query.  The registered query therefore
    emits, per query: the exact-kNN integer id checksum and rounded
    cosine sum (value parity with the oracle's brute force), the IVF
    result-set size (a full k=10 — the probed lists always hold enough
    candidates), and ``recall_ok`` = mean recall@10 of IVF vs exact
    across the queries ≥ :data:`N3_RECALL_BOUND`, which the oracle
    asserts as literal TRUE — a bounded-quality certificate, like a7's
    bounded-error band."""
    e = t(spark, sf_dir, "embeddings")
    assigned, centroids = ivf_build(
        e, id_col="vec_id", vec_col="embedding", n_lists=16, seed=42
    )
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # explicit n_lists + exact scorer: the certified path must not move
    # when the production defaults do (r10 flipped scorer to vectorized
    # and n_lists to √N auto-sizing; a7 certify-vs-production precedent)
    ivf = ivf_topk(
        assigned, centroids, queries, n_probe=4, k=10, scorer="exact"
    )
    exact = cosine_topk(
        e, queries, id_col="vec_id", vec_col="embedding", k=10
    )
    ex_agg = exact.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("k_exact"),
        F.sum("vec_id").cast("bigint").alias("exact_id_sum"),
        F.round(F.sum("cosine"), 6).alias("exact_cos_sum"),
    )
    hits = ivf.join(
        exact.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_semi"
    )
    per_q = (
        ex_agg.join(
            ivf.groupBy("query_id").agg(
                F.count(F.lit(1)).cast("bigint").alias("k_ivf")
            ),
            ["query_id"],
            "left",
        )
        .join(
            hits.groupBy("query_id").agg(
                F.count(F.lit(1)).alias("_n_hit")
            ),
            ["query_id"],
            "left",
        )
        .select(
            "query_id", "k_exact", "exact_id_sum", "exact_cos_sum",
            F.coalesce("k_ivf", F.lit(0).cast("bigint")).alias("k_ivf"),
            (
                F.coalesce("_n_hit", F.lit(0)).cast("double")
                / F.col("k_exact")
            ).alias("_recall"),
        )
    )
    # mean recall across the 5 queries as a 1-row broadcast (the
    # per-query value is too volatile to certify directly).  per_q is
    # materialized first (ADVICE r07): deriving the mean from the live
    # lineage would re-execute the whole exact-kNN cross join + IVF
    # scoring a second time for one scalar.  Note the certification
    # query pays brute-force exact kNN BY DESIGN (it is the oracle
    # anchor); ivf_topk/ivf_topk_from_store remain the production form
    # and their cost is what the bench extras measure.
    per_q = materialize(per_q)
    mean_r = per_q.agg(F.avg("_recall").alias("_mean_recall"))
    return per_q.crossJoin(F.broadcast(mean_r)).select(
        "query_id", "k_exact", "exact_id_sum", "exact_cos_sum", "k_ivf",
        (F.col("_mean_recall") >= F.lit(N3_RECALL_BOUND)).alias("recall_ok"),
    )


# ---------------------------------------------------------------------------
# sd1 — SemDeDup semantic dedup (cluster-bounded cosine pruning)
# ---------------------------------------------------------------------------

_SD_SEEDS = 8
_SD_THRESHOLD = 0.35

#: pairwise-cosine fragments over the `assigned a JOIN assigned b` aliases
#: (same shape as queries/dedup.py's _EMB_DOT family)
_SD_DOT = (
    "list_sum(list_transform(range(1, 65), "
    "i -> CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)"
    " * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)))"
)
_SD_NORM_A = (
    "sqrt(list_sum(list_transform(range(1, 65), "
    "i -> CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)"
    " * CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE))))"
)
_SD_NORM_B = (
    "sqrt(list_sum(list_transform(range(1, 65), "
    "i -> CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)"
    " * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE))))"
)
_SD_COS = f"ROUND({_SD_DOT} / ({_SD_NORM_A} * {_SD_NORM_B}), 6)"

_SD_ORACLE = f"""
WITH seeds AS (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS sidx,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS sv
    FROM embeddings WHERE vec_id < {_SD_SEEDS}
),
dist AS (
    SELECT e.vec_id, s.sidx,
           ROUND(list_sum(list_transform(range(1, 65),
               i -> (CAST(e.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      - s.sv[CAST(i AS INTEGER)])
                  * (CAST(e.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      - s.sv[CAST(i AS INTEGER)]))), 6) AS d2
    FROM embeddings e CROSS JOIN seeds s
),
assigned AS (
    SELECT d.vec_id, e.embedding, CAST(d.sidx AS INTEGER) AS cluster FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY d2, sidx) AS rn
        FROM dist) d
    JOIN embeddings e ON e.vec_id = d.vec_id
    WHERE d.rn = 1
),
pairs AS (
    SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.cluster, {_SD_COS} AS cosine
    FROM assigned a JOIN assigned b
      ON a.cluster = b.cluster AND a.vec_id < b.vec_id
    WHERE {_SD_COS} >= {_SD_THRESHOLD}
)
SELECT b_id AS vec_id, cluster, a_id AS dup_of, cosine FROM (
    SELECT *, row_number() OVER (PARTITION BY b_id ORDER BY a_id) AS rn
    FROM pairs
) WHERE rn = 1
"""


@query("sd1_semantic_dedup", oracle=_SD_ORACLE)
def sd1_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup removal report (operators/similarity.semantic_dedup —
    Abbas et al. 2023): assign every vector to its nearest of 8
    deterministic seed centroids (the 8 lowest-id vectors — the
    engine-portable stand-in for the k-means quantizer production runs
    via ivf_build), then flag row b as a semantic duplicate iff some
    same-cluster a < b has cosine ≥ 0.35 (greedy keep-first; dup_of =
    the smallest such a).  0.35 is the fixture's non-vacuous level (the
    d5 precedent): the synthetic near-orthogonal corpus has no pairs at
    the production-style 0.8.

    Scale shape: assignment is one codegen'd HOF pass (no shuffle);
    pair expansion is an equi-join on the cluster id, sum(c_k²)/2 —
    never N²; norms fold once per vector per side; the removal window
    shuffles bare ids.  ``round_d2=6`` makes the argmin
    summation-order-proof so DuckDB's list_sum and Spark's sequential
    fold cannot disagree on an assignment."""
    e = t(spark, sf_dir, "embeddings")
    seeds = seed_centroids(e, _SD_SEEDS, id_col="vec_id", vec_col="embedding")
    return semantic_dedup(
        e,
        seeds,
        id_col="vec_id",
        vec_col="embedding",
        threshold=_SD_THRESHOLD,
        round_d2=6,
    )


# ---------------------------------------------------------------------------
# pq1 — product-quantized ANN with exact re-rank (IVF-PQ read path)
# ---------------------------------------------------------------------------

#: certified lower bound on MEAN recall@10 across the 5 fixture queries for
#: the PQ(m=16, n_codes=64) ADC shortlist-50 + exact re-rank path.
#: Measured per-scale means: 1.0 (sf0.001), 1.0 (sf0.01), 0.92 (sf0.1) —
#: the bound sits ≥24% below every observed mean (the N3 pattern).
PQ1_RECALL_BOUND = 0.7


@query(
    "pq1_product_quantized_topk",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               ROUND({_DOT} / ({_NORM_Q} * {_NORM_C}), 6) AS cosine
        FROM embeddings q JOIN embeddings c ON q.vec_id < 5
    ),
    ranked AS (
        SELECT query_id, vec_id, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id) AS rank
        FROM scored
    )
    SELECT query_id,
           CAST(count(*) AS BIGINT) AS k_exact,
           CAST(CAST(sum(vec_id) AS HUGEINT) AS BIGINT) AS exact_id_sum,
           ROUND(sum(cosine), 6) AS exact_cos_sum,
           CAST(10 AS BIGINT) AS k_pq,
           TRUE AS recall_ok
    FROM ranked WHERE rank <= 10 GROUP BY query_id
    """,
)
def pq1_product_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN certification report (the n3/a7 pattern —
    k-means codebooks are iterative, so DuckDB certifies the exact-kNN
    anchor plus a bounded-quality flag).

    The index: per-subspace codebooks (operators/similarity.pq_train —
    driver-side numpy Lloyd on a deterministic md5-ordered sample, the
    FAISS convention), corpus encoded to m=16 4-bit-ish codes
    (pq_encode, Arrow kernel — 16× compression), probed by ADC as PURE
    COLUMN MATH over literal lookup tables (pq_adc_topk — the 100 TB
    plan scans only the code table, no vectors move), then the top-50
    shortlist re-ranks EXACTLY against raw vectors fetched by id
    semi-join (pq_topk_rerank).  Report per query: exact-kNN checksums
    (value parity with the oracle's brute force), the PQ result size,
    and recall_ok = mean recall@10 ≥ :data:`PQ1_RECALL_BOUND`, asserted
    literally TRUE by the oracle."""
    from overturemaps_duckdb_spark.operators.similarity import (
        pq_encode,
        pq_topk_rerank,
        pq_train,
    )

    e = t(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    books = pq_train(e, m=16, n_codes=64, seed=42)
    codes = pq_encode(e, books)
    pq = pq_topk_rerank(codes, books, e, queries, k=10)
    exact = cosine_topk(e, queries, id_col="vec_id", vec_col="embedding", k=10)
    ex_agg = exact.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("k_exact"),
        F.sum("vec_id").cast("bigint").alias("exact_id_sum"),
        F.round(F.sum("cosine"), 6).alias("exact_cos_sum"),
    )
    hits = pq.join(
        exact.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_semi"
    )
    per_q = (
        ex_agg.join(
            pq.groupBy("query_id").agg(
                F.count(F.lit(1)).cast("bigint").alias("k_pq")
            ),
            ["query_id"],
            "left",
        )
        .join(
            hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("_n_hit")),
            ["query_id"],
            "left",
        )
        .select(
            "query_id", "k_exact", "exact_id_sum", "exact_cos_sum",
            F.coalesce("k_pq", F.lit(0).cast("bigint")).alias("k_pq"),
            (
                F.coalesce("_n_hit", F.lit(0)).cast("double")
                / F.col("k_exact")
            ).alias("_recall"),
        )
    )
    per_q = materialize(per_q)
    mean_r = per_q.agg(F.avg("_recall").alias("_mean_recall"))
    return per_q.crossJoin(F.broadcast(mean_r)).select(
        "query_id", "k_exact", "exact_id_sum", "exact_cos_sum", "k_pq",
        (F.col("_mean_recall") >= F.lit(PQ1_RECALL_BOUND)).alias("recall_ok"),
    )


# ---------------------------------------------------------------------------
# hn1 — hard-negative mining (contrastive training-pair curation)
# ---------------------------------------------------------------------------


@query(
    "hn1_hard_negatives",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, q.label AS query_label,
               c.vec_id AS vec_id, c.label AS neg_label,
               ROUND({_DOT} / ({_NORM_Q} * {_NORM_C}), 6) AS cosine
        FROM embeddings q JOIN embeddings c
          ON q.vec_id < 5 AND c.label <> q.label
    ),
    ranked AS (
        SELECT query_id, vec_id, neg_label, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id) AS rank
        FROM scored
    )
    SELECT query_id, vec_id, neg_label, cosine, rank
    FROM ranked WHERE rank <= 10
    """,
)
def hn1_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive/embedding-model training
    data: per anchor, the top-10 most similar vectors with a DIFFERENT
    label — the negatives that actually move a contrastive loss
    (random negatives are trivially separable).  Composes the n1
    brute-force scorer with the label anti-predicate pushed INTO the
    join condition, so excluded candidates never score; the scale path
    swaps the scorer for the IVF/PQ probes unchanged (the predicate
    rides the candidate join either way).  NULL-labeled candidates drop
    on both engines (`<>` is NULL-rejecting)."""
    e = t(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        "embedding",
    )
    from overturemaps_duckdb_spark.operators.similarity import (
        dot_expr,
        norm_expr,
    )

    q = queries.select(
        "query_id", "query_label",
        F.col("embedding").alias("q_vec"),
        norm_expr(F.col("embedding")).alias("_nq"),
    )
    c = e.select(
        F.col("vec_id"),
        F.col("label").alias("neg_label"),
        F.col("embedding").alias("c_vec"),
        norm_expr(F.col("embedding")).alias("_nc"),
    )
    scored = c.join(
        F.broadcast(q), F.col("neg_label") != F.col("query_label")
    ).select(
        "query_id", "vec_id", "neg_label",
        F.round(
            dot_expr(F.col("q_vec"), F.col("c_vec"))
            / (F.col("_nq") * F.col("_nc")),
            6,
        ).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= 10
    )


@query(
    "emb1_label_centroids",
    oracle="""
    WITH clean AS (
        SELECT label, embedding FROM embeddings
        WHERE embedding IS NOT NULL AND len(embedding) = 64
          AND len(list_filter(embedding, x -> x IS NULL)) = 0
    ),
    inst AS (
        SELECT label, CAST(i.i AS BIGINT) AS idx,
               CAST(floor(CAST(embedding[CAST(i.i AS INTEGER)] AS DOUBLE)
                          * 1e6 + 0.5) AS BIGINT) AS m
        FROM clean, range(1, 65) i(i)
    ),
    sums AS (
        SELECT label, idx,
               CAST(SUM(m) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM inst GROUP BY label, idx
    ),
    comp AS (
        SELECT label, idx, n,
               CAST(CASE WHEN s < 0 THEN -((2 * (-s) + n) // (2 * n))
                    ELSE (2 * s + n) // (2 * n) END AS BIGINT) AS c_micro
        FROM sums
    )
    SELECT label, max(n) AS n_vectors,
           string_agg(CAST(c_micro AS VARCHAR), ' ' ORDER BY idx)
               AS centroid_micro
    FROM comp GROUP BY label
    """,
)
def emb1_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (operators/similarity.groupwise_centroids)
    — the domain/label centroid table for drift monitoring and mixture
    routing.  Bit-identical by construction: floor(x·1e6+0.5) integer
    micro-units (no ROUND — its decimal tie-break diverges cross-engine),
    bigint sums, sign-split truncating integer mean (Spark div truncates,
    DuckDB // floors; they agree only on non-negatives).

    The registered form serializes the centroid as a space-joined string
    of its integer micro-unit components (``centroid_micro``): the driver
    canonicalizes results with pandas ``sort_values``, which raises
    ``unhashable type: 'list'`` on any top-level array column
    (CORRECTNESS_r11 emb1 failure) — and an integer string is the only
    cross-engine-stable text form anyway (double→VARCHAR formatting
    differs between engines).  The recovery ``floor(c·1e6 + 0.5)`` is
    exact: each component is c_micro/1e6 by construction, so the product
    lands within ~1e-10 of the integer — far inside the ±0.5 window.
    Library callers keep the typed ``array<double>`` via
    :func:`operators.similarity.groupwise_centroids` directly."""
    from overturemaps_duckdb_spark.operators.similarity import (
        groupwise_centroids,
    )

    e = t(spark, sf_dir, "embeddings")
    c = groupwise_centroids(e, "label", "embedding", dim=64)
    return c.select(
        "label",
        "n_vectors",
        F.concat_ws(
            " ",
            F.transform(
                "centroid",
                lambda x: F.floor(x * 1e6 + F.lit(0.5))
                .cast("bigint")
                .cast("string"),
            ),
        ).alias("centroid_micro"),
    )
