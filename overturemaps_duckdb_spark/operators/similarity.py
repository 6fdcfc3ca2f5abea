"""Similarity search over embedding columns (array<float>).

Beyond-reference surface (BASELINE.json north star): brute-force cosine
top-k as the exact baseline, plus a random-hyperplane LSH bucketing as the
approximate scale path.  Scoring is pure `F.zip_with`/`F.aggregate` column
math — JVM-side, codegen'd, no UDF.

Scale notes:
- brute force is O(Q·N) but embarrassingly parallel: queries broadcast, the
  corpus never shuffles; per-query top-k via window row_number (or
  TakeOrderedAndProject for a single query).
- the LSH variant buckets both sides on a small integer signature: the join
  becomes an equi-join on bucket id, so candidate generation is
  shuffle-on-int instead of cross-product.  Hyperplanes use deterministic
  small-integer weights so results are engine-portable (oracle-checkable).
"""

from __future__ import annotations

import contextlib

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

#: stack of active :func:`probe_cache_scope` buckets; bulk-routed
#: :func:`ivf_topk_from_store` calls register their persisted probe frame
#: with the innermost scope so exit can unpersist deterministically.
_PROBE_CACHE_SCOPES: list[list[DataFrame]] = []


@contextlib.contextmanager
def probe_cache_scope():
    """Deterministic release for bulk-probe caches (ADVICE r06).

    ``ivf_topk_from_store`` persists the probe frame when a query batch
    routes distributed (> :data:`MAX_DRIVER_PROBE_QUERIES`).  The raw
    returned handle exposes it as ``result._probe_cache``, but that
    attribute is a plain Python attribute — any subsequent
    transformation (``select``/``filter``/…) returns a NEW DataFrame
    without it, so composing callers could never reach the cache and
    release fell back to LRU.  This scope captures every probe frame
    persisted inside the ``with`` block and unpersists them all on exit::

        with probe_cache_scope():
            out = ivf_topk_from_store(spark, path, cents, huge_q)
            out.where(F.col("rank") == 1).write.parquet(dst)
        # all probe caches from the block are unpersisted here

    Scopes nest (each bulk call registers with the innermost); the
    ``_probe_cache`` attribute keeps working for raw-handle callers.
    """
    bucket: list[DataFrame] = []
    _PROBE_CACHE_SCOPES.append(bucket)
    try:
        yield bucket
    finally:
        # Pop by IDENTITY, not equality: list.remove() compares by value,
        # and two empty buckets are ==, so a nested scope whose inner
        # bucket was still empty would remove the OUTER scope's bucket
        # (ADVICE r07).  Scopes exit LIFO, so the innermost is ours.
        assert _PROBE_CACHE_SCOPES[-1] is bucket, "probe scopes must exit LIFO"
        _PROBE_CACHE_SCOPES.pop()
        for frame in bucket:
            frame.unpersist()


def dot_expr(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a sequential double fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_vectorized(a: Column, b: Column) -> Column:
    """Arrow-batched numpy cosine — the PRODUCTION scale scorer.

    The exact :func:`cosine_expr` is a higher-order-function fold, which
    Catalyst evaluates interpreted per element: profiled at the 20M
    decade it scores ~0.5M candidate rows/s/32-cores and dominates probe
    wall time (BENCH_COMPARE §r9).  This form moves the same arithmetic
    into one einsum per Arrow batch (~30-60× per-row).

    NOT bit-identical to the fold: numpy's pairwise/SIMD summation
    accumulates in a different order, so the last float bits can differ
    (≤1e-12 relative — agreement after the pipeline's 6-dp round is
    pinned in tests at BOTH 64 and 1024 dims; if embedding widths grow
    past that, RE-MEASURE the bound rather than assuming it — float
    summation-order error grows with dim).  Certified queries therefore
    keep ``cosine_expr`` explicitly (oracle-restatable, deterministic
    order — the a7 certify-vs-production precedent); since r10 this form
    IS the default on the ivf entry points.  Inputs must be
    fixed-width non-null vectors (the probe guards enforce this on the
    query side; a NULL element propagates as NaN here, not a crash)."""
    def _kernel(x, y):
        import numpy as np
        import pandas as pd

        A = np.vstack(x.to_numpy())
        B = np.vstack(y.to_numpy())
        num = np.einsum("ij,ij->i", A, B)
        den = np.sqrt(np.einsum("ij,ij->i", A, A)) * np.sqrt(
            np.einsum("ij,ij->i", B, B)
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            return pd.Series(num / den)

    # functional pandas_udf form (no type hints): under `from __future__
    # import annotations` the decorator's get_type_hints cannot resolve a
    # closure-scoped `pd.Series` annotation (UNSUPPORTED_SIGNATURE); the
    # hint-free form defaults to the scalar Series→Series eval type.
    return F.pandas_udf(_kernel, "double")(a, b)


#: scorer registry for the ivf entry points: "exact" = the deterministic
#: HOF fold the oracles restate; "vectorized" = the Arrow/numpy batch form
_SCORERS = {"exact": cosine_expr, "vectorized": cosine_vectorized}


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact brute-force cosine top-k per query.

    `queries` (small) is broadcast against the corpus; scores are rounded to
    6 dp before ranking so ordering is float-noise-free (id tiebreak).
    Returns (query_id, vec_id, cosine, rank).
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm_expr(F.col(vec_col)).alias("_nq"),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("c_vec"),
        norm_expr(F.col(vec_col)).alias("_nc"),
    )
    # norms once per vector/query, not once per (query, vector) pair —
    # identical fold order, so scores are bit-for-bit unchanged
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(
            dot_expr(F.col("q_vec"), F.col("c_vec"))
            / (F.col("_nq") * F.col("_nc")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# random-hyperplane LSH (deterministic integer planes → oracle-portable)
# ---------------------------------------------------------------------------


def _plane_weight(plane: int, dim: int) -> int:
    """Deterministic small-integer hyperplane weights in [-3, 3].

    The weights are computed HERE in Python and inlined as literals into
    both the Spark plan and the SQL oracle, so any deterministic function
    works; small integers keep the inlined literals exact in every engine.

    The mixer matters (r8 review fix): the original linear form
    ((dim*31 + plane*17 + 7) % 7) - 3 collapses mod 7 to (3·(dim+plane))
    % 7 - 3 — plane p+7 duplicated plane p exactly and every plane was
    7-periodic across dims, so the whole 32-plane banded family lived in
    a 7-dimensional subspace.  Measured on synthetic near-dups at cosine
    0.88 (8 bands × 4 planes): recall 0.86 → 0.995 with 26% FEWER
    candidate pairs — the degeneracy both missed true pairs and inflated
    bucket sizes."""
    h = (plane * 2654435761 + dim * 40503 + 12345) & 0xFFFFFFFF
    h ^= h >> 16
    return (h % 7) - 3


def hyperplane_signature(
    vec: Column, *, n_planes: int = 8, dim: int = 64, plane_offset: int = 0
) -> Column:
    """int bucket id: bit p = [Σᵢ wᵢᵖ·vᵢ ≥ 0] for deterministic planes.

    `plane_offset` selects a disjoint plane family — banded LSH uses bands
    of `n_planes` planes each at offsets 0, n, 2n, …"""
    sig = F.lit(0).cast("bigint")
    for p in range(n_planes):
        weights = [_plane_weight(plane_offset + p, i) for i in range(dim)]
        dot = F.lit(0.0)
        # Σ over non-zero weights only (≈6/7 of dims) — still pure codegen
        for i, w in enumerate(weights):
            if w != 0:
                dot = dot + F.element_at(vec, i + 1).cast("double") * float(w)
        sig = sig + F.when(dot >= 0.0, F.lit(1 << p).cast("bigint")).otherwise(F.lit(0))
    return sig


def banded_signature_frame(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    n_bands: int = 8,
    planes_per_band: int = 4,
    dim: int = 64,
) -> DataFrame:
    """(id, v, band, bucket) — one row per (vector, band): OR-amplified LSH.
    A pair is a candidate if ANY band agrees, so recall for pairs at angular
    collision probability p is 1-(1-p^r)^b instead of the single-table p^r.

    Built in two narrow steps so the expression tree stays small (an
    unrolled per-plane sum blows up Catalyst on b·r planes): (1) all b·r
    plane signs as ONE HOF over a literal weight matrix, (2) per-band bucket
    ids folded from the bit array, exploded to rows.  Pure codegen, no UDF.

    Scale knob: `planes_per_band` bounds bucket granularity (2^r buckets per
    band) — at 100 TB raise r to ~16-20 (and b with it) so per-bucket row
    counts stay small; candidate generation stays an equi-join on
    (band, bucket) either way."""
    n_planes = n_bands * planes_per_band
    weights = F.array(
        *[
            F.array(
                *[F.lit(float(_plane_weight(p, i))) for i in range(dim)]
            )
            for p in range(n_planes)
        ]
    )
    vec = F.col(vec_col)
    bits = F.transform(
        weights,
        lambda wp: F.when(
            F.aggregate(
                F.zip_with(vec, wp, lambda x, w: x.cast("double") * w),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0.0,
            F.lit(1).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint")),
    )
    with_bits = df.select(
        F.col(id_col).alias("id"), vec.alias("v"), bits.alias("_bits")
    )
    r = planes_per_band
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            F.aggregate(
                F.slice(with_bits["_bits"], b * r + 1, F.lit(r)),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc * 2 + x,
            ).alias("bucket"),
        ),
    )
    return with_bits.select(
        "id", "v", F.explode(bands).alias("bb")
    ).select("id", "v", "bb.band", "bb.bucket")


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + probed search
# ---------------------------------------------------------------------------


def auto_n_lists(n_rows: int) -> int:
    """√N coarse-quantizer sizing, clamped to [4, 1024].

    The r9 20M-vector measurement quantified the undersizing trap: a
    probe's candidate volume is ~n_probe/n_lists of the corpus, so a
    FIXED n_lists makes probe cost grow linearly with the corpus (16
    lists at 20M → the probed union covered 70% of the corpus, 59.4 s vs
    3.3 s at 2M).  √N keeps both the per-list size and the centroid
    count sublinear.  The 1024 cap bounds the flat quantizer's own costs
    — assignment is O(n_lists·dim) column math per row and the k-means
    fit is O(k) per point per iteration; past ~1k lists a flat coarse
    quantizer should give way to a multi-level scheme (IMI / HNSW-coarse),
    which is out of scope here, so the cap is documented rather than
    silently exceeded.  The floor keeps tiny corpora from degenerating to
    1–2 lists where probing is a full scan anyway."""
    import math

    return max(4, min(1024, int(round(math.sqrt(max(n_rows, 1))))))


def auto_n_probe(n_lists: int) -> int:
    """√n_lists probe-width default, floored at 4 (and capped at n_lists
    by the entry points).

    Rationale, MEASURED on 200k high-entropy (hash-coordinate) vectors —
    the worst case for IVF, no cluster structure for the quantizer to
    exploit: at the old fixed default (16 lists, 4 probes = 25% of the
    corpus scanned) recall@10 was 0.62; auto-sized to 447 lists with
    n_probe HELD at 4 (0.9% scanned) recall fell to 0.24, recovering
    with probe width (8→0.36, 16→0.44, 32→0.58, 64→0.72).  A fixed
    n_probe therefore silently moves the recall operating point as the
    corpus (and √N lists) grows.  √n_lists holds the scanned fraction at
    ``1/√n_lists`` — candidate volume grows ~N^(3/4), still sublinear,
    while worst-case recall decays slowly instead of cratering; real
    embedding corpora cluster, so their recall holds far better than
    this adversarial floor.  At n_lists=16 the rule gives exactly the
    historical n_probe=4, so fixture-scale and certified behavior are
    unchanged.  Callers with a recall target should measure and pass
    n_probe explicitly — this default picks a sane POINT, not a
    guarantee (BENCH_COMPARE §r10)."""
    import math

    return max(4, int(round(math.sqrt(max(n_lists, 1)))))


#: k-means training budget for the AUTO build path: points per centroid.
#: The FAISS guideline is ~30-256 training points per centroid — beyond
#: that the fit cost grows linearly with the corpus while centroid
#: quality plateaus.  256 keeps the auto fit bounded at ≤ 256·n_lists
#: rows (≤ ~262k at the 1024-list cap) no matter how large the corpus.
IVF_TRAIN_POINTS_PER_LIST = 256


def resolve_ivf_build_params(
    n_rows: int, n_lists: int | None, train_fraction: float | None
) -> tuple[int, float | None]:
    """Resolve ivf_build's auto defaults from the corpus size.

    ``n_lists=None`` → :func:`auto_n_lists` (capped at the corpus size so
    k-means never gets k > n).  On the auto path an unset
    ``train_fraction`` also resolves to the
    :data:`IVF_TRAIN_POINTS_PER_LIST` sampling budget when the corpus
    exceeds it — the √N rule makes PROBES corpus-sublinear, but a
    full-corpus k-means fit at √N centroids would itself be
    corpus-linear × k (the r9 20M measurement: sampled fit cut the 8×-
    centroid build 145 → 57 s); scale-safe-by-default has to bound both.
    EXPLICIT arguments always pass through untouched — the certified n3
    path (n_lists=16, full fit) stays bit-identical."""
    if n_lists is None:
        n_lists = min(auto_n_lists(n_rows), max(n_rows, 1))
        target = IVF_TRAIN_POINTS_PER_LIST * n_lists
        if train_fraction is None and n_rows > target:
            train_fraction = target / n_rows
    return n_lists, train_fraction


def ivf_build(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int | None = None,
    seed: int = 42,
    train_fraction: float | None = None,
):
    """Train the coarse quantizer and assign every vector to its list.

    Returns (assigned DataFrame with `_list`, centroids ndarray).  The
    centroid table is tiny (n_lists × dim) and lives driver-side — the
    classic IVF split: centroids broadcast, inverted lists distributed.
    At 100 TB the assigned table is written partitioned BY `_list`, so a
    probe touches only n_probe/n_lists of the data (partition pruning).

    SIZING RULE (r9, measured at the 20M decade): ``n_lists`` must GROW
    with the corpus — the standard heuristic is n_lists ∝ √N — because a
    probe's candidate volume is ~``n_probe/n_lists`` of the corpus: hold
    n_lists at 16 while the corpus grows 10× and every probe scans 10×
    the vectors (measured 3.3 s → 59 s for the same 5 queries at
    2M → 20M).  Re-sized to n_lists=128 the 20M probe is back to a
    bounded candidate set (BENCH_COMPARE §r9).  Since r10 the rule IS
    the default: ``n_lists=None`` resolves via
    :func:`resolve_ivf_build_params` (√N clamped to [4, 1024], capped at
    the corpus size; an unset ``train_fraction`` on this auto path also
    resolves to the :data:`IVF_TRAIN_POINTS_PER_LIST` sampling budget —
    a full-corpus fit at √N centroids would be its own scale trap) — a
    100 TB caller gets scale-safe sizing AND a bounded fit without
    reading this docstring, at the cost of one ``count()`` job at build
    time; pass an explicit ``n_lists`` to skip the count (the certified
    n3 query and the bench/slope harnesses pass 16).

    ``train_fraction`` bounds the k-means FIT to a deterministic sample
    (``corpus.sample(fraction, seed)``) while the ASSIGNMENT still covers
    every row — the FAISS-style split, and the only tractable form at
    scale: a 20-iteration k-means over 100 TB is not a build step anyone
    runs, while centroids only need a representative sample.  With an
    EXPLICIT ``n_lists``, default None fits on the full corpus
    (bit-identical to the pre-r9 behavior — the certified n3 path passes
    n_lists=16 and no fraction); on the auto-``n_lists`` path an unset
    fraction resolves to the sampling budget (see
    :func:`resolve_ivf_build_params`)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    import numpy as np

    if n_lists is None:
        n_lists, train_fraction = resolve_ivf_build_params(
            corpus.count(), n_lists, train_fraction
        )
    ml_df = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    if train_fraction is not None:
        if not 0.0 < train_fraction <= 1.0:
            raise ValueError(f"train_fraction out of (0, 1]: {train_fraction}")
        fit_df = ml_df.sample(fraction=train_fraction, seed=seed)
    else:
        fit_df = ml_df
    model = KMeans(k=n_lists, seed=seed, maxIter=20).fit(fit_df)
    assigned = model.transform(ml_df).select(
        "id", "v", F.col("prediction").alias("_list")
    )
    centroids = np.array(
        [c.toArray() if hasattr(c, "toArray") else np.asarray(c)
         for c in model.clusterCenters()]
    )
    return assigned, centroids


#: Above this many query rows, query→probe-list assignment runs engine-side
#: (``_probe_assign``) instead of collecting the query frame to the driver —
#: a bulk kNN batch (millions of queries) must never materialize driver-side.
MAX_DRIVER_PROBE_QUERIES = 1024


def _probe_assign(
    centroids, queries: DataFrame, query_id_col: str, vec_col: str,
    n_probe: int,
) -> DataFrame:
    """Distributed query→probe-list assignment: the centroid matrix is a
    literal (n_lists × dim — KBs), distances are one codegen'd HOF fold per
    (query, centroid), and the `n_probe` nearest lists come from an
    ``array_sort`` over (distance, list) structs — ties break toward the
    lower list id, deterministically.  No collect, no UDF, no shuffle:
    scales to arbitrarily large query frames (the bulk-kNN path).
    NULL / wrong-dimension query vectors are REJECTED in-plan
    (raise_error), matching the driver path (numpy raises on NULL) and
    centroid_assign's policy — a NULL distance fold would otherwise
    silently probe lists 0..n_probe-1 and return plausible-looking but
    meaningless top-k."""
    dim = len(centroids[0])
    C = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    # NULL ELEMENTS are rejected too (r8 review fix): a correct-length
    # vector with one NULL element passed the old guard, every centroid
    # distance folded to NULL, the array_sort tie-break then probed lists
    # 0..n_probe-1 and returned k rows with NULL cosine — exactly the
    # plausible-looking-but-meaningless top-k this guard exists to prevent
    bad = (
        F.col(vec_col).isNull()
        | (F.size(vec_col) != dim)
        | F.exists(vec_col, lambda x: x.isNull())
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.when(
            bad,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"_probe_assign: NULL or non-{dim}-dim query vector at "
                    ),
                    F.col(query_id_col).cast("string"),
                )
            ),
        )
        .otherwise(F.col(vec_col).cast("array<double>"))
        .alias("q_vec"),
    )
    d2 = F.transform(
        C,
        lambda c: F.aggregate(
            F.zip_with(F.col("q_vec"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    staged = q.select("query_id", "q_vec", d2.alias("_d2"))
    nearest = F.slice(
        F.array_sort(
            F.transform(
                F.col("_d2"),
                lambda d, i: F.struct(d.alias("d"), i.alias("l")),
            )
        ),
        1,
        n_probe,
    )
    return staged.select(
        "query_id",
        "q_vec",
        F.explode(F.transform(nearest, lambda s: s["l"].cast("int"))).alias(
            "_list"
        ),
    )


def _ivf_probes(
    spark, centroids, queries: DataFrame, query_id_col: str, vec_col: str,
    n_probe: int, *, need_lists: bool = True,
):
    """((query_id, q_vec, _list) frame, sorted probed list ids or None,
    small flag) — each query replicated onto its `n_probe` nearest coarse
    lists.  Shared by the in-memory and persisted-store probe paths so
    they cannot desynchronize.

    Routing (VERDICT r04 #3): one collect of at most
    ``MAX_DRIVER_PROBE_QUERIES + 1`` rows both decides the route AND
    feeds the small path (no separate count job).  Within the cap the
    assignment is driver-side numpy against the tiny centroid table (the
    point-lookup batch case).  Beyond it the query frame is NEVER
    collected: :func:`_probe_assign` does the same squared-L2 argsort
    engine-side; with ``need_lists`` the probe frame is persisted and
    only the ≤ n_lists DISTINCT probed ids come back (for the store
    path's static partition filter — the persist keeps the candidate
    join from recomputing the distance stage; released by Spark's LRU
    like the dedup family's group frames).  ``need_lists=False`` (the
    in-memory path, which never uses the ids) skips that job entirely.
    Both paths break distance ties toward the lower list id; near-exact
    ties may still differ between paths by float summation order
    (harmless for ANN — either list is an equally-near coarse
    assignment)."""
    import numpy as np

    cap = MAX_DRIVER_PROBE_QUERIES
    head = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).limit(cap + 1).collect()
    if len(head) > cap:
        probe_df = _probe_assign(
            centroids, queries, query_id_col, vec_col, n_probe
        )
        probed = None
        if need_lists:
            probe_df = probe_df.persist()
            probed = sorted(
                r["_list"]
                for r in probe_df.select("_list").distinct().collect()
            )
        return probe_df, probed, False

    probes = []
    dim = len(centroids[0])
    for r in head:
        # mirror _probe_assign's guard exactly: numpy raises on NULL but
        # silently BROADCASTS a wrong-length vector (a length-1 query
        # scored every centroid and returned NULL-cosine garbage where
        # the bulk path raises) — both sides of the routing threshold
        # must reject identically
        if r["q_vec"] is None or len(r["q_vec"]) != dim or any(
            x is None for x in r["q_vec"]
        ):
            raise ValueError(
                f"_ivf_probes: NULL or non-{dim}-dim query vector at "
                f"{r['query_id']}"
            )
        qv = np.asarray(r["q_vec"], dtype="float64")
        d = ((centroids - qv) ** 2).sum(axis=1)
        # stable sort == the distributed path's (distance, list) tie-break
        for lst in np.argsort(d, kind="stable")[:n_probe]:
            probes.append((r["query_id"], list(map(float, r["q_vec"])), int(lst)))
    # ADVICE r05: the id type follows the QUERY frame's schema (as the
    # bulk _probe_assign path preserves it) — a string-keyed query frame
    # must behave identically on both sides of the routing threshold,
    # not fail only when it happens to be small.
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    id_type = queries.schema[query_id_col].dataType
    schema = StructType(
        [
            StructField("query_id", id_type),
            StructField("q_vec", ArrayType(DoubleType())),
            StructField("_list", IntegerType()),
        ]
    )
    df = spark.createDataFrame(probes, schema)
    return df, sorted({p[2] for p in probes}), True


def _ivf_score_topk(cand: DataFrame, k: int, *, scorer: str = "exact") -> DataFrame:
    try:
        cos = _SCORERS[scorer]
    except KeyError:
        raise ValueError(
            f"unknown scorer {scorer!r}: expected one of {sorted(_SCORERS)}"
        ) from None
    scored = cand.select(
        "query_id",
        F.col("id").alias("vec_id"),
        F.round(cos(F.col("q_vec"), F.col("v")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ivf_topk(
    assigned: DataFrame,
    centroids,
    queries: DataFrame,
    *,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    n_probe: int | None = None,
    k: int = 10,
    scorer: str = "vectorized",
) -> DataFrame:
    """Probed ANN search: per query, scan only the `n_probe` inverted lists
    whose centroids are nearest — candidate generation is an equi-join on
    `_list`, never a cross product.  The DEFAULT scorer is the Arrow/numpy
    production form since r10 (the measured 3–3.8× path at the 20M decade
    — a 100 TB caller gets it without reading docstrings); pass
    ``scorer="exact"`` for the deterministic HOF cosine fold that the
    certified n3 oracle restates (6-dp agreement + identical top-k with
    the vectorized form is CI-pinned — see :func:`cosine_vectorized` for
    the summation-order trade).  ``n_probe=None`` resolves via
    :func:`auto_n_probe` (√n_lists, floor 4 — identical to the
    historical 4 at n_lists=16), so the recall operating point follows
    auto-sized list counts instead of silently shrinking with them.

    Query→probe-list assignment is driver-side for point-lookup batches
    and engine-side column math beyond ``MAX_DRIVER_PROBE_QUERIES`` (the
    bulk-kNN path — the query frame is never collected); everything after
    is engine-side either way.  The probe frame is broadcast only in the
    small-batch case; a bulk probe frame shuffle-joins on `_list` (AQE
    may still pick broadcast from its own stats).  Returns (query_id,
    vec_id, cosine, rank)."""
    if n_probe is None:
        n_probe = min(auto_n_probe(len(centroids)), len(centroids))
    probe_df, _, small = _ivf_probes(
        assigned.sparkSession, centroids, queries, query_id_col, vec_col,
        n_probe, need_lists=False,
    )
    cand = assigned.join(F.broadcast(probe_df) if small else probe_df, "_list")
    return _ivf_score_topk(cand, k, scorer=scorer)


def ivf_write(
    assigned: DataFrame, path: str, *, mode: str = "overwrite", centroids=None
) -> None:
    """Materialize the inverted lists as a parquet table PARTITIONED BY
    `_list` — the 100 TB form of the IVF index that ivf_build's docstring
    promises: each coarse cluster is its own partition directory, so a
    probe reads n_probe/n_lists of the corpus bytes via static partition
    pruning and everything else is never opened.

    Pass ``centroids`` (the ndarray from :func:`ivf_build`) to persist the
    coarse quantizer alongside the lists (under ``_centroids/`` — the
    leading underscore hides it from the main table's partition
    discovery, like ``_metadata``): a store with centroids supports
    :func:`ivf_append` — incremental maintenance without retraining.

    Mode contract: ``overwrite`` replaces the ENTIRE store directory,
    including any persisted quantizer — pass ``centroids`` again to keep
    the store appendable.  ``mode='append'`` with ``centroids`` is
    rejected: the quantizer is written once at store creation; appending
    a second centroid set would leave conflicting rows that
    :func:`read_ivf_centroids` cannot disambiguate (re-clustering is a
    new overwrite, deliberate and explicit)."""
    if mode == "append" and centroids is not None:
        raise ValueError(
            "ivf_write(mode='append') cannot rewrite the quantizer — "
            "centroids are written once at store creation (use ivf_append "
            "for increments, or overwrite to re-cluster)"
        )
    # one file per list (r12, the ivf_pq_write finding): partitionBy
    # alone fans every write task across every list value — tasks ×
    # n_lists small files, so a pruned probe schedules a task per FILE,
    # not per list.  The pre-write hash repartition on _list lands each
    # list in exactly one file; the one-time shuffle moves the assigned
    # rows once at build time.
    assigned.repartition(F.col("_list")).write.mode(mode).partitionBy(
        "_list"
    ).parquet(path)
    if centroids is not None:
        spark = assigned.sparkSession
        rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
        spark.createDataFrame(rows, "_list int, centroid array<double>").coalesce(
            1
        ).write.mode(mode).parquet(f"{path}/_centroids")


def read_ivf_centroids(spark, path: str):
    """The persisted coarse quantizer as an ndarray (row i = list i)."""
    import numpy as np

    rows = spark.read.parquet(f"{path}/_centroids").collect()
    by_list = {r["_list"]: r["centroid"] for r in rows}
    return np.array([by_list[i] for i in range(len(by_list))])


def centroid_assign(
    df: DataFrame,
    centroids,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_d2: int | None = None,
) -> DataFrame:
    """(id, v, _list) — nearest-centroid assignment as pure column math.

    The centroid matrix is a literal (n_lists × dim — KBs), so assignment
    is one codegen'd HOF pass per row: no MLlib, no UDF, no shuffle — it
    runs at scan speed over an arbitrarily large increment.  Squared-L2
    argmin with first-index tie-break.  Equivalence to KMeans.transform
    is pinned EMPIRICALLY on the test fixtures
    (tests/test_similarity_ivf.py), not guaranteed in general: the two
    paths compute distance with different float op orders, so a vector
    exactly (or near-exactly) equidistant from two centroids can flip
    lists — harmless for ANN recall (either list is a valid coarse
    assignment; probes use the same centroids either way), but the
    "append-store probes identical to one-shot build" contract is
    fixture-pinned for KMeans-built stores.  Stores maintained purely
    via ``centroid_assign``/:func:`ivf_append` share this one code path
    and are exactly reproducible.  The distance array is projected to a
    named column before the argmin so the HOF fold is evaluated once,
    not once per reference.

    NULL, wrong-dimension, or NULL-ELEMENT vectors are REJECTED
    (raise_error in the plan): a silent NULL `_list` would land the row
    in the Hive default partition where no probe ever reads it — the
    MLlib path fails loudly on the same input, and so does this one.
    (r11 review: the element check mirrors _probe_assign's r8 fix — a
    correct-length vector with ONE NULL element folded every centroid
    distance to NULL, array_position returned NULL, and the append
    landed in the dead partition with no error.)

    ``round_d2`` rounds each squared distance to that many decimal
    places BEFORE the argmin.  The IVF store path leaves it None (the
    un-rounded fold is the store's single reproducible code path); the
    engine-portable :func:`semantic_dedup` certification sets it so a
    SQL twin computing the same fold in a different engine cannot flip
    an assignment on last-bit summation noise — ties after rounding
    break on the first (lowest) centroid index in both engines."""
    dim = len(centroids[0])
    C = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    bad = (
        F.col(vec_col).isNull()
        | (F.size(vec_col) != dim)
        | F.exists(vec_col, lambda x: x.isNull())
    )
    prepared = df.select(
        F.col(id_col).alias("id"),
        F.when(
            bad,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"centroid_assign: NULL or non-{dim}-dim vector at id="
                    ),
                    F.col(id_col).cast("string"),
                )
            ),
        ).otherwise(F.col(vec_col)).alias("v"),
        F.col(vec_col).cast("array<double>").alias("_vd"),
    )
    d2 = F.transform(
        C,
        lambda c: F.aggregate(
            F.zip_with(F.col("_vd"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    if round_d2 is not None:
        d2 = F.transform(d2, lambda x: F.round(x, round_d2))
    staged = prepared.select("id", "v", d2.alias("_d2"))
    lst = (F.array_position(F.col("_d2"), F.array_min("_d2")) - 1).cast("int")
    return staged.select("id", "v", lst.alias("_list"))


def ivf_append(
    spark,
    path: str,
    new_vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental IVF maintenance: assign an increment to the STORE's
    persisted centroids and append it to the inverted lists — the
    append-only-corpus path (daily embedding drops index without
    retraining the quantizer or rewriting existing partitions; parquet
    append into ``_list=K/`` touches only the lists the increment lands
    in).  Probes over the grown store are identical to a store built from
    the union in one shot (same centroids ⇒ same assignment; pinned in
    tests).  Re-clustering when drift accumulates is a new ivf_build +
    ivf_write — deliberate and explicit, not implicit.  GROWTH is a
    re-cluster trigger too, not just drift: n_lists was sized (√N rule)
    for the corpus at build time, so appends that multiply the corpus
    push per-list size — and hence probe candidate volume — back up
    linearly; once the store is ~4× its build-time size the 2×-off √N
    sizing costs ~2× per probe (the r9 20M measurement quantifies the
    limit of ignoring this)."""
    centroids = read_ivf_centroids(spark, path)
    assigned = centroid_assign(
        new_vectors, centroids, id_col=id_col, vec_col=vec_col
    )
    # one file per touched list PER INCREMENT (see ivf_write) — appends
    # still accumulate a file per drop, which is the append-only trade;
    # re-clustering (a new build+write) is also the compaction point.
    assigned.repartition(F.col("_list")).write.mode("append").partitionBy(
        "_list"
    ).parquet(path)


def ivf_topk_from_store(
    spark,
    path: str,
    centroids,
    queries: DataFrame,
    *,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    n_probe: int | None = None,
    k: int = 10,
    scorer: str = "vectorized",
    store_df: DataFrame | None = None,
) -> DataFrame:
    """:func:`ivf_topk` over a persisted :func:`ivf_write` store.
    The default scorer is the Arrow/numpy production form since r10
    (:func:`cosine_vectorized` — the measured 3–3.8× path on bulk/store
    probes); pass ``scorer="exact"`` for the deterministic HOF fold
    (certified-parity path; 6-dp agreement + identical top-k CI-pinned).
    ``n_probe=None`` resolves via :func:`auto_n_probe` (√n_lists,
    floor 4 — identical to the historical 4 at n_lists=16), holding the
    recall operating point as auto-sized list counts grow.

    The probed list ids are applied as a STATIC `_list IN (...)` filter
    before the candidate join, so the parquet scan's PartitionFilters
    prune every unprobed partition at planning time (pinned in
    tests/test_similarity_ivf.py) — no reliance on runtime DPP.  Results
    are identical to the in-memory form (shared probe/scoring helpers).

    Bulk-routed query frames (> ``MAX_DRIVER_PROBE_QUERIES``) persist the
    probe frame so the distinct-lists collect doesn't recompute the
    distance stage; the persisted handle rides on the returned DataFrame
    as ``result._probe_cache`` (ADVICE r05) — long-lived sessions issuing
    many bulk probes should ``result._probe_cache.unpersist()`` once the
    result is materialized instead of waiting for LRU/GC release.  Small
    batches set it to None.  Because that attribute is lost through any
    subsequent transformation, composing callers should instead wrap the
    probe-and-consume block in :func:`probe_cache_scope`, which releases
    every cache persisted inside it on exit (ADVICE r06)."""
    if n_probe is None:
        n_probe = min(auto_n_probe(len(centroids)), len(centroids))
    probe_df, probed_lists, small = _ivf_probes(
        spark, centroids, queries, query_id_col, vec_col, n_probe
    )
    # ``store_df``: a pre-loaded spark.read.parquet(path) handle — each
    # fresh read re-runs partition discovery over n_lists directories (a
    # listing job that dominates a pruned probe at the 20M/1024-list
    # decade); repeated probes should read once and pass the handle.
    base = store_df if store_df is not None else spark.read.parquet(path)
    store = base.where(F.col("_list").isin(probed_lists))
    cand = store.join(F.broadcast(probe_df) if small else probe_df, "_list")
    result = _ivf_score_topk(cand, k, scorer=scorer)
    result._probe_cache = None if small else probe_df
    if not small and _PROBE_CACHE_SCOPES:
        _PROBE_CACHE_SCOPES[-1].append(probe_df)
    return result


def n_probe_for_recall(
    assigned: DataFrame,
    centroids,
    sample_queries: DataFrame,
    *,
    target: float = 0.9,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    k: int = 10,
    return_curve: bool = False,
):
    """Smallest ``n_probe`` whose measured recall@k reaches ``target`` on a
    held-out query sample — the principled knob for production callers
    (VERDICT r10 #7): :func:`auto_n_probe` picks a sane default POINT,
    this measures the caller's own corpus/queries and returns the width
    for a recall TARGET.

    One pass, no repeated probing: recall at width w is the fraction of
    EXACT top-k neighbors whose inverted list ranks within the query's w
    nearest centroids (scoring inside probed candidates is exact, so
    candidate-generation recall IS top-k recall).  The exact top-k runs
    once (brute force over the corpus — the sample is small, this is a
    calibration step), each true neighbor joins to its `_list`, and the
    whole recall-vs-width curve falls out of the neighbor's list rank.
    The sample itself is bounded by ``MAX_DRIVER_PROBE_QUERIES`` (the
    centroid ranking runs driver-side against the tiny centroid matrix —
    a calibration sample past that cap is a misuse, not a scale path).

    Returns the width (int), or ``(width, curve)`` with
    ``return_curve=True`` where curve[w] = measured mean recall@k at w
    (1-indexed list ranks; curve[n_lists] is exact-scan recall 1.0 by
    construction).  If no width below ``n_lists`` reaches the target the
    full width is returned — a probe of every list is an exact scan."""
    import numpy as np

    n_lists = len(centroids)
    if not 0.0 < target <= 1.0:
        raise ValueError(f"target out of (0, 1]: {target}")
    sample = sample_queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).limit(MAX_DRIVER_PROBE_QUERIES + 1).collect()
    if len(sample) > MAX_DRIVER_PROBE_QUERIES:
        raise ValueError(
            f"n_probe_for_recall: calibration sample exceeds "
            f"{MAX_DRIVER_PROBE_QUERIES} queries — pass a (random) sample, "
            "not the production query stream"
        )
    if not sample:
        raise ValueError("n_probe_for_recall: empty query sample")
    dim = len(centroids[0])
    ranks: dict[object, list[int]] = {}
    for r in sample:
        if r["q_vec"] is None or len(r["q_vec"]) != dim or any(
            x is None for x in r["q_vec"]
        ):
            raise ValueError(
                f"n_probe_for_recall: NULL or non-{dim}-dim query vector at "
                f"{r['query_id']}"
            )
        qv = np.asarray(r["q_vec"], dtype="float64")
        d = ((centroids - qv) ** 2).sum(axis=1)
        order = np.argsort(d, kind="stable")  # same tie-break as the probes
        rank_of_list = np.empty(n_lists, dtype=np.int64)
        rank_of_list[order] = np.arange(1, n_lists + 1)
        ranks[r["query_id"]] = rank_of_list
    from pyspark.sql.types import StructField, StructType

    id_type = sample_queries.schema[query_id_col].dataType
    vec_type = sample_queries.schema[vec_col].dataType
    q_df = assigned.sparkSession.createDataFrame(
        [(r["query_id"], r["q_vec"]) for r in sample],
        StructType(
            [StructField("query_id", id_type), StructField("v", vec_type)]
        ),
    )
    exact = cosine_topk(assigned, q_df, id_col="id", vec_col="v", k=k)
    # fresh exprIds on the list lookup (exact derives from assigned —
    # the pipeline compiler's _clone pattern for self-join ambiguity)
    lists = assigned.select(
        F.col("id").alias("_lid"), F.col("_list").alias("_list")
    )
    hits = (
        exact.join(lists, exact["vec_id"] == F.col("_lid"))
        .select("query_id", "_list")
        .collect()
    )
    per_query: dict[object, list[int]] = {}
    for h in hits:
        per_query.setdefault(h["query_id"], []).append(
            int(ranks[h["query_id"]][h["_list"]])
        )
    curve = {}
    for w in range(1, n_lists + 1):
        recalls = [
            sum(1 for r in rs if r <= w) / len(rs)
            for rs in per_query.values()
        ]
        curve[w] = sum(recalls) / len(recalls)
    width = next((w for w in range(1, n_lists + 1) if curve[w] >= target), n_lists)
    return (width, curve) if return_curve else width


def quantize_embeddings(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Per-vector symmetric max-abs integer quantization — the storage path
    for an embedding corpus at 100 TB: int8 cuts a float32 corpus 4× before
    ANN indexing, with one double scale riding along per vector.

    ``q_i = round(x_i / scale)``, ``scale = max|x| / (2^(bits-1) - 1)`` —
    the max-magnitude element maps to exactly ±qmax, so no clipping branch
    exists.  A zero/empty vector quantizes to zeros with scale 0.0 and the
    dequantization is defined as exact (mse 0.0); NULL elements quantize
    to NULL and are excluded from mse/n_sat (coalesce-skip — the same
    NULL-skipping sum DuckDB's list_sum states, so the qz1 oracle agrees
    on malformed vectors too).

    Pure column math (codegen, no UDF, no shuffle — evaluates at scan).
    HOF shape note: computed columns are only ever passed as HOF *array
    arguments* (``zip_with(v, qv, …)``), never referenced inside a lambda
    body, so nothing is re-evaluated per element (the NOTES char-ngram
    trap); the scalar ``scale`` is projected once per row before any
    lambda uses it.

    Returns ``(id, qvec array<int>, scale double, n_sat int, mse double)``
    where ``n_sat`` counts saturated (|q| = qmax) elements and ``mse`` is
    the mean squared dequantization residual in the input's units.
    """
    if bits < 2 or bits > 31:
        raise ValueError(f"bits must be in [2, 31], got {bits}")
    qmax = (1 << (bits - 1)) - 1
    v = F.col(vec_col).cast("array<double>")
    amax = F.array_max(F.transform(v, F.abs))
    scaled = df.select(
        F.col(id_col).alias("id"),
        v.alias("v"),
        F.coalesce(amax / F.lit(float(qmax)), F.lit(0.0)).alias("scale"),
    )
    qv = F.when(
        F.col("scale") > 0.0,
        F.transform(F.col("v"), lambda x: F.round(x / F.col("scale")).cast("int")),
    ).otherwise(F.transform(F.col("v"), lambda x: F.lit(0)))
    quantized = scaled.select("id", "v", "scale", qv.alias("qvec"))
    resid = F.zip_with(
        F.col("v"), F.col("qvec"),
        lambda x, q: x - q.cast("double") * F.col("scale"),
    )
    # NULL elements quantize to NULL and are EXCLUDED from mse/n_sat
    # (coalesce-skip, exactly DuckDB's NULL-skipping list_sum — the qz1
    # oracle and this fold agree on malformed vectors, not just clean ones)
    mse = F.when(F.size("v") > 0,
        F.aggregate(
            resid, F.lit(0.0), lambda acc, r: acc + F.coalesce(r * r, F.lit(0.0))
        )
        / F.size("v").cast("double"),
    ).otherwise(F.lit(0.0))
    n_sat = F.size(F.filter(F.col("qvec"), lambda q: F.abs(q) == qmax))
    return quantized.select(
        "id", "qvec", "scale", n_sat.alias("n_sat"), mse.alias("mse")
    )


def groupwise_centroids(
    df: DataFrame,
    group_col: str,
    vec_col: str,
    *,
    dim: int,
) -> DataFrame:
    """Exact per-group mean embedding — the domain/label centroid table a
    pipeline monitors for drift, routes mixtures by, or seeds clustering
    from.  Returns ``(<group_col>, n_vectors, centroid array<double>)``
    with components at 6 dp.

    Only rows with a complete ``dim``-length, NULL-free vector count
    (stated contract — a partial vector must not silently skew one
    component).

    Bit-identical across engines BY CONSTRUCTION, no float summation
    anywhere: components quantize to integer micro-units via
    ``floor(x·1e6 + 0.5)`` (pure IEEE multiply-add-floor — identical on
    identical doubles, unlike ROUND, whose decimal-expansion tie-break
    measurably diverges between engines), the per-component sum is a
    bigint, and the mean rounds half-AWAY-FROM-ZERO via sign-split
    truncating integer division (Spark ``div`` truncates toward zero,
    DuckDB ``//`` floors — they agree only on non-negative operands, so
    the division runs on ``|s|`` with the sign re-applied).

    Scale shape: posexplode → groupBy(group, idx) with map-side combine
    (the shuffle carries ≤ groups·dim partial rows per task, never
    vectors), then a groups-sized reassembly (sort_array fixes
    collect_list's order by the leading idx field).  No UDFs, no
    driver work."""
    g = F.col(group_col)
    v = F.col(vec_col)
    clean = df.where(
        v.isNotNull()
        & (F.size(v) == dim)
        & (F.size(F.filter(v, lambda x: x.isNull())) == 0)
    ).select(g.alias("_g"), v.cast("array<double>").alias("_v"))
    inst = clean.select(
        "_g", F.posexplode("_v").alias("_i", "_x")
    ).select(
        "_g",
        (F.col("_i") + F.lit(1)).alias("_i"),
        F.floor(F.col("_x") * 1e6 + F.lit(0.5)).cast("bigint").alias("_m"),
    )
    sums = inst.groupBy("_g", "_i").agg(
        F.sum("_m").alias("_s"), F.count(F.lit(1)).alias("_n")
    )
    mean_micro = F.expr(
        "CASE WHEN _s < 0 THEN -((2 * (-_s) + _n) div (2 * _n)) "
        "ELSE (2 * _s + _n) div (2 * _n) END"
    )
    comp = sums.select(
        "_g", "_i", "_n", (mean_micro.cast("double") / 1e6).alias("_c")
    )
    return (
        comp.groupBy("_g")
        .agg(
            F.max("_n").cast("bigint").alias("n_vectors"),
            F.transform(
                F.sort_array(F.collect_list(F.struct("_i", "_c"))),
                lambda s: s["_c"],
            ).alias("centroid"),
        )
        .select(F.col("_g").alias(group_col), "n_vectors", "centroid")
    )


def lsh_bucket_neighbors(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    min_cosine: float = 0.8,
    collapse_exact: bool = True,
) -> DataFrame:
    """ANN candidate pairs: same hyperplane bucket → exact cosine verify.

    The equi-join on bucket id replaces the O(N²) cross product; `min_cosine`
    keeps precision exact (LSH affects recall only).

    Scale shapes (r4, same as embedding_neardup_pairs — both pinned
    output-equivalent in tests): the bucket join moves bare (id, bucket)
    rows and only the surviving candidate pairs join back to their two
    vectors (the prior shape carried both dim×8 B vectors through every
    in-bucket pair), and `collapse_exact` groups bit-identical vectors so
    LSH runs once per distinct vector with member fan-out at the end —
    on a 10×-duplicated 20 k-vector corpus this takes the operator from
    75 s to ~2 s at identical output."""
    from overturemaps_duckdb_spark.operators.dedup import (
        _exact_groups,
        _explode_ordered_pairs,
        _fanout_members,
    )

    v0 = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    groups = None
    if collapse_exact:
        groups = _exact_groups(
            v0, "v", group_cap=1000, obs_name="lsh_ann_group_cap"
        )
        v0 = groups.select(F.element_at("gids", 1).alias("id"), "v")
    bucket = hyperplane_signature(F.col("v"), n_planes=n_planes, dim=dim)
    sig = v0.withColumn("bucket", bucket)
    ka = sig.select(F.col("id").alias("a_id"), "bucket")
    kb = sig.select(F.col("id").alias("b_id"), "bucket")
    cand = ka.join(kb, ["bucket"]).where(F.col("a_id") < F.col("b_id"))
    # per-vector norms precomputed (bit-identical fold; 3 HOF traversals
    # per pair → 1)
    av = v0.select(
        F.col("id").alias("a_id"), F.col("v").alias("a_v"),
        norm_expr(F.col("v")).alias("_na"),
    )
    bv = v0.select(
        F.col("id").alias("b_id"), F.col("v").alias("b_v"),
        norm_expr(F.col("v")).alias("_nb"),
    )
    pairs = cand.join(av, "a_id").join(bv, "b_id")
    cos = F.round(
        dot_expr(F.col("a_v"), F.col("b_v")) / (F.col("_na") * F.col("_nb")), 6
    )
    rep_pairs = (
        pairs.withColumn("cosine", cos)
        .where(F.col("cosine") >= min_cosine)
        .select("a_id", "b_id", "bucket", "cosine")
    )
    if groups is None:
        return rep_pairs
    # identical vectors always share a bucket, so every intra-group pair is
    # a candidate; cosine(v, v) is computed (zero-norm/NaN vectors drop
    # exactly as the per-vector path drops them)
    intra = _explode_ordered_pairs(
        groups.where(F.size("gids") > 1)
        .withColumn("bucket", bucket)
        .withColumn("cosine", F.round(cosine_expr(F.col("v"), F.col("v")), 6))
        .where(F.col("cosine") >= min_cosine),
        "gids",
        ["bucket", "cosine"],
    ).select("a_id", "b_id", "bucket", "cosine")
    cross = _fanout_members(
        rep_pairs, groups, groups, ["bucket", "cosine"], normalize_order=True
    )
    return intra.unionByName(cross)


# ---------------------------------------------------------------------------
# semantic deduplication (SemDeDup)
# ---------------------------------------------------------------------------


def seed_centroids(
    df: DataFrame,
    n_seeds: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """The ``n_seeds`` lowest-id vectors as a centroid matrix.

    The deterministic, engine-portable quantizer for
    :func:`semantic_dedup`'s certified form: no iteration, no RNG — any
    engine reading the same table derives the same matrix, so an
    external oracle can replicate cluster assignment exactly.  Bounded
    driver collect (``n_seeds`` rows, KBs).  Production callers pass
    k-means centroids from :func:`ivf_build` instead — the operator is
    quantizer-agnostic."""
    rows = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .where(F.col("v").isNotNull())
        .orderBy("id")
        .limit(n_seeds)
        .collect()
    )
    if len(rows) < n_seeds:
        raise ValueError(
            f"seed_centroids: corpus has only {len(rows)} non-NULL vectors, "
            f"need {n_seeds}"
        )
    return [list(r["v"]) for r in rows]


def semantic_dedup(
    df: DataFrame,
    centroids,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    round_d2: int | None = None,
    collapse_exact: bool = True,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster-bounded
    semantic deduplication — the embedding-space pruning pass between
    exact/near-dup removal (d1/d2/d5) and model training.

    Every vector is assigned to its nearest centroid
    (:func:`centroid_assign` — pure column math, scan-speed), then
    cosine similarity is evaluated ONLY within clusters.  A row ``b``
    is a semantic duplicate iff some same-cluster row ``a`` with
    ``a.id < b.id`` has ``round(cosine(a, b), 6) >= threshold`` — the
    greedy keep-first-seen rule of the paper, made deterministic by
    ordering on the id.  Returns the REMOVAL REPORT::

        (<id_col>, cluster, dup_of, cosine)

    one row per removed vector, where ``dup_of`` is the SMALLEST
    qualifying ``a`` and ``cosine`` the similarity to that specific
    survivor.  :func:`semantic_survivors` is the complement.

    Scale shape: the intra-cluster self-join is an equi-join on the
    cluster id — pair expansion is sum(c_k²)/2, bounded by the caller's
    cluster count, never the corpus N².  The paper runs K ≈ N/1k-10k
    clusters at web scale; size K via ivf_build's √N rule and the same
    quantizer serves both the ANN store and this pass.  Per-vector
    norms are computed once per side before the join (the d5 shape:
    one HOF traversal per pair, not three); the removal window
    (row_number over ``b_id``) shuffles bare ids + one double.  Nothing
    broadcasts the corpus and texts/payloads never enter the plan.

    ``collapse_exact`` (default on, the d2/d5/n2/fz1 convention):
    bit-identical vectors group first — assignment and pairing run once
    per DISTINCT vector and member pairs fan back out through the group
    map before the removal window, so a corpus duplicated d× sheds d²
    from the intra-cluster quadratic.  Row-identical to the direct form
    (pinned in tests): intra-group pairs score cosine(v, v) computed,
    not assumed, and cross-group pairs inherit their representatives'
    cosine verbatim; the min-``dup_of`` window then sees exactly the
    qualifying pair set either way.  NULL/malformed vectors are REJECTED
    loudly by :func:`centroid_assign` in both modes.

    Reference parity: the reference engine has no semantic-dedup
    surface; this extends the dedup family (operators/dedup.py) per the
    published pipeline recipe.
    """
    from overturemaps_duckdb_spark.operators.dedup import (
        _exact_groups,
        _explode_ordered_pairs,
        _fanout_members,
    )

    v0 = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    groups = None
    if collapse_exact:
        groups = _exact_groups(
            v0, "v", group_cap=1000, obs_name="semantic_group_cap"
        )
        v0 = groups.select(F.element_at("gids", 1).alias("id"), "v")
    assigned = centroid_assign(
        v0, centroids, id_col="id", vec_col="v", round_d2=round_d2
    )
    a = assigned.select(
        F.col("id").alias("a_id"),
        F.col("v").alias("a_v"),
        norm_expr(F.col("v")).alias("_na"),
        F.col("_list").alias("cluster"),
    )
    b = assigned.select(
        F.col("id").alias("b_id"),
        F.col("v").alias("b_v"),
        norm_expr(F.col("v")).alias("_nb"),
        F.col("_list").alias("cluster"),
    )
    cos = F.round(
        dot_expr(F.col("a_v"), F.col("b_v")) / (F.col("_na") * F.col("_nb")), 6
    )
    rep_pairs = (
        a.join(b, ["cluster"])
        .where(F.col("a_id") < F.col("b_id"))
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("a_id", "b_id", "cluster", "cosine")
    )
    if groups is None:
        pairs = rep_pairs
    else:
        # intra-group: identical vectors share their rep's cluster;
        # cosine(v, v) is computed, not assumed, so zero-norm/NaN
        # vectors drop exactly like the direct path
        gc = groups.join(
            assigned.select(
                F.col("id").alias("_rep"), F.col("_list").alias("cluster")
            ),
            F.element_at("gids", 1) == F.col("_rep"),
        ).drop("_rep")
        intra = _explode_ordered_pairs(
            gc.where(F.size("gids") > 1)
            .withColumn(
                "cosine", F.round(cosine_expr(F.col("v"), F.col("v")), 6)
            )
            .where(F.col("cosine") >= threshold),
            "gids",
            ["cluster", "cosine"],
        ).select("a_id", "b_id", "cluster", "cosine")
        cross = _fanout_members(
            rep_pairs, groups, groups, ["cluster", "cosine"],
            normalize_order=True,
        )
        pairs = intra.unionByName(cross)
    w = Window.partitionBy("b_id").orderBy("a_id")
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col("b_id").alias(id_col),
            F.col("cluster").cast("int").alias("cluster"),
            F.col("a_id").alias("dup_of"),
            "cosine",
        )
    )


def semantic_survivors(
    df: DataFrame,
    centroids,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    round_d2: int | None = None,
    collapse_exact: bool = True,
) -> DataFrame:
    """The kept side of :func:`semantic_dedup`: the input minus removed
    ids (left_anti on the id — original columns pass through untouched)."""
    removed = semantic_dedup(
        df,
        centroids,
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        round_d2=round_d2,
        collapse_exact=collapse_exact,
    ).select(id_col)
    return df.join(removed, id_col, "left_anti")


# ---------------------------------------------------------------------------
# product quantization (IVF-PQ's memory-bound ANN path)
# ---------------------------------------------------------------------------


def pq_train(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 16,
    train_points: int = 16384,
    seed: int = 42,
    iters: int = 15,
    normalize: bool = True,
):
    """Train product-quantization codebooks (Jégou et al. 2011): split the
    vector into ``m`` subspaces and k-means each to ``n_codes`` centroids.

    Returns an ``(m, n_codes, dim/m)`` ndarray.  The fit runs DRIVER-SIDE
    on a deterministic bounded sample (md5-ordered ``limit`` — the FAISS
    convention: codebooks need a representative sample, never the corpus;
    ``train_points`` rows ≈ MBs).  ``normalize=True`` trains on
    L2-normalized vectors so ADC inner products rank by cosine.
    Deterministic for a given (sample, seed): numpy Lloyd with seeded
    init, ties broken by centroid index."""
    import numpy as np

    rows = (
        df.select(F.col(vec_col).alias("v"), F.col(id_col).alias("id"))
        .where(F.col("v").isNotNull())
        .orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
        .limit(train_points)
        .collect()
    )
    X = np.array([list(r["v"]) for r in rows], dtype=np.float64)
    if X.ndim != 2 or X.shape[0] < n_codes:
        raise ValueError(
            f"pq_train: need ≥{n_codes} training vectors, got {X.shape}"
        )
    d = X.shape[1]
    if d % m:
        raise ValueError(f"pq_train: dim {d} not divisible by m={m}")
    if normalize:
        norms = np.sqrt((X * X).sum(axis=1, keepdims=True))
        keep = norms[:, 0] > 0
        X = X[keep] / norms[keep]
    sub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, n_codes, sub))
    for j in range(m):
        Xj = X[:, j * sub : (j + 1) * sub]
        # seeded init from distinct sample rows; plain Lloyd
        idx = rng.choice(len(Xj), size=n_codes, replace=False)
        C = Xj[idx].copy()
        for _ in range(iters):
            d2 = ((Xj[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(n_codes):
                mask = assign == c
                if mask.any():
                    C[c] = Xj[mask].mean(axis=0)
                else:  # empty cell → reseed on the farthest point
                    C[c] = Xj[d2.min(axis=1).argmax()]
        books[j] = C
    return books


def pq_encode(
    df: DataFrame,
    codebooks,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, codes) — per-subspace nearest-codeword indices.

    codes is ``array<int>`` of length m: the 16×-compressed corpus
    representation the ADC probe scans (at 100 TB the code table is what
    fits in memory/fast storage; raw vectors stay cold).  Arrow-batched
    numpy kernel (one einsum per subspace per batch); NULL, wrong-dim,
    NULL-element, or (under ``normalize``) zero-norm vectors FAIL the
    batch loudly — the centroid_assign rejection policy, because a
    silently mis-coded row would surface as plausible-but-wrong
    neighbors."""
    import numpy as np

    B = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, sub = B.shape
    dim = m * sub
    bl = B.tolist()

    def _kernel(vs):
        import numpy as _np
        import pandas as _pd

        Bk = _np.asarray(bl)
        if vs.isna().any():
            raise ValueError("pq_encode: NULL vector")
        X = _np.array([list(v) for v in vs], dtype=_np.float64)
        if X.ndim != 2 or X.shape[1] != dim:
            raise ValueError(f"pq_encode: expected dim {dim}, got {X.shape}")
        if _np.isnan(X).any():
            raise ValueError("pq_encode: NULL/NaN element")
        if normalize:
            norms = _np.sqrt((X * X).sum(axis=1, keepdims=True))
            if (norms == 0).any():
                raise ValueError("pq_encode: zero-norm vector")
            X = X / norms
        codes = _np.empty((X.shape[0], m), dtype=_np.int32)
        for j in range(m):
            Xj = X[:, j * sub : (j + 1) * sub]
            Cj = Bk[j]
            d2 = (
                (Xj * Xj).sum(axis=1)[:, None]
                - 2.0 * Xj @ Cj.T
                + (Cj * Cj).sum(axis=1)[None, :]
            )
            codes[:, j] = d2.argmin(axis=1)
        return _pd.Series(list(codes))

    enc = F.pandas_udf(_kernel, "array<int>")
    return df.select(
        F.col(id_col).alias("id"),
        enc(F.col(vec_col)).alias("codes"),
        *[F.col(c) for c in extra_cols],
    )


def pq_adc_topk(
    codes: DataFrame,
    codebooks,
    queries: DataFrame,
    *,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    k: int = 10,
    normalize: bool = True,
) -> DataFrame:
    """Asymmetric-distance top-k: (query_id, vec_id, adc_score, rank).

    Per query the driver builds the m×n_codes lookup table of subspace
    inner products against the (normalized) query; scoring the corpus is
    then PURE COLUMN MATH — per row, m ``element_at`` picks into a
    literal LUT, summed — no UDF, no vector reads, whole-stage codegen
    over the 16×-compressed code table.  That plan shape is the entire
    point of PQ at 100 TB: the scan touches ~m bytes per vector and no
    float vectors move.  Queries are a bounded driver collect
    (:data:`MAX_DRIVER_PROBE_QUERIES` cap, like the IVF probe path);
    scores round to 6 dp pre-ranking, ties break on vec_id.  ADC scores
    approximate cosine when corpus and queries are normalized
    (recall-certified in pq1 / pinned in tests, n3-style)."""
    import numpy as np

    B = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, sub = B.shape
    qrows = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).collect()
    if len(qrows) > MAX_DRIVER_PROBE_QUERIES:
        raise ValueError(
            f"pq_adc_topk: {len(qrows)} queries exceed the driver cap "
            f"{MAX_DRIVER_PROBE_QUERIES}; batch or shard the query frame"
        )
    spark = codes.sparkSession
    dim = m * sub
    luts = []
    for r in qrows:
        # mirror the IVF probe guards: NULL / wrong-dim / NULL-element
        # queries are rejected LOUDLY, not as a shape error deep in numpy
        if r["qv"] is None or len(r["qv"]) != dim or any(
            x is None for x in r["qv"]
        ):
            raise ValueError(
                f"pq_adc_topk: NULL or non-{dim}-dim query vector at "
                f"{r['query_id']}"
            )
        q = np.asarray(list(r["qv"]), dtype=np.float64)
        if normalize:
            n = float(np.sqrt((q * q).sum()))
            if n == 0:
                raise ValueError("pq_adc_topk: zero-norm query")
            q = q / n
        lut = [
            [float(np.dot(q[j * sub : (j + 1) * sub], B[j, c])) for c in range(n_codes)]
            for j in range(m)
        ]
        luts.append((r["query_id"], lut))
    # the id type follows the QUERY frame's schema (the ADVICE r05
    # contract shared with _ivf_probes): a string-keyed query frame must
    # work here exactly as it does on the IVF paths
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        StructField,
        StructType,
    )

    qdf = spark.createDataFrame(
        luts,
        StructType(
            [
                StructField("query_id", queries.schema[query_id_col].dataType),
                StructField("lut", ArrayType(ArrayType(DoubleType()))),
            ]
        ),
    )
    score = F.round(
        sum(
            F.element_at(
                F.element_at(F.col("lut"), j + 1),
                F.element_at(F.col("codes"), j + 1) + 1,
            )
            for j in range(m)
        ),
        6,
    )
    scored = codes.crossJoin(F.broadcast(qdf)).select(
        "query_id",
        F.col("id").alias("vec_id"),
        score.alias("adc_score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_score"), F.asc("vec_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def pq_topk_rerank(
    codes: DataFrame,
    codebooks,
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    shortlist: int | None = None,
) -> DataFrame:
    """PQ probe with exact re-rank — the production IVF-PQ read path:
    ADC over the compressed code table produces a ``shortlist`` (default
    ``max(50, 5·k)``) per query, raw vectors are fetched for ONLY those
    rows (an id semi-join — at 100 TB this is the few-hundred-row random
    read per query, not a scan), and exact cosine re-ranks to the final
    top-k.  Output matches :func:`cosine_topk`'s schema/rounding/ties,
    so when the shortlist contains the true top-k the result is
    IDENTICAL to brute force (shortlist recall 1.0 measured at m=16,
    n_codes=64 on the fixture; certified with a bound in pq1)."""
    shortlist = shortlist or max(50, 5 * k)
    cand = pq_adc_topk(
        codes, codebooks, queries,
        query_id_col=query_id_col, vec_col=vec_col, k=shortlist,
    ).select("query_id", "vec_id")
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("c_vec"),
        norm_expr(F.col(vec_col)).alias("_nc"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm_expr(F.col(vec_col)).alias("_nq"),
    )
    scored = (
        # the candidate set is ≤ Q·shortlist rows (Q driver-capped) —
        # BROADCAST it so the corpus side never shuffles: unhinted, the
        # windowed cand frame has no reliable size estimate and the
        # planner can pick a sort-merge join that moves EVERY corpus
        # vector to fetch a few hundred rows (measured at the 20M
        # decade: that rerank shuffle, not the pruned code scan,
        # dominated the probe)
        c.join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(
                dot_expr(F.col("q_vec"), F.col("c_vec"))
                / (F.col("_nq") * F.col("_nc")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def ivf_pq_write(
    assigned: DataFrame,
    codebooks,
    path: str,
    *,
    mode: str = "overwrite",
    centroids=None,
) -> None:
    """The composed 100 TB index: PQ-compress the inverted lists.

    Takes :func:`ivf_build`'s assigned frame (id, v, _list), encodes each
    vector to PQ codes, and writes (id, codes) PARTITIONED BY `_list` —
    a probe then reads ``n_probe/n_lists`` of a **16×-compressed** table:
    partition pruning bounds the rows touched, PQ bounds the bytes per
    row; together the scan cost is ~``m·n_probe/n_lists`` bytes per
    corpus vector.  ``centroids`` persists the coarse quantizer under
    ``_centroids/`` (as :func:`ivf_write` does); the PQ codebooks always
    persist under ``_codebooks/`` (a store must be probe-able without the
    training session).  Raw vectors are NOT stored here — the exact
    re-rank fetches them from the caller's vector table (or a full-fat
    ivf_write store) by id."""
    import numpy as np

    if mode == "append" and centroids is not None:
        raise ValueError(
            "ivf_pq_write(mode='append') cannot rewrite the quantizer"
        )
    codes = pq_encode(
        assigned, codebooks, id_col="id", vec_col="v", extra_cols=("_list",)
    )
    # one file per list: without this, partitionBy fans every write task
    # across every list value (tasks × n_lists files — 32k files at the
    # 20M/1024-list decade, so a 32-list probe scheduled ~1024 small-file
    # tasks and task overhead dominated: measured 17.7 s → 5.6 s).  The
    # pre-write hash repartition on _list lands each list in exactly one
    # task; the shuffle moves only the 16-byte codes, once, at build time.
    codes.repartition(F.col("_list")).write.mode(mode).partitionBy(
        "_list"
    ).parquet(path)
    spark = assigned.sparkSession
    B = np.asarray(codebooks, dtype=np.float64)
    rows = [
        (j, c, [float(x) for x in B[j, c]])
        for j in range(B.shape[0])
        for c in range(B.shape[1])
    ]
    spark.createDataFrame(
        rows, "m int, code int, centroid array<double>"
    ).coalesce(1).write.mode(mode).parquet(f"{path}/_codebooks")
    if centroids is not None:
        crows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
        spark.createDataFrame(
            crows, "_list int, centroid array<double>"
        ).coalesce(1).write.mode(mode).parquet(f"{path}/_centroids")


def read_pq_codebooks(spark, path: str):
    """The persisted PQ codebooks as an (m, n_codes, sub) ndarray."""
    import numpy as np

    rows = spark.read.parquet(f"{path}/_codebooks").collect()
    m = 1 + max(r["m"] for r in rows)
    k = 1 + max(r["code"] for r in rows)
    by = {(r["m"], r["code"]): r["centroid"] for r in rows}
    return np.array([[by[(j, c)] for c in range(k)] for j in range(m)])


def ivf_pq_topk(
    spark,
    path: str,
    centroids,
    codebooks,
    corpus: DataFrame,
    queries: DataFrame,
    *,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_probe: int | None = None,
    k: int = 10,
    shortlist: int | None = None,
    store_df: DataFrame | None = None,
) -> DataFrame:
    """Probe the composed IVF-PQ store: static ``_list IN (...)`` filter
    prunes unprobed partitions at plan time (the ivf_topk_from_store
    property, pinned in tests), ADC scores the surviving 16×-compressed
    codes as pure column math against per-query lookup tables, and the
    per-query ``shortlist`` (default ``max(50, 5·k)``) re-ranks EXACTLY
    against raw vectors fetched from ``corpus`` by id semi-join.

    Queries are a bounded driver batch (≤ :data:`MAX_DRIVER_PROBE_QUERIES`
    — probe assignment and LUT construction are a few KBs per query);
    bulk frames must shard, as :func:`pq_adc_topk`.  Query→list
    assignment mirrors ``_ivf_probes`` (squared-L2 argsort, stable
    tie-break, loud NULL/wrong-dim rejection)."""
    import numpy as np

    if n_probe is None:
        n_probe = min(auto_n_probe(len(centroids)), len(centroids))
    shortlist = shortlist or max(50, 5 * k)
    B = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, sub = B.shape
    cents = np.asarray(centroids, dtype=np.float64)
    dim = cents.shape[1]
    qrows = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).collect()
    if len(qrows) > MAX_DRIVER_PROBE_QUERIES:
        raise ValueError(
            f"ivf_pq_topk: {len(qrows)} queries exceed the driver cap "
            f"{MAX_DRIVER_PROBE_QUERIES}; batch or shard the query frame"
        )
    probes = []
    for r in qrows:
        if r["qv"] is None or len(r["qv"]) != dim or any(
            x is None for x in r["qv"]
        ):
            raise ValueError(
                f"ivf_pq_topk: NULL or non-{dim}-dim query vector at "
                f"{r['query_id']}"
            )
        qv = np.asarray(list(r["qv"]), dtype=np.float64)
        nrm = float(np.sqrt((qv * qv).sum()))
        if nrm == 0:
            raise ValueError("ivf_pq_topk: zero-norm query")
        qn = qv / nrm
        lut = [
            [float(np.dot(qn[j * sub : (j + 1) * sub], B[j, c])) for c in range(n_codes)]
            for j in range(m)
        ]
        d = ((cents - qv) ** 2).sum(axis=1)
        for lst in np.argsort(d, kind="stable")[:n_probe]:
            probes.append((r["query_id"], lut, int(lst)))
    probed_lists = sorted({p[2] for p in probes})
    # id type follows the query frame's schema (ADVICE r05, as above)
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    probe_df = spark.createDataFrame(
        probes,
        StructType(
            [
                StructField("query_id", queries.schema[query_id_col].dataType),
                StructField("lut", ArrayType(ArrayType(DoubleType()))),
                StructField("_list", IntegerType()),
            ]
        ),
    )
    # ``store_df``: a pre-loaded spark.read.parquet(path) handle.  Each
    # fresh read re-runs partition discovery over n_lists directories —
    # a 1024-task listing job that DOMINATES a pruned probe at the 20M/
    # 1024-list decade (the scan itself touches ~3% of files).  Callers
    # issuing repeated probes should read once and pass the handle; the
    # static INSET filter still prunes identically (pinned in tests).
    base = store_df if store_df is not None else spark.read.parquet(path)
    store = base.where(F.col("_list").isin(probed_lists))
    score = F.round(
        sum(
            F.element_at(
                F.element_at(F.col("lut"), j + 1),
                F.element_at(F.col("codes"), j + 1) + 1,
            )
            for j in range(m)
        ),
        6,
    )
    scored = store.join(F.broadcast(probe_df), "_list").select(
        "query_id", F.col("id").alias("vec_id"), score.alias("adc_score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_score"), F.asc("vec_id")
    )
    cand = (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= shortlist)
        .select("query_id", "vec_id")
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("c_vec"),
        norm_expr(F.col(vec_col)).alias("_nc"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm_expr(F.col(vec_col)).alias("_nq"),
    )
    reranked = (
        # the candidate set is ≤ Q·shortlist rows (Q driver-capped) —
        # BROADCAST it so the corpus side never shuffles: unhinted, the
        # windowed cand frame has no reliable size estimate and the
        # planner can pick a sort-merge join that moves EVERY corpus
        # vector to fetch a few hundred rows (measured at the 20M
        # decade: that rerank shuffle, not the pruned code scan,
        # dominated the probe)
        c.join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(
                dot_expr(F.col("q_vec"), F.col("c_vec"))
                / (F.col("_nq") * F.col("_nc")),
                6,
            ).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return reranked.withColumn("rank", F.row_number().over(w2)).where(
        F.col("rank") <= k
    )


def ivf_pq_append(
    spark,
    path: str,
    new_vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental maintenance for the composed IVF-PQ store: assign the
    increment with the store's persisted coarse centroids, encode it with
    the store's persisted codebooks, append into the ``_list=K/``
    partitions it lands in — neither quantizer retrains, no existing
    partition rewrites (the :func:`ivf_append` contract, compressed).
    Probes over the grown store equal a one-shot build from the union
    (same centroids + same codebooks ⇒ same assignment + same codes;
    pinned in tests).  Growth/drift re-clustering stays a deliberate new
    ivf_build + ivf_pq_write."""
    centroids = read_ivf_centroids(spark, path)
    books = read_pq_codebooks(spark, path)
    assigned = centroid_assign(
        new_vectors, centroids, id_col=id_col, vec_col=vec_col
    )
    pq_encode(
        assigned, books, id_col="id", vec_col="v", extra_cols=("_list",)
    ).write.mode("append").partitionBy("_list").parquet(path)
