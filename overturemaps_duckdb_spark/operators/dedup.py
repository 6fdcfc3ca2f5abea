"""Deduplication operators for training-data pipelines.

Beyond-reference surface (BASELINE.json north star): exact dedup,
MinHash+LSH, SimHash, and n-gram Jaccard — each expressed with native
column functions only (no Python in the hot path) so the whole pipeline
stays in whole-stage codegen and scales to 100 TB corpora.

Scale shapes:
- exact:    hash the normalized text FIRST (128-bit two-seed key), group on
            the key — the shuffle carries 16-byte keys, not documents.
- MinHash:  signatures are computed per-row with array expressions (no
            explode), then only (band_hash → id) pairs shuffle; candidate
            verification joins tiny id-pair lists back to shingle sets.
- SimHash:  one integer per doc (default 60 bits — random hamming-0
            collisions are ~n²/2^(bits+1), so narrow widths flood buckets
            past ~10k docs); candidates = equal simhash
            (or rotate-XOR buckets for hamming>0) — a plain equi-join.
- Jaccard:  inverted-index pair join (shared shingle → pair) with counts;
            at planet scale this runs AFTER LSH banding cut candidates.

All hashes go through the engine-portable md5-prefix hash
(functions.text.md5_long) so every operator is value-checkable against a
DuckDB oracle.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from overturemaps_duckdb_spark.operators._util import (
    materialize as _materialize,
    release_materialized as _release,
)
from overturemaps_duckdb_spark.functions.text import (
    MINHASH_P,
    char_ngrams,
    hashed_shingles,
    md5_long,
    minhash_coeffs,
    normalize,
    tokens,
)

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def _content_key(text_col: str | Column) -> Column:
    """128-bit internal content identity of the normalized text: two
    independently-seeded xxhash64 halves over ONE bound normalization
    (a struct groups/joins like any key).  64 bits is not enough where
    these keys stand in for text equality at corpus scale — birthday
    collisions (~n²/2⁶⁵) silently merge distinct documents; 128 bits
    makes the chance negligible for any real corpus.

    ARGUMENT ORDER IS LOAD-BEARING for independence.  Spark's multi-arg
    xxhash64 chains left-to-right (``hash = h(child, prev_seed)``), so
    ``xxhash64(n, lit(1))`` would be ``h(1, h1)`` — a pure function of
    h1, meaning any h1 collision implies an h2 collision and the struct
    has only 64 bits of collision resistance.  With the CONSTANT FIRST,
    ``xxhash64(lit(1), n)`` = ``h(n, seed=h(1, 42))`` — the same text
    hashed under a different effective seed, genuinely independent of
    h1, giving the full ~2⁻¹²⁸ pairwise collision odds.  xxhash64 of a
    NULL child passes the seed through unchanged, so NULL texts still
    yield a constant (h1 = 42, h2 = h(1, 42)) on both halves and compare
    equal (the IS NOT DISTINCT FROM convention corpus_diff documents)."""
    n = normalize(text_col)
    return F.struct(
        F.xxhash64(n).alias("h1"), F.xxhash64(F.lit(1), n).alias("h2")
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the lowest-id representative per exact (normalized) text.

    ONE shuffle, no sort: ``min_by(struct(row), id)`` per 128-bit content
    key.  Unlike the earlier window-rank form (which shuffles EVERY row to
    its hash partition and sorts there), min_by partially aggregates
    map-side — on a heavily-duplicated corpus the shuffle carries ~one row
    per (hash, input partition), not the corpus.  ``id`` is unique, so the
    winner is deterministic.

    The grouping hash is internal (never reaches the output — the oracle
    groups by the normalized text itself), so it uses xxhash64 instead of
    the engine-portable 60-bit md5 prefix the value-checked operators
    need — WIDENED to a 128-bit two-seed key (:func:`_content_key`): at
    the stated corpus scale (billions of docs) 64-bit birthday collisions
    are expected (~n²/2⁶⁵) and a collision here silently DROPS a
    non-duplicate document; at 2⁻¹²⁸ the risk is gone for any corpus."""
    cols = df.columns
    keyed = df.withColumn("_h", _content_key(text_col))
    agg = keyed.groupBy("_h").agg(
        F.min_by(F.struct(*cols), F.col(id_col)).alias("_r")
    )
    return agg.select(*[F.col(f"_r.{c}").alias(c) for c in cols])


def dup_rate_report(
    df: DataFrame, id_col: str, text_col: str, stratum_col: str
) -> DataFrame:
    """Per-stratum exact-duplication telemetry — the corpus-health report a
    dedup stage emits (and the number that decides whether a source even
    NEEDS the expensive near-dup pass): docs, distinct normalized texts,
    duplicate count/rate, and the largest duplicate group.

    Scale shape: two map-side-combinable shuffles on small keys — (stratum,
    128-bit content key) counts first (the shuffle carries ~one row per
    group per input partition, never documents), then one row per distinct
    text into the per-stratum rollup.  Like :func:`exact_dedup`, the
    grouping hash is internal (xxhash64 over the normalized text; the
    oracle groups by the normalized text itself)."""
    g = df.groupBy(
        F.col(stratum_col),
        _content_key(text_col).alias("_h"),
    ).agg(F.count("*").alias("_n"))
    n_docs = F.sum("_n")
    n_distinct = F.count("*")
    return g.groupBy(stratum_col).agg(
        n_docs.cast("bigint").alias("n_docs"),
        n_distinct.cast("bigint").alias("n_distinct"),
        (n_docs - n_distinct).cast("bigint").alias("n_dup_docs"),
        F.round(
            (n_docs.cast("double") - n_distinct) / n_docs, 6
        ).alias("dup_rate"),
        F.max("_n").cast("bigint").alias("max_group"),
    )


def corpus_diff(
    old: DataFrame, new: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Snapshot diff between two corpus versions — the change manifest an
    incremental pipeline consumes (recrawl vs previous crawl: which docs
    are added / removed / changed / unchanged, so downstream stages touch
    only the delta instead of reprocessing the corpus).

    Shape: each side reduces to (id, 128-bit content key) at scan — the
    full-outer join shuffles 24 bytes per row, never text; the status is a
    null-pattern/compare CASE.  Returns (id, status) with status in
    {'added', 'removed', 'changed', 'unchanged'}.  Content identity is the
    normalized text (same convention as :func:`exact_dedup`; whitespace/
    case/punctuation churn is not a change; xxhash64 skips NULL inputs, so
    a NULL text on both sides compares 'unchanged' — the null-safe
    equality an oracle states as IS NOT DISTINCT FROM)."""
    o = old.select(
        F.col(id_col).alias("id"), _content_key(text_col).alias("_ho")
    )
    n = new.select(
        F.col(id_col).alias("id"), _content_key(text_col).alias("_hn")
    )
    joined = o.join(n, "id", "full_outer")
    status = (
        F.when(F.col("_ho").isNull(), F.lit("added"))
        .when(F.col("_hn").isNull(), F.lit("removed"))
        .when(F.col("_ho") == F.col("_hn"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select("id", status.alias("status"))


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_dist: int = 1,
    collapse_exact: bool = True,
    group_cap: int | None = 1000,
) -> DataFrame:
    """Edit-distance-1 near-identical pairs via deletion-neighborhood
    blocking (the SymSpell guarantee: two strings within Levenshtein
    distance 1 share at least one member of {self} ∪ {single-deletion
    variants}) — fuzzy record linkage for short keys (names, titles,
    normalized entities) without an O(N²) cross product.

    Shape: each string expands to len+1 variants (explode — rows carry
    (variant, id)); candidate generation is an equi-join on the variant
    string; candidates dedupe on BARE id pairs before the name-carrying
    join-back (repo discipline: payloads never ride the pair expansion);
    the exact Levenshtein verify runs once per distinct pair.  Only
    ``max_dist=1`` is supported — deeper neighborhoods grow
    combinatorially; at scale distance >1 routes through the n-gram /
    MinHash family instead.

    ``collapse_exact`` (default on, same policy as the MinHash/embedding
    family): identical strings group FIRST, the blocking/verify pipeline
    runs once per DISTINCT string, and member pairs fan back out at the
    end — intra-group pairs are distance 0 by definition, cross pairs
    inherit the representative distance.  On a 10×-duplicated corpus
    every variant bucket would otherwise be 10× denser (100× the
    candidate pairs): measured 258 s → ~7 s at the sf1 fixture, output
    identical UP TO ``group_cap``: a string duplicated more than
    ``group_cap`` times keeps only its first ``group_cap`` members
    (deterministic min-id order; drops surface via the
    ``fuzzy_group_cap`` Observation, never silently) — the same hot-key
    guard as ``bucket_cap`` in the MinHash family.  Pass
    ``group_cap=None`` for exact completeness on corpora known to have
    no pathological duplication.  NULL texts never pair
    (Levenshtein(NULL, ·) is NULL).

    Returns (a_id, b_id, dist) with a_id < b_id, dist ≤ max_dist."""
    if max_dist != 1:
        raise ValueError("fuzzy_pairs supports max_dist=1 only (see docstring)")
    s = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("s")).where(
        F.col("s").isNotNull()
    )
    groups = None
    if collapse_exact:
        groups = _exact_groups(
            s, "s", group_cap=group_cap, obs_name="fuzzy_group_cap"
        )
        s = groups.select(F.element_at("gids", 1).alias("id"), "s")
    deletions = F.transform(
        F.sequence(F.lit(1), F.length("s")),
        lambda i: F.concat(
            F.col("s").substr(F.lit(1), i - 1),
            F.col("s").substr(i + 1, F.length("s")),
        ),
    )
    # empty strings have no deletions (sequence(1,0) would count DOWN);
    # NULL strings produce a NULL variant array — explode drops the row
    all_variants = F.when(
        F.length("s") > 0,
        F.array_distinct(F.concat(F.array(F.col("s")), deletions)),
    ).otherwise(F.array(F.col("s")))
    variants = s.select("id", F.explode(all_variants).alias("v"))
    a = variants.select(F.col("id").alias("a_id"), "v")
    b = variants.select(F.col("id").alias("b_id"), "v")
    cand = (
        a.join(b, "v")
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    sa = s.select(F.col("id").alias("a_id"), F.col("s").alias("_sa"))
    sb = s.select(F.col("id").alias("b_id"), F.col("s").alias("_sb"))
    rep_pairs = (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn("dist", F.levenshtein("_sa", "_sb"))
        .where(F.col("dist") <= max_dist)
        .select("a_id", "b_id", "dist")
    )
    if groups is None:
        return rep_pairs
    intra = _explode_ordered_pairs(
        groups.where(F.size("gids") > 1), "gids", []
    ).select("a_id", "b_id", F.lit(0).alias("dist"))
    cross = _fanout_members(
        rep_pairs, groups, groups, ["dist"], normalize_order=True
    )
    return intra.unionByName(cross)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(
    text: str | Column, *, n_hashes: int = 16, shingle_k: int = 5
) -> Column:
    """array<bigint> MinHash signature — per seed, the min universal-hash
    over the doc's distinct shingle hashes; pure array expressions.

    Cost shape: md5 once per shingle (hashed_shingles), then one
    multiply-add-mod per (shingle, seed) — 16 seeds cost ~16 int ops per
    shingle instead of 16 md5-of-string evaluations."""
    return minhash_signature_from_hashes(
        hashed_shingles(text, shingle_k), n_hashes=n_hashes
    )


def minhash_signature_from_hashes(hs: Column, *, n_hashes: int = 16) -> Column:
    """Per-seed array_min over universal hashes of the shingle-hash array.

    ``hs`` is bound ONCE via an outer 1-element transform before the
    n_hashes inner transforms reference it: each inner transform's array
    argument is then a lambda variable (a slot read), not the ``hs``
    expression tree — passing a raw ``hashed_shingles(text)`` expression
    would otherwise re-evaluate the full normalize+shingle+md5 chain once
    PER SEED (the NOTES HOF trap; measured 65 s → 10.9 s for a bare
    full-corpus signature pass over sf0.1 documents; the residual over
    the ~3 s shingle-hash pass is the 16 per-seed array traversals).
    Arithmetic unchanged — bit-identical signatures."""
    a_list, b_list = minhash_coeffs(n_hashes)

    def mix(a: int, b: int):
        # factory keeps the lambda arity-1 (Spark binds the array index to a
        # second parameter)
        return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)

    def sig(bound: Column) -> Column:
        return F.array(
            *[
                F.array_min(F.transform(bound, mix(a_list[i], b_list[i])))
                for i in range(n_hashes)
            ]
        )

    return F.element_at(F.transform(F.array(hs), sig), 1)


def minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_hashes: int = 16,
    shingle_k: int = 5,
    stop_df_cap: int | None = None,
    assume_wide: bool = False,
) -> DataFrame:
    """The persisted per-doc MinHash index: (id, shingles, _m0.._m{n-1}).

    Shingle hashing is LINEAR in document length: the char-code array is
    materialized once per doc (`split` + one `transform`), then the k-term
    rolling polynomial is a chain of `zip_with`s over k shifted `slice`s of
    that array — every element is touched O(k) times.  The naive
    per-position ``ascii(substring(_n, i+j, 1))`` formulation is O(n²):
    Spark's UTF8String.substring walks from the string start to find the
    char offset, so each of the n positions pays an O(n) scan (measured
    2.7× slower at ~300-char fixture docs; the gap grows linearly with
    doc length).  Zero-padding the array by k-1 reproduces
    ascii-of-past-end = 0, so hash values are bit-identical to the
    positional form (and to the DuckDB oracle).  min() over duplicate
    shingle hashes equals min over the distinct set, so no per-doc dedup
    is needed before the signature aggregates.

    Shape (r14, guide §2.4): the index is a pure PROJECTION — shingle set
    via ``array_distinct``, each signature min via ``array_min`` over a
    per-seed ``transform`` of the hash array bound ONCE as a real column
    (`_hs` is expensive and multiply-referenced, so CollapseProject keeps
    it in its own Project instead of inlining the chain per seed; pinned
    by test_plan_shapes).  The previous form exploded every shingle hash
    into rows and re-aggregated by id — a whole Exchange + two
    ObjectHashAggregates (4.8 MB shuffle write and 25 s of task-run at
    sf0.1; at 100 TB a full corpus-sized shuffle of partial shingle sets)
    for values a per-row expression computes in place.  Verified
    row-identical on the d2 reps frame (4992 rows, exceptAll both ways =
    0).  Docs with NULL text are filtered — the explode form emitted no
    rows for them (explode of a null array), so this is value-neutral —
    and ids are assumed unique per doc, as everywhere in the family.

    The explode+aggregate form survives only for ``stop_df_cap``, whose
    document-frequency pass genuinely needs the exploded rows.  At 100 TB
    the index is written to parquet instead of session-persisted."""
    from overturemaps_duckdb_spark.functions.text import (
        MINHASH_BASE_BITS,
        SHINGLE_B,
        normalize,
    )

    # one tiny shuffle of the doc rows so the exploded hash computation and
    # its persist run on all cores (single-file sources arrive 1-partition).
    # GUARDED like build_fts_index/hot_spans (r13): the collapse_exact
    # callers feed the post-groupBy representative frame, which is already
    # at full shuffle width — repartitioning it again was a second full
    # shuffle of the normalized text (plus the keyless repartition's
    # sort-before-repartition pass) for zero parallelism gain, one whole
    # Exchange+stage per d2/d8/sp1 call (r13 plan read: Exchange(22) in
    # plans/r13/d2_minhash_lsh_pairs_before.txt).  At 100 TB the scan
    # arrives wider than the core count and the guard is a no-op either
    # way.
    # ``assume_wide``: the collapse_exact callers KNOW their input is the
    # post-groupBy representative frame (already at full shuffle width) —
    # they skip the probe entirely, because ``df.rdd`` is not free: it
    # runs the frame's whole analysis/optimization/physical-planning
    # pipeline driver-side (measured ~1.1 s of d2's plan construction on
    # the cached-groups lineage, the largest single driver-side cost in
    # the query).  AQE caveat (ADVICE r13): coalescePartitions can shrink
    # a SMALL aggregate output below the core count, so "full shuffle
    # width" is an upper bound — for the collapse callers the coalesced
    # width still tracks the data volume (AQE only merges sub-advisory-
    # size partitions, i.e. exactly the inputs where narrow is fine), and
    # correctness is unaffected either way.
    if not assume_wide:
        spread = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < spread:
            df = df.repartition(spread)
    norm_df = df.select(
        F.col(id_col).alias("id"), normalize(text_col).alias("_n")
    )
    count = F.greatest(F.length("_n") - F.lit(shingle_k - 1), F.lit(1))
    weights = [SHINGLE_B ** (shingle_k - 1 - j) for j in range(shingle_k)]
    # char-code array, zero-padded so slices past the end read 0 — bound as
    # a real column so each slice references it instead of recomputing it
    arr = (
        "concat(transform(split(_n, ''), c -> CAST(ascii(c) AS BIGINT)), "
        f"array_repeat(0L, {shingle_k - 1}))"
    )
    zw = (
        f"zip_with(slice(_arr, 1, _cnt), slice(_arr, 2, _cnt), "
        f"(a, b) -> a * {weights[0]}L + b * {weights[1]}L)"
    )
    for j in range(2, shingle_k):
        zw = (
            f"zip_with({zw}, slice(_arr, {j + 1}, _cnt), "
            f"(a, c) -> a + c * {weights[j]}L)"
        )
    hs = f"transform({zw}, x -> x % {1 << MINHASH_BASE_BITS}L)"
    a_list, b_list = minhash_coeffs(n_hashes)
    if stop_df_cap is None:
        # whole projection as selectExpr strings (r14, VERDICT r13 #7):
        # the Column-API form spent ~0.3 s of d2's plan construction on
        # py4j round trips for the 16 transform/array_min towers; each
        # selectExpr ships ONE string the JVM parses.  Arithmetic is the
        # same bigint multiply-add-mod — values bit-identical.
        return (
            norm_df.where(F.col("_n").isNotNull())
            .selectExpr(
                "id",
                f"greatest(length(_n) - {shingle_k - 1}, 1) AS _cnt",
                f"{arr} AS _arr",
            )
            .selectExpr("id", f"{hs} AS _hs")
            .selectExpr(
                "id",
                "array_distinct(_hs) AS shingles",
                *[
                    f"array_min(transform(_hs, h -> (h * {a_list[i]}L"
                    f" + {b_list[i]}L) % {MINHASH_P}L)) AS _m{i}"
                    for i in range(n_hashes)
                ],
            )
            .persist()
        )
    ex = (
        norm_df.withColumn("_cnt", count)
        .withColumn("_arr", F.expr(arr))
        .select("id", F.explode(F.expr(hs)).alias("h"))
    )
    # stop-shingle removal: df per shingle over distinct (id, h), keep
    # only shingles under the cap — one extra shuffle on the 8-byte hash
    keep = (
        ex.distinct()
        .groupBy("h")
        .agg(F.count("*").alias("_df"))
        .where(F.col("_df") <= stop_df_cap)
        .select("h")
    )
    ex = ex.join(keep, "h")
    return (
        ex.groupBy("id")
        .agg(
            F.collect_set("h").alias("shingles"),
            *[
                F.min((F.col("h") * a_list[i] + b_list[i]) % MINHASH_P).alias(f"_m{i}")
                for i in range(n_hashes)
            ],
        )
        .persist()
    )


def band_keys(
    index: DataFrame, *, n_hashes: int, bands: int, keep_sig: bool = False
) -> DataFrame:
    """(id, bkey) — one 64-bit xxhash64 band key per band over the signature
    slice: long join keys instead of md5 hex strings.  Only the bucket
    GROUPING matters, not the hash value, so this buckets identically to an
    md5-banding oracle absent hash collisions.

    ``keep_sig=True`` additionally carries the full signature array on every
    banded row (n_hashes longs — ~128 B at the default 16) so downstream
    bucket grouping can run the signature-agreement pre-verify gate inline,
    without joining back to the index."""
    if n_hashes % bands:
        # a non-dividing band count silently ignored the signature tail
        # (16 hashes / 3 bands banded positions 1..15 and dropped #16) —
        # candidate recall quietly differed from the documented
        # r = n_hashes/bands banding, and the DuckDB oracle's seed//rows
        # grouping would form a DIFFERENT partial band
        raise ValueError(
            f"bands ({bands}) must divide n_hashes ({n_hashes})"
        )
    rows = n_hashes // bands
    # selectExpr strings (r14): one parsed string instead of ~40 py4j
    # calls for the array/xxhash64/slice towers; identical expressions.
    sig = index.selectExpr(
        "id",
        "array(" + ", ".join(f"_m{i}" for i in range(n_hashes)) + ") AS sig",
    )
    cols = ["id", "sig"] if keep_sig else ["id"]
    band_arr = ", ".join(
        f"xxhash64({bi}, slice(sig, {bi * rows + 1}, {rows}))"
        for bi in range(bands)
    )
    return sig.selectExpr(*cols, f"explode(array({band_arr})) AS bkey")


def _sig_gate_k(
    jaccard_threshold: float, margin: float | None, n_hashes: int, bands: int
) -> int | None:
    """Matching-hash count the signature pre-verify gate requires, or None
    when the gate is disabled / vacuous.

    est = matches/n_hashes is an unbiased MinHash estimate of the true
    Jaccard, so requiring ``matches ≥ ceil((threshold − margin)·n_hashes)``
    drops candidates whose estimate sits more than `margin` below the
    threshold BEFORE the shingle-carrying exact-verify join.  Every banding
    candidate already matches one full band (n_hashes/bands rows), so a gate
    at or below that count can never fire — return None and skip the work."""
    if margin is None:
        return None
    k = math.ceil(round((jaccard_threshold - margin) * n_hashes, 9))
    return k if k > n_hashes // bands else None


def _sig_matches(a_sig: Column, b_sig: Column) -> Column:
    """Number of positions where two equal-length signature arrays agree."""
    return F.aggregate(
        F.zip_with(a_sig, b_sig, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )


# ---------------------------------------------------------------------------
# exact-duplicate collapse machinery (shared by the text + vector families)
# ---------------------------------------------------------------------------


def _exact_groups(
    keyed: DataFrame,
    value_col: str,
    *,
    group_cap: int | None,
    obs_name: str,
) -> DataFrame:
    """(value_col, gids) — one row per DISTINCT value, member ids sorted.

    `group_cap` bounds the fan-out exactly like `bucket_cap` bounds hot
    band buckets: a value duplicated millions of times would otherwise
    expand C(n,2) intra pairs inside one array value (and n×m cross pairs
    per rep pair).  The sorted gids list is truncated to the first cap
    members and the drop is counted via ``DataFrame.observe`` (exposed on
    ``_exact_groups.last_cap_observations[obs_name]``) — never silent.
    Fixture-scale groups sit far below the default caps.

    The returned frame is session-persisted: it feeds the rep pipeline,
    the intra expansion and the fan-out map (same policy as
    `minhash_index`'s persist — released by Spark's LRU / context cleaner
    when the plan objects go out of scope)."""
    groups = keyed.groupBy(value_col).agg(
        F.sort_array(F.collect_set("id")).alias("gids")
    )
    if group_cap is not None:
        from pyspark.sql import Observation

        obs = Observation(obs_name)
        groups = groups.observe(
            obs,
            F.coalesce(
                F.sum(F.greatest(F.size("gids") - group_cap, F.lit(0))), F.lit(0)
            ).alias("dropped_ids"),
            F.coalesce(
                F.sum((F.size("gids") > group_cap).cast("long")), F.lit(0)
            ).alias("capped_groups"),
        ).withColumn("gids", F.slice("gids", 1, group_cap))
        if not hasattr(_exact_groups, "last_cap_observations"):
            _exact_groups.last_cap_observations = {}
        _exact_groups.last_cap_observations[obs_name] = obs
    return groups.persist()


def _ordered_pair_structs(ids: Column) -> Column:
    """array<struct<a_id,b_id>> of all ordered pairs from a sorted id
    array — the in-group / in-bucket expansion HOF.

    Reference construction only (tests pin the streamed form against it):
    materializing the C(n,2) pair array inside ONE array value is the
    r8-measured 79× slowdown at 1000-member groups — use
    :func:`_explode_ordered_pairs` in any executed path."""
    return F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), F.size(ids)),
                lambda y: F.struct(x.alias("a_id"), y.alias("b_id")),
            ),
        )
    )


def _explode_ordered_pairs(
    df: DataFrame, ids_col: str, payload: list[str]
) -> DataFrame:
    """All ordered (a_id, b_id) pairs from each row's sorted id array,
    streamed as a two-stage posexplode + tail-slice explode.

    Output-identical to ``F.explode(_ordered_pair_structs(ids))`` but the
    largest intermediate array is the member list itself, never the
    C(n,2) pair array: at the 1000-member group/bucket caps that array is
    ~500k structs built and GC'd per row, and generating the 2M-vector
    fixture's 999M intra pairs took 69 s through it vs 0.9 s through this
    shape (measured r8; the struct construction happens in a non-codegen
    HOF lambda, the explode chain stays in codegen).  ``payload`` columns
    must already exist on ``df`` and are carried through per pair."""
    return (
        df.selectExpr(
            f"{ids_col} AS _ids",
            *payload,
            f"posexplode({ids_col}) AS (_pi, a_id)",
        ).selectExpr(
            "a_id",
            "explode(slice(_ids, _pi + 2, size(_ids))) AS b_id",
            *payload,
        )
    )


def _fanout_members(
    rep_pairs: DataFrame,
    groups_a: DataFrame,
    groups_b: DataFrame,
    payload: list[str],
    *,
    normalize_order: bool,
) -> DataFrame:
    """Expand representative pairs to member pairs through the two group
    maps.  `normalize_order=True` re-normalizes a_id < b_id (self-pair
    families); False preserves side identity (cross-corpus)."""
    ga = groups_a.selectExpr("element_at(gids, 1) AS a_id", "gids AS a_gids")
    gb = groups_b.selectExpr("element_at(gids, 1) AS b_id", "gids AS b_gids")
    out = (
        rep_pairs.join(ga, "a_id")
        .join(gb, "b_id")
        .selectExpr("explode(a_gids) AS _xa", "b_gids", *payload)
        .selectExpr("_xa", "explode(b_gids) AS _xb", *payload)
    )
    if normalize_order:
        return out.selectExpr(
            "least(_xa, _xb) AS a_id",
            "greatest(_xa, _xb) AS b_id",
            *payload,
        )
    return out.selectExpr("_xa AS a_id", "_xb AS b_id", *payload)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
    stop_df_cap: int | None = None,
    bucket_cap: int | None = 1000,
    sig_gate_margin: float | None = 0.0625,
    collapse_exact: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding, verified with exact
    shingle-set Jaccard.

    LSH: split the signature into `bands` bands of `n_hashes/bands` rows;
    docs sharing any band hash are candidates (banded equi-join — the only
    shuffle is on (band_idx, band_hash)).  Candidates are then verified
    exactly, so the output is threshold-exact (LSH affects recall only;
    the verification join keeps precision 1.0).

    `stop_df_cap`: drop shingles whose document frequency exceeds the cap
    BEFORE signatures/sets are built — boilerplate shingles shared by a
    large fraction of a web-scale corpus otherwise glue unrelated docs into
    the same bands (candidate blowup) and inflate Jaccard.  Signatures and
    the verify sets see the same capped universe, so results stay
    self-consistent; None (default) disables the extra df pass.

    `bucket_cap`: hard guard on in-bucket membership — one boilerplate band
    key shared by millions of docs would otherwise `collect_set` into a
    single multi-GB row (and a quadratic pair expansion) on one task.  The
    sorted id list is truncated to the first `bucket_cap` members; the drop
    is NOT silent — it is counted via `DataFrame.observe` (no extra job)
    and exposed on ``minhash_lsh_pairs.last_cap_observation`` after the
    first action.  Fixture-scale buckets are far below the default, so
    capped and uncapped results coincide there (pinned in
    tests/test_dedup_cap.py); a genuinely hot bucket is boilerplate glue
    whose pairs the Jaccard verify would mostly reject anyway — the right
    structural fix for those corpora is `stop_df_cap`.

    `sig_gate_margin`: signature-agreement pre-verify gate — candidates
    whose full-signature MinHash estimate falls below
    ``jaccard_threshold − margin`` are dropped during the in-bucket pair
    expansion, BEFORE the exact-verify join that carries both docs' full
    shingle arrays.  The estimate is computed inline from the signatures
    already present in the bucket (zero extra joins, 16 int compares per
    raw pair).  On a 10×-duplicated 50k-doc corpus this cut the verify
    join's input 5× (2.6 M → 0.53 M candidates; every true ≥ 0.5 pair
    there agreed on ≥ 12/16 hashes while 88 % of in-bucket junk sat below
    7/16).  The default margin of 1/16 bounds the recall cost: a pair at
    exactly the threshold is mis-dropped only when its unbiased estimate
    lands > 1 hash short (≈ 2 % at t = 0.5, n = 16, one band guaranteed).
    None disables the gate (pure banding+verify semantics).

    `collapse_exact`: run the shingle/signature/banding pipeline once per
    DISTINCT normalized text instead of once per document — identical
    texts have identical shingle sets, so every intra-group pair is a
    Jaccard-1.0 output and every cross-group doc pair inherits its
    representatives' Jaccard verbatim.  Grouping is on the normalized text
    VALUE itself (no hash, no collision caveat).  Output is row-for-row
    identical to the per-document pipeline absent a binding cap:
    ``bucket_cap`` bounds BOTH the band buckets (distinct texts per
    bucket) and each exact-dup group's member list (`_exact_groups` —
    a text duplicated millions of times would otherwise expand C(n,2)
    intra pairs inside one array value); drops are observe()-counted,
    never silent.  Web-scale corpora are 30–60 % exact duplicates, so
    this removes the duplicated fraction from the O(corpus) shingling
    cost AND shrinks every bucket quadratic; on the 10×-duplicated scale
    fixture it cuts the whole operator ~5×.  Disabled automatically with
    ``stop_df_cap`` (document frequencies are per-document by definition).
    """
    if collapse_exact and stop_df_cap is None:
        norm_df = df.select(
            F.col(id_col).alias("id"), normalize(text_col).alias("_n")
        ).where(F.col("_n").isNotNull())
        groups = _exact_groups(
            norm_df, "_n", group_cap=bucket_cap, obs_name="minhash_group_cap"
        )
        reps = groups.select(F.element_at("gids", 1).alias("id"), "_n")
        index = minhash_index(
            reps, "id", "_n", n_hashes=n_hashes, shingle_k=shingle_k,
            assume_wide=True,  # reps is the post-groupBy frame
        )
        rep_pairs = _self_pairs_from_index(
            index, n_hashes=n_hashes, bands=bands,
            jaccard_threshold=jaccard_threshold, bucket_cap=bucket_cap,
            sig_gate_margin=sig_gate_margin,
        )
        # intra-group: every pair of docs sharing a normalized text is an
        # exact duplicate — Jaccard 1.0 by definition, no verify needed
        intra = _explode_ordered_pairs(
            groups.where("size(gids) > 1"), "gids", []
        ).selectExpr("a_id", "b_id", "1.0D AS jaccard")
        if jaccard_threshold > 1.0:
            intra = intra.where(F.lit(False))
        # cross-group: representative pairs fan back out to member ids —
        # the expansion only materializes output rows (id pair + score)
        cross = _fanout_members(
            rep_pairs, groups, groups, ["jaccard"], normalize_order=True
        )
        if bucket_cap is not None:
            minhash_lsh_pairs.last_cap_observation = (
                _self_pairs_from_index.last_cap_observation
            )
        return intra.unionByName(cross)
    index = minhash_index(
        df, id_col, text_col,
        n_hashes=n_hashes, shingle_k=shingle_k, stop_df_cap=stop_df_cap,
    )
    out = _self_pairs_from_index(
        index, n_hashes=n_hashes, bands=bands,
        jaccard_threshold=jaccard_threshold, bucket_cap=bucket_cap,
        sig_gate_margin=sig_gate_margin,
    )
    if bucket_cap is not None:
        minhash_lsh_pairs.last_cap_observation = (
            _self_pairs_from_index.last_cap_observation
        )
    return out


def _self_pairs_from_index(
    index: DataFrame,
    *,
    n_hashes: int,
    bands: int,
    jaccard_threshold: float,
    bucket_cap: int | None,
    sig_gate_margin: float | None = 0.0625,
) -> DataFrame:
    """In-corpus near-dup pairs from an existing MinHash index frame —
    the bucket-grouped pair expansion + exact verify of
    :func:`minhash_lsh_pairs`, reusable over a persisted index (see
    :func:`incremental_minhash_pairs`)."""
    gate_k = _sig_gate_k(jaccard_threshold, sig_gate_margin, n_hashes, bands)
    hs = index.select("id", "shingles")
    banded = band_keys(
        index, n_hashes=n_hashes, bands=bands, keep_sig=gate_k is not None
    )
    # ONE shuffle forms the buckets; the old banded SELF-join shuffled both
    # sides and re-shuffled for a mid-chain candidate distinct (each extra
    # exchange is a blocking AQE stage).  In-bucket pair expansion is a
    # sorted-combinations HOF (quadratic per bucket — identical cost shape
    # to the self-join, which was also quadratic per bucket); multi-band
    # duplicate pairs are deduped at the END on the tiny verified output.
    # When the signature gate is on, bucket members carry (id, sig) structs
    # (sort_array orders by the unique id — the leading struct field — so
    # membership order, and hence the bucket_cap truncation, is unchanged)
    # and the pair expansion computes the agreement estimate inline,
    # filtering the pair array BEFORE it is ever exploded into rows.
    member = (
        F.struct(F.col("id"), F.col("sig")) if gate_k is not None else F.col("id")
    )
    buckets = (
        banded.groupBy("bkey")
        .agg(F.sort_array(F.collect_set(member)).alias("ids"))
        .where(F.size("ids") > 1)
    )
    if bucket_cap is not None:
        from pyspark.sql import Observation

        obs = Observation("lsh_bucket_cap")
        buckets = buckets.observe(
            obs,
            F.coalesce(
                F.sum(F.greatest(F.size("ids") - bucket_cap, F.lit(0))), F.lit(0)
            ).alias("dropped_ids"),
            F.coalesce(
                F.sum((F.size("ids") > bucket_cap).cast("long")), F.lit(0)
            ).alias("capped_buckets"),
        ).withColumn("ids", F.slice("ids", 1, bucket_cap))
        # recorded on this helper's OWN attribute: callers copy it onto
        # their documented telemetry names — writing minhash_lsh_pairs'
        # attribute from here cross-wired incremental_minhash_pairs'
        # new-vs-new drops onto the wrong function (r8 review fix)
        _self_pairs_from_index.last_cap_observation = obs
    # Pair expansion streams through the two-stage posexplode + tail-slice
    # shape (_explode_ordered_pairs): the old form materialized the whole
    # C(n,2) pair array inside one array value per bucket — ~500k structs
    # per row at bucket_cap=1000, the r8-measured 79× slowdown.  With the
    # signature gate on, the agreement estimate is still computed and
    # filtered per pair BEFORE the shingle-carrying verify join — the gate
    # semantics are unchanged, only the array materialization is gone.
    if gate_k is not None:
        staged = buckets.selectExpr(
            "ids AS _ids", "posexplode(ids) AS (_pi, _ma)"
        ).selectExpr(
            "_ma", "explode(slice(_ids, _pi + 2, size(_ids))) AS _mb"
        )
        cand = staged.where(
            f"aggregate(zip_with(_ma.sig, _mb.sig,"
            f" (x, y) -> CAST(x = y AS INT)), 0, (acc, v) -> acc + v)"
            f" >= {gate_k}"
        ).selectExpr("_ma.id AS a_id", "_mb.id AS b_id")
    else:
        cand = _explode_ordered_pairs(buckets, "ids", []).select("a_id", "b_id")
    # Dedup multi-band duplicate candidates BEFORE the verify join, not
    # after: a near-dup pair typically collides in several bands (an exact
    # dup in all of them), and the verify join carries both docs' full
    # shingle arrays — kilobytes per row — so each duplicate candidate
    # multiplies the one genuinely heavy shuffle.  The distinct here moves
    # only 16-byte id pairs (measured at a 10×-duplicated sf1 corpus:
    # 56 s → 30 s for d2; at the unique-doc sf0.1 the extra exchange is
    # noise — 3.48 s vs 3.50 s).
    cand = cand.distinct()
    return _verify_jaccard(cand, hs, jaccard_threshold)


def _verify_jaccard(cand: DataFrame, sig: DataFrame, threshold: float) -> DataFrame:
    return _verify_jaccard_two(cand, sig, sig, threshold)


def _verify_jaccard_two(
    cand: DataFrame, sig_a: DataFrame, sig_b: DataFrame, threshold: float
) -> DataFrame:
    """Exact shingle-Jaccard verification of (a_id, b_id) candidates, with
    each side's shingle sets drawn from its OWN index — the single
    implementation every LSH family member routes through (self pairs,
    cross-corpus, incremental; r8 review fix: three inlined copies had to
    be kept in lockstep by hand)."""
    a = sig_a.selectExpr("id AS a_id", "shingles AS a_sh")
    b = sig_b.selectExpr("id AS b_id", "shingles AS b_sh")
    return (
        cand.join(a, "a_id")
        .join(b, "b_id")
        .selectExpr(
            "a_id",
            "b_id",
            "round(CAST(size(array_intersect(a_sh, b_sh)) AS DOUBLE)"
            " / CAST(size(array_union(a_sh, b_sh)) AS DOUBLE), 6) AS jaccard",
        )
        # `D` suffix: parse the threshold as a DOUBLE literal outright —
        # bit-identical to the old Column form's Python-float lit()
        .where(f"jaccard >= {threshold!r}D")
    )


def cross_corpus_minhash_pairs(
    corpus: DataFrame,
    probe: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
    sig_gate_margin: float | None = 0.0625,
    collapse_exact: bool = True,
) -> DataFrame:
    """A×B near-duplicate pairs: which training-corpus docs near-match a
    held-out/benchmark set — LSH-bucketed decontamination for when the
    benchmark side is itself too large to broadcast (the n-gram broadcast
    path in operators/textprep.ngram_decontaminate covers the small-probe
    case; this covers probe sets that are corpora in their own right).

    `collapse_exact` (see :func:`minhash_lsh_pairs`): each side's
    exact-duplicate texts collapse to one representative before
    shingling/banding, and (rep_a, rep_b) result pairs fan back out to
    |G_a|×|G_b| member pairs at the end — side identity preserved, scores
    inherited verbatim.  Output-equivalent (group member lists capped at
    1000 like every hot-set guard, drops observe()-counted); a
    d×-duplicated pair of corpora sheds d² from the band-join candidate
    volume.

    Both sides get independent MinHash indexes (same hash family, so equal
    texts produce equal band keys), then candidates come from ONE equi-join
    on the 64-bit band key — each side shuffles once on an 8-byte key, no
    A×B blowup, no broadcast of either corpus.  Exact shingle-set Jaccard
    verifies every candidate, so precision is 1.0 at the threshold; banding
    controls recall exactly as in the self-join case.

    `sig_gate_margin` (see :func:`minhash_lsh_pairs`): the band-key join
    carries both sides' full signatures (n_hashes longs each) so the
    agreement gate runs on the join output itself — candidates estimated
    below ``threshold − margin`` never reach the distinct or the
    shingle-carrying verify join.

    Returns (a_id from corpus, b_id from probe, jaccard) — ids may coincide
    numerically across the two corpora; they are namespaced by side.
    """
    gate_k = _sig_gate_k(jaccard_threshold, sig_gate_margin, n_hashes, bands)
    groups_a = groups_b = None
    if collapse_exact:
        def _side_groups(side: DataFrame, tag: str):
            norm_df = side.select(
                F.col(id_col).alias("id"), normalize(text_col).alias("_n")
            ).where(F.col("_n").isNotNull())
            return _exact_groups(
                norm_df, "_n", group_cap=1000, obs_name=f"cross_group_cap_{tag}"
            )

        groups_a = _side_groups(corpus, "a")
        groups_b = _side_groups(probe, "b")
        corpus = groups_a.select(F.element_at("gids", 1).alias(id_col), F.col("_n").alias(text_col))
        probe = groups_b.select(F.element_at("gids", 1).alias(id_col), F.col("_n").alias(text_col))
    idx_a = minhash_index(
        corpus, id_col, text_col, n_hashes=n_hashes, shingle_k=shingle_k,
        assume_wide=collapse_exact,  # collapse feeds post-groupBy frames
    )
    idx_b = minhash_index(
        probe, id_col, text_col, n_hashes=n_hashes, shingle_k=shingle_k,
        assume_wide=collapse_exact,
    )
    keep = gate_k is not None
    ba = band_keys(idx_a, n_hashes=n_hashes, bands=bands, keep_sig=keep).select(
        F.col("id").alias("a_id"),
        *([F.col("sig").alias("a_sig")] if keep else []),
        "bkey",
    )
    bb = band_keys(idx_b, n_hashes=n_hashes, bands=bands, keep_sig=keep).select(
        F.col("id").alias("b_id"),
        *([F.col("sig").alias("b_sig")] if keep else []),
        "bkey",
    )
    # multi-band duplicates collapse BEFORE the (heavier) verify join — the
    # candidate list is tiny relative to the corpora, so this distinct is a
    # small-key shuffle, not a corpus shuffle
    cand = ba.join(bb, "bkey")
    if keep:
        cand = cand.where(_sig_matches(F.col("a_sig"), F.col("b_sig")) >= gate_k)
    cand = cand.select("a_id", "b_id").distinct()
    rep_pairs = _verify_jaccard_two(cand, idx_a, idx_b, jaccard_threshold)
    if groups_a is None:
        return rep_pairs
    # fan (rep_a, rep_b) back out to member pairs — sides stay namespaced
    # (a ids always from corpus, b ids always from probe; no least/greatest)
    return _fanout_members(
        rep_pairs, groups_a, groups_b, ["jaccard"], normalize_order=False
    )


# ---------------------------------------------------------------------------
# Incremental MinHash index maintenance (append-only corpora)
# ---------------------------------------------------------------------------


def write_minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    *,
    n_hashes: int = 16,
    shingle_k: int = 5,
    mode: str = "append",
) -> None:
    """Materialize the per-doc MinHash index as a parquet TABLE — the
    100 TB form (minhash_index's session persist is the dev form).  The
    index is ~(16 longs + shingle set) per doc: a tiny fraction of corpus
    bytes, and the only thing incremental dedup ever re-reads."""
    idx = minhash_index(df, id_col, text_col, n_hashes=n_hashes, shingle_k=shingle_k)
    idx.write.mode(mode).parquet(path)
    idx.unpersist()


def incremental_minhash_pairs(
    spark,
    index_path: str,
    new_docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
    bucket_cap: int | None = 1000,
    update_index: bool = True,
    sig_gate_margin: float | None = 0.0625,
) -> DataFrame:
    """Near-dup pairs for an INCREMENTAL ingest batch against an append-only
    corpus: index only the new docs, emit every pair the batch introduces,
    and append the batch's index rows to the store.

    At 100 TB an ingest increment must not re-read (let alone re-shingle)
    the corpus: the corpus side here is its persisted index — band keys are
    recomputed from the 16 signature longs per doc (cheap), text is never
    touched.  Two candidate sources, both bucketed equi-joins:

    - new×corpus: band_keys(store) ⋈ band_keys(new) on the 64-bit band key
      (exactly the cross-corpus shape, no broadcast of either side);
    - new×new: the standard in-bucket expansion over the batch alone.

    Pair ids are normalized a_id < b_id, so the UNION of emitted pairs
    across all increments equals a full :func:`minhash_lsh_pairs` rebuild
    of the final corpus (pinned in tests/test_incremental_minhash.py) —
    assuming globally unique doc ids (dedup-at-the-door, i6, is upstream's
    job), no ``stop_df_cap`` (document frequencies are corpus-global, so
    df-capping is a rebuild-only concept), and ``bucket_cap`` never binding
    (a capped hot band key drops candidates on both paths; the rebuild and
    the increments may then drop *different* ones, exactly as two rebuilds
    with different row orders would).

    ``bucket_cap`` guards BOTH candidate sources: the new×new in-bucket
    expansion (as in the rebuild) and the old×new band-key join, where one
    hot band key would otherwise contribute |old_bucket|×|new_bucket| join
    rows.  Each join side keeps its first ``bucket_cap`` members per band
    key (sorted by id — deterministic); drops are counted via
    ``DataFrame.observe`` on ``incremental_minhash_pairs.last_cap_observations``.

    Returns (a_id, b_id, jaccard); with ``update_index=False`` the store is
    left untouched (dry-run / what-if mode).
    """
    gate_k = _sig_gate_k(jaccard_threshold, sig_gate_margin, n_hashes, bands)
    keep = gate_k is not None
    new_idx = minhash_index(
        new_docs, id_col, text_col, n_hashes=n_hashes, shingle_k=shingle_k
    )
    new_new = _self_pairs_from_index(
        new_idx, n_hashes=n_hashes, bands=bands,
        jaccard_threshold=jaccard_threshold, bucket_cap=bucket_cap,
        sig_gate_margin=sig_gate_margin,
    )
    # telemetry starts FRESH each call (stale handles from a previous call
    # leaked through the store-missing path) and includes the new-vs-new
    # side's observation, as the docstring promises
    incremental_minhash_pairs.last_cap_observations = (
        [_self_pairs_from_index.last_cap_observation]
        if bucket_cap is not None
        else []
    )
    # Hadoop FS check, not os.path.exists: the persisted index is the
    # operator's 100 TB form and lives on whatever filesystem the session
    # uses — a local-only check treated an existing hdfs://... or s3a://...
    # store as ABSENT, silently skipping every new-vs-corpus pair and (with
    # update_index=True) OVERWRITING the whole index with this one batch.
    _jpath = spark._jvm.org.apache.hadoop.fs.Path(index_path)
    _jfs = _jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    store_exists = _jfs.exists(_jpath)
    if store_exists:
        old_idx = spark.read.parquet(index_path)
        bo = band_keys(old_idx, n_hashes=n_hashes, bands=bands, keep_sig=keep).select(
            F.col("id").alias("a_id"),
            *([F.col("sig").alias("a_sig")] if keep else []),
            "bkey",
        )
        bn = band_keys(new_idx, n_hashes=n_hashes, bands=bands, keep_sig=keep).select(
            F.col("id").alias("b_id"),
            *([F.col("sig").alias("b_sig")] if keep else []),
            "bkey",
        )
        if bucket_cap is not None:
            from pyspark.sql import Observation, Window

            # per-band-key membership cap on BOTH join sides — the window's
            # hash partitioning on bkey is the join's own distribution, so
            # the cap adds no extra exchange
            obs_pairs = []
            capped = []
            for frame, side in ((bo, "a_id"), (bn, "b_id")):
                rn = F.row_number().over(
                    Window.partitionBy("bkey").orderBy(side)
                )
                obs = Observation(f"incr_band_cap_{side}")
                frame = (
                    frame.withColumn("_rn", rn)
                    .observe(
                        obs,
                        F.coalesce(
                            F.sum((F.col("_rn") > bucket_cap).cast("long")),
                            F.lit(0),
                        ).alias("dropped_ids"),
                    )
                    .where(F.col("_rn") <= bucket_cap)
                    .drop("_rn")
                )
                obs_pairs.append(obs)
                capped.append(frame)
            bo, bn = capped
            incremental_minhash_pairs.last_cap_observations.extend(obs_pairs)
        cand = bo.join(bn, "bkey")
        if keep:
            cand = cand.where(
                _sig_matches(F.col("a_sig"), F.col("b_sig")) >= gate_k
            )
        cand = cand.select("a_id", "b_id").distinct()
        cross = _verify_jaccard_two(
            cand, old_idx, new_idx, jaccard_threshold
        ).select(
            F.least("a_id", "b_id").alias("a_id"),
            F.greatest("a_id", "b_id").alias("b_id"),
            "jaccard",
        )
        pairs = new_new.unionByName(cross)
    else:
        pairs = new_new
    if update_index:
        # pairs must be computed BEFORE the append lands, and Spark plans
        # are lazy — materialize them first so the new rows aren't seen
        # twice through the store read
        pairs = _materialize(pairs, eager=True)
        new_idx.write.mode("append" if store_exists else "overwrite").parquet(
            index_path
        )
    new_idx.unpersist()
    return pairs


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, inverted-index pair join)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 5,
    threshold: float = 0.5,
    stop_df_cap: int | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs: explode distinct shingles to an inverted
    index, count shared shingles per pair, |A∪B| = |A|+|B|−|A∩B|.

    The pair-generation join shuffles on shingle — at 100 TB this runs after
    LSH banding (see minhash_lsh_pairs); `stop_df_cap` additionally drops
    shingles with document frequency above the cap from CANDIDATE GENERATION
    only (a shingle in k docs contributes k² join rows — one boilerplate
    shingle across a corpus is a cartesian product).  Capped candidates are
    then verified against the FULL shingle sets, so every reported jaccard
    stays exact; only pairs whose overlap is exclusively hot shingles are
    missed (bounded recall loss, zero precision loss)."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(char_ngrams(text_col, shingle_k))).alias("s"),
    )
    if stop_df_cap is not None:
        keep = (
            sh.groupBy("s")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") <= stop_df_cap)
            .select("s")
        )
        cand = (
            sh.join(keep, "s")
            .alias("a")
            .join(sh.join(keep, "s").alias("b"), "s")
            .where(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
            .distinct()
        )
        sets = sh.groupBy("id").agg(F.collect_set("s").alias("shingles"))
        return _verify_jaccard(cand, sets, threshold)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("id").alias("a_id"), "s")
    b = sh.select(F.col("id").alias("b_id"), "s")
    inter = (
        a.join(b, ["s"])
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("c"))
    )
    na = sizes.select(F.col("id").alias("a_id"), F.col("n").alias("na"))
    nb = sizes.select(F.col("id").alias("b_id"), F.col("n").alias("nb"))
    jac = F.round(
        F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c")), 6
    )
    return (
        inter.join(na, "a_id")
        .join(nb, "b_id")
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def _containment_joined(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int,
    stop_df_cap: int | None,
) -> DataFrame:
    """Exact pairwise overlap frame ``(a_id, b_id, c, na, nb)`` over the
    shingle inverted index — shared core of the containment family."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(char_ngrams(text_col, shingle_k))).alias("s"),
    )
    if stop_df_cap is not None:
        keep = (
            sh.groupBy("s")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") <= stop_df_cap)
            .select("s")
        )
        capped = sh.join(keep, "s")
        cand = (
            capped.alias("a")
            .join(capped.alias("b"), "s")
            .where(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
            .distinct()
        )
        sets = sh.groupBy("id").agg(F.collect_set("s").alias("shingles"))
        a = sets.select(F.col("id").alias("a_id"), F.col("shingles").alias("a_sh"))
        b = sets.select(F.col("id").alias("b_id"), F.col("shingles").alias("b_sh"))
        return (
            cand.join(a, "a_id")
            .join(b, "b_id")
            .select(
                "a_id",
                "b_id",
                F.size(F.array_intersect("a_sh", "b_sh")).alias("c"),
                F.size("a_sh").alias("na"),
                F.size("b_sh").alias("nb"),
            )
        )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    inter = (
        sh.select(F.col("id").alias("a_id"), "s")
        .join(sh.select(F.col("id").alias("b_id"), "s"), ["s"])
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("c"))
    )
    return inter.join(
        sizes.select(F.col("id").alias("a_id"), F.col("n").alias("na")), "a_id"
    ).join(sizes.select(F.col("id").alias("b_id"), F.col("n").alias("nb")), "b_id")


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 5,
    threshold: float = 0.8,
    stop_df_cap: int | None = None,
    collapse_exact: bool = True,
    group_cap: int | None = 1000,
) -> DataFrame:
    """Asymmetric near-dup pairs by shingle CONTAINMENT
    ``|A∩B| / min(|A|,|B|)`` — the quote/subset detector (Broder's
    containment; what Dolma-style pipelines use where Jaccard goes blind:
    a paragraph verbatim inside a 100× longer page has tiny Jaccard but
    containment ≈ 1).

    Returns ``(a_id, b_id, containment, contained_id)`` for pairs ≥
    ``threshold`` — ``contained_id`` is the smaller-shingle-set side (the
    doc that is mostly inside the other; tie → smaller id), the id a
    pipeline would route to review/removal.

    Same inverted-index shape as :func:`ngram_jaccard_pairs` (this is the
    verification tier — at 100 TB candidates come from LSH banding
    first); ``stop_df_cap`` drops corpus-hot shingles from CANDIDATE
    GENERATION only, then verifies against the full sets, so reported
    containment stays exact (bounded recall loss, zero precision loss —
    and note the cap bites harder here than for Jaccard: a contained
    QUOTE is often exactly the boilerplate a df-cap drops).

    ``collapse_exact`` (default on, the d2/d5 policy): the index runs
    once per DISTINCT normalized text — identical texts have identical
    shingle sets, so intra-group pairs are containment-1.0 outputs
    (contained_id → tie rule) and cross-group member pairs inherit their
    representatives' value, with contained_id resolved per member from
    the representative SIDE (sizes are a group invariant).  Web-scale
    corpora are 30–60 % exact duplicates, and duplication multiplies the
    inverted-index join quadratically (df² rows per shingle), so the
    collapse is what keeps the verification tier viable on a duplicated
    corpus; ``group_cap`` bounds a single text duplicated millions of
    times (observe()-counted drops, never silent).  Row-identical to the
    per-document path absent a binding cap (CI-pinned).  Disabled
    automatically with ``stop_df_cap`` (document frequencies are
    per-document by definition)."""
    cont = F.round(
        F.col("c").cast("double") / F.least("na", "nb").cast("double"), 6
    )
    if collapse_exact and stop_df_cap is None:
        norm_df = df.select(
            F.col(id_col).alias("id"), normalize(text_col).alias("_n")
        ).where(F.col("_n").isNotNull())
        groups = _exact_groups(
            norm_df, "_n", group_cap=group_cap, obs_name="containment_group_cap"
        )
        reps = groups.select(F.element_at("gids", 1).alias("id"), "_n")
        side = (
            F.when(F.col("na") < F.col("nb"), F.lit("a"))
            .when(F.col("nb") < F.col("na"), F.lit("b"))
            .otherwise(F.lit("t"))
        )
        rep_pairs = (
            _containment_joined(reps, "id", "_n", shingle_k=shingle_k, stop_df_cap=None)
            .withColumn("containment", cont)
            .where(F.col("containment") >= threshold)
            .select("a_id", "b_id", "containment", side.alias("_cs"))
        )
        intra = _explode_ordered_pairs(groups.where(F.size("gids") > 1), "gids", []).select(
            "a_id",
            "b_id",
            F.lit(1.0).alias("containment"),
            F.col("a_id").alias("contained_id"),
        )
        if threshold > 1.0:
            intra = intra.where(F.lit(False))
        raw = _fanout_members(
            rep_pairs, groups, groups, ["containment", "_cs"], normalize_order=False
        )
        cross = raw.select(
            F.least("a_id", "b_id").alias("a_id"),
            F.greatest("a_id", "b_id").alias("b_id"),
            "containment",
            F.when(F.col("_cs") == "a", F.col("a_id"))
            .when(F.col("_cs") == "b", F.col("b_id"))
            .otherwise(F.least("a_id", "b_id"))
            .alias("contained_id"),
        )
        return intra.unionByName(cross)
    joined = _containment_joined(
        df, id_col, text_col, shingle_k=shingle_k, stop_df_cap=stop_df_cap
    )
    contained = (
        F.when(F.col("na") < F.col("nb"), F.col("a_id"))
        .when(F.col("nb") < F.col("na"), F.col("b_id"))
        .otherwise(F.least("a_id", "b_id"))
    )
    return (
        joined.withColumn("containment", cont)
        .where(F.col("containment") >= threshold)
        .select("a_id", "b_id", "containment", contained.alias("contained_id"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(text: str | Column, *, bits: int = 60) -> Column:
    """`bits`-wide SimHash over distinct tokens: bit i is set iff the count
    of token-hashes with bit i set exceeds half the token count.

    WIDTH IS A SCALE PARAMETER (r10, same class as the IVF n_lists
    default): the hamming-0 bucket join merges any two docs whose hashes
    collide, and expected RANDOM collisions are ~n²/2^(bits+1) — at 16
    bits that is ≈1 already at ~10k docs and floods the buckets with
    unrelated pairs by ~1M.  The default is now the full width of the
    engine-portable 60-bit md5 prefix (`md5_long`), which keeps expected
    random hamming-0 collisions below 1 up to ~10⁹ docs; narrow widths
    remain available for coarser tiers (the certified d3 query passes
    bits=16 — its fixture-scale contract — and a 60-bit hash's buckets
    always REFINE a 16-bit hash's: bit i is computed identically, so
    equal-60 implies equal-16; pinned in tests)."""
    toks = F.array_distinct(tokens(text))
    hashes = F.transform(toks, md5_long)
    n = F.size(toks)
    def bit_set(i: int):
        # arity-1 lambda: a 2-arg lambda would make Spark bind the array
        # index Column to the second parameter
        return lambda h: F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1

    out = F.lit(0).cast("bigint")
    for i in range(bits):
        ones = F.size(F.filter(hashes, bit_set(i)))
        out = out + F.when(ones * 2 > n, F.lit(1 << i).cast("bigint")).otherwise(F.lit(0))
    return out


def simhash_dedup_buckets(
    df: DataFrame, id_col: str, text_col: str, *, bits: int = 60
) -> DataFrame:
    """(simhash, sorted member ids) buckets — exact-equal simhash grouping,
    the hamming-0 tier of simhash dedup (rotations give hamming>0 tiers).
    Default width is the scale-safe 60 bits (see :func:`simhash` — a
    16-bit hash's buckets fill with random collisions past ~10k docs);
    the certified d3 query passes bits=16 explicitly.

    Shape: explode token hashes → per-doc conditional-sum aggregates (one
    per bit, all whole-stage codegen with map-side combine) → weighted-bit
    reassembly → groupBy(simhash).  Same values as the array-expression
    :func:`simhash`, minus 16 interpreted filter passes per row."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(tokens(text_col)).alias("toks"),
    )
    ex = toks.select("id", F.explode("toks").alias("tok")).withColumn(
        "h", md5_long(F.col("tok"))
    )
    per_doc = ex.groupBy("id").agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.shiftright("h", i).bitwiseAND(F.lit(1))).alias(f"_o{i}")
            for i in range(bits)
        ],
    )
    sim = F.lit(0).cast("bigint")
    for i in range(bits):
        sim = sim + F.when(
            F.col(f"_o{i}") * 2 > F.col("n"), F.lit(1 << i).cast("bigint")
        ).otherwise(F.lit(0))
    h = per_doc.select("id", sim.alias("simhash"))
    return (
        h.groupBy("simhash")
        .agg(
            F.count("*").alias("n_docs"),
            F.array_join(F.sort_array(F.collect_list(F.col("id").cast("string"))), ",").alias(
                "member_ids"
            ),
        )
    )


# ---------------------------------------------------------------------------
# embedding near-dup (cosine over an embedding column)
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    threshold: float = 0.95,
    exact: bool = False,
    n_bands: int = 8,
    planes_per_band: int = 4,
    dim: int = 64,
    collapse_exact: bool = True,
) -> DataFrame:
    """(a_id, b_id, cosine) for pairs with cosine ≥ threshold.

    Default path is banded hyperplane LSH + exact cosine verify: candidate
    generation is an equi-join on (band, bucket) — shuffles small int keys,
    never broadcasts the corpus, never evaluates N² pairs.  The verify step
    keeps precision exact (output ⊆ the brute-force result; LSH affects
    recall only, 1-(1-p^r)^b per pair — ~0.98 at cosine 0.8 with the
    defaults, →1 for tighter dups).  `exact=True` opts into the old
    broadcast all-pairs form for small corpora.

    Scale shapes (both r4; each output-equivalent, pinned in tests):

    - Candidates are deduped on BARE id pairs before any vector-carrying
      join: the (band, bucket) equi-join emits 16-byte rows, `distinct`
      collapses multi-band duplicates, and only surviving pairs join back
      to the two vectors.  The prior shape (vectors carried through the
      candidate join into a groupBy(a_id, b_id) first() agg) shuffled
      ~candidates × 2×dim×8 B — a 100 GB shuffle on a 10×-duplicated
      200 k-vector corpus, where this one moves ~1.6 GB.
    - `collapse_exact`: bit-identical vectors are grouped first (one
      GROUP BY on the vector value), LSH runs once per distinct vector,
      and member pairs fan back out at the end — intra-group pairs score
      cosine(v, v) (1.0 for any normal vector; zero-norm/NaN vectors drop
      exactly as the per-document path drops them) and cross-group pairs
      inherit their representatives' cosine verbatim.  A corpus duplicated
      d× sheds d² from every bucket quadratic.
    """
    from overturemaps_duckdb_spark.operators.similarity import (
        banded_signature_frame,
        cosine_expr,
    )

    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if exact:
        a = v.select(F.col("id").alias("a_id"), F.col("v").alias("a_v"))
        b = v.select(F.col("id").alias("b_id"), F.col("v").alias("b_v"))
        pairs = a.join(F.broadcast(b), F.col("a_id") < F.col("b_id"))
        cos = F.round(cosine_expr(F.col("a_v"), F.col("b_v")), 6)
        return (
            pairs.withColumn("cosine", cos)
            .where(F.col("cosine") >= threshold)
            .select("a_id", "b_id", "cosine")
        )

    groups = None
    if collapse_exact:
        groups = _exact_groups(
            v, "v", group_cap=1000, obs_name="embedding_group_cap"
        )
        v = groups.select(F.element_at("gids", 1).alias("id"), "v")
    sig = banded_signature_frame(
        v,
        id_col="id",
        vec_col="v",
        n_bands=n_bands,
        planes_per_band=planes_per_band,
        dim=dim,
    )
    ka = sig.select(F.col("id").alias("a_id"), "band", "bucket")
    kb = sig.select(F.col("id").alias("b_id"), "band", "bucket")
    cand = (
        ka.join(kb, ["band", "bucket"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    # norms precomputed once per distinct vector, not once per pair — the
    # fold order is identical so the cosine value is bit-for-bit the same,
    # but the per-pair HOF work drops from 3 array traversals to 1 (the dot)
    from overturemaps_duckdb_spark.operators.similarity import dot_expr, norm_expr

    av = v.select(
        F.col("id").alias("a_id"),
        F.col("v").alias("a_v"),
        norm_expr(F.col("v")).alias("_na"),
    )
    bv = v.select(
        F.col("id").alias("b_id"),
        F.col("v").alias("b_v"),
        norm_expr(F.col("v")).alias("_nb"),
    )
    pairs = cand.join(av, "a_id").join(bv, "b_id")
    cos = F.round(
        dot_expr(F.col("a_v"), F.col("b_v")) / (F.col("_na") * F.col("_nb")), 6
    )
    rep_pairs = (
        pairs.withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("a_id", "b_id", "cosine")
    )
    if groups is None:
        return rep_pairs
    # intra-group: identical vectors — score computed, not assumed, so
    # zero-norm/NaN vectors drop exactly like the per-document path
    intra = _explode_ordered_pairs(
        groups.where(F.size("gids") > 1)
        .withColumn("cosine", F.round(cosine_expr(F.col("v"), F.col("v")), 6))
        .where(F.col("cosine") >= threshold),
        "gids",
        ["cosine"],
    ).select("a_id", "b_id", "cosine")
    cross = _fanout_members(
        rep_pairs, groups, groups, ["cosine"], normalize_order=True
    )
    return intra.unionByName(cross)


def dedup_clusters(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    *,
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over near-dup pairs: (id, cluster_id) where
    cluster_id is the minimum document id reachable through the pair graph
    — the cluster-assignment table a dedup pipeline actually consumes
    (keep the representative ``id == cluster_id`` row, drop the rest).

    Boruvka-style supervertex contraction (r12 — replaced the r8-r11
    min-label loop, whose round count was O(graph diameter): a templated-
    spam chain of 10k near-identical docs would have blown max_iter):

    1. HOOK: every active vertex points at ``p(u) = min(N(u) ∪ {u})`` —
       one groupBy on the edge endpoints.  Pointers strictly decrease, so
       the pointer graph is a forest rooted at local minima.
    2. JUMP: ``p ← p(p)`` until fixpoint — pointer doubling on a PARENT
       forest (where it provably halves depth per round, unlike
       composing min-LABELS, which does not double reach — caught by the
       union-find differential in tests/test_dedup_collapse_gate.py).
    3. CONTRACT: rewrite edges to (root(u), root(v)), drop self-loops,
       dedupe; fold the root map into the running assignment.
    Repeat until no inter-supervertex edge remains — O(log n) outer
    rounds × O(log depth) jumps; a 200-link chain finishes in ONE outer
    round (~8 jump rounds), where min-label needed 200.

    The global component minimum never hooks to anything (no smaller
    neighbor exists), so the surviving supervertex id IS the component
    min — same output contract as before, re-certified against the
    DuckDB recursive-CTE oracle and a driver-side union-find.

    The loop runs on the EDGE-TOUCHED SUBGRAPH only (VERDICT r11 #6):
    a document in no near-dup pair can never change label, and at corpus
    scale isolated documents are the overwhelming majority — the r8-r11
    loop shuffled the whole corpus once per round for nothing.  Isolated
    ids re-attach at the end as their own cluster (one left join against
    the small cluster map — broadcast where stats allow).

    Iterative DataFrame algorithms grow lineage exponentially, so every
    step is checkpoint-cut (operators/_util.materialize: reliable
    ``checkpoint()`` when the session has a checkpoint dir — configure
    one on a long-lived 1000-executor job to survive executor loss —
    else ``localCheckpoint``).  Convergence probes move one scalar per
    step to the driver, never the labels.

    Ids keep their OWN type (r8 review fix): min/least only need an
    ORDERABLE id, so string/UUID keys work unchanged.

    Ref: the reference has no clustering op (its dedup surface stops at
    DISTINCT, src/lib/analysisQueries.js:50-52); this extends the LLM-
    pipeline dedup family (SURVEY §2 extension) from pair detection to the
    assignment artifact.
    """
    acol, bcol = pairs.columns[0], pairs.columns[1]
    fwd = pairs.select(F.col(acol).alias("u"), F.col(bcol).alias("v"))
    # Contract guard (review): cluster_id must always be a DOCUMENT id —
    # a stale/superset pair table referencing ids absent from ``df`` must
    # not leak those ids in as cluster labels (the consumer's "keep the
    # id == cluster_id row" rule would then drop the whole cluster).  The
    # r8-r11 loop got this for free by seeding labels from df; here the
    # edge set is semi-joined against the corpus ids once, up front —
    # strictly cheaper than the old per-round restriction.
    ids = df.select(F.col(id_col).alias("_did"))
    fwd = (
        fwd.join(ids, fwd["u"] == ids["_did"], "left_semi")
        .join(ids, fwd["v"] == ids["_did"], "left_semi")
    )
    edges = _materialize(
        fwd.unionAll(
            fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).where(F.col("u") != F.col("v")).distinct(),
        eager=True,
    )
    # running assignment for every edge-touched vertex (symmetric edges ⇒
    # selecting u covers both endpoints)
    assign = _materialize(
        edges.select("u").distinct().select(
            F.col("u").alias("id"), F.col("u").alias("sv")
        ),
        eager=True,
    )
    # converged ⇔ no inter-supervertex edge remains.  Checked BEFORE the
    # loop (empty pair input) and after EVERY contraction — checking only
    # at the top of the next iteration raised a spurious non-convergence
    # error when contraction finished in exactly max_iter rounds (review).
    converged = edges.isEmpty()
    for _ in range(max_iter):
        if converged:
            break
        # 1. hook: p(u) = min(N(u) ∪ {u}) — strictly decreasing pointers
        par = _materialize(
            edges.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select(
                F.col("u").alias("id"),
                F.least(F.col("u"), F.col("_mn")).alias("p"),
            ),
            eager=True,
        )
        # 2. jump: p ← p(p) until fixpoint (true doubling on the forest;
        # 64 rounds bounds depth 2^64 — unreachable).  Every superseded
        # checkpoint is RELEASED as soon as its successor is materialized
        # (ADVICE r12): localCheckpoint blocks are otherwise pinned in
        # executor storage until driver GC, one dead frame per round for
        # the whole closure.
        # `par_ckpt` tracks the CHECKPOINTED frame behind `par`: release
        # must target the materialized frame itself — `nxt.drop("_chg")`
        # analyzes as a Project over the LogicalRDD, which the release
        # helper correctly refuses to touch (pinned by the leak test).
        par_ckpt = par
        for _ in range(64):
            pmap = par.select(
                F.col("id").alias("_i2"), F.col("p").alias("_p2")
            )
            hopped = F.coalesce(F.col("_p2"), F.col("p"))
            nxt = par.join(pmap, par["p"] == pmap["_i2"], "left").select(
                "id",
                hopped.alias("p"),
                (hopped != par["p"]).cast("long").alias("_chg"),
            )
            nxt = _materialize(nxt, eager=True)
            jumped = nxt.agg(F.sum("_chg")).collect()[0][0] or 0
            _release(par_ckpt)  # superseded by nxt (materialized above)
            par_ckpt = nxt
            par = nxt.drop("_chg")
            if jumped == 0:
                break
        # 3. contract: fold roots into the assignment, rewrite the edges
        root = par.select(F.col("id").alias("_ri"), F.col("p").alias("_rp"))
        prev_assign = assign
        assign = _materialize(
            assign.join(root, assign["sv"] == root["_ri"], "left").select(
                "id", F.coalesce(F.col("_rp"), F.col("sv")).alias("sv")
            ),
            eager=True,
        )
        _release(prev_assign)
        ru = root.select(F.col("_ri").alias("u"), F.col("_rp").alias("_ur"))
        rv = root.select(F.col("_ri").alias("v"), F.col("_rp").alias("_vr"))
        prev_edges = edges
        edges = _materialize(
            edges.join(ru, "u").join(rv, "v")
            .select(F.col("_ur").alias("u"), F.col("_vr").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct(),
            eager=True,
        )
        _release(prev_edges)
        # assign + edges are materialized — this round's par is dead
        _release(par_ckpt)
        converged = edges.isEmpty()
    if not converged:
        # silent non-convergence hands the caller WRONG clusters (one true
        # cluster split across labels) — fail loudly.  Needs MORE than
        # max_iter contraction rounds, i.e. components nested deeper than
        # ~2^max_iter supervertex layers: unreachable for physical data.
        raise RuntimeError(
            f"dedup_clusters did not converge in max_iter={max_iter} "
            "contraction rounds; raise max_iter"
        )
    # re-attach the isolated documents (never entered the loop): their
    # cluster is themselves.  One left join; the cluster table is tiny
    # relative to the corpus, so AQE broadcasts it where stats allow.
    sub = assign.select(
        F.col("id").alias("_cid"), F.col("sv").alias("_comp")
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(sub, F.col("id") == F.col("_cid"), "left")
        .select(
            "id", F.coalesce(F.col("_comp"), F.col("id")).alias("cluster_id")
        )
    )


def canonical_per_cluster(
    df: DataFrame,
    id_col: str,
    clusters: DataFrame,
    quality_col: str,
) -> DataFrame:
    """Pick the document a dedup pipeline KEEPS from each near-dup cluster:
    the highest-``quality_col`` member (ties broken by smallest id), plus the
    cluster size — the artifact consumed by the corpus-write stage (keep the
    canonical row, drop the other members, log n_members for audit).

    One shuffle on cluster_id: the quality join rides the same hash
    partitioning as the window rank, so Catalyst plans a single Exchange;
    the rank-1 filter is the standard distributed argmax (no driver-side
    state, no collect).  Output: (cluster_id, keep_id, keep_quality,
    n_members).

    Ref: extends d6's assignment (the reference's dedup surface stops at
    DISTINCT, src/lib/analysisQueries.js:50-52) to the selection step."""
    from pyspark.sql import Window

    # id keeps its own type (see dedup_clusters): cast('long') NULLed
    # string/UUID ids and the quality join dropped every row
    q = df.select(
        F.col(id_col).alias("_qid"), F.col(quality_col).alias("_q")
    )
    joined = clusters.join(q, clusters["id"] == q["_qid"]).select(
        "cluster_id", "id", "_q"
    )
    w = Window.partitionBy("cluster_id")
    ranked = joined.select(
        "cluster_id",
        "id",
        "_q",
        F.row_number()
        .over(w.orderBy(F.desc("_q"), F.asc("id")))
        .alias("_rn"),
        F.count("*").over(w).alias("n_members"),
    )
    return ranked.where(F.col("_rn") == 1).select(
        "cluster_id",
        F.col("id").alias("keep_id"),
        F.col("_q").alias("keep_quality"),
        F.col("n_members").cast("bigint").alias("n_members"),
    )
