"""Training-corpus text preparation: decontamination, repetition signals,
sliding-window chunking.

Beyond-reference surface (the reference's text handling stops at FTS/ILIKE,
`/root/reference/src/lib/fts.js`): these are the standard pre-training
pipeline stages between raw documents and tokenization —

- **decontamination**: drop/flag training documents sharing any verbatim
  token n-gram with an evaluation benchmark (the GPT-3/Llama 8-13-gram
  collision test).  Scale shape: the benchmark side is tiny relative to the
  corpus, so its distinct-gram set BROADCASTS and the corpus never
  shuffles — contamination check is a map-side semi/inner join.
- **repetition signals**: Gopher-style within-document duplication ratios
  (duplicate token / 2-gram / 3-gram fractions) — pure array expressions,
  whole-stage codegen, no shuffle at all.
- **chunking**: overlapping fixed-width character windows (the training-
  sample segmentation pass) — explode over a computed start sequence; output
  rows stay co-partitioned with their source document.

All three are value-checkable against DuckDB list-function oracles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from overturemaps_duckdb_spark.functions.text import tokens


def token_ngrams(toks: Column, n: int) -> Column:
    """array<string> of space-joined token n-grams over a BOUND tokens
    column (bind `toks` via select/withColumn first — an inlined expression
    would re-evaluate per element, NOTES.md HOF gotcha).  Documents shorter
    than `n` tokens yield their single whole-document gram."""
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )


def ngram_decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 8,
) -> DataFrame:
    """(id, n_hit_grams) for training documents sharing ≥1 verbatim token
    n-gram with the benchmark corpus — the contamination flag list a
    training pipeline joins back to drop/quarantine documents.

    Plan shape: the benchmark's distinct grams are exploded and broadcast
    (eval sets are a few thousand documents even when the corpus is 100 TB);
    the corpus side explodes per-document distinct grams and inner-joins
    map-side — the corpus is never shuffled and never re-scanned.  The
    groupBy(id) count shuffles only the (rare) hit rows.
    """
    # The empty gram is excluded on BOTH sides: token_ngrams' whole-doc
    # fallback turns a zero-token document (punctuation-only text
    # normalizes to '') into the gram '' — one such bench row would
    # otherwise flag EVERY empty-normalized training doc as contaminated
    # despite sharing no actual n-gram (the oracle states the same
    # exclusion).
    tg = (
        train.select(F.col(id_col).alias("id"), tokens(text_col).alias("_tk"))
        .select("id", F.explode(F.array_distinct(token_ngrams(F.col("_tk"), n))).alias("gram"))
        .where(F.col("gram") != "")
    )
    bg = (
        bench.select(tokens(text_col).alias("_tk"))
        .select(F.explode(token_ngrams(F.col("_tk"), n)).alias("gram"))
        .where(F.col("gram") != "")
        .distinct()
    )
    return (
        tg.join(F.broadcast(bg), "gram")
        .groupBy("id")
        .agg(F.count("*").alias("n_hit_grams"))
    )


def cross_corpus_containment(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Per-pair contamination attribution: ``(a_id train, b_id bench,
    containment, n_shared)`` where ``containment`` is the fraction of the
    BENCHMARK doc's distinct token ``n``-grams verbatim inside the train
    doc — the asymmetric completion of :func:`ngram_decontaminate` (which
    flags train docs but not WHICH benchmark item leaked or HOW MUCH of
    it).  A benchmark question quoted whole inside a long page scores
    1.0 there even though the pair's Jaccard is tiny — which is also why
    this does NOT ride the d8 MinHash banding (jaccard-recall banding
    structurally misses containment pairs).

    Plan shape: the benchmark's (b_id, gram-hash) index broadcasts (eval
    sets stay small at any corpus scale) WITH its per-doc set sizes; the
    corpus explodes per-doc distinct grams map-side, hashes them to
    60-bit keys (text never shuffles — the d9/x4 policy, hash applied
    identically in the oracle so the value is defined over the hashed
    gram space), and inner-joins without shuffling.  Only hit rows reach
    the pair aggregation.  The empty gram is excluded on both sides (the
    ngram_decontaminate contract)."""
    from overturemaps_duckdb_spark.functions.text import md5_long

    tg = (
        train.select(F.col(id_col).alias("a_id"), tokens(text_col).alias("_tk"))
        .select(
            "a_id",
            F.explode(F.array_distinct(token_ngrams(F.col("_tk"), n))).alias(
                "gram"
            ),
        )
        .where(F.col("gram") != "")
        .select("a_id", md5_long(F.col("gram")).alias("h"))
    )
    bg = (
        bench.select(F.col(id_col).alias("b_id"), tokens(text_col).alias("_tk"))
        .select(
            "b_id",
            F.explode(F.array_distinct(token_ngrams(F.col("_tk"), n))).alias(
                "gram"
            ),
        )
        .where(F.col("gram") != "")
        .select("b_id", md5_long(F.col("gram")).alias("h"))
    )
    nb = bg.groupBy("b_id").agg(F.count(F.lit(1)).alias("_nb"))
    hits = (
        tg.join(F.broadcast(bg), "h")
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    cont = F.round(F.col("_c").cast("double") / F.col("_nb").cast("double"), 6)
    return (
        hits.join(F.broadcast(nb), "b_id")
        .withColumn("containment", cont)
        .where(F.col("containment") >= threshold)
        .select(
            "a_id", "b_id", "containment", F.col("_c").cast("bigint").alias("n_shared")
        )
    )


def repetition_signals(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, dup_token_frac, dup_2gram_frac, dup_3gram_frac) — the Gopher
    repetition-quality tier: fraction of tokens / word 2-grams / word
    3-grams that are repeats within the document (0 = no repetition).

    Pure column expressions over one bound token array — no explode, no
    shuffle; at 100 TB this is a free rider on any scan that already reads
    the text column."""

    def dup_frac(arr: Column) -> Column:
        total = F.size(arr)
        return F.when(total > 0, F.round(
            1.0 - F.size(F.array_distinct(arr)).cast("double") / total.cast("double"), 6
        )).otherwise(F.lit(0.0))

    toked = df.select(
        F.col(id_col).alias("id"), tokens(text_col).alias("_tk")
    )
    with_grams = toked.select(
        "id",
        F.col("_tk"),
        token_ngrams(F.col("_tk"), 2).alias("_g2"),
        token_ngrams(F.col("_tk"), 3).alias("_g3"),
    )
    return with_grams.select(
        "id",
        dup_frac(F.col("_tk")).alias("dup_token_frac"),
        dup_frac(F.col("_g2")).alias("dup_2gram_frac"),
        dup_frac(F.col("_g3")).alias("dup_3gram_frac"),
    )


def sliding_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_chars: int = 200,
    stride: int = 150,
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_chunk_chars) — overlapping character
    windows: chunk i covers [1 + (i-1)·stride, … + chunk_chars).  The last
    window may be short; every document yields ≥1 chunk.

    n_chunks = 1 + ⌈max(len − chunk, 0) / stride⌉ guarantees full coverage
    with (chunk − stride)-char overlap.  The explode multiplies rows ~len/
    stride-fold but keeps them in the parent's partition — no shuffle; at
    100 TB the chunker runs as a map-only stage between scan and tokenizer.
    """
    if stride <= 0 or chunk_chars <= 0:
        raise ValueError("chunk_chars and stride must be positive")
    if stride > chunk_chars:
        # chunks [1..chunk], [1+stride..] would skip chars chunk+1..stride —
        # silent coverage gaps in training samples, violating the full-
        # coverage invariant the docstring states
        raise ValueError(
            f"stride ({stride}) > chunk_chars ({chunk_chars}) leaves "
            "coverage gaps"
        )
    n = F.length(F.col(text_col))
    n_chunks = (
        F.lit(1)
        + F.ceil(F.greatest(n - F.lit(chunk_chars), F.lit(0)) / F.lit(float(stride)))
    ).cast("int")
    start = (F.col("chunk_idx") - 1) * stride + 1
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.col(text_col).alias("_t"),
            F.explode(F.sequence(F.lit(1), n_chunks)).alias("chunk_idx"),
        )
        .select(
            "id",
            "chunk_idx",
            F.substring(F.col("_t"), start, chunk_chars).alias("chunk_text"),
        )
        .withColumn("n_chunk_chars", F.length("chunk_text").cast("bigint"))
    )


# ---------------------------------------------------------------------------
# Gopher-style rule filter
# ---------------------------------------------------------------------------

#: rule thresholds (Rae et al. 2021 "Scaling Language Models" §A1.1 shape,
#: scaled to the fixture's short documents)
GOPHER_WC_MIN, GOPHER_WC_MAX = 5, 10_000
GOPHER_AWL_MIN, GOPHER_AWL_MAX = 2.0, 12.0
GOPHER_SYMBOL_MAX = 0.30
GOPHER_MIN_STOP_HITS = 2


def gopher_rules(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style document quality filter with per-rule reason codes.

    Four SQL-expressible rules from the Gopher/MassiveText filtering recipe:

    - ``wc``   word count within [GOPHER_WC_MIN, GOPHER_WC_MAX]
    - ``awl``  mean word length within [GOPHER_AWL_MIN, GOPHER_AWL_MAX]
    - ``sym``  non-alphanumeric-non-space char fraction ≤ GOPHER_SYMBOL_MAX
    - ``stop`` at least GOPHER_MIN_STOP_HITS English stopword hits

    Output: (id, n_words, avg_word_len, symbol_frac, stop_hits, keep,
    reasons) where `reasons` is the comma-joined codes of FAILED rules in
    fixed order (empty string = keep).  Everything is a pure column
    expression — whole-stage codegen, no shuffle, rides the scan; the
    reason codes make the filter auditable (per-rule kill counts are one
    groupBy away), which is how production corpus filters are tuned.
    """
    toks = F.col("_tk")
    wc = F.size(toks)
    # total token chars via HOF aggregate over the BOUND tokens column
    tot_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    awl = F.when(wc > 0, tot_chars.cast("double") / wc).otherwise(F.lit(0.0))
    n = F.length(F.col(text_col))
    stripped = F.regexp_replace(F.col(text_col), r"[a-zA-Z0-9\s]+", "")
    sym = F.when(n > 0, F.length(stripped).cast("double") / n).otherwise(
        F.lit(0.0)
    )
    from overturemaps_duckdb_spark.functions.text import LANG_STOPWORDS

    stop_hits = F.size(
        F.filter(toks, lambda x: x.isin(*LANG_STOPWORDS["en"]))
    )
    bound = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col),
        tokens(text_col).alias("_tk"),
    )
    feats = bound.select(
        "id",
        wc.cast("bigint").alias("n_words"),
        F.round(awl, 6).alias("avg_word_len"),
        F.round(sym, 6).alias("symbol_frac"),
        stop_hits.cast("bigint").alias("stop_hits"),
    )
    fail_wc = ~F.col("n_words").between(GOPHER_WC_MIN, GOPHER_WC_MAX)
    fail_awl = ~F.col("avg_word_len").between(GOPHER_AWL_MIN, GOPHER_AWL_MAX)
    fail_sym = F.col("symbol_frac") > GOPHER_SYMBOL_MAX
    fail_stop = F.col("stop_hits") < GOPHER_MIN_STOP_HITS
    # concat_ws skips NULLs (in Spark and DuckDB alike) — CASE WHEN with no
    # ELSE yields NULL, so the reasons string is exactly the failed codes
    reasons = F.concat_ws(
        ",",
        F.when(fail_wc, F.lit("wc")),
        F.when(fail_awl, F.lit("awl")),
        F.when(fail_sym, F.lit("sym")),
        F.when(fail_stop, F.lit("stop")),
    )
    return feats.select(
        "id",
        "n_words",
        "avg_word_len",
        "symbol_frac",
        "stop_hits",
        (reasons == "").alias("keep"),
        reasons.alias("reasons"),
    )


def quality_percentile_prune(
    df: DataFrame,
    *,
    quality_col: str = "quality",
    group_col: str = "lang",
    cutoff: float = 0.6,
    mode: str = "approx",
    accuracy: int = 10_000,
) -> DataFrame:
    """Keep each group's top quality band (quality ≥ the group's `cutoff`
    quantile) — the relative-cutoff pruning a pipeline uses when absolute
    thresholds would gut low-resource languages.

    Two physical strategies with the same keep-set (up to sketch error):

    - ``mode="approx"`` (default, the 100 TB path): one partial-aggregated
      ``approx_percentile(quality, cutoff, accuracy)`` per group → a
      groups-cardinality threshold table (dozens of languages ≈ dozens of
      rows) broadcast back onto the corpus.  NO per-group global sort — the
      corpus side sees one scan and a map-side broadcast-hash join; one
      skewed language (English at ~half the web) costs nothing extra.  The
      GK sketch is exact while a group's value count stays ≤ ``accuracy``.
    - ``mode="exact"``: per-group ``percent_rank`` window (one shuffle on
      the group key, full in-group sort) — the verification twin used by the
      x11 oracle query; a single giant language makes a single giant sort
      partition, which is exactly why it is not the default.
    """
    if mode == "exact":
        from pyspark.sql import Window

        w = Window.partitionBy(group_col).orderBy(quality_col)
        return (
            df.withColumn("_pr", F.percent_rank().over(w))
            .where(F.col("_pr") >= cutoff)
            .drop("_pr")
        )
    if mode != "approx":
        raise ValueError(f"mode must be 'approx' or 'exact', got {mode!r}")
    thr = df.groupBy(group_col).agg(
        F.expr(
            f"approx_percentile({quality_col}, {cutoff}d, {accuracy})"
        ).alias("_thr")
    )
    return (
        df.join(F.broadcast(thr), group_col)
        .where(F.col(quality_col) >= F.col("_thr"))
        .drop("_thr")
    )


def line_corpus_dedup(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_docs: int = 3,
    delim: str = "\n",
) -> DataFrame:
    """Line-level corpus dedup (the C4 / RefinedWeb boilerplate pass):
    drop every line that occurs in ≥ ``min_docs`` DISTINCT documents —
    shared headers, footers, navigation chrome, licence blurbs — and
    rebuild each document from its surviving lines in original order.

    Returns (``id_col``, clean_text, n_kept, n_dropped).

    Scale shape — the full texts are NEVER shuffled:
    1. per-doc DISTINCT lines explode to 8-byte ``xxhash64`` keys; one
       map-side-combined count aggregation on the hash ⇒ distinct-doc
       frequency per line (within-doc repeats pre-collapsed by
       ``array_distinct``, so a plain ``count(*)`` is the distinct count).
    2. the hot set (count ≥ min_docs) joins back to the exploded lines and
       regroups to a per-doc hot-line array — only HIT lines (boilerplate,
       a tiny fraction of the corpus) flow through this shuffle.
    3. the corpus joins the per-doc hot arrays on id (AQE broadcasts the
       hit table when small — the common case) and filters the split
       array map-side; ``filter`` preserves array order, so no positional
       sort and no document reassembly shuffle exist anywhere.

    64-bit hash caveat: hotness is decided on the xxhash64 of the line, so
    two distinct lines colliding merge their document counts — which can
    both over-drop (an under-threshold line riding a hot hash) and, in
    principle, promote two sub-threshold lines into joint hotness.  The
    collision rate is ≈n²/2⁶⁴ (negligible below ~10⁹ distinct lines); for
    larger corpora widen the key (e.g. xxhash64 of line ‖ reversed line)
    or count on the line string itself at a higher shuffle cost.

    ``delim`` is a LITERAL separator (escaped before the regex-based
    split), so split and re-join are exact inverses for every delimiter.
    """
    hot = (
        _doc_lines(docs, id_col, text_col, delim)
        .groupBy("_h")
        .agg(F.count("*").alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("_h")
    )
    return _clean_against_hot(docs, id_col, text_col, hot, delim)


def _doc_lines(
    docs: DataFrame, id_col: str, text_col: str, delim: str
) -> DataFrame:
    """(_id, _line, _h) — each document's DISTINCT lines with their
    xxhash64 keys (within-doc repeats pre-collapsed, so a plain count over
    this frame is a distinct-doc count)."""
    import re as _re

    return docs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array_distinct(
                F.split(F.col(text_col), _re.escape(delim), -1)
            )
        ).alias("_line"),
    ).withColumn("_h", F.xxhash64("_line"))


def _clean_against_hot(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    hot: DataFrame,
    delim: str,
) -> DataFrame:
    """Rebuild every document without its lines whose hash appears in
    ``hot`` (a 1-column `_h` frame) — the shared cleaning tail of the
    batch and persisted-index line-dedup paths."""
    import re as _re

    delim_re = _re.escape(delim)
    doc_hot = (
        _doc_lines(docs, id_col, text_col, delim)
        .join(hot.select("_h"), "_h")
        .groupBy("_id")
        .agg(F.collect_set("_line").alias("_hot_lines"))
    )
    split_col = F.split(F.col(text_col), delim_re, -1)
    hot_arr = F.coalesce(
        F.col("_hot_lines"), F.array().cast("array<string>")
    )
    kept = F.filter(split_col, lambda x: ~F.array_contains(hot_arr, x))
    # NULL text propagates as (NULL, NULL, NULL) — a missing document must
    # stay distinguishable from a genuinely emptied one (concat_ws would
    # otherwise collapse the NULL array to '').  size(NULL) is already NULL.
    clean = F.when(
        F.col(text_col).isNotNull(), F.concat_ws(delim, kept)
    )
    return (
        docs.join(doc_hot, docs[id_col] == doc_hot["_id"], "left")
        .select(
            F.col(id_col),
            clean.alias("clean_text"),
            F.size(kept).cast("bigint").alias("n_kept"),
            (F.size(split_col) - F.size(kept))
            .cast("bigint")
            .alias("n_dropped"),
        )
    )


def write_line_counts(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    *,
    delim: str = "\n",
    mode: str = "append",
) -> None:
    """Materialize a batch's per-line distinct-doc counts as an append-only
    parquet table (`_h` bigint, `n_docs` bigint) — the incremental form of
    line dedup's frequency pass.  Counts are ADDITIVE across disjoint
    batches (each document is counted in exactly one batch), so readers
    re-aggregate with a SUM over the appended rows; no batch ever re-reads
    or re-splits previously ingested text.  The store carries 16 bytes per
    distinct (batch, line) — a sliver of corpus bytes."""
    (
        _doc_lines(docs, id_col, text_col, delim)
        .groupBy("_h")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .write.mode(mode)
        .parquet(path)
    )


def line_dedup_from_counts(
    spark,
    counts_path: str,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_docs: int = 3,
    delim: str = "\n",
) -> DataFrame:
    """:func:`line_corpus_dedup` against a persisted
    :func:`write_line_counts` store: the hot set comes from summing the
    store's appended batch counts, so cleaning any slice of the corpus
    (or a fresh increment) costs one scan of that slice plus one scan of
    the 16-byte-per-line index — the full corpus text is never re-read.
    Cleaning the whole corpus against its own complete store is
    row-identical to the one-shot batch operator (pinned in
    tests/test_line_dedup.py)."""
    hot = (
        spark.read.parquet(counts_path)
        .groupBy("_h")
        .agg(F.sum("n_docs").alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("_h")
    )
    return _clean_against_hot(docs, id_col, text_col, hot, delim)


def intra_doc_line_dedup(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """WITHIN-document line dedup (the C4 rule's intra-doc half — the
    cross-doc half is :func:`line_corpus_dedup`): keep each line's FIRST
    occurrence, preserving order — navigation chrome and repeated
    boilerplate inside one page collapse to a single copy.

    Entirely per-row column math (split → array_distinct → concat_ws:
    Spark's array_distinct keeps first-occurrence order) — no shuffle, no
    UDF; at 100 TB this is a scan-speed map.  NULL texts pass through as
    NULL with NULL counts.

    Returns (id, text, n_before, n_after)."""
    lines = F.split(F.col(text_col), "\n")
    ded = F.array_distinct(lines)
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.when(t.isNull(), F.lit(None).cast("string"))
        .otherwise(F.concat_ws("\n", ded)).alias("text"),
        F.size(lines).cast("bigint").alias("n_before"),
        F.size(ded).cast("bigint").alias("n_after"),
    )


def _span_base(
    docs: DataFrame, id_col: str, text_col: str, *, collapse_exact: bool
) -> DataFrame:
    """(_gids, _id, _w, _has, _tk) — the per-unit frame the span family
    works over: one row per DISTINCT non-null text (collapse) or one row
    per document (plain).  See :func:`hot_ngram_span_removal` for the
    collapse trade; NULL-text docs are excluded here in collapse mode
    (reattached by :func:`_rebuild_without_spans`)."""
    if collapse_exact:
        groups = (
            docs.where(F.col(text_col).isNotNull())
            .groupBy(F.col(text_col).alias("_t"))
            .agg(F.sort_array(F.collect_set(F.col(id_col))).alias("_gids"))
        )
        return groups.select(
            F.col("_gids"),
            F.element_at("_gids", 1).alias("_id"),
            F.size("_gids").cast("long").alias("_w"),
            F.lit(True).alias("_has"),
            tokens("_t").alias("_tk"),
        )
    return docs.select(
        F.array(F.col(id_col)).alias("_gids"),
        F.col(id_col).alias("_id"),
        F.lit(1).cast("long").alias("_w"),
        F.col(text_col).isNotNull().alias("_has"),
        tokens(text_col).alias("_tk"),
    )


def _gram_positions(base: DataFrame, n: int) -> DataFrame:
    """(_id, _w, _pos, _gh) — every real n-gram start position with its
    8-byte xxhash64 key, one row per position.  Documents shorter than
    ``n`` tokens contribute nothing (no whole-doc fallback gram here —
    a span needs n real tokens)."""
    return (
        base.where(F.size("_tk") >= n)
        .select(
            "_id",
            "_w",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_tk") - F.lit(n - 1)),
                    lambda i: F.xxhash64(
                        F.array_join(F.slice(F.col("_tk"), i, n), " ")
                    ),
                )
            ).alias("_p0", "_gh"),
        )
        .select("_id", "_w", (F.col("_p0") + 1).alias("_pos"), "_gh")
    )


def _rebuild_without_spans(
    docs: DataFrame,
    base: DataFrame,
    doc_spans: DataFrame,
    n: int,
    id_col: str,
    text_col: str,
    *,
    collapse_exact: bool,
) -> DataFrame:
    """Rebuild every unit without the tokens covered by its ``_hs`` span
    starts, fan results back to member ids, reattach NULL-text docs."""
    hs = F.coalesce(F.col("_hs"), F.array().cast("array<int>"))
    kept = F.filter(
        F.col("_tk"),
        lambda x, i: ~F.exists(
            hs, lambda s: (i + 1 >= s) & (i + 1 < s + F.lit(n))
        ),
    )
    per_text = base.join(doc_spans, "_id", "left").select(
        F.col("_gids"),
        F.when(F.col("_has"), F.concat_ws(" ", kept)).alias("clean_text"),
        F.when(F.col("_has"), F.size("_tk")).cast("bigint").alias("n_tokens"),
        F.when(F.col("_has"), F.size("_tk") - F.size(kept))
        .cast("bigint")
        .alias("n_removed"),
    )
    out = per_text.select(
        F.explode("_gids").alias(id_col), "clean_text", "n_tokens", "n_removed"
    )
    if collapse_exact:
        # NULL-text rows bypassed the groupBy (a NULL grouping value would
        # have formed a bogus group); reattach them untouched
        nulls = docs.where(F.col(text_col).isNull()).select(
            F.col(id_col),
            F.lit(None).cast("string").alias("clean_text"),
            F.lit(None).cast("bigint").alias("n_tokens"),
            F.lit(None).cast("bigint").alias("n_removed"),
        )
        out = out.unionByName(nulls)
    return out


def hot_ngram_span_removal(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 8,
    min_docs: int = 4,
    collapse_exact: bool = True,
) -> DataFrame:
    """Corpus-level boilerplate SPAN removal (the substring half of the
    "Deduplicating Training Data Makes Language Models Better" pass, at
    token granularity): drop every token covered by an n-gram that occurs
    in ≥ ``min_docs`` DISTINCT documents — licence blurbs, share bars,
    cookie banners — keeping the rest of each document intact.  Finer
    than :func:`line_corpus_dedup` (a hot sentence inside an otherwise
    unique line still goes) and complementary to whole-doc near-dup
    (which REMOVES documents; this CLEANS them).

    Returns (``id_col``, clean_text, n_tokens, n_removed) — clean_text is
    the surviving tokens space-joined in original order (a training
    pipeline re-tokenizes anyway; raw inter-token whitespace is not
    reconstructed).  NULL text → (NULL, NULL, NULL).

    Scale shape — the full texts are NEVER shuffled:
    1. each ≥n-token document explodes its n-gram START POSITIONS with an
       8-byte ``xxhash64`` gram key; one map-side-combined distinct+count
       on the key ⇒ distinct-document frequency per gram (the whole-doc
       fallback gram of a <n-token document is EXCLUDED — tiny duplicated
       docs are the exact-dedup family's job, and their fallback grams
       would otherwise mark entire short docs as "spans").
    2. the hot set joins back to the positions and regroups to one sorted
       per-doc start array — only HIT positions (boilerplate, a tiny
       fraction) flow through this shuffle.
    3. the corpus joins the per-doc arrays on id (AQE broadcasts the hit
       table when small — the common case) and the positional
       ``filter(tk, (x, i) -> …)`` drops covered tokens map-side;
       overlapping spans union naturally under the EXISTS test.

    Hotness rides the 64-bit gram hash (same collision caveat and remedy
    as :func:`line_corpus_dedup`).  The DuckDB oracle counts the gram
    STRINGS themselves — identical results absent hash collisions.

    ``collapse_exact`` (default True, same trade as
    :func:`~overturemaps_duckdb_spark.operators.dedup.minhash_lsh_pairs`):
    the whole tokenize → gram → span → rebuild pipeline runs once per
    DISTINCT text — identical texts have identical spans AND identical
    clean output, and each distinct text contributes its member count to
    every gram's document frequency, so results are row-identical to the
    per-document form (pytest-pinned on randomized duplicated corpora).
    Web corpora are 30–60 % exact duplicates and scale fixtures 10×,
    so this divides the heavy per-token work by the duplication depth at
    the cost of ONE text-keyed shuffle (the groupBy).  Member ids ride a
    per-text sorted array (value-keyed — no hash in the member mapping)
    and fan back out with a plain explode; a text duplicated M times
    holds an M-id array in one row (~8 B/id), the same depth caveat as
    `_exact_groups` but uncappable here — every input row must produce
    an output row.
    """
    # spread a narrow arrival (single-file local sources scan as ONE
    # partition, serializing the tokenize+explode) — at 100 TB the scan
    # arrives wider than the core count and this is a no-op.  Collapse
    # mode SKIPS it: its groupBy(text) exchange already redistributes
    # before any per-token work, so a pre-repartition is a second full
    # text shuffle for nothing (r12 plan read)
    if not collapse_exact:
        spread = docs.sparkSession.sparkContext.defaultParallelism
        if docs.rdd.getNumPartitions() < spread:
            docs = docs.repartition(spread)

    base = _span_base(docs, id_col, text_col, collapse_exact=collapse_exact)
    # the gram frame feeds BOTH the frequency count and the span join —
    # persisted so the tokenize+explode subtree runs once, not once per
    # consumer (same LRU-released policy as minhash_index's persist; the
    # frame is (id, weight, pos, 8-byte hash) — a sliver of corpus bytes,
    # and the default storage level spills rather than OOMs at scale)
    grams = _gram_positions(base, n).persist()
    # distinct-document frequency: each distinct text counts once per
    # MEMBER document (weight) — identical to the per-doc count because
    # identical texts generate identical gram sets
    hot = (
        grams.select("_id", "_w", "_gh")
        .distinct()
        .groupBy("_gh")
        .agg(F.sum("_w").alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("_gh")
    )
    doc_spans = (
        grams.join(hot, "_gh")
        .groupBy("_id")
        .agg(F.sort_array(F.collect_set("_pos")).alias("_hs"))
    )
    return _rebuild_without_spans(
        docs, base, doc_spans, n, id_col, text_col,
        collapse_exact=collapse_exact,
    )


def decontaminate_spans(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 8,
    collapse_exact: bool = True,
) -> DataFrame:
    """Surgical decontamination: REMOVE every token span in ``train``
    covered by a verbatim benchmark n-gram, instead of flagging/dropping
    the whole document (:func:`ngram_decontaminate` is the flag form) —
    the mitigation that keeps a long document's clean remainder when one
    quoted benchmark item contaminates it.

    Returns (``id_col``, clean_text, n_tokens, n_removed), same contract
    as :func:`hot_ngram_span_removal` (NULL text → NULL row; emptied doc
    → '').

    Scale shape: the benchmark's distinct gram hashes BROADCAST (eval
    sets stay small no matter the corpus size), so the span pass is a
    map-side join over the train side's gram positions — the corpus
    never shuffles for the matching; ``collapse_exact`` shares
    :func:`hot_ngram_span_removal`'s distinct-text trade.  Bench docs
    shorter than ``n`` tokens contribute no gram (a span needs n real
    tokens; the <n whole-doc fallback is the flag form's concern).
    Matching rides the same 64-bit gram hash as the hot-span pass —
    identical to string matching absent collisions (the oracle states
    strings)."""
    if not collapse_exact:
        spread = train.sparkSession.sparkContext.defaultParallelism
        if train.rdd.getNumPartitions() < spread:
            train = train.repartition(spread)
    base = _span_base(train, id_col, text_col, collapse_exact=collapse_exact)
    btk = bench.select(tokens(text_col).alias("_tk")).where(F.size("_tk") >= n)
    bg = (
        btk.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_tk") - F.lit(n - 1)),
                    lambda i: F.xxhash64(
                        F.array_join(F.slice(F.col("_tk"), i, n), " ")
                    ),
                )
            ).alias("_gh")
        )
        .distinct()
    )
    doc_spans = (
        _gram_positions(base, n)
        .join(F.broadcast(bg), "_gh")
        .groupBy("_id")
        .agg(F.sort_array(F.collect_set("_pos")).alias("_hs"))
    )
    return _rebuild_without_spans(
        train, base, doc_spans, n, id_col, text_col,
        collapse_exact=collapse_exact,
    )


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction + unigram-LM scoring
# ---------------------------------------------------------------------------


def tfidf_keywords(
    df: DataFrame, id_col: str, text_col: str, *, k: int = 3
) -> DataFrame:
    """Per-document top-k keywords by smooth TF-IDF
    (sklearn's formula: ``tf · (ln((1+N)/(1+df)) + 1)``).

    Returns ``(<id_col>, token, tf, score, rank)`` — ``score`` rounded to
    6 dp BEFORE ranking (float-noise-free order; token string breaks
    ties), ``rank`` 1-based, ``rank <= k``.

    Scale shape: explode → groupBy(doc, token) with map-side combine
    (shuffle carries per-doc distinct tokens, not instances); document
    frequency is a second vocabulary-sized groupBy over that frame;
    tf ⋈ df is a token-key equi-join (the vocabulary is NOT broadcast —
    at web scale it doesn't fit); N rides a 1-row broadcast; the final
    per-doc window is rank-limited (WindowGroupLimit pushes the k-cut
    map-side).  No UDFs, no driver loops — every stage is a
    hash-partitioned aggregate a 1000-executor cluster spreads evenly
    (token keys are zipf-skewed but the df agg is partial-combined, so
    hot tokens collapse before the shuffle)."""
    from pyspark.sql import Window

    inst = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("token")
    )
    tf = inst.groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.round(
        F.col("tf")
        * (
            F.log(
                (1.0 + F.col("n_docs").cast("double"))
                / (1.0 + F.col("df").cast("double"))
            )
            + 1.0
        ),
        6,
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("token"))
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col),
            "token",
            F.col("tf").cast("bigint").alias("tf"),
            "score",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def unigram_logprob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document cross-entropy under the corpus's own unigram LM —
    the CCNet-style statistical quality signal (docs far from the corpus
    distribution score high): ``nll = -Σ tf·ln(c(t)/TT) / n_tokens`` in
    nats, where ``c(t)`` is the corpus count of token t and ``TT`` the
    total token mass.

    Returns ``(<id_col>, n_tokens, nll)`` for documents with ≥1 token.

    Determinism across engines AND partial-agg orders: each per-token
    term is quantized to an exact integer of micro-nats
    (``CAST(ROUND(term·1e6) AS BIGINT)``) before the per-document sum —
    the money-column cents trick applied to log space, so no float
    summation order can flip a bit; the final division rounds to 6 dp.

    Scale shape: one groupBy(doc, token) (map-side combined), one
    vocabulary groupBy, one token-key equi-join, one 1-row broadcast for
    TT, one per-doc sum.  Everything partial-aggregates; nothing
    broadcasts the vocabulary or collects to the driver."""
    from overturemaps_duckdb_spark.operators._util import lru_persist

    inst = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("token")
    )
    # lru_persist (r14, guide §2.4): tf — the per-(doc, token) LM
    # sufficient statistic — feeds BOTH the vocabulary aggregate and the
    # scoring join, and exchange reuse does not fire across the two
    # references (executed-plan read: x16/x20 re-tokenized the corpus
    # once PER REFERENCE; x20 reached 6 parquet scans).  The cache bounds
    # that to one tokenize+aggregate pass; at 100 TB tf is the LM stats
    # table an ingest pipeline would write to storage.
    tf = lru_persist(
        inst.groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf")),
        "lm_stats",
    )
    vocab = tf.groupBy("token").agg(F.sum("tf").alias("c"))
    tt = vocab.agg(F.sum("c").alias("tt"))
    term_micro = F.round(
        -F.col("tf").cast("double")
        * F.log(F.col("c").cast("double") / F.col("tt").cast("double"))
        * 1e6
    ).cast("bigint")
    return (
        tf.join(vocab, "token")
        .crossJoin(F.broadcast(tt))
        .select("id", "tf", term_micro.alias("_tm"))
        .groupBy("id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum("_tm").alias("_nll_micro"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            F.round(
                F.col("_nll_micro").cast("double")
                / 1e6
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("nll"),
        )
    )


def doc_novelty(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 8
) -> DataFrame:
    """Per-document novelty: the fraction of the doc's DISTINCT token
    ``n``-grams that appear in NO other document — the inverse signal of
    :func:`hot_ngram_span_removal` (x14 removes what is corpus-hot; this
    scores what is corpus-unique).  Exact duplicates score 0.0 (every
    gram recurs in the twin), templated/boilerplate docs score low, and
    fresh prose scores near 1.0 — a cheap ranking signal for
    dedup-adjacent quality pruning.

    Returns ``(<id_col>, n_grams, novelty)`` for docs with ≥1 token
    (shorter-than-``n`` docs contribute their whole-document gram, the
    token_ngrams convention).

    Scale shape: grams hash to 60-bit keys BEFORE the shuffle (the
    d9/x4 policy — 8-byte keys move, text never does); one
    gram-frequency groupBy (map-side combined), one hash-key equi-join
    back, one per-doc aggregate.  The hash is applied identically in the
    oracle, so a (≈n²/2⁶¹) collision changes both engines the same way —
    the value is defined OVER the hashed gram space."""
    from overturemaps_duckdb_spark.functions.text import md5_long

    from overturemaps_duckdb_spark.operators._util import lru_persist

    d = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("_tk")).where(
        F.size("_tk") >= 1
    )
    # lru_persist (r14, guide §2.4): the hashed gram-instance stream
    # feeds the gram-frequency aggregate AND the join probe; without the
    # cache the tokenize+ngram+md5 chain ran once per reference
    # (executed x19: 2 parquet scans, 0 ReusedExchange).  16 bytes/row —
    # far smaller than the text it derives from.
    inst = lru_persist(
        d.select(
            "id",
            F.explode(
                F.array_distinct(token_ngrams(F.col("_tk"), n))
            ).alias("_g"),
        ).select("id", md5_long(F.col("_g")).alias("h")),
        "lm_stats",
    )
    dfreq = inst.groupBy("h").agg(F.count(F.lit(1)).alias("_df"))
    return (
        inst.join(dfreq, "h")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum((F.col("_df") == 1).cast("bigint")).alias("_u"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_grams",
            F.round(
                F.col("_u").cast("double") / F.col("n_grams").cast("double"), 6
            ).alias("novelty"),
        )
    )


def bigram_logprob(
    df: DataFrame, id_col: str, text_col: str, *, alpha: float = 1.0
) -> DataFrame:
    """Per-document cross-entropy under the corpus's own add-α-smoothed
    BIGRAM LM — the conditional-probability upgrade of
    :func:`unigram_logprob` (CCNet's KenLM filter is the 5-gram version
    of this signal): ``nll = -Σ tf·ln P(r|l) / n_bigrams`` in nats with

        ``P(r|l) = (c(l,r) + α) / (c(l·) + α·V)``

    where ``c(l,r)`` is the corpus bigram count, ``c(l·)`` the count of
    bigrams whose left token is ``l`` (the MLE context mass), and ``V``
    the corpus vocabulary size (distinct tokens over the whole token
    stream, so 1-token documents still contribute vocabulary).

    Returns ``(<id_col>, n_bigrams, nll)`` for documents with ≥2 tokens.

    Determinism: same micro-nat quantization as unigram_logprob — each
    per-bigram term rounds to integer micro-nats before the per-document
    sum — and one step further: the per-document MEAN is taken as an
    exact half-up INTEGER division ``(2·Σtm + n) div (2·n)`` (still
    micro-nats) before the single ``/1e6`` to double, because the
    float form ``Σtm/1e6/n`` rounds differently across engines when a
    document lands exactly on a 6-dp half boundary (measured: 3 of
    5000 docs at the 10× fixture).  Integer in, integer out — no
    partial-agg order OR division representation can flip a bit.

    Scale shape: bigrams are SPACE-JOINED STRINGS from
    :func:`token_ngrams` (tokens never contain spaces post-normalize, so
    the join key is unambiguous and the left token splits back out
    without a struct shuffle).  One groupBy(doc, bigram) (map-side
    combined — the shuffle carries per-doc distinct bigrams), one
    bigram-vocabulary groupBy, one left-context groupBy over THAT
    (already vocabulary-sized), two token-key equi-joins (neither side
    broadcasts — a web-scale bigram vocabulary doesn't fit), and two
    1-row broadcasts (V).  The corpus text is tokenized twice (bigram
    pass + vocabulary pass) — both scan-speed map stages; everything
    downstream is vocabulary-sized."""
    from overturemaps_duckdb_spark.operators._util import lru_persist

    d = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("_tk"))
    inst = (
        d.where(F.size("_tk") >= 2)
        .select("id", F.explode(token_ngrams(F.col("_tk"), 2)).alias("bg"))
    )
    # lru_persist (r14, guide §2.4): bf feeds the bigram vocabulary AND
    # the scoring join; cb feeds the left-context aggregate AND the same
    # join — without the caches the whole tokenize+bigram+aggregate chain
    # re-ran once per reference (executed x18: 4 parquet scans, 0
    # ReusedExchange).  Both frames are the bigram-LM stats tables an
    # ingest pipeline would persist to storage at 100 TB.
    bf = lru_persist(
        inst.groupBy("id", "bg").agg(F.count(F.lit(1)).alias("tf")),
        "lm_stats",
    )
    cb = lru_persist(
        bf.groupBy("bg").agg(F.sum("tf").alias("c")), "lm_stats"
    )
    ctx = (
        cb.select(F.element_at(F.split("bg", " "), 1).alias("l"), "c")
        .groupBy("l")
        .agg(F.sum("c").alias("cl"))
    )
    v = d.select(F.explode("_tk").alias("_t")).agg(
        F.count_distinct("_t").alias("v")
    )
    term_micro = F.round(
        -F.col("tf").cast("double")
        * F.log(
            (F.col("c").cast("double") + F.lit(float(alpha)))
            / (
                F.col("cl").cast("double")
                + F.lit(float(alpha)) * F.col("v").cast("double")
            )
        )
        * 1e6
    ).cast("bigint")
    return (
        bf.join(cb, "bg")
        .withColumn("l", F.element_at(F.split("bg", " "), 1))
        .join(ctx, "l")
        .crossJoin(F.broadcast(v))
        .select("id", "tf", term_micro.alias("_tm"))
        .groupBy("id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_bigrams"),
            F.sum("_tm").alias("_nll_micro"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_bigrams",
            (
                F.expr(
                    "(2 * _nll_micro + n_bigrams) div (2 * n_bigrams)"
                ).cast("double")
                / 1e6
            ).alias("nll"),
        )
    )


# ---------------------------------------------------------------------------
# BPE merge induction
# ---------------------------------------------------------------------------


def _merge_pair_expr(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping merge of adjacent (left, right)
    symbol pairs — the BPE apply step — as one in-row fold.

    Greedy works through the accumulator: after a merge the last output
    element is the CONCATENATED symbol, which no longer equals ``left``,
    so an overlapping second merge (the "aaa" + (a,a) case) correctly
    starts fresh — [aa, a], exactly the sequential BPE convention."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == left)
            & (s == right),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), s)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_learn_merges(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_merges: int,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules over a corpus
    (Sennrich et al. 2016 / GPT-2 vocab induction): per round, the
    globally most frequent adjacent symbol pair (ties → lexicographic
    (left, right)) becomes a new symbol everywhere, greedily
    left-to-right within words.

    Returns ``(rank, lhs, rhs, freq)`` — rank 1-based, freq the
    pair's corpus occurrence count (weighted by word frequency) at the
    time it was chosen.

    Scale shape — the classic vocab-level trick: merges act on DISTINCT
    WORDS weighted by count, so each round is one pair-count aggregation
    over the vocabulary (map-side combined; the shuffle carries distinct
    pairs), one 1-row TakeOrdered argmax to the driver, and one
    scan-speed in-row fold rewriting the symbol arrays.  The corpus text
    is read ONCE (word-count aggregation); rounds never touch it again.
    The vocabulary frame is checkpoint-materialized every round (the d6
    lineage cut) so K rounds cost K bounded jobs, not one 2^K plan.
    Word length bounds the fold, vocabulary size bounds every shuffle —
    both hold at 100 TB where the corpus is large but words stay words.
    """
    from overturemaps_duckdb_spark.operators._util import materialize

    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    vocab = materialize(
        df.select(F.explode(tokens(text_col)).alias("_w"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(F.split("_w", "").alias("_syms"), "_n"),
        eager=True,
    )
    spark = df.sparkSession
    out = []
    for rank in range(1, n_merges + 1):
        pairs = (
            vocab.select(
                "_n",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("_syms"), 1, F.size("_syms") - 1),
                        F.slice(F.col("_syms"), 2, F.size("_syms") - 1),
                        lambda a, b: F.struct(
                            a.alias("l"), b.alias("r")
                        ),
                    )
                ).alias("_p"),
            )
            .groupBy("_p.l", "_p.r")
            .agg(F.sum("_n").alias("_f"))
        )
        best = pairs.orderBy(F.desc("_f"), F.asc("l"), F.asc("r")).limit(1).collect()
        if not best:
            break
        left, right, freq = best[0]["l"], best[0]["r"], best[0]["_f"]
        out.append((rank, left, right, int(freq)))
        if rank < n_merges:
            vocab = materialize(
                vocab.select(
                    _merge_pair_expr(F.col("_syms"), left, right).alias(
                        "_syms"
                    ),
                    "_n",
                ),
                eager=True,
            )
    return spark.createDataFrame(
        out, "rank int, lhs string, rhs string, freq bigint"
    )


def bpe_apply(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Apply learned BPE merge rules: ``(word, segmented, n)`` — every
    distinct corpus word, its symbol sequence after replaying ``merges``
    IN ORDER (each greedy left-to-right, :func:`_merge_pair_expr`), and
    its occurrence count.  The tokenizer's encode table: at 100 TB this
    joins back to documents on the word (or ships as a broadcast dict to
    an Arrow encoder); the apply pass itself is one word-count shuffle +
    K scan-speed in-row folds, corpus text read once."""
    vocab = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    syms = F.split(F.col("word"), "")
    for left, right in merges:
        syms = _merge_pair_expr(syms, left, right)
    return vocab.select("word", syms.alias("segmented"), "n")
