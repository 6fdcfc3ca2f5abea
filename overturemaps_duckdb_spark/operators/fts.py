"""Full-text search: inverted index + BM25 (SURVEY §2.10 T1-T5).

The reference delegates to DuckDB's FTS extension:
`PRAGMA create_fts_index('t','id','search_name')` builds `fts_main_t` helper
tables and `match_bm25(id, q)` scores (`/root/reference/src/lib/fts.js:51-91`),
with an ILIKE fallback when the index is missing (fts.js:93-127).

Spark has no secondary indexes, so the index IS a DataFrame pair — exactly
how the FTS extension models it internally, but distributed:

- ``postings``: (term, id, tf, dl) — partitioned by term, so a query's term
  lookup is an IN-predicate prune (pushed into the scan) of a term slice;
  the doc length is denormalized into each posting so scoring never joins
  a separate doc-stats table.
- ``termstats``: (term, df) — document frequencies materialized at build
  time, as DuckDB's FTS schema does; scoring never re-aggregates postings.
- ``docstats``: (id, dl) + scalar (N, avgdl).

At 100 TB the postings table is written out partitioned/bucketed by term;
scoring a query touches only the matching term partitions (partition
pruning), then a groupBy(id) sum over candidate docs — no full-corpus scan.

BM25 (Okapi, the same family DuckDB's `match_bm25` implements):
  score(d, q) = Σ_t idf(t) · tf/(tf + k1·(1 − b + b·dl/avgdl))
  idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from overturemaps_duckdb_spark.functions.text import tokens

K1 = 1.2
B = 0.75


class FtsScoringError(RuntimeError):
    """BM25 scoring failed against a registered index — the typed marker the
    pipeline runner's degrade path matches on (the reference's equivalent is
    sniffing 'match_bm25' in the error text, pipelineRunner.js:93-96; a
    typed error can't false-positive on unrelated failures)."""


@dataclass
class FtsIndex:
    """T1 — the materialized inverted index (ref fts.js:51-68).

    `stats` is a one-row (n, avgdl) DataFrame kept LAZY: scoring cross-joins
    it (broadcast) instead of collecting to the driver, so building an index
    costs zero Spark jobs until a query actually runs.

    `termstats` (term, df) mirrors the document-frequency table DuckDB's FTS
    schema materializes alongside the postings.  Present on persisted
    stores (write_fts_index computes it once at ingest; read_fts_index
    supplies it); None on inline builds, where scoring derives df for the
    query's few terms from the pruned postings slice instead of paying a
    full-corpus df pass up front."""

    postings: DataFrame  # (term, id, tf, dl)
    docstats: DataFrame  # (id, dl)
    stats: DataFrame  # single row: (n, avgdl)
    termstats: DataFrame | None = None  # (term, df)
    #: tokenizer stemming mode ('porter' | None) — recorded so query-side
    #: tokenization always matches the build (DuckDB's create_fts_index
    #: defaults include a Porter stemmer, fts.js:51-68; scoring an
    #: index with a differently-stemmed query silently misses terms)
    stemmer: str | None = None
    #: the build's persisted tokenization intermediate (see
    #: build_fts_index) — carried so unpersist() can release it; without
    #: this handle an Engine reload or runner degrade released the four
    #: index frames but left the tokenization cache pinned forever
    #: (r10 review)
    tok_cache: DataFrame | None = None

    def persist(self) -> "FtsIndex":
        self.postings = self.postings.persist()
        self.docstats = self.docstats.persist()
        self.stats = self.stats.persist()
        if self.termstats is not None:
            self.termstats = self.termstats.persist()
        return self

    def unpersist(self) -> None:
        """Release the cached index frames.  Call before REPLACING a
        session-lived index (Engine.load_area reload, runner degrade):
        Spark's CacheManager never releases caches on Python GC, so a
        dropped-but-persisted index pins executor storage forever."""
        for frame in (
            self.postings, self.docstats, self.stats, self.termstats,
            self.tok_cache,
        ):
            if frame is not None:
                frame.unpersist()

    @property
    def n_docs(self) -> int:
        return int(self.stats.collect()[0]["n"])

    @property
    def avgdl(self) -> float:
        return float(self.stats.collect()[0]["avgdl"])


def build_fts_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    cache_tokens: bool = True,
    stemmer: str | None = "porter",
) -> FtsIndex:
    """Tokenize → explode → (term, id, tf) postings + per-doc lengths.

    Narrow sources (a single parquet file arrives as 1 partition) are
    spread to full parallelism before tokenization — the explode+partial-agg
    is the expensive stage and otherwise runs on one core (measured 4.0 s →
    0.9 s at sf0.1).  Wide sources skip the exchange: at scale the scan
    width comes from the file layout.

    ``cache_tokens=False`` skips the tokenization persist below — for
    callers that execute only ONE of the index's plan trees (t1 returns
    just the postings), where the cache buys nothing but would pin
    executor storage once per invocation (r10 review; session-lived
    indexes release it via FtsIndex.unpersist instead).

    ``stemmer='porter'`` is the DEFAULT (r12, completing SURVEY §7
    risk 2): DuckDB's ``create_fts_index`` defaults include a Porter
    stemmer and the reference relies on exactly those defaults
    (fts.js:51-68) — an unstemmed index ranked "cafes" vs "cafe"
    differently than the engine being re-expressed.  Pass
    ``stemmer=None`` for a raw-token index.  Doc length ``dl`` stays the
    PRE-stem token count (stemming maps tokens 1:1), tf/df aggregate
    over stems (two inflections of one stem merge, exactly as DuckDB's
    index does).  The stem rides the explode scan as an Arrow-batched
    kernel with a per-batch vocabulary memo — nothing new shuffles."""
    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    par = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par)
    # One persisted tokenization feeds postings, docstats AND stats — they
    # are three separate plan trees, so without this the regexp tokenizer
    # runs once per tree (measured 0.7 s/extra pass at sf0.1).  The cache
    # lives for the index's session lifetime, like the index itself (the
    # FtsIndex carries the handle so unpersist() releases it); at
    # 100 TB the index tables are written to storage and this intermediate
    # never materializes twice either.
    toks = src.select("id", tokens("_t").alias("toks"))
    if cache_tokens:
        toks = toks.persist()
    docstats = toks.select("id", F.size("toks").alias("dl"))
    # doc length rides along in the postings (classic posting-list
    # denormalization): +8 bytes/row at build time deletes the per-query
    # docstats join — scoring touches ONE table plus two broadcast stats.
    if stemmer is not None and stemmer != "porter":
        raise ValueError(f"unsupported stemmer {stemmer!r} (only 'porter')")
    term = F.explode("toks").alias("term")
    exploded = toks.select("id", F.size("toks").alias("dl"), term)
    if stemmer == "porter":
        from pyspark.sql.functions import pandas_udf

        from overturemaps_duckdb_spark.functions.stem import (
            porter_stem_series,
        )

        stem_udf = pandas_udf(porter_stem_series, "string")
        # Stem the DISTINCT VOCABULARY, not every token occurrence (r13,
        # guide §4/§8: decide on small rows).  The old shape ran the
        # ArrowEvalPython kernel between the explode and the postings
        # aggregate, so EVERY occurrence crossed the JVM→Python boundary
        # — at 100 TB that is the full token stream serialized to Arrow
        # and back.  Stemming is a pure per-token function, so the stems
        # of the distinct terms (vocabulary ≪ occurrences; the corpus
        # fixture has 31, natural-language corpora have 1e5-1e7) fully
        # determine every occurrence's stem: compute the (term → stem)
        # map once with a vocabulary-sized Python pass and attach it with
        # a broadcast hash join that stays inside whole-stage codegen.
        # tf/df/dl are bit-identical — grouping by stem(term) per doc
        # commutes with the map join.  The vocabulary distinct is a
        # map-side partial aggregate (array_distinct pre-shrinks the
        # explode per doc; tiny shuffle of distinct terms).  The join
        # strategy is deliberately UNHINTED (r14, VERDICT r13 #4): the
        # stem map is a post-aggregate relation, so the planner's size
        # estimate tracks the SOURCE size — at fixture/typical corpus
        # scale it sits under autoBroadcastJoinThreshold and the static
        # plan is the same BroadcastHashJoin the old hard F.broadcast()
        # hint forced (verified: BHJ at sf0.1), while a corpus whose raw
        # vocabulary outgrows broadcast limits (~1e8 terms) plans a
        # shuffle join instead of OOMing the driver against the 8 GB /
        # 512M-row broadcast cap (verified: SMJ on a 3e8-row synthetic
        # vocabulary; pinned in tests/test_fts.py), and AQE still
        # converts back to broadcast at runtime when the realized
        # vocabulary is small.  (A fully-native Porter
        # column chain was built and MEASURED as the alternative: its
        # generated CASE/regexp tree cost ~17 s of one-time Janino codegen
        # per session and ~1.5 s warm per action — the vocabulary-sized
        # ArrowEvalPython is two orders of magnitude cheaper; see
        # OPTIMIZATION_r13.md "tried and rejected".)
        vocab = toks.select(
            F.explode(F.array_distinct("toks")).alias("term")
        ).distinct()
        stem_map = vocab.select("term", stem_udf("term").alias("_stem"))
        exploded = exploded.join(stem_map, "term").select(
            "id", "dl", F.col("_stem").alias("term")
        )
    postings = (
        exploded
        .groupBy("term", "id")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    # avgdl as exact-int sum / exact-int count (one double division) — the
    # same value any SQL oracle computes, unlike engine-specific AVG paths.
    stats = docstats.agg(
        F.count("*").alias("n"), (F.sum("dl") / F.count("*")).alias("avgdl")
    )
    # termstats stays LAZY (None) on inline builds: a query needs df for
    # its ~3 terms only, and bm25_score derives that from the pruned
    # postings slice (postings are unique (term, id), so df is a plain
    # count) — materializing df for EVERY corpus term here is a full extra
    # postings pass that only pays off in the persisted-store form, where
    # write_fts_index computes it once at ingest (measured: t2 inline
    # build+score 2.4 → 1.9 s at sf0.1).
    return FtsIndex(
        postings, docstats, stats, termstats=None,
        stemmer=stemmer,
        tok_cache=toks if cache_tokens else None,
    )


def write_fts_index(index: FtsIndex, path: str, *, mode: str = "overwrite") -> None:
    """Materialize the index as parquet TABLES — the 100 TB form (the
    in-session persist is the dev/interactive form; the reference's
    equivalent is that `fts_main_t` tables survive as real DuckDB tables,
    fts.js:51-68).

    Postings land hash-distributed by term and term-sorted WITHIN files,
    so every file's row groups carry tight term min/max stats: a query's
    `term IN (...)` predicate prunes at row-group level and touches only
    the matching slices — the flat-file stand-in for true per-term
    partitioning (100k+ terms make one-directory-per-term layouts
    pathological; sorted row groups give the same pruning without the
    namespace blowup)."""
    (
        index.postings.repartition("term")
        .sortWithinPartitions("term", "id")
        .write.mode(mode)
        .parquet(f"{path}/postings")
    )
    index.docstats.write.mode(mode).parquet(f"{path}/docstats")
    # the stemming mode rides the one-row stats table (a `stemmer` column)
    # so a reopened store scores queries with the build's tokenizer — a
    # porter index queried unstemmed silently misses every inflected term
    index.stats.withColumn(
        "stemmer", F.lit(index.stemmer).cast("string")
    ).write.mode(mode).parquet(f"{path}/stats")
    ts = index.termstats
    if ts is None:
        ts = index.postings.groupBy("term").agg(F.count("*").alias("df"))
    ts.write.mode(mode).parquet(f"{path}/termstats")


def read_fts_index(spark, path: str) -> FtsIndex:
    """Open a persisted index.  Lazy: scoring a query reads only the
    pruned term slices of the postings plus the two broadcast stat
    tables — an ingest-time build amortizes across every later query
    (first-query latency drops from build+score to score alone).  The
    only eager work is the one-row stats peek restoring the build's
    stemming mode (absent on pre-stemmer stores → unstemmed)."""
    stats = spark.read.parquet(f"{path}/stats")
    stemmer = None
    if "stemmer" in stats.columns:
        stemmer = stats.select("stemmer").first()["stemmer"]
        stats = stats.drop("stemmer")
    return FtsIndex(
        postings=spark.read.parquet(f"{path}/postings"),
        docstats=spark.read.parquet(f"{path}/docstats"),
        stats=stats,
        termstats=spark.read.parquet(f"{path}/termstats"),
        stemmer=stemmer,
    )


def tokenize_query(q: str, stemmer: str | None = None) -> list[str]:
    """Same normalization (and stemming mode) as the index — query terms
    deduplicated AFTER stemming, so "scan scanning" is one term against a
    porter index, exactly as DuckDB's match_bm25 stems the query with the
    index's stemmer."""
    import re

    stem = (lambda w: w)
    if stemmer == "porter":
        from overturemaps_duckdb_spark.functions.stem import porter_stem

        stem = porter_stem
    seen: dict[str, None] = {}
    for tok in re.sub(r"[^a-z0-9]+", " ", q.lower()).split():
        seen.setdefault(stem(tok), None)
    return list(seen)


def bm25_score(
    index: FtsIndex, query: str, *, k1: float = K1, b: float = B
) -> DataFrame:
    """T2 — (id, _score) for every matching document.

    Matching the reference's conjunctive-ish scoring: any doc containing ≥1
    query term scores; `_score IS NOT NULL` is the match predicate
    (fts.js:88, pipeline.js:78).
    """
    terms = tokenize_query(query, stemmer=index.stemmer)
    if not terms:
        # empty frame's id type must FOLLOW the index schema — a hardcoded
        # `id long` would schema-mismatch downstream for string-keyed tables
        spark = index.postings.sparkSession
        id_type = index.postings.schema["id"].dataType.simpleString()
        return spark.createDataFrame([], f"id {id_type}, _score double")
    # term pruning as an IN predicate, not a join — pushes into the scan
    # (parquet row-group / in-memory batch pruning on the term column)
    pruned = index.postings.where(F.col("term").isin(terms))
    if index.termstats is not None:
        # persisted-store form: df read from the ingest-time table (term IN
        # pushdown on a #terms-row parquet)
        dfreq = index.termstats.where(F.col("term").isin(terms))
    else:
        # inline form: derive df from the pruned slice — postings are
        # unique (term, id), so this is a plain count over the few
        # matching-term rows, cheaper than materializing df for every term
        dfreq = pruned.groupBy("term").agg(F.count("*").alias("df"))
    # corpus stats arrive via a broadcast cross-join — no driver collect,
    # the whole score is ONE lazy plan.  avgdl RIDES the term_idf relation
    # (r14, guide §2.4): the old shape cross-joined broadcast(stats) a
    # second time onto the postings slice, costing one extra
    # BroadcastNestedLoopJoin + BroadcastExchange (≈ one sequential
    # broadcast-build job) per scored table — pl6/t5 score several tables
    # per query.  stats is exactly one row, so carrying avgdl through
    # term_idf changes no multiplicities and no values.
    n = F.col("n").cast("double")
    idf = F.log(F.lit(1.0) + (n - F.col("df") + 0.5) / (F.col("df") + 0.5))
    term_idf = dfreq.crossJoin(F.broadcast(index.stats)).select(
        "term", idf.alias("idf"), F.col("avgdl")
    )
    matches = pruned.join(F.broadcast(term_idf), "term")
    if "dl" not in index.postings.columns:  # legacy index without inline dl
        matches = matches.join(index.docstats, "id")
    tf = F.col("tf").cast("double")
    denom = tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = F.col("idf") * tf / denom
    return matches.groupBy("id").agg(F.sum(contrib).alias("_score"))


def contributions(
    index: FtsIndex, *, k1: float = K1, b: float = B
) -> DataFrame:
    """(id, term, contrib) — every posting's query-INDEPENDENT BM25
    contribution.  A query's score is the sum of contrib over its terms, so
    this table (registered as `fts_main_<t>_score` by the console's PRAGMA
    intercept, compat.py) lets raw SQL evaluate `match_bm25` as a plain
    filtered aggregate — no per-query recomputation of idf/norms."""
    dfreq = index.termstats
    if dfreq is None:  # legacy index without the df table
        dfreq = index.postings.groupBy("term").agg(F.count("*").alias("df"))
    n = F.col("n").cast("double")
    idf = F.log(F.lit(1.0) + (n - F.col("df") + 0.5) / (F.col("df") + 0.5))
    # same avgdl-rides-term_idf fold as bm25_score (one broadcast, not two)
    term_idf = dfreq.crossJoin(F.broadcast(index.stats)).select(
        "term", idf.alias("idf"), F.col("avgdl")
    )
    rows = index.postings.join(F.broadcast(term_idf), "term")
    if "dl" not in index.postings.columns:
        rows = rows.join(index.docstats, "id")
    tf = F.col("tf").cast("double")
    denom = tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    return rows.select("id", "term", (F.col("idf") * tf / denom).alias("contrib"))


def bm25_topk(
    index: FtsIndex,
    df: DataFrame,
    id_col: str,
    query: str,
    limit: int = 10,
    *,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """T2 full shape: top-k the (id, _score) pairs FIRST, then join the k
    winners back to the doc table (`ORDER BY _score DESC LIMIT k`,
    fts.js:85-91).  Scores are rounded to 6 dp before ranking so the
    ordering is float-noise-free (ties broken by id).

    Scale shape: the TakeOrdered runs on the narrow score side (8+8 bytes a
    row), so the doc table is only probed for k rows — via a broadcast of
    the k winners, never a full-table shuffle or a join carrying documents
    into a sort."""
    scores = bm25_score(index, query, k1=k1, b=b).withColumn(
        "_score", F.round("_score", 6)
    )
    topk = scores.orderBy(F.desc("_score"), F.asc("id")).limit(limit)
    return (
        df.join(F.broadcast(topk), df[id_col] == topk["id"], "inner")
        .drop(topk["id"])
        .orderBy(F.desc("_score"), F.asc(id_col))
        .limit(limit)
    )


def ilike_search(
    df: DataFrame, text_col: str, q: str, limit: int = 10
) -> DataFrame:
    """T3 — the graceful-degradation path: `ILIKE '%q%'` ranked by
    `length(text) ASC` (most-specific first), fts.js:104-108.

    The query is a *value*, not spliced SQL — so quotes pass through
    unescaped (doubling them would make O'Brien match nothing), while the
    LIKE metacharacters %/_/\\ are backslash-escaped so user input matches
    literally."""
    escaped = re.sub(r"([%_\\])", r"\\\1", q)
    return (
        df.where(F.col(text_col).ilike(f"%{escaped}%"))
        .orderBy(F.length(text_col).asc(), F.col(df.columns[0]).asc())
        .limit(limit)
    )


def search_all_tables(
    tables: dict[str, tuple[DataFrame, str, str]],
    q: str,
    limit: int = 10,
    indexes: dict[str, FtsIndex] | None = None,
) -> DataFrame:
    """T5 — cross-table search fan-out (fts.js:70-127): search every user
    table, merge per-table top-k with a `_table` tag.  Pre-built (persisted)
    indexes are used when supplied; missing ones are built inline."""
    # Unify the merged id column WITHOUT losing string keys: the union
    # needs one type, but a blanket cast('long') turned every id of a
    # string-keyed table (Overture GERS ids) into NULL — the rest of the
    # FTS stack deliberately follows the index's id type (bm25_score).
    # Same-typed tables keep their type; mixed types widen to string.
    id_types = {dict(df.dtypes)[id_col] for (df, id_col, _t) in tables.values()}
    id_type = id_types.pop() if len(id_types) == 1 else "string"
    out = None
    for name, (df, id_col, text_col) in tables.items():
        idx = (indexes or {}).get(name) or build_fts_index(df, id_col, text_col)
        top = bm25_topk(idx, df, id_col, q, limit=limit).select(
            F.col(id_col).cast(id_type).alias("id"),
            F.col(text_col).alias("text"),
            F.col("_score"),
            F.lit(name).alias("_table"),
        )
        out = top if out is None else out.unionByName(top)
    if out is None:
        raise ValueError("no tables to search")
    return out
