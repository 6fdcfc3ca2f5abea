"""Text kernels for the LLM-data-pipeline surface (BASELINE.json north star).

Everything here is built from native `pyspark.sql.functions` column
expressions — JVM-side, inside whole-stage codegen, no Python in the hot
path.  This matters at 100 TB: tokenization and hashing run per-document at
full scan speed; a Python UDF here would dominate the pipeline.

The 60-bit hash primitive `md5_long` is deliberately engine-portable
(md5 hex prefix parsed as an integer) so MinHash/SimHash signatures are
bit-identical between Spark and the DuckDB oracle:
  Spark :  conv(substr(md5(s), 1, 15), 16, 10)::bigint
  DuckDB:  ('0x' || substr(md5(s), 1, 15))::bigint
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


# ---------------------------------------------------------------------------
# tokenization
# ---------------------------------------------------------------------------

#: the word-character normalization both engines agree on
_NORM_PATTERN = "[^a-z0-9]+"


def normalize(text: str | Column) -> Column:
    """lower + collapse non-alphanumerics to single spaces + trim."""
    return F.trim(F.regexp_replace(F.lower(_col(text)), _NORM_PATTERN, " "))


def tokens(text: str | Column) -> Column:
    """array<string> of normalized word tokens (whitespace split, no empties)."""
    return F.filter(F.split(normalize(text), " "), lambda x: x != "")


def token_count(text: str | Column) -> Column:
    return F.size(tokens(text))


def char_ngrams(text: str | Column, n: int) -> Column:
    """array<string> of character n-gram shingles over the normalized text.

    Built as a ``zip_with`` chain over ``n`` shifted slices of the char
    array, NOT as ``transform(sequence(...), i -> substring(norm, i, n))``:
    expressions referenced *inside* a HOF lambda re-evaluate per element
    (NOTES.md gotcha), so the substring form re-ran the whole
    ``normalize`` (regexp_replace + lower + trim) once PER CHARACTER —
    O(len²) per document; a full-corpus fingerprint pass at the 10×
    fixture took 187 s and drops to ~3 s with this shape.  Arguments to a
    HOF evaluate once per row, so here ``normalize`` runs ``n+1`` times
    per row regardless of document length.  Documents shorter than ``n``
    yield their whole normalized text as the single shingle (zip_with
    NULL-pads the short slices; coalesce keeps concat alive), matching
    the substring form exactly."""
    norm = normalize(text)
    count = F.greatest(F.length(norm) - F.lit(n - 1), F.lit(1))
    chars = F.split(norm, "")
    out = F.slice(chars, 1, count)
    for i in range(1, n):
        out = F.zip_with(
            out,
            F.slice(chars, i + 1, count),
            lambda a, b: F.concat(a, F.coalesce(b, F.lit(""))),
        )
    # NULL text: the substring form yielded [NULL] (greatest() skips the
    # NULL length → count 1; substring(NULL) → NULL) — reproduce exactly.
    return F.when(
        norm.isNull(), F.array(F.lit(None).cast("string"))
    ).otherwise(out)


# (word n-grams live in operators/textprep.token_ngrams, which takes a
# BOUND token array — binding first is what keeps the slice lambda from
# re-running tokenization per element, the same O(len²) trap char_ngrams
# had.  A text-taking twin here had no callers and carried that trap, so
# it was removed rather than fixed.)


# ---------------------------------------------------------------------------
# portable 60-bit hash
# ---------------------------------------------------------------------------


def md5_long(s: Column) -> Column:
    """First 15 hex digits of md5 as a non-negative int64 — engine-portable
    (same value from DuckDB's ('0x'||substr(md5(s),1,15))::BIGINT)."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def minhash_value(s: Column, seed: int) -> Column:
    """Seeded portable hash: md5 of the seed-prefixed string."""
    return md5_long(F.concat(F.lit(f"{seed}:"), s))


#: universal-hash family for MinHash: h_i(x) = (a_i*x + b_i) mod P over
#: 30-bit base hashes.  P Mersenne 2^31-1; a*x+b < 2^61+2^31 fits int64 in
#: both engines, so the per-seed hash is ONE multiply-add — the md5 cost is
#: paid once per shingle, not once per (shingle, seed).
MINHASH_P = 2147483647
MINHASH_BASE_BITS = 30


def minhash_coeffs(n: int) -> tuple[list[int], list[int]]:
    """Deterministic (a_i, b_i) pairs — same constants are embedded in the
    DuckDB oracle SQL, so signatures stay engine-portable."""
    a_list, b_list, x = [], [], 1234567891
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a_list.append(1 + x % (MINHASH_P - 1))
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b_list.append(x % MINHASH_P)
    return a_list, b_list


#: polynomial rolling-hash base for shingle hashing (engine-portable integer
#: arithmetic: hash_i = Σ_j code_{i+j}·B^(k-1-j) mod 2^30, missing codes → 0)
SHINGLE_B = 257


def char_codes(text: str | Column) -> Column:
    """array<int> of character codes of the normalized text.

    HOF-performance-critical shape: `split` evaluates the normalization
    regexp ONCE per row; the transform lambda only calls `ascii` on the
    bound element.  (Referencing the normalization expression *inside* a
    lambda re-evaluates it per element — a silent O(len²) trap.)"""
    return F.transform(
        F.split(normalize(text), ""), lambda ch: F.coalesce(F.ascii(ch), F.lit(0))
    )


def hashed_shingles(text: str | Column, k: int) -> Column:
    """array<bigint> of distinct 30-bit k-shingle hashes.

    Pure-arithmetic rolling polynomial over char codes — no md5, no string
    allocation per shingle.  Sliding windows come from `zip_with` against
    shifted slices: every array argument is evaluated once per row and the
    lambdas are integer ops, so the whole thing stays O(len·k) cheap ops.
    The identical formula is SQL-statable for the DuckDB oracle
    (queries/_sql.poly_shingles_sql)."""
    norm = normalize(text)
    codes = char_codes(text)
    mod = F.lit(1 << MINHASH_BASE_BITS)
    h = F.transform(codes, lambda c: c.cast("bigint"))
    for j in range(1, k):
        shifted = F.slice(codes, j + 1, F.greatest(F.size(codes) - j, F.lit(0)))
        # zip_with pads the shorter side with NULL → missing codes count
        # as 0.  The accumulator is reduced mod 2^30 at EVERY step — mod
        # distributes over * and +, so the final hashes are bit-identical
        # to the end-only reduction (and to the oracle's exact-HUGEINT
        # form), while the intermediate stays ≤ ~2^38: the unreduced
        # rolling value overflowed int64 at k ≥ 9, which under Spark's
        # default ANSI mode threw ARITHMETIC_OVERFLOW at runtime.
        h = F.zip_with(
            h,
            shifted,
            lambda a, b: (a % mod) * F.lit(SHINGLE_B) + F.coalesce(b, F.lit(0)),
        )
    count = F.greatest(F.length(norm) - F.lit(k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.slice(h, 1, count), lambda v: v % mod)
    )


# ---------------------------------------------------------------------------
# quality scoring / language id (heuristic, SQL-expressible)
# ---------------------------------------------------------------------------

#: tiny per-language stopword lists for the n-gram/stopword language heuristic
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"),
}


def stopword_hits(text: str | Column, lang: str = "en") -> Column:
    """# tokens that are stopwords of `lang`."""
    words = LANG_STOPWORDS[lang]
    toks = tokens(text)
    return F.size(F.filter(toks, lambda x: x.isin(*words)))


def stopword_ratio(text: str | Column, lang: str = "en") -> Column:
    n = token_count(text)
    return F.when(n > 0, stopword_hits(text, lang) / n).otherwise(F.lit(0.0))


def alpha_ratio(text: str | Column) -> Column:
    """fraction of characters that are ascii letters."""
    c = _col(text)
    n = F.length(c)
    alpha = F.length(F.regexp_replace(F.lower(c), "[^a-z]+", ""))
    return F.when(n > 0, alpha / n).otherwise(F.lit(0.0))


def mean_token_len(text: str | Column) -> Column:
    toks = tokens(text)
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.when(n > 0, total.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(text: str | Column) -> Column:
    """Composite [0,1] quality heuristic: alpha ratio, stopword density and a
    mean-token-length window — the classic cheap pre-LLM text filter.

    Single-pass form: the naive composition (alpha_ratio + stopword_ratio +
    mean_token_len × 2) references `tokens(text)` six times, and because
    higher-order functions fall out of whole-stage codegen there is no
    common-subexpression elimination — the normalize/split tokenization ran
    six times per row (~60 % of x2/x11 runtime at sf1).  Here ONE
    `aggregate` traversal folds (n, stopword hits, char total) into a
    struct and the `finish` lambda assembles the final score, so the token
    array is materialized exactly once.  Every arithmetic op keeps the
    original association order, making the result bit-identical to the
    composed form (and to the SQL oracle that restates it)."""
    c = _col(text)
    words = LANG_STOPWORDS["en"]
    toks = tokens(c)
    zero = F.struct(
        F.lit(0).alias("n"), F.lit(0).alias("stop"), F.lit(0).alias("chars")
    )

    def merge(acc, x):
        return F.struct(
            (acc["n"] + F.lit(1)).alias("n"),
            (acc["stop"] + x.isin(*words).cast("int")).alias("stop"),
            (acc["chars"] + F.length(x)).alias("chars"),
        )

    def finish(acc):
        ratio = F.when(acc["n"] > 0, acc["stop"] / acc["n"]).otherwise(F.lit(0.0))
        mean_len = F.when(
            acc["n"] > 0, acc["chars"].cast("double") / acc["n"]
        ).otherwise(F.lit(0.0))
        len_ok = F.when(
            (F.length(c) >= 50) & (F.length(c) <= 20000), F.lit(1.0)
        ).otherwise(F.lit(0.0))
        tok_ok = F.when(
            (mean_len >= 3.0) & (mean_len <= 10.0), F.lit(1.0)
        ).otherwise(F.lit(0.0))
        # the stopword component saturates at ratio 0.2 (ratio*5 capped at
        # 1.0) — uncapped, ordinary stopword-dense English pushed the
        # "[0,1] composite" past 1.0 (max 2.2: 'the the the…' scored 1.8),
        # breaking any absolute-threshold consumer.  The weights sum to
        # 1.0 exactly because every component is ∈ [0,1].
        return (
            0.4 * alpha_ratio(c)
            + 0.3 * F.least(ratio * 5.0, F.lit(1.0))
            + 0.15 * len_ok
            + 0.15 * tok_ok
        )

    # NULL text: tokens() is NULL so aggregate() is NULL — the composed
    # form returned 0.0 (every component when/otherwise-guarded); keep
    # that contract
    return F.coalesce(F.round(F.aggregate(toks, zero, merge, finish), 6), F.lit(0.0))


def lang_scores(text: str | Column) -> list[tuple[str, Column]]:
    return [(lang, stopword_hits(text, lang)) for lang in LANG_STOPWORDS]


def lang_id(text: str | Column) -> Column:
    """argmax language by stopword hits; ties broken by fixed en>de>fr order;
    'und' (undetermined) when nothing matched.

    Cost shape (r6, closes the NOTES r5 #11 audit item): the naive
    expression cascade referenced each language's
    ``size(filter(tokens(text), …))`` subtree ~7× (greatest + the
    when-chain), and HOFs get no codegen CSE — the whole
    normalize/split/filter tokenization re-ran per reference (~20
    evaluations per row; measured 2.47 s at sf1).  Both levels now bind
    ONCE via the outer-transform trick: ``tokens(text)`` is passed as a
    single-element array argument and referenced through a lambda
    variable (evaluated once), and likewise the 3-int hit array — the
    argmax cascade then touches only bound scalars.  Identical values
    (same counts, same tie order), 2.47 s → ~1.1 s at sf1."""
    langs = list(LANG_STOPWORDS)

    def hits_of(tk: Column) -> Column:
        return F.array(
            *[
                F.size(
                    F.filter(tk, lambda x: x.isin(*LANG_STOPWORDS[lang]))
                )
                for lang in langs
            ]
        )

    def pick(h: Column) -> Column:
        best = h[0]
        for i in range(1, len(langs)):
            best = F.greatest(best, h[i])
        expr = F.lit("und")
        # reverse order so earlier languages win ties
        for i, lang in reversed(list(enumerate(langs))):
            expr = F.when((h[i] == best) & (best > 0), F.lit(lang)).otherwise(
                expr
            )
        return expr

    hits = F.transform(F.array(tokens(text)), hits_of)[0]
    return F.transform(F.array(hits), pick)[0]


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------


def content_fingerprint(text: str | Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set (the classic "bag fingerprint" for near-identical detection)."""
    toks = tokens(text)
    return F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " "))


def shingle_fingerprint(text: str | Column, k: int = 3) -> Column:
    """md5 over sorted distinct k-shingles (order-sensitive local structure).

    Same values as ``char_ngrams`` + md5 (pinned in tests), but with the
    normalize chain and the char split each BOUND ONCE via the
    outer-transform trick (r6): ``char_ngrams``'s k+1 textual copies of
    the split-of-normalize chain each re-evaluate (HOF arguments get no
    codegen CSE), which x4 pays per document over the whole corpus —
    13.7 s → 11.4 s at sf1 from binding alone.  ``char_ngrams`` itself
    keeps the straightforward shape (d4's inverted index explodes it
    once per row, where an extra binding level buys nothing).
    ``size(chars)`` replaces ``length(norm)`` for the window count —
    identical for split-on-empty-pattern output (no trailing empty
    element; pinned on the edge cases in tests/test_textstats_edges)."""

    def from_chars(chars: Column) -> Column:
        count = F.greatest(F.size(chars) - F.lit(k - 1), F.lit(1))
        out = F.slice(chars, 1, count)
        for i in range(1, k):
            out = F.zip_with(
                out,
                F.slice(chars, i + 1, count),
                lambda a, b: F.concat(a, F.coalesce(b, F.lit(""))),
            )
        return out

    def from_norm(norm: Column) -> Column:
        sh = F.transform(F.array(F.split(norm, "")), from_chars)[0]
        # NULL text → [NULL], exactly char_ngrams' contract
        return F.when(
            norm.isNull(), F.array(F.lit(None).cast("string"))
        ).otherwise(sh)

    sh = F.transform(F.array(normalize(text)), from_norm)[0]
    return F.md5(F.array_join(F.array_sort(F.array_distinct(sh)), " "))


def _char_entropy_micro_kernel() -> Column:
    """Arrow-batched micro-nat accumulator over NORMALIZED text — the
    production form of the x17 entropy sum.  Returns the EXACT INTEGER
    Σ round(c·ln c·1e6) per row (byte bincount over the ASCII normalized
    string, one numpy pass per batch), so composing it with the same
    JVM-side final division/round yields values bit-identical to the
    fold form — integer sums have no summation-order freedom.  (The only
    theoretical divergence is a per-term c·ln(c)·1e6 landing EXACTLY on
    a .5 rounding boundary under a 1-ulp ln difference — measure-zero in
    practice; fold==vectorized equality is CI-pinned on the fuzz corpus,
    the cosine_vectorized precedent.)  NULL/empty rows return 0 — the
    caller's NULL guard discards them."""

    def _kernel(norms):
        import numpy as np
        import pandas as pd

        out = np.zeros(len(norms), dtype=np.int64)
        for i, s in enumerate(norms):
            if not s:
                continue
            b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
            c = np.bincount(b, minlength=128).astype(np.float64)
            c = c[c > 0]
            out[i] = int(np.rint(c * np.log(c) * 1e6).astype(np.int64).sum())
        return pd.Series(out)

    return F.pandas_udf(_kernel, "bigint")


def char_entropy_struct(text: str | Column) -> Column:
    """struct(n_chars, entropy) — Shannon entropy (nats) of the normalized
    character distribution, the junk/binary-text quality signal (low
    entropy ⇒ repeated filler, high ⇒ random bytes).

    Pure per-row column math — no explode, no shuffle; runs at scan speed
    at any corpus size.  ``H = ln(n) − (Σ c·ln c)/n`` with each per-char
    term quantized to integer micro-nats BEFORE the fold (the x16 cents
    trick), so the value is bit-stable across engines and evaluation
    orders.  Documents whose normalized text is empty (or NULL) yield a
    NULL struct — the caller filters.

    Impl (r12 perf rewrite): per-char counts come from ONE fold over the
    SORTED char array (run-length accumulation with a struct
    accumulator, finish-lambda flush) — O(len·log len) per row vs the
    original per-distinct-char filter pass's O(alphabet·len), measured
    64.5 s → single-digit seconds on 250k docs.  The term SET is
    identical (one run per distinct char in sorted order) and terms are
    integers, so the sum — and the certified value — is bit-identical
    to the oracle's per-distinct-char statement.  HOF-gotcha note:
    ``chars`` is bound through a transform-over-singleton so
    `normalize` evaluates once per row.

    This is the UDF-free PORTABLE form; HOF lambdas evaluate
    interpreted, so its per-row constant dominates at corpus scale
    (measured 54 s on 250k docs).  :func:`char_entropy_frame` is the
    production path — same integer micro-nat sum through an Arrow byte-
    bincount kernel (7.4 s on the same input), bit-identical outputs
    (CI-pinned)."""
    col = _col(text)

    def from_chars(chars: Column) -> Column:
        n = F.size(chars).cast("double")
        term = lambda run: F.round(  # noqa: E731
            run.cast("double") * F.log(run.cast("double")) * 1e6
        ).cast("bigint")
        zero = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).cast("bigint").alias("micro"),
        )
        micro = F.aggregate(
            F.array_sort(chars),
            zero,
            lambda acc, s: F.when(
                acc["prev"].isNull() | (s == acc["prev"]),
                F.struct(
                    s.alias("prev"),
                    (acc["run"] + 1).alias("run"),
                    acc["micro"].alias("micro"),
                ),
            ).otherwise(
                F.struct(
                    s.alias("prev"),
                    F.lit(1).alias("run"),
                    (acc["micro"] + term(acc["run"])).alias("micro"),
                )
            ),
            lambda acc: acc["micro"]
            + F.when(acc["run"] > 0, term(acc["run"])).otherwise(
                F.lit(0).cast("bigint")
            ),
        )
        ent = F.round(
            F.log(n) - micro.cast("double") / 1e6 / n, 6
        )
        return F.struct(
            F.size(chars).cast("bigint").alias("n_chars"),
            ent.alias("entropy"),
        )

    norm = normalize(col)
    out = F.transform(
        F.array(F.split(norm, "")), from_chars
    )[0]
    return F.when(norm.isNull() | (F.length(norm) == 0), F.lit(None)).otherwise(
        out
    )


def char_entropy_frame(
    df, text_col: str, *, impl: str = "vectorized"
):
    """Per-document char entropy as a DataFrame pass: df's columns +
    ``n_chars`` + ``entropy``, rows with empty/NULL normalized text
    DROPPED (the x17 contract).

    ``impl="vectorized"`` (default) stages the normalized string once
    and runs the Arrow byte-bincount kernel — the staging matters: the
    kernel is its own plan operator, so the normalize regexp feeds it
    exactly once instead of being re-inlined per reference (the
    CollapseProject trap measured at 61 s vs 7.4 s on 250k docs).
    ``impl="fold"`` routes through the portable
    :func:`char_entropy_struct` column; outputs are bit-identical
    (integer micro-nat sums — no float summation freedom; CI-pinned)."""
    import pyspark.sql.functions as F  # local alias for readability

    if impl == "fold":
        out = df.withColumn("_e", char_entropy_struct(text_col))
        return (
            out.where(F.col("_e").isNotNull())
            .withColumns(
                {
                    "n_chars": F.col("_e.n_chars"),
                    "entropy": F.col("_e.entropy"),
                }
            )
            .drop("_e")
        )
    if impl != "vectorized":
        raise ValueError(f"unknown impl {impl!r}")
    staged = df.withColumn("_norm", normalize(text_col)).where(
        F.col("_norm").isNotNull() & (F.length("_norm") > 0)
    )
    n = F.length("_norm").cast("double")
    micro = _char_entropy_micro_kernel()(F.col("_norm"))
    return staged.withColumns(
        {
            "n_chars": F.length("_norm").cast("bigint"),
            "entropy": F.round(
                F.log(n) - micro.cast("double") / 1e6 / n, 6
            ),
        }
    ).drop("_norm")
