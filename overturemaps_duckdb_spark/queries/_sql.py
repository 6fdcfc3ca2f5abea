"""Shared DuckDB-SQL oracle fragments.

These mirror — token for token — the Spark column expressions in
``functions.text`` so value-level parity holds:

- tokenization: lower → regexp collapse → trim → split → drop empties
- portable 60-bit hash: ('0x' || substr(md5(s),1,15))::BIGINT
  (Spark: conv(substr(md5(s),1,15),16,10)::bigint)
"""

from __future__ import annotations

#: normalized text of a column (DuckDB regexp_replace needs the 'g' flag;
#: Spark's replaces globally by default)
def norm_sql(col: str) -> str:
    return f"trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g'))"


def tokens_sql(col: str) -> str:
    return f"list_filter(string_split({norm_sql(col)}, ' '), x -> x <> '')"


def token_ngrams_sql(tk_col: str, n: int) -> str:
    """list of space-joined token n-grams over a BOUND token-list column —
    twin of operators.textprep.token_ngrams (docs shorter than n tokens
    yield their single whole-document gram)."""
    return (
        f"list_transform(range(1, greatest(len({tk_col}) - {n - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice({tk_col}, CAST(i AS INTEGER), "
        f"CAST(i + {n - 1} AS INTEGER)), ' '))"
    )


def md5_long_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def char_ngrams_sql(col: str, n: int) -> str:
    """list of character n-grams over the normalized text (1-based substr,
    greatest(len-n+1, 1) windows) — mirrors functions.text.char_ngrams."""
    norm = norm_sql(col)
    return (
        f"list_transform(range(1, greatest(length({norm}) - {n - 1}, 1) + 1), "
        f"i -> substr({norm}, CAST(i AS INTEGER), {n}))"
    )


def char_codes_sql(col: str) -> str:
    """array of char codes of the normalized text (missing/empty → 0) —
    twin of functions.text.char_codes."""
    norm = norm_sql(col)
    return (
        f"list_transform(range(1, length({norm}) + 1), "
        f"i -> coalesce(ascii(substr({norm}, CAST(i AS INTEGER), 1)), 0))"
    )


def poly_shingles_from_codes_sql(
    codes_col: str, len_col: str, k: int, *, base: int = 257, mod: int = 1 << 30
) -> str:
    """Distinct 30-bit polynomial k-shingle hashes over a BOUND codes-array
    column (bind via a CTE — inlining the codes expression would re-evaluate
    it per element).  Twin of functions.text.hashed_shingles:
    hash_i = Σ_j code_{i+j}·base^(k-1-j) mod 2^30, i in 1..max(len-k+1, 1)."""
    terms = " + ".join(
        f"coalesce({codes_col}[CAST(i + {j} AS INTEGER)], 0) * {base ** (k - 1 - j)}"
        for j in range(k)
    )
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest({len_col} - {k - 1}, 1) + 1), "
        f"i -> ({terms}) % {mod}))"
    )


def bm25_sql(
    *,
    table: str,
    id_col: str,
    text_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """Full BM25 CTE pipeline over (table, id, text) for a fixed term list —
    the oracle twin of operators.fts.bm25_score.  Yields (id, _score).

    Terms are SQL-escaped (quote doubling): this is the public oracle
    builder, and an apostrophe term ("o'brien") used to render malformed
    SQL — the opposite of the tokenizer it mirrors, which strips such
    characters."""
    term_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    toks = tokens_sql(text_col)
    return f"""
    WITH toks AS (
        SELECT {id_col} AS id, {toks} AS tk FROM {table}
    ),
    docstats AS (SELECT id, len(tk) AS dl FROM toks),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(dl) AS BIGINT) / CAST(count(*) AS BIGINT) AS avgdl
        FROM docstats
    ),
    postings AS (
        SELECT id, t AS term, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT id, unnest(tk) AS t FROM toks)
        GROUP BY id, t
    ),
    qterms AS (SELECT unnest([{term_list}]) AS term),
    dfreq AS (
        SELECT term, CAST(count(DISTINCT id) AS BIGINT) AS df
        FROM postings JOIN qterms USING (term) GROUP BY term
    ),
    idfs AS (
        SELECT term, ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5)) AS idf
        FROM dfreq, stats
    ),
    scores AS (
        SELECT p.id,
               SUM(i.idf * CAST(p.tf AS DOUBLE)
                   / (CAST(p.tf AS DOUBLE)
                      + {k1} * (1.0 - {b} + {b} * d.dl / s.avgdl))) AS _score
        FROM postings p
        JOIN qterms q USING (term)
        JOIN idfs i USING (term)
        JOIN docstats d USING (id)
        CROSS JOIN stats s
        GROUP BY p.id
    )
    """
