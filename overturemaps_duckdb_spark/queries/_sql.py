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


# --- Porter stemmer as a DuckDB CTE chain (functions/stem.py twin) -------
#
# DuckDB's own stem() lives in the fts extension (unavailable offline), so
# the t6 oracle states Porter 1980 directly in SQL, generated from the SAME
# rule tables the Spark kernel uses (functions.stem.STEP2/STEP3/STEP4) —
# two independent evaluation engines over one shared statement of the
# published algorithm.


def _cv_sql(e: str) -> str:
    """Consonant/vowel form of a word expression: aeiou → V, y-after-
    consonant → V (the non-overlapping ([^V])y pass matches the kernel's
    sequential scan — verified on cyy/cyyy/ayy), rest → C.  The markers
    are UPPERCASE because tokens are lowercased: a lowercase 'v' marker
    collides with the letter v ("activ", "vil") and silently misclassifies
    it as a vowel — caught by the kernel-vs-SQL differential."""
    return (
        f"regexp_replace(regexp_replace(regexp_replace({e}, "
        f"'[aeiou]', 'V', 'g'), '([^V])y', '\\1V', 'g'), '[^V]', 'C', 'g')"
    )


def _m_sql(e: str) -> str:
    """Porter measure: count of VC adjacencies in the cv form."""
    return f"len(regexp_extract_all({_cv_sql(e)}, 'VC'))"


def _hasv_sql(e: str) -> str:
    return f"({_cv_sql(e)} LIKE '%V%')"


def _chop_sql(e: str, n: int) -> str:
    return f"substr({e}, 1, length({e}) - {n})"


def _last_sql(e: str) -> str:
    return f"substr({e}, length({e}), 1)"


def _dblc_sql(e: str) -> str:
    """*d — ends double consonant (chars equal + cv-consonant last)."""
    return (
        f"(length({e}) >= 2 AND {_last_sql(e)} = "
        f"substr({e}, length({e}) - 1, 1) AND "
        f"substr({_cv_sql(e)}, length({e}), 1) = 'C')"
    )


def _cvc_sql(e: str) -> str:
    """*o — ends cvc, final consonant not w/x/y."""
    return (
        f"(length({e}) >= 3 AND {_last_sql(e)} NOT IN ('w', 'x', 'y') AND "
        f"substr({_cv_sql(e)}, length({e}) - 2, 3) = 'CVC')"
    )


def _rule_case_sql(table, cond: str) -> str:
    """Longest-suffix-first single-attempt CASE for steps 2/3/4:
    the first (longest) matching suffix decides; its condition failing
    leaves the word unchanged (no shorter suffix is tried) — exactly
    functions.stem._longest_suffix semantics.  ``cond`` is 'm0' (m>0,
    steps 2-3) or 'm1' (m>1 + the ion s/t guard, step 4)."""
    branches = []
    for suf, repl in sorted(table, key=lambda p: -len(p[0])):
        stem = _chop_sql("w", len(suf))
        new = stem if not repl else f"{stem} || '{repl}'"
        if cond == "m0":
            ok = f"{_m_sql(stem)} > 0"
        else:
            ok = f"{_m_sql(stem)} > 1"
            if suf == "ion":
                ok += f" AND ({stem} LIKE '%s' OR {stem} LIKE '%t')"
        branches.append(
            f"WHEN w LIKE '%{suf}' THEN "
            f"CASE WHEN {ok} THEN {new} ELSE w END"
        )
    return "CASE " + "\n             ".join(branches) + " ELSE w END"


def porter_ctes(src: str, word_col: str, carry: list[str], pfx: str = "ps") -> tuple[str, str]:
    """CTE fragments applying Porter 1980 to ``src.word_col`` row-wise,
    carrying ``carry`` columns through; returns (fragment, final_cte).
    The fragment starts with a comma — append after an existing WITH
    chain.  Final CTE yields carry + ``stem`` (words of length ≤ 2 pass
    through unchanged, the reference implementation's early-out)."""
    from overturemaps_duckdb_spark.functions.stem import STEP2, STEP3, STEP4

    c = ", ".join(carry) + ", " if carry else ""
    w1 = _chop_sql("w", 1)
    s1a = f"""CASE
        WHEN w LIKE '%sses' THEN {_chop_sql('w', 2)}
        WHEN w LIKE '%ies' THEN {_chop_sql('w', 2)}
        WHEN w LIKE '%ss' THEN w
        WHEN w LIKE '%s' THEN {w1}
        ELSE w END"""
    s1b_new = f"""CASE
        WHEN rule = 1 AND {_m_sql('st')} > 0 THEN st || 'ee'
        WHEN rule = 2 AND {_hasv_sql('st')} THEN st
        WHEN rule = 3 AND {_hasv_sql('st')} THEN st
        ELSE w END"""
    s1b_fix = f"""CASE
        WHEN fl AND (w LIKE '%at' OR w LIKE '%bl' OR w LIKE '%iz') THEN w || 'e'
        WHEN fl AND {_dblc_sql('w')} AND {_last_sql('w')} NOT IN ('l', 's', 'z') THEN {w1}
        WHEN fl AND {_m_sql('w')} = 1 AND {_cvc_sql('w')} THEN w || 'e'
        ELSE w END"""
    s1c = f"""CASE WHEN w LIKE '%y' AND {_hasv_sql(w1)} THEN {w1} || 'i' ELSE w END"""
    s5a = f"""CASE WHEN w LIKE '%e' THEN (
        CASE WHEN {_m_sql(w1)} > 1
                  OR ({_m_sql(w1)} = 1 AND NOT {_cvc_sql(w1)}) THEN {w1}
             ELSE w END) ELSE w END"""
    s5b = f"""CASE WHEN w LIKE '%l' AND {_dblc_sql('w')} AND {_m_sql('w')} > 1 THEN {w1} ELSE w END"""
    frag = f""",
    {pfx}0 AS (SELECT {c}{word_col} AS w0, {word_col} AS w FROM {src}),
    {pfx}1a AS (SELECT {c}w0, {s1a} AS w FROM {pfx}0),
    {pfx}1b0 AS (
        SELECT {c}w0, w,
               CASE WHEN w LIKE '%eed' THEN 1 WHEN w LIKE '%ed' THEN 2
                    WHEN w LIKE '%ing' THEN 3 ELSE 0 END AS rule,
               CASE WHEN w LIKE '%eed' THEN {_chop_sql('w', 3)}
                    WHEN w LIKE '%ed' THEN {_chop_sql('w', 2)}
                    WHEN w LIKE '%ing' THEN {_chop_sql('w', 3)}
                    ELSE w END AS st
        FROM {pfx}1a
    ),
    {pfx}1b1 AS (
        SELECT {c}w0, {s1b_new} AS w,
               (rule IN (2, 3) AND {_hasv_sql('st')}) AS fl
        FROM {pfx}1b0
    ),
    {pfx}1b2 AS (SELECT {c}w0, {s1b_fix} AS w FROM {pfx}1b1),
    {pfx}1c AS (SELECT {c}w0, {s1c} AS w FROM {pfx}1b2),
    {pfx}2 AS (SELECT {c}w0, {_rule_case_sql(STEP2, 'm0')} AS w FROM {pfx}1c),
    {pfx}3 AS (SELECT {c}w0, {_rule_case_sql(STEP3, 'm0')} AS w FROM {pfx}2),
    {pfx}4 AS (SELECT {c}w0, {_rule_case_sql(tuple((s, '') for s in STEP4), 'm1')} AS w FROM {pfx}3),
    {pfx}5a AS (SELECT {c}w0, {s5a} AS w FROM {pfx}4),
    {pfx}5b AS (SELECT {c}w0, {s5b} AS w FROM {pfx}5a),
    {pfx}f AS (
        SELECT {c}CASE WHEN length(w0) <= 2 THEN w0 ELSE w END AS stem
        FROM {pfx}5b
    )"""
    return frag, f"{pfx}f"


def bm25_stemmed_sql(
    *,
    table: str,
    id_col: str,
    text_col: str,
    stemmed_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """bm25_sql with a Porter pass between tokenize and the postings
    aggregate — the oracle twin of ``build_fts_index(stemmer='porter')``.
    ``stemmed_terms`` are the PRE-STEMMED query terms (the Spark side
    stems the query driver-side with the same functions.stem kernel the
    corpus CTE chain below restates in SQL); ``dl`` is the pre-stem token
    count, tf/df aggregate over stems."""
    term_list = ", ".join(
        "'" + t.replace("'", "''") + "'" for t in stemmed_terms
    )
    frag, final = porter_ctes("u", "t", ["id"], pfx="ps")
    return f"""
    WITH toks AS (
        SELECT {id_col} AS id, {tokens_sql(text_col)} AS tk FROM {table}
    ),
    docstats AS (SELECT id, len(tk) AS dl FROM toks),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(dl) AS BIGINT) / CAST(count(*) AS BIGINT) AS avgdl
        FROM docstats
    ),
    u AS (SELECT id, unnest(tk) AS t FROM toks){frag},
    postings AS (
        SELECT id, stem AS term, CAST(count(*) AS BIGINT) AS tf
        FROM {final} GROUP BY id, stem
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
