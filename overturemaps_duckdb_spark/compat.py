"""EP3 — the raw-SQL front door with a DuckDB-dialect compat shim.

The reference exposes free-form SQL consoles straight into DuckDB
(`/root/reference/src/react/SqlQueryPanel.jsx:103-124`,
`AnalysisPanel.jsx:135-179`, editable compiled SQL `SqlPanel.jsx:16-26`).
Our front door is `spark.sql`; this shim translates the DuckDB dialect
constructs that appear in the reference's generated/suggested SQL so those
exact texts run unchanged:

| DuckDB                          | Spark                                  |
|---------------------------------|----------------------------------------|
| `arr[1]` (1-based index)        | `element_at(arr, 1)` (also 1-based)    |
| `x // y` integer division       | `x DIV y`                              |
| `epoch_us(ts)`                  | `unix_micros(ts)`                      |
| `string_split`, `list_*` fns    | `split`, `transform/filter/array_*`    |
| `quantile_cont(v, p)`           | `percentile(v, p)` (same semantics)    |
| `read_parquet(['f1','f2'])`     | temp view over `spark.read.parquet`    |
| `PRAGMA create_fts_index(t,…)`  | FTS index build → `fts_main_*` views   |
| `COPY t TO 'p' (FORMAT PARQUET)`| `spark.table(t).write.parquet(p)`      |
| `CREATE TABLE t AS SELECT …`    | DataFrame + `createOrReplaceTempView`  |

String literals are protected during rewriting (single-quote aware), so a
search for `'list_min'` inside data is never rewritten.  `ILIKE` is native
Spark SQL (≥3.3) and passes through untouched.

`fts_main_<t>.match_bm25(id, 'q')` — the reference's compiled FTS SQL
(pipeline.js:78,89) — runs when the index was PRAGMA-registered: the call
becomes a correlated scalar aggregate over the `fts_main_<t>_score`
contribution view.  Without the PRAGMA it raises the degrade-hint error,
mirroring the reference's error-driven degrade contract
(pipelineRunner.js:93-101).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

#: simple function-name substitutions (applied outside string literals)
_FN_MAP = {
    "string_split": "split",
    "list_transform": "transform",
    "list_filter": "filter",
    "list_min": "array_min",
    "list_max": "array_max",
    "list_distinct": "array_distinct",
    "list_intersect": "array_intersect",
    "list_contains": "array_contains",
    "list_sort": "array_sort",
    "epoch_us": "unix_micros",
    "strlen": "length",
    # DuckDB's exact interpolated quantile ≡ Spark's `percentile` (both
    # linear interpolation on DOUBLE at rank p·(n−1), NULLs skipped) —
    # value-identical, verified in tests/test_compat.py against DuckDB.
    # The distributed scale path for heavy groups is
    # operators/quantiles.grouped_quantile_cont; the console translation
    # keeps the one-liner working.
    "quantile_cont": "percentile",
}

#: argument-splicing rewrites (balanced-paren extraction, not plain rename).
#: list_sum/list_avg have no Spark builtin; `aggregate` with a NULL init +
#: coalesce step reproduces DuckDB exactly: NULL for NULL/empty lists, the
#: sum otherwise (verified against duckdb; numeric result is DOUBLE, where
#: DuckDB keeps the element type — documented dialect difference).
_CALL_MAP = {
    "list_sum": lambda a: (
        f"aggregate({a}, CAST(NULL AS DOUBLE), (s, x) -> coalesce(s, 0d) + x)"
    ),
    "list_avg": lambda a: (
        f"(aggregate({a}, CAST(NULL AS DOUBLE), (s, x) -> coalesce(s, 0d) + x)"
        f" / nullif(size({a}), 0))"
    ),
}


def _rewrite_calls(text: str) -> str:
    """Apply _CALL_MAP with balanced-paren argument extraction (args may
    contain nested calls; text is literal-masked so parens are exact)."""
    for name, build in _CALL_MAP.items():
        pat = re.compile(rf"\b{name}\s*\(", re.IGNORECASE)
        while True:
            m = pat.search(text)
            if m is None:
                break
            depth, i = 1, m.end()
            while i < len(text) and depth:
                if text[i] == "(":
                    depth += 1
                elif text[i] == ")":
                    depth -= 1
                i += 1
            inner = text[m.end() : i - 1].strip()
            text = text[: m.start()] + build(inner) + text[i:]
    return text

_RP_COUNTER = [0]


def _split_literals(sql: str) -> list[tuple[bool, str]]:
    """[(is_literal, chunk)] — '' escaping handled ('it''s')."""
    out: list[tuple[bool, str]] = []
    i, n = 0, len(sql)
    buf = []
    while i < n:
        c = sql[i]
        if c == "'":
            out.append((False, "".join(buf)))
            buf = []
            j = i + 1
            lit = ["'"]
            while j < n:
                if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                    lit.append("''")
                    j += 2
                    continue
                lit.append(sql[j])
                if sql[j] == "'":
                    break
                j += 1
            out.append((True, "".join(lit)))
            i = j + 1
        else:
            buf.append(c)
            i += 1
    out.append((False, "".join(buf)))
    return out


def _rewrite_subscripts(sql: str) -> str:
    """1-based bracket indexing → try_element_at: handles both `ident[1]` and
    `fn(args)[1]` (Spark's native `arr[1]` subscript is 0-BASED — silently
    wrong by one, the P3 trap SURVEY §7 risk 4 warns about).  try_element_at
    (not element_at) because DuckDB's out-of-range subscript yields NULL,
    never an error; `[0]` — which DuckDB also answers with NULL but Spark
    rejects as INVALID_INDEX_OF_ZERO even in the try_ form — becomes a NULL
    literal outright.  Runs on literal-masked text so paren matching is
    exact.

    Also rewrites NEGATIVE literal indexes (DuckDB `arr[-1]` = last
    element, matching try_element_at), bare identifier/column indexes
    (`arr[n]`) and arbitrary index EXPRESSIONS (`arr[i + 1]`,
    `arr[size(arr)]`) — any index form left untouched keeps Spark's
    0-based semantics, the exact off-by-one this shim exists to prevent
    (the r11 review found expression indexes slipping through the old
    literal/identifier-only pattern); for maps try_element_at is the same
    key lookup both engines do.  String-literal subscripts (masked) stay
    native: they are struct/map field access, which try_element_at does
    not support on structs.  Slices (`arr[1:3]`) and `ARRAY[...]`
    constructors are NOT subscripts and stay native — Spark rejects both
    loudly, never silently off-by-one."""

    def _sub(expr: str, idx: str) -> str:
        if idx == "0":
            return "NULL"
        if re.fullmatch(r"-?\d+", idx):
            return f"try_element_at({expr}, {idx})"
        # variable index: Spark's try_element_at still throws
        # INVALID_INDEX_OF_ZERO when the index EVALUATES to 0 at runtime
        # (the literal-'0' case above only covers compile-time zeros);
        # DuckDB answers arr[0] with NULL.  nullif turns a runtime 0 into
        # NULL, and try_element_at(arr, NULL) is NULL — DuckDB parity.
        # The nullif guard must apply to ARRAYS ONLY: a map with integer
        # key 0 is a legal lookup in both engines (no zero-index error),
        # and nullif would silently NULL it.  typeof() keys the branch on
        # the subscripted expression's actual type (one branch evaluates
        # per row; when the input is foldable the CASE folds away).
        # LIMITATION (ADVICE r09): {expr} appears in the rewritten text
        # three times (typeof + both branches), so it EVALUATES twice per
        # row (typeof + the taken branch) — fine for the column/field
        # references console SQL actually subscripts, but a
        # non-deterministic or expensive subscripted expression would
        # change results/cost vs the single-reference original; bind such
        # an expression once via a lateral alias before subscripting it.
        # BOTH branches CAST the index to INT (r11 differential-fuzz
        # find): Spark's element_at requires an INT index on arrays, so a
        # BIGINT-typed index expression (len(arr), a bigint column)
        # failed ANALYSIS where DuckDB accepts it — and since Catalyst
        # type-checks the untaken CASE branch too, the cast cannot live
        # in the array branch alone.  For maps an INT key upcasts to the
        # map's int/bigint key type; variable subscripts on maps with
        # genuinely-string keys are therefore out of scope (the console's
        # string-KEY lookups are string LITERALS, which never rewrite —
        # they stay native struct/map access above).  A bigint index past
        # 2^31 wraps under the cast; every such value is astronomically
        # out of range for a real array and DuckDB answers NULL anyway.
        # parenthesized so a CHAINED subscript (`arr[i][j]`) walking back
        # from the next bracket captures the whole CASE via the balanced-
        # paren scan — bare `... END[j]` walked back to the token `END`
        # and emitted typeof(END) garbage (r12 review find)
        return (
            f"(CASE WHEN typeof({expr}) LIKE 'array%' "
            f"THEN try_element_at({expr}, CAST(nullif({idx}, 0) AS INT)) "
            f"ELSE try_element_at({expr}, CAST({idx} AS INT)) END)"
        )

    i = 0
    while True:
        k = sql.find("[", i)
        if k == -1:
            return sql
        if k == 0:
            i = 1
            continue
        prev = sql[k - 1]
        # subscript context = expression directly before the bracket;
        # anything else ('[1,2]' after a comma/space/'(') is a literal
        if not (prev.isalnum() or prev in "_." or prev == ")"):
            i = k + 1
            continue
        # balanced-extract the index text (brackets nest: a[b[1]])
        depth, j = 1, k + 1
        while j < len(sql) and depth:
            if sql[j] == "[":
                depth += 1
            elif sql[j] == "]":
                depth -= 1
            j += 1
        if depth:
            return sql  # unbalanced — leave for Spark to error loudly
        idx = sql[k + 1 : j - 1].strip()
        # struct/map string-key access stays native (masked literal)
        if not idx or re.fullmatch(r"\x00L\d+\x00", idx):
            i = j
            continue
        lvl, top_comma, top_colon = 0, False, False
        for c in idx:
            if c in "([":
                lvl += 1
            elif c in ")]":
                lvl -= 1
            elif lvl == 0 and c == ",":
                top_comma = True
            elif lvl == 0 and c == ":":
                top_colon = True
        if top_colon:  # slice — Spark rejects the syntax loudly
            i = j
            continue
        # find the subscripted expression's start
        e = k - 1
        if sql[e] == ")":
            d = 0
            while e >= 0:
                if sql[e] == ")":
                    d += 1
                elif sql[e] == "(":
                    d -= 1
                    if d == 0:
                        break
                e -= 1
            e -= 1
        while e >= 0 and (sql[e].isalnum() or sql[e] in "_."):
            e -= 1
        expr = sql[e + 1 : k]
        # ARRAY[...] / multi-element [..,..] are constructors, not lookups
        if top_comma or expr.lower() == "array":
            i = j
            continue
        new = _sub(expr, _rewrite_subscripts(idx))
        sql = sql[: e + 1] + new + sql[j:]
        i = e + 1 + len(new)


def _strip_regexp_g(text: str, literals: list[str]) -> str:
    """Translate a 4th-argument DuckDB flag string on EVERY regexp_replace
    call, however nested.  'g' simply drops (Spark replaces globally by
    default); 'i'/'s'/'m' become inline ``(?i)``-style prefixes on the
    PATTERN argument ('c' = case-sensitive is the default, drops); any
    other flag leaves the call untouched for Spark to reject loudly.
    DIVERGENCE (same class as the documented flag-less form): a flag
    string WITHOUT 'g' means first-occurrence-only in DuckDB, while
    Spark always replaces globally — the reference's generated SQL
    always passes 'g'.  Operates on literal-masked text (string literals
    are \\x00Ln\\x00 placeholders), so paren/comma scanning is exact."""
    m = re.search(r"(?is)regexp_replace\s*\(", text)
    if m is None:
        return text
    start = m.end()
    depth, j = 1, start
    while j < len(text):
        c = text[j]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                break
        j += 1
    if depth != 0:  # unbalanced — leave untouched (Spark will error loudly)
        return text
    args = _strip_regexp_g(text[start:j], literals)  # nested calls first
    lvl, commas = 0, []
    for k, c in enumerate(args):
        if c == "(":
            lvl += 1
        elif c == ")":
            lvl -= 1
        elif c == "," and lvl == 0:
            commas.append(k)
    if len(commas) == 3:
        lm = re.fullmatch(r"\s*\x00L(\d+)\x00\s*", args[commas[2] + 1 :])
        flags = None
        if lm:
            fl = literals[int(lm.group(1))]
            if re.fullmatch(r"'[gismc]+'", fl):
                flags = fl[1:-1]
        if flags is not None:
            args = args[: commas[2]]
            inline = "".join(f"(?{f})" for f in "ism" if f in flags)
            if inline:
                patt = args[commas[0] + 1 : commas[1]]
                pm = re.fullmatch(r"\s*\x00L(\d+)\x00\s*", patt)
                if pm:
                    # pattern is a literal → prepend inside its quotes
                    pi = int(pm.group(1))
                    literals[pi] = "'" + inline + literals[pi][1:-1] + "'"
                else:
                    # pattern is an expression → SQL-concat the prefix
                    args = (
                        args[: commas[0] + 1]
                        + f" '{inline}' || ({patt.strip()})"
                        + args[commas[1] :]
                    )
    return (
        text[:start] + args + ")" + _strip_regexp_g(text[j + 1 :], literals)
    )


def translate(sql: str) -> str:
    """Dialect-translate one SQL text (no statement-level intercepts)."""
    # mask string literals with placeholders so rewriting never touches data
    parts = _split_literals(sql)
    literals: list[str] = []
    masked = []
    for is_lit, chunk in parts:
        if is_lit:
            literals.append(chunk)
            masked.append(f"\x00L{len(literals) - 1}\x00")
        else:
            masked.append(chunk)
    text = "".join(masked)

    if re.search(r"\bmatch_bm25\b", text, flags=re.IGNORECASE):
        raise NotImplementedError(
            "match_bm25 is a DuckDB-FTS function; use "
            "operators.fts.bm25_topk / the pipeline compiler's FTS mode "
            "(the reference degrades to ILIKE on this same error)"
        )
    text = _rewrite_subscripts(text)
    # DuckDB `//` ≡ Spark DIV for INTEGRAL operands (both truncate toward
    # zero — verified against duckdb v1.0.0 incl. negatives).  CAVEAT: on
    # non-integral operands duckdb v1.0.0's `//` degenerates to plain
    # division (5.5//2 = 2.75) where Spark DIV coerces decimals to BIGINT
    # (5.5 DIV 2 = 2) and rejects doubles outright — console `//` should
    # only be used on integer expressions (the only form the reference's
    # generated SQL emits); test_intdiv_nonintegral_caveat pins both
    # behaviors so a dialect drift shows up.
    text = re.sub(r"//", " DIV ", text)
    for src, dst in _FN_MAP.items():
        text = re.sub(rf"\b{src}\s*\(", f"{dst}(", text, flags=re.IGNORECASE)
    text = _rewrite_calls(text)
    # DuckDB `len()` is polymorphic (strings AND lists); Spark splits it into
    # length()/size().  A lazily-registered 1-row-at-a-time UDF (duck_sql
    # registers it) keeps the console polymorphic — compat slow path only;
    # the DataFrame API uses F.length/F.size natively.
    text = re.sub(r"\blen\s*\(", "duck_len(", text, flags=re.IGNORECASE)

    # DuckDB's regexp_replace global flag: Spark replaces globally by
    # default and takes a position (int) as arg 4 — strip a trailing 'g'.
    # Balanced-paren scan (text is literal-masked), recursing into the
    # argument list: the old single regex pass only stripped the OUTERMOST
    # call's flag in nested regexp_replace(regexp_replace(...,'g'),...,'g')
    # and Spark then read the surviving inner 'g' as the integer position
    # argument.
    text = _strip_regexp_g(text, literals)

    for i, lit in enumerate(literals):
        text = text.replace(f"\x00L{i}\x00", lit)
    return text


def _default_session_state(spark: SparkSession):
    """Per-SparkSession fallback SessionState for console `_session`
    statements issued outside an Engine (reference: every console shares
    the app's session table, sessionState.js:59-68 — raising here broke
    that contract).  Stored as an attribute ON the session object — an
    id(spark)-keyed dict handed a NEW session the DEAD session's state
    whenever CPython reused the address after a stop()+GC.

    The backing dir comes from ``_util.staging_root`` (one deterministic
    root per (application, "console-session"), stale siblings swept) —
    the last engine-code ``mkdtemp`` outside the r9 deterministic-root
    policy (VERDICT r09 #5); memoization keeps it one dir per session
    lifetime, and the wipe on (re)creation only ever clears a dir this
    same application abandoned.

    The root carries a per-SparkSession ``token``: sibling sessions from
    ``spark.newSession()`` share one applicationId, so an app-keyed path
    alone would alias both consoles onto ONE ``_session`` parquet — the
    second session's creation wipe destroyed the first's live store, and
    their separate in-memory KV dicts silently clobbered each other on
    every flush (ADVICE r10).  The token rides on the session object, so
    each SparkSession keeps an isolated store for its lifetime while
    dead tokened roots age out through the normal sweep."""
    from uuid import uuid4

    from overturemaps_duckdb_spark.operators._util import staging_root
    from overturemaps_duckdb_spark.state import SessionState

    ss = getattr(spark, "_omds_default_session_state", None)
    if ss is None:
        token = getattr(spark, "_omds_console_token", None)
        if token is None:
            token = uuid4().hex[:8]
            spark._omds_console_token = token
        ss = SessionState(
            spark, staging_root(spark, None, "console-session", token=token)
        )
        spark._omds_default_session_state = ss
    return ss


def _intercept(
    spark: SparkSession, sql: str, session_state=None
) -> DataFrame | None:
    """Statement-level forms that map to engine calls, not SQL."""
    s = sql.strip().rstrip(";")

    m = re.match(
        r"(?is)^INSERT\s+OR\s+REPLACE\s+INTO\s+_session\s*"
        r"(?:\(\s*key\s*,\s*value\s*\)\s*)?VALUES\s*\(\s*'([^']*)'\s*,\s*'((?:[^']|'')*)'\s*\)$",
        s,
    )
    if m:
        # Y1 — the _session KV upsert (sessionState.js:59-68) routes to
        # SessionState; raw (unparsed-JSON) values round-trip as strings
        if session_state is None:
            session_state = _default_session_state(spark)
        key, value = m.group(1), m.group(2).replace("''", "'")
        session_state._kv[key] = value
        session_state._flush()
        return spark.createDataFrame([(key, value)], "key string, value string")

    m = re.match(r"(?is)^DELETE\s+FROM\s+_session$", s)
    if m:
        if session_state is None:
            session_state = _default_session_state(spark)
        session_state.clear()
        return spark.createDataFrame([], "key string, value string")

    m = re.match(
        r"(?is)^PRAGMA\s+create_fts_index\s*\(\s*'([^']+)'\s*,\s*'([^']+)'\s*,"
        r"\s*'([^']+)'.*\)$",
        s,
    )
    if m:
        from overturemaps_duckdb_spark.operators.fts import (
            build_fts_index,
            contributions,
        )

        table, id_col, text_col = m.groups()
        # DuckDB's create_fts_index DEFAULTS include a Porter stemmer
        # (fts.js:51-68 relies on exactly those defaults), so the console
        # emulation stems by default too — the r12 review found the t6
        # operator-level parity fix had left this reference-mimicking
        # surface unstemmed.  `stemmer = 'none'` (DuckDB's own opt-out
        # spelling) disables it; other stemmers raise in build_fts_index.
        sm = re.search(r"(?is)stemmer\s*=\s*'(\w+)'", s)
        stemmer: str | None = sm.group(1).lower() if sm else "porter"
        if stemmer == "none":
            stemmer = None
        # re-running the PRAGMA rebuilds over the table's CURRENT contents
        # (so no memo), but the PREVIOUS build's persisted frames must be
        # released first — each ep4-style console invocation otherwise
        # pinned another dead index in the CacheManager forever (r10
        # review, the t1/Engine-reload leak class).  Tracked on the
        # session object like _omds_len_registered (id()-keyed dicts
        # resurrect stopped sessions' state on address reuse).
        registry = getattr(spark, "_omds_fts_pragma", None)
        if registry is None:
            registry = spark._omds_fts_pragma = {}
        old = registry.get(table)
        if old is not None:
            old.unpersist()
        idx = build_fts_index(
            spark.table(table), id_col, text_col, stemmer=stemmer
        ).persist()
        registry[table] = idx
        idx.postings.createOrReplaceTempView(f"fts_main_{table}_postings")
        idx.docstats.createOrReplaceTempView(f"fts_main_{table}_docstats")
        # query-independent per-(term, id) BM25 contributions: the view raw
        # SQL `match_bm25` calls aggregate over (column renamed so an outer
        # unqualified id correlates, never shadowed)
        contributions(idx).withColumnRenamed(
            "id", "__fts_id"
        ).createOrReplaceTempView(f"fts_main_{table}_score")
        return idx.postings.limit(0)

    m = re.match(r"(?is)^SUMMARIZE\s+(?:TABLE\s+)?\"?(\w+)\"?$", s)
    if m:
        # DuckDB's SUMMARIZE <table> — one-scan per-column profile (the
        # console accepts it like any statement; engine analog in
        # operators/profile.profile_table)
        from overturemaps_duckdb_spark.operators.profile import profile_table

        return profile_table(spark.table(m.group(1)))

    m = re.match(
        r"(?is)^COPY\s+\"?(\w+)\"?\s+TO\s+'([^']+)'\s*(?:\((.*)\))?\s*$", s
    )
    if m:
        # DuckDB picks the output format from the FORMAT option, falling
        # back to the file extension, falling back to CSV — the old
        # intercept wrote parquet unconditionally, silently producing a
        # parquet file for `COPY t TO 'out.csv' (FORMAT CSV)` (r11
        # review).  Spark writes a directory of parts either way (the
        # documented engine-side difference); csv mirrors DuckDB's
        # header default.
        table, path, opts = m.groups()
        fm = re.search(r"(?i)\bFORMAT\s+'?(\w+)'?", opts or "")
        fmt = (
            fm.group(1).lower()
            if fm
            else (
                "parquet"
                if re.search(r"(?i)\.(parquet|pq)$", path)
                else "json"
                if re.search(r"(?i)\.(json|ndjson|jsonl)$", path)
                else "csv"
            )
        )
        writer = spark.table(table).write.mode("overwrite")
        if fmt == "parquet":
            writer.parquet(path)
        elif fmt == "csv":
            writer.option("header", True).csv(path)
        elif fmt == "json":
            writer.json(path)
        else:
            raise NotImplementedError(
                f"COPY TO format '{fmt}' — the console supports PARQUET, "
                "CSV and JSON (DuckDB's other formats have no Spark sink)"
            )
        return spark.table(table).limit(0)

    m = re.match(r"(?is)^CREATE\s+(?:OR\s+REPLACE\s+)?TABLE\s+\"?(\w+)\"?\s+AS\s+(.*)$", s)
    if m:
        # Engine-side nuance vs DuckDB: the "table" is a temp view over
        # the SELECT's (already-analyzed) plan, so it recomputes from the
        # underlying FILES on each reference rather than snapshotting
        # rows — re-registering a source view later does NOT retarget it,
        # but rewriting the source files does change it.
        table, select = m.groups()
        df = duck_sql(spark, select, session_state)
        df.createOrReplaceTempView(table)
        return df.limit(0)

    return None


def _materialize_read_parquet(spark: SparkSession, sql: str) -> str:
    """`read_parquet([...])` / `read_parquet('f')` → registered temp view.

    Literal-aware (r11 review): the rewrite only fires where the
    ``read_parquet`` token sits OUTSIDE a string literal — a data value
    like ``'use read_parquet(''f'')'`` used to be rewritten (registering
    a view against a path from inside the data and corrupting the
    literal's text).  The call's own path arguments ARE literals, so the
    scan works on the literal-split form and reassembles around them."""
    parts = _split_literals(sql)
    out: list[str] = []
    i = 0
    open_call = re.compile(r"(?is)read_parquet\s*\(\s*\[?\s*$")
    close_call = re.compile(r"\s*\]?\s*(?:,[^)']*)?\)")
    while i < len(parts):
        is_lit, chunk = parts[i]
        m = None if is_lit else open_call.search(chunk)
        if m is None:
            out.append(chunk)
            i += 1
            continue
        # consume the literal path args (separated by non-literal commas)
        files: list[str] = []
        j = i + 1
        while j < len(parts):
            lit, c2 = parts[j]
            if lit:
                files.append(c2[1:-1].replace("''", "'"))
            elif c2.lstrip().startswith(",") and ")" not in c2:
                pass  # separator between path literals — keep consuming
            else:
                break
            j += 1
        close = (
            close_call.match(parts[j][1])
            if files and j < len(parts) and not parts[j][0]
            else None
        )
        if close is None:  # not the shape we materialize — leave as-is
            out.append(chunk)
            i += 1
            continue
        _RP_COUNTER[0] += 1
        name = f"__read_parquet_{_RP_COUNTER[0]}"
        spark.read.parquet(*files).createOrReplaceTempView(name)
        out.append(chunk[: m.start()] + name)
        # re-scan the post-close remainder (a second read_parquet call may
        # open inside it)
        parts[j] = (False, parts[j][1][close.end() :])
        i = j
    return "".join(out)


def _ensure_len_udf(spark: SparkSession) -> None:
    """Register the polymorphic duck_len UDF once per session.  The
    registered-marker lives ON the session object (see
    _default_session_state): an id()-keyed set skipped registration for a
    new session that happened to reuse a stopped session's address."""
    if not getattr(spark, "_omds_len_registered", False):
        spark.udf.register(
            "duck_len", lambda x: None if x is None else len(x), "bigint"
        )
        spark._omds_len_registered = True


#: the reference's canonical FTS call (pipeline.js:78,89 / fts.js:85-91):
#: `fts_main_<table>.match_bm25(<id expr>, '<query>')`
_MATCH_BM25 = re.compile(
    r"(?is)\bfts_main_(\w+)\s*\.\s*match_bm25\s*\(\s*([A-Za-z_][\w.]*)\s*,"
    r"\s*'((?:[^']|'')*)'\s*\)"
)


def _rewrite_match_bm25(spark: SparkSession, sql: str) -> str:
    """Rewrite `match_bm25` calls against a PRAGMA-registered index into a
    correlated scalar aggregate over the `fts_main_<t>_score` contribution
    view: SUM(contrib) of the query's terms for the outer row's id — NULL
    when no term matches, exactly DuckDB-FTS's no-match value (Catalyst
    plans the correlated scalar subquery as an outer aggregate join, so
    scoring stays one distributed join, not a per-row probe).  Without the
    PRAGMA the call raises the same degrade-hint error as before — the
    reference errors on match_bm25-without-index too (pipelineRunner.js:
    93-101)."""
    from overturemaps_duckdb_spark.operators.fts import tokenize_query

    def repl(m: re.Match) -> str:
        table, id_expr, raw_q = m.groups()
        if not spark.catalog.tableExists(f"fts_main_{table}_score"):
            raise NotImplementedError(
                f"match_bm25 needs a registered FTS index for '{table}' — run "
                f"PRAGMA create_fts_index('{table}', …) first, or use "
                "operators.fts.bm25_topk / the pipeline compiler's FTS mode "
                "(the reference degrades to ILIKE on this same error)"
            )
        # query terms must stem with the INDEX's tokenizer (DuckDB's
        # match_bm25 does the same through its index metadata) — an
        # unstemmed query against the default porter index silently
        # misses every inflected term
        registry = getattr(spark, "_omds_fts_pragma", {}) or {}
        idx = registry.get(table)
        stemmer = getattr(idx, "stemmer", None)
        terms = tokenize_query(raw_q.replace("''", "'"), stemmer=stemmer)
        if not terms:
            return "CAST(NULL AS DOUBLE)"
        tl = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
        return (
            f"(SELECT SUM(contrib) FROM fts_main_{table}_score "
            f"WHERE __fts_id = {id_expr} AND term IN ({tl}))"
        )

    return _MATCH_BM25.sub(repl, sql)


def duck_sql(spark: SparkSession, sql: str, session_state=None) -> DataFrame:
    """Run a DuckDB-dialect SQL text on Spark (the EP3 console entry).

    `session_state`: optional SessionState for the `_session` KV statements
    (Engine.sql wires its own; bare console calls share a per-session
    default store)."""
    intercepted = _intercept(spark, sql, session_state)
    if intercepted is not None:
        return intercepted
    sql = _materialize_read_parquet(spark, sql)
    sql = _rewrite_match_bm25(spark, sql)
    translated = translate(sql)
    if "duck_len(" in translated:
        _ensure_len_udf(spark)
    return spark.sql(translated)
