"""Compat-shim unit tests (EP3): translation rules, literal protection,
statement intercepts, the match_bm25 degrade error."""

from __future__ import annotations

import pytest

from overturemaps_duckdb_spark.compat import duck_sql, translate
from overturemaps_duckdb_spark.queries import t
from tests.conftest import SF_SMOKE


def test_bracket_index_translation():
    assert (
        translate("SELECT a.b[1] FROM t")
        == "SELECT try_element_at(a.b, 1) FROM t"
    )
    assert translate("SELECT websites[1], addresses[2] FROM t") == (
        "SELECT try_element_at(websites, 1), try_element_at(addresses, 2) FROM t"
    )
    # DuckDB answers [0] and out-of-range subscripts with NULL, never an
    # error; Spark rejects index 0 even in try_element_at → NULL literal
    assert translate("SELECT a[0] FROM t") == "SELECT NULL FROM t"


def test_subscript_null_semantics(spark):
    row = duck_sql(
        spark, "SELECT (array(1, 2))[0] AS z, (array(1, 2))[9] AS oob"
    ).collect()[0]
    assert row["z"] is None and row["oob"] is None


def test_intdiv_and_fn_renames():
    assert translate("SELECT x // 10, epoch_us(ts) FROM t") == (
        "SELECT x  DIV  10, unix_micros(ts) FROM t"
    )
    assert "array_min(transform(split(" in translate(
        "SELECT list_min(list_transform(string_split(s, ' '), x -> length(x)))"
    )


def test_string_literals_protected():
    sql = "SELECT 'list_min(a)[1] // x' AS s, name[1] FROM t WHERE c = 'it''s'"
    out = translate(sql)
    assert "'list_min(a)[1] // x'" in out  # literal untouched
    assert "try_element_at(name, 1)" in out
    assert "'it''s'" in out


def test_match_bm25_raises_degrade_hint():
    with pytest.raises(NotImplementedError, match="ILIKE"):
        translate("SELECT * FROM t WHERE fts_main_t.match_bm25(id, 'q') IS NOT NULL")


def test_pragma_fts_intercept(spark):
    t(spark, SF_SMOKE, "documents").createOrReplaceTempView("docs_c")
    duck_sql(spark, "PRAGMA create_fts_index('docs_c', 'doc_id', 'text')")
    postings = spark.table("fts_main_docs_c_postings")
    assert postings.columns == ["term", "id", "tf", "dl"]
    assert postings.count() > 0
    # the registered index is queryable through plain SQL (T2's data side)
    top = spark.sql(
        "SELECT id, tf FROM fts_main_docs_c_postings WHERE term = 'merge' "
        "ORDER BY tf DESC, id LIMIT 5"
    )
    assert top.count() <= 5


def test_read_parquet_list_form(spark):
    df = duck_sql(
        spark,
        f"SELECT count(*) AS c FROM read_parquet(['{SF_SMOKE}/region.parquet', "
        f"'{SF_SMOKE}/region.parquet'])",
    )
    # two copies of the same file → double count
    single = spark.read.parquet(f"{SF_SMOKE}/region.parquet").count()
    assert df.collect()[0]["c"] == 2 * single


def test_regexp_replace_g_flag_stripped():
    out = translate("SELECT regexp_replace(lower(x), '[^a-z]+', ' ', 'g') FROM t")
    assert out == "SELECT regexp_replace(lower(x), '[^a-z]+', ' ') FROM t"
    # a non-'g' known flag becomes an inline pattern prefix (r11)
    out2 = translate("SELECT regexp_replace(x, 'a', 'b', 'i') FROM t")
    assert out2 == "SELECT regexp_replace(x, '(?i)a', 'b') FROM t"
    # an unknown flag string stays untouched → Spark errors loudly
    out3 = translate("SELECT regexp_replace(x, 'a', 'b', 'z9') FROM t")
    assert "'z9'" in out3


def test_session_kv_sql_intercepts(spark, tmp_path):

    from overturemaps_duckdb_spark.state import SessionState

    root = str(tmp_path / "compat_kv")
    ss = SessionState(spark, root)
    duck_sql(spark, "INSERT OR REPLACE INTO _session VALUES ('lim', '3000')", ss)
    duck_sql(spark, "INSERT OR REPLACE INTO _session VALUES ('lim', '100')", ss)
    assert SessionState(spark, root)._kv["lim"] == "100"
    duck_sql(spark, "DELETE FROM _session", ss)
    assert SessionState(spark, root)._kv == {}
    # no explicit SessionState → a per-SparkSession default store takes the
    # write (reference consoles share the app session table); it persists
    # across calls and is cleared by DELETE
    duck_sql(spark, "INSERT OR REPLACE INTO _session VALUES ('a', 'b')")
    from overturemaps_duckdb_spark.compat import _default_session_state

    assert _default_session_state(spark)._kv["a"] == "b"
    duck_sql(spark, "DELETE FROM _session")
    assert _default_session_state(spark)._kv == {}


def test_list_aggregates_and_len(spark):
    row = duck_sql(
        spark,
        "SELECT list_sum(array(1.5, 2.5)) AS s, list_sum(array()) AS se, "
        "list_avg(array(1.0, 2.0)) AS av, list_avg(array()) AS ave, "
        "len('abc') AS ls, len(array(1, 2, 3)) AS la",
    ).collect()[0]
    # DuckDB-verified semantics: NULL for empty lists, values otherwise;
    # len() polymorphic over strings and lists
    assert row["s"] == 4.0 and row["se"] is None
    assert row["av"] == 1.5 and row["ave"] is None
    assert row["ls"] == 3 and row["la"] == 3


def test_list_sum_nested_args():
    out = translate("SELECT list_sum(list_transform(v, x -> x + 1)) FROM t")
    assert out.count("aggregate(") == 1
    assert "transform(v, x -> x + 1)" in out


def test_ilike_passthrough(spark):
    t(spark, SF_SMOKE, "customer").createOrReplaceTempView("cust_c")
    df = duck_sql(
        spark, "SELECT count(*) AS c FROM cust_c WHERE c_mktsegment ILIKE '%machi%'"
    )
    assert df.collect()[0]["c"] > 0


def test_match_bm25_console_rewrite(spark):
    from overturemaps_duckdb_spark.operators.fts import bm25_topk, build_fts_index

    t(spark, SF_SMOKE, "documents").createOrReplaceTempView("docs_m")
    duck_sql(spark, "PRAGMA create_fts_index('docs_m', 'doc_id', 'text')")
    got = duck_sql(
        spark,
        "SELECT doc_id, fts_main_docs_m.match_bm25(doc_id, 'table scan merge')"
        " AS _score FROM docs_m"
        " WHERE fts_main_docs_m.match_bm25(doc_id, 'table scan merge')"
        " IS NOT NULL ORDER BY _score DESC, doc_id LIMIT 5",
    ).collect()
    idx = build_fts_index(t(spark, SF_SMOKE, "documents"), "doc_id", "text")
    want = bm25_topk(
        idx, t(spark, SF_SMOKE, "documents"), "doc_id", "table scan merge", limit=5
    ).collect()
    assert [(r["doc_id"], round(r["_score"], 6)) for r in got] == [
        (r["doc_id"], round(r["_score"], 6)) for r in want
    ]
    # without a PRAGMA-registered index the call still raises the degrade hint
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="ILIKE"):
        duck_sql(spark, "SELECT fts_main_zzz.match_bm25(doc_id, 'q') FROM docs_m")


def test_summarize_intercept(spark):
    spark.createDataFrame(
        [(1, "a", None), (2, "b", 5), (2, "b", 7)],
        "id long, name string, v long",
    ).createOrReplaceTempView("prof_t")
    rows = {r["column_name"]: r for r in duck_sql(spark, "SUMMARIZE prof_t").collect()}
    assert set(rows) == {"id", "name", "v"}
    assert rows["id"]["n_rows"] == 3 and rows["id"]["n_distinct"] == 2
    assert rows["v"]["n_null"] == 1 and rows["v"]["min_v"] == "5"
    assert rows["name"]["column_type"] == "string" and rows["name"]["max_v"] == "b"


def test_quantile_cont_translation_matches_duckdb(spark):
    """r6: DuckDB's `quantile_cont` maps to Spark's exact `percentile`
    (both linear-interpolated at rank p·(n−1), NULLs skipped) — verified
    value-for-value against DuckDB on the events fixture, through the
    console path."""
    import duckdb

    assert "percentile(value, 0.9)" in translate(
        "SELECT quantile_cont(value, 0.9) FROM events"
    )
    # literals stay protected
    assert translate("SELECT 'quantile_cont(x)'") == "SELECT 'quantile_cont(x)'"

    t(spark, SF_SMOKE, "events").createOrReplaceTempView("events")
    got = {
        r["event_type"]: (r["p50"], r["p90"])
        for r in duck_sql(
            spark,
            "SELECT event_type, ROUND(quantile_cont(value, 0.5), 6) AS p50,"
            " ROUND(quantile_cont(value, 0.9), 6) AS p90"
            " FROM events GROUP BY event_type",
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            "SELECT event_type, ROUND(quantile_cont(value, 0.5), 6),"
            " ROUND(quantile_cont(value, 0.9), 6)"
            " FROM events GROUP BY event_type"
        ).fetchall()
    }
    con.close()
    assert got == want


def test_variable_and_negative_subscripts_translate(spark):
    """r8 review fix: only literal integer subscripts were rewritten, so
    `arr[n]` silently kept Spark's 0-based semantics — the exact
    off-by-one the shim exists to prevent.  Identifier and negative
    indexes now route through try_element_at (1-based, NULL OOR,
    matching DuckDB); string-literal subscripts stay native struct/map
    access."""
    import duckdb

    from overturemaps_duckdb_spark.compat import duck_sql

    spark.createDataFrame(
        [(["a", "b", "c"], 2)], "arr array<string>, n int"
    ).createOrReplaceTempView("subs_t")
    q = "SELECT arr[n] AS byvar, arr[-1] AS neg, arr[9] AS oor FROM subs_t"
    got = duck_sql(spark, q).collect()[0]
    want = duckdb.sql(
        "SELECT arr[n] AS byvar, arr[-1] AS neg, arr[9] AS oor "
        "FROM (SELECT ['a','b','c'] AS arr, 2 AS n)"
    ).fetchone()
    assert (got["byvar"], got["neg"], got["oor"]) == want == ("b", "c", None)


def test_nested_regexp_replace_g_flags(spark):
    """r8 review fix: the old single-pass regex stripped only the
    OUTERMOST call's 'g' flag; Spark then parsed the surviving inner 'g'
    as the integer position argument."""
    import duckdb

    from overturemaps_duckdb_spark.compat import duck_sql

    spark.createDataFrame([("aacac",)], "s string").createOrReplaceTempView(
        "regex_t"
    )
    q = (
        "SELECT regexp_replace(regexp_replace(s, 'a', 'b', 'g'), "
        "'c', 'd', 'g') AS r FROM regex_t"
    )
    got = duck_sql(spark, q).collect()[0]["r"]
    want = duckdb.sql(
        "SELECT regexp_replace(regexp_replace('aacac', 'a', 'b', 'g'), "
        "'c', 'd', 'g')"
    ).fetchone()[0]
    assert got == want == "bbdbd"
    # 'g' as a REPLACEMENT string must survive the stripper (note: Spark
    # replaces globally by default, so a flag-less DuckDB regexp_replace
    # — first-occurrence-only — is a documented dialect divergence; the
    # reference's generated SQL always passes 'g')
    from overturemaps_duckdb_spark.compat import translate

    t = translate("SELECT regexp_replace(s, 'a', 'g') FROM regex_t")
    assert "'g'" in t  # the replacement literal, not a stripped flag


def test_runtime_zero_variable_subscript(spark):
    """r9 ADVICE fix: the variable-index rewrite arr[i] →
    try_element_at(arr, i) still threw INVALID_INDEX_OF_ZERO when i
    EVALUATES to 0 at runtime (the literal-'0'→NULL special case only
    covers compile-time zeros); DuckDB answers arr[0] with NULL.  The
    nullif guard must hit ARRAYS ONLY — a map with integer key 0 is a
    legal lookup in both engines, and nullif would silently NULL it."""
    import duckdb

    from overturemaps_duckdb_spark.compat import duck_sql

    spark.createDataFrame(
        [(["a", "b"], 0), (["a", "b"], 2)], "arr array<string>, n int"
    ).createOrReplaceTempView("subs_z")
    got = {
        r["n"]: r["v"]
        for r in duck_sql(spark, "SELECT n, arr[n] AS v FROM subs_z").collect()
    }
    want = {
        n: v
        for n, v in duckdb.sql(
            "SELECT n, arr[n] FROM (SELECT ['a','b'] AS arr, UNNEST([0, 2]) AS n)"
        ).fetchall()
    }
    assert got == want == {0: None, 2: "b"}

    # map with integer key 0, looked up through a variable index: the
    # typeof() branch keeps the plain try_element_at, so key 0 resolves
    spark.createDataFrame([(0,)], "k int").createOrReplaceTempView("subs_m")
    row = duck_sql(
        spark,
        "SELECT try_element_at(map(0, 'zero', 1, 'one'), k) AS direct, "
        "map(0, 'zero', 1, 'one')[k] AS via_shim FROM subs_m",
    ).collect()[0]
    assert row["direct"] == row["via_shim"] == "zero"


def test_pragma_fts_reindex_releases_previous(spark):
    """r10 review: every `PRAGMA create_fts_index` re-run (the ep4 console
    pattern — one per invocation) built and persisted a NEW index while
    the previous build's frames stayed pinned in the CacheManager forever.
    The session now tracks the live PRAGMA index per table and releases
    the predecessor on rebuild."""
    from overturemaps_duckdb_spark.compat import duck_sql
    from tests.conftest import SF_SMOKE

    spark.read.parquet(f"{SF_SMOKE}/documents.parquet").createOrReplaceTempView(
        "prag_docs"
    )
    duck_sql(spark, "PRAGMA create_fts_index('prag_docs', 'doc_id', 'text')")
    first = spark._omds_fts_pragma["prag_docs"]
    first.postings.count()  # materialize the cache
    assert first.postings.is_cached
    duck_sql(spark, "PRAGMA create_fts_index('prag_docs', 'doc_id', 'text')")
    second = spark._omds_fts_pragma["prag_docs"]
    assert second is not first
    assert not first.postings.is_cached, "old PRAGMA index stayed pinned"
    assert first.tok_cache is None or not first.tok_cache.is_cached
    # the rebuilt index still scores
    out = duck_sql(
        spark,
        "SELECT doc_id FROM prag_docs "
        "WHERE fts_main_prag_docs.match_bm25(doc_id, 'data') IS NOT NULL "
        "LIMIT 5",
    )
    assert out.count() >= 0


def test_expression_subscripts_translate(spark):
    """r11 review: an index EXPRESSION (arr[i + 1], arr[size(arr)]) fell
    through the old literal/identifier-only pattern and ran with Spark's
    0-BASED native subscript — the exact silent off-by-one the rewriter
    exists to prevent."""
    import duckdb

    from overturemaps_duckdb_spark.compat import duck_sql

    spark.createDataFrame(
        [(["a", "b", "c"], 1)], "arr array<string>, i int"
    ).createOrReplaceTempView("subs_expr")
    q = (
        "SELECT arr[i + 1] AS plus, arr[size(arr)] AS last_fn, "
        "arr[i * 3] AS mul FROM subs_expr"
    )
    got = duck_sql(spark, q).collect()[0]
    want = duckdb.sql(
        "SELECT arr[i + 1], arr[len(arr)], arr[i * 3] "
        "FROM (SELECT ['a','b','c'] AS arr, 1 AS i)"
    ).fetchone()
    assert (got["plus"], got["last_fn"], got["mul"]) == want == ("b", "c", "c")


def test_nested_and_chained_subscripts(spark):
    import duckdb

    from overturemaps_duckdb_spark.compat import duck_sql

    spark.createDataFrame(
        [(["a", "b", "c"], [2, 3])], "arr array<string>, ix array<int>"
    ).createOrReplaceTempView("subs_nest")
    got = duck_sql(spark, "SELECT arr[ix[1]] AS nested FROM subs_nest").collect()[0]
    want = duckdb.sql(
        "SELECT arr[ix[1]] FROM (SELECT ['a','b','c'] arr, [2,3] ix)"
    ).fetchone()
    assert (got["nested"],) == want == ("b",)


def test_chained_variable_subscripts(spark):
    """r12 review: a chained subscript whose FIRST index is non-literal
    (`mat[i][j]`) walked the next bracket back to the bare token `END`
    and emitted `typeof(END)` garbage; the CASE form is parenthesized
    now so the balanced-paren walk-back captures it whole."""
    import duckdb

    from overturemaps_duckdb_spark.compat import duck_sql

    spark.createDataFrame(
        [([["a", "b"], ["c", "d"]], 2, 1)],
        "mat array<array<string>>, i int, j int",
    ).createOrReplaceTempView("subs_chain")
    q = "SELECT mat[i][j] AS vv, mat[i][1] AS vl FROM subs_chain"
    got = duck_sql(spark, q).collect()[0]
    want = duckdb.sql(
        "SELECT mat[i][j], mat[i][1] "
        "FROM (SELECT [['a','b'],['c','d']] mat, 2 i, 1 j)"
    ).fetchone()
    assert (got["vv"], got["vl"]) == want == ("c", "c")


def test_array_constructor_and_slice_not_rewritten():
    from overturemaps_duckdb_spark.compat import translate

    # ARRAY[...] is a constructor: must NOT become try_element_at(ARRAY, ...)
    t = translate("SELECT ARRAY[1, 2, 3] FROM t")
    assert "try_element_at" not in t
    # slices stay native (Spark rejects the syntax loudly — never a
    # silent off-by-one)
    t2 = translate("SELECT arr[1:2] FROM t")
    assert "arr[1:2]" in t2


def test_copy_respects_format(spark, tmp_path):
    """r11 review: COPY always wrote parquet — `(FORMAT CSV)` silently
    produced a parquet file.  Format now follows the option, then the
    extension, then DuckDB's CSV default."""
    import glob as _glob

    from overturemaps_duckdb_spark.compat import duck_sql

    spark.createDataFrame([(1, "x"), (2, "y")], "id int, s string")\
        .createOrReplaceTempView("copy_fmt_t")

    pq_dir = str(tmp_path / "out_parquet")
    duck_sql(spark, f"COPY copy_fmt_t TO '{pq_dir}' (FORMAT PARQUET)")
    assert spark.read.parquet(pq_dir).count() == 2

    csv_dir = str(tmp_path / "out.csv")
    duck_sql(spark, f"COPY copy_fmt_t TO '{csv_dir}' (FORMAT CSV)")
    part = _glob.glob(csv_dir + "/part-*")[0]
    text = open(part).read()
    assert "id" in text.splitlines()[0]  # header, like DuckDB's default
    back = spark.read.option("header", True).csv(csv_dir)
    assert back.count() == 2

    # extension fallback: .json → ndjson, like DuckDB
    js_dir = str(tmp_path / "out.json")
    duck_sql(spark, f"COPY copy_fmt_t TO '{js_dir}'")
    assert spark.read.json(js_dir).count() == 2

    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        duck_sql(spark, f"COPY copy_fmt_t TO '{tmp_path}/o' (FORMAT ORC)")


def test_intdiv_nonintegral_caveat(spark):
    """`//` → DIV is exact for INTEGRAL operands (both truncate toward
    zero, duckdb v1.0.0 verified); non-integral operands are a DOCUMENTED
    divergence (duckdb degenerates to plain division, Spark DIV coerces
    decimals / rejects doubles).  Pin the integral parity incl. negatives
    so a dialect drift in either engine surfaces."""
    import duckdb

    from overturemaps_duckdb_spark.compat import duck_sql

    spark.createDataFrame(
        [(-7, 2), (7, -2), (7, 2), (9, 4)], "a int, b int"
    ).createOrReplaceTempView("intdiv_t")
    got = sorted(
        tuple(r) for r in duck_sql(spark, "SELECT a, b, a // b AS q FROM intdiv_t").collect()
    )
    want = sorted(
        duckdb.sql(
            "SELECT a, b, a // b FROM (VALUES (-7, 2), (7, -2), (7, 2), (9, 4)) t(a, b)"
        ).fetchall()
    )
    assert got == want


def test_regexp_replace_flag_translation(spark):
    """r11 backlog: DuckDB flag strings beyond 'g' ('i'/'s'/'m', combos)
    previously hit Spark's 4th-arg position cast with a loud error; they
    now translate to inline (?i)-style pattern prefixes.  Values pinned
    against duckdb (global forms — the non-'g' first-occurrence-only
    divergence is documented, same class as the flag-less form)."""
    import duckdb

    from overturemaps_duckdb_spark.compat import duck_sql

    spark.createDataFrame([("AbAb",)], "s string").createOrReplaceTempView(
        "regex_fl"
    )
    q = (
        "SELECT regexp_replace(s, 'a', 'x', 'gi') AS gi, "
        "regexp_replace(s, 'a.', 'x', 'gis') AS gis FROM regex_fl"
    )
    got = duck_sql(spark, q).collect()[0]
    want = duckdb.sql(
        "SELECT regexp_replace(s, 'a', 'x', 'gi'), "
        "regexp_replace(s, 'a.', 'x', 'gis') FROM (SELECT 'AbAb' AS s)"
    ).fetchone()
    assert (got["gi"], got["gis"]) == want == ("xbxb", "xx")

    # expression pattern (non-literal) gets the prefix via SQL concat
    got2 = duck_sql(
        spark,
        "SELECT regexp_replace(s, upper('a'), 'x', 'gi') AS r FROM regex_fl",
    ).collect()[0]
    assert got2["r"] == "xbxb"

    # unknown flag letters stay untouched -> loud Spark error, never silent
    import pytest as _pytest

    with _pytest.raises(Exception):
        duck_sql(spark, "SELECT regexp_replace(s, 'a', 'x', 'z9') FROM regex_fl").collect()


def test_subscript_rewriter_differential_fuzz(spark):
    """Differential fuzz for the r11 balanced-scan subscript rewriter:
    deterministic random index expressions (literals, negatives,
    variables, arithmetic, nested subscripts, function calls) must agree
    with duckdb row-for-row.  Catches any context where the scanner
    silently leaves Spark's 0-based native subscript in play."""
    import random

    import duckdb

    from overturemaps_duckdb_spark.compat import duck_sql

    rng = random.Random(1107)
    spark.createDataFrame(
        [(["a", "b", "c", "d"], [2, 4, 1], 1, 2)],
        "arr array<string>, ix array<int>, i int, j int",
    ).createOrReplaceTempView("fz_subs")
    duck = duckdb.connect()
    duck.execute(
        "CREATE VIEW fz_subs AS SELECT ['a','b','c','d'] AS arr, "
        "[2, 4, 1] AS ix, 1 AS i, 2 AS j"
    )

    def gen_index(depth=0):
        choices = [
            lambda: str(rng.randint(-5, 5)),
            lambda: rng.choice(["i", "j"]),
            lambda: f"{rng.choice(['i', 'j'])} + {rng.randint(0, 3)}",
            lambda: f"{rng.randint(1, 4)} - {rng.choice(['i', 'j'])}",
            lambda: "len(arr)",
            lambda: f"least({rng.randint(1, 4)}, {rng.choice(['i', 'j'])})",
        ]
        if depth < 1:
            choices.append(lambda: f"ix[{gen_index(depth + 1)}]")
        return rng.choice(choices)()

    mismatches = []
    for n in range(40):
        expr = f"arr[{gen_index()}]"
        q = f"SELECT {expr} AS v FROM fz_subs"
        got = duck_sql(spark, q).collect()[0]["v"]
        want = duck.execute(q.replace("size(", "len(")).fetchone()[0]
        if got != want:
            mismatches.append((expr, got, want))
    assert not mismatches, mismatches


def test_translation_surface_composite_fuzz(spark):
    """Composite differential fuzz: random expressions composed from the
    WHOLE translation surface — subscripts over renamed list_* functions,
    `//` inside index expressions, list_sum/list_avg splicing around
    CASE-rewritten subscripts — must agree with duckdb.  Guards the
    INTERACTIONS between the rewrite passes (subscripts run before
    renames before call-splicing before `//`), which the per-feature
    tests cannot see."""
    import random

    import duckdb

    from overturemaps_duckdb_spark.compat import duck_sql

    rng = random.Random(2211)
    spark.createDataFrame(
        [(["a", "b", "c", "d"], [2, 4, 1], 1, 2)],
        "arr array<string>, ix array<int>, i int, j int",
    ).createOrReplaceTempView("fz_comp")
    duck = duckdb.connect()
    duck.execute(
        "CREATE VIEW fz_comp AS SELECT ['a','b','c','d'] AS arr, "
        "[2, 4, 1] AS ix, 1 AS i, 2 AS j"
    )

    def num(depth=0):
        opts = [
            lambda: str(rng.randint(-3, 6)),
            lambda: rng.choice(["i", "j"]),
            lambda: "len(arr)",
            lambda: "list_min(ix)",
            lambda: "list_max(ix)",
            lambda: f"({num(depth + 1)} + {num(depth + 1)})" if depth < 2 else "i",
            lambda: f"({num(depth + 1)} // 2)" if depth < 2 else "j",
            lambda: f"ix[{num(depth + 1)}]" if depth < 2 else "1",
        ]
        return rng.choice(opts)()

    def scalar():
        opts = [
            lambda: f"arr[{num()}]",
            lambda: f"list_sort(ix)[{num()}]",
            lambda: f"string_split('p q r', ' ')[{num()}]",
            lambda: f"list_sum(list_transform(ix, x -> x + {rng.randint(0, 3)}))",
            lambda: f"list_avg(ix) + {num()}",
            lambda: f"len(arr) {rng.choice(['+', '*'])} {num()}",
        ]
        return rng.choice(opts)()

    mismatches = []
    for n in range(50):
        expr = scalar()
        q = f"SELECT {expr} AS v FROM fz_comp"
        try:
            got = duck_sql(spark, q).collect()[0]["v"]
        except Exception as exc:  # loud failure = a translation gap to record
            mismatches.append((expr, "SPARK_ERROR", str(exc)[:100]))
            continue
        want = duck.execute(q).fetchone()[0]
        if got != want and not (
            isinstance(got, float)
            and isinstance(want, (int, float))
            and abs(got - float(want)) < 1e-9
        ):
            mismatches.append((expr, got, want))
    assert not mismatches, mismatches


def test_read_parquet_literal_safety_and_multiple_calls(spark):
    """r11 review: the read_parquet materializer ran on UNMASKED text, so
    a data literal containing `read_parquet('…')` was rewritten — a view
    registered against a path from inside the data, and the literal's
    text corrupted.  Now literal-aware; multiple real calls in one
    statement still materialize, and option arguments are tolerated."""
    from overturemaps_duckdb_spark.compat import duck_sql

    # a literal mentioning read_parquet stays data
    row = duck_sql(
        spark, "SELECT 'use read_parquet(''f'')' AS hint"
    ).collect()[0]
    assert row["hint"] == "use read_parquet('f')"

    # two real calls in one statement
    single = spark.read.parquet(f"{SF_SMOKE}/region.parquet").count()
    row = duck_sql(
        spark,
        f"SELECT (SELECT count(*) FROM read_parquet('{SF_SMOKE}/region.parquet'))"
        f" + (SELECT count(*) FROM read_parquet(['{SF_SMOKE}/region.parquet',"
        f" '{SF_SMOKE}/region.parquet'])) AS c",
    ).collect()[0]
    assert row["c"] == 3 * single


def test_pragma_fts_stems_by_default_and_none_opts_out(spark):
    """r12: the console PRAGMA emulation matches DuckDB create_fts_index
    DEFAULTS — Porter stemming on — so the reference's own SQL ranks
    inflected queries ('tables scanning') like the real extension would;
    `stemmer = 'none'` (DuckDB's opt-out spelling) restores the raw-token
    index.  match_bm25 stems its query with the index's tokenizer."""
    rows = [(1, "tables are scanned daily"), (2, "nothing relevant")]
    spark.createDataFrame(rows, "doc_id long, text string").createOrReplaceTempView(
        "docs_stem"
    )
    duck_sql(spark, "PRAGMA create_fts_index('docs_stem', 'doc_id', 'text')")
    post = spark.table("fts_main_docs_stem_postings")
    terms = {r["term"] for r in post.collect()}
    assert "tabl" in terms and "tables" not in terms
    hit = duck_sql(
        spark,
        "SELECT doc_id FROM docs_stem "
        "WHERE fts_main_docs_stem.match_bm25(doc_id, 'table scanning') "
        "IS NOT NULL",
    ).collect()
    assert [r["doc_id"] for r in hit] == [1]

    duck_sql(
        spark,
        "PRAGMA create_fts_index('docs_stem', 'doc_id', 'text', "
        "stemmer = 'none')",
    )
    post2 = spark.table("fts_main_docs_stem_postings")
    terms2 = {r["term"] for r in post2.collect()}
    assert "tables" in terms2 and "tabl" not in terms2
    # the raw-token index no longer matches the inflected query
    miss = duck_sql(
        spark,
        "SELECT doc_id FROM docs_stem "
        "WHERE fts_main_docs_stem.match_bm25(doc_id, 'table scanning') "
        "IS NOT NULL",
    ).collect()
    assert miss == []
