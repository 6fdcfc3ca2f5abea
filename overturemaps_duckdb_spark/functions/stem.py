"""Porter stemmer (Porter 1980, "An algorithm for suffix stripping") —
closes the FTS stemming-parity gap (SURVEY §7 risk 2): DuckDB's
``PRAGMA create_fts_index`` defaults include a Porter stemmer
(reference relies on those defaults, /root/reference/src/lib/fts.js:51-68),
while the engine's base tokenizer is lower+split only, so inflected-term
searches ("cafes" vs "cafe") ranked differently than the reference.

Two independent statements of the same published algorithm certify each
other end-to-end:

- this module: pure-Python ``porter_stem`` (driver-side query terms +
  the Arrow-batched ``porter_stem_series`` corpus kernel);
- :func:`queries._sql.porter_ctes`: the identical rule tables rendered
  as a DuckDB CTE chain, used by the t6 oracle (DuckDB's own ``stem()``
  lives in the fts extension, unavailable offline).

Faithful to the paper: step 1a-1c, 2, 3, 4, 5a, 5b, with the
measure m = number of VC sequences, *v*/*d/*o conditions via the
consonant/vowel form (y is a vowel iff preceded by a consonant), words
of length ≤ 2 returned unchanged (the reference implementation's
``k <= 1`` early-out), longest-suffix-first single-attempt rule
selection in steps 2-4.  The step-2 table is the ORIGINAL paper's
(no later 'logi'→'log' addendum) — both sides state the same table, so
parity is exact by construction.

Scale shape: stemming rides the tokenize/explode scan as an
Arrow-batched map with a per-batch memo (natural-language vocabulary is
tiny relative to token count, so the memo hit rate is ~99%); nothing
new shuffles — postings aggregate by the stemmed term exactly as the
unstemmed build aggregates by the raw term.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")

#: step 2 suffix→replacement (paper table; longest-first at apply time)
STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
)

#: step 3 suffix→replacement
STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)

#: step 4 deletions (m>1); 'ion' additionally requires the stem to end
#: in s or t
STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def _cv(w: str) -> str:
    """Consonant/vowel form: a,e,i,o,u → v; y → v iff the previous char
    classified consonant; everything else (incl. digits) → c."""
    out: list[str] = []
    for i, ch in enumerate(w):
        if ch in _VOWELS:
            out.append("v")
        elif ch == "y" and i > 0 and out[i - 1] == "c":
            out.append("v")
        else:
            out.append("c")
    return "".join(out)


def _m(w: str) -> int:
    """The measure: number of VC sequences ([C](VC)^m[V]) = count of
    'vc' adjacencies in the cv form."""
    cv = _cv(w)
    return sum(
        1 for i in range(len(cv) - 1) if cv[i] == "v" and cv[i + 1] == "c"
    )


def _has_vowel(w: str) -> bool:
    return "v" in _cv(w)


def _ends_double_consonant(w: str) -> bool:
    if len(w) < 2 or w[-1] != w[-2]:
        return False
    return _cv(w)[-1] == "c"


def _ends_cvc_not_wxy(w: str) -> bool:
    """*o — ends consonant-vowel-consonant where the final consonant is
    not w, x or y."""
    if len(w) < 3 or w[-1] in "wxy":
        return False
    return _cv(w)[-3:] == "cvc"


def _longest_suffix(w: str, table) -> tuple[str, str] | None:
    """First (suffix, repl) matching ``w``, longest suffix first —
    Porter's single-attempt rule selection for steps 2-4."""
    best = None
    for suf, repl in table:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, repl)
    return best


def porter_stem(word: str) -> str:
    """Stem one lowercase token.  Pure function of the input — safe to
    memoize (porter_stem_series does, per Arrow batch)."""
    w = word
    if len(w) <= 2:
        return w

    # step 1a — plurals
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b — ed/ing
    flag = False
    if w.endswith("eed"):
        if _m(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_consonant(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _m(w) == 1 and _ends_cvc_not_wxy(w):
            w += "e"

    # step 1c — y → i
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2 (m(stem) > 0)
    hit = _longest_suffix(w, STEP2)
    if hit is not None:
        suf, repl = hit
        stem = w[: len(w) - len(suf)]
        if _m(stem) > 0:
            w = stem + repl

    # step 3 (m(stem) > 0)
    hit = _longest_suffix(w, STEP3)
    if hit is not None:
        suf, repl = hit
        stem = w[: len(w) - len(suf)]
        if _m(stem) > 0:
            w = stem + repl

    # step 4 (m(stem) > 1; 'ion' needs stem ending s/t)
    hit = _longest_suffix(w, tuple((s, "") for s in STEP4))
    if hit is not None:
        suf, _ = hit
        stem = w[: len(w) - len(suf)]
        if _m(stem) > 1 and (suf != "ion" or stem[-1:] in ("s", "t")):
            w = stem

    # step 5a — final e
    if w.endswith("e"):
        stem = w[:-1]
        m = _m(stem)
        if m > 1 or (m == 1 and not _ends_cvc_not_wxy(stem)):
            w = stem

    # step 5b — ll → l
    if w.endswith("l") and _ends_double_consonant(w) and _m(w) > 1:
        w = w[:-1]

    return w


def porter_stem_series(s):
    """pandas Series[str] → Series[str] with a per-batch memo — the body
    of the Arrow-batched corpus kernel (vocabulary ≪ token count, so
    repeated tokens hit the dict, not the rule cascade)."""
    memo: dict[str, str] = {}

    def one(w):
        if w is None:
            return None
        hit = memo.get(w)
        if hit is None:
            hit = memo[w] = porter_stem(w)
        return hit

    return s.map(one)
