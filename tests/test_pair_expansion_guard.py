"""Pair-expansion plan-shape guard (round-8 scale fix).

The 2M-vector decade measured the reference pair construction —
exploding the full C(n,2) struct array `_ordered_pair_structs` builds
inside ONE array value — at 69 s for 999M intra pairs vs 0.9 s for the
streamed two-stage posexplode + tail-slice shape (~500k structs built
and GC'd per row at the 1000-member group/bucket caps; the struct
construction happens in a non-codegen HOF lambda, the explode chain
stays in codegen).  `test_dedup_collapse_gate` pins the two
constructions pair-for-pair EQUAL — so a revert to the materialized
shape would pass every value test and only resurface as a 79× slowdown
at 100 TB group depths.  This guard pins the SHAPE: every production
dedup/ANN pair-expansion plan must stream (posexplode present, no
flatten(transform(...)) pair-array materialization anywhere in the
optimized plan).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

#: (query, expects_streamed_expansion) — d8 is cross-corpus only (its
#: pairs are a×b band joins, no intra self-expansion), so it gets only
#: the negative assertion.
_CASES = [
    ("d2_minhash_lsh_pairs", True),
    ("d5_embedding_neardup", True),
    ("n2_lsh_ann_pairs", True),
    ("fz1_fuzzy_pairs", True),
    ("d8_cross_corpus_neardup", False),
]


@pytest.mark.parametrize("name,streamed", _CASES, ids=[c[0] for c in _CASES])
def test_pair_expansion_streams(spark, name, streamed):
    from overturemaps_duckdb_spark import queries as _q

    _q.load_all()
    plan = (
        _q.QUERIES[name](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the materialized C(n,2) shape: flatten(transform(ids, ...)) building
    # the whole pair array inside one value before the explode
    assert "flatten(transform(" not in plan, (
        f"{name} materializes a pair array per row — the r8-measured 79× "
        "slowdown at 1000-member caps; stream through "
        "_explode_ordered_pairs instead"
    )
    if streamed:
        assert "posexplode" in plan, (
            f"{name} lost the streamed two-stage pair expansion"
        )
