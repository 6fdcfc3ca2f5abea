"""Numeric interval (band) theta joins: ``|a.x − b.y| < width``.

The reference's theta-join surface (analysisQueries.js:28-37) expresses
band predicates over scalar columns; a naive Spark plan for that condition
is a broadcast nested loop (fine while one side is tiny) or, with no
broadcastable side, a cartesian — the same |A|·|B| blowup the spatial
module solves with grid cells.  This module is the 1-D analog of
``operators/spatial_join``: candidates come from an equi-join on the value
bucket ``floor(x / width)``, with the build side exploded to its ±1
neighbor buckets so every true pair co-occurs in EXACTLY ONE bucket (the
probe row's own) — no duplicate pairs, no post-join distinct.

Physical shape at scale: both sides shuffle once on an 8-byte bucket key;
the residual ``|x − y| < width`` prunes in-bucket candidates inside
whole-stage codegen; per-bucket candidate density is bounded by the value
distribution at `width` granularity (AQE skew-join splits hot buckets).
Routing mirrors :func:`spatial_join.spatial_join`: the broadcast BNL form
is used only while :func:`spatial_join.bnlj_affordable` says both the
build side and the pair product fit the interactive micro tier.

Float caveat (documented, not observed): bucket assignment uses floating
``floor(x / width)``.  A pair straddling a bucket boundary could in
principle be missed if ``x / width`` rounds ACROSS an integer boundary —
that needs the true quotient within half an ulp of an integer (~1e-16 per
row); the residual predicate itself is always exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from overturemaps_duckdb_spark.operators.spatial_join import bnlj_affordable

_BK = "_ibj_bucket"


def interval_band_join(
    a: DataFrame,
    b: DataFrame,
    a_val: str,
    b_val: str,
    *,
    width: float,
    how: str = "inner",
    extra_cond: Column | None = None,
    broadcast_b: bool | None = None,
) -> DataFrame:
    """Join rows of `a` and `b` with ``|a[a_val] − b[b_val]| < width``.

    `how`: "inner" (both sides' columns), "left_semi" / "left_anti" (a's
    columns only).  `extra_cond` is AND-ed into the join condition (it is
    part of the EXISTS predicate for semi/anti) and must reference columns
    by unambiguous name — the two inputs must not share column names.
    `broadcast_b=None` auto-routes exactly like the spatial family: the
    broadcast theta form only while the pair product fits the micro tier,
    the bucketed equi-join otherwise.  Results are identical either way
    (pytest-asserted)."""
    overlap = set(a.columns) & set(b.columns)
    if overlap:
        raise ValueError(f"inputs must not share column names: {sorted(overlap)}")
    if broadcast_b is None:
        broadcast_b = bnlj_affordable(a, b)
    resid = F.abs(F.col(a_val) - F.col(b_val)) < width
    cond = resid if extra_cond is None else resid & extra_cond
    if broadcast_b:
        return a.join(F.broadcast(b), cond, how)
    ka = a.withColumn(_BK, F.floor(F.col(a_val) / F.lit(width)))
    b0 = F.floor(F.col(b_val) / F.lit(width))
    kb = b.withColumn(_BK, F.explode(F.array(b0 - 1, b0, b0 + 1)))
    joined = ka.join(kb, (ka[_BK] == kb[_BK]) & cond, how)
    return joined.drop(_BK)
