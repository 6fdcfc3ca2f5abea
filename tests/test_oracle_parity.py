"""THE correctness gate (local twin of the driver's t2 check): every
registered query with an oracle must match DuckDB on row count, schema and
order-insensitive values at sf0.01."""

from __future__ import annotations

import pytest

from overturemaps_duckdb_spark import queries as q
from tests.conftest import SF_CORRECTNESS
from tests.oracle_harness import compare, duckdb_connection

q.load_all()

_NAMES = sorted(q.QUERIES)


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(SF_CORRECTNESS)
    yield con
    con.close()


@pytest.mark.parametrize("name", _NAMES)
def test_query_matches_oracle(name, spark, duck):
    fn = q.QUERIES[name]
    df = fn(spark, SF_CORRECTNESS)
    oracle = q.ORACLES.get(name)
    if oracle is None:
        # rows-only check (engine-specific ops, by design)
        assert df.count() >= 0
        return
    result = compare(name, df, duck, oracle)
    assert result.ok, str(result)
