"""Node-state-machine tests mirroring the reference's store.test.js:28-93
(auto source/union creation, table dedup, source promotion on removal,
sql_override clearing)."""

from __future__ import annotations

from overturemaps_duckdb_spark.plans.nodes import PipelineState
from overturemaps_duckdb_spark.plans.pipeline import Node


def test_first_loaded_table_becomes_source():
    s = PipelineState()
    n = s.add_loaded_table("places_place", "places/place")
    assert n.type == "source" and n.op is None and n.id == "p1"


def test_subsequent_tables_become_union_combines():
    s = PipelineState()
    s.add_loaded_table("a", "ka")
    n2 = s.add_loaded_table("b", "kb")
    n3 = s.add_loaded_table("c", "kc")
    assert (n2.type, n2.op) == ("combine", "union")
    assert (n3.type, n3.op) == ("combine", "union")
    assert [n.id for n in s.nodes] == ["p1", "p2", "p3"]


def test_duplicate_table_ignored():
    s = PipelineState()
    s.add_loaded_table("a", "ka")
    assert s.add_loaded_table("a", "ka") is None
    assert len(s.nodes) == 1
    # loaded but node manually present → no duplicate node either
    s.nodes.append(Node(id="x", type="combine", op="union", table="b", key="kb"))
    assert s.add_loaded_table("b", "kb") is None
    assert len(s.nodes) == 2


def test_remove_source_promotes_first_remaining():
    s = PipelineState()
    s.add_loaded_table("a", "ka")
    s.add_loaded_table("b", "kb")
    s.add_loaded_table("c", "kc")
    s.remove_node("p1")  # the source
    assert s.nodes[0].type == "source" and s.nodes[0].op is None
    assert s.nodes[0].table == "b"
    assert s.nodes[1].type == "combine"  # untouched


def test_remove_non_source_keeps_source():
    s = PipelineState()
    s.add_loaded_table("a", "ka")
    s.add_loaded_table("b", "kb")
    s.remove_node("p2")
    assert [n.table for n in s.nodes] == ["a"]
    assert s.nodes[0].type == "source"


def test_mutations_clear_sql_override():
    s = PipelineState()
    s.add_loaded_table("a", "ka")
    s.sql_override = "SELECT 1"
    s.add_node(Node(id="", type="combine", op="within", table="b", key="kb"))
    assert s.sql_override is None
    s.sql_override = "SELECT 2"
    s.remove_node("p2")
    assert s.sql_override is None
    s.sql_override = "SELECT 3"
    s.update_node("p1", distance=500.0)
    assert s.sql_override is None
    assert s.nodes[0].distance == 500.0


def test_state_feeds_compiler(spark):
    """The state machine's node list compiles directly."""
    from overturemaps_duckdb_spark.plans.pipeline import compile_pipeline
    from overturemaps_duckdb_spark.queries.pipeline import catalog_cs
    from tests.conftest import SF_SMOKE

    s = PipelineState()
    s.add_loaded_table("theme_customer", "places/customer")
    s.add_loaded_table("theme_supplier", "places/supplier")
    df = compile_pipeline(catalog_cs(spark, SF_SMOKE), s.nodes, limit=10)
    assert df.count() == 10
