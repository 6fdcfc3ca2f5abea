"""Pipeline-node state machine (SURVEY §1.1-4 "store" layer).

The reference keeps the node list in a reactive store with invariants the
UI relies on (`/root/reference/src/lib/store.js:172-227`, tested in
`store.test.js:28-93`):

- a newly loaded table auto-appends a node: `source` if the pipeline is
  empty, else a `union` combine (store.js:177-196); duplicates by table are
  ignored;
- removing the source promotes the first remaining node to `source` and
  clears its op (store.js:206-217);
- node ids are `p1, p2, …` from a monotone counter (store.js:173-175);
- every mutation clears the user's `sql_override`
  (store.js:199-203,216,222).

This module is the engine-side twin; `PipelineState.nodes` feeds
plans.pipeline.compile_pipeline directly."""

from __future__ import annotations

from dataclasses import dataclass, field

from overturemaps_duckdb_spark.plans.pipeline import Node


@dataclass
class PipelineState:
    nodes: list[Node] = field(default_factory=list)
    loaded_tables: list[str] = field(default_factory=list)
    sql_override: str | None = None
    _counter: int = 0

    def _next_id(self) -> str:
        self._counter += 1
        return f"p{self._counter}"

    def add_loaded_table(self, table: str, key: str) -> Node | None:
        """Auto-append a node for a newly loaded table (store.js:177-196)."""
        if table in self.loaded_tables:
            return None
        self.loaded_tables.append(table)
        if any(n.table == table for n in self.nodes):
            return None
        first = not self.nodes
        node = Node(
            id=self._next_id(),
            type="source" if first else "combine",
            op=None if first else "union",
            table=table,
            key=key,
        )
        self.nodes.append(node)
        return node

    def add_node(self, node: Node) -> Node:
        """Explicit node add (store.js:199-203)."""
        if not node.id:
            node.id = self._next_id()
        self.nodes.append(node)
        self.sql_override = None
        return node

    def remove_node(self, node_id: str) -> None:
        """Remove + source-promotion invariant (store.js:206-217)."""
        self.nodes = [n for n in self.nodes if n.id != node_id]
        if self.nodes and not any(n.type == "source" for n in self.nodes):
            head = self.nodes[0]
            head.type = "source"
            head.op = None
        self.sql_override = None

    def update_node(self, node_id: str, **patch) -> None:
        """Patch one node (store.js:220-224)."""
        for n in self.nodes:
            if n.id == node_id:
                for k, v in patch.items():
                    setattr(n, k, v)
        self.sql_override = None

    def clear(self) -> None:
        self.nodes = []
        self.sql_override = None
