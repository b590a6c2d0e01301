"""Graphviz plan rendering — the reference's ``--explain`` graph
format (helpers/graph/graph.go: record-shaped nodes ``{{<f0> Name}|
{<field> field: value}|{<child> child}}``, ``rankdir=LR``, port edges
parent:child -> child-node; cmd/root.go:321-337 pipes the text to
``dot -Tpng`` and opens the image). This container is headless, so
``--explain-dot`` prints the DOT TEXT instead — ``dot -Tpng`` on any
workstation reproduces the reference workflow exactly.

The graph walks the ANALYZED Catalyst logical plan (the closest
analogue of the reference's physical plan tree: named operators with
resolved fields). Expression ids (``#123``) are stripped so the text
is deterministic across sessions — required for the golden test and
for diffing two runs of the same query.
"""

from __future__ import annotations

import re


class GraphNode:
    """Mirror of helpers/graph.Node: a name, ordered (name, value)
    fields, and ordered (edge-name, child) pairs (empty edge name =
    plain unported edge, as in graph.go:118-126)."""

    def __init__(self, name: str):
        self.name = name
        self.fields: list[tuple[str, str]] = []
        self.children: list[tuple[str, "GraphNode"]] = []

    def add_field(self, name: str, value: str) -> None:
        self.fields.append((name, value))

    def add_child(self, name: str, node: "GraphNode") -> None:
        self.children.append((name, node))


_JOIN_PORTS = ("left", "right")


def analyzed_graph(df) -> GraphNode:
    """GraphNode tree of ``df``'s analyzed logical plan. Join children
    get the reference's named ports (left/right); other edges are
    plain. Fields carry the operator's argString (resolved columns,
    predicates, relation format) with expression ids stripped."""
    return _walk(df._jdf.queryExecution().analyzed())


def _walk(jnode) -> GraphNode:
    name = jnode.nodeName()
    n = GraphNode(name)
    try:
        arg = jnode.argString(8)
    except Exception:  # noqa: BLE001 — node without argString
        arg = ""
    arg = re.sub(r"#\d+L?", "", arg or "").strip().strip(",").strip()
    if arg:
        n.add_field("args", arg)
    ch = jnode.children()
    size = ch.size()
    for i in range(size):
        port = ""
        if "Join" in name and size == 2 and i < 2:
            port = _JOIN_PORTS[i]
        n.add_child(port, _walk(ch.apply(i)))
    return n


def _esc(s: str) -> str:
    """Escape record-label metacharacters (graphviz record syntax)."""
    return re.sub(r'([{}|<>"\\])', r"\\\1", s)


def to_dot(root: GraphNode) -> str:
    """Serialize like graph.go's gographviz usage: node ids are
    ``<Name_N>`` (spaces → underscores, per-name counter), labels are
    record braces ``{{<f0> Name}|{fields...}|{child ports...}}``,
    edges leave the parent's child port when one is named."""
    counters: dict[str, int] = {}
    lines: list[str] = ["digraph  {", "\trankdir=LR;"]
    edges: list[str] = []

    def node_id(name: str) -> str:
        c = counters.get(name, 0)
        counters[name] = c + 1
        return f"<{name.replace(' ', '_')}_{c}>"

    def emit(node: GraphNode) -> str:
        parts = [f"<f0> {_esc(node.name)}"]
        fields = [f"<{fn}> {_esc(fn)}: {_esc(fv)}" if fv
                  else f"<{fn}> {_esc(fn)}"
                  for fn, fv in node.fields]
        ports = [f"<{cn}> {_esc(cn)}" for cn, _ in node.children if cn]
        label_parts = ["{" + parts[0] + "}"]
        if fields:
            label_parts.append("{" + "|".join(fields) + "}")
        if ports:
            label_parts.append("{" + "|".join(ports) + "}")
        label = "{" + "|".join(label_parts) + "}"
        nid = node_id(node.name)
        lines.append(f'\t"{nid}" [ label="{label}", shape=record ];')
        for cn, child in node.children:
            cid = emit(child)
            if cn:
                edges.append(f'\t"{nid}":"<{cn}>" -> "{cid}";')
            else:
                edges.append(f'\t"{nid}" -> "{cid}";')
        return nid

    emit(root)
    lines.extend(edges)
    lines.append("}")
    return "\n".join(lines) + "\n"
