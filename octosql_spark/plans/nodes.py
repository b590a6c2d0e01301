"""Logical plan IR (SURVEY.md §7 sketch item 4).

The reference's pipeline is AST → logical.Node → physical.Node →
execution.Node (SURVEY.md §3). Here the "physical plan" and
"execution" stages ARE Catalyst + Tungsten, so this IR is one thin
layer: declarative node dataclasses that ``compile`` to a DataFrame
(each node ≈ a few lines of PySpark, per the §2 mapping column) and
render an ``explain`` tree like the reference's ``--explain``.

Node set mirrors logical/*.go: Datasource (logical/logical.go:124+),
Filter (logical/filter.go), Map (logical/map.go), GroupBy
(logical/group_by.go), Join (logical/join.go), Distinct
(logical/distinct.go), OrderLimit (order_sensitive_transform),
Unnest (logical/map.go:80-97), With (CTE), SetOp (union nodes).

The reference runs 8 rewrite rules over its plan (SURVEY.md §4); we
deliberately run none — every one of them (predicate pushdown through
joins and into scans, projection pruning, filter merging, equi-key
extraction) is a Catalyst builtin, checked in tests/test_plans.py by
inspecting the physical plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from octosql_spark.operators import (
    group_by as _group_by, order_by_limit as _order_limit,
    stream_join, outer_join, lookup_join, cross_join, semi_join, anti_join,
    theta_join, union_all, union_distinct, intersect, except_all,
    unnest as _unnest,
)


@dataclass
class Node:
    def compile(self, spark: SparkSession,
                ctes: dict[str, DataFrame] | None = None) -> DataFrame:
        raise NotImplementedError

    def children(self) -> list["Node"]:
        return []

    def label(self) -> str:
        return type(self).__name__


@dataclass
class Datasource(Node):
    """Named table (catalog/temp view) — the reference resolves these
    through its DatasourceRepository (physical/physical.go:52-63)."""
    name: str
    alias: str | None = None

    def compile(self, spark, ctes=None):
        if ctes and self.name in ctes:
            df = ctes[self.name]
        else:
            df = spark.table(self.name)
        # Requalifier (logical/requalifier.go): re-alias the relation
        return df.alias(self.alias) if self.alias else df

    def label(self):
        a = f" AS {self.alias}" if self.alias else ""
        return f"Datasource[{self.name}{a}]"


@dataclass
class FileSource(Node):
    """Extension-dispatched file table (cmd/root.go:192-198)."""
    path: str
    options: dict = dfield(default_factory=dict)
    alias: str | None = None

    def compile(self, spark, ctes=None):
        from octosql_spark.sources import read_file
        df = read_file(spark, self.path, **self.options)
        return df.alias(self.alias) if self.alias else df

    def label(self):
        return f"FileSource[{self.path}]"


@dataclass
class Filter(Node):
    source: Node
    predicate: Column

    def compile(self, spark, ctes=None):
        return self.source.compile(spark, ctes).filter(self.predicate)

    def children(self):
        return [self.source]


@dataclass
class Map(Node):
    """Projection (execution/nodes/map.go:22-44); exprs are Columns or
    column-name strings (star expansion via '*' / 't.*')."""
    source: Node
    exprs: Sequence[Column | str]

    def compile(self, spark, ctes=None):
        return self.source.compile(spark, ctes).select(*self.exprs)

    def children(self):
        return [self.source]


@dataclass
class GroupBy(Node):
    source: Node
    keys: Sequence[str | Column]
    aggregates: Sequence[tuple[str, str | Column, str]]
    having: Column | None = None

    def compile(self, spark, ctes=None):
        out = _group_by(self.source.compile(spark, ctes),
                        list(self.keys), list(self.aggregates))
        # HAVING: absent in the reference's parser (SURVEY §2.4) but
        # free on Spark — a filter above the aggregate.
        return out.filter(self.having) if self.having is not None else out

    def children(self):
        return [self.source]


@dataclass
class Join(Node):
    left: Node
    right: Node
    on: object  # key list / (l,r) pairs / Column condition
    how: str = "inner"       # inner/left/right/full/cross/semi/anti
    strategy: str = "stream"  # stream | lookup (broadcast right)

    def compile(self, spark, ctes=None):
        ldf = self.left.compile(spark, ctes)
        rdf = self.right.compile(spark, ctes)
        if self.how == "cross":
            return cross_join(ldf, rdf)
        if self.how == "semi":
            return semi_join(ldf, rdf, self.on)
        if self.how == "anti":
            return anti_join(ldf, rdf, self.on)
        if self.strategy == "lookup":
            return lookup_join(ldf, rdf, self.on, self.how)
        if isinstance(self.on, Column):
            return theta_join(ldf, rdf, self.on, self.how)
        if self.how in ("left", "right", "full"):
            return outer_join(ldf, rdf, self.on, self.how)
        return stream_join(ldf, rdf, self.on, self.how)

    def children(self):
        return [self.left, self.right]

    def label(self):
        return f"Join[{self.how}, {self.strategy}]"


@dataclass
class Distinct(Node):
    source: Node
    subset: list[str] | None = None

    def compile(self, spark, ctes=None):
        from octosql_spark.operators import distinct
        return distinct(self.source.compile(spark, ctes), self.subset)

    def children(self):
        return [self.source]


@dataclass
class OrderLimit(Node):
    """ORDER BY/LIMIT — kept outside the main plan by the reference
    (OutputOptions, parser/parser.go:49-53); here a normal node."""
    source: Node
    order: Sequence[tuple[str | Column, str]] = ()
    limit: int | None = None

    def compile(self, spark, ctes=None):
        return _order_limit(self.source.compile(spark, ctes),
                            list(self.order), self.limit)

    def children(self):
        return [self.source]

    def label(self):
        return f"OrderLimit[limit={self.limit}]"


@dataclass
class Unnest(Node):
    source: Node
    col: str
    alias: str = "unnest"
    outer: bool = False

    def compile(self, spark, ctes=None):
        return _unnest(self.source.compile(spark, ctes), self.col,
                       self.alias, outer=self.outer)

    def children(self):
        return [self.source]


@dataclass
class SetOp(Node):
    op: str  # union_all | union_distinct | intersect | except
    left: Node
    right: Node

    def compile(self, spark, ctes=None):
        l = self.left.compile(spark, ctes)
        r = self.right.compile(spark, ctes)
        return {"union_all": union_all, "union_distinct": union_distinct,
                "intersect": intersect,
                "except": lambda a, b: except_all(a, b, all=False)}[self.op](l, r)

    def children(self):
        return [self.left, self.right]

    def label(self):
        return f"SetOp[{self.op}]"


@dataclass
class With(Node):
    """CTEs (the reference's With node, parser/parser.go)."""
    ctes: Sequence[tuple[str, Node]]
    body: Node

    def compile(self, spark, ctes=None):
        scope = dict(ctes or {})
        for name, node in self.ctes:
            scope[name] = node.compile(spark, scope)
        return self.body.compile(spark, scope)

    def children(self):
        return [n for _, n in self.ctes] + [self.body]


def explain(node: Node, indent: int = 0) -> str:
    """Render the logical tree like the reference's --explain graph
    (cmd/root.go --explain; ours also has Catalyst's df.explain for
    the physical side)."""
    out = "  " * indent + node.label() + "\n"
    for c in node.children():
        out += explain(c, indent + 1)
    return out
