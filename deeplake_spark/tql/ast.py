"""TQL AST nodes — the translator's IR.

Shape mirrors the reference's lowered statement:
`query_core::statement = {select_list, where, order, limit, sampler,
group, ungroup}` (cpp/query_core/statement.hpp:86-106) plus set ops
(:15-20) and joins (tql::table, cpp/tql/table.hpp:33-78).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Node:
    pass


# --- expressions -----------------------------------------------------------


@dataclass
class Literal(Node):
    value: object  # int | float | str | bool | None


@dataclass
class Param(Node):
    index: int  # ?-parameter ordinal (expr.hpp:106-126)


@dataclass
class ColumnRef(Node):
    name: str
    table: str | None = None


@dataclass
class Star(Node):
    pass


@dataclass
class UnaryOp(Node):
    op: str  # '-', 'NOT'
    operand: Node


@dataclass
class BinaryOp(Node):
    op: str  # + - * / % == != < <= > >= AND OR
    left: Node
    right: Node


@dataclass
class LikeOp(Node):
    operand: Node
    pattern: str
    case_insensitive: bool = False
    negated: bool = False


@dataclass
class InOp(Node):
    operand: Node
    items: list[Node]
    negated: bool = False


@dataclass
class BetweenOp(Node):
    operand: Node
    low: Node
    high: Node


@dataclass
class IsNullOp(Node):
    operand: Node
    negated: bool = False


@dataclass
class FuncCall(Node):
    name: str  # upper-cased
    args: list[Node] = field(default_factory=list)
    pairs: list[tuple[Node, Node]] = field(default_factory=list)  # cond: weight


@dataclass
class Index(Node):
    operand: Node
    index: Node  # int / string / dynamic expr (expr.hpp:255-301)
    #: nesting depth for multi-dim subscripts (expr.hpp:303-318):
    #: boxes[:, 0] indexes each element of the outer list (depth 1)
    depth: int = 0


@dataclass
class Slice(Node):
    operand: Node
    start: Node | None
    stop: Node | None
    step: Node | None
    depth: int = 0


# --- statement parts -------------------------------------------------------


@dataclass
class SelectItem(Node):
    expr: Node
    alias: str | None = None


@dataclass
class OrderItem(Node):
    expr: Node
    desc: bool = False


@dataclass
class TableRef(Node):
    name: str  # table name or URL
    alias: str | None = None


@dataclass
class Join(Node):
    left: Node  # TableRef | Join | SubQuery
    right: Node
    how: str  # inner/left/right/full/cross
    on: Node | None = None  # predicate
    using: list[str] | None = None


@dataclass
class SubQuery(Node):
    select: "Select"
    alias: str | None = None


@dataclass
class GroupClause(Node):
    keys: list[Node]
    across: str | None = None  # TIME | SPACE


@dataclass
class UngroupClause(Node):
    split: bool = True
    by: Node | None = None


@dataclass
class ExpandClause(Node):
    height: int = 0
    width: int = 0
    overlap: bool = False
    alias: str | None = None


@dataclass
class SampleClause(Node):
    weight: Node
    replace: bool = False


@dataclass
class Limit(Node):
    n: int
    offset: int = 0
    percent: bool = False


@dataclass
class Select(Node):
    items: list[SelectItem]
    source: Node | None = None  # TableRef | Join | SubQuery | None (bound ds)
    where: Node | None = None
    group: GroupClause | None = None
    ungroup: UngroupClause | None = None
    expand: ExpandClause | None = None
    sample: SampleClause | None = None
    order: list[OrderItem] = field(default_factory=list)
    limit: Limit | None = None
    distinct: bool = False
    having: Node | None = None


@dataclass
class SetOp(Node):
    op: str  # UNION | UNION ALL | INTERSECT | EXCEPT
    left: Node  # Select | SetOp
    right: Node
    order: list[OrderItem] = field(default_factory=list)
    limit: Limit | None = None
