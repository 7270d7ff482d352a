"""TQL recursive-descent parser.

Mirrors the productions of the reference's extended Hyrise grammar
(`bison_parser.y:789-841` select core; TQL additions: SAMPLE BY
:911-917, UNGROUP BY :899-906, EXPAND BY :875, GROUP BY ... ACROSS
:880-886, TOP :939, LIMIT PERCENT :950, pair-args :965-973) and the
documented dialect (docs/docs/advanced/tql.md): `==` equality, glob
LIKE/ILIKE, python-style `[]` indexing/slicing/JSON access, implicit
FROM (query runs against a bound dataset), `?` parameters.
"""

from __future__ import annotations

from deeplake_spark.tql import ast
from deeplake_spark.tql.lexer import Token, TQLSyntaxError, tokenize


class Parser:
    def __init__(self, text: str):
        self.toks = tokenize(text)
        self.i = 0
        self.n_params = 0

    # -- token helpers ------------------------------------------------------

    def peek(self, k: int = 0) -> Token:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def next_int(self) -> int:
        """Consume one token as a non-negative integer, raising
        TQLSyntaxError (not bare ValueError) on anything else — the
        is_valid() bool contract catches only TQLSyntaxError, so
        `LIMIT x` / `TOP 1.5` must not escape as a raw int() crash
        (r15 review, confirmed live)."""
        t = self.next()
        try:
            return int(t.value)
        except (TypeError, ValueError):
            raise TQLSyntaxError(
                f"expected an integer at {t.pos}, got {t.value!r}"
            ) from None

    def at_kw(self, *kws: str) -> bool:
        t = self.peek()
        return t.kind == "KEYWORD" and t.value in kws

    def eat_kw(self, *kws: str) -> Token:
        if not self.at_kw(*kws):
            raise TQLSyntaxError(f"expected {'/'.join(kws)} at {self.peek().pos}, got {self.peek().value!r}")
        return self.next()

    def try_kw(self, *kws: str) -> bool:
        if self.at_kw(*kws):
            self.next()
            return True
        return False

    def at_punct(self, p: str) -> bool:
        t = self.peek()
        return t.kind == "PUNCT" and t.value == p

    def eat_punct(self, p: str) -> Token:
        if not self.at_punct(p):
            raise TQLSyntaxError(f"expected {p!r} at {self.peek().pos}, got {self.peek().value!r}")
        return self.next()

    def try_punct(self, p: str) -> bool:
        if self.at_punct(p):
            self.next()
            return True
        return False

    # -- entry --------------------------------------------------------------

    def parse(self) -> ast.Node:
        node = self.parse_set_expr()
        if self.peek().kind != "EOF":
            raise TQLSyntaxError(f"trailing input at {self.peek().pos}: {self.peek().value!r}")
        return node

    def parse_set_expr(self) -> ast.Node:
        left = self.parse_select()
        while self.at_kw("UNION", "INTERSECT", "EXCEPT"):
            op = self.next().value
            if op == "UNION" and self.try_kw("ALL"):
                op = "UNION ALL"
            right = self.parse_select()
            node = ast.SetOp(op=op, left=left, right=right)
            # per-set-op ORDER/LIMIT (executor.hpp:96-98)
            node.order = self.parse_order_opt()
            node.limit = self.parse_limit_opt()
            left = node
        return left

    # -- select -------------------------------------------------------------

    def parse_select(self) -> ast.Select:
        self.eat_kw("SELECT")
        sel = ast.Select(items=[])
        top_n: int | None = None
        if self.try_kw("TOP"):  # y:939
            top_n = self.next_int()
        if self.try_kw("DISTINCT"):
            sel.distinct = True
        sel.items = self.parse_select_list()
        if self.try_kw("FROM"):
            sel.source = self.parse_source()
        if self.try_kw("WHERE"):
            sel.where = self.parse_expr()
        if self.at_kw("EXPAND"):  # y:875
            self.next()
            self.eat_kw("BY")
            h = self.next_int()
            w = self.next_int()
            overlap = False
            if self.peek().kind == "IDENT" and self.peek().value.upper() == "OVERLAP":
                self.next()
                t = self.next()
                overlap = t.value.upper() == "TRUE"
            alias = None
            if self.try_kw("AS"):
                alias = self.next().value
            sel.expand = ast.ExpandClause(height=h, width=w, overlap=overlap, alias=alias)
        if self.at_kw("GROUP"):  # y:880-886 — sequence packing, NOT aggregation
            self.next()
            self.eat_kw("BY")
            keys = [self.parse_expr()]
            while self.try_punct(","):
                keys.append(self.parse_expr())
            across = None
            if self.try_kw("ACROSS"):
                across = self.eat_kw("TIME", "SPACE").value
            sel.group = ast.GroupClause(keys=keys, across=across)
        if self.at_kw("HAVING"):
            self.next()
            sel.having = self.parse_expr()
        if self.at_kw("UNGROUP"):  # y:899-906
            self.next()
            self.eat_kw("BY")
            if self.try_kw("SPLIT"):
                sel.ungroup = ast.UngroupClause(split=True)
            else:
                sel.ungroup = ast.UngroupClause(split=False, by=self.parse_expr())
        if self.at_kw("SAMPLE"):  # y:911-917
            self.next()
            self.eat_kw("BY")
            weight = self.parse_expr()
            replace = False
            if self.try_kw("REPLACE"):
                replace = self.eat_kw("TRUE", "FALSE").value == "TRUE"
            sel.sample = ast.SampleClause(weight=weight, replace=replace)
        sel.order = self.parse_order_opt()
        sel.limit = self.parse_limit_opt()
        if top_n is not None:
            sel.limit = ast.Limit(n=top_n)
        return sel

    def parse_select_list(self) -> list[ast.SelectItem]:
        items = [self.parse_select_item()]
        while self.try_punct(","):
            items.append(self.parse_select_item())
        return items

    def parse_select_item(self) -> ast.SelectItem:
        if self.at_punct("*"):
            self.next()
            return ast.SelectItem(expr=ast.Star())
        expr = self.parse_expr()
        alias = None
        if self.try_kw("AS"):
            t = self.next()
            alias = t.value
        elif self.peek().kind == "IDENT" and not self.at_kw():
            # bare alias (ident directly after expr)
            alias = self.next().value
        return ast.SelectItem(expr=expr, alias=alias)

    def parse_source(self) -> ast.Node:
        left = self.parse_table_ref()
        while True:
            how = None
            if self.try_kw("CROSS"):
                self.eat_kw("JOIN")
                how = "cross"
            elif self.at_kw("JOIN", "INNER", "LEFT", "RIGHT", "FULL"):
                kw = self.next().value
                if kw == "INNER":
                    self.eat_kw("JOIN")
                    how = "inner"
                elif kw in ("LEFT", "RIGHT", "FULL"):
                    self.try_kw("OUTER")
                    self.eat_kw("JOIN")
                    how = kw.lower()
                else:
                    how = "inner"
            else:
                break
            right = self.parse_table_ref()
            on = None
            using = None
            if how != "cross":
                if self.try_kw("ON"):
                    on = self.parse_expr()
                elif self.try_kw("USING"):
                    self.eat_punct("(")
                    using = [self.next().value]
                    while self.try_punct(","):
                        using.append(self.next().value)
                    self.eat_punct(")")
            left = ast.Join(left=left, right=right, how=how, on=on, using=using)
        return left

    def parse_table_ref(self) -> ast.Node:
        if self.try_punct("("):
            sub = self.parse_set_expr()
            self.eat_punct(")")
            alias = None
            if self.try_kw("AS"):
                alias = self.next().value
            elif self.peek().kind == "IDENT":
                alias = self.next().value
            if isinstance(sub, ast.Select):
                return ast.SubQuery(select=sub, alias=alias)
            return ast.SubQuery(select=sub, alias=alias)  # SetOp subquery
        t = self.next()
        if t.kind not in ("IDENT", "STRING"):
            raise TQLSyntaxError(f"expected table name at {t.pos}")
        alias = None
        if self.try_kw("AS"):
            alias = self.next().value
        elif self.peek().kind == "IDENT":
            alias = self.next().value
        return ast.TableRef(name=t.value, alias=alias)

    def parse_order_opt(self) -> list[ast.OrderItem]:
        if not self.at_kw("ORDER"):
            return []
        self.next()
        self.eat_kw("BY")
        items = [self.parse_order_item()]
        while self.try_punct(","):
            items.append(self.parse_order_item())
        return items

    def parse_order_item(self) -> ast.OrderItem:
        e = self.parse_expr()
        desc = False
        if self.try_kw("DESC"):
            desc = True
        else:
            self.try_kw("ASC")
        return ast.OrderItem(expr=e, desc=desc)

    def parse_limit_opt(self) -> ast.Limit | None:
        if not self.at_kw("LIMIT"):
            return None
        self.next()
        n = self.next_int()
        if self.try_kw("PERCENT"):  # y:950
            return ast.Limit(n=n, percent=True)
        offset = 0
        if self.try_kw("OFFSET"):
            offset = self.next_int()
        return ast.Limit(n=n, offset=offset)

    # -- expressions --------------------------------------------------------

    def parse_expr(self) -> ast.Node:
        return self.parse_or()

    def parse_or(self) -> ast.Node:
        left = self.parse_and()
        while self.at_kw("OR"):
            self.next()
            left = ast.BinaryOp("OR", left, self.parse_and())
        return left

    def parse_and(self) -> ast.Node:
        left = self.parse_not()
        while self.at_kw("AND"):
            self.next()
            left = ast.BinaryOp("AND", left, self.parse_not())
        return left

    def parse_not(self) -> ast.Node:
        if self.at_kw("NOT"):
            self.next()
            return ast.UnaryOp("NOT", self.parse_not())
        return self.parse_comparison()

    def parse_comparison(self) -> ast.Node:
        left = self.parse_additive()
        t = self.peek()
        if t.kind == "PUNCT" and t.value in ("==", "=", "!=", "<>", "<", "<=", ">", ">="):
            op = self.next().value
            op = {"=": "==", "<>": "!="}.get(op, op)
            return ast.BinaryOp(op, left, self.parse_additive())
        negated = False
        if self.at_kw("NOT"):
            nxt = self.peek(1)
            if nxt.kind == "KEYWORD" and nxt.value in ("LIKE", "ILIKE", "IN"):
                self.next()
                negated = True
        if self.at_kw("LIKE", "ILIKE"):
            kw = self.next().value
            pat = self.next()
            if pat.kind != "STRING":
                raise TQLSyntaxError(f"LIKE pattern must be a string at {pat.pos}")
            return ast.LikeOp(left, pat.value, case_insensitive=kw == "ILIKE", negated=negated)
        if self.at_kw("IN"):
            self.next()
            self.eat_punct("(")
            items = [self.parse_expr()]
            while self.try_punct(","):
                items.append(self.parse_expr())
            self.eat_punct(")")
            return ast.InOp(left, items, negated=negated)
        if self.at_kw("BETWEEN"):
            self.next()
            low = self.parse_additive()
            self.eat_kw("AND")
            high = self.parse_additive()
            return ast.BetweenOp(left, low, high)
        if self.at_kw("IS"):
            self.next()
            neg = self.try_kw("NOT")
            self.eat_kw("NULL")
            return ast.IsNullOp(left, negated=neg)
        return left

    def parse_additive(self) -> ast.Node:
        left = self.parse_multiplicative()
        while self.peek().kind == "PUNCT" and self.peek().value in ("+", "-"):
            op = self.next().value
            left = ast.BinaryOp(op, left, self.parse_multiplicative())
        return left

    def parse_multiplicative(self) -> ast.Node:
        left = self.parse_unary()
        while self.peek().kind == "PUNCT" and self.peek().value in ("*", "/", "%"):
            op = self.next().value
            left = ast.BinaryOp(op, left, self.parse_unary())
        return left

    def parse_unary(self) -> ast.Node:
        if self.at_punct("-"):
            self.next()
            return ast.UnaryOp("-", self.parse_unary())
        return self.parse_postfix()

    def parse_postfix(self) -> ast.Node:
        node = self.parse_primary()
        while True:
            if self.try_punct("["):
                node = self.parse_index(node)
            elif self.at_punct(".") and isinstance(node, ast.ColumnRef) and node.table is None:
                self.next()
                attr = self.next()
                node = ast.ColumnRef(name=attr.value, table=node.name)
            else:
                break
        return node

    def parse_index(self, operand: ast.Node) -> ast.Node:
        """col[i], col[-1], col['key'], col[a:b:c], and multi-dim
        subscripts boxes[:, 0] / boxes[0, :] / boxes[:, 2:4]
        (expr.hpp:255-318, tql.md:594-604). Each comma starts the next
        dimension; an index dim consumes a rank while a slice dim keeps
        it, so the mapping depth of dim i is the number of slice dims
        before it."""
        node = operand
        depth = 0
        while True:
            parts: list[ast.Node | None] = []
            cur: ast.Node | None = None
            saw_colon = False
            while True:
                if self.at_punct("]") or self.at_punct(","):
                    break
                if self.try_punct(":"):
                    saw_colon = True
                    parts.append(cur)
                    cur = None
                    continue
                cur = self.parse_expr()
            parts.append(cur)
            if not saw_colon:
                if parts[0] is None:
                    raise TQLSyntaxError("empty index")
                node = ast.Index(node, parts[0], depth=depth)
            else:
                while len(parts) < 3:
                    parts.append(None)
                node = ast.Slice(node, parts[0], parts[1], parts[2], depth=depth)
                depth += 1
            if self.try_punct(","):
                continue
            self.eat_punct("]")
            break
        return node

    def parse_primary(self) -> ast.Node:
        t = self.peek()
        if t.kind == "NUMBER":
            self.next()
            v = float(t.value) if ("." in t.value or "e" in t.value.lower()) else int(t.value)
            return ast.Literal(v)
        if t.kind == "STRING":
            self.next()
            return ast.Literal(t.value)
        if t.kind == "PUNCT" and t.value == "?":
            self.next()
            p = ast.Param(self.n_params)
            self.n_params += 1
            return p
        if t.kind == "PUNCT" and t.value == "(":
            self.next()
            e = self.parse_expr()
            self.eat_punct(")")
            return e
        if t.kind == "PUNCT" and t.value == "*":
            self.next()
            return ast.Star()
        if t.kind == "KEYWORD" and t.value in ("TRUE", "FALSE"):
            self.next()
            return ast.Literal(t.value == "TRUE")
        if t.kind == "KEYWORD" and t.value == "NULL":
            self.next()
            return ast.Literal(None)
        if t.kind == "KEYWORD" and t.value == "ALL":
            # ALL(...) is also a function name (y:1053)
            self.next()
            return self.parse_call("ALL")
        if t.kind == "IDENT":
            self.next()
            if self.at_punct("("):
                return self.parse_call(t.value.upper())
            return ast.ColumnRef(name=t.value)
        raise TQLSyntaxError(f"unexpected token {t.value!r} at {t.pos}")

    def parse_call(self, name: str) -> ast.FuncCall:
        self.eat_punct("(")
        call = ast.FuncCall(name=name)
        if self.try_punct(")"):
            return call
        if self.at_punct("*"):  # COUNT(*)
            self.next()
            call.args.append(ast.Star())
            self.eat_punct(")")
            return call
        while True:
            e = self.parse_expr()
            if self.try_punct(":"):  # pair arg `cond: weight` (y:965-973)
                w = self.parse_expr()
                call.pairs.append((e, w))
            else:
                call.args.append(e)
            if self.try_punct(","):
                continue
            self.eat_punct(")")
            break
        return call


def parse_query(text: str) -> ast.Node:
    """Parse TQL text → AST (tql::parse_query, cpp/tql/tql.hpp:134-162)."""
    return Parser(text).parse()


def is_valid(text: str) -> bool:
    try:
        parse_query(text)
        return True
    except TQLSyntaxError:
        return False
