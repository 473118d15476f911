"""Recursive-descent parser for the Cypher subset the reference uses.

Covers every construct in the reference's read statements
(app.py:62-66, 189-193, 217-231, 257-260, 272-276, 288-292, 375-381,
411-415, 440-445; train_fix.py:18-60): MATCH / OPTIONAL MATCH with
node-and-relationship path patterns (labels, property maps, types,
all three directions), WHERE with AND/OR/NOT, IN, CONTAINS,
comparisons, WITH chaining with implicit-grouping aggregation
(count/collect/sum), CASE WHEN, RETURN with aliases, ORDER BY
ASC/DESC, LIMIT, ``$parameters``, string/number/bool/null/list
literals and ``//`` comments. Nothing engine-specific lives here —
the output is a plain AST; compiler.py lowers it to DataFrame ops.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


# --------------------------------------------------------------------------
# AST
# --------------------------------------------------------------------------


@dataclass
class NodePat:
    var: str | None
    label: str | None
    props: dict[str, "Expr"] = field(default_factory=dict)


@dataclass
class RelPat:
    var: str | None
    rtype: str | None  # str | tuple[str, ...] | None
    direction: str  # 'out' | 'in' | 'any'
    min_hops: int = 1  # variable-length `*m..n`; fixed hop = (1, 1)
    max_hops: int = 1


@dataclass
class Path:
    # nodes[0], then (rels[i], nodes[i+1]) hops
    nodes: list[NodePat]
    rels: list[RelPat]
    # `p = (a)-[..]-(b)` binds p; shortest is None | 'one' | 'all' for
    # shortestPath(...) / allShortestPaths(...)
    var: str | None = None
    shortest: str | None = None


@dataclass
class MatchClause:
    paths: list[Path]
    optional: bool = False
    where: "Expr | None" = None


@dataclass
class Item:
    expr: "Expr"
    alias: str | None


@dataclass
class WithClause:
    items: list[Item]
    where: "Expr | None" = None
    order_by: list = field(default_factory=list)
    limit: int | None = None
    skip: int | None = None
    distinct: bool = False


@dataclass
class OrderItem:
    expr: "Expr"
    asc: bool = True


@dataclass
class ReturnClause:
    items: list[Item]
    order_by: list[OrderItem] = field(default_factory=list)
    limit: int | None = None
    distinct: bool = False
    skip: int | None = None


@dataclass
class UnwindClause:
    expr: object
    alias: str


@dataclass
class MergeClause:
    path: Path
    on_create: list = field(default_factory=list)  # [SetClause]
    on_match: list = field(default_factory=list)  # [SetClause]


@dataclass
class SetClause:
    assigns: list  # [(Prop, Expr)]
    map_assigns: list = field(default_factory=list)  # [(var, Expr)] for +=


@dataclass
class DetachDeleteClause:
    var: str


@dataclass
class CreateConstraintClause:
    label: str
    prop: str


@dataclass
class RemoveClause:
    props: list  # [Prop]


@dataclass
class CreateClause:
    path: Path


@dataclass
class ForeachClause:
    # FOREACH (var IN src | SET ...) — batch property updates over a
    # bound list (collected nodes, nodes(path), ...)
    var: str
    src: object
    body: list  # [SetClause]


WRITE_CLAUSES = (MergeClause, SetClause, DetachDeleteClause,
                 CreateConstraintClause, RemoveClause, CreateClause,
                 ForeachClause)


@dataclass
class CallClause:
    # CALL { [WITH imports] ... RETURN ... } — subquery per input row.
    # imports = leading simple-variable WITH (Cypher's import form);
    # empty imports = uncorrelated subquery. optional = OPTIONAL CALL
    # (zero-row subquery results keep the input row, null-extended).
    query: "Query"
    imports: list  # [str] imported outer variable names
    optional: bool = False


@dataclass
class Query:
    clauses: list

    @property
    def is_write(self) -> bool:
        return any(isinstance(c, WRITE_CLAUSES) for c in self.clauses)


@dataclass
class UnionQuery:
    # part UNION [ALL] part ... — homogenous mode (Cypher forbids mixing)
    queries: list["Query"]
    distinct: bool  # UNION = True, UNION ALL = False

    @property
    def is_write(self) -> bool:
        return False


# Expressions
@dataclass
class Var:
    name: str


@dataclass
class Prop:
    var: str
    name: str


@dataclass
class Param:
    name: str


@dataclass
class Lit:
    value: object


@dataclass
class ListLit:
    items: list


@dataclass
class Func:
    name: str
    args: list
    distinct: bool = False


@dataclass
class BinOp:
    op: str  # '=', '<>', '<', '>', '<=', '>=', 'IN', 'CONTAINS', 'AND', 'OR'
    left: object
    right: object


@dataclass
class Not:
    expr: object


@dataclass
class CaseWhen:
    whens: list  # [(cond, value)]
    default: object


@dataclass
class ListComp:
    # [var IN src WHERE where | map_expr]
    var: str
    src: object
    where: object | None = None
    map_expr: object | None = None


@dataclass
class QuantPred:
    # any/all/none/single(var IN src WHERE where)
    kind: str
    var: str
    src: object
    where: object = None


@dataclass
class ReduceExpr:
    # reduce(acc = init, var IN src | body)
    acc: str
    init: object
    var: str
    src: object
    body: object = None


@dataclass
class PatternComp:
    # [(a)-[:T]-(b) WHERE pred | expr] — pattern comprehension
    path: "Path"
    where: object | None
    map_expr: object


@dataclass
class Star:
    # the `*` in RETURN * / WITH * — expanded to all bound variables
    pass


@dataclass
class MapLit:
    # `{key: expr, ...}` — a literal map (compiled to a named struct)
    entries: list  # [(key, Expr)]


@dataclass
class MapProj:
    # `n {.prop, key: expr, .*}` — map projection on a node variable
    var: str
    entries: list  # [("prop", name)] | [("expr", key, Expr)] | [("all",)]


@dataclass
class FieldAccess:
    # `expr.field` where expr is a map/struct-valued expression
    # (function result, map literal/projection, parenthesized expr)
    expr: object
    name: str


@dataclass
class Subscript:
    # `xs[i]` — 0-based element access (negative = from the end)
    expr: object
    index: object


@dataclass
class Slice:
    # `xs[a..b]` — 0-based, end-exclusive list slice (Cypher semantics);
    # either bound may be None (open end)
    expr: object
    lo: object
    hi: object


@dataclass
class ExistsSub:
    # EXISTS { [MATCH] pattern [WHERE expr] }
    path: "Path"
    where: object | None = None


@dataclass
class CountSub:
    # COUNT { [MATCH] pattern [WHERE expr] }
    path: "Path"
    where: object | None = None


@dataclass
class PatternPred:
    """`WHERE [NOT] (a)-[:T]-(b)` — an existential pattern predicate."""

    path: Path


Expr = object  # documentation alias


# --------------------------------------------------------------------------
# Lexer
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>//[^\n]*)
  | (?P<arrow_in><-)
  | (?P<arrow_out>->)
  | (?P<ne><>)
  | (?P<le><=)
  | (?P<ge>>=)
  | (?P<regex>=~)
  | (?P<num>\d+(\.\d+)?)
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<param>\$[A-Za-z_][A-Za-z0-9_]*)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<punct>[()\[\]{},.:=<>|;*+/%-])
    """,
    re.VERBOSE,
)

KEYWORDS = {
    "MATCH", "OPTIONAL", "WHERE", "WITH", "RETURN", "ORDER", "BY",
    "LIMIT", "AS", "AND", "OR", "NOT", "IN", "CONTAINS", "CASE",
    "WHEN", "THEN", "ELSE", "END", "ASC", "DESC", "DISTINCT",
    "TRUE", "FALSE", "NULL",
    # write-side subset (get_insert.py / app.py predict writeback)
    "MERGE", "SET", "DELETE", "DETACH", "CREATE", "CONSTRAINT",
    "FOR", "REQUIRE", "IS", "UNIQUE", "IF", "EXISTS", "ON", "SKIP",
    "UNWIND", "STARTS", "ENDS", "UNION", "REMOVE", "CALL", "FOREACH",
}


@dataclass
class Tok:
    kind: str  # 'kw' | 'name' | 'num' | 'str' | 'param' | punct literal
    text: str


def tokenize(src: str) -> list[Tok]:
    toks: list[Tok] = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise SyntaxError(f"cypher: cannot tokenize at {src[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        text = m.group()
        if kind in ("ws", "comment"):
            continue
        if kind == "name":
            up = text.upper()
            if up in KEYWORDS:
                toks.append(Tok("kw", up))
            else:
                toks.append(Tok("name", text))
        elif kind in ("arrow_in", "arrow_out", "ne", "le", "ge", "regex", "punct"):
            toks.append(Tok(text, text))
        elif kind == "num":
            toks.append(Tok("num", text))
        elif kind == "str":
            body = text[1:-1]
            if "\\" in body:
                body = (
                    body.replace("\\\\", "\x00")
                    .replace("\\'", "'")
                    .replace('\\"', '"')
                    .replace("\\n", "\n")
                    .replace("\\t", "\t")
                    .replace("\x00", "\\")
                )
            toks.append(Tok("str", body))
        elif kind == "param":
            toks.append(Tok("param", text[1:]))
    return toks


# --------------------------------------------------------------------------
# Parser
# --------------------------------------------------------------------------

AGG_FUNCS = {
    "count", "collect", "sum", "min", "max", "avg",
    "percentilecont", "percentiledisc", "stdev", "stdevp",
}


class Parser:
    def __init__(self, src: str):
        self.toks = tokenize(src)
        self.i = 0

    # -- token helpers --
    def peek(self, k: int = 0) -> Tok | None:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def at(self, kind: str, text: str | None = None) -> bool:
        t = self.peek()
        return t is not None and t.kind == kind and (text is None or t.text == text)

    def eat(self, kind: str, text: str | None = None) -> Tok:
        if not self.at(kind, text):
            t = self.peek()
            raise SyntaxError(
                f"cypher: expected {text or kind}, got "
                f"{(t.kind, t.text) if t else 'EOF'}"
            )
        t = self.toks[self.i]
        self.i += 1
        return t

    def opt(self, kind: str, text: str | None = None) -> bool:
        if self.at(kind, text):
            self.i += 1
            return True
        return False

    # -- grammar --
    def parse(self):
        q = self.single_query()
        if not self.at("kw", "UNION"):
            return q
        parts = [q]
        mode = None  # True = UNION ALL, False = UNION (distinct)
        while self.opt("kw", "UNION"):
            is_all = False
            if self.at("name") and self.peek().text.upper() == "ALL":
                self.eat("name")
                is_all = True
            if mode is None:
                mode = is_all
            elif mode != is_all:
                raise SyntaxError(
                    "cypher: cannot mix UNION and UNION ALL"
                )
            parts.append(self.single_query())
        for p in parts:
            if p.is_write:
                raise SyntaxError("cypher: UNION of write queries")
        return UnionQuery(parts, distinct=not mode)

    def single_query(self) -> Query:
        clauses = []
        while self.peek() is not None and not self.at("kw", "UNION"):
            t = self.peek()
            if t.kind == ";":
                self.i += 1
                continue
            if t.kind == "kw" and t.text == "OPTIONAL" and (
                self.peek(1) is not None
                and self.peek(1).kind == "kw"
                and self.peek(1).text == "CALL"
            ):
                self.eat("kw", "OPTIONAL")
                clauses.append(self.call_clause(optional=True))
            elif t.kind == "kw" and t.text in ("MATCH", "OPTIONAL"):
                clauses.append(self.match_clause())
            elif t.kind == "kw" and t.text == "WITH":
                clauses.append(self.with_clause())
            elif t.kind == "kw" and t.text == "UNWIND":
                self.eat("kw", "UNWIND")
                e = self.expr()
                self.eat("kw", "AS")
                clauses.append(UnwindClause(e, self.eat("name").text))
            elif t.kind == "kw" and t.text == "RETURN":
                clauses.append(self.return_clause())
            elif t.kind == "kw" and t.text == "CALL":
                clauses.append(self.call_clause())
            elif t.kind == "kw" and t.text == "MERGE":
                clauses.append(self.merge_clause())
            elif t.kind == "kw" and t.text == "SET":
                clauses.append(self.set_clause())
            elif t.kind == "kw" and t.text == "REMOVE":
                clauses.append(self.remove_clause())
            elif t.kind == "kw" and t.text == "FOREACH":
                clauses.append(self.foreach_clause())
            elif t.kind == "kw" and t.text == "DETACH":
                clauses.append(self.delete_clause())
            elif t.kind == "kw" and t.text == "CREATE":
                nxt = self.peek(1)
                if nxt is not None and nxt.kind == "kw" and nxt.text == "CONSTRAINT":
                    clauses.append(self.create_constraint())
                else:
                    self.eat("kw", "CREATE")
                    clauses.append(CreateClause(self.path()))
            else:
                raise SyntaxError(f"cypher: unexpected {t.text!r}")
        if not clauses:
            raise SyntaxError("cypher: empty query")
        q = Query(clauses)
        if not q.is_write and not isinstance(clauses[-1], ReturnClause):
            raise SyntaxError("cypher: read query must end with RETURN")
        return q

    def call_clause(self, optional: bool = False) -> CallClause:
        # CALL { [WITH a, b] clauses... RETURN ... }
        self.eat("kw", "CALL")
        self.eat("{", "{")
        imports: list[str] = []
        # the import WITH: simple unaliased variables only (Cypher rule)
        if self.at("kw", "WITH"):
            save = self.i
            self.eat("kw", "WITH")
            ok = True
            names = []
            while True:
                if not self.at("name"):
                    ok = False
                    break
                names.append(self.eat("name").text)
                if not self.opt(",", ","):
                    break
            # a real import WITH is followed by another clause keyword,
            # never by AS/ORDER/WHERE (those make it a projection WITH)
            nxt = self.peek()
            if ok and nxt is not None and not (
                nxt.kind == "kw" and nxt.text in ("AS", "ORDER", "WHERE",
                                                  "LIMIT", "SKIP")
            ):
                imports = names
            else:
                self.i = save  # projection WITH — body parses it
        # body: parse clauses until the closing brace
        clauses = []
        while not self.at("}", "}"):
            t = self.peek()
            if t is None:
                raise SyntaxError("cypher: unterminated CALL { subquery")
            if t.kind == "kw" and t.text in ("MATCH", "OPTIONAL"):
                clauses.append(self.match_clause())
            elif t.kind == "kw" and t.text == "WITH":
                clauses.append(self.with_clause())
            elif t.kind == "kw" and t.text == "UNWIND":
                self.eat("kw", "UNWIND")
                e = self.expr()
                self.eat("kw", "AS")
                clauses.append(UnwindClause(e, self.eat("name").text))
            elif t.kind == "kw" and t.text == "RETURN":
                clauses.append(self.return_clause())
            else:
                raise SyntaxError(
                    f"cypher: unsupported clause {t.text!r} in CALL subquery"
                )
        self.eat("}", "}")
        if not clauses or not isinstance(clauses[-1], ReturnClause):
            raise SyntaxError("cypher: CALL subquery must end with RETURN")
        return CallClause(Query(clauses), imports, optional)

    def merge_clause(self) -> MergeClause:
        self.eat("kw", "MERGE")
        path = self.path()
        on_create: list[SetClause] = []
        on_match: list[SetClause] = []
        while self.at("kw", "ON"):
            self.eat("kw", "ON")
            if self.opt("kw", "CREATE"):
                on_create.append(self.set_clause())
            else:
                self.eat("kw", "MATCH")
                on_match.append(self.set_clause())
        return MergeClause(path, on_create, on_match)

    def set_clause(self) -> SetClause:
        self.eat("kw", "SET")
        assigns = []
        map_assigns = []
        while True:
            var = self.eat("name").text
            if self.at("+", "+"):
                # SET n += $props — map merge
                self.eat("+")
                self.eat("=", "=")
                map_assigns.append((var, self.expr()))
            else:
                self.eat(".", ".")
                prop = self.eat("name").text
                self.eat("=", "=")
                assigns.append((Prop(var, prop), self.expr()))
            if not self.opt(",", ","):
                break
        return SetClause(assigns, map_assigns)

    def foreach_clause(self) -> ForeachClause:
        # FOREACH (x IN expr | SET ... [SET ...])
        self.eat("kw", "FOREACH")
        self.eat("(", "(")
        var = self.eat("name").text
        self.eat("kw", "IN")
        src = self.expr()
        self.eat("|", "|")
        body = []
        while self.at("kw", "SET"):
            body.append(self.set_clause())
        if not body:
            t = self.peek()
            raise SyntaxError(
                "cypher: FOREACH body supports SET only, got "
                f"{(t.kind, t.text) if t else 'EOF'}"
            )
        self.eat(")", ")")
        return ForeachClause(var, src, body)

    def remove_clause(self) -> RemoveClause:
        self.eat("kw", "REMOVE")
        props = []
        while True:
            var = self.eat("name").text
            self.eat(".", ".")
            props.append(Prop(var, self.eat("name").text))
            if not self.opt(",", ","):
                break
        return RemoveClause(props)

    def delete_clause(self) -> DetachDeleteClause:
        self.eat("kw", "DETACH")
        self.eat("kw", "DELETE")
        return DetachDeleteClause(self.eat("name").text)

    def create_constraint(self) -> CreateConstraintClause:
        # CREATE CONSTRAINT [name] [IF NOT EXISTS]
        #   FOR (p:Label) REQUIRE p.prop IS UNIQUE
        self.eat("kw", "CREATE")
        self.eat("kw", "CONSTRAINT")
        if self.at("name"):
            self.eat("name")
        if self.opt("kw", "IF"):
            self.eat("kw", "NOT")
            self.eat("kw", "EXISTS")
        self.eat("kw", "FOR")
        self.eat("(", "(")
        self.eat("name")
        self.eat(":", ":")
        label = self.eat("name").text
        self.eat(")", ")")
        self.eat("kw", "REQUIRE")
        self.eat("name")
        self.eat(".", ".")
        prop = self.eat("name").text
        self.eat("kw", "IS")
        self.eat("kw", "UNIQUE")
        return CreateConstraintClause(label, prop)

    def match_clause(self) -> MatchClause:
        optional = self.opt("kw", "OPTIONAL")
        self.eat("kw", "MATCH")
        paths = [self.path()]
        while self.opt(",", ","):
            paths.append(self.path())
        where = self.expr() if self.opt("kw", "WHERE") else None
        return MatchClause(paths, optional, where)

    def path(self) -> Path:
        # optional binding: `p = ...` / `p = shortestPath(...)`
        var = None
        shortest = None
        if (
            self.at("name")
            and self.peek(1) is not None
            and self.peek(1).kind == "="
        ):
            var = self.eat("name").text
            self.eat("=", "=")
        if (
            self.at("name")
            and self.peek().text.lower() in ("shortestpath", "allshortestpaths")
            and self.peek(1) is not None
            and self.peek(1).kind == "("
        ):
            shortest = (
                "one" if self.eat("name").text.lower() == "shortestpath"
                else "all"
            )
            self.eat("(", "(")
            inner = self.path()
            self.eat(")", ")")
            if not inner.rels:
                raise SyntaxError("cypher: shortestPath needs a relationship")
            return Path(inner.nodes, inner.rels, var, shortest)
        nodes = [self.node_pat()]
        rels: list[RelPat] = []
        while self.at("<-") or self.at("-", "-"):
            rels.append(self.rel_pat())
            nodes.append(self.node_pat())
        return Path(nodes, rels, var, shortest)

    def node_pat(self) -> NodePat:
        self.eat("(", "(")
        var = None
        label = None
        props: dict[str, object] = {}
        if self.at("name"):
            var = self.eat("name").text
        if self.opt(":", ":"):
            label = self.eat("name").text
        if self.at("{", "{"):
            props = self.prop_map()
        self.eat(")", ")")
        return NodePat(var, label, props)

    def prop_map(self) -> dict[str, object]:
        self.eat("{", "{")
        out = {}
        while True:
            key = self.eat("name").text
            self.eat(":", ":")
            out[key] = self.expr()
            if not self.opt(",", ","):
                break
        self.eat("}", "}")
        return out

    def rel_pat(self) -> RelPat:
        # '<-[...]-'  |  '-[...]->'  |  '-[...]-'
        direction = "any"
        if self.opt("<-"):
            direction = "in"
        else:
            self.eat("-", "-")
        var = None
        rtype = None
        min_hops = max_hops = 1
        if self.opt("[", "["):
            if self.at("name"):
                var = self.eat("name").text
            if self.opt(":", ":"):
                types = [self.eat("name").text]
                while self.opt("|", "|"):
                    self.opt(":", ":")  # Cypher allows both :A|B and :A|:B
                    types.append(self.eat("name").text)
                rtype = types[0] if len(types) == 1 else tuple(types)
            if self.opt("*", "*"):
                # `*`, `*n`, `*m..n`, `*..n` (unbounded forms get the
                # engine's documented cap via max_hops=0 sentinel? no —
                # bare `*`/`*m..` raise: a distributed engine needs an
                # explicit bound)
                lo = hi = None
                if self.at("num"):
                    lo = int(self.eat("num").text)
                if self.at(".", "."):
                    self.eat(".", ".")
                    self.eat(".", ".")
                    if self.at("num"):
                        hi = int(self.eat("num").text)
                    else:
                        raise SyntaxError(
                            "cypher: unbounded variable-length paths are "
                            "not supported — give an upper bound (*1..k)"
                        )
                    min_hops = lo if lo is not None else 1
                    max_hops = hi
                elif lo is not None:
                    min_hops = max_hops = lo
                else:
                    raise SyntaxError(
                        "cypher: unbounded variable-length paths are "
                        "not supported — give an upper bound (*1..k)"
                    )
                if min_hops < 1 or max_hops < min_hops:
                    raise SyntaxError("cypher: bad hop range *m..n")
            self.eat("]", "]")
        if self.opt("->"):
            if direction == "in":
                raise SyntaxError("cypher: <-[..]-> is invalid")
            direction = "out"
        else:
            self.eat("-", "-")
        return RelPat(var, rtype, direction, min_hops, max_hops)

    def items(self) -> list[Item]:
        if self.at("*", "*"):
            self.eat("*")
            out = [Item(Star(), None)]
        else:
            out = [self.item()]
        while self.opt(",", ","):
            out.append(self.item())
        return out

    def item(self) -> Item:
        e = self.expr()
        alias = self.eat("name").text if self.opt("kw", "AS") else None
        return Item(e, alias)

    def order_limit(self):
        order = []
        if self.opt("kw", "ORDER"):
            self.eat("kw", "BY")
            while True:
                e = self.expr()
                asc = True
                if self.opt("kw", "DESC"):
                    asc = False
                else:
                    self.opt("kw", "ASC")
                order.append(OrderItem(e, asc))
                if not self.opt(",", ","):
                    break
        skip = None
        if self.opt("kw", "SKIP"):
            skip = int(self.eat("num").text)
        limit = None
        if self.opt("kw", "LIMIT"):
            limit = int(self.eat("num").text)
        return order, limit, skip

    def with_clause(self) -> WithClause:
        self.eat("kw", "WITH")
        distinct = self.opt("kw", "DISTINCT")
        items = self.items()
        order, limit, skip = self.order_limit()
        where = self.expr() if self.opt("kw", "WHERE") else None
        return WithClause(items, where, order, limit, skip, distinct)

    def return_clause(self) -> ReturnClause:
        self.eat("kw", "RETURN")
        distinct = self.opt("kw", "DISTINCT")
        items = self.items()
        order, limit, skip = self.order_limit()
        return ReturnClause(items, order, limit, distinct, skip)

    # -- expressions --
    def expr(self):
        return self.or_expr()

    def or_expr(self):
        left = self.and_expr()
        while self.opt("kw", "OR"):
            left = BinOp("OR", left, self.and_expr())
        return left

    def and_expr(self):
        left = self.not_expr()
        while self.opt("kw", "AND"):
            left = BinOp("AND", left, self.not_expr())
        return left

    def not_expr(self):
        if self.opt("kw", "NOT"):
            return Not(self.not_expr())
        return self.cmp_expr()

    _CMP = {"=": "=", "<>": "<>", "<": "<", ">": ">", "<=": "<=", ">=": ">="}

    def cmp_expr(self):
        left = self.add_expr()
        t = self.peek()
        if t is None:
            return left
        if t.kind in self._CMP:
            self.i += 1
            return BinOp(self._CMP[t.kind], left, self.add_expr())
        if t.kind == "kw" and t.text in ("IN", "CONTAINS"):
            self.i += 1
            return BinOp(t.text, left, self.add_expr())
        if t.kind == "kw" and t.text in ("STARTS", "ENDS"):
            self.i += 1
            self.eat("kw", "WITH")
            op = "STARTSWITH" if t.text == "STARTS" else "ENDSWITH"
            return BinOp(op, left, self.add_expr())
        if t.kind == "=~":
            self.i += 1
            return BinOp("REGEX", left, self.add_expr())
        if t.kind == "kw" and t.text == "IS":
            self.i += 1
            negated = self.opt("kw", "NOT")
            self.eat("kw", "NULL")
            f = Func("isnotnull" if negated else "isnull", [left])
            return f
        return left

    def add_expr(self):
        left = self.mul_expr()
        while True:
            t = self.peek()
            if t is not None and t.kind in ("+", "-"):
                self.i += 1
                left = BinOp(t.kind, left, self.mul_expr())
            else:
                return left

    def mul_expr(self):
        left = self.primary()
        while True:
            t = self.peek()
            if t is not None and t.kind in ("*", "/", "%"):
                self.i += 1
                left = BinOp(t.kind, left, self.primary())
            else:
                return left

    def case_expr(self):
        self.eat("kw", "CASE")
        # simple form: CASE subject WHEN value THEN ... — desugars to
        # the searched form with subject = value comparisons
        subject = None
        if not self.at("kw", "WHEN"):
            subject = self.expr()
        whens = []
        while self.opt("kw", "WHEN"):
            cond = self.expr()
            if subject is not None:
                cond = BinOp("=", subject, cond)
            self.eat("kw", "THEN")
            whens.append((cond, self.expr()))
        default = self.expr() if self.opt("kw", "ELSE") else Lit(None)
        self.eat("kw", "END")
        return CaseWhen(whens, default)

    def primary(self):
        t = self.peek()
        if t is None:
            raise SyntaxError("cypher: unexpected end of expression")
        if t.kind == "-":  # unary minus
            self.i += 1
            return BinOp("-", Lit(0), self.primary())
        if t.kind == "(":
            # Could be a parenthesized expression OR a pattern predicate
            # `(a)-[:T]-(b)`; try the pattern first and backtrack.
            save = self.i
            try:
                path = self.path()
                if path.rels:
                    return PatternPred(path)
            except SyntaxError:
                pass
            self.i = save
            self.eat("(")
            e = self.expr()
            self.eat(")", ")")
            return self.postfix(e)
        if t.kind == "[":
            self.eat("[")
            # pattern comprehension: [(a)-[:T]-(b) WHERE pred | expr]
            if self.at("(", "("):
                save = self.i
                try:
                    path = self.path()
                    if path.rels and (
                        self.at("|", "|") or self.at("kw", "WHERE")
                    ):
                        where = (
                            self.expr() if self.opt("kw", "WHERE") else None
                        )
                        self.eat("|", "|")
                        map_expr = self.expr()
                        self.eat("]", "]")
                        return PatternComp(path, where, map_expr)
                except SyntaxError:
                    pass
                self.i = save
            # list comprehension: [x IN xs WHERE pred | expr]
            if (
                self.at("name")
                and self.peek(1) is not None
                and self.peek(1).kind == "kw"
                and self.peek(1).text == "IN"
            ):
                var = self.eat("name").text
                self.eat("kw", "IN")
                src = self.expr()
                where = self.expr() if self.opt("kw", "WHERE") else None
                map_expr = self.expr() if self.opt("|", "|") else None
                self.eat("]", "]")
                return ListComp(var, src, where, map_expr)
            items = []
            if not self.at("]"):
                items.append(self.expr())
                while self.opt(",", ","):
                    items.append(self.expr())
            self.eat("]", "]")
            return ListLit(items)
        if t.kind == "{":
            # literal map {key: expr, ...}
            self.eat("{", "{")
            entries = []
            if not self.at("}", "}"):
                while True:
                    key = self.eat("name").text
                    self.eat(":", ":")
                    entries.append((key, self.expr()))
                    if not self.opt(",", ","):
                        break
            self.eat("}", "}")
            return MapLit(entries)
        if t.kind == "str":
            self.i += 1
            return Lit(t.text)
        if t.kind == "num":
            self.i += 1
            return Lit(float(t.text) if "." in t.text else int(t.text))
        if t.kind == "param":
            self.i += 1
            return Param(t.text)
        if t.kind == "kw" and t.text in ("TRUE", "FALSE"):
            self.i += 1
            return Lit(t.text == "TRUE")
        if t.kind == "kw" and t.text == "NULL":
            self.i += 1
            return Lit(None)
        if t.kind == "kw" and t.text == "CASE":
            return self.case_expr()
        if (
            t.kind == "kw"
            and t.text == "EXISTS"
            and self.peek(1) is not None
            and self.peek(1).kind == "{"
        ):
            self.i += 1
            return self.subquery(ExistsSub)
        if (
            t.kind == "kw"
            and t.text == "EXISTS"
            and self.peek(1) is not None
            and self.peek(1).kind == "("
        ):
            # legacy exists(n.prop) — property-existence predicate
            self.i += 1
            self.eat("(", "(")
            arg = self.expr()
            self.eat(")", ")")
            return Func("exists", [arg])
        if t.kind == "name":
            name = self.eat("name").text
            if name.upper() == "COUNT" and self.at("{", "{"):
                return self.subquery(CountSub)
            low = name.lower()
            if (
                low in ("any", "all", "none", "single")
                and self.at("(", "(")
                and self.peek(1) is not None
                and self.peek(1).kind == "name"
                and self.peek(2) is not None
                and self.peek(2).kind == "kw"
                and self.peek(2).text == "IN"
            ):
                self.eat("(")
                var = self.eat("name").text
                self.eat("kw", "IN")
                src = self.expr()
                self.eat("kw", "WHERE")
                pred = self.expr()
                self.eat(")", ")")
                return QuantPred(low, var, src, pred)
            if low == "reduce" and self.at("(", "("):
                self.eat("(")
                acc = self.eat("name").text
                self.eat("=", "=")
                init = self.expr()
                self.eat(",", ",")
                var = self.eat("name").text
                self.eat("kw", "IN")
                src = self.expr()
                self.eat("|", "|")
                body = self.expr()
                self.eat(")", ")")
                return ReduceExpr(acc, init, var, src, body)
            if self.at("(", "("):  # function call
                self.eat("(")
                distinct = self.opt("kw", "DISTINCT")
                args = []
                if self.opt("*", "*"):  # count(*)
                    self.eat(")", ")")
                    return Func(name.lower(), [], distinct)
                if not self.at(")"):
                    args.append(self.expr())
                    while self.opt(",", ","):
                        args.append(self.expr())
                self.eat(")", ")")
                return self.postfix(Func(name.lower(), args, distinct))
            if self.opt(".", "."):
                prop = self.eat("name").text
                return self.postfix(Prop(name, prop))
            if self.at("{", "{"):
                # map projection n {.prop, key: expr, .*}
                self.eat("{", "{")
                entries = []
                if not self.at("}", "}"):
                    while True:
                        if self.opt(".", "."):
                            if self.opt("*", "*"):
                                entries.append(("all",))
                            else:
                                entries.append(
                                    ("prop", self.eat("name").text)
                                )
                        else:
                            key = self.eat("name").text
                            self.eat(":", ":")
                            entries.append(("expr", key, self.expr()))
                        if not self.opt(",", ","):
                            break
                self.eat("}", "}")
                return self.postfix(MapProj(name, entries))
            return self.postfix(Var(name))
        raise SyntaxError(f"cypher: unexpected token {t.text!r} in expression")

    def postfix(self, e):
        # `.field` access on a struct/map result; `[i]` / `[a..b]`
        # subscript and slice on a list result
        while True:
            if (
                self.at(".", ".")
                and self.peek(1) is not None
                and self.peek(1).kind == "name"
            ):
                self.eat(".", ".")
                e = FieldAccess(e, self.eat("name").text)
                continue
            if self.at("[", "["):
                self.eat("[", "[")
                lo = None
                if not self.at(".", "."):
                    lo = self.expr()
                if self.at(".", "."):
                    self.eat(".", ".")
                    self.eat(".", ".")
                    hi = None if self.at("]", "]") else self.expr()
                    self.eat("]", "]")
                    e = Slice(e, lo, hi)
                else:
                    self.eat("]", "]")
                    if lo is None:
                        raise SyntaxError("cypher: empty subscript []")
                    e = Subscript(e, lo)
                continue
            return e

    def subquery(self, cls):
        # { [MATCH] pattern [WHERE expr] }
        self.eat("{", "{")
        self.opt("kw", "MATCH")
        path = self.path()
        where = self.expr() if self.opt("kw", "WHERE") else None
        self.eat("}", "}")
        return cls(path, where)


import functools


@functools.lru_cache(maxsize=256)
def _parse_cached(src: str) -> Query:
    return Parser(src).parse()


def parse(src: str) -> Query:
    """Parse with a per-text AST cache: serving endpoints re-run the
    same statement with different parameters, and the AST is reusable
    (parameters live outside it). NodePat.var mutation by the compiler
    is idempotent (anon names are assigned once), so sharing is safe."""
    return _parse_cached(src)
