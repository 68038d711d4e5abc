"""Recursive-descent parser for the JEXL-subset query language.

Grammar (the surface documented at reference
``query/.../logic/AbstractQueryLogic.java:76-107`` and encoded in
``query/.../parser/QueryParser.java``):

    expr     := or_expr
    or_expr  := and_expr (("or" | "||") and_expr)*
    and_expr := unary (("and" | "&&") unary)*
    unary    := ("not" | "!") unary | primary
    primary  := "(" expr ")" | between | comparison | term
    between  := "f:between" "(" field "," num "," num ")"
    comparison := operand OP literal | literal OP operand   (OP ∈ == != < <= > >= =~ !~)
    operand  := field | "f:abs" "(" field ")"
    term     := STRING          (unfielded term)

Field names are uppercased and literals normalized downstream, mirroring the
case-insensitive evaluation at ``QueryEvaluator.java:67-84`` and
``FieldIndexQueryReWriter.applyCaseSensitivity:139-149``.

Parsed plans are cached by query text (LRU), as the reference caches parsed
ASTs by query hash (``QueryParser.java:241-308``).
"""

from __future__ import annotations

import re
from functools import lru_cache

from accumulo_wikisearch_spark.plans.ast import (
    And,
    Between,
    Cmp,
    Node,
    Not,
    Or,
    Term,
)


class QueryParseError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) | (?P<comma>,)
      | (?P<op>==|!=|<=|>=|=~|!~|<|>)
      | (?P<andsym>&&) | (?P<orsym>\|\|) | (?P<notsym>!)
      | (?P<string>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
      | (?P<number>-?\d+(?:\.\d+)?)
      | (?P<func>f:[A-Za-z_][A-Za-z0-9_]*)
      | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    )""",
    re.VERBOSE,
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    pos, out = 0, []
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            if text[pos:].strip() == "":
                break
            raise QueryParseError(f"bad token at {pos}: {text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        out.append((kind, m.group(kind)))
    out.append(("eof", ""))
    return out


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(r"\\(.)", r"\1", body)


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str) -> str:
        k, v = self.next()
        if k != kind:
            raise QueryParseError(f"expected {kind}, got {k} {v!r}")
        return v

    def parse(self) -> Node:
        node = self.or_expr()
        if self.peek()[0] != "eof":
            raise QueryParseError(f"trailing input: {self.peek()!r}")
        return node

    def or_expr(self) -> Node:
        children = [self.and_expr()]
        while True:
            k, v = self.peek()
            if (k == "ident" and v.lower() == "or") or k == "orsym":
                self.next()
                children.append(self.and_expr())
            else:
                break
        return children[0] if len(children) == 1 else Or(tuple(children))

    def and_expr(self) -> Node:
        children = [self.unary()]
        while True:
            k, v = self.peek()
            if (k == "ident" and v.lower() == "and") or k == "andsym":
                self.next()
                children.append(self.unary())
            else:
                break
        return children[0] if len(children) == 1 else And(tuple(children))

    def unary(self) -> Node:
        k, v = self.peek()
        if (k == "ident" and v.lower() == "not") or k == "notsym":
            self.next()
            return Not(self.unary())
        return self.primary()

    def primary(self) -> Node:
        k, v = self.peek()
        if k == "lparen":
            self.next()
            node = self.or_expr()
            self.expect("rparen")
            return node
        if k == "func":
            return self.func_node()
        if k == "ident":
            return self.comparison()
        if k == "string":
            # could be an unfielded term, or a reversed comparison 'lit' == F
            self.next()
            lit = _unquote(v)
            k2, v2 = self.peek()
            if k2 == "op":
                op = self.next()[1]
                fld = self.expect("ident").upper()
                return Cmp(fld, _flip(op), lit)
            return Term(lit)
        raise QueryParseError(f"unexpected token {k} {v!r}")

    def func_node(self) -> Node:
        fname = self.next()[1].lower()
        if fname == "f:between":
            self.expect("lparen")
            fld = self.expect("ident").upper()
            self.expect("comma")
            lo = float(self.expect("number"))
            self.expect("comma")
            hi = float(self.expect("number"))
            self.expect("rparen")
            return Between(fld, lo, hi)
        if fname == "f:abs":
            self.expect("lparen")
            fld = self.expect("ident").upper()
            self.expect("rparen")
            op = self.expect("op")
            lit = self.literal()
            return Cmp(fld, op, lit, abs=True)
        raise QueryParseError(f"unknown function {fname!r}")

    def comparison(self) -> Node:
        fld = self.expect("ident").upper()
        op = self.expect("op")
        lit = self.literal()
        return Cmp(fld, op, lit)

    def literal(self):
        k, v = self.next()
        if k == "string":
            return _unquote(v)
        if k == "number":
            return float(v) if "." in v else int(v)
        raise QueryParseError(f"expected literal, got {k} {v!r}")


_FLIP = {"<": ">", ">": "<", "<=": ">=", ">=": "<="}


def _flip(op: str) -> str:
    return _FLIP.get(op, op)


@lru_cache(maxsize=256)
def parse(query: str) -> Node:
    """Parse a query string to an AST (cached, cf. QueryParser.java:241-308)."""
    return _Parser(_tokenize(query)).parse()
