"""Event-side evaluation: AST → a boolean PySpark Column over docs_wide.

Reproduces the reference's event-side JEXL evaluation:
- multi-valued any-match semantics — a predicate over field F is true if ANY
  of the doc's values for F satisfies it (loop rewrite,
  ``QueryEvaluator.rewriteQuery``, ``query/.../parser/QueryEvaluator.java:120-203``);
- negated operators (!=, !~) over a *missing* field evaluate TRUE
  (null-context evaluation, ``QueryEvaluator.java:253-257``), while positive
  operators over a missing field evaluate FALSE;
- case-insensitive comparison — literals are normalized with the same
  normalizer applied at ingest (``QueryEvaluator.java:67-84``; SURVEY.md §7
  "normalization symmetry");
- string↔number coercion for numeric literals
  (``query/.../jexl/Arithmetic.java:68-124``);
- regex = full match with DOTALL (``jexl/Arithmetic.java:41-60``);
- ``f:between``/``f:abs`` numeric functions (``QueryFunctions.java:26-66``).

The produced Column is pure built-in expressions (exists/try_cast/rlike) —
JVM-side, whole-stage-codegen'd; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from accumulo_wikisearch_spark.plans import ast
from accumulo_wikisearch_spark.functions.normalize import normalize_str


def _norm_literal(lit) -> str:
    if isinstance(lit, str):
        return normalize_str(lit)
    if isinstance(lit, float) and lit.is_integer():
        return str(int(lit))
    return str(lit)


def regex_full(pattern: str) -> str:
    """Anchored DOTALL pattern (JEXL String.matches semantics)."""
    return f"(?s)^(?:{pattern})$"


def _value_pred(node: ast.Node):
    """Return (negated, fn(value_col) -> Column) for a leaf node."""
    if isinstance(node, ast.Between):
        lo, hi = float(node.lo), float(node.hi)
        return False, lambda v: v.try_cast("double").between(F.lit(lo), F.lit(hi))
    assert isinstance(node, ast.Cmp)
    op, lit = node.op, node.literal
    if node.abs or isinstance(lit, (int, float)):
        # numeric coercion path (Arithmetic.java:68-124)
        num = float(lit) if not isinstance(lit, str) else float(lit)
        def numeric(v):
            x = v.try_cast("double")
            x = F.abs(x) if node.abs else x
            return _CMP[op](x, F.lit(num))
        if op in (ast.NE,):
            return True, lambda v: numeric(v)
        return False, numeric
    s = _norm_literal(lit)
    if op == ast.EQ:
        return False, lambda v: v == F.lit(s)
    if op == ast.NE:
        return True, lambda v: v != F.lit(s)
    if op in (ast.LT, ast.LE, ast.GT, ast.GE):
        return False, lambda v: _CMP[op](v, F.lit(s))
    if op == ast.MATCH:
        pat = regex_full(lit.lower() if isinstance(lit, str) else str(lit))
        return False, lambda v: v.rlike(pat)
    if op == ast.NMATCH:
        pat = regex_full(lit.lower() if isinstance(lit, str) else str(lit))
        return True, lambda v: ~v.rlike(pat)
    raise ValueError(f"unsupported op {op}")


_CMP = {
    ast.EQ: lambda a, b: a == b,
    ast.NE: lambda a, b: a != b,
    ast.LT: lambda a, b: a < b,
    ast.LE: lambda a, b: a <= b,
    ast.GT: lambda a, b: a > b,
    ast.GE: lambda a, b: a >= b,
}


def compile_predicate(
    node: ast.Node,
    fields_col: Column | None = None,
    skip_fields: frozenset[str] = frozenset(),
) -> Column:
    """Compile an AST into a boolean Column over the ``fields`` map column
    of docs_wide (map<string, array<string>> of normalized values).

    ``skip_fields``: unevaluated fields (Q15) — positive comparisons on them
    compile to TRUE because the caller guarantees the index semi-join already
    enforced them exactly. Negated ops are never skipped."""
    fields = fields_col if fields_col is not None else F.col("fields")

    def go(n: ast.Node) -> Column:
        if isinstance(n, ast.And):
            out = go(n.children[0])
            for c in n.children[1:]:
                out = out & go(c)
            return out
        if isinstance(n, ast.Or):
            out = go(n.children[0])
            for c in n.children[1:]:
                out = out | go(c)
            return out
        if isinstance(n, ast.Not):
            return ~go(n.child)
        if isinstance(n, ast.Term):
            # unfielded: any value of any field equals the term
            # (AbstractQueryLogic.java:601-633 rewrites via the index; the
            # event-side truth is "some field has this value").
            s = _norm_literal(n.value)
            vals = F.flatten(F.map_values(fields))
            return F.coalesce(F.exists(vals, lambda v: v == F.lit(s)), F.lit(False))
        negated, pred = _value_pred(n)
        if n.field in skip_fields and not negated and isinstance(n, ast.Cmp) and not n.abs:
            return F.lit(True)
        vals = fields.getItem(n.field)
        any_match = F.coalesce(
            F.exists(vals, lambda v: F.coalesce(pred(v), F.lit(False))), F.lit(False)
        )
        if negated:
            # missing field → TRUE for negated ops (QueryEvaluator.java:253-257)
            return F.when(vals.isNull() | (F.size(vals) == 0), F.lit(True)).otherwise(
                any_match
            )
        return any_match

    return go(node)
