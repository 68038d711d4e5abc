"""Parser unit tests (QueryParser.java surface, AbstractQueryLogic.java:88-95)."""

import pytest

from accumulo_wikisearch_spark.plans import ast
from accumulo_wikisearch_spark.plans.parser import QueryParseError, parse
from accumulo_wikisearch_spark.plans.planner import to_nnf


def test_simple_eq():
    assert parse("TITLE == 'abacus'") == ast.Cmp("TITLE", "==", "abacus")


def test_field_case_upper():
    assert parse("title == 'x'").field == "TITLE"


def test_bool_tree():
    n = parse("A == '1' and (B == '2' or C == '3')")
    assert isinstance(n, ast.And)
    assert isinstance(n.children[1], ast.Or)


def test_symbols():
    n = parse("A == '1' && !(B == '2' || C == '3')")
    assert isinstance(n, ast.And)
    assert isinstance(n.children[1], ast.Not)


def test_ops():
    for op in ["==", "!=", "<", "<=", ">", ">=", "=~", "!~"]:
        assert parse(f"F {op} 'v'").op == op


def test_number_literals():
    assert parse("N == 42").literal == 42
    assert parse("N >= 1.5").literal == 1.5


def test_between_and_abs():
    b = parse("f:between(N, 10, 50)")
    assert b == ast.Between("N", 10.0, 50.0)
    a = parse("f:abs(N) >= 3")
    assert a == ast.Cmp("N", ">=", 3, abs=True)


def test_unfielded_term():
    assert parse("'old' and 'man'") == ast.And((ast.Term("old"), ast.Term("man")))


def test_reversed_comparison():
    assert parse("'x' == F") == ast.Cmp("F", "==", "x")


def test_escapes_and_quotes():
    assert parse("T == \"d'oh\"").literal == "d'oh"
    assert parse(r"T == 'a\'b'").literal == "a'b"


def test_parse_error():
    with pytest.raises(QueryParseError):
        parse("A == ")
    with pytest.raises(QueryParseError):
        parse("A ==== 'x'")


def test_nnf_demorgan():
    n = to_nnf(parse("not (A == '1' and B != '2')"))
    assert n == ast.Or((ast.Cmp("A", "!=", "1"), ast.Cmp("B", "==", "2")))


def test_nnf_flips_ranges():
    n = to_nnf(parse("not (A < '5')"))
    assert n == ast.Cmp("A", ">=", "5")


def test_index_tree_exactness_flags():
    # Q15 precondition: exact coverage iff no leaf was demoted/approximated
    from accumulo_wikisearch_spark.plans.parser import parse
    from accumulo_wikisearch_spark.plans.planner import reduce_to_index_tree, to_nnf

    indexed = {"TEXT", "SOURCE", "NCHARS"}
    mv = frozenset({"TEXT"})

    def reduce(q):
        return reduce_to_index_tree(to_nnf(parse(q)), indexed, mv)

    t, exact = reduce("TEXT == 'a' and SOURCE == 'b'")
    assert t is not None and exact
    t, exact = reduce("TEXT == 'a' or (SOURCE == 'b' and TEXT == 'c')")
    assert t is not None and exact
    # NE on single-valued field → anti-join, still exact
    t, exact = reduce("TEXT == 'a' and SOURCE != 'b'")
    assert t is not None and exact
    # regex leaf → drivable but approximate
    t, exact = reduce("SOURCE =~ 'src1.*'")
    assert t is not None and not exact
    # unbounded range → demoted → inexact
    t, exact = reduce("TEXT == 'a' and NCHARS > '100'")
    assert t is not None and not exact
    # bounded pair → exact
    t, exact = reduce("NCHARS >= '100' and NCHARS < '200'")
    assert t is not None and exact
    # non-indexed field conjunct → demoted → inexact
    t, exact = reduce("TEXT == 'a' and OTHER == 'x'")
    assert t is not None and not exact
