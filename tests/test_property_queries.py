"""Property-based path equivalence: random boolean queries over the
documents corpus must produce identical doc-id sets from (a) the optimized
index path, (b) the brute-force full scan, and (c) an independent DuckDB
translation of the same NNF tree.

This generalizes the reference's fixed golden queries into the randomized
regime its iterator stack was never tested under (negation nesting, mixed
fields, wildcard + range combinations)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from accumulo_wikisearch_spark.plans import ast
from accumulo_wikisearch_spark.plans.parser import parse
from accumulo_wikisearch_spark.plans.planner import to_nnf

TOKENS = ["batch", "key", "dup", "the", "vector", "zzz"]
SOURCES = ["src3", "src12", "src19", "nope"]
LANGS = ["en", "fr", "zh"]

leaf_st = st.one_of(
    st.sampled_from(TOKENS).map(lambda t: f"TEXT == '{t}'"),
    st.sampled_from(TOKENS).map(lambda t: f"TEXT != '{t}'"),
    st.sampled_from(SOURCES).map(lambda s: f"SOURCE == '{s}'"),
    st.sampled_from(SOURCES).map(lambda s: f"SOURCE != '{s}'"),
    st.sampled_from(LANGS).map(lambda l: f"LANG == '{l}'"),
    # unfielded terms (Q9): planner expands across discovered fields
    st.sampled_from(TOKENS).map(lambda t: f"'{t}'"),
    st.just("SOURCE =~ 'src1.*'"),
    st.just("SOURCE =~ '.*2'"),
    st.just("SOURCE >= 'src10' and SOURCE <= 'src15'"),
    st.just("f:between(NCHARS, 120, 280)"),
)


def combine(children):
    a, b, op, neg = children
    expr = f"({a}) {op} ({b})"
    return f"not ({expr})" if neg else expr


query_st = st.recursive(
    leaf_st,
    lambda inner: st.tuples(
        inner, inner, st.sampled_from(["and", "or"]), st.booleans()
    ).map(combine),
    max_leaves=4,
)


# --- independent DuckDB translation of the NNF tree -----------------------

TOK = "list_filter(string_split(text,' '), x -> len(x) > 0)"
FIELD_SQL = {"SOURCE": "source", "LANG": "lang", "NCHARS": "n_chars::VARCHAR"}
CMP = {"==": "=", "!=": "<>", "<": "<", "<=": "<=", ">": ">", ">=": ">="}


def leaf_sql(n: ast.Cmp) -> str:
    lit = str(n.literal).replace("'", "''")
    if n.field == "TEXT":
        # multi-valued any-match truth table (QueryEvaluator.java:120-203)
        if n.op == "=~":
            return f"len(list_filter({TOK}, x -> regexp_full_match(x, '(?s)^(?:{lit})$'))) > 0"
        if n.op == "!~":
            return f"len(list_filter({TOK}, x -> NOT regexp_full_match(x, '(?s)^(?:{lit})$'))) > 0"
        op = CMP[n.op]
        return f"len(list_filter({TOK}, x -> x {op} '{lit}')) > 0"
    col = FIELD_SQL[n.field]
    if isinstance(n.literal, (int, float)):
        return f"TRY_CAST({col} AS DOUBLE) {CMP[n.op]} {float(n.literal)}"
    if n.op == "=~":
        return f"regexp_full_match({col}, '(?s)^(?:{lit})$')"
    if n.op == "!~":
        return f"NOT regexp_full_match({col}, '(?s)^(?:{lit})$')"
    return f"{col} {CMP[n.op]} '{lit}'"


def to_sql(n: ast.Node) -> str:
    if isinstance(n, ast.And):
        return "(" + " AND ".join(to_sql(c) for c in n.children) + ")"
    if isinstance(n, ast.Or):
        return "(" + " OR ".join(to_sql(c) for c in n.children) + ")"
    if isinstance(n, ast.Not):
        return f"(NOT {to_sql(n.child)})"
    if isinstance(n, ast.Between):
        return f"TRY_CAST(n_chars::VARCHAR AS DOUBLE) BETWEEN {n.lo} AND {n.hi}"
    if isinstance(n, ast.Term):
        # unfielded: some field (any of TEXT tokens or scalar event fields)
        # has this exact normalized value (AbstractQueryLogic.java:601-633)
        v = str(n.value).replace("'", "''")
        return (
            f"(list_contains({TOK}, '{v}') OR source = '{v}' OR lang = '{v}'"
            f" OR n_chars::VARCHAR = '{v}' OR doc_id::VARCHAR = '{v}')"
        )
    if isinstance(n, ast.Cmp):
        return leaf_sql(n)
    raise AssertionError(n)


@pytest.mark.slow
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=query_st)
def test_random_query_three_way_equivalence(engine, duck, q):
    nnf = to_nnf(parse(q))
    want = sorted(
        r[0]
        for r in duck.execute(
            f"SELECT doc_id FROM documents WHERE {to_sql(nnf)}"
        ).fetchall()
    )
    got_ix, path = engine.query_with_path(q)
    got_ix = sorted(r["doc_id"] for r in got_ix.collect())
    assert got_ix == want, f"index path ({path}) != duckdb for {q!r}"
    got_fs = sorted(
        r["doc_id"] for r in engine.query(q, force_path="fullscan").collect()
    )
    assert got_fs == want, f"fullscan != duckdb for {q!r}"


@pytest.fixture(scope="module")
def scan_only_engine(spark, sf_dir):
    """Engine with the exact-uid doc-range plans disabled
    (exact_uid_total_max=0): every query exercises the field_index
    scan/join machinery, which IGNORE-tier terms take at real scale. On
    the tiny test corpus uid_max=64 would otherwise route nearly every
    random query through the driver-side paths, starving the joins of
    fuzz coverage."""
    from accumulo_wikisearch_spark.config import EngineConfig
    from accumulo_wikisearch_spark.sources.corpus import get_engine

    return get_engine(
        spark,
        sf_dir,
        EngineConfig(unevaluated_fields=frozenset({"TEXT"}), exact_uid_total_max=0),
    )


@pytest.mark.slow
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=query_st)
def test_random_query_scan_path_equivalence(scan_only_engine, duck, q):
    nnf = to_nnf(parse(q))
    want = sorted(
        r[0]
        for r in duck.execute(
            f"SELECT doc_id FROM documents WHERE {to_sql(nnf)}"
        ).fetchall()
    )
    got_ix, path = scan_only_engine.query_with_path(q)
    got_ix = sorted(r["doc_id"] for r in got_ix.collect())
    assert got_ix == want, f"scan path ({path}) != duckdb for {q!r}"


@pytest.mark.slow
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    q=query_st,
    auths=st.lists(
        st.sampled_from(LANGS + ["de", "es"]), min_size=1, max_size=3, unique=True
    ),
)
def test_random_query_auths_equivalence(engine, duck, q, auths):
    """Row-level security fuzz: auths must prune identically on the index
    path, the fullscan path, and BOTH branches of dual-path mixed ORs
    (the r3 bug class: auths enforced on one branch only)."""
    nnf = to_nnf(parse(q))
    al = ",".join(f"'{a}'" for a in sorted(auths))
    want = sorted(
        r[0]
        for r in duck.execute(
            f"SELECT doc_id FROM documents WHERE ({to_sql(nnf)}) AND lang IN ({al})"
        ).fetchall()
    )
    got_ix, path = engine.query_with_path(q, auths=list(auths))
    got_ix = sorted(r["doc_id"] for r in got_ix.collect())
    assert got_ix == want, f"index path ({path}) auths={auths} != duckdb for {q!r}"
    got_fs = sorted(
        r["doc_id"]
        for r in engine.query(q, auths=list(auths), force_path="fullscan").collect()
    )
    assert got_fs == want, f"fullscan auths={auths} != duckdb for {q!r}"
