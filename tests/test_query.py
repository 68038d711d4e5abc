"""Golden end-to-end query tests (FIXTURES.md §3): every query runs through
BOTH the optimized/index path and the brute-force full-scan path, and both
must equal the DuckDB oracle — the reference's TestQueryLogic pattern
(exact doc-id assertions) generalized."""

import pytest
from pyspark.sql import functions as F

from accumulo_wikisearch_spark.config import EngineConfig
from accumulo_wikisearch_spark.api import Wikisearch
from accumulo_wikisearch_spark.sources.corpus import get_engine, load_articles, SCALAR_FIELDS

TOK = "string_split(text,' ')"

GOLDEN = [
    # (name, jexl, duckdb-where, expected_path)
    ("eq_rare", "SOURCE == 'src5'", "source='src5'", "optimized"),
    ("eq_common", "TEXT == 'batch'", f"list_contains({TOK},'batch')", "optimized"),
    (
        "and2",
        "TEXT == 'dup' and TEXT == 'key'",
        f"list_contains({TOK},'dup') AND list_contains({TOK},'key')",
        "optimized",
    ),
    (
        "and3",
        "TEXT == 'key' and TEXT == 'vector' and TEXT == 'the'",
        f"list_contains({TOK},'key') AND list_contains({TOK},'vector') AND list_contains({TOK},'the')",
        "optimized",
    ),
    ("or2", "SOURCE == 'src3' or SOURCE == 'src7'", "source IN ('src3','src7')", "optimized"),
    (
        "nested",
        "TEXT == 'dup' and (TEXT == 'key' or TEXT == 'vector')",
        f"list_contains({TOK},'dup') AND (list_contains({TOK},'key') OR list_contains({TOK},'vector'))",
        "optimized",
    ),
    (
        "unfielded",
        "'dup'",
        f"(list_contains({TOK},'dup') OR source='dup' OR lang='dup' OR doc_id::VARCHAR='dup' OR n_chars::VARCHAR='dup')",
        "optimized",
    ),
    (
        "neq_anti",
        "TEXT == 'dup' and SOURCE != 'src3'",
        f"list_contains({TOK},'dup') AND source<>'src3'",
        "optimized",
    ),
    (
        "not_lang",
        "TEXT == 'dup' and not (LANG == 'en')",
        f"list_contains({TOK},'dup') AND lang<>'en'",
        "optimized",
    ),
    ("wild_trail", "SOURCE =~ 'src1.*'", "regexp_full_match(source,'src1.*')", "optimized"),
    ("wild_lead", "SOURCE =~ '.*8'", "regexp_full_match(source,'.*8')", "optimized"),
    ("regex_mid", "SOURCE =~ 's.c12'", "regexp_full_match(source,'s.c12')", "optimized"),
    (
        "range_pair",
        "SOURCE >= 'src14' and SOURCE <= 'src16'",
        "source>='src14' AND source<='src16'",
        "optimized",
    ),
    (
        "range_unbounded",
        "SOURCE >= 'src18'",
        "source>='src18'",
        "fullscan",  # unbounded → rejected from index path (RangeCalculator.java:495-498)
    ),
    (
        "between_fn",
        "f:between(NCHARS, 100, 300) and TEXT == 'dup'",
        f"n_chars BETWEEN 100 AND 300 AND list_contains({TOK},'dup')",
        "optimized",
    ),
    (
        "abs_fn",
        "f:abs(NCHARS) >= 350 and TEXT == 'dup'",
        f"abs(n_chars)>=350 AND list_contains({TOK},'dup')",
        "optimized",
    ),
    (
        "neq_multivalue",
        "TEXT != 'dup'",
        f"len(list_filter({TOK}, x -> x<>'dup'))>0",
        "fullscan",  # all-negated → never index-driven (QueryParser.java:489-491)
    ),
]


@pytest.mark.parametrize("name,jexl,where,expected_path", GOLDEN, ids=[g[0] for g in GOLDEN])
def test_golden_query(engine, duck, name, jexl, where, expected_path):
    want = sorted(r[0] for r in duck.execute(f"SELECT doc_id FROM documents WHERE {where}").fetchall())

    df, path = engine.query_with_path(jexl)
    got = sorted(r["doc_id"] for r in df.collect())
    assert got == want, f"{name}: index path differs from oracle"
    assert path == expected_path, f"{name}: expected {expected_path}, chose {path}"

    # path equivalence: forced full scan must agree (FIXTURES.md §3 pattern)
    full = engine.query(jexl, force_path="fullscan")
    got_full = sorted(r["doc_id"] for r in full.collect())
    assert got_full == want, f"{name}: fullscan path differs from oracle"


def test_auths_row_level_security(engine, duck):
    # every cell is visibility-filtered by language ∈ auths
    # (WikipediaMapper.java:105; AbstractQueryLogic.java:445-448)
    for auths in (["en"], ["en", "fr"], ["zh"]):
        df = engine.query("TEXT == 'dup'", auths=auths)
        got = sorted(r["doc_id"] for r in df.collect())
        langs = ",".join(f"'{a}'" for a in auths)
        want = sorted(
            r[0]
            for r in duck.execute(
                f"SELECT doc_id FROM documents WHERE list_contains({TOK},'dup') AND lang IN ({langs})"
            ).fetchall()
        )
        assert got == want


def test_content_fetch(engine, duck):
    row = engine.index.documents.where(F.col("doc_id") == 42).collect()[0]
    ptr = f"DOCUMENT:{row.partition_id}/{row.language}/42"
    got = engine.content(ptr).collect()[0]["text"]
    want = duck.execute("SELECT text FROM documents WHERE doc_id=42").fetchone()[0]
    assert got == want
    # wrong partition → no rows (exact Range on (row, colf, colq))
    wrong = f"DOCUMENT:{(row.partition_id + 1) % engine.index.config.num_partitions}/{row.language}/42"
    assert engine.content(wrong).count() == 0


def test_mixed_index_or_runs_dual_path(spark, sf_dir, duck):
    # OR mixing indexed and non-indexed branches runs BOTH paths and unions
    # (AbstractQueryLogic.java:560-587, :826-908): the indexed branch rides
    # the index, the fullscan filters only the non-indexed predicate
    cfg = EngineConfig(num_partitions=4, indexed_fields=frozenset({"TEXT", "LANG"}))
    eng = Wikisearch.ingest(load_articles(spark, sf_dir), cfg, SCALAR_FIELDS)
    df, path = eng.query_with_path("TEXT == 'dup' or SOURCE == 'src3'")
    assert path == "dualpath"
    assert "Union" in df._jdf.queryExecution().optimizedPlan().toString()
    got = sorted(r["doc_id"] for r in df.collect())
    want = sorted(
        r[0]
        for r in duck.execute(
            f"SELECT doc_id FROM documents WHERE list_contains({TOK},'dup') OR source='src3'"
        ).fetchall()
    )
    assert got == want
    # AND with one indexed conjunct still optimizes
    df2, path2 = eng.query_with_path("TEXT == 'dup' and SOURCE == 'src3'")
    assert path2 == "optimized"
    # row-level security applies on BOTH dual-path branches
    got_en = sorted(
        r["doc_id"]
        for r in eng.query("TEXT == 'dup' or SOURCE == 'src3'", auths=["en"]).collect()
    )
    want_en = sorted(
        r[0]
        for r in duck.execute(
            f"SELECT doc_id FROM documents WHERE (list_contains({TOK},'dup') "
            "OR source='src3') AND lang = 'en'"
        ).fetchall()
    )
    assert got_en == want_en


def test_empty_result_unknown_term(engine):
    assert engine.query("TEXT == 'zzzznotaword'").count() == 0
    assert engine.query("'zzzznotaword'").count() == 0


def test_multivalue_any_match_semantics(spark):
    # doc 1: TITLE values {v1, v2}; doc 2: TITLE {v3} — Q12/Q13 truth table
    rows = [
        (1, "enwiki", "x", "V1"),
        (1, "enwiki", "x", "v2"),
        (2, "enwiki", "x", "v3"),
    ]
    df = spark.createDataFrame(rows, "id long, language string, text string, title string")
    eng = Wikisearch(
        __import__(
            "accumulo_wikisearch_spark.operators.ingest", fromlist=["build_index"]
        ).build_index(
            df, EngineConfig(num_partitions=1), {"ID": "id", "TITLE": "title"}
        ),
        multi_value_fields=frozenset({"TEXT", "TITLE"}),
    )
    ids = lambda d: sorted(r["doc_id"] for r in d.collect())
    assert ids(eng.query("TITLE == 'v1'")) == [1]
    # any-match: doc1 has v2 != v1 → matches; doc2 v3 != v1 → matches
    assert ids(eng.query("TITLE != 'v1'")) == [1, 2]
    assert ids(eng.query("not (TITLE == 'v1')")) == [1, 2]


def test_grouped_eq_mask_semantics(spark):
    """r14 grouped eq-conjunct pass edge cases: a conjunct repeated
    verbatim, a (field, value) pair shared between a leaf unit and an
    OR unit (its row must set BOTH bits), and multi-valued docs whose
    duplicate posting rows must not over-count (bit_or idempotence).
    exact_uid_total_max=0 forces the scan tier, so the grouped pass
    (not the driver doc-range path) is what answers."""
    rows = [
        (1, "enwiki", "alpha beta", "t"),
        (2, "enwiki", "alpha", "t"),
        (3, "enwiki", "beta gamma", "t"),
        (4, "enwiki", "alpha beta gamma", "t"),
    ]
    df = spark.createDataFrame(
        rows, "id long, language string, text string, title string"
    )
    eng = Wikisearch(
        __import__(
            "accumulo_wikisearch_spark.operators.ingest", fromlist=["build_index"]
        ).build_index(
            df,
            EngineConfig(num_partitions=1, exact_uid_total_max=0),
            {"ID": "id", "TITLE": "title"},
        )
    )
    ids = lambda d: sorted(r["doc_id"] for r in d.collect())
    for jexl, want in [
        # repeated conjunct: each repeat gets its own bit, the shared
        # pair's mask covers both — NOT an unsatisfiable mask
        ("TEXT == 'alpha' and TEXT == 'alpha'", [1, 2, 4]),
        # leaf unit + OR unit sharing the 'alpha' pair
        ("TEXT == 'alpha' and (TEXT == 'alpha' or TEXT == 'gamma')", [1, 2, 4]),
        # plain grouped AND + OR unit any-match
        ("TEXT == 'alpha' and (TEXT == 'beta' or TEXT == 'gamma')", [1, 4]),
        ("TEXT == 'alpha' and TEXT == 'beta' and TEXT == 'gamma'", [4]),
    ]:
        got = ids(eng.query(jexl))
        assert got == want, (jexl, got, want)
        full = ids(eng.query(jexl, force_path="fullscan"))
        assert got == full, (jexl, got, full)


def test_language_qualified_candidates_no_cross_language_leak(spark):
    """Same doc id in two languages (same partition, since partition = id%N):
    an unevaluated-field predicate proved by the index for one language must
    not return the other-language doc. The reference's fi/global-index keys
    carry value\\0language\\0id, so its candidates are language-qualified
    (WikipediaMapper.java:170-191)."""
    from accumulo_wikisearch_spark.operators.ingest import build_index

    rows = [(1, "en", "foo bar"), (1, "fr", "baz qux"), (2, "en", "foo zap")]
    df = spark.createDataFrame(rows, "id long, language string, text string")
    idx = build_index(
        df,
        EngineConfig(num_partitions=1, unevaluated_fields=frozenset({"TEXT"})),
        {"ID": "id"},
        unique_ids=True,
    )
    eng = Wikisearch(idx)
    got = sorted(
        (r["doc_id"], r["language"]) for r in eng.query("TEXT == 'foo'").collect()
    )
    assert got == [(1, "en"), (2, "en")]  # fr doc 1 must NOT leak through
    # negated leaf anti-join is language-qualified too: doc 1 exists in fr
    # without 'foo', but the en doc 1 must still be excluded only where the
    # anti term matches its own language row
    got2 = sorted(
        (r["doc_id"], r["language"]) for r in eng.query("TEXT == 'bar' and ID != '2'").collect()
    )
    assert got2 == [(1, "en")]
    # discriminating case: the negated value matches doc 1 ONLY in fr. A
    # (partition, doc_id)-keyed anti-join would wrongly drop the en row
    # too; the language-qualified key must keep it.
    rows3 = [
        (1, "en", "foo bar", "keep"),
        (1, "fr", "foo qux", "drop"),
        (2, "en", "foo zap", "keep"),
    ]
    df3 = spark.createDataFrame(
        rows3, "id long, language string, text string, title string"
    )
    eng3 = Wikisearch(
        build_index(
            df3,
            EngineConfig(num_partitions=1),
            {"ID": "id", "TITLE": "title"},
            unique_ids=True,
        )
    )
    got3 = sorted(
        (r["doc_id"], r["language"])
        for r in eng3.query("TEXT == 'foo' and TITLE != 'drop'").collect()
    )
    assert got3 == [(1, "en"), (2, "en")]  # en doc 1 survives, fr doc 1 dropped


def test_tfidf_rank_weights_rare_terms_higher(engine):
    """IDF weighting: a doc's per-term contribution is inversely monotone in
    document frequency, and only docs containing ALL terms are returned."""
    from pyspark.sql import functions as F

    out = engine.scored_search_tfidf(["dup", "key"]).collect()
    assert out, "fixture corpus contains dup∧key docs"
    # every returned doc matches the boolean AND query
    and_ids = {r["doc_id"] for r in engine.query("TEXT == 'dup' and TEXT == 'key'").collect()}
    assert {r["doc_id"] for r in out} == and_ids
    # scores strictly positive, sorted descending
    scores = [r["score"] for r in out]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
    # reconstruct one doc's score from first principles
    n_total = engine.index.doc_count()
    ti = engine.index.term_index
    r0 = out[0]
    rows = ti.where(
        (F.col("doc_id") == r0["doc_id"]) & F.col("norm_value").isin("dup", "key")
    ).collect()
    df_by_term = {
        r["norm_value"]: r["df"]
        for r in engine.index.global_index.where(
            (F.col("field") == "TEXT") & F.col("norm_value").isin("dup", "key")
        )
        .groupBy("norm_value")
        .agg(F.sum("count").alias("df"))
        .collect()
    }
    expect = sum(
        (r["occurrences"] * (n_total + 1) * 1000) // (df_by_term[r["norm_value"]] + 1)
        for r in rows
    )
    assert r0["score"] == expect


def test_bm25_rank_matches_first_principles(engine):
    """BM25 integer formula: reconstruct the top doc's score from raw
    occurrence/df/length counts; AND semantics and descending order hold."""
    from pyspark.sql import functions as F

    out = engine.scored_search_bm25(["dup", "key"]).collect()
    assert out
    and_ids = {r["doc_id"] for r in engine.query("TEXT == 'dup' and TEXT == 'key'").collect()}
    assert {r["doc_id"] for r in out} == and_ids
    scores = [r["score"] for r in out]
    assert all(s > 0 for s in scores) and scores == sorted(scores, reverse=True)

    n = engine.index.doc_count()
    a = engine.index.token_count()
    ti = engine.index.term_index
    r0 = out[0]
    dl = (
        ti.where(F.col("doc_id") == r0["doc_id"])
        .agg(F.sum("occurrences"))
        .collect()[0][0]
    )
    rows = ti.where(
        (F.col("doc_id") == r0["doc_id"]) & F.col("norm_value").isin("dup", "key")
    ).collect()
    df_by_term = {
        r["norm_value"]: r["df"]
        for r in engine.index.global_index.where(
            (F.col("field") == "TEXT") & F.col("norm_value").isin("dup", "key")
        )
        .groupBy("norm_value")
        .agg(F.sum("count").alias("df"))
        .collect()
    }
    expect = sum(
        (2200 * (n + 1) * a * r["occurrences"])
        // (
            (df_by_term[r["norm_value"]] + 1)
            * (10 * a * r["occurrences"] + 3 * a + 9 * n * dl)
        )
        for r in rows
    )
    assert r0["score"] == expect


def test_more_like_this_excludes_seed_and_ranks_by_shared_rarity(engine):
    from pyspark.sql import functions as F

    out = engine.more_like_this(7).collect()
    assert out and all(r["doc_id"] != 7 for r in out)
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(1 <= r["n_shared"] <= 16 for r in out)
    # every candidate truly shares ≥1 of the seed's terms
    seed_terms = {
        r["norm_value"]
        for r in engine.index.term_index.where(F.col("doc_id") == 7).collect()
    }
    top = out[0]
    cand_terms = {
        r["norm_value"]
        for r in engine.index.term_index.where(F.col("doc_id") == top["doc_id"]).collect()
    }
    assert seed_terms & cand_terms


def test_explain_query_reports_path_and_cardinalities(engine):
    ex = engine.explain_query("TEXT == 'dup' and TEXT == 'key'")
    assert ex["path"] == "optimized" and ex["exact_coverage"]
    assert ex["index_tree"] and "dup" in ex["index_tree"]
    assert ex["cardinalities"].get("TEXT==dup", 0) > 0
    # unbounded lone range → planner refuses the index path
    ex2 = engine.explain_query("NCHARS > '100'")
    assert ex2["path"] == "fullscan" and ex2["index_tree"] is None


def test_count_only_index_fast_path_matches_query(engine):
    # single exact-covering EQ: answered from global-index counts alone
    fast = engine.count_only("TEXT == 'dup'").collect()[0]["n"]
    assert fast == engine.query("TEXT == 'dup'").count()
    # the fast path's plan never joins candidates into docs_wide
    plan = engine.count_only("TEXT == 'dup'")._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" not in plan
    # auths restrict the summed postings
    fast_en = engine.count_only("TEXT == 'dup'", auths=["en"]).collect()[0]["n"]
    assert fast_en == engine.query("TEXT == 'dup'", auths=["en"]).count()
    # non-single-leaf shapes fall back to counting the real result
    both = engine.count_only("TEXT == 'dup' and TEXT == 'key'").collect()[0]["n"]
    assert both == engine.query("TEXT == 'dup' and TEXT == 'key'").count()
    # missing term → 0, not an empty frame
    assert engine.count_only("TEXT == 'zzznotaterm'").collect()[0]["n"] == 0


def test_sql_text_match_rewrite(engine, duck):
    """TEXT_MATCH('<jexl>') inside spark.sql runs the index planner and
    composes with ordinary SQL predicates."""
    out = engine.sql(
        "SELECT doc_id FROM ws_documents "
        "WHERE TEXT_MATCH('TEXT == ''dup'' and TEXT == ''key''') "
        "AND length(text) > 200"
    )
    got = {r["doc_id"] for r in out.collect()}
    expect = {
        r[0]
        for r in duck.execute(
            "SELECT doc_id FROM documents WHERE "
            "list_contains(string_split(text,' '), 'dup') AND "
            "list_contains(string_split(text,' '), 'key') AND len(text) > 200"
        ).fetchall()
    }
    assert got == expect and got


def test_sql_text_match_double_quotes_and_auths(engine):
    a = engine.sql(
        'SELECT doc_id FROM ws_documents WHERE TEXT_MATCH("TEXT == \'dup\'")',
        auths=["en"],
    )
    b = engine.query("TEXT == 'dup'", auths=["en"])
    assert {r["doc_id"] for r in a.collect()} == {r["doc_id"] for r in b.collect()}


def test_sql_plain_passthrough(engine):
    n = engine.sql("SELECT count(*) AS n FROM ws_metadata WHERE indexed").collect()[0]["n"]
    assert n > 0


def test_phrase_search_adjacent_only(spark):
    from accumulo_wikisearch_spark.config import EngineConfig
    from accumulo_wikisearch_spark.api import Wikisearch
    from accumulo_wikisearch_spark.operators.ingest import build_index

    arts = spark.createDataFrame(
        [
            (1, "en", "the quick brown fox", "s"),
            (2, "en", "quick the brown fox", "s"),      # words present, wrong order
            (3, "en", "a quick brown thing quick brown", "s"),  # 2 matches
            (4, "fr", "quick brown", "s"),
        ],
        "id long, language string, text string, source string",
    )
    idx = build_index(arts, EngineConfig(), {"SOURCE": "source"}, unique_ids=True)
    eng = Wikisearch(idx)
    got = {r.doc_id: r.n_matches for r in eng.phrase_search(["quick", "brown"]).collect()}
    assert got == {1: 1, 3: 2, 4: 1}
    # auths restrict languages
    got_en = {r.doc_id for r in eng.phrase_search(["quick", "brown"], auths=["en"]).collect()}
    assert got_en == {1, 3}
    # three-term phrase
    got3 = {r.doc_id: r.n_matches for r in eng.phrase_search(["quick", "brown", "fox"]).collect()}
    assert got3 == {1: 1}


def test_count_only_uid_tree_answers_driver_side(engine):
    """count_only on an exact-covering boolean tree whose leaves all sit in
    the exact-uid tier: the count is the driver-side key-set size — the
    plan touches no catalog table at all."""
    jexl = "TEXT == 'dup' and SOURCE != 'src3'"
    df = engine.count_only(jexl)
    assert df.collect()[0]["n"] == engine.query(jexl).count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in plan and "parquet" not in plan
    # OR shape too
    jexl2 = "SOURCE == 'src5' or SOURCE == 'src7'"
    df2 = engine.count_only(jexl2)
    assert df2.collect()[0]["n"] == engine.query(jexl2).count()


def test_dualpath_negated_term_branch_multivalue_truth_table(engine):
    """Regression (hypothesis-found): a dual-path OR whose drivable branch
    contains a Not(expanded-Term) wrapper must NOT re-normalize the branch
    — a second to_nnf pass would flip Not(TEXT == x) into any-match
    TEXT != x, changing 'no token matches' into 'some other token exists'
    for multi-valued fields."""
    q = "not ((SOURCE == 'src3') and ((TEXT != 'batch') or ('batch')))"
    df, path = engine.query_with_path(q)
    assert path == "dualpath"
    got = sorted(r["doc_id"] for r in df.collect())
    want = sorted(
        r["doc_id"] for r in engine.query(q, force_path="fullscan").collect()
    )
    assert got == want


def test_posting_literal_sql_escapes_backslash_and_quote(spark):
    """Language values are arbitrary data; a value ending in a backslash or
    containing quotes must neither break the VALUES parse nor shift rows
    (Spark's default parser treats backslash as an escape in literals)."""
    from accumulo_wikisearch_spark.plans.planner import (
        _keys_filter,
        _literal_postings_df,
    )

    keys = [(0, "en\\", 1), (1, "o'brien\\'", 2), (2, 'w"x\\\\', 3)]
    got = {
        (r["partition_id"], r["language"], r["doc_id"])
        for r in _literal_postings_df(spark, keys).collect()
    }
    assert got == set(keys)

    df = spark.createDataFrame(
        [(p, l, d) for p, l, d in keys] + [(0, "en", 1), (1, "o'brien", 2)],
        "partition_id int, language string, doc_id long",
    )
    kept = {
        (r["partition_id"], r["language"], r["doc_id"])
        for r in df.where(_keys_filter(keys)).collect()
    }
    assert kept == set(keys)
