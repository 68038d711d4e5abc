"""Normalizer parity: Spark column vs Python literal vs reference fixture
pairs (FIXTURES.md §4; LcNoDiacriticsNormalizer.java:37-47)."""

from pyspark.sql import functions as F

from accumulo_wikisearch_spark.functions.normalize import (
    normalize_col,
    normalize_str,
    tokenize_col,
    hash60_col,
    HASH60_DUCKDB,
)

PAIRS = [
    ("Café", "cafe"),
    ("NIÑO", "nino"),
    ("ÀÉÎÕÜ", "aeiou"),
    ("plain", "plain"),
    ("MiXeD", "mixed"),
]


def test_normalize_str():
    for raw, want in PAIRS:
        assert normalize_str(raw) == want


def test_normalize_col_matches_python(spark):
    df = spark.createDataFrame([(r,) for r, _ in PAIRS], ["v"])
    got = [r["n"] for r in df.select(normalize_col("v").alias("n")).collect()]
    assert got == [w for _, w in PAIRS]


def test_tokenize_distinct(spark):
    df = spark.createDataFrame([("The  the dog\tDOG cat",)], ["t"])
    toks = df.select(tokenize_col("t").alias("x")).collect()[0]["x"]
    assert sorted(toks) == ["cat", "dog", "the"]


def test_hash60_matches_duckdb(spark, duck):
    vals = ["abc", "dup", "x y z", ""]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = {r["v"]: r["h"] for r in df.select("v", hash60_col("v").alias("h")).collect()}
    for v in vals:
        want = duck.execute(
            f"SELECT {HASH60_DUCKDB.format(expr='?')}", [v]
        ).fetchone()[0]
        assert got[v] == want, v
        assert got[v] >= 0



MARKUP = (
    "'''Alpha''' is a [[Greek alphabet|letter]] used in "
    "[[mathematics]].{{Infobox|name=Alpha|kind={{nested|x}}}} "
    "See [[Beta (letter)|beta]] and {{citation needed}}."
)


def test_wiki_mode_strips_links_and_templates(spark):
    from accumulo_wikisearch_spark.functions.normalize import tokenize_col

    df = spark.createDataFrame([(MARKUP,)], ["t"])
    toks = set(df.select(tokenize_col("t", mode="wiki").alias("x")).collect()[0]["x"])
    # link display text survives, link targets and template payloads do not
    assert {"alpha", "letter", "mathematics", "beta", "is", "a"} <= toks
    assert "greek" not in toks       # [[Greek alphabet|letter]] target dropped
    assert "infobox" not in toks     # template (with one nested level) dropped
    assert "citation" not in toks
    assert "nested" not in toks
    # the plain "word" mode keeps everything, markup words included
    plain = set(df.select(tokenize_col("t", mode="word").alias("x")).collect()[0]["x"])
    assert {"greek", "infobox", "citation"} <= plain


def test_engine_query_under_wiki_tokenizer(spark):
    """ws_* semantics hold under tokenizer='wiki': a query for link DISPLAY
    text finds the doc; a query for the stripped link TARGET does not."""
    from accumulo_wikisearch_spark.api import Wikisearch
    from accumulo_wikisearch_spark.config import EngineConfig

    arts = spark.createDataFrame(
        [
            (1, "en", MARKUP, "s1", len(MARKUP)),
            (2, "en", "plain text about greek letters", "s2", 30),
        ],
        "id long, language string, text string, source string, n_chars long",
    )
    cfg = EngineConfig(tokenizer="wiki", unevaluated_fields=frozenset({"TEXT"}))
    eng = Wikisearch.ingest(
        arts, cfg, {"ID": "id", "SOURCE": "source", "NCHARS": "n_chars"},
        unique_ids=True,
    )
    assert {r["doc_id"] for r in eng.query("TEXT == 'letter'").collect()} == {1}
    # 'greek' appears in doc 1 ONLY inside a stripped link target
    assert {r["doc_id"] for r in eng.query("TEXT == 'greek'").collect()} == {2}
    assert {r["doc_id"] for r in eng.query(
        "TEXT == 'beta' and TEXT == 'mathematics'"
    ).collect()} == {1}
