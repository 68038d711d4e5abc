"""Golden parity with the reference's own end-to-end test.

TestQueryLogic (query/src/test/hadoop2/.../logic/TestQueryLogic.java:87-477)
ingests a 4-page Wikipedia XML fixture (titles Abacus, Acid, Asphalt,
Acronym) through the real mapper into a MockInstance and asserts:

- ``TITLE == 'asphalt' or TITLE == 'abacus' or TITLE == 'acid' or
  TITLE == 'acronym'`` → 4 documents (TestQueryLogic.java:456-466)
- ``TEXT == 'abacus'`` → 1 document (:468-475)

This test reproduces the same shape end-to-end through OUR stack: XML
chunker → article parser → index build → JEXL planner (index path) —
fixture bodies are synthesized (not copied), titles and queries match the
reference's.
"""

import tempfile
from pathlib import Path

import pytest

from accumulo_wikisearch_spark.api import Wikisearch
from accumulo_wikisearch_spark.config import EngineConfig
from accumulo_wikisearch_spark.sources.xml import read_wikipedia_xml

_PAGES = [
    (1, "Abacus", "the abacus is an ancient calculating tool with beads"),
    (2, "Acid", "an acid is a chemical species that donates protons"),
    (3, "Asphalt", "asphalt is a sticky black form of petroleum"),
    (4, "Acronym", "an acronym is a word formed from initial letters"),
]

_DUMP = "<mediawiki>" + "".join(
    f"""<page><title>{t}</title><id>{i}</id><revision>
<timestamp>2011-09-0{i}T00:00:00Z</timestamp><comment>c</comment>
<text>{body}</text></revision></page>"""
    for i, t, body in _PAGES
) + "</mediawiki>"


@pytest.fixture(scope="module")
def wiki_engine(spark):
    with tempfile.TemporaryDirectory() as tmp:
        Path(f"{tmp}/enwiki-20110901-001.xml").write_text(_DUMP)
        arts = read_wikipedia_xml(spark, tmp)
        eng = Wikisearch.ingest(
            arts,
            EngineConfig(num_partitions=4),
            scalar_fields={"ID": "id", "TITLE": "title"},
        )
        eng.index.persist()
        yield eng


def test_title_or_query_matches_reference(wiki_engine):
    df, path = wiki_engine.query_with_path(
        "TITLE == 'asphalt' or TITLE == 'abacus' or TITLE == 'acid' or TITLE == 'acronym'"
    )
    got = sorted(r["doc_id"] for r in df.collect())
    assert got == [1, 2, 3, 4]  # 4 docs, TestQueryLogic.java:456-466
    assert path == "optimized"  # all OR'd terms indexed → index path


def test_text_term_query_matches_reference(wiki_engine):
    df, path = wiki_engine.query_with_path("TEXT == 'abacus'")
    got = [r["doc_id"] for r in df.collect()]
    assert got == [1]  # 1 doc, TestQueryLogic.java:468-475
    assert path == "optimized"


def test_auths_filter_on_reference_fixture(wiki_engine):
    # the reference passes auths=enwiki; a disjoint auth set sees nothing
    assert wiki_engine.query("TEXT == 'abacus'", auths=["dewiki"]).count() == 0
    assert wiki_engine.query("TEXT == 'abacus'", auths=["enwiki"]).count() == 1


def test_word_tokenizer_strips_punctuation(spark):
    """The DEFAULT tokenizer is "word": 'abacus,' and 'abacus.' index as
    the token 'abacus' (WikipediaTokenizer intent,
    WikipediaMapper.java:154-167); the "whitespace" compat mode keeps the
    punctuation glued on."""
    from accumulo_wikisearch_spark.api import Wikisearch
    from accumulo_wikisearch_spark.config import EngineConfig

    rows = [
        (1, "en", "I bought an abacus, yesterday."),
        (2, "en", "the abacus. was broken"),
        (3, "en", "plain abacus here"),
        (4, "en", "nothing relevant (42)"),
    ]
    df = spark.createDataFrame(rows, "id long, language string, text string")
    word = Wikisearch.ingest(
        df, EngineConfig(num_partitions=2), {"ID": "id"}, unique_ids=True
    )
    assert word.index.config.tokenizer == "word"  # the shipped default
    ids = lambda e, q, **kw: sorted(r["doc_id"] for r in e.query(q, **kw).collect())
    assert ids(word, "TEXT == 'abacus'") == [1, 2, 3]
    assert ids(word, "TEXT == 'abacus'", force_path="fullscan") == [1, 2, 3]
    assert ids(word, "TEXT == '42'") == [4]  # digits kept
    ws = Wikisearch.ingest(
        df,
        EngineConfig(num_partitions=2, tokenizer="whitespace"),
        {"ID": "id"},
        unique_ids=True,
    )
    assert ids(ws, "TEXT == 'abacus'") == [3]  # 'abacus,' != 'abacus'


def test_full_unicode_diacritics_normalization(spark):
    """Beyond Latin Extended-A: Greek, Cyrillic, Vietnamese (Latin Extended
    Additional) and decomposed inputs all normalize identically on the index
    path, the fullscan path, and the Python literal twin
    (LcNoDiacriticsNormalizer.java:37-47)."""
    from accumulo_wikisearch_spark.api import Wikisearch
    from accumulo_wikisearch_spark.config import EngineConfig
    from accumulo_wikisearch_spark.functions.normalize import normalize_str

    rows = [
        (1, "el", "ύδωρ flows"),      # ύδωρ (precomposed Greek)
        (2, "ru", "йогурт here"),  # йогурт (й = и + breve)
        (3, "vi", "phở bò soup"),                # phở (Latin Ext. Additional)
        (4, "en", "café decomposed"),                # cafe + combining acute
    ]
    df = spark.createDataFrame(rows, "id long, language string, text string")
    eng = Wikisearch.ingest(
        df, EngineConfig(num_partitions=2), {"ID": "id"}, unique_ids=True
    )
    ids = lambda q, **kw: sorted(r["doc_id"] for r in eng.query(q, **kw).collect())
    # query literals run through normalize_str; stored values through
    # normalize_col — both must land on the same bytes
    for jexl, want in [
        ("TEXT == 'υδωρ'", [1]),   # υδωρ (stripped)
        ("TEXT == 'ύδωρ'", [1]),   # ύδωρ (accented literal)
        ("TEXT == 'иогурт'", [2]),  # иогурт
        ("TEXT == 'pho'", [3]),
        ("TEXT == 'cafe'", [4]),
    ]:
        assert ids(jexl) == want, jexl
        assert ids(jexl, force_path="fullscan") == want, jexl
    # the Python twin agrees with itself on tricky singletons
    assert normalize_str("ύδωρ") == "υδωρ"
    assert normalize_str("café") == "cafe"


def test_missing_field_negation_truth_table(spark):
    """Null-context evaluation (QueryEvaluator.java:253-257): negated
    operators over a MISSING field evaluate TRUE, positive operators
    FALSE — identically on the optimized and fullscan paths."""
    from accumulo_wikisearch_spark.api import Wikisearch
    from accumulo_wikisearch_spark.config import EngineConfig

    rows = [
        (1, "en", "alpha beta", "t1"),
        (2, "en", "alpha gamma", None),  # TITLE missing
        (3, "en", "delta", "t3"),
    ]
    df = spark.createDataFrame(rows, "id long, language string, text string, title string")
    eng = Wikisearch.ingest(
        df, EngineConfig(num_partitions=1), {"ID": "id", "TITLE": "title"},
        unique_ids=True,
    )
    expect = {
        "TEXT == 'alpha' and TITLE != 't1'": [2],
        "TEXT == 'alpha' and not (TITLE == 't1')": [2],
        "TITLE != 't1'": [2, 3],
        "TEXT == 'alpha' and TITLE == 't1'": [1],
        "TITLE =~ 't.*'": [1, 3],
        "TEXT == 'alpha' and TITLE !~ 't.*'": [2],
    }
    for q, want in expect.items():
        for fp in (None, "fullscan"):
            got = sorted(r["doc_id"] for r in eng.query(q, force_path=fp).collect())
            assert got == want, f"{q} ({fp or 'optimized'}): {got} != {want}"


def test_hashing_embed_properties(spark):
    """Feature-hashing embedding: deterministic, additive in token
    instances, sign-balanced buckets."""
    from accumulo_wikisearch_spark.operators.textstats import hashing_embed

    docs = spark.createDataFrame(
        [(1, "x x y"), (2, "x y x"), (3, "y"), (4, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: [int(v) for v in r["emb_csv"].split(",")] for r in hashing_embed(docs, dim=8).collect()}
    assert set(out) == {1, 2, 3}  # empty doc excluded
    # order-free bag semantics: same multiset -> same vector
    assert out[1] == out[2]
    # additive: doc1 = 2*x + y, doc3 = y; the difference is exactly 2*x
    diff = [a - b for a, b in zip(out[1], out[3])]
    assert sorted(map(abs, diff)) == [0] * 7 + [2]
    assert all(len(v) == 8 for v in out.values())


def test_text_repetition_golden(spark):
    """Gopher duplicate-n-gram counts on hand-checked docs."""
    from accumulo_wikisearch_spark.operators.textstats import text_repetition

    docs = spark.createDataFrame(
        [
            # "a b a b a b": 2-grams = [ab, ba, ab, ba, ab] → tot2=5 dup2=3
            (1, "a b a b a b"),
            (2, "all distinct words here now"),  # no repeats at any n
            (3, "x"),  # shorter than any n-gram: all totals 0, keep=1
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text_repetition(docs).collect()}
    assert (rows[1]["tot2"], rows[1]["dup2"]) == (5, 3)
    assert (rows[1]["tot3"], rows[1]["dup3"]) == (4, 2)
    assert rows[1]["keep"] == 0  # 3/5 > 0.2 → repetitive, dropped
    assert rows[2]["dup2"] == rows[2]["dup3"] == rows[2]["dup4"] == 0
    assert rows[2]["keep"] == 1
    assert (rows[3]["tot2"], rows[3]["dup2"], rows[3]["keep"]) == (0, 0, 1)
