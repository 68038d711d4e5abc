"""Property-based check: duplicated_spans / remove_duplicated_spans vs a
pure-Python reference over random small corpora (overlap-heavy token
distributions to exercise duplicated k-grams)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# long-running property/soak suite: excluded from the default run
# (pytest.ini addopts -m 'not slow'); run with `-m ""` for the full gate
pytestmark = pytest.mark.slow


K = 3

doc_st = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e"]), min_size=0, max_size=10
).map(" ".join)
corpus_st = st.lists(doc_st, min_size=1, max_size=6)


def ref_spans(texts):
    toks = {i: [t for t in s.split(" ") if t] for i, s in enumerate(texts)}
    grams = {}
    for i, ts in toks.items():
        for j in range(len(ts) - K + 1):
            grams.setdefault(" ".join(ts[j : j + K]), set()).add(i)
    dup = {g for g, ds in grams.items() if len(ds) >= 2}
    spans, clean = {}, {}
    for i, ts in toks.items():
        n = max(0, len(ts) - K + 1)
        cov = set()
        dup_count = 0
        for j in range(n):
            if " ".join(ts[j : j + K]) in dup:
                dup_count += 1
                cov.update(range(j, j + K))
        if n:
            spans[i] = (n, dup_count)
        kept = [t for p, t in enumerate(ts) if p not in cov]
        clean[i] = (" ".join(kept), len(ts) - len(kept))
    return spans, clean


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus_st)
def test_span_ops_match_reference(spark, texts):
    from accumulo_wikisearch_spark.operators.dedup import (
        duplicated_spans,
        remove_duplicated_spans,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    exp_spans, exp_clean = ref_spans(texts)
    got_spans = {
        r["doc_id"]: (r["n_spans"], r["dup_spans"])
        for r in duplicated_spans(docs, k=K).collect()
    }
    assert got_spans == exp_spans
    got_clean = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_duplicated_spans(docs, k=K).collect()
    }
    assert got_clean == exp_clean
