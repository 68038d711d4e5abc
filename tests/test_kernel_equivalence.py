"""Property tests pinning the load-bearing bit-exactness claims: every
Arrow numpy kernel must produce IDENTICAL results to the (slower)
Catalyst-expression form it replaced, on arbitrary vectors — the
equivalence the oracle hash gate relies on."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

DIM = 8

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
vec = st.lists(finite, min_size=DIM, max_size=DIM)


def _df(spark, vectors):
    return spark.createDataFrame(
        list(enumerate(vectors)), "vec_id long, embedding array<double>"
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vs=st.lists(vec, min_size=1, max_size=8), seed=st.integers(0, 10))
def test_lsh_kernel_matches_expression(spark, vs, seed):
    from accumulo_wikisearch_spark.operators import similarity as S

    planes = S._hyperplanes(DIM, nbits=4, seed=seed)
    df = _df(spark, vs)
    expr = df.select("vec_id", S.lsh_bucket(F.col("embedding"), planes).alias("b"))
    kern = df.select("vec_id", S._lsh_bucket_udf(planes)(F.col("embedding")).alias("b"))
    assert sorted(map(tuple, expr.collect())) == sorted(map(tuple, kern.collect()))


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vs=st.lists(vec, min_size=2, max_size=8), ncents=st.integers(1, 3))
def test_assign_cells_kernel_matches_expression(spark, vs, ncents):
    from accumulo_wikisearch_spark.operators import similarity as S

    cents = [(i, [float(x) for x in v]) for i, v in enumerate(vs[:ncents])]
    nonzero = [v for v in vs if any(x != 0 for x in v)]
    if not nonzero or any(all(x == 0 for x in v) for v in vs[:ncents]):
        return  # zero vectors make cosine undefined in both forms
    df = _df(spark, nonzero)
    scores = S._cell_scores(S._as_double(F.col("embedding")), S._centroid_lit(cents))
    best = F.array_max(
        F.transform(scores, lambda s: F.struct(s["s"].alias("s"), s["cell"].alias("cell")))
    )["cell"]
    expr = df.select("vec_id", best.cast("int").alias("cell"))
    kern = df.select(
        "vec_id", S._assign_cells_udf(cents)(F.col("embedding")).alias("cell")
    )
    assert sorted(map(tuple, expr.collect())) == sorted(map(tuple, kern.collect()))


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vs=st.lists(vec, min_size=1, max_size=8))
def test_pq_code_kernel_matches_bruteforce(spark, vs):
    """PQ codes from the Arrow kernel == per-row Python argmin with the
    same sequential fold (the expression form's documented order)."""
    from accumulo_wikisearch_spark.operators import similarity as S

    m, sub_dim = 2, DIM // 2
    books = [
        [(c, [float(x) for x in v[s * sub_dim : (s + 1) * sub_dim]]) for c, v in enumerate(vs[:2])]
        for s in range(m)
    ]
    df = _df(spark, vs)
    got = {
        r["vec_id"]: tuple(r["codes"])
        for r in df.select(
            "vec_id", S._pq_code_udf(books, sub_dim)(F.col("embedding")).alias("codes")
        ).collect()
    }
    for i, v in enumerate(vs):
        want = []
        for s in range(m):
            dists = []
            for _c, cw in books[s]:
                acc = 0.0
                for j in range(sub_dim):
                    t = v[s * sub_dim + j] - cw[j]
                    acc = acc + t * t
                dists.append(acc)
            want.append(dists.index(min(dists)))
        assert got[i] == tuple(want), (i, got[i], want)
