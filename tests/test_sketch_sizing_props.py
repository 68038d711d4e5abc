"""Property-fuzzed sketch sizing-guard surface (r10 verdict ask #4).

The fixed mismatch tests in test_sketches.py pin one geometry pair per
family; hypothesis draws random (n_words, bits_per_word, n_hashes) /
(width, depth) / n_buckets sizings and random composition mix points
(merge-merge, merge-probe, legacy-sized, metadata-poisoned union,
empty-side), asserting the guard CONTRACT across the whole space:

- every MATCHED composition is oracle-exact (a merge of slice sketches
  equals the sketch of the union, cell for cell — the distributivity
  the sketches exist for);
- every MISMATCHED composition raises (eagerly as ValueError when the
  sizing is resolvable up front; at action time as PySparkException for
  metadata-poisoned unions);
- an EMPTY side never vetoes a well-defined merge regardless of its
  stamped sizing (it contributes no rows);
- probe/estimate endpoints resolve the table's own sizing when args are
  omitted, raise on contradiction, and keep their one-sided error
  contracts (Bloom: no false negatives; CMS: never undercount).

The r7 subnormal lesson: guard-edge inputs hypothesis finds are the
ones fixed tests miss — this suite makes the sizing guards' edges part
of every future round's regression surface.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.errors import PySparkException
from pyspark.sql import functions as F

from accumulo_wikisearch_spark.operators.sketches import (
    bloom_build,
    bloom_merge,
    bloom_probe,
    cms_build,
    cms_estimate,
    cms_merge,
    hll_estimate,
    hll_registers,
    merge_registers,
)

# long-running property/soak suite: excluded from the default run
# (pytest.ini addopts -m 'not slow'); run with `-m ""` for the full gate
pytestmark = pytest.mark.slow

# geometry spaces: small enough to run fast, wide enough to cross every
# boundary the guards compare (word counts, bit widths, hash counts,
# CMS shapes, power-of-2 HLL bucket counts)
bloom_sz = st.tuples(
    st.integers(2, 96), st.sampled_from([15, 30, 45, 60]), st.integers(1, 5)
)
cms_sz = st.tuples(st.sampled_from([16, 64, 256, 1024]), st.integers(1, 5))
hll_sz = st.sampled_from([16, 32, 64, 128, 256]).map(lambda m: (m,))

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


def _grouped(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.col("id") % 2).cast("string").alias("g"), F.col("id").alias("v")
    )


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def _families(spark, sz_b, sz_c, sz_h, lo, mid, hi):
    """(build_whole, build_half1, build_half2, merge, payload_cols) per
    family, all three driven by ONE drawn example to amortize job
    latency."""
    k_all, k1, k2 = _keys(spark, lo, hi), _keys(spark, lo, mid), _keys(spark, mid, hi)
    g_all, g1, g2 = (
        _grouped(spark, lo, hi),
        _grouped(spark, lo, mid),
        _grouped(spark, mid, hi),
    )
    return [
        (
            lambda s=sz_b: bloom_build(k_all, "k", *s),
            lambda s=sz_b: bloom_build(k1, "k", *s),
            lambda s=sz_b: bloom_build(k2, "k", *s),
            bloom_merge,
            ("word", "bits"),
        ),
        (
            lambda s=sz_c: cms_build(k_all, "k", *s),
            lambda s=sz_c: cms_build(k1, "k", *s),
            lambda s=sz_c: cms_build(k2, "k", *s),
            cms_merge,
            ("row", "col", "cnt"),
        ),
        (
            lambda s=sz_h: hll_registers(g_all, "g", "v", *s),
            lambda s=sz_h: hll_registers(g1, "g", "v", *s),
            lambda s=sz_h: hll_registers(g2, "g", "v", *s),
            merge_registers,
            ("grp", "bucket", "rho"),
        ),
    ]


@pytest.mark.slow
@settings(**SETTINGS)
@given(sz_b=bloom_sz, sz_c=cms_sz, sz_h=hll_sz, split=st.integers(10, 50))
def test_matched_merge_is_oracle_exact(spark, sz_b, sz_c, sz_h, split):
    """merge(build(slice1), build(slice2)) == build(slice1 ∪ slice2),
    payload cell for payload cell, for EVERY drawn geometry — the
    distributivity contract under the sizing guards (the guards must
    never perturb a well-formed merge)."""
    for whole, h1, h2, merge, cols in _families(spark, sz_b, sz_c, sz_h, 0, split, 60):
        assert _rows(merge(h1(), h2()), cols) == _rows(whole(), cols)


@pytest.mark.slow
@settings(**SETTINGS)
@given(
    sz_b=st.tuples(bloom_sz, bloom_sz),
    sz_c=st.tuples(cms_sz, cms_sz),
    sz_h=st.tuples(hll_sz, hll_sz),
)
def test_mismatched_merge_raises_eagerly(spark, sz_b, sz_c, sz_h):
    """Any two DIFFERENT drawn geometries refuse to merge with a
    ValueError before any job runs (resolvable-sizing fast path)."""
    for (s1, s2), builder in [
        (sz_b, lambda s: bloom_build(_keys(spark, 0, 40), "k", *s)),
        (sz_c, lambda s: cms_build(_keys(spark, 0, 40), "k", *s)),
        (sz_h, lambda s: hll_registers(_grouped(spark, 0, 40), "g", "v", *s)),
    ]:
        if s1 == s2:
            continue
        merge = {2: cms_merge, 3: bloom_merge, 1: merge_registers}[len(s1)]
        with pytest.raises(ValueError, match="mismatched"):
            merge(builder(s1), builder(s2))


@pytest.mark.slow
@settings(**SETTINGS)
@given(
    sz_b=st.tuples(bloom_sz, bloom_sz),
    sz_c=st.tuples(cms_sz, cms_sz),
    sz_h=st.tuples(hll_sz, hll_sz),
)
def test_poisoned_union_raises_at_action(spark, sz_b, sz_c, sz_h):
    """A hand-built unionByName carries ONE side's schema metadata, so
    the eager check can pass — the row-local in-pass guard must raise at
    action time for every drawn mismatched pair (and the merge must stay
    exact when the drawn pair happens to match)."""
    for (s1, s2), builder, merge, cols, dup in [
        # dup = what ingesting the same slice TWICE does to a payload
        # row: Bloom bit_or and HLL max are idempotent, CMS cnt doubles
        (sz_b, lambda s: bloom_build(_keys(spark, 0, 40), "k", *s), bloom_merge,
         ("word", "bits"), lambda t: t),
        (sz_c, lambda s: cms_build(_keys(spark, 0, 40), "k", *s), cms_merge,
         ("row", "col", "cnt"), lambda t: (t[0], t[1], 2 * t[2])),
        (sz_h, lambda s: hll_registers(_grouped(spark, 0, 40), "g", "v", *s),
         merge_registers, ("grp", "bucket", "rho"), lambda t: t),
    ]:
        un = builder(s1).unionByName(builder(s2))
        if s1 == s2:
            # matched draw: a self-union is a legal double-ingest — the
            # guard must not perturb it
            assert _rows(merge(un), cols) == [dup(t) for t in _rows(builder(s1), cols)]
        else:
            with pytest.raises(PySparkException, match="different"):
                merge(un).collect()


@pytest.mark.slow
@settings(**SETTINGS)
@given(sz_b=bloom_sz, sz_c=cms_sz, sz_h=hll_sz)
def test_legacy_sized_mix_raises_with_migration_message(spark, sz_b, sz_c, sz_h):
    """Stripping the sizing columns from one side (a pre-sizing at-rest
    store) must raise the explicit legacy-migration error for every
    geometry, not die inside unionByName's schema resolution."""
    for sz, builder, merge, strip in [
        (sz_b, lambda s: bloom_build(_keys(spark, 0, 40), "k", *s), bloom_merge,
         ("bf_words", "bf_bpw", "bf_k")),
        (sz_c, lambda s: cms_build(_keys(spark, 0, 40), "k", *s), cms_merge,
         ("cms_w", "cms_d")),
        (sz_h, lambda s: hll_registers(_grouped(spark, 0, 40), "g", "v", *s),
         merge_registers, ("hll_m",)),
    ]:
        assert all(c in builder(sz).columns for c in strip)  # names stay real
        sized = builder(sz)
        with pytest.raises(ValueError, match="legacy"):
            merge(sized, sized.drop(*strip))


@pytest.mark.slow
@settings(**SETTINGS)
@given(sz_b=st.tuples(bloom_sz, bloom_sz), sz_c=st.tuples(cms_sz, cms_sz))
def test_empty_side_never_vetoes_a_merge(spark, sz_b, sz_c):
    """An EMPTY input contributes no rows, so its stamped sizing — even a
    DIFFERENT one — must not veto the merge: the result equals the
    non-empty side exactly (the r10 placeholder-metadata rule, fuzzed)."""
    empty = spark.range(0).select(F.col("id").alias("k"))
    for (s1, s2), builder, merge, cols in [
        (sz_b, lambda d, s: bloom_build(d, "k", *s), bloom_merge, ("word", "bits")),
        (sz_c, lambda d, s: cms_build(d, "k", *s), cms_merge, ("row", "col", "cnt")),
    ]:
        full = builder(_keys(spark, 0, 40), s1)
        merged = merge(full, builder(empty, s2))
        assert _rows(merged, cols) == _rows(full, cols)


@pytest.mark.slow
@settings(**SETTINGS)
@given(sz_b=st.tuples(bloom_sz, bloom_sz), sz_c=st.tuples(cms_sz, cms_sz))
def test_probe_endpoints_resolve_or_raise(spark, sz_b, sz_c):
    """merge-probe mix point: omitted args resolve the table's own drawn
    geometry (one-sided error contracts hold — Bloom never false-
    negative, CMS never undercounts); explicit args matching the table
    are accepted; explicit args from the OTHER drawn geometry raise."""
    keys = _keys(spark, 0, 40)
    s1, s2 = sz_b
    bloom = bloom_build(keys, "k", *s1)
    assert bloom_probe(keys, "k", bloom).where(F.col("in_bloom") == 0).count() == 0
    assert (
        bloom_probe(keys, "k", bloom, *s1).where(F.col("in_bloom") == 0).count() == 0
    )
    if s1 != s2:
        with pytest.raises(ValueError, match="contradicts"):
            bloom_probe(keys, "k", bloom, *s2)
    c1, c2 = sz_c
    cms = cms_build(keys, "k", *c1)
    assert cms_estimate(keys, "k", cms).where(F.col("est_count") < 1).count() == 0
    if c1 != c2:
        with pytest.raises(ValueError, match="contradicts"):
            cms_estimate(keys, "k", cms, *c2)


@pytest.mark.slow
@settings(**SETTINGS)
@given(sz_h=st.tuples(hll_sz, hll_sz))
def test_hll_estimate_resolves_or_raises(spark, sz_h):
    """hll_estimate resolves m from the table for every drawn bucket
    count (estimate within the sketch's coarse error envelope) and
    raises on a contradicting explicit m."""
    s1, s2 = sz_h
    regs = hll_registers(_grouped(spark, 0, 200), "g", "v", *s1)
    est = {r["grp"]: r["est_distinct"] for r in hll_estimate(regs).collect()}
    # 100 distinct values per group; HLL at m>=16 stays within ~2x
    assert set(est) == {"0", "1"} and all(30 <= v <= 300 for v in est.values())
    if s1 != s2:
        with pytest.raises(ValueError, match="contradicts"):
            hll_estimate(regs, n_buckets=s2[0])
