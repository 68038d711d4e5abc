"""Mergeable cardinality sketches — HyperLogLog-style register tables.

Counting distinct keys (users, URLs, fingerprints) at 100 TB can't afford
an exact ``count(DISTINCT ...)`` — that is a full shuffle of every distinct
value. The sketch shape is the classic fix (Flajolet et al., HyperLogLog,
AofA 2007): hash each value, route it to one of ``m`` registers by its low
hash bits, and keep per register the maximum "rank" rho (position of the
first 1-bit in the remaining hash bits). Registers are tiny (m rows per
group), merge by element-wise MAX — associative and commutative, so
partial sketches combine map-side and across partitions/days/corpora
without re-reading the data. The estimate is a purely local final step
over m integers.

Engine-exactness: the hash is a double MINSTD round (Park–Miller 31-bit
modular LCG — plain integer arithmetic, no 64-bit overflow), and rho comes
from the bit-length of the register value via ``bin()``; both are
replayable verbatim in any SQL engine, so the register tables hash-match
the DuckDB oracle bit for bit. (Spark's own ``approx_count_distinct``
carries an engine-private HLL++ whose registers can't be oracle-checked;
this module is the transparent, mergeable equivalent.)

No reference analogue: the reference's only cardinality machinery is the
global-index UID lists capped at uid_max (protobuf ``Uid.List.COUNT``,
ingest/.../protobuf/Uid.java) — a truncation, not an estimator. This is
part of the engine's Spark-native extension surface.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
)

from accumulo_wikisearch_spark.functions.normalize import HASH60_DUCKDB, hash60_col

_P31 = 2_147_483_647  # 2^31 - 1 (Mersenne prime, MINSTD modulus)

_INTEGRAL = (ByteType, ShortType, IntegerType, LongType)


def _key_col(df: DataFrame, col_name: str) -> Column:
    """Sketch key as a LONG: integral columns pass through; strings route
    through the portable 60-bit md5 hash (the ``decontaminate_bloom``
    pattern — DuckDB replays it verbatim, see ``HASH60_DUCKDB``).

    Anything else raises: the old behavior (``cast("long")`` on an
    arbitrary column) silently produced NULL, which collapsed every row
    into one register/cell and corrupted the sketch without an error."""
    dt = df.schema[col_name].dataType
    if isinstance(dt, _INTEGRAL):
        return F.col(col_name).cast("long")
    if isinstance(dt, StringType):
        return hash60_col(F.col(col_name))
    raise TypeError(
        f"sketch key column {col_name!r} has unsupported type "
        f"{dt.simpleString()}; expected an integral or string column"
    )


def _mix31(col: F.Column) -> F.Column:
    """Tempered 31-bit mix: MINSTD LCG rounds interleaved with xor-shift
    tempering, over a non-negative integer column.

    Max intermediate is (2^31-1)*69621 < 2^48 — safe in a long, and safe
    in any engine's BIGINT (the reason for not choosing a 64-bit avalanche
    hash: 64-bit multiplies overflow portably-differently). The xor-shift
    steps matter: bare LCG rounds leave lattice structure that biases HLL
    estimates ~2x on sequential keys (measured); with tempering, estimates
    sit within ~5% across sequential/strided/scaled key patterns."""
    x = F.pmod(col.cast("long"), F.lit(_P31))
    h = (x * 48271 + 11) % _P31
    h = h.bitwiseXOR(F.shiftright(h, 13))
    h = (h * 48271 + 17) % _P31
    h = h.bitwiseXOR(F.shiftright(h, 9))
    return (h * 69621) % _P31


def hll_registers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_buckets: int = 256,
) -> DataFrame:
    """HLL register table: (group, bucket, rho) with rho = max over the
    group's values routed to that bucket.

    One partial-aggregating shuffle on (group, bucket); output is at most
    ``m`` rows per group regardless of input size. Registers from disjoint
    slices merge with ``MAX`` (see :func:`merge_registers`). String value
    columns are hashed through :func:`hash60_col` first; other
    non-integral types raise.

    The table CARRIES its n_buckets (``hll_m`` column + field metadata,
    the histogram-domain pattern): two register tables with different
    bucket counts route the same value to different registers, so a
    silent MAX-merge or estimate across them is garbage —
    :func:`merge_registers` and :func:`hll_estimate` validate it."""
    assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of 2"
    h = _mix31(_key_col(df, value_col))
    v = (h / n_buckets).cast("long")  # value bits above the bucket index
    maxbits = 31 - int(math.log2(n_buckets))
    rho = F.when(v == 0, F.lit(maxbits + 1)).otherwise(
        maxbits + 1 - F.length(F.bin(v))
    )
    return (
        df.select(
            F.col(group_col).alias("grp"),
            (h % n_buckets).cast("int").alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("rho"))
        .select("grp", "bucket", "rho", *_sz_cols(_HLL_SZ, (n_buckets,)))
    )


_HLL_SZ = ("hll_m",)


def merge_registers(*sketches: DataFrame) -> DataFrame:
    """Merge register tables from disjoint data slices: element-wise MAX.
    The merge is what makes the sketch distributive — per-partition /
    per-day sketches combine without touching the raw data again.

    Raises ``ValueError`` when the inputs were built with DIFFERENT
    ``n_buckets`` — bucket k holds a different value population in each,
    so a silent MAX would quietly corrupt every estimate downstream.
    Validation is a schema lookup when every input carries the sizing
    metadata (no job), with a bounded data-copy fallback; a row-local
    guard in the merge pass catches metadata-poisoned unions (the
    histogram-domain enforcement pattern, applied to its sibling)."""
    if not _check_mixed_legacy(sketches, _HLL_SZ, "merge_registers"):
        out = _union_all(sketches)  # pre-sizing tables: caller's contract
        return out.groupBy("grp", "bucket").agg(F.max("rho").alias("rho"))
    out = _union_all(sketches)
    szs = _sz_resolve(sketches, out, _HLL_SZ)
    if len(szs) > 1:
        raise ValueError(
            f"merge_registers: mismatched HLL sizings {szs}"
            " — mergeable register tables must share one n_buckets"
        )
    if szs:
        guarded = out.select(
            "grp",
            "bucket",
            _sz_guard(
                szs[0],
                _HLL_SZ,
                F.col("rho"),
                "merge_registers: input rows carry a different n_buckets "
                "than the table's declared sizing — the input mixes "
                "incompatible builds",
            ).alias("rho"),
        )
        return (
            guarded.groupBy("grp", "bucket")
            .agg(F.max("rho").alias("rho"))
            .select("grp", "bucket", "rho", *_sz_cols(_HLL_SZ, szs[0]))
        )
    # all inputs empty: keep the (empty) sizing columns as they were
    return out.sparkSession.createDataFrame([], out.schema)


def bitset_test(words: list[int], pos: Column) -> Column:
    """True iff bit ``pos`` is set in the literal 60-bit-word bitset
    ``words`` — the shared codegen membership probe behind
    :func:`cms_heavy_hitters` and ``curation.decontaminate_bloom``.

    The two literal arrays are built as ONE ``F.expr`` string each (a
    single py4j call) rather than per-element ``F.lit`` trees — the
    element-wise form costs ~1 ms of driver time per literal
    (project-measured; see the ``_dvec_expr`` note in similarity.py)."""
    bitset = F.expr(
        "array(" + ",".join(f"{int(w)}L" for w in words) + ")"
    )
    masks = F.expr(
        "array(" + ",".join(f"{1 << b}L" for b in range(60)) + ")"
    )
    mask = F.element_at(masks, (pos % 60).cast("int") + 1)
    return (
        F.element_at(bitset, (pos / 60).cast("int") + 1).bitwiseAND(mask)
        == mask
    )


_CMS_SZ = ("cms_w", "cms_d")


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CMS counter tables from DISJOINT data slices: per-cell SUM —
    the additive sibling of :func:`merge_registers`. NOT idempotent
    (unlike the HLL MAX-merge): merging a slice twice double-counts it,
    so a replay/checkpoint bug is a visible count shift, not a silent
    no-op.

    Raises ``ValueError`` when the inputs carry DIFFERENT (width, depth)
    sizings — cell (r, c) counts a different key population in each, so
    a silent sum breaks the one-sided (never-undercount) estimate
    contract. Schema-metadata fast path, bounded data fallback
    (≤ width×depth rows by construction), row-local poisoned-union
    guard — the histogram-domain enforcement pattern."""
    if not _check_mixed_legacy(sketches, _CMS_SZ, "cms_merge"):
        out = _union_all(sketches)  # pre-sizing tables: caller's contract
        return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
    out = _union_all(sketches)
    szs = _sz_resolve(sketches, out, _CMS_SZ)
    if len(szs) > 1:
        raise ValueError(
            f"cms_merge: mismatched CMS sizings {szs} — mergeable"
            " counter tables must share one (width, depth)"
        )
    if szs:
        guarded = out.select(
            "row",
            "col",
            _sz_guard(
                szs[0],
                _CMS_SZ,
                F.col("cnt"),
                "cms_merge: input rows carry a different CMS sizing "
                "than the table's declared one — the input mixes "
                "incompatible builds",
            ).alias("cnt"),
        )
        return (
            guarded.groupBy("row", "col")
            .agg(F.sum("cnt").alias("cnt"))
            .select("row", "col", "cnt", *_sz_cols(_CMS_SZ, szs[0]))
        )
    return out.sparkSession.createDataFrame([], out.schema)


_BLOOM_SZ = ("bf_words", "bf_bpw", "bf_k")


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Merge Bloom bitsets built with the same sizing: per-word ``bit_or``
    — associative, commutative AND idempotent, so slices may overlap.

    Raises ``ValueError`` when the inputs carry DIFFERENT (n_words,
    bits_per_word, n_hashes) sizings — bit k means a different key
    population in each, and a probe against the blended bitset can
    return FALSE NEGATIVES, the one error a Bloom filter promises never
    to make (``curation.decontaminate_bloom`` builds on exactly that
    promise: a contaminated doc sneaking through is a silent eval leak).
    Validation is a schema lookup when every input carries the sizing
    metadata (no job; :func:`bloom_build` stamps it and parquet
    round-trips it), with a bounded data fallback (≤ n_words rows by
    construction); a row-local guard in the merge pass catches
    metadata-poisoned unions. Pre-sizing tables keep the old
    caller's-contract behavior."""
    if not _check_mixed_legacy(blooms, _BLOOM_SZ, "bloom_merge"):
        out = _union_all(blooms)  # pre-sizing tables: caller's contract
        return out.groupBy("word").agg(F.bit_or("bits").alias("bits"))
    out = _union_all(blooms)
    szs = _sz_resolve(blooms, out, _BLOOM_SZ)
    if len(szs) > 1:
        raise ValueError(
            f"bloom_merge: mismatched Bloom sizings {szs} — merging"
            " filters built with different (n_words, bits_per_word,"
            " n_hashes) can produce false negatives"
        )
    if szs:
        guarded = out.select(
            "word",
            _sz_guard(
                szs[0],
                _BLOOM_SZ,
                F.col("bits"),
                "bloom_merge: input rows carry a different Bloom sizing "
                "than the table's declared one — the input mixes "
                "incompatible builds",
            ).alias("bits"),
        )
        return (
            guarded.groupBy("word")
            .agg(F.bit_or("bits").alias("bits"))
            .select("word", "bits", *_sz_cols(_BLOOM_SZ, szs[0]))
        )
    return out.sparkSession.createDataFrame([], out.schema)


def hll_estimate(registers: DataFrame, n_buckets: int | None = None) -> DataFrame:
    """Distinct-count estimate per group from a register table — the local
    final step (float math, so this is the convenience endpoint; the
    oracle-checked artifact is the register table itself).

    Standard HLL estimator with the linear-counting small-range correction
    (empty registers counted via m - #used).

    ``n_buckets`` defaults to the sizing the table CARRIES (stamped by
    :func:`hll_registers`); an explicit argument that contradicts it
    raises — estimating a 1024-bucket table as 256 silently skews every
    count. Pre-sizing tables fall back to the historical default 256."""
    m = _resolve_sizing(
        registers, _HLL_SZ, (n_buckets,), (256,), "hll_estimate"
    )[0]
    registers = _guarded_table(
        registers, _HLL_SZ, (m,), ("grp", "bucket"), "rho", "hll_estimate", "register"
    )
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = registers.groupBy("grp").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_sum_pow"),
        F.count("*").alias("_used"),
    )
    raw = F.lit(alpha * m * m) / (F.col("_sum_pow") + (m - F.col("_used")))
    zeros = m - F.col("_used")
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((raw <= 2.5 * m) & (zeros > 0), lc).otherwise(raw)
    return agg.select("grp", est.alias("est_distinct"))


def hist_build(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.0,
    hi: float = 512.0,
    n_buckets: int = 256,
) -> DataFrame:
    """Mergeable equi-width histogram: (grp, bucket, cnt) with
    bucket = clamp(floor((v - lo) · n / (hi - lo))) — the quantile/
    distribution sketch of the family (Greenwald–Khanna-class accuracy
    is not needed when a fixed value domain is known; an equi-width
    table is exact-replayable and merge = per-bucket SUM, the CMS
    algebra). At most ``n_buckets`` rows per group regardless of input
    size; quantile estimation is a local cumulative scan over them
    (:func:`hist_quantile`).

    Engine-exactness: one double expression evaluated in the same order
    on both engines (IEEE-754 ops are deterministic; the literals
    round-trip via ``repr``), then integer floor/clamp. NULLs drop;
    out-of-domain values clamp SYMMETRICALLY — below ``lo`` into bucket
    0, at/above ``hi`` into the last bucket — so the table is lossless
    over all of ℝ and a shifted data distribution shows up as mass
    piling into an edge bucket instead of silently vanishing. For a
    data-derived domain (no clamping at all), use
    :func:`hist_build_auto`."""
    v = F.col(value_col).cast("double")
    raw = F.floor(
        (v - F.lit(lo)) * F.lit(float(n_buckets)) / F.lit(hi - lo)
    ).cast("long")
    b = F.greatest(F.least(raw, F.lit(n_buckets - 1)), F.lit(0))
    return (
        df.where(v.isNotNull())
        .select(F.col(group_col).alias("grp"), b.alias("bucket"))
        .groupBy("grp", "bucket")
        .agg(F.count("*").alias("cnt"))
        # the domain RIDES the table (constant, dictionary-encoded ~free):
        # merge and quantile read it from here instead of trusting the
        # caller to re-supply the exact build parameters — two histograms
        # with different domains have incompatible bucket meanings, and a
        # silent sum over them is garbage. The same values ride the
        # SCHEMA as column metadata (parquet round-trips it), so merge/
        # quantile validate without running a job in the common case.
        .select(
            "grp",
            "bucket",
            "cnt",
            *_dom_cols(float(lo), float(hi), int(n_buckets)),
        )
    )


def _sz_cols(names: tuple[str, ...], vals: tuple) -> list:
    """Sizing/domain columns, value in the data AND in the field
    metadata — the metadata copy makes validation a schema lookup
    instead of a Spark job wherever the lineage preserves it. The
    pattern every sketch in the family uses: a histogram's [lo, hi, n]
    domain, a Bloom filter's (n_words, bits_per_word, n_hashes), a
    CMS's (width, depth), an HLL table's n_buckets — two sketches
    built with different sizings have incompatible cell meanings, and
    a silent merge/probe across them is garbage (for Bloom, it can
    even produce FALSE NEGATIVES — the one error the filter promises
    never to make)."""
    return [
        F.lit(v).alias(n, metadata={"v": v}) for n, v in zip(names, vals)
    ]


def _sz_from_schema(df: DataFrame, names: tuple[str, ...]) -> tuple | None:
    """Sizing values from the table's field metadata, or None when any
    of it was lost along the lineage (callers then fall back to the
    bounded distinct job over the data copy)."""
    try:
        vals = []
        for c in names:
            m = df.schema[c].metadata
            if "v" not in m:
                return None
            vals.append(m["v"])
        return tuple(vals)
    except (KeyError, TypeError, ValueError):
        return None


def _sz_from_data(df: DataFrame, names: tuple[str, ...]) -> list[tuple]:
    """Distinct sizing rows actually present — one bounded job (sketch
    tables are sketch-sized by construction: ≤ n_words / width×depth /
    n_buckets×groups rows — never O(data))."""
    rows = df.select(*names).distinct().collect()
    return sorted(tuple(r[c] for c in names) for r in rows)


def _union_all(frames) -> DataFrame:
    """unionByName fold over ≥1 sketch tables — the single definition of
    the merge functions' stacking step (8 call sites)."""
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _check_mixed_legacy(
    sketches: tuple[DataFrame, ...], names: tuple[str, ...], fn_name: str
) -> bool:
    """True when every input carries the sizing columns, False when none
    does (the legacy caller's-contract path). A MIX raises with a clear
    migration message — without this check the union itself would die in
    unionByName's schema resolution (r10 review: a pre-sizing at-rest
    store merged with a freshly built sized sketch), which neither keeps
    the legacy contract nor explains what to do."""
    have = [names[0] in s.columns for s in sketches]
    if all(have):
        return True
    if not any(have):
        return False
    raise ValueError(
        f"{fn_name}: cannot merge legacy (pre-sizing) and sized sketch"
        f" tables — rebuild the legacy store with the current builder, or"
        f" strip the sizing columns (.drop({', '.join(map(repr, names))}))"
        f" to merge under the caller's-contract legacy semantics"
    )


def _sz_resolve(
    sketches: tuple[DataFrame, ...], union: DataFrame, names: tuple[str, ...]
) -> list[tuple]:
    """The distinct sizings across merge inputs: a schema lookup when
    every input still carries consistent field metadata (no job),
    else one bounded job over the union's data copy — an EMPTY input's
    placeholder metadata must not veto a well-defined merge, since it
    contributes no rows (its sizing rows don't exist either)."""
    metas = [_sz_from_schema(s, names) for s in sketches]
    if all(m is not None for m in metas) and len(set(metas)) == 1:
        return [metas[0]]
    return _sz_from_data(union, names)


def _guarded_table(
    df: DataFrame,
    names: tuple[str, ...],
    expected: tuple,
    keep_cols: tuple[str, ...],
    value_col: str,
    fn_name: str,
    noun: str,
) -> DataFrame:
    """The probe/estimate endpoints' poisoning defense, shared: when the
    sketch table carries sizing columns, project it down to its payload
    with every row's sizing checked against the RESOLVED one (see
    :func:`_sz_guard`); legacy tables just drop to the payload columns.
    The guard evaluates per row inside whatever job consumes the table —
    aggregation, broadcast build, or a threshold filter — so poisoned
    rows raise at action time even when a downstream predicate would
    have filtered them out."""
    if names[0] not in df.columns:
        return df.select(*keep_cols, value_col)
    return df.select(
        *keep_cols,
        _sz_guard(
            expected,
            names,
            F.col(value_col),
            f"{fn_name}: {noun} rows carry a different sizing than the "
            "table's declared one — the table mixes incompatible builds",
        ).alias(value_col),
    )


def _sz_guard(expected: tuple, names: tuple[str, ...], out_col: Column, msg: str) -> Column:
    """Row-local poisoning guard: schema metadata can lie on a
    hand-built ``unionByName`` (it carries ONE side's fields for mixed
    rows), so every row's own sizing values are compared against the
    RESOLVED sizing literals in the same pass — zero extra scans, zero
    extra exchanges, and (unlike the r9 collision guard, which only
    fired when rows from two builds landed in the same group) it
    catches poisoned rows whose sizings live in disjoint groups too."""
    ok = F.lit(True)
    for n, v in zip(names, expected):
        ok = ok & (F.col(n) == F.lit(v))
    return F.when(ok, out_col).otherwise(F.raise_error(F.lit(msg)))


def _resolve_sizing(
    df: DataFrame,
    names: tuple[str, ...],
    args: tuple,
    legacy_defaults: tuple,
    fn_name: str,
) -> tuple:
    """Resolve an endpoint's sizing parameters: the table's own stamped
    sizing when present (schema fast path, bounded data-copy fallback),
    else the caller's explicit arguments, else the historical defaults
    (pre-sizing tables). An explicit argument that CONTRADICTS the
    table's stamped sizing raises — probing/estimating a sketch with the
    wrong sizing is as silently wrong as a mismatched merge."""
    if names[0] in df.columns:
        t = _sz_from_schema(df, names)
        szs = [t] if t is not None else _sz_from_data(df, names)
        if len(szs) > 1:
            raise ValueError(
                f"{fn_name}: table carries {len(szs)} distinct sizings"
                f" {szs} — it is not a single mergeable sketch"
            )
        if szs:
            t = szs[0]
            for got, want, n in zip(args, t, names):
                if got is not None and got != want:
                    raise ValueError(
                        f"{fn_name}: {n}={got} contradicts the table's"
                        f" own sizing {dict(zip(names, t))}"
                    )
            return tuple(t)
    return tuple(
        a if a is not None else d for a, d in zip(args, legacy_defaults)
    )


_HIST_SZ = ("dom_lo", "dom_hi", "dom_n")


def _dom_cols(lo: float, hi: float, n_buckets: int) -> list:
    """Histogram [lo, hi, n_buckets] domain columns (see :func:`_sz_cols`)."""
    return _sz_cols(_HIST_SZ, (lo, hi, n_buckets))


def _dom_from_schema(df: DataFrame) -> tuple | None:
    t = _sz_from_schema(df, _HIST_SZ)
    if t is None:
        return None
    try:
        return (float(t[0]), float(t[1]), int(t[2]))
    except (TypeError, ValueError):
        return None


def _dom_from_data(df: DataFrame) -> list[tuple]:
    rows = df.select(*_HIST_SZ).distinct().collect()
    return sorted(
        (float(r["dom_lo"]), float(r["dom_hi"]), int(r["dom_n"])) for r in rows
    )


def hist_build_auto(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_buckets: int = 256,
) -> DataFrame:
    """:func:`hist_build` with the [lo, hi] domain derived from the data
    by a min/max pre-pass (one cheap scan-local agg — no shuffle beyond
    the 1-row aggregate) instead of a caller-guessed constant: a user
    sketching an unknown value column gets full resolution across the
    actual range rather than everything clamped into an edge bucket.
    Degenerate all-equal columns widen the domain by 1.0 so the bucket
    width stays positive. Two scans total — the price of not knowing
    the domain; at 100 TB, derive once and reuse via :func:`hist_build`
    for subsequent builds/merges (mergeable tables require one shared
    domain anyway)."""
    v = F.col(value_col).cast("double")
    r = df.select(F.min(v).alias("lo"), F.max(v).alias("hi")).first()
    if r["lo"] is None:  # no non-null values: empty histogram, any domain
        return hist_build(df, group_col, value_col, 0.0, 1.0, n_buckets)
    lo, hi = float(r["lo"]), float(r["hi"])
    if not hi > lo:
        hi = lo + 1.0
    return hist_build(df, group_col, value_col, lo, hi, n_buckets)


def hist_merge(*hists: DataFrame) -> DataFrame:
    """Merge histograms from DISJOINT slices: per-bucket SUM (additive,
    like :func:`cms_merge` — not idempotent).

    Raises ``ValueError`` when the inputs carry DIFFERENT [lo, hi,
    n_buckets] domains — bucket k means a different value interval in
    each, so a silent per-bucket sum would be garbage (e.g. two
    :func:`hist_build_auto` tables over different slices). Validation
    is a SCHEMA lookup when every input still carries the domain in its
    field metadata (hist_build stamps it; parquet round-trips it) — no
    job, so per-micro-batch streaming merges pay nothing. Inputs whose
    lineage lost the metadata fall back to one bounded job over the
    data copy (a histogram is ≤ n_buckets × groups rows by
    construction: O(sketch), never O(data)). Tables from slices that
    must merge should share ONE pre-derived domain via
    :func:`hist_build`."""
    if not _check_mixed_legacy(hists, _HIST_SZ, "hist_merge"):
        out = _union_all(hists)  # pre-domain tables: caller's contract
        return out.groupBy("grp", "bucket").agg(F.sum("cnt").alias("cnt"))
    out = _union_all(hists)
    metas = [_dom_from_schema(h) for h in hists]
    if all(m is not None for m in metas) and len(set(metas)) == 1:
        doms = [metas[0]]
    else:
        # metadata missing on some input, or it DISAGREES — consult the
        # data copy (one bounded job): an EMPTY input's placeholder
        # metadata must not veto a well-defined merge, since it
        # contributes no rows (its domain rows don't exist either)
        doms = _dom_from_data(out)
    if len(doms) > 1:
        raise ValueError(
            f"hist_merge: mismatched histogram domains {doms}"
            " — mergeable histograms must share one [lo, hi, n_buckets]"
        )
    # the eager check above trusts per-input schema metadata, which a
    # hand-built unionByName can poison (it carries ONE side's metadata
    # for mixed rows). Guard row-locally in the SAME pass against the
    # RESOLVED domain literals (see _sz_guard) — zero extra scans/
    # exchanges, and unlike the r9 min==max collision guard it also
    # catches poisoned rows whose domains live in DISJOINT (grp, bucket)
    # groups (those used to be silently re-stamped with doms[0]).
    if doms:
        guarded = out.select(
            "grp",
            "bucket",
            _sz_guard(
                doms[0],
                _HIST_SZ,
                F.col("cnt"),
                "hist_merge: input rows carry a different histogram "
                "domain than the table's declared one — the input "
                "mixes incompatible builds",
            ).alias("cnt"),
        )
        return (
            guarded.groupBy("grp", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
            .select("grp", "bucket", "cnt", *_dom_cols(*doms[0]))
        )
    # all inputs empty: keep the (empty) domain columns as they were
    return out.sparkSession.createDataFrame([], out.schema)


def hist_quantile(
    hist: DataFrame,
    q: float,
    lo: float | None = None,
    hi: float | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """(grp, est) — the q-quantile estimate per group: upper edge of the
    first bucket whose cumulative count reaches q·total. Error ≤ one
    bucket width; a purely local final step over ≤ n_buckets rows per
    group (float math — convenience endpoint; the oracle-checked
    artifact is the histogram table).

    The domain defaults to the one the table CARRIES (written by
    :func:`hist_build`); explicit arguments are only for pre-domain
    tables and must agree with the table's own domain when both exist —
    quantiling a [0, 512] build as [0, 100] silently rescales every
    estimate."""
    from pyspark.sql import Window

    meta_trusted = False
    if "dom_lo" in hist.columns:
        meta = _dom_from_schema(hist)
        meta_trusted = meta is not None
        doms = [meta] if meta is not None else _dom_from_data(hist)
        if len(doms) > 1:
            raise ValueError(
                f"hist_quantile: table carries {len(doms)} distinct domains"
                " — it is not a single mergeable histogram"
            )
        if doms:
            d = doms[0]
            for got, want, name in (
                (lo, d[0], "lo"),
                (hi, d[1], "hi"),
                (n_buckets, d[2], "n_buckets"),
            ):
                if got is not None and got != want:
                    raise ValueError(
                        f"hist_quantile: {name}={got} contradicts the "
                        f"table's own domain {d}"
                    )
            lo, hi, n_buckets = d
    if lo is None or hi is None or n_buckets is None:
        raise ValueError(
            "hist_quantile: table has no domain columns; pass lo/hi/"
            "n_buckets from the build"
        )

    w = Window.partitionBy("grp").orderBy("bucket")
    cnt = F.col("cnt")
    if meta_trusted:
        # schema metadata can lie on a hand-unioned table (it carries one
        # side's fields for mixed rows): guard each row against the
        # resolved domain literals in the SAME pass (row-local — cheaper
        # and stronger than the r9 per-group window min==max, which
        # missed a poisoned row that was alone in its group)
        cnt = _sz_guard(
            (lo, hi, n_buckets),
            _HIST_SZ,
            cnt,
            "hist_quantile: rows carry a different histogram domain "
            "than the table's declared one — the table mixes "
            "incompatible builds",
        )
    cum = hist.select(
        "grp",
        "bucket",
        F.sum(cnt).over(w).alias("cum"),
        F.sum(cnt).over(Window.partitionBy("grp")).alias("total"),
    )
    width = (hi - lo) / n_buckets
    hit = cum.where(F.col("cum") >= F.lit(q) * F.col("total"))
    return (
        hit.groupBy("grp")
        .agg(F.min("bucket").alias("b"))
        .select("grp", (F.lit(lo) + (F.col("b") + 1) * F.lit(width)).alias("est"))
    )


def _bloom_positions(key: F.Column, m: int, n_hashes: int) -> list[F.Column]:
    """The ``n_hashes`` bit positions of a key: the tempered mix over the
    salted key, reduced mod the filter width."""
    base = F.pmod(key.cast("long"), F.lit(_P31))
    return [
        (_mix31(base * 1000003 + s) % m).cast("long") for s in range(1, n_hashes + 1)
    ]


def bloom_build(
    df: DataFrame,
    key_col: str,
    n_words: int = 64,
    bits_per_word: int = 60,
    n_hashes: int = 3,
) -> DataFrame:
    """Bloom filter over a key set as a (word, bits) bitset table —
    at most ``n_words`` rows no matter how many keys went in.

    The 100 TB use: membership pre-filtering (decontamination against a
    benchmark set, "seen before" checks) WITHOUT shuffling the big side —
    the filter broadcasts, the probe is a map-side bit test, and only the
    (deterministic) false-positive survivors need an exact pass. Words
    carry ``bits_per_word`` = 60 usable bits so ``1 << bit`` never
    touches the sign bit (engines disagree on 1<<63 overflow).

    Merge = ``bit_or`` per word — associative/commutative like the HLL
    registers, so partial filters from corpus slices combine for free.
    String keys hash through :func:`hash60_col` first.

    The table CARRIES its (n_words, bits_per_word, n_hashes) sizing
    (``bf_*`` columns + field metadata, the histogram-domain pattern):
    :func:`bloom_merge` and :func:`bloom_probe` validate against it, so
    a filter can never be silently blended or probed with the wrong
    geometry — the failure mode that produces false negatives."""
    m = n_words * bits_per_word
    pos = F.explode(
        F.array(*_bloom_positions(_key_col(df, key_col), m, n_hashes))
    ).alias("pos")
    return (
        df.select(pos)
        .select(
            (F.col("pos") / bits_per_word).cast("long").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {bits_per_word} AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .select(
            "word", "bits", *_sz_cols(_BLOOM_SZ, (n_words, bits_per_word, n_hashes))
        )
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    n_words: int | None = None,
    bits_per_word: int | None = None,
    n_hashes: int | None = None,
) -> DataFrame:
    """Probe keys against a Bloom bitset: (key, in_bloom 0/1).

    No false negatives ever; false positives at the standard
    (1 - e^{-kn/m})^k rate — and because the hash is deterministic, the
    exact same positives on every engine (the oracle replays them bit
    for bit). The filter side broadcasts; the probe never shuffles.

    The sizing defaults to what the filter table CARRIES (stamped by
    :func:`bloom_build`); explicit arguments that contradict it raise —
    probing with the wrong geometry hits the wrong bits and breaks the
    no-false-negative guarantee. Pre-sizing tables fall back to the
    historical defaults (64, 60, 3)."""
    n_words, bits_per_word, n_hashes = _resolve_sizing(
        bloom,
        _BLOOM_SZ,
        (n_words, bits_per_word, n_hashes),
        (64, 60, 3),
        "bloom_probe",
    )
    # row-local guard on the (broadcast-tiny) filter side: a metadata-
    # poisoned union passes the schema fast path above, and probing its
    # minority-sizing words reads the WRONG bits — the false-negative
    # failure mode. Same defense the merges carry; also drops the sizing
    # columns, which would collide with the probe join below.
    bloom = _guarded_table(
        bloom,
        _BLOOM_SZ,
        (n_words, bits_per_word, n_hashes),
        ("word",),
        "bits",
        "bloom_probe",
        "filter",
    )
    m = n_words * bits_per_word
    pts = df.select(
        F.col(key_col).alias("key"),
        F.explode(
            F.array(*_bloom_positions(_key_col(df, key_col), m, n_hashes))
        ).alias("pos"),
    ).select(
        "key",
        (F.col("pos") / bits_per_word).cast("long").alias("word"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {bits_per_word} AS INT))"
        ).alias("mask"),
    )
    j = pts.join(F.broadcast(bloom), "word", "left")
    hit = F.when(
        F.col("bits").isNotNull()
        & (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask")),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        j.groupBy("key")
        .agg(F.min(hit).cast("int").alias("in_bloom"))
        .withColumnRenamed("key", key_col)
    )


def _cms_colpos(base: Column, width: int, r: int) -> Column:
    """Counter column of a key in CMS row ``r`` — one independent salted
    mix per row (salts offset by 100 so they never coincide with the
    Bloom salts)."""
    return (_mix31(base * 1000003 + 100 + r) % width).cast("int")


def _cms_cells(key: F.Column, width: int, depth: int) -> list[F.Column]:
    """The ``depth`` (row, col) counter cells of a key."""
    base = F.pmod(key.cast("long"), F.lit(_P31))
    return [
        F.struct(
            F.lit(r).alias("row"),
            _cms_colpos(base, width, r).alias("col"),
        )
        for r in range(1, depth + 1)
    ]


def cms_build(
    df: DataFrame, key_col: str, width: int = 1024, depth: int = 3
) -> DataFrame:
    """Count-Min sketch over a key stream: (row, col, cnt) counter table,
    at most ``depth × width`` rows regardless of stream size.

    Frequency estimation (heavy hitters, per-key rate limits) at 100 TB
    without a per-key shuffle of the raw stream: counters partial-aggregate
    map-side, and sketches from disjoint slices merge by SUMMING the
    (row, col) cells — the additive sibling of the HLL MAX-merge.
    Estimates are one-sided: never under the true count (Cormode &
    Muthukrishnan, J. Algorithms 2005). String keys hash through
    :func:`hash60_col` first.

    The table CARRIES its (width, depth) sizing (``cms_*`` columns +
    field metadata): :func:`cms_merge` and :func:`cms_estimate`
    validate against it — a mixed-sizing sum or a wrong-geometry probe
    silently breaks the never-undercount contract otherwise."""
    return (
        df.select(
            F.explode(
                F.array(*_cms_cells(_key_col(df, key_col), width, depth))
            ).alias("rc")
        )
        .select("rc.row", "rc.col")
        .groupBy("row", "col")
        .agg(F.count("*").alias("cnt"))
        .select("row", "col", "cnt", *_sz_cols(_CMS_SZ, (width, depth)))
    )


def cms_estimate(
    df: DataFrame,
    key_col: str,
    cms: DataFrame,
    width: int | None = None,
    depth: int | None = None,
) -> DataFrame:
    """Point-query the sketch: (key, est_count) = min over the key's
    ``depth`` counters. The counter table broadcasts; the probe never
    shuffles the key side. Integer, deterministic, engine-exact.

    The sizing defaults to what the counter table CARRIES (stamped by
    :func:`cms_build`); explicit contradicting arguments raise — a
    wrong-geometry probe reads the wrong cells and can UNDERCOUNT, the
    one error CMS promises never to make. Pre-sizing tables fall back
    to the historical defaults (1024, 3)."""
    width, depth = _resolve_sizing(
        cms, _CMS_SZ, (width, depth), (1024, 3), "cms_estimate"
    )
    # row-local guard (see bloom_probe): poisoned-union cells under a
    # different (width, depth) map keys to the wrong counters — the
    # undercount failure mode CMS promises never to have
    cms = _guarded_table(
        cms, _CMS_SZ, (width, depth), ("row", "col"), "cnt", "cms_estimate", "counter"
    )
    pts = df.select(
        F.col(key_col).alias("key"),
        F.explode(
            F.array(*_cms_cells(_key_col(df, key_col), width, depth))
        ).alias("rc"),
    ).select("key", "rc.row", "rc.col")
    j = pts.join(F.broadcast(cms), ["row", "col"], "left")
    return (
        j.groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
        .withColumnRenamed("key", key_col)
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    width: int = 1024,
    depth: int = 3,
) -> DataFrame:
    """Exact keys with count ≥ threshold, CMS-prefiltered — sketch-then-
    verify like :func:`~accumulo_wikisearch_spark.operators.curation.
    decontaminate_bloom`: the answer is EXACTLY the HAVING-count query's.

    At 100 TB an exact per-key count shuffles every key; here the only
    per-key shuffle is the final exact count over CANDIDATE rows. The
    over-threshold CMS cells (≤ width×depth rows by construction — never
    corpus-sized) are collected and compiled into per-row literal
    bitmasks, so candidacy is a pure whole-stage-codegen bit test on the
    re-scan: a row survives iff ALL ``depth`` of its cells are over
    threshold, i.e. iff its CMS estimate (the min over cells) clears the
    bar. No ``distinct()``, no join — the same literal-bitset trick as
    ``curation.decontaminate_bloom``. CMS estimates never undercount, so
    every true heavy key survives the prefilter; the exact groupBy over
    the surviving rows discards the sketch's false positives. Output:
    (key, cnt) for true heavy hitters only."""
    member = _over_threshold_member(df, key_col, threshold, width, depth)
    exact = df.where(member).groupBy(key_col).agg(F.count("*").alias("cnt"))
    return exact.where(F.col("cnt") >= threshold)


def _over_threshold_member(
    df: DataFrame,
    key_col: str,
    threshold: int,
    width: int | None = None,
    depth: int | None = None,
    cms: DataFrame | None = None,
) -> F.Column:
    """Codegen membership predicate "this row's key has CMS estimate ≥
    threshold": the over-threshold cells (≤ width×depth by construction)
    compile into per-depth-row literal bitmasks and the row passes iff
    ALL its cells are over — i.e. iff min-over-cells (the estimate)
    clears the bar. Shared by :func:`cms_heavy_hitters` and
    :func:`cms_candidate_keys`; no distinct, no join. A supplied ``cms``
    table's stamped sizing wins (contradicting arguments raise — the
    bitmask geometry must match the build's)."""
    if cms is None:
        width = 1024 if width is None else width
        depth = 3 if depth is None else depth
        cms = cms_build(df, key_col, width, depth)
    else:
        width, depth = _resolve_sizing(
            cms, _CMS_SZ, (width, depth), (1024, 3), "cms_candidate_keys"
        )
    # guard BEFORE the threshold filter: a poisoned table whose
    # minority-sizing cells are all SUB-threshold would otherwise pass
    # silently and drop that build's hot keys from the candidate set (a
    # CMS false negative) — guarding the projection makes every row
    # evaluate during this collect job, like the sibling endpoints
    cms = _guarded_table(
        cms, _CMS_SZ, (width, depth), ("row", "col"), "cnt",
        "cms_candidate_keys", "counter",
    )
    hot = cms.where(F.col("cnt") >= threshold).collect()
    words_per_row = (width + 59) // 60  # 60 usable bits/long (sign-safe)
    bitmaps = [[0] * words_per_row for _ in range(depth)]
    for c in hot:
        bitmaps[c["row"] - 1][c["col"] // 60] |= 1 << (c["col"] % 60)
    base = F.pmod(_key_col(df, key_col).cast("long"), F.lit(_P31))
    member = F.lit(True)
    for r in range(1, depth + 1):
        member = member & bitset_test(
            bitmaps[r - 1], _cms_colpos(base, width, r)
        )
    return member


def cms_candidate_keys(
    df: DataFrame,
    key_col: str,
    threshold: int,
    cms: DataFrame | None = None,
    width: int | None = None,
    depth: int | None = None,
) -> DataFrame:
    """BOUNDED probe set for :func:`cms_estimate`: the distinct keys
    whose estimate clears ``threshold``. The filter is the literal-bitset
    codegen test, so the only exchange is the distinct over SURVIVING
    rows — whose key count is ≤ total/threshold true hot keys plus the
    sketch's deterministic false positives, never the full key set (a
    bare ``df.select(key).distinct()`` probe shuffles every key at
    100 TB — the anti-pattern the heavy-hitters rewrite removed)."""
    member = _over_threshold_member(df, key_col, threshold, width, depth, cms)
    return df.where(member).select(key_col).distinct()


# ---------------------------------------------------------------------------
# driver registry
# ---------------------------------------------------------------------------


def queries():
    from accumulo_wikisearch_spark.session import tune_runtime

    def _registers(spark, sf_dir):
        tune_runtime(spark)
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        return hll_registers(events, "event_type", "user_id")

    def _merge(spark, sf_dir):
        # sketch two disjoint halves of the corpus independently, then
        # merge — the oracle computes the registers over the WHOLE corpus
        # directly, so the check IS the distributivity proof
        tune_runtime(spark)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        a = hll_registers(docs.where(F.col("doc_id") % 2 == 0), "lang", "doc_id")
        b = hll_registers(docs.where(F.col("doc_id") % 2 == 1), "lang", "doc_id")
        return merge_registers(a, b)

    def _bloom(spark, sf_dir):
        # membership pre-filter: which customers appear in the orders
        # key set, per the broadcast Bloom bitset (deterministic false
        # positives and all — the oracle replays the exact bit tests)
        tune_runtime(spark)
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
        bloom = bloom_build(orders, "o_custkey")
        return bloom_probe(customer, "c_custkey", bloom)

    def _cms(spark, sf_dir):
        # per-user event-count estimates from the CMS counter table for
        # the HOT-KEY candidates (est >= 50); one-sided error
        # (est >= true), deterministic collisions. The probe set comes
        # from cms_candidate_keys — a bounded distinct over candidate
        # rows, not a full-key-set exchange.
        tune_runtime(spark)
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        cms = cms_build(events, "user_id")
        probes = cms_candidate_keys(events, "user_id", 50, cms=cms)
        return cms_estimate(probes, "user_id", cms)

    def _heavy(spark, sf_dir):
        # users with >= 70 events, exact, through the CMS prefilter
        tune_runtime(spark)
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        return cms_heavy_hitters(events, "user_id", 70)

    def _hist_quantile(spark, sf_dir):
        # the quantile endpoint over a carried-domain table: median event
        # value per type, error ≤ one bucket width. Exactness: with the
        # default [0, 512]×256 domain the bucket width is exactly 2.0,
        # so every estimate is an exactly-representable double both
        # engines compute identically (lo + (b+1)·width)
        tune_runtime(spark)
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        return hist_quantile(hist_build(events, "event_type", "value"), 0.5)

    def _bloom_sized(spark, sf_dir):
        # NON-DEFAULT geometry (32 words, 4 hashes), probed WITHOUT
        # re-supplying it: bloom_probe resolves the sizing from the
        # table's r10 stamping — the driver check proves the resolution
        # path end-to-end (a wrong-geometry probe would flip bits and
        # hash-mismatch the oracle, which replays the exact 32/60/4
        # positions)
        tune_runtime(spark)
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
        bloom = bloom_build(orders, "o_custkey", n_words=32, n_hashes=4)
        return bloom_probe(customer, "c_custkey", bloom)

    def _registers_string(spark, sf_dir):
        # STRING value column: routed through hash60 (r6 ask) — distinct
        # source labels per language, sketched
        tune_runtime(spark)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return hll_registers(docs, "lang", "source")

    def _hist(spark, sf_dir):
        # distribution sketch: disjoint halves merged == direct build
        # (the oracle computes the direct table; the merge IS the check,
        # like sketch_hll_merge)
        tune_runtime(spark)
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        a = hist_build(events.where(F.col("event_id") % 2 == 0), "event_type", "value")
        b = hist_build(events.where(F.col("event_id") % 2 == 1), "event_type", "value")
        return hist_merge(a, b)

    def _hist_auto(spark, sf_dir):
        # the data-derived-domain variant: min/max pre-pass sizes
        # [lo, hi], so an unknown value column gets full resolution (the
        # oracle re-derives the identical domain in SQL)
        tune_runtime(spark)
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        return hist_build_auto(events, "event_type", "value")

    return {
        "sketch_hll_registers": _registers,
        "sketch_hll_merge": _merge,
        "sketch_bloom_semijoin": _bloom,
        "sketch_bloom_sized_probe": _bloom_sized,
        "sketch_cms_counts": _cms,
        "sketch_cms_heavy": _heavy,
        "sketch_hll_string": _registers_string,
        "sketch_hist_merge": _hist,
        "sketch_hist_auto": _hist_auto,
        "sketch_hist_quantile": _hist_quantile,
    }


def _pm_expr(x: str) -> str:
    """Non-negative remainder mod 2^31-1 — the SQL twin of ``F.pmod``.
    DuckDB's ``%`` is sign-preserving, so a bare ``x % p`` silently
    diverges from the Spark side on negative keys (r6 ADVICE); the
    double-mod form matches pmod for every input."""
    return f"((({x}) % {_P31} + {_P31}) % {_P31})"


def _key_expr(key: str, is_string: bool) -> str:
    """SQL twin of :func:`_key_col`: strings route through hash60."""
    return HASH60_DUCKDB.format(expr=key) if is_string else key


def _reg_sql(table: str, grp: str, val: str, val_is_string: bool = False) -> str:
    """DuckDB replay of hll_registers: the tempered mix staged as CTEs
    (xor / >> / % are the same portable primitives the Spark side uses)."""
    val = _key_expr(val, val_is_string)
    return f"""
WITH s0 AS (SELECT {grp} AS grp,
            ({_pm_expr(val)} * 48271 + 11) % 2147483647 AS h FROM {table}),
s1 AS (SELECT grp, xor(h, h >> 13) AS h FROM s0),
s2 AS (SELECT grp, (h * 48271 + 17) % 2147483647 AS h FROM s1),
s3 AS (SELECT grp, xor(h, h >> 9) AS h FROM s2),
s4 AS (SELECT grp, (h * 69621) % 2147483647 AS h FROM s3)
SELECT grp, (h % 256)::INTEGER AS bucket,
       max(CASE WHEN h // 256 = 0 THEN 24
                ELSE 24 - length(bin(h // 256)) END)::INTEGER AS rho,
       CAST(256 AS INTEGER) AS hll_m
FROM s4 GROUP BY 1, 2
"""


def _mix_expr(x: str) -> str:
    """The tempered mix as ONE nested SQL expression (stages duplicate
    their input textually — fine for correctness, and small enough).
    The entry remainder is the pmod form — later stages stay non-negative
    by construction, so plain ``%`` is exact there."""
    s0 = f"(({_pm_expr(x)} * 48271 + 11) % {_P31})"
    s1 = f"xor({s0}, {s0} >> 13)"
    s2 = f"(({s1} * 48271 + 17) % {_P31})"
    s3 = f"xor({s2}, {s2} >> 9)"
    return f"(({s3} * 69621) % {_P31})"


def _bloom_sql(
    build_tab: str,
    build_key: str,
    probe_tab: str,
    probe_key: str,
    n_words: int = 64,
    bpw: int = 60,
    n_hashes: int = 3,
) -> str:
    m = n_words * bpw
    salts = range(1, n_hashes + 1)
    bpts = " UNION ALL ".join(
        f"SELECT {_mix_expr(f'{_pm_expr(build_key)} * 1000003 + {s}')} % {m} AS pos"
        f" FROM {build_tab}"
        for s in salts
    )
    ppts = " UNION ALL ".join(
        f"SELECT {probe_key} AS key,"
        f" {_mix_expr(f'{_pm_expr(probe_key)} * 1000003 + {s}')} % {m} AS pos"
        f" FROM {probe_tab}"
        for s in salts
    )
    return f"""
WITH bpts AS ({bpts}),
bloom AS (
  SELECT pos // {bpw} AS word,
         bit_or(1::BIGINT << (pos % {bpw})::INTEGER) AS bits
  FROM bpts GROUP BY 1
),
ppts AS ({ppts}),
probed AS (
  SELECT p.key,
    CASE WHEN b.bits IS NOT NULL
          AND (b.bits & (1::BIGINT << (p.pos % {bpw})::INTEGER))
              = (1::BIGINT << (p.pos % {bpw})::INTEGER)
         THEN 1 ELSE 0 END AS hit
  FROM ppts p LEFT JOIN bloom b ON p.pos // {bpw} = b.word
)
SELECT key AS {probe_key}, min(hit)::INTEGER AS in_bloom FROM probed GROUP BY 1
"""


def _bloom_table_sql(
    tab: str, key: str, n_words: int = 64, bpw: int = 60, n_hashes: int = 3
) -> str:
    """DuckDB replay of bloom_build alone: the (word, bits) bitset table
    (the streaming-store oracle; the CTE body of :func:`_bloom_sql`)."""
    m = n_words * bpw
    bpts = " UNION ALL ".join(
        f"SELECT {_mix_expr(f'{_pm_expr(key)} * 1000003 + {s}')} % {m} AS pos"
        f" FROM {tab}"
        for s in range(1, n_hashes + 1)
    )
    return (
        f"WITH bpts AS ({bpts})\n"
        f"SELECT pos // {bpw} AS word,"
        f" bit_or(1::BIGINT << (pos % {bpw})::INTEGER) AS bits,"
        f" CAST({n_words} AS INTEGER) AS bf_words,"
        f" CAST({bpw} AS INTEGER) AS bf_bpw,"
        f" CAST({n_hashes} AS INTEGER) AS bf_k\n"
        "FROM bpts GROUP BY 1"
    )


def _cms_table_sql(tab: str, key: str, width: int = 1024, depth: int = 3) -> str:
    """DuckDB replay of cms_build alone: the (row, col, cnt) counter
    table (the streaming-store oracle and the CTE body of
    :func:`_cms_sql`)."""
    cells = " UNION ALL ".join(
        f"SELECT {r} AS row,"
        f" {_mix_expr(f'{_pm_expr(key)} * 1000003 + {100 + r}')} % {width} AS col"
        f" FROM {tab}"
        for r in range(1, depth + 1)
    )
    return (
        f"WITH cells AS ({cells})\n"
        "SELECT row, col, count(*) AS cnt,"
        f" CAST({width} AS INTEGER) AS cms_w,"
        f" CAST({depth} AS INTEGER) AS cms_d"
        " FROM cells GROUP BY 1, 2"
    )


def _cms_sql(
    tab: str,
    key: str,
    width: int = 1024,
    depth: int = 3,
    min_est: int | None = None,
) -> str:
    """``min_est`` replays cms_candidate_keys' probe-set bound: a key is
    probed iff its estimate (min over cells) clears the threshold — the
    naive oracle may estimate every key, the Spark side must not."""
    salts = range(1, depth + 1)
    cells = " UNION ALL ".join(
        f"SELECT {r} AS row,"
        f" {_mix_expr(f'{_pm_expr(key)} * 1000003 + {100 + r}')} % {width} AS col"
        f" FROM {tab}"
        for r in salts
    )
    probes = " UNION ALL ".join(
        f"SELECT {key} AS key, {r} AS row,"
        f" {_mix_expr(f'{_pm_expr(key)} * 1000003 + {100 + r}')} % {width} AS col"
        f" FROM (SELECT DISTINCT {key} FROM {tab})"
        for r in salts
    )
    having = f"HAVING min(cnt) >= {min_est}" if min_est is not None else ""
    return f"""
WITH cells AS ({cells}),
cms AS (SELECT row, col, count(*) AS cnt FROM cells GROUP BY 1, 2),
ppts AS ({probes}),
joined AS (
  SELECT p.key, coalesce(c.cnt, 0) AS cnt
  FROM ppts p LEFT JOIN cms c ON p.row = c.row AND p.col = c.col
)
SELECT key AS {key}, min(cnt)::BIGINT AS est_count FROM joined GROUP BY 1 {having}
"""


def oracle_sql():
    return {
        "sketch_hll_registers": _reg_sql("events", "event_type", "user_id"),
        "sketch_hll_merge": _reg_sql("documents", "lang", "doc_id"),
        "sketch_bloom_semijoin": _bloom_sql(
            "orders", "o_custkey", "customer", "c_custkey"
        ),
        "sketch_bloom_sized_probe": _bloom_sql(
            "orders", "o_custkey", "customer", "c_custkey",
            n_words=32, n_hashes=4,
        ),
        "sketch_cms_counts": _cms_sql("events", "user_id", min_est=50),
        # exact HAVING query on purpose: the CMS prefilter must not
        # change the answer (estimates never undercount)
        "sketch_cms_heavy": (
            "SELECT user_id, count(*) AS cnt FROM events"
            " GROUP BY 1 HAVING count(*) >= 70"
        ),
        "sketch_hll_string": _reg_sql(
            "documents", "lang", "source", val_is_string=True
        ),
        # direct-build oracle: the Spark side merges two disjoint halves,
        # so the hash match proves the merge algebra as well (clamping is
        # symmetric: below-lo → bucket 0, ≥hi → last bucket)
        "sketch_hist_merge": f"""
SELECT event_type AS grp,
       greatest(least(floor(((value::DOUBLE - CAST({0.0!r} AS DOUBLE)) * CAST({256.0!r} AS DOUBLE)) / CAST({512.0!r} AS DOUBLE))::BIGINT, 255), 0) AS bucket,
       count(*) AS cnt,
       CAST({0.0!r} AS DOUBLE) AS dom_lo,
       CAST({512.0!r} AS DOUBLE) AS dom_hi,
       CAST(256 AS INTEGER) AS dom_n
FROM events
WHERE value IS NOT NULL
GROUP BY 1, 2
""",
        # the quantile endpoint: cumulative scan over the direct-build
        # histogram; estimates are exact multiples of the 2.0 bucket
        # width, so the doubles hash-match bit for bit
        "sketch_hist_quantile": f"""
WITH h AS (
  SELECT event_type AS grp,
         greatest(least(floor(((value::DOUBLE - CAST({0.0!r} AS DOUBLE)) * CAST({256.0!r} AS DOUBLE)) / CAST({512.0!r} AS DOUBLE))::BIGINT, 255), 0) AS bucket,
         count(*) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), c AS (
  SELECT grp, bucket, cnt,
         sum(cnt) OVER (PARTITION BY grp ORDER BY bucket) AS cum,
         sum(cnt) OVER (PARTITION BY grp) AS total
  FROM h
), hit AS (
  SELECT grp, min(bucket) AS b FROM c WHERE cum >= 0.5 * total GROUP BY grp
)
SELECT grp,
       CAST({0.0!r} AS DOUBLE)
         + (b + 1) * ((CAST({512.0!r} AS DOUBLE) - CAST({0.0!r} AS DOUBLE)) / 256) AS est
FROM hit
""",
        # the auto-domain twin: the oracle re-derives the SAME min/max in
        # SQL (exact IEEE ops → identical doubles → identical buckets)
        "sketch_hist_auto": f"""
WITH d AS (
  SELECT min(value::DOUBLE) AS lo,
         CASE WHEN max(value::DOUBLE) > min(value::DOUBLE)
              THEN max(value::DOUBLE) ELSE min(value::DOUBLE) + 1.0 END AS hi
  FROM events
)
SELECT event_type AS grp,
       greatest(least(floor(((value::DOUBLE - d.lo) * CAST({256.0!r} AS DOUBLE)) / (d.hi - d.lo))::BIGINT, 255), 0) AS bucket,
       count(*) AS cnt,
       d.lo AS dom_lo,
       d.hi AS dom_hi,
       CAST(256 AS INTEGER) AS dom_n
FROM events, d
WHERE value IS NOT NULL
GROUP BY 1, 2, 4, 5
""",
    }
