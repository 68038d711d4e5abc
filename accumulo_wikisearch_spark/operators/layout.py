"""Z-order (Morton-curve) data layout — multi-column pruning for scans
that filter on TWO keys at once.

A single `partitionBy(col)` layout prunes scans on that column only; a
100 TB event store queried by BOTH `(user_id range)` and `(shard/time
range)` forces a full scan for one of them. Interleaving the bits of the
two keys (Morton 1966; the same technique behind Delta/Iceberg OPTIMIZE
ZORDER) makes points close in EITHER dimension close on the curve, so
partitioning by the z-value's top bits yields directories that are
axis-aligned RECTANGLES in (x, y) — a range box on either or both keys
maps to a small, exactly-computable set of directories.

Everything here is plain integer bit arithmetic (shift/and/or), so the
z-values are engine-exact and the driver entry hash-checks them against
a DuckDB replay; the query-side bucket enumeration is a driver-side loop
over at most ``2^bucket_bits`` buckets (bounded, like the IVF probe-cell
collect), NOT a scan.

No reference analogue: the reference's only layout is the single-key
sorted Accumulo table (partitioner.RangePartitioner); this is part of
the engine's Spark-native scale surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ZBITS = 10  # per-dimension bits → z in [0, 2^20)
BUCKET_BITS = 4  # top z-bits used as the partition directory key


def zvalue_col(c1: Column, c2: Column, bits: int = ZBITS) -> Column:
    """Morton z-value of the low ``bits`` of two non-negative integer
    columns: bit j of x lands at z-bit 2j, bit j of y at 2j+1. A flat
    ±-chain of 2·bits shift/and terms — whole-stage codegen, no UDF."""
    x = F.pmod(c1.cast("long"), F.lit(1 << bits))
    y = F.pmod(c2.cast("long"), F.lit(1 << bits))
    z = F.lit(0).cast("long")
    for j in range(bits):
        z = z + F.shiftleft(F.shiftright(x, j).bitwiseAND(F.lit(1)), 2 * j)
        z = z + F.shiftleft(
            F.shiftright(y, j).bitwiseAND(F.lit(1)), 2 * j + 1
        )
    return z


def zvalue_sql(x: str, y: str, bits: int = ZBITS) -> str:
    """DuckDB replay of :func:`zvalue_col` (same shift/and terms)."""
    m = 1 << bits
    xs = f"((({x}) % {m} + {m}) % {m})"
    ys = f"((({y}) % {m} + {m}) % {m})"
    terms = []
    for j in range(bits):
        terms.append(f"((({xs} >> {j}) & 1) << {2 * j})")
        terms.append(f"((({ys} >> {j}) & 1) << {2 * j + 1})")
    return "(" + " + ".join(terms) + ")"


def _bucket_rects(bits: int, bucket_bits: int):
    """bucket id → its (x, y) prefix rectangle [x0, x1) × [y0, y1).

    The top ``bucket_bits`` z-bits are, from the top: y_{bits-1},
    x_{bits-1}, y_{bits-2}, … — alternating dimensions. Decoding them
    back gives per-dimension prefixes, i.e. an axis-aligned rectangle."""
    out = {}
    nx = bucket_bits // 2  # x-prefix bits (x holds the EVEN z-bits)
    ny = bucket_bits - nx
    for b in range(1 << bucket_bits):
        xp = yp = 0
        # walk the bucket's bits from the top of z downward
        for i in range(bucket_bits):
            zbit_index = 2 * bits - 1 - i
            bit = (b >> (bucket_bits - 1 - i)) & 1
            if zbit_index % 2:  # odd z-bit → y dimension
                yp = (yp << 1) | bit
            else:
                xp = (xp << 1) | bit
        xw = 1 << (bits - nx)
        yw = 1 << (bits - ny)
        out[b] = (xp * xw, (xp + 1) * xw, yp * yw, (yp + 1) * yw)
    return out


def zbuckets_for_box(
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
    bits: int = ZBITS,
    bucket_bits: int = BUCKET_BITS,
) -> list[int]:
    """Bucket ids whose rectangle intersects the query box
    [x_lo, x_hi] × [y_lo, y_hi] — exact (rectangles are prefix-aligned),
    driver-side, O(2^bucket_bits)."""
    hits = []
    for b, (x0, x1, y0, y1) in _bucket_rects(bits, bucket_bits).items():
        if x0 <= x_hi and x_lo < x1 and y0 <= y_hi and y_lo < y1:
            hits.append(b)
    return hits


def write_zordered(
    df: DataFrame,
    path: str,
    c1: str,
    c2: str,
    bits: int = ZBITS,
    bucket_bits: int = BUCKET_BITS,
) -> None:
    """Write ``df`` partitioned by the z-value's top ``bucket_bits`` bits
    and z-sorted within each directory (row-group min/max clustering for
    the bits below the directory key).

    The shuffle RANGE-partitions on the full z-value, not the directory
    key: hash-partitioning on ``zb`` would cap write parallelism at
    2^bucket_bits tasks (a wall at 100 TB), while a z-range split keeps
    parallelism at ``spark.sql.shuffle.partitions`` — each task covers a
    contiguous z interval, so it still lands in only one or two
    directories and stays sorted.

    Keys MUST lie in [0, 2^bits): the interleave wraps values modulo
    2^bits, which would silently route an out-of-domain key into the
    wrong rectangle and make box reads MISS it. The write therefore
    raises per-row on violation — the check rides the same scan, no
    extra pass. Size ``bits`` to the key domain."""
    lim = 1 << bits

    def _checked(name: str) -> Column:
        c = F.col(name).cast("long")
        return F.when((c >= 0) & (c < lim), c).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"z-order key {name} outside [0, {lim}): "
                    ),
                    c.cast("string"),
                )
            )
        )

    z = zvalue_col(_checked(c1), _checked(c2), bits)
    shift = 2 * bits - bucket_bits
    (
        df.withColumn("z", z)
        .withColumn("zb", F.shiftright(F.col("z"), shift).cast("int"))
        .repartitionByRange(F.col("z"))
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .partitionBy("zb")
        .parquet(path)
    )


def read_zordered_box(
    spark: SparkSession,
    path: str,
    c1: str,
    x_lo: int,
    x_hi: int,
    c2: str,
    y_lo: int,
    y_hi: int,
    bits: int = ZBITS,
    bucket_bits: int = BUCKET_BITS,
) -> DataFrame:
    """Scan a z-ordered store for a two-sided range box: the bucket list
    becomes a PARTITION FILTER (only intersecting directories are read),
    then the exact predicates re-verify — prune-then-verify, the same
    contract as every sketch path here.

    The box must lie inside the store's key domain [0, 2^bits) (the
    write path enforces the same bound on the stored keys — see
    :func:`write_zordered`); a box reaching outside it would prune
    against wrapped coordinates and silently miss rows, so it raises."""
    lim = 1 << bits
    if not (0 <= x_lo and x_hi < lim and 0 <= y_lo and y_hi < lim):
        raise ValueError(
            f"query box [{x_lo}, {x_hi}] x [{y_lo}, {y_hi}] outside the "
            f"z-store key domain [0, {lim})"
        )
    buckets = zbuckets_for_box(x_lo, x_hi, y_lo, y_hi, bits, bucket_bits)
    df = spark.read.parquet(path)
    if buckets:
        df = df.where(F.col("zb").isin(*buckets))
    else:
        df = df.where(F.lit(False))
    return df.where(
        F.col(c1).between(x_lo, x_hi) & F.col(c2).between(y_lo, y_hi)
    )


# ---------------------------------------------------------------------------
# driver registry
# ---------------------------------------------------------------------------


# at-rest z-store per sf_dir (immutable once written, like the written-
# catalog caches in entry_queries)
_ZSTORES: dict = {}


def queries():
    from accumulo_wikisearch_spark.session import tune_runtime

    def _zvalue(spark, sf_dir):
        # z-values over (user_id, value-bucket) per event — pure integer
        # bit interleave, hash-checked bit for bit
        tune_runtime(spark)
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        # floor, not cast: double→BIGINT casts truncate in Spark but
        # round in DuckDB — floor is identical in both
        return events.select(
            "event_id",
            zvalue_col(
                F.col("user_id"), F.floor(F.col("value")).cast("long")
            ).alias("zval"),
        )

    def _box_scan(spark, sf_dir):
        # write the z-ordered store once, then answer a two-sided range
        # box THROUGH the partition-pruned read path — the at-rest
        # layout proof (the oracle is the plain filter over raw events).
        # bits=11 covers every corpus SF's key domain (user_id < 1500 at
        # sf0.1, value buckets < 600); the write raises if that ever
        # stops holding. The cache is set only AFTER the write succeeds
        # so a failed write cannot poison later invocations.
        import tempfile

        tune_runtime(spark)
        path = _ZSTORES.get(sf_dir)
        if path is None:
            events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
                "event_id",
                "user_id",
                F.floor("value").cast("long").alias("vb"),
            )
            tmp = tempfile.mkdtemp(prefix="wikisearch-z-")
            write_zordered(events, tmp, "user_id", "vb", bits=11)
            path = _ZSTORES[sf_dir] = tmp
        return read_zordered_box(
            spark, path, "user_id", 10, 40, "vb", 5, 30, bits=11
        ).select("event_id")

    return {"layout_zvalue": _zvalue, "layout_box_scan": _box_scan}


def oracle_sql():
    return {
        "layout_zvalue": (
            "SELECT event_id, "
            + zvalue_sql("user_id", "floor(value)::BIGINT")
            + " AS zval FROM events"
        ),
        "layout_box_scan": (
            "SELECT event_id FROM events WHERE user_id BETWEEN 10 AND 40"
            " AND floor(value)::BIGINT BETWEEN 5 AND 30"
        ),
    }
