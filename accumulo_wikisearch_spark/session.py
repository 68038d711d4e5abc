"""SparkSession helper for tests and bench.

The driver supplies its own session to ``__spark_entry__``; this builder is
for local tests/bench runs. Settings chosen for the local[32] harness but
with scale-out posture documented per knob.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "accumulo-wikisearch-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        # One shuffle partition per core locally; on a 1000-executor cluster
        # this is sized to ~128MB per post-shuffle partition instead (AQE
        # coalescing makes the exact number less critical).
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE coalesce the partitioning of CACHED plans too (off by
        # default): the global/term index caches are built behind a
        # shuffle sized by spark.sql.shuffle.partitions, and without this
        # every per-query scan of them pays one task per shuffle
        # partition regardless of data size (32 tasks over a few MB
        # locally; 200+ tiny cached partitions on a cluster default).
        # Scale-adaptive by construction — AQE targets
        # advisoryPartitionSizeInBytes, so big caches keep their width.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python call-site capture for error enrichment costs ~2 py4j
        # round-trips per DataFrame API call (~6 ms each measured); plan
        # construction issues thousands — disabling it cut build_index's
        # driver-side phase from ~1.4 s to ~0.9 s at sf0.1. Errors still
        # carry the full JVM analysis context, just not the Python line.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # driver testdata stores events.ts as TIMESTAMP(NANOS)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def tune_runtime(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs when handed a foreign session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # Disable per-call Python call-site capture (see get_spark). The
    # conf itself is STATIC (cannot be set on a live session), but the
    # enforcement is purely Python-side behind a cached flag — flipping
    # the cache is the only way to apply it to a foreign session, and it
    # degrades to a no-op if the internals move. Validated against
    # pyspark 4.1.2 (pyspark/errors/utils.py's module-level
    # `_enable_debugging_cache`); re-check the attribute name on pyspark
    # upgrades — a rename simply restores the slower default behavior.
    # RESPECT an explicit opt-in: a host that set the conf to true at
    # builder time keeps its call-site-enriched errors; only unset/false
    # sessions get the fast path.
    try:
        explicit = spark.conf.get(
            "spark.python.sql.dataFrameDebugging.enabled", None
        )
        if explicit is None or str(explicit).lower() == "false":
            import pyspark.errors.utils as _eu

            _eu._enable_debugging_cache = False
    except Exception:
        pass
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    try:
        # cached-plan AQE coalescing (see get_spark) — runtime-settable;
        # a host that disallows it just keeps the wider cached layout
        spark.conf.set(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
    except Exception:
        pass
    try:
        nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        # Never set shuffle partitions below the session's parallelism:
        # the old flat 32 cap was right for local[32] but would serialize
        # every shuffle to 32 tasks on a 1000-core cluster. Keep the
        # local[32] behavior (defaultParallelism <= 32 → 32) and only
        # ever LOWER the default-200 over-partitioning, never the
        # cluster's own sizing.
        floor = max(32, int(spark.sparkContext.defaultParallelism))
        if nparts > max(64, floor):
            spark.conf.set("spark.sql.shuffle.partitions", str(floor))
    except Exception:
        pass
    return spark
