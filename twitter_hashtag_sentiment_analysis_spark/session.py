"""SparkSession factory + defensive per-session tuning.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (single JVM), but every
query in this engine is written for a real multi-executor cluster:
declarative plans (Catalyst does pushdown/pruning/join selection), AQE on
for runtime coalescing + skew-join handling, Arrow for the Python
boundary, and UTC session time so results are reproducible against the
DuckDB oracle regardless of host timezone.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs we also apply defensively to externally-created
# sessions (the driver builds its own SparkSession before calling us).
_RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # events.parquet stores TIMESTAMP(NANOS); Spark has no ns timestamp
    # type, so read as int64 nanos and convert in io.table().
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "thsa-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or get) a tuned local session for tests/bench."""
    cpus = default_parallelism()
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally-created session.

    Idempotent and cheap; called from the fixture loader so driver-owned
    sessions get UTC timestamps + AQE without us owning their builder.
    """
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be static in some builds
            pass
    try:
        # 200 default shuffle partitions dominates wall-clock at fixture
        # scale; AQE coalesces anyway, this just trims scheduling overhead.
        cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
        if cur > 64:
            spark.conf.set("spark.sql.shuffle.partitions", str(default_parallelism()))
    except Exception:  # pragma: no cover
        pass
    return spark
