"""Fixture loaders for the driver-generated parquet tables (TESTDATA.md).

One function: ``table(spark, sf_dir, name)``. Reads are plain
``spark.read.parquet`` so Catalyst's column pruning / predicate pushdown
reach the parquet scan (verify with ``df.explain`` -> ``PushedFilters``,
``ReadSchema``). At cluster scale the same call distributes across
executors; nothing here collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any realistic scale
#: factor (region=5, nation=25 rows fixed by the TPC-H-ish schema).
BROADCAST_DIMS = ("region", "nation", "supplier", "part")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    tune(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; session.tune() sets nanosAsLong so it arrives as
        # int64 nanos. Truncate to micros exactly like DuckDB does when it
        # coerces ns -> its native us timestamps, so oracles agree.
        # Integer DIV (not /): ns values ~1.7e18 exceed double's 53-bit
        # mantissa, float division would corrupt low digits.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df
