"""Parquet table sources for the synthetic star schema (TESTDATA.md).

Parquet is the engine's primary source/sink (the cloud-optimized role Zarr
plays in the reference — SURVEY.md §1.5). Reads go through
``spark.read.parquet`` so Catalyst gets predicate pushdown + column
pruning for free; callers must select only the columns they need.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which the vectorized
        # Parquet reader rejects; read as long nanos and truncate to
        # microseconds (exactly what DuckDB does when it coerces NS->US).
        from pyspark.sql import functions as F
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_table_parallel(spark: SparkSession, sf_dir: str, name: str,
                        key: str | None = None) -> DataFrame:
    """load_table + guaranteed scan parallelism for compute-heavy ops.

    On a cluster, parallelism comes from file splits; a small local table
    is ONE parquet file -> one partition -> hashing/shingling/vector math
    runs on a single core. Repartition (hash on ``key`` when given, else
    round-robin) up to the default parallelism — the few-MB shuffle is
    noise next to the per-row compute it unlocks, and at real scale the
    branch never triggers.
    """
    df = load_table(spark, sf_dir, name)
    try:
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            from pyspark.sql import functions as F
            df = (df.repartition(target, F.col(key)) if key
                  else df.repartition(target))
    except Exception:
        pass  # e.g. Spark Connect: no sparkContext; keep the plain scan
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose all tables as SQL temp views (for spark.sql-style plans)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
