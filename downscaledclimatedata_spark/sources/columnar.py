"""Columnar source/sink beyond Parquet: ORC (Spark-native, zero extra
dependencies).

Why it exists: a lake migration or a Hive estate hands the engine ORC
files; every operator should run on them unchanged. Reads go through
``spark.read.orc`` so Catalyst keeps the same scan optimizations the
Parquet path gets — predicate pushdown into the ORC reader (visible as
``PushedFilters`` in the formatted plan), column pruning
(``ReadSchema``), and Hive-style partition pruning when the table was
written with ``partitionBy`` (``PartitionFilters``). The unit tests
assert all three ON THE PLAN, not just on results, because a scan that
silently reads every column/partition is wrong at 100 TB even when the
answer is right.

Writer notes: ``write_columnar`` mirrors the engine's Parquet sink
discipline — explicit ``mode``, optional Hive ``partitionBy`` layout
(so dynamic-partition-overwrite maintenance keeps working), and zstd
compression (both formats support it natively; zstd is the current
lake default over snappy for its strictly better ratio at similar
speed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

FORMATS = ("parquet", "orc")


def write_columnar(df: DataFrame, path: str, fmt: str = "parquet",
                   mode: str = "overwrite",
                   partition_by: tuple[str, ...] = ()) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported columnar format: {fmt!r}")
    w = (df.write.mode(mode)
         .option("compression", "zstd"))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.format(fmt).save(path)


def read_columnar(spark: SparkSession, path: str,
                  fmt: str = "parquet") -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported columnar format: {fmt!r}")
    return spark.read.format(fmt).load(path)
