"""Table-maintenance operators: small-file compaction and skew diagnostics.

A 100 TB pipeline's steady-state enemies are (a) small files — every
incremental write (streaming micro-batch, per-model ingest like the
reference's one-run-per-NetCDF-file flow,
/root/reference/downscaled_climate_data/assets/loca2.py:18-50) fragments
the table until scans are dominated by open/seek overhead — and (b) key
skew, which turns one reducer into the job's critical path. Both fixes are
expressed here as plain DataFrame jobs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from downscaledclimatedata_spark.plans import QuerySpec, register
from downscaledclimatedata_spark.sources.tables import load_table_parallel

DEFAULT_TARGET_BYTES = 128 << 20


def table_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` via the Hadoop FileSystem API (works for
    file://, hdfs://, s3a:// alike — no driver-side directory walking)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(hpath).getLength()


def compact_parquet(spark: SparkSession, in_dir: str, out_dir: str,
                    target_bytes: int = DEFAULT_TARGET_BYTES,
                    sort_cols: list[str] | None = None) -> int:
    """Rewrite a fragmented parquet directory into ~target-sized files.

    Partition count = ceil(input_bytes / target_bytes) — sized from actual
    data, not the incoming split count. With ``sort_cols`` the rewrite
    uses repartitionByRange + sortWithinPartitions, so parquet min/max
    row-group stats become selective for those columns (data-skipping on
    later scans). Returns the partition count used.

    Compaction is idempotent (overwrite mode): re-running after a partial
    failure converges, matching the reference's re-materialization
    semantics (T4).
    """
    df = spark.read.parquet(in_dir)
    n = max(1, math.ceil(table_bytes(spark, in_dir) / target_bytes))
    if sort_cols:
        out = (df.repartitionByRange(n, *[F.col(c) for c in sort_cols])
               .sortWithinPartitions(*sort_cols))
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(out_dir)
    return n


def overwrite_partitions(df: DataFrame, out_dir: str,
                         partition_cols: list[str]) -> None:
    """Overwrite ONLY the hive partitions present in ``df``; untouched
    partitions survive.

    This is the per-partition idempotent re-materialization an incremental
    pipeline needs (reference T4 overwrites a whole Zarr store per asset,
    /root/reference/downscaled_climate_data/assets/loca2.py:98 — here one
    model/scenario partition re-runs without clobbering its siblings).
    Writer-level option, so no session-wide config mutation.
    """
    (df.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy(*partition_cols)
     .parquet(out_dir))


def key_skew_stats(df: DataFrame, key: str) -> DataFrame:
    """Distribution stats of per-key cardinalities: the pre-flight check
    before choosing a shuffle key (skew_factor = max/avg; ~1 is uniform,
    >> 1 means salt the key or enable AQE skew handling)."""
    counts = df.groupBy(key).agg(F.count("*").alias("cnt"))
    n_keys = F.count("*").cast("double")
    total = F.sum("cnt").cast("double")
    return counts.agg(
        F.count("*").alias("n_keys"),
        F.min("cnt").alias("min_cnt"),
        F.max("cnt").alias("max_cnt"),
        F.sum("cnt").alias("total_rows"),
        (F.max("cnt").cast("double") / (total / n_keys)).alias("skew_factor"))


def maintenance_skew_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table_parallel(spark, sf_dir, "events", key="user_id")
    return key_skew_stats(ev, "user_id")


_SKEW_SQL = """
WITH c AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id)
SELECT COUNT(*) AS n_keys, MIN(cnt) AS min_cnt, MAX(cnt) AS max_cnt,
  CAST(SUM(cnt) AS BIGINT) AS total_rows,
  CAST(MAX(cnt) AS DOUBLE)
    / (CAST(SUM(cnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS skew_factor
FROM c
"""


register(QuerySpec("maintenance_key_skew", maintenance_skew_query, _SKEW_SQL,
                   description="per-key cardinality skew diagnostics (max/avg factor)"))
