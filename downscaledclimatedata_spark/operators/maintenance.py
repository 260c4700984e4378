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


# --- incremental aggregate maintenance (materialized-view delta merge) ---------

AGG_STATE_COLS = ("n", "sum_cents", "min_v", "max_v")


def agg_state(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Mergeable per-key aggregate state: (key, n, sum_cents, min_v,
    max_v). Sums are ROUND(value*100) BIGINT cents so merged state is
    exact in any order; avg is derived at read time, never stored."""
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    return df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("sum_cents"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"))


def merge_agg_state(state: DataFrame, delta: DataFrame,
                    key_col: str) -> DataFrame:
    """Fold a delta batch's aggregate state into an existing state —
    the incremental-view-maintenance step that updates a 100 TB
    rollup from a 1 GB day of new data without touching history.

    Count/sum add, min/max combine; keys on either side only pass
    through. One outer join keyed on the (uniform) group key; the
    state relation is |keys|-bounded, not fact-bounded.
    """
    s = state.select(key_col, *[F.col(c).alias(f"s_{c}")
                                for c in AGG_STATE_COLS])
    d = delta.select(key_col, *[F.col(c).alias(f"d_{c}")
                                for c in AGG_STATE_COLS])
    j = s.join(d, key_col, "full_outer")
    z = F.lit(0).cast("bigint")
    return j.select(
        key_col,
        (F.coalesce(F.col("s_n"), z) + F.coalesce(F.col("d_n"), z))
        .alias("n"),
        (F.coalesce(F.col("s_sum_cents"), z)
         + F.coalesce(F.col("d_sum_cents"), z)).alias("sum_cents"),
        F.least(F.coalesce(F.col("s_min_v"), F.col("d_min_v")),
                F.coalesce(F.col("d_min_v"), F.col("s_min_v")))
        .alias("min_v"),
        F.greatest(F.coalesce(F.col("s_max_v"), F.col("d_max_v")),
                   F.coalesce(F.col("d_max_v"), F.col("s_max_v")))
        .alias("max_v"))


def maintenance_incremental_agg_query(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """Split events into base (id % 10 != 0) and delta (id % 10 == 0),
    build state from the base, merge the delta's state in — the result
    must equal the one-shot aggregate over ALL events, which is exactly
    what the oracle computes. A green row is a machine-checked proof of
    the merge algebra, not just a unit anecdote."""
    from downscaledclimatedata_spark.sources.tables import load_table
    ev = load_table(spark, sf_dir, "events")
    base = agg_state(ev.filter(F.col("event_id") % 10 != 0),
                     "event_type", "value")
    delta = agg_state(ev.filter(F.col("event_id") % 10 == 0),
                      "event_type", "value")
    merged = merge_agg_state(base, delta, "event_type")
    return (merged.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("sum_cents").cast("bigint").alias("sum_cents"),
        "min_v", "max_v",
        (F.col("sum_cents").cast("double") / 100.0
         / F.col("n").cast("double")).alias("avg_v"))
        .orderBy("event_type"))


_INC_AGG_SQL = """
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
  MIN(value) AS min_v, MAX(value) AS max_v,
  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
    / CAST(COUNT(*) AS DOUBLE) AS avg_v
FROM events GROUP BY event_type ORDER BY event_type
"""

register(QuerySpec(
    "maintenance_incremental_agg", maintenance_incremental_agg_query,
    _INC_AGG_SQL,
    description="incremental view maintenance: base+delta mergeable agg "
                "state (count/sum-cents/min/max) must equal the one-shot "
                "aggregate — merge algebra oracle-checked"))
