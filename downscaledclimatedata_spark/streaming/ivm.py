"""Streaming incremental rollup: the maintenance IVM algebra
(operators/maintenance.py ``agg_state`` / ``merge_agg_state``) kept
current by a stream — a 100 TB materialized aggregate updated by each
micro-batch without re-reading history.

Exactly-once by IDEMPOTENT LAYOUT (the sketch index's pattern, not
read-modify-write): every micro-batch writes ITS OWN delta partition
``state_dir/batch=N/`` holding the batch's mergeable per-key state
(n, sum_cents, min_v, max_v). A replayed batch overwrites the same
partition with identical bytes — no applied-marker bookkeeping, no
crash window between "state merged" and "batch recorded". Reads merge
across partitions with ONE groupBy (count/sum add, min/max combine —
the state is mergeable by construction), and ``compact`` folds old
partitions into a base to bound file counts.

Per-batch delta size is |keys in batch| rows — bounded by the key
domain, never by history — so a year of stream at 100 TB/day reads its
rollup from |keys| x |uncompacted batches| summary rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from downscaledclimatedata_spark.operators.maintenance import (
    AGG_STATE_COLS, agg_state)

_STATE_SCHEMA = ("key string, n bigint, sum_cents bigint, "
                 "min_v double, max_v double")


def start_rollup_stream(stream: DataFrame, state_dir: str,
                        checkpoint_dir: str,
                        key_col: str = "event_type",
                        value_col: str = "value"):
    """Attach the incremental rollup to a stream; returns the query.
    Uses availableNow so tests and backfills drain the source and
    stop; a production run would use a processing-time trigger."""

    _check_no_aside(state_dir)

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        delta = agg_state(batch_df, key_col, value_col) \
            .withColumnRenamed(key_col, "key")
        (delta.coalesce(1).write.mode("overwrite")
         .parquet(f"{state_dir}/batch={int(batch_id)}"))

    return (stream.writeStream.foreachBatch(_fold)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())


def _check_no_aside(state_dir: str) -> None:
    """Refuse to operate next to a leftover ``._old`` aside tree: it
    means a compaction crashed between its two renames and the live
    tree may be missing history stranded in the aside. Silent reads
    here under-report; the loud failure names the recovery."""
    import os
    aside = state_dir.rstrip("/") + "._old"
    if os.path.exists(aside):
        raise RuntimeError(
            f"rollup state has a leftover aside tree {aside!r} from a "
            "crashed compaction; restore it (rename it back over "
            f"{state_dir!r} if the live tree is absent or incomplete) "
            "before reading or appending")


def read_rollup(spark: SparkSession, state_dir: str,
                key_col: str = "event_type") -> DataFrame:
    """Merged rollup across all delta partitions: one groupBy over the
    bounded summary rows (count/sum add, min/max combine) — identical
    algebra to ``merge_agg_state``, realized as a single aggregate so N
    partitions merge in one pass instead of N-1 pairwise joins.

    Fails loudly if a crashed compaction left an aside tree — reading
    past it would silently drop the history stranded there."""
    _check_no_aside(state_dir)
    df = (spark.read.schema(_STATE_SCHEMA)
          .option("basePath", state_dir)
          .parquet(f"{state_dir}/batch=*"))
    return (df.groupBy("key")
            .agg(F.sum("n").alias("n"),
                 F.sum("sum_cents").alias("sum_cents"),
                 F.min("min_v").alias("min_v"),
                 F.max("max_v").alias("max_v"))
            .withColumnRenamed("key", key_col))


def compact_rollup(spark: SparkSession, state_dir: str) -> int:
    """Fold every delta partition into the ``batch=-1`` base (bounds
    file count like the sketch/near-dup compactions). Returns the
    number of partitions folded.

    Unlike the sketch compaction, a superset tree is NOT safe here —
    summed state read alongside its own inputs double-counts — so the
    swap is all-or-nothing: the merged base stages in a sibling
    directory and two renames publish it (live -> aside, staging ->
    live) before the aside tree is deleted. If the second rename fails
    the aside tree is renamed back, so every exit leaves a complete
    live tree; the one uncoverable case — a hard crash BETWEEN the two
    renames — strands the aside, and the loud ``_check_no_aside`` gate
    on every subsequent read/append turns that silent-under-count into
    an explicit recovery step (same discipline as
    ``maintenance.publish_audited``)."""
    import glob
    import os
    import shutil

    parts = sorted(glob.glob(f"{state_dir}/batch=*"))
    if len(parts) <= 1:
        return 0
    merged = read_rollup(spark, state_dir, key_col="key") \
        .toPandas()  # bounded: one row per key
    staging = state_dir + "._compacting"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    os.makedirs(staging)
    spark.createDataFrame(merged[["key", *AGG_STATE_COLS]],
                          _STATE_SCHEMA) \
        .coalesce(1).write.mode("overwrite") \
        .parquet(f"{staging}/batch=-1")
    old = state_dir.rstrip("/") + "._old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(state_dir, old)
    try:
        os.rename(staging, state_dir)
    except OSError:
        os.rename(old, state_dir)  # restore the complete old tree
        raise
    shutil.rmtree(old)
    return len(parts)
