"""Incremental near-duplicate detection over a document stream.

The batch dedup pipeline (operators/dedup.py) answers "which existing
docs are near-dups of each other"; a growing corpus needs the streaming
twin: as new documents arrive, flag which ones near-duplicate SOMETHING
ALREADY INGESTED, without rescanning the corpus.

Design: the LSH band index is the state, persisted as an append-only
partitioned Parquet relation (band_id, band_hash, doc id) — restart-safe
and shared with batch jobs, unlike operator-local streaming state. Each
micro-batch:

1. computes minhash signatures for the batch's docs (the SAME batch
   operator — one code path);
2. explodes them to band hashes;
3. equi-joins the batch's bands against the stored index -> candidate
   (new_doc, existing_doc) pairs (shuffle ∝ batch + matched buckets,
   never the corpus);
4. reports the candidates, then appends the batch's bands to the index.

At 100 TB the index is bucketed by band_hash so step 3 is a co-located
join; exactly-once comes from the stream checkpoint (a replayed batch
re-appends the same band rows, which the distinct() in step 3 and
min-id representative downstream make harmless).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from downscaledclimatedata_spark.operators.dedup import (
    LSH_BAND_SIZE,
    MINHASH_PERMS,
    _banded,
    minhash_signatures,
)

DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])


def docs_stream(spark: SparkSession, docs_dir: str,
                max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over a directory of document parquet files."""
    return (spark.readStream.schema(DOCS_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(docs_dir))


def batch_neardup_candidates(batch: DataFrame, index: DataFrame | None,
                             text_col: str = "text",
                             id_col: str = "doc_id") -> tuple[DataFrame, DataFrame]:
    """(candidates, new_bands) for one batch against the stored index.

    Pure DataFrame logic shared by the streaming sink and any batch
    backfill: candidates are (new_id, match_id) pairs whose docs share at
    least one LSH band bucket with an already-indexed doc.
    """
    sigs = minhash_signatures(batch, text_col, id_col)
    bands = _banded(sigs, id_col, MINHASH_PERMS, LSH_BAND_SIZE)
    if index is None:
        spark = batch.sparkSession
        candidates = spark.createDataFrame(
            [], f"new_id long, match_id long")
    else:
        candidates = (bands.alias("n")
                      .join(index.alias("e"), ["band_id", "band_hash"])
                      .select(F.col(f"n.{id_col}").alias("new_id"),
                              F.col(f"e.{id_col}").alias("match_id"))
                      .filter(F.col("new_id") != F.col("match_id"))
                      .distinct())
    return candidates, bands


def start_neardup_stream(stream: DataFrame, index_dir: str,
                         report, checkpoint_dir: str,
                         text_col: str = "text", id_col: str = "doc_id",
                         available_now: bool = True):
    """foreachBatch sink maintaining the band index and reporting
    candidates per micro-batch via ``report(candidates_df, epoch_id)``.

    ``available_now=True`` drains the backlog then stops (catch-up mode);
    pass False for a continuous trigger.
    """
    def process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            index = spark.read.parquet(index_dir)
        except Exception:  # first batch: no index yet
            index = None
        candidates, bands = batch_neardup_candidates(
            batch_df, index, text_col, id_col)
        # report BEFORE appending so a doc never matches itself via its
        # own just-written bands
        report(candidates, epoch_id)
        bands.write.mode("append").parquet(index_dir)

    writer = (stream.writeStream.foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
