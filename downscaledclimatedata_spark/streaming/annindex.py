"""Incremental semantic near-dup detection over an embedding stream.

The batch semantic operators (operators/similarity.py: ``semantic_dedup``,
``embedding_neardup_pairs``) answer "which existing vectors are semantic
near-dups"; a growing corpus needs the streaming twin: as new embeddings
arrive, flag which ones are cosine-near SOMETHING ALREADY INGESTED,
without rescanning the corpus — the streaming SemDeDup admission gate.

Design mirrors streaming/neardup.py exactly (same foreachBatch pattern,
same append-only index discipline; the stream driver IS
``start_neardup_stream`` with this module's candidate builder plugged
in). The state is an append-only Parquet relation
(bucket, vec_id, qv, n2): random-hyperplane LSH bucket + the quantized
vector, so cross-batch candidates are cosine-VERIFIED exactly against
the stored components (not just bucket-matched). Each micro-batch:

1. quantizes the batch's vectors and computes their LSH bucket with the
   SAME deterministic hyperplanes as the batch operators (one code path);
2. equi-joins the batch's buckets against the stored index;
3. keeps pairs with exact quantized cosine >= tau -> candidate
   (new_id, match_id, cosine) rows (shuffle ∝ batch + matched buckets,
   never the corpus);
4. reports the candidates, then appends the batch's entries.

Like the batch LSH restriction, recall is bounded by bucket collision
probability (near-but-not-identical vectors can land in sibling
buckets); the bucket count (2^N_PLANES) is the scale/recall knob. At
100 TB the index is bucketed by ``bucket`` so step 2 co-locates, and
compaction (``compact_index(sort_cols=["bucket"])``) keeps its file
count bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from downscaledclimatedata_spark.operators.similarity import (
    SEM_TAU,
    _hyperplanes,
    int_dot,
    lsh_bucket_id,
    quantize,
    sq_norm,
)

EMB_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
    T.StructField("label", T.LongType()),
])


def emb_stream(spark: SparkSession, emb_dir: str,
               max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over a directory of embedding parquet files."""
    return (spark.readStream.schema(EMB_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(emb_dir))


def batch_semantic_entries(batch: DataFrame, vec_col: str = "embedding",
                           id_col: str = "vec_id") -> DataFrame:
    """(bucket, vec_id, qv, n2) index entries for one batch — the same
    quantizer and deterministic hyperplanes as the batch ANN operators.
    Zero-norm vectors are dropped (cosine undefined), as in batch."""
    qv = quantize(F.col(vec_col))
    return (batch.select(
        F.col(id_col).alias("vec_id"),
        qv.alias("qv"),
        sq_norm(qv).alias("n2"),
        lsh_bucket_id(qv, _hyperplanes()).alias("bucket"))
        .filter(F.col("n2") > 0)
        .select("bucket", "vec_id", "qv", "n2"))


def batch_semantic_candidates(batch: DataFrame, index: DataFrame | None,
                              vec_col: str = "embedding",
                              id_col: str = "vec_id",
                              tau: float = SEM_TAU
                              ) -> tuple[DataFrame, DataFrame]:
    """(candidates, new_entries) for one batch against the stored index.

    Candidates are (new_id, match_id, cosine) with exact quantized
    cosine >= tau — verified from the stored components, so a bucket
    collision alone never reports a match. Signature-compatible with
    ``start_neardup_stream(candidate_builder=...)`` (the vec/id columns
    ride the text_col/id_col parameters).
    """
    entries = batch_semantic_entries(batch, vec_col, id_col)
    if index is None:
        spark = batch.sparkSession
        candidates = spark.createDataFrame(
            [], "new_id long, match_id long, cosine double")
    else:
        cos = (int_dot(F.col("n.qv"), F.col("e.qv")).cast("double")
               / (F.sqrt(F.col("n.n2").cast("double"))
                  * F.sqrt(F.col("e.n2").cast("double"))))
        candidates = (entries.alias("n")
                      .join(index.alias("e"), "bucket")
                      .filter(F.col("n.vec_id") != F.col("e.vec_id"))
                      .withColumn("cosine", cos)
                      .filter(F.col("cosine") >= tau)
                      .select(F.col("n.vec_id").alias("new_id"),
                              F.col("e.vec_id").alias("match_id"),
                              "cosine")
                      .distinct())
    return candidates, entries
