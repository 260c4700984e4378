"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata columns beside them (the Spark-idiomatic equivalent of the
reference treating NetCDF blobs as opaque during conversion,
loca2.py:84-100). Real decode libraries are not in this container, so the
decode step is a clearly-marked deterministic fake behind the REAL
plumbing: Arrow-batched ``mapInPandas`` with an explicit output schema,
partition-preserving, no driver collect.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from downscaledclimatedata_spark.plans import QuerySpec, register
from downscaledclimatedata_spark.sources.tables import load_table, load_table_parallel

DECODED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("format", T.StringType()),
])


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize an opaque binary column (stand-in for image/audio bytes)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def decode_payloads(df: DataFrame) -> DataFrame:
    """Arrow-batched fake decode: binary -> (dims, format) metadata rows.

    STUB: a real deployment replaces ``_fake_decode_batch``'s body with
    PIL/libav calls; the Spark-side contract (schema, batching,
    partitioning) is exactly what production needs.
    """
    # self-contained closure: executors need nothing from this package
    def _fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            # deterministic fake dims derived from payload size
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes.astype("int32"),
                "width": (64 + (n_bytes % 193)).astype("int32"),
                "height": (64 + (n_bytes % 97)).astype("int32"),
                "format": (n_bytes % 3).map({0: "jpeg", 1: "png", 2: "webp"}),
            })

    return df.select("doc_id", "payload").mapInPandas(_fake_decode_batch, DECODED_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
    T.StructField("byte_offset", T.IntegerType()),
])

FRAME_SIZE = 16
FRAME_STRIDE = 64
MAX_FRAMES = 4

FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def sample_frames(df: DataFrame, frame_size: int = FRAME_SIZE,
                  stride: int = FRAME_STRIDE,
                  max_frames: int = MAX_FRAMES) -> DataFrame:
    """Video-style frame sampling: one binary payload -> N frame rows.

    The explode-shaped ``mapInPandas`` contract (output rows != input
    rows) a real video pipeline needs. STUB: a real deployment seeks
    keyframes with libav; here frames are fixed-stride byte windows, so
    the row fan-out, offsets, and binary slicing are real and
    deterministic.
    """
    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame": [], "byte_offset": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                blob = bytes(payload)
                n = min(max_frames, max(len(blob) - frame_size, 0) // stride + 1)
                for i in range(n):
                    off = i * stride
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame"].append(blob[off:off + frame_size])
                    out["byte_offset"].append(off)
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(_sample, FRAME_SCHEMA)


def extract_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Binary payload -> dense float feature vector (array<float>).

    The embedding-extraction contract for image/audio models. STUB: a
    real deployment runs an ONNX/torch encoder per Arrow batch; here the
    vector is a deterministic byte-histogram projection, so the schema
    (array<float> of fixed dim), batching, and downstream joinability
    with the similarity operators are real.
    """
    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float32")
                norm = float(np.sqrt((hist * hist).sum())) or 1.0
                feats.append((hist / norm).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return df.select("doc_id", "payload").mapInPandas(_extract, FEATURE_SCHEMA)


# --- oracle-checked query entries -------------------------------------------

def multimodal_meta_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-expression metadata over binary payloads (oracle-checkable)."""
    docs = with_binary_payload(load_table_parallel(spark, sf_dir, "documents", key="doc_id"))
    fmt = F.when(F.length("payload") % 3 == 0, "jpeg") \
        .when(F.length("payload") % 3 == 1, "png").otherwise("webp")
    return (docs.select(fmt.alias("format"), F.length("payload").alias("n_bytes"))
            .groupBy("format")
            .agg(F.count("*").alias("n_docs"), F.sum("n_bytes").alias("total_bytes")))


_MULTIMODAL_META_SQL = """
WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents)
SELECT CASE WHEN n_bytes % 3 = 0 THEN 'jpeg' WHEN n_bytes % 3 = 1 THEN 'png'
       ELSE 'webp' END AS format,
  COUNT(*) AS n_docs, CAST(SUM(n_bytes) AS BIGINT) AS total_bytes
FROM p GROUP BY 1
"""


def multimodal_decode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode path. Oracle-checkable because the stub
    decoder is a pure function of payload length — the SQL mirror computes
    the same dims from octet_length, so the check verifies the whole
    Arrow round-trip (schema, batching, values), not just row counts."""
    docs = with_binary_payload(load_table_parallel(spark, sf_dir, "documents", key="doc_id"))
    return (decode_payloads(docs)
            .groupBy("format")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("width").alias("sum_width"),
                 F.sum("height").alias("sum_height")))


_MULTIMODAL_DECODE_SQL = """
WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents)
SELECT CASE WHEN n_bytes % 3 = 0 THEN 'jpeg' WHEN n_bytes % 3 = 1 THEN 'png'
       ELSE 'webp' END AS format,
  COUNT(*) AS n_docs,
  CAST(SUM(64 + n_bytes % 193) AS BIGINT) AS sum_width,
  CAST(SUM(64 + n_bytes % 97) AS BIGINT) AS sum_height
FROM p GROUP BY 1
"""


def multimodal_frames_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out histogram. The per-doc frame count is
    min(MAX_FRAMES, max(n_bytes-FRAME_SIZE,0) div FRAME_STRIDE + 1) — a
    pure function of payload length, so the oracle recomputes it and the
    check verifies the explode-shaped mapInPandas fan-out exactly."""
    docs = with_binary_payload(load_table_parallel(spark, sf_dir, "documents", key="doc_id"))
    frames = sample_frames(docs)
    return (frames.groupBy("doc_id").agg(F.count("*").alias("n_frames"))
            .groupBy("n_frames").agg(F.count("*").alias("n_docs")))


_MULTIMODAL_FRAMES_SQL = f"""
WITH p AS (SELECT octet_length(encode(text)) AS n_bytes FROM documents),
f AS (SELECT CAST(LEAST({MAX_FRAMES},
        GREATEST(n_bytes - {FRAME_SIZE}, 0) // {FRAME_STRIDE} + 1) AS BIGINT)
        AS n_frames FROM p)
SELECT n_frames, COUNT(*) AS n_docs FROM f GROUP BY n_frames
"""


def multimodal_features_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction pipeline feeding the similarity operators.

    Oracle-checkable via derived invariants: the extractor L2-normalizes,
    so every non-empty payload's squared norm is 1 (within float32
    tolerance) and the dim is fixed. The oracle asserts exactly those
    facts per doc — the byte-histogram values themselves are covered by
    unit tests (tests/test_multimodal.py)."""
    docs = with_binary_payload(load_table_parallel(spark, sf_dir, "documents", key="doc_id"))
    feats = extract_features(docs)
    sq_norm = F.aggregate("feature", F.lit(0.0), lambda a, x: a + x * x)
    return feats.select(
        "doc_id", F.size("feature").alias("dim"),
        (F.abs(sq_norm - F.lit(1.0)) <= F.lit(1e-3)).alias("unit_norm"))


_MULTIMODAL_FEATURES_SQL = f"""
SELECT doc_id, {FEATURE_DIM} AS dim,
       octet_length(encode(text)) > 0 AS unit_norm
FROM documents
"""


register(QuerySpec("multimodal_frame_sample", multimodal_frames_query, _MULTIMODAL_FRAMES_SQL,
                   description="video-style frame sampling: 1 payload -> N frame rows via mapInPandas"))
register(QuerySpec("multimodal_feature_extract", multimodal_features_query, _MULTIMODAL_FEATURES_SQL,
                   description="binary -> array<float> feature extraction (deterministic stub encoder)"))
register(QuerySpec("multimodal_meta", multimodal_meta_query, _MULTIMODAL_META_SQL,
                   description="binary payload metadata via pure expressions"))
register(QuerySpec("multimodal_decode_stub", multimodal_decode_query, _MULTIMODAL_DECODE_SQL,
                   description="Arrow-batched mapInPandas decode plumbing (fake decode; real schema/batching)"))
