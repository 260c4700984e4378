"""JSON-lines corpus interchange.

JSONL is the lingua franca of LLM data pipelines (one document object per
line); this is the import/export edge between this engine and external
tooling. Spark's json source is splittable line-by-line, so a 100 TB JSONL
corpus parallelizes like any text source; compressed variants (gzip) are
NOT splittable per file — export shards into many files (one per task) so
downstream reads stay parallel, and prefer zstd where the cluster codec
supports it.

Always pass an explicit schema on import: schema inference is a full
extra pass over the data and silently widens types (int -> bigint,
missing keys -> null columns) — at scale both are bugs, not conveniences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def export_jsonl(df: DataFrame, out_dir: str,
                 compression: str = "gzip") -> None:
    """Shard-parallel JSONL export; idempotent (overwrite mode)."""
    (df.write.mode("overwrite")
     .option("compression", compression)
     .json(out_dir))


def import_jsonl(spark: SparkSession, in_dir: str,
                 schema: StructType | str) -> DataFrame:
    """Schema-first JSONL import. Corrupt lines land in a quarantine
    column instead of failing the job (PERMISSIVE + columnNameOfCorruptRecord),
    mirroring the engine's row-level-tolerance policy (reference T7)."""
    return (spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
            .json(in_dir))
