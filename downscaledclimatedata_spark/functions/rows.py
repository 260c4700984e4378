"""JVM-native tiny literal relations.

``spark.createDataFrame(rows, ...)`` builds a Python-backed local
relation: every JVM task that later touches it (a union inside a
parquet staging write, a join against a corpus relation) pays a
Python-worker round trip — measured at ~4.5 s per single-task write on
this box, vs 0.2 s for the identical rows built from JVM literals
(guide §4: the boundary, not the bytes, is the cost). For the handful
of fixed rows a spec needs (heartbeats, probe lists, signal names),
build them as an exploded array of literal structs on ``spark.range(1)``
— the whole relation lives in the JVM and folds into codegen.

Only for SMALL fixed row sets (heartbeats, probes — O(10) rows): the
literal array is embedded in the plan, so thousands of rows would bloat
it. ``spark.createDataFrame`` remains right for driver-computed results
that are returned directly (sketch summaries, bounded reports).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def literal_rows(spark: SparkSession, rows: list[tuple],
                 schema: str) -> DataFrame:
    """Tiny literal relation with DDL ``schema`` (flat types only).

    ``rows`` are tuples of plain literals (int/float/str/bool/None);
    each value is cast to the declared column type, so e.g. ints
    declared ``long`` and None declared anything produce the same
    typed rows as ``spark.createDataFrame`` would.
    """
    fields = [f.strip() for f in schema.split(",")]
    names = [f.split(None, 1)[0] for f in fields]
    types = [f.split(None, 1)[1] for f in fields]
    if not rows:
        return spark.range(0).select(
            *[F.lit(None).cast(t).alias(n) for n, t in zip(names, types)])
    structs = [
        F.struct(*[F.lit(v).cast(t).alias(n)
                   for v, n, t in zip(r, names, types)])
        for r in rows
    ]
    return (spark.range(1)
            .select(F.explode(F.array(*structs)).alias("_r"))
            .select(*[F.col(f"_r.{n}").alias(n) for n in names]))
