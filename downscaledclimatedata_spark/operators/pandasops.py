"""Grouped pandas-UDF operators: applyInPandas group transforms and
grouped-aggregate pandas UDFs.

These complete the engine's UDF surface (SURVEY §2.10): mapInPandas
(ingest/multimodal) covers stateless batch maps, applyInPandasWithState
(streaming) covers keyed state — this module covers per-group dataframe
transforms and vectorized custom aggregates, the shapes a feature-
engineering pipeline reaches for when an aggregate isn't expressible as
built-in expressions.

Scale: groupBy().applyInPandas shuffles once on the key and hands each
group to Arrow as a single pandas frame — groups must fit in executor
memory (fine for per-user/per-entity groups; NOT for global transforms).
Registered checks are rows-only (float reduction order inside numpy is
not cross-engine reproducible); unit tests pin values against
expression-based computation within Spark.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from downscaledclimatedata_spark.plans import QuerySpec, register
from downscaledclimatedata_spark.sources.tables import load_table_parallel

ZSCORE_SCHEMA = ("user_id bigint, event_id bigint, value double, "
                 "zscore double")


def zscore_per_group(df: DataFrame, key: str = "user_id",
                     col: str = "value") -> DataFrame:
    """Per-group z-score via applyInPandas (group-wise normalize — the
    canonical grouped-map example; ddof=0 so singleton groups yield 0)."""
    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[col]
        std = v.std(ddof=0)
        z = (v - v.mean()) / std if std > 0 else v * 0.0
        return pd.DataFrame({
            "user_id": pdf[key], "event_id": pdf["event_id"],
            "value": v, "zscore": z,
        })

    return (df.select(key, "event_id", col)
            .groupBy(key).applyInPandas(normalize, ZSCORE_SCHEMA))


def weighted_mean_agg(df: DataFrame, key: str = "event_type",
                      val: str = "value", weight_expr=None) -> DataFrame:
    """Custom vectorized aggregate via a GROUPED_AGG pandas_udf:
    event-id-weighted mean of value per type."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wmean(v: pd.Series, w: pd.Series) -> float:
        tw = w.sum()
        return float((v * w).sum() / tw) if tw else 0.0

    w = weight_expr if weight_expr is not None else (
        (F.col("event_id") % 10 + 1).cast("double"))
    # NB: a GROUPED_AGG pandas_udf cannot share an agg() with built-in
    # aggregate functions (INVALID_PANDAS_UDF_PLACEMENT)
    return (df.groupBy(key)
            .agg(wmean(F.col(val), w).alias("weighted_mean")))


# --- registered checks (rows-only: float path) --------------------------------

def pandas_zscore_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table_parallel(spark, sf_dir, "events", key="user_id")
    z = zscore_per_group(ev)
    return (z.groupBy("user_id")
            .agg(F.count("*").alias("n"),
                 F.round(F.max("zscore"), 6).alias("max_z")))


def pandas_weighted_mean_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table_parallel(spark, sf_dir, "events", key="event_id")
    return weighted_mean_agg(ev)


register(QuerySpec("pandas_zscore_groups", pandas_zscore_query, None,
                   description="applyInPandas per-group z-score (rows-only: numpy float reduction)"))
register(QuerySpec("pandas_weighted_mean", pandas_weighted_mean_query, None,
                   description="GROUPED_AGG pandas_udf weighted mean (rows-only: numpy float reduction)"))
