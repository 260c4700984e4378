"""Approximate-sketch accuracy gates: sketches are rows-only in the
oracle compare (engine-specific internals), so their VALUES are bounded
here against exact computation within published error envelopes."""

from __future__ import annotations

from pyspark.sql import functions as F

from downscaledclimatedata_spark.sources.tables import load_table
from tests.conftest import SF_CORRECTNESS


def test_hll_within_relative_error(spark):
    li = load_table(spark, SF_CORRECTNESS, "lineitem")
    for col, rsd in [("l_orderkey", 0.05), ("l_partkey", 0.05)]:
        row = li.agg(
            F.approx_count_distinct(col, rsd).alias("approx"),
            F.countDistinct(col).alias("exact")).collect()[0]
        rel = abs(row.approx - row.exact) / row.exact
        # rsd is a standard deviation; 4 sigma is a safe deterministic gate
        assert rel < 4 * rsd, f"{col}: approx={row.approx} exact={row.exact}"


def test_percentile_approx_brackets_exact(spark):
    ev = load_table(spark, SF_CORRECTNESS, "events")
    row = ev.agg(
        F.percentile_approx("value", 0.5, 10_000).alias("approx"),
        F.expr("percentile(value, 0.5)").alias("exact")).collect()[0]
    # with accuracy >> n the KLL-style sketch must land on a near-median
    # sample; bound by 1% of the exact median's magnitude
    assert abs(row.approx - row.exact) <= 0.01 * abs(row.exact) + 1e-9


def test_kmeans_refinement_reduces_distortion(spark):
    """Lloyd invariant: total within-cluster squared distance is
    non-increasing across iterations (each assign and each update step
    can only lower it)."""
    from pyspark.sql import functions as F
    from downscaledclimatedata_spark.operators.similarity import (
        kmeans_refine, quantize)
    from downscaledclimatedata_spark.sources.tables import load_table_parallel

    emb = load_table_parallel(spark, "/root/testdata/sf0.01", "embeddings",
                              key="vec_id")
    base = emb.select("vec_id", quantize(F.col("embedding")).alias("qv")) \
        .withColumn("dv", F.transform("qv", lambda x: x.cast("double")))

    def distortion(cents):
        c = cents.select("cid", F.col("centroid").alias("cv"))
        dist = F.aggregate(
            F.zip_with(F.col("dv"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda a, x: a + x)
        per_vec = (base.crossJoin(F.broadcast(c))
                   .select("vec_id", dist.alias("d"))
                   .groupBy("vec_id").agg(F.min("d").alias("dmin")))
        return per_vec.agg(F.sum("dmin")).collect()[0][0]

    d1 = distortion(kmeans_refine(emb, n_iter=1))
    d3 = distortion(kmeans_refine(emb, n_iter=3))
    assert d3 <= d1 + 1e-6, f"distortion increased: {d1} -> {d3}"
