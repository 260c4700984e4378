"""Grouped pandas-UDF operators: values pinned against expression-based
computation inside Spark (tolerance for numpy-vs-JVM float ordering)."""

from __future__ import annotations

from pyspark.sql import functions as F

from downscaledclimatedata_spark.operators.pandasops import (
    weighted_mean_agg, zscore_per_group,
)
from downscaledclimatedata_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_zscore_matches_expression_formulation(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    got = {r.event_id: r.zscore for r in zscore_per_group(ev).collect()}
    from pyspark.sql import Window
    w = Window.partitionBy("user_id")
    stats = ev.select(
        "event_id", "value",
        F.mean("value").over(w).alias("mu"),
        F.stddev_pop("value").over(w).alias("sd"))
    want = {r.event_id: (r.value - r.mu) / r.sd if r.sd and r.sd > 0 else 0.0
            for r in stats.collect()}
    assert set(got) == set(want)
    for eid, z in want.items():
        assert abs(got[eid] - z) < 1e-9, eid


def test_zscore_group_invariants(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    z = zscore_per_group(ev)
    per_group = (z.groupBy("user_id")
                 .agg(F.sum("zscore").alias("s"), F.count("*").alias("n"))
                 .collect())
    assert len(per_group) > 0
    for r in per_group:
        assert abs(r.s) < 1e-6, "z-scores must sum to ~0 per group"


def test_weighted_mean_matches_expression(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    got = {r.event_type: r.weighted_mean
           for r in weighted_mean_agg(ev).collect()}
    w = (F.col("event_id") % 10 + 1).cast("double")
    want = {r.event_type: r.wm for r in
            (ev.groupBy("event_type")
             .agg((F.sum(F.col("value") * w) / F.sum(w)).alias("wm"))
             .collect())}
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, k
