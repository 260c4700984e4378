#!/usr/bin/env python
"""Scale-ladder harness: empirical evidence the headline plans survive a
10x scale-up.

Builds an sf1-equivalent dataset by unioning K=10 id-shifted copies of
the driver's sf0.1 parquet (every id column shifts by copy * 10^9, so
foreign-key relationships stay intact and the fixed-size query/centroid
samples — `id % spacing = 0 AND id < bound` — stay bounded by
construction), then times the headline query set at both scales and
prints ONE JSON line with per-query wall-clock ratios.

A ~linear ratio (≈10x work -> ≈10x-or-less time on fixed cores) is the
cheapest empirical check that no plan degrades super-linearly; a
query whose ratio far exceeds the data ratio pinpoints the next weak
operator. Results are recorded in BENCH_SCALE.md.

Usage: python scale_ladder.py [--copies 10]
The scaled data lands in .scale/sf1/ (gitignored, rebuilt if missing).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

BASE_SF = "/root/testdata/sf0.1"
SCALE_DIR = str(Path(__file__).resolve().parent / ".scale" / "sf1")
COPIES = 10
ID_STRIDE = 1_000_000_000  # > any base id; multiples preserve id % spacing == 0 only for copy 0

# id columns to shift per table; one shared stride keeps FKs consistent
SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIM_TABLES = ("region", "nation")  # fixed-size dims: copied once, unscaled


def build_scaled(spark, src: str, dst: str, copies: int) -> None:
    from pyspark.sql import functions as F
    os.makedirs(dst, exist_ok=True)
    # events: copy ts in whatever physical shape the driver file uses
    # (long nanos under nanosAsLong, or native micros) — the engine's
    # loader normalizes either (sources/tables.py normalize_events_ts)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for name in DIM_TABLES:
        df = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
        df.write.mode("overwrite").parquet(os.path.join(dst, f"{name}.parquet"))
    # copy-specific vowel rotations: cheap full-width text perturbation so
    # replicated docs are NOT cross-copy near-duplicates (verbatim copies
    # would plant 10-deep duplicate groups and quadratically inflate the
    # dedup queries — a data-character change, not a scale measurement)
    vowel_rot = ["aeiou", "eioua", "iouae", "ouaei", "uaeio",
                 "aeiuo", "eioau", "iouea", "ouaie", "uaeoi"]
    for name, cols in SHIFT_COLS.items():
        df = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
        out = None
        for i in range(copies):
            copy = df
            for c in cols:
                copy = copy.withColumn(c, F.col(c) + F.lit(i * ID_STRIDE))
            if name == "documents" and i > 0:
                copy = copy.withColumn(
                    "text", F.translate("text", "aeiou",
                                        vowel_rot[i % len(vowel_rot)]))
            if name == "embeddings" and i > 0:
                # small copy-dependent shift keeps vectors distinct without
                # changing magnitudes much (no cross-copy exact dups)
                copy = copy.withColumn(
                    "embedding",
                    F.transform("embedding",
                                lambda x: (x + F.lit(i * 0.0017)).cast("float")))
            out = copy if out is None else out.unionAll(copy)
        (out.repartition(32)
         .write.mode("overwrite").parquet(os.path.join(dst, f"{name}.parquet")))


def time_headlines(spark, sf_dir: str) -> dict[str, float]:
    from downscaledclimatedata_spark.plans import all_specs
    specs = {n: s for n, s in all_specs().items() if s.headline}
    warm = specs.get("q02_revenue_forecast") or next(iter(specs.values()))
    warm.spark(spark, sf_dir).collect()
    timings: dict[str, float] = {}
    for name in sorted(specs):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            specs[name].spark(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    return timings


def main() -> None:
    copies = COPIES
    if "--copies" in sys.argv:
        copies = int(sys.argv[sys.argv.index("--copies") + 1])
    if "--rebuild" in sys.argv and os.path.exists(SCALE_DIR):
        shutil.rmtree(SCALE_DIR)
    from downscaledclimatedata_spark.session import get_spark
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("dcd-spark-scale-ladder", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(SCALE_DIR, "lineitem.parquet")):
        build_scaled(spark, BASE_SF, SCALE_DIR, copies)
    base = time_headlines(spark, BASE_SF)
    scaled = time_headlines(spark, SCALE_DIR)
    ratios = {n: (round(scaled[n] / base[n], 2) if base[n] > 0 else None)
              for n in base}
    print(json.dumps({
        "metric": "scale_ladder",
        "data_ratio": copies,
        "sf_base": 0.1,
        "sf_scaled": 0.1 * copies,
        "base_sec": base,
        "scaled_sec": scaled,
        "time_ratio": ratios,
        "base_total_sec": round(sum(base.values()), 3),
        "scaled_total_sec": round(sum(scaled.values()), 3),
    }))


if __name__ == "__main__":
    main()
