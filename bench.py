#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is materialized via a count-style action (collect on already-
aggregated results) so the full plan executes; timings exclude session
startup and include one warm-up of the IO path.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from downscaledclimatedata_spark.plans import all_specs
from downscaledclimatedata_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("dcd-spark-bench", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    specs = {n: s for n, s in all_specs().items() if s.headline}

    # warm the file-scan + JVM path once with the cheapest query
    warm = specs.get("q02_revenue_forecast") or next(iter(specs.values()))
    warm.spark(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in sorted(specs):
        best = float("inf")
        for _ in range(2):  # min-of-2: damp scheduler/GC jitter
            t0 = time.perf_counter()
            specs[name].spark(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
