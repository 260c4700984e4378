#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is materialized via a count-style action (collect on already-
aggregated results) so the full plan executes; timings exclude session
startup and include one warm-up of the IO path.

Timings from a contended box are noise, not measurement (round 5's
recorded total was +57% purely from background load): before starting
Spark the harness waits for the box to go quiet — 1-minute loadavg
under $SPARK_GRAFT_LOAD_MAX (default 8.0) and zero foreign java/pytest
processes — retrying up to $SPARK_GRAFT_LOAD_WAITS times (default 6)
with 20 s sleeps. If the box never quiets, the run proceeds but the
emitted JSON carries ``"contaminated": true`` so a polluted number can
never be mistaken for a regression. Provenance fields ``loadavg``,
``foreign_procs``, ``wait_retries``, ``n_runs`` are always recorded.
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

N_RUNS = 2  # min-of-N: damp scheduler/GC jitter


def _foreign_procs() -> int:
    """Count java / pytest processes not belonging to this run.

    The guard runs before our own Spark JVM starts, so every live java
    process is foreign; any pytest process means a test suite is
    competing for cores. /proc is parsed directly (no psutil here).
    """
    me = os.getpid()
    n = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or int(pid) == me:
            continue
        try:
            with open(f"/proc/{pid}/comm") as f:
                comm = f.read().strip()
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                argv = [a.decode(errors="replace")
                        for a in f.read().split(b"\0") if a]
        except OSError:
            continue  # raced with process exit
        # pytest must appear as the INVOKED program (argv head or -m
        # target), not merely as a word somewhere in a long command line
        # (supervisor shells quoting task text would false-positive)
        head = argv[:4]
        is_pytest = any(a.rsplit("/", 1)[-1] == "pytest" for a in head) or (
            "-m" in head and "pytest" in head)
        if comm == "java" or is_pytest:
            n += 1
    return n


def wait_for_quiet_box() -> dict:
    """Block until the box looks idle, or give up and flag the run."""
    load_max = float(os.environ.get("SPARK_GRAFT_LOAD_MAX", "8.0"))
    max_waits = int(os.environ.get("SPARK_GRAFT_LOAD_WAITS", "6"))
    retries = 0
    while True:
        load1 = os.getloadavg()[0]
        foreign = _foreign_procs()
        if load1 <= load_max and foreign == 0:
            break
        if retries >= max_waits:
            break
        retries += 1
        print(f"bench: box busy (loadavg {load1:.1f}, {foreign} foreign "
              f"java/pytest procs), wait {retries}/{max_waits}",
              file=sys.stderr)
        time.sleep(20)
    return {
        "loadavg": round(load1, 2),
        "foreign_procs": foreign,
        "wait_retries": retries,
        "contaminated": bool(load1 > load_max or foreign > 0),
    }


def host_anchor(spark) -> float:
    """Measured host speed: median-of-3 of a PINNED pure-JVM compute
    (sum over a fixed 200M-row range — no IO, no shuffle, no Python),
    in seconds. Recorded as ``host_anchor_sec`` in every bench/ladder
    JSON so cross-round comparisons can divide by measured host speed
    instead of trusting loadavg: round 10 saw ~35-45% uniform slowdown
    on UNCHANGED code that had to be explained in prose. The workload
    is frozen — changing it breaks the normalizer's comparability."""
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr(
            "sum(id * 2 + 7) AS s").collect()
        runs.append(time.perf_counter() - t0)
    return round(sorted(runs)[1], 3)


def main() -> None:
    provenance = wait_for_quiet_box()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("dcd-spark-bench", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    specs = {n: s for n, s in all_specs().items() if s.headline}

    # warm the file-scan + JVM path once with the cheapest query
    warm = specs.get("q02_revenue_forecast") or next(iter(specs.values()))
    warm.spark(spark, sf_dir).collect()

    anchor = host_anchor(spark)

    timings: dict[str, float] = {}
    for name in sorted(specs):
        best = float("inf")
        for _ in range(N_RUNS):
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
        "n_runs": N_RUNS,
        "host_anchor_sec": anchor,
        # scaling provenance: the master string and the parallelism the
        # session actually got, so a low-core run is verifiable from the
        # emitted line alone (not just from stage tails in the log)
        "cpus": cpus,
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
        **provenance,
    }))


if __name__ == "__main__":
    main()
