"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All queries live in the ``downscaledclimatedata_spark.plans`` registry;
this module is a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from downscaledclimatedata_spark.plans import all_specs  # noqa: E402

_PKG_ZIP: str | None = None


def _ship_package(spark: SparkSession) -> None:
    """Make the package importable on executor Python workers.

    The harness may run from any cwd with its own SparkSession; UDF-backed
    operators (mapInPandas) would otherwise fail to unpickle on workers.
    Equivalent to spark-submit --py-files.
    """
    global _PKG_ZIP
    try:
        if _PKG_ZIP is None:
            import shutil
            import tempfile
            base = Path(__file__).resolve().parent
            _PKG_ZIP = shutil.make_archive(
                str(Path(tempfile.mkdtemp()) / "dcd_spark_pkg"), "zip",
                root_dir=base, base_dir="downscaledclimatedata_spark")
        spark.sparkContext.addPyFile(_PKG_ZIP)
    except Exception:
        pass  # e.g. Spark Connect sessions without an accessible context


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship_package(spark)
        return fn(spark, sf_dir)
    return runner


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    specs = all_specs()
    return _wrap(specs["q01_pricing_summary"].spark)(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(spec.spark) for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible ops)."""
    return {name: spec.oracle for name, spec in all_specs().items()
            if spec.oracle is not None}
