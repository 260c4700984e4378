"""ORC source/sink: value-identical roundtrip vs the Parquet path, and
the three scan optimizations asserted ON THE PLAN (pushdown, pruning,
partition pruning) — a scan that reads everything is wrong at scale
even when the answer is right."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from downscaledclimatedata_spark.sources.columnar import (
    read_columnar, write_columnar)
from downscaledclimatedata_spark.sources.tables import load_table
from tests.conftest import SF_CORRECTNESS


def _fmt_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_orc_roundtrip_value_identical(spark, tmp_path):
    src = load_table(spark, SF_CORRECTNESS, "orders")
    path = str(tmp_path / "orders_orc")
    write_columnar(src, path, fmt="orc")
    back = read_columnar(spark, path, fmt="orc")
    assert back.schema == src.schema
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_orc_scan_pushdown_and_pruning(spark, tmp_path):
    src = load_table(spark, SF_CORRECTNESS, "orders")
    path = str(tmp_path / "orders_orc2")
    write_columnar(src, path, fmt="orc")
    q = (read_columnar(spark, path, fmt="orc")
         .filter(F.col("o_custkey") == 7)
         .select("o_orderkey", "o_totalprice"))
    plan = _fmt_plan(q)
    assert "PushedFilters: [" in plan and "o_custkey" in plan.split(
        "PushedFilters")[1].splitlines()[0]
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "o_comment" not in read_schema  # column pruning reached ORC


def test_orc_hive_partition_pruning(spark, tmp_path):
    src = load_table(spark, SF_CORRECTNESS, "orders").withColumn(
        "o_year", F.year("o_orderdate"))
    path = str(tmp_path / "orders_part")
    write_columnar(src, path, fmt="orc", partition_by=("o_year",))
    q = read_columnar(spark, path, fmt="orc").filter(F.col("o_year") == 1995)
    plan = _fmt_plan(q)
    pf = plan.split("PartitionFilters")[1].splitlines()[0]
    assert "o_year" in pf
    years = {r.o_year for r in q.select("o_year").distinct().collect()}
    assert years == {1995}
