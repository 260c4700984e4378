"""Bucketed co-located join: the 100 TB pattern for repeated fact-to-fact
joins — pre-bucket both tables on the join key so the join is shuffle-free
(both sides already hash-partitioned on disk). The plan assertion proves
no Exchange is needed on either side.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from pyspark.sql import functions as F

from downscaledclimatedata_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE

N_BUCKETS = 4


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buckdb LOCATION '{warehouse}'")
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    (orders.write.mode("overwrite")
     .bucketBy(N_BUCKETS, "o_orderkey").sortBy("o_orderkey")
     .saveAsTable("buckdb.orders_b"))
    (lineitem.write.mode("overwrite")
     .bucketBy(N_BUCKETS, "l_orderkey").sortBy("l_orderkey")
     .saveAsTable("buckdb.lineitem_b"))
    yield "buckdb.orders_b", "buckdb.lineitem_b"
    spark.sql("DROP TABLE IF EXISTS buckdb.orders_b")
    spark.sql("DROP TABLE IF EXISTS buckdb.lineitem_b")
    spark.sql("DROP DATABASE IF EXISTS buckdb")


def _join(spark, orders_t, lineitem_t):
    o = spark.table(orders_t)
    li = spark.table(lineitem_t)
    return (li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_lines")))


def test_bucketed_join_is_shuffle_free(spark, bucketed):
    orders_t, lineitem_t = bucketed
    # disable broadcast so the join strategy itself is under test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = _join(spark, orders_t, lineitem_t)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        import re
        join_shuffles = [
            m for m in re.findall(r"^\(\d+\) Exchange\n.*?Arguments: ([^\n]*)",
                                  plan, flags=re.MULTILINE)
            if "orderkey" in m]
        assert "SortMergeJoin" in plan
        assert not join_shuffles, \
            f"bucketed join must not shuffle on the join key:\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_bucketed_join_matches_unbucketed(spark, bucketed):
    orders_t, lineitem_t = bucketed
    got = {tuple(r) for r in _join(spark, orders_t, lineitem_t).collect()}
    o = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    want = {tuple(r) for r in
            (li.join(o, li["l_orderkey"] == o["o_orderkey"])
             .groupBy("o_orderpriority")
             .agg(F.count("*").alias("n_lines"))).collect()}
    assert got == want and len(got) > 0
