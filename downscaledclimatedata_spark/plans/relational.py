"""Generic relational operator coverage (SURVEY.md §2.3-§2.8 [abs] claims).

The reference has no relational joins/aggs/windows/set-ops; the engine
declares them as first-class capabilities, each expressed declaratively
(Catalyst plans broadcast joins, partial aggs, TakeOrderedAndProject,
pushdown/pruning) and each hash-checked against a DuckDB oracle.

Determinism rules used throughout:
- money aggregates go through exact DECIMAL then surface as DOUBLE
  (see functions/money.py) so Spark's reduction order can't change bits;
- every top-k / window ordering carries a unique tiebreaker key;
- column names are aliased identically in Spark and oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from downscaledclimatedata_spark.functions.money import dec, dec_sql
from downscaledclimatedata_spark.plans import QuerySpec, register
from downscaledclimatedata_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- q01: full-table grouped aggregation (TPC-H Q1 pattern) -----------------

def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    price = dec("l_extendedprice", 2)
    disc = dec("l_discount", 2)
    tax = dec("l_tax", 2)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity", 2)).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax)).cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity", 2)).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count("*")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


_Q01_SQL = f"""
SELECT l_returnflag, l_linestatus,
  CAST(SUM({dec_sql('l_quantity')}) AS DOUBLE) AS sum_qty,
  CAST(SUM({dec_sql('l_extendedprice')}) AS DOUBLE) AS sum_base_price,
  CAST(SUM({dec_sql('l_extendedprice')} * (1 - {dec_sql('l_discount')})) AS DOUBLE) AS sum_disc_price,
  CAST(SUM({dec_sql('l_extendedprice')} * (1 - {dec_sql('l_discount')}) * (1 + {dec_sql('l_tax')})) AS DOUBLE) AS sum_charge,
  CAST(SUM({dec_sql('l_quantity')}) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM({dec_sql('l_extendedprice')}) AS DOUBLE) / COUNT(*) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- q02: selective filter + global aggregate (TPC-H Q6 pattern) ------------

def q02_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(dec("l_extendedprice", 2) * dec("l_discount", 2)).cast("double").alias("revenue"),
             F.count("*").alias("n_rows"))
    )


_Q02_SQL = f"""
SELECT CAST(SUM({dec_sql('l_extendedprice')} * {dec_sql('l_discount')}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# --- q03: 3-way join + group + top-k (TPC-H Q3 pattern) ---------------------

def q03_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1996-06-01").cast("timestamp"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(dec("l_extendedprice", 2) * (F.lit(1) - dec("l_discount", 2)))
             .cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


_Q03_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
  CAST(SUM({dec_sql('l_extendedprice')} * (1 - {dec_sql('l_discount')})) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1996-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- q04: semi join with non-equi condition (TPC-H Q4 pattern) --------------

def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    matched = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


_Q04_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


# --- q05: multi-way join through dims (TPC-H Q5 pattern, broadcast dims) ----

def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.sum(dec("l_extendedprice", 2) * (F.lit(1) - dec("l_discount", 2)))
             .cast("double").alias("revenue"))
    )


_Q05_SQL = f"""
SELECT n_name,
  CAST(SUM({dec_sql('l_extendedprice')} * (1 - {dec_sql('l_discount')})) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


# --- q06: anti join (customers with no orders) -------------------------------

def q06_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"),
             F.sum(dec("c_acctbal", 2)).cast("double").alias("total_acctbal"))
    )


_Q06_SQL = f"""
SELECT c_mktsegment, COUNT(*) AS n_customers,
  CAST(SUM({dec_sql('c_acctbal')}) AS DOUBLE) AS total_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


# --- q07: outer join + distribution (TPC-H Q13 pattern) ----------------------

def q07_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


_Q07_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey)
GROUP BY c_count
"""


# --- q08: window ranking (row_number top-n per group) ------------------------

def q08_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


_Q08_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders)
WHERE rn <= 3
"""


# --- q09: analytic window (lag + running sum over event time) ----------------

def q09_user_event_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    w_ord = Window.partitionBy("user_id").orderBy(*order)
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "user_id", "event_id",
        F.lag("event_type", 1).over(w_ord).alias("prev_type"),
        F.sum(dec("value", 6)).over(w_run).cast("double").alias("running_value"),
        F.row_number().over(w_ord).alias("seq"),
    )


_Q09_SQL = f"""
SELECT user_id, event_id,
  LAG(event_type, 1) OVER w AS prev_type,
  CAST(SUM({dec_sql('value', 6)}) OVER (PARTITION BY user_id ORDER BY ts, event_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
  ROW_NUMBER() OVER w AS seq
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --- q10: returned-item revenue top-k (TPC-H Q10 pattern) --------------------

def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(dec("l_extendedprice", 2) * (F.lit(1) - dec("l_discount", 2)))
             .cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


_Q10_SQL = f"""
SELECT c_custkey, c_name, n_name,
  CAST(SUM({dec_sql('l_extendedprice')} * (1 - {dec_sql('l_discount')})) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- q11: rollup ------------------------------------------------------------

def q11_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"),
             F.sum(dec("l_quantity", 2)).cast("double").alias("sum_qty"))
    )


_Q11_SQL = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
  CAST(SUM({dec_sql('l_quantity')}) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --- q12: cube ---------------------------------------------------------------

def q12_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"),
             F.sum(dec("o_totalprice", 2)).cast("double").alias("sum_price"))
    )


_Q12_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
  CAST(SUM({dec_sql('o_totalprice')}) AS DOUBLE) AS sum_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- q13: distinct aggregation ------------------------------------------------

def q13_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n_customers"),
             F.count("*").alias("n_orders"))
    )


_Q13_SQL = """
SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers, COUNT(*) AS n_orders
FROM orders GROUP BY o_orderstatus
"""


# --- q14-q16: set operations ---------------------------------------------------

def q14_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 200000).select(F.col("o_custkey").alias("custkey"))
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_custkey").alias("custkey"))
    return big.intersect(urgent)


_Q14_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


def q15_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    all_keys = cust.select(F.col("c_custkey").alias("custkey"))
    with_orders = orders.select(F.col("o_custkey").alias("custkey"))
    return all_keys.exceptAll(with_orders.distinct()).distinct()


_Q15_SQL = """
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey AS custkey FROM orders
"""


def q16_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    return (
        cust.select(F.col("c_nationkey").alias("nationkey"))
        .union(supp.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


_Q16_SQL = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


# --- q17: string function family (SURVEY §2.8) --------------------------------

def q17_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.element_at(F.split("p_type", " "), 1).alias("type_first_word"),
        F.element_at(F.split("p_type", " "), -1).alias("type_last_word"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", "a", "@").alias("name_masked"),
        F.col("p_name").contains("steel").cast("int").alias("has_steel"),
        F.col("p_name").startswith("alm").cast("int").alias("starts_alm"),
        F.trim(F.lpad("p_brand", 12, "#")).alias("brand_padded"),
    )


_Q17_SQL = """
SELECT p_partkey,
  UPPER(p_name) AS name_upper,
  LOWER(p_brand) AS brand_lower,
  LENGTH(p_name) AS name_len,
  SUBSTR(p_type, 1, 5) AS type_prefix,
  str_split(p_type, ' ')[1] AS type_first_word,
  str_split(p_type, ' ')[-1] AS type_last_word,
  CONCAT_WS('|', p_brand, p_type) AS brand_type,
  REGEXP_REPLACE(p_name, 'a', '@', 'g') AS name_masked,
  CAST(contains(p_name, 'steel') AS INT) AS has_steel,
  CAST(starts_with(p_name, 'alm') AS INT) AS starts_alm,
  TRIM(LPAD(p_brand, 12, '#')) AS brand_padded
FROM part
"""


# --- q18: date/time function family -------------------------------------------

def q18_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.quarter("o_orderdate").alias("qtr"),
            dec("o_totalprice", 2).alias("price_dec"),
        )
        .groupBy("yr", "mo", "qtr")
        .agg(F.count("*").alias("n_orders"),
             F.sum("price_dec").cast("double").alias("sum_price"))
    )


_Q18_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       COUNT(*) AS n_orders,
       CAST(SUM({dec_sql('o_totalprice')}) AS DOUBLE) AS sum_price
FROM orders GROUP BY 1, 2, 3
"""


# --- q19: JSON extraction -------------------------------------------------------

def q19_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select((k % 10).alias("k_bucket"), dec("value", 6).alias("v"))
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n_events"),
             F.sum("v").cast("double").alias("sum_value"))
    )


_Q19_SQL = f"""
SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
       COUNT(*) AS n_events,
       CAST(SUM({dec_sql('value', 6)}) AS DOUBLE) AS sum_value
FROM events GROUP BY 1
"""


# --- q20: conditional aggregation (CASE WHEN pivots) -----------------------------

def q20_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    price = dec("l_extendedprice", 2)
    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_discount") >= 0.05, price).otherwise(F.lit(0).cast("decimal(18,2)")))
        .cast("double").alias("high_disc_price"),
        F.sum(F.when(F.col("l_discount") < 0.05, price).otherwise(F.lit(0).cast("decimal(18,2)")))
        .cast("double").alias("low_disc_price"),
        F.count(F.when(F.col("l_quantity") > 25, True)).alias("n_bulk"),
    )


_Q20_SQL = f"""
SELECT l_returnflag,
  CAST(SUM(CASE WHEN l_discount >= 0.05 THEN {dec_sql('l_extendedprice')} ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS high_disc_price,
  CAST(SUM(CASE WHEN l_discount < 0.05 THEN {dec_sql('l_extendedprice')} ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS low_disc_price,
  COUNT(CASE WHEN l_quantity > 25 THEN TRUE END) AS n_bulk
FROM lineitem GROUP BY l_returnflag
"""


# --- q21: range (non-equi) join ----------------------------------------------------

def q21_error_context_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each error event, count same-user events in the preceding 60s.

    Equi key (user_id) + range predicate on ts: Spark plans a hash join on
    user_id with the range as a post-join filter — the scalable shape for
    time-range correlation (skew on user_id handled by AQE).
    """
    ev = _t(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts"))
    prior = ev.select(F.col("user_id").alias("u2"), F.col("ts").alias("ts2"))
    joined = err.join(
        prior,
        (F.col("u") == F.col("u2"))
        & (F.col("ts2") < F.col("err_ts"))
        & (F.col("ts2") >= F.col("err_ts") - F.expr("INTERVAL 60 SECONDS")),
        "inner",
    )
    return (
        joined.groupBy("err_id")
        .agg(F.count("*").alias("n_prior"))
    )


_Q21_SQL = """
SELECT e.event_id AS err_id, COUNT(*) AS n_prior
FROM events e JOIN events p
  ON e.user_id = p.user_id
 AND p.ts < e.ts AND p.ts >= e.ts - INTERVAL 60 SECOND
WHERE e.event_type = 'error'
GROUP BY e.event_id
"""


# --- q22: global top-k (TakeOrderedAndProject) ---------------------------------------

def q22_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


_Q22_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
"""


# --- q23: HAVING (post-aggregation filter) --------------------------------------------

def q23_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity", 2)).cast("double").alias("total_qty"),
             F.count("*").alias("n_items"))
        .filter(F.col("total_qty") > 1000)
    )


_Q23_SQL = f"""
SELECT l_suppkey, CAST(SUM({dec_sql('l_quantity')}) AS DOUBLE) AS total_qty,
       COUNT(*) AS n_items
FROM lineitem GROUP BY l_suppkey
HAVING CAST(SUM({dec_sql('l_quantity')}) AS DOUBLE) > 1000
"""


# --- q24: scalar-subquery threshold (broadcast single-row agg) --------------------------

def q24_above_average_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    avg_bal = cust.agg(
        (F.sum(dec("c_acctbal", 2)).cast("double") / F.count("*")).alias("avg_bal"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_above_avg"))
    )


_Q24_SQL = f"""
SELECT c_mktsegment, COUNT(*) AS n_above_avg
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM({dec_sql('c_acctbal')}) AS DOUBLE) / COUNT(*) FROM customer)
GROUP BY c_mktsegment
"""


# --- q25: grouping sets (SQL-declared plan) -----------------------------------------------

def q25_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(f"""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM({dec_sql('o_totalprice')}) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """)


_Q25_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM({dec_sql('o_totalprice')}) AS DOUBLE) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
"""


_SPECS = [
    QuerySpec("q01_pricing_summary", q01_pricing_summary, _Q01_SQL, headline=True,
              description="grouped agg with exact-decimal sums (TPC-H Q1 shape)"),
    QuerySpec("q02_revenue_forecast", q02_revenue_forecast, _Q02_SQL, headline=True,
              description="selective filter + global agg (TPC-H Q6 shape)"),
    QuerySpec("q03_top_revenue_orders", q03_top_revenue_orders, _Q03_SQL, headline=True,
              description="3-way join + group + deterministic top-k (TPC-H Q3 shape)"),
    QuerySpec("q04_order_priority", q04_order_priority, _Q04_SQL,
              description="left_semi join with non-equi condition (TPC-H Q4 shape)"),
    QuerySpec("q05_region_revenue", q05_region_revenue, _Q05_SQL, headline=True,
              description="6-table join, broadcast dims (TPC-H Q5 shape)"),
    QuerySpec("q06_customers_without_orders", q06_customers_without_orders, _Q06_SQL,
              description="left_anti join (idempotency-log shape, SURVEY J3)"),
    QuerySpec("q07_customer_order_distribution", q07_customer_order_distribution, _Q07_SQL,
              description="left outer join + nested agg (TPC-H Q13 shape)"),
    QuerySpec("q08_top_orders_per_customer", q08_top_orders_per_customer, _Q08_SQL,
              description="row_number window, top-n per group"),
    QuerySpec("q09_user_event_running", q09_user_event_running, _Q09_SQL, headline=True,
              description="lag + running-frame sum over event time"),
    QuerySpec("q10_returned_revenue", q10_returned_revenue, _Q10_SQL,
              description="filtered join + top-k (TPC-H Q10 shape)"),
    QuerySpec("q11_rollup", q11_rollup, _Q11_SQL, description="ROLLUP grouping"),
    QuerySpec("q12_cube", q12_cube, _Q12_SQL, description="CUBE grouping"),
    QuerySpec("q13_distinct_customers", q13_distinct_customers, _Q13_SQL,
              description="COUNT(DISTINCT) per group"),
    QuerySpec("q14_set_intersect", q14_set_intersect, _Q14_SQL, description="INTERSECT"),
    QuerySpec("q15_set_except", q15_set_except, _Q15_SQL, description="EXCEPT"),
    QuerySpec("q16_set_union", q16_set_union, _Q16_SQL, description="UNION distinct"),
    QuerySpec("q17_string_functions", q17_string_functions, _Q17_SQL,
              description="string scalar-function family (SURVEY §2.8)"),
    QuerySpec("q18_date_functions", q18_date_functions, _Q18_SQL,
              description="date/time scalar-function family"),
    QuerySpec("q19_json_extract", q19_json_extract, _Q19_SQL,
              description="JSON path extraction + agg"),
    QuerySpec("q20_conditional_agg", q20_conditional_agg, _Q20_SQL,
              description="CASE WHEN conditional aggregation"),
    QuerySpec("q21_error_context_range_join", q21_error_context_range_join, _Q21_SQL,
              headline=True, description="equi+range self-join over event time"),
    QuerySpec("q22_global_topk", q22_global_topk, _Q22_SQL,
              description="global ORDER BY + LIMIT (TakeOrderedAndProject)"),
    QuerySpec("q23_having", q23_having, _Q23_SQL, description="HAVING post-agg filter"),
    QuerySpec("q24_above_average_customers", q24_above_average_customers, _Q24_SQL,
              description="scalar-subquery threshold via broadcast 1-row agg"),
    QuerySpec("q25_grouping_sets", q25_grouping_sets, _Q25_SQL,
              description="GROUPING SETS via spark.sql"),
]

for _s in _SPECS:
    register(_s)


# --- q76: market share (TPC-H Q8 shape: ratio-to-report) -----------------------

def q76_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation revenue share within its region, by order year — the
    ratio-to-report shape (TPC-H Q8's essence): a grouped exact-DECIMAL
    revenue aggregate, then each row divided by its (region, year)
    window total. Shares divide two exact decimals once, so the doubles
    hash-match; the window runs over the |nations × years| aggregate,
    never the fact table.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    rev = (li.join(orders, li.l_orderkey == orders.o_orderkey)
           .join(cust, orders.o_custkey == cust.c_custkey)
           .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
           .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
           .groupBy(F.col("r_name"), F.col("n_name"),
                    F.year("o_orderdate").alias("yr"))
           .agg(F.sum(dec("l_extendedprice", 2)
                      * (F.lit(1) - dec("l_discount", 2))).alias("rev")))
    w = Window.partitionBy("r_name", "yr")
    return (rev.withColumn("region_rev", F.sum("rev").over(w))
            .select("r_name", "yr", "n_name",
                    F.col("rev").cast("double").alias("revenue"),
                    # divide as doubles: Spark's DECIMAL/DECIMAL rounds
                    # to the result scale before any cast, DuckDB's does
                    # not — same-decimal -> same-double -> same quotient
                    (F.col("rev").cast("double")
                     / F.col("region_rev").cast("double")).alias("share"))
            .orderBy("r_name", "yr", "n_name"))


_Q76_SQL = f"""
WITH rev AS (
  SELECT r_name, n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
    SUM({dec_sql('l_extendedprice')} * (1 - {dec_sql('l_discount')})) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name, yr
)
SELECT r_name, yr, n_name,
  CAST(rev AS DOUBLE) AS revenue,
  CAST(rev AS DOUBLE)
    / CAST(SUM(rev) OVER (PARTITION BY r_name, yr) AS DOUBLE) AS share
FROM rev
ORDER BY r_name, yr, n_name
"""

register(QuerySpec("q76_market_share", q76_market_share, _Q76_SQL,
                   description="ratio-to-report market share (TPC-H Q8 "
                               "shape): exact-DECIMAL revenue, window "
                               "share over the small aggregate"))
