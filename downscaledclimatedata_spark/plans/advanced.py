"""Advanced relational coverage: statistics, pivot, sampling, arrays,
structs, posexplode, union-by-name, analytic windows, sessionization,
date arithmetic.

Cross-engine determinism notes:
- moments (variance/stddev/corr) are computed from exact DECIMAL power
  sums surfaced as DOUBLE, then combined with identical double
  arithmetic — never via the engines' own var_samp/corr (whose internal
  accumulation order differs);
- sampling is content-hash based (deterministic in both engines), not
  TABLESAMPLE (engine-specific RNG);
- collected arrays are always sorted before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from downscaledclimatedata_spark.functions.hashing import md5_long, md5_long_sql
from downscaledclimatedata_spark.functions.money import dec, dec_sql
from downscaledclimatedata_spark.plans import QuerySpec, register
from downscaledclimatedata_spark.sources.tables import load_table
from downscaledclimatedata_spark.functions.text import WS_RE


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- q26: moments from exact power sums --------------------------------------

def q26_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    x = dec("l_quantity", 2)
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("s1"),
        F.sum(x * x).cast("double").alias("s2"),
    )
    n = F.col("n").cast("double")
    var = (n * F.col("s2") - F.col("s1") * F.col("s1")) / (n * (n - F.lit(1.0)))
    return agg.select(
        "l_returnflag", "n",
        (F.col("s1") / n).alias("mean_qty"),
        var.alias("var_qty"),
        F.sqrt(var).alias("std_qty"),
    )


_Q26_SQL = f"""
WITH s AS (
  SELECT l_returnflag, COUNT(*) AS n,
    CAST(SUM({dec_sql('l_quantity')}) AS DOUBLE) AS s1,
    CAST(SUM({dec_sql('l_quantity')} * {dec_sql('l_quantity')}) AS DOUBLE) AS s2
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
  s1 / CAST(n AS DOUBLE) AS mean_qty,
  (CAST(n AS DOUBLE) * s2 - s1 * s1) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS var_qty,
  sqrt((CAST(n AS DOUBLE) * s2 - s1 * s1) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS std_qty
FROM s
"""


# --- q27: exact median via window (engine-agnostic definition) ---------------

def q27_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median as avg of the middle ranks — defined via row_number so both
    engines compute the identical value (no interpolation-rule drift).

    Scale shape (r7 audit fix): exact per-group ranks inherently need a
    total order, but ``row_number() OVER (PARTITION BY
    o_orderpriority)`` funnels the whole table through 5 reducers. The
    two-phase binned rank (functions/ranks.py) computes the IDENTICAL
    rank with windows partitioned on (priority, price-bin) — 64Ki bins,
    parallelism ∝ bins — plus a broadcast cumulative-offset join over
    the bounded bin histogram; the per-group count rides the same
    histogram instead of a second corpus window. The only driver
    scalars are the price min/max that size the bins.
    """
    from downscaledclimatedata_spark.functions.ranks import (
        binned_row_number, value_bin)

    orders = _t(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderpriority", dec("o_totalprice", 2).alias("p"), "o_orderkey")
    st = base.agg(F.min("p"), F.max("p")).first()
    lo, hi = float(st[0] or 0), float(st[1] or 0)
    binned = base.withColumn(
        "_pbin", value_bin(F.col("p").cast("double"), lo, hi))
    ranked = binned_row_number(
        binned, "_pbin", ("p", "o_orderkey"),
        partition_cols=("o_orderpriority",), out="rn", count_col="cnt")
    mid = ranked.filter((F.col("rn") == F.floor((F.col("cnt") + 1) / 2))
                        | (F.col("rn") == F.floor((F.col("cnt") + 2) / 2)))
    return (mid.groupBy("o_orderpriority")
            .agg((F.sum("p").cast("double") / F.count("*")).alias("median_price")))


_Q27_SQL = f"""
WITH ranked AS (
  SELECT o_orderpriority, {dec_sql('o_totalprice')} AS p,
    ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn,
    COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
  FROM orders
)
SELECT o_orderpriority,
  CAST(SUM(p) AS DOUBLE) / COUNT(*) AS median_price
FROM ranked
WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
GROUP BY o_orderpriority
"""


# --- q28: pivot --------------------------------------------------------------

def q28_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_linestatus")
            .pivot("l_returnflag", ["A", "N", "R"])
            .agg(F.sum(dec("l_quantity", 2)).cast("double"))
            .select("l_linestatus",
                    F.col("A").alias("qty_a"), F.col("N").alias("qty_n"),
                    F.col("R").alias("qty_r")))


_Q28_SQL = f"""
SELECT l_linestatus,
  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN {dec_sql('l_quantity')} END) AS DOUBLE) AS qty_a,
  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN {dec_sql('l_quantity')} END) AS DOUBLE) AS qty_n,
  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN {dec_sql('l_quantity')} END) AS DOUBLE) AS qty_r
FROM lineitem GROUP BY l_linestatus
"""


# --- q29: deterministic hash sampling ----------------------------------------

def q29_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-in-10 deterministic sample keyed on content hash (the
    reproducible analog of TABLESAMPLE for cross-engine checks)."""
    orders = _t(spark, sf_dir, "orders")
    keyed = orders.withColumn("hk", md5_long(F.col("o_orderkey").cast("string")))
    return (keyed.filter(F.col("hk") % 10 == 0)
            .agg(F.count("*").alias("n_sampled"),
                 F.sum(dec("o_totalprice", 2)).cast("double").alias("sum_price")))


_Q29_SQL = f"""
SELECT COUNT(*) AS n_sampled,
  CAST(SUM({dec_sql('o_totalprice')}) AS DOUBLE) AS sum_price
FROM orders
WHERE {md5_long_sql("CAST(o_orderkey AS VARCHAR)")} % 10 = 0
"""


# --- q30: array construction + functions -------------------------------------

def q30_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    grouped = (orders.groupBy("o_custkey")
               .agg(F.array_sort(F.collect_list("o_orderkey")).alias("keys")))
    return grouped.select(
        "o_custkey",
        F.size("keys").alias("n_orders"),
        F.element_at("keys", 1).alias("first_key"),
        F.element_at("keys", -1).alias("last_key"),
        # stringified: the driver's pandas canonicalizer can't hash list
        # cells, so the array capability is exercised (sort/slice) but the
        # emitted cell is a scalar
        F.array_join(F.slice("keys", 1, 3).cast("array<string>"), ",").alias("first3"),
        F.array_contains("keys", F.col("o_custkey") * 0 + 1).alias("has_key_1"),
    )


_Q30_SQL = """
WITH g AS (
  SELECT o_custkey, list_sort(list(o_orderkey)) AS keys FROM orders GROUP BY o_custkey
)
SELECT o_custkey, len(keys) AS n_orders,
  keys[1] AS first_key, keys[-1] AS last_key,
  array_to_string(keys[1:3], ',') AS first3,
  list_contains(keys, 1) AS has_key_1
FROM g
"""


# --- q31: struct pack/unpack --------------------------------------------------

def q31_struct_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    packed = cust.select(
        "c_custkey",
        F.struct(F.col("c_name").alias("name"),
                 F.col("c_mktsegment").alias("seg")).alias("info"))
    return packed.select(
        "c_custkey",
        F.col("info.name").alias("name"),
        F.upper(F.col("info.seg")).alias("seg_upper"))


_Q31_SQL = """
WITH packed AS (
  SELECT c_custkey, {'name': c_name, 'seg': c_mktsegment} AS info FROM customer
)
SELECT c_custkey, info.name AS name, UPPER(info.seg) AS seg_upper FROM packed
"""


# --- q32: posexplode ----------------------------------------------------------

def q32_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toked = docs.select(
        "doc_id", F.filter(F.split(F.lower("text"), WS_RE), lambda x: x != "").alias("toks"))
    return (toked.select("doc_id", F.posexplode("toks").alias("pos0", "token"))
            .select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")
            .filter(F.col("pos") <= 10))


_Q32_SQL = r"""
WITH toked AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'), x -> x <> '') AS toks
  FROM documents WHERE doc_id < 50
)
SELECT doc_id, i AS pos, toks[i] AS token
FROM toked, LATERAL (SELECT UNNEST(range(1, len(toks) + 1)) AS i) idx
WHERE i <= 10
"""


# --- q33: IN / correlated subqueries via spark.sql ----------------------------

def q33_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql("""
        SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM v_customer
        WHERE c_custkey IN (SELECT o_custkey FROM v_orders WHERE o_totalprice > 300000)
          AND c_acctbal > (SELECT 0.0)
        GROUP BY c_mktsegment
    """)


_Q33_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
  AND c_acctbal > 0.0
GROUP BY c_mktsegment
"""


# --- q34: union by name with missing columns ----------------------------------

def q34_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    a = cust.select(F.col("c_name").alias("name"),
                    F.col("c_acctbal").alias("acctbal"),
                    F.col("c_mktsegment").alias("segment"))
    b = supp.select(F.col("s_name").alias("name"),
                    F.col("s_acctbal").alias("acctbal"))
    unioned = a.unionByName(b.withColumn("segment", F.lit(None).cast("string")),
                            allowMissingColumns=False)
    return (unioned.groupBy("segment")
            .agg(F.count("*").alias("n"),
                 F.sum(dec("acctbal", 2)).cast("double").alias("total_bal")))


_Q34_SQL = f"""
WITH unioned AS (
  SELECT c_name AS name, c_acctbal AS acctbal, c_mktsegment AS segment FROM customer
  UNION ALL
  SELECT s_name AS name, s_acctbal AS acctbal, NULL AS segment FROM supplier
)
SELECT segment, COUNT(*) AS n,
  CAST(SUM({dec_sql('acctbal')}) AS DOUBLE) AS total_bal
FROM unioned GROUP BY segment
"""


# --- q35: analytic window family ----------------------------------------------

def q35_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_custkey", "o_orderkey",
        F.dense_rank().over(w).alias("drank"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
        F.first("o_orderkey").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("first_key"),
        F.last("o_orderkey").over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).alias("last_key"),
    )


_Q35_SQL = """
SELECT o_custkey, o_orderkey,
  DENSE_RANK() OVER w AS drank,
  NTILE(4) OVER w AS quartile,
  PERCENT_RANK() OVER w AS prank,
  CUME_DIST() OVER w AS cdist,
  FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_key,
  LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
"""


# --- q36: sessionization (gap-based) ------------------------------------------

def q36_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions: a >300s silence starts a new session. The
    batch formulation of what applyInPandasWithState/session_window do in
    streaming — two narrow windows, one shuffle by user."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = ev.select(
        "user_id", "event_id", "ts",
        F.when(
            (F.unix_timestamp("ts")
             - F.unix_timestamp(F.lag("ts", 1).over(w))) > 300, 1)
        .otherwise(0).alias("new_session"))
    sessioned = gapped.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    return (sessioned.groupBy("user_id", "session_id")
            .agg(F.count("*").alias("n_events"))
            .groupBy("n_events")
            .agg(F.count("*").alias("n_sessions")))


_Q36_SQL = """
WITH gapped AS (
  SELECT user_id, event_id, ts,
    CASE WHEN date_diff('second', LAG(ts, 1) OVER w, ts) > 300 THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessioned AS (
  SELECT user_id, event_id,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM gapped
), per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events
  FROM sessioned GROUP BY user_id, session_id
)
SELECT n_events, COUNT(*) AS n_sessions FROM per_session GROUP BY n_events
"""


# --- q37: date arithmetic family ----------------------------------------------

def q37_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return orders.select(
        "o_orderkey",
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.add_months(F.col("o_orderdate").cast("date"), 3).alias("q_later"),
        F.last_day(F.col("o_orderdate")).alias("month_end"),
        F.datediff(F.lit("2000-01-01").cast("date"),
                   F.col("o_orderdate").cast("date")).alias("days_to_y2k"),
        (F.dayofweek("o_orderdate") - 1).alias("dow_sunday0"),
        F.date_trunc("quarter", "o_orderdate").cast("date").alias("quarter_start"),
    )


_Q37_SQL = """
SELECT o_orderkey,
  CAST(o_orderdate AS DATE) + 30 AS due_date,
  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS q_later,
  last_day(CAST(o_orderdate AS DATE)) AS month_end,
  date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
  CAST(dayofweek(o_orderdate) AS INT) AS dow_sunday0,
  CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start
FROM orders WHERE o_orderkey < 500
"""


# --- q38: correlation from exact sums ------------------------------------------

def q38_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    x = dec("l_quantity", 2)
    y = dec("l_extendedprice", 2)
    agg = li.agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx")) \
        * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
    return agg.select("n", (num / den).alias("corr_qty_price"))


_Q38_SQL = f"""
WITH s AS (
  SELECT COUNT(*) AS n,
    CAST(SUM({dec_sql('l_quantity')}) AS DOUBLE) AS sx,
    CAST(SUM({dec_sql('l_extendedprice')}) AS DOUBLE) AS sy,
    CAST(SUM({dec_sql('l_quantity')} * {dec_sql('l_quantity')}) AS DOUBLE) AS sxx,
    CAST(SUM({dec_sql('l_extendedprice')} * {dec_sql('l_extendedprice')}) AS DOUBLE) AS syy,
    CAST(SUM({dec_sql('l_quantity')} * {dec_sql('l_extendedprice')}) AS DOUBLE) AS sxy
  FROM lineitem
)
SELECT n,
  (CAST(n AS DOUBLE) * sxy - sx * sy)
    / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) * sqrt(CAST(n AS DOUBLE) * syy - sy * sy))
  AS corr_qty_price
FROM s
"""


# --- q43: ordered string aggregation ------------------------------------------

def q43_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    return (nation.groupBy("n_regionkey")
            .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",")
                 .alias("nations"),
                 F.count("*").alias("n_nations")))


_Q43_SQL = """
SELECT n_regionkey,
  string_agg(n_name, ',' ORDER BY n_name) AS nations,
  COUNT(*) AS n_nations
FROM nation GROUP BY n_regionkey
"""


# --- q44: full outer join ------------------------------------------------------

def q44_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation customer vs supplier balance, full outer so nations with
    only one side (or rows with null keys) survive."""
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    c = (cust.groupBy("c_nationkey")
         .agg(F.count("*").alias("n_customers"),
              F.sum(dec("c_acctbal", 2)).cast("double").alias("cust_bal")))
    s = (supp.groupBy("s_nationkey")
         .agg(F.count("*").alias("n_suppliers"),
              F.sum(dec("s_acctbal", 2)).cast("double").alias("supp_bal")))
    return (c.join(s, c["c_nationkey"] == s["s_nationkey"], "full_outer")
            .select(F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
                    "n_customers", "cust_bal", "n_suppliers", "supp_bal"))


_Q44_SQL = f"""
WITH c AS (
  SELECT c_nationkey, COUNT(*) AS n_customers,
    CAST(SUM({dec_sql('c_acctbal')}) AS DOUBLE) AS cust_bal
  FROM customer GROUP BY c_nationkey
), s AS (
  SELECT s_nationkey, COUNT(*) AS n_suppliers,
    CAST(SUM({dec_sql('s_acctbal')}) AS DOUBLE) AS supp_bal
  FROM supplier GROUP BY s_nationkey
)
SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
  c.n_customers, c.cust_bal, s.n_suppliers, s.supp_bal
FROM c FULL OUTER JOIN s ON c.c_nationkey = s.s_nationkey
"""


# --- q46: exact quantiles via rank (percentile_disc semantics) ------------------

def q46_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p25/p50/p75 defined by rank position (the value at
    ceil(q*n)) so both engines compute identical results — no
    interpolation-rule drift.

    Scale shape (r8 audit fix, q27's precedent): ``row_number() OVER
    (PARTITION BY l_returnflag)`` has 3 distinct partition values, so 3
    reducers would sort the whole lineitem table. The two-phase binned
    rank (functions/ranks.py) computes the IDENTICAL rank with windows
    partitioned on (returnflag, quantity-bin) — parallelism ∝ bins —
    plus a broadcast cumulative-offset join over the bounded histogram;
    the per-group count rides the same histogram. The only driver
    scalars are the quantity min/max that size the bins."""
    from downscaledclimatedata_spark.functions.ranks import (
        binned_row_number, value_bin)

    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag", dec("l_quantity", 2).alias("qty"),
        "l_orderkey", "l_linenumber")
    st = base.agg(F.min("qty"), F.max("qty")).first()
    lo, hi = float(st[0] or 0), float(st[1] or 0)
    binned = base.withColumn(
        "_qbin", value_bin(F.col("qty").cast("double"), lo, hi))
    ranked = binned_row_number(
        binned, "_qbin", ("qty", "l_orderkey", "l_linenumber"),
        partition_cols=("l_returnflag",), out="rn", count_col="cnt")
    picks = [
        F.max(F.when(F.col("rn") == F.ceil(F.col("cnt") * q), F.col("qty")))
        .cast("double").alias(name)
        for q, name in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75"))
    ]
    return ranked.groupBy("l_returnflag").agg(*picks)


_Q46_SQL = f"""
WITH ranked AS (
  SELECT l_returnflag, {dec_sql('l_quantity')} AS qty,
    ROW_NUMBER() OVER (PARTITION BY l_returnflag
      ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
    COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
  FROM lineitem
)
SELECT l_returnflag,
  CAST(MAX(CASE WHEN rn = CEIL(cnt * 0.25) THEN qty END) AS DOUBLE) AS p25,
  CAST(MAX(CASE WHEN rn = CEIL(cnt * 0.5) THEN qty END) AS DOUBLE) AS p50,
  CAST(MAX(CASE WHEN rn = CEIL(cnt * 0.75) THEN qty END) AS DOUBLE) AS p75
FROM ranked GROUP BY l_returnflag
"""


# --- q47: EXISTS / NOT EXISTS correlated subqueries -----------------------------

def q47_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("v47_supplier")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("v47_lineitem")
    return spark.sql("""
        SELECT
          COUNT(CASE WHEN EXISTS (
            SELECT 1 FROM v47_lineitem li
            WHERE li.l_suppkey = s.s_suppkey AND li.l_quantity > 49
          ) THEN 1 END) AS n_with_bulk,
          COUNT(CASE WHEN NOT EXISTS (
            SELECT 1 FROM v47_lineitem li
            WHERE li.l_suppkey = s.s_suppkey AND li.l_discount > 0.09
          ) THEN 1 END) AS n_without_deep_discount
        FROM v47_supplier s
    """)


_Q47_SQL = """
SELECT
  COUNT(CASE WHEN EXISTS (
    SELECT 1 FROM lineitem li
    WHERE li.l_suppkey = s.s_suppkey AND li.l_quantity > 49
  ) THEN 1 END) AS n_with_bulk,
  COUNT(CASE WHEN NOT EXISTS (
    SELECT 1 FROM lineitem li
    WHERE li.l_suppkey = s.s_suppkey AND li.l_discount > 0.09
  ) THEN 1 END) AS n_without_deep_discount
FROM supplier s
"""


# --- q48: skew-safe two-phase count distinct ------------------------------------

def q48_two_phase_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) as distinct-then-count — the skew-safe rewrite.

    A direct per-key COUNT(DISTINCT hot_key) funnels every row of a hot
    group through one reducer; phase 1 here shuffles on (key, value) so a
    hot key spreads over all partitions (map-side partial distinct
    included), and phase 2 aggregates the already-small per-key sets.
    Result is identical by definition, so the oracle uses the direct form.
    """
    li = _t(spark, sf_dir, "lineitem")
    pairs = li.select("l_returnflag", "l_partkey").distinct()
    return pairs.groupBy("l_returnflag").agg(F.count("*").alias("n_parts"))


_Q48_SQL = """
SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts
FROM lineitem GROUP BY l_returnflag
"""


# --- q49: upsert merge (MERGE INTO emulation) -----------------------------------

def q49_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension upsert without a table format: full-outer join base vs
    changes, coalesce changed values over current ones. The rewrite every
    warehouse runs when MERGE INTO isn't available; at scale both sides
    shuffle once on the merge key (or co-locate via bucketing)."""
    cust = _t(spark, sf_dir, "customer")
    base = cust.select("c_custkey", dec("c_acctbal", 2).alias("bal"))
    changes = (base.filter(F.col("c_custkey") % 10 == 0)
               .select("c_custkey", (F.col("bal") + 100).alias("new_bal")))
    merged = (base.join(changes, "c_custkey", "full_outer")
              .select("c_custkey",
                      F.coalesce("new_bal", "bal").alias("bal")))
    return merged.agg(
        F.count("*").alias("n_rows"),
        F.sum("bal").cast("double").alias("total_bal"))


_Q49_SQL = f"""
WITH base AS (
  SELECT c_custkey, {dec_sql('c_acctbal')} AS bal FROM customer
), changes AS (
  SELECT c_custkey, bal + 100 AS new_bal FROM base WHERE c_custkey % 10 = 0
), merged AS (
  SELECT COALESCE(b.c_custkey, c.c_custkey) AS c_custkey,
         COALESCE(c.new_bal, b.bal) AS bal
  FROM base b FULL OUTER JOIN changes c ON b.c_custkey = c.c_custkey
)
SELECT COUNT(*) AS n_rows, CAST(SUM(bal) AS DOUBLE) AS total_bal FROM merged
"""


# --- q50: keep-latest dedup (CDC compaction) ------------------------------------

def q50_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest record per key by event time — the CDC-compaction dedup
    (row_number over desc time, keep rank 1). One shuffle on the key."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    return (ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", F.col("event_id").alias("latest_event_id"),
                    F.col("ts").alias("latest_ts"),
                    F.col("event_type").alias("latest_type")))


_Q50_SQL = """
WITH ranked AS (
  SELECT user_id, event_id, ts, event_type,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_id AS latest_event_id, ts AS latest_ts,
       event_type AS latest_type
FROM ranked WHERE rn = 1
"""


# --- q39: approx distinct (rows-only: engine-specific sketches) -----------------

def q39_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch accuracy, framed so it IS oracle-checkable: Spark emits
    the exact count plus a sketch-sanity flag for its own
    approx_count_distinct; the oracle returns the exact count and TRUE.
    The sketch value itself is engine-specific (Spark's HLL++ vs DuckDB's
    HLL differ by design).

    Tolerance: the default rsd 0.05 is a STANDARD DEVIATION, not an error
    bound — a group's estimate can legitimately deviate past 1 rsd at any
    scale factor, so the flag uses a 4-sigma envelope (same probabilistic
    gate as tests/test_sketches.py). A genuinely broken sketch (orders of
    magnitude off) still trips it; a legitimate tail draw does not.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.approx_count_distinct("l_partkey").alias("_approx"),
                 F.countDistinct("l_partkey").alias("exact_parts"))
            .select(
                "l_returnflag", "exact_parts",
                (F.abs(F.col("_approx") - F.col("exact_parts"))
                 <= 4 * 0.05 * F.col("exact_parts")).alias("within_4rsd")))


_Q39_SQL = """
SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
       TRUE AS within_4rsd
FROM lineitem GROUP BY l_returnflag
"""


register(QuerySpec("q26_stats_moments", q26_stats_moments, _Q26_SQL,
                   description="variance/stddev from exact decimal power sums"))
register(QuerySpec("q27_exact_median", q27_exact_median, _Q27_SQL,
                   description="exact median via rank window (interpolation-rule-free)"))
register(QuerySpec("q28_pivot", q28_pivot, _Q28_SQL, description="pivot on return flag"))
register(QuerySpec("q29_hash_sample", q29_hash_sample, _Q29_SQL,
                   description="deterministic content-hash sampling"))
register(QuerySpec("q30_array_functions", q30_array_functions, _Q30_SQL,
                   description="array collect/sort/slice/element_at family"))
register(QuerySpec("q31_struct_roundtrip", q31_struct_roundtrip, _Q31_SQL,
                   description="struct pack + field access"))
register(QuerySpec("q32_posexplode_tokens", q32_posexplode_tokens, _Q32_SQL,
                   description="posexplode with 1-based ordinality"))
register(QuerySpec("q33_in_subquery", q33_in_subquery, _Q33_SQL,
                   description="IN + scalar subqueries via spark.sql"))
register(QuerySpec("q34_union_by_name", q34_union_by_name, _Q34_SQL,
                   description="unionByName with null-filled missing column"))
register(QuerySpec("q35_window_analytics", q35_window_analytics, _Q35_SQL,
                   description="dense_rank/ntile/percent_rank/cume_dist/first/last"))
register(QuerySpec("q36_sessionization", q36_sessionization, _Q36_SQL, headline=True,
                   description="gap-based sessionization via lag + running sum"))
register(QuerySpec("q37_date_arithmetic", q37_date_arithmetic, _Q37_SQL,
                   description="date_add/add_months/last_day/datediff/dayofweek/trunc"))
register(QuerySpec("q38_correlation", q38_correlation, _Q38_SQL,
                   description="Pearson correlation from exact power sums"))
register(QuerySpec("q49_upsert_merge", q49_upsert_merge, _Q49_SQL,
                   description="MERGE INTO emulation: full-outer join + coalesce upsert"))
register(QuerySpec("q50_keep_latest", q50_keep_latest, _Q50_SQL,
                   description="CDC keep-latest dedup via desc row_number"))
register(QuerySpec("q48_two_phase_distinct", q48_two_phase_distinct, _Q48_SQL,
                   description="skew-safe two-phase count distinct (distinct on pair, then count)"))
register(QuerySpec("q46_quartiles", q46_quartiles, _Q46_SQL,
                   description="exact rank-defined quartiles (percentile_disc semantics)"))
register(QuerySpec("q47_exists_subquery", q47_exists_subquery, _Q47_SQL,
                   description="EXISTS / NOT EXISTS correlated subqueries"))
register(QuerySpec("q44_full_outer_join", q44_full_outer_join, _Q44_SQL,
                   description="full outer join of per-nation customer/supplier aggregates"))
register(QuerySpec("q43_string_agg", q43_string_agg, _Q43_SQL,
                   description="ordered string aggregation (collect_list+array_sort+array_join vs string_agg)"))
register(QuerySpec("q39_approx_distinct", q39_approx_distinct, _Q39_SQL,
                   description="approx_count_distinct HLL sketch, oracle-checked as exact count + tolerance flag"))


# --- q57: correlated scalar subquery (decorrelation) ----------------------------

def q57_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-nation-average balance, via correlated SCALAR
    subqueries (not a hand-written join) — Catalyst decorrelates both into
    one aggregate + join, which is the plan you'd write by hand.

    The avg comparison is reformulated multiplicatively
    (bal * n > sum) so everything stays in exact DECIMAL/integer space —
    no float division anywhere.
    """
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v57_customer")
    return spark.sql("""
        SELECT c_nationkey, COUNT(*) AS n_above
        FROM v57_customer c
        WHERE CAST(c_acctbal AS DECIMAL(18,2))
              * (SELECT COUNT(*) FROM v57_customer c2
                 WHERE c2.c_nationkey = c.c_nationkey)
              > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                 FROM v57_customer c2
                 WHERE c2.c_nationkey = c.c_nationkey)
        GROUP BY c_nationkey
    """)


_Q57_SQL = """
SELECT c_nationkey, COUNT(*) AS n_above
FROM customer c
WHERE CAST(c_acctbal AS DECIMAL(18,2))
      * (SELECT COUNT(*) FROM customer c2
         WHERE c2.c_nationkey = c.c_nationkey)
      > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2)))
         FROM customer c2
         WHERE c2.c_nationkey = c.c_nationkey)
GROUP BY c_nationkey
"""


# --- q58: CUBE grouping ---------------------------------------------------------

def q58_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day-of-week): all 4 grouping combinations in
    one scan via the Expand operator (like q45's ROLLUP but the full
    power set). grouping() disambiguates NULL-as-subtotal from NULL data.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select("event_type", F.dayofweek("ts").alias("dow"),
                     F.floor(F.col("value") * F.lit(1000.0)).cast("long").alias("xq"))
    return (base.cube("event_type", "dow")
            .agg(F.count("*").alias("n"),
                 F.sum("xq").alias("sum_xq"),
                 F.grouping("event_type").alias("g_type"),
                 F.grouping("dow").alias("g_dow")))


_Q58_SQL = """
SELECT event_type, dow, COUNT(*) AS n, CAST(SUM(xq) AS BIGINT) AS sum_xq,
  GROUPING(event_type) AS g_type, GROUPING(dow) AS g_dow
FROM (SELECT event_type, dayofweek(ts) + 1 AS dow,
             CAST(FLOOR(value * 1000.0) AS BIGINT) AS xq
      FROM events)
GROUP BY CUBE(event_type, dow)
"""


register(QuerySpec("q57_correlated_scalar_subquery", q57_correlated_scalar_subquery,
                   _Q57_SQL,
                   description="correlated scalar subqueries, decimal-exact avg comparison"))
register(QuerySpec("q58_cube", q58_cube, _Q58_SQL,
                   description="CUBE power-set grouping with GROUPING() disambiguation"))


# --- q62: explicit GROUPING SETS ------------------------------------------------

def q62_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-picked GROUPING SETS — (type), (user decile), and grand total,
    skipping the cross combination a CUBE would also compute. One scan,
    one Expand: the cheap way to serve several dashboard granularities
    from a single shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type", (F.col("user_id") % 10).alias("user_decile"),
        F.floor(F.col("value") * F.lit(1000.0)).cast("long").alias("xq"))
    base.createOrReplaceTempView("v62_events")
    return spark.sql("""
        SELECT event_type, user_decile, COUNT(*) AS n, SUM(xq) AS sum_xq
        FROM v62_events
        GROUP BY GROUPING SETS ((event_type), (user_decile), ())
    """)


_Q62_SQL = """
SELECT event_type, user_decile, COUNT(*) AS n, CAST(SUM(xq) AS BIGINT) AS sum_xq
FROM (SELECT event_type, user_id % 10 AS user_decile,
             CAST(FLOOR(value * 1000.0) AS BIGINT) AS xq
      FROM events)
GROUP BY GROUPING SETS ((event_type), (user_decile), ())
"""


register(QuerySpec("q62_grouping_sets", q62_grouping_sets, _Q62_SQL,
                   description="explicit GROUPING SETS (partial power set, one Expand)"))


# --- q65: MAD-based robust anomaly detection ----------------------------------

def q65_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type anomaly counts: |x − median| > 3·MAD.

    Median and MAD are rank-defined LOWER medians (row_number pick of an
    existing value, q27's engine-agnostic discipline) so no
    interpolation rule can drift between engines; the 3·MAD threshold
    compares correctly-rounded doubles built from identical operands.
    NULL-free by fixture contract; a production run would pre-filter.

    Scale shape (r8 audit fix): both medians previously ranked via
    ``row_number() OVER (PARTITION BY event_type)`` — ~5 distinct
    values, so ~5 reducers sorted the full events table TWICE per
    query. Both ranks now run on the two-phase binned rank
    (functions/ranks.py): windows partitioned on (type, value-bin),
    per-group counts from the bounded histogram, broadcast offset
    joins. Driver scalars: the two min/max pairs sizing the bins.
    """
    from downscaledclimatedata_spark.functions.ranks import (
        binned_row_number, value_bin)

    ev = _t(spark, sf_dir, "events")
    base = ev.select("event_type", "value", "event_id")
    st = base.agg(F.min("value"), F.max("value")).first()
    lo, hi = float(st[0] or 0), float(st[1] or 0)
    ranked = binned_row_number(
        base.withColumn("_vbin", value_bin(F.col("value"), lo, hi)),
        "_vbin", ("value", "event_id"),
        partition_cols=("event_type",), out="rn", count_col="cnt")
    med = (ranked.filter(F.col("rn") == F.floor((F.col("cnt") + 1) / 2))
           .select("event_type", F.col("value").alias("med")))
    dev = (ev.join(F.broadcast(med), "event_type")
           .select("event_type", "value", "event_id", "med",
                   F.abs(F.col("value") - F.col("med")).alias("adev")))
    st2 = dev.agg(F.min("adev"), F.max("adev")).first()
    lo2, hi2 = float(st2[0] or 0), float(st2[1] or 0)
    ranked2 = binned_row_number(
        dev.withColumn("_abin", value_bin(F.col("adev"), lo2, hi2)),
        "_abin", ("adev", "event_id"),
        partition_cols=("event_type",), out="rn", count_col="cnt")
    mad = (ranked2.filter(F.col("rn") == F.floor((F.col("cnt") + 1) / 2))
           .select("event_type", F.col("adev").alias("mad")))
    flagged = (dev.join(F.broadcast(mad), "event_type")
               .withColumn("is_anom",
                           F.col("adev") > F.lit(3.0) * F.col("mad")))
    return (flagged.groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.max("med").alias("med"), F.max("mad").alias("mad"),
                 F.sum(F.col("is_anom").cast("bigint"))
                 .alias("n_anomalies")))


_Q65_SQL = """
WITH ranked AS (
  SELECT event_type, value, event_id,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
    COUNT(*) OVER (PARTITION BY event_type) AS cnt
  FROM events
), med AS (
  SELECT event_type, value AS med FROM ranked WHERE rn = (cnt + 1) // 2
), dev AS (
  SELECT e.event_type, e.value, e.event_id, m.med,
    abs(e.value - m.med) AS adev
  FROM events e JOIN med m USING (event_type)
), ranked2 AS (
  SELECT event_type, adev,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY adev, event_id) AS rn,
    COUNT(*) OVER (PARTITION BY event_type) AS cnt
  FROM dev
), mad AS (
  SELECT event_type, adev AS mad FROM ranked2 WHERE rn = (cnt + 1) // 2
)
SELECT d.event_type, COUNT(*) AS n_events,
  MAX(d.med) AS med, MAX(x.mad) AS mad,
  CAST(SUM(CASE WHEN d.adev > 3.0 * x.mad THEN 1 ELSE 0 END) AS BIGINT)
    AS n_anomalies
FROM dev d JOIN mad x USING (event_type)
GROUP BY d.event_type
"""

register(QuerySpec("q65_anomaly_mad", q65_anomaly_mad, _Q65_SQL,
                   description="robust anomaly counts per event type: "
                               "rank-defined median + MAD, 3-sigma-"
                               "equivalent threshold, no interpolation "
                               "drift"))


# --- q66: ordered conversion funnel -------------------------------------------

_FUNNEL = ("view", "click", "signup", "purchase")


def q66_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose FIRST view precedes their first
    click precedes their first signup precedes their first purchase —
    per-stage reached-user counts (the product-analytics staple).

    One conditional-aggregation pass per user (min ts per stage,
    map-side partial agg), then a single-row stage-count summary:
    stage k is reached iff every earlier first-timestamp exists and is
    strictly increasing. No joins, no window; shuffle is one groupBy
    on the uniform user id. Unpivoted via STACK so the output is
    (stage, stage_idx, n_users) rows in both engines.
    """
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(*[
        F.min(F.when(F.col("event_type") == s, F.col("ts")))
        .alias(f"t{i}") for i, s in enumerate(_FUNNEL)])
    reached = [F.col("t0").isNotNull()]
    for i in range(1, len(_FUNNEL)):
        reached.append(reached[i - 1] & F.col(f"t{i}").isNotNull()
                       & (F.col(f"t{i}") > F.col(f"t{i - 1}")))
    counts = firsts.agg(*[
        F.sum(r.cast("bigint")).alias(f"n{i}") for i, r in enumerate(reached)])
    stack = ", ".join(f"'{s}', {i}, n{i}" for i, s in enumerate(_FUNNEL))
    return counts.selectExpr(
        f"stack({len(_FUNNEL)}, {stack}) AS (stage, stage_idx, n_users)")


def _q66_sql() -> str:
    t_cols = ",\n    ".join(
        f"MIN(CASE WHEN event_type = '{s}' THEN ts END) AS t{i}"
        for i, s in enumerate(_FUNNEL))
    conds = ["t0 IS NOT NULL"]
    for i in range(1, len(_FUNNEL)):
        conds.append(f"({conds[i - 1]} AND t{i} IS NOT NULL"
                     f" AND t{i} > t{i - 1})")
    n_cols = ",\n    ".join(
        f"SUM(CASE WHEN {c} THEN 1 ELSE 0 END) AS n{i}"
        for i, c in enumerate(conds))
    rows = " UNION ALL ".join(
        f"SELECT '{s}' AS stage, {i} AS stage_idx,"
        f" CAST(n{i} AS BIGINT) AS n_users FROM counts"
        for i, s in enumerate(_FUNNEL))
    return f"""
WITH firsts AS (
  SELECT user_id,
    {t_cols}
  FROM events GROUP BY user_id
), counts AS (
  SELECT
    {n_cols}
  FROM firsts
)
{rows}
"""


register(QuerySpec("q66_conversion_funnel", q66_conversion_funnel, _q66_sql(),
                   description="ordered view->click->signup->purchase "
                               "funnel: per-stage reached-user counts in "
                               "one conditional-agg pass, no joins"))


# --- q67: weekly cohort retention ---------------------------------------------

def q67_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    counted in each subsequent week they return — the (cohort_week,
    week_offset, n_active, retention) matrix every growth dashboard
    draws.

    Weeks are epoch-day // 7 buckets (calendar-rule-free: DATE_TRUNC
    week boundaries differ between engines' locale defaults). Two
    aggregations: first-week per user (map-side partial min), then the
    distinct (user, week) activity relation joined back on the user id.
    Retention divides exact integer counts — bit-identical doubles.
    """
    ev = _t(spark, sf_dir, "events")
    week = (F.unix_timestamp("ts") / F.lit(86400 * 7)).cast("bigint")
    activity = (ev.select("user_id", week.alias("week")).distinct())
    first = activity.groupBy("user_id").agg(F.min("week").alias("cohort"))
    joined = (activity.join(first, "user_id")
              .select("user_id", "cohort",
                      (F.col("week") - F.col("cohort")).alias("offset")))
    sizes = first.groupBy("cohort").agg(
        F.countDistinct("user_id").alias("cohort_size"))
    cells = (joined.groupBy("cohort", "offset")
             .agg(F.countDistinct("user_id").alias("n_active")))
    return (cells.join(F.broadcast(sizes), "cohort")
            .select(F.col("cohort").cast("bigint").alias("cohort_week"),
                    F.col("offset").cast("bigint").alias("week_offset"),
                    F.col("n_active").cast("bigint").alias("n_active"),
                    F.col("cohort_size").cast("bigint").alias("cohort_size"),
                    (F.col("n_active").cast("double")
                     / F.col("cohort_size").cast("double"))
                    .alias("retention")))


_Q67_SQL = """
WITH activity AS (
  -- floor(), not //: DuckDB's // on DOUBLE/DECIMAL operands is not a
  -- floor division (epoch(ts) is DOUBLE with fractional seconds)
  SELECT DISTINCT user_id,
    CAST(floor(epoch(ts) / (86400 * 7)) AS BIGINT) AS week
  FROM events
), first AS (
  SELECT user_id, MIN(week) AS cohort FROM activity GROUP BY user_id
), sizes AS (
  SELECT cohort, COUNT(DISTINCT user_id) AS cohort_size
  FROM first GROUP BY cohort
), cells AS (
  SELECT f.cohort, a.week - f.cohort AS offset,
    COUNT(DISTINCT a.user_id) AS n_active
  FROM activity a JOIN first f USING (user_id)
  GROUP BY f.cohort, a.week - f.cohort
)
SELECT CAST(c.cohort AS BIGINT) AS cohort_week,
  CAST(c.offset AS BIGINT) AS week_offset,
  CAST(c.n_active AS BIGINT) AS n_active,
  CAST(s.cohort_size AS BIGINT) AS cohort_size,
  CAST(c.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE) AS retention
FROM cells c JOIN sizes s USING (cohort)
"""

register(QuerySpec("q67_cohort_retention", q67_cohort_retention, _Q67_SQL,
                   description="weekly cohort retention matrix: epoch-"
                               "week buckets (calendar-rule-free), "
                               "distinct activity relation, broadcast "
                               "cohort sizes"))


# --- q68: conversion-lag distribution -----------------------------------------

LAG_BUCKET_HOURS = 24


def q68_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of first-view -> first-purchase lag in 24 h buckets:
    how long conversion takes, the companion readout to q66's funnel.

    One conditional first-timestamp aggregation per user (no joins),
    lag bucket = floor(seconds/86400/…) on exact integer epoch seconds
    (unix_timestamp truncates to seconds in Spark; the oracle floors
    epoch() the same way — fractional-second truncation cannot move a
    bucket boundary, same argument as q67's weeks)."""
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view",
                     F.unix_timestamp("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase",
                     F.unix_timestamp("ts"))).alias("t_buy"))
    lagged = (firsts
              .filter(F.col("t_view").isNotNull()
                      & F.col("t_buy").isNotNull()
                      & (F.col("t_buy") > F.col("t_view")))
              .select(F.floor((F.col("t_buy") - F.col("t_view"))
                              / F.lit(86400 * LAG_BUCKET_HOURS // 24))
                      .cast("bigint").alias("lag_days")))
    return (lagged.groupBy("lag_days")
            .agg(F.count("*").alias("n_users")))


_Q68_SQL = """
WITH firsts AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'view'
             THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS t_view,
    MIN(CASE WHEN event_type = 'purchase'
             THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS t_buy
  FROM events GROUP BY user_id
)
SELECT CAST(floor((t_buy - t_view) / 86400.0) AS BIGINT) AS lag_days,
  COUNT(*) AS n_users
FROM firsts
WHERE t_view IS NOT NULL AND t_buy IS NOT NULL AND t_buy > t_view
GROUP BY 1
"""

register(QuerySpec("q68_conversion_lag", q68_conversion_lag, _Q68_SQL,
                   description="first-view -> first-purchase lag "
                               "histogram in day buckets, one "
                               "conditional-agg pass"))


# --- q69: rolling 7-day active users ------------------------------------------

WAU_WINDOW_DAYS = 7


def q69_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day (WAU) — the rolling-
    DISTINCT aggregate window frames cannot express (COUNT(DISTINCT)
    OVER a frame is unsupported in both engines for good reason: frame
    state isn't mergeable).

    The scale rewrite: each (user, day) activity contributes to the 7
    window-end days it falls inside, so EXPLODE the contribution range
    and count distinct users per window end — a bounded ×7 fan-out of
    the (already deduped) activity relation, shuffled once on the day
    key, instead of re-scanning a frame per day. Day buckets are exact
    integer epoch-days (q67's calendar-free discipline); window ends
    past the observed range are trimmed.
    """
    ev = _t(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp("ts") / F.lit(86400)).cast("bigint")
    activity = ev.select("user_id", day.alias("day")).distinct()
    max_day = activity.agg(F.max("day").alias("mx"))
    contrib = (activity.select(
        "user_id",
        F.explode(F.sequence(
            F.col("day"),
            F.col("day") + F.lit(WAU_WINDOW_DAYS - 1))).alias("win_day")))
    return (contrib.crossJoin(F.broadcast(max_day))
            .filter(F.col("win_day") <= F.col("mx"))
            .groupBy("win_day")
            .agg(F.countDistinct("user_id").alias("wau")))


_Q69_SQL = f"""
WITH activity AS (
  SELECT DISTINCT user_id,
    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
), mx AS (SELECT MAX(day) AS mx FROM activity),
contrib AS (
  SELECT user_id, day + d.i AS win_day
  FROM activity, LATERAL (
    SELECT UNNEST(range(0, {WAU_WINDOW_DAYS})) AS i) d
)
SELECT win_day, COUNT(DISTINCT user_id) AS wau
FROM contrib CROSS JOIN mx
WHERE win_day <= mx
GROUP BY win_day
"""

register(QuerySpec("q69_rolling_active_users", q69_rolling_active_users,
                   _Q69_SQL,
                   description="trailing-7-day distinct active users via "
                               "contribution explode — the rolling-"
                               "DISTINCT rewrite window frames cannot "
                               "express"))


# --- q70: Markov transition matrix over per-user event sequences ---------------

def q70_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for every
    ordered (from_type -> to_type) pair of consecutive events in a
    user's timeline, the transition count and the row-normalized
    probability — the session-model input of next-event prediction and
    anomaly scoring.

    One window (per-user lag over (ts, event_id) — the id tiebreak
    makes same-timestamp order deterministic in both engines), one
    groupBy on the (from, to) pair, and the normalizing row totals come
    from a second tiny aggregate broadcast back in. Probabilities
    divide exact counts, so the doubles are bit-identical.

    Scale: the window shuffles once on the uniform user id; the pair
    aggregate shuffles |event_types|² rows at most after map-side
    combine. No self-join of the event stream.
    """
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.select("user_id", "ts", "event_id", "event_type")
             .withColumn("from_type", F.lag("event_type").over(w))
             .filter(F.col("from_type").isNotNull())
             .groupBy("from_type", F.col("event_type").alias("to_type"))
             .agg(F.count(F.lit(1)).alias("n_transitions")))
    totals = (pairs.groupBy("from_type")
              .agg(F.sum("n_transitions").alias("n_from")))
    return (pairs.join(F.broadcast(totals), "from_type")
            .select("from_type", "to_type",
                    F.col("n_transitions").cast("bigint")
                    .alias("n_transitions"),
                    (F.col("n_transitions").cast("double")
                     / F.col("n_from").cast("double")).alias("p"))
            .orderBy("from_type", "to_type"))


_Q70_SQL = """
WITH ordered AS (
  SELECT user_id, event_type,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS from_type
  FROM events
), pairs AS (
  SELECT from_type, event_type AS to_type, COUNT(*) AS n_transitions
  FROM ordered WHERE from_type IS NOT NULL
  GROUP BY from_type, to_type
), totals AS (
  SELECT from_type, SUM(n_transitions) AS n_from FROM pairs GROUP BY from_type
)
SELECT p.from_type, p.to_type,
  CAST(p.n_transitions AS BIGINT) AS n_transitions,
  CAST(p.n_transitions AS DOUBLE) / CAST(t.n_from AS DOUBLE) AS p
FROM pairs p JOIN totals t USING (from_type)
ORDER BY p.from_type, p.to_type
"""

register(QuerySpec("q70_markov_transitions", q70_markov_transitions, _Q70_SQL,
                   description="first-order Markov transition matrix over "
                               "per-user event sequences: lag window + "
                               "pair counts + broadcast row "
                               "normalization"))


# --- q71: trimmed mean per group (robust aggregate) ----------------------------

def q71_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust mean: drop values outside the group's
    [p10, p90] band, then average the survivors — the outlier-resistant
    aggregate monitoring pipelines use where a raw mean is one fat
    finger away from useless.

    Exactness discipline: the band edges come from exact interpolated
    percentiles (quantile_cont's formula over exact order statistics,
    broadcast back); the surviving values are summed as
    ROUND(value*100) BIGINTs — cents, not doubles — so the sum is
    order-independent and the final mean (int_sum / 100 / n) is
    bit-identical cross-engine. An ulp of interpolation drift cannot
    flip the >=/<= band comparisons: the interpolated edge lies in the
    closed interval of two ADJACENT order statistics, where no data
    value exists (functions/ranks.py).

    Scale shape (r8 audit fix): ``percentile()``'s aggregation buffer
    holds per-distinct-value state — ~N/|groups| doubles per reducer on
    a high-cardinality double column. The band edges now come from
    :func:`grouped_quantile_cont` (functions/ranks.py): binned
    two-phase ranks (parallelism ∝ bins) + in-plan interpolation from
    the ≤2 order statistics per quantile.
    """
    from downscaledclimatedata_spark.functions.ranks import (
        grouped_quantile_cont)

    ev = _t(spark, sf_dir, "events")
    bands = grouped_quantile_cont(
        ev, "value", [(0.1, "lo"), (0.9, "hi")],
        group_cols=("event_type",), id_cols=("event_id",),
        count_name="n_total")
    kept = (ev.join(F.broadcast(bands), "event_type")
            .filter((F.col("value") >= F.col("lo"))
                    & (F.col("value") <= F.col("hi"))))
    return (kept.groupBy("event_type")
            .agg(F.sum(F.round(F.col("value") * 100).cast("bigint"))
                 .alias("cents"),
                 F.count(F.lit(1)).alias("n_kept"),
                 F.max("n_total").alias("n_total"))
            .select("event_type",
                    F.col("n_total").cast("bigint").alias("n_total"),
                    F.col("n_kept").cast("bigint").alias("n_kept"),
                    (F.col("cents").cast("double") / 100.0
                     / F.col("n_kept").cast("double")).alias("trimmed_mean"))
            .orderBy("event_type"))


_Q71_SQL = """
WITH bands AS (
  SELECT event_type,
    quantile_cont(value, 0.1) AS lo,
    quantile_cont(value, 0.9) AS hi,
    COUNT(*) AS n_total
  FROM events GROUP BY event_type
), kept AS (
  SELECT e.event_type, e.value, b.n_total
  FROM events e JOIN bands b USING (event_type)
  WHERE e.value >= b.lo AND e.value <= b.hi
)
SELECT event_type,
  CAST(MAX(n_total) AS BIGINT) AS n_total,
  CAST(COUNT(*) AS BIGINT) AS n_kept,
  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
    / CAST(COUNT(*) AS DOUBLE) AS trimmed_mean
FROM kept GROUP BY event_type
ORDER BY event_type
"""

register(QuerySpec("q71_trimmed_mean", q71_trimmed_mean, _Q71_SQL,
                   description="per-group [p10,p90] trimmed mean: "
                               "broadcast percentile bands + exact "
                               "integer-cents survivor sums"))


# --- q72: top user journeys (ordered event-type paths) -------------------------

PATH_TOP_N = 20


def q72_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common user journeys: each user's full event-type sequence
    (deterministically ordered by (ts, event_id)) rendered as a path
    string, counted, top-N by frequency — the "what do people actually
    do" query of product analytics.

    Order inside a group is the classic correctness trap:
    ``collect_list`` under groupBy is partition-order-dependent, so the
    sequence is built as ``array_sort`` over (ts, event_id, type)
    structs — deterministic under ANY partitioning — then projected to
    the type path. One user-keyed shuffle + a top-N TakeOrdered.
    """
    ev = _t(spark, sf_dir, "events")
    paths = (ev.groupBy("user_id")
             .agg(F.array_sort(F.collect_list(F.struct(
                 F.col("ts"), F.col("event_id"), F.col("event_type"))))
                 .alias("seq"))
             .select(F.concat_ws(
                 ">", F.transform(F.col("seq"), lambda s: s["event_type"]))
                 .alias("path")))
    return (paths.groupBy("path")
            .agg(F.count(F.lit(1)).alias("n_users"))
            .orderBy(F.col("n_users").desc(), "path")
            .limit(PATH_TOP_N))


_Q72_SQL = f"""
WITH seqs AS (
  SELECT user_id,
    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM events GROUP BY user_id
)
SELECT path, COUNT(*) AS n_users
FROM seqs GROUP BY path
ORDER BY n_users DESC, path
LIMIT {PATH_TOP_N}
"""

register(QuerySpec("q72_top_paths", q72_top_paths, _Q72_SQL,
                   description="top-N user journeys: deterministic "
                               "(ts, event_id)-ordered event-type path "
                               "strings, counted"))


# --- q73: group-median null imputation (data repair) ---------------------------

def q73_median_imputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null repair by group median: rows with a (deterministically
    simulated) missing value get their event_type's exact median of the
    observed values — the data-cleaning primitive of feature pipelines,
    preferred over the mean precisely because it ignores the outliers
    the rows being repaired often are.

    Medians are a bounded per-group relation broadcast back — the fact
    table is never shuffled for the repair join (broadcast hash join on
    the low-cardinality type), so the repair is a projection at any
    scale.

    Scale shape (r8 audit fix): the exact medians come from
    :func:`grouped_quantile_cont` (binned two-phase ranks + in-plan
    interpolation) instead of ``percentile()``'s per-distinct-value
    aggregation buffer; and the trailing corpus-sized ``orderBy`` is
    gone — the output contract is a relation, not an ordering, and the
    driver's hash is order-insensitive.
    """
    from downscaledclimatedata_spark.functions.ranks import (
        grouped_quantile_cont)

    ev = _t(spark, sf_dir, "events")
    missing = F.col("event_id") % 13 == 0
    masked = ev.withColumn(
        "v", F.when(missing, F.lit(None).cast("double"))
        .otherwise(F.col("value")))
    med = grouped_quantile_cont(
        masked, "v", [(0.5, "med")],
        group_cols=("event_type",), id_cols=("event_id",))
    return (masked.join(F.broadcast(med), "event_type")
            .select("event_id", "event_type",
                    F.coalesce(F.col("v"), F.col("med"))
                    .alias("value_imputed"),
                    F.col("v").isNull().alias("was_imputed")))


_Q73_SQL = """
WITH masked AS (
  SELECT event_id, event_type,
    CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS v
  FROM events
), med AS (
  SELECT event_type, quantile_cont(v, 0.5) AS med
  FROM masked GROUP BY event_type
)
SELECT m.event_id, m.event_type,
  coalesce(m.v, d.med) AS value_imputed,
  m.v IS NULL AS was_imputed
FROM masked m JOIN med d USING (event_type)
"""

register(QuerySpec("q73_median_imputation", q73_median_imputation, _Q73_SQL,
                   description="group-median null repair: broadcast exact "
                               "medians, fact table never shuffles"))


# --- q74: conversion attribution (first/last touch) ----------------------------

def q74_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch and last-touch attribution: every purchase credits
    (a) the user's earliest preceding touch (view/click) and (b) the
    latest one — the two bookends every marketing-attribution model
    interpolates between. Output: per (model, touch_type) attributed
    purchase counts.

    One per-user window pass ordered by (ts, event_id): running FIRST
    touch via an unbounded-preceding min-struct, running LAST touch via
    a lag-to-current max-struct — both computed as conditional
    min/max over struct(ts, event_id, type) so the credited touch is
    deterministic under ties. Purchases with no preceding touch fall
    out (reported as they are in every attribution tool: 'direct').
    """
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    touch = F.when(F.col("event_type").isin("view", "click"),
                   F.struct("ts", "event_id",
                            F.col("event_type").alias("tt")))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    attributed = (ev
                  .withColumn("first_touch", F.min(touch).over(w))
                  .withColumn("last_touch", F.max(touch).over(w))
                  .filter(F.col("event_type") == "purchase"))
    first = (attributed.select(
        F.lit("first_touch").alias("model"),
        F.coalesce(F.col("first_touch.tt"), F.lit("direct"))
        .alias("touch_type")))
    last = (attributed.select(
        F.lit("last_touch").alias("model"),
        F.coalesce(F.col("last_touch.tt"), F.lit("direct"))
        .alias("touch_type")))
    return (first.unionAll(last)
            .groupBy("model", "touch_type")
            .agg(F.count(F.lit(1)).alias("n_purchases"))
            .orderBy("model", "touch_type"))


_Q74_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN event_type IN ('view', 'click')
         THEN struct_pack(ts := ts, event_id := event_id,
                          tt := event_type) END AS touch
  FROM events
), scanned AS (
  SELECT user_id, ts, event_id, event_type,
    MIN(touch) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch,
    MAX(touch) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
  FROM marked
), purchases AS (
  SELECT * FROM scanned WHERE event_type = 'purchase'
), credited AS (
  SELECT 'first_touch' AS model,
    coalesce(first_touch.tt, 'direct') AS touch_type FROM purchases
  UNION ALL
  SELECT 'last_touch', coalesce(last_touch.tt, 'direct') FROM purchases
)
SELECT model, touch_type, COUNT(*) AS n_purchases
FROM credited GROUP BY model, touch_type
ORDER BY model, touch_type
"""

register(QuerySpec("q74_attribution", q74_attribution, _Q74_SQL,
                   description="first/last-touch purchase attribution via "
                               "one per-user window pass with struct "
                               "min/max bookends"))


# --- q75: daily trending terms --------------------------------------------------

TREND_TOP_N = 3


def q75_trending_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-types per day by count ACCELERATION: each day's count
    vs the same type's previous-day count, ranked by exact integer
    delta — the trending dashboard primitive (what's rising today),
    expressed without any float smoothing so both engines agree to the
    bit.

    One day×type aggregate (map-side combined), a type-partitioned lag,
    and a day-partitioned top-N window — all keyed on low-cardinality
    columns after the first aggregate, so the corpus-sized shuffle
    happens exactly once.
    """
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    daily = (ev.select(
        F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("day"),
        "event_type")
        .groupBy("day", "event_type").agg(F.count(F.lit(1)).alias("n")))
    lagw = Window.partitionBy("event_type").orderBy("day")
    with_delta = (daily
                  .withColumn("prev_n",
                              F.coalesce(F.lag("n").over(lagw), F.lit(0)))
                  .withColumn("delta", F.col("n") - F.col("prev_n")))
    rankw = Window.partitionBy("day").orderBy(
        F.col("delta").desc(), "event_type")
    return (with_delta.withColumn("rnk", F.row_number().over(rankw))
            .filter(F.col("rnk") <= TREND_TOP_N)
            .select("day", F.col("rnk").cast("int").alias("rnk"),
                    "event_type",
                    F.col("n").cast("bigint").alias("n"),
                    F.col("prev_n").cast("bigint").alias("prev_n"),
                    F.col("delta").cast("bigint").alias("delta"))
            .orderBy("day", "rnk"))


_Q75_SQL = f"""
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, event_type,
    COUNT(*) AS n
  FROM events GROUP BY day, event_type
), with_delta AS (
  SELECT day, event_type, n,
    coalesce(LAG(n) OVER (PARTITION BY event_type ORDER BY day), 0) AS prev_n
  FROM daily
), ranked AS (
  SELECT day, event_type, n, prev_n, n - prev_n AS delta,
    ROW_NUMBER() OVER (PARTITION BY day
      ORDER BY n - prev_n DESC, event_type) AS rnk
  FROM with_delta
)
SELECT day, CAST(rnk AS INTEGER) AS rnk, event_type,
  CAST(n AS BIGINT) AS n, CAST(prev_n AS BIGINT) AS prev_n,
  CAST(delta AS BIGINT) AS delta
FROM ranked WHERE rnk <= {TREND_TOP_N}
ORDER BY day, rnk
"""

register(QuerySpec("q75_trending_terms", q75_trending_terms, _Q75_SQL,
                   description="daily trending event types by exact count "
                               "acceleration: one corpus shuffle, then "
                               "low-cardinality windows"))


# --- q77: type-2 slowly-changing dimension from the event change-log ---------

SCD2_USER_MOD = 17  # deterministic 1/17 user sample bounds the output grain


def q77_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a type-2 slowly-changing dimension from the events stream:
    each user's activity-state history as versioned rows with
    ``[effective_from, effective_to)`` validity and an ``is_current``
    flag — the CDC-log -> warehouse-dimension build every nightly
    pipeline runs.

    Islands-and-gaps: per user ordered by (ts, event_id) — the
    deterministic total order under duplicate timestamps — a lag()
    marks rows where the state (event_type) CHANGES; consecutive runs
    of the same state collapse into one version. A lead() over the
    surviving version-start rows closes each interval; the last version
    stays open (effective_to NULL, is_current true).

    Scale: both windows partition by user_id — parallelism follows the
    user population, no low-cardinality partitions. The run-collapse
    filter drops most rows BEFORE the second window, so the lead pass
    scans only version boundaries. The output keeps the version-row
    grain for a deterministic 1/17 md5 user sample (mirrored in the
    oracle); the predicate on the partition key pushes below both
    windows, so sampled users never compute unsampled histories.
    """
    return (_scd2_versions(spark, sf_dir)
            .select("user_id", "version_no", "state", "effective_from",
                    "effective_to",
                    F.col("effective_to").isNull().alias("is_current")))
    # no trailing orderBy: one row per (user, version) — user-keyed,
    # corpus-proportional; a global sort here is pure shuffle tax


def _scd2_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared SCD2 version relation (the q77 build, unsorted): one row
    per (user, state run) with [effective_from, effective_to)."""
    ev = _t(spark, sf_dir, "events").filter(
        md5_long(F.col("user_id").cast("string"), "scd2") % SCD2_USER_MOD == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (ev
               .withColumn("prev_state", F.lag("event_type").over(w))
               .filter(F.col("prev_state").isNull()
                       | (F.col("prev_state") != F.col("event_type"))))
    wv = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (changed
            .withColumn("version_no",
                        F.row_number().over(wv).cast("int"))
            .withColumn("effective_to", F.lead("ts").over(wv))
            .select("user_id", "version_no",
                    F.col("event_type").alias("state"),
                    F.col("ts").alias("effective_from"),
                    "effective_to"))


_Q77_SQL = f"""
WITH sampled AS (
  SELECT * FROM events
  WHERE {md5_long_sql("CAST(user_id AS VARCHAR)", "scd2")} % {SCD2_USER_MOD} = 0
), marked AS (
  SELECT user_id, ts, event_id, event_type,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev_state
  FROM sampled
), starts AS (
  SELECT user_id, ts, event_id, event_type FROM marked
  WHERE prev_state IS NULL OR prev_state <> event_type
), versioned AS (
  SELECT user_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS INTEGER) AS version_no,
    event_type AS state,
    ts AS effective_from,
    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS effective_to
  FROM starts
)
SELECT user_id, version_no, state, effective_from, effective_to,
  effective_to IS NULL AS is_current
FROM versioned
ORDER BY user_id, version_no
"""

register(QuerySpec("q77_scd2_history", q77_scd2_history, _Q77_SQL,
                   description="type-2 SCD build from the event change-log: "
                               "run-collapse + interval close, all windows "
                               "user-keyed"))


# --- q80: sequential pattern matching (MATCH_RECOGNIZE emulation) ------------

# Patterns are written against the SPACE-JOINED symbol string ('v c p'),
# so adjacency is 'c p' and runs are 'v v v'; all four are non-vacuous
# on the sf0.01 sample (138/60/20/150 users).
SEQ_PATTERNS = (
    ("click_to_buy", "c p"),             # purchase immediately after click
    ("view_binge", "v v v"),             # 3 consecutive views
    ("signup_first", "^s"),              # journey opens with signup
    ("error_recovered", "e( [vcs])* p"),  # error, then purchase with no
                                          # further error between
)


def q80_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern detection over per-user event journeys —
    SQL:2016 MATCH_RECOGNIZE semantics (which Spark lacks) emulated by
    the serialize-and-regex technique: each user's journey collapses
    to a symbol string ('v'iew 'c'lick 'p'urchase...) in deterministic
    (ts, event_id) order, and each business pattern is a regex over
    that string. Output: per pattern, how many users match and their
    total journey length.

    Scale: ONE user-keyed shuffle builds the journey strings
    (array_sort(collect_list(struct)) — partition-order-independent,
    the q72 discipline); the regex pass is a shuffle-free projection;
    the final count is a patterns-cardinality aggregate. A journey
    string is bounded by events-per-user — the same bound any
    MATCH_RECOGNIZE engine needs to hold a user's match buffer.
    Patterns test against a space-joined symbol sequence, so
    multi-symbol regexes stay readable ('c p' = adjacency).
    """
    ev = _t(spark, sf_dir, "events")
    journeys = (ev.groupBy("user_id")
                .agg(F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type")))
                    .alias("seq"))
                .select("user_id",
                        F.concat_ws(" ", F.transform(
                            "seq", lambda s: F.substring(s["event_type"],
                                                         1, 1)))
                        .alias("journey"),
                        F.size("seq").alias("n_events")))
    per_pattern = [
        journeys.filter(F.col("journey").rlike(rx)).agg(
            F.lit(name).alias("pattern"),
            F.count(F.lit(1)).alias("n_users"),
            F.coalesce(F.sum("n_events"), F.lit(0)).alias("total_events"))
        for name, rx in SEQ_PATTERNS]
    out = per_pattern[0]
    for df in per_pattern[1:]:
        out = out.unionByName(df)
    return out.orderBy("pattern")


def _q80_sql() -> str:
    arms = "\n  UNION ALL ".join(
        f"SELECT '{name}' AS pattern, COUNT(*) AS n_users, "
        f"CAST(COALESCE(SUM(n_events), 0) AS BIGINT) AS total_events "
        f"FROM journeys WHERE regexp_matches(journey, '{rx}')"
        for name, rx in SEQ_PATTERNS)
    return f"""
WITH journeys AS (
  SELECT user_id,
    string_agg(substr(event_type, 1, 1), ' ' ORDER BY ts, event_id)
      AS journey,
    COUNT(*) AS n_events
  FROM events GROUP BY user_id
)
{arms}
ORDER BY pattern
"""


register(QuerySpec("q80_sequence_pattern", q80_sequence_pattern, _q80_sql(),
                   description="MATCH_RECOGNIZE emulation: journeys "
                               "serialized in deterministic order, business "
                               "patterns as regexes; one user-keyed "
                               "shuffle"))


# --- q81: Pareto frontier (skyline) via binned two-phase prefix scan ---------

SKY_BINS = 64  # price-bin fan-out for the distributed prefix max


def q81_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline: parts not STRICTLY dominated — no other part is both
    strictly cheaper and strictly larger (minimize retail price,
    maximize size). Classic catalog analytics ("show me the efficient
    frontier"), and in SQL engines the textbook NOT EXISTS self-join —
    O(N²) comparisons.

    The scalable form is a PREFIX SCAN: p is dominated iff
    max(size | price < p.price) > p.size, i.e. a running max over the
    price order. A naive ``Window.orderBy(price)`` is the
    single-partition trap (one task scans 100 TB); this plan reuses the
    engine's two-phase binned machinery (functions/ranks.py — here
    generalized from row_number to MAX): price values hash into
    SKY_BINS value bins; within each bin a bin-partitioned window
    takes the running max over a RANGE frame ending at -1 (strictly
    lower prices only — ties excluded by the frame, exactly the strict
    `<`); across bins the per-bin maxima form a <= SKY_BINS-row
    relation whose own prefix max broadcasts back. Parallelism ∝ bins,
    both phases exact.

    Ties: equal-price parts never dominate each other here (strict on
    both axes), and the RANGE frame — not ROWS — is what makes equal
    prices invisible to each other regardless of partition order.
    Sizes compare on the exact integer column; prices bin on exact
    cents.
    """
    part = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("bigint")
        .alias("price_cents"),
        F.col("p_size").cast("int").alias("size"))
    # value-binned by price rank-range: min/max bounds broadcast in-plan
    b = part.agg(F.min("price_cents").alias("lo"),
                 (F.max("price_cents") + 1).alias("hi")).filter(
        F.col("lo").isNotNull())
    binned = part.crossJoin(F.broadcast(b)).withColumn(
        "pbin",
        F.expr(f"CAST((price_cents - lo) * {SKY_BINS} DIV (hi - lo) AS INT)"))
    inw = (Window.partitionBy("pbin").orderBy("price_cents")
           .rangeBetween(Window.unboundedPreceding, -1))
    local = binned.withColumn("in_max", F.max("size").over(inw))
    bin_tops = (binned.groupBy("pbin")
                .agg(F.max("size").alias("bmax")))
    prefw = (Window.orderBy("pbin")
             .rowsBetween(Window.unboundedPreceding, -1))
    prefix = bin_tops.withColumn("pmax", F.max("bmax").over(prefw)) \
        .select("pbin", "pmax")
    dominated_by = F.greatest(F.coalesce(F.col("in_max"), F.lit(-1)),
                              F.coalesce(F.col("pmax"), F.lit(-1)))
    return (local.join(F.broadcast(prefix), "pbin", "left")
            .filter(dominated_by <= F.col("size"))
            .select("p_partkey", "price_cents", "size")
            .orderBy("price_cents", "p_partkey"))


_Q81_SQL = """
WITH p AS (
  SELECT p_partkey,
    CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
    CAST(p_size AS INTEGER) AS size
  FROM part
)
SELECT a.p_partkey, a.price_cents, a.size
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.price_cents < a.price_cents AND b.size > a.size)
ORDER BY a.price_cents, a.p_partkey
"""

register(QuerySpec("q81_pareto_frontier", q81_pareto_frontier, _Q81_SQL,
                   description="2-D skyline as a binned two-phase prefix "
                               "max (parallelism ∝ bins, strict domination "
                               "via RANGE -1 frames); oracle is the "
                               "O(N²) NOT EXISTS definition"))


# --- q82: RFM customer segmentation via exact rank quintiles -----------------

RFM_Q = 5  # quintile segmentation


def q82_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic CRM partition of the customer
    base by Recency (days since last order), Frequency (order count)
    and Monetary (lifetime revenue), each cut into exact rank
    quintiles, reported as the 5x5x5 segment grid with sizes and
    revenue.

    Quintiles are the scale hazard: ``ntile(5)`` over all customers is
    one task sorting the whole customer dimension. Here each metric's
    global rank comes from the shared two-phase binned machinery
    (functions/ranks.py): value-bin the metric (bounds from one
    bounded 6-value collect), per-bin row_number, broadcast histogram
    offsets — and the quintile is the pure-arithmetic
    ``(rank-1)*5 DIV n + 1``, which needs no percentile buffer and
    ties deterministically via (metric, custkey) ordering. Parallelism
    ∝ bins for all three metrics; the output is 5³-bounded.
    """
    from downscaledclimatedata_spark.functions.ranks import (
        binned_row_number, value_bin)

    orders = _t(spark, sf_dir, "orders")
    mx = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("mx"))
    cust = (orders.groupBy("o_custkey")
            .agg(F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
                 F.count(F.lit(1)).alias("frequency"),
                 F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                 .alias("cents"))
            .crossJoin(F.broadcast(mx))
            .select("o_custkey",
                    F.datediff("mx", "last_d").cast("bigint")
                    .alias("recency"),
                    F.col("frequency").cast("bigint").alias("frequency"),
                    "cents"))
    bounds = cust.agg(
        F.min("recency"), F.max("recency"), F.min("frequency"),
        F.max("frequency"), F.min("cents"), F.max("cents")).first()
    if bounds[0] is None:
        return (cust.select(
            F.col("recency").alias("r_seg"),
            F.col("frequency").alias("f_seg"),
            F.col("cents").alias("m_seg"),
            F.lit(0).alias("n_customers"),
            F.lit(0).alias("total_cents")).limit(0))

    def seg(df, metric, lo, hi, out):
        binned = df.withColumn("_vb", value_bin(F.col(metric),
                                                float(lo), float(hi)))
        ranked = binned_row_number(
            binned, "_vb", (F.col(metric), F.col("o_custkey")),
            out="_r", count_col="_n")
        return (ranked.withColumn(
            out, (F.expr(f"(_r - 1) * {RFM_Q} DIV _n") + 1).cast("int"))
            .drop("_vb", "_r", "_n"))

    cust = seg(cust, "recency", bounds[0], bounds[1], "r_seg")
    cust = seg(cust, "frequency", bounds[2], bounds[3], "f_seg")
    cust = seg(cust, "cents", bounds[4], bounds[5], "m_seg")
    return (cust.groupBy("r_seg", "f_seg", "m_seg")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.sum("cents").alias("total_cents"))
            .orderBy("r_seg", "f_seg", "m_seg"))


_Q82_SQL = f"""
WITH cust AS (
  SELECT o_custkey,
    date_diff('day', MAX(CAST(o_orderdate AS DATE)),
              (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders))
      AS recency,
    COUNT(*) AS frequency,
    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      AS cents
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT o_custkey, cents,
    CAST((ROW_NUMBER() OVER (ORDER BY recency, o_custkey) - 1)
         * {RFM_Q} // COUNT(*) OVER () + 1 AS INTEGER) AS r_seg,
    CAST((ROW_NUMBER() OVER (ORDER BY frequency, o_custkey) - 1)
         * {RFM_Q} // COUNT(*) OVER () + 1 AS INTEGER) AS f_seg,
    CAST((ROW_NUMBER() OVER (ORDER BY cents, o_custkey) - 1)
         * {RFM_Q} // COUNT(*) OVER () + 1 AS INTEGER) AS m_seg
  FROM cust
)
SELECT r_seg, f_seg, m_seg, COUNT(*) AS n_customers,
  CAST(SUM(cents) AS BIGINT) AS total_cents
FROM ranked GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""

register(QuerySpec("q82_rfm_segments", q82_rfm_segments, _Q82_SQL,
                   description="RFM quintile segmentation on the binned "
                               "two-phase rank — no ntile single-task "
                               "sort, 5^3-bounded output"))


# --- q83: market-basket association rules (support/confidence/lift) ----------

BASKET_MINSUP = 50  # minimum co-occurring orders for a reported pair


def q83_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order contents: for every
    pair of part brands bought together in one order, exact support,
    directional confidences and lift.

    Scale design (100 TB): the brand dimension is bounded (25 values),
    so the pair space is <= 300 rows no matter the fact size. ``part``
    is a dimension -> broadcast onto lineitem; the (order, brand)
    relation is distinct-reduced FIRST (one shuffle on its natural
    key), then localCheckpointed because THREE consumers fan out from
    it (total count, per-brand counts, the pair self-join). The pair
    self-join shuffles on l_orderkey with both sides corpus-sized —
    sort-merge, per-order fan-out bounded by the 25-brand dimension,
    never O(rows^2). Per-brand counts (<= 25 rows) broadcast back onto
    the pair relation. Ratios are exact-integer ppm via DECIMAL(38,0)
    multiply-then-DIV (bigint*1e6*bigint overflows at petabyte order
    counts; DECIMAL(38,0) does not), so every engine hashes the same
    bytes.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
          .select(F.col("l_orderkey").alias("okey"),
                  F.col("p_brand").alias("brand"))
          .distinct()
          .localCheckpoint(eager=False))
    n_orders = ob.select("okey").distinct().count()
    if n_orders == 0:
        return spark.createDataFrame(
            [], "brand_a string, brand_b string, n_pair bigint, "
                "n_a bigint, n_b bigint, support_ppm bigint, "
                "conf_a_b_ppm bigint, conf_b_a_ppm bigint, lift_ppm bigint")
    bc = ob.groupBy("brand").agg(F.count(F.lit(1)).alias("n_brand"))
    a = ob.select(F.col("okey"), F.col("brand").alias("brand_a"))
    b = ob.select(F.col("okey").alias("okey_b"),
                  F.col("brand").alias("brand_b"))
    pairs = (a.join(b, (a.okey == b.okey_b) & (F.col("brand_a") < F.col("brand_b")))
             .groupBy("brand_a", "brand_b")
             .agg(F.count(F.lit(1)).alias("n_pair"))
             .filter(F.col("n_pair") >= BASKET_MINSUP))
    pairs = (pairs
             .join(F.broadcast(bc.select(F.col("brand").alias("brand_a"),
                                         F.col("n_brand").alias("n_a"))),
                   "brand_a")
             .join(F.broadcast(bc.select(F.col("brand").alias("brand_b"),
                                         F.col("n_brand").alias("n_b"))),
                   "brand_b"))
    ppm = "CAST(CAST({num} AS DECIMAL(38,0)) * 1000000 DIV CAST({den} AS DECIMAL(38,0)) AS BIGINT)"
    return pairs.select(
        "brand_a", "brand_b", "n_pair", "n_a", "n_b",
        F.expr(ppm.format(num="n_pair", den=n_orders)).alias("support_ppm"),
        F.expr(ppm.format(num="n_pair", den="n_a")).alias("conf_a_b_ppm"),
        F.expr(ppm.format(num="n_pair", den="n_b")).alias("conf_b_a_ppm"),
        F.expr(ppm.format(num=f"CAST(n_pair AS DECIMAL(38,0)) * {n_orders}",
                          den="CAST(n_a AS DECIMAL(38,0)) * n_b"))
        .alias("lift_ppm"),
    ).orderBy("brand_a", "brand_b")


_Q83_SQL = f"""
WITH ob AS (
  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), tot AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM ob),
bc AS (SELECT brand, COUNT(*) AS n_brand FROM ob GROUP BY brand),
pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b,
         CAST(COUNT(*) AS BIGINT) AS n_pair
  FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
  GROUP BY 1, 2
  HAVING COUNT(*) >= {BASKET_MINSUP}
)
SELECT p.brand_a, p.brand_b, p.n_pair,
  CAST(ca.n_brand AS BIGINT) AS n_a, CAST(cb.n_brand AS BIGINT) AS n_b,
  CAST(CAST(p.n_pair AS HUGEINT) * 1000000 // t.n_orders AS BIGINT)
    AS support_ppm,
  CAST(CAST(p.n_pair AS HUGEINT) * 1000000 // ca.n_brand AS BIGINT)
    AS conf_a_b_ppm,
  CAST(CAST(p.n_pair AS HUGEINT) * 1000000 // cb.n_brand AS BIGINT)
    AS conf_b_a_ppm,
  CAST(CAST(p.n_pair AS HUGEINT) * t.n_orders * 1000000
       // (CAST(ca.n_brand AS HUGEINT) * cb.n_brand) AS BIGINT)
    AS lift_ppm
FROM pairs p
JOIN bc ca ON ca.brand = p.brand_a
JOIN bc cb ON cb.brand = p.brand_b
CROSS JOIN tot t
ORDER BY p.brand_a, p.brand_b
"""

register(QuerySpec("q83_basket_lift", q83_basket_lift, _Q83_SQL,
                   description="market-basket association rules: exact "
                               "support/confidence/lift ppm over the "
                               "bounded brand-pair grid; dimension "
                               "broadcast + one okey sort-merge self-join"))


def q84_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 autocorrelation of the daily event-count series — the
    seasonality diagnostic (a weekly cycle shows as a lag-7 peak) every
    time-series monitor computes.

    Plan shape: the corpus is touched ONCE (the daily-count partial
    aggregation); the ACF itself runs on the |days|-row series — a
    lag-k pairing is a self-equi-join on day+k after an explode over
    the 7 lags, NOT a lag() window (a global-order lag window would
    funnel the series through one task; the join keeps it keyed on
    day). Days are epoch-day buckets (calendar-rule-free, q67 idiom).

    Determinism: Pearson r is combined from exact integer power sums
    (counts are integers; every moment stays integer until the final
    division) — never the engines' own corr(). Zero-variance lags
    surface as NULL r rather than a divide error.
    """
    ev = _t(spark, sf_dir, "events")
    day = (F.unix_timestamp("ts") / F.lit(86400)).cast("bigint")
    daily = (ev.select(day.alias("day"))
             .groupBy("day").agg(F.count(F.lit(1)).alias("x")))
    lags = F.explode(F.array(*[F.lit(k) for k in range(1, 8)])).alias("lag")
    left = daily.select(lags, F.col("day"), F.col("x"))
    right = daily.select(F.col("day").alias("rday"), F.col("x").alias("y"))
    pairs = left.join(right, F.col("day") + F.col("lag") == F.col("rday"))
    d = lambda c: c.cast("decimal(38,0)")
    mom = (pairs.groupBy("lag")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(d(F.col("x"))).alias("sx"),
                F.sum(d(F.col("y"))).alias("sy"),
                F.sum(d(F.col("x")) * d(F.col("y"))).alias("sxy"),
                F.sum(d(F.col("x")) * d(F.col("x"))).alias("sxx"),
                F.sum(d(F.col("y")) * d(F.col("y"))).alias("syy")))
    num = d(F.col("n")) * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = d(F.col("n")) * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = d(F.col("n")) * F.col("syy") - F.col("sy") * F.col("sy")
    r = F.when((vx > 0) & (vy > 0),
               num.cast("double")
               / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))))
    return (mom.select(F.col("lag").cast("bigint").alias("lag"),
                       F.col("n").cast("bigint").alias("n_pairs"),
                       r.alias("acf"))
            .orderBy("lag"))


_Q84_SQL = """
WITH daily AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS x
  FROM events GROUP BY 1
), pairs AS (
  SELECT l.lag, a.x AS x, b.x AS y
  FROM daily a
  CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
  JOIN daily b ON b.day = a.day + l.lag
), mom AS (
  SELECT lag, count(*) AS n,
    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
    SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
    SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
    SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_pairs,
  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
       THEN CAST(n * sxy - sx * sy AS DOUBLE)
            / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
               * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
  END AS acf
FROM mom
ORDER BY lag
"""

register(QuerySpec("q84_autocorrelation", q84_autocorrelation, _Q84_SQL,
                   description="daily-series lag-1..7 autocorrelation: "
                               "one corpus pass to the |days|-row "
                               "series, lag pairing as a day-keyed "
                               "self-join (no global-order window), "
                               "Pearson r from exact integer moments"))


def q85_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test of an A/B split: users deterministically
    hash-split into two variants, conversion = the user ever purchased,
    pooled z-statistic + the |z| > 1.96 significance verdict — the
    experiment-analysis primitive.

    Determinism: the entire statistic is algebra over four exact
    integers (n1, c1, n2, c2). z^2 = (c1*n2 - c2*n1)^2 * N /
    (n1*n2*C*(N-C)) with C = c1+c2, N = n1+n2 — ONE division of two
    exact DECIMAL/HUGEINT products into DOUBLE, then an
    exactly-rounded sqrt and the c1*n2 vs c2*n1 sign. The engines'
    own float accumulation never enters. Degenerate splits (no users,
    all-or-none converted) surface NULL z rather than a divide error.

    Scale: one pass to the per-user (variant, converted) relation
    (map-side partial agg on user_id), then a 2-row aggregate; the
    corpus shuffles once on user_id.
    """
    ev = _t(spark, sf_dir, "events")
    users = (ev.groupBy("user_id")
             .agg(F.sum(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).alias("p"),
                  F.count(F.lit(1)).alias("ne"))
             # scale-free conversion: purchase SHARE > 20% (exact ints) —
             # an absolute count would saturate as events-per-user grows
             .select(md5_long(F.col("user_id").cast("string"),
                              seed="ab0").alias("h"),
                     F.when(F.col("p") * 5 > F.col("ne"), 1)
                     .otherwise(0).alias("converted")))
    per = (users.groupBy((F.col("h") % 2 == 0).alias("is_a"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("converted").alias("c")))
    a = per.filter(F.col("is_a")).select(
        F.col("n").alias("n1"), F.col("c").alias("c1"))
    b = per.filter(~F.col("is_a")).select(
        F.col("n").alias("n2"), F.col("c").alias("c2"))
    j = a.crossJoin(F.broadcast(b))
    d = lambda c: c.cast("decimal(38,0)")
    num = d(F.col("c1")) * d(F.col("n2")) - d(F.col("c2")) * d(F.col("n1"))
    C = d(F.col("c1")) + d(F.col("c2"))
    N = d(F.col("n1")) + d(F.col("n2"))
    den = d(F.col("n1")) * d(F.col("n2")) * C * (N - C)
    zsq = (num * num * N).cast("double") / den.cast("double")
    z = F.when(den > 0, F.signum(num.cast("double")) * F.sqrt(zsq))
    return j.select(
        F.col("n1").cast("bigint"), F.col("c1").cast("bigint"),
        F.col("n2").cast("bigint"), F.col("c2").cast("bigint"),
        z.alias("z"),
        F.coalesce(F.when(den > 0, F.abs(z) > 1.96), F.lit(False))
        .alias("significant"))


_Q85_SQL = f"""
WITH users AS (
  SELECT {md5_long_sql("CAST(user_id AS VARCHAR)", seed="ab0")} AS h,
    CASE WHEN 5 * sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              > count(*) THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY user_id
), per AS (
  SELECT h % 2 = 0 AS is_a, count(*) AS n, SUM(converted) AS c
  FROM users GROUP BY 1
), j AS (
  SELECT a.n AS n1, a.c AS c1, b.n AS n2, b.c AS c2
  FROM (SELECT n, c FROM per WHERE is_a) a
  CROSS JOIN (SELECT n, c FROM per WHERE NOT is_a) b
), alg AS (
  SELECT n1, c1, n2, c2,
    CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1 AS num,
    CAST(n1 AS HUGEINT) * n2 * (CAST(c1 AS HUGEINT) + c2)
      * (CAST(n1 AS HUGEINT) + n2 - c1 - c2) AS den,
    CAST(n1 AS HUGEINT) + n2 AS nn
  FROM j
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(c1 AS BIGINT) AS c1,
  CAST(n2 AS BIGINT) AS n2, CAST(c2 AS BIGINT) AS c2,
  CASE WHEN den > 0 THEN sign(CAST(num AS DOUBLE))
       * sqrt(CAST(num * num * nn AS DOUBLE) / CAST(den AS DOUBLE)) END AS z,
  coalesce(CASE WHEN den > 0 THEN
       sqrt(CAST(num * num * nn AS DOUBLE) / CAST(den AS DOUBLE)) > 1.96
       END, FALSE) AS significant
FROM alg
"""

register(QuerySpec("q85_ab_test", q85_ab_test, _Q85_SQL,
                   description="two-proportion z-test over a "
                               "deterministic hash split: statistic is "
                               "pure integer algebra with one final "
                               "division + sqrt, one user-keyed shuffle"))


def q86_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average event value (TWAP) — the standard
    correction when observations arrive at irregular intervals: each
    value is held until the user's NEXT event and weighted by how long
    it was in force, so a burst of identical readings cannot dominate
    the mean the way it does an arithmetic average.

    Plan shape: ONE window pass partitioned by user_id (high-cardinality
    uniform key — the safe window shape; contrast the q27 lesson on
    low-cardinality partitions) ordering by (ts, event_id) so duplicate
    timestamps — which the events edge suite plants — cannot make
    lead() nondeterministic. The last event per user has no holding
    interval and drops out, exactly as in the textbook estimator.

    Determinism: value is exact at 2 decimals, so each interval
    contributes cents * duration_us as a DECIMAL(38,0)/HUGEINT product —
    order-independent integer sums — and the final TWAP is ONE double
    division of two exact integers.
    """
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    iv = (ev.select(
            "user_id", "event_id",
            F.unix_micros("ts").alias("t_us"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"))
          .withColumn(
              "next_us",
              F.lead("t_us").over(
                  Window.partitionBy("user_id")
                  .orderBy("t_us", "event_id"))))
    d = lambda c: c.cast("decimal(38,0)")
    held = (iv.filter(F.col("next_us").isNotNull())
            .select("user_id",
                    (F.col("next_us") - F.col("t_us")).alias("dur_us"),
                    F.col("cents")))
    agg = (held.groupBy("user_id")
           .agg(F.count(F.lit(1)).alias("n_intervals"),
                F.sum(d(F.col("dur_us"))).alias("total_us"),
                F.sum(d(F.col("cents")) * d(F.col("dur_us")))
                .alias("cd_sum")))
    twap = F.when(
        F.col("total_us") > 0,
        F.col("cd_sum").cast("double")
        / (F.col("total_us") * F.lit(100)).cast("double"))
    return agg.select(F.col("user_id"),
                      F.col("n_intervals").cast("bigint")
                      .alias("n_intervals"),
                      F.col("total_us").cast("bigint").alias("total_us"),
                      twap.alias("twap"))
    # no trailing orderBy: one row per user — corpus-proportional


_Q86_SQL = """
WITH iv AS (
  SELECT user_id, event_id, epoch_us(ts) AS t_us,
    CAST(round(value * 100) AS BIGINT) AS cents,
    LEAD(epoch_us(ts)) OVER (
      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_us
  FROM events
), held AS (
  SELECT user_id, next_us - t_us AS dur_us, cents
  FROM iv WHERE next_us IS NOT NULL
), agg AS (
  SELECT user_id, count(*) AS n_intervals,
    SUM(CAST(dur_us AS HUGEINT)) AS total_us,
    SUM(CAST(cents AS HUGEINT) * CAST(dur_us AS HUGEINT)) AS cd_sum
  FROM held GROUP BY user_id
)
SELECT user_id, CAST(n_intervals AS BIGINT) AS n_intervals,
  CAST(total_us AS BIGINT) AS total_us,
  CASE WHEN total_us > 0
       THEN CAST(cd_sum AS DOUBLE) / CAST(total_us * 100 AS DOUBLE)
  END AS twap
FROM agg
ORDER BY user_id
"""

register(QuerySpec("q86_time_weighted_avg", q86_time_weighted_avg,
                   _Q86_SQL,
                   description="per-user time-weighted average value: "
                               "one high-cardinality-keyed window pass, "
                               "exact cents x micros integer mass, one "
                               "final double division"))


def q87_churn_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete purchase-count hazard and survival curve: for each order
    count n, how many customers placed AT LEAST n orders (at risk), how
    many stopped at exactly n (churned at n), the hazard
    churned/at_risk, and survival = P(a customer with >= 1 order
    reaches >= n). The lifecycle analysis behind every retention
    dashboard, computed WITHOUT Kaplan-Meier float products: because
    the time axis is discrete order counts, survival is the single
    exact division at_risk(n)/total — no cumulative product, hence
    nothing order-dependent to diverge cross-engine.

    Plan shape: one orders scan partial-aggregates to per-customer
    counts (high-cardinality key), a second aggregate collapses those
    to the |distinct order counts|-row histogram, and the reverse
    cumulative at-risk sum is a window over that BOUNDED histogram
    only — the same bounded-relation window discipline as
    functions/ranks.py offsets.
    """
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    per_cust = (orders.groupBy("o_custkey")
                .agg(F.count(F.lit(1)).alias("n_orders")))
    hist = (per_cust.groupBy("n_orders")
            .agg(F.count(F.lit(1)).alias("churned_at")))
    w = (Window.orderBy(F.col("n_orders").desc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wt = Window.rowsBetween(Window.unboundedPreceding,
                            Window.unboundedFollowing)
    curve = (hist
             .withColumn("at_risk", F.sum("churned_at").over(w))
             .withColumn("total", F.sum("churned_at").over(wt)))
    return (curve.select(
                F.col("n_orders").cast("bigint").alias("n_orders"),
                F.col("churned_at").cast("bigint").alias("churned_at"),
                F.col("at_risk").cast("bigint").alias("at_risk"),
                (F.col("churned_at").cast("double")
                 / F.col("at_risk").cast("double")).alias("hazard"),
                (F.col("at_risk").cast("double")
                 / F.col("total").cast("double")).alias("survival"))
            .orderBy("n_orders"))


_Q87_SQL = """
WITH per_cust AS (
  SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
), hist AS (
  SELECT n_orders, count(*) AS churned_at FROM per_cust GROUP BY n_orders
), curve AS (
  SELECT n_orders, churned_at,
    SUM(churned_at) OVER (ORDER BY n_orders DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS at_risk,
    SUM(churned_at) OVER () AS total
  FROM hist
)
SELECT CAST(n_orders AS BIGINT) AS n_orders,
  CAST(churned_at AS BIGINT) AS churned_at,
  CAST(at_risk AS BIGINT) AS at_risk,
  CAST(churned_at AS DOUBLE) / CAST(at_risk AS DOUBLE) AS hazard,
  CAST(at_risk AS DOUBLE) / CAST(total AS DOUBLE) AS survival
FROM curve
ORDER BY n_orders
"""

register(QuerySpec("q87_churn_hazard", q87_churn_hazard, _Q87_SQL,
                   description="discrete order-count hazard + survival "
                               "curve: two bounded aggregations, "
                               "reverse-cumulative window over the "
                               "histogram only, no float products"))


GINI_BIN_DIV = 1 << 24  # cents per rank bin: histogram stays tiny even
                        # at $10B-per-customer totals, and equal cents
                        # share a bin (the binned-rank contract)


def q88_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per market segment: the exact Gini
    coefficient of per-customer order revenue — the inequality metric
    behind "top 1% of customers drive X% of revenue" dashboards.

    Gini needs every customer's rank within its segment, which is the
    low-cardinality-window trap (5 segments = 5 reducers sorting all
    customers). The rank comes from the shared binned two-phase
    machinery instead: row_number windows partition on (segment,
    cents-bin) with broadcast cumulative offsets, so parallelism is
    ∝ bins. The statistic itself is the rank form
    G = (2*Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i), integer-exact until the
    single final division (x in cents, rank products in
    DECIMAL/HUGEINT); within a tie block the sum is permutation-
    invariant, so the custkey tie-break cannot move the answer — it
    only pins both engines to the same plan.
    """
    from downscaledclimatedata_spark.functions.ranks import (
        binned_row_number)

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    per = (orders.groupBy("o_custkey")
           .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                .alias("cents")))
    seg = (per.join(cust.select(F.col("c_custkey").alias("o_custkey"),
                                "c_mktsegment"), "o_custkey")
           .withColumn("_gbin", F.expr(f"cents div {GINI_BIN_DIV}")))
    ranked = binned_row_number(
        seg, "_gbin", order_cols=(F.col("cents"), F.col("o_custkey")),
        partition_cols=("c_mktsegment",), out="i", count_col="n")
    d = lambda c: c.cast("decimal(38,0)")
    agg = (ranked.groupBy("c_mktsegment")
           .agg(F.max("n").alias("n"),
                F.sum(d(F.col("cents"))).alias("sx"),
                F.sum(d(F.col("i")) * d(F.col("cents"))).alias("six")))
    gini = ((F.lit(2) * F.col("six")
             - (d(F.col("n")) + F.lit(1)) * F.col("sx")).cast("double")
            / (d(F.col("n")) * F.col("sx")).cast("double"))
    return (agg.select(
                F.col("c_mktsegment"),
                F.col("n").cast("bigint").alias("n_customers"),
                (F.col("sx").cast("double") / 100).alias("revenue"),
                F.when(F.col("sx") > 0, gini).alias("gini"))
            .orderBy("c_mktsegment"))


_Q88_SQL = """
WITH per AS (
  SELECT o_custkey,
    SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
), seg AS (
  SELECT p.o_custkey, p.cents, c.c_mktsegment
  FROM per p JOIN customer c ON c.c_custkey = p.o_custkey
), ranked AS (
  SELECT c_mktsegment, cents,
    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                       ORDER BY cents, o_custkey) AS i,
    COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM seg
), agg AS (
  SELECT c_mktsegment, MAX(n) AS n,
    SUM(CAST(cents AS HUGEINT)) AS sx,
    SUM(CAST(i AS HUGEINT) * CAST(cents AS HUGEINT)) AS six
  FROM ranked GROUP BY c_mktsegment
)
SELECT c_mktsegment, CAST(n AS BIGINT) AS n_customers,
  CAST(sx AS DOUBLE) / 100 AS revenue,
  CASE WHEN sx > 0 THEN
    CAST(2 * six - (n + 1) * sx AS DOUBLE) / CAST(n * sx AS DOUBLE)
  END AS gini
FROM agg
ORDER BY c_mktsegment
"""

register(QuerySpec("q88_gini_concentration", q88_gini_concentration,
                   _Q88_SQL,
                   description="exact Gini revenue concentration per "
                               "segment via the binned two-phase rank "
                               "(no 5-reducer segment windows), "
                               "integer-exact until one division"))


def q89_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users split into NEW (first-ever activity today) vs
    RETURNING — the growth-accounting view every product dashboard
    leads with.

    Plan shape: one scan to the distinct (day, user) presence relation
    (epoch-day buckets, q67 idiom); each user's first day is a
    partial-min over THAT relation (no second scan); the new/returning
    verdict is a user-keyed sort-merge join of two corpus-scaled
    relations, then a |days|-row aggregate. All counts integer-exact;
    the only division is the final new_frac.
    """
    ev = _t(spark, sf_dir, "events")
    day = (F.unix_timestamp("ts") / F.lit(86400)).cast("bigint")
    pres = (ev.select(day.alias("day"), "user_id").distinct())
    first = (pres.groupBy("user_id")
             .agg(F.min("day").alias("first_day")))
    tagged = pres.join(first.hint("merge"), "user_id")
    return (tagged.groupBy("day")
            .agg(F.count(F.lit(1)).alias("n_active"),
                 F.sum(F.when(F.col("day") == F.col("first_day"), 1)
                       .otherwise(0)).alias("n_new"))
            .select(F.col("day").cast("bigint").alias("day"),
                    F.col("n_active").cast("bigint").alias("n_active"),
                    F.col("n_new").cast("bigint").alias("n_new"),
                    (F.col("n_active") - F.col("n_new")).cast("bigint")
                    .alias("n_returning"),
                    (F.col("n_new").cast("double")
                     / F.col("n_active").cast("double"))
                    .alias("new_frac"))
            .orderBy("day"))


_Q89_SQL = """
WITH pres AS (
  SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
    user_id
  FROM events
), first AS (
  SELECT user_id, MIN(day) AS first_day FROM pres GROUP BY user_id
)
SELECT p.day,
  CAST(count(*) AS BIGINT) AS n_active,
  CAST(SUM(CASE WHEN p.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT)
    AS n_new,
  CAST(count(*) - SUM(CASE WHEN p.day = f.first_day THEN 1 ELSE 0 END)
       AS BIGINT) AS n_returning,
  CAST(SUM(CASE WHEN p.day = f.first_day THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(count(*) AS DOUBLE) AS new_frac
FROM pres p JOIN first f USING (user_id)
GROUP BY p.day
ORDER BY p.day
"""

register(QuerySpec("q89_new_vs_returning", q89_new_vs_returning, _Q89_SQL,
                   description="daily new vs returning users: distinct "
                               "presence relation scanned once, "
                               "first-day partial-min over it, "
                               "user-keyed sort-merge verdict join"))


def q90_weekday_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-seasonality test: the chi-square statistic of event
    counts against a uniform week — the screening stat monitors use to
    decide whether a weekly cycle exists before fitting anything.

    Exactness trick: with expected = T/7 for every cell, chi-square
    collapses to sum((7·o_i − T)²) / (7·T) — ONE division of two exact
    integers, instead of a per-cell o²/e sum of doubles whose addition
    order could differ across engines. Empty weekdays still contribute
    ((0·7 − T)²) via the dense 7-row calendar (explode/range), so a
    corpus clustered in one weekday maximizes the statistic instead of
    shrinking the table. Weekday is epoch-day arithmetic
    ((day + 4) % 7, 0 = Sunday) — calendar-function-free, so both
    engines agree by construction.

    Plan: one scan partial-aggregates to <= 7 rows; everything after is
    constant-size.
    """
    ev = _t(spark, sf_dir, "events")
    dow = ((F.unix_timestamp("ts") / F.lit(86400)).cast("bigint")
           + F.lit(4)) % 7
    counts = (ev.select(dow.alias("dow"))
              .groupBy("dow").agg(F.count(F.lit(1)).alias("o")))
    week = spark.range(7).select(F.col("id").cast("bigint").alias("dow"))
    dense = (week.join(counts, "dow", "left")
             .select("dow", F.coalesce("o", F.lit(0)).alias("o")))
    d = lambda c: c.cast("decimal(38,0)")
    agg = dense.agg(
        F.sum(d(F.col("o"))).alias("t"),
        F.min(F.struct((-F.col("o")).alias("no"),
                       F.col("dow").alias("dw"))).alias("peak"),
        F.min(F.struct(F.col("o"), F.col("dow"))).alias("trough"))
    dev = dense.crossJoin(F.broadcast(agg)).agg(
        F.sum((d(F.col("o")) * 7 - F.col("t"))
              * (d(F.col("o")) * 7 - F.col("t"))).alias("ss"),
        F.max(F.col("t")).alias("t"),
        F.max(F.col("peak.dw")).alias("peak_dow"),
        F.max(F.col("trough.dow")).alias("trough_dow"))
    return dev.select(
        F.col("t").cast("bigint").alias("n_events"),
        F.when(F.col("t") > 0,
               F.col("ss").cast("double")
               / (F.col("t") * 7).cast("double")).alias("chi2"),
        F.col("peak_dow").cast("bigint").alias("peak_dow"),
        F.col("trough_dow").cast("bigint").alias("trough_dow"))


_Q90_SQL = """
WITH counts AS (
  SELECT (CAST(floor(epoch(ts) / 86400) AS BIGINT) + 4) % 7 AS dow,
    count(*) AS o
  FROM events GROUP BY 1
), dense AS (
  SELECT w.dow, COALESCE(c.o, 0) AS o
  FROM (SELECT UNNEST(range(0, 7)) AS dow) w
  LEFT JOIN counts c ON c.dow = w.dow
), agg AS (
  SELECT SUM(CAST(o AS HUGEINT)) AS t,
    MIN({'no': -o, 'dw': dow}) AS peak,
    MIN({'o': o, 'dow': dow}) AS trough
  FROM dense
)
SELECT CAST(a.t AS BIGINT) AS n_events,
  CASE WHEN a.t > 0 THEN
    CAST((SELECT SUM((CAST(o AS HUGEINT) * 7 - a.t)
                     * (CAST(o AS HUGEINT) * 7 - a.t)) FROM dense)
         AS DOUBLE) / CAST(a.t * 7 AS DOUBLE)
  END AS chi2,
  CAST((a.peak).dw AS BIGINT) AS peak_dow,
  CAST((a.trough).dow AS BIGINT) AS trough_dow
FROM agg a
"""

register(QuerySpec("q90_weekday_chi2", q90_weekday_chi2, _Q90_SQL,
                   description="weekday-seasonality chi-square vs "
                               "uniform week: collapses to ONE exact "
                               "integer division; dense 7-cell "
                               "calendar; epoch-day weekday arithmetic"))


BOT_BURST_PER_MIN = 30   # no human emits 30+ events in one minute
BOT_MIN_EVENTS = 12      # regularity only means something with volume


def q91_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user automation signals: event volume, the hottest single
    minute (burst), and inter-event gap regularity (a scripted client
    fires on a timer, so its gap set collapses to one or two distinct
    values) — the abuse-detection triage every event pipeline runs
    before engagement metrics can be trusted.

    Exactness: every signal is integer (counts, microsecond gaps,
    distinct-gap cardinality); the verdict is integer comparisons
    against documented thresholds. Duplicate timestamps order by
    (ts, event_id) in the gap window, so ties cannot flip gaps between
    engines (the q86 discipline).

    Scale: the minute histogram partial-aggregates before its per-user
    max; the gap window partitions on the HIGH-cardinality user key.
    """
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    base = ev.select("user_id", "event_id",
                     F.unix_micros("ts").alias("t_us"))
    per_min = (base.select("user_id",
                           (F.col("t_us") / F.lit(60_000_000))
                           .cast("bigint").alias("minute"))
               .groupBy("user_id", "minute")
               .agg(F.count(F.lit(1)).alias("c"))
               .groupBy("user_id")
               .agg(F.max("c").alias("max_per_minute")))
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    gaps = (base.withColumn("prev", F.lag("t_us").over(w))
            .filter(F.col("prev").isNotNull())
            .select("user_id", (F.col("t_us") - F.col("prev"))
                    .alias("gap_us")))
    gap_stats = (gaps.groupBy("user_id")
                 .agg(F.count(F.lit(1)).alias("n_gaps"),
                      F.countDistinct("gap_us").alias("n_distinct_gaps")))
    vol = base.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    j = (vol.join(per_min.hint("merge"), "user_id")
         .join(gap_stats.hint("merge"), "user_id", "left"))
    burst = F.col("max_per_minute") >= BOT_BURST_PER_MIN
    regular = ((F.col("n_events") >= BOT_MIN_EVENTS)
               & (F.coalesce(F.col("n_distinct_gaps"), F.lit(0)) <= 2))
    return (j.select(
                "user_id",
                F.col("n_events").cast("bigint").alias("n_events"),
                F.col("max_per_minute").cast("bigint")
                .alias("max_per_minute"),
                F.coalesce(F.col("n_distinct_gaps"), F.lit(0))
                .cast("bigint").alias("n_distinct_gaps"),
                burst.alias("burst_flag"),
                regular.alias("regular_flag"),
                (burst | regular).alias("is_bot")))
    # no trailing orderBy: one row per user — corpus-proportional


_Q91_SQL = f"""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS t_us FROM events
), per_min AS (
  SELECT user_id, MAX(c) AS max_per_minute FROM (
    SELECT user_id, CAST(floor(t_us / 60000000) AS BIGINT) AS minute,
      COUNT(*) AS c
    FROM base GROUP BY user_id, minute) m
  GROUP BY user_id
), gaps AS (
  SELECT user_id, t_us - prev AS gap_us FROM (
    SELECT user_id, t_us,
      LAG(t_us) OVER (PARTITION BY user_id
                      ORDER BY t_us, event_id) AS prev
    FROM base) g
  WHERE prev IS NOT NULL
), gap_stats AS (
  SELECT user_id, COUNT(*) AS n_gaps,
    COUNT(DISTINCT gap_us) AS n_distinct_gaps
  FROM gaps GROUP BY user_id
), vol AS (
  SELECT user_id, COUNT(*) AS n_events FROM base GROUP BY user_id
)
SELECT v.user_id,
  CAST(v.n_events AS BIGINT) AS n_events,
  CAST(p.max_per_minute AS BIGINT) AS max_per_minute,
  CAST(COALESCE(g.n_distinct_gaps, 0) AS BIGINT) AS n_distinct_gaps,
  p.max_per_minute >= {BOT_BURST_PER_MIN} AS burst_flag,
  v.n_events >= {BOT_MIN_EVENTS}
    AND COALESCE(g.n_distinct_gaps, 0) <= 2 AS regular_flag,
  (p.max_per_minute >= {BOT_BURST_PER_MIN})
    OR (v.n_events >= {BOT_MIN_EVENTS}
        AND COALESCE(g.n_distinct_gaps, 0) <= 2) AS is_bot
FROM vol v
JOIN per_min p USING (user_id)
LEFT JOIN gap_stats g USING (user_id)
ORDER BY v.user_id
"""

register(QuerySpec("q91_bot_detection", q91_bot_detection, _Q91_SQL,
                   description="per-user automation signals: burst "
                               "minute, gap-regularity (scripted "
                               "clients collapse to <=2 distinct gaps), "
                               "integer-exact verdicts"))


def q92_scd2_asof_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel read over the type-2 dimension q77 builds: each
    sampled user's state AS OF the probe instant — the query an SCD2
    table exists to answer ("what plan was this account on when the
    incident happened?").

    The probe instant is the midpoint of the table's own time range
    (exact integer micros, single-row aggregate broadcast) so the read
    is deterministic and hashable — a wall-clock probe would be
    time-dependent, the retention_plan lesson. Interval containment is
    ``effective_from <= probe < effective_to`` with the open current
    version matching any probe past its start; the filter is
    shuffle-free on the version relation.
    """
    versions = _scd2_versions(spark, sf_dir)
    ev = _t(spark, sf_dir, "events")
    probe = ev.agg(
        ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts")))
         / F.lit(2)).cast("bigint").alias("probe_us"))
    hit = (versions.crossJoin(F.broadcast(probe))
           .filter((F.unix_micros("effective_from") <= F.col("probe_us"))
                   & (F.col("effective_to").isNull()
                      | (F.col("probe_us")
                         < F.unix_micros("effective_to")))))
    return hit.select("user_id", "version_no", "state",
                      "effective_from",
                      F.col("effective_to").isNull().alias("is_current"))
    # no trailing orderBy: one row per probed user — user-keyed


_Q92_SQL = f"""
WITH sampled AS (
  SELECT * FROM events
  WHERE {md5_long_sql("CAST(user_id AS VARCHAR)", "scd2")} % {SCD2_USER_MOD} = 0
), marked AS (
  SELECT user_id, ts, event_id, event_type,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev_state
  FROM sampled
), starts AS (
  SELECT user_id, ts, event_id, event_type FROM marked
  WHERE prev_state IS NULL OR prev_state <> event_type
), versioned AS (
  SELECT user_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS INTEGER) AS version_no,
    event_type AS state,
    ts AS effective_from,
    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS effective_to
  FROM starts
), probe AS (
  SELECT CAST((MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS BIGINT)
    AS probe_us
  FROM events
)
SELECT v.user_id, v.version_no, v.state, v.effective_from,
  v.effective_to IS NULL AS is_current
FROM versioned v CROSS JOIN probe p
WHERE epoch_us(v.effective_from) <= p.probe_us
  AND (v.effective_to IS NULL OR p.probe_us < epoch_us(v.effective_to))
ORDER BY v.user_id
"""

register(QuerySpec("q92_scd2_asof_read", q92_scd2_asof_read, _Q92_SQL,
                   description="time-travel read over the SCD2 "
                               "dimension: state as of the data's own "
                               "midpoint instant (deterministic probe), "
                               "shuffle-free interval filter"))


def q93_top_decile_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "top 10% of customers drive X% of revenue" number, exact,
    per market segment: rank customers by revenue DESC within their
    segment via the shared binned two-phase rank (never a 5-reducer
    segment window), take the top ceil(n/10), and report their share
    of the segment's exact cents mass — integer arithmetic with one
    final division. Complements q88's Gini with the headline
    concentration statistic executives actually quote.
    """
    from downscaledclimatedata_spark.functions.ranks import (
        binned_row_number)

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    per = (orders.groupBy("o_custkey")
           .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                .alias("cents")))
    seg = (per.join(cust.select(F.col("c_custkey").alias("o_custkey"),
                                "c_mktsegment"), "o_custkey")
           .withColumn("_dbin", F.expr(f"(-cents) div {GINI_BIN_DIV}")))
    ranked = binned_row_number(
        seg, "_dbin", order_cols=(-F.col("cents"), F.col("o_custkey")),
        partition_cols=("c_mktsegment",), out="rnk", count_col="n")
    d = lambda c: c.cast("decimal(38,0)")
    # top decile size: ceil(n/10) with positive operands (the verify
    # gotcha: negated-floor ceil silently floors in DuckDB)
    topn = F.expr("(n + 9) div 10")
    agg = (ranked.groupBy("c_mktsegment")
           .agg(F.max("n").alias("n_customers"),
                F.sum(d(F.col("cents"))).alias("total_cents"),
                F.sum(F.when(F.col("rnk") <= topn, d(F.col("cents")))
                      .otherwise(F.lit(0).cast("decimal(38,0)")))
                .alias("top_cents"),
                F.max(topn).alias("top_n")))
    return (agg.select(
                "c_mktsegment",
                F.col("n_customers").cast("bigint").alias("n_customers"),
                F.col("top_n").cast("bigint").alias("top_n"),
                (F.col("total_cents").cast("double") / 100)
                .alias("revenue"),
                F.when(F.col("total_cents") > 0,
                       F.col("top_cents").cast("double")
                       / F.col("total_cents").cast("double"))
                .alias("top_decile_share"))
            .orderBy("c_mktsegment"))


_Q93_SQL = """
WITH per AS (
  SELECT o_custkey,
    SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
), seg AS (
  SELECT p.o_custkey, p.cents, c.c_mktsegment
  FROM per p JOIN customer c ON c.c_custkey = p.o_custkey
), ranked AS (
  SELECT c_mktsegment, cents,
    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                       ORDER BY cents DESC, o_custkey) AS rnk,
    COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM seg
)
SELECT c_mktsegment,
  CAST(MAX(n) AS BIGINT) AS n_customers,
  CAST(MAX((n + 9) // 10) AS BIGINT) AS top_n,
  CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100 AS revenue,
  CASE WHEN SUM(CAST(cents AS HUGEINT)) > 0 THEN
    CAST(SUM(CASE WHEN rnk <= (n + 9) // 10
             THEN CAST(cents AS HUGEINT) ELSE 0 END) AS DOUBLE)
      / CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE)
  END AS top_decile_share
FROM ranked
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

register(QuerySpec("q93_top_decile_share", q93_top_decile_share, _Q93_SQL,
                   description="top-decile revenue share per segment "
                               "via the binned two-phase rank; exact "
                               "cents mass, positive-operand ceil, one "
                               "division"))


# --- q94: ordered conversion funnel ---------------------------------------------

def q94_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step ordered funnel (view -> click -> purchase): a user
    reaches step k only via a strictly increasing (ts, event_id) chain
    through the earlier steps — earliest QUALIFYING event per step,
    ties broken on event_id so both engines agree. Sequential-chain
    semantics, deliberately different from q66's first-timestamps
    funnel: a user whose first click precedes their first view still
    converts here if ANY later click follows the chosen view (q66
    drops them), which is how funnel engines actually match steps.

    Plan: three user-keyed aggregations, each a sort-merge join of the
    events relation against the previous step's bounded-per-user
    struct-min — one row per user per step, no window over the event
    stream and no per-user sort. Counts are exact integers; the two
    conversion rates divide once at the end.
    """
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id",
                                            "event_type")

    def step_min(df, etype):
        return (df.filter(F.col("event_type") == etype)
                .groupBy("user_id")
                .agg(F.min(F.struct("ts", "event_id")).alias("m"))
                .select("user_id", F.col("m.ts").alias("t"),
                        F.col("m.event_id").alias("e")))

    after = lambda t, e: ((F.col("ts") > t)
                          | ((F.col("ts") == t) & (F.col("event_id") > e)))
    s1 = step_min(ev, "view")
    s2 = step_min(
        ev.join(s1.withColumnRenamed("t", "t1").withColumnRenamed("e", "e1")
                .hint("merge"), "user_id")
        .filter(after(F.col("t1"), F.col("e1"))), "click")
    s3 = step_min(
        ev.join(s2.withColumnRenamed("t", "t2").withColumnRenamed("e", "e2")
                .hint("merge"), "user_id")
        .filter(after(F.col("t2"), F.col("e2"))), "purchase")
    n1, n2, n3 = (s.agg(F.count(F.lit(1)).alias("n")) for s in (s1, s2, s3))
    return (n1.select(F.col("n").alias("n_view"))
            .crossJoin(F.broadcast(n2.select(F.col("n").alias("n_click"))))
            .crossJoin(F.broadcast(n3.select(F.col("n").alias("n_purchase"))))
            .select(
                F.col("n_view").cast("bigint").alias("n_view"),
                F.col("n_click").cast("bigint").alias("n_click"),
                F.col("n_purchase").cast("bigint").alias("n_purchase"),
                F.when(F.col("n_view") > 0,
                       F.col("n_click").cast("double")
                       / F.col("n_view").cast("double"))
                .otherwise(F.lit(0.0)).alias("view_to_click"),
                F.when(F.col("n_click") > 0,
                       F.col("n_purchase").cast("double")
                       / F.col("n_click").cast("double"))
                .otherwise(F.lit(0.0)).alias("click_to_purchase")))


def _q94_sql() -> str:
    """Composed funnel oracle: each step is the (ts, event_id)-lexical
    min of qualifying events; step k qualifies only strictly after step
    k-1's pick. Steps use per-user ROW_NUMBER picks — fine in the
    oracle engine at sf0.01; the Spark side uses struct-min
    aggregations instead (no per-user window)."""
    return """
WITH s1 AS (
  SELECT user_id, t, e FROM (
    SELECT user_id, ts AS t, event_id AS e,
      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events WHERE event_type = 'view') WHERE rn = 1
), s2 AS (
  SELECT user_id, t, e FROM (
    SELECT ev.user_id, ev.ts AS t, ev.event_id AS e,
      ROW_NUMBER() OVER (PARTITION BY ev.user_id
                         ORDER BY ev.ts, ev.event_id) AS rn
    FROM events ev JOIN s1 USING (user_id)
    WHERE ev.event_type = 'click'
      AND (ev.ts > s1.t OR (ev.ts = s1.t AND ev.event_id > s1.e))
  ) WHERE rn = 1
), s3 AS (
  SELECT user_id, t, e FROM (
    SELECT ev.user_id, ev.ts AS t, ev.event_id AS e,
      ROW_NUMBER() OVER (PARTITION BY ev.user_id
                         ORDER BY ev.ts, ev.event_id) AS rn
    FROM events ev JOIN s2 USING (user_id)
    WHERE ev.event_type = 'purchase'
      AND (ev.ts > s2.t OR (ev.ts = s2.t AND ev.event_id > s2.e))
  ) WHERE rn = 1
)
SELECT
  CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_view,
  CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_click,
  CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_purchase,
  CASE WHEN (SELECT COUNT(*) FROM s1) > 0 THEN
    CAST((SELECT COUNT(*) FROM s2) AS DOUBLE)
      / CAST((SELECT COUNT(*) FROM s1) AS DOUBLE) ELSE 0.0 END
    AS view_to_click,
  CASE WHEN (SELECT COUNT(*) FROM s2) > 0 THEN
    CAST((SELECT COUNT(*) FROM s3) AS DOUBLE)
      / CAST((SELECT COUNT(*) FROM s2) AS DOUBLE) ELSE 0.0 END
    AS click_to_purchase
"""


register(QuerySpec("q94_funnel", q94_funnel, _q94_sql(),
                   description="ordered view->click->purchase funnel: "
                               "per-step earliest qualifying event via "
                               "struct-min chains, strict (ts, id) "
                               "ordering between steps"))


# --- q95: weekly cohort retention triangle --------------------------------------

def q95_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort-retention triangle: users grouped by their first
    active epoch-week; for every (cohort, week-offset) cell, how many
    of that cohort were active — plus the retained fraction of the
    cohort's size. THE growth chart every subscription dashboard draws.

    Plan: one scan to the distinct (week, user) presence relation;
    per-user first week is a partial-min over that relation; the cell
    counts are one aggregate over the user-keyed merge join of the two
    — no window over the event stream, all counts exact integers, the
    retention fraction divides once per (|cohorts| x |offsets|) output
    row.
    """
    ev = _t(spark, sf_dir, "events")
    week = (F.unix_timestamp("ts") / F.lit(604800)).cast("bigint")
    pres = ev.select(week.alias("week"), "user_id").distinct()
    first = pres.groupBy("user_id").agg(F.min("week").alias("cohort"))
    sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_size"))
    cells = (pres.join(first.hint("merge"), "user_id")
             .groupBy("cohort", (F.col("week") - F.col("cohort"))
                      .alias("offset_weeks"))
             .agg(F.count(F.lit(1)).alias("n_active")))
    return (cells.join(F.broadcast(sizes), "cohort")
            .select(F.col("cohort").cast("bigint").alias("cohort"),
                    F.col("offset_weeks").cast("bigint")
                    .alias("offset_weeks"),
                    F.col("n_active").cast("bigint").alias("n_active"),
                    F.col("cohort_size").cast("bigint")
                    .alias("cohort_size"),
                    (F.col("n_active").cast("double")
                     / F.col("cohort_size").cast("double"))
                    .alias("retained_frac"))
            .orderBy("cohort", "offset_weeks"))


_Q95_SQL = """
WITH pres AS (
  SELECT DISTINCT CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week,
    user_id
  FROM events
), first AS (
  SELECT user_id, MIN(week) AS cohort FROM pres GROUP BY user_id
), sizes AS (
  SELECT cohort, COUNT(*) AS cohort_size FROM first GROUP BY cohort
), cells AS (
  SELECT f.cohort, p.week - f.cohort AS offset_weeks,
    COUNT(*) AS n_active
  FROM pres p JOIN first f USING (user_id)
  GROUP BY f.cohort, p.week - f.cohort
)
SELECT c.cohort, c.offset_weeks,
  CAST(c.n_active AS BIGINT) AS n_active,
  CAST(s.cohort_size AS BIGINT) AS cohort_size,
  CAST(c.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
    AS retained_frac
FROM cells c JOIN sizes s USING (cohort)
ORDER BY c.cohort, c.offset_weeks
"""

register(QuerySpec("q95_cohort_retention", q95_cohort_retention, _Q95_SQL,
                   description="weekly cohort retention triangle: "
                               "distinct presence -> first-week cohorts "
                               "-> exact cell counts + retained "
                               "fraction"))


# --- q96: rolling 7-day active users --------------------------------------------

def q96_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day (the WAU curve a
    DAU/WAU/MAU dashboard interpolates): a user active on day d counts
    toward every window day in [d, d+6].

    Sliding-window DISTINCT does not decompose as a windowed sum — the
    same user may appear on several days of one window. The exact
    decomposition used here: dedup the stream to day-grain presence
    FIRST (the only corpus-sized step, one shuffle), then explode each
    presence row to the <= 7 window days it serves and count DISTINCT
    (user) per window day. The 7x expansion applies to the DAY-GRAIN
    relation (|users| x |days|, thousands of times smaller than the
    event stream), never to raw events. Output restricted to window
    days with at least one active day inside the data's span.
    """
    ev = _t(spark, sf_dir, "events")
    day = (F.unix_timestamp("ts") / F.lit(86400)).cast("bigint")
    pres = ev.select(day.alias("day"), "user_id").distinct()
    hi = pres.agg(F.max("day").alias("max_day"))
    win = (pres.select(
        "user_id", "day",
        F.explode(F.sequence(F.col("day"),
                             F.col("day") + F.lit(6))).alias("wday")))
    return (win.crossJoin(F.broadcast(hi))
            .filter(F.col("wday") <= F.col("max_day"))
            .groupBy("wday")
            .agg(F.countDistinct("user_id").alias("wau"))
            .select(F.col("wday").cast("bigint").alias("wday"),
                    F.col("wau").cast("bigint").alias("wau"))
            .orderBy("wday"))


_Q96_SQL = """
WITH pres AS (
  SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
    user_id
  FROM events
), win AS (
  SELECT p.user_id, p.day + o.off AS wday
  FROM pres p CROSS JOIN (
    SELECT UNNEST(range(7)) AS off) o
)
SELECT wday, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
FROM win
WHERE wday <= (SELECT MAX(day) FROM pres)
GROUP BY wday ORDER BY wday
"""

register(QuerySpec("q96_rolling_active", q96_rolling_active, _Q96_SQL,
                   description="rolling 7-day distinct active users: "
                               "day-grain dedup first, then bounded 7x "
                               "window expansion of the presence "
                               "relation"))


# --- q97: source concentration (HHI) per language -------------------------------

def q97_source_concentration(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Corpus-diversity report: per language, the Herfindahl–Hirschman
    concentration of documents across sources, the effective number of
    sources (1/HHI), and the top source's share — the numbers a dataset
    card quotes when it claims the corpus is not one crawl in a trench
    coat. Log-free on purpose: HHI = sum((n_i/N)^2) is an exact
    rational (sum of squared bigints over a squared bigint), so both
    engines produce bit-identical doubles with ONE division — entropy's
    per-row log() would hash-flakily diverge between libm builds.

    Plan: two bounded aggregations (|lang x source| then |lang|) after
    one scan with map-side partials; squares summed as DECIMAL(38,0) so
    1e11-doc sources cannot overflow the int64 sum.
    """
    docs = _t(spark, sf_dir, "documents")
    per = (docs.groupBy("lang", "source")
           .agg(F.count(F.lit(1)).alias("n")))
    d = F.col("n").cast("decimal(38,0)")
    agg = (per.groupBy("lang")
           .agg(F.count(F.lit(1)).alias("n_sources"),
                F.sum("n").alias("n_docs"),
                F.sum(d * d).alias("sum_sq"),
                F.max("n").alias("top_n")))
    N = F.col("n_docs").cast("double")
    hhi = F.col("sum_sq").cast("double") / (N * N)
    return (agg.select(
        "lang",
        F.col("n_sources").cast("bigint").alias("n_sources"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        hhi.alias("hhi"),
        (F.lit(1.0) / hhi).alias("effective_sources"),
        (F.col("top_n").cast("double") / N).alias("top_share"))
        .orderBy("lang"))


_Q97_SQL = """
WITH per AS (
  SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY lang, source
), agg AS (
  SELECT lang, COUNT(*) AS n_sources, SUM(n) AS n_docs,
    SUM(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS sum_sq,
    MAX(n) AS top_n
  FROM per GROUP BY lang
)
SELECT lang,
  CAST(n_sources AS BIGINT) AS n_sources,
  CAST(n_docs AS BIGINT) AS n_docs,
  CAST(sum_sq AS DOUBLE)
    / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)) AS hhi,
  1.0 / (CAST(sum_sq AS DOUBLE)
    / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)))
    AS effective_sources,
  CAST(top_n AS DOUBLE) / CAST(n_docs AS DOUBLE) AS top_share
FROM agg ORDER BY lang
"""

register(QuerySpec("q97_source_concentration", q97_source_concentration,
                   _Q97_SQL,
                   description="per-language HHI source concentration, "
                               "effective source count and top share — "
                               "log-free exact-rational diversity "
                               "report"))


# --- q98: duplicate-transaction detection ----------------------------------------

def q98_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate transaction detection: events by the same user
    with the SAME value within 300 seconds of the previous such event —
    the double-charge / double-click guard every payments pipeline
    runs. Per event type: how many events are repeats inside the
    window, and how many (user, value) groups have at least one.

    Plan: one window pass over (user_id, value) partitions ordered by
    (ts, event_id) — a lag of the previous timestamp (whole-second
    truncation per timestamp, unix_timestamp semantics, mirrored as
    floor(epoch()) in the oracle); the key is
    near-uniform (value decimal spreads users' events), so no skewed
    reducer. Counts are exact; no self-join of the event stream (the
    naive range self-join is quadratic per hot key).
    """
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "value").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    tagged = ev.select(
        "event_type", "user_id", "value",
        (gap <= 300).alias("is_dup"))
    return (tagged.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
                 .alias("n_dup_events"),
                 F.countDistinct(
                     F.when(F.col("is_dup"),
                            F.struct("user_id", "value")))
                 .alias("n_dup_groups"))
            .select("event_type",
                    F.col("n_events").cast("bigint").alias("n_events"),
                    F.col("n_dup_events").cast("bigint")
                    .alias("n_dup_events"),
                    F.col("n_dup_groups").cast("bigint")
                    .alias("n_dup_groups"))
            .orderBy("event_type"))


_Q98_SQL = """
WITH lagged AS (
  SELECT event_type, user_id, value,
    floor(epoch(ts))
      - floor(epoch(LAG(ts) OVER (PARTITION BY user_id, value
                                  ORDER BY ts, event_id))) AS gap
  FROM events
), tagged AS (
  SELECT event_type, user_id, value, gap <= 300 AS is_dup FROM lagged
)
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
    AS n_dup_events,
  CAST(COUNT(DISTINCT CASE WHEN is_dup
                           THEN ROW(user_id, value) END) AS BIGINT)
    AS n_dup_groups
FROM tagged GROUP BY event_type ORDER BY event_type
"""

register(QuerySpec("q98_duplicate_payments", q98_duplicate_payments,
                   _Q98_SQL,
                   description="same-user same-value repeats within "
                               "300s via one lag window on the "
                               "(user, value) key — no quadratic "
                               "range self-join"))


# --- q99: inter-event gap histogram ----------------------------------------------

GAP_BUCKET_SEC = 60
GAP_BUCKET_MAX = 60


def q99_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event-time histogram per event type: gaps between a
    user's consecutive events of the same type, bucketed in exact
    minutes (capped at an hour) — the latency-distribution view that
    sizes session timeouts and retry budgets.

    One lag window per (user, type) ordered by (ts, event_id), then a
    bounded (|types| x 61)-row aggregate. Bucketing is truncating
    integer division of nonnegative gaps — identical in both engines.
    """
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type") \
        .orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    # filter the RAW gap, not the bucket: Spark's least() IGNORES
    # NULLs (least(NULL, 60) = 60), so a first-row NULL gap would
    # silently land in the cap bucket
    bucket = F.least(F.floor(F.col("gap") / GAP_BUCKET_SEC),
                     F.lit(GAP_BUCKET_MAX)).cast("bigint")
    return (ev.select("event_type", gap.alias("gap"))
            .filter(F.col("gap").isNotNull())
            .select("event_type", bucket.alias("gap_bucket"))
            .groupBy("event_type", "gap_bucket")
            .agg(F.count(F.lit(1)).alias("n_gaps"))
            .select("event_type", "gap_bucket",
                    F.col("n_gaps").cast("bigint").alias("n_gaps"))
            .orderBy("event_type", "gap_bucket"))


_Q99_SQL = f"""
WITH lagged AS (
  SELECT event_type,
    floor(epoch(ts))
      - floor(epoch(LAG(ts) OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id))) AS gap
  FROM events
)
SELECT event_type,
  CAST(LEAST(floor(gap / {GAP_BUCKET_SEC}), {GAP_BUCKET_MAX}) AS BIGINT)
    AS gap_bucket,
  CAST(COUNT(*) AS BIGINT) AS n_gaps
FROM lagged WHERE gap IS NOT NULL
GROUP BY event_type, gap_bucket
ORDER BY event_type, gap_bucket
"""

register(QuerySpec("q99_gap_histogram", q99_gap_histogram, _Q99_SQL,
                   description="per-type inter-event-time histogram in "
                               "capped minute buckets from one lag "
                               "window"))


# --- q100: weekly median value per event type ------------------------------------

def q100_weekly_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weekly median event value per type — the percentile-band
    time series a latency/revenue dashboard plots. Composite-group
    showcase for :func:`grouped_quantile_cont` (functions/ranks.py):
    the same binned two-phase machinery that replaced percentile() in
    q71/q73 partitions on (type, week, value-bin) here, so parallelism
    scales with bins regardless of how many (type, week) cells exist.
    """
    from downscaledclimatedata_spark.functions.ranks import (
        grouped_quantile_cont)

    ev = _t(spark, sf_dir, "events")
    week = (F.unix_timestamp("ts") / F.lit(604800)).cast("bigint")
    med = grouped_quantile_cont(
        ev.withColumn("week", week), "value",
        [(0.5, "median_value")],
        group_cols=("event_type", "week"), id_cols=("event_id",),
        count_name="n_events")
    return med.select("event_type",
                      F.col("week").cast("bigint").alias("week"),
                      "median_value",
                      F.col("n_events").cast("bigint").alias("n_events")) \
        .orderBy("event_type", "week")


_Q100_SQL = """
SELECT event_type,
  CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week,
  quantile_cont(value, 0.5) AS median_value,
  CAST(COUNT(value) AS BIGINT) AS n_events
FROM events
GROUP BY event_type, week
ORDER BY event_type, week
"""

register(QuerySpec("q100_weekly_median", q100_weekly_median, _Q100_SQL,
                   description="exact weekly median value per type via "
                               "grouped_quantile_cont on the composite "
                               "(type, week) group — binned ranks, no "
                               "percentile() buffer"))


# --- q101: promotion revenue share (TPC-H Q14 shape) --------------------------------

def q101_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly promotion revenue share (TPC-H Q14 adapted to the
    fixture's columns): of each ship-month's discounted revenue, what
    fraction came from parts whose type starts with a promo prefix.

    Exact DECIMAL revenue sums (the engine-wide cents discipline), the
    share dividing two exact decimals once per month row. The
    lineitem-part join is partkey-keyed sort-merge (part is a fact-
    scaled dimension — NOT broadcast); months aggregate with map-side
    partials to a bounded relation.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    month = F.trunc(F.col("l_shipdate"), "month").alias("month")
    rev = dec("l_extendedprice", 2) * (F.lit(1) - dec("l_discount", 2))
    promo = F.col("p_type").startswith("PROMO")
    j = li.join(part.hint("merge"), li.l_partkey == part.p_partkey)
    return (j.groupBy(month)
            .agg(F.sum(rev).alias("rev"),
                 F.sum(F.when(promo, rev).otherwise(F.lit(0)
                                                    .cast("decimal(38,4)")))
                 .alias("promo_rev"))
            .select(F.col("month"),
                    F.col("rev").cast("double").alias("revenue"),
                    F.col("promo_rev").cast("double")
                    .alias("promo_revenue"),
                    F.when(F.col("rev") != 0,
                           (F.lit(100.0) * F.col("promo_rev")
                            .cast("double"))
                           / F.col("rev").cast("double"))
                    .otherwise(F.lit(0.0)).alias("promo_pct"))
            .orderBy("month"))


_Q101_SQL = f"""
WITH j AS (
  SELECT date_trunc('month', l_shipdate) AS month,
    {dec_sql('l_extendedprice')} * (1 - {dec_sql('l_discount')}) AS rev,
    p_type LIKE 'PROMO%' AS promo
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT CAST(month AS DATE) AS month,
  CAST(SUM(rev) AS DOUBLE) AS revenue,
  CAST(SUM(CASE WHEN promo THEN rev ELSE CAST(0 AS DECIMAL(38,4)) END)
       AS DOUBLE) AS promo_revenue,
  CASE WHEN SUM(rev) <> 0
       THEN 100.0 * CAST(SUM(CASE WHEN promo THEN rev
                             ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE)
            / CAST(SUM(rev) AS DOUBLE)
       ELSE 0.0 END AS promo_pct
FROM j GROUP BY month ORDER BY month
"""

register(QuerySpec("q101_promo_revenue", q101_promo_revenue, _Q101_SQL,
                   description="TPC-H Q14 shape: monthly promo revenue "
                               "share from exact decimal sums, "
                               "partkey-keyed merge join"))


# --- q102: monthly revenue with MoM growth ------------------------------------------

def q102_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue time series with month-over-month growth — the
    first chart of every revenue review. Growth is a lag window over
    the BOUNDED month relation (the corpus aggregates first; the
    window never sees fact rows), so the single-partition window is a
    non-issue at any scale.
    """
    li = _t(spark, sf_dir, "lineitem")
    month = F.trunc(F.col("l_shipdate"), "month").alias("month")
    rev = dec("l_extendedprice", 2) * (F.lit(1) - dec("l_discount", 2))
    monthly = li.groupBy(month).agg(F.sum(rev).alias("rev"))
    w = Window.orderBy("month")
    prev = F.lag("rev").over(w)
    return (monthly
            .select("month", F.col("rev").cast("double").alias("revenue"),
                    prev.cast("double").alias("prev_revenue"),
                    F.when(prev.isNotNull() & (prev != 0),
                           (F.col("rev") - prev).cast("double")
                           / prev.cast("double"))
                    .alias("mom_growth"))
            .orderBy("month"))


_Q102_SQL = f"""
WITH monthly AS (
  SELECT date_trunc('month', l_shipdate) AS month,
    SUM({dec_sql('l_extendedprice')} * (1 - {dec_sql('l_discount')}))
      AS rev
  FROM lineitem GROUP BY month
)
SELECT CAST(month AS DATE) AS month,
  CAST(rev AS DOUBLE) AS revenue,
  CAST(LAG(rev) OVER (ORDER BY month) AS DOUBLE) AS prev_revenue,
  CASE WHEN LAG(rev) OVER (ORDER BY month) IS NOT NULL
            AND LAG(rev) OVER (ORDER BY month) <> 0
       THEN CAST(rev - LAG(rev) OVER (ORDER BY month) AS DOUBLE)
            / CAST(LAG(rev) OVER (ORDER BY month) AS DOUBLE)
       END AS mom_growth
FROM monthly ORDER BY month
"""

register(QuerySpec("q102_monthly_growth", q102_monthly_growth, _Q102_SQL,
                   description="monthly revenue + MoM growth: exact "
                               "decimal sums, lag window over the "
                               "bounded month relation only"))


# --- q104: 7-day return rate after first purchase -----------------------------------

def q104_return_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-7 return rate by first-purchase day: of the users whose
    FIRST purchase happened on day D, how many came back (any event)
    within the next 7 days — the activation metric a growth team pairs
    with q95's cohort triangle.

    First purchase is a struct-min per user (map-side partial);
    "returned" is ONE user-keyed semi join of the event stream against
    that bounded relation with the window predicate evaluated on
    whole-second truncations (unix_timestamp semantics, floor(epoch())
    in the oracle) and strict (ts, event_id) ordering so a same-second
    event still counts. No windows over the event stream.
    """
    ev = _t(spark, sf_dir, "events")
    fp = (ev.filter(F.col("event_type") == "purchase")
          .groupBy("user_id")
          .agg(F.min(F.struct("ts", "event_id")).alias("m"))
          .select("user_id", F.col("m.ts").alias("fp_ts"),
                  F.col("m.event_id").alias("fp_id")))
    gap = F.unix_timestamp("ts") - F.unix_timestamp("fp_ts")
    after = ((F.col("ts") > F.col("fp_ts"))
             | ((F.col("ts") == F.col("fp_ts"))
                & (F.col("event_id") > F.col("fp_id"))))
    returned = (ev.join(fp.hint("merge"), "user_id")
                .filter(after & (gap <= 604800))
                .select("user_id").distinct()
                .withColumn("ret", F.lit(1)))
    day = (F.unix_timestamp("fp_ts") / F.lit(86400)).cast("bigint")
    return (fp.join(returned.hint("merge"), "user_id", "left")
            .groupBy(day.alias("cohort_day"))
            .agg(F.count(F.lit(1)).alias("n_purchasers"),
                 F.sum(F.coalesce("ret", F.lit(0))).alias("n_returned"))
            .select(F.col("cohort_day"),
                    F.col("n_purchasers").cast("bigint")
                    .alias("n_purchasers"),
                    F.col("n_returned").cast("bigint").alias("n_returned"),
                    (F.col("n_returned").cast("double")
                     / F.col("n_purchasers").cast("double"))
                    .alias("return_rate"))
            .orderBy("cohort_day"))


_Q104_SQL = """
WITH fp AS (
  SELECT user_id, t AS fp_ts, e AS fp_id FROM (
    SELECT user_id, ts AS t, event_id AS e,
      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        AS rn
    FROM events WHERE event_type = 'purchase') WHERE rn = 1
), returned AS (
  SELECT DISTINCT ev.user_id
  FROM events ev JOIN fp USING (user_id)
  WHERE (ev.ts > fp.fp_ts
         OR (ev.ts = fp.fp_ts AND ev.event_id > fp.fp_id))
    AND floor(epoch(ev.ts)) - floor(epoch(fp.fp_ts)) <= 604800
)
SELECT CAST(floor(epoch(fp.fp_ts) / 86400) AS BIGINT) AS cohort_day,
  CAST(COUNT(*) AS BIGINT) AS n_purchasers,
  CAST(SUM(CASE WHEN r.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_returned,
  CAST(SUM(CASE WHEN r.user_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS return_rate
FROM fp LEFT JOIN returned r USING (user_id)
GROUP BY cohort_day ORDER BY cohort_day
"""

register(QuerySpec("q104_return_rate", q104_return_rate, _Q104_SQL,
                   description="day-7 return rate by first-purchase "
                               "cohort: struct-min first purchase + one "
                               "user-keyed semi-join window test"))


# --- q105: session-level conversion rate -------------------------------------------

def q105_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level conversion: sessions (q36's >300s-gap rule)
    bucketed by length, with the share containing a purchase — the
    engagement-vs-conversion curve (do longer sessions convert
    better?). Session length buckets are capped exact integers.

    Same two-window one-shuffle session construction as q36 (user-keyed,
    uniform); the session rollup and the bucket report are bounded
    aggregates. Note date_diff vs unix_timestamp subtraction agree
    because both truncate each timestamp to whole seconds first.
    """
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = ev.select(
        "user_id", "event_id", "ts", "event_type",
        F.when((F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts", 1).over(w))) > 300, 1)
        .otherwise(0).alias("new_session"))
    sessioned = gapped.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sess = (sessioned.groupBy("user_id", "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.max((F.col("event_type") == "purchase").cast("int"))
                 .alias("converted")))
    bucket = F.least(F.col("n_events"), F.lit(10)).cast("bigint")
    return (sess.groupBy(bucket.alias("len_bucket"))
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.sum("converted").alias("n_converted"))
            .select("len_bucket",
                    F.col("n_sessions").cast("bigint").alias("n_sessions"),
                    F.col("n_converted").cast("bigint")
                    .alias("n_converted"),
                    (F.col("n_converted").cast("double")
                     / F.col("n_sessions").cast("double"))
                    .alias("conversion_rate"))
            .orderBy("len_bucket"))


_Q105_SQL = """
WITH gapped AS (
  SELECT user_id, event_id, ts, event_type,
    CASE WHEN date_diff('second', LAG(ts, 1) OVER w, ts) > 300
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessioned AS (
  SELECT user_id, event_type,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM gapped
), sess AS (
  SELECT user_id, session_id, COUNT(*) AS n_events,
    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM sessioned GROUP BY user_id, session_id
)
SELECT CAST(LEAST(n_events, 10) AS BIGINT) AS len_bucket,
  CAST(COUNT(*) AS BIGINT) AS n_sessions,
  CAST(SUM(converted) AS BIGINT) AS n_converted,
  CAST(SUM(converted) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
    AS conversion_rate
FROM sess GROUP BY len_bucket ORDER BY len_bucket
"""

register(QuerySpec("q105_session_conversion", q105_session_conversion,
                   _Q105_SQL,
                   description="session-length vs purchase-conversion "
                               "curve on q36's gap sessions — bounded "
                               "rollups after one user-keyed shuffle"))


# --- q106: mergeable histogram quantiles ---------------------------------------------

HIST_Q_BINS = 4096


def q106_histogram_quantiles(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Approximate p50/p95/p99 per event type from a fixed-bin
    histogram — the MERGEABLE quantile sketch (bin counts add across
    partitions/days/streams, unlike exact rank state), with a declared
    error bound of one bin width. The deterministic cousin of
    approx_percentile: same one-pass map-side-combinable shape, but
    both engines compute the identical answer, so it oracle-checks.

    Per type: bin counts -> cumulative share -> the lower edge of the
    first bin whose cumulative count reaches ceil(q * n). All integer
    until the final edge arithmetic; the histogram relation is
    |types| x 4096 rows.
    """
    ev = _t(spark, sf_dir, "events")
    st = ev.agg(F.min("value"), F.max("value")).first()
    lo, hi = float(st[0] or 0), float(st[1] or 0)
    width = (hi - lo) / HIST_Q_BINS if hi > lo else 1.0
    b = F.least(F.floor((F.col("value") - F.lit(lo)) / F.lit(width)),
                F.lit(HIST_Q_BINS - 1)).cast("bigint")
    hist = (ev.groupBy("event_type", b.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n")))
    w = (Window.partitionBy("event_type").orderBy("bin")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = (hist.withColumn("cn", F.sum("n").over(w))
           .withColumn("total", F.sum("n").over(
               Window.partitionBy("event_type"))))
    picks = []
    for q, name in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
        need = F.ceil(F.col("total") * F.lit(q))
        picks.append(
            F.min(F.when(F.col("cn") >= need, F.col("bin")))
            .alias(f"_{name}_bin"))
    agg = cum.groupBy("event_type").agg(*picks,
                                        F.max("total").alias("n_events"))
    sel = [F.col("event_type"),
           F.col("n_events").cast("bigint").alias("n_events")]
    for name in ("p50", "p95", "p99"):
        sel.append((F.lit(lo) + F.col(f"_{name}_bin").cast("double")
                    * F.lit(width)).alias(name))
    return (agg.select(*sel, F.lit(width).alias("max_err"))
            .orderBy("event_type"))


def _q106_sql() -> str:
    k = HIST_Q_BINS
    return f"""
WITH bounds AS (
  SELECT MIN(value) AS lo, MAX(value) AS hi FROM events
), params AS (
  SELECT lo, CASE WHEN hi > lo THEN (hi - lo) / {k} ELSE 1.0 END AS w
  FROM bounds
), hist AS (
  SELECT event_type,
    LEAST(floor((value - p.lo) / p.w), {k - 1}) AS bin,
    COUNT(*) AS n
  FROM events, params p
  GROUP BY event_type, bin
), cum AS (
  SELECT event_type, bin, n,
    SUM(n) OVER (PARTITION BY event_type ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
    SUM(n) OVER (PARTITION BY event_type) AS total
  FROM hist
), agg AS (
  SELECT event_type, MAX(total) AS n_events,
    MIN(CASE WHEN cn >= ceil(total * 0.5) THEN bin END) AS b50,
    MIN(CASE WHEN cn >= ceil(total * 0.95) THEN bin END) AS b95,
    MIN(CASE WHEN cn >= ceil(total * 0.99) THEN bin END) AS b99
  FROM cum GROUP BY event_type
)
SELECT event_type,
  CAST(n_events AS BIGINT) AS n_events,
  (SELECT lo FROM params) + CAST(b50 AS DOUBLE) * (SELECT w FROM params)
    AS p50,
  (SELECT lo FROM params) + CAST(b95 AS DOUBLE) * (SELECT w FROM params)
    AS p95,
  (SELECT lo FROM params) + CAST(b99 AS DOUBLE) * (SELECT w FROM params)
    AS p99,
  (SELECT w FROM params) AS max_err
FROM agg ORDER BY event_type
"""


register(QuerySpec("q106_histogram_quantiles", q106_histogram_quantiles,
                   _q106_sql(),
                   description="mergeable fixed-bin histogram quantiles "
                               "(p50/p95/p99 + declared one-bin error "
                               "bound) — deterministic "
                               "approx_percentile twin that "
                               "oracle-checks"))


# --- q107: spend-quintile migration matrix -------------------------------------------

def q107_quintile_migration(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Customer spend-quintile migration between the data's two date
    halves — the period-over-period CRM movement matrix (who climbed,
    who lapsed, who arrived): counts per (quintile_then,
    quintile_now) cell, with NULL cells for customers present in only
    one period (new arrivals / churned).

    The split date is the exact integer midpoint of the order-date
    range (the SCD2 time-travel probe idiom — deterministic, derived
    from the data). Each period's quintile uses the q82 discipline:
    binned two-phase rank over spend (parallelism ∝ bins, never one
    ntile task) and the pure-arithmetic (rank-1)*5 div n + 1 cut. The
    migration join is customer-keyed; output is <= 36 cells.
    """
    from downscaledclimatedata_spark.functions.ranks import (
        binned_row_number, value_bin)

    orders = _t(spark, sf_dir, "orders")
    b = orders.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi")).first()
    mid_days = int((b["hi"] - b["lo"]).days // 2)

    def quintiles(df):
        per = (df.groupBy("o_custkey")
               .agg(F.sum(F.round(F.col("o_totalprice") * 100)
                          .cast("bigint")).alias("cents")))
        st = per.agg(F.min("cents"), F.max("cents")).first()
        lo, hi = float(st[0] or 0), float(st[1] or 0)
        ranked = binned_row_number(
            per.withColumn("_cb", value_bin(F.col("cents")
                                            .cast("double"), lo, hi)),
            "_cb", ("cents", "o_custkey"), out="rk", count_col="n")
        # `div`, not `/`: exact integer quintile cut at any magnitude
        # (double division drifts past ~2^53)
        return ranked.select(
            "o_custkey",
            (F.expr("((rk - 1) * 5) div n") + 1).alias("quintile"))

    split = F.datediff(F.col("o_orderdate").cast("date"),
                       F.lit(b["lo"])) <= mid_days
    q_then = quintiles(orders.filter(split)) \
        .withColumnRenamed("quintile", "q_then")
    q_now = quintiles(orders.filter(~split)) \
        .withColumnRenamed("quintile", "q_now")
    return (q_then.join(q_now.hint("merge"), "o_custkey", "full_outer")
            .groupBy("q_then", "q_now")
            .agg(F.count(F.lit(1)).alias("n_customers"))
            .select(F.col("q_then").cast("bigint").alias("q_then"),
                    F.col("q_now").cast("bigint").alias("q_now"),
                    F.col("n_customers").cast("bigint")
                    .alias("n_customers"))
            .orderBy("q_then", "q_now"))


def _q107_sql() -> str:
    per = """
  SELECT o_custkey,
    SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders WHERE {pred} GROUP BY o_custkey"""
    quint = """
  SELECT o_custkey,
    ((ROW_NUMBER() OVER (ORDER BY cents, o_custkey) - 1) * 5)
      // COUNT(*) OVER () + 1 AS quintile
  FROM ({per})"""
    pred1 = ("date_diff('day', (SELECT MIN(o_orderdate) FROM orders), "
             "o_orderdate) <= (SELECT (date_diff('day', "
             "MIN(o_orderdate), MAX(o_orderdate))) // 2 FROM orders)")
    q1 = quint.format(per=per.format(pred=pred1))
    q2 = quint.format(per=per.format(pred=f"NOT ({pred1})"))
    return f"""
WITH q_then AS ({q1}), q_now AS ({q2})
SELECT CAST(t.quintile AS BIGINT) AS q_then,
  CAST(n.quintile AS BIGINT) AS q_now,
  CAST(COUNT(*) AS BIGINT) AS n_customers
FROM q_then t FULL OUTER JOIN q_now n USING (o_custkey)
GROUP BY 1, 2 ORDER BY 1, 2
"""


register(QuerySpec("q107_quintile_migration", q107_quintile_migration,
                   _q107_sql(),
                   description="period-over-period spend-quintile "
                               "migration matrix: binned-rank quintiles "
                               "per date half, full-outer customer join "
                               "-> <=36 cells incl. new/churned NULLs"))


# --- q108: peak concurrent sessions ---------------------------------------------------

def q108_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneous sessions (capacity planning's first number):
    sessions are q36's gap rule; each contributes +1 at its start and
    -1 after its end; the running sum's maximum is the peak.

    The sweep needs a GLOBAL time order — realized with the
    two-phase-binned prefix-sum (the running-sum generalization of
    functions/ranks.binned_row_number): running delta sums inside
    (time-bin) windows + per-bin totals cumulated over the bounded bin
    relation and broadcast back. Parallelism ∝ bins; no single-task
    ORDER BY over the delta stream. Tie rule at equal seconds: starts
    (+1) before ends (-1), then (user, session) — instantaneous
    sessions count, and both engines sweep the identical sequence.
    """
    from downscaledclimatedata_spark.functions.ranks import value_bin

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = ev.select(
        "user_id", "event_id", "ts",
        F.when((F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts", 1).over(w))) > 300, 1)
        .otherwise(0).alias("new_session"))
    sess = (gapped.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(F.unix_timestamp(F.min("ts")).alias("t_start"),
             F.unix_timestamp(F.max("ts")).alias("t_end")))
    deltas = (sess.select("user_id", "session_id",
                          F.col("t_start").alias("t"),
                          F.lit(1).alias("d"))
              .unionByName(
                  sess.select("user_id", "session_id",
                              (F.col("t_end") + 1).alias("t"),
                              F.lit(-1).alias("d"))))
    st = deltas.agg(F.min("t"), F.max("t")).first()
    lo, hi = float(st[0] or 0), float(st[1] or 0)
    binned = deltas.withColumn(
        "_tb", value_bin(F.col("t").cast("double"), lo, hi))
    order = [F.col("t"), F.col("d").desc(), F.col("user_id"),
             F.col("session_id")]
    wb = Window.partitionBy("_tb").orderBy(*order)
    run = binned.withColumn("_rs", F.sum("d").over(
        wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    totals = binned.groupBy("_tb").agg(F.sum("d").alias("_bt"))
    woff = (Window.orderBy("_tb")
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = totals.select(
        "_tb", F.coalesce(F.sum("_bt").over(woff), F.lit(0))
        .alias("_off"))
    swept = run.join(F.broadcast(offs), "_tb") \
        .select((F.col("_rs") + F.col("_off")).alias("conc"))
    n_sessions = sess.agg(F.count(F.lit(1)).alias("n_sessions"))
    return (swept.agg(F.max("conc").alias("peak_concurrency"))
            .crossJoin(F.broadcast(n_sessions))
            .select(F.col("n_sessions").cast("bigint").alias("n_sessions"),
                    F.col("peak_concurrency").cast("bigint")
                    .alias("peak_concurrency")))


_Q108_SQL = """
WITH gapped AS (
  SELECT user_id, event_id, ts,
    CASE WHEN date_diff('second', LAG(ts, 1) OVER w, ts) > 300
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessioned AS (
  SELECT user_id, ts,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM gapped
), sess AS (
  SELECT user_id, session_id,
    floor(epoch(MIN(ts))) AS t_start,
    floor(epoch(MAX(ts))) AS t_end
  FROM sessioned GROUP BY user_id, session_id
), deltas AS (
  SELECT user_id, session_id, t_start AS t, 1 AS d FROM sess
  UNION ALL
  SELECT user_id, session_id, t_end + 1 AS t, -1 AS d FROM sess
), swept AS (
  SELECT SUM(d) OVER (ORDER BY t, d DESC, user_id, session_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
  FROM deltas
)
SELECT CAST((SELECT COUNT(*) FROM sess) AS BIGINT) AS n_sessions,
  CAST(MAX(conc) AS BIGINT) AS peak_concurrency
FROM swept
"""

register(QuerySpec("q108_peak_concurrency", q108_peak_concurrency,
                   _Q108_SQL,
                   description="peak simultaneous sessions via the "
                               "two-phase-binned PREFIX SUM (the "
                               "running-sum generalization of the "
                               "binned rank) — no single-task global "
                               "sweep"))


# --- q109: time-to-convert distribution ----------------------------------------------

def q109_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of view -> purchase latency: for every converting
    user, the delay between their first view and the earliest purchase
    STRICTLY AFTER it (q94's chain semantics, not first-timestamps),
    bucketed in capped hours — the histogram a growth team reads
    before setting retargeting windows.

    Two struct-min aggregations chained by one user-keyed merge join
    (no event-stream window); delays are whole-second differences
    (unix_timestamp / floor(epoch()) on each side); the bucket relation
    is <= 49 rows.
    """
    ev = _t(spark, sf_dir, "events")
    v1 = (ev.filter(F.col("event_type") == "view")
          .groupBy("user_id")
          .agg(F.min(F.struct("ts", "event_id")).alias("m"))
          .select("user_id", F.col("m.ts").alias("v_ts"),
                  F.col("m.event_id").alias("v_id")))
    after = ((F.col("ts") > F.col("v_ts"))
             | ((F.col("ts") == F.col("v_ts"))
                & (F.col("event_id") > F.col("v_id"))))
    p1 = (ev.filter(F.col("event_type") == "purchase")
          .join(v1.hint("merge"), "user_id")
          .filter(after)
          .groupBy("user_id")
          .agg(F.min(F.struct("ts", "event_id")).alias("m"),
               F.max("v_ts").alias("v_ts"))
          .select("user_id",
                  (F.unix_timestamp(F.col("m.ts"))
                   - F.unix_timestamp("v_ts")).alias("delay_sec")))
    bucket = F.least(F.floor(F.col("delay_sec") / 3600),
                     F.lit(48)).cast("bigint")
    return (p1.groupBy(bucket.alias("hour_bucket"))
            .agg(F.count(F.lit(1)).alias("n_users"))
            .select("hour_bucket",
                    F.col("n_users").cast("bigint").alias("n_users"))
            .orderBy("hour_bucket"))


_Q109_SQL = """
WITH v1 AS (
  SELECT user_id, t AS v_ts, e AS v_id FROM (
    SELECT user_id, ts AS t, event_id AS e,
      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        AS rn
    FROM events WHERE event_type = 'view') WHERE rn = 1
), p1 AS (
  SELECT ev.user_id,
    MIN(floor(epoch(ev.ts))) - MAX(floor(epoch(v1.v_ts))) AS delay_sec
  FROM events ev JOIN v1 USING (user_id)
  WHERE ev.event_type = 'purchase'
    AND (ev.ts > v1.v_ts
         OR (ev.ts = v1.v_ts AND ev.event_id > v1.v_id))
  GROUP BY ev.user_id
)
SELECT CAST(LEAST(floor(delay_sec / 3600), 48) AS BIGINT) AS hour_bucket,
  CAST(COUNT(*) AS BIGINT) AS n_users
FROM p1 GROUP BY hour_bucket ORDER BY hour_bucket
"""

register(QuerySpec("q109_time_to_convert", q109_time_to_convert,
                   _Q109_SQL,
                   description="view->purchase latency histogram with "
                               "q94's strict chain semantics: two "
                               "struct-min passes, capped hour buckets"))


# --- q110: open-order backlog aging --------------------------------------------------

def q110_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backlog aging: non-finished orders (status O/P) bucketed by age
    in quarters at the data's horizon (max order date), with order
    counts and exact value mass per (status, age bucket) — the ops
    report that shows whether the backlog is fresh churn or fossilized
    debt.

    One scan; the horizon is a single-row broadcast; buckets are
    truncating integer division of day ages (both engines agree on
    nonnegative operands); value mass in exact cents.
    """
    orders = _t(spark, sf_dir, "orders")
    mx = orders.agg(F.max(F.col("o_orderdate").cast("date"))
                    .alias("horizon"))
    aged = (orders.filter(F.col("o_orderstatus") != "F")
            .crossJoin(F.broadcast(mx))
            .select("o_orderstatus",
                    (F.datediff("horizon",
                                F.col("o_orderdate").cast("date"))
                     / F.lit(90)).cast("bigint").alias("age_q"),
                    F.round(F.col("o_totalprice") * 100).cast("bigint")
                    .alias("cents")))
    bucket = F.least(F.col("age_q"), F.lit(12))
    return (aged.groupBy("o_orderstatus", bucket.alias("age_quarters"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum("cents").alias("value_cents"))
            .select("o_orderstatus",
                    F.col("age_quarters").cast("bigint")
                    .alias("age_quarters"),
                    F.col("n_orders").cast("bigint").alias("n_orders"),
                    F.col("value_cents").cast("bigint")
                    .alias("value_cents"))
            .orderBy("o_orderstatus", "age_quarters"))


_Q110_SQL = """
WITH mx AS (SELECT MAX(o_orderdate) AS horizon FROM orders)
SELECT o_orderstatus,
  CAST(LEAST(date_diff('day', o_orderdate, mx.horizon) // 90, 12)
       AS BIGINT) AS age_quarters,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    AS value_cents
FROM orders, mx
WHERE o_orderstatus <> 'F'
GROUP BY o_orderstatus, age_quarters
ORDER BY o_orderstatus, age_quarters
"""

register(QuerySpec("q110_backlog_aging", q110_backlog_aging, _Q110_SQL,
                   description="open-order backlog aging: quarter "
                               "buckets at the data horizon, exact "
                               "cents mass per (status, age)"))


# --- q111: min-cost supplier per part (TPC-H Q2 shape) ---------------------------

def q111_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted to the fixture (no partsupp table): for every
    size-multiple-of-10 part, the cheapest ASIA-region supplier, where
    a (part, supplier) supply cost is the MIN observed line price.
    The correlated-min-subquery shape realized as two aggregates and a
    struct-min argmax (deterministic: suppkey tie-break).

    Scale: part filter FIRST (merge join prunes lineitem to 1/10 of
    parts), supplier region filter via broadcast nation; both groupBys
    partial-aggregate map-side; no window, no correlated re-scan.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    asia_nk = (nation.join(F.broadcast(region.filter(
        F.col("r_name") == "ASIA")),
        nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey"))
    asia_supp = supp.join(F.broadcast(asia_nk),
                          supp.s_nationkey == asia_nk.n_nationkey) \
        .select("s_suppkey")
    parts = part.filter(F.col("p_size") % 10 == 0) \
        .select("p_partkey", "p_name")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    cost = (li.join(parts.hint("merge"), li.l_partkey == parts.p_partkey)
            .join(asia_supp.hint("merge"),
                  li.l_suppkey == asia_supp.s_suppkey)
            .groupBy("p_partkey", "p_name", "s_suppkey")
            .agg(F.min(cents).alias("cost_cents")))
    return (cost.groupBy("p_partkey", "p_name")
            .agg(F.min(F.struct(F.col("cost_cents"),
                                F.col("s_suppkey"))).alias("w"))
            .select(F.col("p_partkey").cast("bigint").alias("p_partkey"),
                    "p_name",
                    F.col("w.s_suppkey").cast("bigint").alias("s_suppkey"),
                    F.col("w.cost_cents").cast("bigint")
                    .alias("cost_cents")))
    # no trailing orderBy: one row per qualifying part — part-scaled


_Q111_SQL = """
WITH asia AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'ASIA'
), cost AS (
  SELECT p_partkey, p_name, l_suppkey AS s_suppkey,
    MIN(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_cents
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN asia ON s_suppkey = l_suppkey
  WHERE p_size % 10 = 0
  GROUP BY 1, 2, 3
), elect AS (
  SELECT p_partkey, p_name,
    MIN({'cost_cents': cost_cents, 's_suppkey': s_suppkey}) AS w
  FROM cost GROUP BY 1, 2
)
SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_name,
  CAST((w).s_suppkey AS BIGINT) AS s_suppkey,
  CAST((w).cost_cents AS BIGINT) AS cost_cents
FROM elect
"""

register(QuerySpec("q111_min_cost_supplier", q111_min_cost_supplier,
                   _Q111_SQL,
                   description="TPC-H Q2 shape: cheapest in-region "
                               "supplier per filtered part — correlated "
                               "min as two aggregates + struct-min "
                               "argmax, exact cents"))


# --- q112: nation-pair trade matrix (TPC-H Q7 shape) -----------------------------

def q112_nation_trade_matrix(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """TPC-H Q7: discounted revenue shipped between DIFFERENT
    supplier/customer nations per ship year. Three corpus-keyed joins
    (orders, customer, supplier) with both nation legs broadcast; the
    output is the bounded |nations|^2 x years matrix, aggregated with
    map-side partials. Exact DECIMAL revenue, one double cast per row.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")

    n1 = nation.select(F.col("n_nationkey").alias("snk"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("cnk"),
                       F.col("n_name").alias("cust_nation"))
    rev = dec("l_extendedprice", 2) * (F.lit(1) - dec("l_discount", 2))
    j = (li
         .join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
         .join(cust.hint("merge"), orders.o_custkey == cust.c_custkey)
         .join(supp.hint("merge"), li.l_suppkey == supp.s_suppkey)
         .join(F.broadcast(n1), F.col("s_nationkey") == F.col("snk"))
         .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cnk"))
         .filter(F.col("snk") != F.col("cnk")))
    return (j.groupBy("supp_nation", "cust_nation",
                      F.year("l_shipdate").alias("l_year"))
            .agg(F.sum(rev).alias("rev"),
                 F.count(F.lit(1)).alias("n_lines"))
            .select("supp_nation", "cust_nation",
                    F.col("l_year").cast("int").alias("l_year"),
                    F.col("rev").cast("double").alias("volume"),
                    F.col("n_lines").cast("bigint").alias("n_lines")))


_Q112_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(year(l_shipdate) AS INT) AS l_year,
  CAST(SUM({dec_sql('l_extendedprice')}
           * (1 - {dec_sql('l_discount')})) AS DOUBLE) AS volume,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE n1.n_nationkey <> n2.n_nationkey
GROUP BY 1, 2, 3
"""

register(QuerySpec("q112_nation_trade_matrix", q112_nation_trade_matrix,
                   _Q112_SQL,
                   description="TPC-H Q7: cross-nation trade volume per "
                               "ship year — 3 fact joins + 2 broadcast "
                               "nation legs, bounded matrix output"))


# --- q113: product-line profit by nation/year (TPC-H Q9 shape) -------------------

def q113_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted (no partsupp): profit = discounted revenue
    minus a 0.9 x retail-price x quantity supply cost, for parts whose
    name contains 'red', grouped by supplier nation and order year.
    All money stays DECIMAL end-to-end (0.90 and quantity are exact
    decimals), one double cast per output row.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")

    reds = part.filter(F.col("p_name").contains("red")) \
        .select("p_partkey", "p_retailprice")
    rev = dec("l_extendedprice", 2) * (F.lit(1) - dec("l_discount", 2))
    cost = (dec("p_retailprice", 2) * F.lit("0.90").cast("decimal(4,2)")
            * dec("l_quantity", 2))
    j = (li.join(reds.hint("merge"), li.l_partkey == reds.p_partkey)
         .join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
         .join(supp.hint("merge"), li.l_suppkey == supp.s_suppkey)
         .join(F.broadcast(nation),
               F.col("s_nationkey") == F.col("n_nationkey")))
    return (j.groupBy(F.col("n_name").alias("nation"),
                      F.year("o_orderdate").alias("o_year"))
            .agg(F.sum(rev - cost).alias("profit"))
            .select("nation", F.col("o_year").cast("int").alias("o_year"),
                    F.col("profit").cast("double").alias("profit")))


_Q113_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
  CAST(SUM({dec_sql('l_extendedprice')} * (1 - {dec_sql('l_discount')})
           - {dec_sql('p_retailprice')} * CAST(0.90 AS DECIMAL(4,2))
             * {dec_sql('l_quantity')}) AS DOUBLE) AS profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""

register(QuerySpec("q113_product_profit", q113_product_profit, _Q113_SQL,
                   description="TPC-H Q9 shape: nation/year profit on a "
                               "part-name filter, exact decimal "
                               "revenue-minus-cost"))


# --- q114: top supplier(s) by window revenue, ties kept (TPC-H Q15) --------------

def q114_top_supplier_ties(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) achieving the MAX revenue over a fixed
    ship-date quarter — the ties-ALL argmax (Q15's subtlety: every
    supplier equal to the max is returned, so a struct-argmax would be
    wrong). Exact DECIMAL revenue compared for equality against the
    broadcast single-row max; the double cast happens after the
    comparison, so ties are decided on exact values.
    """
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    win = li.filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate").cast("date") < F.lit("1996-04-01")))
    rev = dec("l_extendedprice", 2) * (F.lit(1) - dec("l_discount", 2))
    per = win.groupBy("l_suppkey").agg(F.sum(rev).alias("total_rev"))
    mx = per.agg(F.max("total_rev").alias("max_rev"))
    return (per.crossJoin(F.broadcast(mx))
            .filter(F.col("total_rev") == F.col("max_rev"))
            .join(supp.hint("merge"),
                  F.col("l_suppkey") == supp.s_suppkey)
            .select(F.col("l_suppkey").cast("bigint").alias("s_suppkey"),
                    "s_name",
                    F.col("total_rev").cast("double")
                    .alias("total_revenue")))


_Q114_SQL = f"""
WITH per AS (
  SELECT l_suppkey AS s_suppkey,
    SUM({dec_sql('l_extendedprice')} * (1 - {dec_sql('l_discount')}))
      AS total_rev
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l_shipdate AS DATE) <  DATE '1996-04-01'
  GROUP BY 1
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
  CAST(total_rev AS DOUBLE) AS total_revenue
FROM per JOIN supplier USING (s_suppkey)
WHERE total_rev = (SELECT MAX(total_rev) FROM per)
"""

register(QuerySpec("q114_top_supplier_ties", q114_top_supplier_ties,
                   _Q114_SQL,
                   description="TPC-H Q15: max-revenue supplier with "
                               "ties kept — exact-decimal equality vs a "
                               "broadcast single-row max"))


# --- q115: small-quantity revenue (TPC-H Q17 shape) ------------------------------

def q115_small_qty_revenue(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from Brand#3 lines whose quantity is below
    20% of that part's average quantity. The correlated AVG comparison
    is cross-multiplied into integers — qty * 5 * n < sum_qty — so the
    threshold is EXACT (no float average, no engine divergence at the
    boundary). One per-part aggregate broadcast back by a merge join.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    brand = part.filter(F.col("p_brand") == "Brand#3") \
        .select("p_partkey")
    lines = li.join(brand.hint("merge"), li.l_partkey == brand.p_partkey)
    qty = F.col("l_quantity").cast("bigint")
    per = lines.groupBy("p_partkey").agg(
        F.count(F.lit(1)).alias("n_part"),
        F.sum(qty).alias("sum_qty"))
    small = (lines.join(per.hint("merge"), "p_partkey")
             .filter(qty * 5 * F.col("n_part") < F.col("sum_qty")))
    return small.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(dec("l_extendedprice", 2)).cast("double")
        .alias("small_qty_revenue"))


_Q115_SQL = f"""
WITH lines AS (
  SELECT l_partkey AS p_partkey,
    CAST(l_quantity AS BIGINT) AS qty, l_extendedprice
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#3'
), per AS (
  SELECT p_partkey, COUNT(*) AS n_part, SUM(qty) AS sum_qty
  FROM lines GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
  CAST(SUM({dec_sql('l_extendedprice')}) AS DOUBLE) AS small_qty_revenue
FROM lines JOIN per USING (p_partkey)
WHERE qty * 5 * n_part < sum_qty
"""

register(QuerySpec("q115_small_qty_revenue", q115_small_qty_revenue,
                   _Q115_SQL,
                   description="TPC-H Q17: below-20%-of-part-average "
                               "quantity revenue — correlated avg "
                               "cross-multiplied to exact integers"))


# --- q116: large-volume orders (TPC-H Q18 shape) ---------------------------------

Q116_QTY_THRESHOLD = 250


def q116_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total line quantity exceeds the
    threshold, with their customer. The IN-(grouped-HAVING-subquery)
    shape realized as aggregate-then-join; integer quantity sums are
    exact, and the HAVING prunes BEFORE the orders/customer joins so
    only qualifying orderkeys (rare) reach them.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast("bigint"))
                .alias("sum_qty"))
           .filter(F.col("sum_qty") > Q116_QTY_THRESHOLD))
    return (big.join(orders.hint("merge"),
                     big.l_orderkey == orders.o_orderkey)
            .join(cust.hint("merge"), orders.o_custkey == cust.c_custkey)
            .select(F.col("c_custkey").cast("bigint").alias("c_custkey"),
                    "c_name",
                    F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
                    F.col("o_orderdate").cast("date").alias("o_orderdate"),
                    F.col("o_totalprice").cast("double")
                    .alias("o_totalprice"),
                    F.col("sum_qty").cast("bigint").alias("sum_qty")))
    # no trailing orderBy: output is order-keyed (corpus-proportional)


_Q116_SQL = f"""
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
  FROM lineitem GROUP BY 1
  HAVING SUM(CAST(l_quantity AS BIGINT)) > {Q116_QTY_THRESHOLD}
)
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
  CAST(o_orderkey AS BIGINT) AS o_orderkey,
  CAST(o_orderdate AS DATE) AS o_orderdate,
  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
  CAST(sum_qty AS BIGINT) AS sum_qty
FROM big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
"""

register(QuerySpec("q116_large_orders", q116_large_orders, _Q116_SQL,
                   description="TPC-H Q18: grouped-HAVING order volume "
                               "filter before the customer join, exact "
                               "integer quantity sums"))


# --- q117: suppliers who alone delayed multi-supplier orders (TPC-H Q21) ---------

Q117_LATE_DAYS = 90


def q117_waiting_suppliers(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted to the fixture's dates (late = shipped more
    than 90 days after the order date): per supplier, the number of
    multi-supplier orders where THEY were late and NO other supplier
    was. Q21's EXISTS/NOT-EXISTS double correlation collapses into ONE
    (orderkey, suppkey) aggregate + one bounded per-order summary join
    — no self-join of lineitem against itself on the fact side.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    late = (F.col("l_shipdate").cast("date")
            > F.date_add(F.col("o_orderdate").cast("date"),
                         Q117_LATE_DAYS))
    g = (li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
         .groupBy("l_orderkey", "l_suppkey")
         .agg(F.max(late.cast("int")).alias("late")))
    per_order = g.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("late").alias("n_late"))
    blame = (g.filter(F.col("late") == 1)
             .join(per_order.hint("merge"), "l_orderkey")
             .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1)))
    return (blame.groupBy("l_suppkey")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .join(supp.hint("merge"),
                  F.col("l_suppkey") == supp.s_suppkey)
            .select(F.col("l_suppkey").cast("bigint").alias("s_suppkey"),
                    "s_name",
                    F.col("numwait").cast("bigint").alias("numwait")))
    # no trailing orderBy: supplier-keyed output (corpus-proportional)


_Q117_SQL = f"""
WITH g AS (
  SELECT l_orderkey, l_suppkey,
    MAX(CASE WHEN CAST(l_shipdate AS DATE)
              > CAST(o_orderdate AS DATE) + {Q117_LATE_DAYS}
         THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY 1, 2
), per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late
  FROM g GROUP BY 1
)
SELECT CAST(l_suppkey AS BIGINT) AS s_suppkey, s_name,
  CAST(COUNT(*) AS BIGINT) AS numwait
FROM g
JOIN per_order USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE g.late = 1 AND n_supp >= 2 AND n_late = 1
GROUP BY 1, 2
"""

register(QuerySpec("q117_waiting_suppliers", q117_waiting_suppliers,
                   _Q117_SQL,
                   description="TPC-H Q21 shape: sole-late supplier per "
                               "multi-supplier order — EXISTS/NOT-EXISTS "
                               "collapsed to one aggregate, no fact "
                               "self-join"))


# --- q118: dormant above-average customers by nation (TPC-H Q22) -----------------

def q118_dormant_customers(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted to the fixture's order density (every
    customer has SOME order, so Q22's literal no-orders-ever set is
    empty): customers with no order in the last 365 days of the data
    whose balance exceeds the average positive balance, counted per
    nation. The scalar-subquery average is cross-multiplied into exact
    integers (cents * n > sum_cents) against a broadcast single-row
    global; the NOT EXISTS is a left-anti join against the
    recent-order custkeys; output is the bounded nation summary.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    pos = cust.filter(F.col("c_acctbal") > 0) \
        .select("c_custkey", "c_nationkey", cents.alias("cents"))
    glob = pos.agg(F.sum("cents").alias("sum_cents"),
                   F.count(F.lit(1)).alias("n_pos"))
    rich = (pos.crossJoin(F.broadcast(glob))
            .filter(F.col("cents") * F.col("n_pos") > F.col("sum_cents")))
    hz = orders.agg(F.max(F.col("o_orderdate").cast("date"))
                    .alias("horizon"))
    recent = (orders.crossJoin(F.broadcast(hz))
              .filter(F.col("o_orderdate").cast("date")
                      >= F.date_sub(F.col("horizon"), 365))
              .select("o_custkey"))
    dormant = rich.join(recent.hint("merge"),
                        rich.c_custkey == F.col("o_custkey"), "left_anti")
    return (dormant.join(F.broadcast(nation),
                         F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias("nation"))
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.sum("cents").alias("bal_cents"))
            .select("nation",
                    F.col("n_customers").cast("bigint")
                    .alias("n_customers"),
                    (F.col("bal_cents").cast("double") / 100.0)
                    .alias("total_balance")))


_Q118_SQL = """
WITH pos AS (
  SELECT c_custkey, c_nationkey,
    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer WHERE c_acctbal > 0
), gl AS (
  SELECT SUM(cents) AS sum_cents, COUNT(*) AS n_pos FROM pos
), recent AS (
  SELECT o_custkey FROM orders
  WHERE CAST(o_orderdate AS DATE)
        >= (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders) - 365
)
SELECT n_name AS nation,
  CAST(COUNT(*) AS BIGINT) AS n_customers,
  CAST(SUM(cents) AS DOUBLE) / 100.0 AS total_balance
FROM pos CROSS JOIN gl
JOIN nation ON n_nationkey = c_nationkey
WHERE cents * n_pos > sum_cents
  AND NOT EXISTS (SELECT 1 FROM recent WHERE o_custkey = c_custkey)
GROUP BY 1
"""

register(QuerySpec("q118_dormant_customers", q118_dormant_customers,
                   _Q118_SQL,
                   description="TPC-H Q22 shape: recency-dormant "
                               "customers above the exact average "
                               "positive balance, per nation — cross-"
                               "multiplied scalar subquery + anti join"))


# --- q119: shipping punctuality by priority class (TPC-H Q12 shape) --------------

Q119_LATE_DAYS = 60


def q119_priority_punctuality(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted to the fixture (no shipmode/commitdate): per
    ship YEAR, how many lines of high-priority (1-URGENT/2-HIGH) vs
    lower-priority orders shipped more than 60 days after the order
    date. Q12's conditional CASE aggregation over a fact join; exact
    integer counts, bounded |years| output.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    late = (F.col("l_shipdate").cast("date")
            > F.date_add(F.col("o_orderdate").cast("date"),
                         Q119_LATE_DAYS))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
    return (j.groupBy(F.year("l_shipdate").alias("l_year"))
            .agg(F.sum((high & late).cast("bigint"))
                 .alias("high_late"),
                 F.sum((high & ~late).cast("bigint"))
                 .alias("high_ontime"),
                 F.sum(((~high) & late).cast("bigint"))
                 .alias("low_late"),
                 F.sum(((~high) & ~late).cast("bigint"))
                 .alias("low_ontime"))
            .select(F.col("l_year").cast("int").alias("l_year"),
                    F.col("high_late").cast("bigint").alias("high_late"),
                    F.col("high_ontime").cast("bigint")
                    .alias("high_ontime"),
                    F.col("low_late").cast("bigint").alias("low_late"),
                    F.col("low_ontime").cast("bigint")
                    .alias("low_ontime")))


_Q119_SQL = f"""
SELECT CAST(year(l_shipdate) AS INT) AS l_year,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             AND CAST(l_shipdate AS DATE)
                 > CAST(o_orderdate AS DATE) + {Q119_LATE_DAYS}
            THEN 1 ELSE 0 END) AS BIGINT) AS high_late,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             AND NOT (CAST(l_shipdate AS DATE)
                      > CAST(o_orderdate AS DATE) + {Q119_LATE_DAYS})
            THEN 1 ELSE 0 END) AS BIGINT) AS high_ontime,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             AND CAST(l_shipdate AS DATE)
                 > CAST(o_orderdate AS DATE) + {Q119_LATE_DAYS}
            THEN 1 ELSE 0 END) AS BIGINT) AS low_late,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             AND NOT (CAST(l_shipdate AS DATE)
                      > CAST(o_orderdate AS DATE) + {Q119_LATE_DAYS})
            THEN 1 ELSE 0 END) AS BIGINT) AS low_ontime
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY 1
"""

register(QuerySpec("q119_priority_punctuality",
                   q119_priority_punctuality, _Q119_SQL,
                   description="TPC-H Q12 shape: late vs on-time line "
                               "counts by priority class per ship year "
                               "— conditional CASE aggregation, exact "
                               "integers"))


# --- q120: supplier diversity per part class (TPC-H Q16 shape) -------------------

def q120_supplier_diversity(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted (no partsupp: supply evidence = observed
    lineitem pairs): DISTINCT supplier count per (p_type, p_size)
    class, excluding Brand#13 parts. Q16's distinct-count-after-
    exclusion shape: the (part, supplier) evidence relation is
    DISTINCT-ed once (map-side partial dedup), the exclusion is a
    dimension filter BEFORE the fact join, and the bounded class
    relation aggregates countDistinct.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    keep = part.filter(F.col("p_brand") != "Brand#13") \
        .select("p_partkey", "p_type", "p_size")
    ev = (li.join(keep.hint("merge"), li.l_partkey == keep.p_partkey)
          .select("p_type", "p_size", "l_suppkey").distinct())
    return (ev.groupBy("p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .select("p_type", F.col("p_size").cast("int").alias("p_size"),
                    F.col("supplier_cnt").cast("bigint")
                    .alias("supplier_cnt")))


_Q120_SQL = """
SELECT p_type, CAST(p_size AS INT) AS p_size,
  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13'
GROUP BY 1, 2
"""

register(QuerySpec("q120_supplier_diversity", q120_supplier_diversity,
                   _Q120_SQL,
                   description="TPC-H Q16 shape: distinct suppliers per "
                               "(type, size) part class after brand "
                               "exclusion — distinct-then-count over "
                               "supply evidence"))


# --- q121: inter-arrival gap quantiles per event type ----------------------------

def q121_gap_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 inter-arrival gaps per event type — the
    latency-distribution table q99's fixed histogram approximates,
    with EXACT-RATIONAL interpolation from the shared
    ``grouped_quantile_cont`` machinery (functions/ranks.py): gaps are
    integer microseconds ~1e11, where the float ``lo + frac*(hi-lo)``
    path is ulp-divergent across engines, so the quantiles are carried
    as integer numerators ``lo*den + m*(hi-lo)`` with ONE final
    division (den = 2/10/100) — bit-identical in both engines. The
    oracle mirrors the same order-statistics formula instead of
    calling ``quantile_cont``.

    Each user's first event has a NULL gap (no predecessor): excluded
    from the quantile population, its event types kept with ``n_gaps``
    counting only real gaps (the r10 all-NULL-group contract).

    Plan: one lag window over (user) partitions ordered by (ts,
    event_id) — user is high-cardinality; quantile rank windows
    partition on (type, bin).
    """
    from downscaledclimatedata_spark.functions.ranks import (
        grouped_quantile_cont)

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type", "event_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
        .alias("gap_us"))
    out = grouped_quantile_cont(
        gaps, "gap_us", [((1, 2), "p50_us"), ((9, 10), "p90_us"),
                         ((99, 100), "p99_us")],
        group_cols=("event_type",), id_cols=("event_id",),
        count_name="n_gaps")
    return out.select("event_type",
                      F.col("n_gaps").cast("bigint").alias("n_gaps"),
                      "p50_us", "p90_us", "p99_us")


def _q121_point(num: int, den: int, name: str) -> str:
    """Integer-exact interpolated quantile from the ranked relation:
    fh/m carried as integers, numerator exact, ONE division."""
    fh = f"(((n - 1) * {num}) // {den})"        # per-row (inside CASE)
    m = f"(((MAX(n) - 1) * {num}) % {den})"     # grouped context
    return f"""
    CAST((MAX(CASE WHEN rk = {fh} + 1 THEN gap_us END) * {den}
          + {m} * (coalesce(MAX(CASE WHEN rk = {fh} + 2 THEN gap_us END),
                            MAX(CASE WHEN rk = {fh} + 1 THEN gap_us END))
                   - MAX(CASE WHEN rk = {fh} + 1 THEN gap_us END)))
         AS DOUBLE) / {den} AS {name}"""


def _q121_sql() -> str:
    pts = ",".join([_q121_point(1, 2, "p50_us"),
                    _q121_point(9, 10, "p90_us"),
                    _q121_point(99, 100, "p99_us")])
    return f"""
WITH g AS (
  SELECT event_type, event_id,
    epoch_us(ts) - LAG(epoch_us(ts)) OVER (
      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
  FROM events
), nn AS (
  SELECT event_type, gap_us,
    ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY gap_us, event_id) AS rk,
    COUNT(gap_us) OVER (PARTITION BY event_type) AS n
  FROM g WHERE gap_us IS NOT NULL
), q AS (
  SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_gaps,{pts}
  FROM nn GROUP BY event_type
)
-- Group list from ALL of g (not just rows with a gap): an event type
-- whose every occurrence is a user's first event must survive with
-- NULL quantiles and n_gaps = 0, mirroring the Spark contract.
SELECT t.event_type, coalesce(q.n_gaps, 0) AS n_gaps,
       q.p50_us, q.p90_us, q.p99_us
FROM (SELECT DISTINCT event_type FROM g) t
LEFT JOIN q USING (event_type)
"""


register(QuerySpec("q121_gap_quantiles", q121_gap_quantiles, _q121_sql(),
                   description="exact-rational p50/p90/p99 inter-"
                               "arrival gaps per event type — integer "
                               "numerator interpolation, one division, "
                               "bit-identical cross-engine"))


# --- q122: important parts by supply-value share (TPC-H Q11 shape) ---------------

Q122_NATION = "NATION_7"
Q122_SHARE_DEN = 500  # keep parts holding > 1/500 of the nation's value


def q122_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted (no partsupp: supply value = observed lineitem
    revenue from the nation's suppliers): parts whose share of
    NATION_7's total supply value exceeds 1/500. Q11's
    HAVING-against-a-global-scalar shape: the per-part aggregate is
    compared to the one-row grand total by a broadcast crossJoin and
    the fraction test is cross-multiplied into exact integer cents —
    ``part_cents * 500 > total_cents`` — so the threshold has no float
    boundary (reference loca2.py has no relational engine; shape parity
    is with TPC-H itself).

    Plan: nation filter reduces supplier to a broadcast dim BEFORE the
    fact join; one shuffle for the per-part agg; the grand total is a
    second aggregate over the per-part relation (never a second corpus
    pass); single-row broadcast crossJoin (BNLJ_OK).
    """
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    nsupp = (supp.join(F.broadcast(
        nation.filter(F.col("n_name") == Q122_NATION)),
        supp.s_nationkey == nation.n_nationkey)
        .select("s_suppkey"))
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    per_part = (li.join(F.broadcast(nsupp),
                        li.l_suppkey == nsupp.s_suppkey)
                .groupBy("l_partkey")
                .agg(F.sum(cents).alias("part_cents")))
    total = per_part.agg(F.sum("part_cents").alias("total_cents"))
    return (per_part.crossJoin(F.broadcast(total))
            .filter(F.col("part_cents") * Q122_SHARE_DEN
                    > F.col("total_cents"))
            .select(F.col("l_partkey").alias("p_partkey"),
                    (F.col("part_cents").cast("double") / 100.0)
                    .alias("supply_value")))
    # no trailing orderBy: part-keyed output grows with the dimension


_Q122_SQL = f"""
WITH per_part AS (
  SELECT l_partkey AS p_partkey,
    SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS part_cents
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = '{Q122_NATION}'
  GROUP BY 1
), gl AS (SELECT SUM(part_cents) AS total_cents FROM per_part)
SELECT p_partkey,
  CAST(part_cents AS DOUBLE) / 100.0 AS supply_value
FROM per_part CROSS JOIN gl
WHERE part_cents * {Q122_SHARE_DEN} > total_cents
"""

register(QuerySpec("q122_important_parts", q122_important_parts,
                   _Q122_SQL,
                   description="TPC-H Q11 shape: parts above a 1/500 "
                               "share of a nation's supply value — "
                               "cross-multiplied integer-cents "
                               "threshold vs a broadcast grand total"))


# --- q123: disjunctive-branch revenue (TPC-H Q19 shape) --------------------------

# (brand, max size, quantity lo, quantity hi) per branch
Q123_BRANCHES = (("Brand#12", 15, 1, 11),
                 ("Brand#21", 25, 10, 20),
                 ("Brand#4", 35, 20, 30))


def q123_branch_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: discounted revenue from lines matching ANY of three
    conjunctive (brand, size-range, quantity-range) branches — the
    disjunctive-predicate-pushdown shape. Each line is tagged with the
    FIRST branch it matches (branches are disjoint on quantity bounds
    here, but first-match keeps the contract explicit) and revenue is
    reported per branch, so the result shows each disjunct's
    contribution rather than one opaque total.

    Plan: the disjunction over part attributes prunes the part dim
    before the broadcast fact join; quantity conjuncts stay on the
    fact scan (pushed filters); exact DECIMAL revenue.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    pdis = F.lit(False)
    for b, sz, _, _ in Q123_BRANCHES:
        pdis = pdis | ((F.col("p_brand") == b) & (F.col("p_size") <= sz))
    pk = part.filter(pdis).select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(pk), li.l_partkey == pk.p_partkey)
    branch = F.lit(None).cast("int")
    cond_any = F.lit(False)
    for i, (b, sz, qlo, qhi) in enumerate(Q123_BRANCHES, start=1):
        c = ((F.col("p_brand") == b) & (F.col("p_size") <= sz)
             & (F.col("l_quantity") >= qlo) & (F.col("l_quantity") <= qhi))
        branch = F.when(c & ~cond_any, i).otherwise(branch)
        cond_any = cond_any | c
    return (j.withColumn("branch", branch)
            .filter(F.col("branch").isNotNull())
            .groupBy("branch")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_lines"),
                 F.sum(dec("l_extendedprice", 2)
                       * (F.lit(1) - dec("l_discount", 2)))
                 .cast("double").alias("revenue"))
            .select(F.col("branch").cast("int").alias("branch"),
                    "n_lines", "revenue"))


def _q123_sql() -> str:
    whens = []
    for i, (b, sz, qlo, qhi) in enumerate(Q123_BRANCHES, start=1):
        whens.append(f"WHEN p_brand = '{b}' AND p_size <= {sz} "
                     f"AND l_quantity >= {qlo} AND l_quantity <= {qhi} "
                     f"THEN {i}")
    case = "CASE " + " ".join(whens) + " END"
    return f"""
WITH tagged AS (
  SELECT {case} AS branch, l_extendedprice, l_discount
  FROM lineitem JOIN part ON p_partkey = l_partkey
)
SELECT CAST(branch AS INT) AS branch,
  CAST(COUNT(*) AS BIGINT) AS n_lines,
  CAST(SUM({dec_sql('l_extendedprice')}
           * (1 - {dec_sql('l_discount')})) AS DOUBLE) AS revenue
FROM tagged WHERE branch IS NOT NULL GROUP BY 1
"""

register(QuerySpec("q123_branch_revenue", q123_branch_revenue,
                   _q123_sql(),
                   description="TPC-H Q19 shape: per-branch discounted "
                               "revenue over a 3-way disjunction of "
                               "(brand, size, quantity) conjunctions"))


# --- q124: dominant-share suppliers (TPC-H Q20 shape) ----------------------------

Q124_YEAR = 1998


def q124_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted (no partsupp: availability = observed shipped
    quantity): suppliers who in 1998 shipped MORE THAN HALF of some
    part's total shipped quantity — per supplier, on how many parts
    they held that dominant share. Q20's nested half-of-aggregate
    shape with the threshold cross-multiplied into exact integers
    (``2 * supp_qty > part_qty``; quantities are integral by fixture
    contract, cast bigint).

    Plan: the year filter prunes the fact scan; ONE shuffle builds the
    (part, supplier) aggregate; the per-part total is a rollup of that
    relation (map-side combinable, never a second corpus pass); the
    supplier dim joins broadcast.
    """
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    yr = li.filter(F.year("l_shipdate") == Q124_YEAR)
    ps = (yr.groupBy("l_partkey", "l_suppkey")
          .agg(F.sum(F.col("l_quantity").cast("bigint"))
               .alias("supp_qty")))
    per_part = (ps.groupBy("l_partkey")
                .agg(F.sum("supp_qty").alias("part_qty")))
    dom = (ps.join(per_part.hint("merge"), "l_partkey")
           .filter(F.col("supp_qty") * 2 > F.col("part_qty")))
    return (dom.join(F.broadcast(supp),
                     dom.l_suppkey == supp.s_suppkey)
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).cast("bigint")
                 .alias("n_dominant_parts"),
                 F.sum("supp_qty").cast("bigint").alias("qty_held")))


_Q124_SQL = f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
    SUM(CAST(l_quantity AS BIGINT)) AS supp_qty
  FROM lineitem WHERE year(l_shipdate) = {Q124_YEAR}
  GROUP BY 1, 2
), per_part AS (
  SELECT l_partkey, SUM(supp_qty) AS part_qty FROM ps GROUP BY 1
)
SELECT s_name,
  CAST(COUNT(*) AS BIGINT) AS n_dominant_parts,
  CAST(SUM(supp_qty) AS BIGINT) AS qty_held
FROM ps JOIN per_part USING (l_partkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE supp_qty * 2 > part_qty
GROUP BY 1
"""

register(QuerySpec("q124_dominant_suppliers", q124_dominant_suppliers,
                   _Q124_SQL,
                   description="TPC-H Q20 shape: suppliers shipping "
                               "more than half of a part's yearly "
                               "quantity — exact-integer half "
                               "threshold, one fact shuffle"))


# --- q125: supplier balance percentiles (percent_rank / cume_dist / ntile) -------

def q125_supplier_percentiles(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Per-nation supplier account-balance standing: percent_rank,
    cume_dist and ntile(4) — the three ranking window functions no
    other spec exercises. The ordering key is (acctbal, suppkey), so
    ranks are tie-free and both engines compute the same
    (rank-1)/(n-1) and rank/n doubles (one integer division each — no
    accumulation order to diverge).

    Plan note: the window partitions the SUPPLIER DIMENSION by nation
    — a |suppliers|/|nations| relation, not a fact table; per-nation
    percentile standings over a dimension are the textbook use of
    these functions, and the relation is bounded by the dimension's
    size, not the corpus.
    """
    supp = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").asc(), F.col("s_suppkey").asc())
    return supp.select(
        "s_suppkey",
        F.col("s_nationkey").cast("int").alias("s_nationkey"),
        F.percent_rank().over(w).alias("bal_pct_rank"),
        F.cume_dist().over(w).alias("bal_cume_dist"),
        F.ntile(4).over(w).cast("int").alias("bal_quartile"))
    # no trailing orderBy: one row per supplier (dimension-sized)


_Q125_SQL = """
SELECT s_suppkey, CAST(s_nationkey AS INT) AS s_nationkey,
  percent_rank() OVER w AS bal_pct_rank,
  cume_dist() OVER w AS bal_cume_dist,
  CAST(ntile(4) OVER w AS INT) AS bal_quartile
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
"""

register(QuerySpec("q125_supplier_percentiles",
                   q125_supplier_percentiles, _Q125_SQL,
                   description="percent_rank / cume_dist / ntile(4) "
                               "supplier standings per nation — "
                               "tie-free ordering, single-division "
                               "doubles identical across engines"))


# --- q126: MapType higher-order pipeline (map_filter / zip / transform) ----------

Q126_MIN_EVENTS = 3


def q126_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity maps driven through the three MapType
    higher-order functions no other spec exercises: each user's
    event_type->count and event_type->cents maps are built with
    ``map_from_entries``, pruned with ``map_filter`` (types seen
    < 3 times dropped), joined value-wise with ``map_zip_with``, and
    re-scaled with ``transform_values`` (exact integer cents-per-event
    via ``div``), then exploded back to rows — map semantics in the
    plan, relational semantics in the oracle (a GROUP BY + HAVING +
    integer division computes the same rows, which is the point: the
    HOF pipeline must agree with its relational reading).

    Per-user maps are bounded by |event types|, so collect_list state
    never scales with the corpus — only with the type alphabet.
    """
    ev = _t(spark, sf_dir, "events")
    per = (ev.groupBy("user_id", "event_type")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("bigint"))
                .alias("cents")))
    maps = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))).alias("mn"),
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cents"))).alias("mc"))
    kept = maps.select(
        "user_id",
        F.map_filter("mn", lambda k, v: v >= Q126_MIN_EVENTS).alias("mn"),
        F.col("mc"))
    zipped = kept.select(
        "user_id",
        F.map_zip_with(
            "mn", "mc",
            lambda k, n, c: F.when(n.isNotNull(),
                                   F.struct(n.alias("n"),
                                            c.alias("cents")))).alias("mz"))
    # transform_values: exact truncating integer division expressed in
    # Column ops — (c - c % n) / n strips the remainder first, so the
    # double division is exact for any sign and magnitude under 2^53
    scaled = zipped.select(
        "user_id",
        F.transform_values(
            "mz",
            lambda k, v: F.when(
                v.isNotNull(),
                v.withField(
                    "avg_cents",
                    ((v["cents"] - v["cents"] % v["n"]) / v["n"])
                    .cast("long")))).alias("mz"))
    return (scaled.select("user_id",
                          F.explode("mz").alias("event_type", "v"))
            .filter(F.col("v").isNotNull())
            .select("user_id", "event_type",
                    F.col("v.n").cast("bigint").alias("n_events"),
                    F.col("v.cents").cast("bigint").alias("sum_cents"),
                    F.col("v.avg_cents").cast("bigint")
                    .alias("avg_cents_div")))


_Q126_SQL = f"""
SELECT user_id, event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
  CAST(SUM(CAST(round(value * 100) AS BIGINT))
       // COUNT(*) AS BIGINT) AS avg_cents_div
FROM events
GROUP BY 1, 2
HAVING COUNT(*) >= {Q126_MIN_EVENTS}
"""

register(QuerySpec("q126_map_hof", q126_map_hof, _Q126_SQL,
                   description="MapType HOF pipeline: map_from_entries "
                               "-> map_filter -> map_zip_with -> "
                               "explode, agreeing with its relational "
                               "GROUP BY/HAVING reading"))


# --- q130: ANSI-safe try_* arithmetic ---------------------------------------------

def q130_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user purchase-cents-per-click via ``try_divide`` — the
    ANSI-mode discipline spec. This engine runs with ANSI semantics
    (overflow/division errors ABORT, they never wrap or NULL
    silently), so intentional partial arithmetic must be spelled
    ``try_*``: users with zero clicks yield NULL, not a crash and not
    a 0. The oracle spells the same contract as an explicit CASE
    guard, which is precisely the rewrite ``try_divide`` encapsulates.
    The division is exact (integer remainder stripped first), so the
    NULL-vs-value boundary is the only behavior under test.
    """
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase",
                     F.round(F.col("value") * 100).cast("bigint"))
              .otherwise(0)).alias("purchase_cents"),
        F.sum((F.col("event_type") == "click").cast("bigint"))
        .alias("n_clicks"))
    num = (F.col("purchase_cents")
           - F.col("purchase_cents") % F.nullif(F.col("n_clicks"),
                                                F.lit(0)))
    return per.select(
        "user_id", "purchase_cents", "n_clicks",
        F.try_divide(num, F.col("n_clicks")).cast("bigint")
        .alias("cents_per_click"))


_Q130_SQL = """
WITH per AS (
  SELECT user_id,
    CAST(SUM(CASE WHEN event_type = 'purchase'
             THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
      AS BIGINT) AS purchase_cents,
    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_clicks
  FROM events GROUP BY 1
)
SELECT user_id, purchase_cents, CAST(n_clicks AS BIGINT) AS n_clicks,
  CAST(CASE WHEN n_clicks = 0 THEN NULL
       ELSE (purchase_cents - purchase_cents % n_clicks) / n_clicks
  END AS BIGINT) AS cents_per_click
FROM per
"""

register(QuerySpec("q130_try_arithmetic", q130_try_arithmetic,
                   _Q130_SQL,
                   description="ANSI-safe try_divide: zero-click users "
                               "yield NULL (never crash, never 0) — "
                               "the CASE-guard contract the oracle "
                               "spells explicitly"))


# --- q131: DISCRETE quantiles (order statistic at ceil(q*n)) ----------------------

def q131_quantile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type p50/p90 DISCRETE quantiles of event cents — the
    quantile family's other semantics: the actual data element at rank
    ``ceil(q*n)``, never an interpolated value (what a latency SLO or
    a billing threshold quotes). Ranks come from the same two-phase
    binned row_number the continuous path uses (functions/ranks.py
    discipline: windows on (type, bin), parallelism ∝ bins), and the
    rank arithmetic is pure integers — ``(n*num + den - 1) div den`` —
    so there is no float anywhere in the result.
    """
    from downscaledclimatedata_spark.functions.ranks import (
        binned_row_number, value_bin)

    ev = _t(spark, sf_dir, "events")
    d = ev.select("event_type", "event_id",
                  F.round(F.col("value") * 100).cast("bigint")
                  .alias("cents"))
    st = d.agg(F.min("cents"), F.max("cents")).first()
    lo, hi = float(st[0] or 0), float(st[1] or 0)
    binned = d.withColumn(
        "_qdb", value_bin(F.col("cents").cast("double"), lo, hi))
    ranked = binned_row_number(binned, "_qdb", ("cents", "event_id"),
                               partition_cols=("event_type",),
                               out="_rk", count_col="_n")
    r50 = F.expr("(_n * 1 + 1) div 2")
    r90 = F.expr("(_n * 9 + 9) div 10")
    return (ranked.groupBy("event_type")
            .agg(F.max("_n").cast("bigint").alias("n"),
                 F.max(F.when(F.col("_rk") == r50, F.col("cents")))
                 .cast("bigint").alias("p50_cents"),
                 F.max(F.when(F.col("_rk") == r90, F.col("cents")))
                 .cast("bigint").alias("p90_cents")))


_Q131_SQL = """
WITH d AS (
  SELECT event_type, event_id,
    CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), r AS (
  SELECT event_type, cents,
    ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY cents, event_id) AS rk,
    COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM d
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
  CAST(MAX(CASE WHEN rk = (n + 1) // 2 THEN cents END) AS BIGINT)
    AS p50_cents,
  CAST(MAX(CASE WHEN rk = (n * 9 + 9) // 10 THEN cents END) AS BIGINT)
    AS p90_cents
FROM r GROUP BY event_type
"""

register(QuerySpec("q131_quantile_disc", q131_quantile_disc, _Q131_SQL,
                   description="discrete p50/p90 (order statistic at "
                               "ceil(q*n)) per event type — pure "
                               "integer rank arithmetic on binned "
                               "two-phase ranks, no float anywhere"))


# --- q132/q133: column-codec roundtrips (from_csv / from_xml) ---------------------

def q132_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`to_csv` -> `from_csv` struct roundtrip — the per-row CSV codec
    a Kafka-style text payload pipeline needs (distinct from the FILE
    CSV source S10): each order is serialized to one CSV line,
    re-parsed with an explicit schema, and the parsed fields must
    aggregate exactly as the originals. The oracle skips the codec —
    identity is the contract — so any quoting/escaping asymmetry
    between the two directions hash-fails.
    """
    o = _t(spark, sf_dir, "orders")
    line = F.to_csv(F.struct(
        F.col("o_orderkey"), F.col("o_custkey"),
        F.col("o_orderpriority"),
        F.round(F.col("o_totalprice") * 100).cast("bigint")
        .alias("cents")))
    parsed = o.select(
        F.from_csv(line,
                   "o_orderkey bigint, o_custkey bigint, "
                   "o_orderpriority string, cents bigint").alias("r"))
    return (parsed.groupBy(F.col("r.o_orderpriority")
                           .alias("o_orderpriority"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                 F.sum("r.cents").cast("bigint").alias("sum_cents"),
                 F.countDistinct("r.o_custkey").cast("bigint")
                 .alias("n_customers")))


_Q132_SQL = """
SELECT o_orderpriority,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    AS sum_cents,
  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM orders GROUP BY 1
"""

register(QuerySpec("q132_csv_roundtrip", q132_csv_roundtrip, _Q132_SQL,
                   description="to_csv -> from_csv per-row codec "
                               "roundtrip: parsed fields aggregate "
                               "exactly as the originals (oracle skips "
                               "the codec — identity is the contract)"))


def q133_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`to_xml` -> `from_xml` struct roundtrip (Spark 4's XML column
    codec): per-event XML documents re-parsed with an explicit schema,
    re-aggregated, and compared to the codec-free oracle. XML is the
    interchange format catalog feeds still arrive in; the oracle
    contract pins entity-escaping symmetry (event types and JSON props
    pass through the XML layer byte-identical).
    """
    ev = _t(spark, sf_dir, "events")
    doc = F.to_xml(F.struct(
        F.col("event_id"), F.col("user_id"), F.col("event_type"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        F.col("props")))
    parsed = ev.select(
        F.from_xml(doc,
                   "event_id bigint, user_id bigint, "
                   "event_type string, cents bigint, props string")
        .alias("r"))
    return (parsed.groupBy(F.col("r.event_type").alias("event_type"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                 F.sum("r.cents").cast("bigint").alias("sum_cents"),
                 F.countDistinct("r.user_id").cast("bigint")
                 .alias("n_users"),
                 F.sum(F.length("r.props")).cast("bigint")
                 .alias("props_chars")))


_Q133_SQL = """
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(SUM(length(props)) AS BIGINT) AS props_chars
FROM events GROUP BY 1
"""

register(QuerySpec("q133_xml_roundtrip", q133_xml_roundtrip, _Q133_SQL,
                   description="to_xml -> from_xml per-row codec "
                               "roundtrip (Spark 4 XML functions): "
                               "parsed fields aggregate exactly as the "
                               "originals incl. JSON props through "
                               "entity escaping"))


# --- q135: interval-union coverage (gaps-and-islands merge) ---------------------

def q135_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user total COVERED time across overlapping activity
    intervals — the interval-union / gaps-and-islands merge that
    sessionization (q36, point events + gap) cannot express: each event
    opens an interval ``[ts, ts + dur)`` and overlapping or touching
    intervals must be merged before their lengths are summed, or
    double-billing inflates the answer.

    Classic island detection: per user, ordered by (start, event_id), an
    interval starts a NEW island iff the running max of all previous
    ends is strictly before its start; island ids are the running sum of
    those starts; coverage per island is ``max(end) - min(start)``.
    Duration is a deterministic integer minute count derived from
    event_id via ``pmod`` (the fixture has no duration column), so it is
    1..7 minutes and strictly positive even for negative ids — no
    zero-/negative-length intervals can reach the island logic — and all
    arithmetic is integer microseconds, no float time math to drift
    across engines.

    Scale shape: both window passes partition on ``user_id`` (high
    cardinality — parallelism ∝ users, the C4-clean shape) with the SAME
    (user_id, start, event_id) ordering, so Catalyst evaluates them in
    one shuffle + one sort; the island rollup and the per-user rollup
    are partial-aggregated map-side. Tie-safety: two intervals sharing a
    start overlap each other by construction, so either tie order lands
    them in the same island and max/min make the result order-blind.
    """
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        "user_id", "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts")
         + (F.pmod(F.col("event_id"), F.lit(7)) + 1)
         * F.lit(60_000_000)).alias("e"))
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    prev_end = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    marked = iv.withColumn(
        "ni", F.when(prev_end >= F.col("s"), F.lit(0)).otherwise(F.lit(1)))
    isl = marked.withColumn(
        "island", F.sum("ni").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    per_isl = (isl.groupBy("user_id", "island")
               .agg((F.max("e") - F.min("s")).alias("cov")))
    return (per_isl.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_islands"),
                 F.sum("cov").cast("bigint").alias("covered_us")))


_Q135_SQL = """
WITH iv AS (
  SELECT user_id, event_id, epoch_us(ts) AS s,
    epoch_us(ts) + (((event_id % 7) + 7) % 7 + 1) * 60000000 AS e
  FROM events
), marked AS (
  SELECT user_id, event_id, s, e,
    CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              >= s
         THEN 0 ELSE 1 END AS ni
  FROM iv
), isl AS (
  SELECT user_id, s, e,
    SUM(ni) OVER (PARTITION BY user_id ORDER BY s, event_id
                  ROWS UNBOUNDED PRECEDING) AS island
  FROM marked
), per_isl AS (
  SELECT user_id, island, MAX(e) - MIN(s) AS cov
  FROM isl GROUP BY user_id, island
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
  CAST(SUM(cov) AS BIGINT) AS covered_us
FROM per_isl GROUP BY user_id
"""

register(QuerySpec("q135_interval_coverage", q135_interval_coverage,
                   _Q135_SQL,
                   description="interval-union coverage per user: "
                               "overlap-merged islands (running-max-end "
                               "window on the high-cardinality user key), "
                               "integer-microsecond lengths"))


# --- q136: exact weighted median per group (binned weighted prefix sum) ----------

def q136_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact LOWER weighted median of extended price per return flag,
    weighted by quantity — "the price at which half the unit volume
    sits below": the robust revenue statistic plain medians (each row
    counted once) misstate whenever order sizes vary.

    Definition (engine-agnostic, no interpolation rule to drift): order
    rows by (price, orderkey, linenumber); the weighted median is the
    first price whose running weight reaches half the group's total
    weight — the crossing row satisfies ``2*cumw >= W`` and
    ``2*(cumw - w) < W``, which names exactly one row per group.

    Scale shape: the running weight is the two-phase-binned PREFIX SUM
    (q108's discipline, here per group): in-bin running sums under
    windows partitioned on (flag, price-bin) — parallelism ∝ bins,
    never ∝ |flags| — plus per-bin totals cumulated over the bounded
    bin histogram and broadcast back. Weights are exact integers
    (quantity is integral by TPC-H construction), prices exact cents.
    Driver scalars: one global (min, max) pair sizing the bins.

    Cross-engine trap found on landing: BOTH engines resolve column
    references case-insensitively, so a total aliased ``W`` silently
    shadows the weight column ``w`` (Spark raises AMBIGUOUS_REFERENCE;
    DuckDB silently picks the inner ``w`` and returns garbage) — hence
    ``wtot``.
    """
    from downscaledclimatedata_spark.functions.ranks import value_bin

    li = _t(spark, sf_dir, "lineitem")
    vals = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        .alias("cents"),
        F.round(F.col("l_quantity")).cast("bigint").alias("w"),
        "l_orderkey", "l_linenumber")
    st = vals.agg(F.min("cents"), F.max("cents")).first()
    lo, hi = float(st[0] or 0), float(st[1] or 0)
    binned = vals.withColumn(
        "_cb", value_bin(F.col("cents").cast("double"), lo, hi))
    order = [F.col("cents"), F.col("l_orderkey"), F.col("l_linenumber")]
    wb = Window.partitionBy("flag", "_cb").orderBy(*order)
    run = binned.withColumn("_rs", F.sum("w").over(
        wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    totals = binned.groupBy("flag", "_cb").agg(F.sum("w").alias("_bt"))
    woff = (Window.partitionBy("flag").orderBy("_cb")
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = totals.select(
        "flag", "_cb",
        F.coalesce(F.sum("_bt").over(woff), F.lit(0)).alias("_off"))
    grp_tot = binned.groupBy("flag").agg(F.sum("w").alias("wtot"))
    swept = (run.join(F.broadcast(offs), ["flag", "_cb"])
             .withColumn("cumw", F.col("_rs") + F.col("_off"))
             .join(F.broadcast(grp_tot), "flag"))
    return (swept.filter((2 * F.col("cumw") >= F.col("wtot"))
                         & (2 * (F.col("cumw") - F.col("w"))
                            < F.col("wtot")))
            .select("flag",
                    F.col("cents").alias("wmedian_cents"),
                    F.col("wtot").cast("bigint").alias("total_qty")))


_Q136_SQL = """
WITH vals AS (
  SELECT l_returnflag AS flag,
    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
    CAST(round(l_quantity) AS BIGINT) AS w,
    l_orderkey, l_linenumber
  FROM lineitem
), c AS (
  SELECT flag, cents, w,
    SUM(w) OVER (PARTITION BY flag
                 ORDER BY cents, l_orderkey, l_linenumber
                 ROWS UNBOUNDED PRECEDING) AS cumw,
    SUM(w) OVER (PARTITION BY flag) AS wtot
  FROM vals
)
SELECT flag, cents AS wmedian_cents, CAST(wtot AS BIGINT) AS total_qty
FROM c WHERE 2 * cumw >= wtot AND 2 * (cumw - w) < wtot
"""

register(QuerySpec("q136_weighted_median", q136_weighted_median,
                   _Q136_SQL,
                   description="exact lower weighted median per group: "
                               "two-phase-binned weighted PREFIX SUM "
                               "(windows on (flag, price-bin), bounded "
                               "histogram offsets), crossing-row "
                               "election, integer cents/quantities"))


# --- q137: hierarchy rollup via arithmetic ancestor enumeration ------------------

# Ancestor chain covers k = 0..HIER_MAX_DEPTH inclusive (deepest ancestor
# node div 10^HIER_MAX_DEPTH), so every node id < 10^HIER_MAX_DEPTH reaches
# root 0 — the explode is bounded at HIER_MAX_DEPTH + 1 entries per node.
HIER_MAX_DEPTH = 13  # supports node ids < 10^13


def q137_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtree rollup over an id-encoded hierarchy — the org-chart /
    category-tree aggregation class — WITHOUT recursion or iteration:
    nodes are (abs) user ids, the parent is ``node div 10`` (a 10-ary
    tree encoded in the id's digits), and each node's subtree event
    total is wanted.

    The Spark-first trick is the materialized-path closure: a node's
    ancestor set is computable ARITHMETICALLY (``node div 10^k`` for
    k = 0.. until the chain hits root 0), so the transitive closure is
    a bounded <= 14x explode + one groupBy — no iterative joins, no
    recursive CTE on the engine side, depth grows only with log10(max
    id) at any corpus size. Output keeps EXISTING nodes only (implied
    ancestors that never appear as users are dropped by the closing
    join); ``n_desc`` counts existing subtree nodes including self.

    The oracle mirrors the same closure with a DuckDB list_transform /
    unnest (a recursive CTE would also work — the point is the engine
    side never needs one).
    """
    ev = _t(spark, sf_dir, "events")
    per_user = (ev.groupBy(F.abs(F.col("user_id")).alias("node"))
                .agg(F.count(F.lit(1)).alias("own")))
    cols = []
    for k in range(HIER_MAX_DEPTH + 1):
        anc = F.expr(f"node div {10 ** k}")
        if k == 0:
            cols.append(anc)
        else:
            cols.append(F.when(F.col("node") >= 10 ** (k - 1), anc))
    rolled = (per_user
              .select(F.explode(F.array_compact(F.array(*cols)))
                      .alias("anc"), "own")
              .groupBy("anc")
              .agg(F.sum("own").alias("subtree_events"),
                   F.count(F.lit(1)).alias("n_desc")))
    return (per_user.join(rolled,
                          per_user["node"] == rolled["anc"])
            .select(F.col("node").cast("bigint").alias("node_id"),
                    F.col("own").cast("bigint").alias("own_events"),
                    F.col("subtree_events").cast("bigint")
                    .alias("subtree_events"),
                    F.col("n_desc").cast("bigint").alias("n_desc")))


def _q137_sql() -> str:
    pows = "[" + ", ".join(str(10 ** k)
                           for k in range(HIER_MAX_DEPTH + 2)) + "]"
    return f"""
WITH per_user AS (
  SELECT abs(user_id) AS node, COUNT(*) AS own FROM events GROUP BY 1
), anc AS (
  SELECT u.node, u.own, UNNEST(list_filter(list_transform(
    range(0, {HIER_MAX_DEPTH + 1}),
    k -> CASE WHEN k = 0 OR u.node >= ({pows})[k]
         THEN u.node // ({pows})[k + 1] ELSE NULL END),
    x -> x IS NOT NULL)) AS anc
  FROM per_user u
), rolled AS (
  SELECT anc, SUM(own) AS subtree_events, COUNT(*) AS n_desc
  FROM anc GROUP BY anc
)
SELECT CAST(u.node AS BIGINT) AS node_id,
  CAST(u.own AS BIGINT) AS own_events,
  CAST(r.subtree_events AS BIGINT) AS subtree_events,
  CAST(r.n_desc AS BIGINT) AS n_desc
FROM per_user u JOIN rolled r ON r.anc = u.node
"""


register(QuerySpec("q137_hierarchy_rollup", q137_hierarchy_rollup,
                   _q137_sql(),
                   description="hierarchy subtree rollup without "
                               "recursion: arithmetic ancestor "
                               "enumeration (node div 10^k), bounded "
                               "14x explode + one groupBy — the "
                               "materialized-path closure"))
