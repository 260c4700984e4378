"""Temporal operators: as-of join, native session windows, tumbling
windows — the time-series/"hypertable" query family.

The reference's only temporal artifacts are encoded `time_range` strings
(SURVEY §2.5 [abs]: no window/time operators exist in it); these are the
engine capabilities a time-series consumer of the catalog needs.

Scale notes:
- the as-of join is the union+window formulation (tag sides, one shuffle
  on the join key, `last(ignorenulls)` over an ordered frame) — no range
  explosion, no per-key collect; this is the 100 TB-safe plan vs. the
  naive range-join + argmax which materializes every (left, candidate)
  pair;
- session/tumbling windows use Spark's native `session_window`/`window`
  expressions (the same operators Structured Streaming uses, so the
  batch results here are exactly what the streaming path emits);
- tumbling sums quantize DOUBLE `value` via floor(x*1000) into BIGINT so
  cross-engine aggregation is exact integer arithmetic (floor has no
  rounding-mode ambiguity, unlike round-half ties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from downscaledclimatedata_spark.functions.rows import literal_rows
from downscaledclimatedata_spark.plans import QuerySpec, register
from downscaledclimatedata_spark.sources.tables import load_table
from downscaledclimatedata_spark.streaming.stream import (
    dir_bytes, scaled_state_partitions)

SESSION_GAP = "30 minutes"
SESSION_GAP_S = 1800
TUMBLE_S = 21600  # 6 hours


# --- q40: as-of join (backward, inclusive) ------------------------------------

def q40_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event, the most recent click by the same user at
    or before the purchase time (backward-inclusive as-of, left outer).

    Union+window plan: clicks sort before purchases at equal ts
    (side 0 < 1) so an exactly-simultaneous click matches; ties among
    clicks resolve to the highest event_id via the ordering.
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.col("event_id").alias("purchase_id"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("c_id"),
        F.lit(None).cast("timestamp").alias("c_ts"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts",
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(0).alias("side"),
        F.col("event_id").alias("c_id"),
        F.col("ts").alias("c_ts"))
    w = (Window.partitionBy("user_id")
         .orderBy("ts", "side", "c_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = purchases.unionByName(clicks).select(
        "user_id", "ts", "side", "purchase_id",
        F.last("c_id", ignorenulls=True).over(w).alias("click_id"),
        F.last("c_ts", ignorenulls=True).over(w).alias("click_ts"))
    return (filled.filter(F.col("side") == 1)
            .select("user_id", "purchase_id",
                    F.col("ts").alias("purchase_ts"), "click_id",
                    (F.unix_timestamp("ts")
                     - F.unix_timestamp("click_ts")).alias("wait_sec")))


_Q40_SQL = """
WITH p AS (
  SELECT user_id, event_id AS purchase_id, ts FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS click_id, ts FROM events WHERE event_type = 'click'
)
SELECT p.user_id, p.purchase_id, p.ts AS purchase_ts, c.click_id,
  date_diff('second', c.ts, p.ts) AS wait_sec
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


# --- q41: native session_window -----------------------------------------------

def q41_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions via Spark's native session_window expression
    (merge while inter-event gap < 30 min; window end = last ts + gap).
    Identical semantics to what the streaming path emits per user."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy("user_id",
                       F.session_window("ts", SESSION_GAP).alias("w"))
            .agg(F.count("*").alias("n_events"),
                 F.max("event_id").alias("last_event_id"))
            .select("user_id",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events", "last_event_id"))


_Q41_SQL = f"""
WITH gapped AS (
  SELECT user_id, ts, event_id,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR ts >= LAG(ts) OVER w + INTERVAL {SESSION_GAP_S} SECOND
         THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessioned AS (
  SELECT user_id, ts, event_id,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM gapped
)
SELECT user_id,
  MIN(ts) AS session_start,
  MAX(ts) + INTERVAL {SESSION_GAP_S} SECOND AS session_end,
  COUNT(*) AS n_events,
  MAX(event_id) AS last_event_id
FROM sessioned GROUP BY user_id, sid
"""


# --- q42: tumbling event-time window ------------------------------------------

def q42_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-aligned 6-hour tumbling windows per event type — the batch
    twin of the streaming `windowed_event_counts` aggregation."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy(F.window("ts", f"{TUMBLE_S} seconds").alias("w"),
                       "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.floor(F.col("value") * 1000).cast("long"))
                 .alias("sum_value_milli"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n_events", "sum_value_milli"))


_Q42_SQL = f"""
SELECT
  make_timestamp((epoch_us(ts) // {TUMBLE_S * 1_000_000}) * {TUMBLE_S * 1_000_000})
    AS window_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_milli
FROM events
GROUP BY 1, 2
"""


# --- q45: hierarchical time rollup --------------------------------------------

def q45_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution time rollup (day -> 6h bucket -> grand total) in
    one pass — the "hypertable continuous aggregate" shape. Catalyst
    plans a single Expand + aggregation, so all resolutions share one
    scan and one shuffle."""
    ev = load_table(spark, sf_dir, "events")
    # day as STRING: the rollup's subtotal rows carry NULL day, and a
    # null date canonicalizes differently across engines in pandas
    # (None vs NaT); null strings canonicalize identically
    keyed = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.expr("hour(ts) div 6").cast("int").alias("bucket6h"),
        F.floor(F.col("value") * 1000).cast("long").alias("v_milli"))
    return (keyed.rollup("day", "bucket6h")
            .agg(F.count("*").alias("n_events"),
                 F.sum("v_milli").alias("sum_value_milli")))


_Q45_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
  CAST(hour(ts) // 6 AS INT) AS bucket6h,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_milli
FROM events
GROUP BY ROLLUP(1, 2)
"""


# --- q51: interval RANGE frame (trailing-window aggregate) ----------------------

def q51_trailing_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer trailing 7-day order total via a RANGE frame keyed on
    epoch seconds — the value-based frame (rows at equal/preceding times
    within the interval), distinct from row-counted frames."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    from pyspark.sql import Window
    epoch = F.unix_timestamp("o_orderdate")
    w = (Window.partitionBy("o_custkey").orderBy(epoch.cast("long"))
         .rangeBetween(-7 * 86400, 0))
    price = F.col("o_totalprice").cast("decimal(18,2)")
    return orders.select(
        "o_custkey", "o_orderkey",
        F.sum(price).over(w).cast("double").alias("trailing_7d_total"),
        F.count("*").over(w).alias("trailing_7d_orders"))


_Q51_SQL = """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trailing_7d_total,
  COUNT(*) OVER w AS trailing_7d_orders
FROM orders
WHERE o_custkey < 200
WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
  RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
"""


# --- q61: gap-fill / forward-fill (last ignorenulls) ----------------------------

def q61_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill gaps in a per-user time series: observations are
    nulled deterministically (error events = sensor dropouts), then each
    gap takes the most recent non-null reading via last(ignorenulls) over
    a running frame — the standard gap-fill for sparse sensor series
    (the reference's gridded climate data has exactly this shape once
    tidied, SURVEY §1.5). One shuffle (window on user_id); values pass
    through unaggregated, so doubles stay bit-identical.
    """
    from pyspark.sql import Window
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    sparse = ev.select(
        "user_id", "event_id", "ts",
        F.when(F.col("event_type") != "error", F.col("value")).alias("v"))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return sparse.select(
        "user_id", "event_id",
        F.col("v").alias("observed"),
        F.last("v", ignorenulls=True).over(w).alias("filled"))


_Q61_SQL = """
SELECT user_id, event_id,
  CASE WHEN event_type <> 'error' THEN value END AS observed,
  LAST_VALUE(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
    OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
FROM events WHERE user_id < 20
"""


register(QuerySpec("q61_gap_fill", q61_gap_fill, _Q61_SQL,
                   description="forward-fill sparse series via last(ignorenulls) running frame"))
register(QuerySpec("q51_trailing_range_frame", q51_trailing_range_frame, _Q51_SQL,
                   description="trailing 7-day RANGE frame on epoch seconds (value-based window)"))
register(QuerySpec("q45_time_rollup", q45_time_rollup, _Q45_SQL,
                   description="day -> 6h -> total hierarchical rollup (one scan, one shuffle via Expand)"))
register(QuerySpec("q40_asof_join", q40_asof_join, _Q40_SQL,
                   description="backward-inclusive as-of join via union+window (one shuffle, no range explosion)"))
register(QuerySpec("q41_session_window", q41_session_window, _Q41_SQL,
                   description="native session_window gap sessions, oracle = lag/running-sum formulation"))
register(QuerySpec("q42_tumbling_window", q42_tumbling_window, _Q42_SQL,
                   description="epoch-aligned tumbling window agg with exact quantized sums"))


# --- streaming twin of q42: the REAL stream, oracled against the same SQL --------

def streaming_tumbling_counts_query(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """q42's tumbling-window aggregation executed as an ACTUAL
    Structured Streaming job: events re-staged as 4 files, streamed one
    file per micro-batch with an event-time watermark, aggregated in
    complete mode into a memory sink, final table returned. The oracle
    is q42's batch SQL — a green row proves the streaming agg's
    incremental state (partial counts merged across micro-batches)
    reproduces the one-shot answer exactly, end-to-end through a real
    checkpointed query rather than the unit harness.

    Complete mode is deliberate: with a bounded availableNow input the
    final windows never cross the watermark, so append mode would hold
    them in state forever; complete emits the whole aggregate each
    batch and the LAST emission is the total answer.
    """
    import shutil
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="dcd_swin_")
    try:
        edir = f"{base}/events"
        ev.repartition(4).write.parquet(edir)
        staged = spark.read.parquet(edir)
        # state partitions sized to the staged input (see
        # streaming/stream.py scaled_state_partitions): 32 state-
        # store commits/stage/batch on a KB replay was ~5x wall
        with scaled_state_partitions(spark, dir_bytes(edir)):
            stream = (spark.readStream.schema(staged.schema)
                      .option("maxFilesPerTrigger", 1).parquet(edir))
            agg = (stream.withWatermark("ts", "10 minutes")
                   .groupBy(F.window("ts", f"{TUMBLE_S} seconds").alias("w"),
                            "event_type")
                   .agg(F.count("*").alias("n_events"),
                        F.sum(F.floor(F.col("value") * 1000).cast("long"))
                        .alias("sum_value_milli")))
            name = f"swin_{uuid.uuid4().hex[:8]}"
            q = (agg.writeStream.format("memory").queryName(name)
                 .outputMode("complete")
                 .option("checkpointLocation", f"{base}/ckpt")
                 .trigger(availableNow=True).start())
            q.awaitTermination(300)
        out = (spark.table(name)
               .select(F.col("w.start").alias("window_start"),
                       "event_type",
                       F.col("n_events").cast("bigint").alias("n_events"),
                       F.col("sum_value_milli").cast("bigint")
                       .alias("sum_value_milli")))
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


_STREAM_Q42_SQL = f"""
SELECT
  make_timestamp((epoch_us(ts) // {TUMBLE_S * 1_000_000}) * {TUMBLE_S * 1_000_000})
    AS window_start,
  event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_milli
FROM events
GROUP BY 1, 2
"""

register(QuerySpec(
    "streaming_tumbling_counts", streaming_tumbling_counts_query,
    _STREAM_Q42_SQL,
    description="q42's tumbling-window agg run as a REAL structured-"
                "streaming job (4 micro-batches, watermark, complete-"
                "mode memory sink) — streaming state merge equals the "
                "one-shot batch answer"))


def streaming_stateful_totals_query(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """The CUSTOM STATEFUL operator (streaming/stream.py
    running_user_totals, applyInPandasWithState) driven as a REAL
    checkpointed stream: events re-staged as 4 files, streamed one per
    micro-batch, per-user (count, sum) state persisted in the
    checkpoint across batches, update-mode memory sink. The final
    emission per user (update mode re-emits a user's row whenever a
    batch touches them; the count strictly increases, so max-count =
    final) must equal the one-shot batch aggregate — proving the
    GroupState accumulate/merge across micro-batches, not just the
    unit harness's two-batch walk.

    Value is floored to exact milli-units BEFORE the stateful op (the
    q42 discipline): the processor's per-batch Python accumulation is
    then integer-exact, so the cross-engine hash cannot depend on
    float summation order.
    """
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import Window

    from downscaledclimatedata_spark.streaming.stream import (
        running_user_totals)

    ev = load_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="dcd_stws_")
    try:
        edir = f"{base}/events"
        ev.repartition(4).write.parquet(edir)
        staged = spark.read.parquet(edir)
        # state partitions sized to the staged input (see
        # streaming/stream.py scaled_state_partitions): 32 state-
        # store commits/stage/batch on a KB replay was ~5x wall
        with scaled_state_partitions(spark, dir_bytes(edir)):
            stream = (spark.readStream.schema(staged.schema)
                      .option("maxFilesPerTrigger", 1).parquet(edir)
                      .select("user_id",
                              F.floor(F.col("value") * 1000).cast("double")
                              .alias("value")))
            name = f"stws_{uuid.uuid4().hex[:8]}"
            q = (running_user_totals(stream)
                 .writeStream.format("memory").queryName(name)
                 .outputMode("update")
                 .option("checkpointLocation", f"{base}/ckpt")
                 .trigger(availableNow=True).start())
            q.awaitTermination(300)
        w = Window.partitionBy("user_id").orderBy(
            F.col("n_events").desc())
        out = (spark.table(name)
               .withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") == 1)
               .select("user_id",
                       F.col("n_events").cast("bigint").alias("n_events"),
                       F.col("total_value").cast("bigint")
                       .alias("total_milli")))
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


_STREAM_STATEFUL_SQL = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS total_milli
FROM events GROUP BY user_id
"""

register(QuerySpec(
    "streaming_stateful_totals", streaming_stateful_totals_query,
    _STREAM_STATEFUL_SQL,
    description="the applyInPandasWithState custom stateful operator "
                "run as a REAL checkpointed stream (4 micro-batches, "
                "update-mode sink): per-user GroupState accumulated "
                "across batches equals the one-shot batch aggregate"))


def streaming_session_windows_query(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """q41's gap-based sessionization run as a REAL append-mode
    checkpointed stream — the session-window STATE STORE is a different
    animal from tumbling windows: partial sessions land in state and
    MERGE when a later micro-batch brings events that bridge the gap
    (the random 3-file split guarantees plenty of cross-batch
    sessions), and a session is emitted exactly once, when the
    watermark passes its end.

    Staging discipline (the left_outer_flush lessons): files are
    mtime-pinned so the two far-future HEARTBEAT files arrive last;
    the watermark horizon exceeds the fixture's whole ts span so the
    random split can never make a real event late; TWO heartbeat files
    because eviction uses the watermark computed at the end of the
    PREVIOUS batch. Heartbeat rows ride a real event row with user_id
    and ts overwritten, and are filtered from the result; the oracle is
    q41's batch SQL verbatim.
    """
    import glob
    import os
    import shutil
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events")
    hb_user = -(2 ** 61)
    bounds = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")) \
        .first()
    span_s = int((bounds["hi"] - bounds["lo"]).total_seconds())
    horizon_s = span_s + SESSION_GAP_S + 3600
    base = tempfile.mkdtemp(prefix="dcd_ssess_")
    try:
        seed = ev.orderBy("event_id").limit(1)
        hb = []
        for i in (1, 2):
            off = horizon_s + SESSION_GAP_S + i * 3600
            hb.append(seed.withColumn("user_id", F.lit(hb_user))
                      .withColumn("ts", F.lit(bounds["hi"])
                                  + F.expr(f"INTERVAL {off} SECONDS")))
        edir = f"{base}/events"
        os.makedirs(edir)
        t00 = int(__import__("time").time()) - 7200
        idx = 0
        for part in range(3):
            df = ev.withColumn("_p", F.pmod(F.xxhash64("event_id"),
                                            F.lit(3))) \
                .filter(F.col("_p") == part).drop("_p")
            pdir = f"{base}/tmp{idx}"
            df.coalesce(1).write.parquet(pdir)
            src = glob.glob(f"{pdir}/part-*.parquet")[0]
            dst = f"{edir}/f{idx}.parquet"
            shutil.move(src, dst)
            os.utime(dst, (t00 + 100 * idx, t00 + 100 * idx))
            idx += 1
        for df in hb:
            pdir = f"{base}/tmp{idx}"
            df.coalesce(1).write.parquet(pdir)
            src = glob.glob(f"{pdir}/part-*.parquet")[0]
            dst = f"{edir}/f{idx}.parquet"
            shutil.move(src, dst)
            os.utime(dst, (t00 + 100 * idx, t00 + 100 * idx))
            idx += 1
        schema = spark.read.parquet(edir).schema
        # state partitions sized to the staged input (see
        # streaming/stream.py scaled_state_partitions): 32 state-
        # store commits/stage/batch on a KB replay was ~5x wall
        with scaled_state_partitions(spark, dir_bytes(edir)):
            stream = (spark.readStream.schema(schema)
                      .option("maxFilesPerTrigger", 1).parquet(edir))
            agg = (stream.withWatermark("ts", f"{horizon_s} seconds")
                   .groupBy("user_id",
                            F.session_window("ts", SESSION_GAP).alias("w"))
                   .agg(F.count("*").alias("n_events"),
                        F.max("event_id").alias("last_event_id"))
                   .select("user_id",
                           F.col("w.start").alias("session_start"),
                           F.col("w.end").alias("session_end"),
                           "n_events", "last_event_id"))
            name = f"ssess_{uuid.uuid4().hex[:8]}"
            q = (agg.writeStream.format("memory").queryName(name)
                 .outputMode("append")
                 .option("checkpointLocation", f"{base}/ckpt")
                 .trigger(availableNow=True).start())
            q.awaitTermination(300)
        out = (spark.table(name)
               .filter(F.col("user_id") != hb_user)
               .select("user_id", "session_start", "session_end",
                       F.col("n_events").cast("bigint").alias("n_events"),
                       "last_event_id"))
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


register(QuerySpec(
    "streaming_session_windows", streaming_session_windows_query,
    _Q41_SQL,
    description="q41's session windows as a REAL append-mode stream: "
                "partial sessions MERGE in the state store across "
                "micro-batches and each session is emitted exactly "
                "once when the watermark (advanced by two heartbeat "
                "tail files) passes its end — equals the batch answer"))


# --- q127: forward + nearest as-of joins (one union, two frames) -----------------

def q127_asof_directions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q40's backward-inclusive as-of extended to the other two
    directions a feature pipeline needs — for each purchase: the
    EARLIEST click strictly AFTER it (forward-EXCLUSIVE as-of) and the
    NEAREST click in either direction (backward wins ties). ONE
    union+window relation serves all three: clicks sort before
    purchases at equal ts (side 0 < 1), so the backward frame
    (unboundedPreceding..current) is inclusive and the forward frame
    (1..unboundedFollowing) is exclusive — the same ordering gives both
    semantics, no second shuffle. Gaps are exact integer MICROSECONDS
    (no whole-second truncation ambiguity); nearest compares absolute
    gaps as integers, ties to backward.

    Tie-breaks pinned by the ordering (ts, side, c_id): simultaneous
    backward clicks resolve to the HIGHEST id (last in frame),
    simultaneous forward clicks to the LOWEST (first in frame).
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.col("event_id").alias("purchase_id"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("c_id"),
        F.lit(None).cast("timestamp").alias("c_ts"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts",
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(0).alias("side"),
        F.col("event_id").alias("c_id"),
        F.col("ts").alias("c_ts"))
    base = (Window.partitionBy("user_id")
            .orderBy("ts", "side", "c_id"))
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(1, Window.unboundedFollowing)
    u = purchases.unionByName(clicks).select(
        "user_id", "ts", "side", "purchase_id",
        F.last("c_id", ignorenulls=True).over(wb).alias("back_id"),
        F.last("c_ts", ignorenulls=True).over(wb).alias("back_ts"),
        F.first("c_id", ignorenulls=True).over(wf).alias("fwd_id"),
        F.first("c_ts", ignorenulls=True).over(wf).alias("fwd_ts"))
    p = u.filter(F.col("side") == 1)
    back_gap = F.unix_micros("back_ts") - F.unix_micros("ts")  # <= 0
    fwd_gap = F.unix_micros("fwd_ts") - F.unix_micros("ts")    # > 0
    take_back = F.col("back_id").isNotNull() & (
        F.col("fwd_id").isNull() | (-back_gap <= fwd_gap))
    return p.select(
        "user_id", "purchase_id",
        F.col("fwd_id").alias("fwd_click_id"),
        fwd_gap.cast("bigint").alias("fwd_wait_us"),
        F.when(take_back, F.col("back_id")).otherwise(F.col("fwd_id"))
        .alias("nearest_click_id"),
        F.when(take_back, back_gap).otherwise(fwd_gap)
        .cast("bigint").alias("nearest_gap_us"))


_Q127_SQL = """
WITH u AS (
  SELECT user_id, ts, 1 AS side, event_id AS purchase_id,
    CAST(NULL AS BIGINT) AS c_id, CAST(NULL AS TIMESTAMP) AS c_ts
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, 0, NULL, event_id, ts
  FROM events WHERE event_type = 'click'
), f AS (
  SELECT user_id, ts, side, purchase_id,
    LAST_VALUE(c_id IGNORE NULLS) OVER w_back AS back_id,
    LAST_VALUE(c_ts IGNORE NULLS) OVER w_back AS back_ts,
    FIRST_VALUE(c_id IGNORE NULLS) OVER w_fwd AS fwd_id,
    FIRST_VALUE(c_ts IGNORE NULLS) OVER w_fwd AS fwd_ts
  FROM u
  WINDOW
    w_back AS (PARTITION BY user_id ORDER BY ts, side, c_id NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_fwd AS (PARTITION BY user_id ORDER BY ts, side, c_id NULLS FIRST
              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
)
SELECT user_id, purchase_id,
  fwd_id AS fwd_click_id,
  CAST(epoch_us(fwd_ts) - epoch_us(ts) AS BIGINT) AS fwd_wait_us,
  CASE WHEN back_id IS NOT NULL AND (fwd_id IS NULL OR
            epoch_us(ts) - epoch_us(back_ts)
            <= epoch_us(fwd_ts) - epoch_us(ts))
       THEN back_id ELSE fwd_id END AS nearest_click_id,
  CAST(CASE WHEN back_id IS NOT NULL AND (fwd_id IS NULL OR
                 epoch_us(ts) - epoch_us(back_ts)
                 <= epoch_us(fwd_ts) - epoch_us(ts))
            THEN epoch_us(back_ts) - epoch_us(ts)
            ELSE epoch_us(fwd_ts) - epoch_us(ts) END AS BIGINT)
    AS nearest_gap_us
FROM f WHERE side = 1
"""

register(QuerySpec("q127_asof_directions", q127_asof_directions,
                   _Q127_SQL,
                   description="forward-exclusive and nearest as-of "
                               "joins from ONE union+window relation — "
                               "two frames over the same ordering, "
                               "exact microsecond gaps, ties pinned"))


# --- q128: dyadic-weight EWMA via bounded lag unroll ------------------------------

Q128_HORIZON = 8  # last 8 events; weight 2^(H-1-j) for lag j


def q128_dyadic_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average of event cents —
    an ORDER-DEPENDENT RECURRENCE, the class that cannot hash-match
    cross-engine as floats (every engine folds the recurrence in its
    own accumulation order). Made exact by bounding the horizon to the
    last 8 events with dyadic weights 2^7..2^0 (current weighted
    highest): the numerator is an exact integer built from 8 unrolled
    ``lag`` columns over one (user) window, the denominator sums the
    weights of the lags that EXIST (partial-history rows use partial
    weights), and the single num/den division is the only double — the
    same IEEE division in both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cents = F.round(F.col("value") * 100).cast("bigint")
    d = ev.select("event_id", "user_id", "ts", cents.alias("cents"))
    num = F.lit(0).cast("bigint")
    den = F.lit(0).cast("bigint")
    for j in range(Q128_HORIZON):
        lj = F.lag("cents", j).over(w)
        wt = 1 << (Q128_HORIZON - 1 - j)
        num = num + F.coalesce(lj * wt, F.lit(0))
        den = den + F.when(lj.isNotNull(), F.lit(wt)).otherwise(0)
    return d.select(
        "event_id", "user_id",
        num.alias("ewma_num"), den.alias("ewma_den"),
        (num.cast("double") / den.cast("double")).alias("ewma_cents"))


def _q128_sql() -> str:
    nums, dens = [], []
    for j in range(Q128_HORIZON):
        wt = 1 << (Q128_HORIZON - 1 - j)
        lj = (f"LAG(cents, {j}) OVER (PARTITION BY user_id "
              f"ORDER BY ts, event_id)")
        nums.append(f"COALESCE({lj} * {wt}, 0)")
        dens.append(f"CASE WHEN {lj} IS NOT NULL THEN {wt} ELSE 0 END")
    return f"""
WITH d AS (
  SELECT event_id, user_id, ts,
    CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), e AS (
  SELECT event_id, user_id,
    {' + '.join(nums)} AS ewma_num,
    {' + '.join(dens)} AS ewma_den
  FROM d
)
SELECT event_id, user_id,
  CAST(ewma_num AS BIGINT) AS ewma_num,
  CAST(ewma_den AS BIGINT) AS ewma_den,
  CAST(ewma_num AS DOUBLE) / CAST(ewma_den AS DOUBLE) AS ewma_cents
FROM e
"""

register(QuerySpec("q128_dyadic_ewma", q128_dyadic_ewma, _q128_sql(),
                   description="bounded-horizon EWMA with dyadic "
                               "integer weights: 8 unrolled lags, "
                               "exact integer numerator/denominator, "
                               "one final division"))


# --- streaming twin #2: the REAL stream-stream interval join ----------------------

def streaming_attribution_join_query(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """The ad-attribution stream-stream interval join
    (streaming/stream.py `attribution_join`) run as an ACTUAL
    checkpointed streaming query: events staged as 4 files, both sides
    (purchases and clicks) read from the SAME file stream, watermarked,
    interval-joined in append mode, drained with availableNow. The
    oracle is the equivalent batch interval join in SQL — a green row
    proves the dual-watermark join state machine (click state retained
    for watermark + window, purchases matched across micro-batch
    boundaries) emits exactly the batch answer. Unlike the unit test
    (tests/test_streaming.py), this runs through the driver contract on
    an arbitrary session and corpus.
    """
    import shutil
    import tempfile
    import uuid

    from downscaledclimatedata_spark.streaming.stream import (
        attribution_join)

    ev = load_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="dcd_sattr_")
    try:
        edir = f"{base}/events"
        ev.repartitionByRange(4, "ts").write.parquet(edir)
        staged = spark.read.parquet(edir)
        # state partitions sized to the staged input (see
        # streaming/stream.py scaled_state_partitions): 32 state-
        # store commits/stage/batch on a KB replay was ~5x wall
        with scaled_state_partitions(spark, dir_bytes(edir)):
            stream = (spark.readStream.schema(staged.schema)
                      .option("maxFilesPerTrigger", 1).parquet(edir))
            # Watermark past the fixture's whole time span: the file source
            # does NOT guarantee arrival order (listing order is mtime-
            # based and racy), and an out-of-order replay with a short
            # watermark correctly drops genuinely-late clicks — real
            # streaming semantics, but nondeterministic vs the batch
            # answer this spec certifies. With the horizon beyond the data
            # span nothing is ever late or evicted during the bounded run;
            # the bounded-state eviction path itself is pinned by
            # tests/test_streaming.py's ordered-arrival unit.
            joined = attribution_join(stream, watermark="365 days")
            name = f"sattr_{uuid.uuid4().hex[:8]}"
            q = (joined.writeStream.format("memory").queryName(name)
                 .outputMode("append")
                 .option("checkpointLocation", f"{base}/ckpt")
                 .trigger(availableNow=True).start())
            q.awaitTermination(300)
        out = spark.table(name).select(
            "user_id", "purchase_id", "click_id", "p_ts", "c_ts")
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


_STREAM_ATTR_SQL = """
SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
  p.ts AS p_ts, c.ts AS c_ts
FROM events p JOIN events c
  ON p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.user_id = p.user_id
 AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 10 MINUTE
"""

register(QuerySpec(
    "streaming_attribution_join", streaming_attribution_join_query,
    _STREAM_ATTR_SQL,
    description="the stream-stream interval join run as a REAL "
                "streaming query (dual watermarks, append mode, 4 "
                "micro-batches) — emits exactly the batch interval "
                "join"))


# --- streaming twin #3: LATE-DATA DROP under a SHORT watermark, pinned ------------

ATTR_LATE_BASE_S = 1_700_000_000   # fixed synthetic epoch (seconds)
ATTR_LATE_EPOCH_GAP = {0: 0, 1: 7200, 2: 10800, 3: 0}  # bucket -> offset
ATTR_LATE_SPAN_S = 600             # epoch width == join window == horizon
_HB_CLICK_USER = -(2 ** 61)        # heartbeat identities: far outside
_HB_PURCHASE_USER = -(2 ** 61) - 1  # any real or edge-corpus id range


def streaming_attribution_late_drop_query(spark: SparkSession,
                                          sf_dir: str) -> DataFrame:
    """The race round 10 FOUND, turned into pinned behavior: under a
    SHORT watermark, genuinely-late rows lose their matches in a real
    stream-stream join. Building this spec pinned the MECHANISM, which
    is sharper than r10's phrasing: Spark does NOT input-filter late
    rows on an inner join (a late row one batch behind still matched —
    observed here first-hand; the progress log shows the late batch
    joining below the watermark). The guaranteed drop is STATE
    EVICTION: once the watermark passes an epoch, the opposing side's
    state for it is removed at batch commit, so a late row arriving
    AFTER that eviction finds nothing to match. The replay is built to
    make eviction — not scheduling luck — decide the outcome:

    - Rows get SYNTHETIC event times in 600 s epochs keyed by
      ``pmod(event_id, 4)``: buckets 0 and 3 share the OLD epoch,
      buckets 1 and 2 sit 2 h and 3 h later.
    - Bucket 3's CLICKS are withheld into the LAST file; bucket 3's
      purchases ride file 0 on time. Arrival epochs: OLD, +2 h, +3 h,
      then the late OLD clicks — TWO watermark advances after their
      epoch, so every purchase they could match is provably evicted
      (purchase state evicts when wm > p_ts; click state when
      wm > c_ts + window — both cleared by wm ≈ BASE+7200-1). A
      one-batch lag would NOT be enough; that is exactly the
      first-draft mistake this spec's history encodes.
    - Each file is staged as ONE parquet file whose mtime is set
      explicitly (``os.utime``), because the file source orders new
      files by modification time — the r10 nondeterminism was exactly
      an unpinned mtime race. Arrival order is 0, 1, 2, 3.
    - Every file carries one heartbeat click AND one heartbeat
      purchase (reserved user ids that can never match anything), so
      BOTH sides' watermarks advance every batch even on adversarial
      corpora with no clicks or no purchases — the global watermark
      is the MIN across sides.

    The oracle is the batch interval join minus the late click set —
    computable relationally because the late set is a pure function
    of arrival order + horizon: every pair except those whose click
    is a bucket-3 click. Reference: loca2.py has no streaming; the
    semantics pinned here are Spark's own late-data contract
    ("data delayed more than the horizon may or may not be
    processed" — this replay makes the MAY NOT deterministic).
    """
    import glob as globmod
    import os
    import shutil
    import tempfile
    import time as timemod
    import uuid

    from downscaledclimatedata_spark.streaming.stream import (
        attribution_join)

    ev = load_table(spark, sf_dir, "events") \
        .filter(F.col("event_type").isin("click", "purchase"))
    b = F.pmod(F.col("event_id"), F.lit(4)).cast("int")
    epoch = (F.when(b == 1, F.lit(ATTR_LATE_EPOCH_GAP[1]))
             .when(b == 2, F.lit(ATTR_LATE_EPOCH_GAP[2]))
             .otherwise(F.lit(0)))   # buckets 0 and 3: the OLD epoch
    off = F.pmod(F.expr("event_id div 4"), F.lit(ATTR_LATE_SPAN_S))
    # file routing: bucket-3 CLICKS arrive LAST (file 3, two watermark
    # advances after their epoch); bucket-3 purchases ride file 0
    fid = (F.when((b == 3) & (F.col("event_type") == "click"), F.lit(3))
           .when(b == 3, F.lit(0)).otherwise(b))
    staged = ev.select(
        "event_id", "user_id", "event_type", fid.alias("bucket"),
        F.timestamp_seconds(F.lit(ATTR_LATE_BASE_S) + epoch + off)
        .alias("ts"))
    base = tempfile.mkdtemp(prefix="dcd_slate_")
    try:
        edir = f"{base}/events"
        os.makedirs(edir)
        t0 = int(timemod.time()) - 3600
        for bi in range(4):
            hb_ts = (ATTR_LATE_BASE_S + ATTR_LATE_EPOCH_GAP[bi]
                     + ATTR_LATE_SPAN_S - 1)
            # literal_rows, not createDataFrame: a Python local
            # relation unioned into the staging write made each
            # single-task write job pay a Python-worker round trip
            # (~4.5 s/file measured r13); JVM literals write in 0.2 s
            hb = literal_rows(
                spark,
                [(-(10 + bi), _HB_CLICK_USER, "click"),
                 (-(20 + bi), _HB_PURCHASE_USER, "purchase")],
                "event_id long, user_id long, event_type string"
            ).select("event_id", "user_id", "event_type",
                     F.timestamp_seconds(F.lit(hb_ts)).alias("ts"))
            part_dir = f"{base}/tmp{bi}"
            (staged.filter(F.col("bucket") == bi).drop("bucket")
             .unionByName(hb).coalesce(1).write.parquet(part_dir))
            part = globmod.glob(f"{part_dir}/part-*.parquet")[0]
            dst = f"{edir}/f{bi}.parquet"
            shutil.move(part, dst)
            os.utime(dst, (t0 + 100 * bi, t0 + 100 * bi))
        schema = spark.read.parquet(edir).schema
        # state partitions sized to the staged input (see
        # streaming/stream.py scaled_state_partitions): 32 state-
        # store commits/stage/batch on a KB replay was ~5x wall
        with scaled_state_partitions(spark, dir_bytes(edir)):
            stream = (spark.readStream.schema(schema)
                      .option("maxFilesPerTrigger", 1).parquet(edir))
            joined = attribution_join(stream, watermark="10 minutes")
            name = f"slate_{uuid.uuid4().hex[:8]}"
            q = (joined.writeStream.format("memory").queryName(name)
                 .outputMode("append")
                 .option("checkpointLocation", f"{base}/ckpt")
                 .trigger(availableNow=True).start())
            q.awaitTermination(300)
        out = spark.table(name).select(
            "user_id", "purchase_id", "click_id",
            F.unix_timestamp("p_ts").cast("bigint").alias("p_s"),
            F.unix_timestamp("c_ts").cast("bigint").alias("c_s"))
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


_STREAM_ATTR_LATE_SQL = f"""
WITH s AS (
  SELECT event_id, user_id, event_type,
    ((event_id % 4) + 4) % 4 AS b,
    {ATTR_LATE_BASE_S}
      + CASE ((event_id % 4) + 4) % 4
          WHEN 1 THEN {ATTR_LATE_EPOCH_GAP[1]}
          WHEN 2 THEN {ATTR_LATE_EPOCH_GAP[2]} ELSE 0 END
      + ((((event_id // 4) % {ATTR_LATE_SPAN_S}) + {ATTR_LATE_SPAN_S})
         % {ATTR_LATE_SPAN_S}) AS t_s
  FROM events WHERE event_type IN ('click', 'purchase')
), live AS (
  -- the late set: bucket-3 clicks arrive two watermark advances after
  -- their epoch, so every purchase they could match has been EVICTED
  -- from state — they vanish from the join; everything else survives
  SELECT * FROM s WHERE NOT (b = 3 AND event_type = 'click')
)
SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
  CAST(p.t_s AS BIGINT) AS p_s, CAST(c.t_s AS BIGINT) AS c_s
FROM live p JOIN live c
  ON p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.user_id = p.user_id
 AND c.t_s <= p.t_s AND c.t_s >= p.t_s - {ATTR_LATE_SPAN_S}
"""

register(QuerySpec(
    "streaming_attribution_late_drop",
    streaming_attribution_late_drop_query, _STREAM_ATTR_LATE_SQL,
    description="late-data DROP pinned: out-of-order replay (mtime-"
                "pinned file order, per-epoch dual heartbeats) under a "
                "10-minute watermark — the late bucket vanishes from "
                "the join exactly as the relational oracle predicts"))


# --- streaming twin #4: LEFT-OUTER null emission is watermark-delayed -------------

OUTER_BASE_S = 1_700_000_000    # fixed synthetic epoch (seconds)
OUTER_SPAN_S = 600              # epoch width == join window == horizon
OUTER_FLUSH_1 = 20_000          # far-future heartbeat: watermark source
OUTER_FLUSH_2 = 40_000          # one batch later: null-emission trigger


def streaming_left_outer_join_query(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join run as a REAL checkpointed
    streaming query, certifying the semantics batch users trip over:
    an unmatched purchase is NOT emitted when first seen — a matching
    click may still arrive — so Spark holds it in join state and emits
    the NULL-click row only once the WATERMARK proves its interval
    window closed. The replay forces that proof inside a bounded
    availableNow run:

    - Real click/purchase rows get synthetic times inside ONE 600 s
      epoch (``BASE + pmod(event_id, 600)``), split across three
      mtime-ordered files. Nothing is late: under the 10-minute
      horizon the watermark stays below BASE until the whole epoch has
      arrived, so no state is evicted while real data flows (the
      late-DROP path is the previous spec's subject).
    - Two trailing files carry only far-future heartbeat click AND
      purchase pairs (reserved ids): the first advances the watermark
      past every real window at its batch's END, the second gives the
      engine the batch DURING which that watermark flushes every
      unmatched purchase as a NULL row. Two files, because eviction
      uses the watermark computed at the END of the PREVIOUS batch.

    A green row proves the watermark-delayed NULL emission — matched
    pairs, cross-batch matches, and held-back-then-flushed unmatched
    rows — equals the batch LEFT JOIN, which is the oracle.
    """
    import glob as globmod
    import os
    import shutil
    import tempfile
    import time as timemod
    import uuid

    from downscaledclimatedata_spark.streaming.stream import (
        attribution_join)

    hb_click_user = -(2 ** 61)
    hb_purchase_user = -(2 ** 61) - 1
    ev = load_table(spark, sf_dir, "events") \
        .filter(F.col("event_type").isin("click", "purchase"))
    staged = ev.select(
        "event_id", "user_id", "event_type",
        F.pmod(F.col("event_id"), F.lit(3)).cast("int").alias("bucket"),
        F.timestamp_seconds(
            F.lit(OUTER_BASE_S) + F.pmod(F.col("event_id"),
                                         F.lit(OUTER_SPAN_S)))
        .alias("ts"))
    base = tempfile.mkdtemp(prefix="dcd_souter_")
    try:
        edir = f"{base}/events"
        os.makedirs(edir)
        t0 = int(timemod.time()) - 3600

        def _stage(df, idx):
            part_dir = f"{base}/tmp{idx}"
            df.coalesce(1).write.parquet(part_dir)
            part = globmod.glob(f"{part_dir}/part-*.parquet")[0]
            dst = f"{edir}/f{idx}.parquet"
            shutil.move(part, dst)
            os.utime(dst, (t0 + 100 * idx, t0 + 100 * idx))

        for bi in range(3):
            _stage(staged.filter(F.col("bucket") == bi).drop("bucket"),
                   bi)
        for j, flush in enumerate((OUTER_FLUSH_1, OUTER_FLUSH_2)):
            # literal_rows: see streaming_attribution_late_drop — the
            # Python local relation cost ~4.5 s per staged file
            hb = literal_rows(
                spark,
                [(-(30 + j), hb_click_user, "click"),
                 (-(40 + j), hb_purchase_user, "purchase")],
                "event_id long, user_id long, event_type string"
            ).select("event_id", "user_id", "event_type",
                     F.timestamp_seconds(F.lit(OUTER_BASE_S + flush))
                     .alias("ts"))
            _stage(hb, 3 + j)
        schema = spark.read.parquet(edir).schema
        # state partitions sized to the staged input (see
        # streaming/stream.py scaled_state_partitions): 32 state-
        # store commits/stage/batch on a KB replay was ~5x wall
        with scaled_state_partitions(spark, dir_bytes(edir)):
            stream = (spark.readStream.schema(schema)
                      .option("maxFilesPerTrigger", 1).parquet(edir))
            joined = attribution_join(stream, watermark="10 minutes",
                                      how="leftOuter")
            name = f"souter_{uuid.uuid4().hex[:8]}"
            q = (joined.writeStream.format("memory").queryName(name)
                 .outputMode("append")
                 .option("checkpointLocation", f"{base}/ckpt")
                 .trigger(availableNow=True).start())
            q.awaitTermination(300)
        out = (spark.table(name)
               .filter(F.col("user_id") > hb_purchase_user + 2)
               .select("user_id", "purchase_id", "click_id",
                       F.unix_timestamp("p_ts").cast("bigint")
                       .alias("p_s"),
                       F.unix_timestamp("c_ts").cast("bigint")
                       .alias("c_s")))
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


_STREAM_OUTER_SQL = f"""
WITH s AS (
  SELECT event_id, user_id, event_type,
    {OUTER_BASE_S}
      + ((event_id % {OUTER_SPAN_S}) + {OUTER_SPAN_S})
        % {OUTER_SPAN_S} AS t_s
  FROM events WHERE event_type IN ('click', 'purchase')
)
SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
  CAST(p.t_s AS BIGINT) AS p_s, CAST(c.t_s AS BIGINT) AS c_s
FROM (SELECT * FROM s WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM s WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.t_s <= p.t_s AND c.t_s >= p.t_s - {OUTER_SPAN_S}
"""

register(QuerySpec(
    "streaming_left_outer_join", streaming_left_outer_join_query,
    _STREAM_OUTER_SQL,
    description="stream-stream LEFT OUTER join as a REAL streaming "
                "query: unmatched purchases held in state and flushed "
                "as NULL rows only after the watermark closes their "
                "window (two-file flush tail) — equals the batch "
                "LEFT JOIN"))


# --- streaming twin #5: the Spark-4 streaming PYTHON DataSource, end-to-end -------

PYSRC_SEED = "pys11"
PYSRC_MAX_DOCS = 600
PYSRC_BATCH = 100


def streaming_pysource_agg_query(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """The engine's custom streaming PYTHON DataSource
    (sources/corpusgen.py `CorpusGenStreamReader`,
    `simpleStreamReader`) driven as a REAL checkpointed stream with a
    STATEFUL complete-mode aggregation on top: six 100-doc micro-batches
    flow through the source's own offset management (plain doc-id
    cursors; `readBetweenOffsets` replay makes the generator its own
    write-ahead log), and per-(lang, source) counts/sums accumulate in
    streaming state.

    The oracle is GENERATIVE SQL: it reproduces the (seed, doc_id) md5
    derivation — token count from hash byte 0, lang/source from bytes
    1-2, every vocabulary word from byte (k mod 16) of
    md5(seed:i:k div 16) — builds the same text, and aggregates. A green
    row therefore proves the whole chain: Python source partition/offset
    protocol -> Arrow transfer -> streaming stateful agg == a from-
    first-principles reconstruction in a different engine. No fixture
    table is read; the corpus exists only as the deterministic function
    both engines evaluate.
    """
    import shutil
    import tempfile
    import time as timemod
    import uuid

    from downscaledclimatedata_spark.sources.corpusgen import (
        CorpusGenDataSource)

    try:
        spark.dataSource.register(CorpusGenDataSource)
    except Exception as exc:
        # Re-registering the same short name on a warm session is the only
        # benign failure; anything else (API drift, pickling error) must
        # surface HERE, not later as a confusing "format not found".
        if "already" not in str(exc).lower():
            raise
    base = tempfile.mkdtemp(prefix="dcd_pysrc_")
    name = f"pysrc_{uuid.uuid4().hex[:8]}"
    try:
        # state partitions sized to the input (see streaming/stream.py
        # scaled_state_partitions): the generative source emits
        # PYSRC_MAX_DOCS bounded docs — KB-scale, so the floor applies
        with scaled_state_partitions(spark, 0):
            stream = (spark.readStream.format("corpusgen")
                      .option("batch_docs", PYSRC_BATCH)
                      .option("max_docs", PYSRC_MAX_DOCS)
                      .option("seed", PYSRC_SEED).load())
            agg = (stream.groupBy("lang", "source")
                   .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                        F.sum("doc_id").cast("bigint").alias("sum_id"),
                        F.sum("n_chars").cast("bigint").alias("sum_chars")))
            q = (agg.writeStream.format("memory").queryName(name)
                 .outputMode("complete")
                 .option("checkpointLocation", f"{base}/ckpt")
                 .trigger(processingTime="0 seconds").start())
            deadline = timemod.time() + 180
            total = 0
            while timemod.time() < deadline:
                rows = spark.table(name).agg(F.sum("n_docs")).first()
                total = int(rows[0] or 0)
                if total >= PYSRC_MAX_DOCS:
                    break
                timemod.sleep(0.5)
            q.stop()
            q.awaitTermination(60)
        if total < PYSRC_MAX_DOCS:
            raise RuntimeError(
                f"streaming python source drained only {total} of "
                f"{PYSRC_MAX_DOCS} docs before the deadline")
        return spark.table(name).localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _pysource_sql() -> str:
    # the EXACT vocabulary and derivation of sources/corpusgen._doc_row
    vocab = ("key agg row scan slow fast table value part hash merge "
             "batch spark line sort window order data column join small "
             "customer query big stream group vector filter the a").split()
    vlist = "[" + ", ".join(f"'{w}'" for w in vocab) + "]"
    langs = "['en', 'es', 'fr', 'de', 'zh']"
    byte0 = f"CAST(('0x' || substr(md5('{PYSRC_SEED}:' || i), 1, 2)) AS INT)"
    byte1 = f"CAST(('0x' || substr(md5('{PYSRC_SEED}:' || i), 3, 2)) AS INT)"
    byte2 = f"CAST(('0x' || substr(md5('{PYSRC_SEED}:' || i), 5, 2)) AS INT)"
    wordk = (f"({vlist})[CAST(('0x' || substr("
             f"md5('{PYSRC_SEED}:' || i || ':' || (k // 16)), "
             f"(k % 16) * 2 + 1, 2)) AS INT) % {len(vocab)} + 1]")
    return f"""
WITH ids AS (
  SELECT UNNEST(range(0, {PYSRC_MAX_DOCS})) AS i
), base AS (
  SELECT i, 10 + {byte0} % 90 AS n_tokens,
    ({langs})[{byte1} % 5 + 1] AS lang,
    'src' || CAST({byte2} % 20 AS VARCHAR) AS source
  FROM ids
), txt AS (
  SELECT i, lang, source,
    array_to_string(list_transform(range(0, n_tokens), k -> {wordk}),
                    ' ') AS text
  FROM base
)
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(i) AS BIGINT) AS sum_id,
  CAST(SUM(length(text)) AS BIGINT) AS sum_chars
FROM txt GROUP BY lang, source
"""


register(QuerySpec(
    "streaming_pysource_agg", streaming_pysource_agg_query,
    _pysource_sql(),
    description="Spark-4 streaming PYTHON DataSource as a real "
                "checkpointed stream (offset-cursor micro-batches) "
                "with a stateful complete-mode agg — hash-matched "
                "against a generative SQL oracle that rebuilds the "
                "corpus from the md5 derivation"))
