"""Scale-technique queries: explicit skew salting, Python UDTF, MapType.

These demonstrate, as oracle-checked relational results, the techniques a
100 TB deployment leans on beyond what AQE does automatically:

- q52: explicit key salting for a skewed join — the pattern to reach for
  when AQE's skew-join splitting can't help (e.g. skewed *aggregation*
  feeding a join, or a build side too big to replicate whole). The salt
  must be deterministic here for oracle reproducibility; in production use
  ``pmod(xxhash64(unique_row_id), S)`` for uniformity.
- q53: a Python UDTF (Spark 4 generator table function) — completes the
  UDF/UDAF/UDTF surface of SURVEY §2.10 (reference has UDTF-shaped
  generators: Loca2Datasets.get_downloadable_files,
  /root/reference/downscaled_climate_data/sensors/loca2_sensor.py:34-78).
  UDTFs are the slow path (row-at-a-time Python); use only where a
  generator genuinely can't be expressed as explode(expr) — here the
  built-in equivalent is posexplode(split(...)), shown in the oracle.
- q54: MapType construction/access (map_from_entries, size, element_at) —
  the reference's dict-shaped lookups (SURVEY §2.8 map/dict access row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from downscaledclimatedata_spark.plans import QuerySpec, register
from downscaledclimatedata_spark.sources.tables import load_table, load_table_parallel

N_SALTS = 8


# --- q52: salted skew join ------------------------------------------------------

def q52_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order-priority via an explicitly salted join.

    The fact side (lineitem) carries salt = l_linenumber % S (deterministic,
    row-stable); the other side (orders) is exploded xS so every
    (o_orderkey, salt) partner exists. The join key becomes (orderkey,
    salt), spreading a hot orderkey over S reducers. Result is identical to
    the unsalted join, which is exactly what the oracle checks.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    fact = li.select(
        "l_orderkey",
        (F.col("l_linenumber") % N_SALTS).alias("salt"),
        (F.col("l_extendedprice").cast("decimal(18,2)")
         * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
         ).alias("rev"))
    salted_orders = orders.select(
        "o_orderkey", "o_orderpriority",
        F.explode(F.array(*[F.lit(s) for s in range(N_SALTS)])).alias("salt"))
    joined = fact.join(
        salted_orders,
        (fact.l_orderkey == salted_orders.o_orderkey)
        & (fact.salt == salted_orders.salt))
    return (joined.groupBy("o_orderpriority")
            .agg(F.sum("rev").cast("double").alias("revenue"),
                 F.count("*").alias("n_items"))
            .orderBy("o_orderpriority"))


_Q52_SQL = """
SELECT o_orderpriority,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
       AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- q53: Python UDTF word exploder --------------------------------------------

class ExplodeWords:
    """Generator UDTF: text -> (word, pos) rows, whitespace-tokenized.

    Mirrors the reference's generator-shaped file enumerator (SURVEY §2.10
    U5). Registered via spark.udtf.register and invoked with LATERAL.
    """

    def eval(self, text: str):  # noqa: D102 - UDTF protocol method
        if text:
            for i, w in enumerate(text.split()):
                yield (w, i)


def q53_udtf_word_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    docs.select("doc_id", "text").createOrReplaceTempView("q53_docs")
    spark.udtf.register(
        "explode_words", udtf(ExplodeWords, returnType="word string, pos int"))
    return spark.sql("""
        SELECT word, COUNT(*) AS n, CAST(SUM(pos) AS BIGINT) AS sum_pos
        FROM q53_docs, LATERAL explode_words(text)
        GROUP BY word
    """)


_Q53_SQL = r"""
WITH s AS (
  SELECT doc_id, string_split_regex(text, '[ \t\n\r\f\x0B]+') AS ws
  FROM documents WHERE doc_id < 100
), u AS (
  SELECT doc_id, unnest(ws) AS word, generate_subscripts(ws, 1) AS raw_pos
  FROM s
), filtered AS (
  SELECT doc_id, word,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY raw_pos) - 1 AS pos
  FROM u WHERE word <> ''
)
SELECT word, COUNT(*) AS n, CAST(SUM(pos) AS BIGINT) AS sum_pos
FROM filtered GROUP BY word
"""


# --- q54: MapType build + lookup ------------------------------------------------

def q54_map_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event_type->count map; read back size + one key.

    map_from_entries over collect_list(struct) is the canonical MapType
    constructor; element_at returns NULL for a missing key (1-based / keyed
    semantics per SURVEY §2.8).
    """
    ev = load_table_parallel(spark, sf_dir, "events", key="user_id")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    maps = (counts.groupBy("user_id")
            .agg(F.map_from_entries(
                F.collect_list(F.struct("event_type", "c"))).alias("m")))
    return maps.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.coalesce(F.element_at("m", F.lit("click")), F.lit(0)).alias("click_events"))


_Q54_SQL = """
SELECT user_id,
  COUNT(DISTINCT event_type) AS n_types,
  CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT)
    AS click_events
FROM events GROUP BY user_id
"""


# --- q56: deterministic stratified train/val/test split -------------------------

def q56_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by seeded content-independent
    hash of the document id — stable under reprocessing, cluster-layout
    independent, and resplittable (change the seed, get a fresh split).
    The per-(source, split) counts expose stratification quality; at
    100 TB this is a narrow projection + one aggregation, no shuffle of
    document payloads.
    """
    from downscaledclimatedata_spark.functions.hashing import md5_long
    docs = load_table_parallel(spark, sf_dir, "documents", key="doc_id")
    bucket = md5_long(F.col("doc_id").cast("string"), seed="split:") % 100
    split = (F.when(bucket < 80, "train")
             .when(bucket < 90, "val").otherwise("test"))
    return (docs.select("source", split.alias("split"))
            .groupBy("source", "split")
            .agg(F.count("*").alias("n_docs"))
            .orderBy("source", "split"))


def _q56_sql() -> str:
    from downscaledclimatedata_spark.functions.hashing import md5_long_sql
    bucket = f"{md5_long_sql('CAST(doc_id AS VARCHAR)', seed='split:')} % 100"
    return f"""
SELECT source,
  CASE WHEN {bucket} < 80 THEN 'train'
       WHEN {bucket} < 90 THEN 'val' ELSE 'test' END AS split,
  COUNT(*) AS n_docs
FROM documents
GROUP BY source, CASE WHEN {bucket} < 80 THEN 'train'
                      WHEN {bucket} < 90 THEN 'val' ELSE 'test' END
ORDER BY source, split
"""


register(QuerySpec("q56_stratified_split", q56_stratified_split, _q56_sql(),
                   description="seeded-hash 80/10/10 split, per-source stratification counts"))


# --- q63: quality-weighted (importance) sampling ---------------------------------

def q63_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling for corpus curation: each doc is kept with
    probability proportional to a quality weight, deterministically.

    Mechanism: integer weight wq in [0, 1000] (here length-proportional,
    capped — any integer quality score plugs in), accept iff
    seeded_hash(id) % 1000 < wq. Exactly Bernoulli(wq/1000) per doc,
    reproducible across runs/engines, no RNG state, no floats in the
    accept decision (the Efraimidis-Spirakis exponential-key trick needs
    pow(), which is not correctly-rounded cross-engine). One narrow pass
    + one aggregation; at 100 TB the shuffle carries only per-source
    partial counts.
    """
    from downscaledclimatedata_spark.functions.hashing import md5_long
    from downscaledclimatedata_spark.operators.textops import _tokens
    docs = load_table_parallel(spark, sf_dir, "documents", key="doc_id")
    staged = docs.select(
        "source", "doc_id", F.size(_tokens(F.col("text"))).alias("n_tokens"))
    wq = F.least(F.col("n_tokens"), F.lit(50)) * 20
    accept = md5_long(F.col("doc_id").cast("string"), seed="wsample:") % 1000 < wq
    return (staged.select("source", "n_tokens", accept.alias("kept"))
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.col("kept").cast("long")).alias("n_kept"),
                 F.sum(F.when(F.col("kept"), F.col("n_tokens"))
                       .otherwise(F.lit(0))).alias("kept_tokens"))
            .orderBy("source"))


def _q63_sql() -> str:
    from downscaledclimatedata_spark.functions.hashing import md5_long_sql
    toks = r"list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'), x -> x <> '')"
    accept = (f"{md5_long_sql('CAST(doc_id AS VARCHAR)', seed='wsample:')} % 1000"
              f" < least(len({toks}), 50) * 20")
    return f"""
SELECT source, COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN {accept} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(SUM(CASE WHEN {accept} THEN len({toks}) ELSE 0 END) AS BIGINT) AS kept_tokens
FROM documents GROUP BY source ORDER BY source
"""


register(QuerySpec("q63_weighted_sample", q63_weighted_sample, _q63_sql(),
                   description="deterministic quality-weighted Bernoulli sampling (integer-exact accept rule)"))


# --- q64: single-pass histogram quantiles ----------------------------------------

HIST_BIN = 1.0  # bucket width in value units


def q64_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles from a fixed-width histogram in ONE pass —
    the scale pattern for percentiles over 100 TB where a global sort
    (exact percentile) or a mergeable sketch (t-digest/KLL, engine-
    specific) is unavailable or non-deterministic. Error is bounded by
    the bin width; the entire computation is integer counts plus one
    final division, so the oracle is exact.

    Plan: bucket = floor(value / w) (narrow), one aggregation to bucket
    counts (shuffle carries #buckets rows), cumulative window over the
    tiny bucket relation, then the smallest bucket covering each target
    rank. The window runs over buckets, not rows — driver-scale data.
    """
    from pyspark.sql import Window
    ev = load_table(spark, sf_dir, "events")
    buckets = (ev.select(F.floor(F.col("value") / HIST_BIN).cast("long").alias("bucket"))
               .groupBy("bucket").agg(F.count("*").alias("cnt")))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = buckets.withColumn("cum", F.sum("cnt").over(w))
    # total as a broadcast 1-row relation (no driver-side count action)
    total = ev.agg(F.count("*").alias("n"))
    cum = cum.crossJoin(F.broadcast(total))
    qs = [50, 95, 99]
    out = None
    for q in qs:
        rank = F.expr(f"(n * {q} + 99) div 100")  # ceil(n*q/100), exact ints
        hit = (cum.filter(F.col("cum") >= rank)
               .orderBy("bucket").limit(1)
               .select(F.lit(q).alias("q"), "bucket",
                       (F.col("bucket").cast("double") * HIST_BIN).alias("approx_value")))
        out = hit if out is None else out.unionAll(hit)
    return out


_Q64_SQL = f"""
WITH b AS (
  SELECT CAST(floor(value / {HIST_BIN}) AS BIGINT) AS bucket, COUNT(*) AS cnt
  FROM events GROUP BY 1
), c AS (
  SELECT bucket, cnt,
    SUM(cnt) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum
  FROM b
), t AS (SELECT COUNT(*) AS n FROM events),
targets AS (SELECT UNNEST([50, 95, 99]) AS q)
SELECT q, bucket, CAST(bucket AS DOUBLE) * {HIST_BIN} AS approx_value
FROM targets, LATERAL (
  SELECT bucket FROM c, t
  -- ceil(n*q/100) in exact ints; (+99)//100 because DuckDB's // TRUNCATES
  -- toward zero (a negated-floor ceil idiom silently floors here)
  WHERE cum >= (t.n * targets.q + 99) // 100
  ORDER BY bucket LIMIT 1
) hit
"""


register(QuerySpec("q64_histogram_quantile", q64_histogram_quantile, _Q64_SQL,
                   description="single-pass fixed-bin histogram quantiles (p50/p95/p99), integer-exact"))


# --- q59: sequence packing (concat-then-chunk) ----------------------------------

PACK_CAPACITY = 512
# Phase-1 parallel unit: docs per packing block. Parallel width of the
# running sum is ~(corpus size / PACK_BLOCK) tasks instead of one task per
# source; the per-block offset relation has corpus/PACK_BLOCK rows.
PACK_BLOCK = 512
# Broadcast budget for the offset relation. The chunk_id result is exact
# for ANY block size (the two-phase composition is an identity), so the
# block size is a pure scale knob and can be auto-derived.
MAX_OFFSET_ROWS = 1_000_000


def auto_pack_block(n_docs: int, max_offset_rows: int = MAX_OFFSET_ROWS,
                    floor: int = PACK_BLOCK) -> int:
    """Smallest block size keeping the per-block offset relation under
    ``max_offset_rows`` (ceil(n_docs / block) <= max_offset_rows), never
    below ``floor``. At 10^9 docs this picks 1000 (10^6 offset rows); at
    test scale it stays at the floor. Removes the retune-by-hand footgun
    the PACK_BLOCK comment used to carry."""
    if n_docs <= 0:
        return floor
    return max(floor, -(-n_docs // max_offset_rows))


def q59_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign documents to fixed-capacity token chunks per source —
    the concat-then-chunk packing used to build training sequences.

    chunk_id = floor(start_offset / C) where start_offset is the running
    token count BEFORE the doc in (source, doc_id) order.

    Two-phase prefix sum, so the order-dependent step is NOT one task per
    source (which at 100 TB would funnel each source's entire token stream
    through a single window task):

    1. block = doc_id div PACK_BLOCK. Running sum within (source, block)
       — parallel width ∝ number of blocks, each window task bounded by
       PACK_BLOCK rows.
    2. Per-block token totals (one row per (source, block) — a tiny
       relation) get an exclusive running sum over blocks within each
       source; that per-source window runs over blocks, not docs.
       Broadcast the offsets back and shift: start_offset = block_offset
       + local_before. Identical answer to the single-window form, which
       is exactly what the oracle checks.

    The narrow sized relation (4 small columns) is localCheckpoint'd so
    tokenization runs once, not once per phase.
    """
    from downscaledclimatedata_spark.operators.textops import _tokens
    from pyspark.sql import Window
    docs = load_table_parallel(spark, sf_dir, "documents", key="doc_id")
    # parquet-metadata count (no data scan): the offset relation stays
    # provably broadcastable (<= MAX_OFFSET_ROWS rows) at any corpus size
    pack_block = auto_pack_block(docs.count())
    sized = docs.select(
        "doc_id", "source",
        F.expr(f"doc_id DIV {pack_block}").alias("block"),
        F.size(_tokens(F.col("text"))).alias("n_tokens")).localCheckpoint()
    # phase 1: running sum within (source, block) — bounded-size partitions
    wb = (Window.partitionBy("source", "block").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = sized.withColumn(
        "local_before", F.sum("n_tokens").over(wb) - F.col("n_tokens"))
    # phase 2: exclusive running offsets over the tiny per-block relation
    wo = (Window.partitionBy("source").orderBy("block")
          .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (sized.groupBy("source", "block")
               .agg(F.sum("n_tokens").alias("block_total"))
               .select("source", "block",
                       F.coalesce(F.sum("block_total").over(wo), F.lit(0))
                       .alias("block_offset")))
    chunked = (local.join(F.broadcast(offsets), ["source", "block"])
               .select("source", "n_tokens",
                       F.floor((F.col("block_offset") + F.col("local_before"))
                               / PACK_CAPACITY).alias("chunk_id")))
    return (chunked.groupBy("source", "chunk_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("chunk_tokens")))


_Q59_SQL = rf"""
WITH sized AS (
  SELECT doc_id, source,
    len(list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'), x -> x <> ''))
      AS n_tokens
  FROM documents
), chunked AS (
  SELECT source, n_tokens,
    CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - n_tokens) / {PACK_CAPACITY}) AS BIGINT) AS chunk_id
  FROM sized
)
SELECT source, chunk_id, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens
FROM chunked GROUP BY source, chunk_id
"""


register(QuerySpec("q59_sequence_packing", q59_sequence_packing, _Q59_SQL,
                   description=f"concat-then-chunk packing into {PACK_CAPACITY}-token sequences per source"))


# --- q60: train/test decontamination --------------------------------------------

def q60_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-overlap contamination check between the hash-derived train
    and test splits: for every test doc, how many of its distinct word
    3-grams also occur anywhere in the train split.

    The join is on 60-bit shingle hashes, not strings — the shuffle
    carries 8-byte keys, and the train side is pre-deduplicated to
    distinct shingles (the classic bloom-filter seed set; at 100 TB the
    distinct-shingle relation is the thing you'd persist between runs).
    """
    from downscaledclimatedata_spark.functions.hashing import md5_long
    from downscaledclimatedata_spark.operators.dedup import shingled_rows
    docs = load_table_parallel(spark, sf_dir, "documents", key="doc_id")
    bucket = md5_long(F.col("doc_id").cast("string"), seed="split:") % 100
    train = docs.filter(bucket < 80)
    test = docs.filter(bucket >= 90)
    train_sh = (shingled_rows(train, "text", "doc_id")
                .select(md5_long(F.col("shingle")).alias("h")).distinct())
    test_sh = (shingled_rows(test, "text", "doc_id")
               .select("doc_id", md5_long(F.col("shingle")).alias("h"))
               .distinct())
    contam = (test_sh.join(train_sh, "h", "left_semi")
              .groupBy("doc_id").agg(F.count("*").alias("n_contaminated")))
    totals = test_sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    return (totals.join(contam, "doc_id", "left")
            .select("doc_id", "n_shingles",
                    F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
                    (F.coalesce("n_contaminated", F.lit(0)).cast("double")
                     / F.col("n_shingles").cast("double")).alias("contamination")))


def _q60_sql() -> str:
    from downscaledclimatedata_spark.functions.hashing import md5_long_sql
    bucket = f"{md5_long_sql('CAST(doc_id AS VARCHAR)', seed='split:')} % 100"
    shingle_h = md5_long_sql("shingle")
    return rf"""
WITH toks AS (
  SELECT doc_id, {bucket} AS bucket,
    list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'), x -> x <> '') AS t
  FROM documents
),
shingled AS (
  SELECT doc_id, bucket, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM toks, LATERAL (SELECT UNNEST(range(1, greatest(len(t) - 2, 0) + 1)) AS i) idx
),
train_sh AS (
  SELECT DISTINCT {shingle_h} AS h FROM shingled WHERE bucket < 80
),
test_sh AS (
  SELECT DISTINCT doc_id, {shingle_h} AS h FROM shingled WHERE bucket >= 90
),
totals AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM test_sh GROUP BY doc_id
),
contam AS (
  SELECT doc_id, COUNT(*) AS n_contaminated
  FROM test_sh WHERE h IN (SELECT h FROM train_sh)
  GROUP BY doc_id
)
SELECT t.doc_id, t.n_shingles,
  COALESCE(c.n_contaminated, 0) AS n_contaminated,
  CAST(COALESCE(c.n_contaminated, 0) AS DOUBLE)
    / CAST(t.n_shingles AS DOUBLE) AS contamination
FROM totals t LEFT JOIN contam c ON c.doc_id = t.doc_id
"""


register(QuerySpec("q60_decontamination", q60_decontamination, _q60_sql(),
                   description="train/test shingle-overlap contamination per test doc (semi-join on 60-bit hashes)"))


# --- q55: end-to-end training-corpus prep --------------------------------------

def q55_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship composite: language filter -> quality gate -> exact dedup
    -> per-source corpus stats, in ONE declarative pipeline.

    This is the LLM-training-data shape the engine exists for: a 100 TB
    corpus pass that Catalyst plans as scan -> project/filter (pushed to
    the parquet scan) -> two hash aggregations. Exactly two shuffles: one
    on content_hash (dedup), one on source (rollup). The dedup
    representative is min_by(_, doc_id) so every surviving column comes
    from the same deterministic row. Floats stay comparable because the
    quality score is a fixed expression over exact integer token counts
    and only min/max (order-independent) aggregate it.
    """
    from downscaledclimatedata_spark.functions.hashing import md5_long
    from downscaledclimatedata_spark.operators.textops import (
        STOPWORDS, _safe_ratio, _tokens)

    docs = load_table_parallel(spark, sf_dir, "documents", key="doc_id")
    toks = _tokens(F.col("text"))
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_uniq = F.size(F.array_distinct(toks))
    score = (F.lit(0.4) * F.least(n.cast("double") / F.lit(50.0), F.lit(1.0))
             + F.lit(0.3) * _safe_ratio(n_uniq, n)
             + F.lit(0.3) * F.least(_safe_ratio(n_stop, n) * 5, F.lit(1.0)))
    scored = (docs.filter(F.col("lang") == "en")
              .select("doc_id", "source",
                      md5_long(F.concat_ws(" ", toks)).alias("content_hash"),
                      n.alias("n_tokens"), score.alias("quality"))
              .filter(F.col("quality") >= 0.5))
    kept = (scored.groupBy("content_hash")
            .agg(F.min("doc_id").alias("doc_id"),
                 F.min_by("source", "doc_id").alias("source"),
                 F.min_by("n_tokens", "doc_id").alias("n_tokens"),
                 F.min_by("quality", "doc_id").alias("quality")))
    return (kept.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("total_tokens"),
                 F.min("quality").alias("min_quality"),
                 F.max("quality").alias("max_quality")))


def _q55_sql() -> str:
    from downscaledclimatedata_spark.functions.hashing import md5_long_sql
    from downscaledclimatedata_spark.operators.textops import STOPWORDS
    toks = r"list_filter(string_split_regex(lower(text), '[ \t\n\r\f\x0B]+'), x -> x <> '')"
    stop_list = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    return f"""
WITH t AS (
  SELECT doc_id, source, {toks} AS toks FROM documents WHERE lang = 'en'
), m AS (
  SELECT doc_id, source,
    {md5_long_sql("coalesce(array_to_string(toks, ' '), '')")} AS content_hash,
    len(toks) AS n_tokens,
    len(list_filter(toks, x -> list_contains({stop_list}, x))) AS n_stop,
    len(list_distinct(toks)) AS n_uniq
  FROM t
), scored AS (
  SELECT doc_id, source, content_hash, n_tokens,
    0.4 * least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
      + 0.3 * (CASE WHEN n_tokens > 0
               THEN CAST(n_uniq AS DOUBLE) / CAST(n_tokens AS DOUBLE)
               ELSE 0.0 END)
      + 0.3 * least((CASE WHEN n_tokens > 0
                     THEN CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                     ELSE 0.0 END) * 5, 1.0)
      AS quality
  FROM m
), gated AS (
  SELECT * FROM scored WHERE quality >= 0.5
), kept AS (
  SELECT content_hash,
    MIN(doc_id) AS doc_id,
    ARG_MIN(source, doc_id) AS source,
    ARG_MIN(n_tokens, doc_id) AS n_tokens,
    ARG_MIN(quality, doc_id) AS quality
  FROM gated GROUP BY content_hash
)
SELECT source, COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  MIN(quality) AS min_quality,
  MAX(quality) AS max_quality
FROM kept GROUP BY source
"""


register(QuerySpec("q55_corpus_prep", q55_corpus_prep, _q55_sql(), headline=True,
                   description="flagship corpus prep: lang filter + quality gate + exact dedup + per-source rollup (2 shuffles)"))
register(QuerySpec("q52_salted_skew_join", q52_salted_skew_join, _Q52_SQL,
                   description="explicit key-salting join (deterministic salt), equals unsalted join"))
register(QuerySpec("q53_udtf_word_positions", q53_udtf_word_positions, _Q53_SQL,
                   description="Python UDTF generator (LATERAL), oracle via split+unnest"))
register(QuerySpec("q54_map_type_counts", q54_map_type_counts, _Q54_SQL,
                   description="MapType map_from_entries/size/element_at"))


# --- q78: big-big interval lookup join via block bucketing -------------------

IVL_WINDOWS = 48       # irregular [lo, hi) windows derived from the ts span
IVL_BLOCKS_PER_W = 4   # target blocks per window => fan-out <= ~6


def q78_interval_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval lookup join — assign every event to the irregular time
    window containing its timestamp — executed as an EQUI-join on
    fixed-width blocks, the pattern that makes range joins feasible
    when BOTH sides are big.

    Spark has no native range-join optimization: a raw
    ``e.ts >= w.lo AND e.ts < w.hi`` join compiles to a
    BroadcastNestedLoopJoin (O(N*W) comparisons, and impossible when
    the window side outgrows a broadcast). The block rewrite maps each
    event to block ``(t - lo) DIV B`` and explodes each window over the
    <= width/B + 2 blocks it overlaps; the join becomes an equi-join on
    the uniformly distributed block id plus a residual range filter.
    Fan-out is bounded by construction (B is sized so a window covers
    ~IVL_BLOCKS_PER_W blocks), and the shuffle keys are uniform —
    no skew even when windows cluster. The join is pinned sort-merge
    because at production scale BOTH sides are corpus-sized (a 48-row
    dim would broadcast, hiding the plan under test).

    Windows are generated in-plan (no collect): a single-row min/max
    bounds aggregate is broadcast under the 48-row window skeleton,
    widths are irregular via md5 weights (1..16 — small enough that
    span_micros * total_weight stays inside int64 for multi-century
    spans; DuckDB silently promotes to HUGEINT, ANSI Spark would
    abort), and all boundary arithmetic is integer micros (DIV),
    exact in both engines. The oracle runs the
    same windows through a PLAIN range join — checking the bucketing
    rewrite against the straightforward semantics it must preserve.
    """
    from pyspark.sql import Window

    from downscaledclimatedata_spark.functions.hashing import md5_long

    ev = load_table(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("te"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"))
    bounds = ev.agg(F.min("te").alias("lo"),
                    (F.max("te") + 1).alias("hi")).filter(
        F.col("lo").isNotNull())
    skel = (spark.range(IVL_WINDOWS).select(
        F.col("id").alias("window_id"),
        (1 + md5_long(F.col("id").cast("string"), "ivl") % 16)
        .alias("weight")))
    cw = Window.orderBy("window_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cum = (skel
           .withColumn("cum", F.sum("weight").over(cw))
           .withColumn("total", F.sum("weight").over(
               Window.partitionBy())))
    win = (cum.crossJoin(F.broadcast(bounds)).select(
        "window_id",
        (F.col("lo") + F.expr(
            "(hi - lo) * (cum - weight) DIV total")).alias("wlo"),
        (F.col("lo") + F.expr("(hi - lo) * cum DIV total")).alias("whi"),
        F.expr(f"(hi - lo) DIV {IVL_WINDOWS * IVL_BLOCKS_PER_W} + 1")
        .alias("bsz"),
        F.col("lo").alias("base"))
        .filter(F.col("whi") > F.col("wlo")))
    wblocks = win.select(
        "window_id", "wlo", "whi",
        F.explode(F.sequence(F.expr("(wlo - base) DIV bsz"),
                             F.expr("(whi - 1 - base) DIV bsz")))
        .alias("blk"),
        "base", "bsz")
    # block size must match the window side's: recompute from the same bounds
    eblk = ev.crossJoin(F.broadcast(bounds)).select(
        "te", "cents",
        F.expr(f"(te - lo) DIV ((hi - lo) DIV {IVL_WINDOWS * IVL_BLOCKS_PER_W} + 1)")
        .alias("blk"))
    joined = (eblk.hint("merge")
              .join(wblocks.hint("merge"), "blk")
              .filter((F.col("te") >= F.col("wlo"))
                      & (F.col("te") < F.col("whi"))))
    return (joined.groupBy("window_id", "wlo", "whi")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("cents").alias("sum_value_cents"))
            .orderBy("window_id"))


def _q78_sql() -> str:
    from downscaledclimatedata_spark.functions.hashing import md5_long_sql
    w = md5_long_sql("CAST(i AS VARCHAR)", "ivl")
    return f"""
WITH bounds AS (
  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) + 1 AS hi FROM events
), skel AS (
  SELECT i AS window_id, 1 + {w} % 16 AS weight
  FROM (SELECT unnest(generate_series(0, {IVL_WINDOWS - 1})) AS i)
), cum AS (
  SELECT window_id, weight,
    CAST(SUM(weight) OVER (ORDER BY window_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
    CAST(SUM(weight) OVER () AS BIGINT) AS total
  FROM skel
), win AS (
  SELECT window_id,
    CAST(lo + (hi - lo) * (cum - weight) // total AS BIGINT) AS wlo,
    CAST(lo + (hi - lo) * cum // total AS BIGINT) AS whi
  FROM cum, bounds
  WHERE lo IS NOT NULL
)
SELECT w.window_id, w.wlo, w.whi, COUNT(*) AS n_events,
  CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
    AS sum_value_cents
FROM win w JOIN events e
  ON epoch_us(e.ts) >= w.wlo AND epoch_us(e.ts) < w.whi
WHERE w.whi > w.wlo
GROUP BY w.window_id, w.wlo, w.whi
ORDER BY w.window_id
"""


register(QuerySpec("q78_interval_lookup", q78_interval_lookup, _q78_sql(),
                   description="interval join as a block-bucketed equi-join: "
                               "bounded fan-out, uniform shuffle keys, no "
                               "BroadcastNestedLoopJoin; oracle is the plain "
                               "range join"))


# --- q79: explicit bloom-filter join reduction -------------------------------

BLOOMJ_K = 5          # hash functions
BLOOMJ_M = 8192       # filter bits
BLOOMJ_WORDS = BLOOMJ_M // 64
BLOOMJ_PRIORITY = "1-URGENT"


def q79_bloom_join_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective-join shuffle reduction via an explicit Bloom filter —
    the semi-join pushdown a 100 TB fact-to-filtered-dim join lives or
    dies by. When the dim-side predicate keeps a small fraction of
    keys, shuffling the whole fact table to discover that most rows
    have no partner wastes the bulk of the I/O; a Bloom filter of the
    surviving keys (bits, not keys — 1 KB here) filters the fact side
    BEFORE any shuffle, and the subsequent exact join removes the
    false positives, so the result is provably identical to the plain
    join — which is exactly what the oracle checks. (Spark's AQE can
    inject runtime bloom filters for some shapes —
    spark.sql.optimizer.runtime.bloomFilter — but not when the build
    side is an aggregate or the join is many-stage; the explicit
    construction works everywhere and is engine-portable.)

    The filter is a BITMAP: set bits aggregate to <= m/64 words
    (bit_or of shifted ones, map-side combined), densified over a
    range(m/64) skeleton, packed into ONE array row, broadcast; the
    fact-side membership test is k O(1) array-index + mask probes per
    row, entirely inside whole-stage codegen — no UDF, no per-row
    array scan.
    """
    from downscaledclimatedata_spark.functions.hashing import md5_long

    sel = (load_table(spark, sf_dir, "orders")
           .filter(F.col("o_orderpriority") == BLOOMJ_PRIORITY)
           .select("o_orderkey", "o_orderpriority"))

    def hashes(col):
        return [md5_long(F.col(col).cast("string"), seed=f"bj{i}")
                % BLOOMJ_M for i in range(BLOOMJ_K)]

    bits = (sel.select(F.explode(F.array(*hashes("o_orderkey")))
                       .alias("bit")).distinct())
    words = (bits.groupBy((F.col("bit") / 64).cast("int").alias("idx"))
             .agg(F.bit_or(F.expr(
                 "shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))"))
                  .alias("w")))
    dense = (spark.range(BLOOMJ_WORDS).select(F.col("id").cast("int")
                                              .alias("idx"))
             .join(words, "idx", "left")
             .select("idx", F.coalesce("w", F.lit(0).cast("long"))
                     .alias("w")))
    bitmap = dense.agg(F.transform(
        F.array_sort(F.collect_list(F.struct("idx", "w"))),
        lambda x: x["w"]).alias("bm"))

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate",
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        .alias("cents"))
    probe = li.crossJoin(F.broadcast(bitmap))
    member = None
    for i in range(BLOOMJ_K):
        h = (f"(CAST(conv(substring(md5(concat('bj{i}', "
             f"CAST(l_orderkey AS STRING))), 1, 15), 16, 10) AS BIGINT)"
             f" % {BLOOMJ_M})")
        t = F.expr(f"(shiftright(element_at(bm, CAST({h} / 64 AS INT) + 1), "
                   f"CAST({h} % 64 AS INT)) & 1) = 1")
        member = t if member is None else (member & t)
    filtered = probe.filter(member).drop("bm")

    return (filtered.join(F.broadcast(sel),
                          F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy(F.trunc("l_shipdate", "month").alias("month"))
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.sum("cents").alias("revenue_cents"))
            .orderBy("month"))


_Q79_SQL = f"""
SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
  COUNT(*) AS n_items,
  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
    AS revenue_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '{BLOOMJ_PRIORITY}'
GROUP BY 1
ORDER BY 1
"""

register(QuerySpec("q79_bloom_join_reduction", q79_bloom_join_reduction,
                   _Q79_SQL,
                   description="explicit Bloom semi-join pushdown: 1 KB "
                               "broadcast bitmap filters the fact side "
                               "before any shuffle; exact join removes "
                               "false positives — oracle is the plain "
                               "join"))


# --- q103: salted skew join -----------------------------------------------------

SALT_FACTOR = 8


def q103_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join salting, made explicit: the fact side appends a
    deterministic salt in [0, SALT_FACTOR) to its join key; the
    (bounded) dim side replicates once per salt value; the join runs on
    (key, salt), so a key whose fact rows would all land in ONE reducer
    now spreads across SALT_FACTOR of them. The result is provably
    identical to the plain join — which is what the oracle checks —
    because every fact row still meets exactly one dim replica.

    This is the manual cure for the skew AQE's skew-join handles only
    for sort-merge shapes it can detect at runtime; salting works for
    any shape and any engine, at the cost of a SALT_FACTOR x dim
    replication (dim here is a per-user aggregate — |users| rows — so
    replication is |users| x 8, still dim-scale).

    The salt must be DETERMINISTIC (id-derived, not rand()): replayed
    tasks must salt a row identically or the join drops/duplicates
    rows under retry — the same replay discipline as the streaming
    delta partitions.
    """
    ev = load_table_parallel(spark, sf_dir, "events", key="user_id")
    # dim: per-user lifetime value (bounded by |users|)
    dim = (ev.groupBy("user_id")
           .agg(F.sum(F.round(F.col("value") * 100).cast("bigint"))
                .alias("ltv_cents")))
    salt_vals = F.explode(
        F.array(*[F.lit(s) for s in range(SALT_FACTOR)])).alias("salt")
    dim_rep = dim.select("user_id", "ltv_cents", salt_vals)
    fact = ev.select(
        "user_id", "event_type",
        (F.col("event_id") % SALT_FACTOR).cast("int").alias("salt"))
    joined = fact.join(dim_rep.hint("merge"), ["user_id", "salt"])
    return (joined.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("ltv_cents").alias("sum_ltv_cents"))
            .select("event_type",
                    F.col("n_events").cast("bigint").alias("n_events"),
                    F.col("sum_ltv_cents").cast("bigint")
                    .alias("sum_ltv_cents"))
            .orderBy("event_type"))


_Q103_SQL = """
WITH dim AS (
  SELECT user_id,
    SUM(CAST(round(value * 100) AS BIGINT)) AS ltv_cents
  FROM events GROUP BY user_id
)
SELECT e.event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(d.ltv_cents) AS BIGINT) AS sum_ltv_cents
FROM events e JOIN dim d USING (user_id)
GROUP BY e.event_type ORDER BY e.event_type
"""

register(QuerySpec("q103_salted_skew_join", q103_salted_skew_join,
                   _Q103_SQL,
                   description="explicit hot-key join salting: "
                               "deterministic fact-side salt + "
                               "SALT_FACTOR dim replication on "
                               "(key, salt) — oracle is the plain "
                               "join"))


# --- q129: POLYMORPHIC Python UDTF (analyze-time schema, TABLE argument) ----------

Q129_NS = (1, 2, 3)
Q129_DOC_CAP = 200  # bounded demo population (row-at-a-time Python)


class NgramProfile:
    """Polymorphic UDTF: output SCHEMA is computed at plan time by
    ``analyze`` from the literal n-list argument — for ns='1,2,3' the
    columns are doc_id, n1_total, n1_distinct, n2_total, n2_distinct,
    n3_total, n3_distinct. Consumes its input as a TABLE argument
    (Spark 4's table-valued UDTF protocol), one profile row per input
    row: character n-gram totals and distinct counts per requested n.

    This is the analyze()-driven half of the UDTF surface q53's plain
    generator UDTF does not exercise.
    """

    @staticmethod
    def analyze(row, ns):  # noqa: D102 - UDTF protocol
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import (LongType, StructField, StructType)

        fields = [StructField("doc_id", LongType())]
        for n in str(ns.value).split(","):
            n = int(n)
            fields.append(StructField(f"n{n}_total", LongType()))
            fields.append(StructField(f"n{n}_distinct", LongType()))
        return AnalyzeResult(schema=StructType(fields))

    def eval(self, row, ns):  # noqa: D102 - UDTF protocol
        text = row["text"] or ""
        out = [row["doc_id"]]
        for n in str(ns).split(","):
            n = int(n)
            total = max(len(text) - n + 1, 0)
            out.append(total)
            out.append(len({text[i:i + n] for i in range(total)}))
        yield tuple(out)


def q129_udtf_ngram_profile(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf
    docs = load_table(spark, sf_dir, "documents") \
        .filter(F.col("doc_id") < Q129_DOC_CAP)
    docs.select("doc_id", "text").createOrReplaceTempView("q129_docs")
    spark.udtf.register("ngram_profile", udtf(NgramProfile))
    ns = ",".join(str(n) for n in Q129_NS)
    return spark.sql(f"""
        SELECT * FROM ngram_profile(
            TABLE(SELECT doc_id, text FROM q129_docs), '{ns}')
    """)


def _q129_sql() -> str:
    cols = []
    for n in Q129_NS:
        m = f"greatest(length(t) - {n} + 1, 0)"
        cols.append(f"CAST({m} AS BIGINT) AS n{n}_total")
        cols.append(
            f"CAST(len(list_distinct(list_transform(range(1, {m} + 1), "
            f"i -> substring(t, CAST(i AS INT), {n})))) AS BIGINT) "
            f"AS n{n}_distinct")
    return f"""
SELECT doc_id, {', '.join(cols)}
FROM (SELECT doc_id, coalesce(text, '') AS t FROM documents
      WHERE doc_id < {Q129_DOC_CAP})
"""

register(QuerySpec("q129_udtf_ngram_profile", q129_udtf_ngram_profile,
                   _q129_sql(),
                   description="polymorphic UDTF: analyze()-computed "
                               "schema from a literal argument, TABLE "
                               "input, per-doc char n-gram profile"))


# --- q134: the ARROW-optimized UDTF twin — full corpus, no demo cap ---------------


def q134_udtf_ngram_profile_arrow(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """The scale-honest twin of q129: the SAME polymorphic UDTF class
    (same ``analyze``-computed schema, same per-row profile) executed
    through Spark 4's ARROW-optimized Python UDTF path
    (``udtf(..., useArrow=True)``) over the FULL documents table — no
    ``doc_id < 200`` demo cap. Arrow replaces the per-row pickle
    round-trip with columnar batch transfer, which is what makes a
    row-at-a-time UDTF surface acceptable on a corpus: the Python work
    per row is a handful of slicing ops; the serialization tax was the
    scale problem. q129 stays registered as the capped row-pickle
    reference so the two protocols are testable against the SAME
    oracle shape.
    """
    from pyspark.sql.functions import udtf
    docs = load_table(spark, sf_dir, "documents")
    docs.select("doc_id", "text").createOrReplaceTempView("q134_docs")
    spark.udtf.register("ngram_profile_arrow",
                        udtf(NgramProfile, useArrow=True))
    ns = ",".join(str(n) for n in Q129_NS)
    return spark.sql(f"""
        SELECT * FROM ngram_profile_arrow(
            TABLE(SELECT doc_id, text FROM q134_docs), '{ns}')
    """)


def _q134_sql() -> str:
    cols = []
    for n in Q129_NS:
        m = f"greatest(length(t) - {n} + 1, 0)"
        cols.append(f"CAST({m} AS BIGINT) AS n{n}_total")
        cols.append(
            f"CAST(len(list_distinct(list_transform(range(1, {m} + 1), "
            f"i -> substring(t, CAST(i AS INT), {n})))) AS BIGINT) "
            f"AS n{n}_distinct")
    return f"""
SELECT doc_id, {', '.join(cols)}
FROM (SELECT doc_id, coalesce(text, '') AS t FROM documents)
"""

register(QuerySpec("q134_udtf_ngram_profile_arrow",
                   q134_udtf_ngram_profile_arrow, _q134_sql(),
                   description="Arrow-optimized polymorphic UDTF over "
                               "the FULL corpus (useArrow=True, no demo "
                               "cap): same analyze-time schema as q129, "
                               "columnar batch transfer instead of "
                               "per-row pickle"))
