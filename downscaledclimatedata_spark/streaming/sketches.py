"""Incremental frequency/membership sketches over a document stream.

The batch sketches (operators/textops.py: `cms_estimate`,
`bloom_membership`) are mergeable BY CONSTRUCTION — CMS cells add
cell-wise, Bloom bits OR by union — and this module is where that
property earns its keep: each micro-batch folds into a persistent
sketch without ever re-reading ingested data.

Design: the sketch state is a tiny partitioned Parquet relation —
CMS: (d, cell, n) with ≤ depth·width rows; Bloom: (bit) with ≤ m rows —
shared with batch jobs and restart-safe (unlike operator-local
streaming state). Each micro-batch:

1. computes the batch's OWN cells/bits with the SAME deterministic md5
   hash family the batch operators use (one code path for the math);
2. merges: CMS cells outer-sum with the stored cells; Bloom bits union;
3. overwrites the state (bounded size: the write is ≤ depth·width or
   ≤ m rows regardless of stream length).

Exactly-once: replaying a batch would double-count CMS cells, so the
state carries a `batch_ids` high-water relation and the merge skips
already-applied batch ids (Bloom needs no guard — union is idempotent).

At 100 TB/stream-day the state stays KBs: this is the sketch whose
whole point is that per-shard/per-batch summaries combine without the
data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from downscaledclimatedata_spark.functions.hashing import md5_long
from downscaledclimatedata_spark.operators.textops import (
    BLOOM_K,
    BLOOM_M,
    CMS_DEPTH,
    CMS_WIDTH,
    _tokens,
)


def batch_cms_cells(batch: DataFrame, text_col: str = "text",
                    depth: int = CMS_DEPTH,
                    width: int = CMS_WIDTH) -> DataFrame:
    """(d, cell, n) CMS counters for ONE batch — the same md5 hash
    family as the batch operator, so a batch sketch and a stream-folded
    sketch agree bit-for-bit."""
    toks = batch.select(F.explode(_tokens(F.col(text_col))).alias("token"))
    rows = None
    for d in range(depth):
        r = toks.select(F.lit(d).alias("d"),
                        (md5_long(F.col("token"), seed=f"cms{d}:") % width)
                        .alias("cell"))
        rows = r if rows is None else rows.unionAll(r)
    return rows.groupBy("d", "cell").agg(F.count("*").alias("n"))


def merge_cms(state: DataFrame | None, delta: DataFrame) -> DataFrame:
    """Cell-wise sum of two CMS relations (either side may miss cells)."""
    if state is None:
        return delta
    return (state.select("d", "cell", "n").unionAll(delta)
            .groupBy("d", "cell").agg(F.sum("n").alias("n")))


def batch_bloom_bits(batch: DataFrame, text_col: str = "text",
                     k: int = BLOOM_K, m: int = BLOOM_M) -> DataFrame:
    """DISTINCT (bit) rows set by ONE batch."""
    toks = batch.select(F.explode(_tokens(F.col(text_col))).alias("token"))
    exprs = [(md5_long(F.col("token"), seed=f"bloom{i}:") % m)
             for i in range(k)]
    return toks.select(F.explode(F.array(*exprs)).alias("bit")).distinct()


def merge_bloom(state: DataFrame | None, delta: DataFrame) -> DataFrame:
    if state is None:
        return delta
    return state.select("bit").unionAll(delta).distinct()


class StreamingSketchIndex:
    """foreachBatch sink folding a document stream into persistent CMS +
    Bloom state under exactly-once replay semantics.

    State layout under ``state_dir``:
      cms/      (d int, cell bigint, n bigint)
      bloom/    (bit bigint)
      applied/  (batch_id long)   — CMS replay guard
    """

    def __init__(self, spark: SparkSession, state_dir: str,
                 text_col: str = "text"):
        self.spark = spark
        self.state_dir = state_dir.rstrip("/")
        self.text_col = text_col

    def _read(self, sub: str, schema: str) -> DataFrame | None:
        import glob
        path = f"{self.state_dir}/{sub}"
        if not glob.glob(path + "/*.parquet"):
            return None
        return self.spark.read.schema(schema).parquet(path)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        applied = self._read("applied", "batch_id long")
        if applied is not None and applied.filter(
                F.col("batch_id") == batch_id).count() > 0:
            return  # replayed batch: CMS must not double-count
        batch = batch.localCheckpoint()  # one evaluation for both sketches

        cms = merge_cms(self._read("cms", "d int, cell bigint, n bigint"),
                        batch_cms_cells(batch, self.text_col))
        bloom = merge_bloom(self._read("bloom", "bit bigint"),
                            batch_bloom_bits(batch, self.text_col))
        # materialize through the driver before overwriting: the merged
        # relations still READ the paths being rewritten (overwrite-
        # while-reading corrupts), and both are bounded by construction
        # (≤ depth·width and ≤ m rows) — the sketch's defining property
        cms_rows = cms.collect()
        bloom_rows = bloom.collect()
        self.spark.createDataFrame(cms_rows, "d int, cell bigint, n bigint") \
            .coalesce(1).write.mode("overwrite") \
            .parquet(f"{self.state_dir}/cms")
        self.spark.createDataFrame(bloom_rows, "bit bigint") \
            .coalesce(1).write.mode("overwrite") \
            .parquet(f"{self.state_dir}/bloom")
        new_applied = [(int(batch_id),)] + (
            [(r.batch_id,) for r in applied.collect()]
            if applied is not None else [])
        self.spark.createDataFrame(new_applied, "batch_id long") \
            .coalesce(1).write.mode("overwrite") \
            .parquet(f"{self.state_dir}/applied")

    def attach(self, stream: DataFrame):
        """writeStream.foreachBatch wiring; returns the StreamingQuery."""
        return (stream.writeStream
                .foreachBatch(self.process_batch)
                .option("checkpointLocation", f"{self.state_dir}/_ckpt")
                .trigger(availableNow=True)
                .start())

    # --- queries over the folded state ---------------------------------

    def estimate(self, terms: tuple[str, ...]) -> dict[str, int]:
        """CMS point estimates for probe terms from the stored cells."""
        import hashlib
        cms = self._read("cms", "d int, cell bigint, n bigint")
        if cms is None:
            return {t: 0 for t in terms}
        cells = {(r.d, r.cell): r.n for r in cms.collect()}

        def h(d: int, t: str) -> int:
            return int(hashlib.md5(f"cms{d}:{t}".encode()).hexdigest()[:15],
                       16) % CMS_WIDTH
        return {t: min(cells.get((d, h(d, t)), 0) for d in range(CMS_DEPTH))
                for t in terms}

    def might_contain(self, terms: tuple[str, ...]) -> dict[str, bool]:
        import hashlib
        bloom = self._read("bloom", "bit bigint")
        bits = ({r.bit for r in bloom.collect()} if bloom is not None
                else set())

        def h(i: int, t: str) -> int:
            return int(hashlib.md5(f"bloom{i}:{t}".encode()).hexdigest()[:15],
                       16) % BLOOM_M
        return {t: all(h(i, t) in bits for i in range(BLOOM_K))
                for t in terms}
