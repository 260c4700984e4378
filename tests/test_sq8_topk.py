"""Scalar-quantization (SQ8) searcher: recall floor vs exact truth, the
planted identical-vector property, and the dequantization-error bound
that makes 8-bit codes near-lossless on this corpus."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from downscaledclimatedata_spark.operators.similarity import (
    DIM, SQ_LEVELS, SQ_POOL, cosine_topk_quantized, quantize, sq8_topk,
    sq_norm)
from downscaledclimatedata_spark.sources.tables import load_table
from tests.conftest import SF_CORRECTNESS


def test_sq8_recall_floor_vs_exact(spark):
    emb = load_table(spark, SF_CORRECTNESS, "embeddings").cache()
    truth = {(r.query_id, r.match_id)
             for r in cosine_topk_quantized(emb).collect()}
    approx = {(r.query_id, r.match_id) for r in sq8_topk(emb).collect()}
    assert truth, "exact truth must be non-empty"
    recall = len(truth & approx) / len(truth)
    # 255 levels over the per-dim range + asymmetric ADC + exact rerank
    # measures recall@5 = 1.0 on this corpus; gate below for drift
    assert recall >= 0.9, recall
    per_q = Counter(q for q, _ in approx)
    assert all(c <= 5 for c in per_q.values())
    assert SQ_POOL < emb.count()


def test_sq8_identical_vector_is_top1(spark):
    def vec(i):
        return [float(((i * 2654435761 + d * 40503) % 997) - 498) / 100.0
                for d in range(64)]
    rows = [(i, vec(i), 0) for i in range(60)]
    rows.append((100, vec(0), 0))  # exact duplicate of vec 0
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    got = {(r.query_id, r.rnk): r.match_id for r in sq8_topk(emb).collect()}
    assert got[(0, 1)] == 100, got


def test_sq8_dequantization_error_bound(spark):
    """recon_d stays in [mn_d, mx_d] and within one quantization step of
    the input — the bound the near-lossless recall rests on."""
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    base = (emb.select("vec_id", quantize(F.col("embedding")).alias("qv"))
            .withColumn("n2", sq_norm(F.col("qv")))
            .filter(F.col("n2") > 0))
    mm = base.agg(
        F.array(*[F.min(F.col("qv")[d]) for d in range(DIM)]).alias("mn"),
        F.array(*[F.max(F.col("qv")[d]) for d in range(DIM)]).alias("mx"))
    recon = F.expr(f"""
        transform(sequence(0, {DIM - 1}), d ->
          mn[d] + CASE WHEN mx[d] > mn[d]
            THEN ((((qv[d] - mn[d]) * {SQ_LEVELS}) DIV (mx[d] - mn[d]))
                  * (mx[d] - mn[d])) DIV {SQ_LEVELS}
            ELSE CAST(0 AS BIGINT) END)
    """)
    checked = (base.crossJoin(F.broadcast(mm))
               .withColumn("rv", recon)
               .select(
                   F.expr(f"""
                     size(filter(sequence(0, {DIM - 1}), d ->
                       rv[d] < mn[d] OR rv[d] > mx[d])) AS n_out_of_range"""),
                   F.expr(f"""
                     size(filter(sequence(0, {DIM - 1}), d ->
                       abs(rv[d] - qv[d]) >
                       CASE WHEN mx[d] > mn[d]
                            THEN (mx[d] - mn[d]) DIV {SQ_LEVELS} + 2
                            ELSE abs(qv[d] - mn[d]) END))
                     AS n_step_violations"""))
               .agg(F.sum("n_out_of_range").alias("oor"),
                    F.sum("n_step_violations").alias("viol"))
               .collect()[0])
    assert checked.oor == 0
    assert checked.viol == 0


def test_semantic_decon_flags_planted_paraphrase(spark):
    """A near-copy of an eval vector (paraphrase class) is flagged with
    the right eval id; an orthogonal vector is not; eval members flag
    themselves as verbatim."""
    from downscaledclimatedata_spark.operators.similarity import (
        semantic_decontaminate)

    def vec(i):
        return [float(((i * 2654435761 + d * 40503) % 997) - 498) / 100.0
                for d in range(64)]
    rows = [(i, vec(i), 0) for i in range(80)]
    # id 0 and 37 are eval members (EVD_MOD spacing); plant a paraphrase
    # of eval vec 37: same direction, tiny perturbation
    para = [v * 1.01 + 0.01 for v in vec(37)]
    rows.append((500, para, 0))
    # and an orthogonal one-hot vector far from everything
    rows.append((501, [1000.0] + [0.0] * 63, 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    got = {r.vec_id: r for r in semantic_decontaminate(emb).collect()}
    assert got[0].is_verbatim_self and got[0].best_cosine == 1.0
    assert got[37].is_verbatim_self
    assert 500 in got and got[500].best_eval_id == 37
    assert got[500].best_cosine > 0.99 and not got[500].is_verbatim_self
    assert 501 not in got
