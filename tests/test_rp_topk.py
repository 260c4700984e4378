"""Random-projection (JL) searcher: recall floor vs exact truth and the
planted identical-vector property the other ANN families pin."""

from __future__ import annotations

from collections import Counter

from downscaledclimatedata_spark.operators.similarity import (
    RP_POOL, cosine_topk_quantized, rp_topk)
from downscaledclimatedata_spark.sources.tables import load_table
from tests.conftest import SF_CORRECTNESS


def test_rp_recall_floor_vs_exact(spark):
    emb = load_table(spark, SF_CORRECTNESS, "embeddings").cache()
    truth = {(r.query_id, r.match_id)
             for r in cosine_topk_quantized(emb).collect()}
    approx = {(r.query_id, r.match_id) for r in rp_topk(emb).collect()}
    assert truth, "exact truth must be non-empty"
    recall = len(truth & approx) / len(truth)
    # near-random vectors are JL's worst case; 32-dim/100-pool measures
    # ~0.78 on this corpus — gate well below to absorb fixture drift
    assert recall >= 0.6, recall
    per_q = Counter(q for q, _ in approx)
    assert all(c <= 5 for c in per_q.values())
    assert RP_POOL < emb.count()


def test_rp_identical_vector_is_top1(spark):
    # distinct pseudo-random vectors (no modular period): Knuth-hash mix
    def vec(i):
        return [float(((i * 2654435761 + d * 40503) % 997) - 498) / 100.0
                for d in range(64)]
    rows = [(i, vec(i), 0) for i in range(60)]
    rows.append((100, vec(0), 0))  # exact duplicate of vec 0
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    # query set = ids 0, 50 (QUERY_MOD spacing); vec 0 is a query
    got = {(r.query_id, r.rnk): r.match_id for r in rp_topk(emb).collect()}
    assert got[(0, 1)] == 100, got
