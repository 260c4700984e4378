"""IVF at production-style list counts (n_centroids=256).

Earlier rounds only ever exercised the IVF family at 16 centroids, so
"the codebook size is parameterized" was an untested claim. This gate
builds a genuine 256-list refined codebook over the sf0.1 corpus
(centroid_mod=7 keeps the deterministic sample inside the 2000-vector id
range) and checks the two properties a 100 TB deployment needs: the
codebook build scales at-most-linearly in k, and search recall degrades
gracefully (not collapsing) as lists get small, recovering with nprobe.
"""

from __future__ import annotations

import time

from downscaledclimatedata_spark.operators.similarity import (
    cosine_topk_quantized, ivf_topk_refined, kmeans_refine)
from downscaledclimatedata_spark.sources.tables import load_table

SF_BENCH = "/root/testdata/sf0.1"
K256_MOD = 7  # 256 sampled ids (0, 7, ..., 1785) fit the 2000-vector corpus


def test_ivf_k256_build_and_recall(spark):
    emb = load_table(spark, SF_BENCH, "embeddings").cache()
    emb.count()
    kmeans_refine(emb, n_iter=1, n_centroids=16).collect()  # JVM warm-up

    t0 = time.time()
    c16 = kmeans_refine(emb, n_iter=1, centroid_mod=K256_MOD,
                        n_centroids=16).collect()
    t16 = time.time() - t0
    t0 = time.time()
    c256 = kmeans_refine(emb, n_iter=1, centroid_mod=K256_MOD,
                         n_centroids=256).collect()
    t256 = time.time() - t0
    assert len(c16) == 16 and len(c256) == 256, (len(c16), len(c256))
    # all corpus members assigned somewhere: cluster sizes sum to corpus
    assert sum(r.n_members for r in c256) == emb.count()
    # build cost is N x k with k constant-per-row work: at-most-linear in
    # k (measured ~3.7x for 16x the centroids — overheads dominate; a
    # super-linear implementation would blow well past 16x)
    assert t256 / t16 <= 16, f"k=256 build {t256:.1f}s vs k=16 {t16:.1f}s"

    exact = {(r.query_id, r.match_id)
             for r in cosine_topk_quantized(emb).collect()}
    recalls = {}
    for nprobe in (1, 4):
        approx = {(r.query_id, r.match_id) for r in
                  ivf_topk_refined(emb, centroid_mod=K256_MOD,
                                   n_centroids=256, n_iter=1,
                                   nprobe=nprobe).collect()}
        recalls[nprobe] = len(exact & approx) / len(exact)
    # 256 lists over 2000 vectors = ~8 candidates/list (0.4% of corpus
    # per probe): recall must degrade gracefully, not collapse, and the
    # nprobe knob must recover it (measured 0.34 -> 0.52)
    assert recalls[1] >= 0.2, recalls
    assert recalls[4] >= 0.4, recalls
    assert recalls[4] > recalls[1], recalls
