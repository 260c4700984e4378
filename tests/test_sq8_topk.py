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


def test_cell_purity_hand_cells_and_tie_break(spark):
    """Two centroids (ids 0 and 2) on orthogonal axes; members cluster
    around each. Cell 0's labels are [7,7,3] -> majority 7, purity 2/3;
    cell 2 ties [1,2] -> majority is the SMALLER label, purity 0.5."""
    from downscaledclimatedata_spark.operators.similarity import (
        ivf_cell_purity)
    e1 = [1.0, 0.0, 0.0, 0.0]
    e2 = [0.0, 1.0, 0.0, 0.0]

    def near(v, eps):
        return [x + eps if x == 0 else x for x in v]

    rows = [
        (0, e1, 7), (4, near(e1, 0.01), 7), (6, near(e1, 0.02), 3),
        (2, e2, 1), (8, near(e2, 0.01), 2),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    got = {r.cid: r for r in
           ivf_cell_purity(emb, centroid_mod=2, n_centroids=2).collect()}
    assert set(got) == {0, 2}
    c0 = got[0]
    assert (c0.n_members, c0.n_labels, c0.majority_label) == (3, 2, 7)
    assert c0.purity == 2 / 3
    c2 = got[2]
    assert (c2.n_members, c2.n_labels) == (2, 2)
    assert c2.majority_label == 1 and c2.purity == 0.5


def test_cell_purity_empty_cell_surfaces(spark):
    """A centroid that attracts no other member still reports itself
    (the centroid IS a member of its own cell); a truly empty cell can
    only come from a zero-norm centroid — plant one and check the NULL
    majority path via the left join."""
    from downscaledclimatedata_spark.operators.similarity import (
        ivf_cell_purity)
    rows = [(0, [1.0, 0.0], 5), (2, [0.0, 1.0], 6), (3, [1.0, 0.1], 5)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    got = {r.cid: r for r in
           ivf_cell_purity(emb, centroid_mod=2, n_centroids=2).collect()}
    assert got[0].n_members == 2 and got[0].majority_label == 5
    assert got[2].n_members == 1 and got[2].purity == 1.0


def test_label_margin_separated_and_lonely_class(spark):
    """Query 0 (label 1) has a near-duplicate same-label neighbour and
    an orthogonal different-label vector: margin ~ 1, separated. A
    query whose class has no other member gets NULL best_same/margin."""
    from downscaledclimatedata_spark.operators.similarity import (
        label_margin_eval)
    rows = [
        (0, [1.0, 0.0, 0.0], 1),
        (2, [0.99, 0.01, 0.0], 1),     # same label, cosine ~ 1
        (3, [0.0, 1.0, 0.0], 2),       # diff label, cosine 0
        (1, [0.0, 0.0, 1.0], 9),       # query with a lonely class
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    got = {r.query_id: r for r in
           label_margin_eval(emb, query_mod=1, n_queries=4).collect()}
    r0 = got[0]
    assert r0.best_same > 0.99 and r0.best_diff == 0.0
    assert r0.separated and abs(r0.margin - r0.best_same) < 1e-12
    r1 = got[1]
    assert r1.best_same is None and r1.margin is None
    assert r1.separated is None
    # zero-norm vectors are excluded from both sides
    emb2 = spark.createDataFrame(
        rows + [(4, [0.0, 0.0, 0.0], 1)],
        "vec_id long, embedding array<float>, label int")
    got2 = {r.query_id for r in
            label_margin_eval(emb2, query_mod=1, n_queries=5).collect()}
    assert 4 not in got2


def test_ood_vectors_flags_planted_outlier(spark):
    """A clean corpus yields an EMPTY report (the correct answer, not a
    vacuous one); planting one huge-magnitude vector flags exactly it
    with mean_ratio > factor."""
    from downscaledclimatedata_spark.operators.similarity import (
        OOD_FACTOR, ood_vectors)

    def vec(seed, mag=1.0):
        return [mag * ((seed * 31 + i * 7) % 13 - 6) / 6.0
                for i in range(8)]

    clean = [(i, vec(i)) for i in range(12)]
    emb = spark.createDataFrame(
        clean, "vec_id long, embedding array<float>")
    assert ood_vectors(emb, centroid_mod=3, n_centroids=3).count() == 0

    planted = clean + [(99, [2000.0] * 8)]
    emb2 = spark.createDataFrame(
        planted, "vec_id long, embedding array<float>")
    rows = ood_vectors(emb2, centroid_mod=3, n_centroids=3).collect()
    assert [r.vec_id for r in rows] == [99]
    assert rows[0].mean_ratio > OOD_FACTOR


def test_prefix_recall_monotone_and_full_width_perfect(spark):
    """Recall must be perfect when the 'prefix' is the full width, and
    the mean recall curve must be non-decreasing in prefix_dim on the
    real corpus (more dims can only add ranking information on
    average)."""
    from downscaledclimatedata_spark.operators.similarity import (
        DIM, prefix_dim_recall)
    from downscaledclimatedata_spark.sources.tables import load_table
    from tests.conftest import SF_CORRECTNESS

    emb = load_table(spark, SF_CORRECTNESS, "embeddings").cache()
    rows = prefix_dim_recall(emb, prefixes=(8, 32, DIM)).collect()
    by_p: dict = {}
    for r in rows:
        by_p.setdefault(r.prefix_dim, []).append(r.recall)
    mean = {p: sum(v) / len(v) for p, v in by_p.items()}
    assert mean[DIM] == 1.0            # full width == exact truth
    assert mean[8] <= mean[32] + 1e-9 <= mean[DIM] + 1e-9
    assert all(r.n_truth >= r.n_hit for r in rows)


def test_hubness_mass_conservation_and_zero_row(spark):
    """Σ n_vectors over the distribution equals the eligible population
    (zero-norm excluded), Σ (c * n_vectors) equals the graph's edge
    count, and the c=0 anti-hub row is present on the real corpus."""
    from downscaledclimatedata_spark.operators.similarity import (
        knn_graph, knn_hubness)
    from downscaledclimatedata_spark.sources.tables import load_table
    from tests.conftest import SF_CORRECTNESS

    emb = load_table(spark, SF_CORRECTNESS, "embeddings").cache()
    rows = knn_hubness(emb).collect()
    n_edges = knn_graph(emb).count()
    assert sum(r.n_vectors for r in rows) == emb.count()  # no zero-norm in corpus
    assert sum(r.k_occurrence * r.n_vectors for r in rows) == n_edges
    assert rows[0].k_occurrence == 0 and rows[0].n_vectors > 0
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
