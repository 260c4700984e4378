"""Approximate-sketch accuracy gates: sketches are rows-only in the
oracle compare (engine-specific internals), so their VALUES are bounded
here against exact computation within published error envelopes."""

from __future__ import annotations

from pyspark.sql import functions as F

from downscaledclimatedata_spark.sources.tables import load_table
from tests.conftest import SF_CORRECTNESS


def test_hll_within_relative_error(spark):
    li = load_table(spark, SF_CORRECTNESS, "lineitem")
    for col, rsd in [("l_orderkey", 0.05), ("l_partkey", 0.05)]:
        row = li.agg(
            F.approx_count_distinct(col, rsd).alias("approx"),
            F.countDistinct(col).alias("exact")).collect()[0]
        rel = abs(row.approx - row.exact) / row.exact
        # rsd is a standard deviation; 4 sigma is a safe deterministic gate
        assert rel < 4 * rsd, f"{col}: approx={row.approx} exact={row.exact}"


def test_percentile_approx_brackets_exact(spark):
    ev = load_table(spark, SF_CORRECTNESS, "events")
    row = ev.agg(
        F.percentile_approx("value", 0.5, 10_000).alias("approx"),
        F.expr("percentile(value, 0.5)").alias("exact")).collect()[0]
    # with accuracy >> n the KLL-style sketch must land on a near-median
    # sample; bound by 1% of the exact median's magnitude
    assert abs(row.approx - row.exact) <= 0.01 * abs(row.exact) + 1e-9


def test_kmeans_refinement_reduces_distortion(spark):
    """Lloyd invariant: total within-cluster squared distance is
    non-increasing across iterations (each assign and each update step
    can only lower it)."""
    from pyspark.sql import functions as F
    from downscaledclimatedata_spark.operators.similarity import (
        kmeans_refine, quantize)
    from downscaledclimatedata_spark.sources.tables import load_table_parallel

    emb = load_table_parallel(spark, "/root/testdata/sf0.01", "embeddings",
                              key="vec_id")
    base = emb.select("vec_id", quantize(F.col("embedding")).alias("qv")) \
        .withColumn("dv", F.transform("qv", lambda x: x.cast("double")))

    def distortion(cents):
        c = cents.select("cid", F.col("centroid").alias("cv"))
        dist = F.aggregate(
            F.zip_with(F.col("dv"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda a, x: a + x)
        per_vec = (base.crossJoin(F.broadcast(c))
                   .select("vec_id", dist.alias("d"))
                   .groupBy("vec_id").agg(F.min("d").alias("dmin")))
        return per_vec.agg(F.sum("dmin")).collect()[0][0]

    d1 = distortion(kmeans_refine(emb, n_iter=1))
    d3 = distortion(kmeans_refine(emb, n_iter=3))
    assert d3 <= d1 + 1e-6, f"distortion increased: {d1} -> {d3}"


def test_duckdb_list_sum_is_left_fold():
    """Canary for the float-cosine oracle's pinned assumption: DuckDB's
    list_sum must be a strict sequential left fold, bit-identical to
    Spark's F.aggregate. The probe values are chosen so any reordering
    or compensated (Kahan-style) summation changes the double result:
    (1e16 + 1) + (-1e16) + 1 = 2 under left-fold rounding, but 1 when
    the small terms combine first and 2 when compensated differently.
    If this fails after a DuckDB upgrade, switch _SIM_FLOAT_SQL's
    compare to rank-order-only (see similarity.py)."""
    import duckdb
    probes = [
        ([1e16, 1.0, -1e16, 1.0], (((1e16 + 1.0) - 1e16) + 1.0)),
        ([0.1, 0.2, 0.3], ((0.1 + 0.2) + 0.3)),
        ([1e-16, 1.0, -1.0, 1e-16], (((1e-16 + 1.0) - 1.0) + 1e-16)),
    ]
    con = duckdb.connect()
    for values, expected in probes:
        lit = "[" + ", ".join(repr(v) for v in values) + "]"
        (got,) = con.execute(
            f"SELECT list_sum(list_transform({lit}, x -> CAST(x AS DOUBLE)))"
        ).fetchone()
        assert got == expected, (
            f"DuckDB list_sum is no longer a left fold: {values} -> {got}, "
            f"left-fold gives {expected}")


def test_refined_ivf_recall_gate(spark):
    """The refined-codebook IVF search must keep a usable fraction of
    the exact top-k (nprobe=1, 16 lists; observed 0.68-0.76 on the
    synthetic tables — the floor leaves margin for regeneration) and its
    inverted lists must partition the corpus exactly (every vector in
    exactly one list)."""
    from downscaledclimatedata_spark.operators.similarity import (
        cosine_topk_quantized, ivf_topk_refined)
    from downscaledclimatedata_spark.sources.tables import load_table_parallel

    emb = load_table_parallel(spark, SF_CORRECTNESS, "embeddings",
                              key="vec_id")
    truth = {(r.query_id, r.match_id)
             for r in cosine_topk_quantized(emb).collect()}
    approx = {(r.query_id, r.match_id)
              for r in ivf_topk_refined(emb).collect()}
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.5, f"refined-IVF recall@k collapsed: {recall:.3f}"


def test_refined_ivf_multiprobe_recall_monotone(spark):
    """Probing more refined lists can only grow each query's candidate
    set, so recall@k is monotone in nprobe — and strictly useful here:
    nprobe=2 must recover at least as much of the exact top-k."""
    from downscaledclimatedata_spark.operators.similarity import (
        cosine_topk_quantized, ivf_topk_refined)
    from downscaledclimatedata_spark.sources.tables import load_table_parallel

    emb = load_table_parallel(spark, SF_CORRECTNESS, "embeddings",
                              key="vec_id")
    truth = {(r.query_id, r.match_id)
             for r in cosine_topk_quantized(emb).collect()}
    r1 = {(r.query_id, r.match_id)
          for r in ivf_topk_refined(emb, nprobe=1).collect()}
    r2 = {(r.query_id, r.match_id)
          for r in ivf_topk_refined(emb, nprobe=2).collect()}
    rec1 = len(truth & r1) / len(truth)
    rec2 = len(truth & r2) / len(truth)
    assert rec2 >= rec1, f"recall regressed with nprobe=2: {rec1} -> {rec2}"


def test_refined_ivf_lists_partition_corpus(spark):
    """Assignment argmin (rn=1) must place every vector in exactly one
    refined inverted list — no drops, no duplicates."""
    from pyspark.sql import Window
    from downscaledclimatedata_spark.operators.similarity import (
        kmeans_refine, quantize)
    from downscaledclimatedata_spark.sources.tables import load_table_parallel

    emb = load_table_parallel(spark, SF_CORRECTNESS, "embeddings",
                              key="vec_id")
    cents = (kmeans_refine(emb, n_iter=2)
             .select("cid", F.col("centroid").alias("cv")))
    base = emb.select("vec_id", quantize(F.col("embedding")).alias("qv")) \
        .withColumn("dv", F.transform("qv", lambda x: x.cast("double")))
    dist = F.aggregate(
        F.zip_with(F.col("dv"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda a, x: a + x)
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    assigned = (base.crossJoin(F.broadcast(cents))
                .select("vec_id", "cid", dist.alias("dist"))
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1))
    n_vecs = emb.count()
    assert assigned.count() == n_vecs
    assert assigned.select("vec_id").distinct().count() == n_vecs


def test_cms_overestimates_only_and_finds_absent_term(spark):
    """CMS invariants: est >= exact for every term (overestimate-only
    by construction), and a vocabulary-absent term estimates near 0
    (bounded by collision mass, exactly reproducible)."""
    from downscaledclimatedata_spark.operators.textops import cms_estimate
    rows = [(i, "alpha beta beta gamma " * (1 + i % 3), "s", 0)
            for i in range(40)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long")
    out = {r["term"]: r for r in
           cms_estimate(df, "text", "doc_id",
                        terms=("beta", "alpha", "nosuchterm")).collect()}
    assert all(r["overestimate"] >= 0 for r in out.values())
    # exact counts: alpha appears once, beta twice per repetition
    reps = sum(1 + i % 3 for i in range(40))
    assert out["alpha"]["exact"] == reps
    assert out["beta"]["exact"] == 2 * reps
    assert out["beta"]["cms_est"] >= out["beta"]["exact"]
    assert out["nosuchterm"]["exact"] == 0
    # 3-term vocabulary in a 512-wide sketch: collisions are unlikely,
    # the absent term's min cell should be empty
    assert out["nosuchterm"]["cms_est"] == 0


def test_cms_exact_side_filters_before_aggregate(spark):
    """The exact-count branch aggregates only the probe terms: the
    `token IN (...)` filter must sit below the exact-side aggregate in
    the optimized plan, so its shuffle carries |terms| keys rather than
    the corpus vocabulary."""
    from downscaledclimatedata_spark.operators.textops import cms_estimate
    rows = [(i, "alpha beta gamma delta epsilon zeta", "s", 0)
            for i in range(10)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long")
    out = cms_estimate(df, "text", "doc_id", terms=("beta", "zeta"))
    import re

    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the probe-term restriction sits directly below the exact-side
    # token aggregate (keys bounded by the probe list, not vocabulary)
    assert re.search(
        r"Aggregate \[token#\d+\][^\n]*\n\s*\+- Filter token#\d+ "
        r"IN \(beta,zeta\)", plan), plan
    # and the results are unchanged by the pushdown
    got = {r["term"]: r["exact"] for r in out.collect()}
    assert got == {"beta": 10, "zeta": 10}


def test_cms_cells_merge_cellwise(spark):
    """Mergeability: the CMS of a union corpus equals the cell-wise sum
    of the parts' sketches — the property that lets per-shard sketches
    combine without re-reading data."""
    from downscaledclimatedata_spark.functions.hashing import md5_long
    from pyspark.sql import functions as F

    def cells(df):
        toks = df.select(F.explode(
            F.filter(F.split(F.lower("text"), r"[ \t\n\r\f\x0B]+"),
                     lambda x: x != "")).alias("token"))
        rows = [toks.select(F.lit(d).alias("d"),
                            (md5_long(F.col("token"), seed=f"cms{d}:") % 512)
                            .alias("cell")) for d in range(4)]
        u = rows[0]
        for r in rows[1:]:
            u = u.unionByName(r)
        return {(r["d"], r["cell"]): r["n"] for r in
                u.groupBy("d", "cell").agg(F.count("*").alias("n")).collect()}

    a = spark.createDataFrame([(1, "x y x")], "doc_id long, text string")
    b = spark.createDataFrame([(2, "y z")], "doc_id long, text string")
    both = a.unionByName(b)
    ca, cb, cu = cells(a), cells(b), cells(both)
    merged = dict(ca)
    for k, v in cb.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == cu


def test_bloom_no_false_negatives_and_absent_terms(spark):
    """One-sided error pinned: every truly-present probe is in_filter
    (a Bloom filter can NEVER false-negative); the planted absent terms
    are either clean misses or flagged false_positive — and with 7
    probe terms in an 8192-bit filter over a small vocabulary, the
    absent probes miss."""
    from downscaledclimatedata_spark.operators.textops import bloom_membership
    rows = [(i, "alpha beta gamma delta " * (1 + i % 2), "s", 0)
            for i in range(30)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long")
    out = {r["term"]: r for r in bloom_membership(
        df, probes=("alpha", "beta", "nosuchterm", "alsoabsent")).collect()}
    assert out["alpha"].truly_present and out["alpha"].in_filter
    assert out["beta"].truly_present and out["beta"].in_filter
    for t in ("nosuchterm", "alsoabsent"):
        assert not out[t].truly_present
        assert out[t].false_positive == out[t].in_filter
        # tiny vocabulary, 8192 bits: these specific probes miss
        assert not out[t].in_filter and out[t].n_bits_hit < 5


def test_bloom_bits_merge_by_union(spark):
    """Mergeability: the set-bit relation of a union corpus equals the
    UNION of the parts' set-bit relations — per-shard filters OR
    together without re-reading data."""
    from downscaledclimatedata_spark.functions.hashing import md5_long
    from pyspark.sql import functions as F

    def bits(df):
        toks = df.select(F.explode(
            F.filter(F.split(F.lower("text"), r"[ \t\n\r\f\x0B]+"),
                     lambda x: x != "")).alias("token"))
        es = [(md5_long(F.col("token"), seed=f"bloom{i}:") % 8192)
              for i in range(5)]
        return {r["bit"] for r in
                toks.select(F.explode(F.array(*es)).alias("bit"))
                .distinct().collect()}

    a = spark.createDataFrame([(1, "red green blue")], "doc_id long, text string")
    b = spark.createDataFrame([(2, "blue cyan magenta")], "doc_id long, text string")
    u = a.unionByName(b)
    assert bits(u) == bits(a) | bits(b)


def test_bloom_probe_join_realizes_broadcast(spark):
    """r8 advice fix: Spark ignores a broadcast hint on the STREAM side
    of a semi join, so the probe-bit membership join was silently a
    shuffle join. The rewrite joins FROM the set-bits relation with the
    tiny probe relation broadcast — the executed plan must contain a
    BroadcastHashJoin on the bit key, and the per-term hit counts are
    the bloom contract (all k bits hit for present terms)."""
    from downscaledclimatedata_spark.operators.textops import (
        BLOOM_K, bloom_membership)
    rows = [(i, "alpha beta gamma delta", "s", 0) for i in range(8)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long")
    out = bloom_membership(df, probes=("beta", "zzz_absent"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    got = {r["term"]: r for r in out.collect()}
    assert got["beta"]["n_bits_hit"] == BLOOM_K
    assert got["beta"]["in_filter"] and got["beta"]["truly_present"]
    assert not got["zzz_absent"]["truly_present"]


def test_nprobe_curve_monotone_and_saturating(spark):
    """Candidate sets grow monotonically with nprobe, so the recall
    curve must be non-decreasing; at nprobe >= n_centroids it probes
    every list, so recall reaches the searcher's ceiling."""
    from downscaledclimatedata_spark.operators.similarity import (
        similarity_nprobe_curve_query)
    from tests.conftest import SF_CORRECTNESS

    rows = {r.nprobe: r for r in
            similarity_nprobe_curve_query(spark, SF_CORRECTNESS)
            .collect()}
    assert sorted(rows) == [1, 2, 4, 8]
    recalls = [rows[n].recall for n in (1, 2, 4, 8)]
    assert all(b >= a for a, b in zip(recalls, recalls[1:])), recalls
    assert all(r.sum_hits <= r.sum_truth for r in rows.values())
    assert rows[8].recall > 0.5  # deep probing must actually help
