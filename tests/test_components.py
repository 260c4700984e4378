"""Connected components: crafted graphs with known component structure."""

from __future__ import annotations

from downscaledclimatedata_spark.operators.dedup import connected_components


def test_chain_and_separate_pair(spark):
    # chain 1-2-3 (diameter 2) + disjoint pair 10-11
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a bigint, id_b bigint")
    comps = {r.id: r.comp for r in connected_components(pairs).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    # 0-1-2-...-9: worst case for label propagation (diameter 9)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a bigint, id_b bigint")
    comps = {r.id: r.comp for r in connected_components(pairs).collect()}
    assert comps == {i: 0 for i in range(10)}


def test_triangle_with_extra_edge(spark):
    # redundant edges must not duplicate rows
    pairs = spark.createDataFrame(
        [(5, 6), (6, 7), (5, 7)], "id_a bigint, id_b bigint")
    rows = connected_components(pairs).collect()
    assert len(rows) == 3
    assert {r.comp for r in rows} == {5}


def test_random_graphs_match_union_find(spark):
    """Property: label propagation equals a reference union-find on
    deterministic pseudo-random graphs of varying shape."""
    import random

    def union_find_components(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # resolve to component minimum
        return {n: find(n) for n in parent}

    rng = random.Random(7)
    for trial in range(3):
        n_nodes = 30 + trial * 20
        edges = sorted({tuple(sorted((rng.randrange(n_nodes),
                                      rng.randrange(n_nodes))))
                        for _ in range(n_nodes)})
        edges = [(a, b) for a, b in edges if a != b]
        want = union_find_components(edges)
        df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
        got = {r.id: r.comp for r in connected_components(df).collect()}
        assert got == want, f"trial {trial}: {got} != {want}"


def test_star_algorithm_matches_label_propagation(spark):
    """large-star/small-star equals min-label propagation on chains,
    cliques, and pseudo-random graphs."""
    import random
    from downscaledclimatedata_spark.operators.dedup import (
        connected_components_star)

    cases = [
        [(i, i + 1) for i in range(12)],             # long chain
        [(1, 2), (2, 3), (10, 11)],                  # chain + pair
        [(5, 6), (6, 7), (5, 7)],                    # triangle
    ]
    rng = random.Random(13)
    for trial in range(2):
        n_nodes = 25 + 15 * trial
        cases.append(sorted({tuple(sorted((rng.randrange(n_nodes),
                                           rng.randrange(n_nodes))))
                             for _ in range(n_nodes)}))
    for edges in cases:
        edges = [e for e in edges if e[0] != e[1]]
        if not edges:
            continue
        pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
        a = {r.id: r.comp for r in connected_components(pairs).collect()}
        b = {r.id: r.comp for r in connected_components_star(pairs).collect()}
        assert a == b, f"mismatch on {edges[:5]}..."


def test_pair_graph_stats_on_known_graph(spark):
    """Hand-checkable: a triangle plus a pendant edge -> 1 triangle,
    4 nodes, 4 edges, 5 open triads (degrees 2,2,3,1 give C(2,2) +
    C(2,2) + C(3,2) + C(1,2) = 1+1+3+0 = 5), coefficient 3/5."""
    from downscaledclimatedata_spark.operators.dedup import pair_graph_stats

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "id_a long, id_b long")
    (r,) = pair_graph_stats(pairs).collect()
    assert (r.n_nodes, r.n_edges, r.n_triangles, r.n_triads) == (4, 4, 1, 5)
    assert abs(r.clustering_coefficient - 0.6) < 1e-12
    # duplicate and reversed edges collapse
    noisy = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (1, 3), (3, 4), (4, 3)],
        "id_a long, id_b long")
    (r2,) = pair_graph_stats(noisy).collect()
    assert (r2.n_edges, r2.n_triangles) == (4, 1)
    # empty graph
    empty = spark.createDataFrame([], "id_a long, id_b long")
    (r3,) = pair_graph_stats(empty).collect()
    assert (r3.n_nodes, r3.n_triangles) == (0, 0)
    assert r3.clustering_coefficient == 0.0


def test_star_tiers_identical(spark):
    """The r13 driver union-find tier and the distributed star
    iteration produce identical labels — force each path by flipping
    CC_DRIVER_MAX_EDGES across deterministic random graphs (chains,
    cliques, isolated pairs), and pin that an empty pair relation
    yields an empty label relation on both."""
    import random

    from downscaledclimatedata_spark.operators import dedup as D

    rng = random.Random(23)
    orig = D.CC_DRIVER_MAX_EDGES
    try:
        for trial in range(4):
            n = rng.randint(2, 40)
            edges = [(rng.randint(0, n), rng.randint(0, n))
                     for _ in range(rng.randint(1, 60))]
            edges += [(100 + i, 101 + i) for i in range(0, 10, 2)]
            pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
            D.CC_DRIVER_MAX_EDGES = 10**9
            drv = {(r.id, r.comp)
                   for r in D.connected_components_star(pairs).collect()}
            D.CC_DRIVER_MAX_EDGES = -1
            dist = {(r.id, r.comp)
                    for r in D.connected_components_star(pairs).collect()}
            assert drv == dist, f"trial {trial}: {sorted(drv ^ dist)[:6]}"
        empty = spark.createDataFrame([], "id_a bigint, id_b bigint")
        for tier in (10**9, -1):
            D.CC_DRIVER_MAX_EDGES = tier
            assert D.connected_components_star(empty).count() == 0
    finally:
        D.CC_DRIVER_MAX_EDGES = orig


def test_prune_tiers_identical(spark):
    """r14: prune_corpus / prune_corpus_quality gained a driver-tier
    fast path (inlined IN-predicate / literal VALUES election) — force
    every tier combination over deterministic random corpora+graphs and
    require identical survivor sets. Covers: the isin path, the
    below-tier relation fallback (PRUNE_ISIN_MAX_IDS = -1), and the
    distributed star path (CC_DRIVER_MAX_EDGES = -1)."""
    import random

    from downscaledclimatedata_spark.operators import dedup as D

    rng = random.Random(41)
    words = ["alpha", "beta", "the", "and", "is", "gamma", "zz1", "qq"]
    orig_cc, orig_in = D.CC_DRIVER_MAX_EDGES, D.PRUNE_ISIN_MAX_IDS
    try:
        for trial in range(3):
            n = rng.randint(8, 25)
            docs = spark.createDataFrame(
                [(i, " ".join(rng.choices(words, k=rng.randint(3, 30))))
                 for i in range(n)] + [(n, None)],
                "doc_id bigint, text string")
            edges = [(rng.randint(0, n - 1), rng.randint(0, n - 1))
                     for _ in range(rng.randint(2, 12))]
            pairs = spark.createDataFrame(
                [e for e in edges if e[0] != e[1]] or [(0, 1)],
                "id_a bigint, id_b bigint")
            for fn in (D.prune_corpus, D.prune_corpus_quality):
                outs = []
                for cc_cap, in_cap in ((10**9, 10**9), (10**9, -1),
                                       (-1, orig_in)):
                    D.CC_DRIVER_MAX_EDGES = cc_cap
                    D.PRUNE_ISIN_MAX_IDS = in_cap
                    outs.append({r.doc_id
                                 for r in fn(docs, pairs).collect()})
                assert outs[0] == outs[1] == outs[2], \
                    f"{fn.__name__} trial {trial}: {outs}"
        # no-pair graph: every doc survives on every tier
        docs1 = spark.createDataFrame([(1, "a b c")],
                                      "doc_id bigint, text string")
        nopairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
        for cc_cap in (10**9, -1):
            D.CC_DRIVER_MAX_EDGES = cc_cap
            assert D.prune_corpus(docs1, nopairs).count() == 1
            assert D.prune_corpus_quality(docs1, nopairs).count() == 1
    finally:
        D.CC_DRIVER_MAX_EDGES = orig_cc
        D.PRUNE_ISIN_MAX_IDS = orig_in
