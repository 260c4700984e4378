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
