"""Adversarial-embeddings oracle parity: every embeddings-consuming spec
runs on a crafted table containing zero vectors, exact duplicates,
constant vectors, and extreme values — and must still match its DuckDB
oracle exactly. (A zero vector makes every cosine denominator 0; the
double division yields NaN/Inf identically in both engines, but any
ranking over it must stay deterministic.)
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from downscaledclimatedata_spark.plans import all_specs
from tests.conftest import SF_SMOKE
from tests.test_oracle_parity import _rows_to_sorted

SPECS = all_specs()

DIM = 64


def _vec(kind: str, i: int) -> list[float]:
    if kind == "zero":
        return [0.0] * DIM
    if kind == "ones":
        return [1.0] * DIM
    if kind == "big":
        return [1000.0 if d % 2 == 0 else -1000.0 for d in range(DIM)]
    if kind == "tiny":
        return [1e-4] * DIM
    # pseudo-random but deterministic
    return [((i * 31 + d * 17) % 41 - 20) / 10.0 for d in range(DIM)]


# ids 0..499 so the fixed-size query/centroid predicates (vec_id % 50 == 0
# < 500, % 25 == 0 < 400) select a full set including the zero vector at 0
EDGE_VECS = []
for i in range(500):
    kind = {0: "zero", 25: "ones", 50: "ones", 75: "big",
            100: "tiny", 125: "zero"}.get(i, "mix")
    EDGE_VECS.append((i, _vec(kind, i), i % 7))

_EMB_SPECS = sorted(
    n for n, s in SPECS.items()
    if s.oracle is not None and "embeddings" in s.oracle
)


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("edge_emb"))
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents"):
        shutil.copy(os.path.join(SF_SMOKE, f"{name}.parquet"),
                    os.path.join(d, f"{name}.parquet"))
    emb = spark.createDataFrame(
        EDGE_VECS, "vec_id long, embedding array<float>, label int")
    emb.toPandas().to_parquet(os.path.join(d, "embeddings.parquet"), index=False)
    return d


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duckdb.connect()
    for name in ("region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{edge_dir}/{name}.parquet')")
    yield con


@pytest.mark.parametrize("name", _EMB_SPECS)
def test_embedding_spec_survives_edge_vectors(name, spark, edge_dir, edge_duck):
    spec = SPECS[name]
    sdf = spec.spark(spark, edge_dir)
    spark_rows = sdf.collect()
    res = edge_duck.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(sdf.columns) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rows spark={len(spark_rows)} duck={len(duck_rows)}")
    s_sorted = _rows_to_sorted([tuple(r) for r in spark_rows], sdf.columns)
    d_sorted = _rows_to_sorted(duck_rows, duck_cols)
    mismatches = [(i, a, b) for i, (a, b) in enumerate(zip(s_sorted, d_sorted))
                  if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
