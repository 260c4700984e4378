"""Replicates the driver's correctness gate locally: every registered
query with an oracle must match DuckDB on row count, column names, and
order-insensitive values at sf0.01.

Comparison is strict: rows are sorted by all columns (by name) and values
compared exactly (floats must be bit-identical — the engine is designed
for exact decimal aggregation, see functions/money.py).
"""

from __future__ import annotations

import math

import pytest

from downscaledclimatedata_spark.plans import all_specs
from tests.conftest import SF_CORRECTNESS

SPECS = all_specs()


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _rows_to_sorted(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_normalize(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, duck):
    spec = SPECS[name]
    sdf = spec.spark(spark, SF_CORRECTNESS)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns
    if spec.oracle is None:
        assert len(spark_rows) >= 0  # rows-only smoke
        return
    res = duck.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}")
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}")
    s_sorted = _rows_to_sorted([tuple(r) for r in spark_rows], spark_cols)
    d_sorted = _rows_to_sorted(duck_rows, duck_cols)
    mismatches = [(i, a, b) for i, (a, b) in enumerate(zip(s_sorted, d_sorted)) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
