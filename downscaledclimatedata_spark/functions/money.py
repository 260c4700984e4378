"""Exact-arithmetic aggregation helpers.

Double-precision SUM is reduction-order dependent, so a distributed Spark
sum and a DuckDB sum over the same doubles can differ in the last ulps —
enough to break value-hash comparison. All money-like columns in the
synthetic tables are exact at 2 decimals, so we cast to DECIMAL before
aggregating (exact, order-independent) and cast the final aggregate back
to DOUBLE (the decimal->double conversion is the same round-to-nearest in
both engines). Catalyst still plans partial+final agg splits for decimal
sums, so this costs nothing at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PRECISION = 18


def dec(col: Column | str, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({PRECISION},{scale})")


def dec_sql(expr: str, scale: int = 2) -> str:
    return f"CAST({expr} AS DECIMAL({PRECISION},{scale}))"


def dsum(col: Column, alias: str) -> Column:
    """Exact decimal sum surfaced as DOUBLE."""
    return F.sum(col).cast("double").alias(alias)


def dsum_sql(expr: str, alias: str) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE) AS {alias}"
