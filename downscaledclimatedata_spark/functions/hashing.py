"""Portable deterministic hashing shared by Spark and the DuckDB oracle.

Spark's ``hash``/``xxhash64`` and DuckDB's ``hash`` are different
algorithms, so any operator whose *result* depends on hash values
(minhash, simhash, LSH bucketing, fingerprints) uses md5 — identical in
both engines — parsed into a 60-bit integer. 15 hex chars = 60 bits,
safely inside a signed 64-bit range in both engines.

These stay JVM-side in Spark (built-in ``md5``/``conv`` expressions, no
Python UDF), so whole-stage codegen covers them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column | str, seed: str = "") -> Column:
    """60-bit integer hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(F.concat(F.lit(seed), c)), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str, seed: str = "") -> str:
    """Same hash as :func:`md5_long`, as a DuckDB SQL fragment."""
    inner = f"'{seed}' || {expr}" if seed else expr
    return f"CAST(('0x' || substr(md5({inner}), 1, 15)) AS BIGINT)"
