"""Portable deterministic 60-bit hash, identical in Spark and DuckDB.

The reference keys its media ids on Java ``String.hashCode``
(``ArticleExtractionBolt.java:448``: ``id = "Web#" + (url.hashCode() &
0x7FFFFFFF)``) and its seen-set on raw URL strings in Redis
(``StatusCheckBolt.java:59-68``). We key on a content hash instead; for
the DuckDB-oracle harness we need the *same* value computable in both
engines, so the portable hash is the first 15 hex chars of md5 (60 bits,
always non-negative in int64). Spark's ``xxhash64`` is used where
cross-engine parity is not required (hot paths: Bloom keys, salting).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# DuckDB-side expression template: format with the input SQL expression.
HASH64_SQL = "CAST(('0x' || substr(md5({expr}), 1, 15)) AS UBIGINT)::BIGINT"


def hash64(col: Column | str) -> Column:
    """Spark side of the portable 60-bit hash (matches HASH64_SQL)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str) -> str:
    """DuckDB side of the portable 60-bit hash."""
    return HASH64_SQL.format(expr=expr)
