"""Engine-portable hashing — ONE definition for every consumer.

The 60-bit hash (low 15 hex chars of md5 as a BIGINT) exists because
DuckDB computes the identical value, which makes operators built on it
exactly oracle-checkable (xxhash64 has no DuckDB equivalent). Used by
winnowing fingerprints, the portable MinHash family, and deterministic
split assignment — via THIS module only, so the offsets/width can never
drift between the Spark plans and the generated SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash60(col: Column | str) -> Column:
    """Low 60 bits of md5 as a non-negative BIGINT (JVM side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 18, 15), 16, 10).cast("long")


# DuckDB expression computing the identical value; .format(x=<sql expr>)
PORTABLE_HASH60_SQL = "CAST(('0x' || substr(md5({x}), 18, 15)) AS BIGINT)"
