"""Cross-engine deterministic hashing.

``portable_hash`` is the engine's content-hash primitive for dedup,
MinHash, SimHash, and fingerprinting:

    H(s) = int(md5(s)[:15 hex], 16) % 1_000_000_007

It is computable bit-identically in Spark (``conv(substring(md5(c),1,15),
16,10)``) and DuckDB (``'0x' || substr(md5(s),1,15)`` cast to BIGINT), so
every hash-derived result can be checked against the DuckDB oracle exactly
-- no approximate comparisons. 15 hex digits = 60 bits keeps the value
inside a signed 64-bit integer on both engines; the prime modulus keeps
products like ``a*h + b`` overflow-safe in downstream integer arithmetic.

Built-ins rejected: ``xxhash64``/``hash`` (Spark-private seeds, no DuckDB
twin), raw ``md5`` strings (would shuffle 32 bytes instead of 8).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PORTABLE_MOD = 1_000_000_007

#: DuckDB twin -- use as ``ORACLE_HASH.format(expr)``.
ORACLE_HASH = "(CAST(('0x' || substr(md5({0}), 1, 15)) AS BIGINT) % 1000000007)"


def portable_hash(c: Column) -> Column:
    """md5-derived 60-bit int mod 1e9+7; see module doc for the contract."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long") % PORTABLE_MOD
