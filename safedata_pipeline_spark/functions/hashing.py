"""Shared md5-derived hash column functions.

Everything hash-based in this engine (MinHash, SimHash, fingerprints,
KMV, LSH hyperplane seeds) derives from md5 for ONE reason: any SQL
engine can recompute the identical value, which makes even the
approximate operators oracle-checkable. Never switch these to
xxhash64/murmur (Spark-only) without dropping that guarantee.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_SPACE_32 = float(1 << 32)


def md5_slot32(col: Column, slot: int) -> Column:
    """Slot-seeded 32-bit integer hash of a string column:
    int(hex8(md5(slot || ':' || s))). DuckDB equivalent:
    CAST(('0x' || substr(md5(slot || ':' || s), 1, 8)) AS UBIGINT)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{slot}:"), col).cast("binary")), 1, 8), 16, 10
    ).cast("bigint")


def md5_unit_interval(col: Column) -> Column:
    """md5-derived hash of any value normalized into (0, 1] — cast to
    string first so numeric formatting matches across engines."""
    h = F.conv(F.substring(F.md5(col.cast("string").cast("binary")), 1, 8), 16, 10)
    return (h.cast("double") + F.lit(1.0)) / F.lit(HASH_SPACE_32)
