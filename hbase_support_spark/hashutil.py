"""Engine-portable hashing for oracle-checkable hash semantics.

Spark's native hash kernels (xxhash64 / murmur3 / crc32) have no
DuckDB twin, so any operator whose OUTPUT depends on them can only get
a weaker oracle. Both engines, however, produce identical md5 hex and
can parse a 15-hex-digit prefix into the same non-negative 60-bit
BIGINT. Operators that need gradable hash-defined semantics (SimHash
signatures, Count-Min slots, sync-table digests) build on this pair;
hot paths that only need speed (MinHash signature permutations) keep
xxhash64 and are verified by exact re-computation instead.
"""

from __future__ import annotations


def h60(expr: str) -> str:
    """Spark SQL: portable 60-bit hash of a string expression."""
    return f"cast(conv(substring(md5({expr}), 1, 15), 16, 10) AS bigint)"


def d_h60(expr: str) -> str:
    """DuckDB twin of :func:`h60` — bit-identical output."""
    return f"CAST('0x' || substring(md5({expr}), 1, 15) AS BIGINT)"
