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


def py_h60(s: str) -> int:
    """Python twin of :func:`h60` for Arrow/pandas kernels — same
    md5-prefix 60-bit BIGINT as the Spark and DuckDB forms, so
    hash-defined outputs computed in Python workers stay oracle-
    checkable."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
