"""Query registry — the contract surface graded by the driver.

Each operator module registers ``(name, spark_fn, oracle_sql)``.
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
these dicts. A ``None`` oracle means the op is not SQL-expressible
(seed-dependent hashing, approx sketches) and gets the driver's
weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

QUERIES: dict[str, Callable] = {}
ORACLES: dict[str, str] = {}

_LOADED = False


def register(name: str, oracle: str | None = None):
    def deco(fn):
        assert name not in QUERIES, f"duplicate query name: {name}"
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        fn.__query_name__ = name
        return fn

    return deco


def load_all() -> None:
    """Import all operator modules (side effect: registration)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        scans,
        filters,
        cells,
        joins,
        aggregates,
        windows,
        setops,
        llm,
        streaming_batch,
        udfs,
    )
    from .functions import scalar  # noqa: F401

    _LOADED = True
