"""Driver contract assembly: queries() and oracle_sql().

Every operator family module contributes (name -> callable) and
(name -> DuckDB oracle SQL). A missing oracle entry means the op is not
SQL-expressible (iterative PPR, sequential SGD, streaming) and the driver
records a weaker rows-only check — keep that set minimal.

Conventions that keep the cross-engine value hash stable:
- identical output column names on both sides (driver sorts columns by name);
- doubles rounded (money 2dp, ratios 4dp) on both sides;
- timestamps rendered as 'yyyy-MM-dd' / 'yyyy-MM' strings on both sides;
- top-k queries carry deterministic tie-break orderings on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    if name in _QUERIES:
        raise ValueError(f"duplicate query name {name!r}")
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every operator module for its registration side effects."""
    global _LOADED
    if _LOADED:
        return
    from . import catalog  # noqa: F401

    _LOADED = True
