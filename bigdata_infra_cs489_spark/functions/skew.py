"""Skew-mitigation helpers for hot join keys at scale.

GroupBy skew is already absorbed by Tungsten partial aggregation plus AQE
coalescing/skew-split (session.py turns both on); the case those do NOT
cover is a shuffle JOIN whose key distribution has hot values when AQE's
skew-join split cannot kick in (e.g. the skewed side is the output of
another exchange-reusing stage, or the engine runs with AQE off). Salting
fixes it structurally: replicate the small side once per salt, scatter the
large side uniformly across salts, join on (key, salt) — each hot key now
spreads over ``n_salts`` tasks.

Cost model: the small side grows n_salts-fold (still broadcast-sized for
dimension tables), the large side gains one narrow int column; no extra
shuffle beyond the join's own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salt_column(keys: list[str], n_salts: int):
    """The deterministic per-row salt salted_join scatters the large side
    with (exposed so tests can assert the spread a hot key gets)."""
    return F.pmod(
        F.hash(F.monotonically_increasing_id(), *[F.col(k) for k in keys]),
        F.lit(n_salts),
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys in ``large``.

    The salt is derived from a deterministic per-row hash (not ``rand``,
    whose value can change under task retry and silently duplicate/drop
    rows mid-shuffle). Result equals ``large.join(small, on, how)`` for
    'inner'/'left' joins on unique-keyed ``small`` sides.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        # right/full joins would emit each unmatched small-side row once
        # per salt replica — silently wrong; refuse instead
        raise ValueError(
            f"salted_join supports inner/left/left_semi joins, got {how!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salted_large = large.withColumn("_salt", salt_column(keys, n_salts))
    replicated_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_large.join(replicated_small, keys + ["_salt"], how).drop("_salt")
