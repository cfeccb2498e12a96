"""The portable stable-hash primitive shared across operator families.

Dedup (MinHash base hash, SimHash bit source), text fingerprints, and
spam feature ids all need the SAME hash on both engines so the DuckDB
oracle reproduces values bit-for-bit. Single owner here: the Spark column
expression and its DuckDB SQL twin live side by side — widening the
digest or changing the radix updates every family at once instead of
silently desyncing one copy.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# DuckDB twin of h8(); catalog.py interpolates this into oracle SQL.
DUCK_H8 = "CAST(('0x' || substr(md5({x}), 1, 8)) AS BIGINT)"


def h8(col: Column) -> Column:
    """First 8 hex digits of md5 as a non-negative bigint (portable)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")
