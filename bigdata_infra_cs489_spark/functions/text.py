"""Reusable column expressions shared across operator families.

All of these are built-in Catalyst expressions (no Python UDFs), so they stay
inside whole-stage codegen and cost the same at sf0.001 and at 100 TB.
"""

from __future__ import annotations

from datetime import date, timedelta

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference tokenizer semantics (util/Tokenizer.scala:8-12, twin at
# a0/WordCount.java:46-49): whitespace split -> lowercase -> strip
# leading/trailing non-[a-z] -> drop empties.
TOKEN_STRIP_RE = "(^[^a-z]+|[^a-z]+$)"
# Java's \s spelled out: [ \t\n\x0B\f\r]. Kept explicit because the DuckDB
# oracle twin runs on RE2, whose \s omits \x0B — with bare \s+ the two
# engines tokenize 'a\x0Bb' differently and every tokenizer-based oracle
# silently compares different token sets.
TOKEN_SPLIT_RE = "[ \\t\\n\\x0B\\f\\r]+"


def tokenize(col: Column | str) -> Column:
    """text -> array<string> of cleaned tokens (reference tokenizer F1)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(c), TOKEN_SPLIT_RE)
    cleaned = F.transform(toks, lambda t: F.regexp_replace(t, TOKEN_STRIP_RE, ""))
    return F.filter(cleaned, lambda t: F.length(t) > 0)


def exploded_tokens(df, text_col: str = "text", keep: tuple[str, ...] = ()):
    """df -> df of one ``word`` row per token (plus the ``keep`` columns),
    same token multiset per row as ``explode(tokenize(text))``.

    For operators that immediately explode (word/prefix counts, postings),
    the per-token strip runs here as a flat codegen'd column op AFTER the
    explode; inside tokenize() the same strip is an interpreted array
    lambda (higher-order functions are CodegenFallback), which costs ~2x
    on a token-heavy scan. Token ORDER is lost relative to the array form
    — only multiset consumers may use this."""
    raw = df.select(
        *keep,
        F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)).alias("w"),
    )
    return raw.select(
        *keep, F.regexp_replace("w", TOKEN_STRIP_RE, "").alias("word")
    ).where(F.length("word") > 0)


def _prefix_to_range(dt: str) -> tuple[str, str]:
    """ISO date prefix -> [lo, hi) timestamp bounds with identical semantics.

    '1998-06-15' -> [1998-06-15, 1998-06-16); '1998-06' -> the month;
    '1998' -> the year.
    """
    parts = [int(p) for p in dt.split("-")]
    if len(parts) == 3:
        y, m, d = parts
        lo = date(y, m, d)
        hi = lo + timedelta(days=1)
    elif len(parts) == 2:
        y, m = parts
        lo = date(y, m, 1)
        hi = date(y + (m == 12), m % 12 + 1, 1)
    else:
        (y,) = parts
        lo, hi = date(y, 1, 1), date(y + 1, 1, 1)
    return lo.isoformat(), hi.isoformat()


def shipdate_matches(col: Column | str, dt: str) -> Column:
    """Reference date predicate ``l_shipdate.contains(dt)`` (Q1.scala:32).

    The reference compares ISO ``YYYY-MM-DD`` strings with ``contains``; for
    the arguments the queries take (full date, ``YYYY-MM`` month, ``YYYY``
    year) that is a prefix match. We compile the prefix to a half-open
    timestamp range so the predicate pushes down into the parquet scan as
    min/max row-group pruning (``date_format(...).startswith`` stays a
    post-scan filter — measured: PushedFilters=[IsNotNull] only — which at
    100 TB means decoding every row group for nothing).
    """
    c = F.col(col) if isinstance(col, str) else col
    lo, hi = _prefix_to_range(dt)
    return (c >= F.lit(lo).cast("timestamp")) & (c < F.lit(hi).cast("timestamp"))


def date_str(col: Column | str) -> Column:
    """timestamp -> 'yyyy-MM-dd' string (stable cross-engine output form)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd")


def month_str(col: Column | str) -> Column:
    """timestamp -> 'yyyy-MM' month bucket (reference F4, Q5.scala:51-52)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM")
