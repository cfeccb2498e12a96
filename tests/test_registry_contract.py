"""Driver-contract invariants on the registry itself."""

from __future__ import annotations

from bigdata_infra_cs489_spark.plans import registry


def test_window_names_all_registered():
    """_window_order silently drops unknown names (deliberate, so new
    queries can be listed ahead of registration) — but once a round's
    window is final, every listed name must resolve or a backlog query
    silently takes the driver slot."""
    qs = registry.queries()
    missing = [n for n in registry._DRIVER_WINDOW_FIRST if n not in qs]
    assert missing == [], f"window names not registered: {missing}"
    assert len(registry._DRIVER_WINDOW_FIRST) == 50


def test_window_has_no_duplicates():
    w = registry._DRIVER_WINDOW_FIRST
    assert len(set(w)) == len(w)


def test_every_query_has_oracle():
    """The whole registry is value-oracled — any rows-only entry must be
    a deliberate, documented exception (there are currently none)."""
    qs, os_ = registry.queries(), registry.oracle_sql()
    assert set(qs) == set(os_)


def test_every_query_driver_checked_or_windowed():
    """Mechanized rotation contract (hand-maintained for three rounds):
    every registered query must either already have a driver hash row in
    some CORRECTNESS_r*.json, or sit inside the next window's first 50
    slots — otherwise a registration would silently wait unverified."""
    import json
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    seen: set[str] = set()
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        seen |= set(json.loads(p.read_text()))
    qs = registry.queries()
    windowed = set(registry._DRIVER_WINDOW_FIRST[:50])
    orphans = [n for n in qs if n not in seen and n not in windowed]
    assert orphans == [], (
        f"registered but never driver-checked and not in the next window: {orphans}"
    )


def test_stale_driver_rows_rotate_oldest_first():
    """No registered query's LATEST driver row may lag more than
    ceil(#registered / 50) rounds behind the newest CORRECTNESS file
    unless it holds a slot in the upcoming window — the
    staleness-hygiene rule from the round-5 verdict, mechanized.

    The bound derives from registry size because it is the tightest
    SATISFIABLE one: the driver refreshes exactly 50 queries per round,
    so a full rotation of N registered queries takes ceil(N/50) rounds —
    a fixed 3-round bound becomes mathematically impossible past 200
    queries no matter how the windows are chosen (floor 4 keeps the
    historical bound while N <= 200)."""
    import json
    import math
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    latest: dict[str, int] = {}
    newest = 0
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", p.name).group(1))
        newest = max(newest, rnd)
        for name in json.loads(p.read_text()):
            latest[name] = max(latest.get(name, 0), rnd)
    n_registered = len(registry.queries())
    lag_bound = max(4, math.ceil(n_registered / 50))
    windowed = set(registry._DRIVER_WINDOW_FIRST[:50])
    stale = [
        n
        for n, r in latest.items()
        if n in registry.queries()
        and r <= newest - lag_bound
        and n not in windowed
    ]
    assert stale == [], (
        f"driver rows older than {newest - lag_bound + 1} rounds"
        f" (bound {lag_bound} for {n_registered} queries): {stale}"
    )
