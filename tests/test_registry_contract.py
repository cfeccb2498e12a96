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
