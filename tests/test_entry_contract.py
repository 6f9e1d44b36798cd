"""Driver-contract consistency: every oracle has a query, and the set of
deliberately rows-only entries is explicit."""

from __future__ import annotations

import __spark_entry__ as entry_mod

#: entries intentionally without SQL oracles (non-SQL-expressible) —
#: empty since round 3: every declared query has a DuckDB oracle twin
ROWS_ONLY: set[str] = set()


def test_every_oracle_has_a_query():
    qs = set(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    assert oracles <= qs, f"orphan oracles: {oracles - qs}"


def test_rows_only_set_is_exactly_declared():
    qs = set(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    assert qs - oracles == ROWS_ONLY


def test_queries_are_callables():
    for name, fn in entry_mod.queries().items():
        assert callable(fn), name
