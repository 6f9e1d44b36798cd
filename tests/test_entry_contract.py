"""Driver-contract consistency: every oracle has a query, the set of
deliberately rows-only entries is explicit, and — the class of bug that
cost round 3 — the entry harness must load the REAL driver testdata in a
fresh session regardless of which dtype the installed PySpark build gives
``events.ts`` (bigint / timestamp_ntz / timestamp).
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod

#: entries intentionally without SQL oracles (non-SQL-expressible) —
#: empty since round 3: every declared query has a DuckDB oracle twin
ROWS_ONLY: set[str] = set()

SF_DIR = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


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


@needs_testdata
def test_t_loads_real_events_as_utc_timestamp(spark):
    """Round-3 regression: PySpark 4.1.2 accepts but ignores
    spark.sql.legacy.parquet.nanosAsLong, so events.ts reads as
    timestamp_ntz and the old guard applied `ts div 1000` to a timestamp.
    _t must end at dtype `timestamp` with microsecond precision intact,
    no matter which of the three dtypes the build hands back."""
    df = entry_mod._t(spark, SF_DIR, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    row = df.selectExpr(
        "count(*) AS n",
        # micros survive iff some fraction is non-zero across the table
        "max(unix_micros(ts) % 1000000) AS frac",
        "min(year(ts)) AS y0",
    ).first()
    assert row["n"] > 0
    assert row["frac"] > 0, "sub-second precision lost in ts conversion"
    assert row["y0"] >= 2000, "ts decoded to a nonsense epoch"


@needs_testdata
def test_every_table_loads(spark):
    for name in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings".split()
    ):
        df = entry_mod._t(spark, SF_DIR, name)
        assert len(df.columns) > 0, name


@needs_testdata
@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_builds_plan_on_real_testdata(spark, name):
    """Every declared query must at least ANALYZE against the real driver
    parquet (catches dtype drift before the driver does). Touching
    .schema forces full analysis without executing the job — except for
    store-backed queries whose body performs writes, which is fine: they
    run at sf0.001."""
    fn = entry_mod.queries()[name]
    df = fn(spark, SF_DIR)
    assert df.schema is not None
    assert len(df.columns) > 0


def test_registry_source_has_no_duplicate_keys():
    # a duplicate key in the queries() dict literal silently keeps the
    # FIRST position and drops the later one — which corrupts the
    # driver's 50-entry rotation accounting without any error
    import inspect
    import re

    src = inspect.getsource(entry_mod.queries)
    keys = re.findall(r'^\s+"(\w+)":', src, flags=re.M)
    dupes = {k for k in keys if keys.count(k) > 1}
    assert not dupes, f"duplicate registry keys: {sorted(dupes)}"
    assert len(keys) == len(entry_mod.queries())


#: queries that MUST be inside the driver's first-50 window this round.
#: Keep this list in sync with the rotation comment in queries():
#: (a) the 17 queries whose last driver verification was round 8 — the
#: oldest evidence left in the registry after the round-10 rotation
#: (the whole dedup family, corpus cleaning, the TPC-H trio, the
#: streaming dedup/session pair, token_pack, rebalance_mix,
#: lookup_filter, similarity_bruteforce);
#: (b) queries whose execution paths change in round 11: semantic_dedup
#: (mega-cluster exact-dup drop), attr_store_update (AttrStore.delete
#: key-tuple bound), rest_sync_pull (auth token hook), store_txn
#: (update/replace-mode idempotent txn), kv_store_overlay (driver-
#: rewrite row cap).
ROUND12_WINDOW_MUST = {
    # (a) last driver-verified r9 — the 23 queries the r11 verdict
    # demanded rotate in
    "embed_quantize", "lm_surprisal", "sliding_rollup", "stream_sliding",
    "temperature_sample", "collocations", "normalize_text", "corpus_prep",
    "rolling_stats", "forecast_revenue", "order_priority", "large_orders",
    "cusum_drift", "store_cdf", "stream_cdf", "overlay_merge",
    "completeness_holes", "merge_intervals", "interval_algebra",
    "constant_runs", "drop_bounds_na", "combined_delay", "stream_rollup",
    # (b) new or changed-path in round 12: filtered ANN, the
    # exactly-once dedup-index replay, the dedup_incremental
    # min/max-old refactor, and the ivf/pq entry points whose
    # signatures grew filters=
    "similarity_filtered", "pq_filtered", "dedup_index_replay",
    "dedup_incremental", "similarity_ivf", "pq_topk", "ivf_persisted",
}


def test_driver_window_contains_round12_rotation_set():
    # every query whose evidence is stale — oldest driver rows, or whose
    # execution path changed this round — must sit inside the driver's
    # checked first-50 window
    window = set(list(entry_mod.queries())[:50])
    missing = ROUND12_WINDOW_MUST - window
    assert not missing, f"rotation queries outside driver window: {sorted(missing)}"
    unknown = ROUND12_WINDOW_MUST - set(entry_mod.queries())
    assert not unknown, f"rotation list names unknown queries: {sorted(unknown)}"
