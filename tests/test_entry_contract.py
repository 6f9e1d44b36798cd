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
#: (a) the WHOLE 47-query round-13-verified tail block (the r15
#: verdict's ask #3 — after r16 no registry entry's last green run is
#: older than r14); (b) the new round-16 query (perceptual-hash image
#: dedup). temperature_sample / rebalance_mix / cluster_balance /
#: domain_cap changed code paths in r16 but are value-bit-identical
#: (A/B-verified + oracle-green locally at both SFs); rebalance_mix
#: and domain_cap sit inside this window anyway.
ROUND16_WINDOW_MUST = {
    # (a) the whole r13-verified tail block (47)
    "ffill", "normalize_minmax", "min_step", "next_version",
    "chunk_index", "freq_fix", "split_at", "store_roundtrip",
    "store_set_many", "store_update_overlay", "store_delete_tombstone",
    "store_meta_aggregates", "store_max_horodate", "store_get_batch",
    "store_yield_many", "store_changefeed", "store_acid_ops",
    "store_txn", "kv_find_holes", "kv_clear", "kv_acid_ops",
    "sync_pull", "sync_tombstone", "sync_guards", "sync_paged",
    "admin_export", "dedup_index_forget", "ivfpq_persisted",
    "ivf_persisted", "dedup_index_replay", "similarity_ivf",
    "dedup_spans", "knn_graph", "domain_cap", "dsir_select",
    "stream_quota", "dedup_spans_incr", "rebalance_mix",
    "stream_sessions", "stream_dedup", "pricing_summary",
    "top_revenue", "regional_revenue", "dedup_exact", "dedup_jaccard",
    "dedup_simhash", "dedup_clusters",
    # (b) new in round 16
    "image_neardup", "image_dedup_incr",
}


def test_driver_window_contains_round16_rotation_set():
    # every query whose evidence is stale — oldest driver rows or new
    # queries — must sit inside the driver's checked first-50 window
    # (changed-path-but-bit-identical queries were re-verified locally
    # at both SFs and rotate behind it)
    window = set(list(entry_mod.queries())[:50])
    missing = ROUND16_WINDOW_MUST - window
    assert not missing, f"rotation queries outside driver window: {sorted(missing)}"
    unknown = ROUND16_WINDOW_MUST - set(entry_mod.queries())
    assert not unknown, f"rotation list names unknown queries: {sorted(unknown)}"


#: the EXACT round-15 driver window (CORRECTNESS_r15 keys) — frozen so
#: the rotation contract below is enforced against the real set
R15_WINDOW = {
    "embed_quantize", "lm_surprisal", "sliding_rollup",
    "temperature_sample", "stream_sliding", "collocations",
    "normalize_text", "corpus_prep", "rolling_stats",
    "forecast_revenue", "order_priority", "large_orders", "cusum_drift",
    "store_cdf", "stream_cdf", "overlay_merge", "completeness_holes",
    "merge_intervals", "interval_algebra", "constant_runs",
    "drop_bounds_na", "combined_delay", "stream_rollup",
    "similarity_filtered", "pq_filtered", "pq_topk", "stream_gaps",
    "multimodal_resize", "multimodal_frames", "stream_cusum",
    "bpe_merges", "seasonal_profile", "stream_join", "contamination",
    "tfidf_terms", "asof_join", "sessionize", "time_rollup",
    "range_join", "event_rollup", "store_restore", "store_optimize",
    "cluster_balance", "slice_with_delay", "bm25_recompute",
    "knn_graph_delta", "stream_pipeline", "multimodal_progressive",
    "multimodal_mjpeg", "gopher_quality",
}


def test_round16_window_mostly_differs_from_round15():
    # the rotation contract: the 50 checked queries must carry NEW
    # evidence vs the round-15 window (the r13-verified tail plus the
    # r16 debut are disjoint from it by construction)
    assert len(R15_WINDOW) == 50
    window = set(list(entry_mod.queries())[:50])
    overlap = window & R15_WINDOW
    assert len(overlap) <= 5, (
        f"window re-verifies too many r15 queries: {sorted(overlap)}"
    )
