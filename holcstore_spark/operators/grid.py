"""Dense-grid generation, reindexing and completeness (hole detection).

The reference reindexes every stored series onto a regular grid at
STORE_FREQ spanning whole calendar chunks (chunk_timeserie_store.py:731-742)
and detects holes by scanning null runs on that grid
(``check_ts_completeness``, hostore/utils/timeseries.py:11-65, driven by
``Store.find_holes`` hostore.py:162-216).

Spark realization: the grid is ``sequence(start, end, interval)`` +
``explode`` — generated *per key from that key's own bounds*, so grid size is
O(span/freq) per key and never materialized globally; values land on it via
a single left join shuffled on ``(keys…, ts)``. Holes are then null runs
(islands idiom). No driver loops — scales to millions of keys.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from holcstore_spark.operators.islands import null_runs


def _interval(seconds: int) -> str:
    return f"INTERVAL {int(seconds)} SECOND"


def time_grid(
    bounds: DataFrame,
    freq_seconds: int,
    start: str = "grid_start",
    end: str = "grid_end",
    ts: str = "ts",
) -> DataFrame:
    """Explode one row per grid point between per-row bounds (inclusive).

    ``bounds`` carries key columns plus ``grid_start``/``grid_end``.
    """
    seq = F.sequence(F.col(start), F.col(end), F.expr(_interval(freq_seconds)))
    return bounds.withColumn(ts, F.explode(seq)).drop(start, end)


def reindex_to_grid(
    df: DataFrame,
    keys: tuple[str, ...],
    freq_seconds: int,
    start=None,
    end=None,
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Left-join values onto each key's dense grid.

    Bounds default to each key's own [min(ts), max(ts)]; explicit ``start`` /
    ``end`` (UTC instants) override per-key bounds for all keys — the
    requested-range form of ``check_ts_completeness``.
    Off-grid input timestamps simply don't align (the reference never
    resamples either, README.md:196).
    """
    agg_start = F.lit(start).cast("timestamp") if start is not None else F.min(ts)
    agg_end = F.lit(end).cast("timestamp") if end is not None else F.max(ts)
    bounds = df.groupBy(*keys).agg(
        agg_start.alias("grid_start"), agg_end.alias("grid_end")
    )
    grid = time_grid(bounds, freq_seconds, ts=ts)
    # merge hint: Catalyst's size estimate of the exploded grid is the tiny
    # pre-explode bounds frame, so it would happily "broadcast" a grid of
    # billions of rows; sort-merge on (keys, ts) is the plan that scales
    return grid.hint("merge").join(
        df.select(*keys, ts, value), on=[*keys, ts], how="left"
    )


def completeness_holes(
    df: DataFrame,
    keys: tuple[str, ...],
    freq_seconds: int,
    start,
    end,
    margin_seconds: int = 0,
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Missing ranges of each key vs the requested [start, end] grid.

    Output: keys…, hole_start, hole_end (inclusive grid-point bounds, each
    widened by ``margin_seconds`` — reference ``freq_margin``,
    hostore/utils/timeseries.py:42-64). A key entirely absent from the input
    yields one hole spanning the whole range only if its rows exist with all
    null values; fully-absent keys are handled by the store wrapper
    (left-anti join against the requested key list, hostore.py:120-124).
    """
    on_grid = reindex_to_grid(df, keys, freq_seconds, start=start, end=end,
                              ts=ts, value=value)
    holes = null_runs(on_grid, keys, order=(ts,), value=value)
    m = _interval(margin_seconds)
    return holes.select(
        *keys,
        (F.col("run_start") - F.expr(m)).alias("hole_start"),
        (F.col("run_end") + F.expr(m)).alias("hole_end"),
    )


def chunk_aligned_bounds(
    df: DataFrame,
    keys: tuple[str, ...],
    chunk_axis: tuple[str, ...],
    tz: str,
    freq_seconds: int,
    ts: str = "ts",
) -> DataFrame:
    """Per-key grid bounds snapped to whole calendar chunks in store-local
    time (reference: chunk_timeserie_store.py:731-742 — year chunks snap to
    Jan-1 → Dec-31, month chunks to month boundaries), returned as UTC
    instants: [chunk_start(min ts), next_chunk_start(max ts) - freq]."""
    unit = "year" if chunk_axis == ("year",) else "month"
    lmin = F.from_utc_timestamp(F.min(ts), tz)
    lmax = F.from_utc_timestamp(F.max(ts), tz)
    lo = F.to_utc_timestamp(F.date_trunc(unit, lmin), tz)
    nxt = F.date_trunc(unit, F.add_months(lmax, 12 if unit == "year" else 1))
    hi = F.to_utc_timestamp(nxt, tz) - F.expr(_interval(freq_seconds))
    return df.groupBy(*keys).agg(lo.alias("grid_start"), hi.alias("grid_end"))


def reindex_to_chunk_grid(
    df: DataFrame,
    keys: tuple[str, ...],
    chunk_axis: tuple[str, ...],
    tz: str,
    freq_seconds: int,
    ts: str = "ts",
    value: str = "value",
    bounds: DataFrame | None = None,
) -> DataFrame:
    """Distributed form of the reference's write-path normalization: dense
    chunk-aligned grid per key, values left-joined, holes as NULL rows.

    ``bounds``: optionally a precomputed (ideally materialized)
    ``chunk_aligned_bounds`` frame — callers that also need the key set
    (``ingest_long``) pass it so the source is scanned once, not per use."""
    if bounds is None:
        bounds = chunk_aligned_bounds(df, keys, chunk_axis, tz, freq_seconds, ts=ts)
    grid = time_grid(bounds, freq_seconds, ts=ts)
    # merge hint: see reindex_to_grid — the exploded grid's size estimate is
    # wrong by orders of magnitude, which can turn into a giant broadcast
    return grid.hint("merge").join(
        df.select(*keys, ts, value), on=[*keys, ts], how="left"
    )
