"""Dense-grid generation, reindexing and completeness (hole detection).

The reference reindexes every stored series onto a regular grid at
STORE_FREQ spanning whole calendar chunks (chunk_timeserie_store.py:731-742)
and detects holes by scanning null runs on that grid
(``check_ts_completeness``, hostore/utils/timeseries.py:11-65, driven by
``Store.find_holes`` hostore.py:162-216).

Spark realization: for REINDEXING (the write path needs the dense rows)
the grid is ``sequence(start, end, interval)`` + ``explode`` — generated
*per key from that key's own bounds*, so grid size is O(span/freq) per key
and never materialized globally; values land on it via a single left join
shuffled on ``(keys…, ts)``. HOLE DETECTION (r16) never materializes the
grid at all: holes are derived from consecutive *present* grid points
(lag/lead gaps vs the requested bounds), so its shuffles are bounded by
the data, not the span. No driver loops — scales to millions of keys.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F



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
    # r16 (guide §1.1/§2.4): holes are derived from CONSECUTIVE PRESENT
    # grid points, not from a dense sequence+explode grid left-joined to
    # the values. The old shape materialized O(span/freq) grid rows per
    # key and shuffled them twice (the (keys, ts) join exchange plus the
    # (keys) window exchange feeding null_runs); this shape shuffles only
    # the PRESENT rows (≤ data size, never span size) once for the
    # window. Equivalent for unique (keys…, ts) inputs — both production
    # callers (the entry query's .distinct() frame and find_holes'
    # overlay_merge output, unique per (prm, ts) by construction)
    # guarantee that: a present on-grid point = a df row with non-null
    # value on a grid instant; every maximal gap between consecutive
    # present points (plus the leading/trailing gaps against the
    # requested bounds, plus a full-range hole for keys with no present
    # point at all) is exactly a null run of the dense grid.
    from holcstore_spark.functions.scalar import epoch_us

    if pd.Timestamp(start) > pd.Timestamp(end):
        # the grid formulation raised from sequence() at runtime; keep an
        # explicit refusal rather than emitting inverted holes
        raise ValueError(
            f"completeness_holes: start {start!r} is after end {end!r}"
        )
    start_l = F.lit(start).cast("timestamp")
    end_l = F.lit(end).cast("timestamp")
    freq_us = int(freq_seconds) * 1_000_000
    # last grid point ≤ end (the dense grid stops there, so trailing and
    # full-range holes must too)
    span_us = epoch_us(end_l) - epoch_us(start_l)
    g_end = F.timestamp_micros(
        epoch_us(start_l) + (span_us - span_us % freq_us)
    )
    f = _interval(freq_seconds)
    src = df.select(*keys, F.col(ts).alias("__ts"), F.col(value).alias("__v"))
    # the present set is deduplicated with a plain distinct (map-side
    # partial dedup before its exchange); the window then re-clusters by
    # the keys alone over PRESENT rows only — both shuffles are bounded
    # by the data, never by the grid span
    pres = src.filter(
        F.col("__v").isNotNull()
        & (F.col("__ts") >= start_l)
        & (F.col("__ts") <= end_l)
        & ((epoch_us(F.col("__ts")) - epoch_us(start_l)) % freq_us == 0)
    ).select(*keys, "__ts").distinct()
    w = Window.partitionBy(*keys).orderBy("__ts")
    p2 = (
        pres.withColumn("__prev", F.lag("__ts").over(w))
        .withColumn("__lead", F.lead("__ts").over(w))
    )
    hole = F.struct(
        F.col("__h.s").alias("run_start"), F.col("__h.e").alias("run_end")
    )
    head_hole = F.when(
        F.col("__prev").isNull() & (F.col("__ts") > start_l),
        F.struct(start_l.alias("s"), (F.col("__ts") - F.expr(f)).alias("e")),
    ).when(
        F.col("__prev").isNotNull()
        & (epoch_us(F.col("__ts")) - epoch_us(F.col("__prev")) > freq_us),
        F.struct(
            (F.col("__prev") + F.expr(f)).alias("s"),
            (F.col("__ts") - F.expr(f)).alias("e"),
        ),
    )
    tail_hole = F.when(
        F.col("__lead").isNull() & (F.col("__ts") < g_end),
        F.struct((F.col("__ts") + F.expr(f)).alias("s"), g_end.alias("e")),
    )
    gap_holes = (
        p2.select(*keys, F.explode(F.array(head_hole, tail_hole)).alias("__h"))
        .filter(F.col("__h").isNotNull())
        .select(*keys, hole.alias("__hh"))
    )
    # keys present in df but with zero present grid points → one hole
    # spanning the whole grid (the all-null-grid case of the old shape)
    all_keys = src.select(*keys).distinct()
    empty_keys = all_keys.join(
        pres.select(*keys).distinct(), on=list(keys), how="left_anti"
    )
    full_holes = empty_keys.select(
        *keys,
        F.struct(start_l.alias("run_start"), g_end.alias("run_end")).alias("__hh"),
    )
    holes = gap_holes.unionByName(full_holes).select(*keys, "__hh.*")
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
