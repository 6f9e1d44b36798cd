"""Sessionization: split per-key event streams on inactivity gaps.

Beyond-reference operator for event/clickstream pipelines: a session is
a maximal run of events per key where consecutive gaps are <= the
threshold; the canonical pre-processing step for behavioural features
and per-session training examples.

Scale design: one shuffle (``Window.partitionBy(key).orderBy(ts, tie)``)
computes the gap flags with ``lag`` and the session index with a running
``sum`` over the SAME window spec — Spark executes both in a single
sort + window stage (verified: one Window node in the plan). No
self-join, no explosion; this is the batch twin of the stateful
streaming gap detector (streaming/stateful.py).

Determinism: ordering ties on ``ts`` are broken by the ``tiebreak``
columns, so session indices are reproducible run to run.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from holcstore_spark.functions.scalar import epoch_us

__all__ = ["sessionize", "session_stats"]


def sessionize(
    df: DataFrame,
    key: Sequence[str] | str = "user_id",
    ts: str = "ts",
    gap_seconds: float = 1800.0,
    tiebreak: Sequence[str] = (),
    out: str = "session_idx",
) -> DataFrame:
    """Assign every row a 0-based per-key session index.

    A new session starts at the first event of a key and whenever the
    gap to the previous event exceeds ``gap_seconds`` (strictly: a gap
    of exactly ``gap_seconds`` stays in the session).
    """
    keys = [key] if isinstance(key, str) else list(key)
    gap_us = int(round(gap_seconds * 1_000_000))
    w = Window.partitionBy(*keys).orderBy(ts, *tiebreak)
    prev = F.lag(F.col(ts)).over(w)
    new_session = (
        prev.isNull()
        | ((epoch_us(ts) - epoch_us(prev)) > gap_us)
    ).cast("long")
    run = (
        Window.partitionBy(*keys)
        .orderBy(ts, *tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out, (F.sum(new_session).over(run) - 1).cast("long"))


def session_stats(
    df: DataFrame,
    key: Sequence[str] | str = "user_id",
    ts: str = "ts",
    gap_seconds: float = 1800.0,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Per-session aggregate: start/end timestamps, event count, duration.

    One extra shuffle on (keys, session_idx) after :func:`sessionize`;
    partial (map-side) aggregation applies as usual.
    """
    keys = [key] if isinstance(key, str) else list(key)
    s = sessionize(df, key=keys, ts=ts, gap_seconds=gap_seconds, tiebreak=tiebreak)
    return s.groupBy(*keys, "session_idx").agg(
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            (epoch_us(F.max(ts)) - epoch_us(F.min(ts))) / 1e6
        ).alias("duration_sec"),
    )
