"""Partition-pruning derivation.

The reference turns time bounds into ``chunk_index__gte/__lte`` range
predicates so the b-tree skips chunks (chunk_timeserie_store.py:855-861).
Here the table is *partitioned by* ``chunk_index``, so the same derived
predicate becomes Catalyst partition elimination: only the matching
directories are listed and scanned — the property that keeps a point read
cheap on a 100 TB table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from holcstore_spark.functions.scalar import chunk_index_of


def normalize_bound(bound, tz: str) -> pd.Timestamp | None:
    """Accept str / datetime / pd.Timestamp / None / NaT in any tz and
    return a UTC instant (reference: chunk_timeserie_store.py:845-853)."""
    if bound is None or (isinstance(bound, float) and pd.isna(bound)):
        return None
    ts = pd.Timestamp(bound)
    if pd.isna(ts):
        return None
    if ts.tzinfo is None:
        ts = ts.tz_localize(tz)
    return ts.tz_convert("UTC")


def chunk_bounds_filter(
    start: pd.Timestamp | None,
    end: pd.Timestamp | None,
    chunk_axis: tuple[str, ...],
    tz: str,
    chunk_col: str = "chunk_index",
) -> Column:
    """``chunk_index`` range predicate for a time window (partition pruning)."""
    pred = F.lit(True)
    if start is not None:
        pred = pred & (F.col(chunk_col) >= chunk_index_of(start, chunk_axis, tz))
    if end is not None:
        pred = pred & (F.col(chunk_col) <= chunk_index_of(end, chunk_axis, tz))
    return pred
