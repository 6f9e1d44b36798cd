"""Versioned overlay merge — the reference's core non-trivial semantic.

``ts_combine_first(ds_list)`` (reference: hostore/utils/timeseries.py:136-163)
is a left-to-right prioritized coalesce: for each timestamp take the first
non-null value in priority order; the index is the union of all inputs; if
every input is null at a timestamp the output is null there.

Spark realization: no join — union all versions with a priority rank, then
one window ``row_number`` per ``(group keys…, ts)`` ordered by
(value-is-null, priority) and keep row 1. A single shuffle on
``(keys…, ts)``, fully whole-stage-codegen, and AQE handles skewed keys.
This beats an N-way full-outer join (N-1 shuffles) at any scale.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from holcstore_spark.plans.predicates import order_cols


def overlay_merge(
    df: DataFrame,
    combined_by: tuple[str, ...],
    order_by: tuple[str, ...] = ("-version",),
    ts: str = "ts",
    value: str = "value",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Combine-on-read of the Store family (reference: hostore.py:257-268).

    Groups rows by ``combined_by``, treats ``order_by`` (Django dialect,
    '-col' = desc; default latest version first) as the priority order and
    folds ``combine_first`` across versions at each timestamp.

    ``keep`` columns are carried through from the winning row (the reference
    reports the *max* version present on the combined result,
    tests_basics.py:107 — callers get that via ``keep=('version',)`` plus a
    max aggregate, or simply read the winning row's version here).
    """
    order = [F.col(value).isNull().asc()] + order_cols(order_by)
    w = Window.partitionBy(*combined_by, ts).orderBy(*order)
    ranked = df.withColumn("__rn", F.row_number().over(w))
    out_cols = [*combined_by, ts, value, *keep]
    return ranked.filter(F.col("__rn") == 1).select(*out_cols)


def combine_first(
    dfs: list[DataFrame],
    keys: tuple[str, ...],
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """``ts_combine_first`` over long frames: earlier list position wins.

    reference: hostore/utils/timeseries.py:136-163 (list order = priority,
    None/empty entries skipped).
    """
    parts = [
        d.select(*keys, ts, value).withColumn("__prio", F.lit(i))
        for i, d in enumerate(dfs)
        if d is not None
    ]
    if not parts:
        raise ValueError("combine_first needs at least one DataFrame")
    u = reduce(DataFrame.unionByName, parts)
    return overlay_merge(u, combined_by=keys, order_by=("__prio",), ts=ts, value=value)


def delayed(
    df: DataFrame,
    group_keys: tuple[str, ...],
    delay_seconds: int,
    ts: str = "ts",
) -> DataFrame:
    """Drop the first ``delay`` of each group — ``combined_delay``
    pre-merge slicing (reference: hostore/utils/utils.py:11-15 used at
    hostore.py:262-263; penalizes each version's stale leading edge)."""
    w = Window.partitionBy(*group_keys)
    min_ts = F.min(ts).over(w)
    return (
        df.withColumn("__cut", min_ts + F.expr(f"INTERVAL {int(delay_seconds)} SECOND"))
        .filter(F.col(ts) >= F.col("__cut"))
        .drop("__cut")
    )
