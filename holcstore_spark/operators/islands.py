"""Gaps-and-islands: collapse ordered rows into maximal runs.

``find_constant_sequences`` (reference: hostore/utils/timeseries.py:75-102)
collapses a series into maximal runs of equal value with NaN-aware equality
(``equalp``, timeseries.py:68-72). Classic islands idiom: change-flag via
``lag`` + null-safe equality, run id via running sum, then one groupBy.
Two window passes over the same ``(keys…, order)`` sort — Spark executes
both in a single shuffle since the partitioning matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_run_id(
    df: DataFrame,
    keys: tuple[str, ...],
    order: tuple[str, ...],
    value: str,
) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(value).over(w)
    is_first = F.row_number().over(w) == 1
    changed = F.when(is_first, 1).otherwise(
        (~F.col(value).eqNullSafe(prev)).cast("int")
    )
    run_w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("__run", F.sum(changed).over(run_w))


def constant_runs(
    df: DataFrame,
    keys: tuple[str, ...],
    order: tuple[str, ...] = ("ts",),
    value: str = "value",
    out_start: str = "run_start",
    out_end: str = "run_end",
    out_len: str = "run_len",
) -> DataFrame:
    """Maximal runs of null-safe-equal ``value`` per key, ordered by ``order``.

    Output: keys…, run_start, run_end (min/max of the first order column),
    value (the constant — NULL for null runs), run_len.
    """
    first_order = order[0]
    runs = _with_run_id(df, keys, order, value)
    return runs.groupBy(*keys, "__run").agg(
        F.min(first_order).alias(out_start),
        F.max(first_order).alias(out_end),
        # all rows in a run are null-safe equal; any_value is exact here but
        # min() keeps determinism guarantees (nulls stay null: all-null run)
        F.min(value).alias(value),
        F.count(F.lit(1)).alias(out_len),
    ).drop("__run")


def null_runs(
    df: DataFrame,
    keys: tuple[str, ...],
    order: tuple[str, ...] = ("ts",),
    value: str = "value",
) -> DataFrame:
    """Maximal runs where ``value`` is NULL → (keys…, run_start, run_end,
    run_len). Building block of hole detection (W2)."""
    flagged = df.withColumn("__isnull", F.col(value).isNull())
    runs = constant_runs(flagged, keys, order, value="__isnull")
    return runs.filter(F.col("__isnull")).drop("__isnull")
