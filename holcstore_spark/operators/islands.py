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

from holcstore_spark.functions.scalar import epoch_us


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


def cusum_drift(
    df: DataFrame,
    keys: tuple[str, ...],
    target_k: float,
    threshold_h: float,
    ts: str = "ts",
    value: str = "value",
    tiebreak: str | None = None,
) -> DataFrame:
    """One-sided CUSUM drift detection per key — the classic
    change-point alarm (Page 1954) used to catch distribution shift in
    a metric stream (training-data quality drifting, a meter reading
    stuck high). The textbook recurrence ``S_t = max(0, S_{t-1} + x_t
    - k)`` looks inherently sequential, but it equals ``P_t - min_{i<=t}
    P_i`` for the prefix sums ``P`` of ``x - k`` — so it runs as TWO
    window functions over each key (prefix sum + running min), fully
    parallel across keys, no UDF, no iteration. When (keys, ts) is not
    unique pass ``tiebreak`` — prefix sums over tied orderings are
    otherwise nondeterministic.

    All arithmetic is on int-quantized values (round(x·1000), k and h
    quantized the same way): the statistic is exact cross-engine
    integer math. Returns the rows where ``S_t > h`` (alarm points)
    with the statistic value.
    """
    kq = int(round(target_k * 1000))
    hq = int(round(threshold_h * 1000))
    y = F.round(F.col(value) * 1000).cast("long") - F.lit(kq)
    order = [ts] if tiebreak is None else [ts, tiebreak]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = df.withColumn("__p", F.sum(y).over(w))
    # S_t = P_t - min(0, min_{i<=t} P_i): the leading 0 is P_0 = 0
    run_min = F.least(F.lit(0).cast("long"), F.min("__p").over(w))
    out = d.withColumn("__s", F.col("__p") - run_min)
    return (
        out.filter(F.col("__s") > hq)
        .select(
            *keys,
            epoch_us(ts).alias("ts_us"),
            F.col(value),
            F.col("__s").alias("cusum_q"),
        )
    )
