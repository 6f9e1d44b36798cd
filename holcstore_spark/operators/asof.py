"""As-of (nearest-timestamp) join — a time-series primitive Spark lacks.

The reference engine has no as-of join; this is a beyond-reference
operator for the training-data / event-pipeline use cases (e.g. "attach
the most recent quote/click/state to every observation").

Scale design: the naive formulation is a non-equi join (``r.ts <= l.ts``
with a per-row argmax), which Spark can only execute as a broadcast
nested loop or a sort-merge with per-row rescans. Instead we use the
classic single-shuffle construction:

1. union both sides with a side marker (right rows carry their payload
   in one struct column, left rows carry NULL),
2. one shuffle: ``Window.partitionBy(keys).orderBy(ts, side)``,
3. ``last(payload, ignorenulls=True)`` over rows UNBOUNDED PRECEDING →
   CURRENT ROW propagates the latest right payload onto every left row.

Cost is exactly one shuffle of |L| + |R| rows and a per-partition sort —
the same shape as a groupBy, no row explosion, AQE-splittable. Skewed
keys (one key with a huge history) are the usual window caveat; salt
upstream if a single key exceeds an executor's partition budget.

Determinism: rows are ordered by (ts, side); at equal timestamps the
right row sorts first, so matches are inclusive (``r.ts <= l.ts``).
The right side must be unique per (keys, ts) — with duplicates, which
payload wins is unspecified (dedupe upstream, e.g. groupBy.max).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from holcstore_spark.functions.scalar import epoch_us

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    tolerance_seconds: float | None = None,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts <= left_ts`` (direction='backward', inclusive) or the
    smallest ``right_ts >= left_ts`` ('forward') sharing the join keys.

    Output: all left columns, plus ``{right_ts}{suffix}`` (the matched
    timestamp) and ``{c}{suffix}`` for each requested right column —
    NULL when no right row qualifies (or the match is farther than
    ``tolerance_seconds``). Left join semantics: every left row survives.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    rcols = (
        list(right_cols)
        if right_cols is not None
        else [c for c in right.columns if c not in keys and c != right_ts]
    )
    clash = set(left.columns) & {"__ts", "__side", "__r"}
    if clash:
        raise ValueError(f"left side reserves column names {sorted(clash)}")

    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).alias("__rts"), *[F.col(c).alias(c) for c in rcols]
        ).alias("__r"),
    )
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__side").asc()]
    else:
        order = [F.col("__ts").desc(), F.col("__side").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))

    if tolerance_seconds is not None:
        tol_us = int(round(tolerance_seconds * 1_000_000))
        delta = epoch_us(F.col("__ts")) - epoch_us(F.col("__m.__rts"))
        if direction == "forward":
            delta = -delta
        u = u.withColumn("__m", F.when(delta <= tol_us, F.col("__m")))

    out = u.filter(F.col("__side") == 1).select(
        *left.columns,
        F.col("__m.__rts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in rcols],
    )
    return out
