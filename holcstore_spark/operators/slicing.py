"""Time slicing of long-format series.

Mirrors the reference's pandas label slicing (inclusive ``serie.loc[s:e]``,
chunk_timeserie_store.py:875-883), the half-open ``slice_ts``
(hostore/utils/timeseries.py:269-272), NaN-bound trimming (:884-886), the
delay cut (hostore/utils/utils.py:11-15) and ``split_ts``
(timeseries.py:105-133) — each as a pushdown-friendly Column predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_slice(
    df: DataFrame,
    start=None,
    end=None,
    ts: str = "ts",
    closed: str = "both",
) -> DataFrame:
    """[start, end] slice; ``closed`` ∈ both|left|right|neither.

    ``both`` is pandas ``.loc`` label slicing; ``left`` is the reference's
    ``slice_ts`` half-open form. Plain range predicates — pushed to the
    Parquet scan and, on a chunked store, drive partition pruning.
    """
    out = df
    c = F.col(ts)
    if start is not None:
        out = out.filter(c >= start if closed in ("both", "left") else c > start)
    if end is not None:
        out = out.filter(c <= end if closed in ("both", "right") else c < end)
    return out


def drop_bounds_na(
    df: DataFrame,
    keys: tuple[str, ...],
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Trim each key's series to [first_valid_index, last_valid_index]
    (reference: chunk_timeserie_store.py:884-886). Interior NULLs survive."""
    w = Window.partitionBy(*keys)
    valid_ts = F.when(F.col(value).isNotNull(), F.col(ts))
    return (
        df.withColumn("__fv", F.min(valid_ts).over(w))
        .withColumn("__lv", F.max(valid_ts).over(w))
        .filter(F.col(ts).between(F.col("__fv"), F.col("__lv")))
        .drop("__fv", "__lv")
    )


def slice_with_delay(
    df: DataFrame,
    keys: tuple[str, ...],
    delay_seconds: int,
    ts: str = "ts",
) -> DataFrame:
    """Cut the first ``delay`` of each key's series
    (reference: utils/utils.py:11-15 ``ds[ds.index.min()+delay:]``)."""
    w = Window.partitionBy(*keys)
    cut = F.min(ts).over(w) + F.expr(f"INTERVAL {int(delay_seconds)} SECOND")
    return (
        df.withColumn("__cut", cut)
        .filter(F.col(ts) >= F.col("__cut"))
        .drop("__cut")
    )


def split_at(
    df: DataFrame,
    split,
    ts: str = "ts",
) -> tuple[DataFrame, DataFrame]:
    """Split into (before-or-at, after-or-at) around ``split``
    (reference ``split_ts``, utils/timeseries.py:105-133 — the split point
    belongs to both sides, as in pandas label slicing)."""
    return df.filter(F.col(ts) <= split), df.filter(F.col(ts) >= split)
