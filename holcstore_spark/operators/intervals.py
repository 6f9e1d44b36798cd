"""Interval algebra over sets of ranges.

The reference's ``Range`` type (hostore/utils/range/range.py:1-80) provides
union-merge (``combine``), intersection with a minimum-duration threshold,
and requested−available difference. Driver-side scalars stay a tiny Python
class (:class:`Range`); the *set* operations are DataFrame operators using
the islands idiom so they distribute over millions of intervals.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from holcstore_spark.functions.scalar import epoch_us


def merge_intervals(
    df: DataFrame,
    keys: tuple[str, ...] = (),
    start: str = "start",
    end: str = "end",
) -> DataFrame:
    """Union of overlapping-or-touching intervals per key (W4,
    reference: range.py:30-45 ``Range.combine``).

    Islands idiom: an interval starts a new island iff its start exceeds the
    running max end of all earlier intervals; islands collapse via groupBy.
    One shuffle on ``keys`` (or a single partition when keys are empty —
    callers at scale always pass keys).
    """
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(start, end)
    prev_max_end = F.max(end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = F.when(
        prev_max_end.isNull() | (F.col(start) > prev_max_end), 1
    ).otherwise(0)
    run_w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        df.withColumn("__island", F.sum(new_island).over(run_w))
        .groupBy(*keys, "__island")
        .agg(F.min(start).alias(start), F.max(end).alias(end))
        .drop("__island")
    )


@dataclass(frozen=True)
class Range:
    """Driver-side closed interval [sd, ed] mirroring the reference's
    ``Range`` semantics (hostore/utils/range/range.py)."""

    sd: object
    ed: object

    def __post_init__(self):
        if self.sd > self.ed:
            raise ValueError(f"start {self.sd} after end {self.ed}")

    def overlap(self, other: "Range") -> bool:
        return self.sd <= other.ed and other.sd <= self.ed

    def includes(self, other: "Range") -> bool:
        return self.sd <= other.sd and other.ed <= self.ed

    def check_date(self, x) -> bool:
        return self.sd <= x <= self.ed

    def intersection(self, other: "Range", min_delta=None) -> "Range | None":
        lo = max(self.sd, other.sd)
        hi = min(self.ed, other.ed)
        if lo > hi:
            return None
        if min_delta is not None and (hi - lo) < min_delta:
            return None
        return Range(lo, hi)

    def difference_missing(self, available: "Range | None", min_delta=None) -> list["Range"]:
        """Parts of ``self`` (the requested range) not covered by
        ``available`` — 0, 1 or 2 head/tail ranges; pieces shorter than
        ``min_delta`` are dropped (reference: range.py:59-80)."""
        if available is None or not self.overlap(available):
            return [self]
        out: list[Range] = []
        if available.sd > self.sd:
            head = Range(self.sd, min(available.sd, self.ed))
            if min_delta is None or (head.ed - head.sd) >= min_delta:
                out.append(head)
        if available.ed < self.ed:
            tail = Range(max(available.ed, self.sd), self.ed)
            if min_delta is None or (tail.ed - tail.sd) >= min_delta:
                out.append(tail)
        return out

    @staticmethod
    def combine(ranges: list["Range"]) -> list["Range"]:
        """Sort by start and merge overlapping (reference: range.py:30-45)."""
        if not ranges:
            return []
        rs = sorted(ranges, key=lambda r: (r.sd, r.ed))
        out = [rs[0]]
        for r in rs[1:]:
            if r.sd <= out[-1].ed:
                if r.ed > out[-1].ed:
                    out[-1] = Range(out[-1].sd, r.ed)
            else:
                out.append(r)
        return out


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on,
    point_ts: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    bucket_seconds: float = 900.0,
) -> DataFrame:
    """Range (point-in-interval) join: every (point, interval) pair with
    the same keys and ``start <= point_ts <= end`` — a primitive Spark
    only plans as broadcast-nested-loop or a key-equi sort-merge with a
    residual range filter.

    Scale design (the bucketed range-join trick): both sides map their
    timestamps to fixed ``bucket_seconds`` buckets; intervals explode to
    the buckets they cover, points carry their single bucket, and the
    join is a plain equi-join on (keys, bucket) + a range filter. Each
    qualifying pair meets in exactly one bucket (the point's), so no
    dedup is needed. Per-task work is bounded by bucket population, not
    key history length — pick ``bucket_seconds`` near the typical
    interval length so intervals explode to O(1) buckets.

    Inner-join semantics: intervals with no points drop out.
    """
    keys = [on] if isinstance(on, str) else list(on)
    us = int(round(bucket_seconds * 1_000_000))

    def bidx(c):
        e = epoch_us(c)
        return ((e - F.pmod(e, F.lit(us))) / F.lit(us)).cast("long")

    p = points.withColumn("__b", bidx(point_ts))
    i = intervals.withColumn(
        "__b", F.explode(F.sequence(bidx(start), bidx(end)))
    )
    joined = i.join(p, on=keys + ["__b"]).filter(
        F.col(point_ts).between(F.col(start), F.col(end))
    )
    return joined.drop("__b")
