"""Version assignment for the key-value store family.

The reference computes the next version as ``Max(version)+1`` scoped by the
``versionning_by`` attrs (hostore/models/hostore.py:357-366). Point writes
use the driver-side scalar; bulk writes use the window form so one shuffle
assigns all versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def next_version(
    existing: DataFrame,
    scope: dict,
    version: str = "version",
) -> int:
    """max(version)+1 within the scope attrs; 0 when the scope is empty."""
    from holcstore_spark.plans.predicates import attrs_filter

    row = existing.filter(attrs_filter(scope)).agg(F.max(version)).first()
    mx = row[0] if row else None
    return 0 if mx is None else int(mx) + 1


def with_next_version(
    new: DataFrame,
    existing: DataFrame,
    scope_keys: tuple[str, ...],
    version: str = "version",
) -> DataFrame:
    """Bulk next-version: each new row gets
    1 + max(existing version in its scope), or 0 for unseen scopes —
    a broadcastable agg-join instead of a driver loop."""
    base = (
        existing.groupBy(*scope_keys)
        .agg(F.max(version).alias("__maxv"))
    )
    return (
        new.join(F.broadcast(base), on=list(scope_keys), how="left")
        .withColumn(version, F.coalesce(F.col("__maxv") + 1, F.lit(0)))
        .drop("__maxv")
    )
