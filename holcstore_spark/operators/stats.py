"""Distribution statistics over event/metric tables.

Training-data pipelines gate on score distributions (quality-score
percentiles per source, histogram of doc lengths per language) before
choosing filter thresholds; the reference's admin surface exposes only
count/min/max aggregates, so these extend SURVEY §2's A-family with the
distributional rollups a 100 TB corpus audit needs.

Scale notes
-----------
``percentile_rollup(exact=True)`` uses Spark's exact ``percentile``
aggregate, which buffers every value of a group on one executor — right
for auditing a bounded number of groups (languages, sources, event
types), wrong for high-cardinality keys. ``exact=False`` switches to
``percentile_approx`` (streaming QuantileSummaries, bounded memory,
map-side partial merge) — the 100 TB path when per-group volume is
unbounded. ``value_histogram`` is a plain groupBy count: map-side
partial aggregation means only (key, bin) subtotals shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def percentile_rollup(
    df: DataFrame,
    keys: tuple[str, ...],
    value: str = "value",
    ps: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group percentiles of ``value`` with count/mean alongside.

    Exact mode computes linear-interpolated percentiles (same definition
    as ANSI ``percentile_cont``); approx mode trades a bounded relative
    rank error of ``1/accuracy`` for bounded executor memory. One column
    ``p_<pct>`` per requested percentile.
    """
    v = F.col(value).cast("double")
    if exact:
        pcts = F.percentile(v, F.array(*[F.lit(p) for p in ps]))
    else:
        pcts = F.percentile_approx(v, F.array(*[F.lit(p) for p in ps]), accuracy)
    aggs = [
        F.count(v).alias("n"),
        F.avg(v).alias("v_mean"),
        pcts.alias("_pcts"),
    ]
    out = df.groupBy(*keys).agg(*aggs)
    for i, p in enumerate(ps):
        out = out.withColumn(_pcol(p), F.col("_pcts")[i])
    return out.drop("_pcts")


def _pcol(p: float) -> str:
    # 0.25 -> p_25, 0.955 -> p_95_5 (deterministic, SQL-safe)
    s = f"{p * 100:g}".replace(".", "_")
    return f"p_{s}"


def value_histogram(
    df: DataFrame,
    keys: tuple[str, ...],
    value: str = "value",
    bin_width: float = 1.0,
    lo: float = 0.0,
) -> DataFrame:
    """Fixed-width histogram of ``value`` per key group.

    ``bin`` is ``floor((value - lo) / bin_width)`` (values below ``lo``
    land in negative bins rather than being dropped); ``bin_lo`` is the
    bin's inclusive lower edge. Nulls are excluded. Single shuffle on
    (keys, bin) with map-side combine.
    """
    v = F.col(value).cast("double")
    b = F.floor((v - F.lit(float(lo))) / F.lit(float(bin_width))).cast("long")
    return (
        df.where(v.isNotNull())
        .groupBy(*keys, b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("bin_lo", F.lit(float(lo)) + F.col("bin") * F.lit(float(bin_width)))
    )
