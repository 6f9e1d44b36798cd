"""Resampling-adjacent operators: ffill, min-max normalize, min step,
proportional disaggregation.

All are single-window or single-agg expressions — no UDFs, fully
whole-stage-codegen, one shuffle on the group keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from holcstore_spark.functions.scalar import epoch_us


def ffill(
    df: DataFrame,
    keys: tuple[str, ...],
    cols: tuple[str, ...],
    order: str = "ts",
) -> DataFrame:
    """Forward-fill ``cols`` within each key, ordered by ``order``
    (reference: df['feat'].ffill() inside upsample,
    hostore/utils/timeseries.py:183-184)."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def normalize_minmax(
    df: DataFrame,
    keys: tuple[str, ...],
    value: str = "value",
    out: str = "value_norm",
) -> DataFrame:
    """(x - min) / (max - min) per key (reference ``ts_normalize``,
    hostore/utils/timeseries.py:263-266). Degenerate max==min → NULL."""
    w = Window.partitionBy(*keys)
    mn, mx = F.min(value).over(w), F.max(value).over(w)
    return df.withColumn(
        out, F.when(mx != mn, (F.col(value) - mn) / (mx - mn))
    )


def min_step(
    df: DataFrame,
    keys: tuple[str, ...],
    ts: str = "ts",
    out: str = "min_step_seconds",
) -> DataFrame:
    """Minimum successive index step per key, in seconds (reference
    ``pd_min_freq``, hostore/utils/timeseries.py:249-260)."""
    w = Window.partitionBy(*keys).orderBy(ts)
    diff = F.col(ts).cast("long") - F.lag(F.col(ts).cast("long")).over(w)
    return (
        df.withColumn("__d", diff)
        .groupBy(*keys)
        .agg(F.min("__d").alias(out))
    )


def disaggregate_by_reference(
    df: DataFrame,
    keys: tuple[str, ...],
    bucket,
    ref: str = "ref",
    feat: str = "feat",
    ts: str = "ts",
    out: str = "value",
) -> DataFrame:
    """Proportional disaggregation (reference
    ``upsample_using_reference_serie``, hostore/utils/timeseries.py:166-225):
    a coarse feature series is spread over a fine reference series's shape.

    Per (keys, bucket): ``out = feat_ffilled * ref / mean(ref over bucket)``
    — the bucket mean preserves the coarse total's level while the reference
    provides the intra-bucket profile. ``bucket`` is a Column (e.g.
    ``F.date_trunc('day', 'ts')``).
    """
    d = df.withColumn("__bucket", bucket)
    d = ffill(d, keys, (feat,), order=ts)
    wb = Window.partitionBy(*keys, "__bucket")
    mean_ref = F.avg(ref).over(wb)
    return d.withColumn(
        out,
        F.when(mean_ref != 0, F.col(feat) * F.col(ref) / mean_ref),
    ).drop("__bucket")


def time_bucket(ts, width_seconds: float):
    """Epoch-aligned floor of a timestamp to ``width_seconds`` buckets
    (hypertable-rollup style downsampling bucket; works for any width,
    not just calendar units like ``date_trunc``).

    Sign-correct flooring via pmod (exact long arithmetic, no doubles),
    so pre-1970 timestamps bucket correctly too.
    """
    us = int(round(width_seconds * 1_000_000))
    e = epoch_us(ts)
    return F.timestamp_micros(e - F.pmod(e, F.lit(us)))


def time_bucket_rollup(
    df: DataFrame,
    keys: tuple[str, ...],
    width_seconds: float,
    ts: str = "ts",
    value: str = "value",
    tiebreak: str | None = None,
) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: downsample a long
    series to fixed-width buckets with count / exact sum / min / max /
    first / last per (keys, bucket).

    One shuffle on (keys, bucket); partial aggregation is map-side, so
    at 100 TB each executor pre-folds its scan share and only bucket
    subtotals move. The sum is DECIMAL-exact (reduction-order-free);
    first/last are ``min_by``/``max_by`` on the timestamp — deterministic
    when (keys, ts) is unique, else pass ``tiebreak`` to order ties.
    """
    order = F.col(ts) if tiebreak is None else F.struct(ts, tiebreak)
    v = F.col(value)
    return (
        df.withColumn("bucket_ts", time_bucket(ts, width_seconds))
        .groupBy(*keys, "bucket_ts")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v.cast("decimal(28,6)")).cast("double").alias("v_sum"),
            F.min(v).alias("v_min"),
            F.max(v).alias("v_max"),
            F.min_by(v, order).alias("v_first"),
            F.max_by(v, order).alias("v_last"),
        )
    )


def sliding_window_rollup(
    df: DataFrame,
    keys: tuple[str, ...],
    width_seconds: int,
    slide_seconds: int,
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Sliding-window rollup: every event contributes to the
    ``width/slide`` epoch-aligned windows that contain it (Spark's
    ``F.window(ts, width, slide)`` semantics, usable identically in
    batch and Structured Streaming).

    ``width`` must be a multiple of ``slide`` so the per-event window
    fan-out is constant. One shuffle on (keys, window) with map-side
    partial aggregation; the DECIMAL sum keeps totals exact and
    reduction-order-free. At 100 TB the shuffle volume is
    width/slide × the tumbling-rollup volume — bounded and predictable.
    """
    if width_seconds % slide_seconds != 0:
        raise ValueError("width_seconds must be a multiple of slide_seconds")
    w = F.window(
        F.col(ts), f"{width_seconds} seconds", f"{slide_seconds} seconds"
    )
    v = F.col(value)
    return (
        df.groupBy(*keys, w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v.cast("decimal(28,6)")).cast("double").alias("v_sum"),
            F.min(v).alias("v_min"),
            F.max(v).alias("v_max"),
        )
        .select(
            *keys,
            # cast handles TIMESTAMP_NTZ inputs (no-op on TIMESTAMP): the
            # engine pins session tz to UTC, so NTZ wall-clock == epoch
            epoch_us(F.col("w.start")).alias(
                "window_start_us"
            ),
            "n", "v_sum", "v_min", "v_max",
        )
    )


def rolling_stats(
    df: DataFrame,
    keys: tuple[str, ...],
    window_rows: int,
    ts: str = "ts",
    value: str = "value",
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-key trailing-window statistics over the ordered series: count,
    mean, min, max and the EXACT variance numerator
    ``n·Σx² − (Σx)²`` for the last ``window_rows`` rows (divide by
    ``n·(n−1)`` for sample variance) — the moving-average / volatility
    pass of load-curve analytics.

    Works on the int-quantized value (``round(x·1000)``) so every
    windowed sum is exact integer arithmetic: cross-engine
    bit-reproducible, including the variance numerator (a float
    Welford/naive two-pass would drift in the last ulp). One shuffle on
    the keys; the frame is ROWS-bounded so state per row is O(1).
    When (keys, ts) is not unique pass ``tiebreak`` — ROWS frames over
    tied orderings are otherwise nondeterministic.
    """
    v = F.round(F.col(value) * 1000).cast("long")
    order = [ts] if tiebreak is None else [ts, tiebreak]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(-(window_rows - 1), Window.currentRow)
    )
    n = F.count(v).over(w)
    s1 = F.sum(v).over(w)
    s2 = F.sum(v * v).over(w)
    return df.select(
        *keys,
        epoch_us(ts).alias("ts_us"),
        n.alias("n_window"),
        (s1.cast("double") / n).alias("v_mean_q"),
        F.min(v).over(w).alias("v_min_q"),
        F.max(v).over(w).alias("v_max_q"),
        (n * s2 - s1 * s1).alias("var_num_q"),
    )


def seasonal_profile(
    df: DataFrame,
    keys: tuple[str, ...],
    ts: str = "ts",
    value: str = "value",
    by_weekday: bool = True,
) -> DataFrame:
    """Seasonal baseline + anomaly residual — the classic load-curve
    decomposition: per (keys, hour-of-day[, weekday-vs-weekend]) the
    corpus learns an exact mean profile, and every point gets its
    deviation from that baseline (the anomaly signal downstream alerting
    thresholds on).

    Exactness: values quantize to ints, the profile mean is one double
    division of exact integer sums, and weekday derives from pure
    epoch-day arithmetic ``(days + 3) % 7`` (Mon=0; 1970-01-01 was a Thursday)
    — no engine-specific ``dayofweek`` numbering. Two shuffles: the
    profile aggregate (map-side combined, output is keys×24×2 rows) and
    the profile join (AQE broadcasts the profile when small).
    """
    v = F.round(F.col(value) * 1000).cast("long")
    e = epoch_us(ts)
    hour = F.pmod(F.floor(e / 3_600_000_000), 24).cast("int")
    slot = [hour.alias("hod")]
    if by_weekday:
        dow = F.pmod(F.floor(e / 86_400_000_000) + 3, 7)
        slot.append((dow >= 5).cast("int").alias("is_weekend"))
    d = df.withColumn("__vq", v).select("*", *slot)
    slot_cols = ["hod"] + (["is_weekend"] if by_weekday else [])
    prof = (
        d.groupBy(*keys, *slot_cols)
        .agg(
            F.count("__vq").alias("n_slot"),
            (F.sum("__vq").cast("double") / F.count("__vq")).alias("baseline_q"),
        )
    )
    return (
        # profile size is |keys|x24x2 rows: AQE broadcasts it when the key
        # cardinality is moderate and falls back to a co-partitioned join
        # when it is not - no forced broadcast of a possibly-huge profile
        d.join(prof, on=[*keys, *slot_cols])
        .select(
            *keys,
            epoch_us(ts).alias("ts_us"),
            *slot_cols,
            F.col("__vq").alias("v_q"),
            "n_slot",
            "baseline_q",
            (F.col("__vq") - F.col("baseline_q")).alias("resid_q"),
        )
    )
