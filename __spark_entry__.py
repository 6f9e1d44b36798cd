"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` declares one entry per implemented operator family from
SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent SQL. The driver
runs both at sf=0.01 and compares row-count + schema + value-hash.

Determinism rules used throughout (so Spark and DuckDB hash identically):
- timestamps leave the engine as formatted strings (UTC wall clock);
- per-row float arithmetic is bit-deterministic (same IEEE ops both sides)
  and is emitted unrounded;
- every SUM/AVG over doubles goes through an exact DECIMAL cast first
  (aggregation order then cannot perturb the result), and is cast back to
  DOUBLE at the end;
- ties in window orderings always carry a unique tiebreak column.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

#: session-scoped resolved-reader memo — the catalog role for path-based
#: tables. ``spark.read.parquet`` eagerly lists the path and reads footers
#: for schema on EVERY call (~100-200 ms warm), and the bench queries
#: collectively re-resolve the same ten tables dozens of times. Caching the
#: resolved DataFrame HANDLE (a logical plan node — no data, no results;
#: Spark's own SessionCatalog does exactly this for catalog tables) makes
#: later builds skip the redundant footer reads. Keyed by applicationId so
#: a fresh session (whose stopped predecessor's plans are unusable) never
#: sees stale handles; every execution still scans the parquet itself.
#: The key also carries the parquet path's mtime as a freshness token:
#: the cached handle pins the InMemoryFileIndex listing from first
#: resolution, so if a caller regenerates or appends to <name>.parquet
#: within the same application the listing would otherwise go stale
#: (testdata is read-only by driver contract, but the invariant should
#: not be implicit). A regenerated file/dir bumps its mtime and misses.
_T_CACHE: dict[tuple[str, str, str, float], DataFrame] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # the driver may hand us a session with different defaults: pin the two
    # runtime confs result determinism depends on (UTC rendering must match
    # DuckDB's naive timestamps; events.parquet needs the nanos fallback)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = -1.0  # non-local / missing path: key on path alone
    key = (spark.sparkContext.applicationId, os.path.realpath(sf_dir),
           name, mtime)
    cached = _T_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(path)
    # events.parquet stores TIMESTAMP(NANOS). Depending on the PySpark
    # build, that surfaces as one of three dtypes — branch on what we
    # actually got, never on which conf we *asked* for (some builds accept
    # spark.sql.legacy.parquet.nanosAsLong but ignore it):
    #   bigint        -> nanosAsLong honored: integer-divide to micros
    #                    (integer div, not /1000.0: double arithmetic loses
    #                    the low bits of the 61-bit nano value)
    #   timestamp_ntz -> native nanos read, no session tz attached: cast to
    #                    timestamp (session tz is pinned UTC above, so the
    #                    instant is identical)
    #   timestamp     -> already what we want
    if name == "events":
        ts_dtype = dict(df.dtypes).get("ts")
        if ts_dtype == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_dtype == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _T_CACHE[key] = df
    return df


def _events_versioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + synthetic version/holes: version = event_id % 3, value2 is
    NULL for every 7th event (injects the NaN-hole patterns the reference's
    test matrix exercises, test_chunk_timeserie_store.py:368-400)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("version", (F.col("event_id") % 3).cast("int"))
        .withColumn(
            "value2",
            F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value")),
        )
        .withColumn("hts", F.date_trunc("hour", F.col("ts")))
    )


_EVENTS_VERSIONED_SQL = """
    SELECT *,
           CAST(event_id % 3 AS INT) AS version,
           CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value2,
           date_trunc('hour', ts) AS hts
    FROM events
"""

#: shared dHash reconstruction CTEs (documents → per-doc 64-bit hash
#: halves + four 16-bit LSH bands) for the image near-dup oracles
_DHASH_CTE_SQL = """
            WITH d0 AS (
                SELECT doc_id, doc_id - doc_id % 2 AS base_id
                FROM documents
            ),
            bt AS (
                SELECT doc_id AS base_id,
                       regexp_replace(text, '[^ -~]', '', 'g') AS ascii_t
                FROM documents
            ),
            base AS (
                SELECT d0.doc_id, d0.base_id,
                       CAST(9 + base_id % 5 AS INT) AS w,
                       CAST(8 + base_id % 4 AS INT) AS h,
                       substr(md5(ascii_t || '|0') || md5(ascii_t || '|1') || md5(ascii_t || '|2') || md5(ascii_t || '|3') || md5(ascii_t || '|4') || md5(ascii_t || '|5') || md5(ascii_t || '|6') || md5(ascii_t || '|7') || md5(ascii_t || '|8') || md5(ascii_t || '|9') || md5(ascii_t || '|10') || md5(ascii_t || '|11') || md5(ascii_t || '|12') || md5(ascii_t || '|13'),
                              1,
                              CAST(3 * (9 + base_id % 5)
                                     * (8 + base_id % 4) AS INT)) AS pix0
                FROM d0 JOIN bt USING (base_id)
            ),
            imgs AS (
                SELECT doc_id, w, h,
                       CASE WHEN doc_id % 2 = 0 THEN pix0
                            ELSE substr(pix0, 1, length(pix0) - 1) || '~'
                       END AS pix
                FROM base
            ),
            grid AS (
                SELECT doc_id, CAST(jj.j AS INT) AS j, CAST(ii.i AS INT) AS i,
                       pix,
                       3 * (((CAST(jj.j AS INT) * h) // 8) * w
                            + (CAST(ii.i AS INT) * w) // 9) AS pl,
                       3 * (((CAST(jj.j AS INT) * h) // 8) * w
                            + ((CAST(ii.i AS INT) + 1) * w) // 9) AS pr
                FROM imgs
                CROSS JOIN (SELECT unnest(range(0, 8)) AS j) jj
                CROSS JOIN (SELECT unnest(range(0, 8)) AS i) ii
            ),
            bits AS (
                SELECT doc_id, j * 8 + i AS k,
                       CASE WHEN
                           (ascii(substr(pix, pl + 1, 1))
                            + ascii(substr(pix, pl + 2, 1))
                            + ascii(substr(pix, pl + 3, 1))) // 3
                           <
                           (ascii(substr(pix, pr + 1, 1))
                            + ascii(substr(pix, pr + 2, 1))
                            + ascii(substr(pix, pr + 3, 1))) // 3
                       THEN 1 ELSE 0 END AS bit
                FROM grid
            ),
            hashes AS (
                SELECT doc_id,
                       CAST(sum(CASE WHEN k < 32
                                THEN bit * (1::BIGINT << (31 - k))
                                ELSE 0 END) AS BIGINT) AS hi,
                       CAST(sum(CASE WHEN k >= 32
                                THEN bit * (1::BIGINT << (63 - k))
                                ELSE 0 END) AS BIGINT) AS lo
                FROM bits GROUP BY doc_id
            ),
            bands AS (
                SELECT doc_id, v.band_id,
                       CASE v.band_id
                           WHEN 0 THEN (hi >> 16) & 65535
                           WHEN 1 THEN hi & 65535
                           WHEN 2 THEN (lo >> 16) & 65535
                           ELSE lo & 65535
                       END AS bv
                FROM hashes, (VALUES (0), (1), (2), (3)) v(band_id)
            ),
"""


_FMT = "yyyy-MM-dd HH:mm:ss"          # Spark date_format pattern
_FMT_DUCK = "%Y-%m-%d %H:%M:%S"       # DuckDB strftime pattern


def _fmt(c) -> F.Column:
    return F.date_format(c, _FMT)


def _await_stream(q, timeout_sec: int = 300) -> None:
    """awaitTermination with the return value CHECKED: a timed-out
    streaming query would otherwise leave a silently-partial sink that
    the oracle comparison reads as wrong values with no hint why
    (ADVICE r7). Stops the straggler and raises instead."""
    if not q.awaitTermination(timeout_sec):
        try:
            q.stop()
        finally:
            raise TimeoutError(
                f"streaming query {q.name or q.id} still running after "
                f"{timeout_sec}s — sink would be partial"
            )


def _dec_sum(c, scale: int = 6) -> F.Column:
    """Exact aggregation of doubles: per-row DECIMAL cast (deterministic
    rounding of identical doubles) → exact SUM → DOUBLE."""
    return F.sum(c.cast(f"decimal(28,{scale})")).cast("double")


# ---------------------------------------------------------------------------
# query implementations (operator families cite SURVEY.md §2 ids)
# ---------------------------------------------------------------------------

def q_overlay_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1/M2: versioned overlay — first non-null value per (key, ts) in
    priority order (latest version first, event_id tiebreak)."""
    from holcstore_spark.operators.overlay import overlay_merge

    d = _events_versioned(spark, sf_dir).select(
        "user_id", "hts", "version", "event_id", "value2"
    )
    merged = overlay_merge(
        d,
        combined_by=("user_id",),
        order_by=("-version", "event_id"),
        ts="hts",
        value="value2",
    )
    return merged.select(
        "user_id", _fmt("hts").alias("ts_str"), F.col("value2").alias("val")
    )


def q_combined_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5/P11: drop the first 6h of each (user, version) series, then
    overlay (the reference's combined_delay knob, hostore.py:262-263)."""
    from holcstore_spark.operators.overlay import delayed, overlay_merge

    d = _events_versioned(spark, sf_dir).select(
        "user_id", "version", "event_id", "hts", "value2"
    )
    cut = delayed(d, ("user_id", "version"), 6 * 3600, ts="hts")
    merged = overlay_merge(
        cut,
        combined_by=("user_id",),
        order_by=("-version", "event_id"),
        ts="hts",
        value="value2",
    )
    return merged.select(
        "user_id", _fmt("hts").alias("ts_str"), F.col("value2").alias("val")
    )


def q_completeness_holes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: dense hourly grid over [2024-01-01, 2024-01-08) per user, null
    runs → missing ranges."""
    from holcstore_spark.operators.grid import completeness_holes

    e = _t(spark, sf_dir, "events")
    p = (
        e.filter((F.col("ts") >= "2024-01-01") & (F.col("ts") < "2024-01-08"))
        .select("user_id", F.date_trunc("hour", "ts").alias("ts"))
        .distinct()
        .withColumn("value", F.lit(1.0))
    )
    holes = completeness_holes(
        p, ("user_id",), 3600,
        start="2024-01-01 00:00:00", end="2024-01-07 23:00:00",
    )
    return holes.select(
        "user_id",
        _fmt("hole_start").alias("hole_start"),
        _fmt("hole_end").alias("hole_end"),
    )


def q_constant_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: maximal runs of equal (NaN-aware) bucketed value per user."""
    from holcstore_spark.operators.islands import constant_runs

    d = _events_versioned(spark, sf_dir).select(
        "user_id", "ts", "event_id",
        F.when(
            F.col("value2").isNotNull(), F.floor(F.col("value2") / 50)
        ).alias("bucket"),
    )
    runs = constant_runs(
        d, ("user_id",), order=("ts", "event_id"), value="bucket"
    )
    return runs.select(
        "user_id",
        _fmt("run_start").alias("run_start"),
        _fmt("run_end").alias("run_end"),
        F.col("bucket").cast("long").alias("bucket"),
        F.col("run_len").cast("long").alias("run_len"),
    )


def q_merge_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: union-merge of overlapping intervals per user (Range.combine)."""
    from holcstore_spark.operators.intervals import merge_intervals

    e = _t(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.make_interval(hours=F.floor(F.col("value") / 10).cast("int")))
        .alias("end"),
    )
    merged = merge_intervals(iv, keys=("user_id",))
    return merged.select(
        "user_id",
        _fmt("start").alias("start_str"),
        _fmt("end").alias("end_str"),
    )


def q_drop_bounds_na(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: trim each user's hourly grid series to [first_valid, last_valid];
    interior NULLs survive."""
    from holcstore_spark.operators.grid import reindex_to_grid
    from holcstore_spark.operators.slicing import drop_bounds_na

    hourly = (
        _events_versioned(spark, sf_dir)
        .groupBy("user_id", "hts")
        .agg(F.max("value2").alias("value"))
        .withColumnRenamed("hts", "ts")
    )
    grid = reindex_to_grid(
        hourly, ("user_id",), 3600,
        start="2024-01-01 00:00:00", end="2024-01-30 23:00:00",
    )
    trimmed = drop_bounds_na(grid, ("user_id",))
    return trimmed.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("value").alias("n_valid"),
        _dec_sum(F.col("value")).alias("total"),
    )


def q_slice_with_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11: cut the first 6h of each user's event stream."""
    from holcstore_spark.operators.slicing import slice_with_delay

    e = _t(spark, sf_dir, "events")
    cut = slice_with_delay(e, ("user_id",), 6 * 3600)
    return cut.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        _dec_sum(F.col("value"), 2).alias("total"),
    )


def q_split_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12: split at a timestamp (point belongs to both sides)."""
    from holcstore_spark.operators.slicing import split_at

    e = _t(spark, sf_dir, "events")
    before, after = split_at(e, "2024-01-15 12:00:00")
    b = before.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_before"))
    a = after.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_after"))
    return b.join(a, on="user_id", how="full").fillna(
        0, subset=["n_before", "n_after"]
    )


def q_time_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: half-open [start, end) slice (the reference's slice_ts)."""
    from holcstore_spark.operators.slicing import time_slice

    e = _t(spark, sf_dir, "events")
    s = time_slice(e, "2024-01-10 00:00:00", "2024-01-20 00:00:00", closed="left")
    return s.select("event_id", "user_id", _fmt("ts").alias("ts_str"))


def q_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: forward-fill nulls per user in event order."""
    from holcstore_spark.operators.resample import ffill

    d = _events_versioned(spark, sf_dir).select(
        "user_id", "ts", "event_id", F.col("value2").alias("filled")
    )
    out = ffill(d, ("user_id",), ("filled",), order="event_id")
    return out.select("event_id", "user_id", "filled")


def q_normalize_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: per-user min-max normalization (per-row IEEE arithmetic)."""
    from holcstore_spark.operators.resample import normalize_minmax

    e = _t(spark, sf_dir, "events")
    out = normalize_minmax(e, ("user_id",))
    return out.select("event_id", "user_id", "value_norm")


def q_min_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: minimum successive timestamp step per user, in seconds."""
    from holcstore_spark.operators.resample import min_step

    e = _t(spark, sf_dir, "events")
    return min_step(e, ("user_id",)).select("user_id", "min_step_seconds")


def q_disaggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: proportional disaggregation — daily totals spread over the hourly
    event-count profile (upsample_using_reference_serie)."""
    from holcstore_spark.operators.resample import disaggregate_by_reference

    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("ts")
    ).agg(F.count(F.lit(1)).cast("double").alias("ref"))
    w_first = Window.partitionBy("user_id", F.date_trunc("day", "ts")).orderBy("ts")
    daily = (
        e.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(_dec_sum(F.col("value"), 2).alias("day_total"))
    )
    base = (
        hourly.withColumn("day", F.date_trunc("day", "ts"))
        .join(daily, on=["user_id", "day"], how="left")
        .withColumn("__rn", F.row_number().over(w_first))
        .withColumn(
            "feat", F.when(F.col("__rn") == 1, F.col("day_total"))
        )
        .drop("__rn", "day_total", "day")
    )
    out = disaggregate_by_reference(
        base, ("user_id",), bucket=F.date_trunc("day", "ts"),
        ref="ref", feat="feat", out="val",
    )
    return out.select("user_id", _fmt("ts").alias("ts_str"), "val")


def q_next_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: bulk next-version assignment (max existing per scope + 1)."""
    from holcstore_spark.operators.versioning import with_next_version

    d = _events_versioned(spark, sf_dir)
    existing = d.select("user_id", "version")
    new = d.select("user_id").distinct()
    out = with_next_version(new, existing, scope_keys=("user_id",))
    return out.select("user_id", F.col("version").cast("int").alias("version"))


def q_chunk_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3/F1: calendar chunk index in store-local (Europe/Paris) time of a
    UTC-instant timestamp, both chunk axes."""
    from holcstore_spark.functions.scalar import chunk_index_col

    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        chunk_index_col("ts", ("year",), "Europe/Paris").alias("ci_year"),
        chunk_index_col("ts", ("year", "month"), "Europe/Paris").alias("ci_ym"),
    )


def q_lookup_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2/P6/O1/O4: Django-lookup dialect → pushed-down predicates, the
    '-col' ordering dialect, and offset/limit pagination."""
    from holcstore_spark.plans.predicates import attrs_filter, order_cols

    e = _t(spark, sf_dir, "events")
    filt = {
        "event_type__in": ["click", "view", "purchase"],
        "value__gte": 25.0,
        "user_id__lt": 12,
        "event_type__ne": "view",
    }
    out = (
        e.filter(attrs_filter(filt))
        .orderBy(*order_cols(("-value", "event_id")))
        .offset(5)
        .limit(50)
    )
    return out.select("event_id", "user_id", "event_type", "value")


def q_store_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/S9/P3/P8 end-to-end: hourly series per user ingested into a real
    ChunkStore (dense grid, partitioned parquet), read back alive with
    bounds — per-user count and exact total must equal the source.

    Runs on the manifest (ACID) backend: measured faster than the plain
    hive layout on every axis in round 6 (sf0.1 ingest 2.5 s vs 4.8 s;
    H1 105M rows 1.59M rows/s; keyed reads 3-4x) because commits skip
    the directory-listing/overwrite dance and reads open exact manifest
    paths. The plain layout keeps driver coverage via the other
    store-backed queries (store_update_overlay, store_set_many, ...)."""
    from holcstore_spark import ChunkStoreConfig
    from holcstore_spark.sources.chunk_store import ChunkStore

    e = _t(spark, sf_dir, "events")
    # the source is a shuffle agg: persist it so ingest_long's two passes
    # (bounds + grid) reuse the blocks instead of re-shuffling events —
    # exactly the caller-side contract ingest_long documents
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("ts")
    ).agg(F.max("value").alias("value")).persist()

    path = tempfile.mkdtemp(prefix="holc_rt_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        store = ChunkStore(
            spark, path,
            ChunkStoreConfig(keys=("user_id",), freq="1h", tz="UTC",
                             chunk_axis=("year", "month"),
                             key_types={"user_id": "int"},
                             acid=True),
        )
        store.ingest_long(hourly, mode="insert")
        got = store.alive_data(
            start="2024-01-05 00:00:00", end="2024-01-25 00:00:00"
        ).filter(F.col("value").isNotNull())
        out = got.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_points"),
            _dec_sum(F.col("value"), 2).alias("total"),
        )
        out = out.localCheckpoint(eager=True)  # materialize before rmtree
        return out
    finally:
        hourly.unpersist()
        shutil.rmtree(path, ignore_errors=True)


def q_kv_store_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2/S6/M2 end-to-end: hourly per-(user, version) series written to
    a real KeyValueStore with explicit versions, combined-on-read — the
    result must equal the pure overlay query."""
    import pandas as pd

    from holcstore_spark.sources.kv_store import KeyValueStore

    d = _events_versioned(spark, sf_dir)
    # one series per (user, version): max value2 per hour (exact, no sums)
    pdf = (
        d.groupBy("user_id", "version", "hts")
        .agg(F.max("value2").alias("v"))
        .toPandas()
    )
    path = tempfile.mkdtemp(prefix="holc_kv_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        kv = KeyValueStore(spark, path, acid=_acid_default())
        # one bulk write per version (ascending): set_many_lc assigns each
        # scope max+1, so every user ends with versions 0..2 in order —
        # 3 Spark writes instead of one per (user, version)
        for ver in sorted(pdf["version"].unique()):
            batch = {}
            for uid, g in pdf[pdf["version"] == ver].groupby("user_id"):
                batch[str(uid)] = pd.Series(
                    g["v"].to_numpy(),
                    index=pd.DatetimeIndex(pd.to_datetime(g["hts"], utc=True)),
                )
            kv.set_many_lc(batch, client_id=1, versionning=True)
        prms = sorted(pdf["user_id"].astype(str).unique())
        got = kv.get_many_lc(prms, client_id=1)
        rows = []
        for prm, entries in got.items():
            s = entries[0]["data"]
            for ts, v in s.items():
                rows.append((int(prm), ts.strftime("%Y-%m-%d %H:%M:%S"), None if pd.isna(v) else float(v)))
        out = spark.createDataFrame(
            pd.DataFrame(rows, columns=["user_id", "ts_str", "val"]),
            schema="user_id long, ts_str string, val double",
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def _hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hourly series per user (max aggregation — no sums)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("ts")
    ).agg(F.max("value").alias("value"))


#: The library default flipped in round 7: NEW stores are ACID
#: (transaction-log backend, sources/txlog.py) unless opted down.
#: SPARK_GRAFT_ACID=0 runs every store-backed query on the legacy plain
#: layout instead — the local validation switch proving the whole
#: battery stays green on both layouts; unset (the driver's mode) runs
#: the library default, i.e. ACID.
def _acid_default() -> bool:
    return bool(int(os.environ.get("SPARK_GRAFT_ACID", "1")))


def _make_event_store(spark: SparkSession, sf_dir: str, acid: bool | None = None):
    from holcstore_spark import ChunkStoreConfig
    from holcstore_spark.sources.chunk_store import ChunkStore

    path = tempfile.mkdtemp(prefix="holc_life_")
    shutil.rmtree(path, ignore_errors=True)
    store = ChunkStore(
        spark, path,
        ChunkStoreConfig(keys=("user_id",), freq="1h", tz="UTC",
                         chunk_axis=("year", "month"),
                         key_types={"user_id": "int"},
                         acid=_acid_default() if acid is None else acid),
    )
    store.ingest_long(_hourly_events(spark, sf_dir), mode="insert")
    return store, path


def q_store_acid_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 6: the transaction-log (ACID) backend under the driver gate.
    Same lifecycle as the plain-store queries — bulk insert, doubled
    mid-January update patch, tombstone every 7th user, bounded read —
    but on ``acid=True``: immutable ``files/<uuid>/`` parquet governed by
    an atomic commit log with optimistic concurrency and manifest-stats
    file skipping (sources/txlog.py). Per-user counts and exact totals
    must equal the source events."""
    store, path = _make_event_store(spark, sf_dir, acid=True)
    try:
        patch = _hourly_events(spark, sf_dir).filter(
            (F.col("ts") >= "2024-01-10") & (F.col("ts") < "2024-01-15")
        ).withColumn("value", F.col("value") * 2)
        store.ingest_long(patch, mode="update")
        # modulo-cohort delete: no driver-side key-catalog collect, so
        # the query stays valid at sf1+ (VERDICT r6 #8)
        store.delete({"user_id__mod": (7, 0)})
        got = store.alive_data().filter(F.col("value").isNotNull())
        out = got.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_points"),
            _dec_sum(F.col("value"), 2).alias("total"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)



def q_store_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 7: Delta-CDF-style row-level change feed
    (``ChunkStore.changes_between``). Ingest the hourly series, snapshot
    the log version, apply the doubled mid-January update patch, then
    read the changes since the snapshot from the MANIFEST diff (only
    changed files are opened; copy-on-write bystander rows cancel in
    the exceptAll). Every patched non-zero hour must surface as exactly
    one delete of the old value and one insert of the doubled value —
    aggregated per (user, change type) with exact decimal totals."""
    store, path = _make_event_store(spark, sf_dir, acid=True)
    try:
        v1 = store._txlog.snapshot().version
        patch = _hourly_events(spark, sf_dir).filter(
            (F.col("ts") >= "2024-01-10") & (F.col("ts") < "2024-01-15")
        ).withColumn("value", F.col("value") * 2)
        store.ingest_long(patch, mode="update")
        ch = store.changes_between(v1).filter(F.col("value").isNotNull())
        out = ch.groupBy("user_id", "_change_type").agg(
            F.count(F.lit(1)).alias("n_changed"),
            _dec_sum(F.col("value"), 2).alias("total"),
        ).withColumnRenamed("_change_type", "change_type")
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)



def q_store_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 9: ``restore(version)`` — the write-side completion of the
    time-travel/history triad (Delta's RESTORE TABLE analogue,
    TxLog.restore_commit). Ingest the hourly series (v1), apply the
    doubled mid-January update patch, then roll the store back with
    ``restore(v1)``: the rollback is a NEW commit re-referencing the old
    generation's files, so per-user counts and exact totals must equal
    the ORIGINAL un-patched series — and the audit trail must show the
    restore as its own history row (asserted in-query)."""
    store, path = _make_event_store(spark, sf_dir, acid=True)
    try:
        v1 = store._txlog.snapshot().version
        patch = _hourly_events(spark, sf_dir).filter(
            (F.col("ts") >= "2024-01-10") & (F.col("ts") < "2024-01-15")
        ).withColumn("value", F.col("value") * 2)
        store.ingest_long(patch, mode="update")
        store.restore(v1)
        top = store.history().limit(1).collect()[0]
        assert f"restore({v1})" in top["op"], top
        got = store.alive_data().filter(F.col("value").isNotNull())
        out = got.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_points"),
            _dec_sum(F.col("value"), 2).alias("total"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def q_store_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 10: ``optimize()`` — incremental small-file binpack (Delta
    OPTIMIZE analogue, sources/chunk_store.py). Ingest the hourly series
    as THREE user cohorts (three append commits → every month chunk
    carries several small files), then repack with
    ``optimize(min_files=3)``: the commit must be chunk-granular (not a
    full-table rewrite), marked row-preserving (``compacting``), reduce
    the live file count, and contribute ZERO rows to the change feed
    (manifest-level skip) — all asserted in-query. Reads after the
    repack must equal the source events exactly (per-user counts +
    decimal-exact totals), which is what the oracle checks."""
    from holcstore_spark import ChunkStoreConfig
    from holcstore_spark.sources.chunk_store import ChunkStore

    path = tempfile.mkdtemp(prefix="holc_opt_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        store = ChunkStore(
            spark, path,
            ChunkStoreConfig(keys=("user_id",), freq="1h", tz="UTC",
                             chunk_axis=("year", "month"),
                             key_types={"user_id": "int"}, acid=True),
        )
        ev = _hourly_events(spark, sf_dir)
        for m in range(3):
            store.ingest_long(
                ev.filter(F.col("user_id") % 3 == m), mode="insert"
            )
        snap = store._txlog.snapshot()
        n_before = len(snap.files["data"])
        n_chunks = store.optimize(min_files=3)
        assert n_chunks >= 1, f"nothing fragmented ({n_before} files)"
        snap2 = store._txlog.snapshot()
        assert len(snap2.files["data"]) < n_before, "binpack did not shrink"
        rec = store._txlog.read(snap2.version)
        assert rec["compacting"] is True
        assert rec["touched"] != "all", "optimize must stay chunk-granular"
        # the repack interval contributes nothing to the change feed
        assert store.changes_between(snap.version).count() == 0
        got = store.alive_data().filter(F.col("value").isNotNull())
        out = got.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_points"),
            _dec_sum(F.col("value"), 2).alias("total"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def q_store_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 10: idempotent writer commits (Delta's ``txn`` action
    analogue — TxLog records ``(txn_app, txn_version)``, snapshots carry
    per-app watermarks that survive checkpoint/prune, and the commit
    rebase walk refuses a racing duplicate). Ingest the hourly series as
    two micro-batches under ``txn_app='q_sink'``, REPLAYING each batch
    once (the crash-replay shape): the replays must be silent no-ops —
    in ``insert`` mode a real re-apply would raise KeyExistsError — and
    exactly two commits may carry the app id (asserted in-query, along
    with the watermark read-back). Totals must equal the
    single-application series, which is what the oracle checks."""
    from holcstore_spark import ChunkStoreConfig
    from holcstore_spark.sources.chunk_store import ChunkStore

    path = tempfile.mkdtemp(prefix="holc_txn_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        store = ChunkStore(
            spark, path,
            ChunkStoreConfig(keys=("user_id",), freq="1h", tz="UTC",
                             chunk_axis=("year", "month"),
                             key_types={"user_id": "int"}, acid=True),
        )
        ev = _hourly_events(spark, sf_dir)
        batches = [ev.filter(F.col("user_id") % 2 == m) for m in (0, 1)]
        for v, b in enumerate(batches):
            store.ingest_long(b, mode="insert", txn_app="q_sink",
                              txn_version=v)
            # crash-replay of the batch just committed: must no-op
            store.ingest_long(b, mode="insert", txn_app="q_sink",
                              txn_version=v)
        assert store.last_txn_version("q_sink") == 1
        marked = [r for r in store.history().collect()
                  if r["txn_app"] == "q_sink"]
        assert sorted(r["txn_version"] for r in marked) == [0, 1], marked
        got = store.alive_data().filter(F.col("value").isNotNull())
        out = got.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_points"),
            _dec_sum(F.col("value"), 2).alias("total"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def q_stream_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 7: the STREAMING change-data-capture source
    (streaming/cdf_source.py — PySpark Python Data Source API over the
    transaction log; offsets are commit versions). A real readStream
    starting at the pre-patch version flows the manifest diff through a
    parquet sink; the file-level feed legitimately carries matched
    no-op delete+insert pairs for copy-on-write bystander rows, so the
    consumer-side ``net_changes`` (the library's retract-then-upsert
    helper, round 9) must net to EXACTLY the batch ``changes_between``
    delta — same oracle as ``store_cdf``."""
    from holcstore_spark.streaming.cdf_source import (
        ChunkStoreChangesDataSource,
        net_changes,
    )

    try:
        spark.dataSource.register(ChunkStoreChangesDataSource)
    except Exception:
        pass  # already registered in this session
    store, path = _make_event_store(spark, sf_dir, acid=True)
    sink = tempfile.mkdtemp(prefix="holc_cdfsink_")
    ckpt = tempfile.mkdtemp(prefix="holc_cdfck_")
    try:
        v1 = store._txlog.snapshot().version
        patch = _hourly_events(spark, sf_dir).filter(
            (F.col("ts") >= "2024-01-10") & (F.col("ts") < "2024-01-15")
        ).withColumn("value", F.col("value") * 2)
        store.ingest_long(patch, mode="update")
        feed = (
            spark.readStream.format("holc-changes")
            .option("path", path).option("startingVersion", str(v1)).load()
        )
        q = (
            feed.writeStream.format("parquet").option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        _await_stream(q, 300)
        raw = spark.read.parquet(sink)
        net = (
            net_changes(raw)
            .withColumnRenamed("_change_type", "change_type")
            .filter(F.col("value").isNotNull())
        )
        out = net.groupBy("user_id", "change_type").agg(
            F.count(F.lit(1)).alias("n_changed"),
            _dec_sum(F.col("value"), 2).alias("total"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(sink, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def q_store_update_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4/S9 via ingest_long(update): a doubled mid-January patch wins over
    the original; original fills everything else — per-user exact totals."""
    store, path = _make_event_store(spark, sf_dir)
    try:
        patch = _hourly_events(spark, sf_dir).filter(
            (F.col("ts") >= "2024-01-10") & (F.col("ts") < "2024-01-15")
        ).withColumn("value", F.col("value") * 2)
        store.ingest_long(patch, mode="update")
        got = store.alive_data().filter(F.col("value").isNotNull())
        out = got.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_points"),
            _dec_sum(F.col("value"), 2).alias("total"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def q_store_delete_tombstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12/P4: tombstone every 5th user; deleted series must disappear from
    reads while the remaining per-user counts are untouched."""
    store, path = _make_event_store(spark, sf_dir)
    try:
        # modulo-cohort delete: no driver-side key-catalog collect
        store.delete({"user_id__mod": (5, 0)})
        got = store.alive_data().filter(F.col("value").isNotNull())
        out = got.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_points"))
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def q_store_max_horodate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 grouped (round 6): latest non-NaN timestamp PER USER via
    ``get_max_horodates`` — the WHOLE catalog in one tail-chunk-pruned
    scan instead of one aggregate job per key (the reference calls
    get_max_horodate in loops, chunk_timeserie_store.py:519-539; the old
    per-key path capped this query at 20 users for exactly that reason).
    Grid padding NULLs must still be ignored per key."""
    store, path = _make_event_store(spark, sf_dir)
    try:
        out = store.get_max_horodates().select(
            "user_id",
            F.date_format("max_ts", "yyyy-MM-dd HH:mm:ss").alias("max_ts"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def q_store_yield_many(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: the ordered streaming read — every yielded series re-aggregated
    must reproduce the source exactly."""
    import pandas as pd

    store, path = _make_event_store(spark, sf_dir)
    try:
        rows = []
        for s, key in store.yield_many_ts():
            valid = s.dropna()
            rows.append((
                int(key["user_id"]),
                int(len(valid)),
                valid.index.min().tz_convert("UTC").strftime("%Y-%m-%d %H:%M:%S"),
                valid.index.max().tz_convert("UTC").strftime("%Y-%m-%d %H:%M:%S"),
            ))
        out = spark.createDataFrame(
            pd.DataFrame(rows, columns=["user_id", "n_points", "first_ts", "last_ts"]),
            schema="user_id long, n_points long, first_ts string, last_ts string",
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def q_store_get_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/S4 batched (round 5): ``get_many_ts(list)`` answers N keyed
    range reads in ONE pruned Spark job (929→104 ms/key on H1); every
    returned series re-aggregated must equal the source events inside
    the requested range — same per-key semantics as sequential get_ts."""
    import pandas as pd

    store, path = _make_event_store(spark, sf_dir)
    try:
        # request-sized collect only: the __mod cohort predicate prunes
        # Spark-side, so the driver never materializes the key catalog
        # (a batched point-read's request list is inherently
        # driver-held; the catalog is not). Capped so cohort selectivity
        # drifting at larger SFs fails loudly instead of ballooning the
        # driver list (VERDICT r10 harness nit).
        _REQUEST_CAP = 5_000
        user_rows = (
            store.alive_chunks({"user_id__mod": (3, 0)})
            .select("user_id").distinct().limit(_REQUEST_CAP + 1).collect()
        )
        if len(user_rows) > _REQUEST_CAP:  # not assert: -O must not strip it
            raise ValueError(
                f"__mod cohort grew past the request cap ({_REQUEST_CAP}); "
                "tighten the modulus for this SF"
            )
        users = sorted(r[0] for r in user_rows)
        asked = [{"user_id": int(u)} for u in users]
        got = store.get_many_ts(asked, start="2024-01-05", end="2024-01-20")
        rows = []
        for (uid,), s in sorted(got.items()):
            valid = s.dropna()
            rows.append((
                int(uid),
                int(len(valid)),
                valid.index.min().tz_convert("UTC").strftime("%Y-%m-%d %H:%M:%S"),
                valid.index.max().tz_convert("UTC").strftime("%Y-%m-%d %H:%M:%S"),
            ))
        out = spark.createDataFrame(
            pd.DataFrame(rows, columns=["user_id", "n_points", "first_ts", "last_ts"]),
            schema="user_id long, n_points long, first_ts string, last_ts string",
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def q_attr_store_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/S8/M3 end-to-end (round 6: bulk path): AttrStore ``set_many_ts``
    batched insert + batched update(combine_first) + partial-attrs read —
    TWO Spark writes for all 10 groups instead of a driver-paced set_ts
    loop. Users bucket into 10 groups; each group's hourly max series is
    written, then doubled mid-month patches are applied in one
    ``set_many_ts(update=True)`` (new wins, old fills holes)."""
    import pandas as pd

    from holcstore_spark.sources.attr_store import AttrStore

    d = _t(spark, sf_dir, "events").withColumn(
        "grp", (F.col("user_id") % 10).cast("long")
    )
    hourly = d.groupBy("grp", F.date_trunc("hour", "ts").alias("hts")).agg(
        F.max("value").alias("v")
    )
    pdf = hourly.toPandas()
    path = tempfile.mkdtemp(prefix="holc_attr_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        store = AttrStore(spark, path, keys=("grp", "kind"), tz="UTC",
                          acid=_acid_default())
        base, patches = {}, {}
        for grp, g in pdf.groupby("grp"):
            s = pd.Series(
                g["v"].to_numpy(),
                index=pd.DatetimeIndex(pd.to_datetime(g["hts"], utc=True)),
            ).sort_index()
            base[(str(int(grp)), "load")] = s
            patch = (s[(s.index >= "2024-01-10") & (s.index < "2024-01-15")] * 2)
            if len(patch):
                patches[(str(int(grp)), "load")] = patch
        store.set_many_ts(base)
        if patches:
            store.set_many_ts(patches, update=True)
        rows = []
        for entry in store.get_ts({"kind": "load"}):  # partial attrs: all groups
            s = entry["data"]
            rows.append((
                int(entry["grp"]),
                int(s.notna().sum()),
                float(s.index.min().timestamp()),
                float(s.index.max().timestamp()),
            ))
        out = spark.createDataFrame(
            pd.DataFrame(rows, columns=["grp", "n_points", "first_epoch", "last_epoch"]),
            schema="grp long, n_points long, first_epoch double, last_epoch double",
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def q_kv_find_holes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/W3 through the real KeyValueStore: daily series per user (missing
    days = holes) written via one bulk set_many_lc, then find_holes over a
    fixed window."""
    import pandas as pd

    from holcstore_spark.sources.kv_store import KeyValueStore

    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.max("value").alias("v")).toPandas()
    path = tempfile.mkdtemp(prefix="holc_kvh_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        kv = KeyValueStore(spark, path, acid=_acid_default())
        batch = {}
        for uid, g in daily.groupby("user_id"):
            # keep only even-valued days? no — drop days where floor(v) % 3 == 0
            # to guarantee some holes, deterministically
            keep = g[(g["v"].astype(int) % 3) != 0]
            if len(keep) == 0:
                continue
            batch[str(uid)] = pd.Series(
                keep["v"].to_numpy(),
                index=pd.DatetimeIndex(pd.to_datetime(keep["day"], utc=True)),
            ).sort_index()
        kv.set_many_lc(batch, client_id=1)
        rows = []
        for prm, holes in kv.find_holes(
            sorted(batch), 1, "2024-01-01", "2024-01-30", freq="1D"
        ):
            for r in holes:
                rows.append((
                    int(prm),
                    r.sd.strftime("%Y-%m-%d %H:%M:%S"),
                    r.ed.strftime("%Y-%m-%d %H:%M:%S"),
                ))
        out = spark.createDataFrame(
            pd.DataFrame(rows, columns=["user_id", "hole_start", "hole_end"]),
            schema="user_id long, hole_start string, hole_end string",
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def q_sync_pull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1/C2/C4/S14/S15 end-to-end: server→client pull over the change
    feed; the client replica must reproduce the server's data exactly."""
    from holcstore_spark import ChunkStoreConfig
    from holcstore_spark.sources.chunk_store import ChunkStore
    from holcstore_spark.streaming.sync import SyncClient

    base = tempfile.mkdtemp(prefix="holc_sync_")
    shutil.rmtree(base, ignore_errors=True)
    cfg = ChunkStoreConfig(keys=("user_id",), freq="1h", tz="UTC",
                           chunk_axis=("year", "month"), allow_sync=True,
                           key_types={"user_id": "int"},
                             acid=_acid_default())
    try:
        server = ChunkStore(spark, os.path.join(base, "server"), cfg)
        client = ChunkStore(spark, os.path.join(base, "client"), cfg)
        server.ingest_long(_hourly_events(spark, sf_dir), mode="update")
        SyncClient(server, client).pull(page_size=500)
        got = client.alive_data().filter(F.col("value").isNotNull())
        out = got.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_points"),
            _dec_sum(F.col("value"), 2).alias("total"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_rest_sync_pull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3/C5: the HTTP shim end-to-end — server store behind a local REST
    endpoint, client pulls over urllib with retry/backoff; the replica must
    reproduce the server's data exactly (reference:
    hostore/utils/ts_sync.py:60-165, 264-296)."""
    import threading

    from holcstore_spark import ChunkStoreConfig
    from holcstore_spark.sources.chunk_store import ChunkStore
    from holcstore_spark.streaming.rest_sync import RestSyncClient, make_sync_server

    base = tempfile.mkdtemp(prefix="holc_rest_")
    shutil.rmtree(base, ignore_errors=True)
    cfg = ChunkStoreConfig(keys=("user_id",), freq="1h", tz="UTC",
                           chunk_axis=("year", "month"), allow_sync=True,
                           key_types={"user_id": "int"},
                             acid=_acid_default())
    srv = None
    try:
        server = ChunkStore(spark, os.path.join(base, "server"), cfg)
        client = ChunkStore(spark, os.path.join(base, "client"), cfg)
        server.ingest_long(_hourly_events(spark, sf_dir), mode="update")
        srv = make_sync_server(server)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        endpoint = f"http://127.0.0.1:{srv.server_address[1]}"
        RestSyncClient(endpoint, client).pull(page_size=100)
        got = client.alive_data().filter(F.col("value").isNotNull())
        out = got.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_points"),
            _dec_sum(F.col("value"), 2).alias("total"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        if srv is not None:
            srv.shutdown()
        shutil.rmtree(base, ignore_errors=True)


def q_admin_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13: the CSV/ZIP admin sink — export a filtered store to the golden
    zip format (one export_serie_{i}.csv per series + content_summary.csv,
    ';'-separated, reference: hostore/admin_actions.py:39-124), then parse
    the ZIP BACK and re-aggregate: filename↔key mapping, per-file row
    counts and exact totals must all match the source events."""
    import io
    import zipfile

    import pandas as pd

    from holcstore_spark.edge.admin_export import export_chunk_store

    store, path = _make_event_store(spark, sf_dir)
    try:
        blob = export_chunk_store(store, filters={"user_id__lt": 40})
        zf = zipfile.ZipFile(io.BytesIO(blob))
        summary = pd.read_csv(
            io.BytesIO(zf.read("content_summary.csv")), sep=";", index_col=0
        )
        rows = []
        for r in summary.itertuples():
            csv = pd.read_csv(io.BytesIO(zf.read(r.filename)), sep=";", index_col=0)
            for v in csv["data"].dropna():
                rows.append((r.filename, int(r.user_id), float(v)))
        long = spark.createDataFrame(
            pd.DataFrame(rows, columns=["filename", "user_id", "value"]),
            schema="filename string, user_id long, value double",
        )
        out = long.groupBy("filename", "user_id").agg(
            F.count(F.lit(1)).alias("n_points"),
            _dec_sum(F.col("value"), 2).alias("total"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def q_stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming end-to-end, oracle-checked: events flow through
    a real readStream (availableNow) into the watermarked windowed-rollup
    operator; the streamed result must equal the batch GROUP BY exactly.
    Only order-independent aggregates are emitted (count/min/max +
    DECIMAL-exact total) so the comparison is bit-stable."""
    from holcstore_spark.streaming.ingest import windowed_rollup

    src = tempfile.mkdtemp(prefix="holc_stream_src_")
    ckpt = tempfile.mkdtemp(prefix="holc_stream_ckpt_")
    name = "stream_rollup_sink"
    try:
        # re-materialize with micro timestamps: the streaming reader has no
        # nanos fallback
        (
            _t(spark, sf_dir, "events")
            .select("user_id", "ts", "value")
            .write.mode("overwrite").parquet(src)
        )
        stream = spark.readStream.schema(
            "user_id long, ts timestamp, value double"
        ).parquet(src)
        roll = windowed_rollup(
            stream, ("user_id",), window="1 hour", watermark="2 hours",
            exact_total=True,
        )
        q = (
            roll.writeStream.outputMode("complete")
            .format("memory").queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_stream(q, 300)
        out = spark.table(name).select(
            "user_id",
            _fmt("window_start").alias("window_start"),
            _fmt("window_end").alias("window_end"),
            "n",
            F.col("sum_value").alias("total"),
            F.col("min_value").alias("vmin"),
            F.col("max_value").alias("vmax"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(name) if name in [
            t.name for t in spark.catalog.listTables()
        ] else None
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window streaming rollup, oracle-checked: events flow
    through a real readStream (availableNow) into windowed_rollup with
    window=2h slide=1h — every event lands in exactly two windows; the
    streamed result must equal the batch sliding-window SQL exactly
    (order-independent aggregates only)."""
    from holcstore_spark.streaming.ingest import windowed_rollup

    src = tempfile.mkdtemp(prefix="holc_slide_src_")
    ckpt = tempfile.mkdtemp(prefix="holc_slide_ckpt_")
    name = "stream_sliding_sink"
    try:
        (
            _t(spark, sf_dir, "events")
            .select("event_type", "ts", "value")
            .write.mode("overwrite").parquet(src)
        )
        stream = spark.readStream.schema(
            "event_type string, ts timestamp, value double"
        ).parquet(src)
        roll = windowed_rollup(
            stream, ("event_type",), window="2 hours", slide="1 hour",
            watermark="4 hours", exact_total=True,
        )
        q = (
            roll.writeStream.outputMode("complete")
            .format("memory").queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_stream(q, 300)
        out = spark.table(name).select(
            "event_type",
            _fmt("window_start").alias("window_start"),
            "n",
            F.col("sum_value").alias("total"),
            F.col("min_value").alias("vmin"),
            F.col("max_value").alias("vmax"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(name) if name in [
            t.name for t in spark.catalog.listTables()
        ] else None
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def q_stream_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator, oracle-checked: per-user gap
    detection through a real applyInPandasWithState stream (availableNow,
    O(keys) state = last-seen timestamp). The source is a single parquet
    file so the run is one micro-batch and the emitted holes must equal
    the batch lag-window SQL exactly."""
    from holcstore_spark.streaming.stateful import stream_gap_detect

    src = tempfile.mkdtemp(prefix="holc_gaps_src_")
    ckpt = tempfile.mkdtemp(prefix="holc_gaps_ckpt_")
    name = "stream_gaps_sink"
    try:
        (
            _t(spark, sf_dir, "events")
            .select("user_id", "ts")
            .coalesce(1)
            .write.mode("overwrite").parquet(src)
        )
        stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
        gaps = stream_gap_detect(
            stream, ("user_id",), freq_seconds=3600, watermark="2 hours"
        )
        q = (
            gaps.writeStream.outputMode("append")
            .format("memory").queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_stream(q, 300)
        out = spark.table(name).select(
            "user_id",
            F.unix_micros("hole_start").alias("hole_start_us"),
            F.unix_micros("hole_end").alias("hole_end_us"),
            "gap_seconds",
        )
        return out.localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(name) if name in [
            t.name for t in spark.catalog.listTables()
        ] else None
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def _daily_events_pdf(spark: SparkSession, sf_dir: str):
    """Deterministic daily series per user (max aggregation) as pandas."""
    import pandas as pd

    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.max("value").alias("v"))
        .toPandas()
    )
    daily["day"] = pd.to_datetime(daily["day"], utc=True)
    return daily


def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time session windows through a real Structured Streaming run
    (availableNow, one micro-batch): per user, events closer than 2h merge
    into one session closing at last_event + 2h. The streamed sessions
    must equal the batch lag/cumsum sessionization exactly."""
    from holcstore_spark.streaming.ingest import session_rollup

    src = tempfile.mkdtemp(prefix="holc_sess_src_")
    ckpt = tempfile.mkdtemp(prefix="holc_sess_ckpt_")
    name = "stream_sessions_sink"
    try:
        (
            _t(spark, sf_dir, "events")
            .select("user_id", "ts", "value")
            .coalesce(1)
            .write.mode("overwrite").parquet(src)
        )
        stream = spark.readStream.schema(
            "user_id long, ts timestamp, value double"
        ).parquet(src)
        sess = session_rollup(
            stream, ("user_id",), gap="2 hours", watermark="4 hours",
            exact_total=True,
        )
        q = (
            sess.writeStream.outputMode("complete")
            .format("memory").queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_stream(q, 300)
        out = spark.table(name).select(
            "user_id",
            _fmt("session_start").alias("session_start"),
            _fmt("session_end").alias("session_end"),
            "n",
            F.col("sum_value").alias("total"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        if name in [t.name for t in spark.catalog.listTables()]:
            spark.catalog.dropTempView(name)
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup with bounded state: the events table is
    doubled, streamed through dropDuplicatesWithinWatermark on event_id,
    and the surviving rows must equal the original (un-doubled) table —
    duplicate rows are byte-identical, so first-arrival semantics are
    deterministic."""
    from holcstore_spark.streaming.ingest import stream_dedup

    src = tempfile.mkdtemp(prefix="holc_sdedup_src_")
    ckpt = tempfile.mkdtemp(prefix="holc_sdedup_ckpt_")
    name = "stream_dedup_sink"
    try:
        e = _t(spark, sf_dir, "events").select(
            "event_id", "user_id", "ts", "value"
        )
        e.unionByName(e).coalesce(1).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, value double"
        ).parquet(src)
        deduped = stream_dedup(stream, ("event_id",), watermark="2 hours")
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory").queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_stream(q, 300)
        out = spark.table(name).select(
            "event_id", "user_id", _fmt("ts").alias("ts"), "value"
        )
        return out.localCheckpoint(eager=True)
    finally:
        if name in [t.name for t in spark.catalog.listTables()]:
            spark.catalog.dropTempView(name)
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def q_stream_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 15 (VERDICT r14 ask #4): the END-TO-END streaming
    training-data ingest — every stage a proven piece, composed into
    ONE foreachBatch body over two deterministic micro-batches
    (maxFilesPerTrigger=1, mtime-ordered files; batch 0 = doc_id%3!=0,
    batch 1 = doc_id%3==0, dup-injected corpus):

    1. near-dup gate vs the persisted BandIndex (dedup_incremental
       semantics: drop on a band bucket shared with kept history or a
       lower-id batch doc; kept docs' bands appended exactly once);
    2. quality gates — the Gopher rules that are non-degenerate on
       this synthetic corpus (word count, mean word length, symbol
       ratio, alpha words; the stopword rule would gate out ALL docs —
       the vocabulary has no English stopwords — and c4_keep's
       sentence rule likewise passes zero docs, so the C4 page rules
       used are the lorem-ipsum and brace checks);
    3. GramIndex ingest (span-dedup history) and LexicalIndex ingest
       (BM25 postings) of the surviving docs, each committing with
       (txn_app, txn_version=batch_id);
    4. per-batch output partition written mode=overwrite (idempotent
       under replay).

    The query then simulates the WORST crash — the sink checkpoint is
    DELETED and the whole stream re-run — and asserts all three index
    logs gained zero commits (the Delta-style txn watermarks skip every
    replayed batch) before returning the surviving corpus with each
    doc's token count read back FROM THE LEXICALINDEX STATE, so the
    oracle (sequential two-batch dedup + the same gates in SQL) checks
    the pipeline's persisted outcome, not an in-memory intermediate."""
    import shutil
    import time

    from holcstore_spark.operators.text import c4_rules, gopher_rules
    from holcstore_spark.sources.band_index import BandIndex
    from holcstore_spark.sources.gram_index import GramIndex
    from holcstore_spark.sources.lexical_index import LexicalIndex

    d = _docs_with_dups(spark, sf_dir).select("doc_id", "source", "text")
    src = tempfile.mkdtemp(prefix="holc_pipe_src_")
    ckpt = tempfile.mkdtemp(prefix="holc_pipe_ckpt_")
    out = tempfile.mkdtemp(prefix="holc_pipe_out_")
    bpath = tempfile.mkdtemp(prefix="holc_pipe_band_")
    gpath = tempfile.mkdtemp(prefix="holc_pipe_gram_")
    lpath = tempfile.mkdtemp(prefix="holc_pipe_lex_")
    for p in (bpath, gpath, lpath):
        shutil.rmtree(p, ignore_errors=True)
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = pa.schema([
            ("doc_id", pa.int64()), ("source", pa.string()),
            ("text", pa.string()),
        ])
        now = time.time()
        for i, batch_pdf in enumerate([
            d.filter(F.col("doc_id") % 3 != 0).toPandas(),
            d.filter(F.col("doc_id") % 3 == 0).toPandas(),
        ]):
            f = os.path.join(src, f"{i:04d}.parquet")
            pq.write_table(
                pa.Table.from_pandas(
                    batch_pdf, schema=schema, preserve_index=False
                ), f,
            )
            # file-source batch order is (mtime, path): pin both
            os.utime(f, (now + 100 * i, now + 100 * i))

        bi = BandIndex(spark, bpath)
        gi = GramIndex(spark, gpath, k=8)
        li = LexicalIndex(spark, lpath)
        gate = (
            "rule_word_count AND rule_mean_word_len AND "
            "rule_symbol_ratio AND rule_alpha_words"
        )

        def body(batch: DataFrame, batch_id: int) -> None:
            kept = bi.ingest(batch, txn_app="pipe", txn_version=batch_id)
            g = gopher_rules(kept).filter(gate).select(*kept.columns)
            g = (
                c4_rules(g)
                .filter("NOT has_lorem_ipsum AND NOT has_brace")
                .select(*kept.columns)
            )
            from holcstore_spark.sources.io_util import (
                overlap_jobs,
                release_local_checkpoint,
                safe_local_checkpoint,
            )

            g = safe_local_checkpoint(g)  # feeds three consumers
            try:
                # the three consumers are independent (distinct indexes /
                # output dir, all reading the checkpointed g): run them
                # concurrently so batch latency is ~max, not the sum
                # (guide §2.6) — commits, kept sets and replay semantics
                # are unchanged, each ingest still lands its own
                # (txn_app, batch_id) watermark exactly once
                overlap_jobs(
                    spark,
                    lambda: gi.ingest(g, txn_app="pipe",
                                      txn_version=batch_id),
                    lambda: li.ingest(g, txn_app="pipe",
                                      txn_version=batch_id),
                    lambda: (
                        g.select("doc_id", "source")
                        .withColumn("batch", F.lit(batch_id).cast("long"))
                        .coalesce(1).write.mode("overwrite")
                        .parquet(os.path.join(out, f"b{batch_id}"))
                    ),
                )
            finally:
                release_local_checkpoint(g)

        def run_stream():
            stream = (
                spark.readStream
                .schema("doc_id long, source string, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            q = (
                stream.writeStream.foreachBatch(body)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            _await_stream(q, 600)

        run_stream()
        versions = tuple(
            ix._txlog.snapshot().version for ix in (bi, gi, li)
        )
        # worst-case crash: the checkpoint is GONE; every batch replays
        shutil.rmtree(ckpt)
        run_stream()
        replayed = tuple(
            ix._txlog.snapshot().version for ix in (bi, gi, li)
        )
        if replayed != versions:
            raise AssertionError(
                f"checkpoint-loss replay committed: {versions} -> "
                f"{replayed}"
            )
        meta = spark.read.parquet(
            os.path.join(out, "b0"), os.path.join(out, "b1")
        )
        res = meta.join(li.doc_lengths(), on="doc_id", how="inner").select(
            "doc_id", "source", "batch",
            F.col("dl").alias("n_tokens"),
        )
        return res.localCheckpoint(eager=True)
    finally:
        for p in (src, ckpt, out, bpath, gpath, lpath):
            shutil.rmtree(p, ignore_errors=True)


def q_store_set_many(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10: mass insert via set_many_ts (single batched write, one
    existence check for the whole batch) — per-key counts and exact totals
    read back through the tombstone-aware reader."""
    import pandas as pd

    from holcstore_spark import ChunkStoreConfig
    from holcstore_spark.sources.chunk_store import ChunkStore

    daily = _daily_events_pdf(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="holc_smany_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        store = ChunkStore(
            spark, path,
            ChunkStoreConfig(keys=("user_id",), freq="1D", tz="UTC",
                             chunk_axis=("year", "month"),
                             key_types={"user_id": "int"},
                             acid=_acid_default()),
        )
        mapping = {}
        for uid, g in daily.groupby("user_id"):
            mapping[(int(uid),)] = pd.Series(
                g["v"].to_numpy(), index=pd.DatetimeIndex(g["day"])
            ).sort_index()
        store.set_many_ts(mapping)
        got = store.alive_data().filter(F.col("value").isNotNull())
        out = got.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_points"),
            _dec_sum(F.col("value"), 2).alias("total"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def q_kv_clear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11/A1: clear by prm list + clear_all by client; survivors re-read
    and the public count() (A1) embedded per row
    (reference: hostore.py:39-43, 396-432)."""
    import pandas as pd

    from holcstore_spark.sources.kv_store import KeyValueStore

    daily = _daily_events_pdf(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="holc_kvclear_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        kv = KeyValueStore(spark, path, acid=_acid_default())
        batch = {}
        for uid, g in daily.groupby("user_id"):
            batch[str(int(uid))] = pd.Series(
                g["v"].to_numpy(), index=pd.DatetimeIndex(g["day"])
            ).sort_index()
        kv.set_many_lc(batch, client_id=1)
        kv.set_many_lc(batch, client_id=2)
        kv.clear([p for p in batch if int(p) % 3 == 0], client_id=1)
        kv.clear_all(client_id=2)
        per_prm = (
            kv.df()
            .groupBy("client_id", "prm")
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .withColumn("user_id", F.col("prm").cast("long"))
            .drop("prm")
        )
        counts = spark.createDataFrame(
            pd.DataFrame({"client_id": [1, 2],
                          "n_series": [kv.count(client_id=1), kv.count(client_id=2)]}),
            schema="client_id long, n_series long",
        )
        out = per_prm.join(F.broadcast(counts), on="client_id")
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def q_kv_acid_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 6: the KV transaction-log backend under the driver gate.
    ``KeyValueStore(acid=True)`` lifecycle — manifest-governed immutable
    files (sources/txlog.py) with client_id as the chunk role and prm as
    the key role: versioned bulk writes plus an overlay patch for even
    users (doubled, with day%3 holes the base must fill on combined
    read), a non-versioned replace chain on a second tenant (*3 then *5;
    replace wins), a scoped clear of every 7th user on tenant 1 that
    must not leak into tenant 2, and a mid-lifecycle vacuum that may
    only reclaim superseded files. Per-day values re-emitted exactly."""
    import pandas as pd

    from holcstore_spark.sources.kv_store import KeyValueStore

    daily = _daily_events_pdf(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="holc_kvacid_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        kv = KeyValueStore(spark, path, acid=True)
        base, patch = {}, {}
        for uid, g in daily.groupby("user_id"):
            g = g.sort_values("day")
            idx = pd.DatetimeIndex(g["day"])
            base[str(int(uid))] = pd.Series(g["v"].to_numpy(), index=idx)
            if int(uid) % 2 == 0:
                v2 = g["v"].to_numpy() * 2.0
                v2[(idx.day % 3) == 0] = float("nan")
                patch[str(int(uid))] = pd.Series(v2, index=idx)
        kv.set_many_lc(base, client_id=1, versionning=True)
        kv.set_many_lc(patch, client_id=1, versionning=True)
        for p in sorted(base, key=int):
            if int(p) % 5 == 0:
                kv.set_lc(p, base[p] * 3.0, client_id=2)
                kv.set_lc(p, base[p] * 5.0, client_id=2)  # replaces v0
        kv.clear([p for p in base if int(p) % 7 == 0], client_id=1)
        kv.vacuum(retention_seconds=0)  # GC superseded files; reads intact
        rows = []
        for cid, prms in (
            (1, [p for p in base if int(p) % 7 != 0]),
            (2, [p for p in base if int(p) % 5 == 0]),
        ):
            got = kv.get_many_lc(prms, client_id=cid)
            for prm, entries in got.items():
                for ts, v in entries[0]["data"].items():
                    rows.append((cid, int(prm),
                                 ts.strftime("%Y-%m-%d %H:%M:%S"),
                                 None if pd.isna(v) else float(v)))
        out = spark.createDataFrame(
            pd.DataFrame(rows, columns=["client_id", "user_id", "ts_str", "val"]),
            schema="client_id long, user_id long, ts_str string, val double",
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def q_sync_tombstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6: tombstones born from replace() propagate through sync — for every
    third user the server replaces a 2-chunk history with its second chunk
    only; after pull the client must show exactly the surviving span
    (reference: chunk_timeserie_store.py:357-370 + ts_sync tombstone path)."""
    from holcstore_spark import ChunkStoreConfig
    from holcstore_spark.sources.chunk_store import ChunkStore
    from holcstore_spark.streaming.sync import SyncClient

    base = tempfile.mkdtemp(prefix="holc_synctomb_")
    shutil.rmtree(base, ignore_errors=True)
    cfg = ChunkStoreConfig(keys=("user_id",), freq="1h", tz="UTC",
                           chunk_axis=("year", "month"), allow_sync=True,
                           key_types={"user_id": "int"},
                             acid=_acid_default())
    try:
        server = ChunkStore(spark, os.path.join(base, "server"), cfg)
        client = ChunkStore(spark, os.path.join(base, "client"), cfg)
        jan = _hourly_events(spark, sf_dir)
        feb = jan.withColumn("ts", F.col("ts") + F.expr("INTERVAL 31 DAYS"))
        server.ingest_long(jan.unionByName(feb), mode="update")
        rep = (
            feb.filter(F.col("user_id") % 3 == 0)
            .withColumn("value", F.col("value") * 3)
        )
        server.ingest_long(rep, mode="replace")
        SyncClient(server, client).pull(page_size=500)
        got = client.alive_data().filter(F.col("value").isNotNull())
        out = got.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_points"),
            _dec_sum(F.col("value"), 2).alias("total"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _make_imported_store(spark: SparkSession, sf_dir: str):
    """Store built via import_chunks with DETERMINISTIC updated_at/op_id
    stamps (import applies the caller's stamps, so the sync watermark and
    change-feed become oracle-checkable; Jan chunk per user, plus a +31-day
    second chunk for even users)."""
    import pandas as pd

    from holcstore_spark import ChunkStoreConfig
    from holcstore_spark.sources.chunk_store import ChunkStore

    path = tempfile.mkdtemp(prefix="holc_import_")
    shutil.rmtree(path, ignore_errors=True)
    store = ChunkStore(
        spark, path,
        ChunkStoreConfig(keys=("user_id",), freq="1h", tz="UTC",
                         chunk_axis=("year", "month"),
                         key_types={"user_id": "int"},
                             acid=_acid_default()),
    )
    hourly = _hourly_events(spark, sf_dir).toPandas()
    hourly["ts"] = pd.to_datetime(hourly["ts"], utc=True)
    feb = hourly[hourly["user_id"] % 2 == 0].copy()
    feb["ts"] = feb["ts"] + pd.Timedelta(days=31)
    data = pd.concat([hourly, feb], ignore_index=True)
    local = data["ts"]
    data["chunk_index"] = (local.dt.year * 12 + local.dt.month - 1).astype("int32")
    meta = (
        data.groupby(["user_id", "chunk_index"], as_index=False)
        .agg(start_ts=("ts", "min"), n_points=("ts", "count"))
    )
    meta["updated_at"] = (
        pd.Timestamp("2024-06-01", tz="UTC")
        + pd.to_timedelta(meta["user_id"] % 7, unit="D")
    )
    meta["op_id"] = meta["user_id"] * 1000 + meta["chunk_index"]
    meta["is_deleted"] = False
    store.import_chunks(meta, data[["user_id", "ts", "value", "chunk_index"]])
    return store, path


def q_store_meta_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/A3: count per filter, max alive chunk_index, max watermark —
    the three metadata aggregates through their public APIs, oracle-checked
    via deterministic import stamps (reference: hostore.py:39-43,
    chunk_timeserie_store.py:288-307, 531)."""
    import pandas as pd

    store, path = _make_imported_store(spark, sf_dir)
    try:
        # the sort+limit runs Spark-side: the driver collects exactly
        # the 20 probed users, never the key catalog
        users = [
            int(r[0]) for r in
            store.alive_chunks().select("user_id").distinct()
            .orderBy("user_id").limit(20).collect()
        ]
        n_keys = store.count_keys()
        rows = []
        for u in users:
            rows.append((
                int(u),
                store.count_chunks({"user_id": u}),
                int(store.last_chunk_index({"user_id": u})),
                store.last_updated_at({"user_id": u}).strftime("%Y-%m-%d %H:%M:%S"),
                n_keys,
            ))
        out = spark.createDataFrame(
            pd.DataFrame(rows, columns=["user_id", "n_chunks", "last_chunk",
                                        "last_up", "n_keys"]),
            schema="user_id long, n_chunks long, last_chunk long, "
                   "last_up string, n_keys long",
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def q_store_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/P7/O3: watermark-filtered change feed, metadata-only projection,
    deterministic order with Spark-side offset/limit pagination
    (reference: chunk_timeserie_store.py:545-607)."""
    import pandas as pd

    store, path = _make_imported_store(spark, sf_dir)
    try:
        page = store.list_updates(since="2024-06-04", limit=40, offset=10)
        page["start_ts"] = pd.to_datetime(page["start_ts"], utc=True)
        page["updated_at"] = pd.to_datetime(page["updated_at"], utc=True)
        rows = [
            (
                int(r.user_id),
                int(r.chunk_index),
                int(r.n_points),
                r.start_ts.strftime("%Y-%m-%d %H:%M:%S"),
                r.updated_at.strftime("%Y-%m-%d %H:%M:%S"),
            )
            for r in page.itertuples()
        ]
        out = spark.createDataFrame(
            pd.DataFrame(rows, columns=["user_id", "chunk_index", "n_points",
                                        "start_ts", "updated_at"]),
            schema="user_id long, chunk_index long, n_points long, "
                   "start_ts string, updated_at string",
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def q_sync_paged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3/O4 keyset pagination (round 6): page the whole change feed with
    ``list_updates(after=cursor)`` — with a WRITE landing mid-pagination —
    and reassemble. Keyset cursors are stable under concurrent server
    writes (re-stamped rows move to the feed's end; an OFFSET pager would
    skip or double-read rows instead — reference pager:
    chunk_timeserie_store.py:567-607). The query asserts the keyset
    invariant (no (key, chunk, op_id) row read twice) and returns the
    deduped latest state per user, which is deterministic regardless of
    where the page boundary fell."""
    import pandas as pd

    store, path = _make_imported_store(spark, sf_dir)
    try:
        jan_chunk = 2024 * 12 + 1 - 1  # chunk_index of Jan-2024 (year*12+month-1)
        pages, cursor, wrote = [], None, False
        while True:
            page = store.list_updates(limit=25, after=cursor)
            if len(page) == 0:
                break
            pages.append(page)
            last = page.iloc[-1]
            cursor = {
                "updated_at": last["updated_at"],
                "user_id": int(last["user_id"]),
                "chunk_index": int(last["chunk_index"]),
            }
            if not wrote:
                wrote = True
                # mid-pagination write: tombstone the Jan chunk of every
                # user_id % 10 == 3 user with a stamp LATER than every
                # import stamp — the re-stamped rows must surface in the
                # remaining pages, never disturbing pages already read
                victims = sorted(
                    int(u)
                    for u in store.alive_chunks()
                    .select("user_id").distinct().toPandas()["user_id"]
                    if u % 10 == 3
                )
                tomb = pd.DataFrame(
                    {
                        "user_id": victims,
                        "chunk_index": [jan_chunk] * len(victims),
                        "start_ts": [pd.NaT] * len(victims),
                        "n_points": [0] * len(victims),
                        "updated_at": [pd.Timestamp("2024-07-01", tz="UTC")]
                        * len(victims),
                        "op_id": [100_000_000 + u for u in victims],
                        "is_deleted": [True] * len(victims),
                    }
                )
                store.import_chunks(
                    tomb,
                    pd.DataFrame(columns=["user_id", "ts", "value", "chunk_index"]),
                )
        feed = pd.concat(pages, ignore_index=True)
        dup = feed.duplicated(["user_id", "chunk_index", "op_id"])
        if dup.any():
            raise AssertionError(
                f"keyset pager re-read {int(dup.sum())} feed rows"
            )
        latest = (
            feed.sort_values("op_id")
            .groupby(["user_id", "chunk_index"], as_index=False)
            .tail(1)
            .copy()
        )
        latest["updated_at"] = pd.to_datetime(latest["updated_at"], utc=True)
        latest["alive_i"] = (~latest["is_deleted"]).astype(int)
        latest["tomb_i"] = latest["is_deleted"].astype(int)
        latest["pts"] = latest["n_points"].where(~latest["is_deleted"], 0)
        g = (
            latest.groupby("user_id", as_index=False)
            .agg(
                n_alive=("alive_i", "sum"),
                n_tomb=("tomb_i", "sum"),
                total_points=("pts", "sum"),
                last_up=("updated_at", "max"),
            )
        )
        g["last_up"] = g["last_up"].dt.strftime("%Y-%m-%d %H:%M:%S")
        out = spark.createDataFrame(
            g,
            schema="user_id long, n_alive long, n_tomb long, "
                   "total_points long, last_up string",
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def q_interval_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5/W6: Range intersection (min_delta), overlap/includes and
    requested-minus-available difference over per-user event coverage in
    two probe windows (reference: hostore/utils/range/range.py:17-80)."""
    import pandas as pd

    from holcstore_spark.operators.intervals import Range

    e = _t(spark, sf_dir, "events")
    windows = [
        ("a", "2024-01-08", "2024-01-12"),
        ("b", "2024-01-13", "2024-01-18"),
    ]
    req = Range(pd.Timestamp("2024-01-10 06:00:00", tz="UTC"),
                pd.Timestamp("2024-01-20 00:00:00", tz="UTC"))
    fmt = "%Y-%m-%d %H:%M:%S"
    rows = []
    for wname, lo, hi in windows:
        cov = (
            e.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
            .groupBy("user_id")
            .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
            .toPandas()
        )
        for r in cov.itertuples():
            avail = Range(pd.Timestamp(r.lo, tz="UTC"), pd.Timestamp(r.hi, tz="UTC"))
            inter = req.intersection(avail, min_delta=pd.Timedelta("1D"))
            miss = req.difference_missing(avail, min_delta=pd.Timedelta("12h"))
            rows.append((
                int(r.user_id), wname,
                req.overlap(avail), req.includes(avail),
                inter.sd.strftime(fmt) if inter else None,
                inter.ed.strftime(fmt) if inter else None,
                len(miss),
                miss[0].sd.strftime(fmt) if len(miss) > 0 else None,
                miss[0].ed.strftime(fmt) if len(miss) > 0 else None,
                miss[1].sd.strftime(fmt) if len(miss) > 1 else None,
                miss[1].ed.strftime(fmt) if len(miss) > 1 else None,
            ))
    out = spark.createDataFrame(
        __import__("pandas").DataFrame(
            rows,
            columns=["user_id", "w", "overlaps", "includes", "inter_start",
                     "inter_end", "n_miss", "m1_start", "m1_end", "m2_start",
                     "m2_end"],
        ),
        schema="user_id long, w string, overlaps boolean, includes boolean, "
               "inter_start string, inter_end string, n_miss long, "
               "m1_start string, m1_end string, m2_start string, m2_end string",
    )
    return out.localCheckpoint(eager=True)


def q_freq_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: pandas-frequency normalization (bare alias -> '1'-prefixed) and
    the engine's grid-step arithmetic (reference pd_freq_fix,
    hostore/utils/timeseries.py). Expected values are literals in the
    oracle — the semantic under test IS the mapping."""
    import pandas as pd

    from holcstore_spark.config import _fix_freq

    freqs = ["h", "1h", "15min", "min", "30min", "D", "2D", "W"]
    rows = [
        (f, _fix_freq(f),
         float(pd.to_timedelta(_fix_freq(f)).total_seconds()))
        for f in freqs
    ]
    out = spark.createDataFrame(
        pd.DataFrame(rows, columns=["freq", "fixed", "seconds"]),
        schema="freq string, fixed string, seconds double",
    )
    return out.localCheckpoint(eager=True)


def q_sync_guards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7: sync-safety guards — mutations that would break watermark
    semantics must raise on a sync-enabled store while stamped paths pass
    (reference: chunk_timeserie_store.py:44-47, 337-339, 439-441)."""
    import pandas as pd

    from holcstore_spark import ChunkStoreConfig
    from holcstore_spark.sources.chunk_store import ChunkStore, SyncGuardError

    path = tempfile.mkdtemp(prefix="holc_guard_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        store = ChunkStore(
            spark, path,
            ChunkStoreConfig(keys=("k",), freq="1h", tz="UTC",
                             chunk_axis=("year", "month"), allow_sync=True,
                             key_types={"k": "str"},
                             acid=_acid_default()),
        )
        s = pd.Series([1.0, 2.0],
                      index=pd.date_range("2024-01-01", periods=2, freq="1h",
                                          tz="UTC"))
        rows = []

        def attempt(op, fn):
            try:
                fn()
                rows.append((op, "ok"))
            except SyncGuardError:
                rows.append((op, "SyncGuardError"))

        attempt("set_ts_plain", lambda: store.set_ts({"k": "a"}, s))
        attempt("set_many_ts", lambda: store.set_many_ts({("a",): s}))
        attempt("ingest_insert", lambda: store.ingest_long(
            spark.createDataFrame(pd.DataFrame(
                {"k": ["a"], "ts": [pd.Timestamp("2024-01-01", tz="UTC")],
                 "value": [1.0]})), mode="insert"))
        attempt("set_ts_update", lambda: store.set_ts({"k": "a"}, s, update=True))
        attempt("delete_untracked", lambda: store.delete({"k": "a"},
                                                         keep_tracking=False))
        attempt("delete_tracked", lambda: store.delete({"k": "a"}))
        out = spark.createDataFrame(
            pd.DataFrame(rows, columns=["op", "outcome"]),
            schema="op string, outcome string",
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headline scan-agg (bench q1): grouped pricing summary with exact
    decimal aggregation."""
    l = _t(spark, sf_dir, "lineitem")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,6)"
    )
    return (
        l.filter(F.col("l_shipdate") <= "2024-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity"), 2).alias("sum_qty"),
            _dec_sum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: potential revenue increase from discount removal —
    a pure filtered scan-agg (predicates push to the parquet scan, no
    join, no shuffle beyond the final 1-row aggregate). Exact decimal
    sum of the per-row discount product."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast(
                    "decimal(28,6)"
                )
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders per priority that had at least one
    late-shipping lineitem (ship > order date + 30 days) — the EXISTS
    semi-join plan: equi-key hash semi join with the inequality as the
    join residual, never a row explosion from duplicate lineitems."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-07-01")
    )
    l = _t(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        on=(
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        ),
        how="left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — the GROUP BY … HAVING
    pre-aggregation BEFORE the join (the aggregate shrinks lineitem to
    qualifying orderkeys first, so the orders/customer joins see only
    the tiny surviving set; the big table is never joined raw)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(_dec_sum(F.col("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("order_date"),
            "o_totalprice", "total_qty",
        )
    )


def q_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headline join (bench q3-ish): revenue per order over a broadcast
    customer dim, deterministic top-20."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    rev = (
        l.groupBy("l_orderkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(28,6)"
                )
            ).alias("revenue_dec")
        )
    )
    out = (
        o.join(rev, o.o_orderkey == rev.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .orderBy(F.col("revenue_dec").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )
    return out.select(
        "o_orderkey", "c_name", F.col("revenue_dec").cast("double").alias("revenue")
    )


def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join scan (q5-ish): revenue per region/nation through the
    full dimension chain, small dims broadcast."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(disc).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregate over (event_type, day) — grouping-sets analytics the
    reference has no counterpart for (SURVEY §2.4 notes Spark's cube/rollup
    strictly supersede its aggregation surface)."""
    e = _t(spark, sf_dir, "events")
    d = e.withColumn("day", F.date_format(F.date_trunc("day", "ts"), _FMT))
    return (
        d.cube("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_sum(F.col("value"), 2).alias("total"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("day", F.lit("ALL")).alias("day"),
            "n", "total",
        )
    )


# ---------------------------------------------------------------------------
# LLM-data-pipeline queries (dedup / similarity / text / multimodal)
# ---------------------------------------------------------------------------

def _docs_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + injected duplicates: every 10th doc gets an exact copy,
    every 20th a near-copy (one appended token), both with id+1_000_000."""
    d = _t(spark, sf_dir, "documents")
    exact = d.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    near = (
        d.filter(F.col("doc_id") % 20 == 0)
        .withColumn("doc_id", F.col("doc_id") + 2000000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" zzduplicate")))
    )
    return d.unionByName(exact).unionByName(near)


_DOCS_WITH_DUPS_SQL = """
    SELECT * FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
    FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + 2000000 AS doc_id, text || ' zzduplicate' AS text,
           lang, source, n_chars
    FROM documents WHERE doc_id % 20 = 0
"""

#: shingle construction shared by the minhash oracles (3-token shingles,
#: short docs collapse to one shingle) — mirrors operators.dedup.token_shingles
_SHINGLES_SQL = """
        SELECT doc_id,
               list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                   i -> concat_ws(' ',
                        string_split(text, ' ')[i],
                        string_split(text, ' ')[i+1],
                        string_split(text, ' ')[i+2])
               ) AS sh
        FROM src
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one representative (min doc_id) per content hash;
    per-source counts before/after."""
    from holcstore_spark.operators.dedup import exact_dedup

    d = _docs_with_dups(spark, sf_dir)
    kept = exact_dedup(d, content="text", id_col="doc_id")
    before = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_before"))
    after = kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_after"))
    return before.join(after, on="source")


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs (16 hashes, 4 bands, 3-token shingles):
    banded signature buckets → equi-join, never all-pairs."""
    from holcstore_spark.operators.dedup import minhash_candidate_pairs

    d = _docs_with_dups(spark, sf_dir)
    return minhash_candidate_pairs(
        d, text="text", id_col="doc_id", n_hashes=16, bands=4, shingle_k=3
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: MinHash candidate pairs resolved to connected
    components (transitive closure — A~B~C is ONE cluster even when A and
    C don't collide directly), with cluster sizes."""
    from holcstore_spark.operators.dedup import (
        connected_components,
        minhash_candidate_pairs,
    )

    d = _docs_with_dups(spark, sf_dir)
    pairs = minhash_candidate_pairs(
        d, text="text", id_col="doc_id", n_hashes=16, bands=4, shingle_k=3
    )
    comp = connected_components(pairs)
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(F.broadcast(sizes), on="comp")
        .select(
            F.col("node").alias("doc_id"),
            F.col("comp").alias("cluster_id"),
            "cluster_size",
        )
    )


def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard verification over the LSH candidates only."""
    from holcstore_spark.operators.dedup import (
        jaccard_verify,
        minhash_candidate_pairs,
    )

    d = _docs_with_dups(spark, sf_dir)
    pairs = minhash_candidate_pairs(d, n_hashes=16, bands=4, shingle_k=3)
    return jaccard_verify(pairs, d, shingle_k=3, threshold=0.5)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup clusters; the oracle replicates the 60-bit sign
    hash nibble-by-nibble from the same md5 prefixes."""
    from holcstore_spark.operators.dedup import simhash_groups

    d = _docs_with_dups(spark, sf_dir)
    g = simhash_groups(d)
    return g.filter(F.col("group_size") > 1).select("doc_id", "simhash", "group_size")


def q_dedup_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup survivor selection: MinHash-LSH pairs → connected
    components → one representative per cluster (max n_chars, ties to the
    lowest doc_id), with cluster size and drop count — the keep/drop
    decision that actually ends a dedup pipeline."""
    from holcstore_spark.operators.dedup import (
        cluster_representatives,
        connected_components,
        minhash_candidate_pairs,
    )

    d = _docs_with_dups(spark, sf_dir)
    pairs = minhash_candidate_pairs(
        d, text="text", id_col="doc_id", n_hashes=16, bands=4, shingle_k=3
    )
    comp = connected_components(pairs)
    return cluster_representatives(comp, d, id_col="doc_id", score="n_chars")


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-half quality filter (exact rank mode — integral
    rank semantics for the oracle; the percentile-threshold scale path of
    the same operator is pytest-covered)."""
    from holcstore_spark.operators.text import quality_score, quality_top_fraction

    d = _t(spark, sf_dir, "documents")
    q = quality_score(d).select("doc_id", "lang", "quality")
    return quality_top_fraction(q, 0.5, by="lang", id_col="doc_id")


def q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed cleaning pipeline: quality filter → exact dedup → LSH +
    Jaccard near-dup removal; per-source survivor counts."""
    from holcstore_spark.operators.pipeline import clean_corpus

    d = _docs_with_dups(spark, sf_dir)
    out = clean_corpus(d, min_quality=0.5, jaccard_threshold=0.5)
    return out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_clean"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing rolling-hash fingerprints (k=8 char grams, window 4): per
    document the fingerprint-set size, min/max fingerprint, and an md5
    digest of the full sorted set — the whole set is oracle-checked, not
    just its summary stats."""
    from holcstore_spark.operators.text import winnow_fingerprints_arrow

    d = _t(spark, sf_dir, "documents")
    fps = winnow_fingerprints_arrow("text", k=8, w=4)
    return d.select(
        "doc_id",
        F.size(fps).alias("n_fp"),
        F.array_min(fps).alias("fp_min"),
        F.array_max(fps).alias("fp_max"),
        F.md5(
            F.concat_ws(",", F.transform(fps, lambda x: x.cast("string")))
        ).alias("fp_digest"),
    )


def q_clean_corpus_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaning pipeline with cluster-resolved near-dup removal: one
    survivor (min id) per connected component of verified pairs, instead
    of the legacy pairwise drop."""
    from holcstore_spark.operators.pipeline import clean_corpus

    d = _docs_with_dups(spark, sf_dir)
    out = clean_corpus(
        d, min_quality=0.5, jaccard_threshold=0.5, resolve_clusters=True
    )
    return out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_clean"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every purchase event picks up the user's most recent
    click within 2 h (backward, inclusive). Single-shuffle union+window
    construction — no non-equi join (operators/asof.py)."""
    from holcstore_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        purchases, clicks, on="user_id",
        tolerance_seconds=7200, suffix="_click",
    )
    return out.select(
        "event_id", "user_id",
        F.unix_micros("ts").alias("ts_us"), "value",
        F.unix_micros("ts_click").alias("click_ts_us"),
        F.col("value_click").alias("click_value"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessionization of the event stream (30-min inactivity
    gap) folded to per-session stats — one window shuffle + one agg."""
    from holcstore_spark.operators.sessions import session_stats

    e = _t(spark, sf_dir, "events")
    s = session_stats(
        e, key="user_id", ts="ts", gap_seconds=1800, tiebreak=("event_id",)
    )
    return s.select(
        "user_id", "session_idx",
        F.unix_micros("session_start").alias("start_us"),
        F.unix_micros("session_end").alias("end_us"),
        "n_events", "duration_sec",
    )


def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hourly rollup per event type: count, DECIMAL-
    exact sum, min/max, deterministic first/last by timestamp."""
    from holcstore_spark.operators.resample import time_bucket_rollup

    e = _t(spark, sf_dir, "events")
    r = time_bucket_rollup(e, ("event_type",), 3600.0, ts="ts", value="value")
    return r.select(
        "event_type", F.unix_micros("bucket_ts").alias("bucket_us"),
        "n", "v_sum", "v_min", "v_max", "v_first", "v_last",
    )


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed point-in-interval join: activity within 15 min after
    each error event, aggregated per error. Candidate generation is an
    equi-join on (user, time bucket) — no nested-loop range join."""
    from holcstore_spark.operators.intervals import point_in_interval_join

    e = _t(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("iv_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("end_ts"),
    )
    points = e.filter(F.col("event_type") != "error").select(
        "user_id", "ts", "value"
    )
    j = point_in_interval_join(
        points, errors, on="user_id", bucket_seconds=900
    )
    return j.groupBy("iv_id").agg(
        F.count(F.lit(1)).alias("n_pts"),
        _dec_sum(F.col("value")).alias("v_sum"),
        F.min(F.unix_micros("ts")).alias("first_pt_us"),
    )


def q_similarity_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-3 neighbours for every 500th vector; integer-
    quantized arithmetic makes scores bit-identical across engines."""
    from holcstore_spark.operators.similarity import brute_force_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return brute_force_topk(e, q, k=3)


def _lsh_sign_vectors(n_planes: int, dim: int) -> list[list[int]]:
    """Python twin of similarity.hyperplane_sign's md5-derived ±1 vectors
    (component d of plane p is +1 when md5('p|d') starts with an even hex
    digit) — embedded as literals in the DuckDB oracle."""
    import hashlib

    out = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}|{d}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) % 2 == 0 else -1)
        out.append(row)
    return out


def q_similarity_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH top-3: neighbours searched only inside the
    query's sign bucket (the 100 TB candidate-generation path)."""
    from holcstore_spark.operators.similarity import lsh_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return lsh_topk(e, q, k=3, n_planes=4, dim=64)


def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-3: deterministic integer k-means (16 lists, 2
    Lloyd iterations, lowest-id seeds), candidates partitioned by nearest
    centroid, each query probes its 2 closest lists. Every step is exact
    integer arithmetic, so the DuckDB oracle unrolls the same two
    iterations and matches bit-for-bit."""
    from holcstore_spark.operators.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return ivf_topk(e, q, k=3, n_lists=16, n_probe=2, iters=2)


def q_similarity_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 12: FILTERED ANN — IVF top-3 where the candidate side is
    restricted to ``label IN (2, 5, 7)`` DURING candidate generation
    (ivf_topk(filters=)): the predicate lands below the probe-list join
    and reaches the parquet scan (plan-asserted in tests/test_plans.py),
    so excluded vectors are never assigned, joined, or scored — the
    retrieval-pipeline shape, vs post-filtering which silently returns
    fewer than k rows. Training stays on the full corpus (the index is
    built once; the filter is per-query)."""
    from holcstore_spark.operators.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return ivf_topk(
        e, q, k=3, n_lists=16, n_probe=2, iters=2,
        filters={"label__in": [2, 5, 7]},
    )


def q_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 12: PERSISTED IVF index (sources/vector_index.py
    VectorIndex) — the production ANN shape: train once at first
    append (centroids persisted as a versioned CentroidStore), store
    quantized vectors clustered by list in transaction-log-managed
    files (one per list, so the manifest's per-file list range lets a
    probe read open ONLY the probed lists' files), then search. With
    the whole corpus appended in one batch, training is identical to
    similarity_ivf's (same deterministic k-means, lowest-id seeds), so
    the SAME oracle must hash-match — the persisted path can hide no
    drift."""
    import shutil
    from holcstore_spark.sources.vector_index import VectorIndex

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    path = tempfile.mkdtemp(prefix="holc_vecidx_")
    shutil.rmtree(path, ignore_errors=True)
    vi = VectorIndex(spark, path, n_lists=16, iters=2, dim=64)
    if not vi.append(e, txn_app="entry", txn_version=0):
        raise AssertionError("fresh index refused the append")
    # crash-replay must be refused without changing the result
    if vi.append(e, txn_app="entry", txn_version=0):
        raise AssertionError("replayed append was not skipped")
    return _finish_tmp_index(vi.topk(q, k=3, n_probe=2), path)


def q_ivfpq_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 13: PERSISTED IVF-PQ (sources/vector_index.py
    VectorIndex(pq_m=4)) — the actual 100 TB ANN read path, both
    compressions at once: vectors are clustered by IVF list (manifest
    pruning opens only probed lists' files) AND product-quantized
    (m=4 codes per vector), and ``topk(mode='adc')`` ranks by
    Asymmetric Distance Computation reading ONLY (id, list, pq_code) —
    the dim-sized vec_q column chunks are never touched (plan-asserted
    in tests/test_vector_index.py). With the whole corpus appended in
    one batch, the IVF space and the PQ codebooks train exactly like
    similarity_ivf / pq_topk, so the oracle composes those two verified
    CTE chains with a probe-list restriction — the persisted layout can
    hide no drift. A replayed append is refused in-query."""
    import shutil
    from holcstore_spark.sources.vector_index import VectorIndex

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    path = tempfile.mkdtemp(prefix="holc_ivfpq_")
    shutil.rmtree(path, ignore_errors=True)
    vi = VectorIndex(spark, path, n_lists=16, iters=2, dim=64,
                     pq_m=4, pq_centroids=16)
    if not vi.append(e, txn_app="entry", txn_version=0):
        raise AssertionError("fresh index refused the append")
    if vi.append(e, txn_app="entry", txn_version=0):
        raise AssertionError("replayed append was not skipped")
    return _finish_tmp_index(
        vi.topk(q, k=5, n_probe=2, mode="adc"), path
    )


def q_similarity_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets (all-pairs
    only within buckets); exact integer-quantized scores."""
    from holcstore_spark.operators.similarity import cosine_near_dup_pairs

    e = _t(spark, sf_dir, "embeddings")
    return cosine_near_dup_pairs(e, threshold=0.2, n_planes=6, dim=64)


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 10: SemDeDup-shaped semantic dedup (operators/similarity.py
    semantic_dedup — k-means-cluster the embedding space with the
    deterministic integer trainer shared with IVF, score cosine pairs
    only WITHIN clusters, drop every vector with a lower-id near-dup).
    Returns the kept (vec_id, cluster) rows; the oracle unrolls the
    identical two-iteration k-means in SQL (the similarity_ivf CTEs)
    and applies the same keep rule."""
    from holcstore_spark.operators.similarity import semantic_dedup

    e = _t(spark, sf_dir, "embeddings")
    out = semantic_dedup(e, n_clusters=16, threshold=0.2, iters=2)
    return out.select(F.col("vec_id"), F.col("cluster").cast("int"))


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 11: incremental near-dup dedup against a persisted LSH
    signature index (operators/dedup.py dedup_incremental) — the
    production ingest shape: history (doc_id % 3 != 0) is minhash-banded
    ONCE and stored; the new batch (doc_id % 3 == 0) hashes only itself
    and joins band keys. Dropped iff a band bucket is shared with
    history (history wins) or with a lower-id new doc. The oracle
    replays the identical md5 minhash/banding in SQL and applies the
    same two-sided rule."""
    from holcstore_spark.operators.dedup import (
        dedup_incremental,
        minhash_bands,
    )

    d = _docs_with_dups(spark, sf_dir)
    history = d.filter(F.col("doc_id") % 3 != 0)
    new = d.filter(F.col("doc_id") % 3 == 0)
    index = minhash_bands(history, "text", "doc_id", 16, 4, 3)
    kept = dedup_incremental(new, index, n_hashes=16, bands=4, shingle_k=3)
    return kept.select("doc_id", "source")


def q_dedup_index_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 12: EXACTLY-ONCE managed dedup index under crash replay
    (sources/band_index.py BandIndex) — the history bands are committed
    to a transactional index (txn 0), the new batch is ingested with
    txn_version=1, and then the SAME batch is ingested AGAIN with the
    same txn_version, simulating a foreachBatch retry after checkpoint
    loss. The replay must commit nothing (watermark skip — a duplicated
    band row would silently strengthen drop pressure on future batches)
    and return the IDENTICAL kept set, which is what the oracle checks:
    it computes the SINGLE-application kept set in SQL (the
    dedup_incremental rule), so any replay drift hash-mismatches.
    Idempotence across the replay comes from exclude_self band
    bookkeeping (operators/dedup.py) + Delta-style txn watermarks in
    the commit log (reference parity: the sync client's crash-resume
    contract, ts_sync.py:204-261, applied to the dedup feed)."""
    import shutil
    from holcstore_spark.operators.dedup import minhash_bands
    from holcstore_spark.sources.band_index import BandIndex

    d = _docs_with_dups(spark, sf_dir)
    history = d.filter(F.col("doc_id") % 3 != 0)
    new = d.filter(F.col("doc_id") % 3 == 0)
    path = tempfile.mkdtemp(prefix="holc_bandidx_")
    shutil.rmtree(path, ignore_errors=True)
    idx = BandIndex(spark, path)
    # NOT under a bare assert: -O would strip the whole call
    if not idx.append_bands(
        minhash_bands(history), txn_app="entry", txn_version=0
    ):
        raise AssertionError("fresh index refused the history append")
    first = idx.ingest(new, txn_app="entry", txn_version=1)
    n_first, rows_first = first.count(), idx.df().count()
    replayed = idx.ingest(new, txn_app="entry", txn_version=1)
    if idx.df().count() != rows_first:
        raise AssertionError("replay double-appended index bands")
    if replayed.count() != n_first:
        raise AssertionError("replayed kept set differs from first run")
    return _finish_tmp_index(replayed.select("doc_id", "source"), path)


def q_dedup_index_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 13: REPLAY-SAFE DELETION from the managed dedup index
    (sources/index_base.py ForgetMixin + band_index.py) — the
    takedown / right-to-erasure path: history bands are committed
    (txn 0), then every history doc with doc_id % 10 == 0 (the exact-
    duplicate sources in _docs_with_dups) is FORGOTTEN via delete()
    (a tombstone commit — O(ids), no data rewrite), and the new batch
    is ingested. The oracle computes the kept set with those docs'
    bands REMOVED from history, so it proves the deleted docs no
    longer suppress their new near-duplicates (their +1,000,000 copies
    now survive) while every other suppression still holds. The delete
    is replayed in-query with the same (txn_app, txn_version) and must
    commit nothing — same watermark machinery as the appends
    (reference parity: the stores' soft-delete contract,
    chunk_timeserie_store.py:30-52, applied to the index)."""
    import shutil
    from holcstore_spark.operators.dedup import minhash_bands
    from holcstore_spark.sources.band_index import BandIndex

    d = _docs_with_dups(spark, sf_dir)
    history = d.filter(F.col("doc_id") % 3 != 0)
    new = d.filter(F.col("doc_id") % 3 == 0)
    path = tempfile.mkdtemp(prefix="holc_bandidx_")
    shutil.rmtree(path, ignore_errors=True)
    idx = BandIndex(spark, path)
    if not idx.append_bands(
        minhash_bands(history), txn_app="entry", txn_version=0
    ):
        raise AssertionError("fresh index refused the history append")
    forget = history.filter(F.col("doc_id") % 10 == 0).select("doc_id")
    if not idx.delete(forget, txn_app="forget", txn_version=0):
        raise AssertionError("fresh delete was refused")
    v = idx._txlog.snapshot().version
    # crash-replayed delete must be refused without changing anything
    if idx.delete(forget, txn_app="forget", txn_version=0):
        raise AssertionError("replayed delete was not skipped")
    if idx._txlog.snapshot().version != v:
        raise AssertionError("replayed delete committed something")
    kept = idx.ingest(new, txn_app="entry", txn_version=1)
    return _finish_tmp_index(kept.select("doc_id", "source"), path)


def q_semantic_dedup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 11: the max_cluster VALVE path of semantic_dedup
    (operators/similarity.py cluster_keep) — a cluster larger than the
    valve skips the quadratic near-dup matmul but still collapses
    exact-quantized duplicates to their minimum id (zero vectors
    exempt). Ten exact clones (re-id'd +1e6) are unioned in so the
    collapse is observable; with n_clusters=4 and max_cluster=120, two
    of the four clusters exceed the valve at sf0.01 (BOTH paths
    exercised in one query) and all four do at sf0.1. The oracle
    unrolls the identical k-means and applies the size-switched keep
    rule per cluster."""
    from holcstore_spark.operators.similarity import semantic_dedup

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    clones = (
        e.orderBy("vec_id").limit(10)
        .withColumn("vec_id", F.col("vec_id") + F.lit(1_000_000))
    )
    out = semantic_dedup(
        e.unionByName(clones), n_clusters=4, threshold=0.2, iters=2,
        max_cluster=120,
    )
    return out.select(F.col("vec_id"), F.col("cluster").cast("int"))


def q_cluster_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 10: cluster-balanced sampling (similarity.py
    cluster_balanced_sample) — the stage after SemDeDup when no domain
    label exists: the SAME deterministic integer k-means partitions the
    embedding space, then each cluster keeps ~sqrt(n_min·n_g) rows by
    exact content hash (alpha=1/2 temperature). The oracle composes the
    unrolled k-means CTEs with the HUGEINT quadratic threshold —
    identical row sets, no float or sqrt anywhere."""
    from holcstore_spark.operators.similarity import cluster_balanced_sample

    e = _t(spark, sf_dir, "embeddings")
    out = cluster_balanced_sample(e, n_clusters=16, iters=2)
    return out.select(F.col("vec_id"), F.col("cluster").cast("int"))


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document stats: chars, tokens, punctuation, stopwords,
    fingerprint."""
    from holcstore_spark.operators.text import text_stats

    d = _t(spark, sf_dir, "documents")
    return text_stats(d).select(
        "doc_id", "n_tokens", "avg_token_len", "n_punct",
        "n_stopwords", "stopword_ratio", "fingerprint",
    )


def q_lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic + composite quality score per document."""
    from holcstore_spark.operators.text import lang_id, quality_score

    d = _t(spark, sf_dir, "documents")
    out = lang_id(quality_score(d))
    return out.select("doc_id", "lang_pred", "quality")


def q_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting (word runs + standalone symbols)."""
    from holcstore_spark.operators.text import token_count_bpe

    d = _t(spark, sf_dir, "documents")
    return token_count_bpe(d).select("doc_id", "n_bpe_tokens")


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test assignment + nested 25% sample by
    md5-hex-prefix comparison (operators/sampling.py) — reproducible,
    partition-stable, zero-shuffle."""
    from holcstore_spark.operators.sampling import (
        _frac_to_hex, hash_hex8, hash_split,
    )

    d = _t(spark, sf_dir, "documents")
    d = hash_split(d, ["doc_id"], {"train": 0.8, "valid": 0.1, "test": 0.1},
                   salt="split")
    # nested-sample flag (sample_fraction's predicate, kept as a column so
    # the oracle can check membership row-by-row): same hash, smaller cut
    d = d.withColumn(
        "in_quarter",
        (hash_hex8(["doc_id"], "split") < F.lit(_frac_to_hex(0.25))).cast("int"),
    )
    return d.select("doc_id", "split", "in_quarter")


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-(lang, source) top-5 sample ordered by content
    hash (operators/sampling.py stratified_sample)."""
    from holcstore_spark.operators.sampling import stratified_sample

    d = _t(spark, sf_dir, "documents")
    out = stratified_sample(d, ["lang", "source"], 5, ["doc_id"],
                            salt="strat", out_rank="rk")
    return out.select("lang", "source", "rk", "doc_id")


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: duplicate word/bigram/trigram
    fractions + most-common-bigram share, all within-row Column folds."""
    from holcstore_spark.operators.text import repetition_stats

    d = _t(spark, sf_dir, "documents")
    return repetition_stats(d).select(
        "doc_id", "n_tokens", "dup_word_frac", "dup_bigram_frac",
        "dup_trigram_frac", "top_bigram_frac",
    )


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact (email/IPv4/phone). Synthetic PII is injected
    deterministically per doc_id (the corpus itself is PII-free), then
    counted and redacted; the digest proves byte-identical redaction."""
    from holcstore_spark.operators.scrub import pii_stats, redact_pii

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    injected = (
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.col("text"), F.lit(" mail u"), did, F.lit("@ex.org now")))
        .when(F.col("doc_id") % 3 == 1,
              F.concat(F.col("text"), F.lit(" ip 10."),
                       (F.col("doc_id") % 256).cast("string"), F.lit(".3.7 up")))
        .otherwise(
            F.concat(F.col("text"), F.lit(" call +1-555-01"),
                     F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0")))
    )
    d = d.withColumn("doc", injected)
    out = redact_pii(pii_stats(d, "doc"), "doc")
    return out.select(
        "doc_id", "n_email", "n_ipv4", "n_phone",
        F.md5("redacted").alias("digest"),
    )


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 tokens by total frequency with document
    frequency — the vocab/TF-IDF building block (within-row distinct
    before the df explode keeps the shuffle narrow)."""
    from holcstore_spark.operators.text import vocab_topk

    d = _t(spark, sf_dir, "documents")
    return vocab_topk(d, k=100).select("token", "tf", "df")


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload metadata extraction through the real mapInPandas
    plumbing (Arrow batches); decode itself is stubbed per environment."""
    from holcstore_spark.operators.multimodal import (
        attach_binary_payload,
        extract_media_meta,
    )

    d = attach_binary_payload(_t(spark, sf_dir, "documents"))
    meta = extract_media_meta(d)
    return meta.select("doc_id", "n_bytes", "digest")


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video-like binary payloads: the row-exploding
    mapInPandas shape (one payload row → many frame rows). Frames are
    256-byte strides, every 4th kept; digests hash the frame's hex so the
    DuckDB oracle can reproduce them without blob functions."""
    from holcstore_spark.operators.multimodal import (
        attach_binary_payload,
        frame_sample,
    )

    d = attach_binary_payload(
        _t(spark, sf_dir, "documents"), media_type="video"
    )
    frames = frame_sample(d, frame_bytes=64, every=2)
    return frames.select("doc_id", "frame_idx", "n_bytes", "digest")


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode (no stub): each document is rendered as a binary
    PPM (P6) whose pixel bytes are the doc's printable-ASCII text padded
    to 3·w·h, then ``decode_strict`` parses header + pixels with numpy
    and emits per-channel means + the raw-pixel digest. The oracle
    reconstructs the same values from the known construction — so a
    header-parse or channel-order bug fails the hash."""
    from holcstore_spark.operators.multimodal import decode_strict

    base = (
        _t(spark, sf_dir, "documents")
        .withColumn("w", (F.lit(4) + F.col("doc_id") % 5).cast("int"))
        .withColumn("h", (F.lit(3) + F.col("doc_id") % 4).cast("int"))
        .withColumn("ascii_t", F.regexp_replace("text", "[^ -~]", ""))
        .withColumn("pix", F.expr("rpad(ascii_t, 3*w*h, 'x')"))
        .withColumn(
            "payload",
            F.encode(
                F.concat(
                    F.lit("P6\n"), F.col("w").cast("string"), F.lit(" "),
                    F.col("h").cast("string"), F.lit("\n255\n"), F.col("pix"),
                ),
                "UTF-8",
            ),
        )
        .select("doc_id", "payload")
    )
    return decode_strict(base).select(
        "doc_id", "codec", "width", "height",
        "mean_r", "mean_g", "mean_b", "pixel_digest",
    )


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize chained into REAL decode: the per-document PPM is
    nearest-neighbour downsampled by 2 (keeping every even row/column),
    re-encoded as P6, and decoded again for channel means. The oracle
    reproduces the kept-pixel means by index arithmetic over the pixel
    string — a stride or row/col-order bug fails the hash."""
    from holcstore_spark.operators.multimodal import (
        decode_strict,
        resize_strict,
    )

    base = (
        _t(spark, sf_dir, "documents")
        .withColumn("w", (F.lit(4) + F.col("doc_id") % 5).cast("int"))
        .withColumn("h", (F.lit(3) + F.col("doc_id") % 4).cast("int"))
        .withColumn("ascii_t", F.regexp_replace("text", "[^ -~]", ""))
        .withColumn("pix", F.expr("rpad(ascii_t, 3*w*h, 'x')"))
        .withColumn(
            "payload",
            F.encode(
                F.concat(
                    F.lit("P6\n"), F.col("w").cast("string"), F.lit(" "),
                    F.col("h").cast("string"), F.lit("\n255\n"), F.col("pix"),
                ),
                "UTF-8",
            ),
        )
        .select("doc_id", "payload")
    )
    small = resize_strict(base, factor=2)
    return decode_strict(small.select("doc_id", "payload")).select(
        "doc_id", "codec", "width", "height", "mean_r", "mean_g", "mean_b"
    )


def q_multimodal_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode (stdlib zlib, no codec library): each document's
    printable-ASCII pixel string is encoded as a colour-type-2 PNG whose
    scanline filters cycle y % 5 (None/Sub/Up/Average/Paeth), then
    ``decode_strict`` inflates + unfilters it. Filters are lossless, so
    the oracle reconstructs means/digest from the pixel string directly
    — any inflate or unfilter bug fails the hash."""
    from holcstore_spark.operators.multimodal import decode_strict, encode_png

    base = (
        _t(spark, sf_dir, "documents")
        .withColumn("w", (F.lit(4) + F.col("doc_id") % 5).cast("int"))
        .withColumn("h", (F.lit(3) + F.col("doc_id") % 4).cast("int"))
        .withColumn("ascii_t", F.regexp_replace("text", "[^ -~]", ""))
        .withColumn("pix", F.expr("rpad(ascii_t, 3*w*h, 'x')"))
        .select("doc_id", "w", "h", "pix")
    )

    def to_png(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            outs = [
                encode_png(
                    np.frombuffer(p.encode("ascii"), dtype=np.uint8)
                    .reshape(h, w, 3),
                    filter_cycle=True,
                )
                for p, w, h in zip(pdf["pix"], pdf["w"], pdf["h"])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": outs})

    enc = base.mapInPandas(to_png, "doc_id bigint, payload binary")
    return decode_strict(enc).select(
        "doc_id", "codec", "width", "height",
        "mean_r", "mean_g", "mean_b", "pixel_digest",
    )


def q_multimodal_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG decode (pure stdlib+numpy Huffman/IDCT, no codec
    library): each document's printable-ASCII chars become the gray values
    of uniform 8×8 blocks, forced even — a uniform block with even
    (value-128) survives Annex-K quantization EXACTLY (DC = 8d, q=16 →
    round(d/2) lossless), so encode→decode is bit-exact and the oracle
    reconstructs means + md5 pixel digest from the construction. Any
    entropy-decode, dequant or IDCT bug fails the hash."""
    from holcstore_spark.operators.jpeg import encode_jpeg
    from holcstore_spark.operators.multimodal import decode_strict

    base = (
        _t(spark, sf_dir, "documents")
        .withColumn("k", (F.lit(3) + F.col("doc_id") % 4).cast("int"))
        .withColumn("ascii_t", F.regexp_replace("text", "[^ -~]", ""))
        .withColumn("s", F.expr("rpad(ascii_t, k, 'x')"))
        .select("doc_id", "k", "s")
    )

    def to_jpeg(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            outs = []
            for s, k in zip(pdf["s"], pdf["k"]):
                vs = np.frombuffer(s.encode("ascii"), dtype=np.uint8) & 0xFE
                img = np.repeat(vs, 64).reshape(int(k) * 8, 8)
                outs.append(encode_jpeg(img))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": outs})

    enc = base.mapInPandas(to_jpeg, "doc_id bigint, payload binary")
    return decode_strict(enc).select(
        "doc_id", "codec", "width", "height",
        "mean_r", "mean_g", "mean_b", "pixel_digest",
    )


def q_multimodal_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 15: REAL progressive (SOF2) JPEG decode — the last
    multimodal stub retired (VERDICT r14 ask #7). Same exact
    construction as multimodal_jpeg (uniform even-valued 8×8 blocks
    survive Annex-K quantization exactly), encoded with the full
    annex-G scan script (interleaved DC first + refine, per-band AC
    first + two refinement passes, EOBRUN batching): the progressive
    decode accumulates the SAME quantized coefficients, so the oracle
    is multimodal_jpeg's verbatim — any spectral-selection,
    successive-approximation or EOBRUN bug fails the pixel digest."""
    from holcstore_spark.operators.jpeg import encode_progressive
    from holcstore_spark.operators.multimodal import decode_strict

    base = (
        _t(spark, sf_dir, "documents")
        .withColumn("k", (F.lit(3) + F.col("doc_id") % 4).cast("int"))
        .withColumn("ascii_t", F.regexp_replace("text", "[^ -~]", ""))
        .withColumn("s", F.expr("rpad(ascii_t, k, 'x')"))
        .select("doc_id", "k", "s")
    )

    def to_jpeg(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            outs = []
            for s, k in zip(pdf["s"], pdf["k"]):
                vs = np.frombuffer(s.encode("ascii"), dtype=np.uint8) & 0xFE
                img = np.repeat(vs, 64).reshape(int(k) * 8, 8)
                outs.append(encode_progressive(img))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": outs})

    enc = base.mapInPandas(to_jpeg, "doc_id bigint, payload binary")
    return decode_strict(enc).select(
        "doc_id", "codec", "width", "height",
        "mean_r", "mean_g", "mean_b", "pixel_digest",
    )


def q_multimodal_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling (uncompressed RIFF/AVI, stdlib-only
    container walk + numpy DIB decode): each document becomes an AVI of
    uniform-colour frames (frame j's RGB = 3 consecutive ASCII chars),
    ``frame_sample_strict`` keeps every 2nd frame and emits exact RGB
    stats — raw DIB frames are lossless, so the oracle reconstructs
    means + per-frame digests from the construction."""
    from holcstore_spark.operators.multimodal import (
        encode_avi,
        frame_sample_strict,
    )

    base = (
        _t(spark, sf_dir, "documents")
        .withColumn("n", (F.lit(2) + F.col("doc_id") % 4).cast("int"))
        .withColumn("ascii_t", F.regexp_replace("text", "[^ -~]", ""))
        .withColumn("s", F.expr("rpad(ascii_t, 3 * n, 'x')"))
        .select("doc_id", "n", "s")
    )

    def to_avi(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            outs = []
            for s, n in zip(pdf["s"], pdf["n"]):
                cols = np.frombuffer(s.encode("ascii"), dtype=np.uint8)
                frames = np.broadcast_to(
                    cols.reshape(int(n), 1, 1, 3), (int(n), 2, 4, 3)
                ).copy()
                outs.append(encode_avi(frames))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": outs})

    enc = base.mapInPandas(to_avi, "doc_id bigint, payload binary")
    return frame_sample_strict(enc, every=2)


def q_multimodal_mjpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 15: REAL compressed-video decode — Motion-JPEG AVI (the
    one video codec that is pure JPEG, now fully decodable since the
    progressive work completed the JPEG core). Each document becomes
    an MJPG AVI of uniform 8×8 gray frames (frame j's value = even
    ascii of char j — the multimodal_jpeg exactness construction, so
    every frame survives quantization bit-exactly);
    ``frame_sample_strict`` walks the container, decodes every 2nd
    frame through parse_jpeg and emits exact RGB stats + digests the
    oracle reconstructs from the construction."""
    from holcstore_spark.operators.multimodal import (
        encode_avi,
        frame_sample_strict,
    )

    base = (
        _t(spark, sf_dir, "documents")
        .withColumn("n", (F.lit(2) + F.col("doc_id") % 4).cast("int"))
        .withColumn("ascii_t", F.regexp_replace("text", "[^ -~]", ""))
        .withColumn("s", F.expr("rpad(ascii_t, n, 'x')"))
        .select("doc_id", "n", "s")
    )

    def to_avi(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            outs = []
            for s, n in zip(pdf["s"], pdf["n"]):
                vs = np.frombuffer(s.encode("ascii"), dtype=np.uint8) & 0xFE
                frames = np.broadcast_to(
                    vs.reshape(int(n), 1, 1, 1), (int(n), 8, 8, 3)
                ).copy()
                outs.append(encode_avi(frames, codec="MJPG"))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": outs})

    enc = base.mapInPandas(to_avi, "doc_id bigint, payload binary")
    return frame_sample_strict(enc, every=2)


def q_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 16: image near-dup via perceptual hash (VERDICT r15 ask
    #7). Every even/odd doc pair renders the SAME base document text as
    a binary PPM, the odd one with its last pixel byte perturbed — a
    controlled near-duplicate. ``image_neardup_pairs`` dHashes every
    payload through the real decoder, LSH-bands the 64-bit hashes into
    four 16-bit buckets (the shared band_candidate_pairs explosion; at
    most ~2 bits differ within a pair, so at least one band always
    collides) and verifies by exact Hamming distance. The oracle
    reconstructs the full dHash (deterministic nearest-neighbour grid,
    integer grayscale) from the pixel-string construction — a grid,
    packing or banding bug fails the hash."""
    from holcstore_spark.operators.multimodal import image_neardup_pairs

    d = _neardup_images(spark, sf_dir)
    return image_neardup_pairs(d, max_hamming=6).select(
        "id_a", "id_b", "hamming"
    )


def _neardup_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared even/odd perturbed-PPM image fixture of
    q_image_neardup / q_image_dedup_incr: every doc renders its BASE
    (even) partner's text as a P6 payload, odd docs with the last
    pixel byte perturbed."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base_text = docs.select(
        F.col("doc_id").alias("base_id"),
        F.regexp_replace("text", "[^ -~]", "").alias("ascii_t"),
    )
    # pixels come from an md5 chain over the BASE text, not the text
    # itself: ASCII prose renders into heavily-correlated dHashes (the
    # first fixture collided ~everything with ~everything at sf0.1,
    # making the incremental keep-set empty — weak evidence); five
    # fourteen md5s give 448 entropy-rich hex chars >= the 429-byte max
    # image, reproducible in any engine. Dims start at 9x8 so the 9x8
    # dHash sampling grid never repeats a source pixel — smaller images
    # force the repeated-sample bits to 0, which collapses hash entropy
    # and collides everything with everything (first fixture attempt)
    return (
        docs.select("doc_id")
        .withColumn("base_id", F.col("doc_id") - F.col("doc_id") % 2)
        .join(base_text, on="base_id")
        .withColumn("w", (F.lit(9) + F.col("base_id") % 5).cast("int"))
        .withColumn("h", (F.lit(8) + F.col("base_id") % 4).cast("int"))
        .withColumn(
            "pix0",
            F.expr("substring(" + " || ".join(
                f"md5(concat(ascii_t, '|{i}'))" for i in range(14)
            ) + ", 1, 3*w*h)"),
        )
        .withColumn(
            "pix",
            F.when(F.col("doc_id") % 2 == 0, F.col("pix0")).otherwise(
                F.expr("concat(substring(pix0, 1, length(pix0)-1), '~')")
            ),
        )
        .withColumn(
            "payload",
            F.encode(
                F.concat(
                    F.lit("P6\n"), F.col("w").cast("string"), F.lit(" "),
                    F.col("h").cast("string"), F.lit("\n255\n"), F.col("pix"),
                ),
                "UTF-8",
            ),
        )
        .select("doc_id", "payload")
    )


def q_image_dedup_incr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 16: INCREMENTAL image near-dup against stored dHash bands
    — the production O(batch) shape. History = every doc_id % 4 == 0
    image (hashed once, bands persisted); the batch is everything else.
    A batch doc is dropped iff it shares a band bucket with history
    (doc 4k+1 always collides with its base 4k) or with a LOWER-id
    batch doc (4k+3 loses to its pair 4k+2 — keep-first). The oracle
    restates hash construction, banding and both drop rules in SQL;
    output carries each survivor's dHash halves so a hash bug cannot
    hide behind a correct keep-set."""
    from holcstore_spark.operators.multimodal import (
        dhash_bands, dhash_strict, image_dedup_incremental,
    )

    imgs = _neardup_images(spark, sf_dir)
    hist = imgs.filter(F.col("doc_id") % 4 == 0)
    batch = imgs.filter(F.col("doc_id") % 4 != 0)
    index_bands = dhash_bands(dhash_strict(hist))
    kept = image_dedup_incremental(batch, index_bands)
    return dhash_strict(kept).select("doc_id", "dhash_hi", "dhash_lo")


def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode (no stub): each document's printable-ASCII text
    becomes the 8-bit PCM payload of a mono WAV; ``decode_audio_strict``
    walks the RIFF chunks and computes exact integer-sum amplitude stats
    with numpy. The oracle reconstructs the same values from the known
    construction — a header-walk or bias bug fails the hash."""
    import pandas as pd

    from holcstore_spark.operators.multimodal import (
        decode_audio_strict,
        encode_wav_pcm8,
    )

    base = (
        _t(spark, sf_dir, "documents")
        .withColumn("L", (F.lit(50) + F.col("doc_id") % 50).cast("int"))
        .withColumn("ascii_t", F.regexp_replace("text", "[^ -~]", ""))
        .withColumn("pcm", F.expr("rpad(ascii_t, L, 'x')"))
        .select("doc_id", "pcm")
    )

    def encode(it):
        for pdf in it:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [
                    encode_wav_pcm8(s.encode("ascii")) for s in pdf["pcm"]
                ],
            })

    wavs = base.mapInPandas(encode, schema="doc_id long, payload binary")
    return decode_audio_strict(wavs).select(
        "doc_id", "codec", "sample_rate", "n_channels", "n_samples", "mean_abs"
    )


def q_blob_interop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/F6: reference binary-blob codec interop. Per user the hourly
    series is packed into BOTH legacy formats — an LZ4-frame numpy chunk
    blob (chunk_timeserie_store.py:255-282) carried through the base64
    sync wire (ts_sync.py:139,252), and a Feather-v2+LZ4 KV blob
    (hostore.py:347-353) — then decoded back by the distributed
    migration readers and re-aggregated. Both legs must reproduce the
    original per-user count and exact sum."""
    import pandas as pd

    from holcstore_spark.edge.blob_codec import (
        b64_wire_encode,
        encode_chunk_blob,
        encode_kv_blob,
        legacy_chunk_rows_to_long,
        legacy_kv_rows_to_long,
    )

    hourly = _hourly_events(spark, sf_dir)

    def to_chunk_blob(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        s = pd.Series(pdf["value"].to_numpy(), index=pd.DatetimeIndex(pdf["ts"]))
        dense = s.reindex(pd.date_range(s.index.min(), s.index.max(), freq="1h"))
        blob, dtype = encode_chunk_blob(dense.to_numpy(dtype="float64"))
        return pd.DataFrame([{
            "user_id": int(pdf["user_id"].iloc[0]),
            "start_ts": dense.index[0],
            "dtype": dtype,
            "wire": b64_wire_encode(blob),
        }])

    chunk_rows = hourly.groupBy("user_id").applyInPandas(
        to_chunk_blob,
        schema="user_id long, start_ts timestamp, dtype string, wire string",
    ).withColumn("data", F.unbase64("wire"))
    long_a = legacy_chunk_rows_to_long(
        chunk_rows, keys=("user_id",), freq_seconds=3600
    )
    agg_a = (
        long_a.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_points"),
             _dec_sum(F.col("value"), 2).alias("total"))
        .withColumn("codec", F.lit("lz4_numpy"))
    )

    def to_kv_blob(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        uid = int(pdf["user_id"].iloc[0])
        s = pd.Series(pdf["value"].to_numpy(), index=pd.DatetimeIndex(pdf["ts"]))
        return pd.DataFrame([{
            "client_id": 1, "prm": str(uid), "version": 0,
            "data": encode_kv_blob(str(uid), s),
        }])

    kv_rows = hourly.groupBy("user_id").applyInPandas(
        to_kv_blob, schema="client_id int, prm string, version int, data binary"
    )
    agg_b = (
        legacy_kv_rows_to_long(kv_rows)
        .groupBy(F.col("prm").cast("long").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_points"),
             _dec_sum(F.col("value"), 2).alias("total"))
        .withColumn("codec", F.lit("feather_lz4"))
    )
    return agg_a.unionByName(agg_b).select(
        "codec", "user_id", "n_points", "total"
    )


def q_token_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing manifest: per document the global token
    offset (distributed two-phase prefix sum — per-bucket cumsum, then a
    metadata-sized bucket-offset cumsum) and the first/last 512-token
    training block it lands in."""
    from holcstore_spark.operators.packing import pack_manifest

    d = _t(spark, sf_dir, "documents")
    # bucket_size=64 exercises the multi-bucket prefix-sum path even at
    # sf0.01's 500 docs
    return pack_manifest(d, block_tokens=512, bucket_size=64)


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs sharing ≥2 distinct 3-token
    shingles with the benchmark slice (doc_id % 97 == 0) via one
    shingle-hash equi-join (benchmark side broadcast), never all-pairs."""
    from holcstore_spark.operators.contamination import ngram_contamination

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    docs = d.filter(F.col("doc_id") % 97 != 0)
    return ngram_contamination(docs, bench, k=3, min_overlap=2)


def q_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 TF-IDF terms (rational BM25-core idf — no
    transcendentals, so scores are bit-identical across engines)."""
    from holcstore_spark.operators.text import tfidf_top_terms

    return tfidf_top_terms(_t(spark, sf_dir, "documents"), k=5)


def q_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document segment (5-word "line") dedup stats — the C4 /
    RefinedWeb line-dedup signal: per doc, how many of its distinct
    segments appear in at least one other document."""
    from holcstore_spark.operators.text import segment_dup_stats

    return segment_dup_stats(_t(spark, sf_dir, "documents"), k_words=5)


def q_rebalance_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain re-weighting: keep the largest hash-deterministic subset
    whose language mix is 50% en / 25% de / 25% fr (other languages
    dropped). Thresholds come from exact rational arithmetic, so the
    integer-formula oracle reproduces the identical row set."""
    from holcstore_spark.operators.sampling import rebalance_mix

    d = _t(spark, sf_dir, "documents")
    kept = rebalance_mix(
        d, "lang", {"en": 2, "de": 1, "fr": 1}, id_cols=["doc_id"]
    )
    return kept.select("doc_id", "lang")


def q_stats_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distribution audit: count, DECIMAL-exact mean and
    exact linear-interpolated percentiles of the (int-quantized) value.
    Inputs quantize to round(value*1000) and the percentile points are
    dyadic (1/4, 1/2, 3/4), so the interpolation arithmetic is exact in
    IEEE doubles — both engines produce bit-identical results with no
    tolerance games."""
    from holcstore_spark.operators.stats import percentile_rollup

    e = _t(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 1000).cast("long").alias("v_q")
    )
    out = percentile_rollup(e, ("event_type",), value="v_q", ps=(0.25, 0.5, 0.75))
    # exact-integer mean (order-free) replaces the float-sum mean for the
    # cross-engine hash: long sum is exact, one double divide at the end
    mean = (
        e.groupBy("event_type")
        .agg(
            (F.sum("v_q").cast("double") / F.count(F.lit(1)))
            .alias("v_mean_exact")
        )
    )
    return (
        out.drop("v_mean")
        .join(mean, on="event_type")
        .select("event_type", "n", "v_mean_exact", "p_25", "p_50", "p_75")
    )


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type (bin width 64 — a
    power of two, so the float divide in floor((v-lo)/w) is exact and
    bin edges are bit-identical across engines)."""
    from holcstore_spark.operators.stats import value_histogram

    e = _t(spark, sf_dir, "events")
    return value_histogram(e, ("event_type",), value="value", bin_width=64.0, lo=0.0)


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window context-length chunking (200-char windows every
    150 chars) summarized per document: chunk count, total chunked
    chars, and an md5 digest over the ordered chunk texts — the digest
    oracle-checks every chunk byte, not just counts."""
    from holcstore_spark.operators.text import doc_chunks

    ch = doc_chunks(
        _t(spark, sf_dir, "documents"), size=200, stride=150
    )
    per_chunk = ch.select(
        "doc_id", "chunk_id", F.md5(F.col("chunk")).alias("h"), "chunk_len"
    )
    return (
        per_chunk.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("chunk_len").alias("total_chars"),
            F.md5(F.concat_ws(",", F.array_sort(F.collect_list(
                F.concat_ws(":", F.col("chunk_id").cast("string"), "h")
            )))).alias("digest"),
        )
    )


def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization, oracle-checked per vector:
    the exact scale (max|x|/127 — identical IEEE division in both
    engines), an md5 digest of the full quantized vector, and integer
    sum/min/max/nnz of the codes."""
    from holcstore_spark.operators.similarity import quantize_embeddings

    q = quantize_embeddings(_t(spark, sf_dir, "embeddings"))
    qv = F.col("q_vec")
    return q.select(
        "vec_id",
        F.col("q_scale").alias("q_scale"),
        F.md5(F.concat_ws(",", F.transform(qv, lambda x: x.cast("string")))).alias("q_digest"),
        F.aggregate(qv, F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        F.array_min(qv).alias("q_min"),
        F.array_max(qv).alias("q_max"),
        F.size(F.filter(qv, lambda x: x != 0)).alias("q_nnz"),
    )


def q_sliding_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window rollup (2 h windows every 1 h) per event type —
    every event lands in exactly width/slide = 2 epoch-aligned windows;
    DECIMAL-exact sums keep totals reduction-order-free."""
    from holcstore_spark.operators.resample import sliding_window_rollup

    return sliding_window_rollup(
        _t(spark, sf_dir, "events"), ("event_type",),
        width_seconds=7200, slide_seconds=3600,
    )


def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (purchase ⋈ clicks of
    the same user within the preceding 2 h) through two real
    availableNow streams; the single-micro-batch source makes the
    result equal the batch range-join SQL exactly."""
    from holcstore_spark.streaming.ingest import stream_interval_join

    src = tempfile.mkdtemp(prefix="holc_sj_src_")
    ckpt = tempfile.mkdtemp(prefix="holc_sj_ckpt_")
    name = "stream_join_sink"
    try:
        (
            _t(spark, sf_dir, "events")
            .select("event_id", "user_id", "ts", "event_type", "value")
            .coalesce(1)
            .write.mode("overwrite").parquet(src)
        )
        schema = "event_id long, user_id long, ts timestamp, event_type string, value double"
        purchases = (
            spark.readStream.schema(schema).parquet(src)
            .filter(F.col("event_type") == "purchase")
            .select("event_id", "user_id", "ts", "value")
        )
        clicks = (
            spark.readStream.schema(schema).parquet(src)
            .filter(F.col("event_type") == "click")
            .select(
                "user_id",
                F.col("ts").alias("r_ts"),
                F.col("value").alias("click_value"),
            )
        )
        joined = stream_interval_join(
            purchases, clicks, on=("user_id",), within_seconds=7200,
            watermark="4 hours",
        )
        q = (
            joined.writeStream.outputMode("append")
            .format("memory").queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_stream(q, 300)
        out = spark.table(name).select(
            "event_id", "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "value",
            F.unix_micros("r_ts").alias("click_ts_us"),
            "click_value",
        )
        return out.localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(name) if name in [
            t.name for t in spark.catalog.listTables()
        ] else None
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def q_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user seasonal (hour-of-day × weekend) baseline and anomaly
    residual for every event — int-quantized values, exact integer-sum
    means, and epoch-arithmetic weekday so both engines agree on every
    slot and every residual bit."""
    from holcstore_spark.operators.resample import seasonal_profile

    e = _t(spark, sf_dir, "events").select("user_id", "ts", "value")
    return seasonal_profile(e, ("user_id",))


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 4 BPE merges learned over the normalized corpus — each
    round is one pair-count aggregate + a one-row collect + a
    token-boundary-safe plain string replace; the oracle unrolls all
    four rounds in SQL and must reproduce pairs AND counts exactly."""
    from holcstore_spark.operators.text import bpe_learn_merges, normalize_text

    d = normalize_text(_t(spark, sf_dir, "documents"))
    return bpe_learn_merges(
        d.select(F.col("text_norm").alias("text")), n_merges=4
    )


def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (m=4 subspaces, 16 centroids each, 2 Lloyd
    iterations of the deterministic integer k-means per subspace):
    per-vector codes and the EXACT integer reconstruction error — the
    oracle unrolls all four codebook trainings in SQL."""
    from holcstore_spark.operators.similarity import pq_encode

    q = pq_encode(
        _t(spark, sf_dir, "embeddings"), m=4, n_centroids=16, iters=2, dim=64
    )
    return q.select(
        "vec_id",
        F.col("pq_code")[0].alias("pq0"),
        F.col("pq_code")[1].alias("pq1"),
        F.col("pq_code")[2].alias("pq2"),
        F.col("pq_code")[3].alias("pq3"),
        "recon_err_q",
    )


def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ read path: top-5 neighbours by Asymmetric Distance
    Computation over the PQ codes (query full-precision, candidates as
    4 codes, distance = 4 table lookups) — exact integer arithmetic end
    to end, oracle-verified including the codebook training."""
    from holcstore_spark.operators.similarity import pq_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return pq_topk(e, q, k=5, m=4, n_centroids=16, iters=2, dim=64)


def q_pq_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 12: filtered IVF-PQ search — ADC top-5 with the candidate
    scan restricted to ``label >= 5`` below the ADC join
    (pq_topk(filters=)); codebooks still train on the full corpus.
    Exact integer arithmetic end to end, same as pq_topk."""
    from holcstore_spark.operators.similarity import pq_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return pq_topk(
        e, q, k=5, m=4, n_centroids=16, iters=2, dim=64,
        filters={"label__gte": 5},
    )


def q_stream_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CUSUM through a real applyInPandasWithState stream
    (availableNow, single micro-batch source): two integers of state per
    key continue the recurrence exactly, and the emitted alarms must
    equal the batch prefix-sum SQL bit-for-bit."""
    from holcstore_spark.streaming.stateful import stream_cusum

    src = tempfile.mkdtemp(prefix="holc_cusum_src_")
    ckpt = tempfile.mkdtemp(prefix="holc_cusum_ckpt_")
    name = "stream_cusum_sink"
    try:
        (
            _t(spark, sf_dir, "events")
            .select("user_id", "ts", "value")
            .coalesce(1)
            .write.mode("overwrite").parquet(src)
        )
        stream = spark.readStream.schema(
            "user_id long, ts timestamp, value double"
        ).parquet(src)
        alarms = stream_cusum(
            stream, ("user_id",), target_k=50.0, threshold_h=500.0,
            watermark="2 hours",
        )
        q = (
            alarms.writeStream.outputMode("append")
            .format("memory").queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_stream(q, 300)
        out = spark.table(name).select("user_id", "ts_us", "value", "cusum_q")
        return out.localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(name) if name in [
            t.name for t in spark.catalog.listTables()
        ] else None
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user CUSUM change-point alarms (k=50, h=500) — the
    sequential-looking recurrence realized as prefix-sum + running-min
    window functions over int-quantized values; exact integer statistic
    in both engines."""
    from holcstore_spark.operators.islands import cusum_drift

    e = _t(spark, sf_dir, "events").select("user_id", "ts", "value")
    return cusum_drift(e, ("user_id",), target_k=50.0, threshold_h=500.0)


def q_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 24-row window statistics per user over the ordered event
    series — int-quantized inputs make every windowed sum (including the
    n·Σx²−(Σx)² variance numerator) exact integer arithmetic."""
    from holcstore_spark.operators.resample import rolling_stats

    e = _t(spark, sf_dir, "events").select("user_id", "ts", "value")
    return rolling_stats(e, ("user_id",), window_rows=24)


def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED training-corpus pipeline end-to-end: normalize →
    exact-dedup on the normalized text → sqrt-temperature domain
    flattening → hash train/valid split → context-length chunking —
    summarized per (lang, split) with a digest over every chunk byte.
    Every stage is individually engine-portable-exact, so the whole
    chain must hash-match a single composed SQL oracle."""
    from holcstore_spark.operators.pipeline import prepare_corpus

    ch = prepare_corpus(_t(spark, sf_dir, "documents"))
    return ch.groupBy("lang", "split").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("chunk_len").alias("total_chars"),
        F.md5(F.concat_ws(",", F.array_sort(F.collect_list(
            F.concat_ws(
                ":",
                F.col("doc_id").cast("string"),
                F.col("chunk_id").cast("string"),
                F.md5("chunk"),
            )
        )))).alias("digest"),
    )


def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical normalization (lowercase, strip to [a-z0-9 ], collapse
    whitespace) oracle-checked byte-for-byte via an md5 digest of the
    normalized text — the regexes are literal char classes valid in both
    Java regex and RE2."""
    from holcstore_spark.operators.text import normalize_text

    d = normalize_text(_t(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.length("text_norm").alias("n_chars_norm"),
        F.md5(F.col("text_norm")).alias("norm_digest"),
    )


def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent-bigram collocations by rational LIFT
    (c_ab*N / (c_a*c_b)) with min support 5 — PMI ranking with exactly
    one IEEE division of exact integers, so both engines agree on every
    bit and every tie."""
    from holcstore_spark.operators.text import bigram_collocations

    return bigram_collocations(
        _t(spark, sf_dir, "documents"), min_count=5, k=20
    )


def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (alpha=1/2) domain flattening over documents.lang:
    each language keeps ~sqrt(n_min*n_g) rows by content hash. The
    engine precomputes exact isqrt hex thresholds; the oracle states the
    equivalent quadratic inequality h^2*n_g < n_min*2^64 in HUGEINT —
    identical row sets, no float or sqrt anywhere."""
    from holcstore_spark.operators.sampling import temperature_sample

    d = _t(spark, sf_dir, "documents")
    return temperature_sample(d, "lang", ["doc_id"]).select("doc_id", "lang")


def q_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram surprisal per document (CCNet LM-filter analog),
    quantized to whole bits via integer log2 (length(bin(n)) - 1) so the
    score is exact integer arithmetic — bit-reproducible cross-engine
    with no transcendental log."""
    from holcstore_spark.operators.text import unigram_surprisal

    return unigram_surprisal(_t(spark, sf_dir, "documents"))


def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate-SPAN stats — exact-substring dedup (Lee
    et al. 2022) as rolling 8-token gram hashing: the globally-first
    occurrence of a duplicated k-gram keeps its tokens, every later
    occurrence marks its span for removal. Per doc: token counts before
    / after span removal."""
    from holcstore_spark.operators.dedup import duplicate_span_stats

    return duplicate_span_stats(_t(spark, sf_dir, "documents"), k=8)


def q_dedup_spans_incr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental duplicate-span dedup — the production shape: history
    (docs with id % 3 != 0) is gram-hashed ONCE into a distinct-hash
    index; the ingest batch (id % 3 == 0) hashes only itself. An
    occurrence is removed when its 8-gram exists in the index (history
    wins) or a smaller in-batch key carries it."""
    from holcstore_spark.operators.dedup import (
        duplicate_span_stats_incremental,
        span_gram_index,
    )

    docs = _t(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    return duplicate_span_stats_incremental(
        batch, span_gram_index(hist, k=8), k=8
    )


def q_c4_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 14: the C4 cleaning heuristics (Raffel et al. 2020, §2.2)
    — line-level terminal-punctuation/word-count filtering plus
    page-level lorem-ipsum / brace / 3-sentence rejection, as a pure
    per-row projection (no shuffle, no UDF)."""
    from holcstore_spark.operators.text import c4_rules

    return c4_rules(_t(spark, sf_dir, "documents")).select(
        "doc_id", "text_c4", "n_lines", "n_lines_kept", "n_sentences",
        "has_lorem_ipsum", "has_brace", "c4_keep",
    )


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 14: the Gopher quality-filter rules (Rae et al. 2021,
    appendix A1.1) as per-document flags + metrics — the standard
    first-pass heuristic gate of a pretraining pipeline, pure per-row
    whole-stage-codegen projection (no shuffle, no UDF)."""
    from holcstore_spark.operators.text import gopher_rules

    return gopher_rules(_t(spark, sf_dir, "documents")).select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        "mean_word_len", "symbol_ratio", "bullet_line_frac",
        "ellipsis_line_frac", "alpha_word_frac",
        F.col("gopher_stop_hits").cast("long").alias("gopher_stop_hits"),
        "rule_word_count", "rule_mean_word_len", "rule_symbol_ratio",
        "rule_bullet_lines", "rule_ellipsis_lines", "rule_alpha_words",
        "rule_stopwords", "gopher_pass",
    )


def _finish_tmp_index(result: DataFrame, *paths: str) -> DataFrame:
    """Materialize a query result that READS from a throwaway temp-dir
    index, then delete the index directory. The lazy frame would
    otherwise pin the tmp files forever — and the bench loop leaked one
    index directory per invocation (review r14). localCheckpoint is
    eager, so the data is resident before the files vanish."""
    import shutil

    from holcstore_spark.sources.io_util import safe_local_checkpoint

    out = safe_local_checkpoint(result)
    for p in paths:
        shutil.rmtree(p, ignore_errors=True)
    return out


def q_span_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 14: MATERIALIZED duplicate-span removal — the cleaned
    corpus under the Lee et al. keep-first rule (every token position
    covered by a removed 8-gram occurrence dropped, survivors re-joined
    in order). kept_tokens equals dedup_spans' by construction; the
    oracle rebuilds the text with an ordered string_agg, so splice
    points and empty-after-strip documents hash-match too."""
    from holcstore_spark.operators.dedup import strip_duplicate_spans

    return strip_duplicate_spans(_t(spark, sf_dir, "documents"), k=8)


def q_span_strip_incr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 14: incremental strip — the cleaned text of the ingest
    batch (id % 3 == 0) against the history gram index, the
    materialization twin of dedup_spans_incr (same removal rule:
    history hash wins, in-batch keep-first on top)."""
    from holcstore_spark.operators.dedup import (
        span_gram_index,
        strip_duplicate_spans_incremental,
    )

    docs = _t(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    return strip_duplicate_spans_incremental(
        batch, span_gram_index(hist, k=8), k=8
    )


def q_span_index_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 14: EXACTLY-ONCE managed span-gram index under crash
    replay (sources/gram_index.py GramIndex — VERDICT r13 gap #1
    closed): history (id % 3 != 0) is ingested into a transactional
    gram index (txn 0 — an empty index, so its grams self-attribute to
    their first occurrences), the batch (id % 3 == 0) is ingested with
    txn_version=1, and the SAME batch is ingested AGAIN with the same
    txn_version, simulating a foreachBatch retry after checkpoint
    loss. The replay must commit nothing (watermark skip) and return
    IDENTICAL duplicate-span stats — which is what the oracle checks:
    it computes the single-application incremental stats in SQL
    (the dedup_spans_incr rule), so any replay drift hash-mismatches.
    Idempotence comes from the always-on exclude-self mask (the
    batch's own committed grams are anti-joined out of history) +
    Delta-style txn watermarks in the commit log."""
    import shutil
    from holcstore_spark.sources.gram_index import GramIndex

    docs = _t(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    path = tempfile.mkdtemp(prefix="holc_gramidx_")
    shutil.rmtree(path, ignore_errors=True)
    idx = GramIndex(spark, path, k=8)
    idx.ingest(hist, txn_app="entry", txn_version=0).collect()
    first = idx.ingest(batch, txn_app="entry", txn_version=1)
    n_first, rows_first = first.count(), idx.df().count()
    v_first = idx._txlog.snapshot().version
    replayed = idx.ingest(batch, txn_app="entry", txn_version=1)
    if idx.df().count() != rows_first:
        raise AssertionError("replay double-appended index grams")
    if idx._txlog.snapshot().version != v_first:
        raise AssertionError("replay committed to the txlog")
    if replayed.count() != n_first:
        raise AssertionError("replayed stats row count drifted")
    return _finish_tmp_index(replayed, path)


def q_span_index_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 14: REPLAY-SAFE ERASURE from the managed gram index — the
    takedown path the anonymous span_gram_index recipe could not have
    (VERDICT r13: 'no erasure path at all'). History is ingested
    (txn 0, keeper-attributed grams), every history doc with
    doc_id % 10 == 0 is FORGOTTEN via delete() (O(ids) tombstone
    commit, no data rewrite), the delete is replayed and must commit
    nothing, and the batch is then ingested. The oracle recomputes
    history with the GramIndex attribution rule (each gram owned by
    its first-occurrence doc) minus the forgotten owners' grams — so
    it proves deleted documents' spans stop suppressing new text while
    every other suppression still holds."""
    import shutil
    from holcstore_spark.sources.gram_index import GramIndex

    docs = _t(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    path = tempfile.mkdtemp(prefix="holc_gramidx_")
    shutil.rmtree(path, ignore_errors=True)
    idx = GramIndex(spark, path, k=8)
    idx.ingest(hist, txn_app="entry", txn_version=0).collect()
    forget = hist.filter(F.col("doc_id") % 10 == 0).select("doc_id")
    if not idx.delete(forget, txn_app="forget", txn_version=0):
        raise AssertionError("fresh delete was refused")
    v = idx._txlog.snapshot().version
    if idx.delete(forget, txn_app="forget", txn_version=0):
        raise AssertionError("replayed delete was not skipped")
    if idx._txlog.snapshot().version != v:
        raise AssertionError("replayed delete committed to the txlog")
    return _finish_tmp_index(
        idx.ingest(batch, txn_app="entry", txn_version=1), path
    )


def q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs top-3 cosine neighbour graph over the embedding corpus,
    IVF-blocked: both sides are corpus-sized, so the probe join is a
    SHUFFLE equi-join on the list id (never a broadcast, never n²).
    Same deterministic integer k-means as similarity_ivf, so the oracle
    unrolls the identical two Lloyd iterations."""
    from holcstore_spark.operators.similarity import knn_graph

    return knn_graph(
        _t(spark, sf_dir, "embeddings"), k=3, n_lists=16, n_probe=2, iters=2
    )


def q_knn_graph_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 14: the KNN graph built FROM the persisted VectorIndex
    (VERDICT r13 ask #4): the candidate side consumes the stored list
    assignment and pre-quantized vectors — no re-assign pass, no
    quantization, snapshot-pinned (plan-asserted in
    tests/test_vector_index.py); only the source probes compute. With
    the whole corpus appended in one batch the space trains exactly
    like the operator's, so knn_graph's oracle must hash-match — the
    indexed path can hide no drift."""
    import shutil
    from holcstore_spark.sources.vector_index import VectorIndex

    e = _t(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="holc_vecidx_")
    shutil.rmtree(path, ignore_errors=True)
    vi = VectorIndex(spark, path, n_lists=16, iters=2, dim=64)
    if not vi.append(e, txn_app="entry", txn_version=0):
        raise AssertionError("fresh index refused the append")
    return _finish_tmp_index(vi.knn_graph(k=3, n_probe=2), path)


def q_knn_graph_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 15: DELETE-AWARE incremental KNN-graph maintenance
    (VERDICT r14 ask #2): build the full graph, tombstone every
    vec_id % 17 == 0 vector, then update_knn_graph — which drops the
    forgotten edges and rescores ONLY the sources whose top-k lost a
    member (bounded by the deleted vectors' in-degree) — with no
    appended batch. The space trained over the FULL corpus (single
    append), so the oracle is the knn_graph SQL with deleted ids
    removed from probes and candidates but NOT from training: any
    stale edge or unbackfilled slot hash-mismatches against the
    from-scratch rebuild semantics."""
    import shutil
    from holcstore_spark.sources.vector_index import VectorIndex

    e = _t(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="holc_vecidx_")
    shutil.rmtree(path, ignore_errors=True)
    vi = VectorIndex(spark, path, n_lists=16, iters=2, dim=64)
    if not vi.append(e, txn_app="entry", txn_version=0):
        raise AssertionError("fresh index refused the append")
    space_v = vi.active_space_version()
    g0 = vi.knn_graph(k=3, n_probe=2)
    if not vi.delete(
        e.filter(F.col("vec_id") % 17 == 0).select("vec_id"),
        txn_app="entry", txn_version=1,
    ):
        raise AssertionError("delete did not commit")
    return _finish_tmp_index(
        vi.update_knn_graph(
            g0, k=3, n_probe=2, expected_space_version=space_v
        ),
        path,
    )


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style per-domain cap: at most 20 documents per source,
    longest-first (n_chars desc, doc_id tiebreak) — one hash shuffle on
    the group key plus a bounded row_number window."""
    from holcstore_spark.operators.sampling import cap_per_group

    return cap_per_group(
        _t(spark, sf_dir, "documents"), group="source", cap=20
    ).select("doc_id", "source", "n_chars")


def q_stream_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-domain admission quota through a real
    applyInPandasWithState stream (availableNow): one integer of state
    per source admits at most 20 documents first-come (id order within
    the batch) — on a single-batch run the admitted set must equal the
    batch row_number SQL exactly."""
    from holcstore_spark.streaming.stateful import stream_domain_cap

    src = tempfile.mkdtemp(prefix="holc_quota_src_")
    ckpt = tempfile.mkdtemp(prefix="holc_quota_ckpt_")
    name = "stream_quota_sink"
    try:
        (
            _t(spark, sf_dir, "documents")
            .select("doc_id", "source", "n_chars")
            .coalesce(1)
            .write.mode("overwrite").parquet(src)
        )
        stream = spark.readStream.schema(
            "doc_id long, source string, n_chars long"
        ).parquet(src)
        kept = stream_domain_cap(stream, group="source", cap=20)
        q = (
            kept.writeStream.outputMode("append")
            .format("memory").queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_stream(q, 300)
        out = spark.table(name).select("doc_id", "source", "n_chars")
        return out.localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(name) if name in [
            t.name for t in spark.catalog.listTables()
        ] else None
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword top-10 for the query {hash, join, scan} — rational
    idf (no ln) and integer micro-unit contribution quantization make
    the cross-term sum exact integer arithmetic, bit-reproducible
    cross-engine; distributed TakeOrdered cuts to k before ranking."""
    from holcstore_spark.operators.text import bm25_topk

    return bm25_topk(
        _t(spark, sf_dir, "documents"), ["hash", "join", "scan"], k=10
    )


def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical top-10 ({hash, join, scan}) fused
    with exact cosine top-10 around query vector 0 by reciprocal-rank
    fusion (1/(60+rank), a fixed binary expression tree — no float
    aggregation order anywhere). Documents strong in either ranking
    surface; ties break by id."""
    from holcstore_spark.operators.similarity import brute_force_topk, rrf_fuse
    from holcstore_spark.operators.text import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    bm = bm25_topk(docs, ["hash", "join", "scan"], k=10).select(
        "doc_id", "rank"
    )
    vec = brute_force_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=10
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    vec_rank = (
        vec.withColumn("rank", F.row_number().over(w))
        .select(F.col("neighbor_id").alias("doc_id"), "rank")
    )
    return rrf_fuse([bm, vec_rank], id_col="doc_id", k=10)


def q_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 14: PERSISTED BM25 (sources/lexical_index.py LexicalIndex
    — VERDICT r13 gap #2 closed): the corpus's postings are ingested
    once into a transactional, term-bucketed index, then the query
    reads ONLY its terms' bucket files + the stats stripe (manifest
    prune, plan-asserted in tests/test_lexical_index.py) instead of
    re-tokenizing the corpus. The index shares bm25_topk's scoring
    tail, so the oracle is bm25_search's verbatim — the indexed path
    can hide no drift. A crash-replayed ingest is refused in-query."""
    import shutil
    from holcstore_spark.sources.lexical_index import LexicalIndex

    docs = _t(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="holc_lexidx_")
    shutil.rmtree(path, ignore_errors=True)
    li = LexicalIndex(spark, path)
    if not li.ingest(docs, txn_app="entry", txn_version=0):
        raise AssertionError("fresh index refused the ingest")
    if li.ingest(docs, txn_app="entry", txn_version=0):
        raise AssertionError("replayed ingest was not skipped")
    return _finish_tmp_index(
        li.topk(["hash", "join", "scan"], k=10), path
    )


def q_bm25_recompute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 15: stats-accurate erasure (VERDICT r14 gap #3 closed) —
    ingest the corpus into a LexicalIndex, DELETE every doc_id % 7 == 0
    document, then :meth:`recompute_stats` (one commit: physical
    erasure + N/Σdl stripe rewrite for exactly the erased docs). The
    post-recompute topk must equal a fresh index built over only the
    surviving documents, so the oracle is bm25_search's SQL evaluated
    against the filtered corpus — any stale deleted mass in N, avgdl
    or df shifts the scores and fails the hash. Victims are restricted
    to text-bearing docs: a deleted ZERO-token doc is recompute_stats'
    documented honest boundary (its +1 on N is unattributable), so
    deleting one would make the query depend on the fixture having no
    NULL-text rows (review r15) — the restriction makes query and
    oracle agree for ANY corpus."""
    import shutil
    from holcstore_spark.sources.lexical_index import LexicalIndex

    docs = _t(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="holc_lexidx_")
    shutil.rmtree(path, ignore_errors=True)
    li = LexicalIndex(spark, path)
    if not li.ingest(docs, txn_app="entry", txn_version=0):
        raise AssertionError("fresh index refused the ingest")
    victims = docs.filter(
        (F.col("doc_id") % 7 == 0) & F.col("text").isNotNull()
    ).select("doc_id")
    if not li.delete(victims, txn_app="entry", txn_version=1):
        raise AssertionError("delete did not commit")
    if not li.recompute_stats():
        raise AssertionError("recompute_stats found nothing to erase")
    if li.recompute_stats():
        raise AssertionError("second recompute_stats was not a no-op")
    return _finish_tmp_index(
        li.topk(["hash", "join", "scan"], k=10), path
    )


def q_hybrid_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 14: hybrid retrieval as a PERSISTED-INDEX pipeline
    (VERDICT r13 ask #5): LexicalIndex BM25 top-10 fused with
    VectorIndex IVF top-10 around query vector 0 by reciprocal-rank
    fusion — both sides read managed indexes (postings buckets /
    probed-list files), neither rescans its corpus. The lexical ranks
    equal bm25_search's (shared scoring tail) and the ANN ranks equal
    similarity_ivf's restricted to query 0 (single-batch append trains
    the same deterministic k-means), so the oracle composes those two
    verified chains plus the rrf fixed expression tree."""
    import shutil
    from holcstore_spark.operators.similarity import rrf_fuse
    from holcstore_spark.sources.lexical_index import LexicalIndex
    from holcstore_spark.sources.vector_index import VectorIndex

    from holcstore_spark.sources.io_util import overlap_jobs

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lpath = tempfile.mkdtemp(prefix="holc_lexidx_")
    shutil.rmtree(lpath, ignore_errors=True)
    li = LexicalIndex(spark, lpath)
    vpath = tempfile.mkdtemp(prefix="holc_vecidx_")
    shutil.rmtree(vpath, ignore_errors=True)
    vi = VectorIndex(spark, vpath, n_lists=16, iters=2, dim=64)
    # the two index builds are independent (distinct stores/paths):
    # overlap them so the pipeline pays ~max(ingest, append), not the
    # sum (guide §2.6) — both reads below still see each index's own
    # committed snapshot
    ok_lex, ok_vec = overlap_jobs(
        spark,
        lambda: li.ingest(docs, txn_app="entry", txn_version=0),
        lambda: vi.append(emb, txn_app="entry", txn_version=0),
    )
    if not ok_lex:
        raise AssertionError("fresh lexical index refused the ingest")
    if not ok_vec:
        raise AssertionError("fresh vector index refused the append")
    bm = li.topk(["hash", "join", "scan"], k=10).select("doc_id", "rank")
    vec = vi.topk(emb.filter(F.col("vec_id") == 0), k=10, n_probe=2)
    w = Window.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    vec_rank = (
        vec.withColumn("rank", F.row_number().over(w))
        .select(F.col("neighbor_id").alias("doc_id"), "rank")
    )
    return _finish_tmp_index(
        rrf_fuse([bm, vec_rank], id_col="doc_id", k=10), lpath, vpath
    )


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023) unigram importance weights against the
    French-language slice as the target domain — add-one-smoothed
    log2(p_target/p_corpus) per token, quantized to whole bits via
    integer log2 (length(bin(n))) so the score is exact integer
    arithmetic, bit-reproducible cross-engine."""
    from holcstore_spark.operators.text import dsir_bits

    return dsir_bits(_t(spark, sf_dir, "documents"), F.col("lang") == "fr")


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: versioned overlay + gap report (SURVEY §7.5) on sf0.001 —
    per user the combined series size and the number of missing hourly
    slots vs the requested window."""
    sf_dir = "/root/testdata/sf0.001"
    merged = q_overlay_merge(spark, sf_dir)
    holes = q_completeness_holes(spark, sf_dir)
    n_pts = merged.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_points"))
    n_holes = holes.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_holes"))
    return n_pts.join(n_holes, on="user_id", how="left").fillna(0, subset=["n_holes"])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # STANDING ROTATION: the driver checks only the FIRST 50 entries
    # against the oracle each round, so order = least-recently-verified
    # first. Round-16 window (the r15 verdict's ask #3): (a) the WHOLE
    # 47-query round-13-verified tail block (ffill … dedup_clusters),
    # in registry order — after this round no registry entry's last
    # green run is older than r14; (b) the NEW round-16 query
    # image_neardup (perceptual-hash image dedup, verdict ask #7);
    # the window closes with the head of the r14-verified block.
    # temperature_sample, rebalance_mix, cluster_balance and domain_cap
    # changed code paths this round but their VALUES are bit-identical
    # (A/B-verified against the old thresholds and against their
    # oracles at sf0.01+sf0.1 locally); rebalance_mix and domain_cap
    # sit inside this window anyway, the other two are r15-green and
    # rotate behind it. The tail is the rest of the r14-verified
    # window followed by the r15-verified block.
    return {
        # -- (a) the r13-verified window (47)
        "ffill": q_ffill,
        "normalize_minmax": q_normalize_minmax,
        "min_step": q_min_step,
        "next_version": q_next_version,
        "chunk_index": q_chunk_index,
        "freq_fix": q_freq_fix,
        "split_at": q_split_at,
        "store_roundtrip": q_store_roundtrip,
        "store_set_many": q_store_set_many,
        "store_update_overlay": q_store_update_overlay,
        "store_delete_tombstone": q_store_delete_tombstone,
        "store_meta_aggregates": q_store_meta_aggregates,
        "store_max_horodate": q_store_max_horodate,
        "store_get_batch": q_store_get_batch,
        "store_yield_many": q_store_yield_many,
        "store_changefeed": q_store_changefeed,
        "store_acid_ops": q_store_acid_ops,
        "store_txn": q_store_txn,
        "kv_find_holes": q_kv_find_holes,
        "kv_clear": q_kv_clear,
        "kv_acid_ops": q_kv_acid_ops,
        "sync_pull": q_sync_pull,
        "sync_tombstone": q_sync_tombstone,
        "sync_guards": q_sync_guards,
        "sync_paged": q_sync_paged,
        "admin_export": q_admin_export,
        "dedup_index_forget": q_dedup_index_forget,
        "ivfpq_persisted": q_ivfpq_persisted,
        "ivf_persisted": q_ivf_persisted,
        "dedup_index_replay": q_dedup_index_replay,
        "similarity_ivf": q_similarity_ivf,
        "dedup_spans": q_dedup_spans,
        "knn_graph": q_knn_graph,
        "domain_cap": q_domain_cap,
        "dsir_select": q_dsir_select,
        "stream_quota": q_stream_quota,
        "dedup_spans_incr": q_dedup_spans_incr,
        "rebalance_mix": q_rebalance_mix,
        "stream_sessions": q_stream_sessions,
        "stream_dedup": q_stream_dedup,
        "pricing_summary": q_pricing_summary,
        "top_revenue": q_top_revenue,
        "regional_revenue": q_regional_revenue,
        "dedup_exact": q_dedup_exact,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_simhash": q_dedup_simhash,
        "dedup_clusters": q_dedup_clusters,
        # -- (b) new in r16 (2)
        "image_neardup": q_image_neardup,
        "image_dedup_incr": q_image_dedup_incr,
        # -- tail: r14-verified window
        "segment_dedup": q_segment_dedup,
        "token_pack": q_token_pack,
        "lookup_filter": q_lookup_filter,
        "clean_corpus": q_clean_corpus,
        "clean_corpus_cc": q_clean_corpus_cc,
        "similarity_bruteforce": q_similarity_bruteforce,
        "semantic_dedup": q_semantic_dedup,
        "semantic_dedup_capped": q_semantic_dedup_capped,
        "attr_store_update": q_attr_store_update,
        "rest_sync_pull": q_rest_sync_pull,
        "kv_store_overlay": q_kv_store_overlay,
        "blob_interop": q_blob_interop,
        "multimodal_meta": q_multimodal_meta,
        "multimodal_decode": q_multimodal_decode,
        "multimodal_jpeg": q_multimodal_jpeg,
        "multimodal_png": q_multimodal_png,
        "multimodal_audio": q_multimodal_audio,
        "multimodal_video": q_multimodal_video,
        "pq_encode": q_pq_encode,
        "similarity_lsh": q_similarity_lsh,
        "doc_fingerprints": q_doc_fingerprints,
        "similarity_neardup": q_similarity_neardup,
        "text_stats": q_text_stats,
        "lang_quality": q_lang_quality,
        "token_bpe": q_token_bpe,
        "hash_split": q_hash_split,
        "stratified_sample": q_stratified_sample,
        "repetition_stats": q_repetition_stats,
        "pii_redact": q_pii_redact,
        "vocab_topk": q_vocab_topk,
        "dedup_representatives": q_dedup_representatives,
        "quality_filter": q_quality_filter,
        "stats_rollup": q_stats_rollup,
        "disaggregate": q_disaggregate,
        "time_slice": q_time_slice,
        "value_histogram": q_value_histogram,
        "doc_chunks": q_doc_chunks,
        "c4_quality": q_c4_quality,
        "span_strip": q_span_strip,
        "span_strip_incr": q_span_strip_incr,
        "span_index_replay": q_span_index_replay,
        "span_index_forget": q_span_index_forget,
        "bm25_indexed": q_bm25_indexed,
        "hybrid_indexed": q_hybrid_indexed,
        "knn_graph_indexed": q_knn_graph_indexed,
        "hybrid_search": q_hybrid_search,
        "bm25_search": q_bm25_search,
        "dedup_minhash": q_dedup_minhash,
        "dedup_incremental": q_dedup_incremental,        # -- tail: r15-verified block (the old 44-query window, the 5
        # -- r15 debuts and the value-changed gopher_quality)
        "embed_quantize": q_embed_quantize,
        "lm_surprisal": q_lm_surprisal,
        "sliding_rollup": q_sliding_rollup,
        "temperature_sample": q_temperature_sample,
        "stream_sliding": q_stream_sliding,
        "collocations": q_collocations,
        "normalize_text": q_normalize_text,
        "corpus_prep": q_corpus_prep,
        "rolling_stats": q_rolling_stats,
        "forecast_revenue": q_forecast_revenue,
        "order_priority": q_order_priority,
        "large_orders": q_large_orders,
        "cusum_drift": q_cusum_drift,
        "store_cdf": q_store_cdf,
        "stream_cdf": q_stream_cdf,
        "overlay_merge": q_overlay_merge,
        "completeness_holes": q_completeness_holes,
        "merge_intervals": q_merge_intervals,
        "interval_algebra": q_interval_algebra,
        "constant_runs": q_constant_runs,
        "drop_bounds_na": q_drop_bounds_na,
        "combined_delay": q_combined_delay,
        "stream_rollup": q_stream_rollup,
        "similarity_filtered": q_similarity_filtered,
        "pq_filtered": q_pq_filtered,
        "pq_topk": q_pq_topk,
        "stream_gaps": q_stream_gaps,
        "multimodal_resize": q_multimodal_resize,
        "multimodal_frames": q_multimodal_frames,
        "stream_cusum": q_stream_cusum,
        "bpe_merges": q_bpe_merges,
        "seasonal_profile": q_seasonal_profile,
        "stream_join": q_stream_join,
        "contamination": q_contamination,
        "tfidf_terms": q_tfidf_terms,
        "asof_join": q_asof_join,
        "sessionize": q_sessionize,
        "time_rollup": q_time_rollup,
        "range_join": q_range_join,
        "event_rollup": q_event_rollup,
        "store_restore": q_store_restore,
        "store_optimize": q_store_optimize,
        "cluster_balance": q_cluster_balance,
        "slice_with_delay": q_slice_with_delay,
        # -- (b) new in r15 (5)
        "bm25_recompute": q_bm25_recompute,
        "knn_graph_delta": q_knn_graph_delta,
        "stream_pipeline": q_stream_pipeline,
        "multimodal_progressive": q_multimodal_progressive,
        "multimodal_mjpeg": q_multimodal_mjpeg,
        # -- (c) values changed in r15 (1)
        "gopher_quality": q_gopher_quality,

    }


def oracle_sql() -> dict[str, str]:
    ev = _EVENTS_VERSIONED_SQL
    overlay = f"""
        WITH e AS ({ev}),
        r AS (
            SELECT user_id, hts, value2,
                   row_number() OVER (
                       PARTITION BY user_id, hts
                       ORDER BY (value2 IS NULL) ASC, version DESC, event_id ASC
                   ) AS rn
            FROM e
        )
        SELECT user_id, strftime(hts, '{_FMT_DUCK}') AS ts_str, value2 AS val
        FROM r WHERE rn = 1
    """
    combined_delay = f"""
        WITH e AS ({ev}),
        cut AS (
            SELECT * FROM (
                SELECT *, min(hts) OVER (PARTITION BY user_id, version) AS mn
                FROM e
            ) WHERE hts >= mn + INTERVAL 6 HOUR
        ),
        r AS (
            SELECT user_id, hts, value2,
                   row_number() OVER (
                       PARTITION BY user_id, hts
                       ORDER BY (value2 IS NULL) ASC, version DESC, event_id ASC
                   ) AS rn
            FROM cut
        )
        SELECT user_id, strftime(hts, '{_FMT_DUCK}') AS ts_str, value2 AS val
        FROM r WHERE rn = 1
    """
    holes = f"""
        WITH p AS (
            SELECT DISTINCT user_id, date_trunc('hour', ts) AS hts
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        ),
        users AS (SELECT DISTINCT user_id FROM p),
        grid AS (
            SELECT u.user_id, g.ts
            FROM users u
            CROSS JOIN (
                SELECT unnest(generate_series(
                    TIMESTAMP '2024-01-01',
                    TIMESTAMP '2024-01-07 23:00:00',
                    INTERVAL 1 HOUR)) AS ts
            ) g
        ),
        j AS (
            SELECT g.user_id, g.ts, (p.hts IS NOT NULL) AS present
            FROM grid g LEFT JOIN p
              ON p.user_id = g.user_id AND p.hts = g.ts
        ),
        flagged AS (
            SELECT *, CASE WHEN lag(present) OVER w IS DISTINCT FROM present
                           THEN 1 ELSE 0 END AS flag
            FROM j
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        runs AS (
            SELECT *, sum(flag) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
            FROM flagged
        )
        SELECT user_id,
               strftime(min(ts), '{_FMT_DUCK}') AS hole_start,
               strftime(max(ts), '{_FMT_DUCK}') AS hole_end
        FROM runs WHERE NOT present
        GROUP BY user_id, run_id
    """
    constant_runs = f"""
        WITH e AS ({ev}),
        d AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN value2 IS NOT NULL
                        THEN CAST(floor(value2 / 50) AS BIGINT) END AS bucket
            FROM e
        ),
        flagged AS (
            SELECT *, CASE WHEN row_number() OVER w = 1 THEN 1
                           WHEN bucket IS DISTINCT FROM lag(bucket) OVER w
                           THEN 1 ELSE 0 END AS flag
            FROM d
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        runs AS (
            SELECT *, sum(flag) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
            FROM flagged
        )
        SELECT user_id,
               strftime(min(ts), '{_FMT_DUCK}') AS run_start,
               strftime(max(ts), '{_FMT_DUCK}') AS run_end,
               min(bucket) AS bucket,
               count(*) AS run_len
        FROM runs
        GROUP BY user_id, run_id
    """
    merge_intervals = f"""
        WITH iv AS (
            SELECT user_id, ts AS s,
                   ts + to_hours(CAST(floor(value / 10) AS BIGINT)) AS e
            FROM events
        ),
        flagged AS (
            SELECT *, CASE WHEN max_prev IS NULL OR s > max_prev THEN 1 ELSE 0 END AS new_island
            FROM (
                SELECT *, max(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_prev
                FROM iv
            )
        ),
        runs AS (
            SELECT *, sum(new_island) OVER (
                PARTITION BY user_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
            FROM flagged
        )
        SELECT user_id,
               strftime(min(s), '{_FMT_DUCK}') AS start_str,
               strftime(max(e), '{_FMT_DUCK}') AS end_str
        FROM runs GROUP BY user_id, island
    """
    drop_bounds_na = f"""
        WITH e AS ({ev}),
        hourly AS (
            SELECT user_id, hts AS ts, max(value2) AS value
            FROM e GROUP BY user_id, hts
        ),
        grid AS (
            SELECT u.user_id, g.ts
            FROM (SELECT DISTINCT user_id FROM hourly) u
            CROSS JOIN (
                SELECT unnest(generate_series(
                    TIMESTAMP '2024-01-01',
                    TIMESTAMP '2024-01-30 23:00:00',
                    INTERVAL 1 HOUR)) AS ts
            ) g
        ),
        j AS (
            SELECT g.user_id, g.ts, h.value
            FROM grid g LEFT JOIN hourly h
              ON h.user_id = g.user_id AND h.ts = g.ts
        ),
        bounds AS (
            SELECT user_id,
                   min(ts) FILTER (value IS NOT NULL) AS fv,
                   max(ts) FILTER (value IS NOT NULL) AS lv
            FROM j GROUP BY user_id
        )
        SELECT j.user_id,
               count(*) AS n_rows,
               count(j.value) AS n_valid,
               CAST(sum(CAST(j.value AS DECIMAL(28,6))) AS DOUBLE) AS total
        FROM j JOIN bounds b ON j.user_id = b.user_id
        WHERE j.ts BETWEEN b.fv AND b.lv
        GROUP BY j.user_id
    """
    slice_with_delay = """
        WITH cut AS (
            SELECT * FROM (
                SELECT *, min(ts) OVER (PARTITION BY user_id) AS mn FROM events
            ) WHERE ts >= mn + INTERVAL 6 HOUR
        )
        SELECT user_id, count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total
        FROM cut GROUP BY user_id
    """
    split_at = """
        WITH b AS (
            SELECT user_id, count(*) AS n_before FROM events
            WHERE ts <= TIMESTAMP '2024-01-15 12:00:00' GROUP BY user_id
        ),
        a AS (
            SELECT user_id, count(*) AS n_after FROM events
            WHERE ts >= TIMESTAMP '2024-01-15 12:00:00' GROUP BY user_id
        )
        SELECT coalesce(b.user_id, a.user_id) AS user_id,
               coalesce(n_before, 0) AS n_before,
               coalesce(n_after, 0) AS n_after
        FROM b FULL JOIN a ON b.user_id = a.user_id
    """
    time_slice = f"""
        SELECT event_id, user_id, strftime(ts, '{_FMT_DUCK}') AS ts_str
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
    """
    ffill = f"""
        WITH e AS ({ev})
        SELECT event_id, user_id,
               last_value(value2 IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        FROM e
    """
    normalize_minmax = """
        SELECT event_id, user_id,
               CASE WHEN mx <> mn THEN (value - mn) / (mx - mn) END AS value_norm
        FROM (
            SELECT *, min(value) OVER (PARTITION BY user_id) AS mn,
                      max(value) OVER (PARTITION BY user_id) AS mx
            FROM events
        )
    """
    min_step = """
        SELECT user_id,
               min(epoch_us(ts) // 1000000 - epoch_us(prev) // 1000000) AS min_step_seconds
        FROM (
            SELECT user_id, ts,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
            FROM events
        )
        GROUP BY user_id
    """
    disaggregate = f"""
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS ts,
                   CAST(count(*) AS DOUBLE) AS ref
            FROM events GROUP BY 1, 2
        ),
        daily AS (
            SELECT user_id, date_trunc('day', ts) AS day,
                   CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS day_total
            FROM events GROUP BY 1, 2
        ),
        base AS (
            SELECT h.user_id, h.ts, h.ref,
                   CASE WHEN row_number() OVER (
                            PARTITION BY h.user_id, date_trunc('day', h.ts)
                            ORDER BY h.ts) = 1
                        THEN d.day_total END AS feat
            FROM hourly h
            LEFT JOIN daily d
              ON d.user_id = h.user_id AND d.day = date_trunc('day', h.ts)
        ),
        filled AS (
            SELECT *, last_value(feat IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS featf
            FROM base
        )
        SELECT user_id, strftime(ts, '{_FMT_DUCK}') AS ts_str,
               CASE WHEN mean_ref <> 0 THEN featf * ref / mean_ref END AS val
        FROM (
            SELECT *, avg(ref) OVER (
                PARTITION BY user_id, date_trunc('day', ts)) AS mean_ref
            FROM filled
        )
    """
    next_version = f"""
        WITH e AS ({ev})
        SELECT user_id, CAST(max(version) + 1 AS INT) AS version
        FROM e GROUP BY user_id
    """
    chunk_index = """
        SELECT event_id,
               CAST(year(timezone('Europe/Paris', timezone('UTC', ts))) AS INT) AS ci_year,
               CAST(year(timezone('Europe/Paris', timezone('UTC', ts))) * 12
                    + month(timezone('Europe/Paris', timezone('UTC', ts))) - 1 AS INT) AS ci_ym
        FROM events
    """
    lookup_filter = """
        SELECT event_id, user_id, event_type, value
        FROM events
        WHERE event_type IN ('click', 'view', 'purchase')
          AND value >= 25.0 AND user_id < 12 AND event_type <> 'view'
        ORDER BY value DESC, event_id ASC
        LIMIT 50 OFFSET 5
    """
    store_roundtrip = """
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS ts, max(value) AS value
            FROM events GROUP BY 1, 2
        )
        SELECT user_id, count(*) AS n_points,
               CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total
        FROM hourly
        WHERE ts >= TIMESTAMP '2024-01-05' AND ts <= TIMESTAMP '2024-01-25'
        GROUP BY user_id
    """
    attr_store_update = """
        WITH hourly AS (
            SELECT user_id % 10 AS grp, date_trunc('hour', ts) AS hts
            FROM events GROUP BY 1, 2
        )
        SELECT grp, count(*) AS n_points,
               CAST(epoch(min(hts)) AS DOUBLE) AS first_epoch,
               CAST(epoch(max(hts)) AS DOUBLE) AS last_epoch
        FROM hourly GROUP BY grp
    """
    kv_find_holes = f"""
        WITH daily AS (
            SELECT user_id, date_trunc('day', ts) AS day, max(value) AS v
            FROM events GROUP BY 1, 2
        ),
        kept AS (
            SELECT user_id, day FROM daily
            WHERE CAST(trunc(v) AS BIGINT) % 3 <> 0
        ),
        users AS (SELECT DISTINCT user_id FROM kept),
        grid AS (
            SELECT u.user_id, g.ts
            FROM users u CROSS JOIN (
                SELECT unnest(generate_series(
                    TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-30',
                    INTERVAL 1 DAY)) AS ts
            ) g
        ),
        j AS (
            SELECT g.user_id, g.ts, (k.day IS NOT NULL) AS present
            FROM grid g LEFT JOIN kept k
              ON k.user_id = g.user_id AND k.day = g.ts
        ),
        flagged AS (
            SELECT *, CASE WHEN lag(present) OVER w IS DISTINCT FROM present
                           THEN 1 ELSE 0 END AS flag
            FROM j
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        runs AS (
            SELECT *, sum(flag) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
            FROM flagged
        )
        SELECT user_id,
               strftime(min(ts), '{_FMT_DUCK}') AS hole_start,
               strftime(max(ts), '{_FMT_DUCK}') AS hole_end
        FROM runs WHERE NOT present
        GROUP BY user_id, run_id
    """
    store_update_overlay = """
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS ts, max(value) AS value
            FROM events GROUP BY 1, 2
        ),
        merged AS (
            SELECT user_id, ts,
                   CASE WHEN ts >= TIMESTAMP '2024-01-10'
                         AND ts < TIMESTAMP '2024-01-15'
                        THEN value * 2 ELSE value END AS value
            FROM hourly
        )
        SELECT user_id, count(*) AS n_points,
               CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total
        FROM merged GROUP BY user_id
    """
    store_delete_tombstone = """
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS ts
            FROM events GROUP BY 1, 2
        )
        SELECT user_id, count(*) AS n_points
        FROM hourly WHERE user_id % 5 <> 0
        GROUP BY user_id
    """
    # ACID backend lifecycle: insert + doubled mid-Jan update patch +
    # tombstone of every 7th user, on the transaction-log store
    store_acid_ops = """
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS ts, max(value) AS value
            FROM events GROUP BY 1, 2
        ),
        merged AS (
            SELECT user_id, ts,
                   CASE WHEN ts >= TIMESTAMP '2024-01-10'
                         AND ts < TIMESTAMP '2024-01-15'
                        THEN value * 2 ELSE value END AS value
            FROM hourly
        )
        SELECT user_id, count(*) AS n_points,
               CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total
        FROM merged WHERE user_id % 7 <> 0
        GROUP BY user_id
    """
    # restore(v1) rolls the patch back: the oracle is the ORIGINAL
    # hourly series, un-patched
    store_restore = """
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS ts, max(value) AS value
            FROM events GROUP BY 1, 2
        )
        SELECT user_id, count(*) AS n_points,
               CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total
        FROM hourly WHERE value IS NOT NULL
        GROUP BY user_id
    """
    store_max_horodate = f"""
        SELECT user_id,
               strftime(max(date_trunc('hour', ts)), '{_FMT_DUCK}') AS max_ts
        FROM events
        GROUP BY user_id
    """
    store_yield_many = f"""
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS ts
            FROM events GROUP BY 1, 2
        )
        SELECT user_id, count(*) AS n_points,
               strftime(min(ts), '{_FMT_DUCK}') AS first_ts,
               strftime(max(ts), '{_FMT_DUCK}') AS last_ts
        FROM hourly GROUP BY user_id
    """
    # batched get_many_ts: hourly aggregates for every 3rd user inside
    # the requested [2024-01-05, 2024-01-20] range
    store_get_batch = f"""
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS ts
            FROM events GROUP BY 1, 2
        )
        SELECT user_id, count(*) AS n_points,
               strftime(min(ts), '{_FMT_DUCK}') AS first_ts,
               strftime(max(ts), '{_FMT_DUCK}') AS last_ts
        FROM hourly
        WHERE user_id % 3 = 0
          AND ts >= TIMESTAMP '2024-01-05'
          AND ts <= TIMESTAMP '2024-01-20'
        GROUP BY user_id
    """
    kv_store_overlay = f"""
        WITH e AS ({ev}),
        hourly AS (
            SELECT user_id, version, hts, max(value2) AS v
            FROM e GROUP BY 1, 2, 3
        ),
        r AS (
            SELECT user_id, hts, v,
                   row_number() OVER (
                       PARTITION BY user_id, hts
                       ORDER BY (v IS NULL) ASC, version DESC
                   ) AS rn
            FROM hourly
        )
        SELECT user_id, strftime(hts, '{_FMT_DUCK}') AS ts_str, v AS val
        FROM r WHERE rn = 1
    """
    pricing_summary = """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2024-09-01'
        GROUP BY l_returnflag, l_linestatus
    """
    top_revenue = """
        WITH rev AS (
            SELECT l_orderkey,
                   sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS revenue_dec
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT o_orderkey, c_name, CAST(revenue_dec AS DOUBLE) AS revenue
        FROM orders
        JOIN rev ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY revenue_dec DESC, o_orderkey ASC
        LIMIT 20
    """
    # ---- LLM-pipeline oracles (generated where repetitive) ----
    dedup_exact = f"""
        WITH src AS ({_DOCS_WITH_DUPS_SQL}),
        kept AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY md5(text) ORDER BY doc_id ASC) AS rn
                FROM src
            ) WHERE rn = 1
        )
        SELECT b.source, b.n_before, a.n_after
        FROM (SELECT source, count(*) AS n_before FROM src GROUP BY source) b
        JOIN (SELECT source, count(*) AS n_after FROM kept GROUP BY source) a
          ON b.source = a.source
    """
    # 16 minhash slices, 4 bands of 4 — mirrors operators.dedup exactly
    mh_exprs = ",\n               ".join(
        f"list_aggregate(list_transform(sh, s -> substr(md5(concat('{j}|', s)), 1, 8)), 'min') AS mh_{j}"
        for j in range(16)
    )
    band_rows = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band_id, "
        f"concat_ws('|', {', '.join(f'mh_{j}' for j in range(b * 4, b * 4 + 4))}) AS band_key "
        f"FROM sigs"
        for b in range(4)
    )
    dedup_minhash = f"""
        WITH src AS ({_DOCS_WITH_DUPS_SQL}),
        shingled AS ({_SHINGLES_SQL}),
        sigs AS (
            SELECT doc_id,
               {mh_exprs}
            FROM shingled
        ),
        bands AS ({band_rows})
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        FROM bands l JOIN bands r
          ON l.band_id = r.band_id AND l.band_key = r.band_key
        WHERE l.doc_id < r.doc_id
    """
    dedup_incremental_sql = f"""
        WITH src AS ({_DOCS_WITH_DUPS_SQL}),
        shingled AS ({_SHINGLES_SQL}),
        sigs AS (
            SELECT doc_id,
               {mh_exprs}
            FROM shingled
        ),
        bands AS ({band_rows}),
        new_bands AS (SELECT * FROM bands WHERE doc_id % 3 = 0),
        old_bands AS (SELECT * FROM bands WHERE doc_id % 3 <> 0),
        dropped AS (
            SELECT DISTINCT nb.doc_id FROM new_bands nb
            WHERE EXISTS (
                    SELECT 1 FROM old_bands ob
                    WHERE ob.band_id = nb.band_id
                      AND ob.band_key = nb.band_key)
               OR EXISTS (
                    SELECT 1 FROM new_bands nb2
                    WHERE nb2.band_id = nb.band_id
                      AND nb2.band_key = nb.band_key
                      AND nb2.doc_id < nb.doc_id)
        )
        SELECT doc_id, source FROM src
        WHERE doc_id % 3 = 0
          AND doc_id NOT IN (SELECT doc_id FROM dropped)
    """
    # transitive closure of the pair graph via recursive CTE: every node's
    # cluster id is the minimum node id it can reach
    dedup_clusters = f"""
        WITH RECURSIVE src AS ({_DOCS_WITH_DUPS_SQL}),
        shingled AS ({_SHINGLES_SQL}),
        sigs AS (
            SELECT doc_id,
               {mh_exprs}
            FROM shingled
        ),
        bands AS ({band_rows}),
        pairs AS (
            SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
            FROM bands l JOIN bands r
              ON l.band_id = r.band_id AND l.band_key = r.band_key
            WHERE l.doc_id < r.doc_id
        ),
        sym AS (
            SELECT id_a AS a, id_b AS b FROM pairs
            UNION
            SELECT id_b AS a, id_a AS b FROM pairs
        ),
        reach(node, comp) AS (
            SELECT a, a FROM sym
            UNION
            SELECT s.a, r.comp FROM sym s JOIN reach r ON s.b = r.node
        ),
        comp AS (
            SELECT node AS doc_id, min(comp) AS cluster_id
            FROM reach GROUP BY node
        )
        SELECT c.doc_id, c.cluster_id, s.cluster_size
        FROM comp c
        JOIN (SELECT cluster_id, count(*) AS cluster_size
              FROM comp GROUP BY cluster_id) s USING (cluster_id)
    """
    # same CTE chain as dedup_clusters, finished with per-cluster survivor
    # selection: rep = first doc ordered by (n_chars DESC, doc_id ASC)
    dedup_representatives = f"""
        WITH RECURSIVE src AS ({_DOCS_WITH_DUPS_SQL}),
        shingled AS ({_SHINGLES_SQL}),
        sigs AS (
            SELECT doc_id,
               {mh_exprs}
            FROM shingled
        ),
        bands AS ({band_rows}),
        pairs AS (
            SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
            FROM bands l JOIN bands r
              ON l.band_id = r.band_id AND l.band_key = r.band_key
            WHERE l.doc_id < r.doc_id
        ),
        sym AS (
            SELECT id_a AS a, id_b AS b FROM pairs
            UNION
            SELECT id_b AS a, id_a AS b FROM pairs
        ),
        reach(node, comp) AS (
            SELECT a, a FROM sym
            UNION
            SELECT s.a, r.comp FROM sym s JOIN reach r ON s.b = r.node
        ),
        comp AS (
            SELECT node AS doc_id, min(comp) AS cluster_id
            FROM reach GROUP BY node
        )
        SELECT c.cluster_id,
               first(c.doc_id ORDER BY s.n_chars DESC, c.doc_id ASC) AS rep_id,
               count(*) AS cluster_size,
               count(*) - 1 AS n_dropped
        FROM comp c JOIN src s USING (doc_id)
        GROUP BY c.cluster_id
    """
    dedup_jaccard = f"""
        WITH src AS ({_DOCS_WITH_DUPS_SQL}),
        shingled AS ({_SHINGLES_SQL}),
        sigs AS (
            SELECT doc_id,
               {mh_exprs}
            FROM shingled
        ),
        bands AS ({band_rows}),
        pairs AS (
            SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
            FROM bands l JOIN bands r
              ON l.band_id = r.band_id AND l.band_key = r.band_key
            WHERE l.doc_id < r.doc_id
        ),
        sets AS (SELECT doc_id, list_distinct(sh) AS shd FROM shingled)
        SELECT p.id_a, p.id_b,
               CAST(len(list_intersect(a.shd, b.shd)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.shd, b.shd))) AS jaccard
        FROM pairs p
        JOIN sets a ON a.doc_id = p.id_a
        JOIN sets b ON b.doc_id = p.id_b
        WHERE CAST(len(list_intersect(a.shd, b.shd)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.shd, b.shd))) >= 0.5
    """
    quant = "list_transform(embedding::DOUBLE[], x -> CAST(round(x*1000) AS BIGINT))"
    similarity_bruteforce = f"""
        WITH q AS (
            SELECT vec_id AS q_id, {quant} AS qq
            FROM embeddings WHERE vec_id % 100 = 0
        ),
        c AS (SELECT vec_id AS neighbor_id, {quant} AS cq FROM embeddings),
        scored AS (
            SELECT q.q_id, c.neighbor_id,
                   list_dot_product(qq::DOUBLE[], cq::DOUBLE[])
                     / (sqrt(list_dot_product(qq::DOUBLE[], qq::DOUBLE[]))
                        * sqrt(list_dot_product(cq::DOUBLE[], cq::DOUBLE[]))) AS score
            FROM q CROSS JOIN c
            WHERE c.neighbor_id <> q.q_id
        )
        SELECT q_id, neighbor_id, score
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY score DESC, neighbor_id ASC) AS rk
            FROM scored
        ) WHERE rk <= 3
    """
    # RRF hybrid: the verified bm25 chain + the verified bruteforce
    # chain (query vector 0), fused by 1/(60+rank) as a FIXED binary
    # double expression — every float literal CAST AS DOUBLE (DuckDB
    # would otherwise do exact DECIMAL arithmetic; see bm25_search)
    hybrid_search_sql = f"""
        WITH dl AS (
            SELECT doc_id,
                   CASE WHEN text IS NULL THEN 0
                        ELSE len(string_split(text, ' ')) END AS dl
            FROM documents
        ),
        s AS (SELECT count(*) AS n_docs,
                     CAST(sum(dl) AS BIGINT) AS total_dl FROM dl),
        hits AS (
            SELECT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents)
            WHERE tok IN ('hash', 'join', 'scan')
        ),
        tfx AS (SELECT doc_id, tok, count(*) AS tf
                FROM hits GROUP BY doc_id, tok),
        dfq AS (SELECT tok, count(*) AS df FROM tfx GROUP BY tok),
        raw AS (
            SELECT t.doc_id,
                   CAST(floor(((((CAST(s.n_docs AS DOUBLE) - d.df
                                  + 0.5) / (d.df + 0.5))
                                + CAST(1.0 AS DOUBLE))
                               * CAST(65536.0 AS DOUBLE))) AS BIGINT)
                       AS m,
                   ((t.tf * CAST({1.2 + 1.0!r} AS DOUBLE))
                      / (t.tf + CAST({1.2!r} AS DOUBLE)
                         * (CAST({1.0 - 0.75!r} AS DOUBLE)
                         + CAST({0.75!r} AS DOUBLE) * (l.dl
                           / (CAST(s.total_dl AS DOUBLE)
                              / s.n_docs))))) AS tff
            FROM tfx t JOIN dfq d USING (tok) JOIN dl l USING (doc_id)
            CROSS JOIN s
        ),
        bl AS (SELECT doc_id, m, tff,
                      CAST(length(bin(m)) - 1 AS INT) AS e FROM raw),
        contrib AS (
            SELECT doc_id,
                   CAST(floor((((e - 16)
                                + (m - (CAST(1 AS BIGINT) << e))
                                  / CAST((CAST(1 AS BIGINT) << e)
                                         AS DOUBLE))
                               * tff)
                              * 1000000.0 + 0.5) AS BIGINT) AS q
            FROM bl
        ),
        bm AS (
            SELECT doc_id,
                   row_number() OVER (
                       ORDER BY score_micro DESC, doc_id ASC) AS r
            FROM (SELECT doc_id, CAST(sum(q) AS BIGINT) AS score_micro
                  FROM contrib GROUP BY doc_id)
            ORDER BY score_micro DESC, doc_id ASC LIMIT 10
        ),
        qv AS (SELECT {quant} AS qq FROM embeddings WHERE vec_id = 0),
        cv AS (SELECT vec_id AS neighbor_id, {quant} AS cq FROM embeddings),
        vscored AS (
            SELECT c.neighbor_id,
                   list_dot_product(qq::DOUBLE[], cq::DOUBLE[])
                     / (sqrt(list_dot_product(qq::DOUBLE[], qq::DOUBLE[]))
                        * sqrt(list_dot_product(cq::DOUBLE[], cq::DOUBLE[]))) AS score
            FROM qv CROSS JOIN cv c
            WHERE c.neighbor_id <> 0
        ),
        vec AS (
            SELECT neighbor_id AS doc_id,
                   row_number() OVER (
                       ORDER BY score DESC, neighbor_id ASC) AS r
            FROM vscored ORDER BY score DESC, neighbor_id ASC LIMIT 10
        ),
        fused AS (
            SELECT coalesce(bm.doc_id, vec.doc_id) AS doc_id,
                   (CASE WHEN bm.r IS NOT NULL THEN 1 ELSE 0 END
                    + CASE WHEN vec.r IS NOT NULL THEN 1 ELSE 0 END)
                       AS n_lists,
                   (coalesce(CAST(1.0 AS DOUBLE)
                             / (CAST(60.0 AS DOUBLE) + bm.r),
                             CAST(0.0 AS DOUBLE))
                    + coalesce(CAST(1.0 AS DOUBLE)
                               / (CAST(60.0 AS DOUBLE) + vec.r),
                               CAST(0.0 AS DOUBLE))) AS rrf_score
            FROM bm FULL OUTER JOIN vec ON bm.doc_id = vec.doc_id
        )
        SELECT doc_id, n_lists, rrf_score,
               CAST(row_number() OVER (
                   ORDER BY rrf_score DESC, doc_id ASC) AS INT) AS fused_rank
        FROM fused ORDER BY rrf_score DESC, doc_id ASC LIMIT 10
    """
    signs = _lsh_sign_vectors(4, 64)
    bucket_bits = " || ".join(
        f"(CASE WHEN list_dot_product(vq::DOUBLE[], "
        f"[{', '.join(f'{s}.0' for s in signs[p])}]::DOUBLE[]) > 0 "
        f"THEN '1' ELSE '0' END)"
        for p in range(4)
    )
    similarity_lsh = f"""
        WITH v AS (
            SELECT vec_id, {quant} AS vq FROM embeddings
        ),
        b AS (SELECT vec_id, vq, {bucket_bits} AS bucket FROM v),
        q AS (SELECT vec_id AS q_id, vq AS qq, bucket FROM b WHERE vec_id % 100 = 0),
        scored AS (
            SELECT q.q_id, c.vec_id AS neighbor_id,
                   list_dot_product(qq::DOUBLE[], vq::DOUBLE[])
                     / (sqrt(list_dot_product(qq::DOUBLE[], qq::DOUBLE[]))
                        * sqrt(list_dot_product(vq::DOUBLE[], vq::DOUBLE[]))) AS score
            FROM q JOIN b c USING (bucket)
            WHERE c.vec_id <> q.q_id
        )
        SELECT q_id, neighbor_id, score
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY score DESC, neighbor_id ASC) AS rk
            FROM scored
        ) WHERE rk <= 3
    """
    # IVF oracle: the same deterministic integer k-means, unrolled. Spark's
    # centroid update is (decimal sum / count) cast to long = truncation
    # toward zero — trunc(sum/count) here. Assignment ties go to the lowest
    # centroid index in both engines (ORDER BY dist, i).
    def _ivf_dist(a: str, b: str) -> str:
        return (
            f"list_sum(list_transform(range(1, 65), "
            f"d -> ({a}[d] - {b}[d]) * ({a}[d] - {b}[d])))"
        )

    def _ivf_assign(cents: str) -> str:
        """Nearest-centroid assignment of every vector in v against
        centroid table `cents`(i, cv)."""
        return f"""
            SELECT vec_id, vq, i AS list FROM (
                SELECT v.vec_id, v.vq, s.i,
                       row_number() OVER (PARTITION BY v.vec_id
                           ORDER BY {_ivf_dist('v.vq', 's.cv')}, s.i) AS rk
                FROM v CROSS JOIN {cents} s
            ) WHERE rk = 1
        """

    def _ivf_update(assigned: str, prev: str) -> str:
        """Truncated-mean centroid update; empty lists keep prev values."""
        return f"""
            SELECT s.i, coalesce(u.cv, s.cv) AS cv
            FROM {prev} s LEFT JOIN (
                SELECT list, list(m ORDER BY d) AS cv FROM (
                    SELECT list, d,
                           CAST(trunc(CAST(sum(vq[d]) AS DOUBLE) / count(*))
                                AS BIGINT) AS m
                    FROM {assigned}, range(1, 65) t(d)
                    GROUP BY list, d
                ) GROUP BY list
            ) u ON u.list = s.i
        """

    similarity_ivf = f"""
        WITH v AS (SELECT vec_id, {quant} AS vq FROM embeddings),
        seeds AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS i, vq AS cv
            FROM (SELECT vec_id, vq FROM v ORDER BY vec_id LIMIT 16)
        ),
        a1 AS ({_ivf_assign('seeds')}),
        c1 AS ({_ivf_update('a1', 'seeds')}),
        a2 AS ({_ivf_assign('c1')}),
        c2 AS ({_ivf_update('a2', 'c1')}),
        cand AS ({_ivf_assign('c2')}),
        probes AS (
            SELECT vec_id AS q_id, vq AS qq, i AS list FROM (
                SELECT v.vec_id, v.vq, s.i,
                       row_number() OVER (PARTITION BY v.vec_id
                           ORDER BY {_ivf_dist('v.vq', 's.cv')}, s.i) AS rk
                FROM v CROSS JOIN c2 s
                WHERE v.vec_id % 100 = 0
            ) WHERE rk <= 2
        ),
        scored AS (
            SELECT p.q_id, c.vec_id AS neighbor_id,
                   list_dot_product(p.qq::DOUBLE[], c.vq::DOUBLE[])
                     / (sqrt(list_dot_product(p.qq::DOUBLE[], p.qq::DOUBLE[]))
                        * sqrt(list_dot_product(c.vq::DOUBLE[], c.vq::DOUBLE[]))) AS score
            FROM probes p JOIN cand c USING (list)
            WHERE c.vec_id <> p.q_id
        )
        SELECT q_id, neighbor_id, score
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY score DESC, neighbor_id ASC) AS rk
            FROM scored
        ) WHERE rk <= 3
    """
    # Indexed hybrid retrieval: the SAME bm25 chain as bm25_search
    # (LexicalIndex shares the operator's scoring tail, so the indexed
    # lexical ranks equal the scan ranks bit-for-bit) fused with the
    # PERSISTED-IVF ANN ranks around query vector 0 (same deterministic
    # k-means as similarity_ivf — single-batch append trains
    # identically), by the rrf_fuse fixed expression tree
    hybrid_indexed_sql = f"""
        WITH dl AS (
            SELECT doc_id,
                   CASE WHEN text IS NULL THEN 0
                        ELSE len(string_split(text, ' ')) END AS dl
            FROM documents
        ),
        s AS (SELECT count(*) AS n_docs,
                     CAST(sum(dl) AS BIGINT) AS total_dl FROM dl),
        hits AS (
            SELECT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents)
            WHERE tok IN ('hash', 'join', 'scan')
        ),
        tfx AS (SELECT doc_id, tok, count(*) AS tf
                FROM hits GROUP BY doc_id, tok),
        dfq AS (SELECT tok, count(*) AS df FROM tfx GROUP BY tok),
        raw AS (
            SELECT t.doc_id,
                   CAST(floor(((((CAST(s.n_docs AS DOUBLE) - d.df
                                  + 0.5) / (d.df + 0.5))
                                + CAST(1.0 AS DOUBLE))
                               * CAST(65536.0 AS DOUBLE))) AS BIGINT)
                       AS m,
                   ((t.tf * CAST({1.2 + 1.0!r} AS DOUBLE))
                      / (t.tf + CAST({1.2!r} AS DOUBLE)
                         * (CAST({1.0 - 0.75!r} AS DOUBLE)
                         + CAST({0.75!r} AS DOUBLE) * (l.dl
                           / (CAST(s.total_dl AS DOUBLE)
                              / s.n_docs))))) AS tff
            FROM tfx t JOIN dfq d USING (tok) JOIN dl l USING (doc_id)
            CROSS JOIN s
        ),
        bl AS (SELECT doc_id, m, tff,
                      CAST(length(bin(m)) - 1 AS INT) AS e FROM raw),
        contrib AS (
            SELECT doc_id,
                   CAST(floor((((e - 16)
                                + (m - (CAST(1 AS BIGINT) << e))
                                  / CAST((CAST(1 AS BIGINT) << e)
                                         AS DOUBLE))
                               * tff)
                              * 1000000.0 + 0.5) AS BIGINT) AS q
            FROM bl
        ),
        bm AS (
            SELECT doc_id,
                   row_number() OVER (
                       ORDER BY score_micro DESC, doc_id ASC) AS r
            FROM (SELECT doc_id, CAST(sum(q) AS BIGINT) AS score_micro
                  FROM contrib GROUP BY doc_id)
            ORDER BY score_micro DESC, doc_id ASC LIMIT 10
        ),
        v AS (SELECT vec_id, {quant} AS vq FROM embeddings),
        seeds AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS i, vq AS cv
            FROM (SELECT vec_id, vq FROM v ORDER BY vec_id LIMIT 16)
        ),
        a1 AS ({_ivf_assign('seeds')}),
        c1 AS ({_ivf_update('a1', 'seeds')}),
        a2 AS ({_ivf_assign('c1')}),
        c2 AS ({_ivf_update('a2', 'c1')}),
        cand AS ({_ivf_assign('c2')}),
        probes AS (
            SELECT vec_id AS q_id, vq AS qq, i AS list FROM (
                SELECT v.vec_id, v.vq, s.i,
                       row_number() OVER (PARTITION BY v.vec_id
                           ORDER BY {_ivf_dist('v.vq', 's.cv')}, s.i) AS rk
                FROM v CROSS JOIN c2 s
                WHERE v.vec_id = 0
            ) WHERE rk <= 2
        ),
        vscored AS (
            SELECT p.q_id, c.vec_id AS neighbor_id,
                   list_dot_product(p.qq::DOUBLE[], c.vq::DOUBLE[])
                     / (sqrt(list_dot_product(p.qq::DOUBLE[], p.qq::DOUBLE[]))
                        * sqrt(list_dot_product(c.vq::DOUBLE[], c.vq::DOUBLE[]))) AS score
            FROM probes p JOIN cand c USING (list)
            WHERE c.vec_id <> p.q_id
        ),
        vec AS (
            SELECT neighbor_id AS doc_id,
                   row_number() OVER (
                       ORDER BY score DESC, neighbor_id ASC) AS r
            FROM vscored ORDER BY score DESC, neighbor_id ASC LIMIT 10
        ),
        fused AS (
            SELECT coalesce(bm.doc_id, vec.doc_id) AS doc_id,
                   (CASE WHEN bm.r IS NOT NULL THEN 1 ELSE 0 END
                    + CASE WHEN vec.r IS NOT NULL THEN 1 ELSE 0 END)
                       AS n_lists,
                   (coalesce(CAST(1.0 AS DOUBLE)
                             / (CAST(60.0 AS DOUBLE) + bm.r),
                             CAST(0.0 AS DOUBLE))
                    + coalesce(CAST(1.0 AS DOUBLE)
                               / (CAST(60.0 AS DOUBLE) + vec.r),
                               CAST(0.0 AS DOUBLE))) AS rrf_score
            FROM bm FULL OUTER JOIN vec ON bm.doc_id = vec.doc_id
        )
        SELECT doc_id, n_lists, rrf_score,
               CAST(row_number() OVER (
                   ORDER BY rrf_score DESC, doc_id ASC) AS INT) AS fused_rank
        FROM fused ORDER BY rrf_score DESC, doc_id ASC LIMIT 10
    """
    # Filtered-ANN oracle: identical full-corpus k-means; only the
    # candidate set is label-restricted (queries and training are not)
    similarity_filtered = f"""
        WITH v AS (SELECT vec_id, {quant} AS vq FROM embeddings),
        seeds AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS i, vq AS cv
            FROM (SELECT vec_id, vq FROM v ORDER BY vec_id LIMIT 16)
        ),
        a1 AS ({_ivf_assign('seeds')}),
        c1 AS ({_ivf_update('a1', 'seeds')}),
        a2 AS ({_ivf_assign('c1')}),
        c2 AS ({_ivf_update('a2', 'c1')}),
        cand AS ({_ivf_assign('c2')}),
        candf AS (
            SELECT c.* FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id
            WHERE e.label IN (2, 5, 7)
        ),
        probes AS (
            SELECT vec_id AS q_id, vq AS qq, i AS list FROM (
                SELECT v.vec_id, v.vq, s.i,
                       row_number() OVER (PARTITION BY v.vec_id
                           ORDER BY {_ivf_dist('v.vq', 's.cv')}, s.i) AS rk
                FROM v CROSS JOIN c2 s
                WHERE v.vec_id % 100 = 0
            ) WHERE rk <= 2
        ),
        scored AS (
            SELECT p.q_id, c.vec_id AS neighbor_id,
                   list_dot_product(p.qq::DOUBLE[], c.vq::DOUBLE[])
                     / (sqrt(list_dot_product(p.qq::DOUBLE[], p.qq::DOUBLE[]))
                        * sqrt(list_dot_product(c.vq::DOUBLE[], c.vq::DOUBLE[]))) AS score
            FROM probes p JOIN candf c USING (list)
            WHERE c.vec_id <> p.q_id
        )
        SELECT q_id, neighbor_id, score
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY score DESC, neighbor_id ASC) AS rk
            FROM scored
        ) WHERE rk <= 3
    """
    # KNN-graph oracle: the SAME unrolled two-iteration k-means as
    # similarity_ivf; every vector probes its 2 nearest lists and ranks
    # the probed lists' members (never itself) — the all-pairs twin of
    # the similarity_ivf chain
    knn_graph_sql = f"""
        WITH v AS (SELECT vec_id, {quant} AS vq FROM embeddings),
        seeds AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS i, vq AS cv
            FROM (SELECT vec_id, vq FROM v ORDER BY vec_id LIMIT 16)
        ),
        a1 AS ({_ivf_assign('seeds')}),
        c1 AS ({_ivf_update('a1', 'seeds')}),
        a2 AS ({_ivf_assign('c1')}),
        c2 AS ({_ivf_update('a2', 'c1')}),
        cand AS ({_ivf_assign('c2')}),
        probes AS (
            SELECT vec_id AS src_id, vq AS qq, i AS list FROM (
                SELECT v.vec_id, v.vq, s.i,
                       row_number() OVER (PARTITION BY v.vec_id
                           ORDER BY {_ivf_dist('v.vq', 's.cv')}, s.i) AS rk
                FROM v CROSS JOIN c2 s
            ) WHERE rk <= 2
        ),
        scored AS (
            SELECT p.src_id, c.vec_id AS neighbor_id,
                   list_dot_product(p.qq::DOUBLE[], c.vq::DOUBLE[])
                     / (sqrt(list_dot_product(p.qq::DOUBLE[], p.qq::DOUBLE[]))
                        * sqrt(list_dot_product(c.vq::DOUBLE[], c.vq::DOUBLE[]))) AS score
            FROM probes p JOIN cand c USING (list)
            WHERE c.vec_id <> p.src_id
        )
        SELECT src_id, neighbor_id, score
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY src_id ORDER BY score DESC, neighbor_id ASC) AS rk
            FROM scored
        ) WHERE rk <= 3
    """
    # SemDeDup oracle: the SAME unrolled two-iteration k-means as
    # similarity_ivf partitions the space; pairs are scored only within
    # a cluster and every vector with a lower-id near-dup is dropped
    semantic_dedup_sql = f"""
        WITH v AS (SELECT vec_id, {quant} AS vq FROM embeddings),
        seeds AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS i, vq AS cv
            FROM (SELECT vec_id, vq FROM v ORDER BY vec_id LIMIT 16)
        ),
        a1 AS ({_ivf_assign('seeds')}),
        c1 AS ({_ivf_update('a1', 'seeds')}),
        a2 AS ({_ivf_assign('c1')}),
        c2 AS ({_ivf_update('a2', 'c1')}),
        cand AS ({_ivf_assign('c2')}),
        dropped AS (
            SELECT DISTINCT c.vec_id FROM cand a JOIN cand c USING (list)
            WHERE a.vec_id < c.vec_id
              AND list_dot_product(a.vq::DOUBLE[], c.vq::DOUBLE[])
                    / (sqrt(list_dot_product(a.vq::DOUBLE[], a.vq::DOUBLE[]))
                       * sqrt(list_dot_product(c.vq::DOUBLE[], c.vq::DOUBLE[])))
                  >= 0.2
        )
        SELECT vec_id, CAST(list AS INTEGER) AS cluster FROM cand
        WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
    """

    semantic_dedup_capped_sql = f"""
        WITH v AS (
            SELECT vec_id, {quant} AS vq FROM embeddings
            UNION ALL
            SELECT vec_id + 1000000, {quant}
            FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 10)
        ),
        seeds AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS i, vq AS cv
            FROM (SELECT vec_id, vq FROM v ORDER BY vec_id LIMIT 4)
        ),
        a1 AS ({_ivf_assign('seeds')}),
        c1 AS ({_ivf_update('a1', 'seeds')}),
        a2 AS ({_ivf_assign('c1')}),
        c2 AS ({_ivf_update('a2', 'c1')}),
        cand AS ({_ivf_assign('c2')}),
        sizes AS (SELECT list, count(*) AS n FROM cand GROUP BY list),
        small_dropped AS (
            -- under-valve clusters: the full near-dup keep rule
            SELECT DISTINCT c.vec_id
            FROM cand a JOIN cand c USING (list) JOIN sizes s USING (list)
            WHERE s.n <= 120 AND a.vec_id < c.vec_id
              AND list_dot_product(a.vq::DOUBLE[], c.vq::DOUBLE[])
                    / (sqrt(list_dot_product(a.vq::DOUBLE[], a.vq::DOUBLE[]))
                       * sqrt(list_dot_product(c.vq::DOUBLE[], c.vq::DOUBLE[])))
                  >= 0.2
        ),
        big_dropped AS (
            -- over-valve clusters: ONLY exact-quantized duplicates drop
            -- (nonzero vectors; zero vectors score NaN un-valved -> kept)
            SELECT c.vec_id
            FROM cand c JOIN sizes s USING (list)
            WHERE s.n > 120
              AND list_dot_product(c.vq::DOUBLE[], c.vq::DOUBLE[]) > 0
              AND EXISTS (
                  SELECT 1 FROM cand a
                  WHERE a.list = c.list AND a.vq = c.vq
                    AND a.vec_id < c.vec_id
              )
        )
        SELECT vec_id, CAST(list AS INTEGER) AS cluster FROM cand
        WHERE vec_id NOT IN (SELECT vec_id FROM small_dropped)
          AND vec_id NOT IN (SELECT vec_id FROM big_dropped)
    """

    # cluster-balanced sampling oracle: the same unrolled k-means CTEs,
    # then the temperature_sample HUGEINT quadratic threshold per cluster
    cluster_balance_sql = f"""
        WITH v AS (SELECT vec_id, {quant} AS vq FROM embeddings),
        seeds AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS i, vq AS cv
            FROM (SELECT vec_id, vq FROM v ORDER BY vec_id LIMIT 16)
        ),
        a1 AS ({_ivf_assign('seeds')}),
        c1 AS ({_ivf_update('a1', 'seeds')}),
        a2 AS ({_ivf_assign('c1')}),
        c2 AS ({_ivf_update('a2', 'c1')}),
        cand AS ({_ivf_assign('c2')}),
        c AS (SELECT list, count(*) AS n_g FROM cand GROUP BY list),
        m AS (SELECT min(n_g) AS n_min FROM c),
        h AS (
            SELECT d.vec_id, d.list, c.n_g, m.n_min,
                   CAST('0x' || substr(
                       md5('cb|' || CAST(d.vec_id AS VARCHAR)), 1, 8)
                       AS BIGINT) AS hv
            FROM cand d JOIN c USING (list) CROSS JOIN m
        )
        SELECT vec_id, CAST(list AS INTEGER) AS cluster FROM h
        WHERE CAST(hv AS HUGEINT) * hv * n_g
              < CAST(n_min AS HUGEINT)
                * CAST('18446744073709551616' AS HUGEINT)
    """

    # PQ oracle: four independent 16-dim codebooks trained with the same
    # unrolled deterministic k-means as similarity_ivf, on vector slices
    def _pq_dist(a: str, b: str) -> str:
        return (
            f"list_sum(list_transform(range(1, 17), "
            f"d -> ({a}[d] - {b}[d]) * ({a}[d] - {b}[d])))"
        )

    def _pq_assign(cents: str, j: int) -> str:
        return f"""
            SELECT vec_id, sq, i AS list FROM (
                SELECT v.vec_id, v.sq, s.i,
                       row_number() OVER (PARTITION BY v.vec_id
                           ORDER BY {_pq_dist('v.sq', 's.cv')}, s.i) AS rk
                FROM v{j} v CROSS JOIN {cents} s
            ) WHERE rk = 1
        """

    def _pq_update(assigned: str, prev: str) -> str:
        return f"""
            SELECT s.i, coalesce(u.cv, s.cv) AS cv
            FROM {prev} s LEFT JOIN (
                SELECT list, list(m ORDER BY d) AS cv FROM (
                    SELECT list, d,
                           CAST(trunc(CAST(sum(sq[d]) AS DOUBLE) / count(*))
                                AS BIGINT) AS m
                    FROM {assigned}, range(1, 17) t(d)
                    GROUP BY list, d
                ) GROUP BY list
            ) u ON u.list = s.i
        """

    def _pq_final(cents: str, j: int) -> str:
        return f"""
            SELECT vec_id, i AS code, dd AS err FROM (
                SELECT v.vec_id, s.i, {_pq_dist('v.sq', 's.cv')} AS dd,
                       row_number() OVER (PARTITION BY v.vec_id
                           ORDER BY {_pq_dist('v.sq', 's.cv')}, s.i) AS rk
                FROM v{j} v CROSS JOIN {cents} s
            ) WHERE rk = 1
        """

    _pq_ctes = []
    for _j in range(4):
        _lo, _hi = _j * 16 + 1, (_j + 1) * 16
        _pq_ctes.append(f"""
        v{_j} AS (SELECT vec_id, vq[{_lo}:{_hi}] AS sq FROM v),
        seeds{_j} AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS i, sq AS cv
            FROM (SELECT vec_id, sq FROM v{_j} ORDER BY vec_id LIMIT 16)
        ),
        a1_{_j} AS ({_pq_assign(f'seeds{_j}', _j)}),
        c1_{_j} AS ({_pq_update(f'a1_{_j}', f'seeds{_j}')}),
        a2_{_j} AS ({_pq_assign(f'c1_{_j}', _j)}),
        c2_{_j} AS ({_pq_update(f'a2_{_j}', f'c1_{_j}')}),
        fin{_j} AS ({_pq_final(f'c2_{_j}', _j)})""")

    pq_encode_sql = f"""
        WITH v AS (SELECT vec_id, {quant} AS vq FROM embeddings),
        {','.join(_pq_ctes)}
        SELECT f0.vec_id,
               f0.code AS pq0, f1.code AS pq1,
               f2.code AS pq2, f3.code AS pq3,
               CAST(f0.err + f1.err + f2.err + f3.err AS BIGINT)
                   AS recon_err_q
        FROM fin0 f0
        JOIN fin1 f1 USING (vec_id)
        JOIN fin2 f2 USING (vec_id)
        JOIN fin3 f3 USING (vec_id)
    """

    # PQ ADC search oracle: same codebooks/codes, plus per-query distance
    # tables (query slice vs every centroid) joined on the stored code
    _tq_ctes = []
    for _j in range(4):
        _lo, _hi = _j * 16 + 1, (_j + 1) * 16
        _tq_ctes.append(f"""
        qs{_j} AS (SELECT q_id, vq[{_lo}:{_hi}] AS sq FROM qv),
        tq{_j} AS (
            SELECT qs.q_id, s.i, {_pq_dist('qs.sq', 's.cv')} AS dd
            FROM qs{_j} qs CROSS JOIN c2_{_j} s
        )""")

    pq_topk_sql = f"""
        WITH v AS (SELECT vec_id, {quant} AS vq FROM embeddings),
        {','.join(_pq_ctes)},
        qv AS (SELECT vec_id AS q_id, vq FROM v WHERE vec_id % 100 = 0),
        {','.join(_tq_ctes)},
        scored AS (
            SELECT t0.q_id, f0.vec_id AS neighbor_id,
                   t0.dd + t1.dd + t2.dd + t3.dd AS adc
            FROM fin0 f0
            JOIN fin1 f1 USING (vec_id)
            JOIN fin2 f2 USING (vec_id)
            JOIN fin3 f3 USING (vec_id)
            JOIN tq0 t0 ON t0.i = f0.code
            JOIN tq1 t1 ON t1.q_id = t0.q_id AND t1.i = f1.code
            JOIN tq2 t2 ON t2.q_id = t0.q_id AND t2.i = f2.code
            JOIN tq3 t3 ON t3.q_id = t0.q_id AND t3.i = f3.code
            WHERE f0.vec_id <> t0.q_id
        )
        SELECT q_id, neighbor_id, CAST(adc AS BIGINT) AS adc_dist_q
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY adc, neighbor_id) AS rk
            FROM scored
        ) WHERE rk <= 5
    """

    # Filtered PQ-ADC oracle: same full-corpus codebooks/codes; the
    # candidate side drops to label >= 5 before ranking
    pq_filtered = f"""
        WITH v AS (SELECT vec_id, {quant} AS vq FROM embeddings),
        {','.join(_pq_ctes)},
        qv AS (SELECT vec_id AS q_id, vq FROM v WHERE vec_id % 100 = 0),
        {','.join(_tq_ctes)},
        scored AS (
            SELECT t0.q_id, f0.vec_id AS neighbor_id,
                   t0.dd + t1.dd + t2.dd + t3.dd AS adc
            FROM fin0 f0
            JOIN embeddings emb ON emb.vec_id = f0.vec_id
            JOIN fin1 f1 ON f1.vec_id = f0.vec_id
            JOIN fin2 f2 ON f2.vec_id = f0.vec_id
            JOIN fin3 f3 ON f3.vec_id = f0.vec_id
            JOIN tq0 t0 ON t0.i = f0.code
            JOIN tq1 t1 ON t1.q_id = t0.q_id AND t1.i = f1.code
            JOIN tq2 t2 ON t2.q_id = t0.q_id AND t2.i = f2.code
            JOIN tq3 t3 ON t3.q_id = t0.q_id AND t3.i = f3.code
            WHERE f0.vec_id <> t0.q_id AND emb.label >= 5
        )
        SELECT q_id, neighbor_id, CAST(adc AS BIGINT) AS adc_dist_q
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY adc, neighbor_id) AS rk
            FROM scored
        ) WHERE rk <= 5
    """

    # Persisted IVF-PQ oracle: the similarity_ivf k-means chain supplies
    # list assignments + per-query probe lists; the pq chain supplies
    # codebooks/codes/ADC tables; candidates are restricted to each
    # query's probed lists before ranking — exactly VectorIndex(pq_m=4)
    # .topk(mode='adc') after a full-corpus first append
    ivfpq_persisted_sql = f"""
        WITH v AS (SELECT vec_id, {quant} AS vq FROM embeddings),
        seeds AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS i, vq AS cv
            FROM (SELECT vec_id, vq FROM v ORDER BY vec_id LIMIT 16)
        ),
        a1 AS ({_ivf_assign('seeds')}),
        c1 AS ({_ivf_update('a1', 'seeds')}),
        a2 AS ({_ivf_assign('c1')}),
        c2 AS ({_ivf_update('a2', 'c1')}),
        cand AS ({_ivf_assign('c2')}),
        {','.join(_pq_ctes)},
        qv AS (SELECT vec_id AS q_id, vq FROM v WHERE vec_id % 100 = 0),
        {','.join(_tq_ctes)},
        probes AS (
            SELECT vec_id AS q_id, i AS list FROM (
                SELECT v.vec_id, s.i,
                       row_number() OVER (PARTITION BY v.vec_id
                           ORDER BY {_ivf_dist('v.vq', 's.cv')}, s.i) AS rk
                FROM v CROSS JOIN c2 s
                WHERE v.vec_id % 100 = 0
            ) WHERE rk <= 2
        ),
        scored AS (
            SELECT t0.q_id, f0.vec_id AS neighbor_id,
                   t0.dd + t1.dd + t2.dd + t3.dd AS adc
            FROM fin0 f0
            JOIN fin1 f1 ON f1.vec_id = f0.vec_id
            JOIN fin2 f2 ON f2.vec_id = f0.vec_id
            JOIN fin3 f3 ON f3.vec_id = f0.vec_id
            JOIN cand c ON c.vec_id = f0.vec_id
            JOIN tq0 t0 ON t0.i = f0.code
            JOIN tq1 t1 ON t1.q_id = t0.q_id AND t1.i = f1.code
            JOIN tq2 t2 ON t2.q_id = t0.q_id AND t2.i = f2.code
            JOIN tq3 t3 ON t3.q_id = t0.q_id AND t3.i = f3.code
            JOIN probes pr ON pr.q_id = t0.q_id AND pr.list = c.list
            WHERE f0.vec_id <> t0.q_id
        )
        SELECT q_id, neighbor_id, CAST(adc AS BIGINT) AS adc_dist_q
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY adc, neighbor_id) AS rk
            FROM scored
        ) WHERE rk <= 5
    """

    # BPE oracle: unroll 4 training rounds; each round counts true token
    # pairs (from split, never substrings) and applies the winner with a
    # plain space-sentinel replace — identical semantics to the engine
    def _bpe_pairs(t: str, m: str) -> str:
        return f"""
            SELECT p, CAST(count(*) AS BIGINT) AS c FROM (
                SELECT tk[i] || ' ' || tk[i + 1] AS p
                FROM (SELECT string_split(trim(s), ' ') AS tk FROM {t}),
                     LATERAL (SELECT unnest(range(1, len(tk))) AS i) g
            ) GROUP BY p
            ORDER BY c DESC, p ASC LIMIT 1
        """ if m is None else ""

    def _bpe_apply(t: str, m: str) -> str:
        return f"""
            SELECT replace(s,
                           ' ' || (SELECT p FROM {m}) || ' ',
                           ' ' || replace((SELECT p FROM {m}), ' ', '')
                               || ' ') AS s
            FROM {t}
        """

    _bpe_ctes = ["t0 AS (SELECT ' ' || n || ' ' AS s FROM norm WHERE n IS NOT NULL)"]
    for _i in range(4):
        _bpe_ctes.append(f"m{_i} AS ({_bpe_pairs(f't{_i}', None)})")
        if _i < 3:
            _bpe_ctes.append(f"t{_i + 1} AS ({_bpe_apply(f't{_i}', f'm{_i}')})")
    _bpe_union = " UNION ALL ".join(
        f"SELECT {i} AS merge_idx, p AS pair, c AS count FROM m{i}"
        for i in range(4)
    )
    bpe_merges_sql = f"""
        WITH norm AS (
            SELECT trim(regexp_replace(regexp_replace(
                lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS n
            FROM documents WHERE text IS NOT NULL
        ),
        {','.join(_bpe_ctes)}
        SELECT * FROM ({_bpe_union}) ORDER BY merge_idx
    """

    signs6 = _lsh_sign_vectors(6, 64)
    bucket_bits6 = " || ".join(
        f"(CASE WHEN list_dot_product(vq::DOUBLE[], "
        f"[{', '.join(f'{s}.0' for s in signs6[p])}]::DOUBLE[]) > 0 "
        f"THEN '1' ELSE '0' END)"
        for p in range(6)
    )
    similarity_neardup = f"""
        WITH v AS (SELECT vec_id, {quant} AS vq FROM embeddings),
        b AS (SELECT vec_id, vq, {bucket_bits6} AS bucket FROM v),
        pairs AS (
            SELECT a.vec_id AS id_a, c.vec_id AS id_b,
                   list_dot_product(a.vq::DOUBLE[], c.vq::DOUBLE[])
                     / (sqrt(list_dot_product(a.vq::DOUBLE[], a.vq::DOUBLE[]))
                        * sqrt(list_dot_product(c.vq::DOUBLE[], c.vq::DOUBLE[]))) AS score
            FROM b a JOIN b c USING (bucket)
            WHERE a.vec_id < c.vec_id
        )
        SELECT id_a, id_b, score FROM pairs WHERE score >= 0.2
    """
    stopwords = "('the', 'a', 'an', 'of', 'and', 'or', 'to', 'in', 'is', 'it')"
    text_stats_sql = f"""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                 / len(string_split(text, ' ')) AS avg_token_len,
               length(regexp_replace(text, '[A-Za-z0-9_ ]', '', 'g')) AS n_punct,
               len(list_filter(string_split(text, ' '), t -> t IN {stopwords})) AS n_stopwords,
               CAST(len(list_filter(string_split(text, ' '), t -> t IN {stopwords})) AS DOUBLE)
                 / len(string_split(text, ' ')) AS stopword_ratio,
               substr(md5(text), 1, 16) AS fingerprint
        FROM documents
    """
    lang_quality = f"""
        WITH s AS (
            SELECT doc_id, text,
                   len(list_filter(string_split(text, ' '),
                       t -> t IN ('the','of','and','to','in'))) AS s_en,
                   len(list_filter(string_split(text, ' '),
                       t -> t IN ('le','la','de','et','les'))) AS s_fr,
                   len(list_filter(string_split(text, ' '),
                       t -> t IN ('der','die','und','das','ist'))) AS s_de,
                   len(string_split(text, ' ')) AS n_tokens,
                   length(text) AS n_chars,
                   length(regexp_replace(text, '[A-Za-z0-9_ ]', '', 'g')) AS n_punct,
                   len(list_filter(string_split(text, ' '),
                       t -> t IN {stopwords})) AS n_stop
            FROM documents
        )
        SELECT doc_id,
               CASE WHEN s_en > 0 AND s_en >= s_fr AND s_en >= s_de THEN 'en'
                    WHEN s_fr > 0 AND s_fr >= s_de THEN 'fr'
                    WHEN s_de > 0 THEN 'de'
                    ELSE 'und' END AS lang_pred,
               (least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
                + (1.0 - least(CAST(n_punct AS DOUBLE) / n_chars * 5.0, 1.0))
                + least(CAST(n_stop AS DOUBLE) / n_tokens * 4.0, 1.0)) / 3.0 AS quality
        FROM s
    """
    # keep top ceil(n*0.5) per language by the same quality expression,
    # ties (and ranks generally) broken by doc_id — fully integral ranks
    quality_filter = f"""
        WITH s AS (
            SELECT doc_id, lang,
                   len(string_split(text, ' ')) AS n_tokens,
                   length(text) AS n_chars,
                   length(regexp_replace(text, '[A-Za-z0-9_ ]', '', 'g')) AS n_punct,
                   len(list_filter(string_split(text, ' '),
                       t -> t IN {stopwords})) AS n_stop
            FROM documents
        ),
        q AS (
            SELECT doc_id, lang,
                   (least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
                    + (1.0 - least(CAST(n_punct AS DOUBLE) / n_chars * 5.0, 1.0))
                    + least(CAST(n_stop AS DOUBLE) / n_tokens * 4.0, 1.0)) / 3.0 AS quality
            FROM s
        ),
        r AS (
            SELECT *,
                   row_number() OVER (
                       PARTITION BY lang ORDER BY quality DESC, doc_id ASC
                   ) AS rn,
                   count(*) OVER (PARTITION BY lang) AS n
            FROM q
        )
        SELECT doc_id, lang, quality FROM r WHERE rn <= ceil(n * 0.5)
    """
    clean_corpus = f"""
        WITH src0 AS ({_DOCS_WITH_DUPS_SQL}),
        qual AS (
            SELECT * FROM (
                SELECT *,
                       (least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
                        + (1.0 - least(CAST(length(regexp_replace(text, '[A-Za-z0-9_ ]', '', 'g')) AS DOUBLE)
                                       / length(text) * 5.0, 1.0))
                        + least(CAST(len(list_filter(string_split(text, ' '),
                                         t -> t IN {stopwords})) AS DOUBLE)
                                / len(string_split(text, ' ')) * 4.0, 1.0)) / 3.0 AS q
                FROM src0
            ) WHERE q >= 0.5
        ),
        src AS (
            SELECT doc_id, text, lang, source, n_chars FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY md5(text) ORDER BY doc_id ASC) AS rn
                FROM qual
            ) WHERE rn = 1
        ),
        shingled AS ({_SHINGLES_SQL}),
        sigs AS (
            SELECT doc_id,
               {mh_exprs}
            FROM shingled
        ),
        bands AS ({band_rows}),
        pairs AS (
            SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
            FROM bands l JOIN bands r
              ON l.band_id = r.band_id AND l.band_key = r.band_key
            WHERE l.doc_id < r.doc_id
        ),
        sets AS (SELECT doc_id, list_distinct(sh) AS shd FROM shingled),
        losers AS (
            SELECT DISTINCT p.id_b AS doc_id
            FROM pairs p
            JOIN sets a ON a.doc_id = p.id_a
            JOIN sets b ON b.doc_id = p.id_b
            WHERE CAST(len(list_intersect(a.shd, b.shd)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.shd, b.shd))) >= 0.5
        )
        SELECT source, count(*) AS n_clean,
               min(doc_id) AS min_id, max(doc_id) AS max_id
        FROM src
        WHERE doc_id NOT IN (SELECT doc_id FROM losers)
        GROUP BY source
    """
    # cluster-resolved variant: survivors are the min reachable node of the
    # VERIFIED pair graph (recursive transitive closure)
    clean_corpus_cc = clean_corpus.replace(
        """losers AS (
            SELECT DISTINCT p.id_b AS doc_id""",
        """vpairs AS (
            SELECT p.id_a, p.id_b""",
    ).replace(
        """        SELECT source, count(*) AS n_clean,
               min(doc_id) AS min_id, max(doc_id) AS max_id
        FROM src
        WHERE doc_id NOT IN (SELECT doc_id FROM losers)
        GROUP BY source
    """,
        """        ,
        sym AS (
            SELECT id_a AS a, id_b AS b FROM vpairs
            UNION
            SELECT id_b AS a, id_a AS b FROM vpairs
        ),
        reach(node, comp) AS (
            SELECT a, a FROM sym
            UNION
            SELECT s.a, r.comp FROM sym s JOIN reach r ON s.b = r.node
        ),
        losers AS (
            SELECT node AS doc_id FROM reach
            GROUP BY node HAVING min(comp) <> node
        )
        SELECT source, count(*) AS n_clean,
               min(doc_id) AS min_id, max(doc_id) AS max_id
        FROM src
        WHERE doc_id NOT IN (SELECT doc_id FROM losers)
        GROUP BY source
    """,
    ).replace("WITH src0 AS", "WITH RECURSIVE src0 AS")
    # ---- simhash oracle: mirrors operators.dedup.simhash64 exactly ----
    # per token: first 15 hex chars of md5 -> 15 nibble values (60 bits);
    # bit b lives in nibble 15 - b//4 (1-based from the left), shift b%4.
    # vote_b = sum over tokens of (bit ? +1 : -1); simhash = sum 2^b [vote>0]
    bit_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(dgs, d -> "
        f"CASE WHEN (d[{15 - b // 4}] // {2 ** (b % 4)}) % 2 = 1 THEN 1 ELSE -1 END"
        f")) > 0 THEN {2 ** b} ELSE 0 END)"
        for b in range(60)
    )
    dedup_simhash = f"""
        WITH src AS ({_DOCS_WITH_DUPS_SQL}),
        toks AS (
            SELECT doc_id,
                   list_transform(
                       string_split(text, ' '),
                       t -> list_transform(
                            range(1, 16),
                            i -> strpos('0123456789abcdef', substr(md5(t), i, 1)) - 1)
                   ) AS dgs
            FROM src
        ),
        sims AS (
            SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash FROM toks
        )
        SELECT doc_id, simhash, group_size FROM (
            SELECT doc_id, simhash,
                   count(*) OVER (PARTITION BY simhash) AS group_size
            FROM sims
        ) WHERE group_size > 1
    """
    # winnowing: hex15 -> 60-bit int via list_reduce (exact BIGINT folding —
    # power(16, i) in double would lose low bits past 2^53)
    hex15 = (
        "list_reduce(list_transform(range(1, 16), i -> "
        "CAST(strpos('0123456789abcdef', substr(md5({g}), i, 1)) - 1 AS BIGINT)), "
        "(a, b) -> a * 16 + b)"
    )
    doc_fingerprints = f"""
        WITH grams AS (
            SELECT doc_id,
                   list_transform(
                       range(1, greatest(length(text) - 7, 1) + 1),
                       i -> substr(text, i, 8)) AS gs
            FROM documents
        ),
        hashes AS (
            SELECT doc_id, list_transform(gs, g -> {hex15.format(g='g')}) AS hs
            FROM grams
        ),
        fps AS (
            SELECT doc_id,
                   list_sort(list_distinct(list_transform(
                       range(1, greatest(len(hs) - 3, 1) + 1),
                       j -> list_min(hs[j:j+3])))) AS fp
            FROM hashes
        )
        SELECT doc_id, len(fp) AS n_fp,
               fp[1] AS fp_min, fp[len(fp)] AS fp_max,
               md5(array_to_string(list_transform(fp, x -> CAST(x AS VARCHAR)), ','))
                   AS fp_digest
        FROM fps
    """
    token_bpe = r"""
        SELECT doc_id,
               len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS n_bpe_tokens
        FROM documents
    """
    # thresholds must replicate hash_split's float accumulation exactly
    from holcstore_spark.operators.sampling import _frac_to_hex

    _w = {"train": 0.8, "valid": 0.1, "test": 0.1}
    _tot = float(sum(_w.values()))
    _cum, _thr = 0.0, {}
    for _name in list(_w)[:-1]:
        _cum += _w[_name] / _tot
        _thr[_name] = _frac_to_hex(_cum)
    hash_split_sql = f"""
        WITH h AS (
            SELECT doc_id,
                   substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8) AS hx
            FROM documents
        )
        SELECT doc_id,
               CASE WHEN hx < '{_thr["train"]}' THEN 'train'
                    WHEN hx < '{_thr["valid"]}' THEN 'valid'
                    ELSE 'test' END AS split,
               CASE WHEN hx < '{_frac_to_hex(0.25)}' THEN 1 ELSE 0 END AS in_quarter
        FROM h
    """
    stratified_sample_sql = """
        WITH r AS (
            SELECT lang, source, doc_id,
                   row_number() OVER (
                       PARTITION BY lang, source
                       ORDER BY substr(md5('strat|' || CAST(doc_id AS VARCHAR)), 1, 8) ASC,
                                doc_id ASC
                   ) AS rk
            FROM documents
        )
        SELECT lang, source, rk, doc_id FROM r WHERE rk <= 5
    """
    # bigram/trigram lists mirror token_shingles (short docs -> one
    # whole-doc shingle; OOB list index -> NULL, skipped by concat_ws)
    repetition_stats_sql = """
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        grams AS (
            SELECT doc_id, t, len(t) AS n,
                   list_transform(range(1, greatest(len(t) - 1, 1) + 1),
                                  i -> concat_ws(' ', t[i], t[i+1])) AS bi,
                   list_transform(range(1, greatest(len(t) - 2, 1) + 1),
                                  i -> concat_ws(' ', t[i], t[i+1], t[i+2])) AS tri
            FROM toks
        ),
        top AS (
            SELECT doc_id, max(c) AS top_bi FROM (
                SELECT doc_id, g, count(*) AS c
                FROM (SELECT doc_id, unnest(bi) AS g FROM grams)
                GROUP BY doc_id, g
            ) GROUP BY doc_id
        )
        SELECT g.doc_id, g.n AS n_tokens,
               CAST(g.n - len(list_distinct(g.t)) AS DOUBLE) / g.n AS dup_word_frac,
               CAST(len(g.bi) - len(list_distinct(g.bi)) AS DOUBLE) / len(g.bi)
                   AS dup_bigram_frac,
               CAST(len(g.tri) - len(list_distinct(g.tri)) AS DOUBLE) / len(g.tri)
                   AS dup_trigram_frac,
               CAST(t.top_bi AS DOUBLE) / len(g.bi) AS top_bigram_frac
        FROM grams g JOIN top t ON g.doc_id = t.doc_id
    """
    vocab_topk_sql = """
        WITH tf AS (
            SELECT g AS token, count(*) AS tf
            FROM (SELECT unnest(string_split(text, ' ')) AS g FROM documents)
            GROUP BY g
        ),
        dfq AS (
            SELECT g AS token, count(*) AS df
            FROM (SELECT unnest(list_distinct(string_split(text, ' '))) AS g
                  FROM documents)
            GROUP BY g
        )
        SELECT tf.token, tf.tf, dfq.df
        FROM tf JOIN dfq USING (token)
        ORDER BY tf.tf DESC, tf.token ASC
        LIMIT 100
    """
    pii_redact_sql = r"""
        WITH injected AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN
                            text || ' mail u' || CAST(doc_id AS VARCHAR) || '@ex.org now'
                        WHEN doc_id % 3 = 1 THEN
                            text || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.3.7 up'
                        ELSE text || ' call +1-555-01'
                             || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                   END AS doc
            FROM documents
        )
        SELECT doc_id,
               len(regexp_extract_all(doc,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
               len(regexp_extract_all(doc,
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
               len(regexp_extract_all(doc, '\+?\d[\d\- ]{7,}\d')) AS n_phone,
               md5(regexp_replace(regexp_replace(regexp_replace(doc,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                   '\+?\d[\d\- ]{7,}\d', '<PHONE>', 'g')) AS digest
        FROM injected
    """
    multimodal_meta = """
        SELECT doc_id, octet_length(encode(text)) AS n_bytes,
               md5(text) AS digest
        FROM documents
    """
    store_set_many = """
        WITH daily AS (
            SELECT user_id, date_trunc('day', ts) AS day, max(value) AS v
            FROM events GROUP BY 1, 2
        )
        SELECT user_id, count(*) AS n_points,
               CAST(sum(CAST(v AS DECIMAL(28,2))) AS DOUBLE) AS total
        FROM daily GROUP BY user_id
    """
    # clear() removed every prm with user_id % 3 = 0 for client 1;
    # clear_all() emptied client 2 (so the per-prm join yields no rows there)
    store_cdf = """
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS ts, max(value) AS value
            FROM events GROUP BY 1, 2
        ),
        patched AS (
            SELECT user_id, value FROM hourly
            WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-15'
              AND value IS NOT NULL AND value <> 0
        )
        SELECT user_id, change_type, count(*) AS n_changed,
               CAST(sum(CAST(v AS DECIMAL(28,2))) AS DOUBLE) AS total
        FROM (
            SELECT user_id, 'delete' AS change_type, value AS v FROM patched
            UNION ALL
            SELECT user_id, 'insert' AS change_type, value * 2 AS v FROM patched
        )
        GROUP BY user_id, change_type
    """
    kv_acid_ops = """
        WITH daily AS (
            SELECT user_id, date_trunc('day', ts) AS day, max(value) AS v
            FROM events GROUP BY 1, 2
        ),
        c1 AS (
            -- tenant 1: versioned overlay (even users doubled except
            -- day%3 holes filled from the base), every 7th user cleared
            SELECT CAST(1 AS BIGINT) AS client_id, user_id,
                   CASE WHEN user_id % 2 = 0 AND day(day) % 3 <> 0
                        THEN v * 2 ELSE v END AS val,
                   day
            FROM daily WHERE user_id % 7 <> 0
        ),
        c2 AS (
            -- tenant 2: non-versioned replace chain — the *5 write wins
            SELECT CAST(2 AS BIGINT) AS client_id, user_id, v * 5 AS val, day
            FROM daily WHERE user_id % 5 = 0
        )
        SELECT client_id, user_id,
               strftime(day, '%Y-%m-%d %H:%M:%S') AS ts_str, val
        FROM (SELECT * FROM c1 UNION ALL SELECT * FROM c2)
    """
    kv_clear = """
        WITH daily AS (
            SELECT user_id, date_trunc('day', ts) AS day
            FROM events GROUP BY 1, 2
        ),
        surv AS (
            SELECT user_id, count(*) AS n_rows FROM daily
            WHERE user_id % 3 <> 0 GROUP BY user_id
        )
        SELECT CAST(1 AS BIGINT) AS client_id, n_rows, user_id,
               (SELECT count(*) FROM surv) AS n_series
        FROM surv
    """
    # server: jan + (jan shifted +31d); replace() for user_id % 3 = 0 keeps
    # only the shifted month at 3x value and tombstones the rest; the pulled
    # client replica must equal exactly that
    sync_tombstone = """
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS ts, max(value) AS value
            FROM events GROUP BY 1, 2
        ),
        final AS (
            SELECT user_id, value FROM hourly WHERE user_id % 3 <> 0
            UNION ALL
            SELECT user_id, value FROM hourly WHERE user_id % 3 <> 0
            UNION ALL
            SELECT user_id, value * 3 AS value FROM hourly WHERE user_id % 3 = 0
        )
        SELECT user_id, count(*) AS n_points,
               CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total
        FROM final GROUP BY user_id
    """
    # import stamps: updated_at = 2024-06-01 + (user_id % 7) days,
    # op_id = user_id*1000 + chunk_index; chunk_index = year*12 + month - 1
    _IMPORTED_META_SQL = """
        WITH hourly AS (
            SELECT DISTINCT user_id, date_trunc('hour', ts) AS ts FROM events
        ),
        un AS (
            SELECT user_id, ts FROM hourly
            UNION ALL
            SELECT user_id, ts + INTERVAL 31 DAY AS ts FROM hourly
            WHERE user_id % 2 = 0
        ),
        meta AS (
            SELECT user_id,
                   CAST(year(ts) * 12 + month(ts) - 1 AS BIGINT) AS chunk_index,
                   min(ts) AS start_ts, count(*) AS n_points,
                   TIMESTAMP '2024-06-01' + INTERVAL 1 DAY * (user_id % 7)
                       AS updated_at
            FROM un GROUP BY 1, 2
        )
    """
    store_meta_aggregates = f"""
        {_IMPORTED_META_SQL}
        , top20 AS (
            SELECT DISTINCT user_id FROM meta ORDER BY user_id LIMIT 20
        )
        SELECT m.user_id, count(*) AS n_chunks,
               max(m.chunk_index) AS last_chunk,
               strftime(max(m.updated_at), '{_FMT_DUCK}') AS last_up,
               (SELECT count(DISTINCT user_id) FROM meta) AS n_keys
        FROM meta m JOIN top20 USING (user_id)
        GROUP BY m.user_id
    """
    store_changefeed = f"""
        {_IMPORTED_META_SQL}
        SELECT user_id, chunk_index, n_points,
               strftime(start_ts, '{_FMT_DUCK}') AS start_ts,
               strftime(updated_at, '{_FMT_DUCK}') AS updated_at
        FROM meta
        WHERE updated_at >= TIMESTAMP '2024-06-04'
        ORDER BY updated_at, user_id, chunk_index
        LIMIT 40 OFFSET 10
    """
    # keyset-paged feed reassembly: final latest state after the
    # mid-pagination tombstone of user_id%10==3 users' Jan chunk
    # (chunk_index 24288 = 2024*12+1-1), re-stamped 2024-07-01
    sync_paged = f"""
        {_IMPORTED_META_SQL}
        SELECT user_id,
               CAST(sum(CASE WHEN tomb THEN 0 ELSE 1 END) AS BIGINT) AS n_alive,
               CAST(sum(CASE WHEN tomb THEN 1 ELSE 0 END) AS BIGINT) AS n_tomb,
               CAST(sum(CASE WHEN tomb THEN 0 ELSE n_points END) AS BIGINT)
                   AS total_points,
               strftime(max(CASE WHEN tomb THEN TIMESTAMP '2024-07-01'
                                 ELSE updated_at END), '{_FMT_DUCK}') AS last_up
        FROM (
            SELECT *, (user_id % 10 = 3 AND chunk_index = 24288) AS tomb
            FROM meta
        )
        GROUP BY user_id
    """
    # req = [2024-01-10 06:00, 2024-01-20]; intersection min_delta 1 day,
    # difference_missing min_delta 12 h — mirrors operators/intervals.Range
    interval_algebra = f"""
        WITH cov AS (
            SELECT user_id, 'a' AS w, min(ts) AS lo, max(ts) AS hi FROM events
            WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-12'
            GROUP BY user_id
            UNION ALL
            SELECT user_id, 'b' AS w, min(ts) AS lo, max(ts) AS hi FROM events
            WHERE ts >= TIMESTAMP '2024-01-13' AND ts < TIMESTAMP '2024-01-18'
            GROUP BY user_id
        ),
        calc AS (
            SELECT *, TIMESTAMP '2024-01-10 06:00:00' AS rs,
                   TIMESTAMP '2024-01-20 00:00:00' AS re
            FROM cov
        ),
        flags AS (
            SELECT *,
                   (rs <= hi AND lo <= re) AS ov,
                   (rs <= lo AND hi <= re) AS inc,
                   greatest(lo, rs) AS i_s, least(hi, re) AS i_e,
                   least(lo, re) AS head_e, greatest(hi, rs) AS tail_s
            FROM calc
        ),
        pieces AS (
            SELECT *,
                   (ov AND i_s <= i_e AND (i_e - i_s) >= INTERVAL 1 DAY)
                       AS int_ok,
                   (ov AND lo > rs AND (head_e - rs) >= INTERVAL 12 HOUR)
                       AS head_ok,
                   (ov AND hi < re AND (re - tail_s) >= INTERVAL 12 HOUR)
                       AS tail_ok
            FROM flags
        )
        SELECT user_id, w, ov AS overlaps, inc AS includes,
               CASE WHEN int_ok THEN strftime(i_s, '{_FMT_DUCK}') END
                   AS inter_start,
               CASE WHEN int_ok THEN strftime(i_e, '{_FMT_DUCK}') END
                   AS inter_end,
               CAST(CASE WHEN NOT ov THEN 1
                         ELSE CAST(head_ok AS INT) + CAST(tail_ok AS INT)
                    END AS BIGINT) AS n_miss,
               CASE WHEN NOT ov THEN strftime(rs, '{_FMT_DUCK}')
                    WHEN head_ok THEN strftime(rs, '{_FMT_DUCK}')
                    WHEN tail_ok THEN strftime(tail_s, '{_FMT_DUCK}')
               END AS m1_start,
               CASE WHEN NOT ov THEN strftime(re, '{_FMT_DUCK}')
                    WHEN head_ok THEN strftime(head_e, '{_FMT_DUCK}')
                    WHEN tail_ok THEN strftime(re, '{_FMT_DUCK}')
               END AS m1_end,
               CASE WHEN ov AND head_ok AND tail_ok
                    THEN strftime(tail_s, '{_FMT_DUCK}') END AS m2_start,
               CASE WHEN ov AND head_ok AND tail_ok
                    THEN strftime(re, '{_FMT_DUCK}') END AS m2_end
        FROM pieces
    """
    # literal expectations: the semantic under test IS the alias mapping
    freq_fix = """
        SELECT * FROM (VALUES
            ('h',     '1h',    3600.0),
            ('1h',    '1h',    3600.0),
            ('15min', '15min',  900.0),
            ('min',   '1min',    60.0),
            ('30min', '30min', 1800.0),
            ('D',     '1D',   86400.0),
            ('2D',    '2D',  172800.0),
            ('W',     '1W',  604800.0)
        ) AS t(freq, fixed, seconds)
    """
    # guard matrix: unstamped mutations raise on a sync-enabled store
    # (chunk_store.py:435, 518, 597, 859); stamped/tracked paths pass
    sync_guards = """
        SELECT * FROM (VALUES
            ('set_ts_plain',     'SyncGuardError'),
            ('set_many_ts',      'SyncGuardError'),
            ('ingest_insert',    'SyncGuardError'),
            ('set_ts_update',    'ok'),
            ('delete_untracked', 'SyncGuardError'),
            ('delete_tracked',   'ok')
        ) AS t(op, outcome)
    """
    # incremental span dedup: history grams beat every batch
    # occurrence; the in-batch keep-first rule applies on top. Shared
    # by dedup_spans_incr (bare operator), span_index_replay (managed
    # GramIndex — a crash-replayed ingest must reproduce EXACTLY this)
    # and, with the keeper-attribution predicate injected,
    # span_index_forget.
    dedup_spans_incr_sql = """
        WITH btoks AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            WHERE doc_id % 3 = 0
        ),
        hgrams AS (
            SELECT DISTINCT
                   substr(md5(array_to_string(
                       ws[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')), 1, 16) AS h
            FROM (SELECT ws, unnest(range(1, len(ws) - 6)) AS i
                  FROM (SELECT string_split(text, ' ') AS ws FROM documents
                        WHERE doc_id % 3 <> 0)
                  WHERE len(ws) >= 8)
        ),
        bgrams AS (
            SELECT doc_id, i AS pos,
                   substr(md5(array_to_string(
                       ws[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')), 1, 16) AS h,
                   doc_id * 1048576 + i AS okey
            FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 6)) AS i
                  FROM btoks WHERE len(ws) >= 8)
        ),
        agg AS (SELECT h, count(*) AS occ, min(okey) AS frst
                FROM bgrams GROUP BY h),
        removed AS (
            SELECT g.* FROM bgrams g JOIN agg a USING (h)
            LEFT JOIN (SELECT h, TRUE AS hist FROM hgrams) hh USING (h)
            WHERE hh.hist IS NOT NULL
               OR (occ >= 2 AND okey <> frst)
        ),
        cov AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + 8)) AS c
                FROM removed),
        dup AS (SELECT doc_id, count(*) AS dup_tokens FROM cov GROUP BY doc_id)
        SELECT t.doc_id,
               CAST(len(ws) AS BIGINT) AS n_tokens,
               CAST(coalesce(dup_tokens, 0) AS BIGINT) AS dup_tokens,
               CAST(len(ws) - coalesce(dup_tokens, 0) AS BIGINT) AS kept_tokens,
               coalesce(dup_tokens, 0) / CAST(greatest(len(ws), 1) AS DOUBLE)
                   AS dup_frac
        FROM btoks t LEFT JOIN dup USING (doc_id)
    """
    # strip oracles: the SAME removal rules materialized — kept token
    # positions re-joined in document order via ordered string_agg
    span_strip_sql = """
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        grams AS (
            SELECT doc_id, i AS pos,
                   substr(md5(array_to_string(
                       ws[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')), 1, 16) AS h,
                   doc_id * 1048576 + i AS okey
            FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 6)) AS i
                  FROM toks WHERE len(ws) >= 8)
        ),
        agg AS (SELECT h, count(*) AS occ, min(okey) AS frst
                FROM grams GROUP BY h),
        removed AS (
            SELECT g.* FROM grams g JOIN agg a USING (h)
            WHERE occ >= 2 AND okey <> frst
        ),
        cov AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + 8)) AS c
                FROM removed),
        pos AS (
            SELECT doc_id, i AS p, ws[CAST(i AS INT)] AS tok
            FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i
                  FROM toks)
        ),
        kept AS (
            SELECT pos.doc_id, pos.p, pos.tok FROM pos
            LEFT JOIN cov ON cov.doc_id = pos.doc_id AND cov.c = pos.p
            WHERE cov.c IS NULL
        ),
        reb AS (SELECT doc_id,
                       string_agg(tok, ' ' ORDER BY p) AS text_clean,
                       count(*) AS kept_tokens FROM kept GROUP BY doc_id)
        SELECT t.doc_id,
               coalesce(reb.text_clean, '') AS text_clean,
               CAST(coalesce(reb.kept_tokens, 0) AS BIGINT) AS kept_tokens
        FROM toks t LEFT JOIN reb USING (doc_id)
    """
    span_strip_incr_sql = """
        WITH btoks AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            WHERE doc_id % 3 = 0
        ),
        hgrams AS (
            SELECT DISTINCT
                   substr(md5(array_to_string(
                       ws[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')), 1, 16) AS h
            FROM (SELECT ws, unnest(range(1, len(ws) - 6)) AS i
                  FROM (SELECT string_split(text, ' ') AS ws FROM documents
                        WHERE doc_id % 3 <> 0)
                  WHERE len(ws) >= 8)
        ),
        bgrams AS (
            SELECT doc_id, i AS pos,
                   substr(md5(array_to_string(
                       ws[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')), 1, 16) AS h,
                   doc_id * 1048576 + i AS okey
            FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 6)) AS i
                  FROM btoks WHERE len(ws) >= 8)
        ),
        agg AS (SELECT h, count(*) AS occ, min(okey) AS frst
                FROM bgrams GROUP BY h),
        removed AS (
            SELECT g.* FROM bgrams g JOIN agg a USING (h)
            LEFT JOIN (SELECT h, TRUE AS hist FROM hgrams) hh USING (h)
            WHERE hh.hist IS NOT NULL
               OR (occ >= 2 AND okey <> frst)
        ),
        cov AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + 8)) AS c
                FROM removed),
        pos AS (
            SELECT doc_id, i AS p, ws[CAST(i AS INT)] AS tok
            FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i
                  FROM btoks)
        ),
        kept AS (
            SELECT pos.doc_id, pos.p, pos.tok FROM pos
            LEFT JOIN cov ON cov.doc_id = pos.doc_id AND cov.c = pos.p
            WHERE cov.c IS NULL
        ),
        reb AS (SELECT doc_id,
                       string_agg(tok, ' ' ORDER BY p) AS text_clean,
                       count(*) AS kept_tokens FROM kept GROUP BY doc_id)
        SELECT t.doc_id,
               coalesce(reb.text_clean, '') AS text_clean,
               CAST(coalesce(reb.kept_tokens, 0) AS BIGINT) AS kept_tokens
        FROM btoks t LEFT JOIN reb USING (doc_id)
    """
    c4_quality_sql = """
        WITH base AS (
            SELECT doc_id,
                   string_split(coalesce(text, ''), chr(10)) AS ls,
                   coalesce(text, '') AS t
            FROM documents
        ),
        m AS (
            SELECT doc_id,
                   coalesce(array_to_string(list_filter(ls, l ->
                       (ends_with(l, '.') OR ends_with(l, '!')
                        OR ends_with(l, '?') OR ends_with(l, '"'))
                       AND len(string_split(l, ' ')) >= 5), chr(10)),
                       '') AS text_c4,
                   CAST(len(ls) AS BIGINT) AS n_lines,
                   CAST(len(list_filter(ls, l ->
                       (ends_with(l, '.') OR ends_with(l, '!')
                        OR ends_with(l, '?') OR ends_with(l, '"'))
                       AND len(string_split(l, ' ')) >= 5)) AS BIGINT)
                       AS n_lines_kept,
                   (lower(t) LIKE '%lorem ipsum%') AS has_lorem_ipsum,
                   (t LIKE '%{%') AS has_brace
            FROM base
        ),
        s AS (
            SELECT *,
                   CAST((length(text_c4)
                         - length(replace(text_c4, '.', '')))
                        + (length(text_c4)
                           - length(replace(text_c4, '!', '')))
                        + (length(text_c4)
                           - length(replace(text_c4, '?', '')))
                        AS BIGINT) AS n_sentences
            FROM m
        )
        SELECT doc_id, text_c4, n_lines, n_lines_kept, n_sentences,
               has_lorem_ipsum, has_brace,
               (n_sentences >= 3 AND NOT has_lorem_ipsum
                AND NOT has_brace) AS c4_keep
        FROM s
    """
    gopher_quality_sql = """
        WITH base AS (
            SELECT doc_id,
                   string_split(coalesce(text, ''), ' ') AS ws,
                   string_split(coalesce(text, ''), chr(10)) AS ls,
                   coalesce(text, '') AS t
            FROM documents
        ),
        m AS (
            SELECT doc_id,
                   CAST(len(ws) AS BIGINT) AS n_words,
                   CAST(list_sum(list_transform(ws, w -> length(w)))
                        AS DOUBLE) / len(ws) AS mean_word_len,
                   CAST((length(t) - length(replace(t, '#', '')))
                        + (length(t) - length(replace(t, '...', ''))) / 3
                        + (length(t) - length(replace(t, chr(8230), '')))
                        AS DOUBLE) / len(ws) AS symbol_ratio,
                   CAST(len(list_filter(ls, l ->
                            starts_with(l, '- ') OR starts_with(l, '* ')
                            OR starts_with(l, chr(8226))))
                        AS DOUBLE) / len(ls) AS bullet_line_frac,
                   CAST(len(list_filter(ls, l -> ends_with(l, '...')
                            OR ends_with(l, chr(8230))))
                        AS DOUBLE) / len(ls) AS ellipsis_line_frac,
                   CAST(len(list_filter(ws, w ->
                            regexp_matches(w, '[A-Za-z]')))
                        AS DOUBLE) / len(ws) AS alpha_word_frac,
                   CAST(len(list_filter(
                            ['the','be','to','of','and','that','have',
                             'with'],
                            s -> list_contains(ws, s))) AS BIGINT)
                       AS gopher_stop_hits
            FROM base
        )
        SELECT doc_id, n_words, mean_word_len, symbol_ratio,
               bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
               gopher_stop_hits,
               (n_words >= 50 AND n_words <= 100000) AS rule_word_count,
               (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
                   AS rule_mean_word_len,
               (symbol_ratio <= 0.1) AS rule_symbol_ratio,
               (bullet_line_frac <= 0.9) AS rule_bullet_lines,
               (ellipsis_line_frac <= 0.3) AS rule_ellipsis_lines,
               (alpha_word_frac >= 0.8) AS rule_alpha_words,
               (gopher_stop_hits >= 2) AS rule_stopwords,
               ((n_words >= 50 AND n_words <= 100000)
                AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
                AND (symbol_ratio <= 0.1)
                AND (bullet_line_frac <= 0.9)
                AND (ellipsis_line_frac <= 0.3)
                AND (alpha_word_frac >= 0.8)
                AND (gopher_stop_hits >= 2)) AS gopher_pass
        FROM m
    """
    # streaming-pipeline oracle (r15): SEQUENTIAL two-batch near-dup
    # dedup (batch 0 = doc_id%3!=0 vs itself; batch 1 vs KEPT batch-0
    # bands + itself — dropped batch-0 docs' bands are NOT in the
    # index, which is what distinguishes the sequential semantics from
    # a one-shot dedup) + the non-degenerate Gopher/C4 gates; n_tokens
    # is the whitespace token count the LexicalIndex stores as dl
    gopher_over_src = gopher_quality_sql.replace(
        "FROM documents", "FROM src")
    c4_over_src = c4_quality_sql.replace("FROM documents", "FROM src")
    stream_pipeline_sql = f"""
        WITH src AS ({_DOCS_WITH_DUPS_SQL}),
        shingled AS ({_SHINGLES_SQL}),
        sigs AS (
            SELECT doc_id,
               {mh_exprs}
            FROM shingled
        ),
        bands AS ({band_rows}),
        bands0 AS (SELECT * FROM bands WHERE doc_id % 3 <> 0),
        bands1 AS (SELECT * FROM bands WHERE doc_id % 3 = 0),
        dropped0 AS (
            SELECT DISTINCT nb.doc_id FROM bands0 nb
            WHERE EXISTS (
                SELECT 1 FROM bands0 p
                WHERE p.band_id = nb.band_id
                  AND p.band_key = nb.band_key
                  AND p.doc_id < nb.doc_id)
        ),
        kept0 AS (
            SELECT doc_id FROM src WHERE doc_id % 3 <> 0
              AND doc_id NOT IN (SELECT doc_id FROM dropped0)
        ),
        hist_bands AS (
            SELECT b.* FROM bands0 b JOIN kept0 k USING (doc_id)
        ),
        dropped1 AS (
            SELECT DISTINCT nb.doc_id FROM bands1 nb
            WHERE EXISTS (
                SELECT 1 FROM hist_bands h
                WHERE h.band_id = nb.band_id
                  AND h.band_key = nb.band_key)
               OR EXISTS (
                SELECT 1 FROM bands1 p
                WHERE p.band_id = nb.band_id
                  AND p.band_key = nb.band_key
                  AND p.doc_id < nb.doc_id)
        ),
        kept AS (
            SELECT doc_id, CAST(0 AS BIGINT) AS batch FROM kept0
            UNION ALL
            SELECT doc_id, CAST(1 AS BIGINT) AS batch FROM src
            WHERE doc_id % 3 = 0
              AND doc_id NOT IN (SELECT doc_id FROM dropped1)
        ),
        gq AS (
            SELECT doc_id FROM ({gopher_over_src})
            WHERE rule_word_count AND rule_mean_word_len
              AND rule_symbol_ratio AND rule_alpha_words
        ),
        cq AS (
            SELECT doc_id FROM ({c4_over_src})
            WHERE NOT has_lorem_ipsum AND NOT has_brace
        )
        SELECT k.doc_id, s.source, k.batch,
               CAST(len(string_split(s.text, ' ')) AS BIGINT) AS n_tokens
        FROM kept k
        JOIN src s USING (doc_id)
        JOIN gq USING (doc_id)
        JOIN cq USING (doc_id)
    """
    # forget oracle = the SAME chain with history grams ATTRIBUTED to
    # their first-occurrence doc (min id·2^20+pos key — the GramIndex
    # keeper rule) and every gram owned by a doc_id % 10 == 0 document
    # REMOVED from history, exactly what delete() + the read mask do
    span_index_forget_sql = dedup_spans_incr_sql.replace(
        """hgrams AS (
            SELECT DISTINCT
                   substr(md5(array_to_string(
                       ws[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')), 1, 16) AS h
            FROM (SELECT ws, unnest(range(1, len(ws) - 6)) AS i
                  FROM (SELECT string_split(text, ' ') AS ws FROM documents
                        WHERE doc_id % 3 <> 0)
                  WHERE len(ws) >= 8)
        ),""",
        """hgrams AS (
            SELECT h FROM (
                SELECT h, min(okey) AS frst FROM (
                    SELECT substr(md5(array_to_string(
                               ws[CAST(i AS INT):CAST(i + 7 AS INT)],
                               ' ')), 1, 16) AS h,
                           doc_id * 1048576 + i AS okey
                    FROM (SELECT doc_id, ws,
                                 unnest(range(1, len(ws) - 6)) AS i
                          FROM (SELECT doc_id,
                                       string_split(text, ' ') AS ws
                                FROM documents WHERE doc_id % 3 <> 0)
                          WHERE len(ws) >= 8)
                ) GROUP BY h
            ) WHERE CAST(frst // 1048576 AS BIGINT) % 10 <> 0
        ),""",
    )
    out = {
        "overlay_merge": overlay,
        "combined_delay": combined_delay,
        "completeness_holes": holes,
        "constant_runs": constant_runs,
        "merge_intervals": merge_intervals,
        "drop_bounds_na": drop_bounds_na,
        "slice_with_delay": slice_with_delay,
        "split_at": split_at,
        "time_slice": time_slice,
        "ffill": ffill,
        "normalize_minmax": normalize_minmax,
        "min_step": min_step,
        "disaggregate": disaggregate,
        "next_version": next_version,
        "chunk_index": chunk_index,
        "lookup_filter": lookup_filter,
        "store_roundtrip": store_roundtrip,
        "attr_store_update": attr_store_update,
        "kv_find_holes": kv_find_holes,
        "store_update_overlay": store_update_overlay,
        "store_delete_tombstone": store_delete_tombstone,
        "store_acid_ops": store_acid_ops,
        "store_restore": store_restore,
        "store_optimize": store_restore,  # binpack is a no-op on the data
        # exactly-once: replayed batches no-op, so the oracle is the
        # single-application hourly series (same shape as restore's)
        "store_txn": store_restore,
        "store_cdf": store_cdf,
        "stream_cdf": store_cdf,  # identical expected delta (net of no-op pairs)
        "kv_acid_ops": kv_acid_ops,
        "store_max_horodate": store_max_horodate,
        "store_yield_many": store_yield_many,
        "store_get_batch": store_get_batch,
        # sync_pull: client replica equals the server's hourly data
        "sync_pull": """
            WITH hourly AS (
                SELECT user_id, date_trunc('hour', ts) AS ts, max(value) AS value
                FROM events GROUP BY 1, 2
            )
            SELECT user_id, count(*) AS n_points,
                   CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total
            FROM hourly GROUP BY user_id
        """,
        "kv_store_overlay": kv_store_overlay,
        "pricing_summary": pricing_summary,
        "top_revenue": top_revenue,
        "regional_revenue": """
            SELECT r_name, n_name,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
        """,
        "event_rollup": """
            SELECT coalesce(event_type, 'ALL') AS event_type,
                   coalesce(strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S'), 'ALL') AS day,
                   count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total
            FROM events
            GROUP BY CUBE (event_type, date_trunc('day', ts))
        """,
        "dedup_exact": dedup_exact,
        "dedup_minhash": dedup_minhash,
        "dedup_incremental": dedup_incremental_sql,
        "dedup_index_replay": dedup_incremental_sql,
        # forget oracle = the SAME incremental chain with the deleted
        # docs' bands removed from history (derived by predicate
        # injection so the CTE chain can never drift out of sync)
        "dedup_index_forget": dedup_incremental_sql.replace(
            "WHERE doc_id % 3 <> 0",
            "WHERE doc_id % 3 <> 0 AND doc_id % 10 <> 0",
        ),
        "dedup_clusters": dedup_clusters,
        "dedup_representatives": dedup_representatives,
        "quality_filter": quality_filter,
        "dedup_jaccard": dedup_jaccard,
        "dedup_simhash": dedup_simhash,
        "clean_corpus": clean_corpus,
        "clean_corpus_cc": clean_corpus_cc,
        "similarity_bruteforce": similarity_bruteforce,
        "similarity_lsh": similarity_lsh,
        "similarity_ivf": similarity_ivf,
        "knn_graph": knn_graph_sql,
        "hybrid_search": hybrid_search_sql,
        # exact-substring (duplicate-span) dedup: rolling 8-token gram
        # hashes; the globally-first occurrence (min doc_id·2^20+pos)
        # keeps its tokens, later occurrences mark their k positions
        "dedup_spans": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ),
            grams AS (
                SELECT doc_id, i AS pos,
                       substr(md5(array_to_string(
                           ws[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')), 1, 16) AS h,
                       doc_id * 1048576 + i AS okey
                FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 6)) AS i
                      FROM toks WHERE len(ws) >= 8)
            ),
            agg AS (SELECT h, count(*) AS occ, min(okey) AS frst
                    FROM grams GROUP BY h),
            removed AS (
                SELECT g.* FROM grams g JOIN agg a USING (h)
                WHERE occ >= 2 AND okey <> frst
            ),
            cov AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + 8)) AS c
                    FROM removed),
            dup AS (SELECT doc_id, count(*) AS dup_tokens FROM cov GROUP BY doc_id)
            SELECT t.doc_id,
                   CAST(len(ws) AS BIGINT) AS n_tokens,
                   CAST(coalesce(dup_tokens, 0) AS BIGINT) AS dup_tokens,
                   CAST(len(ws) - coalesce(dup_tokens, 0) AS BIGINT) AS kept_tokens,
                   coalesce(dup_tokens, 0) / CAST(greatest(len(ws), 1) AS DOUBLE)
                       AS dup_frac
            FROM toks t LEFT JOIN dup USING (doc_id)
        """,
        "dedup_spans_incr": dedup_spans_incr_sql,
        # managed GramIndex replay: a crash-replayed ingest must
        # reproduce the single-application incremental stats exactly
        "span_index_replay": dedup_spans_incr_sql,
        "span_index_forget": span_index_forget_sql,
        "domain_cap": """
            SELECT doc_id, source, n_chars FROM (
                SELECT doc_id, source, n_chars,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY n_chars DESC, doc_id ASC) AS rn
                FROM documents
            ) WHERE rn <= 20
        """,
        # BM25 with the log2-domain idf (bit-length + one linear
        # interpolation step — no transcendental ln, so both engines
        # compute bit-identical doubles) and per-term integer micro-unit
        # quantization (floor(x·1e6+0.5)) so the cross-term sum is
        # exact; constants repr()'d from the same Python doubles the
        # Spark plan uses AND cast to DOUBLE explicitly — DuckDB parses
        # a bare 2.2 as DECIMAL(2,1), and bigint×decimal is exact
        # decimal arithmetic whose double conversion differs by ~1 ulp
        # from Spark's double multiply (review r13: a latent floor-flip)
        "bm25_search": f"""
            WITH dl AS (
                SELECT doc_id,
                       CASE WHEN text IS NULL THEN 0
                            ELSE len(string_split(text, ' ')) END AS dl
                FROM documents
            ),
            s AS (SELECT count(*) AS n_docs,
                         CAST(sum(dl) AS BIGINT) AS total_dl FROM dl),
            hits AS (
                SELECT doc_id, tok FROM (
                    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents)
                WHERE tok IN ('hash', 'join', 'scan')
            ),
            tf AS (SELECT doc_id, tok, count(*) AS tf
                   FROM hits GROUP BY doc_id, tok),
            dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
            raw AS (
                SELECT t.doc_id,
                       CAST(floor(((((CAST(s.n_docs AS DOUBLE) - d.df
                                      + 0.5) / (d.df + 0.5))
                                    + CAST(1.0 AS DOUBLE))
                                   * CAST(65536.0 AS DOUBLE))) AS BIGINT)
                           AS m,
                       ((t.tf * CAST({1.2 + 1.0!r} AS DOUBLE))
                          / (t.tf + CAST({1.2!r} AS DOUBLE)
                             * (CAST({1.0 - 0.75!r} AS DOUBLE)
                             + CAST({0.75!r} AS DOUBLE) * (l.dl
                               / (CAST(s.total_dl AS DOUBLE)
                                  / s.n_docs))))) AS tff
                FROM tf t JOIN dfq d USING (tok) JOIN dl l USING (doc_id)
                CROSS JOIN s
            ),
            bl AS (SELECT doc_id, m, tff,
                          CAST(length(bin(m)) - 1 AS INT) AS e FROM raw),
            contrib AS (
                SELECT doc_id,
                       CAST(floor((((e - 16)
                                    + (m - (CAST(1 AS BIGINT) << e))
                                      / CAST((CAST(1 AS BIGINT) << e)
                                             AS DOUBLE))
                                   * tff)
                                  * 1000000.0 + 0.5) AS BIGINT) AS q
                FROM bl
            ),
            per AS (SELECT doc_id, count(*) AS n_terms,
                           CAST(sum(q) AS BIGINT) AS score_micro
                    FROM contrib GROUP BY doc_id)
            SELECT doc_id, n_terms, score_micro,
                   score_micro / 1000000.0 AS score,
                   CAST(row_number() OVER (
                       ORDER BY score_micro DESC, doc_id ASC) AS INT) AS rank
            FROM per ORDER BY score_micro DESC, doc_id ASC LIMIT 10
        """,
        # streaming quota on a single availableNow batch == first-come
        # admission in id order — the batch row_number twin
        "stream_quota": """
            SELECT doc_id, source, n_chars FROM (
                SELECT doc_id, source, n_chars,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY doc_id ASC) AS rn
                FROM documents
            ) WHERE rn <= 20
        """,
        # DSIR importance weights in whole bits: add-one-smoothed
        # log2(p_fr / p_corpus) per token via integer bit-length —
        # bits((ct+1)(Nc+V)) - bits((cc+1)(Nt+V)), exact BIGINT products
        "dsir_select": """
            WITH t AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents WHERE text IS NOT NULL
            ),
            t2 AS (SELECT doc_id, tok FROM t WHERE tok <> ''),
            tt AS (SELECT t2.tok FROM t2 JOIN documents d USING (doc_id)
                   WHERE d.lang = 'fr'),
            cc AS (SELECT tok, count(*) AS cc FROM t2 GROUP BY tok),
            ct AS (SELECT tok, count(*) AS ct FROM tt GROUP BY tok),
            s AS (SELECT (SELECT CAST(sum(cc) AS BIGINT) FROM cc) AS n_c,
                         (SELECT count(*) FROM cc) AS v,
                         (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) FROM ct)
                             AS n_t)
            SELECT doc_id, count(*) AS n_tokens,
                   CAST(sum(length(bin((coalesce(ct, 0) + 1) * (n_c + v)))
                          - length(bin((cc + 1) * (n_t + v)))) AS BIGINT)
                       AS dsir_bits,
                   CAST(sum(length(bin((coalesce(ct, 0) + 1) * (n_c + v)))
                          - length(bin((cc + 1) * (n_t + v)))) AS DOUBLE)
                       / count(*) AS mean_bits
            FROM t2 JOIN cc USING (tok) LEFT JOIN ct USING (tok) CROSS JOIN s
            GROUP BY doc_id
        """,
        "ivf_persisted": similarity_ivf,
        "ivfpq_persisted": ivfpq_persisted_sql,
        "similarity_filtered": similarity_filtered,
        "similarity_neardup": similarity_neardup,
        "semantic_dedup": semantic_dedup_sql,
        "semantic_dedup_capped": semantic_dedup_capped_sql,
        "cluster_balance": cluster_balance_sql,
        "text_stats": text_stats_sql,
        "doc_fingerprints": doc_fingerprints,
        "lang_quality": lang_quality,
        "token_bpe": token_bpe,
        "hash_split": hash_split_sql,
        "stratified_sample": stratified_sample_sql,
        "repetition_stats": repetition_stats_sql,
        "pii_redact": pii_redact_sql,
        "vocab_topk": vocab_topk_sql,
        "multimodal_meta": multimodal_meta,
        # frame boundaries on the hex string (2 hex chars per byte; 64-byte
        # frames = 128 hex chars), digest = md5 of the frame's hex — the
        # portable formulation frame_sample uses on purpose
        "multimodal_frames": """
            WITH b AS (
                SELECT doc_id, hex(encode(text)) AS hx FROM documents
            ),
            f AS (
                SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
                       substring(hx, 1 + CAST(i AS BIGINT) * 128, 128) AS fh
                FROM (
                    SELECT doc_id, hx,
                           unnest(range(0, CAST(ceil(length(hx) / 128.0)
                                                AS BIGINT))) AS i
                    FROM b
                )
                WHERE i % 2 = 0
            )
            SELECT doc_id, frame_idx,
                   CAST(length(fh) / 2 AS BIGINT) AS n_bytes,
                   md5(fh) AS digest
            FROM f
        """,
        # reconstruct the PPM the Spark side decodes for real: same pixel
        # string (printable-ASCII text rpad'ed to 3wh), channel means as
        # exact-int-sum / count, digest over the raw pixel bytes
        "multimodal_decode": """
            WITH base AS (
                SELECT doc_id,
                       CAST(4 + doc_id % 5 AS INT) AS w,
                       CAST(3 + doc_id % 4 AS INT) AS h,
                       rpad(regexp_replace(text, '[^ -~]', '', 'g'),
                            CAST(3 * (4 + doc_id % 5) * (3 + doc_id % 4) AS INT),
                            'x') AS pix
                FROM documents
            ),
            px AS (
                SELECT doc_id, w, h, pix,
                       CAST(i AS INT) AS i,
                       ascii(substring(pix, CAST(i AS INT), 1)) AS v
                FROM (SELECT *, unnest(range(1, CAST(length(pix) + 1 AS BIGINT))) AS i
                      FROM base)
            )
            SELECT doc_id, 'ppm' AS codec, w AS width, h AS height,
                   CAST(sum(CASE WHEN (i-1) % 3 = 0 THEN v ELSE 0 END) AS DOUBLE)
                       / (w * h) AS mean_r,
                   CAST(sum(CASE WHEN (i-1) % 3 = 1 THEN v ELSE 0 END) AS DOUBLE)
                       / (w * h) AS mean_g,
                   CAST(sum(CASE WHEN (i-1) % 3 = 2 THEN v ELSE 0 END) AS DOUBLE)
                       / (w * h) AS mean_b,
                   md5(pix) AS pixel_digest
            FROM px GROUP BY doc_id, w, h, pix
        """,
        # PNG filters are lossless, so the decode of the filter-cycled
        # PNG must reproduce the exact pixel-string stats — same oracle
        # as the PPM decode, codec aside
        "multimodal_png": """
            WITH base AS (
                SELECT doc_id,
                       CAST(4 + doc_id % 5 AS INT) AS w,
                       CAST(3 + doc_id % 4 AS INT) AS h,
                       rpad(regexp_replace(text, '[^ -~]', '', 'g'),
                            CAST(3 * (4 + doc_id % 5) * (3 + doc_id % 4) AS INT),
                            'x') AS pix
                FROM documents
            ),
            px AS (
                SELECT doc_id, w, h, pix,
                       CAST(i AS INT) AS i,
                       ascii(substring(pix, CAST(i AS INT), 1)) AS v
                FROM (SELECT *, unnest(range(1, CAST(length(pix) + 1 AS BIGINT))) AS i
                      FROM base)
            )
            SELECT doc_id, 'png' AS codec, w AS width, h AS height,
                   CAST(sum(CASE WHEN (i-1) % 3 = 0 THEN v ELSE 0 END) AS DOUBLE)
                       / (w * h) AS mean_r,
                   CAST(sum(CASE WHEN (i-1) % 3 = 1 THEN v ELSE 0 END) AS DOUBLE)
                       / (w * h) AS mean_g,
                   CAST(sum(CASE WHEN (i-1) % 3 = 2 THEN v ELSE 0 END) AS DOUBLE)
                       / (w * h) AS mean_b,
                   md5(pix) AS pixel_digest
            FROM px GROUP BY doc_id, w, h, pix
        """,
        # raw DIB frames are lossless: frame j of doc = uniform colour
        # (ascii chars 3j+1..3j+3); buffer = the 3-byte pattern x 8 pixels
        # Motion-JPEG AVI: uniform 8x8 gray frames of even values (one
        # ascii char per frame) survive JPEG quantization exactly, so
        # the oracle reconstructs every 2nd frame's stats + md5 of its
        # 192-byte RGB buffer from the construction (r15)
        "multimodal_mjpeg": """
            WITH base AS (
                SELECT doc_id, CAST(2 + doc_id % 4 AS INT) AS n,
                       rpad(regexp_replace(text, '[^ -~]', '', 'g'),
                            CAST(2 + doc_id % 4 AS INT), 'x') AS s
                FROM documents
            ),
            fr AS (
                SELECT doc_id, s, CAST(j AS INT) AS frame_idx
                FROM base CROSS JOIN unnest(range(0, CAST(n AS BIGINT), 2)) AS t(j)
            ),
            v AS (
                SELECT doc_id, frame_idx,
                       ascii(s[frame_idx + 1])
                           - ascii(s[frame_idx + 1]) % 2 AS val
                FROM fr
            )
            SELECT doc_id, frame_idx,
                   CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
                   CAST(val AS DOUBLE) AS mean_r,
                   CAST(val AS DOUBLE) AS mean_g,
                   CAST(val AS DOUBLE) AS mean_b,
                   md5(repeat(chr(CAST(val AS INT)), 192)) AS frame_digest
            FROM v
        """,
        # dHash reconstruction: deterministic nearest-neighbour grid
        # x_i = i*w//9, y_j = j*h//8, integer grayscale (r+g+b)//3,
        # bit k = j*8+i set iff left cell darker than right, packed
        # MSB-first into two 32-bit halves; four 16-bit LSH bands give
        # the candidate pairs, exact Hamming <= 6 confirms
        "image_neardup": """
            {dhash_cte}
            cand AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM bands a JOIN bands b
                  ON a.band_id = b.band_id AND a.bv = b.bv
                 AND a.doc_id < b.doc_id
            )
            SELECT c.id_a, c.id_b,
                   CAST(bit_count(xor(ha.hi, hb.hi))
                        + bit_count(xor(ha.lo, hb.lo)) AS INT) AS hamming
            FROM cand c
            JOIN hashes ha ON ha.doc_id = c.id_a
            JOIN hashes hb ON hb.doc_id = c.id_b
            WHERE bit_count(xor(ha.hi, hb.hi))
                  + bit_count(xor(ha.lo, hb.lo)) <= 6
        """.format(dhash_cte=_DHASH_CTE_SQL),
        # incremental image dedup: history = doc_id % 4 == 0 bands; a
        # batch doc is dropped on ANY band shared with history or with
        # a lower-id batch doc (keep-first); survivors carry their hash
        "image_dedup_incr": """
            {dhash_cte}
            dropped AS (
                SELECT DISTINCT nb.doc_id
                FROM bands nb JOIN bands ob
                  ON ob.band_id = nb.band_id AND ob.bv = nb.bv
                WHERE nb.doc_id % 4 <> 0
                  AND (ob.doc_id % 4 = 0
                       OR (ob.doc_id % 4 <> 0 AND ob.doc_id < nb.doc_id))
            )
            SELECT h.doc_id, h.hi AS dhash_hi, h.lo AS dhash_lo
            FROM hashes h
            WHERE h.doc_id % 4 <> 0
              AND h.doc_id NOT IN (SELECT doc_id FROM dropped)
        """.format(dhash_cte=_DHASH_CTE_SQL),
        "multimodal_video": """
            WITH base AS (
                SELECT doc_id, CAST(2 + doc_id % 4 AS INT) AS n,
                       rpad(regexp_replace(text, '[^ -~]', '', 'g'),
                            CAST(3 * (2 + doc_id % 4) AS INT), 'x') AS s
                FROM documents
            ),
            fr AS (
                SELECT doc_id, s, CAST(j AS INT) AS frame_idx
                FROM base CROSS JOIN unnest(range(0, CAST(n AS BIGINT), 2)) AS t(j)
            )
            SELECT doc_id, frame_idx,
                   CAST(4 AS INT) AS width, CAST(2 AS INT) AS height,
                   CAST(ascii(s[3 * frame_idx + 1]) AS DOUBLE) AS mean_r,
                   CAST(ascii(s[3 * frame_idx + 2]) AS DOUBLE) AS mean_g,
                   CAST(ascii(s[3 * frame_idx + 3]) AS DOUBLE) AS mean_b,
                   md5(repeat(substring(s, 3 * frame_idx + 1, 3), 8))
                       AS frame_digest
            FROM fr
        """,
        # uniform even-valued 8x8 gray blocks survive JPEG quantization
        # exactly (see q_multimodal_jpeg): block i of doc = even(ascii of
        # char i); the RGB buffer is 192 consecutive bytes of each value
        "multimodal_jpeg": """
            WITH base AS (
                SELECT doc_id,
                       CAST(3 + doc_id % 4 AS INT) AS k,
                       rpad(regexp_replace(text, '[^ -~]', '', 'g'),
                            CAST(3 + doc_id % 4 AS INT), 'x') AS s
                FROM documents
            ),
            blocks AS (
                SELECT doc_id, k,
                       list_transform(range(1, k + 1),
                           i -> ascii(s[i]) - (ascii(s[i]) % 2)) AS vs
                FROM base
            )
            SELECT doc_id, 'jpeg' AS codec,
                   CAST(8 AS INT) AS width, CAST(8 * k AS INT) AS height,
                   CAST(list_sum(vs) AS DOUBLE) / k AS mean_r,
                   CAST(list_sum(vs) AS DOUBLE) / k AS mean_g,
                   CAST(list_sum(vs) AS DOUBLE) / k AS mean_b,
                   md5(array_to_string(
                       list_transform(vs, v -> repeat(chr(CAST(v AS INT)), 192)),
                       '')) AS pixel_digest
            FROM blocks
        """,
        # nearest-neighbour downsample by 2: kept pixels are those whose
        # (row, col) are both even; pixel p (0-based) of the original
        # string sits at row p/w, col p%w, channel (i-1)%3
        "multimodal_resize": """
            WITH base AS (
                SELECT doc_id,
                       CAST(4 + doc_id % 5 AS INT) AS w,
                       CAST(3 + doc_id % 4 AS INT) AS h,
                       rpad(regexp_replace(text, '[^ -~]', '', 'g'),
                            CAST(3 * (4 + doc_id % 5) * (3 + doc_id % 4) AS INT),
                            'x') AS pix
                FROM documents
            ),
            px AS (
                SELECT doc_id, w, h,
                       CAST(((i - 1) // 3) // w AS INT) AS row,
                       CAST(((i - 1) // 3) % w AS INT) AS col,
                       CAST((i - 1) % 3 AS INT) AS ch,
                       ascii(substring(pix, CAST(i AS INT), 1)) AS v
                FROM (SELECT *, unnest(range(1, CAST(length(pix) + 1 AS BIGINT))) AS i
                      FROM base)
            ),
            kept AS (SELECT * FROM px WHERE row % 2 = 0 AND col % 2 = 0)
            SELECT doc_id, 'ppm' AS codec,
                   CAST(ceil(w / 2.0) AS INT) AS width,
                   CAST(ceil(h / 2.0) AS INT) AS height,
                   CAST(sum(CASE WHEN ch = 0 THEN v ELSE 0 END) AS DOUBLE)
                       / (CAST(ceil(w / 2.0) AS INT) * CAST(ceil(h / 2.0) AS INT)) AS mean_r,
                   CAST(sum(CASE WHEN ch = 1 THEN v ELSE 0 END) AS DOUBLE)
                       / (CAST(ceil(w / 2.0) AS INT) * CAST(ceil(h / 2.0) AS INT)) AS mean_g,
                   CAST(sum(CASE WHEN ch = 2 THEN v ELSE 0 END) AS DOUBLE)
                       / (CAST(ceil(w / 2.0) AS INT) * CAST(ceil(h / 2.0) AS INT)) AS mean_b
            FROM kept GROUP BY doc_id, w, h
        """,
        # WAV 8-bit PCM: amplitude = ascii - 128 (printable ASCII < 128, so
        # |amp| = 128 - ascii); mean_abs = exact int sum / count
        "multimodal_audio": """
            WITH base AS (
                SELECT doc_id,
                       CAST(50 + doc_id % 50 AS INT) AS L,
                       rpad(regexp_replace(text, '[^ -~]', '', 'g'),
                            CAST(50 + doc_id % 50 AS INT), 'x') AS pcm
                FROM documents
            ),
            px AS (
                SELECT doc_id, L,
                       ascii(substring(pcm, CAST(i AS INT), 1)) AS v
                FROM (SELECT *, unnest(range(1, CAST(L + 1 AS BIGINT))) AS i
                      FROM base)
            )
            SELECT doc_id, 'wav' AS codec,
                   CAST(8000 AS INT) AS sample_rate,
                   CAST(1 AS INT) AS n_channels,
                   CAST(L AS BIGINT) AS n_samples,
                   CAST(sum(128 - v) AS DOUBLE) / L AS mean_abs
            FROM px GROUP BY doc_id, L
        """,
        # both codec legs must reproduce the hourly per-user aggregates
        "blob_interop": """
            WITH hourly AS (
                SELECT user_id, date_trunc('hour', ts) AS ts, max(value) AS value
                FROM events GROUP BY 1, 2
            ),
            agg AS (
                SELECT user_id, count(*) AS n_points,
                       CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total
                FROM hourly GROUP BY user_id
            )
            SELECT c.codec, a.user_id, a.n_points, a.total
            FROM agg a CROSS JOIN
                 (VALUES ('lz4_numpy'), ('feather_lz4')) AS c(codec)
        """,
        # global concat-and-chunk token offsets: the oracle's single
        # window cumsum must equal the engine's two-phase prefix sum
        "token_pack": """
            WITH t AS (
                SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                FROM documents
            ),
            c AS (
                SELECT doc_id, n_tokens,
                       COALESCE(sum(n_tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS start_offset
                FROM t
            )
            SELECT doc_id, n_tokens,
                   CAST(start_offset AS BIGINT) AS start_offset,
                   CAST(start_offset // 512 AS BIGINT) AS start_block,
                   CAST((start_offset + greatest(n_tokens, 1) - 1) // 512
                        AS BIGINT) AS end_block
            FROM c
        """,
        # 3-token shingle overlap vs the doc_id%97 benchmark slice
        "contamination": f"""
            WITH src AS (SELECT doc_id, text FROM documents),
            shingled AS ({_SHINGLES_SQL}),
            hashes AS (
                SELECT DISTINCT doc_id, substr(md5(g), 1, 16) AS h
                FROM (SELECT doc_id, unnest(sh) AS g FROM shingled)
            ),
            bench AS (SELECT DISTINCT h FROM hashes WHERE doc_id % 97 = 0)
            SELECT doc_id, count(*) AS n_overlap
            FROM hashes JOIN bench USING (h)
            WHERE doc_id % 97 <> 0
            GROUP BY doc_id
            HAVING count(*) >= 2
        """,
        # rational idf (N - df + 0.5)/(df + 0.5): IEEE add/div/mul only,
        # so the double scores hash identically across engines
        "tfidf_terms": """
            WITH per_doc AS (
                SELECT doc_id, g AS token, count(*) AS tf
                FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS g
                      FROM documents)
                GROUP BY doc_id, g
            ),
            dfreq AS (
                SELECT g AS token, count(*) AS df
                FROM (SELECT doc_id,
                             unnest(list_distinct(string_split(text, ' '))) AS g
                      FROM documents)
                GROUP BY g
            ),
            n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
            scored AS (
                SELECT per_doc.doc_id, per_doc.token, per_doc.tf, dfreq.df,
                       CAST(per_doc.tf AS DOUBLE)
                           * ((n.nd - dfreq.df + 0.5) / (dfreq.df + 0.5)) AS score
                FROM per_doc JOIN dfreq USING (token) CROSS JOIN n
            ),
            r AS (
                SELECT *, CAST(row_number() OVER (
                    PARTITION BY doc_id ORDER BY score DESC, token ASC
                ) AS INT) AS rank
                FROM scored
            )
            SELECT doc_id, token, tf, df, score, rank FROM r WHERE rank <= 5
        """,
        # 5-word segments; a segment is shared when ≥2 docs contain it
        "segment_dedup": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ),
            segs AS (
                SELECT DISTINCT doc_id,
                       substr(md5(array_to_string(
                           ws[CAST(i*5 + 1 AS INT):CAST(i*5 + 5 AS INT)], ' '
                       )), 1, 16) AS h
                FROM (SELECT doc_id, ws,
                             unnest(range(0, CAST(ceil(len(ws) / 5.0) AS BIGINT))) AS i
                      FROM toks)
            ),
            cnt AS (SELECT h, count(*) AS docs FROM segs GROUP BY h),
            per AS (
                SELECT s.doc_id, count(*) AS n_segments,
                       sum(CASE WHEN c.docs >= 2 THEN 1 ELSE 0 END) AS n_shared
                FROM segs s JOIN cnt c USING (h) GROUP BY s.doc_id
            )
            SELECT doc_id, n_segments,
                   CAST(n_shared AS BIGINT) AS n_shared,
                   CAST(n_shared AS DOUBLE) / n_segments AS share_ratio
            FROM per
        """,
        # weights en:2 de:1 fr:1 (W=4). M = min(count_g·W/w_g) is integral
        # for these weights; thresholds are the exact integer formula
        # floor(w·M·16^8 / (W·count)) the engine computes with Fractions
        "rebalance_mix": """
            WITH cnt AS (
                SELECT
                    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_en,
                    sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS c_de,
                    sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS c_fr
                FROM documents
            ),
            m AS (
                SELECT least(2 * c_en, 4 * c_de, 4 * c_fr) AS mm,
                       c_en, c_de, c_fr
                FROM cnt
            ),
            thr AS (
                SELECT
                    CASE WHEN 2 * mm >= 4 * c_en THEN NULL ELSE
                        lower(lpad(to_hex(CAST(CAST(2 AS HUGEINT) * mm * 4294967296
                                         // (CAST(4 AS HUGEINT) * c_en) AS BIGINT)),
                             8, '0')) END AS t_en,
                    CASE WHEN 1 * mm >= 4 * c_de THEN NULL ELSE
                        lower(lpad(to_hex(CAST(CAST(1 AS HUGEINT) * mm * 4294967296
                                         // (CAST(4 AS HUGEINT) * c_de) AS BIGINT)),
                             8, '0')) END AS t_de,
                    CASE WHEN 1 * mm >= 4 * c_fr THEN NULL ELSE
                        lower(lpad(to_hex(CAST(CAST(1 AS HUGEINT) * mm * 4294967296
                                         // (CAST(4 AS HUGEINT) * c_fr) AS BIGINT)),
                             8, '0')) END AS t_fr
                FROM m
            )
            SELECT d.doc_id, d.lang
            FROM documents d, thr
            WHERE (d.lang = 'en' AND (t_en IS NULL OR
                       substr(md5('mix|' || CAST(d.doc_id AS VARCHAR)), 1, 8) < t_en))
               OR (d.lang = 'de' AND (t_de IS NULL OR
                       substr(md5('mix|' || CAST(d.doc_id AS VARCHAR)), 1, 8) < t_de))
               OR (d.lang = 'fr' AND (t_fr IS NULL OR
                       substr(md5('mix|' || CAST(d.doc_id AS VARCHAR)), 1, 8) < t_fr))
        """,
        "store_set_many": store_set_many,
        "kv_clear": kv_clear,
        "sync_tombstone": sync_tombstone,
        "store_meta_aggregates": store_meta_aggregates,
        "store_changefeed": store_changefeed,
        "sync_paged": sync_paged,
        "interval_algebra": interval_algebra,
        "freq_fix": freq_fix,
        "sync_guards": sync_guards,
        # REST replica must equal the server's hourly data, same as sync_pull
        "rest_sync_pull": """
            WITH hourly AS (
                SELECT user_id, date_trunc('hour', ts) AS ts, max(value) AS value
                FROM events GROUP BY 1, 2
            )
            SELECT user_id, count(*) AS n_points,
                   CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total
            FROM hourly GROUP BY user_id
        """,
        # export files are named in yield order (keys ascending), so the
        # filename index is the user's rank among exported users
        "admin_export": """
            WITH hourly AS (
                SELECT user_id, date_trunc('hour', ts) AS ts, max(value) AS value
                FROM events WHERE user_id < 40 GROUP BY 1, 2
            ),
            agg AS (
                SELECT user_id, count(*) AS n_points,
                       CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total
                FROM hourly GROUP BY user_id
            )
            SELECT 'export_serie_' ||
                   CAST(row_number() OVER (ORDER BY user_id) - 1 AS VARCHAR)
                   || '.csv' AS filename,
                   user_id, n_points, total
            FROM agg
        """,
        # the streamed rollup must equal the batch GROUP BY (epoch-aligned
        # 1h tumbling windows = date_trunc)
        # batch twin of the streaming session windows: lag/cumsum breaks,
        # strict < gap (Spark's session interval is half-open)
        "stream_sessions": f"""
            WITH l AS (
                SELECT user_id, ts, value,
                       CASE WHEN ts - lag(ts) OVER (
                                PARTITION BY user_id ORDER BY ts
                            ) < INTERVAL 2 HOUR THEN 0 ELSE 1 END AS brk
                FROM events
            ),
            s AS (
                SELECT *, sum(brk) OVER (
                    PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) AS sid
                FROM l
            )
            SELECT user_id,
                   strftime(min(ts), '{_FMT_DUCK}') AS session_start,
                   strftime(max(ts) + INTERVAL 2 HOUR, '{_FMT_DUCK}') AS session_end,
                   count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total
            FROM s GROUP BY user_id, sid
        """,
        # the doubled stream deduped on event_id must equal the original
        "stream_dedup": f"""
            SELECT event_id, user_id, strftime(ts, '{_FMT_DUCK}') AS ts, value
            FROM events
        """,
        "stream_rollup": f"""
            SELECT user_id,
                   strftime(date_trunc('hour', ts), '{_FMT_DUCK}') AS window_start,
                   strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR,
                            '{_FMT_DUCK}') AS window_end,
                   count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total,
                   min(value) AS vmin, max(value) AS vmax
            FROM events GROUP BY 1, 2, 3
        """,
        # batch twin of the sliding streaming rollup: each event belongs to
        # the two epoch-aligned 2h windows starting at floor(ts/1h)*1h - k*1h
        "stream_sliding": f"""
            WITH w AS (
                SELECT event_type, value,
                       (epoch_us(ts) // 3600000000 - k.k) * 3600000000
                           AS start_us
                FROM events, LATERAL (
                    SELECT unnest(range(0, 2)) AS k
                ) k
            )
            SELECT event_type,
                   strftime(make_timestamp(start_us), '{_FMT_DUCK}')
                       AS window_start,
                   count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total,
                   min(value) AS vmin, max(value) AS vmax
            FROM w GROUP BY 1, 2
        """,
        # batch twin of the stateful stream: a gap > 1h between consecutive
        # events of a user is a hole spanning the missing grid slots
        "stream_gaps": """
            WITH o AS (
                SELECT user_id, ts,
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
                FROM events
            )
            SELECT user_id,
                   epoch_us(prev) + 3600000000 AS hole_start_us,
                   epoch_us(ts) - 3600000000 AS hole_end_us,
                   (epoch_us(ts) - epoch_us(prev)) // 1000000 AS gap_seconds
            FROM o
            WHERE prev IS NOT NULL
              AND epoch_us(ts) - epoch_us(prev) > 3600000000
        """,
        # DuckDB's native ASOF JOIN (greatest click ts <= purchase ts);
        # the 2 h tolerance is applied as a post-filter that NULLs the
        # matched columns, mirroring asof_join(tolerance_seconds=7200)
        "asof_join": """
            WITH p AS (
                SELECT event_id, user_id, ts, value FROM events
                WHERE event_type = 'purchase'
            ),
            c AS (
                SELECT user_id, ts, value FROM events
                WHERE event_type = 'click'
            )
            SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, p.value,
                   CASE WHEN c.ts >= p.ts - INTERVAL 2 HOUR
                        THEN epoch_us(c.ts) END AS click_ts_us,
                   CASE WHEN c.ts >= p.ts - INTERVAL 2 HOUR
                        THEN c.value END AS click_value
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        # 30-min-gap sessionization via lag + running sum, then per-session
        # aggregates; event_id tiebreak matches the Spark window ordering
        "sessionize": """
            WITH o AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                    > 1800000000
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            s AS (
                SELECT user_id, ts,
                       CAST(sum(new_s) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
                           AS session_idx
                FROM o
            )
            SELECT user_id, session_idx,
                   epoch_us(min(ts)) AS start_us,
                   epoch_us(max(ts)) AS end_us,
                   count(*) AS n_events,
                   (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0
                       AS duration_sec
            FROM s GROUP BY user_id, session_idx
        """,
        # epoch-aligned hourly buckets (integer floor-div on micros, same
        # as time_bucket's pmod flooring for these positive epochs);
        # first/last = arg_min/arg_max on the globally-unique event ts
        "time_rollup": """
            SELECT event_type,
                   (epoch_us(ts) // 3600000000) * 3600000000 AS bucket_us,
                   count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS v_sum,
                   min(value) AS v_min, max(value) AS v_max,
                   arg_min(value, ts) AS v_first,
                   arg_max(value, ts) AS v_last
            FROM events GROUP BY 1, 2
        """,
        # plain inequality range join — the bucketed equi-join must return
        # exactly these pairs
        "range_join": """
            WITH err AS (
                SELECT event_id AS iv_id, user_id, ts AS start_ts,
                       ts + INTERVAL 15 MINUTE AS end_ts
                FROM events WHERE event_type = 'error'
            ),
            p AS (
                SELECT user_id, ts, value FROM events
                WHERE event_type <> 'error'
            )
            SELECT e.iv_id, count(*) AS n_pts,
                   CAST(sum(CAST(p.value AS DECIMAL(28,6))) AS DOUBLE) AS v_sum,
                   min(epoch_us(p.ts)) AS first_pt_us
            FROM err e JOIN p
              ON p.user_id = e.user_id
             AND p.ts BETWEEN e.start_ts AND e.end_ts
            GROUP BY e.iv_id
        """,
        # int-quantized inputs + dyadic percentile points make the linear
        # interpolation exact in IEEE doubles, so quantile_cont matches
        # Spark's percentile() bit-for-bit; the mean is an exact long sum
        # with one final double divide in both engines
        "stats_rollup": """
            WITH e AS (
                SELECT event_type,
                       CAST(round(value * 1000) AS BIGINT) AS v_q
                FROM events
            )
            SELECT event_type, count(v_q) AS n,
                   CAST(sum(v_q) AS DOUBLE) / count(*) AS v_mean_exact,
                   quantile_cont(v_q, 0.25) AS p_25,
                   quantile_cont(v_q, 0.50) AS p_50,
                   quantile_cont(v_q, 0.75) AS p_75
            FROM e GROUP BY event_type
        """,
        # bin width 64 is a power of two: value/64.0 is exact, floor and
        # the bin_lo multiply reproduce identically in both engines
        "value_histogram": """
            SELECT event_type,
                   CAST(floor((value - 0.0) / 64.0) AS BIGINT) AS bin,
                   count(*) AS n,
                   0.0 + CAST(floor((value - 0.0) / 64.0) AS BIGINT) * 64.0
                       AS bin_lo
            FROM events
            WHERE value IS NOT NULL
            GROUP BY 1, 2
        """,
        # sliding 200-char windows every 150 chars: starts 0,150,300,...
        # while start < length; digest covers every chunk byte in order
        "doc_chunks": """
            WITH d AS (
                SELECT doc_id, text, length(text) AS n FROM documents
                WHERE text IS NOT NULL AND length(text) > 0
            ),
            c AS (
                SELECT d.doc_id, i.idx AS chunk_id,
                       substring(d.text, CAST(i.idx * 150 + 1 AS BIGINT), 200)
                           AS chunk
                FROM d, LATERAL (
                    SELECT unnest(range(0, (n - 1) // 150 + 1)) AS idx
                ) i
            )
            SELECT doc_id, count(*) AS n_chunks,
                   CAST(sum(length(chunk)) AS BIGINT) AS total_chars,
                   md5(array_to_string(
                       list_sort(list(CAST(chunk_id AS VARCHAR) || ':'
                                      || md5(chunk))), ',')) AS digest
            FROM c GROUP BY doc_id
        """,
        # same IEEE ops as the engine: amax over exact float->double casts,
        # one divide by 127.0, floor(x/scale + 0.5) half-up codes
        "embed_quantize": """
            WITH e AS (
                SELECT vec_id, embedding,
                       list_max(list_transform(
                           embedding, x -> abs(CAST(x AS DOUBLE)))) AS amax
                FROM embeddings
            ),
            q AS (
                SELECT vec_id, amax / 127.0 AS q_scale,
                       CASE WHEN amax = 0
                            THEN list_transform(embedding,
                                                x -> CAST(0 AS INTEGER))
                            ELSE list_transform(embedding,
                                 x -> CAST(floor(CAST(x AS DOUBLE)
                                           / (amax / 127.0) + 0.5)
                                      AS INTEGER))
                       END AS qv
                FROM e
            )
            SELECT vec_id, q_scale,
                   md5(array_to_string(
                       list_transform(qv, x -> CAST(x AS VARCHAR)), ','))
                       AS q_digest,
                   CAST(list_sum(qv) AS BIGINT) AS q_sum,
                   list_min(qv) AS q_min,
                   list_max(qv) AS q_max,
                   len(list_filter(qv, x -> x != 0)) AS q_nnz
            FROM q
        """,
        # TPC-H Q18 shape: pre-aggregate lineitem to qualifying orderkeys
        # BEFORE any join; exact decimal quantity totals
        "large_orders": """
            WITH big AS (
                SELECT l_orderkey,
                       CAST(sum(CAST(l_quantity AS DECIMAL(28,2)))
                            AS DOUBLE) AS total_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING CAST(sum(CAST(l_quantity AS DECIMAL(28,2)))
                            AS DOUBLE) > 300
            )
            SELECT c.c_name, o.o_orderkey,
                   CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR)
                       AS order_date,
                   o.o_totalprice, big.total_qty
            FROM big
            JOIN orders o ON big.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        # TPC-H Q6 shape: pure pushdown scan-agg; per-row product cast to
        # DECIMAL before the exact sum (deterministic rounding of
        # identical doubles in both engines)
        "forecast_revenue": """
            SELECT CAST(sum(CAST(l_extendedprice * l_discount
                                 AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        # TPC-H Q4 shape: EXISTS semi-join (no duplicate-lineitem blowup)
        "order_priority": """
            SELECT o_orderpriority, count(*) AS n_orders
            FROM orders o
            WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
              AND o.o_orderdate <  TIMESTAMP '1997-07-01'
              AND EXISTS (
                  SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
              )
            GROUP BY o_orderpriority
        """,
        "pq_encode": pq_encode_sql,
        "pq_topk": pq_topk_sql,
        "pq_filtered": pq_filtered,
        "bpe_merges": bpe_merges_sql,
        # streaming CUSUM must equal the same batch prefix-sum SQL as
        # cusum_drift (single micro-batch source => in-order => identical)
        "stream_cusum": """
            WITH q AS (
                SELECT user_id, ts, value,
                       CAST(round(value * 1000) AS BIGINT) - 50000 AS y
                FROM events
            ),
            p AS (
                SELECT user_id, ts, value,
                       CAST(sum(y) OVER (
                           PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pp
                FROM q
            ),
            s AS (
                SELECT user_id, ts, value,
                       pp - least(CAST(0 AS BIGINT),
                                  min(pp) OVER (
                                      PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING)) AS sv
                FROM p
            )
            SELECT user_id, epoch_us(ts) AS ts_us, value,
                   sv AS cusum_q
            FROM s WHERE sv > 500000
        """,
        # batch twin of the watermarked stream-stream interval join
        "stream_join": """
            SELECT p.event_id, p.user_id,
                   epoch_us(p.ts) AS ts_us, p.value,
                   epoch_us(c.ts) AS click_ts_us,
                   c.value AS click_value
            FROM events p JOIN events c
              ON p.user_id = c.user_id
             AND p.event_type = 'purchase' AND c.event_type = 'click'
             AND c.ts <= p.ts
             AND c.ts >= p.ts - INTERVAL 7200 SECOND
        """,
        # seasonal baseline: exact integer sums per (user, hod, weekend)
        # slot; weekday via epoch-day arithmetic (Mon=0, 1970-01-01 = Thu=3)
        "seasonal_profile": """
            WITH q AS (
                SELECT user_id, epoch_us(ts) AS ts_us,
                       CAST(round(value * 1000) AS BIGINT) AS v_q
                FROM events
            ),
            s AS (
                SELECT user_id, ts_us, v_q,
                       CAST((ts_us // 3600000000) % 24 AS INTEGER) AS hod,
                       CAST(CASE WHEN (ts_us // 86400000000 + 3) % 7 >= 5
                                 THEN 1 ELSE 0 END AS INTEGER) AS is_weekend
                FROM q
            ),
            prof AS (
                SELECT user_id, hod, is_weekend,
                       count(*) AS n_slot,
                       CAST(sum(v_q) AS DOUBLE) / count(*) AS baseline_q
                FROM s GROUP BY 1, 2, 3
            )
            SELECT s.user_id, s.ts_us, s.hod, s.is_weekend, s.v_q,
                   p.n_slot, p.baseline_q,
                   s.v_q - p.baseline_q AS resid_q
            FROM s JOIN prof p
              ON s.user_id = p.user_id AND s.hod = p.hod
             AND s.is_weekend = p.is_weekend
        """,
        # CUSUM via the prefix-sum identity S_t = P_t - min(0, min P_i):
        # two window functions over exact quantized integers, no recursion
        "cusum_drift": """
            WITH q AS (
                SELECT user_id, ts, value,
                       CAST(round(value * 1000) AS BIGINT) - 50000 AS y
                FROM events
            ),
            p AS (
                SELECT user_id, ts, value,
                       CAST(sum(y) OVER (
                           PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pp
                FROM q
            ),
            s AS (
                SELECT user_id, ts, value,
                       pp - least(CAST(0 AS BIGINT),
                                  min(pp) OVER (
                                      PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING)) AS sv
                FROM p
            )
            SELECT user_id, epoch_us(ts) AS ts_us, value,
                   sv AS cusum_q
            FROM s WHERE sv > 500000
        """,
        # trailing 24-row frames over int-quantized values: every windowed
        # sum (incl. the n*S2 - S1^2 variance numerator) is exact integer
        # arithmetic; (user_id, ts) is unique so the frame is deterministic
        "rolling_stats": """
            WITH q AS (
                SELECT user_id, ts,
                       CAST(round(value * 1000) AS BIGINT) AS v
                FROM events
            )
            SELECT user_id, epoch_us(ts) AS ts_us,
                   CAST(count(v) OVER w AS BIGINT) AS n_window,
                   CAST(sum(v) OVER w AS DOUBLE) / count(v) OVER w
                       AS v_mean_q,
                   min(v) OVER w AS v_min_q,
                   max(v) OVER w AS v_max_q,
                   CAST(count(v) OVER w * sum(v * v) OVER w
                        - sum(v) OVER w * sum(v) OVER w AS BIGINT)
                       AS var_num_q
            FROM q
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
        """,
        # the full composed pipeline as one SQL statement: each CTE is the
        # oracle form of one stage; the digest covers every chunk byte
        "corpus_prep": f"""
            WITH norm AS (
                SELECT doc_id, lang,
                       trim(regexp_replace(regexp_replace(
                           lower(text), '[^a-z0-9 ]', ' ', 'g'),
                           ' +', ' ', 'g')) AS tn
                FROM documents
            ),
            ded AS (
                SELECT doc_id, lang, tn FROM (
                    SELECT norm.*, row_number() OVER (
                        PARTITION BY md5(tn) ORDER BY doc_id ASC) AS rn
                    FROM norm
                ) WHERE rn = 1
            ),
            c AS (
                SELECT lang, count(*) AS n_g FROM ded
                WHERE lang IS NOT NULL GROUP BY lang
            ),
            m AS (SELECT min(n_g) AS n_min FROM c),
            temp AS (
                SELECT d.doc_id, d.lang, d.tn
                FROM ded d JOIN c USING (lang) CROSS JOIN m
                WHERE CAST(CAST('0x' || substr(md5('temp|'
                          || CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                          AS HUGEINT)
                      * CAST('0x' || substr(md5('temp|'
                          || CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                      * n_g
                    < CAST(n_min AS HUGEINT)
                      * CAST('18446744073709551616' AS HUGEINT)
            ),
            sp AS (
                SELECT doc_id, lang, tn,
                       CASE WHEN substr(md5('split|'
                                || CAST(doc_id AS VARCHAR)), 1, 8)
                                 < '{_frac_to_hex(0.95)}'
                            THEN 'train' ELSE 'valid' END AS split
                FROM temp
            ),
            ch AS (
                SELECT sp.doc_id, sp.lang, sp.split, i.idx AS chunk_id,
                       substring(sp.tn, CAST(i.idx * 150 + 1 AS BIGINT), 200)
                           AS chunk
                FROM sp, LATERAL (
                    SELECT unnest(range(0, (length(tn) - 1) // 150 + 1))
                        AS idx
                ) i
                WHERE sp.tn IS NOT NULL AND length(sp.tn) > 0
            )
            SELECT lang, split,
                   count(DISTINCT doc_id) AS n_docs,
                   count(*) AS n_chunks,
                   CAST(sum(length(chunk)) AS BIGINT) AS total_chars,
                   md5(array_to_string(list_sort(list(
                       CAST(doc_id AS VARCHAR) || ':'
                       || CAST(chunk_id AS VARCHAR) || ':'
                       || md5(chunk))), ',')) AS digest
            FROM ch GROUP BY lang, split
        """,
        # byte-for-byte normalization parity: literal char classes only,
        # valid in both Java regex and RE2; DuckDB needs the 'g' flag
        "normalize_text": """
            SELECT doc_id,
                   length(n) AS n_chars_norm,
                   md5(n) AS norm_digest
            FROM (
                SELECT doc_id,
                       trim(regexp_replace(regexp_replace(
                           lower(text), '[^a-z0-9 ]', ' ', 'g'),
                           ' +', ' ', 'g')) AS n
                FROM documents
            )
        """,
        # PMI-ranked collocations via rational LIFT: one double divide of
        # exact integer products, bit-identical; ties broken by bigram text
        "collocations": """
            WITH toks AS (
                SELECT string_split(text, ' ') AS t FROM documents
                WHERE text IS NOT NULL
            ),
            uni AS (
                SELECT w, count(*) AS c_w
                FROM (SELECT unnest(t) AS w FROM toks) u
                WHERE w <> '' GROUP BY w
            ),
            n AS (SELECT CAST(sum(c_w) AS BIGINT) AS n_total FROM uni),
            big AS (
                SELECT t[i] AS w1, t[i + 1] AS w2
                FROM toks, LATERAL (
                    SELECT unnest(range(1, len(t))) AS i
                ) g
            ),
            bi AS (
                SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_ab FROM big
                GROUP BY w1, w2 HAVING count(*) >= 5
            ),
            s AS (
                SELECT bi.w1 || ' ' || bi.w2 AS bg, bi.c_ab,
                       a.c_w AS c_a, b.c_w AS c_b,
                       CAST(bi.c_ab * n.n_total AS DOUBLE)
                           / CAST(a.c_w * b.c_w AS DOUBLE) AS lift
                FROM bi
                JOIN uni a ON bi.w1 = a.w
                JOIN uni b ON bi.w2 = b.w
                CROSS JOIN n
            )
            SELECT bg, c_ab, c_a, c_b, lift,
                   row_number() OVER (ORDER BY lift DESC, bg ASC) AS rank
            FROM s ORDER BY rank LIMIT 20
        """,
        # sqrt-temperature flattening without sqrt: keep iff
        # h^2 * n_g < n_min * 2^64 in HUGEINT (u < sqrt(n_min/n_g) for
        # u = h/2^32) — the exact same row set the engine's isqrt hex
        # thresholds select
        "temperature_sample": """
            WITH c AS (
                SELECT lang, count(*) AS n_g FROM documents
                WHERE lang IS NOT NULL GROUP BY lang
            ),
            m AS (SELECT min(n_g) AS n_min FROM c),
            h AS (
                SELECT d.doc_id, d.lang, c.n_g, m.n_min,
                       CAST('0x' || substr(
                           md5('temp|' || CAST(d.doc_id AS VARCHAR)), 1, 8)
                           AS BIGINT) AS hv
                FROM documents d JOIN c USING (lang) CROSS JOIN m
            )
            SELECT doc_id, lang FROM h
            WHERE CAST(hv AS HUGEINT) * hv * n_g
                  < CAST(n_min AS HUGEINT)
                    * CAST('18446744073709551616' AS HUGEINT)
        """,
        # integer-log2 surprisal: floor_log2(n) = length(bin(n)) - 1 is
        # exact integer arithmetic in both engines — no transcendental ln
        "lm_surprisal": """
            WITH t AS (
                SELECT doc_id,
                       unnest(string_split(text, ' ')) AS tok
                FROM documents WHERE text IS NOT NULL
            ),
            t2 AS (SELECT doc_id, tok FROM t WHERE tok <> ''),
            c AS (SELECT tok, count(*) AS c FROM t2 GROUP BY tok),
            n AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM c)
            SELECT doc_id, count(*) AS n_tokens,
                   CAST(sum(length(bin(n_total)) - length(bin(c)))
                        AS BIGINT) AS sum_bits,
                   CAST(sum(length(bin(n_total)) - length(bin(c)))
                        AS DOUBLE) / count(*) AS mean_bits
            FROM t2 JOIN c USING (tok) CROSS JOIN n
            GROUP BY doc_id
        """,
        # every event belongs to the 2 epoch-aligned 2h-wide windows whose
        # start is floor(ts/1h)*1h - k*1h for k in {0,1} (Spark F.window
        # semantics); integer micros arithmetic, DECIMAL-exact sums
        "sliding_rollup": """
            WITH w AS (
                SELECT event_type, value,
                       (epoch_us(ts) // 3600000000 - k.k) * 3600000000
                           AS window_start_us
                FROM events, LATERAL (
                    SELECT unnest(range(0, 2)) AS k
                ) k
            )
            SELECT event_type, window_start_us,
                   count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS v_sum,
                   min(value) AS v_min, max(value) AS v_max
            FROM w GROUP BY 1, 2
        """,
    }
    # derived entries: the indexed paths must equal their scan twins
    # exactly (shared scoring tail / same training), so they share one
    # oracle string — any indexed-path drift hash-mismatches
    out["c4_quality"] = c4_quality_sql
    out["gopher_quality"] = gopher_quality_sql
    out["stream_pipeline"] = stream_pipeline_sql
    # progressive JPEG carries the same quantized coefficients as the
    # baseline encoding of the same image — one oracle for both
    out["multimodal_progressive"] = out["multimodal_jpeg"]
    out["span_strip"] = span_strip_sql
    out["span_strip_incr"] = span_strip_incr_sql
    out["bm25_indexed"] = out["bm25_search"]
    # recompute_stats done-gate (r15): bm25 over ONLY the surviving
    # documents — stale deleted mass in N/avgdl/df fails the hash.
    # Survivors = everyone except text-bearing doc_id%7==0 docs (the
    # query's victim set; NULL-text docs are never deleted so the pair
    # stays exact on any corpus)
    out["bm25_recompute"] = (
        "WITH docs_live AS "
        "(SELECT * FROM documents "
        "WHERE NOT (doc_id % 7 = 0 AND text IS NOT NULL))"
        + out["bm25_search"]
        .replace("WITH dl AS", ", dl AS", 1)
        .replace("FROM documents", "FROM docs_live")
    )
    out["knn_graph_indexed"] = out["knn_graph"]
    # delete-aware increment (r15): deleted ids leave probes and
    # candidates but NOT the k-means training (the space was trained
    # before the delete) — exactly update_knn_graph's contract
    out["knn_graph_delta"] = (
        out["knn_graph"]
        .replace("FROM v CROSS JOIN c2 s",
                 "FROM v CROSS JOIN c2 s WHERE v.vec_id % 17 <> 0")
        .replace("WHERE c.vec_id <> p.src_id",
                 "WHERE c.vec_id <> p.src_id AND c.vec_id % 17 <> 0")
    )
    out["hybrid_indexed"] = hybrid_indexed_sql
    return out
