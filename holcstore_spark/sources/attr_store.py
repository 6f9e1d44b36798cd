"""AttrStore — user-schema series store (reference ``TimeseriesStore``,
hostore/models/timeserie_store.py:16-138).

Arbitrary declared key columns; one logical series per unique key tuple.
Long layout ``(keys…, ts, value)`` in a single Parquet table. Reads accept
*partial* attrs (multiple matches); ``flat=True`` asserts exactly one.
Writes: plain set over an existing key raises; ``update=True`` is
``new.combine_first(existing)``; ``replace=True`` deletes then inserts.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from holcstore_spark.edge.pandas_bridge import long_to_series
from holcstore_spark.functions.scalar import nan_to_null
from holcstore_spark.plans.predicates import attrs_filter, validate_filter_keys
from holcstore_spark.sources.io_util import safe_local_checkpoint


class AttrStore:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: tuple[str, ...],
        tz: str = "UTC",
    ):
        from holcstore_spark.session import ensure_engine_conf

        ensure_engine_conf(spark)
        self.spark = spark
        self.path = path
        self.keys = tuple(keys)
        self.tz = tz

    def _schema(self, pdf: pd.DataFrame | None = None) -> T.StructType:
        fields = []
        for k in self.keys:
            if pdf is not None and k in pdf and str(pdf[k].dtype).startswith("int"):
                fields.append(T.StructField(k, T.LongType()))
            else:
                fields.append(T.StructField(k, T.StringType()))
        fields += [
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
        return T.StructType(fields)

    def df(self) -> DataFrame:
        from holcstore_spark.sources.io_util import has_parquet

        # emptied stores keep their directory with no parquet footers
        if not has_parquet(self.path):
            return self.spark.createDataFrame([], self._schema())
        return self.spark.read.parquet(self.path)

    def _overwrite(self, df: DataFrame) -> None:
        df = safe_local_checkpoint(df)
        df.write.mode("overwrite").parquet(self.path)

    # ------------------------------------------------------------------
    def _to_pdf(self, attrs: dict, serie: pd.Series) -> pd.DataFrame:
        if not isinstance(serie, pd.Series) or not isinstance(serie.index, pd.DatetimeIndex):
            raise ValueError("expected a pd.Series with a DatetimeIndex")
        if len(serie) == 0 or serie.isna().all():
            raise ValueError("refusing to store an empty or all-NaN series")
        idx = serie.index
        idx = idx.tz_localize(self.tz) if idx.tz is None else idx
        pdf = pd.DataFrame(
            {"ts": idx.tz_convert("UTC"), "value": serie.to_numpy(dtype="float64")}
        )
        for k in self.keys:
            pdf[k] = attrs[k]
        return pdf[[*self.keys, "ts", "value"]]

    def _ensure_full(self, attrs: dict) -> None:
        if set(attrs) != set(self.keys):
            raise ValueError(f"attrs must specify exactly {list(self.keys)}")

    def set_ts(
        self,
        ts_attributes: dict,
        ds_ts: pd.Series,
        update: bool = False,
        replace: bool = False,
    ) -> None:
        """reference: timeserie_store.py:95-138."""
        if update and replace:
            raise ValueError("update and replace are mutually exclusive")
        self._ensure_full(ts_attributes)
        pred = attrs_filter(ts_attributes)
        exists = bool(self.df().filter(pred).limit(1).count())
        if exists and not (update or replace):
            raise ValueError(
                f"series {ts_attributes} already exists; use update or replace"
            )
        if exists and update:
            existing = self.get_ts(ts_attributes, flat=True)
            ds_ts = ds_ts.combine_first(existing)
        pdf = self._to_pdf(ts_attributes, ds_ts)
        new = nan_to_null(self.spark.createDataFrame(pdf, self._schema(pdf)), "value")
        if exists:
            self._overwrite(self.df().filter(~pred).unionByName(new))
        else:
            new.write.mode("append").parquet(self.path)

    def set_many_ts(
        self,
        mapping: dict[tuple, pd.Series],
        update: bool = False,
        replace: bool = False,
    ) -> None:
        """Batched multi-series write — ONE Spark write for the whole
        mapping instead of a driver-paced ``set_ts`` loop (the reference's
        ``TimeseriesStore`` has only the per-series path,
        timeserie_store.py:95-138; ChunkStore's ``set_many_ts`` is the
        model). ``mapping`` maps key tuples (in ``self.keys`` order; a
        scalar is accepted for single-key stores) to series.

        Semantics per key match ``set_ts`` exactly: plain call refuses
        existing keys; ``update=True`` is new.combine_first(existing)
        merged distributed-side (one union + one window, no per-series
        read-back); ``replace=True`` drops the old rows. The existence
        check is a single left-semi join for the entire batch."""
        if update and replace:
            raise ValueError("update and replace are mutually exclusive")
        if not mapping:
            return
        frames = []
        for key_tuple, serie in mapping.items():
            kt = key_tuple if isinstance(key_tuple, tuple) else (key_tuple,)
            attrs = dict(zip(self.keys, kt))
            self._ensure_full(attrs)
            frames.append(self._to_pdf(attrs, serie))
        pdf = pd.concat(frames, ignore_index=True)
        new = nan_to_null(self.spark.createDataFrame(pdf, self._schema(pdf)), "value")
        key_set = new.select(*self.keys).distinct()
        existing_match = self.df().join(key_set, on=list(self.keys), how="left_semi")
        exists_any = bool(existing_match.limit(1).count())
        if exists_any and not (update or replace):
            raise ValueError(
                "set_many_ts: some keys already exist; use update or replace"
            )
        if not exists_any:
            new.write.mode("append").parquet(self.path)
            return
        keep = self.df().join(key_set, on=list(self.keys), how="left_anti")
        if update:
            from holcstore_spark.operators.overlay import combine_first

            new = combine_first([new, existing_match], keys=self.keys)
        self._overwrite(keep.unionByName(new.select(*self.keys, "ts", "value")))

    def get_ts(self, ts_attributes: dict, flat: bool = False):
        """Partial-attrs read (reference: timeserie_store.py:59-93):
        list of {keys…, 'data': Series}, or a single Series when flat."""
        validate_filter_keys(ts_attributes, self.keys)
        d = self.df().filter(attrs_filter(ts_attributes))
        pdf = d.orderBy(*self.keys, "ts").toPandas()
        entries = []
        if len(pdf):
            for gkey, gdf in pdf.groupby(list(self.keys), sort=False):
                gkey = gkey if isinstance(gkey, tuple) else (gkey,)
                s = long_to_series(gdf, self.tz)
                entries.append({**dict(zip(self.keys, gkey)), "data": s})
        if flat:
            if len(entries) != 1:
                raise ValueError(
                    f"flat=True requires exactly one match, got {len(entries)}"
                )
            return entries[0]["data"]
        return entries

    def delete(self, ts_attributes: dict) -> None:
        validate_filter_keys(ts_attributes, self.keys)
        self._overwrite(self.df().filter(~attrs_filter(ts_attributes)))

    def count(self, ts_attributes: dict | None = None) -> int:
        d = self.df().filter(attrs_filter(ts_attributes))
        return d.select(*self.keys).distinct().count()
