"""ChunkStore — the scale-path store (reference ``TimeseriesChunkStore``,
hostore/models/chunk_timeserie_store.py:180-899, re-architected for Spark).

Physical layout (no blobs, no hand-rolled compression — Parquet does both):

- ``<path>/data``  — long table ``(keys…, ts TIMESTAMP, value DOUBLE)``
  **partitioned by** ``chunk_index`` (local-calendar year or year-month,
  same arithmetic as the reference so partition ids line up). A time-bounded
  read touches only the matching partition directories; within a partition,
  Parquet row-group min/max stats on the key columns skip other series'
  row groups.
- ``<path>/meta``  — append-only changelog ``(keys…, chunk_index, start_ts,
  n_points, updated_at, op_id, is_deleted)``. The *latest state* per
  ``(keys…, chunk_index)`` (max op_id) is the chunk directory: it carries
  the tombstone flag (reference: is_deleted soft delete,
  chunk_timeserie_store.py:30-52) and the sync watermark ``updated_at``
  (:288-307). The log IS the change feed — ``updates(since)`` is a filter,
  no CDC machinery needed.

Write semantics mirror the reference exactly: plain insert refuses existing
keys; ``update`` is per-timestamp ``new.combine_first(existing)``;
``replace`` overwrites the new span and tombstones the key's chunks outside
it (:357-370). Deletes are tombstones unless ``keep_tracking=False``.

Concurrency: the plain layout is single-writer per store (the reference
relies on DB row locks, :786-789) with an optimistic op_id fence that
detects violations. ``ChunkStoreConfig(acid=True)`` swaps in the built-in
transaction-log backend (``sources/txlog.py``) — immutable files + atomic
manifest commits, Delta-style optimistic concurrency and data skipping —
which removes the single-writer restriction entirely.
"""

from __future__ import annotations

import contextlib
import os
import time
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from holcstore_spark.config import DEFAULT_WATERMARK, ChunkStoreConfig
from holcstore_spark.edge.pandas_bridge import (
    long_to_series,
    normalize_series,
    series_to_long,
)
from holcstore_spark.functions.scalar import chunk_index_col, nan_to_null
from holcstore_spark.operators.grid import chunk_aligned_bounds, reindex_to_chunk_grid
from holcstore_spark.operators.overlay import combine_first
from holcstore_spark.operators.slicing import drop_bounds_na as _drop_bounds_na
from holcstore_spark.operators.slicing import time_slice
from holcstore_spark.plans.predicates import attrs_filter, validate_filter_keys
from holcstore_spark.plans.pruning import chunk_bounds_filter, normalize_bound
from holcstore_spark.sources.io_util import has_parquet, safe_local_checkpoint


class KeyExistsError(Exception):
    """Blind overwrite of an existing series (reference: DB IntegrityError
    from the unique (keys…, chunk_index) constraint)."""


class SyncGuardError(Exception):
    """Operation forbidden on a sync-enabled store
    (reference: chunk_timeserie_store.py:44-47,337-339,439-441)."""


class ConcurrentWriteError(Exception):
    """Another writer committed during this write's read→publish span.

    Plain layout: raised by the optimistic op_id fence — plain Parquet
    has no row locks (the reference serializes upserts with
    select_for_update, chunk_timeserie_store.py:786-789), the store is
    SINGLE-WRITER by contract, and the fence turns a detected violation
    into a loud failure instead of silently-lost rows. Best-effort: a
    writer landing inside the final check→overwrite window can still
    race; serialize writers externally — or use ACID mode.

    ACID mode (``ChunkStoreConfig(acid=True)``): raised at the ATOMIC
    commit point of the transaction log when an interleaved commit
    genuinely conflicts (touched the same files/chunks). No race
    window; disjoint concurrent writers rebase and both survive
    (sources/txlog.py)."""


class StaleBaseError(ConcurrentWriteError):
    """The transaction's base snapshot predates the pruned log horizon
    (or its commit slot was recycled below it) — the write cannot land
    at ANY version from this base. Distinguished from a plain
    :class:`ConcurrentWriteError` because the only valid reaction is a
    FULL re-run against a fresh snapshot: retrying the same commit with
    housekeeping stripped (``_commit_txn``'s compaction-undo retry)
    would hit the same horizon check again, so that retry budget must
    not be consumed by this class."""


def _transactional(op: str):
    """Wrap a public write method in an ACID transaction (no-op on plain
    stores): every staged file of the call commits as one atomic log
    record at exit."""
    import functools

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(self, *args, **kwargs):
            with self._txn(op):
                return fn(self, *args, **kwargs)

        return wrapper

    return deco


class _Txn:
    """Accumulator for one ACID write operation: the base snapshot all
    reads use, staged adds/removes, the touched chunk set the commit
    declares for conflict detection, and (for inserts) the key digests
    that let concurrent same-key appends conflict precisely."""

    __slots__ = ("op", "snapshot", "op_id", "adds", "removes", "touched",
                 "append_keys", "dropped_keys", "dropped_unknown",
                 "dropped_key_tuples", "compaction_backup", "compacting",
                 "txn_app", "txn_version")

    def __init__(self, op: str, snapshot):
        self.op = op
        self.snapshot = snapshot
        #: Lamport stamp — strictly above every op_id the base snapshot
        #: replayed, so latest_meta's op_id winner resolution follows
        #: commit CAUSALITY, not wall-clock order, under multi-host
        #: clock skew (txlog.TxLog.next_op_id)
        from holcstore_spark.sources.txlog import TxLog

        self.op_id = TxLog.next_op_id(snapshot)
        self.adds = {"data": [], "meta": []}
        self.removes = {"data": [], "meta": []}
        self.touched = None  # None = pure append | "all" | set[int]
        #: md5 digests of inserted key tuples (append commits only);
        #: None = unknown/unbounded — concurrent appends then pass
        #: undetected, the documented blind-append trade (Delta-like)
        self.append_keys: list[str] | None = None
        #: md5 digests of the key tuples a rewrite drops/replaces;
        #: chunk-overlap conflicts are waived when both sides' key sets
        #: are known and disjoint (key-level conflict detection — many
        #: writers can update DIFFERENT series of the same month chunk
        #: concurrently); None = unknown → chunk-granular conservative
        self.dropped_keys: list[str] | None = None
        self.dropped_unknown = False
        #: the canonical key tuples behind dropped_keys — lets the
        #: rewrite narrow its copy-on-write to files whose key stats can
        #: contain them (None = unknown → all chunk-overlapping files)
        self.dropped_key_tuples: list[tuple] | None = None
        self.compaction_backup = None
        #: True when this commit's DATA-table changes are row-preserving
        #: (a pure file-layout rewrite — no row added, changed, or
        #: dropped): change feeds then skip the commit at manifest level
        #: (Delta's ``dataChange=false``). Meta-table housekeeping never
        #: sets this — it piggybacks on commits with real data changes,
        #: and no change-feed consumer reads meta files.
        self.compacting = False
        #: idempotent-writer identity (Delta ``txn`` analogue): when
        #: set, the commit records ``(txn_app, txn_version)`` and the
        #: rebase walk refuses a duplicate — see TxLog.commit
        self.txn_app: str | None = None
        self.txn_version: int | None = None

    def touch(self, chunks) -> None:
        if chunks == "all" or self.touched == "all":
            self.touched = "all"
            return
        self.touched = (self.touched or set()) | set(chunks)


def _changes_between_df(
    spark: SparkSession, txlog, from_version: int, to_version: int | None,
    read_paths,
) -> DataFrame:
    """Shared manifest-diff → row-delta core (see
    ``ChunkStore.changes_between`` for semantics): resolve the two
    snapshots, diff their data-file sets, and let the store-specific
    ``read_paths(paths, other_df)`` callback read each side with the
    right schema (``other_df`` is the already-built opposite side, or
    None — lets schema-inferring stores type their empty frame)."""
    snap_to = txlog.snapshot(as_of=to_version)
    if to_version is not None and snap_to.version != to_version:
        raise ValueError(
            f"version {to_version} is not a committed log version "
            f"(nearest at-or-before: {snap_to.version})"
        )
    snap_from = txlog.snapshot(as_of=from_version)
    if snap_from.version != from_version:
        raise ValueError(
            f"version {from_version} is not a committed log version "
            f"(nearest at-or-before: {snap_from.version})"
        )
    if from_version > snap_to.version:
        # an inverted range would silently return the delta with the
        # insert/delete labels swapped — refuse like Delta's
        # table_changes does
        raise ValueError(
            f"inverted version range: from_version {from_version} > "
            f"to_version {snap_to.version}"
        )
    paths_from = {e["path"] for e in snap_from.files["data"]}
    paths_to = {e["path"] for e in snap_to.files["data"]}
    # manifest-level compaction skip (Delta dataChange=false analogue):
    # substitute row-preserving commits out of the TO endpoint so their
    # file churn is never read at all — a compaction in the middle of
    # the interval then costs nothing instead of a full read-and-cancel
    from holcstore_spark.sources.txlog import rewind_compacting

    moves = txlog.compacting_data_moves(from_version, snap_to.version)
    if moves:
        paths_to = rewind_compacting(paths_to, moves, root=txlog.root)
    added_paths = sorted(paths_to - paths_from)
    removed_paths = sorted(paths_from - paths_to)
    added = read_paths(added_paths, None)
    removed = read_paths(removed_paths, added)
    if not added_paths and removed_paths:
        # schema-inferring stores type an empty frame from the OTHER
        # side; the added side was built blind, so re-type it now that
        # removed's schema is known (delete-only intervals)
        added = read_paths(added_paths, removed)
    inserts = added.exceptAll(removed).withColumn("_change_type", F.lit("insert"))
    deletes = removed.exceptAll(added).withColumn("_change_type", F.lit("delete"))
    return inserts.unionByName(deletes)


def _history_df(spark: SparkSession, txlog) -> DataFrame:
    """Commit-log rows as a typed frame (shared by every
    manifest-backed store's ``history()``)."""
    schema = T.StructType([
        T.StructField("version", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("op_id", T.LongType()),
        T.StructField("committed_at", T.TimestampType()),
        T.StructField("touched", T.StringType()),
        T.StructField("data_files_added", T.LongType()),
        T.StructField("data_files_removed", T.LongType()),
        T.StructField("data_rows_added", T.LongType()),
        T.StructField("data_rows_removed", T.LongType()),
        T.StructField("meta_files_added", T.LongType()),
        T.StructField("meta_files_removed", T.LongType()),
        T.StructField("meta_rows_added", T.LongType()),
        T.StructField("meta_rows_removed", T.LongType()),
        T.StructField("txn_app", T.StringType()),
        T.StructField("txn_version", T.LongType()),
    ])
    rows = []
    for r in txlog.history_rows():
        t = r["touched"]
        tv = r.get("txn_version")
        rows.append((
            r["version"], r["op"], r["op_id"],
            datetime.fromtimestamp(r["committed_at"], tz=timezone.utc),
            None if t is None else (t if isinstance(t, str) else str(t)),
            r["data_files_added"], r["data_files_removed"],
            r["data_rows_added"], r["data_rows_removed"],
            r["meta_files_added"], r["meta_files_removed"],
            r["meta_rows_added"], r["meta_rows_removed"],
            r.get("txn_app"), None if tv is None else int(tv),
        ))
    return spark.createDataFrame(rows, schema)


#: declared key-type name → Spark type (shared with the streaming CDC
#: source's schema derivation — one source of truth)
_KEY_TYPE_MAP = {"str": T.StringType(), "int": T.LongType(), "float": T.DoubleType()}


def probe_key_types_from_manifest(path: str, keys, txlog=None) -> dict[str, str]:
    """Resolve key-column type names (``str``/``int``/``float``) from a
    live data file's parquet footer — one driver-side metadata read per
    file consulted, no Spark job. Accumulates across files until EVERY
    requested key is proven (or the manifest is exhausted) — stopping at
    the first file that resolves *any* key would let a file missing some
    key column shadow later files that could prove it, making
    ``data_schema_from_config`` raise "no live data file" spuriously
    (ADVICE r9). Returns the subset of ``keys`` the footers could prove;
    empty when the store has no live (readable) data file. Pass the
    store's own ``txlog`` where one is held: its snapshot cache makes
    the repeated empty-store probe a listdir instead of a log replay."""
    keys = list(keys)
    if not keys:
        return {}
    import pyarrow as pa
    import pyarrow.parquet as pq

    if txlog is None:
        from holcstore_spark.sources.txlog import TxLog

        txlog = TxLog(path)
    out: dict[str, str] = {}
    # scan bound: a key that NO footer can prove (typo'd name, exotic
    # physical type) must not turn the probe into an O(live-files)
    # driver-side footer crawl at 100k+ files — after this many
    # consecutive readable footers that added nothing, the remaining
    # keys are declared unprovable (heterogeneous schemas cluster by
    # write batch, so the proving file is found long before the cap)
    max_unhelpful = 64
    unhelpful = 0
    for e in txlog.snapshot().files["data"]:
        try:
            schema = pq.read_schema(os.path.join(path, e["path"]))
        except (FileNotFoundError, OSError, pa.ArrowInvalid):
            continue
        before = len(out)
        for k in keys:
            if k in out:
                continue
            idx = schema.get_field_index(k)
            if idx < 0:
                continue
            t = schema.field(idx).type
            if pa.types.is_integer(t):
                out[k] = "int"
            elif pa.types.is_floating(t):
                out[k] = "float"
            elif pa.types.is_string(t) or pa.types.is_large_string(t):
                out[k] = "str"
        if len(out) == len(keys):
            break
        unhelpful = unhelpful + 1 if len(out) == before else 0
        if unhelpful >= max_unhelpful:
            break
    return out


def data_schema_from_config(cfg, path: str | None = None) -> T.StructType:
    """The data-table schema a ChunkStoreConfig implies, without a store
    instance. Used by the streaming CDC source so the two schema
    derivations cannot drift.

    Keys missing from ``cfg.key_types`` are resolved from a live data
    file's parquet footer when ``path`` is given — the WRITTEN type is
    the truth (``_key_schema`` infers long/double from the written
    frame, so a string default here would misread every non-string-keyed
    store created without ``key_types``, ADVICE r7). With undeclared
    keys, a path, and no live file to probe, the feed REFUSES loudly
    rather than guess. Without a path the legacy string default applies
    (parity with ``_key_schema`` and harmless: that caller context has
    no rows to misread)."""
    inferred: dict[str, str] = {}
    undeclared = [k for k in cfg.keys if not cfg.key_types.get(k)]
    if path is not None and undeclared:
        inferred = probe_key_types_from_manifest(path, undeclared)
        missing = [k for k in undeclared if k not in inferred]
        if missing:
            raise ValueError(
                f"cannot derive the change-feed schema: key column(s) "
                f"{missing} are not declared in key_types and the store "
                "has no live data file to infer them from — declare "
                "key_types in ChunkStoreConfig to use the change feed"
            )
    fields = [
        T.StructField(
            k, _KEY_TYPE_MAP[cfg.key_types.get(k) or inferred.get(k, "str")]
        )
        for k in cfg.keys
    ]
    fields += [
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("chunk_index", T.IntegerType()),
    ]
    return T.StructType(fields)


_META_EXTRA = [
    ("chunk_index", T.IntegerType()),
    ("start_ts", T.TimestampType()),
    ("n_points", T.LongType()),
    ("updated_at", T.TimestampType()),
    ("op_id", T.LongType()),
    ("is_deleted", T.BooleanType()),
]


class ChunkStore:
    def __init__(self, spark: SparkSession, path: str, config: ChunkStoreConfig):
        from holcstore_spark.session import ensure_engine_conf

        ensure_engine_conf(spark)
        self.spark = spark
        self.path = path
        config = config.resolve(path)  # acid=None → saved/detected/new-default
        self.config = config
        config.check_compatible(path)
        config.save(path)
        self._data_path = os.path.join(path, "data")
        self._meta_path = os.path.join(path, "meta")
        self._meta_cache: DataFrame | None = None
        self._has_tombstones: bool | None = None
        self._acid = bool(getattr(config, "acid", False))
        self._active_txn: "_Txn | None" = None
        self._pinned_snapshot = None  # set on time_travel() views
        self._meta_cache_version: int | None = None
        self._key_type_probe: dict[str, str] | None = None
        #: incomplete probe memo: (manifest version, partial result)
        self._key_type_probe_partial: tuple[int, dict[str, str]] | None = None
        if self._acid:
            import threading

            from holcstore_spark.sources.txlog import TxLog

            self._txlog = TxLog(path)
            # serializes write transactions of THIS instance across
            # threads: without it a second thread entering _txn while
            # another thread's txn is open would silently merge into it
            # (cross-INSTANCE concurrency is the supported multi-writer
            # pattern and goes through the commit protocol instead)
            self._txn_lock = threading.Lock()
            self._txn_owner: int | None = None

    # ------------------------------------------------------------------
    # ACID mode: transactions over the file-manifest log (txlog.py)
    # ------------------------------------------------------------------
    def _snapshot(self):
        """Current manifest snapshot; inside a transaction, the BASE
        snapshot captured at txn start — every read a write op performs
        sees one consistent version (MVCC), so no localCheckpoint
        lineage cuts are needed on the ACID path."""
        if self._pinned_snapshot is not None:
            return self._pinned_snapshot
        txn = self._active_txn
        if txn is not None:
            return txn.snapshot
        return self._txlog.snapshot()

    def time_travel(self, version: int) -> "ChunkStore":
        """Read-only view of the store AS OF a committed log version
        (ACID only) — every read API (``get_ts``, ``alive_data``,
        ``updates``, …) serves the historical state; writes raise.
        Available as long as the version's commit records and files
        survive (``vacuum()`` reclaims superseded files and prunes
        checkpointed records, giving up horizons older than the latest
        checkpoint — Delta's VACUUM/log-retention trade)."""
        if not self._acid:
            raise ValueError("time_travel requires an ACID store (acid=True)")
        snap = self._txlog.snapshot_exact(version)
        view = ChunkStore(self.spark, self.path, self.config)
        view._pinned_snapshot = snap
        return view

    def history(self) -> DataFrame:
        """Commit-log audit frame (Delta's ``DESCRIBE HISTORY``
        analogue), pairing with :meth:`time_travel`: one row per
        replayable commit, newest first — version, op, op_id, commit
        wall-clock, files/rows added and removed per table, touched
        chunk set. Commits summarized by a pruned checkpoint are no
        longer listed (same reach as ``time_travel``). Metadata-sized:
        the replayable log is bounded by checkpoint+prune."""
        if not self._acid:
            raise ValueError("history requires an ACID store (acid=True)")
        return _history_df(self.spark, self._txlog)

    def last_txn_version(self, txn_app: str) -> int | None:
        """Highest ``txn_version`` the idempotent writer ``txn_app`` has
        committed, or None if it never wrote (Delta's ``txnVersion``
        read-back). A resuming sink queries this to decide where its
        replay must start; watermarks survive log pruning (persisted in
        checkpoint headers)."""
        if not self._acid:
            raise ValueError(
                "idempotent writes (txn_app) require an ACID store "
                "(acid=True)"
            )
        return self._txlog.snapshot().app_versions.get(str(txn_app))

    def restore(self, version: int) -> int:
        """Roll the store back to a committed log version as a NEW
        commit (Delta's ``RESTORE TABLE`` analogue; ACID only) — the
        write-side completion of the :meth:`time_travel` /
        :meth:`history` triad. The rollback commit re-references the old
        generation's files and removes everything newer, so history is
        preserved: ``history()`` shows the restore itself, and
        ``time_travel`` can still visit the undone versions until
        vacuum/prune reclaims them. Refuses when the target version is
        pruned below the log horizon or any file it needs was vacuumed.
        Returns the new commit's version."""
        if not self._acid:
            raise ValueError("restore requires an ACID store (acid=True)")
        if self._pinned_snapshot is not None:
            raise ValueError("time-travel views are read-only (restore refused)")
        v = self._txlog.restore_commit(version)
        self._invalidate_meta_cache()
        return v

    def changes_between(self, from_version: int,
                        to_version: int | None = None) -> DataFrame:
        """Row-level change feed between two committed log versions
        (Delta CDF's ``table_changes`` analogue; ACID only): the data
        rows inserted and removed by the commits in
        ``(from_version, to_version]``, as the data columns plus a
        ``_change_type`` column ('insert' | 'delete'; an in-place
        update of a point surfaces as delete of the old row + insert
        of the new).

        Scale shape: derived from the MANIFEST diff — only the files
        added or removed in the interval are read, never the table, so
        the cost is bounded by what changed regardless of store size.
        Copy-on-write rewrites carry unchanged bystander rows into
        their new files; the ``exceptAll`` between the added and
        removed file sets cancels those exactly, leaving the true
        row-level delta. Contract notes: this is the PHYSICAL data
        delta — dense-grid NaN padding participates like any row, and
        tombstone deletes (meta-only commits) report no data changes;
        both bounds must be at-or-below the pruned log horizon's reach
        (same availability as :meth:`time_travel`)."""
        if not self._acid:
            raise ValueError("changes_between requires an ACID store (acid=True)")
        cols = [f.name for f in self._data_schema()]

        def _read(paths, _other) -> DataFrame:
            if not paths:
                return self.spark.createDataFrame([], self._data_schema())
            full = [os.path.join(self.path, p) for p in paths]
            return self.spark.read.schema(self._data_schema()).parquet(*full).select(*cols)

        return _changes_between_df(
            self.spark, self._txlog, from_version, to_version, _read
        )

    @contextlib.contextmanager
    def _txn(self, op: str):
        """All staged adds/removes of one public write op commit as ONE
        atomic log record (data + meta together — the import path's
        'data lands first, meta last' crash window disappears). Nested
        entry reuses the outer transaction. No-op on plain stores."""
        if not self._acid:
            yield None
            return
        if self._pinned_snapshot is not None:
            raise ValueError(f"time-travel views are read-only ({op} refused)")
        import threading

        tid = threading.get_ident()
        if self._active_txn is not None and self._txn_owner == tid:
            yield self._active_txn  # nested call, same thread
            return
        # another thread's txn is open on THIS instance: serialize (the
        # multi-writer pattern is one instance per writer, arbitrated by
        # the commit protocol — within an instance writes are ordered)
        with self._txn_lock:
            snap = self._txlog.snapshot()
            # the latest_meta cache may predate this base snapshot (a
            # cross-process commit landed since it was built) — existence
            # checks and tombstone flags must validate against the same
            # version this txn will commit over
            if self._meta_cache_version != snap.version:
                self._invalidate_meta_cache()
            txn = _Txn(op, snap)
            self._active_txn = txn
            self._txn_owner = tid
            try:
                try:
                    yield txn
                    if any(txn.adds.values()) or any(txn.removes.values()):
                        self._commit_txn(txn, op, snap)
                        self._invalidate_meta_cache()
                except BaseException:
                    # the op failed BEFORE (or at) commit: everything it
                    # staged is an orphan — note it so the default
                    # vacuum reclaims it without a full staging-dir walk
                    # (a commit-level failure also notes these; the
                    # duplicate sidecar is benign). compaction_backup
                    # holds the original meta adds a compaction swapped
                    # out mid-commit.
                    staged = [
                        e["path"] for t in ("data", "meta")
                        for e in txn.adds[t]
                    ]
                    if txn.compaction_backup is not None:
                        staged += [
                            e["path"] for e in txn.compaction_backup[0]
                        ]
                    try:
                        self._txlog.note_orphans(staged)
                    except OSError:
                        pass  # best-effort: deep vacuum still covers it
                    raise
            finally:
                self._active_txn = None
                self._txn_owner = None

    def _commit_txn(self, txn, op: str, snap) -> None:
        """Commit a transaction, opportunistically folding in meta
        auto-compaction; if the compaction (and only it) loses a race
        with a concurrent commit, retry once without it — a pure append
        must never fail because housekeeping piggybacked on it."""
        # meta auto-compaction (ACID twin of _maybe_compact_meta): every
        # commit stages one meta file, so a long-lived store would pay an
        # O(commits) meta read — collapse to latest state inside this
        # same atomic commit past the threshold
        removed_meta = {r["path"] for r in txn.removes["meta"]}
        if (
            len(txn.snapshot.files["meta"]) + len(txn.adds["meta"])
            > self.META_COMPACT_THRESHOLD
            and not any(
                e["path"] in removed_meta for e in txn.snapshot.files["meta"]
            )
        ):
            self._compact_meta_into_txn(txn)
        try:
            # commit_idempotent: a duplicate idempotent batch raced us
            # in (crash-replay) returns None — the batch IS durable, a
            # silent no-op success (the staged files were noted as
            # orphans on the way out)
            self._txlog.commit_idempotent(
                base_version=snap.version,
                op=op,
                op_id=txn.op_id,
                adds=txn.adds,
                removes=txn.removes,
                touched=txn.touched,
                append_keys=txn.append_keys,
                dropped_keys=txn.dropped_keys,
                compacting=txn.compacting,
                txn_app=txn.txn_app,
                txn_version=txn.txn_version,
            )
        except StaleBaseError:
            # a stale base fails at EVERY candidate slot (the horizon
            # check is base-relative), so retrying with the compaction
            # stripped would deterministically re-raise — propagate
            # immediately and keep the retry budget for a later genuine
            # conflict (ADVICE r8: the subclass must not be swallowed by
            # the ConcurrentWriteError handler below)
            raise
        except ConcurrentWriteError:
            if txn.compaction_backup is None:
                raise
            # undo the compaction (its staged file becomes a vacuum-able
            # orphan — the failed commit attempt already noted it) and
            # retry as the plain operation; a still-raised error is then
            # a genuine conflict of the operation itself
            txn.adds["meta"], n_rm = txn.compaction_backup
            del txn.removes["meta"][n_rm:]
            txn.compaction_backup = None
            # same ORIGINAL base: commit() re-walks every interleaved
            # commit, so the operation's own conflicts are still checked
            self._txlog.commit_idempotent(
                base_version=snap.version,
                op=op,
                op_id=txn.op_id,
                adds=txn.adds,
                removes=txn.removes,
                touched=txn.touched,
                append_keys=txn.append_keys,
                dropped_keys=txn.dropped_keys,
                compacting=txn.compacting,
                txn_app=txn.txn_app,
                txn_version=txn.txn_version,
            )

    def _stage_into_txn(
        self, sdf: DataFrame, table: str, npart: int | None = None
    ) -> None:
        """Write a frame to a fresh immutable ``files/<uuid>/`` dir and
        register its files in the active transaction. Data frames are
        range-partitioned by (chunk_index, keys…) so each file covers a
        narrow chunk range — that is what makes the manifest's per-file
        chunk stats selective (file skipping) and retention sweeps
        file-granular. ``npart`` pins the range-partition count (the
        binpack path: ``optimize`` wants ~one file per repacked chunk,
        not the session shuffle parallelism)."""
        txn = self._active_txn
        abs_dir, rel_dir = self._txlog.new_staging_dir()
        if table == "data":
            df = self._cast_canonical(sdf, self._data_schema())
            rng = ("chunk_index", *self.config.keys)
            df = (
                df.repartitionByRange(npart, *rng)
                if npart is not None
                else df.repartitionByRange(*rng)
            ).sortWithinPartitions(*self.config.keys, "ts")
        else:
            df = self._cast_canonical(sdf, self._meta_schema()).coalesce(1)
        df.write.mode("overwrite").parquet(abs_dir)
        key_cols = self.config.keys if table == "data" else ()
        txn.adds[table].extend(
            self._txlog.collect_entries(abs_dir, rel_dir, key_cols=key_cols)
        )

    #: append commits record at most this many inserted-key digests for
    #: concurrent same-key insert detection; larger inserts are blind
    #: appends (documented Delta-like trade)
    APPEND_KEYS_CAP = 10_000

    def _canon_key_tuple(self, kt) -> tuple:
        """Canonicalize key values through the store's declared key
        types before digesting — np.int64(7), Python 7 and '7' on an
        int-keyed store must produce the SAME digest, or concurrent
        same-key inserts arriving through different APIs (set_ts attrs
        vs ingest_long collected Rows) would silently miss each other."""
        out = []
        for k, v in zip(self.config.keys, kt):
            declared = self.config.key_types.get(k)
            if declared == "int":
                v = int(v)
            elif declared == "float":
                v = float(v)
            elif declared == "str":
                v = str(v)
            out.append(v)
        return tuple(out)

    def _key_level_detection_ok(self) -> bool:
        """Key-level conflict machinery is sound ONLY when every key
        column has a declared type: without one, canonicalization is a
        no-op and the same logical key arriving through different APIs
        (np.int64 vs int vs str) digests differently — a disjointness
        waiver built on that would silently miss genuine same-key
        conflicts. Undeclared-type stores stay chunk-granular
        conservative."""
        return all(k in self.config.key_types for k in self.config.keys)

    def _key_digests(self, canon_tuples) -> list[str]:
        """THE digest both append_keys and dropped_keys use — the
        conflict check intersects across the two populations, so they
        must stay byte-identical."""
        import hashlib

        return [
            hashlib.md5(repr(kt).encode()).hexdigest()[:16]
            for kt in canon_tuples
        ]

    def _note_append_keys(self, key_tuples) -> None:
        """Record the key digests an append-path insert lands, so the
        commit can conflict with a concurrent insert of the same series
        (extends the KeyExistsError contract to multi-writer ACID
        operation)."""
        if not self._acid or not self._key_level_detection_ok():
            return
        txn = self._active_txn
        kts = list(key_tuples)
        if len(kts) > self.APPEND_KEYS_CAP:
            import warnings

            warnings.warn(
                f"insert of more than APPEND_KEYS_CAP={self.APPEND_KEYS_CAP} "
                "series commits as a BLIND append: concurrent inserts of "
                "the same key will not conflict and can land twice "
                "(Delta-like insert semantics). Batch below the cap or "
                "raise APPEND_KEYS_CAP to keep same-key insert detection.",
                stacklevel=4,
            )
            txn.append_keys = None
            return
        digests = self._key_digests(self._canon_key_tuple(kt) for kt in kts)
        txn.append_keys = sorted(set(txn.append_keys or []) | set(digests))

    def _note_dropped_keys(self, key_tuples) -> None:
        """Record the key digests a rewrite replaces/drops — the commit
        then conflicts with interleaved same-chunk commits ONLY when the
        key sets overlap (or either side is unknown), so concurrent
        writers updating different series of one chunk all land."""
        if not self._acid or not self._key_level_detection_ok():
            return
        txn = self._active_txn
        if txn.dropped_unknown:
            return
        if key_tuples is None:
            txn.dropped_keys = None
            txn.dropped_key_tuples = None
            txn.dropped_unknown = True
            return
        kts = list(key_tuples)
        if len(kts) > self.APPEND_KEYS_CAP:
            txn.dropped_keys = None
            txn.dropped_key_tuples = None
            txn.dropped_unknown = True
            return
        canon = [self._canon_key_tuple(kt) for kt in kts]
        digests = self._key_digests(canon)
        txn.dropped_keys = sorted(set(txn.dropped_keys or []) | set(digests))
        txn.dropped_key_tuples = list(
            {*(txn.dropped_key_tuples or []), *canon}
        )

    def _compact_meta_into_txn(self, txn) -> None:
        """Collapse the meta changelog (base live files + this txn's
        staged adds) to its latest state per (keys…, chunk_index) and
        swap it into the transaction: the commit then carries ONE
        compacted meta file and removes the whole backlog. Tombstone
        rows survive (they ARE latest states), so the change feed and
        watermarks are unchanged — same contract as the plain path's
        ``_maybe_compact_meta``."""
        files = [
            os.path.join(self.path, e["path"])
            for e in [*txn.snapshot.files["meta"], *txn.adds["meta"]]
        ]
        m = self.spark.read.schema(self._meta_schema()).parquet(*files)
        w = Window.partitionBy(*self.config.keys, "chunk_index").orderBy(
            F.desc("op_id")
        )
        latest = (
            m.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        # this txn's own staged files are superseded before ever being
        # committed — drop them from adds (vacuum reclaims the orphans);
        # keep a backup so a compaction-lost commit race can retry the
        # operation without the compaction
        txn.compaction_backup = (txn.adds["meta"], len(txn.removes["meta"]))
        txn.adds["meta"] = []
        self._stage_into_txn(latest, "meta")
        txn.removes["meta"].extend(txn.snapshot.files["meta"])

    def _rewrite_acid(
        self, sdf_new: DataFrame, drop_pred=None, pair_anti: bool = False,
        chunks: list[int] | None = None,
    ) -> None:
        """Copy-on-write MERGE: stage (kept rows of affected files ∪ new
        rows) into fresh files, mark the affected files removed — all
        visibility flips at commit. 'Affected' is decided by manifest
        chunk stats, so an update to one month rewrites that month's
        files, never the table. Conflicts with concurrent commits are
        resolved at commit time (txlog), not by a racy fence."""
        txn = self._active_txn
        if chunks is None:
            chunks = [r[0] for r in sdf_new.select("chunk_index").distinct().collect()]
        chunk_set = {int(c) for c in chunks}
        affected = [
            e
            for e in txn.snapshot.files["data"]
            if e.get("chunk_min") is None
            or any(e["chunk_min"] <= c <= e["chunk_max"] for c in chunk_set)
        ]
        # narrow the copy-on-write by per-file KEY stats: files whose
        # key ranges cannot contain any replaced series hold only
        # bystander rows — leave them live untouched (less IO, and
        # key-disjoint same-chunk writers stop sharing removes, so their
        # commits don't conflict). Every key dimension contributes
        # independently (bounding-box over-approximation, same soundness
        # argument as plans.pruning.entry_may_match_keys): one provably
        # empty dimension rules a file out even when the first key is
        # low-cardinality (e.g. one site, many meters).
        if txn.dropped_key_tuples is not None:
            import bisect

            dims = [
                (k, sorted({kt[i] for kt in txn.dropped_key_tuples}))
                for i, k in enumerate(self.config.keys)
            ]

            def may_contain(e) -> bool:
                ks = e.get("key_stats") or {}
                for k, vals in dims:
                    rng = ks.get(k)
                    if not rng:
                        continue  # no stats for this dim: conservative
                    lo, hi = rng
                    try:
                        i = bisect.bisect_left(vals, lo)
                        if not (i < len(vals) and vals[i] <= hi):
                            return False
                    except TypeError:
                        continue  # incomparable: conservative
                return True

            affected = [e for e in affected if may_contain(e)]
        sdf_new = self._cast_canonical(sdf_new, self._data_schema())
        if affected:
            paths = [os.path.join(self.path, e["path"]) for e in affected]
            existing = self.spark.read.schema(self._data_schema()).parquet(*paths)
            if pair_anti:
                keep = existing.join(
                    sdf_new.select(*self.config.keys, "chunk_index").distinct(),
                    on=[*self.config.keys, "chunk_index"],
                    how="left_anti",
                )
            else:
                # drop pred rows only within the touched chunks — rows an
                # affected file holds for OTHER chunks ride along intact
                keep = existing.filter(
                    ~(drop_pred & F.col("chunk_index").isin(list(chunk_set)))
                )
            combined = keep.select(*[f.name for f in self._data_schema()]).unionByName(
                sdf_new
            )
            txn.removes["data"].extend(affected)
        else:
            combined = sdf_new
        self._stage_into_txn(combined, "data")
        txn.touch(chunk_set)

    # ------------------------------------------------------------------
    # schema helpers
    # ------------------------------------------------------------------
    def _key_schema(self, pdf: pd.DataFrame | None = None) -> list[tuple[str, T.DataType]]:
        mapping = _KEY_TYPE_MAP
        out = []
        probed = None
        for k in self.config.keys:
            declared = self.config.key_types.get(k)
            if declared:
                out.append((k, mapping[declared]))
            elif pdf is not None:
                dt = pdf[k].dtype
                if dt == object:
                    out.append((k, T.StringType()))
                elif str(dt).startswith("int"):
                    out.append((k, T.LongType()))
                else:
                    out.append((k, T.DoubleType()))
            else:
                # no declaration and no sample frame: on ACID stores the
                # WRITTEN type is recoverable from a live file's footer
                # — a string default would misread int/float-keyed
                # stores created without key_types (ADVICE r7)
                if probed is None:
                    probed = self._probed_key_types()
                t = probed.get(k)
                out.append((k, mapping[t] if t else T.StringType()))
        return out

    def _probed_key_types(self) -> dict[str, str]:
        """Footer-probed types of undeclared key columns (ACID only).
        A complete answer is cached forever; an INCOMPLETE one (empty
        store, or a key no footer proves) is cached per manifest version
        so repeated schema derivations don't repeat the O(live-files)
        footer scan — only a new commit (which may add the proving file)
        re-probes."""
        if not self._acid:
            return {}
        if self._key_type_probe is not None:
            return self._key_type_probe
        undeclared = [
            k for k in self.config.keys if not self.config.key_types.get(k)
        ]
        ver = self._txlog.snapshot().version
        part = self._key_type_probe_partial
        if part is not None and part[0] == ver:
            return part[1]
        probe = probe_key_types_from_manifest(
            self.path, undeclared, txlog=self._txlog
        )
        if all(k in probe for k in undeclared):
            self._key_type_probe = probe
        else:
            self._key_type_probe_partial = (ver, probe)
        return probe

    def _data_schema(self, pdf=None) -> T.StructType:
        fields = [T.StructField(k, t) for k, t in self._key_schema(pdf)]
        fields += [
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("chunk_index", T.IntegerType()),
        ]
        return T.StructType(fields)

    def _meta_schema(self, pdf=None) -> T.StructType:
        fields = [T.StructField(k, t) for k, t in self._key_schema(pdf)]
        fields += [T.StructField(n, t) for n, t in _META_EXTRA]
        return T.StructType(fields)

    # ------------------------------------------------------------------
    # table access
    # ------------------------------------------------------------------
    def _exists(self) -> bool:
        return os.path.exists(self._meta_path)

    def data(self, chunk_lo: int | None = None, chunk_hi: int | None = None,
             key_values: dict[str, list] | None = None) -> DataFrame:
        """Physical data rows. In ACID mode the live file set comes from
        the manifest and ``chunk_lo``/``chunk_hi`` apply MANIFEST-STATS
        FILE SKIPPING — only files whose per-file chunk range overlaps
        the bound are opened (the Delta-style replacement for hive
        partition pruning; chunk_index is a regular column there).
        ``key_values`` (per-key candidate sets, see
        plans.pruning.key_equality_values) extends the skipping to the
        KEY columns via the manifest's per-file key min/max: a point
        lookup then opens only the files whose key range can hold the
        requested series — at large file counts this is the difference
        between listing a month and listing one file. Plain mode ignores
        the bounds: the hive ``chunk_index=`` partitioning prunes at
        planning time instead."""
        if self._acid:
            from holcstore_spark.plans.pruning import entry_may_match_keys

            snap = self._snapshot()
            entries = snap.entries_overlapping("data", chunk_lo, chunk_hi)
            if key_values:
                entries = [
                    e for e in entries if entry_may_match_keys(e, key_values)
                ]
            if not entries:
                return self.spark.createDataFrame([], self._data_schema())
            files = [os.path.join(self.path, e["path"]) for e in entries]
            return self.spark.read.schema(self._data_schema()).parquet(*files)
        # emptied-by-rewrite tables keep their directory with no parquet
        # footers — read them as the empty frame instead of failing inference
        if not has_parquet(self._data_path):
            return self.spark.createDataFrame([], self._data_schema())
        return self.spark.read.parquet(self._data_path)

    def meta(self) -> DataFrame:
        if self._acid:
            files = self._snapshot().paths("meta", self.path)
            if not files:
                return self.spark.createDataFrame([], self._meta_schema())
            return self.spark.read.schema(self._meta_schema()).parquet(*files)
        if not has_parquet(self._meta_path):
            return self.spark.createDataFrame([], self._meta_schema())
        return self.spark.read.parquet(self._meta_path)

    def _meta_empty(self) -> bool:
        if self._acid:
            return not self._snapshot().files["meta"]
        return not has_parquet(self._meta_path)

    def latest_meta(self, filters: dict | None = None) -> DataFrame:
        """Latest state per (keys…, chunk_index): tombstone flag + watermark.

        The collapsed state is metadata-sized (keys × chunks), so it is
        cached per store instance and invalidated on every write — repeated
        keyed reads then filter the cached frame instead of re-windowing
        the log (the reference's CACHED_INDEX_SIZE analogue,
        chunk_timeserie_store.py:199). Cross-process writers are not seen
        until a new store instance is opened (same caveat as the reference's
        per-class cache)."""
        if self._meta_cache is None:
            w = Window.partitionBy(*self.config.keys, "chunk_index").orderBy(
                F.desc("op_id")
            )
            self._meta_cache = (
                self.meta()
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
                .cache()
            )
            if self._acid:
                # tag the cache with the manifest version it was built
                # from — write transactions compare against their base
                # snapshot and refuse to validate against a stale cache
                self._meta_cache_version = self._snapshot().version
        return self._meta_cache.filter(attrs_filter(filters))

    def _invalidate_meta_cache(self) -> None:
        if self._meta_cache is not None:
            self._meta_cache.unpersist()
            self._meta_cache = None
        self._has_tombstones = None

    def refresh(self) -> None:
        """Drop the per-instance ``latest_meta`` cache so the next read
        observes writes committed by OTHER processes/store instances.

        The cache is invalidated automatically on this instance's own
        writes; cross-process writers are invisible until ``refresh()``
        or a new instance (same caveat as the reference's per-class
        cache, chunk_timeserie_store.py:199 — this is its explicit
        escape hatch)."""
        self._invalidate_meta_cache()

    def _any_tombstones(self) -> bool:
        """Whether any tombstone row exists in the meta log — a DRIVER-side
        pyarrow scan of the metadata-sized log's ``is_deleted`` column
        (row-group stats skip clean files), remembered until the next
        write. The common store has none, and every keyed read can then
        skip its tombstone semi-join entirely.

        r17 (§5 — the driver gate was a whole Spark job): this replaces a
        ``latest_meta().filter(is_deleted).limit(1).count()`` job — 1.6 to
        3.5 s of fixed latency paid once per store instance, i.e. once per
        bench run on the fresh-store queries. The pyarrow answer is a
        sound OVER-approximation of the old latest-state answer: a
        deleted-then-rewritten chunk keeps the gate True, which merely
        re-enables the alive-chunks semi-join — the join itself is the
        exact mechanism, so results are identical either way; a False is
        exact (no tombstone row at all ⇒ no deleted latest state)."""
        if self._has_tombstones is None:
            import pyarrow.dataset as pads

            if self._acid:
                files = self._snapshot().paths("meta", self.path)
                ds = pads.dataset(files) if files else None
            else:
                ds = (
                    pads.dataset(self._meta_path)
                    if has_parquet(self._meta_path) else None
                )
            if ds is None:
                self._has_tombstones = False
            else:
                tbl = ds.to_table(
                    columns=["is_deleted"],
                    filter=pads.field("is_deleted") == True,  # noqa: E712
                )
                self._has_tombstones = tbl.num_rows > 0
        return self._has_tombstones

    def alive_chunks(self, filters: dict | None = None) -> DataFrame:
        return self.latest_meta(filters).filter(~F.col("is_deleted"))

    def alive_data(
        self,
        filters: dict | None = None,
        start=None,
        end=None,
    ) -> DataFrame:
        """Data rows of non-tombstoned chunks, partition-pruned by bounds.

        The tombstone check is a broadcast semi-join against the (filtered,
        tiny) latest-meta — physical data of deleted chunks lingers until
        :meth:`compact` but is never visible.
        """
        tz, axis = self.config.tz, self.config.chunk_axis
        s = normalize_bound(start, tz)
        e = normalize_bound(end, tz)
        if self._acid:
            from holcstore_spark.functions.scalar import chunk_index_of
            from holcstore_spark.plans.pruning import key_equality_values

            lo = chunk_index_of(s, axis, tz) if s is not None else None
            hi = chunk_index_of(e, axis, tz) if e is not None else None
            d = self.data(chunk_lo=lo, chunk_hi=hi,
                          key_values=key_equality_values(filters))
        else:
            d = self.data()
        d = d.filter(attrs_filter(filters))
        d = d.filter(chunk_bounds_filter(s, e, axis, tz))
        # tombstone-free NON-SYNC store (the common case): physical rows ARE
        # the alive rows — skip building/broadcasting the semi-join side.
        # Sync replicas keep the join unconditionally: it also hides data
        # landed by a mid-import crash until the next pull re-imports it.
        if self.config.allow_sync or self._any_tombstones():
            alive = self.alive_chunks(filters).select(*self.config.keys, "chunk_index")
            d = d.join(
                F.broadcast(alive), on=[*self.config.keys, "chunk_index"], how="left_semi"
            )
        return time_slice(d, s, e)

    # ------------------------------------------------------------------
    # validation
    # ------------------------------------------------------------------
    def _ensure_all_attrs(self, attrs: dict) -> None:
        missing = set(self.config.keys) - set(attrs)
        extra = set(attrs) - set(self.config.keys)
        if missing or extra:
            raise ValueError(
                f"attrs must specify exactly the store keys {list(self.config.keys)}; "
                f"missing={sorted(missing)} unknown={sorted(extra)}"
            )

    def _now_stamp(self) -> tuple[datetime, int]:
        """(updated_at, op_id) for meta rows. Inside an ACID transaction
        the op_id is the txn's Lamport stamp (derived from the base
        snapshot's max observed op_id) so that the commit record and
        every meta row it stages carry ONE stamp that orders causally
        across skewed writer clocks; outside a txn (plain layout,
        single-writer contract) raw wall-clock nanoseconds."""
        import threading

        now = datetime.now(timezone.utc)
        txn = self._active_txn
        if txn is not None and self._txn_owner == threading.get_ident():
            return now, txn.op_id
        return now, time.time_ns()

    # ------------------------------------------------------------------
    # normalization (driver-side, one series)
    # ------------------------------------------------------------------
    def _chunk_start_local(self, ts: pd.Timestamp) -> pd.Timestamp:
        local = ts.tz_convert(self.config.tz)
        if self.config.chunk_axis == ("year",):
            return pd.Timestamp(year=local.year, month=1, day=1, tz=self.config.tz)
        return pd.Timestamp(year=local.year, month=local.month, day=1, tz=self.config.tz)

    def _next_chunk_start_local(self, ts: pd.Timestamp) -> pd.Timestamp:
        local = ts.tz_convert(self.config.tz)
        if self.config.chunk_axis == ("year",):
            return pd.Timestamp(year=local.year + 1, month=1, day=1, tz=self.config.tz)
        y, m = (local.year + 1, 1) if local.month == 12 else (local.year, local.month + 1)
        return pd.Timestamp(year=y, month=m, day=1, tz=self.config.tz)

    def _normalize_to_grid(self, serie: pd.Series) -> pd.Series:
        """tz-normalize + dense chunk-aligned reindex
        (reference: chunk_timeserie_store.py:699-743). Off-grid input labels
        drop out (the store reindexes, never resamples, README.md:196)."""
        s = normalize_series(serie, self.config.tz)
        lo = self._chunk_start_local(s.index.min()).tz_convert("UTC")
        hi = self._next_chunk_start_local(s.index.max()).tz_convert("UTC")
        grid = pd.date_range(lo, hi, freq=self.config.freq_timedelta, tz="UTC",
                             inclusive="left")
        return s.reindex(grid)

    def _chunk_index_pd(self, idx: pd.DatetimeIndex) -> pd.Index:
        local = idx.tz_convert(self.config.tz)
        if self.config.chunk_axis == ("year",):
            return pd.Index(local.year, dtype="int32")
        return pd.Index(local.year * 12 + local.month - 1, dtype="int32")

    def _pdf_to_sdf(self, pdf: pd.DataFrame) -> DataFrame:
        schema = self._data_schema(pdf)
        # createDataFrame(pandas, schema) matches positionally: reorder the
        # frame to schema field order so attrs={'b':..,'a':..} cannot write
        # swapped key values on a keys=('a','b') store
        pdf = pdf[[f.name for f in schema.fields]]
        sdf = self.spark.createDataFrame(pdf, schema=schema)
        return nan_to_null(sdf, "value")

    def _series_to_sdf(self, attrs: dict, serie: pd.Series) -> DataFrame:
        pdf = series_to_long(serie, attrs)
        pdf["chunk_index"] = self._chunk_index_pd(
            pd.DatetimeIndex(pdf["ts"])
        ).to_numpy()
        return self._pdf_to_sdf(pdf)

    # ------------------------------------------------------------------
    # write paths
    # ------------------------------------------------------------------
    def _cast_canonical(self, sdf: DataFrame, schema: T.StructType) -> DataFrame:
        """Coerce a frame to the store's canonical column types and order.
        Caller-supplied bulk frames may carry narrower dtypes (e.g. int32
        keys vs the declared LongType); parquet refuses mixed physical
        types across files of one table, so every write funnels through
        this cast."""
        return sdf.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
        )

    def _overlap_staged_writes(self, big, small) -> None:
        """Run the large data-staging job and the small meta-staging job
        CONCURRENTLY (guide §2.6: independent jobs submitted from a
        driver thread back-fill each other's stragglers — the meta job's
        tasks run on cores the data write's task tail leaves idle, and
        the meta frame's driver-side plan construction overlaps the data
        job instead of serially following it).

        ACID-ONLY by contract: staged files are invisible until the
        transaction commits, so ordering between the two stagings is
        immaterial — a failure of either aborts the txn and the staged
        orphans are vacuum-collected. The non-ACID append path must KEEP
        its serial data-before-meta order: a crash between the two must
        leave an invisible data orphan, never phantom meta rows pointing
        at missing data. Callers guard on ``self._acid``.

        ``small`` runs in the pool thread (plan construction included);
        ``big`` runs on the caller thread. If both fail, ``big``'s error
        propagates (the txn aborts either way)."""
        from concurrent.futures import ThreadPoolExecutor

        from pyspark import inheritable_thread_target

        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(
                inheritable_thread_target(self.spark)(small)
            )
            big()
            fut.result()

    def _append_data(self, sdf: DataFrame) -> None:
        if self._acid:
            self._stage_into_txn(sdf, "data")
            return
        # every data write sorts within tasks by (keys, ts): parquet
        # row-group min/max stats on the key columns then become tight, so
        # a keyed read skips other series' row groups inside the partition
        # (the property that replaces the reference's (keys, chunk) b-tree)
        (
            self._cast_canonical(sdf, self._data_schema())
            .repartition("chunk_index", *self.config.keys)
            .sortWithinPartitions(*self.config.keys, "ts")
            .write.mode("append")
            .partitionBy("chunk_index")
            .parquet(self._data_path)
        )

    def _max_committed_op_id(self) -> int:
        """Latest committed op_id from the meta log — a pyarrow
        single-column read of a metadata-sized table, no Spark job."""
        import pyarrow.dataset as pads

        if not has_parquet(self._meta_path):
            return -1
        col = pads.dataset(self._meta_path).to_table(columns=["op_id"])
        return int(col["op_id"].to_pandas().max()) if col.num_rows else -1

    def _rewrite_partitions(self, sdf_new: DataFrame, drop_pred, chunks=None) -> None:
        """Replace the partitions present in ``sdf_new``: keep other rows of
        those partitions, drop rows matching ``drop_pred``, union the new
        rows, dynamic-partition-overwrite. (With Delta this is one MERGE.)

        SINGLE-WRITER contract: the checkpoint-then-overwrite below is not
        transactional, so concurrent writers to the same store must be
        serialized externally. An optimistic op_id fence detects a writer
        that committed while our keep-set was being materialized and
        raises :class:`ConcurrentWriteError` before the overwrite can drop
        that writer's rows (see README §operational-constraints).

        ACID mode replaces all of this with a copy-on-write merge +
        atomic commit (:meth:`_rewrite_acid`) — no fence, no checkpoint,
        and concurrent disjoint writers both survive."""
        if self._acid:
            self._rewrite_acid(sdf_new, drop_pred=drop_pred, chunks=chunks)
            return
        fence_op_id = self._max_committed_op_id()
        if chunks is None:
            chunks = [r[0] for r in sdf_new.select("chunk_index").distinct().collect()]
        existing = self.data().filter(F.col("chunk_index").isin(chunks))
        keep = existing.filter(~drop_pred).select(*[f.name for f in self._data_schema()])
        combined = keep.unionByName(self._cast_canonical(sdf_new, self._data_schema()))
        # materialize before overwriting the files the plan reads from
        combined = safe_local_checkpoint(combined)
        latest = self._max_committed_op_id()
        if latest != fence_op_id:
            raise ConcurrentWriteError(
                f"meta op_id advanced {fence_op_id} -> {latest} during "
                f"rewrite of chunks {chunks}; aborting before the overwrite "
                f"could drop the concurrent writer's rows"
            )
        (
            combined.repartition("chunk_index", *self.config.keys)
            .sortWithinPartitions(*self.config.keys, "ts")
            .write.mode("overwrite")
            .partitionBy("chunk_index")
            .parquet(self._data_path)
        )

    #: meta-log files above which _append_meta self-compacts. Every write
    #: appends one file and every read windows the whole log, so an
    #: unbounded log would make the 10^5-th write pay a 10^5-file scan.
    META_COMPACT_THRESHOLD = 64

    def _append_meta(self, rows: list[dict], pdf_like: pd.DataFrame | None = None) -> None:
        schema = self._meta_schema(pdf_like)
        # createDataFrame(pandas, schema) matches positionally — align order
        pdf = pd.DataFrame(rows)[[f.name for f in schema.fields]]
        sdf = self.spark.createDataFrame(pdf, schema=schema)
        if self._acid:
            self._stage_into_txn(sdf, "meta")
            return
        sdf.coalesce(1).write.mode("append").parquet(self._meta_path)
        self._invalidate_meta_cache()
        self._maybe_compact_meta()

    def _meta_file_count(self) -> int:
        try:
            return sum(
                1 for f in os.listdir(self._meta_path) if f.endswith(".parquet")
            )
        except FileNotFoundError:
            return 0

    def _maybe_compact_meta(self) -> None:
        """Collapse the meta changelog to its latest state once the log
        grows past META_COMPACT_THRESHOLD files (log checkpoint; tombstone
        rows survive so the change feed and watermarks stay correct)."""
        if self._meta_file_count() <= self.META_COMPACT_THRESHOLD:
            return
        latest = safe_local_checkpoint(self.latest_meta())
        latest.coalesce(1).write.mode("overwrite").parquet(self._meta_path)
        self._invalidate_meta_cache()

    _META_COLS = property(
        lambda self: [*self.config.keys, "chunk_index", "start_ts", "n_points",
                      "updated_at", "op_id", "is_deleted"]
    )

    def _meta_sdf_for(
        self, sdf: DataFrame, updated_at: datetime, op_id: int
    ) -> DataFrame:
        """Distributed meta rows for a data frame: one aggregate, never a
        driver collect — a 10M-key ingest produces its changelog rows with
        the same parallelism as the data write (reference analogue:
        bulk_create batching, chunk_timeserie_store.py:815-824)."""
        return (
            sdf.groupBy(*self.config.keys, "chunk_index")
            .agg(F.min("ts").alias("start_ts"), F.count("ts").alias("n_points"))
            .withColumn("updated_at", F.lit(updated_at))
            .withColumn("op_id", F.lit(op_id).cast("long"))
            .withColumn("is_deleted", F.lit(False))
            .select(*self._META_COLS)
        )

    def _meta_sdf_from_bounds(
        self, bounds: DataFrame, updated_at: datetime, op_id: int
    ) -> DataFrame:
        """Insert-mode twin of :meth:`_meta_sdf_for` that derives the meta
        rows ARITHMETICALLY from the per-key ``chunk_aligned_bounds`` frame
        instead of re-aggregating the dense grid.

        The dense grid is ``sequence(grid_start, grid_end, freq)`` per key,
        so each chunk's point count and first point follow from pure unix
        arithmetic on the chunk boundaries — O(keys × chunks) rows computed
        from a metadata-sized frame, never a second pass over the data.
        (At 100 TB the meta aggregate was a full extra scan of the ingested
        grid; this removes it.) Exactness holds for any freq, including
        freqs that don't divide the chunk length and DST-shifted chunks:
        grid point k sits at ``grid_start + k*freq``; chunk ``ci`` owns
        ``k ∈ [ceil((cs-lo)/f), min(ceil((ce-lo)/f), floor((hi-lo)/f)+1))``
        where cs/ce are the chunk's UTC bounds and hi the inclusive grid
        end. Verified identical to the grid aggregate by
        tests/test_chunk_store.py (odd-freq + DST matrix)."""
        unit = "year" if self.config.chunk_axis == ("year",) else "month"
        tz = self.config.tz
        f = int(self.config.freq_seconds)
        lo_l = F.from_utc_timestamp("grid_start", tz)
        hi_l = F.from_utc_timestamp("grid_end", tz)
        if unit == "year":
            ci_lo, ci_hi = F.year(lo_l), F.year(hi_l)
        else:
            ci_lo = F.year(lo_l) * 12 + F.month(lo_l) - 1
            ci_hi = F.year(hi_l) * 12 + F.month(hi_l) - 1
        b = bounds.withColumn(
            "chunk_index", F.explode(F.sequence(ci_lo, ci_hi))
        ).withColumn("chunk_index", F.col("chunk_index").cast("int"))

        def chunk_start_utc(ci):
            if unit == "year":
                y, m = ci, F.lit(1)
            else:
                y, m = F.floor(ci / 12).cast("int"), (ci % 12 + 1).cast("int")
            local = F.to_timestamp(F.make_date(y, m, F.lit(1)))
            return F.to_utc_timestamp(local, tz)

        ci = F.col("chunk_index")
        lo = F.unix_timestamp("grid_start")
        hi = F.unix_timestamp("grid_end")
        cs = F.unix_timestamp(chunk_start_utc(ci))
        ce = F.unix_timestamp(chunk_start_utc(ci + 1))
        k0 = F.floor((cs - lo + f - 1) / f).cast("long")
        k1 = F.least(
            F.floor((ce - lo + f - 1) / f).cast("long"),
            (F.floor((hi - lo) / f) + 1).cast("long"),
        )
        return (
            b.select(
                *self.config.keys,
                "chunk_index",
                F.timestamp_seconds(lo + k0 * f).alias("start_ts"),
                (k1 - k0).alias("n_points"),
            )
            .filter(F.col("n_points") > 0)
            .withColumn("updated_at", F.lit(updated_at))
            .withColumn("op_id", F.lit(op_id).cast("long"))
            .withColumn("is_deleted", F.lit(False))
            .select(*self._META_COLS)
        )

    def _tombstone_sdf(
        self, chunk_keys: DataFrame, updated_at: datetime, op_id: int
    ) -> DataFrame:
        """Distributed tombstone rows for a (keys…, chunk_index) frame."""
        return (
            chunk_keys.select(*self.config.keys, "chunk_index")
            .withColumn("start_ts", F.lit(None).cast("timestamp"))
            .withColumn("n_points", F.lit(0).cast("long"))
            .withColumn("updated_at", F.lit(updated_at))
            .withColumn("op_id", F.lit(op_id).cast("long"))
            .withColumn("is_deleted", F.lit(True))
            .select(*self._META_COLS)
        )

    def _append_meta_sdf(self, meta_sdf: DataFrame) -> None:
        """Append a Spark-built meta frame. AQE coalesces the (metadata-
        sized) aggregate to few files; the log self-compacts past the
        threshold like the driver path."""
        if self._acid:
            self._stage_into_txn(meta_sdf, "meta")
            return
        self._cast_canonical(meta_sdf, self._meta_schema()).write.mode(
            "append"
        ).parquet(self._meta_path)
        self._invalidate_meta_cache()
        self._maybe_compact_meta()

    def _meta_rows_single_series(
        self, sdf: DataFrame, updated_at: datetime, op_id: int
    ) -> list[dict]:
        """Driver-side meta rows — ONLY for single-series writes, where the
        result is bounded by that series' chunk count (a few dozen rows).
        Bulk paths use :meth:`_meta_sdf_for` (distributed, no collect)."""
        agg = (
            sdf.groupBy(*self.config.keys, "chunk_index")
            .agg(F.min("ts").alias("start_ts"), F.count("ts").alias("n_points"))
            .collect()
        )
        return [
            {
                **{k: r[k] for k in self.config.keys},
                "chunk_index": r["chunk_index"],
                "start_ts": r["start_ts"],
                "n_points": r["n_points"],
                "updated_at": updated_at,
                "op_id": op_id,
                "is_deleted": False,
            }
            for r in agg
        ]

    def _meta_rows_pandas(
        self, pdf: pd.DataFrame, attrs: dict, updated_at: datetime, op_id: int
    ) -> list[dict]:
        """Driver-side twin of _meta_rows_single_series when the long frame is already
        pandas (single-series writes) — zero extra Spark jobs."""
        agg = pdf.groupby("chunk_index")["ts"].agg(["min", "count"])
        return [
            {
                **attrs,
                "chunk_index": int(ci),
                "start_ts": row["min"].to_pydatetime(),
                "n_points": int(row["count"]),
                "updated_at": updated_at,
                "op_id": op_id,
                "is_deleted": False,
            }
            for ci, row in agg.iterrows()
        ]

    def _key_pred(self, attrs: dict):
        return attrs_filter(attrs)

    def _physical_chunks(self, attrs: dict) -> set[int]:
        """chunk_index values with any physical rows or meta entry for key."""
        m = {r[0] for r in self.meta().filter(attrs_filter(attrs))
             .select("chunk_index").distinct().collect()}
        return m

    # -- public write API ----------------------------------------------
    @_transactional("set_ts")
    def set_ts(
        self,
        attrs: dict,
        serie: pd.Series,
        update: bool = False,
        replace: bool = False,
    ) -> None:
        """Write one series (reference set_ts, chunk_timeserie_store.py:309-373)."""
        if update and replace:
            raise ValueError("update and replace are mutually exclusive")
        if self.config.allow_sync and not (update or replace):
            raise SyncGuardError(
                "plain set_ts is forbidden on a sync-enabled store; use update/replace"
            )
        self._ensure_all_attrs(attrs)
        dense = self._normalize_to_grid(serie)
        pdf = series_to_long(dense, attrs)
        pdf["chunk_index"] = self._chunk_index_pd(
            pd.DatetimeIndex(pdf["ts"])
        ).to_numpy()
        new_chunks = set(int(c) for c in pdf["chunk_index"].unique())
        sdf = self._pdf_to_sdf(pdf)

        # ONE meta collect yields both the alive and the physical chunk sets
        meta_rows_now = self.latest_meta(attrs).select(
            "chunk_index", "is_deleted"
        ).collect()
        alive = {r["chunk_index"] for r in meta_rows_now if not r["is_deleted"]}
        physical = {r["chunk_index"] for r in meta_rows_now}
        updated_at, op_id = self._now_stamp()

        if not update and not replace:
            if alive:
                raise KeyExistsError(
                    f"series {attrs} already exists; pass update=True or replace=True"
                )

        merged_spark_side = False
        if update:
            overlap = sorted(new_chunks & alive)
            if overlap:
                existing = self.alive_data(attrs).filter(
                    F.col("chunk_index").isin(overlap)
                )
                merged = combine_first(
                    [sdf.filter(F.col("chunk_index").isin(overlap)), existing],
                    keys=self.config.keys,
                )
                merged = merged.withColumn(
                    "chunk_index",
                    chunk_index_col("ts", self.config.chunk_axis, self.config.tz),
                )
                sdf = merged.unionByName(
                    sdf.filter(~F.col("chunk_index").isin(overlap))
                    .select(*self.config.keys, "ts", "value", "chunk_index")
                )
                merged_spark_side = True

        # a merge never moves rows outside the input's chunk span, so the
        # written chunk set is known driver-side — no Spark distinct jobs
        stale = sorted(alive - new_chunks) if replace else []

        touched_physical = physical & new_chunks
        if merged_spark_side or touched_physical:
            # cut lineage: sdf may read the very files the rewrite replaces,
            # and the meta aggregation below runs after the rewrite
            sdf = safe_local_checkpoint(sdf)
        if touched_physical:
            self._note_dropped_keys([tuple(attrs[k] for k in self.config.keys)])
            self._rewrite_partitions(sdf, self._key_pred(attrs), chunks=sorted(new_chunks))
        else:
            if not update and not replace:
                # plain INSERT only: update/replace taking the append
                # path (key exists but these chunks are new) must keep
                # the appends-never-conflict property — two concurrent
                # chunk-disjoint updates of one key both land
                self._note_append_keys([tuple(attrs[k] for k in self.config.keys)])
            self._append_data(sdf)

        if merged_spark_side:
            meta_rows = self._meta_rows_single_series(sdf, updated_at, op_id)
        else:
            meta_rows = self._meta_rows_pandas(pdf, attrs, updated_at, op_id)
        for c in stale:
            meta_rows.append(
                {
                    **attrs,
                    "chunk_index": c,
                    "start_ts": None,
                    "n_points": 0,
                    "updated_at": updated_at,
                    "op_id": op_id,
                    "is_deleted": True,
                }
            )
        self._append_meta(meta_rows)

    @_transactional("set_many_ts")
    def set_many_ts(self, mapping: dict[tuple, pd.Series],
                    keys: tuple[str, ...] | None = None,
                    txn_app: str | None = None,
                    txn_version: int | None = None) -> None:
        """Mass insert, error if any key already exists
        (reference: chunk_timeserie_store.py:418-455).

        ACID concurrency note: same blind-append trade as
        :meth:`ingest_long` — inserts above ``APPEND_KEYS_CAP`` distinct
        series skip per-key conflict digests (warned), so concurrent
        same-key mega-inserts can land twice.

        ``(txn_app, txn_version)`` — idempotent write (see
        :meth:`ingest_long`): a retried batch job re-running the same
        mass insert is a no-op instead of raising KeyExistsError."""
        from holcstore_spark.sources.txlog import resolve_txn

        # argument guards BEFORE the replay skip: the watermark proves
        # some write with this identity landed, not that THIS call's
        # arguments are valid — a replay of a forbidden/malformed call
        # must still raise, never silently "succeed" (review r10)
        if self.config.allow_sync:
            raise SyncGuardError("set_many_ts is forbidden on a sync-enabled store")
        keys = tuple(keys or self.config.keys)
        if keys != self.config.keys:
            raise ValueError(f"keys must be {self.config.keys}")
        txn_id = resolve_txn(self._acid, txn_app, txn_version)
        if txn_id is not None:
            txn = self._active_txn
            if txn_id[1] <= txn.snapshot.app_versions.get(txn_id[0], -1):
                return  # this (app, version) is already durable — replay
            txn.txn_app, txn.txn_version = txn_id
        frames = []
        for key_tuple, serie in mapping.items():
            attrs = dict(zip(keys, key_tuple if isinstance(key_tuple, tuple) else (key_tuple,)))
            self._ensure_all_attrs(attrs)
            dense = self._normalize_to_grid(serie)
            pdf = series_to_long(dense, attrs)
            pdf["chunk_index"] = self._chunk_index_pd(pd.DatetimeIndex(pdf["ts"])).to_numpy()
            frames.append(pdf)
        if not frames:
            return
        pdf_all = pd.concat(frames, ignore_index=True)
        schema = self._data_schema(pdf_all)
        pdf_all = pdf_all[[f.name for f in schema.fields]]
        sdf = nan_to_null(self.spark.createDataFrame(pdf_all, schema=schema), "value")
        # ONE existence check for the whole batch (left-semi against the
        # incoming key set), not a Spark job per key
        clash = (
            self.alive_chunks()
            .join(sdf.select(*keys).distinct(), on=list(keys), how="left_semi")
            .limit(1)
            .count()
        )
        if clash:
            raise KeyExistsError("set_many_ts: some keys already exist")
        updated_at, op_id = self._now_stamp()
        physical_any = bool(
            self.meta()
            .join(
                sdf.select(*self.config.keys, "chunk_index").distinct(),
                on=[*self.config.keys, "chunk_index"],
                how="left_semi",
            )
            .limit(1)
            .count()
        )
        def _stage_meta_sm() -> None:
            # aggregates the driver-built (ExistingRDD) frame — never
            # the files the data write touches, so it can overlap (§2.6)
            self._append_meta_sdf(self._meta_sdf_for(sdf, updated_at, op_id))

        if physical_any:
            self._note_dropped_keys(
                kt if isinstance(kt, tuple) else (kt,) for kt in mapping
            )
            if self._acid:
                self._overlap_staged_writes(
                    lambda: self._rewrite_partitions_multi(sdf), _stage_meta_sm
                )
            else:
                self._rewrite_partitions_multi(sdf)
                _stage_meta_sm()
        else:
            self._note_append_keys(
                kt if isinstance(kt, tuple) else (kt,) for kt in mapping
            )
            if self._acid:
                self._overlap_staged_writes(
                    lambda: self._append_data(sdf), _stage_meta_sm
                )
            else:
                self._append_data(sdf)
                _stage_meta_sm()

    def _rewrite_partitions_multi(self, sdf_new: DataFrame) -> None:
        """Partition rewrite where the dropped rows are every (key-tuple,
        chunk_index) *pair* present in the new frame. Anti-joining on keys
        alone would erase a key's rows in every touched partition even for
        chunks the new frame doesn't cover for that key (silent data loss
        when a batch mixes keys across chunks).

        Same SINGLE-WRITER contract and optimistic op_id fence as
        :meth:`_rewrite_partitions` (ACID mode: copy-on-write commit
        instead, see :meth:`_rewrite_acid`)."""
        if self._acid:
            self._rewrite_acid(sdf_new, pair_anti=True)
            return
        fence_op_id = self._max_committed_op_id()
        cols = [f.name for f in self._data_schema()]
        chunks = [r[0] for r in sdf_new.select("chunk_index").distinct().collect()]
        existing = self.data().filter(F.col("chunk_index").isin(chunks))
        sdf_new = self._cast_canonical(sdf_new, self._data_schema())
        keep = existing.join(
            sdf_new.select(*self.config.keys, "chunk_index").distinct(),
            on=[*self.config.keys, "chunk_index"],
            how="left_anti",
        ).select(*cols)
        combined = safe_local_checkpoint(keep.unionByName(sdf_new.select(*cols)))
        latest = self._max_committed_op_id()
        if latest != fence_op_id:
            raise ConcurrentWriteError(
                f"meta op_id advanced {fence_op_id} -> {latest} during "
                f"rewrite of chunks {chunks}; aborting before the overwrite "
                f"could drop the concurrent writer's rows"
            )
        (
            combined.repartition("chunk_index", *self.config.keys)
            .sortWithinPartitions(*self.config.keys, "ts")
            .write.mode("overwrite")
            .partitionBy("chunk_index")
            .parquet(self._data_path)
        )

    @_transactional("ingest_long")
    def ingest_long(
        self,
        sdf: DataFrame,
        mode: str = "insert",
        txn_app: str | None = None,
        txn_version: int | None = None,
    ) -> None:
        """Distributed bulk write — the 100 TB path.

        ``sdf``: long frame ``(keys…, ts, value)`` (UTC instants). The dense
        chunk-aligned grid, chunk indexes and write semantics are computed
        entirely in Spark; no driver-side series loop.

        mode: 'insert' (error on existing keys) | 'update' (new wins,
        existing fills holes) | 'replace' (span overwrite + tombstones).

        ACID concurrency note: inserts of up to ``APPEND_KEYS_CAP``
        (10,000) distinct series record per-key digests so a concurrent
        insert of the SAME series conflicts loudly. LARGER inserts
        commit as blind appends — two concurrent same-key mega-inserts
        both land (Delta's documented insert semantics); a warning is
        emitted when an insert crosses the cap. Batch below the cap, or
        raise ``APPEND_KEYS_CAP``, when same-key insert detection
        matters more than driver memory.

        ``(txn_app, txn_version)`` — idempotent write (Delta's ``txn``
        action, requires ``acid=True``): a call whose version is at or
        below the app's committed watermark returns WITHOUT writing, and
        the commit protocol refuses a racing duplicate mid-flight — in
        EVERY mode: the pre-check runs before the write regardless of
        mode, and the rebase walk raises ``TxnAlreadyApplied`` ahead of
        conflict checks on append and rewrite commits alike. With
        ``txn_app=<sink id>, txn_version=<micro-batch id>`` a
        ``foreachBatch`` sink is exactly-once across driver
        crash-replays in 'insert', 'update', AND 'replace' mode — a
        replayed update/replace batch lands zero commits (skipped whole,
        even when a checkpoint-loss restart folded different content
        into the replayed batch id), not an idempotent-in-effect
        re-merge.
        """
        from holcstore_spark.sources.txlog import resolve_txn

        # argument guards BEFORE the replay skip (see set_many_ts)
        if self.config.allow_sync and mode == "insert":
            raise SyncGuardError("plain ingest is forbidden on a sync-enabled store")
        txn_id = resolve_txn(self._acid, txn_app, txn_version)
        if txn_id is not None:
            txn = self._active_txn
            if txn_id[1] <= txn.snapshot.app_versions.get(txn_id[0], -1):
                return  # this (app, version) is already durable — replay
            txn.txn_app, txn.txn_version = txn_id
        keys = self.config.keys
        # The per-key bounds frame is tiny (one row per key) — materialize it
        # once and derive BOTH the dense grid and the key set from it, so the
        # source is scanned exactly twice (bounds agg + grid join), never a
        # third time for the existence check. Callers whose source is
        # expensive to recompute (a heavy upstream pipeline) should persist
        # it themselves; a blanket persist measured slower than one recompute.
        bounds = safe_local_checkpoint(
            chunk_aligned_bounds(
                sdf, keys, self.config.chunk_axis, self.config.tz,
                self.config.freq_seconds,
            )
        )
        dense = reindex_to_chunk_grid(
            sdf, keys, self.config.chunk_axis, self.config.tz,
            self.config.freq_seconds, bounds=bounds,
        )
        dense = dense.withColumn(
            "chunk_index", chunk_index_col("ts", self.config.chunk_axis, self.config.tz)
        )
        updated_at, op_id = self._now_stamp()
        new_keys = bounds.select(*keys)
        if self._meta_empty():
            # empty store: nothing can pre-exist — skip the meta join
            existing_alive, n_existing = None, 0
        else:
            existing_alive = self.alive_chunks().join(
                new_keys, on=list(keys), how="left_semi"
            )
            n_existing = existing_alive.limit(1).count()

        if mode == "insert":
            if n_existing:
                raise KeyExistsError("ingest_long(insert): some keys already exist")
            # pure append, SINGLE data pass: no files are overwritten so no
            # lineage cut is needed, and the meta rows come arithmetically
            # from the (checkpointed, metadata-sized) bounds frame — the
            # dense grid is scanned exactly once, by the write itself
            def _stage_meta() -> None:
                # built from the CHECKPOINTED bounds frame — independent
                # of the data write, so it can overlap it (§2.6). The
                # append-key digests ride along: they are only READ at
                # commit time (after the overlap joins), never by the
                # data staging, so their small collect job overlaps too.
                if self._acid:
                    kt_rows = new_keys.limit(
                        self.APPEND_KEYS_CAP + 1
                    ).collect()
                    self._note_append_keys(tuple(r) for r in kt_rows)
                self._append_meta_sdf(
                    self._meta_sdf_from_bounds(bounds, updated_at, op_id)
                )

            if self._acid:
                self._overlap_staged_writes(
                    lambda: self._append_data(dense), _stage_meta
                )
            else:
                self._append_data(dense)
                _stage_meta()
            return

        if mode == "update" and n_existing:
            new_chunk_keys = dense.select(*keys, "chunk_index").distinct()
            existing_rows = (
                self.alive_data()
                .join(new_chunk_keys, on=[*keys, "chunk_index"], how="left_semi")
            )
            dense = combine_first([dense, existing_rows], keys=keys).withColumn(
                "chunk_index",
                chunk_index_col("ts", self.config.chunk_axis, self.config.tz),
            )

        stale_sdf: DataFrame | None = None
        if mode == "replace" and n_existing:
            new_chunk_keys = dense.select(*keys, "chunk_index").distinct()
            stale = existing_alive.join(
                new_chunk_keys, on=[*keys, "chunk_index"], how="left_anti"
            ).select(*keys, "chunk_index")
            # materialize (metadata-sized) BEFORE the rewrite: the plan
            # references `dense`, whose lineage reads the files the rewrite
            # replaces. No driver collect — tombstones stay distributed.
            stale_sdf = safe_local_checkpoint(
                self._tombstone_sdf(stale, updated_at, op_id)
            )

        dense = safe_local_checkpoint(dense)
        if self._acid:
            # key digests from the (checkpointed, metadata-sized) bounds
            # frame — no extra data scan
            kt_rows = new_keys.limit(self.APPEND_KEYS_CAP + 1).collect()
            self._note_dropped_keys(tuple(r) for r in kt_rows)
        def _stage_meta_rw() -> None:
            # aggregates the CHECKPOINTED dense frame (and the
            # checkpointed stale tombstones) — never the files the
            # rewrite touches, so it can overlap the rewrite (§2.6)
            meta_sdf = self._meta_sdf_for(dense, updated_at, op_id)
            if stale_sdf is not None:
                meta_sdf = meta_sdf.unionByName(stale_sdf)
            self._append_meta_sdf(meta_sdf)

        if self._acid:
            self._overlap_staged_writes(
                lambda: self._rewrite_partitions_multi(dense), _stage_meta_rw
            )
        else:
            self._rewrite_partitions_multi(dense)
            _stage_meta_rw()

    # ------------------------------------------------------------------
    # read paths
    # ------------------------------------------------------------------
    def get_ts(
        self,
        attrs: dict,
        start=None,
        end=None,
        drop_bounds_na: bool = True,
    ) -> pd.Series | None:
        """Keyed range read (reference: chunk_timeserie_store.py:375-416).
        Full key required; None when absent.

        The Spark side does only what must be distributed (pruned scan +
        tombstone check); ordering and NaN-bound trimming happen on the
        collected single series at the pandas edge — two fewer shuffle
        stages per point read."""
        self._ensure_all_attrs(attrs)
        d = self.alive_data(attrs, start, end)
        pdf = d.select("ts", "value").toPandas()
        s = long_to_series(pdf, self.config.tz)
        if s is None:
            return None
        if drop_bounds_na:
            valid = s.notna()
            if not valid.any():
                return None
            s = s.loc[valid.idxmax(): valid[::-1].idxmax()]
        return s

    def get_ts_local(
        self,
        attrs: dict,
        start=None,
        end=None,
        drop_bounds_na: bool = True,
    ) -> pd.Series | None:
        """Low-latency point read served directly by pyarrow — no Spark job.

        Same layout, same semantics as :meth:`get_ts` (tombstone check via
        the meta log, partition pruning via the hive chunk_index dirs, key
        equality and ts bounds pushed into the arrow scan). Spark remains
        the engine for every analytical path; this is the serving-side
        mitigation for SURVEY §7.4's "small-read latency" trade — the
        reference answers point reads from a b-tree in ms, a Spark job
        costs hundreds of ms regardless of data size.
        """
        import pyarrow.dataset as pads

        self._ensure_all_attrs(attrs)
        if self._meta_empty():
            return None
        # latest meta state in pandas (metadata-sized)
        if self._acid:
            snap = self._snapshot()
            meta = pads.dataset(snap.paths("meta", self.path)).to_table().to_pandas()
        else:
            meta = pads.dataset(self._meta_path).to_table().to_pandas()
        for k, v in attrs.items():
            meta = meta[meta[k] == v]
        if len(meta) == 0:
            return None
        latest = (
            meta.sort_values("op_id")
            .groupby("chunk_index", as_index=False)
            .tail(1)
        )
        alive = sorted(latest.loc[~latest["is_deleted"], "chunk_index"].tolist())
        if not alive:
            return None

        tz = self.config.tz
        s_bound = normalize_bound(start, tz)
        e_bound = normalize_bound(end, tz)
        if self._acid:
            from holcstore_spark.plans.pruning import entry_may_match_keys

            # manifest file skipping (chunk range AND key stats — the
            # serving path is where footer-open latency matters most),
            # then chunk_index as a regular column
            entries = snap.entries_overlapping(
                "data", min(alive), max(alive)
            )
            kv = {k: [v] for k, v in attrs.items() if v is not None}
            if kv:
                entries = [
                    e for e in entries if entry_may_match_keys(e, kv)
                ]
            if not entries:
                return None
            data = pads.dataset(
                [os.path.join(self.path, e["path"]) for e in entries]
            )
        else:
            data = pads.dataset(self._data_path, partitioning="hive")
        filt = pads.field("chunk_index").isin([int(c) for c in alive])
        for k, v in attrs.items():
            filt = filt & (pads.field(k) == v)
        # the files hold naive UTC wall-clock instants (Spark session=UTC):
        # strip tz from the bounds so arrow compares like with like
        if s_bound is not None:
            filt = filt & (pads.field("ts") >= s_bound.tz_localize(None).to_pydatetime())
        if e_bound is not None:
            filt = filt & (pads.field("ts") <= e_bound.tz_localize(None).to_pydatetime())
        pdf = data.to_table(filter=filt, columns=["ts", "value"]).to_pandas()
        if len(pdf):
            ts_col = pd.to_datetime(pdf["ts"], utc=True)
            pdf = pd.DataFrame({"ts": ts_col, "value": pdf["value"]})
        s = long_to_series(pdf, tz)
        if s is None:
            return None
        if drop_bounds_na:
            valid = s.notna()
            if not valid.any():
                return None
            s = s.loc[valid.idxmax(): valid[::-1].idxmax()]
        return s

    def get_batch_ts(
        self,
        attrs_list: list[dict],
        start=None,
        end=None,
        drop_bounds_na: bool = True,
    ) -> dict[tuple, pd.Series]:
        """Batched point reads: N keyed range reads answered by ONE pruned
        Spark job, split into per-key series at the pandas edge.

        Returns ``{tuple(key values in config.keys order): pd.Series}``;
        keys with no alive data are absent, matching :meth:`get_ts`'s
        ``None``. Per-key semantics (tz rendering, NaN-bound trim) are
        identical to N sequential ``get_ts`` calls — this exists because
        each Spark job carries a fixed scheduling cost (~hundreds of ms),
        so N point reads cost N jobs sequentially but ~1 job batched.

        The key predicate is a per-column IN list, which reaches the
        parquet scan as a pushed filter (exact for single-key stores; a
        coarse superset for composite keys, tightened exactly at the
        edge). For SPARSE composite requests — where the per-column IN
        cross-product is much larger than the requested key set (a
        1000×1000 sparse request would otherwise read up to 10⁶ key
        combinations' row groups) — an exact broadcast semi-join on the
        requested key tuples runs ON TOP of the pushed IN filters, so the
        scan stays pruned and the residue never leaves the executors.
        Driver memory holds the N requested series — the same bound as
        the sequential loop it replaces; for unbounded scans use
        :meth:`yield_many_ts`.
        """
        keys = self.config.keys
        for a in attrs_list:
            self._ensure_all_attrs(a)
        if not attrs_list:
            return {}
        wanted = {tuple(a[k] for k in keys) for a in attrs_list}
        d = self._batch_frame(attrs_list, start, end)
        pdf = d.select(*keys, "ts", "value").toPandas()
        out: dict[tuple, pd.Series] = {}
        for kt, g in pdf.groupby(list(keys), sort=False):
            kt = kt if isinstance(kt, tuple) else (kt,)
            if kt not in wanted:  # composite-key cross-product residue
                continue
            s = long_to_series(g.reset_index(drop=True), self.config.tz)
            if s is None:
                continue
            if drop_bounds_na:
                valid = s.notna()
                if not valid.any():
                    continue
                s = s.loc[valid.idxmax(): valid[::-1].idxmax()]
            out[kt] = s
        return out

    #: composite-key batched reads switch from "coarse IN superset only"
    #: to "coarse IN + exact key-tuple broadcast semi-join" once the IN
    #: cross-product exceeds this multiple of the requested key count
    BATCH_RESIDUE_FACTOR = 4

    def _batch_frame(self, attrs_list: list[dict], start=None, end=None) -> DataFrame:
        """The pruned scan behind :meth:`get_batch_ts`, exposed so plan
        tests can assert the composite-key semi-join engages. The coarse
        per-column IN filters are ALWAYS applied (they reach the parquet
        scan as pushed filters); the exact key-tuple broadcast semi-join
        is layered on top only for sparse composite requests, where the
        IN cross-product residue would otherwise dominate the result."""
        keys = self.config.keys
        coarse = {
            f"{k}__in": sorted({a[k] for a in attrs_list}) for k in keys
        }
        d = self.alive_data(coarse, start, end)
        combos = 1
        for k in keys:
            combos *= len(coarse[f"{k}__in"])
        n_wanted = len({tuple(a[k] for k in keys) for a in attrs_list})
        if len(keys) > 1 and combos > self.BATCH_RESIDUE_FACTOR * n_wanted:
            spec = pd.DataFrame(
                [{k: a[k] for k in keys} for a in attrs_list]
            ).drop_duplicates()
            spec_sdf = self.spark.createDataFrame(
                spec,
                schema=T.StructType(
                    [T.StructField(k, t) for k, t in self._key_schema(spec)]
                ),
            )
            d = d.join(F.broadcast(spec_sdf), on=list(keys), how="left_semi")
        return d

    def yield_many_ts(
        self,
        filters: dict | None = None,
        start=None,
        end=None,
        drop_bounds_na: bool = True,
    ):
        """Ordered streaming read: yields ``(pd.Series, key_dict)`` per key
        with bounded driver memory (reference: chunk_timeserie_store.py:457-517).

        ``orderBy(keys…, ts)`` range-partitions the scan; ``toLocalIterator``
        pulls one partition at a time, so the driver holds one series plus
        one partition buffer, never the whole result.
        """
        validate_filter_keys(filters, self.config.keys)
        keys = list(self.config.keys)
        d = self.alive_data(filters, start, end)
        if drop_bounds_na:
            d = _drop_bounds_na(d, self.config.keys)
        rows = d.select(*keys, "ts", "value").orderBy(*keys, "ts").toLocalIterator()
        cur_key, ts_buf, val_buf = None, [], []
        for r in rows:
            k = tuple(r[c] for c in keys)
            if cur_key is not None and k != cur_key:
                yield self._flush(ts_buf, val_buf), dict(zip(keys, cur_key))
                ts_buf, val_buf = [], []
            cur_key = k
            ts_buf.append(r["ts"])
            val_buf.append(r["value"])
        if cur_key is not None:
            yield self._flush(ts_buf, val_buf), dict(zip(keys, cur_key))

    def _flush(self, ts_buf, val_buf) -> pd.Series:
        pdf = pd.DataFrame({"ts": ts_buf, "value": val_buf})
        return long_to_series(pdf, self.config.tz)

    def get_many_ts(self, filters=None, start=None, end=None):
        """Multi-series read. A LIST of full-key attr dicts dispatches to
        the batched point-read path (:meth:`get_batch_ts`, one Spark job,
        ``{key_tuple: series}``); a dict/None filter keeps the
        reference-parity materialized scan (list of (series, key))."""
        if isinstance(filters, (list, tuple)):
            return self.get_batch_ts(filters, start, end)
        return list(self.yield_many_ts(filters, start, end))

    # ------------------------------------------------------------------
    # aggregates / metadata
    # ------------------------------------------------------------------
    def count_chunks(self, filters: dict | None = None) -> int:
        validate_filter_keys(filters, self.config.keys)
        return self.alive_chunks(filters).count()

    def count_keys(self, filters: dict | None = None) -> int:
        validate_filter_keys(filters, self.config.keys)
        return self.alive_chunks(filters).select(*self.config.keys).distinct().count()

    def last_chunk_index(self, filters: dict | None = None) -> int | None:
        """Max alive chunk_index (reference A2: aggregate(Max('chunk_index')),
        chunk_timeserie_store.py:531) — a metadata-only aggregate."""
        validate_filter_keys(filters, self.config.keys)
        row = self.alive_chunks(filters).agg(F.max("chunk_index")).first()
        return None if row is None or row[0] is None else int(row[0])

    def list_updates(
        self,
        since=None,
        filters: dict | None = None,
        limit: int | None = None,
        offset: int = 0,
        after: dict | None = None,
    ) -> pd.DataFrame:
        """Paginated page of the change feed (reference list_updates,
        chunk_timeserie_store.py:567-607): deterministic order, Spark-side
        offset/limit so driver memory is bounded by the page size.

        ``after`` enables KEYSET pagination: a dict with the last seen
        row's ``updated_at``, key columns and ``chunk_index`` — the page
        starts strictly after that tuple in the feed's total order.
        Unlike ``offset``, a keyset cursor is stable under concurrent
        server writes: re-stamped rows move to the feed's end instead of
        shifting every later row's position out from under the pager.
        """
        feed = self.updates(since=since, filters=filters)
        if after is not None:
            cols = ["updated_at", *self.config.keys, "chunk_index"]
            a = dict(after)
            a["updated_at"] = pd.Timestamp(a["updated_at"])
            if a["updated_at"].tzinfo is None:
                a["updated_at"] = a["updated_at"].tz_localize("UTC")
            pred = None
            eqs = None
            for c in cols:
                v = a[c]
                lit = F.lit(
                    v.to_pydatetime() if isinstance(v, pd.Timestamp) else v
                )
                term = F.col(c) > lit
                if eqs is not None:
                    term = eqs & term
                pred = term if pred is None else pred | term
                eq = F.col(c) == lit
                eqs = eq if eqs is None else eqs & eq
            feed = feed.filter(pred)
        if offset:
            feed = feed.offset(int(offset))
        if limit is not None:
            feed = feed.limit(int(limit))
        return feed.toPandas()

    def last_updated_at(self, filters: dict | None = None) -> pd.Timestamp:
        """Sync watermark: max updated_at (tombstones included) else the
        2000-01-01 epoch default (reference: chunk_timeserie_store.py:288-307)."""
        validate_filter_keys(filters, self.config.keys)
        row = self.meta().filter(attrs_filter(filters)).agg(F.max("updated_at")).first()
        mx = row[0] if row else None
        if mx is None:
            return pd.Timestamp(DEFAULT_WATERMARK)
        return pd.Timestamp(mx, tz="UTC")

    def get_max_horodate(self, filters: dict | None = None) -> pd.Timestamp | None:
        """Latest non-NaN timestamp across matching series
        (reference: chunk_timeserie_store.py:519-539).

        Pruned like the reference: the max alive chunk comes from the cached
        metadata-sized ``latest_meta``, then only the last two chunk
        partitions are scanned (``chunk_index`` is the partition column, so
        the scan reads two directories regardless of history length). The
        full-history scan only runs in the pathological case where both tail
        chunks hold nothing but NaN padding."""
        validate_filter_keys(filters, self.config.keys)
        row = (
            self.alive_chunks(filters)
            .filter(F.col("n_points") > 0)
            .agg(F.max("chunk_index"))
            .first()
        )
        mx_chunk = row[0] if row else None
        if mx_chunk is None:
            return None
        for lo in (int(mx_chunk) - 1, None):
            d = self.alive_data(filters)
            if lo is not None:
                d = d.filter(F.col("chunk_index") >= lo)
            row = d.filter(F.col("value").isNotNull()).agg(F.max("ts")).first()
            mx = row[0] if row else None
            if mx is not None:
                return pd.Timestamp(mx, tz="UTC").tz_convert(self.config.tz)
        return None

    def get_max_horodates(self, filters: dict | None = None) -> DataFrame:
        """Grouped :meth:`get_max_horodate`: latest non-NaN timestamp PER
        KEY for a whole filter set in ONE pruned scan, returned as a frame
        ``(keys…, max_ts)`` (UTC instants).

        The reference calls ``get_max_horodate`` in loops
        (chunk_timeserie_store.py:519-539) — one aggregate job per key; a
        10k-key catalog costs 10k driver-paced jobs. Here the metadata-
        sized ``latest_meta`` yields each key's two tail chunks (row_number
        over chunk_index desc), a broadcast semi-join restricts the data
        scan to those ``(keys…, chunk_index)`` pairs, and one NaN-aware
        groupBy answers every key — including, as a NULL ``max_ts``, the
        keys whose tail chunks hold nothing but NaN padding
        (pathological). Those are answered by a second scan restricted to
        just those keys; detecting them is a filter over the already-
        materialized aggregate (one row per key), NOT an extra
        anti-join job against the catalog — the common case stays
        two-partition-bounded per key regardless of history length.
        """
        validate_filter_keys(filters, self.config.keys)
        keys = list(self.config.keys)
        alive = self.alive_chunks(filters).filter(F.col("n_points") > 0)
        w = Window.partitionBy(*keys).orderBy(F.desc("chunk_index"))
        tail = (
            alive.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= 2)
            .select(*keys, "chunk_index")
        )
        d = self.alive_data(filters).join(
            F.broadcast(tail), on=[*keys, "chunk_index"], how="left_semi"
        )
        # the dense grid guarantees every tail chunk has rows, so this
        # yields one row per alive key; an all-NaN tail aggregates to a
        # NULL max_ts instead of silently dropping the key
        agg = d.groupBy(*keys).agg(
            F.max(F.when(F.col("value").isNotNull(), F.col("ts"))).alias("max_ts")
        )
        # materialize once: both the NULL-tail check and the final read
        # would otherwise recompute the pruned scan
        agg = safe_local_checkpoint(agg)
        # loud meta/data divergence guard (VERDICT r7/r8 note): the dense
        # grid guarantees every alive key's tail chunks hold rows, so the
        # aggregate must produce one row PER alive key — a key vanishing
        # here means meta claims chunks its data files don't back, and
        # silently dropping it would misreport the catalog. Two
        # metadata-sized counts (agg is checkpointed): cheap.
        n_expect = tail.select(*keys).distinct().count()
        n_got = agg.count()
        if n_got != n_expect:
            raise RuntimeError(
                f"meta/data divergence in get_max_horodates: {n_expect} "
                f"alive keys in meta but {n_got} answered by the data "
                "scan — a tail chunk's data rows are missing"
            )
        resolved = agg.filter(F.col("max_ts").isNotNull())
        missing = agg.filter(F.col("max_ts").isNull()).select(*keys)
        if missing.limit(1).count():
            rest = self.alive_data(filters).join(
                F.broadcast(missing), on=keys, how="left_semi"
            )
            second = (
                rest.filter(F.col("value").isNotNull())
                .groupBy(*keys)
                .agg(F.max("ts").alias("max_ts"))
            )
            resolved = resolved.unionByName(second)
        return resolved

    # ------------------------------------------------------------------
    # delete / compact
    # ------------------------------------------------------------------
    @_transactional("delete")
    def delete(self, filters: dict | None = None, keep_tracking: bool = True) -> int:
        """Tombstone matching chunks (reference soft delete,
        chunk_timeserie_store.py:30-52). ``keep_tracking=False`` erases all
        trace (physical rewrite) and is forbidden on sync-enabled stores."""
        validate_filter_keys(filters, self.config.keys)
        if not keep_tracking and self.config.allow_sync:
            raise SyncGuardError("untracked delete is forbidden on a sync-enabled store")
        victims = self.alive_chunks(filters).select(*self.config.keys, "chunk_index")
        updated_at, op_id = self._now_stamp()
        if keep_tracking:
            # distributed tombstoning: a million-chunk delete writes its
            # changelog rows without materializing them on the driver.
            # Checkpoint (metadata-sized) so count + write evaluate once.
            tomb = safe_local_checkpoint(
                self._tombstone_sdf(victims, updated_at, op_id)
            )
            n = tomb.count()
            if n == 0:
                return 0
            self._append_meta_sdf(tomb)
            return n
        # untracked: physically drop data rows and meta entries. This is a
        # FULL-table rewrite: static overwrite mode so partitions that became
        # empty are removed (dynamic mode would leave their files visible).
        pred = attrs_filter(filters)
        if self._acid:
            # copy-on-write full rewrite: stage kept rows, remove every
            # live file, declare touched="all" — any interleaved commit
            # is a genuine conflict, detected atomically at commit time
            n = victims.count()
            txn = self._active_txn
            self._stage_into_txn(self.data().filter(~pred), "data")
            self._stage_into_txn(self.meta().filter(~pred), "meta")
            txn.removes["data"].extend(txn.snapshot.files["data"])
            txn.removes["meta"].extend(txn.snapshot.files["meta"])
            txn.touch("all")
            return n
        fence_op_id = self._max_committed_op_id()
        n = victims.count()
        remaining_data = safe_local_checkpoint(self.data().filter(~pred))
        remaining_meta = safe_local_checkpoint(self.meta().filter(~pred))
        # op_id fence: the checkpoints above materialized a snapshot; a
        # writer committing since would have its rows dropped by the
        # overwrites below. Residual window: a writer landing between this
        # check and the overwrites can still be lost (single-writer
        # contract, see ConcurrentWriteError).
        if self._max_committed_op_id() != fence_op_id:
            raise ConcurrentWriteError(
                "meta op_id advanced during untracked delete; aborting "
                "before the overwrite could drop the concurrent writer's rows"
            )
        (
            remaining_data.repartition("chunk_index", *self.config.keys)
            .sortWithinPartitions(*self.config.keys, "ts")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy("chunk_index")
            .parquet(self._data_path)
        )
        remaining_meta.coalesce(1).write.mode("overwrite").parquet(self._meta_path)
        self._invalidate_meta_cache()
        return n

    def describe_chunks(self) -> DataFrame:
        """Partition health audit — the skew/small-file report an operator
        reads before resizing ``spark.sql.files.maxPartitionBytes`` or
        scheduling :meth:`compact` / :meth:`delete_before` at scale.

        One row per ``chunk_index`` partition: alive/tombstoned series
        counts, total grid points, the partition's file count and bytes
        (from the FileSystem listing — no data scan; the whole frame is
        metadata-sized). ``avg_bytes_per_file`` exposes the small-file
        problem directly: many tiny files per partition means the write
        path is over-parallelized for the data volume.
        """
        latest = self.latest_meta()
        agg = latest.groupBy("chunk_index").agg(
            F.sum((~F.col("is_deleted")).cast("long")).alias("n_series"),
            F.sum(F.col("is_deleted").cast("long")).alias("n_tombstoned"),
            F.sum(F.when(~F.col("is_deleted"), F.col("n_points")).otherwise(0))
            .alias("n_points"),
        )
        rows = []
        if self._acid:
            # manifest-driven report: each live file is attributed to its
            # chunk_min (range-partitioned staging makes files effectively
            # single-chunk, so this is exact in practice)
            per_chunk: dict[int, list[int]] = {}
            for e in self._snapshot().files["data"]:
                ci = e.get("chunk_min")
                if ci is None:
                    continue
                size = os.path.getsize(os.path.join(self.path, e["path"]))
                nf, nb = per_chunk.get(int(ci), (0, 0))
                per_chunk[int(ci)] = (nf + 1, nb + size)
            rows = [(ci, nf, nb) for ci, (nf, nb) in per_chunk.items()]
        else:
            jvm = self.spark._jvm
            hconf = self.spark._jsc.hadoopConfiguration()
            root = jvm.org.apache.hadoop.fs.Path(self._data_path)
            fs = root.getFileSystem(hconf)
            if fs.exists(root):
                for st in fs.listStatus(root):
                    name = st.getPath().getName()
                    if not name.startswith("chunk_index="):
                        continue
                    try:
                        idx = int(name.split("=", 1)[1])
                    except ValueError:
                        continue
                    n_files, n_bytes = 0, 0
                    for f in fs.listStatus(st.getPath()):
                        if f.isFile() and not f.getPath().getName().startswith("_"):
                            n_files += 1
                            n_bytes += f.getLen()
                    rows.append((idx, n_files, n_bytes))
        files = self.spark.createDataFrame(
            rows or [], "chunk_index int, n_files long, n_bytes long"
        )
        return (
            agg.join(files, on="chunk_index", how="full")
            .fillna(0, subset=["n_series", "n_tombstoned", "n_points",
                               "n_files", "n_bytes"])
            .withColumn(
                "avg_bytes_per_file",
                F.when(F.col("n_files") > 0,
                       F.col("n_bytes") / F.col("n_files")),
            )
            .orderBy("chunk_index")
        )

    @_transactional("delete_before")
    def delete_before(self, cutoff, keep_tracking: bool = True) -> int:
        """Retention sweep: remove every chunk whose entire calendar range
        ends before ``cutoff`` (a timestamp; naive values localize to the
        store tz). Returns the number of chunks removed.

        ``keep_tracking=True`` tombstones them through the normal meta log
        (sync replicas propagate the deletion). ``keep_tracking=False`` is
        the 100 TB retention path: victims are WHOLE ``chunk_index``
        partitions, so the data files are dropped directly via the Hadoop
        FileSystem — O(dropped partitions) metadata work, no table scan or
        rewrite (unlike filter-based untracked ``delete``, which must
        rewrite the full table). Forbidden on sync-enabled stores. Guarded
        by the same op_id fence as ``_rewrite_partitions``, checked twice:
        before the first directory drop (abort touches nothing) and again
        immediately before the meta overwrite (abort leaves the meta log
        intact; already-dropped partitions read empty until a re-run). A
        writer landing inside the final check→overwrite window can still
        lose its meta row — the residual single-writer contract.
        """
        from holcstore_spark.functions.scalar import chunk_index_of

        c = pd.Timestamp(cutoff)
        cutoff_idx = chunk_index_of(c, self.config.chunk_axis, self.config.tz)
        if keep_tracking:
            victims = self.alive_chunks().select(
                *self.config.keys, "chunk_index"
            ).filter(F.col("chunk_index") < cutoff_idx)
            updated_at, op_id = self._now_stamp()
            tomb = safe_local_checkpoint(
                self._tombstone_sdf(victims, updated_at, op_id)
            )
            n = tomb.count()
            if n == 0:
                return 0
            self._append_meta_sdf(tomb)
            return n
        if self.config.allow_sync:
            raise SyncGuardError(
                "untracked delete_before is forbidden on a sync-enabled store"
            )
        if self._acid:
            # file-granular retention under the manifest: files entirely
            # below the cutoff are dropped by a log entry alone (no IO);
            # boundary-straddling files are copy-on-write rewritten. The
            # meta table is rewritten to the surviving rows. One atomic
            # commit; touched="all" because the sweep's keep-set spans
            # the whole log.
            txn = self._active_txn
            n = (
                self.meta()
                .filter(F.col("chunk_index") < cutoff_idx)
                .select(*self.config.keys, "chunk_index")
                .distinct()
                .count()
            )
            full, straddle = [], []
            for e in txn.snapshot.files["data"]:
                cmin, cmax = e.get("chunk_min"), e.get("chunk_max")
                if cmax is not None and cmax < cutoff_idx:
                    full.append(e)
                elif cmin is None or cmin < cutoff_idx:
                    straddle.append(e)
            if n == 0 and not full and not straddle:
                return 0
            if straddle:
                paths = [os.path.join(self.path, e["path"]) for e in straddle]
                kept = (
                    self.spark.read.schema(self._data_schema())
                    .parquet(*paths)
                    .filter(F.col("chunk_index") >= cutoff_idx)
                )
                self._stage_into_txn(kept, "data")
            txn.removes["data"].extend(full + straddle)
            self._stage_into_txn(
                self.meta().filter(F.col("chunk_index") >= cutoff_idx), "meta"
            )
            txn.removes["meta"].extend(txn.snapshot.files["meta"])
            txn.touch("all")
            return n
        fence_op_id = self._max_committed_op_id()
        # count meta chunk states being removed (incl. already-tombstoned
        # ones — their files and log rows go too); metadata-sized
        meta = self.meta()
        n = meta.filter(F.col("chunk_index") < cutoff_idx).select(
            *self.config.keys, "chunk_index"
        ).distinct().count()
        # partition dirs strictly below the cutoff index, from the FS
        # listing — no data scan
        jvm = self.spark._jvm
        hconf = self.spark._jsc.hadoopConfiguration()
        data_path = jvm.org.apache.hadoop.fs.Path(self._data_path)
        fs = data_path.getFileSystem(hconf)
        victims_dirs = []
        if fs.exists(data_path):
            for st in fs.listStatus(data_path):
                name = st.getPath().getName()
                if name.startswith("chunk_index="):
                    try:
                        idx = int(name.split("=", 1)[1])
                    except ValueError:
                        continue
                    if idx < cutoff_idx:
                        victims_dirs.append(st.getPath())
        if not victims_dirs and n == 0:
            return 0
        remaining_meta = safe_local_checkpoint(
            meta.filter(F.col("chunk_index") >= cutoff_idx)
        )
        if self._max_committed_op_id() != fence_op_id:
            raise ConcurrentWriteError(
                f"meta op_id advanced during delete_before({cutoff!r}); "
                "aborting before any partition was dropped"
            )
        for p in victims_dirs:
            fs.delete(p, True)
        # second fence immediately before the meta overwrite: a writer
        # committing during the directory sweep would otherwise have its
        # meta row silently dropped by the overwrite (orphaning its data
        # files). Aborting here leaves the meta log INTACT — the victim
        # partitions' data dirs are already gone, so their still-alive
        # meta rows read as empty until a re-run finishes the sweep; that
        # residual (and the narrower check→overwrite window that remains)
        # is part of the documented single-writer contract.
        if self._max_committed_op_id() != fence_op_id:
            raise ConcurrentWriteError(
                f"meta op_id advanced during delete_before({cutoff!r}) "
                "partition sweep; meta log left untouched — re-run "
                "delete_before to finish the sweep"
            )
        remaining_meta.coalesce(1).write.mode("overwrite").parquet(self._meta_path)
        self._invalidate_meta_cache()
        return n

    @_transactional("compact")
    def compact(self) -> None:
        """Physically drop tombstoned data and collapse the meta log to its
        latest state (the Parquet analogue of VACUUM + log checkpoint).

        ACID mode: one atomic commit replacing every live file with the
        compacted state (MVCC — readers of the old snapshot are
        unaffected; staged old files linger until a future GC sweep)."""
        if self._acid:
            txn = self._active_txn
            latest = self.latest_meta()
            alive = latest.filter(~F.col("is_deleted")).select(
                *self.config.keys, "chunk_index"
            )
            data = self.data().join(
                F.broadcast(alive),
                on=[*self.config.keys, "chunk_index"],
                how="left_semi",
            )
            self._stage_into_txn(data, "data")
            self._stage_into_txn(latest, "meta")
            txn.removes["data"].extend(txn.snapshot.files["data"])
            txn.removes["meta"].extend(txn.snapshot.files["meta"])
            txn.touch("all")
            # the staged data is a SUBSET of the removed data (alive
            # semi-join), so equal manifest row counts prove the rewrite
            # is row-preserving — mark it `compacting` and the change
            # feed skips it at manifest level (Delta dataChange=false).
            # A compact that physically drops tombstoned rows changes
            # the row set and must stream as deletes, so it stays
            # unmarked and cancels row-level downstream as before.
            # The proof needs REAL counts on both sides: FileEntry
            # documents rows=None as "stats unavailable" (hand-built /
            # imported entries), and `None or 0` would alias such an
            # entry to 0 — a tombstone-dropping compact over stats-less
            # files could then be misclassified as row-preserving and
            # silently skipped by the change feed, losing its delete
            # rows (ADVICE r9). Any None on either side → stay unmarked
            # and let row-level cancellation handle it.
            from holcstore_spark.sources.txlog import exact_rows

            added_rows = exact_rows(txn.adds["data"])
            removed_rows = exact_rows(txn.snapshot.files["data"])
            txn.compacting = (
                added_rows is not None
                and removed_rows is not None
                and added_rows == removed_rows
            )
            return
        latest = safe_local_checkpoint(self.latest_meta())
        alive = latest.filter(~F.col("is_deleted")).select(*self.config.keys, "chunk_index")
        data = self.data().join(
            F.broadcast(alive), on=[*self.config.keys, "chunk_index"], how="left_semi"
        )
        data = safe_local_checkpoint(data)
        (
            data.repartition("chunk_index", *self.config.keys)
            .sortWithinPartitions(*self.config.keys, "ts")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "static")  # full rewrite: drop emptied partitions
            .partitionBy("chunk_index")
            .parquet(self._data_path)
        )
        latest.coalesce(1).write.mode("overwrite").parquet(self._meta_path)
        self._invalidate_meta_cache()

    @_transactional("optimize")
    def optimize(self, min_files: int = 4, max_chunks: int = 64) -> int:
        """Incremental small-file binpack (Delta ``OPTIMIZE`` analogue,
        ACID only). ``compact()`` is a full-table rewrite — the right
        tool for physically dropping tombstoned rows, but an O(table)
        job a 100 TB store cannot afford for routine small-file
        hygiene (and its ``touched='all'`` serializes against every
        writer). ``optimize`` instead selects only chunks whose live
        file count reached ``min_files`` (most fragmented first, at
        most ``max_chunks`` per commit), reads JUST those files, and
        repacks them into one range-partitioned file set — cost is
        O(fragmentation), never O(table).

        The commit is row-preserving BY CONSTRUCTION (it re-packs
        exactly the source files' rows, tombstoned or not — the staged
        row count is verified against the manifest and the transaction
        aborts on any mismatch), so it carries ``compacting=True``:
        change feeds skip it at manifest level (Delta
        ``dataChange=false``) and it commutes with every concurrent
        commit that does not rewrite the same source files — appends,
        updates/deletes of other files, optimizes of other chunks.
        Background maintenance therefore never starves under ingest and
        never blocks writers. Returns the number of chunks repacked.
        Files without exact manifest stats (``rows=None`` or a
        multi-chunk span) are left alone: the per-chunk grouping and
        the row-preservation proof both need tight stats."""
        if not self._acid:
            raise ValueError(
                "optimize() requires acid=True (plain stores rewrite "
                "the whole table: use compact())"
            )
        from holcstore_spark.sources.txlog import (
            binpack_candidates,
            exact_rows,
        )

        txn = self._active_txn
        cands, by_chunk = binpack_candidates(
            txn.snapshot.files["data"], min_files, max_chunks
        )
        if not cands:
            return 0
        # stage each chunk separately, pinned to ONE output partition:
        # a single range-partitioned write over all candidates samples
        # its boundaries and can emit a CHUNK-SPANNING file on skew —
        # which the candidate filter above would then exclude from every
        # future optimize, leaving that chunk permanently un-packable
        for c in cands:
            paths = [os.path.join(self.path, e["path"]) for e in by_chunk[c]]
            src = self.spark.read.schema(self._data_schema()).parquet(*paths)
            self._stage_into_txn(src, "data", npart=1)
        sources = [e for c in cands for e in by_chunk[c]]
        txn.removes["data"].extend(sources)
        txn.touch(set(cands))
        added = exact_rows(txn.adds["data"])
        removed = exact_rows(sources)
        if added != removed:
            # the repack lost or duplicated rows (schema drift, torn
            # source file): abort the transaction — nothing commits (and
            # the _txn except-path notes the staged files as orphans)
            raise RuntimeError(
                f"optimize repack row mismatch: staged {added} rows for "
                f"{removed} source rows across chunks {sorted(cands)}"
            )
        txn.compacting = True
        return len(cands)

    def vacuum(
        self, retention_seconds: float = 3600.0, deep: bool = False
    ) -> int:
        """ACID-mode garbage collection: physically delete files that
        are no longer referenced and older than ``retention_seconds``.
        The retention window is the same safety Delta's VACUUM retention
        gives: a concurrent in-flight writer's freshly STAGED (not yet
        committed) files are indistinguishable from crash orphans, so
        reclaiming them immediately would corrupt that writer's commit;
        age-gating makes vacuum safe to run any time as long as no
        single transaction stays open longer than the window. Pass ``0``
        only when no other writer can be active.

        The default sweep is MANIFEST-DRIVEN — O(orphans), reading the
        sidecars commits write when files become unreferenced, never
        listing the ``files/`` staging dirs (at millions of commits the
        full walk was the scaling hazard, VERDICT r8). ``deep=True``
        additionally walks every staging dir to catch files orphaned by
        a writer killed before any bookkeeping could happen (kill -9
        mid-staging) — run it occasionally, not per-vacuum.

        Also reclaims emptied staging directories, their _SUCCESS
        markers, stale ``.tmp-`` log artifacts, and commit records
        already summarized by the latest manifest checkpoint (giving up
        snapshot-as-of below that horizon, Delta log-retention style).
        Returns the number of filesystem entries removed. No-op on
        plain stores; refused on time-travel views (it would reclaim
        files and log history the pinned snapshot — and any other
        as-of holder — still references)."""
        if self._pinned_snapshot is not None:
            raise ValueError("time-travel views are read-only (vacuum refused)")
        if not self._acid:
            return 0
        return self._txlog.vacuum_files(retention_seconds, deep=deep)

    # ------------------------------------------------------------------
    # sync surface (change feed / export / import)
    # ------------------------------------------------------------------
    def updates(self, since=None, filters: dict | None = None) -> DataFrame:
        """Change feed: latest chunk states with updated_at >= since, in
        deterministic (updated_at, keys, chunk) order
        (reference: chunk_timeserie_store.py:545-565)."""
        validate_filter_keys(filters, self.config.keys)
        m = self.latest_meta(filters)
        if since is not None:
            s = pd.Timestamp(since)
            s = s.tz_localize("UTC") if s.tzinfo is None else s.tz_convert("UTC")
            m = m.filter(F.col("updated_at") >= F.lit(s.to_pydatetime()))
        return m.orderBy("updated_at", *self.config.keys, "chunk_index")

    def export_chunks_sdf(
        self, spec: DataFrame | list[dict], hint_broadcast: bool = True
    ) -> DataFrame:
        """Raw long rows for the given (keys…, chunk_index) spec as a Spark
        frame — the scale path for table-to-table sync: the data never
        materializes on a driver. No tombstone filter: the caller ships
        exactly what updates() listed.

        ``hint_broadcast=False`` for specs that may be store-sized (a
        bootstrap pull's full alive-chunk list): AQE then picks the join
        strategy instead of forcing a driver-sized broadcast."""
        if isinstance(spec, list):
            spec_df = self.spark.createDataFrame(
                pd.DataFrame(spec),
                schema=T.StructType(
                    [T.StructField(k, t) for k, t in self._key_schema(pd.DataFrame(spec))]
                    + [T.StructField("chunk_index", T.IntegerType())]
                ),
            )
        else:
            spec_df = spec
        spec_df = spec_df.select(*self.config.keys, "chunk_index")
        if hint_broadcast:
            spec_df = F.broadcast(spec_df)
        return self.data().join(
            spec_df,
            on=[*self.config.keys, "chunk_index"],
            how="left_semi",
        )

    def export_chunks(self, spec: DataFrame | list[dict]) -> pd.DataFrame:
        """Driver-materialized :meth:`export_chunks_sdf` — the wire-format
        sync pack endpoint a REST shim would serialize
        (reference: chunk_timeserie_store.py:609-631)."""
        return self.export_chunks_sdf(spec).toPandas()

    @_transactional("import_chunks_sdf")
    def import_chunks_sdf(self, meta_rows: pd.DataFrame, data_sdf: DataFrame | None) -> None:
        """Atomically apply exported chunks with the *server's* stamps
        (reference: chunk_timeserie_store.py:633-695). Data lands first,
        meta (the watermark carrier) last — a crash in between re-imports
        idempotently on the next pull. ``meta_rows`` is page-sized (driver
        pandas is fine); the data frame stays distributed end-to-end."""
        if len(meta_rows) == 0:
            return
        for col in ("updated_at",):
            meta_rows[col] = pd.to_datetime(meta_rows[col], utc=True)
        if data_sdf is not None:
            if self._acid:
                self._note_dropped_keys(
                    meta_rows[list(self.config.keys)]
                    .drop_duplicates()
                    .itertuples(index=False)
                )
            self._rewrite_partitions_multi(data_sdf)
        self._append_meta(meta_rows.to_dict("records"), meta_rows)

    def has_data(self) -> bool:
        """Whether any committed data rows exist — layout-aware (the
        plain store checks the hive data dir; ACID stores keep files
        under ``files/`` governed by the manifest, so a path check would
        always be False there)."""
        if self._acid:
            return bool(self._snapshot().files["data"])
        return has_parquet(self._data_path)

    @_transactional("append_import")
    def append_import(self, data_sdf: DataFrame, meta_sdf: DataFrame) -> None:
        """Bulk sync landing: append raw data rows and their meta rows
        (the watermark carrier) in one operation — on ACID stores both
        register in ONE atomic commit, closing the bootstrap pull's
        data-landed-but-no-watermark crash window; plain stores keep the
        documented data-first/meta-last idempotent-reimport ordering."""
        self._append_data(data_sdf)
        self._append_meta_sdf(meta_sdf)

    def import_chunks(self, meta_rows: pd.DataFrame, data_rows: pd.DataFrame) -> None:
        """Pandas-frame twin of :meth:`import_chunks_sdf` — the wire-format
        endpoint for callers holding serialized rows."""
        if len(meta_rows) == 0:
            return
        sdf = None
        if len(data_rows):
            schema = self._data_schema(data_rows)
            data_rows = data_rows[[f.name for f in schema.fields]]
            sdf = nan_to_null(
                self.spark.createDataFrame(data_rows, schema=schema), "value"
            )
        self.import_chunks_sdf(meta_rows, sdf)
