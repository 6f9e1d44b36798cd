"""Streaming change-data-capture source for ACID stores.

Exposes a ChunkStore's transaction log as a Structured Streaming source
via PySpark 4's Python Data Source API: offsets are COMMIT VERSIONS, so
a restarted query resumes exactly where its checkpoint left off, and
each micro-batch is the manifest diff between two committed versions —
only the files added/removed in the interval are ever read, never the
table (the same bounded shape as ``ChunkStore.changes_between``).

Semantics (Flink-changelog style, documented honestly): rows from files
ADDED in the interval stream with ``_change_type='insert'``, rows from
files REMOVED stream with ``_change_type='delete'``. Copy-on-write
rewrites therefore emit matched no-op delete+insert pairs for the
bystander rows they carry — a consumer applying the feed as
retract-then-upsert converges to the exact table state (the batch API
``changes_between`` cancels those pairs with an ``exceptAll`` instead,
which a per-file streaming partition cannot do without a shuffle
barrier inside the source).

Usage::

    from holcstore_spark.streaming.cdf_source import ChunkStoreChangesDataSource
    spark.dataSource.register(ChunkStoreChangesDataSource)
    feed = (spark.readStream.format("holc-changes")
            .option("path", store.path)
            .option("startingVersion", "earliest")   # | "latest" | <int>
            .option("maxVersionsPerBatch", "8")       # optional rate limit
            .load())

``maxVersionsPerBatch`` bounds how many commit versions one micro-batch
may cover — a stream catching up over a long backlog drains it in
bounded slices instead of one table-sized batch (Delta's
maxFilesPerTrigger shape). The FIRST micro-batch of any query — fresh or
restarted — is uncapped, by design twice over: a restarted query's start
offset lives in Spark's checkpoint and the Python
``DataSourceStreamReader`` API calls ``latestOffset()`` BEFORE ever
revealing it (the start only arrives at ``partitions(start, end)``,
which does seed the cursor — so batch 2 onward is always capped);
capping from a guessed base could invert the offset range. And
availableNow falls back to single-batch execution for Python sources,
where a capped first batch would silently strand the rest of the
backlog. Every batch after the first is capped; non-positive values are
rejected (omit the option for no limit).

.. warning:: **Restart gap — the cap does NOT protect the first batch
   after a restart.** A query restarting into a long backlog replays
   the ENTIRE backlog in one uncapped micro-batch. If an oversized
   batch is what killed the query (executor OOM), restarting reproduces
   it — a crash loop in exactly the scenario the option targets.

   Re-probed against pyspark 4.1.2 (rounds 12 and 13 — the installed
   runner is byte-identical between probes), still API-blocked —
   the exact evidence, so this claim stays falsifiable:
   ``pyspark/sql/streaming/python_streaming_source_runner.py`` speaks a
   four-function protocol (func ids 884 initialOffset / 885
   latestOffset / 886 partitions / 887 commit); ``latest_offset_func``
   calls ``reader.latestOffset()`` with NO arguments and nothing in the
   handshake transmits the checkpointed offset before it — the start
   first reaches Python at ``partitions(start, end)`` (886). On restart
   the JVM replans from its own offset log, so a committed-last-batch
   restart goes straight to 885 uncapped. The alternative
   ``SimpleDataSourceStreamReader`` API DOES receive the start
   (``read(start)``), but it prefetches records on the DRIVER — a
   non-starter for a file-partition CDC source (the whole point is
   executor-side pyarrow reads). Re-test when the runner protocol
   grows a start-aware latestOffset (Scala's
   ``SupportsAdmissionControl.latestOffset(start, limit)`` shape).

   Until then, operators hitting this should either (a) raise
   executor memory / shrink ``spark.sql.files.maxPartitionBytes`` for
   one catch-up run, or (b) start a FRESH checkpoint with
   ``startingVersion`` pinned just past the stuck offset — safe only
   when the sink is idempotent (e.g. ``foreachBatch`` +
   ``txn_app``/``txn_version``), since a new checkpoint forgets sink
   progress.

Executors read the immutable data files with pyarrow directly (no Spark
job inside the source) — the same shared-filesystem assumption the
store itself already makes.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

def _data_schema_for(path: str) -> T.StructType:
    """The store's data schema + the change marker, derived from the
    frozen config via ChunkStore's own schema rule
    (``data_schema_from_config`` — one source of truth, so the source
    cannot drift from the table layout). The path is passed through so
    keys missing from ``key_types`` resolve from a live parquet footer
    — the WRITTEN type — instead of a silent string default that would
    misread int/float-keyed stores (ADVICE r7)."""
    from holcstore_spark.config import ChunkStoreConfig
    from holcstore_spark.sources.chunk_store import data_schema_from_config

    if not os.path.isdir(os.path.join(path, "_txlog")):
        raise ValueError(
            f"{path!r} is not an ACID store (no _txlog): the "
            "holc-changes source streams the transaction log"
        )
    cfg = ChunkStoreConfig.load(path)
    return T.StructType(
        [*data_schema_from_config(cfg, path).fields,
         T.StructField("_change_type", T.StringType())]
    )


def net_changes(df, change_col: str = "_change_type"):
    """Cancel the matched no-op delete+insert pairs a file-level change
    feed legitimately carries (copy-on-write rewrites re-emit bystander
    rows on both sides): returns the NET row-level delta, same shape as
    the input — the data columns plus ``change_col`` ('insert' |
    'delete'). Multiset semantics (``exceptAll`` both ways), so K
    duplicate physical rows cancel K-at-a-time exactly. The net of a
    ``holc-changes`` micro-batch equals the batch
    ``ChunkStore.changes_between`` delta over the same version
    interval."""
    from pyspark.sql import functions as F

    cols = [c for c in df.columns if c != change_col]
    ins = df.filter(F.col(change_col) == "insert").select(*cols)
    dels = df.filter(F.col(change_col) == "delete").select(*cols)
    return (
        ins.exceptAll(dels).withColumn(change_col, F.lit("insert"))
        .unionByName(
            dels.exceptAll(ins).withColumn(change_col, F.lit("delete"))
        )
    )


def apply_changes(target, changes, change_col: str = "_change_type"):
    """Retract-then-upsert a change feed into ``target``: every
    'delete' row is retracted (multiset ``exceptAll`` — one occurrence
    per delete row) and every 'insert' row appended. Feeding the raw
    file-level feed and the :func:`net_changes` of it produce the same
    result (matched pairs retract what they just inserted), and
    applying consecutive version intervals in order reconstructs the
    physical table exactly — the CDF composition invariant. Returns a
    frame with the data columns (no ``change_col``)."""
    from pyspark.sql import functions as F

    cols = [c for c in changes.columns if c != change_col]
    ins = changes.filter(F.col(change_col) == "insert").select(*cols)
    dels = changes.filter(F.col(change_col) == "delete").select(*cols)
    return target.select(*cols).exceptAll(dels).unionByName(ins)


@dataclass
class _FilePartition(InputPartition):
    root: str
    rel_path: str
    change_type: str
    columns: tuple


class ChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        from holcstore_spark.sources.txlog import TxLog

        self.root = options["path"]
        if not os.path.isdir(os.path.join(self.root, "_txlog")):
            raise ValueError(
                f"{self.root!r} is not an ACID store (no _txlog): the "
                "holc-changes source streams the transaction log"
            )
        self.log = TxLog(self.root)
        self.starting = str(options.get("startingversion",
                                        options.get("startingVersion", "latest")))
        mv = options.get("maxversionsperbatch",
                         options.get("maxVersionsPerBatch"))
        #: rate limit (Delta's maxFilesPerTrigger shape, but in commit
        #: versions — the unit the offsets already use): each micro-batch
        #: advances at most this many versions, so a stream catching up
        #: over a long backlog emits bounded batches instead of one
        #: table-sized one. Pure liveness/size control: any end >= start
        #: spells a correct manifest diff, so capping never loses data.
        if mv is not None and int(mv) < 1:
            # loud, not clamped: 0 commonly means "no limit" elsewhere —
            # silently running at cap 1 (the slowest drain) would read
            # as an inexplicably crawling stream (review r10)
            raise ValueError(
                f"maxVersionsPerBatch must be a positive integer, got {mv!r}"
                " (omit the option for no limit)"
            )
        self.max_versions = None if mv is None else int(mv)
        #: the last batch boundary this reader observed (partitions/
        #: commit) — the base the next latestOffset caps from. None
        #: until a batch boundary exists, so the FIRST micro-batch of
        #: any query is uncapped: a restarted query's start lives in
        #: Spark's checkpoint (capping from a guess could invert the
        #: range), and availableNow's single-batch fallback must drain
        #: the whole backlog. Every subsequent batch is capped.
        self._cursor: int | None = None
        self.columns = tuple(
            f.name for f in _data_schema_for(self.root).fields
            if f.name != "_change_type"
        )

    # -- offsets (commit versions) ------------------------------------
    def initialOffset(self) -> dict:
        if self.starting == "latest":
            v = self.log.snapshot().version
        elif self.starting == "earliest":
            # version 0 = "before everything": the first micro-batch
            # emits the ENTIRE live table as inserts (Delta's
            # startingVersion=0 shape), then increments follow. The
            # empty version-0 snapshot is reconstructible on any log,
            # pruned or not — unlike an intermediate historical version.
            v = 0
        else:
            v = int(self.starting)
        # deliberately NOT seeding the rate-limit cursor: the FIRST
        # micro-batch of any query (fresh or restarted) must be uncapped
        # — availableNow falls back to single-batch execution for Python
        # sources, and a capped first batch there would silently strand
        # the rest of the backlog (review r10)
        return {"version": v}

    def latestOffset(self) -> dict:
        v = self.log.snapshot().version
        if self.max_versions is not None and self._cursor is not None:
            v = min(v, self._cursor + self.max_versions)
        self._cursor = v
        return {"version": v}

    def _snapshot_checked(self, v: int):
        """as_of resolution that REFUSES to substitute a different
        version: snapshot(as_of=…) below the pruned horizon silently
        replays to an older (ultimately the empty v0) state, which here
        would re-emit the whole table as inserts — duplicated data in
        the sink with no error. Version 0 legitimately resolves to the
        empty snapshot; anything else must resolve exactly."""
        snap = self.log.snapshot(as_of=v)
        if snap.version != v:
            raise ValueError(
                f"offset version {v} is no longer reconstructible from "
                f"the log (nearest at-or-before: {snap.version}) — the "
                "log was pruned past this stream's checkpoint; restart "
                "with a fresh startingVersion"
            )
        return snap

    def partitions(self, start: dict, end: dict):
        s, e = int(start["version"]), int(end["version"])
        if e < s:
            raise ValueError(f"inverted offset range: start {s} > end {e}")
        # the authoritative progress point (Spark replans start from its
        # checkpoint): the next latestOffset caps from at least here
        if self._cursor is None or e > self._cursor:
            self._cursor = e
        if e == s:
            return []
        snap_s = self._snapshot_checked(s)
        snap_e = self._snapshot_checked(e)
        paths_s = {x["path"] for x in snap_s.files["data"]}
        paths_e = {x["path"] for x in snap_e.files["data"]}
        # manifest-level compaction skip (Delta dataChange=false): a
        # row-preserving rewrite inside the interval emits NOTHING
        # instead of a full-table delete+insert echo — its added files
        # are substituted back for the files they repackaged, so the
        # interval's partitions spell the same net delta
        from holcstore_spark.sources.txlog import rewind_compacting

        moves = self.log.compacting_data_moves(s, e)
        if moves:
            paths_e = rewind_compacting(paths_e, moves, root=self.root)
        parts = [
            _FilePartition(self.root, p, "insert", self.columns)
            for p in sorted(paths_e - paths_s)
        ] + [
            _FilePartition(self.root, p, "delete", self.columns)
            for p in sorted(paths_s - paths_e)
        ]
        return parts

    # -- executor-side file read --------------------------------------
    def read(self, partition: _FilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pq.read_table(
            os.path.join(partition.root, partition.rel_path),
            columns=list(partition.columns),
        )
        # Spark's Arrow bridge rejects nanosecond timestamps (parquet's
        # native unit) — down-cast to UTC microseconds, the TimestampType
        # wire format
        fields = []
        for f in table.schema:
            if pa.types.is_timestamp(f.type):
                fields.append(pa.field(f.name, pa.timestamp("us", tz=f.type.tz or "UTC")))
            else:
                fields.append(f)
        table = table.cast(pa.schema(fields))
        marker = pa.array([partition.change_type] * table.num_rows,
                          type=pa.string())
        table = table.append_column("_change_type", marker)
        yield from table.to_batches()

    def commit(self, end: dict) -> None:
        # offsets are durable in the query checkpoint; track completed
        # progress for the rate-limit cursor
        v = int(end["version"])
        if self._cursor is None or v > self._cursor:
            self._cursor = v


class ChunkStoreChangesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "holc-changes"

    def schema(self):
        return _data_schema_for(self.options["path"])

    def streamReader(self, schema):
        return ChangesStreamReader(self.options)
