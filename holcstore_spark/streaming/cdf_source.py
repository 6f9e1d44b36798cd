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
            .load())

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

_KEY_TYPES = {"str": T.StringType(), "int": T.LongType(), "float": T.DoubleType()}


def _data_schema_for(path: str) -> T.StructType:
    """The store's data schema + the change marker, derived from the
    frozen config (keys with undeclared types default to string — the
    same rule as ChunkStore._key_schema with no sample frame)."""
    from holcstore_spark.config import ChunkStoreConfig

    if not os.path.isdir(os.path.join(path, "_txlog")):
        raise ValueError(
            f"{path!r} is not an ACID store (no _txlog): the "
            "holc-changes source streams the transaction log"
        )
    cfg = ChunkStoreConfig.load(path)
    fields = [
        T.StructField(k, _KEY_TYPES[cfg.key_types.get(k, "str")])
        for k in cfg.keys
    ]
    fields += [
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("chunk_index", T.IntegerType()),
        T.StructField("_change_type", T.StringType()),
    ]
    return T.StructType(fields)


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
        self.columns = tuple(
            f.name for f in _data_schema_for(self.root).fields
            if f.name != "_change_type"
        )

    # -- offsets (commit versions) ------------------------------------
    def initialOffset(self) -> dict:
        if self.starting == "latest":
            return {"version": self.log.snapshot().version}
        if self.starting == "earliest":
            # oldest version snapshot(as_of=…) can still reconstruct:
            # the latest checkpoint floor (0 on an unpruned log)
            return {"version": self.log._latest_checkpoint(fresh=True) or 0}
        return {"version": int(self.starting)}

    def latestOffset(self) -> dict:
        return {"version": self.log.snapshot().version}

    def partitions(self, start: dict, end: dict):
        s, e = int(start["version"]), int(end["version"])
        if e <= s:
            return []
        snap_s = self.log.snapshot(as_of=s)
        snap_e = self.log.snapshot(as_of=e)
        paths_s = {x["path"] for x in snap_s.files["data"]}
        paths_e = {x["path"] for x in snap_e.files["data"]}
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
        pass  # offsets are durable in the query checkpoint


class ChunkStoreChangesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "holc-changes"

    def schema(self):
        return _data_schema_for(self.options["path"])

    def streamReader(self, schema):
        return ChangesStreamReader(self.options)
